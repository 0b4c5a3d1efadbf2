package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** N-gram language-model quality scoring — the CCNet-style "how predictable
  * is this document under a corpus LM" filter (Wenzek et al. 2020 shape:
  * score each document by its token-level probability under a model trained
  * on the corpus itself; very low scores flag noise/gibberish, very high
  * scores flag boilerplate). The real CCNet uses a KenLM 5-gram; this is
  * the same pipeline shape with a bigram MLE, which Spark expresses as two
  * corpus aggregations plus two keyed joins — no model binary needed.
  *
  * Cross-engine exactness: probabilities are INTEGER surrogates, never
  * floats — the per-bigram score is `(1e6 · c₂(w₁w₂)) DIV c₁(w₁)` (floor
  * division; c₂ = corpus occurrences of the bigram, c₁ of its first word)
  * and the document score is the floor-mean of its bigram scores. Every
  * intermediate is a 64-bit integer, so the DuckDB oracle matches
  * hash-exactly (the repo's no-libm rule — a log-prob float would diverge
  * in the last ulp across engines).
  *
  * Scale shape: the corpus-sized shuffles are the two count aggregations
  * and the two count joins, all keyed by `xxhash64` of the gram (8 B keys,
  * the [[JaccardDedup]] stance: a collision can merge two grams' counts —
  * vanishing at 64 bits, and never invents a gram). Per-document bigram
  * multiplicity is pre-aggregated BEFORE the count joins, so repetitive
  * documents join once per distinct bigram, not once per occurrence.
  * Unseen bigrams cannot occur (the model is trained on the scored corpus
  * itself); scoring a FOREIGN batch against these counts would need a
  * smoothing rule, which is a deliberate non-goal here.
  */
object NgramLm {

  /** Tokens exactly as the rest of the oracle-mirrored text family counts
    * them: split on single spaces (`string_split(text, ' ')` in DuckDB).
    */
  private def toks(textCol: String): Column = split(col(textCol), " ")

  /** Per-document bigram multiplicities keyed by gram hash:
    * `(id, th2, th1, n)` — th2 hashes the bigram "w1 w2", th1 its first
    * word, n the in-document occurrence count.
    */
  private[graft] def docBigrams(docs: DataFrame, idCol: String,
                                textCol: String): DataFrame =
    docs.select(col(idCol).as("id"),
        explode(graft.functions.GraftFunctions.word_ngrams(toks(textCol), 2))
          .as("gram"))
      .select(col("id"), xxhash64(col("gram")).as("th2"),
        xxhash64(substring_index(col("gram"), " ", 1)).as("th1"))
      .groupBy(col("id"), col("th2"), col("th1"))
      .agg(count(lit(1)).as("n"))

  /** Score every document with ≥ 1 bigram: `(id, n_bigrams, lm_score)`
    * where `lm_score = (Σ_occurrences (1e6·c₂) DIV c₁) DIV n_bigrams` —
    * 0..1e6, higher = more predictable under the corpus bigram MLE.
    * Documents with < 2 words have no bigrams and are not emitted (their
    * perplexity is undefined — the caller's gate decides their fate).
    */
  def scoreDocs(docs: DataFrame, idCol: String = "doc_id",
                textCol: String = "text"): DataFrame = {
    val b = docBigrams(docs, idCol, textCol)
    scoreAgainst(b, b.groupBy(col("th2")).agg(sum(col("n")).as("c2")),
      uniCounts(docs, textCol))
  }

  /** Corpus unigram totals `(th1, c1)` — the score's denominators. */
  private[graft] def uniCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(toks(textCol)).as("w"))
      .select(xxhash64(col("w")).as("th1"))
      .groupBy(col("th1")).agg(count(lit(1)).as("c1"))

  /** The scoring join against EXPLICIT count tables — shared verbatim by
    * [[scoreDocs]] (counts derived from the scored corpus itself) and the
    * maintained-count ledger probe
    * ([[graft.streaming.LmLedgerStream.probe]]), so ledger-served ==
    * batch-recomputed is checkable bit for bit. `b` is a [[docBigrams]]
    * frame; `c2` is `(th2, c2)`, `c1` is `(th1, c1)`. Every probe gram
    * must exist in the counts (inner joins — the trained-on-scored-corpus
    * precondition in the object doc).
    */
  private[graft] def scoreAgainst(b: DataFrame, c2: DataFrame,
                                  c1: DataFrame): DataFrame =
    b.join(c2, "th2").join(c1, "th1")
      .select(col("id"), col("n"),
        (expr("(1000000 * c2) DIV c1") * col("n")).as("p"))
      .groupBy(col("id"))
      .agg(sum(col("n")).as("n_bigrams"),
        expr("sum(p) DIV sum(n)").as("lm_score"))
      .select(col("id").as("doc_id"), col("n_bigrams"), col("lm_score"))
}
