package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval — keyword and vector rankings fused by Reciprocal Rank
  * Fusion (Cormack, Clarke & Buettcher, "Reciprocal Rank Fusion
  * outperforms Condorcet and individual rank learning methods", SIGIR
  * 2009): `score(d) = Σ_lists 1/(K + rank_list(d))`, the standard
  * zero-tuning fusion every hybrid (BM25 + dense) retrieval stack ships.
  * For a training-data engine this is the retrieval half of
  * retrieval-augmented dataset curation: find corpus documents related to
  * a probe set by EITHER surface terms or embedding geometry, where
  * either signal alone misses (paraphrases have no shared rare terms;
  * keyword hits with niche vocabulary can sit far apart in embedding
  * space).
  *
  * Scale design (every stage keyed or broadcast, nothing quadratic in the
  * corpus):
  *  - keyword side: query term sets are the SMALL side (n_queries docs) —
  *    broadcast to the token-keyed scoring join; terms are df-capped
  *    (`maxDf`, the stopword-pruning every sparse index applies), so
  *    per-term fan-out is bounded and candidate volume is
  *    ≤ Σ_q |terms(q)| · maxDf, linear in the query set;
  *  - idf surrogate is INTEGER `⌊N/df⌋` (libm log weights are
  *    order/engine-dependent and can never cross-engine hash-match — the
  *    x_text_search convention), summed per (query, doc) in one keyed
  *    aggregation;
  *  - vector side: [[Similarity.bruteForceTopK]] (broadcast queries, one
  *    narrow corpus pass; swap in the IVF probe for a trained corpus —
  *    any (q_id, doc_id, rank ≤ k) frame fuses identically);
  *  - fusion: both lists are k-bounded per query, so the full-outer merge
  *    and re-rank touch ≤ 2k rows per query — driver-free, shuffle on
  *    (q_id, doc_id) only.
  *
  * Determinism (the oracle contract): ranks come from `row_number` over
  * fully tiebroken orders (score desc, doc_id asc); the RRF sum
  * `1/(K+r_kw) + 1/(K+r_vec)` is two IEEE exact-rounded divisions and one
  * add of the same two doubles in both engines — bit-identical — and is
  * rounded to 6 places before the final ordering so the served ranking
  * can never straddle an ulp.
  */
object Retrieval {

  /** Keyword top-k per query document over shared RARE terms:
    * `kw_score(q, d) = Σ_{t ∈ terms(q) ∩ terms(d), df(t) ≤ maxDf} ⌊N/df(t)⌋`,
    * d ≠ q, ranked (score desc, doc_id asc), rank ≤ k. Distinct terms —
    * document-level match, the x_text_search shape generalized from one
    * global query to a per-query-doc broadcast join. `ngram ≥ 2` matches
    * word-n-gram PHRASES instead of single words — the jaccard/cosine
    * family's convention for small-vocabulary corpora, where every
    * unigram is either everywhere or nowhere and retrieval degenerates.
    */
  def keywordTopK(docs: DataFrame, nQueries: Int, k: Int = 10,
                  maxDf: Long = 100L, ngram: Int = 1, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    // ngramSet rides the native word_ngrams kernel (round 10): the old
    // SQL-lambda form re-ran the split per element reference inside the
    // interpreted transform — 7.1 → 1.4 s warm at sf0.1 for this operator
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(JaccardDedup.ngramSet(textCol, ngram)).as("term"))
    // corpus term stats: ONE keyed aggregation (map-side combined onto
    // |vocab| rows) — in production this is the precomputed index stat
    val dfreq = toks.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_total"))
    // resolve df on the QUERY-side terms first (tiny ⋈ vocab, keyed,
    // co-partitioned with dfreq's own shuffle), then broadcast the scored
    // query terms into one map-side pass over the exploded corpus — the
    // naive ordering (toks ⋈ rare first) shuffles the whole corpus
    // explode on string n-gram keys and was 7× the cost of this plan.
    // Only shared terms can score, so df-capping the query side alone is
    // semantically identical to capping the full vocabulary.
    val qt = toks.filter(col("doc_id") < nQueries)
      .select(col("doc_id").as("q_id"), col("term"))
      .join(dfreq, Seq("term"))
      .filter(col("df") <= maxDf)
    val kw = toks.join(broadcast(qt), Seq("term"))
      .filter(col("doc_id") =!= col("q_id"))
      .crossJoin(broadcast(n))
      .groupBy(col("q_id"), col("doc_id"))
      .agg(sum(expr("n_total div df")).as("kw_score"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("kw_score").desc, col("doc_id"))
    kw.withColumn("kw_rank", row_number().over(w)).filter(col("kw_rank") <= k)
      .select(col("q_id"), col("doc_id"), col("kw_score"), col("kw_rank"))
  }

  /** RRF-fuse two per-query rankings. Inputs carry (q_id, doc_id, <rank
    * col>); a doc absent from one list contributes 0 from it (the
    * standard RRF convention) and reports rank 0 in the output. Output:
    * (q_id, doc_id, kw_rank, vec_rank, rrf, rk) — top `k` per query by
    * (rrf desc, doc_id asc).
    */
  def rrfFuse(kw: DataFrame, vec: DataFrame, k: Int = 10,
              kRrf: Int = 60): DataFrame = {
    require(kRrf >= 1, s"kRrf must be >= 1, got $kRrf")
    def contrib(r: Column): Column =
      when(r.isNotNull, lit(1.0) / (lit(kRrf) + r)).otherwise(lit(0.0))
    val fused = kw.select(col("q_id"), col("doc_id"), col("kw_rank"))
      .join(vec.select(col("q_id"), col("doc_id"), col("vec_rank")),
        Seq("q_id", "doc_id"), "full_outer")
      .select(col("q_id"), col("doc_id"),
        coalesce(col("kw_rank"), lit(0)).as("kw_rank"),
        coalesce(col("vec_rank"), lit(0)).as("vec_rank"),
        round(contrib(col("kw_rank")) + contrib(col("vec_rank")), 6).as("rrf"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("rrf").desc, col("doc_id"))
    fused.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** The composed operator: keyword top-k ⊕ exact-cosine top-k, RRF-fused.
    * `docs.doc_id` and `emb.vec_id` name the same corpus entity (the
    * testdata contract; in production the embedding table is derived from
    * the document table, same key).
    */
  def hybridRrf(docs: DataFrame, emb: DataFrame, nQueries: Int = 5,
                k: Int = 10, maxDf: Long = 100L, ngram: Int = 1,
                kRrf: Int = 60): DataFrame = {
    val kw = keywordTopK(docs, nQueries, k, maxDf, ngram)
    val vec = Similarity
      .bruteForceTopK(emb, emb.filter(col("vec_id") < nQueries), k)
      .select(col("q_id"), col("n_id").as("doc_id"), col("rk").as("vec_rank"))
    rrfFuse(kw, vec, k, kRrf)
  }
}
