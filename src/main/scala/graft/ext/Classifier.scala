package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Linear text-classifier INFERENCE — the fasttext-shaped quality/topic
  * filter every modern corpus pipeline runs (DCLM, FineWeb-Edu: score
  * every document with a trained linear model, gate on the score). The
  * model is data, not code: a `(tok, weight)` table. Inference is the
  * standard Spark shape for linear models — explode tokens, pre-aggregate
  * per-document term frequencies, join the weight table, one keyed sum:
  *
  *   score(doc) = bias + Σ_tok tf(doc, tok) · w(tok)
  *
  * Scale shape: the tf pre-aggregation happens BEFORE the weight join
  * (repetitive docs join once per distinct token), and the join is keyed
  * on the token — Spark broadcasts it when the model fits (the usual
  * case: even a 1M-token vocab of (string, long) is tens of MB) and
  * falls back to a shuffle join when it doesn't; neither case is a
  * driver-side loop. Integer weights → integer scores: exact
  * cross-engine, no sigmoid (monotone in the logit — gate on the raw
  * score; a float sigmoid could never hash-match the oracle).
  */
object Classifier {

  /** Score every document: `(doc_id, n_hits, score)` — `n_hits` counts
    * token occurrences the model knows (inner join: unknown tokens
    * contribute 0, exactly fasttext's OOV rule), `score` the weighted sum
    * plus `bias`. Docs with NO known token are absent (no-feature input
    * has no meaningful logit; gate upstream on doc length, not here).
    */
  def scoreDocs(docs: DataFrame, weights: DataFrame, bias: Long = 0L,
                idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
      .join(weights.select(col("tok"), col("weight")), "tok")
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_hits"),
        (lit(bias) + sum(col("tf") * col("weight"))).as("score"))
}
