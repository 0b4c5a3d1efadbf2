package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Train/eval decontamination — the benchmark-leak check every serious
  * pre-training pipeline runs (the reference has no counterpart; this is
  * part of the LLM-data operator family the engine adds): a training
  * document is contaminated if it shares any word n-gram (n≈13 in
  * published pipelines; parameterized here) with an evaluation document.
  *
  * Scale shape: the eval side is BENCHMARK-sized (thousands of docs —
  * always many orders below the corpus), so its distinct n-gram set is
  * sketchable. The corpus side explodes to (doc_id, ngram) once, passes a
  * broadcast bloom prescreen ([[graft.ops.BloomJoin]] — the same
  * expression pair AQE injects for runtime filters), and only the
  * surviving sliver reaches the exact-match shuffle. False positives die
  * in the exact join, so the output is EXACT — the bloom only cuts the
  * exchange volume, which is what matters when the left side is 100 TB of
  * text n-grams. No driver-side data state beyond the sketch bytes.
  */
object Decontaminate {

  /** Word n-grams as an array column: n consecutive whitespace tokens
    * re-joined with single spaces. Spark's `sequence(a, b)` DESCENDS when
    * a > b (it would fabricate windows for short docs), so short texts are
    * routed to an explicit empty array.
    */
  def ngrams(textCol: String, n: Int): Column = {
    require(n >= 1, s"ngrams: n must be >= 1, got $n")
    val ws = s"split($textCol, ' ')"
    val gen = expr(
      s"transform(sequence(1, size($ws) - ${n - 1}), i -> array_join(slice($ws, i, $n), ' '))")
    when(expr(s"size($ws)") >= n, gen)
      .otherwise(expr("array()").cast("array<string>"))
  }

  /** (id, n_overlap) for every training doc sharing ≥1 distinct n-gram
    * with the eval set; clean docs are absent. `n_overlap` counts the
    * DISTINCT shared n-grams — the usual severity signal.
    */
  def contaminated(train: DataFrame, evalSet: DataFrame, n: Int = 3,
                   idCol: String = "doc_id", textCol: String = "text",
                   expectedEvalNgrams: Long = 1000000L,
                   bloomBits: Long = 8L * 1024 * 1024): DataFrame = {
    val tg = train.select(col(idCol), explode(array_distinct(ngrams(textCol, n))).as("ng"))
    // persist the eval n-gram set: it is read twice (sketch build — an
    // immediate action — then the exact-verify join) and it is benchmark-
    // sized by assumption, so caching it is what a serving deployment does
    // too; without it every downstream action re-explodes the eval docs
    val eg = evalSet.select(explode(array_distinct(ngrams(textCol, n))).as("ng"))
      .distinct().persist()
    graft.ops.BloomJoin.prefilter(tg, col("ng"), eg, col("ng"),
        expectedEvalNgrams, bloomBits)
      .join(eg, Seq("ng")) // exact verify: bloom false positives die here
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_overlap"))
  }

  /** The drop step: training docs with no shared n-gram survive. */
  def removeContaminated(train: DataFrame, evalSet: DataFrame, n: Int = 3,
                         idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    train.join(contaminated(train, evalSet, n, idCol, textCol).select(idCol),
      Seq(idCol), "left_anti")
}
