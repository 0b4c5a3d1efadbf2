package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history construction — the warehouse
  * operator that turns a change/event stream into validity intervals: one
  * row per STATE RUN with `valid_from` / `valid_to` / `is_current`, where
  * consecutive records with an unchanged state collapse into one interval
  * (the reference's medallion gold layer stops at current-state snapshots;
  * SCD-2 is the history-preserving form a dimension table needs).
  *
  * Scale shape: both windows partition by the ENTITY key — per-entity
  * history is bounded by the entity's change frequency, so this is the
  * canonical keyed-window use (like per-customer top-k), never a global
  * window. A pathological entity with millions of updates is one hot
  * partition; if such keys exist, bucket the history by time first and
  * stitch runs across bucket borders.
  *
  * Determinism: callers order by whole values that compare identically in
  * any engine (e.g. epoch SECONDS + an id tiebreak, the events-table
  * convention) and emit `valid_from` as a formatted string — both
  * cross-engine requirements the oracle relies on.
  */
object Scd {

  /** Collapse same-state runs and emit validity intervals.
    *
    * @param fromCol the value emitted as `valid_from` (and, shifted by one
    *                run, as `valid_to`) — typically a formatted timestamp
    *                string of the run's first record
    * @param orderCols total order WITHIN a key (include an id tiebreak —
    *                  a tie broken differently across engines would split
    *                  or merge runs nondeterministically)
    */
  def type2(df: DataFrame, keyCol: String, stateCol: String,
            orderCols: Seq[Column], fromCol: Column): DataFrame = {
    require(orderCols.nonEmpty, "type2: orderCols must not be empty")
    val w1 = Window.partitionBy(col(keyCol)).orderBy(orderCols: _*)
    // run starts: first record per key, or state differs from predecessor.
    // "First" is row_number()=1, NOT lag-is-null — a lag of NULL is
    // ambiguous between "no predecessor" and "predecessor's state was
    // NULL", and the latter must continue a NULL-state run, not split it
    // (null-safe <=>: a NULL state is a real state, not a wildcard).
    val marked = df
      .withColumn("__from", fromCol)
      .withColumn("__ord", struct(orderCols: _*))
      .withColumn("__rn", row_number().over(w1))
      .withColumn("__prev", lag(col(stateCol), 1).over(w1))
      .filter(col("__rn") === 1 || !(col("__prev") <=> col(stateCol)))
    val w2 = Window.partitionBy(col(keyCol)).orderBy(col("__ord"))
    marked.select(
      col(keyCol), col(stateCol),
      col("__from").as("valid_from"),
      lead(col("__from"), 1).over(w2).as("valid_to"),
      // is_current keys off the NEXT RUN'S EXISTENCE (__ord is never
      // null), not off lead(fromCol): a successor run whose fromCol
      // evaluates to NULL (e.g. a null timestamp formatted to NULL) must
      // still close this run — lead(__from).isNull would mint a second
      // "current" row for the entity
      lead(col("__ord"), 1).over(w2).isNull.cast("int").as("is_current"))
  }
}
