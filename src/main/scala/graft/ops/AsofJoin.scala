package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of join (point-in-time join): for each left row, attach the latest
  * right row with rightTime <= leftTime within the same key.
  *
  * Spark has no built-in as-of join; the scalable composition here is the
  * union-and-carry-forward pattern (no range explosion, no per-key loop):
  *
  *   1. tag and union both sides on (key, time);
  *   2. sort within key by (time, tag, tiebreak) — right rows before left
  *      rows at equal timestamps so `<=` semantics hold; the right-side
  *      tiebreak makes multi-match resolution deterministic (latest wins);
  *   3. `last(payload, ignoreNulls)` over an unbounded-preceding row window
  *      carries the most recent right payload forward;
  *   4. keep only left rows.
  *
  * Cost shape: ONE shuffle on the key (the window sort), versus a naive
  * range-join's quadratic per-key blowup. Skew on hot keys is a plain
  * window-after-hash-partition, which AQE handles.
  */
object AsofJoin {

  /** @param payload       right-side columns to carry onto left rows
    * @param rightTiebreak orders right rows at equal (key, time); the last
    *                      one wins — pass a unique column for determinism
    */
  def asofBackward(left: DataFrame, right: DataFrame,
                   key: String, leftTime: Column, rightTime: Column,
                   payload: Seq[String], rightTiebreak: Column): DataFrame = {
    val leftStructType = StructType(left.schema.fields)
    val payloadType    = StructType(payload.map(p => right.schema(p)))

    val taggedRight = right.select(
      col(key).as("__k"), rightTime.as("__t"), lit(0).as("__tag"),
      rightTiebreak.cast("bigint").as("__tb"),
      struct(payload.map(col): _*).as("__p"),
      lit(null).cast(leftStructType).as("__l"))

    val taggedLeft = left.select(
      col(key).as("__k"), leftTime.as("__t"), lit(1).as("__tag"),
      lit(null).cast("bigint").as("__tb"),
      lit(null).cast(payloadType).as("__p"),
      struct(left.columns.map(col): _*).as("__l"))

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__tag"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    taggedRight.unionByName(taggedLeft)
      .withColumn("__carried", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(left.columns.map(c => col(s"__l.$c").as(c)) ++
              payload.map(p => col(s"__carried.$p").as(p)): _*)
  }
}
