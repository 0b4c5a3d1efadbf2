package graft.ops

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter join pre-filtering — the 100 TB pattern for SELECTIVE joins
  * whose build side is too big to broadcast as rows but whose key SET fits
  * in a few MB of bits: fact rows that cannot match are dropped before the
  * shuffle, so the exchange carries the ~matching slice instead of the
  * table.
  *
  * Built from Spark's own sketch expressions (`BloomFilterAggregate` /
  * `BloomFilterMightContain` — the same pair AQE's runtime row-group
  * filtering injects), wired explicitly so the pattern is tunable
  * (bits/items) and usable where the optimizer doesn't inject it. Keys are
  * hashed with xxhash64, matching Spark's injected-filter convention.
  *
  * False positives only (a bloom never drops a real key), so
  * `prefilter(...).join(small, key)` returns EXACTLY `large.join(small,
  * key)` — pinned by BloomJoinSpec.
  */
object BloomJoin {

  /** Build the bloom sketch of `small`'s key set. The sketch binary
    * (numBits/8 bytes) is the only driver-side state — model state like
    * IVF centroids, not data.
    */
  def sketchBytes(small: DataFrame, smallKey: Column,
                  expectedItems: Long, numBits: Long): Array[Byte] = {
    val agg = GraftColumnBridge.column(
      new BloomFilterAggregate(
        GraftColumnBridge.expression(xxhash64(smallKey)),
        Literal(expectedItems), Literal(numBits)).toAggregateExpression())
    small.select(agg.as("bf")).head().getAs[Array[Byte]](0)
  }

  /** Drop `large` rows whose key can't be in `small`'s key set. */
  def prefilter(large: DataFrame, largeKey: Column,
                small: DataFrame, smallKey: Column,
                expectedItems: Long = 1000000L,
                numBits: Long = 8L * 1024 * 1024): DataFrame = {
    val bytes = sketchBytes(small, smallKey, expectedItems, numBits)
    val might = GraftColumnBridge.column(BloomFilterMightContain(
      Literal.create(bytes, BinaryType),
      GraftColumnBridge.expression(xxhash64(largeKey))))
    large.filter(might)
  }
}
