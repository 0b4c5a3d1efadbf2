package graft.ext

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF: Count-Min sketch over a string stream (Cormode &
  * Muthukrishnan 2005) — point frequency estimates from `depth × width`
  * counters, independent of the number of distinct items.
  *
  * Guarantee: estimates NEVER undercount; with width w and depth d the
  * overcount is ≤ 2n/w with probability ≥ 1 − (1/2)^d (n = stream length).
  * Sketches are MERGEABLE by element-wise addition with the identical
  * guarantee over the combined stream — each shard sketches in one pass,
  * the exchange carries d·w longs per task regardless of cardinality,
  * which is what makes this the frequency operator that survives 100 TB
  * streams where an exact groupBy's key space would not fit anywhere.
  * Complements the sketch family: Misra-Gries ([[HeavyHittersAgg]]) finds
  * WHICH items are heavy; CMS answers "how often is THIS item" for any
  * queried item after the fact.
  *
  * Hashing: d pairwise-independent rows via multiply-shift over the item's
  * MurmurHash3 (seeded per row) — deterministic across JVMs, so the sketch
  * itself is run-stable; estimates still depend only on the multiset, not
  * encounter order (unlike MG), but the sketch math is not SQL-expressible,
  * so registry exposure is rows-only with the guarantees pinned in
  * CountMinAggSpec.
  */
class CountMinAgg(depth: Int, width: Int)
    extends Aggregator[String, Array[Long], Array[Long]] {
  require(depth >= 1 && depth <= 16, s"CountMinAgg: depth in [1,16], got $depth")
  require(width >= 2, s"CountMinAgg: width >= 2, got $width")

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(buf: Array[Long], item: String): Array[Long] = {
    var r = 0
    while (r < depth) {
      buf(r * width + CountMinAgg.bucket(item, r, width)) += 1L
      r += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(reduction: Array[Long]): Array[Long] = reduction

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object CountMinAgg {
  private[ext] def bucket(item: String, row: Int, width: Int): Int =
    math.floorMod(
      scala.util.hashing.MurmurHash3.stringHash(item, 0x9747b28c + row * 0x61c88647),
      width)

  /** Point estimate: min over the d rows (never undercounts). */
  def estimate(sketch: Array[Long], depth: Int, width: Int, item: String): Long = {
    require(sketch.length == depth * width,
      s"estimate: sketch length ${sketch.length} != $depth*$width")
    var best = Long.MaxValue
    var r = 0
    while (r < depth) {
      val c = sketch(r * width + bucket(item, r, width))
      if (c < best) best = c
      r += 1
    }
    best
  }
}
