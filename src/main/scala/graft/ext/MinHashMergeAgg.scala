package graft.ext

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (`Aggregator[IN, BUF, OUT]`): merges MinHash signatures by
  * element-wise minimum.
  *
  * Why this is the right merge: minhash(A ∪ B)_i = min(minhash(A)_i,
  * minhash(B)_i) — signatures are mergeable sketches, so a corpus sketch can
  * be maintained incrementally per group/partition/day without re-reading
  * documents (the 100 TB posture: sketch once per shard, merge cheaply).
  * Exactness is asserted in MinHashMergeAggSpec (merge of per-doc signatures
  * == signature of the concatenated corpus).
  */
class MinHashMergeAgg(h: Int) extends Aggregator[Array[Long], Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.fill(h)(Long.MaxValue)

  override def reduce(buf: Array[Long], sig: Array[Long]): Array[Long] =
    merge(buf, sig)

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    val out = new Array[Long](h)
    var i = 0
    while (i < h) { out(i) = math.min(a(i), b(i)); i += 1 }
    out
  }

  override def finish(reduction: Array[Long]): Array[Long] = reduction

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
