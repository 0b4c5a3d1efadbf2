package graft.ext

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF: Misra-Gries heavy-hitters sketch over a string stream.
  *
  * Keeps at most `k` counters. Guarantee (the classic MG bound): every item
  * with true frequency > n/(k+1) is PRESENT in the final summary, and each
  * reported count undercounts by at most n/(k+1). The summaries are
  * MERGEABLE (Agarwal et al., "Mergeable Summaries"): add counts pointwise,
  * then subtract the (k+1)-largest count and drop non-positive counters —
  * the merged summary keeps the same guarantee over the combined stream.
  * That mergeability is what makes this a 100 TB operator: every shard
  * sketches independently in one pass, merges are tiny (≤ k entries), and
  * nothing global is ever re-read.
  *
  * Counts (and the presence of sub-threshold items) depend on encounter
  * order, which Spark does not fix — so this is a SPEC-VERIFIED operator
  * (guarantee + mergeability assertions in HeavyHittersAggSpec), not an
  * oracle registry entry. Exact top-k with deterministic output is the
  * `x_text_vocab` / `b7` family; this is the bounded-memory one-pass
  * alternative.
  */
class HeavyHittersAgg(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], item: String): Map[String, Long] =
    if (buf.contains(item)) buf.updated(item, buf(item) + 1L)
    else if (buf.size < k) buf.updated(item, 1L)
    else { // decrement-all step: drop zeros
      buf.map { case (i, c) => i -> (c - 1L) }.filter(_._2 > 0L)
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val sum = (a.keySet ++ b.keySet).iterator
      .map(i => i -> (a.getOrElse(i, 0L) + b.getOrElse(i, 0L))).toMap
    if (sum.size <= k) sum
    else {
      // subtract the (k+1)-th largest count; at most k survive
      val cut = sum.values.toSeq.sorted(Ordering[Long].reverse)(k)
      sum.map { case (i, c) => i -> (c - cut) }.filter(_._2 > 0L)
    }
  }

  override def finish(reduction: Map[String, Long]): Map[String, Long] = reduction

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}
