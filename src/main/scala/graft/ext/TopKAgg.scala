package graft.ext

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF: per-group top-k as a bounded buffer — the SCALE-correct
  * alternative to `row_number().over(window) <= k`.
  *
  * A window top-k shuffles EVERY row to its group's partition and sorts the
  * whole group just to keep k rows. As a two-phase aggregation, each map
  * task keeps at most k rows per group (partial aggregate), so the exchange
  * carries ≤ k·groups·tasks rows instead of the table, and no full per-group
  * sort ever happens — at 100 TB that's the difference between shuffling the
  * fact table and shuffling a result-sized summary.
  *
  * Entries are (value, tiebreak) ranked by value DESC, tiebreak ASC — the
  * same total order as the window form, so outputs are identical
  * (oracle-checked via `x_topk_agg` against the q8 SQL; equality with the
  * window plan pinned in TopKAggSpec).
  */
class TopKAgg(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  /** true iff a ranks strictly after b. */
  private def after(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 < b._1 || (a._1 == b._1 && a._2 > b._2)

  override def zero: Seq[(Double, Long)] = Vector.empty

  override def reduce(buf: Seq[(Double, Long)], x: (Double, Long)): Seq[(Double, Long)] = {
    if (buf.size >= k && after(x, buf.last)) buf // fast path: can't place
    else {
      val pos = buf.indexWhere(after(_, x))
      val ins = if (pos < 0) buf :+ x
                else (buf.take(pos) :+ x) ++ buf.drop(pos)
      if (ins.size > k) ins.take(k) else ins
    }
  }

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    b.foldLeft(a)(reduce)

  override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = r

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}
