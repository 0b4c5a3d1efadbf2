package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join: points matched to the intervals containing them,
  * with NO equi key.
  *
  * The naive plan for `p.sec BETWEEN i.start AND i.end` is a
  * broadcast-nested-loop join — O(|points| × |intervals|) comparisons,
  * a scale-killer once the interval side outgrows a dimension table. The
  * scale-safe shape bucketizes the time axis: every interval explodes into
  * the coarse buckets it covers, every point maps to exactly ONE bucket,
  * and the join becomes an EQUI-join on bucket id refined by the exact
  * range predicate. A point meets an interval in at most one bucket (its
  * own), so no pair-dedup is needed and output equals the naive join
  * row-for-row (RangeJoinSpec pins the equivalence, boundaries included).
  *
  * `bucketSec` trades interval duplication (a length-L interval lands in
  * ~L/bucketSec buckets) against bucket-join selectivity — set it near the
  * median interval length. Interval skew (one bucket covered by everything)
  * is the same shape as any hot-key join and composes with salting.
  */
object RangeJoin {

  /** Half-open semantics: startSec ≤ point < endSec, epoch seconds. */
  def pointInInterval(points: DataFrame, pointSec: String,
                      intervals: DataFrame, startSec: String, endSec: String,
                      bucketSec: Long = 86400L): DataFrame = {
    val pb = points.withColumn("__bucket", floor(col(pointSec) / bucketSec))
    // Clamp the sequence upper bound: for a corrupt interval with
    // end <= start, sequence(a, b) with a > b generates a DESCENDING
    // sequence — one inverted row (e.g. endSec=0) would explode into
    // millions of spurious bucket rows. The exact range filter below
    // already drops such rows from the output (an empty half-open
    // interval matches nothing), so clamping only removes blow-up cost,
    // never result rows.
    val lo = floor(col(startSec) / bucketSec)
    val ib = intervals.withColumn("__bucket",
      explode(sequence(lo, greatest(lo, floor((col(endSec) - 1) / bucketSec)))))
    pb.join(ib, "__bucket")
      .filter(col(pointSec) >= col(startSec) && col(pointSec) < col(endSec))
      .drop("__bucket")
  }

  /** Interval-overlap join: every (left, right) pair whose HALF-OPEN
    * intervals intersect — `max(starts) < min(ends)`. Touching intervals
    * (`lEnd == rStart`) do NOT overlap, and note the pairwise form
    * `lStart < rEnd AND rStart < lEnd` would be WRONG: it admits an empty
    * interval sitting inside a non-empty one (`[7,7)` vs `[0,10)` passes
    * both inequalities but intersects nothing). Column names must be
    * disjoint across the two frames (same contract as [[pointInInterval]]).
    *
    * Same bucketization as [[pointInInterval]], with one twist: both sides
    * explode into the coarse buckets they cover, so an overlapping pair can
    * now share MANY buckets. Rather than dedup pairs after the join (a
    * second corpus-sized shuffle on the pair key), each pair is emitted
    * only in the one bucket containing the overlap's START —
    * `max(lStart, rStart)` lies inside both intervals whenever they
    * overlap, so exactly one shared bucket passes the filter and the
    * output equals the naive θ-join row-for-row (RangeJoinSpec pins the
    * equivalence against a crossJoin, boundaries included).
    *
    * Inverted/empty intervals (`end <= start`) match nothing; their tile
    * sequences are clamped to one bucket so a corrupt row costs one tile,
    * never a blow-up.
    */
  def intervalOverlap(left: DataFrame, lStart: String, lEnd: String,
                      right: DataFrame, rStart: String, rEnd: String,
                      bucketSec: Long = 86400L): DataFrame = {
    def tiled(df: DataFrame, s: String, e: String) = {
      val lo = floor(col(s) / bucketSec)
      df.withColumn("__bucket",
        explode(sequence(lo, greatest(lo, floor((col(e) - 1) / bucketSec)))))
    }
    tiled(left, lStart, lEnd).join(tiled(right, rStart, rEnd), "__bucket")
      .filter(greatest(col(lStart), col(rStart)) < least(col(lEnd), col(rEnd)) &&
        col("__bucket") === floor(greatest(col(lStart), col(rStart)) / bucketSec))
      .drop("__bucket")
  }
}
