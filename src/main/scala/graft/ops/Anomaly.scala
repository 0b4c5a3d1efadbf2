package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Integer-exact time-series anomaly detection — the |z| > z flag over a
  * count series, rewritten to avoid floats entirely so the verdict is
  * bit-identical in any engine: z² = (c·n − Σ)² / (n·Σc² − Σ²), so the
  * flag is (c·n − Σ)² > z²·(n·Σc² − Σ²) with both sides exact BIGINT
  * (counts are integers; the sums stay far below 2^63 for any realistic
  * series). No stddev association-order or rounding concerns.
  *
  * Takes ANY keyed count series — the detector carries no assumptions
  * about where the series came from (the registry's e11 entry feeds it an
  * hourly event grid with fixture-planted spikes; production callers feed
  * it raw aggregates). The global n/Σ/Σc² are a SINGLE-ROW aggregate
  * broadcast-joined back onto the series (the `x_skew_profile` shape) —
  * map-side partials roll up to one row, so there is no unsplittable
  * single-partition exchange anywhere in the plan and the detector is
  * safe on a series of ANY length, not just time-bounded ones.
  */
object Anomaly {

  /** `(keyCol, valCol, dev_n, dev_n_sq, thresh, is_anomaly)` over a
    * `(keyCol, valCol)` count series: is_anomaly = 1 iff
    * (c·n − Σ)² > z²·(n·Σc² − Σ²), the integer-exact |z-score| > z test.
    */
  def integerZFlags(series: DataFrame, keyCol: String, valCol: String,
                    z: Int = 3): DataFrame = {
    require(z >= 1, s"integerZFlags: z must be >= 1, got $z")
    val c = col(valCol)
    val stats = series.agg(
      count(lit(1)).as("n"), sum(c).as("s"), sum(c * c).as("sq"))
    series.crossJoin(broadcast(stats))
      .select(col(keyCol), c,
        (c * col("n") - col("s")).as("dev_n"),
        ((c * col("n") - col("s")) * (c * col("n") - col("s"))).as("dev_n_sq"),
        (lit(z.toLong * z) * (col("n") * col("sq") - col("s") * col("s")))
          .as("thresh"))
      .withColumn("is_anomaly", (col("dev_n_sq") > col("thresh")).cast("int"))
  }
}
