package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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
  * it raw aggregates). The global stats ride an unpartitioned,
  * UNORDERED window over the AGGREGATED series — a series is
  * time-bounded (hours of a year ≈ 8.8k rows), not corpus-sized, so a
  * single-exchange global aggregate is the right plan shape.
  */
object Anomaly {

  /** `(keyCol, valCol, dev_n, dev_n_sq, thresh, is_anomaly)` over a
    * `(keyCol, valCol)` count series: is_anomaly = 1 iff
    * (c·n − Σ)² > z²·(n·Σc² − Σ²), the integer-exact |z-score| > z test.
    */
  def integerZFlags(series: DataFrame, keyCol: String, valCol: String,
                    z: Int = 3): DataFrame = {
    require(z >= 1, s"integerZFlags: z must be >= 1, got $z")
    val wAll = Window.partitionBy()
    val c = col(valCol)
    series.select(col(keyCol), c,
        count(lit(1)).over(wAll).as("n"),
        sum(c).over(wAll).as("s"),
        sum(c * c).over(wAll).as("sq"))
      .select(col(keyCol), c,
        (c * col("n") - col("s")).as("dev_n"),
        ((c * col("n") - col("s")) * (c * col("n") - col("s"))).as("dev_n_sq"),
        (lit(z.toLong * z) * (col("n") * col("sq") - col("s") * col("s")))
          .as("thresh"))
      .withColumn("is_anomaly", (col("dev_n_sq") > col("thresh")).cast("int"))
  }
}
