package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Approximate aggregates: accuracy envelopes vs exact, on real testdata. */
class ApproxSpec extends SparkSpec {

  private lazy val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")

  test("approx_count_distinct within 5% of exact") {
    val exact = li.select(countDistinct(col("l_orderkey"))).head().getLong(0)
    // default rsd (5%) can legitimately exceed a 5% assertion; use 1%
    val approx = li.select(approx_count_distinct(col("l_orderkey"), 0.01)).head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("approx_percentile brackets the exact median") {
    val exact = li.selectExpr("percentile(l_extendedprice, 0.5)").head().getDouble(0)
    val approx = li.selectExpr("approx_percentile(l_extendedprice, 0.5, 1000)")
      .head().getDouble(0)
    // GK sketch with accuracy 1000: rank error <= n/1000; values near the
    // median are dense, allow 5% relative
    assert(math.abs(approx - exact) / exact < 0.05, s"approx=$approx exact=$exact")
  }
}
