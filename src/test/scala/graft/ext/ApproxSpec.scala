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

  test("merged HLL union estimate within 5% of exact (shard-then-combine)") {
    import org.apache.spark.sql.functions._
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val merged = li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(hll_sketch_agg(col("l_orderkey")).as("sk"))
      .groupBy(col("l_returnflag"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(merged(k) - n).toDouble / n < 0.05, s"$k: ${merged(k)} vs $n")
    }
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
