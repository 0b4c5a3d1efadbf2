package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The fixed-point execution of dsum/davg must be BIT-identical to the
  * definitional decimal forms (dsumDecimal/davgDecimal — what every oracle
  * mirrors) on every shape the registry feeds them: TPC-H-scale monetary
  * aggregations, negatives, nulls, NaN, empty groups, global (ungrouped)
  * aggregation, and near-tie fractional values.
  */
class UtilFixedPointSpec extends SparkSpec {
  import spark.implicits._

  private def assertSame(df: DataFrame, c: org.apache.spark.sql.Column,
                         groups: Seq[String]): Unit = {
    def run(d: org.apache.spark.sql.Column, a: org.apache.spark.sql.Column) = {
      val g = if (groups.isEmpty) df.groupBy() else df.groupBy(groups.map(col): _*)
      g.agg(d.as("s"), a.as("a"))
        .collect()
        .map(r => (groups.map(r.getAs[Any]).mkString("|"),
          Option(r.getAs[java.lang.Double]("s")).map(java.lang.Double.doubleToLongBits(_)),
          Option(r.getAs[java.lang.Double]("a")).map(java.lang.Double.doubleToLongBits(_))))
        .sortBy(_._1)
    }
    val fx = run(Util.dsum(c), Util.davg(c))
    val de = run(Util.dsumDecimal(c), Util.davgDecimal(c))
    assert(fx.length === de.length)
    fx.zip(de).foreach { case (f, d) => assert(f === d, s"fx=$f dec=$d") }
  }

  test("q1-shaped monetary aggregation matches bitwise") {
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
    assertSame(li,
      col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")),
      Seq("l_returnflag", "l_linestatus"))
    assertSame(li, col("l_discount"), Seq("l_returnflag"))
    assertSame(li, -col("l_extendedprice"), Seq.empty)
  }

  test("edge shapes: nulls, NaN, near-ties, tiny/huge mixes, empty input") {
    val rows = Seq[(String, java.lang.Double)](
      ("a", 1.005), ("a", -2.00000000005), ("a", null), ("a", Double.NaN),
      ("b", 0.00000000005), ("b", 1e-300), ("b", 12345678.87654321),
      ("c", null), ("c", Double.NaN),           // all-null/NaN group
      ("d", -0.1), ("d", 0.30000000000000004), ("d", 1.0 / 3.0)
    ).toDF("k", "v")
    assertSame(rows, col("v"), Seq("k"))
    assertSame(rows, col("v"), Seq.empty)
    assertSame(rows.filter(col("k") === "zzz"), col("v"), Seq.empty) // empty
  }

  test("integer-typed input goes through the same implicit cast") {
    val rows = Seq(("a", 1L), ("a", -7L), ("b", 123456789L)).toDF("k", "v")
    assertSame(rows, col("v"), Seq("k"))
  }

  test("exact beyond 2^63 of summed digits (the split carries high digits)") {
    // 20 rows at the per-row 9e8 ceiling: Σ of scale-10 digits ≈ 1.8e20 —
    // far past a single long sum — yet Σq/Σr stay in range and the decimal
    // recombine is exact; must match the definitional decimal form bitwise
    val rows = (1 to 20).map(_ => ("hot", 9.0e8)).toDF("k", "v")
    assertSame(rows, col("v"), Seq("k"))
  }

  test("per-row magnitude beyond the scale-10 long ceiling fails loudly") {
    val rows = Seq(("k", 1.0e10)).toDF("k", "v")
    val e = intercept[Exception] {
      rows.groupBy(col("k")).agg(Util.dsum(col("v")).as("s")).collect()
    }
    assert(e.getMessage.contains("unscaled10") ||
      e.getCause != null && e.getCause.getMessage.contains("unscaled10"),
      s"unexpected: $e")
  }
}
