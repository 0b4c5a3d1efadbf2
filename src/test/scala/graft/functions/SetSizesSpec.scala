package graft.functions

import graft.SparkSpec

class SqlSurfaceSpec extends SparkSpec {
  test("all native expressions are SQL-callable via the session extension") {
    val r = spark.sql(
      """SELECT pandas_title('a-b c') AS t,
        |  simhash64(array('x','y')) AS sh,
        |  size(shingle_hashes(array('a','b','c'), 2)) AS nsh,
        |  size(minhash_signature(shingle_hashes(array('a','b','c'), 2), 16)) AS nmh,
        |  dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp,
        |  hyperplane_sketch(array(1.0d, 0.0d), 0L, 8) AS hp,
        |  top_run_length(array('a','b','a')) AS trl,
        |  ws_tokens(' a\tb ') AS wt,
        |  word_ngrams(array('a','b','c'), 2) AS ng,
        |  size(rolling_window_hashes('abcd', 3)) AS nrh,
        |  nfc_normalize('café') AS nfc""".stripMargin).head()
    assert(r.getString(0) === "A-B C")
    assert(r.getAs[Int]("nsh") === 2 && r.getAs[Int]("nmh") === 16)
    assert(r.getDouble(4) === 11.0)
    assert(r.getAs[Int]("trl") === 2)
    assert(r.getSeq[String](7) === Seq("a", "b"))
    assert(r.getSeq[String](8) === Seq("a b", "b c"))
    assert(r.getAs[Int]("nrh") === 2)
    // 'e' + combining acute (U+0301) composes to U+00E9; length shrinks 5 -> 4
    assert(r.getAs[String]("nfc") === "café")
    assert(r.getAs[String]("nfc").length === 4)
    // sketch is deterministic: same call, same session, same value
    val again = spark.sql(
      "SELECT hyperplane_sketch(array(1.0d, 0.0d), 0L, 8)").head().getLong(0)
    assert(r.getLong(5) === again)
  }

  test("hyperplane_sketch rejects nPlanes outside [1, 64] at construction") {
    // the signature is one Long: `1L << 64` wraps to bit 0, so plane 64
    // would silently alias plane 0 — must fail loudly instead
    import org.apache.spark.sql.functions.{array, col, lit}
    for (bad <- Seq(0, 65, -3)) {
      val e = intercept[IllegalArgumentException] {
        GraftFunctions.hyperplane_sketch(array(lit(1.0)), lit(0L), bad)
      }
      assert(e.getMessage.contains("[1, 64]"), e.getMessage)
    }
    // boundary values construct fine
    GraftFunctions.hyperplane_sketch(array(lit(1.0)), lit(0L), 1)
    GraftFunctions.hyperplane_sketch(array(lit(1.0)), lit(0L), 64): Unit
  }

  test("dot_product null-propagates on length mismatch (corrupt-vector safety)") {
    val r = spark.sql(
      """SELECT dot_product(array(1.0d, 2.0d), array(3.0d)) AS mismatch,
        |  dot_product(array(1.0d, 2.0d), CAST(NULL AS ARRAY<DOUBLE>)) AS nullarg""".stripMargin)
      .head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }
}
import org.apache.spark.sql.functions._

class SetSizesSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (Seq("a", "b", "b", "c"), Seq("b", "c", "d")),
    (Seq.empty[String], Seq("x")),
    (Seq("a", null, "b"), Seq(null, "b", "e")),
  ).toDF("l", "r")

  test("optimizer rewrites size(array_intersect/union) to counting exprs") {
    // literal frames get pre-folded by ConvertToLocalRelation, so assert the
    // plan shape on a parquet-backed frame (can't be constant-folded)...
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(split(col("text"), " ").as("l"), split(col("source"), "r").as("r"))
    val planQ = docs.select(
      size(array_intersect($"l", $"r")).as("i"),
      size(array_union($"l", $"r")).as("u"))
    val optimized = planQ.queryExecution.optimizedPlan.toString
    assert(optimized.contains("intersect_size") && optimized.contains("union_size"),
      s"rewrite did not fire:\n$optimized")
    // ...and semantics on the literal frame (evaluated through the same
    // rewritten expressions at fold time): null element present in both
    // sides counts once; duplicates collapse
    val q = df.select(
      size(array_intersect($"l", $"r")).as("i"),
      size(array_union($"l", $"r")).as("u"))
    val got = q.collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(got.toSeq === Seq((2, 4), (0, 1), (2, 4)))
  }

  test("rewrite does NOT fire for unsupported element types (doubles)") {
    val d = Seq((Seq(1.0, 2.0), Seq(2.0, 3.0))).toDF("l", "r")
    val q = d.select(size(array_intersect($"l", $"r")).as("i"))
    assert(!q.queryExecution.optimizedPlan.toString.contains("intersect_size"))
    assert(q.head().getInt(0) === 1)
  }

  test("size of plain arrays is untouched") {
    val q = df.select(size($"l").as("n"))
    assert(q.collect().map(_.getInt(0)).toSeq === Seq(4, 0, 3))
  }
}
