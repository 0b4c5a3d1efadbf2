package graft.functions

import graft.SparkSpec
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
