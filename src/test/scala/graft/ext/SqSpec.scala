package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SqSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(n: Int, d: Int) =
    (0 until n).map { i =>
      (i.toLong, Array.tabulate(d)(j =>
        (math.sin(i * 0.37 + j * 1.13) * (j + 1)).toFloat).toSeq)
    }.toDF("vec_id", "embedding")

  test("codes are in [0,255]; range endpoints map to 0 and 255") {
    val df = vecs(50, 8)
    val m = Sq.sqTrain(df)
    val codes = Sq.sqEncode(df, m)
      .select(posexplode(col("codes")).as(Seq("dim", "code")))
    val (lo, hi) = {
      val r = codes.agg(min("code"), max("code")).head
      (r.getInt(0), r.getInt(1))
    }
    assert(lo === 0 && hi === 255) // each dim's min/max hit the endpoints
  }

  test("dequantization error is bounded by span/255 per dimension") {
    val df = vecs(40, 6)
    val m = Sq.sqTrain(df)
    val err = Sq.sqEncode(df, m)
      .join(df.select(col("vec_id").as("n_id"),
        col("embedding").cast("array<double>").as("x")), "n_id")
      .select(explode(arrays_zip(Sq.dequant(m).as("xh"), col("x"))).as("z"))
      .select(abs(col("z.xh") - col("z.x")).as("e"))
      .agg(max("e")).head.getDouble(0)
    val maxStep = m.span.max / 255.0
    assert(err <= maxStep + 1e-12, s"dequant error $err > step $maxStep")
  }

  test("constant dimension trains span=1 and round-trips exactly") {
    val df = (0 until 10).map(i => (i.toLong, Seq(3.5f, i.toFloat))).toDF("vec_id", "embedding")
    val m = Sq.sqTrain(df)
    assert(m.span(0) === 1.0)
    val xh0 = Sq.sqEncode(df, m).select(Sq.dequant(m).getItem(0)).head.getDouble(0)
    assert(xh0 === 3.5)
  }

  test("probe top-1 matches brute force on well-separated clusters") {
    // two tight clusters; int8 noise cannot flip cluster membership
    val df = (0 until 60).map { i =>
      val base = if (i % 2 == 0) 1.0 else -1.0
      (i.toLong, Array.tabulate(8)(j =>
        (base * (j + 1) + (i % 5) * 0.01).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val m = Sq.sqTrain(df)
    val codes = Sq.sqEncode(df, m)
    val q = df.filter(col("vec_id") < 4)
    val sq = Sq.sqProbe(codes, m, q, k = 5)
    val brute = Similarity.bruteForceTopK(df, q, k = 5)
    // same-parity (same-cluster) neighbours must fill the top-5 both ways
    val sqPar = sq.select(col("q_id") % 2 === col("n_id") % 2).collect().map(_.getBoolean(0))
    val brPar = brute.select(col("q_id") % 2 === col("n_id") % 2).collect().map(_.getBoolean(0))
    assert(sqPar.forall(identity) && brPar.forall(identity))
  }

  test("encode is deterministic across runs") {
    val df = vecs(30, 5)
    val m = Sq.sqTrain(df)
    val a = Sq.sqEncode(df, m).collect().map(r => (r.getLong(0), r.getSeq[Int](1))).sortBy(_._1)
    val b = Sq.sqEncode(df, m).collect().map(r => (r.getLong(0), r.getSeq[Int](1))).sortBy(_._1)
    assert(a.sameElements(b))
  }
}
