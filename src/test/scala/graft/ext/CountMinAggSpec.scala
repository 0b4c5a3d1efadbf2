package graft.ext

import graft.SparkSpec

class CountMinAggSpec extends SparkSpec {
  import spark.implicits._

  private val depth = 4
  private val width = 256

  // zipf-ish stream: token t_i appears 1000/i times, i = 1..50 (~4500 items)
  private val stream: Seq[String] =
    (1 to 50).flatMap(i => Seq.fill(1000 / i)(s"t$i"))
  private val truth: Map[String, Long] =
    stream.groupBy(identity).view.mapValues(_.size.toLong).toMap

  private def sketchOf(partitions: Int): Array[Long] =
    stream.toDF("tok").repartition(partitions)
      .as[String].select(new CountMinAgg(depth, width).toColumn).head()

  test("estimates never undercount and stay within the 2n/w bound") {
    val sk = sketchOf(8)
    val n = stream.size
    truth.foreach { case (tok, want) =>
      val est = CountMinAgg.estimate(sk, depth, width, tok)
      assert(est >= want, s"$tok undercounted: $est < $want")
      assert(est <= want + 2L * n / width,
        s"$tok overcounted past the CMS bound: $est vs $want (n=$n, w=$width)")
    }
  }

  test("mergeability: 8-partition sketch is IDENTICAL to the 1-partition sketch") {
    // element-wise-add merging must reproduce the sequential sketch exactly
    // (counts depend only on the multiset, not the partitioning)
    assert(sketchOf(8).toSeq === sketchOf(1).toSeq)
  }

  test("absent items estimate only collision noise, never a phantom heavy count") {
    val sk = sketchOf(4)
    val est = CountMinAgg.estimate(sk, depth, width, "never-seen")
    assert(est <= 2L * stream.size / width, s"phantom count $est")
  }

  test("bad geometry is rejected at construction / estimate") {
    intercept[IllegalArgumentException](new CountMinAgg(0, 256))
    intercept[IllegalArgumentException](new CountMinAgg(4, 1))
    intercept[IllegalArgumentException](
      CountMinAgg.estimate(new Array[Long](8), 4, 256, "x"))
  }
}
