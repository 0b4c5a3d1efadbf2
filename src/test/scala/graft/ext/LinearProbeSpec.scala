package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LinearProbeSpec extends SparkSpec {
  import spark.implicits._

  // noiseless linear ground truth: y = 2*x0 - 3*x1 + 0.5
  private def fixture(n: Int = 60) = {
    val rnd = new scala.util.Random(17)
    (0L until n.toLong).map { id =>
      val x = Array.fill(4)(rnd.nextGaussian().toFloat)
      val y = 2.0 * x(0) - 3.0 * x(1) + 0.5
      (id, x.toSeq, y)
    }.toDF("vec_id", "embedding", "label")
  }

  test("ridge with tiny lambda recovers a noiseless linear target") {
    val (w, b) = LinearProbe.train(fixture(), lambda = 1e-9)
    assert(math.abs(w(0) - 2.0) < 1e-4, s"w0=${w(0)}")
    assert(math.abs(w(1) + 3.0) < 1e-4, s"w1=${w(1)}")
    assert(math.abs(w(2)) < 1e-4 && math.abs(w(3)) < 1e-4)
    assert(math.abs(b - 0.5) < 1e-4, s"b=$b")
  }

  test("moments: upper triangle, symmetric content, matches naive computation") {
    val docs = Seq((0L, Seq(1.0f, 2.0f), 3.0), (1L, Seq(-1.0f, 0.5f), 1.0))
      .toDF("vec_id", "embedding", "label")
    val got = LinearProbe.moments(docs).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    assert(got.keys.forall { case (i, j) => i <= j })
    assert(got.size === 4 * 5 / 2) // z has 4 entries: x0, x1, 1, y
    // naive: z rows (1,2,1,3) and (-1,0.5,1,1)
    val zs = Seq(Seq(1.0, 2.0, 1.0, 3.0), Seq(-1.0, 0.5, 1.0, 1.0))
    for (i <- 0 until 4; j <- i until 4) {
      val want = zs.map(z => z(i) * z(j)).sum
      assert(math.abs(got((i, j)) - want) < 1e-9, s"($i,$j): ${got((i, j))} vs $want")
    }
  }

  test("training is deterministic; scores round-trip the trained model") {
    val docs = fixture()
    val (w1, b1) = LinearProbe.train(docs)
    val (w2, b2) = LinearProbe.train(docs)
    assert(w1.toSeq === w2.toSeq && b1 === b2)
    val scored = LinearProbe.scores(docs, w1, b1).orderBy("vec_id")
      .as[(Long, Double)].collect()
    val labels = docs.orderBy("vec_id").select("label").as[Double].collect()
    // noiseless target + tiny ridge: predictions track labels closely
    val maxErr = scored.map(_._2).zip(labels).map { case (p, y) => math.abs(p - y) }.max
    assert(maxErr < 0.01, s"maxErr=$maxErr")
  }

  test("moments (fixed-point) == momentsViaDecimal bit-for-bit (incl. rounding ties)") {
    // the sf0.001 corpus plus adversarial magnitudes: values whose products
    // sit on half-up rounding boundaries at scale 10 and 6, negatives, and
    // a zero row — every cell must agree EXACTLY (same double bits)
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val adversarial = Seq(
      (100000L, Seq(0.00001f, 1.23456789f), 0.0000000123),
      (100001L, Seq(-0.00001f, -1.0f), -0.5),
      (100002L, Seq(0.0f, 0.0f), 0.0),
      (100003L, Seq(123.456f, -0.000789f), 2.5e-7)
    ).toDF("vec_id", "embedding", "label")
    Seq(emb, adversarial).foreach { docs =>
      val fixp = LinearProbe.moments(docs).collect()
        .map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
      val dec = LinearProbe.momentsViaDecimal(docs).collect()
        .map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
      assert(fixp.keySet === dec.keySet)
      dec.foreach { case (k, v) =>
        assert(java.lang.Double.doubleToLongBits(fixp(k)) ===
          java.lang.Double.doubleToLongBits(v), s"$k: fixp=${fixp(k)} dec=$v")
      }
    }
  }

  test("momentsFast (partial-agg buffer) agrees with the exact decimal twin") {
    val docs = fixture()
    val exact = LinearProbe.moments(docs).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    val fast = LinearProbe.momentsFast(docs).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    assert(fast.keySet === exact.keySet)
    exact.foreach { case (k, v) =>
      assert(math.abs(fast(k) - v) < 1e-6, s"$k: fast=${fast(k)} exact=$v")
    }
  }

  test("larger lambda shrinks weights toward zero") {
    val docs = fixture()
    val (wSmall, _) = LinearProbe.train(docs, lambda = 1e-9)
    val (wBig, _) = LinearProbe.train(docs, lambda = 100.0)
    assert(wBig.map(math.abs).sum < wSmall.map(math.abs).sum)
  }

  test("singular system without ridge fails loudly") {
    // duplicate dimension -> rank-deficient gram at lambda 0
    val docs = Seq((0L, Seq(1.0f, 1.0f), 1.0), (1L, Seq(2.0f, 2.0f), 2.0),
      (2L, Seq(3.0f, 3.0f), 3.0)).toDF("vec_id", "embedding", "label")
    intercept[Exception] { LinearProbe.train(docs, lambda = 0.0) }
    val (w, _) = LinearProbe.train(docs, lambda = 1e-3) // regularized: solvable
    assert(w.length === 2)
  }
}
