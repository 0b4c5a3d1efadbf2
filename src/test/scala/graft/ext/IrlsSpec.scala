package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[Irls]]: the algebraic-sigmoid GLM trainer (quality-gate
  * training in-engine). Moment cells vs naive computation, convergence on
  * a separable fixture, agreement with a pure-driver IRLS replica, and
  * the scores' link arithmetic.
  */
class IrlsSpec extends SparkSpec {
  import spark.implicits._

  private def mu(eta: Double): Double = 0.5 * (1.0 + eta / (1.0 + math.abs(eta)))
  private def muP(eta: Double): Double = 0.5 / ((1.0 + math.abs(eta)) * (1.0 + math.abs(eta)))
  private def r6(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue

  // linearly separable 2-D fixture: y = 1 iff x0 > 0 (margin 0.4)
  private def separable(n: Int = 80) = {
    val rnd = new scala.util.Random(7)
    (0L until n.toLong).map { id =>
      val x0 = (if (id % 2 == 0) 1 else -1) * (0.2 + 0.8 * rnd.nextDouble())
      val x1 = rnd.nextGaussian() * 0.3
      (id, Seq(x0.toFloat, x1.toFloat), if (x0 > 0) 1 else 0)
    }.toDF("vec_id", "embedding", "label")
  }

  test("momentCells: Hessian upper triangle + gradient cells match naive") {
    val docs = Seq((0L, Seq(1.0f, 2.0f), 1), (1L, Seq(-1.0f, 0.5f), 0))
      .toDF("vec_id", "embedding", "label")
    val w = Array(0.5, -0.25)
    val b = 0.125
    val got = Irls.momentCells(docs, w, b, col("label").cast("double"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    // z rows: (1, 2, 1) and (-1, 0.5, 1); dim = 2 so j=3 is the gradient
    val rows = Seq((Seq(1.0, 2.0, 1.0), 1.0), (Seq(-1.0, 0.5, 1.0), 0.0))
    def eta(z: Seq[Double]) = r6(z(0) * w(0) + z(1) * w(1) + b)
    assert(got.size === 3 * 4 / 2 + 3)
    for (i <- 0 to 2; j <- i to 2) {
      val want = rows.map { case (z, _) => (muP(eta(z)) * z(i)) * z(j) }.sum
      assert(math.abs(got((i, j)) - want) < 1e-5, s"H($i,$j)")
    }
    for (i <- 0 to 2) {
      val want = rows.map { case (z, y) => (mu(eta(z)) - y) * z(i) }.sum
      assert(math.abs(got((i, 3)) - want) < 1e-5, s"g($i)")
    }
  }

  test("momentCells (fixed-point) == the decimal form bit-for-bit") {
    val docs = separable(120)
    val w = Array(0.3, -0.7)
    val b = -0.05
    val fixp = Irls.momentCells(docs, w, b, col("label").cast("double"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    val dec = Irls.momentCellsViaDecimal(docs, w, b, col("label").cast("double"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    assert(fixp.keySet === dec.keySet)
    dec.foreach { case (k, v) =>
      assert(java.lang.Double.doubleToLongBits(fixp(k)) ===
        java.lang.Double.doubleToLongBits(v), s"$k: fixp=${fixp(k)} dec=$v")
    }
  }

  test("gate evaluation: separable fixture reaches accuracy 1.0 at threshold 0.5") {
    val docs = separable()
    val m = Irls.train(docs, (col("label") === 1).cast("double"),
      rounds = 3, lambda = 1e-2)
    val eval = Irls.scores(docs, m.w, m.b)
      .join(docs.select(col("vec_id"), col("label").as("y")), Seq("vec_id"))
      .agg(
        sum(when((col("quality") >= 0.5) === (col("y") === 1), 1L).otherwise(0L)).as("correct"),
        count(lit(1)).as("n")).head()
    assert(eval.getLong(0) === eval.getLong(1)) // accuracy 1.0
  }

  test("calibration bins: partition the slice; separable fixture has pure bins") {
    val docs = separable()
    val m = Irls.train(docs, (col("label") === 1).cast("double"),
      rounds = 3, lambda = 1e-2)
    val bins = Irls.scores(docs, m.w, m.b)
      .join(docs.select(col("vec_id"),
        (col("label") === 1).cast("long").as("y")), Seq("vec_id"))
      .withColumn("bin", least(floor(col("quality") * 10), lit(9L)).cast("int"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"))
      .collect()
    // bins partition the slice, every bin in [0, 9]
    assert(bins.map(_.getLong(1)).sum === docs.count())
    assert(bins.forall(r => r.getInt(0) >= 0 && r.getInt(0) <= 9))
    // a separable fixture calibrates to PURE occupied bins: everything
    // scoring >= 0.5 (bins 5-9) is a positive, everything below a negative
    bins.foreach { r =>
      val (bin, n, pos) = (r.getInt(0), r.getLong(1), r.getLong(2))
      if (bin >= 5) assert(pos === n, s"bin $bin impure: $pos/$n")
      else assert(pos === 0L, s"bin $bin impure: $pos/$n")
    }
  }

  test("empty labeled slice fails with a named error, not an opaque NoSuchElement") {
    val empty = separable().limit(0)
    val e = intercept[IllegalArgumentException] {
      Irls.train(empty, (col("label") === 1).cast("double"))
    }
    assert(e.getMessage.contains("empty labeled slice"))
  }

  test("train converges on a separable fixture: every score on the right side") {
    val docs = separable()
    val m = Irls.train(docs, (col("label") === 1).cast("double"),
      rounds = 3, lambda = 1e-2)
    val scored = Irls.scores(docs, m.w, m.b)
      .join(docs.select(col("vec_id"), col("label")), Seq("vec_id"))
      .select(col("label"), col("quality")).collect()
    scored.foreach { r =>
      val (y, q) = (r.getInt(0), r.getDouble(1))
      if (y == 1) assert(q > 0.5, s"pos scored $q") else assert(q < 0.5, s"neg scored $q")
    }
    // and the gate actually separates with margin, not by epsilon
    assert(m.w(0) > 0.5, s"w0=${m.w(0)}")
  }

  test("engine training == pure-driver IRLS replica (same roundings)") {
    val docs = separable(40)
    val raw = docs.collect().map { r =>
      (r.getSeq[Float](1).map(_.toDouble).toArray :+ 1.0,
        if (r.getInt(2) == 1) 1.0 else 0.0)
    }
    val dim = 2
    var w = new Array[Double](dim)
    var b = 0.0
    (1 to 2).foreach { _ =>
      // replica of one engine round: per-row eta (rounded 6), link, cells
      // summed and rounded 6, then the same newtonStep
      val cells = scala.collection.mutable.Map.empty[(Int, Int), Double]
      raw.foreach { case (z, y) =>
        val eta = r6(z(0) * w(0) + z(1) * w(1) + b)
        val s = muP(eta)
        val g = mu(eta) - y
        for (i <- 0 to dim; j <- i to dim)
          cells((i, j)) = cells.getOrElse((i, j), 0.0) + (s * z(i)) * z(j)
        for (i <- 0 to dim)
          cells((i, dim + 1)) = cells.getOrElse((i, dim + 1), 0.0) + g * z(i)
      }
      val rounded = cells.toSeq.map { case ((i, j), v) => (i, j, r6(v)) }
      val (w2, b2) = Irls.newtonStep(rounded, w, b, dim, lambda = 1e-2)
      w = w2; b = b2
    }
    val m = Irls.train(docs, (col("label") === 1).cast("double"),
      rounds = 2, lambda = 1e-2)
    // double-sum order differs from the decimal sum in the last ulp at
    // most; after the 1e-6 round the solves agree to ~1e-5
    (0 until dim).foreach(i =>
      assert(math.abs(m.w(i) - w(i)) < 1e-4, s"w$i: ${m.w(i)} vs ${w(i)}"))
    assert(math.abs(m.b - b) < 1e-4, s"b: ${m.b} vs $b")
  }

  test("scores: round(mu(round(w·x + b, 6)), 6), bias included") {
    val docs = Seq((7L, Seq(0.5f, -2.0f))).toDF("vec_id", "embedding")
    val got = Irls.scores(docs, Array(1.0, 0.25), -0.125)
      .collect().head.getDouble(1)
    val eta = r6(0.5 * 1.0 + -2.0 * 0.25 + -0.125)
    assert(got === r6(mu(eta)))
  }
}
