package graft.ext

import graft.SparkSpec

class PcaSpec extends SparkSpec {
  import spark.implicits._

  // planted structure: x = t·dir + small noise on one other axis, so the
  // top component must recover ±dir and capture almost all variance
  private def plantedDf(n: Int, d: Int) = {
    val dir = Array.tabulate(d)(j => if (j == 2) 0.8 else if (j == 5) 0.6 else 0.0)
    (0 until n).map { i =>
      val t = (i % 21) - 10.0 // mean-zero spread along dir
      val noise = ((i * 7919) % 11 - 5.0) / 50.0
      (i.toLong, Array.tabulate(d)(j =>
        (t * dir(j) + (if (j == 9) noise else 0.0)).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("train recovers the planted dominant direction; eigenvalues descend") {
    val m = Pca.train(plantedDf(200, 16), k = 3)
    assert(m.dim === 16 && m.nRows === 200)
    val v0 = m.components(0)
    // alignment |v0 · dir| ~ 1 (dir is unit: 0.8² + 0.6² = 1)
    val align = math.abs(v0(2) * 0.8 + v0(5) * 0.6)
    assert(align > 0.999, s"top component misaligned: $align")
    assert(m.eigenvalues(0) > m.eigenvalues(1) - 1e-12)
    assert(m.eigenvalues(1) >= m.eigenvalues(2) - 1e-12)
    // sign convention: largest-|coordinate| entry is positive
    for (c <- m.components) {
      val mx = c.indices.maxBy(i => (math.abs(c(i)), -i))
      assert(c(mx) >= 0.0)
    }
  }

  test("components are orthonormal") {
    val m = Pca.train(plantedDf(150, 12), k = 4)
    for (a <- 0 until 4; b <- 0 until 4) {
      val dot = (0 until 12).map(j => m.components(a)(j) * m.components(b)(j)).sum
      if (a == b) assert(math.abs(dot - 1.0) < 1e-9)
      else assert(math.abs(dot) < 1e-6, s"components $a,$b not orthogonal: $dot")
    }
  }

  test("projection variance matches the eigenvalue; mean projects to ~0") {
    val df = plantedDf(200, 16)
    val m = Pca.train(df, k = 2)
    val proj = Pca.project(df, m).select($"p0", $"p1").as[(Double, Double)].collect()
    val n = proj.length.toDouble
    val (m0, m1) = (proj.map(_._1).sum / n, proj.map(_._2).sum / n)
    assert(math.abs(m0) < 1e-4 && math.abs(m1) < 1e-4, "centered projections")
    val var0 = proj.map(p => p._1 * p._1).sum / n
    assert(math.abs(var0 - m.eigenvalues(0)) < 1e-3 * math.max(1.0, m.eigenvalues(0)),
      s"var $var0 vs eigenvalue ${m.eigenvalues(0)}")
  }

  test("trainSketched recovers the exact trainer's dominant subspace on low-rank data") {
    val df = plantedDf(200, 16)
    val exact = Pca.train(df, k = 2)
    val sk = Pca.trainSketched(df, k = 2, oversample = 4)
    assert(sk.dim === 16 && sk.nRows === 200)
    // mean identical (same Σx/n arithmetic)
    for (i <- 0 until 16) assert(math.abs(sk.mean(i) - exact.mean(i)) < 1e-9)
    // top-2 eigenpairs agree: the sketch is exact when rank <= m
    for (c <- 0 until 2) {
      val align = math.abs((0 until 16)
        .map(j => sk.components(c)(j) * exact.components(c)(j)).sum)
      assert(align > 0.999, s"component $c misaligned: $align")
      assert(math.abs(sk.eigenvalues(c) - exact.eigenvalues(c)) <
        1e-6 * math.max(1.0, exact.eigenvalues(c)),
        s"eigenvalue $c: ${sk.eigenvalues(c)} vs ${exact.eigenvalues(c)}")
    }
    // reproducible: same seed -> same model (tolerance absorbs partial-agg
    // merge-order ulps; Ω itself is exactly reproducible)
    val sk2 = Pca.trainSketched(df, k = 2, oversample = 4)
    for (c <- 0 until 2; j <- 0 until 16)
      assert(math.abs(sk.components(c)(j) - sk2.components(c)(j)) < 1e-9)
  }

  test("whiten: unit variance per retained component, zero mean") {
    val df = plantedDf(200, 16)
    val m = Pca.train(df, k = 2)
    val w = Pca.whiten(df, m).select($"w0", $"w1").as[(Double, Double)].collect()
    val n = w.length.toDouble
    for ((get, name) <- Seq(((p: (Double, Double)) => p._1, "w0"),
                            ((p: (Double, Double)) => p._2, "w1"))) {
      val mean = w.map(get).sum / n
      val variance = w.map(p => { val v = get(p) - mean; v * v }).sum / n
      assert(math.abs(mean) < 1e-3, s"$name mean $mean")
      assert(math.abs(variance - 1.0) < 1e-2, s"$name variance $variance")
    }
  }

  test("degenerate inputs fail loudly") {
    intercept[IllegalArgumentException](
      Pca.train(plantedDf(10, 4), k = 5))
  }

  test("random projection: matches a driver-side recompute; reproducible; JL distortion bounded") {
    val d = 32; val m = 16
    val df = (0 until 80).map { i =>
      (i.toLong, Array.tabulate(d)(j => math.sin(i * 0.61 + j * 0.29).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val got = Pca.randomProject(df, m, seed = 7L).collect()
      .map(r => r.getLong(0) -> (1 until m + 1).map(r.getDouble)).toMap
    // driver-side recompute with the same matrix
    val om = Pca.rademacher(d, m, 7L)
    val raw = df.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
    for ((id, vec) <- raw; j <- 0 until m) {
      var acc = 0.0; var i = 0
      while (i < d) { acc += vec(i) * om(i)(j); i += 1 }
      val want = math.rint(acc / math.sqrt(m.toDouble) * 1e6) / 1e6
      assert(math.abs(got(id)(j) - want) < 1e-9, s"id=$id j=$j")
    }
    // reproducible
    val again = Pca.randomProject(df, m, seed = 7L).collect()
      .map(r => r.getLong(0) -> (1 until m + 1).map(r.getDouble)).toMap
    assert(again === got)
    // JL: pairwise squared distances preserved within a loose 3/sqrt(m) band
    val ids = raw.keys.toSeq.sorted.take(20)
    for (a <- ids; b <- ids if a < b) {
      val orig = raw(a).zip(raw(b)).map { case (x, y) => (x - y) * (x - y) }.sum
      val proj = got(a).zip(got(b)).map { case (x, y) => (x - y) * (x - y) }.sum
      if (orig > 1e-9) {
        val ratio = proj / orig
        assert(ratio > 0.25 && ratio < 4.0, s"distortion $ratio for ($a,$b)")
      }
    }
  }
}
