package graft.ext

import graft.SparkSpec

class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def counts(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val canon = edges.map { case (a, b) => if (a < b) (a, b) else (b, a) }.distinct
    Triangles.triangleCounts(canon.toDF("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** Driver-side brute force: every id triple, closed iff all three edges. */
  private def brute(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val es = edges.map { case (a, b) => if (a < b) (a, b) else (b, a) }.toSet
    val nodes = es.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val tris = for {
      a <- nodes; b <- nodes if a < b && es((a, b))
      c <- nodes if b < c && es((b, c)) && es((a, c))
    } yield (a, b, c)
    tris.flatMap(t => Seq(t._1, t._2, t._3))
      .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
  }

  test("single triangle: each node counts 1") {
    assert(counts(Seq((1L, 2L), (2L, 3L), (1L, 3L))) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("path has no triangles") {
    assert(counts(Seq((1L, 2L), (2L, 3L), (3L, 4L))) === Map.empty)
  }

  test("K4: every node is in C(3,2)=3 triangles") {
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    assert(counts(k4) === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("two triangles sharing an edge") {
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (2L, 4L), (3L, 4L))
    assert(counts(g) === Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
  }

  test("hub star (skewed degree) plus a planted triangle") {
    // node 0 connects to 1..40 (degree 40); the only triangle is (5,6,0)
    val g = (1L to 40L).map(i => (0L, i)) :+ (5L, 6L)
    assert(counts(g) === Map(0L -> 1L, 5L -> 1L, 6L -> 1L))
  }

  test("clustering coefficients: clique 1.0, path interior 0.0, shared-edge graph exact") {
    def coeffs(edges: Seq[(Long, Long)]) =
      Triangles.clusteringCoefficients(edges.toDF("doc_a", "doc_b"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val k4 = (for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)).toSeq
    assert(coeffs(k4).values.forall { case (d, t, c) => d == 3 && t == 3 && c == 1.0 })
    val path = coeffs(Seq((1L, 2L), (2L, 3L), (3L, 4L)))
    assert(path(2L) === ((2L, 0L, 0.0)) && path(3L) === ((2L, 0L, 0.0)))
    assert(!path.contains(1L)) // degree-1 nodes excluded (undefined coeff)
    val shared = coeffs(Seq((1L, 2L), (2L, 3L), (1L, 3L), (2L, 4L), (3L, 4L)))
    assert(shared(2L) === ((3L, 2L, 2.0 * 2 / (3 * 2))))
    assert(shared(1L) === ((2L, 1L, 1.0)))
  }

  test("matches driver-side brute force on a pseudo-random graph") {
    val edges = (0 until 160).map { i =>
      val a = (i * 7919 % 37).toLong; val b = (i * 104729 % 37).toLong
      (a, b)
    }.filter { case (a, b) => a != b }
    assert(counts(edges) === brute(edges))
  }
}
