package graft.ext

import graft.SparkSpec

/** Pins [[PageRank.pagerankInt]] against a driver-side reference
  * simulation of the exact integer recurrence — same floor divisions,
  * same damping rationals — on graphs exercising a cycle, a hub, and a
  * sink. Exact equality, not tolerance: the operator's whole point is
  * deterministic integer arithmetic.
  */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private val Scale = 1000000000000L

  private def simulate(edges: Seq[(String, String)], iters: Int): Map[String, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val deg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    var score = nodes.map(_ -> Scale).toMap
    val base = Scale / 20 * 3
    (1 to iters).foreach { _ =>
      val inc = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => score(src) / deg(src) * 17 / 20 }.sum
      }
      score = nodes.map(n => n -> (base + inc.getOrElse(n, 0L))).toMap
    }
    score
  }

  private def run(edges: Seq[(String, String)], iters: Int): Map[String, Long] =
    PageRank.pagerankInt(edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("symmetric 2-cycle is a fixed point at scale") {
    val e = Seq(("a", "b"), ("b", "a"))
    val got = run(e, 5)
    // each node sends 85% and re-bases 15%: mass exactly conserved
    assert(got === Map("a" -> Scale, "b" -> Scale))
  }

  test("hub+sink graph matches the reference simulation exactly") {
    val e = Seq(("a", "c"), ("b", "c"), ("c", "a"), ("d", "a"), ("d", "c"))
    // c: in-degree 2 hub; d: source (nothing points at it); no sinks → but
    // total mass still leaks via floor division
    for (iters <- Seq(1, 3, 10)) {
      assert(run(e, iters) === simulate(e, iters), s"iters=$iters")
    }
  }

  test("sink leaks mass; in-degree ranks order the scores") {
    val e = Seq(("a", "s"), ("b", "s"), ("c", "a"))
    val got = run(e, 10)
    assert(got === simulate(e, 10))
    // s (in-deg 2) > a (in-deg 1) > b,c (in-deg 0, base only)
    assert(got("s") > got("a") && got("a") > got("b") && got("b") === got("c"))
  }

  test("parallel edges are multi-edges by contract") {
    val e = Seq(("a", "b"), ("a", "b"), ("a", "c"))
    assert(run(e, 2) === simulate(e, 2))
  }
}
