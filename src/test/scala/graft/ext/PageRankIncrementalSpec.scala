package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Pins [[PageRank.incrementalInt]]'s two contracts:
  *
  *  1. EXACTNESS — the frontier-bounded update over (round ledger, new
  *     edges) is bit-identical to `pagerankInt` over the full edge set, on
  *     graphs exercising new nodes, degree changes on existing sources,
  *     and edges into previously-untouched regions.
  *  2. COST ∝ BATCH — on a long chain with one localized new edge, the
  *     per-round affected sets (`statsOut`) stay bounded by the batch's
  *     k-hop reach, never approaching |V|: the whole point of retaining
  *     the round ledger is that an ingest does not pay a graph-wide
  *     message-passing pass per round.
  */
class PageRankIncrementalSpec extends SparkSpec {
  import spark.implicits._

  private def scores(df: DataFrame): Map[String, Long] =
    df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  private def check(oldE: Seq[(String, String)], newE: Seq[(String, String)],
                    iters: Int = 5,
                    stats: Option[scala.collection.mutable.ArrayBuffer[Long]] = None): Unit = {
    val ledger = PageRank.pagerankRounds(oldE.toDF("src", "dst"), iters)
    val full = (oldE ++ newE).toDF("src", "dst")
    val got = scores(PageRank.incrementalInt(
      ledger, full, newE.toDF("src", "dst"), iters, statsOut = stats))
    val want = scores(PageRank.pagerankInt(full, iters))
    assert(got === want)
  }

  test("ledger's final round equals pagerankInt") {
    val e = Seq(("a", "c"), ("b", "c"), ("c", "a"), ("d", "a"), ("d", "c"))
    val ledger = PageRank.pagerankRounds(e.toDF("src", "dst"), 4)
    val last = scores(ledger.filter($"round" === 4).select("node", "score"))
    assert(last === scores(PageRank.pagerankInt(e.toDF("src", "dst"), 4)))
    // all rounds retained: 5 versions x 4 nodes
    assert(ledger.count() === 20)
  }

  test("new edge between existing nodes (degree change on the source)") {
    check(Seq(("a", "b"), ("b", "c"), ("c", "a"), ("d", "a")),
      Seq(("a", "d")))
  }

  test("entirely new node arriving with edges both ways") {
    check(Seq(("a", "b"), ("b", "a"), ("b", "c")),
      Seq(("x", "a"), ("b", "x")))
  }

  test("new edge whose pair already exists (multi-edge) and a new sink") {
    check(Seq(("a", "b"), ("b", "a")),
      Seq(("a", "b"), ("a", "z")))
  }

  test("empty batch is the ledger verbatim") {
    val oldE = Seq(("a", "b"), ("b", "c"), ("c", "a"))
    check(oldE, Seq.empty[(String, String)])
  }

  test("cost ∝ batch: affected sets stay k-hop-bounded on a 400-node chain") {
    // chain n0 -> n1 -> ... -> n399 plus the reverse edges (no sinks);
    // batch: ONE new edge in the middle. The affected set is contained in
    // two radius-k balls around the edge's endpoints, so |A_k| <= 4k + 4
    // — on a 798-edge graph a full recompute would touch all 400 nodes
    // every round.
    val n = 400
    val fwd = (0 until n - 1).map(i => (s"n$i", s"n${i + 1}"))
    val oldE = fwd ++ fwd.map(_.swap)
    val newE = Seq(("n200", "n100"))
    val stats = scala.collection.mutable.ArrayBuffer.empty[Long]
    check(oldE, newE, iters = 5, stats = Some(stats))
    assert(stats.size === 5)
    stats.zipWithIndex.foreach { case (a, i) =>
      val k = i + 1
      assert(a <= 4L * k + 4,
        s"round $k affected $a nodes — frontier not batch-bounded")
    }
  }

  test("density guard: a batch whose influence ball covers the graph falls back") {
    // star graph: hub <-> every spoke; ONE new edge from the hub makes
    // outNbrs(D) the whole graph — the frontier cannot win, so the guard
    // must route to the plain recompute (statsOut stays empty) and the
    // result is still exact
    val spokes = (0 until 50).map(i => s"s$i")
    val oldE = spokes.flatMap(s => Seq(("hub", s), (s, "hub")))
    val newE = Seq(("hub", "snew"), ("snew", "hub"))
    val stats = scala.collection.mutable.ArrayBuffer.empty[Long]
    check(oldE, newE, iters = 4, stats = Some(stats))
    assert(stats.isEmpty, s"expected fallback, got frontier rounds: $stats")
  }
}
