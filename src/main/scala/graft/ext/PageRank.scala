package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank in exact integer arithmetic — the link-graph centrality signal
  * web-corpus pipelines use for document-level quality weighting (OPT/
  * RefinedWeb-style "pages linked from important pages are themselves
  * important"; also the usual seed score for crawl frontier ordering).
  *
  * Why integer: cross-engine float summation is order-dependent, so a
  * float PageRank can never hash-match a DuckDB oracle. Scores here are
  * longs scaled by `scale` (default 1e12): every node starts at `scale`;
  * one round sends each node `(score DIV outdeg)` along each out-edge,
  * damps each arriving contribution to `(c · dampNum) DIV dampDen`
  * (default 17/20 = 0.85 exactly), and re-bases at
  * `scale · (dampDen − dampNum) / dampDen`. Floor division loses < 1
  * scaled unit (1e-12) per step — far below any ranking-relevant
  * difference — and makes every intermediate a deterministic 64-bit
  * integer in BOTH engines (DuckDB mirrors with `//`).
  *
  * Scale shape: each round is one keyed join (edge src → score) and one
  * keyed aggregation (sum by dst) — the standard message-passing round,
  * 16 B rows, shuffled on node keys; rounds localCheckpoint like the
  * [[Components]] fixpoint so lineage stays flat. Iteration count is
  * FIXED (default 10), not convergence-tested: a deterministic round
  * count is what lets the oracle unroll, and 10 rounds at damping 0.85
  * bounds the un-propagated tail to 0.85¹⁰ ≈ 20% of one hop — ranking-
  * stable on real graphs. Sink nodes (no out-edges) absorb and leak mass
  * (the "leaky" PageRank variant — documented, mirrored in the oracle);
  * feed bidirectional edges if sinks matter. Long-vs-overflow: a node's
  * in-sum is bounded by total graph mass ≈ |V|·scale, so at the default
  * scale the long headroom runs out around |V| ≈ 10⁶ on a worst-case
  * star graph; for web-scale graphs drop `scale` (1e9 → |V| ≈ 10⁹) — the
  * arithmetic contract is scale-relative, not absolute.
  */
object PageRank {

  /** `(node, score)` after `iters` rounds over `edges` (`src`, `dst`
    * string columns; parallel edges are deliberate multi-edges — dedup
    * upstream if that is not the graph you mean).
    */
  def pagerankInt(edges: DataFrame, iters: Int = 10,
                  scale: Long = 1000000000000L,
                  dampNum: Long = 17L, dampDen: Long = 20L): DataFrame = {
    require(iters >= 1, s"pagerank: iters >= 1, got $iters")
    require(scale % dampDen == 0,
      s"pagerank: scale must be divisible by dampDen for an exact base, got $scale % $dampDen")
    require(dampNum > 0 && dampNum < dampDen, "pagerank: 0 < dampNum < dampDen")
    val base = scale / dampDen * (dampDen - dampNum)
    // the caller's edge expression can be arbitrarily expensive (a join
    // pipeline); it feeds BOTH the degree build and the node set, so pin it
    val e = edges.select(col("src"), col("dst")).persist()
    // (src, dst, deg) joined ONCE and pre-partitioned on the per-round join
    // key: the deg join must not repeat per round, and a stable hash(src)
    // layout lets every round's score join reuse this side's partitioning
    // (one exchange per round — the message shuffle — instead of four)
    val ed = e.join(e.groupBy(col("src")).agg(count(lit(1)).as("deg")), "src")
      .repartition(col("src"))
      .select(col("src"), col("dst"), col("deg")).persist()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .repartition(col("node")).persist()
    var scores = nodes.withColumn("score", lit(scale)).localCheckpoint(true)
    var round = 0
    while (round < iters) {
      // shuffle_hash, not merge: the checkpointed score frame carries no
      // stats, so the planner would sort-merge — re-SORTING the edge side
      // every round. Hashing the per-partition score slice is the keyed,
      // broadcast-free form that also holds at web scale (a node-sized
      // build side never fits one broadcast, but a partition's slice does).
      val contrib = ed
        .join(scores.withColumnRenamed("node", "src").hint("shuffle_hash"), "src")
        .select(col("dst").as("node"),
          expr(s"((score DIV deg) * $dampNum) DIV $dampDen").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("inc"))
      val next = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + coalesce(col("inc"), lit(0L))).as("score"))
        .localCheckpoint(true)
      Components.freeCheckpoint(scores)
      scores = next
      round += 1
    }
    e.unpersist(); ed.unpersist(); nodes.unpersist()
    scores
  }
}
