package graft.tools

import org.apache.spark.sql.functions._

/** Measures the entity-resolution match-graph closure under BOTH
  * connected-components variants (round-14 verdict item 6): label
  * propagation (`Components.connectedComponents` — what
  * `x_entity_resolution` ships) vs the two-phase large-star/small-star
  * scheme (`connectedComponentsStar` — the deep-graph-safe variant). The
  * ER match graph is diameter ≤ 2 by construction (dirty twin ↔ clean ↔
  * other dirty twin; the twins never match each other directly), so
  * label-prop converges in ~2 rounds — this probe decides whether that
  * beats star's per-round constant (2 aggs + join vs 1 join + agg) at ×10
  * data, or whether to switch. Asserts both closures agree bit for bit
  * before timing.
  *
  * `sbt "runMain graft.tools.ErCcProbe [sfDir] [reps]"`.
  */
object ErCcProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = graft.GraftSession
      .builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the x_entity_resolution match graph, verbatim
    val c = graft.Tables.customer(spark, sfDir).select(col("c_custkey"), col("c_name"))
    def dirtied(off: Long, rep: String, mod: Int, suf: String) =
      c.select((col("c_custkey") + off).as("d_custkey"),
        concat(regexp_replace(col("c_name"), "#", rep),
          when(col("c_custkey") % mod === 0, lit(suf)).otherwise(lit("")))
          .as("d_name"))
    def pairs(d: org.apache.spark.sql.DataFrame) =
      graft.ops.FuzzyJoin.byEditDistance(c, d, "c_name", "d_name",
          substring(col("c_name"), 14, 5), substring(col("d_name"), 14, 5),
          maxDist = 2)
        .select(col("c_custkey").as("doc_a"), col("d_custkey").as("doc_b"))
    val edges = pairs(dirtied(10000000L, "-", 2, "x"))
      .unionByName(pairs(dirtied(20000000L, "+", 3, "y")))
      .persist()
    val nEdges = edges.count()

    // equality first: both fixpoints label the same nodes identically
    val lp = graft.ext.Components.connectedComponents(edges)
    val st = graft.ext.Components.connectedComponentsStar(edges)
    val diff = lp.unionByName(st).groupBy("doc_id", "component")
      .count().filter(col("count") =!= 2).count()
    require(diff == 0, s"closures disagree on $diff (node,label) rows")

    def time(name: String, fn: () => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to reps).map { i =>
        val t0 = System.nanoTime()
        fn().write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[ercc] $name: median ${ts(ts.size / 2)}%.2f s over $reps reps " +
        s"(edges=$nEdges, sf=$sfDir)")
    }
    time("label-prop", () => graft.ext.Components.connectedComponents(edges))
    time("star      ", () => graft.ext.Components.connectedComponentsStar(edges))
    edges.unpersist()
    spark.stop()
  }
}
