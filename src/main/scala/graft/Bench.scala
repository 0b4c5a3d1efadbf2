package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // default 5 (was 3 through r9): the warm medians are the round-over-
    // round signal, and in BENCH_r09 two of them came out 6-28× their
    // isolated values because a contention window (the driver's concurrent
    // 1-core DuckDB oracle run) contaminated 2 of 3 reps — a median of 5
    // survives 2 contaminated reps, a median of 3 does not
    val warmRuns = sys.env.getOrElse("SPARK_GRAFT_WARM_RUNS", "5").toInt
    // optional skip list (comma-separated names) for out-of-contract runs,
    // e.g. excluding the by-spec-quadratic pair forms from scale-up benches;
    // empty by default so the driver's per-round run is unchanged
    val skip = sys.env.getOrElse("SPARK_GRAFT_BENCH_SKIP", "")
      .split(",").map(_.trim).filter(_.nonEmpty).toSet
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up: pay JVM/codegen/parquet-footer startup once, outside any
    // query's timing (first-query numbers were otherwise ~4s heavier)
    try {
      spark.range(1000000).selectExpr("sum(id)").write.mode("overwrite").format("noop").save()
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy("l_returnflag").count()
        .write.mode("overwrite").format("noop").save()
    } catch { case _: Throwable => }

    // noop sink: forces FULL evaluation of every output column (a bare
    // count() lets Spark prune projections and under-reports the work).
    // A failing query must NOT contribute its (near-zero) elapsed time —
    // that would report an engine regression as a bench improvement.
    val failed = scala.collection.mutable.LinkedHashSet.empty[String]
    // One-time-per-corpus builds (IVF train, CC ledger, incremental
    // staging) run inside whichever query touches them first; BuildTimes
    // records them, and subtracting the delta here keeps each query's
    // number a QUERY cost — builds are itemized in their own JSON field.
    def once(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val b0 = BuildTimes.total
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).write.mode("overwrite").format("noop").save() }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name: $e")
        failed += name
      }
      math.max(0.0, (System.nanoTime() - t0) / 1e9 - (BuildTimes.total - b0))
    }

    // per query: one cold run (includes this query's planning/codegen) plus
    // the median of `warmRuns` repeats — host noise on a shared box is ~2×
    // run-to-run (BENCH.md), so round-over-round regressions are only
    // detectable in warm medians, while cold totals stay comparable with
    // earlier rounds' single-run numbers
    val results = SparkEntry.queries.filterNot(q => skip(q._1)).map { case (name, fn) =>
      val cold = once(name, fn)
      val warms = Seq.fill(warmRuns)(once(name, fn)).sorted
      val median = if (warms.isEmpty) cold else warms(warms.size / 2)
      name -> ((cold, median))
    }.filter { case (name, _) => !failed.contains(name) }
    def obj(f: ((Double, Double)) => Double) = results
      .map { case (k, v) => s"\"" + k + "\":" + f(v) }.mkString("{", ",", "}")
    val total = results.values.map(_._1).sum
    val warmTotal = results.values.map(_._2).sum
    // evaluated here, BEFORE the isolated blocks below can touch builds
    val builds = BuildTimes.times.toSeq.sortBy(_._1)
      .map { case (k, v) => s"\"$k\":$v" }.mkString("{", ",", "}")
    // Isolated re-measure of the 10 most expensive queries (by warm
    // median): more reps, run back-to-back after the sweep with nothing
    // else in flight, so a host-contention spike during the main loop
    // (BENCH_r04's cc_pair_graph read 41.9 s vs 3.5 s clean minutes apart)
    // doesn't masquerade as an engine regression. Medians of 5 are robust
    // to ~2 contaminated reps; round-over-round comparisons should read
    // THIS block first. A query that FAILS during its isolated reps is
    // dropped from the block (its near-zero failure reps would fake a
    // speedup — same rule as the main sweep) and lands in `errors`.
    val isolatedRuns = math.max(1, sys.env.getOrElse("SPARK_GRAFT_ISOLATED_RUNS", "5").toInt)
    val isolated = results.toSeq.sortBy(-_._2._2).take(10).flatMap { case (name, _) =>
      val reps = Seq.fill(isolatedRuns)(once(name, SparkEntry.queries(name))).sorted
      if (failed.contains(name)) None else Some(name -> reps(reps.size / 2))
    }
    val isoObj = isolated.map { case (k, v) => s"\"$k\":$v" }.mkString("{", ",", "}")
    // Isolated re-measure of expensive BUILDS (round-9 verdict item 1):
    // the once-per-corpus builds are single-shot in the sweep — first
    // touch inside whichever query hits them — so they had no contention
    // defense (BENCH_r09: cc_pair_graph 74.0 s with zero code change vs
    // 22.8 s in r08). For every build whose first-touch cost exceeds the
    // threshold, evict its cache via BuildRebuild and rebuild N times
    // back-to-back, nothing else in flight; the median is the number to
    // read. Snapshot the itemization FIRST — the reps accumulate into
    // BuildTimes and must not inflate the reported `builds`.
    val buildItem = BuildTimes.times.toMap
    val buildsTotal = buildItem.values.sum
    val buildIsoSec = sys.env.getOrElse("SPARK_GRAFT_BUILD_ISO_SEC", "8.0").toDouble
    val buildIsoRuns = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BUILD_ISO_RUNS", "3").toInt)
    // same failure rule as the query blocks: a rep that THROWS must not
    // contribute its near-zero elapsed time to the median (a broken 20 s
    // build would read as a 0.01 s "speedup") — the build drops from the
    // block and lands in `errors` as build:<name>
    val buildsIso = buildItem.toSeq.filter(_._2 >= buildIsoSec).map(_._1).sorted.flatMap { name =>
      BuildRebuild.get(name).flatMap { hook =>
        var ok = true
        val reps = Seq.fill(buildIsoRuns) {
          val t0 = System.nanoTime()
          try hook(spark, sfDir)
          catch { case e: Throwable =>
            ok = false
            System.err.println(s"[bench] rebuild $name: $e")
          }
          (System.nanoTime() - t0) / 1e9
        }.sorted
        if (ok) Some(name -> reps(reps.size / 2))
        else { failed += s"build:$name"; None }
      }
    }
    val buildsIsoObj = buildsIso.map { case (k, v) => s"\"$k\":$v" }.mkString("{", ",", "}")
    // rendered AFTER the isolated blocks so their failures are included
    val errs = failed.map(n => s"\"$n\"").mkString("[", ",", "]")
    val fullLine = s"""{"metric":"total","value":$total,"unit":"sec","queries":${obj(_._1)},"warm_total":$warmTotal,"warm_queries":${obj(_._2)},"warm_runs":$warmRuns,"isolated":$isoObj,"isolated_runs":$isolatedRuns,"builds":$builds,"builds_total":$buildsTotal,"builds_isolated":$buildsIsoObj,"build_iso_runs":$buildIsoRuns,"errors":$errs,"sf":"$sfDir"}"""
    println(fullLine)
    // full record also lands in a sidecar file — the stdout line above
    // outgrew the driver's tail capture once the registry passed ~150
    // entries (BENCH_r06/r07 recorded "parsed": null)
    val sidecar = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/root/repo/BENCH_FULL.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(sidecar), fullLine + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] sidecar write failed: $e") }
    // compact summary (<1 KB) as the LAST stdout line: a tail capture keeps
    // the END of stdout, so this line always survives intact and parseable
    // — totals, errors, and the top-10 isolated medians; per-query detail
    // lives on the full line / sidecar
    def r3(d: Double) = math.rint(d * 1000) / 1000
    val topObj = isolated.map { case (k, v) => s"\"$k\":${r3(v)}" }.mkString("{", ",", "}")
    val topBuilds = buildsIso.map { case (k, v) => s"\"$k\":${r3(v)}" }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$topObj,"n_queries":${results.size},"warm_total":${r3(warmTotal)},"builds_total":${r3(buildsTotal)},"builds_isolated":$topBuilds,"errors":$errs,"summary_of":"top-10 isolated medians; full per-query record in $sidecar","sf":"$sfDir"}""")
    spark.stop()
  }
}
