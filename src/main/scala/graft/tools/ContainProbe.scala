package graft.tools

import org.apache.spark.sql.functions._

/** Decomposes `JaccardDedup.containmentPairs`'s cost at a given SF —
  * the round-14 verdict instrument: is the measured superlinear sf1 slope
  * (×16.5 warm at ×10 data) OUTPUT growth (planted dup mass per doc grows
  * in the fixture — any exact operator pays it), CANDIDATE growth (the
  * A-prefix × B-posting-list join), or verify-stage constant?
  *
  * Prints one line per stage: corpus docs, docs with ≥1 trigram, DISTINCT
  * trigram-set count (the rep-collapse headroom — if distinct ≪ docs, the
  * r13 dhash-pairs hash-first scheme transfers), candidate pairs entering
  * the verify join, verified output pairs, and wall time for candidates
  * vs the full operator (difference = verify+output stage).
  *
  * `sbt "runMain graft.tools.ContainProbe [sfDir] [reps]"`.
  */
object ContainProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val threshold = 0.4
    val ngram = 3
    val maxDf = 100L
    val spark = graft.GraftSession
      .builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.documents(spark, sfDir)

    // ---- static decomposition (mirrors containmentPairs's internals) ----
    val t = docs.select(col("doc_id"),
        graft.ext.JaccardDedup.ngramSet("text", ngram).as("ws"))
      .filter(size(col("ws")) >= 1)
      .select(col("doc_id"), expr("transform(ws, x -> xxhash64(x))").as("hs"))
      .persist()
    val nDocs = docs.count()
    val nSets = t.count()
    val nDistinctSets = t
      .select(xxhash64(to_json(array_sort(col("hs")))).as("sk"))
      .distinct().count()
    val toks = t.select(col("doc_id"), size(col("hs")).as("sz"),
        explode(col("hs")).as("th"))
    val freq = toks.groupBy(col("th")).agg(count(lit(1)).as("df"))
    val dfStats = freq.agg(max(col("df")).as("max_df"),
        sum(when(col("df") > maxDf, col("df"))).as("capped_mass"),
        count(lit(1)).as("n_tokens")).collect()(0)
    val tDec = lit(new java.math.BigDecimal(java.lang.Double.toString(threshold)))
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("df"), col("th"))
    val ranked = toks.join(freq, "th")
      .withColumn("rn", row_number().over(byDoc))
    val prefixLen = col("sz") - ceil(tDec * col("sz")) + lit(1)
    val slim = ranked.filter(col("df") <= maxDf)
      .select(col("th"), col("doc_id"), col("rn"), col("sz")).persist()
    val candPrePos = slim.filter(col("rn") <= prefixLen)
      .select(col("th"), col("doc_id").as("doc_a"), col("rn").as("ra"), col("sz").as("sa"))
      .join(slim.select(col("th"), col("doc_id").as("doc_b"),
        col("rn").as("rb"), col("sz").as("sb")), Seq("th"))
      .filter(col("sa") < col("sb") ||
        (col("sa") === col("sb") && col("doc_a") < col("doc_b")))
    val nCandJoinRows = candPrePos.count()
    val nCand = candPrePos
      .filter(lit(1) + least(col("sa") - col("ra"), col("sb") - col("rb")) >=
        ceil(tDec * col("sa")))
      .select(col("doc_a"), col("doc_b"))
      .dropDuplicates("doc_a", "doc_b").count()
    val out = graft.ext.JaccardDedup.containmentPairs(docs, threshold, ngram, maxDf)
    val nOut = out.count()
    println(s"[containprobe] sf=$sfDir docs=$nDocs sets=$nSets distinct_sets=$nDistinctSets " +
      s"tokens=${dfStats.getAs[Long]("n_tokens")} max_df=${dfStats.getAs[Long]("max_df")} " +
      s"capped_token_mass=${Option(dfStats.get(1)).getOrElse(0L)} " +
      s"cand_join_rows=$nCandJoinRows cand_pairs=$nCand out_pairs=$nOut")
    slim.unpersist(); t.unpersist()

    // ---- timing: full operator, median of reps ----
    val times = (1 to reps).map { i =>
      val t0 = System.nanoTime()
      graft.ext.JaccardDedup.containmentPairs(docs, threshold, ngram, maxDf)
        .write.mode("overwrite").format("noop").save()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[containprobe] full run$i: $dt%.2f s")
      dt
    }.sorted
    println(f"[containprobe] full median: ${times(times.size / 2)}%.2f s over $reps reps")
    spark.stop()
  }
}
