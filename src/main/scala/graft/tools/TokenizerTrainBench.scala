package graft.tools

/** Round-count measurement for the batched tokenizer trainers:
  * `sbt "runMain graft.tools.TokenizerTrainBench [sfDir] [merges] [batch]"`
  * trains WordPiece on the documents table sequentially and batched and
  * prints both wall times plus the equality class of the resulting merge
  * sets (the merge LIST may legally order differently across the two —
  * pairs created inside a batched round wait for the next round — so the
  * comparison is on sets, informational only). The BENCH.md pin for the
  * round-13 verdict item 4 (one Spark round per merge → ~merges/batch
  * rounds) is produced by this main.
  */
object TokenizerTrainBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val merges = args.lift(1).map(_.toInt).getOrElse(8)
    val batch = args.lift(2).map(_.toInt).getOrElse(8)
    val spark = graft.GraftSession
      .builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.documents(spark, sfDir)
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[trainbench] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // warm the JVM + parquet footers outside either timed region
    docs.count(): Unit
    val seq = timed(s"wordpiece sequential merges=$merges") {
      graft.ext.WordPiece.train(docs, "text", merges)
    }
    val bat = timed(s"wordpiece batched merges=$merges batch=$batch") {
      graft.ext.WordPiece.trainBatched(docs, "text", merges, batch)
    }
    val samePairs = seq.map(m => (m._1, m._2)).toSet == bat.map(m => (m._1, m._2)).toSet
    println(s"[trainbench] merge SETS equal: $samePairs (order may differ by design)")
    spark.stop()
  }
}
