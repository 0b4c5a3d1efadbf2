package graft

import org.apache.spark.sql.SparkSession

/** Plan inspection + warm timing for a single registry query:
  * `sbt "runMain graft.Explain <queryName> [sfDir]"`.
  * Prints the formatted physical plan (check PushedFilters / ReadSchema /
  * WholeStageCodegen spans) and runs the query twice against the noop sink
  * (second run = warm JIT) — the iterate loop SURVEY.md §4 calls for.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.explain("formatted")
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      println(f"[explain] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
