package graft.tools

import org.apache.spark.sql.execution.ExplainMode

/** Dump `.explain("formatted")` for a list of registry entries into
  * `plans/<roundDir>/<name>_<tag>.txt` — the before/after plan evidence an
  * optimization round commits (the judge checks plan claims against these
  * files without running Spark).
  *
  * Usage: sbt "runMain graft.tools.PlanDump <dir> <tag> <query> [query ...]"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val tag = args(1)
    val names = args.drop(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    names.foreach { name =>
      try {
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$dir/${name}_$tag.txt"), plan)
        println(s"[plandump] wrote $dir/${name}_$tag.txt")
      } catch {
        case e: Throwable => System.err.println(s"[plandump] $name FAILED: $e")
      }
    }
    spark.stop()
  }
}
