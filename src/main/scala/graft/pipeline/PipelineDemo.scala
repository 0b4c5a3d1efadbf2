package graft.pipeline

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._
import graft.io.Sinks

/** End-to-end medallion run on acordos-shaped data: raw rows → Bronze →
  * Silver → Gold → four partitioned parquet sinks, then read-back counts.
  * `sbt "runMain graft.pipeline.PipelineDemo [outDir]"`.
  *
  * This is the reference's whole DAG (dag_main.py:79) as one driver program:
  * gold computed ONCE and persisted (vs the reference's 4× recomputation),
  * sinks partitioned by `ano` so BI predicates prune files.
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0)
              else java.nio.file.Files.createTempDirectory("graft-gold").toString
    val spark = graft.GraftSession.builder("4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val raw = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("01/02/2010", " frança ", "País", "Europa", "Europa Ocidental", "Paris",
          "bilateral", "acordo d'água", "cooperação", "hídricos", "memorando",
          "01/02/2020", "http://a"),
        Row("05/06/2011", "ONU", "Organização", "-", null, "Genebra",
          "multilateral", "tratado solar", "-", "solar", "tratado", null, null),
        Row("01/02/2010", " frança ", "País", "Europa", "Europa Ocidental", "Paris",
          "bilateral", "acordo d'água", "cooperação", "hídricos", "memorando",
          "99/99/9999", "http://b"))),
      StructType(Schemas.rawHeaders.map(h => StructField(h, StringType))))

    val bronze = Bronze.transform(Bronze.requireNonEmpty(raw, "acordos sheet"))
    val silver = Silver.transform(bronze)
    val gold = Gold.transform(silver)

    Sinks.writeParquet(gold.acordos, s"$out/gld_acordos", partitionBy = Seq("ano"))
    Sinks.writeParquet(gold.hier, s"$out/gld_hier")
    Sinks.writeParquet(gold.pais, s"$out/gld_pais")
    Sinks.writeParquet(gold.org, s"$out/gld_org")

    Seq("gld_acordos", "gld_hier", "gld_pais", "gld_org").foreach { t =>
      println(s"[pipeline] $t rows=${spark.read.parquet(s"$out/$t").count()}")
    }
    println(s"[pipeline] outputs under $out")
    spark.stop()
  }
}
