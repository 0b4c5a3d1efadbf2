package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measurement main for the x_probe_moments cost decomposition (round 15,
  * guide §1: measure BEFORE choosing the restructure). The exact-decimal
  * moment matrix explodes (d+2)(d+3)/2 product rows per input row; this
  * probe times the shipped form against (a) a single-generator rewrite
  * (no per-i `slice` allocation, one flatten), and (b) the same shapes
  * with a plain double sum in place of the decimal sum — which isolates
  * the decimal-aggregation share from the generator share. Variants (a)
  * emit IDENTICAL values to the shipped form (asserted here before any
  * timing); the double-sum variants are cost probes only, never
  * registry candidates.
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.MomentsProbe [sfDir] [reps]"
  */
object MomentsProbe {
  private def zOf(corpus: DataFrame): DataFrame =
    corpus.select(expr("""concat(cast(embedding as array<double>),
      array(cast(1.0 as double)), array(cast(label as double)))""").as("z"))

  /** Single-generator form: one nested-transform triangle + flatten. */
  def momentsFlat(corpus: DataFrame): DataFrame =
    zOf(corpus)
      .select(explode(expr(
        """flatten(transform(sequence(0, size(z) - 1), i ->
             transform(sequence(i, size(z) - 1), j ->
               struct(i AS i, j AS j,
                 element_at(z, i + 1) * element_at(z, j + 1) AS p))))""")).as("t"))
      .select(col("t.i").as("i"), col("t.j").cast("int").as("j"), col("t.p").as("p"))
      .groupBy("i", "j")
      .agg(round(sum(col("p").cast("decimal(28,10)")), 6).cast("double").as("v"))

  /** Shipped generator shape, double sum — generator cost w/o decimals. */
  def momentsDoubleSum(corpus: DataFrame): DataFrame =
    zOf(corpus)
      .select(explode(expr(
        """transform(sequence(0, size(z) - 1), i ->
             struct(i AS i, element_at(z, i + 1) AS zi,
                    slice(z, i + 1, size(z) - i) AS tail))""")).as("t"))
      .select(col("t.i").as("i"),
        posexplode(expr("transform(t.tail, zj -> t.zi * zj)")).as(Seq("dj", "p")))
      .select(col("i"), (col("i") + col("dj")).cast("int").as("j"), col("p"))
      .groupBy("i", "j").agg(sum(col("p")).as("v"))

  /** Flat generator, double sum. */
  def momentsFlatDoubleSum(corpus: DataFrame): DataFrame =
    zOf(corpus)
      .select(explode(expr(
        """flatten(transform(sequence(0, size(z) - 1), i ->
             transform(sequence(i, size(z) - 1), j ->
               struct(i AS i, j AS j,
                 element_at(z, i + 1) * element_at(z, j + 1) AS p))))""")).as("t"))
      .select(col("t.i").as("i"), col("t.j").cast("int").as("j"), col("t.p").as("p"))
      .groupBy("i", "j").agg(sum(col("p")).as("v"))

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.Tables.embeddings(spark, sfDir)

    // value identity of the candidate rewrite before any timing
    val shipped = graft.ext.LinearProbe.moments(emb)
    val flat = momentsFlat(emb)
    val diff = shipped.withColumnRenamed("v", "va")
      .join(flat.withColumnRenamed("v", "vb"), Seq("i", "j"), "full")
      .filter(col("va").isNull || col("vb").isNull || col("va") =!= col("vb"))
      .count()
    println(s"[moments-probe] flat-vs-shipped mismatched cells: $diff")

    def time(name: String, fn: => DataFrame): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[moments-probe] $name%-22s median ${ts(ts.size / 2)}%.3f s  (all: ${ts.map(t => f"$t%.2f").mkString(", ")})")
    }
    time("shipped", graft.ext.LinearProbe.moments(emb))
    time("flat", momentsFlat(emb))
    time("shipped-doublesum", momentsDoubleSum(emb))
    time("flat-doublesum", momentsFlatDoubleSum(emb))
    time("fast-twin", graft.ext.LinearProbe.momentsFast(emb))
    spark.stop()
  }
}
