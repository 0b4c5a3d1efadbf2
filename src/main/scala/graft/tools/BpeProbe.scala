package graft.tools

import org.apache.spark.sql.SparkSession

/** Scaling probe for BPE training (SCALE.md): sequential [[graft.ext.Bpe.train]]
  * pays one driver-round job per merge, batched
  * [[graft.ext.Bpe.trainBatched]] amortizes ~`batch` merges per round.
  * Prints one JSON line with wall-clock seconds for (sequential, 10
  * merges), (batched, 10), (batched, 100) on the given corpus dir.
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val batch = args.lift(1).map(_.toInt).getOrElse(16)
    val spark = graft.GraftSession
      .builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.documents(spark, dir)
    docs.count() // warm the scan outside any timing
    def timed[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val a = f; ((System.nanoTime() - t0) / 1e9, a)
    }
    val (tSeq10, m10) = timed(graft.ext.Bpe.train(docs, "text", numMerges = 10))
    val (tB10, b10) = timed(graft.ext.Bpe.trainBatched(docs, "text", numMerges = 10, batch = batch))
    val (tB100, b100) = timed(graft.ext.Bpe.trainBatched(docs, "text", numMerges = 100, batch = batch))
    println(s"""{"metric":"bpe_train","dir":"$dir","batch":$batch,""" +
      s""""seq10_sec":$tSeq10,"batched10_sec":$tB10,"batched100_sec":$tB100,""" +
      s""""merges_seq10":${m10.size},"merges_b10":${b10.size},"merges_b100":${b100.size}}""")
    spark.stop()
  }
}
