package graft.tools

import org.apache.spark.sql.functions._

/** Stress for the deletion-neighborhood family at WEB-SCALE vocabulary
  * sizes (round-14 verdict item 7): the `EditDist` scale claim is
  * "vocabulary-sized, not corpus-sized", which rides on natural-language
  * vocab ≪ corpus — but a web corpus has 10⁸⁺ distinct tokens (typos,
  * ids, urls, hex blobs). This probe builds a SYNTHETIC heavy-tailed
  * vocabulary directly (the corpus→vocab aggregation is measured by the
  * registry entries; what's untested is the neighborhood join when |V|
  * itself is large) and measures [[graft.ext.EditDist.nearPairs]] at
  * k = 1 and 2:
  *
  *  - words: deterministic hex pseudo-tokens, lengths 4–20 cps uniform
  *    (the SHORT end is the skew risk — a length-3 hex variant key space
  *    is only 16³, so deletion buckets of 4-cp words collide heavily);
  *  - counts: Zipf head (`⌊n/(id+1)⌋`, min 1);
  *  - planted typos: every 10th word also emits its last-char deletion,
  *    so true pairs exist at every scale and output is non-trivial.
  *
  * Reports |V|, key rows (variants/word), candidate pairs, output pairs,
  * and median wall time — the numbers SCALE.md's vocab section records.
  * Run at two sizes for the slope, e.g.:
  * `sbt "runMain graft.tools.VocabStress 200000 2"` then `2000000 2`.
  */
object VocabStress {

  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toInt).getOrElse(200000)
    val maxK = args.lift(1).map(_.toInt).getOrElse(2)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = graft.GraftSession
      .builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = spark.range(n).select(
      expr("substr(md5(cast(id as string)), 1, cast(4 + id % 17 as int))").as("word"),
      greatest(lit(1L), expr("cast(floor(1000000 / (id + 1)) as bigint)")).as("cnt"),
      col("id"))
    val vocab = base.select(
        explode(when(col("id") % 10 === 0,
            array(col("word"), expr("substr(word, 1, length(word) - 1)")))
          .otherwise(array(col("word")))).as("word"),
        col("cnt"))
      // collapse collisions (md5 prefixes + planted deletions can repeat)
      .groupBy("word").agg(sum("cnt").as("cnt"))
      .persist()
    val nV = vocab.count()
    println(s"[vocabstress] |V|=$nV (requested $n)")

    (1 to maxK).foreach { k =>
      val ts = (1 to reps).map { i =>
        val t0 = System.nanoTime()
        val out = graft.ext.EditDist.nearPairs(vocab, maxDist = k)
        val nOut = out.count()
        val dt = (System.nanoTime() - t0) / 1e9
        out.unpersist(blocking = false)
        (dt, nOut)
      }
      val med = ts.map(_._1).sorted.apply(ts.size / 2)
      println(f"[vocabstress] k=$k |V|=$nV pairs=${ts.head._2} median=$med%.2f s over $reps reps")
    }
    vocab.unpersist()
    spark.stop()
  }
}
