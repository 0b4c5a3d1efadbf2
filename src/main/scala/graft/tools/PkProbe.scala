package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off probe for the x_dedup_priority_keep warm/isolated inversion
  * (round-11 verdict "what's wrong" item 2): replays the bench sweep's
  * prefix — every registry entry that precedes the victim in the sweep's
  * map-iteration order — then times the victim's reps, then times them
  * again after running the REMAINING entries (the isolated block's
  * position). Prints per-rep seconds so the inversion (slow mid-sweep,
  * fast at the end) is directly observable and bisectable via the
  * `prefixFraction` arg.
  */
object PkProbe {
  def main(args: Array[String]): Unit = {
    val victim = args.lift(0).getOrElse("x_dedup_priority_keep")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val prefixFraction = args.lift(2).map(_.toDouble).getOrElse(1.0)
    val spark = graft.GraftSession
      .builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run(name: String): Double = {
      val t0 = System.nanoTime()
      try graft.SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      catch { case e: Throwable => System.err.println(s"[pk] $name: $e") }
      (System.nanoTime() - t0) / 1e9
    }
    def reps(tag: String): Unit = {
      val ts = Seq.fill(5)(run(victim)).map(t => math.rint(t * 100) / 100)
      println(s"[pk] $tag reps=${ts.mkString(",")}")
    }
    val ks = graft.SparkEntry.queries.keys.toSeq
    val i = ks.indexOf(victim)
    require(i >= 0, s"unknown victim $victim")
    val before = ks.take(i)
    val prefix = before.take((before.size * prefixFraction).toInt)
    println(s"[pk] sweep position $i of ${ks.size}; running ${prefix.size} predecessors")
    reps("baseline(fresh)")
    prefix.foreach(run)
    reps("after-prefix")
    ks.drop(i + 1).foreach(run)
    reps("at-end(isolated-position)")
    spark.stop()
  }
}
