package graft

/** Wall-clock registry for one-time-per-corpus builds (IVF train/assign,
  * the CC dedup ledger, incremental-silver staging) that run inside
  * whichever registry query happens to touch them first. Bench subtracts
  * the build seconds from that query's cold time and itemizes them in a
  * separate `builds` JSON field, so cold totals stay comparable
  * round-over-round instead of absorbing ~20 s of amortized-once work
  * into an arbitrary query's number (round-3 verdict, "what's wrong" #2).
  */
object BuildTimes {
  val times = scala.collection.concurrent.TrieMap.empty[String, Double]

  def timed[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    try f
    finally {
      val dt = (System.nanoTime() - t0) / 1e9
      times.updateWith(name) { prev => Some(prev.getOrElse(0.0) + dt) }: Unit
    }
  }

  def total: Double = times.values.sum
}
