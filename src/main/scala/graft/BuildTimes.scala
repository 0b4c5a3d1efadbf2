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

  // Builds nest (the CC ledger times the pair-graph build it triggers; the
  // layout write times IVF training): each name records its EXCLUSIVE time
  // only, so `total` equals the outermost builds' wall clock and Bench's
  // subtraction can never exceed the elapsed time it is subtracted from.
  // Nesting is per-thread (a build runs inside one query's thread).
  private val childSecs = new ThreadLocal[Double] {
    override def initialValue: Double = 0.0
  }

  def timed[T](name: String)(f: => T): T = {
    val outer = childSecs.get()
    childSecs.set(0.0)
    val t0 = System.nanoTime()
    try f
    finally {
      val dt = (System.nanoTime() - t0) / 1e9
      val self = math.max(0.0, dt - childSecs.get())
      times.updateWith(name) { prev => Some(prev.getOrElse(0.0) + self) }: Unit
      childSecs.set(outer + dt)
    }
  }

  def total: Double = times.values.sum
}
