package graft.pipeline

import scala.util.control.NonFatal

/** O2/O3/O4 — driver-side task orchestration (SURVEY.md §2.7).
  *
  * Reference: the Airflow DAG runs bronze→silver→gold with per-task
  * `retries=2` and task isolation (one task's failure doesn't corrupt
  * another's output). In this engine, INTRA-job retries are Spark's own
  * (`spark.task.maxFailures`, stage re-attempts); what the scheduler
  * provided on top — whole-task retry and failure isolation across a
  * registry of independent tasks — is this module. Kept deliberately
  * driver-side and tiny: orchestration composes jobs, it must never hold
  * data.
  */
object Orchestrate {

  /** O3 — run `f`, retrying up to `attempts` total tries on non-fatal
    * failure. Rethrows the last failure once exhausted.
    */
  def withRetries[T](attempts: Int,
                     onRetry: (Int, Throwable) => Unit = (_, _) => ())(f: => T): T = {
    require(attempts >= 1)
    var tryNo = 0
    var last: Throwable = null
    while (tryNo < attempts) {
      tryNo += 1
      try return f
      catch { case NonFatal(e) =>
        last = e
        if (tryNo < attempts) onRetry(tryNo, e)
      }
    }
    throw last
  }

  /** O2+O4 — fan out a registry of named independent tasks, each with its
    * own retry budget; failures are COLLECTED, not propagated, so one bad
    * task never blocks its siblings (the reference's task-isolation
    * property). Returns (successes, failures).
    */
  def runAll[T](tasks: Seq[(String, () => T)], attempts: Int = 1)
  : (Map[String, T], Map[String, Throwable]) = {
    val results = tasks.map { case (name, task) =>
      try Left(name -> withRetries(attempts)(task()))
      catch { case NonFatal(e) => Right(name -> e) }
    }
    (results.collect { case Left(kv) => kv }.toMap,
      results.collect { case Right(kv) => kv }.toMap)
  }
}
