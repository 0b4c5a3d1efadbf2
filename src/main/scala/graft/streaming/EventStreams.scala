package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming counterparts of the batch event analytics in
  * `graft.queries.EventsQueries` (the reference is batch-only — SURVEY.md
  * §2.8 — so this is the engine's streaming extension surface).
  *
  * Design: streams are the same declarative plans as batch — `readStream` →
  * transform → `writeStream` — so one definition serves both. Watermarks
  * bound state; sessionization keeps per-key state in
  * `flatMapGroupsWithState` with a processing-time timeout as the eviction
  * path. Tested with MemoryStream in EventStreamsSpec (no kafka in this
  * container; the source is pluggable by construction).
  */
object EventStreams {

  final case class EventRow(event_id: Long, ts: java.sql.Timestamp,
                            user_id: Long, event_type: String, value: Double)

  final case class SessionState(lastSec: Long, openSessions: Long, nEvents: Long)

  final case class SessionUpdate(user_id: Long, n_sessions: Long, n_events: Long)

  final case class ScdState(curType: String, fromSec: Long,
                            lastSec: Long, lastId: Long)

  final case class ScdRun(user_id: Long, event_type: String,
                          from_sec: Long, to_sec: Long)

  /** Tumbling 1-hour windowed counts with a 2-hour watermark (bounds the
    * aggregation state; late events beyond it are dropped).
    */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("bucket_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Streaming exact dedup — the incremental-ingest half of the dedup
    * family (ExactDedup is the batch half): duplicates of a key arriving
    * within the watermark horizon are dropped, and each key's state is
    * evicted once the watermark passes it, so state is O(keys per horizon),
    * not O(stream). First occurrence is emitted immediately (append mode).
    * Batch twin: `dropDuplicates(keys)` — oracle-checked as
    * `x_stream_dedup_twin`.
    */
  def dedupStream(events: DataFrame, keys: Seq[String] = Seq("event_id"),
                  watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Declarative streaming sessionization via native `session_window`:
    * events with gaps < `gap` merge into one growing window; a session's
    * row is emitted when the watermark passes its close (append mode).
    * The DECLARATIVE twin of [[sessionize]]'s explicit
    * flatMapGroupsWithState state machine — use this form when per-session
    * aggregates suffice, the custom-state form when mid-session emission
    * or non-time eviction rules are needed. Batch twin: e6_session_window
    * (oracle-checked).
    */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes",
                     watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").as("session_start"), col("n_events"))

  /** Stream-stream interval join: actions of one stream matched to same-user
    * actions of another within a trailing time window. Both sides carry
    * watermarks and the join condition bounds event time on both sides, so
    * Spark can evict buffered state once the watermark passes a row's
    * match window — state is O(events per window), not O(stream).
    */
  def correlate(left: DataFrame, right: DataFrame,
                windowSec: Long = 1800, watermark: String = "1 hour"): DataFrame = {
    val l = left.withWatermark("ts", watermark).alias("l")
    val r = right.withWatermark("ts", watermark).alias("r")
    l.join(r, expr(
      s"""l.user_id = r.user_id AND
         |r.ts BETWEEN l.ts - INTERVAL $windowSec SECONDS AND l.ts AND
         |l.event_id != r.event_id""".stripMargin))
      .select(col("l.event_id").as("event_a"), col("r.event_id").as("event_b"),
        col("l.user_id").as("user_id"))
  }

  /** Gap-based sessionization (30-min inactivity) as explicit streaming
    * state: per user, count sessions opened so far. Works identically on a
    * batch Dataset (state starts empty, whole group in one call) — the
    * batch query `e3_sessions_per_user` is the oracle-checked twin.
    */
  /** @param evictAfter optional processing-time state TTL. When set, the
    *                    query runs with ProcessingTimeTimeout and evicts idle
    *                    users' state (production posture: state size is
    *                    O(active users)). NOTE a timeout makes the engine
    *                    schedule timeout-evaluation micro-batches continually
    *                    even with no data — correct for a long-running job,
    *                    but a busy loop under `processAllAvailable` in tests,
    *                    so the default is NoTimeout. Deployments using
    *                    evictAfter MUST also set a processing-time trigger
    *                    (e.g. `.trigger(Trigger.ProcessingTime("1 minute"))`)
    *                    or the empty timeout-evaluation batches spin hot.
    */
  /** Streaming twin of the batch SCD-2 build (`graft.ops.Scd.type2` /
    * `e7_scd2_history`): per-entity state runs maintained incrementally,
    * with each CLOSED run emitted the moment the entity's state changes
    * (Append semantics — a closed interval is immutable, so it can ship
    * to a downstream dimension table as it closes; the open run lives in
    * the state store, never in the output). With in-event-time-order
    * feeds the emitted runs equal the batch form's `valid_to IS NOT NULL`
    * rows — pinned in EventStreamsSpec.
    *
    * Ordering contract: events are sorted (event-time second, event_id)
    * within each micro-batch, and an event older than the state's
    * processed frontier is DROPPED — emitted intervals are immutable, so
    * a late state change cannot retro-split a closed run (same
    * no-rewind discipline as [[sessionize]]; feed through a watermark
    * upstream if late data must instead delay processing).
    */
  def scd2Stream(events: Dataset[EventRow]): Dataset[ScdRun] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[ScdState, ScdRun](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[EventRow], state: GroupState[ScdState]) =>
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime / 1000, e.event_id))
          var st = state.getOption.orNull
          val out = scala.collection.mutable.ArrayBuffer.empty[ScdRun]
          sorted.foreach { e =>
            val sec = e.ts.getTime / 1000
            if (st == null) st = ScdState(e.event_type, sec, sec, e.event_id)
            else if (sec > st.lastSec || (sec == st.lastSec && e.event_id > st.lastId)) {
              if (e.event_type != st.curType) {
                out += ScdRun(userId, st.curType, st.fromSec, sec)
                st = ScdState(e.event_type, sec, sec, e.event_id)
              } else st = st.copy(lastSec = sec, lastId = e.event_id)
            } // else: behind the frontier — dropped (see ordering contract)
          }
          if (st != null) state.update(st)
          out.iterator
      }
  }

  def sessionize(events: Dataset[EventRow], gapSec: Long = 1800,
                 evictAfter: Option[String] = None): Dataset[SessionUpdate] = {
    import events.sparkSession.implicits._
    val timeoutConf =
      if (evictAfter.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionUpdate](
        OutputMode.Update, timeoutConf) {
        (userId: Long, rows: Iterator[EventRow], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime / 1000, e.event_id))
            var st = state.getOption.getOrElse(SessionState(Long.MinValue, 0L, 0L))
            sorted.foreach { e =>
              val sec = e.ts.getTime / 1000
              val isNew = st.lastSec == Long.MinValue || sec - st.lastSec > gapSec
              // never REWIND the session clock: a late (cross-batch
              // out-of-order) event must not reopen the gap and inflate the
              // session count on the next in-order event
              st = SessionState(math.max(st.lastSec, sec),
                st.openSessions + (if (isNew) 1 else 0), st.nEvents + 1)
            }
            state.update(st)
            evictAfter.foreach(state.setTimeoutDuration)
            Iterator.single(SessionUpdate(userId, st.openSessions, st.nEvents))
          }
      }
  }
}
