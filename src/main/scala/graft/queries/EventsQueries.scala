package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.AsofJoin
import graft.queries.Util._

/** Event-stream analytics in batch form: time-bucketed aggregation,
  * sessionization (gap-based), top-k, and the as-of (point-in-time) join.
  * The Structured Streaming versions of the same computations live in
  * `graft.streaming` (watermarked windows / mapGroupsWithState), tested with
  * MemoryStream; the driver's oracle only sees batch, so these entries are
  * the batch-equivalent plans.
  *
  * Timestamp determinism: `events.ts` is nanosecond-precision parquet;
  * Spark truncates to microseconds, DuckDB keeps ns. All bucketing /
  * gap logic therefore runs on whole seconds (`unix_timestamp` vs
  * `floor(epoch(ts))` — identical), and bucket outputs are formatted
  * strings, never raw timestamps.
  */
object EventsQueries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // tumbling-window aggregation (hourly), bucket as string
    "e1_hourly_counts" -> ((s: SparkSession, dir: String) => {
      Tables.events(s, dir)
        .groupBy(
          date_format(col("ts"), "yyyy-MM-dd HH:00:00").as("bucket"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
    }),

    // per-user top-k with full deterministic ordering
    "e2_top_users" -> ((s: SparkSession, dir: String) => {
      Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
        .orderBy(col("n").desc, col("user_id"))
        .limit(20)
    }),

    // gap-based sessionization (30-min inactivity), second granularity
    "e3_sessions_per_user" -> ((s: SparkSession, dir: String) => {
      val sec = unix_timestamp(col("ts").cast("timestamp")).as("s")
      val w = Window.partitionBy(col("user_id")).orderBy(col("s"), col("event_id"))
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), sec)
        .withColumn("prev", lag(col("s"), 1).over(w))
        .withColumn("is_new",
          when(col("prev").isNull || col("s") - col("prev") > 1800, 1).otherwise(0))
        .groupBy(col("user_id"))
        .agg(sum(col("is_new")).as("n_sessions"), count(lit(1)).as("n_events"))
    }),

    // native SESSION_WINDOW sessionization — the declarative twin of e3's
    // lag-islands form (and of the stateful streaming sessionizer): Spark
    // merges events whose gap <= 30 min into one growing window. Event
    // times are floored to whole seconds FIRST so the gap comparisons are
    // ns-vs-µs-proof; the oracle computes the same islands with
    // `new session iff gap > 1800` — session_window MERGES a pair exactly
    // gap apart (verified empirically on 4.1: (0 s, 1800 s) is ONE
    // session, (0 s, 1801 s) is two; caught by an exact-boundary pair in
    // the sf0.1 fixture that round 3's data happened not to contain, and
    // matching e3's and the stateful sessionizer's strict-> rule)
    "e6_session_window" -> ((s: SparkSession, dir: String) => {
      Tables.events(s, dir)
        .select(col("user_id"),
          timestamp_seconds(unix_timestamp(col("ts"))).as("tsec"))
        .groupBy(session_window(col("tsec"), "30 minutes").as("sw"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          date_format(col("sw.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
          col("n_events"))
    }),

    // range (interval) join with NO equi key — bucketized to an equi-join
    // on day buckets + exact refinement (ops.RangeJoin). The 20 overlapping
    // campaign windows (50h every 32h) are arithmetic, so the oracle can
    // mirror them; events matching multiple windows count in each.
    "x_range_join_windows" -> ((s: SparkSession, dir: String) => {
      val ev = Tables.events(s, dir)
        .select(unix_timestamp(col("ts")).as("sec"), col("value"))
      val iv = s.range(20).select(col("id").as("window_id"),
        (lit(1704067200L) + col("id") * 32 * 3600).as("start_sec"))
        .withColumn("end_sec", col("start_sec") + 50 * 3600)
      graft.ops.RangeJoin.pointInInterval(ev, "sec", iv, "start_sec", "end_sec")
        .groupBy(col("window_id"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
    }),

    // interval-OVERLAP join (interval × interval, no equi key): per-(user,
    // epoch-day) activity spans [first, last+1) against the 20 campaign
    // windows. ops.RangeJoin.intervalOverlap tiles BOTH sides and emits
    // each pair only in the tile holding max(starts) — no pair-dedup
    // shuffle; the long 50h windows share many day tiles with many spans,
    // so the dedup-free rule is doing real work here. Output: overlapping
    // span count + total overlap seconds per window.
    "x_interval_overlap" -> ((s: SparkSession, dir: String) => {
      val spans = Tables.events(s, dir)
        .select(col("user_id"), unix_timestamp(col("ts")).as("sec"))
        .withColumn("day", expr("sec div 86400"))
        .groupBy(col("user_id"), col("day"))
        .agg(min(col("sec")).as("u_start"), (max(col("sec")) + 1).as("u_end"))
      val iv = s.range(20).select(col("id").as("window_id"),
        (lit(1704067200L) + col("id") * 32 * 3600).as("w_start"))
        .withColumn("w_end", col("w_start") + 50 * 3600)
      graft.ops.RangeJoin
        .intervalOverlap(spans, "u_start", "u_end", iv, "w_start", "w_end")
        .groupBy(col("window_id"))
        .agg(count(lit(1)).as("n_spans"),
          sum(least(col("u_end"), col("w_end")) -
            greatest(col("u_start"), col("w_start"))).as("overlap_sec"))
    }),

    // batch twin of EventStreams.dedupStream (dropDuplicatesWithinWatermark):
    // distinct event count per type after id-dedup. event_id is unique in
    // the generated data, so the surviving row per id is deterministic.
    "x_stream_dedup_twin" -> ((s: SparkSession, dir: String) => {
      Tables.events(s, dir)
        .dropDuplicates("event_id")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_unique_events"))
    }),

    // batch twin of EventStreams.correlate (stream-stream interval join):
    // same-user event pairs within a trailing 30-min window, counted per
    // user (whole-second comparisons for cross-engine determinism)
    "x_corr_batch_twin" -> ((s: SparkSession, dir: String) => {
      val ev = Tables.events(s, dir).select(
        col("event_id"), col("user_id"), unix_timestamp(col("ts")).as("sec"))
      val l = ev.select(col("event_id").as("ea"), col("user_id"), col("sec").as("sa"))
      val r = ev.select(col("event_id").as("eb"), col("user_id"), col("sec").as("sb"))
      l.join(r, Seq("user_id"))
        .filter(col("sb").between(col("sa") - 1800, col("sa")) && col("ea") =!= col("eb"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_pairs"))
    }),

    // as-of join: latest order (by date, orderkey tiebreak) at event time
    "e4_asof_last_order" -> ((s: SparkSession, dir: String) => {
      val events = Tables.events(s, dir).select(
        col("event_id"), col("user_id"), col("ts").cast("timestamp").as("ts"))
      val orders = Tables.orders(s, dir).select(
        col("o_custkey"), col("o_orderdate").cast("timestamp").as("o_ts"),
        col("o_orderkey"))
      AsofJoin.asofBackward(
        left = events.withColumnRenamed("user_id", "o_custkey"),
        right = orders,
        key = "o_custkey", leftTime = col("ts"), rightTime = col("o_ts"),
        payload = Seq("o_orderkey"), rightTiebreak = col("o_orderkey"))
        .select(col("event_id"), col("o_orderkey"))
    }),

    // time-series gap filling: per-type hourly grid between each type's
    // first and last hour, missing buckets as explicit zeros — the
    // resample/densify step every downstream rolling computation needs
    // (a window over a gappy series silently spans the holes). The grid
    // explodes from a per-key (lo, hi) aggregate — key-count × span rows,
    // never a driver loop; hours are whole-second integer arithmetic
    // (ns-vs-µs-proof, see the object scaladoc).
    "e5_gap_fill" -> ((s: SparkSession, dir: String) => {
      val counts = Tables.events(s, dir)
        .select(col("event_type"), expr("unix_timestamp(ts) div 3600").as("hour"))
        .groupBy(col("event_type"), col("hour"))
        .agg(count(lit(1)).as("n"))
      val grid = counts.groupBy(col("event_type"))
        .agg(min(col("hour")).as("lo"), max(col("hour")).as("hi"))
        .select(col("event_type"), explode(sequence(col("lo"), col("hi"))).as("hour"))
      grid.join(counts, Seq("event_type", "hour"), "left")
        .select(col("event_type"), col("hour"),
          coalesce(col("n"), lit(0L)).as("n"))
    }),

    // SCD-2 history: per-user event_type validity intervals — consecutive
    // same-type events collapse into one run, open runs flagged current
    // (graft.ops.Scd). Ordered on (whole seconds, event_id), the
    // engine-portable total order; valid_from/to are formatted strings
    // per the object scaladoc's timestamp-determinism rule.
    "e7_scd2_history" -> ((s: SparkSession, dir: String) => {
      graft.ops.Scd.type2(
        Tables.events(s, dir),
        keyCol = "user_id", stateCol = "event_type",
        orderCols = Seq(unix_timestamp(col("ts")), col("event_id")),
        fromCol = date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"))
    }),

    // ordered funnel with a conversion window: first view → first click
    // within 24h of it → first purchase within 24h of that. Each stage is
    // a user-keyed min-aggregate joined to the next stage's candidate
    // events — stage counts fall monotonically by construction (150/60/25
    // on the sf0.01 fixture, so every stage discriminates). Whole-second
    // arithmetic per the object scaladoc.
    "e8_funnel" -> ((s: SparkSession, dir: String) => {
      val e = Tables.events(s, dir).select(
        col("user_id"), col("event_type"),
        expr("unix_timestamp(ts)").as("sec"))
      val t1 = e.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("sec")).as("t1"))
      val t2 = e.filter(col("event_type") === "click")
        .join(t1, Seq("user_id"))
        .filter(col("sec") > col("t1") && col("sec") - col("t1") <= 86400)
        .groupBy(col("user_id")).agg(min(col("sec")).as("t2"))
      val t3 = e.filter(col("event_type") === "purchase")
        .join(t2, Seq("user_id"))
        .filter(col("sec") > col("t2") && col("sec") - col("t2") <= 86400)
        .groupBy(col("user_id")).agg(min(col("sec")).as("t3"))
      t1.agg(count(lit(1)).as("n_users")).select(lit(1).as("stage"), col("n_users"))
        .unionByName(t2.agg(count(lit(1)).as("n_users"))
          .select(lit(2).as("stage"), col("n_users")))
        .unionByName(t3.agg(count(lit(1)).as("n_users"))
          .select(lit(3).as("stage"), col("n_users")))
    }),

    // 7-day ROLLING DISTINCT active users — the windowed-distinct metric a
    // RANGE window cannot express (count(DISTINCT) over a moving frame):
    // each (user, active-day) fans out to the 7 window anchors it belongs
    // to (map-side ×7 explode of the DISTINCTED day grid, not raw events),
    // then one anchor-keyed exact-distinct aggregation; anchors restricted
    // to observed days by a keyed semi join
    "e10_rolling_active" -> ((s: SparkSession, dir: String) => {
      val d = Tables.events(s, dir)
        .select(col("user_id"), expr("unix_timestamp(ts) div 86400").as("day"))
        .distinct()
      val anchors = d.select(col("user_id"),
        explode(sequence(col("day"), col("day") + 6)).as("anchor"))
      anchors
        .join(d.select(col("day").as("anchor")).distinct(), Seq("anchor"), "left_semi")
        .groupBy(col("anchor"))
        .agg(countDistinct(col("user_id")).as("n_active_7d"))
    }),

    // time-series ANOMALY flags over the hourly event counts, via the
    // reusable integer-exact detector ([[graft.ops.Anomaly.integerZFlags]]
    // — |z| > 3 with both compare sides exact BIGINT, so the flags
    // hash-match any engine). The fixture's hourly series is near-uniform
    // (no natural 3σ spikes), so the QUERY PREP here plants deterministic
    // spikes — every 97th hour's count ×5, the perturbed-twin fixture
    // pattern — and the detector, which carries no knowledge of the
    // planting, must flag exactly those.
    "e11_anomaly_hours" -> ((s: SparkSession, dir: String) => {
      val hourly = Tables.events(s, dir)
        .select(expr("unix_timestamp(ts) div 3600").as("hour"))
        .groupBy(col("hour")).agg(count(lit(1)).as("c0"))
        .select(col("hour"),
          when(pmod(col("hour"), lit(97L)) === 0, col("c0") * 5)
            .otherwise(col("c0")).as("c"))
      graft.ops.Anomaly.integerZFlags(hourly, "hour", "c", z = 3)
    }),

    // weekly cohort retention: cohort = a user's first active epoch-day,
    // cells = distinct users active (cohort, weeks-since-cohort) — the
    // engagement matrix; exact distinct count, two-phase keyed aggregation
    "e9_retention" -> ((s: SparkSession, dir: String) => {
      val d = Tables.events(s, dir).select(
        col("user_id"), expr("unix_timestamp(ts) div 86400").as("day"))
      val f = d.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
      d.join(f, Seq("user_id"))
        .groupBy(col("cohort_day"),
          expr("(day - cohort_day) div 7").as("week_off"))
        .agg(countDistinct(col("user_id")).as("n_users"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "e7_scd2_history" ->
      """WITH o AS (SELECT user_id, event_type, ts, event_id,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY floor(epoch(ts)), event_id) AS rn,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY floor(epoch(ts)), event_id) AS prev
        |  FROM events),
        |c AS (SELECT user_id, event_type, ts, event_id FROM o
        |      WHERE rn = 1 OR prev IS DISTINCT FROM event_type)
        |SELECT user_id, event_type,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
        |  lead(strftime(ts, '%Y-%m-%d %H:%M:%S')) OVER (PARTITION BY user_id
        |    ORDER BY floor(epoch(ts)), event_id) AS valid_to,
        |  CASE WHEN lead(event_id) OVER (PARTITION BY user_id
        |    ORDER BY floor(epoch(ts)), event_id) IS NULL THEN 1 ELSE 0 END AS is_current
        |FROM c""".stripMargin,

    "e8_funnel" ->
      """WITH e AS (SELECT user_id, event_type,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
        |t1 AS (SELECT user_id, min(sec) AS t1 FROM e
        |       WHERE event_type = 'view' GROUP BY user_id),
        |t2 AS (SELECT e.user_id, min(sec) AS t2 FROM e JOIN t1 USING (user_id)
        |       WHERE event_type = 'click' AND sec > t1 AND sec - t1 <= 86400
        |       GROUP BY e.user_id),
        |t3 AS (SELECT e.user_id, min(sec) AS t3 FROM e JOIN t2 USING (user_id)
        |       WHERE event_type = 'purchase' AND sec > t2 AND sec - t2 <= 86400
        |       GROUP BY e.user_id)
        |SELECT 1 AS stage, CAST(count(*) AS BIGINT) AS n_users FROM t1
        |UNION ALL SELECT 2, CAST(count(*) AS BIGINT) FROM t2
        |UNION ALL SELECT 3, CAST(count(*) AS BIGINT) FROM t3""".stripMargin,

    "e11_anomaly_hours" ->
      """WITH h0 AS (SELECT CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS hour,
        |    CAST(count(*) AS BIGINT) AS c0
        |  FROM events GROUP BY 1),
        |h AS (SELECT hour,
        |    CASE WHEN hour % 97 = 0 THEN c0 * 5 ELSE c0 END AS c
        |  FROM h0),
        |t AS (SELECT hour, c,
        |    CAST(count(*) OVER () AS BIGINT) AS n,
        |    CAST(sum(c) OVER () AS BIGINT) AS s,
        |    CAST(sum(c * c) OVER () AS BIGINT) AS sq
        |  FROM h)
        |SELECT hour, c,
        |  c * n - s AS dev_n,
        |  (c * n - s) * (c * n - s) AS dev_n_sq,
        |  9 * (n * sq - s * s) AS thresh,
        |  CAST((c * n - s) * (c * n - s) > 9 * (n * sq - s * s) AS INT)
        |    AS is_anomaly
        |FROM t""".stripMargin,

    "e10_rolling_active" ->
      """WITH d AS (SELECT DISTINCT user_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day FROM events),
        |a AS (SELECT user_id, day + i AS anchor FROM d, generate_series(0, 6) t(i)),
        |obs AS (SELECT DISTINCT day AS anchor FROM d)
        |SELECT anchor, CAST(count(DISTINCT user_id) AS BIGINT) AS n_active_7d
        |FROM a JOIN obs USING (anchor)
        |GROUP BY anchor""".stripMargin,

    "e9_retention" ->
      """WITH d AS (SELECT user_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day FROM events),
        |f AS (SELECT user_id, min(day) AS cohort_day FROM d GROUP BY user_id)
        |SELECT cohort_day, (day - cohort_day) // 7 AS week_off,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM d JOIN f USING (user_id)
        |GROUP BY 1, 2""".stripMargin,

    "e5_gap_fill" ->
      """WITH c AS (
        |  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS hour,
        |         count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |s AS (SELECT event_type, min(hour) AS lo, max(hour) AS hi
        |      FROM c GROUP BY 1),
        |g AS (SELECT event_type, unnest(generate_series(lo, hi)) AS hour FROM s)
        |SELECT g.event_type, g.hour, CAST(coalesce(c.cnt, 0) AS BIGINT) AS n
        |FROM g LEFT JOIN c ON g.event_type = c.event_type AND g.hour = c.hour""".stripMargin,

    "e6_session_window" ->
      """WITH e AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS s FROM events),
        |w AS (SELECT user_id, s,
        |        lag(s) OVER (PARTITION BY user_id ORDER BY s) AS prev FROM e),
        |m AS (SELECT user_id, s,
        |        CASE WHEN prev IS NULL OR s - prev > 1800 THEN 1 ELSE 0 END AS is_new
        |      FROM w),
        |g AS (SELECT user_id, s,
        |        sum(is_new) OVER (PARTITION BY user_id ORDER BY s
        |                          ROWS UNBOUNDED PRECEDING) AS grp FROM m)
        |SELECT user_id,
        |  strftime(to_timestamp(min(s)), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  CAST(count(*) AS BIGINT) AS n_events
        |FROM g GROUP BY user_id, grp""".stripMargin,

    "e1_hourly_counts" ->
      s"""SELECT strftime(ts, '%Y-%m-%d %H:00:00') AS bucket, event_type,
         |  ${sqlCount()} AS n, ${sqlDsum("value")} AS total_value
         |FROM events GROUP BY 1, 2""".stripMargin,

    "e2_top_users" ->
      s"""SELECT user_id, ${sqlCount()} AS n, ${sqlDsum("value")} AS total_value
         |FROM events GROUP BY user_id
         |ORDER BY n DESC, user_id LIMIT 20""".stripMargin,

    "e3_sessions_per_user" ->
      """WITH t AS (
        |  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS s
        |  FROM events),
        |g AS (
        |  SELECT user_id,
        |    CASE WHEN lag(s) OVER (PARTITION BY user_id ORDER BY s, event_id) IS NULL
        |           OR s - lag(s) OVER (PARTITION BY user_id ORDER BY s, event_id) > 1800
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM t)
        |SELECT user_id, CAST(sum(is_new) AS BIGINT) AS n_sessions,
        |  CAST(count(*) AS BIGINT) AS n_events
        |FROM g GROUP BY user_id""".stripMargin,

    "x_stream_dedup_twin" ->
      """SELECT event_type, CAST(count(DISTINCT event_id) AS BIGINT) AS n_unique_events
        |FROM events GROUP BY 1""".stripMargin,

    "x_range_join_windows" ->
      s"""WITH iv AS (
         |  SELECT k AS window_id,
         |    1704067200 + k * 32 * 3600 AS start_sec,
         |    1704067200 + k * 32 * 3600 + 50 * 3600 AS end_sec
         |  FROM generate_series(0, 19) t(k)),
         |ev AS (SELECT CAST(floor(epoch(ts)) AS BIGINT) AS sec, value FROM events)
         |SELECT window_id, ${sqlCount()} AS n_events, ${sqlDsum("value")} AS total_value
         |FROM ev JOIN iv ON ev.sec >= iv.start_sec AND ev.sec < iv.end_sec
         |GROUP BY window_id""".stripMargin,

    "x_interval_overlap" ->
      """WITH iv AS (
        |  SELECT k AS window_id,
        |    1704067200 + k * 32 * 3600 AS w_start,
        |    1704067200 + k * 32 * 3600 + 50 * 3600 AS w_end
        |  FROM generate_series(0, 19) t(k)),
        |sp AS (SELECT user_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
        |    min(CAST(floor(epoch(ts)) AS BIGINT)) AS u_start,
        |    max(CAST(floor(epoch(ts)) AS BIGINT)) + 1 AS u_end
        |  FROM events GROUP BY 1, 2)
        |SELECT window_id, CAST(count(*) AS BIGINT) AS n_spans,
        |  CAST(sum(least(u_end, w_end) - greatest(u_start, w_start)) AS BIGINT)
        |    AS overlap_sec
        |FROM sp JOIN iv
        |  ON greatest(sp.u_start, iv.w_start) < least(sp.u_end, iv.w_end)
        |GROUP BY window_id""".stripMargin,

    "x_corr_batch_twin" ->
      """WITH ev AS (SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec
        |            FROM events)
        |SELECT l.user_id, CAST(count(*) AS BIGINT) AS n_pairs
        |FROM ev l JOIN ev r ON l.user_id = r.user_id
        |  AND r.sec BETWEEN l.sec - 1800 AND l.sec
        |  AND l.event_id != r.event_id
        |GROUP BY l.user_id""".stripMargin,

    "e4_asof_last_order" ->
      """SELECT e.event_id,
        |  (SELECT max(o.o_orderkey) FROM orders o
        |   WHERE o.o_custkey = e.user_id
        |     AND o.o_orderdate = (SELECT max(o2.o_orderdate) FROM orders o2
        |                          WHERE o2.o_custkey = e.user_id
        |                            AND o2.o_orderdate <= e.ts)) AS o_orderkey
        |FROM events e""".stripMargin
  )
}
