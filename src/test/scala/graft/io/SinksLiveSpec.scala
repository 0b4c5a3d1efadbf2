package graft.io

import java.sql.DriverManager
import java.util.Properties
import graft.SparkSpec
import org.apache.spark.sql.functions._

/** LIVE JDBC sink tests against embedded Derby (ships with Spark's jars —
  * no new dependency). Round 1 verified the reference's MariaDB write path
  * (silver.py:93-139, gold.py:72-193) only at the statement-building level;
  * these exercise the real wire: Spark's JDBC writer with the dynamic DDL
  * rules, a read-back round trip, and the batched upsert executor incl. the
  * duplicate-key-update case.
  *
  * Derby runs in-process and in-memory; in local mode executors share the
  * JVM, so `foreachPartition` connections resolve the same database.
  */
class SinksLiveSpec extends SparkSpec {
  import spark.implicits._

  System.setProperty("derby.stream.error.file", "/tmp/derby.log")

  private val url = "jdbc:derby:memory:graftlive;create=true"
  private val props = {
    val p = new Properties()
    p.setProperty("driver", "org.apache.derby.iapi.jdbc.AutoloadedDriver")
    p
  }

  test("K2/K4: jdbcAppend round-trips through a real database, every DDL type rule live") {
    import java.sql.Date
    val df = Seq(
      ("Acordo de Cooperação Técnica — ê çã", "BR", 2021, 1.5, Date.valueOf("2021-03-01")),
      ("x" * 4000, "AR", 2022, 2.0, Date.valueOf("2022-11-30")), // > VARCHAR(255): unbounded type
      ("c", "CL", 2023, 3.25, Date.valueOf("2023-01-15")))
      .toDF("título", "parceiro", "ano", "valor", "data_de_celebração")
    Sinks.jdbcAppend(df, url, "acordos", props)

    def rows(d: org.apache.spark.sql.DataFrame) = d
      .select("título", "parceiro", "ano", "valor", "data_de_celebração")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2),
        r.getDouble(3), r.getDate(4).toString)).sortBy(_._2).toSeq
    assert(rows(spark.read.jdbc(url, "acordos", props)) === rows(df))
  }

  test("K4: batched MERGE upsert updates on key collision and inserts new keys") {
    val conn0 = DriverManager.getConnection(url)
    try {
      conn0.createStatement().execute(
        "CREATE TABLE up (k INT NOT NULL PRIMARY KEY, v VARCHAR(64), n INT)")
      conn0.createStatement().execute(
        "INSERT INTO up VALUES (1, 'old-1', 10), (2, 'old-2', 20)")
    } finally conn0.close()

    val cols = Seq("k", "v", "n")
    val sql = Sinks.upsertSqlMerge("up", cols, keyCols = Seq("k"))
    val incoming = Seq((2, "new-2", 21), (3, "new-3", 30), (4, "new-4", 40))
      .toDF("k", "v", "n")
    // the real executor path: one connection per partition, batched flushes
    incoming.repartition(2).foreachPartition {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
        val conn = DriverManager.getConnection("jdbc:derby:memory:graftlive")
        try Sinks.upsertPartition(rows, conn, sql, Sinks.bindMerge(cols, Seq("k")), batchSize = 2)
        finally conn.close()
    }

    val got = spark.read.jdbc(url, "up", props)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2))).sorted.toSeq
    assert(got === Seq((1, "old-1", 10), (2, "new-2", 21), (3, "new-3", 30), (4, "new-4", 40)))
  }

  test("streaming -> JDBC: foreachBatch MERGE upsert is idempotent across batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.EventStreams.EventRow
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val conn0 = DriverManager.getConnection(url)
    try conn0.createStatement().execute(
      "CREATE TABLE ev_sink (event_id BIGINT NOT NULL PRIMARY KEY, " +
        "user_id BIGINT, val DOUBLE)")
    finally conn0.close()

    val cols = Seq("event_id", "user_id", "val")
    val sql = Sinks.upsertSqlMerge("ev_sink", cols, keyCols = Seq("event_id"))
    val input = MemoryStream[EventRow]
    // the streaming sink composition for engines without native JDBC
    // streaming support: per micro-batch, the batched upsert executor —
    // key idempotence makes at-least-once delivery effectively exactly-once
    val q = input.toDF()
      .selectExpr("event_id", "user_id", "value AS val")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
          val conn = DriverManager.getConnection("jdbc:derby:memory:graftlive")
          try Sinks.upsertPartition(rows, conn, sql,
            Sinks.bindMerge(cols, Seq("event_id")), batchSize = 100)
          finally conn.close()
        }
      }
      .start()
    try {
      def ts(s: String) = java.sql.Timestamp.valueOf(s)
      input.addData(
        EventRow(10, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
        EventRow(11, ts("2024-01-01 10:01:00"), 2, "view", 2.0))
      q.processAllAvailable()
      // replayed event 10 (at-least-once) with a newer value + a new event
      input.addData(
        EventRow(10, ts("2024-01-01 10:00:00"), 1, "click", 9.0),
        EventRow(12, ts("2024-01-01 10:02:00"), 3, "click", 3.0))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.read.jdbc(url, "ev_sink", props)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    assert(got === Seq((10L, 1L, 9.0), (11L, 2L, 2.0), (12L, 3L, 3.0)))
  }

  /** The MySQL dialect pair cannot be EXECUTED in this build environment:
    * the only live engines are embedded Derby and DuckDB, neither of which
    * parses `ON DUPLICATE KEY UPDATE`, and the offline dependency set has
    * no H2/MySQL driver. What CAN be pinned without a MySQL parser:
    *  (a) the exact statement text against MySQL 8's documented grammar,
    *  (b) the wire payload `bindCols` would send for each row (captured
    *      through a real PreparedStatement proxy — the same call path
    *      `upsertPartition` drives), and
    *  (c) dialect equivalence: replaying those captured MySQL payloads
    *      under MySQL's documented upsert semantics lands the same final
    *      table as the live Derby MERGE path fed the same rows.
    * Together these mean the only untested surface is MySQL's parser
    * accepting (a) — which is verbatim the reference's own statement shape
    * (silver.py:118-139), known-good against MariaDB.
    */
  test("K4 MySQL dialect: grammar pin + captured bind payload + equivalence with live MERGE") {
    val cols = Seq("k", "v", "n")
    // (a) exact grammar pin
    assert(Sinks.upsertSql("up2", cols) ===
      "INSERT INTO up2 (k, v, n) VALUES (?, ?, ?) " +
        "ON DUPLICATE KEY UPDATE k = VALUES(k), v = VALUES(v), n = VALUES(n)")

    // (b) capture the MySQL wire payload through the PreparedStatement API
    def capture(bind: (java.sql.PreparedStatement, org.apache.spark.sql.Row) => Unit,
                row: org.apache.spark.sql.Row, width: Int): Seq[Any] = {
      val vals = new Array[Any](width)
      val ps = java.lang.reflect.Proxy.newProxyInstance(
        getClass.getClassLoader, Array(classOf[java.sql.PreparedStatement]),
        (_: Any, m: java.lang.reflect.Method, args: Array[AnyRef]) => m.getName match {
          case "setObject" =>
            vals(args(0).asInstanceOf[Integer] - 1) = args(1); null
          case _ => null
        }).asInstanceOf[java.sql.PreparedStatement]
      bind(ps, row)
      vals.toSeq
    }
    val incoming = Seq((2, "new-2", 21), (3, "new-3", 30), (2, "newer-2", 22))
      .toDF("k", "v", "n")
    val payloads = incoming.collect().toSeq.map(r => capture(Sinks.bindCols(cols), r, cols.length))
    assert(payloads === Seq(Seq(2, "new-2", 21), Seq(3, "new-3", 30), Seq(2, "newer-2", 22)))

    // (c) MySQL semantics over the captured payloads (every column set to
    // VALUES(col) on duplicate key = last-writer-wins full-row upsert) ...
    val mysqlFinal = payloads.foldLeft(Map(1 -> Seq[Any](1, "old-1", 10), 2 -> Seq[Any](2, "old-2", 20))) {
      (tbl, p) => tbl + (p.head.asInstanceOf[Int] -> p)
    }
    // ... must equal the live Derby MERGE path fed the same rows in order
    val conn0 = DriverManager.getConnection(url)
    try {
      conn0.createStatement().execute(
        "CREATE TABLE up2 (k INT NOT NULL PRIMARY KEY, v VARCHAR(64), n INT)")
      conn0.createStatement().execute(
        "INSERT INTO up2 VALUES (1, 'old-1', 10), (2, 'old-2', 20)")
      Sinks.upsertPartition(incoming.collect().iterator, conn0,
        Sinks.upsertSqlMerge("up2", cols, keyCols = Seq("k")),
        Sinks.bindMerge(cols, Seq("k")), batchSize = 2)
    } finally conn0.close()
    val derbyFinal = spark.read.jdbc(url, "up2", props).collect()
      .map(r => r.getInt(0) -> Seq[Any](r.getInt(0), r.getString(1), r.getInt(2))).toMap
    assert(derbyFinal === mysqlFinal)
  }
}
