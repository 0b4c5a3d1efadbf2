package graft.io

import java.sql.Connection
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Sink operators (SURVEY.md §2.6).
  *
  * Reference: /root/reference/airflow/dags/tasks/{bronze,silver,gold}.py.
  *  - K1 parquet → object store (bronze.py:79-82 etc.): [[writeParquet]].
  *    Unlike the reference's single whole-buffer object, writes are
  *    distributed, optionally partitioned by a column (the 100 TB posture:
  *    partition gold outputs by a low-cardinality dimension so BI predicates
  *    prune files).
  *  - K2/K3 CREATE TABLE via JDBC (bronze.py:94-100, silver.py:97-114):
  *    `createTableColumnTypes` carries the reference's type rules
  *    (título/objetivo → TEXT, dates → DATE, else VARCHAR(255),
  *    bronze.py:94-98). Surrogate AUTO_INCREMENT keys are DB-side DDL —
  *    deliberately NOT emulated with monotonically_increasing_id (which is
  *    non-deterministic across runs).
  *  - K4 upsert (bronze.py:103-121 …): the reference's row-at-a-time
  *    `INSERT … ON DUPLICATE KEY UPDATE` never actually updates (the only
  *    unique key is the auto-increment PK — SURVEY.md §2.6), so effective
  *    semantics are APPEND; [[jdbcAppend]] is the faithful sink. A true
  *    batched upsert ([[upsertStatements]] + foreachPartition) is provided
  *    for the corrected semantics; it batches `batchSize` rows per JDBC
  *    round-trip instead of the reference's 1-2 statements per row.
  *
  * No database ships in this container, so JDBC paths are exercised by unit
  * tests at the statement-building level only (SinksSpec).
  */
object Sinks {

  /** K1 — distributed parquet write, optional partition columns. */
  def writeParquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** K2 — the reference's dynamic DDL type rules (bronze.py:94-98). */
  def columnTypeDdl(schema: StructType): String =
    schema.fields.map { f =>
      val t = f.dataType match {
        case StringType if f.name == "título" || f.name == "objetivo" => "TEXT"
        case DateType                                                 => "DATE"
        case IntegerType | LongType                                   => "INT"
        case DoubleType                                               => "DOUBLE"
        case _                                                        => "VARCHAR(255)"
      }
      s"${f.name} $t"
    }.mkString(", ")

  /** K2/K3/K4(effective) — append via Spark's batched JDBC writer. */
  def jdbcAppend(df: DataFrame, url: String, table: String,
                 props: java.util.Properties, batchSize: Int = 10000): Unit =
    df.write.mode("append")
      .option("batchsize", batchSize)
      .option("createTableColumnTypes", columnTypeDdl(df.schema))
      .jdbc(url, table, props)

  /** K4 (corrected) — MySQL-dialect upsert statement for one table. */
  def upsertSql(table: String, cols: Seq[String]): String = {
    val placeholders = cols.map(_ => "?").mkString(", ")
    val updates = cols.map(c => s"$c = VALUES($c)").mkString(", ")
    s"INSERT INTO $table (${cols.mkString(", ")}) VALUES ($placeholders) " +
      s"ON DUPLICATE KEY UPDATE $updates"
  }

  /** K4 (corrected) — batched upsert over one partition's rows. Called from
    * `df.foreachPartition` with a connection factory; executors each hold one
    * connection and flush every `batchSize` rows — the scalable replacement
    * for the reference's per-row commit.
    */
  def upsertPartition(rows: Iterator[Row], conn: Connection, table: String,
                      cols: Seq[String], batchSize: Int = 1000): Unit = {
    val stmt = conn.prepareStatement(upsertSql(table, cols))
    try {
      var n = 0
      rows.foreach { r =>
        cols.zipWithIndex.foreach { case (c, i) =>
          stmt.setObject(i + 1, r.getAs[Any](c))
        }
        stmt.addBatch()
        n += 1
        if (n % batchSize == 0) stmt.executeBatch()
      }
      stmt.executeBatch()
    } finally stmt.close()
  }
}
