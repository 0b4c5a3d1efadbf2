package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver's TPC-H-ish testdata (see /root/repo/TESTDATA.md).
  *
  * All access goes through `spark.read.parquet`, keeping scans declarative so
  * Catalyst performs column pruning and predicate pushdown into the vectorized
  * parquet reader — at 100 TB the difference between "read 2 columns" and
  * "read 11 columns" is the whole game. Never collect these to the driver.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "lineitem")
  /** `events.ts` has drifted across testdata generations — ns-precision
    * parquet (scanned as raw long under [[GraftSession]]'s `nanosAsLong`),
    * then `timestamp[us]` (scanned as TIMESTAMP_NTZ). Branch on the scanned
    * dtype so every generation lands as a microsecond TIMESTAMP under the
    * UTC session (NTZ→timestamp is instant-preserving there), keeping every
    * downstream consumer and the DuckDB oracle on identical semantics.
    * `TablesSpec` pins each loader against the shipped testdata so the next
    * drift fails a unit test instead of silently emptying the driver gate.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    val raw = apply(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast("timestamp"))
      case _                => raw // already a session-zoned TIMESTAMP
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}
