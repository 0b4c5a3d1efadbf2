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
  /** `events.ts` is nanosecond-precision parquet, which Spark 4 refuses by
    * default (PARQUET_TYPE_ILLEGAL). Sessions built via [[GraftSession]] set
    * `spark.sql.legacy.parquet.nanosAsLong` so it scans as a raw long; this
    * loader converts to a microsecond TIMESTAMP — truncation, matching how
    * any ns-producing upstream lands in Spark. (The conf lives in session
    * construction, not here: loaders must not mutate session state.)
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    apply(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  def documents(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}
