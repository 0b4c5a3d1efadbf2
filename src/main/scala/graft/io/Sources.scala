package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source operators (SURVEY.md §2.1).
  *
  * Reference: /root/reference/airflow/dags/tasks/{bronze,silver,gold}.py.
  *  - S1/S2 sheet scan + fixed-schema fallback → [[readWithSchema]]: an
  *    explicit `StructType` given to the reader replaces the reference's
  *    hard-coded `expected_headers` (bronze.py:33-35).
  *  - S4 object-existence check (silver.py:26-30, gold.py:26-30) →
  *    [[exists]] via the Hadoop FileSystem API (works for file://, s3a://,
  *    hdfs:// alike).
  *  - S5 parquet scan (silver.py:33-34) → `spark.read.parquet`: vectorized,
  *    column-pruned, predicate-pushdown — never a whole-object buffer.
  */
object Sources {

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** S1/S2 — schema-enforced read (CSV shown; parquet carries its own). */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
              header: Boolean = true): DataFrame =
    spark.read.schema(schema).option("header", header.toString).csv(path)

  /** JSONL (newline-delimited JSON) corpus read — the lingua franca of
    * LLM training-data interchange. Schema-enforced like [[readCsv]];
    * malformed lines land whole in `_corrupt` (PERMISSIVE) instead of
    * failing the 100 TB job at hour three, so bad records are quarantined
    * with a filter, not a rerun.
    */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add("_corrupt", org.apache.spark.sql.types.StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)

  /** Schema-evolution read: merge the schemas of all footers instead of
    * trusting the first file. A long-lived 100 TB table accretes columns;
    * without this, files written before a column existed silently hide it
    * (Spark samples one footer by default for speed). Older files yield
    * NULL for later columns — the same contract as the engine's
    * null-tolerant reference semantics.
    */
  def readParquetEvolved(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** ORC scan — the other columnar warehouse format Spark ships a
    * vectorized, predicate-pushdown reader for (Hive-lineage warehouses
    * hand over ORC as often as parquet). Same declarative posture as
    * [[readParquet]]: pruning/pushdown verified in IoSpec.
    */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).orc(path)
  }

  /** S4 — existence check against any Hadoop-compatible filesystem. */
  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** S4 strict form: raise (like the reference's NoSuchKey) if absent. */
  def requireExists(spark: SparkSession, path: String): Unit =
    if (!exists(spark, path))
      throw new java.io.FileNotFoundException(s"key not found: $path")
}
