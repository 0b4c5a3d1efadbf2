package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** JSONL (one JSON object per line) — the lingua-franca interchange format
  * of LLM corpus pipelines (every public dataset release and most
  * inter-stage handoffs are JSONL files). The engine side is Spark's own
  * distributed JSON writer/reader driven the PRODUCTION way: export is
  * per-partition files of compact single-line objects; ingest is
  * SCHEMA-PINNED (never inferSchema — a schema inference pass reads the
  * data twice and silently widens types on dirty input) with an explicit
  * corrupt-record policy.
  *
  * Two ingest policies, both real deployment modes:
  *  - FAILFAST for closed-loop handoffs (our own export feeding the next
  *    stage — any parse error is a bug, fail the job);
  *  - PERMISSIVE + `_corrupt_record` quarantine for FOREIGN feeds, where
  *    bad lines are routed to a quarantine count instead of poisoning the
  *    run ([[readQuarantined]]; pinned in JsonlSpec).
  *
  * The registry entry (`x_jsonl_roundtrip`) pins the whole encode →
  * parse → decode path cross-engine: the oracle reads the ORIGINAL
  * documents table, so a hash match proves JSON string escaping (quotes,
  * control chars, non-ASCII) survives the round trip bit for bit.
  */
object Jsonl {

  /** The documents interchange schema (explicit — see object doc). */
  val DocSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("source", StringType),
    StructField("lang", StringType),
    StructField("text", StringType)))

  /** Export as JSONL: one compact object per line, one file per
    * partition (the crawler/loader sharding unit — same story as
    * [[Warc.writeArchives]]).
    */
  def write(docs: DataFrame, dir: String): Unit =
    docs.select(col("doc_id"), col("source"), col("lang"), col("text"))
      .write.mode("overwrite").json(dir)

  /** Schema-pinned strict ingest: any malformed line fails the job (the
    * closed-loop policy).
    */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(DocSchema).option("mode", "FAILFAST").json(dir)

  /** Schema-pinned quarantine ingest for foreign feeds: malformed lines
    * land in `_corrupt_record` instead of failing the job; returns
    * (parsed rows with a NULL quarantine column, quarantined rows with
    * the raw line preserved) as one frame — callers split on
    * `_corrupt_record IS NULL`.
    */
  def readQuarantined(spark: SparkSession, dir: String): DataFrame =
    spark.read
      .schema(DocSchema.add(StructField("_corrupt_record", StringType)))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir)
}
