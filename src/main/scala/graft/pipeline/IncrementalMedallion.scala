package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Incremental medallion runs (SURVEY.md §7.4).
  *
  * The reference's operating mode is a DAILY FULL RE-RUN of
  * bronze→silver→gold (/root/reference/airflow/dags/dag_main.py:26 —
  * `schedule_interval='@daily'`, every task recomputes from scratch). The
  * idiomatic Spark upgrade is an incremental file-stream pipeline:
  * each layer is a Structured Streaming query over the previous layer's
  * directory, run with `Trigger.AvailableNow` — it processes exactly the
  * files that arrived since the last run (the file source records seen
  * files in the checkpoint), then exits. A daily cron of `runAcordos` does
  * the reference's job touching only the day's new data; at 100 TB that is
  * the difference between rereading the lake and reading a day.
  *
  * Layer semantics:
  *  - bronze: stateless row transform — plain append.
  *  - silver: `dropDuplicates` becomes a STATEFUL streaming dedup whose
  *    state lives in the checkpoint — a row is emitted the first time it
  *    is ever seen, across runs and restarts. The silver table therefore
  *    accretes exactly the distinct set the reference's batch
  *    `drop_duplicates()` would produce over all data so far (twin-equality
  *    pinned in IncrementalMedallionSpec and oracle-checked by the
  *    `ref_incremental_silver` registry entry). State is unbounded by
  *    design — it IS the distinct set; for high-cardinality keys with an
  *    event-time column, `dropDuplicatesWithinWatermark` bounds it.
  *  - gold: stateless again (silver's output is already globally distinct,
  *    so the reference's redundant gold-side distinct is the identity) —
  *    one [[runFanOut]] pass derives once and writes all four outputs.
  */
object IncrementalMedallion {

  /** One incremental layer pass: process files that arrived in `inDir`
    * since the last run with this checkpoint, apply `transform` (which may
    * be stateful, e.g. `dropDuplicates`), append to `outDir`. Blocks until
    * all available data is processed, then returns (Trigger.AvailableNow).
    * Restart-safety comes from the checkpoint: seen files are never re-read,
    * and the parquet sink's metadata log makes the append exactly-once.
    */
  def runLayer(spark: SparkSession, inDir: String, schema: StructType,
               transform: DataFrame => DataFrame,
               outDir: String, checkpointDir: String): Unit = {
    val in = spark.readStream.schema(schema).parquet(inDir)
    val q = transform(in).writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Multi-sink incremental pass: each micro-batch is passed through
    * `prepare` ONCE (persisted — shared upstream work like a derive
    * projection is computed a single time, and the batch's input files are
    * scanned once instead of once per sink), then written through every
    * `(transform, outDir)` sink. Idempotence: each sink writes its batch to
    * `outDir/batch=<id>` with OVERWRITE — foreachBatch runs before the
    * checkpoint commit, so a crash between write and commit re-runs the
    * batch, and the rewrite lands on the same directory instead of
    * appending duplicates. Read the result back with [[readFanOut]].
    */
  def runFanOut(spark: SparkSession, inDir: String, schema: StructType,
                sinks: Seq[(DataFrame => DataFrame, String)],
                checkpointDir: String,
                prepare: DataFrame => DataFrame = identity): Unit = {
    val in = spark.readStream.schema(schema).parquet(inDir)
    val q = in.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val prepared = prepare(batch).persist()
        try sinks.foreach { case (f, out) =>
          f(prepared).write.mode("overwrite").parquet(s"$out/batch=$id")
        } finally prepared.unpersist(): Unit
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Read a [[runFanOut]] sink directory, hiding the synthetic `batch`
    * partition column.
    */
  def readFanOut(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir).drop("batch")

  /** Directory layout for one incremental medallion deployment. */
  final case class Dirs(root: String) {
    val landing = s"$root/landing"
    val bronze  = s"$root/bronze"
    val silver  = s"$root/silver"
    def gold(name: String) = s"$root/gold_$name"
    def ckpt(layer: String) = s"$root/_checkpoints/$layer"
  }

  /** One end-to-end incremental run of the acordos medallion: new landing
    * files → bronze → silver → four gold outputs. Call again after more
    * files land — each layer continues from its checkpoint.
    */
  def runAcordos(spark: SparkSession, dirs: Dirs, rawSchema: StructType): Unit = {
    runLayer(spark, dirs.landing, rawSchema, Bronze.transform,
      dirs.bronze, dirs.ckpt("bronze"))
    val bronzeSchema = Bronze.transform(
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), rawSchema)).schema
    runLayer(spark, dirs.bronze, bronzeSchema, Silver.transform,
      dirs.silver, dirs.ckpt("silver"))
    val silverSchema = Silver.transform(
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), bronzeSchema)).schema
    val twoCols = Seq(col("local_completo"), col("acordo_recurso"))
    val silverCols = silverSchema.fieldNames.map(col).toSeq
    // derive runs ONCE per batch (prepare), each sink projects/filters it
    runFanOut(spark, dirs.silver, silverSchema, Seq(
      ((h: DataFrame) => h.select(silverCols: _*), dirs.gold("acordos")),
      ((h: DataFrame) => h.select(twoCols: _*), dirs.gold("hier")),
      ((h: DataFrame) => h.filter(col("tipo_de_parceiro") === "País")
        .select(twoCols: _*), dirs.gold("pais")),
      ((h: DataFrame) => h.filter(col("tipo_de_parceiro") === "Organização")
        .select(twoCols: _*), dirs.gold("org"))),
      dirs.ckpt("gold"),
      prepare = Gold.derive)
  }
}
