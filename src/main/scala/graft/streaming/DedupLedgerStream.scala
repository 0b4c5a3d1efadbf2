package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Streaming maintenance of the near-dup component ledger — the
  * operational loop [[graft.ext.Components.incrementalComponents]] exists
  * for: a stream of newly discovered near-dup EDGES (from the incremental
  * dedup joins over each ingest batch) folds into a persisted
  * (doc_id, component) ledger, one micro-batch at a time, at batch cost.
  *
  * State layout (the Sinks commit-point discipline, adapted to a
  * versioned table): each batch writes a COMPLETE new ledger under
  * `root/v<batchId>/`, then flips `root/_LATEST` to that version via
  * write-temp + atomic rename. Readers (and the next batch) resolve
  * `_LATEST` first, so a kill mid-write leaves the previous version
  * intact and re-running the batch is idempotent — the version name is
  * the batch id, so Structured Streaming's replay overwrites the same
  * dir rather than forking state. Obsolete versions are pruned after the
  * flip (best-effort; a leftover version dir is unreferenced, never
  * wrong).
  *
  * At 100 TB the per-batch cost is the incremental contract: CC over the
  * batch-sized contracted graph + one ledger-wide keyed remap — the full
  * rewrite of the ledger per batch is the simple-and-correct form at any
  * ledger size that fits a table write (a deployment beyond that swaps
  * the write for a partitioned upsert keyed by component; the update
  * computation is unchanged).
  */
object DedupLedgerStream {

  private val LedgerSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("component", LongType)))

  private def fs(spark: SparkSession, root: String) =
    new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Committed version dirs under `root`, highest batch id first. */
  private def versionDirs(f: org.apache.hadoop.fs.FileSystem,
                          root: String): Seq[org.apache.hadoop.fs.Path] = {
    val rp = new org.apache.hadoop.fs.Path(root)
    if (!f.exists(rp)) Seq.empty
    else f.listStatus(rp).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.matches("v\\d+"))
      .sortBy(-_.getPath.getName.drop(1).toLong)
      .map(_.getPath)
  }

  /** The current ledger: the version `_LATEST` points at. If the pointer is
    * ABSENT but committed version dirs exist (a crash in a non-atomic flip
    * on a FileSystem without overwriting rename), recover from the highest
    * version instead of silently serving an empty ledger — returning empty
    * here would make the next batch rebuild from only its own edges and
    * then PRUNE the orphaned good state. Empty is returned only before the
    * first commit, when no version dir exists either.
    */
  def currentLedger(spark: SparkSession, root: String): DataFrame = {
    val f = fs(spark, root)
    val ptr = new org.apache.hadoop.fs.Path(root, "_LATEST")
    if (f.exists(ptr)) {
      val in = f.open(ptr)
      val v = try scala.io.Source.fromInputStream(in).mkString.trim finally in.close()
      spark.read.parquet(s"$root/$v")
    } else versionDirs(f, root) match {
      case latest +: _ => spark.read.parquet(latest.toString)
      case _ => spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](), LedgerSchema)
    }
  }

  /** Fold one batch of edges into the persisted ledger (the foreachBatch
    * body). Empty batches are a no-op — no version churn.
    */
  def maintain(edges: DataFrame, batchId: Long, root: String): Unit = {
    if (!edges.isEmpty) {
      val spark = edges.sparkSession
      val updated = graft.ext.Components
        .incrementalComponents(currentLedger(spark, root), edges)
      val version = s"v$batchId"
      updated.write.mode("overwrite").parquet(s"$root/$version")
      val f = fs(spark, root)
      val tmp = new org.apache.hadoop.fs.Path(root, s"_LATEST.tmp$batchId")
      val ptr = new org.apache.hadoop.fs.Path(root, "_LATEST")
      val out = f.create(tmp, true)
      try out.write(version.getBytes("UTF-8")) finally out.close()
      // commit point: ONE overwriting rename onto the pointer
      // (FileContext.rename with Options.Rename.OVERWRITE — atomic on
      // HDFS/local). delete-then-rename would open a window where a crash
      // leaves NO pointer; currentLedger's highest-version fallback covers
      // even that on stores lacking overwrite-rename, but here the window
      // simply doesn't exist.
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        f.getUri, spark.sparkContext.hadoopConfiguration)
      fc.rename(f.makeQualified(tmp), f.makeQualified(ptr),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
      // prune superseded versions (best-effort, AFTER the flip; never
      // touches the version the pointer now references)
      versionDirs(f, root).foreach { p =>
        if (p.getName != version) f.delete(p, true)
      }
    }
  }

  /** Attach the maintainer to an edge stream (`doc_a`, `doc_b` columns).
    * Caller starts/stops the query; state lives under `root`.
    */
  def attach(edges: DataFrame, root: String,
             checkpoint: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    edges.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch((df: DataFrame, id: Long) => maintain(df, id, root))
}
