package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming maintenance of the IVF ANN INDEX — the vector-side member of
  * the incremental-maintainer family ([[IndexLedgerStream]] for the
  * inverted text index, [[DedupLedgerStream]] for components): a stream of
  * newly ingested embeddings is assigned to the FROZEN trained centroids
  * ([[graft.ext.Similarity.ivfAssign]] — the model is train-once state,
  * exactly the serving trust model of the batch layout) and appended to a
  * cid-partitioned parquet layout one micro-batch at a time, at batch
  * cost. A 100 TB vector index cannot re-assign its whole corpus per
  * ingest, and it equally cannot REWRITE a corpus-sized state file per
  * batch — so unlike the rollup ledgers this maintainer is append-shaped:
  *
  * Layout: `root/batch=<id>/cid=<c>/` parquet files. Each batch writes a
  * complete, self-contained partition directory (Spark's own `_SUCCESS`
  * marker gates it); `cid` remains a partition column UNDER the batch
  * level, so a probe's cid filter still prunes to nprobe/nlist of the
  * files before any IO — the serving property of the batch layout,
  * preserved across ingests.
  *
  * Replay safety — by IDEMPOTENCE (the [[IndexLedgerStream]] argument):
  * assignment against frozen centroids is a pure function of the batch,
  * and a replayed batch id OVERWRITES its own `batch=<id>` directory with
  * identical content instead of appending a duplicate. A crash mid-write
  * leaves a directory without `_SUCCESS`, which [[serve]] refuses to
  * read. Embeddings are facts (vector v exists), never retractions.
  *
  * DRIFT GATE: frozen centroids go stale when the embedding distribution
  * moves (new model version, new modality, new domain mix) — the index
  * keeps "working" while recall silently decays, because vectors land in
  * lists whose centroid no longer describes them. The observable signal
  * is quantization error: mean(1 − cos(v, centroid(v))). [[maintain]]
  * compares each batch's error against the TRAINING-TIME baseline
  * ([[quantizationError]] over the training assignment) and FAILS LOUDLY
  * past `maxDriftRatio` — refusing the batch beats silently serving a
  * degraded index, and the stream's failure is the retrain signal.
  */
object VectorIndexStream {

  /** Mean quantization error of an assignment relation (cid, n_id, n_vec)
    * against its model: mean over vectors of (1 − cosine(v, centroid)).
    * Decimal-summed mean (task-order-independent), returned as double —
    * this is the drift gate's baseline, measured once at training time.
    */
  def quantizationError(assigned: DataFrame,
                        model: graft.ext.Similarity.IvfModel): Double = {
    val withC = assigned.join(model.centroidDf(assigned.sparkSession), Seq("cid"))
      .select((lit(1.0) - graft.ext.Similarity.cosine(col("n_vec"), col("c_vec"))).as("err"))
    val r = withC.agg(
      (sum(col("err").cast("decimal(28,14)")) / count(lit(1)))
        .cast("double").as("e")).head()
    if (r.isNullAt(0)) 0.0 else r.getDouble(0)
  }

  /** Fold one batch of embeddings into the served layout (the
    * foreachBatch body). Empty batches are a no-op. Throws
    * IllegalStateException when the batch's quantization error exceeds
    * `maxDriftRatio` × `baselineError` — see the drift-gate contract
    * above. `idCol`/`vecCol` name the batch's columns (the
    * [[graft.ext.Similarity.ivfAssign]] convention).
    */
  def maintain(batch: DataFrame, batchId: Long, root: String,
               model: graft.ext.Similarity.IvfModel,
               baselineError: Double, maxDriftRatio: Double = 2.0,
               idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    require(maxDriftRatio > 0, s"maxDriftRatio must be > 0, got $maxDriftRatio")
    if (!batch.isEmpty) {
      val assigned = graft.ext.Similarity.ivfAssign(batch, model, idCol, vecCol)
        .persist() // two consumers: the gate and the write — assign once
      try {
        val err = quantizationError(assigned, model)
        // a near-zero training baseline would make any real batch "drift";
        // floor it at 1e-9 so the ratio stays meaningful
        val bound = maxDriftRatio * math.max(baselineError, 1e-9)
        if (err > bound)
          throw new IllegalStateException(
            f"VectorIndexStream: batch $batchId quantization error $err%.6f " +
              f"exceeds $maxDriftRatio%.1fx the training baseline " +
              f"$baselineError%.6f — the frozen centroids no longer describe " +
              "the incoming distribution. Refusing to index a batch the " +
              "lists can't serve: retrain the model (and re-assign) before " +
              "resuming this stream.")
        assigned.write.mode("overwrite").partitionBy("cid")
          .parquet(s"$root/batch=$batchId")
      } finally { assigned.unpersist(); () }
    }
  }

  private def fsOf(spark: SparkSession, root: String) =
    new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Committed (`_SUCCESS`-gated) segment dirs under `root` with the given
    * name prefix, as (id, path).
    */
  private def committedSegments(spark: SparkSession, root: String,
                                prefix: String): Seq[(Long, String)] = {
    val rp = new org.apache.hadoop.fs.Path(root)
    val fs = fsOf(spark, root)
    if (!fs.exists(rp)) Seq.empty
    else fs.listStatus(rp).toSeq.collect {
      case st if st.isDirectory && st.getPath.getName.startsWith(prefix) &&
        st.getPath.getName.drop(prefix.length).forall(_.isDigit) &&
        fs.exists(new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS")) =>
        (st.getPath.getName.drop(prefix.length).toLong, st.getPath.toString)
    }
  }

  /** The segments a read must cover EXACTLY ONCE: the newest committed
    * `compact=` segment (if any) plus every `batch=` dir with a HIGHER id.
    * Batch dirs at-or-below the compact id are merged content awaiting
    * best-effort deletion (the crash window between a compaction's commit
    * and its cleanup) — reading them too would double-count; older compact
    * segments are superseded the same way.
    */
  private def liveSegments(spark: SparkSession, root: String): Seq[String] = {
    val compacts = committedSegments(spark, root, "compact=")
    val batches = committedSegments(spark, root, "batch=")
    compacts.sortBy(-_._1).headOption match {
      case Some((cid0, path)) =>
        path +: batches.filter(_._1 > cid0).map(_._2)
      case None => batches.map(_._2)
    }
  }

  /** COMPACTION — the maintenance pass a long-lived append-shaped index
    * needs: thousands of small per-batch directories eventually dominate
    * listing/footer cost, so all batches up to the newest are merged into
    * ONE `compact=<maxBatchId>` segment (still cid-partitioned — probe
    * pruning is unchanged). Crash discipline mirrors [[VersionedState]]:
    * the merged segment is written FIRST (`_SUCCESS`-gated); only then are
    * the merged batch dirs and superseded compact segments deleted
    * (best-effort — until deletion, [[serve]]'s newest-compact rule
    * already ignores them, so a crash anywhere leaves a readable,
    * non-double-counting layout). No-op when there is nothing to merge.
    * Returns the compacted segment's id, if one was written.
    */
  def compact(spark: SparkSession, root: String): Option[Long] = {
    val fs = fsOf(spark, root)
    val compacts = committedSegments(spark, root, "compact=")
    val newestCompact = compacts.map(_._1).sorted.lastOption
    val mergeBatches = committedSegments(spark, root, "batch=")
      .filter(b => newestCompact.forall(b._1 > _))
    // nothing new to fold in (0 batches), or a single batch with no prior
    // compact segment (a rewrite that saves no files): skip
    if (mergeBatches.isEmpty ||
      (mergeBatches.size == 1 && compacts.isEmpty)) return None
    val newId = mergeBatches.map(_._1).max
    val inputs = compacts.sortBy(-_._1).headOption.map(_._2).toSeq ++
      mergeBatches.map(_._2)
    // per-segment reads (each segment is its own cid-partitioned root —
    // mixing batch=/compact= names under one basePath would make Spark
    // infer CONFLICTING partition columns)
    val merged = inputs.map(readSegment(spark, _)).reduce(_.unionByName(_))
    merged.write.mode("overwrite").partitionBy("cid")
      .parquet(s"$root/compact=$newId")
    // cleanup AFTER the new segment is committed — failures here are
    // harmless (serve ignores superseded segments)
    (compacts.map(_._2) ++ mergeBatches.map(_._2)).foreach { p =>
      try { fs.delete(new org.apache.hadoop.fs.Path(p), true); () }
      catch { case _: Throwable => () }
    }
    Some(newId)
  }

  /** The served assignment relation (cid, n_id, n_vec) across every
    * COMMITTED segment — directories without Spark's `_SUCCESS` marker are
    * crash leftovers and are skipped ([[VersionedState]] discipline), and
    * batches already folded into a compact segment are read from the
    * segment only (see [[liveSegments]]). `cid` stays a partition column,
    * so probe-side cid filters prune at the file level exactly as with
    * the batch layout.
    */
  def serve(spark: SparkSession, root: String): DataFrame = {
    val committed = liveSegments(spark, root)
    if (committed.isEmpty)
      spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("cid",
            org.apache.spark.sql.types.IntegerType),
          org.apache.spark.sql.types.StructField("n_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("n_vec",
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.DoubleType)))))
    else committed.map(readSegment(spark, _)).reduce(_.unionByName(_))
  }

  /** One segment dir read as (cid, n_id, n_vec) — the segment is its own
    * partition-discovery root, so `cid=` stays the (only) inferred
    * partition column regardless of the segment's batch/compact name.
    */
  private def readSegment(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)
      .select(col("cid").cast("int").as("cid"), col("n_id"), col("n_vec"))

  /** Attach the maintainer to an embedding stream. Caller starts/stops
    * the query; the layout lives under `root`, the frozen model and its
    * training-time baseline ride the closure (bounded model state).
    */
  def attach(embeddings: DataFrame, root: String, checkpoint: String,
             model: graft.ext.Similarity.IvfModel, baselineError: Double,
             maxDriftRatio: Double = 2.0): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    embeddings.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch((df: DataFrame, id: Long) =>
        maintain(df, id, root, model, baselineError, maxDriftRatio))
}
