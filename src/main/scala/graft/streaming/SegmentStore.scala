package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The append-shaped state layout shared by the corpus-sized incremental
  * maintainers ([[VectorIndexStream]], [[MinHashLedgerStream]]): per-batch
  * `batch=<id>/` parquet directories plus optional `compact=<id>/` merge
  * segments, all gated by Spark's own `_SUCCESS` marker. [[VersionedState]]
  * rewrites a COMPLETE ledger per commit — right for rollup-sized state,
  * wrong for state proportional to the corpus (a 100 TB signature or
  * vector index cannot be rewritten per ingest) — so this store appends
  * instead and makes reads union the committed segments.
  *
  * Commit discipline (identical to [[VersionedState]] in spirit):
  *  - a batch write targets its OWN directory (`batch=<id>`), so replaying
  *    a batch id overwrites with identical content instead of duplicating
  *    (idempotence is the maintainer's contract: folded rows must be pure
  *    functions of the batch);
  *  - a crash mid-write leaves a directory without `_SUCCESS`, which every
  *    read here skips;
  *  - compaction writes the merged segment FIRST, then best-effort deletes
  *    the inputs — until deletion the newest-compact read rule already
  *    ignores them, so no crash point double-counts or loses data.
  */
object SegmentStore {

  private def fsOf(spark: SparkSession, root: String) =
    new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Committed (`_SUCCESS`-gated) segment dirs under `root` with the given
    * name prefix, as (id, path).
    */
  def committed(spark: SparkSession, root: String,
                prefix: String): Seq[(Long, String)] = {
    val rp = new org.apache.hadoop.fs.Path(root)
    val fs = fsOf(spark, root)
    if (!fs.exists(rp)) Seq.empty
    else fs.listStatus(rp).toSeq.collect {
      case st if st.isDirectory && st.getPath.getName.startsWith(prefix) &&
        st.getPath.getName.drop(prefix.length).forall(_.isDigit) &&
        st.getPath.getName.length > prefix.length &&
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
  def live(spark: SparkSession, root: String): Seq[String] = {
    val compacts = committed(spark, root, "compact=")
    val batches = committed(spark, root, "batch=")
    compacts.sortBy(-_._1).headOption match {
      case Some((cid0, path)) =>
        path +: batches.filter(_._1 > cid0).map(_._2)
      case None => batches.map(_._2)
    }
  }

  /** Union of the live segments through `reader` (each segment is its own
    * read root, so per-segment partition discovery never mixes the
    * batch/compact level into the schema); `empty` when nothing is
    * committed yet.
    */
  def read(spark: SparkSession, root: String,
           reader: String => DataFrame, empty: => DataFrame): DataFrame = {
    val segs = live(spark, root)
    if (segs.isEmpty) empty
    else segs.map(reader).reduce(_.unionByName(_))
  }

  /** SKETCH-PARAMETER PIN — stores whose rows are only meaningful under
    * the sketch parameters that produced them (MinHash h/k, n-gram n)
    * persist those parameters beside the segments as `root/_params`
    * (sorted `key=value` lines). The FIRST committed fold pins them;
    * every later fold or probe validates its own parameters against the
    * pin and FAILS LOUDLY on mismatch — a probe with a different h or k
    * would otherwise band on misaligned signature slices and silently
    * return wrong novelty (round-12 ADVICE). Readers of a pre-params
    * layout get None and proceed on their own parameters (compat).
    */
  /** Fail loudly if the store is pinned to DIFFERENT parameters; no-op
    * when unpinned or matching. Folds call this BEFORE committing a
    * segment (a mismatched fold must not pollute the store) and
    * [[pinParams]] AFTER (a failed first fold must not pin an empty
    * store) — the round-13 ordering.
    */
  def validateParams(spark: SparkSession, root: String,
                     params: Seq[(String, Long)]): Unit =
    readParams(spark, root).foreach { existing =>
      require(existing == params.toMap,
        s"segment store at $root was built with parameters " +
          s"${fmt(existing.toSeq)} — refusing to fold/probe with " +
          s"${fmt(params)} (misaligned sketches would silently corrupt " +
          "novelty answers)")
    }

  def pinParams(spark: SparkSession, root: String,
                params: Seq[(String, Long)]): Unit = {
    readParams(spark, root) match {
      case Some(_) => validateParams(spark, root, params)
      case None =>
        val fs = fsOf(spark, root)
        val p = new org.apache.hadoop.fs.Path(root, "_params")
        // ATOMIC pin: write a temp file, then rename — a crash mid-write
        // can never leave a truncated _params (which would read as an
        // empty pin and brick the store with an opaque mismatch), and of
        // two concurrent first folds the rename loser falls through to
        // validation instead of a raw create failure (round-13 review)
        val tmp = new org.apache.hadoop.fs.Path(root,
          s"_params.tmp.${java.util.UUID.randomUUID().toString.take(8)}")
        val out = fs.create(tmp, false)
        try out.write(fmt(params).getBytes("UTF-8")) finally out.close()
        if (!fs.rename(tmp, p)) {
          fs.delete(tmp, false)
          validateParams(spark, root, params) // a concurrent writer won
        }
    }
  }

  /** The pinned parameters, if this store has any ([[pinParams]]). */
  def readParams(spark: SparkSession, root: String): Option[Map[String, Long]] = {
    val fs = fsOf(spark, root)
    val p = new org.apache.hadoop.fs.Path(root, "_params")
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      Some(body.split('\n').filter(_.contains("="))
        .map { ln => val Array(k, v) = ln.split("=", 2); (k, v.trim.toLong) }
        .toMap)
    }
  }

  private def fmt(params: Seq[(String, Long)]): String =
    params.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString("\n")

  /** COMPACTION — the maintenance pass a long-lived append-shaped store
    * needs: thousands of small per-batch directories eventually dominate
    * listing/footer cost, so the newest compact segment (if any) and every
    * later batch merge into ONE `compact=<maxBatchId>` segment written via
    * `write(df, path)` (the caller supplies the write so segment layout —
    * partition columns, sort — is preserved). No-op when there is nothing
    * to merge (0 new batches, or a single batch with no prior compact — a
    * rewrite that saves no files). Returns the new segment's id if one was
    * written. Cleanup of merged inputs runs AFTER the commit and is
    * best-effort — failures leave unreferenced-but-ignored directories.
    */
  def compact(spark: SparkSession, root: String,
              reader: String => DataFrame,
              write: (DataFrame, String) => Unit): Option[Long] = {
    val fs = fsOf(spark, root)
    val compacts = committed(spark, root, "compact=")
    val newestCompact = compacts.map(_._1).sorted.lastOption
    val mergeBatches = committed(spark, root, "batch=")
      .filter(b => newestCompact.forall(b._1 > _))
    if (mergeBatches.isEmpty ||
      (mergeBatches.size == 1 && compacts.isEmpty)) return None
    val newId = mergeBatches.map(_._1).max
    val inputs = compacts.sortBy(-_._1).headOption.map(_._2).toSeq ++
      mergeBatches.map(_._2)
    write(inputs.map(reader).reduce(_.unionByName(_)), s"$root/compact=$newId")
    (compacts.map(_._2) ++ mergeBatches.map(_._2)).foreach { p =>
      try { fs.delete(new org.apache.hadoop.fs.Path(p), true); () }
      catch { case _: Throwable => () }
    }
    Some(newId)
  }
}
