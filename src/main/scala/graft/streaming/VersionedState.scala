package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Versioned parquet state with an atomic `_LATEST` pointer — the shared
  * substrate of the incremental maintainers ([[DedupLedgerStream]], the
  * aggregate ledger in [[graft.ext.AggLedger]]).
  *
  * Layout: each commit writes a COMPLETE new table under `root/v<id>/`,
  * then flips `root/_LATEST` to that version via write-temp + ONE
  * overwriting rename (`FileContext.rename(OVERWRITE)` — atomic on
  * HDFS/local), so a kill mid-write leaves the previous version intact and
  * replaying a batch id overwrites its own dir rather than forking state.
  * Readers resolve the pointer first; if the pointer is ABSENT but
  * committed version dirs exist (a crash in a non-atomic flip on a store
  * without overwriting rename), they recover from the highest version
  * instead of silently serving empty state. Superseded versions are pruned
  * after the flip (best-effort; a leftover dir is unreferenced, never
  * wrong).
  */
object VersionedState {

  private def fs(spark: SparkSession, root: String) =
    new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Committed version dirs under `root`, highest id first. */
  private def versionDirs(f: org.apache.hadoop.fs.FileSystem,
                          root: String): Seq[org.apache.hadoop.fs.Path] = {
    val rp = new org.apache.hadoop.fs.Path(root)
    if (!f.exists(rp)) Seq.empty
    else f.listStatus(rp).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.matches("v\\d+"))
      .sortBy(-_.getPath.getName.drop(1).toLong)
      .map(_.getPath)
  }

  /** The current state table, or an empty frame of `schema` before the
    * first commit (see the pointer-recovery contract in the class doc).
    */
  def current(spark: SparkSession, root: String, schema: StructType): DataFrame = {
    val f = fs(spark, root)
    val ptr = new org.apache.hadoop.fs.Path(root, "_LATEST")
    if (f.exists(ptr)) {
      val in = f.open(ptr)
      val v = try scala.io.Source.fromInputStream(in).mkString.trim finally in.close()
      spark.read.parquet(s"$root/$v")
    } else versionDirs(f, root) match {
      case latest +: _ => spark.read.parquet(latest.toString)
      case _ => spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema)
    }
  }

  /** Write `updated` as version `batchId` and flip the pointer to it. */
  def commit(updated: DataFrame, batchId: Long, root: String): Unit = {
    val spark = updated.sparkSession
    val version = s"v$batchId"
    updated.write.mode("overwrite").parquet(s"$root/$version")
    val f = fs(spark, root)
    val tmp = new org.apache.hadoop.fs.Path(root, s"_LATEST.tmp$batchId")
    val ptr = new org.apache.hadoop.fs.Path(root, "_LATEST")
    val out = f.create(tmp, true)
    try out.write(version.getBytes("UTF-8")) finally out.close()
    // commit point: ONE overwriting rename onto the pointer.
    // delete-then-rename would open a window where a crash leaves NO
    // pointer; current()'s highest-version fallback covers even that on
    // stores lacking overwrite-rename, but here the window doesn't exist.
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
