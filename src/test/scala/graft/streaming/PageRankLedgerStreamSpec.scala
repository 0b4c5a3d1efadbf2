package graft.streaming

import graft.SparkSpec
import graft.ext.PageRank
import org.apache.spark.sql.functions._

/** Pins [[PageRankLedgerStream]]: maintained-over-waves equals the full
  * fixed-round recompute over every edge folded, replay idempotence,
  * crash-dir exclusion, and the MemoryStream attach path.
  */
class PageRankLedgerStreamSpec extends SparkSpec {
  import spark.implicits._

  private val allEdges = Seq(
    ("a", "b"), ("b", "a"), ("b", "c"), ("c", "a"),
    ("d", "a"), ("a", "d"), ("c", "d"), ("e", "a"), ("a", "e"))

  private def scores(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  private def want(edges: Seq[(String, String)], iters: Int = 4): Map[String, Long] =
    scores(PageRank.pagerankInt(edges.toDF("src", "dst"), iters))

  test("maintained over waves == full recompute after each batch; bootstrap included") {
    val root = java.nio.file.Files.createTempDirectory("prledger").toString + "/st"
    val waves = allEdges.grouped(3).toSeq
    var seen = Seq.empty[(String, String)]
    waves.zipWithIndex.foreach { case (w, i) =>
      PageRankLedgerStream.maintain(w.toDF("src", "dst"), i.toLong, root, iters = 4)
      seen ++= w
      assert(scores(PageRankLedgerStream.serve(spark, root, iters = 4)) ===
        want(seen), s"after wave $i")
    }
  }

  test("replayed batch is a no-op (idempotent recompute); empty batch no-op") {
    val root = java.nio.file.Files.createTempDirectory("prledger-rp").toString + "/st"
    val b0 = allEdges.take(5)
    val b1 = allEdges.drop(5)
    PageRankLedgerStream.maintain(b0.toDF("src", "dst"), 0L, root, iters = 4)
    PageRankLedgerStream.maintain(b1.toDF("src", "dst"), 1L, root, iters = 4)
    val settled = scores(PageRankLedgerStream.serve(spark, root, iters = 4))
    assert(settled === want(allEdges))
    // crash after commit, before the checkpoint recorded batch 1: the
    // engine re-delivers (1, content) — scores and edge multiset unchanged
    PageRankLedgerStream.maintain(b1.toDF("src", "dst"), 1L, root, iters = 4)
    assert(scores(PageRankLedgerStream.serve(spark, root, iters = 4)) === settled)
    assert(PageRankLedgerStream.edges(spark, root).count() === allEdges.size.toLong)
    PageRankLedgerStream.maintain(b1.toDF("src", "dst").limit(0), 2L, root, iters = 4)
    assert(scores(PageRankLedgerStream.serve(spark, root, iters = 4)) === settled)
  }

  test("an uncommitted edge batch dir (no _SUCCESS) is excluded from the graph") {
    val root = java.nio.file.Files.createTempDirectory("prledger-cr").toString + "/st"
    PageRankLedgerStream.maintain(allEdges.take(5).toDF("src", "dst"), 0L, root, iters = 4)
    // simulate a crash mid-write of batch 1's edge dir
    allEdges.drop(5).toDF("src", "dst")
      .write.mode("overwrite").parquet(s"$root/edges/batch=1")
    val marker = new java.io.File(s"$root/edges/batch=1/_SUCCESS")
    assert(marker.exists()); assert(marker.delete())
    assert(PageRankLedgerStream.edges(spark, root).count() === 5L)
  }

  test("warm-start handoff: commitPrecomputed seeds state; maintain continues from it") {
    val root = java.nio.file.Files.createTempDirectory("prledger-ws").toString + "/st"
    val b0 = allEdges.take(5)
    val b1 = allEdges.drop(5)
    // batch engine hands its ledger over at parquet-write cost...
    PageRankLedgerStream.commitPrecomputed(b0.toDF("src", "dst"), 0L, root,
      PageRank.pagerankRounds(b0.toDF("src", "dst"), iters = 4))
    assert(scores(PageRankLedgerStream.serve(spark, root, iters = 4)) === want(b0))
    // ...and the genuine incremental maintain continues from the seeded state
    PageRankLedgerStream.maintain(b1.toDF("src", "dst"), 1L, root, iters = 4)
    assert(scores(PageRankLedgerStream.serve(spark, root, iters = 4)) === want(allEdges))
    assert(PageRankLedgerStream.edges(spark, root).count() === allEdges.size.toLong)
  }

  test("streamed edge batches converge to the batch recompute") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("prledger-st").toString + "/st"
    val ckpt = java.nio.file.Files.createTempDirectory("prledger-ck").toString
    val input = MemoryStream[(String, String)]
    val q = PageRankLedgerStream.attach(
      input.toDF().toDF("src", "dst"), root, ckpt, iters = 4).start()
    try {
      input.addData(allEdges.take(4))
      q.processAllAvailable()
      input.addData(allEdges.drop(4))
      q.processAllAvailable()
    } finally q.stop()
    assert(scores(PageRankLedgerStream.serve(spark, root, iters = 4)) ===
      want(allEdges))
  }
}
