package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IndexLedgerStreamSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (10L, "alpha beta"),
    (11L, "beta gamma beta"), // duplicate word inside one doc: postings distinct
    (12L, "alpha"),
    (13L, "delta")
  ).toDF("doc_id", "text")

  private def served(root: String) =
    IndexLedgerStream.serve(spark, root).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getString(2)))).toMap

  private val want = Map(
    "alpha" -> ((2L, "10,12")),
    "beta" -> ((2L, "10,11")),
    "gamma" -> ((1L, "11")),
    "delta" -> ((1L, "13")))

  test("maintained over waves equals the batch index; df derived from postings") {
    val root = java.nio.file.Files.createTempDirectory("idxledger").toString + "/st"
    (0 until 3).foreach { w =>
      IndexLedgerStream.maintain(
        docs.filter(pmod(col("doc_id"), lit(3)) === w), w, root)
    }
    assert(served(root) === want)
  }

  test("at-least-once replay is a no-op (set-union idempotence); empty batch no-op") {
    val root = java.nio.file.Files.createTempDirectory("idxledger-rp").toString + "/st"
    val b0 = docs.filter(col("doc_id") < 12)
    val b1 = docs.filter(col("doc_id") >= 12)
    IndexLedgerStream.maintain(b0, 0L, root)
    IndexLedgerStream.maintain(b1, 1L, root)
    assert(served(root) === want)
    // crash after commit, before the checkpoint recorded batch 1: the
    // engine re-delivers (1, content) — postings must not duplicate
    IndexLedgerStream.maintain(b1, 1L, root)
    assert(served(root) === want)
    // even a RESET checkpoint replaying batch 0 as id 0 converges (the
    // idempotence argument that lets this maintainer skip the AggLedger
    // txn guard)
    IndexLedgerStream.maintain(b0, 0L, root)
    assert(served(root) === want)
    IndexLedgerStream.maintain(b0.limit(0), 2L, root)
    assert(served(root) === want)
  }

  test("streamed document batches converge to the batch index; versions pruned") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("idxledger-st").toString + "/st"
    val ckpt = java.nio.file.Files.createTempDirectory("idxledger-ck").toString
    val input = MemoryStream[(Long, String)]
    val q = IndexLedgerStream.attach(input.toDF().toDF("doc_id", "text"),
      root, ckpt).start()
    try {
      input.addData((10L, "alpha beta"), (11L, "beta gamma beta"))
      q.processAllAvailable()
      input.addData((12L, "alpha"), (13L, "delta"))
      q.processAllAvailable()
      assert(served(root) === want)
      val dirs = new java.io.File(root).listFiles().filter(_.isDirectory)
        .map(_.getName).filter(_.startsWith("v"))
      assert(dirs.length === 1, dirs.mkString(","))
    } finally q.stop()
  }
}
