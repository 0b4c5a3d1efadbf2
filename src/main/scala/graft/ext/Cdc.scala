package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Content-defined chunking (CDC) — the incremental-storage / delta-dedup
  * primitive (Rabin-fingerprint chunkers; FastCDC is the production
  * descendant): split each document at positions where a rolling window
  * hash satisfies a divisor rule, so chunk boundaries are a function of
  * CONTENT, not offsets — an insertion early in a document shifts every
  * fixed-size block but leaves all CDC chunks after the edit window
  * identical, which is what makes chunk-level dedup of near-identical
  * documents (and snapshot storage) work.
  *
  * Chunking rule (all integer, both engines): windows are the `Window`=8
  * trailing code points; the hash of the window ending at code point p is
  * `Σ_{j=0..7} (cp(p−7+j) mod 4096) · 33^(7−j)` — a polynomial in base 33
  * whose magnitude stays below 2⁶³ WITHOUT modular wrap-around (max
  * ≈ 1.8·10¹⁴), because DuckDB BIGINT arithmetic errors on overflow where
  * the JVM would silently wrap; the `mod 4096` on the code point is what
  * buys that headroom for astral-plane input. A cut falls after p
  * whenever `hash mod 61 = 0` (61 prime → expected chunk ≈ 61 chars; a
  * power-of-two divisor would resonate with the base's low bits). Cuts
  * are strictly inside the text, documents shorter than one window are a
  * single chunk, empty documents produce no chunks.
  *
  * Scale shape: chunking is MAP-ONLY (one pass per document, rolling
  * update — no re-hash per position); the dedup statistic is one keyed
  * aggregation on chunk content. At 100 TB the group-by key would be
  * `xxhash64(chunk)` first with a verify pass (the [[SubstrDedup]]
  * hash-first discipline); the fixture-sized entry groups by the chunk
  * text itself so the oracle checks content, not intermediate hashes.
  */
object Cdc {

  val Window = 8
  val Base = 33L
  val CpMod = 4096L
  val Divisor = 61L

  /** Cut positions (code-point counts, strictly ascending, each <
    * codePointCount) for one text — the rolling form of the window
    * polynomial above (exact: values never exceed ~6·10¹⁵).
    */
  private[ext] def cutPoints(text: String): Seq[Int] = {
    // decode to code points once
    val cps = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      cps += cp
      i += Character.charCount(cp)
    }
    val n = cps.length
    if (n <= Window) return Seq.empty
    val topPow = { var p = 1L; var k = 0; while (k < Window - 1) { p *= Base; k += 1 }; p }
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var h = 0L
    var p = 0
    while (p < n) {
      val c = (cps(p) % CpMod.toInt).toLong
      h = if (p < Window) h * Base + c
      else (h - (cps(p - Window) % CpMod.toInt).toLong * topPow) * Base + c
      // window complete at p >= Window-1; cuts strictly inside the text
      if (p >= Window - 1 && p < n - 1 && h % Divisor == 0L) out += p + 1
      p += 1
    }
    out.toSeq
  }

  /** Per-document CDC chunks: `(doc_id, chunk_idx, chunk_len,
    * chunk_text)` — 1-based index in document order, length in code
    * points. Map-only (mapPartitions; the cut walk is the hot path).
    */
  def chunks(docs: DataFrame, idCol: String = "doc_id",
             textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        if (text == null || text.isEmpty) Iterator.empty
        else {
          val cuts = cutPoints(text)
          val bounds = (0 +: cuts) :+ text.codePointCount(0, text.length)
          // walk the bounds once, advancing the CHAR offset from the
          // previous bound — offsetByCodePoints from 0 per bound would
          // re-scan the prefix and make extraction O(len²/avgChunkLen)
          // in code points for long documents (round-13 ADVICE)
          var prevCp = 0
          var prevOff = 0
          bounds.sliding(2).zipWithIndex.map { case (Seq(a, b), k) =>
            val from = text.offsetByCodePoints(prevOff, a - prevCp)
            val to = text.offsetByCodePoints(from, b - a)
            prevCp = b
            prevOff = to
            (id, k + 1, b - a, text.substring(from, to))
          }
        }
      }
      .toDF(idCol, "chunk_idx", "chunk_len", "chunk_text")
  }

  /** Corpus-level chunk dedup statistics over a [[chunks]] frame: total
    * chunks, distinct contents, total characters, and the characters a
    * chunk store saves by keeping each content once (`(copies−1)·len` —
    * the CDC storage-dedup headline number).
    */
  def dedupStats(ch: DataFrame): DataFrame =
    ch.groupBy(col("chunk_text"))
      .agg(count(lit(1)).as("c"), max(col("chunk_len")).as("l"))
      .agg(sum(col("c")).as("n_chunks"),
        count(lit(1)).as("n_distinct"),
        sum(col("c") * col("l")).as("total_chars"),
        sum((col("c") - 1) * col("l")).as("dup_chars"))
}
