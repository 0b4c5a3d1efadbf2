package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact content deduplication, hash-first (the SCALE.md production form).
  *
  * A naive `groupBy(text)` ships every document body through the wide
  * shuffle — at 100 TB the shuffle IS the corpus. Here the wide shuffle
  * carries `(xxhash64(text), doc_id)` — 16 bytes per row — and document
  * bytes move only for rows that are actual duplicate candidates:
  *
  *   1. hash pass: group by the 64-bit content hash; `min(id)` + count per
  *      hash group. A group of size 1 is a unique text by construction
  *      (equal texts always share a hash), so it needs no verification.
  *   2. verify pass: rows whose hash group has >1 member (the duplicates
  *      themselves, plus astronomically rare 64-bit collisions) are
  *      re-selected with a semi join on the 8-byte key and re-grouped by
  *      `(hash, text)` — which partitions exactly like `text`, so the
  *      output is identical to the naive form.
  *
  * Two corpus scans instead of one, but scans are cheap (columnar, pushed
  * projection) and the full-payload shuffle is gone.
  */
object ExactDedup {

  /** (canonical_id, n_copies) per distinct text — same output contract as
    * `groupBy(text).agg(min(id), count)`.
    */
  def byContent(docs: DataFrame, idCol: String = "doc_id",
                textCol: String = "text"): DataFrame = {
    val ids = docs.select(col(idCol).as("id"), xxhash64(col(textCol)).as("h"))
    val groups = ids.groupBy(col("h"))
      .agg(min(col("id")).as("canonical_id"), count(lit(1)).as("n_copies"))

    val singles = groups.filter(col("n_copies") === 1)
      .select(col("canonical_id"), col("n_copies"))

    val dupKeys = groups.filter(col("n_copies") > 1).select(col("h"))
    val verified = docs
      .select(col(idCol).as("id"), col(textCol).as("t"),
        xxhash64(col(textCol)).as("h"))
      .join(dupKeys, Seq("h"), "left_semi")
      .groupBy(col("h"), col("t"))
      .agg(min(col("id")).as("canonical_id"), count(lit(1)).as("n_copies"))
      .select(col("canonical_id"), col("n_copies"))

    singles.union(verified)
  }

  /** Per-document canonical mapping `(idCol, canonical_id)` — the
    * join-able form of [[byContent]]: every input row appears once, mapped
    * to the min-id representative of its exact-text group (itself when
    * unique). Same hash-first layout: rows in singleton hash groups are
    * their own canonical WITHOUT text ever entering a shuffle; only rows
    * in multi-member hash groups (actual duplicates + vanishingly rare
    * 64-bit collisions) fetch text for the exact `(hash, text)` grouping.
    * The text-side joins are null-safe so NULL payloads form one group,
    * matching SQL `GROUP BY` semantics.
    */
  def canonicalIds(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    val ids = docs.select(col(idCol).as("id"), xxhash64(col(textCol)).as("h"))
    val dupKeys = ids.groupBy(col("h")).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).select(col("h"))

    val singles = ids.join(dupKeys, Seq("h"), "left_anti")
      .select(col("id").as(idCol), col("id").as("canonical_id"))

    val dupRows = docs
      .select(col(idCol).as("id"), col(textCol).as("t"),
        xxhash64(col(textCol)).as("h"))
      .join(dupKeys, Seq("h"), "left_semi")
    val canon = dupRows.groupBy(col("h"), col("t"))
      .agg(min(col("id")).as("canonical_id"))
      .select(col("h").as("ch"), col("t").as("ct"), col("canonical_id"))
    val mapped = dupRows
      .join(canon, col("h") === col("ch") && col("t") <=> col("ct"))
      .select(col("id").as(idCol), col("canonical_id"))

    singles.union(mapped)
  }

  /** Incremental exact dedup — the daily-ingest flow: which docs of a NEW
    * batch are absent (by content) from an existing corpus? History is
    * never re-deduped; at steady state the corpus side is a precomputed
    * 8-byte content-hash table. Batch rows probe it by hash, and ONLY
    * hash-matched candidates fetch corpus text for exact verification —
    * so a hash collision can never drop a genuinely novel document, and
    * corpus text moves only for actual duplicate candidates.
    *
    * Within-batch duplicates are deliberately retained (compose with
    * [[byContent]] for that half).
    */
  def newAgainstCorpus(batch: DataFrame, corpus: DataFrame,
                       idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame =
    novelAgainstHashes(batch,
      corpus.select(xxhash64(col(textCol)).as("h"), col(textCol).as("t")),
      idCol, textCol)

  /** The incremental core over a PRECOMPUTED corpus content table `(h =
    * xxhash64(text), t = text)` — the "precomputed 8-byte content-hash
    * table" the [[newAgainstCorpus]] doc promises, servable from
    * maintained state ([[graft.streaming.ExactDedupLedgerStream]]) so the
    * corpus is hashed ONCE, not per ingest. Identical join shape: batch
    * rows probe by the 8-byte hash (left_anti = novel with no corpus
    * text ever read), and only hash-matched candidates verify against
    * corpus text — a collision can never drop a novel document.
    */
  def novelAgainstHashes(batch: DataFrame, corpusHT: DataFrame,
                         idCol: String = "doc_id",
                         textCol: String = "text"): DataFrame = {
    val b = batch.select(col(idCol), col(textCol).as("t"),
      xxhash64(col(textCol)).as("h"))
    val corpusHashes = corpusHT.select(col("h"))
    val noHashMatch = b.join(corpusHashes, Seq("h"), "left_anti")
      .select(col(idCol))
    val candidates = b.join(corpusHashes, Seq("h"), "left_semi")
    val collisionOnly = candidates
      .join(corpusHT.select(col("h"), col("t")), Seq("h", "t"), "left_anti")
      .select(col(idCol))
    noHashMatch.union(collisionOnly)
  }
}
