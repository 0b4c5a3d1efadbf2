package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the dataset-versioning primitive a training-data
  * pipeline runs between two corpus versions before re-training: which
  * documents were added, which removed, which changed in place?
  *
  * Scale shape: each side is reduced to `(id, md5(payload))` — a
  * column-pruned scan plus a 32-byte-hex fingerprint — before the single
  * keyed full-outer join on the id. Document BODIES never enter the
  * shuffle; at 100 TB the diff moves ~40 bytes/row regardless of document
  * size. Unchanged rows (the overwhelming majority between adjacent
  * snapshots) are filtered out post-join, so the result is proportional to
  * the churn, not the corpus.
  *
  * `changed` is fingerprint inequality: md5 collisions could mask a real
  * change — the same astronomically-unlikely assumption the MinHash/LSH
  * family carries (a 128-bit collision, not a sketch approximation). NULL
  * payloads fingerprint to a sentinel so NULL→NULL reads as unchanged and
  * NULL→text as changed.
  */
object CorpusDiff {

  /** Cross-source content-overlap matrix — "how many distinct documents
    * does source A share VERBATIM with source B?" The dataset-audit
    * artifact behind mixture design and licensing review: a crawl slice
    * that verbatim-contains half a curated dump changes both how you
    * weight them and whether you may ship them.
    *
    * Scale shape follows the hash-first dedup discipline: the corpus-wide
    * pass is `distinct (source, xxhash64(text))` (8 B + source per row);
    * only hashes seen in ≥ 2 distinct sources fetch text, and the pair
    * join runs on the (hash, text) sliver — exact (collisions die at the
    * text-equality join), with text bytes shuffled only for the shared
    * sliver. Output: `(source_a, source_b, n_shared)` with
    * `source_a < source_b`, n_shared = distinct shared texts.
    */
  def sourceOverlap(docs: DataFrame, srcCol: String = "source",
                    textCol: String = "text"): DataFrame = {
    val base = docs.filter(col(textCol).isNotNull)
      .select(col(srcCol).as("src"), xxhash64(col(textCol)).as("h"),
        col(textCol).as("t"))
    val sh = base.select(col("src"), col("h")).distinct()
    val multi = sh.groupBy(col("h")).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).select(col("h"))
    val sliver = base.join(multi, Seq("h"), "left_semi")
      .select(col("src"), col("h"), col("t")).distinct()
    sliver.select(col("src").as("source_a"), col("h").as("ha"), col("t").as("ta"))
      .join(sliver.select(col("src").as("source_b"), col("h").as("hb"), col("t").as("tb")),
        col("ha") === col("hb") && col("ta") === col("tb") &&
          col("source_a") < col("source_b"))
      .select(col("source_a"), col("source_b"), col("ta"))
      .distinct()
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** (idCol, status) with status ∈ {'added','removed','changed'};
    * unchanged rows are omitted.
    */
  def diff(oldV: DataFrame, newV: DataFrame,
           idCol: String = "doc_id", payloadCol: String = "text"): DataFrame = {
    def fp(d: DataFrame, side: String) =
      d.select(col(idCol).as(s"id_$side"),
        coalesce(md5(col(payloadCol).cast("binary")), lit("<null>")).as(s"fp_$side"))
    fp(oldV, "old")
      .join(fp(newV, "new"), col("id_old") === col("id_new"), "full_outer")
      .withColumn("status",
        when(col("id_old").isNull, lit("added"))
          .when(col("id_new").isNull, lit("removed"))
          .when(col("fp_old") =!= col("fp_new"), lit("changed")))
      .filter(col("status").isNotNull)
      .select(coalesce(col("id_old"), col("id_new")).as(idCol), col("status"))
  }
}
