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
