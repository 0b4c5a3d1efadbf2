package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-document curation lineage — drop-reason attribution through the
  * standard text-curation funnel. Every training-data pipeline needs to
  * answer "WHY is this document not in the corpus?" per document (not just
  * stage counts): it's how curation regressions are debugged and how
  * removal requests are audited.
  *
  * Stages, evaluated in pipeline order; a document is attributed to the
  * FIRST stage that drops it:
  *   1. `empty`   — NULL or zero-length text;
  *   2. `quality` — Gopher/C4 rule battery ([[TextOps.qualityScore]])
  *                  below `minScore`;
  *   3. `dup`     — exact-content duplicate of an earlier (lower-id)
  *                  SURVIVOR. Dedup runs over the docs that passed the
  *                  earlier stages, as a real pipeline does — a duplicate
  *                  of a quality-dropped document is NOT a duplicate in
  *                  the surviving corpus;
  *   4. `kept`    — in the final corpus.
  *
  * Scale shape: stages 1–2 are pure columnar predicates fused with the
  * scan; stage 3 is [[ExactDedup.canonicalIds]] — the hash-first layout
  * whose wide shuffle carries `(xxhash64, id)`, never document bodies.
  * The result is one row per input document: `(doc_id, stage)`.
  */
object Curation {

  /** Source-priority dedup keep rule — when the same content arrives from
    * multiple sources, keep the copy from the most trusted source, not the
    * accidental min-id one. This is the cross-source merge every mixture
    * build runs (curated dumps beat crawl copies of the same page): the
    * keep decision is `min (priority, id)` lexicographically per exact-text
    * group, so ties within a source still resolve deterministically.
    *
    * Output: `(idCol, kept_id)` for EVERY input row — the join-able
    * mapping, same contract as [[ExactDedup.canonicalIds]]. Scale shape is
    * the same hash-first layout: singleton xxhash64 groups (almost the
    * whole corpus) decide themselves without text or priority entering a
    * shuffle; only multi-member hash groups fetch `(text, priority)` for
    * the exact null-safe `(hash, text)` grouping, where `min(struct(
    * priority, id))` picks the winner in one keyed aggregation.
    *
    * Priorities must be NON-NULL: Spark's struct min sorts a NULL field
    * FIRST (a NULL priority would silently win every group) while SQL
    * engines default to NULLS LAST — coalesce to an explicit sentinel
    * (e.g. Long.MaxValue for "least trusted") before calling.
    */
  def priorityKeep(docs: DataFrame, priorityCol: String,
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val ids = docs.select(col(idCol).as("id"), xxhash64(col(textCol)).as("h"))
    val dupKeys = ids.groupBy(col("h")).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).select(col("h"))

    val singles = ids.join(dupKeys, Seq("h"), "left_anti")
      .select(col("id").as(idCol), col("id").as("kept_id"))

    val dupRows = docs
      .select(col(idCol).as("id"), col(textCol).as("t"),
        col(priorityCol).as("p"), xxhash64(col(textCol)).as("h"))
      .join(dupKeys, Seq("h"), "left_semi")
    val winners = dupRows.groupBy(col("h"), col("t"))
      .agg(min(struct(col("p"), col("id"))).as("w"))
      .select(col("h").as("wh"), col("t").as("wt"), col("w.id").as("kept_id"))
    val mapped = dupRows
      .join(winners, col("h") === col("wh") && col("t") <=> col("wt"))
      .select(col("id").as(idCol), col("kept_id"))

    singles.union(mapped)
  }

  /** Best-quality cluster representative: per `compCol` group, the row
    * with the highest `qCol` (tie → min id). The argmax is
    * `min(struct(-q, id))` — one keyed aggregation, never a
    * per-component window (a mega-component would serialize through one
    * task). Quality must be non-null for every labeled row (same
    * engine-portability reason as [[priorityKeep]]'s non-null contract).
    * Output: `(compCol, rep_id, rep_quality)`.
    */
  def bestRepresentative(labels: DataFrame, quality: DataFrame,
                         idCol: String = "doc_id", compCol: String = "component",
                         qCol: String = "q"): DataFrame =
    labels.join(quality.select(col(idCol), col(qCol).cast("int").as("__q")), Seq(idCol))
      .groupBy(col(compCol))
      .agg(min(struct((lit(0) - col("__q")).as("nq"), col(idCol).as("id"))).as("w"))
      .select(col(compCol), col("w.id").as("rep_id"),
        (lit(0) - col("w.nq")).cast("bigint").as("rep_quality"))

  def lineage(docs: DataFrame, minScore: Int = 3,
              idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val base = docs.select(col(idCol), col(textCol),
      when(col(textCol).isNull || length(col(textCol)) === 0, lit("empty"))
        .when(TextOps.qualityScore(textCol) < minScore, lit("quality"))
        .as("drop0"))
    val survivors = base.filter(col("drop0").isNull).select(col(idCol), col(textCol))
    val canon = ExactDedup.canonicalIds(survivors, idCol, textCol)
    base.join(canon, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("drop0"),
          when(col("canonical_id") =!= col(idCol), lit("dup"))
            .otherwise(lit("kept"))).as("stage"))
  }
}
