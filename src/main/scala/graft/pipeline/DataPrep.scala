package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.{ExactDedup, MinHashDedup, TextOps}
import graft.ops.Sampling

/** End-to-end training-data preparation: the composition a user actually
  * runs over a raw corpus, chaining the engine's M3 operators —
  *
  *   raw documents
  *     → quality gate   (TextOps rule battery, keep score ≥ minScore)
  *     → exact dedup    (hash-first; keep each text's canonical doc)
  *     → near-dup prune (MinHash LSH pairs; greedy keep-smaller-id)
  *     → split          (deterministic hash bands: train/val/test)
  *     → write          (parquet partitioned by split)
  *
  * Every stage is a narrow or key-shuffled plan (no payload-carrying wide
  * ops, no driver data); determinism end to end — rerunning produces the
  * same corpus, which is what makes downstream caches and experiment
  * comparisons meaningful.
  */
object DataPrep {

  final case class Config(minScore: Int = 3,
                          nearDupJaccard: Double = 0.8,
                          splitWeights: Seq[Double] = Seq(0.8, 0.1, 0.1),
                          splitNames: Seq[String] = Seq("train", "val", "test"))

  /** Quality-gated corpus. */
  def qualityGate(docs: DataFrame, minScore: Int): DataFrame =
    docs.filter(TextOps.qualityScore("text") >= minScore)

  /** Keep one canonical doc per distinct text (hash-first, scale-safe). */
  def dropExactDups(docs: DataFrame): DataFrame =
    docs.join(
      ExactDedup.byContent(docs).select(col("canonical_id").as("doc_id")),
      Seq("doc_id"), "left_semi")

  /** Greedy near-dup pruning: for every LSH-confirmed pair (a < b), drop b.
    * One pass, pairs ≪ corpus. Because similarity is not transitive, an
    * a–c, b–c chain keeps BOTH a and b here; [[dropNearDupClusters]] is the
    * exact variant that collapses chains via connected components.
    */
  def dropNearDups(docs: DataFrame, minJaccard: Double): DataFrame =
    docs.join(
      MinHashDedup.nearDuplicates(docs, minJaccard = minJaccard)
        .select(col("doc_b").as("doc_id")).distinct(),
      Seq("doc_id"), "left_anti")

  /** Exact cluster semantics: connected components over the LSH pair graph,
    * one representative (min id) per cluster ([[graft.ext.Components]]).
    * Costs the CC rounds on top of the pair join; same cost class (pairs ≪
    * corpus), stricter result on transitivity chains.
    */
  def dropNearDupClusters(docs: DataFrame, minJaccard: Double): DataFrame =
    graft.ext.Components.keepRepresentatives(
      docs, MinHashDedup.nearDuplicates(docs, minJaccard = minJaccard))

  /** Per-domain quota — corpus balancing: keep at most `k` docs per
    * `domainCol` value, priority = quality score desc then doc_id asc (a
    * TOTAL order, so the survivors are deterministic). The standard
    * over-represented-source cap (C4 keeps ~1 doc per URL; per-domain caps
    * are the coarser form).
    *
    * Plan shape: [[graft.ext.TopKAgg]]'s k-bounded partial aggregation,
    * NOT `row_number().over(Window.partitionBy(domain))`. A windowed rank
    * forces EVERY row of a domain into one task — and a skewed mega-domain
    * is exactly what quotas exist for; AQE cannot split a window exchange
    * (its skew optimization applies to sort-merge-join partitions only),
    * so at 100 TB that one task is a straggler/OOM. With the bounded
    * aggregator each map task keeps ≤ k (score, id) pairs per domain, the
    * exchange carries ≤ k·domains·tasks summary rows instead of the
    * corpus, and the survivors' ids (≤ k·domains) come back via a semi
    * join AQE turns into a broadcast at any realistic domain count.
    * Identical output (same total order); pinned in PlanShapeSpec.
    *
    * Preconditions: `doc_id` must be an integral column with UNIQUE values
    * — it is the priority tiebreak, and a duplicated id makes the survivor
    * set nondeterministic under ANY implementation (the window form's
    * row_number over tied (score, id) pairs was order-dependent too); the
    * type is checked at entry, uniqueness is the corpus contract every
    * dedup operator here shares. A NULL quality score (NULL text) ranks
    * LAST — the same place the window's `desc` ordering put it.
    */
  def domainQuota(docs: DataFrame, domainCol: String, k: Int): DataFrame = {
    require(k >= 1, s"domainQuota: k must be >= 1, got $k")
    val idType = docs.schema("doc_id").dataType
    require(Seq[org.apache.spark.sql.types.DataType](
      org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
      org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType)
      .contains(idType),
      s"domainQuota: doc_id must be an integral id column, got $idType " +
        "(hash non-numeric ids to 64-bit first, e.g. xxhash64)")
    val topk = udaf(new graft.ext.TopKAgg(k))
    // coalesce: the typed aggregator's (Double, Long) encoder rejects NULL
    // fields at runtime; -Inf reproduces the window's nulls-last ranking
    val kept = docs
      .groupBy(col(domainCol))
      .agg(topk(
        coalesce(TextOps.qualityScore("text").cast("double"),
          lit(Double.NegativeInfinity)),
        col("doc_id").cast("long")).as("top"))
      .select(explode(col("top._2")).as("doc_id"))
    docs.join(kept, Seq("doc_id"), "left_semi")
  }

  /** Token-budget corpus selection: take documents in priority order
    * (`priorityCol` DESC, `idCol` ASC — a total order) until the token
    * budget fills. Greedy fill: a doc is selected iff the running token
    * total BEFORE it is under `budget`, so the doc that crosses the line
    * is INCLUDED and the selection overshoots by less than one document —
    * the convention that makes "select N tokens of the best data" a pure
    * prefix of the priority order (published data-mixing recipes state
    * budgets this way: take the top-quality prefix, not a knapsack).
    *
    * Scale shape: the running total is [[graft.ext.Packing]]'s two-phase
    * distributed prefix sum over the priority order — range partition +
    * per-partition windows + broadcast partition offsets. No global
    * `Window.orderBy` over data (one unsplittable task), and no
    * driver-side iteration: the budget line is found by arithmetic on the
    * distributed cum column.
    *
    * Output: the selected docs with `cum_tokens` (running total INCLUDING
    * the doc — ≥ budget only for the crossing doc). Ties: `idCol` must be
    * unique (the corpus contract); equal priorities resolve by id.
    */
  def tokenBudgetSelect(docs: DataFrame, budget: Long, priorityCol: String,
                        tokensCol: String, idCol: String = "doc_id"): DataFrame = {
    require(budget >= 1, s"tokenBudgetSelect: budget must be >= 1, got $budget")
    graft.ext.Packing
      .runningTotalBy(docs, Seq(col(priorityCol).desc, col(idCol)), tokensCol)
      .withColumnRenamed("cum", "cum_tokens")
      .filter(col("cum_tokens") - col(tokensCol) < budget)
  }

  /** Curriculum ordering — phase-bucketed training order: rank the corpus
    * by quality (`priorityCol` DESC, id ASC), cut the ranking into
    * `phases` equal-size buckets (phase 1 = best docs — the curriculum
    * a quality-staged training run consumes first), then give each phase
    * an independent deterministic shuffle order (`phase_pos`, the
    * [[graft.ext.Packing.epochShuffle]] md5 key) so within-phase batch
    * composition is decorrelated from quality rank.
    *
    * The phase cut is arithmetic on the global rank — `(rank−1)·phases
    * div N + 1` — not ntile() (whose remainder-distribution rule differs
    * across engines); rank and within-phase positions are both
    * distributed prefix sums ([[graft.ext.Packing.runningTotalBy]] /
    * [[graft.ext.Packing.runningTotalByGroup]]), so there is no global
    * or per-phase data window anywhere. N arrives as a broadcast
    * single-row aggregate.
    */
  def curriculumOrder(docs: DataFrame, priorityCol: String, phases: Int,
                      epoch: Int, idCol: String = "doc_id"): DataFrame = {
    require(phases >= 1, s"curriculumOrder: phases must be >= 1, got $phases")
    val ranked = graft.ext.Packing.runningTotalBy(
      docs.withColumn("__one", lit(1L)),
      Seq(col(priorityCol).desc, col(idCol)), "__one")
      .withColumnRenamed("cum", "__rank")
    val total = docs.agg(count(lit(1)).as("__n"))
    val phased = ranked.crossJoin(broadcast(total))
      .withColumn("phase",
        (expr(s"((__rank - 1) * $phases) div __n") + 1).cast("int"))
      .drop("__rank", "__n")
    graft.ext.Packing.runningTotalByGroup(
      phased.withColumn("__skey",
        md5(concat(lit(s"$epoch:"), col(idCol).cast("string")))),
      "phase", Seq(col("__skey"), col(idCol)), "__one")
      .withColumnRenamed("cum", "phase_pos")
      .drop("__skey", "__one")
  }

  /** Per-LANGUAGE percentile quality gate: keep documents whose quality
    * score is at or above their own language's `p`-quantile. Absolute
    * thresholds are wrong across languages — tokenization density, stopword
    * coverage, and length norms all differ, so a single cutoff silently
    * skews the language mix; ranking each doc against its language's score
    * distribution is the standard fix.
    *
    * Scale shape: thresholds are one row per language (a tiny aggregate)
    * broadcast back; the gate itself is a map-side filter. The quantile
    * aggregation is the only interesting part:
    *  - `exact = false` (default, the 100 TB path) uses
    *    `approx_percentile` — a mergeable bounded-memory sketch with
    *    map-side partials, so a mega-language never concentrates its score
    *    list in one reducer.
    *  - `exact = true` uses exact `percentile` (per-group value-count
    *    state — unbounded in distinct scores; fine at oracle/test scale,
    *    and the DuckDB `quantile_cont` twin, which is how the gate is
    *    oracle-checked).
    * Comparisons against an interpolated threshold are cross-engine-safe:
    * when `(n-1)·p` is integral both engines return an order statistic
    * bit-exactly; otherwise the interpolated value lies strictly between
    * two adjacent data points, so a last-ulp difference cannot flip any
    * `score ≥ thr` outcome.
    *
    * A NULL `langCol` forms its own group (null-safe join) — those docs
    * gate against the null-language population rather than vanishing.
    * NULL scores are ignored by the quantile and never pass the gate.
    */
  def languageQualityGate(docs: DataFrame, langCol: String, scoreCol: String,
                          p: Double, exact: Boolean = false): DataFrame = {
    require(p > 0.0 && p < 1.0, s"languageQualityGate: p must be in (0,1), got $p")
    val agg = if (exact) percentile(col(scoreCol), lit(p))
              else approx_percentile(col(scoreCol), lit(p), lit(10000))
    val thr = docs.groupBy(col(langCol)).agg(agg.as("__gate_thr"))
      .withColumnRenamed(langCol, "__gate_lang")
    docs.join(broadcast(thr), col(langCol) <=> col("__gate_lang"))
      .filter(col(scoreCol) >= col("__gate_thr"))
      .drop("__gate_lang", "__gate_thr")
  }

  /** Per-language score bucketing — the CCNet decision rule (Wenzek et al.
    * 2020): rather than dropping below-threshold docs, label each one
    * `head` / `middle` / `tail` against its OWN language's LM-score
    * distribution, so downstream mixing can weight buckets (CCNet trains
    * on head+middle and keeps tail for ablations). Cutoffs default to the
    * quartiles (`head` = top quarter, `tail` = bottom quarter): exactly
    * representable doubles, so `(n-1)·p` stays bit-identical cross-engine
    * (the [[languageQualityGate]] interpolation argument).
    *
    * Same scale shape as the gate: one tiny per-language threshold row
    * broadcast back, bucketing is a map-side projection; `exact = false`
    * (default) is the mergeable-sketch 100 TB path, `exact = true` the
    * DuckDB `quantile_cont` oracle twin. NULL languages bucket against the
    * null-language population; a NULL score yields a NULL bucket.
    */
  def languageBuckets(docs: DataFrame, langCol: String, scoreCol: String,
                      pLo: Double = 0.25, pHi: Double = 0.75,
                      exact: Boolean = false): DataFrame = {
    require(pLo > 0.0 && pLo < pHi && pHi < 1.0,
      s"languageBuckets: need 0 < pLo < pHi < 1, got ($pLo, $pHi)")
    def q(p: Double) = if (exact) percentile(col(scoreCol), lit(p))
                       else approx_percentile(col(scoreCol), lit(p), lit(10000))
    val thr = docs.groupBy(col(langCol))
      .agg(q(pLo).as("__b_lo"), q(pHi).as("__b_hi"))
      .withColumnRenamed(langCol, "__b_lang")
    docs.join(broadcast(thr), col(langCol) <=> col("__b_lang"))
      .withColumn("bucket",
        when(col(scoreCol) >= col("__b_hi"), lit("head"))
          .when(col(scoreCol) < col("__b_lo"), lit("tail"))
          .when(col(scoreCol).isNotNull, lit("middle")))
      .drop("__b_lang", "__b_lo", "__b_hi")
  }

  /** Full pipeline; writes `outDir/split=…` and returns the final corpus
    * with its split column.
    */
  def run(spark: SparkSession, docs: DataFrame, outDir: String,
          cfg: Config = Config()): DataFrame = {
    val prepared = Sampling.splitByHash(
      dropNearDups(dropExactDups(qualityGate(docs, cfg.minScore)), cfg.nearDupJaccard),
      col("doc_id"), cfg.splitWeights, cfg.splitNames)
    prepared.write.mode("overwrite").partitionBy("split").parquet(outDir)
    // hand back the WRITTEN corpus: re-running the multi-join LSH pipeline
    // on every downstream action would triple the cost of the lazy plan
    spark.read.parquet(outDir)
  }
}
