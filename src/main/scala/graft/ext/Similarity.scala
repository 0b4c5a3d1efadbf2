package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search over an `array<float>` column.
  *
  * Two paths (SURVEY.md §7.3 M3):
  *  - [[bruteForceTopK]]: exact cosine top-k — broadcast the (small) query
  *    set against the corpus; one narrow pass + a per-query top-k window.
  *    This is the correct plan whenever |queries| is small: at 100 TB the
  *    corpus streams through executors once, nothing shuffles but the
  *    k·|queries| survivors (AQE prunes the rest).
  *  - [[lshTopK]]: random-hyperplane LSH bucketing — sign-bit sketch over
  *    pseudo-random hyperplanes (hash-derived ±1 components, fully
  *    deterministic, no driver-side randomness), candidates restricted to
  *    same-bucket vectors, exact re-rank inside the bucket. Trades recall
  *    for replacing the cross join with ONE shuffle on bucket ids.
  */
object Similarity {

  /** Allocation-free dot product (native codegen expression — the SQL
    * zip_with/aggregate form materialized an array per evaluation and was
    * the whole cost of the pair joins; same fold order, identical bits).
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.dot_product(a, b)

  /** Cosine similarity between two array<double> columns, rounded at 1e-6
    * (absorbs engine-level accumulation-order ulps; see queries.Util).
    */
  def cosine(a: Column, b: Column): Column =
    round(dot(a, b) / sqrt(dot(a, a)) / sqrt(dot(b, b)), 6)

  /** Cosine from a precomputed dot + per-row norms — for pair joins, where
    * recomputing norms per PAIR would redo per-row work |corpus| times.
    * Division order matches [[cosine]] exactly (x/na/nb), so values are
    * bit-identical.
    */
  private def cosinePre(d: Column, na: Column, nb: Column): Column =
    round(d / na / nb, 6)

  /** Exact top-k neighbours for each query vector (queries × corpus). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int = 10,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).cast("array<double>").as("n_vec"))
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).cast("array<double>").as("q_vec"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"), cosine(col("q_vec"), col("n_vec")).as("cos"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("q_id"), col("n_id"), col("cos"), col("rk"))
  }

  /** Deterministic pseudo-random hyperplane sign sketch: bit j is the sign
    * of Σ_d vec[d] · s(j,d), ±1 signs from mix64 bit streams (native
    * codegen expression — the SQL-lambda form paid an interpreted `hash()`
    * call per (plane, dim) pair per row).
    */
  def hyperplaneSketch(vecCol: String, nPlanes: Int = 16): Column =
    graft.functions.GraftFunctions.hyperplane_sketch(
      col(vecCol), lit(0L), nPlanes)

  /** Trained IVF state: centroids are the ONLY driver-side data (nlist ×
    * dim doubles) — everything else stays distributed.
    */
  final case class IvfModel(centroids: Array[(Int, Seq[Double])]) {
    def centroidDf(spark: org.apache.spark.sql.SparkSession): DataFrame = {
      import spark.implicits._
      broadcast(centroids.toSeq.toDF("cid", "c_vec"))
    }
  }

  private def prepCorpus(corpus: DataFrame, idCol: String, vecCol: String) =
    corpus.select(col(idCol).as("n_id"), col(vecCol).cast("array<double>").as("n_vec"))

  // nearest-centroid assignment as max(struct(sim, -cid)) — a partial-agg
  // groupBy (argmax), cheaper than a per-vector window sort; -cid keeps
  // the smallest-cid-wins tie rule a row_number ordering would give
  private def assignNearest(c: DataFrame, cents: DataFrame): DataFrame =
    c.crossJoin(cents)
      .select(col("n_id"), col("n_vec"),
        struct(cosine(col("n_vec"), col("c_vec")).as("sim"),
          (-col("cid")).as("negcid")).as("sc"))
      .groupBy("n_id")
      .agg(max(col("sc")).as("m"), first(col("n_vec")).as("n_vec"))
      .select(col("n_id"), col("n_vec"), (-col("m.negcid")).cast("int").as("cid"))

  /** IVF (inverted-file) ANN — TRAIN step: Lloyd iterations for `nlist`
    * centroids. Deterministic init (lowest-id vectors); each step is a
    * broadcast join corpus×centroids + argmax + per-dimension mean via
    * posexplode. The two `collect()`s per iteration are bounded by
    * nlist × dim — model state, not data.
    *
    * Train / assign / probe are SEPARATE steps (round-1 verdict): training
    * is paid once per corpus, assignments are persisted once, and a probe's
    * cost — the number a benchmark should measure — is nprobe/nlist of
    * brute force.
    */
  def ivfTrain(corpus: DataFrame, nlist: Int = 16, iters: Int = 3,
               idCol: String = "vec_id", vecCol: String = "embedding"): IvfModel = {
    val spark = corpus.sparkSession
    val c = prepCorpus(corpus, idCol, vecCol)
    var centroids: Array[(Int, Seq[Double])] = c.orderBy("n_id").limit(nlist)
      .collect().zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](1)) }
    (1 to iters).foreach { _ =>
      centroids = assignNearest(c, IvfModel(centroids).centroidDf(spark))
        .select(col("cid"), posexplode(col("n_vec")).as(Seq("pos", "v")))
        .groupBy("cid", "pos")
        // exact-decimal mean: a raw double avg() merges partials in
        // task-completion order, so centroids (and therefore assignments
        // near rounding boundaries) would differ run to run
        .agg((sum(col("v").cast("decimal(28,14)")) / count(lit(1)))
          .cast("double").as("m"))
        .groupBy("cid").agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("dims"))
        .select(col("cid"), expr("transform(dims, d -> d.m)").as("c_vec"))
        .collect().map(r => (r.getInt(0), r.getSeq[Double](1)))
    }
    IvfModel(centroids)
  }

  /** ASSIGN step: one narrow pass tags each corpus vector with its nearest
    * list → (cid, n_id, n_vec). At 100 TB this is written ONCE as a
    * partitioned/bucketed layout keyed by cid; probes then touch only
    * matching files.
    */
  def ivfAssign(corpus: DataFrame, model: IvfModel,
                idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    assignNearest(prepCorpus(corpus, idCol, vecCol),
      model.centroidDf(corpus.sparkSession))
      .select(col("cid"), col("n_id"), col("n_vec"))

  /** PROBE step: each query searches its `nprobe` nearest lists only — the
    * join is on list id, so the corpus never broadcasts.
    */
  def ivfProbe(assigned: DataFrame, model: IvfModel, queries: DataFrame,
               k: Int = 10, nprobe: Int = 4,
               idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cents = model.centroidDf(queries.sparkSession)
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).cast("array<double>").as("q_vec"))
    val probeW = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("cid"))
    val probes = q.crossJoin(cents)
      .select(col("q_id"), col("q_vec"), col("cid"), cosine(col("q_vec"), col("c_vec")).as("sim"))
      .withColumn("rk", row_number().over(probeW)).filter(col("rk") <= nprobe)
      .select(col("cid"), col("q_id"), col("q_vec"))

    val scored = assigned.join(broadcast(probes), Seq("cid"))
      .filter(col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"), cosine(col("q_vec"), col("n_vec")).as("cos"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("q_id"), col("n_id"), col("cos"), col("rk"))
  }

  /** Persist the assignment as a cid-partitioned parquet layout — the
    * 100 TB serving form SCALE.md describes: each inverted list is its own
    * partition directory, so a probe's `cid` filter prunes to nprobe/nlist
    * of the files before any IO happens (asserted in SimilaritySpec).
    */
  def ivfWriteAssignment(assigned: DataFrame, path: String): Unit =
    assigned.write.mode("overwrite").partitionBy("cid").parquet(path)

  /** Probe against a written layout: the probed list ids (≤ nlist values —
    * model state, not data) become a static partition filter on the scan.
    */
  def ivfProbeFromLayout(spark: org.apache.spark.sql.SparkSession, path: String,
                         model: IvfModel, queries: DataFrame,
                         k: Int = 10, nprobe: Int = 4,
                         idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cents = model.centroidDf(spark)
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).cast("array<double>").as("q_vec"))
    val probeW = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("cid"))
    val probedCids = q.crossJoin(cents)
      .select(col("q_id"), col("cid"), cosine(col("q_vec"), col("c_vec")).as("sim"))
      .withColumn("rk", row_number().over(probeW)).filter(col("rk") <= nprobe)
      .select(col("cid")).distinct().collect().map(_.getInt(0))
    val assigned = spark.read.parquet(path).filter(col("cid").isin(probedCids.map(Integer.valueOf): _*))
    ivfProbe(assigned, model, queries, k, nprobe, idCol, vecCol)
  }

  /** Convenience: train + assign + probe in one call (tests / one-shot use;
    * long-lived serving should hold the model and assignment and call
    * [[ivfProbe]]).
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int = 10,
              nlist: Int = 16, nprobe: Int = 4, iters: Int = 3,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val model = ivfTrain(corpus, nlist, iters, idCol, vecCol)
    ivfProbe(ivfAssign(corpus, model, idCol, vecCol), model, queries, k, nprobe, idCol, vecCol)
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic deduplication
    * by k-means clustering + WITHIN-CLUSTER cosine pruning. Embedding-space
    * near-duplicates land in the same cluster (for thresholds near 1 a pair
    * can only straddle a cluster boundary if both members sit on it), so
    * the quadratic pair scoring runs per cluster instead of per corpus —
    * the cluster count is the knob that bounds the blowup: the per-cluster
    * join is keyed on `cid` (a real shuffle key, never a cross join), and
    * at 100 TB the paper-scale configuration (~100k clusters) makes each
    * cluster's pair set a few thousand rows in one task. Reuses the IVF
    * machinery: [[ivfTrain]] is the clustering, [[ivfAssign]] the
    * membership pass, and a persisted assignment serves both ANN probes
    * and semantic dedup from the same build.
    *
    * Keep rule: within a qualifying pair the SMALLER id survives — a doc is
    * dropped iff some same-cluster doc with a smaller id is ≥ `threshold`
    * cosine-similar (the pairwise greedy convention the rest of the dedup
    * family uses; the paper keeps low-centroid-similarity members instead,
    * which is a scoring heuristic, not a correctness property — the id rule
    * is deterministic and engine-portable, so the whole operator is
    * SQL-oracle-checkable given the trained centroids).
    *
    * Input: an assignment (cid, n_id, n_vec) from [[ivfAssign]]. Output:
    * the KEPT set (vec_id, cid).
    */
  def semDedup(assigned: DataFrame, threshold: Double = 0.9): DataFrame = {
    val c = assigned.withColumn("nrm", sqrt(dot(col("n_vec"), col("n_vec"))))
    val a = c.select(col("cid"), col("n_id").as("va"), col("n_vec").as("wa"), col("nrm").as("na"))
    val b = c.select(col("cid"), col("n_id").as("vb"), col("n_vec").as("wb"), col("nrm").as("nb"))
    val dropped = a.join(b, Seq("cid"))
      .filter(col("va") < col("vb"))
      .select(col("vb"),
        cosinePre(dot(col("wa"), col("wb")), col("na"), col("nb")).as("cos"))
      .filter(col("cos") >= threshold)
      .select(col("vb").as("n_id")).distinct()
    assigned.join(dropped, Seq("n_id"), "left_anti")
      .select(col("n_id").as("vec_id"), col("cid"))
  }

  /** Incremental SemDeDup — which vectors of a NEW batch near-duplicate
    * (same-cluster cosine ≥ `threshold`) NOTHING already indexed? Both
    * sides are ASSIGNED relations `(cid, n_id, n_vec)`: the batch assigned
    * at probe time against the frozen model ([[ivfAssign]]), the corpus
    * side served from maintained state
    * ([[graft.streaming.VectorIndexStream.serve]]) — so a 100 TB corpus is
    * assigned once at ingest and a new batch's semantic dedup costs the
    * batch assignment + ONE cid-keyed join against the index. Same
    * quadratic bound as [[semDedup]]: cid keys the pair join, cluster size
    * bounds the per-key work ([[autoNlist]] holds that constant as the
    * corpus grows). Recall is the cluster assignment's: a cross-cluster
    * near-dup stays "novel" — the SemDeDup contract, measured by
    * `x_dedup_semantic_recall`.
    */
  def semNovelAgainstAssigned(batchAssigned: DataFrame,
                              corpusAssigned: DataFrame,
                              threshold: Double = 0.9): DataFrame = {
    val b = batchAssigned.withColumn("nb", sqrt(dot(col("n_vec"), col("n_vec"))))
      .select(col("cid"), col("n_id").as("b_id"), col("n_vec").as("wb"), col("nb"))
    val c = corpusAssigned.withColumn("nc", sqrt(dot(col("n_vec"), col("n_vec"))))
      .select(col("cid"), col("n_vec").as("wc"), col("nc"))
    val matched = b.join(c, Seq("cid"))
      .select(col("b_id"),
        cosinePre(dot(col("wb"), col("wc")), col("nb"), col("nc")).as("cos"))
      .filter(col("cos") >= threshold)
      .select(col("b_id").as("vec_id")).distinct()
    batchAssigned.select(col("n_id").as("vec_id"))
      .join(matched, Seq("vec_id"), "left_anti")
  }

  /** Semantic DECONTAMINATION — the embedding-level complement of
    * [[Decontaminate]]'s n-gram matching (a paraphrased benchmark answer
    * shares no 13-gram with the eval set but sits next to it in embedding
    * space): flag every corpus vector whose same-cluster cosine to ANY
    * eval vector reaches `threshold`, with the hit count and the maximum
    * similarity (the evidence a removal decision is audited with). Both
    * sides are ASSIGNED relations `(cid, n_id, n_vec)`; the eval side is
    * benchmark-sized, so the cid-keyed join broadcasts it and the corpus
    * side streams through in one pass — the [[semNovelAgainstAssigned]]
    * scale shape with the roles transposed. Recall is the cluster
    * assignment's, as for all SemDeDup-family ops: a cross-cluster
    * near-hit is missed (measured for this fixture by
    * `x_dedup_semantic_recall`).
    */
  def semContamination(corpusAssigned: DataFrame, evalAssigned: DataFrame,
                       threshold: Double = 0.9): DataFrame = {
    val c = corpusAssigned.withColumn("nt", sqrt(dot(col("n_vec"), col("n_vec"))))
      .select(col("cid"), col("n_id").as("t_id"), col("n_vec").as("wt"), col("nt"))
    val e = evalAssigned.withColumn("ne", sqrt(dot(col("n_vec"), col("n_vec"))))
      .select(col("cid"), col("n_vec").as("we"), col("ne"))
    c.join(e, Seq("cid"))
      .select(col("t_id"),
        cosinePre(dot(col("wt"), col("we")), col("nt"), col("ne")).as("cos"))
      .filter(col("cos") >= threshold)
      .groupBy(col("t_id"))
      .agg(count(lit(1)).as("n_eval_hits"), max(col("cos")).as("max_cos"))
      .select(col("t_id").as("vec_id"), col("n_eval_hits"), col("max_cos"))
  }

  /** The SemDeDup production knob: cluster count scaled WITH the corpus so
    * the expected cluster size — the base of the within-cluster quadratic
    * term — stays constant as data grows (Abbas et al. use k ∝ n; a fixed
    * nlist makes per-cluster pair work grow quadratically with corpus
    * growth, which is exactly what the round-5 sf1 scaling table measured
    * for the pinned-nlist oracle entry). Capped because centroids are
    * nlist × dim driver/broadcast state.
    */
  def autoNlist(corpusSize: Long, targetClusterSize: Long = 1024L,
                maxNlist: Int = 1 << 16): Int = {
    require(targetClusterSize >= 1, s"targetClusterSize >= 1, got $targetClusterSize")
    math.min(maxNlist.toLong, math.max(1L, corpusSize / targetClusterSize)).toInt
  }

  /** Dim-aware centroid-count cap: centroids are `nlist × dim × 8` bytes of
    * driver/broadcast state, so the flat 2¹⁶ ceiling alone is not a size
    * bound — at dim 1024 it permits a ~0.5 GB broadcast. Cap at whatever
    * count fits `budgetBytes` (default 64 MB — comfortably under typical
    * driver/broadcast limits), still never above 2¹⁶. A corpus needing more
    * lists than this at its dimension wants a two-level coarse quantizer
    * (see SCALE.md), not a bigger broadcast.
    */
  def centroidCap(dim: Int, budgetBytes: Long = 64L << 20): Int = {
    require(dim >= 1, s"centroidCap: dim >= 1, got $dim")
    require(budgetBytes >= dim.toLong * 8,
      s"centroidCap: budget $budgetBytes bytes below one dim-$dim centroid")
    math.min(1L << 16, budgetBytes / (dim.toLong * 8)).toInt
  }

  /** Train + assign + prune in one call (one-shot/library use; pipelines
    * that also serve ANN should share the model/assignment and call
    * [[semDedup]] directly). `nlist = 0` (the default) scales the cluster
    * count with the corpus via [[autoNlist]] — pass an explicit nlist only
    * when centroids must stay comparable across differently-sized corpora
    * (e.g. the pinned oracle entries).
    */
  def semDedupAll(corpus: DataFrame, threshold: Double = 0.9,
                  nlist: Int = 0, iters: Int = 3,
                  idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val k = if (nlist > 0) nlist else {
      val dim = corpus.select(size(col(vecCol))).head.getInt(0) // schema probe
      autoNlist(corpus.count(), maxNlist = centroidCap(dim))
    }
    val model = ivfTrain(corpus, k, iters, idCol, vecCol)
    semDedup(ivfAssign(corpus, model, idCol, vecCol), threshold)
  }

  /** Exact embedding-cosine similarity pair join (vec_a < vec_b, cosine ≥
    * threshold) — the embedding-space member of the dedup family, and the
    * ORACLE for [[embedPairsLsh]]. The self-join is inherently quadratic
    * (every pair must be scored to be exact), so this is for dimension-table
    * scale and verification; the corpus-scale path is the banded-LSH
    * variant.
    */
  def embedPairsExact(corpus: DataFrame, threshold: Double = 0.9,
                      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v")))) // norms once per ROW, not per pair
    val a = c.select(col("id").as("vec_a"), col("v").as("va"), col("nrm").as("na"))
    val b = c.select(col("id").as("vec_b"), col("v").as("vb"), col("nrm").as("nb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        cosinePre(dot(col("va"), col("vb")), col("na"), col("nb")).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Hyperplane sketch seeded per band — bands are independent hash
    * families (band id + 1 as the seed; 0 is the unbanded family).
    */
  def bandedSketch(vecCol: String, bandCol: String, nPlanes: Int): Column =
    graft.functions.GraftFunctions.hyperplane_sketch(
      col(vecCol), col(bandCol).cast("long") + lit(1L), nPlanes)

  /** Banded-LSH near-dup pair search over embeddings: `nBands` independent
    * `nPlanes`-bit sketches; candidates share a full sketch in ≥1 band
    * (catch probability 1 − (1 − p^nPlanes)^nBands, p = 1 − θ/π — high for
    * true near-duplicates, tiny for unrelated vectors), then candidates are
    * verified with EXACT cosine, so output ⊆ [[embedPairsExact]] always,
    * with recall < 1 only across bucket boundaries. One shuffle keyed by
    * (band, bucket) — the corpus never cross-joins. Same banding shape as
    * [[MinHashDedup]]/[[SimHash]].
    */
  def embedPairsLsh(corpus: DataFrame, threshold: Double = 0.9,
                    nPlanes: Int = 8, nBands: Int = 4,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
    // candidate generation ships IDS ONLY: (band, bucket, id) is 24 B/row
    // where carrying the vectors would be ~0.5 KB/row, and the pair dedup
    // becomes a hash aggregate on two longs instead of a SortAggregate
    // dragging first(array) buffers (arrays aren't hash-aggregable).
    // Vectors are fetched per SURVIVING candidate by id — the JaccardDedup
    // shuffle discipline applied to the embedding space.
    val sk = c.select(col("id"), col("v"))
      .withColumn("band", explode(expr(s"sequence(0, ${nBands - 1})")))
      .withColumn("bucket", bandedSketch("v", "band", nPlanes))
      .select(col("band"), col("bucket"), col("id"))
    verifyBandCandidates(sk, c, threshold)
  }

  /** Shared banding tail: candidate pairs from a `(band, bucket, id)` frame
    * (ONE keyed shuffle, ids only), exact-cosine verify with vectors fetched
    * per surviving candidate. Used by the native sketch path and the md5
    * twin below, so the twin's oracle pins this exact code path.
    */
  private def verifyBandCandidates(sk: DataFrame, c: DataFrame,
                                   threshold: Double): DataFrame = {
    val cand = sk.select(col("band"), col("bucket"), col("id").as("vec_a"))
      .join(sk.select(col("band"), col("bucket"), col("id").as("vec_b")),
        Seq("band", "bucket"))
      .filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"))
      .dropDuplicates("vec_a", "vec_b")
    cand
      .join(c.select(col("id").as("vec_a"), col("v").as("va"), col("nrm").as("na")), Seq("vec_a"))
      .join(c.select(col("id").as("vec_b"), col("v").as("vb"), col("nrm").as("nb")), Seq("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        cosinePre(dot(col("va"), col("vb")), col("na"), col("nb")).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Deterministic ±1 plane components from md5("band:plane:dim") — the
    * cross-engine-derivable hash family of the LSH twin: the sign is the
    * md5 digest's top bit, which SQL reads as `substr(md5(s),1,1) < '8'`.
    * Computed JVM-side here and embedded as array literals (the oracle
    * re-derives them IN SQL, so a divergence in either derivation fails the
    * cross-engine compare — the literals can't drift silently).
    */
  def md5PlaneSigns(nBands: Int, nPlanes: Int, dim: Int): Array[Array[Array[Double]]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(nBands, nPlanes, dim) { (b, p, d) =>
      if ((md.digest(s"$b:$p:$d".getBytes("UTF-8"))(0) & 0x80) == 0) 1.0 else -1.0
    }
  }

  /** Oracle-expressible executable-spec twin of [[embedPairsLsh]]: the
    * SAME banding tail over sign-sketch buckets whose hyperplanes come from
    * [[md5PlaneSigns]] instead of the native mix64 streams. Projections use
    * the native dot kernel against sign-array literals (fast, exact) and
    * round at 1e-6 before the sign test, mirroring the oracle's rounded
    * SUM — bucket bits are cross-engine identical, so the whole
    * bucket→candidate→verify pipeline gets a hash-matched DuckDB row where
    * the native family is rows-only by nature.
    */
  def embedPairsLshMd5(corpus: DataFrame, threshold: Double = 0.9,
                       nPlanes: Int = 8, nBands: Int = 4,
                       idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
    val dim = c.select(size(col("v"))).head.getInt(0) // one row: schema probe
    val signs = md5PlaneSigns(nBands, nPlanes, dim)
    val bucketPerBand = (0 until nBands).map { b =>
      (0 until nPlanes).map { p =>
        when(round(dot(col("v"), typedLit(signs(b)(p).toSeq)), 6) > 0, lit(1 << p))
          .otherwise(lit(0))
      }.reduce(_ + _)
    }
    val sk = c.select(col("id"),
      posexplode(array(bucketPerBand: _*)).as(Seq("band", "bucket")))
    verifyBandCandidates(sk, c, threshold)
  }

  /** Hard-negative triplet mining for contrastive embedder training (the
    * E5/GTE data-prep step): per anchor, the POSITIVE is the most similar
    * corpus vector, and the HARD NEGATIVE is the most similar vector whose
    * cosine stays below `min(tau, pos_cos)` — as close to the decision
    * boundary as the margin allows, which is what makes a negative "hard".
    * The `pos_cos` bound (not just `tau`) guarantees `neg ≠ pos` and a
    * strictly positive margin even when the anchor has no strong positive.
    *
    * Determinism: round-6 cosine, smallest-id tiebreaks, both argmaxes as
    * partial-agg `max(struct(cos, -id))` — never a per-anchor window sort.
    * Scale shape: anchors broadcast (the bounded query set, same class as
    * [[bruteForceTopK]]); the corpus streams through ONE narrow scoring
    * pass and only |anchors| rows survive each aggregation.
    */
  def mineTriplets(corpus: DataFrame, anchors: DataFrame, tau: Double = 0.35,
                   idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = prepCorpus(corpus, idCol, vecCol)
    val a = anchors.select(col(idCol).as("q_id"),
      col(vecCol).cast("array<double>").as("q_vec"))
    val scored = c.crossJoin(broadcast(a))
      .filter(col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"),
        cosine(col("q_vec"), col("n_vec")).as("cos"))
    val pos = scored
      .groupBy("q_id")
      .agg(max(struct(col("cos"), (-col("n_id")).as("negid"))).as("m"))
      .select(col("q_id"), (-col("m.negid")).as("pos_id"), col("m.cos").as("pos_cos"))
    val neg = scored.join(broadcast(pos), Seq("q_id"))
      .filter(col("cos") < least(lit(tau), col("pos_cos")))
      .groupBy("q_id")
      .agg(max(struct(col("cos"), (-col("n_id")).as("negid"))).as("m"))
      .select(col("q_id"), (-col("m.negid")).as("neg_id"), col("m.cos").as("neg_cos"))
    pos.join(neg, Seq("q_id"))
      .select(col("q_id").as("anchor_id"), col("pos_id"), col("pos_cos"),
        col("neg_id"), col("neg_cos"))
  }

  /** LSH-bucketed approximate top-k: bucket by sketch, exact cosine within
    * the bucket. Recall measured against [[bruteForceTopK]] in SimilaritySpec.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int = 10, nPlanes: Int = 12,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    lshTopKBucketed(
      withBucket(corpus, "n_id", "n_vec", idCol, vecCol,
        v => hyperplaneSketch(v, nPlanes)),
      withBucket(queries, "q_id", "q_vec", idCol, vecCol,
        v => hyperplaneSketch(v, nPlanes)),
      k)

  private def withBucket(df: DataFrame, id: String, vec: String,
                         idCol: String, vecCol: String,
                         sketch: String => Column): DataFrame =
    df.select(col(idCol).as(id), col(vecCol).cast("array<double>").as(vec))
      .withColumn("bucket", sketch(vec))

  /** Shared bucketed-top-k tail: same-bucket candidates only (ONE broadcast
    * join on bucket id — the corpus never cross-joins), exact cosine, per-
    * query top-k. Used by the native sketch path and the md5 twin below, so
    * the twin's oracle pins this exact candidate→score→rank code path.
    */
  private def lshTopKBucketed(c: DataFrame, q: DataFrame, k: Int): DataFrame = {
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"), cosine(col("q_vec"), col("n_vec")).as("cos"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("q_id"), col("n_id"), col("cos"), col("rk"))
  }

  /** Oracle-expressible executable-spec twin of [[lshTopK]] (the last
    * untwinned LSH-family member): the SAME bucketed-top-k tail, with the
    * hyperplanes drawn from [[md5PlaneSigns]] band 0 instead of the native
    * mix64 streams — md5 is a hash family BOTH engines derive independently
    * (the oracle recomputes the signs IN SQL from md5's top bit), so bucket
    * assignment, candidate generation, scoring, and ranking all get a
    * hash-matched cross-engine row where the native sketch is rows-only by
    * nature. Projections round at 1e-6 before the sign test, mirroring the
    * oracle's rounded SUM, exactly as [[embedPairsLshMd5]] does for pairs.
    */
  def lshTopKMd5(corpus: DataFrame, queries: DataFrame, k: Int = 10,
                 nPlanes: Int = 12,
                 idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val dim = corpus.select(size(col(vecCol))).head.getInt(0) // one row: schema probe
    val signs = md5PlaneSigns(1, nPlanes, dim)(0)
    def bucketOf(vec: String): Column = (0 until nPlanes).map { p =>
      when(round(dot(col(vec), typedLit(signs(p).toSeq)), 6) > 0, lit(1 << p))
        .otherwise(lit(0))
    }.reduce(_ + _)
    lshTopKBucketed(
      withBucket(corpus, "n_id", "n_vec", idCol, vecCol, bucketOf),
      withBucket(queries, "q_id", "q_vec", idCol, vecCol, bucketOf),
      k)
  }
}
