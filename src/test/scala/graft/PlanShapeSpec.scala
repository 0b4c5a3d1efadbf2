package graft

import org.apache.spark.sql.functions._

/** Plan-shape invariants: the physical choices SCALE.md argues for, pinned
  * so a refactor can't silently regress them. These read the EXECUTED plan
  * of the real registry queries on sf0.001.
  */
class PlanShapeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.executedPlan.toString
  }

  test("q5: dimension joins are broadcast (fact side never shuffles for dims)") {
    val p = plan("q5_local_supplier")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("q4/q7: semi and anti joins stay semi/anti at the physical layer") {
    assert(plan("q4_order_priority").contains("LeftSemi"))
    assert(plan("q7_customers_without_orders").contains("LeftAnti"))
  }

  test("q6: filters reach the parquet scan (PushedFilters)") {
    val p = plan("q6_revenue_forecast")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p.take(2000))
  }

  test("q3: global top-k is TakeOrderedAndProject, not a full sort") {
    val p = plan("q3_shipping_priority")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }

  test("q1: aggregation is two-phase (partial before the exchange)") {
    val p = plan("q1_pricing_summary")
    val firstAgg = p.indexOf("HashAggregate")
    val exchange = p.indexOf("Exchange")
    assert(firstAgg >= 0 && exchange >= 0, p.take(2000))
    // formatted tree prints final agg, exchange, then partial agg (leaf-ward)
    assert(p.lastIndexOf("HashAggregate") > exchange, "no partial aggregate below the exchange")
  }

  test("jaccard dedup: candidate generation is bucketed, never a cross join") {
    val p = plan("x_dedup_jaccard")
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
  }

  test("exact dedup: the wide shuffle partitions on the 64-bit hash, not text") {
    val p = plan("x_dedup_exact")
    assert(p.contains("xxhash64"), p.take(3000))
    // the naive form would shuffle on the raw text column alone
    assert(!p.contains("hashpartitioning(text#"), p.take(3000))
  }

  test("embedding LSH pair join and range join stay equi-joins (no nested loop)") {
    for (q <- Seq("x_dedup_embed_lsh", "x_range_join_windows")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q: ${p.take(2000)}")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q: ${p.take(2000)}")
    }
  }

  test("AQE is live: shuffle reads are adaptive (runtime re-planning enabled)") {
    // the engine relies on AQE for runtime partition coalescing and skew
    // splitting; pin that sessions actually run adaptive plans
    assert(spark.conf.get("spark.sql.adaptive.enabled") === "true")
    val df = SparkEntry.queries("q1_pricing_summary")(spark, sf)
    df.collect() // materialize THIS queryExecution so AQE finalizes it
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AdaptiveSparkPlan"), p.take(1000))
    assert(p.contains("isFinalPlan=true"), p.take(2000))
  }

  test("silver chain fuses scan->project into a single WholeStageCodegen span") {
    // SCALE.md's codegen claim, pinned: every expression in the silver
    // clean chain (trim/initcap/coalesce/year/try_to_timestamp) supports
    // codegen, so the scan-side pipeline must fuse into ONE span — a
    // non-codegen expression slipping into the chain would split it and
    // put an interpreted row boundary in the hot path of every scan row.
    import org.apache.spark.sql.execution.{ColumnarToRowExec, InputAdapter, ProjectExec, SparkPlan, WholeStageCodegenExec}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val df = SparkEntry.queries("ref_silver_clean")(spark, sf)
    df.collect() // materialize THIS execution so AQE finalizes the plan
    // Walk the real plan TREE (codegen-span NUMBERS restart per AQE stage,
    // so string-grouping by "*(n)" could merge spans from different stages
    // and hide a broken fusion). A span's membership stops at InputAdapter
    // — that is the codegen boundary.
    def spans(p: SparkPlan): Seq[WholeStageCodegenExec] = p match {
      case a: AdaptiveSparkPlanExec => spans(a.executedPlan)
      case q: QueryStageExec => spans(q.plan)
      case w: WholeStageCodegenExec => w +: w.children.flatMap(spans)
      case other => other.children.flatMap(spans)
    }
    def members(p: SparkPlan): Seq[SparkPlan] = p match {
      case _: InputAdapter => Seq.empty
      case n => n +: n.children.flatMap(members)
    }
    val fused = spans(df.queryExecution.executedPlan).exists { w =>
      val m = members(w.child)
      m.exists(_.isInstanceOf[ProjectExec]) && m.exists(_.isInstanceOf[ColumnarToRowExec])
    }
    assert(fused,
      s"scan->project not fused into one codegen span:\n${df.queryExecution.executedPlan.toString.take(3000)}")
  }

  test("x_domain_quota: k-bounded partial aggregation, never a per-domain window") {
    // the quota must NOT rank with Window.partitionBy(domain): that plan
    // forces every row of a skewed mega-domain into one task, and AQE's
    // skew splitting applies to join partitions, not window exchanges. The
    // bounded TopKAgg shape puts a partial ObjectHashAggregate BELOW the
    // exchange, so the shuffle carries ≤ k rows per domain per map task.
    val p = plan("x_domain_quota")
    assert(!p.contains("Window"), s"windowed rank reappeared:\n${p.take(3000)}")
    val firstAgg = p.indexOf("ObjectHashAggregate")
    val exchange = p.indexOf("Exchange")
    assert(firstAgg >= 0 && exchange >= 0, p.take(3000))
    // tree prints final agg, exchange, then the partial agg leaf-ward
    assert(p.lastIndexOf("ObjectHashAggregate") > exchange,
      "no partial aggregate below the exchange")
  }

  test("semDedup pair join is keyed on cid, never a cross join") {
    // over a plain assignment relation (no IVF lineage) the within-cluster
    // pair scoring must plan a keyed join on the cluster id — that bound
    // is SemDeDup's entire scale argument
    import spark.implicits._
    val assigned = Seq((0, 1L, Seq(1.0, 0.0)), (0, 2L, Seq(1.0, 0.1)),
      (1, 3L, Seq(0.0, 1.0))).toDF("cid", "n_id", "n_vec")
    val p = graft.ext.Similarity.semDedup(assigned, 0.9)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(3000))
    assert(p.contains("cid"), p.take(3000))
    // the semantic-decontamination transposition keeps the same bound
    val pc = graft.ext.Similarity.semContamination(assigned, assigned, 0.9)
      .queryExecution.executedPlan.toString
    assert(!pc.contains("CartesianProduct") && !pc.contains("BroadcastNestedLoopJoin"),
      pc.take(3000))
    assert(pc.contains("cid"), pc.take(3000))
  }

  test("REGISTRY-WIDE: no unplanned nested-loop/cartesian join in any query") {
    // the operators that are quadratic BY SPEC (exact pair scoring, or a
    // deliberate cross join against a broadcast model/query side bounded by
    // nlist or |queries|) — everything else must plan keyed joins only
    val quadraticBySpec = Set(
      "x_dedup_embed_exact", // exact pair join: the oracle for the LSH form
      "x_sim_topk_brute",    // corpus × broadcast(small query set)
      "x_mine_triplets",     // same shape: corpus × broadcast(anchors)
      "x_sim_ann_ivf",       // queries × broadcast(centroids), nlist-bounded
      "x_sim_ivf_layout",    // same probe shape over the partitioned layout
      "x_sim_ivf_recall",    // includes the brute-force reference
      "x_sim_ann_lsh",       // queries broadcast into buckets
      "x_mm_sim_topk",       // corpus hashes × broadcast(small query set)
      "x_text_search",       // broadcast single-row corpus count (N for idf)
      "x_text_tfidf",        // same broadcast single-row N (tf-weighted twin)
      "x_retrieval_kw_topk", // same broadcast single-row N, per-query-doc form
      "x_retrieval_hybrid_rrf", // inherits the single-row N + the brute
                             // topk corpus × broadcast(query) pass; the
                             // fusion join itself is keyed (q_id, doc_id)
      "x_mix_temperature",   // single-row Σw aggregate broadcast back
      "x_mix_quota",         // same shape: single-row ΣW broadcast into
                             // the aggregated domain table
      "x_mix_schedule",      // inherits the quota allocation's single-row
                             // broadcasts; selection/rank joins are keyed
      "x_skew_profile",      // 1×1 cross join of two single-row summaries
      "e11_anomaly_hours",   // single-row n/Σ/Σc² stats broadcast back onto
                             // the series (replaced the unpartitioned
                             // window — no single-partition exchange left)
      "x_substr_summary",    // 1×1 cross join: span summary × corpus chars
      "x_pack_shards_read",  // 1×1 cross join: file-order summary ×
                             // manifest-agreement summary (both single-row)
      "x_curriculum",        // single-row N aggregate broadcast back
      "x_text_vocab_coverage", // broadcast single-row corpus-total × top-20 head
      "x_pq_topk",           // code scan × broadcast(per-query ADC LUTs)
      "x_pq_ivf_topk",       // queries × broadcast(centroids), nlist-bounded
                             // (the candidate/codes joins are keyed)
      "x_pq_recall",         // includes the brute-force reference
      "x_pq_refine",         // inherits the ADC shortlist's LUT cross join;
                             // the re-rank joins are keyed (n_id, q_id)
      "x_sq_topk",           // code scan × broadcast(small query set)
      "x_sq_recall",         // includes the brute-force reference
      "x_dedup_semantic",    // inherits the nlist-bounded assignment cross
                             // join from the cached IVF lineage; the pair
                             // join itself is keyed on cid (pinned below)
      "x_dedup_semantic_incremental", // batch-side assignment is the same
                             // nlist-bounded centroid cross; the probe
                             // join against the served index is keyed on
                             // cid
      "x_decontam_semantic", // slices the same cached IVF assignment
                             // (nlist-bounded centroid cross in lineage);
                             // the eval-hit join is keyed on cid (pinned
                             // below)
      "x_dedup_semantic_auto",   // the autoNlist-served twins: identical
      "x_decontam_semantic_auto", // shapes over the auto model's cached
                             // assignment — the lineage cross join is
                             // corpus × broadcast(centroids), bounded by
                             // centroidCap; the pair/eval joins are keyed
                             // on cid like their pinned siblings
      "x_dedup_semantic_recall") // includes the exact all-pairs reference
                             // (the eval's ground truth is quadratic by
                             // spec, like the other *_recall entries)
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(quadraticBySpec)
      .flatMap { name =>
        val p = plan(name)
        if (p.contains("CartesianProduct") || p.contains("BroadcastNestedLoopJoin"))
          Some(name)
        else None
      }
    assert(offenders.isEmpty, s"unplanned cross joins in: $offenders")
  }

  test("REGISTRY-WIDE: no unpartitioned sort window over an unbounded frame") {
    // a Window with an empty partitionSpec sorts its whole input through
    // ONE task. That is only acceptable when the input is bounded by
    // construction: a GlobalLimit head (top-k curves), or the offsets
    // aggregate of Packing's distributed prefix sum (grouped on
    // spark_partition_id → ≤ numPartitions rows, partition-METADATA
    // scale). Anything else — e.g. ranking an unbounded vocabulary —
    // is the web-scale straggler this spec exists to keep out.
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, GlobalLimit, LogicalPlan, Window => LWindow}
    def bounded(p: LogicalPlan): Boolean = p.collectFirst {
      case _: GlobalLimit => true
      case a: Aggregate if a.groupingExpressions.exists(_.toString.contains("__pid")) => true
    }.getOrElse(false)
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val lp = SparkEntry.queries(name)(spark, sf).queryExecution.optimizedPlan
      lp.collect {
        case w: LWindow if w.partitionSpec.isEmpty && w.orderSpec.nonEmpty && !bounded(w.child) =>
          s"$name (over ${w.child.nodeName})"
      }
    }
    assert(offenders.isEmpty, s"unbounded global sort windows in: $offenders")
  }

  test("silver scan prunes columns (ReadSchema is a subset)") {
    val df = SparkEntry.queries("ref_silver_clean")(spark, sf)
    val scan = df.queryExecution.executedPlan.toString
    // orders has 6 columns; the query needs only 3
    assert(scan.contains("ReadSchema"), scan.take(2000))
    assert(!scan.contains("o_totalprice"), "unused column read from parquet")
  }
}
