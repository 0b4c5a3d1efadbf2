package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The distributed prefix sum must equal the naive global window exactly,
  * for any partition count — the whole point is removing the global
  * window's single-task exchange without changing one output value.
  */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = (1L to 997L).map(i => (i, (i * 7919) % 300 + 1))
    .toDF("doc_id", "n_tokens")

  test("runningTotal == global-window cumsum at several partition counts") {
    val naive = docs.withColumn("cum",
      sum(col("n_tokens")).over(Window.orderBy(col("doc_id"))).cast("long"))
      .select("doc_id", "cum").as[(Long, Long)].collect().toMap
    for (p <- Seq(1, 3, 8, 32)) {
      val got = Packing.runningTotal(docs, "doc_id", "n_tokens", p)
        .select("doc_id", "cum").as[(Long, Long)].collect().toMap
      assert(got === naive, s"numPartitions=$p")
    }
  }

  test("runningTotalBy (desc priority order) == global-window cumsum at several partition counts") {
    val scored = docs.withColumn("score", (col("doc_id") * 31 % 97).cast("double"))
    val naive = scored.withColumn("cum",
      sum(col("n_tokens")).over(
        Window.orderBy(col("score").desc, col("doc_id"))).cast("long"))
      .select("doc_id", "cum").as[(Long, Long)].collect().toMap
    for (p <- Seq(1, 3, 8, 32)) {
      val got = Packing.runningTotalBy(scored,
        Seq(col("score").desc, col("doc_id")), "n_tokens", p)
        .select("doc_id", "cum").as[(Long, Long)].collect().toMap
      assert(got === naive, s"numPartitions=$p")
    }
  }

  test("runningTotalByGroup == per-group global window, incl. a mega-group, any partition count") {
    // domain 'big' holds 80% of rows — the skew case a per-domain window
    // would serialize; 'nul' rows carry a NULL group (a real group here)
    val rows = (1L to 800L).map(i => (i, "big", (i * 13) % 7 + 1)) ++
      (801L to 900L).map(i => (i, "small", (i * 13) % 7 + 1)) ++
      (901L to 950L).map(i => (i, null.asInstanceOf[String], (i * 13) % 7 + 1))
    val df = rows.toDF("doc_id", "dom", "v")
    val naive = df.withColumn("cum",
      sum(col("v")).over(
        Window.partitionBy(col("dom")).orderBy(col("doc_id"))).cast("long"))
      .select("doc_id", "cum").as[(Long, Long)].collect().toMap
    for (p <- Seq(1, 3, 8, 32)) {
      val got = Packing.runningTotalByGroup(df, "dom", Seq(col("doc_id")), "v", p)
        .select("doc_id", "cum").as[(Long, Long)].collect().toMap
      assert(got === naive, s"numPartitions=$p")
    }
  }

  test("epochShuffle: exact permutation, reproducible, epochs decorrelate, == global row_number") {
    val ids = docs.select("doc_id")
    val e3 = Packing.epochShuffle(ids, "doc_id", epoch = 3, numPartitions = 8)
      .as[(Long, Long)].collect().toMap
    assert(e3.values.toSeq.sorted === (1L to 997L).toSeq) // bijection onto 1..N
    val again = Packing.epochShuffle(ids, "doc_id", epoch = 3, numPartitions = 8)
      .as[(Long, Long)].collect().toMap
    assert(again === e3) // run-to-run deterministic
    val e4 = Packing.epochShuffle(ids, "doc_id", epoch = 4, numPartitions = 8)
      .as[(Long, Long)].collect().toMap
    assert(e4 !== e3) // a different epoch is a different permutation
    val naive = ids
      .withColumn("k", md5(concat(lit("3:"), col("doc_id").cast("string"))))
      .withColumn("p", row_number().over(Window.orderBy(col("k"), col("doc_id"))).cast("long"))
      .select("doc_id", "p").as[(Long, Long)].collect().toMap
    assert(e3 === naive)
  }

  test("packBins: contiguous fill, no sequence overfilled except by its last doc") {
    val packed = Packing.packBins(docs, "doc_id", "n_tokens", budget = 1000L, 8)
      .select("doc_id", "n_tokens", "cum_tokens", "seq_id")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    // seq ids are nondecreasing in doc order and start at 0
    assert(packed.head._4 === 0L)
    packed.sliding(2).foreach { case Array(a, b) =>
      assert(b._4 >= a._4 && b._4 - a._4 <= (b._3 / 1000L - a._4) + 1)
    }
    // the defining rule, checked row by row: seq = tokensBefore / budget
    packed.foreach { case (_, n, cum, seq) => assert(seq === (cum - n) / 1000L) }
    // every sequence's docs START inside its budget window (contiguous fill)
    packed.groupBy(_._4).foreach { case (seq, rows) =>
      rows.foreach { case (_, n, cum, _) =>
        assert(cum - n >= seq * 1000L && cum - n < (seq + 1) * 1000L)
      }
    }
  }

  test("a doc longer than the budget keeps ONE seq_id; budget validated") {
    val d = Seq((1L, 10L), (2L, 5000L), (3L, 10L)).toDF("doc_id", "n_tokens")
    val got = Packing.packBins(d, "doc_id", "n_tokens", budget = 100L, 2)
      .select("doc_id", "seq_id").as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 0L, 2L -> 0L, 3L -> 50L)) // doc 3 starts at 5010/100
    intercept[IllegalArgumentException] {
      Packing.packBins(d, "doc_id", "n_tokens", budget = 0L)
    }
  }

  test("packManifest: per-sequence docs in order, counts and token totals exact") {
    val d = Seq((1L, 400L), (2L, 400L), (3L, 400L), (4L, 100L), (5L, 900L))
      .toDF("doc_id", "n_tokens")
    val m = Packing.packManifest(Packing.packBins(d, "doc_id", "n_tokens", 1000L, 4))
      .as[(Long, Int, Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    // cum: 400/800/1200/1300/2200 -> seq 0: docs 1-3 (1200 tokens, doc 3
    // spills); seq 1: docs 4-5
    assert(m === Seq(
      (0L, 3, 1200L, 1L, 3L, "1|2|3"),
      (1L, 2, 1000L, 4L, 5L, "4|5")))
  }

  test("splitOversized: chunk texts reassemble the doc exactly; in-budget docs untouched") {
    val d = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")), // 10 tokens, budget 4
      (2L, "a b c"),                                   // in budget
      (3L, "solo")
    ).toDF("doc_id", "text")
    val got = Packing.splitOversized(d, "doc_id", "text", budget = 4)
      .select("doc_id", "chunk_id", "chunk_tokens", "chunk_text")
      .as[(Long, Int, Int, String)].collect().sortBy(r => (r._1, r._2))
    assert(got.filter(_._1 == 1L).map(_._4).toSeq ===
      Seq("w1 w2 w3 w4", "w5 w6 w7 w8", "w9 w10"))
    assert(got.filter(_._1 == 1L).map(_._3).toSeq === Seq(4, 4, 2))
    assert(got.filter(_._1 == 2L).toSeq === Seq((2L, 0, 3, "a b c")))
    assert(got.filter(_._1 == 3L).toSeq === Seq((3L, 0, 1, "solo")))
    // reassembly: joining a doc's chunks with ' ' restores the original
    val back = got.filter(_._1 == 1L).map(_._4).mkString(" ")
    assert(back === (1 to 10).map(i => s"w$i").mkString(" "))
    intercept[IllegalArgumentException] {
      Packing.splitOversized(d, "doc_id", "text", budget = 0)
    }
  }

  test("slidingWindows: overlap, full coverage, last window reaches the end") {
    val d = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")), // 10 tokens
      (2L, "a b c"),                                   // in budget
      (3L, (1 to 11).map(i => s"w$i").mkString(" "))  // stride doesn't divide
    ).toDF("doc_id", "text")
    val got = Packing.slidingWindows(d, "doc_id", "text", budget = 4, stride = 2)
      .select("doc_id", "win_id", "win_tokens", "win_text")
      .as[(Long, Int, Int, String)].collect().sortBy(r => (r._1, r._2))
    // n=10: 1 + ceil((10-4)/2) = 4 windows starting at tokens 1,3,5,7
    assert(got.filter(_._1 == 1L).map(_._4).toSeq ===
      Seq("w1 w2 w3 w4", "w3 w4 w5 w6", "w5 w6 w7 w8", "w7 w8 w9 w10"))
    assert(got.filter(_._1 == 1L).map(_._3).toSeq === Seq(4, 4, 4, 4))
    // in-budget doc: exactly one window, verbatim
    assert(got.filter(_._1 == 2L).toSeq === Seq((2L, 0, 3, "a b c")))
    // n=11: 1 + ceil(7/2) = 5 windows; last starts at token 9, 3 tokens
    assert(got.filter(_._1 == 3L).map(_._4).last === "w9 w10 w11")
    assert(got.filter(_._1 == 3L).map(_._3).toSeq === Seq(4, 4, 4, 4, 3))
    // every consecutive pair overlaps by budget - stride tokens
    got.filter(_._1 == 1L).map(_._4.split(' ').toSeq).sliding(2).foreach {
      case Array(a, b) => assert(a.takeRight(2) === b.take(2))
    }
    intercept[IllegalArgumentException] {
      Packing.slidingWindows(d, "doc_id", "text", budget = 4, stride = 5)
    }
    intercept[IllegalArgumentException] {
      Packing.slidingWindows(d, "doc_id", "text", budget = 4, stride = 0)
    }
  }

  test("slidingWindows with stride == budget equals splitOversized chunking") {
    val d = Seq((1L, (1 to 23).map(i => s"t$i").mkString(" ")), (2L, "x y"))
      .toDF("doc_id", "text")
    val wins = Packing.slidingWindows(d, "doc_id", "text", budget = 5, stride = 5)
      .select(col("doc_id"), col("win_id"), col("win_tokens"), col("win_text"))
      .as[(Long, Int, Int, String)].collect().toSet
    val chunks = Packing.splitOversized(d, "doc_id", "text", budget = 5)
      .select(col("doc_id"), col("chunk_id"), col("chunk_tokens"), col("chunk_text"))
      .as[(Long, Int, Int, String)].collect().toSet
    assert(wins === chunks)
  }

  test("the only unpartitioned window runs over partition offsets, not data") {
    // the data-side (partitioned) window now sits BEHIND the eager
    // localCheckpoint (the round-12 divergent-re-evaluation fix), so the
    // result's plan shows only what runs ON TOP of the materialized
    // layout: every remaining window must be the offsets one — global,
    // but strictly above the per-partition AGGREGATE (metadata-sized),
    // never over raw data rows
    val df = Packing.runningTotal(docs, "doc_id", "n_tokens", 8)
    df.collect()
    val windows = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty)
    windows.filter(_.partitionSpec.isEmpty).foreach { g =>
      assert(g.child.collect {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
      }.nonEmpty, "global window not over the partition-totals aggregate")
    }
    // and the checkpointed stage really is the partitioned-window layout:
    // its output carries the per-partition running column, so the cum
    // arithmetic (checked value-wise above) never re-sorts data here
    assert(df.columns.contains("cum"))
  }
}
