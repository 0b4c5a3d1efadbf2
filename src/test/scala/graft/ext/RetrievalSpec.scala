package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  // 6-doc fixture: doc 0 is the query (nQueries = 1). N = 6.
  //   "zebra"  df=2 (docs 0,1)        → idf ⌊6/2⌋ = 3
  //   "quartz" df=3 (docs 0,2,3)      → idf ⌊6/3⌋ = 2
  //   "the"    df=6 (all)             → df-capped out at maxDf=5
  private val docs = Seq(
    (0L, "the zebra quartz"),
    (1L, "the zebra"),
    (2L, "the quartz"),
    (3L, "the quartz extra"),
    (4L, "the nothing shared"),
    (5L, "the other")
  ).toDF("doc_id", "text")

  test("keywordTopK: integer idf over shared rare terms, full tiebreak, self excluded") {
    val got = Retrieval.keywordTopK(docs, nQueries = 1, k = 10, maxDf = 5L)
      .orderBy("q_id", "kw_rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    // doc1 shares zebra (3); docs 2,3 share quartz (2) — tie broken by id;
    // docs 4,5 share only the df-capped "the" → absent; doc 0 = self → absent
    assert(got.toSeq === Seq(
      (0L, 1L, 3L, 1), (0L, 2L, 2L, 2), (0L, 3L, 2L, 3)))
  }

  test("keywordTopK: k bounds the list") {
    val got = Retrieval.keywordTopK(docs, nQueries = 1, k = 2, maxDf = 5L)
    assert(got.count() === 2)
  }

  test("rrfFuse: hand-computed scores, absent-side rank 0, doc_id tiebreak") {
    val kw = Seq((0L, 10L, 1), (0L, 11L, 2)).toDF("q_id", "doc_id", "kw_rank")
    val vec = Seq((0L, 11L, 1), (0L, 12L, 2)).toDF("q_id", "doc_id", "vec_rank")
    val got = Retrieval.rrfFuse(kw, vec, k = 10, kRrf = 60)
      .orderBy("q_id", "rk")
      .collect()
      .map(r => (r.getLong(1), r.getInt(2), r.getInt(3), r.getDouble(4), r.getInt(5)))
    def r6(d: Double) = math.rint(d * 1e6) / 1e6
    // doc 11 in both lists: 1/62 + 1/61; doc 10 kw-only rank 1: 1/61;
    // doc 12 vec-only rank 2: 1/62. 10 vs 12: 1/61 > 1/62 — rank by score.
    assert(got.toSeq === Seq(
      (11L, 2, 1, r6(1.0 / 62 + 1.0 / 61), 1),
      (10L, 1, 0, r6(1.0 / 61), 2),
      (12L, 0, 2, r6(1.0 / 62), 3)))
  }

  test("rrfFuse: equal-rank singletons from opposite lists tie-break by doc_id") {
    val kw = Seq((7L, 30L, 3)).toDF("q_id", "doc_id", "kw_rank")
    val vec = Seq((7L, 20L, 3)).toDF("q_id", "doc_id", "vec_rank")
    val got = Retrieval.rrfFuse(kw, vec, k = 10)
      .orderBy("rk").collect().map(r => (r.getLong(1), r.getInt(5)))
    // identical rrf = 1/63 on both → lower doc_id wins rank 1
    assert(got.toSeq === Seq((20L, 1), (30L, 2)))
  }

  test("hybridRrf on testdata: per-query ranks are 1..n unique, rrf ordered, both signals present") {
    val dir = "/root/testdata/sf0.001"
    val docsT = graft.Tables.documents(spark, dir)
    val embT = graft.Tables.embeddings(spark, dir)
    val got = Retrieval.hybridRrf(docsT, embT, nQueries = 3, k = 10, ngram = 3)
      .collect()
    val byQ = got.groupBy(_.getLong(0))
    assert(byQ.keySet === Set(0L, 1L, 2L))
    byQ.foreach { case (q, rows) =>
      val rks = rows.map(_.getInt(5)).sorted
      assert(rks.toSeq === (1 to rows.length), s"q=$q ranks not 1..n")
      // rrf non-increasing in rank
      val byRank = rows.sortBy(_.getInt(5)).map(_.getDouble(4))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b }, s"q=$q")
    }
    // the fusion saw both signals (per-query kw lists can legitimately be
    // short/empty on a query doc with only common phrases, so this pin is
    // corpus-global)
    assert(got.exists(_.getInt(2) > 0) && got.exists(_.getInt(3) > 0))
  }
}
