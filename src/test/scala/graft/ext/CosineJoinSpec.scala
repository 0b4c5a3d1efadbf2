package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CosineJoinSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(df: org.apache.spark.sql.DataFrame, t: Double, maxDf: Long = 100L) =
    CosineJoin.similarPairs(df, t, maxDf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(p => (p._1, p._2))

  private def naive(df: org.apache.spark.sql.DataFrame, t: Double, maxDf: Long = 100L) =
    CosineJoin.similarPairsNaive(df, t, maxDf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(p => (p._1, p._2))

  private val corpus = Seq(
    (1L, "alpha beta gamma delta epsilon"),
    (2L, "alpha beta gamma delta zeta"),     // near-dup of 1
    (3L, "alpha alpha alpha beta beta"),     // repeats: multiset weight matters
    (4L, "omega psi chi phi"),               // disjoint
    (5L, "omega psi chi phi upsilon"),       // near-dup of 4
    (6L, "beta gamma tau"),
    (7L, "solo words only here")
  ).toDF("doc_id", "text")

  test("prefix-filtered result equals naive all-pairs across thresholds") {
    for (t <- Seq(0.2, 0.4, 0.5, 0.7, 0.9, 0.999))
      assert(pairs(corpus, t).toSeq === naive(corpus, t).toSeq, s"t=$t")
  }

  test("finds planted near-dups; disjoint docs never pair") {
    val got = pairs(corpus, 0.6).map(p => (p._1, p._2)).toSet
    assert(got.contains((1L, 2L)) && got.contains((4L, 5L)))
    assert(!got.exists { case (a, b) => Set(a, b).intersect(Set(4L, 5L)).nonEmpty &&
      Set(a, b).intersect(Set(1L, 2L, 3L, 6L)).nonEmpty })
  }

  test("multiset weighting: repeated tokens raise cosine vs set semantics") {
    // doc 8 repeats alpha like doc 3 does; tf cosine sees them as close
    val df = corpus.union(Seq((8L, "alpha alpha alpha beta gamma")).toDF("doc_id", "text"))
    val cos38 = pairs(df, 0.1).find(p => p._1 == 3L && p._2 == 8L).map(_._3)
    assert(cos38.exists(_ > 0.8), s"tf weighting should score (3,8) high, got $cos38")
  }

  test("df cap excludes common tokens from the vectors") {
    // 'common' appears in every doc -> df cap 3 removes it entirely; the
    // two docs sharing ONLY 'common' must not pair at any threshold
    val df = Seq(
      (1L, "common aaa bbb"), (2L, "common aaa bbb"),
      (3L, "common xxx"), (4L, "common yyy")
    ).toDF("doc_id", "text")
    val got = pairs(df, 0.01, maxDf = 3L).map(p => (p._1, p._2)).toSet
    assert(got === Set((1L, 2L)))
  }

  test("exact duplicate scores 1.0") {
    val df = Seq((1L, "a b c"), (2L, "a b c")).toDF("doc_id", "text")
    assert(pairs(df, 0.5).toSeq === Seq((1L, 2L, 1.0)))
  }

  test("3-gram terms: phrase-level match pairs, word-shuffled docs do not") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog tonight"), // shared phrases
      (3L, "dog lazy the over jumps fox brown quick the today")    // same words, no shared 3-grams
    ).toDF("doc_id", "text")
    val tri = CosineJoin.similarPairs(df, 0.4, maxDf = 100L, ngram = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(tri === Set((1L, 2L)))
    // prefix == naive holds for n-gram terms too
    val a = CosineJoin.similarPairs(df, 0.2, 100L, 3).collect().map(_.toSeq).toSet
    val b = CosineJoin.similarPairsNaive(df, 0.2, 100L, 3).collect().map(_.toSeq).toSet
    assert(a === b)
  }

  test("equals naive on a pseudo-random corpus (lossless filter)") {
    val vocab = Array("ant", "bee", "cat", "dog", "elk", "fox", "gnu", "hen", "ibex", "jay")
    val df = (0 until 60).map { i =>
      val words = (0 until 8).map(j => vocab((i * 7 + j * 13 + i * j) % vocab.length))
      (i.toLong, words.mkString(" "))
    }.toDF("doc_id", "text")
    for (t <- Seq(0.3, 0.6, 0.85))
      assert(pairs(df, t, maxDf = 60L).toSeq === naive(df, t, maxDf = 60L).toSeq, s"t=$t")
  }
}
