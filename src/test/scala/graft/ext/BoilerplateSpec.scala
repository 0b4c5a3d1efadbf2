package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Boilerplate span detection: planted-boilerplate recovery, equivalence
  * with the naive (no hash pass) form, coverage arithmetic, and the
  * doc-distinct rule that separates boilerplate from within-doc repetition.
  */
class BoilerplateSpec extends SparkSpec {
  import spark.implicits._

  // 4 docs share the planted header "terms of service"; doc 5 repeats a
  // 3-gram internally (df must stay 1); doc 6 is too short for 3-grams
  private def docs = Seq(
    (1L, "terms of service alpha beta gamma"),
    (2L, "terms of service delta epsilon"),
    (3L, "terms of service zeta eta theta"),
    (4L, "intro words terms of service end"),
    (5L, "spam spam spam spam spam spam"),
    (6L, "too short")
  ).toDF("doc_id", "text")

  test("spans: planted header found at its doc frequency; within-doc repeats don't count") {
    val got = Boilerplate.spans(docs, n = 3, minDf = 3L)
      .as[(String, Long)].collect().toMap
    assert(got === Map("terms of service" -> 4L))
    // "spam spam spam" occurs 4x inside ONE doc — df is 1, below any minDf>1
    assert(!got.contains("spam spam spam"))
  }

  test("spans == the naive groupBy(gram) form (hash-first pass changes nothing)") {
    def naive(d: DataFrame, minDf: Long) = d
      .select(explode(array_distinct(Decontaminate.ngrams("text", 3))).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
    for (minDf <- Seq(1L, 2L, 4L)) {
      val a = Boilerplate.spans(docs, minDf = minDf).as[(String, Long)].collect().toSet
      val b = naive(docs, minDf).as[(String, Long)].collect().toSet
      assert(a === b, s"minDf=$minDf")
    }
  }

  test("coverage: hits/ratio per doc; zero-boiler docs kept at 0; short docs excluded") {
    val got = Boilerplate.coverage(docs, n = 3, minDf = 3L)
      .as[(Long, Int, Int, Double)].collect().map(r => r._1 -> r).toMap
    // doc 1: 4 distinct 3-grams, 1 boilerplate
    assert(got(1L) === ((1L, 4, 1, 0.25)))
    // doc 4: 4 distinct 3-grams ("intro words terms", "words terms of",
    // "terms of service", "of service end") — 1 hit
    assert(got(4L) === ((4L, 4, 1, 0.25)))
    // doc 5: one distinct 3-gram, no boilerplate — present with 0
    assert(got(5L) === ((5L, 1, 0, 0.0)))
    // doc 6: < 3 tokens, no spans — excluded, not fabricated
    assert(!got.contains(6L))
    assert(got.keySet === Set(1L, 2L, 3L, 4L, 5L))
  }

  test("parameter validation") {
    intercept[IllegalArgumentException] { Boilerplate.spans(docs, n = 0) }
    intercept[IllegalArgumentException] { Boilerplate.spans(docs, minDf = 0L) }
    intercept[IllegalArgumentException] { Boilerplate.removeLines(docs, minDf = 0L) }
    intercept[IllegalArgumentException] { Boilerplate.removeLines(docs, sep = "") }
  }

  // 3 docs share the FOOTER line (doc 1 carries it twice); every doc has a
  // unique content line; doc 4 has only the footer; blank lines survive
  private def lineDocs = Seq(
    (1L, "alpha content\nFOOTER\nmore alpha\nFOOTER"),
    (2L, "beta content\n\nFOOTER"),
    (3L, "gamma content\nFOOTER"),
    (4L, "FOOTER")
  ).toDF("doc_id", "text")

  test("removeLines: shared footer excised everywhere (all occurrences), unique lines kept in order") {
    val got = Boilerplate.removeLines(lineDocs, minDf = 3L)
      .as[(Long, String, Int, Int)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) === ((1L, "alpha content\nmore alpha", 4, 2)))
    assert(got(2L) === ((2L, "beta content\n", 3, 1))) // blank line survives
    assert(got(3L) === ((3L, "gamma content", 2, 1)))
    assert(got(4L) === ((4L, "", 1, 1))) // all-boilerplate doc: empty, not dropped
  }

  test("removeLines: df is doc-distinct — a line repeated inside ONE doc is not boilerplate") {
    val d = Seq(
      (1L, "x\nx\nx\nx\nx"), // 5 in-doc repeats: df = 1
      (2L, "y\nz")
    ).toDF("doc_id", "text")
    val got = Boilerplate.removeLines(d, minDf = 2L)
      .as[(Long, String, Int, Int)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) === ((1L, "x\nx\nx\nx\nx", 5, 0)))
    assert(got(2L) === ((2L, "y\nz", 2, 0)))
  }

  test("removeLines: custom separator, threshold boundary at exactly minDf") {
    val d = Seq(
      (1L, "a|SHARED|b"),
      (2L, "c|SHARED"),
      (3L, "solo")
    ).toDF("doc_id", "text")
    val got = Boilerplate.removeLines(d, minDf = 2L, sep = "|")
      .as[(Long, String, Int, Int)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) === ((1L, "a|b", 3, 1))) // df == minDf fires
    assert(got(2L) === ((2L, "c", 2, 1)))
    assert(got(3L) === ((3L, "solo", 1, 0)))
  }
}
