package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  private val weights = Seq(("good", 5L), ("bad", -7L), ("ok", 1L))
    .toDF("tok", "weight")

  test("scoreDocs: hand-computed weighted sums, tf multiplicity counted") {
    val docs = Seq((1L, "good good bad"), (2L, "ok")).toDF("doc_id", "text")
    val got = Classifier.scoreDocs(docs, weights)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // d1: 2*5 + 1*(-7) = 3 over 3 hits; d2: 1*1 over 1 hit
    assert(got === Set((1L, 3L, 3L), (2L, 1L, 1L)))
  }

  test("scoreDocs: OOV tokens contribute nothing; all-OOV docs are absent") {
    val docs = Seq((1L, "good unknown"), (2L, "mystery words only"))
      .toDF("doc_id", "text")
    val got = Classifier.scoreDocs(docs, weights)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 1L, 5L)))
  }

  test("scoreDocs: bias shifts every emitted score") {
    val docs = Seq((1L, "bad")).toDF("doc_id", "text")
    val r = Classifier.scoreDocs(docs, weights, bias = 100L).collect().head
    assert(r.getLong(2) === 93L)
  }
}
