package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Hand-computed bigram-MLE scores — the integer-surrogate arithmetic is
  * the contract (floor at the per-bigram division AND at the doc mean).
  */
class NgramLmSpec extends SparkSpec {
  import spark.implicits._

  test("scoreDocs: hand-computed corpus, floor at both divisions") {
    // tokens: d1 = a b a b; d2 = a b c  →  c1: a=3 b=3 c=1
    // bigrams: d1 = (a b)(b a)(a b); d2 = (a b)(b c) → c2: "a b"=3 "b a"=1 "b c"=1
    val docs = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val got = NgramLm.scoreDocs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // p("a b") = 1000000*3/3 = 1000000; p("b a") = 1000000/3 = 333333 (floor)
    // d1: (1000000 + 333333 + 1000000) DIV 3 = 2333333 DIV 3 = 777777
    // d2: (1000000 + 333333) DIV 2 = 666666
    assert(got === Set((1L, 3L, 777777L), (2L, 2L, 666666L)))
  }

  test("scoreDocs: <2-word and NULL-text docs are not emitted") {
    val docs = Seq((1L, "solo"), (2L, null), (3L, "two words"))
      .toDF("doc_id", "text")
    val ids = NgramLm.scoreDocs(docs).select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    assert(ids === Set(3L))
  }

  test("scoreDocs: repetitive doc pre-aggregation equals per-occurrence math") {
    // one doc repeating the same bigram 5 times: multiplicity path must
    // weight p by n, not collapse it
    val docs = Seq((1L, "x x x x x x")).toDF("doc_id", "text")
    val r = NgramLm.scoreDocs(docs).collect().head
    // c1(x)=6, c2("x x")=5, p = 1000000*5/6 = 833333; mean over 5 = 833333
    assert((r.getLong(1), r.getLong(2)) === ((5L, 833333L)))
  }
}
