package graft.ext

import graft.SparkSpec

class CdcSpec extends SparkSpec {
  import spark.implicits._

  test("cutPoints: deterministic, strictly inside, window-complete only") {
    val t = "pack my box with five dozen liquor jugs and then some more words here " * 4
    val cuts = Cdc.cutPoints(t)
    assert(cuts === Cdc.cutPoints(t)) // pure function
    assert(cuts.nonEmpty, "fixture text must actually trigger the divisor rule")
    assert(cuts.forall(c => c >= Cdc.Window && c < t.length))
    assert(cuts === cuts.sorted && cuts.distinct === cuts)
    // short and empty texts have no cuts
    assert(Cdc.cutPoints("abcdefgh") === Seq.empty)
    assert(Cdc.cutPoints("") === Seq.empty)
  }

  test("content-defined: an early edit leaves chunks after the edit window identical") {
    val base = "x" + ("pack my box with five dozen liquor jugs and then some more words here " * 8)
    val edited = "yy" + base.substring(1) // early insertion, shifts offsets
    def chunkSet(t: String): Set[String] = {
      val bounds = (0 +: Cdc.cutPoints(t)) :+ t.length
      bounds.sliding(2).map { case Seq(a, b) => t.substring(a, b) }.toSet
    }
    val shared = chunkSet(base) intersect chunkSet(edited)
    // a fixed-size chunker would share nothing after the shift; CDC must
    // re-align — all but the head chunk(s) containing the edit survive
    assert(shared.size >= chunkSet(base).size - 2,
      s"CDC failed to re-align after an early edit: shared=${shared.size} of ${chunkSet(base).size}")
  }

  test("chunks reassemble to the document; idx/len consistent; empty docs absent") {
    val docs = Seq(
      (1L, "pack my box with five dozen liquor jugs and then some more words here " * 3),
      (2L, "short"),
      (3L, "")).toDF("doc_id", "text")
    val got = Cdc.chunks(docs).as[(Long, Int, Int, String)].collect()
      .groupBy(_._1).map { case (k, v) => k -> v.sortBy(_._2) }
    assert(!got.contains(3L))
    assert(got(2L).map(_._4).mkString === "short")
    val d1 = got(1L)
    assert(d1.map(_._4).mkString === "pack my box with five dozen liquor jugs and then some more words here " * 3)
    assert(d1.map(_._2).toSeq === (1 to d1.length))
    assert(d1.forall(c => c._3 === c._4.length))
  }

  test("dedupStats counts duplicate chunk storage exactly") {
    // two identical docs (and the periodic text repeats chunks even
    // WITHIN one doc) — expectations derived from the chunk frame itself
    val t = "pack my box with five dozen liquor jugs and then some more words here " * 4
    val docs = Seq((1L, t), (2L, t)).toDF("doc_id", "text")
    val ch = Cdc.chunks(docs).as[(Long, Int, Int, String)].collect()
    val r = Cdc.dedupStats(Cdc.chunks(docs)).head()
    assert(r.getLong(0) === ch.length.toLong)
    assert(r.getLong(1) === ch.map(_._4).distinct.length.toLong)
    assert(r.getLong(2) === ch.map(_._3.toLong).sum)
    assert(r.getLong(2) === 2L * t.length) // reassembly invariant
    assert(r.getLong(3) === ch.map(_._3.toLong).sum
      - ch.map(_._4).distinct.map(_.length.toLong).sum)
    assert(r.getLong(3) >= t.length.toLong, "the doc-level duplicate alone dups every char once")
  }

  test("code points: astral chars count as one position (the oracle's unit)") {
    val t = "😀" * 20 // 20 code points, 40 UTF-16 units
    val bounds = (0 +: Cdc.cutPoints(t)) :+ t.codePointCount(0, t.length)
    assert(bounds.last === 20)
    val chunks = Cdc.chunks(Seq((1L, t)).toDF("doc_id", "text"))
      .as[(Long, Int, Int, String)].collect().sortBy(_._2)
    assert(chunks.map(_._4).mkString === t)
    assert(chunks.map(_._3).sum === 20, "lengths are code points, not UTF-16 units")
  }
}
