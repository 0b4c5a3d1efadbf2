package graft.ext

import graft.SparkSpec

class CdcSpec extends SparkSpec {
  import spark.implicits._

  test("cutPoints: deterministic, strictly inside, window-complete only") {
    val t = "the quick brown fox jumps over the lazy dog " * 4
    val cuts = Cdc.cutPoints(t)
    assert(cuts === Cdc.cutPoints(t)) // pure function
    assert(cuts.forall(c => c >= Cdc.Window && c < t.length))
    assert(cuts === cuts.sorted && cuts.distinct === cuts)
    // short and empty texts have no cuts
    assert(Cdc.cutPoints("abcdefgh") === Seq.empty)
    assert(Cdc.cutPoints("") === Seq.empty)
  }

  test("content-defined: an early edit leaves chunks after the edit window identical") {
    val base = "x" + ("the quick brown fox jumps over the lazy dog " * 8)
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
      (1L, "the quick brown fox jumps over the lazy dog " * 3),
      (2L, "short"),
      (3L, "")).toDF("doc_id", "text")
    val got = Cdc.chunks(docs).as[(Long, Int, Int, String)].collect()
      .groupBy(_._1).map { case (k, v) => k -> v.sortBy(_._2) }
    assert(!got.contains(3L))
    assert(got(2L).map(_._4).mkString === "short")
    val d1 = got(1L)
    assert(d1.map(_._4).mkString === "the quick brown fox jumps over the lazy dog " * 3)
    assert(d1.map(_._2).toSeq === (1 to d1.length))
    assert(d1.forall(c => c._3 === c._4.length))
  }

  test("dedupStats counts duplicate chunk storage exactly") {
    // two identical docs: every chunk duplicated once
    val t = "the quick brown fox jumps over the lazy dog " * 4
    val docs = Seq((1L, t), (2L, t)).toDF("doc_id", "text")
    val r = Cdc.dedupStats(Cdc.chunks(docs)).head()
    val nChunks = r.getLong(0); val nDistinct = r.getLong(1)
    val total = r.getLong(2); val dup = r.getLong(3)
    assert(nChunks === 2 * nDistinct)
    assert(total === 2L * t.length)
    assert(dup === t.length.toLong)
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
