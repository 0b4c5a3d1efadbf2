package graft.ext

import graft.SparkSpec

/** Pins [[UnigramLm]]: Viterbi exactness against a brute-force
  * enumeration of all segmentations (score max, smaller-mask tiebreak),
  * mask→pieces recovery, seed counting (overlapping occurrences,
  * singles-retention), training mechanics (counts from the committed
  * segmentations, zero-count singles retained with the smoothing score),
  * and the encode round-trip (pieces concatenate back to the word, piece
  * count consistent).
  */
class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  private def bruteBest(word: String, scores: Map[String, Long],
                        maxPieceLen: Int): (Long, Long) = {
    val n = word.length // ASCII fixtures
    def rec(start: Int, sc: Long, msk: Long): Seq[(Long, Long)] =
      if (start == n) Seq((sc, msk))
      else (1 to math.min(maxPieceLen, n - start)).flatMap { l =>
        scores.get(word.substring(start, start + l)).toSeq.flatMap { s =>
          rec(start + l, sc + s, msk | (1L << (start + l - 1)))
        }
      }
    rec(0, 0L, 0L).maxBy { case (sc, msk) => (sc, -msk) }
  }

  test("viterbi == brute force over all segmentations, incl. mask tiebreaks") {
    // scores engineered so ties occur: 'ab'+'c' vs 'a'+'bc' equal sums
    val scores = Map("a" -> -10L, "b" -> -10L, "c" -> -10L, "ab" -> -15L,
      "bc" -> -15L, "abc" -> -40L, "abca" -> -9L)
    for (w <- Seq("a", "ab", "abc", "abca", "abcabca", "cba", "aabbcc")) {
      assert(UnigramLm.viterbi(w, scores, 4) === bruteBest(w, scores, 4), w)
    }
  }

  test("tie goes to the smaller boundary mask, and the rule is DP-consistent") {
    // "abc": 'ab'+'c' (mask 110b=6) vs 'a'+'bc' (mask 101b=5): equal score
    // -25 -> mask 5 wins (piece ends at 1 and 3)
    val scores = Map("a" -> -10L, "c" -> -10L, "ab" -> -15L, "bc" -> -15L)
    val (sc, msk) = UnigramLm.viterbi("abc", scores, 4)
    assert(sc === -25L && msk === 5L)
    assert(UnigramLm.segment("abc", msk) === Seq("a", "bc"))
  }

  test("segment recovers pieces from the mask") {
    assert(UnigramLm.segment("hashing", (1L << 3) | (1L << 6)) ===
      Seq("hash", "ing"))
    assert(UnigramLm.segment("x", 1L) === Seq("x"))
  }

  test("unsegmentable word fails loudly") {
    intercept[IllegalArgumentException] {
      UnigramLm.viterbi("ax", Map("a" -> -1L), 4)
    }
  }

  test("seed counts overlapping occurrences weighted by word freq; singles kept") {
    // corpus: "aaa aaa ab" -> vocab: aaa (freq 2), ab (freq 1)
    val docs = Seq((1L, "aaa aaa"), (2L, "ab")).toDF("doc_id", "text")
    val got = UnigramLm.seedPieces(docs, "text", maxPieceLen = 3, seedSize = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 'a': 3 per aaa x2 + 1 in ab = 7; 'aa': 2 overlapping x2 = 4 (top-3
    // with 'aaa'=2 ... rank by cnt desc, piece asc: a(7), aa(4), aaa(2));
    // singles 'b'(1) retained beyond the top-3
    assert(got === Map("a" -> 7L, "aa" -> 4L, "aaa" -> 2L, "b" -> 1L))
  }

  test("train: counts mirror committed segmentations; unused singles smoothed") {
    val docs = Seq((1L, "abab abab abab"), (2L, "cd")).toDF("doc_id", "text")
    // seedSize must admit 'abab' (pieces are only ever PRUNED after the
    // seed — unigram training never creates pieces, unlike BPE merges)
    val m = UnigramLm.train(docs, "text", emRounds = 2, maxPieceLen = 4,
      seedSize = 8)
    assert(m.rounds.size === 3) // seed + 2 EM rounds
    val fin = m.finalPieces.map(t => (t._1, t._2)).toMap
    // 'abab' dominates the seed (freq 3 word); its Viterbi segmentation is
    // the single piece 'abab', so final counts concentrate there
    assert(fin("abab") === 3L)
    // alphabet retained even where unused (a/b inside abab)
    for (c <- Seq("a", "b", "c", "d")) assert(fin.contains(c), s"single $c lost")
    // scores are the frozen driver-side surrogate: negative, higher count
    // => higher score within one round
    val sc = m.finalPieces.map(t => (t._1, t._3)).toMap
    assert(sc("abab") > sc("a") && sc.values.forall(_ < 0))
  }

  test("tokenize round-trip: pieces concatenate to the word; counts line up") {
    val docs = Seq((1L, "hash hashing batch"), (2L, ""), (3L, "join"))
      .toDF("doc_id", "text")
    val m = UnigramLm.train(docs, "text", emRounds = 2, maxPieceLen = 4,
      seedSize = 20)
    val rows = UnigramLm.tokenize(docs, "doc_id", "text", m.finalScores, 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    assert(rows(1L)._1 === 3 && rows(3L)._1 === 1)
    assert(rows(2L) === ((0, 0, "")))
    // first word's pieces concatenate back to the word
    assert(rows(1L)._3.split('|').mkString === "hash")
    // piece count >= word count (every word is >= 1 piece)
    assert(rows(1L)._2 >= rows(1L)._1)
  }

  test("word longer than the mask cap fails loudly at train time") {
    val long = "x" * 64
    val docs = Seq((1L, s"ok $long")).toDF("doc_id", "text")
    val ex = intercept[IllegalArgumentException] {
      UnigramLm.train(docs, "text", emRounds = 1, maxPieceLen = 4, seedSize = 8)
    }
    assert(ex.getMessage.contains("63"))
  }

  test("caller word cap (oracle DP unroll) is enforced at train AND tokenize") {
    // 17-code-point word: within the 63 mask bound but past a 16 cap —
    // previously trained fine in Spark while the oracle's DP unroll
    // silently lost it (round-11 ADVICE); now both sides share one bound
    val w17 = "y" * 17
    val docs = Seq((1L, s"ok $w17")).toDF("doc_id", "text")
    val ex = intercept[IllegalArgumentException] {
      UnigramLm.train(docs, "text", emRounds = 1, maxPieceLen = 4,
        seedSize = 8, maxWordLen = 16)
    }
    assert(ex.getMessage.contains("capped at 16"))
    val scores = Map("o" -> -1L, "k" -> -1L, "y" -> -1L)
    val ex2 = intercept[Exception] {
      UnigramLm.tokenize(docs, "doc_id", "text", scores,
        maxPieceLen = 4, maxWordLen = 16).collect()
    }
    assert(ex2.getMessage.contains("16"))
  }

  test("empty corpus fails with a clear message, not an NPE") {
    val docs = Seq((1L, ""), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val ex = intercept[IllegalArgumentException] {
      UnigramLm.train(docs, "text", emRounds = 1, maxPieceLen = 4, seedSize = 8)
    }
    assert(ex.getMessage.contains("empty corpus"))
  }

  test("40-code-point word trains AND tokenizes end-to-end at a cap >= 40") {
    // positive twin of the cap-enforcement tests: a word well past the
    // registry's DpUnroll=16 but inside a caller cap of 40 must survive
    // the whole train -> tokenize chain (pieces concatenate back), so the
    // shared-bound fix rejects ONLY out-of-contract input
    val w40 = ("abcd" * 10) // 40 code points
    val docs = Seq((1L, s"$w40 ok ok")).toDF("doc_id", "text")
    val m = UnigramLm.train(docs, "text", emRounds = 2, maxPieceLen = 4,
      seedSize = 20, maxWordLen = 40)
    val rows = UnigramLm.tokenize(docs, "doc_id", "text", m.finalScores,
      maxPieceLen = 4, maxWordLen = 40)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    assert(rows(1L)._1 === 3)
    // the 40-char word's pieces concatenate back to it verbatim
    assert(rows(1L)._3.split('|').mkString === w40)
  }
}
