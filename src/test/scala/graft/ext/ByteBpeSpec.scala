package graft.ext

import graft.SparkSpec

/** Pins [[ByteBpe]]: hex-pair byte symbolization (UTF-8 round trip incl.
  * multi-byte splits), byte-fallback coverage of characters training never
  * saw, merge parity with the char trainer on an ASCII corpus (where the
  * alphabets coincide up to hex renaming), and tokenize counts.
  */
class ByteBpeSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, Seq.fill(5)("low").mkString(" ")),
    (2L, Seq.fill(2)("lower").mkString(" ")),
    (3L, Seq.fill(6)("newest").mkString(" ")),
    (4L, Seq.fill(3)("widest").mkString(" "))).toDF("doc_id", "text")

  private def hexOf(s: String): Seq[String] =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      .map(b => f"${b & 0xff}%02X").toSeq

  test("UTF-8 round trip: symbols decode back to the word, multi-byte chars split correctly") {
    // é = C3 A9 (2 bytes), 😀 = F0 9F 98 80 (4 bytes, astral)
    val syms = ByteBpe.toByteSymbols("aé😀")
    assert(syms === Seq("61", "C3", "A9", "F0", "9F", "98", "80", ByteBpe.Eow))
    val decoded = syms.takeWhile(_ != ByteBpe.Eow).mkString("")
    assert(ByteBpe.decodeSymbol(decoded) === "aé😀")
    // a MERGED symbol spanning a multi-byte boundary still decodes
    assert(ByteBpe.decodeSymbol("C3A9") === "é")
  }

  test("on an ASCII corpus, byte training == char training up to hex renaming") {
    val charMerges = Bpe.train(corpus, "text", numMerges = 4)
    val byteMerges = ByteBpe.train(corpus, "text", numMerges = 4)
    assert(byteMerges.size === charMerges.size)
    charMerges.zip(byteMerges).foreach { case ((ca, cb, cc), (ba, bb, bc)) =>
      def hx(sym: String): String =
        if (sym == Bpe.Eow) sym
        else if (sym.endsWith(Bpe.Eow))
          hexOf(sym.dropRight(Bpe.Eow.length)).mkString("") + Bpe.Eow
        else hexOf(sym).mkString("")
      assert(bc === cc, s"count for ($ca,$cb)")
      // NOTE: ranks can differ when hex order != char order among ties;
      // on this fixture the tiebreak order happens to agree for counts,
      // so compare the merged SYMBOL CONTENT per rank
      assert(ba === hx(ca) || ByteBpe.decodeSymbol(ba.stripSuffix(Bpe.Eow)) ===
        ca.stripSuffix(Bpe.Eow), s"rank pair ($ba,$bb) vs ($ca,$cb)")
    }
  }

  test("byte fallback: characters unseen in training always encode, never throw") {
    val merges = ByteBpe.train(corpus, "text", numMerges = 4)
    val ranks = merges.zipWithIndex.map { case ((a, b, _), i) => (a, b) -> i }.toMap
    // 'zürich😀' shares no characters with the corpus beyond fallback bytes
    val toks = ByteBpe.encodeWord("zürich😀", ranks)
    assert(toks.last === ByteBpe.Eow)
    // concatenate the hex FIRST: a multi-byte char split across tokens is
    // not valid UTF-8 per token, only as the reassembled byte stream
    val rt = ByteBpe.decodeSymbol(toks.takeWhile(_ != ByteBpe.Eow).mkString(""))
    assert(rt === "zürich😀")
  }

  test("fallbackStats: merged content lowers fallback; unseen content is all fallback") {
    val merges = ByteBpe.train(corpus, "text", numMerges = 4)
    val probe = Seq(
      (1L, "low low"),      // trained content: some bytes ride merges
      (2L, "qqq"),          // 'q' never in corpus: every byte is fallback
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val rows = ByteBpe.fallbackStats(probe, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // trained word: fallback strictly below the token count (merges fired)
    assert(rows(1L)._2 < rows(1L)._1)
    // unseen word: 3 bytes all fallback; +1 Eow token (len 4, not counted)
    assert(rows(2L) === ((4L, 3L)))
    // no words: zero tokens, zero fallback (the doc still appears)
    assert(rows(3L) === ((0L, 0L)))
    // cross-check totals against tokenize's n_byte_tokens
    val tok = ByteBpe.tokenize(probe, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(rows.forall { case (id, (t, _)) => t === tok(id).toLong })
  }

  test("tokenize: counts line up; first word's tokens concatenate to its bytes") {
    val merges = ByteBpe.train(corpus, "text", numMerges = 4)
    val rows = ByteBpe.tokenize(corpus, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    assert(rows(1L)._1 === 5)          // 5 'low' words
    assert(rows(1L)._2 >= rows(1L)._1) // every word >= 1 token
    val first = rows(3L)._3.split('|') // 'newest'
    assert(first.last.endsWith(ByteBpe.Eow))
    val hexCat = first.mkString("").stripSuffix(ByteBpe.Eow)
    assert(ByteBpe.decodeSymbol(hexCat) === "newest")
  }
}
