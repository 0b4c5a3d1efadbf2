package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[EditDist]]: the deletion-neighborhood candidate scheme is
  * EXACT against brute-force Levenshtein (both inclusion directions,
  * including the false-candidate case the verify step must reject), the
  * code-point distance itself, and the SymSpell canonicalization rule
  * with its frequency/tie-break semantics.
  */
class EditDistSpec extends SparkSpec {
  import spark.implicits._

  test("deletions1: one variant per position, deduplicated, code-point aware") {
    assert(EditDist.deletions1("abc") === Seq("bc", "ac", "ab"))
    assert(EditDist.deletions1("aa") === Seq("a")) // dedup
    assert(EditDist.deletions1("x") === Seq(""))
    // astral-plane: 𝕏 is two UTF-16 units but ONE deletion unit
    assert(EditDist.deletions1("a𝕏b") === Seq("𝕏b", "ab", "a𝕏"))
  }

  test("lev: unit-cost code-point Levenshtein (the DuckDB definition)") {
    assert(EditDist.lev("", "") === 0)
    assert(EditDist.lev("abc", "abc") === 0)
    assert(EditDist.lev("abc", "ab") === 1)   // delete
    assert(EditDist.lev("abc", "abcd") === 1) // insert
    assert(EditDist.lev("abc", "axc") === 1)  // substitute
    assert(EditDist.lev("ab", "ba") === 2)    // transpose is TWO edits
    assert(EditDist.lev("kitten", "sitting") === 3)
    assert(EditDist.lev("a𝕏c", "a𝕐c") === 1) // astral substitution is 1, not 2
  }

  test("nearPairs == brute-force lev<=1 over the vocabulary (exactness both ways)") {
    // covers every edit class, the shared-deletion FALSE candidate
    // ("ab"/"ba" share del1 keys at lev 2 — must be verified away), and
    // unrelated words
    val words = Seq("cat", "cut", "cats", "at", "ab", "ba", "dog", "dogs",
      "dig", "zebra")
    val vocab = words.map((_, 1L)).toDF("word", "cnt")
    val got = EditDist.nearPairs(vocab)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    val want = (for {
      a <- words; b <- words if a < b
      d = EditDist.lev(a, b) if d <= 1
    } yield (a, b, d)).toSet
    assert(got === want)
    assert(!got.exists(p => Set(p._1, p._2) == Set("ab", "ba")),
      "the false candidate must not survive verification")
    assert(got.contains(("cat", "cut", 1)) && got.contains(("cat", "cats", 1))
      && got.contains(("at", "cat", 1)))
  }

  test("deletionsUpTo: includes the word, all 1- and 2-deletions, distinct") {
    assert(EditDist.deletionsUpTo("abc", 1).toSet === Set("abc", "bc", "ac", "ab"))
    assert(EditDist.deletionsUpTo("abc", 2).toSet ===
      Set("abc", "bc", "ac", "ab", "a", "b", "c"))
    assert(EditDist.deletionsUpTo("a", 2).toSet === Set("a", ""))
    assert(EditDist.deletionsUpTo("", 2) === Seq(""))
  }

  test("nearPairs maxDist=2 == brute-force lev<=2 (transpositions now included)") {
    val words = Seq("cat", "cut", "cats", "at", "ab", "ba", "dog", "dogs",
      "dig", "zebra", "form", "from", "abcd", "badc")
    val vocab = words.map((_, 1L)).toDF("word", "cnt")
    val got = EditDist.nearPairs(vocab, maxDist = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    val want = (for {
      a <- words; b <- words if a < b
      d = EditDist.lev(a, b) if d <= 2
    } yield (a, b, d)).toSet
    assert(got === want)
    // radius 2 catches the lev-2 pairs radius 1 rejects
    assert(got.contains(("ab", "ba", 2)) && got.contains(("form", "from", 2)))
    // and lev-3 shared-deletion candidates are still verified away
    assert(EditDist.lev("abcd", "badc") === 3)
    assert(!got.exists(p => Set(p._1, p._2) == Set("abcd", "badc")))
  }

  test("built-in levenshtein == EditDist.lev (code points, astral incl.); threshold form returns -1 above k") {
    // the equivalence that justifies running the candidate verify on
    // Spark's codegen `levenshtein` (threshold form) instead of a Dataset
    // map over EditDist.lev — round-14 verdict item 4. The astral pairs
    // are the divergence risk: a UTF-16-unit implementation would count 2
    // for one astral substitution.
    val cases = Seq(
      ("a𝕏c", "a𝕐c"), ("a𝕏c", "abc"), ("", "a𝕏c"), ("𝕏", "𝕏"),
      ("x𝕏", "𝕏x"), ("kitten", "sitting"), ("ab", "ba"), ("café", "cafe"),
      ("", ""), ("abc", "abcd"))
    val rows = cases.toDF("a", "b").select(col("a"), col("b"),
      levenshtein(col("a"), col("b")).as("l"),
      levenshtein(col("a"), col("b"), 1).as("lt1"),
      levenshtein(col("a"), col("b"), 2).as("lt2")).collect()
    rows.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val want = EditDist.lev(a, b)
      assert(r.getInt(2) === want, s"full form ($a, $b)")
      assert(r.getInt(3) === (if (want <= 1) want else -1), s"threshold-1 ($a, $b)")
      assert(r.getInt(4) === (if (want <= 2) want else -1), s"threshold-2 ($a, $b)")
    }
  }

  test("MaxWordLen: over-long tokens never pair (either side) but stay in the canonical map") {
    val blob = "x" * (EditDist.MaxWordLen + 8)  // the URL/base64 class
    val blobTypo = blob.dropRight(1)            // lev 1 from blob, still > cap
    val edge = "y" * EditDist.MaxWordLen        // exactly at the cap: eligible
    val edgeTypo = edge.dropRight(1)            // 31 cps, lev 1 from edge
    val vocab = Seq((blob, 50L), (blobTypo, 1L), (edge, 50L), (edgeTypo, 1L),
      ("cat", 5L), ("cut", 1L)).toDF("word", "cnt")
    val pairs = EditDist.nearPairs(vocab)
    val got = pairs.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === Set((edgeTypo, edge), ("cat", "cut")),
      "the blob pair is guarded out; the at-cap pair survives")
    pairs.unpersist()
    val canon = EditDist.typoCanonical(vocab)
    val m = canon.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m(blob) === blob && m(blobTypo) === blobTypo,
      "over-long words map to themselves (isolated nodes)")
    assert(m(edgeTypo) === edge)
    assert(m.keySet === vocab.collect().map(_.getString(0)).toSet,
      "the map stays total over the vocabulary, long tail included")
    canon.unpersist()
  }

  test("typoCanonical maxDist=2 == brute-force; a canonical can flip between k=1 and k=2") {
    // "thw" at k=1 reaches only "the" (lev 1); at k=2 it also reaches the
    // MORE frequent "they" (substitute w->e, insert y) — the correction
    // radius changes the answer, which is why it is a knob and not a
    // constant
    val vocab = Seq(("the", 100L), ("they", 200L), ("thw", 2L),
      ("dog", 10L), ("dig", 10L), ("zebra", 1L)).toDF("word", "cnt")
    val words = Seq("the", "they", "thw", "dog", "dig", "zebra")
    val cnts = Map("the" -> 100L, "they" -> 200L, "thw" -> 2L,
      "dog" -> 10L, "dig" -> 10L, "zebra" -> 1L)
    def brute(k: Int): Map[String, (String, Long)] =
      words.map { w =>
        val best = words.filter(o => EditDist.lev(w, o) <= k)
          .minBy(o => (-cnts(o), o))
        w -> ((best, cnts(best)))
      }.toMap
    Seq(1, 2).foreach { k =>
      val out = EditDist.typoCanonical(vocab, maxDist = k)
      val got = out.collect()
        .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2)))).toMap
      assert(got === brute(k), s"radius $k")
      out.unpersist()
    }
    assert(brute(1)("thw") === (("the", 100L)))
    assert(brute(2)("thw") === (("they", 200L)), "the flip the radius buys")
  }

  test("typoCanonical: highest-frequency neighbor wins, ties to smallest word") {
    val vocab = Seq(("the", 100L), ("thw", 2L), ("thee", 3L),
      ("dog", 10L), ("dig", 10L), ("zebra", 1L)).toDF("word", "cnt")
    val got = EditDist.typoCanonical(vocab)
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got("thw") === (("the", 100L)))   // typo collapses to the dominant form
    assert(got("thee") === (("the", 100L)))
    assert(got("the") === (("the", 100L)))   // dominant maps to itself
    // dog/dig tie at 10 -> lexicographically smallest ('dig') for BOTH
    assert(got("dog") === (("dig", 10L)) && got("dig") === (("dig", 10L)))
    assert(got("zebra") === (("zebra", 1L))) // isolated word maps to itself
    assert(got.keySet === vocab.collect().map(_.getString(0)).toSet,
      "the map is total over the vocabulary")
  }
}
