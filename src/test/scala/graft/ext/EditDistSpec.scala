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
