package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** The Rabin-Karp kernel's one load-bearing property: the rolling
  * recurrence computes EXACTLY the direct polynomial of each window's code
  * points — so equal windows always hash equal (the losslessness
  * SubstrDedup's candidate pass rides on), anywhere in any document.
  */
class RollingHashSpec extends AnyFunSuite {

  private def direct(cps: Array[Int], from: Int, k: Int): Long = {
    var h = 0L
    var j = 0
    while (j < k) { h = h * RollingHash.B + cps(from + j); j += 1 }
    h
  }

  private def hashes(s: String, k: Int): Seq[Long] = {
    val a = RollingHash.windowHashes(UTF8String.fromString(s), k)
    (0 until a.numElements()).map(a.getLong(_))
  }

  test("rolling == direct polynomial per window (ASCII, accented, CJK, astral)") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "ação coração não informação", // 2-byte UTF-8
      "数据去重是大规模训练管道的基础工作",  // 3-byte UTF-8
      "mixed 𝕏😀 astral 𝄞 and ascii", // 4-byte UTF-8 (astral)
      "aaaaaaaaaa")                   // degenerate repeats
    for (t <- texts; k <- Seq(1, 3, 7)) {
      val cps = t.codePoints().toArray
      val expect = (0 to cps.length - k).map(i => direct(cps, i, k))
      assert(hashes(t, k) === expect, s"text='$t' k=$k")
    }
  }

  test("equal windows hash equal across positions and documents") {
    val a = hashes("xyz" + "SHAREDPASSAGE" + "123", 13)
    val b = hashes("SHAREDPASSAGE" + "qqqq", 13)
    assert(a(3) === b(0)) // the shared 13-char window, different offsets
  }

  test("shorter than k -> empty; exactly k -> one window") {
    assert(hashes("abc", 4).isEmpty)
    assert(hashes("abcd", 4).size === 1)
    assert(hashes("", 1).isEmpty)
  }

  test("seeded random multibyte string: every pair of equal windows hashes equal") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abαβ漢𝕏" // 1-, 2-, 3-, 4-byte code points
    val cps = alphabet.codePoints().toArray
    val s = new StringBuilder
    (0 until 400).foreach(_ => s.appendAll(Character.toChars(cps(rnd.nextInt(cps.length)))))
    val text = s.toString
    val k = 5
    val hs = hashes(text, k)
    val scp = text.codePoints().toArray
    def window(i: Int) = new String(scp, i, k)
    var equalPairs = 0
    for (i <- hs.indices; j <- hs.indices if i < j && window(i) == window(j)) {
      assert(hs(i) === hs(j), s"equal windows at $i,$j must hash equal")
      equalPairs += 1
    }
    assert(equalPairs > 0, "fixture must actually exercise equal windows")
  }
}
