package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance vocabulary clustering — the SymSpell / deletion-
  * neighborhood scheme (Garbe's symmetric-delete algorithm; the
  * production approach for spell-variant collapsing at scale): two words
  * are within Levenshtein distance 1 ONLY IF their ≤1-deletion
  * neighborhoods intersect (delete → b ∈ del1(a); insert → a ∈ del1(b);
  * substitute → deleting the edited position from both yields the same
  * string; equality → the words themselves). The converse does NOT hold
  * (del1("ab") ∩ del1("ba") ∋ both single chars, yet lev = 2), so shared
  * deletion keys are CANDIDATES and every candidate is verified with the
  * exact distance — output ⊆ truth by verification, output ⊇ truth by the
  * neighborhood theorem: exact, never approximate.
  *
  * Scale shape: everything is VOCABULARY-sized, never corpus-sized — the
  * corpus collapses to (word, freq) first (one aggregation), each word
  * emits ≤ len+1 deletion variants (words are bounded, ~16 code points),
  * candidates come from ONE equi-join keyed on the 8-byte variant hash,
  * and the exact-distance verify runs per candidate pair. An all-pairs
  * vocabulary scan is |V|² (10¹⁰ pairs at a 100k vocab); this is
  * Σ(len+1)·bucket — linear in the vocabulary for natural-language key
  * distributions. The same skeleton as the MinHash/SimHash banding
  * families, on the string-edit metric.
  *
  * Words are CODE-POINT sequences (the [[Bpe]]/[[Cdc]] contract — DuckDB
  * `levenshtein`/`substr` count code points where naive JVM code would
  * count UTF-16 units).
  */
object EditDist {

  /** All single-code-point deletions of `w` (length in code points ≥ 1),
    * deduplicated ("aa" has one distinct deletion, not two).
    */
  private[ext] def deletions1(w: String): Seq[String] = {
    val cps = toCps(w)
    (0 until cps.length).map { i =>
      val b = new StringBuilder
      var j = 0
      while (j < cps.length) { if (j != i) b.appendAll(Character.toChars(cps(j))); j += 1 }
      b.toString
    }.distinct
  }

  /** The ≤`k`-deletion neighborhood of `w` INCLUDING `w` itself —
    * distinct strings reachable by at most k single-code-point deletions
    * (≤ Σ_{j≤k} C(len, j) strings; at the bounded word lengths here, a
    * few dozen). The symmetric-delete soundness argument generalizes from
    * k = 1: an optimal ≤k-edit script with i inserts, d deletes, s
    * substitutions (i+d+s ≤ k) leaves a common subsequence reachable from
    * `a` by deleting its d+s edited positions and from `b` by deleting
    * its i+s — both within ≤k deletions, so the neighborhoods intersect.
    */
  private[ext] def deletionsUpTo(w: String, k: Int): Seq[String] = {
    var frontier = Set(w)
    val seen = scala.collection.mutable.LinkedHashSet(w)
    var round = 0
    while (round < k) {
      frontier = frontier.flatMap(s => if (s.isEmpty) Seq.empty else deletions1(s))
      frontier.foreach(seen += _)
      round += 1
    }
    seen.toSeq
  }

  private def toCps(w: String): Array[Int] = {
    val out = new scala.collection.mutable.ArrayBuffer[Int](w.length)
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += cp
      i += Character.charCount(cp)
    }
    out.toArray
  }

  /** Exact Levenshtein distance over CODE POINTS, unit costs — the same
    * definition DuckDB's `levenshtein` computes, so the verify step and
    * the oracle agree symbol for symbol.
    */
  private[ext] def lev(a: String, b: String): Int = {
    val (x, y) = (toCps(a), toCps(b))
    if (x.isEmpty) return y.length
    if (y.isEmpty) return x.length
    var prev = Array.tabulate(y.length + 1)(identity)
    var cur = new Array[Int](y.length + 1)
    var i = 1
    while (i <= x.length) {
      cur(0) = i
      var j = 1
      while (j <= y.length) {
        val sub = prev(j - 1) + (if (x(i - 1) == y(j - 1)) 0 else 1)
        cur(j) = math.min(math.min(prev(j) + 1, cur(j - 1) + 1), sub)
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(y.length)
  }

  /** Corpus vocabulary with frequencies: `(word, cnt)` — the frame every
    * operator here iterates on (one corpus aggregation; empty tokens
    * dropped).
    */
  def vocab(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))

  /** Vocabulary pairs at Levenshtein distance ≤ `maxDist` (distinct
    * words), `word_a < word_b` — candidates from the deletion-
    * neighborhood equi-join (keys hashed to 8 bytes; the word itself is a
    * key too, catching pure insert/delete neighbors), then exact-distance
    * verified. Output `(word_a, word_b, dist)`. `maxDist = 2` is
    * production SymSpell's standard radius; neighborhood size — and so
    * candidate volume — grows ~C(len, maxDist), which is why the radius
    * is a knob and not unbounded.
    */
  def nearPairs(vocabDf: DataFrame, maxDist: Int = 1): DataFrame = {
    require(maxDist >= 1 && maxDist <= 3,
      s"editdist nearPairs: maxDist in [1, 3], got $maxDist (the deletion " +
        "neighborhood is C(len, k)-sized — larger radii want a different scheme)")
    val spark = vocabDf.sparkSession
    import spark.implicits._
    val k = maxDist
    val keys = vocabDf.select(col("word")).as[String]
      .flatMap(w => deletionsUpTo(w, k).map(v => (v, w)))
      .toDF("variant", "word")
      .select(xxhash64(col("variant")).as("vk"), col("word"))
    val cand = keys.select(col("vk"), col("word").as("word_a"))
      .join(keys.select(col("vk"), col("word").as("word_b")), Seq("vk"))
      .filter(col("word_a") < col("word_b"))
      .select(col("word_a"), col("word_b"))
      .dropDuplicates("word_a", "word_b")
    cand.as[(String, String)]
      .map { case (a, b) => (a, b, lev(a, b)) }
      .toDF("word_a", "word_b", "dist")
      .filter(col("dist") <= k)
  }

  /** SymSpell's correction rule as a canonicalization map: every word's
    * canonical form is the highest-frequency word within edit distance
    * ≤ 1 of it (itself included), ties to the lexicographically smallest
    * — `(word, canonical, canonical_cnt)`. Words with no more-frequent
    * neighbor map to themselves, so the map is total over the vocabulary
    * and applying it collapses typo variants onto their dominant
    * spelling (the text-normalization step of a web-corpus pipeline).
    * Cost: [[nearPairs]] + two vocabulary-keyed joins + one argmax
    * aggregation — still vocabulary-sized end to end.
    */
  def typoCanonical(vocabDf: DataFrame): DataFrame = {
    val pairs = nearPairs(vocabDf).select(col("word_a"), col("word_b"))
    // neighbor relation, symmetric closure + self. The closure EXPLODES
    // each pair into both directions instead of unioning two references
    // to the pairs plan — referencing it twice would run the per-candidate
    // exact-Levenshtein verify (the scheme's hottest step) twice per action
    val nbrs = pairs.select(explode(array(
        struct(col("word_a").as("word"), col("word_b").as("nbr")),
        struct(col("word_b").as("word"), col("word_a").as("nbr")))).as("e"))
      .select(col("e.word").as("word"), col("e.nbr").as("nbr"))
      .unionByName(vocabDf.select(col("word"), col("word").as("nbr")))
    nbrs
      .join(vocabDf.select(col("word").as("nbr"), col("cnt").as("nbr_cnt")), Seq("nbr"))
      // argmax by (cnt desc, word asc): min of (-cnt, word) — one hash agg
      .groupBy(col("word"))
      .agg(min(struct((-col("nbr_cnt")).as("neg"), col("nbr").as("w"))).as("best"))
      .select(col("word"), col("best.w").as("canonical"),
        (-col("best.neg")).as("canonical_cnt"))
  }
}
