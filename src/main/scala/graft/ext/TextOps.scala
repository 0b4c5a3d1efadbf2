package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines: token
  * counting, quality scoring, language-ID heuristics, and document
  * fingerprinting. All pure columnar expressions (whole-stage codegen, no
  * UDFs, no shuffles) — at 100 TB these run as a single map pass fused with
  * the parquet scan.
  *
  * Cross-engine determinism notes (oracle = DuckDB):
  *  - counts/lengths are integers — exact.
  *  - ratios are a single IEEE division of two exact integers — bit-identical
  *    in any engine, NO rounding applied (rounding rationals is what's risky).
  *  - the fingerprint is a modular polynomial fold, integer-only.
  */
object TextOps {

  /** Whitespace tokens (reference text is single-space separated). */
  def words(text: Column): Column = split(text, " ")

  def nWords(text: Column): Column = size(words(text))

  /** BPE-ish lexer token count: letter runs, digit runs, other symbols. */
  def nTokensRegex(text: Column): Column =
    regexp_count(text, lit("[a-z]+|[0-9]+|[^a-z0-9 ]"))

  def nDistinctWords(text: Column): Column = size(array_distinct(words(text)))

  /** Average word length as an exact-input IEEE division (no rounding). */
  def avgWordLen(text: Column): Column =
    length(regexp_replace(text, " ", "")).cast("double") / nWords(text)

  /** Lambda-based helpers take the column NAME (SQL `expr` needs a
    * spliceable identifier; the Column DSL can't express lambdas).
    */
  def stopwordCount(textCol: String, stops: Seq[String]): Column = {
    val list = stops.map(s => s"'$s'").mkString(", ")
    expr(s"size(filter(split($textCol, ' '), w -> w in ($list)))")
  }

  /** Quality score features (length / stopword / diversity ratios). */
  val DefaultStopwords: Seq[String] = Seq("the", "a", "of", "to", "in", "and")

  /** Gopher/C4-style document quality rules as exact 0/1 predicates —
    * integer counts and single IEEE divisions only, so every rule (and the
    * summed score) is bit-identical cross-engine. Rule set: length band,
    * mean-word-length band, stopword floor (natural-language signal),
    * lexical-diversity floor (repetition filter).
    */
  def qualityRules(textCol: String): Seq[(String, Column)] = {
    val t = col(textCol)
    val w = nWords(t)
    Seq(
      "r_len" -> w.between(20, 1000),
      "r_wordlen" -> avgWordLen(t).between(3.0, 10.0),
      "r_stop" -> (stopwordCount(textCol, DefaultStopwords).cast("double") / w >= 0.05),
      "r_diverse" -> (nDistinctWords(t).cast("double") / w >= 0.3)
    ).map { case (n, c) => n -> c.cast("int") }
  }

  /** Number of quality rules passed (0..4). */
  def qualityScore(textCol: String): Column =
    qualityRules(textCol).map(_._2).reduce(_ + _)

  /** Language-ID heuristic: CJK-codepoint check, then per-language stopword
    * scores with a fixed argmax order (en > de > fr > es). The score lists
    * and the CASE order ARE the spec — the oracle mirrors them exactly.
    */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of"),
    "de" -> Seq("der", "die", "und"),
    "fr" -> Seq("le", "la", "et"),
    "es" -> Seq("el", "los", "y"))

  def langScore(textCol: String, lang: String): Column =
    stopwordCount(textCol, LangMarkers(lang))

  def predictedLang(textCol: String): Column = {
    val en = langScore(textCol, "en"); val de = langScore(textCol, "de")
    val fr = langScore(textCol, "fr"); val es = langScore(textCol, "es")
    when(col(textCol).rlike("[\\x{4e00}-\\x{9fff}]"), lit("zh"))
      .when(en >= de && en >= fr && en >= es, lit("en"))
      .when(de >= fr && de >= es, lit("de"))
      .when(fr >= es, lit("fr"))
      .otherwise(lit("es"))
  }

  /** Polynomial rolling-hash fingerprint over words, mod 2^31-1. Word is
    * reduced to (31*len + ascii(first char)); the fold is
    * acc -> (acc*131 + f(w)) mod p — identical in Spark `aggregate` and
    * DuckDB `list_reduce` (verified: both give 52145 on [3,5,7]).
    */
  def fingerprint(textCol: String): Column =
    expr(s"""aggregate(
      transform(split($textCol, ' '),
                w -> CAST(length(w)*31 + ascii(w) AS BIGINT)),
      CAST(0 AS BIGINT),
      (acc, x) -> (acc * 131 + x) % 2147483647)""")

  /** PII / boilerplate scrub patterns, applied in order. Kept to syntax
    * valid in BOTH Java regex and RE2 (no backrefs, no lookaround) so the
    * operator is oracle-mirrorable in DuckDB and portable to RE2-based
    * scanners. Order matters: URLs before bare numbers, or the digits
    * inside a URL get re-tagged.
    */
  val ScrubPatterns: Seq[(String, String)] = Seq(
    "https?://[^ ]+"                                  -> "<URL>",
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "[0-9]+"                                          -> "<NUM>")

  /** Apply [[ScrubPatterns]] (or a custom list) to a text column — the
    * standard pre-training scrub step (emails, URLs, raw numbers →
    * placeholder tokens). Pure columnar `regexp_replace` chain: fuses into
    * the scan, no UDF.
    */
  def scrub(text: Column,
            patterns: Seq[(String, String)] = ScrubPatterns): Column =
    patterns.foldLeft(text) { case (c, (re, repl)) =>
      regexp_replace(c, re, repl)
    }

  /** Gopher-style repetition signals over word n-grams: the fraction of
    * all n-grams taken by the single most frequent one (high → templated/
    * spammy text) and the distinct-n-gram ratio (low → loops). Within-ROW
    * computation — no shuffle, fuses with the scan; the inner
    * distinct×filter scan is O(d²) in the per-document n-gram count, which
    * is bounded by document length (a per-row constant, not a data-scale
    * term — the explode/groupBy alternative would turn a map pass into a
    * corpus-wide shuffle to save per-row work).
    *
    * Determinism: integer counts and one IEEE division — exact in any
    * engine (same contract as the other ratios here).
    */
  /** `*Of` variants take an ALREADY-COMPUTED n-gram array column. Compute
    * the array once in a prior projection and reference it here — the
    * higher-order functions are CodegenFallback, so Catalyst's
    * common-subexpression elimination does NOT rescue duplicated subtrees,
    * and `CollapseProject` deliberately keeps a non-cheap multi-referenced
    * alias in its own projection (one evaluation) instead of inlining it.
    */
  def topNgramCountOf(gs: Column): Column = {
    // sort + linear run-length fold: O(d log d) per row vs the O(d²)
    // distinct×filter scan (that form was the slowest query in the
    // registry at 4 s warm on sf0.1). When acc.run is 0 both branches
    // yield 1, so the sentinel empty-string prev can never miscount a
    // legitimate first element. Empty array → best stays 0.
    aggregate(
      array_sort(gs),
      struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
      (acc, x) => {
        val run = when(x.eqNullSafe(acc.getField("prev")), acc.getField("run") + 1)
          .otherwise(lit(1))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
  }

  def topNgramCount(textCol: String, n: Int = 2): Column =
    topNgramCountOf(graft.ext.Decontaminate.ngrams(textCol, n))

  def nNgrams(textCol: String, n: Int = 2): Column =
    size(graft.ext.Decontaminate.ngrams(textCol, n))

  def topNgramFraction(textCol: String, n: Int = 2): Column =
    topNgramCount(textCol, n).cast("double") / nNgrams(textCol, n)

  def distinctNgramRatio(textCol: String, n: Int = 2): Column =
    size(array_distinct(graft.ext.Decontaminate.ngrams(textCol, n))).cast("double") /
      nNgrams(textCol, n)
}
