package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Whitespace tokens (reference text is single-space separated). For
    * real-world corpora with tabs/newlines/runs of spaces use [[wordsWs]] —
    * a literal `' '` split turns every extra whitespace char into a phantom
    * empty token that silently shifts word counts, quality rules, n-grams,
    * and decontamination.
    */
  def words(text: Column): Column = split(text, " ")

  /** Whitespace-ROBUST tokens: split on runs of any whitespace (the Java
    * `\s` ASCII set), empty tokens never emitted; all-whitespace input →
    * empty array, not `[""]`. Native one-pass kernel
    * ([[graft.functions.WsTokens]]) — value-identical to
    * `filter(split(text, "\\s+"), w -> length(w) > 0)` (pinned in
    * TextKernelsSpec) but codegen instead of an interpreted per-token
    * lambda. DuckDB mirror:
    * `list_filter(regexp_split_to_array(t, '\s+'), w -> len(w) > 0)` —
    * exact except on vertical tab (`\x0B`): Java's `\s` includes it, RE2's
    * does not, so a `\x0B`-bearing corpus diverges from that mirror (not
    * from this operator's own contract, which is the Java set).
    */
  def wordsWs(text: Column): Column =
    graft.functions.GraftFunctions.ws_tokens(text)

  def nWords(text: Column): Column = size(words(text))

  /** BPE-ish lexer token count: letter runs, digit runs, other symbols. */
  def nTokensRegex(text: Column): Column =
    regexp_count(text, lit("[a-z]+|[0-9]+|[^a-z0-9 ]"))

  def nDistinctWords(text: Column): Column = size(array_distinct(words(text)))

  /** Average word length as an exact-input IEEE division (no rounding). */
  def avgWordLen(text: Column): Column =
    length(regexp_replace(text, " ", "")).cast("double") / nWords(text)

  /** Compression-ratio quality signal (deflate level 6):
    * compressed/raw bytes per document — the repetitiveness proxy
    * published pipelines (Gopher-family) gate on: boilerplate and
    * template spam compress far below natural prose. Deflate is a JVM
    * codec, not SQL — so this runs as `mapPartitions` with ONE reused
    * Deflater per partition (the Multimodal codec discipline; a per-row
    * allocation would thrash), and registry exposure is rows-only with
    * the orderings pinned in unit tests. Map-only, no shuffle, linear in
    * bytes. Deflate output for a fixed input/level is deterministic on a
    * given zlib build — run-stable here; pin level/library if ratios
    * must compare across clusters.
    */
  def compressionStats(docs: org.apache.spark.sql.DataFrame, idCol: String,
                       textCol: String): org.apache.spark.sql.DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val deflater = new java.util.zip.Deflater(6)
        val buf = new Array[Byte](64 * 1024)
        it.map { case (id, text) =>
          val raw = if (text == null) Array.empty[Byte] else text.getBytes("UTF-8")
          deflater.reset()
          deflater.setInput(raw)
          deflater.finish()
          var n = 0L
          while (!deflater.finished()) n += deflater.deflate(buf)
          val ratio = if (raw.length == 0) 1.0 else n.toDouble / raw.length
          (id, raw.length.toLong, n, ratio)
        }
      }
      .toDF(idCol, "n_raw", "n_compressed", "compress_ratio")
  }

  /** Stopword hits per document. Column-API lambda, NOT an `expr` splice:
    * the API takes arbitrary `Seq[String]`, and a stopword containing `'`
    * (don't, l'eau) would break a spliced `w in ('…')` list at parse time —
    * `isInCollection` builds the literal list structurally instead.
    */
  def stopwordCount(textCol: String, stops: Seq[String]): Column =
    size(filter(split(col(textCol), " "), w => w.isInCollection(stops)))

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

  /** Sentence segmentation (rule-based): split on `[.!?] ` — terminal
    * punctuation followed by a space, the identical-in-Java-and-RE2 core
    * of every rule splitter; segments that trim to empty are dropped.
    * Per-doc stats, not per-sentence rows, so the op is one explode + one
    * keyed agg (no per-doc window) — the chunk-at-sentence-boundary
    * primitive sequence packing consumes.
    */
  def sentenceStats(docs: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame =
    docs.select(col(idCol), explode(split(col(textCol), "[.!?] ")).as("s"))
      .filter(length(trim(col("s"))) > 0)
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("int").as("n_sentences"),
        sum(length(col("s"))).as("sum_sent_chars"),
        max(length(col("s"))).cast("int").as("max_sent_chars"))

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

  /** Per-document PII FINDINGS — the detection side of [[scrub]]: how many
    * URLs / emails / bare numbers does each document carry? Pipelines gate
    * on the counts (a doc that is mostly contact strings is directory spam,
    * not prose) and audit redaction with them, so the counts are an
    * operator of their own, not just a replace. Each count is an
    * independent `regexp_count` over the SAME pattern list as [[scrub]] —
    * matches may overlap across categories (digits inside a URL also count
    * as a number; both engines count identically since the scans are
    * independent). Pure codegen regexp, fuses with the scan; NULL text →
    * NULL counts (detection over nothing is unknown, not zero).
    */
  def piiCounts(text: Column): Seq[(String, Column)] = Seq(
    "n_urls"   -> regexp_count(text, lit(ScrubPatterns(0)._1)),
    "n_emails" -> regexp_count(text, lit(ScrubPatterns(1)._1)),
    "n_nums"   -> regexp_count(text, lit(ScrubPatterns(2)._1)))

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

  /** Document-frequency vocabulary of a corpus: `(tok, df)`, doc-distinct
    * (a token repeated inside one doc counts once — the df every retrieval
    * and boilerplate rule here keys on).
    */
  def vocabCounts(docs: org.apache.spark.sql.DataFrame,
                  textCol: String = "text"): org.apache.spark.sql.DataFrame =
    docs.select(explode(array_distinct(split(col(textCol), " "))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))

  /** INCREMENTAL vocabulary maintenance: fold a new document batch into an
    * existing `(tok, df)` table without rescanning the corpus — df is
    * additive over disjoint doc sets, so the merge is a keyed union+sum
    * (one shuffle on the token, batch-sized not corpus-sized). The
    * incremental path is pinned ≡ a full recompute over the combined
    * corpus (`x_text_vocab_incr`'s oracle recomputes from scratch).
    */
  def mergeVocabCounts(existing: org.apache.spark.sql.DataFrame,
                       batch: org.apache.spark.sql.DataFrame,
                       textCol: String = "text"): org.apache.spark.sql.DataFrame =
    existing.unionByName(vocabCounts(batch, textCol))
      .groupBy(col("tok")).agg(sum(col("df")).as("df"))

  /** Encoding hygiene — the C4-style cleanup every web corpus pass runs
    * before tokenization, as one fused regexp chain (order matters and is
    * part of the contract, mirrored verbatim in the oracle):
    *  1. strip C0/C1 control characters except `\t`/`\n` (they carry no
    *     text; `\r` dies here — upstream line splitting treats `\r\n`
    *     remnants as content otherwise);
    *  2. strip zero-width characters (ZWSP/ZWNJ/ZWJ/BOM) — invisible
    *     codepoints that silently split tokens and break exact dedup;
    *  3. normalize exotic Unicode spaces (NBSP, en/em/thin spaces,
    *     ideographic space) to plain ' ' so whitespace tokenizers see one
    *     space alphabet.
    * Pure map pass, codegen regexp, fuses with the scan.
    */
  def cleanUnicode(text: Column): Column = {
    val noCtrl = regexp_replace(text,
      "[\\x00-\\x08\\x0B-\\x1F\\x7F\\x{0080}-\\x{009F}]", "")
    val noZeroWidth = regexp_replace(noCtrl, "[\\x{200B}-\\x{200D}\\x{FEFF}]", "")
    regexp_replace(noZeroWidth,
      "[\\x{00A0}\\x{1680}\\x{2000}-\\x{200A}\\x{202F}\\x{205F}\\x{3000}]", " ")
  }

  /** Gopher-style repetition signals over word n-grams: the fraction of
    * all n-grams taken by the single most frequent one (high → templated/
    * spammy text) and the distinct-n-gram ratio (low → loops). Within-ROW
    * computation — no shuffle, fuses with the scan; cost is O(d log d) in
    * the per-document n-gram count, which is bounded by document length (a
    * per-row constant, not a data-scale term — the explode/groupBy
    * alternative would turn a map pass into a corpus-wide shuffle to save
    * per-row work).
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
  def topNgramCountOf(gs: Column): Column =
    // native sort + run-length kernel (graft.functions.TopRunLength):
    // O(d log d) per row, codegen, zero fold-step allocation. The SQL
    // higher-order form (`aggregate(array_sort(gs), …)`) computes the same
    // value but is CodegenFallback-interpreted and was the slowest map-only
    // query in the registry; equivalence is pinned in SetSizesSpec.
    graft.functions.GraftFunctions.top_run_length(gs)

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
