package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions._

/** SparkSessionExtensions hook: registers graft's native expressions and
  * optimizer rules at session build time. Enable with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")`.
  *
  * SURVEY.md §4 concludes Catalyst's built-in rules already cover every
  * optimization the *reference pipeline* needs; the one custom rule here
  * ([[graft.functions.RewriteSetSizes]]) optimizes the engine's own hot
  * similarity-join pattern — `size(array_intersect/union(a,b))` — into
  * direct cardinality counting without materializing the set arrays.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** Int literal argument of a SQL call (`simhash64(toks)` needs none;
    * `minhash_signature(s, 128)` does).
    */
  private def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name expects a literal INT, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    val functions: Seq[(String, String, String, Seq[Expression] => Expression)] = Seq(
      ("pandas_title", "graft.functions.PandasTitle",
        "pandas_title(str) - pandas-exact title case",
        es => PandasTitle(es.head)),
      ("shingle_hashes", "graft.functions.ShingleHashes",
        "shingle_hashes(tokens, k) - sorted distinct k-shingle hashes",
        es => ShingleHashes(es.head, intArg(es(1), "shingle_hashes k"))),
      ("minhash_signature", "graft.functions.MinHashSignature",
        "minhash_signature(shingles, h) - h-value minhash signature",
        es => MinHashSignature(es.head, intArg(es(1), "minhash_signature h"))),
      ("simhash64", "graft.functions.SimHash64",
        "simhash64(tokens) - 64-bit simhash",
        es => SimHash64(es.head)),
      ("dot_product", "graft.functions.DotProduct",
        "dot_product(a, b) - allocation-free double-array dot product",
        es => DotProduct(es.head, es(1))),
      ("hyperplane_sketch", "graft.functions.HyperplaneSketch",
        "hyperplane_sketch(vec, seed, planes) - LSH sign sketch",
        es => HyperplaneSketch(es.head, es(1), intArg(es(2), "hyperplane_sketch planes"))),
      ("top_run_length", "graft.functions.TopRunLength",
        "top_run_length(arr) - count of the most frequent element",
        es => TopRunLength(es.head)),
      ("ws_tokens", "graft.functions.WsTokens",
        "ws_tokens(text) - whitespace-robust tokens, no empties",
        es => WsTokens(es.head)),
      ("word_ngrams", "graft.functions.WordNgrams",
        "word_ngrams(tokens, n) - n consecutive tokens joined with spaces",
        es => WordNgrams(es.head, intArg(es(1), "word_ngrams n"))),
      ("rolling_window_hashes", "graft.functions.RollingWindowHashes",
        "rolling_window_hashes(text, k) - Rabin-Karp hash per stride-1 k-code-point window",
        es => RollingWindowHashes(es.head, intArg(es(1), "rolling_window_hashes k"))),
      ("canonical_url", "graft.functions.CanonicalUrl",
        "canonical_url(url) - one-pass crawl-grade URL canonicalization",
        es => CanonicalUrl(es.head)),
      ("nfc_normalize", "graft.functions.NfcNormalize",
        "nfc_normalize(text) - Unicode canonical composition (NFC)",
        es => NfcNormalize(es.head)))
    functions.foreach { case (name, className, usage, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(className, null, name, usage, ""),
        builder))
    }
    ext.injectOptimizerRule(_ => graft.functions.RewriteSetSizes)
  }
}
