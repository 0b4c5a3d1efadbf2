package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Column-level entry points for graft's custom Catalyst expressions, plus
  * SQL-name registration so `spark.sql("SELECT pandas_title(c) ...")` works.
  */
object GraftFunctions {

  /** Pandas-exact `.str.title()` — see [[PandasTitle]]. */
  def pandas_title(c: Column): Column =
    GraftColumnBridge.column(PandasTitle(GraftColumnBridge.expression(c)))

  /** Sorted distinct word-k-shingle hashes of a token array — [[ShingleHashes]]. */
  def shingle_hashes(tokens: Column, k: Int): Column =
    GraftColumnBridge.column(ShingleHashes(GraftColumnBridge.expression(tokens), k))

  /** MinHash signature over shingle hashes — [[MinHashSignature]]. */
  def minhash_signature(shingleHashes: Column, numHashes: Int): Column =
    GraftColumnBridge.column(MinHashSignature(GraftColumnBridge.expression(shingleHashes), numHashes))

  /** 64-bit SimHash of a token array — [[SimHash64]]. */
  def simhash64(tokens: Column): Column =
    GraftColumnBridge.column(SimHash64(GraftColumnBridge.expression(tokens)))

  /** md5-twin MinHash signature (value-identical to the definitional SQL)
    * — [[Md5MinHashSigs]].
    */
  def md5_minhash_sigs(shingles: Column, numHashes: Int): Column =
    GraftColumnBridge.column(Md5MinHashSigs(GraftColumnBridge.expression(shingles), numHashes))

  /** md5-twin 60-bit SimHash (value-identical to the definitional SQL)
    * — [[Md5SimHash60]].
    */
  def md5_simhash60(tokens: Column): Column =
    GraftColumnBridge.column(Md5SimHash60(GraftColumnBridge.expression(tokens)))

  /** Allocation-free dot product of two double arrays — [[DotProduct]]. */
  def dot_product(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProduct(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** nPlanes-bit random-hyperplane sign sketch — [[HyperplaneSketch]]. */
  def hyperplane_sketch(vec: Column, seed: Column, nPlanes: Int): Column =
    GraftColumnBridge.column(HyperplaneSketch(
      GraftColumnBridge.expression(vec), GraftColumnBridge.expression(seed), nPlanes))

  /** Most-frequent-element count of a string array — [[TopRunLength]]. */
  def top_run_length(arr: Column): Column =
    GraftColumnBridge.column(TopRunLength(GraftColumnBridge.expression(arr)))

  /** Whitespace-robust tokens (no empties) — [[WsTokens]]. */
  def ws_tokens(text: Column): Column =
    GraftColumnBridge.column(WsTokens(GraftColumnBridge.expression(text)))

  /** Word n-grams of a token array — [[WordNgrams]]. */
  def word_ngrams(tokens: Column, n: Int): Column =
    GraftColumnBridge.column(WordNgrams(GraftColumnBridge.expression(tokens), n))

  /** Rabin-Karp hash per stride-1 k-code-point window — [[RollingWindowHashes]]. */
  def rolling_window_hashes(text: Column, k: Int): Column =
    GraftColumnBridge.column(RollingWindowHashes(GraftColumnBridge.expression(text), k))

  /** One-pass crawl-grade URL canonicalization — [[CanonicalUrl]]. */
  def canonical_url(url: Column): Column =
    GraftColumnBridge.column(CanonicalUrl(GraftColumnBridge.expression(url)))

  /** Unicode canonical composition (NFC) — [[NfcNormalize]]. */
  def nfc_normalize(text: Column): Column =
    GraftColumnBridge.column(NfcNormalize(GraftColumnBridge.expression(text)))

  /** Scale-10 fixed-point digits of a double, as a long — [[Unscaled10]]. */
  def unscaled10(d: Column): Column =
    GraftColumnBridge.column(Unscaled10(GraftColumnBridge.expression(d)))

  private val registry: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("pandas_title", "str - pandas-exact title case", (es: Seq[Expression]) => PandasTitle(es.head))
  )

  /** Idempotently register all graft functions in the session's registry.
    * Safe to call from inside query builders (the registry overwrite is
    * cheap); also done once at session build by [[GraftExtensions]].
    */
  def register(spark: SparkSession): Unit = {
    val fr = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    registry.foreach { case (name, usage, builder) =>
      fr.registerFunction(
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.PandasTitle", null, name, usage, ""),
        builder)
    }
  }
}
