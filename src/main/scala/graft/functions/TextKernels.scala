package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native text kernels for the repetition-signal family.
  *
  * Rationale (measured at sf0.1): the SQL higher-order form
  * `aggregate(array_sort(gs), struct(...), run-length fold)` is
  * CodegenFallback — interpreted per row, with a fresh struct allocation
  * per fold step — and made `x_text_repetition` the slowest map-only query
  * in the registry (3-4 s warm) despite being algorithmically right. This
  * kernel does the identical sort + run-length scan in a tight primitive
  * loop over `UTF8String` references (no string copies, no per-step
  * allocation) and stays inside whole-stage codegen — the same lesson as
  * `Sketches`/`Vectors`: per-row higher-order lambdas in a hot scan column
  * belong in a native expression.
  */
object TextKernels {

  /** Grouping order: any total order that makes equal elements adjacent
    * works (only run EQUALITY reaches the output); nulls sort first,
    * non-nulls in UTF8String binary order — the same comparator family
    * `array_sort` uses, so ties group identically.
    */
  private val groupOrder = new java.util.Comparator[AnyRef] {
    override def compare(x: AnyRef, y: AnyRef): Int =
      if (x == null) (if (y == null) 0 else -1)
      else if (y == null) 1
      else x.asInstanceOf[UTF8String].compareTo(y.asInstanceOf[UTF8String])
  }

  /** Count of the most frequent element of a string array (the "top n-gram
    * count"): sort refs, then one run-length pass. Empty array → 0; a null
    * element counts as its own group (null-safe equality, matching the SQL
    * fold this replaces). O(d log d) per row, zero allocation beyond the
    * ref array.
    */
  def topRunLength(arr: ArrayData): Int = {
    val n = arr.numElements()
    if (n == 0) return 0
    val a = new Array[AnyRef](n)
    var i = 0
    while (i < n) {
      a(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      i += 1
    }
    java.util.Arrays.sort(a, groupOrder)
    var best = 1
    var run = 1
    i = 1
    while (i < n) {
      val eq = if (a(i) == null) a(i - 1) == null else a(i).equals(a(i - 1))
      run = if (eq) run + 1 else 1
      if (run > best) best = run
      i += 1
    }
    best
  }

  /** Byte-level whitespace test — Java regex `\s` without
    * UNICODE_CHARACTER_CLASS is exactly this ASCII set, so the kernel
    * matches `split(text, "\\s+")` byte for byte. ASCII bytes never occur
    * inside a UTF-8 multibyte sequence, so scanning bytes is
    * Unicode-safe.
    */
  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** Whitespace-robust tokenizer: one pass over the UTF-8 bytes, emitting
    * maximal non-whitespace runs (empty tokens are never produced — the
    * regex-split + lambda-filter form this replaces spent its time in an
    * interpreted `filter` over every token of every row).
    */
  def wsTokens(s: UTF8String): ArrayData = {
    val b = s.getBytes
    val n = b.length
    val out = new java.util.ArrayList[AnyRef]()
    var i = 0
    while (i < n) {
      while (i < n && isWs(b(i))) i += 1
      val start = i
      while (i < n && !isWs(b(i))) i += 1
      if (i > start) out.add(UTF8String.fromBytes(b, start, i - start))
    }
    new GenericArrayData(out.toArray)
  }

  private val Space = UTF8String.fromString(" ")

  /** Word n-grams of a token array: n consecutive tokens joined with a
    * single space — the same output as
    * `transform(sequence(1, size-n+1), i -> array_join(slice(ws, i, n), ' '))`
    * (null tokens skipped by the join, size < n → empty array), without
    * the three nested CodegenFallback higher-order functions and their
    * per-window slice allocations.
    */
  def wordNgrams(tokens: ArrayData, n: Int): ArrayData = {
    val t = tokens.numElements()
    val m = t - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[AnyRef])
    val toks = new Array[UTF8String](t)
    var i = 0
    while (i < t) {
      toks(i) = if (tokens.isNullAt(i)) null else tokens.getUTF8String(i)
      i += 1
    }
    val out = new Array[AnyRef](m)
    val window = new Array[UTF8String](n)
    i = 0
    while (i < m) {
      var j = 0
      while (j < n) { window(j) = toks(i + j); j += 1 }
      out(i) = UTF8String.concatWs(Space, window: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** NFC normalization; see [[NfcNormalize]] for the contract. */
  def nfcNormalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** `top_run_length(array<string>)` — count of the most frequent element. */
case class TopRunLength(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "top_run_length"
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.topRunLength(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.topRunLength($c)")
  override protected def withNewChildInternal(newChild: Expression): TopRunLength =
    copy(child = newChild)
}

/** `ws_tokens(text)` — whitespace-robust tokens, no empties. */
case class WsTokens(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "ws_tokens"
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.wsTokens(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.wsTokens($c)")
  override protected def withNewChildInternal(newChild: Expression): WsTokens =
    copy(child = newChild)
}

/** `word_ngrams(tokens, n)` — n consecutive tokens joined with spaces. */
case class WordNgrams(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, s"word_ngrams: n must be >= 1, got $n")
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.wordNgrams(input.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.wordNgrams($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

/** `nfc_normalize(text)` — Unicode canonical composition (NFC), the
  * encoding-hygiene step that makes `café` (e + U+0301) and `café`
  * (U+00E9) byte-identical before any hash/dedup/tokenize touches the
  * text — without it, visually identical documents hash apart and
  * near-dup recall silently drops on non-ASCII corpora.
  *
  * Fast path: `Normalizer.isNormalized` is a cheap scan that short-
  * circuits on ASCII (the overwhelming majority of a web corpus), so the
  * already-normal case allocates nothing beyond the String view. Unicode's
  * normalization-stability policy guarantees NFC output is stable across
  * Unicode versions, which is what makes the DuckDB (utf8proc) oracle a
  * fair cross-engine pin for the JDK implementation.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.nfcNormalize(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.nfcNormalize($c)")
  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
