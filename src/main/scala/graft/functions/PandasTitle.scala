package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Pandas-exact title-case as a native Catalyst expression (codegen'd).
  *
  * Parity target: pandas `.str.title()` used at
  * /root/reference/airflow/dags/tasks/silver.py:56-65. Python's `str.title()`
  * upper-cases a char that follows any non-CASED char and lower-cases the
  * rest, so `"d'água do MAR"` → `"D'Água Do Mar"`, while Spark's `initcap`
  * only capitalizes after whitespace (`"d'água do MAR"` → `"D'água Do Mar"`).
  * Word boundaries, one-to-many case expansions, and the Final_Sigma rule
  * follow CPython's `do_title` exactly (pinned against CPython outputs in
  * OpsSpec).
  *
  * Implemented as a `UnaryExpression` with `doGenCode` delegating to a static
  * method, so it participates in whole-stage codegen (no UDF boxing, no
  * serialization of a closure, null-handling inherited from the
  * null-safe codegen template).
  */
case class PandasTitle(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "pandas_title"

  override protected def nullSafeEval(input: Any): Any =
    PandasTitle.title(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PandasTitle.title($c)")

  override protected def withNewChildInternal(newChild: Expression): PandasTitle =
    copy(child = newChild)
}

object PandasTitle {

  /** Unicode Cased property (Lu+Ll+Lt plus Other_{Upper,Lower}case — which
    * Java's isUpper/isLowerCase include). CPython's `do_title` keys word
    * boundaries on CASED, not `isalpha`: ideographs and most modifier
    * letters are letters but NOT cased, so the letter after them starts a
    * new word ("中国a".title() == "中国A").
    */
  def isCased(cp: Int): Boolean =
    Character.isLowerCase(cp) || Character.isUpperCase(cp) ||
      Character.getType(cp) == Character.TITLECASE_LETTER

  /** Case_Ignorable approximation for the Final_Sigma lookahead. */
  private def isCaseIgnorable(cp: Int): Boolean = Character.getType(cp) match {
    case Character.NON_SPACING_MARK | Character.ENCLOSING_MARK |
         Character.FORMAT | Character.MODIFIER_LETTER |
         Character.MODIFIER_SYMBOL => true
    case _ => cp == '\'' || cp == 0x2019 // apostrophes are MidLetter
  }

  /** Final_Sigma context: no cased codepoint follows (skipping ignorables). */
  private def followedByCased(str: String, from: Int): Boolean = {
    var k = from
    while (k < str.length) {
      val cp = str.codePointAt(k)
      if (isCased(cp)) return true
      if (!isCaseIgnorable(cp)) return false
      k += Character.charCount(cp)
    }
    false
  }

  private def lowerFull(sb: java.lang.StringBuilder, cp: Int, sigmaFinal: Boolean): Unit =
    if (cp == 0x3A3 && sigmaFinal) sb.append('ς') // GREEK SMALL FINAL SIGMA
    else sb.append(new String(Character.toChars(cp)).toLowerCase(java.util.Locale.ROOT))

  private def titleFull(sb: java.lang.StringBuilder, cp: Int): Unit = {
    val t = Character.toTitleCase(cp)
    if (t != cp) sb.appendCodePoint(t)
    else {
      // no single-codepoint mapping: use the full uppercase expansion,
      // title-shaped (first upper, rest lower) — ß → "Ss", ﬁ → "Fi"
      val up = new String(Character.toChars(cp)).toUpperCase(java.util.Locale.ROOT)
      if (up.codePointCount(0, up.length) <= 1) sb.append(up)
      else {
        val head = up.codePointAt(0)
        sb.appendCodePoint(head)
        sb.append(up.substring(Character.charCount(head)).toLowerCase(java.util.Locale.ROOT))
      }
    }
  }

  /** CPython `str.title()` parity, full Unicode case mappings included:
    * word boundaries on the CASED property, one-to-many expansions
    * (ß → Ss, İ → i̇), and the Final_Sigma rule (ΟΣ → Ος). Matches
    * CPython's (deliberate) non-idempotence on expansion outputs. Static so
    * generated java code can call it without capturing `this`.
    */
  def title(s: UTF8String): UTF8String = {
    val str = s.toString
    val sb  = new java.lang.StringBuilder(str.length)
    var i = 0
    var prevCased = false
    while (i < str.length) {
      val cp = str.codePointAt(i)
      val n = Character.charCount(cp)
      if (!Character.isLetter(cp) && !isCased(cp)) sb.appendCodePoint(cp)
      else if (prevCased) lowerFull(sb, cp, !followedByCased(str, i + n))
      else titleFull(sb, cp)
      prevCased = isCased(cp)
      i += n
    }
    UTF8String.fromString(sb.toString)
  }
}
