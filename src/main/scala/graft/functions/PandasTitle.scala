package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Pandas-exact title-case as a native Catalyst expression (codegen'd).
  *
  * Parity target: pandas `.str.title()` used at
  * /root/reference/airflow/dags/tasks/silver.py:56-65. Python's `str.title()`
  * upper-cases a letter that follows any NON-letter and lower-cases the rest,
  * so `"d'água do MAR"` → `"D'Água Do Mar"`, while Spark's `initcap` only
  * capitalizes after whitespace (`"d'água do MAR"` → `"D'água Do Mar"`).
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
  /** Static so generated java code can call it without capturing `this`. */
  def title(s: UTF8String): UTF8String = {
    val str = s.toString
    val sb  = new java.lang.StringBuilder(str.length)
    var i = 0
    var prevCased = false
    while (i < str.length) {
      val cp = str.codePointAt(i)
      val isLetter = Character.isLetter(cp)
      val out =
        if (!isLetter) cp
        else if (prevCased) Character.toLowerCase(cp)
        else Character.toTitleCase(cp)
      sb.appendCodePoint(out)
      prevCased = isLetter
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }
}
