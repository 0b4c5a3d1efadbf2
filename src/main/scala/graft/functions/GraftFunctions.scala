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
