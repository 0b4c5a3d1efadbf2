package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.PandasTitle

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
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("pandas_title"),
      new ExpressionInfo("graft.functions.PandasTitle", null, "pandas_title",
        "pandas_title(str) - pandas-exact title case", ""),
      (es: Seq[Expression]) => PandasTitle(es.head)
    ))
    ext.injectOptimizerRule(_ => graft.functions.RewriteSetSizes)
  }
}
