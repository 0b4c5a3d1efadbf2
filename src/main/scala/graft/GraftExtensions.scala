package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.PandasTitle

/** SparkSessionExtensions hook: registers graft's native expressions at
  * session build time. Enable with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")`.
  *
  * Kept deliberately small: SURVEY.md §4 concludes Catalyst's built-in rules
  * (column pruning, predicate pushdown, CollapseProject, constant folding)
  * already cover every optimization the reference pipeline needs, so no
  * custom `Rule[LogicalPlan]`/`SparkStrategy` is injected — only scalar
  * function registration.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("pandas_title"),
      new ExpressionInfo("graft.functions.PandasTitle", null, "pandas_title",
        "pandas_title(str) - pandas-exact title case", ""),
      (es: Seq[Expression]) => PandasTitle(es.head)
    ))
  }
}
