package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` classic-Spark internals so graft's native
  * Catalyst expressions can be wrapped as user-facing `Column`s. This is the
  * standard extension-library pattern for Spark 4's classic/connect split:
  * `org.apache.spark.sql.classic.ExpressionUtils` is the supported internal
  * conversion, only name-visible from inside the `org.apache.spark.sql`
  * package hierarchy.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
