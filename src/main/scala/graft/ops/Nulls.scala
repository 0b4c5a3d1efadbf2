package graft.ops

import org.apache.spark.sql.DataFrame

/** Null-handling operators.
  *
  * Reference semantics (/root/reference):
  *  - F9 null-fill constant: `.fillna('não informado')`,
  *    `airflow/dags/tasks/silver.py:39-52` (odd lines).
  *  - F6 value replace: `.replace('-', 'não informado')`, `silver.py:38-52`
  *    (even lines). Order matters in the reference: fill runs before replace;
  *    the composed [[fillAndReplace]] preserves that order.
  *  - F10 null normalization (`fillna(pd.NA)`, `bronze.py:66-68`) is a no-op
  *    in Spark (single NULL representation) — intentionally absent.
  *
  * Declared-vs-actual divergence: `silver.py:37` fills `continente` without
  * assigning the result (a reference bug — nulls survive). We implement the
  * *intended* semantics (fill applied), documented here and pinned by
  * `NullsSpec`.
  */
object Nulls {
  val NotInformed = "não informado"

  /** F9 — fill NULL with a constant on the given string columns. */
  def fillNotInformed(df: DataFrame, cols: Seq[String], value: String = NotInformed): DataFrame =
    df.na.fill(value, cols)

  /** F6 — replace a placeholder value ('-') with the constant. */
  def replaceDash(df: DataFrame, cols: Seq[String], value: String = NotInformed): DataFrame =
    df.na.replace(cols, Map("-" -> value))

  /** Reference silver chain: fill then replace (`silver.py:37-52`). */
  def fillAndReplace(df: DataFrame, cols: Seq[String], value: String = NotInformed): DataFrame =
    replaceDash(fillNotInformed(df, cols, value), cols, value)
}
