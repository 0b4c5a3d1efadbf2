package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Derived-dimension operators.
  *
  * Reference semantics (/root/reference/airflow/dags/tasks/gold.py:38-39):
  *  - D1 hierarchical dimension: `local_completo = continente + ' > ' +
  *    região + ' > ' + local_de_assinatura`.
  *  - D2 composite dimension: `acordo_recurso = tipo_de_acordo + ' - ' +
  *    recursos`.
  *
  * pandas `+` with NaN propagates NaN, so these use `concat` (null-propagating)
  * and NOT `concat_ws` (which skips nulls and would silently change output).
  */
object Derive {

  /** D1 — "a > b > c" hierarchy path string; NULL if any level is NULL. */
  def hierarchy(levels: Seq[Column], sep: String = " > "): Column =
    concat(levels.flatMap(c => Seq(c, lit(sep))).dropRight(1): _*)

  /** D2 — "a - b" composite dimension; NULL if either side is NULL. */
  def composite(a: Column, b: Column, sep: String = " - "): Column =
    concat(a, lit(sep), b)
}
