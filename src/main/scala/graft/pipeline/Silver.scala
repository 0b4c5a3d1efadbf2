package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.ops.{Dedup, Nulls}

/** Silver layer: bronze → cleaned, deduplicated silver table.
  *
  * Reference: /root/reference/airflow/dags/tasks/silver.py:11-89.
  *
  *   1. F9+F6 fill NULL → 'não informado', replace '-' → 'não informado' on
  *      9 columns (silver.py:37-52; the unassigned fill on `continente` at
  *      silver.py:37 is a reference bug — we implement the intended fill,
  *      see [[graft.ops.Nulls]])
  *   2. F2+F4 trim + pandas-title-case on 10 text columns (silver.py:56-65)
  *   3. F8 ano = year(data_de_celebração) (silver.py:69)
  *   4. P2+P5 project 11 cols + dropDuplicates (silver.py:72)
  *
  * The whole chain is three projections that Catalyst collapses into ONE
  * whole-stage-codegen pass, followed by a single hash-aggregate dedup —
  * versus the reference's ~21 sequential full-frame pandas passes.
  */
object Silver {

  def transform(bronze: DataFrame): DataFrame = {
    val filled  = Nulls.fillAndReplace(bronze, Schemas.silverFillCols)
    val cleaned = filled.withColumns(
      Schemas.silverTextCols.map(c => c -> GraftFunctions.pandas_title(trim(col(c)))).toMap)
    val withAno = cleaned.withColumn("ano", year(col("data_de_celebração")))
    Dedup.distinctAll(
      withAno.select(Schemas.silverTextCols.map(col) :+ col("ano"): _*))
  }
}
