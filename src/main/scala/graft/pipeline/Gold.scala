package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.ops.{Dedup, Derive}

/** Gold layer: silver → 4 analytics outputs.
  *
  * Reference: /root/reference/airflow/dags/tasks/gold.py:11-68.
  *
  *   - `local_completo` = continente > região > local_de_assinatura (D1,
  *     gold.py:38); `acordo_recurso` = tipo_de_acordo - recursos (D2, :39).
  *     Null-propagating concat, matching pandas `+` with NaN.
  *   - `gld_pais` / `gld_org`: equality filters on tipo_de_parceiro (P4,
  *     gold.py:42-43) over the derived frame, projected to the two derived
  *     columns (P3, gold.py:56-58).
  *   - `gld_acordos`: the silver 11-column projection, distinct (gold.py:51).
  *
  * The reference computes ALL of this 4× (one identical Airflow task per
  * output, dag_main.py:62-77 + gold.py:54-59). Here the derived frame is
  * computed once and persisted (MEMORY_AND_DISK) before fan-out to the four
  * outputs — compute once, write four sinks.
  */
object Gold {

  final case class Outputs(acordos: DataFrame, hier: DataFrame,
                           pais: DataFrame, org: DataFrame)

  def derive(silver: DataFrame): DataFrame =
    silver
      .withColumn("local_completo",
        Derive.hierarchy(Seq(col("continente"), col("região"), col("local_de_assinatura"))))
      .withColumn("acordo_recurso",
        Derive.composite(col("tipo_de_acordo"), col("recursos")))

  def transform(silver: DataFrame, persist: Boolean = true): Outputs = {
    val hier = derive(silver)
    val h = if (persist) hier.persist(StorageLevel.MEMORY_AND_DISK) else hier
    val twoCols = Seq(col("local_completo"), col("acordo_recurso"))
    Outputs(
      acordos = Dedup.distinctAll(silver),
      hier    = h.select(twoCols: _*),
      pais    = h.filter(col("tipo_de_parceiro") === "País").select(twoCols: _*),
      org     = h.filter(col("tipo_de_parceiro") === "Organização").select(twoCols: _*))
  }
}
