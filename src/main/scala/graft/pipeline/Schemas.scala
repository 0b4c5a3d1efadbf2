package graft.pipeline

import org.apache.spark.sql.types._

/** Canonical schemas for the acordos domain.
  *
  * Source of truth: the `expected_headers` fallback at
  * /root/reference/airflow/dags/tasks/bronze.py:33-35, names normalized
  * lowercase + underscores (`bronze.py:49-51`). Unicode accents are preserved
  * (`título`, `região`, `vigência`) — they round-trip through parquet and
  * must be double-quoted in oracle SQL.
  */
object Schemas {

  /** Raw sheet columns, pre-normalization (header row as published). */
  val rawHeaders: Seq[String] = Seq(
    "Data de Celebração", "Parceiro", "Tipo de Parceiro", "Continente",
    "Região", "Local de Assinatura", "Tipo de Acordo", "Título", "Objetivo",
    "Recursos", "Tipo de Documento", "Vigência", "Link")

  /** Bronze: all 13 columns as strings (dates still unparsed text, as they
    * arrive from the sheet; bronze parses them in place, bronze.py:55-58).
    */
  val bronzeRaw: StructType = StructType(
    rawHeaders.map(h => StructField(graft.ops.Normalize.normalizeName(h), StringType)))

  /** Bronze after date parsing: the two date columns become DateType. */
  val bronze: StructType = StructType(bronzeRaw.map {
    case f if f.name == "data_de_celebração" || f.name == "vigência" =>
      f.copy(dataType = DateType)
    case f => f
  })

  /** Silver projection (silver.py:72): 10 text cols + ano. */
  val silverTextCols: Seq[String] = Seq(
    "parceiro", "tipo_de_parceiro", "continente", "região",
    "local_de_assinatura", "tipo_de_acordo", "título", "objetivo",
    "recursos", "tipo_de_documento")

  val silver: StructType = StructType(
    silverTextCols.map(StructField(_, StringType)) :+ StructField("ano", IntegerType))

  /** Columns the silver null-fill/replace chain touches (silver.py:37-52). */
  val silverFillCols: Seq[String] = Seq(
    "continente", "região", "local_de_assinatura", "tipo_de_acordo",
    "objetivo", "recursos", "tipo_de_documento", "parceiro", "tipo_de_parceiro")
}
