package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.{Dates, Normalize}

/** Bronze layer: raw ingested rows → normalized, date-parsed bronze table.
  *
  * Reference: /root/reference/airflow/dags/tasks/bronze.py:13-85. The Google
  * Sheets REST scan (bronze.py:22-44) is an out-of-scope connector; the
  * engine ingests any DataFrame (parquet/CSV/createDataFrame) with the raw
  * 13-column layout and applies the same transform chain:
  *
  *   1. P1 normalize column names (bronze.py:49-51)
  *   2. F7 parse `data_de_celebração`, `vigência` as dd/MM/yyyy,
  *      malformed → NULL (bronze.py:55-58)
  *   3. F2+F3 trim + truncate-255 on `título` (bronze.py:59-62 — NOTE: the
  *      reference guards on the unaccented name 'titulo' so its branch never
  *      fires; we implement the INTENDED behavior on the accented column,
  *      divergence pinned in BronzeSpec)
  *   4. F10 null normalization (bronze.py:66-68) — no-op in Spark.
  *
  * Empty-input guard (S3, bronze.py:40-41) is [[requireNonEmpty]] — call it
  * on ingest boundaries only; it runs a (cheap, limit-1) job.
  */
object Bronze {

  def requireNonEmpty(df: DataFrame, what: String): DataFrame = {
    if (df.isEmpty) throw new IllegalStateException(s"no data found in $what")
    df
  }

  /** The bronze transform: pure DataFrame => DataFrame, one fused projection. */
  def transform(raw: DataFrame): DataFrame = {
    val named = Normalize.normalizeColumnNames(raw)
    val dated = Dates.parseDateCols(named, Seq("data_de_celebração", "vigência"))
    dated.withColumn("título", substring(trim(col("título")), 1, 255))
  }
}
