package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator registry (one entry per implemented
  * operator from SURVEY.md §2 + extensions); `oracleSql` carries the
  * DuckDB-equivalent SQL for every SQL-expressible entry. Column names and
  * aliases are kept identical on both sides (the driver's compare sorts
  * columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Runs the reference's densest operator chain (the silver clean) against
    * the orders stand-in table.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("ref_silver_clean")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.RefParity.queries ++
      graft.queries.TpchCore.queries ++
      graft.queries.EventsQueries.queries ++
      graft.queries.Breadth.queries ++
      graft.queries.Extensions.queries ++
      graft.queries.WebPipeline.queries ++
      graft.queries.TokenizerQueries.queries

  def oracleSql: Map[String, String] =
    graft.queries.RefParity.oracleSql ++
      graft.queries.TpchCore.oracleSql ++
      graft.queries.EventsQueries.oracleSql ++
      graft.queries.Breadth.oracleSql ++
      graft.queries.Extensions.oracleSql ++
      graft.queries.WebPipeline.oracleSql ++
      graft.queries.TokenizerQueries.oracleSql
}
