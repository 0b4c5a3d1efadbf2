package graft

import org.apache.spark.sql.types.{LongType, TimestampType}

/** Schema-drift guard for the driver's testdata contract.
  *
  * Round 6 lost 18 registry entries because the testdata silently changed
  * `events.ts` from ns-int64 to `timestamp[us]` and the loader's analysis
  * error surfaced nowhere. This spec touches every `Tables.*` loader against
  * the shipped sf0.001 data — an `df.schema` access forces analysis, and a
  * 1-row action forces a real scan — so the next driver-side drift turns
  * into a red unit test instead of a vanished correctness family.
  */
class TablesSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"
  private def available = new java.io.File(sfDir).isDirectory

  private val loaders: Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)] =
    Seq(
      "region"     -> Tables.region _,
      "nation"     -> Tables.nation _,
      "customer"   -> Tables.customer _,
      "supplier"   -> Tables.supplier _,
      "part"       -> Tables.part _,
      "orders"     -> Tables.orders _,
      "lineitem"   -> Tables.lineitem _,
      "events"     -> Tables.events _,
      "documents"  -> Tables.documents _,
      "embeddings" -> Tables.embeddings _
    )

  test("every Tables loader analyzes and scans the shipped testdata") {
    assume(available, s"$sfDir not present")
    loaders.foreach { case (name, load) =>
      val df = load(spark, sfDir)
      assert(df.schema.nonEmpty, s"$name: empty schema")
      assert(df.limit(1).count() == 1, s"$name: no rows scanned")
    }
  }

  test("events.ts lands as a session-zoned microsecond TIMESTAMP") {
    assume(available, s"$sfDir not present")
    val ts = Tables.events(spark, sfDir).schema("ts")
    assert(ts.dataType == TimestampType,
      s"events.ts must load as TIMESTAMP for oracle-identical semantics, got ${ts.dataType}")
    assert(ts.dataType != LongType)
  }
}
