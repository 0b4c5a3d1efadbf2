package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native md5-twin kernels (Md5Twin — digest bytes read directly) must
  * be value-identical to the definitional SQL forms the DuckDB oracles
  * mirror (md5 → hex → substr → conv). Each test runs BOTH forms over the
  * same frame and asserts per-row equality, including unicode/astral
  * tokens (UTF-8 byte hashing), empty strings, single-element arrays, and
  * the corpus fixture itself.
  */
class Md5TwinKernelSpec extends SparkSpec {
  import spark.implicits._

  private val fixtures = Seq(
    Seq("the quick fox", "fox jumps over", "über die brücke"),
    Seq(""),                                  // md5 of the empty string
    Seq("a"),                                 // single shingle
    Seq("😀 astral 🤖"),  // surrogate pairs (UTF-8 bytes)
    Seq("dup", "dup", "dup"),                 // repeated values
    (1 to 64).map(i => s"tok$i word${i % 5} x$i"),
    Seq.empty[String]
  )

  /** The replaced SQL signature form, verbatim. */
  private def sqlMinhashSigs(h: Int) = expr(s"""transform(sequence(0, ${h - 1}),
      i -> array_min(transform(transform(shingles, s -> struct(
        cast(conv(substr(md5(s), 1, 15), 16, 10) as bigint) % 2147483647 AS h1,
        cast(conv(substr(md5(s), 16, 15), 16, 10) as bigint) % 2147483647 AS h2)),
      p -> (p.h1 + i * p.h2) % 2147483647)))""")

  /** The replaced SQL simhash form, verbatim. */
  private val sqlSimhash60 = expr("""
    aggregate(sequence(0, 59), cast(0 as bigint), (acc, b) ->
      acc + IF(2 * size(filter(transform(ws, t ->
                 cast(conv(substr(md5(t), 1, 15), 16, 10) as bigint)),
               h -> (shiftright(h, b) & 1) = 1)) > size(ws),
               shiftleft(cast(1 as bigint), b), cast(0 as bigint)))""")

  test("md5_minhash_sigs == the definitional SQL on edge-case arrays") {
    val df = fixtures.toDF("shingles")
    val got = df.select(
      GraftFunctions.md5_minhash_sigs(col("shingles"), 16).as("native"),
      sqlMinhashSigs(16).as("ref")).collect()
    got.foreach(r => assert(r.get(0) === r.get(1), r.toString))
  }

  test("md5_simhash60 == the definitional SQL on edge-case token arrays") {
    val df = fixtures.filter(_.nonEmpty).toDF("ws") // SQL form: 2*0 > 0 false, empty ok too
    val got = df.select(
      GraftFunctions.md5_simhash60(col("ws")).as("native"),
      sqlSimhash60.as("ref")).collect()
    got.foreach(r => assert(r.getLong(0) === r.getLong(1), r.toString))
  }

  test("signaturesMd5 twins unchanged on the sf0.001 corpus (both families)") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    // MinHash: native-kernel path vs the SQL form applied to the same sets
    val sets = graft.ext.MinHashDedup.shingleSetsMd5(docs)
    val mh = graft.ext.MinHashDedup.signaturesMd5(docs)
      .select(col("doc_id"), col("sigs"))
      .join(sets.select(col("doc_id"), sqlMinhashSigs(16).as("ref")), Seq("doc_id"))
      .filter(not(col("sigs") === col("ref")))
    assert(mh.count() === 0L)
    // SimHash: native-kernel path vs the SQL form over the same tokens
    val sh = graft.ext.SimHash.signaturesMd5(docs)
      .join(docs.filter(col("text").isNotNull)
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .select(col("doc_id"), sqlSimhash60.as("ref")), Seq("doc_id"))
      .filter(col("simhash") =!= col("ref"))
    assert(sh.count() === 0L)
  }
}
