package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SimHash near-duplicate fingerprinting (64-bit).
  *
  * Per document: hash every token to 64 bits (xxhash64); bit i of the
  * simhash is 1 iff the count of tokens with bit i set exceeds half the
  * token count (the ±1-weighted-sum sign, rewritten counting-style so the
  * whole thing is integer arithmetic inside one columnar expression).
  *
  * Pair search uses the pigeonhole banding trick: for hamming distance ≤ 3,
  * at least one of 4 16-bit chunks must be identical, so candidates come
  * from ONE shuffle (groupBy chunk value) instead of an O(n²) cross join —
  * same scale shape as [[MinHashDedup]].
  */
object SimHash {

  /** Signature via the native [[graft.functions.SimHash64]] expression —
    * one pass over the tokens, ±1 counting per bit in a primitive loop (the
    * pure-SQL 64-lambda formulation re-hashed every token per bit and
    * measured ~10× slower).
    */
  def signatures(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame =
    docs.select(col(idCol),
      graft.functions.GraftFunctions.simhash64(split(col(textCol), " ")).as("simhash"))

  /** Pairs with hamming(simhash_a, simhash_b) ≤ maxDist (≤ 3 for exactness
    * of the 4-chunk pigeonhole; larger maxDist turns this into a recall<1
    * approximation, which is the standard trade at scale).
    */
  def nearDuplicates(docs: DataFrame, maxDist: Int = 3,
                     idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sigs = signatures(docs, idCol, textCol)
    val chunked = sigs.select(col(idCol), col("simhash"),
      explode(expr("""transform(sequence(0, 3),
        c -> struct(c AS chunk_id, (shiftright(simhash, c * 16) & 65535) AS chunk_val))""")).as("ch"))
      .select(col(idCol), col("simhash"), col("ch.chunk_id"), col("ch.chunk_val"))

    val left  = chunked.select(col("chunk_id"), col("chunk_val"),
      col(idCol).as("doc_a"), col("simhash").as("sh_a"))
    val right = chunked.select(col("chunk_id"), col("chunk_val"),
      col(idCol).as("doc_b"), col("simhash").as("sh_b"))

    left.join(right, Seq("chunk_id", "chunk_val"))
      .filter(col("doc_a") < col("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxDist)
      .select("doc_a", "doc_b", "hamming")
  }
}
