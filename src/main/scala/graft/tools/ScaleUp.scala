package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up fixture generator: replicates a testdata directory K× with
  * consistent key-shifting, for scaling benches beyond the largest provided
  * SF (BENCH.md round-3 sf1 run = sf0.1 × 10).
  *
  * Semantics preserved so query SHAPES scale honestly:
  *  - dimension tables (region, nation) are NOT scaled — facts grow,
  *    dims stay dimension-sized, exactly like a real warehouse;
  *  - every foreign key is shifted by `copy × (max(key)+1)` on both sides,
  *    so join fan-outs scale linearly (copy i of orders joins copy i of
  *    customer, never cross-copy);
  *  - document text gets a per-copy rewrite of every second word (`w~i`),
  *    so copies are NOT near-duplicates of each other (cross-copy Jaccard
  *    ≈ 1/3 < the 0.5 operator threshold): the dedup family's output
  *    scales ~linearly instead of quadratically in the copy count, which
  *    is what a genuinely larger corpus looks like. n_chars is recomputed
  *    to stay consistent with the rewritten text;
  *  - embeddings get a small deterministic per-copy, per-dimension offset —
  *    copies are near but not identical vectors (identical vectors would
  *    make every pair-form's output explode ×K²);
  *  - events keep their source `ts` encoding untouched (historically
  *    int64-ns, now `timestamp[us]` — the Tables.events loader branches on
  *    the scanned dtype either way).
  */
object ScaleUp {

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/tmp/sf1")
    val k = args.lift(2).map(_.toInt).getOrElse(10)
    val dupConstant = args.lift(3).contains("dupconst")
    val spark = graft.GraftSession
      .builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    scale(spark, src, dst, k, dupConstant)
    spark.stop()
  }

  private def copies(spark: SparkSession, k: Int) =
    spark.range(k).select(col("id").cast("int").as("__copy"))

  /** Replicate `df` k×, shifting each column in `shiftCols` by
    * `copy × (max+1)` (one tiny agg per table computes the offsets).
    */
  private def replicate(df: DataFrame, k: Int, shiftCols: Seq[String],
                        edit: (DataFrame, org.apache.spark.sql.Column) => DataFrame =
                          (d, _) => d): DataFrame = {
    val spark = df.sparkSession
    val offsets: Map[String, Long] = if (shiftCols.isEmpty) Map.empty
    else df.select(shiftCols.map(c => max(col(c)).as(c)): _*)
      .collect()(0).getValuesMap[Long](shiftCols).map { case (c, m) => c -> (m + 1L) }
    val crossed = df.crossJoin(broadcast(copies(spark, k)))
    val shifted = shiftCols.foldLeft(crossed) { (d, c) =>
      d.withColumn(c, col(c) + col("__copy") * lit(offsets(c)))
    }
    // k output files per table: the naive replication inherits the SOURCE
    // file count, so a 10× fact table would land in 1-2 big files and cap
    // scan parallelism at 1-2 tasks — a fixture artifact a real lake at
    // this size doesn't have (measured: q1 scaled 13× instead of ~10×
    // until this split)
    edit(shifted, col("__copy")).drop("__copy").repartition(k)
  }

  /** `dupConstant = true` is the DUP-RATE-CONSTANT mode (round-12 verdict
    * item 6): the default clone fixture keeps ~1/3 cross-copy text overlap
    * and near-identical cross-copy embeddings, so every duplicate cluster
    * is K× denser and the pair-defined entries' TRUE output grows ~K² —
    * the slopes then measure the fixture, not the engine. A genuinely K×
    * larger corpus holds its duplicate RATE roughly constant, which this
    * mode reproduces:
    *  - documents: EVERY word of copy i > 0 gets the `~i` suffix — one
    *    per-copy tag shared by all words preserves each copy's INTERNAL
    *    similarity structure exactly (suffixing is a bijection on the
    *    vocabulary) while zeroing cross-copy n-gram/shingle overlap;
    *  - embeddings: copy i > 0 rides a per-copy ISOMETRY — a dimension
    *    permutation (odd multiplier mod the dim count — a bijection on
    *    Z/2^k) with deterministic sign flips — so within-copy cosines are
    *    preserved (same product multiset) while cross-copy cosines of the
    *    near-random base vectors land near 0, far below the 0.4 family
    *    threshold.
    * The media/audio dedup fixtures need no help from this mode: since
    * round 13 they derive their content from
    * `doc_id % Multimodal.dedupClassModulus(n)` — the class count scales
    * with the corpus (anchored at the sf0.1 group size), so identical
    * groups stay ~50 docs and true pair counts are linear in the corpus
    * at ANY scale (previously they saturated at 101 classes and pair
    * counts grew ~K²; recorded in BENCH.md).
    */
  def scale(spark: SparkSession, src: String, dst: String, k: Int,
            dupConstant: Boolean = false): Unit = {
    def write(name: String, df: DataFrame): Unit =
      df.write.mode("overwrite").parquet(s"$dst/$name.parquet")
    def read(name: String) = spark.read.parquet(s"$src/$name.parquet")

    write("region", read("region"))
    write("nation", read("nation"))
    write("customer", replicate(read("customer"), k, Seq("c_custkey")))
    write("supplier", replicate(read("supplier"), k, Seq("s_suppkey")))
    write("part", replicate(read("part"), k, Seq("p_partkey")))
    write("orders", replicate(read("orders"), k, Seq("o_orderkey", "o_custkey")))
    write("lineitem",
      replicate(read("lineitem"), k, Seq("l_orderkey", "l_partkey", "l_suppkey")))
    write("events", replicate(read("events"), k, Seq("event_id", "user_id")))
    val wordEdit =
      if (dupConstant) "(w, j) -> concat(w, '~', __copy)"
      else "(w, j) -> IF(j % 2 = 1, concat(w, '~', __copy), w)"
    write("documents", replicate(read("documents"), k, Seq("doc_id"),
      edit = (d, copy) => d
        .withColumn("text", when(copy === 0, col("text")).otherwise(
          array_join(expr(s"transform(split(text, ' '), $wordEdit)"), " ")))
        .withColumn("n_chars", length(col("text")).cast("long"))))
    val embedEdit =
      if (dupConstant)
        // per-copy isometry: dims permuted by an odd multiplier (bijective
        // mod a power of two) + hash-derived sign flips
        "transform(sequence(0, size(embedding) - 1), dd -> " +
          "CAST(element_at(embedding, pmod(dd * (2 * __copy + 3), size(embedding)) + 1) * " +
          "IF(pmod(hash(dd, __copy), 2) = 0, 1.0D, -1.0D) AS FLOAT))"
      else
        "transform(embedding, (x, dd) -> " +
          "CAST(x + (pmod(hash(vec_id, dd, __copy), 97) - 48) / 2000.0 AS FLOAT))"
    write("embeddings", replicate(read("embeddings"), k, Seq("vec_id"),
      edit = (d, copy) => d.withColumn("embedding",
        when(copy === 0, col("embedding")).otherwise(expr(embedEdit)))))
    println(s"[scaleup] wrote $dst at ${k}x of $src" +
      (if (dupConstant) " (dup-rate-constant mode)" else ""))
  }
}
