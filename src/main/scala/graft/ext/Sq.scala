package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalar (per-dimension int8) quantization for embedding columns — the
  * simplest member of the compressed-vector family next to [[Pq]]: each
  * dimension is linearly mapped to an 8-bit code against a per-dimension
  * trained range, so a 64-dim float32 vector (256 B) becomes 64 bytes — a
  * 4× scan-size reduction with NO codebook join at probe time (PQ's 32×
  * costs m LUT lookups per row; SQ dequantizes inline in the same codegen
  * span as the scan). At 100 TB the code column is what a re-rank shortlist
  * or a filter pass reads instead of the float column; the probe is one
  * narrow map-only pass over codes plus a per-query top-k.
  *
  * Model state is 2·d doubles (per-dimension lower bound + span) — driver
  * state in the IVF/PQ/probe class, never growing with the corpus.
  *
  * Determinism contract (what makes the family DuckDB-oracle-able given the
  * trained range literals): codes are `floor((x − lo)·255 / span)` clamped
  * to [0, 255] in IEEE double arithmetic (both engines correctly round each
  * op, so the results are bit-identical); dequantization is
  * `lo + code·span / 255` in that exact operation order; cosine scoring
  * reuses [[Similarity.cosine]]'s fold (`dot / ‖a‖ / ‖b‖`, round 6).
  * Zero-width dimensions train `span = 1` so encode yields 0 exactly and
  * dequantization returns `lo` — no division hazard on constant dims.
  */
object Sq {

  /** Trained per-dimension ranges. `span(i) = max(hi_i − lo_i, 1)` — the
    * guarded width both engines embed as literals.
    */
  final case class SqModel(lo: Array[Double], span: Array[Double]) {
    def d: Int = lo.length
    private def arr(a: Array[Double]): String =
      a.map { x =>
        // Inf/NaN render as "InfinityD"/"NaND" — not SQL; fail at the
        // literal so a poisoned range can't break codegen opaquely
        require(java.lang.Double.isFinite(x),
          s"SqModel: non-finite range value $x cannot be inlined as SQL")
        java.lang.Double.toString(x) + "D"
      }.mkString("array(", ", ", ")")
    /** Spark SQL literal arrays (`array(…D, …)`), inlined into codegen. */
    def loArr: String = arr(lo)
    def spanArr: String = arr(span)
  }

  /** One distributed pass: per-dimension min/max. The explode widens rows
    * ×d but the partial aggregation combines map-side onto d keys, so the
    * exchange carries d rows per task — model-state-sized, never data.
    */
  def sqTrain(corpus: DataFrame, idCol: String = "vec_id",
              vecCol: String = "embedding"): SqModel = {
    val stats = corpus
      .select(posexplode(col(vecCol).cast("array<double>")).as(Seq("dim", "x")))
      .groupBy(col("dim")).agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
      .collect() // d rows — model state, bounded by the dimension
    require(stats.nonEmpty, "sqTrain: empty corpus")
    val d = stats.map(_.getInt(0)).max + 1
    val lo = new Array[Double](d)
    val span = new Array[Double](d)
    val seen = new Array[Boolean](d)
    stats.foreach { r =>
      val i = r.getInt(0)
      // an all-NULL dimension aggregates to NULL min/max — getDouble would
      // NPE three lines from the cause; name the dimension instead
      require(!r.isNullAt(1) && !r.isNullAt(2),
        s"sqTrain: dimension $i has no non-null values — the embedding " +
          "column carries NULL entries at this position for every vector")
      lo(i) = r.getDouble(1)
      val s = r.getDouble(2) - lo(i)
      span(i) = if (s > 0) s else 1.0
      seen(i) = true
    }
    // ragged vectors: a dim index absent from stats would silently keep
    // lo=0/span=0 and sqEncode would divide by zero row-side
    val missing = seen.indices.filterNot(seen)
    require(missing.isEmpty,
      s"sqTrain: dimensions ${missing.mkString(",")} absent from the corpus " +
        s"(ragged embedding arrays — expected every vector to have $d dims)")
    SqModel(lo, span)
  }

  /** `(n_id, codes array<int>)` — the 64-byte column a serving scan reads.
    * Map-only; the transform is one codegen span fused with the scan.
    */
  def sqEncode(corpus: DataFrame, model: SqModel, idCol: String = "vec_id",
               vecCol: String = "embedding"): DataFrame =
    corpus.select(col(idCol).as("n_id"),
      expr(s"""transform(CAST($vecCol AS array<double>), (x, i) ->
        CAST(least(255L, greatest(0L, floor((x - element_at(${model.loArr}, i + 1)) * 255D
          / element_at(${model.spanArr}, i + 1)))) AS INT))""").as("codes"))

  /** Dequantized reconstruction of the `codes` column — `lo + code·span/255`
    * per dimension, the exact operation order the oracle mirrors.
    */
  def dequant(model: SqModel, codesCol: String = "codes"): Column =
    expr(s"""transform($codesCol, (cd, i) ->
      element_at(${model.loArr}, i + 1)
        + CAST(cd AS DOUBLE) * element_at(${model.spanArr}, i + 1) / 255D)""")

  /** Approximate top-k: queries broadcast, ONE narrow pass over the code
    * column (vectors never read), per-query rank. Same output shape and
    * tiebreaks as [[Similarity.bruteForceTopK]].
    */
  def sqProbe(codes: DataFrame, model: SqModel, queries: DataFrame, k: Int = 10,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("q_id"),
      col(vecCol).cast("array<double>").as("q_vec"))
    val scored = codes.select(col("n_id"), dequant(model).as("xh"))
      .crossJoin(broadcast(q))
      .filter(col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"),
        Similarity.cosine(col("xh"), col("q_vec")).as("cos"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    scored.withColumn("rk", row_number().over(w).cast("int")).filter(col("rk") <= k)
      .select(col("q_id"), col("n_id"), col("cos"), col("rk"))
  }
}
