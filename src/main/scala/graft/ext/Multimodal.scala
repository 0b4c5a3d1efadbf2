package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque `binary`
  * columns with typed metadata, processed per-partition in batches.
  *
  * The Spark-side shape is real and tested: schema, partition-preserving
  * batch iteration (the Scala analog of `mapInPandas` — a typed
  * `mapPartitions` over an iterator of records, so decode libraries amortize
  * per-batch setup), and deterministic output schema. The actual media
  * decode is STUBBED ([[fakeDecode]]) — no image/audio libraries exist in
  * this container — with a clearly-marked deterministic fake so the
  * pipeline stays testable end-to-end. Swapping in a real decoder changes
  * only the body of [[fakeDecode]].
  */
object Multimodal {

  /** One media record as carried through the pipeline. */
  final case class MediaRecord(media_id: Long, payload: Array[Byte],
                               media_type: String)

  /** Extracted features (what a real decoder would emit). */
  final case class MediaFeatures(media_id: Long, n_bytes: Long,
                                 media_type: String, width: Int, height: Int,
                                 feature: Array[Float])

  /** STUB decode: a real implementation would decode the payload with an
    * image/audio codec. This deterministic fake derives pseudo-dimensions
    * and a tiny feature vector from the bytes themselves so tests can
    * assert exact values.
    */
  def fakeDecode(r: MediaRecord): MediaFeatures = {
    val n = r.payload.length.toLong
    var h = 1125899906842597L // FNV-ish fold; deterministic, no RNG
    r.payload.foreach(b => h = h * 31 + b)
    val feat = Array.tabulate(4)(i => ((h >>> (i * 8)) & 0xff).toFloat / 255f)
    MediaFeatures(r.media_id, n, r.media_type,
      width = (math.abs(h) % 640).toInt, height = (math.abs(h) % 480).toInt,
      feature = feat)
  }

  /** The mapInPandas-shaped batch transform: per-partition iterator in,
    * iterator out; decoder state initialized once per partition (where a
    * real codec context would be allocated), rows never collected.
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition decoder init would go here
      it.map(fakeDecode)
    }
  }

  /** Build a media table from the documents table (text bytes standing in
    * for real payloads — the container ships no media fixtures).
    */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      concat(lit("text/plain;len="), length(col("text"))).as("media_type"))
      .as[MediaRecord]
  }
}
