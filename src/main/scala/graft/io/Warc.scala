package graft.io

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (ISO 28500) container support — the canonical web-crawl format a
  * training-data pipeline ingests (Common-Crawl-shaped corpora ship as
  * WARC). No crawl fixtures exist in this container, so — the
  * [[graft.ext.Audio]] / PNG discipline — payloads are synthesized from
  * the documents table, but the ENCODE → bytes → PARSE path is the real
  * container codec both ways: a spec-correct record writer (version line,
  * named headers, `Content-Length`-delimited payload, CRLF CRLF record
  * terminator) and a strict streaming parser that honors `Content-Length`
  * (payloads may contain blank lines — the reason WARC is not splittable
  * on delimiters), skips non-`response` records (`warcinfo`, metadata),
  * and rejects malformed input loudly.
  *
  * Scale shape: one WARC stream per task (how crawlers shard output);
  * parse is a forward scan — map-only, zero shuffles. Whole-archive reads
  * go through Spark's `binaryFile` source; at 100 TB the unit of
  * parallelism is the archive file (Common Crawl ships ~1 GB segments),
  * which is exactly one task each.
  */
object Warc {

  /** One parsed record. */
  final case class WarcRecord(warc_type: String, target_uri: String,
                              content_length: Long, payload: Array[Byte])

  private val CRLF = "\r\n"

  /** Spec-correct record encoding: version line, headers, blank line,
    * exactly `Content-Length` payload bytes, blank-line terminator.
    */
  def writeRecord(out: java.io.OutputStream, warcType: String,
                  targetUri: String, recordId: String,
                  payload: Array[Byte]): Unit = {
    // header values must not break record framing (header injection)
    Seq(warcType, targetUri, recordId).foreach(v =>
      require(!v.exists(c => c == '\r' || c == '\n'),
        s"WARC header value contains CR/LF: '$v'"))
    val header = new StringBuilder()
      .append("WARC/1.0").append(CRLF)
      .append("WARC-Type: ").append(warcType).append(CRLF)
      .append("WARC-Record-ID: ").append(recordId).append(CRLF)
    if (targetUri.nonEmpty)
      header.append("WARC-Target-URI: ").append(targetUri).append(CRLF)
    header.append("Content-Length: ").append(payload.length).append(CRLF)
      .append(CRLF)
    out.write(header.toString.getBytes("US-ASCII"))
    out.write(payload)
    out.write((CRLF + CRLF).getBytes("US-ASCII"))
  }

  /** Strict streaming parse of one WARC stream: every record is consumed
    * (`Content-Length` bytes + CRLF CRLF), malformed input fails loudly.
    * Returns ALL records — callers filter by type ([[responses]]).
    */
  def parseStream(bytes: Array[Byte]): Iterator[WarcRecord] = new Iterator[WarcRecord] {
    private var pos = 0
    private def readLine(): String = {
      val start = pos
      while (pos + 1 < bytes.length &&
        !(bytes(pos) == '\r' && bytes(pos + 1) == '\n')) pos += 1
      require(pos + 1 < bytes.length, "WARC: unterminated header line")
      val s = new String(bytes, start, pos - start, "US-ASCII")
      pos += 2
      s
    }
    override def hasNext: Boolean = pos < bytes.length
    override def next(): WarcRecord = {
      val version = readLine()
      require(version.startsWith("WARC/"), s"WARC: bad version line '$version'")
      var warcType = ""; var uri = ""; var len = -1L
      var line = readLine()
      while (line.nonEmpty) {
        val i = line.indexOf(':')
        require(i > 0, s"WARC: malformed header '$line'")
        val (k, v) = (line.substring(0, i).trim, line.substring(i + 1).trim)
        k match {
          case "WARC-Type" => warcType = v
          case "WARC-Target-URI" => uri = v
          case "Content-Length" =>
            // guarded parse: a corrupt stream must fail the parser's ONE
            // contract exception, not leak NumberFormatException
            require(v.nonEmpty && v.forall(_.isDigit) && v.length <= 18,
              s"WARC: bad Content-Length '$v'")
            len = v.toLong
          case _ => // other headers (WARC-Record-ID, WARC-Date, …) — kept simple
        }
        line = readLine()
      }
      require(len >= 0, "WARC: record without Content-Length")
      require(pos + len + 4 <= bytes.length, "WARC: payload overruns stream")
      val payload = java.util.Arrays.copyOfRange(bytes, pos, pos + len.toInt)
      pos += len.toInt
      require(bytes(pos) == '\r' && bytes(pos + 1) == '\n' &&
        bytes(pos + 2) == '\r' && bytes(pos + 3) == '\n',
        "WARC: record not CRLF CRLF terminated")
      pos += 4
      WarcRecord(warcType, uri, len, payload)
    }
  }

  /** Synthesize one WARC stream per partition from the documents table
    * (crawler sharding), each stream led by a `warcinfo` record the
    * response reader must skip, then parse it straight back — the
    * round-trip registry entry's body. Deterministic: record ids derive
    * from doc ids, never RNG.
    */
  def roundTrip(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val bos = new java.io.ByteArrayOutputStream()
        writeRecord(bos, "warcinfo", "", "<urn:graft:warcinfo>",
          "software: graft-warc-demo".getBytes("UTF-8"))
        var n = 0
        it.foreach { case (id, text) =>
          writeRecord(bos, "response", s"https://corpus.example/doc/$id",
            s"<urn:graft:doc:$id>", text.getBytes("UTF-8"))
          n += 1
        }
        if (n == 0) Iterator.empty
        else parseStream(bos.toByteArray).filter(_.warc_type == "response")
          .map { r =>
            val id = r.target_uri.substring(r.target_uri.lastIndexOf('/') + 1).toLong
            val s = new String(r.payload, "UTF-8")
            // code POINTS, not UTF-16 units — the cross-engine convention
            // (DuckDB length() counts code points)
            (id, r.content_length, s.codePointCount(0, s.length))
          }
      }
      .toDF("doc_id", "content_length", "payload_chars")
  }

  /** Write real .warc files (one per partition) under `dir` via the
    * Hadoop filesystem API — executor-side, cluster-correct.
    */
  def writeArchives(docs: DataFrame, dir: String): Unit = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        if (!it.hasNext) Iterator.empty
        else {
          val bos = new java.io.ByteArrayOutputStream()
          writeRecord(bos, "warcinfo", "", "<urn:graft:warcinfo>",
            "software: graft-warc-demo".getBytes("UTF-8"))
          var first = Long.MaxValue
          it.foreach { case (id, text) =>
            first = math.min(first, id)
            writeRecord(bos, "response", s"https://corpus.example/doc/$id",
              s"<urn:graft:doc:$id>", text.getBytes("UTF-8"))
          }
          val conf = new org.apache.hadoop.conf.Configuration()
          val p = new org.apache.hadoop.fs.Path(s"$dir/part-$first.warc")
          val fs = p.getFileSystem(conf)
          val out = fs.create(p, true)
          out.write(bos.toByteArray); out.close()
          Iterator.single(1)
        }
      }.write.mode("overwrite").format("noop").save()
  }

  /** Read .warc archives: `binaryFile` source (one task per archive — the
    * Common Crawl unit of parallelism), streaming parse, responses only.
    */
  def readArchives(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(s"$dir/*.warc")
      .select(col("content"))
      .as[Array[Byte]]
      .mapPartitions(_.flatMap(bytes =>
        parseStream(bytes).filter(_.warc_type == "response")
          .map(r => (r.target_uri, r.content_length,
            new String(r.payload, "UTF-8")))))
      .toDF("target_uri", "content_length", "text")
  }
}
