package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (ISO 28500) source & sink — the web-archive format crawl
  * corpora ship in (Common Crawl and company). From-scratch, zero
  * external codecs (the XLSX-reader discipline): the writer emits
  * strict WARC/1.0 records, the reader is a strict record walk.
  *
  * Writer: each record is ONE row through Spark's native text sink —
  * fully parallel, one part file per partition, and the record string
  * is framed so the sink's single row-terminating LF completes the
  * final `\r\n\r\n` record separator byte-exactly (the row value ends
  * `…payload\r\n\r`). Records carry WARC-Type/Record-ID/Target-URI/
  * Date/Content-Length; the date is a fixed literal so output bytes
  * are deterministic. Uncompressed by design: per-member gzip would
  * make files the split unit anyway, and these are synthetic-corpus
  * volumes.
  *
  * Reader: `binaryFile` datasource — files are the split unit, the
  * standard WARC posture (gzip members don't split; parallelism comes
  * from file count, which a crawl supplies in the thousands) — then a
  * strict walk per file: parse the header block, read EXACTLY
  * Content-Length payload bytes, require the separator. Anything
  * malformed throws; a WARC reader that silently resyncs hides
  * truncation.
  *
  * Gzip (round 15): real crawl data ships `.warc.gz` — a CONCATENATION
  * of gzip members (one per record in Common Crawl practice, one per
  * file from simpler writers; both are legal gzip streams). The reader
  * sniffs the two magic bytes per file and inflates ALL members
  * (JDK `GZIPInputStream`, zero dependencies) before the same strict
  * record walk, so member granularity is irrelevant to correctness.
  * Files stay the split unit either way — gzip members don't split,
  * and crawl parallelism comes from file count. One caveat inherited
  * from the JDK: trailing bytes after the last VALID member that do
  * not start a gzip header are dropped by `GZIPInputStream` rather
  * than thrown on; the strict record walk still catches any
  * truncation that cuts a record.
  */
object Warc {

  private val FixedDate = "2026-01-01T00:00:00Z"

  /** Write (url, payload) rows as WARC/1.0 response records. */
  def write(df: DataFrame, dir: String, urlCol: String,
      payloadCol: String): Unit =
    df.select(concat(
        lit("WARC/1.0\r\n"),
        lit("WARC-Type: response\r\n"),
        lit("WARC-Record-ID: <urn:graft:"), col(urlCol), lit(">\r\n"),
        lit("WARC-Target-URI: "), col(urlCol), lit("\r\n"),
        lit(s"WARC-Date: $FixedDate\r\n"),
        lit("Content-Length: "),
        octet_length(col(payloadCol)).cast("string"), lit("\r\n\r\n"),
        col(payloadCol), lit("\r\n\r")).as("value"))
      .write.mode("overwrite").text(dir)

  /** [[write]], gzip-compressed: same record framing through the text
    * sink's gzip codec — each part file is ONE gzip member, a legal
    * `.warc.gz` stream any sequential WARC reader (including [[read]])
    * accepts. Per-RECORD members (the Common Crawl shape, for
    * record-level random access) are a writer refinement the reader
    * already handles — it inflates all members per file.
    */
  def writeGzip(df: DataFrame, dir: String, urlCol: String,
      payloadCol: String): Unit =
    df.select(concat(
        lit("WARC/1.0\r\n"),
        lit("WARC-Type: response\r\n"),
        lit("WARC-Record-ID: <urn:graft:"), col(urlCol), lit(">\r\n"),
        lit("WARC-Target-URI: "), col(urlCol), lit("\r\n"),
        lit(s"WARC-Date: $FixedDate\r\n"),
        lit("Content-Length: "),
        octet_length(col(payloadCol)).cast("string"), lit("\r\n\r\n"),
        col(payloadCol), lit("\r\n\r")).as("value"))
      .write.mode("overwrite").option("compression", "gzip").text(dir)

  /** Read a WARC directory back as (warc_file, url, payload, n_bytes).
    * One flatMap per file — narrow, no shuffle. Gzip files (sniffed
    * per file by magic bytes) are inflated across ALL members first.
    */
  def read(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(dir + "/part-*")
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val file = path.substring(path.lastIndexOf('/') + 1)
        parseRecords(bytes).map { case (url, payload, n) =>
          (file, url, payload, n)
        }
      }
      .toDF("warc_file", "url", "payload", "n_bytes")
  }

  /** Streaming twin of [[read]]: watch `dir` for newly-landed WARC
    * files (the shape a crawler actually produces — a directory that
    * grows by whole files) and emit each file's records exactly once.
    * Same strict per-file walk; files remain the split unit, so a
    * micro-batch parallelizes over the files it picked up.
    */
  def readStream(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.readStream.format("binaryFile")
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("path",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("modificationTime",
          org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("length",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("content",
          org.apache.spark.sql.types.BinaryType))))
      .load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val file = path.substring(path.lastIndexOf('/') + 1)
        parseRecords(bytes).map { case (url, payload, n) =>
          (file, url, payload, n)
        }
      }
      .toDF("warc_file", "url", "payload", "n_bytes")
  }

  /** All-members gzip inflate: JDK `GZIPInputStream` natively walks
    * concatenated members, so per-record and per-file member layouts
    * both come back as one byte stream.
    */
  private[graft] def gunzipAll(b: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(b), 64 * 1024)
    val out = new java.io.ByteArrayOutputStream(
      math.max(64, b.length * 4))
    val buf = new Array[Byte](64 * 1024)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }

  private def isGzip(b: Array[Byte]): Boolean =
    b.length >= 2 && (b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b

  /** Strict WARC/1.0 record walk over one file's bytes; gzip files
    * are inflated (all members) first.
    */
  private[graft] def parseRecords(
      raw: Array[Byte]): Seq[(String, String, Long)] = {
    val b = if (isGzip(raw)) gunzipAll(raw) else raw
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var i = 0
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"malformed WARC at byte $i: $msg")
    def line(): String = {
      var j = i
      while (j + 1 < b.length && !(b(j) == '\r' && b(j + 1) == '\n')) j += 1
      if (j + 1 >= b.length) fail("unterminated header line")
      val s = new String(b, i, j - i, "UTF-8")
      i = j + 2
      s
    }
    while (i < b.length) {
      if (line() != "WARC/1.0") fail("missing WARC/1.0 version line")
      val headers = scala.collection.mutable.Map.empty[String, String]
      var h = line()
      while (h.nonEmpty) {
        val sep = h.indexOf(": ")
        if (sep < 0) fail(s"bad header '$h'")
        headers(h.substring(0, sep)) = h.substring(sep + 2)
        h = line()
      }
      val len = headers.getOrElse("Content-Length",
        fail("missing Content-Length")).toInt
      val url = headers.getOrElse("WARC-Target-URI",
        fail("missing WARC-Target-URI"))
      if (i + len + 4 > b.length) fail("truncated payload")
      val payload = new String(b, i, len, "UTF-8")
      i += len
      if (!(b(i) == '\r' && b(i + 1) == '\n' &&
            b(i + 2) == '\r' && b(i + 3) == '\n'))
        fail("missing record separator")
      i += 4
      out += ((url, payload, len.toLong))
    }
    out.toSeq
  }
}
