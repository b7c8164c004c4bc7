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
  * are deterministic.
  *
  * Reader: RECORD-STREAMING (round 16 — VERDICT r15 task 1). Files
  * are the split unit, the standard WARC posture (gzip members don't
  * split; parallelism comes from file count, which a crawl supplies
  * in the thousands), but within a file the walk is an
  * [[WarcRecordIterator]] over a chunked stream: header lines are
  * read byte-at-a-time off a buffered (and, for `.warc.gz`,
  * inflating) stream, EXACTLY Content-Length payload bytes are read
  * per record, and the record is emitted before the next is touched.
  * Peak task memory is ∝ the LARGEST RECORD, never the file — a real
  * ~1 GB `.warc.gz` cut (≈5 GB inflated) streams through a fixed
  * 64 KiB buffer, where a whole-file inflate would hold file +
  * inflated + payload copies and hard-cap at a 2 GiB JVM array. The
  * batch path reads via `sc.binaryFiles`' `PortableDataStream` (an
  * HDFS-seekable handle — bytes are pulled as consumed, NOT
  * materialized). Anything malformed throws; a WARC reader that
  * silently resyncs hides truncation. Single records above ~2 GiB are
  * refused explicitly (JVM array addressing) — no archived HTTP
  * payload legitimately reaches that. Structural record types —
  * `warcinfo` (which LEADS every real Common Crawl file and has no
  * Target-URI), `request`, `metadata`, `revisit` — are
  * framing-checked and SKIPPED; only `response`/`resource` content
  * records become rows. WARC/1.0 and WARC/1.1 version lines are both
  * accepted.
  *
  * Gzip: real crawl data ships `.warc.gz` — a CONCATENATION of gzip
  * members (one per record in Common Crawl practice, one per file
  * from simpler writers; both are legal gzip streams). The reader
  * sniffs the two magic bytes per file and inflates through JDK
  * `GZIPInputStream`, which natively walks concatenated members, so
  * member granularity is irrelevant to correctness. One caveat
  * inherited from the JDK: trailing bytes after the last VALID member
  * that do not start a gzip header are dropped by `GZIPInputStream`
  * rather than thrown on; the strict record walk still catches any
  * truncation that cuts a record.
  */
object Warc {

  private val FixedDate = "2026-01-01T00:00:00Z"
  private val BufSize = 64 * 1024
  // Strictness caps: a header line past this is attack surface, not a
  // WARC; a record past ~2 GiB cannot live in one JVM array.
  private val MaxHeaderLine = 1 << 20
  private val MaxRecordBytes = Int.MaxValue.toLong - 16L

  /** Payload bytes MATERIALIZED into per-record arrays across every
    * reader in this JVM — the instrumentation behind the strict-skip
    * claims (the HttpKit.bodyDecodeCount pattern): a URL-filtered walk
    * must allocate only the matching records' payloads, and WarcSpec
    * asserts it on this counter instead of trusting the plan prose.
    */
  private[graft] val payloadBytesMaterialized =
    new java.util.concurrent.atomic.LongAdder

  /** Record types the content walk emits by default: the page-payload
    * records of a raw crawl. A WET extract (the Common Crawl
    * text-only sibling format) stores its text under
    * `WARC-Type: conversion` instead — pass `Set("conversion")` to
    * read those ([[graft.ops.CorpusPipeline.fromWet]]).
    */
  private[graft] val ContentTypes: Set[String] =
    Set("response", "resource")

  /** Default read glob: the part files our own text-sink writer
    * produces. A directory a FOREIGN crawler wrote (`*.warc.gz` names,
    * the Common Crawl layout) needs an explicit glob — and a glob that
    * matches NOTHING is an error, never a silent empty frame.
    */
  private val DefaultGlob = "part-*"

  /** Resolve `dir`/`glob` against the session's filesystem and fail
    * LOUDLY on zero matches: a reader that returns an empty DataFrame
    * for a mis-globbed directory of real WARC files hides the most
    * common integration mistake there is.
    */
  private def globbed(spark: SparkSession, dir: String,
      glob: String): String = {
    val p = new org.apache.hadoop.fs.Path(dir, glob)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val matched = fs.globStatus(p)
    require(matched != null && matched.nonEmpty,
      s"no WARC files match $p — a foreign-written directory needs an " +
        """explicit glob (e.g. read(spark, dir, "*.warc.gz"))""")
    p.toString
  }

  /** Close the iterator (and its underlying stream) when Spark
    * abandons it early — `limit`/`take` or a downstream failure leaves
    * a flatMap iterator mid-stream, and without this hook the open
    * file handle lives until the EXECUTOR exits, not the task.
    */
  private def closeOnTaskEnd(it: WarcRecordIterator): WarcRecordIterator = {
    val tc = org.apache.spark.TaskContext.get()
    if (tc != null) tc.addTaskCompletionListener[Unit](_ => it.close())
    it
  }

  /** Write (url, payload) rows as WARC/1.0 response records. */
  def write(df: DataFrame, dir: String, urlCol: String,
      payloadCol: String): Unit =
    df.select(recordCol(urlCol, payloadCol))
      .write.mode("overwrite").text(dir)

  /** [[write]], gzip-compressed: same record framing through the text
    * sink's gzip codec — each part file is ONE gzip member, a legal
    * `.warc.gz` stream any sequential WARC reader (including [[read]])
    * accepts. Per-RECORD members (the Common Crawl shape, for
    * record-level random access) are a writer refinement the reader
    * already handles — it inflates members transparently.
    */
  def writeGzip(df: DataFrame, dir: String, urlCol: String,
      payloadCol: String): Unit =
    df.select(recordCol(urlCol, payloadCol))
      .write.mode("overwrite").option("compression", "gzip").text(dir)

  private def recordCol(urlCol: String,
      payloadCol: String): org.apache.spark.sql.Column =
    concat(
      lit("WARC/1.0\r\n"),
      lit("WARC-Type: response\r\n"),
      lit("WARC-Record-ID: <urn:graft:"), col(urlCol), lit(">\r\n"),
      lit("WARC-Target-URI: "), col(urlCol), lit("\r\n"),
      lit(s"WARC-Date: $FixedDate\r\n"),
      lit("Content-Length: "),
      octet_length(col(payloadCol)).cast("string"), lit("\r\n\r\n"),
      col(payloadCol), lit("\r\n\r")).as("value")

  /** Typed-record writer: rows carry their own WARC-Type. `response` /
    * `resource` rows frame exactly like [[write]]; `revisit` rows add
    * the WARC/1.1 identical-payload-digest profile URI and
    * `WARC-Refers-To-Target-URI: <refersToCol>` — the "this capture
    * duplicates that earlier one" marker real crawls (Common Crawl
    * included) emit instead of re-storing the payload. Null refers-to
    * values omit the header.
    */
  def writeTyped(df: DataFrame, dir: String, urlCol: String,
      payloadCol: String, typeCol: String, refersToCol: String,
      gzip: Boolean = false): Unit = {
    val rec = concat(
      lit("WARC/1.0\r\n"),
      lit("WARC-Type: "), col(typeCol), lit("\r\n"),
      lit("WARC-Record-ID: <urn:graft:"), col(urlCol), lit(">\r\n"),
      lit("WARC-Target-URI: "), col(urlCol), lit("\r\n"),
      when(col(typeCol) === "revisit",
        concat(
          lit("WARC-Profile: http://netpreserve.org/warc/1.1/" +
            "revisit/identical-payload-digest\r\n"),
          when(col(refersToCol).isNotNull,
            concat(lit("WARC-Refers-To-Target-URI: "),
              col(refersToCol), lit("\r\n")))
            .otherwise(lit(""))))
        .otherwise(lit("")),
      lit(s"WARC-Date: $FixedDate\r\n"),
      lit("Content-Length: "),
      octet_length(col(payloadCol)).cast("string"), lit("\r\n\r\n"),
      col(payloadCol), lit("\r\n\r")).as("value")
    val w = df.select(rec).write.mode("overwrite")
    (if (gzip) w.option("compression", "gzip") else w).text(dir)
  }

  /** Read a WARC directory back as (warc_file, url, payload, n_bytes).
    * One record-streaming iterator per file — narrow, no shuffle, task
    * memory ∝ largest record ([[WarcRecordIterator]]). Payload is
    * UTF-8-decoded per record; [[readBinary]] keeps the raw bytes for
    * charset-aware pipelines.
    */
  def read(spark: SparkSession, dir: String,
      glob: String = DefaultGlob): DataFrame = {
    import spark.implicits._
    spark.createDataset(
      spark.sparkContext.binaryFiles(globbed(spark, dir, glob))
        .flatMap { case (path, pds) =>
          val file = path.substring(path.lastIndexOf('/') + 1)
          closeOnTaskEnd(new WarcRecordIterator(pds.open()))
            .map { case (url, payload) =>
              (file, url, new String(payload, "UTF-8"),
                payload.length.toLong)
            }
        })
      .toDF("warc_file", "url", "payload", "n_bytes")
  }

  /** [[read]] with the payload kept as RAW BYTES
    * (warc_file, url, payload_bytes, n_bytes) — the input shape for
    * HTTP-envelope parsing and charset sniffing, where a forced UTF-8
    * decode is lossy (real crawls are ~15–20% non-UTF-8).
    *
    * `urlFilter` (round 18 — VERDICT r17 task 3) pushes a Target-URI
    * predicate INTO the record walk: a record whose URL fails it
    * strict-skips its payload through the reused scratch buffer
    * (framing still checked, truncation still fails) instead of
    * materializing a byte array the DataFrame filter would only drop.
    * A |sites|-sized pass like the robots harvest pays the decompress
    * floor, not the page volume.
    */
  def readBinary(spark: SparkSession, dir: String,
      glob: String = DefaultGlob,
      urlFilter: String => Boolean = null,
      types: Set[String] = ContentTypes): DataFrame = {
    import spark.implicits._
    val emitTypes = types.map(_.toLowerCase(java.util.Locale.ROOT))
    spark.createDataset(
      spark.sparkContext.binaryFiles(globbed(spark, dir, glob))
        .flatMap { case (path, pds) =>
          val file = path.substring(path.lastIndexOf('/') + 1)
          closeOnTaskEnd(
            new WarcRecordIterator(pds.open(), urlFilter = urlFilter,
              contentTypes = emitTypes))
            .map { case (url, payload) =>
              (file, url, payload, payload.length.toLong)
            }
        })
      .toDF("warc_file", "url", "payload_bytes", "n_bytes")
  }

  /** The `revisit` records of a WARC directory as
    * (warc_file, url, refers_to) rows — the dedup signal a real crawl
    * EMITS instead of re-storing an unchanged payload: `url` was
    * captured again and its body is byte-identical to the earlier
    * capture of `refers_to` (the WARC/1.1 identical-payload-digest
    * profile). Feeding these into URL-dedup groups lets a recrawl
    * dedup WITHOUT re-extracting anything ([[graft.ops.WebCorpus
    * .revisitDedupGroups]]); `refers_to` is null when the record
    * carries no WARC-Refers-To-Target-URI. Same record-streaming walk
    * and task-completion hygiene as [[read]].
    */
  def readRevisits(spark: SparkSession, dir: String,
      glob: String = DefaultGlob): DataFrame = {
    import spark.implicits._
    spark.createDataset(
      spark.sparkContext.binaryFiles(globbed(spark, dir, glob))
        .flatMap { case (path, pds) =>
          val file = path.substring(path.lastIndexOf('/') + 1)
          closeOnTaskEnd(
            new WarcRecordIterator(pds.open(), emitRevisits = true))
            .map { case (url, refBytes) =>
              (file, url,
                if (refBytes.isEmpty) null
                else new String(refBytes, "UTF-8"))
            }
        })
      .toDF("warc_file", "url", "refers_to")
  }

  /** The streaming FILE-PATH feed both streaming twins ride: the
    * `binaryFile` source tracks arrivals exactly-once, but its
    * `content` column is whole-file bytes — so the projection keeps
    * ONLY `path` (the source's reader builds just the requested
    * columns; file bytes are never materialized) and each task opens
    * its file itself and walks it with the same record-streaming
    * iterator as the batch path. Task memory is ∝ one record at any
    * file size, the r16 batch-path guarantee extended to streaming
    * (the r15/r16 twins held whole files per the source contract).
    *
    * Streaming default glob is `*`, not the batch `part-*`: a landing
    * directory receives CRAWLER-named files (`a.warc`, `*.warc.gz`),
    * and the source itself already ignores nothing silently — every
    * landed file is either parsed or fails the strict walk loudly.
    */
  private def streamPaths(spark: SparkSession, dir: String,
      glob: String): org.apache.spark.sql.Dataset[String] = {
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
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(col("path"))
      .as[String]
  }

  /** Open a landed file task-side for the record walk, with the
    * SESSION's Hadoop configuration (captured at plan time, shipped
    * via `SerializableConfiguration`) — so `spark.hadoop.*` settings
    * (object-store credentials, custom FS impls) resolve exactly as
    * they do on the batch `binaryFiles` path. A task-side default
    * `Configuration()` would silently drop them.
    */
  private def openPath(path: String,
      conf: org.apache.spark.util.SerializableConfiguration)
      : java.io.InputStream = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(conf.value).open(p)
  }

  /** The plan-time Hadoop-conf capture [[openPath]] consumes. */
  private def sessionConf(spark: SparkSession)
      : org.apache.spark.util.SerializableConfiguration =
    new org.apache.spark.util.SerializableConfiguration(
      spark.sessionState.newHadoopConf())

  /** Streaming twin of [[read]]: watch `dir` for newly-landed WARC
    * files (the shape a crawler actually produces — a directory that
    * grows by whole files) and emit each file's records exactly once.
    * RECORD-STREAMING like the batch path (round 17): only file PATHS
    * flow through the source; tasks open and walk their file through
    * the same fixed-buffer iterator, so a multi-GB landed file never
    * materializes. Use `option`-level trigger limits upstream
    * (`maxFilesPerTrigger`) to bound batch size by file count.
    *
    * Landed files must stay IMMUTABLE until their batch commits: tasks
    * re-open the listed path at execution time, so a file deleted,
    * renamed, or compacted between the source listing and the task run
    * (or a retry) fails that micro-batch loudly. Land via atomic
    * rename and defer cleanup until the checkpoint has advanced past
    * the file — the standard landing-directory contract.
    */
  def readStream(spark: SparkSession, dir: String,
      glob: String = "*"): DataFrame = {
    import spark.implicits._
    val conf = sessionConf(spark)
    streamPaths(spark, dir, glob)
      .flatMap { path =>
        val file = path.substring(path.lastIndexOf('/') + 1)
        closeOnTaskEnd(new WarcRecordIterator(openPath(path, conf)))
          .map { case (url, payload) =>
            (file, url, new String(payload, "UTF-8"),
              payload.length.toLong)
          }
      }
      .toDF("warc_file", "url", "payload", "n_bytes")
  }

  /** Streaming twin of [[readBinary]]: raw payload BYTES per record
    * (warc_file, url, payload_bytes, n_bytes) off the landing
    * directory — the lossless shape for the HTTP-envelope/charset
    * tier (a UTF-8 string hop corrupts non-UTF-8 bodies). Same
    * path-only source + task-side record walk (and the same
    * files-stay-immutable landing contract) as [[readStream]].
    */
  def readStreamBinary(spark: SparkSession, dir: String,
      glob: String = "*",
      types: Set[String] = ContentTypes): DataFrame = {
    import spark.implicits._
    val conf = sessionConf(spark)
    val emitTypes = types.map(_.toLowerCase(java.util.Locale.ROOT))
    streamPaths(spark, dir, glob)
      .flatMap { path =>
        val file = path.substring(path.lastIndexOf('/') + 1)
        closeOnTaskEnd(new WarcRecordIterator(openPath(path, conf),
          contentTypes = emitTypes))
          .map { case (url, payload) =>
            (file, url, payload, payload.length.toLong)
          }
      }
      .toDF("warc_file", "url", "payload_bytes", "n_bytes")
  }

  /** Strict WARC/1.0 walk over in-memory bytes — the test/compat
    * surface; the DataFrame paths stream instead of materializing.
    */
  private[graft] def parseRecords(
      raw: Array[Byte]): Seq[(String, String, Long)] =
    new WarcRecordIterator(new java.io.ByteArrayInputStream(raw))
      .map { case (url, payload) =>
        (url, new String(payload, "UTF-8"), payload.length.toLong)
      }.toSeq

  /** The record-streaming strict walk: pulls ONE record at a time off
    * a buffered (gzip-sniffed) stream. `(url, payloadBytes)` per
    * content record — or, with `emitRevisits`, `(url, refersToBytes)`
    * per `revisit` record (UTF-8 of WARC-Refers-To-Target-URI, empty
    * when absent) with content records skipped instead. `urlFilter`
    * (non-null ⇒ applied to each would-emit record's Target-URI)
    * strict-skips non-matching payloads through the scratch buffer —
    * zero allocation ∝ their size. Any malformation throws
    * `IllegalArgumentException` with the inflated-byte position; the
    * underlying stream is closed at EOF, on failure, and via [[close]]
    * (the task-completion hook for early-abandoned iterators).
    */
  private[graft] final class WarcRecordIterator(raw: java.io.InputStream,
      emitRevisits: Boolean = false,
      urlFilter: String => Boolean = null,
      contentTypes: Set[String] = ContentTypes)
      extends Iterator[(String, Array[Byte])] {

    private val in: java.io.InputStream = {
      val pb = new java.io.PushbackInputStream(
        new java.io.BufferedInputStream(raw, BufSize), 2)
      val b0 = pb.read()
      val b1 = pb.read()
      if (b1 >= 0) pb.unread(b1)
      if (b0 >= 0) pb.unread(b0)
      if (b0 == 0x1f && b1 == 0x8b)
        // Buffer ON TOP of the inflater too: header parsing reads
        // byte-at-a-time, and a naked GZIPInputStream pays an inflater
        // call per byte.
        new java.io.BufferedInputStream(
          new java.util.zip.GZIPInputStream(pb, BufSize), BufSize)
      else pb
    }
    private var pos = 0L
    private var finished = false
    private var nextRec: (String, Array[Byte]) = _

    private def closeQuietly(): Unit =
      try in.close() catch { case _: java.io.IOException => () }

    /** Idempotent early shutdown: mark the walk finished and release
      * the underlying stream — registered as a task-completion
      * listener so `limit`/`take`/failed tasks cannot leak handles.
      */
    private[graft] def close(): Unit = {
      finished = true
      nextRec = null
      closeQuietly()
    }

    private def fail(msg: String): Nothing = {
      closeQuietly()
      throw new IllegalArgumentException(
        s"malformed WARC at byte $pos: $msg")
    }

    /** One CRLF-terminated header line, CRLF consumed and stripped.
      * `seed` is a byte already pulled off the stream (or -1).
      */
    private def line(seed: Int): String = {
      val buf = new java.io.ByteArrayOutputStream(64)
      var prev = -1
      var c = seed
      if (c < 0) { c = in.read(); if (c >= 0) pos += 1 }
      while (true) {
        if (c < 0) fail("unterminated header line")
        if (c == '\n' && prev == '\r') {
          val arr = buf.toByteArray
          return new String(arr, 0, arr.length - 1, "UTF-8")
        }
        buf.write(c)
        if (buf.size > MaxHeaderLine) fail("header line exceeds 1 MiB")
        prev = c
        c = in.read()
        if (c >= 0) pos += 1
      }
      throw new IllegalStateException("unreachable")
    }

    private def readExact(n: Int, what: String): Array[Byte] = {
      val out = new Array[Byte](n)
      var off = 0
      while (off < n) {
        val got = in.read(out, off, n - off)
        if (got < 0) fail(s"truncated $what")
        off += got
        pos += got
      }
      out
    }

    // scratch for skipping non-emitted payloads — reused across
    // records so a skipped multi-MB body allocates NOTHING per record
    private lazy val skipBuf = new Array[Byte](BufSize)

    /** Consume exactly `n` payload bytes WITHOUT materializing them —
      * the walk stays strict (truncation still fails) but a record the
      * iterator will not emit (structural types on the content path,
      * content records on the revisit path) costs no allocation ∝ its
      * size.
      */
    private def skipExact(n: Long, what: String): Unit = {
      var left = n
      while (left > 0) {
        val got = in.read(skipBuf, 0,
          math.min(left, skipBuf.length.toLong).toInt)
        if (got < 0) fail(s"truncated $what")
        left -= got
        pos += got
      }
    }

    /** Parse records until one is EMITTABLE (a `response`/`resource`
      * content record) or the stream ends. Framing stays strict for
      * EVERY record — version line, headers, exact Content-Length,
      * separator — but structural record types (`warcinfo`, which
      * legitimately has no Target-URI and LEADS every real Common
      * Crawl file, plus `request`/`metadata`/`revisit`) are consumed
      * and skipped, not failed on and not emitted as rows.
      */
    private def advance(): Unit = {
      while (nextRec == null && !finished) {
        val c0 = in.read()
        if (c0 < 0) { finished = true; closeQuietly(); return }
        pos += 1
        val version = line(c0)
        if (version != "WARC/1.0" && version != "WARC/1.1")
          fail("missing WARC/1.0 or WARC/1.1 version line")
        // field names are case-insensitive (ISO 28500 §4) — keyed
        // lowercased; values keep their bytes
        val headers = scala.collection.mutable.Map.empty[String, String]
        var h = line(-1)
        while (h.nonEmpty) {
          val sep = h.indexOf(": ")
          if (sep < 0) fail(s"bad header '$h'")
          headers(h.substring(0, sep)
            .toLowerCase(java.util.Locale.ROOT)) = h.substring(sep + 2)
          h = line(-1)
        }
        val lenStr = headers.getOrElse("content-length",
          fail("missing Content-Length"))
        val len = try lenStr.toLong catch {
          case _: NumberFormatException =>
            fail(s"bad Content-Length '$lenStr'")
        }
        if (len < 0) fail("negative Content-Length")
        // our own writer omits nothing; a typeless record is treated
        // as content (the pre-round-16 behavior)
        val warcType = headers.getOrElse("warc-type", "response")
          .toLowerCase(java.util.Locale.ROOT)
        val isContent = contentTypes(warcType)
        val isRevisit = warcType == "revisit"
        val emits = if (emitRevisits) isRevisit else isContent
        // strictness FIRST (a filtered walk must still fail on a
        // malformed emittable record), then the pushed-down URL gate
        if (emits && !headers.contains("warc-target-uri"))
          fail(s"$warcType record missing WARC-Target-URI")
        val wanted = emits && (urlFilter == null ||
          urlFilter(headers("warc-target-uri")))
        // the 2 GiB JVM-array cap applies only to payloads that will
        // be MATERIALIZED; a skipped record of any size streams through
        if (len > MaxRecordBytes && wanted && !emitRevisits)
          fail(s"record of $len bytes exceeds " +
            "the 2 GiB single-record cap")
        // only a content record about to be EMITTED materializes its
        // payload; everything else (structural records, URL-filtered
        // records, and every content body on the revisit path) is
        // strict-skipped with a reused scratch buffer — zero
        // allocation ∝ skipped size
        val payload =
          if (wanted && !emitRevisits) {
            payloadBytesMaterialized.add(len)
            readExact(len.toInt, "payload")
          } else { skipExact(len, "payload"); null }
        val tail = readExact(4, "record separator")
        if (!(tail(0) == '\r' && tail(1) == '\n' &&
              tail(2) == '\r' && tail(3) == '\n'))
          fail("missing record separator")
        if (wanted) nextRec =
          if (emitRevisits)
            (headers("warc-target-uri"),
              headers.getOrElse("warc-refers-to-target-uri", "")
                .getBytes("UTF-8"))
          else (headers("warc-target-uri"), payload)
      }
    }

    override def hasNext: Boolean = {
      if (nextRec == null && !finished) advance()
      nextRec != null
    }

    override def next(): (String, Array[Byte]) = {
      if (!hasNext) throw new NoSuchElementException("end of WARC stream")
      val r = nextRec
      nextRec = null
      r
    }
  }
}
