package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HTTP response envelope + charset-aware decode — the step between a
  * WARC payload and the HTML tier. Real crawl `response` records wrap
  * an HTTP MESSAGE (status line, headers, body, possibly chunked and
  * content-coded), and ~15–20% of real bodies are not UTF-8; handing
  * the raw payload to a forced-UTF-8 text extractor is wrong twice.
  * Round 16 — VERDICT r15 tasks 2 + 3.
  *
  * Envelope contract (total on junk — row data never throws):
  *  - a payload starting `HTTP/` with a parseable 3-digit status and a
  *    blank-line header terminator is an envelope: status + headers
  *    split off, body is everything after; anything else (no prefix,
  *    no terminator, bad status) → status/content_type/charset null
  *    and the WHOLE payload is the body;
  *  - header lines split on LF with trailing CR stripped (lenient:
  *    real captures mix CRLF and LF), obs-fold continuations folded;
  *  - `Transfer-Encoding: chunked` is de-chunked (hex sizes, chunk
  *    extensions ignored, trailers dropped); malformed chunk framing
  *    falls back to the raw body — total, never thrown;
  *  - `Content-Encoding: gzip|x-gzip|deflate` is decoded (JDK
  *    inflater; both zlib-wrapped and raw deflate streams); unknown
  *    codings (br, zstd) and inflate errors leave the body bytes
  *    as-is;
  *  - transfer decode happens before content decode (RFC 9112 §6.1
  *    layering), Content-Length is ignored (the WARC capture already
  *    delimits the message — truncated captures are the norm).
  *
  * Charset sniff, in precedence order (the crawl-practice order, not
  * the browser one): Content-Type `charset=` param → `<meta charset>`
  * / `<meta http-equiv Content-Type>` in the first 1024 body bytes →
  * BOM (UTF-8 / UTF-16LE / UTF-16BE) → windows-1252, the de-facto
  * fallback superset of latin-1. Decode never throws: unknown charset
  * names fall back to windows-1252, malformed/unmappable sequences
  * become U+FFFD, a leading BOM is stripped.
  */
object HttpKit {

  /** Parsed envelope: status (null when not an HTTP message),
    * lowercased media type, charset PARAM (header only, null when
    * absent), the raw `Location` header (redirect target, null when
    * absent), decoded body bytes.
    */
  final case class Envelope(status: java.lang.Integer, contentType: String,
      charsetParam: String, location: String, body: Array[Byte])

  private val Ascii = java.nio.charset.StandardCharsets.ISO_8859_1

  private def startsWith(b: Array[Byte], s: String): Boolean = {
    if (b.length < s.length) return false
    var i = 0
    while (i < s.length) {
      if (b(i) != s.charAt(i).toByte) return false
      i += 1
    }
    true
  }

  private def indexOf(b: Array[Byte], target: Byte, from: Int): Int = {
    var i = from
    while (i < b.length) { if (b(i) == target) return i; i += 1 }
    -1
  }

  /** bytes [start, endExcl) as a latin-1 string, trailing CR stripped. */
  private def asciiLine(b: Array[Byte], start: Int, endExcl: Int): String = {
    var e = endExcl
    if (e > start && b(e - 1) == '\r') e -= 1
    new String(b, start, e - start, Ascii)
  }

  /** Header-only parse result: the envelope fields that cost nothing
    * to produce (no body copy, no dechunk, no inflate) plus what the
    * body step needs to pick up where the head left off.
    */
  private[graft] final case class Head(status: Int, contentType: String,
      charsetParam: String, location: String, headerEnd: Int,
      chunked: Boolean, coding: String)

  /** Instrumentation: how many BODY materializations (copy + dechunk +
    * content-decode) have run in this JVM — the single-parse contract
    * of the ingest tier is asserted against this (HttpSpec). LongAdder:
    * executor threads bump it concurrently in local mode.
    */
  private[graft] val bodyDecodeCount = new java.util.concurrent.atomic.LongAdder
  /** Instrumentation twin for header-only parses. */
  private[graft] val headParseCount = new java.util.concurrent.atomic.LongAdder

  /** Parse the status line + header block only — null when the payload
    * is not a well-formed HTTP envelope. This is the CHEAP half of
    * [[parseEnvelope]]: a gate that only needs status/media-type rides
    * this and leaves the body untouched (no allocation ∝ body size).
    */
  private[graft] def parseHead(payload: Array[Byte]): Head = {
    headParseCount.increment()
    val n = payload.length
    if (n < 12 || !startsWith(payload, "HTTP/")) return null
    // status line: HTTP/x.y SP 3DIGIT ...
    val lineEnd = indexOf(payload, '\n'.toByte, 0)
    if (lineEnd < 0) return null
    val statusLine = asciiLine(payload, 0, lineEnd)
    val sp = statusLine.indexOf(' ')
    if (sp < 0 || sp + 4 > statusLine.length) return null
    val code = statusLine.substring(sp + 1, sp + 4)
    if (!code.forall(_.isDigit)) return null
    val status = code.toInt
    // header block: lines until the first empty one
    var i = lineEnd + 1
    var headerEnd = -1
    val headers = scala.collection.mutable.ArrayBuffer.empty[String]
    var curLine: StringBuilder = null
    while (headerEnd < 0 && i <= n) {
      val e = indexOf(payload, '\n'.toByte, i)
      if (e < 0) return null // no terminator: not a well-formed envelope
      val line = asciiLine(payload, i, e)
      if (line.isEmpty) {
        if (curLine != null) headers += curLine.result()
        headerEnd = e + 1
      } else if (line.charAt(0) == ' ' || line.charAt(0) == '\t') {
        // obs-fold continuation
        if (curLine != null) curLine.append(' ').append(line.trim)
      } else {
        if (curLine != null) headers += curLine.result()
        curLine = new StringBuilder(line)
      }
      i = e + 1
    }
    var contentType: String = null
    var charsetParam: String = null
    var chunked = false
    var coding: String = null
    var location: String = null
    headers.foreach { h =>
      val colon = h.indexOf(':')
      if (colon > 0) {
        val name = h.substring(0, colon).trim
          .toLowerCase(java.util.Locale.ROOT)
        val value = h.substring(colon + 1).trim
        name match {
          case "content-type" if contentType == null =>
            val semi = value.indexOf(';')
            contentType = (if (semi >= 0) value.substring(0, semi)
              else value).trim.toLowerCase(java.util.Locale.ROOT)
            if (semi >= 0)
              charsetParam = charsetOf(value.substring(semi + 1))
          case "transfer-encoding" =>
            chunked = chunked ||
              value.toLowerCase(java.util.Locale.ROOT).contains("chunked")
          case "content-encoding" if coding == null =>
            coding = value.toLowerCase(java.util.Locale.ROOT).trim
          case "location" if location == null =>
            location = value
          case _ => ()
        }
      }
    }
    Head(status, contentType, charsetParam, location, headerEnd,
      chunked, coding)
  }

  def parseEnvelope(payload: Array[Byte]): Envelope = {
    val h = parseHead(payload)
    if (h == null) return Envelope(null, null, null, null, payload)
    bodyDecodeCount.increment()
    var body =
      java.util.Arrays.copyOfRange(payload, h.headerEnd, payload.length)
    if (h.chunked) body = dechunk(body)
    if (h.coding == "gzip" || h.coding == "x-gzip") body = tryGunzip(body)
    else if (h.coding == "deflate") body = tryInflate(body)
    Envelope(h.status, h.contentType, h.charsetParam, h.location, body)
  }

  /** `charset=token` out of Content-Type params, quotes stripped,
    * lowercased; null when absent.
    */
  private def charsetOf(params: String): String = {
    val lower = params.toLowerCase(java.util.Locale.ROOT)
    // name left boundary: `foocharset=` / `x-charset-y=` must not
    // match (the href-boundary lesson applied preemptively)
    var at = -1
    var from = 0
    while (at < 0) {
      val hit = lower.indexOf("charset", from)
      if (hit < 0) return null
      val ok = hit == 0 || {
        val p = lower.charAt(hit - 1)
        !(p.isLetterOrDigit || p == '-' || p == '_')
      }
      if (ok) at = hit else from = hit + 1
    }
    var i = at + 7
    while (i < lower.length && (lower.charAt(i) == ' ' ||
      lower.charAt(i) == '\t')) i += 1
    if (i >= lower.length || lower.charAt(i) != '=') return null
    i += 1
    while (i < lower.length && (lower.charAt(i) == ' ' ||
      lower.charAt(i) == '\t' || lower.charAt(i) == '"' ||
      lower.charAt(i) == '\'')) i += 1
    val start = i
    while (i < lower.length && (lower.charAt(i).isLetterOrDigit ||
      lower.charAt(i) == '-' || lower.charAt(i) == '_' ||
      lower.charAt(i) == '.' || lower.charAt(i) == ':')) i += 1
    if (i == start) null else lower.substring(start, i)
  }

  /** RFC 9112 §7.1 chunked decode; any framing violation returns the
    * INPUT untouched (total-on-junk — a truncated capture is data).
    */
  private[functions] def dechunk(b: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(b.length)
    var i = 0
    while (true) {
      val e = indexOf(b, '\n'.toByte, i)
      if (e < 0) return b
      var sizeLine = asciiLine(b, i, e)
      val semi = sizeLine.indexOf(';') // chunk extensions
      if (semi >= 0) sizeLine = sizeLine.substring(0, semi)
      sizeLine = sizeLine.trim
      if (sizeLine.isEmpty ||
          !sizeLine.forall(c => Character.digit(c, 16) >= 0)) return b
      val size = try java.lang.Long.parseLong(sizeLine, 16) catch {
        case _: NumberFormatException => return b
      }
      if (size < 0 || size > b.length.toLong) return b
      if (size == 0) return out.toByteArray // trailers dropped
      val start = e + 1
      if (start + size > b.length) return b
      out.write(b, start, size.toInt)
      i = start + size.toInt
      // consume the CRLF (or LF) after the chunk data
      if (i < b.length && b(i) == '\r') i += 1
      if (i >= b.length || b(i) != '\n') return b
      i += 1
    }
    throw new IllegalStateException("unreachable")
  }

  /** Decompression-bomb guard: the decoded body may grow to at most
    * max(64 × input, 1 MiB), hard-capped at 256 MiB. DEFLATE tops out
    * near 1000:1, so a stream that blows past 64× on crawl-sized
    * bodies is hostile by construction — exceeding the cap is treated
    * exactly like any other decode failure (raw bytes returned), never
    * an executor-killing allocation. Real compressed HTML sits at
    * 3–10×, far under the cap.
    */
  private def drainCap(inputLen: Int): Long =
    math.min(math.max(64L * inputLen, 1L << 20), 256L << 20)

  private def tryGunzip(b: Array[Byte]): Array[Byte] =
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(b), 8192)
      drain(in, b.length * 4 + 64, drainCap(b.length))
    } catch { case _: java.io.IOException => b }

  private def tryInflate(b: Array[Byte]): Array[Byte] =
    try { // zlib-wrapped first (the spec), raw deflate as the real world
      val in = new java.util.zip.InflaterInputStream(
        new java.io.ByteArrayInputStream(b))
      drain(in, b.length * 4 + 64, drainCap(b.length))
    } catch {
      case _: java.io.IOException =>
        try {
          val in = new java.util.zip.InflaterInputStream(
            new java.io.ByteArrayInputStream(b),
            new java.util.zip.Inflater(true))
          drain(in, b.length * 4 + 64, drainCap(b.length))
        } catch { case _: java.io.IOException => b }
    }

  private def drain(in: java.io.InputStream, hint: Int,
      cap: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(
      math.max(64, math.min(hint.toLong, cap).toInt))
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) {
      if (out.size.toLong + n > cap)
        throw new java.io.IOException(
          s"decoded body exceeds the ${cap}-byte decompression cap")
      out.write(buf, 0, n)
      n = in.read(buf)
    }
    out.toByteArray
  }

  /** The sniffed charset NAME for a parsed envelope — header param,
    * then meta tag in the first 1024 body bytes, then BOM, then the
    * windows-1252 fallback. Always non-null on non-null input.
    */
  def sniffCharset(charsetParam: String, body: Array[Byte]): String = {
    if (charsetParam != null && resolvable(charsetParam))
      return normalizeName(charsetParam)
    val meta = metaCharset(body)
    if (meta != null && resolvable(meta)) return normalizeName(meta)
    val bom = bomCharset(body)
    if (bom != null) return bom
    "windows-1252"
  }

  private def resolvable(name: String): Boolean =
    try java.nio.charset.Charset.isSupported(normalizeName(name)) catch {
      case _: java.nio.charset.IllegalCharsetNameException => false
    }

  /** WHATWG-ish label normalization for the labels crawls actually
    * carry; everything else goes to `Charset.forName` verbatim.
    */
  private def normalizeName(name: String): String =
    name.toLowerCase(java.util.Locale.ROOT) match {
      case "utf8" | "utf-8" | "unicode-1-1-utf-8" => "UTF-8"
      // latin-1 labels decode as windows-1252 in every browser; the
      // 0x80–0x9F block is ALWAYS cp1252 punctuation in real pages
      case "latin1" | "latin-1" | "iso-8859-1" | "iso8859-1" |
           "l1" | "ascii" | "us-ascii" => "windows-1252"
      case "shift-jis" | "shift_jis" | "sjis" | "x-sjis" => "Shift_JIS"
      case other => other
    }

  /** `<meta charset=…>` / `<meta … content="…; charset=…">` scan over
    * the first 1024 bytes (the WHATWG prescan window), ASCII-decoded.
    */
  private def metaCharset(body: Array[Byte]): String = {
    val window = new String(body, 0, math.min(body.length, 1024), Ascii)
      .toLowerCase(java.util.Locale.ROOT)
    var from = 0
    while (true) {
      val at = window.indexOf("<meta", from)
      if (at < 0) return null
      val end = window.indexOf('>', at)
      val tag = window.substring(at, if (end < 0) window.length else end)
      val cs = charsetOf(tag)
      if (cs != null) return cs
      if (end < 0) return null
      from = end + 1
    }
    null
  }

  private def bomCharset(b: Array[Byte]): String =
    if (b.length >= 3 && (b(0) & 0xff) == 0xef && (b(1) & 0xff) == 0xbb &&
        (b(2) & 0xff) == 0xbf) "UTF-8"
    else if (b.length >= 2 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xfe)
      "UTF-16LE"
    else if (b.length >= 2 && (b(0) & 0xff) == 0xfe && (b(1) & 0xff) == 0xff)
      "UTF-16BE"
    else null

  /** Decode bytes under a charset name: REPLACE on malformed input,
    * unknown names → windows-1252, leading BOM stripped.
    */
  def decode(body: Array[Byte], charsetName: String): String = {
    val cs =
      try java.nio.charset.Charset.forName(normalizeName(charsetName))
      catch { case _: Exception =>
        java.nio.charset.Charset.forName("windows-1252") }
    val dec = cs.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPLACE)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPLACE)
    val skip = // strip the BOM bytes the charset itself won't consume
      if (cs.name == "UTF-8" && bomCharset(body) == "UTF-8") 3
      else if ((cs.name == "UTF-16LE" && bomCharset(body) == "UTF-16LE") ||
        (cs.name == "UTF-16BE" && bomCharset(body) == "UTF-16BE")) 2
      else 0
    val out = dec.decode(java.nio.ByteBuffer.wrap(body, skip,
      body.length - skip)).toString
    if (out.nonEmpty && out.charAt(0) == '\uFEFF') out.substring(1) else out
  }

  // ---- Expression entry points (static-callable from codegen) ----

  private val envelopeSchema = StructType(Seq(
    StructField("status", IntegerType, nullable = true),
    StructField("content_type", StringType, nullable = true),
    StructField("charset", StringType, nullable = true),
    StructField("location", StringType, nullable = true),
    StructField("body", BinaryType, nullable = false)))

  private val headSchema = StructType(Seq(
    StructField("status", IntegerType, nullable = true),
    StructField("content_type", StringType, nullable = true),
    StructField("charset", StringType, nullable = true),
    StructField("location", StringType, nullable = true)))

  /** Header-only envelope row: status / media type / DECLARED charset
    * (normalized; null when absent or unresolvable — unlike
    * [[envelopeRow]] it cannot fall back to a body sniff, because it
    * deliberately never touches the body) / Location. The gate-side
    * kernel of the single-parse ingest contract: filters ride this,
    * and the body is copied + dechunked + inflated exactly once, in
    * the text kernel, for rows that survive.
    */
  def headRow(payload: Array[Byte]): InternalRow = {
    val h = parseHead(payload)
    if (h == null) return new GenericInternalRow(
      Array[Any](null, null, null, null))
    new GenericInternalRow(Array[Any](
      h.status,
      if (h.contentType == null) null
      else UTF8String.fromString(h.contentType),
      if (h.charsetParam == null || !resolvable(h.charsetParam)) null
      else UTF8String.fromString(normalizeName(h.charsetParam)),
      if (h.location == null) null else UTF8String.fromString(h.location)))
  }

  def envelopeRow(payload: Array[Byte]): InternalRow = {
    val e = parseEnvelope(payload)
    new GenericInternalRow(Array[Any](
      if (e.status == null) null else e.status.intValue(),
      if (e.contentType == null) null else UTF8String.fromString(e.contentType),
      if (e.charsetParam == null) null
      else UTF8String.fromString(sniffCharset(e.charsetParam, e.body)),
      if (e.location == null) null else UTF8String.fromString(e.location),
      e.body))
  }

  /** Full text kernel: envelope parse → charset sniff → decode. */
  def text(payload: Array[Byte]): UTF8String = {
    val e = parseEnvelope(payload)
    UTF8String.fromString(
      decode(e.body, sniffCharset(e.charsetParam, e.body)))
  }

  /** UTF-8 decode with REPLACE on junk bytes and BOM strip —
    * [[decode]] pinned to UTF-8, the WET-payload path (codegen entry
    * point of [[Utf8LossyExpr]]).
    */
  def utf8Lossy(payload: Array[Byte]): UTF8String =
    UTF8String.fromString(decode(payload, "UTF-8"))

  /** The sniffed charset a [[text]] decode would use — always non-null
    * (the windows-1252 fallback is a value, not an absence: a
    * defaulted decode should be measurable).
    */
  def charsetName(payload: Array[Byte]): UTF8String = {
    val e = parseEnvelope(payload)
    UTF8String.fromString(sniffCharset(e.charsetParam, e.body))
  }

  private[functions] def schema: StructType = envelopeSchema
  private[functions] def headStructSchema: StructType = headSchema
}

/** `graft_http_head(payload_bytes)` → struct(status, content_type,
  * charset, location): the HEADER-ONLY envelope parse — no body copy,
  * no dechunk, no inflate. This is what a status/MIME gate should
  * evaluate: under predicate pushdown a filter expression can be
  * duplicated across operators, and duplicating a head parse costs a
  * few hundred scanned bytes where duplicating [[HttpEnvelopeExpr]]
  * re-inflates the body. `charset` is the normalized DECLARED header
  * param (null when absent/unresolvable — a body sniff needs the
  * body); non-HTTP payloads yield an all-null struct.
  */
case class HttpHeadExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_http_head expects BINARY, got ${other.catalogString}")
  }
  override def dataType: DataType = HttpKit.headStructSchema
  override def prettyName: String = "graft_http_head"

  override def nullSafeEval(payload: Any): Any =
    HttpKit.headRow(payload.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, p => s"graft.functions.HttpKit.headRow($p)")

  override protected def withNewChildInternal(
      newChild: Expression): HttpHeadExpr = copy(child = newChild)
}

/** `graft_http(payload_bytes)` → struct(status, content_type, charset,
  * location, body): the parsed (de-chunked, content-decoded) HTTP
  * envelope; a non-HTTP payload yields null status/content_type/
  * charset/location with the whole payload as body. The `charset`
  * field is the SNIFFED value when the header declared one, null
  * otherwise (observability of the declared-vs-defaulted split);
  * [[HttpTextExpr]] always sniffs. `location` is the raw redirect
  * target header (resolution is the caller's join).
  */
case class HttpEnvelopeExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_http expects BINARY, got ${other.catalogString}")
  }
  override def dataType: DataType = HttpKit.schema
  override def prettyName: String = "graft_http"

  override def nullSafeEval(payload: Any): Any =
    HttpKit.envelopeRow(payload.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, p => s"graft.functions.HttpKit.envelopeRow($p)")

  override protected def withNewChildInternal(
      newChild: Expression): HttpEnvelopeExpr = copy(child = newChild)
}

/** `graft_http_text(payload_bytes)` → the body decoded to text:
  * envelope parse (or whole payload when not HTTP), charset sniff
  * (header param → meta → BOM → windows-1252), REPLACE-decode.
  */
case class HttpTextExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_http_text expects BINARY, got ${other.catalogString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_http_text"

  override def nullSafeEval(payload: Any): Any =
    HttpKit.text(payload.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, p => s"graft.functions.HttpKit.text($p)")

  override protected def withNewChildInternal(
      newChild: Expression): HttpTextExpr = copy(child = newChild)
}

/** `graft_http_charset(payload_bytes)` → the charset the decode uses
  * (sniff order: header param → meta → BOM → windows-1252); always
  * non-null on non-null input.
  */
case class HttpCharsetExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_http_charset expects BINARY, got ${other.catalogString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_http_charset"

  override def nullSafeEval(payload: Any): Any =
    HttpKit.charsetName(payload.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, p => s"graft.functions.HttpKit.charsetName($p)")

  override protected def withNewChildInternal(
      newChild: Expression): HttpCharsetExpr = copy(child = newChild)
}

/** `graft_utf8_lossy(bytes)` → the bytes decoded as UTF-8 with
  * REPLACE on malformed/unmappable input (U+FFFD), leading BOM
  * stripped — [[HttpKit.decode]] pinned to UTF-8. The WET-payload
  * decoder (round 19 — ADVICE r18): Spark's built-in
  * `decode(col, 'UTF-8')` FAIL-STOPS on invalid bytes under the
  * default `spark.sql.legacy.codingErrorAction=false`, so a single
  * junk byte in a real-world WET segment would kill the whole ingest;
  * crawl text must decode lossily, never fatally.
  */
case class Utf8LossyExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_utf8_lossy expects BINARY, got ${other.catalogString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_utf8_lossy"

  override def nullSafeEval(payload: Any): Any =
    HttpKit.utf8Lossy(payload.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, p => s"graft.functions.HttpKit.utf8Lossy($p)")

  override protected def withNewChildInternal(
      newChild: Expression): Utf8LossyExpr = copy(child = newChild)
}
