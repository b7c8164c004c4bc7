package graft

import graft.functions.HttpKit
import graft.ops.WebCorpus
import org.apache.spark.sql.functions._

/** HTTP envelope parse + charset-aware decode: status/header split,
  * chunked and content-coding decode, sniff precedence, totality on
  * junk, and the gated funnel's plan shape.
  */
class HttpSpec extends SparkSpec {
  import spark.implicits._

  private def env(payload: Array[Byte]) = HttpKit.parseEnvelope(payload)
  private def envS(payload: String) = env(payload.getBytes("UTF-8"))
  private def textOf(payload: Array[Byte]): String =
    HttpKit.text(payload).toString

  test("status line + headers split; body is everything after the blank line") {
    val e = envS("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n" +
      "Server: x\r\n\r\n<p>body</p>")
    assert(e.status === 200)
    assert(e.contentType === "text/html")
    assert(e.charsetParam === "utf-8")
    assert(new String(e.body, "UTF-8") === "<p>body</p>")
    // LF-only line endings (real captures mix them) parse the same
    val lf = envS("HTTP/1.0 404 Not Found\nContent-Type: TEXT/Plain\n\ngone")
    assert(lf.status === 404 && lf.contentType === "text/plain")
    assert(new String(lf.body, "UTF-8") === "gone")
    // obs-fold continuation folds into the previous header
    val fold = envS("HTTP/1.1 200 OK\r\nContent-Type: text/html;\r\n" +
      " charset=iso-8859-1\r\n\r\nx")
    assert(fold.charsetParam === "iso-8859-1")
  }

  test("non-HTTP payloads are total: null status, whole payload as body") {
    for (junk <- Seq("plain html <p>x</p>", "", "HTTP/garbage",
        "HTTP/1.1 abc\r\n\r\n", "HTTP/1.1 200 OK\r\nno terminator")) {
      val e = envS(junk)
      assert(e.status === null && e.contentType === null)
      assert(new String(e.body, "UTF-8") === junk)
    }
  }

  test("chunked transfer decode, extensions and trailers dropped; junk framing is raw") {
    val chunked = "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" +
      "5;ext=1\r\nhello\r\n6\r\n world\r\n0\r\nTrailer: t\r\n\r\n"
    assert(new String(envS(chunked).body, "UTF-8") === "hello world")
    // malformed chunk size -> body returned raw, never a throw
    val bad = "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\nZZ\r\nx"
    assert(new String(envS(bad).body, "UTF-8") === "ZZ\r\nx")
  }

  test("content-encoding gzip and deflate decode; unknown codings stay raw") {
    def gz(s: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(s.getBytes("UTF-8")); g.close()
      bos.toByteArray
    }
    val head = "HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n"
      .getBytes("UTF-8")
    assert(new String(env(head ++ gz("unzipped body")).body, "UTF-8") ===
      "unzipped body")
    // deflate (zlib-wrapped)
    val d = new java.util.zip.Deflater()
    d.setInput("deflated".getBytes("UTF-8")); d.finish()
    val buf = new Array[Byte](256)
    val n = d.deflate(buf)
    val dHead = "HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\n\r\n"
      .getBytes("UTF-8")
    assert(new String(env(dHead ++ buf.take(n)).body, "UTF-8") === "deflated")
    // br is untouched
    val br = "HTTP/1.1 200 OK\r\nContent-Encoding: br\r\n\r\nopaque"
    assert(new String(envS(br).body, "UTF-8") === "opaque")
    // corrupt gzip stays raw (total)
    val corrupt = head ++ "not gzip at all".getBytes("UTF-8")
    assert(new String(env(corrupt).body, "UTF-8") === "not gzip at all")
  }

  test("chunked + gzip layer in RFC order: transfer decode, then content decode") {
    def gz(s: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(s.getBytes("UTF-8")); g.close()
      bos.toByteArray
    }
    val payload = gz("layered")
    val head = ("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n" +
      "Content-Encoding: gzip\r\n\r\n").getBytes("UTF-8")
    val chunk = (Integer.toHexString(payload.length) + "\r\n").getBytes("UTF-8") ++
      payload ++ "\r\n0\r\n\r\n".getBytes("UTF-8")
    assert(new String(env(head ++ chunk).body, "UTF-8") === "layered")
  }

  test("charset sniff precedence: header param, then meta, then BOM, then cp1252") {
    // header param wins over a conflicting meta
    assert(HttpKit.sniffCharset("shift_jis",
      "<meta charset=\"utf-8\">x".getBytes("UTF-8")) === "Shift_JIS")
    // meta charset= form
    assert(HttpKit.sniffCharset(null,
      "<html><meta charset=utf-8><body>".getBytes("UTF-8")) === "UTF-8")
    // meta http-equiv form
    assert(HttpKit.sniffCharset(null,
      ("<meta http-equiv=\"Content-Type\" " +
        "content=\"text/html; charset=EUC-JP\">").getBytes("UTF-8")) ===
      "euc-jp")
    // meta outside the 1024-byte prescan window is NOT seen
    val far = (" " * 1100) + "<meta charset=utf-8>"
    assert(HttpKit.sniffCharset(null, far.getBytes("UTF-8")) ===
      "windows-1252")
    // BOM
    assert(HttpKit.sniffCharset(null,
      Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte, 'x')) === "UTF-8")
    assert(HttpKit.sniffCharset(null,
      Array[Byte](0xff.toByte, 0xfe.toByte, 'x', 0)) === "UTF-16LE")
    // nothing declared -> windows-1252
    assert(HttpKit.sniffCharset(null, "plain".getBytes("UTF-8")) ===
      "windows-1252")
    // unknown label falls through to the next source
    assert(HttpKit.sniffCharset("not-a-charset",
      "<meta charset=utf-8>".getBytes("UTF-8")) === "UTF-8")
    // latin-1 labels decode as windows-1252 (the browser rule)
    assert(HttpKit.sniffCharset("iso-8859-1", Array[Byte]()) ===
      "windows-1252")
    // charset needs a param-name left boundary: foocharset= is not it
    val e = envS("HTTP/1.1 200 OK\r\n" +
      "Content-Type: text/html; foocharset=utf-16le; charset=utf-8\r\n\r\nx")
    assert(e.charsetParam === "utf-8")
    val e2 = envS("HTTP/1.1 200 OK\r\n" +
      "Content-Type: text/html; x-charset=koi8-r\r\n\r\nx")
    assert(e2.charsetParam === null)
  }

  test("decode: REPLACE on malformed bytes, BOM stripped, never throws") {
    assert(HttpKit.decode("héllo".getBytes("UTF-8"), "UTF-8") === "héllo")
    // cp1252 high bytes: 0x93/0x94 are curly quotes
    assert(HttpKit.decode(Array[Byte](0x93.toByte, 'a', 0x94.toByte),
      "windows-1252") === "“a”")
    // invalid utf-8 -> U+FFFD, not a throw
    assert(HttpKit.decode(Array[Byte](0xc3.toByte),
      "UTF-8") === "�")
    // utf-8 BOM stripped
    assert(HttpKit.decode(
      Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte, 'h', 'i'),
      "UTF-8") === "hi")
    // utf-16le with BOM
    assert(HttpKit.decode(
      Array[Byte](0xff.toByte, 0xfe.toByte, 'h', 0, 'i', 0),
      "UTF-16LE") === "hi")
    // unknown charset name -> windows-1252 fallback
    assert(HttpKit.decode("abc".getBytes("UTF-8"), "klingon") === "abc")
  }

  test("end-to-end text kernel: shift-jis body under a header declaration") {
    val sjis = "こんにちは".getBytes("Shift_JIS")
    val head = ("HTTP/1.1 200 OK\r\n" +
      "Content-Type: text/html; charset=Shift_JIS\r\n\r\n").getBytes("UTF-8")
    assert(textOf(head ++ sjis) === "こんにちは")
    // and a non-HTTP latin-1-ish payload just decodes as cp1252
    assert(textOf(Array[Byte]('c', 'a', 'f', 0xe9.toByte)) === "café")
  }

  test("Location header rides the envelope; redirectGraph builds domain edges") {
    val e = envS("HTTP/1.1 301 Moved Permanently\r\n" +
      "Location: https://new.example.com/page\r\n\r\n")
    assert(e.status === 301)
    assert(e.location === "https://new.example.com/page")
    assert(envS("HTTP/1.1 200 OK\r\n\r\nx").location === null)
    def b(s: String): Array[Byte] = s.getBytes("UTF-8")
    val rows = Seq(
      ("http://a.com/1", b("HTTP/1.1 301 X\r\nLocation: https://b.org/n\r\n\r\n")),
      ("http://a.com/2", b("HTTP/1.1 301 X\r\nLocation: https://b.org/m\r\n\r\n")),
      // relative target -> same-domain edge, never dropped
      ("http://a.com/3", b("HTTP/1.1 302 X\r\nLocation: /moved\r\n\r\n")),
      // 200 and non-http rows contribute nothing
      ("http://a.com/4", b("HTTP/1.1 200 OK\r\n\r\nok")),
      ("http://b.org/5", b("not http")))
      .toDF("url", "payload_bytes")
    val got = WebCorpus.redirectGraph(rows, "url", "payload_bytes")
      .orderBy("src_domain", "dst_domain")
      .as[(String, String, Long)].collect().toSeq
    assert(got === Seq(
      ("a.com", "a.com", 1L),
      ("a.com", "b.org", 2L)))
  }

  test("httpFunnel gates before extraction; narrow pass, one rollup") {
    def b(s: String): Array[Byte] = s.getBytes("UTF-8")
    val rows = Seq(
      ("s1", b("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<p>hi</p>")),
      ("s1", b("HTTP/1.1 404 Not Found\r\nContent-Type: text/html\r\n\r\ngone")),
      ("s1", b("HTTP/1.1 200 OK\r\nContent-Type: image/png\r\n\r\nPNG")),
      ("s1", b("not http at all")),
      ("s2", b("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
        "<script>only</script>")))
      .toDF("source", "payload_bytes")
    val got = WebCorpus.httpFunnel(rows, "source", "payload_bytes")
      .orderBy("source")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      // 4 payloads, 3 http, 2 ok(200), 2 html-typed, 1 with real text
      ("s1", 4L, 3L, 2L, 2L, 1L),
      // script-only body passes the gate but extracts to empty
      ("s2", 1L, 1L, 1L, 1L, 0L)))
    val plan = WebCorpus.httpFunnel(rows, "source", "payload_bytes")
      .queryExecution.executedPlan.toString
    assert(plan.contains("Exchange")) // exactly the one rollup shuffle
    assert(plan.split("Exchange", -1).length == 2, plan)
  }

  test("a decompression bomb is capped: raw bytes back, never a huge allocation") {
    def gz(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(b); g.close()
      bos.toByteArray
    }
    // 64 MiB of zeros gzips to ~64 KiB — a >1000:1 hostile ratio. The
    // cap is max(64 × input, 1 MiB), far under 64 MiB, so the decode
    // must bail and return the RAW compressed bytes (the standard
    // decode-failure contract), not OOM the executor.
    val bomb = gz(new Array[Byte](64 << 20))
    assert(bomb.length < (1 << 20), s"fixture not a bomb: ${bomb.length}")
    val e = env(("HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n")
      .getBytes("UTF-8") ++ bomb)
    assert(e.status === 200)
    assert(java.util.Arrays.equals(e.body, bomb),
      "capped decode must return the raw body unchanged")
    // deflate twin (zlib wrapping)
    val dbos = new java.io.ByteArrayOutputStream()
    val dos = new java.util.zip.DeflaterOutputStream(dbos)
    dos.write(new Array[Byte](64 << 20)); dos.close()
    val dBomb = dbos.toByteArray
    val ed = env(("HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\n\r\n")
      .getBytes("UTF-8") ++ dBomb)
    assert(java.util.Arrays.equals(ed.body, dBomb))
    // a HIGH-ratio but SMALL body stays under the 1 MiB floor and
    // decodes fine — the cap must not over-trigger on legit repetitive
    // HTML (boilerplate compresses hard)
    val legit = gz(("<tr><td>x</td></tr>" * 4000).getBytes("UTF-8"))
    val el = env(("HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n")
      .getBytes("UTF-8") ++ legit)
    assert(new String(el.body, "UTF-8").startsWith("<tr><td>x</td></tr>"))
    assert(el.body.length === "<tr><td>x</td></tr>".length * 4000)
  }

  test("graft_http_head: header-only fields; all-null struct on non-HTTP") {
    val rows = Seq(
      "HTTP/1.1 301 Moved\r\nContent-Type: text/html; charset=utf-8\r\n" +
        "Location: https://n.com/x\r\n\r\nbody",
      "not http").toDF("p")
    val got = rows
      .select(WebCorpus.httpHead(encode(col("p"), "UTF-8")).as("h"))
      .select(col("h.status"), col("h.content_type"), col("h.charset"),
        col("h.location"))
      .as[(Option[Int], Option[String], Option[String], Option[String])]
      .collect().toSeq
    assert(got === Seq(
      (Some(301), Some("text/html"), Some("UTF-8"), Some("https://n.com/x")),
      (None, None, None, None)))
    // declared-but-unresolvable charset: head yields null (it cannot
    // body-sniff), where the full envelope falls back to the body path
    val junkCs = "HTTP/1.1 200 OK\r\n" +
      "Content-Type: text/html; charset=not-a-charset\r\n\r\nx"
    val h2 = Seq(junkCs).toDF("p")
      .select(WebCorpus.httpHead(encode(col("p"), "UTF-8")).as("h"))
      .select(col("h.charset")).as[Option[String]].collect().head
    assert(h2 === None)
  }

  test("fromWarc decodes each gate-passing body exactly once (single-parse)") {
    val dir = java.nio.file.Files.createTempDirectory("warc_single")
      .toString + "/w"
    val rows = Seq(
      ("http://a.com/1",
        "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<p>one</p>"),
      ("http://a.com/2",
        "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<p>two</p>"),
      ("http://a.com/404",
        "HTTP/1.1 404 Not Found\r\nContent-Type: text/html\r\n\r\ngone"),
      ("http://a.com/json",
        "HTTP/1.1 200 OK\r\nContent-Type: application/json\r\n\r\n{}"),
      ("http://a.com/raw", "junk, not http"),
      ("http://a.com/empty",
        "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<script>x</script>"))
      .toDF("url", "payload")
    graft.sources.Warc.writeGzip(rows, dir, "url", "payload")
    // The counter is JVM-global, so a concurrent suite / task retry /
    // speculative re-evaluation could inflate ONE measurement: take up
    // to three delta measurements and pin the MINIMUM — interference
    // only ever adds decodes, so the clean run's delta is the floor,
    // and a structural double-parse regression inflates every run.
    val deltas = (1 to 3).iterator.map { _ =>
      val before = HttpKit.bodyDecodeCount.sum()
      val got = graft.ops.CorpusPipeline.fromWarc(spark, dir)
        .select("url", "text").as[(String, String)].collect().toSeq
      assert(got.sorted === Seq(("http://a.com/1", "one"),
        ("http://a.com/2", "two")))
      HttpKit.bodyDecodeCount.sum() - before
    }
    // 3 records pass the 2xx+HTML gate (/1, /2, /empty); each body is
    // copied/dechunked/inflated ONCE — the round-16 shape paid 2–3×
    // (full-envelope gate + filter-pushdown re-extraction + the
    // two-branch union rescanning the corpus).
    val best = deltas.takeWhile(_ != 3L).toSeq
    assert(best.size < 3,
      s"expected a 3-decode single-parse run in 3 tries, measured $best")
  }

  test("redirectGraph resolves scheme-relative and relative Locations (RFC 3986)") {
    def b(s: String): Array[Byte] = s.getBytes("UTF-8")
    val rows = Seq(
      // scheme-relative: a REAL cross-domain edge, not a self edge
      ("http://a.com/1",
        b("HTTP/1.1 301 X\r\nLocation: //other.net/x\r\n\r\n")),
      // relative path: resolves within the source domain
      ("http://a.com/2", b("HTTP/1.1 302 X\r\nLocation: /moved\r\n\r\n")),
      // absolute with dot segments: still the target's domain
      ("http://a.com/3",
        b("HTTP/1.1 301 X\r\nLocation: https://b.org/a/../n\r\n\r\n")))
      .toDF("url", "payload_bytes")
    val got = WebCorpus.redirectGraph(rows, "url", "payload_bytes")
      .orderBy("src_domain", "dst_domain")
      .as[(String, String, Long)].collect().toSeq
    assert(got === Seq(
      ("a.com", "a.com", 1L),
      ("a.com", "b.org", 1L),
      ("a.com", "other.net", 1L)))
  }
}
