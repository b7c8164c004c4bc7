package graft

import graft.functions.HttpKit
import org.scalacheck.{Gen, Prop, Properties}

/** Structural invariants of the HTTP envelope / charset tier — pure
  * kernels, hundreds of trials:
  *
  *  - the envelope parse is TOTAL on arbitrary bytes and, when the
  *    payload is not an HTTP message, byte-preserving (body == input);
  *  - chunked decode inverts a well-formed chunked encoding exactly,
  *    for any body bytes and any chunking split;
  *  - the decode kernel never throws for any (bytes, label) pair and
  *    sniff always lands on a JVM-resolvable charset;
  *  - a round-tripped gzip content-coding is identity on body bytes.
  */
object HttpPropertySpec extends Properties("Http") {

  private val rawBytes: Gen[Array[Byte]] =
    Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
      .map(_.toArray)

  // bytes that can never be mistaken for an HTTP message
  private val nonHttp: Gen[Array[Byte]] =
    rawBytes.suchThat(b =>
      !(b.length >= 12 && b.take(5).sameElements("HTTP/".getBytes)))

  property("parseEnvelope is total; non-HTTP payloads are byte-preserved") =
    Prop.forAll(nonHttp) { b =>
      val e = HttpKit.parseEnvelope(b)
      e.status == null && java.util.Arrays.equals(e.body, b)
    }

  property("parseEnvelope never throws on HTTP-prefixed junk either") =
    Prop.forAll(rawBytes) { tail =>
      val e = HttpKit.parseEnvelope("HTTP/1.1 ".getBytes("UTF-8") ++ tail)
      e.body != null
    }

  private val chunkSplit: Gen[List[Int]] =
    Gen.nonEmptyListOf(Gen.chooseNum(1, 64))

  property("dechunk inverts any well-formed chunked encoding") =
    Prop.forAll(rawBytes, chunkSplit) { (body, sizes) =>
      // carve body into chunks following `sizes` (cycled), emit the
      // exact RFC framing, and require byte-identical recovery
      val out = new java.io.ByteArrayOutputStream()
      var off = 0
      var i = 0
      while (off < body.length) {
        val n = math.min(sizes(i % sizes.length), body.length - off)
        out.write(s"${n.toHexString}\r\n".getBytes("UTF-8"))
        out.write(body, off, n)
        out.write("\r\n".getBytes("UTF-8"))
        off += n
        i += 1
      }
      out.write("0\r\n\r\n".getBytes("UTF-8"))
      val header = ("HTTP/1.1 200 OK\r\n" +
        "Transfer-Encoding: chunked\r\n\r\n").getBytes("UTF-8")
      val e = HttpKit.parseEnvelope(header ++ out.toByteArray)
      java.util.Arrays.equals(e.body, body)
    }

  property("gzip content-coding round-trips any body bytes") =
    Prop.forAll(rawBytes) { body =>
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(body); g.close()
      val header = ("HTTP/1.1 200 OK\r\n" +
        "Content-Encoding: gzip\r\n\r\n").getBytes("UTF-8")
      val e = HttpKit.parseEnvelope(header ++ bos.toByteArray)
      java.util.Arrays.equals(e.body, body)
    }

  private val charsetLabel: Gen[String] = Gen.oneOf(
    "utf-8", "UTF8", "latin1", "iso-8859-1", "windows-1252",
    "shift_jis", "euc-jp", "utf-16le", "not-a-charset", "x--",
    "", "UTF-8;evil", "a" * 100)

  property("sniff resolves and decode is total for any (bytes, label)") =
    Prop.forAll(rawBytes, charsetLabel) { (body, label) =>
      val sniffed = HttpKit.sniffCharset(
        if (label.isEmpty) null else label, body)
      java.nio.charset.Charset.isSupported(sniffed) &&
        HttpKit.decode(body, label) != null
    }

  property("sitemap entries extraction is total on junk") =
    Prop.forAll(Gen.asciiPrintableStr, rawBytes) { (s, b) =>
      (graft.functions.SitemapKit.entries(s) != null) &&
        (graft.functions.SitemapKit.entries(
          new String(b,
            java.nio.charset.StandardCharsets.ISO_8859_1)) != null)
    }
}
