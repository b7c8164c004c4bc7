package graft

import graft.functions.HtmlKit
import graft.ops.WebCorpus
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** HTML → text / link extraction: scanner semantics (tags, comments,
  * script/style, quoted attributes, entities, whitespace collapse),
  * totality on broken markup, and the op layer's plan shape.
  */
class HtmlSpec extends SparkSpec {
  import spark.implicits._

  private def text(s: String): String =
    HtmlKit.text(UTF8String.fromString(s)).toString
  private def links(s: String): Seq[String] = {
    val a = HtmlKit.links(UTF8String.fromString(s))
    (0 until a.numElements()).map(i =>
      a.getUTF8String(i).toString)
  }

  test("tags are word boundaries; comments and script/style contents drop") {
    assert(text("<p>a</p><p>b</p>") === "a b")
    assert(text("<!-- <p>never</p> -->real") === "real")
    assert(text("<script>var a = 1 < 2; 'text'</script>after") === "after")
    assert(text("<style>p > span { color: red }</style>x") === "x")
    assert(text("<noscript>enable js</noscript>y") === "y")
    // case-insensitive close tags; content until the matching close
    assert(text("<SCRIPT>skip</SCRIPT>kept") === "kept")
    // inline tags still split words (the minimal-contract choice)
    assert(text("a<b>b</b>c") === "a b c")
  }

  test("quoted attributes may contain '>' — the naive-stripper trap") {
    assert(text("""<a href="/x" title="a>b">link</a>""") === "link")
    assert(text("""<img alt='x > y'/>tail""") === "tail")
  }

  test("character references decode once, junk passes through") {
    assert(text("a &amp; b") === "a & b")
    assert(text("&lt;p&gt; is not a tag") === "<p> is not a tag")
    assert(text("&#65;&#x42;&#x63;") === "ABc")
    assert(text("&quot;q&quot; &apos;a&apos;") === "\"q\" 'a'")
    // nbsp is whitespace: collapses like any space
    assert(text("a&nbsp;&nbsp;b") === "a b")
    // unknown / malformed / unterminated -> raw, never a throw
    assert(text("&zzz; &amp &#xZZ; &#99999999999;") ===
      "&zzz; &amp &#xZZ; &#99999999999;")
    // decode is single-pass: &amp;lt; is "&lt;", NOT "<"
    assert(text("&amp;lt;") === "&lt;")
  }

  test("the high-frequency named entities of real pages decode (round 16)") {
    assert(text("a&mdash;b &ndash; c&hellip;") === "a—b – c…")
    assert(text("&ldquo;q&rdquo; &lsquo;a&rsquo;") === "“q” ‘a’")
    assert(text("&copy;2026 &reg; &trade; 20&deg;") === "©2026 ® ™ 20°")
    assert(text("&euro;5 &pound;3 &yen;800 50&cent;") === "€5 £3 ¥800 50¢")
    assert(text("2&times;3 6&divide;2 &plusmn;1 5&micro;m") ===
      "2×3 6÷2 ±1 5µm")
    assert(text("&laquo;x&raquo; &bull; a&middot;b &sect;2 &para;") ===
      "«x» • a·b §2 ¶")
    // soft hyphen is zero-width: drops, never a space
    assert(text("hy&shy;phen") === "hyphen")
    // still single-pass and unknown-raw
    assert(text("&amp;mdash; &notanentity;") === "&mdash; &notanentity;")
  }

  test("whitespace collapses to single spaces, trimmed") {
    assert(text("  a \n\t b  ") === "a b")
    assert(text("<p>  </p>") === "")
    assert(text("") === "")
  }

  test("total on broken markup: unterminated constructs never throw") {
    assert(text("<p unclosed") === "")
    assert(text("<!-- never closed") === "")
    assert(text("<script>var x = 1;") === "")
    assert(text("""<a href="unterminated""") === "")
    assert(text("text < not a tag") === "text")
    assert(text("a<>b") === "a b")
  }

  test("links: hrefs in document order, quoting styles, entity decode") {
    val h = """<a href="https://a.com/1">x</a>
      |<a title="t" HREF='https://b.org/2?x=1&amp;y=2'>y</a>
      |<a href=https://c.net/3>z</a>
      |<a name="no-href">w</a>
      |<area href="https://not-an-a.com"/>""".stripMargin
    assert(links(h) === Seq(
      "https://a.com/1", "https://b.org/2?x=1&y=2", "https://c.net/3"))
    // closing tags and empty hrefs contribute nothing
    assert(links("""</a><a href="">e</a>""") === Seq.empty)
  }

  test("href needs an attribute-name left boundary (lazy-load markup)") {
    // data-href is NOT href: the real href after it must win
    assert(links("""<a data-href="/lazy" href="/real">x</a>""") ===
      Seq("/real"))
    assert(links("""<a xhref="/no" href="/yes">x</a>""") === Seq("/yes"))
    // and a lone data-href captures nothing
    assert(links("""<a data-href="/lazy">x</a>""") === Seq.empty)
    // underscore prefix is a name too
    assert(links("""<a _href="/no">x</a>""") === Seq.empty)
    // still matches after quote / tab / newline separators
    assert(links("<a\thref=\"/t\">x</a>") === Seq("/t"))
    assert(links("<a x=\"1\"href=\"/q\">x</a>") === Seq("/q"))
  }

  test("script close-tag needs a name right boundary (</scripting>)") {
    // </scripting> must NOT end the skip; script content stays dropped
    assert(text("<script>a</scripting>leak</script>kept") === "kept")
    assert(text("<style>x</styles>y</style>z") === "z")
    // real close tags with whitespace / self-slash still close
    assert(text("<script>a</script >b") === "b")
    assert(text("<script>a</script\n>b") === "b")
    // truncated close tag at EOF stays total
    assert(text("<script>a</script") === "")
  }

  private def anchors(s: String): Seq[(String, String)] = {
    val a = HtmlKit.anchors(UTF8String.fromString(s))
    (0 until a.numElements()).map { i =>
      val r = a.getStruct(i, 2)
      (r.getUTF8String(0).toString, r.getUTF8String(1).toString)
    }
  }

  test("anchors pair hrefs with collapsed anchor text") {
    assert(anchors("""<a href="/x">click <b>here</b></a> tail""") ===
      Seq(("/x", "click here")))
    // entities decode inside anchor text; inner tags are boundaries
    assert(anchors("""<a href="/y">a&amp;b</a>""") === Seq(("/y", "a&b")))
    // multiple anchors in order; empty text allowed
    assert(anchors("""<a href="/1">one</a><a href="/2"></a>""") ===
      Seq(("/1", "one"), ("/2", "")))
    // an unclosed anchor flushes at the next <a> (browser recovery)
    assert(anchors("""<a href="/u">lost<a href="/v">kept</a>""") ===
      Seq(("/u", "lost"), ("/v", "kept")))
    // script content inside an anchor never leaks into its text
    assert(anchors("""<a href="/s">ok<script>bad()</script>fine</a>""") ===
      Seq(("/s", "ok fine")))
    // no-href anchors contribute nothing; data-href is not href
    assert(anchors("""<a name="n">skip</a><a data-href="/d">no</a>""") ===
      Seq.empty)
    // unclosed at EOF still flushes
    assert(anchors("""<a href="/e">end""") === Seq(("/e", "end")))
    // whitespace collapse matches the text contract
    assert(anchors("<a href=\"/w\">  a \n b  </a>") === Seq(("/w", "a b")))
    // hostile unclosed anchor: capture caps at 512 chars, total
    val huge = "<a href=\"/h\">" + ("x" * 100000)
    val got = anchors(huge)
    assert(got.size === 1 && got.head._1 === "/h")
    assert(got.head._2.length === 512)
  }

  test("baseHref finds the first <base href>; boundaries and junk hold") {
    def base(s: String): String = {
      val r = HtmlKit.baseHref(UTF8String.fromString(s))
      if (r == null) null else r.toString
    }
    assert(base("""<head><base href="https://cdn.x.com/"></head>""") ===
      "https://cdn.x.com/")
    assert(base("<base href=/rel/>x") === "/rel/")
    // first one wins; basefont is NOT base; data-href is not href
    assert(base("""<basefont size=1><base data-href="/no" href="/a">
      |<base href="/b">""".stripMargin) === "/a")
    // entity decode, absent href, junk
    assert(base("""<base href="/p?a=1&amp;b=2">""") === "/p?a=1&b=2")
    assert(base("<base target=_blank>x") === null)
    assert(base("no base here") === null)
    assert(base("<base href=") === null)
  }

  test("linkGraphResolved: relative and base-redirected links become edges") {
    val docs = Seq(
      // relative links resolve to the page host -> self edges drop,
      // but the scheme-relative one is a REAL cross edge
      ("http://a.com/dir/p", "<a href=\"sib\">s</a>" +
        "<a href=\"//b.org/x\">c</a>"),
      // <base> redirects this page's relative links to another domain
      ("http://a.com/q", "<head><base href=\"https://cdn-host.net/lib/\">" +
        "</head><a href=\"w.js\">w</a><a href=\"/abs\">a</a>"))
      .toDF("url", "html")
    val got = WebCorpus.linkGraphResolved(docs, "url", "html")
      .orderBy("src_domain", "dst_domain")
      .as[(String, String, Long)].collect().toSeq
    // base-relative w.js -> cdn-host.net/lib/w.js; /abs -> cdn-host.net/abs
    assert(got === Seq(
      ("a.com", "b.org", 1L),
      ("a.com", "cdn-host.net", 2L)))
  }

  test("anchor capture does not disturb text/links outputs") {
    val h = """<p>pre</p><a href="/x">mid</a><p>post</p>"""
    assert(text(h) === "pre mid post")
    assert(links(h) === Seq("/x"))
  }

  test("textExtractionReport and linkGraph: narrow pass, one keyed rollup") {
    val docs = Seq(
      ("s1", "http://a.com/p", "<p>hello <b>world</b></p>" +
        """<a href="https://b.org/x">t</a>"""),
      ("s1", "http://a.com/q", """<a href="/rel">self</a>plain"""),
      ("s2", "http://b.org/r", """<a href="https://a.com/y">u</a>"""))
      .toDF("source", "url", "html")
    val rep = WebCorpus.textExtractionReport(docs, "source", "html")
      .orderBy("source")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(rep.map(r => (r._1, r._2)) === Seq(("s1", 2L), ("s2", 1L)))
    rep.foreach { case (_, _, h, t, ppm) =>
      assert(h > t && ppm > 0L && ppm < 1000000L)
    }
    val edges = WebCorpus.linkGraph(docs, "url", "html")
      .orderBy("src_domain", "dst_domain")
      .as[(String, String, Long)].collect().toSeq
    // relative link -> no domain -> dropped; cross edges survive
    assert(edges === Seq(("a.com", "b.org", 1L), ("b.org", "a.com", 1L)))
    // plan: extraction is a narrow projection (no exchange)
    val plan = docs.select(WebCorpus.htmlText(col("html")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
