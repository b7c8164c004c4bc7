package graft.queries

import graft.ops.WebCorpus
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Shared._

/** Catalog section 10 (round 16): the HTTP-message tier between WARC
  * payloads and the HTML tier — envelope parse (status/headers,
  * chunked + content-coding decode), charset-aware body decode, and
  * sitemap-driven recrawl budgeting (VERDICT r15 tasks 2/3/4). Every
  * oracle is relational over hand-derived per-variant literals — the
  * expected status/charset/decoded-text values are written out BY
  * HAND, never computed by a twin parser.
  */
private[queries] object QueriesExtra7 {

  def defs: Seq[QueryDef] =
    Seq(q401, q402, q403, q404, q405, q406, q407, q408, q409, q410)

  private def b64(b: Array[Byte]): String =
    java.util.Base64.getEncoder.encodeToString(b)

  private def gzBytes(s: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(s.getBytes("UTF-8")); g.close()
    bos.toByteArray
  }

  /** The q401/q402 HTTP-payload fixture, one variant per doc_id % 8.
    * Hand-derived facts per variant (mirrored literally in the
    * oracles): status / content_type / sniffed-charset-when-declared /
    * decoded-body BYTES / 2xx-html gate / non-empty extracted text.
    *
    *  0: 200 text/html + charset param, entity in body
    *  1: 404 text/html (status gate)
    *  2: 200 application/json (MIME gate)
    *  3: 301 redirect, empty body
    *  4: 200 text/html, chunked transfer (ext + trailer dropped)
    *  5: 200 text/html, gzip content-coding
    *  6: not HTTP at all (whole payload = body)
    *  7: 200 text/html whose body extracts to EMPTY text (script-only)
    *    — separates the gate count from the text count
    */
  private def httpVariants: Seq[Array[Byte]] = Seq(
    ("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n" +
      "<p>hello &amp; world</p>").getBytes("UTF-8"),
    ("HTTP/1.1 404 Not Found\r\nContent-Type: text/html\r\n\r\n" +
      "<p>gone</p>").getBytes("UTF-8"),
    ("HTTP/1.1 200 OK\r\nContent-Type: application/json\r\n\r\n" +
      "{\"a\":1}").getBytes("UTF-8"),
    ("HTTP/1.1 301 Moved Permanently\r\nLocation: https://e.com/\r\n" +
      "Content-Type: text/html\r\n\r\n").getBytes("UTF-8"),
    ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
      "Transfer-Encoding: chunked\r\n\r\n" +
      "e;ext=1\r\n<p>chunked</p>\r\n0\r\nX-Trailer: t\r\n\r\n")
      .getBytes("UTF-8"),
    ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
      "Content-Encoding: gzip\r\n\r\n").getBytes("UTF-8") ++
      gzBytes("<b>zipped</b>"),
    "plain, not HTTP".getBytes("UTF-8"),
    ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
      "<script>var x=1;</script>").getBytes("UTF-8"))

  /** The fixture payload as a BINARY column (base64 round trip — `elt`
    * over string literals, decoded once, stays codegen'd).
    */
  private def httpPayload(id: Column): Column =
    unbase64(elt((pmod(id, lit(8)) + 1).cast("int") +:
      httpVariants.map(v => lit(b64(v))): _*))

  /** Hand-derived oracle facts for [[httpVariants]], residue-keyed:
    * (r, status, content_type, charset, n_body, is_http, is_ok,
    * is_html, has_text).
    */
  private def httpFactsValues: String =
    """  (0, 200, 'text/html', 'UTF-8', 24, 1, 1, 1, 1),
      |  (1, 404, 'text/html', NULL, 11, 1, 0, 1, 0),
      |  (2, 200, 'application/json', NULL, 7, 1, 1, 0, 0),
      |  (3, 301, 'text/html', NULL, 0, 1, 0, 1, 0),
      |  (4, 200, 'text/html', NULL, 14, 1, 1, 1, 1),
      |  (5, 200, 'text/html', NULL, 13, 1, 1, 1, 1),
      |  (6, NULL, NULL, NULL, 15, 0, 0, 0, 0),
      |  (7, 200, 'text/html', NULL, 25, 1, 1, 1, 0)""".stripMargin

  private def q401 =
    // HTTP envelope fields per document (round 16, VERDICT r15 task
    // 2): status line, media type, declared-charset sniff, and the
    // de-chunked / content-decoded body length, per variant. The
    // oracle is a hand-derived VALUES table — the expected status,
    // type, charset, and BODY BYTE COUNT per variant are written by
    // hand (the chunked variant's 14 and the gzip variant's 13 are
    // the decoded lengths; a decode regression breaks the hash).
    QueryDef("q401_http_envelope",
      (s, dir) => {
        val e = WebCorpus.httpEnvelope(
          httpPayload(col("doc_id").cast("long")))
        t(s, dir, "documents")
          .select(col("doc_id"), e.as("__e"))
          .select(col("doc_id"),
            col("__e.status").as("status"),
            col("__e.content_type").as("content_type"),
            col("__e.charset").as("charset"),
            length(col("__e.body")).cast("long").as("n_body"),
            coalesce((col("__e.status") >= 200 &&
              col("__e.status") <= 299 &&
              (col("__e.content_type") === "text/html" ||
                col("__e.content_type") === "application/xhtml+xml"))
              .cast("int"), lit(0)).as("gated"))
          .orderBy("doc_id")
      },
      Some(
        s"""WITH v AS (SELECT * FROM (VALUES
           |$httpFactsValues)
           |  AS v(r, status, content_type, charset, n_body, is_http,
           |       is_ok, is_html, has_text))
           |SELECT d.doc_id, v.status, v.content_type, v.charset,
           |  CAST(v.n_body AS BIGINT) AS n_body,
           |  CAST(CASE WHEN v.is_ok = 1 AND v.is_html = 1
           |    THEN 1 ELSE 0 END AS INT) AS gated
           |FROM documents d JOIN v ON v.r = d.doc_id % 8
           |ORDER BY d.doc_id""".stripMargin))

  private def q402 =
    // Gated extraction funnel (round 16, VERDICT r15 task 2): the
    // status/MIME gate run BEFORE text extraction — per source, raw
    // payloads → parsed-as-HTTP → 2xx → html-typed → non-empty
    // extracted text. Variant 7 (script-only body) passes the gate
    // but extracts to empty, pinning the gate/text distinction; the
    // oracle aggregates the same hand-derived per-variant facts.
    QueryDef("q402_http_funnel",
      (s, dir) => {
        WebCorpus.httpFunnel(
          t(s, dir, "documents")
            .select(col("source"),
              httpPayload(col("doc_id").cast("long"))
                .as("payload_bytes")),
          "source", "payload_bytes")
          .orderBy("source")
      },
      Some(
        s"""WITH v AS (SELECT * FROM (VALUES
           |$httpFactsValues)
           |  AS v(r, status, content_type, charset, n_body, is_http,
           |       is_ok, is_html, has_text))
           |SELECT d.source,
           |  CAST(count(*) AS BIGINT) AS n_payloads,
           |  CAST(sum(v.is_http) AS BIGINT) AS n_http,
           |  CAST(sum(v.is_ok) AS BIGINT) AS n_ok,
           |  CAST(sum(v.is_html) AS BIGINT) AS n_html,
           |  CAST(sum(v.has_text) AS BIGINT) AS n_text
           |FROM documents d JOIN v ON v.r = d.doc_id % 8
           |GROUP BY d.source
           |ORDER BY d.source""".stripMargin))

  /** The q403 mixed-charset fixture, one variant per doc_id % 6, with
    * the expected (sniffed charset, decoded text) HAND-DERIVED per
    * variant and pasted into the oracle:
    *  0: Shift_JIS declared in the header, Japanese body
    *  1: no header charset; `<meta charset=iso-8859-1>` + 0xE9 byte
    *     (latin-1 label decodes as windows-1252 — the browser rule)
    *  2: raw (non-HTTP) UTF-8 body with BOM
    *  3: raw cp1252 high bytes (curly quotes), nothing declared
    *  4: raw UTF-16LE with BOM
    *  5: header says utf-8 but the body ends mid-sequence → U+FFFD
    */
  private def charsetVariants: Seq[Array[Byte]] = Seq(
    ("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=Shift_JIS" +
      "\r\n\r\n").getBytes("UTF-8") ++ "こんにちは".getBytes("Shift_JIS"),
    ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
      "<meta charset=iso-8859-1>caf").getBytes("UTF-8") ++
      Array[Byte](0xe9.toByte),
    Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++
      "ünïcode".getBytes("UTF-8"),
    Array[Byte](0x93.toByte) ++ "quote".getBytes("UTF-8") ++
      Array[Byte](0x94.toByte),
    Array[Byte](0xff.toByte, 0xfe.toByte) ++ "wide".getBytes("UTF-16LE"),
    ("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8" +
      "\r\n\r\nok ").getBytes("UTF-8") ++ Array[Byte](0xc3.toByte))

  private def q403 =
    // Charset-aware decode (round 16, VERDICT r15 task 3): the sniff
    // precedence (header param → meta tag → BOM → windows-1252) and
    // the REPLACE decode, each variant reduced to its (charset, text)
    // and counted. The oracle's expected text strings are hand-typed
    // UTF-8 literals — a sniff-order or decode regression (wrong
    // charset, unstripped BOM, thrown malformed byte) breaks the hash.
    QueryDef("q403_charset_decode",
      (s, dir) => {
        val payload = unbase64(
          elt((pmod(col("doc_id").cast("long"), lit(6)) + 1).cast("int")
            +: charsetVariants.map(v => lit(b64(v))): _*))
        t(s, dir, "documents")
          .select(pmod(col("doc_id"), lit(6)).cast("int").as("variant"),
            WebCorpus.httpCharset(payload).as("charset"),
            WebCorpus.httpText(payload).as("body_text"))
          .groupBy("variant", "charset", "body_text")
          .agg(count(lit(1)).as("n"))
          .orderBy("variant")
      },
      Some(
        """WITH v AS (SELECT * FROM (VALUES
          |  (0, 'Shift_JIS', 'こんにちは'),
          |  (1, 'windows-1252', '<meta charset=iso-8859-1>café'),
          |  (2, 'UTF-8', 'ünïcode'),
          |  (3, 'windows-1252', '“quote”'),
          |  (4, 'UTF-16LE', 'wide'),
          |  (5, 'UTF-8', 'ok �'))
          |  AS v(variant, charset, body_text))
          |SELECT CAST(v.variant AS INT) AS variant, v.charset,
          |  v.body_text, CAST(c.n AS BIGINT) AS n
          |FROM v JOIN (SELECT doc_id % 6 AS variant, count(*) AS n
          |             FROM documents GROUP BY 1) c
          |  ON c.variant = v.variant
          |ORDER BY variant""".stripMargin))

  private def q404 =
    // Sitemap-driven recrawl budget (round 16, VERDICT r15 task 4):
    // crawlBudget extended with parsed sitemap-file contents — per
    // domain, page volume × crawl-delay AND the <loc>/<lastmod>-driven
    // refetch count (fresh-since + undated). Fixtures cover a urlset
    // with fresh/stale/undated entries, a sitemapindex (same kernel),
    // junk XML, and a domain with robots but no sitemap row. The
    // oracle re-derives every column relationally from the residue
    // grid and hand-copied entry facts.
    QueryDef("q404_sitemap_recrawl",
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
          .select(concat(lit("http://"),
            elt((pmod(col("doc_id"), lit(4)) + 1).cast("int"),
              lit("a-site.com"), lit("b-site.org"), lit("c-site.net"),
              lit("d-site.de")),
            lit("/p"), pmod(col("doc_id"), lit(10))).as("url"))
        val robots = Seq(
          ("a-site.com", "User-agent: *\nCrawl-delay: 2\n" +
            "Sitemap: https://a-site.com/s.xml\n"),
          ("b-site.org", "User-agent: *\nDisallow:\n" +
            "Sitemap: https://b-site.org/s1.xml\n" +
            "Sitemap: https://b-site.org/s2.xml\n"),
          ("d-site.de", "User-agent: *\nCrawl-delay: 0.5\n"))
          .toDF("domain", "robots_txt")
        val sitemaps = Seq(
          ("a-site.com", "<urlset>" +
            "<url><loc>https://a-site.com/p1</loc>" +
            "<lastmod>2026-02-01</lastmod></url>" +
            "<url><loc>https://a-site.com/p2</loc>" +
            "<lastmod>2025-03-01</lastmod></url>" +
            "<url><loc>https://a-site.com/p3</loc></url></urlset>"),
          ("b-site.org", "<sitemapindex>" +
            "<sitemap><loc>https://b-site.org/s1.xml</loc>" +
            "<lastmod>2026-01-15T08:00:00Z</lastmod></sitemap>" +
            "<sitemap><loc>https://b-site.org/s2.xml</loc></sitemap>" +
            "</sitemapindex>"),
          ("c-site.net", "junk, no entries"))
          .toDF("domain", "sitemap_xml")
        WebCorpus.crawlBudgetWithSitemaps(docs, "url", robots,
            sitemaps, "domain", "sitemap_xml", "2026-01-01")
          .orderBy("domain")
      },
      Some(
        """WITH g AS (
          |  SELECT (['a-site.com','b-site.org','c-site.net',
          |           'd-site.de'])[doc_id % 4 + 1] AS domain,
          |    count(*) AS n_docs,
          |    count(DISTINCT doc_id % 10) AS n_pages
          |  FROM documents GROUP BY 1),
          |r AS (SELECT * FROM (VALUES
          |  ('a-site.com', 2.0, 1),
          |  ('b-site.org', NULL, 2),
          |  ('c-site.net', NULL, 0),
          |  ('d-site.de', 0.5, 0))
          |  AS r(domain, crawl_delay, n_sitemaps)),
          |m AS (SELECT * FROM (VALUES
          |  ('a-site.com', 3, 2, 2),
          |  ('b-site.org', 2, 1, 2),
          |  ('c-site.net', 0, 0, 0),
          |  ('d-site.de', 0, 0, 0))
          |  AS m(domain, n_sitemap_urls, n_dated, n_refetch))
          |SELECT g.domain,
          |  CAST(g.n_docs AS BIGINT) AS n_docs,
          |  CAST(g.n_pages AS BIGINT) AS n_pages,
          |  CAST(r.crawl_delay AS DOUBLE) AS crawl_delay,
          |  CAST(r.n_sitemaps AS INT) AS n_sitemaps,
          |  round(g.n_pages * coalesce(r.crawl_delay, 1.0), 1)
          |    AS budget_secs,
          |  CAST(m.n_sitemap_urls AS BIGINT) AS n_sitemap_urls,
          |  CAST(m.n_refetch AS BIGINT) AS n_refetch
          |FROM g JOIN r ON r.domain = g.domain
          |JOIN m ON m.domain = g.domain
          |ORDER BY g.domain""".stripMargin))

  /** The q406 redirect fixture, one variant per doc_id % 5 (mirrored
    * by hand in the oracle's CASE):
    *  0: 301 → absolute cross-domain target
    *  1: 302 → RELATIVE target (resolves to the source domain)
    *  2: 301 → absolute target on an unlisted registry (PSL default)
    *  3: 200 — not a redirect, contributes no edge
    *  4: 307 → absolute target that is a SELF edge for one source
    */
  private def redirectVariants: Seq[String] = Seq(
    "HTTP/1.1 301 Moved Permanently\r\nLocation: https://mirror.net/x" +
      "\r\n\r\n",
    "HTTP/1.1 302 Found\r\nLocation: /moved/here\r\n\r\n",
    "HTTP/1.1 301 Moved Permanently\r\nLocation: https://cdn.example/y" +
      "\r\n\r\n",
    "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<p>stay</p>",
    "HTTP/1.1 307 Temporary Redirect\r\nLocation: https://alpha.com/z" +
      "\r\n\r\n")

  private def q406 =
    // Redirect graph (round 16): 3xx Location targets reduced to
    // (src_domain, dst_domain) edges — the crawl-frontier input for
    // chasing moved content. Covers absolute cross-domain, RELATIVE
    // (must resolve to the source domain, never drop), an unlisted-
    // registry target (PSL default bucketing), a non-redirect, and a
    // self edge. The oracle replays the mapping as a hand-written
    // CASE over the residue grid — no URL or HTTP code involved.
    QueryDef("q406_redirect_graph",
      (s, dir) => {
        val docs = t(s, dir, "documents")
          .select(concat(lit("http://"),
            elt((pmod(col("doc_id"), lit(3)) + 1).cast("int"),
              lit("alpha.com"), lit("beta.org"), lit("gamma.net")),
            lit("/r/"), col("doc_id")).as("url"),
            encode(elt((pmod(col("doc_id"), lit(5)) + 1).cast("int") +:
              redirectVariants.map(lit): _*), "UTF-8")
              .as("payload_bytes"))
        WebCorpus.redirectGraph(docs, "url", "payload_bytes")
          .orderBy("src_domain", "dst_domain")
      },
      Some(
        """WITH j AS (
          |  SELECT (['alpha.com','beta.org','gamma.net'])
          |      [doc_id % 3 + 1] AS src,
          |    doc_id % 5 AS r
          |  FROM documents),
          |e AS (
          |  SELECT src,
          |    CASE r WHEN 0 THEN 'mirror.net' WHEN 1 THEN src
          |      WHEN 2 THEN 'cdn.example' WHEN 4 THEN 'alpha.com'
          |    END AS dst
          |  FROM j WHERE r IN (0, 1, 2, 4))
          |SELECT src AS src_domain, dst AS dst_domain,
          |  CAST(count(*) AS BIGINT) AS n_redirects
          |FROM e GROUP BY 1, 2
          |ORDER BY src_domain, dst_domain""".stripMargin))

  private def q407 =
    // Sitemap discovery (round 16): the Sitemap: line VALUES of each
    // domain's robots body — the URLs a recrawl fetches to feed q404's
    // entry parsing, closing the robots → sitemap-file → <loc> chain.
    // Fixtures: two sitemaps on one domain, a lowercase key + trailing
    // comment on another, a robots with NO sitemap lines, and a domain
    // with no robots at all (both → one '(none)' row via explode_outer
    // — absence is a row, not a dropped domain). Oracle = hand VALUES.
    QueryDef("q407_sitemap_discovery",
      (s, dir) => {
        import s.implicits._
        val robots = Seq(
          ("alpha.com", "User-agent: *\nDisallow:\n" +
            "Sitemap: https://alpha.com/s1.xml\n" +
            "Sitemap: https://alpha.com/s2.xml\n"),
          ("beta.org", "sitemap: https://beta.org/map.xml # main\n"),
          ("gamma.net", "User-agent: *\nDisallow: /x\n"))
          .toDF("domain", "robots_txt")
        t(s, dir, "documents")
          .select(elt((pmod(col("doc_id"), lit(4)) + 1).cast("int"),
            lit("alpha.com"), lit("beta.org"), lit("gamma.net"),
            lit("delta.de")).as("domain"))
          .groupBy("domain").agg(count(lit(1)).as("n_docs"))
          .join(broadcast(robots), Seq("domain"), "left")
          .select(col("domain"), col("n_docs"),
            explode_outer(WebCorpus.robotsSitemapUrls(col("robots_txt")))
              .as("__u"))
          .select(col("domain"), col("n_docs"),
            coalesce(col("__u"), lit("(none)")).as("sitemap_url"))
          .orderBy("domain", "sitemap_url")
      },
      Some(
        """WITH g AS (
          |  SELECT (['alpha.com','beta.org','gamma.net','delta.de'])
          |      [doc_id % 4 + 1] AS domain,
          |    count(*) AS n
          |  FROM documents GROUP BY 1),
          |m AS (SELECT * FROM (VALUES
          |  ('alpha.com', 'https://alpha.com/s1.xml'),
          |  ('alpha.com', 'https://alpha.com/s2.xml'),
          |  ('beta.org', 'https://beta.org/map.xml'),
          |  ('gamma.net', '(none)'),
          |  ('delta.de', '(none)'))
          |  AS m(domain, sitemap_url))
          |SELECT g.domain, CAST(g.n AS BIGINT) AS n_docs, m.sitemap_url
          |FROM g JOIN m ON m.domain = g.domain
          |ORDER BY g.domain, m.sitemap_url""".stripMargin))

  private def q408 =
    // Anchor-text graph (round 16): linkGraph edges enriched with the
    // most common anchor text per (src, dst) pair — the ranking/label
    // signal raw hrefs lack. Each doc links its successor domain with
    // a parity-driven text and carries a relative link (no registrable
    // domain → dropped). The oracle re-derives texts straight from the
    // residue grid and replays the count-then-text argmax with
    // arg_max over a (count, text) row — extraction never enters it.
    QueryDef("q408_anchor_graph",
      (s, dir) => {
        val hosts = Seq("alpha.com", "beta.org", "gamma.net")
        def hostAt(idx: Column): Column =
          elt((idx + 1).cast("int") +: hosts.map(lit): _*)
        val dst = hostAt(pmod(col("doc_id") + 1, lit(3)))
        val txt = when(pmod(col("doc_id"), lit(2)) === 0,
          lit("click here")).otherwise(lit("more details"))
        val docs = t(s, dir, "documents")
          .select(concat(lit("http://"),
            hostAt(pmod(col("doc_id"), lit(3))),
            lit("/p/"), col("doc_id")).as("url"),
            concat(lit("<p>intro</p><a href=\"https://"), dst,
              lit("/t\">"), txt,
              lit("</a><a href=\"/rel\">rel</a>")).as("html"))
        WebCorpus.anchorGraph(docs, "url", "html")
          .orderBy("src_domain", "dst_domain")
      },
      Some(
        """WITH j AS (
          |  SELECT (['alpha.com','beta.org','gamma.net'])
          |      [doc_id % 3 + 1] AS src,
          |    (['alpha.com','beta.org','gamma.net'])
          |      [(doc_id + 1) % 3 + 1] AS dst,
          |    CASE WHEN doc_id % 2 = 0 THEN 'click here'
          |      ELSE 'more details' END AS t
          |  FROM documents),
          |g AS (SELECT src, dst, t, count(*) AS c
          |      FROM j GROUP BY 1, 2, 3)
          |SELECT src AS src_domain, dst AS dst_domain,
          |  CAST(sum(c) AS BIGINT) AS n_links,
          |  -- (count, text) argmax as a zero-padded sortable string
          |  -- (DuckDB arg_max takes no struct ordering)
          |  arg_max(t, lpad(CAST(c AS VARCHAR), 12, '0') || '|' || t)
          |    AS top_anchor
          |FROM g GROUP BY 1, 2
          |ORDER BY src_domain, dst_domain""".stripMargin))

  private def q409 =
    // fromWarc capstone (round 16): the ONE-CALL crawl ingest —
    // directory → record-streaming read → envelope gate → charset
    // decode → HTML text → empty-drop → canonical-URL dedup — rolled
    // up per domain. The fixture's residue grid makes the dedup
    // oracle-stable: URLs collide on doc_id % 20 classes, and every
    // member of a class carries the IDENTICAL payload (payload is
    // doc_id % 5 and 5 | 20), so whichever capture the min-hash
    // keeps, the text is the same. The oracle enumerates the DISTINCT
    // classes present, keeps the 2xx-html ones, and sums hand-derived
    // text lengths — WARC/HTTP/HTML code never runs in it.
    QueryDef("q409_warc_ingest_capstone",
      (s, dir) => {
        val tmp = sys.props("java.io.tmpdir") + "/graft_warc_ingest_cap"
        val payloads = Seq(
          "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
            "<p>alpha doc</p>", // text "alpha doc" = 9 chars
          "HTTP/1.1 404 Not Found\r\nContent-Type: text/html\r\n\r\n" +
            "<p>gone</p>",
          "HTTP/1.1 200 OK\r\nContent-Type: application/json\r\n\r\n" +
            "{\"a\":1}",
          "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
            "<b>bravo</b>", // text "bravo" = 5 chars
          "plain junk, not http")
        val docs = t(s, dir, "documents")
          .select(concat(lit("http://"),
            elt((pmod(col("doc_id"), lit(4)) + 1).cast("int"),
              lit("alpha.com"), lit("beta.org"), lit("gamma.net"),
              lit("delta.de")),
            lit("/p"), pmod(col("doc_id"), lit(10))).as("url"),
            elt((pmod(col("doc_id"), lit(5)) + 1).cast("int") +:
              payloads.map(lit): _*).as("payload"))
        graft.sources.Warc.writeGzip(docs, tmp, "url", "payload")
        graft.ops.CorpusPipeline.fromWarc(s, tmp)
          .groupBy("domain")
          .agg(count(lit(1)).as("n_docs"),
            sum(length(col("text"))).as("text_chars"))
          .orderBy("domain")
      },
      Some(
        """WITH c AS (SELECT DISTINCT doc_id % 20 AS r FROM documents),
          |k AS (
          |  SELECT r,
          |    (['alpha.com','beta.org','gamma.net','delta.de'])
          |      [r % 4 + 1] AS domain,
          |    CASE WHEN r % 5 = 0 THEN 9 ELSE 5 END AS tc
          |  FROM c WHERE r % 5 IN (0, 3))
          |SELECT domain, CAST(count(*) AS BIGINT) AS n_docs,
          |  CAST(sum(tc) AS BIGINT) AS text_chars
          |FROM k GROUP BY domain
          |ORDER BY domain""".stripMargin))

  private def q410 =
    // Resolved link graph (round 16; variant 3 extended round 17):
    // RFC 3986 resolution before the domain fold — relative links
    // fold into their page (self edges drop), scheme-relative links
    // are REAL cross edges, a `<base href>` redirects a page's
    // relative links to another domain entirely, absolute links pass
    // through, and an absolute link with DOT SEGMENTS + a fragment
    // still keys its target domain (§5.2.2 on the reference's own
    // path, fragment-free frontier keys). The oracle
    // replays the per-variant destination as a hand-derived CASE over
    // the residue grid — no URL resolution code runs in it.
    QueryDef("q410_link_graph_resolved",
      (s, dir) => {
        val hosts = Seq("alpha.com", "beta.org", "gamma.net")
        def hostAt(idx: Column): Column =
          elt((idx + 1).cast("int") +: hosts.map(lit): _*)
        val html =
          when(pmod(col("doc_id"), lit(4)) === 0,
            lit("<a href=\"sib\">s</a><a href=\"//hub.net/x\">c</a>"))
          .when(pmod(col("doc_id"), lit(4)) === 1,
            lit("<head><base href=\"https://cdn-host.net/lib/\"></head>" +
              "<a href=\"w.js\">w</a>"))
          .when(pmod(col("doc_id"), lit(4)) === 2,
            concat(lit("<a href=\"https://"),
              hostAt(pmod(col("doc_id") + 1, lit(3))),
              lit("/y\">n</a>")))
          // round 17: an ABSOLUTE href with dot segments and a
          // fragment — §5.2.2 applies to the reference's own path and
          // the frontier key is fragment-free, so this is ONE edge to
          // mirror-x.net (plus a relative link folding into the page)
          .otherwise(lit("<a href=\"https://mirror-x.net/a/../y#f\">m" +
            "</a><a href=\"only-relative\">r</a>"))
        val docs = t(s, dir, "documents")
          .select(concat(lit("http://"),
            hostAt(pmod(col("doc_id"), lit(3))),
            lit("/dir/p"), pmod(col("doc_id"), lit(10))).as("url"),
            html.as("html"))
        WebCorpus.linkGraphResolved(docs, "url", "html")
          .orderBy("src_domain", "dst_domain")
      },
      Some(
        """WITH j AS (
          |  SELECT doc_id % 3 AS s, doc_id % 4 AS v FROM documents),
          |e AS (
          |  SELECT (['alpha.com','beta.org','gamma.net'])[s + 1] AS src,
          |    CASE v WHEN 0 THEN 'hub.net'
          |      WHEN 1 THEN 'cdn-host.net'
          |      WHEN 2 THEN (['alpha.com','beta.org','gamma.net'])
          |        [(s + 1) % 3 + 1]
          |      WHEN 3 THEN 'mirror-x.net'
          |    END AS dst
          |  FROM j WHERE v IN (0, 1, 2, 3))
          |SELECT src AS src_domain, dst AS dst_domain,
          |  CAST(count(*) AS BIGINT) AS n_links
          |FROM e GROUP BY 1, 2
          |ORDER BY src_domain, dst_domain""".stripMargin))

  /** q405's ASCII-safe HTTP payload subset (the WARC text sink carries
    * strings): variants 0–4, 6, 7 of [[httpVariants]] — gzip's binary
    * member is exercised by q401/q402 instead. Residue r → variant:
    * r 5 maps to variant 6 (non-HTTP), r 6 to variant 7 (script-only).
    */
  private def asciiHttpVariants: Seq[String] =
    (httpVariants.take(5) ++ httpVariants.drop(6))
      .map(new String(_, "UTF-8"))

  private def q405 =
    // WARC→HTTP→charset→text capstone (round 16): the full ingest a
    // real crawl slice runs — write a gzip WARC of HTTP response
    // messages, stream records back (readBinary — the record-streaming
    // walk, raw bytes), parse envelopes, gate on status/MIME, decode
    // charset-aware, extract text, roll up per domain. The oracle
    // never touches WARC/HTTP/HTML code: counts and hand-derived
    // per-variant text lengths over the residue grid.
    QueryDef("q405_warc_http_capstone",
      (s, dir) => {
        val tmp = sys.props("java.io.tmpdir") + "/graft_warc_http_capstone"
        val docs = t(s, dir, "documents")
          .select(concat(lit("http://"),
            elt((pmod(col("doc_id"), lit(3)) + 1).cast("int"),
              lit("alpha.com"), lit("beta.org"), lit("gamma.net")),
            lit("/d/"), col("doc_id")).as("url"),
            elt((pmod(col("doc_id"), lit(7)) + 1).cast("int") +:
              asciiHttpVariants.map(lit): _*).as("payload"))
        graft.sources.Warc.writeGzip(docs, tmp, "url", "payload")
        val read = graft.sources.Warc.readBinary(s, tmp)
        // head-only gate (round 17): the body decodes once, inside the
        // gated `when` below, never for the status/MIME check
        val e = WebCorpus.httpHead(col("payload_bytes"))
        val gate = col("__s") >= 200 && col("__s") <= 299 &&
          (col("__ct") === "text/html" ||
            col("__ct") === "application/xhtml+xml")
        read
          .select(WebCorpus.domain(col("url")).as("domain"),
            e.getField("status").as("__s"),
            e.getField("content_type").as("__ct"),
            col("payload_bytes"))
          .select(col("domain"),
            col("__s").isNotNull.cast("long").as("__http"),
            coalesce(gate.cast("long"), lit(0L)).as("__g"),
            when(gate, length(WebCorpus.htmlText(
              WebCorpus.httpText(col("payload_bytes")))).cast("long"))
              .otherwise(lit(0L)).as("__tc"))
          .groupBy("domain")
          .agg(count(lit(1)).as("n_records"),
            sum("__http").as("n_http"),
            sum("__g").as("n_gated"),
            sum("__tc").as("text_chars"))
          .orderBy("domain")
      },
      Some(
        // residue r = doc_id % 7 over the ASCII subset: r=5 is the
        // non-HTTP variant, gate passes for r ∈ {0,4,6}, extracted
        // text lengths: r0 "hello & world"=13, r4 "chunked"=7, r6
        // script-only = 0.
        """WITH j AS (
          |  SELECT (['alpha.com','beta.org','gamma.net'])
          |      [doc_id % 3 + 1] AS domain,
          |    doc_id % 7 AS r
          |  FROM documents)
          |SELECT domain,
          |  CAST(count(*) AS BIGINT) AS n_records,
          |  CAST(sum(CASE WHEN r = 5 THEN 0 ELSE 1 END) AS BIGINT)
          |    AS n_http,
          |  CAST(sum(CASE WHEN r IN (0, 4, 6) THEN 1 ELSE 0 END)
          |    AS BIGINT) AS n_gated,
          |  CAST(sum(CASE r WHEN 0 THEN 13 WHEN 4 THEN 7 ELSE 0 END)
          |    AS BIGINT) AS text_chars
          |FROM j GROUP BY domain
          |ORDER BY domain""".stripMargin))
}
