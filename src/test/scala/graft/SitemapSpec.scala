package graft

import graft.functions.SitemapKit
import graft.ops.WebCorpus
import org.apache.spark.sql.functions._

/** Sitemap `<loc>`/`<lastmod>` extraction and the recrawl rollup:
  * block pairing, index files, entity decode, totality on junk.
  */
class SitemapSpec extends SparkSpec {
  import spark.implicits._

  private def entries(xml: String): Seq[(String, String)] =
    SitemapKit.entries(xml)

  test("urlset entries pair loc with their own block's lastmod") {
    val xml = """<?xml version="1.0" encoding="UTF-8"?>
      |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      |  <url><loc>https://e.com/a</loc><lastmod>2026-01-03</lastmod></url>
      |  <url><lastmod>2026-02-01</lastmod><loc>https://e.com/b</loc></url>
      |  <url><loc>https://e.com/undated</loc></url>
      |  <url><priority>0.5</priority></url>
      |</urlset>""".stripMargin
    assert(entries(xml) === Seq(
      ("https://e.com/a", "2026-01-03"),
      ("https://e.com/b", "2026-02-01"),
      ("https://e.com/undated", null)))
  }

  test("sitemapindex files parse with the same kernel; wrappers don't match") {
    val idx = """<sitemapindex>
      |  <sitemap><loc>https://e.com/s1.xml</loc>
      |    <lastmod>2026-03-01T12:00:00+00:00</lastmod></sitemap>
      |  <sitemap><loc>https://e.com/s2.xml</loc></sitemap>
      |</sitemapindex>""".stripMargin
    assert(entries(idx) === Seq(
      ("https://e.com/s1.xml", "2026-03-01T12:00:00+00:00"),
      ("https://e.com/s2.xml", null)))
  }

  test("loc values are trimmed and entity-decoded (spec-required escaping)") {
    val xml = "<urlset><url><loc>\n  https://e.com/p?a=1&amp;b=2 \n" +
      "</loc></url></urlset>"
    assert(entries(xml) === Seq(("https://e.com/p?a=1&b=2", null)))
  }

  test("total on junk: broken wrappers, unterminated blocks, case variants") {
    // bare <loc> with no url/sitemap blocks still yields entries
    assert(entries("<foo><loc>https://x.com/1</loc></foo>") ===
      Seq(("https://x.com/1", null)))
    // unterminated block at EOF: loc still found inside the tail
    assert(entries("<urlset><url><loc>https://x.com/t</loc>") ===
      Seq(("https://x.com/t", null)))
    // case-insensitive tags
    assert(entries("<URLSET><URL><LOC>https://x.com/c</LOC></URL></URLSET>")
      === Seq(("https://x.com/c", null)))
    // empty / self-closed / absent locs contribute nothing
    assert(entries("<urlset><url><loc></loc></url><url><loc/></url></urlset>")
      === Seq.empty)
    // a self-closed BLOCK must not swallow the entries after it
    assert(entries("<urlset><url/><url><loc>https://x.com/a</loc>" +
      "</url></urlset>") === Seq(("https://x.com/a", null)))
    assert(entries("") === Seq.empty)
    assert(entries("not xml at all") === Seq.empty)
  }

  test("sitemapRecrawl: dated vs fresh vs undated-refetch per domain") {
    val maps = Seq(
      ("a.com", "<urlset>" +
        "<url><loc>https://a.com/1</loc><lastmod>2026-01-10</lastmod></url>" +
        "<url><loc>https://a.com/2</loc><lastmod>2025-06-01</lastmod></url>" +
        "<url><loc>https://a.com/3</loc></url></urlset>"),
      ("b.org", "<urlset><url><loc>https://b.org/x</loc>" +
        "<lastmod>junk-date</lastmod></url></urlset>"),
      ("c.net", "no sitemap here"))
      .toDF("domain", "sitemap_xml")
    val got = WebCorpus.sitemapRecrawl(maps, "domain", "sitemap_xml",
        "2026-01-01")
      .orderBy("domain")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      // 3 urls, 2 dated, refetch = 1 fresh + 1 undated = 2
      ("a.com", 3L, 2L, 2L),
      // unparseable lastmod counts as undated -> refetch
      ("b.org", 1L, 0L, 1L),
      ("c.net", 0L, 0L, 0L)))
  }

  test("crawlBudgetWithSitemaps composes budget and refetch; broadcast joins only") {
    val docs = Seq(
      ("http://a.com/p1", 1), ("http://a.com/p2", 2),
      ("http://b.org/q", 3)).toDF("url", "id")
    val robots = Seq(
      ("a.com", "User-agent: *\nCrawl-delay: 2\nSitemap: https://a.com/s.xml\n"))
      .toDF("domain", "robots_txt")
    val maps = Seq(
      ("a.com", "<urlset><url><loc>https://a.com/p1</loc>" +
        "<lastmod>2026-02-01</lastmod></url></urlset>"))
      .toDF("domain", "sitemap_xml")
    val df = WebCorpus.crawlBudgetWithSitemaps(docs, "url", robots,
      maps, "domain", "sitemap_xml", "2026-01-01")
    val got = df.orderBy("domain")
      .as[(String, Long, Long, Option[Double], Int, Double, Long, Long)]
      .collect().toSeq
    assert(got === Seq(
      ("a.com", 2L, 2L, Some(2.0), 1, 4.0, 1L, 1L),
      ("b.org", 1L, 1L, None, 0, 1.0, 0L, 0L)))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }
}
