package graft

import graft.functions.UrlKit
import graft.ops.WebCorpus
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** URL canonicalization / registrable-domain semantics and the
  * WebCorpus dedup/report layers.
  */
class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(s: String): String =
    Option(UrlKit.canon(UTF8String.fromString(s))).map(_.toString).orNull
  private def dom(s: String): String =
    Option(UrlKit.registrableDomain(UTF8String.fromString(s)))
      .map(_.toString).orNull

  test("canon folds case, ports, tracking params, order, fragments") {
    assert(canon("HTTP://News.Example.COM:80/a/b?x=1#top")
      === "http://news.example.com/a/b?x=1")
    assert(canon("https://example.com:443/") === "https://example.com/")
    // Non-default port survives; http:443 is NOT default.
    assert(canon("http://example.com:443/") === "http://example.com:443/")
    assert(canon("https://example.com:8080") === "https://example.com:8080/")
    // Tracking strip is key-prefix (utm_*) + click-id set, case-insensitive.
    assert(canon("http://e.com/?utm_source=x&b=2&a=1&UTM_Medium=m&gclid=9")
      === "http://e.com/?a=1&b=2")
    // Duplicate keys survive, byte-sorted as whole k=v segments.
    assert(canon("http://e.com/p?b=2&a=1&a=0") === "http://e.com/p?a=0&a=1&b=2")
    // All params tracking -> no '?' at all.
    assert(canon("http://e.com/p?fbclid=1&ref=home") === "http://e.com/p")
    // Userinfo dropped, trailing host dot stripped, empty path -> /.
    assert(canon("https://u:pw@EXAMPLE.org.") === "https://example.org/")
    // Path bytes preserved: no %-decode, no case fold, no dot collapse.
    assert(canon("http://e.com/A/../B%20c") === "http://e.com/A/../B%20c")
  }

  test("canon refuses non-http(s) and malformed authorities") {
    assert(canon("javascript:void(0)") === null)
    assert(canon("ftp://example.com/a") === null)
    assert(canon("/relative/path") === null)
    assert(canon("http://e.com:80x/") === null)
    assert(canon("http:///path") === null)
  }

  test("hostile ports: overflow and out-of-range are null, never a throw") {
    // All-digit but Int-overflowing — the toInt crash the r14 advice
    // flagged: must be null (total-on-junk contract), not an exception.
    assert(canon("http://e.com:99999999999999/") === null)
    assert(canon("http://e.com:4294967296/") === null)
    // In-range ports still work; >65535 is unfetchable -> null.
    assert(canon("http://e.com:65535/") === "http://e.com:65535/")
    assert(canon("http://e.com:65536/") === null)
    assert(dom("http://e.com:99999999999999/") === null)
    // And through the Spark expression path, not just the kernel.
    val got = Seq("http://e.com:99999999999999/x", "http://e.com:81/x")
      .toDF("url")
      .select(WebCorpus.canonUrl(col("url"))).as[Option[String]]
      .collect().toSeq
    assert(got === Seq(None, Some("http://e.com:81/x")))
  }

  test("registrable domain honors the bundled multi-label suffixes") {
    assert(dom("http://News.Example.co.uk/x") === "example.co.uk")
    assert(dom("https://sub.Blog.github.io") === "blog.github.io")
    assert(dom("http://cdn.assets.example.com") === "example.com")
    assert(dom("http://plain.de/") === "plain.de")
    assert(dom("http://localhost:8080/") === "localhost")
    // The bare suffix itself has no registrable label below it.
    assert(dom("http://co.uk/") === "co.uk")
    assert(dom("mailto:x@example.com") === null)
  }

  test("bundled PSL: ccTLD registries, wildcards, exceptions") {
    // The r14 advice cases: suffixes the old 25-entry approximation
    // grouped wrong.
    assert(dom("http://www.example.com.sg/") === "example.com.sg")
    assert(dom("http://foo.gov.au/x") === "foo.gov.au")
    // A spread of registry families (VERDICT task 6: 10+ cases).
    assert(dom("http://a.b.example.co.jp/") === "example.co.jp")
    assert(dom("http://shop.example.com.br/") === "example.com.br")
    assert(dom("http://x.example.co.in/") === "example.co.in")
    assert(dom("http://x.example.ac.uk/") === "example.ac.uk")
    assert(dom("http://x.example.gob.mx/") === "example.gob.mx")
    assert(dom("http://x.example.co.za/") === "example.co.za")
    assert(dom("http://x.example.or.kr/") === "example.or.kr")
    assert(dom("http://x.example.gouv.fr/") === "example.gouv.fr")
    assert(dom("http://city.k12.tr/") === "city.k12.tr")
    assert(dom("http://x.example.waw.pl/") === "example.waw.pl")
    assert(dom("http://school.ca.us/") === "school.ca.us")
    assert(dom("http://x.assembly.on.ca/") === "assembly.on.ca")
    // PaaS private-section entries.
    assert(dom("http://app.myshopify.com/") === "app.myshopify.com")
    assert(dom("http://x.site.netlify.app/") === "site.netlify.app")
    assert(dom("http://b.blogspot.com.br/") === "b.blogspot.com.br")
    // Wildcard rule *.np: ANY second level is a registry.
    assert(dom("http://www.example.com.np/") === "example.com.np")
    assert(dom("http://www.example.whatever.np/") === "example.whatever.np")
    // Wildcard + exception: *.ck but !www.ck.
    assert(dom("http://foo.bar.ck/") === "foo.bar.ck")
    assert(dom("http://sub.www.ck/") === "www.ck")
    // Longest match wins over the implicit TLD default.
    assert(dom("http://only.com/") === "only.com")
  }

  test("urlDedupGroups collapses variants; domainReport counts pages") {
    val docs = Seq(
      (1L, "http://Example.com:80/p?utm_source=a"),
      (2L, "HTTP://example.com/p"),
      (3L, "http://example.com/p#frag"),
      (4L, "https://example.com/p"), // different scheme: NOT a dup
      (5L, "http://other.co.uk/q?b=2&a=1"),
      (6L, "http://other.co.uk/q?a=1&b=2"),
      (7L, "not a url")).toDF("doc_id", "url")
    val groups = WebCorpus.urlDedupGroups(docs, "doc_id", "url")
      .orderBy("canon_url")
      .as[(String, Long, Long)].collect().toSeq
    assert(groups === Seq(
      ("http://example.com/p", 1L, 3L),
      ("http://other.co.uk/q?a=1&b=2", 5L, 2L)))
    val rep = WebCorpus.domainReport(docs, "url")
      .orderBy("domain")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(rep === Seq(
      // bare-TLD .com hosts ride the implicit default rule (the
      // bundled subset lists no single-label TLDs) -> counted;
      // co.uk is an exact bundled rule -> 0
      ("(invalid)", 1L, 0L, 1000000L, 0L),
      ("example.com", 4L, 2L, 500000L, 4L),
      ("other.co.uk", 2L, 1L, 500000L, 0L)))
  }

  test("pslKind reports the rule kind the domain lookup used") {
    import graft.functions.UrlKit
    def kind(u: String): String = {
      val r = UrlKit.pslKind(UTF8String.fromString(u))
      if (r == null) null else r.toString
    }
    assert(kind("http://www.example.co.uk/") === "exact")
    assert(kind("http://x.app.myshopify.com/") === "exact")
    assert(kind("http://foo.bar.ck/") === "wildcard")
    assert(kind("http://sub.www.ck/") === "exception")
    // bare TLD: implicit * rule
    assert(kind("http://www.example.com/") === "default")
    assert(kind("http://a.b.example.zz/") === "default")
    assert(kind("http://localhost/") === "default")
    assert(kind("not a url") === null)
  }

  test("urlDedup keeps the min-id doc per canonical key; invalids pass") {
    val docs = Seq(
      (5L, "HTTP://e.com/p?utm_source=x"),
      (2L, "http://e.com/p"),
      (9L, "http://e.com/p#f"),
      (3L, "https://e.com/p"), // distinct canon (scheme)
      (7L, "junk")).toDF("doc_id", "url")
    val kept = WebCorpus.urlDedup(docs, "doc_id", "url")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept === Seq(2L, 3L, 7L))
  }

  test("urlDedup: colliding ids keep ONE survivor; one scan, one shuffle") {
    // Round 18 (VERDICT r17 task 5): the q409 bug class — two docs
    // with the SAME (hash-derived) id and the same canonical URL. The
    // old `id === min(id)` join-back kept BOTH; the min_by form keeps
    // exactly one, tie-broken on the raw URL (utm variant sorts after
    // the bare URL).
    val docs = Seq(
      (4L, "http://c.com/p", "bare"),
      (4L, "http://c.com/p?utm_source=x", "variant"),
      (6L, "http://c.com/p#f", "loser"))
      .toDF("doc_id", "url", "tag")
    val kept = WebCorpus.urlDedup(docs, "doc_id", "url")
      .select("doc_id", "tag").as[(Long, String)].collect().toSeq
    assert(kept === Seq((4L, "bare")), s"got $kept")
    // Plan shape: the single-groupBy form scans the source ONCE and
    // shuffles ONCE (no join-back, no second filtered union branch —
    // the round-16 double-parse shape rescanned per branch).
    val plan = WebCorpus.urlDedup(docs, "doc_id", "url")
      .queryExecution.executedPlan.toString
    def count(hay: String, needle: String): Int =
      hay.sliding(needle.length).count(_ == needle)
    assert(count(plan, "Exchange") === 1, s"expected 1 shuffle:\n$plan")
    assert(count(plan, "LocalTableScan") === 1 &&
      !plan.contains("Union"), s"expected 1 scan, no union:\n$plan")
  }

  test("domainCap keeps a stable md5-priority sample per domain") {
    val docs = (1L to 10L).map(i =>
        (i, if (i <= 8) s"http://site-${i % 2}.com/p$i" else "junk"))
      .toDF("doc_id", "url")
    val kept = WebCorpus.domainCap(docs, "doc_id", "url", maxPerDomain = 2)
      .select("doc_id").as[Long].collect().toSet
    // Two domains capped at 2 each + both unattributable docs.
    assert(kept.size === 6)
    assert(Set(9L, 10L).subsetOf(kept), "invalid URLs pass uncapped")
    // Deterministic: the same call returns the same set.
    val again = WebCorpus.domainCap(docs, "doc_id", "url", 2)
      .select("doc_id").as[Long].collect().toSet
    assert(again === kept)
    // Priority is md5-of-id: recompute the expected winners.
    def md5(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val expect = (1L to 8L).groupBy(_ % 2).values.flatMap(ids =>
      ids.sortBy(i => (md5(i.toString), i)).take(2)).toSet ++ Set(9L, 10L)
    assert(kept === expect)
    val rep = WebCorpus.domainCapReport(docs, "doc_id", "url", 2)
      .orderBy("domain").as[(String, Long, Long)].collect().toSeq
    assert(rep === Seq(("(invalid)", 2L, 2L),
      ("site-0.com", 4L, 2L), ("site-1.com", 4L, 2L)))
  }

  test("robots rules: longest prefix wins, Allow breaks ties, groups respected") {
    import graft.functions.RobotsKit
    def ok(robots: String, path: String): Boolean =
      RobotsKit.allowed(UTF8String.fromString(path),
        UTF8String.fromString(robots))
    val r1 = "User-agent: *\nDisallow: /a\nAllow: /a/b\n"
    assert(!ok(r1, "/a/x") && ok(r1, "/a/b/c") && ok(r1, "/other"))
    // Empty Disallow value = nothing disallowed (RFC).
    assert(ok("User-agent: *\nDisallow:\n", "/anything"))
    // Rules for another agent never apply to *.
    assert(ok("User-agent: bot\nDisallow: /\n", "/x"))
    // Consecutive user-agent lines share one group; a user-agent line
    // AFTER rules starts a new group.
    assert(!ok("User-agent: bot\nUser-agent: *\nDisallow: /\n", "/x"))
    assert(ok("User-agent: bot\nDisallow: /\nUser-agent: other\nDisallow: /y\n", "/y"))
    // Same-length tie: Allow wins. Comments stripped.
    assert(ok("User-agent: *\nDisallow: /p # no\nAllow: /p\n", "/p/q"))
    // Paths are case-sensitive.
    assert(ok("User-agent: *\nDisallow: /A\n", "/a/b"))
    assert(!ok("User-agent: *\nDisallow: /A\n", "/A/B"))
  }

  test("robots per-agent groups: exact token beats *, fallback to *") {
    import graft.functions.RobotsKit
    def okFor(robots: String, path: String, agent: String): Boolean =
      RobotsKit.allowedFor(UTF8String.fromString(path),
        UTF8String.fromString(robots), agent)
    val r = "User-agent: *\nDisallow: /priv\n" +
      "User-agent: GraftBot\nDisallow: /bot-only\nAllow: /priv\n"
    // The specific group REPLACES the * group for that agent (RFC 9309
    // §2.2.1): GraftBot is ruled only by its own group.
    assert(okFor(r, "/priv/x", "GraftBot"), "agent group overrides *")
    assert(!okFor(r, "/bot-only/x", "GraftBot"))
    // Agent tokens compare case-insensitively.
    assert(!okFor(r, "/bot-only/x", "graftbot"))
    // Everyone else still gets the * group.
    assert(!okFor(r, "/priv/x", "OtherBot"))
    assert(okFor(r, "/bot-only/x", "OtherBot"))
    // No matching specific group and no * group -> allowed.
    assert(okFor("User-agent: x\nDisallow: /\n", "/p", "y"))
    // Two groups naming the same agent merge (like multiple * groups).
    val r2 = "User-agent: a\nDisallow: /one\n" +
      "User-agent: b\nDisallow: /z\n" +
      "User-agent: a\nDisallow: /two\n"
    assert(!okFor(r2, "/one", "a") && !okFor(r2, "/two", "a"))
    assert(okFor(r2, "/z", "a") && !okFor(r2, "/z", "b"))
    // allowed(…) is allowedFor(…, "*") — the wildcard identity.
    assert(RobotsKit.allowed(UTF8String.fromString("/priv/x"),
      UTF8String.fromString(r)) === okFor(r, "/priv/x", "*"))
  }

  test("robotsAudit with an agent: specific group drives the verdict") {
    val docs = Seq(
      (1L, "http://example.com/a/x"),
      (2L, "http://example.com/b/x")).toDF("doc_id", "url")
    val robots = Seq(
      ("example.com",
        "User-agent: *\nDisallow: /a\n" +
          "User-agent: GraftBot\nDisallow: /b\n"))
      .toDF("domain", "robots_txt")
    val star = WebCorpus.robotsAudit(docs, "doc_id", "url", robots)
      .orderBy("doc_id").as[(Long, Option[String], Option[Int])]
      .collect().map(_._3).toSeq
    val bot = WebCorpus.robotsAudit(docs, "doc_id", "url", robots,
        agent = "GraftBot")
      .orderBy("doc_id").as[(Long, Option[String], Option[Int])]
      .collect().map(_._3).toSeq
    assert(star === Seq(Some(0), Some(1)))
    assert(bot === Seq(Some(1), Some(0)))
  }

  test("robots §2.2.3 special characters: * wildcards, $ end anchor") {
    import graft.functions.RobotsKit
    def ok(robots: String, path: String): Boolean =
      RobotsKit.allowed(UTF8String.fromString(path),
        UTF8String.fromString(robots))
    // '*' matches any octet sequence, including empty.
    val r1 = "User-agent: *\nDisallow: /*/b\n"
    assert(!ok(r1, "/a/b") && !ok(r1, "/x/y/b2") && ok(r1, "/b"))
    // '$' anchors the end; only there — elsewhere it is a literal.
    val r2 = "User-agent: *\nDisallow: /index.html$\n"
    assert(!ok(r2, "/index.html") && ok(r2, "/index.html?x=1"))
    val r3 = "User-agent: *\nDisallow: /a$b\n"
    assert(!ok(r3, "/a$b/c") && ok(r3, "/ab"))
    // exact-root block: Disallow /$ blocks ONLY "/".
    val r4 = "User-agent: *\nDisallow: /$\n"
    assert(!ok(r4, "/") && ok(r4, "/x"))
    // specificity is RAW rule length (special chars count): the 4-char
    // wildcard rule ties the 4-char literal Allow -> Allow wins.
    val r5 = "User-agent: *\nDisallow: /*/b\nAllow: /a/b\n"
    assert(ok(r5, "/a/b") && !ok(r5, "/c/b"))
    // longer wildcard rule beats a shorter literal one.
    val r6 = "User-agent: *\nAllow: /p\nDisallow: /p*q2\n"
    assert(!ok(r6, "/p%20q2") && ok(r6, "/p%20q"))
    // regex metacharacters in rules are literal bytes.
    val r7 = "User-agent: *\nDisallow: /a.b\n"
    assert(!ok(r7, "/a.b") && ok(r7, "/axb"))
    // wildcard-free rules keep exact prefix semantics (back-compat).
    val r8 = "User-agent: *\nDisallow: /a\nAllow: /a/b\n"
    assert(!ok(r8, "/a/x") && ok(r8, "/a/b/c") && ok(r8, "/other"))
  }

  test("hostile wildcard rules cannot blow up the matcher (no regex backtracking)") {
    import graft.functions.RobotsKit
    // The classic NFA-regex bomb: many '*' segments ending in an
    // anchor, against a long non-matching path. The iterative glob
    // matcher is O(n·m); under java.util.regex this shape hangs.
    val bomb = "User-agent: *\nDisallow: " +
      ("*a" * 20) + "$\n"
    val path = "/" + ("a" * 2000) + "b"
    val t0 = System.nanoTime()
    val v = RobotsKit.allowed(UTF8String.fromString(path),
      UTF8String.fromString(bomb))
    val ms = (System.nanoTime() - t0) / 1e6
    assert(v, "the anchored bomb rule must NOT match the b-terminated path")
    assert(ms < 2000, s"hostile rule took ${ms}ms — matcher is not linear-ish")
    // and the same rule still matches when it should
    assert(!RobotsKit.allowed(
      UTF8String.fromString("/" + ("a" * 50)),
      UTF8String.fromString(bomb)))
  }

  test("crawl-delay: agent group selection, junk skipped, max across groups") {
    import graft.functions.RobotsKit
    def delay(robots: String, agent: String): Option[Double] =
      Option(RobotsKit.crawlDelayFor(UTF8String.fromString(robots), agent))
        .map(_.doubleValue())
    // §2.2.1 selection: bot gets ITS group's delay, * gets the * one.
    val r = "User-agent: GraftBot\nCrawl-delay: 0.5\n" +
      "User-agent: *\nCrawl-delay: 10\n"
    assert(delay(r, "GraftBot") === Some(0.5))
    assert(delay(r, "*") === Some(10.0))
    // No specific group -> fallback to *; no * group -> none.
    assert(delay(r, "OtherBot") === Some(10.0))
    assert(delay("User-agent: b\nCrawl-delay: 3\n", "*") === None)
    // Junk value skipped; the next valid one in the group wins.
    assert(delay("User-agent: *\nCrawl-delay: soon\nCrawl-delay: 2\n",
      "*") === Some(2.0))
    // Negative / non-finite rejected.
    assert(delay("User-agent: *\nCrawl-delay: -1\n", "*") === None)
    // Two groups for the same agent: largest (politeness-conservative).
    assert(delay("User-agent: a\nCrawl-delay: 1\n" +
      "User-agent: b\nDisallow: /\n" +
      "User-agent: a\nCrawl-delay: 4\n", "a") === Some(4.0))
    // Sitemap lines: file-wide count, comments and empties excluded.
    def sm(robots: String): Int =
      RobotsKit.sitemapCount(UTF8String.fromString(robots))
    assert(sm("Sitemap: https://e.com/a.xml\nUser-agent: *\n" +
      "Disallow: /\nSitemap: https://e.com/b.xml\n") === 2)
    assert(sm("# Sitemap: commented\nSitemap:\n") === 0)
  }

  test("crawlBudget: broadcast politeness dim, default delay for silent sites") {
    val docs = Seq(
      (1L, "http://a.com/1"), (2L, "http://a.com/2"),
      (3L, "http://a.com/2#frag"), // same canonical page as 2
      (4L, "http://b.org/x"), (5L, "junk"))
      .toDF("doc_id", "url")
    val robots = Seq(
      ("a.com", "User-agent: *\nCrawl-delay: 2.5\nSitemap: s.xml\n"))
      .toDF("domain", "robots_txt")
    val got = WebCorpus.crawlBudget(docs, "url", robots)
      .orderBy("domain")
      .as[(String, Long, Long, Option[Double], Int, Double)]
      .collect().toSeq
    assert(got === Seq(
      ("(invalid)", 1L, 0L, None, 0, 0.0),
      ("a.com", 3L, 2L, Some(2.5), 1, 5.0),
      ("b.org", 1L, 1L, None, 0, 1.0)))
    val plan = WebCorpus.crawlBudget(docs, "url", robots)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("robotsAuditMulti: K agents in ONE scan — no extra join, verdicts match") {
    val docs = Seq(
      (1L, "http://example.com/a/x"),
      (2L, "http://example.com/b/x"),
      (3L, "junk")).toDF("doc_id", "url")
    val robots = Seq(
      ("example.com",
        "User-agent: *\nDisallow: /a\n" +
          "User-agent: GraftBot\nDisallow: /b\n"))
      .toDF("domain", "robots_txt")
    val multi = WebCorpus.robotsAuditMulti(docs, "doc_id", "url",
      robots, Seq("*", "GraftBot"))
    val got = multi.orderBy("doc_id")
      .as[(Long, Option[String], Option[Int], Option[Int])]
      .collect().toSeq
    assert(got === Seq(
      (1L, Some("example.com"), Some(0), Some(1)),
      (2L, Some("example.com"), Some(1), Some(0)),
      (3L, None, None, None)))
    // One broadcast join total: auditing K agents must not re-scan
    // the corpus or self-join per agent.
    val plan = multi.queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(plan).size === 1, plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("robotsAudit: per-site config broadcast, defaults honored") {
    val docs = Seq(
      (1L, "http://shop.Example.com/a/x"),
      (2L, "http://shop.example.com/a/b"),
      (3L, "http://other.org/x"),   // no robots on record -> allowed
      (4L, "garbage"))              // no verdict possible
      .toDF("doc_id", "url")
    val robots = Seq(
      ("example.com", "User-agent: *\nDisallow: /a\nAllow: /a/b\n"))
      .toDF("domain", "robots_txt")
    val got = WebCorpus.robotsAudit(docs, "doc_id", "url", robots)
      .orderBy("doc_id")
      .as[(Long, Option[String], Option[Int])].collect().toSeq
    assert(got === Seq(
      (1L, Some("example.com"), Some(0)),
      (2L, Some("example.com"), Some(1)),
      (3L, Some("other.org"), Some(1)),
      (4L, None, None)))
  }

  test("resolve: RFC 3986 reference resolution against an http(s) base") {
    def res(base: String, href: String): String = {
      val r = UrlKit.resolve(UTF8String.fromString(base),
        UTF8String.fromString(href))
      if (r == null) null else r.toString
    }
    val b = "http://a.com/dir/page.html?q=1"
    // absolute reference: verbatim
    assert(res(b, "https://other.org/x") === "https://other.org/x")
    assert(res(b, "mailto:x@y.z") === "mailto:x@y.z")
    // scheme-relative
    assert(res(b, "//cdn.net/lib.js") === "http://cdn.net/lib.js")
    // absolute path replaces the base path
    assert(res(b, "/root/x") === "http://a.com/root/x")
    // relative merges with the base DIRECTORY
    assert(res(b, "sib.html") === "http://a.com/dir/sib.html")
    assert(res(b, "sub/x?y=2") === "http://a.com/dir/sub/x?y=2")
    // dot segments collapse on the merged path (§5.2.4)
    assert(res(b, "../up.html") === "http://a.com/up.html")
    assert(res(b, "./here") === "http://a.com/dir/here")
    assert(res(b, "../../../over.html") === "http://a.com/over.html")
    assert(res(b, "/a/./b/../c") === "http://a.com/a/c")
    // §5.2.2 applies to an absolute reference's OWN path too:
    // http://x/b/../c and http://x/c must key ONE frontier entry
    assert(res(b, "https://o.org/a/../n") === "https://o.org/n")
    assert(res(b, "http://o.org/./x/y/../z?k=1") === "http://o.org/x/z?k=1")
    // scheme-relative references get the same treatment
    assert(res(b, "//cdn.net/a/./lib.js") === "http://cdn.net/a/lib.js")
    // query-only and fragment-only references
    assert(res(b, "?fresh=1") === "http://a.com/dir/page.html?fresh=1")
    assert(res(b, "#frag") === "http://a.com/dir/page.html?q=1")
    // every resolved output is FRAGMENT-FREE (a frontier must not key
    // /x and /x#f as two pages)
    assert(res(b, "/x#sec") === "http://a.com/x")
    assert(res(b, "sib.html#top") === "http://a.com/dir/sib.html")
    assert(res(b, "?q=2#frag") === "http://a.com/dir/page.html?q=2")
    assert(res(b, "https://o.org/p#f") === "https://o.org/p")
    // trailing-slash handling
    assert(res("http://a.com/d/", "x/") === "http://a.com/d/x/")
    assert(res("http://a.com/d/", "..") === "http://a.com/")
    // ports and non-default schemes survive
    assert(res("https://a.com:8443/p/q", "/r") === "https://a.com:8443/r")
    // junk base or empty href -> null
    assert(res("not a url", "/x") === null)
    assert(res(b, "  ") === null)
  }

  test("IDN hosts normalize to punycode: unicode and xn-- spellings key once") {
    import graft.functions.UrlKit
    def canon(u: String): String = {
      val r = UrlKit.canon(UTF8String.fromString(u))
      if (r == null) null else r.toString
    }
    // the unicode spelling and its punycode twin are ONE site
    assert(canon("http://bücher.example/p") ===
      canon("http://xn--bcher-kva.example/p"))
    assert(canon("http://bücher.example/p") ===
      "http://xn--bcher-kva.example/p")
    // mixed-case unicode folds before encoding
    assert(canon("http://BÜCHER.example/") ===
      "http://xn--bcher-kva.example/")
    // registrable domain sees the punycode form too
    def dom(u: String): String = {
      val r = UrlKit.registrableDomain(UTF8String.fromString(u))
      if (r == null) null else r.toString
    }
    assert(dom("http://shop.bücher.example/x") ===
      dom("http://shop.xn--bcher-kva.example/x"))
    // ASCII hosts take the fast path untouched
    assert(canon("http://plain.example/p") === "http://plain.example/p")
  }

  test("robots rules match path INCLUDING the query string (RFC 9309 §2.2.2)") {
    import graft.functions.UrlKit
    def pq(u: String): String = {
      val r = UrlKit.pathQueryOf(UTF8String.fromString(u))
      if (r == null) null else r.toString
    }
    // the match-target kernel: raw query rides, fragment never does
    assert(pq("http://e.com/p?a=1&b=2") === "/p?a=1&b=2")
    assert(pq("http://e.com/p") === "/p")
    assert(pq("http://e.com?x=1#f") === "/?x=1")
    assert(pq("not a url") === null)
    // the classic session-id rule fires only when the query is seen
    val robots = Seq(("e.com",
      "User-agent: *\nDisallow: /*?*sessionid=\nDisallow: /p$\n"))
      .toDF("domain", "robots_txt")
    val docs = Seq(
      (1L, "http://e.com/a?sessionid=99"), // blocked via query rule
      (2L, "http://e.com/a?x=1"),          // allowed
      (3L, "http://e.com/p"),              // blocked: /p$ anchors
      (4L, "http://e.com/p?x=1"))          // allowed: query breaks the $
      .toDF("doc_id", "url")
    val got = WebCorpus.robotsAudit(docs, "doc_id", "url", robots)
      .orderBy("doc_id")
      .as[(Long, Option[String], Option[Int])].collect().toSeq
    assert(got.map(t => (t._1, t._3)) === Seq(
      (1L, Some(0)), (2L, Some(1)), (3L, Some(0)), (4L, Some(1))))
  }

  test("a UTF-8 BOM on the first robots line is tolerated (RFC 9309 §2.3)") {
    import graft.functions.RobotsKit
    val bom = "\uFEFF"
    val r = bom + "User-agent: *\nDisallow: /priv\nSitemap: https://e.com/s.xml\n"
    // without tolerance the first user-agent line is lost and /priv
    // silently becomes allowed
    assert(!RobotsKit.allowed(UTF8String.fromString("/priv/x"),
      UTF8String.fromString(r)))
    assert(RobotsKit.sitemapCount(UTF8String.fromString(
      bom + "Sitemap: https://e.com/s.xml\n")) === 1)
    assert(RobotsKit.sitemapUrls(UTF8String.fromString(
      bom + "Sitemap: https://e.com/s.xml\n")).map(_.toString).toSeq ===
      Seq("https://e.com/s.xml"))
  }

  test("sitemapUrls emits the Sitemap line values in file order") {
    import graft.functions.RobotsKit
    def urls(robots: String): Seq[String] =
      RobotsKit.sitemapUrls(UTF8String.fromString(robots))
        .map(_.toString).toSeq
    val r = "User-agent: *\nDisallow: /a\n" +
      "Sitemap: https://e.com/s1.xml\n" +
      "sitemap: https://e.com/s2.xml # comment\n" +
      "Sitemap:\n" + // empty value -> nothing
      "NotSitemap: https://no.com/x\n"
    assert(urls(r) === Seq("https://e.com/s1.xml", "https://e.com/s2.xml"))
    assert(urls("") === Seq.empty)
    // count and values agree by construction
    assert(RobotsKit.sitemapCount(UTF8String.fromString(r)) === 2)
  }

  test("robots rule cache is LRU: hot keys survive cold-key floods") {
    import graft.functions.RobotsKit
    RobotsKit.cacheClearForTest()
    val hot = "User-agent: *\nDisallow: /hot\n"
    def touch(body: String): Unit =
      RobotsKit.allowed(UTF8String.fromString("/x"),
        UTF8String.fromString(body))
    touch(hot)
    val hotKey = RobotsKit.cacheKeysForTest.head
    // Flood with > MaxCacheEntries distinct cold bodies, re-touching
    // the hot one periodically; old clear-all would drop it, LRU keeps
    // it resident throughout.
    (0 until 9000).foreach { i =>
      touch(s"User-agent: *\nDisallow: /cold/$i\n")
      if (i % 500 == 0) touch(hot)
    }
    val keys = RobotsKit.cacheKeysForTest
    assert(keys.size <= 8192)
    assert(keys.contains(hotKey), "hot key evicted by cold flood")
    // and the earliest cold keys are the ones gone
    touch("User-agent: *\nDisallow: /cold/0\n") // re-parse, re-inserts
    RobotsKit.cacheClearForTest()
  }

  test("the canonicalization select plans with no exchange") {
    val docs = Seq((1L, "http://e.com/")).toDF("doc_id", "url")
    val plan = docs.select(WebCorpus.canonUrl(col("url")),
        WebCorpus.domain(col("url")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
