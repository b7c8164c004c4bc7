package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Web-corpus URL hygiene — the step BEFORE text dedup in every
  * crawl-derived pipeline: collapse each page's URL variants (scheme /
  * host case, default ports, tracking parameters, query order,
  * fragments) to one canonical key, attribute documents to registrable
  * domains (eTLD+1), and dedup/report on those keys.
  *
  * Everything per-row is one fused native expression
  * ([[graft.functions.UrlKit]]) riding the corpus scan — no
  * regexp_replace chains, no UDFs. The only shuffles group on the
  * canonical key (URL-dedup grain) or the registrable domain (at most
  * |sites| groups, map-side combined) — at 100 TB both are the
  * smallest keys the problem admits.
  */
object WebCorpus {

  /** Canonical dedup key; null for anything not a parseable http(s)
    * URL (relative links, javascript:, data: — the crawler's problem,
    * not the dedup key's).
    */
  def canonUrl(url: Column): Column = call_function("graft_urlcanon", url)

  /** Registrable domain (bundled-PSL eTLD+1); null on non-http(s). */
  def domain(url: Column): Column = call_function("graft_urldomain", url)

  /** URL-level dedup groups: canonical keys carrying ≥ minDups raw
    * URLs, with the keeper (minimum id) and the variant count. Rows
    * whose URL doesn't canonicalize never group.
    */
  def urlDedupGroups(docs: DataFrame, idCol: String, urlCol: String,
      minDups: Long = 2L): DataFrame =
    docs
      .select(col(idCol), canonUrl(col(urlCol)).as("canon_url"))
      .where(col("canon_url").isNotNull)
      .groupBy("canon_url")
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_urls"))
      .where(col("n_urls") >= minDups)

  /** Canonical path component (empty → "/"); null on non-http(s). */
  def urlPath(url: Column): Column = call_function("graft_urlpath", url)

  /** Path + raw query (`/p?a=1`) — the RFC 9309 §2.2.2 robots MATCH
    * TARGET: rules apply to the path including the query string, so
    * a wildcard session-id Disallow rule must see the query. Every robots
    * audit/gate in this module matches against THIS, not [[urlPath]].
    */
  def urlPathQuery(url: Column): Column =
    call_function("graft_urlpathq", url)

  /** robots.txt verdict ([[graft.functions.RobotsKit]]): RFC 9309
    * group selection — the groups naming `agent` exactly
    * (case-insensitive) if any, else the `*` groups — then the
    * longest-matching prefix rule decides, Allow wins ties, no rule →
    * allowed. Null when either side is null. The agent is a plan-time
    * literal: one audit runs as one crawler identity.
    */
  def robotsAllowed(path: Column, robotsTxt: Column,
      agent: String = "*"): Column =
    call_function("graft_robots_allowed", path, robotsTxt, lit(agent))

  /** Crawl-compliance audit: each document's URL judged against its
    * registrable domain's robots.txt. `robots` is per-site CONFIG
    * (domain, robots_txt) — dimension-sized, so the join broadcasts;
    * the verdict is one cached-parse prefix match per row riding the
    * corpus scan. Documents with no robots on record are `allowed`
    * (the RFC default for a missing file); documents whose URL does
    * not canonicalize get a null verdict — they cannot be fetched, so
    * compliance is moot and the null keeps them countable.
    */
  def robotsAudit(docs: DataFrame, idCol: String, urlCol: String,
      robots: DataFrame, agent: String = "*"): DataFrame = {
    val d = docs
      .withColumn("domain", domain(col(urlCol)))
      .withColumn("__path", urlPathQuery(col(urlCol)))
    d.join(broadcast(robots), Seq("domain"), "left")
      .select(col(idCol), col("domain"),
        when(col("__path").isNull, lit(null).cast("int"))
          .otherwise(coalesce(
            robotsAllowed(col("__path"), col("robots_txt"), agent),
            lit(true))
            .cast("int"))
          .as("allowed"))
  }

  /** Multi-agent compliance audit: one verdict column PER crawler
    * identity (`allowed_<agent, lowercased/sanitized>`), all computed
    * in ONE corpus scan off the same broadcast robots join — auditing
    * K agents costs K cached-parse prefix matches per row, never K
    * scans or a K-way self-join. The column set is plan-time config
    * (a compliance report audits a known bot list).
    */
  def robotsAuditMulti(docs: DataFrame, idCol: String, urlCol: String,
      robots: DataFrame, agents: Seq[String]): DataFrame = {
    val sanitized = agents.map(_.toLowerCase(java.util.Locale.ROOT)
      .replaceAll("[^a-z0-9]", "_"))
    require(sanitized.distinct.size == agents.size,
      s"agents collide after column-name sanitization: $agents")
    val d = docs
      .withColumn("domain", domain(col(urlCol)))
      .withColumn("__path", urlPathQuery(col(urlCol)))
    val verdicts = agents.map { a =>
      val colName = "allowed_" +
        a.toLowerCase(java.util.Locale.ROOT)
          .replaceAll("[^a-z0-9]", "_")
      when(col("__path").isNull, lit(null).cast("int"))
        .otherwise(coalesce(
          robotsAllowed(col("__path"), col("robots_txt"), a), lit(true))
          .cast("int"))
        .as(colName)
    }
    d.join(broadcast(robots), Seq("domain"), "left")
      .select(col(idCol) +: col("domain") +: verdicts: _*)
  }

  /** Extracted plain text of an HTML payload
    * ([[graft.functions.HtmlKit]]): comments / script / style dropped,
    * tags are word boundaries, common character references decoded,
    * whitespace collapsed. The WARC→text step of a crawl pipeline —
    * one narrow codegen'd pass riding the corpus scan.
    */
  def htmlText(html: Column): Column =
    call_function("graft_html_text", html)

  /** `href` values of `<a>` tags, in document order, entities decoded.
    */
  def htmlLinks(html: Column): Column =
    call_function("graft_html_links", html)

  /** Parsed HTTP response envelope of a raw WARC payload
    * ([[graft.functions.HttpKit]]): struct(status, content_type,
    * charset, body) — de-chunked, content-decoded; non-HTTP payloads
    * yield null status with the whole payload as body.
    */
  def httpEnvelope(payloadBytes: Column): Column =
    call_function("graft_http", payloadBytes)

  /** HEADER-ONLY envelope parse of a raw WARC payload
    * ([[graft.functions.HttpKit.headRow]]): struct(status,
    * content_type, charset, location) with the body left untouched —
    * no copy, no dechunk, no inflate. Status/MIME gates should ride
    * THIS: Catalyst's predicate pushdown may duplicate a filter
    * expression across operators, and a duplicated head parse rescans
    * a few hundred header bytes where a duplicated [[httpEnvelope]]
    * re-inflates the body (the round-16 `fromWarc` double-decode).
    * `charset` here is the DECLARED header param only (normalized;
    * null when absent/unresolvable).
    */
  def httpHead(payloadBytes: Column): Column =
    call_function("graft_http_head", payloadBytes)

  /** Charset-aware body text of a raw WARC payload: envelope parse,
    * charset sniff (header param → meta tag → BOM → windows-1252),
    * REPLACE-decode. The lossless replacement for forcing UTF-8 on
    * crawl bytes (~15–20% of the real web is non-UTF-8).
    */
  def httpText(payloadBytes: Column): Column =
    call_function("graft_http_text", payloadBytes)

  /** The charset a [[httpText]] decode uses — always non-null, so a
    * windows-1252-defaulted decode is measurable, not silent.
    */
  def httpCharset(payloadBytes: Column): Column =
    call_function("graft_http_charset", payloadBytes)

  /** HTTP→text gated funnel: per source, how many raw payloads parsed
    * as HTTP messages, returned 2xx, carried an HTML media type, and
    * survived to non-empty extracted text — the status/MIME gate run
    * BEFORE text extraction, so error pages and binary bodies never
    * reach the HTML scanner. One narrow codegen'd pass + one
    * |sources|-keyed combinable rollup; the conditional `when` means
    * the decode+extract kernel runs only on rows that passed the gate.
    */
  def httpFunnel(docs: DataFrame, sourceCol: String,
      payloadBytesCol: String): DataFrame = {
    // Gate fields off the HEAD parse: status/content_type need no body
    // work, so the funnel's body decode runs only inside the gated
    // `when` below — once per gate-passing row, never for the 4xx /
    // non-HTML / non-HTTP majority of a real crawl cut.
    val e = httpHead(col(payloadBytesCol))
    docs
      .select(col(sourceCol), e.getField("status").as("__status"),
        e.getField("content_type").as("__ct"), col(payloadBytesCol))
      .select(col(sourceCol),
        col("__status").isNotNull.cast("int").as("__http"),
        (col("__status") >= 200 && col("__status") <= 299)
          .cast("int").as("__ok"),
        (col("__ct") === "text/html" ||
          col("__ct") === "application/xhtml+xml")
          .cast("int").as("__html"),
        when(col("__status") >= 200 && col("__status") <= 299 &&
            (col("__ct") === "text/html" ||
              col("__ct") === "application/xhtml+xml"),
          (length(htmlText(httpText(col(payloadBytesCol)))) > 0)
            .cast("int"))
          .otherwise(lit(0)).as("__text"))
      .groupBy(sourceCol)
      .agg(count(lit(1)).as("n_payloads"),
        sum("__http").as("n_http"),
        coalesce(sum("__ok"), lit(0L)).as("n_ok"),
        coalesce(sum("__html"), lit(0L)).as("n_html"),
        sum("__text").as("n_text"))
  }

  /** `array<struct<href, text>>` anchors of an HTML payload
    * ([[graft.functions.HtmlKit.anchors]]): each href-carrying `<a>`
    * paired with its collapsed anchor text.
    */
  def htmlAnchors(html: Column): Column =
    call_function("graft_html_anchors", html)

  /** The `Sitemap:` URL values of a robots body, file order. */
  def robotsSitemapUrls(robotsTxt: Column): Column =
    call_function("graft_robots_sitemap_urls", robotsTxt)

  /** Anchor-text graph: the [[linkGraph]] edges enriched with the
    * text the web uses to describe each target — per cross-domain
    * (src, dst) pair, the link count and the MOST COMMON non-empty
    * anchor text (count-then-text `max_by` argmax, deterministic on
    * ties). Anchor text is the classic ranking/label signal raw hrefs
    * lack. Two keyed rollups: (src, dst, text) counts, then the
    * per-pair argmax — both on |edge| grain, map-side combined, no
    * window.
    */
  def anchorGraph(docs: DataFrame, urlCol: String, htmlCol: String)
      : DataFrame =
    docs
      .select(domain(col(urlCol)).as("src_domain"),
        explode(htmlAnchors(col(htmlCol))).as("__a"))
      .select(col("src_domain"),
        domain(col("__a.href")).as("dst_domain"),
        col("__a.text").as("__text"))
      .where(col("src_domain").isNotNull && col("dst_domain").isNotNull &&
        col("src_domain") =!= col("dst_domain"))
      .groupBy("src_domain", "dst_domain", "__text")
      .agg(count(lit(1)).as("__cnt"))
      .groupBy("src_domain", "dst_domain")
      .agg(sum("__cnt").as("n_links"),
        max_by(col("__text"),
          when(col("__text") === "", lit(null))
            .otherwise(struct(col("__cnt"), col("__text"))))
          .as("top_anchor"))

  /** First `<base href>` of an HTML document (may itself be relative);
    * null when absent.
    */
  def htmlBase(html: Column): Column =
    call_function("graft_html_base", html)

  /** RFC 3986 reference resolution: `href` made absolute against
    * `base` (dot segments merged, scheme-relative and query-only refs
    * handled); null when the base is not http(s).
    */
  def resolveUrl(base: Column, href: Column): Column =
    call_function("graft_urlresolve", base, href)

  /** [[linkGraph]] with RFC 3986 RESOLUTION (round 16): every href —
    * relative, scheme-relative, `<base href>`-redirected — resolves
    * to an absolute URL before the domain fold, so a page whose
    * markup says `<base href="https://cdn.other.com/">` contributes
    * its relative links as CROSS-DOMAIN edges instead of silently
    * dropping them. The base itself resolves against the page URL
    * first (it may be relative). Same shape as [[linkGraph]]: narrow
    * explode, one (site, site)-keyed rollup; self edges drop.
    */
  def linkGraphResolved(docs: DataFrame, urlCol: String,
      htmlCol: String): DataFrame =
    docs
      .select(col(urlCol).as("__page"),
        coalesce(
          resolveUrl(col(urlCol), htmlBase(col(htmlCol))),
          col(urlCol)).as("__base"),
        explode(htmlLinks(col(htmlCol))).as("__href"))
      .select(domain(col("__page")).as("src_domain"),
        domain(resolveUrl(col("__base"), col("__href")))
          .as("dst_domain"))
      .where(col("src_domain").isNotNull && col("dst_domain").isNotNull &&
        col("src_domain") =!= col("dst_domain"))
      .groupBy("src_domain", "dst_domain")
      .agg(count(lit(1)).as("n_links"))

  /** Redirect graph: per (src_domain, dst_domain), how many 3xx
    * responses point where — the crawl-frontier edges a recrawl uses
    * to chase moved content and collapse mirrors. The `Location`
    * value RESOLVES against the source URL first (RFC 3986), so
    * relative paths fold into the source domain and SCHEME-RELATIVE
    * targets (`Location: //other.net/x`) become the cross-domain
    * edges they are — a bare `domain()` would null on them and
    * mis-attribute the edge to the source. Sources with no
    * registrable domain drop. Narrow head-parse pass (status +
    * Location need no body decode) + one |domain-pairs| rollup.
    */
  def redirectGraph(docs: DataFrame, urlCol: String,
      payloadBytesCol: String): DataFrame = {
    val e = httpHead(col(payloadBytesCol))
    docs
      .select(domain(col(urlCol)).as("src_domain"),
        col(urlCol).as("__src_url"),
        e.getField("status").as("__s"),
        e.getField("location").as("__loc"))
      .where(col("__s") >= 300 && col("__s") <= 399 &&
        col("__loc").isNotNull && col("src_domain").isNotNull)
      .select(col("src_domain"),
        coalesce(
          domain(coalesce(resolveUrl(col("__src_url"), col("__loc")),
            col("__loc"))),
          col("src_domain")).as("dst_domain"))
      .groupBy("src_domain", "dst_domain")
      .agg(count(lit(1)).as("n_redirects"))
  }

  /** Text-extraction audit: per source, document count, HTML bytes vs
    * extracted-text chars and the markup overhead ppm — the data-card
    * row published next to a WARC→text conversion. One narrow pass +
    * a |sources|-keyed combinable rollup.
    */
  def textExtractionReport(docs: DataFrame, sourceCol: String,
      htmlCol: String): DataFrame =
    docs
      .select(col(sourceCol),
        length(col(htmlCol)).cast("long").as("__h"),
        length(htmlText(col(htmlCol))).cast("long").as("__t"))
      .groupBy(sourceCol)
      .agg(count(lit(1)).as("n_docs"),
        sum("__h").as("html_chars"),
        sum("__t").as("text_chars"),
        ((sum("__h") - sum("__t")) * lit(1000000L) / sum("__h"))
          .cast("long").as("markup_ppm"))

  /** Cross-domain link graph: each document's outbound `<a href>`
    * targets reduced to registrable domains, keyed against the
    * document's own domain — (src_domain, dst_domain, n_links), self
    * edges and unresolvable targets dropped (relative links resolve to
    * the SOURCE domain, so they are self edges by construction and a
    * cross-domain graph never needs base-URL resolution). The explode
    * is narrow; the one shuffle groups on the (site, site) pair —
    * dimension² at most, in practice the sparse web graph.
    */
  def linkGraph(docs: DataFrame, urlCol: String, htmlCol: String)
      : DataFrame =
    docs
      .select(domain(col(urlCol)).as("src_domain"),
        explode(htmlLinks(col(htmlCol))).as("__href"))
      .select(col("src_domain"), domain(col("__href")).as("dst_domain"))
      .where(col("src_domain").isNotNull && col("dst_domain").isNotNull &&
        col("src_domain") =!= col("dst_domain"))
      .groupBy("src_domain", "dst_domain")
      .agg(count(lit(1)).as("n_links"))

  /** Crawl-delay seconds the agent should honor per the robots body
    * (§2.2.1 group selection, largest across selected groups); null
    * when none declared.
    */
  def crawlDelay(robotsTxt: Column, agent: String = "*"): Column =
    call_function("graft_robots_delay", robotsTxt, lit(agent))

  /** Count of file-wide `Sitemap:` lines in the robots body. */
  def sitemapCount(robotsTxt: Column): Column =
    call_function("graft_robots_sitemaps", robotsTxt)

  /** Recrawl-budget report: per registrable domain, document volume
    * joined against the site's politeness config — the declared
    * crawl-delay for the given agent (null = none declared) and the
    * estimated seconds a sequential polite recrawl of the domain's
    * pages would take at that delay (`defaultDelay` when the site
    * declares none), plus the sitemap count (sitemap-driven recrawls
    * skip page discovery). The robots frame is per-site CONFIG, so the
    * join broadcasts; the only shuffle groups on the domain —
    * |sites| keys, map-side combined.
    */
  def crawlBudget(docs: DataFrame, urlCol: String, robots: DataFrame,
      agent: String = "*", defaultDelay: Double = 1.0): DataFrame =
    docs
      .select(coalesce(domain(col(urlCol)), lit("(invalid)"))
        .as("domain"),
        canonUrl(col(urlCol)).as("canon_url"))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"),
        count_distinct(col("canon_url")).as("n_pages"))
      .join(broadcast(robots), Seq("domain"), "left")
      .select(col("domain"), col("n_docs"), col("n_pages"),
        crawlDelay(col("robots_txt"), agent).as("crawl_delay"),
        coalesce(sitemapCount(col("robots_txt")), lit(0))
          .as("n_sitemaps"),
        round(col("n_pages") *
          coalesce(crawlDelay(col("robots_txt"), agent),
            lit(defaultDelay)), 1).as("budget_secs"))

  /** `array<struct<loc, lastmod>>` entries of a sitemap XML body
    * ([[graft.functions.SitemapKit]]): `<url>`/`<sitemap>` blocks,
    * total on junk, entity-decoded locs.
    */
  def sitemapEntries(xml: Column): Column =
    call_function("graft_sitemap_entries", xml)

  /** Sitemap-driven recrawl report: per domain, the sitemap files'
    * URL volume, how many entries carry a parseable `<lastmod>`, and
    * how many changed since `sinceDate` (ISO yyyy-MM-dd) — the
    * fetch-only-what-changed input a polite recrawl runs on, the step
    * beyond `crawlBudget`'s page×delay estimate. The explode is
    * narrow (entries stay with their file's task); the one shuffle
    * groups on |domains| keys, map-side combined. Undated entries
    * count as fresh (`n_refetch`) — a crawler cannot skip what it
    * cannot date.
    */
  def sitemapRecrawl(sitemaps: DataFrame, domainCol: String,
      xmlCol: String, sinceDate: String): DataFrame =
    sitemaps
      .select(col(domainCol).as("domain"),
        explode_outer(sitemapEntries(col(xmlCol))).as("__e"))
      .select(col("domain"), col("__e.loc").as("__loc"),
        // try_cast, not to_date: real lastmod fields carry junk, and
        // ANSI mode fail-stops a corpus scan on the first bad row
        try_to_timestamp(substring(col("__e.lastmod"), 1, 10),
          lit("yyyy-MM-dd")).cast("date").as("__d"))
      .groupBy("domain")
      .agg(count(col("__loc")).as("n_sitemap_urls"),
        count(col("__d")).as("n_dated"),
        sum((col("__d") >= to_date(lit(sinceDate))).cast("long"))
          .as("__fresh"))
      .select(col("domain"), col("n_sitemap_urls"), col("n_dated"),
        (col("n_sitemap_urls") - col("n_dated") +
          coalesce(col("__fresh"), lit(0L))).as("n_refetch"))

  /** [[crawlBudget]] extended with sitemap-file contents: the robots
    * budget columns plus the domain's sitemap URL volume and the
    * fresh-since-`sinceDate` refetch count — so the recrawl planner
    * sees "N pages × delay" AND "M actually changed" side by side.
    * Both joined frames are per-site config/rollups → broadcast.
    */
  def crawlBudgetWithSitemaps(docs: DataFrame, urlCol: String,
      robots: DataFrame, sitemaps: DataFrame, domainCol: String,
      xmlCol: String, sinceDate: String, agent: String = "*",
      defaultDelay: Double = 1.0): DataFrame =
    crawlBudget(docs, urlCol, robots, agent, defaultDelay)
      .join(broadcast(
        sitemapRecrawl(sitemaps, domainCol, xmlCol, sinceDate)),
        Seq("domain"), "left")
      .select(col("domain"), col("n_docs"), col("n_pages"),
        col("crawl_delay"), col("n_sitemaps"), col("budget_secs"),
        coalesce(col("n_sitemap_urls"), lit(0L)).as("n_sitemap_urls"),
        coalesce(col("n_refetch"), lit(0L)).as("n_refetch"))

  /** URL-level dedup of the corpus rows themselves: EXACTLY one
    * survivor per canonical key, ordered on (id, url); unparseable
    * URLs pass through untouched. Round 18 (VERDICT r17 task 5): the
    * `min_by` single-groupBy shape of `fromWarc`'s dedup replaces the
    * old `id === min(id)` join-back, which kept ALL rows of a group
    * when ids collide (hash-derived ids on duplicate inputs DO — the
    * q409 bug class) — the (id, url) ordering breaks those ties. And
    * instead of a second filtered union branch re-scanning the source
    * for null-canon rows (the round-16 double-parse shape), rows whose
    * URL does not canonicalize get a per-row synthetic group key
    * (NUL-prefixed, disjoint from any canonical URL) and pass through
    * as singleton groups: ONE scan, ONE shuffle, map-side combinable,
    * and AQE can still split an oversized group's partition.
    */
  def urlDedup(docs: DataFrame, idCol: String, urlCol: String)
      : DataFrame = {
    val row = struct(docs.columns.map(col).toIndexedSeq: _*)
    docs
      .withColumn("__grp", coalesce(canonUrl(col(urlCol)),
        concat(lit("\u0000"),
          monotonically_increasing_id().cast("string"))))
      .groupBy("__grp")
      .agg(min_by(row, struct(col(idCol), col(urlCol))).as("__r"))
      .select(col("__r.*"))
  }

  /** Revisit-aware URL-dedup groups (round 17 — VERDICT r16 task 6):
    * fold the `revisit` records a real crawl emits ([[graft.sources
    * .Warc.readRevisits]]) into the canonical-URL dedup grain, so a
    * recrawl's duplicate captures count WITHOUT any payload being
    * re-extracted. Content captures group on their canonical URL
    * (keeper = min id, the [[urlDedupGroups]] rule); each revisit
    * contributes one capture to the canonical group of the capture it
    * refers to (falling back to its own URL when the refers-to header
    * is absent — a revisit of itself is still a duplicate capture).
    * A group with `n_content = 0` (null keeper) is a page the crawl
    * re-verified but holds no body for — the "covered elsewhere, do
    * not re-extract" row a recrawl planner needs.
    *
    * Scale shape: two map-side-combinable rollups on the canonical
    * key + one key-equi full-outer join on the same grain — no
    * windows, nothing driver-side.
    */
  def revisitDedupGroups(docs: DataFrame, revisits: DataFrame,
      idCol: String, urlCol: String, revUrlCol: String = "url",
      refersToCol: String = "refers_to"): DataFrame = {
    val content = docs
      .select(col(idCol), canonUrl(col(urlCol)).as("canon_url"))
      .where(col("canon_url").isNotNull)
      .groupBy("canon_url")
      .agg(min(col(idCol)).as("keeper_id"),
        count(lit(1)).as("n_content"))
    val rev = revisits
      .select(canonUrl(coalesce(col(refersToCol), col(revUrlCol)))
        .as("canon_url"))
      .where(col("canon_url").isNotNull)
      .groupBy("canon_url")
      .agg(count(lit(1)).as("n_revisits"))
    content.join(rev, Seq("canon_url"), "full_outer")
      .select(col("canon_url"), col("keeper_id"),
        coalesce(col("n_content"), lit(0L)).as("n_content"),
        coalesce(col("n_revisits"), lit(0L)).as("n_revisits"),
        (coalesce(col("n_content"), lit(0L)) +
          coalesce(col("n_revisits"), lit(0L))).as("n_captures"))
  }

  /** Per-(destination page, anchor text) in-link counts — the EDGE
    * grain behind [[anchorTextField]] and the stored table the
    * streaming anchor maintainer appends: hrefs resolve (RFC 3986)
    * and canonicalize, empty texts drop, and the rollup is map-side
    * combinable on the (dst_url, text) pair — a million identical
    * spam anchors combine to ONE counted row before the shuffle.
    */
  def anchorEdgeCounts(docs: DataFrame, urlCol: String,
      htmlCol: String): DataFrame =
    docs
      .select(col(urlCol).as("__page"),
        explode(htmlAnchors(col(htmlCol))).as("__a"))
      .select(
        canonUrl(coalesce(resolveUrl(col("__page"), col("__a.href")),
          col("__a.href"))).as("dst_url"),
        col("__a.text").as("anchor_text"))
      .where(col("dst_url").isNotNull && col("anchor_text") =!= "")
      .groupBy("dst_url", "anchor_text")
      .agg(count(lit(1)).as("n_links"))

  /** Anchor-text FIELD per destination page (round 17 — VERDICT r16
    * task 7; CAPPED round 18 — r17 task 2): the top-`maxTexts`
    * distinct anchor texts the web uses to describe each page,
    * resolved (RFC 3986) and keyed on the canonical URL, sorted and
    * space-joined into one indexable string — the classic web-ranking
    * signal ([[graft.ops.Retrieval.bm25TopKWithAnchors]] scores it as
    * a weighted BM25 field next to the body). Distinct (not
    * multiset): a million identical "click here" in-links should not
    * make a page a million times more about clicking. CAPPED: a
    * popular page's in-link text set is unbounded on a real graph
    * (spam anchors included), so the field keeps the `maxTexts` most
    * frequent texts — deterministic (count desc, text asc) — via the
    * salted two-stage rank ([[domainCap]]'s pattern) rather than an
    * unbounded `collect_set` in one aggregation buffer. Sorted so the
    * field is partitioning-independent.
    */
  def anchorTextField(docs: DataFrame, urlCol: String,
      htmlCol: String, maxTexts: Int = 64): DataFrame =
    anchorFieldFromEdges(anchorEdgeCounts(docs, urlCol, htmlCol),
      maxTexts)

  /** The fold from edge-count grain to the field string — shared by
    * [[anchorTextField]] and the streaming maintainer's probe (which
    * sums stored per-batch edge rows to this grain first). `edges`
    * must be unique on (dst_url, anchor_text) with an `n_links` count.
    *
    * Scale shape: stage 1 ranks within (dst_url, salt-of-text) and
    * keeps ≤ `maxTexts` per salt — any member of the global per-page
    * top-N is also in its salt's top-N, so the pre-prune is lossless —
    * then stage 2 ranks the ≤ 16·N survivors per page. The heaviest
    * task is bounded by the heaviest (page, salt) shard, 1/16th of the
    * hottest page, and the final `collect_list` is ≤ `maxTexts` rows
    * by construction — per-key state is bounded everywhere.
    */
  def anchorFieldFromEdges(edges: DataFrame,
      maxTexts: Int = 64): DataFrame = {
    val salts = 16
    val ord: Seq[Column] = Seq(col("n_links").desc, col("anchor_text"))
    val w1 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("dst_url"), col("__salt")).orderBy(ord: _*)
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("dst_url")).orderBy(ord: _*)
    edges
      .withColumn("__salt", pmod(hash(col("anchor_text")), lit(salts)))
      .withColumn("__rk1", row_number().over(w1))
      .where(col("__rk1") <= maxTexts)
      .withColumn("__rk", row_number().over(w2))
      .where(col("__rk") <= maxTexts)
      .groupBy("dst_url")
      .agg(array_join(array_sort(collect_list(col("anchor_text"))), " ")
        .as("anchor_text"))
  }

  /** Deterministic per-domain document cap — the site-balance step of
    * crawl curation (a handful of mega-sites otherwise dominate the
    * token budget): keep at most `maxPerDomain` documents per
    * registrable domain, chosen by md5-of-id priority so the kept
    * subset is a stable pseudo-random sample — independent of
    * partitioning, replay-identical. Documents whose URL has no
    * domain are passed through uncapped (they can't be attributed to
    * a site; gate them elsewhere). The one shuffle partitions by
    * domain — exactly the key the cap is defined over; no global
    * sort, no single-task window.
    */
  def domainCap(docs: DataFrame, idCol: String, urlCol: String,
      maxPerDomain: Int): DataFrame = {
    // Two-stage top-N so a mega-domain never lands in ONE task: stage
    // 1 ranks within (domain, salt-of-id) and keeps ≤ N per salt —
    // any element of the global per-domain top N is also in its
    // salt's top N (fewer than N shardmates can outrank it), so the
    // pre-prune is lossless — then stage 2 ranks the ≤ 16·N
    // survivors per domain. The heaviest task is bounded by the
    // heaviest (domain, salt) shard, 1/16th of the heaviest site.
    //
    // Null-domain (unattributable-URL) rows BYPASS the windows via
    // filter + unionByName — the urlDedup shape — instead of a
    // `when(isNull, 1L)` guard inside the window projection: the
    // guard fixes the VALUE but the physical Window still hashes
    // every null-domain row into ONE `__domain = null` partition, so
    // a crawl slice dominated by unparseable URLs would serialize
    // through a single task. With the split, the Window operators
    // never see the null branch at all (PlanShapeSpec pins this).
    val salts = 16
    val prio = md5(col(idCol).cast("string"))
    val w1 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__domain"), col("__salt"))
      .orderBy(prio, col(idCol))
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__domain"))
      .orderBy(prio, col(idCol))
    val withDomain = docs.withColumn("__domain", domain(col(urlCol)))
    val capped = withDomain
      .where(col("__domain").isNotNull)
      .withColumn("__salt",
        pmod(hash(col(idCol)), lit(salts)))
      .withColumn("__rk1", row_number().over(w1).cast("long"))
      .where(col("__rk1") <= maxPerDomain)
      .withColumn("__rk", row_number().over(w2).cast("long"))
      .where(col("__rk") <= maxPerDomain)
      .drop("__salt", "__rk1", "__rk")
    capped
      .unionByName(withDomain.where(col("__domain").isNull))
      .drop("__domain")
  }

  /** The cap's audit row: per domain, documents seen vs kept at the
    * given cap — published next to the capped corpus so the sampling
    * is reviewable (the q378 retention discipline).
    */
  def domainCapReport(docs: DataFrame, idCol: String, urlCol: String,
      maxPerDomain: Int): DataFrame =
    docs
      .select(coalesce(domain(col(urlCol)), lit("(invalid)"))
        .as("domain"))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"),
        least(count(lit(1)),
          when(col("domain") === "(invalid)", count(lit(1)))
            .otherwise(lit(maxPerDomain.toLong))).as("n_kept"))

  /** Per-domain corpus report: raw URL count, distinct canonical
    * pages, and the dup ratio ppm — the site-level table a crawl
    * curation reviews (domain caps, site-level sampling). Unparseable
    * URLs aggregate under a literal `(invalid)` domain so they are
    * counted, never silently dropped.
    */
  def domainReport(docs: DataFrame, urlCol: String): DataFrame =
    docs
      .select(
        coalesce(domain(col(urlCol)), lit("(invalid)")).as("domain"),
        canonUrl(col(urlCol)).as("canon_url"),
        pslKind(col(urlCol)).as("__kind"))
      .groupBy("domain")
      .agg(
        count(lit(1)).as("n_urls"),
        count_distinct(col("canon_url")).as("n_pages"),
        ((count(lit(1)) - count_distinct(col("canon_url"))) * lit(1000000L)
          / count(lit(1))).cast("long").as("dup_ppm"),
        // hosts bucketed by the implicit `*` rule = registries the
        // bundled PSL subset does NOT list — nonzero here says the
        // domain grouping may be mis-bucketed and the snapshot needs
        // a data refresh (observable, not silent; r15 task 7)
        coalesce(sum((col("__kind") === "default").cast("long")),
          lit(0L)).as("n_psl_default"))

  /** The PSL rule kind behind [[domain]] for this URL —
    * "exact"/"wildcard"/"exception"/"default", null when the URL does
    * not parse. */
  def pslKind(url: Column): Column =
    call_function("graft_psl_kind", url)
}
