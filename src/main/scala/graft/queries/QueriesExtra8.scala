package graft.queries

import graft.ops.{Retrieval, TextAnalysis, WebCorpus}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Shared._

/** Catalog section 11 (round 17): trained language ID, revisit-record
  * dedup, and the anchor-text retrieval field (VERDICT r16 tasks
  * 5/6/7). Oracle discipline unchanged: per-variant facts are
  * hand-derived literals over the residue grid; the only "twin" code
  * is the q69-precedent whitespace tokenizer for the BM25 replay.
  */
private[graft] object QueriesExtra8 {

  def defs: Seq[QueryDef] =
    Seq(q411, q412, q413, q414, q415, q416, q417, q418, q419)

  /** The q411 hand-labeled fixture: 16 languages, one sentence each —
    * the Latin eleven exercise the bundled trigram model, the script
    * five the code-point gate. ONE definition feeds the Spark `elt`
    * and the oracle VALUES (the pslHosts discipline). The `predicted`
    * column in the oracle is pinned to the expected label: the
    * classifier gets all sixteen right (LangIdSpec), and a regression
    * on any of them breaks this hash.
    */
  private[graft] def langFixture: Seq[(String, String)] = Seq(
    "en" -> ("The students arrived early at the library because they " +
      "wanted to study before the history exam."),
    "de" -> ("Die Studenten kamen früh in die Bibliothek, weil sie " +
      "vor der Geschichtsprüfung lernen wollten."),
    "fr" -> ("Les étudiants sont arrivés tôt à la bibliothèque parce " +
      "qu'ils voulaient étudier avant l'examen d'histoire."),
    "es" -> ("Los estudiantes llegaron temprano a la biblioteca " +
      "porque querían estudiar antes del examen de historia."),
    "it" -> ("Gli studenti sono arrivati presto in biblioteca perché " +
      "volevano studiare prima dell'esame di storia."),
    "pt" -> ("Os estudantes chegaram cedo à biblioteca porque " +
      "queriam estudar antes do exame de história."),
    "nl" -> ("De studenten kwamen vroeg naar de bibliotheek omdat ze " +
      "voor het geschiedenisexamen wilden studeren."),
    "ru" -> ("Правительство объявило, что новые меры вступят в силу " +
      "в начале следующего года."),
    "ja" -> "政府は新しい規則が来年から施行されると発表しました。",
    "zh" -> "政府宣布新的规定将于明年初开始实施。",
    "ko" -> "정부는 새로운 규정이 내년부터 시행된다고 발표했다.",
    "ar" -> "أعلنت الحكومة أن القواعد الجديدة ستدخل حيز التنفيذ العام المقبل.",
    "pl" -> ("Dzieci bawiły się w ogrodzie przez całe popołudnie, a " +
      "potem wróciły do domu na kolację z rodzicami."),
    "tr" -> ("Çocuklar bütün öğleden sonra bahçede oynadılar ve sonra " +
      "akşam yemeği için eve döndüler."),
    "fi" -> ("Lapset leikkivät puutarhassa koko iltapäivän ja " +
      "palasivat sitten kotiin syömään illallista vanhempiensa kanssa."),
    "ro" -> ("Copiii s-au jucat în grădină toată după-amiaza și apoi " +
      "s-au întors acasă pentru cina cu părinții lor."))

  private def q411 =
    // Trained language ID (round 17, VERDICT r16 task 5): the
    // script-gate + char-trigram Naive Bayes kernel evaluated as a
    // labeled confusion grid — per variant, the expected and predicted
    // codes with doc counts and a correctness flag. The oracle is a
    // hand VALUES of the labels (predicted pinned = expected; the
    // classifier is LangIdSpec-verified on exactly these sentences)
    // joined to the residue counts — no language model runs in it.
    QueryDef("q411_langid_eval",
      (s, dir) => {
        val m = langFixture.size
        val idx = (pmod(col("doc_id"), lit(m)) + 1).cast("int")
        val sent = elt(idx +: langFixture.map(p => lit(p._2)): _*)
        val expected = elt(idx +: langFixture.map(p => lit(p._1)): _*)
        t(s, dir, "documents")
          .select(pmod(col("doc_id"), lit(m)).cast("int").as("variant"),
            expected.as("expected"),
            TextAnalysis.langId(sent).as("predicted"))
          .groupBy("variant", "expected", "predicted")
          .agg(count(lit(1)).as("n_docs"))
          .withColumn("correct",
            (col("predicted") === col("expected")).cast("int"))
          .orderBy("variant")
      },
      Some {
        val values = langFixture.zipWithIndex
          .map { case ((lang, _), i) => s"($i, '$lang')" }
          .mkString(",\n  ")
        s"""WITH g AS (
           |  SELECT doc_id % ${langFixture.size} AS variant,
           |    count(*) AS n
           |  FROM documents GROUP BY 1),
           |v AS (SELECT * FROM (VALUES
           |  $values) AS v(variant, lang))
           |SELECT CAST(v.variant AS INT) AS variant,
           |  v.lang AS expected, v.lang AS predicted,
           |  CAST(g.n AS BIGINT) AS n_docs,
           |  CAST(1 AS INT) AS correct
           |FROM v JOIN g ON g.variant = v.variant
           |ORDER BY variant""".stripMargin
      })

  private def q412 =
    // Revisit-record dedup (round 17, VERDICT r16 task 6): a crawl cut
    // mixing response captures with `revisit` records (the WARC/1.1
    // identical-payload-digest marker) round-trips through
    // writeTyped → read/readRevisits, and revisitDedupGroups folds
    // both into canonical-URL capture groups WITHOUT re-extracting
    // any revisited payload. Fixture residue grid (v = doc_id % 10):
    // v<5 → response capture of page p(v%4) under a utm variant URL
    // (canon folds it); 5≤v≤8 → revisit of page p(v%4)'s capture;
    // v=9 → revisit referring to a page this cut holds NO content for
    // (n_content = 0, null keeper — the "covered elsewhere" row). The
    // oracle replays the grid arithmetic, including the min-URL keeper.
    QueryDef("q412_revisit_dedup",
      (s, dir) => {
        val tmp = sys.props("java.io.tmpdir") + "/graft_warc_revisit_q412"
        val v = pmod(col("doc_id"), lit(10))
        val base = concat(lit("http://rev.example/p"), pmod(v, lit(4)))
        val docs = t(s, dir, "documents").select(
          when(v === 9, lit("http://rev.example/gone"))
            .when(v < 5, concat(base, lit("?utm_campaign="), v))
            .otherwise(concat(base, lit("?v=2"))).as("url"),
          when(v < 5, lit("HTTP/1.1 200 OK\r\nContent-Type: " +
            "text/html\r\n\r\n<p>doc</p>")).otherwise(lit(""))
            .as("payload"),
          when(v < 5, lit("response")).otherwise(lit("revisit"))
            .as("warc_type"),
          when(v === 9, lit("http://archive.example/old"))
            .when(v >= 5, base)
            .otherwise(lit(null).cast("string")).as("refers_to"))
        graft.sources.Warc.writeTyped(docs, tmp, "url", "payload",
          "warc_type", "refers_to", gzip = true)
        WebCorpus.revisitDedupGroups(
            graft.sources.Warc.read(s, tmp),
            graft.sources.Warc.readRevisits(s, tmp),
            idCol = "url", urlCol = "url")
          .orderBy("canon_url")
      },
      Some(
        """WITH d AS (
          |  SELECT doc_id % 10 AS v, count(*) AS n
          |  FROM documents GROUP BY 1),
          |c AS (
          |  SELECT v % 4 AS k, sum(n) AS n_content,
          |    min('http://rev.example/p' || CAST(v % 4 AS VARCHAR) ||
          |        '?utm_campaign=' || CAST(v AS VARCHAR)) AS keeper
          |  FROM d WHERE v < 5 GROUP BY 1),
          |r AS (
          |  SELECT v % 4 AS k, sum(n) AS n_rev
          |  FROM d WHERE v BETWEEN 5 AND 8 GROUP BY 1),
          |pages AS (
          |  SELECT 'http://rev.example/p' || CAST(c.k AS VARCHAR)
          |      AS canon_url,
          |    c.keeper AS keeper_id, c.n_content,
          |    coalesce(r.n_rev, 0) AS n_revisits
          |  FROM c LEFT JOIN r ON r.k = c.k),
          |arch AS (
          |  SELECT 'http://archive.example/old' AS canon_url,
          |    CAST(NULL AS VARCHAR) AS keeper_id,
          |    CAST(0 AS HUGEINT) AS n_content, sum(n) AS n_revisits
          |  FROM d WHERE v = 9),
          |allrows AS (SELECT * FROM pages UNION ALL SELECT * FROM arch)
          |SELECT canon_url, keeper_id,
          |  CAST(n_content AS BIGINT) AS n_content,
          |  CAST(n_revisits AS BIGINT) AS n_revisits,
          |  CAST(n_content + n_revisits AS BIGINT) AS n_captures
          |FROM allrows
          |ORDER BY canon_url""".stripMargin))

  /** q413's residue-grid texts — class k = doc_id % 4. Body and the
    * anchor text class k's docs WRITE (class k+1's page receives it);
    * therefore class k's page CARRIES anchor text `anchorOf((k+3)%4)`.
    * One definition feeds the Spark fixture and the oracle CASEs.
    */
  private def bodyOf: Seq[String] = Seq(
    "solar energy production overview",
    "panel mounting hardware details",
    "generic text about nothing much",
    "solar panel factory output report")
  private def anchorOf: Seq[String] = Seq(
    "solar panel review",
    "cheap panel deal",
    "solar guide",
    "boring link")

  /** q413/q414's shared fixture frame: class-k docs on page c{k} with
    * class-keyed body text and an out-link to page c{k+1}.
    */
  private def anchorFixtureDocs(s: SparkSession, dir: String): DataFrame = {
    val k4 = pmod(col("doc_id"), lit(4))
    val idx = (k4 + 1).cast("int")
    val body = elt(idx +: bodyOf.map(lit): _*)
    val anchorText = elt(idx +: anchorOf.map(lit): _*)
    val pageUrl = concat(lit("http://site.example/c"), k4)
    val html = concat(lit("<a href=\"http://site.example/c"),
      pmod(col("doc_id") + 1, lit(4)), lit("\">"), anchorText,
      lit("</a>"))
    t(s, dir, "documents")
      .select(col("doc_id"), pageUrl.as("url"), body.as("text"),
        html.as("html"))
  }

  private def q413 =
    // Anchor-text retrieval field (round 17, VERDICT r16 task 7):
    // every class-k doc's page is http://site.example/c{k}; its HTML
    // links to class k+1's page with a class-keyed anchor text, so
    // anchorTextField hands page k the DISTINCT in-link text of class
    // k-1, and bm25TopKWithAnchors fuses body + 1.5 × anchor-field
    // BM25. The oracle replays the per-class body/anchor strings as
    // hand CASEs over the residue grid and re-runs the q69-precedent
    // BM25 CTE chain twice — HTML extraction and URL resolution never
    // enter it. Two query terms keep per-doc sums 2-addend
    // (FP-commutative, engine-exact).
    QueryDef("q413_anchor_bm25",
      (s, dir) => {
        val docs = anchorFixtureDocs(s, dir)
        val anchors = WebCorpus.anchorTextField(docs, "url", "html")
        Retrieval.bm25TopKWithAnchors(docs, anchors, "doc_id", "text",
            "url", Seq("solar", "panel"), k = 10, anchorWeight = 1.5)
          .orderBy("rank")
      },
      Some(anchorBm25Oracle))

  private def q414 =
    // Persisted anchor-field index (round 17): q413's fielded ranking
    // served entirely from STORED postings — body and anchor posting
    // tables bucketed on term beside their per-field stats tables,
    // probes prune to the query's terms and score with the stored
    // stats. The two paths are bit-equal by construction, so the
    // oracle is q413's VERBATIM — completing the persisted-index
    // family (MinHash bands q93, IVF codes q306, lexical postings
    // q308, anchor postings here).
    QueryDef("q414_anchor_bm25_index",
      (s, dir) => {
        import graft.sources.Layout
        val docs = anchorFixtureDocs(s, dir)
        val anchors = WebCorpus.anchorTextField(docs, "url", "html")
        Layout.replaceBucketed(s,
          Retrieval.bm25Postings(docs, "doc_id", "text"),
          "graft_body_postings_q414", "term", buckets = 8)
        Layout.replaceTable(s,
          Retrieval.bm25CorpusStats(docs, "doc_id", "text"),
          "graft_body_stats_q414")
        Layout.replaceBucketed(s,
          Retrieval.anchorPostings(docs, anchors, "doc_id", "url"),
          "graft_anchor_postings_q414", "term", buckets = 8)
        Layout.replaceTable(s,
          Retrieval.anchorCorpusStats(docs, anchors, "doc_id", "url"),
          "graft_anchor_stats_q414")
        Retrieval.bm25TopKWithAnchorsFromIndex(
            Layout.table(s, "graft_body_postings_q414"),
            Layout.table(s, "graft_body_stats_q414"),
            Layout.table(s, "graft_anchor_postings_q414"),
            Layout.table(s, "graft_anchor_stats_q414"),
            "doc_id", Seq("solar", "panel"), k = 10,
            anchorWeight = 1.5)
          .orderBy("rank")
      },
      Some(anchorBm25Oracle))

  private def q415 =
    // Crawl-cut data card (round 17): ingestReport composes the
    // one-call ingest with the revisit signal — per domain, canonical
    // pages extracted (dedup through the utm variants), text volume,
    // and revisit captures attributed to the REFERRED capture's
    // domain. The external-archive referent shows up as a
    // zero-page/revisits-only row (the "covered elsewhere" line).
    // Residue grid: host = doc_id % 3, v = doc_id % 10 (coprime, so
    // every host carries every variant); v<5 response of page p(v%4)
    // under a utm URL, 5≤v≤8 revisit of that page, v=9 revisit
    // referring to warchive.example. Oracle: per-host revisit counts
    // from the grid; pages/chars are the hand-derived constants
    // (4 pages × 4-char "page" text per host).
    QueryDef("q415_ingest_report",
      (s, dir) => {
        val tmp = sys.props("java.io.tmpdir") + "/graft_warc_ingest_q415"
        val v = pmod(col("doc_id"), lit(10))
        val host = elt((pmod(col("doc_id"), lit(3)) + 1).cast("int"),
          lit("a-ing.example"), lit("b-ing.example"),
          lit("c-ing.example"))
        val base = concat(lit("http://"), host, lit("/p"),
          pmod(v, lit(4)))
        val docs = t(s, dir, "documents").select(
          when(v === 9, concat(lit("http://"), host, lit("/gone")))
            .when(v < 5, concat(base, lit("?utm_campaign="), v))
            .otherwise(concat(base, lit("?v=2"))).as("url"),
          when(v < 5, lit("HTTP/1.1 200 OK\r\nContent-Type: " +
            "text/html\r\n\r\n<p>page</p>")).otherwise(lit(""))
            .as("payload"),
          when(v < 5, lit("response")).otherwise(lit("revisit"))
            .as("warc_type"),
          when(v === 9, lit("http://warchive.example/old"))
            .when(v >= 5, base)
            .otherwise(lit(null).cast("string")).as("refers_to"))
        graft.sources.Warc.writeTyped(docs, tmp, "url", "payload",
          "warc_type", "refers_to", gzip = true)
        graft.ops.CorpusPipeline.ingestReport(s, tmp)
          .orderBy("domain")
      },
      Some(
        """WITH d AS (
          |  SELECT doc_id % 3 AS h, doc_id % 10 AS v, count(*) AS n
          |  FROM documents GROUP BY 1, 2),
          |hosts AS (SELECT * FROM (VALUES
          |  (0, 'a-ing.example'), (1, 'b-ing.example'),
          |  (2, 'c-ing.example')) AS h(h, domain)),
          |rv AS (
          |  SELECT h, sum(n) AS n_rev FROM d
          |  WHERE v BETWEEN 5 AND 8 GROUP BY 1),
          |main AS (
          |  SELECT hosts.domain, CAST(4 AS BIGINT) AS n_pages,
          |    CAST(16 AS BIGINT) AS text_chars,
          |    CAST(coalesce(rv.n_rev, 0) AS BIGINT) AS n_revisits
          |  FROM hosts LEFT JOIN rv ON rv.h = hosts.h),
          |arch AS (
          |  SELECT 'warchive.example' AS domain,
          |    CAST(0 AS BIGINT) AS n_pages,
          |    CAST(0 AS BIGINT) AS text_chars,
          |    CAST(sum(n) AS BIGINT) AS n_revisits
          |  FROM d WHERE v = 9)
          |SELECT * FROM main UNION ALL SELECT * FROM arch
          |ORDER BY domain""".stripMargin))

  /** Hand-pinned SCRIPT-AWARE token counts per [[langFixture]]
    * sentence (round 19 — the `graft_tokens` kernel): the eleven
    * Latin + ru + ar sentences keep their whitespace counts (ASCII/
    * space-delimited parity), while ja/zh/ko count character bigrams
    * per spaceless run (ja 1 → 24, zh 1 → 16, ko 6 → 17 — the ko
    * trailing ASCII '.' after a Hangul run stands alone). Derived by
    * hand from the kernel rules; TokensSpec asserts the kernel
    * reproduces exactly these numbers, so the q416 oracle's literals
    * and the kernel cannot drift apart silently.
    */
  private[graft] def langFixtureToks: Seq[Int] =
    Seq(16, 14, 15, 15, 14, 14, 14, 12, 24, 16, 17, 10, 17, 13, 13, 17)

  private def q416 =
    // Language-mix report (round 17; counts re-pinned round 19): the
    // shard-mix table a multilingual corpus publishes — per (source,
    // predicted language), document and token volume, over the q411
    // 16-language fixture. The oracle replays the labels (pinned by
    // q411) and the SCRIPT-AWARE token counts as hand-pinned literals
    // (langFixtureToks — the whitespace-split twin undercounted every
    // spaceless CJK sentence as 1 giant token, which is exactly what
    // the round-19 tokenizer fixes).
    QueryDef("q416_lang_mix",
      (s, dir) => {
        val idx =
          (pmod(col("doc_id"), lit(langFixture.size)) + 1).cast("int")
        val sent = elt(idx +: langFixture.map(p => lit(p._2)): _*)
        TextAnalysis.langMix(
            t(s, dir, "documents")
              .select(col("source"), sent.as("text")),
            "source", "text")
          .orderBy("source", "lang")
      },
      Some {
        val values = langFixture.zip(langFixtureToks).zipWithIndex
          .map { case (((lang, _), ntoks), i) =>
            s"($i, '$lang', $ntoks)" }
          .mkString(",\n  ")
        s"""WITH v AS (SELECT * FROM (VALUES
           |  $values) AS v(variant, lang, ntoks)),
           |g AS (
           |  SELECT source, doc_id % ${langFixture.size} AS variant,
           |    count(*) AS n
           |  FROM documents GROUP BY 1, 2)
           |SELECT g.source, v.lang,
           |  CAST(sum(g.n) AS BIGINT) AS n_docs,
           |  CAST(sum(g.n * v.ntoks) AS BIGINT) AS tokens
           |FROM g JOIN v USING (variant)
           |GROUP BY 1, 2
           |ORDER BY source, lang""".stripMargin
      })

  private def q417 =
    // Compliance-gated ingest (round 17): fromWarcCompliant judges
    // every record's URL against its domain's robots.txt BEFORE any
    // extraction — q391's lawful-pipeline ordering pushed into the
    // one-call ingest. Residue grid: host = doc_id % 3
    // (alpha/beta/gamma), v = doc_id % 8; v<4 → /pub/p{v} (v=3 is a
    // 404, gated by the HTTP gate), v≥4 → /private/p{v-4}.
    // alpha.com's robots disallows /private (4 pages blocked),
    // beta.org allows everything, gamma.net has NO robots row (RFC
    // default: allowed). Expected per-domain page counts are
    // hand-derived constants; every page's text is the 4-char "site".
    QueryDef("q417_compliant_ingest",
      (s, dir) => {
        import s.implicits._
        val tmp = sys.props("java.io.tmpdir") + "/graft_warc_compliant_q417"
        val v = pmod(col("doc_id"), lit(8))
        val host = elt((pmod(col("doc_id"), lit(3)) + 1).cast("int"),
          lit("alpha.com"), lit("beta.org"), lit("gamma.net"))
        val docs = t(s, dir, "documents").select(
          concat(lit("http://"), host,
            when(v < 4, concat(lit("/pub/p"), v))
              .otherwise(concat(lit("/private/p"), v - 4)),
            lit("?utm_campaign="), v).as("url"),
          when(v === 3, lit("HTTP/1.1 404 Not Found\r\nContent-Type: " +
            "text/html\r\n\r\ngone"))
            .otherwise(lit("HTTP/1.1 200 OK\r\nContent-Type: " +
              "text/html\r\n\r\n<p>site</p>")).as("payload"))
        graft.sources.Warc.writeGzip(docs, tmp, "url", "payload")
        val robots = Seq(
          ("alpha.com", "User-agent: *\nDisallow: /private\n"),
          ("beta.org", "User-agent: *\nDisallow:\n"))
          .toDF("domain", "robots_txt")
        graft.ops.CorpusPipeline.fromWarcCompliant(s, tmp, robots)
          .groupBy("domain")
          .agg(count(lit(1)).as("n_pages"),
            sum(length(col("text"))).as("text_chars"))
          .orderBy("domain")
      },
      Some(
        // pub pages v∈{0,1,2} (v=3 is the 404) = 3 per host; private
        // pages v∈{4..7} = 4 per host, blocked on alpha only.
        """SELECT * FROM (VALUES
          |  ('alpha.com', CAST(3 AS BIGINT), CAST(12 AS BIGINT)),
          |  ('beta.org', CAST(7 AS BIGINT), CAST(28 AS BIGINT)),
          |  ('gamma.net', CAST(7 AS BIGINT), CAST(28 AS BIGINT)))
          |  AS v(domain, n_pages, text_chars)
          |ORDER BY domain""".stripMargin))

  private def q418 =
    // SELF-contained lawful ingest (round 17 capstone): the robots
    // dimension is mined from the cut's own /robots.txt captures
    // (robotsFromWarc), then the compliance-gated ingest runs against
    // it — one directory in, lawful documents out. Residue grid:
    // host = doc_id % 3, v = doc_id % 5 (COPRIME — a %6 axis would
    // correlate with the host and starve two hosts of robots rows).
    // v=0 is the host's robots.txt capture (text/plain, so it can
    // never leak into the page set): r-a.example disallows /private,
    // r-b.example allows everything, and r-c.example has NO robots
    // capture (its v=0 is an extra pub page) — the RFC missing-file
    // default. v∈{1,2} are pub pages, v∈{3,4} private pages. Page
    // counts per domain are hand-derived constants; text is the
    // 4-char "site".
    QueryDef("q418_self_compliant_ingest",
      (s, dir) => {
        val tmp = sys.props("java.io.tmpdir") + "/graft_warc_selfc_q418"
        val v = pmod(col("doc_id"), lit(5))
        val hostIdx = pmod(col("doc_id"), lit(3))
        val host = elt((hostIdx + 1).cast("int"),
          lit("r-a.example"), lit("r-b.example"), lit("r-c.example"))
        val robotsBody = elt((hostIdx + 1).cast("int"),
          lit("User-agent: *\nDisallow: /private\n"),
          lit("User-agent: *\nDisallow:\n"),
          lit("")) // r-c never takes this branch
        val isRobots = v === 0 && hostIdx =!= 2
        val pagePath =
          when(v === 0, lit("/pub/p0")) // r-c's extra pub page
            .when(v <= 2, concat(lit("/pub/p"), v))
            .otherwise(concat(lit("/private/p"), v))
        val docs = t(s, dir, "documents").select(
          concat(lit("http://"), host,
            when(isRobots, lit("/robots.txt")).otherwise(pagePath))
            .as("url"),
          when(isRobots,
            concat(lit("HTTP/1.1 200 OK\r\nContent-Type: " +
              "text/plain\r\n\r\n"), robotsBody))
            .otherwise(lit("HTTP/1.1 200 OK\r\nContent-Type: " +
              "text/html\r\n\r\n<p>site</p>")).as("payload"))
        graft.sources.Warc.writeGzip(docs, tmp, "url", "payload")
        graft.ops.CorpusPipeline.fromWarcSelfCompliant(s, tmp)
          .groupBy("domain")
          .agg(count(lit(1)).as("n_pages"),
            sum(length(col("text"))).as("text_chars"))
          .orderBy("domain")
      },
      Some(
        // r-a: pub p1,p2 (robots blocks /private) = 2 pages;
        // r-b: pub p1,p2 + private p3,p4 = 4;
        // r-c: no robots -> allowed; pub p0,p1,p2 + private p3,p4 = 5.
        """SELECT * FROM (VALUES
          |  ('r-a.example', CAST(2 AS BIGINT), CAST(8 AS BIGINT)),
          |  ('r-b.example', CAST(4 AS BIGINT), CAST(16 AS BIGINT)),
          |  ('r-c.example', CAST(5 AS BIGINT), CAST(20 AS BIGINT)))
          |  AS v(domain, n_pages, text_chars)
          |ORDER BY domain""".stripMargin))

  private def q419 =
    // IDN host normalization (round 17): a unicode host and its
    // punycode twin are ONE site — canonicalization folds both to the
    // ASCII xn-- form the DNS resolves, so the per-domain report
    // groups them together (variants 0 and 1 are the same site
    // spelled two ways; variant 2 is a second IDN site; variant 3
    // ASCII; variant 4 unparseable). The oracle's punycode strings
    // are hand-written public encodings, never computed.
    QueryDef("q419_idn_domains",
      (s, dir) => {
        val v = pmod(col("doc_id"), lit(5))
        val url = elt((v + 1).cast("int"),
          lit("http://bücher.example/p"),
          lit("http://XN--BCHER-KVA.example/p"),
          lit("https://münchen.example/x"),
          lit("http://plain.example/y"),
          lit("javascript:nope"))
        WebCorpus.domainReport(
            t(s, dir, "documents").select(url.as("url")), "url")
          .select(col("domain"), col("n_urls"), col("n_pages"))
          .orderBy("domain")
      },
      Some(
        // n_pages is a hand constant per domain: the two bücher
        // spellings share ONE canonical URL; the invalid variant has
        // no canonical form (count_distinct over nulls = 0)
        """WITH d AS (
          |  SELECT doc_id % 5 AS v, count(*) AS n
          |  FROM documents GROUP BY 1),
          |m AS (SELECT * FROM (VALUES
          |  (0, 'xn--bcher-kva.example'),
          |  (1, 'xn--bcher-kva.example'),
          |  (2, 'xn--mnchen-3ya.example'),
          |  (3, 'plain.example'),
          |  (4, '(invalid)')) AS m(v, domain)),
          |p AS (SELECT * FROM (VALUES
          |  ('xn--bcher-kva.example', 1),
          |  ('xn--mnchen-3ya.example', 1),
          |  ('plain.example', 1),
          |  ('(invalid)', 0)) AS p(domain, np))
          |SELECT m.domain,
          |  CAST(sum(d.n) AS BIGINT) AS n_urls,
          |  CAST(p.np AS BIGINT) AS n_pages
          |FROM d JOIN m ON m.v = d.v JOIN p ON p.domain = m.domain
          |GROUP BY m.domain, p.np
          |ORDER BY m.domain""".stripMargin))

  /** The q413/q414 oracle: per-class body/anchor CASEs over the
    * residue grid + the q69-precedent BM25 CTE chain run once per
    * field, fused `body + 1.5 × anchor`.
    */
  private def anchorBm25Oracle: String = {
        def fieldCtes(p: String, src: String): String =
          s"""${p}tk AS (
             |  SELECT doc_id, list_filter(
             |    string_split_regex(text, ' +'), t -> t <> '') AS tk
             |  FROM $src),
             |${p}dl AS (SELECT doc_id, len(tk) AS dl FROM ${p}tk),
             |${p}stats AS (
             |  SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM ${p}dl),
             |${p}post AS (
             |  SELECT doc_id, dl, term, count(*) AS tf FROM (
             |    SELECT t.doc_id, d.dl, unnest(t.tk) AS term
             |    FROM ${p}tk t JOIN ${p}dl d USING (doc_id))
             |  WHERE term IN ('solar', 'panel')
             |  GROUP BY doc_id, dl, term),
             |${p}dfreq AS (
             |  SELECT term, count(*) AS dfn FROM ${p}post GROUP BY term),
             |${p}scored AS (
             |  SELECT p.doc_id,
             |    sum(ln(1 + (s.n_docs - d.dfn + 0.5) / (d.dfn + 0.5)) *
             |        p.tf * 2.2 /
             |        (p.tf + 1.2 * (0.25 + 0.75 * p.dl / s.avgdl)))
             |      AS score
             |  FROM ${p}post p JOIN ${p}dfreq d USING (term)
             |  CROSS JOIN ${p}stats s
             |  GROUP BY p.doc_id)""".stripMargin
        def caseOver(texts: Seq[String]): String =
          s"""CASE doc_id % 4
             |    WHEN 0 THEN '${texts(0)}' WHEN 1 THEN '${texts(1)}'
             |    WHEN 2 THEN '${texts(2)}' ELSE '${texts(3)}' END"""
            .stripMargin
        // page k carries the anchor text class (k+3)%4 writes
        val anchorByPage =
          Seq(anchorOf(3), anchorOf(0), anchorOf(1), anchorOf(2))
        s"""WITH bodysrc AS (
           |  SELECT doc_id, ${caseOver(bodyOf)} AS text
           |  FROM documents),
           |anchsrc AS (
           |  SELECT doc_id, ${caseOver(anchorByPage)} AS text
           |  FROM documents),
           |${fieldCtes("b", "bodysrc")},
           |${fieldCtes("a", "anchsrc")},
           |fused AS (
           |  SELECT coalesce(b.doc_id, a.doc_id) AS doc_id,
           |    coalesce(b.score, 0) + 1.5 * coalesce(a.score, 0)
           |      AS score
           |  FROM bscored b FULL OUTER JOIN ascored a
           |    ON a.doc_id = b.doc_id),
           |top AS (
           |  SELECT doc_id, score FROM fused
           |  ORDER BY score DESC, doc_id LIMIT 10)
           |SELECT doc_id,
           |  CAST(row_number() OVER (ORDER BY score DESC, doc_id)
           |    AS INT) AS rank,
           |  round(score, 4) AS score
           |FROM top
           |ORDER BY rank""".stripMargin
  }
}
