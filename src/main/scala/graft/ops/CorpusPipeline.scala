package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The composed training-data curation flow — the reason the LLM-tier
  * operators exist as a LIBRARY: exact dedup → quality / language
  * gating → near-duplicate removal → corpus accounting, each stage a
  * shuffle-conscious operator already proven individually.
  *
  * Scale shape: stage 1 is one hash aggregate; stage 2 is narrow
  * per-row scoring; stage 3 reuses the banded minhash join (never
  * all-pairs) and clusters its pairs with hash-min label propagation
  * (rounds = dup-graph diameter, 2–4 in practice); the final
  * accounting is a partial+final hash aggregate. Nothing materializes
  * on the driver.
  */
object CorpusPipeline {

  /** Returns the per-source accounting of the curated corpus:
    * documents kept, tokens kept, and how many fell to each gate
    * (`dropped_exact_dup` / `dropped_quality` / `dropped_near_dup`).
    * Every source present in the input appears — a source whose docs
    * all fell shows `docs_kept = 0` with its funnel, which is exactly
    * the row a curation audit needs to see.
    *
    * Near-dup policy: CLUSTER-based. The verified minhash pairs are
    * edges; [[Components.dedupClusters]] takes their transitive
    * closure and exactly the minimum id of each connected component
    * survives. Dropping the larger id of each PAIR instead
    * under-deletes: with verified pairs (A,C) and (B,C) but no (A,B)
    * — one cluster {A,B,C} — pair-drop keeps both A and B (see
    * [[Components]]).
    */
  /** Every input row tagged with its curation `_fate` (`kept` /
    * `exact_dup` / `quality` / `near_dup`) — the single source of
    * truth behind both [[curate]] (the per-source funnel aggregate)
    * and [[curatedDocs]] (the surviving rows themselves).
    */
  private def fates(
      df: DataFrame, idCol: String, textCol: String,
      minQuality: Double, lang: String,
      minhashK: Int, bands: Int, jaccard: Double,
      trainedLangId: Boolean,
      langs: Set[String]): DataFrame = {
    // multilingual gate (round 18): a non-empty `langs` keeps every
    // listed language — the shard-mix reality of a multilingual
    // corpus; empty = the single-`lang` gate. The two parameters are
    // mutually exclusive (ADVICE r18): a non-empty set would silently
    // discard an explicit single `lang`.
    require(langs.isEmpty || lang == "en",
      s"pass EITHER langs=$langs OR lang='$lang', not both — a " +
        "non-empty langs set replaces the single-language gate")
    val langOk: Column => Column =
      if (langs.isEmpty) _ === lang
      else _.isin(langs.toSeq.sorted: _*)
    // Stage 1: exact-dup winners (lowest id per identical text).
    val exactWinners = Dedup.exact(df, textCol, idCol)
      .select(col("keep_id").as(idCol), lit(true).as("_exact_w"))

    // The language gate rides the TRAINED kernel by default (round 18
    // — VERDICT r17 task 1): `graft_langid`'s script gate + trigram NB
    // with an und-margin, not the stopword-ratio heuristic that
    // mislabels short and non-Latin documents. `trainedLangId = false`
    // keeps the heuristic reachable (q50/q100's oracle replays it in
    // SQL; the trained gate's catalog coverage is the hand-labeled
    // q420 fixture, where labels are pinnable).
    val langOf: Column => Column =
      if (trainedLangId) TextAnalysis.langId(_)
      else TextAnalysis.langIdHeuristic(_, 0.05)

    // Stage 2: quality + language signals (narrow, codegen'd). Scored
    // for every row — exact losers carry the same text, so scoring
    // them costs nothing extra and the funnel attributes them to the
    // gate that actually removed them (exact dedup runs first).
    //
    // Materialized ONCE (localCheckpoint) for its three consumers:
    // the minhash pair join, the cluster node list, and the final
    // fate join. Lazy recomputation ran the exact-dedup join +
    // scoring ~3x once near-dup went cluster-based (pairs AND nodes
    // both derive from `gated`) — same 3-consumer shape, same fix,
    // as the curated-set checkpoint in the mix/shard composition.
    // Quality is scored against the LANGUAGES THE GATE KEEPS (round
    // 19 — VERDICT r18 task 1): the single-language path keeps the
    // English-profile score (its oracle replays it in SQL), while a
    // multilingual set scores with the script-aware per-language
    // profile — a kept Japanese document must not be quality-killed
    // by an English stopword list over whitespace pseudo-tokens.
    val qualityK: Column => Column =
      if (langs.isEmpty) TextAnalysis.qualityScore(_)
      else TextAnalysis.qualityScoreFor(_, langs)
    val scored = df.join(exactWinners, Seq(idCol), "left")
      .withColumn("_quality", qualityK(col(textCol)))
      .withColumn("_lang", langOf(col(textCol)))
      .withColumn("_gate_ok",
        coalesce(col("_exact_w"), lit(false)) &&
          col("_quality") >= minQuality && langOk(col("_lang")))
      .localCheckpoint()
    val gated = scored.filter(col("_gate_ok"))
      .select(df.columns.map(col).toSeq: _*)

    // Stage 3: near-dup CLUSTERS over the gated survivors (smaller
    // input → smaller candidate set): banded minhash pairs → connected
    // components → keep exactly each component's min id.
    val pairs = Dedup.minhashNearDups(gated, idCol, textCol,
      k = minhashK, bands = bands, threshold = jaccard)
    val reps = Components.dedupClusters(gated, idCol, pairs, "id_a", "id_b")
      .filter(col(idCol) === col("component"))
      .select(col(idCol), lit(true).as("_nd_keep"))

    // One pass attributes every input doc to its fate, reading the
    // checkpointed `scored` frame (third consumer).
    scored.join(reps, Seq(idCol), "left")
      .withColumn("_fate",
        when(!coalesce(col("_exact_w"), lit(false)), lit("exact_dup"))
          .when(!col("_gate_ok"), lit("quality"))
          .when(col("_nd_keep").isNull, lit("near_dup"))
          .otherwise(lit("kept")))
  }

  /** `lang` and `langs` are MUTUALLY EXCLUSIVE (enforced): a
    * non-empty `langs` replaces the single-language gate entirely —
    * it keeps every listed language and scores quality against the
    * set's per-language profiles ([[TextAnalysis.qualityScoreFor]]);
    * passing both throws rather than silently dropping `lang`.
    */
  def curate(
      df: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      sourceCol: String = "source",
      minQuality: Double = 0.5, lang: String = "en",
      minhashK: Int = 64, bands: Int = 8, jaccard: Double = 0.8,
      trainedLangId: Boolean = true,
      langs: Set[String] = Set.empty): DataFrame =
    // The funnel aggregate is partial+final combinable.
    fates(df, idCol, textCol, minQuality, lang, minhashK, bands, jaccard,
      trainedLangId, langs)
      .groupBy(col(sourceCol))
      .agg(
        count(when(col("_fate") === "kept", 1)).as("docs_kept"),
        coalesce(sum(when(col("_fate") === "kept",
          TextAnalysis.tokenCount(col(textCol)))), lit(0L)).as("tokens_kept"),
        count(when(col("_fate") === "exact_dup", 1)).as("dropped_exact_dup"),
        count(when(col("_fate") === "quality", 1)).as("dropped_quality"),
        count(when(col("_fate") === "near_dup", 1)).as("dropped_near_dup"))
      .orderBy(sourceCol)

  /** The curated corpus itself — the rows [[curate]] counts as `kept`,
    * with the input schema (the frame a mixing/sharding step consumes).
    */
  def curatedDocs(
      df: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      minQuality: Double = 0.5, lang: String = "en",
      minhashK: Int = 64, bands: Int = 8, jaccard: Double = 0.8,
      trainedLangId: Boolean = true,
      langs: Set[String] = Set.empty): DataFrame =
    fates(df, idCol, textCol, minQuality, lang, minhashK, bands, jaccard,
      trainedLangId, langs)
      .filter(col("_fate") === "kept")
      .select(df.columns.map(col).toSeq: _*)

  /** The complete standard curation flow: PII scrub → benchmark
    * decontamination → [[curate]] (exact dedup → quality/language gate
    * → near-dup removal → accounting). Each added stage is narrow or a
    * broadcast semi-join, so the scale shape of [[curate]] is
    * unchanged. Redaction runs FIRST so dedup/quality/shingles all see
    * the text the model would actually train on.
    */
  def curateFull(
      df: DataFrame, benchmark: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      sourceCol: String = "source", decontamN: Int = 5,
      minQuality: Double = 0.5, lang: String = "en",
      minhashK: Int = 64, bands: Int = 8, jaccard: Double = 0.8,
      trainedLangId: Boolean = true,
      langs: Set[String] = Set.empty): DataFrame = {
    val scrubbed = df.withColumn(textCol,
      TextAnalysis.redactPii(col(textCol)))
    val clean = Dedup.decontaminate(scrubbed, benchmark, idCol, textCol, decontamN)
    curate(clean, idCol, textCol, sourceCol, minQuality, lang,
      minhashK, bands, jaccard, trainedLangId, langs)
  }

  /** WARC → curation-ready documents (round 16): the ingest glue from
    * a crawl directory to the frame [[curateFull]] consumes. Response
    * records stream in ([[graft.sources.Warc.readBinary]] — raw
    * bytes, memory ∝ record), the HTTP envelope gates on 2xx + HTML
    * MIME BEFORE extraction, the body decodes charset-aware, HTML
    * becomes text, empty extractions drop, and canonical-URL dedup
    * keeps one row per page. Output: (doc_id, source = warc file,
    * url, domain, text). Doc ids are content-independent 64-bit
    * url+file hashes (re-ingesting the same crawl cut reproduces
    * identical ids), so DUPLICATE CAPTURES of one page can share an
    * id — the dedup therefore keys on the canonical URL itself with
    * a `min_by` survivor ordered on (id, text): deterministic, one
    * aggregate shuffle, no join-back, and ties that min-id keying
    * could not break (equal ids, different bodies) break on text.
    * Unparseable URLs pass through untouched (the urlDedup contract).
    * `glob` selects the WARC files (default: our own writer's
    * `part-*`; a Common Crawl-style directory passes `"*.warc.gz"`) —
    * zero matches fail loudly. The HTTP envelope is parsed once per
    * record: header-only for the gate, full (body decode included)
    * only for gate-passing rows.
    *
    * `mimes` (round 18 — VERDICT r17 task 7) is the content-type set
    * the gate keeps: the default is HTML-only; real crawl corpora also
    * keep `text/plain` documents, whose bodies take the charset decode
    * DIRECTLY (no HTML extraction) — pass
    * `HtmlMimes + "text/plain"`.
    */
  def fromWarc(spark: org.apache.spark.sql.SparkSession,
      dir: String, glob: String = "part-*",
      mimes: Set[String] = HtmlMimes): DataFrame =
    dedupByCanonUrl(extractDocs(
      graft.sources.Warc.readBinary(spark, dir, glob), mimes))

  /** [[fromWarc]] with an RFC 9309 COMPLIANCE gate (round 17): each
    * record's URL is judged against its registrable domain's
    * robots.txt BEFORE any extraction, so a disallowed page never
    * costs a body decode, never enters the corpus, and never reaches
    * dedup — the lawful-ingest ordering q391 pinned for curation,
    * pushed down into the ingest itself. `robots` is per-site CONFIG
    * (`domain`, `robots_txt`) — dimension-sized, so the join
    * broadcasts; the verdict is one cached-parse glob match per row
    * riding the scan. Missing robots → allowed (the RFC default);
    * URLs with no canonical path (unfetchable) pass the gate — they
    * cannot be fetched, so compliance is moot and they remain
    * auditable downstream.
    */
  def fromWarcCompliant(spark: org.apache.spark.sql.SparkSession,
      dir: String, robots: DataFrame, agent: String = "*",
      glob: String = "part-*",
      mimes: Set[String] = HtmlMimes): DataFrame =
    dedupByCanonUrl(extractDocs(complianceGate(
      graft.sources.Warc.readBinary(spark, dir, glob), robots, agent),
      mimes))

  /** The RFC 9309 gate both compliant ingests (batch and streaming)
    * ride: judge each record's URL against its registrable domain's
    * broadcast robots dimension BEFORE any extraction. Missing robots
    * → allowed (the RFC default); URLs with no canonical path
    * (unfetchable) pass — compliance is moot and they stay auditable
    * downstream.
    */
  private def complianceGate(read: DataFrame, robots: DataFrame,
      agent: String): DataFrame =
    read
      .withColumn("__domain", WebCorpus.domain(col("url")))
      .withColumn("__path", WebCorpus.urlPathQuery(col("url")))
      .join(broadcast(robots.select(col("domain").as("__domain"),
        col("robots_txt"))), Seq("__domain"), "left")
      .where(col("__path").isNull ||
        coalesce(WebCorpus.robotsAllowed(col("__path"),
          col("robots_txt"), agent), lit(true)))
      .select("warc_file", "url", "payload_bytes", "n_bytes")

  /** The per-site robots dimension EXTRACTED FROM THE CRAWL ITSELF
    * (round 17): real cuts capture `/robots.txt` responses like any
    * other page, so the compliance config need not arrive out of
    * band. 2xx robots bodies (and raw `resource` captures, which have
    * no status) decode charset-aware into (domain, robots_txt); 4xx/
    * 5xx/redirect captures are skipped — an unavailable robots file
    * means no rules (the RFC default, which [[fromWarcCompliant]]
    * already applies to missing domains). One survivor per domain,
    * deterministic `min_by` on (url, body). Output is |sites|-sized —
    * exactly the broadcast dimension the compliance gate wants.
    *
    * The `/robots.txt` predicate is PUSHED INTO the record walk
    * (round 18 — VERDICT r17 task 3): every non-robots payload
    * strict-skips through the reused scratch buffer, so this pass —
    * and therefore [[fromWarcSelfCompliant]]'s and [[ingestReport]]'s
    * second directory walk — costs the decompress floor, never the
    * page volume (WarcSpec pins it on the materialized-bytes counter;
    * the `robots_scan` ScaleProbe row measures it flat in content
    * bytes). The DataFrame-side `where` stays as the semantic anchor —
    * it now sees only the |robots|-sized remainder.
    */
  def robotsFromWarc(spark: org.apache.spark.sql.SparkSession,
      dir: String, glob: String = "part-*"): DataFrame = {
    val h = WebCorpus.httpHead(col("payload_bytes"))
    graft.sources.Warc.readBinary(spark, dir, glob,
        urlFilter = CorpusPipeline.isRobotsUrl)
      .where(WebCorpus.urlPath(col("url")) === "/robots.txt")
      .where(h.getField("status").isNull ||
        (h.getField("status") >= 200 && h.getField("status") <= 299))
      .select(WebCorpus.domain(col("url")).as("domain"),
        col("url"),
        WebCorpus.httpText(col("payload_bytes")).as("robots_txt"))
      .where(col("domain").isNotNull)
      .groupBy("domain")
      .agg(min_by(col("robots_txt"),
        struct(col("url"), col("robots_txt"))).as("robots_txt"))
  }

  /** The task-side twin of the `urlPath === "/robots.txt"` predicate,
    * shared with the record walk's pushed-down filter — SAME kernel
    * ([[graft.functions.UrlKit.pathOf]]) as the Column form, so the
    * two layers cannot disagree on what a robots URL is.
    */
  private[graft] val isRobotsUrl: String => Boolean = { u =>
    val p = graft.functions.UrlKit.pathOf(
      org.apache.spark.unsafe.types.UTF8String.fromString(u))
    p != null && p.toString == "/robots.txt"
  }

  /** [[fromWarcCompliant]] with the robots dimension mined from the
    * SAME cut ([[robotsFromWarc]]) — the fully self-contained lawful
    * ingest: one directory in, compliance-gated curation-ready
    * documents out. The robots pass is a second directory walk; its
    * HTTP decode runs only on the robots rows (the URL filter sits
    * below the projection) and the result is |sites|-sized before it
    * broadcasts.
    */
  def fromWarcSelfCompliant(spark: org.apache.spark.sql.SparkSession,
      dir: String, agent: String = "*",
      glob: String = "part-*",
      mimes: Set[String] = HtmlMimes): DataFrame =
    fromWarcCompliant(spark, dir, robotsFromWarc(spark, dir, glob),
      agent, glob, mimes)

  /** The media types whose bodies go through HTML text extraction —
    * and the default content-type set the ingest gate keeps.
    */
  val HtmlMimes: Set[String] = Set("text/html", "application/xhtml+xml")

  /** The shared gate+extract stage: status/MIME gate on the
    * HEADER-ONLY parse (no body copy/dechunk/inflate — cheap even if
    * predicate pushdown duplicates it), then the body decodes exactly
    * ONCE, inside the text kernel, for gate-passing rows only. HTML
    * media types extract markup to text; any other kept type (round
    * 18: e.g. `text/plain`) takes the charset decode directly — the
    * `when` branches evaluate at most one decode per row. The
    * empty-text drop is an explode over a filtered 0/1-element array
    * rather than a Filter node: a Filter on the text column would
    * push through the projection and re-run the whole decode+extract
    * kernel a second time per surviving row (the round-16
    * double-parse, HttpSpec-pinned now).
    */
  private def extractDocs(read: DataFrame,
      mimes: Set[String] = HtmlMimes): DataFrame = {
    require(mimes.nonEmpty, "mimes must be non-empty")
    val h = WebCorpus.httpHead(col("payload_bytes"))
    val ct = h.getField("content_type")
    val gate = h.getField("status") >= 200 &&
      h.getField("status") <= 299 && ct.isin(mimes.toSeq.sorted: _*)
    val decoded = WebCorpus.httpText(col("payload_bytes"))
    val textK =
      if (mimes.subsetOf(HtmlMimes)) WebCorpus.htmlText(decoded)
      else when(ct.isin(HtmlMimes.toSeq.sorted: _*),
        WebCorpus.htmlText(decoded)).otherwise(decoded)
    read
      .where(gate)
      .select(
        xxhash64(col("url"), col("warc_file")).as("doc_id"),
        col("warc_file").as("source"), col("url"),
        WebCorpus.domain(col("url")).as("domain"),
        explode(filter(array(textK), t => length(t) > 0)).as("text"))
  }

  private def dedupByCanonUrl(docs: DataFrame): DataFrame = {
    val row = struct(col("doc_id"), col("source"), col("url"),
      col("domain"), col("text"))
    // ONE scan, one shuffle: rows whose URL does not canonicalize get a
    // per-row synthetic group key (NUL-prefixed, disjoint from any
    // canonical URL) so they pass through as singleton groups instead
    // of riding a second filtered branch of the same scan — the
    // round-16 unionByName shape decoded every payload TWICE, once per
    // branch (the single-parse counter in HttpSpec pins this too).
    docs
      .withColumn("__grp", coalesce(
        WebCorpus.canonUrl(col("url")),
        concat(lit("\u0000"), col("url"), lit("\u0000"),
          monotonically_increasing_id().cast("string"))))
      .groupBy("__grp")
      .agg(min_by(row, struct(col("doc_id"), col("text"))).as("__r"))
      .select(col("__r.*"))
  }

  /** WET → curation-ready documents (round 18): the Common Crawl
    * text-extract sibling format — `WARC-Type: conversion` records
    * whose payload is ALREADY extracted UTF-8 text (ISO 28500 WET
    * convention; no HTTP envelope, no markup). Most corpus builds
    * start from WET, not raw WARC, so this is the higher-traffic
    * entry point: same record-streaming walk, direct UTF-8 decode
    * (spec-guaranteed charset; REPLACE on junk bytes), the empty-text
    * explode-drop, and the same canonical-URL `min_by` dedup —
    * output schema identical to [[fromWarc]], so everything
    * downstream ([[curate]], the maintainers) composes unchanged.
    * A real Common Crawl segment passes `glob = "*.warc.wet.gz"`.
    */
  def fromWet(spark: org.apache.spark.sql.SparkSession,
      dir: String, glob: String = "part-*"): DataFrame =
    dedupByCanonUrl(extractWetDocs(
      graft.sources.Warc.readBinary(spark, dir, glob,
        types = Set("conversion"))))

  /** The WET projection both twins share: direct UTF-8 decode (the
    * WET spec charset) + the empty-text explode-drop, emitting the
    * [[fromWarc]] output schema. The decode is the LOSSY kernel
    * (`graft_utf8_lossy` — round 19, ADVICE r18): Spark's built-in
    * `decode(col, 'UTF-8')` fail-stops on any invalid byte under the
    * default coding-error action, and real-world WET segments — the
    * advertised input — do carry junk bytes; they must become U+FFFD,
    * not a task failure.
    */
  private def extractWetDocs(read: DataFrame): DataFrame = {
    val textK = call_function("graft_utf8_lossy", col("payload_bytes"))
    read.select(
      xxhash64(col("url"), col("warc_file")).as("doc_id"),
      col("warc_file").as("source"), col("url"),
      WebCorpus.domain(col("url")).as("domain"),
      explode(filter(array(textK), t => length(t) > 0)).as("text"))
  }

  /** The WAT `Envelope` fields this ingest reads — the Common Crawl
    * metadata-sidecar convention (public format): per captured page,
    * the parsed HTML head/link inventory under
    * `Payload-Metadata.HTTP-Response-Metadata.HTML-Metadata`.
    * Unmodeled fields are ignored by `from_json`; a non-JSON or
    * differently-shaped payload parses to nulls and contributes no
    * rows after the link explode (total on junk).
    */
  private val watSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    val link = StructType(Seq(
      StructField("path", StringType),
      StructField("url", StringType),
      StructField("text", StringType)))
    val htmlMeta = StructType(Seq(
      StructField("Head", StructType(Seq(StructField("Base", StringType)))),
      StructField("Links", ArrayType(link))))
    val httpMeta = StructType(Seq(StructField("HTML-Metadata", htmlMeta)))
    val payloadMeta = StructType(Seq(
      StructField("HTTP-Response-Metadata", httpMeta)))
    val envelope = StructType(Seq(
      StructField("Payload-Metadata", payloadMeta)))
    StructType(Seq(StructField("Envelope", envelope)))
  }

  /** WAT → per-page link records (round 19 — VERDICT r18 task 2): the
    * third Common Crawl artifact, completing the WARC/WET/WAT triple.
    * WAT files are WARC files whose `WARC-Type: metadata` records
    * carry a JSON summary of each capture — notably the parsed
    * `<base>` and the `<a href>` inventory — so a link-graph build
    * can skip re-parsing raw HTML entirely (the usual production
    * posture: WAT is a fraction of WARC's bytes).
    *
    * Same record-streaming walk as the siblings (task memory ∝ one
    * record), the lossy UTF-8 decode (WAT is spec-UTF-8 JSON; junk
    * bytes must not kill the ingest), one `from_json` against the
    * narrow [[watSchema]] (unmodeled fields never materialize), and a
    * narrow explode. Output: `url` (the captured page), `base` (the
    * page's effective base URL — `Head.Base` resolved against the
    * page, the [[graft.ops.WebCorpus.linkGraphResolved]] rule),
    * `path` (the WAT link kind, e.g. `A@/href`), `href` (raw target),
    * `anchor_text` (null when the record carries none). Pages whose
    * metadata parses but lists no links emit nothing — exactly the
    * pages that contribute no edges.
    *
    * A real Common Crawl segment passes `glob = "*.warc.wat.gz"`.
    */
  def fromWat(spark: org.apache.spark.sql.SparkSession,
      dir: String, glob: String = "part-*"): DataFrame = {
    val meta = from_json(
      call_function("graft_utf8_lossy", col("payload_bytes")), watSchema)
    graft.sources.Warc.readBinary(spark, dir, glob,
        types = Set("metadata"))
      .select(col("url"),
        meta.getField("Envelope").getField("Payload-Metadata")
          .getField("HTTP-Response-Metadata").getField("HTML-Metadata")
          .as("__m"))
      .select(col("url"),
        coalesce(
          WebCorpus.resolveUrl(col("url"),
            col("__m").getField("Head").getField("Base")),
          col("url")).as("base"),
        explode(col("__m").getField("Links")).as("__l"))
      .select(col("url"), col("base"),
        col("__l").getField("path").as("path"),
        col("__l").getField("url").as("href"),
        col("__l").getField("text").as("anchor_text"))
  }

  /** The cross-domain link graph from [[fromWat]] records —
    * EDGE-IDENTICAL to [[graft.ops.WebCorpus.linkGraphResolved]] over
    * the raw HTML of the same capture (WarcSpec pins the parity):
    * anchor links (`A@/href`) resolve against the page's effective
    * base, fold to registrable domains, self edges and unresolvable
    * targets drop, one (site, site)-keyed rollup.
    */
  def watLinkGraph(wat: DataFrame): DataFrame =
    wat
      .where(col("path") === "A@/href" && col("href").isNotNull)
      .select(WebCorpus.domain(col("url")).as("src_domain"),
        WebCorpus.domain(WebCorpus.resolveUrl(col("base"), col("href")))
          .as("dst_domain"))
      .where(col("src_domain").isNotNull && col("dst_domain").isNotNull &&
        col("src_domain") =!= col("dst_domain"))
      .groupBy("src_domain", "dst_domain")
      .agg(count(lit(1)).as("n_links"))

  /** STREAMING twin of [[fromWarc]] minus the dedup tail: WARC files
    * landing in `dir` become a stream of curation-ready documents
    * (doc_id, source, url, domain, text) — the record-streaming read
    * ([[graft.sources.Warc.readStreamBinary]], whole files never
    * materialize), the head-only gate and the single body decode are
    * the batch path's, per micro-batch. Canonical-URL dedup is a
    * CROSS-batch concern and stays with the consumer: feed this into
    * the incremental index maintainers / `urlDedup`-style probes
    * (`streaming/EventStream`), which carry the standing state a
    * stream cannot hold in one batch.
    */
  def fromWarcStream(spark: org.apache.spark.sql.SparkSession,
      dir: String, glob: String = "*",
      mimes: Set[String] = HtmlMimes): DataFrame =
    extractDocs(graft.sources.Warc.readStreamBinary(spark, dir, glob),
      mimes)

  /** STREAMING twin of [[fromWet]] minus the dedup tail (the
    * [[fromWarcStream]] contract): WET files landing in `dir` become
    * a stream of curation-ready documents off the conversion-record
    * walk — text decodes directly, no HTTP envelope. Cross-batch
    * canonical-URL dedup stays with the stateful consumers.
    */
  def fromWetStream(spark: org.apache.spark.sql.SparkSession,
      dir: String, glob: String = "*"): DataFrame =
    extractWetDocs(graft.sources.Warc.readStreamBinary(spark, dir,
      glob, types = Set("conversion")))

  /** STREAMING twin of [[fromWarcCompliant]] (round 18 — VERDICT r17
    * task 6): the same broadcast robots gate applied inside
    * [[fromWarcStream]]'s per-batch plan, so a landing-directory
    * pipeline that must honor robots no longer re-implements the gate
    * by hand. `robots` is a STATIC per-site dimension resolved once at
    * plan time (a static frame joined into a streaming plan is the
    * supported static-side broadcast) — re-resolving it per trigger is
    * a non-goal; restart the stream to pick up new robots. Dedup stays
    * with the consumer, exactly as [[fromWarcStream]] documents.
    */
  def fromWarcStreamCompliant(spark: org.apache.spark.sql.SparkSession,
      dir: String, robots: DataFrame, agent: String = "*",
      glob: String = "*", mimes: Set[String] = HtmlMimes): DataFrame =
    extractDocs(complianceGate(
      graft.sources.Warc.readStreamBinary(spark, dir, glob),
      robots, agent), mimes)

  /** The crawl-cut data card (round 17): [[fromWarc]]'s extracted
    * pages rolled per domain, side by side with the cut's `revisit`
    * captures ([[graft.sources.Warc.readRevisits]]) — pages the crawl
    * re-verified byte-identical WITHOUT re-storing a body. Per
    * domain: `n_pages` (canonical pages extracted), `text_chars`, and
    * `n_revisits` (attributed to the REFERRED capture's domain). A
    * domain with revisits but zero pages is content the cut verified
    * but holds elsewhere — the row that tells a recrawl planner what
    * not to re-extract.
    *
    * Cost shape: two passes over the directory — the content pass
    * (which strict-SKIPS revisit payloads with a scratch buffer) and
    * the revisit pass (which strict-skips every content body, so it
    * allocates nothing ∝ page size). Each rollup is
    * |domains|-keyed, map-side combined.
    */
  def ingestReport(spark: org.apache.spark.sql.SparkSession,
      dir: String, glob: String = "part-*"): DataFrame = {
    val pages = fromWarc(spark, dir, glob)
      .groupBy("domain")
      .agg(count(lit(1)).as("n_pages"),
        sum(length(col("text"))).as("text_chars"))
    val revs = graft.sources.Warc.readRevisits(spark, dir, glob)
      .select(coalesce(
        WebCorpus.domain(coalesce(col("refers_to"), col("url"))),
        lit("(invalid)")).as("domain"))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_revisits"))
    pages.join(revs, Seq("domain"), "full_outer")
      .select(col("domain"),
        coalesce(col("n_pages"), lit(0L)).as("n_pages"),
        coalesce(col("text_chars"), lit(0L)).as("text_chars"),
        coalesce(col("n_revisits"), lit(0L)).as("n_revisits"))
  }

  /** Per-language gate pass rates (round 19 — VERDICT r18 task 6):
    * the data-card row that makes an English-centric gate misfiring
    * on a kept language VISIBLE instead of silent. Per predicted
    * language ([[TextAnalysis.langId]]): document count, how many
    * clear the per-language quality score at `minQuality`
    * ([[TextAnalysis.qualityScoreFor]] when the language has a
    * profile, the English-profile [[TextAnalysis.qualityScore]]
    * otherwise — exactly what a single-language pipeline would have
    * applied, which is the failure mode this report exposes), how
    * many pass every multilingual Gopher gate
    * ([[TextAnalysis.gopherGatesFor]]), and both as exact-integer
    * ppm. A kept language whose `quality_pass_ppm` craters is the
    * q424-class composition bug, caught in the report instead of a
    * curation postmortem.
    *
    * One narrow classify+score pass + a |languages|-keyed combinable
    * rollup — corpus-linear, no extra shuffle beyond the rollup.
    */
  def langGateReport(
      docs: DataFrame, textCol: String = "text",
      langs: Set[String] = Set("en"),
      minQuality: Double = 0.5): DataFrame = {
    val text = col(textCol)
    val profiled = langs.filter(l =>
      TextAnalysis.QualityLangs.contains(l) || l == "und")
    val quality =
      if (profiled.exists(_ != "und"))
        TextAnalysis.qualityScoreFor(text, profiled)
      else TextAnalysis.qualityScore(text)
    val gateLangs =
      if (profiled.exists(_ != "und")) profiled else Set("en")
    val keep = TextAnalysis.gopherGateCols(text, gateLangs)
      .map(_._2).reduce(_ * _)
    docs
      .select(TextAnalysis.langId(text).as("lang"),
        when(quality >= minQuality, 1L).otherwise(0L).as("__q"),
        keep.cast("long").as("__k"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("__q").as("n_quality_pass"),
        sum("__k").as("n_gopher_pass"))
      .select(col("lang"), col("n_docs"),
        col("n_quality_pass"),
        expr("(n_quality_pass * 1000000) DIV n_docs")
          .as("quality_pass_ppm"),
        col("n_gopher_pass"),
        expr("(n_gopher_pass * 1000000) DIV n_docs")
          .as("gopher_pass_ppm"))
  }

  /** The INDEX-ONLY corpus health report — the nightly dashboard a
    * 100 TB pipeline must serve without touching a corpus row: every
    * input is a STORED index, so the plan's only leaves are the
    * index tables (asserted in LayoutSpec) and probe cost is
    * O(index), never O(corpus).
    *
    * Per source: doc counts + near-dup exposure from the persisted
    * cluster map ([[Components.clustersFromIndex]]) joined doc-grain
    * to the docstore dimension (both `doc_id`-bucketed), distinct
    * -token estimate from the HLL
    * register index, and p50/p90 length from the histogram-partial
    * index. `corpus_distinct_est` repeats the merged all-source HLL
    * estimate (element-wise register max — the sketch-merge law) on
    * every row, the dashboard's headline number.
    *
    * @param clusterIdx stored cluster map (`doc_id`, `component`)
    * @param docstore   doc-grain dimension (`doc_id`, sourceCol)
    * @param hllRegs    HLL register index (sourceCol, `bucket`,
    *                   `register`), precision `p`
    * @param histIdx    histogram partials (sourceCol, `b`, `cnt`)
    *                   over [lo, hi) with `nbins` buckets
    */
  def healthFromIndexes(
      clusterIdx: DataFrame, docstore: DataFrame, hllRegs: DataFrame,
      histIdx: DataFrame, sourceCol: String, p: Int,
      lo: Double, hi: Double, nbins: Int): DataFrame = {
    val dup = Components.clustersFromIndex(clusterIdx)
      .join(docstore, "doc_id")
      .groupBy(sourceCol)
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("cluster_size") > 1, 1L).otherwise(0L))
          .as("n_dup_docs"))
      .withColumn("dup_ppm",
        expr("n_dup_docs * 1000000 DIV n_docs"))
    val hll = CardinalityEstimate.hllFromRegisters(hllRegs, sourceCol, p)
      .select(col(sourceCol), col("hll_est").as("distinct_tokens_est"),
        col("merged_est").as("corpus_distinct_est"))
    val qs = Stats.histPercentilesFromIndex(
        histIdx, sourceCol, lo, hi, nbins, ps = Seq(0.5, 0.9))
      .groupBy(sourceCol)
      .agg(max(when(col("p") === 0.5, col("est"))).as("p50_chars"),
        max(when(col("p") === 0.9, col("est"))).as("p90_chars"))
    dup.join(hll, sourceCol).join(qs, sourceCol)
      .select(col(sourceCol), col("n_docs"), col("n_dup_docs"),
        col("dup_ppm"), col("distinct_tokens_est"),
        col("corpus_distinct_est"), col("p50_chars"), col("p90_chars"))
  }
}
