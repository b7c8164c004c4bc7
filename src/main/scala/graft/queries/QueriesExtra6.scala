package graft.queries

import graft.ops.Blocklist
import org.apache.spark.sql.functions._
import Shared._

/** Catalog section 9 (round 14, second half): corpus-hygiene tier —
  * Aho–Corasick blocklist matching over the documents table. The DuckDB
  * oracles reproduce the automaton's every-occurrence semantics (all
  * overlapping / nested matches) with a brute-force position scan:
  * `substr(text, i, len) = pattern` over an unnested position range —
  * O(corpus × positions) in the oracle, which is exactly the cost the
  * automaton avoids (one O(text) pass for ANY pattern count).
  */
private[queries] object QueriesExtra6 {

  /** Shared blocklist for q376/q377: exercises nested patterns ("able"
    * fires inside every "table"), a self-overlapping pattern ("a a" in
    * "a a a" matches twice), a multi-word phrase, and a plain token.
    */
  private val pats = Seq("table", "able", "a a", "fast table", "spark")

  private def patsValues(ps: Seq[String]): String =
    ps.zipWithIndex
      .map { case (p, i) => s"($i, '$p')" }.mkString(", ")

  /** Oracle CTEs shared by the blocklist queries: the literal pattern
    * table and the 1-based position series wide enough for any doc.
    */
  private def blockCtes(ps: Seq[String]): String =
    s"""pats AS (
       |  SELECT * FROM (VALUES ${patsValues(ps)})
       |    AS v(pattern_id, pattern)),
       |series AS (
       |  SELECT CAST(unnest(range(1,
       |    (SELECT max(length(text)) + 1 FROM documents))) AS INT) AS i),
       |hits AS (
       |  SELECT d.doc_id, d.source, p.pattern_id, p.pattern,
       |    CAST(count(*) AS BIGINT) AS n_hits
       |  FROM documents d
       |  CROSS JOIN pats p
       |  JOIN series s ON s.i <= length(d.text) - length(p.pattern) + 1
       |  WHERE substr(d.text, s.i, length(p.pattern)) = p.pattern
       |  GROUP BY 1, 2, 3, 4)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // Aho–Corasick blocklist scan (Blocklist.scan): every overlapping /
    // nested occurrence of every pattern, per (document, pattern), in
    // ONE automaton pass per document riding the corpus scan — the
    // 100 TB shape for blocklist hygiene (a contains-per-pattern plan
    // is O(patterns × corpus)). The only shuffle groups on
    // (doc_id, pattern_id), map-side combined.
    QueryDef("q376_blocklist_scan",
      (s, dir) => Blocklist.scan(t(s, dir, "documents"),
          "doc_id", "text", pats)
        .orderBy("doc_id", "pattern_id"),
      Some(
        s"""WITH ${blockCtes(pats)}
           |SELECT doc_id, pattern_id, n_hits, pattern
           |FROM hits
           |ORDER BY doc_id, pattern_id""".stripMargin)),

    // Blocklist coverage report (Blocklist.report): per pattern, how
    // many documents fire and how many total occurrences — the
    // config-sized rollup a blocklist owner reviews before a release
    // gate. The second aggregate's key space is the blocklist itself,
    // so the shuffle is bounded by config no matter the corpus.
    QueryDef("q377_blocklist_report",
      (s, dir) => Blocklist.report(t(s, dir, "documents"),
          "doc_id", "text", pats)
        .orderBy("pattern"),
      Some(
        s"""WITH ${blockCtes(pats)}
           |SELECT pattern, CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(n_hits) AS BIGINT) AS n_hits
           |FROM hits
           |GROUP BY 1
           |ORDER BY pattern""".stripMargin)),

    // Release-gate retention audit (Blocklist.retentionBySource): how
    // many documents each source loses to a zero-tolerance blocklist,
    // with the retained fraction — the data-card row published next to
    // the gate. Flagging is a narrow per-row predicate (no join against
    // a hit table); the only shuffle is the per-source rollup.
    QueryDef("q378_blocklist_retention",
      (s, dir) => Blocklist.retentionBySource(t(s, dir, "documents"),
          "source", "text",
          Seq("slow merge", "window window", "batch batch"))
        .orderBy("source"),
      Some {
        val ps = Seq("slow merge", "window window", "batch batch")
        s"""WITH ${blockCtes(ps)},
           |doc_hits AS (
           |  SELECT doc_id, sum(n_hits) AS h FROM hits GROUP BY 1),
           |flags AS (
           |  SELECT d.source,
           |    CASE WHEN coalesce(h.h, 0) > 0 THEN 1 ELSE 0 END AS f
           |  FROM documents d LEFT JOIN doc_hits h USING (doc_id))
           |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(f) AS BIGINT) AS n_flagged,
           |  round(avg(CASE WHEN f = 1 THEN 0.0 ELSE 1.0 END), 4)
           |    AS retained_frac
           |FROM flags
           |GROUP BY 1
           |ORDER BY source""".stripMargin
      })
  )
}
