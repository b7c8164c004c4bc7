package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocklist filtering — the corpus-hygiene gate every public-web
  * training pipeline runs before anything else: drop or flag documents
  * containing banned phrases (slurs, boilerplate markers, licence
  * headers, eval-benchmark canaries). The matcher is one Aho–Corasick
  * automaton pass per document ([[graft.functions.AhoCorasick]]),
  * O(text + matches) for ANY pattern count, so at 100 TB the cost is
  * the corpus scan itself: no shuffle until (and unless) a per-pattern
  * rollup is requested, and that rollup groups on pattern id — at most
  * |blocklist| groups, map-side combined. A `contains`-per-pattern
  * plan would be O(patterns × corpus) and unshippable at real
  * blocklist sizes.
  *
  * Match semantics (shared with the DuckDB oracle): raw UTF-8 bytes,
  * case-sensitive, EVERY occurrence reported — overlapping, nested,
  * and suffix patterns included ("he" fires inside "she"). Callers
  * wanting case folding canonicalize first ([[TextAnalysis]]'s
  * `graft_canon`).
  */
object Blocklist {

  /** Array-of-pattern-ids column: every match in `text`, in match-end
    * order. Null text → null (no fabricated empty hit list).
    */
  def hitsCol(text: Column, patterns: Seq[String]): Column =
    call_function("graft_blockhits", text,
      array(patterns.map(lit): _*))

  /** Per-(document, pattern) hit counts, patterns resolved back to
    * their strings. One corpus pass + one |patterns|-bounded-key
    * aggregate; rows where a document has no hits do not appear.
    */
  def scan(docs: DataFrame, idCol: String, textCol: String,
      patterns: Seq[String]): DataFrame = {
    val pat = array(patterns.map(lit): _*)
    docs
      .select(col(idCol),
        explode(hitsCol(col(textCol), patterns)).as("pattern_id"))
      .groupBy(col(idCol), col("pattern_id"))
      .agg(count(lit(1)).as("n_hits"))
      .withColumn("pattern", element_at(pat, col("pattern_id") + 1))
  }

  /** Blocklist coverage report: per pattern, how many documents it
    * fires in and how many total occurrences. The grouping key space
    * is the blocklist itself, so the shuffle is config-sized no matter
    * the corpus.
    */
  def report(docs: DataFrame, idCol: String, textCol: String,
      patterns: Seq[String]): DataFrame =
    scan(docs, idCol, textCol, patterns)
      .groupBy("pattern")
      .agg(count(lit(1)).as("n_docs"), sum("n_hits").as("n_hits"))

  /** Release-gate filter: keep documents with at most `maxHits` total
    * blocklist occurrences (default: zero tolerance). Pure narrow
    * filter riding the scan — no shuffle, no join; the full row
    * survives for downstream stages.
    *
    * Null text is KEPT, explicitly: a document with no text has no
    * blocklist hits, so the gate has nothing to say about it (drop
    * empties with a quality gate, not the blocklist). Without the
    * explicit isNull arm, ANSI `size(null) <= 0` is null and the
    * filter silently drops the row — which would also contradict
    * [[retentionBySource]], whose null-`__flagged` rows count as
    * retained. The two audit surfaces agree on nulls by construction.
    */
  def clean(docs: DataFrame, textCol: String, patterns: Seq[String],
      maxHits: Int = 0): DataFrame =
    docs.filter(col(textCol).isNull ||
      size(hitsCol(col(textCol), patterns)) <= maxHits)

  /** Redacted text: the union of all match spans, each maximal run of
    * covered characters (overlapping OR adjacent) replaced once
    * ([[graft.functions.AhoCorasick.scrub]]). With a replacement that
    * shares no byte sequence with any pattern, the output is provably
    * hit-free — certify it with [[scrubAudit]], don't assume it.
    */
  def scrub(text: Column, patterns: Seq[String],
      replacement: String = "#"): Column =
    call_function("graft_blockscrub", text,
      array(patterns.map(lit): _*), lit(replacement))

  /** Closed-loop scrub audit (the q365/q370 discipline: the claim is
    * RE-MEASURED on the output, not inferred): per source — documents
    * redacted, match occurrences before, redacted runs, characters
    * removed, and occurrences remaining after the scrub (a release
    * gate requires the last to be zero). Everything is one narrow
    * pass: two automaton runs and length arithmetic per row, then a
    * |sources|-keyed combinable rollup.
    */
  def scrubAudit(docs: DataFrame, sourceCol: String, textCol: String,
      patterns: Seq[String], replacement: String = "#"): DataFrame = {
    val scrubbed = scrub(col(textCol), patterns, replacement)
    val rl = lit(replacement.length)
    // chars_removed = (len(text) − len(scrubbed)) + runs·|repl|. Runs
    // are counted as occurrences of the replacement in the scrubbed
    // text — exact when the replacement never occurs in the source
    // text and does not self-overlap (both true of the default "#"
    // against this corpus; pick accordingly).
    docs
      .withColumn("__before", size(hitsCol(col(textCol), patterns)))
      .withColumn("__scrubbed", scrubbed)
      .withColumn("__runs",
        size(hitsCol(col("__scrubbed"), Seq(replacement))))
      .withColumn("__after",
        size(hitsCol(col("__scrubbed"), patterns)))
      .groupBy(sourceCol)
      .agg(
        sum(when(col("__before") > 0, 1L).otherwise(0L))
          .as("n_docs_redacted"),
        sum(col("__before").cast("long")).as("hits_before"),
        sum(col("__runs").cast("long")).as("n_runs"),
        (sum(length(col(textCol)) - length(col("__scrubbed")))
          + sum(col("__runs").cast("long")) * rl).as("chars_removed"),
        sum(col("__after").cast("long")).as("hits_after"))
  }

  /** Per-source retention audit of [[clean]]: how many documents each
    * source loses to the blocklist, with the retained fraction — the
    * data-card row a curation run publishes next to the gate itself.
    * Null text is never flagged (coalesce-to-false), the same explicit
    * rule [[clean]] applies, so gate and audit always agree.
    */
  def retentionBySource(docs: DataFrame, sourceCol: String,
      textCol: String, patterns: Seq[String], maxHits: Int = 0)
      : DataFrame =
    docs
      .withColumn("__flagged", coalesce(
        size(hitsCol(col(textCol), patterns)) > maxHits, lit(false)))
      .groupBy(sourceCol)
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("__flagged"), 1L).otherwise(0L)).as("n_flagged"),
        round(avg(when(col("__flagged"), 0.0).otherwise(1.0)), 4)
          .as("retained_frac"))
}
