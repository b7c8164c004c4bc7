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
    */
  def clean(docs: DataFrame, textCol: String, patterns: Seq[String],
      maxHits: Int = 0): DataFrame =
    docs.filter(
      size(hitsCol(col(textCol), patterns)) <= maxHits)

  /** Per-source retention audit of [[clean]]: how many documents each
    * source loses to the blocklist, with the retained fraction — the
    * data-card row a curation run publishes next to the gate itself.
    */
  def retentionBySource(docs: DataFrame, sourceCol: String,
      textCol: String, patterns: Seq[String], maxHits: Int = 0)
      : DataFrame =
    docs
      .withColumn("__flagged",
        size(hitsCol(col(textCol), patterns)) > maxHits)
      .groupBy(sourceCol)
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("__flagged"), 1L).otherwise(0L)).as("n_flagged"),
        round(avg(when(col("__flagged"), 0.0).otherwise(1.0)), 4)
          .as("retained_frac"))
}
