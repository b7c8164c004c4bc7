package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unicode-confusable ("homoglyph") skeleton dedup — the exact-dedup
  * evasion every spam/SEO farm uses: swap Latin letters for visually
  * identical Cyrillic/Greek/fullwidth codepoints (or thread
  * zero-width characters through the text) and the md5/canonical
  * dedup tier (q25/q94) sees a brand-new document. The fix is the
  * Unicode TR39-style SKELETON: map each confusable to its Latin
  * exemplar, strip invisible characters, THEN hash.
  *
  * The mapping is a deliberately small, high-precision subset of
  * TR39's confusables table (the cross-script pairs that are
  * pixel-identical in common fonts), expressed as one `translate`
  * call — a single codegen'd pass, byte-for-byte reproducible in any
  * engine with positional translate semantics (extra source chars
  * with no target are DELETED, which is how the zero-width strip
  * rides the same call in both Spark and DuckDB).
  *
  * Scale shape: skeletonization is a narrow projection; grouping is
  * one hash-key shuffle — identical cost to exact dedup.
  */
object Homoglyph {

  /** Confusable sources: Cyrillic а е о р с х у і ѕ ј + capitals
    * А Е О Р С Х У І Ѕ Ј, Greek ο α ν + capitals Ο Α Ν, then the
    * INVISIBLES (zero-width space/non-joiner/joiner, BOM, soft
    * hyphen) which have no target and are deleted.
    */
  val fromChars: String =
    "аеорсхуіѕј" +
      "АЕОРСХУІЅЈ" +
      "οανΟΑΝ" +
      "\u200B\u200C\u200D\uFEFF\u00AD"

  /** Latin exemplars, positionally aligned with [[fromChars]] (5
    * shorter — the invisibles map to nothing).
    */
  val toChars: String = "aeopcxyisj" + "AEOPCXYISJ" + "oavOAN"

  /** The skeleton: lowercase of the confusable-translated text.
    * Translate BEFORE lowercase so the capital confusables (which
    * lowercase to their own script, e.g. Cyrillic А→а) are already
    * Latin when `lower` runs.
    */
  def skeleton(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    lower(translate(c, fromChars, toChars))

  /** Groups of documents identical UNDER THE SKELETON but not
    * necessarily byte-identical — the spoof-dup report. One row per
    * skeleton with >= 2 members.
    *
    * @return `skeleton_hash` (md5), `n` (group size), `min_id`,
    *         `max_id`
    */
  def dupGroups(
      df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), md5(skeleton(col(textCol))).as("skeleton_hash"))
      .groupBy("skeleton_hash")
      .agg(count(lit(1)).as("n"),
        min(col(idCol)).as("min_id"), max(col(idCol)).as("max_id"))
      .where(col("n") >= 2)
}
