package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Segment-level (line/paragraph) exact deduplication — the CCNet-style
  * pass (Wenzek et al. 2020, "CCNet: Extracting High Quality Monolingual
  * Datasets from Web Crawl Data") that every web-scale corpus gets
  * before document-level dedup: boilerplate (nav bars, cookie banners,
  * license headers) repeats VERBATIM across millions of pages, so the
  * unit of deduplication is the line, not the document. The first
  * occurrence of each distinct segment (smallest (doc, position))
  * survives; every later identical segment is dropped, and documents
  * are reassembled from their surviving segments in order.
  *
  * Scale shape: one explode, one groupBy on the segment text (map-side
  * combinable `min(struct(doc, pos))`), one join back, one groupBy to
  * reassemble — all keyed on high-cardinality uniform keys, nothing
  * driver-side, no window over an unpartitioned frame. The shuffle
  * carries segment TEXT as the key; a production run at 100 TB would
  * key on `portableHash(segment)` instead to shrink shuffle bytes
  * (collision odds at 60 bits are ~n²/2^61 — acceptable for dedup) —
  * the oracle-checked form keys on the exact string so the comparison
  * is collision-free by construction; swapping the key is one line.
  */
object LineDedup {

  /** Split `text` into segments on a delimiter regex (real corpora:
    * `"\n"` for lines, `"\n\n+"` for paragraphs). Empty segments are
    * dropped (blank lines are not content, and keeping them would make
    * every blank line a "duplicate" of every other).
    */
  def segments(text: Column, sepRegex: String = "\n"): Column =
    filter(split(text, sepRegex), s => s =!= "")

  /** Fixed-size token windows as synthetic segments: groups of `n`
    * whitespace tokens re-joined by a single space. The driver's
    * synthetic documents have no newlines, so the catalog exercises
    * the dedup on these windows; real corpora use [[segments]].
    */
  def tokenSegments(text: Column, n: Int): Column = {
    require(n > 0, s"segment size must be positive: $n")
    val tk = graft.ops.TextAnalysis.tokens(text)
    // sequence(0, -1) DESCENDS rather than returning empty — guard.
    // SQL `/` is double division, so the window count is ceil over
    // doubles, cast back (exact for any realistic token count).
    when(size(tk) === 0, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(0), ceil(size(tk) / lit(n.toDouble)).cast("int") - 1),
        i => array_join(slice(tk, i * n + 1, lit(n)), " ")))
  }

  /** Corpus-wide first-occurrence segment dedup.
    *
    * @param df      one row per document with an ARRAY of segments
    *                (from [[segments]] / [[tokenSegments]], or any
    *                upstream splitter)
    * @param idCol   document id (orderable; ties in the keep rule
    *                resolve to the smallest id, then smallest position)
    * @param segsCol the array<string> segment column
    * @return one row per input document:
    *         `idCol`, `n_segs` (segments before dedup), `n_kept`,
    *         `dedup_text` (surviving segments joined by `joinSep`,
    *         `""` when everything was dropped)
    */
  def dedupSegments(
      df: DataFrame, idCol: String, segsCol: String,
      joinSep: String = " "): DataFrame = {
    // Par.spread: the segment split+explode rides a single-row-group
    // scan otherwise (r19, guide §2.5); no-op at production scale.
    val src = Par.spread(df, col(idCol))
    val exploded = src
      .select(col(idCol), posexplode(col(segsCol)).as(Seq("pos", "seg")))
    // Canonical occurrence of each distinct segment = lexicographic min
    // of (doc, position) — map-side combinable, no window.
    val keeper = exploded
      .groupBy("seg")
      .agg(min(struct(col(idCol), col("pos"))).as("keep"))
    val kept = exploded
      .join(keeper, "seg")
      .where(struct(col(idCol), col("pos")) === col("keep"))
    // Reassemble in original segment order; docs that lost every
    // segment (or had none) come back via the left join with "".
    val rebuilt = kept
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("seg")))),
            s => s("seg")), joinSep).as("dedup_text"))
    src.select(col(idCol), size(col(segsCol)).cast("long").as("n_segs"))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol), col("n_segs"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("dedup_text"), lit("")).as("dedup_text"))
  }

  /** Boilerplate detection: segments that recur across a large share
    * of ONE stratum's documents (site nav, license headers, template
    * intros — the CCNet motivation for per-shard line frequencies).
    * Flags each (stratum, segment) whose document coverage within the
    * stratum is ≥ `minFrac`; [[dedupSegments]] then removes
    * repetition, but boilerplate is worth REPORTING separately because
    * a segment in 40% of a source's docs indicates template extraction
    * failure upstream, not organic duplication.
    *
    * Scale shape: distinct (stratum, segment, doc) → two map-side
    * combinable counts + a broadcast join of the per-stratum doc
    * totals. Output is vocabulary-of-segments-sized, never corpus-sized.
    *
    * @return (`strataCol`, `seg`, `n_docs_with`, `frac`) for flagged
    *         segments, frac rounded to 4
    */
  def boilerplateSegments(
      df: DataFrame, idCol: String, segsCol: String, strataCol: String,
      minFrac: Double): DataFrame = {
    require(minFrac > 0 && minFrac <= 1, s"minFrac in (0,1]: $minFrac")
    val docTotals = df.groupBy(strataCol)
      .agg(countDistinct(col(idCol)).cast("double").as("n_docs"))
    val segDocs = df
      .select(col(strataCol), col(idCol), explode(col(segsCol)).as("seg"))
      .distinct()
      .groupBy(strataCol, "seg").agg(count(lit(1)).as("n_docs_with"))
    segDocs.join(broadcast(docTotals), strataCol)
      .withColumn("frac",
        round(col("n_docs_with").cast("double") / col("n_docs"), 4))
      .filter(col("n_docs_with") / col("n_docs") >= minFrac)
      .select(col(strataCol), col("seg"), col("n_docs_with"), col("frac"))
  }
}
