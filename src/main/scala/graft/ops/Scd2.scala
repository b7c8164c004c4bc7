package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD Type-2 history construction — collapse a log of table versions
  * into validity intervals per key: one row per (key, run of identical
  * content) with `valid_from` / `valid_to` versions and an
  * `is_current` flag. [[SnapshotDiff]] answers "what changed between
  * two snapshots"; this builds the full change HISTORY a warehouse
  * dimension keeps.
  *
  * Scale shape: content reduces to [[SnapshotDiff]]'s portable
  * fingerprint in the scan projection, then everything is per-key
  * windows ordered by version (shuffle by key, never global): a lag
  * to flag run starts, a running sum to number runs, one aggregate to
  * collapse each run, and a lead over the per-run frame (already
  * collapsed, strictly smaller) to close intervals. Keys absent from
  * a version simply have no row — a gap ends a run only if content
  * differs when the key returns, which is fingerprint-equality
  * semantics, not calendar semantics.
  */
object Scd2 {

  /** @param versions log with `keyCol`, integer `versionCol`, and
    *                 `contentCols`; (key, version) must be unique
    * @return one row per validity interval: key, content columns (as
    *         of the interval), `valid_from`, `valid_to` (null while
    *         current), `is_current`
    */
  def history(
      versions: DataFrame, keyCol: String, versionCol: String,
      contentCols: Seq[String]): DataFrame = {
    require(contentCols.nonEmpty, "history needs content columns")
    val byVersion = Window.partitionBy(keyCol).orderBy(versionCol)
    val fp = SnapshotDiff.fingerprint(contentCols)
    val flagged = versions
      .withColumn("_fp", fp)
      .withColumn("_new_run",
        when(lag("_fp", 1).over(byVersion).isNull ||
          lag("_fp", 1).over(byVersion) =!= col("_fp"), 1).otherwise(0))
      .withColumn("_run", sum("_new_run").over(byVersion))
    val runs = flagged.groupBy(col(keyCol), col("_run"))
      .agg(
        min(versionCol).as("valid_from"),
        // content is constant within a run — min(struct) is just a
        // deterministic pick of it
        min(struct(contentCols.map(col): _*)).as("_content"))
    val byRun = Window.partitionBy(keyCol).orderBy("valid_from")
    runs
      .withColumn("valid_to", lead("valid_from", 1).over(byRun) - 1)
      .select(col(keyCol) +:
        contentCols.map(c => col(s"_content.$c").as(c)) :+
        col("valid_from") :+ col("valid_to") :+
        col("valid_to").isNull.as("is_current"): _*)
  }

  /** Incremental history maintenance — fold ONE new version batch
    * into existing history without replaying the log: the operational
    * path once history is materialized (the full-log [[history]] is
    * the backfill/bootstrap path). Contract: `applyVersion(history(
    * log), v) ≡ history(log ∪ v)` — CHANGED keys close their open
    * interval at `ver − 1` and open a new one, unchanged keys keep
    * their open interval, absent keys stay open (fingerprint
    * semantics, matching [[history]]'s gap rule), and brand-new keys
    * open their first interval.
    *
    * Cost: one join of the OPEN-interval slice against the batch on
    * the key (closed intervals pass through untouched), fingerprints
    * in the scan projections — batch-sized work, not history-sized.
    */
  def applyVersion(
      history: DataFrame, batch: DataFrame, keyCol: String, ver: Long,
      contentCols: Seq[String]): DataFrame = {
    require(contentCols.nonEmpty, "applyVersion needs content columns")
    val closed = history.where(!col("is_current"))
    val open = history.where(col("is_current"))
    val fp = SnapshotDiff.fingerprint(contentCols)
    val b = batch.select(col(keyCol) +:
        contentCols.map(c => col(c).as(s"_b_$c")): _*)
      .withColumn("_bfp", SnapshotDiff.fingerprint(
        contentCols.map(c => s"_b_$c")))
    val vfType = history.schema("valid_from").dataType
    val joined = open.withColumn("_ofp", fp)
      .join(b, Seq(keyCol), "full_outer")
    val changed = col("_bfp").isNotNull && col("_ofp").isNotNull &&
      col("_bfp") =!= col("_ofp")
    // Surviving open intervals: unchanged, or absent from the batch.
    val keptOpen = joined.where(col("_bfp").isNull || !changed)
      .where(col("_ofp").isNotNull)
      .select(col(keyCol) +: contentCols.map(col) :+
        col("valid_from") :+ col("valid_to") :+ col("is_current"): _*)
    // Changed keys: the old interval closes at ver − 1 …
    val nowClosed = joined.where(changed)
      .select(col(keyCol) +: contentCols.map(col) :+
        col("valid_from") :+ lit(ver - 1).cast(vfType).as("valid_to") :+
        lit(false).as("is_current"): _*)
    // … and the batch row opens a new one; brand-new keys open too.
    val opened = joined.where(changed || col("_ofp").isNull)
      .where(col("_bfp").isNotNull)
      .select(col(keyCol) +:
        contentCols.map(c => col(s"_b_$c").as(c)) :+
        lit(ver).cast(vfType).as("valid_from") :+
        lit(null).cast(vfType).as("valid_to") :+
        lit(true).as("is_current"): _*)
    closed.unionByName(keptOpen).unionByName(nowClosed)
      .unionByName(opened)
  }
}
