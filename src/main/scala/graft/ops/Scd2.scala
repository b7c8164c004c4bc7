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
}
