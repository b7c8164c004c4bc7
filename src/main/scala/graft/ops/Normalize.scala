package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Group-wise feature normalization — the standardization step between
  * raw per-document signals (length, quality, perplexity) and any
  * threshold rule or model that consumes them: "2σ longer than typical
  * FOR ITS LANGUAGE" is meaningful where a global z-score is not,
  * because the signal distributions differ wildly per language/source.
  *
  * Scale shape: the WRONG way is `avg(...).over(Window.partitionBy
  * (group))` — that materializes a window per group holding every row
  * (one giant partition per group, the r2 scale-killer pattern). This
  * is the two-phase form instead: aggregate the stats down to one tiny
  * row per group (map-side combinable), broadcast-join them back, and
  * the scoring pass stays narrow — the corpus never shuffles.
  */
object Normalize {

  /** Append `z` = (value − group mean) / group sample-stddev, rounded
    * to 4; null when the group has <2 rows or zero variance (a z-score
    * against a degenerate distribution is noise, not signal).
    */
  def zscore(
      df: DataFrame, valueCol: String, groupCols: Seq[String],
      outCol: String = "z"): DataFrame = {
    require(groupCols.nonEmpty, "zscore needs at least one group column")
    require(!df.columns.contains(outCol),
      s"zscore emits '$outCol': rename the existing column or pass outCol")
    val stats = df.groupBy(groupCols.map(col): _*)
      .agg(avg(col(valueCol)).as("_mu"), stddev_samp(col(valueCol)).as("_sd"))
    df.join(broadcast(stats), groupCols)
      .withColumn(outCol,
        round(when(col("_sd") > 0,
          (col(valueCol) - col("_mu")) / col("_sd")), 4))
      .drop("_mu", "_sd")
  }
}
