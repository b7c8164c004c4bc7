package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Append `outCol` = the row's n-tile (1..n) of `orderCol` within its
    * group — quality deciles per language, length quartiles per source:
    * the standard way corpus curation turns a raw signal into a
    * comparable "top 10% for its stratum" bucket.
    *
    * Tiling is RANK-based (`ntile` splits the sorted group into n runs
    * of near-equal COUNT), so equal values straddling a boundary land
    * in different tiers; `tieBreak` pins which — pass a unique key so
    * assignment is deterministic under re-partitioning.
    *
    * Scale shape: one shuffle by group + a per-group sort. Groups here
    * are strata (languages/sources) — many rows each, but the sort
    * spills, and no single global partition exists (the r2
    * partition-less-window killer). For a percentile-of-VALUE bucket
    * instead (boundaries shared by equal values), aggregate per-group
    * cut points like q59's percentile agg and broadcast them back —
    * [[zscore]]'s two-phase shape.
    */
  def ntileBy(
      df: DataFrame, n: Int, orderCol: String, groupCols: Seq[String],
      tieBreak: Column, outCol: String = "tier"): DataFrame = {
    require(n > 0, s"ntile needs a positive tile count: $n")
    require(groupCols.nonEmpty, "ntileBy needs at least one group column")
    require(!df.columns.contains(outCol),
      s"ntileBy emits '$outCol': rename the existing column or pass outCol")
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(orderCol).asc, tieBreak.asc)
    df.withColumn(outCol, ntile(n).over(w))
  }

  /** VALUE-based tiers — the 100 TB-shaped alternative [[ntileBy]]'s
    * scaladoc promises: per-group exact percentile cut points (a tiny
    * aggregate, one row per group) broadcast back, and the tier is
    * `1 + #cuts below the value` — a pure per-row expression, so the
    * corpus never meets a window or a per-group sort. Equal values
    * always share a tier (boundaries belong to the LOWER tier:
    * `value > cut` promotes). Cuts are rounded to 4 decimals BEFORE
    * the comparison so the boundary arithmetic is engine-portable.
    */
  def tierByCuts(
      df: DataFrame, n: Int, valueCol: String, groupCols: Seq[String],
      outCol: String = "tier"): DataFrame = {
    require(n > 1, s"tierByCuts needs at least 2 tiers: $n")
    require(groupCols.nonEmpty, "tierByCuts needs at least one group column")
    require(!df.columns.contains(outCol),
      s"tierByCuts emits '$outCol': rename the existing column or pass outCol")
    val cutCols = (1 until n).map { i =>
      round(expr(s"percentile($valueCol, ${i.toDouble / n})"), 4).as(s"_ct$i")
    }
    val cuts = df.groupBy(groupCols.map(col): _*).agg(cutCols.head, cutCols.tail: _*)
    val tier = (1 until n)
      .map(i => when(col(valueCol) > col(s"_ct$i"), 1).otherwise(0))
      .reduce(_ + _) + lit(1)
    df.join(broadcast(cuts), groupCols)
      .withColumn(outCol, tier.cast("int"))
      .drop((1 until n).map(i => s"_ct$i"): _*)
  }
}
