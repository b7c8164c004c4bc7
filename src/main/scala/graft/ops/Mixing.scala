package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-mixture planner: temperature-α source weights (the
  * multilingual/multi-source sampling rule of mBERT/XLM-R and the
  * Pile — sample source i with p_i ∝ c_i^α, α ∈ [0, 1] flattening
  * the head so small sources are not drowned), with an epoch-cap
  * audit: any source whose plan implies more than `maxEpochs` passes
  * over its data is flagged and clipped, and the clipped token mass
  * is reported so the shortfall is visible instead of silently
  * re-absorbed.
  *
  * Scale shape: the input is already source-grain (one combinable
  * count aggregate upstream); everything here is arithmetic over the
  * leaderboard-sized source frame plus one 1-row normalization
  * broadcast. Exact-integer discipline where it matters: token counts
  * and clipped budgets stay int64 (floor semantics documented);
  * doubles appear in the α-power weights only.
  */
object Mixing {

  /** @param df           source-grain frame: (sourceCol, tokensCol)
    * @param alpha        sampling temperature (1 = proportional,
    *                     0 = uniform)
    * @param targetTokens total training-token budget to apportion
    * @param maxEpochs    max passes over any single source's data
    * @return one row per source: `source`, `tokens`, `weight` (round
    *         6, sums to 1), `planned_tokens` (floor of T·p_i),
    *         `epochs` (round 4), `capped` (epochs > maxEpochs),
    *         `granted_tokens` (planned, clipped at maxEpochs·tokens),
    *         `shortfall_tokens` (planned − granted)
    */
  def temperaturePlan(
      df: DataFrame, sourceCol: String, tokensCol: String,
      alpha: Double, targetTokens: Long, maxEpochs: Double): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha in [0,1]: $alpha")
    require(targetTokens > 0, s"targetTokens must be positive")
    require(maxEpochs > 0, s"maxEpochs must be positive")
    val base = df.select(col(sourceCol).as("source"),
        col(tokensCol).cast("long").as("tokens"))
      .where(col("tokens") > 0L)
    val weighted = base.withColumn("_wgt",
      pow(col("tokens").cast("double"), lit(alpha)))
    val z = weighted.agg(sum("_wgt").as("_z"))
    weighted.crossJoin(broadcast(z))
      .withColumn("weight_raw", col("_wgt") / col("_z"))
      .withColumn("planned_tokens",
        floor(lit(targetTokens.toDouble) * col("weight_raw")).cast("long"))
      .withColumn("epochs_raw",
        col("planned_tokens").cast("double") / col("tokens").cast("double"))
      .withColumn("capped", col("epochs_raw") > maxEpochs)
      .withColumn("granted_tokens",
        when(col("capped"),
          floor(lit(maxEpochs) * col("tokens").cast("double")).cast("long"))
          .otherwise(col("planned_tokens")))
      .select(col("source"), col("tokens"),
        round(col("weight_raw"), 6).as("weight"),
        col("planned_tokens"),
        round(col("epochs_raw"), 4).as("epochs"),
        col("capped"), col("granted_tokens"),
        (col("planned_tokens") - col("granted_tokens"))
          .as("shortfall_tokens"))
  }
}
