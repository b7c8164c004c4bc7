package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Empirical-Bayes rate shrinkage (Beta-binomial with a data-driven
  * prior): per-entity success rates pulled toward the global rate by
  * `m` pseudo-trials — shrunk = (succ + m·p₀)/(trials + m). THE fix
  * for small-sample leaderboards: an entity with 1/1 must not outrank
  * one with 90/100, and raw rates say it does.
  *
  * p₀ is the global pooled rate (one 1-row broadcast); everything
  * else is a per-entity aggregate and one fixed-shape double
  * expression over exact integer counts. Top-N selection is
  * orderBy+limit (TakeOrderedAndProject — per-partition heaps, no
  * global window).
  */
object Shrinkage {

  /** @param df rows with `entityCol`, integer 0/1 `trialCol` and
    *           `succCol` (a success row must also be a trial row)
    * @param m  prior strength in pseudo-trials
    * @return top `topN` entities by shrunk rate: `entity`,
    *         `n_trials`, `n_succ`, `raw_rate` (round 4),
    *         `shrunk_rate` (round 4)
    */
  def empiricalBayesRate(
      df: DataFrame, entityCol: String, trialCol: String,
      succCol: String, m: Int, topN: Int): DataFrame = {
    val per = df.groupBy(col(entityCol).as("entity"))
      .agg(sum(col(trialCol).cast("long")).as("n_trials"),
        sum(col(succCol).cast("long")).as("n_succ"))
      .where(col("n_trials") > 0)
    val global = per.agg(
      (sum("n_succ").cast("double") / sum("n_trials").cast("double"))
        .as("_p0"))
    def d(c: String) = col(c).cast("double")
    per.crossJoin(broadcast(global))
      .withColumn("_shrunk",
        (d("n_succ") + lit(m.toDouble) * col("_p0")) /
          (d("n_trials") + lit(m.toDouble)))
      .orderBy(col("_shrunk").desc, col("entity").asc)
      .limit(topN)
      .select(col("entity"), col("n_trials"), col("n_succ"),
        round(d("n_succ") / d("n_trials"), 4).as("raw_rate"),
        round(col("_shrunk"), 4).as("shrunk_rate"))
  }
}
