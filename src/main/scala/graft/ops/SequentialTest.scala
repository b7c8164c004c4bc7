package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Wald's sequential probability ratio test (SPRT, Wald 1945) as a
  * streaming monitor over an ordered event log: decide H₁ (rate ≥ p₁)
  * vs H₀ (rate ≤ p₀) the moment the evidence suffices instead of
  * waiting for a fixed horizon — the test with the provably minimal
  * expected sample size at both hypotheses, and the batch-queryable
  * twin of a Structured-Streaming guardrail ("stop the rollout the
  * instant the error-rate LLR crosses the kill boundary").
  *
  * Everything is exact 64-bit integer micro-nats: the per-observation
  * log-likelihood-ratio increments ln(p₁/p₀) / ln((1−p₁)/(1−p₀)) and
  * the Wald boundaries ln((1−β)/α) / ln(β/(1−α)) are rounded to
  * integer micro-nats ONCE on the driver ([[llrMicroNats]] /
  * [[boundariesMicroNats]] — the oracle inlines the identical
  * constants), so the cumulative walk, the crossing row and the
  * decision replay bit-for-bit in any engine; no float ever crosses
  * the comparison.
  *
  * Scale shape: the global order comes from [[Rank.globalRowNumber]]
  * (range-partitioned sort) and the cumulative LLR from
  * [[Rank.prefixSum]] (bucket partials; the only unpartitioned window
  * runs on the tiny bucket frame). The crossing row is an
  * `orderBy().limit(1)` top-1, and the report is 1-row crosses — the
  * event log itself never collapses to one task.
  */
object SequentialTest {

  /** (success, failure) LLR increments in integer micro-nats. */
  def llrMicroNats(p0: Double, p1: Double): (Long, Long) = {
    require(p0 > 0 && p0 < 1 && p1 > 0 && p1 < 1 && p1 != p0,
      s"rates in (0,1), distinct: $p0 $p1")
    (math.round(math.log(p1 / p0) * 1e6),
      math.round(math.log((1 - p1) / (1 - p0)) * 1e6))
  }

  /** (lower, upper) Wald boundaries in integer micro-nats. */
  def boundariesMicroNats(alpha: Double, beta: Double): (Long, Long) = {
    require(alpha > 0 && alpha < 1 && beta > 0 && beta < 1,
      s"alpha/beta in (0,1): $alpha $beta")
    (math.round(math.log(beta / (1 - alpha)) * 1e6),
      math.round(math.log((1 - beta) / alpha) * 1e6))
  }

  /** @param df         event frame
    * @param orderCols   global observation order (must be a unique
    *                    total order, e.g. ts + event id)
    * @param successCol  0/1 observation outcome
    * @param p0, p1      the two hypothesized Bernoulli rates
    * @param alpha, beta target type-I / type-II error rates
    * @return 1 row: `n`, `n_success`, `success_rate_ppm`,
    *         `llr_final_micro`, `lower_micro`, `upper_micro`,
    *         `crossing_n` (first boundary hit, null if never),
    *         `llr_at_crossing_micro` (null if never), `decision`
    *         ('accept_h1' | 'accept_h0' | 'continue'),
    *         `savings_ppm` (observations the sequential stop saves
    *         vs the full horizon; 0 when no crossing)
    */
  def sprtMonitor(
      df: DataFrame, orderCols: Seq[String], successCol: Column,
      p0: Double, p1: Double, alpha: Double, beta: Double): DataFrame = {
    val (a, b) = llrMicroNats(p0, p1)
    val (lower, upper) = boundariesMicroNats(alpha, beta)
    val obs = df.select((orderCols.map(col) :+
        successCol.cast("long").as("_x")): _*)
      .withColumn("_llr",
        col("_x") * lit(a) + (lit(1L) - col("_x")) * lit(b))
    val ranked = Rank.globalRowNumber(
      obs, orderCols.map(_ -> true), "_rk")
    val walked = Rank.prefixSum(ranked, "_rk", "_llr", "_cum")
    val firstCross = walked
      .where(col("_cum") >= upper || col("_cum") <= lower)
      .orderBy("_rk").limit(1)
      .select(col("_rk").as("crossing_n"),
        col("_cum").as("llr_at_crossing_micro"))
    val totals = obs.agg(
      count(lit(1)).as("n"),
      coalesce(sum("_x"), lit(0L)).as("n_success"),
      coalesce(sum("_llr"), lit(0L)).as("llr_final_micro"))
    totals
      .join(broadcast(firstCross), lit(true), "left")
      .select(col("n"), col("n_success"),
        expr("CASE WHEN n > 0 THEN (n_success * 1000000) DIV n END")
          .as("success_rate_ppm"),
        col("llr_final_micro"),
        lit(lower).as("lower_micro"), lit(upper).as("upper_micro"),
        col("crossing_n"), col("llr_at_crossing_micro"),
        when(col("llr_at_crossing_micro") >= upper, lit("accept_h1"))
          .when(col("llr_at_crossing_micro") <= lower, lit("accept_h0"))
          .otherwise(lit("continue")).as("decision"),
        expr("CASE WHEN crossing_n IS NOT NULL AND n > 0 THEN" +
          " ((n - crossing_n) * 1000000) DIV n ELSE 0 END")
          .as("savings_ppm"))
  }
}
