package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance (materialized-view upkeep): keep
  * a per-group (count, sum) state table current by folding in a delta
  * batch of signed changes — +1 rows for inserts, −1 for retractions —
  * instead of re-aggregating the base table. The algebra is the
  * standard IVM one for distributive aggregates: count and sum are
  * abelian-group-valued, so state ⊕ Δ = recompute(base ⊎ Δ) exactly,
  * and groups whose count reaches zero leave the view.
  *
  * At 100 TB this is THE difference between "re-scan the world every
  * batch" and "aggregate the batch, join state": the delta aggregate
  * is batch-sized, the combine is one co-partitioned full outer join
  * on the (already small) group keyspace. AVG and friends derive from
  * (count, sum) downstream; non-distributive aggregates (min/max under
  * retraction, distinct) need their own auxiliary state and are out of
  * scope by contract.
  */
object IncrementalAgg {

  /** Aggregate a base table into view state: one row per group with
    * `n` (row count) and `total` (sum of `valueCol`, null-skipping).
    */
  def state(df: DataFrame, groupCol: String, valueCol: String): DataFrame =
    df.groupBy(groupCol).agg(
      count(lit(1)).as("n"),
      sum(col(valueCol).cast("double")).as("total"))

  /** Fold a signed delta batch into existing state. `signCol` is +1
    * (insert) / −1 (retract); retractions must match rows previously
    * counted (the CDC log's concern). Groups whose maintained count
    * hits zero are dropped — their residual float `total` is retired
    * with them, so a group that later returns starts from exact zeros
    * rather than accumulated rounding dust.
    */
  def applyDelta(
      state: DataFrame, delta: DataFrame, groupCol: String,
      valueCol: String, signCol: String): DataFrame = {
    val d = delta.groupBy(groupCol).agg(
      sum(col(signCol).cast("long")).as("_dn"),
      sum(col(signCol).cast("double") * col(valueCol).cast("double"))
        .as("_dtotal"))
    state.join(d, Seq(groupCol), "full_outer")
      .select(col(groupCol),
        (coalesce(col("n"), lit(0L)) + coalesce(col("_dn"), lit(0L))).as("n"),
        (coalesce(col("total"), lit(0.0)) +
          coalesce(col("_dtotal"), lit(0.0))).as("total"))
      .where(col("n") > 0)
  }
}
