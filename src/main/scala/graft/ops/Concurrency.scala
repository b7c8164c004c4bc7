package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Peak-concurrency sweep line over an interval set: how many
  * sessions/jobs/connections were open at once, per day — the
  * capacity metric behind pool sizing and license counts. Each
  * interval emits a +1 at its start and a −1 at its end; the running
  * sum of deltas in time order IS the concurrency, and its per-day
  * max is the answer.
  *
  * The running sum is a GLOBAL prefix scan, computed with the same
  * two-pass bucketed discipline as `Lateness.watermarkProfile`
  * (per-bucket delta totals → prefix over the tiny bucket frame →
  * within-bucket running sum, partitioned) — no single-partition
  * global window anywhere.
  *
  * Tie rule (pinned in both engines): at equal timestamps ends sort
  * BEFORE starts, so a back-to-back handoff never counts as
  * concurrent. Peaks register at event boundaries; a day whose every
  * interval straddles it without starting or ending that day reports
  * no row (documented: event-boundary grain, not continuous time).
  */
object Concurrency {

  /** @param intervals one row per interval
    * @param startUsCol/endUsCol inclusive-start / exclusive-end µs
    * @param bucketUs prefix-scan bucket width
    * @return per epoch day with ≥1 boundary event: `day`,
    *         `n_starts`, `n_ends`, `peak_concurrent`
    */
  def dailyPeak(
      intervals: DataFrame, startUsCol: String, endUsCol: String,
      bucketUs: Long): DataFrame = {
    val deltas = intervals.select(
        col(startUsCol).cast("long").as("t"), lit(1L).as("d"))
      .unionAll(intervals.select(
        col(endUsCol).cast("long").as("t"), lit(-1L).as("d")))
      .where(col("t").isNotNull)
    val bucketed = deltas.withColumn("bkt", expr(s"t DIV ${bucketUs}L"))
    val pre = bucketed.groupBy("bkt").agg(sum("d").as("bsum"))
      .withColumn("prevsum", sum("bsum").over(
        Window.orderBy("bkt")
          .rowsBetween(Window.unboundedPreceding, -1L)))
    // Ends (−1) before starts (+1) at equal t: order by (t, d).
    val wIn = Window.partitionBy("bkt").orderBy(col("t").asc, col("d").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed
      .join(broadcast(pre.select("bkt", "prevsum")), Seq("bkt"))
      .withColumn("conc",
        sum("d").over(wIn) + coalesce(col("prevsum"), lit(0L)))
      .withColumn("day", expr("t DIV 86400000000"))
      .groupBy("day")
      .agg(sum(when(col("d") === 1L, 1L).otherwise(0L)).as("n_starts"),
        sum(when(col("d") === -1L, 1L).otherwise(0L)).as("n_ends"),
        max("conc").as("peak_concurrent"))
  }
}
