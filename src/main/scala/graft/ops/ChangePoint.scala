package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CUSUM-style change-point detection over a per-group daily series:
  * the slot where the cumulative count deviates most from the
  * constant-rate line — "when did this source's volume regime
  * change". The statistic max_i |S_i·m − i·S_m| (cumulative count
  * S_i after slot i of m, cross-multiplied) is pure integer
  * arithmetic; only the normalized magnitude is a final division.
  *
  * One count aggregate to the (group, slot) frame, two windows on
  * it — the data shuffles once, everything after runs at slot grain.
  * Argmax is deterministic: ties break on the earliest slot.
  */
object ChangePoint {

  /** @return per group: `m` (slots), `total`, `peak_slot` (the i
    *         maximizing the deviation, earliest on ties),
    *         `peak_stat` = |S_i·m − i·S_m| (exact integer), and
    *         `peak_norm` = peak_stat/(m·total) in [0, 1) (round 6)
    */
  def cusumPeak(
      df: DataFrame, groupCol: String, slotCol: String): DataFrame = {
    val daily = df
      .select(col(groupCol).as("g"), col(slotCol).cast("long").as("slot"))
      .groupBy("g", "slot").agg(count(lit(1)).as("n"))
    val wCum = Window.partitionBy("g").orderBy(col("slot"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("g")
    val scored = daily
      .withColumn("_i", row_number().over(
        Window.partitionBy("g").orderBy(col("slot"))).cast("long"))
      .withColumn("_cum", sum("n").over(wCum))
      .withColumn("_m", count(lit(1)).over(wAll))
      .withColumn("_tot", sum("n").over(wAll))
      .withColumn("_dev",
        abs(col("_cum") * col("_m") - col("_i") * col("_tot")))
    scored
      .withColumn("_best", max(struct(col("_dev"),
        (lit(Long.MaxValue) - col("slot")).as("_negslot"))).over(wAll))
      .where(struct(col("_dev"),
        (lit(Long.MaxValue) - col("slot")).as("_negslot")) === col("_best"))
      .select(col("g"), col("_m").as("m"), col("_tot").as("total"),
        col("slot").as("peak_slot"), col("_dev").as("peak_stat"),
        round(col("_dev").cast("double") /
          (col("_m") * col("_tot")).cast("double"), 6).as("peak_norm"))
  }
}
