package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Largest-remainder (Hamilton) apportionment: split an integer budget
  * across groups proportionally to integer weights, exactly — the
  * "sample N documents across sources in proportion to their token
  * counts" step of corpus mixing, where a float quota either over- or
  * under-spends the budget once rounded. Each group gets
  * ⌊budget·w/W⌋ seats; the seats left over (always < #groups) go one
  * each to the groups with the largest remainder `(budget·w) mod W`,
  * ties broken by group key, so Σ seats ≡ budget by construction.
  *
  * Every quantity is 64-bit integer arithmetic (`budget·w` must not
  * overflow — budget ≤ 2⁶³/W), so the result is bit-reproducible by
  * any engine. The window runs on the already-aggregated per-group
  * frame (≪ rows), not the data.
  */
object Allocate {

  /** @return one row per group: groupCol, `weight`, `floor_seats`,
    *         `rem` (the mod-W remainder that ranked it), `seats`.
    *         Groups with null or non-positive weight get 0 seats and
    *         rank last.
    */
  def largestRemainder(
      df: DataFrame, groupCol: String, weightCol: String,
      budget: Long): DataFrame = {
    val agg = df.groupBy(groupCol)
      .agg(sum(coalesce(col(weightCol).cast("long"), lit(0L))).as("weight"))
      .withColumn("weight", greatest(col("weight"), lit(0L)))
    val all = Window.partitionBy()
    val byRem = Window.partitionBy()
      .orderBy(col("rem").desc, col(groupCol).asc)
    agg
      .withColumn("_w_total", sum("weight").over(all))
      // DIV is Spark's integral division — `/` would promote to double
      // and break the exact-integer contract.
      .withColumn("floor_seats",
        expr(s"(${budget}L * weight) DIV _w_total"))
      .withColumn("rem", (lit(budget) * col("weight")) % col("_w_total"))
      .withColumn("_left", lit(budget) - sum("floor_seats").over(all))
      .withColumn("_rk", row_number().over(byRem))
      .withColumn("seats",
        col("floor_seats") + when(col("_rk") <= col("_left"), 1L)
          .otherwise(0L))
      .select(col(groupCol), col("weight"), col("floor_seats"),
        col("rem"), col("seats"))
  }
}
