package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Weight-aware order statistics: the weighted median (and general
  * weighted quantile) per group — "the quantity level at which half
  * the REVENUE sits", where the unweighted median (q143) answers the
  * row-count question. The lower weighted p-quantile: the smallest
  * value x with Σ w(rows ≤ x) ≥ p·W.
  *
  * Exactness: weights are integer units (cents), the crossing test
  * is the cross-multiplied integer compare `cum·den ≥ num·W` (p =
  * num/den), and VALUES are aggregated before ranking — the
  * cumulative sum runs over the per-(group, value) frame in value
  * order, so tie handling is structural, not row-order-dependent.
  * One shuffle on the group key.
  */
object WeightedStats {

  /** @param pNum/pDen the quantile p as a rational (1/2 = median)
    * @return per group: `total_weight`, `wquantile` (the value
    *         column's type, cast to long — callers pass integral-
    *         valued columns)
    */
  def weightedQuantile(
      df: DataFrame, groupCol: String, valueCol: String,
      weightCol: String, pNum: Long, pDen: Long): DataFrame = {
    val in = df
      .where(col(valueCol).isNotNull && col(weightCol).isNotNull)
      .select(col(groupCol).as("g"), col(valueCol).cast("long").as("v"),
        col(weightCol).as("w"))
    val perValue = in.groupBy("g", "v").agg(sum("w").as("vw"))
    val wCum = Window.partitionBy("g").orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("g")
    perValue
      .withColumn("_cum", sum("vw").over(wCum))
      .withColumn("_tot", sum("vw").over(wAll))
      .where(col("_cum") * lit(pDen) >= lit(pNum) * col("_tot"))
      .groupBy(col("g"))
      .agg(max("_tot").as("total_weight"), min("v").as("wquantile"))
  }
}
