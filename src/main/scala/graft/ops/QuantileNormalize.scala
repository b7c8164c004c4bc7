package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Quantile normalization across groups (the microarray/batch-effect
  * classic): replace each group's values by the POOLED distribution's
  * value at the same within-group rank, so every group ends up with
  * an identical marginal distribution while preserving its internal
  * ordering — "make source A's length distribution comparable to the
  * corpus" without trusting either's scale.
  *
  * All rank arithmetic is exact integers: within-group rank r of n
  * maps to pooled index 1 + (r−1)·(N−1) DIV (n−1) (endpoints meet
  * exactly), and the mapped value is joined by that index — no
  * interpolation floats anywhere, so the mapping hash-compares
  * bit-for-bit. Two sorts (group-local, pooled), one index equi-join.
  */
object QuantileNormalize {

  /** @return per group: `n`, `mean_orig` and `mean_mapped` (exact
    *         integer sums over micro-units ÷ n, round 4), and the
    *         mapped min/max — identical across groups by
    *         construction, which is the visible proof the marginals
    *         were unified
    */
  def summary(
      df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val x = col(valueCol).cast("long")
    val in = df.where(x.isNotNull)
      .select(col(groupCol).as("g"), x.as("v"))
    val wg = Window.partitionBy("g").orderBy(col("v"))
    val wgAll = Window.partitionBy("g")
    val pooled = in
      .withColumn("_pr", row_number().over(Window.orderBy(col("v"))))
      .select(col("_pr").cast("long").as("idx"), col("v").as("pv"))
    val nTotal = Window.partitionBy()
    val ranked = in
      .withColumn("_r", row_number().over(wg).cast("long"))
      .withColumn("_n", count(lit(1)).over(wgAll))
      .withColumn("_nt", count(lit(1)).over(nTotal))
      .withColumn("idx",
        when(col("_n") === 1L, lit(1L))
          .otherwise(lit(1L) +
            expr("((_r - 1) * (_nt - 1)) DIV (_n - 1)")))
    ranked.join(pooled, Seq("idx"))
      .groupBy("g")
      .agg(count(lit(1)).as("n"),
        sum("v").as("_sv"), sum("pv").as("_sm"),
        min("pv").as("mapped_min"), max("pv").as("mapped_max"))
      .select(col("g"), col("n"),
        round(col("_sv").cast("double") / col("n").cast("double"), 4)
          .as("mean_orig"),
        round(col("_sm").cast("double") / col("n").cast("double"), 4)
          .as("mean_mapped"),
        col("mapped_min"), col("mapped_max"))
  }
}
