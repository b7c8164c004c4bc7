package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Categorical aggregates the built-in surface lacks: exact mode
  * (most frequent value) with a deterministic tie policy, and
  * Cramér's V association strength between categorical column pairs
  * — the categorical counterpart of q193's Pearson matrix (χ² says
  * "dependent or not", V = √(χ²/(n·min(r−1,c−1))) says HOW MUCH on
  * a comparable [0,1] scale).
  */
object Categorical {

  /** Per-group exact mode: the most frequent value, ties broken by
    * the smallest value (string order) — never first-seen, which is
    * partitioning-dependent. One count aggregate + one argmax window
    * on the (group, value) count frame.
    *
    * @return per group: `mode`, `mode_n`, `n_distinct`
    */
  def mode(
      df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val counts = df.where(col(valueCol).isNotNull)
      .groupBy(col(groupCol).as("g"),
        col(valueCol).cast("string").as("v"))
      .agg(count(lit(1)).as("n"))
    val rk = Window.partitionBy("g").orderBy(col("n").desc, col("v"))
    counts
      .withColumn("_rk", row_number().over(rk))
      .withColumn("_nd", count(lit(1)).over(Window.partitionBy("g")))
      .where(col("_rk") === 1)
      .select(col("g"), col("v").as("mode"), col("n").as("mode_n"),
        col("_nd").as("n_distinct"))
  }

  /** Cramér's V for each given pair of categorical columns, from the
    * same dense-margin χ² as [[RobustStats.chiSquareIndependence]] —
    * one contingency aggregate per pair, the V row computed on the
    * tiny margin frames.
    *
    * @return one row per pair: `col_a`, `col_b`, `n`, `chi2`
    *         (round 4), `v` (round 4)
    */
  def cramersV(
      df: DataFrame, pairs: Seq[(String, String)]): DataFrame =
    pairs.map { case (a, b) =>
      val obs = df.where(col(a).isNotNull && col(b).isNotNull)
        .groupBy(col(a).cast("string").as("x"),
          col(b).cast("string").as("y"))
        .agg(count(lit(1)).as("n_obs"))
      val aM = obs.groupBy("x").agg(sum("n_obs").as("n_x"))
      val bM = obs.groupBy("y").agg(sum("n_obs").as("n_y"))
      val wAll = Window.partitionBy()
      val grid = aM.crossJoin(bM)
        .join(obs, Seq("x", "y"), "left")
        .withColumn("n_obs", coalesce(col("n_obs"), lit(0L)))
        .withColumn("_n", sum("n_obs").over(wAll))
        .withColumn("_r", size(collect_set("x").over(wAll)))
        .withColumn("_c", size(collect_set("y").over(wAll)))
      val e = col("n_x").cast("double") * col("n_y").cast("double") /
        col("_n").cast("double")
      grid
        .withColumn("_term",
          (col("n_obs").cast("double") - e) *
            (col("n_obs").cast("double") - e) / e)
        .groupBy(col("_n").as("n"), col("_r"), col("_c"))
        .agg(sum("_term").as("_chi2"))
        .select(lit(a).as("col_a"), lit(b).as("col_b"), col("n"),
          (round(col("_chi2"), 4) + lit(0.0)).as("chi2"),
          round(sqrt(col("_chi2") /
            (col("n").cast("double") *
              least(col("_r") - 1, col("_c") - 1).cast("double"))), 4)
            .as("v"))
    }.reduce(_ unionByName _)
}
