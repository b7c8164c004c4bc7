package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A/B experiment readout with CUPED variance reduction (Deng et al.
  * WSDM'13): Welch-style t on the raw per-user metric, then the same
  * contrast on y − θ·(x − x̄) where x is a pre-experiment covariate
  * and θ = cov(x,y)/var(x) pooled over all users. CUPED removes the
  * variance the covariate explains (θ is the OLS slope), tightening
  * the same experiment without touching assignment.
  *
  * Determinism contract: per-user metrics arrive as exact integer
  * cents, every per-arm moment (Σy, Σy², Σx, Σxy, Σx², n) is an
  * exact 64-bit integer sum — the ONLY order-sensitive step is made
  * order-free — and all ratio math runs in double on those exact
  * sums with a fixed expression shape, so an external engine
  * reproduces t, θ, and the adjusted means bit-for-bit. The data
  * shuffles once (user grain) then once more to the 2-row arm frame;
  * every window below runs on those 2 rows.
  */
object Experiment {

  /** @param perUser columns `arm` (0/1), `x`, `y` — integer cents
    * @return one row per arm: n, mean_y, var_y, mean_adj, var_adj
    *         (dollar units), plus experiment-level theta, t_raw,
    *         t_cuped repeated on both rows
    */
  def cupedReport(perUser: DataFrame): DataFrame = {
    val arms = perUser.groupBy("arm").agg(
      count(lit(1)).as("n"),
      sum("y").as("sy"), sum(col("y") * col("y")).as("syy"),
      sum("x").as("sx"), sum(col("x") * col("x")).as("sxx"),
      sum(col("x") * col("y")).as("sxy"))
    val all = Window.partitionBy()
    def d(c: String) = col(c).cast("double")
    val nD = d("n")
    val meanY = d("sy") / (nD * lit(100.0))
    val meanX = d("sx") / (nD * lit(100.0))
    val varY = (d("syy") - d("sy") * d("sy") / nD) /
      ((nD - lit(1.0)) * lit(10000.0))
    val varX = (d("sxx") - d("sx") * d("sx") / nD) /
      ((nD - lit(1.0)) * lit(10000.0))
    val covXY = (d("sxy") - d("sx") * d("sy") / nD) /
      ((nD - lit(1.0)) * lit(10000.0))
    val withPool = arms
      .withColumn("_tn", sum("n").over(all).cast("double"))
      .withColumn("_tsx", sum("sx").over(all).cast("double"))
      .withColumn("_tsy", sum("sy").over(all).cast("double"))
      .withColumn("_tsxx", sum("sxx").over(all).cast("double"))
      .withColumn("_tsxy", sum("sxy").over(all).cast("double"))
    val theta = (col("_tsxy") - col("_tsx") * col("_tsy") / col("_tn")) /
      (col("_tsxx") - col("_tsx") * col("_tsx") / col("_tn"))
    val poolMeanX = col("_tsx") / (col("_tn") * lit(100.0))
    val staged = withPool
      .withColumn("_theta", theta)
      .withColumn("_mean_y", meanY)
      .withColumn("_var_y", varY)
      .withColumn("_mean_adj",
        meanY - col("_theta") * (meanX - poolMeanX))
      .withColumn("_var_adj",
        varY - lit(2.0) * col("_theta") * covXY +
          col("_theta") * col("_theta") * varX)
    val signed = when(col("arm") === 1, lit(1.0)).otherwise(lit(-1.0))
    // Zero standard error (degenerate zero-variance arms) → null t,
    // not an ANSI divide-by-zero.
    def tStat(meanCol: String, varCol: String): Column = {
      val se = sqrt(sum(col(varCol) / nD).over(all))
      when(se > 0.0, sum(signed * col(meanCol)).over(all) / se)
    }
    staged
      .withColumn("_t_raw", tStat("_mean_y", "_var_y"))
      .withColumn("_t_cuped", tStat("_mean_adj", "_var_adj"))
      .select(col("arm"), col("n"),
        round(col("_mean_y"), 4).as("mean_y"),
        round(col("_var_y"), 4).as("var_y"),
        round(col("_mean_adj"), 4).as("mean_adj"),
        round(col("_var_adj"), 4).as("var_adj"),
        round(col("_theta"), 6).as("theta"),
        round(col("_t_raw"), 4).as("t_raw"),
        round(col("_t_cuped"), 4).as("t_cuped"))
  }
}
