package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robust per-group outlier detection: median / MAD (median absolute
  * deviation), the estimator that survives what the mean/stddev
  * z-score (q82) cannot — a single wild value moves the mean and
  * inflates sigma until the outlier hides itself. Median and MAD have
  * a 50% breakdown point, so a corpus where 10% of documents are
  * garbage still gets a truthful center and scale.
  *
  * Two exact passes (median, then median of |x − median|), each a
  * per-group interpolated percentile — the same `percentile(…, 0.5)`
  * kernel q143 pinned against DuckDB's `percentile_cont`. The
  * group-median join is a broadcast (group cardinality ≪ rows), so
  * the data shuffles once per pass on the group key and never more.
  * The conventional 1.4826 factor rescales MAD to a sigma-equivalent
  * under normality; `k` is the flag threshold in those units.
  */
object Outliers {

  /** Per-group robust summary: n, median, MAD, and how many rows sit
    * beyond k·1.4826·MAD of the median. Null values are ignored (they
    * are neither inliers nor outliers).
    */
  def madSummary(
      df: DataFrame, groupCol: String, valueCol: String,
      k: Double): DataFrame = {
    val v = col(valueCol).cast("double")
    val med = df.where(v.isNotNull)
      .groupBy(groupCol)
      .agg(expr(s"percentile(CAST($valueCol AS DOUBLE), 0.5)").as("med"))
    val withMed = df.where(v.isNotNull).join(broadcast(med), Seq(groupCol))
    val mad = withMed
      .groupBy(groupCol)
      .agg(expr(s"percentile(abs(CAST($valueCol AS DOUBLE) - med), 0.5)")
        .as("mad"))
    withMed.join(broadcast(mad), Seq(groupCol))
      .groupBy(col(groupCol), col("med"), col("mad"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(abs(v - col("med")) > lit(k) * lit(1.4826) * col("mad"), 1L)
          .otherwise(0L)).as("n_outliers"))
      .select(col(groupCol), col("n"),
        round(col("med"), 4).as("med"), round(col("mad"), 4).as("mad"),
        col("n_outliers"))
  }
}
