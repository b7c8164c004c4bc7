package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One-level decision tree (a "stump") by exact information gain —
  * the INTERPRETABLE quality gate: where [[LogReg]] learns opaque
  * hashed-feature weights, a stump answers "which single signal and
  * which single threshold separate the classes best?", which is what
  * a curation reviewer actually reads. Also the unit step of boosting,
  * and a sanity probe on any proposed filter feature.
  *
  * Candidate thresholds are value-grid boundaries: each feature is
  * bucketed by an integer `step`, class counts aggregate per bucket
  * (map-side combinable — the ONLY pass over the data, all features
  * in one Expand-free union of per-feature projections), and the
  * split scan runs on the bucket frame, which is VALUE-bounded
  * (range/step rows), not data-proportional — so its prefix window
  * partitioned per feature is dim-sized by construction.
  *
  * Entropy is computed from exact integer counts; `ln` enters only in
  * the final gain expression and the reported gain rounds to 6 (the
  * q76/q116 ln-parity discipline).
  *
  * @param features (column, bucketStep) pairs; the threshold
  *                 candidates for a feature are its occupied bucket
  *                 boundaries (split = "value <= t")
  * @return one row per feature: `feature`, `threshold` (best for
  *         that feature; ties to the smallest), `n_le`, `pos_le`,
  *         `n_gt`, `pos_gt`, `gain` (round 6), `is_best` (1 on the
  *         overall winner, ties to feature name). A feature whose
  *         values all land in ONE bucket admits no split and is
  *         OMITTED (its only boundary would put every row on one
  *         side).
  */
object DecisionStump {

  def fit(
      df: DataFrame, labelCol: String,
      features: Seq[(String, Long)]): DataFrame = {
    require(features.nonEmpty, "features must be non-empty")
    // One (feature, bucket) count frame: per-feature projections
    // unioned — each row of df contributes |features| rows, but the
    // aggregate is combinable so only the tiny bucket frame shuffles.
    val perFeature = features.map { case (c, step) =>
      df.select(lit(c).as("feature"),
        (col(c).cast("long")).as("_v"),
        col(labelCol).cast("long").as("_y"))
        .where(col("_v").isNotNull)
        .withColumn("_b", expr(s"_v DIV ${step}L"))
        .withColumn("_t", (col("_b") + 1L) * lit(step) - 1L)
    }
    val buckets = perFeature.reduce(_ unionByName _)
      .groupBy("feature", "_t")
      .agg(count(lit(1)).as("_n"), sum("_y").as("_p"))
    // Split scan over the value-bounded bucket frame: running totals
    // per feature give (n_le, pos_le) at every candidate boundary.
    val w = Window.partitionBy("feature").orderBy("_t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = buckets.groupBy("feature")
      .agg(sum("_n").as("_nt"), sum("_p").as("_pt"))
    def h(p: org.apache.spark.sql.Column, n: org.apache.spark.sql.Column) = {
      // Entropy in nats of a (pos, n) split; 0 log 0 = 0.
      val q = p.cast("double") / n.cast("double")
      -(when(p === 0L || p === n, lit(0.0))
        .otherwise(q * log(q) + (lit(1.0) - q) * log(lit(1.0) - q)))
    }
    val scans = buckets
      .withColumn("n_le", sum("_n").over(w))
      .withColumn("pos_le", sum("_p").over(w))
      .join(tot, Seq("feature"))
      // The last boundary puts everything on one side — no split.
      .where(col("n_le") < col("_nt"))
      .withColumn("n_gt", col("_nt") - col("n_le"))
      .withColumn("pos_gt", col("_pt") - col("pos_le"))
      .withColumn("gain",
        h(col("_pt"), col("_nt")) -
          (col("n_le").cast("double") / col("_nt").cast("double")) *
            h(col("pos_le"), col("n_le")) -
          (col("n_gt").cast("double") / col("_nt").cast("double")) *
            h(col("pos_gt"), col("n_gt")))
    val bestPerFeature = scans
      .withColumn("_rk", row_number().over(
        Window.partitionBy("feature")
          .orderBy(round(col("gain"), 6).desc, col("_t").asc)))
      .where(col("_rk") === 1)
    val overall = bestPerFeature
      .withColumn("_ork", row_number().over(
        Window.orderBy(round(col("gain"), 6).desc, col("feature").asc)))
    overall.select(col("feature"), col("_t").as("threshold"),
      col("n_le"), col("pos_le"), col("n_gt"), col("pos_gt"),
      round(col("gain"), 6).as("gain"),
      when(col("_ork") === 1, 1).otherwise(0).as("is_best"))
  }
}
