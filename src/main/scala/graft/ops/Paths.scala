package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequential path mining over event streams: the most common k-step
  * event-type paths users actually walk — the "what do sessions look
  * like" counterpart of q138's one-step transition matrix (a Markov
  * matrix can't distinguish view→click→purchase from
  * click→view→purchase; explicit n-gram paths can).
  *
  * Paths are materialized with `lead` windows over the per-entity
  * (time, id)-sorted stream — one shuffle on the entity key, each
  * row carries its next k−1 types, no self-join, no collect_list
  * blow-up — then counted with an ordinary map-side-combined
  * aggregate. Rank ties break on the path itself, so top-k is
  * deterministic.
  */
object Paths {

  /** Top-k 3-step paths. @return (step1, step2, step3, n, rank). */
  def topTrigramPaths(
      df: DataFrame, entityCol: String, timeCol: String,
      tieCol: String, typeCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val w = Window.partitionBy(entityCol)
      .orderBy(col(timeCol), col(tieCol))
    val tri = df
      .withColumn("_s2", lead(col(typeCol), 1).over(w))
      .withColumn("_s3", lead(col(typeCol), 2).over(w))
      .where(col("_s2").isNotNull && col("_s3").isNotNull)
      .groupBy(col(typeCol).as("step1"), col("_s2").as("step2"),
        col("_s3").as("step3"))
      .agg(count(lit(1)).as("n"))
    // Explicit top-k (TakeOrderedAndProject), then rank the ≤ k
    // survivors — the trigram frame is |types|³-bounded, but saying
    // top-k as a limit costs nothing and depends on no optimizer rule.
    val rk = Window.orderBy(col("n").desc, col("step1"), col("step2"),
      col("step3"))
    tri.orderBy(col("n").desc, col("step1"), col("step2"), col("step3"))
      .limit(k)
      .withColumn("rank", row_number().over(rk).cast("int"))
  }
}
