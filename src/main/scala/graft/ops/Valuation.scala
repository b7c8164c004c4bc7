package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data valuation: EXACT KNN-Shapley (Jia et al., VLDB 2019,
  * "Efficient task-specific data valuation for nearest neighbor
  * algorithms") — the closed-form Shapley value of every training
  * point for a K-NN classifier over a validation set, the honest
  * answer to "which corpus examples actually help" that importance
  * heuristics (DSIR weights, quality scores) only approximate.
  *
  * For one validation point with label y, training points ordered by
  * distance ascending (j = 1 … N):
  *
  *   s_N = 1[y_N = y] / N
  *   s_j = s_{j+1} + (1[y_j = y] − 1[y_{j+1} = y]) / K · min(K, j) / j
  *
  * i.e. a SUFFIX SUM over rank-ordered indicator deltas — O(N log N)
  * per validation point instead of the 2^N naive Shapley, with no
  * sampling error. A point's value is its mean s over the validation
  * set; values sum (per val point) to the K-NN utility, so "drop the
  * lowest-value decile" is a principled curation rule.
  *
  * Determinism: distance is the codegen'd double cosine
  * ([[Similarity.cosine]], bit-mirrored by the oracle's list
  * arithmetic), ties rank by training id; each recurrence term snaps
  * to integer nano-units before the suffix sum, so both engines walk
  * identical integers.
  *
  * Scale shape: scoring is corpus × |V| with the validation frame
  * BROADCAST (the q103 eval-tier discipline — V is a bounded sample
  * by construction); the rank/suffix windows partition by val point.
  * One partition carries the full ranked train frame, so EXACT
  * valuation is for bounded train samples — at corpus scale, feed the
  * IVF-probed candidate set per val point instead (the tail of the
  * recurrence below rank M contributes at most 1/M per point) and the
  * machinery is unchanged.
  */
object Valuation {

  /** Per-training-point exact KNN-Shapley value.
    *
    * @param train (idCol, vecCol, labelCol) training frame
    * @param valSet (idCol, vecCol, labelCol) bounded validation frame
    * @param k neighborhood size of the K-NN utility being valued
    * @return per training point: `idCol`, `label`, `n_val`, `value`
    *         (round 6, mean Shapley value over the validation set)
    */
  def knnShapley(
      train: DataFrame, valSet: DataFrame, idCol: String,
      vecCol: String, labelCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val t = train.select(col(idCol).as("tid"), col(vecCol).as("tv"),
      col(labelCol).as("tl"))
    val v = valSet.select(col(idCol).as("vid"), col(vecCol).as("vv"),
      col(labelCol).as("vl"))
    val wj = Window.partitionBy("vid")
      .orderBy(col("c").desc, col("tid").asc)
    val scored = t.crossJoin(broadcast(v))
      .withColumn("c", Similarity.cosine(col("tv"), col("vv")))
      .withColumn("j", row_number().over(wj))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("vid")))
      .withColumn("ind", when(col("tl") === col("vl"), 1).otherwise(0))
      .withColumn("indn",
        lead(col("ind"), 1).over(Window.partitionBy("vid").orderBy("j")))
    val dd = (c: String) => col(c).cast("double")
    // nano-snapped recurrence term: the last rank contributes the
    // base case ind_N / N, every other rank the indicator delta
    // scaled by min(K, j) / (K · j)
    val term = scored.withColumn("tu",
      when(col("j") === col("n"),
        round(lit(1e9) * dd("ind") / dd("n")).cast("long"))
        .otherwise(round(lit(1e9) * (dd("ind") - dd("indn")) *
          least(lit(k), col("j")).cast("double") /
          (lit(k.toDouble) * dd("j"))).cast("long")))
    val ws = Window.partitionBy("vid").orderBy("j")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    term.withColumn("su", sum("tu").over(ws))
      .groupBy(col("tid"), col("tl"))
      .agg(count(lit(1)).as("n_val"), sum("su").as("_s"))
      .select(col("tid").as(idCol), col("tl").as("label"), col("n_val"),
        round(col("_s").cast("double") / col("n_val").cast("double") /
          lit(1e9), 6).as("value"))
  }
}
