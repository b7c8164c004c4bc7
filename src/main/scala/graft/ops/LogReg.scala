package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed logistic-regression training over hashed text features
  * — the TRAINED form of the fastText-shaped quality gate
  * ([[Classifier]] scores with stand-in weights; this learns them from
  * labels, the actual CCNet / GPT-3 "looks like reference text"
  * recipe: hash features, fit a linear model, filter by score).
  *
  * Features are the DSIR hashed unigram+bigram buckets
  * ([[Dsir.docFeatures]]), L1-normalized per document so every
  * example has unit mass; training is full-batch gradient descent
  * `w <- w - lr * X^T (sigmoid(Xw) - y) / N`.
  *
  * Scale shape (the same discipline as [[Similarity]]'s Lloyd loop
  * and [[Components]]): the per-doc feature frame is computed ONCE and
  * localCheckpointed for its K reuses; each iteration is two
  * map-side-combinable aggregates (per-doc margin, then per-bucket
  * gradient) with the dim-bounded model BROADCAST into the join — the
  * corpus shuffles only on its own doc/bucket keys, never on the
  * model; the model frame is localCheckpointed per round so lineage
  * stays flat. Everything driver-side is the K-step loop itself — no
  * `collect` of anything data-sized.
  */
object LogReg {

  /** Train `iters` full-batch GD steps from w = 0; labels are 0/1.
    *
    * @return `(bucket, w)` — one row per feature bucket that occurs in
    *         `df`, `w` the raw double weight (caller rounds)
    */
  def train(
      df: DataFrame, idCol: String, textCol: String, labelCol: String,
      dim: Int = 256, lr: Double = 1.0, iters: Int = 3): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    require(lr > 0, s"lr must be positive: $lr")
    val spark = df.sparkSession
    val labels = df.select(col(idCol),
      col(labelCol).cast("double").as("y"))
    val hashed = Dsir.docFeatures(df, idCol, textCol, dim)
      .withColumn("x",
        col("n").cast("double") /
          sum(col("n")).over(org.apache.spark.sql.expressions.Window
            .partitionBy(idCol)))
      .join(labels, Seq(idCol))
      .select(col(idCol), col("bucket"), col("x"), col("y"))
    // bucket -1 is the INTERCEPT: x = 1 on every doc that has any
    // feature, so the model can express the class prior instead of
    // saturating on the majority class
    val feats = hashed.unionByName(
        hashed.select(col(idCol), col("y")).distinct()
          .select(col(idCol), lit(-1L).as("bucket"),
            lit(1.0).as("x"), col("y")))
      .localCheckpoint(true)
    val nDocs = feats.select(idCol).distinct().count().toDouble
    // w = 0 for every bucket that occurs anywhere in the corpus
    var model = feats.select("bucket").distinct()
      .withColumn("w", lit(0.0))
      .localCheckpoint(true)
    for (it <- 1 to iters) {
      val margins = feats
        .join(broadcast(model), Seq("bucket"))
        .groupBy(idCol)
        .agg(sum(col("x") * col("w")).as("z"), first(col("y")).as("y"))
        .select(col(idCol),
          (lit(1.0) / (lit(1.0) + exp(-col("z"))) - col("y")).as("err"))
      val grad = feats
        .join(margins, Seq(idCol))
        .groupBy("bucket")
        .agg((sum(col("x") * col("err")) / nDocs).as("g"))
      // pinEvery: iters is caller-chosen; checkpoint generations past
      // ~16 hit the planning knee (Iterate's doc).
      model = Iterate.pinEvery(it, model
        .join(grad, Seq("bucket"), "left")
        .select(col("bucket"),
          (col("w") - lit(lr) * coalesce(col("g"), lit(0.0))).as("w")))
    }
    model
  }

  /** Score a frame under a trained model: mean bucket weight weighted
    * by the doc's normalized features — `sigmoid` of it is the quality
    * probability. Returns `idCol`, `z`, `p`.
    */
  def score(
      df: DataFrame, idCol: String, textCol: String, model: DataFrame,
      dim: Int = 256): DataFrame = {
    val hashed = Dsir.docFeatures(df, idCol, textCol, dim)
      .withColumn("x",
        col("n").cast("double") /
          sum(col("n")).over(org.apache.spark.sql.expressions.Window
            .partitionBy(idCol)))
    val feats = hashed.select(col(idCol), col("bucket"), col("x"))
      .unionByName(hashed.select(col(idCol)).distinct()
        .select(col(idCol), lit(-1L).as("bucket"), lit(1.0).as("x")))
    feats.join(broadcast(model), Seq("bucket"))
      .groupBy(idCol)
      .agg(sum(col("x") * col("w")).as("z"))
      .select(col(idCol), col("z"),
        (lit(1.0) / (lit(1.0) + exp(-col("z")))).as("p"))
  }
}
