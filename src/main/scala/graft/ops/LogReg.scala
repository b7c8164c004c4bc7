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
  * and [[Pca.fit]]): the per-doc feature frame is computed ONCE,
  * pre-partitioned by doc id and localCheckpointed for its K reuses;
  * each iteration is ONE job — an exchange-free window computes the
  * per-doc margin on the existing partitioning, the per-bucket
  * gradient is a map-side-combinable aggregate, and the ≤ dim+1-row
  * gradient is collected into the driver-held weight map (the
  * bounded-codebook pattern: model state is dim-sized by
  * construction, never data-sized). The corpus shuffles exactly once
  * (the feature build), not per round.
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
    // saturating on the majority class.
    //
    // Pre-partitioned by doc id (one build-time shuffle): every GD
    // round's per-doc margin then runs as a WINDOW over the existing
    // partitioning — no exchange inside the loop (r19; the former
    // shape paid a model broadcast + two shuffle aggregates + a
    // checkpoint per round, ~4 actions; this shape pays ONE
    // aggregate-and-collect job per round).
    val feats = hashed.unionByName(
        hashed.select(col(idCol), col("y")).distinct()
          .select(col(idCol), lit(-1L).as("bucket"),
            lit(1.0).as("x"), col("y")))
      .repartition(col(idCol))
      .localCheckpoint(true)
    val nDocs = feats.select(idCol).distinct().count().toDouble
    // The model is dim-bounded (≤ dim+1 buckets) — driver state, the
    // same bounded-codebook posture as Pca.fit / Bpe's merge rules.
    // w = 0 for every bucket that occurs anywhere in the corpus.
    import spark.implicits._
    val allBuckets = feats.select(col("bucket")).distinct()
      .as[Long].collect().sorted
    var w = allBuckets.map(_ -> 0.0).toMap
    val wDoc = org.apache.spark.sql.expressions.Window.partitionBy(idCol)
    for (_ <- 1 to iters) {
      // err(doc) = sigmoid(Σ x·w) − y, computed per row via a window
      // sum against the literal weight map (element_at is total here:
      // every bucket in feats is a key of w by construction).
      val z = sum(col("x") * element_at(typedlit(w), col("bucket")))
        .over(wDoc)
      val err = lit(1.0) / (lit(1.0) + exp(-z)) - col("y")
      val grad = feats
        .select(col("bucket"), (col("x") * err).as("_c"))
        .groupBy("bucket")
        .agg((sum(col("_c")) / nDocs).as("g"))
        .collect()
      val g = grad.flatMap(r =>
        if (r.isNullAt(1)) None // all-null contribs ≡ the old coalesce-to-0
        else Some(r.getLong(0) -> r.getDouble(1))).toMap
      // same update arithmetic as the distributed form: absent
      // gradient (bucket with no surviving rows) leaves w unchanged
      w = w.map { case (b, wv) => b -> (wv - lr * g.getOrElse(b, 0.0)) }
    }
    spark.createDataset(allBuckets.toSeq.map(b => (b, w(b))))
      .toDF("bucket", "w")
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
