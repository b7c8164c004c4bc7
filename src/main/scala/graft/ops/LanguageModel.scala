package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram language-model perplexity scoring — the CCNet-style quality
  * gate (Wenzek et al. 2020 score with a KenLM 5-gram; the distributed
  * SHAPE is identical at any order): train token statistics on a
  * reference corpus, then score every candidate document by its mean
  * negative log-likelihood under the smoothed model. Low-NLL documents
  * read like the reference corpus; high-NLL documents are noise, menus,
  * or the wrong language — the single most used content filter in
  * public LLM-corpus pipelines.
  *
  * Scale shape: training is one explode + one map-side-combinable
  * count per token; the model (vocab counts) is tiny relative to the
  * corpus — a few million rows even for web-scale text — so scoring
  * broadcasts it and stays a narrow explode → broadcast-join →
  * per-doc mean: the 100 TB candidate corpus never shuffles.
  */
object LanguageModel {

  /** Token → occurrence count over the training frame. */
  def trainUnigram(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))

  /** Mean negative log-likelihood of each document under the add-alpha
    * smoothed unigram model `lm` (from [[trainUnigram]]):
    * p(t) = (cnt(t) + alpha) / (T + alpha * V) with T = total training
    * tokens and V = training vocabulary size; out-of-vocabulary tokens
    * get cnt = 0. Zero-token documents score null.
    *
    * @return `idCol`, `n_tokens`, `nll` (rounded to 4; lower = more
    *         reference-like)
    */
  def scoreNll(
      docs: DataFrame, idCol: String, textCol: String,
      lm: DataFrame, alpha: Double = 1.0): DataFrame = {
    require(alpha > 0, s"alpha must be positive for OOV mass: $alpha")
    val stats = lm.agg(
      sum("cnt").cast("double").as("t_total"),
      count(lit(1)).cast("double").as("v_size"))
    val toks = docs.select(col(idCol),
      explode(TextAnalysis.tokens(col(textCol))).as("token"))
    val scored = toks
      .join(broadcast(lm), Seq("token"), "left")
      .crossJoin(broadcast(stats))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"),
        avg(-log((coalesce(col("cnt"), lit(0L)).cast("double") + lit(alpha)) /
          (col("t_total") + lit(alpha) * col("v_size")))).as("nll"))
    docs.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        round(col("nll"), 4).as("nll"))
  }
}
