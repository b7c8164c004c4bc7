package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token↔label mutual information — the classic filter-method feature
  * selector (Manning & Schütze ch. 5): MI(T; L) over the joint of
  * binary token presence and the multiclass label, per token. The
  * tokens that score highest are the ones a label classifier (q118's
  * logreg, DSIR's importance model) should spend its feature budget
  * on.
  *
  * MI = Σ_{l} [ p(1,l)·ln(N·n_tl/(n_t·n_l)) +
  *              p(0,l)·ln(N·(n_l−n_tl)/((N−n_t)·n_l)) ]
  * over exact integer document counts. Each cell term is snapped to
  * integer nano-nats BEFORE the per-token sum, so the only
  * cross-engine float step is one ln per cell on identical rationals
  * — the sum itself is integer, hence order-free, and the TOP-K RANK
  * is on the integer score (no round-boundary flips).
  *
  * Scale shape: one distinct (doc, label, token) explode (the
  * inverted-index build every retrieval op shares), three count
  * aggregates, then a token×label grid join where labels are a
  * broadcast dim. Everything downstream of the explode is
  * vocabulary-sized.
  */
object FeatureSelect {

  /** @return top `k` tokens by MI: `token`, `n_docs` (containing it),
    *         `mi` (nats, round 6)
    */
  def mutualInformation(
      df: DataFrame, idCol: String, labelCol: String, textCol: String,
      k: Int): DataFrame = {
    val pres = df.select(col(idCol).as("id"), col(labelCol).as("l"),
        explode(array_distinct(TextAnalysis.tokens(col(textCol))))
          .as("token"))
      .distinct()
    val nTL = pres.groupBy("token", "l").agg(count(lit(1)).as("n_tl"))
    val nT = pres.groupBy("token").agg(count(lit(1)).as("n_t"))
    val nL = df.groupBy(col(labelCol).as("l"))
      .agg(count(lit(1)).as("n_l"))
    val nTot = df.agg(count(lit(1)).as("nn"))
    val grid = nT.crossJoin(broadcast(nL))
      .join(nTL, Seq("token", "l"), "left")
      .withColumn("n_tl", coalesce(col("n_tl"), lit(0L)))
      .crossJoin(broadcast(nTot))
    def d(c: Column) = c.cast("double")
    def term(num: Column, den: Column, mass: Column) =
      when(mass > 0,
        round(d(mass) / d(col("nn")) * log(d(mass) * d(col("nn")) /
          (d(num) * d(den))) * lit(1e9)).cast("long"))
        .otherwise(0L)
    val cells = grid.select(col("token"), col("n_t"),
      (term(col("n_t"), col("n_l"), col("n_tl")) +
        term(col("nn") - col("n_t"), col("n_l"),
          col("n_l") - col("n_tl"))).as("mi_nano"))
    val scored = cells.groupBy("token")
      .agg(max("n_t").as("n_docs"), sum("mi_nano").as("_mi"))
    // Explicit top-k (TakeOrderedAndProject): per-partition heaps +
    // one k-row merge, by construction — not a rank window whose
    // single-task sort only an optimizer rule (InferWindowGroupLimit)
    // defuses.
    scored
      .orderBy(col("_mi").desc, col("token").asc)
      .limit(k)
      .select(col("token"), col("n_docs"),
        round(col("_mi").cast("double") / lit(1e9), 6).as("mi"))
  }
}
