package graft.ops

import graft.functions.Hashing
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-based join-cardinality estimation — the optimizer-side
  * question ("how many keys do these two tables share?") answered
  * WITHOUT running the join. Each side is reduced to a KMV sketch
  * (`graft_kmv`, the k smallest distinct key hashes — one bounded
  * array per side over the shuffle); the two k-sized arrays then give
  *
  *  - distinct-count estimates per side ((k−1)·2⁶⁰ / h_k, q78's
  *    estimator),
  *  - a union sketch (k smallest of the merged arrays) and its
  *    distinct-union estimate,
  *  - a Jaccard estimate ρ = |K∪ ∩ K_A ∩ K_B| / |K∪| (the fraction of
  *    union-sketch members both sides saw), and
  *  - the intersection estimate ρ · |A∪B|̂ — the join's distinct-key
  *    cardinality.
  *
  * At 100 TB this is two parallel scans shipping k longs each; the
  * exact answer is a full distinct + join of both key sets. All sketch
  * arithmetic is integer/array ops on [[Hashing.portableHash]] values,
  * so an external engine replays the ENTIRE estimate bit-for-bit
  * (q154's oracle does) — including the estimator's error, which the
  * emitted exact tier exposes side by side.
  */
object CardinalityEstimate {

  /** One-row report: exact distinct counts (left / right /
    * intersection) next to the KMV estimates (union / Jaccard /
    * intersection). Null keys are excluded on both tiers (a null key
    * never joins).
    */
  /** Chapman capture–recapture population estimate (the bias-corrected
    * Lincoln–Petersen): run two INDEPENDENT deterministic hash
    * "captures" of the id space and estimate the total from their
    * overlap — N̂ = (n₁+1)(n₂+1)/(m+1) − 1. The estimator behind
    * "how big is the true corpus when each crawl only sees part of
    * it": two partial snapshots bound the whole without ever
    * enumerating it. Here the truth is available, so the error is
    * MEASURED (the eval harness discipline), not assumed.
    *
    * One conditional-sum aggregate over the id scan; hash membership
    * is the q57 split discipline (portable md5 buckets), so the
    * captures replay in any engine.
    *
    * @return one row: `n_true`, `n_a`, `n_b`, `n_both`, `chapman_est`
    *         (round 2), `err_ppm` (signed, vs truth)
    */
  def chapmanEstimate(
      df: DataFrame, idCol: String, pctA: Int, pctB: Int): DataFrame = {
    def in(tag: String, pct: Int) = pmod(Hashing.portableHash(
      concat(col(idCol).cast("string"), lit(s":$tag"))), lit(100L)) <
      pct.toLong
    val agg = df.agg(
      count(lit(1)).as("n_true"),
      sum(when(in("crA", pctA), 1L).otherwise(0L)).as("n_a"),
      sum(when(in("crB", pctB), 1L).otherwise(0L)).as("n_b"),
      sum(when(in("crA", pctA) && in("crB", pctB), 1L).otherwise(0L))
        .as("n_both"))
    def d(c: String) = col(c).cast("double")
    val est = (d("n_a") + lit(1.0)) * (d("n_b") + lit(1.0)) /
      (d("n_both") + lit(1.0)) - lit(1.0)
    agg.select(col("n_true"), col("n_a"), col("n_b"), col("n_both"),
      round(est, 2).as("chapman_est"),
      (round((est / d("n_true") - lit(1.0)) * lit(1e6)) + lit(0.0))
        .cast("long").as("err_ppm"))
  }

  def kmvJoinEstimate(
      left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String, k: Int): DataFrame = {
    require(k >= 2, s"k must be at least 2: $k")
    def keyHashes(df: DataFrame, keyCol: String): DataFrame =
      df.where(col(keyCol).isNotNull)
        .select(Hashing.portableHash(col(keyCol).cast("string")).as("h"))
    val skA = keyHashes(left, leftKey).agg(expr(s"graft_kmv(h, $k)").as("a"))
    val skB = keyHashes(right, rightKey).agg(expr(s"graft_kmv(h, $k)").as("b"))

    // Exact tier: one distinct pass over the tagged key union; the
    // intersection is the keys carrying both flags.
    def keys(df: DataFrame, keyCol: String, l: Int, r: Int): DataFrame =
      df.where(col(keyCol).isNotNull)
        .select(col(keyCol).cast("string").as("x"),
          lit(l).as("inl"), lit(r).as("inr"))
    val exact = keys(left, leftKey, 1, 0)
      .unionByName(keys(right, rightKey, 0, 1))
      .groupBy("x").agg(max("inl").as("l"), max("inr").as("r"))
      .agg(sum("l").as("n_left_exact"), sum("r").as("n_right_exact"),
        sum(col("l") * col("r")).as("n_inter_exact"))

    def kmvEst(arr: Column): Column =
      when(size(arr) < k, size(arr).cast("double"))
        .otherwise(lit((k - 1).toDouble) * lit(1152921504606846976L) /
          element_at(arr, k).cast("double"))

    val u = slice(array_sort(array_union(col("a"), col("b"))), 1, k)
    val m = size(col("u"))
    val matches = size(array_intersect(array_intersect(col("u"), col("a")), col("b")))
    val unionEst = kmvEst(col("u"))
    val jacc = matches.cast("double") / m.cast("double")

    skA.crossJoin(skB)
      .withColumn("u", u)
      .crossJoin(exact)
      .select(
        col("n_left_exact"), col("n_right_exact"), col("n_inter_exact"),
        (round(kmvEst(col("a")), 1) + lit(0.0)).as("left_est"),
        (round(kmvEst(col("b")), 1) + lit(0.0)).as("right_est"),
        (round(unionEst, 1) + lit(0.0)).as("union_est"),
        (round(jacc, 4) + lit(0.0)).as("jacc_est"),
        (round(jacc * unionEst, 1) + lit(0.0)).as("inter_est"))
  }
}
