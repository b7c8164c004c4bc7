package graft.ops

import graft.functions.Hashing
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hash-seeded Poisson bootstrap confidence intervals (Chamandy et al.,
  * "Estimating Uncertainty for Massive Data Streams", Google 2012): the
  * distributed bootstrap that never resamples — each row draws a
  * Poisson(1) weight per replicate from a DETERMINISTIC hash of
  * (replicate, row id), so replicate r's "resample" is a weighted
  * one-pass aggregate and all R replicates ride one shuffle.
  *
  * This is THE way to bootstrap at 100 TB: classic resampling needs
  * n draws per replicate with global coordination; Poisson(1) weights
  * are iid per row, map-side, and the error of fixed-n vs Poisson-n
  * resamples vanishes at corpus scale. R replicate means live on a
  * (groups × R) frame — the quantile step is model-sized.
  *
  * Determinism: the weight is an inverse-CDF lookup of u against
  * hard-coded cumulative Poisson(1) thresholds (truncated at 8,
  * beyond which mass < 1e-6), where u = h_r(id)/P31 from the
  * [[Hashing.universalHashes]] affine family — ONE md5 per row and
  * plain integer mixes per replicate, not R md5s (the k-seeded-md5
  * form measured 2.5× slower on the 10M-row replicate frame at
  * sf0.1). An external engine replays the exact draws via
  * [[Hashing.duckUniversalHash]]. Replicate means are ratios of
  * exact integer sums; the CI is `percentile` interpolation over
  * those identical doubles.
  */
object Bootstrap {

  /** Cumulative Poisson(1) CDF at k = 0..7: weight = #thresholds < u.
    * Σ_{i≤k} e⁻¹/i! — fixed literals so both engines compare the
    * same doubles.
    */
  val cdf: Seq[Double] = Seq(
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9809798619962128, 0.9963401531726563, 0.9994122072157449,
    0.9999242162326929, 0.9999973603918562)

  /** @param df      row frame
    * @param groupCol metric grouping column
    * @param idCol    unique row id (hash seed)
    * @param valueCol integer metric units (e.g. cents)
    * @param r        number of bootstrap replicates
    * @return per group: `n`, `mean` (point estimate, round 4),
    *         `ci_lo`, `ci_hi` (2.5%/97.5% percentile of replicate
    *         means, round 4), `se_boot` (replicate-mean stddev,
    *         round 4)
    */
  def meanCi(
      df: DataFrame, groupCol: String, idCol: String, valueCol: String,
      r: Int): DataFrame = {
    val x = col(valueCol).cast("long")
    val in = df.where(x.isNotNull)
      .select(col(groupCol).as("g"), col(idCol).cast("string").as("id"),
        x.as("x"))
    val p31 = Hashing.P31
    val w = cdf.foldLeft(lit(0L)) { (acc, c) =>
      acc + when(lit(c) < col("u"), 1L).otherwise(0L) }
    val reps = in
      .withColumn("h31", pmod(Hashing.portableHash(col("id")), lit(p31)))
      .withColumn("rep", explode(sequence(lit(0L), lit(r - 1L))))
      .withColumn("u",
        pmod(pmod(col("rep") * lit(1103515245L) + lit(12345L), lit(p31)) *
          col("h31") +
          pmod(col("rep") * lit(2654435761L) + lit(1013904223L),
            lit(p31)), lit(p31)).cast("double") / lit(p31.toDouble))
      .withColumn("w", w)
      .groupBy("g", "rep")
      .agg(sum(col("w") * col("x")).as("_swx"), sum("w").as("_sw"))
      .where(col("_sw") > 0)
      // Replicate mean snapped to integer milli-units: the replicate
      // frame's later sums/percentiles then run over exact integers,
      // so no order-sensitive double accumulation crosses engines.
      // (Milli, not micro: mr² must stay well inside int64 —
      // 5e6² × R replicates ≈ 2.5e15. The 1e-3-unit snap is shared
      // by both engines, so parity is unaffected.)
      .withColumn("mr",
        round(col("_swx").cast("double") / col("_sw").cast("double") *
          lit(1e3)).cast("long"))
    val point = in.groupBy("g")
      .agg(count(lit(1)).as("n"), sum("x").as("_sx"))
    val ci = reps.groupBy("g").agg(
      count(lit(1)).as("_nrep"),
      expr("percentile(mr, 0.025D)").as("_lo"),
      expr("percentile(mr, 0.975D)").as("_hi"),
      sum("mr").as("_sm"), sum(col("mr") * col("mr")).as("_smm"))
    point.join(ci, Seq("g"))
      .select(col("g"), col("n"),
        round(col("_sx").cast("double") / col("n").cast("double"), 4)
          .as("mean"),
        round(col("_lo") / lit(1e3), 4).as("ci_lo"),
        round(col("_hi") / lit(1e3), 4).as("ci_hi"),
        round(sqrt((col("_smm").cast("double") -
            col("_sm").cast("double") * col("_sm").cast("double") /
              col("_nrep").cast("double")) /
          (col("_nrep").cast("double") - lit(1.0))) / lit(1e3), 4)
          .as("se_boot"))
  }
}
