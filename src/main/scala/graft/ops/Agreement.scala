package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inter-annotator agreement — the QA gate for labeled / preference
  * data before it trains anything (Cohen 1960; Fleiss 1971). Raw
  * percent agreement flatters lazy raters on skewed label sets; kappa
  * subtracts the agreement that label marginals alone would produce,
  * which is why annotation pipelines gate on it and not on accuracy.
  *
  * Scale shape: both statistics reduce to a handful of
  * map-side-combinable counts — a (labelA, labelB) contingency for
  * Cohen, an (item, label) count matrix for Fleiss — so the item
  * frame shuffles once on its own keys and every "matrix" that
  * reaches the driver is label-vocabulary-sized. All numerators stay
  * exact int64 (products of counts, < 2^62 for any real corpus);
  * doubles appear only in the final division.
  */
object Agreement {

  /** Cohen's kappa between two raters, one row per item with both
    * labels. Null labels are excluded (both sides must have rated).
    *
    * @return 1 row: `n_items`, `n_agree`, `po`, `pe`, `kappa`
    *         (round 6). Degenerate case pe = 1 (both raters constant
    *         and identical) reports kappa = 1 when po = 1.
    */
  def cohenKappa(
      df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df
      .where(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).as("_a"), col(bCol).as("_b"))
      .agg(count(lit(1)).as("_c"))
    // Marginal products Σ_l nA_l·nB_l via a self-join of the two
    // label-vocab-sized marginal frames — never a second data pass.
    val ma = cells.groupBy("_a").agg(sum("_c").as("_na"))
    val mb = cells.groupBy("_b").agg(sum("_c").as("_nb"))
    val peNum = ma.join(mb, col("_a") === col("_b"))
      .agg(coalesce(sum(col("_na") * col("_nb")), lit(0L)).as("_pe_num"))
    cells.agg(
        sum("_c").as("n_items"),
        sum(when(col("_a") === col("_b"), col("_c")).otherwise(0L))
          .as("n_agree"))
      .crossJoin(broadcast(peNum))
      .select(col("n_items"), col("n_agree"),
        round(col("n_agree").cast("double") /
          col("n_items").cast("double"), 6).as("po"),
        round(col("_pe_num").cast("double") /
          (col("n_items") * col("n_items")).cast("double"), 6).as("pe"),
        round(
          when(col("_pe_num") === col("n_items") * col("n_items"),
            when(col("n_agree") === col("n_items"), lit(1.0))
              .otherwise(lit(0.0)))
          .otherwise(
            (col("n_agree").cast("double") / col("n_items") -
              col("_pe_num").cast("double") /
                (col("n_items") * col("n_items")).cast("double")) /
            (lit(1.0) - col("_pe_num").cast("double") /
              (col("n_items") * col("n_items")).cast("double"))),
          6).as("kappa"))
  }

  /** Fleiss' kappa over an (item, rater, label) rating log. Only
    * items with EXACTLY `nRaters` ratings enter the statistic (the
    * fixed-panel assumption of the estimator); the count of items
    * dropped for having a different panel size is reported so partial
    * panels are visible, not silent.
    *
    * Exact integer core: Σ_i Σ_j n_ij² (within-item agreement pairs)
    * and Σ_j C_j² (squared category totals) are int64; P̄ and P̄e
    * divide them only in the final projection.
    *
    * @return 1 row: `n_items`, `n_dropped`, `n_raters`,
    *         `n_categories`, `p_bar`, `p_e`, `kappa` (round 6)
    */
  def fleissKappa(
      df: DataFrame, itemCol: String, raterCol: String,
      labelCol: String, nRaters: Int): DataFrame = {
    require(nRaters >= 2, s"nRaters must be >= 2: $nRaters")
    val cnt = df
      .where(col(labelCol).isNotNull)
      .groupBy(col(itemCol).as("_i"), col(labelCol).as("_l"))
      .agg(count(lit(1)).as("_n"))
    val perItem = cnt.groupBy("_i")
      .agg(sum("_n").as("_r"), sum(col("_n") * col("_n")).as("_s2"))
    val kept = perItem.where(col("_r") === nRaters)
      .agg(count(lit(1)).as("n_items"),
        coalesce(sum("_s2"), lit(0L)).as("_sum_s2"))
    val dropped = perItem.where(col("_r") =!= nRaters)
      .agg(count(lit(1)).as("n_dropped"))
    // Category totals over KEPT items only — semi-join on the item
    // frame (itemCol grain both sides, co-partitioned).
    val keptItems = perItem.where(col("_r") === nRaters).select("_i")
    val catTot = cnt.join(keptItems, Seq("_i"))
      .groupBy("_l").agg(sum("_n").as("_cj"))
    val cat = catTot.agg(
      count(lit(1)).as("n_categories"),
      coalesce(sum(col("_cj") * col("_cj")), lit(0L)).as("_sum_cj2"))
    val r = lit(nRaters.toLong)
    // Kappa divides the UNROUNDED P̄/P̄e (rounding first would shift
    // the ratio); the reported p_bar/p_e round the same exact values.
    kept.crossJoin(broadcast(dropped)).crossJoin(broadcast(cat))
      .withColumn("_pb",
        (col("_sum_s2") - col("n_items") * r).cast("double") /
          (col("n_items") * r * (r - 1L)).cast("double"))
      .withColumn("_pe", col("_sum_cj2").cast("double") /
        ((col("n_items") * r) * (col("n_items") * r)).cast("double"))
      .select(col("n_items"), col("n_dropped"),
        r.as("n_raters"), col("n_categories"),
        round(col("_pb"), 6).as("p_bar"),
        round(col("_pe"), 6).as("p_e"),
        round(when(col("_pe") === 1.0,
            when(col("_pb") === 1.0, lit(1.0)).otherwise(lit(0.0)))
          .otherwise((col("_pb") - col("_pe")) / (lit(1.0) - col("_pe"))),
          6).as("kappa"))
  }
}
