package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Group-fairness audit of a binary decision (a curation filter, a
  * quality gate, a classifier) across a protected/grouping attribute
  * — for a training-data pipeline this is "does the quality gate keep
  * Spanish at half the rate it keeps English?", the per-language
  * disparate-impact check multilingual corpus reports publish.
  *
  * [[selectionParity]] is the demographic-parity view: per-group
  * selection rates, each group's ratio to the best-kept group, and
  * the four-fifths-rule flag (US EEOC convention: ratio < 0.8 ⇒
  * adverse impact). [[equalizedOdds]] conditions on a ground-truth
  * label: per-group TPR/FPR and their gaps to the overall rates —
  * parity of ERRORS, the stronger criterion (Hardt et al., NeurIPS
  * 2016).
  *
  * Scale shape: everything reduces to map-side-combinable counts at
  * group grain; the only joins are 1-row broadcast totals. Rates are
  * exact integer ratios floored to ppm where gates compare them;
  * doubles appear only in rounded report columns.
  */
object Fairness {

  /** @param df one row per unit with a boolean/0-1 decision column
    * @return per group: `n`, `n_selected`, `sel_rate_ppm` (integer
    *         floor), `ratio_to_best` (round 4, vs the highest-rate
    *         group), `four_fifths_flag` (1 when ratio < 0.8)
    */
  def selectionParity(
      df: DataFrame, groupCol: String, flagCol: String): DataFrame = {
    val per = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(when(col(flagCol).cast("boolean"), 1L).otherwise(0L))
          .as("n_selected"))
      .withColumn("sel_rate_ppm", expr("(n_selected * 1000000) DIV n"))
    val best = per.agg(max("sel_rate_ppm").as("_best"))
    per.crossJoin(broadcast(best))
      .select(col(groupCol), col("n"), col("n_selected"),
        col("sel_rate_ppm"),
        round(col("sel_rate_ppm").cast("double") /
          col("_best").cast("double"), 4).as("ratio_to_best"),
        // ppm-exact four-fifths comparison: rate*5 < best*4.
        when(col("sel_rate_ppm") * 5L < col("_best") * 4L, 1)
          .otherwise(0).as("four_fifths_flag"))
  }

  /** @param df one row per unit with 0/1 decision and 0/1 label
    * @return per group: `n_pos`, `n_neg`, `tpr_ppm`, `fpr_ppm`
    *         (integer floors; null when the group has no pos/neg
    *         members), `tpr_gap_ppm` / `fpr_gap_ppm` (signed gaps to
    *         the OVERALL rates)
    */
  def equalizedOdds(
      df: DataFrame, groupCol: String, flagCol: String,
      labelCol: String): DataFrame = {
    val aggs = Seq(
      sum(when(col(labelCol).cast("boolean"), 1L).otherwise(0L))
        .as("n_pos"),
      sum(when(!col(labelCol).cast("boolean"), 1L).otherwise(0L))
        .as("n_neg"),
      sum(when(col(labelCol).cast("boolean") &&
        col(flagCol).cast("boolean"), 1L).otherwise(0L)).as("_tp"),
      sum(when(!col(labelCol).cast("boolean") &&
        col(flagCol).cast("boolean"), 1L).otherwise(0L)).as("_fp"))
    val per = df.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
      .withColumn("tpr_ppm",
        when(col("n_pos") > 0L, expr("(_tp * 1000000) DIV n_pos")))
      .withColumn("fpr_ppm",
        when(col("n_neg") > 0L, expr("(_fp * 1000000) DIV n_neg")))
    val overall = df.agg(aggs.head, aggs.tail: _*)
      .select(expr("(_tp * 1000000) DIV n_pos").as("_otpr"),
        expr("(_fp * 1000000) DIV n_neg").as("_ofpr"))
    per.crossJoin(broadcast(overall))
      .select(col(groupCol), col("n_pos"), col("n_neg"),
        col("tpr_ppm"), col("fpr_ppm"),
        (col("tpr_ppm") - col("_otpr")).as("tpr_gap_ppm"),
        (col("fpr_ppm") - col("_ofpr")).as("fpr_gap_ppm"))
  }
}
