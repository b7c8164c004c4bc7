package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Benford first-digit audit: compare a value column's leading-digit
  * distribution against Benford's law and score the deviation with a
  * χ² statistic per group — the classic "does this numeric feed look
  * organically generated or fabricated/truncated" data-quality gate
  * (synthetic uniform data fails it loudly, which is itself the
  * point: the statistic tells you WHAT the distribution is, the gate
  * threshold is the caller's policy).
  *
  * Determinism: the leading digit comes from the value truncated to
  * an integer and rendered as a string (integer→string is exact in
  * every engine — no float formatting, no log10 at runtime), and the
  * Benford expectations are FIXED 6-decimal literals, not runtime
  * transcendentals, so χ² is a fixed-shape rational expression over
  * integer counts.
  */
object Benford {

  /** log10(1 + 1/d) for d = 1..9, rounded to 6 — pinned literals. */
  val Expected: Seq[(Int, Double)] = Seq(
    1 -> 0.30103, 2 -> 0.176091, 3 -> 0.124939, 4 -> 0.09691,
    5 -> 0.079181, 6 -> 0.066947, 7 -> 0.057992, 8 -> 0.051153,
    9 -> 0.045757)

  /** Per (group, digit) observed vs expected shares, with the group
    * χ² = Σ n·(p_obs − p_exp)²/p_exp repeated on each row. Values
    * < 1 (no leading digit in 1..9 after truncation) are excluded.
    */
  def firstDigitAudit(
      df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val expected = Expected
      .map { case (d, p) => struct(lit(d).as("digit"), lit(p).as("p_exp")) }
    val counts = df
      .where(col(valueCol).cast("double") >= 1.0)
      .select(col(groupCol),
        substring(col(valueCol).cast("long").cast("string"), 1, 1)
          .cast("int").as("digit"))
      .groupBy(groupCol, "digit").agg(count(lit(1)).as("n_obs"))
    // Dense digit grid so absent digits count as p_obs = 0 in χ².
    val grid = counts.select(col(groupCol)).distinct()
      .select(col(groupCol), explode(array(expected: _*)).as("e"))
      .select(col(groupCol), col("e.digit").as("digit"),
        col("e.p_exp").as("p_exp"))
    val wAll = Window.partitionBy(groupCol)
    val joined = grid.join(counts, Seq(groupCol, "digit"), "left")
      .withColumn("n_obs", coalesce(col("n_obs"), lit(0L)))
      .withColumn("_n", sum("n_obs").over(wAll))
      .withColumn("p_obs",
        col("n_obs").cast("double") / col("_n").cast("double"))
    joined
      .withColumn("chi2", sum(
        col("_n").cast("double") *
          (col("p_obs") - col("p_exp")) * (col("p_obs") - col("p_exp")) /
          col("p_exp")).over(wAll))
      .select(col(groupCol), col("digit"), col("n_obs"),
        round(col("p_obs"), 4).as("p_obs"), col("p_exp"),
        round(col("chi2"), 4).as("chi2"))
  }
}
