package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Concentration / inequality metrics per group: Gini coefficient and
  * top-decile share of a non-negative mass column — "how concentrated
  * is the token mass across sources" / "do 10% of documents carry
  * half the corpus", the diagnostics that decide whether a mixing
  * policy or a dedup pass is even worth running.
  *
  * Gini from the rank formula G = (2·Σi·xᵢ − (n+1)·Σx)/(n·Σx) with
  * xᵢ ascending — one per-group sort (the unavoidable shuffle; the
  * group-by after it reuses the same partitioning), then integer
  * sums only; Σi·xᵢ is invariant under tie order (tied runs
  * contribute the same rank set whatever row_number does), so
  * everything up to the final division is exact 64-bit arithmetic.
  */
object Concentration {

  /** Inverse Simpson index ("effective number of classes") per
    * group: (Σc)²/Σc² over category counts — 5.0 means the mix
    * behaves like 5 equally-likely classes, 1.0 means one class owns
    * it. The log-free diversity metric (entropy needs ln; this is a
    * ratio of two exact integer sums), so it hash-compares exactly.
    *
    * @return per group: `n`, `n_classes`, `inv_simpson` (round 4)
    */
  def inverseSimpson(
      df: DataFrame, groupCol: String, classCol: String): DataFrame =
    df.where(col(classCol).isNotNull)
      .groupBy(col(groupCol).as("g"), col(classCol).as("c"))
      .agg(count(lit(1)).as("n"))
      .groupBy("g")
      .agg(sum("n").as("n"), count(lit(1)).as("n_classes"),
        sum(col("n") * col("n")).as("_ss"))
      .select(col("g"), col("n"), col("n_classes"),
        round((col("n") * col("n")).cast("double") /
          col("_ss").cast("double"), 4).as("inv_simpson"))

  /** @return per group: `n`, `total`, `gini` (round 6),
    *         `top10_share` (mass share of the n DIV 10 largest rows,
    *         round 6). Null and negative values are excluded.
    */
  def giniReport(
      df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val x = col(valueCol).cast("long")
    val in = df.where(x.isNotNull && x >= 0L).select(col(groupCol), x.as("x"))
    val w = Window.partitionBy(groupCol).orderBy(col("x"))
    val ranked = in
      .withColumn("i", row_number().over(w).cast("long"))
      .withColumn("_n", count(lit(1)).over(Window.partitionBy(groupCol)))
    ranked.groupBy(groupCol)
      .agg(count(lit(1)).as("n"), sum("x").as("total"),
        sum(col("i") * col("x")).as("_sxi"),
        sum(when(col("i") > col("_n") - expr("_n DIV 10"), col("x"))
          .otherwise(0L)).as("_top10"))
      .select(col(groupCol), col("n"), col("total"),
        round((lit(2L) * col("_sxi") - (col("n") + lit(1L)) * col("total"))
          .cast("double") /
          (col("n") * col("total")).cast("double"), 6).as("gini"),
        round(col("_top10").cast("double") /
          col("total").cast("double"), 6).as("top10_share"))
  }
}
