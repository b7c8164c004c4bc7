package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Zeroth-order character-entropy profile per corpus slice: the
  * Shannon entropy of the character distribution, in bits per
  * character — the storage planner's first-order compressibility
  * estimate (an entropy coder can't beat H bits/char at order 0;
  * real codecs with context models do better, so this is the
  * conservative bound) and a cheap text-quality signal (binary
  * junk ≈ 8 bits, natural English ≈ 4, degenerate repetition → 0).
  *
  * Character explode is positional (`sequence` + `substring`, the
  * engine-portable form), counts are exact integers, and each
  * −p·log₂p term is snapped to integer nano-bits before the
  * per-slice sum, so the only float step is one log on identical
  * rationals (the q238 MI discipline). Alphabet-sized frames after
  * the first aggregate.
  */
object Compressibility {

  /** @return per group: `n_docs`, `n_chars`, `n_distinct_chars`,
    *         `entropy_bits` (round 4), `est_ratio` (8 bits ÷ H,
    *         round 4; null for single-char degenerate slices)
    */
  def charEntropy(
      df: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val chars = df
      .select(col(groupCol).as("g"), col(textCol).as("t"))
      .where(col("t").isNotNull)
      .select(col("g"), col("t"),
        explode(sequence(lit(1), length(col("t")))).as("i"))
      .select(col("g"), expr("substring(t, i, 1)").as("ch"))
    val counts = chars.groupBy("g", "ch").agg(count(lit(1)).as("c"))
    val docs = df.where(col(textCol).isNotNull)
      .groupBy(col(groupCol).as("g"))
      .agg(count(lit(1)).as("n_docs"))
    def d(c: String) = col(c).cast("double")
    val ent = counts
      .withColumn("_n", sum("c").over(
        org.apache.spark.sql.expressions.Window.partitionBy("g")))
      // −(c/n)·log₂(c/n) in nano-bits, snapped per character class.
      .withColumn("_term",
        round(-(d("c") / d("_n")) * log2(d("c") / d("_n")) * lit(1e9))
          .cast("long"))
      .groupBy("g")
      .agg(max("_n").as("n_chars"),
        count(lit(1)).as("n_distinct_chars"),
        sum("_term").as("_h_nano"))
    docs.join(ent, Seq("g"))
      .withColumn("_h", col("_h_nano").cast("double") / lit(1e9))
      .select(col("g"), col("n_docs"), col("n_chars"),
        col("n_distinct_chars"),
        round(col("_h"), 4).as("entropy_bits"),
        round(when(col("_h") > 0.0, lit(8.0) / col("_h")), 4)
          .as("est_ratio"))
  }
}
