package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sequence packing — assigning documents to fixed-size
  * training chunks. LLM pretraining consumes documents concatenated
  * into budget-sized sequences (GPT-2/T5-style "concat and chunk"); the
  * pipeline-side question is WHICH documents land in WHICH chunk, and
  * the answer must be deterministic (reproducible runs, resumable jobs)
  * and shuffle-minimal at corpus scale.
  *
  * True capacity-exact bin packing ("start a new bin when the next doc
  * doesn't fit") is a sequential recurrence — each assignment depends
  * on the previous bin's fill — which neither a window function nor a
  * bounded number of passes can express. The scalable formulation used
  * by concat-and-chunk pipelines instead assigns each document to the
  * chunk its START offset falls in: `bin = floor(running_prefix_sum /
  * budget)`, letting a document straddle a boundary (training-side, the
  * straddler is split or padded). That is ONE window per stratum — a
  * single shuffle, fully parallel, and identical in every engine with
  * standard window semantics (the q63 oracle recomputes it in DuckDB).
  */
object Packing {

  /** Add a `bin` column: the budget-sized chunk each row starts in,
    * packing rows in `orderCol` order within each stratum.
    *
    * @param sizeCol   additive cost (token count, char count)
    * @param budget    chunk capacity in `sizeCol` units
    * @param strataCols independent packing domains (e.g. source) — also
    *                  the shuffle key, so packing parallelism = number
    *                  of strata × AQE coalescing; pack within sources,
    *                  not globally, at corpus scale
    * @param orderCol  deterministic order within a stratum; must be
    *                  unique per stratum for a reproducible assignment
    */
  def packBudgeted(
      df: DataFrame, orderCol: String, sizeCol: String,
      budget: Long, strataCols: Seq[String]): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefix: Column = coalesce(sum(col(sizeCol)).over(w), lit(0L))
    // Integral `div`, not `/`: prefix sums at corpus scale exceed
    // double's 2^53 exact range, and a float quotient can misassign the
    // row at a chunk boundary (same trap as the epoch-nanos div in
    // `Graft.table`).
    df.withColumn("bin", call_function("div", prefix, lit(budget)))
  }
}
