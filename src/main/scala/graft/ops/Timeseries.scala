package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Year expansion + capacity timeline — reference `Coalplants_GEM.R:134-152`:
  * every asset row is expanded to one row per year 2023-2050 and its
  * capacity zeroed outside the [start year, retirement year] interval,
  * then rolled up.
  *
  * Spark-first shape: `explode(sequence(...))` — a narrow generator that
  * fuses into whole-stage codegen; no separate years relation, no join,
  * no shuffle. The subsequent rollup is a single hash aggregate, where
  * Catalyst's partial aggregation collapses the ×28 blow-up map-side
  * before any shuffle — the one rewrite that makes this pipeline scale
  * (SURVEY.md §4).
  */
object Timeseries {

  /** Cross each row with years [from, to] and apply the capacity rule:
    * 0 before the start year, 0 after the retirement year, else the
    * allocated capacity (`Coalplants_GEM.R:143-147`). Null start/retire
    * bounds pass through (capacity applies to all years).
    */
  def expandYears(
      capCol: String,
      startYearCol: String,
      retireYearCol: Option[String],
      from: Int = 2023,
      to: Int = 2050
  )(df: DataFrame): DataFrame = {
    // Reference zeroes FROM the retirement year on (`year >= PR`,
    // `Coalplants_GEM.R:145`); its extra `PR <= 2050` clause is
    // redundant inside the 2023-2050 expansion (year ≤ 2050 < PR).
    val afterRetire = retireYearCol
      .map(r => col(r).isNotNull && col("year") >= col(r))
      .getOrElse(lit(false))
    df.withColumn("year", explode(sequence(lit(from), lit(to))))
      .withColumn("capacity",
        when(col(startYearCol).isNotNull && col("year") < col(startYearCol), 0.0)
          .when(afterRetire, 0.0)
          .otherwise(col(capCol)))
  }

  /** Main rollup — reference `Coalplants_GEM.R:165-171`:
    * `sum(capacity, na.rm=TRUE)` by descriptor keys. R yields 0 for an
    * all-NA group; Spark's sum yields null → coalesce to 0 for parity
    * (SURVEY.md §1).
    */
  def rollupCapacity(keys: Seq[String], capCol: String = "capacity")(df: DataFrame): DataFrame =
    df.groupBy(keys.map(col).toIndexedSeq: _*)
      .agg(coalesce(sum(col(capCol)), lit(0.0)).as("capacity"))
}
