package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Coordinate canonicalization — reference `Coalplants_GEM.R:59-76`:
  * per `GEM location ID`, if a location has more than one distinct
  * (lat, long) pair, use the mean; otherwise the single value. The
  * summary is re-attached with a left join.
  *
  * Spark-first shape: one hash aggregate over the location key, then a
  * broadcast left join (the summary is ≤ #distinct locations — a dim).
  * Determinism: R's `first()` means "first in spreadsheet order", which
  * is not reproducible in a distributed engine; we use `min` for the
  * single-distinct case, which is identical when there is exactly one
  * distinct value (the only case the reference's `first` is hit).
  */
object Coordinates {

  def canonicalize(keyCol: String, latCol: String, lonCol: String)(df: DataFrame): DataFrame = {
    val n = countDistinct(struct(col(latCol), col(lonCol)))
    val summary = df
      .groupBy(col(keyCol))
      .agg(
        when(n > 1, avg(col(latCol))).otherwise(min(col(latCol))).as(s"${latCol}_canon"),
        when(n > 1, avg(col(lonCol))).otherwise(min(col(lonCol))).as(s"${lonCol}_canon")
      )
    // No forced broadcast: the summary's cardinality = distinct
    // locations, which GROWS with the data — a broadcast hint would OOM
    // the driver at 100×. AQE converts to broadcast at runtime when the
    // aggregate output is actually small.
    df.drop(latCol, lonCol)
      .join(summary, Seq(keyCol), "left")
      .withColumnRenamed(s"${latCol}_canon", latCol)
      .withColumnRenamed(s"${lonCol}_canon", lonCol)
  }
}
