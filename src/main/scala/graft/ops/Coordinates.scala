package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Coordinate canonicalization — reference `Coalplants_GEM.R:59-76`:
  * per `GEM location ID`, if a location has more than one distinct
  * (lat, long) pair, use the mean; otherwise the single value. The
  * reference computes a summary frame and re-attaches it with a left
  * join.
  *
  * Spark-first shape: ONE window over the location key — no second
  * scan of the input subtree, no aggregate-plus-join-back, and no
  * broadcast of a summary whose cardinality grows with the data (the
  * per-location dim is NOT a fixed dimension at 100 TB). `count(
  * DISTINCT) > 1` is not a window function, but it is exactly
  * `min(struct) =!= max(struct)` over the partition (struct equality
  * treats null fields as equal, like countDistinct). Determinism: R's
  * `first()` means "first in spreadsheet order", which is not
  * reproducible in a distributed engine; we use `min` for the
  * single-distinct case, which is identical when there is exactly one
  * distinct value (the only case the reference's `first` is hit).
  */
object Coordinates {

  def canonicalize(keyCol: String, latCol: String, lonCol: String)(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
    val pair = struct(col(latCol), col(lonCol))
    val multi = min(pair).over(w) =!= max(pair).over(w)
    // A NULL location id gets NULL coordinates — the reference's
    // summary left-join never matches a null key (and window
    // partitionBy would otherwise lump ALL null-key rows into one
    // fake "location" and average unrelated plants together).
    val keyed = col(keyCol).isNotNull
    df.withColumn("_multi", multi)
      .withColumn(latCol, when(keyed,
        when(col("_multi"), avg(col(latCol)).over(w)).otherwise(min(col(latCol)).over(w))))
      .withColumn(lonCol, when(keyed,
        when(col("_multi"), avg(col(lonCol)).over(w)).otherwise(min(col(lonCol)).over(w))))
      .drop("_multi")
  }
}
