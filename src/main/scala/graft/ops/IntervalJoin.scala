package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range-overlap) join — "which points fall inside which
  * time windows": alert windows × events, outage intervals × orders,
  * ad exposures × conversions. Spark has no native range join, and the
  * naive `i.s <= p.ts AND p.ts <= i.e` theta-join plans as a
  * broadcast-nested-loop (or worse, a cartesian) — O(|I|·|P|)
  * comparisons, the canonical 100 TB scale-killer.
  *
  * This is the bucketed-equi-join form instead: quantize the time axis
  * into fixed-width buckets, explode each interval to the buckets it
  * covers, map each point to its single bucket, and equi-join on
  * (bucket, keys) before applying the exact containment predicate.
  * Cost becomes one shuffle of |P| + |I|·(span/bucket + 1) rows — a
  * plan Catalyst treats like any other join (AQE handles hot-bucket
  * skew). Because a point owns exactly ONE bucket, every matching
  * (interval, point) pair surfaces exactly once: no post-join dedup.
  *
  * Pick `bucketSec` near the typical interval span: too small explodes
  * intervals into many rows, too large packs unrelated rows into the
  * same bucket and pushes work onto the residual filter.
  */
object IntervalJoin {

  /** Join `points` to every `intervals` row whose `[startCol, endCol]`
    * (inclusive both ends) contains the point's `tsCol`, matching
    * `keys` equal where given. All three time columns must be
    * timestamps; column names must not collide across the two sides
    * (rename first), mirroring [[AsofJoin.join]]'s contract.
    */
  def pointInInterval(
      intervals: DataFrame, points: DataFrame,
      startCol: String, endCol: String, tsCol: String,
      bucketSec: Long = 600L, keys: Seq[String] = Nil): DataFrame = {
    require(bucketSec > 0, s"bucketSec must be positive: $bucketSec")
    val overlap = (intervals.columns.toSet -- keys)
      .intersect(points.columns.toSet -- keys)
    require(overlap.isEmpty,
      s"non-key columns collide across sides: rename first ($overlap)")

    val b = "_ij_bucket"
    val usec = bucketSec * 1000000L // integer micros: no float drift
    // timestamp_ntz → timestamp is lossless under the UTC session tz
    // (AsofJoin.seconds does the same); floor-division keeps pre-1970
    // instants bucketing toward -inf consistently on both sides.
    def bucketOf(c: String) =
      floor(unix_micros(col(c).cast("timestamp")).cast("double") / usec)
        .cast("long")

    val iSide = intervals.withColumn(b,
      explode(sequence(bucketOf(startCol), bucketOf(endCol))))
    val pSide = points.withColumn(b, bucketOf(tsCol))
    iSide.join(pSide, b +: keys)
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop(b)
  }
}
