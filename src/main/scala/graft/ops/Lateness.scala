package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Watermark-planning profile: given an event stream with event time
  * and ARRIVAL time, compute each event's lateness against the running
  * event-time watermark (max event time over everything arrived so
  * far) and report, for each candidate allowed-lateness setting, how
  * many events a watermark-with-that-slack would drop. The batch-side
  * design aid for choosing `withWatermark(...)` in the streaming tier:
  * pick the smallest slack whose drop rate clears the SLA.
  *
  * Scale note — the running max is a GLOBAL prefix scan, which a naive
  * `Window.orderBy(arrival)` computes on ONE partition (Spark even
  * warns). This implementation is the two-pass distributed prefix
  * scan: bucket arrivals into ranges, take per-bucket maxes (tiny
  * frame), prefix-max THAT, then combine with a within-bucket running
  * max window PARTITIONED by bucket — identical result, all heavy
  * windows parallel over buckets.
  *
  * Lateness is inclusive of the event itself (in-order events have
  * exactly 0) and all arithmetic is integer microseconds.
  */
object Lateness {

  /** @param df        event frame
    * @param idCol     unique id (deterministic tie-break within one
    *                  arrival microsecond)
    * @param etCol     event-time microseconds (long)
    * @param arrCol    arrival-time microseconds (long)
    * @param bucketUs  prefix-scan bucket width (≫ skew, ≪ span)
    * @param allowedUs candidate allowed-lateness settings
    * @return one row per allowed setting: `allowed_s`, `n`, `n_late`
    *         (lateness > 0), `n_dropped` (lateness > allowed),
    *         `drop_ppm` (integer floor), `p50_late_s`/`p95_late_s`/
    *         `p99_late_s` (lateness percentiles, seconds round 3)
    */
  def watermarkProfile(
      df: DataFrame, idCol: String, etCol: String, arrCol: String,
      bucketUs: Long, allowedUs: Seq[Long]): DataFrame = {
    val in = df.select(col(idCol).as("id"),
      col(etCol).cast("long").as("et"),
      col(arrCol).cast("long").as("arr"))
    val bucketed = in.withColumn("bkt", expr(s"arr DIV ${bucketUs}L"))
    // Pass 1: per-bucket max event time; prefix-max over the bucket
    // frame (tiny: span/bucketUs rows).
    val pre = bucketed.groupBy("bkt").agg(max("et").as("bmax"))
      .withColumn("prevmax", max("bmax").over(
        Window.orderBy("bkt")
          .rowsBetween(Window.unboundedPreceding, -1L)))
    // Pass 2: within-bucket running max, PARTITIONED by bucket.
    val wIn = Window.partitionBy("bkt")
      .orderBy(col("arr").asc, col("id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val late = bucketed
      .join(broadcast(pre.select("bkt", "prevmax")), Seq("bkt"))
      .withColumn("wm", greatest(
        max("et").over(wIn), coalesce(col("prevmax"), lit(Long.MinValue))))
      .withColumn("late_us", col("wm") - col("et"))
    val stats = late.agg(
      count(lit(1)).as("n"),
      sum(when(col("late_us") > 0, 1L).otherwise(0L)).as("n_late"),
      expr("percentile(late_us, 0.5D)").as("_p50"),
      expr("percentile(late_us, 0.95D)").as("_p95"),
      expr("percentile(late_us, 0.99D)").as("_p99"))
    val drops = late
      .withColumn("allowed_us",
        explode(lit(allowedUs.toArray)))
      .groupBy("allowed_us")
      .agg(sum(when(col("late_us") > col("allowed_us"), 1L)
        .otherwise(0L)).as("n_dropped"))
    drops.crossJoin(broadcast(stats))
      .select((col("allowed_us") / lit(1000000L)).cast("long")
          .as("allowed_s"),
        col("n"), col("n_late"), col("n_dropped"),
        expr("(n_dropped * 1000000) DIV n").as("drop_ppm"),
        round(col("_p50") / lit(1e6), 3).as("p50_late_s"),
        round(col("_p95") / lit(1e6), 3).as("p95_late_s"),
        round(col("_p99") / lit(1e6), 3).as("p99_late_s"))
  }
}
