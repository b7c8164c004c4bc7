package graft

import graft.ops.{Attribution, Concurrency, SpatialJoin}
import org.apache.spark.sql.functions._

/** Fixtures for conversion latency, the concurrency sweep line, and
  * grid-density clustering.
  */
class ConcurrencySpatialSpec extends SparkSpec {
  import spark.implicits._

  test("conversionLatency measures time since the LAST touch") {
    def ts(sec: Int) = f"2024-01-01 00:00:$sec%02d"
    val ev = Seq(
      (1L, 1L, "click", ts(0)), (2L, 1L, "click", ts(50)),
      (3L, 1L, "view", ts(30)), (4L, 1L, "purchase", ts(59))
    ).toDF("event_id", "user_id", "event_type", "s")
      .withColumn("ts", col("s").cast("timestamp")).drop("s")
    val r = Attribution.conversionLatency(ev, "event_id", "user_id",
        "ts", "event_type", "purchase", Seq("click", "view"), 3)
      .orderBy("channel")
      .select("channel", "n_conversions", "p50_s")
      .as[(String, Long, Double)].collect().toSeq
    // Last click 9 s before purchase, last view 29 s before.
    assert(r === Seq(("click", 1L, 9.0), ("view", 1L, 29.0)))
  }

  test("dailyPeak counts overlap, not handoff, across scan buckets") {
    // [0,10) [5,15) [12,20) overlap pairwise → peak 2;
    // [30,40) [40,50) hand off at 40 → never concurrent.
    val iv = Seq((0L, 10L), (5L, 15L), (12L, 20L), (30L, 40L),
      (40L, 50L)).toDF("s", "e")
    val r = Concurrency.dailyPeak(iv, "s", "e", bucketUs = 7L)
      .select("day", "n_starts", "n_ends", "peak_concurrent")
      .as[(Long, Long, Long, Long)].head()
    assert(r === ((0L, 5L, 5L, 2L)))
  }

  test("densityClusters merges adjacent dense cells only") {
    // Cells (0,0) and (0,1) are dense and adjacent → one cluster of
    // 4 points; cell (5,5) is dense but far → its own cluster; a
    // lone point in (2,2) is below minPts → dropped.
    val pts = Seq((1L, 1L), (2L, 3L), (1L, 12L), (5L, 17L),
      (51L, 52L), (55L, 57L), (22L, 25L))
      .toDF("lat", "lon")
    val r = SpatialJoin.densityClusters(pts, "lat", "lon",
        cellE6 = 10L, minPts = 2L)
      .orderBy("cluster")
      .select("n_cells", "n_points", "cla_min", "cla_max",
        "clo_min", "clo_max")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(r === Seq((2L, 4L, 0L, 0L, 0L, 1L),
      (1L, 2L, 5L, 5L, 5L, 5L)))
  }
}
