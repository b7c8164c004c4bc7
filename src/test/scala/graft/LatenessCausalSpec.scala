package graft

import graft.functions.Hashing
import graft.ops.{Experiment, Lateness}
import org.apache.spark.sql.functions._

/** Fixtures for the watermark-lateness prefix scan, diff-in-diff, and
  * the Simpson's-paradox scan.
  */
class LatenessCausalSpec extends SparkSpec {
  import spark.implicits._

  test("watermarkProfile computes running-max lateness across buckets") {
    // Arrival order 1..5, event times (s): 10, 30, 20, 50, 40 →
    // lateness 0, 0, 10, 0, 10 s. bucketUs = 25 s puts the scan
    // across two buckets, so the cross-bucket prefix max is exercised.
    val ev = Seq(
      (1L, 10000000L, 0L), (2L, 30000000L, 10000000L),
      (3L, 20000000L, 20000000L), (4L, 50000000L, 30000000L),
      (5L, 40000000L, 40000000L)).toDF("id", "et", "arr")
    val r = Lateness.watermarkProfile(ev, "id", "et", "arr",
        bucketUs = 25000000L, allowedUs = Seq(5000000L))
      .select("allowed_s", "n", "n_late", "n_dropped", "drop_ppm",
        "p50_late_s", "p95_late_s")
      .as[(Long, Long, Long, Long, Long, Double, Double)].head()
    assert(r === ((5L, 5L, 2L, 2L, 400000L, 0.0, 10.0)))
  }

  test("bucketed prefix scan equals the single-bucket global window") {
    // 200 hash-jittered arrivals: tiny buckets vs one giant bucket
    // must produce identical profiles (the scan is exact, not
    // approximate).
    val ev = spark.range(200).select(col("id"),
        (col("id") * 1000000L).as("et"))
      .withColumn("arr", col("et") +
        pmod(Hashing.portableHash(col("id").cast("string")),
          lit(20000001L)) - lit(10000000L))
    def run(bucket: Long) = Lateness.watermarkProfile(
        ev, "id", "et", "arr", bucket,
        Seq(1000000L, 5000000L)).orderBy("allowed_s")
      .collect().toSeq
    assert(run(7000000L) === run(Long.MaxValue / 4))
  }

  test("diffInDiff nets out baseline and trend") {
    // arm0: pre {1,3} post {2,4}; arm1: pre {3,5} post {10,12} →
    // DiD = (11−4) − (3−2) = 6; each cell var 2, n 2 → se = 2, t = 3.
    val df0 = Seq((0, 0, 1L), (0, 0, 3L), (0, 1, 2L), (0, 1, 4L),
      (1, 0, 3L), (1, 0, 5L), (1, 1, 10L), (1, 1, 12L))
      .toDF("arm", "post", "x")
    val r = Experiment.diffInDiff(df0, "arm", "post", "x")
      .select("n00", "n01", "n10", "n11", "did", "se", "t")
      .as[(Long, Long, Long, Long, Double, Double, Double)].head()
    assert(r === ((2L, 2L, 2L, 2L, 6.0, 2.0, 3.0)))
  }

  test("simpsonScan flags the classic reversal") {
    // Within both strata arm1 wins by +1; pooled, arm1 LOSES by 1
    // (stratum mix) → both rows reversed.
    val df0 = Seq(("A", 0, 1L), ("A", 1, 2L), ("A", 1, 2L),
      ("B", 0, 7L), ("B", 0, 7L), ("B", 1, 8L))
      .toDF("s", "arm", "x")
    val r = Experiment.simpsonScan(df0, "s", "arm", "x")
      .orderBy("s")
      .select("s", "diff", "pooled_diff", "reversed")
      .as[(String, Double, Double, Int)].collect().toSeq
    assert(r === Seq(("A", 1.0, -1.0, 1), ("B", 1.0, -1.0, 1)))
  }
}
