package graft

import graft.ops.{RobustStats, Sessionize, Similarity}
import org.apache.spark.sql.functions._

/** Fixtures for the order-statistic median CI, session dwell stats,
  * and the two-NN intrinsic-dimension estimator.
  */
class MedianDwellSpec extends SparkSpec {
  import spark.implicits._

  test("medianCi picks the binomial order-statistic bounds") {
    // n=25, values 1..25: lo = ⌊(25−1.96·5)/2⌋ = 7,
    // hi = ⌈(27+1.96·5)/2⌉ = 19 → CI = [7, 19], median 13.
    val df0 = (1L to 25L).map(("a", _)).toDF("g", "x")
    val r = RobustStats.medianCi(df0, "g", "x")
      .select("n", "median", "ci_lo", "ci_hi")
      .as[(Long, Double, Double, Double)].head()
    assert(r === ((25L, 13.0, 7.0, 19.0)))
  }

  test("dwellStats: bounces are zero dwell, percentiles per day") {
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val ev = Seq(
      (1L, 1L, ts(0)), (2L, 1L, ts(10)),  // u1 session: 10 s dwell
      (3L, 1L, ts(4000)),                  // u1 bounce
      (4L, 2L, ts(100))                    // u2 bounce
    ).toDF("event_id", "user_id", "ts")
    val r = Sessionize.dwellStats(ev, Seq("user_id"), "ts", "event_id",
        gapUs = 1800000000L)
      .select("day", "n_sessions", "bounce_ppm", "p50_dwell_s",
        "p90_dwell_s")
      .as[(Long, Long, Long, Double, Double)].head()
    // Dwells (ms): 10000, 0, 0 → p50 = 0, p90 = 8 s (interpolated).
    assert(r === ((0L, 3L, 666666L, 0.0, 8.0)))
  }

  test("twoNnDimension excludes duplicate-degenerate points") {
    def v(x: Float, y: Float, z: Float) = Array(x, y, z)
    val emb = Seq(
      (0L, v(1f, 0f, 0f)), (1L, v(1f, 0f, 0f)), // exact duplicates
      (2L, v(0.9f, 0.3f, 0.1f)), (3L, v(0.2f, 0.9f, 0.4f)),
      (4L, v(0.5f, 0.5f, 0.7f)), (5L, v(0.1f, 0.2f, 0.95f))
    ).toDF("vec_id", "embedding")
    val r = Similarity.twoNnDimension(emb, emb, "vec_id", "embedding")
      .select("n_sample", "n_valid", "id_est")
      .as[(Long, Long, Double)].head()
    assert(r._1 === 6L)
    // The two duplicates have d1 = 0 → at least they are excluded.
    assert(r._2 <= 4L && r._2 >= 1L, s"degenerates excluded: $r")
    assert(r._3 > 0.0 && r._3 < 100.0, s"finite positive ID: $r")
  }
}
