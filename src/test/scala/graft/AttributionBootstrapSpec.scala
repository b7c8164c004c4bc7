package graft

import graft.ops.{Attribution, Bootstrap, RobustStats}
import org.apache.spark.sql.functions._

/** Hand-computed fixtures for Theil–Sen, multi-touch attribution, and
  * the Poisson-bootstrap invariants.
  */
class AttributionBootstrapSpec extends SparkSpec {
  import spark.implicits._

  test("theilSen ignores the outlier the OLS slope is owned by") {
    // y = 2x except (5, 100): median pairwise slope stays 2, the
    // median residual intercept stays 0, OLS jumps to 1560/105.
    val pts = Seq((0L, 0L), (1L, 2L), (2L, 4L), (3L, 6L), (4L, 8L),
      (5L, 100L)).toDF("x", "y").withColumn("g", lit("a"))
    val r = RobustStats.theilSen(pts, "g", "x", "y")
      .select("n_points", "n_pairs", "sen_slope", "sen_intercept",
        "ols_slope")
      .as[(Long, Long, Double, Double, Double)].head()
    assert(r === ((6L, 15L, 2.0, 0.0, 14.857143)))
  }

  test("attribution splits cents exactly across the three models") {
    def ts(m: Int) = f"2024-01-01 00:$m%02d:00"
    val ev = Seq(
      // u1: click, view, then a 10.00 purchase → 500/500 linear.
      (1L, 10L, "click", 0.0, ts(1)),
      (2L, 10L, "view", 0.0, ts(2)),
      (3L, 10L, "purchase", 10.0, ts(3)),
      // u2: untouched 7.00 purchase → direct.
      (4L, 20L, "purchase", 7.0, ts(5)),
      // u3: click, click, view then 10.00 → 334/333/333 (remainder
      // to the FIRST touch).
      (5L, 30L, "click", 0.0, ts(10)),
      (6L, 30L, "click", 0.0, ts(11)),
      (7L, 30L, "view", 0.0, ts(12)),
      (8L, 30L, "purchase", 10.0, ts(13))
    ).toDF("event_id", "user_id", "event_type", "value", "s")
      .withColumn("ts", col("s").cast("timestamp")).drop("s")
    val r = Attribution.report(ev, "event_id", "user_id", "ts",
        "event_type", "purchase", Seq("click", "view"), "value", 3)
      .orderBy("channel")
      .select("channel", "n_conversions", "first_cents", "last_cents",
        "linear_cents")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(r === Seq(
      ("click", 2L, 2000L, 0L, 1167L),
      ("direct", 1L, 700L, 700L, 700L),
      ("view", 2L, 0L, 2000L, 833L)))
    // The books balance: every model column sums to total value.
    val sums = r.map(_._3).sum :: r.map(_._4).sum :: r.map(_._5).sum :: Nil
    assert(sums === List(2700L, 2700L, 2700L))
  }

  test("bootstrap CI collapses to the point estimate on constant data") {
    val df0 = (1 to 40).map(i => ("a", i.toLong, 250L)).toDF("g", "id", "x")
    val r = Bootstrap.meanCi(df0, "g", "id", "x", r = 25)
      .select("n", "mean", "ci_lo", "ci_hi", "se_boot")
      .as[(Long, Double, Double, Double, Double)].head()
    assert(r === ((40L, 250.0, 250.0, 250.0, 0.0)))
  }

  test("bootstrap weights resample to roughly the original mass") {
    // Non-constant data: the CI must bracket the point estimate and
    // have positive width (Poisson(1) weights vary per replicate).
    val df0 = (1 to 200).map(i => ("a", i.toLong, (i % 10).toLong * 100))
      .toDF("g", "id", "x")
    val r = Bootstrap.meanCi(df0, "g", "id", "x", r = 50)
      .select("mean", "ci_lo", "ci_hi", "se_boot")
      .as[(Double, Double, Double, Double)].head()
    assert(r._2 < r._1 && r._1 < r._3, s"CI must bracket the mean: $r")
    assert(r._4 > 0.0 && r._4 < 100.0, s"plausible bootstrap SE: $r")
  }
}
