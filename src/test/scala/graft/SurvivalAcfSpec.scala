package graft

import graft.ops.{RobustStats, Seasonal, Survival}
import org.apache.spark.sql.functions._

/** Hand-computed fixtures for the round-11 statistics additions:
  * Kaplan–Meier survival, Welch's t, and the daily ACF.
  */
class SurvivalAcfSpec extends SparkSpec {
  import spark.implicits._

  test("kaplanMeier matches the hand-computed product-limit curve") {
    // Entities (first_d, last_d), horizon = 10, censorGap = 3:
    //   a: (0, 2)  observed, t=2      b: (0, 5) observed, t=5
    //   c: (3, 5)  observed, t=2      d: (0, 9) censored, t=10-0=10...
    // last_d <= 7 → observed. d: last 9 > 7 → censored at t = 10.
    // e: (2, 10) censored at t = 8.
    val ev = Seq(
      ("a", 0L), ("a", 2L),
      ("b", 0L), ("b", 5L),
      ("c", 3L), ("c", 5L),
      ("d", 0L), ("d", 9L),
      ("e", 2L), ("e", 10L)
    ).toDF("e", "d")
    // Durations: a=2 obs, b=5 obs, c=2 obs, d=10 cens, e=8 cens.
    // t=2: risk 5, churn 2 → S = 3/5 = 0.6
    // t=5: risk 3, churn 1 → S = 0.6 * 2/3 = 0.4
    val km = Survival.kaplanMeier(ev, "e", "d", censorGap = 3)
      .orderBy("t")
      .select("t", "n_risk", "n_churn", "n_censored", "survival")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(km === Seq((2L, 5L, 2L, 0L, 0.6), (5L, 3L, 1L, 0L, 0.4)))
  }

  test("kaplanMeier keeps same-time censored entities in the risk set") {
    // a: t=2 obs; b: censored at t=2 (first 8, last 10, horizon 10,
    // gap 3) — b must still count in the risk set at t=2.
    val ev = Seq(("a", 0L), ("a", 2L), ("b", 8L), ("b", 10L),
      ("x", 0L), ("x", 10L)).toDF("e", "d")
    val km = Survival.kaplanMeier(ev, "e", "d", censorGap = 3)
      .select("t", "n_risk", "n_churn", "survival")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(km === Seq((2L, 3L, 1L, 0.666667)))
  }

  test("welchT reproduces the textbook two-sample statistic") {
    // Arm 0: 1,2,3,4,5 (mean 3, var 2.5); arm 1: 2,4,6,8,10
    // (mean 6, var 10). t = 3 / sqrt(2.5/5 + 10/5) = 3 / sqrt(2.5)
    // = 1.8974; df = 2.5² / (0.25/4 + 4/4) = 6.25/1.0625 = 5.88.
    val df0 = Seq((0, 1L), (0, 2L), (0, 3L), (0, 4L), (0, 5L),
      (1, 2L), (1, 4L), (1, 6L), (1, 8L), (1, 10L))
      .toDF("arm", "x").withColumn("s", lit("g"))
    val r = RobustStats.welchT(df0, "s", "arm", "x")
      .select("n0", "n1", "mean0", "mean1", "t", "df")
      .as[(Long, Long, Double, Double, Double, Double)].head()
    assert(r === ((5L, 5L, 3.0, 6.0, 1.8974, 5.88)))
  }

  test("acf detects a strict period-2 cycle and fills missing days") {
    // Series over days 0..5 for one group, day 3 absent (volume 0):
    // counts 2,0,2,0,2,0 → mean 1, lag-1 acf = -1·(pairs)/SS.
    // x−μ = (1,−1,1,−1,1,−1); SS = 6.
    // lag1: Σ = (1·−1)+(−1·1)+(1·−1)+(−1·1)+(1·−1) = −5 → −0.8333
    // lag2: Σ = (1·1)+(−1·−1)+(1·1)+(−1·−1) = 4 → 0.6667
    val ev = Seq(("g", 0L), ("g", 0L), ("g", 2L), ("g", 2L),
      ("g", 4L), ("g", 4L), ("h", 1L)).toDF("g", "d")
    val r = Seasonal.acf(ev.where(col("g") === "g"), "g", "d", 2)
      .orderBy("lag").select("lag", "n_days", "n_pairs", "acf")
      .as[(Int, Long, Long, Double)].collect().toSeq
    // Grid 0..4 fills days 1, 3 with zero: counts 2,0,2,0,2; μ=1.2;
    // dev = .8,−1.2,.8,−1.2,.8; SS = 4.8.
    // lag1: .8·−1.2 + −1.2·.8 + .8·−1.2 + −1.2·.8 = −3.84 → −0.8
    // lag2: .8·.8 + −1.2·−1.2 + .8·.8 = 2.72 → 2.72/4.8 = 0.5667
    assert(r === Seq((1, 5L, 4L, -0.8), (2, 5L, 3L, 0.5667)))
  }
}
