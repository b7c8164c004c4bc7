package graft

import graft.ops.{Markov, Stats, TimeWeighted}

/** Fixtures for TWAP, Markov stationary mix, and OLS diagnostics. */
class TwapMarkovSpec extends SparkSpec {
  import spark.implicits._

  test("twap weights by holding time, not sample count") {
    // 1-second slices: v=10 held 400 ms, v=20 held 600 ms →
    // twap 16, plain mean 15.
    val obs = Seq(("a", 0L, 0L, 10L), ("a", 0L, 400000L, 20L))
      .toDF("g", "sl", "ts", "v")
    val r = TimeWeighted.twap(obs, "g", "sl", "ts", "v",
        sliceWidthUs = 1000000L)
      .select("n_obs", "twap", "mean")
      .as[(Long, Double, Double)].head()
    assert(r === ((2L, 16.0, 15.0)))
  }

  test("markov stationary converges toward the 0.8/0.2 fixpoint") {
    // One user: A A A A B A → P(A→A)=3/4, P(A→B)=1/4, P(B→A)=1.
    // True stationary is (0.8, 0.2); three snapped rounds from
    // uniform give exactly 0.8046875 / 0.1953125 (traced by hand in
    // integer nano-units).
    val ev = Seq((1L, 1L, "A"), (1L, 2L, "A"), (1L, 3L, "A"),
      (1L, 4L, "A"), (1L, 5L, "B"), (1L, 6L, "A"))
      .toDF("u", "o", "s")
    val r = Markov.stationary(ev, "u", "o", "s", rounds = 3)
      .orderBy("state")
      .select("state", "n_out", "pi0", "pi")
      .as[(String, Long, Double, Double)].collect().toSeq
    assert(r === Seq(("A", 4L, 0.5, 0.804688), ("B", 1L, 0.5, 0.195313)))
  }

  test("olsDiagnostics: a perfect line has r2=1 and null shape stats") {
    val line = (1L to 5L).map(x => ("p", x, 2 * x + 1)).toDF("g", "x", "y")
    val r = Stats.olsDiagnostics(line, "g", "x", "y")
      .select("n", "slope", "r2", "resid_skew", "resid_kurtosis")
      .as[(Long, Double, Double, Option[Double], Option[Double])].head()
    assert(r === ((5L, 2.0, 1.0, None, None)))
  }

  test("olsDiagnostics flags asymmetric, light-tailed residuals") {
    // y = (0,0,0,3) on x=1..4: residuals (.6,−.3,−1.2,.9) —
    // left-skewed, platykurtic.
    val pts = Seq(("q", 1L, 0L), ("q", 2L, 0L), ("q", 3L, 0L),
      ("q", 4L, 3L)).toDF("g", "x", "y")
    val r = Stats.olsDiagnostics(pts, "g", "x", "y")
      .select("slope", "r2", "resid_skew", "resid_kurtosis")
      .as[(Double, Double, Double, Double)].head()
    // covN=18, varXN=20, varYN=27 → r² = 324/540 = 0.6.
    assert(r._1 === 0.9 && r._2 === 0.6)
    assert(r._3 < 0.0, s"left-skewed residuals: $r")
    assert(r._4 < 0.0 && r._4 > -3.0, s"platykurtic residuals: $r")
  }
}
