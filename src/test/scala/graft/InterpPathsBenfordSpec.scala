package graft

import graft.ops.{Benford, Paths, Rolling}
import org.apache.spark.sql.functions._

/** na.approx parity, path-window ordering, and Benford digit/χ²
  * arithmetic pinned on hand cases.
  */
class InterpPathsBenfordSpec extends SparkSpec {
  import spark.implicits._

  test("interpolate: time-weighted fill, edges stay null (rule=1)") {
    // t:    0    10    40    50    60
    // v:  null  1.0  null   4.0  null
    // t=40 sits 30/40 of the way from 10→50: 1 + 3*0.75 = 3.25.
    val df = Seq(("u", 0L, 1L, None: Option[Double]),
      ("u", 10L, 2L, Some(1.0)), ("u", 40L, 3L, None),
      ("u", 50L, 4L, Some(4.0)), ("u", 60L, 5L, None))
      .toDF("k", "t", "id", "value")
    val out = Rolling.interpolate(df, Seq("k"), "t", "id", "value")
      .orderBy("t").select("value").collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq
    assert(out == Seq(None, Some(1.0), Some(3.25), Some(4.0), None))
  }

  test("interpolate: tied timestamps resolve by tie column") {
    // Null row shares t=10 with an observed row; id order decides the
    // bracket deterministically (observed id=1 precedes null id=2 →
    // the null interpolates between v=2.0 at t=10 and v=6.0 at t=20
    // with zero elapsed weight → 2.0).
    val df = Seq(("u", 10L, 1L, Some(2.0)), ("u", 10L, 2L, None),
      ("u", 20L, 3L, Some(6.0))).toDF("k", "t", "id", "value")
    val out = Rolling.interpolate(df, Seq("k"), "t", "id", "value")
      .orderBy("id").select("value").as[Double].collect().toSeq
    assert(out == Seq(2.0, 2.0, 6.0))
  }

  test("paths: trigrams never cross entities; rank ties break on path") {
    val df = Seq((1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "c"),
      (2L, 4L, "b"), (2L, 5L, "c"), (2L, 6L, "a"),
      (2L, 7L, "a") // gives (b,c,a) and (c,a,a)
    ).toDF("u", "ts", "et")
    val out = Paths.topTrigramPaths(df, "u", "ts", "ts", "et", k = 10)
      .orderBy("rank")
      .select("step1", "step2", "step3", "n")
      .as[(String, String, String, Long)].collect().toSeq
    // Three distinct trigrams, one each; no (c,b,c) spanning users.
    assert(out == Seq(("a", "b", "c", 1L), ("b", "c", "a", 1L),
      ("c", "a", "a", 1L)))
  }

  test("benford: truncation digit, dense grid, exact chi2 on uniform digits") {
    // 9 values with first digits 1..9 once each: p_obs = 1/9.
    val df = (1 to 9).map(d => ("g", d * 100.0 + 0.9)).toDF("g", "v")
    val out = Benford.firstDigitAudit(df, "g", "v").orderBy("digit")
      .collect()
    assert(out.map(_.getAs[Int]("digit")).toSeq == (1 to 9))
    assert(out.forall(_.getAs[Long]("n_obs") == 1L))
    // chi2 = 9 * Σ (1/9 − p_d)² / p_d, fixed literals.
    val expChi = 9.0 * Benford.Expected.map { case (_, p) =>
      (1.0 / 9 - p) * (1.0 / 9 - p) / p }.sum
    assert(math.abs(out.head.getAs[Double]("chi2") -
      BigDecimal(expChi).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .toDouble) < 1e-9)
  }
}
