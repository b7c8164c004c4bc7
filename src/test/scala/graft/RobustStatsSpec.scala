package graft

import graft.ops.RobustStats
import org.apache.spark.sql.functions._

/** Trim-cut, midrank-tie, and contingency arithmetic pinned on hand
  * cases with known closed-form answers.
  */
class RobustStatsSpec extends SparkSpec {
  import spark.implicits._

  test("trimmed mean: outlier excluded, plain mean not") {
    // 10 values: nine 10s and one 1000. 10% trim each side (k=1)
    // drops one 10 and the 1000 → trimmed mean 10 exactly.
    val df = ((1 to 9).map(_ => ("g", 10L)) :+ (("g", 1000L))).toDF("g", "x")
    val r = RobustStats.trimmedMean(df, "g", "x", trimPpm = 100000L)
      .collect()(0)
    assert(r.getAs[Long]("n_trimmed_each") == 1L)
    assert(r.getAs[Double]("mean") == 109.0)
    assert(r.getAs[Double]("trimmed_mean") == 10.0)
  }

  test("mann-whitney: clean separation gives maximal U; ties midranked") {
    // Arm 1 values all above arm 0 → U1 = n1*n0 = 9.
    val sep = Seq(("s", 0, 1L), ("s", 0, 2L), ("s", 0, 3L),
      ("s", 1, 10L), ("s", 1, 11L), ("s", 1, 12L)).toDF("st", "arm", "x")
    val r = RobustStats.mannWhitney(sep, "st", "arm", "x").collect()(0)
    assert(r.getAs[Double]("u1") == 9.0)
    // All-tied data: U1 = n1*n0/2 (midranks), z = 0/0-guard n/a here
    // (variance 0 via tie term) — z becomes NaN/null-ish; U must be
    // exactly half the product.
    val tied = Seq(("t", 0, 5L), ("t", 0, 5L), ("t", 1, 5L), ("t", 1, 5L))
      .toDF("st", "arm", "x")
    val r2 = RobustStats.mannWhitney(tied, "st", "arm", "x").collect()(0)
    assert(r2.getAs[Double]("u1") == 2.0)
  }

  test("chi2: independent margins give 0; dense grid fills absent cells") {
    // Perfectly proportional table → chi2 = 0.
    val df = Seq.fill(4)(("a1", "b1")) ++ Seq.fill(4)(("a2", "b1")) ++
      Seq.fill(2)(("a1", "b2")) ++ Seq.fill(2)(("a2", "b2"))
    val r = RobustStats.chiSquareIndependence(df.toDF("a", "b"), "a", "b")
    assert(r.select("chi2").distinct().as[Double].collect().toSeq == Seq(0.0))
    // Absent cell: (a2, b2) missing → appears with n_obs = 0.
    val df2 = Seq(("a1", "b1"), ("a1", "b2"), ("a2", "b1"))
    val grid = RobustStats.chiSquareIndependence(df2.toDF("a", "b"), "a", "b")
    assert(grid.count() == 4)
    assert(grid.where(col("a") === "a2" && col("b") === "b2")
      .select("n_obs").as[Long].collect().toSeq == Seq(0L))
  }
}
