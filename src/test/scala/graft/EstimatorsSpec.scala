package graft

import graft.ops.{CardinalityEstimate, Sampling, Shrinkage}
import org.apache.spark.sql.functions._

/** Fixtures for Chapman capture–recapture, EB shrinkage, and the
  * Horvitz–Thompson IPW mean.
  */
class EstimatorsSpec extends SparkSpec {
  import spark.implicits._

  test("chapmanEstimate is internally consistent with its captures") {
    val ids = (0L until 200L).toDF("id")
    val r = CardinalityEstimate.chapmanEstimate(ids, "id", 50, 50)
      .select("n_true", "n_a", "n_b", "n_both", "chapman_est")
      .as[(Long, Long, Long, Long, Double)].head()
    assert(r._1 === 200L)
    assert(r._2 > 50 && r._3 > 50, s"plausible capture sizes: $r")
    val expect = BigDecimal((r._2 + 1.0) * (r._3 + 1.0) /
      (r._4 + 1.0) - 1.0)
      .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r._5 === expect, s"Chapman formula must reproduce: $r")
  }

  test("empiricalBayesRate demotes the 1/1 entity below 90/100") {
    val rows = Seq(("A", 1)).flatMap { case (e, _) =>
      Seq(("A", 1)) } ++
      (1 to 100).map(i => ("B", if (i <= 90) 1 else 0)) ++
      (1 to 100).map(_ => ("C", 0))
    val df0 = rows.toDF("e", "s").withColumn("t", lit(1))
    val r = Shrinkage.empiricalBayesRate(df0, "e", "t", "s",
        m = 50, topN = 3)
      .select("entity", "n_trials", "raw_rate", "shrunk_rate")
      .as[(String, Long, Double, Double)].collect().toSeq
    // p0 = 91/201; B's evidence survives shrinkage, A's collapses.
    assert(r === Seq(("B", 100L, 0.9, 0.7509),
      ("A", 1L, 1.0, 0.4635), ("C", 100L, 0.0, 0.1509)))
  }

  test("ipwMean re-weights by inverse sampling rate exactly") {
    val sampled = Seq(("a", 10L), ("a", 12L), ("b", 20L))
      .toDF("source", "v")
    val r = Sampling.ipwMean(sampled, "source", "v",
        rates = Seq("a" -> 100, "b" -> 50), defaultPct = 25)
      .select("n_sample", "naive_mean", "ipw_mean")
      .as[(Long, Double, Double)].head()
    // weights 100/200: ipw = (1000+1200+4000)/400 = 15.5.
    assert(r === ((3L, 14.0, 15.5)))
  }

  test("sprtMonitor: all-success stream crosses the upper boundary at the exact step") {
    import graft.ops.SequentialTest
    import org.apache.spark.sql.functions.col
    val (a, _) = SequentialTest.llrMicroNats(0.15, 0.25)
    val (_, upper) = SequentialTest.boundariesMicroNats(0.05, 0.05)
    // every observation a success: cum = n·a; first crossing at
    // ceil(upper / a).
    val df = (1L to 50L).map(i => (i, 1L)).toDF("i", "x")
    val r = SequentialTest.sprtMonitor(df, Seq("i"), col("x") === 1L,
      0.15, 0.25, 0.05, 0.05).head()
    val expected = (upper + a - 1) / a
    assert(r.getAs[Long]("crossing_n") == expected)
    assert(r.getAs[String]("decision") == "accept_h1")
    assert(r.getAs[Long]("llr_at_crossing_micro") == expected * a)
    assert(r.getAs[Long]("llr_final_micro") == 50L * a)
    assert(r.getAs[Long]("savings_ppm") ==
      (50L - expected) * 1000000L / 50L)
  }

  test("sprtMonitor: all-failure stream accepts H0; no-crossing stream continues") {
    import graft.ops.SequentialTest
    import org.apache.spark.sql.functions.col
    val fail = (1L to 100L).map(i => (i, 0L)).toDF("i", "x")
    val r0 = SequentialTest.sprtMonitor(fail, Seq("i"), col("x") === 1L,
      0.15, 0.25, 0.05, 0.05).head()
    assert(r0.getAs[String]("decision") == "accept_h0")
    assert(r0.getAs[Long]("n_success") == 0L)
    // alternating at the indifference rate stays inside the corridor
    // for a short horizon: b ≈ -a/4, so pick 1 success per 5 obs.
    val mid = (1L to 10L).map(i => (i, if (i % 5L == 0L) 1L else 0L))
      .toDF("i", "x")
    val rc = SequentialTest.sprtMonitor(mid, Seq("i"), col("x") === 1L,
      0.15, 0.25, 0.05, 0.05).head()
    assert(rc.getAs[String]("decision") == "continue")
    assert(rc.isNullAt(rc.fieldIndex("crossing_n")))
    assert(rc.getAs[Long]("savings_ppm") == 0L)
  }
}
