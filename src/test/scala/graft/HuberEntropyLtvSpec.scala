package graft

import graft.ops.{Compressibility, Retention, RobustStats}

/** Fixtures for Huber location, char entropy, and the LTV triangle. */
class HuberEntropyLtvSpec extends SparkSpec {
  import spark.implicits._

  test("huberLocation ignores the outlier a mean is owned by") {
    // Degenerate-scale group: MAD 0 → only exact-median rows keep
    // weight, so huber = 10 while the mean is dragged to 28.
    val g1 = Seq.fill(4)(("a", 10L)) :+ (("a", 100L))
    // Smooth group: 1..9 plus an outlier at 100.
    val g2 = (1L to 9L).map(("b", _)) :+ (("b", 100L))
    val r = RobustStats.huberLocation((g1 ++ g2).toDF("g", "x"),
        "g", "x", k = 1.345, iters = 2)
      .orderBy("g")
      .select("g", "n", "median", "mean", "huber")
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    val a = r.head
    assert(a === (("a", 5L, 10.0, 28.0, 10.0)))
    val b = r(1)
    assert(b._3 === 5.5 && b._4 === 14.5)
    assert(b._5 > b._3 && b._5 < 7.0,
      s"huber must sit near the median, far from the mean: $b")
  }

  test("charEntropy: uniform two-symbol text is exactly 1 bit") {
    val docs = Seq(("u", "aabb"), ("u", "abab"), ("k", "aaaa"))
      .toDF("g", "t")
    val r = Compressibility.charEntropy(docs, "g", "t")
      .orderBy("g")
      .select("g", "n_docs", "n_chars", "n_distinct_chars",
        "entropy_bits", "est_ratio")
      .as[(String, Long, Long, Long, Double, Option[Double])]
      .collect().toSeq
    assert(r === Seq(("k", 1L, 4L, 1L, 0.0, None),
      ("u", 2L, 8L, 2L, 1.0, Some(8.0))))
  }

  test("ltvCurve prices the cohort triangle per acquired user") {
    // u1 buys 100c in week 0 and 200c in week 1; u2 is acquired in
    // week 0 but never buys → cohort size 2, ltv halves.
    val ev = Seq((1L, 0L, 100L), (1L, 8L, 200L), (2L, 1L, 0L))
      .toDF("e", "day", "v")
    val r = Retention.ltvCurve(ev, "e", "day", "v")
      .orderBy("age_week")
      .select("cohort_week", "age_week", "n_cohort", "rev_cents",
        "cum_rev_cents", "ltv_cents")
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    assert(r === Seq((0L, 0L, 2L, 100L, 100L, 50.0),
      (0L, 1L, 2L, 200L, 300L, 150.0)))
  }
}
