package graft

import graft.ops.{Markov, Seasonal}

/** Fixtures for cross-correlation lead detection and conditional
  * transition entropy.
  */
class CcfEntropySpec extends SparkSpec {
  import spark.implicits._

  test("crossCorrelation peaks at the true lead") {
    // b is a copied one day later: the CCF must peak at lag +1.
    val aDays = Seq(0L, 1L, 1L, 2L, 2L, 2L, 3L, 4L, 4L, 9L)
    val a = aDays.toDF("day")
    val b = aDays.map(_ + 1L).toDF("day")
    val r = Seasonal.crossCorrelation(a, b, "day", maxLag = 3)
      .select("lag", "ccf").as[(Int, Double)].collect().toMap
    assert(r(1) > r(0) && r(1) > r(2) && r(1) > r(-1),
      s"lag +1 must dominate: $r")
    assert(r(1) > 0.9, s"near-perfect lead correlation: $r")
  }

  test("conditionalEntropy: a deterministic chain has zero H(next|cur)") {
    // One user: A B A B → P(B|A)=1, P(A|B)=1 → h_cond 0; the
    // MARGINAL next-state entropy is H(2/3, 1/3) = 0.6365 = gain.
    val ev = Seq((1L, 1L, "A"), (1L, 2L, "B"), (1L, 3L, "A"),
      (1L, 4L, "B")).toDF("u", "o", "s")
    val r = Markov.conditionalEntropy(ev, "u", "o", "s")
      .orderBy("state")
      .select("state", "n_out", "h_row", "h_cond", "h_marginal",
        "info_gain")
      .as[(String, Long, Double, Double, Double, Double)]
      .collect().toSeq
    assert(r === Seq(("A", 2L, 0.0, 0.0, 0.6365, 0.6365),
      ("B", 1L, 0.0, 0.0, 0.6365, 0.6365)))
  }
}
