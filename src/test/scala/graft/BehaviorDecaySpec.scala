package graft

import graft.ops.{Behavior, GraphMetrics, Retention}

/** Fixtures for behavior bitmasks, power-law MLE, and retention
  * decay.
  */
class BehaviorDecaySpec extends SparkSpec {
  import spark.implicits._

  test("typeCombos masks per entity-day, ignoring unknown types") {
    val ev = Seq(
      (1L, 0L, "click"), (1L, 0L, "view"), (1L, 0L, "view"),
      (1L, 1L, "purchase"), (2L, 0L, "click"), (2L, 0L, "view"),
      (1L, 0L, "mystery")
    ).toDF("e", "d", "t")
    val r = Behavior.typeCombos(ev, "e", "d", "t",
        Seq("click", "error", "purchase", "signup", "view"))
      .orderBy("mask")
      .select("mask", "combo", "n_entity_days", "n_entities")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(r === Seq((4L, "purchase", 1L, 1L),
      (17L, "click+view", 2L, 2L)))
  }

  test("powerLawAlpha on a 5-star: one tail node at degree 5") {
    val edges = (1L to 5L).map((0L, _)).toDF("a", "b")
    val r = GraphMetrics.powerLawAlpha(edges, "a", "b", dmin = 2)
      .select("n_nodes", "n_tail", "d_min", "d_max", "alpha")
      .as[(Long, Long, Long, Long, Double)].head()
    // α = 1 + 1/ln(5/1.5) = 1.8306.
    assert(r === ((6L, 1L, 1L, 5L, 1.8306)))
  }

  test("decayFit: hand-computed two-lag curve and half-life") {
    // e1 active {0,1,2}, e2 {0,1}, e3 {0}: lag-1 rate 3/5, lag-2
    // rate 1/3 → slope from the micro-snapped ln fit gives
    // half-life 1.18 days.
    val act = Seq((1L, 0L), (1L, 1L), (1L, 2L), (2L, 0L), (2L, 1L),
      (3L, 0L)).toDF("e", "d")
    val r = Retention.decayFit(act, "e", "d", maxLag = 2)
      .orderBy("lag")
      .select("lag", "n_base", "n_retained", "rate", "half_life_days")
      .as[(Int, Long, Long, Double, Double)].collect().toSeq
    assert(r === Seq((1, 5L, 3L, 0.6, 1.18), (2, 3L, 1L, 0.3333, 1.18)))
  }
}
