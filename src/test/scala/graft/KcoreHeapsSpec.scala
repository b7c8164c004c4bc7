package graft

import graft.ops.{GraphMetrics, Seasonal, TextAnalysis}

/** Fixtures for k-core peeling, Heaps'-law fit, and inter-arrival
  * burstiness.
  */
class KcoreHeapsSpec extends SparkSpec {
  import spark.implicits._

  test("kCore peels the pendant chain, keeps the triangle") {
    // Triangle 1-2-3 plus chain 3-4-5-6: chain nodes have degree ≤ 2
    // but peel from the END inward (6 first, then 5, then 4) — after
    // 4 rounds only the triangle remains, each with degree 2.
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L),
      (4L, 5L), (5L, 6L)).toDF("a", "b")
    val r = GraphMetrics.kCore(edges, "a", "b", k = 2, rounds = 4)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(r === Seq((1L, 2L), (2L, 2L), (3L, 2L)))
  }

  test("heapsProfile fits the two-point exponent exactly") {
    // Slice a: "x y x" (N=3, V=2, hapax=1); slice b: "x y z w"
    // (N=4, V=4, hapax=4). Two points fit exactly:
    // β = (ln4−ln2)/(ln4−ln3) = 2.4094 on micro-snapped lns.
    val docs = Seq(("a", "x y x"), ("b", "x y z w")).toDF("s", "t")
    val r = TextAnalysis.heapsProfile(docs, "s", "t")
      .orderBy("slice")
      .select("slice", "n_tokens", "vocab", "n_hapax", "hapax_frac",
        "heaps_beta")
      .as[(String, Long, Long, Long, Double, Double)].collect().toSeq
    assert(r === Seq(("a", 3L, 2L, 1L, 0.5, 2.4094),
      ("b", 4L, 4L, 4L, 1.0, 2.4094)))
  }

  test("interarrivalProfile separates regular from bursty cadence") {
    def us(ms: Long) = ms * 1000L
    val ev = (Seq(0L, 1000L, 2000L, 3000L).map(("reg", _)) ++
      Seq(0L, 100L, 200L, 3000L).map(("bst", _)))
      .zipWithIndex.map { case ((g, ms), i) => (g, us(ms), i.toLong) }
      .toDF("g", "tu", "id")
    val r = Seasonal.interarrivalProfile(ev, "g", "tu", "id")
      .orderBy("g")
      .select("g", "n_gaps", "mean_gap_s", "p50_gap_s", "cv2")
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    // bst gaps (ms): 100, 100, 2800 → mean 1 s, CV² = 1.62;
    // reg gaps: 1000 ×3 → CV² = 0.
    assert(r === Seq(("bst", 3L, 1.0, 0.1, 1.62),
      ("reg", 3L, 1.0, 1.0, 0.0)))
  }
}
