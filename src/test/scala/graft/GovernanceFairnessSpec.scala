package graft

import graft.ops.{Anonymity, Components, Fairness}
import org.apache.spark.sql.functions._

/** Hand semantics for the round-12 governance additions: t-closeness
  * (distributional disclosure) and group-fairness audits.
  */
class GovernanceFairnessSpec extends SparkSpec {
  import spark.implicits._

  test("tCloseness: skewed class scores the EMD to the global mix") {
    // Global sens distribution over {0, 1}: 4 of each (gt = 8).
    // Class A = {0,0,0,0} (all-low), class B = {1,1,1,1}: both are
    // 1-diverse AND maximally far from the 50/50 global:
    // |cc/4 - cg/8| at sens=0 is |1 - 0.5| = 0.5 (and 0 at sens=1).
    val df = Seq(
      ("A", 0L), ("A", 0L), ("A", 0L), ("A", 0L),
      ("B", 1L), ("B", 1L), ("B", 1L), ("B", 1L)
    ).toDF("qi", "sens")
    val rows = Anonymity.tCloseness(df, Seq("qi"), "sens",
      t = 0.25, topN = 5).orderBy("risk_rank").collect()
    assert(rows.length == 2)
    assert(rows.forall(_.getAs[Double]("emd") == 0.5))
    assert(rows(0).getAs[Long]("n_above_t") == 2L)
    assert(rows(0).getAs[Double]("max_emd") == 0.5)
    // A class mirroring the global mix has zero distance.
    val even = df.unionByName(Seq(("C", 0L), ("C", 1L)).toDF("qi", "sens"))
    val m = Anonymity.tCloseness(even, Seq("qi"), "sens", 0.25, 5)
      .collect().map(r => r.getAs[String]("qi") -> r.getAs[Double]("emd"))
      .toMap
    assert(m("C") < m("A"))
  }

  test("dpNoisyCounts: bounded deterministic noise, release/suppress contract") {
    val df = (0 until 200).map(i => (s"g${i % 20}", i)).toDF("g", "x")
    val rel = Anonymity.dpNoisyCounts(df, Seq("g"),
      alphaPpm = 500000L, trials = 30, suppressBelow = 8L, seed = "s1")
    val rows = rel.collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val n = r.getAs[Long]("n"); val noise = r.getAs[Long]("noise")
      assert(n == 10L)
      assert(noise >= -30L && noise <= 30L)
      val ri = r.fieldIndex("released")
      if (r.getAs[Int]("suppressed") == 1) assert(r.isNullAt(ri))
      else assert(r.getLong(ri) == math.max(n + noise, 0L))
    }
    // Noise actually varies across cells at ε = ln 2 (not all zero).
    assert(rows.map(_.getAs[Long]("noise")).distinct.length > 1)
    assert(rows.head.getAs[Long]("l1_noise") ==
      rows.map(r => math.abs(r.getAs[Long]("noise"))).sum)
    // Deterministic: the same seed replays the exact draw; a
    // different seed draws a different noise vector.
    val again = Anonymity.dpNoisyCounts(df, Seq("g"),
      500000L, 30, 8L, "s1").collect()
    assert(again.map(_.toString).sorted.sameElements(rows.map(_.toString).sorted))
    val other = Anonymity.dpNoisyCounts(df, Seq("g"),
      500000L, 30, 8L, "s2").collect()
    assert(other.map(r => r.getAs[String]("g") -> r.getAs[Long]("noise")).toMap !=
      rows.map(r => r.getAs[String]("g") -> r.getAs[Long]("noise")).toMap)
    // α = 0 ⇒ every trial fails ⇒ zero noise, exact release.
    val exact = Anonymity.dpNoisyCounts(df, Seq("g"), 0L, 30, 0L, "s1")
      .collect()
    assert(exact.forall(r => r.getAs[Long]("noise") == 0L &&
      r.getAs[Long]("released") == r.getAs[Long]("n")))
  }

  test("licensePropagation: cluster max wins; singletons and unclustered keep own") {
    // d1 (permissive) shares a cluster with d2 (restricted) -> d1's
    // effective rank upgrades to 2; d3 is unclustered, d4 a singleton.
    val docs = Seq((1L, "s", 0L), (2L, "s", 2L), (3L, "s", 1L),
      (4L, "t", 0L)).toDF("id", "g", "own")
    val clusters = Seq((1L, 100L), (2L, 100L), (4L, 200L))
      .toDF("id", "component")
    val got = Components.licensePropagation(docs, "id", "g", "own",
      clusters, restrictedRank = 2L)
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    val s = got("s")
    assert(s.getAs[Long]("n_docs") == 3L)
    assert(s.getAs[Long]("n_in_clusters") == 2L)
    assert(s.getAs[Long]("n_upgraded") == 1L)
    assert(s.getAs[Long]("upgraded_ppm") == 333333L)
    assert(s.getAs[Long]("max_upgrade") == 2L)
    assert(s.getAs[Long]("n_own_restricted") == 1L)
    assert(s.getAs[Long]("n_eff_restricted") == 2L)
    val t = got("t")
    assert(t.getAs[Long]("n_in_clusters") == 1L)
    assert(t.getAs[Long]("n_upgraded") == 0L)
    assert(t.getAs[Long]("max_upgrade") == 0L)
    assert(t.getAs[Long]("n_eff_restricted") == 0L)
  }

  test("selectionParity: rates, best-ratio, four-fifths flag") {
    // g1 keeps 4/5 = 0.8, g2 keeps 3/5 = 0.6: ratio 0.75 < 0.8 flag.
    val df = (Seq.fill(4)(("g1", 1)) ++ Seq(("g1", 0)) ++
      Seq.fill(3)(("g2", 1)) ++ Seq.fill(2)(("g2", 0))).toDF("g", "kept")
    val m = Fairness.selectionParity(df, "g", "kept")
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    assert(m("g1").getAs[Long]("sel_rate_ppm") == 800000L)
    assert(m("g1").getAs[Int]("four_fifths_flag") == 0)
    assert(m("g2").getAs[Long]("sel_rate_ppm") == 600000L)
    assert(m("g2").getAs[Double]("ratio_to_best") == 0.75)
    assert(m("g2").getAs[Int]("four_fifths_flag") == 1)
  }

  test("equalizedOdds: per-group TPR/FPR and signed gaps; empty class null") {
    // g1: pos {1->sel, 1->sel}, neg {0->sel}: TPR 1.0, FPR 1.0.
    // g2: pos {1->not}, neg {0->not, 0->not}: TPR 0, FPR 0.
    // overall: TPR = 2/3, FPR = 1/3.
    val df = Seq(
      ("g1", 1, 1), ("g1", 1, 1), ("g1", 1, 0),
      ("g2", 0, 1), ("g2", 0, 0), ("g2", 0, 0)
    ).toDF("g", "sel", "y")
    val m = Fairness.equalizedOdds(df, "g", "sel", "y")
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    assert(m("g1").getAs[Long]("tpr_ppm") == 1000000L)
    assert(m("g1").getAs[Long]("fpr_ppm") == 1000000L)
    assert(m("g2").getAs[Long]("tpr_ppm") == 0L)
    assert(m("g1").getAs[Long]("tpr_gap_ppm") == 1000000L - 666666L)
    assert(m("g2").getAs[Long]("fpr_gap_ppm") == 0L - 333333L)
    // A group with no positives reports null TPR, null gap.
    val df2 = df.unionByName(Seq(("g3", 1, 0)).toDF("g", "sel", "y"))
    val g3 = Fairness.equalizedOdds(df2, "g", "sel", "y")
      .collect().find(_.getString(0) == "g3").get
    assert(g3.isNullAt(g3.fieldIndex("tpr_ppm")))
    assert(g3.isNullAt(g3.fieldIndex("tpr_gap_ppm")))
  }
}
