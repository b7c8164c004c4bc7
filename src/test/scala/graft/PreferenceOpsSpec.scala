package graft

import graft.ops.{Agreement, Anonymity, BradleyTerry, Components,
  Conformal, Mixing}
import org.apache.spark.sql.functions._

/** Hand-computed semantics for the round-12 preference/planning tier:
  * Cohen/Fleiss kappa, Bradley–Terry MM, temperature mixing,
  * soft-dedup weights, l-diversity, split conformal.
  */
class PreferenceOpsSpec extends SparkSpec {
  import spark.implicits._

  test("cohenKappa: perfect agreement = 1, independence near 0") {
    val perfect = Seq(("a", "a"), ("b", "b"), ("a", "a"))
      .toDF("ra", "rb")
    val r1 = Agreement.cohenKappa(perfect, "ra", "rb").collect()(0)
    assert(r1.getAs[Long]("n_items") == 3L)
    assert(r1.getAs[Double]("kappa") == 1.0)
    // Classic textbook 2x2: po = 0.7, pe = 0.5 -> kappa = 0.4.
    // 35 (a,a), 15 (a,b), 15 (b,a), 35 (b,b): marginals 50/50 each.
    val rows = Seq.fill(35)(("a", "a")) ++ Seq.fill(15)(("a", "b")) ++
      Seq.fill(15)(("b", "a")) ++ Seq.fill(35)(("b", "b"))
    val r2 = Agreement.cohenKappa(rows.toDF("ra", "rb"), "ra", "rb")
      .collect()(0)
    assert(r2.getAs[Double]("po") == 0.7)
    assert(r2.getAs[Double]("pe") == 0.5)
    assert(r2.getAs[Double]("kappa") == 0.4)
  }

  test("cohenKappa: degenerate identical-constant raters -> kappa 1") {
    val const = Seq(("a", "a"), ("a", "a")).toDF("ra", "rb")
    val r = Agreement.cohenKappa(const, "ra", "rb").collect()(0)
    assert(r.getAs[Double]("pe") == 1.0 && r.getAs[Double]("kappa") == 1.0)
  }

  test("fleissKappa: unanimous panels = 1; partial panels dropped") {
    val ratings = Seq(
      (1L, 0, "x"), (1L, 1, "x"), (1L, 2, "x"),
      (2L, 0, "y"), (2L, 1, "y"), (2L, 2, "y"),
      (3L, 0, "x"), (3L, 1, "x") // only 2 raters -> dropped
    ).toDF("item", "rater", "label")
    val r = Agreement.fleissKappa(ratings, "item", "rater", "label", 3)
      .collect()(0)
    assert(r.getAs[Long]("n_items") == 2L)
    assert(r.getAs[Long]("n_dropped") == 1L)
    assert(r.getAs[Double]("p_bar") == 1.0)
    assert(r.getAs[Double]("kappa") == 1.0)
  }

  test("fleissKappa: known hand value on a 2-item mixed panel") {
    // item 1: (x,x,y) -> s2 = 4+1 = 5; item 2: (x,y,y) -> 5.
    // p_bar = (10 - 6) / (2*3*2) = 1/3. C_x = 3, C_y = 3 ->
    // p_e = (9+9)/36 = 0.5. kappa = (1/3 - 1/2)/(1/2) = -1/3.
    val ratings = Seq(
      (1L, 0, "x"), (1L, 1, "x"), (1L, 2, "y"),
      (2L, 0, "x"), (2L, 1, "y"), (2L, 2, "y")
    ).toDF("item", "rater", "label")
    val r = Agreement.fleissKappa(ratings, "item", "rater", "label", 3)
      .collect()(0)
    assert(r.getAs[Double]("p_bar") == 0.333333)
    assert(r.getAs[Double]("p_e") == 0.5)
    assert(r.getAs[Double]("kappa") == -0.333333)
  }

  test("bradleyTerry: strengths order by dominance; symmetric = equal") {
    val pairs = Seq(("a", "b", 3L), ("b", "a", 1L),
      ("b", "c", 3L), ("c", "b", 1L)).toDF("w", "l", "n")
    val m = BradleyTerry.fit(pairs, "w", "l", "n", iters = 20)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("pi")).toMap
    assert(m("a") > m("b") && m("b") > m("c"))
    assert(math.abs(m.values.sum - 1.0) < 1e-4)
    val sym = Seq(("a", "b", 2L), ("b", "a", 2L)).toDF("w", "l", "n")
    val s = BradleyTerry.fit(sym, "w", "l", "n", iters = 10)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("pi")).toMap
    assert(s("a") == 0.5 && s("b") == 0.5)
  }

  test("bradleyTerry: recovered probability matches observed win rate") {
    // Two items: MLE satisfies pi_a/(pi_a+pi_b) = wins_a/games exactly.
    val pairs = Seq(("a", "b", 7L), ("b", "a", 3L)).toDF("w", "l", "n")
    val m = BradleyTerry.fit(pairs, "w", "l", "n", iters = 30)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("pi")).toMap
    assert(math.abs(m("a") / (m("a") + m("b")) - 0.7) < 1e-4)
  }

  test("temperaturePlan: alpha=1 proportional, alpha=0 uniform, caps") {
    val tok = Seq(("s1", 900L), ("s2", 100L)).toDF("src", "tokens")
    val prop = Mixing.temperaturePlan(tok, "src", "tokens", 1.0, 1000L, 10.0)
      .collect().map(r => r.getAs[String]("source") ->
        r.getAs[Double]("weight")).toMap
    assert(prop("s1") == 0.9 && prop("s2") == 0.1)
    val unif = Mixing.temperaturePlan(tok, "src", "tokens", 0.0, 1000L, 10.0)
      .collect().map(r => r.getAs[String]("source") ->
        r.getAs[Double]("weight")).toMap
    assert(unif("s1") == 0.5 && unif("s2") == 0.5)
    // Uniform plan gives s2 500 tokens = 5 epochs -> capped at 2.
    val capped = Mixing
      .temperaturePlan(tok, "src", "tokens", 0.0, 1000L, 2.0)
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Boolean]("capped"), r.getAs[Long]("granted_tokens"),
          r.getAs[Long]("shortfall_tokens")))).toMap
    assert(capped("s2") == ((true, 200L, 300L)))
    assert(capped("s1") == ((false, 500L, 0L)))
  }

  test("softDedupWeights: cluster members keep 1/size weight") {
    val docs = Seq((1L, "s", 100L), (2L, "s", 100L), (3L, "s", 50L))
      .toDF("id", "grp", "m")
    // docs 1,2 in one cluster of size 2; doc 3 unclustered.
    val clusters = Seq((1L, 2L), (2L, 2L)).toDF("id", "cluster_size")
    val r = Components.softDedupWeights(docs, "id", "grp", "m", clusters)
      .collect()(0)
    assert(r.getAs[Long]("n_docs") == 3L)
    assert(r.getAs[Long]("n_in_clusters") == 2L)
    assert(r.getAs[Long]("raw_mass") == 250L)
    // eff = 100/2 + 100/2 + 50 = 150; inflation = 250/150 - 1 = 2/3.
    assert(r.getAs[Double]("eff_mass") == 150.0)
    assert(r.getAs[Long]("dup_inflation_ppm") == 666666L)
  }

  test("lDiversity: single-sensitive-value class flagged first") {
    val df = Seq(
      ("q1", "a"), ("q1", "a"), ("q1", "a"), // 3 records, 1 value
      ("q2", "a"), ("q2", "b"),
      ("q3", "a"), ("q3", "b"), ("q3", "c")
    ).toDF("qi", "sens")
    val rows = Anonymity.lDiversity(df, Seq("qi"), "sens", 2L, 10)
      .orderBy("risk_rank").collect()
    assert(rows(0).getAs[String]("qi") == "q1")
    assert(rows(0).getAs[Long]("n_sensitive") == 1L)
    assert(rows(0).getAs[Long]("n_below_l") == 1L)
    assert(rows(0).getAs[Long]("records_below_l") == 3L)
    assert(rows(0).getAs[Long]("min_l") == 1L)
    assert(rows.length == 3)
  }

  test("splitConformalMean: q is the exact k-th residual; coverage") {
    val df = (1L to 400L).map(i => (i, "g", (i % 20).toDouble))
      .toDF("id", "g", "v")
    val r = Conformal.splitConformalMean(df, "id", "g", "v", 100000L)
      .collect()(0)
    val nCal = r.getAs[Long]("n_cal")
    val k = r.getAs[Long]("k")
    assert(k == math.min(nCal, ((nCal + 1) * 900000L + 999999L) / 1000000L))
    assert(r.getAs[Long]("n_cal") + r.getAs[Long]("n_eval") == 400L)
    // With an honest quantile the guarantee is >= target minus the
    // finite-sample slack; on this well-behaved data it clears target.
    assert(r.getAs[Long]("coverage_ppm") >= 850000L)
    assert(r.getAs[Long]("n_eval_dropped") == 0L)
    assert(r.getAs[Double]("mean_width") ==
      2.0 * r.getAs[Double]("q"))
  }

  test("splitConformalMean: eval rows in calibration-unseen groups are counted, not dropped") {
    // Group "h2" gets only rows whose id hashes to the EVAL split, so
    // it has no calibration predictor; those rows must be reported in
    // n_eval_dropped, never silently discarded by the eval join.
    import graft.functions.Hashing
    val base = (1L to 200L).map(i => (i, "g", (i % 10).toDouble))
    // find fresh eval-split ids (odd portable-hash parity) via the
    // op's own hash and plant them under the new group — every "h2"
    // row lands on the eval side, so the group is calibration-empty.
    val candSplit = (1001L to 1400L).map(i => (i, "h2", 3.0))
      .toDF("id", "g", "v").select(col("id"),
        pmod(Hashing.portableHash(col("id").cast("string")), lit(2L))
          .as("p")).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val h2Ids = (1001L to 1400L).filter(i => candSplit(i) == 1L).take(5)
    assert(h2Ids.nonEmpty)
    val df2 = (base ++ h2Ids.map(i => (i, "h2", 3.0)))
      .toDF("id", "g", "v")
    val r2 = Conformal.splitConformalMean(df2, "id", "g", "v", 100000L)
      .collect()(0)
    assert(r2.getAs[Long]("n_eval_dropped") == h2Ids.length.toLong)
    assert(r2.getAs[Long]("n_cal") + r2.getAs[Long]("n_eval") +
      r2.getAs[Long]("n_eval_dropped") == 200L + h2Ids.length)
  }

  test("ipfRake: fixed point when marginals already match targets") {
    val df = (for { r <- Seq("a", "b"); c <- Seq("x", "y"); _ <- 1 to 4 }
      yield (r, c)).toDF("r", "c")
    val got = Mixing.ipfRake(df, "r", "c",
      Seq("a" -> 500000000L, "b" -> 500000000L),
      Seq("x" -> 500000000L, "y" -> 500000000L), rounds = 3).collect()
    got.foreach { row =>
      assert(row.getAs[Long]("w_ppb") == 250000000L)
      assert(row.getAs[Long]("w_ppb") == row.getAs[Long]("n_ppb"))
      assert(row.getAs[Long]("row_dev_ppb") == 0L)
      assert(row.getAs[Long]("col_dev_ppb") == 0L)
    }
  }

  test("ipfRake: converges to both marginals on a skewed grid") {
    // counts: (a,x)=4 (a,y)=4 (b,x)=2 (b,y)=6 — lang marginal already
    // uniform, source marginal 6/10; rake to uniform rows + observed
    // cols, which IPF reaches to within floor residue.
    val rows = Seq.fill(4)(("a", "x")) ++ Seq.fill(4)(("a", "y")) ++
      Seq.fill(2)(("b", "x")) ++ Seq.fill(6)(("b", "y"))
    val got = Mixing.ipfRake(rows.toDF("r", "c"), "r", "c",
      Seq("a" -> 500000000L, "b" -> 500000000L),
      Seq("x" -> 375000000L, "y" -> 625000000L), rounds = 8).collect()
    val cell = got.map(r =>
      (r.getAs[String]("r"), r.getAs[String]("c")) ->
        r.getAs[Long]("w_ppb")).toMap
    // Achieved marginals within a few ppb of target (integer floors).
    assert(got.head.getAs[Long]("row_dev_ppb") <= 10L)
    assert(got.head.getAs[Long]("col_dev_ppb") <= 10L)
    assert(math.abs(cell(("a", "x")) + cell(("b", "x")) - 375000000L) <= 10L)
    // IPF preserves the odds structure: within each row, mass shifts
    // toward x for row a (x-heavy vs its target) — sanity direction.
    assert(cell(("a", "x")) > cell(("b", "x")))
  }
}
