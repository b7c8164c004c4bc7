package graft

import graft.ops.{DecisionStump, Drift, Pii, Retrieval, TextAnalysis}
import org.apache.spark.sql.functions._

/** Hand semantics for the round-12 second wave: vocab coverage curve,
  * MMR re-rank, embedding centroid drift.
  */
class CoverageMmrDriftSpec extends SparkSpec {
  import spark.implicits._

  test("vocabCoverage: exact cumulative mass at checkpoints") {
    // counts: a=4, b=2, c=1 -> ranks a,b,c; cum 4,6,7.
    val df = Seq("a a b", "a b c", "a").toDF("text")
    val rows = TextAnalysis.vocabCoverage(df, "text", Seq(1L, 2L, 3L))
      .orderBy("vocab_k").collect()
    assert(rows.map(_.getAs[String]("boundary_token")).toList ==
      List("a", "b", "c"))
    assert(rows.map(_.getAs[Long]("cum_tokens")).toList ==
      List(4L, 6L, 7L))
    assert(rows.map(_.getAs[Long]("coverage_ppm")).toList ==
      List(571428L, 857142L, 1000000L))
    assert(rows.forall(_.getAs[Long]("n_types") == 3L))
    // Checkpoint past the vocab end simply yields no row.
    assert(TextAnalysis.vocabCoverage(df, "text", Seq(99L)).count() == 0L)
  }

  test("vocabCoverage: count ties rank lexicographically") {
    val df = Seq("z y z y").toDF("text")
    val rows = TextAnalysis.vocabCoverage(df, "text", Seq(1L, 2L))
      .orderBy("vocab_k").collect()
    assert(rows.map(_.getAs[String]("boundary_token")).toList ==
      List("y", "z"))
  }

  test("mmrRerank: first pick is top-rel; redundancy demotes clones") {
    // d1 scores highest; d2 is a near-clone of d1 (Jaccard 4/6); d3
    // is distinct but much lower-rel. At diversity-heavy lambda=0.2
    // the clone's penalty (0.8·0.667) must push d3 ahead at step 2;
    // at relevance-heavy lambda the clone would win instead.
    val docs = Seq(
      (1L, "spark join stream alpha beta"),
      (2L, "spark join stream alpha gamma"),
      (3L, "spark delta epsilon zeta eta")
    ).toDF("doc_id", "text")
    val got = Retrieval.mmrRerank(docs, "doc_id", "text",
      Seq("spark", "join", "stream"), pool = 3, select = 3,
      lambda = 0.2)
      .orderBy("step").collect()
    assert(got(0).getAs[Long]("doc_id") == 1L)
    assert(got(0).getAs[Double]("max_sim") == 0.0)
    assert(got(1).getAs[Long]("doc_id") == 3L)
    assert(got(2).getAs[Long]("doc_id") == 2L)
    // The clone's recorded max_sim is its Jaccard to d1: 4/6.
    assert(got(2).getAs[Double]("max_sim") == 0.6667)
  }

  test("decisionStump: finds the perfectly-separating feature") {
    // y = (a >= 10); feature a separates perfectly at bucket
    // boundary 9, feature b is weakly-informative noise. A CONSTANT
    // feature admits no split at all and is omitted from the output
    // (op contract) — pinned below with c.
    val df = Seq((5L, 7L, 9L, 0L), (8L, 13L, 9L, 0L),
      (12L, 7L, 9L, 1L), (19L, 13L, 9L, 1L), (3L, 7L, 9L, 0L),
      (15L, 13L, 9L, 1L))
      .toDF("a", "b", "c", "y")
    val rows = DecisionStump.fit(df, "y",
      Seq(("a", 10L), ("b", 10L), ("c", 10L)))
      .collect().map(r => r.getAs[String]("feature") -> r).toMap
    assert(!rows.contains("c")) // constant: no candidate boundary
    val best = rows("a")
    assert(best.getAs[Long]("threshold") == 9L)
    assert(best.getAs[Long]("n_le") == 3L &&
      best.getAs[Long]("pos_le") == 0L)
    assert(best.getAs[Long]("n_gt") == 3L &&
      best.getAs[Long]("pos_gt") == 3L)
    // Perfect split: gain = parent entropy = ln 2.
    assert(math.abs(best.getAs[Double]("gain") - math.log(2.0)) < 1e-5)
    assert(best.getAs[Int]("is_best") == 1)
    assert(rows("b").getAs[Int]("is_best") == 0)
    // b's split (1/3 vs 2/3 positives) gains a little, far from ln 2.
    assert(rows("b").getAs[Double]("gain") > 0.0 &&
      rows("b").getAs[Double]("gain") < 0.1)
  }

  test("ibanScan: mod-97 chain separates valid from corrupt") {
    // DE44 5001 0517 5407 3249 31 is the canonical specimen IBAN;
    // flipping its last digit must fail the check.
    val df = Seq(
      (1L, "pay DE44500105175407324931 now"),
      (2L, "pay DE44500105175407324932 now"), // corrupted
      (3L, "no iban here"),
      (4L, "two: DE44500105175407324931 DE00500105175407324931")
    ).toDF("id", "text")
    val m = Pii.ibanScan(df, "id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getAs[Int]("n_iban_cands"),
        r.getAs[Int]("n_iban_valid"), r.getAs[Int]("n_iban_invalid"))))
      .toMap
    assert(m(1L) == ((1, 1, 0)))
    assert(m(2L) == ((1, 0, 1)))
    assert(m(3L) == ((0, 0, 0)))
    assert(m(4L) == ((2, 1, 1)))
  }

  test("emdFromHists: a uniform +2 shift costs exactly 2 units") {
    // A = {1, 3}, B = {3, 5}: every point moves +2, so W1 = 2.0 —
    // the property KS cannot see (its statistic is 0.5 for ANY
    // non-overlap pattern of this size).
    val a = Seq(("g", 1.0), ("g", 3.0)).toDF("grp", "v")
    val b = Seq(("g", 3.0), ("g", 5.0)).toDF("grp", "v")
    val r = graft.ops.Drift.emdFromHists(a, b, "grp", "v",
      lo = 0.0, hi = 8.0, nbins = 8).collect()(0)
    assert(r.getAs[Double]("emd") == 2.0)
    assert(r.getAs[Long]("n_a") == 2L && r.getAs[Long]("n_b") == 2L)
    // Identical samples: zero transport.
    val z = graft.ops.Drift.emdFromHists(a, a, "grp", "v",
      lo = 0.0, hi = 8.0, nbins = 8).collect()(0)
    assert(z.getAs[Double]("emd") == 0.0)
  }

  test("centroidDrift: aligned group = cosine 1, opposed = -1") {
    val df = Seq(
      ("up", Seq(1.0f, 0.0f)), ("up", Seq(3.0f, 0.0f)),
      ("down", Seq(-1.0f, 0.0f)),
      ("side", Seq(0.0f, 2.0f))
    ).toDF("g", "vec")
    // Global centroid = mean of all 4 = ((1+3-1+0)/4, 2/4) = (0.75, 0.5).
    val m = Drift.centroidDrift(df, "g", "vec").collect()
      .map(r => r.getAs[String]("g") ->
        ((r.getAs[Long]("n_vecs"), r.getAs[Double]("cos_to_global"),
          r.getAs[Double]("norm")))).toMap
    assert(m("up")._1 == 2L)
    // up centroid (2, 0): cos to (0.75, 0.5) = 0.75/sqrt(0.8125).
    assert(math.abs(m("up")._2 - 0.75 / math.sqrt(0.8125)) < 1e-6)
    assert(m("up")._3 == 2.0)
    assert(math.abs(m("down")._2 - (-0.75 / math.sqrt(0.8125))) < 1e-6)
  }

  test("ksExact: hand D on overlapping samples; zero on identical ones") {
    val a = Seq(1L, 2L, 3L, 4L).toDF("v")
    val b = Seq(3L, 4L, 5L, 6L).toDF("v")
    val r = Drift.ksExact(a, b, "v").head()
    assert(r.getAs[Long]("n_a") == 4L && r.getAs[Long]("n_b") == 4L)
    // F diverges most at v=2: |F_A - F_B| = 0.5 -> d_star = 8/16.
    assert(r.getAs[Long]("d_star") == 8L)
    assert(r.getAs[Long]("d_ppm") == 500000L)
    // lambda = 0.5 * sqrt(16/8) = 0.7071 -> 707 milli.
    assert(r.getAs[Long]("lambda_milli") == 707L)
    val same = Drift.ksExact(a, a, "v").head()
    assert(same.getAs[Long]("d_star") == 0L)
    assert(same.getAs[Long]("d_ppm") == 0L)
  }
}
