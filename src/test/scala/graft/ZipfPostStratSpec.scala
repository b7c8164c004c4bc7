package graft

import graft.core.Graft
import graft.ops.{Experiment, Pca, TextAnalysis}

/** Fixtures for Zipf fit, post-stratification, and the whitening
  * audit invariant.
  */
class ZipfPostStratSpec extends SparkSpec {
  import spark.implicits._

  test("zipfFit recovers slope -1 on an exact 1/r corpus") {
    val text = (Seq.fill(12)("a") ++ Seq.fill(6)("b") ++
      Seq.fill(4)("c") ++ Seq.fill(3)("d")).mkString(" ")
    val r = TextAnalysis.zipfFit(Seq(text).toDF("text"), "text", 10)
      .select("total_tokens", "vocab", "top_k", "zipf_slope", "zipf_r2")
      .as[(Long, Long, Long, Double, Double)].head()
    assert(r === ((25L, 4L, 4L, -1.0, 1.0)))
  }

  test("postStratified weights per-stratum contrasts by share") {
    val rows = Seq(
      ("A", 0, 1L), ("A", 0, 3L), ("A", 1, 5L), ("A", 1, 7L),
      ("B", 0, 10L), ("B", 0, 12L), ("B", 1, 13L), ("B", 1, 15L))
    val r = Experiment.postStratified(rows.toDF("s", "arm", "x"),
        "s", "arm", "x")
      .orderBy("s")
      .select("s", "share_ppm", "diff", "effect", "se")
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    // diffs 4 and 3 at equal shares → effect 3.5; each stratum's
    // Welch variance term is 0.5 → SE = 1.
    assert(r === Seq(("A", 500000L, 4.0, 3.5, 1.0),
      ("B", 500000L, 3.0, 3.5, 1.0)))
  }

  test("whitenAudit: total variance can only shrink") {
    val emb = Graft.table(spark, "/root/testdata/sf0.001", "embeddings")
    val r = Pca.whitenAudit(emb, "vec_id", "embedding")
      .select("var_before", "var_after")
      .as[(Double, Double)].collect().toSeq
    assert(r.size === 64)
    val (b, a) = (r.map(_._1).sum, r.map(_._2).sum)
    assert(a <= b + 1e-6,
      s"removing a direction cannot add variance: $a vs $b")
  }
}
