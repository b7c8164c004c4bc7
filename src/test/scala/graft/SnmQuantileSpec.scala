package graft

import graft.ops.{Linkage, QuantileNormalize}
import org.apache.spark.sql.functions._

/** Sorted-neighborhood band-join completeness (every within-window
  * pair must surface — the band-replication direction bug this pins
  * was found live) and quantile-normalization exactness.
  */
class SnmQuantileSpec extends SparkSpec {
  import spark.implicits._

  test("snm: every cross-side pair within w surfaces, incl. band-crossers") {
    // Identical sort keys 'a'..'j' on both sides: each record's twin
    // is adjacent after the (sk, key, side) interleave, and pairs
    // regularly STRADDLE band boundaries (w=3 over 20 rows).
    val keys = ('a' to 'j').map(_.toString)
    val a = keys.map(k => (k, k)).toDF("id", "nm")
    val b = keys.map(k => (k, k)).toDF("id", "nm")
    val r = Linkage.sortedNeighborhood(a, b, "id", "nm", w = 3)
      .collect()(0)
    // All 10 true pairs at rank distance 1 → recall 100%.
    assert(r.getAs[Long]("n_true") == 10L)
    assert(r.getAs[Long]("recall_ppm") == 1000000L)
    // Band-join completeness: ranks interleave a0 a1 b0 b1 …, and the
    // within-3 cross-side pairs are: same letter (distance 1, 10),
    // adjacent letters in BOTH canonical orders (x0→y1 at distance 2
    // and y0 behind x1 at distance 1 → (x,y) and (y,x); 9 × 2), and
    // letter-skipping x1→z0 at exactly distance 3 → (z, x) for the 8
    // letter triples. 10 + 18 + 8 = 36 — any boundary loss in the
    // band replication shows up as a smaller count.
    assert(r.getAs[Long]("n_candidates") == 36L)
  }

  test("quantile normalize: mapped marginals identical across groups") {
    // Group A = {1..4}, group B = {101..104}: after normalization
    // both map onto the pooled distribution's spread.
    val df = (Seq(1L, 2L, 3L, 4L).map(("A", _)) ++
      Seq(101L, 102L, 103L, 104L).map(("B", _))).toDF("g", "v")
    val out = QuantileNormalize.summary(df, "g", "v")
      .orderBy("g").collect()
    val (a, b) = (out(0), out(1))
    // Identical mapped extremes = unified marginals.
    assert(a.getAs[Long]("mapped_min") == b.getAs[Long]("mapped_min"))
    assert(a.getAs[Long]("mapped_max") == b.getAs[Long]("mapped_max"))
    assert(a.getAs[Long]("mapped_min") == 1L)
    assert(a.getAs[Long]("mapped_max") == 104L)
    // Order preserved: means differ pre-mapping, coincide after.
    assert(a.getAs[Double]("mean_orig") != b.getAs[Double]("mean_orig"))
    assert(a.getAs[Double]("mean_mapped") == b.getAs[Double]("mean_mapped"))
  }
}
