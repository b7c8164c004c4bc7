package graft

import graft.ops.CardinalityEstimate
import org.apache.spark.sql.Row

/** KMV join-cardinality estimator invariants: when both key sets are
  * smaller than k the sketches are COMPLETE and every estimate must
  * equal the exact tier exactly; disjoint sets must estimate zero
  * intersection; null keys never count on either tier.
  */
class CardinalityEstimateSpec extends SparkSpec {
  import spark.implicits._

  private def report(
      left: Seq[Option[Long]], right: Seq[Option[Long]], k: Int): Row =
    CardinalityEstimate.kmvJoinEstimate(
      left.toDF("x"), "x", right.toDF("y"), "y", k).head()

  test("sub-k sets: estimates collapse to the exact counts") {
    // 40 vs 30 keys with 20 shared, duplicates on the left — well
    // under k=128, so the sketch IS the distinct key-hash set.
    val l = ((1L to 40L) ++ (1L to 10L)).map(Option(_))
    val r = (21L to 50L).map(Option(_))
    val row = report(l, r, k = 128)
    assert(row.getLong(0) == 40L && row.getLong(1) == 30L && row.getLong(2) == 20L)
    assert(row.getDouble(3) == 40.0) // left_est
    assert(row.getDouble(4) == 30.0) // right_est
    assert(row.getDouble(5) == 50.0) // union_est
    assert(row.getDouble(6) == 0.4) // jacc = 20/50
    assert(row.getDouble(7) == 20.0) // inter_est
  }

  test("disjoint sets estimate zero intersection; nulls excluded") {
    val l = (1L to 25L).map(Option(_)) :+ (None: Option[Long])
    val r = (100L to 120L).map(Option(_)) :+ (None: Option[Long])
    val row = report(l, r, k = 64)
    assert(row.getLong(0) == 25L && row.getLong(1) == 21L && row.getLong(2) == 0L)
    assert(row.getDouble(6) == 0.0 && row.getDouble(7) == 0.0)
  }

  test("oversized sets: estimate within 35% of truth at k=128") {
    val l = (1L to 3000L).map(Option(_))
    val r = (2001L to 5000L).map(Option(_))
    val row = report(l, r, k = 128)
    assert(row.getLong(2) == 1000L)
    val est = row.getDouble(7)
    assert(est > 650 && est < 1350, s"inter_est $est drifted from 1000")
  }

  test("hllReport: estimate near exact, merge law exact, registers bounded") {
    // two groups with overlapping key ranges; m=64 registers.
    val df = ((1L to 2000L).map(i => ("a", s"k$i")) ++
      (1001L to 3000L).map(i => ("b", s"k$i"))).toDF("g", "k")
    val rows = CardinalityEstimate.hllReport(df, "g", "k", p = 6)
      .orderBy("g").collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_keys") == 2000L)
      assert(r.getAs[Long]("n_distinct_exact") == 2000L)
      assert(r.getAs[Long]("registers_used") <= 64L)
      assert(r.getAs[Long]("zeros") ==
        64L - r.getAs[Long]("registers_used"))
      // HLL standard error at m=64 is ~1.04/8 = 13%; allow 3σ.
      assert(math.abs(r.getAs[Long]("err_ppm")) < 400000L,
        s"estimate off by ${r.getAs[Long]("err_ppm")} ppm")
      assert(r.getAs[Long]("merge_register_mismatches") == 0L)
    }
    // merged estimate sees the 3000-key union, so it must exceed
    // every per-group estimate on this overlap layout.
    val merged = rows.head.getAs[Double]("merged_est")
    assert(merged > rows.map(_.getAs[Double]("hll_est")).max)
    assert(math.abs(merged / 3000.0 - 1.0) < 0.4)
  }

  test("hllRegisters/hllFromRegisters: stored-register path equals the direct report") {
    val df = ((1L to 500L).map(i => ("a", s"k$i")) ++
      (400L to 900L).map(i => ("b", s"k$i"))).toDF("g", "k")
    val direct = CardinalityEstimate.hllReport(df, "g", "k", p = 6)
      .collect().map(r => r.getAs[String]("g") ->
        ((r.getAs[Double]("hll_est"), r.getAs[Double]("merged_est"),
          r.getAs[Long]("sum_scaled")))).toMap
    val regs = CardinalityEstimate.hllRegisters(df, "g", "k", p = 6)
    val viaIndex = CardinalityEstimate.hllFromRegisters(regs, "g", p = 6)
      .collect().map(r => r.getAs[String]("g") ->
        ((r.getAs[Double]("hll_est"), r.getAs[Double]("merged_est"),
          r.getAs[Long]("sum_scaled")))).toMap
    assert(viaIndex == direct)
    // register table is bounded: at most m rows per group.
    assert(regs.count() <= 128L)
  }

  test("hllReport: small-range linear counting branch is exact-ish and deterministic") {
    val df = (1L to 10L).map(i => ("g", s"x$i")).toDF("g", "k")
    val r1 = CardinalityEstimate.hllReport(df, "g", "k", p = 6).head()
    val r2 = CardinalityEstimate.hllReport(df, "g", "k", p = 6).head()
    assert(r1 == r2)
    // 10 distinct keys, 64 registers → linear counting applies and is
    // accurate to within a couple of collisions.
    assert(math.abs(r1.getAs[Double]("hll_est") - 10.0) <= 2.0)
    assert(r1.getAs[Long]("merge_register_mismatches") == 0L)
  }
}
