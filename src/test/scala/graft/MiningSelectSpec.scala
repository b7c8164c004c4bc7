package graft

import graft.ops.{Allocate, Itemsets, Outliers, Pareto}
import org.apache.spark.sql.functions._

/** Edge semantics for the round-11 mining/selection tier: association
  * rules (duplicate-item baskets, Apriori pruning, the exact
  * confidence/lift arithmetic), MAD's breakdown advantage over the
  * z-score, Pareto tie handling, and largest-remainder's Σ=budget
  * invariant with deterministic tie-breaks.
  */
class MiningSelectSpec extends SparkSpec {
  import spark.implicits._

  test("itemsets: duplicate items don't inflate support; math is exact") {
    // 4 baskets; {a,b} together in 2; a in 3 (one basket has a twice),
    // b in 2, c in 1 (infrequent at minSupport=2 → no pair with c).
    val df = Seq(
      (1, "a"), (1, "a"), (1, "b"),
      (2, "a"), (2, "b"), (2, "c"),
      (3, "a"),
      (4, "b")
    ).toDF("basket", "item")
    // Basket 4 has b only... adjust: b appears in baskets 1,2,4 → n=3.
    val out = Itemsets.rules(df, "basket", "item", minSupport = 2)
      .orderBy("antecedent", "consequent").collect()
    val ab = out.map(r => ((r.getString(0), r.getString(1)),
      (r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(6), r.getDouble(7)))).toMap
    // n_both(a,b)=2 despite the duplicate a in basket 1.
    assert(ab(("a", "b")) == ((2L, 3L, 3L, round6(2.0 / 3), round6(8.0 / 9))))
    assert(ab(("b", "a")) == ((2L, 3L, 3L, round6(2.0 / 3), round6(8.0 / 9))))
    // c is infrequent: no rule mentions it.
    assert(!out.exists(r => r.getString(0) == "c" || r.getString(1) == "c"))
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("outliers: one wild value can't move the median/MAD gate") {
    // 9 well-behaved values + 1 enormous one. Mean/stddev would let
    // the outlier hide (z < 3 because it inflates sigma itself);
    // median/MAD flags exactly that row.
    val vals = Seq(10.0, 11.0, 12.0, 10.5, 11.5, 9.5, 10.0, 12.5, 9.0,
      1e6)
    val df = vals.map(("g", _)).toDF("g", "v")
    val r = Outliers.madSummary(df, "g", "v", k = 3.0).collect()(0)
    assert(r.getAs[Long]("n") == 10L)
    assert(math.abs(r.getAs[Double]("med") - 10.75) < 1e-9)
    assert(r.getAs[Long]("n_outliers") == 1L)
  }

  test("pareto: strict-in-one dominates; full ties all survive") {
    val df = Seq(
      // (size, price): (5, 10) dominates (5, 11) [tie size, worse
      // price] and (4, 10) [worse size, tie price].
      ("g", 1L, 5, 10.0), ("g", 2L, 5, 11.0), ("g", 3L, 4, 10.0),
      // (3, 2) survives: nothing is both bigger and cheaper.
      ("g", 4L, 3, 2.0),
      // exact duplicates of the frontier point: both stay.
      ("g", 5L, 5, 10.0)
    ).toDF("g", "id", "size", "price")
    val ids = Pareto.frontier2d(df, "g", "size", "price")
      .select("id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 4L, 5L))
  }

  test("allocate: seats sum to budget; remainder ties break by key") {
    // Weights 1,1,1 with budget 10: floor 3 each, 1 seat left →
    // lowest key wins the tie.
    val df = Seq(("a", 1L), ("b", 1L), ("c", 1L)).toDF("g", "w")
    val out = Allocate.largestRemainder(df, "g", "w", budget = 10L)
      .orderBy("g").select("g", "seats").as[(String, Long)].collect().toSeq
    assert(out == Seq(("a", 4L), ("b", 3L), ("c", 3L)))
    assert(out.map(_._2).sum == 10L)
    // Zero-weight group: 0 seats, budget conserved.
    val out2 = Allocate.largestRemainder(
      (Seq(("a", 7L), ("b", 0L), ("c", 3L))).toDF("g", "w"),
      "g", "w", budget = 7L)
      .select("g", "seats").as[(String, Long)].collect().toMap
    assert(out2("b") == 0L && out2.values.sum == 7L)
  }
}
