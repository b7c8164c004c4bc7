package graft

import graft.ops.{CoOccurrence, RollingDistinct}
import org.apache.spark.sql.functions._

/** Rolling-distinct sketch algebra (sub-k windows are EXACT) and
  * item-cosine arithmetic on hand cases.
  */
class RollingCoocSpec extends SparkSpec {
  import spark.implicits._

  test("rolling distinct: sub-k windows exact; window slides correctly") {
    // Group g: day 1 users {1,2}, day 2 {2,3}, day 5 {9}.
    // 3-day windows: d1 → {1,2}=2; d2 → {1,2,3}=3; d5 → {9}=1 (days
    // 1-2 fall out). Under k=64 the KMV union IS the exact set.
    val df = Seq(("g", 1L, 1L), ("g", 1L, 2L), ("g", 2L, 2L),
      ("g", 2L, 3L), ("g", 5L, 9L)).toDF("ty", "day", "uid")
    val out = RollingDistinct.trailingDistinct(df, "ty", "day", "uid",
        windowDays = 3, k = 64)
      .orderBy("d")
      .select("d", "n_exact", "n_est")
      .as[(Long, Long, Double)].collect().toSeq
    assert(out == Seq((1L, 2L, 2.0), (2L, 3L, 3.0), (5L, 1L, 1.0)))
  }

  test("item cosine: counts at distinct-entity grain; exact normalization") {
    // Entities: e1 {a,b}, e2 {a,b}, e3 {a} (a twice — dedup), e4 {b,c}.
    val df = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "a"), (4L, "b"), (4L, "c")).toDF("e", "item")
    val out = CoOccurrence.itemCosine(df, "e", "item", minBoth = 1)
      .orderBy("item_a", "item_b")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq
    // n_a=3, n_b=3, n_c=1; (a,b)=2, (b,c)=1; (a,c)=0 → absent.
    val c_ab = BigDecimal(2.0 / 3.0).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    val c_bc = BigDecimal(1.0 / math.sqrt(3.0)).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out == Seq(("a", "b", 3L, 3L, 2L, c_ab),
      ("b", "c", 3L, 1L, 1L, c_bc)))
  }
}
