package graft

import graft.ops.{Intervals, JoinDiagnostics}
import org.apache.spark.sql.functions._

/** Island merge semantics (overlap, touch, gap-of-one) and join-size
  * forecast arithmetic on hand cases.
  */
class IntervalsJoinDiagSpec extends SparkSpec {
  import spark.implicits._

  test("coalesce: overlap and touch merge; gap of one day splits") {
    // [1,3] [3,5] overlap → merge. [5,6] touches (prev end 5 ≥ 6-1)
    // → merge. [8,9]: gap (6 → 8 leaves day 7 empty) → new island.
    val df = Seq(("k", 1L, 3L), ("k", 3L, 5L), ("k", 6L, 6L),
      ("k", 8L, 9L)).toDF("g", "s", "e")
    val out = Intervals.coalesceIntervals(df, "g", "s", "e")
      .orderBy("island_start")
      .select("island_start", "island_end", "n_merged")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 6L, 3L), (8L, 9L, 1L)))
  }

  test("coalesce: contained interval does not extend the island") {
    // [1,10] then [2,3] (contained) then [11,12] (touching 10) →
    // one island [1,12].
    val df = Seq(("k", 1L, 10L), ("k", 2L, 3L), ("k", 11L, 12L))
      .toDF("g", "s", "e")
    val out = Intervals.coalesceIntervals(df, "g", "s", "e").collect()
    assert(out.length == 1)
  }

  test("gap profile: counts and longest-gap on a holey series") {
    // Days 1,2,5,9: gaps of 2 (3-4) and 3 (6-8).
    val df = Seq(("u", 1L), ("u", 2L), ("u", 5L), ("u", 9L), ("u", 5L))
      .toDF("k", "d")
    val r = Intervals.gapProfile(df, "k", "d").collect()(0)
    assert((r.getAs[Long]("n_slots"), r.getAs[Long]("n_gaps"),
      r.getAs[Long]("longest_gap")) == ((4L, 2L, 3L)))
  }

  test("join forecast: sum of per-key products, share math exact") {
    val l = Seq(1, 1, 1, 2).map(k => (k.toLong, "x")).toDF("k", "p")
    val r = Seq(1, 2, 2).map(k => (k.toLong, "y")).toDF("k", "p")
    val out = JoinDiagnostics.predictJoinSize(l, "k", r, "k", topK = 5)
      .orderBy("rank").collect()
    // key 1: 3*1=3; key 2: 1*2=2; total 5 = actual join size.
    assert(out.map(_.getAs[Long]("out_rows")).toSeq == Seq(3L, 2L))
    assert(out.head.getAs[Long]("total_out_rows") == 5L)
    val actual = l.join(r, Seq("k")).count()
    assert(actual == 5L)
    assert(out.head.getAs[Long]("top_share_ppm") == 600000L)
  }
}
