package graft

import graft.ops.{IntervalJoin, Normalize, Sampling}
import org.apache.spark.sql.functions._

/** Edge semantics for the round-8 range/shard operators: bucketed
  * interval join, rank-based tiers, deterministic shuffle shards.
  */
class RangeShardSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("pointInInterval: inclusive bounds, cross-bucket spans, no dups") {
    val intervals = Seq(
      (1L, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:10:00")),
      (2L, ts("2024-01-01 00:09:00"), ts("2024-01-01 00:25:00"))
    ).toDF("ivl_id", "s", "e")
    val points = Seq(
      (10L, ts("2024-01-01 00:00:00")), // on interval-1 start
      (11L, ts("2024-01-01 00:10:00")), // on interval-1 end, inside 2
      (12L, ts("2024-01-01 00:24:59")), // inside 2 only (last bucket)
      (13L, ts("2024-01-01 00:30:00")) // outside both
    ).toDF("p_id", "p")
    val got = IntervalJoin.pointInInterval(
        intervals, points, "s", "e", "p", bucketSec = 600L)
      .select("ivl_id", "p_id").as[(Long, Long)].collect().sorted
    assert(got.toSeq == Seq((1L, 10L), (1L, 11L), (2L, 11L), (2L, 12L)))
    assert(got.length == got.distinct.length, "one row per matching pair")
  }

  test("pointInInterval: keys restrict matches; collisions rejected") {
    val intervals = Seq((1L, "u1", ts("2024-01-01 00:00:00"),
      ts("2024-01-01 01:00:00"))).toDF("ivl_id", "k", "s", "e")
    val points = Seq(("u1", 10L, ts("2024-01-01 00:30:00")),
      ("u2", 11L, ts("2024-01-01 00:30:00"))).toDF("k", "p_id", "p")
    val got = IntervalJoin.pointInInterval(intervals, points,
        "s", "e", "p", bucketSec = 600L, keys = Seq("k"))
      .select("p_id").as[Long].collect().toSeq
    assert(got == Seq(10L), "other-key point excluded")
    intercept[IllegalArgumentException] {
      IntervalJoin.pointInInterval(
        intervals.withColumnRenamed("ivl_id", "p_id"), points, "s", "e", "p")
    }
  }

  test("ntileBy: near-equal runs, larger tiles first, tie-break pins order") {
    val df = (1L to 7L).map(i => (i, "g", 10L)).toDF("id", "g", "v")
    val got = Normalize.ntileBy(df, 3, "v", Seq("g"), tieBreak = col("id"))
      .orderBy("id").select("tier").as[Int].collect().toSeq
    // 7 rows into 3 tiles → 3/2/2; all values equal, so id order decides
    assert(got == Seq(1, 1, 1, 2, 2, 3, 3))
  }

  test("tierByCuts: equal values share a tier, boundaries stay low") {
    // group g: values 1..8 → quartile cuts (rounded) at 2.75, 4.5, 6.25
    val df = (1L to 8L).map(v => ("g", v)).toDF("grp", "v")
    val got = Normalize.tierByCuts(df, 4, "v", Seq("grp"))
      .orderBy("v").select("tier").as[Int].collect().toSeq
    assert(got == Seq(1, 1, 2, 2, 3, 3, 4, 4), s"got $got")
    // all-equal group: one tier for everyone (ntile would split ranks)
    val eq = Seq.fill(6)(("h", 5L)).toDF("grp", "v")
    val tiers = Normalize.tierByCuts(eq, 4, "v", Seq("grp"))
      .select("tier").as[Int].collect().toSet
    assert(tiers == Set(1), "value ties never straddle tiers")
  }

  test("shuffleShards: a permutation, stable, shard = rank div size") {
    val df = (1L to 100L).map(i => (i, s"s$i")).toDF("doc_id", "source")
    val out = Sampling.shuffleShards(df, "doc_id", shardSize = 16L)
    val rows = out.select("doc_id", "rank", "shard")
      .as[(Long, Long, Long)].collect()
    assert(rows.map(_._2).sorted.toSeq == (0L until 100L), "ranks 0..n-1")
    assert(rows.forall { case (_, r, s) => s == r / 16 }, "shard math")
    val again = Sampling.shuffleShards(
      df.repartition(7), "doc_id", shardSize = 16L)
      .select("doc_id", "rank").as[(Long, Long)].collect().toMap
    assert(rows.map(r => r._1 -> r._2).toMap == again,
      "permutation survives re-partitioning")
    val sortedByRank = rows.sortBy(_._2).map(_._1).toSeq
    assert(sortedByRank != (1L to 100L).toSeq, "order is actually shuffled")
  }

  test("shuffleShards: null key fails fast with the contract, not an NPE") {
    val df = Seq(Some(1L), None, Some(3L)).toDF("doc_id")
    val e = intercept[org.apache.spark.SparkException] {
      Sampling.shuffleShards(df, "doc_id", shardSize = 2L).count()
    }
    assert(e.getMessage.contains("non-null 'doc_id'") ||
      Option(e.getCause).exists(_.getMessage.contains("non-null 'doc_id'")),
      s"expected the shuffleShards contract in: ${e.getMessage}")
  }
}
