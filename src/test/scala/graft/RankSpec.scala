package graft

import graft.ops.Rank
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Rank.globalRowNumber / Rank.prefixSum — exact parity with the
  * single-task window forms they replace (row-for-row on totally
  * ordered keys), plus the plan property that motivates them: no
  * single-partition exchange anywhere in the heavy path.
  */
class RankSpec extends SparkSpec {
  import spark.implicits._

  private def windowRank(
      df: org.apache.spark.sql.DataFrame,
      order: Seq[org.apache.spark.sql.Column]): Map[String, Long] =
    df.withColumn("_wrk", row_number().over(Window.orderBy(order: _*)))
      .select(col("k").cast("string"), col("_wrk").cast("long"))
      .as[(String, Long)].collect().toMap

  test("globalRowNumber matches row_number() on a mixed asc/desc long+string key") {
    val df = Seq(
      ("a", 3L, 0.25), ("b", 1L, 0.5), ("c", 3L, 0.5),
      ("d", 2L, -1.5), ("e", 1L, 0.25), ("f", 2L, 2.0))
      .toDF("k", "v", "p").repartition(5)
    val got = Rank.globalRowNumber(
        df, Seq("v" -> true, "p" -> false, "k" -> true), "rk")
      .select(col("k"), col("rk")).as[(String, Long)].collect().toMap
    val want = windowRank(df, Seq(col("v").asc, col("p").desc, col("k").asc))
    assert(got == want)
  }

  test("globalRowNumber null placement: asc nulls first, desc nulls last (Spark parity)") {
    val df = Seq(("a", Some(2L)), ("b", None), ("c", Some(1L)))
      .toDF("k", "v").repartition(3)
    val asc = Rank.globalRowNumber(df, Seq("v" -> true, "k" -> true), "rk")
      .select(col("k"), col("rk")).as[(String, Long)].collect().toMap
    assert(asc == windowRank(df, Seq(col("v").asc, col("k").asc)))
    val desc = Rank.globalRowNumber(df, Seq("v" -> false, "k" -> true), "rk")
      .select(col("k"), col("rk")).as[(String, Long)].collect().toMap
    assert(desc == windowRank(df, Seq(col("v").desc, col("k").asc)))
  }

  test("globalRowNumber ranks are a dense 1..n permutation under ties") {
    val df = (1 to 97).map(i => (i.toLong, i % 3)).toDF("id", "t")
      .repartition(8)
    // Tie-heavy key WITHOUT a full tie-break: ranks within a tie block
    // are an arbitrary permutation, but still dense and block-aligned.
    val got = Rank.globalRowNumber(df, Seq("t" -> true), "rk")
      .select(col("t").cast("long"), col("rk")).as[(Long, Long)]
      .collect().sortBy(_._2)
    assert(got.map(_._2).toSeq == (1L to 97L))
    assert(got.map(_._1).toSeq == got.map(_._1).toSeq.sorted)
  }

  test("prefixSum matches the running-sum window exactly") {
    val df = (1 to 200).map(i => (i.toLong, (i * 37 % 11).toLong))
      .toDF("id", "v").repartition(7)
    val ranked = Rank.globalRowNumber(df, Seq("id" -> true), "rk")
    val got = Rank.prefixSum(ranked, "rk", "v", "cum", bucketSize = 16L)
      .select(col("rk"), col("cum")).as[(Long, Long)].collect().toMap
    val want = ranked.withColumn("cum", sum("v").over(
        Window.orderBy("rk")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("rk"), col("cum")).as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("prefixSum plans its heavy window partitioned by bucket, bucket frame broadcast") {
    val df = (1 to 50).map(i => (i.toLong, 1L)).toDF("id", "v")
    val ranked = Rank.globalRowNumber(df, Seq("id" -> true), "rk")
    val plan = Rank.prefixSum(ranked, "rk", "v", "cum", bucketSize = 8L)
      .queryExecution.executedPlan
    val unpart = PlanShapeSpec.unpartitionedWindows(plan)
    // Exactly one empty-partition window: the prefix over the TINY
    // bucket frame; the per-row running sum must partition by bucket.
    assert(unpart.size == 1, s"want 1 bucket-frame window:\n$plan")
    assert(plan.toString.contains("BroadcastExchange"),
      s"bucket offsets must broadcast back:\n$plan")
  }

  test("groupedQuantiles: exact disc order statistics per group; nulls excluded") {
    import spark.implicits._
    // group a: values 10..100 step 10 (n=10); group b: 1..5 (n=5)
    // plus a null that must not count.
    val rows = (1 to 10).map(i => ("a", Some(i * 10.0), i.toLong)) ++
      (1 to 5).map(i => ("b", Some(i.toDouble), 100L + i)) :+
      (("b", None: Option[Double], 200L))
    val df = rows.toDF("g", "v", "id")
    val got = Rank.groupedQuantiles(df, "g", "v", "id",
        Seq(0, 500, 900, 1000))
      .collect().map(r => (r.getAs[String]("g"),
        r.getAs[Int]("q_permil")) ->
        ((r.getAs[Long]("n"), r.getAs[Double]("v")))).toMap
    // a: n=10 → p50 rank = 500*9/1000+1 = 5 → 50; p90 rank 9 → 90;
    // p0 rank 1 → 10; p100 rank 10 → 100.
    assert(got(("a", 0)) == ((10L, 10.0)))
    assert(got(("a", 500)) == ((10L, 50.0)))
    assert(got(("a", 900)) == ((10L, 90.0)))
    assert(got(("a", 1000)) == ((10L, 100.0)))
    // b: n=5 (null excluded) → p50 rank = 3 → 3.0.
    assert(got(("b", 500)) == ((5L, 3.0)))
    assert(got(("b", 1000)) == ((5L, 5.0)))
    assert(got.size == 8)
  }
}
