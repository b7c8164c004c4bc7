package graft

import graft.ops.{Concentration, Debounce}
import org.apache.spark.sql.functions._

/** Gini rank-formula arithmetic and debounce burst boundaries on hand
  * cases.
  */
class ConcentrationDebounceSpec extends SparkSpec {
  import spark.implicits._

  test("gini: perfect equality 0, known concentration exact") {
    val eq = Seq(("a", 5L), ("a", 5L), ("a", 5L), ("a", 5L))
      .toDF("g", "x")
    val r1 = Concentration.giniReport(eq, "g", "x").collect()(0)
    assert(r1.getAs[Double]("gini") == 0.0)
    // {1,2,3,4}: G = (2*(1+4+9+16) − 5*10) / (4*10) = 10/40 = 0.25.
    val sk = Seq(("b", 1L), ("b", 2L), ("b", 3L), ("b", 4L)).toDF("g", "x")
    val r2 = Concentration.giniReport(sk, "g", "x").collect()(0)
    assert(r2.getAs[Double]("gini") == 0.25)
    // n=4 → n DIV 10 = 0 top rows → top10_share 0.
    assert(r2.getAs[Double]("top10_share") == 0.0)
  }

  test("gini: top10 share picks the n DIV 10 largest") {
    val df = ((1 to 19).map(i => ("c", 1L)) :+ ("c", 81L)).toDF("g", "x")
    val r = Concentration.giniReport(df, "g", "x").collect()(0)
    // n=20 → top 2 rows: 81 + 1 = 82 of 100.
    assert(r.getAs[Double]("top10_share") == 0.82)
  }

  test("debounce: bursts split strictly beyond tolerance; heads kept") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(sec: Long) = new java.sql.Timestamp(base.getTime + sec * 1000)
    // Gaps: 5s, 10s (== tol, same burst), 11s (> tol, new burst).
    val df = Seq((1L, 1L, ts(0)), (1L, 2L, ts(5)), (1L, 3L, ts(15)),
      (1L, 4L, ts(26)), (2L, 5L, ts(0)))
      .toDF("u", "id", "t")
    val kept = Debounce.firstOfBurst(df, Seq("u"), "t", "id",
        toleranceUs = 10000000L)
      .select("id", "burst_id").as[(Long, Long)].collect().toSeq.sorted
    assert(kept == Seq((1L, 1L), (4L, 2L), (5L, 1L)))
  }
}
