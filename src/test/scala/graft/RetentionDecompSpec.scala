package graft

import graft.ops.{ChangeDecomposition, Retention}
import org.apache.spark.sql.functions._

/** Retention join semantics and the Δ ≡ volume + rate identity on
  * hand cases.
  */
class RetentionDecompSpec extends SparkSpec {
  import spark.implicits._

  test("retention: exact-N match only; duplicate activity collapses") {
    // u1 active day 1 and 8 (retained at N=7); u2 active day 1 twice
    // (one distinct) and day 7 (NOT 8 → not retained); day 8 itself
    // has u1 active with no day-15 activity.
    val df = Seq((1L, 1L), (1L, 8L), (2L, 1L), (2L, 1L), (2L, 7L))
      .toDF("u", "day")
    val out = Retention.nDayRetention(df, "u", "day", n = 7)
      .orderBy("d").select("d", "n_active", "n_retained", "retained_ppm")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L, 1L, 500000L), (7L, 1L, 0L, 0L),
      (8L, 1L, 0L, 0L)))
  }

  test("decomposition: delta == volume + rate per segment; edge segments") {
    // seg A: n1=2 c1=200, n2=3 c2=450 → r1=100; volume=(3-2)*100/100=1;
    // rate=3*(150-100)/100=1.5; delta=250 cents = 2.5 = 1 + 1.5.
    // seg B only in period 2 → all volume. seg C only in period 1 →
    // volume = -c1.
    val df = Seq(("A", 0, 100L), ("A", 0, 100L),
      ("A", 1, 150L), ("A", 1, 150L), ("A", 1, 150L),
      ("B", 1, 500L), ("C", 0, 300L)).toDF("seg", "p", "cents")
    val out = ChangeDecomposition.volumeRate(df, "seg", "p", "cents")
      .orderBy("seg").collect()
      .map(r => (r.getString(0), r.getAs[Long]("delta_cents"),
        r.getAs[Double]("volume_effect"), r.getAs[Double]("rate_effect")))
      .toSeq
    assert(out == Seq(("A", 250L, 1.0, 1.5), ("B", 500L, 5.0, 0.0),
      ("C", -300L, -3.0, 0.0)))
    out.foreach { case (_, d, v, r) =>
      assert(math.abs(d / 100.0 - (v + r)) < 1e-9)
    }
  }
}
