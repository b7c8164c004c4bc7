package graft

import graft.ops.{ChangePoint, TemporalAntiJoin}
import org.apache.spark.sql.functions._

/** Temporal anti-join window-boundary semantics and CUSUM argmax
  * arithmetic on hand cases.
  */
class TemporalCusumSpec extends SparkSpec {
  import spark.implicits._

  private def ts(us: Long) = new java.sql.Timestamp(us / 1000)

  test("anti-join: (t, t+W] boundary — same-instant no, exactly-W yes") {
    val a = Seq((1L, 10L, ts(0L)), (1L, 11L, ts(5000000L)),
      (2L, 12L, ts(0L))).toDF("u", "id", "t")
    // Responses: u1 at t=0 (same instant as trigger 10 — NOT after),
    // u1 at t=10s (exactly W after trigger 10 → answered; 5s after
    // trigger 11 → answered). u2: response far outside.
    val b = Seq((1L, ts(0L)), (1L, ts(10000000L)), (2L, ts(99000000L)))
      .toDF("u", "t")
    val out = TemporalAntiJoin.unansweredCounts(a, b, "u", "id", "t", "t",
        windowUs = 10000000L)
      .orderBy("e").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((1L, 2L, 0L), (2L, 1L, 1L)))
  }

  test("cusum: step change peaks at the step; uniform series stays flat") {
    // 6 slots: 1,1,1,5,5,5 events → peak deviation at slot 3 (end of
    // the low regime): S_3=3, stat=|3*6-3*18|=36.
    val rows = (1 to 3).flatMap(d => Seq.fill(1)(("g", d.toLong))) ++
      (4 to 6).flatMap(d => Seq.fill(5)(("g", d.toLong)))
    val r = ChangePoint.cusumPeak(rows.toDF("ty", "slot"), "ty", "slot")
      .collect()(0)
    assert(r.getAs[Long]("peak_slot") == 3L)
    assert(r.getAs[Long]("peak_stat") == 36L)
    // Constant series: every deviation 0 → earliest slot wins.
    val flat = (1 to 4).map(d => ("f", d.toLong)).toDF("ty", "slot")
    val rf = ChangePoint.cusumPeak(flat, "ty", "slot").collect()(0)
    assert(rf.getAs[Long]("peak_stat") == 0L)
    assert(rf.getAs[Long]("peak_slot") == 1L)
  }
}
