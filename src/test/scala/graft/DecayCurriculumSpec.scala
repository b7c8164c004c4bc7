package graft

import graft.ops.Attribution
import org.apache.spark.sql.functions._

/** Fixture for time-decay attribution (books-balance + exact split). */
class DecayCurriculumSpec extends SparkSpec {
  import spark.implicits._

  test("decayReport splits by 2^-dt with exact remainder handling") {
    def ts(day: Int, h: Int = 0) = f"2024-01-0$day%d $h%02d:00:00"
    val ev = Seq(
      (1L, 1L, "click", 0.0, ts(1)),    // 2 days before purchase
      (2L, 1L, "view", 0.0, ts(2)),     // 1 day before
      (3L, 1L, "purchase", 10.0, ts(3)),
      (4L, 2L, "purchase", 7.0, ts(2))  // untouched
    ).toDF("event_id", "user_id", "event_type", "value", "s")
      .withColumn("ts", col("s").cast("timestamp")).drop("s")
    val r = Attribution.decayReport(ev, "event_id", "user_id", "ts",
        "event_type", "purchase", Seq("click", "view"), "value",
        lookbackDays = 3, halfLifeDays = 1.0)
      .orderBy("channel")
      .select("channel", "n_conversions", "decay_cents")
      .as[(String, Long, Long)].collect().toSeq
    // w(click) = 2^-2 → 250000µ, w(view) = 2^-1 → 500000µ:
    // base 333/666, remainder 1 to the FIRST touch (click).
    assert(r === Seq(("click", 1L, 334L), ("direct", 1L, 700L),
      ("view", 1L, 666L)))
    assert(r.map(_._3).sum === 1700L, "the books must balance")
  }
}
