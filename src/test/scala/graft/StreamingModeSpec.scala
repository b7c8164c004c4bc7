package graft

import graft.streaming.EventStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

/** True streaming-mode coverage (StreamingCsvSpec covers batch parity):
  * windowedCounts through a MemoryStream micro-batch run, and the
  * sessionize state machine including the idle-timeout eviction branch
  * (the ADVICE.md r2 fix) via TestGroupState.
  */
class StreamingModeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("windowedCounts runs as a real stream with watermarked state") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val events = input.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = EventStream.windowedCounts(events)
      .writeStream.format("memory").queryName("wc_test")
      .outputMode(OutputMode.Complete()).start()
    try {
      input.addData(
        (1L, ts("2024-01-01 00:10:00"), 7L, "view", 1.0),
        (2L, ts("2024-01-01 00:20:00"), 7L, "view", 2.0),
        (3L, ts("2024-01-01 01:10:00"), 8L, "click", 4.0))
      q.processAllAvailable()
      val rows = spark.table("wc_test").orderBy("window_start", "event_type").collect()
      assert(rows.length == 2)
      assert(rows(0).getAs[Long]("n") == 2 && rows(0).getAs[Double]("total_value") == 3.0)
      assert(rows(1).getAs[Long]("n") == 1)
    } finally {
      q.stop()
      spark.sql("DROP VIEW IF EXISTS wc_test")
    }
  }

  test("streamFromDir treats a parquet directory as an unbounded stream") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_src").toString
    Seq((1L, ts("2024-01-01 00:10:00"), 7L, "view", 1.0, "{}"),
      (2L, ts("2024-01-01 00:20:00"), 8L, "click", 2.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(dir)
    val q = EventStream.windowedCounts(EventStream.streamFromDir(spark, dir))
      .writeStream.format("memory").queryName("dir_test")
      .outputMode(OutputMode.Complete()).start()
    try {
      q.processAllAvailable()
      val rows = spark.table("dir_test").orderBy("event_type").collect()
      assert(rows.length == 2)
      assert(rows.map(_.getAs[Long]("n")).sum == 2)
    } finally {
      q.stop()
      spark.sql("DROP VIEW IF EXISTS dir_test")
    }
  }

  // A real-stream sessionize drive is deliberately absent: with a
  // ProcessingTimeTimeout armed, the engine re-fires micro-batches for
  // timeout bookkeeping, so neither processAllAvailable nor
  // Trigger.AvailableNow reaches quiescence in a test harness. The
  // streaming mechanics (state merge + eviction arithmetic) are covered
  // below and in StreamingCsvSpec's batch-parity run.
  test("mergeSession merges new events into prior state") {
    import EventStream.{Event, SessionAgg}
    val prev = SessionAgg(7L, 2, 3.5, ts("2024-01-01 00:10:00"), ts("2024-01-01 00:30:00"))
    val merged = EventStream.mergeSession(7L,
      Seq(Event(3L, ts("2024-01-01 00:40:00"), 7L, "click", 0.5)), Some(prev))
    assert(merged.n_events == 3)
    assert(merged.total_value == 4.0)
    assert(merged.first_ts == ts("2024-01-01 00:10:00"))
    assert(merged.last_ts == ts("2024-01-01 00:40:00"))
  }
}
