package graft

import graft.ops.Cleaning
import graft.sources.Csv
import graft.streaming.EventStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamingCsvSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def events = Seq(
    (1L, ts("2024-01-01 00:10:00"), 7L, "view", 1.0),
    (2L, ts("2024-01-01 00:50:00"), 7L, "view", 2.0),
    (3L, ts("2024-01-01 01:10:00"), 8L, "click", 4.0)
  ).toDF("event_id", "ts", "user_id", "event_type", "value")

  test("windowedCounts batch parity: tumbling hour buckets") {
    val out = EventStream.windowedCounts(events)
      .orderBy("window_start", "event_type").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("n") == 2 && out(0).getAs[Double]("total_value") == 3.0)
    assert(out(1).getAs[Long]("n") == 1 && out(1).getAs[Double]("total_value") == 4.0)
  }

  test("sessionize merges per-user state in batch mode") {
    val out = EventStream.sessionize(spark, events).orderBy("user_id").collect()
    assert(out.length == 2)
    val u7 = out(0)
    assert(u7.getAs[Long]("n_events") == 2)
    assert(u7.getAs[Double]("total_value") == 3.0)
    assert(u7.getAs[Timestamp]("first_ts") == ts("2024-01-01 00:10:00"))
    assert(u7.getAs[Timestamp]("last_ts") == ts("2024-01-01 00:50:00"))
  }

  test("CSV round-trip with sep=';' preserves values, nulls and types") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv_spec").toString
    val src = Seq((1L, "a;b", 1.5), (2L, null.asInstanceOf[String], -2.0))
      .toDF("id", "s", "x")
    Csv.write(src, dir, sep = ";")
    val back = Csv.read(spark, dir, sep = ";", schema = Some(
      org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, s STRING, x DOUBLE")))
      .orderBy("id").collect()
    assert(back(0).getString(1) == "a;b") // quoting survives the sep
    assert(back(0).getDouble(2) == 1.5)
    assert(back(1).isNullAt(1))
    assert(back(1).getDouble(2) == -2.0)
  }

  test("graft session normalizes events.ts to µs timestamp_ntz (any file vintage)") {
    val df = graft.core.Graft.table(spark, "/root/testdata/sf0.001", "events")
    assert(df.schema("ts").dataType.typeName == "timestamp_ntz")
    assert(df.count() > 0)
  }
}
