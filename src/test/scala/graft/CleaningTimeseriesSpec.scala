package graft

import graft.ops.{Cleaning, Timeseries}
import org.apache.spark.sql.functions._

class CleaningTimeseriesSpec extends SparkSpec {
  import spark.implicits._

  test("toNumeric: junk strings → null (R as.numeric), numerics survive") {
    val df = Seq("12.5", "unknown", null, "-3").toDF("v")
      .transform(Cleaning.toNumeric("v"))
    assert(df.collect().map(r => Option(r.get(0))).toSeq ==
      Seq(Some(12.5), None, None, Some(-3.0)))
  }

  test("replaceEverywhere hits every string column, leaves others") {
    val df = Seq((">0", ">0", 1.0)).toDF("a", "b", "x")
      .transform(Cleaning.replaceEverywhere(">0", "unknown"))
    val r = df.collect().head
    assert(r.getString(0) == "unknown" && r.getString(1) == "unknown" && r.getDouble(2) == 1.0)
  }

  test("dropUnusableCapacity drops sentinels, nulls and zero") {
    val df = Seq("10", "unknown", "N/A", null, "0", "5.5").toDF("cap")
      .transform(Cleaning.dropUnusableCapacity("cap", Seq("unknown", "N/A", "not found")))
    assert(df.collect().map(_.getString(0)).toSeq == Seq("10", "5.5"))
  }

  test("expandYears: zero before start and FROM retirement year on (reference rule)") {
    val df = Seq(("u", 2025.0, 2030.0, 10.0)).toDF("id", "start", "retire", "cap")
      .transform(Timeseries.expandYears("cap", "start", Some("retire"), from = 2023, to = 2032))
    val by = df.select("year", "capacity").collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(by(2024) == 0.0)  // before start
    assert(by(2025) == 10.0) // start year
    assert(by(2029) == 10.0) // last active year
    assert(by(2030) == 0.0)  // retirement year zeroes (>= semantics)
  }

  test("expandYears: null bounds pass capacity through all years") {
    val df = Seq(("u", null.asInstanceOf[java.lang.Double],
      null.asInstanceOf[java.lang.Double], 7.0)).toDF("id", "start", "retire", "cap")
      .transform(Timeseries.expandYears("cap", "start", Some("retire"), from = 2023, to = 2025))
    assert(df.select("capacity").collect().forall(_.getDouble(0) == 7.0))
  }

  test("rollupCapacity: all-null group sums to 0.0 (R na.rm parity)") {
    val df = Seq(("g", null.asInstanceOf[java.lang.Double])).toDF("k", "capacity")
      .transform(Timeseries.rollupCapacity(Seq("k")))
    assert(df.collect().head.getDouble(1) == 0.0)
  }
}
