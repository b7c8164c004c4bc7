package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Calendar-seasonality profile + anomaly gate: per (group, slot)
  * — slot = day-of-week here — the average daily volume, and per day
  * a deviation flag against ITS OWN slot's average (Monday compares
  * to Mondays). The "is today's crawl volume weird" monitor that a
  * global mean can't express when weekday/weekend cycles dominate.
  *
  * Exactness: daily volumes are integer counts; the "day exceeds
  * k× its slot mean" compare is cross-multiplied into pure integer
  * arithmetic (`day_n · slot_days > k · slot_total`), so the flag
  * never touches floating point. Shares are one division at the
  * end. Two aggregates, both map-side combinable; windows run on
  * the (groups × slots) frame.
  */
object Seasonal {

  /** @param kNum/kDen anomaly threshold k = kNum/kDen as integers
    *                  (e.g. 3/2 → flag days above 1.5× slot mean)
    * @return per (group, dow 1..7): `n_days`, `total`, `mean_daily`
    *         (round 4), `share` of group volume (round 6),
    *         `n_anomaly_days` (exact integer compare)
    */
  def dowProfile(
      df: DataFrame, groupCol: String, dayCol: String,
      kNum: Long, kDen: Long): DataFrame = {
    val daily = df
      .select(col(groupCol).as("g"), col(dayCol).cast("long").as("d"))
      .groupBy("g", "d")
      .agg(count(lit(1)).as("day_n"))
      // Epoch day 0 = 1970-01-01 (Thursday = ISO dow 4).
      .withColumn("dow", (pmod(col("d") + lit(3L), lit(7L)) + lit(1L))
        .cast("int"))
    val slot = daily.groupBy("g", "dow")
      .agg(count(lit(1)).as("n_days"), sum("day_n").as("total"))
    val flagged = daily.join(slot, Seq("g", "dow"))
      .withColumn("_anom",
        when(col("day_n") * col("n_days") * lit(kDen) >
          lit(kNum) * col("total"), 1L).otherwise(0L))
      .groupBy("g", "dow")
      .agg(sum("_anom").as("n_anomaly_days"))
    val wG = Window.partitionBy("g")
    slot.join(flagged, Seq("g", "dow"))
      .withColumn("_g_total", sum("total").over(wG))
      .select(col("g"), col("dow"), col("n_days"), col("total"),
        round(col("total").cast("double") / col("n_days").cast("double"), 4)
          .as("mean_daily"),
        round(col("total").cast("double") / col("_g_total").cast("double"), 6)
          .as("share"),
        col("n_anomaly_days"))
  }
}
