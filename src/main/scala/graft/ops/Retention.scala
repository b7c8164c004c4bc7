package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** N-day bounce-back retention: of the entities active on day d, how
  * many were active again exactly on day d+N — the day-grain
  * engagement curve (q134's weekly cohort triangle answers the
  * since-first-seen question; this is the rolling per-day one).
  *
  * One distinct (entity, day) pass, then a self-equi-join on
  * (entity, day+N) — shuffle on the entity key, both sides the
  * distinct frame, never raw events. Integer day arithmetic and
  * integer counts; the rate is one floor-ppm division.
  */
object Retention {

  /** @return per base day d (only days with activity): `n_active`,
    *         `n_retained` (active on d AND d+N), `retained_ppm`
    */
  def nDayRetention(
      df: DataFrame, entityCol: String, dayCol: String,
      n: Int): DataFrame = {
    val active = df.select(col(entityCol).as("e"),
        col(dayCol).cast("long").as("d"))
      .where(col("e").isNotNull && col("d").isNotNull).distinct()
    val future = active.select(col("e"),
      (col("d") - lit(n.toLong)).as("d"))
    active.join(future.withColumn("_hit", lit(1L))
        .groupBy("e", "d").agg(max("_hit").as("_hit")),
        Seq("e", "d"), "left")
      .groupBy("d")
      .agg(count(lit(1)).as("n_active"),
        sum(coalesce(col("_hit"), lit(0L))).as("n_retained"))
      .withColumn("retained_ppm",
        expr("(n_retained * 1000000) DIV n_active"))
  }
}
