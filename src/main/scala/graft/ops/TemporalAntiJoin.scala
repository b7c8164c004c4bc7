package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Temporal anti-join — "A happened and B did NOT follow within T":
  * abandonment detection (clicks never converting), SLA breaches
  * (request without response), broken pipelines (upload without
  * ingest ack). The time-bounded cousin of q142's key anti-join, and
  * the negative of q60's as-of join.
  *
  * Shape: equi-join on the entity key with the time bound evaluated
  * per pair, collapsed back to the trigger grain with a max-hit
  * aggregate — one shuffle on the key, per-key blow-up bounded by
  * per-entity event counts (the q84 interval-join skeleton). Gap
  * compares are integer microseconds.
  */
object TemporalAntiJoin {

  /** Per entity: how many trigger events, and how many had NO
    * response in `(t_a, t_a + windowUs]`.
    *
    * @param a (entityCol, idCol, tACol) trigger events — idCol keeps
    *          the trigger grain even under exact timestamp ties
    * @param b (entityCol, tBCol) response events
    */
  def unansweredCounts(
      a: DataFrame, b: DataFrame, entityCol: String, idCol: String,
      tACol: String, tBCol: String, windowUs: Long): DataFrame = {
    val left = a.select(col(entityCol).as("e"), col(idCol).as("id"),
      unix_micros(col(tACol).cast("timestamp")).as("ta"))
    val right = b.select(col(entityCol).as("e"),
      unix_micros(col(tBCol).cast("timestamp")).as("tb"))
    left.join(right, Seq("e"), "left")
      .withColumn("_hit",
        when(col("tb").isNotNull && col("tb") > col("ta") &&
          col("tb") <= col("ta") + lit(windowUs), 1L).otherwise(0L))
      .groupBy("e", "id")
      .agg(max("_hit").as("_answered"))
      .groupBy("e")
      .agg(count(lit(1)).as("n_triggers"),
        sum(lit(1L) - col("_answered")).as("n_unanswered"))
  }
}
