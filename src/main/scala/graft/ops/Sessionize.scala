package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch gap-based sessionization: a new session starts wherever the
  * gap from the previous event exceeds the idle threshold — the
  * deterministic batch twin of `EventStream.sessionize`'s
  * processing-time-timeout state machine, and the grain every
  * session-scoped analysis (per-session funnels, durations,
  * conversion) joins against.
  *
  * One lag window per entity (the Debounce/Intervals skeleton, but
  * every row keeps its session id instead of only heads surviving).
  * Integer-µs gap compares; tie order pinned by the id column.
  */
object Sessionize {

  /** Adds `session_id` (1-based per entity). */
  def gapSessions(
      df: DataFrame, partCols: Seq[String], timeCol: String,
      tieCol: String, gapUs: Long): DataFrame = {
    val w = Window.partitionBy(partCols.map(col): _*)
      .orderBy(col(timeCol), col(tieCol))
    val tUs = unix_micros(col(timeCol).cast("timestamp"))
    val prev = lag(tUs, 1).over(w)
    df
      .withColumn("_new",
        when(prev.isNull || tUs - prev > gapUs, 1L).otherwise(0L))
      .withColumn("session_id", sum("_new").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_new")
  }

  /** Session dwell/bounce report on top of [[gapSessions]]: per day
    * (of session start) the session count, the single-event BOUNCE
    * share, and dwell-time percentiles — the web-analytics trio that
    * says whether engagement moved or just traffic did.
    *
    * One session-grain aggregate (the gapSessions windows are
    * already partitioned per entity); dwell is exact integer ms; the
    * day frame is calendar-bounded.
    *
    * @return per day: `day`, `n_sessions`, `bounce_ppm`,
    *         `p50_dwell_s`, `p90_dwell_s` (round 3; bounces count as
    *         0 dwell)
    */
  def dwellStats(
      df: DataFrame, partCols: Seq[String], timeCol: String,
      tieCol: String, gapUs: Long): DataFrame = {
    val sess = gapSessions(df, partCols, timeCol, tieCol, gapUs)
      .withColumn("_tu", unix_micros(col(timeCol).cast("timestamp")))
      .groupBy((partCols.map(col) :+ col("session_id")): _*)
      .agg(count(lit(1)).as("n_ev"), min("_tu").as("_s"),
        max("_tu").as("_e"))
      .withColumn("dwell_ms", expr("(_e - _s) DIV 1000"))
      .withColumn("day", expr("_s DIV 86400000000"))
    sess.groupBy("day")
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("n_ev") === 1, 1L).otherwise(0L)).as("_b"),
        expr("percentile(dwell_ms, 0.5D)").as("_p50"),
        expr("percentile(dwell_ms, 0.9D)").as("_p90"))
      .select(col("day"), col("n_sessions"),
        expr("(_b * 1000000) DIV n_sessions").as("bounce_ppm"),
        round(col("_p50") / lit(1e3), 3).as("p50_dwell_s"),
        round(col("_p90") / lit(1e3), 3).as("p90_dwell_s"))
  }

  /** Session entry→exit matrix: how sessions begin vs how they end
    * (the web-analytics landing/exit-page readout, at event-type
    * grain): per (first type, last type) the session count and share.
    * Single-event sessions sit on the diagonal by construction.
    *
    * One min/max-by aggregate at session grain ([[gapSessions]]'s
    * windows are already entity-partitioned); the matrix frame is
    * |types|²-sized.
    *
    * @return per (entry, exit): `n_sessions`, `share_ppm`
    */
  def entryExitMatrix(
      df: DataFrame, partCols: Seq[String], timeCol: String,
      tieCol: String, typeCol: String, gapUs: Long): DataFrame = {
    val sess = gapSessions(df, partCols, timeCol, tieCol, gapUs)
      .withColumn("_tu", unix_micros(col(timeCol).cast("timestamp")))
    // min_by/max_by on the (time, tie) pair: deterministic ends even
    // for same-microsecond ties.
    val perSession = sess
      .groupBy((partCols.map(col) :+ col("session_id")): _*)
      .agg(
        expr(s"min_by($typeCol, struct(_tu, $tieCol))").as("entry_type"),
        expr(s"max_by($typeCol, struct(_tu, $tieCol))").as("exit_type"))
    val m = perSession.groupBy("entry_type", "exit_type")
      .agg(count(lit(1)).as("n_sessions"))
    m.withColumn("_tot", sum("n_sessions").over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .select(col("entry_type"), col("exit_type"), col("n_sessions"),
        expr("(n_sessions * 1000000) DIV _tot").as("share_ppm"))
  }
}
