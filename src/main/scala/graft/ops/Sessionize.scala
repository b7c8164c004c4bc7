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
}
