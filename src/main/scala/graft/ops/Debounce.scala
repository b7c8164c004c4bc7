package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event debouncing / burst collapse: within each (entity, kind)
  * stream, consecutive events closer than a tolerance merge into one
  * burst and only the burst's FIRST event survives — duplicate-click
  * suppression, retry-storm collapse, the "N crawler fetches of the
  * same page in a minute are one fetch" rule. The batch twin of a
  * debounce a streaming job would run with keyed state.
  *
  * One lag window per (entity, kind) — gap comparison in integer
  * microseconds, burst numbering as a running sum of new-burst
  * flags — all on a single shuffle of the entity key. Tie order is
  * pinned by the id column so burst boundaries are reproducible.
  */
object Debounce {

  /** Keep the first event of each burst. Adds `burst_id` (1-based
    * per partition) and keeps only burst heads.
    */
  def firstOfBurst(
      df: DataFrame, partCols: Seq[String], timeCol: String,
      tieCol: String, toleranceUs: Long): DataFrame = {
    val w = Window.partitionBy(partCols.map(col): _*)
      .orderBy(col(timeCol), col(tieCol))
    val tUs = unix_micros(col(timeCol).cast("timestamp"))
    val prev = lag(tUs, 1).over(w)
    df
      .withColumn("_new", when(
        prev.isNull || tUs - prev > toleranceUs, 1L).otherwise(0L))
      .withColumn("burst_id", sum("_new").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .where(col("_new") === 1L)
      .drop("_new")
  }
}
