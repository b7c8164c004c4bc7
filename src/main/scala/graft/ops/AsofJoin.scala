package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, TimestampNTZType, TimestampType}

/** As-of (nearest-timestamp) join — the temporal lookup every event /
  * market / telemetry pipeline needs: for each left row, attach the
  * single right row with the greatest `rightTs <= leftTs` (backward) or
  * smallest `rightTs >= leftTs` (forward) within the same key.
  *
  * Spark has no native as-of join, and the naive formulations collapse
  * at scale: a range join (`l.key = r.key AND r.ts <= l.ts` + window
  * re-rank) materializes every (left, earlier-right) pair — quadratic
  * per key — and a per-key `collect_list` + binary-search UDF caps a
  * key's history at executor memory. This implementation is the
  * union-scan form instead: tag both sides, union, and run ONE window
  * per key ordered by time, carrying the most recent right-side payload
  * forward with `last(_, ignoreNulls = true)`. Cost is a single shuffle
  * of |L| + |R| rows and a per-partition sort — the same shape as a
  * sort-merge join, with no pair blow-up, no per-key memory cap, and
  * whole-stage codegen throughout.
  *
  * Semantics are pinned to DuckDB's `ASOF JOIN` (the q60 oracle):
  * left-outer — unmatched left rows keep null payload — and a right row
  * at exactly `leftTs` matches (`<=` / `>=` inclusive). Ties (two right
  * rows sharing (key, ts)) resolve to the greatest payload tuple, which
  * ASOF leaves unspecified; de-duplicate the right side first if the
  * distinction matters.
  */
object AsofJoin {

  /** Direction of the temporal lookup. */
  sealed trait Direction
  /** Greatest `rightTs <= leftTs` (the common "latest state as of"). */
  case object Backward extends Direction
  /** Smallest `rightTs >= leftTs` (next event after). */
  case object Forward extends Direction

  /** ANSI-safe epoch seconds for gap arithmetic: timestamp(_ntz) casts
    * to double via TIMESTAMP (session tz is UTC); numeric axes cast
    * directly.
    */
  private def seconds(c: Column, dt: DataType): Column = dt match {
    case TimestampType | TimestampNTZType => c.cast("timestamp").cast("double")
    case _ => c.cast("double")
  }

  /** As-of join `left` with `right` on equal `keys` and the nearest
    * `rightTs` relative to `leftTs`.
    *
    * @param payload  right-side columns to attach (must not collide
    *                 with left column names; rename before the call)
    * @param matchedTsCol if set, also emit the matched right timestamp
    *                 under this name (gap analytics); computed
    *                 internally regardless, since [[tolerance]] needs it
    * @param tolerance max gap in SECONDS (timestamp axes) or axis units
    *                 (numeric axes) for a match to count; farther
    *                 matches are nulled out, as if no right row existed
    */
  def join(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String],
      direction: Direction = Backward,
      matchedTsCol: Option[String] = None,
      tolerance: Option[Column] = None): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one equality key")
    require(payload.nonEmpty, "payload must name at least one right column")
    val leftCols = left.columns.toSeq
    require(payload.forall(p => !leftCols.contains(p)),
      s"payload collides with left columns: rename first ($payload vs $leftCols)")

    val ts = "_asof_ts" // unified event-time axis for the union scan
    val tag = "_asof_tag" // 0 = right, 1 = left; right sorts first at ties
    val mts = matchedTsCol.getOrElse("_asof_mts")
    val rightTsType = right.schema(rightTs).dataType

    // Widen both sides to a common schema: left keeps every column and
    // nulls the payload; right keeps keys + payload and nulls the rest.
    // Catalyst column-prunes the nulled slots out of both scans, so the
    // union is not a real width cost.
    val lSide = left
      .withColumn(ts, col(leftTs))
      .withColumn(tag, lit(1))
      .withColumn(mts, lit(null).cast(rightTsType))
      .select(col(ts) +: col(tag) +: col(mts) +:
        (leftCols.map(col) ++ payload.map(p =>
          lit(null).cast(right.schema(p).dataType).as(p))): _*)
    val rSide = right
      .withColumn(ts, col(rightTs))
      .withColumn(tag, lit(0))
      .withColumn(mts, col(rightTs))
      .select(col(ts) +: col(tag) +: col(mts) +:
        (leftCols.map(c =>
          // keys must survive on right rows — they partition the window
          if (keys.contains(c)) col(c)
          else lit(null).cast(left.schema(c).dataType).as(c)) ++
          payload.map(col)): _*)

    // Backward: ascending time, carry the last right row seen so far.
    // Forward: descending time — the same running-`last` then yields the
    // NEXT right row at-or-after. Right rows (tag 0) sort before left
    // rows at equal ts either way, so exact-ts rights are eligible; the
    // ascending payload tie-break makes `last` pick the greatest payload
    // tuple among same-(key, ts) right rows deterministically.
    val timeOrd = direction match {
      case Backward => col(ts).asc
      case Forward => col(ts).desc
    }
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(timeOrd +: col(tag).asc +: payload.map(col(_).asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = lSide.union(rSide)
      .select(
        col(tag) +:
          last(col(mts), ignoreNulls = true).over(w).as(mts) +:
          (leftCols.map(col) ++
            payload.map(p => last(col(p), ignoreNulls = true).over(w).as(p))): _*)
      .filter(col(tag) === 1)

    // Tolerance: null out matches farther than the bound — the matched
    // timestamp is the arbiter.
    val bounded = tolerance match {
      case None => carried
      case Some(tol) =>
        val gap = direction match {
          case Backward =>
            seconds(col(leftTs), left.schema(leftTs).dataType) -
              seconds(col(mts), rightTsType)
          case Forward =>
            seconds(col(mts), rightTsType) -
              seconds(col(leftTs), left.schema(leftTs).dataType)
        }
        val ok = col(mts).isNotNull && gap <= tol.cast("double")
        payload.foldLeft(
          carried.withColumn(mts, when(ok, col(mts)))) { (df, p) =>
          df.withColumn(p, when(ok, col(p)))
        }
    }

    bounded.select((leftCols ++ matchedTsCol.toSeq ++ payload).map(col): _*)
  }
}
