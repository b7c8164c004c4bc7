package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructField, StructType, TimestampNTZType, TimestampType}

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
  * at exactly `leftTs` matches (`<=` / `>=` inclusive). The attached
  * payload is one WHOLE right row: the carried value is a single
  * `last(struct(ts, payload…), ignoreNulls = true)`, so the matched
  * timestamp and every payload column always come from the same right
  * row even when payload columns are individually null (per-column
  * carries would stitch values across rows). Null-keyed right rows are
  * dropped up front — SQL equality never matches NULL, and the oracle
  * agrees — so null-keyed left rows come back with null payload. Ties
  * (two right rows sharing (key, ts)) resolve to the greatest payload
  * tuple, which ASOF leaves unspecified; de-duplicate the right side
  * first if the distinction matters.
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
    val pay = "_asof_pay" // whole right row (matched ts + payload) as ONE struct
    val mts = matchedTsCol.getOrElse("_asof_mts")
    require(!payload.contains(mts),
      s"matchedTsCol '$mts' collides with a payload column")
    val rightTsType = right.schema(rightTs).dataType
    val payType = StructType(StructField(mts, rightTsType) +:
      payload.map(p => StructField(p, right.schema(p).dataType)))

    // Widen both sides to a common schema: left keeps every column and
    // a NULL payload struct (null as a whole, so `last(ignoreNulls)`
    // skips it); right keeps keys and packs (matched ts, payload…) into
    // one struct. Catalyst column-prunes the nulled slots out of both
    // scans, so the union is not a real width cost. Null-keyed right
    // rows are dropped: SQL equality never matches NULL keys.
    val lSide = left
      .withColumn(ts, col(leftTs))
      .withColumn(tag, lit(1))
      .withColumn(pay, lit(null).cast(payType))
      .select(col(ts) +: col(tag) +: col(pay) +: leftCols.map(col): _*)
    val rSide = right
      .filter(keys.map(col(_).isNotNull).reduce(_ && _))
      .withColumn(ts, col(rightTs))
      .withColumn(tag, lit(0))
      .withColumn(pay, struct(col(rightTs).as(mts) +: payload.map(col): _*))
      .select(col(ts) +: col(tag) +: col(pay) +:
        leftCols.map(c =>
          // keys must survive on right rows — they partition the window
          if (keys.contains(c)) col(c)
          else lit(null).cast(left.schema(c).dataType).as(c)): _*)

    // Backward: ascending time, carry the last right row seen so far.
    // Forward: descending time — the same running-`last` then yields the
    // NEXT right row at-or-after. Right rows (tag 0) sort before left
    // rows at equal ts either way, so exact-ts rights are eligible; the
    // ascending struct tie-break (lexicographic over (ts, payload…))
    // makes `last` pick the greatest payload tuple among same-(key, ts)
    // right rows deterministically.
    val timeOrd = direction match {
      case Backward => col(ts).asc
      case Forward => col(ts).desc
    }
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(timeOrd, col(tag).asc, col(pay).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = lSide.union(rSide)
      .select(col(tag) +:
        last(col(pay), ignoreNulls = true).over(w).as(pay) +:
        leftCols.map(col): _*)
      .filter(col(tag) === 1)
      // Unpack the carried struct: one source row for ALL attached cols.
      .select(col(tag) +: (mts +: payload).map(f => col(pay)(f).as(f)) ++:
        leftCols.map(col): _*)

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
