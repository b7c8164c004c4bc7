package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic MERGE (upsert + delete) — the apply step after
  * [[SnapshotDiff]]'s audit: land a change batch onto a base table in
  * one pass, the way a lakehouse `MERGE INTO` does, without a
  * transactional table format. Row semantics are the standard ones:
  * a change row replaces the whole base row for its key (its nulls
  * WIN — an update that nulls a field must stick), a flagged delete
  * removes the key (matched or not — idempotent re-application of the
  * same batch is a no-op), and an unmatched non-delete inserts.
  *
  * Scale shape: ONE co-partitioned full outer join on the key — the
  * change batch shuffles once against the base, no window, no
  * driver-side state; at 100 TB the cost is the join on the (usually
  * tiny, AQE-broadcastable) change batch. Whole-row payloads travel
  * as packed structs so the join carries exactly two columns per
  * side.
  *
  * Contract: `changes` must be key-unique (dedupe/last-wins ordering
  * is the caller's CDC-log concern — a multi-version log collapses
  * with one `row_number` pass BEFORE the merge, where the ordering
  * column lives).
  */
object Merge {

  /** @param deleteCol boolean column on `changes` marking deletes
    *                   (null reads as false); the remaining `changes`
    *                   columns must equal `base`'s.
    * @return the merged table with `base`'s exact schema
    */
  def upsert(
      base: DataFrame, changes: DataFrame, keyCol: String,
      deleteCol: String = "_delete"): DataFrame = {
    val dataCols = base.columns.filterNot(_ == keyCol).toSeq
    require(base.columns.contains(keyCol),
      s"base lacks key column '$keyCol'")
    require(changes.columns.toSet == (base.columns.toSet + deleteCol),
      s"changes must carry base's columns + '$deleteCol'; got " +
        changes.columns.mkString(", "))
    val b = base.select(col(keyCol).as("_k"),
      struct(dataCols.map(col): _*).as("_b"))
    val c = changes.select(col(keyCol).as("_k"),
      struct(dataCols.map(col): _*).as("_c"),
      coalesce(col(deleteCol), lit(false)).as("_d"))
    // _d is non-null exactly when a change row matched; the struct
    // itself can hold legitimate nulls, so the flag is the marker.
    val chosen = when(col("_d").isNotNull, col("_c")).otherwise(col("_b"))
    b.join(c, Seq("_k"), "full_outer")
      .where(coalesce(col("_d"), lit(false)) === false)
      .select(col("_k").as(keyCol) +:
        dataCols.map(n => chosen.getField(n).as(n)): _*)
  }
}
