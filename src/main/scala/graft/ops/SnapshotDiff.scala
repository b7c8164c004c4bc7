package graft.ops

import graft.functions.Hashing
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff — the CDC / slowly-changing-dimension primitive:
  * classify every key across two versions of a table as `added` /
  * `removed` / `changed` / `unchanged`, the audit step before
  * publishing a refreshed corpus or dimension (what changed since the
  * last release, and how much).
  *
  * Scale shape: each side reduces to `(key, fingerprint)` IN THE SCAN
  * PROJECTION — one long per row crosses the shuffle, never the wide
  * row — and the compare is a single co-partitioned full outer join
  * on the key. The fingerprint is [[Hashing.portableHash]] over the
  * content columns with explicit control-char sentinels (`\x02`
  * separates columns, `\x01 NULL` marks a null — `concat_ws` alone
  * would silently collapse null vs empty), so the oracle reproduces
  * every verdict bit-for-bit.
  */
object SnapshotDiff {

  private[ops] def fingerprint(contentCols: Seq[String]) =
    Hashing.portableHash(concat_ws("\u0002",
      contentCols.map(c =>
        coalesce(col(c).cast("string"), lit("\u0001NULL"))): _*))

  /** DuckDB twin of [[fingerprint]], kept adjacent. */
  def duckFingerprint(contentCols: Seq[String]): String =
    Hashing.duckPortableHash(contentCols
      .map(c => s"coalesce(CAST($c AS VARCHAR), chr(1) || 'NULL')")
      .mkString(" || chr(2) || "))

  /** @return one row per key present in either version: `keyCol`,
    *         `status` in {added, removed, changed, unchanged}
    */
  def diff(
      oldDf: DataFrame, newDf: DataFrame, keyCol: String,
      contentCols: Seq[String]): DataFrame = {
    require(contentCols.nonEmpty, "diff needs content columns")
    val o = oldDf.select(col(keyCol).as("_k"),
      fingerprint(contentCols).as("_ofp"))
    val n = newDf.select(col(keyCol).as("_k"),
      fingerprint(contentCols).as("_nfp"))
    o.join(n, Seq("_k"), "full_outer")
      .select(col("_k").as(keyCol),
        when(col("_ofp").isNull, "added")
          .when(col("_nfp").isNull, "removed")
          .when(col("_ofp") =!= col("_nfp"), "changed")
          .otherwise("unchanged").as("status"))
  }
}
