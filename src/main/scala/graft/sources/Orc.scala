package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** ORC source/sink — the second columnar format next to parquet, native
  * to Spark (no external connector). Same scale posture as the parquet
  * scan: splittable stripes, predicate pushdown into stripe/row-group
  * indexes (`spark.sql.orc.filterPushdown` is on by default), column
  * pruning from the read schema, and vectorized decoding — so a
  * 100 TB ORC lake reads with the same plan shape `.explain` shows for
  * parquet (`PushedFilters`, `ReadSchema`).
  *
  * Why it earns a wrapper: warehouses fed by Hive/Trino commonly hand
  * over ORC, and "switch the scan format without touching the query"
  * is exactly the seam a lakehouse engine must keep thin. Timestamps
  * survive the round-trip as written (Spark 4 maps `timestamp_ntz` to
  * ORC's tz-less timestamp), which the q152 oracle hash-checks.
  */
object Orc {

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Directory-of-parts sink (the distributed shape); zlib-compressed
    * stripes by default, matching the ecosystem's on-disk convention.
    */
  def write(df: DataFrame, path: String,
      compression: String = "zlib"): Unit =
    df.write.mode("overwrite")
      .option("compression", compression)
      .orc(path)
}
