package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Physical-layout helpers: the write-side levers that remove shuffles
  * from the read side at 100 TB.
  *
  *  - `writeBucketed`: hash-bucketed table layout. Two tables bucketed
  *    by the same key into the same bucket count join with NO exchange
  *    on either side (Catalyst proves co-partitioning from the table
  *    spec) — the right layout for fact↔fact joins too big to
  *    broadcast, e.g. tracker assets ↔ ownership rows keyed by unit id.
  *  - `writePartitioned`: directory partitioning for coarse,
  *    low-cardinality predicates (year, technology) — partition pruning
  *    turns a 100 TB scan into just the referenced directories.
  */
object Layout {

  def writeBucketed(
      df: DataFrame, table: String, bucketCol: String, buckets: Int = 32,
      sortCol: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite").bucketBy(buckets, bucketCol)
    sortCol.fold(w)(w.sortBy(_)).format("parquet").saveAsTable(table)
  }

  /** [[writeBucketed]] with idempotent replacement across SESSIONS:
    * drops a same-name catalog entry AND any orphaned warehouse
    * directory a previous (crashed or separate-catalog) run left
    * behind — `saveAsTable` refuses to create a managed table over an
    * existing location, and `DROP TABLE IF EXISTS` cannot see a
    * directory the current in-memory catalog never registered.
    */
  private def dropWithLocation(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
  }

  def replaceBucketed(
      spark: SparkSession, df: DataFrame, table: String, bucketCol: String,
      buckets: Int = 32, sortCol: Option[String] = None): Unit = {
    dropWithLocation(spark, table)
    writeBucketed(df, table, bucketCol, buckets, sortCol)
  }

  /** Cross-session-idempotent plain (unbucketed) managed-table write —
    * same orphan-location cleanup as [[replaceBucketed]].
    */
  def replaceTable(spark: SparkSession, df: DataFrame, table: String): Unit = {
    dropWithLocation(spark, table)
    df.write.mode("overwrite").format("parquet").saveAsTable(table)
  }

  /** Append into an EXISTING bucketed table with the same bucket
    * spec — the ingest half of a persisted index: each batch's rows
    * land in the matching buckets, so probes keep joining with no
    * index-side exchange as the index grows.
    */
  def appendBucketed(
      df: DataFrame, table: String, bucketCol: String,
      buckets: Int = 32): Unit =
    df.write.mode("append").bucketBy(buckets, bucketCol)
      .format("parquet").saveAsTable(table)

  /** Replay compaction for an append-only bucketed index: rewrite the
    * table as its DISTINCT row set, keeping the bucket layout. This is
    * the operational answer to foreachBatch's at-least-once appends
    * (`EventStream.incrementalDedupIngest` / `incrementalVectorIngest`
    * doc contract): a crashed batch that re-appended index rows is
    * healed offline by one compaction pass, instead of every probe
    * paying a `distinct` forever. The distinct result is materialized
    * (localCheckpoint) BEFORE the source table is dropped, so a
    * failure mid-rewrite cannot lose the index.
    */
  def compactBucketed(
      spark: SparkSession, table: String, bucketCol: String,
      buckets: Int = 32): Unit = {
    val clean = spark.table(table).distinct().localCheckpoint(true)
    replaceBucketed(spark, clean, table, bucketCol, buckets)
    spark.catalog.refreshTable(table)
  }

  /** Targeted deletion from a bucketed managed table — the
    * right-to-be-forgotten pass over the persisted index family
    * (MinHash bands/toks, IVF codes, BM25 postings): rewrite the
    * table MINUS the rows whose `keyCol` is in `keys`, keeping the
    * bucket layout. Plain parquet cannot delete in place, so this is
    * the honest full-rewrite form (a transactional format would make
    * it a metadata operation); like [[compactBucketed]], the
    * surviving rows materialize before the source drops.
    */
  def forgetKeys(
      spark: SparkSession, table: String, bucketCol: String,
      keyCol: String, keys: DataFrame, buckets: Int = 32): Unit = {
    val kept = spark.table(table)
      .join(keys.select(keys.columns.head).toDF(keyCol),
        Seq(keyCol), "left_anti")
      .localCheckpoint(true)
    replaceBucketed(spark, kept, table, bucketCol, buckets)
    spark.catalog.refreshTable(table)
  }

  def writePartitioned(
      df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
