package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV source & sink (SURVEY.md §2.1 S2/S3) — every reference script
  * reads/writes CSV (`TotalData_GEM.R:6-16`, `Coalplants_GEM.R:229`),
  * including the `sep=";"` Climate-Trace variant (`TotalData_GEM.R:65`).
  *
  * Scale notes: Spark's CSV reader splits large files by range and
  * parallelizes across executors; an explicit schema avoids the
  * full-file inference pass (inference = one extra scan of 100 TB, so
  * callers on big data MUST pass one — `inferSchema` is only the
  * ergonomic default for small dims). `permissive` mode gives R's
  * read.csv forgiveness (bad rows → nulls, not job failure).
  */
object Csv {

  def read(
      spark: SparkSession, path: String, sep: String = ",",
      header: Boolean = true, schema: Option[StructType] = None): DataFrame = {
    val base = spark.read
      .option("sep", sep)
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      // R read.csv treats "NA" and empty as missing
      .option("nullValue", "")
      .option("emptyValue", "")
    schema.fold(base.option("inferSchema", "true"))(base.schema)
      .csv(path)
  }

  /** Directory-of-parts sink (the distributed shape). `coalesce(1)` only
    * when a single file is demanded — that serializes the write through
    * one task and is a deliberate small-data-only escape hatch.
    */
  def write(
      df: DataFrame, path: String, sep: String = ",",
      header: Boolean = true, singleFile: Boolean = false): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write
      .option("sep", sep)
      .option("header", header.toString)
      .mode("overwrite")
      .csv(path)
  }
}
