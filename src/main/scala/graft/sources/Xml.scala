package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** XML source/sink via Spark 4's NATIVE xml data source (the spark-xml
  * package donated into core) — the enterprise-interchange format the
  * reference's ecosystem (ETL hand-offs, regulatory feeds) still
  * speaks. Same posture as `Jsonl`/`Orc`: explicit read schema (never
  * inference — entity-escaped text must round-trip
  * character-for-character into the declared types), one `rowTag`
  * element per record.
  *
  * Scale shape: like JSONL, XML is splittable per row element under
  * the multiLine=false default writer layout; reads prune columns at
  * the parser. Still a text format — Parquet/ORC remain the canonical
  * lake layout, XML is for the boundary.
  */
object Xml {

  def write(df: DataFrame, path: String, rowTag: String = "row"): Unit =
    df.write.mode("overwrite").option("rowTag", rowTag)
      .format("xml").save(path)

  def read(spark: SparkSession, path: String, schema: StructType,
      rowTag: String = "row"): DataFrame =
    spark.read.schema(schema).option("rowTag", rowTag)
      .format("xml").load(path)
}
