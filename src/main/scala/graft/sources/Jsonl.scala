package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Newline-delimited JSON (JSONL) source/sink — the lingua franca of
  * LLM corpus interchange (one document object per line). Spark's
  * native json datasource splits and parses in parallel like any text
  * format; the wrapper pins the conventions that matter at scale:
  *
  *  - Reads REQUIRE an explicit schema. Schema inference is a full
  *    extra pass over the data before the real scan — at 100 TB that
  *    doubles the job. (`PERMISSIVE` + `_corrupt_record` is available
  *    via `extraOptions` when ingesting wild data.)
  *  - Writes go to a directory of per-partition part files (the only
  *    form that writes in parallel); gzip-compress by default since
  *    JSONL's redundancy costs ~5× on disk otherwise.
  */
object Jsonl {

  def write(df: DataFrame, path: String,
      compression: String = "gzip"): Unit =
    df.write.mode("overwrite")
      .option("compression", compression)
      .json(path)

  def read(spark: SparkSession, path: String, schema: StructType,
      extraOptions: Map[String, String] = Map.empty): DataFrame =
    spark.read.options(extraOptions).schema(schema).json(path)
}
