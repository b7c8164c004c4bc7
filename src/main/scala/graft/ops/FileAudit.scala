package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Small-files compaction report — the lakehouse hygiene audit: rows
  * per physical file via `input_file_name()`, per-table file counts,
  * balance, and the compaction target. Thousands of tiny files per
  * partition is the classic silent killer (task-per-file scheduling,
  * NameNode/listing pressure, broken data-skipping); this report is
  * the evidence a compaction job acts on.
  *
  * One narrow scan per table (the count aggregates by file name
  * map-side); the report frame is file-count-sized.
  */
object FileAudit {

  /** @param targetRows desired rows per compacted file
    * @return one row per table: `table_name`, `n_files`, `n_rows`,
    *         `min_rows`, `max_rows`, `median_rows` (round 1),
    *         `imbalance_ppm` (max/mean, integer), `target_files`
    *         (⌈rows/targetRows⌉)
    */
  def smallFilesReport(
      tables: Seq[(String, DataFrame)], targetRows: Long): DataFrame =
    tables.map { case (name, df) =>
      df.select(input_file_name().as("f"))
        .groupBy("f").agg(count(lit(1)).as("n"))
        .agg(count(lit(1)).as("n_files"), sum("n").as("n_rows"),
          min("n").as("min_rows"), max("n").as("max_rows"),
          expr("percentile(n, 0.5D)").as("_med"))
        .select(lit(name).as("table_name"), col("n_files"),
          col("n_rows"), col("min_rows"), col("max_rows"),
          round(col("_med"), 1).as("median_rows"),
          expr("(max_rows * n_files * 1000000) DIV n_rows")
            .as("imbalance_ppm"),
          expr(s"(n_rows + ${targetRows - 1}L) DIV ${targetRows}L")
            .as("target_files"))
    }.reduce(_ unionByName _)
}
