package graft
import graft.queries.GemQueries
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The whole scored surface lives in [[graft.queries.GemQueries.defs]];
  * this object only adapts it to the driver's Map-shaped API.
  */
object SparkEntry {
  /** Flagship query (A2 main rollup, TPC-H-Q1 shape) on sf0.001;
    * driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q14_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    GemQueries.defs.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    GemQueries.defs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
