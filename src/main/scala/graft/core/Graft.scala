package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session factory + table loading for the graft engine.
  *
  * Design notes (100 TB posture): the session is configured for AQE
  * (runtime partition coalescing + skew-join splitting), a shuffle
  * partition count that matches the local harness (overridden on a real
  * cluster via spark-submit conf), and UTC so timestamp semantics match
  * the DuckDB oracle and any downstream warehouse.
  */
object Graft {

  /** Build (or get) a session tuned for the local[32] harness.
    * On a real cluster every one of these is overridable from
    * spark-submit; nothing here hard-codes local-only behavior except
    * the master fallback.
    */
  def session(master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]"): SparkSession = {
    val b = SparkSession
      .builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Load one of the driver's synthetic tables from an sf directory.
    * Plain parquet scan — Catalyst pushes filters/pruning into it.
    */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}
