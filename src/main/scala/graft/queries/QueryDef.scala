package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One catalog entry: a Spark query over the driver's synthetic tables
  * plus (when SQL-expressible) the equivalent DuckDB oracle SQL. The
  * driver hash-compares the two at sf0.01 — column names/types and
  * value rounding must agree EXACTLY, which is why each oracle string
  * lives next to its Spark code.
  *
  * Determinism contract: every query ends in an ORDER BY over its
  * output key columns (and so does its oracle), so the comparison never
  * depends on engine-internal row order.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])
