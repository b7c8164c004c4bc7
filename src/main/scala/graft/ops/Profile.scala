package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column profiler — the data-quality summary every ingest step runs
  * before trusting a new drop: per column, row/non-null/distinct
  * counts and the numeric min/max. One output row per column, long
  * format, so downstream checks (null-rate regressions, cardinality
  * drift) are plain filters over the profile.
  *
  * Scale shape: ONE aggregation pass over the table produces a single
  * wide row (all measures are map-side combinable; the multi-column
  * exact `count(DISTINCT)` plans as Catalyst's Expand — |cols|×
  * row expansion into one shuffle). The wide-row → long-format melt
  * happens on that single row, not on data. At 100 TB swap
  * `count_distinct` for `approx_count_distinct` at the marked line —
  * the exact form is kept here so the DuckDB oracle can replay it.
  */
object Profile {

  private val numericTypes: Set[DataType] = Set(ByteType, ShortType,
    IntegerType, LongType, FloatType, DoubleType)

  /** Profile `cols` of `df`: (col_name, n_rows, n_nonnull, n_distinct,
    * min_num, max_num) per column — min/max as 4-decimal doubles for
    * numeric columns (incl. DecimalType), null otherwise.
    */
  def summary(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val schema = df.schema
    def isNum(c: String) = schema(c).dataType match {
      case _: DecimalType => true
      case t => numericTypes.contains(t)
    }
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"_n_$c"),
        // 100 TB: approx_count_distinct(col(c)) here
        count_distinct(col(c)).as(s"_d_$c")) ++
        (if (isNum(c))
          Seq(round(min(col(c)).cast("double"), 4).as(s"_mn_$c"),
            round(max(col(c)).cast("double"), 4).as(s"_mx_$c"))
        else Nil)
    }
    val wide = df.agg(count(lit(1)).as("_rows"), aggs: _*)
    val entries = cols.map { c =>
      struct(lit(c).as("col_name"), col("_rows").as("n_rows"),
        col(s"_n_$c").as("n_nonnull"), col(s"_d_$c").as("n_distinct"),
        (if (isNum(c)) col(s"_mn_$c") else lit(null).cast("double"))
          .as("min_num"),
        (if (isNum(c)) col(s"_mx_$c") else lit(null).cast("double"))
          .as("max_num"))
    }
    wide.select(explode(array(entries: _*)).as("p")).select("p.*")
  }

  /** DuckDB oracle twin of [[summary]] for the same (col, numeric?)
    * list — kept adjacent so the two cannot drift.
    */
  def duckSummarySql(table: String, cols: Seq[(String, Boolean)]): String =
    cols.map { case (c, num) =>
      val mn = if (num) s"round(CAST(min($c) AS DOUBLE), 4)"
        else "CAST(NULL AS DOUBLE)"
      val mx = if (num) s"round(CAST(max($c) AS DOUBLE), 4)"
        else "CAST(NULL AS DOUBLE)"
      s"""SELECT '$c' AS col_name, count(*) AS n_rows,
         |  count($c) AS n_nonnull, count(DISTINCT $c) AS n_distinct,
         |  $mn AS min_num, $mx AS max_num FROM $table""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
}
