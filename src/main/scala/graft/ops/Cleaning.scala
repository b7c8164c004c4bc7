package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType}

/** Value-cleaning transforms for "dirty numeric" tracker columns.
  *
  * Reference semantics: GEM trackers mix `"unknown"`, `"not found"`,
  * `">0"`, `"N/A"` into numeric columns, so everything is ingested as
  * string and cleaned deliberately (the solar script's all-text strategy,
  * `solarplants_GEM.R:12-23`, generalized — see SURVEY.md §1).
  */
object Cleaning {

  /** Whole-table value replace — reference `df[df == ">0"] <- "unknown"`
    * (`Coalplants_GEM.R:50`). Applies to every string column; non-string
    * columns can't hold the sentinel and are left untouched.
    *
    * Scale note: pure projection (no shuffle), folds into whole-stage
    * codegen with neighboring expressions.
    */
  def replaceEverywhere(from: String, to: String)(df: DataFrame): DataFrame = {
    val stringCols = df.schema.fields.filter(_.dataType == StringType).map(_.name).toSet
    df.select(df.columns.map { c =>
      if (stringCols(c)) when(col(c) === from, to).otherwise(col(c)).as(c)
      else col(c)
    }.toIndexedSeq: _*)
  }

  /** `as.numeric(s)`-equivalent cast: non-numeric strings → null
    * (`Coalplants_GEM.R:60`). Spark 4 runs ANSI mode by default, where a
    * plain cast THROWS on junk strings — `try_cast` restores R's
    * NA-on-failure semantics.
    */
  def toNumeric(cols: String*)(df: DataFrame): DataFrame =
    cols.foldLeft(df)((d, c) => d.withColumn(c, col(c).try_cast(DoubleType)))

  /** Drop rows whose capacity is unusable — reference
    * `!(cap %in% c("unknown","N/A") | is.na(cap) | cap == 0)`
    * (`GasOilplants_GEM.R:88-92`). Three-valued logic matches R's here:
    * null capacity is dropped by the explicit isNull arm.
    */
  def dropUnusableCapacity(capCol: String, sentinels: Seq[String])(df: DataFrame): DataFrame =
    df.filter(!(col(capCol).isin(sentinels: _*) ||
      col(capCol).isNull || col(capCol) === "0"))
}
