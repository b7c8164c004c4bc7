package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Ownership split + capacity allocation — the one compound domain
  * operator in the reference (SURVEY.md §2.8 G4).
  *
  * Input: an `Owner` column like `"Name [59%]; Name2 [26%]"` or
  * `"Enel SpA [100%]"`, and a numeric capacity column. Output: one row
  * per owner with `Company`, `Ownership` (fraction) and
  * `Capacity_allocated = capacity * share`.
  *
  * Two reference variants:
  *  - Strict (`Coalplants_GEM.R:104-119`): a missing `[NN%]` share
  *    yields a null allocation (the reference's silent-capacity-loss
  *    quirk — preserved, see SURVEY.md §5).
  *  - EqualShareDefault (`Hydroplants_GEM.R:159-202`): missing shares
  *    default to 1/n over the owners of the SAME source row, via a
  *    count-over-partition window on a per-row provenance id.
  *
  * Spark-first shape: `explode_outer(split(...))` + `regexp_extract` —
  * all built-in, codegen'd expressions, and NO shuffle in either mode:
  * the equal-share denominator `1/n()` is the owner count of the SAME
  * source row, which is `size(split_array)` computed BEFORE the
  * explode. (An earlier formulation counted exploded rows with a
  * window over a unit-id provenance key — a full shuffle+sort of the
  * exploded frame, and unlike R's `row_number()` row_id it would
  * over-count when the raw data carries duplicate unit ids.)
  */
object Ownership {

  sealed trait Mode
  case object Strict extends Mode
  case object EqualShareDefault extends Mode

  def split(ownerCol: String, capacityCol: String, mode: Mode)(df: DataFrame): DataFrame = {
    // explode_outer: a null Owner keeps its row (null Company) — R's
    // separate_rows keeps NA rows; plain explode would drop them.
    val exploded = df
      .withColumn("_owners_arr", functions.split(col(ownerCol), ";\\s*"))
      // n per SOURCE row, before exploding (null owner → one null row)
      .withColumn("_n_owners", coalesce(size(col("_owners_arr")), lit(1)))
      .withColumn("_owner_raw", explode_outer(col("_owners_arr")))
      .withColumn("Company", trim(regexp_extract(col("_owner_raw"), "^([^\\[]+)", 1)))
      // nullif: R str_extract gives NA on no-match, Spark gives "" —
      // normalize (SURVEY.md §2.9 X1).
      .withColumn("Company", when(col("Company") === "", null).otherwise(col("Company")))
      // nullif before cast: regexp_extract gives "" on no-match and
      // Spark 4's ANSI cast throws on '' → DOUBLE (R gives NA).
      .withColumn("_share_pct",
        nullif(regexp_extract(col("_owner_raw"), "(\\d+)%", 1), lit("")).cast(DoubleType))
    val withShare = mode match {
      case Strict =>
        exploded.withColumn("Ownership", col("_share_pct") / 100.0)
      case EqualShareDefault =>
        exploded.withColumn("Ownership",
          coalesce(col("_share_pct") / 100.0, lit(1.0) / col("_n_owners")))
    }
    withShare
      .withColumn("Capacity_allocated", col(capacityCol) * col("Ownership"))
      .drop("_owners_arr", "_owner_raw", "_share_pct", "_n_owners")
  }

  /** X4 display-string variant — reference `Hydroplants_GEM.R:159-202`:
    * owners WITHOUT a provided share get their computed equal share
    * appended as a display suffix (`"Name [33.33%]"`, R paste0 drops a
    * trailing ".0"), and the share suffix is then str_remove'd with the
    * decimal-aware pattern — the observable output is the cleaned Owner
    * string plus share/allocation columns.
    *
    * The provided-share regex here is the strict bracketed form
    * (`\[(\d+)%\]`, integer-only — `"[12.5%]"` is NOT a provided share,
    * exactly like the reference's lookaround `(?<=\[)\d+(?=%\])`).
    */
  def splitWithDisplay(ownerCol: String, capacityCol: String)(df: DataFrame): DataFrame = {
    val exploded = df
      .withColumn("_owners_arr", functions.split(col(ownerCol), ";\\s*"))
      .withColumn("_n_owners", coalesce(size(col("_owners_arr")), lit(1)))
      .withColumn("_owner_raw", explode_outer(col("_owners_arr")))
      .withColumn("Company",
        when(trim(regexp_extract(col("_owner_raw"), "^([^\\[]+)", 1)) === "", null)
          .otherwise(trim(regexp_extract(col("_owner_raw"), "^([^\\[]+)", 1))))
      .withColumn("_provided",
        nullif(regexp_extract(col("_owner_raw"), "\\[(\\d+)%\\]", 1), lit("")))
    val share = coalesce(col("_provided").cast(DoubleType) / 100.0,
      lit(1.0) / col("_n_owners"))
    val pct = round(share * 100.0, 2)
    // R paste0(50) prints "50", not "50.0" — strip the integral case.
    val pctStr = when(pct === floor(pct), pct.cast("long").cast("string"))
      .otherwise(pct.cast("string"))
    val display = when(col("_provided").isNull && col("Company").isNotNull,
      concat(col("Company"), lit(" ["), pctStr, lit("%]")))
      .otherwise(col("_owner_raw"))
    exploded
      .withColumn("Ownership", share)
      .withColumn("Capacity_allocated", col(capacityCol) * share)
      .withColumn(ownerCol,
        regexp_replace(display, " ?\\[[0-9]+(\\.[0-9]+)?%\\]", ""))
      .drop("_owners_arr", "_owner_raw", "_provided", "_n_owners")
  }
}
