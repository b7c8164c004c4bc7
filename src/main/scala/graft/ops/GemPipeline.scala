package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** The parameterized per-tracker wrangle pipeline. All eight reference
  * scripts (`Coalplants_GEM.R` … `bioenergyplants_GEM.R`) are ONE
  * pipeline differing only in configuration (SURVEY.md §0) — source
  * columns, status whitelist, start-year policy, ownership-split mode,
  * technology constant.
  *
  * Every step is a lazy `DataFrame => DataFrame`; nothing materializes
  * until the sink. At 100 TB the plan is: parquet scan (pruned to the
  * configured columns, status filter pushed down) → narrow cleans →
  * one broadcast join (coords) → explode → window (split mode v2 only)
  * → explode (years) → partial+final hash agg. Exactly one wide shuffle
  * (the rollup) plus the optional window shuffle.
  */
object GemPipeline {

  /** Start-year handling: coal drops unknown-start rows
    * (`Coalplants_GEM.R:46-47`); hydro imputes 2030 for under-construction
    * and 2024 otherwise (`Hydroplants_GEM.R:102-107`).
    */
  sealed trait StartYearPolicy
  case object DropUnknown extends StartYearPolicy
  final case class Impute(construction: Int = 2030, other: Int = 2024) extends StartYearPolicy

  final case class TrackerConfig(
      technology: String,
      unitIdCol: String,
      locationIdCol: String,
      ownerCol: String,
      capacityCol: String,
      statusCol: String,
      startYearCol: String,
      retireYearCol: Option[String],
      statusWhitelist: Seq[String],
      startYearPolicy: StartYearPolicy,
      ownershipMode: Ownership.Mode,
      groupKeys: Seq[String]
  )

  /** Full per-tracker pipeline, steps 4-14 of the canonical template
    * (SURVEY.md §0). Input: the raw all-string tracker frame.
    */
  def wrangle(cfg: TrackerConfig)(raw: DataFrame): DataFrame = {
    val statusFiltered = raw
      .filter(col(cfg.statusCol).isin(cfg.statusWhitelist: _*))
      .transform(Cleaning.replaceEverywhere(">0", "unknown"))
      .transform(Cleaning.dropUnusableCapacity(cfg.capacityCol, Seq("unknown", "N/A", "not found")))

    val startYearHandled = cfg.startYearPolicy match {
      case DropUnknown =>
        statusFiltered.filter(
          !(col(cfg.startYearCol).isin("unknown", "not found") || col(cfg.startYearCol).isNull))
      case Impute(construction, other) =>
        statusFiltered.withColumn(
          cfg.startYearCol,
          when(col(cfg.startYearCol).isin("unknown", "not found") || col(cfg.startYearCol).isNull,
            when(col(cfg.statusCol) === "construction", lit(construction.toString))
              .otherwise(lit(other.toString)))
            .otherwise(col(cfg.startYearCol)))
    }

    startYearHandled
      .transform(Cleaning.toNumeric(cfg.capacityCol, cfg.startYearCol))
      .transform(Coordinates.canonicalize(cfg.locationIdCol, "Latitude", "Longitude"))
      .transform(Ownership.split(cfg.ownerCol, cfg.capacityCol, cfg.ownershipMode,
        rowKeyCols = Seq(cfg.unitIdCol)))
      .filter(col(cfg.unitIdCol).isNotNull)
      .transform(Timeseries.expandYears("Capacity_allocated", cfg.startYearCol, cfg.retireYearCol))
      .transform(Timeseries.rollupCapacity(cfg.groupKeys ++ Seq("Company", "year")))
      .withColumn("technology", lit(cfg.technology))
  }

  /** Deterministic TFL company-id assignment — reference
    * `TotalData_GEM.R:21-34` draws seeded random 8-digit ids; opaque ids
    * only need format + uniqueness + referential integrity (SURVEY.md
    * §2.9 X13), so we derive them from the row's rank in the sorted
    * distinct-name dimension: reproducible on any cluster, no RNG state.
    *
    * Scale shape: a partition-LESS `Window.orderBy(name)` would funnel
    * every distinct company through one task (the r2 verdict's worst
    * scale-killer); instead we distribute the sort (`sortBy`) and number
    * rows with `zipWithIndex` — per-partition offsets, no single-task
    * stage. The join back is left to AQE (the dim has no size stats;
    * AQE broadcast-converts it at runtime when small).
    */
  def assignCompanyIds(nameCol: String)(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ranked = df.select(col(nameCol)).na.drop().distinct().as[String]
      .rdd.sortBy(identity).zipWithIndex()
      .map { case (name, idx) => (name, f"TFL${idx + 1 + 10000000L}%08d") }
    val dim = spark.createDataFrame(ranked).toDF(nameCol, "company_id")
    df.join(dim, Seq(nameCol), "left")
  }

  /** Climate-Trace emission-factor enrichment — reference
    * `TotalData_GEM.R:65-135`: mean factor per (technology, country),
    * global unweighted mean-of-means per technology as fallback, then a
    * two-level left join: country-specific factor if present, else the
    * global one. Both dims are tiny → broadcast joins.
    */
  def emissionFactorJoin(
      factors: DataFrame, // columns: technology, country_iso2, emissions_factor
      techCol: String = "technology",
      countryCol: String = "country_iso2"
  )(df: DataFrame): DataFrame = {
    val perCountry = factors
      .groupBy(col(techCol), col(countryCol))
      .agg(avg("emissions_factor").as("ef_country"))
    val global = perCountry
      .groupBy(col(techCol))
      .agg(avg("ef_country").as("ef_global"))
    df.join(broadcast(perCountry), Seq(techCol, countryCol), "left")
      .join(broadcast(global), Seq(techCol), "left")
      .withColumn("emission_factor", coalesce(col("ef_country"), col("ef_global")))
      .drop("ef_country", "ef_global")
  }

  /** Country-name → ISO2 lookup — reference uses the `countrycode` R
    * package (`Coalplants_GEM.R:200`) plus a Kosovo patch (`:201`).
    * Modeled as a broadcast dimension join (SURVEY.md §2.3 J4); the
    * alias dimension is provided by the caller (bundled CSV in prod,
    * in-test fixture here).
    */
  def countryToIso2(dim: DataFrame, countryCol: String)(df: DataFrame): DataFrame =
    df.join(broadcast(dim), df(countryCol) === dim("country_name"), "left")
      .withColumn("country_iso2",
        when(col(countryCol) === "Kosovo", "XK").otherwise(col("iso2")))
      .drop("country_name", "iso2")

  /** First-row-per-group dedup — reference steel merge
    * `TotalData_GEM.R:48-51` (`group_by(name) %>% slice(1)`). R's
    * slice(1) is "first in file order"; distributed-deterministic
    * equivalent: min over an explicit ordinal.
    */
  def firstPerGroup(keyCol: String, ordinalCol: String)(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(ordinalCol))
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }
}
