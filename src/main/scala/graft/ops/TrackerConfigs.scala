package graft.ops

import org.apache.spark.sql.functions._

/** The eight per-tracker configurations — one for each reference script
  * (`Coalplants_GEM.R` … `bioenergyplants_GEM.R`). All eight are ONE
  * pipeline ([[GemPipeline.wrangle]]) differing only in source column
  * names, status whitelist, start-year policy, ownership mode, and the
  * technology constant (SURVEY.md §0).
  */
object TrackerConfigs {
  import GemPipeline._

  private val CommonStatuses = Seq("construction", "operating", "announced", "pre-construction")

  /** `Coalplants_GEM.R`: unit/phase ids, drop-unknown start years,
    * strict ownership shares, plant-age column carried to the output.
    */
  val coal: TrackerConfig = TrackerConfig(
    name = "coal",
    technology = lit("CoalCap"), // Coalplants_GEM.R:205
    unitIdCol = "GEM unit/phase ID",
    locationIdCol = "GEM location ID",
    plantNameCol = "Plant name",
    countryCol = "Country/Area",
    regionCol = "Region",
    ownerCol = "Owner",
    capacityCol = "Capacity (MW)",
    statusCol = "Status",
    startYearCol = "Start year",
    retireYearCol = Some("Planned retirement"),
    ageCol = Some("Plant age (years)"),
    statusWhitelist = CommonStatuses, // Coalplants_GEM.R:41
    startYearPolicy = DropUnknown, // Coalplants_GEM.R:46-47
    ownershipMode = Ownership.Strict,
    dropPre2024Retirees = true) // Coalplants_GEM.R:126-128

  /** `GasOilplants_GEM.R`: fuel classification pre-step decides
    * GasCap/OilCap; unknown starts dropped only pre-operation.
    */
  val gasOil: TrackerConfig = TrackerConfig(
    name = "gas_oil",
    technology = // GasOilplants_GEM.R:225-229
      when(col("classification") === "Gas Power Plant", "GasCap")
        .when(col("classification") === "Oil Power Plant", "OilCap")
        .otherwise("CoalCap"),
    unitIdCol = "GEM unit ID",
    locationIdCol = "GEM location ID",
    plantNameCol = "Plant name",
    countryCol = "Country/Area",
    regionCol = "Region",
    // The GOGPT workbook spellings — the reference reads `Owner(s)` /
    // `Planned retire` and renames them (GasOilplants_GEM.R:97-98);
    // the config speaks the INPUT's language (RealWorkbookSpec pins it).
    ownerCol = "Owner(s)",
    capacityCol = "Capacity (MW)",
    statusCol = "Status",
    startYearCol = "Start year",
    retireYearCol = Some("Planned retire"),
    ageCol = None, // GasOilplants_GEM.R:233 (set to NA)
    statusWhitelist = CommonStatuses,
    startYearPolicy = DropUnknownForStatuses( // GasOilplants_GEM.R:79-81
      Seq("announced", "construction", "pre-construction")),
    ownershipMode = Ownership.Strict,
    dropPre2024Retirees = true, // GasOilplants_GEM.R:153-155
    preSteps = Seq(
      classifyFuel("Fuel"), // GasOilplants_GEM.R:20-42
      // classification whitelist (GasOilplants_GEM.R:74-75)
      _.filter(col("classification").isin("Gas Power Plant", "Oil Power Plant"))))

  /** `Hydroplants_GEM.R`: G3 binational expansion pre-step, imputed
    * start years, equal-share ownership default.
    */
  val hydro: TrackerConfig = TrackerConfig(
    name = "hydro",
    technology = lit("HydroCap"), // Hydroplants_GEM.R:283
    unitIdCol = "GEM unit ID",
    locationIdCol = "GEM location ID",
    plantNameCol = "Project Name",
    countryCol = "Country 1",
    regionCol = "Region 1",
    ownerCol = "Owner",
    capacityCol = "Country 1 Capacity (MW)",
    statusCol = "Status",
    startYearCol = "Start Year",
    retireYearCol = Some("Retired Year"),
    ageCol = None,
    statusWhitelist = CommonStatuses, // Hydroplants_GEM.R:95-96
    startYearPolicy = Impute(), // Hydroplants_GEM.R:102-107
    ownershipMode = Ownership.EqualShareDefault,
    preSteps = Seq(
      expandBinational("Binational", // Hydroplants_GEM.R:23-74
        idCols = Seq("GEM location ID", "GEM unit ID"),
        promote = Seq(
          "Country 1" -> "Country 2",
          "Country 1 Capacity (MW)" -> "Country 2 Capacity (MW)",
          "Region 1" -> "Region 2"))))

  /** The five v2 trackers share the shape — Project Name assets,
    * equal-share ownership, imputed start years, and an explicit
    * null-owner drop (`solarplants_GEM.R:75`, "nearly 30k removed") —
    * but differ in unit-id and year column spellings per workbook.
    */
  private def simpleTracker(
      nm: String, tech: String, unitId: String, country: String,
      startYear: String, retireYear: String,
      extraPre: Seq[org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame] = Nil)
      : TrackerConfig = TrackerConfig(
    name = nm,
    technology = lit(tech),
    unitIdCol = unitId,
    locationIdCol = "GEM location ID",
    plantNameCol = "Project Name",
    countryCol = country,
    regionCol = "Region",
    ownerCol = "Owner",
    capacityCol = "Capacity (MW)",
    statusCol = "Status",
    startYearCol = startYear,
    retireYearCol = Some(retireYear),
    ageCol = None,
    statusWhitelist = CommonStatuses,
    startYearPolicy = Impute(),
    ownershipMode = Ownership.EqualShareDefault,
    preSteps = extraPre :+ ((d: org.apache.spark.sql.DataFrame) =>
      d.filter(col("Owner").isNotNull)))

  /** `solarplants_GEM.R:221` / `windplants_GEM.R:212` /
    * `geothermalplants_GEM.R:199` / `bioenergyplants_GEM.R:204` all land
    * on RenewablesCap; `nuclearplants_GEM.R:203` on NuclearCap. Column
    * spellings per script: solar/wind/bio key units by `GEM phase ID`,
    * nuclear by `Start Year`/`Retirement Year`, bio renames `Owner(s)`.
    */
  val solar: TrackerConfig = simpleTracker("solar", "RenewablesCap",
    "GEM phase ID", "Country", "Start year", "Retired year")
  val wind: TrackerConfig = simpleTracker("wind", "RenewablesCap",
    "GEM phase ID", "Country/Area", "Start year", "Retired year")
  val geothermal: TrackerConfig = simpleTracker("geothermal", "RenewablesCap",
    "GEM unit ID", "Country/Area", "Start year", "Retired year")
  val bioenergy: TrackerConfig = simpleTracker("bioenergy", "RenewablesCap",
    "GEM phase ID", "Country/Area", "Start Year", "Retired Year",
    extraPre = Seq(_.withColumnRenamed("Owner(s)", "Owner"))) // bioenergyplants_GEM.R:62
  val nuclear: TrackerConfig = simpleTracker("nuclear", "NuclearCap",
    "GEM unit ID", "Country/Area", "Start Year", "Retirement Year")

  /** All eight, in the reference's union order (`TotalData_GEM.R:18`). */
  val all: Seq[TrackerConfig] =
    Seq(coal, gasOil, hydro, solar, wind, nuclear, geothermal, bioenergy)
}
