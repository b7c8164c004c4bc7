package graft

import graft.ops.{GemPipeline, TrackerConfigs}
import graft.sources.{CountryDim, Excel}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The complete reference flow on real data: six actual GEM workbooks
  * wrangled, finalized, and pushed through the cross-tracker totals
  * job (`TotalData_GEM.R:6-148` semantics) in ONE lazy Spark plan —
  * the end-to-end a reference user runs as nine sequential R scripts
  * with CSV hand-offs.
  */
class RealTotalsSpec extends SparkSpec {

  private val inputs = "/root/reference/GEM_Inputs"

  private val sheetsByTracker = Map(
    "coal" -> ("Global-Coal-Plant-Tracker-July-2024.xlsx", Seq("Units")),
    "gas_oil" -> ("Global-Oil-and-Gas-Plant-Tracker-GOGPT-January-2025.xlsx",
      Seq("Gas & Oil Units", "sub-threshold units")),
    "hydro" -> ("Global-Hydropower-Tracker-April-2024.xlsx", Seq("Data", "Below Threshold")),
    "nuclear" -> ("Global-Nuclear-Power-Tracker-July-2024.xlsx", Seq("Data")),
    "geothermal" -> ("Geothermal-Power-Tracker-May-2024.xlsx", Seq("Data", "Below Threshold")),
    "bioenergy" -> ("Global-Bioenergy-Power-Tracker-GBPT-September-2024.xlsx",
      Seq("Data", "Below Threshold")))

  private def wrangled(spark: SparkSession, cfg: GemPipeline.TrackerConfig): DataFrame = {
    val (file, sheets) = sheetsByTracker(cfg.name)
    val raw = sheets.map(Excel.read(spark, s"$inputs/$file", _))
      .reduce(_.unionByName(_, allowMissingColumns = true))
      .withColumn("Latitude", col("Latitude").try_cast("double"))
      .withColumn("Longitude", col("Longitude").try_cast("double"))
    GemPipeline.finalizeSchema(cfg, CountryDim.dim(spark))(
      GemPipeline.wrangle(cfg)(raw))
  }

  test("six real trackers through the totals job: ids, steel overlay, factors") {
    assume(sheetsByTracker.values.forall { case (f, _) =>
      new java.io.File(s"$inputs/$f").canRead })
    val trackers = Seq(TrackerConfigs.coal, TrackerConfigs.gasOil,
      TrackerConfigs.hydro, TrackerConfigs.nuclear,
      TrackerConfigs.geothermal, TrackerConfigs.bioenergy)
      .map(wrangled(spark, _))

    // dim-scale synthetic steel + factor inputs (the snapshot carries
    // no SFI/Climate-Trace files; their SHAPE is what totals consumes)
    import spark.implicits._
    val steel = Seq(("S1", "Steel One", "STL00000001", "China Energy Investment Group"))
      .toDF("asset_id", "asset_name", "company_id", "company_name")
      .withColumn("country_iso2", lit("CN")).withColumn("country_name", lit("China"))
      .withColumn("region", lit("Asia")).withColumn("coordinates", lit("30.0, 110.0"))
      .withColumn("workforce_size", lit(null).cast("double"))
      .withColumn("workforce_source", lit(null).cast("string"))
      .withColumn("sector", lit("Power")).withColumn("technology", lit("SteelCap"))
      .withColumn("capacity", lit(5.0)).withColumn("capacity_unit", lit("MW"))
      .withColumn("production_year", lit(2030))
      .withColumn("plant_age_years", lit(null).cast("double"))
      .withColumn("plant_age_rank", lit(null).cast("double"))
      .withColumn("capacity_factor", lit(null).cast("double"))
      .withColumn("emission_factor", lit(null).cast("double"))
      .select(GemPipeline.FinalColumns.map(col): _*)
    val factors = Seq(
      ("CoalCap", "CN", 900.0), ("CoalCap", "IN", 950.0),
      ("GasCap", "US", 400.0), ("OilCap", "SA", 650.0))
      .toDF("technology", "country_iso2", "emissions_factor")

    val out = GemPipeline.totals(trackers, steel, factors).cache()
    try {
      val n = out.count()
      assert(n > 400000, s"expected a six-tracker asset-year fact in the 100k s, got $n")

      // TFLnnnnnnnn format and one id per company
      val badIds = out.filter(col("company_name").isNotNull &&
        !col("company_id").rlike("^(TFL\\d{8}|STL\\d+)$")).count()
      assert(badIds == 0, s"$badIds rows with malformed company ids")
      val multi = out.filter(col("company_name").isNotNull)
        .groupBy("company_name").agg(countDistinct("company_id").as("k"))
        .filter(col("k") > 1).count()
      assert(multi == 0, "a company resolved to more than one id")

      // steel overlay: the steel company's id wins everywhere
      val steelIds = out.filter(col("company_name") === "China Energy Investment Group")
        .select("company_id").distinct().collect().map(_.getString(0)).toSeq
      assert(steelIds == Seq("STL00000001"), s"steel id not overlaid: $steelIds")

      // emission factors: fossil rows joined or global-fallback, others zero
      val nonFossilNonZero = out.filter(
        !col("technology").isin("CoalCap", "OilCap", "GasCap") &&
          col("emission_factor") =!= 0.0).count()
      assert(nonFossilNonZero == 0, "non-fossil rows must carry factor 0")
      val coalCn = out.filter(col("technology") === "CoalCap" &&
        col("country_iso2") === "CN").select("emission_factor").distinct()
        .collect().map(_.getDouble(0)).toSeq
      assert(coalCn == Seq(900.0), s"CN coal factor: $coalCn")
      val coalElse = out.filter(col("technology") === "CoalCap" &&
        col("country_iso2") === "DE").select("emission_factor").distinct()
        .collect().map(_.getDouble(0)).toSeq
      assert(coalElse == Seq(925.0), s"global mean-of-means fallback: $coalElse") // (900+950)/2
    } finally { out.unpersist(); () }
  }
}
