package graft

import graft.ops.{GemPipeline, TrackerConfigs}
import graft.sources.Excel
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Every tracker whose workbook exists in the snapshot (6 of 8 —
  * solar/wind are absent, `.MISSING_LARGE_BLOBS`) wrangled end-to-end
  * from its REAL input through its config: the strongest available
  * "a user of the reference could switch" evidence, and a live check
  * that each config's column spellings match the actual workbook.
  */
class RealWorkbookSpec extends SparkSpec {

  private val inputs = "/root/reference/GEM_Inputs"

  /** (config, workbook, sheets-to-union) per reference script header. */
  private val realTrackers: Seq[(GemPipeline.TrackerConfig, String, Seq[String])] = Seq(
    (TrackerConfigs.coal, "Global-Coal-Plant-Tracker-July-2024.xlsx",
      Seq("Units")), // Coalplants_GEM.R:10
    (TrackerConfigs.gasOil, "Global-Oil-and-Gas-Plant-Tracker-GOGPT-January-2025.xlsx",
      Seq("Gas & Oil Units", "sub-threshold units")), // GasOilplants_GEM.R:11-15
    (TrackerConfigs.hydro, "Global-Hydropower-Tracker-April-2024.xlsx",
      Seq("Data", "Below Threshold")), // Hydroplants_GEM.R:11-16
    (TrackerConfigs.nuclear, "Global-Nuclear-Power-Tracker-July-2024.xlsx",
      Seq("Data")), // nuclearplants_GEM.R:11
    (TrackerConfigs.geothermal, "Geothermal-Power-Tracker-May-2024.xlsx",
      Seq("Data", "Below Threshold")), // geothermalplants_GEM.R:11-12
    (TrackerConfigs.bioenergy, "Global-Bioenergy-Power-Tracker-GBPT-September-2024.xlsx",
      Seq("Data", "Below Threshold"))) // bioenergyplants_GEM.R:11-13

  private def readUnion(spark: SparkSession, path: String, sheets: Seq[String]): DataFrame =
    sheets.map(Excel.read(spark, path, _))
      .reduce(_.unionByName(_, allowMissingColumns = true))

  realTrackers.foreach { case (cfg, file, sheets) =>
    test(s"real ${cfg.name} workbook wrangles end-to-end") {
      val path = s"$inputs/$file"
      assume(new java.io.File(path).canRead)
      val raw = readUnion(spark, path, sheets)
        .withColumn("Latitude", col("Latitude").try_cast("double"))
        .withColumn("Longitude", col("Longitude").try_cast("double"))
      val out = GemPipeline.wrangle(cfg)(raw)
      assert(out.select("year").distinct().count() == 28, "2023-2050 expansion")
      val cap2030 = out.filter(col("year") === 2030)
        .agg(coalesce(sum("capacity"), lit(0.0))).collect().head.getDouble(0)
      assert(cap2030 > 0.0, s"${cfg.name}: 2030 capacity degenerate ($cap2030)")
      // every surviving row carries an owner company and a technology
      assert(out.filter(col("technology").isNull).count() == 0)
      val finalized = GemPipeline.finalizeSchema(cfg,
        graft.sources.CountryDim.dim(spark))(out)
      assert(finalized.columns.toSeq == GemPipeline.FinalColumns)
      // the country dimension resolves the bulk of real country names
      val n = finalized.count()
      val unresolved = finalized.filter(col("country_iso2").isNull).count()
      assert(unresolved < n / 4, s"${cfg.name}: $unresolved/$n rows unresolved to ISO2")
    }
  }
}
