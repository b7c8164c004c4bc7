package graft

import graft.ops.{GemPipeline, Ownership, TrackerConfigs}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType}

/** Drives ALL EIGHT tracker configs end-to-end through
  * GemPipeline.wrangle on a synthetic frame built FROM the config's own
  * column spellings — the per-script spellings (`GEM phase ID` vs
  * `GEM unit ID`, `Start year` vs `Start Year`, `Owner(s)`…) are data,
  * and a typo in any config would otherwise surface only as an
  * AnalysisException in a full pipeline run.
  */
class TrackerConfigsSpec extends SparkSpec {

  /** Three units per tracker: a two-owner split, a bare single owner,
    * and a pre-2024 retiree (started 2000, retired 2010, capacity 80).
    */
  private def rawFor(cfg: GemPipeline.TrackerConfig): DataFrame = {
    val ownerCol = if (cfg.name == "bioenergy") "Owner(s)" else cfg.ownerCol
    val base = Seq(
      ("U1", "L1", "P1", "Germany", "R1", "Alpha Corp [60%]; Beta GmbH [40%]",
        "100.0", "operating", "2005", null),
      ("U2", "L2", "P2", "France", "R1", "Gamma Inc",
        "40.0", "construction", "2026", null),
      ("U3", "L3", "P3", "Germany", "R1", "Delta LLC",
        "80.0", "operating", "2000", "2010"))
    val cols = Seq(cfg.unitIdCol, cfg.locationIdCol, cfg.plantNameCol,
      cfg.countryCol, cfg.regionCol, ownerCol, cfg.capacityCol,
      cfg.statusCol, cfg.startYearCol, cfg.retireYearCol.get)
    val rows = base.map(t => Row(t.productIterator.toSeq.map(_.asInstanceOf[Any]): _*))
    val schema = StructType(cols.map(StructField(_, StringType, nullable = true)))
    var df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
      .withColumn("Latitude", lit(1.5).cast(DoubleType))
      .withColumn("Longitude", lit(2.5).cast(DoubleType))
    if (cfg.name == "gas_oil")
      df = df.withColumn("Fuel", lit("fossil gas: LNG"))
    if (cfg.name == "hydro")
      df = df
        .withColumn("Binational", lit("No"))
        .withColumn("Country 2", lit(null).cast(StringType))
        .withColumn("Region 2", lit(null).cast(StringType))
        .withColumn("Country 2 Capacity (MW)", lit(null).cast(StringType))
    if (cfg.ageCol.isDefined)
      df = df.withColumn(cfg.ageCol.get, lit("10"))
    df
  }

  TrackerConfigs.all.foreach { cfg =>
    test(s"config '${cfg.name}': wrangle runs on its own column spellings") {
      val out = GemPipeline.wrangle(cfg)(rawFor(cfg))
      val perYear = out.groupBy("year").agg(sum("capacity").as("cap"))
        .collect().map(r => r.getAs[Int]("year") -> r.getAs[Double]("cap")).toMap
      assert(perYear.size == 28) // 2023..2050 expansion

      // 2030: U1 (op 2005) live=100, U2 (start 2026) live=40, U3 retired.
      // Coal/gasOil DROP the pre-2024 retiree; others carry it at 0 —
      // either way 2030 capacity is 140 when shares are conserved.
      // (coal's Strict mode keeps it too: both U1 owners have explicit
      // shares and U2's bare owner contributes a null allocation that
      // sums to 0 — the reference's silent-loss quirk.)
      val expected2030 = if (cfg.ownershipMode == Ownership.Strict) 100.0 else 140.0
      assert(math.abs(perYear(2030) - expected2030) < 1e-9,
        s"2030 capacity ${perYear(2030)} != $expected2030")
      // 2024: U2 not started -> 0; U1 alone (U3 dropped or zero)
      assert(math.abs(perYear(2024) - 100.0) < 1e-9)

      val companies = out.select("Company").distinct().collect().map(_.getString(0)).toSet
      assert(companies == Set("Alpha Corp", "Beta GmbH", "Gamma Inc") ||
        companies == Set("Alpha Corp", "Beta GmbH", "Gamma Inc", "Delta LLC"))

      // retiree presence matches the per-config flag
      val hasU3 = out.filter(col(cfg.locationIdCol) === "L3").count() > 0
      assert(hasU3 == !cfg.dropPre2024Retirees)
      if (hasU3)
        assert(out.filter(col(cfg.locationIdCol) === "L3")
          .agg(sum("capacity")).collect().head.getDouble(0) == 0.0)
    }
  }
}
