package graft

import graft.ops.GemPipeline
import graft.sources.CountryDim
import org.apache.spark.sql.functions._

class GemPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("classifyFuel: earlier substring wins when both fuels appear") {
    val out = Seq(
      "Fossil Gas: cc", "fossil liquids only", "fossil gas then fossil liquids",
      "fossil liquids then fossil gas", "hydrogen")
      .toDF("Fuel").transform(GemPipeline.classifyFuel("Fuel"))
      .select("classification").collect().map(_.getString(0)).toSeq
    assert(out == Seq("Gas Power Plant", "Oil Power Plant", "Gas Power Plant",
      "Oil Power Plant", "Not Sure"))
  }

  test("expandBinational duplicates Yes rows, suffixes ids, promotes and clears") {
    val df = Seq(
      ("L1", "U1", "No", "A", null.asInstanceOf[String]),
      ("L2", "U2", "Yes", "A", "B")
    ).toDF("GEM location ID", "GEM unit ID", "Binational", "Country 1", "Country 2")
    val out = GemPipeline.expandBinational("Binational",
      Seq("GEM location ID", "GEM unit ID"), Seq("Country 1" -> "Country 2"))(df)
    assert(out.count() == 3)
    val side2 = out.filter(col("GEM unit ID") === "U2_2").collect().head
    assert(side2.getAs[String]("Country 1") == "B")
    assert(side2.isNullAt(side2.fieldIndex("Country 2"))) // cleared
    assert(out.filter(col("GEM unit ID") === "U2").collect().head
      .isNullAt(out.columns.indexOf("Country 2")))
  }

  test("pre-2024 retirement drop is config-gated: coal drops, solar keeps zero rows") {
    import graft.ops.TrackerConfigs
    // one unit retired in 2010 — coal (`Coalplants_GEM.R:126-128`) drops it,
    // solar keeps it as zero-capacity rows over the 2023-2050 expansion
    val coalRaw = Seq(("U1", "L1", "P1", "Germany", "R1", "Own Co [100%]",
      "50.0", "operating", "2000", "2010", "20", 1.0, 2.0))
      .toDF("GEM unit/phase ID", "GEM location ID", "Plant name", "Country/Area",
        "Region", "Owner", "Capacity (MW)", "Status", "Start year",
        "Planned retirement", "Plant age (years)", "Latitude", "Longitude")
    assert(GemPipeline.wrangle(TrackerConfigs.coal)(coalRaw).count() == 0)

    val solarRaw = Seq(("U1", "L1", "P1", "Germany", "R1", "Own Co [100%]",
      "50.0", "operating", "2000", "2010", 1.0, 2.0))
      .toDF("GEM phase ID", "GEM location ID", "Project Name", "Country",
        "Region", "Owner", "Capacity (MW)", "Status", "Start year",
        "Retired year", "Latitude", "Longitude")
    val solarOut = GemPipeline.wrangle(TrackerConfigs.solar)(solarRaw)
    assert(solarOut.count() == 28) // 2023..2050 expansion survives
    assert(solarOut.agg(sum("capacity")).collect().head.getDouble(0) == 0.0)
  }

  test("assignCompanyIds: deterministic TFLnnnnnnnn ids, existing ids win") {
    val df = Seq(("x", "B"), ("y", "A"), ("z", "B")).toDF("k", "company_name")
    val out = GemPipeline.assignCompanyIds("company_name")(df)
      .select("company_name", "company_id").distinct()
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("A") == "TFL10000001") // rank 1 in sorted order
    assert(out("B") == "TFL10000002")
    val pre = Seq(("x", "A", "KEEP")).toDF("k", "company_name", "company_id")
    val kept = GemPipeline.assignCompanyIds("company_name")(pre)
      .select("company_id").collect().head.getString(0)
    assert(kept == "KEEP")
  }

  test("countryToIso2: bundled dim resolves names and aliases, Kosovo patched") {
    val df = Seq("Germany", "USA", "Kosovo", "Atlantis").toDF("country_name")
    val out = GemPipeline.countryToIso2(CountryDim.dim(spark), "country_name")(df)
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(out("Germany").contains("DE"))
    assert(out("USA").contains("US"))
    assert(out("Kosovo").contains("XK"))
    assert(out("Atlantis").isEmpty)
  }

  test("firstPerGroup keeps exactly the minimum-ordinal row") {
    val df = Seq(("a", 2, "second"), ("a", 1, "first"), ("b", 9, "only"))
      .toDF("k", "ord", "v")
    val out = GemPipeline.firstPerGroup("k", "ord")(df)
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(out == Map("a" -> "first", "b" -> "only"))
  }

  test("emissionFactorJoin: country factor preferred, global mean-of-means fallback") {
    val data = Seq(("CoalCap", "DE"), ("CoalCap", "JP")).toDF("technology", "country_iso2")
    val factors = Seq(
      ("CoalCap", "DE", 2.0), ("CoalCap", "DE", 4.0), ("CoalCap", "FR", 9.0)
    ).toDF("technology", "country_iso2", "emissions_factor")
    val out = GemPipeline.emissionFactorJoin(factors)(data)
      .collect().map(r => r.getString(1) -> r.getAs[Double]("emission_factor")).toMap
    assert(math.abs(out("DE") - 3.0) < 1e-9) // country mean
    assert(math.abs(out("JP") - 6.0) < 1e-9) // mean of country means (3, 9)
  }
}
