package graft

import graft.ops.{Coordinates, Dedup, GemPipeline, Multimodal, Ownership, TextAnalysis}
import graft.sources.CountryDim
import org.apache.spark.sql.functions._

/** Edge semantics not covered by the oracle queries or the first-round
  * suites.
  */
class OperatorEdgeSpec extends SparkSpec {
  import spark.implicits._

  test("canonicalize: mean only when >1 distinct pair, value kept otherwise") {
    val df = Seq(
      ("L1", 10.0, 20.0), ("L1", 12.0, 22.0), // 2 distinct pairs → mean
      ("L2", 5.0, 6.0), ("L2", 5.0, 6.0)      // 1 distinct pair → kept
    ).toDF("loc", "Latitude", "Longitude")
    val out = Coordinates.canonicalize("loc", "Latitude", "Longitude")(df)
      .select("loc", "Latitude", "Longitude").distinct()
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(out("L1") == ((11.0, 21.0)))
    assert(out("L2") == ((5.0, 6.0)))
  }

  test("canonicalize: null location keys keep NULL coords, never averaged together") {
    // two UNRELATED null-id plants: the reference's summary left-join
    // never matches a null key, so their coords must stay null — not
    // get lumped into one fake location and averaged
    val df = Seq(
      (Some("L1"), 1.0, 2.0),
      (None, 40.0, 50.0),
      (None, -40.0, -50.0)
    ).toDF("loc", "Latitude", "Longitude")
    val out = Coordinates.canonicalize("loc", "Latitude", "Longitude")(df).collect()
    val nullKeyRows = out.filter(_.isNullAt(0))
    assert(nullKeyRows.length == 2)
    nullKeyRows.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("Latitude")) && r.isNullAt(r.fieldIndex("Longitude")))
    }
    val l1 = out.find(r => !r.isNullAt(0)).get
    assert(l1.getDouble(l1.fieldIndex("Latitude")) == 1.0)
  }

  test("equal-share denominator is per SOURCE ROW even under duplicate unit ids") {
    // R's row_number() row_id gives each physical row its own n();
    // a unit-id-keyed window would see 4 exploded rows and give 1/4
    val df = Seq(
      ("U1", "A; B", 100.0),
      ("U1", "C; D", 60.0) // same unit id, separate source row
    ).toDF("unit", "Owner", "cap")
    val out = Ownership.split("Owner", "cap", Ownership.EqualShareDefault)(df)
      .select("Company", "Ownership").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out.values.forall(_ == 0.5), s"expected 1/2 shares, got $out")
  }

  test("finalizeSchema coordinates keep R paste0 'NA' semantics on null sides") {
    val cfg = graft.ops.TrackerConfigs.gasOil
    val rolled = Seq(
      ("L1", "P", "Germany", "R1", null.asInstanceOf[java.lang.Double],
        9.5, "GasCap", "C", 2024, 10.0))
      .toDF(cfg.locationIdCol, cfg.plantNameCol, cfg.countryCol, cfg.regionCol,
        "Latitude", "Longitude", "technology", "Company", "year", "capacity")
    val out = GemPipeline.finalizeSchema(cfg, CountryDim.dim(spark))(rolled)
      .select("coordinates", "country_iso2").collect().head
    assert(out.getString(0) == "NA, 9.5")
    assert(out.getString(1) == "DE")
  }

  test("simhash banded join finds every pair within the pigeonhole bound") {
    // Construct texts, compute true Hamming distances, and check that
    // simhashNearDups returns EXACTLY the pairs with distance <= 3.
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"), // identical → distance 0
      (3L, "alpha beta gamma delta zeta"),
      (4L, "completely different words here now")
    ).toDF("doc_id", "text")
    val sigs = docs.select(col("doc_id"), Dedup.simhash(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = (for {
      a <- sigs.keys; b <- sigs.keys if a < b
      if java.lang.Long.bitCount(sigs(a) ^ sigs(b)) <= 3
    } yield (a, b)).toSet
    val found = Dedup.simhashNearDups(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found == expected)
  }

  test("regexTokens splits punctuation into its own tokens") {
    val out = Seq("ab, cd-ef!").toDF("t")
      .select(TextAnalysis.regexTokens(col("t"))).collect().head.getSeq[String](0)
    assert(out == Seq("ab", ",", "cd", "-", "ef", "!"))
  }

  test("rollingFingerprint is order-sensitive where bow is not") {
    val out = Seq("a b c", "c b a").toDF("t")
      .select(TextAnalysis.rollingFingerprint(col("t")).as("r"),
        TextAnalysis.bowFingerprint(col("t")).as("b"))
      .collect()
    assert(out(0).getLong(0) != out(1).getLong(0)) // rolling differs
    assert(out(0).getString(1) == out(1).getString(1)) // bow equal
  }

  test("decodeMeta + sampleFrames: frames count follows the stub duration") {
    val media = Multimodal.asMediaTable(
      Seq((1L, "x" * 100)).toDF("id", "payload"), "id", "payload", "video")
    val meta = Multimodal.decodeMeta(spark, media)
    val m = meta.collect().head
    assert(m.nBytes == 100 && m.durationMs == 1000)
    val frames = Multimodal.sampleFrames(meta, everyMs = 300).count()
    assert(frames == 4) // 0, 300, 600, 900
  }

  test("decodeMeta parses real BMP and WAV headers; junk falls to the stub") {
    def le4(n: Long): Array[Byte] =
      Array(n, n >> 8, n >> 16, n >> 24).map(b => (b & 0xff).toByte)
    // 54-byte BMP: "BM" magic, DIB size 40 at offset 14, 640×480
    val bmp = new Array[Byte](54)
    bmp(0) = 'B'; bmp(1) = 'M'
    le4(40).copyToArray(bmp, 14)
    le4(640).copyToArray(bmp, 18)
    le4(480).copyToArray(bmp, 22)
    // top-down BMP stores height negative; decode must return |h|
    val bmpNeg = bmp.clone(); le4(-480L & 0xffffffffL).copyToArray(bmpNeg, 22)
    // 44-byte canonical WAV: 16 kB/s byte rate, 48000-byte data chunk
    val wav = new Array[Byte](44)
    "RIFF".getBytes.copyToArray(wav, 0)
    "WAVE".getBytes.copyToArray(wav, 8)
    le4(16000).copyToArray(wav, 28)
    le4(48000).copyToArray(wav, 40)
    val media = Seq(
      (1L, bmp, "image"), (2L, bmpNeg, "image"), (3L, wav, "audio"),
      (4L, "not a header".getBytes, "image"))
      .toDF("id", "bytes", "media_type")
    val out = Multimodal.decodeMeta(spark, media).collect()
      .map(m => m.id -> m).toMap
    assert(out(1L).width == 640 && out(1L).height == 480 &&
      out(1L).durationMs == 0L)
    assert(out(2L).height == 480) // |negative height|
    assert(out(3L).durationMs == 3000L) // 48000 B / 16000 B/s
    assert(out(3L).width == 0 && out(3L).height == 0)
    assert(out(4L).width == 64 + 'n' % 64) // stub path untouched
  }

  test("decodeMeta walks JPEG markers to SOF; SOS-first and truncated fall to the stub") {
    def seg(marker: Int, payload: Array[Byte]): Array[Byte] =
      Array(0xff.toByte, marker.toByte,
        ((payload.length + 2) >> 8).toByte, ((payload.length + 2) & 0xff).toByte
      ) ++ payload
    def be2(n: Int) = Array((n >> 8).toByte, (n & 0xff).toByte)
    val soi = Array(0xff.toByte, 0xd8.toByte)
    val app0 = seg(0xe0, "JFIF".getBytes ++ Array.fill[Byte](10)(0))
    def sof0(w: Int, h: Int) = seg(0xc0,
      Array(8.toByte) ++ be2(h) ++ be2(w) ++
        Array[Byte](3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1))
    // baseline: SOI + APP0 + SOF0; progressive flavor adds FF fill
    // bytes before an SOF2 marker
    val jpeg = soi ++ app0 ++ sof0(800, 600)
    val jpegFill = soi ++ app0 ++
      Array(0xff.toByte) ++ // extra FF fill byte before the marker
      seg(0xc2, Array(8.toByte) ++ be2(20) ++ be2(30) ++
        Array[Byte](1, 0x11, 0))
    val sosFirst = soi ++ seg(0xda, Array[Byte](0)) // scan before frame
    val truncated = soi ++ app0.take(3)
    val media = Seq(
      (1L, jpeg, "image"), (2L, jpegFill, "image"),
      (3L, sosFirst, "image"), (4L, truncated, "image"))
      .toDF("id", "bytes", "media_type")
    val out = Multimodal.decodeMeta(spark, media).collect()
      .map(m => m.id -> m).toMap
    assert(out(1L).width == 800 && out(1L).height == 600 &&
      out(1L).durationMs == 0L)
    assert(out(2L).width == 30 && out(2L).height == 20)
    assert(out(3L).width == 64 + 0xff % 64) // stub: first byte 0xFF
    assert(out(4L).width == 64 + 0xff % 64)
  }

  test("decodeMeta walks MP4 boxes to mvhd/tkhd; no moov falls to the stub") {
    def be4(n: Long): Array[Byte] =
      Array(n >> 24, n >> 16, n >> 8, n).map(b => (b & 0xff).toByte)
    def box(tpe: String, body: Array[Byte]): Array[Byte] =
      be4(body.length + 8) ++ tpe.getBytes("ISO-8859-1") ++ body
    val ftyp = box("ftyp", "isom".getBytes ++ be4(0))
    def mvhd0(ts: Long, dur: Long) =
      box("mvhd", be4(0) ++ be4(0) ++ be4(0) ++ be4(ts) ++ be4(dur))
    def mvhd1(ts: Long, dur: Long) = // version 1: 64-bit times/duration
      box("mvhd", Array[Byte](1, 0, 0, 0) ++ be4(0) ++ be4(0) ++ be4(0) ++
        be4(0) ++ be4(ts) ++ be4(dur >> 32) ++ be4(dur & 0xffffffffL))
    def tkhd(w: Long, h: Long) =
      box("tkhd", be4(0) ++ Array.fill[Byte](72)(0) ++
        be4(w << 16) ++ be4(h << 16))
    val video = ftyp ++ box("moov",
      mvhd0(1000, 90000) ++
        box("trak", tkhd(0, 0)) ++ // audio track: 0x0
        box("trak", tkhd(1920, 1080)))
    val v1 = ftyp ++ box("moov", mvhd1(600, 1200) ++ box("trak", tkhd(64, 48)))
    val noMoov = ftyp ++ box("free", Array.fill[Byte](4)(0))
    val media = Seq((1L, video, "video"), (2L, v1, "video"),
      (3L, noMoov, "video")).toDF("id", "bytes", "media_type")
    val out = Multimodal.decodeMeta(spark, media).collect()
      .map(m => m.id -> m).toMap
    assert(out(1L).width == 1920 && out(1L).height == 1080 &&
      out(1L).durationMs == 90000L)
    assert(out(2L).width == 64 && out(2L).height == 48 &&
      out(2L).durationMs == 2000L) // 1200 / 600 ts-units/s
    assert(out(3L).durationMs == noMoov.length * 10L) // stub path
  }

  test("classifyFuel instr semantics: 0 position means NA, not a match") {
    val out = Seq("no such fuel").toDF("Fuel")
      .transform(GemPipeline.classifyFuel("Fuel"))
      .select("classification").collect().head.getString(0)
    assert(out == "Not Sure")
  }

  test("redactPii: NULL text stays NULL; IP octet boundaries respected") {
    val rows = Seq(Some("v 1.2.3.4 end"), Some("ver 1.2.3.4.5 x"), None)
      .toDF("text").select(TextAnalysis.redactPii(col("text")).as("c"))
      .collect().map(r => Option(r.getString(0)))
    assert(rows(0).contains("v <IP> end"))
    // 5 dotted groups: \b…\b still matches the leading 4 — greedy scrub
    // is the safe direction for PII (over-redact, never under-redact)
    assert(rows(1).exists(_.contains("<IP>")))
    assert(rows(2).isEmpty)
  }

  test("hash split is deterministic, exhaustive, and near the target ratios") {
    import graft.ops.Sampling
    import spark.implicits._
    val keys = (1L to 2000L).toDF("id")
    val cuts = Seq("train" -> 80, "val" -> 90, "test" -> 100)
    val counts = keys.groupBy(Sampling.splitLabel(col("id"), cuts).as("split"))
      .count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 2000 && counts.keySet == Set("train", "val", "test"))
    assert(counts("train") > 1500 && counts("train") < 1700, counts.toString)
    assert(counts("val") > 120 && counts("val") < 280, counts.toString)
    // determinism: a re-run assigns identical splits
    val a = keys.select(col("id"), Sampling.splitLabel(col("id"), cuts).as("s"))
    assert(a.except(a).count() == 0)
    assert(intercept[IllegalArgumentException] {
      Sampling.splitLabel(col("id"), Seq("a" -> 90, "b" -> 80))
    }.getMessage.contains("cuts"))
  }

  test("decontaminate with an empty benchmark keeps the whole corpus") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d e f"), (2L, "g h i j k l")).toDF("doc_id", "text")
    val bench = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.decontaminate(docs, bench, "doc_id", "text", n = 5).count() == 2)
  }

  test("expectations: each check counts its own violations exactly") {
    import spark.implicits._
    import graft.ops.Expectations
    import graft.ops.Expectations._
    val df = Seq(
      (Some(1L), Some("a"), 5.0, "F", "1-URGENT"),
      (Some(2L), Some("b"), -1.0, "X", "9-BAD"), // range + set + regex
      (None, Some("b"), 10.0, "O", "2-HIGH"), // null key + dup "b"
      (Some(4L), None, 10.0, "F", "3-MEDIUM"), // null unique-col value
      (Some(5L), None, 10.0, "F", "3-MEDIUM") // second null: +1 dup
    ).toDF("k", "u", "v", "st", "pr")
    val got = Expectations.report(df, Seq(
        NotNull("k"), Unique("u"), InRange("v", 0, 9),
        InSet("st", Seq("F", "O")), Matches("pr", "^[1-5]-")))
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._3, r._4))).toMap
    assert(got("not_null(k)") == ((1L, false)))
    // values: a, b, b, null, null -> 5 rows, 3 distinct incl. null
    assert(got("unique(u)") == ((2L, false)))
    assert(got("in_range(v)") == ((4L, false))) // -1 plus three 10s
    assert(got("in_set(st)") == ((1L, false)))
    assert(got("matches(pr)") == ((1L, false)))
  }

  test("groupedOls: exact fit on a perfect line; constant x -> nulls") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L, 5L), ("a", 2L, 7L), ("a", 3L, 9L), // y = 2x + 3
      ("b", 4L, 1L), ("b", 4L, 9L), // constant x: no fit
      ("c", 8L, 2L) // single row: no fit
    ).toDF("g", "x", "y")
    val got = graft.ops.Stats.groupedOls(df, "g", "x", "y")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.get(2)).map(_ => r.getDouble(2)),
          Option(r.get(3)).map(_ => r.getDouble(3)),
          Option(r.get(4)).map(_ => r.getDouble(4))))).toMap
    assert(got("a") == ((3L, Some(2.0), Some(3.0), Some(1.0))))
    assert(got("b") == ((2L, None, None, None)))
    assert(got("c") == ((1L, None, None, None)))
  }

  test("cohortRetention: epoch-week triangle with returning users") {
    import spark.implicits._
    val wk = 604800L // seconds per week
    def t(weeks: Long, off: Long = 0) =
      new java.sql.Timestamp((weeks * wk + off) * 1000L)
    val events = Seq(
      (1L, t(100)), (1L, t(100, 60)), (1L, t(101)), // cohort 100, wks 0,1
      (2L, t(100)), (2L, t(102)), // cohort 100, wks 0,2
      (3L, t(101)) // cohort 101, wk 0
    ).toDF("user_id", "ts")
    val got = graft.ops.Stats.cohortRetention(events, "user_id", "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(got == Map((100L, 0L) -> 2L, (100L, 1L) -> 1L,
      (100L, 2L) -> 1L, (101L, 0L) -> 1L))
  }

  test("contentFeatures: BMP honors offset+row padding; WAV signs PCM") {
    import spark.implicits._
    // 3x1 24-bit BMP: rowSize = 12 (9 pixel bytes + 3 pad); pad bytes
    // poisoned 0xEE to prove they are EXCLUDED from the means
    def le4(n: Int) = Array[Byte]((n & 0xff).toByte, ((n >> 8) & 0xff).toByte,
      ((n >> 16) & 0xff).toByte, ((n >> 24) & 0xff).toByte)
    def le2(n: Int) = Array[Byte]((n & 0xff).toByte, ((n >> 8) & 0xff).toByte)
    val bmp = Array[Byte]('B', 'M') ++ new Array[Byte](8) ++ le4(54) ++
      le4(40) ++ le4(3) ++ le4(1) ++ le2(1) ++ le2(24) ++
      new Array[Byte](24) ++
      Array[Byte](10, 20, 30, 40, 50, 60, 70, 80, 90) ++
      Array[Byte](0xEE.toByte, 0xEE.toByte, 0xEE.toByte)
    // WAV: samples 100, -100, 32767, -32768
    val samples = Seq(100, -100, 32767, -32768)
    val wav = "RIFF".getBytes ++ le4(36 + 8) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le4(16) ++ le2(1) ++ le2(1) ++ le4(8000) ++
      le4(16000) ++ le2(2) ++ le2(16) ++ "data".getBytes ++ le4(8) ++
      samples.flatMap(s => le2(s & 0xffff)).toArray
    val junk = Array[Byte](1, 2, 3)
    val media = Seq((1L, bmp, "image"), (2L, wav, "audio"),
        (3L, junk, "other"))
      .toDF("id", "bytes", "media_type")
    val got = graft.ops.Multimodal.contentFeatures(spark, media)
      .as[(Long, String, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got(1L) == (("bmp", 40.0, 50.0, 60.0))) // (10+40+70)/3 etc.
    val rms = math.sqrt(samples.map(s => s.toDouble * s).sum / 4)
    assert(got(2L) == (("wav",
      BigDecimal(rms).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
      32768.0, 4.0)))
    assert(got(3L)._1 == "other")
  }
}
