package graft

import graft.streaming.EventStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, timestamp_micros}
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

/** True streaming-mode coverage (StreamingCsvSpec covers batch parity):
  * windowedCounts through a MemoryStream micro-batch run, and the
  * sessionize state machine including the idle-timeout eviction branch
  * (the ADVICE.md r2 fix) via TestGroupState.
  */
class StreamingModeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("windowedCounts runs as a real stream with watermarked state") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val events = input.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = EventStream.windowedCounts(events)
      .writeStream.format("memory").queryName("wc_test")
      .outputMode(OutputMode.Complete()).start()
    try {
      input.addData(
        (1L, ts("2024-01-01 00:10:00"), 7L, "view", 1.0),
        (2L, ts("2024-01-01 00:20:00"), 7L, "view", 2.0),
        (3L, ts("2024-01-01 01:10:00"), 8L, "click", 4.0))
      q.processAllAvailable()
      val rows = spark.table("wc_test").orderBy("window_start", "event_type").collect()
      assert(rows.length == 2)
      assert(rows(0).getAs[Long]("n") == 2 && rows(0).getAs[Double]("total_value") == 3.0)
      assert(rows(1).getAs[Long]("n") == 1)
    } finally {
      q.stop()
      spark.sql("DROP VIEW IF EXISTS wc_test")
    }
  }

  test("streamFromDir treats a parquet directory as an unbounded stream") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_src").toString
    Seq((1L, ts("2024-01-01 00:10:00"), 7L, "view", 1.0, "{}"),
      (2L, ts("2024-01-01 00:20:00"), 8L, "click", 2.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(dir)
    val q = EventStream.windowedCounts(EventStream.streamFromDir(spark, dir))
      .writeStream.format("memory").queryName("dir_test")
      .outputMode(OutputMode.Complete()).start()
    try {
      q.processAllAvailable()
      val rows = spark.table("dir_test").orderBy("event_type").collect()
      assert(rows.length == 2)
      assert(rows.map(_.getAs[Long]("n")).sum == 2)
    } finally {
      q.stop()
      spark.sql("DROP VIEW IF EXISTS dir_test")
    }
  }

  test("dedupDocsBySignature: near-identical docs dedup across batches, empty docs pass") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "ts", "text")
    val q = EventStream.dedupDocsBySignature(docs, "doc_id", "text",
        orderCol = "ts")
      .writeStream.format("memory").queryName("sig_dd_test")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        (1L, ts("2024-01-01 00:10:00"), "alpha beta gamma"),
        (2L, ts("2024-01-01 00:11:00"), "alpha beta gamma"), // same batch dup
        (3L, ts("2024-01-01 00:12:00"), "   ")) // no signature → passes
      q.processAllAvailable()
      input.addData( // re-crawl inside watermark + genuinely new doc
        (4L, ts("2024-01-01 00:20:00"), "alpha beta gamma"),
        (5L, ts("2024-01-01 00:21:00"), "delta epsilon zeta"))
      q.processAllAvailable()
      val got = spark.table("sig_dd_test")
        .select("doc_id").as[Long].collect().toSet
      assert(got == Set(1L, 3L, 5L), s"got $got")
    } finally {
      q.stop()
      spark.sql("DROP VIEW IF EXISTS sig_dd_test")
    }
  }

  test("dedupDocsBySignature: full sf0.01 corpus replay — batch parity, bounded state, eviction") {
    // The q50-sized corpus (every sf0.01 document) through the REAL
    // streaming path: pins the 100 TB streaming story to measured
    // behavior instead of watermark claims — (1) stream output on one
    // in-horizon pass equals the batch twin, (2) a full re-crawl
    // inside the watermark emits nothing, (3) state is keyed by
    // signature (<= corpus distinct sigs), and (4) advancing event
    // time past the horizon EVICTS state rather than growing forever.
    implicit val sqlCtx = spark.sqlContext
    val corpus = graft.core.Graft
      .table(spark, "/root/testdata/sf0.01", "documents")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val t0 = ts("2024-01-01 00:00:00").getTime
    def at(mins: Long) = new Timestamp(t0 + mins * 60000L)
    val input = MemoryStream[(Long, Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "ts", "text")
    val q = EventStream.dedupDocsBySignature(docs, "doc_id", "text",
        orderCol = "ts")
      .writeStream.format("memory").queryName("sig_corpus_test")
      .outputMode(OutputMode.Append()).start()
    try {
      def emitted() = spark.table("sig_corpus_test")
        .select("doc_id").as[Long].collect().toSet
      def stateRows() = q.lastProgress.stateOperators(0).numRowsTotal
      // Pass 1: the whole corpus in one horizon.
      input.addData(corpus.map { case (id, tx) => (id, at(0), tx) })
      q.processAllAvailable()
      val batchTwin = EventStream.dedupDocsBySignature(
          corpus.toDF("doc_id", "text")
            .withColumn("ts", org.apache.spark.sql.functions.lit(at(0))),
          "doc_id", "text", orderCol = "ts")
        .select("doc_id").as[Long].collect().toSet
      val pass1 = emitted()
      assert(pass1 == batchTwin,
        s"stream/batch divergence: ${(pass1 diff batchTwin) ++ (batchTwin diff pass1)}")
      assert(pass1.size < corpus.size, "the corpus does contain near-dups")
      // Pass 2: full re-crawl 2 min later — inside the 2 h watermark,
      // every signature is already in state; nothing new emits.
      input.addData(corpus.map { case (id, tx) => (id + 100000L, at(2), tx) })
      q.processAllAvailable()
      assert(emitted() == pass1, "in-horizon re-crawl must emit nothing")
      val stateInHorizon = stateRows()
      assert(stateInHorizon <= pass1.size,
        s"state ($stateInHorizon) must stay <= distinct signatures (${pass1.size})")
      // Pass 3+4: jump event time 10 h — the watermark passes the old
      // signatures and the store EVICTS them (bounded state, the 100 TB
      // claim); the same text re-emits as a fresh first occurrence.
      val probe = corpus.take(50)
      input.addData(probe.map { case (id, tx) => (id + 200000L, at(600), tx) })
      q.processAllAvailable()
      input.addData(Seq((999999L, at(601), "watermark advancer xyzzy")))
      q.processAllAvailable()
      val stateAfterJump = stateRows()
      assert(stateAfterJump < stateInHorizon,
        s"state must shrink after the horizon passes: $stateAfterJump vs $stateInHorizon")
      assert(emitted().exists(_ >= 200000L),
        "past-horizon re-crawls emit again (the periodic batch sweep's job)")
    } finally {
      q.stop()
      spark.sql("DROP VIEW IF EXISTS sig_corpus_test")
    }
  }

  test("dedupEvents drops re-arrivals of a key across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val events = input.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = EventStream.dedupEvents(events, Seq("user_id", "event_type"))
      .writeStream.format("memory").queryName("dd_test")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        (1L, ts("2024-01-01 00:10:00"), 7L, "view", 1.0),
        (2L, ts("2024-01-01 00:11:00"), 7L, "view", 2.0), // same key, same batch
        (3L, ts("2024-01-01 00:12:00"), 8L, "click", 4.0))
      q.processAllAvailable()
      input.addData( // same key again, later micro-batch, inside watermark
        (4L, ts("2024-01-01 00:20:00"), 7L, "view", 8.0),
        (5L, ts("2024-01-01 00:21:00"), 9L, "view", 16.0))
      q.processAllAvailable()
      val rows = spark.table("dd_test").orderBy("user_id", "event_type").collect()
      assert(rows.map(_.getAs[Long]("event_id")).toSeq == Seq(1L, 3L, 5L),
        s"got ${rows.mkString(", ")}")
    } finally {
      q.stop()
      spark.sql("DROP VIEW IF EXISTS dd_test")
    }
  }

  test("correlate joins two real streams within the time bound only") {
    implicit val sqlCtx = spark.sqlContext
    val vIn = MemoryStream[(Long, Timestamp, Long)]
    val cIn = MemoryStream[(Long, Timestamp, Long)]
    val views = vIn.toDF().toDF("user_id", "view_ts", "view_id")
    val clicks = cIn.toDF().toDF("user_id", "click_ts", "click_id")
    val q = EventStream.correlate(
      views, clicks, "user_id", "view_ts", "click_ts", "10 minutes")
      .writeStream.format("memory").queryName("sj_test")
      .outputMode(OutputMode.Append()).start()
    try {
      vIn.addData(
        (7L, ts("2024-01-01 00:10:00"), 100L),
        (8L, ts("2024-01-01 00:10:00"), 101L))
      cIn.addData(
        (7L, ts("2024-01-01 00:15:00"), 200L), // within 10 min → match
        (7L, ts("2024-01-01 00:45:00"), 201L), // too late → no match
        (9L, ts("2024-01-01 00:12:00"), 202L)) // no view for user → drop
      q.processAllAvailable()
      val rows = spark.table("sj_test").collect()
      assert(rows.length == 1)
      assert(rows.head.getAs[Long]("view_id") == 100L &&
        rows.head.getAs[Long]("click_id") == 200L)
    } finally {
      q.stop()
      spark.sql("DROP VIEW IF EXISTS sj_test")
    }
  }

  test("correlateOuter emits the unanswered left row once the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val vIn = MemoryStream[(Long, Timestamp, Long)]
    val cIn = MemoryStream[(Long, Timestamp, Long)]
    val views = vIn.toDF().toDF("user_id", "view_ts", "view_id")
    val clicks = cIn.toDF().toDF("user_id", "click_ts", "click_id")
    val q = EventStream.correlateOuter(
      views, clicks, "user_id", "view_ts", "click_ts", "10 minutes",
      watermark = "5 minutes")
      .writeStream.format("memory").queryName("soj_test")
      .outputMode(OutputMode.Append()).start()
    try {
      vIn.addData(
        (7L, ts("2024-01-01 00:10:00"), 100L), // will match
        (8L, ts("2024-01-01 00:10:00"), 101L)) // never answered
      cIn.addData((7L, ts("2024-01-01 00:15:00"), 200L))
      q.processAllAvailable()
      // matched row emits immediately; user 8 is still held in state
      // (a right event could yet arrive inside its window)
      val early = spark.table("soj_test").collect()
      assert(early.map(_.getAs[Long]("view_id")).toSet == Set(100L))
      // advance both watermarks far past user 8's join window
      vIn.addData((99L, ts("2024-01-01 03:00:00"), 900L))
      cIn.addData((98L, ts("2024-01-01 03:00:00"), 901L))
      q.processAllAvailable()
      val late = spark.table("soj_test")
        .where(col("view_id") === 101L).collect()
      assert(late.length == 1 && late.head.isNullAt(
        late.head.fieldIndex("click_id")),
        "unanswered view must emit exactly once with a null click")
    } finally {
      q.stop()
      spark.sql("DROP VIEW IF EXISTS soj_test")
    }
  }

  test("checkpointed parquet sink: dedupEvents lands exactly-once output on disk") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val events = input.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val outDir = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val q = EventStream.dedupEvents(events, Seq("user_id", "event_type"))
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        (1L, ts("2024-01-01 00:10:00"), 7L, "view", 1.0),
        (2L, ts("2024-01-01 00:11:00"), 7L, "view", 2.0))
      q.processAllAvailable()
      input.addData((3L, ts("2024-01-01 00:12:00"), 7L, "view", 3.0))
      q.processAllAvailable()
    } finally q.stop()
    val landed = spark.read.parquet(outDir)
    assert(landed.count() == 1, "one row per key survives to the sink")
    assert(landed.collect().head.getAs[Long]("event_id") == 1L)
  }

  test("streamingWrangle drives the full batch wrangle per micro-batch") {
    import graft.ops.{GemPipeline, TrackerConfigs}
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType}
    val cfg = TrackerConfigs.coal
    val cols = Seq(cfg.unitIdCol, cfg.locationIdCol, cfg.plantNameCol,
      cfg.countryCol, cfg.regionCol, cfg.ownerCol, cfg.capacityCol,
      cfg.statusCol, cfg.startYearCol, cfg.retireYearCol.get)
    val base = Seq(
      Row("U1", "L1", "P1", "Germany", "R1", "Alpha Corp [60%]; Beta GmbH [40%]",
        "100.0", "operating", "2005", null),
      Row("U2", "L2", "P2", "France", "R1", "Gamma Inc [100%]",
        "40.0", "construction", "2026", null))
    val schema = StructType(cols.map(StructField(_, StringType, nullable = true)))
    var raw = spark.createDataFrame(spark.sparkContext.parallelize(base, 1), schema)
      .withColumn("Latitude", org.apache.spark.sql.functions.lit(1.5).cast(DoubleType))
      .withColumn("Longitude", org.apache.spark.sql.functions.lit(2.5).cast(DoubleType))
    cfg.ageCol.foreach(a => raw = raw.withColumn(a, org.apache.spark.sql.functions.lit("10")))

    val dir = java.nio.file.Files.createTempDirectory("graft_wrangle_src").toString
    raw.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(raw.schema).parquet(dir)
    val got = scala.collection.mutable.ArrayBuffer[String]()
    val q = GemPipeline.streamingWrangle(cfg, stream) { (out, _) =>
      val rows = out.collect().map(_.toString)
      got.synchronized { got ++= rows }
    }.start()
    try q.processAllAvailable() finally q.stop()
    val expected = GemPipeline.wrangle(cfg)(raw).collect().map(_.toString)
    assert(got.sorted.toSeq == expected.sorted.toSeq,
      s"stream rows ${got.size} vs batch ${expected.length}")
  }

  // A real-stream sessionize drive is deliberately absent: with a
  // ProcessingTimeTimeout armed, the engine re-fires micro-batches for
  // timeout bookkeeping, so neither processAllAvailable nor
  // Trigger.AvailableNow reaches quiescence in a test harness. The
  // streaming mechanics (state merge + eviction arithmetic) are covered
  // below and in StreamingCsvSpec's batch-parity run.
  test("mergeSession merges new events into prior state") {
    import EventStream.{Event, SessionAgg}
    val prev = SessionAgg(7L, 2, 3.5, ts("2024-01-01 00:10:00"), ts("2024-01-01 00:30:00"))
    val merged = EventStream.mergeSession(7L,
      Seq(Event(3L, ts("2024-01-01 00:40:00"), 7L, "click", 0.5)), Some(prev))
    assert(merged.n_events == 3)
    assert(merged.total_value == 4.0)
    assert(merged.first_ts == ts("2024-01-01 00:10:00"))
    assert(merged.last_ts == ts("2024-01-01 00:40:00"))
  }

  test("graft_cms aggregates as streaming state (Complete mode, 2 batches)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val sketched = input.toDF().toDF("token")
      .select(graft.functions.Hashing.portableHash(
        org.apache.spark.sql.functions.col("token")).as("h"))
      .selectExpr("graft_cms(h, 4, 64) AS sk")
    val q = sketched.writeStream.format("memory").queryName("cms_test")
      .outputMode(OutputMode.Complete()).start()
    try {
      input.addData("a", "a", "b")
      q.processAllAvailable()
      input.addData("a", "c")
      q.processAllAvailable()
      val sk = spark.table("cms_test").head.getSeq[Long](0)
      assert(sk.length == 4 * 64)
      // every occurrence lands once per row across BOTH batches
      assert(sk.sum == 4L * 5)
      // estimate for "a" (reusing the batch-side estimate expression)
      val est = spark.table("cms_test")
        .select(graft.functions.CmsSketch.estimate(
          org.apache.spark.sql.functions.col("sk"),
          graft.functions.Hashing.portableHash(
            org.apache.spark.sql.functions.lit("a")), 4, 64))
        .head.getLong(0)
      assert(est >= 3L) // CMS never underestimates; 3 "a"s arrived
    } finally {
      q.stop()
      spark.sql("DROP VIEW IF EXISTS cms_test")
    }
  }

  test("graft_hist aggregates as streaming state (Complete mode, 2 batches)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Double]
    val sketched = input.toDF().toDF("v")
      .selectExpr("graft_hist(v, 0.0D, 8.0D, 4) AS h")
    val q = sketched.writeStream.format("memory").queryName("hist_test")
      .outputMode(OutputMode.Complete()).start()
    try {
      input.addData(0.5, 1.9, 2.0) // buckets 0, 0, 1
      q.processAllAvailable()
      input.addData(5.0, 100.0, -3.0) // bucket 2, clamp-high 3, clamp-low 0
      q.processAllAvailable()
      val h = spark.table("hist_test").head.getSeq[Long](0)
      // counts accumulate ACROSS both batches through the state merge
      assert(h == Seq(3L, 1L, 1L, 1L))
    } finally {
      q.stop()
      spark.sql("DROP VIEW IF EXISTS hist_test")
    }
  }

  test("fillForward carries the last observation ACROSS micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Option[Double])]
    val obs = input.toDF().toDF("event_id", "user_id", "v")
    val q = EventStream.fillForward(spark, obs)
      .writeStream.format("memory").queryName("ff_test")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((1L, 7L, Some(5.0)), (2L, 7L, None), (1L, 8L, None))
      q.processAllAvailable()
      input.addData((3L, 7L, None), (4L, 7L, Some(9.0)), (5L, 7L, None),
        (2L, 8L, Some(1.0)))
      q.processAllAvailable()
      val got = spark.table("ff_test").collect()
        .map(r => (r.getLong(1), r.getLong(0)) ->
          Option(r.get(2)).map(_ => r.getDouble(2))).toMap
      assert(got((7L, 2L)).contains(5.0)) // within batch 1
      assert(got((7L, 3L)).contains(5.0)) // cross-batch carry of 5.0
      assert(got((7L, 5L)).contains(9.0)) // updated by event 4
      assert(got((8L, 1L)).isEmpty) // leading null stays null
      assert(got((8L, 2L)).contains(1.0))
    } finally {
      q.stop()
      spark.sql("DROP VIEW IF EXISTS ff_test")
    }
  }

  test("debounce swallows bursts ACROSS micro-batches; parity with batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, String, Long)]
    val ev = input.toDF().toDF("event_id", "key", "kind", "t_us")
    val q = EventStream.debounce(spark, ev, toleranceUs = 10L)
      .writeStream.format("memory").queryName("db_test")
      .outputMode(OutputMode.Append()).start()
    try {
      // Batch 1: head at t=0, chained burst rows at 8, 16.
      input.addData((1L, 7L, "c", 0L), (2L, 7L, "c", 8L), (3L, 7L, "c", 16L))
      q.processAllAvailable()
      // Batch 2: t=24 continues the SAME burst via cross-batch state
      // (gap 8 from t=16, even though the kept head is long past);
      // t=99 starts a new one. Other key unaffected.
      input.addData((4L, 7L, "c", 24L), (5L, 7L, "c", 99L),
        (6L, 8L, "c", 1L))
      q.processAllAvailable()
      val kept = spark.table("db_test").collect()
        .map(_.getLong(0)).toSet
      assert(kept == Set(1L, 5L, 6L))
      // Exact parity with the batch twin on the same (time-ordered)
      // data: burst-collapse anchoring, not rate limiting.
      import spark.implicits._
      val batchDf = Seq((1L, 7L, "c", 0L), (2L, 7L, "c", 8L),
        (3L, 7L, "c", 16L), (4L, 7L, "c", 24L), (5L, 7L, "c", 99L),
        (6L, 8L, "c", 1L)).toDF("event_id", "key", "kind", "ts_v")
        .withColumn("ts", timestamp_micros(col("ts_v")))
      val batchKept = graft.ops.Debounce.firstOfBurst(batchDf,
          Seq("key", "kind"), "ts", "event_id", toleranceUs = 10L)
        .select("event_id").as[Long].collect().toSet
      assert(batchKept == kept)
    } finally {
      q.stop()
      spark.sql("DROP VIEW IF EXISTS db_test")
    }
  }

  test("watermark drops are bounded by q235's batch lateness profile") {
    // The q235 jitter model replayed as a REAL watermarked stream:
    // deliver sf0.001 events in hash-jittered ARRIVAL order across
    // micro-batches and count the rows a 10-minute watermark drops.
    // Structured Streaming advances the watermark BETWEEN batches,
    // so its drop count is at most the batch profile's per-event
    // running-watermark count (the profile is the conservative
    // planning bound — exactly how it should be used).
    import graft.functions.Hashing
    import org.apache.spark.sql.functions._
    val ev = graft.core.Graft.table(spark, "/root/testdata/sf0.001", "events")
      .withColumn("et", expr("unix_micros(cast(ts as timestamp))"))
      .withColumn("arr", col("et") +
        pmod(Hashing.portableHash(
          concat(col("event_id").cast("string"), lit(":arr"))),
          lit(14400000001L)) - lit(7200000000L))
      .select("event_id", "et", "arr")
      .orderBy("arr", "event_id")
      .as[(Long, Long, Long)].collect().toSeq
    val n = ev.size
    val profileDrops = graft.ops.Lateness.watermarkProfile(
        ev.toDF("id", "et", "arr"), "id", "et", "arr",
        bucketUs = 86400000000L, allowedUs = Seq(600000000L))
      .select("n_dropped").as[Long].head()
    assert(profileDrops > 0, "jitter must produce late data")

    def streamDropCount(watermark: String): Long = {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(Long, Long)] // (event_id, et)
      val name = s"wm_drop_${watermark.replaceAll("[^0-9]", "")}"
      val q = input.toDF().toDF("event_id", "et")
        .withColumn("ets", timestamp_micros(col("et")))
        .withWatermark("ets", watermark)
        .groupBy(window(col("ets"), "1 hour"))
        .count()
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Update()).start()
      try {
        ev.grouped(math.max(1, n / 5)).foreach { chunk =>
          input.addData(chunk.map(e => (e._1, e._2)))
          q.processAllAvailable()
        }
        val counted = spark.table(name)
          .groupBy("window").agg(max("count").as("c"))
          .agg(sum("c")).as[Long].head()
        n - counted
      } finally {
        q.stop()
        spark.sql(s"DROP VIEW IF EXISTS $name")
      }
    }
    val tight = streamDropCount("600 seconds")
    // Max lateness is the full ±2 h jitter SPREAD (a −2 h-jittered
    // event can trail a +2 h-jittered one), so only a >4 h watermark
    // guarantees zero drops.
    val loose = streamDropCount("14500 seconds")
    assert(loose === 0L, s"a >4h watermark must drop nothing: $loose")
    assert(tight > 0L && tight <= profileDrops,
      s"stream drops ($tight) bounded by the batch profile ($profileDrops)")
  }

  test("incrementalDedupIngest probes then grows the index per batch") {
    import graft.ops.Dedup
    import graft.sources.Layout
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.core.Graft
      .table(spark, "/root/testdata/sf0.01", "documents")
      .filter(col("doc_id") < 1000)
      .select("doc_id", "text")
    val idx0 = docs.filter(col("doc_id") < 250)
    val b1df = docs.filter(col("doc_id") >= 250 && col("doc_id") < 375)
    val b2df = docs.filter(col("doc_id") >= 375)
    Seq("ing_pairs", "ing_bands", "ing_toks").foreach(t =>
      graft.sources.Layout.drop(spark, t))
    Layout.writeBucketed(
      Dedup.lshBands(idx0, "doc_id", "text", 16, 4),
      "ing_bands", "band_hash")
    Dedup.tokenIndex(idx0, "doc_id", "text")
      .write.mode("overwrite").saveAsTable("ing_toks")
    val bandsBefore = spark.table("ing_bands").count()

    val input = MemoryStream[(Long, String)]
    val ckpt = java.nio.file.Files
      .createTempDirectory("ing_ckpt").toString
    val q = EventStream.incrementalDedupIngest(
      input.toDF().toDF("doc_id", "text"),
      "ing_bands", "ing_toks", "ing_pairs", ckpt)
    try {
      input.addData(b1df.as[(Long, String)].collect().toSeq)
      q.processAllAvailable()
      input.addData(b2df.as[(Long, String)].collect().toSeq)
      q.processAllAvailable()

      // Batch-parity: batch 1 dedups against the seed index; batch 2
      // against seed ∪ batch 1 (the probe-then-append contract).
      def pairsOf(b: org.apache.spark.sql.DataFrame,
          idx: org.apache.spark.sql.DataFrame) =
        Dedup.incrementalNearDups(b, idx, "doc_id", "text")
          .select("batch_id", "index_id")
          .as[(Long, Long)].collect().toSet
      val expected = pairsOf(b1df, idx0) ++
        pairsOf(b2df, idx0.unionByName(b1df))
      val got = spark.table("ing_pairs")
        .select("batch_id", "index_id")
        .as[(Long, Long)].collect().toSet
      assert(got === expected,
        s"ingest pairs must match the sequential batch computation " +
          s"(${got.size} vs ${expected.size})")
      // The index grew by both batches' bands. (Refresh: this
      // session cached the table's file listing at the pre-count.)
      spark.catalog.refreshTable("ing_bands")
      val grown = spark.table("ing_bands").count()
      assert(grown === bandsBefore +
        Dedup.lshBands(b1df.unionByName(b2df), "doc_id", "text", 16, 4)
          .count())
    } finally {
      q.stop()
      Seq("ing_pairs", "ing_bands", "ing_toks").foreach(t =>
        graft.sources.Layout.drop(spark, t))
    }
  }

  test("incrementalVectorIngest probes the codes index then appends per batch") {
    import graft.ops.Similarity
    import graft.sources.Layout
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    val emb = graft.core.Graft
      .table(spark, "/root/testdata/sf0.01", "embeddings")
      .select("vec_id", "embedding")
    val seed = emb.filter(col("vec_id") < 250)
    val b1df = emb.filter(col("vec_id") >= 250 && col("vec_id") < 375)
    val b2df = emb.filter(col("vec_id") >= 375)
    Seq("ving_out", "ving_idx", "ving_vecs", "ving_cents").foreach(t =>
      graft.sources.Layout.drop(spark, t))
    // Bootstrap: codebook trained on the seed ONLY (frozen), seed codes
    // bucketed, seed float vectors stored.
    val cents = Similarity.trainCentroids(
      seed, "vec_id", "embedding", k = 8, iters = 2)
    Layout.replaceTable(spark, cents, "ving_cents")
    Layout.replaceBucketed(spark,
      Similarity.buildIvfSq8Index(seed, spark.table("ving_cents"),
        "vec_id", "embedding"),
      "ving_idx", "cell_id", buckets = 8)
    Layout.replaceTable(spark, seed, "ving_vecs")

    val input = MemoryStream[(Long, Array[Float])]
    val ckpt = java.nio.file.Files
      .createTempDirectory("ving_ckpt").toString
    val q = EventStream.incrementalVectorIngest(
      input.toDF().toDF("vec_id", "embedding"),
      "ving_cents", "ving_idx", "ving_vecs", "ving_out", ckpt,
      "vec_id", "embedding", k = 3, nProbe = 2, shortlist = 10,
      buckets = 8)
    try {
      input.addData(b1df.as[(Long, Array[Float])].collect().toSeq)
      q.processAllAvailable()
      input.addData(b2df.as[(Long, Array[Float])].collect().toSeq)
      q.processAllAvailable()
      // Batch parity: batch 1 matches against the seed; batch 2
      // against seed ∪ batch 1 — both via the inline (non-persisted)
      // path, same frozen codebook.
      def topk(b: org.apache.spark.sql.DataFrame,
          corpus: org.apache.spark.sql.DataFrame) =
        Similarity.ivfSq8TopK(corpus, b, cents,
            "vec_id", "embedding", k = 3, nProbe = 2, shortlist = 10)
          .select("query_id", "neighbor_id", "rank")
          .as[(Long, Long, Int)].collect().toSet
      val expected = topk(b1df, seed) ++
        topk(b2df, seed.unionByName(b1df))
      spark.catalog.refreshTable("ving_out")
      val got = spark.table("ving_out")
        .select("batch_id", "index_id", "rank")
        .as[(Long, Long, Int)].collect().toSet
      assert(got === expected,
        s"vector ingest must match the sequential batch computation " +
          s"(${got.size} vs ${expected.size})")
      // Index and vector store both grew by the two batches.
      spark.catalog.refreshTable("ving_idx")
      spark.catalog.refreshTable("ving_vecs")
      assert(spark.table("ving_idx").count() === emb.count())
      assert(spark.table("ving_vecs").count() === emb.count())
    } finally {
      q.stop()
      Seq("ving_out", "ving_idx", "ving_vecs", "ving_cents").foreach(t =>
        graft.sources.Layout.drop(spark, t))
    }
  }

  test("incrementalImageIngest probes the dHash band index then appends per batch") {
    import graft.ops.ImageHash
    import graft.queries.MediaFixtures
    import graft.sources.Layout
    implicit val sqlCtx = spark.sqlContext
    // Images sharing a base pattern (id % 6) are near-dups: the per-id
    // brightness shift (id % 4) is constant across pixels, so the
    // dHash gradient signs — and the hash — are identical per base.
    def img(id: Long): Array[Byte] = {
      val base = (id % 6).toInt
      val px = Array.tabulate(18 * 16)(i =>
        ((base * 7 + (i % 18) * 3 + (i / 18) * 5) % 200 +
          (id % 4)).toByte)
      MediaFixtures.pngFromPixels(18, 16, 1, px, _ => 0)
    }
    val all = (0L until 24L).map(id => (id, img(id)))
    val idx0 = all.filter(_._1 < 8)
    val b1 = all.filter(t => t._1 >= 8 && t._1 < 16)
    val b2 = all.filter(_._1 >= 16)
    Seq("img_bands", "img_pairs").foreach(Layout.drop(spark, _))
    def hashed(rows: Seq[(Long, Array[Byte])]) =
      ImageHash.dhash(spark, rows.toDF("id", "bytes"), "id", "bytes")
    Layout.writeBucketed(ImageHash.bandIndexRows(hashed(idx0), "id"),
      "img_bands", "band_key")
    val input = MemoryStream[(Long, Array[Byte])]
    val ckpt = java.nio.file.Files
      .createTempDirectory("img_ckpt").toString
    val q = EventStream.incrementalImageIngest(
      input.toDF().toDF("id", "bytes"), "img_bands", "img_pairs", ckpt)
    try {
      input.addData(b1)
      q.processAllAvailable()
      input.addData(b2)
      q.processAllAvailable()
      // Batch parity: batch 1 probes the seed; batch 2 probes
      // seed ∪ batch 1 (the probe-then-append contract).
      def pairsOf(batch: Seq[(Long, Array[Byte])],
          idx: Seq[(Long, Array[Byte])]) =
        ImageHash.incrementalPairsFromIndex(hashed(batch),
            ImageHash.bandIndexRows(hashed(idx), "id"), "id")
          .select("batch_id", "index_id")
          .as[(Long, Long)].collect().toSet
      val expected = pairsOf(b1, idx0) ++ pairsOf(b2, idx0 ++ b1)
      val got = spark.table("img_pairs")
        .select("batch_id", "index_id")
        .as[(Long, Long)].collect().toSet
      assert(got.nonEmpty, "fixture must produce cross-batch near-dups")
      assert(got === expected)
      // The index grew by both batches' band rows (4 per image).
      spark.catalog.refreshTable("img_bands")
      assert(spark.table("img_bands").count() === 24L * 4)
    } finally {
      q.stop()
      Seq("img_bands", "img_pairs").foreach(Layout.drop(spark, _))
    }
  }

  test("incrementalPostingsIngest grows the lexical index; probe equals batch rebuild") {
    import graft.ops.Retrieval
    import graft.sources.Layout
    import org.apache.spark.sql.functions.{col, lit}
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.core.Graft
      .table(spark, "/root/testdata/sf0.01", "documents")
      .filter(col("doc_id") < 1000)
      .select("doc_id", "text")
    val seed = docs.filter(col("doc_id") < 400)
    val b1df = docs.filter(col("doc_id") >= 400 && col("doc_id") < 700)
    val b2df = docs.filter(col("doc_id") >= 700)
    val terms = Seq("spark", "join", "stream")
    Seq("ping_post", "ping_stats", "ping_out").foreach(t =>
      graft.sources.Layout.drop(spark, t))
    Layout.writeBucketed(
      Retrieval.bm25Postings(seed, "doc_id", "text"),
      "ping_post", "term", buckets = 8)
    Retrieval.bm25StatsPartial(seed, "doc_id", "text")
      .withColumn("ingest_batch", lit(-1L))
      .write.mode("overwrite").saveAsTable("ping_stats")

    val input = MemoryStream[(Long, String)]
    val ckpt = java.nio.file.Files
      .createTempDirectory("ping_ckpt").toString
    val q = EventStream.incrementalPostingsIngest(
      input.toDF().toDF("doc_id", "text"),
      "ping_post", "ping_stats", "ping_out", ckpt, terms, k = 10,
      buckets = 8)
    try {
      input.addData(b1df.as[(Long, String)].collect().toSeq)
      q.processAllAvailable()
      input.addData(b2df.as[(Long, String)].collect().toSeq)
      q.processAllAvailable()
      // The last emitted top-k must equal a from-scratch BM25 over
      // everything ingested so far (seed ∪ b1 ∪ b2): the appended
      // postings + folded stats partials are exactly the full corpus.
      spark.catalog.refreshTable("ping_out")
      val lastBatch = spark.table("ping_out")
        .agg(org.apache.spark.sql.functions.max("ingest_batch"))
        .head.getLong(0)
      val got = spark.table("ping_out")
        .where(col("ingest_batch") === lastBatch)
        .select("doc_id", "rank", "score")
        .as[(Long, Int, Double)].collect().toSet
      val want = Retrieval.bm25TopK(docs, "doc_id", "text", terms,
          k = 10)
        .select("doc_id", "rank", "score")
        .as[(Long, Int, Double)].collect().toSet
      assert(got === want,
        s"stored-index probe after ingest must equal batch rebuild " +
          s"($got vs $want)")
      // Folded stats are exact (integer totals divided once).
      spark.catalog.refreshTable("ping_stats")
      val merged = Retrieval.bm25MergeStats(spark.table("ping_stats"))
        .head
      val full = Retrieval.bm25CorpusStats(docs, "doc_id", "text").head
      assert(merged.getLong(0) == full.getLong(0) &&
        math.abs(merged.getDouble(1) - full.getDouble(1)) < 1e-12)
      // Replay heal: a re-appended identical tagged partial folds away.
      spark.table("ping_stats").where(col("ingest_batch") === lastBatch)
        .write.mode("append").saveAsTable("ping_stats")
      spark.catalog.refreshTable("ping_stats")
      val healed = Retrieval.bm25MergeStats(spark.table("ping_stats"))
        .head
      assert(healed.getLong(0) == full.getLong(0))
    } finally {
      q.stop()
      Seq("ping_post", "ping_stats", "ping_out").foreach(t =>
        graft.sources.Layout.drop(spark, t))
    }
  }

  test("incrementalHistIngest: streamed quantile index equals a batch build") {
    import graft.ops.Stats
    import graft.sources.Layout
    import org.apache.spark.sql.functions.{col, lit}
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.core.Graft
      .table(spark, "/root/testdata/sf0.01", "documents")
      .select(col("lang"), col("n_chars").cast("double").as("v"))
      .where(col("lang").isNotNull && col("v").isNotNull)
    val seed = docs.limit(200).localCheckpoint(true)
    val rest = docs.exceptAll(seed).localCheckpoint(true)
    val ps = Seq(0.5, 0.9)
    Seq("hing_idx", "hing_out").foreach(t =>
      graft.sources.Layout.drop(spark, t))
    Layout.writeBucketed(
      Stats.histPartials(seed.withColumn("_shard", lit(-1L)),
        "lang", "_shard", "v", 0.0, 1024.0, 256),
      "hing_idx", "lang", buckets = 4)
    val input = MemoryStream[(String, Double)]
    val ckpt = java.nio.file.Files
      .createTempDirectory("hing_ckpt").toString
    val q = EventStream.incrementalHistIngest(
      input.toDF().toDF("lang", "v"), "hing_idx", "hing_out", ckpt,
      "lang", "v", 0.0, 1024.0, 256, ps, buckets = 4)
    try {
      input.addData(rest.as[(String, Double)].collect().toSeq)
      q.processAllAvailable()
      spark.catalog.refreshTable("hing_out")
      val lastBatch = spark.table("hing_out")
        .agg(org.apache.spark.sql.functions.max("ingest_batch"))
        .head.getLong(0)
      val got = spark.table("hing_out")
        .where(col("ingest_batch") === lastBatch)
        .select("lang", "p", "n", "est")
        .as[(String, Double, Long, Double)].collect().toSet
      val want = Stats.histPercentiles(
          seed.unionByName(rest), "lang", "v", 0.0, 1024.0, 256, ps)
        .as[(String, Double, Long, Double)].collect().toSet
      assert(got === want,
        "streamed hist index must answer exactly like a batch build")
      // Replay heal: duplicate the last shard's rows, compact, same
      // answer (the batch-id shard tag makes replays exact dups).
      val dup = spark.table("hing_idx")
      dup.write.mode("append").bucketBy(4, "lang")
        .format("parquet").saveAsTable("hing_idx")
      spark.catalog.refreshTable("hing_idx")
      Layout.compactBucketed(spark, "hing_idx", "lang", buckets = 4)
      val healed = Stats.histPercentilesFromIndex(
          spark.table("hing_idx"), "lang", 0.0, 1024.0, 256, ps)
        .as[(String, Double, Long, Double)].collect().toSet
      assert(healed === want)
    } finally {
      q.stop()
      Seq("hing_idx", "hing_out").foreach(t =>
        graft.sources.Layout.drop(spark, t))
    }
  }

  test("exifScrubLedger appends per-batch closed-loop audit rows") {
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    graft.sources.Layout.drop(spark, "exif_ledger")
    val input = MemoryStream[(Long, String, String)]
    val ckpt = java.nio.file.Files
      .createTempDirectory("exif_ckpt").toString
    val q = EventStream.exifScrubLedger(
      input.toDF().toDF("doc_id", "text", "source"),
      "exif_ledger", ckpt, "doc_id", "text", "source")
    try {
      // Batch 0: ids 3,6 carry GPS (id % 3 == 0), 4 does not.
      input.addData(Seq((3L, "a", "web"), (4L, "b", "web"),
        (6L, "c", "lab")))
      q.processAllAvailable()
      input.addData(Seq((9L, "d", "web")))
      q.processAllAvailable()
      spark.catalog.refreshTable("exif_ledger")
      val rows = spark.table("exif_ledger")
        .select("source", "ingest_batch", "n_images", "n_gps",
          "n_gps_after_scrub", "bytes_saved")
        .as[(String, Long, Long, Long, Long, Long)]
        .collect().map(r => (r._1, r._2) -> r).toMap
      assert(rows.keySet ===
        Set(("web", 0L), ("lab", 0L), ("web", 1L)))
      assert(rows(("web", 0L))._3 === 2L) // n_images
      assert(rows(("web", 0L))._4 === 1L) // n_gps (doc 3)
      assert(rows(("lab", 0L))._4 === 1L) // doc 6
      assert(rows(("web", 1L))._4 === 1L) // doc 9
      rows.values.foreach { r =>
        assert(r._5 === 0L, "release gate: zero GPS after scrub")
        assert(r._6 === r._4 * 114L, "APP1 removal saves 114 bytes each")
      }
    } finally {
      q.stop()
      graft.sources.Layout.drop(spark, "exif_ledger")
    }
  }

  test("blocklistLedger appends per-(source, pattern, batch) hit rows") {
    implicit val sqlCtx = spark.sqlContext
    graft.sources.Layout.drop(spark, "block_ledger")
    val input = MemoryStream[(Long, String, String)]
    val ckpt = java.nio.file.Files
      .createTempDirectory("block_ckpt").toString
    val q = EventStream.blocklistLedger(
      input.toDF().toDF("doc_id", "text", "source"),
      Seq("bad", "aa"), "block_ledger", ckpt,
      "doc_id", "text", "source")
    try {
      // "aaa" carries TWO overlapping "aa" hits; "clean" carries none
      // and must not appear in the ledger at all.
      input.addData(Seq((1L, "bad aaa", "web"), (2L, "clean", "web"),
        (3L, "bad bad", "lab")))
      q.processAllAvailable()
      input.addData(Seq((4L, "aa", "web")))
      q.processAllAvailable()
      spark.catalog.refreshTable("block_ledger")
      val rows = spark.table("block_ledger")
        .select("source", "pattern", "ingest_batch", "n_docs", "n_hits")
        .as[(String, String, Long, Long, Long)]
        .collect().map(r => (r._1, r._2, r._3) -> (r._4, r._5)).toMap
      assert(rows === Map(
        ("web", "bad", 0L) -> (1L, 1L),
        ("web", "aa", 0L) -> (1L, 2L),
        ("lab", "bad", 0L) -> (1L, 2L),
        ("web", "aa", 1L) -> (1L, 1L)))
    } finally {
      q.stop()
      graft.sources.Layout.drop(spark, "block_ledger")
    }
  }

  test("otDriftMonitor: in-distribution batch scores low, shifted batch scores high") {
    import graft.ops.{Drift, Stats}
    import graft.sources.Layout
    import org.apache.spark.sql.functions.{col, lit}
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.core.Graft
      .table(spark, "/root/testdata/sf0.01", "documents")
      .select(col("lang"), col("n_chars").cast("double").as("v"))
      .where(col("lang").isNotNull && col("v").isNotNull)
      .localCheckpoint(true)
    Seq("otm_idx", "otm_out").foreach(t =>
      graft.sources.Layout.drop(spark, t))
    Layout.replaceTable(spark,
      Stats.histPartials(docs.withColumn("_s", lit(0L)),
        "lang", "_s", "v", 0.0, 1024.0, 256),
      "otm_idx")
    val input = MemoryStream[(String, Double)]
    val ckpt = java.nio.file.Files
      .createTempDirectory("otm_ckpt").toString
    val q = EventStream.otDriftMonitor(
      input.toDF().toDF("lang", "v"), "otm_idx", "otm_out", ckpt,
      "lang", "v", 0.0, 1024.0, nbins = 256, otBins = 16,
      eps = 0.02, iters = 8)
    try {
      // Batch 0: a same-distribution sample. Batch 1: the same rows
      // shifted half the domain — mass must travel ~8 coarse bins.
      val sample = docs.limit(400)
        .as[(String, Double)].collect().toSeq
      input.addData(sample)
      q.processAllAvailable()
      input.addData(sample.map { case (g, v) =>
        (g, math.min(v + 512.0, 1023.0)) })
      q.processAllAvailable()
      spark.catalog.refreshTable("otm_out")
      val out = spark.table("otm_out")
        .select("lang", "ingest_batch", "ot_cost")
        .as[(String, Long, Double)].collect()
        .groupBy(_._2).map { case (b, rows) =>
          b -> rows.map(r => r._1 -> r._3).toMap }
      assert(out.keySet === Set(0L, 1L))
      val langs = out(0L).keySet intersect out(1L).keySet
      assert(langs.nonEmpty)
      langs.foreach { g =>
        assert(out(1L)(g) > out(0L)(g) + 0.1,
          s"$g: shifted batch must alarm: b0=${out(0L)(g)} b1=${out(1L)(g)}")
      }
      // Parity: the monitor's batch-0 rows equal a direct
      // sinkhornFromHists call on the same histograms.
      val w = 1024.0 / 256
      val bHist = sample.toDF("lang", "v")
        .select(col("lang").as("_g"),
          (org.apache.spark.sql.functions.least(
            org.apache.spark.sql.functions.greatest(
              org.apache.spark.sql.functions.floor(col("v") / lit(w)),
              lit(0)), lit(255)).cast("long") / lit(16L))
            .cast("long").as("_b"))
        .groupBy("_g", "_b")
        .agg(org.apache.spark.sql.functions.count(lit(1)).as("_cnt"))
      val ref = spark.table("otm_idx")
        .select((col("b") / lit(16L)).cast("long").as("_b"),
          col("cnt").as("_cnt"))
        .groupBy("_b")
        .agg(org.apache.spark.sql.functions.sum("_cnt").as("_cnt"))
      val direct = Drift.sinkhornFromHists(bHist, ref, 16,
          eps = 0.02, iters = 8)
        .select(col("_g"), col("ot_cost"))
        .as[(String, Double)].collect().toMap
      assert(direct === out(0L))
    } finally {
      q.stop()
      Seq("otm_idx", "otm_out").foreach(t =>
        graft.sources.Layout.drop(spark, t))
    }
  }

  test("incrementalClusterIngest maintains the stored cluster map across batches") {
    import graft.ops.{Components, Dedup}
    import graft.sources.Layout
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.core.Graft
      .table(spark, "/root/testdata/sf0.01", "documents")
      .filter(col("doc_id") < 1000)
      .select("doc_id", "text")
    val seed = docs.filter(col("doc_id") < 250)
    val b1df = docs.filter(col("doc_id") >= 250 && col("doc_id") < 375)
    val b2df = docs.filter(col("doc_id") >= 375)
    Seq("cing_bands", "cing_toks", "cing_cmap").foreach(t =>
      graft.sources.Layout.drop(spark, t))
    Layout.writeBucketed(
      Dedup.lshBands(seed, "doc_id", "text", 16, 4),
      "cing_bands", "band_hash")
    Dedup.tokenIndex(seed, "doc_id", "text")
      .write.mode("overwrite").saveAsTable("cing_toks")
    Components.writeClusterIndex(spark, seed, "doc_id",
      Dedup.minhashNearDups(seed, "doc_id", "text"),
      "id_a", "id_b", "cing_cmap")

    val input = MemoryStream[(Long, String)]
    val ckpt = java.nio.file.Files
      .createTempDirectory("cing_ckpt").toString
    val q = EventStream.incrementalClusterIngest(
      input.toDF().toDF("doc_id", "text"),
      "cing_bands", "cing_toks", "cing_cmap", ckpt)
    try {
      input.addData(b1df.as[(Long, String)].collect().toSeq)
      q.processAllAvailable()
      input.addData(b2df.as[(Long, String)].collect().toSeq)
      q.processAllAvailable()
      // Parity with a full rebuild over the SAME pair set the ingest
      // saw: per-batch internals + the stored-index cross probes,
      // replayed sequentially (the probe-then-append contract).
      def cross(b: org.apache.spark.sql.DataFrame,
          idx: org.apache.spark.sql.DataFrame) =
        Dedup.incrementalNearDupsFromIndex(b, "doc_id", "text",
            Dedup.lshBands(idx, "doc_id", "text", 16, 4),
            Dedup.tokenIndex(idx, "doc_id", "text"))
          .select(col("batch_id").as("id_a"),
            col("index_id").as("id_b"))
      val allPairs = Dedup.minhashNearDups(seed, "doc_id", "text")
        .select("id_a", "id_b")
        .union(Dedup.minhashNearDups(b1df, "doc_id", "text")
          .select("id_a", "id_b"))
        .union(cross(b1df, seed))
        .union(Dedup.minhashNearDups(b2df, "doc_id", "text")
          .select("id_a", "id_b"))
        .union(cross(b2df, seed.unionByName(b1df)))
      val want = Components.dedupClusters(docs, "doc_id", allPairs,
          "id_a", "id_b")
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      spark.catalog.refreshTable("cing_cmap")
      val got = Components
        .clustersFromIndex(Layout.table(spark, "cing_cmap"))
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(got === want,
        s"maintained cluster map must equal the full rebuild " +
          s"(${got.size} vs ${want.size} docs)")
    } finally {
      q.stop()
      Seq("cing_bands", "cing_toks", "cing_cmap").foreach(t =>
        graft.sources.Layout.drop(spark, t))
    }
  }

  test("incrementalAnchorIngest: a landed batch flips the served fielded ranking; replay is a no-op") {
    // Round 18 (VERDICT r17 task 8): the anchor-postings maintainer.
    // Batch 1 lands two body-only docs (doc 1 is the sole term
    // scorer); batch 2 lands a doc whose anchor calls doc 2's page
    // "solar panel datasheet" — the SERVED ranking from the maintained
    // index must flip to doc 2 (the q413/RetrievalChunkSpec flip) and
    // equal the batch bm25TopKWithAnchors over everything landed.
    // Then the crash-replay leg: drop commits/1 and restart — the
    // replayed batch must not touch a single index file.
    import graft.ops.{Retrieval, TextAnalysis, WebCorpus}
    import graft.sources.Layout
    import org.apache.spark.sql.functions.{col, lit, size}
    implicit val sqlCtx = spark.sqlContext
    val tables = Seq("ap_bpost", "ap_bstats", "ap_edges", "ap_docs",
      "ap_apost", "ap_dgen", "ap_out")
    tables.foreach(Layout.drop(spark, _))
    val empty = Seq.empty[(Long, String, String, String)]
      .toDF("doc_id", "url", "text", "html")
    Layout.writeBucketed(Retrieval.bm25Postings(empty, "doc_id", "text"),
      "ap_bpost", "term", buckets = 8)
    Retrieval.bm25StatsPartial(empty, "doc_id", "text")
      .where(lit(false)).withColumn("ingest_batch", lit(-1L))
      .write.mode("overwrite").saveAsTable("ap_bstats")
    Layout.writeBucketed(WebCorpus.anchorEdgeCounts(empty, "url", "html"),
      "ap_edges", "dst_url", buckets = 8)
    Layout.writeBucketed(
      empty.select(col("doc_id"), col("url").as("dst_url")),
      "ap_docs", "dst_url", buckets = 8)
    Layout.writeBucketed(
      Retrieval.bm25Postings(
          empty.select(col("doc_id"), col("text").as("anchor_text")),
          "doc_id", "anchor_text")
        .withColumn("gen", lit(-1L)),
      "ap_apost", "term", buckets = 8)
    Layout.writeBucketed(
      empty.select(col("doc_id"),
          size(TextAnalysis.tokens(col("text"))).as("dl"))
        .withColumn("gen", lit(-1L)),
      "ap_dgen", "doc_id", buckets = 8)

    val b1 = Seq(
      (1L, "http://w.example/a", "solar energy systems overview",
        "<p>no links</p>"),
      (2L, "http://w.example/b", "generic review of tools",
        "<p>no links</p>"))
    val b2 = Seq(
      (3L, "http://w.example/c", "unrelated filler text here",
        "<a href=\"http://w.example/b\">solar panel datasheet</a>"))
    val terms = Seq("solar", "panel")
    val input = MemoryStream[(Long, String, String, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("ap_ckpt").toString
    def start() = EventStream.incrementalAnchorIngest(
      input.toDF().toDF("doc_id", "url", "text", "html"),
      "ap_bpost", "ap_bstats", "ap_edges", "ap_docs", "ap_apost",
      "ap_dgen", "ap_out", ckpt, terms, k = 10, buckets = 8,
      anchorWeight = 2.0)
    def served(batch: Long): Seq[(Long, Int, Double)] = {
      spark.catalog.refreshTable("ap_out")
      spark.table("ap_out").where(col("ingest_batch") === batch)
        .select("doc_id", "rank", "score")
        .as[(Long, Int, Double)].collect().sortBy(_._2).toSeq
    }
    def dirState(table: String): Map[String, (Long, Long)] = {
      val wh = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"))
      val dir = new org.apache.hadoop.fs.Path(wh, table)
      val hfs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      hfs.listStatus(dir).filter(_.isFile)
        .filter(_.getPath.getName.endsWith(".parquet"))
        .map(f => f.getPath.getName ->
          (f.getLen, f.getModificationTime)).toMap
    }

    val q = start()
    try {
      input.addData(b1)
      q.processAllAvailable()
      // body-only world: doc 1 is the sole scorer
      assert(served(0L).map(_._1) === Seq(1L))
      input.addData(b2)
      q.processAllAvailable()
      val got = served(1L)
      // the landed anchors flip the served ranking to doc 2
      assert(got.head._1 === 2L, s"expected the anchor flip, got $got")
      // parity: the maintained index serves exactly the batch twin
      val all = (b1 ++ b2).toDF("doc_id", "url", "text", "html")
      val want = Retrieval.bm25TopKWithAnchors(all,
          WebCorpus.anchorTextField(all, "url", "html"), "doc_id",
          "text", "url", terms, k = 10, anchorWeight = 2.0)
        .as[(Long, Int, Double)].collect().sortBy(_._2).toSeq
      assert(got === want, s"served $got != batch twin $want")
    } finally q.stop()

    val before = tables.map(t => t -> dirState(t)).toMap
    // crash: offsets/1 survives, commits/1 is lost → restart replays 1
    assert(new java.io.File(s"$ckpt/commits/1").delete())
    new java.io.File(s"$ckpt/commits/.1.crc").delete()
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (spark.streams.active.nonEmpty && System.nanoTime() < deadline)
      Thread.sleep(100)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    try {
      val after = tables.map(t => t -> dirState(t)).toMap
      assert(after === before,
        "replay must not touch a single index file (name+size+mtime)")
    } finally tables.foreach(Layout.drop(spark, _))
  }

  test("incrementalAnchorIngest: markup-free WET batches maintain; HTML anchors re-rank a plain doc") {
    // Round 19 (VERDICT r18 task 7): a WET/text-plain ingest has no
    // markup — docs land with html = null. Their BODY postings and
    // docs-dimension rows must still maintain (null anchors contribute
    // zero edges), and a LATER HTML batch whose anchor describes an
    // earlier plain doc's page must re-rank it exactly like an HTML
    // sibling. Parity against the batch twin over the mixed corpus.
    import graft.ops.{Retrieval, TextAnalysis, WebCorpus}
    import graft.sources.Layout
    import org.apache.spark.sql.functions.{col, lit, size}
    implicit val sqlCtx = spark.sqlContext
    val tables = Seq("apw_bpost", "apw_bstats", "apw_edges", "apw_docs",
      "apw_apost", "apw_dgen", "apw_out")
    tables.foreach(Layout.drop(spark, _))
    val empty = Seq.empty[(Long, String, String, String)]
      .toDF("doc_id", "url", "text", "html")
    Layout.writeBucketed(Retrieval.bm25Postings(empty, "doc_id", "text"),
      "apw_bpost", "term", buckets = 8)
    Retrieval.bm25StatsPartial(empty, "doc_id", "text")
      .where(lit(false)).withColumn("ingest_batch", lit(-1L))
      .write.mode("overwrite").saveAsTable("apw_bstats")
    Layout.writeBucketed(WebCorpus.anchorEdgeCounts(empty, "url", "html"),
      "apw_edges", "dst_url", buckets = 8)
    Layout.writeBucketed(
      empty.select(col("doc_id"), col("url").as("dst_url")),
      "apw_docs", "dst_url", buckets = 8)
    Layout.writeBucketed(
      Retrieval.bm25Postings(
          empty.select(col("doc_id"), col("text").as("anchor_text")),
          "doc_id", "anchor_text")
        .withColumn("gen", lit(-1L)),
      "apw_apost", "term", buckets = 8)
    Layout.writeBucketed(
      empty.select(col("doc_id"),
          size(TextAnalysis.tokens(col("text"))).as("dl"))
        .withColumn("gen", lit(-1L)),
      "apw_dgen", "doc_id", buckets = 8)

    // batch 1: a MIXED markup-free batch (fromWet shape — html null)
    val b1 = Seq(
      (1L, "http://p.example/wet-a", "solar energy systems overview",
        null: String),
      (2L, "http://p.example/wet-b", "generic review of tools",
        null: String))
    // batch 2: an HTML doc whose anchor describes the plain doc 2
    val b2 = Seq(
      (3L, "http://p.example/h", "unrelated filler text here",
        "<a href=\"http://p.example/wet-b\">solar panel datasheet</a>"))
    val terms = Seq("solar", "panel")
    val input = MemoryStream[(Long, String, String, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("apw_ckpt").toString
    val q = EventStream.incrementalAnchorIngest(
      input.toDF().toDF("doc_id", "url", "text", "html"),
      "apw_bpost", "apw_bstats", "apw_edges", "apw_docs", "apw_apost",
      "apw_dgen", "apw_out", ckpt, terms, k = 10, buckets = 8,
      anchorWeight = 2.0)
    def served(batch: Long): Seq[(Long, Int, Double)] = {
      spark.catalog.refreshTable("apw_out")
      spark.table("apw_out").where(col("ingest_batch") === batch)
        .select("doc_id", "rank", "score")
        .as[(Long, Int, Double)].collect().sortBy(_._2).toSeq
    }
    try {
      input.addData(b1)
      q.processAllAvailable()
      // markup-free world: body postings alone serve; doc 1 scores
      assert(served(0L).map(_._1) === Seq(1L),
        "WET-only batch must maintain body postings")
      input.addData(b2)
      q.processAllAvailable()
      val got = served(1L)
      assert(got.head._1 === 2L,
        s"HTML anchors must re-rank the earlier plain doc, got $got")
      val all = (b1 ++ b2).toDF("doc_id", "url", "text", "html")
      val want = Retrieval.bm25TopKWithAnchors(all,
          WebCorpus.anchorTextField(all, "url", "html"), "doc_id",
          "text", "url", terms, k = 10, anchorWeight = 2.0)
        .as[(Long, Int, Double)].collect().sortBy(_._2).toSeq
      assert(got === want, s"served $got != batch twin $want")
    } finally {
      q.stop()
      tables.foreach(Layout.drop(spark, _))
    }
  }

  test("crash-replayed micro-batch is a no-op: index files byte-identical, zero compaction") {
    // Round-14 exactly-once contract (VERDICT r13 task 2): kill the
    // commit record of the LAST batch — the real crash-recovery shape:
    // Structured Streaming finds offsets/N without commits/N on
    // restart and REPLAYS batch N into foreachBatch. The batch-id-
    // keyed idempotent appends must skip it wholesale: every index
    // file keeps its exact name, size, and mtime (untouched, not
    // rewritten), so no distinct/compaction heal is ever needed.
    import graft.ops.Dedup
    import graft.sources.Layout
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.core.Graft
      .table(spark, "/root/testdata/sf0.01", "documents")
      .filter(col("doc_id") < 300)
      .select("doc_id", "text")
    val idx0 = docs.filter(col("doc_id") < 150)
    val b1df = docs.filter(col("doc_id") >= 150 && col("doc_id") < 225)
    val b2df = docs.filter(col("doc_id") >= 225)
    Seq("rp_pairs", "rp_bands", "rp_toks").foreach(Layout.drop(spark, _))
    Layout.writeBucketed(
      Dedup.lshBands(idx0, "doc_id", "text", 16, 4),
      "rp_bands", "band_hash")
    Dedup.tokenIndex(idx0, "doc_id", "text")
      .write.mode("overwrite").saveAsTable("rp_toks")

    def dirState(table: String): Map[String, (Long, Long)] = {
      val wh = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"))
      val dir = new org.apache.hadoop.fs.Path(wh, table)
      val hfs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      hfs.listStatus(dir).filter(_.isFile)
        .filter(_.getPath.getName.endsWith(".parquet"))
        .map(f => f.getPath.getName ->
          (f.getLen, f.getModificationTime)).toMap
    }

    val input = MemoryStream[(Long, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("rp_ckpt").toString
    def start() = EventStream.incrementalDedupIngest(
      input.toDF().toDF("doc_id", "text"),
      "rp_bands", "rp_toks", "rp_pairs", ckpt)
    val q = start()
    try {
      input.addData(b1df.as[(Long, String)].collect().toSeq)
      q.processAllAvailable()
      input.addData(b2df.as[(Long, String)].collect().toSeq)
      q.processAllAvailable()
    } finally q.stop()
    val before = Seq("rp_pairs", "rp_bands", "rp_toks")
      .map(t => t -> dirState(t)).toMap
    val pairsBefore = spark.table("rp_pairs")
      .select("batch_id", "index_id", "ingest_batch")
      .as[(Long, Long, Long)].collect().sorted.toSeq

    // crash: offsets/1 survives, commits/1 is lost → restart replays 1
    assert(new java.io.File(s"$ckpt/commits/1").delete())
    new java.io.File(s"$ckpt/commits/.1.crc").delete() // local-FS checksum twin
    // the stopped run deregisters from the checkpoint guard async
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (spark.streams.active.nonEmpty && System.nanoTime() < deadline)
      Thread.sleep(100)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    try {
      val after = Seq("rp_pairs", "rp_bands", "rp_toks")
        .map(t => t -> dirState(t)).toMap
      assert(after === before,
        "replay must not touch a single index file (name+size+mtime)")
      Seq("rp_pairs", "rp_bands", "rp_toks")
        .foreach(t => spark.catalog.refreshTable(t))
      assert(spark.table("rp_pairs")
        .select("batch_id", "index_id", "ingest_batch")
        .as[(Long, Long, Long)].collect().sorted.toSeq === pairsBefore)
    } finally {
      Seq("rp_pairs", "rp_bands", "rp_toks").foreach(Layout.drop(spark, _))
    }
  }
}
