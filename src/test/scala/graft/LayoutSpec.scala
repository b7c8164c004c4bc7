package graft

import graft.sources.Layout
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed-by-same-key join plans with NO shuffle exchange") {
    val a = (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("k", "va")
    val b = (1 to 1000).map(i => (i.toLong, i * 2.0)).toDF("k", "vb")
    // self-heal any orphan dir a crashed earlier run left behind
    Seq("bucket_a", "bucket_b").foreach(Layout.drop(spark, _))
    Layout.writeBucketed(a, "bucket_a", "k", buckets = 8)
    Layout.writeBucketed(b, "bucket_b", "k", buckets = 8)
    try {
      val joined = Layout.table(spark, "bucket_a")
        .join(Layout.table(spark, "bucket_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() == 1000)
    } finally {
      graft.sources.Layout.drop(spark, "bucket_a")
      graft.sources.Layout.drop(spark, "bucket_b")
    }
  }

  test("persisted minhash index: bucketed probe join, index side never shuffles") {
    import graft.ops.Dedup
    val shared = (1 to 30).map(i => s"t$i").mkString(" ")
    val index = Seq((1L, shared), (2L, "old unrelated corpus entry"),
      (3L, shared + " extra")).toDF("doc_id", "text")
    val batch = Seq((10L, shared), (11L, "fresh unseen news item"))
      .toDF("doc_id", "text")
    // Index build time: bands bucketed on the probe key, toks alongside.
    Seq("mh_idx_bands", "mh_idx_toks").foreach(Layout.drop(spark, _))
    Layout.writeBucketed(Dedup.lshBands(index, "doc_id", "text", 16, 4),
      "mh_idx_bands", "band_hash", buckets = 8)
    Layout.writeBucketed(Dedup.tokenIndex(index, "doc_id", "text"),
      "mh_idx_toks", "doc_id", buckets = 8)
    val prevThreshold =
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      // Disable broadcast so the plan must prove co-partitioning.
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val idxBands = Layout.table(spark, "mh_idx_bands")
      val got = Dedup.incrementalNearDupsFromIndex(batch, "doc_id", "text",
        idxBands, Layout.table(spark, "mh_idx_toks"),
        k = 16, bands = 4, threshold = 0.8)
      // The stored-index path finds what the recompute path finds.
      val want = Dedup.incrementalNearDups(batch, index, "doc_id", "text",
          k = 16, bands = 4, threshold = 0.8)
        .select("batch_id", "index_id").as[(Long, Long)].collect().toSet
      assert(got.select("batch_id", "index_id").as[(Long, Long)]
        .collect().toSet == want && want.contains((10L, 1L)), s"want=$want")
      // Probe join: the index-side scan feeds the join with NO exchange
      // above it — only the batch side repartitions to the bucket key.
      val cand = Dedup.lshBands(batch, "doc_id", "text", 16, 4)
        .select(col("doc_id").as("batch_id"), col("band_hash"))
        .join(idxBands.select(col("doc_id").as("index_id"),
          col("band_hash")), "band_hash")
      val plan = cand.queryExecution.executedPlan.toString
      val exchanges = "Exchange hashpartitioning".r
        .findAllIn(plan).length
      assert(exchanges <= 1, s"index side must not shuffle:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      graft.sources.Layout.drop(spark, "mh_idx_bands")
      graft.sources.Layout.drop(spark, "mh_idx_toks")
    }
  }

  test("persisted IVF+SQ8 index: stored probe matches inline build, index side never shuffles") {
    import graft.ops.Similarity
    // 40 deterministic 8-d vectors in two obvious clusters.
    val vecs = (0 until 40).map { i =>
      val base = if (i % 2 == 0) 1.0f else -1.0f
      (i.toLong, Array.tabulate(8)(d => base * (1.0f + 0.01f * ((i * 7 + d * 3) % 5))))
    }.toDF("vec_id", "embedding")
    val cents = Similarity.trainCentroids(vecs, "vec_id", "embedding", k = 4, iters = 1)
      .localCheckpoint(true)
    Layout.replaceBucketed(spark,
      Similarity.buildIvfSq8Index(vecs, cents, "vec_id", "embedding"),
      "ivf_sq8_test_idx", "cell_id", buckets = 4)
    val prevThreshold =
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      val queries = vecs.filter(col("vec_id") < 3)
      val stored = Similarity.ivfSq8TopKFromIndex(
        vecs, queries, cents, Layout.table(spark, "ivf_sq8_test_idx"),
        "vec_id", "embedding", k = 3, nProbe = 2, shortlist = 10)
      val inline = Similarity.ivfSq8TopK(
        vecs, queries, cents, "vec_id", "embedding",
        k = 3, nProbe = 2, shortlist = 10)
      val got = stored.collect().map(_.toSeq).toSet
      assert(got == inline.collect().map(_.toSeq).toSet && got.nonEmpty)
      // The probe join consumes the bucketed index scan with NO
      // exchange above it: queries broadcast, codes stay in place.
      val probePlan = Layout.table(spark, "ivf_sq8_test_idx")
        .join(broadcast(cents.select(col("vec_id").as("cell_id"),
          col("embedding").as("qvec"))), Seq("cell_id"))
        .queryExecution.executedPlan.toString
      assert(!probePlan.contains("Exchange hashpartitioning"),
        s"index side must not shuffle on probe:\n$probePlan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      graft.sources.Layout.drop(spark, "ivf_sq8_test_idx")
    }
  }

  test("persisted BM25 postings: stored probe matches inline scoring, buckets prune") {
    import graft.ops.Retrieval
    val docs = Seq(
      (1L, "spark join stream spark"), (2L, "join the queue"),
      (3L, "stream of consciousness"), (4L, "unrelated words only"),
      (5L, "spark spark spark join")).toDF("doc_id", "text")
    Layout.replaceBucketed(spark,
      Retrieval.bm25Postings(docs, "doc_id", "text"),
      "bm25_test_postings", "term", buckets = 4)
    Layout.replaceTable(spark,
      Retrieval.bm25CorpusStats(docs, "doc_id", "text"),
      "bm25_test_stats")
    try {
      val terms = Seq("spark", "stream")
      val stored = Retrieval.bm25TopKFromIndex(
        Layout.table(spark, "bm25_test_postings"),
        Layout.table(spark, "bm25_test_stats"), "doc_id", terms, k = 5)
      val inline = Retrieval.bm25TopK(docs, "doc_id", "text", terms, k = 5)
      val got = stored.collect().map(_.toSeq).toSeq
      assert(got == inline.collect().map(_.toSeq).toSeq && got.nonEmpty)
      // The term filter prunes BUCKETS on the stored scan — the probe
      // reads the matching slices, not the whole index (and the plan
      // re-tokenizes nothing: no regexp in sight).
      val plan = stored.queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount"),
        s"expected bucket pruning on the postings scan:\n$plan")
      assert(!plan.toLowerCase.contains("regexp"),
        "stored probe must not re-tokenize the corpus")
    } finally {
      graft.sources.Layout.drop(spark, "bm25_test_postings")
      graft.sources.Layout.drop(spark, "bm25_test_stats")
    }
  }

  test("compactBucketed heals a replayed (double-appended) index") {
    import graft.ops.Dedup
    val shared = (1 to 30).map(i => s"t$i").mkString(" ")
    val index = Seq((1L, shared), (2L, "old unrelated entry"))
      .toDF("doc_id", "text")
    val bands = Dedup.lshBands(index, "doc_id", "text", 16, 4)
    Layout.replaceBucketed(spark, bands, "cmp_bands", "band_hash",
      buckets = 8)
    try {
      val clean = spark.table("cmp_bands").count()
      // simulate an at-least-once replay: the same batch appends twice
      Layout.appendBucketed(bands, "cmp_bands", "band_hash", buckets = 8)
      spark.catalog.refreshTable("cmp_bands")
      assert(spark.table("cmp_bands").count() == 2 * clean)
      Layout.compactBucketed(spark, "cmp_bands", "band_hash", buckets = 8)
      val healed = spark.table("cmp_bands")
      assert(healed.count() == clean)
      // still bucketed: a same-key join plans with no index-side shuffle
      val plan = healed.join(
          Layout.table(spark, "cmp_bands").select("band_hash").distinct()
            .limit(5), "band_hash")
        .queryExecution.executedPlan.toString
      assert(healed.collect().map(_.toSeq).toSet ==
        bands.collect().map(_.toSeq).toSet && plan.nonEmpty)
    } finally {
      graft.sources.Layout.drop(spark, "cmp_bands")
    }
  }

  test("forgetKeys removes a document from every index table it touches") {
    import graft.ops.Dedup
    val shared = (1 to 30).map(i => s"t$i").mkString(" ")
    val docs = Seq((1L, shared), (2L, "keep me around"),
      (3L, shared + " extra")).toDF("doc_id", "text")
    Layout.replaceBucketed(spark,
      Dedup.lshBands(docs, "doc_id", "text", 16, 4),
      "fk_bands", "band_hash", buckets = 8)
    try {
      val gone = Seq(1L).toDF("doc_id")
      Layout.forgetKeys(spark, "fk_bands", "band_hash", "doc_id", gone,
        buckets = 8)
      val left = spark.table("fk_bands")
      assert(left.where(col("doc_id") === 1L).count() == 0)
      // the other documents' band rows survive untouched
      assert(left.select("doc_id").distinct().as[Long].collect().toSet
        == Set(2L, 3L))
      // and the erased doc can no longer be found by a probe
      val probe = Dedup.incrementalNearDupsFromIndex(
        Seq((10L, shared)).toDF("doc_id", "text"), "doc_id", "text",
        left, Dedup.tokenIndex(docs.where(col("doc_id") =!= 1L),
          "doc_id", "text"), k = 16, bands = 4, threshold = 0.5)
      assert(!probe.select("index_id").as[Long].collect().contains(1L))
    } finally {
      graft.sources.Layout.drop(spark, "fk_bands")
    }
  }

  test("stored hist-partials probe rides the group bucket layout: no index-side exchange") {
    import graft.ops.Stats
    val df = (0 until 2000).map(i =>
      ("g" + (i % 5), (i % 4).toLong, (i % 251).toDouble))
      .toDF("g", "shard", "v")
    Layout.replaceBucketed(spark,
      Stats.histPartials(df, "g", "shard", "v", 0.0, 256.0, 64),
      "hp_plan", "g", buckets = 4)
    val prevThreshold =
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // The probe's shard merge groups on (g, b) and its cum window
      // partitions on g — hashpartitioning(g) satisfies BOTH, so the
      // whole stored path plans zero exchanges over the index.
      val probe = Stats.histPercentilesFromIndex(
        Layout.table(spark, "hp_plan"), "g", 0.0, 256.0, 64,
        Seq(0.5, 0.9))
      val plan = probe.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"hist-index probe must ride the bucket layout:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      graft.sources.Layout.drop(spark, "hp_plan")
    }
  }

  test("persisted cluster map: resolve never shuffles the index side, probe plans no minhash") {
    import graft.ops.Components
    val docs = (1L to 100L).toDF("doc_id")
    val pairs = (1L to 40L by 2).map(i => (i, i + 1)).toDF("id_a", "id_b")
    Components.writeClusterIndex(spark, docs, "doc_id", pairs,
      "id_a", "id_b", "cmap_probe", buckets = 8)
    val prevThreshold =
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val idx = Layout.table(spark, "cmap_probe")
      // The every-probe step — newest label per doc — reuses the
      // doc_id bucket layout: NO exchange anywhere in the aggregate.
      val resolved = idx.groupBy(col("doc_id"))
        .agg(min("component").as("component"))
      val rplan = resolved.queryExecution.executedPlan.toString
      assert(!rplan.contains("Exchange hashpartitioning"),
        s"min-resolve must ride the bucket layout:\n$rplan")
      // The full probe carries no minhash fold and no iteration —
      // the whole point of the stored map vs the inline rebuild.
      val full = Components.clustersFromIndex(idx)
      val fplan = full.queryExecution.executedPlan.toString
      assert(!fplan.contains("graft_minhash"),
        s"stored-map probe must not recompute signatures:\n$fplan")
      // Parity with the inline path.
      val got = full.collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      val want = Components
        .dedupClusters(docs, "doc_id", pairs, "id_a", "id_b")
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(got == want)
      // Append-only maintenance keeps the layout: after a merge the
      // resolve STILL plans no exchange over the grown table.
      Components.mergeClusterIndex(spark, "cmap_probe",
        Seq(200L).toDF("doc_id"), "doc_id",
        pairs.limit(0), "id_a", "id_b",
        Seq((200L, 2L)).toDF("batch_id", "index_id"),
        "batch_id", "index_id", buckets = 8)
      val rplan2 = Layout.table(spark, "cmap_probe")
        .groupBy(col("doc_id")).agg(min("component"))
        .queryExecution.executedPlan.toString
      assert(!rplan2.contains("Exchange hashpartitioning"),
        s"post-merge resolve must still ride the bucket layout:\n$rplan2")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      graft.sources.Layout.drop(spark, "cmap_probe")
    }
  }

  test("healthFromIndexes answers from stored indexes only — zero corpus scan") {
    import graft.ops.{CardinalityEstimate, Components, CorpusPipeline, Stats}
    // Corpus: 6 docs across 2 sources; docs 1-2 are a near-dup pair.
    val docs = Seq(
      (1L, "web", 100L), (2L, "web", 120L), (3L, "web", 200L),
      (4L, "lab", 300L), (5L, "lab", 400L), (6L, "lab", 500L))
      .toDF("doc_id", "source", "n_chars")
    val toks = Seq((1L, "web", "a"), (2L, "web", "b"), (4L, "lab", "a"))
      .toDF("doc_id", "source", "token")
    Components.writeClusterIndex(spark, docs, "doc_id",
      Seq((1L, 2L)).toDF("id_a", "id_b"), "id_a", "id_b",
      "dash_cmap", buckets = 4)
    Layout.replaceBucketed(spark, docs.select("doc_id", "source"),
      "dash_docstore", "doc_id", buckets = 4)
    Layout.replaceTable(spark,
      CardinalityEstimate.hllRegisters(toks, "source", "token", p = 6),
      "dash_hll")
    Layout.replaceBucketed(spark,
      Stats.histPartials(docs.withColumn("_s", lit(0L)),
        "source", "_s", "n_chars", 0.0, 1024.0, 256),
      "dash_hist", "source", buckets = 4)
    try {
      val report = CorpusPipeline.healthFromIndexes(
        Layout.table(spark, "dash_cmap"),
        Layout.table(spark, "dash_docstore"),
        Layout.table(spark, "dash_hll"),
        Layout.table(spark, "dash_hist"),
        "source", p = 6, lo = 0.0, hi = 1024.0, nbins = 256)
      // The plan's only leaves are the four stored tables: no
      // in-memory corpus frame, no raw-file scan outside the
      // warehouse — the probe is O(index) at any corpus scale.
      val plan = report.queryExecution.executedPlan.toString
      val localScans = "LocalTableScan \\[[^\\]]*\\]".r
        .findAllIn(plan).toList
      // The only in-memory frame allowed is histPercentilesFromIndex's
      // |ps|-row quantile-literal; every data leaf must be a stored
      // table scan.
      assert(localScans.forall(_.matches("LocalTableScan \\[p#\\d+\\]")),
        s"dashboard must not touch a corpus frame: $localScans\n$plan")
      val rows = report.collect()
        .map(r => r.getString(0) -> r).toMap
      assert(rows.keySet === Set("web", "lab"))
      // Dup exposure from the cluster map: docs 1+2 (web) share a
      // component; everything else is a singleton.
      assert(rows("web").getLong(1) === 3L) // n_docs
      assert(rows("web").getLong(2) === 2L) // n_dup_docs
      assert(rows("web").getLong(3) === 666666L) // dup_ppm
      assert(rows("lab").getLong(2) === 0L)
      // Sketch columns are served (exact math proven in their own
      // suites): tiny cardinalities estimate near-exactly.
      assert(math.abs(rows("web").getDouble(4) - 2.0) < 0.1)
      assert(math.abs(rows("lab").getDouble(4) - 1.0) < 0.1)
      assert(rows("web").getDouble(6) > 0.0) // p50_chars
      assert(rows("lab").getDouble(7) > 0.0) // p90_chars
    } finally {
      Seq("dash_cmap", "dash_docstore", "dash_hll", "dash_hist")
        .foreach(t => graft.sources.Layout.drop(spark, t))
    }
  }

  test("partitioned write prunes directories on partition predicates") {
    val dir = java.nio.file.Files.createTempDirectory("graft_layout").toString
    val df = (2023 to 2026).flatMap(y => (1 to 10).map(i => (y, i.toLong)))
      .toDF("year", "v")
    Layout.writePartitioned(df, dir, Seq("year"))
    val pruned = spark.read.parquet(dir).filter(col("year") === 2024)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() == 10)
    // Partition filter reaches the scan node (pruning, not post-filter).
    assert(scan.contains("PartitionFilters") || scan.contains("year"))
  }

  // ---------------------------------------------------------------
  // Round-14 atomic versioned publication (VERDICT r13 tasks 1/2/8)
  // ---------------------------------------------------------------

  private def warehousePath(sub: String) = new org.apache.hadoop.fs.Path(
    new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir")), sub)
  private def fs = warehousePath("x")
    .getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def fileState(table: String): Map[String, Long] =
    fs.listStatus(warehousePath(table)).filter(_.isFile)
      .filter(_.getPath.getName.endsWith(".parquet"))
      .map(f => f.getPath.getName -> f.getLen).toMap

  test("versioned publish: crash before manifest commit leaves the old index live") {
    val v1 = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    Layout.replaceBucketed(spark, v1, "vp_idx", "k", buckets = 4)
    try {
      // Simulate a publish killed AFTER the new version's table is
      // fully written but BEFORE the manifest advance: the next
      // physical version exists on disk, the manifest does not know.
      Layout.writeBucketed(Seq((9L, "crash")).toDF("k", "v"),
        "vp_idx__v2", "k", buckets = 4)
      // Both read paths still resolve the committed version...
      assert(Layout.table(spark, "vp_idx").select("k")
        .as[Long].collect().toSet == Set(1L, 2L))
      assert(spark.table("vp_idx").select("k")
        .as[Long].collect().toSet == Set(1L, 2L))
      // ...and the NEXT publish sweeps the leftover and commits v2.
      Layout.replaceBucketed(spark,
        Seq((3L, "c")).toDF("k", "v"), "vp_idx", "k", buckets = 4)
      assert(Layout.table(spark, "vp_idx").select("k")
        .as[Long].collect().toSet == Set(3L))
      assert(spark.table("vp_idx").select("k")
        .as[Long].collect().toSet == Set(3L))
    } finally Layout.drop(spark, "vp_idx")
  }

  test("versioned publish: a reader resolved pre-swap keeps its files through the swap") {
    Layout.replaceBucketed(spark,
      Seq((1L, "old")).toDF("k", "v"), "vp_lease", "k", buckets = 4)
    try {
      val pinned = Layout.table(spark, "vp_lease")
      // concurrent writer replaces the index mid-read
      Layout.replaceBucketed(spark,
        Seq((2L, "new")).toDF("k", "v"), "vp_lease", "k", buckets = 4)
      // the already-resolved frame still reads version 1's files (the
      // one-version GC lag is the read lease)...
      assert(pinned.select("v").as[String].collect().toSet == Set("old"))
      // ...while a fresh resolution sees version 2
      assert(Layout.table(spark, "vp_lease").select("v")
        .as[String].collect().toSet == Set("new"))
    } finally Layout.drop(spark, "vp_lease")
  }

  test("forgetKeys: pre-forget version survives on disk until the following publish") {
    Layout.replaceBucketed(spark,
      Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("doc_id", "v"),
      "fk_vers", "doc_id", buckets = 4)
    try {
      Layout.forgetKeys(spark, "fk_vers", "doc_id", "doc_id",
        Seq(1L).toDF("doc_id"), buckets = 4)
      assert(Layout.table(spark, "fk_vers").select("doc_id")
        .as[Long].collect().toSet == Set(2L, 3L))
      // crash-safety window: version 1 (incl. the forgotten row) is
      // still a complete table on disk — a rewrite crash can roll back
      assert(fs.exists(warehousePath("fk_vers__v1")))
      // the next rewrite retires it (the forget becomes irreversible)
      Layout.compactBucketed(spark, "fk_vers", "doc_id", buckets = 4)
      assert(!fs.exists(warehousePath("fk_vers__v1")))
      assert(Layout.table(spark, "fk_vers").select("doc_id")
        .as[Long].collect().toSet == Set(2L, 3L))
    } finally Layout.drop(spark, "fk_vers")
  }

  test("snapshot pins ONE manifest generation across an index family") {
    Layout.replaceBucketed(spark,
      Seq((1L, 10L)).toDF("doc_id", "component"), "snap_a", "doc_id", 4)
    Layout.replaceTable(spark, Seq((1L, "web")).toDF("doc_id", "source"),
      "snap_b")
    try {
      val snap = Layout.snapshot(spark)
      // a refresh lands between the dashboard's two reads
      Layout.replaceBucketed(spark,
        Seq((2L, 20L)).toDF("doc_id", "component"), "snap_a", "doc_id", 4)
      // the snapshot still serves the generation it pinned — BOTH
      // tables at their pre-refresh versions, never a v1/v2 mix
      assert(snap.table("snap_a").select("doc_id")
        .as[Long].collect().toSet == Set(1L))
      assert(snap.table("snap_b").select("source")
        .as[String].collect().toSet == Set("web"))
      assert(Layout.snapshot(spark).generation > snap.generation)
      assert(Layout.table(spark, "snap_a").select("doc_id")
        .as[Long].collect().toSet == Set(2L))
    } finally { Layout.drop(spark, "snap_a"); Layout.drop(spark, "snap_b") }
  }

  test("uncommitted batch partials are swept, never folded into rewrites") {
    // r14 code-review findings 1-2: a batch that crashed after moving
    // files but before its marker must contribute NOTHING — not to
    // reads (refresh sweeps), not to compaction (sweep-then-rewrite),
    // and its replay must land exactly once.
    Layout.drop(spark, "swp_idx")
    Layout.replaceBucketed(spark,
      Seq((1L, "base")).toDF("k", "v"), "swp_idx", "k", buckets = 4)
    try {
      val batch2 = Seq((2L, "b2"), (3L, "b2")).toDF("k", "v")
      Layout.idempotentAppendBucketed(batch2, "swp_idx", "k",
        buckets = 4, batchId = 2L)
      assert(Layout.table(spark, "swp_idx").count() == 3)
      // simulate the crash: files moved, marker lost
      val marker = warehousePath("_graft_batches/swp_idx/b2")
      assert(fs.delete(marker, false))
      // 1. a batch-start refresh sweeps the orphan files out of reads
      Layout.refresh(spark, "swp_idx")
      assert(Layout.table(spark, "swp_idx").count() == 1,
        "uncommitted partials must not be readable after refresh")
      // 2. the replay lands exactly once
      Layout.idempotentAppendBucketed(batch2, "swp_idx", "k",
        buckets = 4, batchId = 2L)
      assert(Layout.table(spark, "swp_idx").count() == 3)
      // 3. crash again, then COMPACT: the rewrite must not fold the
      //    orphans in (else the replay would double them)
      assert(fs.delete(warehousePath("_graft_batches/swp_idx/b2"), false))
      Layout.compactBucketed(spark, "swp_idx", "k", buckets = 4)
      assert(Layout.table(spark, "swp_idx").count() == 1)
      Layout.idempotentAppendBucketed(batch2, "swp_idx", "k",
        buckets = 4, batchId = 2L)
      assert(Layout.table(spark, "swp_idx")
        .select("k").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
      // 4. marker pruning below the checkpoint floor
      assert(Layout.pruneBatchMarkers(spark, "swp_idx", belowBatch = 2L) == 0)
      assert(Layout.batchCommitted(spark, "swp_idx", 2L))
      assert(Layout.pruneBatchMarkers(spark, "swp_idx", belowBatch = 3L) == 1)
      assert(!Layout.batchCommitted(spark, "swp_idx", 2L))
    } finally Layout.drop(spark, "swp_idx")
  }

  test("cross-session resolution: dropped catalog entries re-register from the manifest") {
    Layout.replaceBucketed(spark,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"),
      "xs_idx", "k", buckets = 4)
    try {
      // Simulate a fresh session against the same warehouse: the
      // in-memory catalog forgets every entry, the manifest and the
      // (external) version directory survive. Published tables are
      // external, so DROP TABLE cannot destroy the data.
      spark.sql("DROP VIEW IF EXISTS xs_idx")
      spark.sql("DROP TABLE IF EXISTS xs_idx__v1")
      assert(fs.exists(warehousePath("xs_idx__v1")),
        "external publish: files must survive a catalog drop")
      // Layout.table re-registers from the manifest with the bucket
      // spec intact...
      val got = Layout.table(spark, "xs_idx")
      assert(got.select("k").as[Long].collect().toSet == Set(1L, 2L, 3L))
      // ...so a same-key join still plans with no index-side exchange
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val plan = got.join(got.select("k").distinct(), "k")
          .queryExecution.executedPlan.toString
        assert("Exchange hashpartitioning".r.findAllIn(plan).size <= 1,
          s"re-registered table must keep its bucket spec:\n$plan")
      } finally
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally Layout.drop(spark, "xs_idx")
  }

  test("idempotentAppendBucketed: replay and half-crash replay are byte-level no-ops") {
    Layout.drop(spark, "idem_idx") // self-heal markers of a crashed run
    Layout.replaceBucketed(spark,
      Seq((1L, "base")).toDF("k", "v"), "idem_idx", "k", buckets = 4)
    try {
      val batch = Seq((2L, "b0"), (3L, "b0")).toDF("k", "v")
      Layout.idempotentAppendBucketed(batch, "idem_idx", "k",
        buckets = 4, batchId = 7L)
      val committed = fileState("idem_idx__v1")
      assert(Layout.table(spark, "idem_idx").count() == 3)
      // 1. plain replay (marker present) → nothing changes, no
      //    duplicates, no compaction needed
      Layout.idempotentAppendBucketed(batch, "idem_idx", "k",
        buckets = 4, batchId = 7L)
      assert(fileState("idem_idx__v1") == committed)
      assert(Layout.table(spark, "idem_idx").count() == 3)
      // 2. crash-recovery replay: marker lost + one batch file moved
      //    (the half-committed state) → the replay sweeps partials and
      //    re-stages to the IDENTICAL file set
      val marker = warehousePath("_graft_batches/idem_idx/b7")
      fs.delete(marker, false)
      val aBatchFile = committed.keys.find(_.startsWith("b7-")).get
      fs.delete(warehousePath(s"idem_idx__v1/$aBatchFile"), false)
      Layout.idempotentAppendBucketed(batch, "idem_idx", "k",
        buckets = 4, batchId = 7L)
      assert(fileState("idem_idx__v1") == committed)
      spark.catalog.refreshTable("idem_idx__v1")
      assert(Layout.table(spark, "idem_idx").count() == 3)
      assert(Layout.batchCommitted(spark, "idem_idx", 7L))
      // the moved files keep the bucket token: a same-key join over
      // the index still plans with no index-side exchange
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val idx = Layout.table(spark, "idem_idx")
        val plan = idx.join(idx.select("k").distinct(), "k")
          .queryExecution.executedPlan.toString
        assert("Exchange hashpartitioning".r.findAllIn(plan).size <= 1,
          s"index side must stay exchange-free after batch moves:\n$plan")
      } finally
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally Layout.drop(spark, "idem_idx")
  }
}
