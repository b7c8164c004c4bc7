package graft

import graft.core.Graft
import graft.ops.{Bpe, Components, CorpusPipeline, Dedup, GraphMetrics,
  LanguageModel, LineDedup, PageRank, SpanDedup, TextAnalysis}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scaling-evidence probe for the dedup tier (builder-side tool, not a
  * catalog query): tiles the q44 document slice N× and times the four
  * heaviest corpus operators at each scale, so "would this still work
  * at 100 TB" gets a measured growth curve instead of an argument.
  *
  * Tiling gives each copy a DISJOINT vocabulary (every token prefixed
  * with the tile id) and disjoint doc ids, so the near-dup graph of the
  * tiled corpus is exactly N independent copies of the original —
  * pair/cluster density per tile is unchanged, and a linearly-scaling
  * operator should show ~linear wall clock. (Tiling with identical
  * text would instead add N·|docs| artificial exact-dup cliques and
  * measure a different, quadratically-inflated problem.)
  *
  * Usage: `sbt "runMain graft.ScaleProbe [sfDir] [tiles,...] [reps]
  * [ops,...]"`; defaults: sf0.1, tiles 1,3,10, 2 interleaved reps
  * (this box's per-run variance is ±2-3×, so the minimum over
  * interleaved passes is the number to read), all ops. Prints one
  * JSON line per (op, tiles, rep).
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val tiles = args.lift(1).getOrElse("1,3,10").split(",").map(_.toInt).toSeq
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val opFilter = args.lift(3).map(_.split(",").toSet)
    val spark = Graft.session("graft-scaleprobe")

    val base = Graft.table(spark, sfDir, "documents")
      .filter(col("doc_id") < 1000) // the q44/q61 slice
    def tiled(n: Int): DataFrame = (0 until n).map { i =>
      if (i == 0) base
      else base
        .withColumn("doc_id", col("doc_id") + lit(i * 1000000L))
        .withColumn("text", array_join(
          transform(split(col("text"), " +"), t => concat(lit(s"v$i"), t)),
          " "))
    }.reduce(_ unionByName _)

    def time(body: => DataFrame): Double = {
      val t0 = System.nanoTime()
      body.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    // Interleaved passes: scale-up ratios within one pass are
    // comparable even when the box's absolute speed drifts between
    // passes.
    for (rep <- 1 to reps; n <- tiles) {
      val df = tiled(n).localCheckpoint(true) // input materialized once
      val rows = df.count()
      val ops: Seq[(String, () => DataFrame)] = Seq(
        "minhash_pairs" -> (() =>
          Dedup.minhashNearDups(df, "doc_id", "text",
            k = 64, bands = 8, threshold = 0.8)),
        "dedup_clusters" -> (() => {
          val pairs = Dedup.minhashNearDups(df, "doc_id", "text",
            k = 64, bands = 8, threshold = 0.8)
          Components.dedupClusters(df, "doc_id", pairs, "id_a", "id_b")
        }),
        "curate" -> (() => CorpusPipeline.curate(df)),
        "repetition" -> (() =>
          TextAnalysis.repetitionSignals(df, "doc_id", "text")),
        "line_dedup" -> (() => {
          val segs = df.select(col("doc_id"),
            LineDedup.tokenSegments(col("text"), 10).as("segs"))
          LineDedup.dedupSegments(segs, "doc_id", "segs")
        }),
        "repeated_ngrams" -> (() =>
          TextAnalysis.repeatedNgramSignals(df, "doc_id", "text", n = 8)),
        "lm_score" -> (() => {
          val lm = LanguageModel.trainUnigram(df, "text")
          LanguageModel.scoreNll(df, "doc_id", "text", lm)
        }),
        "pagerank" -> (() => {
          val pairs = Dedup.minhashNearDups(df, "doc_id", "text",
            k = 64, bands = 8, threshold = 0.8)
          PageRank.run(df, "doc_id", pairs, "id_a", "id_b")
        }),
        "span_dedup" -> (() =>
          SpanDedup.removeRepeatedSpans(df, "doc_id", "text", n = 8)),
        // Driver-loop iteration floor like clusters/pagerank: rounds
        // are fixed (4), per-round cost tracks the vocab aggregate.
        "bpe_train" -> (() => Bpe.train(df, "text", merges = 4)),
        // Incremental posture (q93): the odd-id half arrives as today's
        // batch and probes the even-id half as the standing index —
        // cost should track the BATCH size, staying well under the
        // self-join ops above at equal total rows.
        "incremental_neardups" -> (() =>
          Dedup.incrementalNearDups(
            df.filter(col("doc_id") % 2 === 1),
            df.filter(col("doc_id") % 2 === 0),
            "doc_id", "text", k = 64, bands = 8, threshold = 0.8)),
        // Model-frame ops: cost should track the corpus pass count,
        // with the dim-bounded model join never inflating the shuffle.
        "dsir_select" -> (() =>
          graft.ops.Dsir.importanceSelect(df, "doc_id", "text",
            df.filter(col("lang") === "en"), dim = 1024, k = 100)),
        // 3-round driver-loop floor like bpe_train; per-round cost is
        // two combinable aggregates over the feature frame.
        "logreg_train" -> (() =>
          graft.ops.LogReg.train(
            df.withColumn("y", (col("lang") === "en").cast("int")),
            "doc_id", "text", "y", dim = 256, lr = 1.0, iters = 3)),
        // Component-iteration family (q232/q286/q294): cost =
        // pairs + the delta-frontier round floor (+ one labeled-edge
        // aggregate / argmax). Tiling multiplies rows but NOT round
        // count (tiles are disjoint graphs), so growth should track
        // the pair stage, not explode with the partition count.
        "modularity" -> (() => {
          val pairs = Dedup.minhashNearDups(df, "doc_id", "text",
            k = 64, bands = 8, threshold = 0.8)
          val clusters = Components.dedupClusters(
            df, "doc_id", pairs, "id_a", "id_b")
          GraphMetrics.modularity(pairs, "id_a", "id_b",
            clusters, "doc_id", "component")
        }),
        "cluster_ari" -> (() => {
          val pairs7 = Dedup.minhashNearDups(df, "doc_id", "text",
            k = 64, bands = 8, threshold = 0.7).localCheckpoint(true)
          def cl(p: DataFrame, as: String) =
            Components.dedupClusters(df, "doc_id", p, "id_a", "id_b")
              .select(col("doc_id"), col("component").as(as))
          Components.adjustedRandIndex(
            cl(pairs7, "ca"),
            cl(pairs7.where(col("jaccard") >= 0.8), "cb"),
            "doc_id", "ca", "cb")
        }),
        "medoid" -> (() => {
          val pairs = Dedup.minhashNearDups(df, "doc_id", "text",
            k = 64, bands = 8, threshold = 0.8).localCheckpoint(true)
          val clusters = Components.dedupClusters(
            df, "doc_id", pairs, "id_a", "id_b")
          Components.medoidPerCluster(clusters, "doc_id",
            pairs, "id_a", "id_b", "jaccard")
        }),
        // Round-12 scrub/index tier: pii + skeleton are pure narrow
        // passes (expect ~linear), the postings build is the one
        // corpus explode+shuffle an index write costs.
        "pii_scan" -> (() =>
          graft.ops.Pii.scan(df, "doc_id", "text")),
        "skeleton_dedup" -> (() =>
          graft.ops.Homoglyph.dupGroups(df, "doc_id", "text")),
        "bm25_index_build" -> (() =>
          graft.ops.Retrieval.bm25Postings(df, "doc_id", "text")),
        // Round-12 session-2 tier. vocab_coverage: the tiled corpus
        // multiplies the VOCAB too (disjoint token prefixes), so this
        // measures the distributed rank/prefix-sum path on a
        // Heaps-law-growing frame — the exact thing the q214-class
        // single-task window would have died on. conformal: one
        // combinable mean + one distributed sort of the calibration
        // half. emd_drift: two bounded sketches per group — expect
        // near-flat (sketch size is nbins, not rows). stump: one
        // combinable (feature × bucket) aggregate — near-flat too.
        "vocab_coverage" -> (() =>
          TextAnalysis.vocabCoverage(df, "text",
            Seq(1L, 10L, 100L, 1000L))),
        "conformal" -> (() =>
          graft.ops.Conformal.splitConformalMean(
            df.withColumn("v", col("n_chars").cast("double")),
            "doc_id", "lang", "v", alphaPpm = 100000L)),
        "emd_drift" -> (() =>
          graft.ops.Drift.emdFromHists(
            df.filter(col("doc_id") % 2 === 0),
            df.filter(col("doc_id") % 2 =!= 0)
              .withColumn("n_chars", col("n_chars") + lit(100L)),
            "lang", "n_chars", lo = 0.0, hi = 1024.0, nbins = 256)),
        "decision_stump" -> (() =>
          graft.ops.DecisionStump.fit(
            df.select(col("n_chars"),
              TextAnalysis.tokenCount(col("text")).cast("long")
                .as("n_tokens"),
              when(col("n_chars") >= 300, 1L).otherwise(0L).as("y")),
            "y", Seq(("n_chars", 100L), ("n_tokens", 10L)))))
      ops.filter(o => opFilter.forall(_.contains(o._1))).foreach { case (name, f) =>
        val sec = time(f())
        println(f"""{"op":"$name","tiles":$n,"rows":$rows,"rep":$rep,"sec":$sec%.3f}""")
      }
      df.unpersist()
    }
    spark.stop()
  }
}
