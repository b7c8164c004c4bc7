package graft

import graft.core.Graft
import graft.ops.{Coordinates, Dedup, Ownership}
import org.apache.spark.sql.functions._

/** Physical-plan regression tests: the scale properties this engine
  * claims (shuffle counts, pushdown, join strategies) pinned as
  * assertions, so a plan-shape regression fails CI instead of
  * surfacing as a 100× slowdown on a real cluster.
  */
class PlanShapeSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def countOccurrences(plan: String, needle: String): Int =
    plan.sliding(needle.length).count(_ == needle)

  test("Ownership.split plans with ZERO exchanges in both modes") {
    val df = Seq(("U1", "A [60%]; B [40%]", 10.0), ("U2", "C", 5.0))
      .toDF("unit", "Owner", "cap")
    Seq(Ownership.Strict, Ownership.EqualShareDefault).foreach { mode =>
      val plan = planOf(Ownership.split("Owner", "cap", mode)(df))
      assert(!plan.contains("Exchange"),
        s"ownership split ($mode) must be shuffle-free:\n$plan")
    }
  }

  test("Coordinates.canonicalize plans exactly ONE exchange (the window)") {
    val df = Seq(("L1", 1.0, 2.0), ("L1", 1.5, 2.5), ("L2", 3.0, 4.0))
      .toDF("loc", "Latitude", "Longitude")
    val plan = planOf(Coordinates.canonicalize("loc", "Latitude", "Longitude")(df))
    assert(countOccurrences(plan, "Exchange hashpartitioning") == 1,
      s"canonicalize should shuffle once on the location key:\n$plan")
    assert(!plan.contains("BroadcastExchange"),
      s"no join-back broadcast of a data-sized summary:\n$plan")
  }

  test("forwardFill: all value columns collapse into ONE Window operator") {
    val df = Seq((1L, 1L, Some(1.0), Some(2.0), Some(3.0)))
      .toDF("k", "ord", "a", "b", "c")
    val plan = planOf(graft.ops.Rolling.forwardFill(
      df, Seq("k"), Seq("ord"), Seq("a", "b", "c")))
    assert(countOccurrences(plan, "Window") == 1,
      s"three fills over one window spec must share one sort:\n$plan")
  }

  test("graft_cms aggregates partially (map-side combine before the shuffle)") {
    val df = Seq(1L, 2L, 3L).toDF("h").repartition(4)
    val plan = planOf(df.agg(expr("graft_cms(h, 4, 64)")))
    // partial + final ObjectHashAggregate = the sketch merges map-side,
    // shipping one fixed-size matrix per task instead of raw rows
    assert(countOccurrences(plan, "ObjectHashAggregate") >= 2,
      s"CMS must plan as a two-phase object hash aggregate:\n$plan")
  }

  test("explicit-domain pivot reads the table ONCE (no distinct-scan pass)") {
    val plan = planOf(Graft.table(spark, sfDir, "documents")
      .groupBy("source").pivot("lang", Seq("de", "en")).agg(count(lit(1))))
    assert(countOccurrences(plan, "FileScan") == 1,
      s"pivot with an explicit value list must not re-scan for values:\n$plan")
  }

  test("filter and projection push into the parquet scan") {
    val q = Graft.table(spark, sfDir, "lineitem")
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_quantity")
    val plan = planOf(q)
    assert(plan.contains("EqualTo(l_returnflag,R)"),
      s"filter must reach the scan as a pushed filter:\n$plan")
    // Pruned read schema: only the referenced columns, not the rest.
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(Seq("l_orderkey", "l_quantity", "l_returnflag").forall(readSchema.contains)
      && !readSchema.contains("l_extendedprice"),
      s"scan must prune to referenced columns: $readSchema")
  }

  test("dim join on nation/region resolves to a broadcast hash join") {
    val q = Graft.table(spark, sfDir, "customer")
      .join(Graft.table(spark, sfDir, "nation"),
        col("c_nationkey") === col("n_nationkey"))
    val plan = planOf(q)
    assert(plan.contains("BroadcastHashJoin"), s"dim join should broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"no SMJ for a dim join:\n$plan")
  }

  test("minhashNearDups never plans a cartesian/nested-loop join") {
    val docs = Seq((1L, "a b c"), (2L, "a b d")).toDF("doc_id", "text")
    val plan = planOf(Dedup.minhashNearDups(docs, "doc_id", "text", k = 8, bands = 2))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"LSH join must stay an equi-join:\n$plan")
  }

  test("decontaminate probes the corpus with a BROADCAST semi-join, no corpus shuffle") {
    val docs = Graft.table(spark, sfDir, "documents")
    val bench = docs.filter(col("doc_id") % 97 === 0)
    val corpus = docs.filter(col("doc_id") % 97 =!= 0)
    val plan = planOf(Dedup.contaminatedIds(corpus, bench, "doc_id", "text", n = 5))
    assert(plan.contains("BroadcastExchange"),
      s"bench shingles must broadcast:\n$plan")
    assert(plan.contains("LeftSemi"),
      s"probe must be a semi-join:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"the 100 TB corpus side must never sort-merge against the dim bench:\n$plan")
  }

  test("dedupEvents (batch twin) shuffles once on the dedup key, no global sort") {
    val ev = Graft.table(spark, sfDir, "events")
    val plan = planOf(graft.streaming.EventStream.dedupEvents(
      ev, Seq("user_id", "event_type")))
    assert(countOccurrences(plan, "Exchange hashpartitioning") == 1,
      s"one hash exchange on the key:\n$plan")
    assert(!plan.contains("Exchange rangepartitioning"),
      s"no global sort anywhere:\n$plan")
  }

  test("catalog-wide sweep: no query plans an ACCIDENTAL cartesian join") {
    // Intentional broadcast cross-joins (corpus × broadcast dim-sized
    // side, documented in Similarity): bruteForceTopK's query set,
    // ivfTopK's centroid table, trainCentroids' codebook (q65/q66/q67),
    // q67's single-row total, bm25TopK's single-row corpus stats
    // (q69), and scoreNll's single-row (T, V) model stats (q76).
    // Everything else must stay equi-joined.
    // q83: PageRank's 1-row dangling-mass aggregate is broadcast-
    // crossed back each iteration. q88: the benchmark embedding set is
    // the broadcast side of semanticDecontaminate's scoring pass.
    // q95: the 1-row Bloom bitset broadcast-crosses onto orders (the
    // runtime-filter shape); the membership probe is the point.
    // q91: temperatureMix's 1-row √n-sum total joins back onto the
    // (tiny) per-stratum stats frame, never onto the corpus.
    // q97: bruteForceTopK's broadcast query set (q29's shape) inside
    // the semantic half of the fusion. q100: temperatureMix's 1-row
    // total (q91's shape) inside the composed pipeline.
    val intendedCross = Set("q29_cosine_topk", "q52_ivf_topk",
      "q65_ivf_train", "q66_ivf_search_trained", "q67_ann_recall",
      "q69_bm25_search", "q76_lm_perplexity", "q83_pagerank_neardups",
      "q88_semantic_decontam", "q91_temperature_mix", "q95_bloom_semijoin",
      "q97_hybrid_rrf", "q100_corpus_to_shards",
      // q102: three 1-row stage-count aggregates cross into one summary
      // row — nothing bigger than a single row on either side.
      // q103: the all-pairs ground truth over the bounded eval sample
      // (q29's brute-force-baseline pattern) + 1-row metric crosses.
      "q102_event_funnel", "q103_dedup_eval",
      // q113: scoreBigramNll's single-row (T, V) model stats broadcast-
      // cross onto the token stream — q76's documented shape.
      // q114: the 1-row corpus count crosses onto the VOCAB-sized
      // (doc, term) frame, never the corpus — q91's shape.
      // q115: the 1-row (T, Q) totals cross onto the dim-bounded
      // bucket model, never the corpus.
      // q116: the 1-row (N_uni, N_bi) totals cross onto the
      // minCount-pruned vocab-bounded bigram frame.
      // q117: the 1-row CMS matrix crosses onto the 20-row probe set.
      // q129: each version's 1-row token total crosses onto its own
      // vocab-bounded count frame.
      "q113_bigram_lm", "q114_tfidf_terms", "q115_dsir_select",
      "q116_collocations", "q117_cms_heavy_hitters",
      // q132: the 10-row query frame broadcast-crosses the corpus —
      // q29's documented brute-force-tier shape.
      // q146: tfidfTopTerms' 1-row corpus count crosses onto the
      // cluster-text frame — q114's shape at cluster grain.
      "q129_token_drift", "q132_jl_ann_topk", "q146_cluster_names",
      // q150: ivfSq8TopK assigns corpus + queries against the
      // broadcast trained codebook — q66's documented shape; the ADC
      // probe and re-rank stages are equi-joins.
      "q150_ivf_sq8_search",
      // q306: q150's probe half served from the PERSISTED codes index —
      // the surviving crosses are the query-routing pass against the
      // broadcast k-row codebook (index build happened at write time).
      "q306_ivf_sq8_from_index",
      // q308: q69's 1-row corpus-stats broadcast cross, served from
      // the stored stats table instead of an inline aggregate.
      "q308_bm25_from_index",
      // q413/q414: q69's 1-row per-field stats broadcast cross, run
      // once per field (body + anchor) before the fusion join.
      "q413_anchor_bm25", "q414_anchor_bm25_index",
      // q311: KNN-Shapley scores the train frame against the BROADCAST
      // 20-point validation sample — q29's bounded-eval-tier shape.
      "q311_knn_shapley",
      // q314: three 1-row metric aggregates (run DCG, ideal DCG,
      // relevant count) cross into the single report row (q102 shape).
      "q314_ranking_eval",
      // q315: the 1-row occupancy-total aggregate crosses onto the
      // k-cell frame; assignment rides q150's broadcast codebook.
      "q315_ivf_occupancy",
      // q316: the 1-row bigram-type count broadcast-crosses the test
      // bigrams (q76's single-row model-stats shape).
      "q316_kneser_ney",
      // q318: six 1-row stage-count aggregates cross into the single
      // manifest row (the q102/q210 report shape).
      "q318_release_manifest",
      // q320: PAV's minimax runs O(B³) interval enumeration as
      // non-equi self-joins of the ≤(k+1)-row VOTE-BIN frame — the
      // q169 bounded-frame BNLJ shape; the k-NN scoring underneath is
      // q29's broadcast-query cross.
      "q320_isotonic_calibration",
      // q151: the |ps|-row percentile frame broadcast-nested-loop
      // joins onto the (groups × occupied-buckets) post-sketch frame
      // to find each crossing bucket — both sides tiny by construction.
      "q151_hist_percentiles",
      // q154: three 1-row frames (two KMV sketch aggregates + the
      // exact-count row) cross into the single report row.
      "q154_kmv_join_estimate",
      // q155: q151's percentile-frame BNLJ inside the boundary
      // computation; the corpus side only ever equi-joins the
      // broadcast (groups × B−1) boundary table.
      "q155_equidepth_bins",
      // q169: the #sources² pair enumeration is a deliberate BNLJ of
      // the 20-row KMV sketch frame against itself (a.src < b.src) —
      // the whole design is that the pairwise compare runs on the
      // per-source sketches, never on data.
      "q169_source_similarity",
      // q178: the #langs × #sources margin cross builds the dense
      // contingency grid from two aggregated margin frames.
      "q178_chi2_independence",
      // q198: the same margin-cross contingency grids, per pair.
      "q198_cramers_v",
      // q210: four 1-row stage-count aggregates cross into one report
      // row (the q102 shape).
      "q210_dedup_cascade",
      // q215: the 1-row candidate-stats aggregate crosses the 1-row
      // true-possible count into the single report row (q102 shape);
      // the SNM candidate generation itself is the band EQUI-join.
      "q215_sorted_neighborhood",
      // q226: the 1-row global horizon broadcasts onto the
      // entity-sized spans frame (documented in Survival).
      "q226_kaplan_meier",
      // q232: three 1-row aggregates (m, community count, sums)
      // cross into the single modularity report row.
      "q232_modularity",
      // q235: the 1-row lateness-percentile frame crosses onto the
      // |allowed|-row drop table.
      "q235_watermark_profile",
      // q236: four 1-row cell frames + the 1-row pooled variance
      // cross into the single DiD report row.
      "q236_diff_in_diff",
      // q237: the 1-row pooled-diff frame broadcasts onto the
      // stratum frame.
      "q237_simpson_scan",
      // q238: the label dim (broadcast) crosses the vocab-sized
      // token frame to build the dense MI grid (q178's margin-cross
      // shape), plus the 1-row corpus total.
      "q238_token_label_mi",
      // q254: the 1-row Heaps-fit frame broadcasts onto the
      // |slices|-row profile.
      "q254_heaps_law",
      // q256: the 1-row corpus count crosses onto the anchor frame
      // before the hash-rank draw (q91's 1-row-total shape).
      "q256_contrastive_triplets",
      // q257: bruteForceTopK's broadcast query set (q29's documented
      // brute-force-tier shape).
      "q257_hard_negatives",
      // q259: four 1-row doc/token-total frames cross onto the
      // union-vocab frame (q102's report-cross shape).
      "q259_dedup_shift",
      // q260: the 1-row leakage audit crosses onto the 5-row fold
      // frame.
      "q260_grouped_folds",
      // q261/q262: knnPredict rides bruteForceTopK's broadcast query
      // sample (q29's shape).
      "q261_knn_loo_eval", "q262_knn_prf1",
      // q265: twoNnDimension rides the same broadcast query sample.
      "q265_intrinsic_dim",
      // q266: the 1-row anonymity summary crosses onto the top-N
      // risk classes. q326: the same shape at l-diversity grain.
      "q266_k_anonymity", "q326_l_diversity",
      // q321/q322: 1-row chance-agreement / panel-summary frames
      // cross into the 1-row kappa report (q102's shape).
      "q321_cohen_kappa", "q322_fleiss_kappa",
      // q323: the 1-row normalization sum crosses onto the
      // leaderboard-sized strength frame each MM round (q248's
      // renormalization shape). q324: the 1-row α-weight total
      // crosses onto the per-language plan frame (q91's shape).
      "q323_bradley_terry", "q324_mixing_plan",
      // q345: two 1-row frames (merged-register estimate + merge-law
      // mismatch count) cross onto the per-source report rows.
      "q345_hll_distinct",
      // q346: the 1-row totals left-cross the ≤1-row first-crossing
      // frame into the single report row.
      "q346_sprt_monitor",
      // q352: per-dim brute-force recall = q29's broadcast-query
      // baseline tier, once per candidate prefix length.
      "q352_matryoshka_recall",
      // q353: the 10-anchor mining batch broadcast-crosses the corpus
      // (q29's bounded-small-side shape).
      "q353_hard_negatives",
      // q354: IVF-PQ — coarse codebook, PQ codebook and query ADC
      // tables all broadcast-cross (q65/q66/q347's documented shape);
      // the recall tier is q29's brute-force baseline.
      "q354_ivfpq_search",
      // q355: the 1-row totals broadcast-cross the value-distinct
      // CDF frame (the q91 1-row shape).
      "q355_ks_exact",
      // q356: per-threshold 1-row pair/cluster counts cross into the
      // 3-row sweep table (the q102 report shape).
      "q356_threshold_sweep",
      // q358: the 1-row merged-register estimate crosses onto the
      // per-source rows (q345's documented shape, from the stored
      // register table).
      "q358_hll_from_index",
      // q362: the 1-row compaction audit (n_rows, n_docs over the
      // compacted map) broadcast-crosses the probed cluster rows.
      "q362_cluster_compaction",
      // q367: q358's 1-row merged-register HLL estimate crosses onto
      // the per-source dashboard rows (hllFromRegisters' documented
      // shape) + q363's |ps|-row BNLJ from the stored hist partials.
      "q367_index_dashboard",
      // q368: model-sized crosses only — the 1-row corpus total onto
      // the ≤nbins reference-histogram rows, and the |groups| × nbins
      // Sinkhorn-scaling init; the corpus itself is one hash
      // aggregate.
      "q368_sinkhorn_ot",
      // q369: q368's shape plus the dense |groups| × nbins mass grid
      // (the geometric mean needs explicit zeros) and the 1-row
      // pooled-total cross — all model-sized.
      "q369_ot_barycenter",
      // q371: q369's barycenter crosses + q368's distance-round
      // crosses, chained — still all model-sized.
      "q371_ot_to_barycenter",
      // q363: histPercentilesFromIndex's |ps|-row BNLJ (q151's
      // documented shape, served from the stored partials).
      "q363_quantiles_from_index",
      // q359: the |groups|×|quantiles| wanted-rank frame broadcasts
      // onto the ranked scan (a semi-join, but planned as a
      // broadcast hash join on the computed rank).
      "q359_exact_quantiles",
      // q350: the labeled seed set broadcast-crosses the pool (the
      // q29 bounded-small-side shape; here the SMALL side is the
      // seed set and the pool is the big probe side).
      "q350_active_learning",
      // q348: each greedy round broadcast-crosses the ≤ k-row center
      // set against the point frame; the report crosses two 1-row
      // frames (radius, count) onto the k selected rows.
      "q348_kcenter_coreset",
      // q347: PQ codebook (m·ks ≤ 32 rows) + query ADC table
      // (|queries|·m·ks rows) broadcast-cross the corpus (q65/q66's
      // documented shape); the exact-recall tier is q29's
      // brute-force-baseline broadcast of the 5-query frame.
      "q347_pq_adc_search",
      // q327: the 1-row calibration count / q̂ order statistic
      // crosses into the evaluation pass.
      "q327_conformal_interval",
      // q336: PageRank.run's 1-row dangling-mass cross (q83's shape)
      // inside the TextRank composition.
      "q336_textrank_keywords",
      // q337: the attribute-bounded sensitive DOMAIN (|values| ~ 11)
      // broadcast-crosses onto the class frame to densify each
      // class's distribution; plus the 1-row summary/total crosses.
      "q337_t_closeness",
      // q338: 1-row best-rate + overall-rate crosses (q102's shape).
      "q338_fairness_audit",
      // q339: the 1-row DP-release summary cross onto the group frame.
      "q339_dp_release",
      // q342: 1-row total + row/col max-deviation crosses onto the
      // lang × source grid.
      "q342_ipf_rake",
      // q344: the 1-row AUC/totals cross onto the threshold table.
      "q344_roc_auc",
      // q328: the 1-row vocab totals cross onto the checkpoint rows.
      // q329: Mixing's 1-row α-weight total (q324's shape).
      "q328_vocab_coverage", "q329_mixture_rebalance",
      // q330: the 1-row pool-max normalizer + the ≤ select-row
      // selected-set broadcast pair join, both bounded by pool=20.
      "q330_mmr_rerank",
      // q267: each relation's 1-row orphan count crosses into its
      // 1-row report (q102's shape, x5).
      "q267_ref_integrity",
      // q270: the 1-row pooled-rate prior crosses onto the entity
      // frame. q271: the 1-row truth crosses onto the 1-row IPW
      // report.
      "q270_eb_shrinkage", "q271_ipw_mean",
      // q248: the 1-row mass total crosses onto the state-sized π
      // frame for renormalization (q83's dangling-mass shape).
      "q248_markov_stationary",
      // q274: the 1-row half-life fit crosses onto the 14-row lag
      // curve; the span bound is a 1-row cross too.
      "q274_retention_decay",
      // q276: the 1-row current-max crosses onto the delta frame.
      "q276_surrogate_keys",
      // q277: knnPredict's broadcast query sample + the 1-row ECE
      // total crossing onto the 5-row bin frame.
      "q277_knn_reliability",
      // q275: the 1-row significance count crosses onto the 20-row
      // seed frame.
      "q275_aa_calibration",
      // q280: histPercentiles' |ps|-row BNLJ (q151's documented
      // post-sketch shape), twice.
      "q280_approx_mad",
      // q283: scoreNll's 1-row (T, V) model stats (q76's shape) plus
      // the 1-row quartile-bounds cross.
      "q283_curriculum_phases",
      // q285: the 1-row corpus count crosses onto the vocab frame
      // (q114's shape). q286: three 1-row binomial sums cross into
      // the single ARI report row.
      "q285_term_dispersion", "q286_cluster_ari",
      // q290: the |labels| dim broadcasts across the test token
      // stream (q178's margin-cross shape) plus 1-row vocab/total
      // crosses onto vocab-sized model frames.
      "q290_naive_bayes",
      // q291: the 1-row fit crosses onto the 1-row totals.
      // q292: the 1-row stratum total and pooled effect cross onto
      // the stratum frame.
      // q293: removeTop's broadcast PCA model (dim-sized literals)
      // rides the q123 shape.
      "q291_zipf_fit", "q292_post_stratified", "q293_whiten_audit",
      // q297: the 1-row metric-moment frame crosses onto the user
      // frame for the z-scores.
      "q297_bot_score",
      // q298: the exhaustive ground truth over the bounded doc_id<200
      // eval sample (q103's documented all-pairs-baseline shape) plus
      // 1-row truth/found crosses.
      "q298_bands_recall",
      // q300: the scorecard composes jsTokenShift, refIntegrity, and
      // the lateness profile — all of whose 1-row report crosses are
      // individually documented above (q259/q267/q235).
      "q300_release_scorecard",
      // q301: the 1-row two-series moment frame crosses onto the
      // 15-row lag frame. q303: 1-row totals/entropies cross onto
      // the state frame.
      "q301_click_purchase_ccf", "q303_transition_entropy",
      // r12 distributed-rank migrations: each former unpartitioned
      // count/sum-over-everything window is now a 1-row aggregate
      // broadcast-crossed back (the q91 shape) — q175's (n, positives),
      // q182's distinct-key count, q188's total output rows, q191's
      // entity count, q203's grand-total cents, q214's pooled row
      // count, q223's per-period entity counts.
      "q175_calibration", "q182_shard_balance", "q188_join_forecast",
      "q191_rfm_segments", "q203_abc_classification",
      "q214_quantile_normalize", "q223_decile_migration")
    // r11 verdict lesson (q175/q191/q203/q214): a Window with an EMPTY
    // partition spec plans Exchange SinglePartition — the whole frame
    // through ONE task. Banned catalog-wide unless the query is
    // whitelisted here with a why-the-frame-is-tiny justification
    // (the intendedCross precedent). Data-proportional frames must use
    // Rank.globalRowNumber / Rank.prefixSum / an explicit limit instead.
    val tinyFrameWindow: Set[String] = PlanShapeSpec.tinyFrameWindow
    val windowOffenders = scala.collection.mutable.ListBuffer[String]()
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      val unpart =
        PlanShapeSpec.unpartitionedWindows(df.queryExecution.executedPlan)
      if (unpart.nonEmpty && !tinyFrameWindow(name))
        windowOffenders += s"$name: ${unpart.mkString(", ")}"
      // Gate-shape guard (r9 lesson): the driver's comparator sorts
      // result rows in pandas, which cannot sort/hash array, map or
      // struct cells — a query emitting one can never go green.
      // Flatten with posexplode (q121/q122's shape) before emitting.
      df.schema.fields.foreach { f =>
        assert(!f.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType]
            && !f.dataType.isInstanceOf[org.apache.spark.sql.types.MapType]
            && !f.dataType.isInstanceOf[org.apache.spark.sql.types.StructType],
          s"$name emits top-level complex column '${f.name}: ${f.dataType}'" +
            " — the driver gate cannot sort it; posexplode/flatten first")
      }
      val plan = planOf(df)
      if (!intendedCross(name))
        assert(!plan.contains("CartesianProduct") &&
          !plan.contains("BroadcastNestedLoopJoin"),
          s"$name plans a cartesian/nested-loop join:\n$plan")
      else
        assert(!plan.contains("CartesianProduct"),
          s"$name must broadcast its cross side, never a full cartesian:\n$plan")
    }
    assert(windowOffenders.isEmpty,
      "unpartitioned (single-task) window over a frame not whitelisted" +
        " as tiny — use Rank.globalRowNumber / Rank.prefixSum /" +
        " orderBy().limit(k), or whitelist with a justification:\n" +
        windowOffenders.mkString("\n"))
  }

  test("rerouted heavies probe stored indexes — plans carry stored-table leaves") {
    // Round-14 task 4 (VERDICT r13): q67/q306 must audit the SHIPPED
    // codebook + codes tables, q372 must read the persisted verified-
    // pairs table, q365 must slice the stored corpus map — none may
    // retrain centroids or re-run minhash per invocation.
    val reroutes = Seq(
      "q67_ann_recall" -> Seq("graft_ivf_cents", "graft_ivf_sq8_idx"),
      "q306_ivf_sq8_from_index" ->
        Seq("graft_ivf_cents", "graft_ivf_sq8_idx"))
    reroutes.foreach { case (name, tables) =>
      val plan = planOf(SparkEntry.queries(name)(spark, sfDir))
      tables.foreach(t => assert(plan.contains(t),
        s"$name must scan stored table $t:\n$plan"))
      assert(!plan.contains("graft_minhash"),
        s"$name must not recompute minhash signatures:\n$plan")
    }
    // q372's rank rounds pin lineage (Iterate), so the initial stored-
    // pairs scan is not visible in the final plan string — the
    // checkable claim is the ABSENCE of any inline rebuild machinery:
    // no minhash signature fold, no shingling, anywhere in the plan.
    val p372 = planOf(SparkEntry.queries("q372_trustrank")(spark, sfDir))
    assert(!p372.contains("graft_minhash") &&
      !p372.contains("graft_shingles"),
      s"q372 must not re-run minhash over the corpus:\n$p372")
    // q365's returned audit frame: both phases join the (stored-map-
    // sliced) forget fixture; no signature fold anywhere.
    val p365 = planOf(SparkEntry.queries("q365_forget_audit")(spark, sfDir))
    assert(p365.contains("graft_cluster_map_f") &&
      !p365.contains("graft_minhash"),
      s"q365 must audit the stored-map slice without minhash:\n$p365")
  }

  test("domainCap: the Window operators never see the null-domain branch") {
    // Round-15 task 1 (VERDICT r14): a `when(isNull, 1L)` guard inside
    // the window projection fixes the VALUE but the physical Window
    // still hashes every null-domain row into ONE partition — a crawl
    // slice of mostly-unparseable URLs would serialize through a
    // single task. The required shape is filter + window + unionByName
    // (the urlDedup shape): every Window subtree must carry the
    // isnotnull(domain) filter, and the null branch must rejoin via a
    // Union ABOVE the windows.
    // Parquet-backed input: a LocalRelation constant-folds the
    // isnotnull filter into the scan at plan time, hiding the node
    // the assertion needs to see.
    val docs = Graft.table(spark, sfDir, "documents")
      .select(col("doc_id"),
        concat(lit("http://site-"), pmod(col("doc_id"), lit(7)),
          lit(".com/p"), col("doc_id")).as("url"))
    val df = graft.ops.WebCorpus.domainCap(docs, "doc_id", "url", 2)
    val windows =
      PlanShapeSpec.windowNodes(df.queryExecution.executedPlan)
    assert(windows.size >= 2,
      s"expected the two-stage top-N windows:\n${planOf(df)}")
    windows.foreach { w =>
      assert(w.toString.contains("isnotnull"),
        s"window input must filter out the null-domain branch:\n$w")
    }
    assert(planOf(df).contains("Union"),
      s"null-domain rows must rejoin via union above the windows:\n${planOf(df)}")
    // And the semantics survived the restructure: invalids pass, the
    // cap still binds per domain.
    val local = Seq((1L, "http://e.com/a"), (2L, "http://e.com/b"),
      (3L, "http://e.com/c"), (4L, "junk"), (5L, "also junk"))
      .toDF("doc_id", "url")
    val kept = graft.ops.WebCorpus.domainCap(local, "doc_id", "url", 2)
      .select("doc_id").as[Long].collect().toSet
    assert(kept.size === 4 && Set(4L, 5L).subsetOf(kept))
  }

  test("gopherGates plans with ZERO exchanges (pure narrow projection)") {
    val docs = Graft.table(spark, sfDir, "documents")
    val plan = planOf(
      graft.ops.TextAnalysis.gopherGates(docs, "doc_id", "text"))
    assert(!plan.contains("Exchange"),
      s"quality gates must be shuffle-free:\n$plan")
  }

  test("SpanDedup: keeper aggregate partially combines; no cartesian anywhere") {
    val docs = Graft.table(spark, sfDir, "documents")
    val plan = planOf(
      graft.ops.SpanDedup.removeRepeatedSpans(docs, "doc_id", "text", n = 8))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"span dedup must never pair-join unbucketed frames:\n$plan")
    // The gram keeper (count + min-struct) must map-side combine before
    // its shuffle — partial_min/partial_count in the aggregate.
    assert(plan.contains("partial_min") || plan.contains("partial_count"),
      s"keeper aggregate must have a partial (map-side) phase:\n$plan")
  }

  test("Bpe.tokenCount plans with ZERO exchanges (encode is per-row)") {
    val docs = Graft.table(spark, sfDir, "documents")
    val rules = Seq("e" -> "s", "es" -> "t", "l" -> "o")
    val plan = planOf(docs.select(col("doc_id"),
      graft.ops.Bpe.tokenCount(col("text"), rules).as("n")))
    assert(!plan.contains("Exchange"),
      s"BPE encode must be a narrow projection:\n$plan")
  }

  test("sketch kernels stay inside whole-stage codegen") {
    // parquet-backed input: a LocalRelation would be folded at plan time
    val docs = Graft.table(spark, sfDir, "documents")
    val q = docs.select(
      Dedup.minhashSignature(col("text"), 8).as("sig"),
      Dedup.simhash(col("text"), 16).as("sh"),
      Dedup.shingles(col("text"), 3).as("shg"))
    val plan = planOf(q)
    // codegen'd operators print with a `*(stageId)` prefix
    assert("""\*\(\d+\) Project""".r.findFirstIn(plan).isDefined,
      s"kernel expressions must not break codegen:\n$plan")
  }
}

object PlanShapeSpec {
  import org.apache.spark.sql.execution.SparkPlan
  import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
  import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}

  /** Every empty-partition (single-task) window/group-limit node in
    * the plan, descending through the AQE wrapper (whose `children`
    * is empty — a plain `collect` sees NOTHING under
    * AdaptiveSparkPlanExec) and subquery plans.
    */
  def unpartitionedWindows(p: SparkPlan): Seq[String] = {
    val self = p match {
      case w: WindowExec if w.partitionSpec.isEmpty => Seq(w.nodeName)
      case w: WindowGroupLimitExec if w.partitionSpec.isEmpty => Seq(w.nodeName)
      case _ => Seq.empty
    }
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.inputPlan)
      case _ => p.children
    }
    self ++ (kids ++ p.subqueries).flatMap(unpartitionedWindows)
  }

  /** Every window-family node in the plan (same AQE-aware descent as
    * [[unpartitionedWindows]]), for subtree-shape assertions.
    */
  def windowNodes(p: SparkPlan): Seq[SparkPlan] = {
    val self = p match {
      case w: WindowExec => Seq(w: SparkPlan)
      case w: WindowGroupLimitExec => Seq(w: SparkPlan)
      case _ => Seq.empty
    }
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.inputPlan)
      case _ => p.children
    }
    self ++ (kids ++ p.subqueries).flatMap(windowNodes)
  }

  /** Queries allowed an empty-partition (single-task) Window because
    * the frame it runs on is provably TINY — bounded by a dim, a
    * limit, or a prefix-scan bucket count — never data-proportional.
    * Every entry carries its justification; a new unpartitioned
    * window anywhere else fails the catalog sweep.
    */
  val tinyFrameWindow: Set[String] = Set(
    // Post-limit rank windows: an explicit orderBy().limit(k)
    // (TakeOrderedAndProject) runs first, so the window ranks the
    // ≤ k surviving rows only.
    "q69_bm25_search",      // bm25TopK: rank over the k-row result
    "q308_bm25_from_index", // same scoring tail over the stored index
    "q413_anchor_bm25",     // fused-field rank over the k-row result
    "q414_anchor_bm25_index", // same fusion tail over stored postings
    "q314_ranking_eval",    // bm25 run rank + ideal rank, both ≤ k rows
    "q320_isotonic_calibration", // rank/prefix windows over the vote-bin frame
    "q97_hybrid_rrf",       // bm25TopK + rrfFuse fused-rank, both ≤ k
    "q101_bpe_pairs",       // pair rank over the k-row result
    "q171_event_paths",     // trigram rank over the k-row result
    "q188_join_forecast",   // top-contributor rank over ≤ topK keys
    "q207_capped_topk",     // global rank over the 10-row result
    "q266_k_anonymity",     // risk rank over the ≤ topN smallest classes
    "q326_l_diversity",     // same shape: rank over the ≤ topN survivors
    "q337_t_closeness",     // rank over the ≤ topN worst classes
    "q291_zipf_fit",        // ln(rank) points over the topK-row result
    // Two-pass prefix scans: the ONLY unpartitioned window runs on
    // the per-bucket partials frame (n/bucketSize rows, sized tiny
    // by construction); per-row windows partition by bucket.
    "q203_abc_classification", // Rank.prefixSum bucket frame
    "q328_vocab_coverage",     // Rank.prefixSum bucket frame
    "q344_roc_auc",            // Rank.prefixSum bucket frame (×2: ranks + partials)
    "q346_sprt_monitor",       // Rank.prefixSum bucket frame (LLR walk)
    "q350_active_learning",    // selection rank over the ≤ batch-row result
    "q355_ks_exact",           // Rank.prefixSum bucket frame (×2 CDF passes)
    "q359_exact_quantiles",    // group-offset prefix over the |groups| frame
    "q330_mmr_rerank",         // bm25TopK rank over the ≤ pool-row result
    "q332_decision_stump",     // overall rank over the |features|-row frame
    "q235_watermark_profile",  // Lateness bucket frame (×2 passes)
    "q251_peak_concurrency",   // Concurrency bucket frame
    "q300_release_scorecard",  // composes the Lateness profile
    // Dim-bounded frames: the window input is an aggregate over a
    // fixed/dim-sized domain, not data-proportional.
    "q164_largest_remainder",  // allocation groups (sources)
    "q167_cuped_abtest",       // per-arm frame (2 rows)
    "q178_chi2_independence",  // lang × source category grid
    "q187_hierarchy_shares",   // region × nation dim frame
    "q198_cramers_v",          // category grids per column pair
    "q214_quantile_normalize", // |groups|-row rank-offset prefix
    "q226_kaplan_meier",       // per-duration-day frame (horizon-bounded)
    "q296_entry_exit",         // entry × exit event-type matrix
    // Delta/bounded-input ranks (documented in the op scaladoc).
    "q276_surrogate_keys")     // existing dim ≤ 100 docs; rank on DELTA
}
