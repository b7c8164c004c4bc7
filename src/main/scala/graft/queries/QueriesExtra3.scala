package graft.queries

import graft.core.Graft
import graft.functions.{CmsSketch, Hashing}
import graft.ops.{ActiveLearning, Agreement, Allocate, Anonymity, AsofJoin, Attribution,
  Behavior, Bootstrap, Bpe, BradleyTerry, CardinalityEstimate, Conformal,
  Mixing,
  Chunking, Classifier, Cleaning, Components, Compressibility, Coreset,
  Contrastive, Coordinates,
  Categorical, ChangeDecomposition, ChangePoint, CoOccurrence, CorpusPipeline, Intervals, JoinDiagnostics, Pareto, QuantileNormalize, Retention, Sessionize, TemporalAntiJoin, Paths, Benford, Concentration, Debounce, Reconcile, RobustStats, RollingDistinct, Seasonal, ShardBalance, WeightedStats,
  DecisionStump,
  Dedup, Drift, Dsir, Encoding, GemPipeline, GraphMetrics, Homoglyph,
  IncrementalAgg, Isotonic,
  Experiment, IntervalJoin, Linkage,
  Fairness, FeatureSelect, FileAudit, Itemsets, LanguageModel, Lateness,
  LineDedup, LogReg,
  Markov, Merge, Multimodal, NaiveBayes, TimeWeighted,
  Normalize, Outliers, Ownership, Packing, PageRank, Pca, Pii, Pq, Profile,
  Quantize, Rank, Retrieval, Rfm, Rolling, Sampling, Scd2, Similarity, Skew,
  SourceSim, SpatialJoin, ZOrder, CorrMatrix, Concurrency,
  Shrinkage, SnapshotDiff, SpanDedup, Stats, SurrogateKeys, Survival,
  SequentialTest, TableChecksum, TextAnalysis,
  Timeseries, TrackerConfigs, Valuation}
import graft.sources.{CountryDim, Csv, Jsonl, Layout, Orc, Xml}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Shared._

/** Catalog section `extra3Defs` of the former monolithic GemQueries
  * (mechanical round-14 split; content unchanged).
  */
private[queries] object QueriesExtra3 {

  /** Round-12 session 2: preference/annotation QA, training-mixture
    * planning, soft dedup, l-diversity, conformal intervals
    * (q321–q328). Each cites the published estimator it implements;
    * scale notes live on the ops.
    */
  val defs: Seq[QueryDef] = Seq(

    // Cohen's kappa (Agreement.cohenKappa) between two deterministic
    // quality raters — char-count tiers vs token-count tiers — over
    // documents: chance-corrected agreement from ONE contingency
    // aggregate + label-vocab-sized marginal self-join.
    QueryDef("q321_cohen_kappa",
      (s, dir) => {
        val tok = TextAnalysis.tokenCount(col("text"))
        val rated = t(s, dir, "documents").select(
          when(col("n_chars") < 200, "low")
            .when(col("n_chars") < 400, "mid")
            .otherwise("high").as("rater_a"),
          when(tok < 40, "low").when(tok < 80, "mid")
            .otherwise("high").as("rater_b"))
        Agreement.cohenKappa(rated, "rater_a", "rater_b")
      },
      Some("""WITH rt AS (
             |  SELECT CASE WHEN n_chars < 200 THEN 'low'
             |              WHEN n_chars < 400 THEN 'mid'
             |              ELSE 'high' END AS a,
             |    CASE WHEN len(list_filter(string_split_regex(text, ' +'),
             |        t -> t <> '')) < 40 THEN 'low'
             |      WHEN len(list_filter(string_split_regex(text, ' +'),
             |        t -> t <> '')) < 80 THEN 'mid'
             |      ELSE 'high' END AS b
             |  FROM documents),
             |cells AS (SELECT a, b, count(*) AS c FROM rt GROUP BY 1, 2),
             |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n,
             |    CAST(sum(CASE WHEN a = b THEN c ELSE 0 END) AS BIGINT)
             |      AS agree
             |  FROM cells),
             |ma AS (SELECT a, CAST(sum(c) AS BIGINT) AS na
             |  FROM cells GROUP BY 1),
             |mb AS (SELECT b, CAST(sum(c) AS BIGINT) AS nb
             |  FROM cells GROUP BY 1),
             |pen AS (SELECT CAST(coalesce(sum(na * nb), 0) AS BIGINT)
             |    AS pe_num
             |  FROM ma JOIN mb ON ma.a = mb.b)
             |SELECT n AS n_items, agree AS n_agree,
             |  round(CAST(agree AS DOUBLE) / n, 6) AS po,
             |  round(CAST(pe_num AS DOUBLE) / CAST(n * n AS DOUBLE), 6)
             |    AS pe,
             |  round(CASE WHEN pe_num = n * n THEN
             |      CASE WHEN agree = n THEN 1.0 ELSE 0.0 END
             |    ELSE (CAST(agree AS DOUBLE) / n -
             |          CAST(pe_num AS DOUBLE) / CAST(n * n AS DOUBLE)) /
             |         (1.0 - CAST(pe_num AS DOUBLE) / CAST(n * n AS DOUBLE))
             |    END, 6) AS kappa
             |FROM tot, pen""".stripMargin)),

    // Fleiss' kappa (Agreement.fleissKappa): a 3-rater panel
    // simulated by a portable-hash 10% label flip of `lang`, with
    // rater 2 skipping every 7th doc — those partial panels are
    // DROPPED and reported, not silently absorbed.
    QueryDef("q322_fleiss_kappa",
      (s, dir) => {
        val ratings = t(s, dir, "documents")
          .select(col("doc_id"), col("lang"))
          .withColumn("rater", explode(sequence(lit(0L), lit(2L))))
          .where(!(col("rater") === 2L && pmod(col("doc_id"), lit(7L)) === 0L))
          .withColumn("label",
            when(pmod(Hashing.portableHash(
                concat(col("doc_id").cast("string"), lit(":"),
                  col("rater").cast("string"))), lit(10L)) === 0L,
              lit("xx")).otherwise(col("lang")))
        Agreement.fleissKappa(ratings, "doc_id", "rater", "label",
          nRaters = 3)
      },
      Some(s"""WITH rr AS (
             |  SELECT doc_id, lang, unnest([0, 1, 2]) AS rater
             |  FROM documents),
             |kept AS (SELECT * FROM rr
             |  WHERE NOT (rater = 2 AND doc_id % 7 = 0)),
             |lab AS (SELECT doc_id,
             |    CASE WHEN ${Hashing.duckPortableHash(
                 "CAST(doc_id AS VARCHAR) || ':' || CAST(rater AS VARCHAR)")}
             |      % 10 = 0 THEN 'xx' ELSE lang END AS label
             |  FROM kept),
             |cnt AS (SELECT doc_id, label, count(*) AS n
             |  FROM lab GROUP BY 1, 2),
             |per AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS r,
             |    CAST(sum(n * n) AS BIGINT) AS s2
             |  FROM cnt GROUP BY 1),
             |keep2 AS (SELECT CAST(count(*) AS BIGINT) AS n_items,
             |    CAST(coalesce(sum(s2), 0) AS BIGINT) AS sum_s2
             |  FROM per WHERE r = 3),
             |drp AS (SELECT CAST(count(*) AS BIGINT) AS n_dropped
             |  FROM per WHERE r <> 3),
             |ct AS (SELECT label, CAST(sum(n) AS BIGINT) AS cj
             |  FROM cnt JOIN (SELECT doc_id FROM per WHERE r = 3)
             |    USING (doc_id)
             |  GROUP BY 1),
             |cat AS (SELECT CAST(count(*) AS BIGINT) AS n_categories,
             |    CAST(coalesce(sum(cj * cj), 0) AS BIGINT) AS sum_cj2
             |  FROM ct),
             |fin AS (SELECT n_items, n_dropped, n_categories,
             |    CAST(sum_s2 - n_items * 3 AS DOUBLE) /
             |      CAST(n_items * 3 * 2 AS DOUBLE) AS pb,
             |    CAST(sum_cj2 AS DOUBLE) /
             |      CAST((n_items * 3) * (n_items * 3) AS DOUBLE) AS pe
             |  FROM keep2, drp, cat)
             |SELECT n_items, n_dropped, CAST(3 AS BIGINT) AS n_raters,
             |  n_categories, round(pb, 6) AS p_bar, round(pe, 6) AS p_e,
             |  round(CASE WHEN pe = 1.0 THEN
             |      CASE WHEN pb = 1.0 THEN 1.0 ELSE 0.0 END
             |    ELSE (pb - pe) / (1.0 - pe) END, 6) AS kappa
             |FROM fin""".stripMargin)),

    // Bradley–Terry leaderboard (BradleyTerry.fit, Hunter 2004 MM):
    // consecutive-doc "matches" decided by char count, aggregated to
    // source-grain win counts; 8 MM rounds recover per-source
    // strengths beside the naive win rate they correct.
    QueryDef("q323_bradley_terry",
      (s, dir) => {
        val d = t(s, dir, "documents")
          .select(col("doc_id"), col("source"), col("n_chars"))
        val left = d.select(col("doc_id").as("id_a"),
          col("source").as("src_a"), col("n_chars").as("c_a"))
        val right = d.select((col("doc_id") - 1L).as("id_a"),
          col("source").as("src_b"), col("n_chars").as("c_b"))
        val matches = left.join(right, Seq("id_a"))
          .where(col("src_a") =!= col("src_b"))
          .select(
            when(col("c_a") >= col("c_b"), col("src_a"))
              .otherwise(col("src_b")).as("winner"),
            when(col("c_a") >= col("c_b"), col("src_b"))
              .otherwise(col("src_a")).as("loser"))
          .groupBy("winner", "loser").agg(count(lit(1)).as("n"))
        BradleyTerry.fit(matches, "winner", "loser", "n", iters = 8)
          .orderBy("item")
      },
      Some("WITH prs AS (\n" +
        """  SELECT CASE WHEN a.n_chars >= b.n_chars THEN a.source
          |      ELSE b.source END AS w,
          |    CASE WHEN a.n_chars >= b.n_chars THEN b.source
          |      ELSE a.source END AS l
          |  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
          |  WHERE a.source <> b.source),
          |cnt AS MATERIALIZED (SELECT w, l, CAST(count(*) AS BIGINT) AS n
          |  FROM prs GROUP BY 1, 2),
          |games AS MATERIALIZED (
          |  SELECT a, b, CAST(sum(n) AS BIGINT) AS m FROM (
          |    SELECT w AS a, l AS b, n FROM cnt
          |    UNION ALL SELECT l AS a, w AS b, n FROM cnt)
          |  GROUP BY 1, 2),
          |wins AS MATERIALIZED (SELECT i.item,
          |    CAST(coalesce(sum(c.n), 0) AS BIGINT) AS wins
          |  FROM (SELECT DISTINCT a AS item FROM games) i
          |  LEFT JOIN cnt c ON c.w = i.item GROUP BY 1),
          |""".stripMargin +
        btCtes(8) + ",\n" +
        """tot AS (SELECT a AS item, CAST(sum(m) AS BIGINT) AS n_games
          |  FROM games GROUP BY 1)
          |SELECT w.item, w.wins AS n_wins, t.n_games,
          |  round(i.pi, 6) AS pi,
          |  (w.wins * 1000000) // t.n_games AS win_rate_ppm
          |FROM wins w JOIN tot t USING (item) JOIN it8 i USING (item)
          |ORDER BY item""".stripMargin)),

    // Temperature-α mixture plan (Mixing.temperaturePlan, the
    // XLM-R/Pile sampling rule) over per-language token mass:
    // α = 0.5 flattens the en-heavy head; the 1.2-epoch cap flags
    // small languages the flattened plan would over-epoch, with the
    // clipped shortfall explicit.
    QueryDef("q324_mixing_plan",
      (s, dir) => {
        val tok = t(s, dir, "documents").groupBy(col("lang").as("language"))
          .agg(sum(TextAnalysis.tokenCount(col("text")).cast("long"))
            .as("tokens"))
        Mixing.temperaturePlan(tok, "language", "tokens",
            alpha = 0.5, targetTokens = 600000L, maxEpochs = 1.2)
          .withColumn("capped", col("capped").cast("int"))
          .orderBy("source")
      },
      Some("""WITH tok AS (
             |  SELECT lang AS source,
             |    CAST(sum(len(list_filter(string_split_regex(text, ' +'),
             |      t -> t <> ''))) AS BIGINT) AS tokens
             |  FROM documents GROUP BY 1),
             |z AS (SELECT sum(pow(CAST(tokens AS DOUBLE), 0.5)) AS z
             |  FROM tok),
             |p AS (SELECT source, tokens,
             |    pow(CAST(tokens AS DOUBLE), 0.5) / z.z AS wr
             |  FROM tok, z),
             |q AS (SELECT source, tokens, wr,
             |    CAST(floor(600000.0 * wr) AS BIGINT) AS planned_tokens
             |  FROM p),
             |e AS (SELECT *, CAST(planned_tokens AS DOUBLE) /
             |      CAST(tokens AS DOUBLE) AS epochs_raw,
             |    CASE WHEN CAST(planned_tokens AS DOUBLE) /
             |      CAST(tokens AS DOUBLE) > 1.2 THEN 1 ELSE 0 END
             |      AS capped
             |  FROM q)
             |SELECT source, tokens, round(wr, 6) AS weight,
             |  planned_tokens, round(epochs_raw, 4) AS epochs, capped,
             |  CASE WHEN capped = 1 THEN
             |      CAST(floor(1.2 * CAST(tokens AS DOUBLE)) AS BIGINT)
             |    ELSE planned_tokens END AS granted_tokens,
             |  planned_tokens - CASE WHEN capped = 1 THEN
             |      CAST(floor(1.2 * CAST(tokens AS DOUBLE)) AS BIGINT)
             |    ELSE planned_tokens END AS shortfall_tokens
             |FROM e ORDER BY source""".stripMargin)),

    // Soft dedup (Components.softDedupWeights, the SoftDeDup
    // reweight-not-delete policy) riding q61's verified near-dup
    // clusters: per-source raw vs effective token mass with the
    // duplication inflation explicit — the mixture planner's input
    // when content must not be deleted outright.
    QueryDef("q325_soft_dedup",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        // r13: stored cluster map probe (see ensureNearDupIndex).
        val clusters = ndClusters(s, dir)
          .where(col("cluster_size") >= 2L)
        val withTok = docs.withColumn("toks",
          TextAnalysis.tokenCount(col("text")).cast("long"))
        Components.softDedupWeights(withTok, "doc_id", "source",
            "toks", clusters)
          .orderBy("source")
      },
      Some("WITH RECURSIVE " + minhashVerifiedCtes + ",\n" +
        clusterChainCtes + ",\n" +
        """tok2 AS (SELECT doc_id, source,
          |    CAST(len(list_filter(string_split_regex(text, ' +'),
          |      t -> t <> '')) AS BIGINT) AS m
          |  FROM documents),
          |asg AS (SELECT comp.id, sizes.cluster_size
          |  FROM comp JOIN sizes USING (component)
          |  WHERE sizes.cluster_size >= 2),
          |wgt AS (SELECT t2.source, t2.m, asg.cluster_size
          |  FROM tok2 t2 LEFT JOIN asg ON asg.id = t2.doc_id),
          |grp AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
          |    CAST(sum(CASE WHEN cluster_size IS NOT NULL THEN 1
          |      ELSE 0 END) AS BIGINT) AS n_in_clusters,
          |    CAST(sum(m) AS BIGINT) AS raw_mass,
          |    CAST(sum(m * (1000000 // coalesce(cluster_size, 1)))
          |      AS BIGINT) AS eff_micro
          |  FROM wgt GROUP BY 1)
          |SELECT source, n_docs, n_in_clusters, raw_mass,
          |  round(CAST(eff_micro AS DOUBLE) / 1000000.0, 6) AS eff_mass,
          |  CASE WHEN eff_micro >= 1000 THEN
          |    ((raw_mass * 1000000000) // (eff_micro // 1000)) - 1000000
          |  ELSE 0 END AS dup_inflation_ppm
          |FROM grp ORDER BY source""".stripMargin)),

    // l-diversity audit (Anonymity.lDiversity, Machanavajjhala 2007)
    // over a customer extract: QI = (nation, segment, acctbal
    // hundred-band as an "age band" proxy), sensitive = acctbal
    // thousand-bucket — k-anonymous classes can still leak when a
    // class collapses to one sensitive value; the least-diverse
    // classes are the disclosure surface.
    QueryDef("q326_l_diversity",
      (s, dir) => {
        val cust = t(s, dir, "customer").select(
          col("c_nationkey"), col("c_mktsegment"),
          floor(col("c_acctbal") / 2000.0).cast("long").as("band"),
          floor(col("c_acctbal") / 1000.0).cast("long").as("sens"))
        Anonymity.lDiversity(cust,
          Seq("c_nationkey", "c_mktsegment", "band"), "sens",
          l = 2L, topN = 15)
          .orderBy("risk_rank")
      },
      Some("""WITH cust AS (
             |  SELECT c_nationkey, c_mktsegment,
             |    CAST(floor(c_acctbal / 2000.0) AS BIGINT) AS band,
             |    CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS sens
             |  FROM customer),
             |cls AS (SELECT c_nationkey, c_mktsegment, band,
             |    CAST(count(*) AS BIGINT) AS class_size,
             |    CAST(count(DISTINCT sens) AS BIGINT) AS n_sensitive
             |  FROM cust GROUP BY 1, 2, 3),
             |summ AS (SELECT CAST(count(*) AS BIGINT) AS n_classes,
             |    CAST(sum(CASE WHEN n_sensitive < 2 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n_below_l,
             |    CAST(sum(CASE WHEN n_sensitive < 2 THEN class_size
             |      ELSE 0 END) AS BIGINT) AS records_below_l,
             |    CAST(min(n_sensitive) AS BIGINT) AS min_l
             |  FROM cls),
             |top AS (SELECT *, row_number() OVER (
             |      ORDER BY n_sensitive ASC, class_size DESC,
             |        c_nationkey ASC, c_mktsegment ASC, band ASC)
             |    AS risk_rank
             |  FROM cls
             |  ORDER BY n_sensitive ASC, class_size DESC,
             |    c_nationkey ASC, c_mktsegment ASC, band ASC
             |  LIMIT 15)
             |SELECT risk_rank, c_nationkey, c_mktsegment, band,
             |  class_size, n_sensitive, n_classes, n_below_l,
             |  records_below_l, min_l
             |FROM top, summ ORDER BY risk_rank""".stripMargin)),

    // Split conformal interval (Conformal.splitConformalMean, Lei
    // 2018) around the per-event-type mean: the ⌈(n+1)(1−α)⌉-th
    // smallest calibration residual — an EXACT distributed order
    // statistic (Rank.globalRowNumber), never an interpolated
    // percentile or a single-task sort — then finite-sample coverage
    // verified on the held-out half.
    QueryDef("q327_conformal_interval",
      (s, dir) => Conformal.splitConformalMean(
        t(s, dir, "events"), "event_id", "event_type", "value",
        alphaPpm = 100000L),
      Some(s"""WITH base AS (
             |  SELECT event_id AS id, event_type AS g,
             |    CAST(round(value * 1000000.0) AS BIGINT) AS v,
             |    ${Hashing.duckPortableHash("CAST(event_id AS VARCHAR)")}
             |      % 2 = 0 AS cal
             |  FROM events WHERE value IS NOT NULL),
             |mu AS (SELECT g, CAST(sum(v) AS BIGINT) //
             |      CAST(count(*) AS BIGINT) AS mu
             |  FROM base WHERE cal GROUP BY 1),
             |calres AS (SELECT b.id, abs(b.v - mu.mu) AS r
             |  FROM base b JOIN mu USING (g) WHERE b.cal),
             |nc AS (SELECT CAST(count(*) AS BIGINT) AS n_cal FROM calres),
             |kk AS (SELECT n_cal,
             |    least(n_cal, ((n_cal + 1) * 900000 + 999999) // 1000000)
             |      AS k
             |  FROM nc),
             |qh AS (SELECT kk.n_cal, kk.k, cr.r AS q
             |  FROM kk JOIN (SELECT r, row_number() OVER (
             |      ORDER BY r ASC, id ASC) AS rk FROM calres) cr
             |    ON cr.rk = kk.k),
             |ev AS (SELECT qh.n_cal, qh.k, qh.q,
             |    CAST(sum(CASE WHEN mu.mu IS NOT NULL THEN 1 ELSE 0
             |      END) AS BIGINT) AS n_eval,
             |    CAST(sum(CASE WHEN mu.mu IS NULL THEN 1 ELSE 0
             |      END) AS BIGINT) AS n_eval_dropped,
             |    CAST(sum(CASE WHEN mu.mu IS NOT NULL AND
             |      abs(b.v - mu.mu) <= qh.q THEN 1
             |      ELSE 0 END) AS BIGINT) AS n_covered
             |  FROM base b LEFT JOIN mu USING (g), qh
             |  WHERE NOT b.cal GROUP BY 1, 2, 3)
             |SELECT n_cal, n_eval, n_eval_dropped, k,
             |  round(CAST(q AS DOUBLE) / 1000000.0, 6) AS q, n_covered,
             |  CASE WHEN n_eval > 0 THEN (n_covered * 1000000) // n_eval
             |    END AS coverage_ppm,
             |  CAST(900000 AS BIGINT) AS target_ppm,
             |  round(CAST(q AS DOUBLE) * 2.0 / 1000000.0, 6)
             |    AS mean_width
             |FROM ev""".stripMargin)),

    // Vocabulary coverage curve (TextAnalysis.vocabCoverage): the
    // tokenizer-budget integral of q291's Zipf fit — cumulative
    // token mass at vocab-size checkpoints, frequency ranks via
    // Rank.globalRowNumber + Rank.prefixSum (the round-12 global-rank
    // discipline; the vocab frame is Heaps-law data-proportional).
    QueryDef("q328_vocab_coverage",
      (s, dir) => TextAnalysis.vocabCoverage(
        t(s, dir, "documents"), "text", Seq(1L, 3L, 5L, 10L, 20L))
        .orderBy("vocab_k"),
      Some("""WITH tok AS (
             |  SELECT unnest(list_filter(string_split_regex(text, ' +'),
             |    t -> t <> '')) AS token
             |  FROM documents),
             |cnt AS (SELECT token, CAST(count(*) AS BIGINT) AS cnt
             |  FROM tok GROUP BY 1),
             |rk AS (SELECT token, cnt,
             |    CAST(row_number() OVER (ORDER BY cnt DESC, token)
             |      AS BIGINT) AS vocab_k,
             |    CAST(sum(cnt) OVER (ORDER BY cnt DESC, token
             |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
             |  FROM cnt),
             |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_types,
             |    CAST(sum(cnt) AS BIGINT) AS n_tokens
             |  FROM cnt)
             |SELECT vocab_k, token AS boundary_token,
             |  cnt AS boundary_count, cum_tokens,
             |  (cum_tokens * 1000000) // n_tokens AS coverage_ppm,
             |  n_types, n_tokens
             |FROM rk, tot WHERE vocab_k IN (1, 3, 5, 10, 20)
             |ORDER BY vocab_k""".stripMargin)),

    // Capstone composition: the q325 soft-dedup EFFECTIVE masses feed
    // the q324 temperature plan — "budget the mixture on what the
    // data is worth after duplication discounting, not on raw size".
    // Pure op reuse: the whole query is softDedupWeights ∘
    // temperaturePlan.
    QueryDef("q329_mixture_rebalance",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        // r13: stored cluster map probe (see ensureNearDupIndex).
        val clusters = ndClusters(s, dir)
          .where(col("cluster_size") >= 2L)
        val withTok = docs.withColumn("toks",
          TextAnalysis.tokenCount(col("text")).cast("long"))
        val eff = Components.softDedupWeights(withTok, "doc_id",
            "source", "toks", clusters)
          .select(col("source"),
            floor(col("eff_mass")).cast("long").as("tokens"))
        Mixing.temperaturePlan(eff, "source", "tokens",
            alpha = 0.5, targetTokens = 60000L, maxEpochs = 1.5)
          .withColumn("capped", col("capped").cast("int"))
          .orderBy("source")
      },
      Some("WITH RECURSIVE " + minhashVerifiedCtes + ",\n" +
        clusterChainCtes + ",\n" +
        """tok2 AS (SELECT doc_id, source,
          |    CAST(len(list_filter(string_split_regex(text, ' +'),
          |      t -> t <> '')) AS BIGINT) AS m
          |  FROM documents),
          |asg AS (SELECT comp.id, sizes.cluster_size
          |  FROM comp JOIN sizes USING (component)
          |  WHERE sizes.cluster_size >= 2),
          |wgt AS (SELECT t2.source, t2.m, asg.cluster_size
          |  FROM tok2 t2 LEFT JOIN asg ON asg.id = t2.doc_id),
          |eff AS (SELECT source,
          |    CAST(floor(round(CAST(sum(m * (1000000 //
          |      coalesce(cluster_size, 1))) AS DOUBLE) / 1000000.0, 6))
          |      AS BIGINT) AS tokens
          |  FROM wgt GROUP BY 1),
          |z AS (SELECT sum(pow(CAST(tokens AS DOUBLE), 0.5)) AS z
          |  FROM eff),
          |p AS (SELECT source, tokens,
          |    pow(CAST(tokens AS DOUBLE), 0.5) / z.z AS wr
          |  FROM eff, z),
          |q AS (SELECT source, tokens, wr,
          |    CAST(floor(60000.0 * wr) AS BIGINT) AS planned_tokens
          |  FROM p),
          |e AS (SELECT *, CAST(planned_tokens AS DOUBLE) /
          |      CAST(tokens AS DOUBLE) AS epochs_raw,
          |    CASE WHEN CAST(planned_tokens AS DOUBLE) /
          |      CAST(tokens AS DOUBLE) > 1.5 THEN 1 ELSE 0 END
          |      AS capped
          |  FROM q)
          |SELECT source, tokens, round(wr, 6) AS weight,
          |  planned_tokens, round(epochs_raw, 4) AS epochs, capped,
          |  CASE WHEN capped = 1 THEN
          |      CAST(floor(1.5 * CAST(tokens AS DOUBLE)) AS BIGINT)
          |    ELSE planned_tokens END AS granted_tokens,
          |  planned_tokens - CASE WHEN capped = 1 THEN
          |      CAST(floor(1.5 * CAST(tokens AS DOUBLE)) AS BIGINT)
          |    ELSE planned_tokens END AS shortfall_tokens
          |FROM e ORDER BY source""".stripMargin)),

    // MMR diversified re-rank (Retrieval.mmrRerank, Carbonell &
    // Goldstein SIGIR'98) of q69's BM25 pool: greedy
    // λ·rel − (1−λ)·max-Jaccard-to-selected, five picks from the
    // top-20 — the continuous form of q207's per-group diversity cap.
    QueryDef("q330_mmr_rerank",
      (s, dir) => Retrieval.mmrRerank(t(s, dir, "documents"),
        "doc_id", "text", Seq("spark", "join", "stream"),
        pool = 20, select = 5, lambda = 0.7)
        .orderBy("step"),
      Some("WITH " + bm25RankedCtes(20) + ",\n" +
        """cpool AS MATERIALIZED (
          |  -- bm25TopK emits 4-decimal-rounded scores; mirror before
          |  -- normalizing or rel walks a different double.
          |  SELECT l.doc_id, round(l.score, 4) AS sc,
          |    list_distinct(t.tk) AS tk
          |  FROM lexr l JOIN tk t USING (doc_id)),
          |mx AS (SELECT max(sc) AS mx FROM cpool),
          |cr AS MATERIALIZED (
          |  SELECT doc_id, sc / mx.mx AS rel, tk FROM cpool, mx),
          |p1 AS MATERIALIZED (
          |  SELECT doc_id, rel, tk, 0.0 AS maxsim, rel AS mmr,
          |    1 AS step
          |  FROM cr ORDER BY rel DESC, doc_id LIMIT 1),
          |sel1 AS MATERIALIZED (SELECT * FROM p1),
          |""".stripMargin +
        (2 to 5).map { k =>
          s"""ms$k AS MATERIALIZED (
             |  SELECT r.doc_id, r.rel, r.tk,
             |    max(CAST(len(list_intersect(r.tk, s.tk)) AS DOUBLE) /
             |        len(list_distinct(list_concat(r.tk, s.tk))))
             |      AS maxsim
             |  FROM cr r, sel${k - 1} s
             |  WHERE r.doc_id NOT IN (SELECT doc_id FROM sel${k - 1})
             |  GROUP BY 1, 2, 3),
             |p$k AS MATERIALIZED (
             |  SELECT doc_id, rel, tk, maxsim,
             |    0.7 * rel - (1.0 - 0.7) * maxsim AS mmr, $k AS step
             |  FROM ms$k ORDER BY mmr DESC, doc_id LIMIT 1),
             |sel$k AS MATERIALIZED (
             |  SELECT * FROM sel${k - 1} UNION ALL SELECT * FROM p$k)"""
            .stripMargin
        }.mkString(",\n") + "\n" +
        """SELECT step, doc_id, round(rel, 6) AS rel,
          |  round(maxsim, 4) AS max_sim, round(mmr, 6) AS mmr
          |FROM sel5 ORDER BY step""".stripMargin)),

    // Embedding centroid drift per language (Drift.centroidDrift):
    // cosine of each language's mean vector to the corpus mean +
    // norm ratio — semantic drift the token-marginal screens (q241)
    // can't see; everything map-side-combinable sums at
    // |groups|×dim grain.
    QueryDef("q331_centroid_drift",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val docs = t(s, dir, "documents")
          .select(col("doc_id"), col("lang"))
        val joined = emb
          .join(docs, emb("vec_id") === docs("doc_id"))
          .select(col("lang"), col("embedding"))
        Drift.centroidDrift(joined, "lang", "embedding")
          .orderBy("lang")
      },
      Some("""WITH j AS (
             |  SELECT d.lang, e.embedding
             |  FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id),
             |comps AS (SELECT lang, i,
             |    CAST(embedding[i] AS DOUBLE) AS v
             |  FROM j, generate_series(1, 64) AS g(i)),
             |byg AS (SELECT lang, i, sum(v) / count(*) AS c
             |  FROM comps GROUP BY 1, 2),
             |gl AS (SELECT i, sum(v) / count(*) AS cg
             |  FROM comps GROUP BY 1),
             |dots AS (SELECT lang, sum(c * cg) AS dot,
             |    sum(c * c) AS nn, sum(cg * cg) AS gg
             |  FROM byg JOIN gl USING (i) GROUP BY 1),
             |nv AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_vecs
             |  FROM j GROUP BY 1)
             |SELECT nv.lang, nv.n_vecs,
             |  round(dot / (sqrt(nn) * sqrt(gg)), 6) AS cos_to_global,
             |  round(sqrt(nn), 6) AS norm,
             |  round(sqrt(nn) / sqrt(gg), 6) AS norm_ratio
             |FROM nv JOIN dots USING (lang) ORDER BY lang""".stripMargin))
  )
}
