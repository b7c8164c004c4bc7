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

/** SURVEY.md §2 operator inventory, exercised as oracle-checked queries
  * over the driver's TPC-H-ish tables. Each query cites the §2 row(s)
  * it covers and the reference site whose semantics it re-expresses.
  */
object GemQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Graft.table(s, dir, name)

  /** Session-memoized build of the SHARED near-dup index pair over the
    * governance slice (`doc_id < 1000`, k=64/bands=8/thr=0.8 — the
    * exact parameters q61 established): `graft_nd_pairs` (verified
    * pairs with jaccard, `id_a`-bucketed) and `graft_cluster_map` (the
    * persisted `doc_id → component` map,
    * [[Components.writeClusterIndex]] — the fourth stored index beside
    * bands/codes/postings). Until round 13 every release-governance
    * query (q318 manifest, q325/q329 soft-dedup, q334 locality, q343
    * license propagation) re-ran minhash + component iteration INLINE —
    * at 100 TB that is a full-corpus pair rebuild per review query.
    * Now the build runs once per session+dir and the queries PROBE the
    * stored tables; their returned plans contain no minhash signature
    * fold and no component iteration (plan-asserted in LayoutSpec).
    * Cache key includes the warehouse dir so two sessions in one JVM
    * (the test harness) never cross-write.
    */
  private val ndIdxBuilt = scala.collection.mutable.Set[String]()
  private def ensureNearDupIndex(s: SparkSession, dir: String): Unit =
    ndIdxBuilt.synchronized {
      val key = s.conf.get("spark.sql.warehouse.dir") + "|" + dir
      if (!ndIdxBuilt.contains(key)) {
        val slice = t(s, dir, "documents")
          .filter(col("doc_id") < 1000).select("doc_id", "text")
        val pairs = Dedup.minhashNearDups(slice, "doc_id", "text",
          k = 64, bands = 8, threshold = 0.8).localCheckpoint(true)
        Layout.replaceBucketed(s, pairs, "graft_nd_pairs", "id_a",
          buckets = 8)
        Components.writeClusterIndex(s, slice, "doc_id",
          pairs, "id_a", "id_b", "graft_cluster_map", buckets = 8)
        ndIdxBuilt += key
      }
    }

  /** Stored verified near-dup pairs (`id_a`, `id_b`, `jaccard`). */
  private def ndPairs(s: SparkSession, dir: String): DataFrame = {
    ensureNearDupIndex(s, dir)
    Layout.table(s, "graft_nd_pairs")
  }

  /** Stored cluster map, probe-resolved to the [[Components
    * .dedupClusters]] schema (`doc_id`, `component`, `cluster_size`).
    */
  private def ndClusters(s: SparkSession, dir: String): DataFrame = {
    ensureNearDupIndex(s, dir)
    Components.clustersFromIndex(Layout.table(s, "graft_cluster_map"))
  }

  /** Shared oracle CTE chain: MinHash signatures → LSH bands → verified
    * exact-Jaccard pairs on the `doc_id < 1000` slice. q44 selects the
    * pairs directly; q61 stacks a recursive connected-components CTE on
    * top. ONE definition so the two oracles cannot drift (the r3/r5
    * lesson: oracle CTE copies diverge silently).
    */
  /** DuckDB cosine over two list columns, double precision — the exact
    * fragment q29/q45/q52 inline; shared by the IVF-training oracles.
    */
  private def duckCos(a: String, b: String): String =
    s"""list_sum(list_transform($a, (x, i) ->
       |      CAST(x AS DOUBLE) * CAST($b[i] AS DOUBLE))) /
       |    (sqrt(list_sum(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
       |     sqrt(list_sum(list_transform($b, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))""".stripMargin

  /** Oracle twin of [[Similarity.hyperplaneBucket]]: the md5
    * hyperplane-LSH bucket over GLOBAL plane indices [lo, hi], bit
    * positions (p - lo). ONE generator for the q45 single-table
    * bucket, q67's single- and multi-table evals, and any future LSH
    * oracle, so the hash math cannot drift between copies.
    */
  private def lshBucketSql(lo: Int, hi: Int): String =
    s"""CAST(list_sum(list_transform(generate_series($lo, $hi), p ->
       |      CASE WHEN list_sum(list_transform(embedding, (v, i) ->
       |          CAST(v AS DOUBLE) * (CASE WHEN
       |            CAST(('0x' || substr(md5(CAST(p AS VARCHAR) || ':' ||
       |              CAST(i - 1 AS VARCHAR)), 1, 15)) AS BIGINT) & 1 = 1
       |            THEN 1.0 ELSE -1.0 END))) >= 0
       |        THEN (CAST(1 AS BIGINT) << (p - $lo)) ELSE CAST(0 AS BIGINT) END))
       |      AS BIGINT)""".stripMargin

  /** Multi-table LSH buckets ([[Similarity.lshTopKMulti]]'s `tabled`
    * frame): per-table UNION of [[lshBucketSql]] slices of the shared
    * plane universe — table t = planes [t*planes, (t+1)*planes).
    */
  private def lshMultiBucketCte(
      name: String, planes: Int, tables: Int): String = {
    val parts = (0 until tables).map { t =>
      val lo = t * planes
      s"""  SELECT vec_id, $t AS tbl, ${lshBucketSql(lo, lo + planes - 1)}
         |    AS bucket FROM embeddings""".stripMargin
    }
    s"$name AS (\n${parts.mkString("\n  UNION ALL\n")})"
  }

  /** Oracle twin of [[Similarity.trainCentroids]] (k-means on the
    * 64-dim `embeddings` table): seed CTE `cent0` = the k vectors with
    * the smallest portable md5 hash of their id, then `iters` unrolled
    * Lloyd rounds `assign{i}` / `cent{i}` — argmax-cosine assignment,
    * per-position mean rounded to 6 decimals and cast to REAL, exactly
    * the Spark trajectory. ONE generator shared by q65/q66/q67 so the
    * training oracles cannot drift.
    */
  private def kmeansCtes(k: Int, iters: Int): String = {
    val seed =
      s"""poss AS (SELECT unnest(generate_series(1, 64)) AS pos),
         |cent0 AS (
         |  SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS cell_id,
         |    embedding AS centvec
         |  FROM (SELECT vec_id, embedding,
         |          ${graft.functions.Hashing.duckPortableHash("CAST(vec_id AS VARCHAR)")} AS h
         |        FROM embeddings ORDER BY h, vec_id LIMIT $k))""".stripMargin
    val rounds = (1 to iters).map { i =>
      s"""assign$i AS (
         |  SELECT vec_id, embedding, cell_id FROM (
         |    SELECT e.vec_id, e.embedding, c.cell_id,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${duckCos("e.embedding", "c.centvec")} DESC, c.cell_id) AS rn
         |    FROM embeddings e CROSS JOIN cent${i - 1} c)
         |  WHERE rn = 1),
         |cent$i AS (
         |  SELECT cell_id, list(CAST(round(m, 6) AS REAL) ORDER BY pos) AS centvec
         |  FROM (SELECT a.cell_id, p.pos,
         |          avg(CAST(a.embedding[p.pos] AS DOUBLE)) AS m
         |        FROM assign$i a CROSS JOIN poss p
         |        GROUP BY a.cell_id, p.pos)
         |  GROUP BY cell_id)""".stripMargin
    }
    (seed +: rounds).mkString(",\n")
  }

  /** Oracle twin of [[graft.ops.Pca.topComponent]]: column means
    * (`pmu`), md5-sign init scaled 1/sqrt(dim) (`pv0`), then `iters`
    * unrolled power rounds `ps{i}` (per-row centered projection, the
    * two list_sums mirroring Spark's zip_with aggregate minus the
    * mu.v scalar) / `pt{i}`+`ptl{i}` (per-position X^T X v) / `pv{i}`
    * (the normalize). Ends at `pv{iters}`.
    */
  private def pcaCtes(
      dim: Int, iters: Int, pfx: String = "",
      src: String = "embeddings"): String = {
    val seed =
      s"""${pfx}poss AS (SELECT unnest(generate_series(1, $dim)) AS pos),
         |${pfx}pxs AS MATERIALIZED (SELECT embedding FROM $src
         |        WHERE len(embedding) = $dim),
         |${pfx}pmu AS (SELECT p.pos,
         |          avg(CAST(x.embedding[CAST(p.pos AS INT)]
         |          AS DOUBLE)) AS m
         |        FROM ${pfx}pxs x CROSS JOIN ${pfx}poss p GROUP BY p.pos),
         |${pfx}pml AS (SELECT list(m ORDER BY pos) AS ml FROM ${pfx}pmu),
         |${pfx}pv0 AS (SELECT list_transform(generate_series(1, $dim), j ->
         |    (CASE WHEN CAST(('0x' || substr(md5('0:' ||
         |        CAST(j - 1 AS VARCHAR)), 1, 15)) AS BIGINT) & 1 = 1
         |      THEN 1.0 ELSE -1.0 END) / sqrt(CAST($dim AS DOUBLE)))
         |    AS vl)""".stripMargin
    val rounds = (1 to iters).map { i =>
      s"""${pfx}ps$i AS MATERIALIZED (SELECT x.embedding,
         |    list_sum(list_transform(x.embedding, (e, j) ->
         |      CAST(e AS DOUBLE) * v.vl[j]))
         |    - list_sum(list_transform(m.ml, (mm, j) -> mm * v.vl[j]))
         |      AS s
         |  FROM ${pfx}pxs x CROSS JOIN ${pfx}pv${i - 1} v
         |  CROSS JOIN ${pfx}pml m),
         |${pfx}pst$i AS (SELECT sum(s) AS stot FROM ${pfx}ps$i),
         |${pfx}pt$i AS (SELECT p.pos,
         |    sum(CAST(s.embedding[CAST(p.pos AS INT)] AS DOUBLE) * s.s)
         |      AS txs
         |  FROM ${pfx}ps$i s CROSS JOIN ${pfx}poss p GROUP BY p.pos),
         |${pfx}ptl$i AS (SELECT
         |    list(t.txs - mu.m * (SELECT stot FROM ${pfx}pst$i)
         |    ORDER BY t.pos) AS l
         |  FROM ${pfx}pt$i t JOIN ${pfx}pmu mu USING (pos)),
         |${pfx}pv$i AS (SELECT list_transform(l, e -> e /
         |    sqrt(list_sum(list_transform(l, x -> x * x)))) AS vl
         |  FROM ${pfx}ptl$i)""".stripMargin
    }
    (seed +: rounds).mkString(",\n")
  }

  /** Deflation CTE on top of a fitted [[pcaCtes]] stage: the residual
    * frame `x - mu - ((x - mu).v) v` (unrounded), mirroring
    * `Pca.residual`. `fromPfx` names the fitted stage, `out` the
    * emitted CTE (column `embedding`, DOUBLE list).
    */
  private def pcaDeflCtes(fromPfx: String, iters: Int, out: String): String =
    s"""${out}_s AS (SELECT x.embedding,
       |    list_sum(list_transform(x.embedding, (e, j) ->
       |      CAST(e AS DOUBLE) * v.vl[j]))
       |    - list_sum(list_transform(m.ml, (mm, j) -> mm * v.vl[j]))
       |      AS s
       |  FROM ${fromPfx}pxs x CROSS JOIN ${fromPfx}pv$iters v
       |  CROSS JOIN ${fromPfx}pml m),
       |$out AS MATERIALIZED (SELECT
       |    list_transform(generate_series(1, 64), j ->
       |    CAST(p.embedding[CAST(j AS INT)] AS DOUBLE) - m.ml[j]
       |      - p.s * v.vl[j]) AS embedding
       |  FROM ${out}_s p CROSS JOIN ${fromPfx}pml m
       |  CROSS JOIN ${fromPfx}pv$iters v)""".stripMargin

  /** Oracle twin of [[graft.ops.TextAnalysis.tfidfTopTerms]] over any
    * `(idCol, text)` source CTE/table: `tok`/`tf`/`dfq`/`nd`/`sc`/`r`
    * — `r` carries the rank window (score DESC, term). ONE generator
    * shared by q114 and q146 so the scoring cannot drift.
    */
  private def tfidfCtes(src: String, idCol: String, k: Int): String =
    s"""tok AS (
       |  SELECT $idCol, unnest(list_filter(
       |    string_split_regex(text, ' +'), t -> t <> '')) AS term
       |  FROM $src),
       |tf AS (SELECT $idCol, term, count(*) AS tf
       |       FROM tok GROUP BY $idCol, term),
       |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
       |nd AS (SELECT count(*) AS n_docs FROM $src),
       |sc AS (
       |  SELECT t.$idCol, t.term, t.tf, d.df,
       |    t.tf * ln(CAST(n.n_docs AS DOUBLE) / d.df) AS score
       |  FROM tf t JOIN dfq d USING (term) CROSS JOIN nd n),
       |r AS (
       |  SELECT $idCol, term, tf, df, score,
       |    CAST(row_number() OVER (PARTITION BY $idCol
       |      ORDER BY score DESC, term) AS INT) AS "rank"
       |  FROM sc)""".stripMargin

  /** Id-carrying twin of [[pcaDeflCtes]]: residual rows
    * `(vec_id, embedding)` of `src` under the `fromPfx`-stage fit —
    * for the all-but-top-K query, whose output keeps ids.
    */
  private def pcaResidCtes(
      fromPfx: String, iters: Int, src: String, out: String): String =
    s"""${out}_s AS (SELECT e.vec_id, e.embedding,
       |    list_sum(list_transform(e.embedding, (x, j) ->
       |      CAST(x AS DOUBLE) * v.vl[j]))
       |    - list_sum(list_transform(m.ml, (mm, j) -> mm * v.vl[j]))
       |      AS s
       |  FROM $src e CROSS JOIN ${fromPfx}pv$iters v
       |  CROSS JOIN ${fromPfx}pml m
       |  WHERE len(e.embedding) = 64),
       |$out AS MATERIALIZED (SELECT vec_id,
       |    list_transform(generate_series(1, 64), j ->
       |    CAST(p.embedding[CAST(j AS INT)] AS DOUBLE) - m.ml[j]
       |      - p.s * v.vl[j]) AS embedding
       |  FROM ${out}_s p CROSS JOIN ${fromPfx}pml m
       |  CROSS JOIN ${fromPfx}pv$iters v)""".stripMargin

  /** Oracle twin of [[graft.ops.LogReg.train]]: hashed unigram+bigram
    * features L1-normalized per doc (`lx`), label = (lang = 'en'),
    * then `iters` unrolled full-batch GD rounds `m{i}` (per-doc
    * sigmoid error) / `g{i}` (per-bucket gradient) / `w{i}` (the
    * update). Ends at `w{iters}`. ONE generator shared by q118/q119
    * so the training trajectories cannot drift.
    */
  private def logregCtes(dim: Int, lr: String, iters: Int,
      label: String = "CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END")
      : String = {
    val seed =
      s"""ltkl AS (
         |  SELECT doc_id,
         |    $label AS y,
         |    list_filter(string_split_regex(text, ' +'),
         |      t -> t <> '') AS tk
         |  FROM documents),
         |lf AS (
         |  SELECT doc_id, y, unnest(list_concat(tk,
         |    list_transform(generate_series(2, len(tk)),
         |      i -> tk[CAST(i AS INT) - 1] || ' ' ||
         |        tk[CAST(i AS INT)]))) AS f
         |  FROM ltkl),
         |lfb AS (
         |  SELECT doc_id, y,
         |    ${Hashing.duckPortableHash("f")} % $dim AS bucket,
         |    count(*) AS n
         |  FROM lf GROUP BY doc_id, y, bucket),
         |lx AS MATERIALIZED (
         |  SELECT doc_id, y, bucket, CAST(n AS DOUBLE) /
         |    CAST(sum(n) OVER (PARTITION BY doc_id) AS DOUBLE) AS x
         |  FROM lfb),
         |lxb AS MATERIALIZED (
         |  SELECT * FROM lx
         |  UNION ALL
         |  SELECT DISTINCT doc_id, y, CAST(-1 AS BIGINT) AS bucket,
         |    1.0 AS x
         |  FROM lx),
         |nd AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS nd
         |       FROM lxb),
         |w0 AS (SELECT DISTINCT bucket, 0.0 AS w FROM lxb)""".stripMargin
    val rounds = (1 to iters).map { i =>
      s"""m$i AS (SELECT t.doc_id,
         |    1.0 / (1.0 + exp(-sum(t.x * w.w))) - max(t.y) AS err
         |  FROM lxb t JOIN w${i - 1} w USING (bucket)
         |  GROUP BY t.doc_id),
         |g$i AS (SELECT t.bucket,
         |    sum(t.x * m.err) / (SELECT nd FROM nd) AS g
         |  FROM lxb t JOIN m$i m USING (doc_id) GROUP BY t.bucket),
         |w$i AS MATERIALIZED (SELECT w.bucket,
         |    w.w - $lr * coalesce(g.g, 0.0) AS w
         |  FROM w${i - 1} w LEFT JOIN g$i g USING (bucket))""".stripMargin
    }
    (seed +: rounds).mkString(",\n")
  }

  /** Oracle twin of [[graft.ops.Bpe.train]]: `tok`/`v0` build the
    * (word, freq) vocabulary with each word as its initial
    * double-space symbol-state string, then `iters` unrolled rounds
    * `p{i}` (adjacent-pair counts, freq-weighted) / `b{i}` (argmax
    * with the (left, right) tie-break) / `m{i}` (the recorded rule) /
    * `v{i}` (the literal replace() that applies the merge). ONE
    * generator so a sibling query cannot drift from q106's replay.
    */
  private def bpeTrainCtes(iters: Int): String = {
    val seed =
      s"""tok AS (
         |  SELECT unnest(list_filter(string_split_regex(text, ' +'),
         |    t -> t <> '')) AS token FROM documents),
         |v0 AS (
         |  SELECT ' ' || array_to_string(list_transform(
         |      generate_series(1, length(token)),
         |      i -> substr(token, CAST(i AS INT), 1)), '  ') || ' '
         |    AS state, count(*) AS freq
         |  FROM tok GROUP BY token)""".stripMargin
    val rounds = (1 to iters).map { i =>
      s"""p$i AS (
         |  SELECT pr.l AS "left", pr.r AS "right",
         |    CAST(sum(freq) AS BIGINT) AS cnt
         |  FROM (
         |    SELECT freq, unnest(list_transform(
         |        generate_series(1, len(syms) - 1),
         |        j -> struct_pack(l := syms[CAST(j AS INT)],
         |          r := syms[CAST(j AS INT) + 1]))) AS pr
         |    FROM (SELECT string_split(trim(state), '  ') AS syms, freq
         |          FROM v${i - 1}))
         |  GROUP BY 1, 2),
         |b$i AS (SELECT "left", "right", cnt FROM p$i
         |        ORDER BY cnt DESC, "left", "right" LIMIT 1),
         |m$i AS (SELECT CAST($i AS INT) AS step, "left", "right",
         |          "left" || "right" AS merged, cnt FROM b$i),
         |v$i AS (
         |  SELECT replace(state, ' ' || b."left" || '  ' || b."right" || ' ',
         |      ' ' || b."left" || b."right" || ' ') AS state, freq
         |  FROM v${i - 1} CROSS JOIN b$i b)""".stripMargin
    }
    (seed +: rounds).mkString(",\n")
  }

  /** Oracle twin of [[graft.ops.Bpe.tokenCount]] layered on
    * [[bpeTrainCtes]]: `dtok`/`e0` give every (doc, word) its initial
    * symbol state, then `e{i}` applies round i's rule (`b{i}`) with
    * the same literal replace, and `bpec` sums per-doc symbol counts.
    */
  private def bpeEncodeCtes(iters: Int): String = {
    val seed =
      s"""dtok AS (
         |  SELECT doc_id, unnest(list_filter(
         |    string_split_regex(text, ' +'), t -> t <> '')) AS w
         |  FROM documents),
         |e0 AS (
         |  SELECT doc_id, ' ' || array_to_string(list_transform(
         |      generate_series(1, length(w)),
         |      i -> substr(w, CAST(i AS INT), 1)), '  ') || ' ' AS st
         |  FROM dtok)""".stripMargin
    val rounds = (1 to iters).map { i =>
      s"""e$i AS (
         |  SELECT doc_id, replace(st,
         |      ' ' || b."left" || '  ' || b."right" || ' ',
         |      ' ' || b."left" || b."right" || ' ') AS st
         |  FROM e${i - 1} CROSS JOIN b$i b)""".stripMargin
    }
    val tail =
      s"""bpec AS (
         |  SELECT doc_id, CAST(sum(len(string_split(trim(st), '  ')))
         |    AS BIGINT) AS n_tokens_bpe
         |  FROM e$iters GROUP BY doc_id)""".stripMargin
    (seed +: rounds :+ tail).mkString(",\n")
  }

  /** Deterministic PII planting for q309/q310 (the q149 fixture
    * discipline: the synthetic corpus carries no PII, so the query
    * derives it from doc_id and the oracle replays the same closed
    * forms): doc_id % 3 → an email, % 5 → an E.164 phone, % 7 → an
    * IPv4, % 11 → a 16-digit card candidate whose Luhn validity
    * varies with the id (so BOTH branches of the mod-10 check are
    * exercised).
    */
  private def piiAugmented(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"),
      concat(
        col("text"),
        when(col("doc_id") % 3 === 0,
          concat(lit(" contact user"), col("doc_id"),
            lit("@example.com"))).otherwise(lit("")),
        when(col("doc_id") % 5 === 0,
          concat(lit(" call +1555"),
            lpad((col("doc_id") % 10000).cast("string"), 7, "0")))
          .otherwise(lit("")),
        when(col("doc_id") % 7 === 0,
          concat(lit(" from 10.0."), (col("doc_id") % 256).cast("string"),
            lit("."), ((col("doc_id") * 3) % 256).cast("string")))
          .otherwise(lit("")),
        when(col("doc_id") % 11 === 0,
          concat(lit(" card 4"),
            lpad(((col("doc_id") * 7919) % 1000000000000000L).cast("string"),
              15, "0"))).otherwise(lit(""))).as("text"))

  /** DuckDB twin of [[piiAugmented]] — emits CTE `aug(doc_id, source,
    * t)`; `where` restricts the planted slice (q318).
    */
  private def piiAugCte(where: String = "1 = 1"): String =
    s"""aug AS (SELECT doc_id, source, text ||
      |    CASE WHEN doc_id % 3 = 0 THEN ' contact user' || doc_id ||
      |      '@example.com' ELSE '' END ||
      |    CASE WHEN doc_id % 5 = 0 THEN ' call +1555' ||
      |      lpad(CAST(doc_id % 10000 AS VARCHAR), 7, '0') ELSE '' END ||
      |    CASE WHEN doc_id % 7 = 0 THEN ' from 10.0.' ||
      |      (doc_id % 256) || '.' || ((doc_id * 3) % 256) ELSE '' END ||
      |    CASE WHEN doc_id % 11 = 0 THEN ' card 4' ||
      |      lpad(CAST((doc_id * 7919) % 1000000000000000 AS VARCHAR),
      |        15, '0') ELSE '' END AS t
      |  FROM documents WHERE $where)""".stripMargin

  /** Oracle twin of [[graft.ops.Pii.scan]] over `aug` — emits CTEs
    * `sc` (raw detector matches) and `scl` (+ `cdv`, the Luhn-valid
    * card sublist via the same reverse-indexed mod-10 doubling).
    */
  private val piiScanCtes: String =
    s"""sc AS (
       |  SELECT doc_id,
       |    regexp_extract_all(t, '${Pii.emailRe}') AS em,
       |    regexp_extract_all(t, '${Pii.phoneRe}') AS ph,
       |    regexp_extract_all(t, '${Pii.ipv4Re}') AS ip,
       |    regexp_extract_all(t, '${Pii.cardRe}') AS cd
       |  FROM aug),
       |scl AS (
       |  SELECT doc_id, em, ph, ip, cd,
       |    list_filter(cd, c -> list_sum(list_transform(
       |      generate_series(1, length(c)), i ->
       |      CASE WHEN i % 2 = 1
       |        THEN CAST(substring(c, length(c) - i + 1, 1) AS INT)
       |        ELSE CASE WHEN
       |            CAST(substring(c, length(c) - i + 1, 1) AS INT) * 2 > 9
       |          THEN CAST(substring(c, length(c) - i + 1, 1) AS INT) * 2 - 9
       |          ELSE CAST(substring(c, length(c) - i + 1, 1) AS INT) * 2
       |        END
       |      END)) % 10 = 0) AS cdv
       |  FROM sc)""".stripMargin

  /** Oracle twin of [[Similarity.ivfTopK]] searching the codebook CTE
    * `cent` for queries `vec_id BETWEEN qLo AND qHi`: nearest-cell
    * assignment, `nProbe` probed cells, exact cosine re-rank. The
    * consumer applies its own `"rank" <= k` cut on `{p}ranked`. Emits
    * CTEs `{p}cscore`/`{p}rcells`/`{p}corpus`/`{p}query`/`{p}scored`/
    * `{p}ranked` — prefix them when several searches share one WITH.
    */
  private def ivfSearchCtes(
      cent: String, nProbe: Int, qLo: Int, qHi: Int,
      p: String = ""): String =
    s"""${p}cscore AS (
       |  SELECT e.vec_id, e.embedding, c.cell_id,
       |    ${duckCos("e.embedding", "c.centvec")} AS cell_cos
       |  FROM embeddings e CROSS JOIN $cent c),
       |${p}rcells AS (
       |  SELECT *, row_number() OVER (PARTITION BY vec_id
       |    ORDER BY cell_cos DESC, cell_id) AS crn FROM ${p}cscore),
       |${p}corpus AS (
       |  SELECT vec_id AS neighbor_id, embedding AS cvec, cell_id
       |  FROM ${p}rcells WHERE crn = 1),
       |${p}query AS (
       |  SELECT vec_id AS query_id, embedding AS qvec, cell_id
       |  FROM ${p}rcells WHERE crn <= $nProbe AND vec_id BETWEEN $qLo AND $qHi),
       |${p}scored AS (
       |  SELECT query_id, neighbor_id, ${duckCos("qvec", "cvec")} AS cos
       |  FROM ${p}corpus JOIN ${p}query USING (cell_id)
       |  WHERE neighbor_id <> query_id),
       |${p}ranked AS (
       |  SELECT query_id, neighbor_id,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY cos DESC, neighbor_id) AS "rank", cos
       |  FROM ${p}scored)""".stripMargin

  /** Oracle twin of [[Similarity.ivfSq8TopK]]'s ADC + shortlist +
    * re-rank stages, built on an [[ivfSearchCtes]] prefix `p`
    * (consumes `{p}corpus` / `{p}query`): SQ8 codes via q73's absmax
    * formula, asymmetric cosine (full-precision query × raw int
    * codes — the scale cancels out of cosine), unrounded shortlist
    * cut tie-broken on neighbor_id, exact re-rank. Ends at
    * `{p}sqranked(query_id, neighbor_id, "rank", cos)`.
    */
  private def ivfSq8Ctes(p: String, shortlist: Int): String =
    s"""${p}sqz AS (
       |  SELECT neighbor_id, cell_id, cvec,
       |    coalesce(list_max(list_transform(cvec,
       |      x -> abs(CAST(x AS DOUBLE)))), 0) AS scale
       |  FROM ${p}corpus),
       |${p}sqc AS (
       |  SELECT neighbor_id, cell_id, cvec,
       |    list_transform(cvec, x -> CASE WHEN scale = 0 THEN 0
       |      ELSE CAST(round(CAST(x AS DOUBLE) / scale * 127) AS INT)
       |      END) AS qcodes
       |  FROM ${p}sqz),
       |${p}sqscored AS (
       |  SELECT query_id, neighbor_id, cvec, qvec,
       |    ${duckCos("qvec", "qcodes")} AS adc
       |  FROM ${p}sqc JOIN ${p}query USING (cell_id)
       |  WHERE neighbor_id <> query_id),
       |${p}sqshort AS (
       |  SELECT query_id, neighbor_id, cvec, qvec FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY adc DESC, neighbor_id) AS slrn FROM ${p}sqscored)
       |  WHERE slrn <= $shortlist),
       |${p}sqranked AS (
       |  SELECT query_id, neighbor_id,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY cos DESC, neighbor_id) AS "rank", cos
       |  FROM (SELECT query_id, neighbor_id,
       |          ${duckCos("qvec", "cvec")} AS cos
       |        FROM ${p}sqshort))""".stripMargin

  /** Oracle twin of [[PageRank.run]]: `iters` unrolled power-iteration
    * rounds over upstream CTEs `prnodes(id)` / `predges(src,dst)`
    * (symmetric, distinct, endpoints ⊆ nodes). Mirrors the op's
    * endpoint/isolate split: only edge endpoints (`prdeg`) carry a
    * per-node rank CTE (`pre{i}`); isolates follow the 1-row scalar
    * recurrence `iso{i}` with dangling mass `dm{i} = nIso·iso_{i-1}`.
    * Arithmetic shape matches the Spark op EXACTLY —
    * `(1 - d)/n + d*(contrib + dmass/n)` with the same association, so
    * both engines walk the same double trajectory. Consumer coalesces
    * `pre{iters}` with `iso{iters}`.
    */
  private def pageRankCtes(d: Double, iters: Int): String = {
    val base =
      s"""prn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM prnodes),
         |prdeg AS (SELECT src AS id, CAST(count(*) AS DOUBLE) AS deg
         |          FROM predges GROUP BY src),
         |prniso AS (SELECT CAST((SELECT count(*) FROM prnodes) -
         |                       (SELECT count(*) FROM prdeg) AS DOUBLE) AS c),
         |iso0 AS (SELECT 1.0 / prn.n AS pr FROM prn),
         |pre0 AS (SELECT id, 1.0 / prn.n AS pr FROM prdeg CROSS JOIN prn)""".stripMargin
    val rounds = (1 to iters).map { i =>
      s"""dm$i AS (
         |  SELECT prniso.c * iso${i - 1}.pr AS dmass
         |  FROM prniso CROSS JOIN iso${i - 1}),
         |iso$i AS (
         |  SELECT (1 - $d) / prn.n + $d * (dm$i.dmass / prn.n) AS pr
         |  FROM prn CROSS JOIN dm$i),
         |ct$i AS (
         |  SELECT e.dst AS id, sum(p.pr / g.deg) AS contrib
         |  FROM predges e JOIN pre${i - 1} p ON p.id = e.src
         |  JOIN prdeg g ON g.id = e.src GROUP BY e.dst),
         |pre$i AS (
         |  SELECT nd.id,
         |    (1 - $d) / prn.n + $d * (coalesce(c.contrib, 0) + dm$i.dmass / prn.n)
         |      AS pr
         |  FROM (SELECT id FROM prdeg) nd CROSS JOIN prn CROSS JOIN dm$i
         |  LEFT JOIN ct$i c USING (id))""".stripMargin
    }
    (base +: rounds).mkString(",\n")
  }

  /** [[pageRankCtes]]'s personalized (TrustRank) twin: expects
    * `prnodes`/`predges`/`prseeds`, emits the seeded-restart rounds
    * ending at `pre<iters>` + `isoS<iters>` (the isolated-seed scalar
    * chain). Non-seed non-endpoint nodes are exact 0 — the caller's
    * final select coalesces accordingly.
    */
  private def trustRankCtes(d: Double, iters: Int): String = {
    val base =
      s"""prsn AS (SELECT CAST(count(*) AS DOUBLE) AS ns FROM prseeds),
         |prdeg AS (SELECT src AS id, CAST(count(*) AS DOUBLE) AS deg
         |          FROM predges GROUP BY src),
         |prsv AS MATERIALIZED (SELECT dg.id,
         |    CASE WHEN s.id IS NOT NULL THEN 1.0 / prsn.ns
         |      ELSE 0.0 END AS s
         |  FROM prdeg dg LEFT JOIN prseeds s ON s.id = dg.id
         |  CROSS JOIN prsn),
         |prkiso AS (SELECT CAST((SELECT count(*) FROM prseeds) -
         |    (SELECT count(*) FROM prseeds s JOIN prdeg g
         |       ON g.id = s.id) AS DOUBLE) AS c),
         |isoS0 AS (SELECT 1.0 / prsn.ns AS pr FROM prsn),
         |pre0 AS (SELECT id, s AS pr FROM prsv)""".stripMargin
    val rounds = (1 to iters).map { i =>
      s"""dm$i AS (
         |  SELECT prkiso.c * isoS${i - 1}.pr AS dmass
         |  FROM prkiso CROSS JOIN isoS${i - 1}),
         |isoS$i AS (
         |  SELECT (1 - $d) / prsn.ns + $d * (dm$i.dmass / prsn.ns) AS pr
         |  FROM prsn CROSS JOIN dm$i),
         |ct$i AS (
         |  SELECT e.dst AS id, sum(p.pr / g.deg) AS contrib
         |  FROM predges e JOIN pre${i - 1} p ON p.id = e.src
         |  JOIN prdeg g ON g.id = e.src GROUP BY e.dst),
         |pre$i AS (
         |  SELECT sv.id,
         |    (1 - $d) * sv.s + $d * (coalesce(c.contrib, 0)
         |      + dm$i.dmass * sv.s) AS pr
         |  FROM prsv sv CROSS JOIN dm$i
         |  LEFT JOIN ct$i c USING (id))""".stripMargin
    }
    (base +: rounds).mkString(",\n")
  }

  /** Parameterized MinHash signature CTE chain (k=64, 8 bands of r=8)
    * over `documents` rows matching `where` — emits `{p}toks`/`{p}ph`/
    * `{p}sig`/`{p}bands`. ONE generator behind every minhash oracle
    * (the q44/q61/q83 self-join chain via [[minhashVerifiedCtes]] and
    * q93's batch-vs-index form) so the arithmetic cannot drift.
    */
  private def minhashSigCtes(p: String, where: String): String =
    s"""${p}toks AS (
       |  SELECT doc_id, list_distinct(list_filter(
       |    string_split_regex(text, ' +'), t -> t <> '')) AS tk
       |  FROM documents WHERE $where),
       |${p}ph AS (
       |  SELECT doc_id, tk, list_transform(tk, t ->
       |    CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT) % 2147483647) AS h31
       |  FROM ${p}toks),
       |${p}sig AS (
       |  SELECT doc_id, tk, CASE WHEN len(h31) > 0 THEN
       |    list_transform(generate_series(0, 63), s ->
       |    list_min(list_transform(h31, h ->
       |      (((s*1103515245 + 12345) % 2147483647) * h
       |       + ((s*2654435761 + 1013904223) % 2147483647)) % 2147483647))) END AS sig
       |  FROM ${p}ph),
       |${p}bands AS (
       |  SELECT doc_id, b.band_id,
       |    md5(array_to_string(list_transform(
       |      list_slice(sig, band_id*8 + 1, band_id*8 + 8),
       |      x -> CAST(x AS VARCHAR)), ',')) AS band_hash
       |  FROM ${p}sig, (SELECT unnest(generate_series(0, 7)) AS band_id) b)"""
      .stripMargin

  /** Shared IBP-barycenter oracle chain (q369/q371): 16-bin dense
    * per-source mass `pm`, squared-cost kernel `kk`, and `iters`
    * unrolled u/φ/b/v Bregman rounds ending at `b<iters>`. ONE
    * generator so the two OT oracles cannot drift.
    */
  private def otBaryCtes(iters: Int): String = {
    val rounds = (1 to iters).map { i =>
      s"""u$i AS (SELECT p.g, p.i,
         |    CASE WHEN p.m > 0 THEN p.m / kv.s ELSE 0.0 END AS uu
         |  FROM pm p JOIN (
         |    SELECT v.g, k.i, sum(k.k * v.vv) AS s
         |    FROM v${i - 1} v JOIN kk k ON k.j = v.j
         |    GROUP BY 1, 2) kv
         |    ON kv.g = p.g AND kv.i = p.i),
         |ph$i AS MATERIALIZED (SELECT u.g, k.j,
         |    sum(k.k * u.uu) AS kt
         |  FROM u$i u JOIN kk k ON k.i = u.i
         |  GROUP BY 1, 2),
         |b$i AS MATERIALIZED (SELECT p2.j,
         |    exp(avg(ln(p2.kt * v.vv))) AS bm
         |  FROM ph$i p2 JOIN v${i - 1} v
         |    ON v.g = p2.g AND v.j = p2.j
         |  GROUP BY 1),
         |v$i AS MATERIALIZED (SELECT p2.g, p2.j, b.bm / p2.kt AS vv
         |  FROM ph$i p2 JOIN b$i b ON b.j = p2.j)""".stripMargin
    }.mkString(",\n")
    s"""bb AS (
       |  SELECT source AS g, CAST(least(greatest(
       |    floor((CAST(n_chars AS DOUBLE) - 0.0) / 64.0),
       |    0), 15) AS BIGINT) AS b
       |  FROM documents WHERE n_chars IS NOT NULL),
       |cn AS MATERIALIZED (
       |  SELECT g, b, count(*) AS cnt FROM bb GROUP BY 1, 2),
       |bins AS (SELECT CAST(unnest(generate_series(0, 15))
       |  AS BIGINT) AS b),
       |gs AS (SELECT DISTINCT g FROM cn),
       |gt AS (SELECT g, CAST(sum(cnt) AS DOUBLE) AS tot
       |  FROM cn GROUP BY 1),
       |pm AS MATERIALIZED (SELECT gs.g, bins.b AS i,
       |    CAST(coalesce(c.cnt, 0) AS DOUBLE) / gt.tot AS m
       |  FROM gs CROSS JOIN bins
       |  LEFT JOIN cn c ON c.g = gs.g AND c.b = bins.b
       |  JOIN gt ON gt.g = gs.g),
       |kk AS MATERIALIZED (SELECT i.i, j.j,
       |    exp(-((abs(i.i - j.j) / 15.0) * (abs(i.i - j.j) / 15.0))
       |      / 0.1) AS k
       |  FROM (SELECT unnest(generate_series(0, 15)) AS i) i,
       |       (SELECT unnest(generate_series(0, 15)) AS j) j),
       |v0 AS MATERIALIZED (SELECT gs.g, bins.b AS j, 1.0 AS vv
       |  FROM gs CROSS JOIN bins),
       |$rounds""".stripMargin
  }

  private val minhashVerifiedCtes: String =
    minhashSigCtes("", "doc_id < 1000") + ",\n" +
    """cand AS (
      |  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
      |  FROM bands l JOIN bands r
      |    ON l.band_id = r.band_id AND l.band_hash = r.band_hash
      |   AND l.doc_id < r.doc_id),
      |verified AS (
      |  SELECT c.id_a, c.id_b,
      |    round(CAST(len(list_intersect(a.tk, b.tk)) AS DOUBLE) /
      |          len(list_distinct(list_concat(a.tk, b.tk))), 4) AS jaccard
      |  FROM cand c
      |  JOIN toks a ON a.doc_id = c.id_a
      |  JOIN toks b ON b.doc_id = c.id_b)""".stripMargin

  /** Near-dup cluster chain on top of [[minhashVerifiedCtes]]:
    * 0.8-Jaccard pairs → recursive label reach → `comp` (id,
    * component) + `sizes`. ONE definition behind q61 and q128 (the
    * r3/r5 oracle-drift lesson). Callers prepend `WITH RECURSIVE`.
    */
  /** 0.8-Jaccard pairs + both-orientation edges on top of
    * [[minhashVerifiedCtes]] — shared prefix of the component chain
    * (q61/q128) and the label-propagation chain (q233).
    */
  private val pairsEdgesCtes: String =
    """pairs AS (SELECT id_a, id_b FROM verified WHERE jaccard >= 0.8),
      |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
      |          UNION ALL SELECT id_b, id_a FROM pairs)""".stripMargin

  private val clusterChainCtes: String =
    pairsEdgesCtes + ",\n" +
    """reach(id, lbl) AS (
      |  SELECT doc_id, doc_id FROM toks
      |  UNION
      |  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id),
      |comp AS (SELECT id, min(lbl) AS component FROM reach GROUP BY id),
      |sizes AS (SELECT component, count(*) AS cluster_size
      |          FROM comp GROUP BY component)""".stripMargin

  /** [[clusterChainCtes]] parameterized by Jaccard threshold and CTE
    * prefix, so several thresholds' component chains coexist in one
    * query (q356's sweep). `clusterChainCtes` stays the fixed-0.8
    * instantiation q61/q128/q325 share.
    */
  private def clusterChainCtesAt(thr: String, f: String): String =
    s"""${f}pairs AS (SELECT id_a, id_b FROM verified
       |  WHERE jaccard >= $thr),
       |${f}edges AS (SELECT id_a AS src, id_b AS dst FROM ${f}pairs
       |          UNION ALL SELECT id_b, id_a FROM ${f}pairs),
       |${f}reach(id, lbl) AS (
       |  SELECT doc_id, doc_id FROM toks
       |  UNION
       |  SELECT e.dst, r.lbl FROM ${f}reach r JOIN ${f}edges e
       |    ON e.src = r.id),
       |${f}comp AS (SELECT id, min(lbl) AS component FROM ${f}reach
       |  GROUP BY id),
       |${f}sizes AS (SELECT component, count(*) AS cluster_size
       |          FROM ${f}comp GROUP BY component)""".stripMargin

  /** Deterministic synchronous label-propagation rounds over
    * [[pairsEdgesCtes]]'s `edges`: each round every node adopts its
    * neighbors' modal label, ties to the smallest, isolated nodes
    * keep theirs — the exact twin of `Components.labelPropagation`.
    * Emits `lp0..lp<rounds>`.
    */
  private def lpaCtes(rounds: Int): String = {
    val rs = (1 to rounds).map { i =>
      s"""n$i AS (SELECT e.src AS id, l.lbl, count(*) AS c
         |  FROM edges e JOIN lp${i - 1} l ON l.id = e.dst
         |  GROUP BY 1, 2),
         |b$i AS (SELECT id, lbl, row_number() OVER (
         |    PARTITION BY id ORDER BY c DESC, lbl) AS rk FROM n$i),
         |lp$i AS (SELECT p.id, coalesce(b.lbl, p.lbl) AS lbl
         |  FROM lp${i - 1} p
         |  LEFT JOIN (SELECT id, lbl FROM b$i WHERE rk = 1) b
         |  USING (id))""".stripMargin
    }
    ("lp0 AS (SELECT doc_id AS id, doc_id AS lbl FROM toks)" +: rs)
      .mkString(",\n")
  }

  /** k-NN majority-vote oracle chain over `embeddings` (queries =
    * `vec_id < qMax`, self excluded, vote ties to the smallest
    * label): emits `knp` (query_id, t_label, pred). ONE generator
    * behind the q261 accuracy and q262 confusion oracles so the vote
    * arithmetic cannot drift.
    */
  private def knnCtes(qMax: Int, k: Int): String =
    s"""knnq AS (SELECT vec_id AS query_id, embedding AS qvec,
       |    label AS t_label
       |  FROM embeddings WHERE vec_id < $qMax),
       |knnc AS (SELECT vec_id AS neighbor_id, embedding AS cvec,
       |    label AS n_label
       |  FROM embeddings),
       |knsc AS (SELECT query_id, t_label, neighbor_id, n_label,
       |    ${duckCos("qvec", "cvec")} AS cos
       |  FROM knnc CROSS JOIN knnq WHERE neighbor_id <> query_id),
       |knrk AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM knsc),
       |knv AS (SELECT query_id, t_label, n_label, count(*) AS c
       |  FROM knrk WHERE rank <= $k GROUP BY 1, 2, 3),
       |knp AS (SELECT query_id, t_label, n_label AS pred,
       |    c AS n_votes
       |  FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY c DESC, n_label) AS vr
       |    FROM knv)
       |  WHERE vr = 1)""".stripMargin

  /** Curation-funnel oracle CTE chain (exact dedup → quality/lang gate
    * → recursive near-dup components) ending in `fate`
    * (doc_id, source, ntok, fate) — ONE definition behind q50's funnel
    * aggregate and q100's end-to-end pipeline, per the r3/r5
    * oracle-drift lesson. Mirrors `CorpusPipeline.fates` at defaults.
    * Callers prepend `WITH RECURSIVE`.
    */
  private val curationFateCtes: String =
    """base AS (
      |  SELECT doc_id, text, source FROM documents WHERE doc_id < 1000),
      |exact_w AS (
      |  SELECT min(doc_id) AS doc_id FROM base GROUP BY md5(text)),
      |tk AS (SELECT doc_id, text, source,
      |    list_filter(string_split_regex(text, ' +'), t -> t <> '') AS tk
      |  FROM base),
      |scored AS (
      |  SELECT *,
      |    round((CASE WHEN len(tk) BETWEEN 5 AND 10000 THEN 1.0 ELSE 0.0 END
      |      + CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk)
      |      + CASE WHEN swr > 0 THEN 1.0 ELSE 0.0 END) / 3.0, 4) AS q,
      |    CASE WHEN swr >= 0.05 THEN 'en' ELSE 'other' END AS lang
      |  FROM (SELECT *, CAST(len(list_filter(tk, t -> t IN
      |          ('the','a','an','of','and','to','in','is'))) AS DOUBLE)
      |          / len(tk) AS swr FROM tk)),
      |flagged AS (
      |  SELECT *,
      |    (doc_id IN (SELECT doc_id FROM exact_w)) AS exact_ok,
      |    (doc_id IN (SELECT doc_id FROM exact_w)
      |     AND q >= 0.5 AND lang = 'en') AS gate_ok
      |  FROM scored),
      |gate AS (SELECT doc_id, text, source, tk,
      |    list_distinct(tk) AS dtk
      |  FROM flagged WHERE gate_ok),
      |ph AS (SELECT doc_id, dtk, list_transform(dtk, t ->
      |    CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT) % 2147483647) AS h31
      |  FROM gate),
      |sig AS (
      |  SELECT doc_id, dtk, CASE WHEN len(h31) > 0 THEN
      |    list_transform(generate_series(0, 63), s ->
      |    list_min(list_transform(h31, h ->
      |      (((s*1103515245 + 12345) % 2147483647) * h
      |       + ((s*2654435761 + 1013904223) % 2147483647)) % 2147483647))) END AS sig
      |  FROM ph),
      |bandsx AS (
      |  SELECT doc_id, b.band_id,
      |    md5(array_to_string(list_transform(
      |      list_slice(sig, band_id*8 + 1, band_id*8 + 8),
      |      x -> CAST(x AS VARCHAR)), ',')) AS band_hash
      |  FROM sig, (SELECT unnest(generate_series(0, 7)) AS band_id) b),
      |cand AS (
      |  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
      |  FROM bandsx l JOIN bandsx r
      |    ON l.band_id = r.band_id AND l.band_hash = r.band_hash
      |   AND l.doc_id < r.doc_id),
      |pairs AS (
      |  SELECT c.id_a, c.id_b FROM cand c
      |  JOIN sig a ON a.doc_id = c.id_a
      |  JOIN sig b ON b.doc_id = c.id_b
      |  WHERE round(CAST(len(list_intersect(a.dtk, b.dtk)) AS DOUBLE) /
      |        len(list_distinct(list_concat(a.dtk, b.dtk))), 4) >= 0.8),
      |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
      |          UNION ALL SELECT id_b, id_a FROM pairs),
      |reach(id, lbl) AS (
      |  SELECT doc_id, doc_id FROM gate
      |  UNION
      |  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id),
      |comp AS (SELECT id, min(lbl) AS component FROM reach GROUP BY id),
      |fate AS (
      |  SELECT f.doc_id, f.source, len(f.tk) AS ntok,
      |    CASE WHEN NOT f.exact_ok THEN 'exact_dup'
      |         WHEN NOT f.gate_ok THEN 'quality'
      |         WHEN c.component <> f.doc_id THEN 'near_dup'
      |         ELSE 'kept' END AS fate
      |  FROM flagged f LEFT JOIN comp c ON c.id = f.doc_id)""".stripMargin

  /** SimHash banded-candidate oracle CTE chain over `documents` rows
    * matching `where`, ending in `{p}cand` (id_a, id_b, sa, sb) — ONE
    * generator behind q39's near-dup pairs and q103's dedup-tier
    * evaluation so the signature arithmetic cannot drift.
    */
  private def simhashCandCtes(p: String, where: String): String =
    s"""${p}toks AS (
       |  SELECT doc_id, list_distinct(list_filter(
       |    string_split_regex(text, ' +'), t -> t <> '')) AS tk
       |  FROM documents WHERE $where),
       |${p}h AS (SELECT doc_id, list_transform(tk, t ->
       |        CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT)) AS hs
       |      FROM ${p}toks),
       |${p}sigs AS (
       |  SELECT doc_id, CASE WHEN len(hs) > 0 THEN
       |    CAST(list_sum(list_transform(generate_series(0, 59), b ->
       |    CASE WHEN list_sum(list_transform(hs, x ->
       |           CASE WHEN (x >> b) & 1 = 1 THEN 1 ELSE -1 END)) >= 0
       |         THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT)
       |    END)) AS BIGINT) END AS sig
       |  FROM ${p}h),
       |${p}banded AS (
       |  SELECT doc_id, b.band, (sig >> (b.band * 15)) & 32767 AS chunk, sig
       |  FROM ${p}sigs, (SELECT unnest(generate_series(0, 3)) AS band) b),
       |${p}cand AS (
       |  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b,
       |         l.sig AS sa, r.sig AS sb
       |  FROM ${p}banded l JOIN ${p}banded r
       |    ON l.band = r.band AND l.chunk = r.chunk AND l.doc_id < r.doc_id)"""
      .stripMargin

  /** BM25 ranked-top-k oracle CTE chain ending in `lexr`
    * (doc_id, "rank", score) — ONE generator behind q69's lexical
    * search and q97's hybrid fusion so the scoring math cannot drift.
    * Terms and k1/b mirror `Retrieval.bm25TopK`'s q69 call site.
    */
  private def bm25RankedCtes(k: Int): String =
    s"""tk AS (
       |  SELECT doc_id, list_filter(
       |    string_split_regex(text, ' +'), t -> t <> '') AS tk
       |  FROM documents),
       |dl AS (SELECT doc_id, len(tk) AS dl FROM tk),
       |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
       |post AS (
       |  SELECT doc_id, dl, term, count(*) AS tf FROM (
       |    SELECT t.doc_id, d.dl, unnest(t.tk) AS term
       |    FROM tk t JOIN dl d USING (doc_id))
       |  WHERE term IN ('spark', 'join', 'stream')
       |  GROUP BY doc_id, dl, term),
       |dfreq AS (SELECT term, count(*) AS dfn FROM post GROUP BY term),
       |scored AS (
       |  SELECT p.doc_id,
       |    sum(ln(1 + (s.n_docs - d.dfn + 0.5) / (d.dfn + 0.5)) *
       |        p.tf * 2.2 / (p.tf + 1.2 * (0.25 + 0.75 * p.dl / s.avgdl)))
       |      AS score
       |  FROM post p JOIN dfreq d USING (term) CROSS JOIN stats s
       |  GROUP BY p.doc_id),
       |lexr AS (
       |  SELECT doc_id,
       |    CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT)
       |      AS "rank", score
       |  FROM (SELECT doc_id, score FROM scored
       |        ORDER BY score DESC, doc_id LIMIT $k))""".stripMargin

  /** q89's (column, numeric?) list — ONE definition feeding both the
    * Spark profile and its generated DuckDB oracle. Declared before
    * `defs` (strict val) so object init never sees it null.
    */
  private val profileCols: Seq[(String, Boolean)] = Seq(
    "l_orderkey" -> true, "l_linenumber" -> true, "l_quantity" -> true,
    "l_extendedprice" -> true, "l_discount" -> true,
    "l_returnflag" -> false, "l_linestatus" -> false)

  private val coreDefs: Seq[QueryDef] = Seq(

    // P1/P3 projection + fixed order (`Coalplants_GEM.R:17-38,214-223`)
    QueryDef("q01_project",
      (s, dir) => t(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
        // (l_orderkey, l_linenumber) is NOT unique in the synthetic data;
        // sort on every output column so the oracle compare is
        // order-deterministic.
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
             |FROM lineitem ORDER BY l_orderkey, l_linenumber, l_quantity, l_returnflag""".stripMargin)),

    // P4 rename + M4 constant/typed-null columns (`Coalplants_GEM.R:186-210`)
    QueryDef("q02_rename_const",
      (s, dir) => t(s, dir, "orders")
        .withColumnsRenamed(Map("o_orderkey" -> "order_id", "o_orderstatus" -> "status"))
        .withColumn("sector", lit("Power"))
        .withColumn("note", lit(null).cast("string"))
        .select("order_id", "status", "sector", "note")
        .orderBy("order_id"),
      Some("""SELECT o_orderkey AS order_id, o_orderstatus AS status,
             |'Power' AS sector, CAST(NULL AS VARCHAR) AS note
             |FROM orders ORDER BY order_id""".stripMargin)),

    // F1 value-set membership filter (`Coalplants_GEM.R:41`)
    QueryDef("q03_filter_isin",
      (s, dir) => t(s, dir, "lineitem")
        .filter(col("l_returnflag").isin("A", "R"))
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"),
      Some("""SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity
             |FROM lineitem WHERE l_returnflag IN ('A', 'R')
             |ORDER BY l_orderkey, l_linenumber, l_quantity, l_returnflag""".stripMargin)),

    // F2 negated compound predicate w/ 3VL parity (`GasOilplants_GEM.R:88-92`)
    QueryDef("q04_filter_negated",
      (s, dir) => t(s, dir, "lineitem")
        .filter(!(col("l_returnflag").isin("N") || col("l_quantity").isNull ||
          col("l_quantity") === 0.0 || col("l_discount") > 0.08))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_discount"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_discount
             |FROM lineitem
             |WHERE NOT (l_returnflag IN ('N') OR l_quantity IS NULL
             |           OR l_quantity = 0.0 OR l_discount > 0.08)
             |ORDER BY l_orderkey, l_linenumber, l_quantity, l_discount""".stripMargin)),

    // F3 null check + F4 range-with-null-pass (`Coalplants_GEM.R:122-128`)
    QueryDef("q05_filter_null_range",
      (s, dir) => t(s, dir, "orders")
        .filter(col("o_custkey").isNotNull)
        .filter(col("o_orderdate").isNull ||
          col("o_orderdate") >= to_timestamp(lit("1995-06-01"), "yyyy-MM-dd"))
        .select("o_orderkey", "o_custkey", "o_orderdate")
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, o_custkey, o_orderdate FROM orders
             |WHERE o_custkey IS NOT NULL
             |  AND (o_orderdate IS NULL OR o_orderdate >= TIMESTAMP '1995-06-01')
             |ORDER BY o_orderkey""".stripMargin)),

    // F5 timestamp comparison filter (`TotalData_GEM.R:75-76`); events.ts
    // is ns in the files → µs in both engines (Graft.table / CAST).
    QueryDef("q06_ts_filter",
      (s, dir) => t(s, dir, "events")
        .filter(col("ts") >= lit("2024-01-03 00:00:00").cast("timestamp_ntz") &&
          col("ts") < lit("2024-01-04 00:00:00").cast("timestamp_ntz"))
        .select("event_id", "ts", "event_type")
        .orderBy("event_id"),
      Some("""SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events
             |WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-03 00:00:00'
             |  AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-04 00:00:00'
             |ORDER BY event_id""".stripMargin)),

    // M2 multi-branch case_when (`Hydroplants_GEM.R:102-107`)
    QueryDef("q07_case_when",
      (s, dir) => t(s, dir, "lineitem")
        .withColumn("qty_band",
          when(col("l_quantity") < 10, "small")
            .when(col("l_quantity") < 25, "medium")
            .when(col("l_quantity") < 40, "large")
            .otherwise("huge"))
        .groupBy("qty_band").agg(count(lit(1)).as("n"))
        .orderBy("qty_band"),
      Some("""SELECT CASE WHEN l_quantity < 10 THEN 'small'
             |            WHEN l_quantity < 25 THEN 'medium'
             |            WHEN l_quantity < 40 THEN 'large'
             |            ELSE 'huge' END AS qty_band, count(*) AS n
             |FROM lineitem GROUP BY 1 ORDER BY qty_band""".stripMargin)),

    // M3 ifelse(is.na(x), y, x) ≡ coalesce (`TotalData_GEM.R:33,56`)
    QueryDef("q08_coalesce",
      (s, dir) => t(s, dir, "lineitem")
        .withColumn("disc_or_flag", coalesce(nullif(col("l_discount"), lit(0.0)), lit(-1.0)))
        .groupBy("l_returnflag")
        .agg(round(sum("disc_or_flag"), 2).as("sum_disc"), count(lit(1)).as("n"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |round(sum(coalesce(nullif(l_discount, 0.0), -1.0)), 2) AS sum_disc,
             |count(*) AS n
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // M5 whole-table value replace (`Coalplants_GEM.R:50`)
    QueryDef("q09_replace_everywhere",
      (s, dir) => t(s, dir, "lineitem")
        .select("l_returnflag", "l_linestatus", "l_quantity")
        .transform(Cleaning.replaceEverywhere("N", "unknown"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sum_qty"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT CASE WHEN l_returnflag = 'N' THEN 'unknown' ELSE l_returnflag END AS l_returnflag,
             |       CASE WHEN l_linestatus = 'N' THEN 'unknown' ELSE l_linestatus END AS l_linestatus,
             |       count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
             |FROM lineitem GROUP BY 1, 2 ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // A1+J1 coordinate canonicalization: group-summary + broadcast
    // re-join (`Coalplants_GEM.R:59-76`), nation as the location key.
    QueryDef("q10_canon_coords",
      (s, dir) => t(s, dir, "customer")
        .withColumn("c_lon", col("c_custkey").cast("double"))
        .transform(Coordinates.canonicalize("c_nationkey", "c_acctbal", "c_lon"))
        .select(col("c_custkey"), col("c_nationkey"),
          round(col("c_acctbal"), 2).as("acct_canon"))
        .orderBy("c_custkey"),
      Some("""WITH summ AS (
             |  SELECT c_nationkey,
             |    CASE WHEN count(DISTINCT (c_acctbal, CAST(c_custkey AS DOUBLE))) > 1
             |         THEN avg(c_acctbal) ELSE min(c_acctbal) END AS acct
             |  FROM customer GROUP BY c_nationkey)
             |SELECT c.c_custkey, c.c_nationkey, round(s.acct, 2) AS acct_canon
             |FROM customer c LEFT JOIN summ s USING (c_nationkey)
             |ORDER BY c_custkey""".stripMargin)),

    // J2 left join + coalesce of the fallback column (`TotalData_GEM.R:31-34`)
    QueryDef("q11_join_coalesce",
      (s, dir) => {
        val dim = t(s, dir, "customer").filter(col("c_acctbal") > 5000)
          .select("c_custkey", "c_name")
        // No broadcast hint: the dim is a filtered slice of `customer`
        // and grows with the data; AQE picks broadcast when it fits.
        t(s, dir, "orders")
          .join(dim, col("o_custkey") === col("c_custkey"), "left")
          .withColumn("customer_name", coalesce(col("c_name"), lit("unknown")))
          .groupBy("customer_name")
          .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("total"))
          .orderBy("customer_name")
      },
      Some("""WITH dim AS (SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 5000)
             |SELECT coalesce(c_name, 'unknown') AS customer_name,
             |       count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
             |FROM orders LEFT JOIN dim ON o_custkey = c_custkey
             |GROUP BY 1 ORDER BY customer_name""".stripMargin)),

    // J3 composite-key left join against an aggregated dim
    // (`TotalData_GEM.R:116-119`)
    QueryDef("q12_composite_join",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val dim = li.groupBy("l_returnflag", "l_linestatus")
          .agg(avg("l_quantity").as("avg_qty"))
        li.join(broadcast(dim), Seq("l_returnflag", "l_linestatus"), "left")
          .withColumn("above_avg", (col("l_quantity") > col("avg_qty")).cast("int"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(sum("above_avg").cast("long").as("n_above"), count(lit(1)).as("n"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some("""WITH dim AS (SELECT l_returnflag, l_linestatus, avg(l_quantity) AS avg_qty
             |            FROM lineitem GROUP BY 1, 2)
             |SELECT l.l_returnflag, l.l_linestatus,
             |       CAST(sum(CASE WHEN l.l_quantity > d.avg_qty THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
             |       count(*) AS n
             |FROM lineitem l LEFT JOIN dim d USING (l_returnflag, l_linestatus)
             |GROUP BY 1, 2 ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // J4 dimension-lookup chain (countrycode analog, `Coalplants_GEM.R:200`):
    // two broadcast joins up a snowflake.
    QueryDef("q13_dim_lookup",
      (s, dir) => t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(count(lit(1)).as("n_customers"), round(sum("c_acctbal"), 2).as("total_acctbal"))
        .orderBy("r_name"),
      Some("""SELECT r_name, count(*) AS n_customers,
             |       round(sum(c_acctbal), 2) AS total_acctbal
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name ORDER BY r_name""".stripMargin)),

    // A2 main rollup, TPC-H-Q1 shape (`Coalplants_GEM.R:165-171`):
    // partial aggregation collapses before the shuffle.
    QueryDef("q14_pricing_summary",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(coalesce(sum("l_quantity"), lit(0.0)), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          round(avg("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
             |  round(coalesce(sum(l_quantity), 0.0), 2) AS sum_qty,
             |  round(sum(l_extendedprice), 2) AS sum_base_price,
             |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
             |  round(avg(l_quantity), 4) AS avg_qty,
             |  round(avg(l_discount), 4) AS avg_disc,
             |  count(*) AS count_order
             |FROM lineitem GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // A3 two-level unweighted mean-of-means (`TotalData_GEM.R:79-93`)
    QueryDef("q15_two_level_mean",
      (s, dir) => t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_regionkey", "c_nationkey")
        .agg(avg("c_acctbal").as("nation_mean"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(round(avg("nation_mean"), 2).as("region_mean"))
        .orderBy("r_name"),
      Some("""WITH nm AS (
             |  SELECT n_regionkey, c_nationkey, avg(c_acctbal) AS nation_mean
             |  FROM customer JOIN nation ON c_nationkey = n_nationkey
             |  GROUP BY 1, 2)
             |SELECT r_name, round(avg(nation_mean), 2) AS region_mean
             |FROM nm JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name ORDER BY r_name""".stripMargin)),

    // A4/A5 distinct projection dedup (`TotalData_GEM.R:144-146,21`)
    QueryDef("q16_distinct",
      (s, dir) => t(s, dir, "customer")
        .select("c_mktsegment", "c_nationkey").distinct()
        .orderBy("c_mktsegment", "c_nationkey"),
      Some("""SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
             |ORDER BY c_mktsegment, c_nationkey""".stripMargin)),

    // A6 first-row-per-group via explicit ordinal (`TotalData_GEM.R:48-51`)
    QueryDef("q17_first_per_group",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        t(s, dir, "orders")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select("o_custkey", "o_orderkey", "o_orderdate")
          .orderBy("o_custkey")
      },
      Some("""SELECT o_custkey, o_orderkey, o_orderdate FROM (
             |  SELECT *, row_number() OVER (
             |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
             |  FROM orders) WHERE rn = 1 ORDER BY o_custkey""".stripMargin)),

    // A7 count/sum-over-partition windows (`Hydroplants_GEM.R:174-189`)
    QueryDef("q18_window_share",
      (s, dir) => {
        val w = Window.partitionBy(col("l_orderkey"))
        t(s, dir, "lineitem")
          .withColumn("n_items", count(lit(1)).over(w))
          .withColumn("qty_share", round(col("l_quantity") / sum("l_quantity").over(w), 4))
          .select("l_orderkey", "l_linenumber", "n_items", "qty_share")
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber,
             |  count(*) OVER (PARTITION BY l_orderkey) AS n_items,
             |  round(l_quantity / sum(l_quantity) OVER (PARTITION BY l_orderkey), 4) AS qty_share
             |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // U1 union-by-name (`TotalData_GEM.R:6-16`)
    QueryDef("q19_union",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val hi = o.filter(col("o_totalprice") >= 200000).withColumn("bucket", lit("high"))
        val lo = o.filter(col("o_totalprice") < 50000).withColumn("bucket", lit("low"))
        hi.unionByName(lo)
          .groupBy("bucket", "o_orderstatus")
          .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
          .orderBy("bucket", "o_orderstatus")
      },
      Some("""WITH u AS (
             |  SELECT *, 'high' AS bucket FROM orders WHERE o_totalprice >= 200000
             |  UNION ALL
             |  SELECT *, 'low' AS bucket FROM orders WHERE o_totalprice < 50000)
             |SELECT bucket, o_orderstatus, count(*) AS n,
             |       round(sum(o_totalprice), 2) AS total
             |FROM u GROUP BY 1, 2 ORDER BY bucket, o_orderstatus""".stripMargin)),

    // G1 separate_rows ≡ explode(split(...)) (`Coalplants_GEM.R:107`)
    QueryDef("q20_explode_tokens",
      (s, dir) => t(s, dir, "documents")
        .withColumn("word", explode(split(col("text"), " ")))
        .filter(col("word") =!= "")
        .groupBy("word").agg(count(lit(1)).as("n"))
        .orderBy("word"),
      Some("""SELECT word, count(*) AS n FROM (
             |  SELECT unnest(string_split(text, ' ')) AS word FROM documents)
             |WHERE word <> '' GROUP BY word ORDER BY word""".stripMargin)),

    // G2+M2 year expansion with the capacity-timeline rule
    // (`Coalplants_GEM.R:134-152`): explode(sequence(...)) — narrow, no join.
    QueryDef("q21_expand_years",
      (s, dir) => t(s, dir, "supplier")
        .withColumn("start_year", (lit(2020) + pmod(col("s_suppkey"), lit(15))).cast("int"))
        .withColumn("retire_year", col("start_year") + 20)
        .withColumn("year", explode(sequence(lit(2023), lit(2050))))
        .withColumn("capacity",
          when(col("year") < col("start_year"), 0.0)
            .when(col("year") > col("retire_year"), 0.0)
            .otherwise(col("s_acctbal")))
        .groupBy("year")
        .agg(round(coalesce(sum("capacity"), lit(0.0)), 2).as("total_capacity"))
        .orderBy("year"),
      Some("""WITH e AS (
             |  SELECT s_suppkey, s_acctbal,
             |         2020 + (s_suppkey % 15) AS start_year,
             |         2040 + (s_suppkey % 15) AS retire_year,
             |         y.year
             |  FROM supplier
             |  CROSS JOIN (SELECT unnest(generate_series(2023, 2050)) AS year) y)
             |SELECT year, round(coalesce(sum(
             |  CASE WHEN year < start_year THEN 0.0
             |       WHEN year > retire_year THEN 0.0
             |       ELSE s_acctbal END), 0.0), 2) AS total_capacity
             |FROM e GROUP BY year ORDER BY year""".stripMargin)),

    // G4 ownership split + capacity allocation, both variants at once
    // (`Coalplants_GEM.R:104-119`, `Hydroplants_GEM.R:159-202`):
    // explode + regex extract + count-over-window equal-share default.
    QueryDef("q22_ownership_split",
      (s, dir) => t(s, dir, "part")
        .withColumn("Owner",
          when(pmod(col("p_size"), lit(3)) === 0,
            concat(col("p_brand"), lit("; "), col("p_type")))
            .otherwise(concat(col("p_brand"), lit(" [60%]; "), col("p_type"), lit(" [40%]"))))
        .transform(Ownership.split("Owner", "p_retailprice", Ownership.EqualShareDefault))
        .groupBy(col("Company").as("company"))
        .agg(round(sum("Capacity_allocated"), 2).as("alloc"), count(lit(1)).as("n"))
        .orderBy("company"),
      Some("""WITH o AS (
             |  SELECT p_partkey, p_retailprice,
             |    CASE WHEN p_size % 3 = 0 THEN p_brand || '; ' || p_type
             |         ELSE p_brand || ' [60%]; ' || p_type || ' [40%]' END AS owners
             |  FROM part),
             |e AS (SELECT p_partkey, p_retailprice,
             |             len(string_split(owners, '; ')) AS n_owners,
             |             unnest(string_split(owners, '; ')) AS ow FROM o),
             |sh AS (SELECT p_partkey, p_retailprice, n_owners,
             |  trim(regexp_extract(ow, '^([^\[]+)', 1)) AS company,
             |  CAST(NULLIF(regexp_extract(ow, '(\d+)%', 1), '') AS DOUBLE) / 100 AS share
             |  FROM e)
             |SELECT company,
             |  round(sum(p_retailprice * coalesce(share, 1.0 / n_owners)), 2) AS alloc,
             |  count(*) AS n
             |FROM sh GROUP BY company ORDER BY company""".stripMargin)),

    // X8/X13 deterministic TFL surrogate ids (`TotalData_GEM.R:21-34`)
    QueryDef("q23_company_ids",
      (s, dir) => t(s, dir, "customer")
        .transform(GemPipeline.assignCompanyIds("c_name"))
        .select("c_custkey", "company_id")
        .orderBy("c_custkey"),
      Some("""WITH dim AS (
             |  SELECT c_name, 'TFL' || lpad(CAST(
             |    dense_rank() OVER (ORDER BY c_name) + 10000000 AS VARCHAR), 8, '0')
             |    AS company_id
             |  FROM (SELECT DISTINCT c_name FROM customer))
             |SELECT c_custkey, company_id
             |FROM customer LEFT JOIN dim USING (c_name)
             |ORDER BY c_custkey""".stripMargin)),

    // X3-X8 scalar string functions (SURVEY.md §2.9)
    QueryDef("q24_string_funcs",
      (s, dir) => t(s, dir, "part")
        .select(
          col("p_partkey"),
          lower(col("p_type")).as("type_lower"),
          trim(col("p_brand")).as("brand_trim"),
          concat_ws(", ", col("p_brand"), col("p_type")).as("brand_type"),
          nullif(instr(col("p_type"), "BRASS").cast("long"), lit(0L)).as("brass_pos"),
          lpad(col("p_partkey").cast("string"), 8, "0").as("padded"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey, lower(p_type) AS type_lower,
             |  trim(p_brand) AS brand_trim,
             |  concat_ws(', ', p_brand, p_type) AS brand_type,
             |  NULLIF(CAST(strpos(p_type, 'BRASS') AS BIGINT), 0) AS brass_pos,
             |  lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded
             |FROM part ORDER BY p_partkey""".stripMargin)),

    // ── LLM-training-data pipeline operators (documents/embeddings) ──
    // Every sketch below uses the PORTABLE hash (functions/Hashing.scala)
    // so the DuckDB oracle recomputes bit-identical signatures.

    // Exact dedup: one hash aggregate, map-side combine (Dedup.exact)
    QueryDef("q25_exact_dedup",
      (s, dir) => Dedup.exact(t(s, dir, "documents"), "text", "doc_id")
        .orderBy("content_hash"),
      Some("""SELECT md5(text) AS content_hash, min(doc_id) AS keep_id,
             |  count(*) AS n_copies
             |FROM documents GROUP BY md5(text)
             |ORDER BY content_hash""".stripMargin)),

    // MinHash signature → LSH bands (Dedup.lshBands, k=16, bands=4)
    QueryDef("q26_minhash_bands",
      (s, dir) => Dedup.lshBands(t(s, dir, "documents"), "doc_id", "text", 16, 4)
        .orderBy("doc_id", "band_id"),
      Some("""WITH toks AS (
             |  SELECT doc_id, list_distinct(list_filter(
             |    string_split_regex(text, ' +'), t -> t <> '')) AS tk
             |  FROM documents),
             |ph AS (
             |  SELECT doc_id, list_transform(tk, t ->
             |    CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT) % 2147483647) AS h31
             |  FROM toks),
             |sig AS (
             |  SELECT doc_id, CASE WHEN len(h31) > 0 THEN
             |    list_transform(generate_series(0, 15), s ->
             |    list_min(list_transform(h31, h ->
             |      (((s*1103515245 + 12345) % 2147483647) * h
             |       + ((s*2654435761 + 1013904223) % 2147483647)) % 2147483647))) END AS sig
             |  FROM ph)
             |SELECT doc_id, band_id,
             |  md5(array_to_string(list_transform(
             |    list_slice(sig, band_id*4 + 1, band_id*4 + 4),
             |    x -> CAST(x AS VARCHAR)), ',')) AS band_hash
             |FROM sig, (SELECT unnest(generate_series(0, 3)) AS band_id) b
             |ORDER BY doc_id, band_id""".stripMargin)),

    // Blocked n-gram Jaccard near-dup pairs (Dedup.ngramJaccardPairs).
    // Threshold 0.7: the corpus is bimodal (true near-dups at J ≥ 0.89,
    // ambient at ≤ 0.06) and a realistic near-dup cutoff keeps the
    // prefix filter sharp (prefix length scales with 1 − t).
    QueryDef("q27_ngram_jaccard",
      (s, dir) => Dedup.ngramJaccardPairs(
        t(s, dir, "documents"), "doc_id", "text", "source", n = 3, threshold = 0.7)
        .orderBy("id_a", "id_b"),
      Some("""WITH sh AS (
             |  SELECT doc_id, source,
             |    list_distinct(list_transform(
             |      generate_series(1, greatest(len(tk) - 2, 0)),
             |      i -> array_to_string(list_slice(tk, i, i + 2), ' '))) AS sh
             |  FROM (SELECT doc_id, source, list_filter(
             |          string_split_regex(text, ' +'), t -> t <> '') AS tk
             |        FROM documents))
             |SELECT l.doc_id AS id_a, r.doc_id AS id_b,
             |  round(CAST(len(list_intersect(l.sh, r.sh)) AS DOUBLE) /
             |        len(list_distinct(list_concat(l.sh, r.sh))), 4) AS jaccard
             |FROM sh l JOIN sh r ON l.source = r.source AND l.doc_id < r.doc_id
             |WHERE CAST(len(list_intersect(l.sh, r.sh)) AS DOUBLE) /
             |        len(list_distinct(list_concat(l.sh, r.sh))) >= 0.7
             |ORDER BY id_a, id_b""".stripMargin)),

    // Text quality/language/fingerprint signals (TextAnalysis.annotate)
    QueryDef("q28_text_signals",
      (s, dir) => t(s, dir, "documents")
        .transform(TextAnalysis.annotate("text"))
        .select("doc_id", "n_tokens", "type_token_ratio", "stopword_ratio",
          "lang_pred", "fingerprint", "quality")
        .orderBy("doc_id"),
      Some("""WITH tk AS (
             |  SELECT doc_id, list_filter(
             |    string_split_regex(text, ' +'), t -> t <> '') AS tk
             |  FROM documents),
             |sig AS (
             |  SELECT doc_id, len(tk) AS n_tokens,
             |    CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk) AS ttr,
             |    CAST(len(list_filter(tk, t -> t IN
             |      ('the','a','an','of','and','to','in','is'))) AS DOUBLE)
             |      / len(tk) AS swr,
             |    md5(array_to_string(list_sort(list_distinct(tk)), ' ')) AS fingerprint
             |  FROM tk)
             |SELECT doc_id, n_tokens,
             |  round(ttr, 4) AS type_token_ratio,
             |  round(swr, 4) AS stopword_ratio,
             |  CASE WHEN swr >= 0.05 THEN 'en' ELSE 'other' END AS lang_pred,
             |  fingerprint,
             |  round((CASE WHEN n_tokens BETWEEN 5 AND 10000 THEN 1.0 ELSE 0.0 END
             |         + ttr
             |         + CASE WHEN swr > 0 THEN 1.0 ELSE 0.0 END) / 3.0, 4) AS quality
             |FROM sig ORDER BY doc_id""".stripMargin)),

    // Exact cosine top-k ANN baseline (Similarity.bruteForceTopK)
    QueryDef("q29_cosine_topk",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.bruteForceTopK(
          emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding", k = 3)
          .orderBy("query_id", "rank")
      },
      Some("""WITH q AS (SELECT vec_id AS query_id, embedding AS qvec
             |           FROM embeddings WHERE vec_id < 5),
             |c AS (SELECT vec_id AS neighbor_id, embedding AS cvec FROM embeddings),
             |scored AS (
             |  SELECT query_id, neighbor_id,
             |    list_sum(list_transform(qvec, (x, i) ->
             |      CAST(x AS DOUBLE) * CAST(cvec[i] AS DOUBLE))) /
             |    (sqrt(list_sum(list_transform(qvec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
             |     sqrt(list_sum(list_transform(cvec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cos
             |  FROM c, q WHERE neighbor_id <> query_id),
             |ranked AS (
             |  SELECT query_id, neighbor_id,
             |    row_number() OVER (PARTITION BY query_id
             |                       ORDER BY cos DESC, neighbor_id) AS "rank", cos
             |  FROM scored)
             |SELECT query_id, neighbor_id, "rank", round(cos, 4) AS cos
             |FROM ranked WHERE "rank" <= 3
             |ORDER BY query_id, "rank"""".stripMargin)),

    // 60-bit SimHash signatures (Dedup.simhash)
    QueryDef("q30_simhash",
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"), Dedup.simhash(col("text"), 60).as("simhash"))
        .orderBy("doc_id"),
      Some("""WITH toks AS (
             |  SELECT doc_id, list_distinct(list_filter(
             |    string_split_regex(text, ' +'), t -> t <> '')) AS tk
             |  FROM documents),
             |h AS (SELECT doc_id, list_transform(tk, t ->
             |        CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT)) AS hs
             |      FROM toks)
             |SELECT doc_id, CASE WHEN len(hs) > 0 THEN
             |  CAST(list_sum(list_transform(generate_series(0, 59), b ->
             |  CASE WHEN list_sum(list_transform(hs, x ->
             |         CASE WHEN (x >> b) & 1 = 1 THEN 1 ELSE -1 END)) >= 0
             |       THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT)
             |  END)) AS BIGINT) END AS simhash
             |FROM h ORDER BY doc_id""".stripMargin)),

    // Embedding near-dup pairs blocked by label (Similarity.cosineNearDupPairs)
    QueryDef("q31_cosine_neardups",
      (s, dir) => Similarity.cosineNearDupPairs(
        t(s, dir, "embeddings"), "vec_id", "embedding", "label", threshold = 0.2)
        .orderBy("id_a", "id_b"),
      Some("""WITH v AS (SELECT vec_id, label, embedding AS v FROM embeddings),
             |p AS (
             |  SELECT l.vec_id AS id_a, r.vec_id AS id_b,
             |    round(
             |      list_sum(list_transform(l.v, (x, i) ->
             |        CAST(x AS DOUBLE) * CAST(r.v[i] AS DOUBLE))) /
             |      (sqrt(list_sum(list_transform(l.v, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
             |       sqrt(list_sum(list_transform(r.v, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4) AS cos
             |  FROM v l JOIN v r ON l.label = r.label AND l.vec_id < r.vec_id)
             |SELECT id_a, id_b, cos FROM p WHERE cos >= 0.2
             |ORDER BY id_a, id_b""".stripMargin)),

    // X gas/oil fuel classification (`GasOilplants_GEM.R:20-42`):
    // substring positions decide; earlier match wins when both appear.
    QueryDef("q33_fuel_classify",
      (s, dir) => t(s, dir, "part")
        .withColumn("Fuel",
          when(pmod(col("p_partkey"), lit(4)) === 0, "Fossil Gas: combined cycle")
            .when(pmod(col("p_partkey"), lit(4)) === 1, "fossil liquids: fuel oil")
            .when(pmod(col("p_partkey"), lit(4)) === 2, "mix: fossil liquids then fossil gas")
            .otherwise("hydrogen"))
        .transform(GemPipeline.classifyFuel("Fuel"))
        .groupBy("classification").agg(count(lit(1)).as("n"))
        .orderBy("classification"),
      Some("""WITH f AS (
             |  SELECT CASE p_partkey % 4
             |    WHEN 0 THEN 'Fossil Gas: combined cycle'
             |    WHEN 1 THEN 'fossil liquids: fuel oil'
             |    WHEN 2 THEN 'mix: fossil liquids then fossil gas'
             |    ELSE 'hydrogen' END AS fuel FROM part),
             |p AS (SELECT NULLIF(strpos(lower(fuel), 'fossil gas'), 0) AS pg,
             |             NULLIF(strpos(lower(fuel), 'fossil liquids'), 0) AS pl FROM f)
             |SELECT CASE
             |    WHEN pg IS NOT NULL AND pl IS NULL THEN 'Gas Power Plant'
             |    WHEN pg IS NULL AND pl IS NOT NULL THEN 'Oil Power Plant'
             |    WHEN pg IS NOT NULL AND pl IS NOT NULL THEN
             |      CASE WHEN pg < pl THEN 'Gas Power Plant' ELSE 'Oil Power Plant' END
             |    ELSE 'Not Sure' END AS classification, count(*) AS n
             |FROM p GROUP BY 1 ORDER BY classification""".stripMargin)),

    // G3 binational row duplication (`Hydroplants_GEM.R:23-74`)
    QueryDef("q34_binational",
      (s, dir) => {
        val k = col("s_suppkey")
        val raw = t(s, dir, "supplier").select(
          concat(lit("U"), k).as("GEM unit ID"),
          concat(lit("L"), k).as("GEM location ID"),
          when(pmod(k, lit(10)) === 0, "Yes").otherwise("No").as("Binational"),
          concat(lit("C"), pmod(k, lit(7))).as("Country 1"),
          when(pmod(k, lit(10)) === 0, concat(lit("C"), pmod(k, lit(5))))
            .otherwise(lit(null).cast("string")).as("Country 2"),
          col("s_acctbal").cast("string").as("Country 1 Capacity (MW)"),
          when(pmod(k, lit(10)) === 0, (col("s_acctbal") / 2).cast("string"))
            .otherwise(lit(null).cast("string")).as("Country 2 Capacity (MW)"))
        GemPipeline.expandBinational("Binational",
          idCols = Seq("GEM location ID", "GEM unit ID"),
          promote = Seq(
            "Country 1" -> "Country 2",
            "Country 1 Capacity (MW)" -> "Country 2 Capacity (MW)"))(raw)
          .select(col("GEM unit ID").as("unit_id"), col("Country 1").as("country"),
            col("Country 1 Capacity (MW)").as("capacity"), col("Country 2").as("country2"))
          .orderBy("unit_id")
      },
      Some("""WITH raw AS (
             |  SELECT 'U' || CAST(s_suppkey AS VARCHAR) AS uid,
             |    CASE WHEN s_suppkey % 10 = 0 THEN 'Yes' ELSE 'No' END AS bin,
             |    'C' || CAST(s_suppkey % 7 AS VARCHAR) AS c1,
             |    CASE WHEN s_suppkey % 10 = 0
             |      THEN 'C' || CAST(s_suppkey % 5 AS VARCHAR) END AS c2,
             |    CAST(s_acctbal AS VARCHAR) AS cap1,
             |    CASE WHEN s_suppkey % 10 = 0
             |      THEN CAST(s_acctbal / 2 AS VARCHAR) END AS cap2
             |  FROM supplier)
             |SELECT uid AS unit_id, c1 AS country, cap1 AS capacity, c2 AS country2
             |FROM raw WHERE bin = 'No'
             |UNION ALL
             |SELECT uid, c1, cap1, NULL FROM raw WHERE bin = 'Yes'
             |UNION ALL
             |SELECT uid || '_2', c2, cap2, NULL FROM raw WHERE bin = 'Yes'
             |ORDER BY unit_id""".stripMargin)),

    // The WHOLE per-tracker pipeline end-to-end (gas/oil config:
    // classify → filters → clean → canonicalize → ownership split →
    // year expansion → rollup → 19-col finalize with bundled ISO dim).
    QueryDef("q35_tracker_e2e",
      (s, dir) => {
        val k = col("s_suppkey")
        val raw = t(s, dir, "supplier")
          .join(t(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
          .select(
            concat(lit("U"), k).as("GEM unit ID"),
            concat(lit("L"), expr("s_suppkey div 4")).as("GEM location ID"),
            concat(lit("Plant "), expr("s_suppkey div 4")).as("Plant name"),
            elt(pmod(col("n_nationkey"), lit(8)) + 1,
              lit("Germany"), lit("France"), lit("China"), lit("India"),
              lit("Kosovo"), lit("United States"), lit("Brazil"), lit("Atlantis"))
              .as("Country/Area"),
            concat(lit("Region "), col("n_regionkey")).as("Region"),
            when(pmod(k, lit(4)) === 0, lit("Alpha Corp [60%]; Beta GmbH [40%]"))
              .when(pmod(k, lit(4)) === 1, concat(col("s_name"), lit(" [50%]; Gamma Inc")))
              .when(pmod(k, lit(4)) === 2, concat(col("s_name"), lit(" [100%]")))
              .otherwise(lit(null).cast("string")).as("Owner(s)"),
            when(pmod(k, lit(13)) === 0, lit("unknown"))
              .when(pmod(k, lit(17)) === 0, lit(">0"))
              .when(pmod(k, lit(19)) === 0, lit("N/A"))
              .otherwise(col("s_acctbal").cast("string")).as("Capacity (MW)"),
            element_at(array(lit("operating"), lit("construction"), lit("announced"),
              lit("pre-construction"), lit("retired")), (pmod(k, lit(5)) + 1).cast("int"))
              .as("Status"),
            when(pmod(k, lit(7)) === 0, lit("not found"))
              .otherwise((lit(1990) + pmod(k, lit(45))).cast("string")).as("Start year"),
            when(pmod(k, lit(6)) === 0, (lit(2015) + pmod(k, lit(30))).cast("string"))
              .otherwise(lit(null).cast("string")).as("Planned retire"),
            (pmod(k, lit(180)) - 90 + pmod(k, lit(3)) * 0.25).cast("double").as("Latitude"),
            (pmod(k, lit(360)) - 180 + pmod(k, lit(3)) * 0.25).cast("double").as("Longitude"),
            element_at(array(lit("Fossil Gas: combined cycle"),
              lit("fossil liquids: fuel oil"),
              lit("mix: fossil liquids then fossil gas"), lit("hydrogen")),
              (pmod(k, lit(4)) + 1).cast("int")).as("Fuel"))
        GemPipeline.wrangle(TrackerConfigs.gasOil)(raw)
          .transform(GemPipeline.finalizeSchema(TrackerConfigs.gasOil, CountryDim.dim(s)))
          .orderBy(col("asset_id"), col("company_name").asc_nulls_first,
            col("production_year"), col("country_name"), col("technology"))
      },
      Some("""WITH raw AS (
             |  SELECT
             |    'U' || CAST(s_suppkey AS VARCHAR) AS unit_id,
             |    'L' || CAST(s_suppkey // 4 AS VARCHAR) AS loc_id,
             |    'Plant ' || CAST(s_suppkey // 4 AS VARCHAR) AS plant,
             |    CASE n_nationkey % 8 WHEN 0 THEN 'Germany' WHEN 1 THEN 'France'
             |      WHEN 2 THEN 'China' WHEN 3 THEN 'India' WHEN 4 THEN 'Kosovo'
             |      WHEN 5 THEN 'United States' WHEN 6 THEN 'Brazil'
             |      ELSE 'Atlantis' END AS country,
             |    'Region ' || CAST(n_regionkey AS VARCHAR) AS region,
             |    CASE s_suppkey % 4
             |      WHEN 0 THEN 'Alpha Corp [60%]; Beta GmbH [40%]'
             |      WHEN 1 THEN s_name || ' [50%]; Gamma Inc'
             |      WHEN 2 THEN s_name || ' [100%]'
             |      ELSE NULL END AS owner,
             |    CASE WHEN s_suppkey % 13 = 0 THEN 'unknown'
             |      WHEN s_suppkey % 17 = 0 THEN '>0'
             |      WHEN s_suppkey % 19 = 0 THEN 'N/A'
             |      ELSE CAST(s_acctbal AS VARCHAR) END AS cap,
             |    (['operating','construction','announced','pre-construction','retired'])[s_suppkey % 5 + 1] AS status,
             |    CASE WHEN s_suppkey % 7 = 0 THEN 'not found'
             |      ELSE CAST(1990 + s_suppkey % 45 AS VARCHAR) END AS start_y,
             |    CASE WHEN s_suppkey % 6 = 0
             |      THEN CAST(2015 + s_suppkey % 30 AS VARCHAR) END AS retire_y,
             |    CAST(s_suppkey % 180 - 90 + (s_suppkey % 3) * CAST(0.25 AS DOUBLE) AS DOUBLE) AS lat,
             |    CAST(s_suppkey % 360 - 180 + (s_suppkey % 3) * CAST(0.25 AS DOUBLE) AS DOUBLE) AS lon,
             |    (['Fossil Gas: combined cycle','fossil liquids: fuel oil','mix: fossil liquids then fossil gas','hydrogen'])[s_suppkey % 4 + 1] AS fuel
             |  FROM supplier JOIN nation ON s_nationkey = n_nationkey),
             |cls AS (
             |  SELECT *, CASE
             |    WHEN pg IS NOT NULL AND pl IS NULL THEN 'Gas Power Plant'
             |    WHEN pg IS NULL AND pl IS NOT NULL THEN 'Oil Power Plant'
             |    WHEN pg IS NOT NULL AND pl IS NOT NULL THEN
             |      CASE WHEN pg < pl THEN 'Gas Power Plant' ELSE 'Oil Power Plant' END
             |    ELSE 'Not Sure' END AS classification
             |  FROM (SELECT *, NULLIF(strpos(lower(fuel), 'fossil gas'), 0) AS pg,
             |               NULLIF(strpos(lower(fuel), 'fossil liquids'), 0) AS pl FROM raw)),
             |f1 AS (SELECT * FROM cls
             |  WHERE classification IN ('Gas Power Plant', 'Oil Power Plant')
             |    AND status IN ('construction', 'operating', 'announced', 'pre-construction')),
             |f2 AS (SELECT * REPLACE (CASE WHEN cap = '>0' THEN 'unknown' ELSE cap END AS cap) FROM f1),
             |f3 AS (SELECT * FROM f2
             |  WHERE NOT (cap IN ('unknown', 'N/A', 'not found') OR cap IS NULL OR cap = '0')),
             |f4 AS (SELECT * FROM f3
             |  WHERE NOT (status IN ('announced', 'construction', 'pre-construction')
             |    AND (start_y IN ('unknown', 'not found') OR start_y IS NULL))),
             |num AS (SELECT *, TRY_CAST(cap AS DOUBLE) AS capn,
             |    TRY_CAST(start_y AS DOUBLE) AS startn,
             |    TRY_CAST(retire_y AS DOUBLE) AS retiren FROM f4),
             |summ AS (SELECT loc_id,
             |    CASE WHEN count(DISTINCT (lat, lon)) > 1 THEN avg(lat) ELSE min(lat) END AS clat,
             |    CASE WHEN count(DISTINCT (lat, lon)) > 1 THEN avg(lon) ELSE min(lon) END AS clon
             |  FROM num GROUP BY loc_id),
             |canon AS (SELECT num.* EXCLUDE (lat, lon), s.clat AS lat, s.clon AS lon
             |  FROM num LEFT JOIN summ s USING (loc_id)),
             |f5 AS (SELECT * FROM canon WHERE retiren IS NULL OR retiren >= 2024),
             |tech AS (SELECT *, CASE WHEN classification = 'Gas Power Plant' THEN 'GasCap'
             |    WHEN classification = 'Oil Power Plant' THEN 'OilCap'
             |    ELSE 'CoalCap' END AS technology FROM f5),
             |own AS (SELECT t.*, u.ow FROM tech t,
             |  unnest(coalesce(string_split_regex(t.owner, ';\s*'),
             |                  [CAST(NULL AS VARCHAR)])) AS u(ow)),
             |owns AS (SELECT *,
             |    NULLIF(trim(regexp_extract(ow, '^([^\[]+)', 1)), '') AS company,
             |    TRY_CAST(NULLIF(regexp_extract(ow, '(\d+)%', 1), '') AS DOUBLE) / 100 AS share
             |  FROM own),
             |alloc AS (SELECT *, capn * share AS cap_alloc FROM owns),
             |ex AS (SELECT a.*, y.year FROM alloc a
             |  CROSS JOIN (SELECT unnest(generate_series(2023, 2050)) AS year) y),
             |val AS (SELECT *, CASE
             |    WHEN startn IS NOT NULL AND year < startn THEN 0.0
             |    WHEN retiren IS NOT NULL AND year >= retiren THEN 0.0
             |    ELSE cap_alloc END AS value FROM ex),
             |roll AS (SELECT loc_id, plant, country, region, lat, lon, technology,
             |    company, year, coalesce(sum(value), 0.0) AS capacity
             |  FROM val GROUP BY loc_id, plant, country, region, lat, lon,
             |    technology, company, year)
             |SELECT roll.loc_id AS asset_id, roll.plant AS asset_name,
             |    CAST(NULL AS VARCHAR) AS company_id, roll.company AS company_name,
             |    CASE WHEN roll.country = 'Kosovo' THEN 'XK' ELSE cd.iso2 END AS country_iso2,
             |    roll.country AS country_name, roll.region,
             |    coalesce(CAST(roll.lat AS VARCHAR), 'NA') || ', ' ||
             |      coalesce(CAST(roll.lon AS VARCHAR), 'NA') AS coordinates,
             |    CAST(NULL AS DOUBLE) AS workforce_size,
             |    CAST(NULL AS VARCHAR) AS workforce_source,
             |    'Power' AS sector, roll.technology, roll.capacity,
             |    'MW' AS capacity_unit, roll.year AS production_year,
             |    CAST(NULL AS DOUBLE) AS plant_age_years,
             |    CAST(NULL AS DOUBLE) AS plant_age_rank,
             |    CAST(NULL AS DOUBLE) AS capacity_factor,
             |    CAST(NULL AS DOUBLE) AS emission_factor
             |FROM roll LEFT JOIN """.stripMargin + CountryDim.duckValuesSql +
           """ ON roll.country = cd.country_name
             |ORDER BY asset_id, company_name NULLS FIRST, production_year,
             |  country_name, technology""".stripMargin)),

    // The cross-tracker totals job (`TotalData_GEM.R:6-148`): union →
    // company ids → steel overlay → emission factors → non-fossil zero.
    QueryDef("q36_totals",
      (s, dir) => {
        val n = col("n_nationkey")
        def finalCols(first: Seq[org.apache.spark.sql.Column]) = first ++ Seq(
          lit(null).cast("double").as("workforce_size"),
          lit(null).cast("string").as("workforce_source"),
          lit("Power").as("sector"))
        val trackerA = t(s, dir, "nation").select(finalCols(Seq(
          concat(lit("A"), n).as("asset_id"),
          concat(lit("Asset "), n).as("asset_name"),
          lit(null).cast("string").as("company_id"),
          concat(lit("Comp"), pmod(n, lit(6))).as("company_name"),
          elt(pmod(n, lit(4)) + 1, lit("DE"), lit("FR"), lit("CN"), lit("JP")).as("country_iso2"),
          elt(pmod(n, lit(4)) + 1, lit("Germany"), lit("France"), lit("China"), lit("Japan")).as("country_name"),
          concat(lit("Region "), col("n_regionkey")).as("region"),
          lit("50.0, 8.0").as("coordinates"))) ++ Seq(
          lit("CoalCap").as("technology"),
          (n * 10.0).as("capacity"),
          lit("MW").as("capacity_unit"),
          lit(2030).as("production_year"),
          lit(null).cast("double").as("plant_age_years"),
          lit(null).cast("double").as("plant_age_rank"),
          lit(null).cast("double").as("capacity_factor"),
          lit(null).cast("double").as("emission_factor")): _*)
        val r = col("r_regionkey")
        val trackerB = t(s, dir, "region").select(finalCols(Seq(
          concat(lit("B"), r).as("asset_id"),
          concat(lit("BAsset "), r).as("asset_name"),
          lit(null).cast("string").as("company_id"),
          concat(lit("Comp"), pmod(r, lit(6))).as("company_name"),
          lit("DE").as("country_iso2"),
          lit("Germany").as("country_name"),
          concat(lit("Region "), r).as("region"),
          lit("51.0, 9.0").as("coordinates"))) ++ Seq(
          lit("RenewablesCap").as("technology"),
          (r * 100.0).as("capacity"),
          lit("MW").as("capacity_unit"),
          lit(2030).as("production_year"),
          lit(null).cast("double").as("plant_age_years"),
          lit(null).cast("double").as("plant_age_rank"),
          lit(null).cast("double").as("capacity_factor"),
          lit(null).cast("double").as("emission_factor")): _*)
        val steel = t(s, dir, "region").select(finalCols(Seq(
          concat(lit("S"), r).as("asset_id"),
          concat(lit("Steel "), r).as("asset_name"),
          concat(lit("STL"), r).as("company_id"),
          concat(lit("Comp"), pmod(r, lit(6))).as("company_name"),
          lit("US").as("country_iso2"),
          lit("United States").as("country_name"),
          concat(lit("Region "), r).as("region"),
          lit("40.0, -75.0").as("coordinates"))) ++ Seq(
          lit("SteelCap").as("technology"),
          (r * 7.0).as("capacity"),
          lit("MW").as("capacity_unit"),
          lit(2030).as("production_year"),
          lit(null).cast("double").as("plant_age_years"),
          lit(null).cast("double").as("plant_age_rank"),
          lit(null).cast("double").as("capacity_factor"),
          lit(null).cast("double").as("emission_factor")): _*)
        val factors = t(s, dir, "nation").select(
          elt(pmod(n, lit(2)) + 1, lit("CoalCap"), lit("GasCap")).as("technology"),
          elt(pmod(n, lit(3)) + 1, lit("DE"), lit("FR"), lit("CN")).as("country_iso2"),
          (n + 1.0).as("emissions_factor"))
        GemPipeline.totals(Seq(trackerA, trackerB), steel, factors)
          .orderBy("asset_id")
      },
      Some("""WITH ta AS (
             |  SELECT 'A' || CAST(n_nationkey AS VARCHAR) AS asset_id,
             |    'Asset ' || CAST(n_nationkey AS VARCHAR) AS asset_name,
             |    CAST(NULL AS VARCHAR) AS company_id,
             |    'Comp' || CAST(n_nationkey % 6 AS VARCHAR) AS company_name,
             |    (['DE','FR','CN','JP'])[n_nationkey % 4 + 1] AS country_iso2,
             |    (['Germany','France','China','Japan'])[n_nationkey % 4 + 1] AS country_name,
             |    'Region ' || CAST(n_regionkey AS VARCHAR) AS region,
             |    '50.0, 8.0' AS coordinates, CAST(NULL AS DOUBLE) AS workforce_size,
             |    CAST(NULL AS VARCHAR) AS workforce_source, 'Power' AS sector,
             |    'CoalCap' AS technology, n_nationkey * 10.0 AS capacity,
             |    'MW' AS capacity_unit, 2030 AS production_year,
             |    CAST(NULL AS DOUBLE) AS plant_age_years,
             |    CAST(NULL AS DOUBLE) AS plant_age_rank,
             |    CAST(NULL AS DOUBLE) AS capacity_factor,
             |    CAST(NULL AS DOUBLE) AS emission_factor
             |  FROM nation),
             |tb AS (
             |  SELECT 'B' || CAST(r_regionkey AS VARCHAR) AS asset_id,
             |    'BAsset ' || CAST(r_regionkey AS VARCHAR) AS asset_name,
             |    CAST(NULL AS VARCHAR) AS company_id,
             |    'Comp' || CAST(r_regionkey % 6 AS VARCHAR) AS company_name,
             |    'DE' AS country_iso2, 'Germany' AS country_name,
             |    'Region ' || CAST(r_regionkey AS VARCHAR) AS region,
             |    '51.0, 9.0' AS coordinates, CAST(NULL AS DOUBLE) AS workforce_size,
             |    CAST(NULL AS VARCHAR) AS workforce_source, 'Power' AS sector,
             |    'RenewablesCap' AS technology, r_regionkey * 100.0 AS capacity,
             |    'MW' AS capacity_unit, 2030 AS production_year,
             |    CAST(NULL AS DOUBLE) AS plant_age_years,
             |    CAST(NULL AS DOUBLE) AS plant_age_rank,
             |    CAST(NULL AS DOUBLE) AS capacity_factor,
             |    CAST(NULL AS DOUBLE) AS emission_factor
             |  FROM region),
             |steel AS (
             |  SELECT 'S' || CAST(r_regionkey AS VARCHAR) AS asset_id,
             |    'Steel ' || CAST(r_regionkey AS VARCHAR) AS asset_name,
             |    'STL' || CAST(r_regionkey AS VARCHAR) AS company_id,
             |    'Comp' || CAST(r_regionkey % 6 AS VARCHAR) AS company_name,
             |    'US' AS country_iso2, 'United States' AS country_name,
             |    'Region ' || CAST(r_regionkey AS VARCHAR) AS region,
             |    '40.0, -75.0' AS coordinates, CAST(NULL AS DOUBLE) AS workforce_size,
             |    CAST(NULL AS VARCHAR) AS workforce_source, 'Power' AS sector,
             |    'SteelCap' AS technology, r_regionkey * 7.0 AS capacity,
             |    'MW' AS capacity_unit, 2030 AS production_year,
             |    CAST(NULL AS DOUBLE) AS plant_age_years,
             |    CAST(NULL AS DOUBLE) AS plant_age_rank,
             |    CAST(NULL AS DOUBLE) AS capacity_factor,
             |    CAST(NULL AS DOUBLE) AS emission_factor
             |  FROM region),
             |unioned AS (SELECT * FROM ta UNION ALL SELECT * FROM tb),
             |iddim AS (
             |  SELECT company_name,
             |    'TFL' || lpad(CAST(dense_rank() OVER (ORDER BY company_name)
             |      + 10000000 AS VARCHAR), 8, '0') AS new_id
             |  FROM (SELECT DISTINCT company_name FROM unioned
             |        WHERE company_name IS NOT NULL)),
             |withids AS (
             |  SELECT u.* REPLACE (coalesce(u.company_id, d.new_id) AS company_id)
             |  FROM unioned u LEFT JOIN iddim d USING (company_name)),
             |steeldim AS (
             |  SELECT company_name, company_id AS steel_id FROM (
             |    SELECT company_name, company_id,
             |      row_number() OVER (PARTITION BY company_name ORDER BY asset_id) AS rn
             |    FROM steel) WHERE rn = 1),
             |overlaid AS (
             |  SELECT w.* REPLACE (coalesce(sd.steel_id, w.company_id) AS company_id)
             |  FROM withids w LEFT JOIN steeldim sd USING (company_name)
             |  UNION ALL SELECT * FROM steel),
             |factors AS (
             |  SELECT (['CoalCap','GasCap'])[n_nationkey % 2 + 1] AS technology,
             |    (['DE','FR','CN'])[n_nationkey % 3 + 1] AS country_iso2,
             |    n_nationkey + 1.0 AS emissions_factor
             |  FROM nation),
             |percountry AS (
             |  SELECT technology, country_iso2, avg(emissions_factor) AS ef_country
             |  FROM factors GROUP BY 1, 2),
             |globalmean AS (
             |  SELECT technology, avg(ef_country) AS ef_global
             |  FROM percountry GROUP BY 1)
             |SELECT o.* REPLACE (
             |    CASE WHEN o.technology IN ('CoalCap', 'OilCap', 'GasCap')
             |      THEN coalesce(pc.ef_country, g.ef_global)
             |      ELSE 0.0 END AS emission_factor)
             |FROM overlaid o
             |LEFT JOIN percountry pc
             |  ON o.technology = pc.technology AND o.country_iso2 = pc.country_iso2
             |LEFT JOIN globalmean g ON o.technology = g.technology
             |ORDER BY asset_id""".stripMargin)),

    // S2/S3 CSV sink + source round-trip, incl. the sep=';' variant
    // (`TotalData_GEM.R:65`, `Coalplants_GEM.R:229`).
    QueryDef("q37_csv_roundtrip",
      (s, dir) => {
        val tmp = sys.props("java.io.tmpdir") + "/graft_csv_roundtrip"
        Csv.write(
          t(s, dir, "orders").select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"),
          tmp, sep = ";")
        Csv.read(s, tmp, sep = ";", schema = Some(StructType.fromDDL(
          "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE")))
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
          .orderBy(col("o_orderstatus").asc_nulls_first)
      },
      Some("""SELECT o_orderstatus, count(*) AS n,
             |  round(sum(o_totalprice), 2) AS total
             |FROM orders GROUP BY o_orderstatus
             |ORDER BY o_orderstatus NULLS FIRST""".stripMargin)),

    // X4 ownership display rebuild + strip (`Hydroplants_GEM.R:159-202`)
    QueryDef("q38_owner_display",
      (s, dir) => t(s, dir, "part")
        .withColumn("Owner",
          when(pmod(col("p_partkey"), lit(3)) === 0,
            concat(col("p_brand"), lit("; "), col("p_type")))
            .when(pmod(col("p_partkey"), lit(3)) === 1,
              concat(col("p_brand"), lit(" [60%]; "), col("p_type"), lit(" [40%]")))
            .otherwise(col("p_brand")))
        .transform(Ownership.splitWithDisplay("Owner", "p_retailprice"))
        .select(col("p_partkey"), col("Owner").as("owner_clean"),
          col("Company").as("company"), round(col("Ownership"), 4).as("share"),
          round(col("Capacity_allocated"), 2).as("alloc"))
        .orderBy("p_partkey", "company"),
      Some("""WITH o AS (
             |  SELECT p_partkey, p_retailprice,
             |    CASE WHEN p_partkey % 3 = 0 THEN p_brand || '; ' || p_type
             |         WHEN p_partkey % 3 = 1 THEN p_brand || ' [60%]; ' || p_type || ' [40%]'
             |         ELSE p_brand END AS owners
             |  FROM part),
             |e AS (SELECT p_partkey, p_retailprice,
             |             len(string_split_regex(owners, ';\s*')) AS n,
             |             unnest(string_split_regex(owners, ';\s*')) AS ow FROM o),
             |sh AS (SELECT *,
             |    NULLIF(trim(regexp_extract(ow, '^([^\[]+)', 1)), '') AS company,
             |    NULLIF(regexp_extract(ow, '\[(\d+)%\]', 1), '') AS provided FROM e),
             |c AS (SELECT *, coalesce(CAST(provided AS DOUBLE) / 100, 1.0 / n) AS share,
             |             round(coalesce(CAST(provided AS DOUBLE) / 100, 1.0 / n) * 100, 2) AS pct
             |  FROM sh),
             |disp AS (SELECT *, CASE WHEN provided IS NULL AND company IS NOT NULL
             |    THEN company || ' [' ||
             |      (CASE WHEN pct = floor(pct) THEN CAST(CAST(pct AS BIGINT) AS VARCHAR)
             |            ELSE CAST(pct AS VARCHAR) END) || '%]'
             |    ELSE ow END AS display FROM c)
             |SELECT p_partkey,
             |  regexp_replace(display, ' ?\[[0-9]+(\.[0-9]+)?%\]', '') AS owner_clean,
             |  company, round(share, 4) AS share,
             |  round(p_retailprice * share, 2) AS alloc
             |FROM disp ORDER BY p_partkey, company""".stripMargin)),

    // SimHash banded Hamming near-dup join (Dedup.simhashNearDups)
    QueryDef("q39_simhash_neardups",
      (s, dir) => Dedup.simhashNearDups(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("id_a", "id_b"),
      Some("WITH " + simhashCandCtes("", "TRUE") + "\n" +
        """SELECT id_a, id_b, bit_count(xor(sa, sb)) AS hamming
          |FROM cand WHERE bit_count(xor(sa, sb)) <= 3
          |ORDER BY id_a, id_b""".stripMargin)),

    // BPE-ish regex tokenizer + rolling (order-sensitive) fingerprint
    QueryDef("q40_text_fingerprints",
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"),
          size(TextAnalysis.regexTokens(col("text"))).as("n_bpe_tokens"),
          TextAnalysis.tokenCount(col("text")).as("n_ws_tokens"),
          TextAnalysis.rollingFingerprint(col("text")).as("rolling_fp"))
        .orderBy("doc_id"),
      Some("""WITH tk AS (
             |  SELECT doc_id, text, list_filter(
             |    string_split_regex(text, ' +'), t -> t <> '') AS ws
             |  FROM documents)
             |SELECT doc_id,
             |  len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\s]')) AS n_bpe_tokens,
             |  len(ws) AS n_ws_tokens,
             |  list_reduce(
             |    list_prepend(CAST(0 AS BIGINT), list_transform(ws, t ->
             |      CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT) % 2147483647)),
             |    (acc, x) -> (acc * 1000003 + x) % 2147483647) AS rolling_fp
             |FROM tk ORDER BY doc_id""".stripMargin)),

    // Multimodal plumbing: binary payload + stub decode + frame sampling
    // (Multimodal.asMediaTable/decodeMeta/sampleFrames — the decode stub
    // is deterministic byte math, so even IT is oracle-checked).
    QueryDef("q41_multimodal_meta",
      (s, dir) => {
        val media = Multimodal.asMediaTable(t(s, dir, "documents"), "doc_id", "text", "video")
        val meta = Multimodal.decodeMeta(s, media)
        val frames = Multimodal.sampleFrames(meta, everyMs = 5000)
          .groupBy("id").agg(count(lit(1)).as("n_frames"))
        meta.toDF()
          .select(col("id"), col("nBytes").as("n_bytes"), col("width"),
            col("height"), col("durationMs").as("duration_ms"))
          .join(frames, Seq("id"))
          .orderBy("id")
      },
      Some("""WITH m AS (
             |  SELECT doc_id AS id,
             |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             |    64 + (ascii(substr(text, 1, 1)) % 64) AS width,
             |    64 + (ascii(substr(text, length(text), 1)) % 64) AS height,
             |    CAST(octet_length(encode(text)) * 10 AS BIGINT) AS duration_ms
             |  FROM documents)
             |SELECT id, n_bytes, width, height, duration_ms,
             |  CAST(duration_ms // 5000 + 1 AS BIGINT) AS n_frames
             |FROM m ORDER BY id""".stripMargin)),

    // X11 banker's rounding (bround ≡ R round) vs HALF_UP, on exact
    // binary ties (quantity/8 steps of .125).
    QueryDef("q42_bankers_round",
      (s, dir) => t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          bround(col("l_quantity") / 8, 2).as("bankers"),
          round(col("l_quantity") / 8, 2).as("half_up"))
        .orderBy("l_orderkey", "l_linenumber", "l_quantity"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity,
             |  round_even(l_quantity / 8, 2) AS bankers,
             |  round(l_quantity / 8, 2) AS half_up
             |FROM lineitem
             |ORDER BY l_orderkey, l_linenumber, l_quantity""".stripMargin)),

    // THE capstone: two real tracker configs (coal strict + hydro with
    // G3 binational expansion and equal-share ownership) wrangled end to
    // end, finalized, and pushed through the cross-tracker totals job
    // (`TotalData_GEM.R:6-148`) — company ids, steel overlay, emission
    // factors, non-fossil zeroing.
    QueryDef("q43_multi_tracker_totals",
      (s, dir) => {
        val k = col("s_suppkey")
        val coalRaw = t(s, dir, "supplier")
          .join(t(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
          .select(
            concat(lit("CU"), k).as("GEM unit/phase ID"),
            concat(lit("CL"), expr("s_suppkey div 4")).as("GEM location ID"),
            concat(lit("CPlant "), expr("s_suppkey div 4")).as("Plant name"),
            elt(pmod(col("n_nationkey"), lit(4)) + 1,
              lit("Germany"), lit("France"), lit("Kosovo"), lit("Atlantis"))
              .as("Country/Area"),
            concat(lit("Region "), col("n_regionkey")).as("Region"),
            when(pmod(k, lit(3)) === 0, lit("Alpha Corp [60%]; Beta GmbH [40%]"))
              .when(pmod(k, lit(3)) === 1, concat(col("s_name"), lit(" [100%]")))
              .otherwise(col("s_name")).as("Owner"),
            when(pmod(k, lit(13)) === 0, lit("unknown"))
              .otherwise(col("s_acctbal").cast("string")).as("Capacity (MW)"),
            element_at(array(lit("operating"), lit("construction"), lit("announced"),
              lit("pre-construction"), lit("retired")), (pmod(k, lit(5)) + 1).cast("int"))
              .as("Status"),
            when(pmod(k, lit(7)) === 0, lit("not found"))
              .otherwise((lit(1990) + pmod(k, lit(45))).cast("string")).as("Start year"),
            when(pmod(k, lit(6)) === 0, (lit(2015) + pmod(k, lit(30))).cast("string"))
              .otherwise(lit(null).cast("string")).as("Planned retirement"),
            pmod(k, lit(50)).cast("string").as("Plant age (years)"),
            (pmod(k, lit(180)) - 90 + pmod(k, lit(3)) * 0.25).cast("double").as("Latitude"),
            (pmod(k, lit(360)) - 180 + pmod(k, lit(3)) * 0.25).cast("double").as("Longitude"))
        val coalFin = GemPipeline.wrangle(TrackerConfigs.coal)(coalRaw)
          .transform(GemPipeline.finalizeSchema(TrackerConfigs.coal, CountryDim.dim(s)))

        val c = col("c_custkey")
        val hydroRaw = t(s, dir, "customer")
          .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
          .select(
            concat(lit("HU"), c).as("GEM unit ID"),
            concat(lit("HL"), expr("c_custkey div 2")).as("GEM location ID"),
            concat(lit("HPlant "), expr("c_custkey div 2")).as("Project Name"),
            elt(pmod(col("n_nationkey"), lit(4)) + 1,
              lit("Germany"), lit("France"), lit("Kosovo"), lit("Atlantis"))
              .as("Country 1"),
            when(pmod(c, lit(9)) === 0,
              elt(pmod(col("n_nationkey"), lit(3)) + 1,
                lit("India"), lit("China"), lit("Brazil")))
              .otherwise(lit(null).cast("string")).as("Country 2"),
            when(pmod(c, lit(9)) === 0, "Yes").otherwise("No").as("Binational"),
            concat(lit("Region "), col("n_regionkey")).as("Region 1"),
            when(pmod(c, lit(9)) === 0, concat(lit("Region2 "), col("n_regionkey")))
              .otherwise(lit(null).cast("string")).as("Region 2"),
            when(pmod(c, lit(4)) === 0, lit("Gamma Inc; Delta LLC"))
              .when(pmod(c, lit(4)) === 1, concat(col("c_name"), lit(" [50%]; Epsilon AG")))
              .otherwise(col("c_name")).as("Owner"),
            when(pmod(c, lit(11)) === 0, lit(">0"))
              .otherwise(col("c_acctbal").cast("string")).as("Country 1 Capacity (MW)"),
            when(pmod(c, lit(9)) === 0, (col("c_acctbal") / 2).cast("string"))
              .otherwise(lit(null).cast("string")).as("Country 2 Capacity (MW)"),
            element_at(array(lit("operating"), lit("construction"), lit("announced"),
              lit("pre-construction"), lit("retired")), (pmod(c, lit(5)) + 1).cast("int"))
              .as("Status"),
            when(pmod(c, lit(7)) === 0, lit("not found"))
              .otherwise((lit(1995) + pmod(c, lit(30))).cast("string")).as("Start Year"),
            when(pmod(c, lit(8)) === 0, (lit(2010) + pmod(c, lit(25))).cast("string"))
              .otherwise(lit(null).cast("string")).as("Retired Year"),
            (pmod(c, lit(170)) - 85 + pmod(c, lit(3)) * 0.25).cast("double").as("Latitude"),
            (pmod(c, lit(350)) - 175 + pmod(c, lit(3)) * 0.25).cast("double").as("Longitude"))
        val hydroFin = GemPipeline.wrangle(TrackerConfigs.hydro)(hydroRaw)
          .transform(GemPipeline.finalizeSchema(TrackerConfigs.hydro, CountryDim.dim(s)))

        val r = col("r_regionkey")
        val steel = t(s, dir, "region").select(
          concat(lit("S"), r).as("asset_id"),
          concat(lit("Steel "), r).as("asset_name"),
          concat(lit("STL"), r).as("company_id"),
          elt(pmod(r, lit(3)) + 1, lit("Alpha Corp"), lit("Gamma Inc"), lit("ZNoMatch"))
            .as("company_name"),
          lit("US").as("country_iso2"), lit("United States").as("country_name"),
          concat(lit("Region "), r).as("region"), lit("40.0, -75.0").as("coordinates"),
          lit(null).cast("double").as("workforce_size"),
          lit(null).cast("string").as("workforce_source"),
          lit("Power").as("sector"), lit("SteelCap").as("technology"),
          (r * 7.0).as("capacity"), lit("MW").as("capacity_unit"),
          lit(2030).as("production_year"),
          lit(null).cast("double").as("plant_age_years"),
          lit(null).cast("double").as("plant_age_rank"),
          lit(null).cast("double").as("capacity_factor"),
          lit(null).cast("double").as("emission_factor"))
        val n = col("n_nationkey")
        val factors = t(s, dir, "nation").select(
          elt(pmod(n, lit(2)) + 1, lit("CoalCap"), lit("GasCap")).as("technology"),
          elt(pmod(n, lit(3)) + 1, lit("DE"), lit("FR"), lit("XK")).as("country_iso2"),
          (n + 1.0).as("emissions_factor"))

        GemPipeline.totals(Seq(coalFin, hydroFin), steel, factors)
          .orderBy(col("asset_id"), col("company_name").asc_nulls_first,
            col("production_year"), col("country_name"),
            col("plant_age_years").asc_nulls_first)
      },
      Some(Q43Oracle.sql)),

    // MinHash LSH near-dup FINDER: band-bucket candidate join + exact
    // Jaccard verify (Dedup.minhashNearDups). Sketch selectivity
    // matters: the synthetic corpus has ~0.5 ambient pairwise Jaccard
    // (20-word vocabulary), so r=4 rows/band admits ~25% of ALL pairs
    // as candidates (quadratic — 130 s at sf0.1). r=8 cuts the ambient
    // collision rate to J^8 ≈ 0.4% while 8 bands keep recall at the
    // 0.8 near-dup threshold.
    QueryDef("q44_minhash_neardups",
      // Bounded slice: ~20% of ALL doc pairs in this corpus are true
      // J≥0.8 near-dups, so the OUTPUT (and any exact verify) is
      // inherently quadratic in input size — the bound keeps the bench
      // measuring the operator, not the degenerate output volume.
      (s, dir) => Dedup.minhashNearDups(
        t(s, dir, "documents").filter(col("doc_id") < 1000), "doc_id", "text",
        k = 64, bands = 8, threshold = 0.8)
        .orderBy("id_a", "id_b"),
      Some("WITH " + minhashVerifiedCtes + "\n" +
        """SELECT id_a, id_b, jaccard FROM verified WHERE jaccard >= 0.8
          |ORDER BY id_a, id_b""".stripMargin)),

    // LSH-bucketed approximate top-k (Similarity.lshTopK): candidate
    // set restricted to the query's random-hyperplane bucket, exact
    // cosine re-rank inside it.
    QueryDef("q45_lsh_topk",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.lshTopK(emb, emb.filter(col("vec_id") < 10),
          "vec_id", "embedding", k = 3, planes = 4)
          .orderBy("query_id", "rank")
      },
      Some(s"""WITH bucketed AS (
             |  SELECT vec_id, embedding, ${lshBucketSql(0, 3)} AS bucket
             |  FROM embeddings),
             |q AS (SELECT vec_id AS query_id, embedding AS qvec, bucket
             |      FROM bucketed WHERE vec_id < 10),
             |c AS (SELECT vec_id AS neighbor_id, embedding AS cvec, bucket FROM bucketed),
             |scored AS (
             |  SELECT query_id, neighbor_id,
             |    list_sum(list_transform(qvec, (x, i) ->
             |      CAST(x AS DOUBLE) * CAST(cvec[i] AS DOUBLE))) /
             |    (sqrt(list_sum(list_transform(qvec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
             |     sqrt(list_sum(list_transform(cvec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cos
             |  FROM c JOIN q USING (bucket) WHERE neighbor_id <> query_id),
             |ranked AS (
             |  SELECT query_id, neighbor_id,
             |    row_number() OVER (PARTITION BY query_id
             |                       ORDER BY cos DESC, neighbor_id) AS "rank", cos
             |  FROM scored)
             |SELECT query_id, neighbor_id, "rank", round(cos, 4) AS cos
             |FROM ranked WHERE "rank" <= 3
             |ORDER BY query_id, "rank"""".stripMargin)),

    // IVF-flat approximate top-k (Similarity.ivfTopK): corpus assigned
    // to nearest-centroid cells (8 deterministic centroids = the first
    // 8 embeddings), queries probe their 2 nearest cells, exact cosine
    // re-rank inside the probed cells.
    QueryDef("q52_ivf_topk",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.ivfTopK(
          emb, emb.filter(col("vec_id").between(100, 104)),
          emb.filter(col("vec_id") < 8),
          "vec_id", "embedding", k = 3, nProbe = 2)
          .orderBy("query_id", "rank")
      },
      Some("""WITH cents AS (
             |  SELECT vec_id AS cell_id, embedding AS centvec
             |  FROM embeddings WHERE vec_id < 8),
             |cscore AS (
             |  SELECT e.vec_id, e.embedding, c.cell_id,
             |    list_sum(list_transform(e.embedding, (x, i) ->
             |      CAST(x AS DOUBLE) * CAST(c.centvec[i] AS DOUBLE))) /
             |    (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
             |     sqrt(list_sum(list_transform(c.centvec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cell_cos
             |  FROM embeddings e CROSS JOIN cents c),
             |ranked_cells AS (
             |  SELECT *, row_number() OVER (PARTITION BY vec_id
             |    ORDER BY cell_cos DESC, cell_id) AS crn FROM cscore),
             |corpus_cells AS (
             |  SELECT vec_id AS neighbor_id, embedding AS cvec, cell_id
             |  FROM ranked_cells WHERE crn = 1),
             |query_cells AS (
             |  SELECT vec_id AS query_id, embedding AS qvec, cell_id
             |  FROM ranked_cells WHERE crn <= 2 AND vec_id BETWEEN 100 AND 104),
             |scored AS (
             |  SELECT query_id, neighbor_id,
             |    list_sum(list_transform(qvec, (x, i) ->
             |      CAST(x AS DOUBLE) * CAST(cvec[i] AS DOUBLE))) /
             |    (sqrt(list_sum(list_transform(qvec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
             |     sqrt(list_sum(list_transform(cvec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cos
             |  FROM corpus_cells JOIN query_cells USING (cell_id)
             |  WHERE neighbor_id <> query_id),
             |ranked AS (
             |  SELECT query_id, neighbor_id,
             |    row_number() OVER (PARTITION BY query_id
             |                       ORDER BY cos DESC, neighbor_id) AS "rank", cos
             |  FROM scored)
             |SELECT query_id, neighbor_id, "rank", round(cos, 4) AS cos
             |FROM ranked WHERE "rank" <= 3
             |ORDER BY query_id, "rank"""".stripMargin)),

    // Skew-safe two-phase salted aggregation (Skew.saltedSum) — result
    // ≡ the plain rollup; the plan sprays hot keys over 16 reducers.
    QueryDef("q46_salted_rollup",
      (s, dir) => t(s, dir, "lineitem")
        .transform(Skew.saltedSum(Seq("l_returnflag"), "l_quantity", "total_qty"))
        .select(col("l_returnflag"), round(col("total_qty"), 2).as("total_qty"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, round(sum(l_quantity), 2) AS total_qty
             |FROM lineitem GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)),

    // Multimodal stub feature extraction (mapPartitions batch shape);
    // byte-moment stub is deterministic double math → fully
    // oracle-checked, flattened to one column per dimension.
    QueryDef("q48_multimodal_features",
      (s, dir) => {
        val media = Multimodal.asMediaTable(t(s, dir, "documents"), "doc_id", "text", "image")
        val feats = Multimodal.extractFeatures(s, media, dim = 4)
        feats.select(col("id") +:
          (0 until 4).map(i => element_at(col("features"), i + 1).as(s"f$i")): _*)
          .orderBy("id")
      },
      Some("""SELECT doc_id AS id,
             |  CAST(list_sum(list_transform(generate_series(1, octet_length(encode(text)), 4),
             |    p -> CAST(ascii(substr(text, p, 1)) AS DOUBLE))) / octet_length(encode(text)) AS FLOAT) AS f0,
             |  CAST(list_sum(list_transform(generate_series(2, octet_length(encode(text)), 4),
             |    p -> CAST(ascii(substr(text, p, 1)) AS DOUBLE))) / octet_length(encode(text)) AS FLOAT) AS f1,
             |  CAST(list_sum(list_transform(generate_series(3, octet_length(encode(text)), 4),
             |    p -> CAST(ascii(substr(text, p, 1)) AS DOUBLE))) / octet_length(encode(text)) AS FLOAT) AS f2,
             |  CAST(list_sum(list_transform(generate_series(4, octet_length(encode(text)), 4),
             |    p -> CAST(ascii(substr(text, p, 1)) AS DOUBLE))) / octet_length(encode(text)) AS FLOAT) AS f3
             |FROM documents ORDER BY id""".stripMargin)),

    // A v2 simple-tracker config end-to-end (solar): phase-keyed units,
    // explicit null-owner drop, equal-share ownership, imputed starts.
    QueryDef("q49_solar_tracker",
      (s, dir) => {
        val c = col("c_custkey")
        val raw = t(s, dir, "customer")
          .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
          .select(
            concat(lit("PU"), c).as("GEM phase ID"),
            concat(lit("PL"), expr("c_custkey div 3")).as("GEM location ID"),
            concat(lit("PPlant "), expr("c_custkey div 3")).as("Project Name"),
            elt(pmod(col("n_nationkey"), lit(3)) + 1,
              lit("Germany"), lit("India"), lit("Brazil")).as("Country"),
            concat(lit("Region "), col("n_regionkey")).as("Region"),
            when(pmod(c, lit(6)) === 0, lit("Gamma Inc; Delta LLC"))
              .when(pmod(c, lit(6)) === 1, concat(col("c_name"), lit(" [50%]; Epsilon AG")))
              .when(pmod(c, lit(6)) === 2, lit(null).cast("string"))
              .otherwise(col("c_name")).as("Owner"),
            when(pmod(c, lit(11)) === 0, lit("unknown"))
              .otherwise(col("c_acctbal").cast("string")).as("Capacity (MW)"),
            element_at(array(lit("operating"), lit("construction"), lit("announced"),
              lit("pre-construction"), lit("retired")), (pmod(c, lit(5)) + 1).cast("int"))
              .as("Status"),
            when(pmod(c, lit(7)) === 0, lit("not found"))
              .otherwise((lit(2000) + pmod(c, lit(28))).cast("string")).as("Start year"),
            when(pmod(c, lit(9)) === 0, (lit(2012) + pmod(c, lit(28))).cast("string"))
              .otherwise(lit(null).cast("string")).as("Retired year"),
            (pmod(c, lit(160)) - 80 + pmod(c, lit(3)) * 0.25).cast("double").as("Latitude"),
            (pmod(c, lit(340)) - 170 + pmod(c, lit(3)) * 0.25).cast("double").as("Longitude"))
        GemPipeline.wrangle(TrackerConfigs.solar)(raw)
          .transform(GemPipeline.finalizeSchema(TrackerConfigs.solar, CountryDim.dim(s)))
          .orderBy(col("asset_id"), col("company_name").asc_nulls_first,
            col("production_year"), col("country_name"))
      },
      Some("""WITH raw AS (
             |  SELECT
             |    'PU' || CAST(c_custkey AS VARCHAR) AS unit_id,
             |    'PL' || CAST(c_custkey // 3 AS VARCHAR) AS loc_id,
             |    'PPlant ' || CAST(c_custkey // 3 AS VARCHAR) AS plant,
             |    (['Germany','India','Brazil'])[n_nationkey % 3 + 1] AS country,
             |    'Region ' || CAST(n_regionkey AS VARCHAR) AS region,
             |    CASE c_custkey % 6
             |      WHEN 0 THEN 'Gamma Inc; Delta LLC'
             |      WHEN 1 THEN c_name || ' [50%]; Epsilon AG'
             |      WHEN 2 THEN NULL
             |      ELSE c_name END AS owner,
             |    CASE WHEN c_custkey % 11 = 0 THEN 'unknown'
             |      ELSE CAST(c_acctbal AS VARCHAR) END AS cap,
             |    (['operating','construction','announced','pre-construction','retired'])[c_custkey % 5 + 1] AS status,
             |    CASE WHEN c_custkey % 7 = 0 THEN 'not found'
             |      ELSE CAST(2000 + c_custkey % 28 AS VARCHAR) END AS start_y,
             |    CASE WHEN c_custkey % 9 = 0
             |      THEN CAST(2012 + c_custkey % 28 AS VARCHAR) END AS retire_y,
             |    CAST(c_custkey % 160 - 80 + (c_custkey % 3) * CAST(0.25 AS DOUBLE) AS DOUBLE) AS lat,
             |    CAST(c_custkey % 340 - 170 + (c_custkey % 3) * CAST(0.25 AS DOUBLE) AS DOUBLE) AS lon
             |  FROM customer JOIN nation ON c_nationkey = n_nationkey),
             |f0 AS (SELECT * FROM raw WHERE owner IS NOT NULL),
             |f1 AS (SELECT * FROM f0
             |  WHERE status IN ('construction','operating','announced','pre-construction')),
             |f2 AS (SELECT * REPLACE (CASE WHEN cap = '>0' THEN 'unknown' ELSE cap END AS cap) FROM f1),
             |f3 AS (SELECT * FROM f2
             |  WHERE NOT (cap IN ('unknown','N/A','not found') OR cap IS NULL OR cap = '0')),
             |imp AS (SELECT * REPLACE (
             |    CASE WHEN start_y IN ('unknown','not found') OR start_y IS NULL THEN
             |      CASE WHEN status IN ('announced','construction','pre-construction')
             |        THEN '2030' ELSE '2024' END
             |    ELSE start_y END AS start_y) FROM f3),
             |num AS (SELECT *, TRY_CAST(cap AS DOUBLE) AS capn,
             |    TRY_CAST(start_y AS DOUBLE) AS startn,
             |    TRY_CAST(retire_y AS DOUBLE) AS retiren FROM imp),
             |f5 AS (SELECT * FROM num),
             |summ AS (SELECT loc_id,
             |    CASE WHEN count(DISTINCT (lat, lon)) > 1 THEN avg(lat) ELSE min(lat) END AS clat,
             |    CASE WHEN count(DISTINCT (lat, lon)) > 1 THEN avg(lon) ELSE min(lon) END AS clon
             |  FROM f5 GROUP BY loc_id),
             |canon AS (SELECT f5.* EXCLUDE (lat, lon), s.clat AS lat, s.clon AS lon
             |  FROM f5 LEFT JOIN summ s USING (loc_id)),
             |own AS (SELECT t.*, u.ow FROM canon t,
             |  unnest(coalesce(string_split_regex(t.owner, ';\s*'),
             |                  [CAST(NULL AS VARCHAR)])) AS u(ow)),
             |owns AS (SELECT *,
             |    NULLIF(trim(regexp_extract(ow, '^([^\[]+)', 1)), '') AS company,
             |    coalesce(
             |      TRY_CAST(NULLIF(regexp_extract(ow, '(\d+)%', 1), '') AS DOUBLE) / 100,
             |      1.0 / coalesce(len(string_split_regex(owner, ';\s*')), 1)) AS share
             |  FROM own),
             |alloc AS (SELECT *, capn * share AS cap_alloc FROM owns),
             |ex AS (SELECT a.*, y.year FROM alloc a
             |  CROSS JOIN (SELECT unnest(generate_series(2023, 2050)) AS year) y),
             |val AS (SELECT *, CASE
             |    WHEN startn IS NOT NULL AND year < startn THEN 0.0
             |    WHEN retiren IS NOT NULL AND year >= retiren THEN 0.0
             |    ELSE cap_alloc END AS value FROM ex),
             |roll AS (SELECT loc_id, plant, country, region, lat, lon,
             |    'RenewablesCap' AS technology, company, year,
             |    coalesce(sum(value), 0.0) AS capacity
             |  FROM val GROUP BY loc_id, plant, country, region, lat, lon, company, year)
             |SELECT roll.loc_id AS asset_id, roll.plant AS asset_name,
             |    CAST(NULL AS VARCHAR) AS company_id, roll.company AS company_name,
             |    CASE WHEN roll.country = 'Kosovo' THEN 'XK' ELSE cd.iso2 END AS country_iso2,
             |    roll.country AS country_name, roll.region,
             |    coalesce(CAST(roll.lat AS VARCHAR), 'NA') || ', ' ||
             |      coalesce(CAST(roll.lon AS VARCHAR), 'NA') AS coordinates,
             |    CAST(NULL AS DOUBLE) AS workforce_size,
             |    CAST(NULL AS VARCHAR) AS workforce_source,
             |    'Power' AS sector, roll.technology, roll.capacity,
             |    'MW' AS capacity_unit, roll.year AS production_year,
             |    CAST(NULL AS DOUBLE) AS plant_age_years,
             |    CAST(NULL AS DOUBLE) AS plant_age_rank,
             |    CAST(NULL AS DOUBLE) AS capacity_factor,
             |    CAST(NULL AS DOUBLE) AS emission_factor
             |FROM roll LEFT JOIN """.stripMargin + CountryDim.duckValuesSql +
           """ ON roll.country = cd.country_name
             |ORDER BY asset_id, company_name NULLS FIRST, production_year,
             |  country_name""".stripMargin)),

    // LLM-tier capstone: the composed curation pipeline — exact dedup →
    // quality/language gate → CLUSTER-based near-dup removal (keep the
    // min id of each connected component of the verified-pair graph) →
    // per-source funnel accounting (CorpusPipeline.curate). The oracle
    // mirrors the clusters with a recursive min-reachable-id CTE, same
    // pattern as q61.
    // Perf (r9): the r8 12.85 s regression was `fates` recomputing its
    // gating stages ~3x once near-dup went cluster-based; the scored
    // frame is now localCheckpointed once for its 3 consumers —
    // 5.8 s warm / ~10 s cold at sf0.1, and q50 now costs ~1.4x its
    // own cluster pass (q61) vs 3x before. The remaining floor is the
    // cluster iteration + per-query codegen, shared with q61/q100.
    QueryDef("q50_corpus_curation",
      (s, dir) => CorpusPipeline.curate(
        t(s, dir, "documents").filter(col("doc_id") < 1000)),
      Some("WITH RECURSIVE " + curationFateCtes + "\n" +
        """SELECT source,
          |  count(CASE WHEN fate = 'kept' THEN 1 END) AS docs_kept,
          |  CAST(coalesce(sum(CASE WHEN fate = 'kept' THEN ntok END), 0)
          |    AS BIGINT) AS tokens_kept,
          |  count(CASE WHEN fate = 'exact_dup' THEN 1 END) AS dropped_exact_dup,
          |  count(CASE WHEN fate = 'quality' THEN 1 END) AS dropped_quality,
          |  count(CASE WHEN fate = 'near_dup' THEN 1 END) AS dropped_near_dup
          |FROM fate GROUP BY source ORDER BY source""".stripMargin)),

    // Stateful sessionization, batch-parity mode: mapGroupsWithState's
    // merge over a static frame ≡ a plain per-user aggregate, which is
    // exactly what the oracle checks.
    QueryDef("q51_sessionize_batch",
      (s, dir) => graft.streaming.EventStream.sessionize(s,
        t(s, dir, "events").withColumn("ts", col("ts").cast("timestamp")))
        .select(col("user_id"), col("n_events"),
          round(col("total_value"), 2).as("total_value"),
          col("first_ts").cast("timestamp_ntz").as("first_ts"),
          col("last_ts").cast("timestamp_ntz").as("last_ts"))
        .orderBy("user_id"),
      Some("""SELECT user_id, count(*) AS n_events,
             |  round(sum(value), 2) AS total_value,
             |  min(CAST(ts AS TIMESTAMP)) AS first_ts,
             |  max(CAST(ts AS TIMESTAMP)) AS last_ts
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // The spark.sql surface: ANSI SQL over Graft.registerViews — the
    // same Catalyst plan the DataFrame API produces, and literally the
    // same text the DuckDB oracle runs.
    QueryDef("q47_sql_surface",
      (s, dir) => {
        Graft.registerViews(s, dir)
        s.sql("""SELECT l_returnflag, count(*) AS n,
                |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
                |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                |WHERE o_orderstatus <> 'F'
                |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
      },
      Some("""SELECT l_returnflag, count(*) AS n,
             |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |WHERE o_orderstatus <> 'F'
             |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Streaming windowed agg, batch-parity mode (EventStream.windowedCounts)
    QueryDef("q32_windowed_counts",
      (s, dir) => graft.streaming.EventStream.windowedCounts(t(s, dir, "events"))
        .orderBy("window_start", "event_type"),
      Some("""SELECT time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS window_start,
             |  event_type, count(*) AS n, round(sum(value), 2) AS total_value
             |FROM events GROUP BY 1, 2
             |ORDER BY window_start, event_type""".stripMargin)),

    // Streaming exact dedup, batch-parity leg (the MemoryStream run is
    // in StreamingModeSpec): one row per (user_id, event_type) — the
    // deterministic earliest-(ts, event_id) winner.
    QueryDef("q53_stream_dedup",
      (s, dir) => graft.streaming.EventStream.dedupEvents(
        t(s, dir, "events"), Seq("user_id", "event_type"))
        .select(col("user_id"), col("event_type"), col("event_id"),
          col("ts"), col("value"))
        .orderBy("user_id", "event_type"),
      Some("""SELECT user_id, event_type, event_id, CAST(ts AS TIMESTAMP) AS ts, value
             |FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
             |        ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn FROM events)
             |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin)),

    // PII redaction (TextAnalysis.redactPii): PII is injected into the
    // text IDENTICALLY on both sides (the synthetic docs carry none),
    // so every row exercises all three patterns end to end.
    QueryDef("q54_pii_redact",
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"),
          graft.ops.TextAnalysis.redactPii(concat(
            substring(col("text"), 1, 40),
            lit(" contact user"), col("doc_id").cast("string"),
            lit("@mail.example.org from 10.0."),
            pmod(col("doc_id"), lit(256)).cast("string"),
            lit(".7 acct 4111111111111111 done"))).as("clean"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  regexp_replace(regexp_replace(regexp_replace(
             |    substr(text, 1, 40) || ' contact user' || CAST(doc_id AS VARCHAR)
             |      || '@mail.example.org from 10.0.'
             |      || CAST(doc_id % 256 AS VARCHAR) || '.7 acct 4111111111111111 done',
             |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             |    '\b(\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g'),
             |    '\b\d{9,}\b', '<NUM>', 'g') AS clean
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Benchmark decontamination (Dedup.decontaminate): every 97th doc
    // plays the held-out benchmark; corpus docs sharing ANY 5-gram with
    // it are dropped, the survivors are the training set.
    QueryDef("q55_decontaminate",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val bench = docs.filter(pmod(col("doc_id"), lit(97)) === 0)
        val corpus = docs.filter(pmod(col("doc_id"), lit(97)) =!= 0)
        Dedup.decontaminate(corpus, bench, "doc_id", "text", n = 5)
          .select(col("doc_id"), col("source"))
          .orderBy("doc_id")
      },
      Some("""WITH tk AS (
             |  SELECT doc_id, source, list_filter(
             |    string_split_regex(text, ' +'), t -> t <> '') AS tk
             |  FROM documents),
             |sh AS (
             |  SELECT doc_id, source,
             |    list_distinct(list_transform(
             |      generate_series(1, greatest(len(tk) - 4, 0)),
             |      i -> array_to_string(list_slice(tk, i, i + 4), ' '))) AS sh
             |  FROM tk),
             |bsh AS (
             |  SELECT DISTINCT unnest(sh) AS shingle FROM sh WHERE doc_id % 97 = 0),
             |contaminated AS (
             |  SELECT DISTINCT d.doc_id
             |  FROM (SELECT doc_id, unnest(sh) AS shingle FROM sh
             |        WHERE doc_id % 97 <> 0) d
             |  JOIN bsh USING (shingle))
             |SELECT doc_id, source FROM sh
             |WHERE doc_id % 97 <> 0
             |  AND doc_id NOT IN (SELECT doc_id FROM contaminated)
             |ORDER BY doc_id""".stripMargin)),

    // Language-ID evaluation against the gold `lang` column: the
    // confusion-matrix counts of TextAnalysis.langIdHeuristic — the
    // measurement loop every corpus-quality heuristic needs.
    QueryDef("q56_lang_eval",
      (s, dir) => t(s, dir, "documents")
        .groupBy(col("lang"),
          graft.ops.TextAnalysis.langIdHeuristic(col("text")).as("lang_pred"))
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "lang_pred"),
      Some("""SELECT lang,
             |  CASE WHEN swr >= 0.05 THEN 'en' ELSE 'other' END AS lang_pred,
             |  count(*) AS n
             |FROM (SELECT lang, CAST(len(list_filter(tk, t -> t IN
             |        ('the','a','an','of','and','to','in','is'))) AS DOUBLE)
             |        / len(tk) AS swr
             |      FROM (SELECT lang, list_filter(
             |              string_split_regex(text, ' +'), t -> t <> '') AS tk
             |            FROM documents))
             |GROUP BY lang, lang_pred ORDER BY lang, lang_pred""".stripMargin)),

    // Deterministic hash split (Sampling.splitLabel): stable 80/10/10
    // train/val/test assignment from the doc_id hash, audited per
    // (source, split) with doc and char counts.
    QueryDef("q57_hash_split",
      (s, dir) => t(s, dir, "documents")
        .groupBy(col("source"),
          graft.ops.Sampling.splitLabel(col("doc_id"),
            Seq("train" -> 80, "val" -> 90, "test" -> 100)).as("split"))
        .agg(count(lit(1)).as("docs"), sum(col("n_chars")).as("chars"))
        .orderBy("source", "split"),
      Some(("""SELECT source,
             |  CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
             |    ELSE 'test' END AS split,
             |  count(*) AS docs, CAST(sum(n_chars) AS BIGINT) AS chars
             |FROM (SELECT source, n_chars,
             |        """ + graft.ops.Sampling.duckBucket("doc_id") + """ AS b
             |      FROM documents)
             |GROUP BY source, split ORDER BY source, split""").stripMargin)),

    // Stream-stream interval join, batch-parity leg (the two-stream
    // MemoryStream run is in StreamingModeSpec): clicks attributed to
    // the views they followed within 10 minutes, per user.
    QueryDef("q58_stream_join",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val views = ev.filter(col("event_type") === "view")
          .select(col("user_id"), col("ts").as("view_ts"),
            col("event_id").as("view_id"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts").as("click_ts"),
            col("event_id").as("click_id"))
        graft.streaming.EventStream.correlate(
          views, clicks, "user_id", "view_ts", "click_ts", "10 minutes")
          .select("user_id", "view_id", "click_id", "view_ts", "click_ts")
          .orderBy("user_id", "view_id", "click_id")
      },
      Some("""SELECT v.user_id, v.view_id, c.click_id, v.view_ts, c.click_ts
             |FROM (SELECT user_id, CAST(ts AS TIMESTAMP) AS view_ts,
             |        event_id AS view_id FROM events WHERE event_type = 'view') v
             |JOIN (SELECT user_id, CAST(ts AS TIMESTAMP) AS click_ts,
             |        event_id AS click_id FROM events WHERE event_type = 'click') c
             |  ON v.user_id = c.user_id AND c.click_ts >= v.view_ts
             |    AND c.click_ts <= v.view_ts + INTERVAL 10 MINUTE
             |ORDER BY v.user_id, view_id, click_id""".stripMargin)),

    // Corpus length-distribution analytics: per-source exact
    // percentiles + mean of n_chars. Spark's `percentile` and DuckDB's
    // `quantile_cont` both linear-interpolate over the sorted values,
    // so the EXACT aggregate is oracle-portable (approx_percentile's
    // sketch would not be).
    QueryDef("q59_corpus_stats",
      (s, dir) => t(s, dir, "documents")
        .groupBy("source")
        .agg(count(lit(1)).as("docs"),
          round(expr("percentile(n_chars, 0.5)"), 4).as("p50_chars"),
          round(expr("percentile(n_chars, 0.9)"), 4).as("p90_chars"),
          round(avg("n_chars"), 4).as("mean_chars"))
        .orderBy("source"),
      Some("""SELECT source, count(*) AS docs,
             |  round(quantile_cont(n_chars, 0.5), 4) AS p50_chars,
             |  round(quantile_cont(n_chars, 0.9), 4) AS p90_chars,
             |  round(avg(n_chars), 4) AS mean_chars
             |FROM documents GROUP BY source ORDER BY source""".stripMargin)),

    // As-of join (AsofJoin.join): each click attributed to the LATEST
    // view at-or-before it per user — one union + one window, no range
    // join blow-up. Oracle = DuckDB's native ASOF LEFT JOIN, which pins
    // the exact semantics (left-outer, <= inclusive). The right side is
    // deduped to one row per (user, ts) first so tie resolution —
    // unspecified in ASOF — cannot differ between engines; unmatched
    // clicks coalesce to -1 to keep the column int64 on both sides.
    QueryDef("q60_asof_join",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val views = ev.filter(col("event_type") === "view")
          .groupBy("user_id", "ts").agg(max("event_id").as("view_id"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts").as("click_ts"),
            col("event_id").as("click_id"))
        AsofJoin.join(clicks, views, Seq("user_id"),
          "click_ts", "ts", Seq("view_id"))
          .select(col("user_id"), col("click_id"), col("click_ts"),
            coalesce(col("view_id"), lit(-1L)).as("view_id"))
          .orderBy("user_id", "click_id")
      },
      Some("""WITH v AS (
             |  SELECT user_id, ts, max(event_id) AS view_id
             |  FROM events WHERE event_type = 'view' GROUP BY user_id, ts),
             |c AS (
             |  SELECT user_id, ts AS click_ts, event_id AS click_id
             |  FROM events WHERE event_type = 'click')
             |SELECT c.user_id, c.click_id, c.click_ts,
             |  coalesce(v.view_id, -1) AS view_id
             |FROM c ASOF LEFT JOIN v
             |  ON c.user_id = v.user_id AND v.ts <= c.click_ts
             |ORDER BY c.user_id, click_id""".stripMargin)),

    // Near-dup CLUSTERS (Components.dedupClusters): hash-min connected
    // components over the q44 minhash pair graph — the transitive
    // closure a pair list alone cannot give. Oracle = recursive CTE
    // propagating min-reachable-id over the SAME pair CTEs as q44.
    QueryDef("q61_dedup_clusters",
      (s, dir) => {
        val docs = t(s, dir, "documents").filter(col("doc_id") < 1000)
        val pairs = Dedup.minhashNearDups(docs, "doc_id", "text",
          k = 64, bands = 8, threshold = 0.8)
        Components.dedupClusters(docs, "doc_id", pairs, "id_a", "id_b")
          .orderBy("doc_id")
      },
      Some("WITH RECURSIVE " + minhashVerifiedCtes + ",\n" +
        clusterChainCtes + "\n" +
        """SELECT comp.id AS doc_id, comp.component, sizes.cluster_size
          |FROM comp JOIN sizes USING (component)
          |ORDER BY doc_id""".stripMargin)),

    // Gopher-style n-gram repetition signals (TextAnalysis
    // .repetitionSignals): top-bigram fraction + distinct-bigram ratio
    // per document via explode → two map-side-combinable aggregates.
    QueryDef("q62_repetition",
      (s, dir) => TextAnalysis.repetitionSignals(
        t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id"),
      Some("""WITH tk AS (
             |  SELECT doc_id, list_filter(
             |    string_split_regex(text, ' +'), t -> t <> '') AS tk
             |  FROM documents),
             |bg AS (
             |  SELECT doc_id, list_transform(generate_series(1, len(tk) - 1),
             |    i -> tk[i] || ' ' || tk[i + 1]) AS bgs
             |  FROM tk),
             |cnt AS (
             |  SELECT doc_id, bigram, count(*) AS c
             |  FROM (SELECT doc_id, unnest(bgs) AS bigram FROM bg)
             |  GROUP BY doc_id, bigram),
             |agg AS (
             |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
             |    max(c) AS top_c, count(*) AS n_distinct
             |  FROM cnt GROUP BY doc_id)
             |SELECT t.doc_id, coalesce(a.n_bigrams, 0) AS n_bigrams,
             |  round(CAST(a.top_c AS DOUBLE) / a.n_bigrams, 4) AS top_bigram_frac,
             |  round(CAST(a.n_distinct AS DOUBLE) / a.n_bigrams, 4)
             |    AS distinct_bigram_frac
             |FROM tk t LEFT JOIN agg a USING (doc_id)
             |ORDER BY doc_id""".stripMargin)),

    // Sequence packing (Packing.packBudgeted): deterministic
    // concat-and-chunk bin assignment per source — one window, integral
    // div (exact past 2^53). Audited per (source, bin).
    QueryDef("q63_pack_sequences",
      (s, dir) => Packing.packBudgeted(
        t(s, dir, "documents"), "doc_id", "n_chars",
        budget = 4000L, strataCols = Seq("source"))
        .groupBy("source", "bin")
        .agg(count(lit(1)).as("docs"), sum("n_chars").as("chars"))
        .orderBy("source", "bin"),
      Some("""WITH packed AS (
             |  SELECT source, n_chars,
             |    CAST(COALESCE(sum(n_chars) OVER (
             |      PARTITION BY source ORDER BY doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      // 4000 AS BIGINT) AS bin
             |  FROM documents)
             |SELECT source, bin, count(*) AS docs,
             |  CAST(sum(n_chars) AS BIGINT) AS chars
             |FROM packed GROUP BY source, bin
             |ORDER BY source, bin""".stripMargin)),

    // Stratified deterministic sampling (Sampling.stratifiedSample):
    // per-source keep rates toward a target mixture, audited per
    // source. Same md5 bucket as q57, rate chosen by stratum.
    QueryDef("q64_stratified_sample",
      (s, dir) => Sampling.stratifiedSample(
        t(s, dir, "documents"), "doc_id", "source",
        rates = Seq("src0" -> 100, "src1" -> 50, "src2" -> 10),
        defaultPct = 25)
        .groupBy("source")
        .agg(count(lit(1)).as("docs"), sum("n_chars").as("chars"))
        .orderBy("source"),
      Some(("""SELECT source, count(*) AS docs,
             |  CAST(sum(n_chars) AS BIGINT) AS chars
             |FROM (SELECT source, n_chars,
             |        """ + Sampling.duckBucket("doc_id") + """ AS b
             |      FROM documents)
             |WHERE b < CASE source WHEN 'src0' THEN 100 WHEN 'src1' THEN 50
             |  WHEN 'src2' THEN 10 ELSE 25 END
             |GROUP BY source ORDER BY source""").stripMargin)),

    // IVF codebook training (Similarity.trainCentroids): deterministic
    // sampled-init Lloyd k-means, k=8 cells, 2 unrolled rounds. Output
    // = the flattened trained codebook, so the oracle pins every
    // centroid component, not just the cells a search happens to probe.
    QueryDef("q65_ivf_train",
      (s, dir) => Similarity.trainCentroids(
        t(s, dir, "embeddings"), "vec_id", "embedding", k = 8, iters = 2)
        .select(col("vec_id").cast("long").as("cell_id"),
          posexplode(col("embedding")).as(Seq("pos0", "c0")))
        .select(col("cell_id"), (col("pos0") + 1).cast("long").as("pos"),
          col("c0").cast("double").as("c"))
        .orderBy("cell_id", "pos"),
      Some("WITH " + kmeansCtes(k = 8, iters = 2) + "\n" +
        """SELECT c.cell_id, p.pos, CAST(c.centvec[p.pos] AS DOUBLE) AS c
          |FROM cent2 c CROSS JOIN poss p
          |ORDER BY cell_id, pos""".stripMargin)),

    // Trained-codebook IVF search: the q52 search path fed by
    // trainCentroids instead of a caller-provided codebook — the
    // complete index-build → search story, oracle recomputing both.
    QueryDef("q66_ivf_search_trained",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val cents = Similarity.trainCentroids(
          emb, "vec_id", "embedding", k = 8, iters = 2)
        Similarity.ivfTopK(
          emb, emb.filter(col("vec_id").between(100, 104)), cents,
          "vec_id", "embedding", k = 3, nProbe = 2)
          .orderBy("query_id", "rank")
      },
      Some("WITH " + kmeansCtes(k = 8, iters = 2) + ",\n" +
        ivfSearchCtes("cent2", nProbe = 2, qLo = 100, qHi = 104) + "\n" +
        """SELECT query_id, neighbor_id, "rank", round(cos, 4) AS cos
          |FROM ranked WHERE "rank" <= 3
          |ORDER BY query_id, "rank"""".stripMargin)),

    // ANN recall evaluation: recall@10 of the two approximate tiers
    // (hyperplane LSH, trained-codebook IVF) against the exact
    // bruteForceTopK ground truth on the same 5 queries — the first
    // question any ANN user asks, answered as an oracle-checked query.
    QueryDef("q67_ann_recall",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val qs = emb.filter(col("vec_id").between(100, 104))
        val cents = Similarity.trainCentroids(
          emb, "vec_id", "embedding", k = 8, iters = 2)
        val brute = Similarity.bruteForceTopK(
          emb, qs, "vec_id", "embedding", k = 10)
          .select("query_id", "neighbor_id")
        def hits(m: String, approx: DataFrame) =
          approx.select("query_id", "neighbor_id")
            .join(brute, Seq("query_id", "neighbor_id"))
            .agg(count(lit(1)).as("hits"))
            .select(lit(m).as("method"), col("hits"))
        hits("ivf", Similarity.ivfTopK(
            emb, qs, cents, "vec_id", "embedding", k = 10, nProbe = 2))
          .unionByName(hits("ivf_sq8", Similarity.ivfSq8TopK(
            emb, qs, cents, "vec_id", "embedding", k = 10, nProbe = 2,
            shortlist = 20)))
          .unionByName(hits("jl", Similarity.jlTopK(
            emb, qs, "vec_id", "embedding", k = 10)))
          .unionByName(hits("lsh", Similarity.lshTopK(
            emb, qs, "vec_id", "embedding", k = 10, planes = 4)))
          .unionByName(hits("lsh_multi", Similarity.lshTopKMulti(
            emb, qs, "vec_id", "embedding", k = 10)))
          .crossJoin(broadcast(brute.agg(count(lit(1)).as("total"))))
          .withColumn("recall", round(col("hits") / col("total"), 4))
          .orderBy("method")
      },
      Some("WITH " + kmeansCtes(k = 8, iters = 2) + ",\n" +
        ivfSearchCtes("cent2", nProbe = 2, qLo = 100, qHi = 104, p = "i") + ",\n" +
        ivfSq8Ctes("i", shortlist = 20) + ",\n" +
        """bq AS (SELECT vec_id AS query_id, embedding AS qvec
          |       FROM embeddings WHERE vec_id BETWEEN 100 AND 104),
          |bscored AS (
          |  SELECT query_id, neighbor_id,
          |""".stripMargin +
        "    " + duckCos("qvec", "cvec") + " AS cos\n" +
        """  FROM (SELECT vec_id AS neighbor_id, embedding AS cvec
          |        FROM embeddings) c, bq
          |  WHERE neighbor_id <> query_id),
          |brute AS (
          |  SELECT query_id, neighbor_id FROM (
          |    SELECT query_id, neighbor_id,
          |      row_number() OVER (PARTITION BY query_id
          |                         ORDER BY cos DESC, neighbor_id) AS rn
          |    FROM bscored) WHERE rn <= 10),
          |""".stripMargin +
        s"""bucketed AS (
          |  SELECT vec_id, embedding, ${lshBucketSql(0, 3)} AS bucket
          |  FROM embeddings),
          |${lshMultiBucketCte("mbucketed", planes = 4, tables = 8)},
          |lscored AS (
          |  SELECT query_id, neighbor_id,
          |""".stripMargin +
        "    " + duckCos("qvec", "cvec") + " AS cos\n" +
        """  FROM (SELECT vec_id AS neighbor_id, embedding AS cvec, bucket
          |        FROM bucketed) c
          |  JOIN (SELECT vec_id AS query_id, embedding AS qvec, bucket
          |        FROM bucketed WHERE vec_id BETWEEN 100 AND 104) q
          |    USING (bucket)
          |  WHERE neighbor_id <> query_id),
          |lsh AS (
          |  SELECT query_id, neighbor_id FROM (
          |    SELECT query_id, neighbor_id,
          |      row_number() OVER (PARTITION BY query_id
          |                         ORDER BY cos DESC, neighbor_id) AS rn
          |    FROM lscored) WHERE rn <= 10),
          |mcand AS (
          |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
          |  FROM mbucketed q JOIN mbucketed c
          |    ON q.tbl = c.tbl AND q.bucket = c.bucket
          |  WHERE q.vec_id BETWEEN 100 AND 104 AND c.vec_id <> q.vec_id),
          |mscored AS (
          |  SELECT query_id, neighbor_id,
          |""".stripMargin +
        "    " + duckCos("qvec", "cvec") + " AS cos\n" +
        """  FROM mcand
          |  JOIN (SELECT vec_id AS neighbor_id, embedding AS cvec
          |        FROM embeddings) USING (neighbor_id)
          |  JOIN (SELECT vec_id AS query_id, embedding AS qvec
          |        FROM embeddings) USING (query_id)),
          |mlsh AS (
          |  SELECT query_id, neighbor_id FROM (
          |    SELECT query_id, neighbor_id,
          |      row_number() OVER (PARTITION BY query_id
          |                         ORDER BY cos DESC, neighbor_id) AS rn
          |    FROM mscored) WHERE rn <= 10),
          |ivf AS (SELECT query_id, neighbor_id FROM iranked WHERE "rank" <= 10),
          |jlp AS (
          |  SELECT vec_id, embedding,
          |    list_transform(generate_series(0, 31), p ->
          |      list_sum(list_transform(embedding, (v, i) ->
          |        CAST(v AS DOUBLE) * (CASE WHEN
          |          CAST(('0x' || substr(md5(CAST(p AS VARCHAR) || ':' ||
          |            CAST(i - 1 AS VARCHAR)), 1, 15)) AS BIGINT) & 1 = 1
          |          THEN 1.0 ELSE -1.0 END))) / sqrt(32.0)) AS y
          |  FROM embeddings),
          |jpc AS (
          |  SELECT c.vec_id AS neighbor_id, q.vec_id AS query_id,
          |    c.embedding AS cvec, q.embedding AS qvec,
          |    list_sum(list_transform(q.y, (x, i) -> x * c.y[i])) /
          |    (sqrt(list_sum(list_transform(q.y, x -> x * x))) *
          |     sqrt(list_sum(list_transform(c.y, x -> x * x)))) AS pcos
          |  FROM jlp c CROSS JOIN jlp q
          |  WHERE q.vec_id BETWEEN 100 AND 104
          |    AND c.vec_id <> q.vec_id),
          |jsl AS (SELECT * FROM (
          |    SELECT *, row_number() OVER (PARTITION BY query_id
          |      ORDER BY pcos DESC, neighbor_id) AS prank FROM jpc)
          |  WHERE prank <= 200),
          |jex AS (SELECT query_id, neighbor_id,
          |""".stripMargin +
        "    " + duckCos("qvec", "cvec") + " AS cos\n" +
        """  FROM jsl),
          |jl AS (
          |  SELECT query_id, neighbor_id FROM (
          |    SELECT query_id, neighbor_id,
          |      row_number() OVER (PARTITION BY query_id
          |                         ORDER BY cos DESC, neighbor_id) AS rn
          |    FROM jex) WHERE rn <= 10),
          |isq AS (SELECT query_id, neighbor_id FROM isqranked
          |        WHERE "rank" <= 10),
          |hits AS (
          |  SELECT 'ivf' AS method, count(*) AS hits
          |  FROM ivf JOIN brute USING (query_id, neighbor_id)
          |  UNION ALL
          |  SELECT 'ivf_sq8', count(*)
          |  FROM isq JOIN brute USING (query_id, neighbor_id)
          |  UNION ALL
          |  SELECT 'jl', count(*)
          |  FROM jl JOIN brute USING (query_id, neighbor_id)
          |  UNION ALL
          |  SELECT 'lsh', count(*)
          |  FROM lsh JOIN brute USING (query_id, neighbor_id)
          |  UNION ALL
          |  SELECT 'lsh_multi', count(*)
          |  FROM mlsh JOIN brute USING (query_id, neighbor_id)),
          |tot AS (SELECT count(*) AS total FROM brute)
          |SELECT method, hits, total,
          |  round(CAST(hits AS DOUBLE) / total, 4) AS recall
          |FROM hits CROSS JOIN tot ORDER BY method""".stripMargin)),

    // REAL multimodal header decode (Multimodal.decodeMeta BMP/WAV
    // paths): headers are SYNTHESIZED in-plan from deterministic
    // per-id formulas (hex-string → unhex), the parser reads the
    // fixed-offset fields back, and the oracle recomputes the formulas
    // directly — so a parse bug cannot cancel out. Even ids get a
    // 54-byte BMP (width/height in the BITMAPINFOHEADER), odd ids a
    // 44-byte canonical WAV (duration = dataSize·1000 / byteRate).
    QueryDef("q68_media_decode",
      (s, dir) => {
        // little-endian 4-byte hex of a non-negative long < 2^32
        def le4hex(n: Column): Column = concat((0 to 3).map(i =>
          lpad(hex(pmod(shiftright(n, 8 * i), lit(256))), 2, "0")): _*)
        val ids = t(s, dir, "documents").select(col("doc_id").cast("long").as("id"))
        val wCol = lit(16) + pmod(col("id"), lit(1000))
        val hCol = lit(16) + pmod(col("id") * 7, lit(1000))
        val bmp = ids.filter(pmod(col("id"), lit(2)) === 0).select(
          col("id"),
          unhex(concat(
            lit("424D" + "00" * 12 + "28000000"), // "BM", 40-byte DIB
            le4hex(wCol), le4hex(hCol), lit("00" * 28))).as("bytes"),
          lit("image").as("media_type"))
        val byteRate = (lit(8000) + pmod(col("id"), lit(8)) * 1000) * 2
        val dataSize = lit(16000) + pmod(col("id") * 13, lit(100000))
        val wav = ids.filter(pmod(col("id"), lit(2)) === 1).select(
          col("id"),
          unhex(concat(
            lit("52494646"), le4hex(dataSize + 36), // "RIFF", riff size
            lit("57415645" + "666D7420" + "10000000" + "0100" + "0100"),
            le4hex(lit(8000) + pmod(col("id"), lit(8)) * 1000), // sample rate
            le4hex(byteRate),
            lit("0200" + "1000" + "64617461"), // align, bits, "data"
            le4hex(dataSize))).as("bytes"),
          lit("audio").as("media_type"))
        Multimodal.decodeMeta(s, bmp.unionByName(wav)).toDF()
          .select(col("id"), col("mediaType").as("media_type"),
            col("nBytes").as("n_bytes"), col("width"), col("height"),
            col("durationMs").as("duration_ms"))
          .orderBy("id")
      },
      Some("""SELECT doc_id AS id,
             |  CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END
             |    AS media_type,
             |  CAST(CASE WHEN doc_id % 2 = 0 THEN 54 ELSE 44 END AS BIGINT)
             |    AS n_bytes,
             |  CAST(CASE WHEN doc_id % 2 = 0 THEN 16 + doc_id % 1000
             |       ELSE 0 END AS INT) AS width,
             |  CAST(CASE WHEN doc_id % 2 = 0 THEN 16 + (doc_id * 7) % 1000
             |       ELSE 0 END AS INT) AS height,
             |  CAST(CASE WHEN doc_id % 2 = 0 THEN 0
             |       ELSE ((16000 + (doc_id * 13) % 100000) * 1000)
             |            // ((8000 + (doc_id % 8) * 1000) * 2) END AS BIGINT)
             |    AS duration_ms
             |FROM documents ORDER BY id""".stripMargin)),

    // BM25 keyword retrieval (Retrieval.bm25TopK): postings restricted
    // to the query terms before the shuffle, broadcast df/corpus stats,
    // top-k via TakeOrderedAndProject — the lexical half of hybrid
    // search next to the ANN tier.
    QueryDef("q69_bm25_search",
      (s, dir) => Retrieval.bm25TopK(
        t(s, dir, "documents"), "doc_id", "text",
        queryTerms = Seq("spark", "join", "stream"), k = 10),
      Some("WITH " + bm25RankedCtes(10) + "\n" +
        """SELECT doc_id, "rank", round(score, 4) AS score
          |FROM lexr ORDER BY "rank"""".stripMargin)),

    // Semantic near-dup clustering: embedding-cosine pairs (the q31
    // blocked join) fed through the same transitive-closure machinery
    // as the MinHash tier (Components.dedupClusters) — dedup by
    // MEANING composed from two already-proven operators.
    QueryDef("q70_semantic_dedup",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val pairs = Similarity.cosineNearDupPairs(
          emb, "vec_id", "embedding", "label", threshold = 0.2)
        Components.dedupClusters(emb, "vec_id", pairs, "id_a", "id_b")
          .orderBy("vec_id")
      },
      Some("WITH RECURSIVE\n" +
        "v AS (SELECT vec_id, label, embedding AS v FROM embeddings),\n" +
        "p AS (\n" +
        "  SELECT l.vec_id AS id_a, r.vec_id AS id_b\n" +
        "  FROM v l JOIN v r ON l.label = r.label AND l.vec_id < r.vec_id\n" +
        s"  WHERE round(${duckCos("l.v", "r.v")}, 4) >= 0.2),\n" +
        """edges AS (SELECT id_a AS src, id_b AS dst FROM p
          |          UNION ALL SELECT id_b, id_a FROM p),
          |reach(id, lbl) AS (
          |  SELECT vec_id, vec_id FROM embeddings
          |  UNION
          |  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id),
          |comp AS (SELECT id, min(lbl) AS component FROM reach GROUP BY id),
          |sizes AS (SELECT component, count(*) AS cluster_size
          |          FROM comp GROUP BY component)
          |SELECT comp.id AS vec_id, comp.component, sizes.cluster_size
          |FROM comp JOIN sizes USING (component)
          |ORDER BY vec_id""".stripMargin)),

    // JSONL sink + source round-trip with explicit read schema
    // (sources/Jsonl): the corpus-interchange format; the agg proves
    // text survives JSON escaping character-for-character.
    QueryDef("q71_jsonl_roundtrip",
      (s, dir) => {
        val tmp = sys.props("java.io.tmpdir") + "/graft_jsonl_roundtrip"
        Jsonl.write(t(s, dir, "documents")
          .select("doc_id", "text", "lang", "source", "n_chars"), tmp)
        Jsonl.read(s, tmp, StructType.fromDDL(
          "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"))
          .groupBy("lang", "source")
          .agg(count(lit(1)).as("n"),
            sum(length(col("text"))).as("chars"),
            sum("n_chars").as("n_chars_sum"))
          .orderBy("lang", "source")
      },
      Some("""SELECT lang, source, count(*) AS n,
             |  CAST(sum(len(text)) AS BIGINT) AS chars,
             |  CAST(sum(n_chars) AS BIGINT) AS n_chars_sum
             |FROM documents GROUP BY lang, source
             |ORDER BY lang, source""".stripMargin)),

    // Fixed-size overlapping character chunking (Chunking.chunkFixed):
    // narrow generate-and-slice, zero shuffle; size 200, overlap 50.
    QueryDef("q72_chunk_documents",
      (s, dir) => Chunking.chunkFixed(
        t(s, dir, "documents"), "doc_id", "text", size = 200, overlap = 50)
        .orderBy("doc_id", "chunk_id"),
      Some("""WITH d AS (SELECT doc_id, text, len(text) AS n FROM documents),
             |nc AS (SELECT doc_id, text,
             |    CASE WHEN n <= 200 THEN 1
             |         ELSE 1 + CAST(ceil((n - 200) / 150.0) AS BIGINT)
             |    END AS nch
             |  FROM d),
             |ch AS (SELECT doc_id, text,
             |         unnest(generate_series(0, nch - 1)) AS chunk_id
             |       FROM nc)
             |SELECT doc_id, chunk_id,
             |  substr(text, CAST(chunk_id * 150 + 1 AS BIGINT), 200)
             |    AS chunk_text,
             |  len(substr(text, CAST(chunk_id * 150 + 1 AS BIGINT), 200))
             |    AS chunk_len
             |FROM ch ORDER BY doc_id, chunk_id""".stripMargin)),

    // Int8 absmax embedding quantization audit (Quantize.quantizeAudit):
    // integral code checksum + worst per-element reconstruction error,
    // all narrow array math.
    QueryDef("q73_quantize_embeddings",
      (s, dir) => Quantize.quantizeAudit(
        t(s, dir, "embeddings"), "vec_id", "embedding")
        .orderBy("vec_id"),
      Some("""WITH v AS (
             |  SELECT vec_id, embedding,
             |    coalesce(list_max(list_transform(embedding,
             |      x -> abs(CAST(x AS DOUBLE)))), 0) AS scale
             |  FROM embeddings),
             |q AS (
             |  SELECT vec_id, scale, embedding, len(embedding) AS n_dims,
             |    list_transform(embedding, x -> CASE WHEN scale = 0 THEN 0
             |      ELSE CAST(round(CAST(x AS DOUBLE) / scale * 127) AS INT)
             |      END) AS qv
             |  FROM v)
             |SELECT vec_id, n_dims, scale,
             |  CAST(coalesce(list_sum(qv), 0) AS BIGINT) AS q_sum,
             |  round(coalesce(list_max(list_transform(embedding, (x, i) ->
             |    abs(CAST(x AS DOUBLE) - qv[i] * scale / 127))), 0), 6)
             |    AS max_abs_err
             |FROM q ORDER BY vec_id""".stripMargin)),

    // CCNet-style segment (line) dedup: first occurrence of each
    // distinct 10-token window survives corpus-wide, docs reassembled
    // (LineDedup.dedupSegments). One explode + one min-agg groupBy +
    // one join — no window over an unpartitioned frame.
    QueryDef("q74_line_dedup",
      (s, dir) => {
        val docs = t(s, dir, "documents").select(col("doc_id"),
          LineDedup.tokenSegments(col("text"), 10).as("segs"))
        LineDedup.dedupSegments(docs, "doc_id", "segs").orderBy("doc_id")
      },
      Some("""WITH tk AS (
             |  SELECT doc_id, list_filter(
             |    string_split_regex(text, ' +'), t -> t <> '') AS tk
             |  FROM documents),
             |base AS (
             |  SELECT doc_id, tk,
             |    CAST(ceil(len(tk) / 10.0) AS BIGINT) AS n_segs
             |  FROM tk),
             |seg AS (
             |  SELECT doc_id, i AS pos,
             |    array_to_string(tk[i*10+1 : i*10+10], ' ') AS seg
             |  FROM (SELECT doc_id, tk,
             |          unnest(generate_series(0, n_segs - 1)) AS i
             |        FROM base)),
             |keep AS (
             |  SELECT doc_id, pos, seg, row_number() OVER (
             |    PARTITION BY seg ORDER BY doc_id, pos) AS rn
             |  FROM seg),
             |reb AS (
             |  SELECT doc_id, count(*) AS n_kept,
             |    string_agg(seg, ' ' ORDER BY pos) AS dedup_text
             |  FROM keep WHERE rn = 1 GROUP BY doc_id)
             |SELECT b.doc_id, b.n_segs,
             |  coalesce(r.n_kept, 0) AS n_kept,
             |  coalesce(r.dedup_text, '') AS dedup_text
             |FROM base b LEFT JOIN reb r USING (doc_id)
             |ORDER BY doc_id""".stripMargin)),

    // Corpus-repeated n-gram spans (Lee et al. 2022 exact-substring
    // dedup signal, TextAnalysis.repeatedNgramSignals): distinct
    // 8-gram inventory per doc, share that appears in ≥2 docs.
    QueryDef("q75_repeated_ngrams",
      (s, dir) => TextAnalysis.repeatedNgramSignals(
        t(s, dir, "documents"), "doc_id", "text", n = 8)
        .orderBy("doc_id"),
      Some("""WITH tk AS (
             |  SELECT doc_id, list_filter(
             |    string_split_regex(text, ' +'), t -> t <> '') AS tk
             |  FROM documents),
             |ng AS (
             |  SELECT DISTINCT doc_id,
             |    array_to_string(tk[i+1 : i+8], ' ') AS ngram
             |  FROM (SELECT doc_id, tk,
             |          unnest(generate_series(0, len(tk) - 8)) AS i
             |        FROM tk)),
             |freq AS (SELECT ngram, count(*) AS n_docs FROM ng GROUP BY ngram),
             |per AS (
             |  SELECT doc_id, count(*) AS n_ngrams,
             |    CAST(sum(CASE WHEN f.n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n_repeated
             |  FROM ng JOIN freq f USING (ngram) GROUP BY doc_id)
             |SELECT d.doc_id,
             |  coalesce(p.n_ngrams, 0) AS n_ngrams,
             |  coalesce(p.n_repeated, 0) AS n_repeated,
             |  round(CAST(p.n_repeated AS DOUBLE) / p.n_ngrams, 4)
             |    AS repeated_frac
             |FROM documents d LEFT JOIN per p USING (doc_id)
             |ORDER BY doc_id""".stripMargin)),

    // Unigram-LM perplexity scoring (LanguageModel.trainUnigram +
    // scoreNll, the CCNet quality-gate shape): model trained on the
    // corpus itself, every doc scored by mean NLL under add-1
    // smoothing; the model broadcasts, the corpus never shuffles.
    QueryDef("q76_lm_perplexity",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val lm = LanguageModel.trainUnigram(docs, "text")
        LanguageModel.scoreNll(docs, "doc_id", "text", lm, alpha = 1.0)
          .orderBy("doc_id")
      },
      Some("""WITH tok AS (
             |  SELECT doc_id, unnest(list_filter(
             |    string_split_regex(text, ' +'), t -> t <> '')) AS token
             |  FROM documents),
             |lm AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token),
             |stats AS (SELECT CAST(sum(cnt) AS DOUBLE) AS t_total,
             |                 CAST(count(*) AS DOUBLE) AS v_size FROM lm),
             |sc AS (
             |  SELECT t.doc_id, count(*) AS n_tokens,
             |    avg(-ln((coalesce(l.cnt, 0) + 1.0) /
             |            (s.t_total + 1.0 * s.v_size))) AS nll
             |  FROM tok t LEFT JOIN lm l USING (token) CROSS JOIN stats s
             |  GROUP BY t.doc_id)
             |SELECT d.doc_id, coalesce(sc.n_tokens, 0) AS n_tokens,
             |  round(sc.nll, 4) AS nll
             |FROM documents d LEFT JOIN sc USING (doc_id)
             |ORDER BY doc_id""".stripMargin)),

    // Token-budget curation (Sampling.budgetSample): per source, the
    // longest (n_chars DESC, doc_id) prefix whose running token total
    // fits 600 — "keep the best N tokens per source".
    QueryDef("q77_budget_sample",
      (s, dir) => {
        val docs = t(s, dir, "documents").withColumn(
          "n_tokens", TextAnalysis.tokenCount(col("text")).cast("long"))
        Sampling.budgetSample(docs, "doc_id", "source", "n_tokens",
            priority = col("n_chars"), budget = 600L)
          .select("doc_id", "source", "n_tokens", "cum_tokens")
          .orderBy("doc_id")
      },
      Some("""WITH d AS (
             |  SELECT doc_id, source, n_chars,
             |    CAST(len(list_filter(string_split_regex(text, ' +'),
             |      t -> t <> '')) AS BIGINT) AS n_tokens
             |  FROM documents),
             |c AS (
             |  SELECT doc_id, source, n_tokens,
             |    CAST(sum(n_tokens) OVER (PARTITION BY source
             |      ORDER BY n_chars DESC, doc_id
             |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
             |  FROM d)
             |SELECT doc_id, source, n_tokens, cum_tokens
             |FROM c WHERE cum_tokens <= 600
             |ORDER BY doc_id""".stripMargin)),

    // KMV distinct-count sketch (graft_kmv, a native
    // TypedImperativeAggregate): k = 64 smallest distinct text hashes
    // per language → (k−1)·2^60/h_k estimate next to the exact count.
    // Bounded sketch bytes cross the shuffle instead of every
    // distinct value; md5-portable, so DuckDB rebuilds the SAME
    // sketch and the estimate is hash-compared, not tolerance-judged.
    QueryDef("q78_kmv_distinct",
      (s, dir) => {
        val k = 64
        val h = t(s, dir, "documents")
          .select(col("lang"), Hashing.portableHash(col("text")).as("h"))
        h.groupBy("lang")
          .agg(expr(s"graft_kmv(h, $k)").as("sketch"),
            countDistinct(col("h")).as("n_exact"))
          .select(col("lang"), col("n_exact"),
            size(col("sketch")).cast("long").as("k_filled"),
            round(when(size(col("sketch")) < k,
                size(col("sketch")).cast("double"))
              .otherwise(lit((k - 1).toDouble) * lit(1152921504606846976L) /
                element_at(col("sketch"), k).cast("double")), 1)
              .as("kmv_est"))
          .orderBy("lang")
      },
      Some(s"""WITH h AS (
             |  SELECT lang,
             |    ${Hashing.duckPortableHash("text")} AS h
             |  FROM documents),
             |sk AS (
             |  SELECT lang, list_sort(list_distinct(list(h)))[1:64] AS sketch,
             |    count(DISTINCT h) AS n_exact
             |  FROM h GROUP BY lang)
             |SELECT lang, n_exact,
             |  CAST(len(sketch) AS BIGINT) AS k_filled,
             |  round(CASE WHEN len(sketch) < 64 THEN CAST(len(sketch) AS DOUBLE)
             |    ELSE 63.0 * 1152921504606846976 / CAST(sketch[64] AS DOUBLE)
             |    END, 1) AS kmv_est
             |FROM sk ORDER BY lang""".stripMargin)),

    // Trailing-hour per-user stats at each event (Rolling
    // .trailingStats): value-based range frame over integer
    // microseconds (Spark truncates parquet nanos to micros on read;
    // the oracle windows over epoch_ns//1000 so both engines cut the
    // frame at identical instants).
    QueryDef("q79_rolling_stats",
      (s, dir) => Rolling.trailingStats(
        t(s, dir, "events"), "user_id", "ts", "value", windowSec = 3600L)
        .select("event_id", "user_id", "n_win", "avg_win", "z")
        .orderBy("event_id"),
      Some("""WITH w AS (
             |  SELECT event_id, user_id, value,
             |    count(value) OVER win AS n_win,
             |    avg(value) OVER win AS avg_win,
             |    stddev_samp(value) OVER win AS sd
             |  FROM events
             |  WINDOW win AS (PARTITION BY user_id
             |    ORDER BY epoch_ns(ts) // 1000
             |    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW))
             |SELECT event_id, user_id,
             |  CAST(n_win AS BIGINT) AS n_win,
             |  round(avg_win, 4) AS avg_win,
             |  round(CASE WHEN n_win >= 2 AND sd > 0
             |    THEN (value - avg_win) / sd END, 4) AS z
             |FROM w ORDER BY event_id""".stripMargin)),

    // Vocabulary heavy-hitters (TextAnalysis.topTokens): top-10 tokens
    // per language; map-side-combinable counts, the rank window runs
    // on the vocabulary-sized post-aggregate only.
    QueryDef("q80_top_tokens",
      (s, dir) => TextAnalysis.topTokens(
        t(s, dir, "documents"), "lang", "text", k = 10)
        .orderBy("lang", "rank"),
      Some("""WITH tok AS (
             |  SELECT lang, unnest(list_filter(
             |    string_split_regex(text, ' +'), t -> t <> '')) AS token
             |  FROM documents),
             |c AS (SELECT lang, token, count(*) AS cnt
             |      FROM tok GROUP BY lang, token),
             |r AS (SELECT lang, token, cnt,
             |        CAST(row_number() OVER (PARTITION BY lang
             |          ORDER BY cnt DESC, token) AS INT) AS "rank"
             |      FROM c)
             |SELECT lang, "rank", token, cnt FROM r
             |WHERE "rank" <= 10 ORDER BY lang, "rank"""".stripMargin)),

    // Per-source document-frequency boilerplate report (LineDedup
    // .boilerplateSegments, segment size 1 ≡ df-based stopword
    // discovery): tokens present in ≥60% of a source's docs.
    QueryDef("q81_boilerplate",
      (s, dir) => {
        // segment size 1 ≡ the token array itself — skip the
        // per-element slice/join of tokenSegments(_, 1)
        val docs = t(s, dir, "documents").select(col("doc_id"), col("source"),
          TextAnalysis.tokens(col("text")).as("segs"))
        LineDedup.boilerplateSegments(docs, "doc_id", "segs", "source",
            minFrac = 0.6)
          .orderBy("source", "seg")
      },
      Some("""WITH totals AS (
             |  SELECT source, CAST(count(DISTINCT doc_id) AS DOUBLE) AS n_docs
             |  FROM documents GROUP BY source),
             |sd AS (
             |  SELECT DISTINCT source, doc_id, unnest(list_filter(
             |    string_split_regex(text, ' +'), t -> t <> '')) AS seg
             |  FROM documents),
             |cov AS (
             |  SELECT source, seg, count(*) AS n_docs_with
             |  FROM sd GROUP BY source, seg)
             |SELECT c.source, c.seg, c.n_docs_with,
             |  round(CAST(c.n_docs_with AS DOUBLE) / t.n_docs, 4) AS frac
             |FROM cov c JOIN totals t USING (source)
             |WHERE c.n_docs_with / t.n_docs >= 0.6
             |ORDER BY source, seg""".stripMargin)),

    // Group-wise z-normalization (Normalize.zscore): doc length
    // standardized within its language — two-phase stats + broadcast
    // join back, never a per-group window over the corpus.
    QueryDef("q82_zscore_by_lang",
      (s, dir) => Normalize.zscore(
        t(s, dir, "documents").select("doc_id", "lang", "n_chars"),
        "n_chars", Seq("lang"))
        .orderBy("doc_id"),
      Some("""WITH s AS (
             |  SELECT lang, avg(n_chars) AS mu, stddev_samp(n_chars) AS sd
             |  FROM documents GROUP BY lang)
             |SELECT d.doc_id, d.lang, d.n_chars,
             |  round(CASE WHEN s.sd > 0 THEN (d.n_chars - s.mu) / s.sd END, 4)
             |    AS z
             |FROM documents d JOIN s USING (lang)
             |ORDER BY doc_id""".stripMargin)),

    // PageRank centrality over the MinHash near-dup graph (PageRank
    // .run on Dedup.minhashNearDups edges): well-connected canonical
    // docs rank high, isolates sit at the teleport floor. 5 unrolled
    // power-iteration rounds in both engines.
    QueryDef("q83_pagerank_neardups",
      (s, dir) => {
        val docs = t(s, dir, "documents").filter(col("doc_id") < 1000)
        val pairs = Dedup.minhashNearDups(docs, "doc_id", "text",
          k = 64, bands = 8, threshold = 0.8)
        PageRank.run(docs, "doc_id", pairs, "id_a", "id_b",
            damping = 0.85, iters = 5)
          .withColumnRenamed("id", "doc_id")
          .orderBy("doc_id")
      },
      Some("WITH " + minhashVerifiedCtes + ",\n" +
        """prpairs AS (SELECT id_a, id_b FROM verified WHERE jaccard >= 0.8),
          |prnodes AS (SELECT doc_id AS id FROM toks),
          |predges AS (SELECT id_a AS src, id_b AS dst FROM prpairs
          |            UNION SELECT id_b, id_a FROM prpairs),
          |""".stripMargin +
        pageRankCtes(d = 0.85, iters = 5) + "\n" +
        """SELECT nd.id AS doc_id,
          |  round(coalesce(p.pr, iso5.pr), 6) AS pr
          |FROM prnodes nd LEFT JOIN pre5 p USING (id) CROSS JOIN iso5
          |ORDER BY doc_id""".stripMargin)),

    // Interval-overlap join (IntervalJoin.pointInInterval): purchases
    // landing inside the 10-minute window after each error event. The
    // naive theta-join is a nested-loop; the op's bucketed equi-join
    // form shuffles once on the time bucket instead.
    QueryDef("q84_interval_join",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val intervals = ev.filter(col("event_type") === "error")
          .select(col("event_id").as("err_id"), col("ts").as("ivl_start"),
            (col("ts") + expr("INTERVAL 600 SECOND")).as("ivl_end"))
        val points = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("ts").as("p_ts"))
        IntervalJoin.pointInInterval(intervals, points,
            "ivl_start", "ivl_end", "p_ts", bucketSec = 600L)
          .select(col("err_id"), col("purchase_id"),
            (unix_micros(col("p_ts").cast("timestamp")) -
              unix_micros(col("ivl_start").cast("timestamp"))).as("gap_us"))
          .orderBy("err_id", "purchase_id")
      },
      Some("""WITH i AS (
             |  SELECT event_id AS err_id, ts AS ivl_start,
             |    ts + INTERVAL 600 SECOND AS ivl_end
             |  FROM events WHERE event_type = 'error'),
             |p AS (SELECT event_id AS purchase_id, ts AS p_ts
             |      FROM events WHERE event_type = 'purchase')
             |SELECT i.err_id, p.purchase_id,
             |  epoch_us(p.p_ts) - epoch_us(i.ivl_start) AS gap_us
             |FROM i JOIN p ON p.p_ts >= i.ivl_start AND p.p_ts <= i.ivl_end
             |ORDER BY err_id, purchase_id""".stripMargin)),

    // Rank-based quality tiers (Normalize.ntileBy): length deciles
    // within each language — the "top 10% for its stratum" bucket a
    // curation rule consumes. Deterministic via the doc_id tie-break.
    QueryDef("q85_quality_tiers",
      (s, dir) => Normalize.ntileBy(
          t(s, dir, "documents").select("doc_id", "lang", "n_chars"),
          n = 10, "n_chars", Seq("lang"), tieBreak = col("doc_id"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, lang, n_chars,
             |  CAST(ntile(10) OVER (PARTITION BY lang
             |    ORDER BY n_chars, doc_id) AS INT) AS tier
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Deterministic global shuffle + shard assignment (Sampling
    // .shuffleShards): every doc gets a stable pseudo-random epoch
    // position and a 64-doc shard id — distributed sortBy+zipWithIndex,
    // no single-task global window.
    QueryDef("q86_training_shards",
      (s, dir) => Sampling.shuffleShards(
          t(s, dir, "documents").select("doc_id", "source"),
          "doc_id", shardSize = 64L)
        .orderBy("rank"),
      Some(s"""WITH h AS (
             |  SELECT doc_id, source,
             |    ${Hashing.duckPortableHash("CAST(doc_id AS VARCHAR)")} AS h
             |  FROM documents),
             |r AS (SELECT doc_id, source,
             |        row_number() OVER (ORDER BY h, CAST(doc_id AS VARCHAR))
             |          - 1 AS "rank"
             |      FROM h)
             |SELECT doc_id, source, "rank", "rank" // 64 AS shard
             |FROM r ORDER BY "rank"""".stripMargin)),

    // Hashing-trick linear classifier inference (Classifier.scoreDocs):
    // fastText-shaped quality gate — token hash → bucket → ppm weight,
    // integer sum, one codegen'd projection, zero shuffle. Weights are
    // hash-derived stand-ins with the real model's exact data flow.
    QueryDef("q87_hash_classifier",
      (s, dir) => Classifier.scoreDocs(
          t(s, dir, "documents").select("doc_id", "text"), "text",
          dim = 4096)
        .select("doc_id", "n_tokens", "score_ppm", "keep")
        .orderBy("doc_id"),
      Some(s"""WITH tok AS (
             |  SELECT doc_id, list_filter(
             |    string_split_regex(text, ' +'), t -> t <> '') AS toks
             |  FROM documents),
             |s AS (SELECT doc_id, len(toks) AS n,
             |        ${Classifier.duckPpmSum("toks", 4096)} AS ppm
             |      FROM tok)
             |SELECT doc_id, CAST(n AS INT) AS n_tokens,
             |  CASE WHEN n > 0 THEN
             |    CAST(floor(CAST(ppm AS DOUBLE) / n) AS BIGINT) END
             |    AS score_ppm,
             |  CASE WHEN n > 0 THEN ppm > 0 END AS keep
             |FROM s ORDER BY doc_id""".stripMargin)),

    // Semantic decontamination (Similarity.semanticDecontaminate):
    // embedding-space eval-set leakage removal — benchmark broadcast,
    // corpus scored in place, survivors with their max benchmark
    // cosine. vec_id < 50 plays the held-out benchmark.
    QueryDef("q88_semantic_decontam",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.semanticDecontaminate(
            emb.filter(col("vec_id") >= 50), emb.filter(col("vec_id") < 50),
            "vec_id", "embedding", threshold = 0.45)
          .orderBy("vec_id")
      },
      Some(s"""WITH b AS (SELECT embedding FROM embeddings WHERE vec_id < 50),
             |c AS (SELECT vec_id, embedding FROM embeddings
             |      WHERE vec_id >= 50),
             |s AS (
             |  SELECT c.vec_id,
             |    round(max(${duckCos("c.embedding", "b.embedding")}), 4)
             |      AS max_bench_cos
             |  FROM c CROSS JOIN b GROUP BY c.vec_id)
             |SELECT vec_id, max_bench_cos FROM s
             |WHERE max_bench_cos < 0.45 ORDER BY vec_id""".stripMargin)),

    // Column profiler (Profile.summary): per-column row/non-null/
    // distinct counts + numeric min/max in ONE aggregation pass —
    // the ingest-time data-quality report. Oracle generated from the
    // same column list by Profile.duckSummarySql.
    QueryDef("q89_profile",
      (s, dir) => Profile.summary(t(s, dir, "lineitem"),
          GemQueries.profileCols.map(_._1))
        .orderBy("col_name"),
      Some(Profile.duckSummarySql("lineitem", profileCols)))
  )

  /** q90–q92 — fuzzy matching, corpus mixing, semi-structured parse. */
  private val moreDefs: Seq[QueryDef] = Seq(

    // Edit-distance near-dup pairs (Dedup.editDistancePairs): fuzzy
    // entity matching over short strings — distinct-first, length-band
    // blocked, plain equi-join; Levenshtein never runs on a pair the
    // band pruning can exclude.
    QueryDef("q90_edit_distance",
      (s, dir) => Dedup.editDistancePairs(
          t(s, dir, "part").select("p_name"), "p_name", maxDist = 2)
        .orderBy("str_a", "str_b"),
      Some("""WITH n AS (
             |  SELECT DISTINCT p_name AS s FROM part WHERE p_name IS NOT NULL)
             |SELECT a.s AS str_a, b.s AS str_b,
             |  CAST(levenshtein(a.s, b.s) AS INT) AS dist
             |FROM n a JOIN n b ON a.s < b.s
             |WHERE levenshtein(a.s, b.s) BETWEEN 1 AND 2
             |ORDER BY str_a, str_b""".stripMargin)),

    // Temperature-weighted source mixing (Sampling.temperatureMix,
    // α = 0.5): per-language √n-proportional keep rates toward a
    // 250-row target — integer-exact rate math, portable-hash
    // membership, shuffle-free scoring pass.
    QueryDef("q91_temperature_mix",
      (s, dir) => Sampling.temperatureMix(
          t(s, dir, "documents").select("doc_id", "lang", "source"),
          "doc_id", "lang", targetRows = 250L)
        .select("doc_id", "lang", "source", "rate_ppm")
        .orderBy("doc_id"),
      Some(s"""WITH n AS (SELECT lang, count(*) AS n FROM documents
             |           GROUP BY lang),
             |s AS (SELECT lang, n,
             |        CAST(floor(sqrt(n) * 1000000) AS BIGINT) AS s6 FROM n),
             |t AS (SELECT sum(s6) AS tot6 FROM s),
             |r AS (SELECT lang, least(1000000, CAST(
             |        CAST(s6 AS HUGEINT) * 250 * 1000000 //
             |          (CAST(tot6 AS HUGEINT) * n) AS BIGINT)) AS rate_ppm
             |      FROM s CROSS JOIN t)
             |SELECT d.doc_id, d.lang, d.source, r.rate_ppm
             |FROM documents d JOIN r USING (lang)
             |WHERE ${Hashing.duckPortableHash("CAST(doc_id AS VARCHAR)")}
             |  % 1000000 < r.rate_ppm
             |ORDER BY doc_id""".stripMargin)),

    // Semi-structured JSON parse (from_json typed extraction, M-tier
    // scalar surface): events.props → typed field, rolled up per
    // event type. Parsing stays in one codegen'd projection.
    QueryDef("q92_json_extract",
      (s, dir) => t(s, dir, "events")
        .select(col("event_type"),
          from_json(col("props"), "k INT",
            Map.empty[String, String]).getField("k").as("k"))
        .groupBy("event_type")
        .agg(count(col("k")).as("n_k"),
          round(avg(col("k")), 4).as("avg_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy("event_type"),
      Some("""WITH j AS (
             |  SELECT event_type,
             |    CAST(json_extract_string(props, '$.k') AS INT) AS k
             |  FROM events)
             |SELECT event_type, count(k) AS n_k,
             |  round(avg(k), 4) AS avg_k,
             |  min(k) AS min_k, max(k) AS max_k
             |FROM j GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Incremental near-dup lookup (Dedup.incrementalNearDups): the
    // production shape of minhash dedup — today's batch (doc_id ≥ 250)
    // probes the existing corpus index (doc_id < 250); the corpus is
    // never re-paired against itself. Same k=64/8-band/verify
    // arithmetic as q44, shared via minhashSigCtes.
    QueryDef("q93_incremental_neardups",
      (s, dir) => {
        val docs = t(s, dir, "documents").filter(col("doc_id") < 1000)
        Dedup.incrementalNearDups(
            docs.filter(col("doc_id") >= 250), docs.filter(col("doc_id") < 250),
            "doc_id", "text", k = 64, bands = 8, threshold = 0.8)
          .orderBy("batch_id", "index_id")
      },
      Some("WITH " +
        minhashSigCtes("b", "doc_id >= 250 AND doc_id < 1000") + ",\n" +
        minhashSigCtes("i", "doc_id < 250") + ",\n" +
        """icand AS (
          |  SELECT DISTINCT l.doc_id AS batch_id, r.doc_id AS index_id
          |  FROM bbands l JOIN ibands r
          |    ON l.band_id = r.band_id AND l.band_hash = r.band_hash),
          |iverified AS (
          |  SELECT c.batch_id, c.index_id,
          |    round(CAST(len(list_intersect(a.tk, b.tk)) AS DOUBLE) /
          |          len(list_distinct(list_concat(a.tk, b.tk))), 4) AS jaccard
          |  FROM icand c
          |  JOIN btoks a ON a.doc_id = c.batch_id
          |  JOIN itoks b ON b.doc_id = c.index_id)
          |SELECT batch_id, index_id, jaccard FROM iverified
          |WHERE jaccard >= 0.8 ORDER BY batch_id, index_id""".stripMargin)),

    // Text canonicalization (TextAnalysis.canonText / graft_canon
    // native kernel): NFC + lowercase + whitespace collapse fused into
    // one codegen'd pass — the normalization step before any dedup
    // hash. The oracle composes DuckDB's nfc_normalize/lower/
    // regexp_replace in the same operation order.
    QueryDef("q94_canon_text",
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.canonText(col("text")).as("canon"))
        .withColumn("n_chars_canon", length(col("canon")))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, canon,
             |  CAST(length(canon) AS INT) AS n_chars_canon
             |FROM (
             |  SELECT doc_id,
             |    trim(regexp_replace(lower(nfc_normalize(text)),
             |      '[ \t\n\f\r]+', ' ', 'g')) AS canon
             |  FROM documents)
             |ORDER BY doc_id""".stripMargin)),

    // Portable Bloom-filter semi-join pruning (graft_bloom /
    // graft_bloom_contains native aggregate + probe): BUILDING
    // customers' keys build a 65×63-bit bitset (map-side OR-merge,
    // broadcast), orders probe it BEFORE any join — the runtime-filter
    // pattern with oracle-reproducible hashing, so even the false
    // positives match bit-for-bit.
    QueryDef("q95_bloom_semijoin",
      (s, dir) => {
        val cust = t(s, dir, "customer")
          .filter(col("c_mktsegment") === "BUILDING")
        val bloom = cust.agg(call_function("graft_bloom",
          col("c_custkey").cast("string"), lit(65), lit(3)).as("bloom"))
        val probed = t(s, dir, "orders").crossJoin(broadcast(bloom))
          .withColumn("bloom_pass", call_function("graft_bloom_contains",
            col("bloom"), col("o_custkey").cast("string"), lit(3)))
        probed.join(
            cust.select(col("c_custkey").as("o_custkey")).distinct()
              .withColumn("is_match", lit(true)),
            Seq("o_custkey"), "left")
          .agg(count(lit(1)).as("n_orders"),
            sum(when(col("bloom_pass"), 1L).otherwise(0L)).as("n_bloom_pass"),
            sum(when(col("is_match"), 1L).otherwise(0L)).as("n_true_match"),
            sum(when(col("bloom_pass") && col("is_match").isNull, 1L)
              .otherwise(0L)).as("n_false_pos"))
      },
      Some(s"""WITH ks AS (
             |  SELECT DISTINCT c_custkey FROM customer
             |  WHERE c_mktsegment = 'BUILDING'),
             |js AS (SELECT unnest(generate_series(0, 2)) AS j),
             |bpos AS (
             |  SELECT DISTINCT
             |    ${Hashing.duckSeededHash("j", "CAST(c_custkey AS VARCHAR)")}
             |      % 4095 AS p
             |  FROM ks CROSS JOIN js),
             |words AS (
             |  SELECT p // 63 AS w,
             |    bit_or(CAST(1 AS BIGINT) << CAST(p % 63 AS INT)) AS bits
             |  FROM bpos GROUP BY p // 63),
             |probe AS (
             |  SELECT o_orderkey, o_custkey,
             |    ${Hashing.duckSeededHash("j", "CAST(o_custkey AS VARCHAR)")}
             |      % 4095 AS p
             |  FROM orders CROSS JOIN js),
             |hits AS (
             |  SELECT o_orderkey, o_custkey,
             |    sum(CASE WHEN w.bits IS NOT NULL AND
             |      (w.bits & (CAST(1 AS BIGINT) << CAST(p.p % 63 AS INT)))
             |        <> 0 THEN 1 ELSE 0 END) AS nhit
             |  FROM probe p LEFT JOIN words w ON w.w = p.p // 63
             |  GROUP BY o_orderkey, o_custkey),
             |wt AS (
             |  SELECT h.nhit, (k.c_custkey IS NOT NULL) AS ismatch
             |  FROM hits h LEFT JOIN ks k ON k.c_custkey = h.o_custkey)
             |SELECT count(*) AS n_orders,
             |  CAST(sum(CASE WHEN nhit = 3 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_bloom_pass,
             |  CAST(sum(CASE WHEN ismatch THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_true_match,
             |  CAST(sum(CASE WHEN nhit = 3 AND NOT ismatch THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_false_pos
             |FROM wt""".stripMargin)),

    // Signature-grain streaming near-dup dedup, batch-parity mode
    // (EventStream.dedupDocsBySignature): docs sharing a FULL 64-value
    // minhash signature collapse to the earliest id — the stream-gate
    // counterpart of q44's band/verify pipeline, no pair join at all.
    // Empty docs (no signature) pass through. StreamingModeSpec drives
    // the same operator through a real MemoryStream run.
    QueryDef("q96_signature_dedup",
      (s, dir) => graft.streaming.EventStream.dedupDocsBySignature(
          t(s, dir, "documents").filter(col("doc_id") < 1000)
            .select("doc_id", "lang", "source", "text"),
          "doc_id", "text", orderCol = "doc_id")
        .select("doc_id", "lang", "source", "sig_key")
        .orderBy("doc_id"),
      Some("WITH " + minhashSigCtes("", "doc_id < 1000") + ",\n" +
        """keyed AS (
          |  SELECT doc_id, CASE WHEN sig IS NOT NULL THEN
          |      md5(array_to_string(
          |        list_transform(sig, x -> CAST(x AS VARCHAR)), ','))
          |    END AS sig_key
          |  FROM sig),
          |keep AS (
          |  SELECT doc_id, sig_key FROM (
          |    SELECT doc_id, sig_key,
          |      row_number() OVER (PARTITION BY sig_key ORDER BY doc_id)
          |        AS rn
          |    FROM keyed WHERE sig_key IS NOT NULL) WHERE rn = 1
          |  UNION ALL
          |  SELECT doc_id, sig_key FROM keyed WHERE sig_key IS NULL)
          |SELECT d.doc_id, d.lang, d.source, k.sig_key
          |FROM documents d JOIN keep k USING (doc_id)
          |ORDER BY doc_id""".stripMargin)),

    // Hybrid retrieval via reciprocal-rank fusion (Retrieval.rrfFuse,
    // Cormack et al. SIGIR'09): BM25 lexical top-20 + embedding-cosine
    // top-20 (vec 0 as the query) merged by 1/(60+rank) sums — no
    // score calibration across the two signal types. Both lists are
    // dim-sized; nothing corpus-scale touches the fusion join.
    QueryDef("q97_hybrid_rrf",
      (s, dir) => {
        val lex = Retrieval.bm25TopK(t(s, dir, "documents"), "doc_id",
          "text", queryTerms = Seq("spark", "join", "stream"), k = 20)
        val emb = t(s, dir, "embeddings")
        val sem = Similarity.bruteForceTopK(
            emb, emb.filter(col("vec_id") === 0), "vec_id", "embedding",
            k = 20)
          .select(col("neighbor_id").as("doc_id"), col("rank"))
        Retrieval.rrfFuse(lex.select("doc_id", "rank"), sem, "doc_id",
          c = 60, k = 10)
      },
      Some("WITH " + bm25RankedCtes(20) + ",\n" +
        s"""qv AS (SELECT embedding AS qvec FROM embeddings
           |       WHERE vec_id = 0),
           |cs AS (
           |  SELECT e.vec_id AS doc_id,
           |    ${duckCos("e.embedding", "qv.qvec")} AS cos
           |  FROM embeddings e CROSS JOIN qv WHERE e.vec_id <> 0),
           |semr AS (
           |  SELECT doc_id, "rank" FROM (
           |    SELECT doc_id, CAST(row_number() OVER (
           |      ORDER BY cos DESC, doc_id) AS INT) AS "rank"
           |    FROM cs) WHERE "rank" <= 20),
           |fused AS (
           |  SELECT coalesce(l.doc_id, s.doc_id) AS doc_id,
           |    round(coalesce(1.0 / (60 + l."rank"), 0) +
           |          coalesce(1.0 / (60 + s."rank"), 0), 6) AS rrf
           |  FROM lexr l FULL OUTER JOIN semr s ON l.doc_id = s.doc_id),
           |top AS (SELECT doc_id, rrf FROM fused
           |        ORDER BY rrf DESC, doc_id LIMIT 10)
           |SELECT doc_id,
           |  CAST(row_number() OVER (ORDER BY rrf DESC, doc_id) AS INT)
           |    AS fused_rank, rrf
           |FROM top ORDER BY fused_rank""".stripMargin)),

    // PNG + GIF real header decode (Multimodal.decodeMeta): big-endian
    // IHDR dims and little-endian GIF logical-screen dims synthesized
    // in-engine, decoded by the fixed-offset paths, checked against
    // the closed-form oracle — q68's BMP/WAV pattern, two more real
    // formats.
    QueryDef("q98_media_decode_png_gif",
      (s, dir) => {
        def le2hex(n: Column): Column = concat((0 to 1).map(i =>
          lpad(hex(pmod(shiftright(n, 8 * i), lit(256))), 2, "0")): _*)
        def be4hex(n: Column): Column = concat((3 to 0 by -1).map(i =>
          lpad(hex(pmod(shiftright(n, 8 * i), lit(256))), 2, "0")): _*)
        val ids = t(s, dir, "documents")
          .select(col("doc_id").cast("long").as("id"))
        val wCol = lit(16) + pmod(col("id"), lit(900))
        val hCol = lit(16) + pmod(col("id") * 11, lit(900))
        val png = ids.filter(pmod(col("id"), lit(2)) === 0).select(
          col("id"),
          unhex(concat(
            lit("89504E470D0A1A0A" + "0000000D" + "49484452"),
            be4hex(wCol), be4hex(hCol), lit("0806000000"))).as("bytes"),
          lit("image").as("media_type"))
        val gif = ids.filter(pmod(col("id"), lit(2)) === 1).select(
          col("id"),
          unhex(concat(lit("474946383961"), le2hex(wCol), le2hex(hCol),
            lit("F70000"))).as("bytes"),
          lit("image").as("media_type"))
        Multimodal.decodeMeta(s, png.unionByName(gif)).toDF()
          .select(col("id"), col("nBytes").as("n_bytes"), col("width"),
            col("height"))
          .orderBy("id")
      },
      Some("""SELECT doc_id AS id,
             |  CAST(CASE WHEN doc_id % 2 = 0 THEN 29 ELSE 13 END AS BIGINT)
             |    AS n_bytes,
             |  CAST(16 + doc_id % 900 AS INT) AS width,
             |  CAST(16 + (doc_id * 11) % 900 AS INT) AS height
             |FROM documents ORDER BY id""".stripMargin)),

    // FORWARD as-of join with tolerance (AsofJoin Forward + 30-min
    // gate): each click attaches the NEXT same-user purchase within
    // 1800 s — click→conversion attribution. q60 covers Backward/no-
    // tolerance; this exercises the other half of the API against
    // DuckDB's native ASOF LEFT JOIN (p.ts >= c.ts = forward).
    // Perf note (r8 follow-up): the 3.8 s vs q60's 0.84 s in the cold
    // one-pass bench is JIT/codegen for this query's unique
    // tolerance+gap plan, not volume or sort width — interleaved
    // repeat runs measure q99 ≈ q60 ≈ 1.0–1.2 s warm at sf0.1.
    QueryDef("q99_asof_forward",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts").as("click_ts"),
            col("event_id").as("click_id"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .groupBy("user_id", "ts").agg(max("event_id").as("purchase_id"))
        AsofJoin.join(clicks, purchases, Seq("user_id"),
            "click_ts", "ts", Seq("purchase_id"),
            direction = AsofJoin.Forward,
            matchedTsCol = Some("purchase_ts"),
            tolerance = Some(lit(1800)))
          .select(col("user_id"), col("click_id"),
            coalesce(col("purchase_id"), lit(-1L)).as("purchase_id"),
            (unix_micros(col("purchase_ts").cast("timestamp")) -
              unix_micros(col("click_ts").cast("timestamp"))).as("gap_us"))
          .orderBy("user_id", "click_id")
      },
      Some("""WITH c AS (
             |  SELECT user_id, ts AS click_ts, event_id AS click_id
             |  FROM events WHERE event_type = 'click'),
             |p AS (
             |  SELECT user_id, ts, max(event_id) AS purchase_id
             |  FROM events WHERE event_type = 'purchase'
             |  GROUP BY user_id, ts),
             |j AS (
             |  SELECT c.user_id, c.click_id, c.click_ts,
             |    p.purchase_id, p.ts AS pts
             |  FROM c ASOF LEFT JOIN p
             |    ON c.user_id = p.user_id AND p.ts >= c.click_ts)
             |SELECT user_id, click_id,
             |  coalesce(CASE WHEN epoch_us(pts) - epoch_us(click_ts)
             |    <= 1800000000 THEN purchase_id END, -1) AS purchase_id,
             |  CASE WHEN epoch_us(pts) - epoch_us(click_ts) <= 1800000000
             |    THEN epoch_us(pts) - epoch_us(click_ts) END AS gap_us
             |FROM j ORDER BY user_id, click_id""".stripMargin)),

    // The end-to-end corpus-production pipeline in ONE plan: curate
    // (exact dedup → quality/lang gate → near-dup clusters, q50's
    // fates) → temperature-mix toward 50 docs (q91's √n rates) →
    // deterministic shuffle into 32-doc training shards (q86). Every
    // stage reuses a proven operator and a shared oracle fragment —
    // the library composes, which is the point of being a library.
    QueryDef("q100_corpus_to_shards",
      (s, dir) => {
        // The curated set costs a minhash pass + component rounds to
        // produce but is tiny (≲ docs/5 ids). Downstream consumes it
        // three times (mix stats, mix membership, shard sort) —
        // localCheckpoint materializes it ONCE and truncates the
        // iterative lineage, measured 12.4 s → ~5 s at sf0.1.
        val kept = CorpusPipeline.curatedDocs(
            t(s, dir, "documents").filter(col("doc_id") < 1000))
          .select("doc_id", "source").localCheckpoint(true)
        val mixed = Sampling.temperatureMix(
          kept, "doc_id", "source", targetRows = 50L)
        Sampling.shuffleShards(mixed, "doc_id", shardSize = 32L)
          .orderBy("rank")
      },
      Some("WITH RECURSIVE " + curationFateCtes + ",\n" +
        s"""kept AS (SELECT doc_id, source FROM fate WHERE fate = 'kept'),
           |mixn AS (SELECT source, count(*) AS n FROM kept GROUP BY source),
           |mixs AS (SELECT source, n,
           |    CAST(floor(sqrt(n) * 1000000) AS BIGINT) AS s6 FROM mixn),
           |mixt AS (SELECT sum(s6) AS tot6 FROM mixs),
           |mixr AS (SELECT source, least(1000000, CAST(
           |    CAST(s6 AS HUGEINT) * 50 * 1000000 //
           |      (CAST(tot6 AS HUGEINT) * n) AS BIGINT)) AS rate_ppm
           |  FROM mixs CROSS JOIN mixt),
           |mixed AS (
           |  SELECT k.doc_id, k.source, r.rate_ppm
           |  FROM kept k JOIN mixr r USING (source)
           |  WHERE ${Hashing.duckPortableHash("CAST(doc_id AS VARCHAR)")}
           |    % 1000000 < r.rate_ppm),
           |hashed AS (
           |  SELECT source, doc_id, rate_ppm,
           |    ${Hashing.duckPortableHash("CAST(doc_id AS VARCHAR)")} AS h
           |  FROM mixed)
           |SELECT source, doc_id, rate_ppm,
           |  row_number() OVER (ORDER BY h, CAST(doc_id AS VARCHAR)) - 1
           |    AS "rank",
           |  (row_number() OVER (ORDER BY h, CAST(doc_id AS VARCHAR)) - 1)
           |    // 32 AS shard
           |FROM hashed ORDER BY "rank"""".stripMargin)),

    // BPE first-merge pair counts (TextAnalysis.bpePairCounts,
    // Sennrich ACL'16): top adjacent character pairs within tokens —
    // the count half of tokenizer training's count-and-merge loop.
    QueryDef("q101_bpe_pairs",
      (s, dir) => TextAnalysis.bpePairCounts(
        t(s, dir, "documents"), "text", k = 50),
      Some("""WITH tok AS (
             |  SELECT unnest(list_filter(string_split_regex(text, ' +'),
             |    t -> t <> '')) AS token FROM documents),
             |pairs AS (
             |  SELECT unnest(list_transform(
             |    generate_series(1, length(token) - 1),
             |    i -> substr(token, CAST(i AS INT), 2))) AS pair
             |  FROM tok),
             |c AS (SELECT pair, count(*) AS cnt FROM pairs GROUP BY pair),
             |r AS (SELECT pair, cnt,
             |        CAST(row_number() OVER (ORDER BY cnt DESC, pair) AS INT)
             |          AS "rank"
             |      FROM c)
             |SELECT "rank", pair, cnt FROM r
             |WHERE "rank" <= 50 ORDER BY "rank"""".stripMargin)),

    // Sequential conversion funnel: users whose first view precedes a
    // click that precedes a purchase (strict event-time order) — the
    // product-analytics staple. Three per-user min aggregates chained
    // by user_id joins; user-dim-sized frames only past the first agg.
    // Oracle casts ts to µs TIMESTAMP to mirror Spark's parquet-nanos
    // truncation.
    QueryDef("q102_event_funnel",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val v = ev.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min("ts").as("view_ts"))
        val c = ev.filter(col("event_type") === "click")
          .join(v, "user_id").filter(col("ts") > col("view_ts"))
          .groupBy("user_id").agg(min("ts").as("click_ts"))
        val p = ev.filter(col("event_type") === "purchase")
          .join(c, "user_id").filter(col("ts") > col("click_ts"))
          .groupBy("user_id").agg(min("ts").as("purchase_ts"))
        v.agg(count(lit(1)).as("users_viewed"))
          .crossJoin(c.agg(count(lit(1)).as("users_clicked_after")))
          .crossJoin(p.agg(count(lit(1)).as("users_purchased_after")))
      },
      Some("""WITH v AS (
             |  SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS view_ts
             |  FROM events WHERE event_type = 'view' GROUP BY user_id),
             |c AS (
             |  SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS click_ts
             |  FROM events e JOIN v USING (user_id)
             |  WHERE e.event_type = 'click'
             |    AND CAST(e.ts AS TIMESTAMP) > v.view_ts
             |  GROUP BY e.user_id),
             |p AS (
             |  SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS purchase_ts
             |  FROM events e JOIN c USING (user_id)
             |  WHERE e.event_type = 'purchase'
             |    AND CAST(e.ts AS TIMESTAMP) > c.click_ts
             |  GROUP BY e.user_id)
             |SELECT (SELECT count(*) FROM v) AS users_viewed,
             |  (SELECT count(*) FROM c) AS users_clicked_after,
             |  (SELECT count(*) FROM p) AS users_purchased_after""".stripMargin)),

    // Dedup-tier evaluation (q67's measured-trade pattern applied to
    // the near-dup finders): SimHash banded pairs scored against the
    // exact-Jaccard ≥ 0.8 ground truth on the bounded doc_id < 1000
    // eval sample — all-pairs truth is an EVAL-ONLY cost, like q29's
    // brute-force baseline. Ratios are integer ppm (the q87 lesson:
    // no float rounding ties).
    QueryDef("q103_dedup_eval",
      (s, dir) => {
        val docs = t(s, dir, "documents").filter(col("doc_id") < 1000)
        val tk = Dedup.tokenIndex(docs, "doc_id", "text")
        val a = tk.select(col("doc_id").as("id_a"), col("toks").as("ta"),
          col("n_toks").as("na"))
        val b = tk.select(col("doc_id").as("id_b"), col("toks").as("tb"),
          col("n_toks").as("nb"))
        val truth = a.join(b, col("id_a") < col("id_b"))
          .withColumn("inter",
            call_function("graft_overlap", col("ta"), col("tb")))
          .withColumn("j", round(col("inter").cast("double") /
            (col("na") + col("nb") - col("inter")), 4))
          .filter(col("j") >= 0.8).select("id_a", "id_b")
        val pred = Dedup.simhashNearDups(docs, "doc_id", "text")
          .select("id_a", "id_b")
        val tp = pred.join(truth, Seq("id_a", "id_b"))
        truth.agg(count(lit(1)).as("n_truth"))
          .crossJoin(pred.agg(count(lit(1)).as("n_pred")))
          .crossJoin(tp.agg(count(lit(1)).as("n_tp")))
          .select(col("n_truth"), col("n_pred"), col("n_tp"),
            when(col("n_pred") > 0,
              floor(col("n_tp") * lit(1000000L) / col("n_pred"))
                .cast("long")).as("precision_ppm"),
            when(col("n_truth") > 0,
              floor(col("n_tp") * lit(1000000L) / col("n_truth"))
                .cast("long")).as("recall_ppm"))
      },
      Some("WITH " + minhashSigCtes("t", "doc_id < 1000") + ",\n" +
        simhashCandCtes("s", "doc_id < 1000") + ",\n" +
        """truthp AS (
          |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
          |  FROM ttoks a JOIN ttoks b ON a.doc_id < b.doc_id
          |  WHERE round(CAST(len(list_intersect(a.tk, b.tk)) AS DOUBLE) /
          |        len(list_distinct(list_concat(a.tk, b.tk))), 4) >= 0.8),
          |predp AS (
          |  SELECT id_a, id_b FROM scand
          |  WHERE bit_count(xor(sa, sb)) <= 3),
          |tp AS (SELECT * FROM predp INTERSECT SELECT * FROM truthp),
          |m AS (SELECT (SELECT count(*) FROM truthp) AS n_truth,
          |             (SELECT count(*) FROM predp) AS n_pred,
          |             (SELECT count(*) FROM tp) AS n_tp)
          |SELECT n_truth, n_pred, n_tp,
          |  CASE WHEN n_pred > 0
          |    THEN n_tp * 1000000 // n_pred END AS precision_ppm,
          |  CASE WHEN n_truth > 0
          |    THEN n_tp * 1000000 // n_truth END AS recall_ppm
          |FROM m""".stripMargin)),

    // Canonical-text exact dedup (graft_canon + Dedup.exact): case /
    // spacing / Unicode-composition variants of the same content hash
    // to ONE key — the reason normalization runs before any dedup
    // hash. Same one-aggregate shape as q25, on the canonical form.
    QueryDef("q104_canon_dedup",
      (s, dir) => Dedup.exact(
          t(s, dir, "documents")
            .withColumn("ctext", TextAnalysis.canonText(col("text"))),
          "ctext", "doc_id")
        .orderBy("content_hash"),
      Some("""WITH c AS (
             |  SELECT doc_id,
             |    md5(trim(regexp_replace(lower(nfc_normalize(text)),
             |      '[ \t\n\f\r]+', ' ', 'g'))) AS content_hash
             |  FROM documents)
             |SELECT content_hash, min(doc_id) AS keep_id,
             |  count(*) AS n_copies
             |FROM c GROUP BY content_hash ORDER BY content_hash""".stripMargin)),

    // Value-based quartile tiers (Normalize.tierByCuts): per-language
    // exact percentile cuts broadcast back, tier as a pure per-row
    // expression — the corpus-scale alternative to q85's rank-based
    // ntile (equal values share a tier here).
    QueryDef("q105_value_tiers",
      (s, dir) => Normalize.tierByCuts(
          t(s, dir, "documents").select("doc_id", "lang", "n_chars"),
          n = 4, "n_chars", Seq("lang"))
        .select("doc_id", "lang", "n_chars", "tier")
        .orderBy("doc_id"),
      Some("""WITH c AS (
             |  SELECT lang,
             |    round(quantile_cont(n_chars, 0.25), 4) AS c1,
             |    round(quantile_cont(n_chars, 0.5), 4) AS c2,
             |    round(quantile_cont(n_chars, 0.75), 4) AS c3
             |  FROM documents GROUP BY lang)
             |SELECT d.doc_id, d.lang, d.n_chars,
             |  CAST(1 + CAST(d.n_chars > c.c1 AS INT)
             |    + CAST(d.n_chars > c.c2 AS INT)
             |    + CAST(d.n_chars > c.c3 AS INT) AS INT) AS tier
             |FROM documents d JOIN c USING (lang)
             |ORDER BY doc_id""".stripMargin)),

    // BPE training loop (Bpe.train, Sennrich ACL'16): K rounds of
    // count -> merge -> recount over the (word, freq) vocabulary —
    // q101's pair count extended to the full tokenizer-training
    // iteration. The oracle replays the exact trajectory as unrolled
    // CTE rounds: merge application is a literal left-to-right
    // replace() on the double-space symbol-state string, identical in
    // both engines by construction.
    QueryDef("q106_bpe_train",
      (s, dir) => Bpe.train(t(s, dir, "documents"), "text", merges = 6),
      Some(s"""WITH ${bpeTrainCtes(6)}
             |SELECT step, "left", "right", merged, cnt
             |FROM (${(1 to 6).map(i => s"SELECT * FROM m$i")
               .mkString(" UNION ALL ")})
             |ORDER BY step""".stripMargin)),

    // Exact-substring dedup REMOVAL (SpanDedup.removeRepeatedSpans,
    // Lee et al. 2022): the excision half q75 only detected — every
    // corpus-repeated 8-token span keeps its smallest-(doc, pos)
    // occurrence, all others are cut and docs reassembled from the
    // surviving tokens. Oracle mirrors the window/keeper/coverage/
    // rebuild chain; the null-skipping string_agg CASE is DuckDB's
    // twin of Spark's null-skipping collect_list(when(...)).
    QueryDef("q107_span_dedup",
      (s, dir) => SpanDedup.removeRepeatedSpans(
        t(s, dir, "documents"), "doc_id", "text", n = 8)
        .orderBy("doc_id"),
      Some("""WITH tk AS (
             |  SELECT doc_id, list_filter(
             |    string_split_regex(text, ' +'), t -> t <> '') AS tk
             |  FROM documents),
             |win AS (
             |  SELECT doc_id, i AS pos,
             |    array_to_string(tk[i+1 : i+8], ' ') AS gram
             |  FROM (SELECT doc_id, tk,
             |          unnest(generate_series(0, len(tk) - 8)) AS i
             |        FROM tk)),
             |rep AS (
             |  SELECT doc_id, pos,
             |    row_number() OVER (PARTITION BY gram
             |      ORDER BY doc_id, pos) AS rn,
             |    count(*) OVER (PARTITION BY gram) AS cnt
             |  FROM win),
             |cov AS (
             |  SELECT DISTINCT doc_id, tpos FROM (
             |    SELECT doc_id, pos + unnest(generate_series(0, 7)) AS tpos
             |    FROM rep WHERE cnt > 1 AND rn > 1)),
             |tokpos AS (
             |  SELECT doc_id, unnest(tk) AS token,
             |    unnest(generate_series(0, len(tk) - 1)) AS tpos
             |  FROM tk),
             |reb AS (
             |  SELECT t.doc_id, count(*) AS n_tokens,
             |    count(c.tpos) AS n_removed,
             |    coalesce(string_agg(CASE WHEN c.tpos IS NULL THEN t.token END,
             |      ' ' ORDER BY t.tpos), '') AS clean_text
             |  FROM tokpos t LEFT JOIN cov c
             |    ON t.doc_id = c.doc_id AND t.tpos = c.tpos
             |  GROUP BY t.doc_id)
             |SELECT d.doc_id, coalesce(r.n_tokens, 0) AS n_tokens,
             |  coalesce(r.n_removed, 0) AS n_removed,
             |  coalesce(r.clean_text, '') AS clean_text
             |FROM documents d LEFT JOIN reb r USING (doc_id)
             |ORDER BY d.doc_id""".stripMargin)),

    // REAL JPEG header decode (Multimodal.decodeMeta marker walk):
    // bytes synthesized in-plan — SOI + JFIF APP0 + SOF0 carrying
    // per-id big-endian dims + EOI — the parser walks the segment
    // markers back to the frame header, and the oracle recomputes the
    // dimension formulas directly, so a walk bug cannot cancel out
    // (the q68/q98 pattern for the last codec-free format).
    QueryDef("q108_media_decode_jpeg",
      (s, dir) => {
        def be2hex(n: Column): Column = lpad(hex(n), 4, "0")
        val ids = t(s, dir, "documents")
          .select(col("doc_id").cast("long").as("id"))
        val wCol = lit(16) + pmod(col("id"), lit(900))
        val hCol = lit(16) + pmod(col("id") * 13, lit(900))
        val jpeg = ids.select(
          col("id"),
          unhex(concat(
            lit("FFD8" + // SOI
              "FFE000104A46494600010100000100010000" + // JFIF APP0
              "FFC0001108"), // SOF0, len 17, precision 8
            be2hex(hCol), be2hex(wCol),
            lit("03012200021101031101" + "FFD9"))).as("bytes"),
          lit("image").as("media_type"))
        Multimodal.decodeMeta(s, jpeg).toDF()
          .select(col("id"), col("nBytes").as("n_bytes"), col("width"),
            col("height"))
          .orderBy("id")
      },
      Some("""SELECT doc_id AS id, CAST(41 AS BIGINT) AS n_bytes,
             |  CAST(16 + doc_id % 900 AS INT) AS width,
             |  CAST(16 + (doc_id * 13) % 900 AS INT) AS height
             |FROM documents ORDER BY id""".stripMargin)),

    // REAL MP4 header decode (Multimodal.decodeMeta ISO BMFF box
    // walk): ftyp + moov(mvhd + trak(tkhd)) synthesized in-plan with
    // per-id timescale/duration and 16.16 fixed-point track dims; the
    // walk reads them back and the oracle recomputes the formulas
    // (incl. the truncating duration*1000/timescale division). With
    // this, all six media formats decode REAL metadata — the stub
    // remains only for malformed bytes.
    QueryDef("q109_media_decode_mp4",
      (s, dir) => {
        def be4hex(n: Column): Column = lpad(hex(n), 8, "0")
        val ids = t(s, dir, "documents")
          .select(col("doc_id").cast("long").as("id"))
        val tsCol = lit(500) + pmod(col("id"), lit(4)) * 250
        val durCol = lit(10000) + pmod(col("id") * 17, lit(100000))
        val wCol = lit(16) + pmod(col("id"), lit(1200))
        val hCol = lit(16) + pmod(col("id") * 7, lit(1200))
        val mp4 = ids.select(
          col("id"),
          unhex(concat(
            lit("00000010" + "66747970" + "69736F6D" + "00000000" + // ftyp
              "00000088" + "6D6F6F76" + // moov, size 136
              "0000001C" + "6D766864" + "00000000" + // mvhd v0, size 28
              "00000000" + "00000000"), // ctime, mtime
            be4hex(tsCol), be4hex(durCol),
            lit("00000064" + "7472616B" + // trak, size 100
              "0000005C" + "746B6864" + "00000000" + // tkhd v0, size 92
              "00" * 72), // track fields + matrix (zeros)
            be4hex(wCol * 65536), be4hex(hCol * 65536))).as("bytes"),
          lit("video").as("media_type"))
        Multimodal.decodeMeta(s, mp4).toDF()
          .select(col("id"), col("nBytes").as("n_bytes"), col("width"),
            col("height"), col("durationMs").as("duration_ms"))
          .orderBy("id")
      },
      Some("""SELECT doc_id AS id, CAST(152 AS BIGINT) AS n_bytes,
             |  CAST(16 + doc_id % 1200 AS INT) AS width,
             |  CAST(16 + (doc_id * 7) % 1200 AS INT) AS height,
             |  CAST((10000 + (doc_id * 17) % 100000) * 1000
             |    // (500 + (doc_id % 4) * 250) AS BIGINT) AS duration_ms
             |FROM documents ORDER BY id""".stripMargin)),

    // BPE segmentation (Bpe.trainWithVocab's vocabulary): the USABLE
    // half of tokenizer training — every distinct corpus word with its
    // frequency and its post-merge subword segmentation after q106's 6
    // merges. The oracle replays the same trajectory (ONE shared CTE
    // generator with q106) and reads v6's states; word reconstruction
    // is just the state with delimiters stripped, so a segmentation
    // bug cannot hide behind the word column.
    QueryDef("q110_bpe_segment",
      (s, dir) => {
        val vocab = Bpe.trainWithVocab(
          t(s, dir, "documents"), "text", merges = 6)._2
        vocab.select(
            translate(col("state"), " ", "").as("word"),
            col("freq"),
            size(split(trim(col("state")), "  ")).as("n_symbols"),
            array_join(split(trim(col("state")), "  "), " ").as("segmented"))
          .orderBy("word")
      },
      Some(s"""WITH ${bpeTrainCtes(6)}
             |SELECT replace(state, ' ', '') AS word, freq,
             |  CAST(len(string_split(trim(state), '  ')) AS INT)
             |    AS n_symbols,
             |  array_to_string(string_split(trim(state), '  '), ' ')
             |    AS segmented
             |FROM v6 ORDER BY word""".stripMargin)),

    // BPE encode (Bpe.tokenCount): per-document token counts under the
    // q106-trained tokenizer — the corpus-budgeting number ("how many
    // model tokens is this dataset"). The K trained rules are collected
    // (K rows, the codebook pattern) and baked into a narrow per-row
    // HOF expression: no shuffle, no UDF, no join. Oracle replays
    // training AND encoding from the two shared CTE generators.
    QueryDef("q111_bpe_encode",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val rules = Bpe.train(docs, "text", merges = 6)
          .select("left", "right").collect()
          .map(r => (r.getString(0), r.getString(1))).toSeq
        docs.select(col("doc_id"),
            TextAnalysis.tokenCount(col("text")).cast("long")
              .as("n_tokens_ws"),
            Bpe.tokenCount(col("text"), rules).as("n_tokens_bpe"))
          .orderBy("doc_id")
      },
      Some(s"""WITH ${bpeTrainCtes(6)},
             |${bpeEncodeCtes(6)}
             |SELECT d.doc_id,
             |  CAST(len(list_filter(string_split_regex(d.text, ' +'),
             |    t -> t <> '')) AS BIGINT) AS n_tokens_ws,
             |  coalesce(b.n_tokens_bpe, 0) AS n_tokens_bpe
             |FROM documents d LEFT JOIN bpec b USING (doc_id)
             |ORDER BY d.doc_id""".stripMargin)),

    // Gopher rule-based quality gates (TextAnalysis.gopherGates, Rae
    // et al. 2021 A1): word-count / mean-word-length / symbol-ratio /
    // alpha-fraction / stopword / bullet / ellipsis gates, every one
    // exact integer arithmetic (a/b <= r evaluated cross-multiplied)
    // so no rounded float can tie at a boundary in either engine. The
    // required-stopword list is the corpus's own function words
    // (EnStopwords) — the synthetic vocabulary contains only
    // 'the'/'a' of Gopher's English-web eight, which would zero the
    // gate corpus-wide; adapting the list to the language profile is
    // the documented intent of the rule.
    QueryDef("q112_gopher_gates",
      (s, dir) => TextAnalysis.gopherGates(
        t(s, dir, "documents"), "doc_id", "text",
        requiredStops = TextAnalysis.EnStopwords).orderBy("doc_id"),
      Some("""WITH w AS (
             |  SELECT doc_id, text,
             |    list_filter(string_split_regex(text, ' +'),
             |      t -> t <> '') AS words,
             |    list_filter(string_split(text, chr(10)),
             |      l -> l <> '') AS lines
             |  FROM documents),
             |m AS (
             |  SELECT doc_id,
             |    CAST(len(words) AS BIGINT) AS n_words,
             |    CAST(coalesce(list_sum(list_transform(words,
             |      x -> length(x))), 0) AS BIGINT) AS n_chars,
             |    CAST(length(text) - length(replace(text, '#', ''))
             |      + length(text) - length(replace(text, '…', ''))
             |      AS BIGINT) AS n_sym,
             |    CAST(len(list_filter(words,
             |      x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS n_alpha,
             |    CAST(len(list_intersect(
             |      list_distinct(list_transform(words, x -> lower(x))),
             |      ['the','a','an','of','and','to','in','is']))
             |      AS BIGINT) AS n_stop,
             |    CAST(len(lines) AS BIGINT) AS n_lines,
             |    CAST(len(list_filter(lines, l -> l LIKE '- %'
             |      OR l LIKE '* %' OR l LIKE '•%')) AS BIGINT) AS n_bullet,
             |    CAST(len(list_filter(lines, l -> l LIKE '%...'
             |      OR l LIKE '%…')) AS BIGINT) AS n_ell
             |  FROM w),
             |g AS (
             |  SELECT doc_id, n_words,
             |    CAST(n_words BETWEEN 50 AND 100000 AS INT) AS g_word_count,
             |    CAST(n_words > 0 AND 3 * n_words <= n_chars
             |      AND n_chars <= 10 * n_words AS INT) AS g_mean_len,
             |    CAST(10 * n_sym <= n_words AS INT) AS g_symbol,
             |    CAST(5 * n_alpha >= 4 * n_words AS INT) AS g_alpha,
             |    CAST(n_stop >= 2 AS INT) AS g_stopwords,
             |    CAST(10 * n_bullet <= 9 * n_lines AS INT) AS g_bullets,
             |    CAST(10 * n_ell <= 3 * n_lines AS INT) AS g_ellipsis
             |  FROM m)
             |SELECT *, g_word_count * g_mean_len * g_symbol * g_alpha
             |    * g_stopwords * g_bullets * g_ellipsis AS keep
             |FROM g ORDER BY doc_id""".stripMargin)),

    // Interpolated bigram LM scoring (LanguageModel.scoreBigramNll):
    // one order above q76's unigram — p = 0.7*p_bi + 0.3*p_uni, both
    // add-1 smoothed over the unigram vocabulary, first token scored
    // by the unigram term alone. (1 - lambda) is computed, not a
    // literal, so both engines land on the identical IEEE double.
    QueryDef("q113_bigram_lm",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val uni = LanguageModel.trainUnigram(docs, "text")
        val bi = LanguageModel.trainBigram(docs, "text")
        LanguageModel.scoreBigramNll(docs, "doc_id", "text", uni, bi,
          alpha = 1.0, lambda = 0.7).orderBy("doc_id")
      },
      Some("""WITH tkl AS (
             |  SELECT doc_id, list_filter(
             |    string_split_regex(text, ' +'), t -> t <> '') AS tk
             |  FROM documents),
             |tok AS (SELECT doc_id, unnest(tk) AS token FROM tkl),
             |lm AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token),
             |stats AS (SELECT CAST(sum(cnt) AS DOUBLE) AS t_total,
             |                 CAST(count(*) AS DOUBLE) AS v_size FROM lm),
             |bgx AS (
             |  SELECT s.pr AS prev, s.cu AS cur FROM (
             |    SELECT unnest(list_transform(generate_series(2, len(tk)),
             |      i -> struct_pack(pr := tk[CAST(i AS INT) - 1],
             |        cu := tk[CAST(i AS INT)]))) AS s
             |    FROM tkl)),
             |bi AS (SELECT prev, cur, count(*) AS bcnt
             |       FROM bgx GROUP BY prev, cur),
             |ctx AS (SELECT prev, sum(bcnt) AS ctx_cnt FROM bi GROUP BY prev),
             |items AS (
             |  SELECT doc_id, tk[CAST(i AS INT)] AS cur,
             |    CASE WHEN i > 1 THEN tk[CAST(i AS INT) - 1] END AS prev
             |  FROM (SELECT doc_id, tk,
             |          unnest(generate_series(1, len(tk))) AS i
             |        FROM tkl)),
             |sc AS (
             |  SELECT t.doc_id, count(*) AS n_tokens,
             |    avg(-ln(CASE WHEN t.prev IS NULL
             |      THEN (coalesce(u.cnt, 0) + 1.0)
             |        / (s.t_total + 1.0 * s.v_size)
             |      ELSE 0.7 * ((coalesce(b.bcnt, 0) + 1.0)
             |          / (CAST(coalesce(c.ctx_cnt, 0) AS DOUBLE)
             |            + 1.0 * s.v_size))
             |        + (1.0 - 0.7) * ((coalesce(u.cnt, 0) + 1.0)
             |          / (s.t_total + 1.0 * s.v_size)) END)) AS nll
             |  FROM items t
             |  LEFT JOIN lm u ON u.token = t.cur
             |  LEFT JOIN bi b ON b.prev = t.prev AND b.cur = t.cur
             |  LEFT JOIN ctx c ON c.prev = t.prev
             |  CROSS JOIN stats s
             |  GROUP BY t.doc_id)
             |SELECT d.doc_id, coalesce(sc.n_tokens, 0) AS n_tokens,
             |  round(sc.nll, 4) AS nll
             |FROM documents d LEFT JOIN sc USING (doc_id)
             |ORDER BY doc_id""".stripMargin)),

    // TF-IDF keyword extraction (TextAnalysis.tfidfTopTerms): top-3
    // characteristic terms per doc, score = tf * ln(N/df). The rank
    // uses the UNROUNDED double — identical (tf, df, N) integers feed
    // ln on both engines, and exact-equal scores break on the term —
    // so the cut is engine-stable; only the emitted score is rounded.
    QueryDef("q114_tfidf_terms",
      (s, dir) => TextAnalysis.tfidfTopTerms(
        t(s, dir, "documents"), "doc_id", "text", k = 3)
        .orderBy("doc_id", "rank"),
      Some("WITH " + tfidfCtes("documents", "doc_id", 3) + "\n" +
        """SELECT doc_id, "rank", term, tf, df,
          |  round(score, 4) AS tfidf
          |FROM r WHERE "rank" <= 3 ORDER BY doc_id, "rank"""".stripMargin)),

    // DSIR importance resampling (Dsir.importanceSelect): weight every
    // document by the hashed-unigram+bigram log-ratio of the English
    // subset (target) vs the whole corpus (raw), then Gumbel-top-100
    // with deterministic hash-derived noise. The selection cut ranks
    // the UNROUNDED gumbel key (ties broken on doc_id); only the
    // emitted weight is rounded.
    QueryDef("q115_dsir_select",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        Dsir.importanceSelect(docs, "doc_id", "text",
          docs.filter(col("lang") === "en"),
          dim = 1024, alpha = 1.0, k = 100).orderBy("doc_id")
      },
      Some(s"""WITH tkl AS (
             |  SELECT doc_id, lang, list_filter(
             |    string_split_regex(text, ' +'), t -> t <> '') AS tk
             |  FROM documents),
             |feats AS (
             |  SELECT doc_id, lang, unnest(list_concat(tk,
             |    list_transform(generate_series(2, len(tk)),
             |      i -> tk[CAST(i AS INT) - 1] || ' ' ||
             |        tk[CAST(i AS INT)]))) AS f
             |  FROM tkl),
             |db AS (
             |  SELECT doc_id, lang,
             |    ${Hashing.duckPortableHash("f")} % 1024 AS bucket,
             |    count(*) AS n
             |  FROM feats GROUP BY doc_id, lang, bucket),
             |qc AS (SELECT bucket, sum(n) AS qcnt FROM db GROUP BY bucket),
             |tc AS (SELECT bucket, sum(n) AS tcnt FROM db
             |       WHERE lang = 'en' GROUP BY bucket),
             |tot AS (SELECT
             |  (SELECT CAST(sum(qcnt) AS DOUBLE) FROM qc) AS q_total,
             |  (SELECT CAST(sum(tcnt) AS DOUBLE) FROM tc) AS t_total),
             |model AS (
             |  SELECT q.bucket,
             |    ln((coalesce(t.tcnt, 0) + 1.0) / (tt.t_total + 1.0 * 1024))
             |  - ln((q.qcnt + 1.0) / (tt.q_total + 1.0 * 1024)) AS lpr
             |  FROM qc q LEFT JOIN tc t USING (bucket) CROSS JOIN tot tt),
             |sc AS (
             |  SELECT d.doc_id, sum(d.n) AS n_feats,
             |    sum(d.n * m.lpr) AS logw
             |  FROM db d JOIN model m USING (bucket) GROUP BY d.doc_id),
             |ky AS (
             |  SELECT doc_id, logw - ln(-ln(
             |    (${Hashing.duckPortableHash("'g:' || doc_id")} % 1000000
             |      + 0.5) / 1000000.0)) AS gkey
             |  FROM sc),
             |top AS (SELECT doc_id FROM ky ORDER BY gkey DESC, doc_id
             |        LIMIT 100)
             |SELECT d.doc_id,
             |  CAST(coalesce(s.n_feats, 0) AS BIGINT) AS n_feats,
             |  round(s.logw, 4) AS logw, (t.doc_id IS NOT NULL) AS selected
             |FROM documents d LEFT JOIN sc s USING (doc_id)
             |LEFT JOIN top t USING (doc_id)
             |ORDER BY d.doc_id""".stripMargin)),

    // PMI collocations (TextAnalysis.collocations): adjacent pairs
    // seen >= 5 times, scored ln(p(xy)/(p(x)p(y))). The emitted SET is
    // gated by an integer count, so only the 4-decimal score touches
    // float parity.
    QueryDef("q116_collocations",
      (s, dir) => TextAnalysis.collocations(t(s, dir, "documents"),
        "text", minCount = 5).orderBy("prev", "cur"),
      Some("""WITH tkl AS (
             |  SELECT list_filter(
             |    string_split_regex(text, ' +'), t -> t <> '') AS tk
             |  FROM documents),
             |tok AS (SELECT unnest(tk) AS token FROM tkl),
             |uni AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token),
             |bgx AS (
             |  SELECT s.pr AS prev, s.cu AS cur FROM (
             |    SELECT unnest(list_transform(generate_series(2, len(tk)),
             |      i -> struct_pack(pr := tk[CAST(i AS INT) - 1],
             |        cu := tk[CAST(i AS INT)]))) AS s
             |    FROM tkl)),
             |bi AS (SELECT prev, cur, count(*) AS bcnt
             |       FROM bgx GROUP BY prev, cur),
             |tot AS (SELECT
             |  (SELECT CAST(sum(cnt) AS DOUBLE) FROM uni) AS n_uni,
             |  (SELECT CAST(sum(bcnt) AS DOUBLE) FROM bi) AS n_bi)
             |SELECT b.prev, b.cur, b.bcnt AS n_pair,
             |  round(ln((CAST(b.bcnt AS DOUBLE) / t.n_bi) /
             |    ((CAST(u1.cnt AS DOUBLE) / t.n_uni) *
             |     (CAST(u2.cnt AS DOUBLE) / t.n_uni))), 4) + 0.0 AS pmi
             |FROM bi b
             |JOIN uni u1 ON u1.token = b.prev
             |JOIN uni u2 ON u2.token = b.cur
             |CROSS JOIN tot t
             |WHERE b.bcnt >= 5
             |ORDER BY b.prev, b.cur""".stripMargin)),

    // Count-Min heavy hitters (graft_cms, a native
    // TypedImperativeAggregate): one 4x512 counter matrix over every
    // token occurrence, then the CMS estimate (min over rows) for the
    // 20 most frequent tokens next to their true counts. The probe-set
    // cut is (count desc, token) — integers and strings only — and
    // every emitted value is an exact integer, so nothing floats. The
    // oracle rebuilds each probed cell by re-grouping token counts on
    // the shared hash family.
    QueryDef("q117_cms_heavy_hitters",
      (s, dir) => {
        val (d, w) = (4, 512)
        val toks = t(s, dir, "documents")
          .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
        val uni = toks.groupBy("token").agg(count(lit(1)).as("cnt"))
          .withColumn("h", Hashing.portableHash(col("token")))
        val sketch = toks
          .select(Hashing.portableHash(col("token")).as("h"))
          .agg(expr(s"graft_cms(h, $d, $w)").as("sk"))
        uni.orderBy(col("cnt").desc, col("token")).limit(20)
          .crossJoin(broadcast(sketch))
          .select(col("token"), col("cnt"),
            CmsSketch.estimate(col("sk"), col("h"), d, w).as("est_cnt"))
          .orderBy("token")
      },
      Some(s"""WITH tok AS (
             |  SELECT unnest(list_filter(
             |    string_split_regex(text, ' +'), t -> t <> '')) AS token
             |  FROM documents),
             |uni AS (SELECT token, count(*) AS cnt FROM tok
             |        GROUP BY token),
             |hx AS (SELECT token, cnt,
             |         ${Hashing.duckPortableHash("token")} AS h
             |       FROM uni),
             |rs AS (SELECT unnest(generate_series(0, 3)) AS r),
             |cells AS (
             |  SELECT r, ${CmsSketch.duckCell("r", "h", 512)} AS c,
             |    CAST(sum(cnt) AS BIGINT) AS v
             |  FROM hx CROSS JOIN rs GROUP BY 1, 2),
             |probe AS (SELECT token, cnt, h FROM hx
             |          ORDER BY cnt DESC, token LIMIT 20)
             |SELECT p.token, p.cnt, min(c.v) AS est_cnt
             |FROM probe p CROSS JOIN rs
             |JOIN cells c ON c.r = rs.r
             |  AND c.c = ${CmsSketch.duckCell("rs.r", "p.h", 512)}
             |GROUP BY p.token, p.cnt
             |ORDER BY p.token""".stripMargin)),

    // Logistic-regression training (LogReg.train): 3 full-batch GD
    // steps on hashed unigram+bigram features, label = (lang = 'en').
    // The oracle unrolls the identical 3-step trajectory; emitted
    // weights round to 4 with the -0.0 canonicalization.
    QueryDef("q118_logreg_train",
      (s, dir) => {
        val docs = t(s, dir, "documents")
          .withColumn("y", (col("lang") === "en").cast("int"))
        LogReg.train(docs, "doc_id", "text", "y",
            dim = 256, lr = 1.0, iters = 3)
          .select(col("bucket"), (round(col("w"), 4) + lit(0.0)).as("w"))
          .orderBy("bucket")
      },
      Some("WITH " + logregCtes(dim = 256, lr = "1.0", iters = 3) + "\n" +
        """SELECT bucket, round(w, 4) + 0.0 AS w
          |FROM w3 ORDER BY bucket""".stripMargin)),

    // Trained-classifier corpus gate (LogReg.train + LogReg.score):
    // the end-to-end CCNet recipe — learn the quality model from
    // labels, then score every document; featureless docs emit nulls.
    // Shares the logregCtes generator with q118 so the trajectories
    // cannot drift.
    QueryDef("q119_logreg_score",
      (s, dir) => {
        val docs = t(s, dir, "documents")
          .withColumn("y", (col("lang") === "en").cast("int"))
        val model = LogReg.train(docs, "doc_id", "text", "y",
          dim = 256, lr = 1.0, iters = 3)
        docs.select(col("doc_id"))
          .join(LogReg.score(docs, "doc_id", "text", model, dim = 256),
            Seq("doc_id"), "left")
          .select(col("doc_id"),
            (round(col("z"), 4) + lit(0.0)).as("z"),
            (round(col("p"), 4) + lit(0.0)).as("p"))
          .orderBy("doc_id")
      },
      Some("WITH " + logregCtes(dim = 256, lr = "1.0", iters = 3) + ",\n" +
        """sc AS (
          |  SELECT t.doc_id, sum(t.x * w.w) AS z
          |  FROM lxb t JOIN w3 w USING (bucket) GROUP BY t.doc_id)
          |SELECT d.doc_id, round(s.z, 4) + 0.0 AS z,
          |  round(1.0 / (1.0 + exp(-s.z)), 4) + 0.0 AS p
          |FROM documents d LEFT JOIN sc s USING (doc_id)
          |ORDER BY d.doc_id""".stripMargin)),

    // Weighted sampling without replacement (Sampling.weightedSample,
    // Efraimidis-Spirakis A-Res): 100 docs proportional to n_chars via
    // the deterministic hash-uniform draw. The cut ranks the UNROUNDED
    // ln(u)/w key (ties on doc_id); only the emitted key is rounded.
    QueryDef("q120_weighted_sample",
      (s, dir) => Sampling.weightedSample(
          t(s, dir, "documents"), "doc_id", "n_chars", k = 100)
        .select(col("doc_id"), col("n_chars"),
          (round(col("es_key"), 4) + lit(0.0)).as("es_key"))
        .orderBy("doc_id"),
      Some(s"""WITH ky AS (
             |  SELECT doc_id, n_chars,
             |    ln((${Hashing.duckPortableHash("'es:' || doc_id")}
             |        % 1000000 + 0.5) / 1000000.0)
             |      / CAST(n_chars AS DOUBLE) AS es_key
             |  FROM documents
             |  WHERE n_chars IS NOT NULL AND n_chars > 0),
             |top AS (SELECT * FROM ky ORDER BY es_key DESC, doc_id
             |        LIMIT 100)
             |SELECT doc_id, n_chars, round(es_key, 4) + 0.0 AS es_key
             |FROM top ORDER BY doc_id""".stripMargin)),

    // Johnson-Lindenstrauss projection (Similarity.jlProject): every
    // embedding onto 16 +/-1 hyperplanes from the shared md5 sign
    // universe, scaled 1/sqrt(16) (exact), plus the ||y||/||x|| norm
    // ratio JL preserves. Both engines sum left-to-right in double.
    QueryDef("q121_jl_project",
      (s, dir) => Similarity.jlProject(
          t(s, dir, "embeddings"), "vec_id", "embedding", m = 16, dim = 64)
        // (vec_id, pos, proj) rows, not a raw array column: the driver's
        // comparator sorts rows in pandas and cannot hash ndarray cells
        // (r9 lesson; q122's shape).
        .select(col("vec_id"), col("norm_ratio"), posexplode(col("proj")))
        .select(col("vec_id"), (col("pos") + 1).cast("int").as("pos"),
          col("col").as("proj"), col("norm_ratio"))
        .orderBy("vec_id", "pos"),
      Some("""WITH pr AS (
             |  SELECT vec_id,
             |    list_transform(generate_series(0, 15), p ->
             |      list_sum(list_transform(embedding, (v, i) ->
             |        CAST(v AS DOUBLE) * (CASE WHEN
             |          CAST(('0x' || substr(md5(CAST(p AS VARCHAR) || ':' ||
             |            CAST(i - 1 AS VARCHAR)), 1, 15)) AS BIGINT) & 1 = 1
             |          THEN 1.0 ELSE -1.0 END))) / 4.0) AS y,
             |    sqrt(list_sum(list_transform(embedding, v ->
             |      CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))) AS xn
             |  FROM embeddings),
             |ps AS (SELECT unnest(generate_series(1, 16)) AS pos)
             |SELECT pr.vec_id, CAST(ps.pos AS INT) AS pos,
             |  round(pr.y[CAST(ps.pos AS INT)], 4) + 0.0 AS proj,
             |  CASE WHEN pr.xn > 0 THEN
             |    round(sqrt(list_sum(list_transform(pr.y, e -> e * e)))
             |      / pr.xn, 4) + 0.0 END AS norm_ratio
             |FROM pr CROSS JOIN ps ORDER BY vec_id, pos""".stripMargin)),

    // PCA top component (Pca.topComponent): 3 power-iteration rounds
    // over the centered embeddings; the oracle replays the identical
    // trajectory including the deterministic sign-universe init, so
    // the component's SIGN is pinned too.
    QueryDef("q122_pca_component",
      (s, dir) => Pca.topComponent(
          t(s, dir, "embeddings"), "embedding", dim = 64, iters = 3)
        .select(col("pos"),
          (round(col("mu"), 4) + lit(0.0)).as("mu"),
          (round(col("loading"), 4) + lit(0.0)).as("loading"))
        .orderBy("pos"),
      Some("WITH " + pcaCtes(dim = 64, iters = 3) + "\n" +
        """SELECT CAST(p.pos AS INT) AS pos, round(mu.m, 4) + 0.0 AS mu,
          |  round(v.vl[CAST(p.pos AS INT)], 4) + 0.0 AS loading
          |FROM poss p JOIN pmu mu USING (pos) CROSS JOIN pv3 v
          |ORDER BY pos""".stripMargin)),

    // All-but-the-top (Pca.removeTop): x' = x - mu - ((x - mu).v) v
    // under the q122-fitted component — the anisotropy correction
    // before cosine retrieval. Shares pcaCtes so the two trajectories
    // cannot drift.
    QueryDef("q123_remove_top",
      (s, dir) => Pca.removeTop(
          t(s, dir, "embeddings"), "vec_id", "embedding",
          dim = 64, iters = 3)
        // flatten to (vec_id, pos, resid) rows — see q121's comment
        .select(col("vec_id"), posexplode(col("resid")))
        .select(col("vec_id"), (col("pos") + 1).cast("int").as("pos"),
          col("col").as("resid"))
        .orderBy("vec_id", "pos"),
      Some("WITH " + pcaCtes(dim = 64, iters = 3) + ",\n" +
        """px AS (SELECT e.vec_id, e.embedding,
          |    list_sum(list_transform(e.embedding, (x, j) ->
          |      CAST(x AS DOUBLE) * v.vl[j]))
          |    - list_sum(list_transform(m.ml, (mm, j) -> mm * v.vl[j]))
          |      AS s
          |  FROM embeddings e CROSS JOIN pv3 v CROSS JOIN pml m
          |  WHERE len(e.embedding) = 64)
          |SELECT p.vec_id, CAST(ps.pos AS INT) AS pos,
          |  round(CAST(p.embedding[CAST(ps.pos AS INT)] AS DOUBLE)
          |    - m.ml[CAST(ps.pos AS INT)]
          |    - p.s * v.vl[CAST(ps.pos AS INT)], 4) + 0.0 AS resid
          |FROM px p CROSS JOIN pml m CROSS JOIN pv3 v CROSS JOIN poss ps
          |ORDER BY p.vec_id, pos""".stripMargin)),

    // Forward-fill (Rolling.forwardFill, R na.locf): deterministic
    // gaps punched at event_id % 3 != 0, then per-user last-non-null
    // carry ordered by event_id (unique within user — ts alone ties
    // at nanos the engines truncate differently). Values pass through
    // untouched, so the copied doubles hash exactly.
    QueryDef("q124_forward_fill",
      (s, dir) => {
        val gapped = t(s, dir, "events")
          .select(col("event_id"), col("user_id"),
            when(pmod(col("event_id"), lit(3L)) === 0, col("value"))
              .as("v"))
        Rolling.forwardFill(gapped, Seq("user_id"), Seq("event_id"),
            Seq("v"))
          .withColumnRenamed("v", "filled")
          .orderBy("event_id")
      },
      Some("""WITH g AS (
             |  SELECT event_id, user_id,
             |    CASE WHEN event_id % 3 = 0 THEN value END AS v
             |  FROM events)
             |SELECT event_id, user_id,
             |  last_value(v IGNORE NULLS) OVER (
             |    PARTITION BY user_id ORDER BY event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |    AS filled
             |FROM g ORDER BY event_id""".stripMargin)),

    // Pivot / crosstab (dplyr pivot_wider): per-source doc count and
    // total chars crossed by an EXPLICIT lang list — never let pivot
    // scan for distinct values (that is a blocking extra corpus pass
    // at 100 TB and a nondeterministic schema). All-integer cells, so
    // nothing floats; absent combos coalesce to count 0 / sum null on
    // both engines.
    QueryDef("q125_pivot_wider",
      (s, dir) => {
        val langs = Seq("de", "en", "es", "fr", "zh")
        val base = t(s, dir, "documents")
          .groupBy("source").pivot("lang", langs)
          .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"))
        langs.foldLeft(base) { (d, l) =>
          d.withColumn(s"${l}_n", coalesce(col(s"${l}_n"), lit(0L)))
        }.orderBy("source")
      },
      Some("""SELECT source,""" +
        Seq("de", "en", "es", "fr", "zh").map { l =>
          s"""
             |  count(CASE WHEN lang = '$l' THEN 1 END) AS ${l}_n,
             |  CAST(sum(CASE WHEN lang = '$l' THEN n_chars END) AS BIGINT)
             |    AS ${l}_chars,""".stripMargin
        }.mkString.dropRight(1) + """
        |FROM documents GROUP BY source ORDER BY source""".stripMargin)),

    // Unpivot / melt (dplyr pivot_longer): the wide per-source lang
    // counts back to long (source, lang, n) — the pivot round-trip,
    // with absent combos kept as explicit zeros. `Dataset.unpivot` is
    // a zero-shuffle Expand over the already-aggregated wide frame.
    QueryDef("q126_unpivot_longer",
      (s, dir) => {
        val langs = Seq("de", "en", "es", "fr", "zh")
        t(s, dir, "documents")
          .groupBy("source").pivot("lang", langs).agg(count(lit(1)))
          .unpivot(Array(col("source")), langs.map(col).toArray,
            "lang", "n")
          .select(col("source"), col("lang"),
            coalesce(col("n"), lit(0L)).as("n"))
          .orderBy("source", "lang")
      },
      Some("""WITH src AS (SELECT DISTINCT source FROM documents),
             |lg AS (SELECT unnest(['de','en','es','fr','zh']) AS lang),
             |c AS (SELECT source, lang, count(*) AS n FROM documents
             |      GROUP BY source, lang)
             |SELECT s.source, l.lang, CAST(coalesce(c.n, 0) AS BIGINT) AS n
             |FROM src s CROSS JOIN lg l
             |LEFT JOIN c ON c.source = s.source AND c.lang = l.lang
             |ORDER BY s.source, l.lang""".stripMargin)),

    // Snapshot diff (SnapshotDiff.diff, the CDC/SCD audit): v2 derives
    // deterministically from v1 (drop id%10=0, append " v2" to text at
    // id%7=0, re-add id%13=0 under shifted ids) and every key is
    // classified added/removed/changed/unchanged via the portable
    // content fingerprint full-outer join.
    QueryDef("q127_snapshot_diff",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val v2 = docs.filter(pmod(col("doc_id"), lit(10L)) =!= 0)
          .withColumn("text",
            when(pmod(col("doc_id"), lit(7L)) === 0,
              concat(col("text"), lit(" v2"))).otherwise(col("text")))
          .unionByName(docs.filter(pmod(col("doc_id"), lit(13L)) === 0)
            .withColumn("doc_id", col("doc_id") + lit(10000000L)))
        SnapshotDiff.diff(docs, v2, "doc_id",
          Seq("text", "lang", "source")).orderBy("doc_id")
      },
      Some(s"""WITH newv AS (
             |  SELECT doc_id,
             |    CASE WHEN doc_id % 7 = 0 THEN text || ' v2'
             |      ELSE text END AS text, lang, source
             |  FROM documents WHERE doc_id % 10 <> 0
             |  UNION ALL
             |  SELECT doc_id + 10000000, text, lang, source
             |  FROM documents WHERE doc_id % 13 = 0),
             |ofp AS (SELECT doc_id,
             |    ${SnapshotDiff.duckFingerprint(
                      Seq("text", "lang", "source"))} AS fp
             |  FROM documents),
             |nfp AS (SELECT doc_id,
             |    ${SnapshotDiff.duckFingerprint(
                      Seq("text", "lang", "source"))} AS fp
             |  FROM newv)
             |SELECT doc_id,
             |  CASE WHEN o.fp IS NULL THEN 'added'
             |       WHEN n.fp IS NULL THEN 'removed'
             |       WHEN o.fp <> n.fp THEN 'changed'
             |       ELSE 'unchanged' END AS status
             |FROM ofp o FULL OUTER JOIN nfp n USING (doc_id)
             |ORDER BY doc_id""".stripMargin)),

    // Quality-aware cluster canonicalization (Components
    // .canonicalPerCluster): per near-dup cluster keep the LONGEST
    // member (ties to min id) — integer ordering, fully deterministic.
    // Shares minhashVerifiedCtes + clusterChainCtes with q44/q61.
    QueryDef("q128_cluster_canonical",
      (s, dir) => {
        val docs = t(s, dir, "documents").filter(col("doc_id") < 1000)
        val pairs = Dedup.minhashNearDups(docs, "doc_id", "text",
          k = 64, bands = 8, threshold = 0.8)
        val clusters = Components.dedupClusters(
          docs, "doc_id", pairs, "id_a", "id_b")
        Components.canonicalPerCluster(clusters, "doc_id",
          docs, "n_chars").orderBy("component")
      },
      Some("WITH RECURSIVE " + minhashVerifiedCtes + ",\n" +
        clusterChainCtes + ",\n" +
        """kp AS (
          |  SELECT comp.component, sizes.cluster_size, comp.id,
          |    d.n_chars,
          |    row_number() OVER (PARTITION BY comp.component
          |      ORDER BY d.n_chars DESC, comp.id) AS rn
          |  FROM comp JOIN sizes USING (component)
          |  JOIN documents d ON d.doc_id = comp.id)
          |SELECT component, cluster_size, id AS keep_id,
          |  n_chars AS keep_n_chars
          |FROM kp WHERE rn = 1 ORDER BY component""".stripMargin)),

    // Token-distribution drift between corpus versions (the q127
    // release-audit continued): unigram frequencies of v1 (all docs)
    // vs v2 (the q127 mutation), top-20 movers by |ppm delta| — all
    // integer arithmetic (floor-divided parts-per-million), ties on
    // token.
    QueryDef("q129_token_drift",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val v2 = docs.filter(pmod(col("doc_id"), lit(10L)) =!= 0)
          .withColumn("text",
            when(pmod(col("doc_id"), lit(7L)) === 0,
              concat(col("text"), lit(" v2"))).otherwise(col("text")))
        def dist(df: DataFrame, cnt: String, ppm: String) = {
          val c = df.select(explode(TextAnalysis.tokens(col("text")))
              .as("token"))
            .groupBy("token").agg(count(lit(1)).as(cnt))
          c.crossJoin(broadcast(
              c.agg(sum(cnt).cast("long").as(s"_t$cnt"))))
            .select(col("token"), col(cnt),
              floor(col(cnt) * lit(1000000L) / col(s"_t$cnt"))
                .cast("long").as(ppm))
        }
        val a = dist(docs, "n1", "ppm1")
        val b = dist(v2, "n2", "ppm2")
        a.join(b, Seq("token"), "full_outer")
          .select(col("token"),
            coalesce(col("n1"), lit(0L)).as("n1"),
            coalesce(col("n2"), lit(0L)).as("n2"),
            (coalesce(col("ppm2"), lit(0L)) -
              coalesce(col("ppm1"), lit(0L))).as("ppm_delta"))
          .orderBy(abs(col("ppm_delta")).desc, col("token"))
          .limit(20)
          .orderBy("token")
      },
      Some("""WITH v2 AS (
             |  SELECT doc_id,
             |    CASE WHEN doc_id % 7 = 0 THEN text || ' v2'
             |      ELSE text END AS text
             |  FROM documents WHERE doc_id % 10 <> 0),
             |t1 AS (SELECT unnest(list_filter(
             |    string_split_regex(text, ' +'), t -> t <> '')) AS token
             |  FROM documents),
             |t2 AS (SELECT unnest(list_filter(
             |    string_split_regex(text, ' +'), t -> t <> '')) AS token
             |  FROM v2),
             |c1 AS (SELECT token, count(*) AS n1,
             |    CAST(floor(count(*) * 1000000 /
             |      (SELECT count(*) FROM t1)) AS BIGINT) AS ppm1
             |  FROM t1 GROUP BY token),
             |c2 AS (SELECT token, count(*) AS n2,
             |    CAST(floor(count(*) * 1000000 /
             |      (SELECT count(*) FROM t2)) AS BIGINT) AS ppm2
             |  FROM t2 GROUP BY token),
             |j AS (
             |  SELECT token, coalesce(n1, 0) AS n1, coalesce(n2, 0) AS n2,
             |    coalesce(ppm2, 0) - coalesce(ppm1, 0) AS ppm_delta
             |  FROM c1 FULL OUTER JOIN c2 USING (token)),
             |top AS (SELECT * FROM j
             |        ORDER BY abs(ppm_delta) DESC, token LIMIT 20)
             |SELECT token, n1, n2, ppm_delta FROM top
             |ORDER BY token""".stripMargin)),

    // REAL content features for codec-free payloads (Multimodal
    // .contentFeatures): 2x2 24-bit BMPs carry actual pixel bytes
    // ((id*(k+3)) % 256 at file position k) and WAVs carry 4 real
    // 16-bit PCM samples ((id*(k+7)) % 65536, signed LE) — the JVM
    // walks the REAL pixel array (bfOffBits + row padding) and PCM
    // data; the oracle recomputes channel means / RMS / peak from the
    // generating formulas, q68's synthesis pattern.
    QueryDef("q130_media_content_stats",
      (s, dir) => {
        def le4hex(n: Column): Column = concat((0 to 3).map(i =>
          lpad(hex(pmod(shiftright(n, 8 * i), lit(256))), 2, "0")): _*)
        def b1hex(n: Column): Column = lpad(hex(pmod(n, lit(256))), 2, "0")
        val ids = t(s, dir, "documents")
          .select(col("doc_id").cast("long").as("id"))
        val px = concat((0 to 5).map(k =>
          b1hex(col("id") * (k + 3))) ++ Seq(lit("0000")) ++
          (6 to 11).map(k => b1hex(col("id") * (k + 3))) ++
          Seq(lit("0000")): _*)
        val bmp = ids.filter(pmod(col("id"), lit(2)) === 0).select(
          col("id"),
          unhex(concat(
            lit("424D" + "00" * 8 + "36000000" + "28000000"),
            le4hex(lit(2)), le4hex(lit(2)), lit("0100" + "1800"),
            lit("00" * 24), px)).as("bytes"),
          lit("image").as("media_type"))
        val pcm = concat((0 to 3).flatMap { k =>
          val v = pmod(col("id") * (k + 7), lit(65536))
          Seq(b1hex(v), b1hex(floor(v / 256).cast("long")))
        }: _*)
        val wav = ids.filter(pmod(col("id"), lit(2)) === 1).select(
          col("id"),
          unhex(concat(
            lit("52494646"), le4hex(lit(44)), // riff size 36+8
            lit("57415645" + "666D7420" + "10000000" + "0100" + "0100"),
            le4hex(lit(8000)), le4hex(lit(16000)),
            lit("0200" + "1000" + "64617461"), le4hex(lit(8)),
            pcm)).as("bytes"),
          lit("audio").as("media_type"))
        Multimodal.contentFeatures(s, bmp.unionByName(wav))
          .orderBy("id")
      },
      Some("""WITH sk AS (
             |  SELECT doc_id AS id,
             |    list_transform(generate_series(0, 3), k ->
             |      CASE WHEN (id * (k + 7)) % 65536 >= 32768
             |        THEN (id * (k + 7)) % 65536 - 65536
             |        ELSE (id * (k + 7)) % 65536 END) AS s,
             |    list_transform(generate_series(0, 11), k ->
             |      (id * (k + 3)) % 256) AS p
             |  FROM documents)
             |SELECT id,
             |  CASE WHEN id % 2 = 0 THEN 'bmp' ELSE 'wav' END AS kind,
             |  round(CASE WHEN id % 2 = 0
             |    THEN (p[1] + p[4] + p[7] + p[10]) / 4.0
             |    ELSE sqrt((s[1]*s[1] + s[2]*s[2] + s[3]*s[3] + s[4]*s[4])
             |      / 4.0) END, 4) + 0.0 AS f1,
             |  round(CASE WHEN id % 2 = 0
             |    THEN (p[2] + p[5] + p[8] + p[11]) / 4.0
             |    ELSE CAST(greatest(abs(s[1]), abs(s[2]), abs(s[3]),
             |      abs(s[4])) AS DOUBLE) END, 4) + 0.0 AS f2,
             |  round(CASE WHEN id % 2 = 0
             |    THEN (p[3] + p[6] + p[9] + p[12]) / 4.0
             |    ELSE 4.0 END, 4) + 0.0 AS f3
             |FROM sk ORDER BY id""".stripMargin)),

    // k-per-stratum deterministic reservoir (Sampling
    // .reservoirPerGroup): 5 docs per language, hash-ranked, with the
    // 10% hash prune running BEFORE the per-stratum window. The window
    // ranks by the same `h mod 1e6` the prune filters on (r9 ADVICE),
    // so the prune provably keeps every drawn row; the oracle applies
    // the identical prune + ordering.
    QueryDef("q131_group_reservoir",
      (s, dir) => Sampling.reservoirPerGroup(
          t(s, dir, "documents").select("doc_id", "lang"),
          "doc_id", "lang", k = 5, prunePpm = 100000)
        .select(col("lang"), col("draw_rank"), col("doc_id"))
        .orderBy("lang", "draw_rank"),
      Some(s"""WITH h AS (
             |  SELECT doc_id, lang,
             |    ${Hashing.duckPortableHash("'rg:' || doc_id")} AS hv
             |  FROM documents),
             |pruned AS (SELECT * FROM h WHERE hv % 1000000 < 100000),
             |r AS (
             |  SELECT lang, doc_id,
             |    CAST(row_number() OVER (PARTITION BY lang
             |      ORDER BY hv % 1000000, hv, doc_id) AS INT) AS draw_rank
             |  FROM pruned)
             |SELECT lang, draw_rank, doc_id FROM r
             |WHERE draw_rank <= 5 ORDER BY lang, draw_rank""".stripMargin)),

    // JL-shortlist ANN (Similarity.jlTopK): cosine pre-rank in the
    // 32-dim projected space, top-200 shortlist (measured recall@3 =
    // 0.70 at these defaults), exact re-rank to top-3 — the
    // cheap-distance tier next to LSH (q45) and IVF (q52). The
    // shortlist cut ranks UNROUNDED projected cosines (ties on
    // neighbor_id), the q114 pattern.
    QueryDef("q132_jl_ann_topk",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.jlTopK(emb, emb.filter(col("vec_id") < 10),
          "vec_id", "embedding", k = 3)
          .orderBy("query_id", "rank")
      },
      Some(s"""WITH jp AS (
             |  SELECT vec_id, embedding,
             |    list_transform(generate_series(0, 31), p ->
             |      list_sum(list_transform(embedding, (v, i) ->
             |        CAST(v AS DOUBLE) * (CASE WHEN
             |          CAST(('0x' || substr(md5(CAST(p AS VARCHAR) || ':' ||
             |            CAST(i - 1 AS VARCHAR)), 1, 15)) AS BIGINT) & 1 = 1
             |          THEN 1.0 ELSE -1.0 END))) / sqrt(32.0)) AS y
             |  FROM embeddings),
             |qs AS (SELECT vec_id AS query_id, embedding AS qvec, y AS qy
             |       FROM jp WHERE vec_id < 10),
             |pc AS (
             |  SELECT c.vec_id AS neighbor_id, q.query_id,
             |    c.embedding AS cvec, q.qvec,
             |    list_sum(list_transform(q.qy, (x, i) -> x * c.y[i])) /
             |    (sqrt(list_sum(list_transform(q.qy, x -> x * x))) *
             |     sqrt(list_sum(list_transform(c.y, x -> x * x)))) AS pcos
             |  FROM jp c CROSS JOIN qs q WHERE c.vec_id <> q.query_id),
             |sl AS (SELECT * FROM (
             |    SELECT *, row_number() OVER (PARTITION BY query_id
             |      ORDER BY pcos DESC, neighbor_id) AS prank FROM pc)
             |  WHERE prank <= 200),
             |ex AS (SELECT query_id, neighbor_id,
             |    ${duckCos("qvec", "cvec")} AS cos
             |  FROM sl),
             |r AS (SELECT query_id, neighbor_id,
             |    CAST(row_number() OVER (PARTITION BY query_id
             |      ORDER BY cos DESC, neighbor_id) AS INT) AS "rank", cos
             |  FROM ex)
             |SELECT query_id, neighbor_id, "rank", round(cos, 4) AS cos
             |FROM r WHERE "rank" <= 3 ORDER BY query_id, "rank"""".stripMargin)),

    // Grouped OLS (Stats.groupedOls): per-language token-vs-chars
    // line fit from ONE integer moment aggregate — the six sums are
    // exact in both engines, so every downstream float matches.
    QueryDef("q133_grouped_ols",
      (s, dir) => Stats.groupedOls(
          t(s, dir, "documents").withColumn("n_tokens",
            size(TextAnalysis.tokens(col("text")))),
          "lang", "n_chars", "n_tokens")
        .orderBy("lang"),
      Some("""WITH d AS (
             |  SELECT lang, n_chars AS x,
             |    len(list_filter(string_split_regex(text, ' +'),
             |      t -> t <> '')) AS y
             |  FROM documents),
             |a AS (
             |  SELECT lang, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
             |    sum(x * x) AS sxx, sum(x * y) AS sxy, sum(y * y) AS syy
             |  FROM d GROUP BY lang),
             |c AS (
             |  SELECT lang, n,
             |    CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
             |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS covn,
             |    CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
             |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS varxn,
             |    CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
             |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS varyn,
             |    CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
             |  FROM a)
             |SELECT lang, n,
             |  round(CASE WHEN n >= 2 AND varxn > 0
             |    THEN covn / varxn END, 4) + 0.0 AS slope,
             |  round((syd - (CASE WHEN n >= 2 AND varxn > 0
             |      THEN covn / varxn END) * sxd)
             |    / CAST(n AS DOUBLE), 4) + 0.0 AS intercept,
             |  round(CASE WHEN n >= 2 AND varxn > 0 AND varyn > 0
             |    THEN covn * covn / (varxn * varyn) END, 4) + 0.0 AS r2
             |FROM c ORDER BY lang""".stripMargin)),

    // Weekly cohort retention (Stats.cohortRetention): first-event
    // epoch week x weeks-since distinct-user triangle — all integer
    // division (no calendar functions), the oracle mirrors parquet's
    // nanos -> micros truncation via epoch_ns // 1000.
    QueryDef("q134_cohort_retention",
      (s, dir) => Stats.cohortRetention(
          t(s, dir, "events"), "user_id", "ts")
        .orderBy("cohort_week", "weeks_since"),
      Some("""WITH w AS (
             |  SELECT user_id AS u,
             |    epoch_ns(ts) // 1000 // 604800000000 AS wk
             |  FROM events),
             |f AS (SELECT u, min(wk) AS cw FROM w GROUP BY u)
             |SELECT cw AS cohort_week, wk - cw AS weeks_since,
             |  count(DISTINCT u) AS n_users
             |FROM w JOIN f USING (u)
             |GROUP BY cw, wk - cw
             |ORDER BY cohort_week, weeks_since""".stripMargin)),

    // Lexical diversity (TextAnalysis.lexicalDiversity): per-doc token
    // entropy H = ln(n) - (sum tf ln tf)/n and type-token ratio —
    // low-diversity (stuffed/boilerplate) docs surface at the bottom.
    QueryDef("q135_lexical_diversity",
      (s, dir) => TextAnalysis.lexicalDiversity(
          t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id"),
      Some("""WITH tf AS (
             |  SELECT doc_id, token, count(*) AS tf FROM (
             |    SELECT doc_id, unnest(list_filter(
             |      string_split_regex(text, ' +'), t -> t <> '')) AS token
             |    FROM documents)
             |  GROUP BY doc_id, token),
             |per AS (
             |  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
             |    count(*) AS n_types,
             |    sum(CAST(tf AS DOUBLE) * ln(CAST(tf AS DOUBLE))) AS stlt
             |  FROM tf GROUP BY doc_id)
             |SELECT d.doc_id,
             |  coalesce(p.n_tokens, 0) AS n_tokens,
             |  coalesce(p.n_types, 0) AS n_types,
             |  round(CAST(p.n_types AS DOUBLE)
             |    / CAST(p.n_tokens AS DOUBLE), 4) + 0.0 AS ttr,
             |  round(ln(CAST(p.n_tokens AS DOUBLE))
             |    - p.stlt / CAST(p.n_tokens AS DOUBLE), 4) + 0.0 AS entropy
             |FROM documents d LEFT JOIN per p USING (doc_id)
             |ORDER BY d.doc_id""".stripMargin)),

    // ROLLUP subtotals (Dataset.rollup): per-(source, lang) counts
    // with per-source and grand-total rows in ONE pass (Catalyst
    // Expand — no second scan, no union of re-aggregations). NULL
    // group keys mark subtotal rows; the ORDER BY pins null placement
    // explicitly because the engines' defaults differ.
    QueryDef("q136_rollup_subtotals",
      (s, dir) => t(s, dir, "documents")
        .rollup("source", "lang")
        .agg(count(lit(1)).as("n"), sum("n_chars").as("chars"))
        .orderBy(col("source").asc_nulls_first, col("lang").asc_nulls_first),
      Some("""SELECT source, lang, count(*) AS n,
             |  CAST(sum(n_chars) AS BIGINT) AS chars
             |FROM documents GROUP BY ROLLUP (source, lang)
             |ORDER BY source NULLS FIRST, lang NULLS FIRST""".stripMargin)),

    // Multiset set ops (Dataset.exceptAll / intersectAll): bag
    // semantics with multiplicity (EXCEPT ALL keeps count differences,
    // INTERSECT ALL keeps the min count) — Spark plans both as a
    // single Expand+aggregate, no join. Aggregated per source so the
    // emitted frame is deterministic.
    QueryDef("q137_multiset_ops",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val en = docs.filter(col("lang") === "en").select("source")
        val fr = docs.filter(col("lang") === "fr").select("source")
        en.exceptAll(fr).groupBy("source").agg(count(lit(1)).as("n_except"))
          .join(en.intersectAll(fr).groupBy("source")
            .agg(count(lit(1)).as("n_intersect")), Seq("source"), "full_outer")
          .select(col("source"),
            coalesce(col("n_except"), lit(0L)).as("n_except"),
            coalesce(col("n_intersect"), lit(0L)).as("n_intersect"))
          .orderBy("source")
      },
      Some("""WITH ex AS (
             |  SELECT source, count(*) AS n_except FROM (
             |    SELECT source FROM documents WHERE lang = 'en'
             |    EXCEPT ALL
             |    SELECT source FROM documents WHERE lang = 'fr')
             |  GROUP BY source),
             |ix AS (
             |  SELECT source, count(*) AS n_intersect FROM (
             |    SELECT source FROM documents WHERE lang = 'en'
             |    INTERSECT ALL
             |    SELECT source FROM documents WHERE lang = 'fr')
             |  GROUP BY source)
             |SELECT source, coalesce(n_except, 0) AS n_except,
             |  coalesce(n_intersect, 0) AS n_intersect
             |FROM ex FULL OUTER JOIN ix USING (source)
             |ORDER BY source""".stripMargin)),

    // Event-transition matrix (first-order Markov counts): per-user
    // lag window (partitioned — never global), transition counts and
    // integer-ppm row-conditional probabilities (floor-divided, the
    // q87 discipline).
    QueryDef("q138_event_transitions",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("event_id")
        val tr = t(s, dir, "events")
          .select(col("user_id"), col("event_id"), col("event_type"))
          .withColumn("prev_type", lag("event_type", 1).over(w))
          .filter(col("prev_type").isNotNull)
          .groupBy(col("prev_type"), col("event_type").as("cur_type"))
          .agg(count(lit(1)).as("n"))
        val tot = tr.groupBy("prev_type").agg(sum("n").as("n_prev"))
        tr.join(tot, Seq("prev_type"))
          .select(col("prev_type"), col("cur_type"), col("n"),
            floor(col("n") * lit(1000000L) / col("n_prev")).cast("long")
              .as("p_ppm"))
          .orderBy("prev_type", "cur_type")
      },
      Some("""WITH tr AS (
             |  SELECT prev_type, event_type AS cur_type, count(*) AS n
             |  FROM (
             |    SELECT user_id, event_type,
             |      lag(event_type) OVER (PARTITION BY user_id
             |        ORDER BY event_id) AS prev_type
             |    FROM events)
             |  WHERE prev_type IS NOT NULL
             |  GROUP BY prev_type, cur_type),
             |tot AS (SELECT prev_type, sum(n) AS n_prev FROM tr
             |        GROUP BY prev_type)
             |SELECT t.prev_type, t.cur_type, t.n,
             |  CAST(floor(t.n * 1000000 / tt.n_prev) AS BIGINT) AS p_ppm
             |FROM tr t JOIN tot tt USING (prev_type)
             |ORDER BY t.prev_type, t.cur_type""".stripMargin)),

    // Script profile (TextAnalysis.scriptProfile): explicit-codepoint-
    // range character counts + dominant script — all integers, the
    // literal ranges (not \p classes) are engine-version-proof.
    QueryDef("q139_script_profile",
      (s, dir) => TextAnalysis.scriptProfile(
          t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
             |    AS n_latin,
             |  length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit,
             |  length(regexp_replace(text, '[^一-鿿]', '', 'g')) AS n_cjk,
             |  length(regexp_replace(text, '[^Ѐ-ӿ]', '', 'g')) AS n_cyr,
             |  CASE
             |    WHEN length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
             |      >= length(regexp_replace(text, '[^0-9]', '', 'g'))
             |     AND length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
             |      >= length(regexp_replace(text, '[^一-鿿]', '', 'g'))
             |     AND length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
             |      >= length(regexp_replace(text, '[^Ѐ-ӿ]', '', 'g'))
             |    THEN 'latin'
             |    WHEN length(regexp_replace(text, '[^0-9]', '', 'g'))
             |      >= length(regexp_replace(text, '[^一-鿿]', '', 'g'))
             |     AND length(regexp_replace(text, '[^0-9]', '', 'g'))
             |      >= length(regexp_replace(text, '[^Ѐ-ӿ]', '', 'g'))
             |    THEN 'digit'
             |    WHEN length(regexp_replace(text, '[^一-鿿]', '', 'g'))
             |      >= length(regexp_replace(text, '[^Ѐ-ӿ]', '', 'g'))
             |    THEN 'cjk'
             |    ELSE 'cyrillic' END AS dominant
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Multi-component PCA by deflation (Pca.topComponents): three
    // components, each a full q122 power-iteration stage on the
    // previous stage's residual frame — the whitening basis for
    // all-but-the-top-K. Oracle = three chained pcaCtes stages joined
    // by the shared deflation generator.
    QueryDef("q140_pca_components",
      (s, dir) => Pca.topComponents(
          t(s, dir, "embeddings"), "embedding", dim = 64, iters = 3, k = 3)
        .select(col("component"), col("pos"),
          (round(col("loading"), 4) + lit(0.0)).as("loading"))
        .orderBy("component", "pos"),
      Some("WITH " + pcaCtes(64, 3) + ",\n" +
        pcaDeflCtes("", 3, "defl") + ",\n" +
        pcaCtes(64, 3, "d", "defl") + ",\n" +
        pcaDeflCtes("d", 3, "defl2") + ",\n" +
        pcaCtes(64, 3, "dd", "defl2") + "\n" +
        """SELECT 1 AS component, CAST(p.pos AS INT) AS pos,
          |  round(v.vl[CAST(p.pos AS INT)], 4) + 0.0 AS loading
          |FROM poss p CROSS JOIN pv3 v
          |UNION ALL
          |SELECT 2, CAST(p.pos AS INT),
          |  round(v.vl[CAST(p.pos AS INT)], 4) + 0.0
          |FROM dposs p CROSS JOIN dpv3 v
          |UNION ALL
          |SELECT 3, CAST(p.pos AS INT),
          |  round(v.vl[CAST(p.pos AS INT)], 4) + 0.0
          |FROM ddposs p CROSS JOIN ddpv3 v
          |ORDER BY component, pos""".stripMargin)),

    // CUBE with grouping flags (Dataset.cube + grouping()): all four
    // aggregation levels in one Expand pass, each row tagged with
    // which keys are subtotaled — the OLAP surface next to q136's
    // ROLLUP. The flag computes from grouping() per column so the
    // engines' grouping_id bit orders cannot disagree.
    QueryDef("q141_cube_grouping",
      (s, dir) => t(s, dir, "documents")
        .cube("source", "lang")
        .agg(count(lit(1)).as("n"),
          (grouping(col("source")).cast("int") * 2 +
            grouping(col("lang")).cast("int")).as("gflag"))
        .select("source", "lang", "n", "gflag")
        .orderBy(col("gflag"), col("source").asc_nulls_first,
          col("lang").asc_nulls_first),
      Some("""SELECT source, lang, count(*) AS n,
             |  CAST(GROUPING(source) * 2 + GROUPING(lang) AS INT) AS gflag
             |FROM documents GROUP BY CUBE (source, lang)
             |ORDER BY gflag, source NULLS FIRST, lang NULLS FIRST"""
        .stripMargin)),

    // Left semi / anti joins (the EXISTS / NOT EXISTS surface): orders
    // split by whether any line item exceeds the price threshold —
    // both planned as one-sided joins that never materialize the
    // probe side's columns.
    QueryDef("q142_semi_anti_join",
      (s, dir) => {
        val orders = t(s, dir, "orders")
        val big = t(s, dir, "lineitem")
          .filter(col("l_extendedprice") > 40000)
          .select(col("l_orderkey").as("o_orderkey"))
        val semi = orders.join(big, Seq("o_orderkey"), "left_semi")
          .groupBy("o_orderstatus").agg(count(lit(1)).as("n_with"))
        val anti = orders.join(big, Seq("o_orderkey"), "left_anti")
          .groupBy("o_orderstatus").agg(count(lit(1)).as("n_without"))
        semi.join(anti, Seq("o_orderstatus"), "full_outer")
          .select(col("o_orderstatus"),
            coalesce(col("n_with"), lit(0L)).as("n_with"),
            coalesce(col("n_without"), lit(0L)).as("n_without"))
          .orderBy("o_orderstatus")
      },
      Some("""WITH sw AS (
             |  SELECT o_orderstatus, count(*) AS n_with FROM orders o
             |  WHERE EXISTS (SELECT 1 FROM lineitem l
             |    WHERE l.l_orderkey = o.o_orderkey
             |      AND l.l_extendedprice > 40000)
             |  GROUP BY o_orderstatus),
             |an AS (
             |  SELECT o_orderstatus, count(*) AS n_without FROM orders o
             |  WHERE NOT EXISTS (SELECT 1 FROM lineitem l
             |    WHERE l.l_orderkey = o.o_orderkey
             |      AND l.l_extendedprice > 40000)
             |  GROUP BY o_orderstatus)
             |SELECT o_orderstatus, coalesce(n_with, 0) AS n_with,
             |  coalesce(n_without, 0) AS n_without
             |FROM sw FULL OUTER JOIN an USING (o_orderstatus)
             |ORDER BY o_orderstatus""".stripMargin)),

    // Exact interpolated percentiles (percentile ≡ quantile_cont):
    // per-language n_chars quartiles + p95 in ONE aggregate pass —
    // the exact-percentile surface next to the approximate tier paths
    // (q85/q105). Both engines interpolate linearly over sorted
    // integers, so the emitted doubles agree exactly.
    QueryDef("q143_exact_percentiles",
      (s, dir) => t(s, dir, "documents")
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n"),
          (round(expr("percentile(n_chars, 0.25)"), 4) + lit(0.0))
            .as("p25"),
          (round(expr("percentile(n_chars, 0.5)"), 4) + lit(0.0))
            .as("p50"),
          (round(expr("percentile(n_chars, 0.75)"), 4) + lit(0.0))
            .as("p75"),
          (round(expr("percentile(n_chars, 0.95)"), 4) + lit(0.0))
            .as("p95"))
        .orderBy("lang"),
      Some("""SELECT lang, count(*) AS n,
             |  round(quantile_cont(n_chars, 0.25), 4) + 0.0 AS p25,
             |  round(quantile_cont(n_chars, 0.5), 4) + 0.0 AS p50,
             |  round(quantile_cont(n_chars, 0.75), 4) + 0.0 AS p75,
             |  round(quantile_cont(n_chars, 0.95), 4) + 0.0 AS p95
             |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)),

    // Data-quality expectations (Expectations.report, the Deequ/Great
    // Expectations publish gate): five declared constraints over
    // orders evaluated in one aggregate pass (+ one distinct pass for
    // the uniqueness grain), emitting the violation report.
    QueryDef("q144_expectations",
      (s, dir) => {
        import graft.ops.Expectations
        import graft.ops.Expectations._
        Expectations.report(t(s, dir, "orders"), Seq(
          NotNull("o_custkey"),
          Unique("o_orderkey"),
          InRange("o_totalprice", 0, 600000),
          InSet("o_orderstatus", Seq("F", "O", "P")),
          Matches("o_orderpriority", "^[1-5]-")))
          .orderBy("check")
      },
      Some("""WITH u AS (
             |SELECT 'not_null(o_custkey)' AS "check", count(*) AS n_rows,
             |  CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_violations
             |FROM orders
             |UNION ALL
             |SELECT 'unique(o_orderkey)', count(*),
             |  CAST(count(*) - count(DISTINCT o_orderkey)
             |    - (CASE WHEN count(*) > count(o_orderkey) THEN 1
             |       ELSE 0 END) AS BIGINT)
             |FROM orders
             |UNION ALL
             |SELECT 'in_range(o_totalprice)', count(*),
             |  CAST(sum(CASE WHEN o_totalprice IS NULL
             |    OR o_totalprice < 0 OR o_totalprice > 600000
             |    THEN 1 ELSE 0 END) AS BIGINT)
             |FROM orders
             |UNION ALL
             |SELECT 'in_set(o_orderstatus)', count(*),
             |  CAST(sum(CASE WHEN o_orderstatus IS NULL
             |    OR o_orderstatus NOT IN ('F', 'O', 'P')
             |    THEN 1 ELSE 0 END) AS BIGINT)
             |FROM orders
             |UNION ALL
             |SELECT 'matches(o_orderpriority)', count(*),
             |  CAST(sum(CASE WHEN o_orderpriority IS NULL
             |    OR NOT regexp_matches(o_orderpriority, '^[1-5]-')
             |    THEN 1 ELSE 0 END) AS BIGINT)
             |FROM orders)
             |SELECT "check", n_rows, n_violations,
             |  n_violations = 0 AS ok
             |FROM u ORDER BY "check"""".stripMargin)),

    // All-but-the-top-K (Pca.removeTopK): subtract the top 2 deflated
    // components from every embedding, ids kept — q123 generalized
    // through q140's deflation. Stage 2 fits on the id-carrying
    // residual frame (same values as q140's idless one).
    QueryDef("q145_remove_top_k",
      (s, dir) => Pca.removeTopK(
          t(s, dir, "embeddings"), "vec_id", "embedding",
          dim = 64, iters = 3, k = 2)
        // flatten to (vec_id, pos, resid) rows — see q121's comment
        .select(col("vec_id"), posexplode(col("resid")))
        .select(col("vec_id"), (col("pos") + 1).cast("int").as("pos"),
          col("col").as("resid"))
        .orderBy("vec_id", "pos"),
      Some("WITH " + pcaCtes(64, 3) + ",\n" +
        pcaResidCtes("", 3, "embeddings", "r1") + ",\n" +
        pcaCtes(64, 3, "d", "r1") + ",\n" +
        pcaResidCtes("d", 3, "r1", "r2") + "\n" +
        """SELECT r.vec_id, CAST(ps.pos AS INT) AS pos,
          |  round(r.embedding[CAST(ps.pos AS INT)], 4) + 0.0 AS resid
          |FROM r2 r CROSS JOIN poss ps
          |ORDER BY r.vec_id, pos""".stripMargin)),

    // Cluster naming (q61 clusters + q114 TF-IDF composed): each
    // near-dup cluster becomes one "document" (member texts
    // concatenated in DETERMINISTIC text order — scale caveat: bounded
    // by cluster size; a degenerate giant cluster would need the
    // term-level path), then top-3 characteristic terms per cluster.
    // Shares minhashVerifiedCtes + clusterChainCtes + tfidfCtes.
    QueryDef("q146_cluster_names",
      (s, dir) => {
        val docs = t(s, dir, "documents").filter(col("doc_id") < 1000)
        val pairs = Dedup.minhashNearDups(docs, "doc_id", "text",
          k = 64, bands = 8, threshold = 0.8)
        val clusters = Components.dedupClusters(
          docs, "doc_id", pairs, "id_a", "id_b")
        val ctext = clusters.join(docs, Seq("doc_id"))
          .groupBy("component")
          .agg(array_join(sort_array(collect_list(col("text"))), " ")
            .as("text"))
        TextAnalysis.tfidfTopTerms(ctext, "component", "text", k = 3)
          .orderBy("component", "rank")
      },
      Some("WITH RECURSIVE " + minhashVerifiedCtes + ",\n" +
        clusterChainCtes + ",\n" +
        """ctext AS (
          |  SELECT comp.component,
          |    string_agg(d.text, ' ' ORDER BY d.text) AS text
          |  FROM comp JOIN documents d ON d.doc_id = comp.id
          |  GROUP BY comp.component),
          |""".stripMargin +
        tfidfCtes("ctext", "component", 3) + "\n" +
        """SELECT component, "rank", term, tf, df,
          |  round(score, 4) AS tfidf
          |FROM r WHERE "rank" <= 3 ORDER BY component, "rank""""
          .stripMargin)),

    // Classifier evaluation (train -> score -> confusion matrix):
    // integer-ppm precision/recall/F1 at the z >= 0 boundary
    // (featureless docs predict negative; q87's floor-divide
    // discipline). On THIS corpus the label ("contains 'join'", 79%
    // prior) has only one informative feature, so 5 full-batch
    // rounds honestly sit at the majority-class operating point
    // (precision = prior, recall 1) — the separable-toy spec in
    // CurationOpsSpec shows the same loop separating when signal
    // exists. Shares logregCtes with q118/q119.
    QueryDef("q147_logreg_eval",
      (s, dir) => {
        val docs = t(s, dir, "documents")
          .withColumn("y",
            (instr(col("text"), "join") > 0).cast("int"))
        val model = LogReg.train(docs, "doc_id", "text", "y",
          dim = 256, lr = 5.0, iters = 5)
        val scored = docs.select(col("doc_id"), col("y"))
          .join(LogReg.score(docs, "doc_id", "text", model, dim = 256)
            .select(col("doc_id"), col("z")), Seq("doc_id"), "left")
          .select(col("y"),
            (coalesce(col("z"), lit(-1.0)) >= 0).cast("int").as("pred"))
        scored.agg(
            sum(when(col("y") === 1 && col("pred") === 1, 1L)
              .otherwise(0L)).as("tp"),
            sum(when(col("y") === 0 && col("pred") === 1, 1L)
              .otherwise(0L)).as("fp"),
            sum(when(col("y") === 0 && col("pred") === 0, 1L)
              .otherwise(0L)).as("tn"),
            sum(when(col("y") === 1 && col("pred") === 0, 1L)
              .otherwise(0L)).as("fn"))
          .select(col("tp"), col("fp"), col("tn"), col("fn"),
            when(col("tp") + col("fp") > 0,
              floor(col("tp") * lit(1000000L) / (col("tp") + col("fp")))
                .cast("long")).as("precision_ppm"),
            when(col("tp") + col("fn") > 0,
              floor(col("tp") * lit(1000000L) / (col("tp") + col("fn")))
                .cast("long")).as("recall_ppm"),
            when(lit(2L) * col("tp") + col("fp") + col("fn") > 0,
              floor(col("tp") * lit(2000000L) /
                (lit(2L) * col("tp") + col("fp") + col("fn")))
                .cast("long")).as("f1_ppm"))
      },
      Some("WITH " + logregCtes(dim = 256, lr = "5.0", iters = 5,
        label = "CASE WHEN instr(text, 'join') > 0 " +
          "THEN 1.0 ELSE 0.0 END") + ",\n" +
        """esc AS (
          |  SELECT t.doc_id, sum(t.x * w.w) AS z
          |  FROM lxb t JOIN w5 w USING (bucket) GROUP BY t.doc_id),
          |pr AS (
          |  SELECT CASE WHEN instr(d.text, 'join') > 0
          |    THEN 1 ELSE 0 END AS y,
          |    CASE WHEN coalesce(s.z, -1.0) >= 0 THEN 1 ELSE 0 END
          |      AS pred
          |  FROM documents d LEFT JOIN esc s USING (doc_id)),
          |cm AS (
          |  SELECT
          |    CAST(sum(CASE WHEN y = 1 AND pred = 1 THEN 1 ELSE 0 END)
          |      AS BIGINT) AS tp,
          |    CAST(sum(CASE WHEN y = 0 AND pred = 1 THEN 1 ELSE 0 END)
          |      AS BIGINT) AS fp,
          |    CAST(sum(CASE WHEN y = 0 AND pred = 0 THEN 1 ELSE 0 END)
          |      AS BIGINT) AS tn,
          |    CAST(sum(CASE WHEN y = 1 AND pred = 0 THEN 1 ELSE 0 END)
          |      AS BIGINT) AS fn
          |  FROM pr)
          |SELECT tp, fp, tn, fn,
          |  CAST(CASE WHEN tp + fp > 0
          |    THEN floor(tp * 1000000 / (tp + fp)) END AS BIGINT)
          |    AS precision_ppm,
          |  CAST(CASE WHEN tp + fn > 0
          |    THEN floor(tp * 1000000 / (tp + fn)) END AS BIGINT)
          |    AS recall_ppm,
          |  CAST(CASE WHEN 2 * tp + fp + fn > 0
          |    THEN floor(tp * 2000000 / (2 * tp + fp + fn)) END
          |    AS BIGINT) AS f1_ppm
          |FROM cm""".stripMargin)),

    // Directional containment pairs (Dedup.containmentPairs): the
    // quote/excerpt case Jaccard misses — |A∩B|/|A| >= 0.8 over
    // 3-gram shingles, A-prefix x B-full inverted index, EXACT
    // integer gate (10*inter >= 8*|A|) so the pair set is
    // engine-independent.
    QueryDef("q148_containment_pairs",
      (s, dir) => Dedup.containmentPairs(
          t(s, dir, "documents"), "doc_id", "text", "source",
          n = 3, threshold = 0.8)
        .orderBy("id_a", "id_b"),
      Some("""WITH csh AS (
             |  SELECT doc_id, source,
             |    list_distinct(list_transform(
             |      generate_series(1, greatest(len(tk) - 2, 0)),
             |      i -> array_to_string(list_slice(tk, i, i + 2), ' ')))
             |      AS sh
             |  FROM (SELECT doc_id, source, list_filter(
             |          string_split_regex(text, ' +'), t -> t <> '') AS tk
             |        FROM documents)),
             |cf AS (SELECT doc_id, source, sh, len(sh) AS n_sh
             |       FROM csh WHERE len(sh) > 0)
             |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |  CAST(a.n_sh AS BIGINT) AS na,
             |  CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS inter,
             |  round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             |    / a.n_sh, 4) AS containment
             |FROM cf a JOIN cf b
             |  ON a.source = b.source AND a.doc_id <> b.doc_id
             |WHERE len(list_intersect(a.sh, b.sh)) * 10 >= 8 * a.n_sh
             |ORDER BY id_a, id_b""".stripMargin)),

    // REAL pixel decode (Multimodal.contentFeatures png/gif paths):
    // even ids carry an 8x6 RGB PNG (zlib IDAT inflated with the JDK
    // Inflater, all five scanline filters inverted — filter type
    // cycles (id+y) % 5), odd ids a 7x5 GIF (pure-Scala variable-width
    // LZW, 64-color palette). The oracle never decodes: it recomputes
    // the channel means from MediaFixtures' closed-form pixel
    // formulas, so encode and decode must BOTH be right to go green.
    // PNG and GIF leave the stub list — only the codec-bound formats
    // (JPEG scan, MP4 payload) remain stubbed.
    QueryDef("q149_pixel_decode",
      (s, dir) => {
        import s.implicits._
        val ids = t(s, dir, "documents")
          .select(col("doc_id").cast("long").as("id")).as[Long]
        val media = ids.map { id =>
          val bytes =
            if (id % 2 == 0) MediaFixtures.pngBytes(id, 8, 6)
            else MediaFixtures.gifBytes(id, 7, 5)
          (id, bytes, "image")
        }.toDF("id", "bytes", "media_type")
        Multimodal.contentFeatures(s, media).orderBy("id")
      },
      Some("""WITH gp AS (
             |  SELECT doc_id AS id,
             |    list_transform(generate_series(0, 47), i ->
             |      (doc_id * 3 + 3 * (i % 8) + 7 * (i // 8)) % 256) AS pr,
             |    list_transform(generate_series(0, 47), i ->
             |      (doc_id * 4 + 3 * (i % 8) + 7 * (i // 8)) % 256) AS pg,
             |    list_transform(generate_series(0, 47), i ->
             |      (doc_id * 5 + 3 * (i % 8) + 7 * (i // 8)) % 256) AS pb,
             |    list_transform(generate_series(0, 34), i ->
             |      (doc_id + 5 * (i % 7) + 11 * (i // 7)) % 64) AS gj
             |  FROM documents)
             |SELECT id,
             |  CASE WHEN id % 2 = 0 THEN 'png' ELSE 'gif' END AS kind,
             |  round(CASE WHEN id % 2 = 0 THEN list_sum(pr) / 48.0
             |    ELSE list_sum(list_transform(gj, v -> (3 * v) % 256))
             |      / 35.0 END, 4) + 0.0 AS f1,
             |  round(CASE WHEN id % 2 = 0 THEN list_sum(pg) / 48.0
             |    ELSE list_sum(list_transform(gj, v -> (5 * v) % 256))
             |      / 35.0 END, 4) + 0.0 AS f2,
             |  round(CASE WHEN id % 2 = 0 THEN list_sum(pb) / 48.0
             |    ELSE list_sum(list_transform(gj, v -> (7 * v) % 256))
             |      / 35.0 END, 4) + 0.0 AS f3
             |FROM gp ORDER BY id""".stripMargin)),

    // IVF + SQ8 quantized search (Similarity.ivfSq8TopK): trained
    // codebook cells, int8-code index, ASYMMETRIC cosine (full-
    // precision query x raw codes — the absmax scale cancels out of
    // cosine), top-20 shortlist, exact float re-rank to top-3. The
    // memory-bound search tier q73 (codes) and q66 (cells) were built
    // for, now composed; recall measured next to the other tiers in
    // q67's table.
    QueryDef("q150_ivf_sq8_search",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val cents = Similarity.trainCentroids(
          emb, "vec_id", "embedding", k = 8, iters = 2)
        Similarity.ivfSq8TopK(
          emb, emb.filter(col("vec_id").between(100, 104)), cents,
          "vec_id", "embedding", k = 3, nProbe = 2, shortlist = 20)
          .orderBy("query_id", "rank")
      },
      Some("WITH " + kmeansCtes(k = 8, iters = 2) + ",\n" +
        ivfSearchCtes("cent2", nProbe = 2, qLo = 100, qHi = 104) + ",\n" +
        ivfSq8Ctes("", shortlist = 20) + "\n" +
        """SELECT query_id, neighbor_id, "rank", round(cos, 4) + 0.0 AS cos
          |FROM sqranked WHERE "rank" <= 3
          |ORDER BY query_id, "rank"""".stripMargin)),

    // Portable histogram percentiles (Stats.histPercentiles over the
    // graft_hist native TypedImperativeAggregate): 256 width-4 buckets
    // over [0, 1024) per language — width a power of two, so bucket
    // assignment is exact in IEEE doubles — then each quantile
    // answered by rank interpolation at the crossing bucket. This is
    // the approx-percentile swap q59/q89 documented but never
    // exercised: unlike approx_percentile's engine-private GK buffer,
    // the sketch state is pure integer counts, so the oracle rebuilds
    // the ENTIRE sketch from the same floor arithmetic and the
    // estimate is hash-compared, not tolerance-judged. At 100 TB the
    // shuffle ships 2 KB per group instead of every value.
    QueryDef("q151_hist_percentiles",
      (s, dir) => Stats.histPercentiles(
          t(s, dir, "documents"), "lang", "n_chars",
          lo = 0.0, hi = 1024.0, nbins = 256,
          ps = Seq(0.25, 0.5, 0.9, 0.99))
        .orderBy("lang", "p"),
      Some("""WITH v AS (
             |  SELECT lang, CAST(n_chars AS DOUBLE) AS v FROM documents
             |  WHERE n_chars IS NOT NULL),
             |b AS (SELECT lang, CAST(least(greatest(floor(v / 4.0), 0), 255)
             |        AS BIGINT) AS b FROM v),
             |c AS (SELECT lang, b, count(*) AS cnt FROM b GROUP BY lang, b),
             |cc AS (SELECT lang, b, cnt,
             |         sum(cnt) OVER (PARTITION BY lang ORDER BY b) AS cum,
             |         sum(cnt) OVER (PARTITION BY lang) AS total
             |       FROM c),
             |p AS (SELECT CAST(unnest([0.25, 0.5, 0.9, 0.99]) AS DOUBLE) AS p)
             |SELECT lang, p, CAST(total AS BIGINT) AS n,
             |  round(4.0 * (CAST(b AS DOUBLE)
             |    + (p * CAST(total AS DOUBLE) - CAST(cum - cnt AS DOUBLE))
             |      / CAST(cnt AS DOUBLE)), 4) + 0.0 AS est
             |FROM cc, p
             |WHERE CAST(cum AS DOUBLE) >= p * CAST(total AS DOUBLE)
             |  AND CAST(cum - cnt AS DOUBLE) < p * CAST(total AS DOUBLE)
             |ORDER BY lang, p""".stripMargin)),

    // S-tier: ORC sink + source round-trip (sources/Orc) — the second
    // columnar lake format, native to Spark. The aggregate runs over
    // the re-read ORC copy, so types (long/string/double/
    // timestamp_ntz) must survive the round-trip for the oracle —
    // which reads the ORIGINAL parquet — to hash-match.
    QueryDef("q152_orc_roundtrip",
      (s, dir) => {
        val tmp = sys.props("java.io.tmpdir") + "/graft_orc_roundtrip"
        Orc.write(t(s, dir, "orders")
          .select("o_orderkey", "o_custkey", "o_orderstatus",
            "o_totalprice", "o_orderdate"), tmp)
        Orc.read(s, tmp)
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"),
            round(sum("o_totalprice"), 2).as("total"),
            min("o_orderdate").as("first_date"),
            max("o_orderdate").as("last_date"))
          .orderBy(col("o_orderstatus").asc_nulls_first)
      },
      Some("""SELECT o_orderstatus, count(*) AS n,
             |  round(sum(o_totalprice), 2) AS total,
             |  min(o_orderdate) AS first_date,
             |  max(o_orderdate) AS last_date
             |FROM orders GROUP BY o_orderstatus
             |ORDER BY o_orderstatus NULLS FIRST""".stripMargin)),

    // Rendezvous (HRW) shard assignment (Sampling.rendezvousShard):
    // each doc scored against every shard id, argmax wins — a pure
    // narrow projection, no shuffle. The 8→9 grid this query emits
    // exhibits THE property the operator exists for: off-diagonal mass
    // (keys whose shard changed) is only the ~1/9 the new shard wins,
    // where `hash mod n` would remap ~8/9 of the corpus. The oracle
    // replays the argmax as a per-doc rank window over the exploded
    // (doc × shard) grid.
    QueryDef("q153_rendezvous_shards",
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"),
          Sampling.rendezvousShard(col("doc_id"), 8).as("shard8"),
          Sampling.rendezvousShard(col("doc_id"), 9).as("shard9"))
        .groupBy("shard8", "shard9").agg(count(lit(1)).as("n"))
        .orderBy("shard8", "shard9"),
      Some(s"""WITH sc AS (
             |  SELECT doc_id, s,
             |    ${Hashing.duckPortableHash(
                    "CAST(doc_id AS VARCHAR) || ':' || CAST(s AS VARCHAR)")} AS h
             |  FROM documents CROSS JOIN (SELECT unnest(range(9)) AS s)),
             |r8 AS (SELECT doc_id, s, row_number() OVER (
             |         PARTITION BY doc_id ORDER BY h DESC, s DESC) AS rn
             |       FROM sc WHERE s < 8),
             |r9 AS (SELECT doc_id, s, row_number() OVER (
             |         PARTITION BY doc_id ORDER BY h DESC, s DESC) AS rn
             |       FROM sc)
             |SELECT CAST(a.s AS INTEGER) AS shard8,
             |  CAST(b.s AS INTEGER) AS shard9, count(*) AS n
             |FROM (SELECT doc_id, s FROM r8 WHERE rn = 1) a
             |JOIN (SELECT doc_id, s FROM r9 WHERE rn = 1) b USING (doc_id)
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // KMV join-cardinality estimation (CardinalityEstimate
    // .kmvJoinEstimate): how many distinct customers the orders table
    // shares with customer, estimated from two 128-long sketches
    // without running the join — next to the exact tier so the
    // estimator's error is visible in the same row. Every sketch op is
    // portable hash + sorted-list arithmetic, so the oracle replays
    // estimate AND error bit-for-bit.
    QueryDef("q154_kmv_join_estimate",
      (s, dir) => CardinalityEstimate.kmvJoinEstimate(
        t(s, dir, "orders").where(col("o_orderstatus") === "O"), "o_custkey",
        t(s, dir, "customer")
          .where(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE")),
        "c_custkey", k = 128),
      Some(s"""WITH lo AS (
             |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'),
             |rc AS (
             |  SELECT c_custkey FROM customer
             |  WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')),
             |ha AS (
             |  SELECT ${Hashing.duckPortableHash("CAST(o_custkey AS VARCHAR)")} AS h
             |  FROM lo WHERE o_custkey IS NOT NULL),
             |hb AS (
             |  SELECT ${Hashing.duckPortableHash("CAST(c_custkey AS VARCHAR)")} AS h
             |  FROM rc WHERE c_custkey IS NOT NULL),
             |ka AS (SELECT list_sort(list_distinct(list(h)))[1:128] AS a FROM ha),
             |kb AS (SELECT list_sort(list_distinct(list(h)))[1:128] AS b FROM hb),
             |uu AS (SELECT a, b, list_sort(list_distinct(a || b))[1:128] AS u
             |       FROM ka, kb),
             |calc AS (SELECT a, b, u, len(u) AS m,
             |    len(list_intersect(list_intersect(u, a), b)) AS matches
             |  FROM uu),
             |ex AS (SELECT
             |  (SELECT count(DISTINCT o_custkey) FROM lo
             |   WHERE o_custkey IS NOT NULL) AS n_left_exact,
             |  (SELECT count(DISTINCT c_custkey) FROM rc
             |   WHERE c_custkey IS NOT NULL) AS n_right_exact,
             |  (SELECT count(DISTINCT o.o_custkey) FROM lo o
             |   JOIN rc c ON o.o_custkey = c.c_custkey) AS n_inter_exact)
             |SELECT n_left_exact, n_right_exact, n_inter_exact,
             |  round(CASE WHEN len(a) < 128 THEN CAST(len(a) AS DOUBLE)
             |    ELSE 127.0 * 1152921504606846976 / CAST(a[128] AS DOUBLE)
             |    END, 1) + 0.0 AS left_est,
             |  round(CASE WHEN len(b) < 128 THEN CAST(len(b) AS DOUBLE)
             |    ELSE 127.0 * 1152921504606846976 / CAST(b[128] AS DOUBLE)
             |    END, 1) + 0.0 AS right_est,
             |  round(CASE WHEN m < 128 THEN CAST(m AS DOUBLE)
             |    ELSE 127.0 * 1152921504606846976 / CAST(u[128] AS DOUBLE)
             |    END, 1) + 0.0 AS union_est,
             |  round(CAST(matches AS DOUBLE) / CAST(m AS DOUBLE), 4) + 0.0
             |    AS jacc_est,
             |  round(CAST(matches AS DOUBLE) / CAST(m AS DOUBLE)
             |    * (CASE WHEN m < 128 THEN CAST(m AS DOUBLE)
             |       ELSE 127.0 * 1152921504606846976 / CAST(u[128] AS DOUBLE)
             |       END), 1) + 0.0 AS inter_est
             |FROM calc, ex""".stripMargin)),

    // Equi-depth binning from the histogram sketch (Stats
    // .equiDepthBins): per-language length quartiles WITHOUT the
    // per-group global sort `ntile` would cost — one sketch pass fixes
    // the 3 boundary values per group, then bin assignment is a
    // narrow map against the broadcast boundary table. Boundaries
    // compare UNROUNDED on both engines (rounding could flip a value
    // across a bin edge). The per-bin counts this emits show the
    // ~equal depth.
    QueryDef("q155_equidepth_bins",
      (s, dir) => Stats.equiDepthBins(
          t(s, dir, "documents"), "lang", "n_chars",
          lo = 0.0, hi = 1024.0, nbins = 256, bins = 4)
        .groupBy("lang", "bin").agg(count(lit(1)).as("n"))
        .orderBy("lang", "bin"),
      Some("""WITH v AS (
             |  SELECT lang, CAST(n_chars AS DOUBLE) AS v FROM documents
             |  WHERE n_chars IS NOT NULL),
             |b AS (SELECT lang, CAST(least(greatest(floor(v / 4.0), 0), 255)
             |        AS BIGINT) AS b FROM v),
             |c AS (SELECT lang, b, count(*) AS cnt FROM b GROUP BY lang, b),
             |cc AS (SELECT lang, b, cnt,
             |         sum(cnt) OVER (PARTITION BY lang ORDER BY b) AS cum,
             |         sum(cnt) OVER (PARTITION BY lang) AS total
             |       FROM c),
             |p AS (SELECT CAST(unnest([0.25, 0.5, 0.75]) AS DOUBLE) AS p),
             |est AS (
             |  SELECT lang, p, 4.0 * (CAST(b AS DOUBLE)
             |    + (p * CAST(total AS DOUBLE) - CAST(cum - cnt AS DOUBLE))
             |      / CAST(cnt AS DOUBLE)) AS est_raw
             |  FROM cc, p
             |  WHERE CAST(cum AS DOUBLE) >= p * CAST(total AS DOUBLE)
             |    AND CAST(cum - cnt AS DOUBLE) < p * CAST(total AS DOUBLE)),
             |bounds AS (SELECT lang, list_sort(list(est_raw)) AS bs
             |           FROM est GROUP BY lang)
             |SELECT d.lang, CAST(len(list_filter(b.bs,
             |    x -> x <= CAST(d.n_chars AS DOUBLE))) AS INTEGER) AS bin,
             |  count(*) AS n
             |FROM documents d JOIN bounds b ON d.lang = b.lang
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Deterministic MERGE (ops/Merge.upsert — the lakehouse
    // `MERGE INTO` apply step after q127's CDC audit): one
    // co-partitioned full outer join lands a change batch (updates
    // whose nulls win, flagged deletes, unmatched inserts) onto the
    // base in base-schema shape. The batch here touches ~25% of
    // customer (every 10th key updated, every 17th deleted, every
    // 13th re-inserted under a shifted key); the oracle constructs
    // the final state set-algebraically and aggregates both.
    QueryDef("q156_merge_upsert",
      (s, dir) => {
        val cust = t(s, dir, "customer")
        val upd = cust
          .filter(col("c_custkey") % 10 === 0 && col("c_custkey") % 17 =!= 0)
          .withColumn("c_acctbal", col("c_acctbal") + lit(100.0))
          .withColumn("_delete", lit(false))
        val del = cust.filter(col("c_custkey") % 17 === 0)
          .withColumn("_delete", lit(true))
        val ins = cust.filter(col("c_custkey") % 13 === 0)
          .select((col("c_custkey") + lit(1000000L)).as("c_custkey"),
            concat(lit("new_"), col("c_custkey").cast("string")).as("c_name"),
            col("c_nationkey"), lit(0.0).as("c_acctbal"), col("c_mktsegment"))
          .withColumn("_delete", lit(false))
        Merge.upsert(cust, upd.unionByName(del).unionByName(ins), "c_custkey")
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n"),
            round(sum("c_acctbal"), 2).as("total_bal"),
            countDistinct("c_custkey").as("n_keys"))
          .orderBy("c_mktsegment")
      },
      Some("""WITH upd AS (
             |  SELECT c_custkey, c_name, c_nationkey,
             |    c_acctbal + 100.0 AS c_acctbal, c_mktsegment
             |  FROM customer WHERE c_custkey % 10 = 0 AND c_custkey % 17 <> 0),
             |ins AS (
             |  SELECT c_custkey + 1000000 AS c_custkey,
             |    'new_' || CAST(c_custkey AS VARCHAR) AS c_name,
             |    c_nationkey, 0.0 AS c_acctbal, c_mktsegment
             |  FROM customer WHERE c_custkey % 13 = 0),
             |keep AS (
             |  SELECT * FROM customer
             |  WHERE c_custkey % 17 <> 0 AND c_custkey % 10 <> 0),
             |final AS (SELECT * FROM keep UNION ALL SELECT * FROM upd
             |          UNION ALL SELECT * FROM ins)
             |SELECT c_mktsegment, count(*) AS n,
             |  round(sum(c_acctbal), 2) AS total_bal,
             |  count(DISTINCT c_custkey) AS n_keys
             |FROM final GROUP BY 1 ORDER BY 1""".stripMargin)),

    // SCD Type-2 history build (ops/Scd2.history): three synthesized
    // customer versions (v2 bumps nationkey for every 7th key and
    // drops every 11th; v3 restores the dropped keys and moves every
    // 5th key's segment) collapse into validity intervals — per-key
    // windows over the version log, the fingerprint computed in the
    // scan projection. A key absent in v2 that returns in v3 with
    // UNCHANGED content stays one unbroken run (fingerprint-equality
    // semantics, pinned in Scd2Spec).
    QueryDef("q157_scd2_history",
      (s, dir) => {
        val cust = t(s, dir, "customer")
          .select("c_custkey", "c_nationkey", "c_mktsegment")
        val bump = when(col("c_custkey") % 7 === 0,
          col("c_nationkey") + 1).otherwise(col("c_nationkey"))
        val v1 = cust.withColumn("ver", lit(1))
        val v2 = cust.filter(col("c_custkey") % 11 =!= 0)
          .withColumn("c_nationkey", bump)
          .withColumn("ver", lit(2))
        val v3 = cust
          .withColumn("c_nationkey", bump)
          .withColumn("c_mktsegment", when(col("c_custkey") % 5 === 0,
            lit("MOVED")).otherwise(col("c_mktsegment")))
          .withColumn("ver", lit(3))
        Scd2.history(v1.unionByName(v2).unionByName(v3),
          "c_custkey", "ver", Seq("c_nationkey", "c_mktsegment"))
          .groupBy("valid_from", "valid_to", "is_current")
          .agg(count(lit(1)).as("n"), countDistinct("c_custkey").as("n_keys"))
          .orderBy(col("valid_from"), col("valid_to").asc_nulls_first)
      },
      Some(s"""WITH v1 AS (
             |  SELECT c_custkey, c_nationkey, c_mktsegment, 1 AS ver
             |  FROM customer),
             |v2 AS (
             |  SELECT c_custkey,
             |    CASE WHEN c_custkey % 7 = 0 THEN c_nationkey + 1
             |      ELSE c_nationkey END AS c_nationkey,
             |    c_mktsegment, 2 AS ver
             |  FROM customer WHERE c_custkey % 11 <> 0),
             |v3 AS (
             |  SELECT c_custkey,
             |    CASE WHEN c_custkey % 7 = 0 THEN c_nationkey + 1
             |      ELSE c_nationkey END AS c_nationkey,
             |    CASE WHEN c_custkey % 5 = 0 THEN 'MOVED'
             |      ELSE c_mktsegment END AS c_mktsegment,
             |    3 AS ver FROM customer),
             |vlog AS (SELECT * FROM v1 UNION ALL SELECT * FROM v2
             |         UNION ALL SELECT * FROM v3),
             |f AS (SELECT *, ${SnapshotDiff.duckFingerprint(
                      Seq("c_nationkey", "c_mktsegment"))} AS fp
             |      FROM vlog),
             |g AS (SELECT *, CASE WHEN lag(fp) OVER w IS NULL
             |        OR lag(fp) OVER w <> fp THEN 1 ELSE 0 END AS nr
             |      FROM f WINDOW w AS (PARTITION BY c_custkey ORDER BY ver)),
             |r AS (SELECT *, sum(nr) OVER (
             |        PARTITION BY c_custkey ORDER BY ver) AS run
             |      FROM g),
             |runs AS (SELECT c_custkey, run, min(ver) AS valid_from
             |         FROM r GROUP BY 1, 2),
             |iv AS (SELECT c_custkey, valid_from,
             |         lead(valid_from) OVER (
             |           PARTITION BY c_custkey ORDER BY valid_from) - 1
             |           AS valid_to
             |       FROM runs)
             |SELECT valid_from, valid_to, valid_to IS NULL AS is_current,
             |  count(*) AS n, count(DISTINCT c_custkey) AS n_keys
             |FROM iv GROUP BY 1, 2, 3
             |ORDER BY 1, 2 NULLS FIRST""".stripMargin)),

    // Order-independent bucketed table checksums (ops/TableChecksum
    // .compare — the Merkle-style anti-entropy primitive): a tampered
    // customer copy (every 97th key deleted, every 101st segment
    // rewritten) against the original. Each side ships 16 (count,
    // XOR-of-fingerprints) rows; the differing buckets localize the
    // damage without either side shipping a row. The oracle recomputes
    // both sides' checksums with DuckDB's bit_xor over the same
    // portable fingerprints.
    QueryDef("q158_table_checksum",
      (s, dir) => {
        val cust = t(s, dir, "customer")
        val tampered = cust.filter(col("c_custkey") % 97 =!= 0)
          .withColumn("c_mktsegment", when(col("c_custkey") % 101 === 0,
            lit("X")).otherwise(col("c_mktsegment")))
        TableChecksum.compare(cust, tampered, "c_custkey",
          Seq("c_name", "c_nationkey", "c_mktsegment"), buckets = 16)
          .orderBy("bucket")
      },
      Some(s"""WITH tam AS (
             |  SELECT c_custkey, c_name, c_nationkey,
             |    CASE WHEN c_custkey % 101 = 0 THEN 'X'
             |      ELSE c_mktsegment END AS c_mktsegment
             |  FROM customer WHERE c_custkey % 97 <> 0),
             |ca AS (
             |  SELECT ${Hashing.duckPortableHash(
                    "CAST(c_custkey AS VARCHAR)")} % 16 AS bucket,
             |    count(*) AS n_a,
             |    bit_xor(${SnapshotDiff.duckFingerprint(Seq("c_custkey",
                      "c_name", "c_nationkey", "c_mktsegment"))}) AS xor_a
             |  FROM customer GROUP BY 1),
             |cb AS (
             |  SELECT ${Hashing.duckPortableHash(
                    "CAST(c_custkey AS VARCHAR)")} % 16 AS bucket,
             |    count(*) AS n_b,
             |    bit_xor(${SnapshotDiff.duckFingerprint(Seq("c_custkey",
                      "c_name", "c_nationkey", "c_mktsegment"))}) AS xor_b
             |  FROM tam GROUP BY 1)
             |SELECT coalesce(ca.bucket, cb.bucket) AS bucket,
             |  coalesce(n_a, 0) AS n_a, coalesce(n_b, 0) AS n_b,
             |  (coalesce(n_a, 0) = coalesce(n_b, 0)
             |    AND coalesce(xor_a, 0) = coalesce(xor_b, 0)) AS is_match
             |FROM ca FULL JOIN cb ON ca.bucket = cb.bucket
             |ORDER BY 1""".stripMargin)),

    // Incremental aggregate maintenance (ops/IncrementalAgg — IVM for
    // distributive aggregates): the per-returnflag (count, sum) view
    // is built WITHOUT the final 10% of orders, then a signed delta
    // batch (those orders as +1 inserts, every 7th already-counted
    // order as −1 retractions) folds in via one batch-sized aggregate
    // + one full outer join on the group keyspace. The oracle
    // re-aggregates the final row set DIRECTLY, so the query is green
    // only if state ⊕ Δ ≡ recompute — exactly (l_quantity is
    // integral-valued, so the sums are order-independent integers).
    QueryDef("q159_incremental_agg",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val base = li.filter(col("l_orderkey") % 10 =!= 0)
        val st = IncrementalAgg.state(base, "l_returnflag", "l_quantity")
        val inserts = li.filter(col("l_orderkey") % 10 === 0)
          .withColumn("sign", lit(1))
        val retractions = li
          .filter(col("l_orderkey") % 10 =!= 0 && col("l_orderkey") % 7 === 0)
          .withColumn("sign", lit(-1))
        IncrementalAgg.applyDelta(st, inserts.unionByName(retractions),
          "l_returnflag", "l_quantity", "sign")
          .select(col("l_returnflag"), col("n"),
            round(col("total"), 2).as("total"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, count(*) AS n,
             |  round(sum(CAST(l_quantity AS DOUBLE)), 2) AS total
             |FROM lineitem
             |WHERE l_orderkey % 10 = 0
             |   OR (l_orderkey % 10 <> 0 AND l_orderkey % 7 <> 0)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Distribution-drift gate (ops/Drift.ksFromHists): two-sample KS
    // statistic per language between the even-id documents and the
    // odd-id documents with n_chars shifted +100 (a simulated
    // longer-docs corpus version) — computed ENTIRELY from two
    // graft_hist sketches; neither sample ships a row. KS at bucket
    // edges is exact for the binned distributions (integer counts,
    // one division), so the oracle rebuilds both CDFs on a dense
    // bucket grid and reproduces the statistic bit-for-bit.
    QueryDef("q160_ks_drift",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val a = docs.filter(col("doc_id") % 2 === 0)
        val b = docs.filter(col("doc_id") % 2 =!= 0)
          .withColumn("n_chars", col("n_chars") + lit(100L))
        Drift.ksFromHists(a, b, "lang", "n_chars",
          lo = 0.0, hi = 1024.0, nbins = 256)
          .orderBy("lang")
      },
      Some("""WITH aa AS (
             |  SELECT lang, CAST(least(greatest(
             |      floor(CAST(n_chars AS DOUBLE) / 4.0), 0), 255) AS BIGINT)
             |      AS b
             |  FROM documents WHERE doc_id % 2 = 0 AND n_chars IS NOT NULL),
             |bb AS (
             |  SELECT lang, CAST(least(greatest(
             |      floor(CAST(n_chars + 100 AS DOUBLE) / 4.0), 0), 255)
             |      AS BIGINT) AS b
             |  FROM documents WHERE doc_id % 2 <> 0 AND n_chars IS NOT NULL),
             |langs AS (SELECT DISTINCT lang FROM documents),
             |grid AS (SELECT lang, s AS b FROM langs
             |         CROSS JOIN (SELECT unnest(range(256)) AS s)),
             |ka AS (SELECT lang, b, count(*) AS c FROM aa GROUP BY 1, 2),
             |kb AS (SELECT lang, b, count(*) AS c FROM bb GROUP BY 1, 2),
             |j AS (SELECT g.lang, g.b, coalesce(ka.c, 0) AS ca,
             |        coalesce(kb.c, 0) AS cb
             |      FROM grid g
             |      LEFT JOIN ka ON g.lang = ka.lang AND g.b = ka.b
             |      LEFT JOIN kb ON g.lang = kb.lang AND g.b = kb.b),
             |cum AS (SELECT lang, b,
             |          sum(ca) OVER w AS cum_a, sum(cb) OVER w AS cum_b,
             |          sum(ca) OVER wa AS n_a, sum(cb) OVER wa AS n_b
             |        FROM j
             |        WINDOW w AS (PARTITION BY lang ORDER BY b),
             |               wa AS (PARTITION BY lang))
             |SELECT lang, CAST(n_a AS BIGINT) AS n_a,
             |  CAST(n_b AS BIGINT) AS n_b,
             |  round(max(abs(CAST(cum_a AS DOUBLE) / CAST(n_a AS DOUBLE)
             |    - CAST(cum_b AS DOUBLE) / CAST(n_b AS DOUBLE))), 4) + 0.0
             |    AS ks
             |FROM cum WHERE n_a > 0 AND n_b > 0
             |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin))
  )

  /** Third catalog section (round 11+) — its own Seq literal so the
    * already-huge `moreDefs` method stays clear of JVM size limits.
    */
  private val extraDefs: Seq[QueryDef] = Seq(

    // Frequent-itemset mining + association rules (ops/Itemsets.rules,
    // Apriori pair grain): baskets = orders, items = the part brands
    // they contain. The L1 pass prunes to frequent items BEFORE the
    // per-basket pair expansion (Apriori monotonicity), pairs come
    // from a basket-key self-join, and support/confidence/lift are
    // integer-count ratios — the oracle replays the identical
    // lattice in SQL.
    QueryDef("q161_assoc_rules",
      (s, dir) => {
        val li = t(s, dir, "lineitem").select("l_orderkey", "l_partkey")
        val part = t(s, dir, "part").select("p_partkey", "p_brand")
        val basket = li.join(part, col("l_partkey") === col("p_partkey"))
        Itemsets.rules(basket, "l_orderkey", "p_brand", minSupport = 50)
          .orderBy("antecedent", "consequent")
      },
      Some("""WITH b AS (
             |  SELECT DISTINCT l_orderkey AS basket, p_brand AS item
             |  FROM lineitem JOIN part ON l_partkey = p_partkey),
             |nb AS (SELECT count(DISTINCT basket) AS n FROM b),
             |l1 AS (SELECT item, count(*) AS n_item FROM b
             |       GROUP BY 1 HAVING count(*) >= 50),
             |fb AS (SELECT b.basket, b.item FROM b JOIN l1 USING (item)),
             |p AS (SELECT x.item AS item_a, y.item AS item_b,
             |        count(*) AS n_both
             |      FROM fb x JOIN fb y
             |        ON x.basket = y.basket AND x.item < y.item
             |      GROUP BY 1, 2 HAVING count(*) >= 50),
             |d AS (SELECT item_a AS antecedent, item_b AS consequent,
             |        n_both FROM p
             |      UNION ALL
             |      SELECT item_b, item_a, n_both FROM p)
             |SELECT antecedent, consequent, n_both,
             |  la.n_item AS n_ante, lc.n_item AS n_cons,
             |  round(CAST(n_both AS DOUBLE) / nb.n, 6) AS support,
             |  round(CAST(n_both AS DOUBLE) / la.n_item, 6) AS confidence,
             |  round(CAST(n_both AS DOUBLE) * nb.n /
             |    (CAST(la.n_item AS DOUBLE) * lc.n_item), 6) AS lift
             |FROM d
             |JOIN l1 la ON d.antecedent = la.item
             |JOIN l1 lc ON d.consequent = lc.item, nb
             |ORDER BY 1, 2""".stripMargin)),

    // Robust per-language outlier gate (ops/Outliers.madSummary):
    // median / MAD with the 1.4826 sigma-equivalence factor, k=3 —
    // the 50%-breakdown alternative to q82's mean/stddev z-score.
    // Both passes are the exact interpolated percentile kernel q143
    // already pinned against DuckDB's percentile_cont.
    QueryDef("q162_mad_outliers",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        Outliers.madSummary(docs, "lang", "n_chars", k = 3.0)
          .orderBy("lang")
      },
      Some("""WITH d AS (
             |  SELECT lang, CAST(n_chars AS DOUBLE) AS v
             |  FROM documents WHERE n_chars IS NOT NULL),
             |m AS (SELECT lang,
             |        percentile_cont(0.5) WITHIN GROUP (ORDER BY v) AS med
             |      FROM d GROUP BY 1),
             |md AS (SELECT d.lang,
             |         percentile_cont(0.5) WITHIN GROUP
             |           (ORDER BY abs(v - med)) AS mad
             |       FROM d JOIN m USING (lang) GROUP BY 1)
             |SELECT d.lang, count(*) AS n,
             |  round(med, 4) AS med, round(mad, 4) AS mad,
             |  CAST(sum(CASE WHEN abs(v - med) > 3.0 * 1.4826 * mad
             |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
             |FROM d JOIN m USING (lang) JOIN md USING (lang)
             |GROUP BY d.lang, med, mad
             |ORDER BY 1""".stripMargin)),

    // Pareto-frontier selection (ops/Pareto.frontier2d): per brand,
    // the parts no other part beats on BOTH size (maximize) and
    // retail price (minimize). The op is the O(n log n) staircase —
    // two windows after one sort — while the oracle replays the
    // textbook O(n²) NOT EXISTS dominance test, so the staircase's
    // tie handling is proven equivalent to the definition.
    QueryDef("q163_pareto_frontier",
      (s, dir) => {
        val part = t(s, dir, "part")
          .select("p_brand", "p_partkey", "p_size", "p_retailprice")
        Pareto.frontier2d(part, "p_brand", "p_size", "p_retailprice")
          .orderBy("p_brand", "p_partkey")
      },
      Some("""SELECT p_brand, p_partkey, p_size, p_retailprice
             |FROM part p
             |WHERE NOT EXISTS (
             |  SELECT 1 FROM part q
             |  WHERE q.p_brand = p.p_brand
             |    AND q.p_size >= p.p_size
             |    AND q.p_retailprice <= p.p_retailprice
             |    AND (q.p_size > p.p_size
             |      OR q.p_retailprice < p.p_retailprice))
             |ORDER BY 1, 2""".stripMargin)),

    // Largest-remainder integer apportionment (ops/Allocate
    // .largestRemainder): split a 1000-doc sampling budget across
    // sources proportionally to their total characters. All integer
    // arithmetic — DIV/mod on 64-bit — so Σ seats ≡ budget exactly
    // and the oracle reproduces every seat bit-for-bit.
    QueryDef("q164_largest_remainder",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        Allocate.largestRemainder(docs, "source", "n_chars", budget = 1000L)
          .orderBy("source")
      },
      Some("""WITH agg AS (
             |  SELECT source,
             |    CAST(sum(coalesce(n_chars, 0)) AS BIGINT) AS weight
             |  FROM documents GROUP BY 1),
             |tot AS (SELECT sum(weight) AS w FROM agg),
             |f AS (SELECT source, weight,
             |        (1000 * weight) // w AS floor_seats,
             |        (1000 * weight) % w AS rem
             |      FROM agg, tot),
             |l AS (SELECT sum(floor_seats) AS fs FROM f)
             |SELECT source, weight,
             |  CAST(floor_seats AS BIGINT) AS floor_seats,
             |  CAST(rem AS BIGINT) AS rem,
             |  CAST(floor_seats + CASE WHEN
             |      row_number() OVER (ORDER BY rem DESC, source)
             |        <= 1000 - l.fs
             |      THEN 1 ELSE 0 END AS BIGINT) AS seats
             |FROM f, l ORDER BY source""".stripMargin)),

    // Triangle count + local clustering coefficient (ops/GraphMetrics
    // .triangleStats) over the nation-level trade graph: an edge
    // wherever a customer nation bought ≥100 lineitems from a
    // supplier nation. The op orients wedges by (degree, id) — the
    // Schank–Wagner O(m^1.5) bound — while the oracle enumerates by
    // plain id order; any consistent total order counts each triangle
    // once, so the two agree exactly.
    QueryDef("q165_triangle_stats",
      (s, dir) => {
        val cust = t(s, dir, "customer").select("c_custkey", "c_nationkey")
        val ord = t(s, dir, "orders").select("o_orderkey", "o_custkey")
        val li = t(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
        val supp = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
        val edges = cust
          .join(ord, col("c_custkey") === col("o_custkey"))
          .join(li, col("o_orderkey") === col("l_orderkey"))
          .join(supp, col("l_suppkey") === col("s_suppkey"))
          .groupBy("c_nationkey", "s_nationkey")
          .agg(count(lit(1)).as("n"))
          .where(col("n") >= 100)
        GraphMetrics.triangleStats(edges, "c_nationkey", "s_nationkey")
          .orderBy("node")
      },
      Some("""WITH tr AS (
             |  SELECT c_nationkey AS x, s_nationkey AS y, count(*) AS n
             |  FROM customer
             |  JOIN orders ON c_custkey = o_custkey
             |  JOIN lineitem ON o_orderkey = l_orderkey
             |  JOIN supplier ON l_suppkey = s_suppkey
             |  GROUP BY 1, 2 HAVING count(*) >= 100),
             |e AS (SELECT DISTINCT least(x, y) AS a, greatest(x, y) AS b
             |      FROM tr WHERE x <> y),
             |deg AS (SELECT node, count(*) AS degree FROM (
             |          SELECT a AS node FROM e
             |          UNION ALL SELECT b FROM e)
             |        GROUP BY 1),
             |tri AS (SELECT e1.a AS v1, e1.b AS v2, e2.b AS v3
             |        FROM e e1
             |        JOIN e e2 ON e1.b = e2.a
             |        JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
             |pt AS (SELECT node, count(*) AS triangles FROM (
             |         SELECT v1 AS node FROM tri
             |         UNION ALL SELECT v2 FROM tri
             |         UNION ALL SELECT v3 FROM tri)
             |       GROUP BY 1)
             |SELECT deg.node, degree,
             |  CAST(coalesce(triangles, 0) AS BIGINT) AS triangles,
             |  round(CASE WHEN degree >= 2
             |    THEN 2.0 * coalesce(triangles, 0) /
             |      (degree * (degree - 1.0))
             |    ELSE 0.0 END, 4) AS clustering
             |FROM deg LEFT JOIN pt USING (node)
             |ORDER BY 1""".stripMargin)),

    // Record linkage against a perturbed twin (ops/Linkage): every
    // 3rd part loses its last name token, every 5th gets its brand
    // rewritten — then the original and the twin are re-aligned by
    // (first-token, size, type) blocking — type is untouched by the
    // perturbation, so adding it to the block key shrinks candidate
    // blocks ~150× at ZERO recall cost (this is the "block
    // selectivity is THE scale knob" lever, applied: the 2-key
    // variant measured ~7× cost for 10× data; 3-key re-measures
    // ~linear) — and a weighted agreement score (0.5·name-Jaccard +
    // 0.2·brand + 0.3·type). Ground truth is key equality, so the
    // report shows exactly how many true pairs each decision bucket
    // captured. Mean scores cross the compare as exact micro-unit
    // sums, not float folds.
    QueryDef("q166_record_linkage",
      (s, dir) => {
        val p = t(s, dir, "part")
          .select("p_partkey", "p_name", "p_brand", "p_type", "p_size")
        val toks = split(col("p_name"), " ")
        val twin = p.select(col("p_partkey"),
          when(col("p_partkey") % 3 === 0,
            array_join(slice(toks, lit(1), size(toks) - 1), " "))
            .otherwise(col("p_name")).as("p_name"),
          when(col("p_partkey") % 5 === 0, lit("Brand#99"))
            .otherwise(col("p_brand")).as("p_brand"),
          col("p_type"), col("p_size"))
        def blocked(df: DataFrame) = df.withColumn("first_tok",
          element_at(split(col("p_name"), " "), 1))
        val pairs = Linkage.candidates(blocked(p), blocked(twin),
          "p_partkey", "p_name", Seq("first_tok", "p_size", "p_type"),
          Seq("p_brand" -> 0.2, "p_type" -> 0.3), nameWeight = 0.5)
        Linkage.linkReport(pairs, matchAt = 0.75, possibleAt = 0.5)
          .orderBy("decision")
      },
      Some("""WITH tw AS (
             |  SELECT p_partkey AS key_b,
             |    CASE WHEN p_partkey % 3 = 0
             |      THEN array_to_string(ss[1:len(ss) - 1], ' ')
             |      ELSE p_name END AS name_b,
             |    CASE WHEN p_partkey % 5 = 0 THEN 'Brand#99'
             |      ELSE p_brand END AS brand_b,
             |    p_type AS type_b, p_size
             |  FROM (SELECT *, string_split(p_name, ' ') AS ss FROM part)),
             |a2 AS (SELECT p_partkey AS key_a,
             |         list_distinct(string_split(p_name, ' ')) AS toks_a,
             |         p_brand AS brand_a, p_type AS type_a, p_size,
             |         string_split(p_name, ' ')[1] AS ft
             |       FROM part),
             |b2 AS (SELECT key_b,
             |         list_distinct(string_split(name_b, ' ')) AS toks_b,
             |         brand_b, type_b, p_size,
             |         string_split(name_b, ' ')[1] AS ft
             |       FROM tw),
             |sc AS (SELECT key_a, key_b,
             |         round(CAST(len(list_intersect(toks_a, toks_b))
             |             AS DOUBLE) /
             |           len(list_distinct(list_concat(toks_a, toks_b))), 6)
             |           AS jacc,
             |         CASE WHEN brand_a = brand_b THEN 0.2 ELSE 0.0 END +
             |         CASE WHEN type_a = type_b THEN 0.3 ELSE 0.0 END AS ex
             |       FROM a2 JOIN b2
             |         ON a2.ft = b2.ft AND a2.p_size = b2.p_size
             |         AND a2.type_a = b2.type_b),
             |dec AS (SELECT key_a, key_b,
             |          round(0.5 * jacc + ex, 6) AS score,
             |          CASE WHEN round(0.5 * jacc + ex, 6) >= 0.75
             |              THEN 'match'
             |            WHEN round(0.5 * jacc + ex, 6) >= 0.5
             |              THEN 'possible'
             |            ELSE 'miss' END AS decision
             |        FROM sc)
             |SELECT decision, count(*) AS n_pairs,
             |  CAST(sum(CASE WHEN key_a = key_b THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_true,
             |  round(CAST(sum(CAST(round(score * 1000000.0) AS BIGINT))
             |      AS DOUBLE) /
             |    (count(*) * 1000000.0), 4) AS mean_score
             |FROM dec GROUP BY 1 ORDER BY 1""".stripMargin)),

    // A/B readout with CUPED variance reduction (ops/Experiment
    // .cupedReport, Deng et al. WSDM'13): arms = user_id parity,
    // metric y = second-half purchase spend, covariate x = FIRST-half
    // spend (pre-experiment by construction), θ = pooled OLS slope.
    // Every moment crosses the shuffle as an exact integer-cents sum
    // — the only order-sensitive step made order-free — so t, θ, and
    // the adjusted means are bit-reproducible from the oracle's
    // identical expression tree.
    QueryDef("q167_cuped_abtest",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val cut = lit("2024-01-16 00:00:00").cast("timestamp_ntz")
        val cents = round(col("value") * 100).cast("long")
        val isPurch = col("event_type") === "purchase"
        val perUser = ev.groupBy("user_id").agg(
          sum(when(isPurch && col("ts") < cut, cents).otherwise(0L)).as("x"),
          sum(when(isPurch && col("ts") >= cut, cents).otherwise(0L)).as("y"))
          .withColumn("arm", pmod(col("user_id"), lit(2)))
        Experiment.cupedReport(perUser).orderBy("arm")
      },
      Some("""WITH pu AS (
             |  SELECT user_id, user_id % 2 AS arm,
             |    sum(CASE WHEN event_type = 'purchase'
             |        AND ts < TIMESTAMP '2024-01-16 00:00:00'
             |      THEN CAST(round(value * 100) AS BIGINT)
             |      ELSE 0 END) AS x,
             |    sum(CASE WHEN event_type = 'purchase'
             |        AND ts >= TIMESTAMP '2024-01-16 00:00:00'
             |      THEN CAST(round(value * 100) AS BIGINT)
             |      ELSE 0 END) AS y
             |  FROM events GROUP BY 1, 2),
             |arms AS (SELECT arm, count(*) AS n,
             |    sum(y) AS sy, sum(y * y) AS syy,
             |    sum(x) AS sx, sum(x * x) AS sxx, sum(x * y) AS sxy
             |  FROM pu GROUP BY 1),
             |pool AS (SELECT sum(n) AS tn, sum(sx) AS tsx,
             |    sum(sy) AS tsy, sum(sxx) AS tsxx, sum(sxy) AS tsxy
             |  FROM arms),
             |calc AS (SELECT arm, n,
             |    CAST(sy AS DOUBLE) / (CAST(n AS DOUBLE) * 100.0)
             |      AS mean_y_d,
             |    (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) *
             |        CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) /
             |      ((CAST(n AS DOUBLE) - 1.0) * 10000.0) AS var_y_d,
             |    CAST(sx AS DOUBLE) / (CAST(n AS DOUBLE) * 100.0)
             |      AS mean_x_d,
             |    (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) *
             |        CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) /
             |      ((CAST(n AS DOUBLE) - 1.0) * 10000.0) AS var_x_d,
             |    (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) *
             |        CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) /
             |      ((CAST(n AS DOUBLE) - 1.0) * 10000.0) AS cov_d,
             |    (CAST(tsxy AS DOUBLE) - CAST(tsx AS DOUBLE) *
             |        CAST(tsy AS DOUBLE) / CAST(tn AS DOUBLE)) /
             |      (CAST(tsxx AS DOUBLE) - CAST(tsx AS DOUBLE) *
             |        CAST(tsx AS DOUBLE) / CAST(tn AS DOUBLE)) AS theta_d,
             |    CAST(tsx AS DOUBLE) / (CAST(tn AS DOUBLE) * 100.0)
             |      AS pool_mean_x
             |  FROM arms, pool),
             |adj AS (SELECT *,
             |    mean_y_d - theta_d * (mean_x_d - pool_mean_x)
             |      AS mean_adj_d,
             |    var_y_d - 2.0 * theta_d * cov_d +
             |      theta_d * theta_d * var_x_d AS var_adj_d
             |  FROM calc),
             |tt AS (SELECT
             |    sum(CASE WHEN arm = 1 THEN mean_y_d
             |      ELSE -mean_y_d END) /
             |      sqrt(sum(var_y_d / CAST(n AS DOUBLE))) AS t_raw_d,
             |    sum(CASE WHEN arm = 1 THEN mean_adj_d
             |      ELSE -mean_adj_d END) /
             |      sqrt(sum(var_adj_d / CAST(n AS DOUBLE))) AS t_cuped_d
             |  FROM adj)
             |SELECT arm, n,
             |  round(mean_y_d, 4) AS mean_y, round(var_y_d, 4) AS var_y,
             |  round(mean_adj_d, 4) AS mean_adj,
             |  round(var_adj_d, 4) AS var_adj,
             |  round(theta_d, 6) AS theta, round(t_raw_d, 4) AS t_raw,
             |  round(t_cuped_d, 4) AS t_cuped
             |FROM adj, tt ORDER BY arm""".stripMargin)),

    // Z-order layout audit (ops/ZOrder.layoutReport): Morton-
    // interleave 8-bit-quantized (extendedprice, quantity), then per
    // fixed z-slice — the stand-in for one output file under
    // repartitionByRange(z) — report row count, both dimensions'
    // min/max extents, and the covered-rectangle area. Tight
    // rectangles on BOTH axes are what make parquet min/max stats
    // prune for predicates on either column; a plain price sort
    // would leave every slice's quantity extent at full width.
    QueryDef("q168_zorder_layout",
      (s, dir) => ZOrder.layoutReport(
          t(s, dir, "lineitem"), "l_extendedprice", "l_quantity",
          xLo = 900.0, xHi = 105000.0, yLo = 1.0, yHi = 51.0,
          sliceBits = 4)
        .orderBy("slice"),
      Some("""WITH q AS (
             |  SELECT
             |    least(greatest(CAST(floor(
             |      (CAST(l_extendedprice AS DOUBLE) - 900.0) / 104100.0
             |        * 256.0) AS BIGINT), 0), 255) AS qx,
             |    least(greatest(CAST(floor(
             |      (CAST(l_quantity AS DOUBLE) - 1.0) / 50.0
             |        * 256.0) AS BIGINT), 0), 255) AS qy
             |  FROM lineitem
             |  WHERE l_extendedprice IS NOT NULL
             |    AND l_quantity IS NOT NULL),
             |z AS (SELECT qx, qy,
             |    list_sum(list_transform(generate_series(0, 7), b ->
             |      (((qx >> b) & 1) << (2 * b)) +
             |      (((qy >> b) & 1) << (2 * b + 1)))) AS zv
             |  FROM q)
             |SELECT CAST(zv // 4096 AS BIGINT) AS slice, count(*) AS n,
             |  min(qx) AS min_x, max(qx) AS max_x,
             |  min(qy) AS min_y, max(qy) AS max_y,
             |  CAST((max(qx) - min(qx) + 1) * (max(qy) - min(qy) + 1)
             |    AS BIGINT) AS area
             |FROM z GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Source-to-source vocabulary Jaccard matrix (ops/SourceSim
    // .pairwiseVocabJaccard): every source pair's token-set overlap,
    // estimated from per-source KMV sketches (k longs of state per
    // source — the 100 TB path) with the exact inverted-index tier
    // in the same row making the estimate's error visible, exactly
    // the q154 two-tier pattern. md5 hashing keeps every sketch
    // value engine-portable, so even the estimate is hash-compared.
    QueryDef("q169_source_similarity",
      (s, dir) => SourceSim.pairwiseVocabJaccard(
          t(s, dir, "documents"), "source", "text", k = 128)
        .orderBy("source_a", "source_b"),
      Some(s"""WITH toks AS (
             |  SELECT DISTINCT source AS src,
             |    unnest(list_filter(string_split_regex(text, ' +'),
             |      t -> t <> '')) AS token
             |  FROM documents),
             |ha AS (SELECT src,
             |    ${Hashing.duckPortableHash("token")} AS h
             |  FROM toks),
             |sk AS (SELECT src,
             |    list_sort(list_distinct(list(h)))[1:128] AS sig,
             |    count(*) AS n
             |  FROM ha GROUP BY src),
             |inter AS (SELECT x.src AS source_a, y.src AS source_b,
             |    count(*) AS n_int
             |  FROM toks x JOIN toks y
             |    ON x.token = y.token AND x.src < y.src
             |  GROUP BY 1, 2),
             |pairs AS (SELECT a.src AS source_a, b.src AS source_b,
             |    a.sig AS sa, b.sig AS sb, a.n AS n_a, b.n AS n_b
             |  FROM sk a JOIN sk b ON a.src < b.src),
             |wu AS (SELECT *,
             |    list_sort(list_distinct(sa || sb))[1:128] AS u
             |  FROM pairs),
             |calc AS (SELECT *, len(u) AS m,
             |    len(list_intersect(list_intersect(u, sa), sb))
             |      AS matches,
             |    coalesce(n_int, 0) AS ni
             |  FROM wu LEFT JOIN inter USING (source_a, source_b))
             |SELECT source_a, source_b,
             |  CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
             |  CAST(ni AS BIGINT) AS n_int,
             |  round(CAST(ni AS DOUBLE) /
             |    CAST(n_a + n_b - ni AS DOUBLE), 4) + 0.0 AS jacc,
             |  round(CAST(matches AS DOUBLE) / CAST(m AS DOUBLE), 4)
             |    + 0.0 AS jacc_est
             |FROM calc ORDER BY 1, 2""".stripMargin)),

    // Linear gap interpolation (Rolling.interpolate — R zoo::
    // na.approx(rule=1) parity): 'error' events' values are nulled
    // (simulated sensor dropouts) and refilled by time-weighted
    // interpolation between each user's bracketing observations;
    // unbracketed edges stay null. Filled doubles cross the compare
    // as exact micro-unit sums.
    QueryDef("q170_interpolate",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .withColumn("value",
            when(col("event_type") === "error",
              lit(null).cast("double")).otherwise(col("value")))
          .withColumn("t_us", unix_micros(col("ts").cast("timestamp")))
        Rolling.interpolate(ev, Seq("user_id"), "t_us", "event_id", "value")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_rows"),
            (count(lit(1)) - count(col("value"))).as("n_null"),
            sum(round(col("value") * lit(1e6)).cast("long"))
              .as("sum_micros"))
          .orderBy("event_type")
      },
      Some("""WITH base AS (
             |  SELECT user_id, event_id, event_type, epoch_us(ts) AS t,
             |    CASE WHEN event_type = 'error' THEN NULL
             |      ELSE value END AS v
             |  FROM events),
             |w AS (SELECT *,
             |    last_value(v IGNORE NULLS) OVER wb AS vp,
             |    last_value(CASE WHEN v IS NOT NULL
             |      THEN CAST(t AS DOUBLE) END IGNORE NULLS) OVER wb AS tp,
             |    first_value(v IGNORE NULLS) OVER wf AS vn,
             |    first_value(CASE WHEN v IS NOT NULL
             |      THEN CAST(t AS DOUBLE) END IGNORE NULLS) OVER wf AS tn
             |  FROM base
             |  WINDOW wb AS (PARTITION BY user_id ORDER BY t, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             |    wf AS (PARTITION BY user_id ORDER BY t, event_id
             |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
             |f AS (SELECT event_type,
             |    CASE WHEN v IS NOT NULL THEN v
             |      WHEN vp IS NOT NULL AND vn IS NOT NULL
             |      THEN vp + (vn - vp) *
             |        ((CAST(t AS DOUBLE) - tp) / (tn - tp))
             |      END AS v2
             |  FROM w)
             |SELECT event_type, count(*) AS n_rows,
             |  CAST(count(*) - count(v2) AS BIGINT) AS n_null,
             |  CAST(sum(CAST(round(v2 * 1000000.0) AS BIGINT)) AS BIGINT)
             |    AS sum_micros
             |FROM f GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Top-k 3-step event paths (ops/Paths.topTrigramPaths): the
    // sequential-pattern counterpart of q138's one-step transition
    // matrix — lead windows over the per-user (ts, id)-sorted
    // stream, so each row carries its next two types and no
    // collect_list ever materializes a session.
    QueryDef("q171_event_paths",
      (s, dir) => Paths.topTrigramPaths(
          t(s, dir, "events"), "user_id", "ts", "event_id",
          "event_type", k = 20)
        .orderBy("rank"),
      Some("""WITH s AS (
             |  SELECT user_id, event_type,
             |    lead(event_type, 1) OVER w AS s2,
             |    lead(event_type, 2) OVER w AS s3
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |c AS (SELECT event_type AS step1, s2 AS step2, s3 AS step3,
             |    count(*) AS n
             |  FROM s WHERE s2 IS NOT NULL AND s3 IS NOT NULL
             |  GROUP BY 1, 2, 3),
             |r AS (SELECT *, CAST(row_number() OVER (
             |    ORDER BY n DESC, step1, step2, step3) AS INT) AS "rank"
             |  FROM c)
             |SELECT step1, step2, step3, n, "rank" FROM r
             |WHERE "rank" <= 20 ORDER BY "rank"""".stripMargin)),

    // Benford first-digit audit (ops/Benford.firstDigitAudit): the
    // leading digit comes from integer truncation + string render —
    // no float formatting, no runtime log10 (expectations are pinned
    // 6-decimal literals) — and χ² is a rational expression over
    // integer counts. TPC-H's synthetic totalprice FAILS Benford
    // loudly; the statistic saying so is the demonstration.
    QueryDef("q172_benford",
      (s, dir) => Benford.firstDigitAudit(
          t(s, dir, "orders"), "o_orderpriority", "o_totalprice")
        .orderBy("o_orderpriority", "digit"),
      Some("""WITH ex AS (SELECT * FROM (VALUES
             |    (1, 0.30103), (2, 0.176091), (3, 0.124939),
             |    (4, 0.09691), (5, 0.079181), (6, 0.066947),
             |    (7, 0.057992), (8, 0.051153), (9, 0.045757))
             |    AS t(digit, p_exp)),
             |vv AS (SELECT o_orderpriority,
             |    CAST(substr(CAST(CAST(trunc(CAST(o_totalprice AS DOUBLE))
             |      AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
             |  FROM orders WHERE CAST(o_totalprice AS DOUBLE) >= 1.0),
             |c AS (SELECT o_orderpriority, digit, count(*) AS n_obs
             |  FROM vv GROUP BY 1, 2),
             |grid AS (SELECT g.o_orderpriority, ex.digit, ex.p_exp
             |  FROM (SELECT DISTINCT o_orderpriority FROM c) g, ex),
             |j AS (SELECT grid.o_orderpriority, grid.digit,
             |    coalesce(n_obs, 0) AS n_obs, p_exp
             |  FROM grid LEFT JOIN c
             |    ON grid.o_orderpriority = c.o_orderpriority
             |    AND grid.digit = c.digit),
             |t2 AS (SELECT *, sum(n_obs) OVER
             |    (PARTITION BY o_orderpriority) AS nn FROM j),
             |t3 AS (SELECT o_orderpriority, digit, n_obs, p_exp,
             |    CAST(n_obs AS DOUBLE) / CAST(nn AS DOUBLE) AS p_obs, nn
             |  FROM t2),
             |t4 AS (SELECT *, sum(CAST(nn AS DOUBLE) *
             |      (p_obs - p_exp) * (p_obs - p_exp) / p_exp) OVER
             |    (PARTITION BY o_orderpriority) AS chi2
             |  FROM t3)
             |SELECT o_orderpriority, digit, CAST(n_obs AS BIGINT) AS n_obs,
             |  round(p_obs, 4) AS p_obs, p_exp, round(chi2, 4) AS chi2
             |FROM t4 ORDER BY 1, 2""".stripMargin)),

    // Per-source concentration report (ops/Concentration.giniReport):
    // Gini + top-decile share of character mass — the "is this corpus
    // worth deduping/re-mixing" diagnostic. Rank-formula Gini over
    // ONE per-group sort; every sum is exact 64-bit integers and
    // Σi·xᵢ is tie-order invariant, so only the final division is
    // floating point.
    QueryDef("q173_gini_concentration",
      (s, dir) => Concentration.giniReport(
          t(s, dir, "documents"), "source", "n_chars")
        .orderBy("source"),
      Some("""WITH in0 AS (
             |  SELECT source, CAST(n_chars AS BIGINT) AS x
             |  FROM documents WHERE n_chars IS NOT NULL AND n_chars >= 0),
             |r AS (SELECT source, x,
             |    row_number() OVER (PARTITION BY source ORDER BY x) AS i,
             |    count(*) OVER (PARTITION BY source) AS nn
             |  FROM in0),
             |a AS (SELECT source, count(*) AS n, sum(x) AS total,
             |    sum(i * x) AS sxi,
             |    sum(CASE WHEN i > nn - nn // 10 THEN x ELSE 0 END)
             |      AS top10
             |  FROM r GROUP BY 1)
             |SELECT source, CAST(n AS BIGINT) AS n,
             |  CAST(total AS BIGINT) AS total,
             |  round(CAST(2 * sxi - (n + 1) * total AS DOUBLE) /
             |    CAST(n * total AS DOUBLE), 6) AS gini,
             |  round(CAST(top10 AS DOUBLE) / CAST(total AS DOUBLE), 6)
             |    AS top10_share
             |FROM a ORDER BY 1""".stripMargin)),

    // Event debouncing (ops/Debounce.firstOfBurst): per (user, type),
    // events closer than 24h collapse into one burst and only the
    // head survives — duplicate-click / retry-storm suppression, the
    // batch twin of a keyed-state streaming debounce. Gap compares
    // are integer microseconds; tie order pinned by event_id.
    QueryDef("q174_debounce",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val kept = Debounce.firstOfBurst(ev,
          Seq("user_id", "event_type"), "ts", "event_id",
          toleranceUs = 86400000000L)
        val k = kept.groupBy("event_type").agg(
          count(lit(1)).as("n_kept"),
          sum(round(col("value") * lit(1e6)).cast("long"))
            .as("kept_value_micros"))
        ev.groupBy("event_type").agg(count(lit(1)).as("n_events"))
          .join(k, Seq("event_type"))
          .orderBy("event_type")
      },
      Some("""WITH b AS (
             |  SELECT event_type, user_id, event_id, epoch_us(ts) AS t,
             |    value
             |  FROM events),
             |l AS (SELECT *, lag(t) OVER (PARTITION BY user_id,
             |    event_type ORDER BY t, event_id) AS pt FROM b),
             |k AS (SELECT * FROM l
             |  WHERE pt IS NULL OR t - pt > 86400000000),
             |ka AS (SELECT event_type, count(*) AS n_kept,
             |    sum(CAST(round(value * 1000000.0) AS BIGINT))
             |      AS kept_value_micros
             |  FROM k GROUP BY 1),
             |ra AS (SELECT event_type, count(*) AS n_events
             |  FROM events GROUP BY 1)
             |SELECT ra.event_type, n_events, n_kept,
             |  CAST(kept_value_micros AS BIGINT) AS kept_value_micros
             |FROM ra JOIN ka USING (event_type)
             |ORDER BY 1""".stripMargin)),

    // Classifier decile lift & calibration table (gains chart): the
    // q147-trained quality classifier's scores, ranked and cut into
    // population deciles (decile 0 = highest score) — per decile the
    // mean prediction, actual positive rate, and lift over base rate.
    // The hashed-feature model's p spread is tiny (per-doc feature
    // normalization → near-constant |z|), so ABSOLUTE probability
    // bins collapse to one row; rank deciles expose the real
    // discrimination (monotone lift) AND the calibration gap at
    // once. Rank cuts are exact integer arithmetic; means cross as
    // micro-unit sums, rates/lift as floor-ppm integers. The global
    // rank runs at the scored-eval-sample grain, not the corpus.
    QueryDef("q175_calibration",
      (s, dir) => {
        val docs = t(s, dir, "documents")
          .withColumn("y",
            (instr(col("text"), "join") > 0).cast("int"))
        val model = LogReg.train(docs, "doc_id", "text", "y",
          dim = 256, lr = 5.0, iters = 5)
        val scored = docs.select(col("doc_id"), col("y"))
          .join(LogReg.score(docs, "doc_id", "text", model, dim = 256)
            .select(col("doc_id"), col("p")), Seq("doc_id"))
          // Ranked AND totalled below: pin so scoring runs once.
          .localCheckpoint(true)
        // Rank on the ROUNDED score: ulp-level engine differences in
        // the float dot product must not reorder near-ties at a
        // decile boundary; round-6 + doc_id makes the order exact.
        // The rank is DISTRIBUTED (Rank.globalRowNumber) — the r11
        // verdict's q175 scale-killer was this exact frame through an
        // unpartitioned row_number window; totals are a 1-row
        // aggregate broadcast back, not count-over-everything windows.
        Rank.globalRowNumber(
            scored.withColumn("_pk", round(col("p"), 6)),
            Seq("_pk" -> false, "doc_id" -> true), "_rk")
          .crossJoin(broadcast(scored.agg(
            count(lit(1)).as("_n_tot"),
            sum(col("y").cast("long")).as("_pos_tot"))))
          .withColumn("decile",
            expr("((_rk - 1) * 10) DIV _n_tot").cast("int"))
          .groupBy("decile")
          .agg(count(lit(1)).as("n"),
            sum(round(col("p") * lit(1e6)).cast("long"))
              .as("_p_micros"),
            sum(col("y").cast("long")).as("n_pos"),
            max("_n_tot").as("_nt"), max("_pos_tot").as("_pt"))
          .select(col("decile"), col("n"),
            round(col("_p_micros").cast("double") /
              (col("n").cast("double") * lit(1e6)), 4).as("mean_p"),
            col("n_pos"),
            floor(col("n_pos") * lit(1000000L) / col("n")).cast("long")
              .as("actual_ppm"),
            floor(col("n_pos") * col("_nt") * lit(1000000L) /
              (col("n") * col("_pt"))).cast("long").as("lift_ppm"))
          .orderBy("decile")
      },
      Some("WITH " + logregCtes(dim = 256, lr = "5.0", iters = 5,
        label = "CASE WHEN instr(text, 'join') > 0 " +
          "THEN 1.0 ELSE 0.0 END") + ",\n" +
        """sc AS (
          |  SELECT t.doc_id, sum(t.x * w.w) AS z
          |  FROM lxb t JOIN w5 w USING (bucket) GROUP BY t.doc_id),
          |pb AS (
          |  SELECT d.doc_id,
          |    CASE WHEN instr(d.text, 'join') > 0 THEN 1 ELSE 0 END AS y,
          |    1.0 / (1.0 + exp(-s.z)) AS p
          |  FROM documents d JOIN sc s USING (doc_id)),
          |rk AS (
          |  SELECT *, row_number() OVER (ORDER BY round(p, 6) DESC,
          |      doc_id) AS rnk,
          |    count(*) OVER () AS n_tot,
          |    sum(y) OVER () AS pos_tot
          |  FROM pb),
          |cb AS (
          |  SELECT CAST(((rnk - 1) * 10) // n_tot AS INT) AS decile,
          |    count(*) AS n,
          |    sum(CAST(round(p * 1000000.0) AS BIGINT)) AS p_micros,
          |    sum(y) AS n_pos, max(n_tot) AS nt, max(pos_tot) AS pt
          |  FROM rk GROUP BY 1)
          |SELECT decile, n,
          |  round(CAST(p_micros AS DOUBLE) /
          |    (CAST(n AS DOUBLE) * 1000000.0), 4) AS mean_p,
          |  CAST(n_pos AS BIGINT) AS n_pos,
          |  CAST(floor(n_pos * 1000000 / n) AS BIGINT) AS actual_ppm,
          |  CAST(floor(n_pos * nt * 1000000 / (n * pt)) AS BIGINT)
          |    AS lift_ppm
          |FROM cb ORDER BY decile""".stripMargin)),

    // Per-language trimmed mean (RobustStats.trimmedMean): drop the
    // 5% rank-smallest and -largest rows, average the rest — the
    // heavy-tail-proof center the plain mean isn't. Trim cuts are
    // integer ranks (tied values straddling the cut contribute the
    // same sum either way), so both engines keep identical mass.
    QueryDef("q176_trimmed_mean",
      (s, dir) => RobustStats.trimmedMean(
          t(s, dir, "documents"), "lang", "n_chars", trimPpm = 50000L)
        .orderBy("lang"),
      Some("""WITH in0 AS (
             |  SELECT lang, CAST(n_chars AS BIGINT) AS x
             |  FROM documents WHERE n_chars IS NOT NULL),
             |r AS (SELECT lang, x,
             |    row_number() OVER (PARTITION BY lang ORDER BY x) AS i,
             |    count(*) OVER (PARTITION BY lang) AS nn
             |  FROM in0),
             |r2 AS (SELECT *, (nn * 50000) // 1000000 AS k FROM r),
             |a AS (SELECT lang, count(*) AS n,
             |    max(k) AS n_trimmed_each, sum(x) AS sx,
             |    sum(CASE WHEN i > k AND i <= nn - k THEN x ELSE 0 END)
             |      AS sk,
             |    sum(CASE WHEN i > k AND i <= nn - k THEN 1 ELSE 0 END)
             |      AS nk
             |  FROM r2 GROUP BY 1)
             |SELECT lang, CAST(n AS BIGINT) AS n,
             |  CAST(n_trimmed_each AS BIGINT) AS n_trimmed_each,
             |  round(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE), 4) AS mean,
             |  round(CAST(sk AS DOUBLE) / CAST(nk AS DOUBLE), 4)
             |    AS trimmed_mean
             |FROM a ORDER BY 1""".stripMargin)),

    // Mann–Whitney U per event type (RobustStats.mannWhitney): the
    // nonparametric two-sample test on cents spend between user-
    // parity arms — q167's CUPED assumes moments; this assumes only
    // ranks. Midranks are carried DOUBLED so tie averaging stays in
    // integer arithmetic; the tie-corrected normal z is the only
    // float step.
    QueryDef("q177_mann_whitney",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .withColumn("arm", pmod(col("user_id"), lit(2)).cast("int"))
          .withColumn("cents", round(col("value") * 100).cast("long"))
        RobustStats.mannWhitney(ev, "event_type", "arm", "cents")
          .orderBy("event_type")
      },
      Some("""WITH in0 AS (
             |  SELECT event_type, CAST(user_id % 2 AS INT) AS arm,
             |    CAST(round(value * 100) AS BIGINT) AS x
             |  FROM events WHERE value IS NOT NULL),
             |r AS (SELECT *, row_number() OVER (
             |    PARTITION BY event_type ORDER BY x) AS rn
             |  FROM in0),
             |m AS (SELECT *,
             |    min(rn) OVER (PARTITION BY event_type, x) +
             |    max(rn) OVER (PARTITION BY event_type, x) AS r2
             |  FROM r),
             |t AS (SELECT event_type, sum(t * t * t - t) AS tie
             |  FROM (SELECT event_type, x, count(*) AS t
             |        FROM in0 GROUP BY 1, 2)
             |  GROUP BY 1),
             |a AS (SELECT event_type, count(*) AS n,
             |    sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n1,
             |    sum(CASE WHEN arm = 1 THEN r2 ELSE 0 END) AS r2sum
             |  FROM m GROUP BY 1)
             |SELECT a.event_type, CAST(n - n1 AS BIGINT) AS n0,
             |  CAST(n1 AS BIGINT) AS n1,
             |  CAST(r2sum - n1 * (n1 + 1) AS DOUBLE) / 2.0 AS u1,
             |  round((CAST(r2sum - n1 * (n1 + 1) AS DOUBLE) / 2.0 -
             |      CAST(n1 AS DOUBLE) * CAST(n - n1 AS DOUBLE) / 2.0) /
             |    sqrt(CAST(n1 AS DOUBLE) * CAST(n - n1 AS DOUBLE) / 12.0 *
             |      (CAST(n + 1 AS DOUBLE) - CAST(tie AS DOUBLE) /
             |        (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)))), 4)
             |    AS z
             |FROM a JOIN t USING (event_type) ORDER BY 1""".stripMargin)),

    // χ² independence: is language distribution independent of
    // source (RobustStats.chiSquareIndependence)? Dense margin grid
    // so absent cells enter the statistic; expected counts and χ²
    // are rational expressions over the contingency counts. The
    // margin cross is #langs × #sources — aggregated frames only.
    QueryDef("q178_chi2_independence",
      (s, dir) => RobustStats.chiSquareIndependence(
          t(s, dir, "documents"), "lang", "source")
        .orderBy("a", "b"),
      Some("""WITH obs AS (
             |  SELECT lang AS a, source AS b, count(*) AS n_obs
             |  FROM documents
             |  WHERE lang IS NOT NULL AND source IS NOT NULL
             |  GROUP BY 1, 2),
             |am AS (SELECT a, sum(n_obs) AS n_a FROM obs GROUP BY 1),
             |bm AS (SELECT b, sum(n_obs) AS n_b FROM obs GROUP BY 1),
             |g AS (SELECT am.a, bm.b, n_a, n_b,
             |    coalesce(n_obs, 0) AS n_obs
             |  FROM am CROSS JOIN bm
             |  LEFT JOIN obs ON am.a = obs.a AND bm.b = obs.b),
             |w1 AS (SELECT *, sum(n_obs) OVER () AS nn FROM g),
             |w2 AS (SELECT *, CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) /
             |    CAST(nn AS DOUBLE) AS expected
             |  FROM w1),
             |w3 AS (SELECT *, sum((CAST(n_obs AS DOUBLE) - expected) *
             |    (CAST(n_obs AS DOUBLE) - expected) / expected)
             |    OVER () AS chi2
             |  FROM w2)
             |SELECT a, b, CAST(n_obs AS BIGINT) AS n_obs,
             |  round(expected, 4) AS expected, round(chi2, 4) AS chi2
             |FROM w3 ORDER BY 1, 2""".stripMargin)),

    // Trailing 7-day distinct users per event type (ops/
    // RollingDistinct.trailingDistinct): COUNT(DISTINCT) doesn't
    // decompose over windows, so the scale path builds DAILY KMV
    // sketches once and MERGES ≤7 of them per window — the window
    // compare runs on the (groups × days) sketch frame, never raw
    // data, and yesterday's sketches are reused tomorrow. Exact tier
    // rides along q154-style so the estimate's error is visible.
    QueryDef("q179_rolling_distinct",
      (s, dir) => {
        val ev = t(s, dir, "events").withColumn("day",
          expr("unix_micros(cast(ts as timestamp)) div 86400000000"))
        RollingDistinct.trailingDistinct(ev, "event_type", "day",
          "user_id", windowDays = 7, k = 64)
          .orderBy("g", "d")
      },
      Some(s"""WITH base AS (
             |  SELECT event_type AS g, epoch_us(ts) // 86400000000 AS d,
             |    user_id
             |  FROM events),
             |hh AS (SELECT g, d,
             |    ${Hashing.duckPortableHash("CAST(user_id AS VARCHAR)")}
             |      AS h
             |  FROM base),
             |daily AS (SELECT g, d,
             |    list_sort(list_distinct(list(h)))[1:64] AS sig
             |  FROM hh GROUP BY 1, 2),
             |days AS (SELECT DISTINCT g, d FROM daily),
             |mg AS (SELECT t.g, t.d, s.sig FROM days t JOIN daily s
             |  ON t.g = s.g AND s.d BETWEEN t.d - 6 AND t.d),
             |mx AS (SELECT g, d, hv FROM (
             |    SELECT g, d, unnest(sig) AS hv FROM mg)
             |  GROUP BY g, d, hv),
             |mu AS (SELECT g, d, list_sort(list(hv))[1:64] AS u
             |  FROM mx GROUP BY 1, 2),
             |est AS (SELECT g, d,
             |    round(CASE WHEN len(u) < 64 THEN CAST(len(u) AS DOUBLE)
             |      ELSE 63.0 * 1152921504606846976 / CAST(u[64] AS DOUBLE)
             |      END, 1) + 0.0 AS n_est
             |  FROM mu),
             |ed AS (SELECT DISTINCT g, d, user_id FROM base),
             |ex AS (SELECT t.g, t.d, count(DISTINCT s.user_id) AS n_exact
             |  FROM days t JOIN ed s
             |    ON t.g = s.g AND s.d BETWEEN t.d - 6 AND t.d
             |  GROUP BY 1, 2)
             |SELECT ex.g, CAST(ex.d AS BIGINT) AS d,
             |  CAST(n_exact AS BIGINT) AS n_exact, n_est
             |FROM ex JOIN est USING (g, d) ORDER BY 1, 2""".stripMargin)),

    // Item–item co-occurrence cosine (ops/CoOccurrence.itemCosine):
    // "customers who buy brand A also buy brand B" — the symmetric
    // similarity matrix a recommender / tag-consolidation pass
    // consumes, built on q161's scale skeleton (distinct grain,
    // entity-key self-join, integer counts, one rational cosine).
    QueryDef("q180_item_cosine",
      (s, dir) => {
        val basket = t(s, dir, "lineitem")
          .join(t(s, dir, "orders"),
            col("l_orderkey") === col("o_orderkey"))
          .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        CoOccurrence.itemCosine(basket, "o_custkey", "p_brand",
          minBoth = 20)
          .orderBy("item_a", "item_b")
      },
      Some("""WITH b AS (
             |  SELECT DISTINCT o_custkey AS e, p_brand AS item
             |  FROM lineitem
             |  JOIN orders ON l_orderkey = o_orderkey
             |  JOIN part ON l_partkey = p_partkey
             |  WHERE o_custkey IS NOT NULL AND p_brand IS NOT NULL),
             |c AS (SELECT item, count(*) AS n_item FROM b GROUP BY 1),
             |p AS (SELECT x.item AS item_a, y.item AS item_b,
             |    count(*) AS n_both
             |  FROM b x JOIN b y ON x.e = y.e AND x.item < y.item
             |  GROUP BY 1, 2 HAVING count(*) >= 20)
             |SELECT item_a, item_b, ca.n_item AS n_a, cb.n_item AS n_b,
             |  n_both,
             |  round(CAST(n_both AS DOUBLE) /
             |    sqrt(CAST(ca.n_item AS DOUBLE) * CAST(cb.n_item AS DOUBLE)),
             |    6) AS cosine
             |FROM p
             |JOIN c ca ON p.item_a = ca.item
             |JOIN c cb ON p.item_b = cb.item
             |ORDER BY 1, 2""".stripMargin)),

    // Day-of-week seasonality profile + anomaly gate (ops/Seasonal
    // .dowProfile): per (event type, weekday) the average daily
    // volume and share, plus how many individual days exceeded 1.5×
    // THEIR OWN weekday's mean — the cross-multiplied integer
    // compare, so the anomaly flag never touches floating point.
    QueryDef("q181_dow_seasonality",
      (s, dir) => {
        val ev = t(s, dir, "events").withColumn("day",
          expr("unix_micros(cast(ts as timestamp)) div 86400000000"))
        Seasonal.dowProfile(ev, "event_type", "day", kNum = 3L, kDen = 2L)
          .orderBy("g", "dow")
      },
      Some("""WITH daily AS (
             |  SELECT event_type AS g, epoch_us(ts) // 86400000000 AS d,
             |    count(*) AS day_n
             |  FROM events GROUP BY 1, 2),
             |dd AS (SELECT *, CAST((d + 3) % 7 + 1 AS INT) AS dow
             |  FROM daily),
             |slot AS (SELECT g, dow, count(*) AS n_days,
             |    sum(day_n) AS total
             |  FROM dd GROUP BY 1, 2),
             |fl AS (SELECT dd.g, dd.dow,
             |    sum(CASE WHEN day_n * n_days * 2 > 3 * total
             |      THEN 1 ELSE 0 END) AS n_anomaly_days
             |  FROM dd JOIN slot ON dd.g = slot.g AND dd.dow = slot.dow
             |  GROUP BY 1, 2),
             |tg AS (SELECT g, sum(total) AS g_total FROM slot GROUP BY 1)
             |SELECT slot.g, slot.dow, CAST(n_days AS BIGINT) AS n_days,
             |  CAST(total AS BIGINT) AS total,
             |  round(CAST(total AS DOUBLE) / CAST(n_days AS DOUBLE), 4)
             |    AS mean_daily,
             |  round(CAST(total AS DOUBLE) / CAST(g_total AS DOUBLE), 6)
             |    AS share,
             |  CAST(n_anomaly_days AS BIGINT) AS n_anomaly_days
             |FROM slot
             |JOIN fl ON slot.g = fl.g AND slot.dow = fl.dow
             |JOIN tg ON slot.g = tg.g
             |ORDER BY 1, 2""".stripMargin)),

    // Partitioning-skew audit (ops/ShardBalance.audit): per-shard row
    // counts + max/mean ppm for TWO candidate partitioners of
    // lineitem on l_suppkey — portable-hash mod vs equal-key-count
    // ranges — measured BEFORE committing a layout. All assignments
    // and the imbalance summary are exact integer arithmetic on the
    // per-key frame.
    QueryDef("q182_shard_balance",
      (s, dir) => ShardBalance.audit(
          t(s, dir, "lineitem"), "l_suppkey", shards = 16)
        .orderBy("strategy", "shard"),
      Some(s"""WITH pk AS (
             |  SELECT CAST(l_suppkey AS VARCHAR) AS k, count(*) AS kn
             |  FROM lineitem WHERE l_suppkey IS NOT NULL GROUP BY 1),
             |hs AS (SELECT 'hash' AS strategy,
             |    ${Hashing.duckPortableHash("k")} % 16 AS shard, kn
             |  FROM pk),
             |rs AS (SELECT 'keyrange' AS strategy,
             |    ((row_number() OVER (ORDER BY k) - 1) * 16) //
             |      (SELECT count(*) FROM pk) AS shard, kn
             |  FROM pk),
             |ps AS (SELECT strategy, shard, sum(kn) AS n_rows,
             |    count(*) AS n_keys
             |  FROM (SELECT * FROM hs UNION ALL SELECT * FROM rs)
             |  GROUP BY 1, 2),
             |w AS (SELECT *, sum(n_rows) OVER (PARTITION BY strategy)
             |    AS tot,
             |    max(n_rows) OVER (PARTITION BY strategy) AS mx
             |  FROM ps)
             |SELECT strategy, CAST(shard AS BIGINT) AS shard,
             |  CAST(n_rows AS BIGINT) AS n_rows,
             |  CAST(n_keys AS BIGINT) AS n_keys,
             |  CAST((mx * 16 * 1000000) // tot AS BIGINT)
             |    AS max_over_mean_ppm
             |FROM w ORDER BY 1, 2""".stripMargin)),

    // Three-way master-data reconciliation (ops/Reconcile.threeWay):
    // customer vs two perturbed system copies (B drops every 7th key
    // and rewrites every 11th segment; C drops every 13th and moves
    // every 5th nation) — per presence pattern, key counts and how
    // many multi-present keys disagree on content. Null-safe
    // equality: both-null agrees, null-vs-value conflicts.
    QueryDef("q183_three_way_reconcile",
      (s, dir) => {
        val cust = t(s, dir, "customer")
          .select("c_custkey", "c_nationkey", "c_mktsegment")
        val bCopy = cust.filter(col("c_custkey") % 7 =!= 0)
          .withColumn("c_mktsegment",
            when(col("c_custkey") % 11 === 0, lit("SYS_B"))
              .otherwise(col("c_mktsegment")))
        val cCopy = cust.filter(col("c_custkey") % 13 =!= 0)
          .withColumn("c_nationkey",
            when(col("c_custkey") % 5 === 0, col("c_nationkey") + 1)
              .otherwise(col("c_nationkey")))
        Reconcile.threeWay(cust, bCopy, cCopy, "c_custkey",
          Seq("c_nationkey", "c_mktsegment"))
          .orderBy("in_a", "in_b", "in_c")
      },
      Some("""WITH a AS (
             |  SELECT c_custkey AS k, c_nationkey AS nk, c_mktsegment AS seg
             |  FROM customer),
             |b AS (SELECT c_custkey AS k,
             |    c_nationkey AS nk,
             |    CASE WHEN c_custkey % 11 = 0 THEN 'SYS_B'
             |      ELSE c_mktsegment END AS seg
             |  FROM customer WHERE c_custkey % 7 <> 0),
             |c AS (SELECT c_custkey AS k,
             |    CASE WHEN c_custkey % 5 = 0 THEN c_nationkey + 1
             |      ELSE c_nationkey END AS nk,
             |    c_mktsegment AS seg
             |  FROM customer WHERE c_custkey % 13 <> 0),
             |j AS (SELECT
             |    a.k AS ka, b.k AS kb, c.k AS kc,
             |    a.nk AS nka, b.nk AS nkb, c.nk AS nkc,
             |    a.seg AS sega, b.seg AS segb, c.seg AS segc
             |  FROM a
             |  FULL JOIN b ON a.k = b.k
             |  FULL JOIN c ON coalesce(a.k, b.k) = c.k),
             |f AS (SELECT ka IS NOT NULL AS in_a, kb IS NOT NULL AS in_b,
             |    kc IS NOT NULL AS in_c,
             |    ((ka IS NOT NULL AND kb IS NOT NULL AND
             |       (nka IS DISTINCT FROM nkb OR sega IS DISTINCT FROM segb))
             |     OR (ka IS NOT NULL AND kc IS NOT NULL AND
             |       (nka IS DISTINCT FROM nkc OR sega IS DISTINCT FROM segc))
             |     OR (kb IS NOT NULL AND kc IS NOT NULL AND
             |       (nkb IS DISTINCT FROM nkc OR segb IS DISTINCT FROM segc)))
             |      AS conflict
             |  FROM j)
             |SELECT in_a, in_b, in_c, count(*) AS n_keys,
             |  CAST(sum(CASE WHEN conflict THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_conflicts
             |FROM f GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin)),

    // Weighted median (ops/WeightedStats.weightedQuantile): the
    // quantity level at which half the REVENUE sits, per return
    // flag — weights as integer cents, the quantile crossing as a
    // cross-multiplied integer compare over the per-(group, value)
    // frame, so tie handling is structural and float-free.
    QueryDef("q184_weighted_median",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
          .withColumn("price_cents",
            round(col("l_extendedprice") * 100).cast("long"))
        WeightedStats.weightedQuantile(li, "l_returnflag", "l_quantity",
          "price_cents", pNum = 1L, pDen = 2L)
          .orderBy("g")
      },
      Some("""WITH in0 AS (
             |  SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS v,
             |    CAST(round(l_extendedprice * 100) AS BIGINT) AS w
             |  FROM lineitem
             |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
             |pv AS (SELECT g, v, sum(w) AS vw FROM in0 GROUP BY 1, 2),
             |cm AS (SELECT *, sum(vw) OVER (PARTITION BY g ORDER BY v
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS cum,
             |    sum(vw) OVER (PARTITION BY g) AS tot
             |  FROM pv)
             |SELECT g, CAST(max(tot) AS BIGINT) AS total_weight,
             |  CAST(min(v) AS BIGINT) AS wquantile
             |FROM cm WHERE cum * 2 >= tot
             |GROUP BY g ORDER BY g""".stripMargin)),

    // Temporal anti-join (ops/TemporalAntiJoin.unansweredCounts):
    // clicks with NO purchase in the following hour, per user — the
    // time-bounded cousin of q142's key anti-join and the negative
    // of q60's as-of join. Gap compares in integer microseconds;
    // trigger grain kept by event_id under timestamp ties.
    QueryDef("q185_click_abandonment",
      (s, dir) => {
        val ev = t(s, dir, "events")
        TemporalAntiJoin.unansweredCounts(
          ev.filter(col("event_type") === "click"),
          ev.filter(col("event_type") === "purchase"),
          "user_id", "event_id", "ts", "ts",
          windowUs = 3600000000L)
          .orderBy("e")
      },
      Some("""WITH c AS (
             |  SELECT user_id AS e, event_id AS id, epoch_us(ts) AS ta
             |  FROM events WHERE event_type = 'click'),
             |p AS (SELECT user_id AS e, epoch_us(ts) AS tb
             |  FROM events WHERE event_type = 'purchase'),
             |j AS (SELECT c.e, c.id,
             |    max(CASE WHEN tb > ta AND tb <= ta + 3600000000
             |      THEN 1 ELSE 0 END) AS answered
             |  FROM c LEFT JOIN p ON c.e = p.e GROUP BY 1, 2)
             |SELECT e, count(*) AS n_triggers,
             |  CAST(sum(1 - answered) AS BIGINT) AS n_unanswered
             |FROM j GROUP BY 1 ORDER BY 1""".stripMargin)),

    // CUSUM change-point detection (ops/ChangePoint.cusumPeak): the
    // day each event type's cumulative volume deviates most from its
    // constant-rate line — regime-change detection with the cross-
    // multiplied integer statistic |S_i·m − i·S_m|; only the
    // normalized magnitude divides. Ties break on the earliest day.
    QueryDef("q186_cusum_changepoint",
      (s, dir) => {
        val ev = t(s, dir, "events").withColumn("day",
          expr("unix_micros(cast(ts as timestamp)) div 86400000000"))
        ChangePoint.cusumPeak(ev, "event_type", "day").orderBy("g")
      },
      Some("""WITH daily AS (
             |  SELECT event_type AS g, epoch_us(ts) // 86400000000
             |      AS slot,
             |    count(*) AS n
             |  FROM events GROUP BY 1, 2),
             |sc AS (SELECT *,
             |    row_number() OVER (PARTITION BY g ORDER BY slot) AS i,
             |    sum(n) OVER (PARTITION BY g ORDER BY slot
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS cum,
             |    count(*) OVER (PARTITION BY g) AS m,
             |    sum(n) OVER (PARTITION BY g) AS tot
             |  FROM daily),
             |dv AS (SELECT g, slot, m, tot,
             |    abs(cum * m - i * tot) AS dev
             |  FROM sc),
             |pk AS (SELECT *, row_number() OVER (
             |    PARTITION BY g ORDER BY dev DESC, slot) AS rk
             |  FROM dv)
             |SELECT g, CAST(m AS BIGINT) AS m,
             |  CAST(tot AS BIGINT) AS total,
             |  CAST(slot AS BIGINT) AS peak_slot,
             |  CAST(dev AS BIGINT) AS peak_stat,
             |  round(CAST(dev AS DOUBLE) / CAST(m * tot AS DOUBLE), 6)
             |    AS peak_norm
             |FROM pk WHERE rk = 1 ORDER BY g""".stripMargin)),

    // Hierarchical ratio-to-parent (region → nation revenue shares):
    // each nation's exact-cents revenue with its share of the parent
    // region and of the whole — the drill-down contribution view
    // ROLLUP's subtotal rows (q136) don't directly give. Integer
    // cents sums; shares are single divisions.
    QueryDef("q187_hierarchy_shares",
      (s, dir) => {
        val rev = t(s, dir, "orders")
          .join(t(s, dir, "customer"),
            col("o_custkey") === col("c_custkey"))
          .join(t(s, dir, "nation"),
            col("c_nationkey") === col("n_nationkey"))
          .join(t(s, dir, "region"),
            col("n_regionkey") === col("r_regionkey"))
          .groupBy("r_name", "n_name")
          .agg(sum(round(col("o_totalprice") * 100).cast("long"))
            .as("cents"))
        val wR = Window.partitionBy("r_name")
        val wAll = Window.partitionBy()
        rev
          .withColumn("_r", sum("cents").over(wR))
          .withColumn("_t", sum("cents").over(wAll))
          .select(col("r_name"), col("n_name"), col("cents"),
            round(col("cents").cast("double") / col("_r").cast("double"), 6)
              .as("share_of_region"),
            round(col("cents").cast("double") / col("_t").cast("double"), 6)
              .as("share_of_total"))
          .orderBy("r_name", "n_name")
      },
      Some("""WITH rev AS (
             |  SELECT r_name, n_name,
             |    sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
             |  FROM orders
             |  JOIN customer ON o_custkey = c_custkey
             |  JOIN nation ON c_nationkey = n_nationkey
             |  JOIN region ON n_regionkey = r_regionkey
             |  GROUP BY 1, 2),
             |w AS (SELECT *, sum(cents) OVER (PARTITION BY r_name) AS r,
             |    sum(cents) OVER () AS t
             |  FROM rev)
             |SELECT r_name, n_name, CAST(cents AS BIGINT) AS cents,
             |  round(CAST(cents AS DOUBLE) / CAST(r AS DOUBLE), 6)
             |    AS share_of_region,
             |  round(CAST(cents AS DOUBLE) / CAST(t AS DOUBLE), 6)
             |    AS share_of_total
             |FROM w ORDER BY 1, 2""".stripMargin)),

    // Join-explosion forecast (ops/JoinDiagnostics.predictJoinSize):
    // the EXACT output size of the lineitem×lineitem partkey self-
    // join — Σ n(k)² — computed from the key frames without running
    // the join, plus the top contributing keys (the salting shopping
    // list). The exact tier of the q154 KMV estimate.
    QueryDef("q188_join_forecast",
      (s, dir) => JoinDiagnostics.predictJoinSize(
          t(s, dir, "lineitem"), "l_partkey",
          t(s, dir, "lineitem"), "l_partkey", topK = 10)
        .orderBy("rank"),
      Some("""WITH la AS (
             |  SELECT CAST(l_partkey AS VARCHAR) AS key,
             |    count(*) AS n_left
             |  FROM lineitem WHERE l_partkey IS NOT NULL GROUP BY 1),
             |j AS (SELECT la.key, la.n_left, ra.n_left AS n_right
             |  FROM la JOIN la ra ON la.key = ra.key),
             |calc AS (SELECT key, n_left, n_right,
             |    n_left * n_right AS out_rows
             |  FROM j),
             |w AS (SELECT *, sum(out_rows) OVER () AS total_out_rows,
             |    row_number() OVER (ORDER BY out_rows DESC, key)
             |      AS "rank"
             |  FROM calc)
             |SELECT CAST("rank" AS INT) AS "rank", key,
             |  CAST(n_left AS BIGINT) AS n_left,
             |  CAST(n_right AS BIGINT) AS n_right,
             |  CAST(out_rows AS BIGINT) AS out_rows,
             |  CAST(total_out_rows AS BIGINT) AS total_out_rows,
             |  CAST((out_rows * 1000000) // total_out_rows AS BIGINT)
             |    AS top_share_ppm
             |FROM w WHERE "rank" <= 10 ORDER BY "rank"""".stripMargin)),

    // Interval coalescing / islands (ops/Intervals.coalesce): per
    // supplier, shipment intervals [ship_day, ship_day + quantity]
    // merged wherever they overlap or touch — running-max island
    // detection, all integer compares, tie handling structural.
    QueryDef("q189_interval_coalesce",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
          .withColumn("ship_day",
            expr("unix_micros(cast(l_shipdate as timestamp))" +
              " div 86400000000"))
          .withColumn("end_day",
            col("ship_day") + col("l_quantity").cast("long"))
        Intervals.coalesceIntervals(li, "l_suppkey", "ship_day", "end_day")
          .groupBy("k")
          .agg(count(lit(1)).as("n_islands"),
            sum(col("island_end") - col("island_start") + 1)
              .as("covered_days"),
            max("n_merged").as("max_merged"))
          .orderBy("k")
      },
      Some("""WITH iv AS (
             |  SELECT l_suppkey AS k,
             |    epoch_us(l_shipdate) // 86400000000 AS s,
             |    epoch_us(l_shipdate) // 86400000000 +
             |      CAST(l_quantity AS BIGINT) AS e
             |  FROM lineitem),
             |o AS (SELECT *, max(e) OVER (PARTITION BY k ORDER BY s, e
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             |    AS pme
             |  FROM iv),
             |f AS (SELECT *, CASE WHEN pme IS NULL OR s > pme + 1
             |    THEN 1 ELSE 0 END AS nw
             |  FROM o),
             |g AS (SELECT *, sum(nw) OVER (PARTITION BY k
             |    ORDER BY s, e
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |    AS island
             |  FROM f),
             |isl AS (SELECT k, island, min(s) AS st, max(e) AS en,
             |    count(*) AS nm
             |  FROM g GROUP BY 1, 2)
             |SELECT k, count(*) AS n_islands,
             |  CAST(sum(en - st + 1) AS BIGINT) AS covered_days,
             |  CAST(max(nm) AS BIGINT) AS max_merged
             |FROM isl GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Activity-gap profile (ops/Intervals.gapProfile): per user, the
    // holes in their daily activity series — gap count and longest
    // gap from lag arithmetic on the distinct (user, day) frame.
    QueryDef("q190_activity_gaps",
      (s, dir) => {
        val ev = t(s, dir, "events").withColumn("day",
          expr("unix_micros(cast(ts as timestamp)) div 86400000000"))
        Intervals.gapProfile(ev, "user_id", "day").orderBy("k")
      },
      Some("""WITH s0 AS (
             |  SELECT DISTINCT user_id AS k,
             |    epoch_us(ts) // 86400000000 AS slot
             |  FROM events),
             |l AS (SELECT *, slot - lag(slot) OVER (
             |    PARTITION BY k ORDER BY slot) - 1 AS gap
             |  FROM s0)
             |SELECT k, count(*) AS n_slots,
             |  CAST(min(slot) AS BIGINT) AS first_slot,
             |  CAST(max(slot) AS BIGINT) AS last_slot,
             |  CAST(sum(CASE WHEN gap > 0 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_gaps,
             |  CAST(coalesce(max(CASE WHEN gap > 0 THEN gap END), 0)
             |    AS BIGINT) AS longest_gap
             |FROM l GROUP BY 1 ORDER BY 1""".stripMargin)),

    // RFM segmentation (ops/Rfm.segments): customers quintiled on
    // recency (last order day) / frequency / monetary (exact cents),
    // counted per (R, F, M) cell. Quintile cuts are integer rank
    // arithmetic with key tie-breaks — every cell assignment
    // reproducible.
    QueryDef("q191_rfm_segments",
      (s, dir) => {
        val o = t(s, dir, "orders")
          .withColumn("day",
            expr("unix_micros(cast(o_orderdate as timestamp))" +
              " div 86400000000"))
          .withColumn("cents",
            round(col("o_totalprice") * 100).cast("long"))
        Rfm.segments(o, "o_custkey", "day", "cents")
          .orderBy("r_q", "f_q", "m_q")
      },
      Some("""WITH per AS (
             |  SELECT o_custkey AS e,
             |    max(epoch_us(o_orderdate) // 86400000000) AS last_slot,
             |    count(*) AS freq,
             |    sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
             |  FROM orders GROUP BY 1),
             |w AS (SELECT *, count(*) OVER () AS n,
             |    row_number() OVER (ORDER BY last_slot, e) AS rr,
             |    row_number() OVER (ORDER BY freq, e) AS rf,
             |    row_number() OVER (ORDER BY cents, e) AS rm
             |  FROM per),
             |qq AS (SELECT
             |    CAST(((rr - 1) * 5) // n + 1 AS INT) AS r_q,
             |    CAST(((rf - 1) * 5) // n + 1 AS INT) AS f_q,
             |    CAST(((rm - 1) * 5) // n + 1 AS INT) AS m_q,
             |    cents
             |  FROM w)
             |SELECT r_q, f_q, m_q, count(*) AS n_entities,
             |  CAST(sum(cents) AS BIGINT) AS total_cents
             |FROM qq GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin)),

    // PSI drift (ops/Drift.psiFromHists): the same two corpora as
    // q160's KS gate, scored with the Population Stability Index —
    // KS sees the worst single quantile shift, PSI accumulates mass
    // moved across ALL buckets (the industry ML-monitoring metric
    // with its ε-floor convention). Counts come off the portable
    // histogram sketch; p/q/log terms are fixed-shape doubles.
    QueryDef("q192_psi_drift",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val a = docs.filter(col("doc_id") % 2 === 0)
        val b = docs.filter(col("doc_id") % 2 =!= 0)
          .withColumn("n_chars", col("n_chars") + lit(100L))
        Drift.psiFromHists(a, b, "lang", "n_chars",
          lo = 0.0, hi = 1024.0, nbins = 256, eps = 1e-4)
          .orderBy("lang")
      },
      Some("""WITH aa AS (
             |  SELECT lang, CAST(least(greatest(
             |      floor(CAST(n_chars AS DOUBLE) / 4.0), 0), 255)
             |      AS BIGINT) AS b
             |  FROM documents WHERE doc_id % 2 = 0 AND n_chars IS NOT NULL),
             |bb AS (
             |  SELECT lang, CAST(least(greatest(
             |      floor(CAST(n_chars + 100 AS DOUBLE) / 4.0), 0), 255)
             |      AS BIGINT) AS b
             |  FROM documents WHERE doc_id % 2 <> 0 AND n_chars IS NOT NULL),
             |langs AS (SELECT DISTINCT lang FROM documents),
             |grid AS (SELECT lang, s AS b FROM langs
             |         CROSS JOIN (SELECT unnest(range(256)) AS s)),
             |ka AS (SELECT lang, b, count(*) AS c FROM aa GROUP BY 1, 2),
             |kb AS (SELECT lang, b, count(*) AS c FROM bb GROUP BY 1, 2),
             |j AS (SELECT g.lang, g.b, coalesce(ka.c, 0) AS ca,
             |        coalesce(kb.c, 0) AS cb
             |      FROM grid g
             |      LEFT JOIN ka ON g.lang = ka.lang AND g.b = ka.b
             |      LEFT JOIN kb ON g.lang = kb.lang AND g.b = kb.b),
             |cum AS (SELECT lang, b, ca, cb,
             |          sum(ca) OVER w AS n_a, sum(cb) OVER w AS n_b
             |        FROM j WINDOW w AS (PARTITION BY lang)),
             |pq AS (SELECT lang, n_a, n_b,
             |    greatest(CAST(ca AS DOUBLE) / CAST(n_a AS DOUBLE),
             |      0.0001) AS p,
             |    greatest(CAST(cb AS DOUBLE) / CAST(n_b AS DOUBLE),
             |      0.0001) AS q
             |  FROM cum WHERE n_a > 0 AND n_b > 0)
             |SELECT lang, CAST(n_a AS BIGINT) AS n_a,
             |  CAST(n_b AS BIGINT) AS n_b,
             |  round(sum((p - q) * ln(p / q)), 4) + 0.0 AS psi
             |FROM pq GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin)),

    // Pairwise Pearson correlation matrix (ops/CorrMatrix
    // .pearsonPairs): all six pairs of lineitem's numeric features
    // from ONE pass of exact integer moments (quantity units,
    // truncated dollars, percent discount/tax), combined in fixed-
    // shape double expressions — the q167 determinism recipe applied
    // to profiling.
    QueryDef("q193_corr_matrix",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
          .select(col("l_quantity").cast("long").as("qty"),
            col("l_extendedprice").cast("long").as("dollars"),
            round(col("l_discount") * 100).cast("long").as("disc_pct"),
            round(col("l_tax") * 100).cast("long").as("tax_pct"))
        CorrMatrix.pearsonPairs(li,
          Seq("qty", "dollars", "disc_pct", "tax_pct"))
          .orderBy("col_a", "col_b")
      },
      Some("""WITH v AS (
             |  SELECT CAST(l_quantity AS BIGINT) AS qty,
             |    CAST(trunc(CAST(l_extendedprice AS DOUBLE)) AS BIGINT)
             |      AS dollars,
             |    CAST(round(l_discount * 100) AS BIGINT) AS disc_pct,
             |    CAST(round(l_tax * 100) AS BIGINT) AS tax_pct
             |  FROM lineitem
             |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
             |    AND l_discount IS NOT NULL AND l_tax IS NOT NULL),
             |m AS (SELECT count(*) AS n,
             |    sum(qty) AS s_qty, sum(dollars) AS s_dollars,
             |    sum(disc_pct) AS s_disc, sum(tax_pct) AS s_tax,
             |    sum(qty * qty) AS ss_qty,
             |    sum(dollars * dollars) AS ss_dollars,
             |    sum(disc_pct * disc_pct) AS ss_disc,
             |    sum(tax_pct * tax_pct) AS ss_tax,
             |    sum(qty * dollars) AS sp_qty_dollars,
             |    sum(qty * disc_pct) AS sp_qty_disc,
             |    sum(qty * tax_pct) AS sp_qty_tax,
             |    sum(dollars * disc_pct) AS sp_dollars_disc,
             |    sum(dollars * tax_pct) AS sp_dollars_tax,
             |    sum(disc_pct * tax_pct) AS sp_disc_tax
             |  FROM v),
             |p AS (
             |  SELECT 'qty' AS col_a, 'dollars' AS col_b, n,
             |    sp_qty_dollars AS sp, s_qty AS sa, s_dollars AS sb,
             |    ss_qty AS ssa, ss_dollars AS ssb FROM m
             |  UNION ALL SELECT 'qty', 'disc_pct', n, sp_qty_disc,
             |    s_qty, s_disc, ss_qty, ss_disc FROM m
             |  UNION ALL SELECT 'qty', 'tax_pct', n, sp_qty_tax,
             |    s_qty, s_tax, ss_qty, ss_tax FROM m
             |  UNION ALL SELECT 'dollars', 'disc_pct', n,
             |    sp_dollars_disc, s_dollars, s_disc, ss_dollars,
             |    ss_disc FROM m
             |  UNION ALL SELECT 'dollars', 'tax_pct', n, sp_dollars_tax,
             |    s_dollars, s_tax, ss_dollars, ss_tax FROM m
             |  UNION ALL SELECT 'disc_pct', 'tax_pct', n, sp_disc_tax,
             |    s_disc, s_tax, ss_disc, ss_tax FROM m)
             |SELECT col_a, col_b, CAST(n AS BIGINT) AS n,
             |  CASE WHEN
             |      CAST(n AS DOUBLE) * CAST(ssa AS DOUBLE) -
             |        CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE) > 0
             |    AND CAST(n AS DOUBLE) * CAST(ssb AS DOUBLE) -
             |        CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE) > 0
             |    THEN round(
             |      (CAST(n AS DOUBLE) * CAST(sp AS DOUBLE) -
             |        CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE)) /
             |      sqrt((CAST(n AS DOUBLE) * CAST(ssa AS DOUBLE) -
             |          CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)) *
             |        (CAST(n AS DOUBLE) * CAST(ssb AS DOUBLE) -
             |          CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))), 6)
             |    END AS r
             |FROM p ORDER BY 1, 2""".stripMargin)),

    // 7-day bounce-back retention (ops/Retention.nDayRetention): of
    // the users active on day d, how many were active again on d+7 —
    // the day-grain engagement curve beside q134's cohort triangle.
    // Distinct-frame self-join on (entity, day+N); integer counts,
    // floor-ppm rate.
    QueryDef("q194_nday_retention",
      (s, dir) => {
        val ev = t(s, dir, "events").withColumn("day",
          expr("unix_micros(cast(ts as timestamp)) div 86400000000"))
        Retention.nDayRetention(ev, "user_id", "day", n = 7)
          .orderBy("d")
      },
      Some("""WITH act AS (
             |  SELECT DISTINCT user_id AS e,
             |    epoch_us(ts) // 86400000000 AS d
             |  FROM events),
             |fut AS (SELECT DISTINCT e, d - 7 AS d FROM act),
             |j AS (SELECT act.e, act.d,
             |    CASE WHEN fut.e IS NULL THEN 0 ELSE 1 END AS hit
             |  FROM act LEFT JOIN fut ON act.e = fut.e AND act.d = fut.d)
             |SELECT CAST(d AS BIGINT) AS d, count(*) AS n_active,
             |  CAST(sum(hit) AS BIGINT) AS n_retained,
             |  CAST((sum(hit) * 1000000) // count(*) AS BIGINT)
             |    AS retained_ppm
             |FROM j GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Period-over-period change decomposition (ops/
    // ChangeDecomposition.volumeRate): revenue change per order
    // priority between the first and second half of the order
    // history, split into volume effect (order count at old rate)
    // and rate effect (new orders spending differently) — Δ ≡
    // volume + rate per segment. Integer cents moments, fixed-shape
    // double effects.
    QueryDef("q195_change_decomposition",
      (s, dir) => {
        val o = t(s, dir, "orders")
          .withColumn("period",
            when(col("o_orderdate") <
              lit("1995-06-01 00:00:00").cast("timestamp_ntz"), 0)
              .otherwise(1))
          .withColumn("cents",
            round(col("o_totalprice") * 100).cast("long"))
        ChangeDecomposition.volumeRate(o, "o_orderpriority", "period",
          "cents")
          .orderBy("seg")
      },
      Some("""WITH o AS (
             |  SELECT o_orderpriority AS seg,
             |    CASE WHEN o_orderdate < TIMESTAMP '1995-06-01 00:00:00'
             |      THEN 0 ELSE 1 END AS p,
             |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
             |  FROM orders),
             |a AS (SELECT seg,
             |    sum(CASE WHEN p = 0 THEN 1 ELSE 0 END) AS n1,
             |    sum(CASE WHEN p = 1 THEN 1 ELSE 0 END) AS n2,
             |    sum(CASE WHEN p = 0 THEN cents ELSE 0 END) AS c1,
             |    sum(CASE WHEN p = 1 THEN cents ELSE 0 END) AS c2
             |  FROM o GROUP BY 1)
             |SELECT seg, CAST(n1 AS BIGINT) AS n1,
             |  CAST(n2 AS BIGINT) AS n2, CAST(c1 AS BIGINT) AS c1,
             |  CAST(c2 AS BIGINT) AS c2,
             |  CAST(c2 - c1 AS BIGINT) AS delta_cents,
             |  round(CASE WHEN n1 > 0
             |    THEN (CAST(n2 AS DOUBLE) - CAST(n1 AS DOUBLE)) *
             |      (CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE)) / 100.0
             |    ELSE CAST(c2 AS DOUBLE) / 100.0 END, 2)
             |    AS volume_effect,
             |  round(CASE WHEN n1 > 0 AND n2 > 0
             |    THEN CAST(n2 AS DOUBLE) *
             |      (CAST(c2 AS DOUBLE) / CAST(n2 AS DOUBLE) -
             |       CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE)) / 100.0
             |    ELSE 0.0 END, 2) AS rate_effect
             |FROM a ORDER BY 1""".stripMargin)),

    // Point-in-time SCD2 lookup (q157's history joined by version
    // interval): each order resolves the customer attributes that
    // were CURRENT at its version — the temporal dim join every
    // warehouse needs once history exists. Interval containment
    // against the broadcast-sized dim; open intervals via null
    // valid_to.
    QueryDef("q196_scd2_lookup",
      (s, dir) => {
        val cust = t(s, dir, "customer")
          .select("c_custkey", "c_nationkey", "c_mktsegment")
        val bump = when(col("c_custkey") % 7 === 0,
          col("c_nationkey") + 1).otherwise(col("c_nationkey"))
        val v1 = cust.withColumn("ver", lit(1))
        val v2 = cust.filter(col("c_custkey") % 11 =!= 0)
          .withColumn("c_nationkey", bump)
          .withColumn("ver", lit(2))
        val v3 = cust
          .withColumn("c_nationkey", bump)
          .withColumn("c_mktsegment", when(col("c_custkey") % 5 === 0,
            lit("MOVED")).otherwise(col("c_mktsegment")))
          .withColumn("ver", lit(3))
        val hist = Scd2.history(v1.unionByName(v2).unionByName(v3),
          "c_custkey", "ver", Seq("c_nationkey", "c_mktsegment"))
        val facts = t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"),
            (lit(1) + pmod(col("o_orderkey"), lit(3))).as("ver"))
        facts.join(hist,
            col("o_custkey") === col("c_custkey") &&
              col("ver") >= col("valid_from") &&
              (col("valid_to").isNull || col("ver") <= col("valid_to")))
          .groupBy(col("ver"), col("c_mktsegment").as("seg"))
          .agg(count(lit(1)).as("n_orders"))
          .orderBy("ver", "seg")
      },
      Some(s"""WITH v1 AS (
             |  SELECT c_custkey, c_nationkey, c_mktsegment, 1 AS ver
             |  FROM customer),
             |v2 AS (
             |  SELECT c_custkey,
             |    CASE WHEN c_custkey % 7 = 0 THEN c_nationkey + 1
             |      ELSE c_nationkey END AS c_nationkey,
             |    c_mktsegment, 2 AS ver
             |  FROM customer WHERE c_custkey % 11 <> 0),
             |v3 AS (
             |  SELECT c_custkey,
             |    CASE WHEN c_custkey % 7 = 0 THEN c_nationkey + 1
             |      ELSE c_nationkey END AS c_nationkey,
             |    CASE WHEN c_custkey % 5 = 0 THEN 'MOVED'
             |      ELSE c_mktsegment END AS c_mktsegment,
             |    3 AS ver FROM customer),
             |vlog AS (SELECT * FROM v1 UNION ALL SELECT * FROM v2
             |         UNION ALL SELECT * FROM v3),
             |f AS (SELECT *, ${SnapshotDiff.duckFingerprint(
                      Seq("c_nationkey", "c_mktsegment"))} AS fp
             |      FROM vlog),
             |g AS (SELECT *, CASE WHEN lag(fp) OVER w IS NULL
             |        OR lag(fp) OVER w <> fp THEN 1 ELSE 0 END AS nr
             |      FROM f WINDOW w AS (PARTITION BY c_custkey ORDER BY ver)),
             |r AS (SELECT *, sum(nr) OVER (
             |        PARTITION BY c_custkey ORDER BY ver) AS run
             |      FROM g),
             |runs AS (SELECT c_custkey, run, min(ver) AS valid_from,
             |         min(c_mktsegment) AS seg
             |         FROM r GROUP BY 1, 2),
             |iv AS (SELECT c_custkey, valid_from, seg,
             |         lead(valid_from) OVER (
             |           PARTITION BY c_custkey ORDER BY valid_from) - 1
             |           AS valid_to
             |       FROM runs),
             |facts AS (SELECT o_orderkey, o_custkey,
             |    1 + o_orderkey % 3 AS ver
             |  FROM orders),
             |j AS (SELECT fa.ver, iv.seg
             |  FROM facts fa JOIN iv
             |    ON fa.o_custkey = iv.c_custkey
             |    AND fa.ver >= iv.valid_from
             |    AND (iv.valid_to IS NULL OR fa.ver <= iv.valid_to))
             |SELECT CAST(ver AS BIGINT) AS ver, seg,
             |  count(*) AS n_orders
             |FROM j GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Exact per-group mode (ops/Categorical.mode): the most frequent
    // document length per language, ties broken by the smallest
    // value — a deterministic tie POLICY, never first-seen (which is
    // partitioning-dependent). Count aggregate + argmax window on
    // the (group, value) frame.
    QueryDef("q197_group_mode",
      (s, dir) => Categorical.mode(
          t(s, dir, "documents"), "lang", "n_chars")
        .orderBy("g"),
      Some("""WITH c AS (
             |  SELECT lang AS g, CAST(n_chars AS VARCHAR) AS v,
             |    count(*) AS n
             |  FROM documents WHERE n_chars IS NOT NULL GROUP BY 1, 2),
             |r AS (SELECT *,
             |    row_number() OVER (PARTITION BY g ORDER BY n DESC, v)
             |      AS rk,
             |    count(*) OVER (PARTITION BY g) AS nd
             |  FROM c)
             |SELECT g, v AS mode, CAST(n AS BIGINT) AS mode_n,
             |  CAST(nd AS BIGINT) AS n_distinct
             |FROM r WHERE rk = 1 ORDER BY g""".stripMargin)),

    // Cramér's V association matrix (ops/Categorical.cramersV): the
    // categorical counterpart of q193's Pearson matrix — χ² answers
    // "dependent?", V = √(χ²/(n·min(r−1,c−1))) answers "how much"
    // on one [0,1] scale, here for (lang, source) and
    // (orderpriority, orderstatus).
    QueryDef("q198_cramers_v",
      (s, dir) => Categorical.cramersV(
          t(s, dir, "documents"), Seq(("lang", "source")))
        .unionByName(Categorical.cramersV(
          t(s, dir, "orders"),
          Seq(("o_orderpriority", "o_orderstatus"))))
        .orderBy("col_a"),
      Some("""WITH obs1 AS (
             |  SELECT CAST(lang AS VARCHAR) AS x,
             |    CAST(source AS VARCHAR) AS y, count(*) AS n_obs
             |  FROM documents
             |  WHERE lang IS NOT NULL AND source IS NOT NULL
             |  GROUP BY 1, 2),
             |am1 AS (SELECT x, sum(n_obs) AS n_x FROM obs1 GROUP BY 1),
             |bm1 AS (SELECT y, sum(n_obs) AS n_y FROM obs1 GROUP BY 1),
             |g1 AS (SELECT am1.x, bm1.y, n_x, n_y,
             |    coalesce(n_obs, 0) AS n_obs
             |  FROM am1 CROSS JOIN bm1
             |  LEFT JOIN obs1 ON am1.x = obs1.x AND bm1.y = obs1.y),
             |w1 AS (SELECT *, sum(n_obs) OVER () AS nn FROM g1),
             |t1 AS (SELECT nn,
             |    CAST(n_x AS DOUBLE) * CAST(n_y AS DOUBLE) /
             |      CAST(nn AS DOUBLE) AS e, n_obs
             |  FROM w1),
             |c1 AS (SELECT max(nn) AS n,
             |    sum((CAST(n_obs AS DOUBLE) - e) *
             |      (CAST(n_obs AS DOUBLE) - e) / e) AS chi2
             |  FROM t1),
             |v1r AS (SELECT 'lang' AS col_a, 'source' AS col_b,
             |  CAST(n AS BIGINT) AS n, round(chi2, 4) + 0.0 AS chi2,
             |  round(sqrt(chi2 / (CAST(n AS DOUBLE) * CAST(least(
             |    (SELECT count(*) FROM am1) - 1,
             |    (SELECT count(*) FROM bm1) - 1) AS DOUBLE))), 4) AS v
             |  FROM c1),
             |obs2 AS (
             |  SELECT CAST(o_orderpriority AS VARCHAR) AS x,
             |    CAST(o_orderstatus AS VARCHAR) AS y, count(*) AS n_obs
             |  FROM orders
             |  WHERE o_orderpriority IS NOT NULL
             |    AND o_orderstatus IS NOT NULL
             |  GROUP BY 1, 2),
             |am2 AS (SELECT x, sum(n_obs) AS n_x FROM obs2 GROUP BY 1),
             |bm2 AS (SELECT y, sum(n_obs) AS n_y FROM obs2 GROUP BY 1),
             |g2 AS (SELECT am2.x, bm2.y, n_x, n_y,
             |    coalesce(n_obs, 0) AS n_obs
             |  FROM am2 CROSS JOIN bm2
             |  LEFT JOIN obs2 ON am2.x = obs2.x AND bm2.y = obs2.y),
             |w2 AS (SELECT *, sum(n_obs) OVER () AS nn FROM g2),
             |t2 AS (SELECT nn,
             |    CAST(n_x AS DOUBLE) * CAST(n_y AS DOUBLE) /
             |      CAST(nn AS DOUBLE) AS e, n_obs
             |  FROM w2),
             |c2 AS (SELECT max(nn) AS n,
             |    sum((CAST(n_obs AS DOUBLE) - e) *
             |      (CAST(n_obs AS DOUBLE) - e) / e) AS chi2
             |  FROM t2),
             |v2r AS (SELECT 'o_orderpriority' AS col_a,
             |  'o_orderstatus' AS col_b,
             |  CAST(n AS BIGINT) AS n, round(chi2, 4) + 0.0 AS chi2,
             |  round(sqrt(chi2 / (CAST(n AS DOUBLE) * CAST(least(
             |    (SELECT count(*) FROM am2) - 1,
             |    (SELECT count(*) FROM bm2) - 1) AS DOUBLE))), 4) AS v
             |  FROM c2)
             |SELECT * FROM v1r UNION ALL SELECT * FROM v2r
             |ORDER BY col_a""".stripMargin)),

    // Crosstab with margins: the (lang × source) count matrix plus
    // row/column/grand totals in one pass via GROUPING SETS — the
    // report shape q125's plain pivot and q141's CUBE flags both
    // stop short of (margins labeled in-band as 'ALL', not emitted
    // as separate queries).
    QueryDef("q199_crosstab_margins",
      (s, dir) => {
        // CUBE(lang, source) = exactly the four grouping sets — ONE
        // pass through Expand, not four scans; grouping() (not a
        // null check) labels the margins so a null data value could
        // never masquerade as a total.
        t(s, dir, "documents")
          .cube("lang", "source")
          .agg(count(lit(1)).as("n"),
            grouping(col("lang")).as("_gl"),
            grouping(col("source")).as("_gs"))
          .select(
            when(col("_gl") === 1, lit("ALL"))
              .otherwise(col("lang")).as("lang"),
            when(col("_gs") === 1, lit("ALL"))
              .otherwise(col("source")).as("source"),
            col("n"))
          .orderBy("lang", "source")
      },
      Some("""SELECT coalesce(lang, 'ALL') AS lang,
             |  coalesce(source, 'ALL') AS source, count(*) AS n
             |FROM documents
             |GROUP BY GROUPING SETS ((lang, source), (lang), (source),
             |  ())
             |ORDER BY 1, 2""".stripMargin)),

    // Rank-with-ties leaderboard: top-3 revenue parts per brand with
    // RANK semantics — boundary ties are KEPT (row_number would
    // arbitrarily cut them; the q17/q80 row_number queries pin the
    // other policy). Revenue in exact cents so tie groups are exact.
    QueryDef("q200_topk_with_ties",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
          .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
          .groupBy("p_brand", "p_partkey")
          .agg(sum(round(col("l_extendedprice") * 100).cast("long"))
            .as("cents"))
        val rk = Window.partitionBy("p_brand").orderBy(col("cents").desc)
        li.withColumn("rnk", rank().over(rk).cast("int"))
          .where(col("rnk") <= 3)
          .orderBy("p_brand", "rnk", "p_partkey")
          .select("p_brand", "rnk", "p_partkey", "cents")
      },
      Some("""WITH rev AS (
             |  SELECT p_brand, p_partkey,
             |    sum(CAST(round(l_extendedprice * 100) AS BIGINT))
             |      AS cents
             |  FROM lineitem JOIN part ON l_partkey = p_partkey
             |  GROUP BY 1, 2),
             |r AS (SELECT *, CAST(rank() OVER (PARTITION BY p_brand
             |    ORDER BY cents DESC) AS INT) AS rnk
             |  FROM rev)
             |SELECT p_brand, rnk, p_partkey, CAST(cents AS BIGINT)
             |  AS cents
             |FROM r WHERE rnk <= 3
             |ORDER BY 1, 2, 3""".stripMargin)),

    // Nearest-direction as-of (both AsofJoin directions composed):
    // for each click, the closest error event either side, tie to
    // the earlier one — sensor-alignment semantics where backward-
    // only (q60) or forward-only (q99) would skew gaps one way.
    // Gap arithmetic in integer microseconds.
    QueryDef("q201_asof_nearest",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select("user_id", "event_id", "ts")
        val errs = ev.filter(col("event_type") === "error")
          .select(col("user_id"), col("ts").as("ts_r"),
            col("event_id").as("err_id"))
        val b = AsofJoin.join(clicks, errs, Seq("user_id"),
          "ts", "ts_r", Seq("err_id"), AsofJoin.Backward,
          matchedTsCol = Some("bts"))
          .drop("err_id")
        val f = AsofJoin.join(b,
          errs.withColumnRenamed("err_id", "err_id_f"), Seq("user_id"),
          "ts", "ts_r", Seq("err_id_f"), AsofJoin.Forward,
          matchedTsCol = Some("fts"))
          .drop("err_id_f")
        val tU = unix_micros(col("ts").cast("timestamp"))
        val bU = unix_micros(col("bts").cast("timestamp"))
        val fU = unix_micros(col("fts").cast("timestamp"))
        f.withColumn("gap",
            when(col("bts").isNull && col("fts").isNull,
              lit(null).cast("long"))
              .when(col("fts").isNull, tU - bU)
              .when(col("bts").isNull, fU - tU)
              .when(tU - bU <= fU - tU, tU - bU)
              .otherwise(fU - tU))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_clicks"),
            count(col("gap")).as("n_matched"),
            sum("gap").as("sum_gap_us"))
          .orderBy("user_id")
      },
      Some("""WITH c AS (
             |  SELECT user_id, event_id, epoch_us(ts) AS t
             |  FROM events WHERE event_type = 'click'),
             |e AS (SELECT user_id, epoch_us(ts) AS te
             |  FROM events WHERE event_type = 'error'),
             |j AS (SELECT c.user_id, c.event_id, c.t,
             |    max(CASE WHEN te <= t THEN te END) AS bt,
             |    min(CASE WHEN te >= t THEN te END) AS ft
             |  FROM c LEFT JOIN e ON c.user_id = e.user_id
             |  GROUP BY 1, 2, 3),
             |g AS (SELECT user_id,
             |    CASE WHEN bt IS NULL AND ft IS NULL THEN NULL
             |      WHEN ft IS NULL THEN t - bt
             |      WHEN bt IS NULL THEN ft - t
             |      WHEN t - bt <= ft - t THEN t - bt
             |      ELSE ft - t END AS gap
             |  FROM j)
             |SELECT user_id, count(*) AS n_clicks,
             |  count(gap) AS n_matched,
             |  CAST(sum(gap) AS BIGINT) AS sum_gap_us
             |FROM g GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Month-over-month growth table: per order priority and month,
    // exact-cents revenue with the prior month's value and a floor-
    // ppm growth rate — the lag-based BI staple (q79's rolling
    // stats smooth; this compares discrete periods). All integer
    // until the emitted rate.
    QueryDef("q202_mom_growth",
      (s, dir) => {
        val o = t(s, dir, "orders")
          .withColumn("mon",
            expr("year(o_orderdate) * 12 + month(o_orderdate)")
              .cast("long"))
          .withColumn("cents",
            round(col("o_totalprice") * 100).cast("long"))
          .groupBy(col("o_orderpriority").as("seg"), col("mon"))
          .agg(sum("cents").as("cents"))
        val w = Window.partitionBy("seg").orderBy(col("mon"))
        o.withColumn("prev_cents", lag(col("cents"), 1).over(w))
          .withColumn("growth_ppm",
            when(col("prev_cents") > 0,
              expr("((cents - prev_cents) * 1000000) DIV prev_cents")))
          .orderBy("seg", "mon")
      },
      Some("""WITH m AS (
             |  SELECT o_orderpriority AS seg,
             |    year(o_orderdate) * 12 + month(o_orderdate) AS mon,
             |    sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
             |  FROM orders GROUP BY 1, 2),
             |l AS (SELECT *, lag(cents) OVER (PARTITION BY seg
             |    ORDER BY mon) AS prev_cents
             |  FROM m)
             |SELECT seg, CAST(mon AS BIGINT) AS mon,
             |  CAST(cents AS BIGINT) AS cents,
             |  CAST(prev_cents AS BIGINT) AS prev_cents,
             |  CAST(CASE WHEN prev_cents > 0 THEN
             |    ((cents - prev_cents) * 1000000) // prev_cents END
             |    AS BIGINT) AS growth_ppm
             |FROM l ORDER BY 1, 2""".stripMargin)),

    // ABC (Pareto 80/95) classification: parts ranked by revenue,
    // classed by cumulative share with cross-multiplied integer
    // boundary tests (A ≤ 80%, B ≤ 95%, C rest) — the 80/20 curve as
    // an operator, classes exact because no division ever happens
    // before the emitted share.
    QueryDef("q203_abc_classification",
      (s, dir) => {
        val rev = t(s, dir, "lineitem")
          .groupBy(col("l_partkey"))
          .agg(sum(round(col("l_extendedprice") * 100).cast("long"))
            .as("cents"))
          // Ranked AND totalled below: pin so the rollup runs once.
          .localCheckpoint(true)
        // The Pareto running sum is the r11 verdict's q203 scale-
        // killer when written as an unpartitioned window (the part
        // dim is data-proportional): instead, a DISTRIBUTED rank
        // (Rank.globalRowNumber) + the two-pass bucketed prefix scan
        // (Rank.prefixSum — heavy windows partitioned by rank
        // bucket); the grand total is a 1-row aggregate broadcast
        // back, reused for the per-class share.
        val ranked = Rank.globalRowNumber(rev,
          Seq("cents" -> false, "l_partkey" -> true), "_rk")
        Rank.prefixSum(ranked, "_rk", "cents", "cum")
          .crossJoin(broadcast(rev.agg(sum("cents").as("tot"))))
          .withColumn("class",
            when(col("cum") * 5 <= col("tot") * 4, "A")
              .when(col("cum") * 20 <= col("tot") * 19, "B")
              .otherwise("C"))
          .groupBy("class")
          .agg(count(lit(1)).as("n_parts"), sum("cents").as("cents"),
            max("tot").as("_tot"))
          .withColumn("share",
            round(col("cents").cast("double") /
              col("_tot").cast("double"), 6))
          .drop("_tot")
          .orderBy("class")
      },
      Some("""WITH rev AS (
             |  SELECT l_partkey,
             |    sum(CAST(round(l_extendedprice * 100) AS BIGINT))
             |      AS cents
             |  FROM lineitem GROUP BY 1),
             |c AS (SELECT *,
             |    sum(cents) OVER (ORDER BY cents DESC, l_partkey
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS cum,
             |    sum(cents) OVER () AS tot
             |  FROM rev),
             |k AS (SELECT CASE WHEN cum * 5 <= tot * 4 THEN 'A'
             |    WHEN cum * 20 <= tot * 19 THEN 'B'
             |    ELSE 'C' END AS class, cents
             |  FROM c),
             |a AS (SELECT class, count(*) AS n_parts,
             |    sum(cents) AS cents
             |  FROM k GROUP BY 1)
             |SELECT class, n_parts, CAST(cents AS BIGINT) AS cents,
             |  round(CAST(cents AS DOUBLE) /
             |    CAST((SELECT sum(cents) FROM a) AS DOUBLE), 6) AS share
             |FROM a ORDER BY 1""".stripMargin)),

    // Session-scoped strict funnel (ops/Sessionize.gapSessions +
    // the q102 funnel logic at SESSION grain): view → later click →
    // later purchase must all land inside one 30-minute-gap session,
    // not merely the same user's history. Three aggregate+join
    // rounds, each min() conditioned on the prior stage's timestamp.
    QueryDef("q204_session_funnel",
      (s, dir) => {
        val base = Sessionize.gapSessions(t(s, dir, "events"),
            Seq("user_id"), "ts", "event_id", gapUs = 1800000000L)
          .withColumn("t", unix_micros(col("ts").cast("timestamp")))
          .select("user_id", "session_id", "event_type", "t")
        val v = base.groupBy("user_id", "session_id")
          .agg(min(when(col("event_type") === "view", col("t")))
            .as("vt"))
        val c = base.join(v, Seq("user_id", "session_id"))
          .groupBy("user_id", "session_id")
          .agg(max("vt").as("vt"),
            min(when(col("event_type") === "click" &&
              col("t") > col("vt"), col("t"))).as("ct"))
        val p = base.join(c, Seq("user_id", "session_id"))
          .groupBy("user_id", "session_id")
          .agg(max("vt").as("vt"), max("ct").as("ct"),
            min(when(col("event_type") === "purchase" &&
              col("t") > col("ct"), col("t"))).as("pt"))
        p.groupBy("user_id")
          .agg(count(lit(1)).as("n_sessions"),
            sum(when(col("vt").isNotNull, 1L).otherwise(0L)).as("n_view"),
            sum(when(col("ct").isNotNull, 1L).otherwise(0L))
              .as("n_view_click"),
            sum(when(col("pt").isNotNull, 1L).otherwise(0L)).as("n_full"))
          .orderBy("user_id")
      },
      Some("""WITH b0 AS (
             |  SELECT user_id, event_id, event_type, epoch_us(ts) AS t
             |  FROM events),
             |l AS (SELECT *, lag(t) OVER (PARTITION BY user_id
             |    ORDER BY t, event_id) AS pt FROM b0),
             |s AS (SELECT *, sum(CASE WHEN pt IS NULL
             |      OR t - pt > 1800000000 THEN 1 ELSE 0 END)
             |    OVER (PARTITION BY user_id ORDER BY t, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |    AS sess
             |  FROM l),
             |v AS (SELECT user_id, sess,
             |    min(CASE WHEN event_type = 'view' THEN t END) AS vt
             |  FROM s GROUP BY 1, 2),
             |c AS (SELECT s.user_id, s.sess, max(v.vt) AS vt,
             |    min(CASE WHEN s.event_type = 'click' AND s.t > v.vt
             |      THEN s.t END) AS ct
             |  FROM s JOIN v ON s.user_id = v.user_id AND s.sess = v.sess
             |  GROUP BY 1, 2),
             |p AS (SELECT s.user_id, s.sess, max(c.vt) AS vt,
             |    max(c.ct) AS ct,
             |    min(CASE WHEN s.event_type = 'purchase' AND s.t > c.ct
             |      THEN s.t END) AS pt
             |  FROM s JOIN c ON s.user_id = c.user_id AND s.sess = c.sess
             |  GROUP BY 1, 2)
             |SELECT user_id, count(*) AS n_sessions,
             |  CAST(sum(CASE WHEN vt IS NOT NULL THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_view,
             |  CAST(sum(CASE WHEN ct IS NOT NULL THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_view_click,
             |  CAST(sum(CASE WHEN pt IS NOT NULL THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_full
             |FROM p GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Degree assortativity of the trade graph (GraphMetrics
    // .assortativity, Newman 2002): do high-degree trading nations
    // link to other hubs (r > 0) or to spokes (r < 0)? Integer
    // moments over both edge orientations; one fixed-shape double
    // coefficient.
    QueryDef("q205_assortativity",
      (s, dir) => {
        val cust = t(s, dir, "customer").select("c_custkey", "c_nationkey")
        val ord = t(s, dir, "orders").select("o_orderkey", "o_custkey")
        val li = t(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
        val supp = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
        val edges = cust
          .join(ord, col("c_custkey") === col("o_custkey"))
          .join(li, col("o_orderkey") === col("l_orderkey"))
          .join(supp, col("l_suppkey") === col("s_suppkey"))
          .groupBy("c_nationkey", "s_nationkey")
          .agg(count(lit(1)).as("n"))
          .where(col("n") >= 100)
        GraphMetrics.assortativity(edges, "c_nationkey", "s_nationkey")
      },
      Some("""WITH tr AS (
             |  SELECT c_nationkey AS x, s_nationkey AS y, count(*) AS n
             |  FROM customer
             |  JOIN orders ON c_custkey = o_custkey
             |  JOIN lineitem ON o_orderkey = l_orderkey
             |  JOIN supplier ON l_suppkey = s_suppkey
             |  GROUP BY 1, 2 HAVING count(*) >= 100),
             |e AS (SELECT DISTINCT least(x, y) AS a, greatest(x, y) AS b
             |      FROM tr WHERE x <> y),
             |deg AS (SELECT node, count(*) AS degree FROM (
             |          SELECT a AS node FROM e
             |          UNION ALL SELECT b FROM e)
             |        GROUP BY 1),
             |ends AS (
             |  SELECT da.degree AS x, db.degree AS y
             |  FROM e JOIN deg da ON e.a = da.node
             |         JOIN deg db ON e.b = db.node
             |  UNION ALL
             |  SELECT db.degree, da.degree
             |  FROM e JOIN deg da ON e.a = da.node
             |         JOIN deg db ON e.b = db.node),
             |mo AS (SELECT count(*) AS n2, sum(x) AS sx,
             |    sum(x * x) AS sxx, sum(x * y) AS sxy
             |  FROM ends)
             |SELECT CAST(n2 // 2 AS BIGINT) AS m,
             |  round(CASE WHEN CAST(n2 AS DOUBLE) * CAST(sxx AS DOUBLE) -
             |      CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
             |    THEN (CAST(n2 AS DOUBLE) * CAST(sxy AS DOUBLE) -
             |        CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) /
             |      (CAST(n2 AS DOUBLE) * CAST(sxx AS DOUBLE) -
             |        CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             |    END, 6) AS r
             |FROM mo""".stripMargin)),

    // Class-balance diversity (ops/Concentration.inverseSimpson):
    // the effective number of languages per source, (Σc)²/Σc² — the
    // log-free diversity metric (a ratio of exact integer sums, so
    // it hash-compares exactly where entropy's ln cannot).
    QueryDef("q206_class_balance",
      (s, dir) => Concentration.inverseSimpson(
          t(s, dir, "documents"), "source", "lang")
        .orderBy("g"),
      Some("""WITH c AS (
             |  SELECT source AS g, lang, count(*) AS n
             |  FROM documents WHERE lang IS NOT NULL GROUP BY 1, 2),
             |a AS (SELECT g, sum(n) AS n, count(*) AS n_classes,
             |    sum(n * n) AS ss
             |  FROM c GROUP BY 1)
             |SELECT g, CAST(n AS BIGINT) AS n,
             |  CAST(n_classes AS BIGINT) AS n_classes,
             |  round(CAST(n * n AS DOUBLE) / CAST(ss AS DOUBLE), 4)
             |    AS inv_simpson
             |FROM a ORDER BY 1""".stripMargin)),

    // Diversity-capped top-k: the 10 highest-revenue parts overall,
    // but at most 2 per brand — the retrieval-diversification window
    // stack (per-group row_number, then global rank over the
    // survivors) that a plain top-k can't express. Exact cents;
    // every rank tie-broken by key.
    QueryDef("q207_capped_topk",
      (s, dir) => {
        val rev = t(s, dir, "lineitem")
          .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
          .groupBy("p_brand", "p_partkey")
          .agg(sum(round(col("l_extendedprice") * 100).cast("long"))
            .as("cents"))
        val perBrand = Window.partitionBy("p_brand")
          .orderBy(col("cents").desc, col("p_partkey"))
        val overall = Window.orderBy(col("cents").desc, col("p_partkey"))
        rev
          .withColumn("_br", row_number().over(perBrand))
          .where(col("_br") <= 2)
          // Explicit top-10 over the ≤ 2·|brands| survivors
          // (TakeOrderedAndProject); the rank window then runs on the
          // 10-row result only.
          .orderBy(col("cents").desc, col("p_partkey"))
          .limit(10)
          .withColumn("rank", row_number().over(overall).cast("int"))
          .select("rank", "p_brand", "p_partkey", "cents")
          .orderBy("rank")
      },
      Some("""WITH rev AS (
             |  SELECT p_brand, p_partkey,
             |    sum(CAST(round(l_extendedprice * 100) AS BIGINT))
             |      AS cents
             |  FROM lineitem JOIN part ON l_partkey = p_partkey
             |  GROUP BY 1, 2),
             |b AS (SELECT *, row_number() OVER (PARTITION BY p_brand
             |    ORDER BY cents DESC, p_partkey) AS br
             |  FROM rev),
             |r AS (SELECT *, CAST(row_number() OVER (
             |    ORDER BY cents DESC, p_partkey) AS INT) AS "rank"
             |  FROM b WHERE br <= 2)
             |SELECT "rank", p_brand, p_partkey,
             |  CAST(cents AS BIGINT) AS cents
             |FROM r WHERE "rank" <= 10 ORDER BY 1""".stripMargin)),

    // Trailing-window trend slope (rolling OLS): per event type, the
    // 7-day OLS slope of daily volume at the LATEST day — q133's
    // regression over q79's trailing-frame windows. Window moments
    // are exact integer sums; the slope is one fixed-shape double.
    QueryDef("q208_rolling_slope",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .withColumn("day",
            expr("unix_micros(cast(ts as timestamp)) div 86400000000"))
          .groupBy(col("event_type").as("g"), col("day"))
          .agg(count(lit(1)).as("y"))
        val w = Window.partitionBy("g").orderBy(col("day"))
          .rowsBetween(-6, Window.currentRow)
        def d(c: org.apache.spark.sql.Column) = c.cast("double")
        val scored = daily
          .withColumn("_n", count(lit(1)).over(w))
          .withColumn("_sx", sum("day").over(w))
          .withColumn("_sy", sum("y").over(w))
          .withColumn("_sxy", sum(col("day") * col("y")).over(w))
          .withColumn("_sxx", sum(col("day") * col("day")).over(w))
        val latest = Window.partitionBy("g").orderBy(col("day").desc)
        scored
          .withColumn("_rk", row_number().over(latest))
          .where(col("_rk") === 1)
          .select(col("g"), col("day").as("last_day"),
            col("_n").as("n_days"),
            round((d(col("_n")) * d(col("_sxy")) -
              d(col("_sx")) * d(col("_sy"))) /
              (d(col("_n")) * d(col("_sxx")) -
                d(col("_sx")) * d(col("_sx"))), 4).as("slope"))
          .orderBy("g")
      },
      Some("""WITH daily AS (
             |  SELECT event_type AS g,
             |    epoch_us(ts) // 86400000000 AS day, count(*) AS y
             |  FROM events GROUP BY 1, 2),
             |sc AS (SELECT *,
             |    count(*) OVER w AS n, sum(day) OVER w AS sx,
             |    sum(y) OVER w AS sy, sum(day * y) OVER w AS sxy,
             |    sum(day * day) OVER w AS sxx,
             |    row_number() OVER (PARTITION BY g ORDER BY day DESC)
             |      AS rk
             |  FROM daily
             |  WINDOW w AS (PARTITION BY g ORDER BY day
             |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
             |SELECT g, CAST(day AS BIGINT) AS last_day,
             |  CAST(n AS BIGINT) AS n_days,
             |  round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
             |      CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
             |    (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
             |      CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 4) AS slope
             |FROM sc WHERE rk = 1 ORDER BY g""".stripMargin)),

    // Growth accounting (new / returning / churned): per day, actives
    // split into first-ever-seen vs returning, plus how many of the
    // previous day's actives went silent — the DAU ledger, all from
    // the distinct (user, day) frame and integer counts.
    QueryDef("q209_growth_accounting",
      (s, dir) => {
        val act = t(s, dir, "events")
          .withColumn("day",
            expr("unix_micros(cast(ts as timestamp)) div 86400000000"))
          .select(col("user_id").as("u"), col("day").as("d"))
          .distinct()
        val firstSeen = act.groupBy("u").agg(min("d").as("first_d"))
        val withFirst = act.join(firstSeen, Seq("u"))
        val dayAgg = withFirst.groupBy("d")
          .agg(count(lit(1)).as("n_active"),
            sum(when(col("d") === col("first_d"), 1L).otherwise(0L))
              .as("n_new"))
          .withColumn("n_returning", col("n_active") - col("n_new"))
        val churn = act.as("y")
          .join(act.as("t"),
            col("y.u") === col("t.u") &&
              col("t.d") === col("y.d") + 1, "left")
          .groupBy(col("y.d").as("d"))
          .agg(sum(when(col("t.u").isNull, 1L).otherwise(0L))
            .as("_gone"))
          .select((col("d") + 1).as("d"), col("_gone").as("n_churned"))
        dayAgg.join(churn, Seq("d"), "left")
          .withColumn("n_churned", coalesce(col("n_churned"), lit(0L)))
          .orderBy("d")
      },
      Some("""WITH act AS (
             |  SELECT DISTINCT user_id AS u,
             |    epoch_us(ts) // 86400000000 AS d
             |  FROM events),
             |fs AS (SELECT u, min(d) AS first_d FROM act GROUP BY 1),
             |da AS (SELECT d, count(*) AS n_active,
             |    sum(CASE WHEN d = first_d THEN 1 ELSE 0 END) AS n_new
             |  FROM act JOIN fs USING (u) GROUP BY 1),
             |ch AS (SELECT y.d + 1 AS d,
             |    sum(CASE WHEN t.u IS NULL THEN 1 ELSE 0 END)
             |      AS n_churned
             |  FROM act y LEFT JOIN act t
             |    ON y.u = t.u AND t.d = y.d + 1
             |  GROUP BY 1)
             |SELECT da.d, CAST(n_active AS BIGINT) AS n_active,
             |  CAST(n_new AS BIGINT) AS n_new,
             |  CAST(n_active - n_new AS BIGINT) AS n_returning,
             |  CAST(coalesce(n_churned, 0) AS BIGINT) AS n_churned
             |FROM da LEFT JOIN ch ON da.d = ch.d
             |ORDER BY 1""".stripMargin)),

    // Dedup-cascade attrition report: the q61 corpus slice pushed
    // through exact → canonical-text → MinHash-near-dup stages, with
    // survivor counts per stage — the "which tier buys what" summary
    // a curation pipeline publishes. Near-dup stage removes the
    // GREATER id of each verified pair between canon survivors
    // (pairwise domination at report grain; full transitive
    // clustering is q61/q128's job).
    QueryDef("q210_dedup_cascade",
      (s, dir) => {
        val docs = t(s, dir, "documents").filter(col("doc_id") < 1000)
        val n0 = docs.agg(count(lit(1)).as("n_docs"))
        val nExact = Dedup.exact(docs, "text", "doc_id")
          .agg(count(lit(1)).as("n_after_exact"))
        val canonKeep = Dedup.exact(docs
            .withColumn("ctext", TextAnalysis.canonText(col("text"))),
          "ctext", "doc_id").select("keep_id")
        val nCanon = canonKeep.agg(count(lit(1)).as("n_after_canon"))
        val pairs = Dedup.minhashNearDups(docs, "doc_id", "text",
          k = 64, bands = 8, threshold = 0.8)
        val dom = pairs
          .join(canonKeep.withColumnRenamed("keep_id", "id_a"), "id_a")
          .join(canonKeep.withColumnRenamed("keep_id", "id_b"), "id_b")
          .select("id_b").distinct()
        val nNear = canonKeep.join(dom,
            col("keep_id") === col("id_b"), "left_anti")
          .agg(count(lit(1)).as("n_after_near"))
        n0.crossJoin(nExact).crossJoin(nCanon).crossJoin(nNear)
      },
      Some("WITH " + minhashVerifiedCtes + ",\n" +
        """sl AS (SELECT doc_id, text FROM documents WHERE doc_id < 1000),
          |ex AS (SELECT count(DISTINCT md5(text)) AS n_after_exact
          |  FROM sl),
          |keepers AS (SELECT min(doc_id) AS keep_id FROM sl
          |  GROUP BY md5(trim(regexp_replace(lower(nfc_normalize(text)),
          |    '[ \t\n\f\r]+', ' ', 'g')))),
          |dom AS (SELECT DISTINCT v.id_b FROM verified v
          |  JOIN keepers ka ON v.id_a = ka.keep_id
          |  JOIN keepers kb ON v.id_b = kb.keep_id
          |  WHERE v.jaccard >= 0.8),
          |surv AS (SELECT count(*) AS n_after_near FROM keepers
          |  WHERE keep_id NOT IN (SELECT id_b FROM dom))
          |SELECT (SELECT count(*) FROM sl) AS n_docs,
          |  (SELECT n_after_exact FROM ex) AS n_after_exact,
          |  (SELECT count(*) FROM keepers) AS n_after_canon,
          |  (SELECT n_after_near FROM surv) AS n_after_near""".stripMargin)),

    // Association rules at SESSION grain (ops/Itemsets over ops/
    // Sessionize baskets): which event types co-occur within one
    // 30-minute session — the operator-reuse composition where q161
    // mined order×brand baskets; support counts are per-session.
    QueryDef("q211_session_rules",
      (s, dir) => {
        val sess = Sessionize.gapSessions(t(s, dir, "events"),
            Seq("user_id"), "ts", "event_id", gapUs = 1800000000L)
          .withColumn("basket",
            concat_ws("#", col("user_id"), col("session_id")))
        Itemsets.rules(sess, "basket", "event_type", minSupport = 5)
          .orderBy("antecedent", "consequent")
      },
      Some("""WITH b0 AS (
             |  SELECT user_id, event_id, event_type, epoch_us(ts) AS t
             |  FROM events),
             |l AS (SELECT *, lag(t) OVER (PARTITION BY user_id
             |    ORDER BY t, event_id) AS pt FROM b0),
             |s AS (SELECT *, sum(CASE WHEN pt IS NULL
             |      OR t - pt > 1800000000 THEN 1 ELSE 0 END)
             |    OVER (PARTITION BY user_id ORDER BY t, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |    AS sess
             |  FROM l),
             |b AS (SELECT DISTINCT CAST(user_id AS VARCHAR) || '#' ||
             |    CAST(sess AS VARCHAR) AS basket, event_type AS item
             |  FROM s),
             |nb AS (SELECT count(DISTINCT basket) AS n FROM b),
             |l1 AS (SELECT item, count(*) AS n_item FROM b
             |       GROUP BY 1 HAVING count(*) >= 5),
             |fb AS (SELECT b.basket, b.item FROM b JOIN l1 USING (item)),
             |p AS (SELECT x.item AS item_a, y.item AS item_b,
             |        count(*) AS n_both
             |      FROM fb x JOIN fb y
             |        ON x.basket = y.basket AND x.item < y.item
             |      GROUP BY 1, 2 HAVING count(*) >= 5),
             |d AS (SELECT item_a AS antecedent, item_b AS consequent,
             |        n_both FROM p
             |      UNION ALL
             |      SELECT item_b, item_a, n_both FROM p)
             |SELECT antecedent, consequent, n_both,
             |  la.n_item AS n_ante, lc.n_item AS n_cons,
             |  round(CAST(n_both AS DOUBLE) / nb.n, 6) AS support,
             |  round(CAST(n_both AS DOUBLE) / la.n_item, 6) AS confidence,
             |  round(CAST(n_both AS DOUBLE) * nb.n /
             |    (CAST(la.n_item AS DOUBLE) * lc.n_item), 6) AS lift
             |FROM d
             |JOIN l1 la ON d.antecedent = la.item
             |JOIN l1 lc ON d.consequent = lc.item, nb
             |ORDER BY 1, 2""".stripMargin)),

    // Ranking-function surface parity: percent_rank / cume_dist /
    // ntile(4) over a unique ordering (price, partkey) — the exact
    // rational definitions both engines share, pinned as a catalog
    // row so the window surface is demonstrably complete beyond
    // row_number/rank/lag.
    QueryDef("q212_ranking_functions",
      (s, dir) => {
        val w = Window.partitionBy("p_brand")
          .orderBy(col("p_retailprice"), col("p_partkey"))
        t(s, dir, "part")
          .select(col("p_brand"), col("p_partkey"), col("p_retailprice"))
          .withColumn("pr", round(percent_rank().over(w), 6))
          .withColumn("cd", round(cume_dist().over(w), 6))
          .withColumn("quartile", ntile(4).over(w))
          .orderBy("p_brand", "p_partkey")
      },
      Some("""SELECT p_brand, p_partkey, p_retailprice,
             |  round(percent_rank() OVER w, 6) AS pr,
             |  round(cume_dist() OVER w, 6) AS cd,
             |  CAST(ntile(4) OVER w AS INT) AS quartile
             |FROM part
             |WINDOW w AS (PARTITION BY p_brand
             |  ORDER BY p_retailprice, p_partkey)
             |ORDER BY p_brand, p_partkey""".stripMargin)),

    // Ordered LISTAGG parity (≡ DuckDB string_agg with ORDER BY):
    // the sorted distinct language list per source as one delimited
    // string. Spark side = array_join(array_sort(collect_set)) —
    // the order-PINNED form; a bare listagg/collect_list is
    // partitioning-dependent and could never hash-match.
    QueryDef("q213_listagg",
      (s, dir) => t(s, dir, "documents")
        .groupBy("source")
        .agg(
          array_join(array_sort(collect_set(col("lang"))), ",")
            .as("langs_csv"),
          countDistinct("lang").as("n_langs"))
        .orderBy("source"),
      Some("""SELECT source,
             |  string_agg(DISTINCT lang, ',' ORDER BY lang) AS langs_csv,
             |  count(DISTINCT lang) AS n_langs
             |FROM documents GROUP BY source
             |ORDER BY source""".stripMargin)),

    // Quantile normalization across sources (ops/QuantileNormalize
    // .summary, the microarray/batch-effect classic): every source's
    // length distribution replaced by the pooled one at matching
    // within-group ranks — identical mapped min/max per source IS
    // the visible proof. All rank→index arithmetic exact integers
    // (endpoints meet exactly), no interpolation floats.
    QueryDef("q214_quantile_normalize",
      (s, dir) => QuantileNormalize.summary(
          t(s, dir, "documents"), "source", "n_chars")
        .orderBy("g"),
      Some("""WITH in0 AS (
             |  SELECT source AS g, CAST(n_chars AS BIGINT) AS v
             |  FROM documents WHERE n_chars IS NOT NULL),
             |p AS (SELECT CAST(row_number() OVER (ORDER BY v)
             |    AS BIGINT) AS idx, v AS pv
             |  FROM in0),
             |r AS (SELECT g, v,
             |    CAST(row_number() OVER (PARTITION BY g ORDER BY v)
             |      AS BIGINT) AS r,
             |    count(*) OVER (PARTITION BY g) AS n,
             |    count(*) OVER () AS nt
             |  FROM in0),
             |m AS (SELECT g, v, CASE WHEN n = 1 THEN 1
             |    ELSE 1 + ((r - 1) * (nt - 1)) // (n - 1) END AS idx
             |  FROM r),
             |j AS (SELECT m.g, m.v, p.pv FROM m JOIN p USING (idx))
             |SELECT g, count(*) AS n,
             |  round(CAST(sum(v) AS DOUBLE) /
             |    CAST(count(*) AS DOUBLE), 4) AS mean_orig,
             |  round(CAST(sum(pv) AS DOUBLE) /
             |    CAST(count(*) AS DOUBLE), 4) AS mean_mapped,
             |  CAST(min(pv) AS BIGINT) AS mapped_min,
             |  CAST(max(pv) AS BIGINT) AS mapped_max
             |FROM j GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Sorted-neighborhood blocking eval (ops/Linkage
    // .sortedNeighborhood): the OTHER classic ER candidate generator
    // — one global sort of part ∪ twin on the (perturbed) name, pair
    // cross-side records within a rank window of 5 via a band
    // EQUI-join (never a range join). Recall against the key-equal
    // ground truth sits beside q166's equality-blocking numbers.
    QueryDef("q215_sorted_neighborhood",
      (s, dir) => {
        val p = t(s, dir, "part")
          .select("p_partkey", "p_name", "p_brand", "p_type", "p_size")
        val toks = split(col("p_name"), " ")
        val twin = p.select(col("p_partkey"),
          when(col("p_partkey") % 3 === 0,
            array_join(slice(toks, lit(1), size(toks) - 1), " "))
            .otherwise(col("p_name")).as("p_name"))
        Linkage.sortedNeighborhood(p.select("p_partkey", "p_name"),
          twin, "p_partkey", "p_name", w = 5)
      },
      Some("""WITH tw AS (
             |  SELECT p_partkey AS key,
             |    CASE WHEN p_partkey % 3 = 0
             |      THEN array_to_string(ss[1:len(ss) - 1], ' ')
             |      ELSE p_name END AS sk
             |  FROM (SELECT *, string_split(p_name, ' ') AS ss
             |        FROM part)),
             |u AS (SELECT p_partkey AS key, p_name AS sk, 0 AS side
             |  FROM part
             |  UNION ALL SELECT key, sk, 1 FROM tw),
             |r AS (SELECT *, CAST(row_number() OVER (
             |    ORDER BY sk, key, side) AS BIGINT) AS r FROM u),
             |x AS (SELECT *, r // 5 AS band FROM r),
             |y AS (SELECT key, sk, side, r, band FROM x
             |  UNION ALL SELECT key, sk, side, r, band - 1 FROM x),
             |pp AS (SELECT DISTINCT
             |    CASE WHEN x.side = 0 THEN x.key ELSE y.key END AS key_a,
             |    CASE WHEN x.side = 0 THEN y.key ELSE x.key END AS key_b
             |  FROM x JOIN y ON x.band = y.band AND y.r > x.r
             |    AND y.r <= x.r + 5 AND x.side <> y.side),
             |tp AS (SELECT count(DISTINCT key) AS n_true_possible
             |  FROM tw WHERE key IN (SELECT p_partkey FROM part)),
             |c AS (SELECT count(*) AS n_candidates,
             |    sum(CASE WHEN key_a = key_b THEN 1 ELSE 0 END)
             |      AS n_true
             |  FROM pp)
             |SELECT 5 AS w, CAST(n_candidates AS BIGINT) AS n_candidates,
             |  CAST(n_true AS BIGINT) AS n_true,
             |  CAST(n_true_possible AS BIGINT) AS n_true_possible,
             |  CAST((n_true * 1000000) // n_true_possible AS BIGINT)
             |    AS recall_ppm
             |FROM c, tp""".stripMargin)),

    // Incremental SCD2 maintenance (Scd2.applyVersion): history is
    // built from versions 1–2 only, then version 3 folds in as a
    // batch — one open-slice join, batch-sized work. The ORACLE is
    // q157's full-log REBUILD, so the hash match IS the proof that
    // incremental ≡ backfill (the q159 IVM contract, at SCD2 grain).
    QueryDef("q216_scd2_apply",
      (s, dir) => {
        val cust = t(s, dir, "customer")
          .select("c_custkey", "c_nationkey", "c_mktsegment")
        val bump = when(col("c_custkey") % 7 === 0,
          col("c_nationkey") + 1).otherwise(col("c_nationkey"))
        val v1 = cust.withColumn("ver", lit(1))
        val v2 = cust.filter(col("c_custkey") % 11 =!= 0)
          .withColumn("c_nationkey", bump)
          .withColumn("ver", lit(2))
        val v3 = cust
          .withColumn("c_nationkey", bump)
          .withColumn("c_mktsegment", when(col("c_custkey") % 5 === 0,
            lit("MOVED")).otherwise(col("c_mktsegment")))
        val hist12 = Scd2.history(v1.unionByName(v2),
          "c_custkey", "ver", Seq("c_nationkey", "c_mktsegment"))
        Scd2.applyVersion(hist12, v3, "c_custkey", ver = 3L,
          Seq("c_nationkey", "c_mktsegment"))
          .groupBy("valid_from", "valid_to", "is_current")
          .agg(count(lit(1)).as("n"),
            countDistinct("c_custkey").as("n_keys"))
          .orderBy(col("valid_from"), col("valid_to").asc_nulls_first)
      },
      Some(s"""WITH v1 AS (
             |  SELECT c_custkey, c_nationkey, c_mktsegment, 1 AS ver
             |  FROM customer),
             |v2 AS (
             |  SELECT c_custkey,
             |    CASE WHEN c_custkey % 7 = 0 THEN c_nationkey + 1
             |      ELSE c_nationkey END AS c_nationkey,
             |    c_mktsegment, 2 AS ver
             |  FROM customer WHERE c_custkey % 11 <> 0),
             |v3 AS (
             |  SELECT c_custkey,
             |    CASE WHEN c_custkey % 7 = 0 THEN c_nationkey + 1
             |      ELSE c_nationkey END AS c_nationkey,
             |    CASE WHEN c_custkey % 5 = 0 THEN 'MOVED'
             |      ELSE c_mktsegment END AS c_mktsegment,
             |    3 AS ver FROM customer),
             |vlog AS (SELECT * FROM v1 UNION ALL SELECT * FROM v2
             |         UNION ALL SELECT * FROM v3),
             |f AS (SELECT *, ${SnapshotDiff.duckFingerprint(
                      Seq("c_nationkey", "c_mktsegment"))} AS fp
             |      FROM vlog),
             |g AS (SELECT *, CASE WHEN lag(fp) OVER w IS NULL
             |        OR lag(fp) OVER w <> fp THEN 1 ELSE 0 END AS nr
             |      FROM f WINDOW w AS (PARTITION BY c_custkey ORDER BY ver)),
             |r AS (SELECT *, sum(nr) OVER (
             |        PARTITION BY c_custkey ORDER BY ver) AS run
             |      FROM g),
             |runs AS (SELECT c_custkey, run, min(ver) AS valid_from
             |         FROM r GROUP BY 1, 2),
             |iv AS (SELECT c_custkey, valid_from,
             |         lead(valid_from) OVER (
             |           PARTITION BY c_custkey ORDER BY valid_from) - 1
             |           AS valid_to
             |       FROM runs)
             |SELECT valid_from, valid_to, valid_to IS NULL AS is_current,
             |  count(*) AS n, count(DISTINCT c_custkey) AS n_keys
             |FROM iv GROUP BY 1, 2, 3
             |ORDER BY 1, 2 NULLS FIRST""".stripMargin)),

    // Ranking drift (Jaccard@10 of top-token lists): where q129
    // compares token SHARES release-to-release, this compares the
    // RANKINGS — per language, the top-10 vocabularies of the even-
    // and odd-doc corpus halves and their set overlap. Ties break on
    // the token, counts are integers, overlap is one division.
    QueryDef("q217_ranking_drift",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        def top(half: DataFrame) = TextAnalysis
          .topTokens(half, "lang", "text", k = 10)
          .select(col("lang"), col("token"))
        val a = top(docs.filter(col("doc_id") % 2 === 0))
        val b = top(docs.filter(col("doc_id") % 2 =!= 0))
        a.withColumn("_in_a", lit(1))
          .join(b.withColumn("_in_b", lit(1)),
            Seq("lang", "token"), "full_outer")
          .groupBy("lang")
          .agg(sum(when(col("_in_a").isNotNull &&
              col("_in_b").isNotNull, 1L).otherwise(0L)).as("n_common"),
            count(lit(1)).as("_n_union"))
          .select(col("lang"), col("n_common"),
            col("_n_union").as("n_union"),
            round(col("n_common").cast("double") /
              col("_n_union").cast("double"), 4).as("jacc10"))
          .orderBy("lang")
      },
      Some("""WITH xa AS (
             |  SELECT lang, unnest(list_filter(
             |      string_split_regex(text, ' +'), t -> t <> '')) AS token
             |  FROM documents WHERE doc_id % 2 = 0),
             |xb AS (
             |  SELECT lang, unnest(list_filter(
             |      string_split_regex(text, ' +'), t -> t <> '')) AS token
             |  FROM documents WHERE doc_id % 2 <> 0),
             |ca AS (SELECT lang, token, count(*) AS cnt FROM xa
             |  GROUP BY 1, 2),
             |cb AS (SELECT lang, token, count(*) AS cnt FROM xb
             |  GROUP BY 1, 2),
             |ta AS (SELECT lang, token FROM (
             |    SELECT lang, token, row_number() OVER (
             |      PARTITION BY lang ORDER BY cnt DESC, token) AS rk
             |    FROM ca)
             |  WHERE rk <= 10),
             |tb AS (SELECT lang, token FROM (
             |    SELECT lang, token, row_number() OVER (
             |      PARTITION BY lang ORDER BY cnt DESC, token) AS rk
             |    FROM cb)
             |  WHERE rk <= 10),
             |j AS (SELECT coalesce(ta.lang, tb.lang) AS lang,
             |    CASE WHEN ta.token IS NOT NULL AND tb.token IS NOT NULL
             |      THEN 1 ELSE 0 END AS in_both
             |  FROM ta FULL JOIN tb
             |    ON ta.lang = tb.lang AND ta.token = tb.token)
             |SELECT lang, CAST(sum(in_both) AS BIGINT) AS n_common,
             |  count(*) AS n_union,
             |  round(CAST(sum(in_both) AS DOUBLE) /
             |    CAST(count(*) AS DOUBLE), 4) AS jacc10
             |FROM j GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Schema-evolution-tolerant union: an old-schema parquet vintage
    // (no p_retailprice) written beside a new-schema one, read back
    // and unioned with allowMissingColumns — the added column null-
    // fills for old rows, which is exactly what the report proves
    // (per-brand counts with price stats counting only new-vintage
    // rows). The lake-migration read path every long-lived dataset
    // needs.
    QueryDef("q218_schema_evolution",
      (s, dir) => {
        val part = t(s, dir, "part")
        val tmpO = sys.props("java.io.tmpdir") + "/graft_sev_old"
        val tmpN = sys.props("java.io.tmpdir") + "/graft_sev_new"
        part.filter(col("p_partkey") % 2 === 0)
          .select("p_partkey", "p_brand")
          .write.mode("overwrite").parquet(tmpO)
        part.filter(col("p_partkey") % 2 =!= 0)
          .select("p_partkey", "p_brand", "p_retailprice")
          .write.mode("overwrite").parquet(tmpN)
        val old = s.read.parquet(tmpO)
        val neu = s.read.parquet(tmpN)
        old.unionByName(neu, allowMissingColumns = true)
          .groupBy("p_brand")
          .agg(count(lit(1)).as("n_rows"),
            count(col("p_retailprice")).as("n_priced"),
            sum(round(col("p_retailprice") * 100).cast("long"))
              .as("price_cents"))
          .orderBy("p_brand")
      },
      Some("""SELECT p_brand, count(*) AS n_rows,
             |  CAST(sum(CASE WHEN p_partkey % 2 <> 0 THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_priced,
             |  CAST(sum(CASE WHEN p_partkey % 2 <> 0
             |    THEN CAST(round(p_retailprice * 100) AS BIGINT) END)
             |    AS BIGINT) AS price_cents
             |FROM part GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Near-dup threshold sensitivity sweep: pair counts and affected-
    // doc counts at Jaccard ≥ {0.7, 0.8, 0.9} from ONE signature/
    // verification pass (the q44 machinery, filtered three ways) —
    // the tuning table that shows what a threshold buys BEFORE a full
    // dedup run commits to it.
    QueryDef("q219_threshold_sweep",
      (s, dir) => {
        val docs = t(s, dir, "documents").filter(col("doc_id") < 1000)
        val pairs = Dedup.minhashNearDups(docs, "doc_id", "text",
          k = 64, bands = 8, threshold = 0.7)
        // ONE pass over the verified pairs: conditional aggregates per
        // threshold, exploded to rows — never three re-plans.
        val ths = Seq(0.7, 0.8, 0.9)
        def tag(th: Double) = (th * 10).toInt
        val ends = pairs.select(col("jaccard"),
          explode(array(col("id_a"), col("id_b"))).as("id"))
        val aggs = ths.map(th => countDistinct(
            when(col("jaccard") >= th, col("id")))
            .as(s"a_${tag(th)}")) ++
          ths.map(th => (sum(when(col("jaccard") >= th, 1L)
            .otherwise(0L)) / 2).cast("long").as(s"p_${tag(th)}"))
        val agged = ends.agg(aggs.head, aggs.tail: _*)
        agged.select(explode(array(ths.map(th =>
            struct(lit(th).as("threshold"),
              col(s"p_${tag(th)}").as("n_pairs"),
              col(s"a_${tag(th)}").as("n_docs_affected"))): _*)).as("r"))
          .select("r.*")
          .orderBy("threshold")
      },
      Some("WITH " + minhashVerifiedCtes + ",\n" +
        """th AS (SELECT unnest([0.7, 0.8, 0.9]) AS threshold),
          |sw AS (SELECT th.threshold,
          |    count(CASE WHEN v.jaccard >= th.threshold THEN 1 END)
          |      AS n_pairs
          |  FROM th LEFT JOIN verified v ON true GROUP BY 1),
          |af AS (SELECT th.threshold, count(DISTINCT dd.id)
          |      AS n_docs_affected
          |  FROM th LEFT JOIN (
          |    SELECT id_a AS id, jaccard FROM verified
          |    UNION ALL SELECT id_b, jaccard FROM verified) dd
          |    ON dd.jaccard >= th.threshold
          |  GROUP BY 1)
          |SELECT sw.threshold, CAST(n_pairs AS BIGINT) AS n_pairs,
          |  CAST(n_docs_affected AS BIGINT) AS n_docs_affected
          |FROM sw JOIN af USING (threshold)
          |ORDER BY 1""".stripMargin)),

    // Cross-format integrity: the same lineitem slice written to
    // parquet, ORC, and CSV, read back, and proven IDENTICAL by the
    // q158 bucketed-checksum compare — every bucket of every pair
    // matches, or a sink lost something. Sources + anti-entropy
    // composed into a lake-format conformance test.
    QueryDef("q220_format_integrity",
      (s, dir) => {
        val base = t(s, dir, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_quantity",
            "l_returnflag")
        val tmp = sys.props("java.io.tmpdir")
        base.write.mode("overwrite").parquet(s"$tmp/graft_fmt_pq")
        Orc.write(base, s"$tmp/graft_fmt_orc")
        Csv.write(base, s"$tmp/graft_fmt_csv", sep = ",")
        val ddl = "l_orderkey BIGINT, l_linenumber INT, " +
          "l_quantity DOUBLE, l_returnflag STRING"
        val pq = s.read.parquet(s"$tmp/graft_fmt_pq")
        val orc = Orc.read(s, s"$tmp/graft_fmt_orc")
        val csv = Csv.read(s, s"$tmp/graft_fmt_csv", sep = ",",
          schema = Some(StructType.fromDDL(ddl)))
        val key = "l_orderkey"
        val fields = Seq("l_linenumber", "l_quantity", "l_returnflag")
        def cmp(nm: String, b: DataFrame) = TableChecksum
          .compare(pq, b, key, fields, buckets = 16)
          .agg(lit(nm).as("pair"), count(lit(1)).as("n_buckets"),
            sum(when(col("is_match"), 1L).otherwise(0L))
              .as("n_matching"))
        cmp("parquet_vs_orc", orc)
          .unionByName(cmp("parquet_vs_csv", csv))
          .orderBy("pair")
      },
      Some("""SELECT pair, CAST(16 AS BIGINT) AS n_buckets,
             |  CAST(16 AS BIGINT) AS n_matching
             |FROM (VALUES ('parquet_vs_csv'), ('parquet_vs_orc'))
             |  AS t(pair)
             |ORDER BY pair""".stripMargin)),

    // SLA conformance: per order priority, the share of lineitems
    // shipped within 30/60/90 days of the order date — integer-day
    // gaps, floor-ppm shares, one conditional aggregate.
    QueryDef("q221_sla_conformance",
      (s, dir) => {
        val j = t(s, dir, "lineitem")
          .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .withColumn("gap_days",
            expr("unix_micros(cast(l_shipdate as timestamp))" +
              " div 86400000000") -
            expr("unix_micros(cast(o_orderdate as timestamp))" +
              " div 86400000000"))
        j.groupBy(col("o_orderpriority").as("seg"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("gap_days") <= 30, 1L).otherwise(0L)).as("_d30"),
            sum(when(col("gap_days") <= 60, 1L).otherwise(0L)).as("_d60"),
            sum(when(col("gap_days") <= 90, 1L).otherwise(0L)).as("_d90"))
          .select(col("seg"), col("n"),
            expr("(_d30 * 1000000) DIV n").as("within30_ppm"),
            expr("(_d60 * 1000000) DIV n").as("within60_ppm"),
            expr("(_d90 * 1000000) DIV n").as("within90_ppm"))
          .orderBy("seg")
      },
      Some("""WITH j AS (
             |  SELECT o_orderpriority AS seg,
             |    epoch_us(l_shipdate) // 86400000000 -
             |    epoch_us(o_orderdate) // 86400000000 AS gap_days
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
             |SELECT seg, count(*) AS n,
             |  CAST((sum(CASE WHEN gap_days <= 30 THEN 1 ELSE 0 END)
             |    * 1000000) // count(*) AS BIGINT) AS within30_ppm,
             |  CAST((sum(CASE WHEN gap_days <= 60 THEN 1 ELSE 0 END)
             |    * 1000000) // count(*) AS BIGINT) AS within60_ppm,
             |  CAST((sum(CASE WHEN gap_days <= 90 THEN 1 ELSE 0 END)
             |    * 1000000) // count(*) AS BIGINT) AS within90_ppm
             |FROM j GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Fuzzy duplicate transactions (the payments-audit classic):
    // order pairs from the SAME customer whose totals differ by
    // ≤ 1% (cross-multiplied integer cents — no division) and whose
    // dates are ≤ 3 days apart — equi-join on the customer key, per-
    // customer blow-up bounded by order counts. Likely double-charge
    // candidates, summarized per priority of the earlier order.
    QueryDef("q222_fuzzy_duplicates",
      (s, dir) => {
        val o = t(s, dir, "orders")
          .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
          .withColumn("day",
            expr("unix_micros(cast(o_orderdate as timestamp))" +
              " div 86400000000"))
          .select(col("o_orderkey").as("k"), col("o_custkey").as("c"),
            col("o_orderpriority").as("pri"), col("cents"), col("day"))
        val pairs = o.as("x").join(o.as("y"),
          col("x.c") === col("y.c") && col("x.k") < col("y.k") &&
            abs(col("x.day") - col("y.day")) <= 3 &&
            // |cents_x − cents_y| ≤ 1% of the larger, in integers
            abs(col("x.cents") - col("y.cents")) * 100 <=
              greatest(col("x.cents"), col("y.cents")))
        pairs.groupBy(col("x.pri").as("pri"))
          .agg(count(lit(1)).as("n_pairs"),
            countDistinct(col("x.c")).as("n_customers"))
          .orderBy("pri")
      },
      Some("""WITH o AS (
             |  SELECT o_orderkey AS k, o_custkey AS c,
             |    o_orderpriority AS pri,
             |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             |    epoch_us(o_orderdate) // 86400000000 AS day
             |  FROM orders)
             |SELECT x.pri, count(*) AS n_pairs,
             |  count(DISTINCT x.c) AS n_customers
             |FROM o x JOIN o y
             |  ON x.c = y.c AND x.k < y.k
             |  AND abs(x.day - y.day) <= 3
             |  AND abs(x.cents - y.cents) * 100 <=
             |    greatest(x.cents, y.cents)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Decile migration matrix: every customer's spend decile in the
    // first half-year vs the second — the rank-migration view that
    // shows value churn a static RFM snapshot (q191) can't. Decile
    // cuts are integer rank arithmetic on each period's customer
    // frame; customers absent from a period land in decile 0.
    QueryDef("q223_decile_migration",
      (s, dir) => {
        val o = t(s, dir, "orders")
          .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
          .withColumn("p",
            when(col("o_orderdate") <
              lit("1995-06-01 00:00:00").cast("timestamp_ntz"), 0)
              .otherwise(1))
        // Decile ranks over the per-period CUSTOMER frame — data-
        // proportional, so the rank is DISTRIBUTED
        // (Rank.globalRowNumber) and the count a 1-row broadcast,
        // never an unpartitioned window (q175/q191's killer shape).
        def dec(period: Int) = {
          val per = o.where(col("p") === period)
            .groupBy(col("o_custkey").as("c"))
            .agg(sum("cents").as("v"))
            .localCheckpoint(true)
          Rank.globalRowNumber(per, Seq("v" -> true, "c" -> true), "_rk")
            .crossJoin(broadcast(per.agg(count(lit(1)).as("_n"))))
            .select(col("c"),
              (expr("((_rk - 1) * 10) DIV _n") + 1).cast("int")
                .as(s"d$period"))
        }
        dec(0).join(dec(1), Seq("c"), "full_outer")
          .groupBy(coalesce(col("d0"), lit(0)).as("decile_h1"),
            coalesce(col("d1"), lit(0)).as("decile_h2"))
          .agg(count(lit(1)).as("n_customers"))
          .orderBy("decile_h1", "decile_h2")
      },
      Some("""WITH o AS (
             |  SELECT o_custkey AS c,
             |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             |    CASE WHEN o_orderdate < TIMESTAMP '1995-06-01 00:00:00'
             |      THEN 0 ELSE 1 END AS p
             |  FROM orders),
             |d0 AS (SELECT c, CAST(((rk - 1) * 10) // n + 1 AS INT)
             |      AS d0
             |  FROM (SELECT c, row_number() OVER (ORDER BY v, c) AS rk,
             |      count(*) OVER () AS n
             |    FROM (SELECT c, sum(cents) AS v FROM o WHERE p = 0
             |          GROUP BY 1))),
             |d1 AS (SELECT c, CAST(((rk - 1) * 10) // n + 1 AS INT)
             |      AS d1
             |  FROM (SELECT c, row_number() OVER (ORDER BY v, c) AS rk,
             |      count(*) OVER () AS n
             |    FROM (SELECT c, sum(cents) AS v FROM o WHERE p = 1
             |          GROUP BY 1)))
             |SELECT coalesce(d0.d0, 0) AS decile_h1,
             |  coalesce(d1.d1, 0) AS decile_h2,
             |  count(*) AS n_customers
             |FROM d0 FULL JOIN d1 ON d0.c = d1.c
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Release qualification report — the flagship drift composition:
    // per language, the KS statistic (worst quantile shift, q160),
    // PSI (total mass moved, q192), and top-10 vocabulary Jaccard
    // (ranking drift, q217) between the corpus halves, in ONE row a
    // release gate can threshold. Three proven operators, one join
    // on the language grain.
    QueryDef("q224_release_qualification",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val a = docs.filter(col("doc_id") % 2 === 0)
        val b = docs.filter(col("doc_id") % 2 =!= 0)
          .withColumn("n_chars", col("n_chars") + lit(100L))
        val ks = Drift.ksFromHists(a, b, "lang", "n_chars",
          lo = 0.0, hi = 1024.0, nbins = 256)
        val psi = Drift.psiFromHists(a, b, "lang", "n_chars",
          lo = 0.0, hi = 1024.0, nbins = 256, eps = 1e-4)
          .select(col("lang"), col("psi"))
        def top(half: DataFrame) = TextAnalysis
          .topTokens(half, "lang", "text", k = 10)
          .select(col("lang"), col("token"))
        val rd = top(a).withColumn("_in_a", lit(1))
          .join(top(b).withColumn("_in_b", lit(1)),
            Seq("lang", "token"), "full_outer")
          .groupBy("lang")
          .agg(sum(when(col("_in_a").isNotNull &&
              col("_in_b").isNotNull, 1L).otherwise(0L)).as("_nc"),
            count(lit(1)).as("_nu"))
          .select(col("lang"),
            round(col("_nc").cast("double") /
              col("_nu").cast("double"), 4).as("vocab_jacc10"))
        ks.join(psi, Seq("lang")).join(rd, Seq("lang"))
          .orderBy("lang")
      },
      Some("""WITH aa AS (
             |  SELECT lang, CAST(least(greatest(
             |      floor(CAST(n_chars AS DOUBLE) / 4.0), 0), 255)
             |      AS BIGINT) AS b
             |  FROM documents WHERE doc_id % 2 = 0 AND n_chars IS NOT NULL),
             |bb AS (
             |  SELECT lang, CAST(least(greatest(
             |      floor(CAST(n_chars + 100 AS DOUBLE) / 4.0), 0), 255)
             |      AS BIGINT) AS b
             |  FROM documents WHERE doc_id % 2 <> 0 AND n_chars IS NOT NULL),
             |langs AS (SELECT DISTINCT lang FROM documents),
             |grid AS (SELECT lang, s AS b FROM langs
             |         CROSS JOIN (SELECT unnest(range(256)) AS s)),
             |ka AS (SELECT lang, b, count(*) AS c FROM aa GROUP BY 1, 2),
             |kb AS (SELECT lang, b, count(*) AS c FROM bb GROUP BY 1, 2),
             |j AS (SELECT g.lang, g.b, coalesce(ka.c, 0) AS ca,
             |        coalesce(kb.c, 0) AS cb
             |      FROM grid g
             |      LEFT JOIN ka ON g.lang = ka.lang AND g.b = ka.b
             |      LEFT JOIN kb ON g.lang = kb.lang AND g.b = kb.b),
             |cum AS (SELECT lang, b, ca, cb,
             |          sum(ca) OVER w AS cum_a, sum(cb) OVER w AS cum_b,
             |          sum(ca) OVER wa AS n_a, sum(cb) OVER wa AS n_b
             |        FROM j
             |        WINDOW w AS (PARTITION BY lang ORDER BY b),
             |               wa AS (PARTITION BY lang)),
             |ksr AS (SELECT lang, CAST(n_a AS BIGINT) AS n_a,
             |    CAST(n_b AS BIGINT) AS n_b,
             |    round(max(abs(CAST(cum_a AS DOUBLE) / CAST(n_a AS DOUBLE)
             |      - CAST(cum_b AS DOUBLE) / CAST(n_b AS DOUBLE))), 4)
             |      + 0.0 AS ks
             |  FROM cum WHERE n_a > 0 AND n_b > 0
             |  GROUP BY 1, 2, 3),
             |pq AS (SELECT lang,
             |    greatest(CAST(ca AS DOUBLE) / CAST(n_a AS DOUBLE),
             |      0.0001) AS p,
             |    greatest(CAST(cb AS DOUBLE) / CAST(n_b AS DOUBLE),
             |      0.0001) AS q
             |  FROM cum WHERE n_a > 0 AND n_b > 0),
             |psir AS (SELECT lang, round(sum((p - q) * ln(p / q)), 4)
             |    + 0.0 AS psi
             |  FROM pq GROUP BY 1),
             |xa AS (SELECT lang, unnest(list_filter(
             |    string_split_regex(text, ' +'), t -> t <> '')) AS token
             |  FROM documents WHERE doc_id % 2 = 0),
             |xb AS (SELECT lang, unnest(list_filter(
             |    string_split_regex(text, ' +'), t -> t <> '')) AS token
             |  FROM documents WHERE doc_id % 2 <> 0),
             |ca2 AS (SELECT lang, token, count(*) AS cnt FROM xa
             |  GROUP BY 1, 2),
             |cb2 AS (SELECT lang, token, count(*) AS cnt FROM xb
             |  GROUP BY 1, 2),
             |ta AS (SELECT lang, token FROM (
             |    SELECT lang, token, row_number() OVER (
             |      PARTITION BY lang ORDER BY cnt DESC, token) AS rk
             |    FROM ca2)
             |  WHERE rk <= 10),
             |tb AS (SELECT lang, token FROM (
             |    SELECT lang, token, row_number() OVER (
             |      PARTITION BY lang ORDER BY cnt DESC, token) AS rk
             |    FROM cb2)
             |  WHERE rk <= 10),
             |rj AS (SELECT coalesce(ta.lang, tb.lang) AS lang,
             |    CASE WHEN ta.token IS NOT NULL AND tb.token IS NOT NULL
             |      THEN 1 ELSE 0 END AS in_both
             |  FROM ta FULL JOIN tb
             |    ON ta.lang = tb.lang AND ta.token = tb.token),
             |rdr AS (SELECT lang,
             |    round(CAST(sum(in_both) AS DOUBLE) /
             |      CAST(count(*) AS DOUBLE), 4) AS vocab_jacc10
             |  FROM rj GROUP BY 1)
             |SELECT ksr.lang, n_a, n_b, ks, psi, vocab_jacc10
             |FROM ksr
             |JOIN psir ON ksr.lang = psir.lang
             |JOIN rdr ON ksr.lang = rdr.lang
             |ORDER BY 1""".stripMargin)),

    // Winsorized mean (q176's sibling): instead of DROPPING the rank
    // tails, CLAMP values to the exact interpolated P05/P95 — the
    // robust center that keeps n constant (a trimmed mean changes
    // the denominator; winsorizing doesn't, which matters when the
    // mean feeds a rate). The percentile kernel is q143's pinned
    // one; clamped values cross the compare as exact micro-unit
    // sums.
    QueryDef("q225_winsorized_mean",
      (s, dir) => {
        val docs = t(s, dir, "documents")
          .where(col("n_chars").isNotNull)
        val caps = docs.groupBy("lang").agg(
          expr("percentile(CAST(n_chars AS DOUBLE), 0.05)").as("lo"),
          expr("percentile(CAST(n_chars AS DOUBLE), 0.95)").as("hi"))
        docs.join(broadcast(caps), Seq("lang"))
          .withColumn("w", least(greatest(
            col("n_chars").cast("double"), col("lo")), col("hi")))
          .groupBy("lang")
          .agg(count(lit(1)).as("n"),
            round(max("lo"), 4).as("p05"), round(max("hi"), 4).as("p95"),
            sum(col("n_chars")).as("_sr"),
            sum(round(col("w") * lit(1e6)).cast("long")).as("_sw"))
          .select(col("lang"), col("n"), col("p05"), col("p95"),
            round(col("_sr").cast("double") / col("n").cast("double"), 4)
              .as("mean_raw"),
            round(col("_sw").cast("double") /
              (col("n").cast("double") * lit(1e6)), 4)
              .as("mean_winsorized"))
          .orderBy("lang")
      },
      Some("""WITH d AS (
             |  SELECT lang, n_chars, CAST(n_chars AS DOUBLE) AS v
             |  FROM documents WHERE n_chars IS NOT NULL),
             |caps AS (SELECT lang,
             |    percentile_cont(0.05) WITHIN GROUP (ORDER BY v) AS lo,
             |    percentile_cont(0.95) WITHIN GROUP (ORDER BY v) AS hi
             |  FROM d GROUP BY 1),
             |w AS (SELECT d.lang, d.n_chars,
             |    least(greatest(d.v, caps.lo), caps.hi) AS w,
             |    caps.lo, caps.hi
             |  FROM d JOIN caps ON d.lang = caps.lang)
             |SELECT lang, count(*) AS n,
             |  round(max(lo), 4) AS p05, round(max(hi), 4) AS p95,
             |  round(CAST(sum(n_chars) AS DOUBLE) /
             |    CAST(count(*) AS DOUBLE), 4) AS mean_raw,
             |  round(CAST(sum(CAST(round(w * 1000000.0) AS BIGINT))
             |      AS DOUBLE) /
             |    (CAST(count(*) AS DOUBLE) * 1000000.0), 4)
             |    AS mean_winsorized
             |FROM w GROUP BY 1 ORDER BY 1""".stripMargin))
  )

  /** Fourth catalog section (q226+) — a fresh Seq literal so no single
    * initializer method approaches the JVM 64 KB bytecode limit.
    */
  private val extra2Defs: Seq[QueryDef] = Seq(

    // Kaplan–Meier survival over user lifetimes (ops/Survival
    // .kaplanMeier): thin the stream to the ~5-events-per-user slice
    // (props.k < 8, q92's JSON field), lifetime = last−first active
    // day, right-censor users still active within 5 days of the
    // horizon. All KM arithmetic runs on the per-duration frame
    // (bounded by the 30-day span); the survival product is exp∘Σln
    // accumulated in duration order in both engines.
    QueryDef("q226_kaplan_meier",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .where(from_json(col("props"), "k INT",
            Map.empty[String, String]).getField("k") < 8)
          .withColumn("day",
            expr("unix_micros(cast(ts as timestamp)) div 86400000000"))
        Survival.kaplanMeier(ev, "user_id", "day", censorGap = 5)
          .orderBy("t")
      },
      Some("""WITH ev AS (
             |  SELECT user_id AS e, epoch_us(ts) // 86400000000 AS d
             |  FROM events
             |  WHERE CAST(json_extract_string(props, '$.k') AS INT) < 8),
             |spans AS (SELECT e, min(d) AS fd, max(d) AS ld
             |  FROM ev GROUP BY 1),
             |h AS (SELECT max(ld) AS h FROM spans),
             |lab AS (SELECT
             |    CASE WHEN ld <= h - 5 THEN ld - fd ELSE h - fd END AS t,
             |    CASE WHEN ld <= h - 5 THEN 1 ELSE 0 END AS obs
             |  FROM spans CROSS JOIN h),
             |pt AS (SELECT t, sum(obs) AS n_churn,
             |    sum(1 - obs) AS n_censored, count(*) AS n_at
             |  FROM lab GROUP BY 1),
             |w AS (SELECT *, sum(n_at) OVER (ORDER BY t) AS cum,
             |    sum(n_at) OVER () AS tot
             |  FROM pt),
             |r AS (SELECT t, tot - cum + n_at AS n_risk, n_churn,
             |    n_censored,
             |    CASE WHEN n_churn > 0
             |      THEN ln(1 - CAST(n_churn AS DOUBLE) /
             |        CAST(n_risk AS DOUBLE))
             |      ELSE 0.0 END AS lnterm
             |  FROM w),
             |sv AS (SELECT t, n_risk, n_churn, n_censored,
             |    round(exp(sum(lnterm) OVER (ORDER BY t)), 6) AS survival
             |  FROM r)
             |SELECT CAST(t AS BIGINT) AS t,
             |  CAST(n_risk AS BIGINT) AS n_risk,
             |  CAST(n_churn AS BIGINT) AS n_churn,
             |  CAST(n_censored AS BIGINT) AS n_censored, survival
             |FROM sv WHERE n_churn > 0 ORDER BY 1""".stripMargin)),

    // Welch's unequal-variance t-test (RobustStats.welchT): arms by
    // portable hash of user_id (the q57 split discipline), metric in
    // exact integer cents, per event-type strata. The parametric
    // sibling of q177's Mann–Whitney on the same layout — both
    // should agree there is no effect (arms are random).
    QueryDef("q227_welch_ttest",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .where(col("value").isNotNull)
          .withColumn("arm", pmod(
            Hashing.portableHash(col("user_id").cast("string")),
            lit(2L)).cast("int"))
          .withColumn("cents", round(col("value") * 100).cast("long"))
        RobustStats.welchT(ev, "event_type", "arm", "cents")
          .orderBy("event_type")
      },
      Some(s"""WITH ev AS (
             |  SELECT event_type,
             |    CASE WHEN ${Hashing.duckPortableHash(
                      "CAST(user_id AS VARCHAR)")} % 2 = 1
             |      THEN 1 ELSE 0 END AS arm,
             |    CAST(round(value * 100) AS BIGINT) AS x
             |  FROM events WHERE value IS NOT NULL),
             |a AS (SELECT event_type, arm, count(*) AS n,
             |    sum(x) AS sx, sum(x * x) AS sxx
             |  FROM ev GROUP BY 1, 2),
             |p AS (SELECT event_type, arm, n,
             |    CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
             |    (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) *
             |        CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) /
             |      (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) AS von
             |  FROM a)
             |SELECT a0.event_type, CAST(a0.n AS BIGINT) AS n0,
             |  CAST(a1.n AS BIGINT) AS n1,
             |  round(a0.mean, 4) AS mean0, round(a1.mean, 4) AS mean1,
             |  round((a1.mean - a0.mean) / sqrt(a0.von + a1.von), 4)
             |    + 0.0 AS t,
             |  round((a0.von + a1.von) * (a0.von + a1.von) /
             |    (a0.von * a0.von / (CAST(a0.n AS DOUBLE) - 1.0) +
             |     a1.von * a1.von / (CAST(a1.n AS DOUBLE) - 1.0)), 2)
             |    AS df
             |FROM p a0 JOIN p a1
             |  ON a0.event_type = a1.event_type
             |  AND a0.arm = 0 AND a1.arm = 1
             |ORDER BY 1""".stripMargin)),

    // Daily-volume autocorrelation at lags 1..7 (Seasonal.acf): the
    // "is there a weekly cycle" diagnostic behind q181's dow model.
    // Missing calendar days count as zero; one global mean/SS per
    // series (r_0 ≡ 1 normalization); every Σ is an exact integer
    // sum so the final double expression is order-free.
    QueryDef("q228_daily_acf",
      (s, dir) => {
        val ev = t(s, dir, "events").withColumn("day",
          expr("unix_micros(cast(ts as timestamp)) div 86400000000"))
        Seasonal.acf(ev, "event_type", "day", maxLag = 7)
          .orderBy("g", "lag")
      },
      Some("""WITH counted AS (
             |  SELECT event_type AS g, epoch_us(ts) // 86400000000 AS d,
             |    count(*) AS x
             |  FROM events GROUP BY 1, 2),
             |lims AS (SELECT g, min(d) AS lo, max(d) AS hi
             |  FROM counted GROUP BY 1),
             |grid AS (SELECT g, unnest(generate_series(lo, hi)) AS d
             |  FROM lims),
             |daily AS (SELECT grid.g, grid.d, coalesce(x, 0) AS x
             |  FROM grid LEFT JOIN counted
             |    ON grid.g = counted.g AND grid.d = counted.d),
             |mom AS (SELECT g, count(*) AS n_days, sum(x) AS sx,
             |    sum(x * x) AS sxx
             |  FROM daily GROUP BY 1),
             |sh AS (SELECT g, unnest(generate_series(1, 7)) AS lag, d, x
             |  FROM daily),
             |shifted AS (SELECT g, lag, d + lag AS d, x AS x_lag
             |  FROM sh),
             |pairs AS (SELECT daily.g, lag, daily.x, x_lag
             |  FROM daily JOIN shifted
             |    ON daily.g = shifted.g AND daily.d = shifted.d),
             |agg AS (SELECT g, lag, count(*) AS n_pairs,
             |    sum(x * x_lag) AS sxy, sum(x) AS spx, sum(x_lag) AS spl
             |  FROM pairs GROUP BY 1, 2)
             |SELECT agg.g, CAST(lag AS INT) AS lag,
             |  CAST(n_days AS BIGINT) AS n_days,
             |  CAST(n_pairs AS BIGINT) AS n_pairs,
             |  round((CAST(sxy AS DOUBLE) -
             |      (CAST(sx AS DOUBLE) / CAST(n_days AS DOUBLE)) *
             |        CAST(spx + spl AS DOUBLE) +
             |      CAST(n_pairs AS DOUBLE) *
             |        (CAST(sx AS DOUBLE) / CAST(n_days AS DOUBLE)) *
             |        (CAST(sx AS DOUBLE) / CAST(n_days AS DOUBLE))) /
             |    (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) *
             |      CAST(sx AS DOUBLE) / CAST(n_days AS DOUBLE)), 4)
             |    + 0.0 AS acf
             |FROM agg JOIN mom ON agg.g = mom.g
             |WHERE CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) *
             |    CAST(sx AS DOUBLE) / CAST(n_days AS DOUBLE) > 0
             |ORDER BY 1, 2""".stripMargin)),

    // Theil–Sen robust trend per event type (RobustStats.theilSen):
    // median of pairwise daily-count slopes beside the OLS slope.
    // The pair join is quadratic ONLY in the per-group day span
    // (30 days → ≤435 pairs/group), never in event volume — the
    // caller aggregates to the daily grain first, per the op's
    // scale contract.
    QueryDef("q229_theil_sen",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .withColumn("day",
            expr("unix_micros(cast(ts as timestamp)) div 86400000000"))
          .groupBy(col("event_type").as("g"), col("day").as("x"))
          .agg(count(lit(1)).as("y"))
        RobustStats.theilSen(daily, "g", "x", "y").orderBy("g")
      },
      Some("""WITH daily AS (
             |  SELECT event_type AS g, epoch_us(ts) // 86400000000 AS x,
             |    count(*) AS y
             |  FROM events GROUP BY 1, 2),
             |pairs AS (SELECT a.g,
             |    CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE)
             |      AS s
             |  FROM daily a JOIN daily b ON a.g = b.g AND a.x < b.x),
             |sen AS (SELECT g, count(*) AS n_pairs,
             |    percentile_cont(0.5) WITHIN GROUP (ORDER BY s) AS slope
             |  FROM pairs GROUP BY 1),
             |icept AS (SELECT d.g,
             |    percentile_cont(0.5) WITHIN GROUP (ORDER BY
             |      CAST(d.y AS DOUBLE) - sen.slope * CAST(d.x AS DOUBLE))
             |      AS ic
             |  FROM daily d JOIN sen ON d.g = sen.g GROUP BY 1),
             |ols AS (SELECT g, count(*) AS n_points, sum(x) AS sx,
             |    sum(y) AS sy, sum(x * x) AS sxx, sum(x * y) AS sxy
             |  FROM daily GROUP BY 1)
             |SELECT ols.g, CAST(n_points AS BIGINT) AS n_points,
             |  CAST(n_pairs AS BIGINT) AS n_pairs,
             |  round(slope, 6) + 0.0 AS sen_slope,
             |  round(ic, 6) + 0.0 AS sen_intercept,
             |  round((CAST(n_points AS DOUBLE) * CAST(sxy AS DOUBLE) -
             |      CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
             |    (CAST(n_points AS DOUBLE) * CAST(sxx AS DOUBLE) -
             |      CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) + 0.0
             |    AS ols_slope
             |FROM ols JOIN sen ON ols.g = sen.g
             |JOIN icept ON ols.g = icept.g
             |ORDER BY 1""".stripMargin)),

    // Multi-touch attribution (ops/Attribution.report): purchases
    // credited to the click/view touches in the 3 preceding days
    // under first/last/linear models at once, integer-cents exact
    // (linear remainder to the first touch), untouched conversions
    // in the 'direct' bucket so each model column sums to total
    // conversion value.
    QueryDef("q230_attribution",
      (s, dir) => Attribution.report(t(s, dir, "events"),
          "event_id", "user_id", "ts", "event_type",
          convType = "purchase", touchTypes = Seq("click", "view"),
          valueCol = "value", lookbackDays = 3)
        .orderBy("channel"),
      Some("""WITH conv AS (
             |  SELECT event_id AS cid, user_id AS e, epoch_us(ts) AS cts,
             |    CAST(round(value * 100) AS BIGINT) AS cents
             |  FROM events WHERE event_type = 'purchase'),
             |touch AS (SELECT user_id AS e, epoch_us(ts) AS tts,
             |    event_type AS channel
             |  FROM events WHERE event_type IN ('click', 'view')),
             |m AS (SELECT cid, cents, tts, channel,
             |    row_number() OVER (PARTITION BY cid
             |      ORDER BY tts, channel) AS pos,
             |    count(*) OVER (PARTITION BY cid) AS n_t
             |  FROM conv JOIN touch ON conv.e = touch.e
             |  WHERE tts < cts AND tts >= cts - 259200000000),
             |cr AS (SELECT channel, cid,
             |    CASE WHEN pos = 1 THEN cents ELSE 0 END AS fc,
             |    CASE WHEN pos = n_t THEN cents ELSE 0 END AS lc,
             |    cents // n_t +
             |      CASE WHEN pos = 1 THEN cents % n_t ELSE 0 END AS nc
             |  FROM m),
             |bych AS (SELECT channel, count(DISTINCT cid)
             |      AS n_conversions,
             |    sum(fc) AS first_cents, sum(lc) AS last_cents,
             |    sum(nc) AS linear_cents
             |  FROM cr GROUP BY 1),
             |direct AS (SELECT 'direct' AS channel,
             |    count(*) AS n_conversions,
             |    coalesce(sum(cents), 0) AS first_cents,
             |    coalesce(sum(cents), 0) AS last_cents,
             |    coalesce(sum(cents), 0) AS linear_cents
             |  FROM conv WHERE cid NOT IN (SELECT DISTINCT cid FROM m)
             |  HAVING count(*) > 0)
             |SELECT channel, CAST(n_conversions AS BIGINT)
             |    AS n_conversions,
             |  CAST(first_cents AS BIGINT) AS first_cents,
             |  CAST(last_cents AS BIGINT) AS last_cents,
             |  CAST(linear_cents AS BIGINT) AS linear_cents
             |FROM (SELECT * FROM bych UNION ALL SELECT * FROM direct)
             |ORDER BY 1""".stripMargin)),

    // Hash-seeded Poisson bootstrap CI on mean event value
    // (ops/Bootstrap.meanCi, Chamandy et al. 2012): 100 deterministic
    // replicates ride ONE shuffle as weighted aggregates — the only
    // bootstrap that works at 100 TB. Every draw is an inverse-CDF
    // lookup of a portable hash, so DuckDB replays the exact
    // resamples.
    QueryDef("q231_bootstrap_ci",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .where(col("value").isNotNull)
          .withColumn("cents", round(col("value") * 100).cast("long"))
        Bootstrap.meanCi(ev, "event_type", "event_id", "cents", r = 100)
          .orderBy("g")
      },
      Some {
        val wSum = Bootstrap.cdf
          .map(c => s"(CASE WHEN $c < u THEN 1 ELSE 0 END)")
          .mkString("\n             |      + ")
        s"""WITH ev AS (
             |  SELECT event_type AS g, CAST(event_id AS VARCHAR) AS id,
             |    CAST(round(value * 100) AS BIGINT) AS x
             |  FROM events WHERE value IS NOT NULL),
             |reps AS (SELECT g, id, x,
             |    unnest(generate_series(0, 99)) AS rep
             |  FROM ev),
             |uu AS (SELECT g, rep, x,
             |    CAST(${Hashing.duckUniversalHash("rep", "id")} AS DOUBLE) /
             |      2147483647.0 AS u
             |  FROM reps),
             |wt AS (SELECT g, rep, x,
             |    $wSum AS w
             |  FROM uu),
             |rm AS (SELECT g, rep,
             |    CAST(round(CAST(sum(w * x) AS DOUBLE) /
             |      CAST(sum(w) AS DOUBLE) * 1000.0) AS BIGINT) AS mr
             |  FROM wt GROUP BY 1, 2 HAVING sum(w) > 0),
             |pt AS (SELECT g, count(*) AS n, sum(x) AS sx
             |  FROM ev GROUP BY 1),
             |ci AS (SELECT g, count(*) AS nrep,
             |    percentile_cont(0.025) WITHIN GROUP (ORDER BY mr) AS lo,
             |    percentile_cont(0.975) WITHIN GROUP (ORDER BY mr) AS hi,
             |    sum(mr) AS sm, sum(mr * mr) AS smm
             |  FROM rm GROUP BY 1)
             |SELECT pt.g, CAST(n AS BIGINT) AS n,
             |  round(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE), 4) AS mean,
             |  round(lo / 1000.0, 4) AS ci_lo,
             |  round(hi / 1000.0, 4) AS ci_hi,
             |  round(sqrt((CAST(smm AS DOUBLE) - CAST(sm AS DOUBLE) *
             |      CAST(sm AS DOUBLE) / CAST(nrep AS DOUBLE)) /
             |    (CAST(nrep AS DOUBLE) - 1.0)) / 1000.0, 4) AS se_boot
             |FROM pt JOIN ci ON pt.g = ci.g ORDER BY 1""".stripMargin
      }),

    // Modularity of the near-dup cluster partition (GraphMetrics
    // .modularity, Newman–Girvan): are q61's components actually
    // denser than a degree-preserving rewiring? Q from exact integer
    // sums — (4m·Σe_c − Σd_c²)/4m² — over the same verified pair
    // frame and recursive components the q61 oracle pins.
    QueryDef("q232_modularity",
      (s, dir) => {
        val docs = t(s, dir, "documents").filter(col("doc_id") < 1000)
        val pairs = Dedup.minhashNearDups(docs, "doc_id", "text",
          k = 64, bands = 8, threshold = 0.8)
        val clusters = Components.dedupClusters(
          docs, "doc_id", pairs, "id_a", "id_b")
        GraphMetrics.modularity(pairs, "id_a", "id_b",
          clusters, "doc_id", "component")
      },
      Some("WITH RECURSIVE " + minhashVerifiedCtes + ",\n" +
        clusterChainCtes + ",\n" +
        """lab AS (SELECT id AS node, component AS lbl FROM comp),
          |labeled AS (SELECT la.lbl AS la, lb.lbl AS lb
          |  FROM pairs e
          |  JOIN lab la ON e.id_a = la.node
          |  JOIN lab lb ON e.id_b = lb.node),
          |intra AS (SELECT la AS lbl, count(*) AS e_c
          |  FROM labeled WHERE la = lb GROUP BY 1),
          |degl AS (SELECT lbl, count(*) AS d_c FROM (
          |    SELECT la AS lbl FROM labeled
          |    UNION ALL SELECT lb FROM labeled)
          |  GROUP BY 1),
          |mm AS (SELECT count(*) AS m FROM pairs),
          |nc AS (SELECT count(DISTINCT component) AS n_communities
          |  FROM comp),
          |sums AS (SELECT count(*) AS n_linked,
          |    sum(coalesce(e_c, 0)) AS se, sum(d_c * d_c) AS sd2
          |  FROM degl LEFT JOIN intra USING (lbl))
          |SELECT CAST(m AS BIGINT) AS m,
          |  CAST(n_communities AS BIGINT) AS n_communities,
          |  CAST(n_linked AS BIGINT) AS n_linked_communities,
          |  round(CAST(4 * m * se - sd2 AS DOUBLE) /
          |    CAST(4 * m * m AS DOUBLE), 6) + 0.0 AS modularity
          |FROM mm, nc, sums""".stripMargin)),

    // Deterministic label propagation, 4 synchronized rounds
    // (Components.labelPropagation): the density-aware sibling of
    // connected components on the SAME near-dup graph — weakly
    // bridged clumps that reach stays one component fragment into
    // communities. Min-label tie-break + fixed rounds = replayable
    // round for round by the oracle.
    QueryDef("q233_label_propagation",
      (s, dir) => {
        val docs = t(s, dir, "documents").filter(col("doc_id") < 1000)
        val pairs = Dedup.minhashNearDups(docs, "doc_id", "text",
          k = 64, bands = 8, threshold = 0.8)
        Components.labelPropagation(docs.select("doc_id"), "doc_id",
            pairs, "id_a", "id_b", rounds = 4)
          .select(col("id").as("doc_id"), col("community"))
          .orderBy("doc_id")
      },
      Some("WITH " + minhashVerifiedCtes + ",\n" +
        pairsEdgesCtes + ",\n" + lpaCtes(4) + "\n" +
        """SELECT id AS doc_id, lbl AS community
          |FROM lp4 ORDER BY 1""".stripMargin)),

    // Grid-blocked nearest-neighbor spatial join (SpatialJoin
    // .nearestNeighbor): deterministic offset-encoded micro-degree
    // coordinates hashed per key, 30° cells, target side replicated
    // into its 3×3 neighborhood, probe joins its own cell — an
    // equi-join, never an all-pairs cross. Ranking distance is the
    // exact integer squared degree distance.
    QueryDef("q234_spatial_nn",
      (s, dir) => {
        def coords(df: DataFrame, key: String) = df.select(
          col(key),
          pmod(Hashing.portableHash(
            concat(col(key).cast("string"), lit(":lat"))),
            lit(120000001L)).as("lat"),
          pmod(Hashing.portableHash(
            concat(col(key).cast("string"), lit(":lon"))),
            lit(360000001L)).as("lon"))
        val cust = coords(t(s, dir, "customer"), "c_custkey")
        val supp = coords(t(s, dir, "supplier"), "s_suppkey")
        SpatialJoin.nearestNeighbor(
            cust, "c_custkey", "lat", "lon",
            supp, "s_suppkey", "lat", "lon", cellE6 = 30000000L)
          .withColumnRenamed("pid", "c_custkey")
          .orderBy("c_custkey")
      },
      Some {
        def h(key: String, tag: String) = Hashing.duckPortableHash(
          s"CAST($key AS VARCHAR) || ':$tag'")
        s"""WITH c AS (
             |  SELECT c_custkey AS pid,
             |    ${h("c_custkey", "lat")} % 120000001 AS plat,
             |    ${h("c_custkey", "lon")} % 360000001 AS plon
             |  FROM customer),
             |s AS (SELECT s_suppkey AS tid,
             |    ${h("s_suppkey", "lat")} % 120000001 AS tlat,
             |    ${h("s_suppkey", "lon")} % 360000001 AS tlon
             |  FROM supplier),
             |t9 AS (SELECT tid, tlat, tlon,
             |    tlat // 30000000 + dla AS cla,
             |    tlon // 30000000 + dlo AS clo
             |  FROM s,
             |    (SELECT unnest([-1, 0, 1]) AS dla) a,
             |    (SELECT unnest([-1, 0, 1]) AS dlo) b),
             |cand AS (SELECT pid, tid,
             |    (plat - tlat) * (plat - tlat) +
             |      (plon - tlon) * (plon - tlon) AS dist2_e12
             |  FROM c JOIN t9
             |    ON plat // 30000000 = cla AND plon // 30000000 = clo),
             |rk AS (SELECT *, row_number() OVER (
             |    PARTITION BY pid ORDER BY dist2_e12, tid) AS rn
             |  FROM cand)
             |SELECT pid AS c_custkey, tid AS nn_id,
             |  CAST(dist2_e12 AS BIGINT) AS dist2_e12,
             |  round(sqrt(CAST(dist2_e12 AS DOUBLE)) / 1000000.0, 6)
             |    AS dist_deg
             |FROM rk WHERE rn = 1 ORDER BY 1""".stripMargin
      }),

    // Watermark-planning lateness profile (ops/Lateness
    // .watermarkProfile): deterministic ±2 h hash jitter turns the
    // in-order synthetic stream into an out-of-order arrival
    // simulation; the running event-time watermark is computed as a
    // proper two-pass DISTRIBUTED prefix scan (bucketed maxima +
    // partitioned windows — no single-partition global window), and
    // each candidate allowed-lateness setting reports its drop rate.
    QueryDef("q235_watermark_profile",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .withColumn("et", expr("unix_micros(cast(ts as timestamp))"))
          .withColumn("arr", col("et") +
            pmod(Hashing.portableHash(
              concat(col("event_id").cast("string"), lit(":arr"))),
              lit(14400000001L)) - lit(7200000000L))
        Lateness.watermarkProfile(ev, "event_id", "et", "arr",
            bucketUs = 86400000000L,
            allowedUs = Seq(600000000L, 1800000000L, 3600000000L,
              7200000000L))
          .orderBy("allowed_s")
      },
      Some(s"""WITH e AS (
             |  SELECT event_id AS id, epoch_us(ts) AS et,
             |    epoch_us(ts) + ${Hashing.duckPortableHash(
                    "CAST(event_id AS VARCHAR) || ':arr'")}
             |      % 14400000001 - 7200000000 AS arr
             |  FROM events),
             |w AS (SELECT id, et, arr,
             |    max(et) OVER (ORDER BY arr, id) AS wm
             |  FROM e),
             |l AS (SELECT *, wm - et AS late_us FROM w),
             |st AS (SELECT count(*) AS n,
             |    sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS n_late,
             |    percentile_cont(0.5) WITHIN GROUP (ORDER BY late_us)
             |      AS p50,
             |    percentile_cont(0.95) WITHIN GROUP (ORDER BY late_us)
             |      AS p95,
             |    percentile_cont(0.99) WITHIN GROUP (ORDER BY late_us)
             |      AS p99
             |  FROM l),
             |al AS (SELECT unnest([600000000, 1800000000, 3600000000,
             |    7200000000]) AS allowed_us),
             |dr AS (SELECT allowed_us,
             |    sum(CASE WHEN late_us > allowed_us THEN 1 ELSE 0 END)
             |      AS n_dropped
             |  FROM l CROSS JOIN al GROUP BY 1)
             |SELECT allowed_us // 1000000 AS allowed_s,
             |  CAST(n AS BIGINT) AS n, CAST(n_late AS BIGINT) AS n_late,
             |  CAST(n_dropped AS BIGINT) AS n_dropped,
             |  CAST((n_dropped * 1000000) // n AS BIGINT) AS drop_ppm,
             |  round(p50 / 1000000.0, 3) AS p50_late_s,
             |  round(p95 / 1000000.0, 3) AS p95_late_s,
             |  round(p99 / 1000000.0, 3) AS p99_late_s
             |FROM dr CROSS JOIN st ORDER BY 1""".stripMargin)),

    // Difference-in-differences (Experiment.diffInDiff): hash-split
    // pseudo-treatment switching on at the stream midpoint — the
    // causal contrast that nets out group baseline AND common time
    // trend. Four integer-moment cells; Welch-style SE; on a null
    // effect the t should be small (and is).
    QueryDef("q236_diff_in_diff",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .where(col("value").isNotNull)
          .withColumn("arm", pmod(Hashing.portableHash(
            concat(col("user_id").cast("string"), lit(":did"))),
            lit(2L)).cast("int"))
          .withColumn("post",
            (expr("unix_micros(cast(ts as timestamp)) div 86400000000")
              >= 19738L).cast("int"))
          .withColumn("cents", round(col("value") * 100).cast("long"))
        Experiment.diffInDiff(ev, "arm", "post", "cents")
      },
      Some(s"""WITH ev AS (
             |  SELECT CASE WHEN ${Hashing.duckPortableHash(
                    "CAST(user_id AS VARCHAR) || ':did'")} % 2 = 1
             |      THEN 1 ELSE 0 END AS arm,
             |    CASE WHEN epoch_us(ts) // 86400000000 >= 19738
             |      THEN 1 ELSE 0 END AS post,
             |    CAST(round(value * 100) AS BIGINT) AS x
             |  FROM events WHERE value IS NOT NULL),
             |cells AS (SELECT arm, post, count(*) AS n, sum(x) AS sx,
             |    sum(x * x) AS sxx
             |  FROM ev GROUP BY 1, 2),
             |wm AS (SELECT arm, post, n,
             |    CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
             |    (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) *
             |        CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) /
             |      (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) AS von
             |  FROM cells),
             |sv AS (SELECT sum(von) AS sevar FROM wm),
             |j AS (SELECT
             |    (SELECT n FROM wm WHERE arm = 0 AND post = 0) AS n00,
             |    (SELECT n FROM wm WHERE arm = 0 AND post = 1) AS n01,
             |    (SELECT n FROM wm WHERE arm = 1 AND post = 0) AS n10,
             |    (SELECT n FROM wm WHERE arm = 1 AND post = 1) AS n11,
             |    (SELECT mean FROM wm WHERE arm = 0 AND post = 0) AS m00,
             |    (SELECT mean FROM wm WHERE arm = 0 AND post = 1) AS m01,
             |    (SELECT mean FROM wm WHERE arm = 1 AND post = 0) AS m10,
             |    (SELECT mean FROM wm WHERE arm = 1 AND post = 1) AS m11,
             |    (SELECT sevar FROM sv) AS sevar)
             |SELECT CAST(n00 AS BIGINT) AS n00,
             |  CAST(n01 AS BIGINT) AS n01,
             |  CAST(n10 AS BIGINT) AS n10,
             |  CAST(n11 AS BIGINT) AS n11,
             |  round(m00, 4) AS mean00, round(m01, 4) AS mean01,
             |  round(m10, 4) AS mean10, round(m11, 4) AS mean11,
             |  round((m11 - m10) - (m01 - m00), 4) + 0.0 AS did,
             |  round(sqrt(sevar), 4) AS se,
             |  round(CASE WHEN sqrt(sevar) > 0
             |    THEN ((m11 - m10) - (m01 - m00)) / sqrt(sevar) END, 4)
             |    + 0.0 AS t
             |FROM j""".stripMargin)),

    // Simpson's-paradox scan (Experiment.simpsonScan): pooled
    // urgent-vs-rest order value difference vs the same contrast
    // inside each market segment — strata whose sign flips flag a
    // mix-confounded pooled readout. Product-sign test on unrounded
    // doubles from exact integer moments.
    QueryDef("q237_simpson_scan",
      (s, dir) => {
        val o = t(s, dir, "orders")
          .join(t(s, dir, "customer")
            .select(col("c_custkey"), col("c_mktsegment")),
            col("o_custkey") === col("c_custkey"))
          .withColumn("arm",
            col("o_orderpriority").isin("1-URGENT", "2-HIGH")
              .cast("int"))
          .withColumn("cents",
            round(col("o_totalprice") * 100).cast("long"))
        Experiment.simpsonScan(o, "c_mktsegment", "arm", "cents")
          .orderBy("c_mktsegment")
      },
      Some("""WITH o AS (
             |  SELECT c_mktsegment,
             |    CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
             |      THEN 1 ELSE 0 END AS arm,
             |    CAST(round(o_totalprice * 100) AS BIGINT) AS x
             |  FROM orders JOIN customer ON o_custkey = c_custkey),
             |bys AS (SELECT c_mktsegment, arm, count(*) AS n,
             |    sum(x) AS sx
             |  FROM o GROUP BY 1, 2),
             |pool AS (SELECT arm, count(*) AS n, sum(x) AS sx
             |  FROM o GROUP BY 1),
             |pd AS (SELECT
             |    (SELECT CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)
             |      FROM pool WHERE arm = 1) -
             |    (SELECT CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)
             |      FROM pool WHERE arm = 0) AS pooled),
             |s0 AS (SELECT c_mktsegment, n AS n0,
             |    CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS m0
             |  FROM bys WHERE arm = 0),
             |s1 AS (SELECT c_mktsegment, n AS n1,
             |    CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS m1
             |  FROM bys WHERE arm = 1)
             |SELECT s0.c_mktsegment, CAST(n0 AS BIGINT) AS n0,
             |  CAST(n1 AS BIGINT) AS n1,
             |  round(m0, 4) AS mean0, round(m1, 4) AS mean1,
             |  round(m1 - m0, 4) + 0.0 AS diff,
             |  round(pooled, 4) + 0.0 AS pooled_diff,
             |  CASE WHEN (m1 - m0) * pooled < 0 THEN 1 ELSE 0 END
             |    AS reversed
             |FROM s0 JOIN s1 USING (c_mktsegment)
             |CROSS JOIN pd
             |ORDER BY 1""".stripMargin)),

    // Token↔label mutual information (ops/FeatureSelect
    // .mutualInformation): which tokens carry the most information
    // about a document's language — the filter-method feature
    // selector feeding the q118 classifier tier. Cell terms snap to
    // integer nano-nats before the per-token sum, and the top-20
    // rank runs on the INTEGER score, so neither summation order nor
    // round-boundary ties can split engines.
    QueryDef("q238_token_label_mi",
      (s, dir) => FeatureSelect.mutualInformation(
          t(s, dir, "documents"), "doc_id", "lang", "text", k = 20)
        .orderBy("token"),
      Some("""WITH pres AS (
             |  SELECT DISTINCT doc_id AS id, lang AS l, unnest(
             |    list_distinct(list_filter(
             |      string_split_regex(text, ' +'), t -> t <> '')))
             |    AS token
             |  FROM documents),
             |ntl AS (SELECT token, l, count(*) AS n_tl
             |  FROM pres GROUP BY 1, 2),
             |nt AS (SELECT token, count(*) AS n_t FROM pres GROUP BY 1),
             |nl AS (SELECT lang AS l, count(*) AS n_l
             |  FROM documents GROUP BY 1),
             |ntot AS (SELECT count(*) AS nn FROM documents),
             |grid AS (SELECT nt.token, nt.n_t, nl.l, nl.n_l,
             |    coalesce(ntl.n_tl, 0) AS n_tl, nn
             |  FROM nt CROSS JOIN nl
             |  LEFT JOIN ntl ON nt.token = ntl.token AND nl.l = ntl.l
             |  CROSS JOIN ntot),
             |cells AS (SELECT token, n_t,
             |    (CASE WHEN n_tl > 0 THEN CAST(round(
             |        CAST(n_tl AS DOUBLE) / nn *
             |        ln(CAST(n_tl AS DOUBLE) * nn /
             |          (CAST(n_t AS DOUBLE) * n_l)) * 1000000000.0)
             |        AS BIGINT) ELSE 0 END
             |     + CASE WHEN n_l - n_tl > 0 THEN CAST(round(
             |        CAST(n_l - n_tl AS DOUBLE) / nn *
             |        ln(CAST(n_l - n_tl AS DOUBLE) * nn /
             |          (CAST(nn - n_t AS DOUBLE) * n_l)) * 1000000000.0)
             |        AS BIGINT) ELSE 0 END) AS mi_nano
             |  FROM grid),
             |sc AS (SELECT token, max(n_t) AS n_docs,
             |    sum(mi_nano) AS mi
             |  FROM cells GROUP BY 1),
             |rk AS (SELECT *, row_number() OVER (ORDER BY mi DESC, token)
             |    AS rk
             |  FROM sc)
             |SELECT token, CAST(n_docs AS BIGINT) AS n_docs,
             |  round(CAST(mi AS DOUBLE) / 1000000000.0, 6) AS mi
             |FROM rk WHERE rk <= 20 ORDER BY token""".stripMargin)),

    // EWMA control chart on daily event volume (Rolling.ewmaChart):
    // α=0.3 over the prior 14 days, 3σ gate — the fast-reacting
    // monitor q181's weekday means can't provide. Weights are Scala
    // literals shared with the oracle (no cross-engine pow), snapped
    // to micro-units before any sum.
    QueryDef("q239_ewma_chart",
      (s, dir) => {
        val ev = t(s, dir, "events").withColumn("day",
          expr("unix_micros(cast(ts as timestamp)) div 86400000000"))
        Rolling.ewmaChart(ev, "event_type", "day",
            alpha = 0.3, window = 14, kSigma = 3, minPrior = 7)
          .orderBy("g", "d")
      },
      Some {
        val ws = Rolling.ewmaWeights(0.3, 14).mkString("[", ", ", "]")
        s"""WITH counted AS (
             |  SELECT event_type AS g, epoch_us(ts) // 86400000000 AS d,
             |    count(*) AS x
             |  FROM events GROUP BY 1, 2),
             |lims AS (SELECT g, min(d) AS lo, max(d) AS hi
             |  FROM counted GROUP BY 1),
             |grid AS (SELECT g, unnest(generate_series(lo, hi)) AS d
             |  FROM lims),
             |daily AS (SELECT grid.g, grid.d, coalesce(x, 0) AS x
             |  FROM grid LEFT JOIN counted
             |    ON grid.g = counted.g AND grid.d = counted.d),
             |contrib AS (SELECT g, d + j AS d, x AS xp,
             |    list_extract($ws, CAST(j AS INT)) AS w
             |  FROM daily,
             |    (SELECT unnest(generate_series(1, 14)) AS j) js),
             |snap AS (SELECT g, d, xp,
             |    CAST(round(w * 1000000.0) AS BIGINT) AS w_u,
             |    CAST(round(w * CAST(xp AS DOUBLE) * 1000000.0)
             |      AS BIGINT) AS wx_u
             |  FROM contrib),
             |prior AS (SELECT g, d, count(*) AS n_prior,
             |    sum(w_u) AS sw, sum(wx_u) AS swx,
             |    sum(xp) AS sx, sum(xp * xp) AS sxx
             |  FROM snap GROUP BY 1, 2)
             |SELECT daily.g, daily.d, CAST(daily.x AS BIGINT) AS x,
             |  CAST(n_prior AS BIGINT) AS n_prior,
             |  round(CAST(swx AS DOUBLE) / CAST(sw AS DOUBLE), 4)
             |    AS ewma,
             |  round(sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) *
             |      CAST(sx AS DOUBLE) / CAST(n_prior AS DOUBLE)) /
             |    (CAST(n_prior AS DOUBLE) - 1.0)), 4) AS sigma,
             |  CASE WHEN sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) *
             |      CAST(sx AS DOUBLE) / CAST(n_prior AS DOUBLE)) /
             |      (CAST(n_prior AS DOUBLE) - 1.0)) > 0
             |  THEN (CASE WHEN abs(CAST(daily.x AS DOUBLE) -
             |      CAST(swx AS DOUBLE) / CAST(sw AS DOUBLE)) >
             |      3.0 * sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) *
             |        CAST(sx AS DOUBLE) / CAST(n_prior AS DOUBLE)) /
             |      (CAST(n_prior AS DOUBLE) - 1.0))
             |    THEN 1 ELSE 0 END)
             |  ELSE (CASE WHEN daily.x * n_prior <> sx
             |    THEN 1 ELSE 0 END) END AS flag
             |FROM daily JOIN prior
             |  ON daily.g = prior.g AND daily.d = prior.d
             |WHERE n_prior >= 7
             |ORDER BY 1, 2""".stripMargin
      }),

    // Classical additive seasonal decomposition (Seasonal.decompose):
    // centered 7-day MA trend, per-weekday seasonal from the
    // micro-snapped detrended series, remainder from the snapped
    // values — trend/cycle/surprise attribution for each day's
    // volume.
    QueryDef("q240_seasonal_decompose",
      (s, dir) => {
        val ev = t(s, dir, "events").withColumn("day",
          expr("unix_micros(cast(ts as timestamp)) div 86400000000"))
        Seasonal.decompose(ev, "event_type", "day")
          .orderBy("g", "d")
      },
      Some("""WITH counted AS (
             |  SELECT event_type AS g, epoch_us(ts) // 86400000000 AS d,
             |    count(*) AS x
             |  FROM events GROUP BY 1, 2),
             |lims AS (SELECT g, min(d) AS lo, max(d) AS hi
             |  FROM counted GROUP BY 1),
             |grid AS (SELECT g, unnest(generate_series(lo, hi)) AS d
             |  FROM lims),
             |daily AS (SELECT grid.g, grid.d, coalesce(x, 0) AS x
             |  FROM grid LEFT JOIN counted
             |    ON grid.g = counted.g AND grid.d = counted.d),
             |tw AS (SELECT g, d, x, sum(x) OVER w AS s7,
             |    count(*) OVER w AS n7
             |  FROM daily WINDOW w AS (PARTITION BY g ORDER BY d
             |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
             |tr AS (SELECT g, d, x,
             |    CAST(s7 AS DOUBLE) / 7.0 AS trend,
             |    CAST(round((CAST(x AS DOUBLE) -
             |      CAST(s7 AS DOUBLE) / 7.0) * 1000000.0) AS BIGINT)
             |      AS detr_u,
             |    CAST((d + 3) % 7 + 1 AS INT) AS dow
             |  FROM tw WHERE n7 = 7),
             |se AS (SELECT g, dow, CAST(round(
             |    CAST(sum(detr_u) AS DOUBLE) / CAST(count(*) AS DOUBLE))
             |    AS BIGINT) AS seas_u
             |  FROM tr GROUP BY 1, 2)
             |SELECT tr.g, tr.d, tr.dow, CAST(tr.x AS BIGINT) AS x,
             |  round(trend, 4) AS trend,
             |  round(CAST(seas_u AS DOUBLE) / 1000000.0, 4) + 0.0
             |    AS seasonal,
             |  round(CAST(detr_u - seas_u AS DOUBLE) / 1000000.0, 4)
             |    + 0.0 AS remainder
             |FROM tr JOIN se ON tr.g = se.g AND tr.dow = se.dow
             |ORDER BY 1, 2""".stripMargin)),

    // Quantile–quantile drift profile (Drift.qqProfile): src0 vs src1
    // document lengths at a 19-point probability grid — the
    // SHAPE-level readout q160's scalar KS compresses away. One
    // percentile sketch per cohort; everything else runs on 19 rows.
    QueryDef("q241_qq_profile", {
      val ps = Seq(0.05, 0.1, 0.15, 0.2, 0.25, 0.3, 0.35, 0.4, 0.45,
        0.5, 0.55, 0.6, 0.65, 0.7, 0.75, 0.8, 0.85, 0.9, 0.95)
      (s: SparkSession, dir: String) => Drift.qqProfile(
          t(s, dir, "documents"), "source", "n_chars",
          cohortA = "src0", cohortB = "src1", ps = ps)
        .orderBy("p")
    },
      Some {
        val ps = Seq(0.05, 0.1, 0.15, 0.2, 0.25, 0.3, 0.35, 0.4, 0.45,
          0.5, 0.55, 0.6, 0.65, 0.7, 0.75, 0.8, 0.85, 0.9, 0.95)
        val lst = ps.mkString("[", ", ", "]")
        s"""WITH a AS (SELECT count(*) AS n_a,
             |    percentile_cont($lst)
             |      WITHIN GROUP (ORDER BY n_chars) AS qs
             |  FROM documents
             |  WHERE source = 'src0' AND n_chars IS NOT NULL),
             |b AS (SELECT count(*) AS n_b,
             |    percentile_cont($lst)
             |      WITHIN GROUP (ORDER BY n_chars) AS qs
             |  FROM documents
             |  WHERE source = 'src1' AND n_chars IS NOT NULL),
             |ix AS (SELECT unnest(generate_series(1, ${ps.size}))
             |    AS i),
             |ea AS (SELECT i, n_a, list_extract(a.qs, CAST(i AS INT))
             |    AS q_a
             |  FROM a CROSS JOIN ix),
             |eb AS (SELECT i, n_b, list_extract(b.qs, CAST(i AS INT))
             |    AS q_b
             |  FROM b CROSS JOIN ix)
             |SELECT list_extract($lst, CAST(i AS INT)) AS p,
             |  CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
             |  round(q_a, 4) AS q_a, round(q_b, 4) AS q_b,
             |  round(q_b - q_a, 4) + 0.0 AS gap
             |FROM ea JOIN eb USING (i) ORDER BY 1""".stripMargin
      }),

    // Exact positional phrase search (Retrieval.phraseSearch):
    // "slow hash batch" as a (doc, position) postings intersection —
    // postings filtered to the phrase's own words BEFORE any
    // shuffle, one equi-join per extra word, never positions×positions.
    QueryDef("q242_phrase_search",
      (s, dir) => Retrieval.phraseSearch(t(s, dir, "documents"),
          "doc_id", "text", phrase = Seq("slow", "hash", "batch"))
        .orderBy("doc_id"),
      Some("""WITH tk AS (
             |  SELECT doc_id, list_filter(
             |    string_split_regex(text, ' +'), t -> t <> '') AS tk
             |  FROM documents),
             |pos AS (SELECT doc_id, i, tk[i] AS tok
             |  FROM (SELECT doc_id, tk,
             |      unnest(generate_series(1, len(tk))) AS i
             |    FROM tk)),
             |w0 AS (SELECT doc_id, i - 1 AS p FROM pos
             |  WHERE tok = 'slow'),
             |w1 AS (SELECT doc_id, i - 2 AS p FROM pos
             |  WHERE tok = 'hash'),
             |w2 AS (SELECT doc_id, i - 3 AS p FROM pos
             |  WHERE tok = 'batch'),
             |st AS (SELECT w0.doc_id, w0.p FROM w0
             |  JOIN w1 ON w0.doc_id = w1.doc_id AND w0.p = w1.p
             |  JOIN w2 ON w0.doc_id = w2.doc_id AND w0.p = w2.p)
             |SELECT doc_id, count(*) AS n_matches,
             |  CAST(min(p) AS INT) AS first_pos
             |FROM st GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Keyword-in-context concordance (Retrieval.kwic): every
    // occurrence of 'spark' with ±3 surrounding tokens, sliced from
    // the SAME token array the posexplode matched on — no second
    // scan, no join back to raw text.
    QueryDef("q243_kwic",
      (s, dir) => Retrieval.kwic(t(s, dir, "documents"),
          "doc_id", "text", term = "spark", ctx = 3)
        .orderBy("doc_id", "pos"),
      Some("""WITH tk AS (
             |  SELECT doc_id, list_filter(
             |    string_split_regex(text, ' +'), t -> t <> '') AS tk
             |  FROM documents),
             |m AS (SELECT doc_id, tk, i
             |  FROM (SELECT doc_id, tk,
             |      unnest(generate_series(1, len(tk))) AS i
             |    FROM tk)
             |  WHERE tk[i] = 'spark')
             |SELECT doc_id, CAST(i - 1 AS INT) AS pos,
             |  coalesce(array_to_string(list_slice(tk,
             |    greatest(i - 3, 1), i - 1), ' '), '') AS left_ctx,
             |  coalesce(array_to_string(list_slice(tk,
             |    i + 1, least(i + 3, len(tk))), ' '), '') AS right_ctx
             |FROM m ORDER BY 1, 2""".stripMargin)),

    // Huber M-estimator of document length per language (RobustStats
    // .huberLocation): 2 fixed IRLS rounds from the median, MAD
    // scale, k = 1.345 — the robust center that, unlike q176's trim,
    // downweights outliers smoothly instead of discarding a fixed
    // fraction. Micro-snapped weights make each round a ratio of
    // exact integer sums.
    QueryDef("q244_huber_location",
      (s, dir) => RobustStats.huberLocation(
          t(s, dir, "documents").select(col("lang"), col("n_chars")),
          "lang", "n_chars", k = 1.345, iters = 2)
        .orderBy("g"),
      Some("""WITH x AS (
             |  SELECT lang AS g, n_chars AS x FROM documents
             |  WHERE n_chars IS NOT NULL),
             |med AS (SELECT g, count(*) AS n, sum(x) AS sx,
             |    percentile_cont(0.5) WITHIN GROUP (ORDER BY x) AS m0
             |  FROM x GROUP BY 1),
             |mad AS (SELECT x.g, percentile_cont(0.5) WITHIN GROUP (
             |      ORDER BY abs(CAST(x.x AS DOUBLE) - m0)) * 1.4826 AS s
             |  FROM x JOIN med ON x.g = med.g GROUP BY 1),
             |it0 AS (SELECT med.g, n, sx, s, m0, m0 AS m
             |  FROM med JOIN mad ON med.g = mad.g),
             |w1 AS (SELECT x.g, x.x, CAST(round((CASE
             |      WHEN abs(CAST(x.x AS DOUBLE) - m) > 1.345 * s
             |      THEN 1.345 * s / abs(CAST(x.x AS DOUBLE) - m)
             |      ELSE 1.0 END) * 1000000.0) AS BIGINT) AS wu
             |  FROM x JOIN it0 ON x.g = it0.g),
             |m1 AS (SELECT g, CAST(sum(wu * x) AS DOUBLE) /
             |    CAST(sum(wu) AS DOUBLE) AS m
             |  FROM w1 GROUP BY 1),
             |st1 AS (SELECT it0.g, n, sx, s, m0, m1.m
             |  FROM it0 JOIN m1 ON it0.g = m1.g),
             |w2 AS (SELECT x.g, x.x, CAST(round((CASE
             |      WHEN abs(CAST(x.x AS DOUBLE) - m) > 1.345 * s
             |      THEN 1.345 * s / abs(CAST(x.x AS DOUBLE) - m)
             |      ELSE 1.0 END) * 1000000.0) AS BIGINT) AS wu
             |  FROM x JOIN st1 ON x.g = st1.g),
             |m2 AS (SELECT g, CAST(sum(wu * x) AS DOUBLE) /
             |    CAST(sum(wu) AS DOUBLE) AS m
             |  FROM w2 GROUP BY 1)
             |SELECT st1.g, CAST(n AS BIGINT) AS n,
             |  round(m0, 4) AS median, round(s, 4) AS mad_scale,
             |  round(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE), 4) AS mean,
             |  round(m2.m, 4) AS huber
             |FROM st1 JOIN m2 ON st1.g = m2.g ORDER BY 1""".stripMargin)),

    // Character-entropy compressibility per source (ops/
    // Compressibility.charEntropy): zeroth-order Shannon bits/char +
    // the conservative 8-bit compression-ratio bound — the storage
    // planner's "which slices are worth zstd-ing hard" readout and a
    // junk detector (binary ≈ 8 bits, text ≈ 4). Nano-snapped −p·lg p
    // terms, alphabet-sized frames after the first aggregate.
    QueryDef("q245_char_entropy",
      (s, dir) => Compressibility.charEntropy(
          t(s, dir, "documents"), "source", "text")
        .orderBy("g"),
      Some("""WITH ch AS (
             |  SELECT source AS g, substring(text, CAST(i AS INT), 1)
             |    AS ch
             |  FROM (SELECT source, text,
             |      unnest(generate_series(1, length(text))) AS i
             |    FROM documents WHERE text IS NOT NULL)),
             |counts AS (SELECT g, ch, count(*) AS c
             |  FROM ch GROUP BY 1, 2),
             |wn AS (SELECT g, ch, c, sum(c) OVER (PARTITION BY g) AS n
             |  FROM counts),
             |terms AS (SELECT g, n, CAST(round(
             |    -(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) *
             |    log2(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) *
             |    1000000000.0) AS BIGINT) AS term
             |  FROM wn),
             |ent AS (SELECT g, max(n) AS n_chars,
             |    count(*) AS n_distinct_chars, sum(term) AS hn
             |  FROM terms GROUP BY 1),
             |dc AS (SELECT source AS g, count(*) AS n_docs
             |  FROM documents WHERE text IS NOT NULL GROUP BY 1)
             |SELECT dc.g, CAST(n_docs AS BIGINT) AS n_docs,
             |  CAST(n_chars AS BIGINT) AS n_chars,
             |  CAST(n_distinct_chars AS BIGINT) AS n_distinct_chars,
             |  round(CAST(hn AS DOUBLE) / 1000000000.0, 4)
             |    AS entropy_bits,
             |  round(CASE WHEN hn > 0 THEN
             |    8.0 / (CAST(hn AS DOUBLE) / 1000000000.0) END, 4)
             |    AS est_ratio
             |FROM dc JOIN ent ON dc.g = ent.g ORDER BY 1""".stripMargin)),

    // Cohort LTV curve (Retention.ltvCurve): users bucketed by
    // first-seen week, purchase cents accumulated by weeks-since —
    // the growth triangle that prices a week-N user of each cohort.
    // Cumulative window runs on the (cohorts × ages) triangle only.
    QueryDef("q246_ltv_curve",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .withColumn("day",
            expr("unix_micros(cast(ts as timestamp)) div 86400000000"))
          .withColumn("v",
            when(col("event_type") === "purchase",
              round(col("value") * 100).cast("long")).otherwise(0L))
        Retention.ltvCurve(ev, "user_id", "day", "v")
          .orderBy("cohort_week", "age_week")
      },
      Some("""WITH ein AS (
             |  SELECT user_id AS e,
             |    epoch_us(ts) // 86400000000 // 7 AS wk,
             |    CASE WHEN event_type = 'purchase'
             |      THEN CAST(round(value * 100) AS BIGINT)
             |      ELSE 0 END AS v
             |  FROM events),
             |coh AS (SELECT e, min(wk) AS cw FROM ein GROUP BY 1),
             |sz AS (SELECT cw, count(*) AS n_cohort FROM coh GROUP BY 1),
             |tri AS (SELECT coh.cw, wk - cw AS age, sum(v) AS rev
             |  FROM ein JOIN coh ON ein.e = coh.e GROUP BY 1, 2),
             |cum AS (SELECT cw, age, rev,
             |    sum(rev) OVER (PARTITION BY cw ORDER BY age) AS cr
             |  FROM tri)
             |SELECT cw AS cohort_week, age AS age_week,
             |  CAST(n_cohort AS BIGINT) AS n_cohort,
             |  CAST(rev AS BIGINT) AS rev_cents,
             |  CAST(cr AS BIGINT) AS cum_rev_cents,
             |  round(CAST(cr AS DOUBLE) / CAST(n_cohort AS DOUBLE), 4)
             |    AS ltv_cents
             |FROM cum JOIN sz USING (cw)
             |ORDER BY 1, 2""".stripMargin)),

    // Time-weighted average value per (event type, day) (ops/
    // TimeWeighted.twap): each observation weighted by how long it
    // was last-seen — the right average for irregularly-sampled
    // state, where the plain mean over-weights bursts. Exact
    // integer ms·cents accumulation; one lead() window per
    // (group, day) slice.
    QueryDef("q247_twap",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .where(col("value").isNotNull)
          .withColumn("day",
            expr("unix_micros(cast(ts as timestamp)) div 86400000000"))
          .withColumn("et", expr("unix_micros(cast(ts as timestamp))"))
          .withColumn("cents", round(col("value") * 100).cast("long"))
        TimeWeighted.twap(ev, "event_type", "day", "et", "cents",
            sliceWidthUs = 86400000000L)
          .orderBy("g", "sl")
      },
      Some("""WITH e AS (
             |  SELECT event_type AS g, epoch_us(ts) // 86400000000 AS sl,
             |    epoch_us(ts) AS tsu,
             |    CAST(round(value * 100) AS BIGINT) AS v
             |  FROM events WHERE value IS NOT NULL),
             |g2 AS (SELECT g, sl, tsu, v,
             |    lead(tsu) OVER (PARTITION BY g, sl ORDER BY tsu, v)
             |      AS nxt
             |  FROM e),
             |d2 AS (SELECT g, sl, v,
             |    (coalesce(nxt, (sl + 1) * 86400000000) - tsu) // 1000
             |      AS dt
             |  FROM g2)
             |SELECT g, sl, count(*) AS n_obs,
             |  round(CAST(sum(v * dt) AS DOUBLE) /
             |    CAST(sum(dt) AS DOUBLE), 4) AS twap,
             |  round(CAST(sum(v) AS DOUBLE) /
             |    CAST(count(*) AS DOUBLE), 4) AS mean
             |FROM d2 WHERE dt > 0
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Markov steady-state event mix (ops/Markov.stationary): the
    // empirical transition matrix driven 3 fixed power-iteration
    // rounds from uniform — capacity planning's "if today's behavior
    // repeats" load model. Mass carried in integer nano-units,
    // snapped per matrix CELL, so the iteration replays exactly;
    // every round runs on the state²-sized frame.
    QueryDef("q248_markov_stationary",
      (s, dir) => Markov.stationary(t(s, dir, "events"),
          "user_id", "event_id", "event_type", rounds = 3)
        .orderBy("state"),
      Some("""WITH tr AS (
             |  SELECT i, j, count(*) AS n_ij FROM (
             |    SELECT event_type AS j,
             |      lag(event_type) OVER (PARTITION BY user_id
             |        ORDER BY event_id) AS i
             |    FROM events)
             |  WHERE i IS NOT NULL GROUP BY 1, 2),
             |ot AS (SELECT i, sum(n_ij) AS n_i FROM tr GROUP BY 1),
             |st AS (SELECT DISTINCT state FROM (
             |    SELECT i AS state FROM tr UNION SELECT j FROM tr)),
             |ns AS (SELECT count(*) AS ns FROM st),
             |p0 AS (SELECT state,
             |    CAST(round(1000000000.0 / ns) AS BIGINT) AS pn
             |  FROM st CROSS JOIN ns),
             |p1 AS (SELECT tr.j AS state, sum(CAST(round(
             |      CAST(pn AS DOUBLE) * CAST(n_ij AS DOUBLE) /
             |      CAST(n_i AS DOUBLE)) AS BIGINT)) AS pn
             |  FROM tr JOIN ot ON tr.i = ot.i
             |  JOIN p0 ON p0.state = tr.i GROUP BY 1),
             |p2 AS (SELECT tr.j AS state, sum(CAST(round(
             |      CAST(pn AS DOUBLE) * CAST(n_ij AS DOUBLE) /
             |      CAST(n_i AS DOUBLE)) AS BIGINT)) AS pn
             |  FROM tr JOIN ot ON tr.i = ot.i
             |  JOIN p1 ON p1.state = tr.i GROUP BY 1),
             |p3 AS (SELECT tr.j AS state, sum(CAST(round(
             |      CAST(pn AS DOUBLE) * CAST(n_ij AS DOUBLE) /
             |      CAST(n_i AS DOUBLE)) AS BIGINT)) AS pn
             |  FROM tr JOIN ot ON tr.i = ot.i
             |  JOIN p2 ON p2.state = tr.i GROUP BY 1),
             |tt AS (SELECT sum(pn) AS tot FROM p3)
             |SELECT st.state, CAST(coalesce(n_i, 0) AS BIGINT) AS n_out,
             |  round(1.0 / ns, 6) AS pi0,
             |  round(CAST(coalesce(p3.pn, 0) AS DOUBLE) /
             |    CAST(tot AS DOUBLE), 6) AS pi
             |FROM st
             |LEFT JOIN ot ON st.state = ot.i
             |LEFT JOIN p3 ON st.state = p3.state
             |CROSS JOIN ns CROSS JOIN tt
             |ORDER BY 1""".stripMargin)),

    // OLS residual diagnostics (Stats.olsDiagnostics): R² plus
    // residual skewness and excess kurtosis of the daily-volume
    // trend fit — "should I trust q133's slope". Residuals snap to
    // deci-units (scale cancels out of both shape statistics);
    // x^1.5 computed as x·√x so no cross-engine pow().
    QueryDef("q249_ols_diagnostics",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .withColumn("day",
            expr("unix_micros(cast(ts as timestamp)) div 86400000000"))
          .groupBy(col("event_type").as("g"), col("day").as("x"))
          .agg(count(lit(1)).as("y"))
        Stats.olsDiagnostics(daily, "g", "x", "y", snapScale = 10)
          .orderBy("g")
      },
      Some("""WITH daily AS (
             |  SELECT event_type AS g, epoch_us(ts) // 86400000000 AS x,
             |    count(*) AS y
             |  FROM events GROUP BY 1, 2),
             |agg AS (SELECT g, count(*) AS n, sum(x) AS sx,
             |    sum(y) AS sy, sum(x * x) AS sxx, sum(x * y) AS sxy,
             |    sum(y * y) AS syy
             |  FROM daily GROUP BY 1),
             |par AS (SELECT g, n,
             |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
             |     CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
             |    (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
             |     CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS b,
             |    ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
             |      CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
             |     (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
             |      CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
             |      CAST(sx AS DOUBLE) * (-1.0) +
             |      CAST(sy AS DOUBLE)) / CAST(n AS DOUBLE) AS a,
             |    ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
             |      CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) *
             |     (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
             |      CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))) /
             |    ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
             |      CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
             |     (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) -
             |      CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS r2
             |  FROM agg),
             |res AS (SELECT daily.g,
             |    CAST(round((CAST(y AS DOUBLE) - a - b *
             |      CAST(x AS DOUBLE)) * 10.0) AS BIGINT) AS rd
             |  FROM daily JOIN par ON daily.g = par.g),
             |mo AS (SELECT g, sum(rd * rd) AS m2,
             |    sum(rd * rd * rd) AS m3,
             |    sum(rd * rd * rd * rd) AS m4
             |  FROM res GROUP BY 1)
             |SELECT par.g, CAST(n AS BIGINT) AS n,
             |  round(b, 6) + 0.0 AS slope, round(r2, 4) AS r2,
             |  round(CASE WHEN m2 > 0 THEN
             |    (CAST(m3 AS DOUBLE) / CAST(n AS DOUBLE)) /
             |    ((CAST(m2 AS DOUBLE) / CAST(n AS DOUBLE)) *
             |     sqrt(CAST(m2 AS DOUBLE) / CAST(n AS DOUBLE))) END, 4)
             |    + 0.0 AS resid_skew,
             |  round(CASE WHEN m2 > 0 THEN
             |    CAST(m4 AS DOUBLE) / CAST(n AS DOUBLE) /
             |    ((CAST(m2 AS DOUBLE) / CAST(n AS DOUBLE)) *
             |     (CAST(m2 AS DOUBLE) / CAST(n AS DOUBLE))) - 3.0 END, 4)
             |    + 0.0 AS resid_kurtosis
             |FROM par JOIN mo ON par.g = mo.g ORDER BY 1""".stripMargin)),

    // Conversion-latency percentiles per touch channel (Attribution
    // .conversionLatency): time from the LAST click/view to the
    // purchase — the evidence for q230's 3-day lookback (a lookback
    // below p99 leaks credit) and the attribution twin of q235's
    // watermark profile.
    QueryDef("q250_conversion_latency",
      (s, dir) => Attribution.conversionLatency(t(s, dir, "events"),
          "event_id", "user_id", "ts", "event_type",
          convType = "purchase", touchTypes = Seq("click", "view"),
          lookbackDays = 3)
        .orderBy("channel"),
      Some("""WITH conv AS (
             |  SELECT event_id AS cid, user_id AS e, epoch_us(ts) AS cts
             |  FROM events WHERE event_type = 'purchase'),
             |touch AS (SELECT user_id AS e, epoch_us(ts) AS tts,
             |    event_type AS channel
             |  FROM events WHERE event_type IN ('click', 'view')),
             |lat AS (SELECT cid, channel, min(cts - tts) AS lat_us
             |  FROM conv JOIN touch ON conv.e = touch.e
             |  WHERE tts < cts AND tts >= cts - 259200000000
             |  GROUP BY 1, 2)
             |SELECT channel, count(*) AS n_conversions,
             |  round(percentile_cont(0.5) WITHIN GROUP (ORDER BY lat_us)
             |    / 1000000.0, 3) AS p50_s,
             |  round(percentile_cont(0.9) WITHIN GROUP (ORDER BY lat_us)
             |    / 1000000.0, 3) AS p90_s,
             |  round(percentile_cont(0.99) WITHIN GROUP (ORDER BY lat_us)
             |    / 1000000.0, 3) AS p99_s
             |FROM lat GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Daily peak concurrency (ops/Concurrency.dailyPeak): 30-min-gap
    // sessions swept as ±1 deltas, running sum via the SAME two-pass
    // distributed prefix scan as q235 (no single-partition global
    // window), ends-before-starts tie rule pinned in both engines.
    QueryDef("q251_peak_concurrency",
      (s, dir) => {
        val sess = Sessionize.gapSessions(t(s, dir, "events"),
            Seq("user_id"), "ts", "event_id", gapUs = 1800000000L)
          .withColumn("tu", expr("unix_micros(cast(ts as timestamp))"))
          .groupBy("user_id", "session_id")
          .agg(min("tu").as("s_us"), (max("tu") + lit(1L)).as("e_us"))
        Concurrency.dailyPeak(sess, "s_us", "e_us",
            bucketUs = 86400000000L)
          .orderBy("day")
      },
      Some("""WITH sv AS (
             |  SELECT user_id, event_id, epoch_us(ts) AS tu
             |  FROM events),
             |lagged AS (SELECT user_id, tu,
             |    CASE WHEN lag(tu) OVER w IS NULL
             |      OR tu - lag(tu) OVER w > 1800000000
             |      THEN 1 ELSE 0 END AS nw,
             |    event_id
             |  FROM sv WINDOW w AS (PARTITION BY user_id
             |    ORDER BY tu, event_id)),
             |sess AS (SELECT user_id, tu, sum(nw) OVER (
             |    PARTITION BY user_id ORDER BY tu, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |    AS sid
             |  FROM lagged),
             |iv AS (SELECT user_id, sid, min(tu) AS s, max(tu) + 1 AS e
             |  FROM sess GROUP BY 1, 2),
             |del AS (SELECT s AS t, 1 AS d FROM iv
             |  UNION ALL SELECT e, -1 FROM iv),
             |w2 AS (SELECT t, d, sum(d) OVER (ORDER BY t, d
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |    AS conc
             |  FROM del)
             |SELECT t // 86400000000 AS day,
             |  CAST(sum(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_starts,
             |  CAST(sum(CASE WHEN d = -1 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_ends,
             |  CAST(max(conc) AS BIGINT) AS peak_concurrent
             |FROM w2 GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Grid-density clustering, DBSCAN-lite (SpatialJoin
    // .densityClusters): q234's hash-derived customer coordinates,
    // 10° cells, ≥4 points dense, 8-neighborhood merge via connected
    // components — the point set collapses to a cell frame after ONE
    // aggregate; everything else is grid-bounded.
    QueryDef("q252_density_clusters",
      (s, dir) => {
        val cust = t(s, dir, "customer").select(
          pmod(Hashing.portableHash(
            concat(col("c_custkey").cast("string"), lit(":lat"))),
            lit(120000001L)).as("lat"),
          pmod(Hashing.portableHash(
            concat(col("c_custkey").cast("string"), lit(":lon"))),
            lit(360000001L)).as("lon"))
        SpatialJoin.densityClusters(cust, "lat", "lon",
            cellE6 = 10000000L, minPts = 4L)
          .orderBy("cluster")
      },
      Some {
        def h(key: String, tag: String) = Hashing.duckPortableHash(
          s"CAST($key AS VARCHAR) || ':$tag'")
        s"""WITH RECURSIVE c AS (
             |  SELECT ${h("c_custkey", "lat")} % 120000001 AS plat,
             |    ${h("c_custkey", "lon")} % 360000001 AS plon
             |  FROM customer),
             |cells AS (SELECT plat // 10000000 AS cla,
             |    plon // 10000000 AS clo, count(*) AS n_pts
             |  FROM c GROUP BY 1, 2 HAVING count(*) >= 4),
             |ck AS (SELECT cla, clo, n_pts,
             |    cla * 1000000 + clo AS cell
             |  FROM cells),
             |nb AS (SELECT a.cell AS src, b.cell AS dst
             |  FROM ck a JOIN ck b
             |    ON abs(a.cla - b.cla) <= 1 AND abs(a.clo - b.clo) <= 1
             |    AND a.cell < b.cell),
             |edges AS (SELECT src, dst FROM nb
             |  UNION ALL SELECT dst, src FROM nb),
             |reach(id, lbl) AS (
             |  SELECT cell, cell FROM ck
             |  UNION
             |  SELECT e.dst, r.lbl FROM reach r
             |  JOIN edges e ON e.src = r.id),
             |comp AS (SELECT id, min(lbl) AS component
             |  FROM reach GROUP BY 1)
             |SELECT component AS cluster, count(*) AS n_cells,
             |  CAST(sum(n_pts) AS BIGINT) AS n_points,
             |  min(cla) AS cla_min, max(cla) AS cla_max,
             |  min(clo) AS clo_min, max(clo) AS clo_max
             |FROM ck JOIN comp ON ck.cell = comp.id
             |GROUP BY 1 ORDER BY 1""".stripMargin
      }),

    // k-core of the near-dup graph (GraphMetrics.kCore): 4 fixed
    // peeling rounds at k=2 — separates genuinely clustered
    // duplication (everyone keeps ≥2 neighbors) from pendant one-off
    // matches that q61's components still count. Round-for-round
    // oracle replay.
    QueryDef("q253_kcore",
      (s, dir) => {
        val docs = t(s, dir, "documents").filter(col("doc_id") < 1000)
        val pairs = Dedup.minhashNearDups(docs, "doc_id", "text",
          k = 64, bands = 8, threshold = 0.8)
        GraphMetrics.kCore(pairs, "id_a", "id_b", k = 2, rounds = 4)
          .orderBy("node")
      },
      Some("WITH " + minhashVerifiedCtes + ",\n" +
        pairsEdgesCtes + ",\n" +
        (1 to 4).map { i =>
          val prev = if (i == 1) "edges" else s"e${i - 1}"
          s"""d$i AS (SELECT src AS n, count(*) AS dg
             |  FROM $prev GROUP BY 1),
             |k$i AS (SELECT n FROM d$i WHERE dg >= 2),
             |e$i AS (SELECT e.src, e.dst FROM $prev e
             |  JOIN k$i a ON e.src = a.n
             |  JOIN k$i b ON e.dst = b.n)""".stripMargin
        }.mkString(",\n") + "\n" +
        """SELECT src AS node, count(*) AS core_degree
          |FROM e4 GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Heaps'-law vocabulary growth per source (TextAnalysis
    // .heapsProfile): N/V/hapax per slice plus ONE fitted exponent β
    // from the exact-integer ln-ln regression across the 20 slices —
    // the OOV-budget readout (V ≈ k·N^β).
    QueryDef("q254_heaps_law",
      (s, dir) => TextAnalysis.heapsProfile(
          t(s, dir, "documents"), "source", "text")
        .orderBy("slice"),
      Some("""WITH toks AS (
             |  SELECT source AS slice, unnest(list_filter(
             |    string_split_regex(text, ' +'), t -> t <> '')) AS tok
             |  FROM documents),
             |counts AS (SELECT slice, tok, count(*) AS c
             |  FROM toks GROUP BY 1, 2),
             |per AS (SELECT slice, sum(c) AS n_tokens,
             |    count(*) AS vocab,
             |    sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS n_hapax
             |  FROM counts GROUP BY 1),
             |pts AS (SELECT slice,
             |    CAST(round(ln(CAST(n_tokens AS DOUBLE)) * 1000000.0)
             |      AS BIGINT) AS x,
             |    CAST(round(ln(CAST(vocab AS DOUBLE)) * 1000000.0)
             |      AS BIGINT) AS y
             |  FROM per),
             |fit AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
             |    sum(x * x) AS sxx, sum(x * y) AS sxy
             |  FROM pts),
             |fr AS (SELECT
             |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
             |     CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
             |    (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
             |     CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS beta,
             |    (CAST(sy AS DOUBLE) -
             |     (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
             |      CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
             |     (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
             |      CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
             |     CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) / 1000000.0
             |      AS lnk
             |  FROM fit)
             |SELECT slice, CAST(n_tokens AS BIGINT) AS n_tokens,
             |  CAST(vocab AS BIGINT) AS vocab,
             |  CAST(n_hapax AS BIGINT) AS n_hapax,
             |  round(CAST(n_hapax AS DOUBLE) / CAST(vocab AS DOUBLE), 4)
             |    AS hapax_frac,
             |  round(beta, 4) AS heaps_beta,
             |  round(lnk, 4) AS heaps_lnk
             |FROM per CROSS JOIN fr ORDER BY 1""".stripMargin)),

    // Inter-arrival burstiness per event type (Seasonal
    // .interarrivalProfile): gap percentiles + CV² — the Poisson
    // litmus deciding whether q181/q239's rate math applies.
    // Integer-ms gap moments; one lag window per stream key.
    QueryDef("q255_interarrival",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .withColumn("tu", expr("unix_micros(cast(ts as timestamp))"))
        Seasonal.interarrivalProfile(ev, "event_type", "tu", "event_id")
          .orderBy("g")
      },
      Some("""WITH gv AS (
             |  SELECT event_type AS g, epoch_us(ts) AS tu, event_id
             |  FROM events),
             |l AS (SELECT g, tu, lag(tu) OVER (
             |    PARTITION BY g ORDER BY tu, event_id) AS prev
             |  FROM gv),
             |gg AS (SELECT g, (tu - prev) // 1000 AS gap
             |  FROM l WHERE prev IS NOT NULL)
             |SELECT g, count(*) AS n_gaps,
             |  round(CAST(sum(gap) AS DOUBLE) /
             |    CAST(count(*) AS DOUBLE) / 1000.0, 3) AS mean_gap_s,
             |  round(percentile_cont(0.5) WITHIN GROUP (ORDER BY gap)
             |    / 1000.0, 3) AS p50_gap_s,
             |  round(percentile_cont(0.9) WITHIN GROUP (ORDER BY gap)
             |    / 1000.0, 3) AS p90_gap_s,
             |  round((CAST(sum(gap * gap) AS DOUBLE) *
             |      CAST(count(*) AS DOUBLE) -
             |      CAST(sum(gap) AS DOUBLE) * CAST(sum(gap) AS DOUBLE)) /
             |    (CAST(sum(gap) AS DOUBLE) * CAST(sum(gap) AS DOUBLE)),
             |    4) AS cv2
             |FROM gg GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Contrastive triplet construction (ops/Contrastive.triplets):
    // positives from the verified near-dup graph, negatives drawn by
    // hash from ONE distributed corpus permutation (q57's sortBy+
    // zipWithIndex discipline, no global window), with draws that
    // collide with the anchor's duplicate neighborhood FLAGGED —
    // contrastive losses are poisoned by secret positives.
    QueryDef("q256_contrastive_triplets",
      (s, dir) => {
        val docs = t(s, dir, "documents").filter(col("doc_id") < 1000)
        val pairs = Dedup.minhashNearDups(docs, "doc_id", "text",
          k = 64, bands = 8, threshold = 0.8)
        Contrastive.triplets(docs.select("doc_id"), "doc_id",
            pairs, "id_a", "id_b", negsPer = 2)
          .orderBy("anchor", "neg_ix")
      },
      Some("WITH " + minhashVerifiedCtes + ",\n" +
        s"""pr AS (SELECT id_a, id_b FROM verified WHERE jaccard >= 0.8),
          |sym AS (SELECT id_a AS u, id_b AS v FROM pr
          |  UNION SELECT id_b, id_a FROM pr),
          |anch AS (SELECT u AS anchor, min(v) AS pos
          |  FROM sym GROUP BY 1),
          |ranked AS (SELECT doc_id AS neg,
          |    row_number() OVER (ORDER BY
          |      ${Hashing.duckPortableHash("CAST(doc_id AS VARCHAR)")},
          |      CAST(doc_id AS VARCHAR)) - 1 AS rank
          |  FROM toks),
          |nt AS (SELECT count(*) AS n FROM ranked),
          |drawn AS (SELECT anchor, pos, ix AS neg_ix,
          |    ${Hashing.duckSeededHash("ix", "CAST(anchor AS VARCHAR)")}
          |      % n AS rank
          |  FROM anch CROSS JOIN nt,
          |    (SELECT unnest(generate_series(0, 1)) AS ix) xs),
          |dj AS (SELECT anchor, pos, neg_ix, neg
          |  FROM drawn JOIN ranked USING (rank))
          |SELECT dj.anchor, dj.pos, CAST(neg_ix AS INT) AS neg_ix, neg,
          |  CASE WHEN neg = anchor OR neg = pos OR sym.v IS NOT NULL
          |    THEN 0 ELSE 1 END AS clean
          |FROM dj LEFT JOIN sym
          |  ON sym.u = dj.anchor AND sym.v = dj.neg
          |ORDER BY 1, 3""".stripMargin)),

    // Hard-negative mining by label (Similarity.bruteForceTopK +
    // label audit): for each probe, its top-10 cosine neighbors
    // marked same/different label — the different-label close
    // neighbors ARE the hard negatives a contrastive trainer wants,
    // and a high same-label fraction is the embedding sanity check.
    QueryDef("q257_hard_negatives",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.bruteForceTopK(emb,
            emb.filter(col("vec_id") < 5), "vec_id", "embedding",
            k = 10)
          .join(emb.select(col("vec_id").as("query_id"),
            col("label").as("q_label")), "query_id")
          .join(emb.select(col("vec_id").as("neighbor_id"),
            col("label").as("n_label")), "neighbor_id")
          .select(col("query_id"), col("rank"), col("neighbor_id"),
            col("cos"),
            (col("q_label") === col("n_label")).cast("int")
              .as("same_label"))
          .orderBy("query_id", "rank")
      },
      Some(s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qvec,
             |    label AS q_label
             |  FROM embeddings WHERE vec_id < 5),
             |c AS (SELECT vec_id AS neighbor_id, embedding AS cvec,
             |    label AS n_label
             |  FROM embeddings),
             |scored AS (SELECT query_id, neighbor_id, q_label, n_label,
             |    ${duckCos("qvec", "cvec")} AS cos
             |  FROM c CROSS JOIN q WHERE neighbor_id <> query_id),
             |rk AS (SELECT *, row_number() OVER (PARTITION BY query_id
             |    ORDER BY cos DESC, neighbor_id) AS rank
             |  FROM scored)
             |SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id,
             |  round(cos, 4) AS cos,
             |  CASE WHEN q_label = n_label THEN 1 ELSE 0 END
             |    AS same_label
             |FROM rk WHERE rank <= 10 ORDER BY 1, 2""".stripMargin)),

    // Embedding outliers per label (centroid-cosine z-score): the
    // mislabel/junk detector — each label's centroid (the q65
    // per-dim avg → round-6 → float discipline), every member's
    // cosine to its OWN centroid snapped to integer micro-units for
    // exact moments, bottom-5 per label by the integer rank.
    QueryDef("q258_embedding_outliers",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val cents = emb
          .select(col("label"), posexplode(col("embedding"))
            .as(Seq("pos", "x")))
          .groupBy("label", "pos")
          .agg(avg(col("x").cast("double")).as("m"))
          .groupBy("label")
          .agg(array_sort(collect_list(struct(col("pos"), col("m"))))
            .as("pm"))
          .select(col("label"),
            transform(col("pm"), p => round(p("m"), 6).cast("float"))
              .as("cvec"))
        val scored = emb.join(broadcast(cents), "label")
          .withColumn("cos_u",
            round(Similarity.cosine(col("embedding"), col("cvec")) *
              lit(1e6)).cast("long"))
        val mom = scored.groupBy("label").agg(
          count(lit(1)).as("n"), sum("cos_u").as("_s"),
          sum(col("cos_u") * col("cos_u")).as("_ss"))
        def d(c: String) = col(c).cast("double")
        val wL = Window.partitionBy("label")
          .orderBy(col("cos_u").asc, col("vec_id").asc)
        scored
          .withColumn("_rk", row_number().over(wL))
          .where(col("_rk") <= 5)
          .join(mom, Seq("label"))
          .select(col("label"), col("_rk").as("out_rank"), col("vec_id"),
            round(col("cos_u").cast("double") / lit(1e6), 4).as("cos"),
            round((col("cos_u").cast("double") - d("_s") / d("n")) /
              sqrt((d("_ss") - d("_s") * d("_s") / d("n")) /
                (d("n") - lit(1.0))), 2).as("z"))
          .orderBy("label", "out_rank")
      },
      Some {
        val cosFrag = duckCos("embedding", "cvec")
        s"""WITH ex AS (SELECT label, embedding,
             |    unnest(generate_series(1, len(embedding))) AS i
             |  FROM embeddings),
             |ce AS (SELECT label, i,
             |    avg(CAST(embedding[i] AS DOUBLE)) AS m
             |  FROM ex GROUP BY 1, 2),
             |cv AS (SELECT label, list(CAST(round(m, 6) AS FLOAT)
             |    ORDER BY i) AS cvec
             |  FROM ce GROUP BY 1),
             |sc AS (SELECT e.label, e.vec_id,
             |    CAST(round($cosFrag * 1000000.0) AS BIGINT) AS cos_u
             |  FROM embeddings e JOIN cv ON e.label = cv.label),
             |mom AS (SELECT label, count(*) AS n, sum(cos_u) AS s,
             |    sum(cos_u * cos_u) AS ss
             |  FROM sc GROUP BY 1),
             |rk AS (SELECT *, row_number() OVER (PARTITION BY label
             |    ORDER BY cos_u, vec_id) AS out_rank
             |  FROM sc)
             |SELECT rk.label, CAST(out_rank AS INT) AS out_rank, vec_id,
             |  round(CAST(cos_u AS DOUBLE) / 1000000.0, 4) AS cos,
             |  round((CAST(cos_u AS DOUBLE) -
             |      CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) /
             |    sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) *
             |        CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) /
             |      (CAST(n AS DOUBLE) - 1.0)), 2) AS z
             |FROM rk JOIN mom ON rk.label = mom.label
             |WHERE out_rank <= 5 ORDER BY 1, 2""".stripMargin
      }),

    // Dedup distribution-shift audit (Drift.jsTokenShift): Jensen–
    // Shannon divergence of the token mix BEFORE vs AFTER exact
    // dedup — "did cleaning skew the content" in one bounded number.
    // Nano-snapped terms over the union vocabulary (q238's
    // discipline).
    QueryDef("q259_dedup_shift",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val kept = docs.join(
          Dedup.exact(docs, "text", "doc_id")
            .select(col("keep_id").as("doc_id")), Seq("doc_id"),
          "left_semi")
        Drift.jsTokenShift(docs, kept, "text")
      },
      Some("""WITH tka AS (SELECT unnest(list_filter(
             |    string_split_regex(text, ' +'), t -> t <> '')) AS tok
             |  FROM documents),
             |ca AS (SELECT tok, count(*) AS c_a FROM tka GROUP BY 1),
             |keep AS (SELECT min(doc_id) AS doc_id FROM documents
             |  GROUP BY md5(text)),
             |tkb AS (SELECT unnest(list_filter(
             |    string_split_regex(text, ' +'), t -> t <> '')) AS tok
             |  FROM documents
             |  WHERE doc_id IN (SELECT doc_id FROM keep)),
             |cb AS (SELECT tok, count(*) AS c_b FROM tkb GROUP BY 1),
             |na AS (SELECT count(*) AS docs_a FROM documents),
             |nb AS (SELECT count(*) AS docs_b FROM keep),
             |tta AS (SELECT sum(c_a) AS tokens_a FROM ca),
             |ttb AS (SELECT sum(c_b) AS tokens_b FROM cb),
             |j AS (SELECT coalesce(c_a, 0) AS c_a,
             |    coalesce(c_b, 0) AS c_b
             |  FROM ca FULL JOIN cb USING (tok)),
             |terms AS (SELECT c_a, c_b,
             |    (CASE WHEN c_a > 0 THEN CAST(round(
             |      CAST(c_a AS DOUBLE) / tokens_a / 2.0 *
             |      ln((CAST(c_a AS DOUBLE) / tokens_a) /
             |        ((CAST(c_a AS DOUBLE) / tokens_a +
             |          CAST(c_b AS DOUBLE) / tokens_b) / 2.0)) *
             |      1000000000.0) AS BIGINT) ELSE 0 END
             |   + CASE WHEN c_b > 0 THEN CAST(round(
             |      CAST(c_b AS DOUBLE) / tokens_b / 2.0 *
             |      ln((CAST(c_b AS DOUBLE) / tokens_b) /
             |        ((CAST(c_a AS DOUBLE) / tokens_a +
             |          CAST(c_b AS DOUBLE) / tokens_b) / 2.0)) *
             |      1000000000.0) AS BIGINT) ELSE 0 END) AS t,
             |    docs_a, docs_b, tokens_a, tokens_b
             |  FROM j CROSS JOIN na CROSS JOIN nb
             |  CROSS JOIN tta CROSS JOIN ttb)
             |SELECT CAST(docs_a AS BIGINT) AS docs_a,
             |  CAST(docs_b AS BIGINT) AS docs_b,
             |  CAST(tokens_a AS BIGINT) AS tokens_a,
             |  CAST(tokens_b AS BIGINT) AS tokens_b,
             |  count(*) AS vocab_union,
             |  round(CAST(sum(t) AS DOUBLE) / 1000000000.0, 6)
             |    AS js_nats
             |FROM terms
             |GROUP BY 1, 2, 3, 4""".stripMargin)),

    // Grouped 5-fold assignment with leakage audit: folds cut on the
    // USER hash (GroupKFold — a user never spans folds, the leak
    // cross-validation must avoid), per-fold volume and purchase mix,
    // plus the structural leaky-user count (provably 0, measured
    // anyway — audits state what holds, they don't assume it).
    QueryDef("q260_grouped_folds",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .withColumn("fold", pmod(Hashing.portableHash(
            concat(col("user_id").cast("string"), lit(":fold"))),
            lit(5L)).cast("int"))
        val perFold = ev.groupBy("fold").agg(
          countDistinct("user_id").as("n_users"),
          count(lit(1)).as("n_events"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("_np"))
        val leaky = ev.groupBy("user_id")
          .agg(countDistinct("fold").as("_nf"))
          .agg(sum(when(col("_nf") > 1, 1L).otherwise(0L))
            .as("leaky_users"))
        perFold.crossJoin(broadcast(leaky))
          .select(col("fold"), col("n_users"), col("n_events"),
            expr("(_np * 1000000) DIV n_events").as("purchase_ppm"),
            col("leaky_users"))
          .orderBy("fold")
      },
      Some(s"""WITH ev AS (
             |  SELECT user_id, event_type,
             |    ${Hashing.duckPortableHash(
                    "CAST(user_id AS VARCHAR) || ':fold'")} % 5 AS fold
             |  FROM events),
             |pf AS (SELECT fold, count(DISTINCT user_id) AS n_users,
             |    count(*) AS n_events,
             |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             |      AS np
             |  FROM ev GROUP BY 1),
             |lk AS (SELECT CAST(sum(CASE WHEN nf > 1 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS leaky_users
             |  FROM (SELECT user_id, count(DISTINCT fold) AS nf
             |    FROM ev GROUP BY 1))
             |SELECT CAST(fold AS INT) AS fold, n_users,
             |  CAST(n_events AS BIGINT) AS n_events,
             |  CAST((np * 1000000) // n_events AS BIGINT)
             |    AS purchase_ppm,
             |  leaky_users
             |FROM pf CROSS JOIN lk ORDER BY 1""".stripMargin)),

    // Leave-one-out k-NN accuracy per label (Similarity.knnPredict):
    // the no-model embedding-quality eval — if labels cluster, 5-NN
    // gets them right. Queries bounded to the vec_id<200 eval sample
    // (the q103 discipline); at corpus scale swap brute force for
    // the IVF probe, voting unchanged.
    QueryDef("q261_knn_loo_eval",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.knnPredict(emb, emb.filter(col("vec_id") < 200),
            "vec_id", "embedding", "label", k = 5)
          .groupBy(col("true_label").as("label"))
          .agg(count(lit(1)).as("n_queries"),
            sum(when(col("pred_label") === col("true_label"), 1L)
              .otherwise(0L)).as("n_correct"))
          .withColumn("accuracy",
            round(col("n_correct").cast("double") /
              col("n_queries").cast("double"), 4))
          .orderBy("label")
      },
      Some("WITH " + knnCtes(200, 5) + "\n" +
        """SELECT t_label AS label, count(*) AS n_queries,
          |  CAST(sum(CASE WHEN pred = t_label THEN 1 ELSE 0 END)
          |    AS BIGINT) AS n_correct,
          |  round(CAST(sum(CASE WHEN pred = t_label THEN 1 ELSE 0 END)
          |      AS DOUBLE) / CAST(count(*) AS DOUBLE), 4) AS accuracy
          |FROM knp GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Per-class precision/recall/F1 of the q261 k-NN classifier:
    // the confusion-margin readout a single accuracy number hides —
    // which labels bleed into which. All ratios from exact integer
    // confusion counts.
    QueryDef("q262_knn_prf1",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val pred = Similarity.knnPredict(emb,
          emb.filter(col("vec_id") < 200), "vec_id", "embedding",
          "label", k = 5)
        val tp = pred.where(col("pred_label") === col("true_label"))
          .groupBy(col("true_label").as("label"))
          .agg(count(lit(1)).as("tp"))
        val act = pred.groupBy(col("true_label").as("label"))
          .agg(count(lit(1)).as("n_actual"))
        val prd = pred.groupBy(col("pred_label").as("label"))
          .agg(count(lit(1)).as("n_predicted"))
        act.join(prd, Seq("label"), "full_outer")
          .join(tp, Seq("label"), "left")
          .select(col("label"),
            coalesce(col("n_actual"), lit(0L)).as("n_actual"),
            coalesce(col("n_predicted"), lit(0L)).as("n_predicted"),
            coalesce(col("tp"), lit(0L)).as("tp"))
          .withColumn("precision", round(when(col("n_predicted") > 0,
            col("tp").cast("double") / col("n_predicted").cast("double"))
            .otherwise(lit(null)), 4))
          .withColumn("recall", round(when(col("n_actual") > 0,
            col("tp").cast("double") / col("n_actual").cast("double"))
            .otherwise(lit(null)), 4))
          .withColumn("f1", round(when(
            col("tp") > 0,
            lit(2.0) * (col("tp").cast("double") /
              col("n_predicted").cast("double")) *
              (col("tp").cast("double") / col("n_actual").cast("double")) /
              (col("tp").cast("double") / col("n_predicted").cast("double") +
                col("tp").cast("double") / col("n_actual").cast("double")))
            .otherwise(lit(0.0)), 4))
          .orderBy("label")
      },
      Some("WITH " + knnCtes(200, 5) + ",\n" +
        """tp AS (SELECT t_label AS label, count(*) AS tp
          |  FROM knp WHERE pred = t_label GROUP BY 1),
          |act AS (SELECT t_label AS label, count(*) AS n_actual
          |  FROM knp GROUP BY 1),
          |prd AS (SELECT pred AS label, count(*) AS n_predicted
          |  FROM knp GROUP BY 1)
          |SELECT coalesce(act.label, prd.label) AS label,
          |  coalesce(n_actual, 0) AS n_actual,
          |  coalesce(n_predicted, 0) AS n_predicted,
          |  CAST(coalesce(tp.tp, 0) AS BIGINT) AS tp,
          |  round(CASE WHEN coalesce(n_predicted, 0) > 0
          |    THEN CAST(coalesce(tp.tp, 0) AS DOUBLE) /
          |      CAST(n_predicted AS DOUBLE)
          |    END, 4) AS precision,
          |  round(CASE WHEN coalesce(n_actual, 0) > 0
          |    THEN CAST(coalesce(tp.tp, 0) AS DOUBLE) /
          |      CAST(n_actual AS DOUBLE)
          |    END, 4) AS recall,
          |  round(CASE WHEN coalesce(tp.tp, 0) > 0
          |    THEN 2.0 * (CAST(tp.tp AS DOUBLE) /
          |        CAST(n_predicted AS DOUBLE)) *
          |      (CAST(tp.tp AS DOUBLE) / CAST(n_actual AS DOUBLE)) /
          |      (CAST(tp.tp AS DOUBLE) / CAST(n_predicted AS DOUBLE) +
          |       CAST(tp.tp AS DOUBLE) / CAST(n_actual AS DOUBLE))
          |    ELSE 0.0 END, 4) AS f1
          |FROM act
          |FULL JOIN prd ON act.label = prd.label
          |LEFT JOIN tp ON act.label = tp.label
          |ORDER BY 1""".stripMargin)),

    // Distribution-free median CI per language (RobustStats
    // .medianCi): binomial order-statistic bounds — no normality
    // assumption, exact data values as endpoints, rank bounds from
    // one fixed floor/ceil expression.
    QueryDef("q263_median_ci",
      (s, dir) => RobustStats.medianCi(
          t(s, dir, "documents"), "lang", "n_chars")
        .orderBy("g"),
      Some("""WITH x AS (SELECT lang AS g, n_chars AS x
             |  FROM documents WHERE n_chars IS NOT NULL),
             |rk AS (SELECT g, x,
             |    row_number() OVER (PARTITION BY g ORDER BY x) AS rn,
             |    count(*) OVER (PARTITION BY g) AS n
             |  FROM x),
             |bd AS (SELECT g, x, rn, n,
             |    greatest(1, CAST(floor((CAST(n AS DOUBLE) -
             |      1.959964 * sqrt(CAST(n AS DOUBLE))) / 2.0)
             |      AS BIGINT)) AS lo,
             |    least(n, CAST(ceil((CAST(n AS DOUBLE) + 2.0 +
             |      1.959964 * sqrt(CAST(n AS DOUBLE))) / 2.0)
             |      AS BIGINT)) AS hi
             |  FROM rk),
             |ci AS (SELECT g,
             |    min(CASE WHEN rn = lo THEN x END) AS ci_lo,
             |    max(CASE WHEN rn = hi THEN x END) AS ci_hi
             |  FROM bd WHERE rn = lo OR rn = hi GROUP BY 1),
             |md AS (SELECT g, count(*) AS n,
             |    percentile_cont(0.5) WITHIN GROUP (ORDER BY x) AS med
             |  FROM x GROUP BY 1)
             |SELECT md.g, CAST(md.n AS BIGINT) AS n,
             |  round(med, 4) AS median,
             |  CAST(ci_lo AS DOUBLE) AS ci_lo,
             |  CAST(ci_hi AS DOUBLE) AS ci_hi
             |FROM md JOIN ci ON md.g = ci.g ORDER BY 1""".stripMargin)),

    // Session dwell/bounce report (Sessionize.dwellStats): 30-min-gap
    // sessions → per start day the session count, single-event
    // bounce share, and dwell percentiles — did engagement move or
    // just traffic.
    QueryDef("q264_session_dwell",
      (s, dir) => Sessionize.dwellStats(t(s, dir, "events"),
          Seq("user_id"), "ts", "event_id", gapUs = 1800000000L)
        .orderBy("day"),
      Some("""WITH sv AS (
             |  SELECT user_id, event_id, epoch_us(ts) AS tu
             |  FROM events),
             |lg AS (SELECT user_id, tu, event_id,
             |    CASE WHEN lag(tu) OVER w IS NULL
             |      OR tu - lag(tu) OVER w > 1800000000
             |      THEN 1 ELSE 0 END AS nw
             |  FROM sv WINDOW w AS (PARTITION BY user_id
             |    ORDER BY tu, event_id)),
             |ss AS (SELECT user_id, tu, sum(nw) OVER (
             |    PARTITION BY user_id ORDER BY tu, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |    AS sid
             |  FROM lg),
             |ag AS (SELECT user_id, sid, count(*) AS n_ev,
             |    min(tu) AS s, max(tu) AS e
             |  FROM ss GROUP BY 1, 2),
             |dd AS (SELECT (e - s) // 1000 AS dwell,
             |    s // 86400000000 AS day, n_ev
             |  FROM ag)
             |SELECT day, count(*) AS n_sessions,
             |  CAST((sum(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END) *
             |    1000000) // count(*) AS BIGINT) AS bounce_ppm,
             |  round(percentile_cont(0.5) WITHIN GROUP (ORDER BY dwell)
             |    / 1000.0, 3) AS p50_dwell_s,
             |  round(percentile_cont(0.9) WITHIN GROUP (ORDER BY dwell)
             |    / 1000.0, 3) AS p90_dwell_s
             |FROM dd GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Two-NN intrinsic dimension (Similarity.twoNnDimension, Facco
    // et al. 2017): ID ≈ n/Σln(d₂/d₁) over the bounded query sample —
    // tells you whether q121's JL target dim is below the data's
    // effective dimension. Duplicate-degenerate points excluded AND
    // counted.
    QueryDef("q265_intrinsic_dim",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.twoNnDimension(emb,
          emb.filter(col("vec_id") < 200), "vec_id", "embedding")
      },
      Some(s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qvec
             |  FROM embeddings WHERE vec_id < 200),
             |c AS (SELECT vec_id AS neighbor_id, embedding AS cvec
             |  FROM embeddings),
             |sc AS (SELECT query_id, neighbor_id,
             |    ${duckCos("qvec", "cvec")} AS cos
             |  FROM c CROSS JOIN q WHERE neighbor_id <> query_id),
             |rk0 AS (SELECT query_id, cos, row_number() OVER (
             |    PARTITION BY query_id ORDER BY cos DESC, neighbor_id)
             |    AS rank
             |  FROM sc),
             |rk AS (SELECT query_id, round(cos, 4) AS cos, rank
             |  FROM rk0 WHERE rank <= 2),
             |mu AS (SELECT query_id,
             |    min(CASE WHEN rank = 1 THEN 1.0 - cos END) AS d1,
             |    min(CASE WHEN rank = 2 THEN 1.0 - cos END) AS d2
             |  FROM rk GROUP BY 1),
             |lr AS (SELECT CASE WHEN d1 > 0 AND d2 > d1
             |    THEN CAST(round(ln(d2 / d1) * 1000000000.0) AS BIGINT)
             |    END AS lnr
             |  FROM mu)
             |SELECT count(*) AS n_sample, count(lnr) AS n_valid,
             |  round(CAST(count(lnr) AS DOUBLE) /
             |    (CAST(sum(lnr) AS DOUBLE) / 1000000000.0), 3)
             |    AS id_est
             |FROM lr""".stripMargin)),

    // k-anonymity risk report (ops/Anonymity.kAnonymity, Sweeney
    // 2002): QI = (lang, source, length bucket) — the 10 smallest
    // equivalence classes (the actual re-identification surface)
    // with the corpus summary repeated. The governance gate before
    // sharing a "de-identified" extract.
    QueryDef("q266_k_anonymity",
      (s, dir) => Anonymity.kAnonymity(
          t(s, dir, "documents")
            .withColumn("len_bucket", expr("n_chars DIV 500")),
          Seq("lang", "source", "len_bucket"), k = 5L, topN = 10)
        .orderBy("risk_rank"),
      Some("""WITH q AS (SELECT lang, source, n_chars // 500
             |    AS len_bucket
             |  FROM documents),
             |cl AS (SELECT lang, source, len_bucket,
             |    count(*) AS class_size
             |  FROM q GROUP BY 1, 2, 3),
             |sm AS (SELECT count(*) AS n_classes,
             |    sum(CASE WHEN class_size < 5 THEN 1 ELSE 0 END)
             |      AS n_small_classes,
             |    sum(CASE WHEN class_size < 5 THEN class_size
             |      ELSE 0 END) AS records_at_risk,
             |    min(class_size) AS min_class_size,
             |    sum(class_size) AS n_records
             |  FROM cl),
             |rk AS (SELECT *, row_number() OVER (ORDER BY class_size,
             |    lang, source, len_bucket) AS risk_rank
             |  FROM cl)
             |SELECT CAST(risk_rank AS INT) AS risk_rank, lang, source,
             |  len_bucket, CAST(class_size AS BIGINT) AS class_size,
             |  CAST(n_classes AS BIGINT) AS n_classes,
             |  CAST(n_small_classes AS BIGINT) AS n_small_classes,
             |  CAST(records_at_risk AS BIGINT) AS records_at_risk,
             |  CAST(min_class_size AS BIGINT) AS min_class_size,
             |  CAST((records_at_risk * 1000000) // n_records AS BIGINT)
             |    AS risk_ppm
             |FROM rk CROSS JOIN sm
             |WHERE risk_rank <= 10 ORDER BY risk_rank""".stripMargin)),

    // Whole-star referential-integrity audit (Expectations
    // .refIntegrity ×5): orphan + null-FK counts for every relation
    // in the schema — the on-load DQ check. (The synthetic star is
    // clean; the audit MEASURES that rather than assuming it.)
    QueryDef("q267_ref_integrity",
      (s, dir) => {
        import graft.ops.Expectations
        val li = t(s, dir, "lineitem"); val ord = t(s, dir, "orders")
        val cust = t(s, dir, "customer"); val pt = t(s, dir, "part")
        val sup = t(s, dir, "supplier"); val nat = t(s, dir, "nation")
        Seq(
          Expectations.refIntegrity(li, "l_orderkey", ord,
            "o_orderkey", "lineitem->orders"),
          Expectations.refIntegrity(li, "l_partkey", pt,
            "p_partkey", "lineitem->part"),
          Expectations.refIntegrity(li, "l_suppkey", sup,
            "s_suppkey", "lineitem->supplier"),
          Expectations.refIntegrity(ord, "o_custkey", cust,
            "c_custkey", "orders->customer"),
          Expectations.refIntegrity(cust, "c_nationkey", nat,
            "n_nationkey", "customer->nation")
        ).reduce(_ unionByName _).orderBy("relation")
      },
      Some {
        def rel(label: String, child: String, ck: String,
            parent: String, pk: String) =
          s"""SELECT '$label' AS relation,
             |  (SELECT count(*) FROM $child) AS n_child,
             |  (SELECT count(*) FROM $child WHERE $ck IS NULL)
             |    AS n_null_key,
             |  (SELECT count(*) FROM $child WHERE $ck IS NOT NULL
             |    AND $ck NOT IN (SELECT DISTINCT $pk FROM $parent
             |      WHERE $pk IS NOT NULL)) AS n_orphans""".stripMargin
        Seq(
          rel("lineitem->orders", "lineitem", "l_orderkey",
            "orders", "o_orderkey"),
          rel("lineitem->part", "lineitem", "l_partkey",
            "part", "p_partkey"),
          rel("lineitem->supplier", "lineitem", "l_suppkey",
            "supplier", "s_suppkey"),
          rel("orders->customer", "orders", "o_custkey",
            "customer", "c_custkey"),
          rel("customer->nation", "customer", "c_nationkey",
            "nation", "n_nationkey"))
          .mkString("WITH u AS (\n", "\nUNION ALL\n", """)
            |SELECT relation, CAST(n_child AS BIGINT) AS n_child,
            |  CAST(n_null_key AS BIGINT) AS n_null_key,
            |  CAST(n_orphans AS BIGINT) AS n_orphans,
            |  CAST((n_orphans * 1000000) // n_child AS BIGINT)
            |    AS orphan_ppm
            |FROM u ORDER BY relation""".stripMargin)
      }),

    // Duplication-rate growth curve (Dedup.dupRateCurve): exact-dup
    // ppm at ¼/½/full id-prefix slices in ONE pass — dup rate grows
    // with corpus size, so this curve is the extrapolation evidence
    // for what a 100 TB crawl will dedup.
    QueryDef("q268_dup_growth",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val mx = docs.agg(max("doc_id")).head.getLong(0) + 1
        Dedup.dupRateCurve(docs, "doc_id", "text",
            Seq(mx / 4, mx / 2, mx))
          .orderBy("cutoff")
      },
      Some("""WITH mx AS (SELECT max(doc_id) + 1 AS m FROM documents),
             |cc AS (SELECT unnest([m // 4, m // 2, m]) AS c FROM mx),
             |h AS (SELECT doc_id AS id, md5(text) AS h
             |  FROM documents),
             |per AS (SELECT c AS cutoff,
             |    sum(CASE WHEN id < c THEN 1 ELSE 0 END) AS n_docs,
             |    count(DISTINCT CASE WHEN id < c THEN h END)
             |      AS n_distinct
             |  FROM h CROSS JOIN cc GROUP BY 1)
             |SELECT CAST(cutoff AS BIGINT) AS cutoff,
             |  CAST(n_docs AS BIGINT) AS n_docs,
             |  CAST(n_distinct AS BIGINT) AS n_distinct,
             |  CAST(n_docs - n_distinct AS BIGINT) AS n_dups,
             |  CAST(((n_docs - n_distinct) * 1000000) // n_docs
             |    AS BIGINT) AS dup_ppm
             |FROM per ORDER BY 1""".stripMargin)),

    // Chapman capture–recapture (CardinalityEstimate
    // .chapmanEstimate): two independent 40%/30% hash "crawls" of
    // the doc id space estimate the full corpus from their overlap —
    // with the truth available, the error is MEASURED.
    QueryDef("q269_capture_recapture",
      (s, dir) => CardinalityEstimate.chapmanEstimate(
        t(s, dir, "documents"), "doc_id", pctA = 40, pctB = 30),
      Some {
        def h(tag: String) = Hashing.duckPortableHash(
          s"CAST(doc_id AS VARCHAR) || ':$tag'")
        s"""WITH agg AS (SELECT count(*) AS n_true,
             |    sum(CASE WHEN ${h("crA")} % 100 < 40
             |      THEN 1 ELSE 0 END) AS n_a,
             |    sum(CASE WHEN ${h("crB")} % 100 < 30
             |      THEN 1 ELSE 0 END) AS n_b,
             |    sum(CASE WHEN ${h("crA")} % 100 < 40
             |      AND ${h("crB")} % 100 < 30
             |      THEN 1 ELSE 0 END) AS n_both
             |  FROM documents)
             |SELECT CAST(n_true AS BIGINT) AS n_true,
             |  CAST(n_a AS BIGINT) AS n_a,
             |  CAST(n_b AS BIGINT) AS n_b,
             |  CAST(n_both AS BIGINT) AS n_both,
             |  round((CAST(n_a AS DOUBLE) + 1.0) *
             |    (CAST(n_b AS DOUBLE) + 1.0) /
             |    (CAST(n_both AS DOUBLE) + 1.0) - 1.0, 2)
             |    AS chapman_est,
             |  CAST(round((((CAST(n_a AS DOUBLE) + 1.0) *
             |      (CAST(n_b AS DOUBLE) + 1.0) /
             |      (CAST(n_both AS DOUBLE) + 1.0) - 1.0) /
             |    CAST(n_true AS DOUBLE) - 1.0) * 1000000.0) AS BIGINT)
             |    AS err_ppm
             |FROM agg""".stripMargin
      }),

    // Empirical-Bayes purchase-rate leaderboard (ops/Shrinkage
    // .empiricalBayesRate): per-user rates pulled toward the pooled
    // rate by 50 pseudo-trials — the small-sample-leaderboard fix,
    // top-20 via TakeOrderedAndProject (no global window).
    QueryDef("q270_eb_shrinkage",
      (s, dir) => Shrinkage.empiricalBayesRate(
          t(s, dir, "events")
            .withColumn("is_trial", lit(1))
            .withColumn("is_succ",
              (col("event_type") === "purchase").cast("int")),
          "user_id", "is_trial", "is_succ", m = 50, topN = 20),
      Some("""WITH per AS (SELECT user_id AS entity,
             |    count(*) AS n_trials,
             |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
             |      END) AS n_succ
             |  FROM events GROUP BY 1),
             |g AS (SELECT CAST(sum(n_succ) AS DOUBLE) /
             |    CAST(sum(n_trials) AS DOUBLE) AS p0
             |  FROM per),
             |sh AS (SELECT entity, n_trials, n_succ,
             |    (CAST(n_succ AS DOUBLE) + 50.0 * p0) /
             |      (CAST(n_trials AS DOUBLE) + 50.0) AS shrunk
             |  FROM per CROSS JOIN g)
             |SELECT entity, CAST(n_trials AS BIGINT) AS n_trials,
             |  CAST(n_succ AS BIGINT) AS n_succ,
             |  round(CAST(n_succ AS DOUBLE) /
             |    CAST(n_trials AS DOUBLE), 4) AS raw_rate,
             |  round(shrunk, 4) AS shrunk_rate
             |FROM sh ORDER BY shrunk DESC, entity
             |LIMIT 20""".stripMargin)),

    // Inverse-propensity (Horvitz–Thompson) mean over q64's
    // stratified sample (Sampling.ipwMean): the naive sample mean is
    // biased by the per-source rates; 1/p re-weighting recovers the
    // full-corpus mean — all three shown side by side.
    QueryDef("q271_ipw_mean",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val rates = Seq("src0" -> 100, "src1" -> 50, "src2" -> 10)
        val sampled = Sampling.stratifiedSample(docs, "doc_id",
          "source", rates, defaultPct = 25)
        val truth = docs.where(col("n_chars").isNotNull)
          .agg(round(sum("n_chars").cast("double") /
            count(lit(1)).cast("double"), 4).as("true_mean"))
        Sampling.ipwMean(sampled, "source", "n_chars", rates,
            defaultPct = 25)
          .crossJoin(broadcast(truth))
          .select("n_sample", "true_mean", "naive_mean", "ipw_mean")
      },
      Some(("""WITH s AS (SELECT source, n_chars
             |  FROM (SELECT source, n_chars,
             |      """ + Sampling.duckBucket("doc_id") + """ AS b
             |    FROM documents)
             |  WHERE b < CASE source WHEN 'src0' THEN 100
             |    WHEN 'src1' THEN 50 WHEN 'src2' THEN 10
             |    ELSE 25 END),
             |w AS (SELECT n_chars,
             |    CASE source WHEN 'src0' THEN 100 WHEN 'src1' THEN 200
             |      WHEN 'src2' THEN 1000 ELSE 400 END AS w
             |  FROM s WHERE n_chars IS NOT NULL),
             |ip AS (SELECT count(*) AS n_sample,
             |    round(CAST(sum(n_chars) AS DOUBLE) /
             |      CAST(count(*) AS DOUBLE), 4) AS naive_mean,
             |    round(CAST(sum(w * n_chars) AS DOUBLE) /
             |      CAST(sum(w) AS DOUBLE), 4) AS ipw_mean
             |  FROM w),
             |tm AS (SELECT round(CAST(sum(n_chars) AS DOUBLE) /
             |      CAST(count(*) AS DOUBLE), 4) AS true_mean
             |  FROM documents WHERE n_chars IS NOT NULL)
             |SELECT CAST(n_sample AS BIGINT) AS n_sample, true_mean,
             |  naive_mean, ipw_mean
             |FROM ip CROSS JOIN tm""").stripMargin)),

    // Behavioral-combo lattice (ops/Behavior.typeCombos): per
    // (user, day) the bitmask of event types seen, counted per mask —
    // every "did X and Y but not Z" cohort in ONE bit_or pass.
    QueryDef("q272_behavior_combos",
      (s, dir) => {
        val ev = t(s, dir, "events").withColumn("day",
          expr("unix_micros(cast(ts as timestamp)) div 86400000000"))
        Behavior.typeCombos(ev, "user_id", "day", "event_type",
            Seq("click", "error", "purchase", "signup", "view"))
          .orderBy("mask")
      },
      Some("""WITH rows_ AS (SELECT user_id AS e,
             |    epoch_us(ts) // 86400000000 AS d,
             |    CASE event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2
             |      WHEN 'purchase' THEN 4 WHEN 'signup' THEN 8
             |      WHEN 'view' THEN 16 ELSE 0 END AS b
             |  FROM events),
             |m AS (SELECT e, d, bit_or(b) AS mask FROM rows_
             |  WHERE b > 0 GROUP BY 1, 2),
             |c AS (SELECT mask, count(*) AS n_entity_days,
             |    count(DISTINCT e) AS n_entities
             |  FROM m GROUP BY 1)
             |SELECT CAST(mask AS BIGINT) AS mask,
             |  concat_ws('+',
             |    CASE WHEN mask & 1 > 0 THEN 'click' END,
             |    CASE WHEN mask & 2 > 0 THEN 'error' END,
             |    CASE WHEN mask & 4 > 0 THEN 'purchase' END,
             |    CASE WHEN mask & 8 > 0 THEN 'signup' END,
             |    CASE WHEN mask & 16 > 0 THEN 'view' END) AS combo,
             |  n_entity_days, n_entities
             |FROM c ORDER BY 1""".stripMargin)),

    // Degree power-law MLE (GraphMetrics.powerLawAlpha, Clauset et
    // al. 2009): is near-duplication hub-dominated (template spam,
    // α ≈ 2) or local (α ≫ 3)? Nano-snapped ln terms.
    QueryDef("q273_power_law",
      (s, dir) => {
        val docs = t(s, dir, "documents").filter(col("doc_id") < 1000)
        val pairs = Dedup.minhashNearDups(docs, "doc_id", "text",
          k = 64, bands = 8, threshold = 0.8)
        GraphMetrics.powerLawAlpha(pairs, "id_a", "id_b", dmin = 2)
      },
      Some("WITH " + minhashVerifiedCtes + ",\n" +
        """pr AS (SELECT id_a, id_b FROM verified WHERE jaccard >= 0.8),
          |dg AS (SELECT node, count(*) AS degree FROM (
          |    SELECT id_a AS node FROM pr
          |    UNION ALL SELECT id_b FROM pr)
          |  GROUP BY 1),
          |sl AS (SELECT degree,
          |    CASE WHEN degree >= 2 THEN CAST(round(
          |      ln(CAST(degree AS DOUBLE) / 1.5) * 1000000000.0)
          |      AS BIGINT) ELSE 0 END AS sln
          |  FROM dg)
          |SELECT count(*) AS n_nodes,
          |  CAST(sum(CASE WHEN degree >= 2 THEN 1 ELSE 0 END)
          |    AS BIGINT) AS n_tail,
          |  CAST(min(degree) AS BIGINT) AS d_min,
          |  CAST(max(degree) AS BIGINT) AS d_max,
          |  round(CASE WHEN sum(sln) > 0 THEN 1.0 +
          |    CAST(sum(CASE WHEN degree >= 2 THEN 1 ELSE 0 END)
          |      AS DOUBLE) /
          |    (CAST(sum(sln) AS DOUBLE) / 1000000000.0) END, 4)
          |    AS alpha
          |FROM sl""".stripMargin)),

    // Retention decay + half-life (Retention.decayFit): pooled
    // bounce-back rate at lags 1..14 in ONE shifted join, ln-linear
    // fit → engagement half-life in days.
    QueryDef("q274_retention_decay",
      (s, dir) => {
        val ev = t(s, dir, "events").withColumn("day",
          expr("unix_micros(cast(ts as timestamp)) div 86400000000"))
        Retention.decayFit(ev, "user_id", "day", maxLag = 14)
          .orderBy("lag")
      },
      Some(s"""WITH act AS (SELECT DISTINCT user_id AS e,
             |    epoch_us(ts) // 86400000000 AS d
             |  FROM events),
             |mx AS (SELECT max(d) AS m FROM act),
             |sh AS (SELECT e, lag, d + lag AS d
             |  FROM act, (SELECT unnest(generate_series(1, 14)) AS lag)
             |    l),
             |base AS (SELECT sh.lag, count(*) AS n_base,
             |    sum(CASE WHEN a2.e IS NOT NULL THEN 1 ELSE 0 END)
             |      AS n_ret
             |  FROM sh CROSS JOIN mx
             |  LEFT JOIN act a2 ON sh.e = a2.e AND sh.d = a2.d
             |  WHERE sh.d <= m GROUP BY 1),
             |pts AS (SELECT lag AS x, CAST(round(
             |    ln(CAST(n_ret AS DOUBLE) / CAST(n_base AS DOUBLE)) *
             |    1000000.0) AS BIGINT) AS y
             |  FROM base WHERE n_ret > 0),
             |fit AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
             |    sum(x * x) AS sxx, sum(x * y) AS sxy
             |  FROM pts),
             |hl AS (SELECT round(CASE WHEN
             |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
             |     CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
             |    (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
             |     CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) /
             |    1000000.0 < 0
             |    THEN ${-math.log(2.0)} /
             |      ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
             |        CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
             |       (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
             |        CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) /
             |       1000000.0)
             |    END, 2) AS half_life_days
             |  FROM fit)
             |SELECT CAST(lag AS INT) AS lag,
             |  CAST(n_base AS BIGINT) AS n_base,
             |  CAST(n_ret AS BIGINT) AS n_retained,
             |  round(CAST(n_ret AS DOUBLE) / CAST(n_base AS DOUBLE), 4)
             |    AS rate,
             |  half_life_days
             |FROM base CROSS JOIN hl ORDER BY 1""".stripMargin)),

    // A/A calibration harness (RobustStats.welchT over 20 hash
    // seeds): on null data the t statistics must look standard
    // normal — the end-to-end validity check of the whole
    // experimentation stack (~1 of 20 beyond ±1.96 expected).
    QueryDef("q275_aa_calibration",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .where(col("value").isNotNull)
          .withColumn("seed", explode(sequence(lit(0), lit(19))))
          .withColumn("arm", pmod(Hashing.seededHash(col("seed"),
            col("user_id").cast("string")), lit(2L)).cast("int"))
          .withColumn("cents", round(col("value") * 100).cast("long"))
        val ts = RobustStats.welchT(ev, "seed", "arm", "cents")
        val sig = ts.agg(sum(when(abs(col("t")) > 1.96, 1L)
          .otherwise(0L)).as("n_sig_of_20"))
        ts.crossJoin(broadcast(sig))
          .select(col("seed"), col("n0"), col("n1"), col("t"),
            col("n_sig_of_20"))
          .orderBy("seed")
      },
      Some(s"""WITH ev AS (
             |  SELECT s.seed,
             |    CASE WHEN ${Hashing.duckSeededHash("seed",
                    "CAST(user_id AS VARCHAR)")} % 2 = 1
             |      THEN 1 ELSE 0 END AS arm,
             |    CAST(round(value * 100) AS BIGINT) AS x
             |  FROM events,
             |    (SELECT unnest(generate_series(0, 19)) AS seed) s
             |  WHERE value IS NOT NULL),
             |a AS (SELECT seed, arm, count(*) AS n, sum(x) AS sx,
             |    sum(x * x) AS sxx
             |  FROM ev GROUP BY 1, 2),
             |p AS (SELECT seed, arm, n,
             |    CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
             |    (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) *
             |        CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) /
             |      (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))
             |      AS von
             |  FROM a),
             |tt AS (SELECT a0.seed, a0.n AS n0, a1.n AS n1,
             |    round((a1.mean - a0.mean) / sqrt(a0.von + a1.von), 4)
             |      + 0.0 AS t
             |  FROM p a0 JOIN p a1
             |    ON a0.seed = a1.seed AND a0.arm = 0 AND a1.arm = 1),
             |sg AS (SELECT CAST(sum(CASE WHEN abs(t) > 1.96
             |    THEN 1 ELSE 0 END) AS BIGINT) AS n_sig_of_20
             |  FROM tt)
             |SELECT CAST(seed AS INT) AS seed,
             |  CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1, t,
             |  n_sig_of_20
             |FROM tt CROSS JOIN sg ORDER BY 1""".stripMargin)),

    // Incremental surrogate keys (ops/SurrogateKeys
    // .assignIncremental): the first-100-docs (source, lang) dim
    // keeps its ids; only never-seen combos get new ones, densely
    // after the max, in key order. The only ordered window runs on
    // the DELTA.
    QueryDef("q276_surrogate_keys",
      (s, dir) => {
        val keyed = t(s, dir, "documents")
          .withColumn("skey", concat_ws(":", col("source"), col("lang")))
        val existing = keyed.filter(col("doc_id") < 100)
          .select("skey").distinct()
          .withColumn("sk", row_number().over(
            Window.orderBy("skey")).cast("long"))
        SurrogateKeys.assignIncremental(existing, "skey", "sk", keyed)
          .orderBy("sk")
      },
      Some("""WITH ex AS (SELECT skey,
             |    row_number() OVER (ORDER BY skey) AS sk
             |  FROM (SELECT DISTINCT source || ':' || lang AS skey
             |    FROM documents WHERE doc_id < 100)),
             |mx AS (SELECT coalesce(max(sk), 0) AS m FROM ex),
             |fresh AS (SELECT DISTINCT source || ':' || lang AS skey
             |  FROM documents
             |  WHERE source || ':' || lang NOT IN
             |    (SELECT skey FROM ex)),
             |asg AS (SELECT skey,
             |    m + row_number() OVER (ORDER BY skey) AS sk,
             |    1 AS is_new
             |  FROM fresh CROSS JOIN mx)
             |SELECT skey, CAST(sk AS BIGINT) AS sk, is_new FROM (
             |  SELECT skey, sk, 0 AS is_new FROM ex
             |  UNION ALL SELECT * FROM asg)
             |ORDER BY sk""".stripMargin)),

    // k-NN reliability diagram + ECE (Similarity.knnReliability):
    // vote confidence vs empirical accuracy per vote bin — "when the
    // classifier says 80%, is it right 80% of the time" — with the
    // expected calibration error from nano-snapped bin terms.
    QueryDef("q277_knn_reliability",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.knnReliability(emb,
            emb.filter(col("vec_id") < 200), "vec_id", "embedding",
            "label", k = 5)
          .orderBy("n_votes")
      },
      Some("WITH " + knnCtes(200, 5) + ",\n" +
        """bins AS (SELECT n_votes, count(*) AS n,
          |    sum(CASE WHEN pred = t_label THEN 1 ELSE 0 END)
          |      AS n_correct
          |  FROM knp GROUP BY 1),
          |wr AS (SELECT n_votes, n, n_correct,
          |    CAST(n_votes AS DOUBLE) / 5.0 AS conf,
          |    CAST(n_correct AS DOUBLE) / CAST(n AS DOUBLE) AS acc
          |  FROM bins),
          |t2 AS (SELECT *, CAST(round(CAST(n AS DOUBLE) *
          |    abs(acc - conf) * 1000000000.0) AS BIGINT) AS term
          |  FROM wr),
          |tot AS (SELECT sum(n) AS nn, sum(term) AS se FROM t2)
          |SELECT CAST(n_votes AS BIGINT) AS n_votes,
          |  CAST(n AS BIGINT) AS n,
          |  round(conf, 4) AS confidence, round(acc, 4) AS accuracy,
          |  round(CAST(se AS DOUBLE) / 1000000000.0 /
          |    CAST(nn AS DOUBLE), 4) AS ece
          |FROM t2 CROSS JOIN tot ORDER BY 1""".stripMargin)),

    // Standardized-mean-difference drift screen (Drift.smdScreen):
    // all four lineitem metrics between orderkey-parity cohorts in
    // ONE unpivoted pass — the scale-free triage run before
    // per-column KS/PSI deep dives.
    QueryDef("q278_smd_screen",
      (s, dir) => Drift.smdScreen(
          t(s, dir, "lineitem")
            .withColumn("arm", pmod(col("l_orderkey"), lit(2L))),
          "arm",
          Seq(("l_quantity", 100L), ("l_extendedprice", 1L),
            ("l_discount", 10000L), ("l_tax", 10000L)))
        .orderBy("column"),
      Some {
        def leg(c: String, scale: String) =
          s"""SELECT CAST(l_orderkey % 2 AS INT) AS arm,
             |  '$c' AS col_, CAST(round(CAST($c AS DOUBLE) * $scale)
             |    AS BIGINT) AS x
             |FROM lineitem""".stripMargin
        s"""WITH m AS (
             |${leg("l_quantity", "100.0")}
             |UNION ALL
             |${leg("l_extendedprice", "1.0")}
             |UNION ALL
             |${leg("l_discount", "10000.0")}
             |UNION ALL
             |${leg("l_tax", "10000.0")}),
             |mom AS (SELECT col_, arm, count(*) AS n, sum(x) AS sx,
             |    sum(x * x) AS sxx
             |  FROM m WHERE x IS NOT NULL GROUP BY 1, 2),
             |wv AS (SELECT col_, arm, n,
             |    CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
             |    (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) *
             |        CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) /
             |      (CAST(n AS DOUBLE) - 1.0) AS v
             |  FROM mom),
             |a0 AS (SELECT col_, n AS n0, mean AS m0, v AS v0
             |  FROM wv WHERE arm = 0),
             |a1 AS (SELECT col_, n AS n1, mean AS m1, v AS v1
             |  FROM wv WHERE arm = 1)
             |SELECT a0.col_ AS "column",
             |  CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
             |  round(m0, 4) AS mean0, round(m1, 4) AS mean1,
             |  round(abs(m1 - m0) / sqrt((v0 + v1) / 2.0), 4) AS smd
             |FROM a0 JOIN a1 USING (col_)
             |ORDER BY 1""".stripMargin
      }),

    // Native session_window parity (Structured Streaming's gap-based
    // session operator, exercised in BATCH mode): Spark's built-in
    // session assembly must agree with the hand-rolled q264 window
    // chain — start = first event, end = last event + gap, exact
    // integer counts/cents.
    QueryDef("q279_session_window",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .withColumn("cents", round(col("value") * 100).cast("long"))
        ev.groupBy(col("user_id"),
            session_window(col("ts").cast("timestamp"), "30 minutes"))
          .agg(count(lit(1)).as("n_events"), sum("cents").as("cents"))
          .select(col("user_id"),
            col("session_window.start").cast("timestamp_ntz")
              .as("session_start"),
            col("session_window.end").cast("timestamp_ntz")
              .as("session_end"),
            col("n_events"), col("cents"))
          .orderBy("user_id", "session_start")
      },
      Some("""WITH sv AS (
             |  SELECT user_id, event_id, epoch_us(ts) AS tu,
             |    CAST(round(value * 100) AS BIGINT) AS cents
             |  FROM events),
             |lg AS (SELECT user_id, tu, cents, event_id,
             |    CASE WHEN lag(tu) OVER w IS NULL
             |      OR tu - lag(tu) OVER w > 1800000000
             |      THEN 1 ELSE 0 END AS nw
             |  FROM sv WINDOW w AS (PARTITION BY user_id
             |    ORDER BY tu, event_id)),
             |ss AS (SELECT user_id, tu, cents, sum(nw) OVER (
             |    PARTITION BY user_id ORDER BY tu, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |    AS sid
             |  FROM lg)
             |SELECT user_id,
             |  make_timestamp(min(tu)) AS session_start,
             |  make_timestamp(max(tu) + 1800000000) AS session_end,
             |  count(*) AS n_events, CAST(sum(cents) AS BIGINT) AS cents
             |FROM ss GROUP BY user_id, sid
             |ORDER BY 1, 2""".stripMargin)),

    // Approximate MAD from two histogram-sketch passes (Stats
    // .histPercentiles ∘ itself): sketch median → sketch median of
    // |x − med| — the 100 TB-shaped robust scale (two
    // map-side-combined sketch aggregates instead of two full
    // sorts), with the exact MAD beside it so the sketch error is
    // MEASURED.
    QueryDef("q280_approx_mad",
      (s, dir) => {
        val docs = t(s, dir, "documents").where(col("n_chars").isNotNull)
        val medA = Stats.histPercentiles(docs, "lang", "n_chars",
            lo = 0.0, hi = 1024.0, nbins = 256, ps = Seq(0.5))
          .select(col("lang"), col("est").as("med_est"))
        val dev = docs.join(broadcast(medA), "lang")
          .withColumn("ad",
            abs(col("n_chars").cast("double") - col("med_est")))
        val madA = Stats.histPercentiles(dev, "lang", "ad",
            lo = 0.0, hi = 1024.0, nbins = 256, ps = Seq(0.5))
          .select(col("lang"), col("est").as("mad_est"))
        val medEx = docs.groupBy("lang").agg(count(lit(1)).as("n"),
          expr("percentile(n_chars, 0.5)").as("_mx"))
        val madEx = docs
          .join(broadcast(medEx.select("lang", "_mx")), "lang")
          .withColumn("_ad",
            abs(col("n_chars").cast("double") - col("_mx")))
          .groupBy("lang")
          .agg(expr("percentile(_ad, 0.5)").as("_madx"))
        medEx.join(medA, Seq("lang")).join(madA, Seq("lang"))
          .join(madEx, Seq("lang"))
          .select(col("lang"), col("n"), col("med_est"), col("mad_est"),
            round(col("_madx"), 4).as("mad_exact"))
          .orderBy("lang")
      },
      Some("""WITH v AS (SELECT lang, CAST(n_chars AS DOUBLE) AS v
             |  FROM documents WHERE n_chars IS NOT NULL),
             |b1 AS (SELECT lang, CAST(least(greatest(
             |    floor(v / 4.0), 0), 255) AS BIGINT) AS b FROM v),
             |c1 AS (SELECT lang, b, count(*) AS cnt
             |  FROM b1 GROUP BY 1, 2),
             |cc1 AS (SELECT lang, b, cnt,
             |    sum(cnt) OVER (PARTITION BY lang ORDER BY b) AS cum,
             |    sum(cnt) OVER (PARTITION BY lang) AS total
             |  FROM c1),
             |m1 AS (SELECT lang, round(4.0 * (CAST(b AS DOUBLE)
             |    + (0.5 * CAST(total AS DOUBLE) -
             |      CAST(cum - cnt AS DOUBLE)) / CAST(cnt AS DOUBLE)),
             |    4) + 0.0 AS med_est
             |  FROM cc1
             |  WHERE CAST(cum AS DOUBLE) >= 0.5 * CAST(total AS DOUBLE)
             |    AND CAST(cum - cnt AS DOUBLE) <
             |      0.5 * CAST(total AS DOUBLE)),
             |dv AS (SELECT v.lang, abs(v.v - med_est) AS ad
             |  FROM v JOIN m1 ON v.lang = m1.lang),
             |b2 AS (SELECT lang, CAST(least(greatest(
             |    floor(ad / 4.0), 0), 255) AS BIGINT) AS b FROM dv),
             |c2 AS (SELECT lang, b, count(*) AS cnt
             |  FROM b2 GROUP BY 1, 2),
             |cc2 AS (SELECT lang, b, cnt,
             |    sum(cnt) OVER (PARTITION BY lang ORDER BY b) AS cum,
             |    sum(cnt) OVER (PARTITION BY lang) AS total
             |  FROM c2),
             |m2 AS (SELECT lang, round(4.0 * (CAST(b AS DOUBLE)
             |    + (0.5 * CAST(total AS DOUBLE) -
             |      CAST(cum - cnt AS DOUBLE)) / CAST(cnt AS DOUBLE)),
             |    4) + 0.0 AS mad_est
             |  FROM cc2
             |  WHERE CAST(cum AS DOUBLE) >= 0.5 * CAST(total AS DOUBLE)
             |    AND CAST(cum - cnt AS DOUBLE) <
             |      0.5 * CAST(total AS DOUBLE)),
             |ex AS (SELECT lang, count(*) AS n,
             |    percentile_cont(0.5) WITHIN GROUP (ORDER BY v) AS mx
             |  FROM v GROUP BY 1),
             |exd AS (SELECT v.lang, percentile_cont(0.5)
             |    WITHIN GROUP (ORDER BY abs(v.v - mx)) AS madx
             |  FROM v JOIN ex ON v.lang = ex.lang GROUP BY 1)
             |SELECT ex.lang, CAST(n AS BIGINT) AS n, med_est, mad_est,
             |  round(madx, 4) AS mad_exact
             |FROM ex
             |JOIN m1 ON ex.lang = m1.lang
             |JOIN m2 ON ex.lang = m2.lang
             |JOIN exd ON ex.lang = exd.lang
             |ORDER BY 1""".stripMargin)),

    // Per-user behavioral entropy (Behavior.entityEntropy): Shannon
    // entropy of each user's event-type mix + the ln(k)-normalized
    // predictability score — power users vs one-trick bots in one
    // number. Nano-snapped −p·ln p cells.
    QueryDef("q281_behavior_entropy",
      (s, dir) => Behavior.entityEntropy(
          t(s, dir, "events"), "user_id", "event_type")
        .orderBy("entity"),
      Some("""WITH c AS (SELECT user_id AS entity, event_type AS t,
             |    count(*) AS c
             |  FROM events WHERE event_type IS NOT NULL
             |  GROUP BY 1, 2),
             |wn AS (SELECT entity, t, c,
             |    sum(c) OVER (PARTITION BY entity) AS n
             |  FROM c),
             |tm AS (SELECT entity, n, CAST(round(
             |    -(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) *
             |    ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) *
             |    1000000000.0) AS BIGINT) AS term
             |  FROM wn),
             |per AS (SELECT entity, max(n) AS n_events,
             |    count(*) AS n_types, sum(term) AS h
             |  FROM tm GROUP BY 1)
             |SELECT entity, CAST(n_events AS BIGINT) AS n_events,
             |  CAST(n_types AS BIGINT) AS n_types,
             |  round(CAST(h AS DOUBLE) / 1000000000.0, 4)
             |    AS entropy_nats,
             |  round(CASE WHEN n_types > 1 THEN
             |    CAST(h AS DOUBLE) / 1000000000.0 /
             |    ln(CAST(n_types AS DOUBLE)) END, 4) AS entropy_norm
             |FROM per ORDER BY 1""".stripMargin)),

    // Time-decay attribution (Attribution.decayReport): credit
    // proportional to 2^(−Δt / 1 day) — recency wins smoothly, not
    // winner-take-all. Micro-snapped weights, integer floor split,
    // remainder to the first touch: the books balance exactly.
    QueryDef("q282_decay_attribution",
      (s, dir) => Attribution.decayReport(t(s, dir, "events"),
          "event_id", "user_id", "ts", "event_type",
          convType = "purchase", touchTypes = Seq("click", "view"),
          valueCol = "value", lookbackDays = 3, halfLifeDays = 1.0)
        .orderBy("channel"),
      Some("""WITH conv AS (
             |  SELECT event_id AS cid, user_id AS e, epoch_us(ts) AS cts,
             |    CAST(round(value * 100) AS BIGINT) AS cents
             |  FROM events WHERE event_type = 'purchase'),
             |touch AS (SELECT user_id AS e, epoch_us(ts) AS tts,
             |    event_type AS channel
             |  FROM events WHERE event_type IN ('click', 'view')),
             |m AS (SELECT cid, cents, tts, channel,
             |    greatest(CAST(round(exp(-0.6931471805599453 *
             |      CAST(cts - tts AS DOUBLE) / 86400000000.0) *
             |      1000000.0) AS BIGINT), 1) AS w_u
             |  FROM conv JOIN touch ON conv.e = touch.e
             |  WHERE tts < cts AND tts >= cts - 259200000000),
             |r AS (SELECT cid, cents, channel, w_u,
             |    row_number() OVER (PARTITION BY cid
             |      ORDER BY tts, channel) AS pos,
             |    sum(w_u) OVER (PARTITION BY cid) AS sw
             |  FROM m),
             |b AS (SELECT *, (cents * w_u) // sw AS base FROM r),
             |b2 AS (SELECT *,
             |    cents - sum(base) OVER (PARTITION BY cid) AS rem
             |  FROM b),
             |cr AS (SELECT channel, cid,
             |    base + CASE WHEN pos = 1 THEN rem ELSE 0 END AS dc
             |  FROM b2),
             |bych AS (SELECT channel, count(DISTINCT cid)
             |      AS n_conversions,
             |    sum(dc) AS decay_cents
             |  FROM cr GROUP BY 1),
             |direct AS (SELECT 'direct' AS channel,
             |    count(*) AS n_conversions,
             |    coalesce(sum(cents), 0) AS decay_cents
             |  FROM conv WHERE cid NOT IN (SELECT DISTINCT cid FROM m)
             |  HAVING count(*) > 0)
             |SELECT channel,
             |  CAST(n_conversions AS BIGINT) AS n_conversions,
             |  CAST(decay_cents AS BIGINT) AS decay_cents
             |FROM (SELECT * FROM bych UNION ALL SELECT * FROM direct)
             |ORDER BY 1""".stripMargin)),

    // Perplexity curriculum (LanguageModel.scoreNll ∘ quartile
    // phases): documents staged easy→hard by unigram NLL — the
    // curriculum-learning data layout, with per-phase token budgets.
    // Phase cuts compare the exact integer-snapped NLL against its
    // own quartiles.
    QueryDef("q283_curriculum_phases",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val lm = LanguageModel.trainUnigram(docs, "text")
        val scored = LanguageModel
          .scoreNll(docs, "doc_id", "text", lm, alpha = 1.0)
          .where(col("n_tokens") > 0)
          .withColumn("nu", round(col("nll") * 1e4).cast("long"))
        val bounds = scored.agg(
          expr("percentile(nu, 0.25D)").as("b1"),
          expr("percentile(nu, 0.5D)").as("b2"),
          expr("percentile(nu, 0.75D)").as("b3"))
        scored.crossJoin(broadcast(bounds))
          .withColumn("phase", lit(1) +
            (col("nu").cast("double") > col("b1")).cast("int") +
            (col("nu").cast("double") > col("b2")).cast("int") +
            (col("nu").cast("double") > col("b3")).cast("int"))
          .groupBy("phase")
          .agg(count(lit(1)).as("n_docs"),
            round(sum("nu").cast("double") / lit(1e4) /
              count(lit(1)).cast("double"), 4).as("mean_nll"),
            sum("n_tokens").as("tokens"),
            round(sum("n_tokens").cast("double") /
              count(lit(1)).cast("double"), 2).as("mean_tokens"))
          .orderBy("phase")
      },
      Some("""WITH tok AS (
             |  SELECT doc_id, unnest(list_filter(
             |    string_split_regex(text, ' +'), t -> t <> '')) AS token
             |  FROM documents),
             |lm AS (SELECT token, count(*) AS cnt FROM tok
             |  GROUP BY token),
             |stats AS (SELECT CAST(sum(cnt) AS DOUBLE) AS t_total,
             |    CAST(count(*) AS DOUBLE) AS v_size FROM lm),
             |sc AS (SELECT t.doc_id, count(*) AS n_tokens,
             |    avg(-ln((coalesce(l.cnt, 0) + 1.0) /
             |      (s.t_total + 1.0 * s.v_size))) AS nll
             |  FROM tok t LEFT JOIN lm l USING (token)
             |  CROSS JOIN stats s
             |  GROUP BY t.doc_id),
             |sn AS (SELECT doc_id, n_tokens,
             |    CAST(round(round(nll, 4) * 10000.0) AS BIGINT) AS nu
             |  FROM sc WHERE n_tokens > 0),
             |bd AS (SELECT
             |    percentile_cont(0.25) WITHIN GROUP (ORDER BY nu) AS b1,
             |    percentile_cont(0.5) WITHIN GROUP (ORDER BY nu) AS b2,
             |    percentile_cont(0.75) WITHIN GROUP (ORDER BY nu) AS b3
             |  FROM sn),
             |ph AS (SELECT n_tokens, nu, 1 +
             |    (CASE WHEN CAST(nu AS DOUBLE) > b1 THEN 1 ELSE 0 END) +
             |    (CASE WHEN CAST(nu AS DOUBLE) > b2 THEN 1 ELSE 0 END) +
             |    (CASE WHEN CAST(nu AS DOUBLE) > b3 THEN 1 ELSE 0 END)
             |    AS phase
             |  FROM sn CROSS JOIN bd)
             |SELECT CAST(phase AS INT) AS phase, count(*) AS n_docs,
             |  round(CAST(sum(nu) AS DOUBLE) / 10000.0 /
             |    CAST(count(*) AS DOUBLE), 4) AS mean_nll,
             |  CAST(sum(n_tokens) AS BIGINT) AS tokens,
             |  round(CAST(sum(n_tokens) AS DOUBLE) /
             |    CAST(count(*) AS DOUBLE), 2) AS mean_tokens
             |FROM ph GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Kish design effect of q271's sampling weights (survey
    // statistics): deff = n·Σw²/(Σw)², effective sample size
    // n_eff = (Σw)²/Σw² — how much estimating power the unequal
    // weights cost. Exact integer weight moments.
    QueryDef("q284_design_effect",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val rates = Seq("src0" -> 100, "src1" -> 50, "src2" -> 10)
        val sampled = Sampling.stratifiedSample(docs, "doc_id",
          "source", rates, defaultPct = 25)
        val w = rates.foldRight(lit(10000L / 25): Column) {
          case ((stratum, pct), rest) =>
            when(col("source") === stratum, 10000L / pct).otherwise(rest)
        }
        sampled.select(w.as("w"))
          .agg(count(lit(1)).as("n_sample"), sum("w").as("_sw"),
            sum(col("w") * col("w")).as("_sww"))
          .select(col("n_sample"),
            round(col("_sw").cast("double") * col("_sw").cast("double") /
              col("_sww").cast("double"), 2).as("n_eff"),
            round(col("n_sample").cast("double") *
              col("_sww").cast("double") /
              (col("_sw").cast("double") * col("_sw").cast("double")),
              4).as("deff"))
      },
      Some(("""WITH s AS (SELECT source FROM (SELECT source,
             |      """ + Sampling.duckBucket("doc_id") + """ AS b
             |    FROM documents)
             |  WHERE b < CASE source WHEN 'src0' THEN 100
             |    WHEN 'src1' THEN 50 WHEN 'src2' THEN 10 ELSE 25 END),
             |w AS (SELECT CASE source WHEN 'src0' THEN 100
             |    WHEN 'src1' THEN 200 WHEN 'src2' THEN 1000
             |    ELSE 400 END AS w
             |  FROM s)
             |SELECT count(*) AS n_sample,
             |  round(CAST(sum(w) AS DOUBLE) * CAST(sum(w) AS DOUBLE) /
             |    CAST(sum(w * w) AS DOUBLE), 2) AS n_eff,
             |  round(CAST(count(*) AS DOUBLE) *
             |    CAST(sum(w * w) AS DOUBLE) /
             |    (CAST(sum(w) AS DOUBLE) * CAST(sum(w) AS DOUBLE)), 4)
             |    AS deff
             |FROM w""").stripMargin)),

    // Term-dispersion/burstiness profile (TextAnalysis
    // .termDispersion): Fano factor of per-doc counts over the whole
    // corpus — clumpy tokens (Fano ≫ 1) are the boilerplate/stuffing
    // candidates. Rank on the integer micro-snapped score.
    QueryDef("q285_term_dispersion",
      (s, dir) => TextAnalysis.termDispersion(
          t(s, dir, "documents"), "doc_id", "text", minDf = 5L, k = 20)
        .orderBy("token"),
      Some("""WITH tok AS (
             |  SELECT doc_id, unnest(list_filter(
             |    string_split_regex(text, ' +'), t -> t <> '')) AS token
             |  FROM documents),
             |pd AS (SELECT token, doc_id, count(*) AS c
             |  FROM tok GROUP BY 1, 2),
             |nn AS (SELECT count(*) AS nn FROM documents),
             |st AS (SELECT token, count(*) AS df, sum(c) AS cf,
             |    max(c) AS max_in_doc, sum(c * c) AS scc
             |  FROM pd GROUP BY 1 HAVING count(*) >= 5),
             |fn AS (SELECT token, df, cf, max_in_doc,
             |    CAST(round((CAST(scc AS DOUBLE) -
             |        CAST(cf AS DOUBLE) * CAST(cf AS DOUBLE) /
             |        CAST(nn AS DOUBLE)) /
             |      (CAST(nn AS DOUBLE) - 1.0) /
             |      (CAST(cf AS DOUBLE) / CAST(nn AS DOUBLE)) *
             |      1000000.0) AS BIGINT) AS fu
             |  FROM st CROSS JOIN nn),
             |rk AS (SELECT *, row_number() OVER (ORDER BY fu DESC,
             |    token) AS rk
             |  FROM fn)
             |SELECT token, CAST(df AS BIGINT) AS df,
             |  CAST(cf AS BIGINT) AS cf,
             |  CAST(max_in_doc AS BIGINT) AS max_in_doc,
             |  round(CAST(fu AS DOUBLE) / 1000000.0, 4) AS fano
             |FROM rk WHERE rk <= 20 ORDER BY token""".stripMargin)),

    // Cluster stability across thresholds (Components
    // .adjustedRandIndex, Hubert–Arabie): ARI between the 0.7- and
    // 0.8-Jaccard near-dup partitions — "how much does the
    // clustering move if I loosen the threshold", chance-corrected.
    // Exact integer pair binomials from the contingency table.
    QueryDef("q286_cluster_ari",
      (s, dir) => {
        val docs = t(s, dir, "documents").filter(col("doc_id") < 1000)
        // ONE minhash run: the 0.8 partition's pairs are exactly the
        // 0.7 pairs filtered (the threshold cut is the pipeline's
        // LAST step), so the second pipeline is a free predicate on
        // the checkpointed pair frame. Remaining cost (~13 s at
        // sf0.1) is the TWO component iterations — the q61 round
        // floor, twice, which is the query's honest price.
        val pairs7 = Dedup.minhashNearDups(docs, "doc_id", "text",
          k = 64, bands = 8, threshold = 0.7).localCheckpoint(true)
        def clusters(pairs: DataFrame, as: String) =
          Components.dedupClusters(docs, "doc_id", pairs,
              "id_a", "id_b")
            .select(col("doc_id"), col("component").as(as))
        Components.adjustedRandIndex(
          clusters(pairs7, "ca"),
          clusters(pairs7.where(col("jaccard") >= 0.8), "cb"),
          "doc_id", "ca", "cb")
      },
      Some("WITH RECURSIVE " + minhashVerifiedCtes + ",\n" +
        """p7 AS (SELECT id_a, id_b FROM verified WHERE jaccard >= 0.7),
          |e7 AS (SELECT id_a AS src, id_b AS dst FROM p7
          |  UNION ALL SELECT id_b, id_a FROM p7),
          |r7(id, lbl) AS (
          |  SELECT doc_id, doc_id FROM toks
          |  UNION
          |  SELECT e.dst, r.lbl FROM r7 r JOIN e7 e ON e.src = r.id),
          |c7 AS (SELECT id, min(lbl) AS ca FROM r7 GROUP BY 1),
          |p8 AS (SELECT id_a, id_b FROM verified WHERE jaccard >= 0.8),
          |e8 AS (SELECT id_a AS src, id_b AS dst FROM p8
          |  UNION ALL SELECT id_b, id_a FROM p8),
          |r8(id, lbl) AS (
          |  SELECT doc_id, doc_id FROM toks
          |  UNION
          |  SELECT e.dst, r.lbl FROM r8 r JOIN e8 e ON e.src = r.id),
          |c8 AS (SELECT id, min(lbl) AS cb FROM r8 GROUP BY 1),
          |j AS (SELECT c7.id, ca, cb FROM c7
          |  JOIN c8 ON c7.id = c8.id),
          |cont AS (SELECT sum(nij * (nij - 1) // 2) AS sij
          |  FROM (SELECT ca, cb, count(*) AS nij FROM j GROUP BY 1, 2)),
          |ra AS (SELECT count(*) AS nca,
          |    sum(ai * (ai - 1) // 2) AS sa
          |  FROM (SELECT ca, count(*) AS ai FROM j GROUP BY 1)),
          |rb AS (SELECT count(*) AS ncb,
          |    sum(bj * (bj - 1) // 2) AS sb
          |  FROM (SELECT cb, count(*) AS bj FROM j GROUP BY 1)),
          |nt AS (SELECT count(*) AS n FROM j)
          |SELECT CAST(n AS BIGINT) AS n_nodes,
          |  CAST(nca AS BIGINT) AS n_clusters_a,
          |  CAST(ncb AS BIGINT) AS n_clusters_b,
          |  round((CAST(sij AS DOUBLE) -
          |      CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE) /
          |      CAST(n * (n - 1) // 2 AS DOUBLE)) /
          |    ((CAST(sa AS DOUBLE) + CAST(sb AS DOUBLE)) / 2.0 -
          |      CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE) /
          |      CAST(n * (n - 1) // 2 AS DOUBLE)), 6) + 0.0 AS ari
          |FROM nt CROSS JOIN cont CROSS JOIN ra CROSS JOIN rb"""
          .stripMargin)),

    // Trailing rolling median (Rolling.rollingMedian): the robust
    // 7-day volume smoother — one outage day drags q79's mean for a
    // week, the median shrugs. Bounded shifted self-join, percentile
    // per (group, day).
    QueryDef("q287_rolling_median",
      (s, dir) => {
        val ev = t(s, dir, "events").withColumn("day",
          expr("unix_micros(cast(ts as timestamp)) div 86400000000"))
        Rolling.rollingMedian(ev, "event_type", "day", window = 7)
          .orderBy("g", "d")
      },
      Some("""WITH counted AS (
             |  SELECT event_type AS g, epoch_us(ts) // 86400000000 AS d,
             |    count(*) AS x
             |  FROM events GROUP BY 1, 2),
             |lims AS (SELECT g, min(d) AS lo, max(d) AS hi
             |  FROM counted GROUP BY 1),
             |grid AS (SELECT g, unnest(generate_series(lo, hi)) AS d
             |  FROM lims),
             |daily AS (SELECT grid.g, grid.d, coalesce(x, 0) AS x
             |  FROM grid LEFT JOIN counted
             |    ON grid.g = counted.g AND grid.d = counted.d),
             |contrib AS (SELECT g, d + j AS d, x AS xp
             |  FROM daily,
             |    (SELECT unnest(generate_series(0, 6)) AS j) js),
             |ag AS (SELECT daily.g, daily.d, count(*) AS n,
             |    sum(xp) AS s,
             |    percentile_cont(0.5) WITHIN GROUP (ORDER BY xp) AS med
             |  FROM daily JOIN contrib
             |    ON daily.g = contrib.g AND daily.d = contrib.d
             |  GROUP BY 1, 2)
             |SELECT g, d,
             |  round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 4)
             |    AS roll_mean,
             |  round(med, 4) AS roll_median
             |FROM ag WHERE n = 7 ORDER BY 1, 2""".stripMargin)),

    // Small-files compaction report (ops/FileAudit
    // .smallFilesReport): documents rewritten 8-way hash-partitioned
    // to a scratch dir, then audited by physical file via
    // input_file_name() — rows per file, imbalance, and the
    // compaction target. The oracle reads the SAME files with
    // DuckDB's filename=true scan.
    QueryDef("q288_small_files", {
      val tmp = sys.props("java.io.tmpdir") + "/graft_fileaudit"
      (s: SparkSession, dir: String) => {
        t(s, dir, "documents").repartition(8, col("doc_id"))
          .write.mode("overwrite").parquet(tmp)
        FileAudit.smallFilesReport(
          Seq(("documents_8way", s.read.parquet(tmp))),
          targetRows = 100L)
      }
    },
      Some {
        val tmp = sys.props("java.io.tmpdir") + "/graft_fileaudit"
        s"""WITH pf AS (SELECT filename AS f, count(*) AS n
             |  FROM read_parquet('$tmp/*.parquet', filename=true)
             |  GROUP BY 1),
             |ag AS (SELECT count(*) AS n_files, sum(n) AS n_rows,
             |    min(n) AS min_rows, max(n) AS max_rows,
             |    percentile_cont(0.5) WITHIN GROUP (ORDER BY n) AS med
             |  FROM pf)
             |SELECT 'documents_8way' AS table_name,
             |  CAST(n_files AS BIGINT) AS n_files,
             |  CAST(n_rows AS BIGINT) AS n_rows,
             |  CAST(min_rows AS BIGINT) AS min_rows,
             |  CAST(max_rows AS BIGINT) AS max_rows,
             |  round(med, 1) AS median_rows,
             |  CAST((max_rows * n_files * 1000000) // n_rows AS BIGINT)
             |    AS imbalance_ppm,
             |  CAST((n_rows + 99) // 100 AS BIGINT) AS target_files
             |FROM ag""".stripMargin
      }),

    // Wilson score interval on the daily purchase rate (Stats
    // .wilsonRate): the small-n-honest CI the naive ±z√(pq/n)
    // collapses on — a conversion monitor's per-day uncertainty.
    QueryDef("q289_wilson_rate", {
      val z = 1.959964
      (s: SparkSession, dir: String) => {
        val ev = t(s, dir, "events")
          .withColumn("day",
            expr("unix_micros(cast(ts as timestamp)) div 86400000000"))
          .withColumn("hit",
            (col("event_type") === "purchase").cast("int"))
        Stats.wilsonRate(ev, "day", "hit").orderBy("g")
      }
    },
      Some {
        val z = 1.959964
        val nD = "CAST(n AS DOUBLE)"
        val p = s"CAST(k AS DOUBLE) / $nD"
        val z2n = s"${z * z} / $nD"
        s"""WITH e AS (SELECT epoch_us(ts) // 86400000000 AS g,
             |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
             |      AS h
             |  FROM events),
             |a AS (SELECT g, count(*) AS n, sum(h) AS k
             |  FROM e GROUP BY 1)
             |SELECT g, CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
             |  round($p, 4) AS rate,
             |  round(($p + $z2n / 2.0) / (1.0 + $z2n) -
             |    ($z * sqrt($p * (1.0 - ($p)) / $nD +
             |      $z2n / (4.0 * $nD))) / (1.0 + $z2n), 4)
             |    AS wilson_lo,
             |  round(($p + $z2n / 2.0) / (1.0 + $z2n) +
             |    ($z * sqrt($p * (1.0 - ($p)) / $nD +
             |      $z2n / (4.0 * $nD))) / (1.0 + $z2n), 4)
             |    AS wilson_hi
             |FROM a ORDER BY 1""".stripMargin
      }),

    // Trained multinomial Naive Bayes (ops/NaiveBayes.evalSplit):
    // train on even doc_ids, score odd — the ONE-PASS classifier
    // (training is a count aggregate, no gradient rounds) every
    // fancier model must beat. Nano-snapped model weights make
    // inference an integer sum, replayed exactly by the oracle.
    QueryDef("q290_naive_bayes",
      (s, dir) => NaiveBayes.evalSplit(t(s, dir, "documents"),
          "doc_id", "lang", "text", col("doc_id") % 2 === 0)
        .orderBy("label"),
      Some("""WITH base AS (SELECT doc_id AS id, lang AS label, text,
             |    doc_id % 2 = 0 AS is_train
             |  FROM documents),
             |ttok AS (SELECT label, unnest(list_filter(
             |    string_split_regex(text, ' +'), t -> t <> '')) AS token
             |  FROM base WHERE is_train),
             |counts AS (SELECT label, token, count(*) AS c
             |  FROM ttok GROUP BY 1, 2),
             |cl AS (SELECT label, sum(c) AS cl FROM counts GROUP BY 1),
             |vocab AS (SELECT count(DISTINCT token) AS v FROM counts),
             |nt AS (SELECT count(*) AS nt FROM base WHERE is_train),
             |priors AS (SELECT label, CAST(round(ln(
             |    CAST(count(*) AS DOUBLE) / CAST(nt AS DOUBLE)) *
             |    1000000000.0) AS BIGINT) AS prior_n
             |  FROM base CROSS JOIN nt WHERE is_train
             |  GROUP BY label, nt),
             |model AS (SELECT counts.label, token, CAST(round(ln(
             |    (CAST(c AS DOUBLE) + 1.0) /
             |    (CAST(cl AS DOUBLE) + CAST(v AS DOUBLE))) *
             |    1000000000.0) AS BIGINT) AS w_n
             |  FROM counts JOIN cl ON counts.label = cl.label
             |  CROSS JOIN vocab),
             |defaults AS (SELECT label, CAST(round(ln(
             |    1.0 / (CAST(cl AS DOUBLE) + CAST(v AS DOUBLE))) *
             |    1000000000.0) AS BIGINT) AS def_n
             |  FROM cl CROSS JOIN vocab),
             |tt AS (SELECT id, label AS true_label, unnest(list_filter(
             |    string_split_regex(text, ' +'), t -> t <> '')) AS token
             |  FROM base WHERE NOT is_train),
             |cells AS (SELECT tt.id, dfl.label AS cand,
             |    coalesce(m.w_n, dfl.def_n) AS cell
             |  FROM tt CROSS JOIN defaults dfl
             |  LEFT JOIN model m
             |    ON m.label = dfl.label AND m.token = tt.token),
             |tsum AS (SELECT id, cand, sum(cell) AS toksum
             |  FROM cells GROUP BY 1, 2),
             |allc AS (SELECT id, base.label AS true_label,
             |    dfl.label AS cand
             |  FROM base CROSS JOIN defaults dfl WHERE NOT is_train),
             |sc AS (SELECT allc.id, allc.true_label, allc.cand,
             |    coalesce(ts.toksum, 0) + p.prior_n AS score
             |  FROM allc
             |  LEFT JOIN tsum ts
             |    ON ts.id = allc.id AND ts.cand = allc.cand
             |  JOIN priors p ON allc.cand = p.label),
             |preds AS (SELECT id, true_label, cand FROM (
             |    SELECT *, row_number() OVER (PARTITION BY id
             |      ORDER BY score DESC, cand) AS rk
             |    FROM sc)
             |  WHERE rk = 1)
             |SELECT true_label AS label, count(*) AS n_test,
             |  CAST(sum(CASE WHEN cand = true_label THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_correct,
             |  round(CAST(sum(CASE WHEN cand = true_label
             |      THEN 1 ELSE 0 END) AS DOUBLE) /
             |    CAST(count(*) AS DOUBLE), 4) AS accuracy
             |FROM preds GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Zipf rank–frequency fit (TextAnalysis.zipfFit): ln-ln OLS over
    // the top-200 tokens — natural text sits near slope −1; flat
    // slopes flag templated/synthetic text. The frequency twin of
    // q254's Heaps exponent.
    QueryDef("q291_zipf_fit",
      (s, dir) => TextAnalysis.zipfFit(
        t(s, dir, "documents"), "text", topK = 200),
      Some("""WITH tok AS (
             |  SELECT unnest(list_filter(
             |    string_split_regex(text, ' +'), t -> t <> '')) AS tok
             |  FROM documents),
             |counts AS (SELECT tok, count(*) AS c FROM tok GROUP BY 1),
             |tot AS (SELECT sum(c) AS total_tokens, count(*) AS vocab
             |  FROM counts),
             |rk AS (SELECT c, row_number() OVER (ORDER BY c DESC, tok)
             |    AS r
             |  FROM counts),
             |pts AS (SELECT
             |    CAST(round(ln(CAST(r AS DOUBLE)) * 1000000.0)
             |      AS BIGINT) AS x,
             |    CAST(round(ln(CAST(c AS DOUBLE)) * 1000000.0)
             |      AS BIGINT) AS y
             |  FROM rk WHERE r <= 200),
             |fit AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
             |    sum(x * x) AS sxx, sum(x * y) AS sxy,
             |    sum(y * y) AS syy
             |  FROM pts)
             |SELECT CAST(total_tokens AS BIGINT) AS total_tokens,
             |  CAST(vocab AS BIGINT) AS vocab,
             |  CAST(n AS BIGINT) AS top_k,
             |  round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
             |      CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
             |    (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
             |      CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 4) + 0.0
             |    AS zipf_slope,
             |  round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
             |      CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) *
             |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
             |      CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
             |    ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
             |      CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
             |     (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) -
             |      CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 4)
             |    AS zipf_r2
             |FROM tot CROSS JOIN fit""".stripMargin)),

    // Post-stratified treatment effect (Experiment.postStratified):
    // per-event-type contrasts weighted by stratum share — unbiased
    // when arm balance differs across strata (q237 detects that
    // failure; this is the fix). Micro-snapped share-weighted terms.
    QueryDef("q292_post_stratified",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .where(col("value").isNotNull)
          .withColumn("arm", pmod(Hashing.portableHash(
            concat(col("user_id").cast("string"), lit(":ps"))),
            lit(2L)).cast("int"))
          .withColumn("cents", round(col("value") * 100).cast("long"))
        Experiment.postStratified(ev, "event_type", "arm", "cents")
          .orderBy("s")
      },
      Some(s"""WITH ev AS (
             |  SELECT event_type AS s,
             |    CASE WHEN ${Hashing.duckPortableHash(
                    "CAST(user_id AS VARCHAR) || ':ps'")} % 2 = 1
             |      THEN 1 ELSE 0 END AS arm,
             |    CAST(round(value * 100) AS BIGINT) AS x
             |  FROM events WHERE value IS NOT NULL),
             |cells AS (SELECT s, arm, count(*) AS n, sum(x) AS sx,
             |    sum(x * x) AS sxx
             |  FROM ev GROUP BY 1, 2),
             |per AS (SELECT s, arm, n,
             |    CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
             |    (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) *
             |        CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) /
             |      (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))
             |      AS von
             |  FROM cells),
             |a0 AS (SELECT s, n AS n0, mean AS m0, von AS v0
             |  FROM per WHERE arm = 0),
             |a1 AS (SELECT s, n AS n1, mean AS m1, von AS v1
             |  FROM per WHERE arm = 1),
             |strata AS (SELECT a0.s, n0, m0, v0, n1, m1, v1,
             |    n0 + n1 AS n_s
             |  FROM a0 JOIN a1 ON a0.s = a1.s),
             |tot AS (SELECT sum(n_s) AS ntt FROM strata),
             |staged AS (SELECT *,
             |    m1 - m0 AS dd,
             |    CAST(round(CAST(n_s AS DOUBLE) / CAST(ntt AS DOUBLE) *
             |      (m1 - m0) * 1000000.0) AS BIGINT) AS wdn,
             |    CAST(round(CAST(n_s AS DOUBLE) / CAST(ntt AS DOUBLE) *
             |      (CAST(n_s AS DOUBLE) / CAST(ntt AS DOUBLE)) *
             |      (v0 + v1) * 1000000000.0) AS BIGINT) AS wvn
             |  FROM strata CROSS JOIN tot),
             |pl AS (SELECT sum(wdn) AS e, sum(wvn) AS v FROM staged)
             |SELECT s, CAST(n0 AS BIGINT) AS n0,
             |  CAST(n1 AS BIGINT) AS n1,
             |  CAST((n_s * 1000000) // ntt AS BIGINT) AS share_ppm,
             |  round(dd, 4) + 0.0 AS diff,
             |  round(CAST(e AS DOUBLE) / 1000000.0, 4) + 0.0 AS effect,
             |  round(sqrt(CAST(v AS DOUBLE) / 1000000000.0), 4) AS se
             |FROM staged CROSS JOIN pl ORDER BY s""".stripMargin)),

    // All-but-the-top whitening audit (Pca.whitenAudit): per-dim
    // variance before vs after q123's top-component removal — the
    // per-dimension evidence that the projection flattened the
    // dominant direction. Exact integer moments on snapped values.
    QueryDef("q293_whiten_audit",
      (s, dir) => Pca.whitenAudit(t(s, dir, "embeddings"),
          "vec_id", "embedding", dim = 64, iters = 3)
        .orderBy("pos"),
      Some("WITH " + pcaCtes(dim = 64, iters = 3) + ",\n" +
        """px AS (SELECT e.vec_id, e.embedding,
          |    list_sum(list_transform(e.embedding, (x, j) ->
          |      CAST(x AS DOUBLE) * v.vl[j]))
          |    - list_sum(list_transform(m.ml, (mm, j) -> mm * v.vl[j]))
          |      AS s
          |  FROM embeddings e CROSS JOIN pv3 v CROSS JOIN pml m
          |  WHERE len(e.embedding) = 64),
          |resid AS (SELECT ps.pos, CAST(round((round(
          |    CAST(p.embedding[CAST(ps.pos AS INT)] AS DOUBLE)
          |    - m.ml[CAST(ps.pos AS INT)]
          |    - p.s * v.vl[CAST(ps.pos AS INT)], 4) + 0.0) * 10000.0)
          |    AS BIGINT) AS xu
          |  FROM px p CROSS JOIN pml m CROSS JOIN pv3 v
          |  CROSS JOIN poss ps),
          |am AS (SELECT pos, count(*) AS na, sum(xu) AS sa,
          |    sum(xu * xu) AS ssa
          |  FROM resid GROUP BY 1),
          |braw AS (SELECT ps.pos, CAST(round(
          |    CAST(e.embedding[CAST(ps.pos AS INT)] AS DOUBLE) *
          |    1000000.0) AS BIGINT) AS xu
          |  FROM embeddings e CROSS JOIN poss ps
          |  WHERE len(e.embedding) = 64),
          |bm AS (SELECT pos, count(*) AS nb, sum(xu) AS sb,
          |    sum(xu * xu) AS ssb
          |  FROM braw GROUP BY 1),
          |vv AS (SELECT bm.pos, nb,
          |    (CAST(ssb AS DOUBLE) - CAST(sb AS DOUBLE) *
          |      CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE)) /
          |     (CAST(nb AS DOUBLE) - 1.0) / 1000000000000.0 AS varb,
          |    (CAST(ssa AS DOUBLE) - CAST(sa AS DOUBLE) *
          |      CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)) /
          |     (CAST(na AS DOUBLE) - 1.0) / 100000000.0 AS vara
          |  FROM bm JOIN am ON bm.pos = am.pos)
          |SELECT CAST(pos AS INT) AS pos, CAST(nb AS BIGINT) AS n,
          |  round(varb, 6) AS var_before,
          |  round(vara, 6) AS var_after,
          |  round(vara / varb, 4) AS ratio
          |FROM vv ORDER BY 1""".stripMargin)),

    // Similarity-weighted medoid per cluster (Components
    // .medoidPerCluster): keep the most CENTRAL copy (highest total
    // verified-pair similarity), not the oldest id — min-id can keep
    // an outlier hanging by one weak edge. Both keepers shown.
    QueryDef("q294_cluster_medoid",
      (s, dir) => {
        val docs = t(s, dir, "documents").filter(col("doc_id") < 1000)
        val pairs = Dedup.minhashNearDups(docs, "doc_id", "text",
          k = 64, bands = 8, threshold = 0.8).localCheckpoint(true)
        val clusters = Components.dedupClusters(docs, "doc_id",
          pairs, "id_a", "id_b")
        Components.medoidPerCluster(clusters, "doc_id",
            pairs, "id_a", "id_b", "jaccard")
          .orderBy("component")
      },
      Some("WITH RECURSIVE " + minhashVerifiedCtes + ",\n" +
        clusterChainCtes + ",\n" +
        """ends AS (SELECT id, sum(su) AS deg FROM (
          |    SELECT id_a AS id,
          |      CAST(round(jaccard * 10000.0) AS BIGINT) AS su
          |    FROM verified WHERE jaccard >= 0.8
          |    UNION ALL
          |    SELECT id_b,
          |      CAST(round(jaccard * 10000.0) AS BIGINT)
          |    FROM verified WHERE jaccard >= 0.8)
          |  GROUP BY 1),
          |cs AS (SELECT comp.id, comp.component, sizes.cluster_size,
          |    coalesce(deg, 0) AS deg
          |  FROM comp JOIN sizes USING (component)
          |  LEFT JOIN ends ON comp.id = ends.id
          |  WHERE cluster_size >= 2),
          |rk AS (SELECT *, row_number() OVER (PARTITION BY component
          |    ORDER BY deg DESC, id) AS rk,
          |    min(id) OVER (PARTITION BY component) AS mn
          |  FROM cs)
          |SELECT component, CAST(cluster_size AS BIGINT)
          |    AS cluster_size,
          |  id AS medoid_id,
          |  round(CAST(deg AS DOUBLE) / 10000.0, 4) AS medoid_sim_sum,
          |  mn AS minid_keeper
          |FROM rk WHERE rk = 1 ORDER BY component""".stripMargin)),

    // Exact histogram-intersection source overlap (SourceSim
    // .histIntersection): Σ min(p_a, p_b) over the shared
    // vocabulary — the exact twin of q169's KMV sketch matrix,
    // equi-joined on token (fan-out bounded by slices-per-token,
    // never |slices|²).
    QueryDef("q295_hist_intersection",
      (s, dir) => SourceSim.histIntersection(
          t(s, dir, "documents"), "source", "text", k = 10)
        .orderBy("src_a", "src_b"),
      Some("""WITH tok AS (
             |  SELECT source AS s, unnest(list_filter(
             |    string_split_regex(text, ' +'), t -> t <> '')) AS tok
             |  FROM documents),
             |counts AS (SELECT s, tok, count(*) AS c
             |  FROM tok GROUP BY 1, 2),
             |tot AS (SELECT s, sum(c) AS n FROM counts GROUP BY 1),
             |wp AS (SELECT counts.s, tok, c, n
             |  FROM counts JOIN tot ON counts.s = tot.s),
             |pr AS (SELECT a.s AS src_a, b.s AS src_b,
             |    CAST(round(least(
             |      CAST(a.c AS DOUBLE) / CAST(a.n AS DOUBLE),
             |      CAST(b.c AS DOUBLE) / CAST(b.n AS DOUBLE)) *
             |      1000000000.0) AS BIGINT) AS term
             |  FROM wp a JOIN wp b ON a.tok = b.tok AND a.s < b.s),
             |sc AS (SELECT src_a, src_b, count(*) AS n_common_tokens,
             |    sum(term) AS hi
             |  FROM pr GROUP BY 1, 2),
             |rk AS (SELECT *, row_number() OVER (ORDER BY hi DESC,
             |    src_a, src_b) AS rk
             |  FROM sc)
             |SELECT src_a, src_b,
             |  CAST(n_common_tokens AS BIGINT) AS n_common_tokens,
             |  round(CAST(hi AS DOUBLE) / 1000000000.0, 6)
             |    AS hist_intersection
             |FROM rk WHERE rk <= 10
             |ORDER BY src_a, src_b""".stripMargin)),

    // Session entry→exit matrix (Sessionize.entryExitMatrix): how
    // sessions begin vs how they end — landing/exit analytics at
    // event-type grain, deterministic min_by/max_by on the
    // (time, id) pair.
    QueryDef("q296_entry_exit",
      (s, dir) => Sessionize.entryExitMatrix(t(s, dir, "events"),
          Seq("user_id"), "ts", "event_id", "event_type",
          gapUs = 1800000000L)
        .orderBy("entry_type", "exit_type"),
      Some("""WITH sv AS (
             |  SELECT user_id, event_id, event_type, epoch_us(ts) AS tu
             |  FROM events),
             |lg AS (SELECT user_id, tu, event_id, event_type,
             |    CASE WHEN lag(tu) OVER w IS NULL
             |      OR tu - lag(tu) OVER w > 1800000000
             |      THEN 1 ELSE 0 END AS nw
             |  FROM sv WINDOW w AS (PARTITION BY user_id
             |    ORDER BY tu, event_id)),
             |ss AS (SELECT user_id, tu, event_id, event_type,
             |    sum(nw) OVER (PARTITION BY user_id
             |      ORDER BY tu, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS sid
             |  FROM lg),
             |fr AS (SELECT user_id, sid, event_type,
             |    row_number() OVER (PARTITION BY user_id, sid
             |      ORDER BY tu, event_id) AS a,
             |    row_number() OVER (PARTITION BY user_id, sid
             |      ORDER BY tu DESC, event_id DESC) AS z
             |  FROM ss),
             |per AS (SELECT user_id, sid,
             |    max(CASE WHEN a = 1 THEN event_type END)
             |      AS entry_type,
             |    max(CASE WHEN z = 1 THEN event_type END) AS exit_type
             |  FROM fr GROUP BY 1, 2),
             |m AS (SELECT entry_type, exit_type, count(*) AS n
             |  FROM per GROUP BY 1, 2),
             |tt AS (SELECT sum(n) AS tot FROM m)
             |SELECT entry_type, exit_type, CAST(n AS BIGINT)
             |    AS n_sessions,
             |  CAST((n * 1000000) // tot AS BIGINT) AS share_ppm
             |FROM m CROSS JOIN tt
             |ORDER BY 1, 2""".stripMargin)),

    // Bot-score composite: z(rate) − z(entropy) − z(burstiness) per
    // user over exact integer-snapped metrics — high-volume,
    // low-entropy, metronomic actors surface first. Composes q281's
    // entropy and q255's CV² at user grain; single-type users
    // (entropy null) coalesce to 0, the most bot-like value.
    QueryDef("q297_bot_score",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .withColumn("tu", expr("unix_micros(cast(ts as timestamp))"))
          .withColumn("day", expr("tu DIV 86400000000"))
        val vol = ev.groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_events"),
            countDistinct("day").as("n_days"))
          .withColumn("r_u", expr("(n_events * 1000000) DIV n_days"))
        val ent = Behavior.entityEntropy(ev, "user_id", "event_type")
          .select(col("entity").as("user_id"), col("entropy_norm"))
        val ia = Seasonal.interarrivalProfile(ev, "user_id", "tu",
            "event_id")
          .select(col("g").as("user_id"), col("cv2"))
        val base = vol.join(ent, Seq("user_id")).join(ia, Seq("user_id"))
          .where(col("n_events") >= 5)
          .withColumn("e_u",
            coalesce(round(col("entropy_norm") * 1e4), lit(0.0))
              .cast("long"))
          .withColumn("c_u", round(col("cv2") * 1e4).cast("long"))
          .localCheckpoint(true)
        val mom = base.agg(count(lit(1)).as("nn"),
          sum("r_u").as("sr"), sum(col("r_u") * col("r_u")).as("srr"),
          sum("e_u").as("se"), sum(col("e_u") * col("e_u")).as("see"),
          sum("c_u").as("sc"), sum(col("c_u") * col("c_u")).as("scc"))
        def dd(c: String) = col(c).cast("double")
        def z(x: String, s: String, ss: String) =
          (col(x).cast("double") - dd(s) / dd("nn")) /
            sqrt((dd(ss) - dd(s) * dd(s) / dd("nn")) /
              (dd("nn") - lit(1.0)))
        val scored = base.crossJoin(broadcast(mom))
          .withColumn("_score_n", round(
            (z("r_u", "sr", "srr") - z("e_u", "se", "see") -
              z("c_u", "sc", "scc")) * lit(1e6)).cast("long"))
        scored
          // Explicit top-10 (TakeOrderedAndProject), not a rank
          // window over the full user frame.
          .orderBy(col("_score_n").desc, col("user_id").asc)
          .limit(10)
          .select(col("user_id"), col("n_events"),
            round(col("r_u").cast("double") / lit(1e6), 2)
              .as("events_per_day"),
            col("entropy_norm"), col("cv2"),
            round(col("_score_n").cast("double") / lit(1e6), 4)
              .as("bot_score"))
          .orderBy("user_id")
      },
      Some(s"""WITH ev AS (SELECT user_id, event_id, event_type,
             |    epoch_us(ts) AS tu, epoch_us(ts) // 86400000000 AS d
             |  FROM events),
             |vol AS (SELECT user_id, count(*) AS n_events,
             |    count(DISTINCT d) AS n_days
             |  FROM ev GROUP BY 1),
             |vr AS (SELECT user_id, n_events,
             |    (n_events * 1000000) // n_days AS r_u
             |  FROM vol),
             |ec AS (SELECT user_id, event_type, count(*) AS c
             |  FROM ev GROUP BY 1, 2),
             |en AS (SELECT user_id, c,
             |    sum(c) OVER (PARTITION BY user_id) AS n
             |  FROM ec),
             |eh AS (SELECT user_id, max(n) AS n, count(*) AS k,
             |    sum(CAST(round(-(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
             |      * ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) *
             |      1000000000.0) AS BIGINT)) AS h
             |  FROM en GROUP BY 1),
             |ez AS (SELECT user_id, CASE WHEN k > 1 THEN
             |    CAST(round(round(CAST(h AS DOUBLE) / 1000000000.0 /
             |      ln(CAST(k AS DOUBLE)), 4) * 10000.0) AS BIGINT)
             |    ELSE 0 END AS e_u,
             |    CASE WHEN k > 1 THEN round(CAST(h AS DOUBLE) /
             |      1000000000.0 / ln(CAST(k AS DOUBLE)), 4)
             |      END AS entropy_norm
             |  FROM eh),
             |lg AS (SELECT user_id, tu, lag(tu) OVER (
             |    PARTITION BY user_id ORDER BY tu, event_id) AS prev
             |  FROM ev),
             |gg AS (SELECT user_id, (tu - prev) // 1000 AS gap
             |  FROM lg WHERE prev IS NOT NULL),
             |cvt AS (SELECT user_id,
             |    round((CAST(sum(gap * gap) AS DOUBLE) *
             |        CAST(count(*) AS DOUBLE) -
             |        CAST(sum(gap) AS DOUBLE) * CAST(sum(gap) AS DOUBLE))
             |      / (CAST(sum(gap) AS DOUBLE) *
             |         CAST(sum(gap) AS DOUBLE)), 4) AS cv2
             |  FROM gg GROUP BY 1),
             |base AS (SELECT vr.user_id, n_events, r_u, e_u,
             |    entropy_norm, cv2,
             |    CAST(round(cv2 * 10000.0) AS BIGINT) AS c_u
             |  FROM vr
             |  JOIN ez ON vr.user_id = ez.user_id
             |  JOIN cvt ON vr.user_id = cvt.user_id
             |  WHERE n_events >= 5),
             |mom AS (SELECT count(*) AS nn,
             |    sum(r_u) AS sr, sum(r_u * r_u) AS srr,
             |    sum(e_u) AS se, sum(e_u * e_u) AS see,
             |    sum(c_u) AS sc, sum(c_u * c_u) AS scc
             |  FROM base),
             |sc2 AS (SELECT base.*, CAST(round((
             |    (CAST(r_u AS DOUBLE) - CAST(sr AS DOUBLE) /
             |      CAST(nn AS DOUBLE)) /
             |    sqrt((CAST(srr AS DOUBLE) - CAST(sr AS DOUBLE) *
             |        CAST(sr AS DOUBLE) / CAST(nn AS DOUBLE)) /
             |      (CAST(nn AS DOUBLE) - 1.0)) -
             |    (CAST(e_u AS DOUBLE) - CAST(se AS DOUBLE) /
             |      CAST(nn AS DOUBLE)) /
             |    sqrt((CAST(see AS DOUBLE) - CAST(se AS DOUBLE) *
             |        CAST(se AS DOUBLE) / CAST(nn AS DOUBLE)) /
             |      (CAST(nn AS DOUBLE) - 1.0)) -
             |    (CAST(c_u AS DOUBLE) - CAST(sc AS DOUBLE) /
             |      CAST(nn AS DOUBLE)) /
             |    sqrt((CAST(scc AS DOUBLE) - CAST(sc AS DOUBLE) *
             |        CAST(sc AS DOUBLE) / CAST(nn AS DOUBLE)) /
             |      (CAST(nn AS DOUBLE) - 1.0))) * 1000000.0)
             |    AS BIGINT) AS score_n
             |  FROM base CROSS JOIN mom),
             |rk AS (SELECT *, row_number() OVER (ORDER BY score_n DESC,
             |    user_id) AS rk
             |  FROM sc2)
             |SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
             |  round(CAST(r_u AS DOUBLE) / 1000000.0, 2)
             |    AS events_per_day,
             |  entropy_norm, cv2,
             |  round(CAST(score_n AS DOUBLE) / 1000000.0, 4)
             |    AS bot_score
             |FROM rk WHERE rk <= 10 ORDER BY user_id""".stripMargin)),

    // LSH band-count recall sweep (the OTHER tuning axis next to
    // q219's threshold sweep): k=64 signatures banded 2/4/8 ways
    // against the exhaustive ground truth on the bounded doc_id<200
    // eval sample (the q103 discipline) — more bands = more
    // candidates = higher recall, and here the curve is MEASURED.
    QueryDef("q298_bands_recall",
      (s, dir) => {
        val docs = t(s, dir, "documents").filter(col("doc_id") < 200)
        val tk = Dedup.tokenIndex(docs, "doc_id", "text")
          .localCheckpoint(true)
        val a = tk.select(col("doc_id").as("id_a"),
          col("toks").as("ta"), col("n_toks").as("na"))
        val b = tk.select(col("doc_id").as("id_b"),
          col("toks").as("tb"), col("n_toks").as("nb"))
        val truth = a.join(b, col("id_a") < col("id_b"))
          .withColumn("inter",
            call_function("graft_overlap", col("ta"), col("tb")))
          .withColumn("j", round(col("inter").cast("double") /
            (col("na") + col("nb") - col("inter")), 4))
          .filter(col("j") >= 0.8)
          .agg(count(lit(1)).as("n_true"))
        Seq(2, 4, 8).map { bands =>
          val found = Dedup.minhashNearDups(docs, "doc_id", "text",
              k = 64, bands = bands, threshold = 0.8)
            .agg(count(lit(1)).as("n_found"))
          found.crossJoin(broadcast(truth))
            .select(lit(bands).as("bands"), col("n_true"),
              col("n_found"),
              expr("(n_found * 1000000) DIV n_true").as("recall_ppm"))
        }.reduce(_ unionByName _).orderBy("bands")
      },
      Some {
        def bandCte(b: Int) = {
          val r = 64 / b
          s"""bs$b AS (SELECT doc_id, bb.band_id,
             |    md5(array_to_string(list_transform(
             |      list_slice(sig, band_id * $r + 1, band_id * $r + $r),
             |      x -> CAST(x AS VARCHAR)), ',')) AS band_hash
             |  FROM sig, (SELECT unnest(generate_series(0, ${b - 1}))
             |    AS band_id) bb),
             |cd$b AS (SELECT DISTINCT l.doc_id AS id_a,
             |    r.doc_id AS id_b
             |  FROM bs$b l JOIN bs$b r
             |    ON l.band_id = r.band_id
             |    AND l.band_hash = r.band_hash
             |    AND l.doc_id < r.doc_id),
             |fd$b AS (SELECT count(*) AS n_found FROM (
             |    SELECT c.id_a FROM cd$b c
             |    JOIN toks a ON a.doc_id = c.id_a
             |    JOIN toks b2 ON b2.doc_id = c.id_b
             |    WHERE round(CAST(len(list_intersect(a.tk, b2.tk))
             |        AS DOUBLE) /
             |      len(list_distinct(list_concat(a.tk, b2.tk))), 4)
             |      >= 0.8))""".stripMargin
        }
        "WITH " + minhashSigCtes("", "doc_id < 200") + ",\n" +
          s"""tr AS (SELECT count(*) AS n_true
             |  FROM toks a JOIN toks b ON a.doc_id < b.doc_id
             |  WHERE round(CAST(len(list_intersect(a.tk, b.tk))
             |      AS DOUBLE) /
             |    len(list_distinct(list_concat(a.tk, b.tk))), 4)
             |    >= 0.8),
             |${bandCte(2)},
             |${bandCte(4)},
             |${bandCte(8)}
             |SELECT bands, CAST(n_true AS BIGINT) AS n_true,
             |  CAST(n_found AS BIGINT) AS n_found,
             |  CAST((n_found * 1000000) // n_true AS BIGINT)
             |    AS recall_ppm
             |FROM (
             |  SELECT 2 AS bands, n_true, n_found FROM fd2 CROSS JOIN tr
             |  UNION ALL
             |  SELECT 4, n_true, n_found FROM fd4 CROSS JOIN tr
             |  UNION ALL
             |  SELECT 8, n_true, n_found FROM fd8 CROSS JOIN tr)
             |ORDER BY bands""".stripMargin
      }),

    // Sketch-merge associativity, proven as data (the mergeability
    // contract every distributed sketch rests on): graft_hist built
    // on the even and odd halves, merged by elementwise addition,
    // must answer the same p50 as one sketch over everything.
    QueryDef("q299_sketch_merge",
      (s, dir) => {
        val docs = t(s, dir, "documents").where(col("n_chars").isNotNull)
        def sk(f: DataFrame) = f.groupBy("lang").agg(
          expr("graft_hist(CAST(n_chars AS DOUBLE), 0D, 1024D, 256)")
            .as("cts"))
        val merged = sk(docs.where(col("doc_id") % 2 === 0))
          .withColumnRenamed("cts", "ca")
          .join(sk(docs.where(col("doc_id") % 2 =!= 0))
            .withColumnRenamed("cts", "cb"), Seq("lang"))
          .select(col("lang"), zip_with(col("ca"), col("cb"),
            (x, y) => x + y).as("cts"))
        def crossing(f: DataFrame, out: String) = f
          .select(col("lang"), posexplode(col("cts")).as(Seq("b", "cnt")))
          .where(col("cnt") > 0)
          .withColumn("cum", sum("cnt").over(Window.partitionBy("lang")
            .orderBy("b")))
          .withColumn("total", sum("cnt").over(
            Window.partitionBy("lang")))
          .where(col("cum").cast("double") >=
            lit(0.5) * col("total").cast("double") &&
            (col("cum") - col("cnt")).cast("double") <
              lit(0.5) * col("total").cast("double"))
          .select(col("lang"), (round(lit(4.0) *
            (col("b").cast("double") +
              (lit(0.5) * col("total").cast("double") -
                (col("cum") - col("cnt")).cast("double")) /
                col("cnt").cast("double")), 4) + lit(0.0)).as(out))
        crossing(merged, "p50_merged")
          .join(crossing(sk(docs), "p50_whole"), Seq("lang"))
          .withColumn("equal",
            (col("p50_merged") === col("p50_whole")).cast("int"))
          .orderBy("lang")
      },
      Some("""WITH v AS (SELECT lang, doc_id,
             |    CAST(n_chars AS DOUBLE) AS v
             |  FROM documents WHERE n_chars IS NOT NULL),
             |b0 AS (SELECT lang, doc_id, CAST(least(greatest(
             |    floor(v / 4.0), 0), 255) AS BIGINT) AS b FROM v),
             |cm AS (SELECT lang, b, count(*) AS cnt
             |  FROM b0 GROUP BY 1, 2),
             |ccm AS (SELECT lang, b, cnt,
             |    sum(cnt) OVER (PARTITION BY lang ORDER BY b) AS cum,
             |    sum(cnt) OVER (PARTITION BY lang) AS total
             |  FROM cm),
             |pm AS (SELECT lang, round(4.0 * (CAST(b AS DOUBLE)
             |    + (0.5 * CAST(total AS DOUBLE) -
             |      CAST(cum - cnt AS DOUBLE)) / CAST(cnt AS DOUBLE)),
             |    4) + 0.0 AS p50
             |  FROM ccm
             |  WHERE CAST(cum AS DOUBLE) >= 0.5 * CAST(total AS DOUBLE)
             |    AND CAST(cum - cnt AS DOUBLE) <
             |      0.5 * CAST(total AS DOUBLE))
             |SELECT lang, p50 AS p50_merged, p50 AS p50_whole,
             |  1 AS equal
             |FROM pm ORDER BY lang""".stripMargin)),

    // q300 — release-readiness scorecard: five independent gates
    // (dup rate, dedup content shift, referential integrity,
    // k-anonymity, late-data exposure) composed from the library's
    // own operators into ONE pass/fail table — the "can we ship this
    // dataset" report a data-release process actually runs.
    QueryDef("q300_release_scorecard",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val row1 = docs
          .agg(count(lit(1)).as("_n"),
            countDistinct(md5(col("text"))).as("_d"))
          .select(lit("1_exact_dup_ppm").as("check"),
            expr("CAST(((_n - _d) * 1000000) DIV _n AS DOUBLE)")
              .as("value"),
            lit(100000.0).as("threshold"),
            expr("CAST(((_n - _d) * 1000000) DIV _n <= 100000 AS INT)")
              .as("pass"))
        val kept = docs.join(
          Dedup.exact(docs, "text", "doc_id")
            .select(col("keep_id").as("doc_id")), Seq("doc_id"),
          "left_semi")
        val row2 = Drift.jsTokenShift(docs, kept, "text")
          .select(lit("2_dedup_js_nats").as("check"),
            col("js_nats").as("value"), lit(0.05).as("threshold"),
            (col("js_nats") <= 0.05).cast("int").as("pass"))
        val li = t(s, dir, "lineitem"); val ord = t(s, dir, "orders")
        val cust = t(s, dir, "customer"); val pt = t(s, dir, "part")
        val sup = t(s, dir, "supplier"); val nat = t(s, dir, "nation")
        val row3 = {
          import graft.ops.Expectations.refIntegrity
          Seq(
            refIntegrity(li, "l_orderkey", ord, "o_orderkey", "a"),
            refIntegrity(li, "l_partkey", pt, "p_partkey", "b"),
            refIntegrity(li, "l_suppkey", sup, "s_suppkey", "c"),
            refIntegrity(ord, "o_custkey", cust, "c_custkey", "d"),
            refIntegrity(cust, "c_nationkey", nat, "n_nationkey", "e"))
            .reduce(_ unionByName _)
            .agg(sum("n_orphans").as("_o"))
            .select(lit("3_ref_orphans").as("check"),
              col("_o").cast("double").as("value"),
              lit(0.0).as("threshold"),
              (col("_o") === 0).cast("int").as("pass"))
        }
        val row4 = docs
          .groupBy(col("lang"), col("source"),
            expr("n_chars DIV 500").as("lb"))
          .agg(count(lit(1)).as("cs"))
          .agg(min("cs").as("_m"))
          .select(lit("4_k_anon_min_class").as("check"),
            col("_m").cast("double").as("value"),
            lit(5.0).as("threshold"),
            (col("_m") >= 5).cast("int").as("pass"))
        val ev = t(s, dir, "events")
          .withColumn("et", expr("unix_micros(cast(ts as timestamp))"))
          .withColumn("arr", col("et") +
            pmod(Hashing.portableHash(
              concat(col("event_id").cast("string"), lit(":arr"))),
              lit(14400000001L)) - lit(7200000000L))
        val row5 = Lateness.watermarkProfile(ev, "event_id", "et",
            "arr", bucketUs = 86400000000L, allowedUs = Seq(3600000000L))
          .select(lit("5_late_drop_ppm_1h").as("check"),
            col("drop_ppm").cast("double").as("value"),
            lit(10000.0).as("threshold"),
            (col("drop_ppm") <= 10000).cast("int").as("pass"))
        Seq(row1, row2, row3, row4, row5).reduce(_ unionByName _)
          .orderBy("check")
      },
      Some(s"""WITH r1 AS (SELECT '1_exact_dup_ppm' AS "check",
             |    CAST(((count(*) - count(DISTINCT md5(text))) *
             |      1000000) // count(*) AS DOUBLE) AS value,
             |    100000.0 AS threshold,
             |    CAST(((count(*) - count(DISTINCT md5(text))) *
             |      1000000) // count(*) <= 100000 AS INT) AS pass
             |  FROM documents),
             |tka AS (SELECT unnest(list_filter(
             |    string_split_regex(text, ' +'), t -> t <> '')) AS tok
             |  FROM documents),
             |ca AS (SELECT tok, count(*) AS c_a FROM tka GROUP BY 1),
             |keep AS (SELECT min(doc_id) AS doc_id FROM documents
             |  GROUP BY md5(text)),
             |tkb AS (SELECT unnest(list_filter(
             |    string_split_regex(text, ' +'), t -> t <> '')) AS tok
             |  FROM documents
             |  WHERE doc_id IN (SELECT doc_id FROM keep)),
             |cb AS (SELECT tok, count(*) AS c_b FROM tkb GROUP BY 1),
             |tta AS (SELECT sum(c_a) AS tokens_a FROM ca),
             |ttb AS (SELECT sum(c_b) AS tokens_b FROM cb),
             |jj AS (SELECT coalesce(c_a, 0) AS c_a,
             |    coalesce(c_b, 0) AS c_b
             |  FROM ca FULL JOIN cb USING (tok)),
             |terms AS (SELECT
             |    (CASE WHEN c_a > 0 THEN CAST(round(
             |      CAST(c_a AS DOUBLE) / tokens_a / 2.0 *
             |      ln((CAST(c_a AS DOUBLE) / tokens_a) /
             |        ((CAST(c_a AS DOUBLE) / tokens_a +
             |          CAST(c_b AS DOUBLE) / tokens_b) / 2.0)) *
             |      1000000000.0) AS BIGINT) ELSE 0 END
             |   + CASE WHEN c_b > 0 THEN CAST(round(
             |      CAST(c_b AS DOUBLE) / tokens_b / 2.0 *
             |      ln((CAST(c_b AS DOUBLE) / tokens_b) /
             |        ((CAST(c_a AS DOUBLE) / tokens_a +
             |          CAST(c_b AS DOUBLE) / tokens_b) / 2.0)) *
             |      1000000000.0) AS BIGINT) ELSE 0 END) AS t
             |  FROM jj CROSS JOIN tta CROSS JOIN ttb),
             |r2 AS (SELECT '2_dedup_js_nats' AS "check",
             |    round(CAST(sum(t) AS DOUBLE) / 1000000000.0, 6)
             |      AS value,
             |    0.05 AS threshold,
             |    CAST(round(CAST(sum(t) AS DOUBLE) / 1000000000.0, 6)
             |      <= 0.05 AS INT) AS pass
             |  FROM terms),
             |orp AS (SELECT
             |    (SELECT count(*) FROM lineitem
             |      WHERE l_orderkey IS NOT NULL AND l_orderkey NOT IN
             |        (SELECT DISTINCT o_orderkey FROM orders
             |         WHERE o_orderkey IS NOT NULL)) +
             |    (SELECT count(*) FROM lineitem
             |      WHERE l_partkey IS NOT NULL AND l_partkey NOT IN
             |        (SELECT DISTINCT p_partkey FROM part
             |         WHERE p_partkey IS NOT NULL)) +
             |    (SELECT count(*) FROM lineitem
             |      WHERE l_suppkey IS NOT NULL AND l_suppkey NOT IN
             |        (SELECT DISTINCT s_suppkey FROM supplier
             |         WHERE s_suppkey IS NOT NULL)) +
             |    (SELECT count(*) FROM orders
             |      WHERE o_custkey IS NOT NULL AND o_custkey NOT IN
             |        (SELECT DISTINCT c_custkey FROM customer
             |         WHERE c_custkey IS NOT NULL)) +
             |    (SELECT count(*) FROM customer
             |      WHERE c_nationkey IS NOT NULL AND c_nationkey NOT IN
             |        (SELECT DISTINCT n_nationkey FROM nation
             |         WHERE n_nationkey IS NOT NULL)) AS o),
             |r3 AS (SELECT '3_ref_orphans' AS "check",
             |    CAST(o AS DOUBLE) AS value, 0.0 AS threshold,
             |    CAST(o = 0 AS INT) AS pass
             |  FROM orp),
             |kan AS (SELECT min(cs) AS m FROM (
             |    SELECT count(*) AS cs FROM documents
             |    GROUP BY lang, source, n_chars // 500)),
             |r4 AS (SELECT '4_k_anon_min_class' AS "check",
             |    CAST(m AS DOUBLE) AS value, 5.0 AS threshold,
             |    CAST(m >= 5 AS INT) AS pass
             |  FROM kan),
             |le AS (SELECT event_id AS id, epoch_us(ts) AS et,
             |    epoch_us(ts) + ${Hashing.duckPortableHash(
                    "CAST(event_id AS VARCHAR) || ':arr'")}
             |      % 14400000001 - 7200000000 AS arr
             |  FROM events),
             |lw AS (SELECT id, et, arr,
             |    max(et) OVER (ORDER BY arr, id) AS wm
             |  FROM le),
             |ll AS (SELECT wm - et AS late_us FROM lw),
             |ld AS (SELECT count(*) AS n,
             |    sum(CASE WHEN late_us > 3600000000 THEN 1 ELSE 0 END)
             |      AS nd
             |  FROM ll),
             |r5 AS (SELECT '5_late_drop_ppm_1h' AS "check",
             |    CAST((nd * 1000000) // n AS DOUBLE) AS value,
             |    10000.0 AS threshold,
             |    CAST((nd * 1000000) // n <= 10000 AS INT) AS pass
             |  FROM ld)
             |SELECT * FROM r1 UNION ALL SELECT * FROM r2
             |UNION ALL SELECT * FROM r3 UNION ALL SELECT * FROM r4
             |UNION ALL SELECT * FROM r5
             |ORDER BY "check"""".stripMargin)),

    // Lead/lag cross-correlation (Seasonal.crossCorrelation): does
    // click volume LEAD purchase volume? r_k correlates clicks at t
    // with purchases at t+k over the shared day grid — the
    // two-series sibling of q228's ACF, same exact-integer
    // decomposition.
    QueryDef("q301_click_purchase_ccf",
      (s, dir) => {
        val ev = t(s, dir, "events").withColumn("day",
          expr("unix_micros(cast(ts as timestamp)) div 86400000000"))
        Seasonal.crossCorrelation(
            ev.where(col("event_type") === "click"),
            ev.where(col("event_type") === "purchase"),
            "day", maxLag = 7)
          .orderBy("lag")
      },
      Some("""WITH da AS (SELECT epoch_us(ts) // 86400000000 AS d,
             |    count(*) AS xa
             |  FROM events WHERE event_type = 'click' GROUP BY 1),
             |db AS (SELECT epoch_us(ts) // 86400000000 AS d,
             |    count(*) AS xb
             |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
             |j AS (SELECT coalesce(da.d, db.d) AS d,
             |    coalesce(xa, 0) AS xa, coalesce(xb, 0) AS xb
             |  FROM da FULL JOIN db ON da.d = db.d),
             |g AS (SELECT unnest(generate_series(
             |    (SELECT min(d) FROM j), (SELECT max(d) FROM j))) AS d),
             |se AS (SELECT g.d, coalesce(xa, 0) AS xa,
             |    coalesce(xb, 0) AS xb
             |  FROM g LEFT JOIN j ON g.d = j.d),
             |mom AS (SELECT count(*) AS nd, sum(xa) AS sa,
             |    sum(xa * xa) AS saa, sum(xb) AS sb,
             |    sum(xb * xb) AS sbb
             |  FROM se),
             |sh AS (SELECT lag, d - lag AS d, xb AS xbl
             |  FROM se,
             |    (SELECT unnest(generate_series(-7, 7)) AS lag) ll),
             |ag AS (SELECT lag, count(*) AS n_pairs,
             |    sum(xa * xbl) AS sxy, sum(xa) AS spa,
             |    sum(xbl) AS spb
             |  FROM se s JOIN sh ON s.d = sh.d GROUP BY 1)
             |SELECT CAST(lag AS INT) AS lag,
             |  CAST(n_pairs AS BIGINT) AS n_pairs,
             |  round((CAST(sxy AS DOUBLE) -
             |      CAST(sb AS DOUBLE) / CAST(nd AS DOUBLE) *
             |        CAST(spa AS DOUBLE) -
             |      CAST(sa AS DOUBLE) / CAST(nd AS DOUBLE) *
             |        CAST(spb AS DOUBLE) +
             |      CAST(n_pairs AS DOUBLE) *
             |        (CAST(sa AS DOUBLE) / CAST(nd AS DOUBLE)) *
             |        (CAST(sb AS DOUBLE) / CAST(nd AS DOUBLE))) /
             |    sqrt((CAST(saa AS DOUBLE) - CAST(sa AS DOUBLE) *
             |        CAST(sa AS DOUBLE) / CAST(nd AS DOUBLE)) *
             |      (CAST(sbb AS DOUBLE) - CAST(sb AS DOUBLE) *
             |        CAST(sb AS DOUBLE) / CAST(nd AS DOUBLE))), 4)
             |    + 0.0 AS ccf
             |FROM ag CROSS JOIN mom
             |WHERE sqrt((CAST(saa AS DOUBLE) - CAST(sa AS DOUBLE) *
             |    CAST(sa AS DOUBLE) / CAST(nd AS DOUBLE)) *
             |  (CAST(sbb AS DOUBLE) - CAST(sb AS DOUBLE) *
             |    CAST(sb AS DOUBLE) / CAST(nd AS DOUBLE))) > 0
             |ORDER BY 1""".stripMargin)),

    // Seasonality-adjusted anomaly days (q240's decomposition ∘
    // robust MAD gate): the 3 most anomalous REMAINDER days per
    // event type, flagged when beyond 3·1.4826·MAD — "weird after
    // accounting for trend and weekday", which q181's raw-volume
    // gate can't say.
    QueryDef("q302_seasonal_anomalies",
      (s, dir) => {
        val ev = t(s, dir, "events").withColumn("day",
          expr("unix_micros(cast(ts as timestamp)) div 86400000000"))
        val dec = Seasonal.decompose(ev, "event_type", "day")
          .withColumn("ru", round(col("remainder") * 1e4).cast("long"))
        val med = dec.groupBy("g")
          .agg(expr("percentile(ru, 0.5)").as("med"))
        val dev = dec.join(broadcast(med), Seq("g"))
          .withColumn("dev", abs(col("ru").cast("double") - col("med")))
        val mad = dev.groupBy("g")
          .agg(expr("percentile(dev, 0.5)").as("mad"))
        dev.join(broadcast(mad), Seq("g"))
          .withColumn("_rk", row_number().over(
            Window.partitionBy("g")
              .orderBy(col("dev").desc, col("d").asc)))
          .where(col("_rk") <= 3)
          .select(col("g"), col("d"), col("x"), col("remainder"),
            // dev is an exact half-integer in 1e4 units: 5 decimals
            // is EXACT (a 4-dp round can land on a .5 boundary where
            // the engines' decimal conversions disagree).
            round(col("dev") / lit(1e4), 5).as("deviation"),
            (col("dev") > lit(3.0) * lit(1.4826) * col("mad"))
              .cast("int").as("flag"))
          .orderBy("g", "d")
      },
      Some("""WITH counted AS (
             |  SELECT event_type AS g, epoch_us(ts) // 86400000000 AS d,
             |    count(*) AS x
             |  FROM events GROUP BY 1, 2),
             |lims AS (SELECT g, min(d) AS lo, max(d) AS hi
             |  FROM counted GROUP BY 1),
             |grid AS (SELECT g, unnest(generate_series(lo, hi)) AS d
             |  FROM lims),
             |daily AS (SELECT grid.g, grid.d, coalesce(x, 0) AS x
             |  FROM grid LEFT JOIN counted
             |    ON grid.g = counted.g AND grid.d = counted.d),
             |tw AS (SELECT g, d, x, sum(x) OVER w AS s7,
             |    count(*) OVER w AS n7
             |  FROM daily WINDOW w AS (PARTITION BY g ORDER BY d
             |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
             |tr AS (SELECT g, d, x,
             |    CAST(round((CAST(x AS DOUBLE) -
             |      CAST(s7 AS DOUBLE) / 7.0) * 1000000.0) AS BIGINT)
             |      AS detr_u,
             |    CAST((d + 3) % 7 + 1 AS INT) AS dow
             |  FROM tw WHERE n7 = 7),
             |se2 AS (SELECT g, dow, CAST(round(
             |    CAST(sum(detr_u) AS DOUBLE) / CAST(count(*) AS DOUBLE))
             |    AS BIGINT) AS seas_u
             |  FROM tr GROUP BY 1, 2),
             |rem AS (SELECT tr.g, tr.d, tr.x,
             |    round(CAST(detr_u - seas_u AS DOUBLE) / 1000000.0, 4)
             |      + 0.0 AS remainder
             |  FROM tr JOIN se2 ON tr.g = se2.g AND tr.dow = se2.dow),
             |ru AS (SELECT g, d, x, remainder,
             |    CAST(round(remainder * 10000.0) AS BIGINT) AS ru
             |  FROM rem),
             |md AS (SELECT g, percentile_cont(0.5)
             |    WITHIN GROUP (ORDER BY ru) AS med
             |  FROM ru GROUP BY 1),
             |dv AS (SELECT ru.g, d, x, remainder,
             |    abs(CAST(ru AS DOUBLE) - med) AS dev
             |  FROM ru JOIN md ON ru.g = md.g),
             |mad AS (SELECT g, percentile_cont(0.5)
             |    WITHIN GROUP (ORDER BY dev) AS mad
             |  FROM dv GROUP BY 1),
             |rk AS (SELECT dv.*, mad, row_number() OVER (
             |    PARTITION BY dv.g ORDER BY dev DESC, d) AS rk
             |  FROM dv JOIN mad ON dv.g = mad.g)
             |SELECT g, d, CAST(x AS BIGINT) AS x, remainder,
             |  round(dev / 10000.0, 5) AS deviation,
             |  CAST(dev > 3.0 * 1.4826 * mad AS INT) AS flag
             |FROM rk WHERE rk <= 3 ORDER BY g, d""".stripMargin)),

    // Conditional transition entropy (Markov.conditionalEntropy):
    // H(next|cur) vs H(next) — how much more predictable the next
    // action is GIVEN the current one; gain ≈ 0 would mean q248's
    // first-order chain adds nothing over base rates.
    QueryDef("q303_transition_entropy",
      (s, dir) => Markov.conditionalEntropy(t(s, dir, "events"),
          "user_id", "event_id", "event_type")
        .orderBy("state"),
      Some("""WITH tr AS (SELECT i, j, count(*) AS n_ij FROM (
             |    SELECT event_type AS j,
             |      lag(event_type) OVER (PARTITION BY user_id
             |        ORDER BY event_id) AS i
             |    FROM events)
             |  WHERE i IS NOT NULL GROUP BY 1, 2),
             |rws AS (SELECT i, n_ij,
             |    sum(n_ij) OVER (PARTITION BY i) AS n_i
             |  FROM tr),
             |hr AS (SELECT i AS state, max(n_i) AS n_out,
             |    sum(CAST(round(-(CAST(n_ij AS DOUBLE) /
             |      CAST(n_i AS DOUBLE)) * ln(CAST(n_ij AS DOUBLE) /
             |      CAST(n_i AS DOUBLE)) * 1000000000.0) AS BIGINT))
             |      AS h_row_n
             |  FROM rws GROUP BY 1),
             |tt AS (SELECT sum(n_out) AS nt FROM hr),
             |wtd AS (SELECT state, n_out, h_row_n,
             |    CAST(round(CAST(n_out AS DOUBLE) / CAST(nt AS DOUBLE) *
             |      (CAST(h_row_n AS DOUBLE) / 1000000000.0) *
             |      1000000000.0) AS BIGINT) AS w_n
             |  FROM hr CROSS JOIN tt),
             |hc AS (SELECT sum(w_n) AS hcn FROM wtd),
             |mg AS (SELECT sum(CAST(round(-(CAST(nj AS DOUBLE) /
             |      CAST(nt AS DOUBLE)) * ln(CAST(nj AS DOUBLE) /
             |      CAST(nt AS DOUBLE)) * 1000000000.0) AS BIGINT))
             |      AS hmn
             |  FROM (SELECT j, sum(n_ij) AS nj FROM tr GROUP BY 1)
             |  CROSS JOIN tt)
             |SELECT state, CAST(n_out AS BIGINT) AS n_out,
             |  round(CAST(h_row_n AS DOUBLE) / 1000000000.0, 4)
             |    AS h_row,
             |  round(CAST(hcn AS DOUBLE) / 1000000000.0, 4) AS h_cond,
             |  round(CAST(hmn AS DOUBLE) / 1000000000.0, 4)
             |    AS h_marginal,
             |  round((CAST(hmn AS DOUBLE) - CAST(hcn AS DOUBLE)) /
             |    1000000000.0, 4) + 0.0 AS info_gain
             |FROM wtd CROSS JOIN hc CROSS JOIN mg
             |ORDER BY state""".stripMargin)),

    // Tokenizer fertility by source (Bpe.train ∘ tokenCount): chars
    // per BPE token under the q106-trained vocab, per slice — the
    // "how expensive is this source to tokenize" readout that drives
    // per-domain token budgeting (high fertility = vocab mismatch).
    QueryDef("q304_bpe_fertility",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val rules = Bpe.train(docs, "text", merges = 6)
          .select("left", "right").collect()
          .map(r => (r.getString(0), r.getString(1))).toSeq
        docs.select(col("source"), length(col("text")).as("chars"),
            TextAnalysis.tokenCount(col("text")).cast("long").as("ws"),
            Bpe.tokenCount(col("text"), rules).as("bpe"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum("chars").as("n_chars"), sum("ws").as("n_ws_tokens"),
            sum("bpe").as("n_bpe_tokens"))
          .withColumn("fertility_bpe",
            round(col("n_chars").cast("double") /
              col("n_bpe_tokens").cast("double"), 4))
          .withColumn("bpe_per_word",
            round(col("n_bpe_tokens").cast("double") /
              col("n_ws_tokens").cast("double"), 4))
          .orderBy("source")
      },
      Some(s"""WITH ${bpeTrainCtes(6)},
             |${bpeEncodeCtes(6)}
             |SELECT d.source, count(*) AS n_docs,
             |  CAST(sum(length(d.text)) AS BIGINT) AS n_chars,
             |  CAST(sum(len(list_filter(
             |    string_split_regex(d.text, ' +'), t -> t <> '')))
             |    AS BIGINT) AS n_ws_tokens,
             |  CAST(sum(coalesce(b.n_tokens_bpe, 0)) AS BIGINT)
             |    AS n_bpe_tokens,
             |  round(CAST(sum(length(d.text)) AS DOUBLE) /
             |    CAST(sum(coalesce(b.n_tokens_bpe, 0)) AS DOUBLE), 4)
             |    AS fertility_bpe,
             |  round(CAST(sum(coalesce(b.n_tokens_bpe, 0)) AS DOUBLE) /
             |    CAST(sum(len(list_filter(
             |      string_split_regex(d.text, ' +'), t -> t <> '')))
             |      AS DOUBLE), 4) AS bpe_per_word
             |FROM documents d LEFT JOIN bpec b USING (doc_id)
             |GROUP BY d.source ORDER BY d.source""".stripMargin)),

    // Trend + weekday-seasonal 7-day forecast: ŷ(d) = OLS trend +
    // per-dow mean residual — the closed-form forecaster composed
    // from q249's fit and q240's seasonal means, extrapolated one
    // week past the horizon. Deterministic: exact moments, snapped
    // residual means, fixed-shape arithmetic.
    QueryDef("q305_volume_forecast",
      (s, dir) => {
        val ev = t(s, dir, "events").withColumn("day",
          expr("unix_micros(cast(ts as timestamp)) div 86400000000"))
        val counted = ev.groupBy(col("event_type").as("g"),
            col("day").as("d"))
          .agg(count(lit(1)).as("x"))
        val grid = counted.groupBy("g")
          .agg(min("d").as("_lo"), max("d").as("_hi"))
          .select(col("g"), col("_hi"),
            explode(sequence(col("_lo"), col("_hi"))).as("d"))
        val daily = grid.join(counted, Seq("g", "d"), "left")
          .withColumn("x", coalesce(col("x"), lit(0L)))
          .localCheckpoint(true)
        def dd(c: String) = col(c).cast("double")
        val fit = daily.groupBy("g").agg(
            max("_hi").as("hi"), count(lit(1)).as("n"),
            sum("d").as("sx"), sum("x").as("sy"),
            sum(col("d") * col("d")).as("sxx"),
            sum(col("d") * col("x")).as("sxy"))
          .withColumn("b", (dd("n") * dd("sxy") - dd("sx") * dd("sy")) /
            (dd("n") * dd("sxx") - dd("sx") * dd("sx")))
          .withColumn("a", (dd("sy") - col("b") * dd("sx")) / dd("n"))
        val seas = daily.join(broadcast(fit.select("g", "a", "b")),
            Seq("g"))
          .withColumn("_r_u",
            round((col("x").cast("double") - col("a") -
              col("b") * col("d").cast("double")) * lit(1e6))
              .cast("long"))
          .withColumn("dow",
            (pmod(col("d") + lit(3L), lit(7L)) + lit(1L)).cast("int"))
          .groupBy("g", "dow")
          .agg(expr("CAST(round(CAST(sum(_r_u) AS DOUBLE) / " +
            "CAST(count(1) AS DOUBLE)) AS BIGINT)").as("seas_u"))
        val future = fit
          .select(col("g"), col("a"), col("b"),
            explode(sequence(lit(1), lit(7))).as("k"),
            (col("hi") + col("k").cast("long")).as("d"))
          .withColumn("dow",
            (pmod(col("d") + lit(3L), lit(7L)) + lit(1L)).cast("int"))
        future.join(seas, Seq("g", "dow"))
          .select(col("g"), col("d"), col("dow"),
            round(col("a") + col("b") * col("d").cast("double") +
              col("seas_u").cast("double") / lit(1e6), 2)
              .as("forecast"))
          .orderBy("g", "d")
      },
      Some("""WITH counted AS (
             |  SELECT event_type AS g, epoch_us(ts) // 86400000000 AS d,
             |    count(*) AS x
             |  FROM events GROUP BY 1, 2),
             |lims AS (SELECT g, min(d) AS lo, max(d) AS hi
             |  FROM counted GROUP BY 1),
             |grid AS (SELECT g, hi, unnest(generate_series(lo, hi)) AS d
             |  FROM lims),
             |daily AS (SELECT grid.g, grid.hi, grid.d,
             |    coalesce(x, 0) AS x
             |  FROM grid LEFT JOIN counted
             |    ON grid.g = counted.g AND grid.d = counted.d),
             |fit AS (SELECT g, max(hi) AS hi, count(*) AS n,
             |    sum(d) AS sx, sum(x) AS sy, sum(d * d) AS sxx,
             |    sum(d * x) AS sxy
             |  FROM daily GROUP BY 1),
             |ab AS (SELECT g, hi,
             |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
             |     CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
             |    (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
             |     CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS b,
             |    (CAST(sy AS DOUBLE) -
             |     (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
             |      CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
             |     (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
             |      CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
             |     CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS a
             |  FROM fit),
             |seas AS (SELECT daily.g,
             |    CAST((daily.d + 3) % 7 + 1 AS INT) AS dow,
             |    CAST(round(CAST(sum(CAST(round((CAST(x AS DOUBLE) - a -
             |      b * CAST(daily.d AS DOUBLE)) * 1000000.0) AS BIGINT))
             |      AS DOUBLE) / CAST(count(*) AS DOUBLE)) AS BIGINT)
             |      AS seas_u
             |  FROM daily JOIN ab ON daily.g = ab.g
             |  GROUP BY 1, 2),
             |future AS (SELECT ab.g, a, b, hi + k AS d,
             |    CAST((hi + k + 3) % 7 + 1 AS INT) AS dow
             |  FROM ab, (SELECT unnest(generate_series(1, 7)) AS k) kk)
             |SELECT future.g, d, future.dow,
             |  round(a + b * CAST(d AS DOUBLE) +
             |    CAST(seas_u AS DOUBLE) / 1000000.0, 2) AS forecast
             |FROM future JOIN seas
             |  ON future.g = seas.g AND future.dow = seas.dow
             |ORDER BY 1, 2""".stripMargin)),

    // Persisted IVF+SQ8 index (Similarity.buildIvfSq8Index +
    // ivfSq8TopKFromIndex over a cell_id-bucketed table): q150's
    // search served OPERATIONALLY — the codes index is written once
    // (Layout.writeBucketed on cell_id, the vector mirror of q93's
    // persisted MinHash band index), read back from storage, and
    // probed with no re-training, no re-quantization, and no
    // index-side exchange (plan-asserted in LayoutSpec). Oracle is
    // q150's verbatim: the stored-index path must reproduce the
    // build-inline path bit for bit.
    QueryDef("q306_ivf_sq8_from_index",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val cents = Similarity.trainCentroids(
          emb, "vec_id", "embedding", k = 8, iters = 2)
          .localCheckpoint(true)
        val table = "graft_ivf_sq8_idx"
        Layout.replaceBucketed(s,
          Similarity.buildIvfSq8Index(emb, cents, "vec_id", "embedding"),
          table, "cell_id", buckets = 8)
        Similarity.ivfSq8TopKFromIndex(
          emb, emb.filter(col("vec_id").between(100, 104)), cents,
          Layout.table(s, table), "vec_id", "embedding",
          k = 3, nProbe = 2, shortlist = 20)
          .orderBy("query_id", "rank")
      },
      Some("WITH " + kmeansCtes(k = 8, iters = 2) + ",\n" +
        ivfSearchCtes("cent2", nProbe = 2, qLo = 100, qHi = 104) + ",\n" +
        ivfSq8Ctes("", shortlist = 20) + "\n" +
        """SELECT query_id, neighbor_id, "rank", round(cos, 4) + 0.0 AS cos
          |FROM sqranked WHERE "rank" <= 3
          |ORDER BY query_id, "rank"""".stripMargin)),

    // Baseline-JPEG pixel decode (Multimodal.contentFeatures through
    // the JDK's javax.imageio DCT decoder — the last image format off
    // the stub list; only the MP4 payload remains codec-bound). The
    // q149 oracle trick adapted to a LOSSY codec: fixture pixels are
    // constant per 8×8 block (MediaFixtures.jpegBytes), so every
    // block is DC-only, quality-1.0 quantization is exact, and the
    // round trip is bit-exact — the oracle recomputes the channel
    // means from the block formula without owning a decoder.
    QueryDef("q307_jpeg_decode",
      (s, dir) => {
        import s.implicits._
        val ids = t(s, dir, "documents")
          .select(col("doc_id").cast("long").as("id")).as[Long]
        val media = ids.map { id =>
          (id, MediaFixtures.jpegBytes(id, 16, 16), "image")
        }.toDF("id", "bytes", "media_type")
        Multimodal.contentFeatures(s, media).orderBy("id")
      },
      Some("""WITH bm AS (
             |  SELECT doc_id AS id,
             |    round(list_sum(list_transform(generate_series(0, 3),
             |      i -> (doc_id * 7 + 13 * (i % 2) + 29 * (i // 2))
             |        % 256)) / 4.0, 4) + 0.0 AS m
             |  FROM documents)
             |SELECT id, 'jpeg' AS kind, m AS f1, m AS f2, m AS f3
             |FROM bm ORDER BY id""".stripMargin)),

    // Persisted BM25 postings index (Retrieval.bm25Postings +
    // bm25TopKFromIndex): the FULL (term, doc, dl, tf) inverted index
    // written once, bucketed on term, beside the 1-row corpus-stats
    // table; probes prune the stored postings to the query's terms
    // (bucket pruning — the corpus is never re-tokenized) and score
    // identically to q69's inline path. Completes the persisted-index
    // triad: MinHash bands (q93), IVF+SQ8 codes (q306), lexical
    // postings (here). Oracle is q69's verbatim.
    QueryDef("q308_bm25_from_index",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        Layout.replaceBucketed(s,
          Retrieval.bm25Postings(docs, "doc_id", "text"),
          "graft_bm25_postings", "term", buckets = 8)
        Layout.replaceTable(s,
          Retrieval.bm25CorpusStats(docs, "doc_id", "text"),
          "graft_bm25_stats")
        Retrieval.bm25TopKFromIndex(
          Layout.table(s, "graft_bm25_postings"),
          Layout.table(s, "graft_bm25_stats"), "doc_id",
          queryTerms = Seq("spark", "join", "stream"), k = 10)
      },
      Some("WITH " + bm25RankedCtes(10) + "\n" +
        """SELECT doc_id, "rank", round(score, 4) AS score
          |FROM lexr ORDER BY "rank"""".stripMargin)),

    // PII scan (ops/Pii.scan): the release-gate scrub every public-web
    // corpus runs — email / E.164 phone / IPv4 / payment-card
    // detection, cards additionally Luhn-checked as a pure HOF
    // expression (valid vs failed reported separately). The synthetic
    // corpus carries no PII, so the query PLANTS it deterministically
    // from doc_id (the q149 fixture discipline) and the oracle replays
    // both the planting and every detector — including the mod-10
    // doubling — from the same closed forms.
    QueryDef("q309_pii_scan",
      (s, dir) => Pii.scan(piiAugmented(t(s, dir, "documents")),
          "doc_id", "text")
        .orderBy("doc_id"),
      Some("WITH " + piiAugCte() + ",\n" + piiScanCtes + "\n" +
        """SELECT doc_id,
          |  CAST(len(em) AS INT) AS n_emails,
          |  CAST(len(ph) AS INT) AS n_phones,
          |  CAST(len(ip) AS INT) AS n_ipv4,
          |  CAST(len(cdv) AS INT) AS n_cards_valid,
          |  CAST(len(cd) - len(cdv) AS INT) AS n_cards_invalid,
          |  len(em) + len(ph) + len(ip) + len(cd) > 0 AS has_pii
          |FROM scl ORDER BY doc_id""".stripMargin)),

    // PII redaction + per-source release report (Pii.redact /
    // sourceReport): the data-card table — per source, how many docs
    // carry PII and of which classes — plus the closed-loop residual
    // column: re-scanning the REDACTED text must find zero remaining
    // hits, proven per source inside the same query rather than
    // asserted in prose.
    QueryDef("q310_pii_redact_report",
      (s, dir) => {
        val aug = piiAugmented(t(s, dir, "documents"))
        val report = Pii.sourceReport(
          Pii.scan(aug, "doc_id", "text"), aug, "doc_id", "source")
        val residual = Pii.scan(
            Pii.redact(aug, "text").select(
              col("doc_id"), col("source"), col("redacted")),
            "doc_id", "redacted")
          .join(aug.select("doc_id", "source"), "doc_id")
          .groupBy("source")
          .agg(sum(when(col("has_pii"), 1L).otherwise(0L))
            .as("residual_docs"))
        report.join(residual, "source").orderBy("source")
      },
      Some("WITH " + piiAugCte() + ",\n" + piiScanCtes + ",\n" +
        s"""red AS (SELECT doc_id, source,
           |    regexp_replace(regexp_replace(regexp_replace(
           |      regexp_replace(t, '${Pii.emailRe}', '[EMAIL]', 'g'),
           |      '${Pii.ipv4Re}', '[IP]', 'g'),
           |      '${Pii.phoneRe}', '[PHONE]', 'g'),
           |      '${Pii.cardRe}', '[CARD]', 'g') AS rt
           |  FROM aug),
           |resid AS (SELECT source,
           |    CAST(sum(CASE WHEN
           |      len(regexp_extract_all(rt, '${Pii.emailRe}')) +
           |      len(regexp_extract_all(rt, '${Pii.phoneRe}')) +
           |      len(regexp_extract_all(rt, '${Pii.ipv4Re}')) +
           |      len(regexp_extract_all(rt, '${Pii.cardRe}')) > 0
           |      THEN 1 ELSE 0 END) AS BIGINT) AS residual_docs
           |  FROM red GROUP BY 1),
           |rep AS (SELECT aug.source,
           |    count(*) AS n_docs,
           |    CAST(sum(CASE WHEN len(em) + len(ph) + len(ip) + len(cd)
           |      > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_with_pii,
           |    CAST(sum(len(em)) AS BIGINT) AS emails,
           |    CAST(sum(len(ph)) AS BIGINT) AS phones,
           |    CAST(sum(len(ip)) AS BIGINT) AS ipv4s,
           |    CAST(sum(len(cdv)) AS BIGINT) AS cards_valid
           |  FROM scl JOIN aug USING (doc_id) GROUP BY 1)
           |SELECT rep.source, n_docs, n_docs_with_pii,
           |  round(CAST(n_docs_with_pii AS DOUBLE) /
           |    CAST(n_docs AS DOUBLE), 4) AS pii_rate,
           |  emails, phones, ipv4s, cards_valid, residual_docs
           |FROM rep JOIN resid ON rep.source = resid.source
           |ORDER BY rep.source""".stripMargin)),

    // Exact KNN-Shapley data valuation (ops/Valuation.knnShapley, Jia
    // et al. VLDB'19): the closed-form Shapley value of every training
    // vector for a 5-NN classifier over a 20-point validation sample —
    // rank-ordered indicator deltas, nano-snapped, suffix-summed. The
    // principled form of "which training examples help" that the DSIR
    // and quality-score tiers approximate; per-val values sum to the
    // K-NN utility by construction.
    QueryDef("q311_knn_shapley",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Valuation.knnShapley(
          emb.filter(!col("vec_id").between(100, 119)),
          emb.filter(col("vec_id").between(100, 119)),
          "vec_id", "embedding", "label", k = 5)
          .orderBy("vec_id")
      },
      Some(s"""WITH tr AS (SELECT vec_id AS tid, embedding AS tv,
             |    label AS tl
             |  FROM embeddings WHERE vec_id NOT BETWEEN 100 AND 119),
             |va AS (SELECT vec_id AS vid, embedding AS vv, label AS vl
             |  FROM embeddings WHERE vec_id BETWEEN 100 AND 119),
             |p AS (SELECT tid, tl, vid, vl,
             |    ${duckCos("tv", "vv")} AS c
             |  FROM tr CROSS JOIN va),
             |rk AS (SELECT *, row_number() OVER (PARTITION BY vid
             |      ORDER BY c DESC, tid) AS j,
             |    count(*) OVER (PARTITION BY vid) AS n FROM p),
             |iv AS (SELECT *, CASE WHEN tl = vl THEN 1 ELSE 0 END
             |    AS ind FROM rk),
             |ld AS (SELECT *, lead(ind) OVER (PARTITION BY vid
             |    ORDER BY j) AS indn FROM iv),
             |tm AS (SELECT vid, tid, tl, j, CAST(CASE WHEN j = n
             |    THEN round(1000000000.0 * CAST(ind AS DOUBLE) /
             |      CAST(n AS DOUBLE))
             |    ELSE round(1000000000.0 *
             |      (CAST(ind AS DOUBLE) - CAST(indn AS DOUBLE)) *
             |      CAST(least(5, j) AS DOUBLE) /
             |      (5.0 * CAST(j AS DOUBLE))) END AS BIGINT) AS tu
             |  FROM ld),
             |sx AS (SELECT vid, tid, tl, sum(tu) OVER (
             |    PARTITION BY vid ORDER BY j
             |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
             |    AS su FROM tm)
             |SELECT tid AS vec_id, tl AS label,
             |  count(*) AS n_val,
             |  round(CAST(sum(su) AS DOUBLE) /
             |    CAST(count(*) AS DOUBLE) / 1000000000.0, 6) AS value
             |FROM sx GROUP BY 1, 2 ORDER BY vec_id""".stripMargin)),

    // Homoglyph-skeleton dedup (ops/Homoglyph.dupGroups): the
    // exact-dedup evasion catch — every fourth document gets a spoofed
    // twin with Latin→Cyrillic confusables swapped in and a zero-width
    // space appended (invisible to md5 dedup, q25), and the TR39-style
    // skeleton (one translate pass: confusables→Latin exemplars,
    // invisibles deleted) groups each spoof back with its original.
    QueryDef("q312_homoglyph_dedup",
      (s, dir) => {
        val docs = t(s, dir, "documents").select("doc_id", "text")
        val spoof = docs.filter(col("doc_id") % 4 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"),
            concat(translate(col("text"), "aeopcx", "аеорсх"),
              lit("\u200B")).as("text"))
        Homoglyph.dupGroups(docs.unionByName(spoof), "doc_id", "text")
          .orderBy("skeleton_hash")
      },
      Some(s"""WITH spoof AS (
             |  SELECT doc_id + 1000000 AS doc_id,
             |    translate(text, 'aeopcx', 'аеорсх') || '​' AS text
             |  FROM documents WHERE doc_id % 4 = 0),
             |allr AS (SELECT doc_id, text FROM documents
             |  UNION ALL SELECT doc_id, text FROM spoof),
             |sk AS (SELECT doc_id, md5(lower(translate(text,
             |    '${graft.ops.Homoglyph.fromChars}',
             |    '${graft.ops.Homoglyph.toChars}'))) AS skeleton_hash
             |  FROM allr)
             |SELECT skeleton_hash, count(*) AS n,
             |  min(doc_id) AS min_id, max(doc_id) AS max_id
             |FROM sk GROUP BY 1 HAVING count(*) >= 2
             |ORDER BY skeleton_hash""".stripMargin)),

    // WAV periodicity by exact integer autocorrelation
    // (Multimodal.wavPeriodicity): R(L) = Σ s_k·s_{k+L} over int16
    // samples, argmax lag in [2, 16] (ties to the smallest), R/R(0)
    // normalization — pitch detection with no codec and no floating
    // transform, so the oracle replays every product from the
    // closed-form square-wave fixture (period 4 + 2·(id mod 6)).
    QueryDef("q313_wav_periodicity",
      (s, dir) => {
        import s.implicits._
        val ids = t(s, dir, "documents")
          .select(col("doc_id").cast("long").as("id")).as[Long]
        val media = ids.map(id =>
          (id, MediaFixtures.wavBytes(id, 64), "audio"))
          .toDF("id", "bytes", "media_type")
        Multimodal.wavPeriodicity(s, media, maxLag = 16).orderBy("id")
      },
      Some("""WITH w AS (SELECT doc_id AS id,
             |    4 + 2 * (doc_id % 6) AS p,
             |    1000 + 500 * (doc_id % 7) AS a
             |  FROM documents),
             |sm AS (SELECT id, list_transform(generate_series(0, 63),
             |    k -> CASE WHEN (k % p) * 2 < p THEN a ELSE -a END)
             |    AS s
             |  FROM w),
             |r0 AS (SELECT id,
             |    list_sum(list_transform(s, x -> x * x)) AS r0 FROM sm),
             |lg AS (SELECT unnest(generate_series(2, 16)) AS l),
             |rl AS (SELECT id, l,
             |    list_sum(list_transform(generate_series(1, 64 - l),
             |      j -> s[j] * s[j + l])) AS r
             |  FROM sm CROSS JOIN lg),
             |best AS (SELECT id, l, r, row_number() OVER (
             |    PARTITION BY id ORDER BY r DESC, l) AS rk FROM rl)
             |SELECT best.id, 'wav' AS kind, CAST(l AS INT) AS best_lag,
             |  round(CAST(r AS DOUBLE) / CAST(r0.r0 AS DOUBLE), 4) + 0.0
             |    AS periodicity
             |FROM best JOIN r0 USING (id) WHERE rk = 1
             |ORDER BY id""".stripMargin)),

    // Graded ranking evaluation (Retrieval.rankingEval): nDCG@10 and
    // MRR for the q69 BM25 run against the derived term-coverage
    // relevance oracle — the metric layer every IR system reports,
    // with nano-snapped DCG terms and the ideal ordering as a
    // TakeOrderedAndProject (never a corpus-wide window).
    QueryDef("q314_ranking_eval",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val terms = Seq("spark", "join", "stream")
        Retrieval.rankingEval(docs,
          Retrieval.bm25TopK(docs, "doc_id", "text", terms, k = 10),
          "doc_id", "text", terms, k = 10)
      },
      Some("WITH " + bm25RankedCtes(10) + ",\n" +
        """grade AS (SELECT tk.doc_id,
          |    CAST(len(list_intersect(list_distinct(tk),
          |      ['spark', 'join', 'stream'])) AS INT) AS grade
          |  FROM tk),
          |rdcg AS (SELECT
          |    coalesce(sum(CAST(round(1000000000.0 *
          |      (pow(2.0, CAST(grade AS DOUBLE)) - 1.0) /
          |      (ln(CAST("rank" AS DOUBLE) + 1.0) / ln(2.0)))
          |      AS BIGINT)), 0) AS dcg_u,
          |    coalesce(max(CASE WHEN grade > 0 THEN
          |      CAST(round(1000000000.0 / CAST("rank" AS DOUBLE))
          |        AS BIGINT) END), 0) AS rr_u
          |  FROM lexr JOIN grade USING (doc_id)),
          |ideal AS (SELECT grade, row_number() OVER (
          |    ORDER BY grade DESC, doc_id) AS irank
          |  FROM (SELECT doc_id, grade FROM grade WHERE grade > 0
          |        ORDER BY grade DESC, doc_id LIMIT 10)),
          |idcg AS (SELECT coalesce(sum(CAST(round(1000000000.0 *
          |      (pow(2.0, CAST(grade AS DOUBLE)) - 1.0) /
          |      (ln(CAST(irank AS DOUBLE) + 1.0) / ln(2.0)))
          |      AS BIGINT)), 0) AS idcg_u FROM ideal),
          |nrel AS (SELECT count(*) AS n_relevant FROM grade
          |  WHERE grade > 0)
          |SELECT 10 AS k, n_relevant,
          |  round(CAST(dcg_u AS DOUBLE) / 1000000000.0, 4) AS dcg,
          |  round(CAST(idcg_u AS DOUBLE) / 1000000000.0, 4) AS idcg,
          |  round(CASE WHEN idcg_u > 0 THEN CAST(dcg_u AS DOUBLE) /
          |    CAST(idcg_u AS DOUBLE) ELSE 0.0 END, 4) AS ndcg,
          |  round(CAST(rr_u AS DOUBLE) / 1000000000.0, 4) AS mrr
          |FROM nrel CROSS JOIN rdcg CROSS JOIN idcg""".stripMargin)),

    // IVF cell-occupancy report (over buildIvfSq8Index's assignment):
    // per-cell code counts, share, and the max/mean imbalance factor —
    // the operational metric that says when the frozen codebook has
    // drifted from the data and the q306 index needs a retrain (an
    // imbalanced index probes its hot cell at full fan-out).
    QueryDef("q315_ivf_occupancy",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val cents = Similarity.trainCentroids(
          emb, "vec_id", "embedding", k = 8, iters = 2)
        val occ = Similarity
          .buildIvfSq8Index(emb, cents, "vec_id", "embedding")
          .groupBy("cell_id").agg(count(lit(1)).as("n"))
        val tot = occ.agg(sum("n").as("_t"), count(lit(1)).as("_cells"),
          max("n").as("_mx"))
        occ.crossJoin(broadcast(tot))
          .select(col("cell_id"), col("n"),
            round(col("n").cast("double") / col("_t").cast("double"), 4)
              .as("share"),
            round(col("_mx").cast("double") * col("_cells").cast("double") /
              col("_t").cast("double"), 4).as("imbalance"))
          .orderBy("cell_id")
      },
      Some("WITH " + kmeansCtes(k = 8, iters = 2) + ",\n" +
        ivfSearchCtes("cent2", nProbe = 1, qLo = 0, qHi = -1) + ",\n" +
        """occ AS (SELECT cell_id, count(*) AS n FROM corpus GROUP BY 1),
          |tot AS (SELECT CAST(sum(n) AS BIGINT) AS t, count(*) AS cells,
          |    max(n) AS mx FROM occ)
          |SELECT cell_id, CAST(n AS BIGINT) AS n,
          |  round(CAST(n AS DOUBLE) / CAST(t AS DOUBLE), 4) AS share,
          |  round(CAST(mx AS DOUBLE) * CAST(cells AS DOUBLE) /
          |    CAST(t AS DOUBLE), 4) AS imbalance
          |FROM occ CROSS JOIN tot ORDER BY cell_id""".stripMargin)),

    // Kneser-Ney smoothed bigram NLL (LanguageModel.knBigramNll):
    // the Chen-Goodman benchmark smoothing — continuation counts as
    // the backoff distribution — trained on even doc_ids, scored on
    // odd, per language. Unscorable bigrams (P = 0) are counted, not
    // silently dropped; every -ln P is nano-snapped so the oracle
    // replays identical integers.
    QueryDef("q316_kneser_ney",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        LanguageModel.knBigramNll(
          docs.filter(col("doc_id") % 2 === 0),
          docs.filter(col("doc_id") % 2 === 1),
          "lang", "text", d = 0.75)
          .orderBy("lang")
      },
      Some("""WITH trtk AS (SELECT list_filter(
             |    string_split_regex(text, ' +'), t -> t <> '') AS tk
             |  FROM documents WHERE doc_id % 2 = 0),
             |trbg AS (SELECT tk[j - 1] AS prev, tk[j] AS cur FROM (
             |  SELECT tk, unnest(generate_series(2, len(tk))) AS j
             |  FROM trtk)),
             |bi AS (SELECT prev, cur, count(*) AS bcnt FROM trbg
             |  GROUP BY 1, 2),
             |ctx AS (SELECT prev, sum(bcnt) AS c1, count(*) AS n1fwd
             |  FROM bi GROUP BY 1),
             |cont AS (SELECT cur, count(*) AS ncont FROM bi GROUP BY 1),
             |bt AS (SELECT count(*) AS b FROM bi),
             |tetk AS (SELECT lang, list_filter(
             |    string_split_regex(text, ' +'), t -> t <> '') AS tk
             |  FROM documents WHERE doc_id % 2 = 1),
             |tebg AS (SELECT lang, tk[j - 1] AS prev, tk[j] AS cur
             |  FROM (SELECT lang, tk,
             |    unnest(generate_series(2, len(tk))) AS j FROM tetk)),
             |sc AS (SELECT lang,
             |    CASE WHEN c1 IS NOT NULL THEN
             |      greatest(CAST(coalesce(bcnt, 0) AS DOUBLE) - 0.75, 0.0)
             |        / CAST(c1 AS DOUBLE) +
             |      0.75 * CAST(n1fwd AS DOUBLE) / CAST(c1 AS DOUBLE) *
             |        (CAST(coalesce(ncont, 0) AS DOUBLE) /
             |         CAST(b AS DOUBLE))
             |    ELSE CAST(coalesce(ncont, 0) AS DOUBLE) /
             |      CAST(b AS DOUBLE) END AS p
             |  FROM tebg
             |  LEFT JOIN bi USING (prev, cur)
             |  LEFT JOIN ctx USING (prev)
             |  LEFT JOIN cont USING (cur)
             |  CROSS JOIN bt),
             |snl AS (SELECT lang, CASE WHEN p > 0 THEN
             |    CAST(round(-ln(p) * 1000000000.0) AS BIGINT) END AS nu
             |  FROM sc)
             |SELECT lang, count(*) AS n_bigrams,
             |  count(nu) AS n_scored,
             |  count(*) - count(nu) AS n_skipped,
             |  round(CAST(sum(nu) AS DOUBLE) / 1000000000.0 /
             |    CAST(count(nu) AS DOUBLE), 4) AS kn_nll
             |FROM snl GROUP BY 1 ORDER BY lang""".stripMargin)),

    // S-tier: XML sink + source round-trip (sources/Xml — Spark 4's
    // NATIVE xml data source, the spark-xml donation). Text crosses
    // the entity-escaping boundary (&, <, > in documents), so the
    // re-read aggregate hash-matching the oracle — which reads the
    // ORIGINAL parquet — proves escape/unescape and the declared
    // types survive the trip. Completes the boundary-format matrix:
    // CSV, JSONL, ORC, Excel, XML.
    QueryDef("q317_xml_roundtrip",
      (s, dir) => {
        val tmp = sys.props("java.io.tmpdir") + "/graft_xml_roundtrip"
        Xml.write(t(s, dir, "documents")
          .select("doc_id", "text", "lang", "source", "n_chars"), tmp)
        Xml.read(s, tmp, StructType.fromDDL(
            "doc_id BIGINT, text STRING, lang STRING, source STRING, " +
              "n_chars BIGINT"))
          .groupBy("lang", "source")
          .agg(count(lit(1)).as("n"),
            sum(length(col("text"))).as("chars"),
            sum("n_chars").as("n_chars_sum"))
          .orderBy("lang", "source")
      },
      Some("""SELECT lang, source, count(*) AS n,
             |  CAST(sum(length(text)) AS BIGINT) AS chars,
             |  CAST(sum(n_chars) AS BIGINT) AS n_chars_sum
             |FROM documents GROUP BY lang, source
             |ORDER BY lang, source""".stripMargin)),

    // Release manifest — the capstone composite over the round-12
    // governance tier, proving the ops compose into one data-card
    // row: raw count → exact-dup collapse (md5) → homoglyph-skeleton
    // collapse → near-dup cluster count (the q61 chain) → PII-bearing
    // docs (on the q309 planted fixture) → releasable keepers (one
    // min-id doc per near-dup cluster whose enriched text carries no
    // PII). Every stage reuses a proven operator and its proven
    // oracle CTEs; the manifest is where a real pipeline's stages
    // reconcile.
    QueryDef("q318_release_manifest",
      (s, dir) => {
        val full = t(s, dir, "documents").filter(col("doc_id") < 1000)
        val slice = full.select("doc_id", "text")
        val aug = piiAugmented(full)
        val pii = Pii.scan(aug, "doc_id", "text").localCheckpoint(true)
        // r13: probe the persisted cluster map (ensureNearDupIndex)
        // instead of re-running minhash + component iteration inline.
        val clusters = ndClusters(s, dir).localCheckpoint(true)
        val keepers = clusters.groupBy("component")
          .agg(min(col("doc_id")).as("doc_id"))
        val nRaw = slice.agg(count(lit(1)).as("n_raw"))
        val nExact = slice.agg(
          countDistinct(md5(col("text"))).as("n_exact_unique"))
        val nSkel = slice.agg(countDistinct(
          md5(Homoglyph.skeleton(col("text")))).as("n_skeleton_unique"))
        val nCl = clusters.agg(
          countDistinct(col("component")).as("n_clusters"))
        val nPii = pii.agg(sum(when(col("has_pii"), 1L).otherwise(0L))
          .as("n_pii_docs"))
        val nRel = keepers.join(pii, "doc_id")
          .where(!col("has_pii"))
          .agg(count(lit(1)).as("n_release_keepers"))
        nRaw.crossJoin(broadcast(nExact)).crossJoin(broadcast(nSkel))
          .crossJoin(broadcast(nCl)).crossJoin(broadcast(nPii))
          .crossJoin(broadcast(nRel))
      },
      Some("WITH RECURSIVE " + minhashVerifiedCtes + ",\n" +
        clusterChainCtes + ",\n" +
        piiAugCte("doc_id < 1000") + ",\n" + piiScanCtes + ",\n" +
        s"""raw AS (SELECT count(*) AS n_raw FROM documents
           |  WHERE doc_id < 1000),
           |ex AS (SELECT count(DISTINCT md5(text)) AS n_exact_unique
           |  FROM documents WHERE doc_id < 1000),
           |skx AS (SELECT count(DISTINCT md5(lower(translate(text,
           |    '${graft.ops.Homoglyph.fromChars}',
           |    '${graft.ops.Homoglyph.toChars}'))))
           |    AS n_skeleton_unique
           |  FROM documents WHERE doc_id < 1000),
           |ncl AS (SELECT count(DISTINCT component) AS n_clusters
           |  FROM comp),
           |keepers AS (SELECT component, min(id) AS doc_id FROM comp
           |  GROUP BY 1),
           |piid AS (SELECT CAST(sum(CASE WHEN
           |    len(em) + len(ph) + len(ip) + len(cd) > 0
           |    THEN 1 ELSE 0 END) AS BIGINT) AS n_pii_docs FROM scl),
           |rel AS (SELECT count(*) AS n_release_keepers
           |  FROM keepers JOIN scl USING (doc_id)
           |  WHERE len(em) + len(ph) + len(ip) + len(cd) = 0)
           |SELECT n_raw, n_exact_unique, n_skeleton_unique, n_clusters,
           |  n_pii_docs, n_release_keepers
           |FROM raw CROSS JOIN ex CROSS JOIN skx CROSS JOIN ncl
           |CROSS JOIN piid CROSS JOIN rel""".stripMargin)),

    // Multi-source BFS contamination radius (Components.bfsDistance):
    // hop-distance rings around flagged seed documents over the
    // near-dup graph — membership says WHETHER a doc links to a seed,
    // hops says HOW CLOSE (delta-frontier rounds, one edges⋈frontier
    // shuffle each, unreachable docs reported as a null ring rather
    // than dropped). The oracle unrolls the same three frontiers.
    QueryDef("q319_bfs_contamination",
      (s, dir) => {
        val slice = t(s, dir, "documents")
          .filter(col("doc_id") < 1000).select("doc_id", "text")
        val pairs = Dedup.minhashNearDups(slice, "doc_id", "text",
          k = 64, bands = 8, threshold = 0.8)
        Components.bfsDistance(slice, "doc_id", pairs, "id_a", "id_b",
            slice.filter(col("doc_id") % 100 === 0).select("doc_id"),
            maxHops = 3)
          .groupBy("hops").agg(count(lit(1)).as("n"))
          .orderBy(col("hops").asc_nulls_first)
      },
      Some("WITH " + minhashVerifiedCtes + ",\n" + pairsEdgesCtes + ",\n" +
        """d0 AS (SELECT DISTINCT doc_id AS id FROM documents
          |  WHERE doc_id < 1000 AND doc_id % 100 = 0),
          |f1 AS (SELECT DISTINCT e.dst AS id FROM edges e
          |  JOIN d0 ON e.src = d0.id
          |  WHERE e.dst NOT IN (SELECT id FROM d0)),
          |s1 AS (SELECT id FROM d0 UNION ALL SELECT id FROM f1),
          |f2 AS (SELECT DISTINCT e.dst AS id FROM edges e
          |  JOIN f1 ON e.src = f1.id
          |  WHERE e.dst NOT IN (SELECT id FROM s1)),
          |s2 AS (SELECT id FROM s1 UNION ALL SELECT id FROM f2),
          |f3 AS (SELECT DISTINCT e.dst AS id FROM edges e
          |  JOIN f2 ON e.src = f2.id
          |  WHERE e.dst NOT IN (SELECT id FROM s2)),
          |hopped AS (SELECT id, 0 AS hops FROM d0
          |  UNION ALL SELECT id, 1 FROM f1
          |  UNION ALL SELECT id, 2 FROM f2
          |  UNION ALL SELECT id, 3 FROM f3),
          |alln AS (SELECT doc_id AS id FROM documents
          |  WHERE doc_id < 1000)
          |SELECT CAST(hops AS INT) AS hops, count(*) AS n
          |FROM alln LEFT JOIN hopped USING (id)
          |GROUP BY 1 ORDER BY hops NULLS FIRST""".stripMargin)),

    // Isotonic calibration of the k-NN reliability diagram
    // (Isotonic.calibrate over q277's vote bins): PAV via its
    // closed-form minimax identity — interval averages from integer
    // prefix sums over the bounded bin frame, max-of-min per bin —
    // giving the monotone probability corrector (Zadrozny-Elkan)
    // without a sequential scan in either engine.
    QueryDef("q320_isotonic_calibration",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val pred = Similarity.knnPredict(emb,
          emb.filter(col("vec_id") < 200), "vec_id", "embedding",
          "label", k = 5)
        val bins = pred.groupBy("n_votes").agg(
          sum(when(col("pred_label") === col("true_label"), 1L)
            .otherwise(0L)).as("n_correct"),
          count(lit(1)).as("n"))
        Isotonic.calibrate(bins, "n_votes", "n_correct", "n")
          .orderBy("n_votes")
      },
      Some("WITH " + knnCtes(200, 5) + ",\n" +
        """bins AS (SELECT n_votes, count(*) AS n,
          |    sum(CASE WHEN pred = t_label THEN 1 ELSE 0 END)
          |      AS n_correct
          |  FROM knp GROUP BY 1),
          |pre AS (SELECT CAST(n_votes AS DOUBLE) AS x,
          |    n_correct AS s, n AS t,
          |    row_number() OVER (ORDER BY n_votes) AS i,
          |    sum(n_correct) OVER (ORDER BY n_votes) AS cs,
          |    sum(n) OVER (ORDER BY n_votes) AS ct
          |  FROM bins),
          |iv AS (SELECT pj.i AS j, pk.i AS k,
          |    CAST(pk.cs - (pj.cs - pj.s) AS DOUBLE) /
          |    CAST(pk.ct - (pj.ct - pj.t) AS DOUBLE) AS iavg
          |  FROM pre pj JOIN pre pk ON pj.i <= pk.i),
          |mi AS (SELECT p.i, iv.j, min(iavg) AS m FROM pre p
          |  JOIN iv ON iv.j <= p.i AND iv.k >= p.i GROUP BY 1, 2),
          |ft AS (SELECT i, max(m) AS iso FROM mi GROUP BY 1)
          |SELECT x AS n_votes, CAST(t AS BIGINT) AS trials,
          |  round(CAST(s AS DOUBLE) / CAST(t AS DOUBLE), 6) AS rate,
          |  round(iso, 6) AS iso_rate
          |FROM pre JOIN ft USING (i) ORDER BY n_votes""".stripMargin))
  )

  /** Bradley–Terry MM iteration oracle chain (q323): expects `games`
    * (a, b, m both orientations) and `wins` (item, wins) CTEs
    * upstream; emits `it0..it<iters>` with `pi` normalized to sum 1
    * each round — the exact twin of [[BradleyTerry.fit]]'s loop.
    */
  private def btCtes(iters: Int): String = {
    // MATERIALIZED throughout: each round references the previous
    // twice, so default CTE inlining re-expands the whole chain 2^k
    // times (observed as DuckDB "too many open files" at k = 8).
    val rounds = (1 to iters).map { k =>
      s"""d$k AS MATERIALIZED (SELECT g.a AS item,
         |    sum(CAST(g.m AS DOUBLE) / (pa.pi + pb.pi)) AS d
         |  FROM games g
         |  JOIN it${k - 1} pa ON pa.item = g.a
         |  JOIN it${k - 1} pb ON pb.item = g.b
         |  GROUP BY 1),
         |r$k AS MATERIALIZED (
         |  SELECT w.item, CAST(w.wins AS DOUBLE) / d.d AS raw
         |  FROM wins w JOIN d$k d USING (item)),
         |it$k AS MATERIALIZED (
         |  SELECT item, raw / (SELECT sum(raw) FROM r$k) AS pi
         |  FROM r$k)""".stripMargin
    }
    ("it0 AS MATERIALIZED (SELECT DISTINCT a AS item, 1.0 AS pi FROM games)"
      +: rounds).mkString(",\n")
  }

  /** q342 oracle: unrolled IPF rounds over the lang × source grid.
    * MATERIALIZED for the btCtes reason (each round reads the prior
    * one twice). Integer ppb arithmetic mirrors Mixing.ipfRake: w·t
    * products ≤ 1e18 fit BIGINT; DuckDB sums promote to HUGEINT,
    * which stays exact and is cast back at the end.
    */
  private def ipfCtes(rounds: Int): String = {
    val setup =
      """rt AS MATERIALIZED (
        |  SELECT lang, 1000000000 // (SELECT count(*) FROM
        |      (SELECT DISTINCT lang FROM documents)) AS t
        |  FROM (SELECT DISTINCT lang FROM documents)),
        |ct AS MATERIALIZED (
        |  SELECT source, (CAST(count(*) AS BIGINT) * 1000000000) //
        |      (SELECT CAST(count(*) AS BIGINT) FROM documents) AS t
        |  FROM documents GROUP BY 1),
        |w0 AS MATERIALIZED (
        |  SELECT lang, source, CAST(count(*) AS BIGINT) AS n,
        |    (CAST(count(*) AS BIGINT) * 1000000000) //
        |      (SELECT CAST(count(*) AS BIGINT) FROM documents) AS nb,
        |    (CAST(count(*) AS BIGINT) * 1000000000) //
        |      (SELECT CAST(count(*) AS BIGINT) FROM documents) AS w
        |  FROM documents GROUP BY 1, 2)""".stripMargin
    val iter = (1 to rounds).map { k =>
      s"""rm$k AS MATERIALIZED (SELECT lang, sum(w) AS m
         |  FROM w${k - 1} GROUP BY 1),
         |wa$k AS MATERIALIZED (SELECT w.lang, w.source, w.n, w.nb,
         |    CASE WHEN m > 0 THEN (w * coalesce(t, 0)) // m
         |      ELSE 0 END AS w
         |  FROM w${k - 1} w JOIN rm$k USING (lang)
         |  LEFT JOIN rt USING (lang)),
         |cm$k AS MATERIALIZED (SELECT source, sum(w) AS m
         |  FROM wa$k GROUP BY 1),
         |w$k AS MATERIALIZED (SELECT w.lang, w.source, w.n, w.nb,
         |    CASE WHEN m > 0 THEN (w * coalesce(t, 0)) // m
         |      ELSE 0 END AS w
         |  FROM wa$k w JOIN cm$k USING (source)
         |  LEFT JOIN ct USING (source))""".stripMargin
    }
    (setup +: iter).mkString(",\n")
  }

  /** Round-12 session 2: preference/annotation QA, training-mixture
    * planning, soft dedup, l-diversity, conformal intervals
    * (q321–q328). Each cites the published estimator it implements;
    * scale notes live on the ops.
    */
  private val extra3Defs: Seq[QueryDef] = Seq(

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

  /** DuckDB entropy fragment for the q332 oracle: H of a (p, n)
    * binary split in nats, 0·ln 0 = 0 — the exact twin of
    * DecisionStump's column expression.
    */
  private def duckH(p: String, n: String): String =
    s"""(CASE WHEN $p = 0 OR $p = $n THEN 0.0
       |  ELSE -((CAST($p AS DOUBLE) / CAST($n AS DOUBLE)) *
       |           ln(CAST($p AS DOUBLE) / CAST($n AS DOUBLE)) +
       |         (1.0 - CAST($p AS DOUBLE) / CAST($n AS DOUBLE)) *
       |           ln(1.0 - CAST($p AS DOUBLE) / CAST($n AS DOUBLE)))
       |  END)""".stripMargin

  /** Round-12 session 2, wave 3: interpretable split training,
    * checksum PII, duplication locality (q332–q334).
    */
  private val extra4Defs: Seq[QueryDef] = Seq(

    // Information-gain decision stump (DecisionStump.fit): which
    // single signal and threshold best separate long documents —
    // the interpretable counterpart of the q118 trained logreg gate.
    // Label = n_chars ≥ 300, so the stump must FIND the n_chars
    // boundary and rank the correlated token count just behind it.
    QueryDef("q332_decision_stump",
      (s, dir) => {
        val tok = TextAnalysis.tokenCount(col("text"))
        val base = t(s, dir, "documents").select(
          col("n_chars"),
          tok.cast("long").as("n_tokens"),
          size(array_distinct(TextAnalysis.tokens(col("text"))))
            .cast("long").as("n_types"),
          when(col("n_chars") >= 300, 1L).otherwise(0L).as("y"))
        DecisionStump.fit(base, "y",
          Seq(("n_chars", 100L), ("n_tokens", 10L), ("n_types", 5L)))
          .orderBy("feature")
      },
      Some("""WITH base AS (
             |  SELECT n_chars,
             |    CAST(len(list_filter(string_split_regex(text, ' +'),
             |      x -> x <> '')) AS BIGINT) AS n_toks,
             |    CAST(len(list_distinct(list_filter(
             |      string_split_regex(text, ' +'), x -> x <> '')))
             |      AS BIGINT) AS n_types,
             |    CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS y
             |  FROM documents),
             |f AS (
             |  SELECT 'n_chars' AS feature,
             |    (n_chars // 100 + 1) * 100 - 1 AS t, y FROM base
             |  UNION ALL SELECT 'n_tokens',
             |    (n_toks // 10 + 1) * 10 - 1, y FROM base
             |  UNION ALL SELECT 'n_types',
             |    (n_types // 5 + 1) * 5 - 1, y FROM base),
             |b AS (SELECT feature, t, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(y) AS BIGINT) AS p
             |  FROM f GROUP BY 1, 2),
             |tot AS (SELECT feature, CAST(sum(n) AS BIGINT) AS nt,
             |    CAST(sum(p) AS BIGINT) AS pt
             |  FROM b GROUP BY 1),
             |sc AS (SELECT feature, t,
             |    CAST(sum(n) OVER (PARTITION BY feature ORDER BY t
             |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_le,
             |    CAST(sum(p) OVER (PARTITION BY feature ORDER BY t
             |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pos_le
             |  FROM b),
             |g AS (SELECT s.feature, s.t, s.n_le, s.pos_le,
             |    tot.nt - s.n_le AS n_gt, tot.pt - s.pos_le AS pos_gt,
             |    tot.nt, tot.pt
             |  FROM sc s JOIN tot USING (feature)
             |  WHERE s.n_le < tot.nt),
             |gg AS (SELECT feature, t, n_le, pos_le, n_gt, pos_gt,
             |""".stripMargin +
        s"    ${duckH("pt", "nt")} -\n" +
        s"    (CAST(n_le AS DOUBLE) / CAST(nt AS DOUBLE)) *\n" +
        s"      ${duckH("pos_le", "n_le")} -\n" +
        s"    (CAST(n_gt AS DOUBLE) / CAST(nt AS DOUBLE)) *\n" +
        s"      ${duckH("pos_gt", "n_gt")} AS gain\n" +
        """  FROM g),
          |bf AS (SELECT *, row_number() OVER (PARTITION BY feature
          |    ORDER BY round(gain, 6) DESC, t ASC) AS rk FROM gg),
          |ov AS (SELECT *, row_number() OVER (
          |    ORDER BY round(gain, 6) DESC, feature ASC) AS ork
          |  FROM bf WHERE rk = 1)
          |SELECT feature, t AS threshold, n_le, pos_le, n_gt, pos_gt,
          |  round(gain, 6) AS gain,
          |  CASE WHEN ork = 1 THEN 1 ELSE 0 END AS is_best
          |FROM ov ORDER BY feature""".stripMargin)),

    // IBAN detection with EXACT ISO 7064 mod-97 validation
    // (Pii.ibanScan): the checksum class q309's Luhn cards started —
    // fixed-format DE IBANs planted from doc_id closed forms (the
    // q149/q309 fixture discipline), correct check digits on the
    // doc_id % 8 slice, off-by-one otherwise, so BOTH branches of the
    // stepwise int64 mod-97 chain are exercised. Oracle replays the
    // planting closed forms.
    QueryDef("q333_pii_iban",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val bbanNum = (col("doc_id") * 2654435761L) %
          1000000000000000000L
        val bban = lpad(bbanNum.cast("string"), 18, "0")
        val mm = (((bbanNum % 97L) * 10000L + 1314L) % 97L * 100L) % 97L
        val ccGood = lit(98L) - mm
        val cc = when(col("doc_id") % 8 === 0, ccGood)
          .otherwise(ccGood + 1L)
        val planted = docs.select(col("doc_id"), col("source"),
          when(col("doc_id") % 4 === 0,
            concat(col("text"), lit(" pay DE"),
              lpad(cc.cast("string"), 2, "0"), bban))
            .otherwise(col("text")).as("text"))
        Pii.ibanScan(planted, "doc_id", "text")
          .join(docs.select("doc_id", "source"), "doc_id")
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("n_iban_cands") > 0, 1L).otherwise(0L))
              .as("n_docs_with_iban"),
            sum("n_iban_cands").as("cands"),
            sum("n_iban_valid").as("valid"),
            sum("n_iban_invalid").as("invalid"))
          .orderBy("source")
      },
      Some("""WITH plant AS (
             |  SELECT doc_id, source,
             |    CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END AS cand,
             |    CASE WHEN doc_id % 4 = 0 AND doc_id % 8 = 0
             |      THEN 1 ELSE 0 END AS ok
             |  FROM documents)
             |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(cand) AS BIGINT) AS n_docs_with_iban,
             |  CAST(sum(cand) AS BIGINT) AS cands,
             |  CAST(sum(ok) AS BIGINT) AS valid,
             |  CAST(sum(cand - ok) AS BIGINT) AS invalid
             |FROM plant GROUP BY source ORDER BY source""".stripMargin)),

    // Duplication locality (query-level composition over q44's
    // verified pairs): near-dup pairs classified same-source vs
    // cross-source — intra-source boilerplate asks for a source-level
    // fix, cross-source syndication for corpus-level dedup. The
    // answer decides WHERE the dedup budget goes.
    QueryDef("q334_dup_locality",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        // r13: stored verified-pairs probe (see ensureNearDupIndex).
        val pairs = ndPairs(s, dir)
        pairs
          .join(docs.select(col("doc_id").as("id_a"),
            col("source").as("src_a")), "id_a")
          .join(docs.select(col("doc_id").as("id_b"),
            col("source").as("src_b")), "id_b")
          .groupBy((col("src_a") === col("src_b")).cast("int")
            .as("same_source"))
          .agg(count(lit(1)).as("n_pairs"),
            round(avg("jaccard"), 4).as("mean_jaccard"),
            min("jaccard").as("min_jaccard"))
          .orderBy("same_source")
      },
      Some("WITH " + minhashVerifiedCtes + "\n" +
        """SELECT CASE WHEN a.source = b.source THEN 1 ELSE 0 END
          |    AS same_source,
          |  CAST(count(*) AS BIGINT) AS n_pairs,
          |  round(avg(jaccard), 4) AS mean_jaccard,
          |  min(jaccard) AS min_jaccard
          |FROM (SELECT id_a, id_b, jaccard FROM verified
          |      WHERE jaccard >= 0.8) pr
          |JOIN documents a ON a.doc_id = pr.id_a
          |JOIN documents b ON b.doc_id = pr.id_b
          |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // 1-D Wasserstein drift (Drift.emdFromHists) on q160's exact
    // setup: where KS reports only the worst single CDF gap, EMD
    // integrates |ΔCDF| over the grid — the +100-char shift costs
    // ~100 char-units of mass transport per language, which is the
    // number a re-balancing job actually pays. Same two graft_hist
    // sketches; neither sample ships a row.
    QueryDef("q335_emd_drift",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val a = docs.filter(col("doc_id") % 2 === 0)
        val b = docs.filter(col("doc_id") % 2 =!= 0)
          .withColumn("n_chars", col("n_chars") + lit(100L))
        Drift.emdFromHists(a, b, "lang", "n_chars",
          lo = 0.0, hi = 1024.0, nbins = 256)
          .orderBy("lang")
      },
      Some("""WITH aa AS (
             |  SELECT lang, CAST(least(greatest(
             |      floor(CAST(n_chars AS DOUBLE) / 4.0), 0), 255) AS BIGINT)
             |      AS b
             |  FROM documents WHERE doc_id % 2 = 0 AND n_chars IS NOT NULL),
             |bb AS (
             |  SELECT lang, CAST(least(greatest(
             |      floor(CAST(n_chars + 100 AS DOUBLE) / 4.0), 0), 255)
             |      AS BIGINT) AS b
             |  FROM documents WHERE doc_id % 2 <> 0 AND n_chars IS NOT NULL),
             |langs AS (SELECT DISTINCT lang FROM documents),
             |grid AS (SELECT lang, s AS b FROM langs
             |         CROSS JOIN (SELECT unnest(range(256)) AS s)),
             |ka AS (SELECT lang, b, count(*) AS c FROM aa GROUP BY 1, 2),
             |kb AS (SELECT lang, b, count(*) AS c FROM bb GROUP BY 1, 2),
             |j AS (SELECT g.lang, g.b, coalesce(ka.c, 0) AS ca,
             |        coalesce(kb.c, 0) AS cb
             |      FROM grid g
             |      LEFT JOIN ka ON g.lang = ka.lang AND g.b = ka.b
             |      LEFT JOIN kb ON g.lang = kb.lang AND g.b = kb.b),
             |cum AS (SELECT lang, b,
             |          sum(ca) OVER w AS cum_a, sum(cb) OVER w AS cum_b,
             |          sum(ca) OVER wa AS n_a, sum(cb) OVER wa AS n_b
             |        FROM j
             |        WINDOW w AS (PARTITION BY lang ORDER BY b),
             |               wa AS (PARTITION BY lang))
             |SELECT lang, CAST(n_a AS BIGINT) AS n_a,
             |  CAST(n_b AS BIGINT) AS n_b,
             |  round(sum(abs(CAST(cum_a AS DOUBLE) / CAST(n_a AS DOUBLE)
             |    - CAST(cum_b AS DOUBLE) / CAST(n_b AS DOUBLE))) * 4.0, 4)
             |    + 0.0 AS emd
             |FROM cum WHERE n_a > 0 AND n_b > 0
             |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin)),

    // TextRank keyword extraction (Mihalcea & Tarau, EMNLP'04) by
    // pure op composition: adjacency bigrams → distinct undirected
    // word graph (tokens keyed by portable hash) → the q83 PageRank
    // kernel → top-10 by stationary score. The graph-centrality
    // counterpart of q114's TF-IDF keywords: TF-IDF scores terms by
    // rarity, TextRank by how central they sit in the co-occurrence
    // structure.
    QueryDef("q336_textrank_keywords",
      (s, dir) => {
        val toks = t(s, dir, "documents")
          .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("tk"))
        val pos = toks.select(col("doc_id"),
          posexplode(col("tk")).as(Seq("pos", "w")))
        val pairs = pos.alias("l")
          .join(pos.alias("r"),
            col("l.doc_id") === col("r.doc_id") &&
              col("r.pos") === col("l.pos") + 1)
          .select(col("l.w").as("wa"), col("r.w").as("wb"))
          .where(col("wa") =!= col("wb"))
          .select(Hashing.portableHash(col("wa")).as("src"),
            Hashing.portableHash(col("wb")).as("dst"))
          .distinct()
        val names = pos.select(col("w")).distinct()
          .select(col("w"), Hashing.portableHash(col("w")).as("id"))
        PageRank.run(names.select("id"), "id", pairs, "src", "dst",
            damping = 0.85, iters = 5)
          .join(names, "id")
          .select(col("w").as("token"), col("pr"))
          .orderBy(col("pr").desc, col("token")).limit(10)
          .orderBy(col("pr").desc, col("token"))
      },
      Some("WITH tkz AS (\n" +
        """  SELECT doc_id, list_filter(
          |    string_split_regex(text, ' +'), x -> x <> '') AS tk
          |  FROM documents),
          |bgs AS (SELECT unnest(list_transform(
          |    generate_series(1, len(tk) - 1),
          |    i -> tk[i] || chr(1) || tk[i + 1])) AS bg FROM tkz),
          |spl AS (SELECT string_split(bg, chr(1))[1] AS wa,
          |    string_split(bg, chr(1))[2] AS wb FROM bgs),
          |""".stripMargin +
        s"""ed AS (SELECT DISTINCT
           |    ${Hashing.duckPortableHash("wa")} AS src,
           |    ${Hashing.duckPortableHash("wb")} AS dst
           |  FROM spl WHERE wa <> wb),
           |names AS (SELECT w, ${Hashing.duckPortableHash("w")} AS id
           |  FROM (SELECT DISTINCT unnest(tk) AS w FROM tkz)),
           |prnodes AS (SELECT id FROM names),
           |predges AS (SELECT src, dst FROM ed
           |            UNION SELECT dst, src FROM ed),
           |""".stripMargin +
        pageRankCtes(d = 0.85, iters = 5) + "\n" +
        """SELECT n.w AS token,
          |  round(coalesce(p.pr, iso5.pr), 6) AS pr
          |FROM prnodes nd
          |LEFT JOIN pre5 p USING (id) CROSS JOIN iso5
          |JOIN names n ON n.id = nd.id
          |ORDER BY pr DESC, token LIMIT 10""".stripMargin)),

    // t-closeness audit (Anonymity.tCloseness, Li et al. ICDE'07) on
    // q326's customer extract: classes that PASS l-diversity can
    // still leak when their sensitive distribution sits far from the
    // global one — closeness is the 1-D EMD over the ordered acctbal
    // buckets (q335's integral at governance grain). The worst-15
    // classes are the disclosure surface; the summary counts classes
    // above t = 0.35.
    QueryDef("q337_t_closeness",
      (s, dir) => {
        val cust = t(s, dir, "customer").select(
          col("c_nationkey"), col("c_mktsegment"),
          floor(col("c_acctbal") / 2000.0).cast("long").as("band"),
          floor(col("c_acctbal") / 1000.0).cast("long").as("sens"))
        Anonymity.tCloseness(cust,
          Seq("c_nationkey", "c_mktsegment", "band"), "sens",
          t = 0.35, topN = 15)
          .orderBy("risk_rank")
      },
      Some("""WITH cust AS (
             |  SELECT c_nationkey, c_mktsegment,
             |    CAST(floor(c_acctbal / 2000.0) AS BIGINT) AS band,
             |    CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS sens
             |  FROM customer),
             |cells AS (SELECT c_nationkey, c_mktsegment, band, sens,
             |    CAST(count(*) AS BIGINT) AS n
             |  FROM cust GROUP BY 1, 2, 3, 4),
             |dom AS (SELECT DISTINCT sens FROM cells),
             |gdist AS (SELECT sens, CAST(sum(n) AS BIGINT) AS gn
             |  FROM cells GROUP BY 1),
             |gt AS (SELECT CAST(sum(gn) AS BIGINT) AS gt FROM gdist),
             |cls AS (SELECT c_nationkey, c_mktsegment, band,
             |    CAST(sum(n) AS BIGINT) AS class_size
             |  FROM cells GROUP BY 1, 2, 3),
             |grid AS (SELECT c.c_nationkey, c.c_mktsegment, c.band,
             |    c.class_size, d.sens, coalesce(ce.n, 0) AS n, g.gn
             |  FROM cls c CROSS JOIN dom d
             |  LEFT JOIN cells ce ON ce.c_nationkey = c.c_nationkey
             |    AND ce.c_mktsegment = c.c_mktsegment
             |    AND ce.band = c.band AND ce.sens = d.sens
             |  JOIN gdist g ON g.sens = d.sens),
             |cum AS (SELECT *, sum(n) OVER w AS cc, sum(gn) OVER w AS cg
             |  FROM grid, gt
             |  WINDOW w AS (PARTITION BY c_nationkey, c_mktsegment, band
             |    ORDER BY sens ROWS UNBOUNDED PRECEDING)),
             |emd AS (SELECT c_nationkey, c_mktsegment, band, class_size,
             |    round(sum(abs(CAST(cc AS DOUBLE) / CAST(class_size AS DOUBLE)
             |      - CAST(cg AS DOUBLE) / CAST(gt AS DOUBLE))), 4) AS emd
             |  FROM cum GROUP BY 1, 2, 3, 4),
             |summ AS (SELECT CAST(count(*) AS BIGINT) AS n_classes,
             |    CAST(sum(CASE WHEN emd > 0.35 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n_above_t,
             |    max(emd) AS max_emd
             |  FROM emd),
             |top AS (SELECT *, row_number() OVER (
             |      ORDER BY emd DESC, c_nationkey ASC,
             |        c_mktsegment ASC, band ASC) AS risk_rank
             |  FROM emd
             |  ORDER BY emd DESC, c_nationkey ASC, c_mktsegment ASC,
             |    band ASC
             |  LIMIT 15)
             |SELECT risk_rank, c_nationkey, c_mktsegment, band,
             |  class_size, emd, n_classes, n_above_t, max_emd
             |FROM top, summ ORDER BY risk_rank""".stripMargin)),

    // Per-language fairness audit of the quality gate
    // (Fairness.selectionParity + equalizedOdds): does
    // `qualityScore >= 0.5` keep each language at comparable rates
    // (four-fifths rule), and are its ERRORS balanced against the
    // long-document ground truth? The per-group corpus-governance
    // table a multilingual data card publishes.
    QueryDef("q338_fairness_audit",
      (s, dir) => {
        val q = TextAnalysis.qualityScore(col("text"))
        val docs = t(s, dir, "documents").select(col("lang"),
          (q >= 0.5).cast("int").as("kept"),
          (col("n_chars") >= 300L).cast("int").as("y"))
        Fairness.selectionParity(docs, "lang", "kept")
          .join(Fairness.equalizedOdds(docs, "lang", "kept", "y"),
            Seq("lang"))
          .orderBy("lang")
      },
      Some("""WITH tkq AS (
             |  SELECT lang, n_chars, list_filter(
             |    string_split_regex(text, ' +'), x -> x <> '') AS tk
             |  FROM documents),
             |base AS (
             |  SELECT lang,
             |    CASE WHEN round((
             |        CASE WHEN len(tk) BETWEEN 5 AND 10000
             |          THEN 1.0 ELSE 0.0 END
             |        + CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk)
             |        + CASE WHEN len(list_filter(tk, x -> x IN
             |            ('the','a','an','of','and','to','in','is'))) > 0
             |          THEN 1.0 ELSE 0.0 END) / 3.0, 4) >= 0.5
             |      THEN 1 ELSE 0 END AS kept,
             |    CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS y
             |  FROM tkq),
             |per AS (SELECT lang, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(kept) AS BIGINT) AS n_selected,
             |    CAST(sum(y) AS BIGINT) AS n_pos,
             |    CAST(count(*) - sum(y) AS BIGINT) AS n_neg,
             |    CAST(sum(CASE WHEN y = 1 AND kept = 1 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS tp,
             |    CAST(sum(CASE WHEN y = 0 AND kept = 1 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS fp
             |  FROM base GROUP BY 1),
             |rates AS (SELECT *,
             |    (n_selected * 1000000) // n AS sel_rate_ppm,
             |    CASE WHEN n_pos > 0
             |      THEN (tp * 1000000) // n_pos END AS tpr_ppm,
             |    CASE WHEN n_neg > 0
             |      THEN (fp * 1000000) // n_neg END AS fpr_ppm
             |  FROM per),
             |best AS (SELECT max(sel_rate_ppm) AS best FROM rates),
             |ov AS (SELECT
             |    (CAST(sum(tp) AS BIGINT) * 1000000) //
             |      CAST(sum(n_pos) AS BIGINT) AS otpr,
             |    (CAST(sum(fp) AS BIGINT) * 1000000) //
             |      CAST(sum(n_neg) AS BIGINT) AS ofpr
             |  FROM per)
             |SELECT lang, n, n_selected, sel_rate_ppm,
             |  round(CAST(sel_rate_ppm AS DOUBLE) /
             |    CAST(best AS DOUBLE), 4) AS ratio_to_best,
             |  CASE WHEN sel_rate_ppm * 5 < best * 4 THEN 1 ELSE 0 END
             |    AS four_fifths_flag,
             |  n_pos, n_neg, tpr_ppm, fpr_ppm,
             |  tpr_ppm - otpr AS tpr_gap_ppm,
             |  fpr_ppm - ofpr AS fpr_gap_ppm
             |FROM rates, best, ov ORDER BY lang""".stripMargin)),

    // ε-DP noisy-count release rehearsal (Anonymity.dpNoisyCounts,
    // Ghosh–Roughgarden–Sundararajan geometric mechanism) over the
    // q266/q337 governance grain: nation × mktsegment customer counts
    // at ε = ln 2 (alphaPpm 500000), noise from per-trial INDEPENDENT
    // md5-seeded Bernoulli draws (integer-exact, so DuckDB replays the
    // exact draw), small cells suppressed below 5. The utility audit a
    // data steward reads before choosing ε.
    QueryDef("q339_dp_release",
      (s, dir) =>
        Anonymity.dpNoisyCounts(t(s, dir, "customer"),
          Seq("c_nationkey", "c_mktsegment"), alphaPpm = 500000L,
          trials = 30, suppressBelow = 5L, seed = "r12")
          .orderBy("c_nationkey", "c_mktsegment"),
      Some {
        val h = s"(${graft.functions.Hashing.duckSeededHash("s", "k")})" +
          s" % ${graft.functions.Hashing.P31}"
        val thresh = 500000L * graft.functions.Hashing.P31 / 1000000L
        s"""WITH cnt AS (
           |  SELECT c_nationkey, c_mktsegment,
           |    CAST(count(*) AS BIGINT) AS n,
           |    'r12:' || CAST(c_nationkey AS VARCHAR) || ':' ||
           |      c_mktsegment AS k
           |  FROM customer GROUP BY 1, 2),
           |tr AS (SELECT c_nationkey, c_mktsegment, n, k,
           |    unnest(generate_series(0, 59)) AS s FROM cnt),
           |hh AS (SELECT c_nationkey, c_mktsegment, n, s,
           |    $h AS h FROM tr),
           |gg AS (SELECT c_nationkey, c_mktsegment, n,
           |    coalesce(min(CASE WHEN s < 30 AND h >= $thresh
           |      THEN s END), 30) AS g1,
           |    coalesce(min(CASE WHEN s >= 30 AND h >= $thresh
           |      THEN s - 30 END), 30) AS g2
           |  FROM hh GROUP BY 1, 2, 3),
           |nz AS (SELECT c_nationkey, c_mktsegment, n,
           |    CAST(g1 - g2 AS BIGINT) AS noise,
           |    greatest(n + g1 - g2, 0) AS rel
           |  FROM gg),
           |fl AS (SELECT c_nationkey, c_mktsegment, n, noise,
           |    CASE WHEN rel < 5 THEN 1 ELSE 0 END AS suppressed,
           |    CASE WHEN rel >= 5 THEN CAST(rel AS BIGINT) END
           |      AS released
           |  FROM nz),
           |summ AS (SELECT CAST(count(*) AS BIGINT) AS n_groups,
           |    CAST(sum(suppressed) AS BIGINT) AS n_suppressed,
           |    CAST(sum(abs(noise)) AS BIGINT) AS l1_noise
           |  FROM fl)
           |SELECT c_nationkey, c_mktsegment, n, noise, released,
           |  suppressed, n_groups, n_suppressed, l1_noise
           |FROM fl, summ
           |ORDER BY c_nationkey, c_mktsegment""".stripMargin
      }),

    // Temporal-leakage audit (TextAnalysis.temporalLeakage): per
    // source, documents mentioning ISO dates AFTER the training
    // cutoff — snapshot-claim contamination for time-split evals.
    // Dates are planted deterministically from doc_id (the q333 IBAN
    // pattern): %5 past dates, %7 future dates past the 2025-12-31
    // cutoff, %11 a calendar-invalid 2024-13-41 the validator must
    // reject; the oracle recomputes the expected counts analytically
    // from the plant arithmetic, never running the regex.
    QueryDef("q340_temporal_leakage",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val mm = lpad(((col("doc_id") % 12L) + 1L).cast("string"), 2, "0")
        val dd = lpad(((col("doc_id") % 28L) + 1L).cast("string"), 2, "0")
        val past = concat(lit(" archived "),
          (lit(2020L) + col("doc_id") % 4L).cast("string"),
          lit("-"), mm, lit("-"), dd)
        val fut = concat(lit(" scheduled "),
          (lit(2027L) + col("doc_id") % 3L).cast("string"),
          lit("-"), mm, lit("-"), dd)
        val planted = docs.select(col("source"), concat(col("text"),
          when(col("doc_id") % 5L === 0L, past).otherwise(lit("")),
          when(col("doc_id") % 7L === 0L, fut).otherwise(lit("")),
          when(col("doc_id") % 11L === 0L, lit(" v2024-13-41"))
            .otherwise(lit(""))).as("text"))
        TextAnalysis.temporalLeakage(planted, "text", "source",
          cutoff = "2025-12-31")
          .orderBy("source")
      },
      Some("""WITH d AS (
             |  SELECT source,
             |    CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END AS hp,
             |    CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END AS hf,
             |    CAST(2020 + doc_id % 4 AS VARCHAR) || '-' ||
             |      lpad(CAST(doc_id % 12 + 1 AS VARCHAR), 2, '0') ||
             |      '-' ||
             |      lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
             |      AS pd,
             |    CAST(2027 + doc_id % 3 AS VARCHAR) || '-' ||
             |      lpad(CAST(doc_id % 12 + 1 AS VARCHAR), 2, '0') ||
             |      '-' ||
             |      lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
             |      AS fd
             |  FROM documents),
             |per AS (SELECT source, hp + hf AS nd, hf AS nf,
             |    CASE WHEN hf = 1 THEN fd WHEN hp = 1 THEN pd END
             |      AS mx
             |  FROM d)
             |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(CASE WHEN nd > 0 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_docs_dated,
             |  CAST(sum(nd) AS BIGINT) AS n_dates,
             |  CAST(sum(nf) AS BIGINT) AS n_future_dates,
             |  CAST(sum(nf) AS BIGINT) AS n_leaking_docs,
             |  (CAST(sum(nf) AS BIGINT) * 1000000) // count(*)
             |    AS leak_ppm,
             |  max(mx) AS max_date
             |FROM per GROUP BY source ORDER BY source""".stripMargin)),

    // Truncation-waste curve (TextAnalysis.truncationWaste): the cost
    // of a per-document token cap at each candidate context length —
    // the planning table behind q91's packing bin size. Exact integer
    // token accounting at every cap.
    QueryDef("q341_truncation_waste",
      (s, dir) =>
        TextAnalysis.truncationWaste(t(s, dir, "documents"), "text",
          Seq(32L, 64L, 128L, 256L))
          .orderBy("cap"),
      Some("""WITH tk AS (
             |  SELECT len(list_filter(string_split_regex(text, ' +'),
             |    x -> x <> '')) AS nt
             |  FROM documents),
             |caps AS (SELECT unnest([32, 64, 128, 256]) AS cap),
             |x AS (SELECT cap, nt FROM tk CROSS JOIN caps)
             |SELECT CAST(cap AS BIGINT) AS cap,
             |  CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(CASE WHEN nt > cap THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_truncated,
             |  CAST(sum(nt) AS BIGINT) AS total_tokens,
             |  CAST(sum(least(nt, cap)) AS BIGINT) AS kept_tokens,
             |  CAST(sum(greatest(nt - cap, 0)) AS BIGINT)
             |    AS lost_tokens,
             |  (CAST(sum(greatest(nt - cap, 0)) AS BIGINT) * 1000000)
             |    // CAST(sum(nt) AS BIGINT) AS waste_ppm
             |FROM x GROUP BY cap ORDER BY cap""".stripMargin)),

    // IPF raking (Mixing.ipfRake, Deming–Stephan 1940): rebalance the
    // lang × source composition to a UNIFORM language marginal while
    // preserving the observed source marginal — the minimum-KL
    // reweighting, 4 alternating scaling rounds in exact ppb integer
    // arithmetic so the oracle replays every floor. Targets are
    // derived from the data (uniform langs / observed sources), the
    // corpus is touched once (the grid count); all iterations ride
    // the grid with marginal-sized broadcasts.
    QueryDef("q342_ipf_rake",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val langs = docs.select("lang").distinct().orderBy("lang")
          .collect().map(_.getString(0)).toSeq
        val rowT = langs.map(_ -> 1000000000L / langs.length)
        val total = docs.count()
        val colT = docs.groupBy("source").count().collect()
          .map(r => r.getString(0) ->
            r.getLong(1) * 1000000000L / total).toSeq
        Mixing.ipfRake(docs, "lang", "source", rowT, colT, rounds = 4)
          .orderBy("lang", "source")
      },
      Some(s"""WITH ${ipfCtes(4)},
             |dr AS (SELECT max(abs(am - coalesce(t, 0))) AS row_dev
             |  FROM (SELECT lang, sum(w) AS am FROM w4 GROUP BY 1) a
             |  LEFT JOIN rt USING (lang)),
             |dc AS (SELECT max(abs(am - coalesce(t, 0))) AS col_dev
             |  FROM (SELECT source, sum(w) AS am FROM w4 GROUP BY 1) a
             |  LEFT JOIN ct USING (source))
             |SELECT lang, source, n, CAST(nb AS BIGINT) AS n_ppb,
             |  CAST(w AS BIGINT) AS w_ppb,
             |  CAST(row_dev AS BIGINT) AS row_dev_ppb,
             |  CAST(col_dev AS BIGINT) AS col_dev_ppb
             |FROM w4, dr, dc ORDER BY lang, source""".stripMargin)),

    // License propagation over near-dup clusters
    // (Components.licensePropagation): a permissively-labeled doc
    // with a restricted near-identical twin is NOT releasable — the
    // effective license is the cluster max. Rides q325's verified
    // cluster chain; license ranks derived deterministically from
    // doc_id (0 permissive / 1 attribution / 2 restricted).
    QueryDef("q343_license_propagation",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        // r13: stored cluster map probe (see ensureNearDupIndex).
        val clusters = ndClusters(s, dir)
        val ranked = docs.withColumn("own",
          when(col("doc_id") % 10L === 9L, 2L)
            .when(col("doc_id") % 10L >= 6L, 1L).otherwise(0L))
        Components.licensePropagation(ranked, "doc_id", "source",
            "own", clusters, restrictedRank = 2L)
          .orderBy("source")
      },
      Some("WITH RECURSIVE " + minhashVerifiedCtes + ",\n" +
        clusterChainCtes + ",\n" +
        """lic AS (SELECT doc_id, source,
          |    CASE WHEN doc_id % 10 = 9 THEN 2
          |         WHEN doc_id % 10 >= 6 THEN 1 ELSE 0 END AS own
          |  FROM documents),
          |cm AS (SELECT c.component, max(l.own) AS cmax
          |  FROM comp c JOIN lic l ON l.doc_id = c.id GROUP BY 1),
          |eff AS (SELECT l.source, l.own,
          |    CASE WHEN c.id IS NOT NULL THEN 1 ELSE 0 END AS incl,
          |    CASE WHEN c.id IS NOT NULL THEN greatest(l.own, cm.cmax)
          |         ELSE l.own END AS eff
          |  FROM lic l LEFT JOIN comp c ON c.id = l.doc_id
          |  LEFT JOIN cm ON cm.component = c.component)
          |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
          |  CAST(sum(incl) AS BIGINT) AS n_in_clusters,
          |  CAST(sum(CASE WHEN eff > own THEN 1 ELSE 0 END) AS BIGINT)
          |    AS n_upgraded,
          |  (CAST(sum(CASE WHEN eff > own THEN 1 ELSE 0 END)
          |      AS BIGINT) * 1000000) // count(*) AS upgraded_ppm,
          |  CAST(max(eff - own) AS BIGINT) AS max_upgrade,
          |  CAST(sum(CASE WHEN own >= 2 THEN 1 ELSE 0 END) AS BIGINT)
          |    AS n_own_restricted,
          |  CAST(sum(CASE WHEN eff >= 2 THEN 1 ELSE 0 END) AS BIGINT)
          |    AS n_eff_restricted
          |FROM eff GROUP BY source ORDER BY source""".stripMargin)),

    // ROC operating table + exact tie-corrected AUC
    // (Classifier.rocAuc, Mann–Whitney grouped form) for the quality
    // score against the long-document label — q338 judged ONE
    // operating point for fairness; this sweeps the threshold and
    // prices each choice in exact confusion counts. The cumulative
    // tie term rides Rank.globalRowNumber + prefixSum, so the
    // score-distinct frame never meets a single-task window.
    QueryDef("q344_roc_auc",
      (s, dir) => {
        val q = TextAnalysis.qualityScore(col("text"))
        val scored = t(s, dir, "documents").select(q.as("score"),
          (col("n_chars") >= 300L).cast("int").as("y"))
        Classifier.rocAuc(scored, "score", "y",
          Seq(0.3, 0.5, 0.7, 0.9))
          .orderBy("thr")
      },
      Some("""WITH tkq AS (
             |  SELECT n_chars, list_filter(
             |    string_split_regex(text, ' +'), x -> x <> '') AS tk
             |  FROM documents),
             |base AS (
             |  SELECT round((
             |      CASE WHEN len(tk) BETWEEN 5 AND 10000
             |        THEN 1.0 ELSE 0.0 END
             |      + CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk)
             |      + CASE WHEN len(list_filter(tk, x -> x IN
             |          ('the','a','an','of','and','to','in','is'))) > 0
             |        THEN 1.0 ELSE 0.0 END) / 3.0, 4) AS s,
             |    CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS y
             |  FROM tkq),
             |bys AS (SELECT s, CAST(sum(y) AS BIGINT) AS pos,
             |    CAST(sum(1 - y) AS BIGINT) AS neg
             |  FROM base GROUP BY 1),
             |cum AS (SELECT *, CAST(sum(neg) OVER (ORDER BY s
             |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cneg
             |  FROM bys),
             |auc AS (SELECT
             |    CAST(sum(2 * (cneg - neg) * pos + neg * pos)
             |      AS BIGINT) AS a2,
             |    CAST(sum(pos) AS BIGINT) AS n_pos,
             |    CAST(sum(neg) AS BIGINT) AS n_neg
             |  FROM cum),
             |th AS (SELECT CAST(unnest([0.3, 0.5, 0.7, 0.9]) AS DOUBLE)
             |    AS thr),
             |tab AS (SELECT thr,
             |    CAST(sum(CASE WHEN s >= thr THEN pos ELSE 0 END)
             |      AS BIGINT) AS tp,
             |    CAST(sum(CASE WHEN s >= thr THEN neg ELSE 0 END)
             |      AS BIGINT) AS fp
             |  FROM bys CROSS JOIN th GROUP BY 1)
             |SELECT thr, tp, fp, n_pos - tp AS fn, n_neg - fp AS tn,
             |  CASE WHEN tp + fp > 0
             |    THEN (tp * 1000000) // (tp + fp) END AS precision_ppm,
             |  (tp * 1000000) // n_pos AS recall_ppm,
             |  (fp * 1000000) // n_neg AS fpr_ppm,
             |  CASE WHEN 2 * tp + fp + (n_pos - tp) > 0
             |    THEN (2 * tp * 1000000) // (2 * tp + fp + (n_pos - tp))
             |    END AS f1_ppm,
             |  round(CAST(a2 AS DOUBLE) /
             |    ((2.0 * n_pos) * n_neg), 6) AS auc,
             |  n_pos, n_neg
             |FROM tab, auc ORDER BY thr""".stripMargin))
  )

  /** Oracle twin of [[graft.ops.Pq.dist2]]: L2² expanded as
    * x·x − 2·x·c + c·c, three sequential-order list_sums mirroring the
    * three `graft_dot` calls, so both engines walk identical IEEE
    * operations.
    */
  private def duckDist2(a: String, b: String): String =
    s"""(list_sum(list_transform($a, x ->
       |      CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
       |    - 2 * list_sum(list_transform($a, (x, i) ->
       |      CAST(x AS DOUBLE) * CAST($b[i] AS DOUBLE)))
       |    + list_sum(list_transform($b, x ->
       |      CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))""".stripMargin

  /** Oracle twin of [[graft.ops.Pq.train]]: subvector explode (`psv`),
    * hash-rank seeds shared by all subspaces (`pseed`/`pcent0`), then
    * `iters` unrolled Lloyd rounds `passign{i}`/`pcent{i}` — argmin-L2
    * assignment (tie on cell_id), per-position mean rounded to 6
    * decimals and cast to REAL. Ends at `pcent{iters}`.
    */
  private def pqCtes(m: Int, subDim: Int, ks: Int, iters: Int,
      f: String = "p"): String = {
    val seed =
      s"""${f}subs AS (SELECT unnest(generate_series(0, ${m - 1})) AS sub),
         |${f}poss AS (SELECT unnest(generate_series(1, $subDim)) AS pos),
         |${f}sv AS MATERIALIZED (SELECT vec_id, sub,
         |    list_slice(embedding, sub * $subDim + 1,
         |      sub * $subDim + $subDim) AS v
         |  FROM embeddings CROSS JOIN ${f}subs),
         |${f}seed AS (
         |  SELECT vec_id, row_number() OVER (ORDER BY h, vec_id) - 1
         |      AS cell_id
         |  FROM (SELECT vec_id,
         |          ${Hashing.duckPortableHash("CAST(vec_id AS VARCHAR)")} AS h
         |        FROM embeddings ORDER BY h, vec_id LIMIT $ks)),
         |${f}cent0 AS (SELECT s.sub, p.cell_id, s.v AS centvec
         |  FROM ${f}sv s JOIN ${f}seed p USING (vec_id))""".stripMargin
    val rounds = (1 to iters).map { i =>
      s"""${f}assign$i AS (
         |  SELECT vec_id, sub, v, cell_id FROM (
         |    SELECT s.vec_id, s.sub, s.v, c.cell_id,
         |      row_number() OVER (PARTITION BY s.vec_id, s.sub
         |        ORDER BY ${duckDist2("s.v", "c.centvec")} ASC,
         |          c.cell_id) AS rn
         |    FROM ${f}sv s JOIN ${f}cent${i - 1} c ON s.sub = c.sub)
         |  WHERE rn = 1),
         |${f}cent$i AS (
         |  SELECT sub, cell_id,
         |    list(CAST(round(mu, 6) AS REAL) ORDER BY pos) AS centvec
         |  FROM (SELECT a.sub, a.cell_id, p.pos,
         |          avg(CAST(a.v[p.pos] AS DOUBLE)) AS mu
         |        FROM ${f}assign$i a CROSS JOIN ${f}poss p
         |        GROUP BY 1, 2, 3)
         |  GROUP BY 1, 2)""".stripMargin
    }
    (seed +: rounds).mkString(",\n")
  }

  /** Round-13: mergeable HLL registers, sequential testing, product
    * quantization, coreset selection (q345+).
    */
  private val extra5Defs: Seq[QueryDef] = Seq(

    // HyperLogLog distinct-token sketch (CardinalityEstimate
    // .hllReport, Flajolet 2007) per source, p=6 → 64 registers, with
    // the shard-merge law PROVEN in-query: the element-wise max of the
    // per-source register tables must equal the registers of the
    // ungrouped scan (merge_register_mismatches = 0) — the property
    // that lets a 1000-executor scan ship 64 longs per shard. The
    // exact distinct runs alongside so the estimator's error is
    // measured, not assumed (the q154 KMV discipline).
    QueryDef("q345_hll_distinct",
      (s, dir) => {
        val toks = t(s, dir, "documents").select(col("source"),
          explode(split(col("text"), " +")).as("token"))
          .where(col("token") =!= "")
        CardinalityEstimate.hllReport(toks, "source", "token", p = 6)
          .orderBy("source")
      },
      Some {
        val h = Hashing.duckPortableHash("token")
        val rho = "CASE WHEN h // 64 = 0 THEN 55" +
          " ELSE 55 - length(bin(h // 64)) END"
        val alpha = "(0.7213 / (1.0 + 1.079 / 64.0))"
        val two55 = "(CAST(1 AS BIGINT) << 55)"
        s"""WITH tok AS (
           |  SELECT source, unnest(list_filter(
           |    string_split_regex(text, ' +'), t -> t <> '')) AS token
           |  FROM documents),
           |hh AS (SELECT source, token, $h AS h FROM tok),
           |rr AS (SELECT source, h % 64 AS b, max($rho) AS m
           |  FROM hh GROUP BY 1, 2),
           |sg AS (SELECT source,
           |    CAST(count(*) AS BIGINT) AS registers_used,
           |    64 - CAST(count(*) AS BIGINT) AS zeros,
           |    CAST(sum(CAST(1 AS BIGINT) << CAST(55 - m AS INT))
           |      AS BIGINT) +
           |      (64 - CAST(count(*) AS BIGINT)) * $two55 AS sum_scaled
           |  FROM rr GROUP BY 1),
           |est AS (SELECT *,
           |    $alpha * 64.0 * 64.0 * CAST($two55 AS DOUBLE) /
           |      CAST(sum_scaled AS DOUBLE) AS raw
           |  FROM sg),
           |est2 AS (SELECT *,
           |    CASE WHEN raw <= 2.5 * 64.0 AND zeros > 0
           |      THEN 64.0 * ln(64.0 / CAST(zeros AS DOUBLE))
           |      ELSE raw END AS e
           |  FROM est),
           |ex AS (SELECT source, CAST(count(*) AS BIGINT) AS n_keys,
           |    CAST(count(DISTINCT token) AS BIGINT)
           |      AS n_distinct_exact
           |  FROM tok GROUP BY 1),
           |mrr AS (SELECT b, max(m) AS m FROM rr GROUP BY 1),
           |grr AS (SELECT h % 64 AS b, max($rho) AS m
           |  FROM hh GROUP BY 1),
           |mm AS (SELECT CAST(coalesce(sum(CASE WHEN mrr.m IS NULL
           |      OR grr.m IS NULL OR mrr.m <> grr.m THEN 1 ELSE 0
           |      END), 0) AS BIGINT) AS merge_register_mismatches
           |  FROM mrr FULL JOIN grr USING (b)),
           |msum AS (SELECT 64 - CAST(count(*) AS BIGINT) AS zeros,
           |    CAST(sum(CAST(1 AS BIGINT) << CAST(55 - m AS INT))
           |      AS BIGINT) +
           |      (64 - CAST(count(*) AS BIGINT)) * $two55 AS ss
           |  FROM mrr),
           |mest AS (SELECT round(CASE WHEN raw <= 2.5 * 64.0
           |      AND zeros > 0
           |      THEN 64.0 * ln(64.0 / CAST(zeros AS DOUBLE))
           |      ELSE raw END, 2) AS merged_est
           |  FROM (SELECT zeros,
           |      $alpha * 64.0 * 64.0 * CAST($two55 AS DOUBLE) /
           |        CAST(ss AS DOUBLE) AS raw
           |    FROM msum))
           |SELECT ex.source, n_keys, n_distinct_exact, registers_used,
           |  zeros, sum_scaled, round(raw, 2) AS hll_raw,
           |  round(e, 2) AS hll_est,
           |  CAST(round((e / CAST(n_distinct_exact AS DOUBLE) - 1.0)
           |    * 1000000.0) AS BIGINT) AS err_ppm,
           |  merged_est, merge_register_mismatches
           |FROM ex JOIN est2 USING (source), mest, mm
           |ORDER BY source""".stripMargin
      }),

    // Wald SPRT rollout monitor (SequentialTest.sprtMonitor, Wald
    // 1945): walk the event log in (ts, event_id) order accumulating
    // the exact integer micro-nat LLR of purchase-rate H1 p=0.25 vs
    // H0 p=0.15, stop at the first Wald boundary crossing — the
    // minimal-expected-sample test, with the saved fraction of the
    // horizon reported. Constants are rounded ONCE on the driver and
    // inlined in both engines, so the walk replays bit-for-bit.
    QueryDef("q346_sprt_monitor",
      (s, dir) => SequentialTest.sprtMonitor(
        t(s, dir, "events"), Seq("ts", "event_id"),
        col("event_type") === "purchase",
        p0 = 0.15, p1 = 0.25, alpha = 0.05, beta = 0.05),
      Some {
        val (a, b) = SequentialTest.llrMicroNats(0.15, 0.25)
        val (lower, upper) = SequentialTest.boundariesMicroNats(0.05, 0.05)
        s"""WITH e AS (SELECT ts, event_id,
           |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS x
           |  FROM events),
           |r AS (SELECT x, row_number() OVER (ORDER BY ts, event_id)
           |      AS rk,
           |    CAST(x * $a + (1 - x) * ($b) AS BIGINT) AS llr
           |  FROM e),
           |c AS (SELECT rk, CAST(sum(llr) OVER (ORDER BY rk
           |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
           |  FROM r),
           |fx AS (SELECT CAST(rk AS BIGINT) AS crossing_n,
           |    cum AS llr_at_crossing_micro
           |  FROM c WHERE cum >= $upper OR cum <= $lower
           |  ORDER BY rk LIMIT 1),
           |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
           |    CAST(sum(x) AS BIGINT) AS n_success,
           |    CAST(sum(llr) AS BIGINT) AS llr_final_micro
           |  FROM r)
           |SELECT n, n_success,
           |  (n_success * 1000000) // n AS success_rate_ppm,
           |  llr_final_micro,
           |  CAST($lower AS BIGINT) AS lower_micro,
           |  CAST($upper AS BIGINT) AS upper_micro,
           |  crossing_n, llr_at_crossing_micro,
           |  CASE WHEN llr_at_crossing_micro >= $upper
           |      THEN 'accept_h1'
           |    WHEN llr_at_crossing_micro <= $lower THEN 'accept_h0'
           |    ELSE 'continue' END AS decision,
           |  CASE WHEN crossing_n IS NOT NULL
           |    THEN ((n - crossing_n) * 1000000) // n
           |    ELSE 0 END AS savings_ppm
           |FROM tot LEFT JOIN fx ON TRUE""".stripMargin
      }),

    // Product-quantization ADC search (Pq.adcTopK, Jégou TPAMI'11):
    // m=4 subspaces × ks=8 centroids trained with 2 deterministic
    // Lloyd rounds (the q65 discipline, L2 metric), corpus stored as
    // 4 codes/vector, queries answered by asymmetric distance — each
    // (query, sub, cell) distance snapped to integer micro-units ONCE
    // so candidate distances are exact order-free integer sums — with
    // recall@10 measured against the exact L2 top-10. The memory tier
    // below q150's SQ8: 64-dim floats become 4 codes.
    QueryDef("q347_pq_adc_search",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Pq.adcTopK(emb, emb.filter(col("vec_id").between(100, 104)),
          "vec_id", "embedding", m = 4, subDim = 16, ks = 8,
          iters = 2, k = 10)
          .orderBy("query_id", "rank")
      },
      Some("WITH " + pqCtes(m = 4, subDim = 16, ks = 8, iters = 2) + ",\n" +
        s"""pcodes AS (
           |  SELECT vec_id, sub, cell_id AS code FROM (
           |    SELECT s.vec_id, s.sub, c.cell_id,
           |      row_number() OVER (PARTITION BY s.vec_id, s.sub
           |        ORDER BY ${duckDist2("s.v", "c.centvec")} ASC,
           |          c.cell_id) AS rn
           |    FROM psv s JOIN pcent2 c ON s.sub = c.sub)
           |  WHERE rn = 1),
           |pqt AS (
           |  SELECT q.vec_id AS query_id, c.sub, c.cell_id AS code,
           |    CAST(round(${duckDist2("q.v", "c.centvec")}
           |      * 1000000.0) AS BIGINT) AS tm
           |  FROM (SELECT * FROM psv
           |        WHERE vec_id BETWEEN 100 AND 104) q
           |  JOIN pcent2 c ON q.sub = c.sub),
           |papprox AS (
           |  SELECT query_id, neighbor_id, adc_micro,
           |    row_number() OVER (PARTITION BY query_id
           |      ORDER BY adc_micro ASC, neighbor_id ASC) AS "rank"
           |  FROM (SELECT t.query_id, k.vec_id AS neighbor_id,
           |      CAST(sum(t.tm) AS BIGINT) AS adc_micro
           |    FROM pcodes k
           |    JOIN pqt t ON k.sub = t.sub AND k.code = t.code
           |    WHERE k.vec_id <> t.query_id
           |    GROUP BY 1, 2)),
           |ptop AS (SELECT * FROM papprox WHERE "rank" <= 10),
           |pexact AS (
           |  SELECT query_id, neighbor_id FROM (
           |    SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
           |      row_number() OVER (PARTITION BY q.vec_id
           |        ORDER BY CAST(round(
           |          ${duckDist2("e.embedding", "q.embedding")}
           |          * 1000000.0) AS BIGINT) ASC, e.vec_id) AS rn
           |    FROM embeddings e,
           |      (SELECT vec_id, embedding FROM embeddings
           |       WHERE vec_id BETWEEN 100 AND 104) q
           |    WHERE e.vec_id <> q.vec_id)
           |  WHERE rn <= 10),
           |prec AS (SELECT CAST(((SELECT count(*) FROM ptop a
           |      JOIN pexact e USING (query_id, neighbor_id))
           |    * 1000000) // ((SELECT count(DISTINCT query_id)
           |      FROM ptop) * 10) AS BIGINT) AS recall_ppm)
           |SELECT a.query_id, a."rank", a.neighbor_id, a.adc_micro,
           |  CASE WHEN e.neighbor_id IS NOT NULL THEN 1 ELSE 0 END
           |    AS exact_hit,
           |  recall_ppm
           |FROM ptop a LEFT JOIN pexact e
           |  USING (query_id, neighbor_id), prec
           |ORDER BY a.query_id, a."rank"""".stripMargin)
      ),

    // Greedy k-center coreset (Coreset.kCenter, Gonzalez 1985): the
    // 8 maximally-diverse embedding rows — farthest-point selection
    // with integer-micro L2² distances and hash-seeded start, the
    // annotation-batch / cluster-seed picker. Selection order is the
    // output (prefixes are themselves greedy solutions) and the final
    // coverage radius (the 2-approximated k-center objective) is
    // audited over the full frame.
    QueryDef("q348_kcenter_coreset",
      (s, dir) => Coreset.kCenter(
        t(s, dir, "embeddings"), "vec_id", "embedding", k = 8)
        .orderBy("rank"),
      Some {
        val k = 8
        val d2 = "CAST(round(" + duckDist2("e.embedding", "c.embedding") +
          " * 1000000.0) AS BIGINT)"
        val seed =
          s"""kcseed AS (SELECT vec_id FROM (SELECT vec_id,
             |    ${Hashing.duckPortableHash("CAST(vec_id AS VARCHAR)")} AS h
             |  FROM embeddings ORDER BY h, vec_id LIMIT 1)),
             |kcc0 AS (SELECT vec_id, 0 AS "rank",
             |    CAST(NULL AS BIGINT) AS gain_micro FROM kcseed)""".stripMargin
        val steps = (1 until k).map { i =>
          // MATERIALIZED: each kcc is referenced 3× by the next step
          // (two membership subqueries + the union) — inlined, the
          // chain goes exponential (the r12 btCtes lesson).
          s"""kcm$i AS MATERIALIZED (SELECT e.vec_id, min($d2) AS md
             |  FROM embeddings e, embeddings c
             |  WHERE c.vec_id IN (SELECT vec_id FROM kcc${i - 1})
             |    AND e.vec_id NOT IN (SELECT vec_id FROM kcc${i - 1})
             |  GROUP BY e.vec_id),
             |kcp$i AS MATERIALIZED (
             |  SELECT vec_id, $i AS "rank", md AS gain_micro
             |  FROM kcm$i ORDER BY md DESC, vec_id LIMIT 1),
             |kcc$i AS MATERIALIZED (SELECT * FROM kcc${i - 1}
             |  UNION ALL SELECT * FROM kcp$i)""".stripMargin
        }
        "WITH " + (seed +: steps).mkString(",\n") + ",\n" +
          s"""kcrad AS (SELECT max(md) AS coverage_radius_micro FROM (
             |    SELECT e.vec_id, min($d2) AS md
             |    FROM embeddings e, embeddings c
             |    WHERE c.vec_id IN (SELECT vec_id FROM kcc${k - 1})
             |    GROUP BY e.vec_id)),
             |kcn AS (SELECT CAST(count(*) AS BIGINT) AS n_points
             |  FROM embeddings)
             |SELECT "rank", vec_id, gain_micro, coverage_radius_micro,
             |  n_points
             |FROM kcc${k - 1}, kcrad, kcn ORDER BY "rank"""".stripMargin
      }),

    // LSH band-tuning table (Dedup.lshTuningTable): the S-curve
    // P(s) = 1 − (1 − s^r)^b for the four ways to spend a 64-hash
    // MinHash signature, with detection probability at the 0.8 dedup
    // threshold, false-positive / false-negative areas (the
    // shuffle-volume vs missed-dup tradeoff a band choice is made
    // on) and the curve midpoint — the planning dim behind q44/q61's
    // bands=8 choice. Powers are explicit multiplication chains and
    // P snaps to integer nanos per grid point, so both engines
    // produce identical integers.
    QueryDef("q349_lsh_tuning",
      (s, dir) => Dedup.lshTuningTable(s,
        configs = Seq((32, 2), (16, 4), (8, 8), (4, 16)),
        grid = 20, thresholdPermil = 800)
        .orderBy("rows_per_band"),
      Some {
        val grid = 20; val tIdx = 16
        val cfgs = Seq((32, 2), (16, 4), (8, 8), (4, 16))
        val parts = cfgs.map { case (b, r) =>
          val srChain = Seq.fill(r)("s").mkString(" * ")
          val qChain = Seq.fill(b)("onems").mkString(" * ")
          s"""SELECT $b AS bands, $r AS rows_per_band,
             |    ${b * r} AS k,
             |    max(CASE WHEN i = $tIdx THEN p_nano END)
             |      AS p_at_threshold_nano,
             |    CAST(sum(CASE WHEN i < $tIdx THEN p_nano ELSE 0 END)
             |      // $grid AS BIGINT) AS fp_area_nano,
             |    CAST(sum(CASE WHEN i >= $tIdx
             |        THEN 1000000000 - p_nano ELSE 0 END)
             |      // $grid AS BIGINT) AS fn_area_nano,
             |    CAST(min(CASE WHEN p_nano >= 500000000 THEN i END)
             |      * 1000 // $grid AS BIGINT) AS s50_permil
             |  FROM (
             |    SELECT i, CAST(round((1.0 - ($qChain))
             |        * 1000000000.0) AS BIGINT) AS p_nano
             |    FROM (
             |      SELECT i, 1.0 - ($srChain) AS onems
             |      FROM (SELECT i, CAST(i AS DOUBLE) / $grid.0 AS s
             |            FROM (SELECT unnest(generate_series(1,
             |              ${grid - 1})) AS i))))""".stripMargin
        }
        parts.mkString("", "\nUNION ALL\n", "\nORDER BY rows_per_band")
      }),

    // Active-learning batch selection (ActiveLearning
    // .uncertaintyBatch, Lewis & Gale '94 margin sampling): k-NN
    // classify every unlabeled pool vector against the labeled seed
    // set (vec_id < 100) and queue the 10 smallest-vote-margin rows
    // for annotation — the rows the current labels are least sure
    // about. Integer vote margins; the labeled side broadcasts, the
    // pool never shuffles beyond its per-row top-k.
    QueryDef("q350_active_learning",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        ActiveLearning.uncertaintyBatch(
          emb.where(col("vec_id") < 100),
          emb.where(col("vec_id") >= 100),
          "vec_id", "embedding", "label", k = 5, batch = 10)
          .orderBy("selection_rank")
      },
      Some(s"""WITH lab AS (SELECT vec_id AS lid, embedding AS lv,
             |    label AS lbl FROM embeddings WHERE vec_id < 100),
             |pool AS (SELECT vec_id AS pid, embedding AS pv
             |  FROM embeddings WHERE vec_id >= 100),
             |sc AS (SELECT pid, lid, lbl,
             |    ${duckCos("pv", "lv")} AS cos
             |  FROM pool, lab),
             |topk AS (SELECT pid, lbl FROM (
             |    SELECT pid, lbl, row_number() OVER (
             |      PARTITION BY pid ORDER BY cos DESC, lid ASC) AS rn
             |    FROM sc) WHERE rn <= 5),
             |v AS (SELECT pid, lbl, CAST(count(*) AS BIGINT) AS votes
             |  FROM topk GROUP BY 1, 2),
             |vr AS (SELECT pid, lbl, votes, row_number() OVER (
             |    PARTITION BY pid ORDER BY votes DESC, lbl ASC) AS r
             |  FROM v),
             |pp AS (SELECT pid,
             |    max(CASE WHEN r = 1 THEN lbl END) AS top_label,
             |    max(CASE WHEN r = 1 THEN votes END) AS top_votes,
             |    coalesce(max(CASE WHEN r = 2 THEN votes END),
             |      CAST(0 AS BIGINT)) AS second_votes
             |  FROM vr WHERE r <= 2 GROUP BY 1),
             |sel AS (SELECT pid, top_label, top_votes, second_votes,
             |    top_votes - second_votes AS margin
             |  FROM pp ORDER BY margin ASC, pid ASC LIMIT 10)
             |SELECT row_number() OVER (ORDER BY margin ASC, pid ASC)
             |    AS selection_rank,
             |  pid AS vec_id, top_label, top_votes, second_votes,
             |  margin
             |FROM sel ORDER BY selection_rank""".stripMargin)),

    // Seeded label spreading (Components.seededLabelSpread): plant
    // lang labels on every third doc, spread them 3 synchronous hops
    // over the 0.8-Jaccard near-dup graph — seeds clamped, unlabeled
    // docs adopt the modal labeled-neighbor label (ties smallest),
    // unreached docs stay null. The annotation amplifier: how far a
    // seed-label budget carries through duplication structure. The
    // adoption ROUND is emitted per doc, so the hop-by-hop frontier
    // is auditable.
    QueryDef("q351_label_spread",
      (s, dir) => {
        val slice = t(s, dir, "documents").filter(col("doc_id") < 1000)
        val pairs = Dedup.minhashNearDups(slice, "doc_id", "text",
          k = 64, bands = 8, threshold = 0.8)
        val seeded = slice.select(col("doc_id"),
          when(col("doc_id") % 3L === 0L, col("lang")).as("seed_label"))
        Components.seededLabelSpread(seeded, "doc_id", "seed_label",
            pairs, "id_a", "id_b", rounds = 3)
          .orderBy("doc_id")
      },
      Some {
        val rounds = (1 to 3).map { r =>
          s"""sv$r AS (SELECT e.src AS id, l.lbl, count(*) AS c
             |  FROM edges e JOIN sl${r - 1} l ON l.id = e.dst
             |  WHERE l.lbl IS NOT NULL GROUP BY 1, 2),
             |sb$r AS (SELECT id, lbl AS cand FROM (
             |    SELECT id, lbl, row_number() OVER (PARTITION BY id
             |      ORDER BY c DESC, lbl) AS rk
             |    FROM sv$r) WHERE rk = 1),
             |sl$r AS MATERIALIZED (SELECT p.id,
             |    coalesce(p.lbl, b.cand) AS lbl,
             |    CASE WHEN p.lbl IS NULL AND b.cand IS NOT NULL
             |      THEN $r ELSE p.labeled_at END AS labeled_at
             |  FROM sl${r - 1} p LEFT JOIN sb$r b USING (id))"""
            .stripMargin
        }
        "WITH " + minhashVerifiedCtes + ",\n" + pairsEdgesCtes + ",\n" +
          """sl0 AS MATERIALIZED (SELECT doc_id AS id,
            |    CASE WHEN doc_id % 3 = 0 THEN lang END AS lbl,
            |    CASE WHEN doc_id % 3 = 0 THEN 0 END AS labeled_at
            |  FROM documents WHERE doc_id < 1000),""".stripMargin +
          "\n" + rounds.mkString(",\n") + "\n" +
          """SELECT id AS doc_id, lbl AS label,
            |  CAST(labeled_at AS INT) AS labeled_at,
            |  CASE WHEN labeled_at = 0 THEN 1 ELSE 0 END AS is_seed
            |FROM sl3 ORDER BY doc_id""".stripMargin
      }),

    // Matryoshka truncation audit (Quantize.matryoshkaRecall,
    // Kusupati '22): recall@10 of cosine search over the first
    // 8/16/32 embedding dims vs the full 64 — the dimensionality
    // half of the storage tradeoff next to q73's int8 and q347's PQ
    // codes. Exact integer recall; one broadcast-query pass per dim.
    QueryDef("q352_matryoshka_recall",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Quantize.matryoshkaRecall(emb,
          emb.filter(col("vec_id").between(100, 104)),
          "vec_id", "embedding", dims = Seq(8, 16, 32), k = 10)
          .orderBy("dim")
      },
      Some {
        def sliced(e: String, d: Int) = s"list_slice($e, 1, $d)"
        val dims = Seq(8, 16, 32)
        val perDim = dims.map { d =>
          s"""t$d AS (SELECT query_id, neighbor_id FROM (
             |    SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
             |      row_number() OVER (PARTITION BY q.vec_id
             |        ORDER BY ${duckCos(sliced("e.embedding", d),
                       sliced("q.embedding", d))} DESC,
             |          e.vec_id) AS rn
             |    FROM embeddings e, fq q WHERE e.vec_id <> q.vec_id)
             |  WHERE rn <= 10),
             |r$d AS (SELECT $d AS dim,
             |    CAST(count(*) AS BIGINT) AS hits,
             |    (SELECT CAST(count(*) AS BIGINT) FROM fq)
             |      AS n_queries,
             |    CAST((count(*) * 1000000) //
             |      ((SELECT count(*) FROM fq) * 10) AS BIGINT)
             |      AS recall_ppm
             |  FROM t$d JOIN ffull USING (query_id, neighbor_id))"""
            .stripMargin
        }
        s"""WITH fq AS (SELECT vec_id, embedding FROM embeddings
           |  WHERE vec_id BETWEEN 100 AND 104),
           |ffull AS (SELECT query_id, neighbor_id FROM (
           |    SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
           |      row_number() OVER (PARTITION BY q.vec_id
           |        ORDER BY ${duckCos("e.embedding", "q.embedding")}
           |          DESC, e.vec_id) AS rn
           |    FROM embeddings e, fq q WHERE e.vec_id <> q.vec_id)
           |  WHERE rn <= 10),
           |""".stripMargin + perDim.mkString(",\n") + "\n" +
          dims.map(d => s"SELECT * FROM r$d").mkString("", "\nUNION ALL\n",
            "\nORDER BY dim")
      }),

    // Hard-negative mining (Contrastive.hardNegatives): for each of
    // the 10 anchor embeddings, the 5 most-similar OTHER-label
    // vectors (the negatives that move a contrastive loss), the
    // nearest same-label positive, and the margin-violation flag —
    // q109's random triplets pick easy negatives; this is the miner
    // that finds the hard ones.
    QueryDef("q353_hard_negatives",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Contrastive.hardNegatives(emb,
          emb.filter(col("vec_id") < 10),
          "vec_id", "embedding", "label", n = 5)
          .orderBy("anchor_id", "rank")
      },
      Some(s"""WITH ha AS (SELECT vec_id AS anchor_id, embedding AS av,
             |    label AS albl FROM embeddings WHERE vec_id < 10),
             |hsc AS (SELECT a.anchor_id, a.albl, e.vec_id AS cid,
             |    e.label AS clbl,
             |    ${duckCos("a.av", "e.embedding")} AS cos
             |  FROM embeddings e, ha a
             |  WHERE e.vec_id <> a.anchor_id),
             |hneg AS (SELECT anchor_id, albl AS anchor_label, "rank",
             |    cid AS neg_id, clbl AS neg_label,
             |    round(cos, 4) AS neg_cos
             |  FROM (SELECT anchor_id, albl, cid, clbl, cos,
             |      row_number() OVER (PARTITION BY anchor_id
             |        ORDER BY cos DESC, cid ASC) AS "rank"
             |    FROM hsc WHERE clbl <> albl)
             |  WHERE "rank" <= 5),
             |hpos AS (SELECT anchor_id, cid AS pos_id,
             |    round(cos, 4) AS pos_cos
             |  FROM (SELECT anchor_id, cid, cos,
             |      row_number() OVER (PARTITION BY anchor_id
             |        ORDER BY cos DESC, cid ASC) AS pr
             |    FROM hsc WHERE clbl = albl)
             |  WHERE pr = 1)
             |SELECT n.anchor_id, n.anchor_label, n."rank", n.neg_id,
             |  n.neg_label, n.neg_cos, p.pos_id, p.pos_cos,
             |  CASE WHEN p.pos_cos IS NOT NULL
             |      AND n.neg_cos >= p.pos_cos THEN 1 ELSE 0 END
             |    AS violation
             |FROM hneg n LEFT JOIN hpos p USING (anchor_id)
             |ORDER BY anchor_id, n."rank"""".stripMargin)),

    // IVF-PQ composite index (Pq.ivfPqTopK, the FAISS IVF8,PQ4
    // shape): a coarse 8-cell L2 quantizer (Pq.train with m=1 — both
    // levels share ONE verified Lloyd kernel) routes each query to
    // its 2 nearest cells, and only the PQ codes inside those cells
    // pay ADC. Recall@10 is judged against the exact L2 top-10 over
    // the FULL corpus, so probe misses count; n_candidates audits the
    // probe's selectivity.
    QueryDef("q354_ivfpq_search",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Pq.ivfPqTopK(emb, emb.filter(col("vec_id").between(100, 104)),
          "vec_id", "embedding", dim = 64, kCoarse = 8, nProbe = 2,
          m = 4, subDim = 16, ks = 8, iters = 2, k = 10)
          .orderBy("query_id", "rank")
      },
      Some("WITH " + pqCtes(1, 64, 8, 2, "c") + ",\n" +
        pqCtes(4, 16, 8, 2, "p") + ",\n" +
        s"""ccells AS (SELECT vec_id, cell_id AS cell FROM (
           |    SELECT s.vec_id, c.cell_id,
           |      row_number() OVER (PARTITION BY s.vec_id, s.sub
           |        ORDER BY ${duckDist2("s.v", "c.centvec")} ASC,
           |          c.cell_id) AS rn
           |    FROM csv s JOIN ccent2 c ON s.sub = c.sub)
           |  WHERE rn = 1),
           |pcodes AS (SELECT vec_id, sub, cell_id AS code FROM (
           |    SELECT s.vec_id, s.sub, c.cell_id,
           |      row_number() OVER (PARTITION BY s.vec_id, s.sub
           |        ORDER BY ${duckDist2("s.v", "c.centvec")} ASC,
           |          c.cell_id) AS rn
           |    FROM psv s JOIN pcent2 c ON s.sub = c.sub)
           |  WHERE rn = 1),
           |iprobe AS (SELECT query_id, cell FROM (
           |    SELECT q.vec_id AS query_id, c.cell_id AS cell,
           |      row_number() OVER (PARTITION BY q.vec_id
           |        ORDER BY ${duckDist2("q.embedding", "c.centvec")}
           |          ASC, c.cell_id) AS rn
           |    FROM (SELECT vec_id, embedding FROM embeddings
           |          WHERE vec_id BETWEEN 100 AND 104) q
           |    JOIN ccent2 c ON c.sub = 0)
           |  WHERE rn <= 2),
           |iqt AS (SELECT s.vec_id AS query_id, s.sub,
           |    c.cell_id AS code,
           |    CAST(round(${duckDist2("s.v", "c.centvec")}
           |      * 1000000.0) AS BIGINT) AS tm
           |  FROM psv s JOIN pcent2 c ON s.sub = c.sub
           |  WHERE s.vec_id BETWEEN 100 AND 104),
           |iadm AS (SELECT pr.query_id, k.vec_id
           |  FROM ccells k JOIN iprobe pr ON k.cell = pr.cell
           |  WHERE k.vec_id <> pr.query_id),
           |inc AS (SELECT query_id,
           |    CAST(count(*) AS BIGINT) AS n_candidates
           |  FROM iadm GROUP BY 1),
           |iadc AS (SELECT a.query_id, a.vec_id AS neighbor_id,
           |    CAST(sum(t.tm) AS BIGINT) AS adc_micro
           |  FROM iadm a
           |  JOIN pcodes c2 ON c2.vec_id = a.vec_id
           |  JOIN iqt t ON t.query_id = a.query_id
           |    AND t.sub = c2.sub AND t.code = c2.code
           |  GROUP BY 1, 2),
           |itk AS (SELECT * FROM (
           |    SELECT query_id, neighbor_id, adc_micro,
           |      row_number() OVER (PARTITION BY query_id
           |        ORDER BY adc_micro ASC, neighbor_id ASC) AS "rank"
           |    FROM iadc) WHERE "rank" <= 10),
           |iexact AS (SELECT query_id, neighbor_id FROM (
           |    SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
           |      row_number() OVER (PARTITION BY q.vec_id
           |        ORDER BY CAST(round(
           |          ${duckDist2("e.embedding", "q.embedding")}
           |          * 1000000.0) AS BIGINT) ASC, e.vec_id) AS rn
           |    FROM embeddings e,
           |      (SELECT vec_id, embedding FROM embeddings
           |       WHERE vec_id BETWEEN 100 AND 104) q
           |    WHERE e.vec_id <> q.vec_id)
           |  WHERE rn <= 10),
           |irec AS (SELECT CAST(((SELECT count(*) FROM itk a
           |      JOIN iexact e USING (query_id, neighbor_id))
           |    * 1000000) // ((SELECT count(DISTINCT query_id)
           |      FROM itk) * 10) AS BIGINT) AS recall_ppm)
           |SELECT a.query_id, a."rank", a.neighbor_id, a.adc_micro,
           |  CASE WHEN e.neighbor_id IS NOT NULL THEN 1 ELSE 0 END
           |    AS exact_hit,
           |  n.n_candidates, recall_ppm
           |FROM itk a LEFT JOIN iexact e
           |  USING (query_id, neighbor_id)
           |JOIN inc n USING (query_id), irec
           |ORDER BY a.query_id, a."rank"""".stripMargin)
      ),

    // Exact two-sample KS (Drift.ksExact): src0-vs-src1 document
    // length distributions at full resolution — the sketch-free tier
    // above q257's binned KS, with D kept exact as the integer
    // max|cumA·nB − cumB·nA| over the value-distinct frame
    // (globalRowNumber + two prefixSum passes, never a single-task
    // window).
    QueryDef("q355_ks_exact",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        Drift.ksExact(
          docs.where(col("source") === "src0").select(col("n_chars")),
          docs.where(col("source") === "src1").select(col("n_chars")),
          "n_chars")
      },
      Some("""WITH pool AS (
             |  SELECT v, CAST(sum(ca) AS BIGINT) AS na,
             |    CAST(sum(cb) AS BIGINT) AS nb
             |  FROM (
             |    SELECT n_chars AS v, 1 AS ca, 0 AS cb FROM documents
             |    WHERE source = 'src0' AND n_chars IS NOT NULL
             |    UNION ALL
             |    SELECT n_chars, 0, 1 FROM documents
             |    WHERE source = 'src1' AND n_chars IS NOT NULL)
             |  GROUP BY v),
             |cum AS (SELECT v,
             |    sum(na) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
             |      AS cuma,
             |    sum(nb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
             |      AS cumb
             |  FROM pool),
             |tot AS (SELECT CAST(sum(na) AS BIGINT) AS n_a,
             |    CAST(sum(nb) AS BIGINT) AS n_b FROM pool),
             |ds AS (SELECT CAST(max(abs(cuma * n_b - cumb * n_a))
             |    AS BIGINT) AS d_star FROM cum, tot)
             |SELECT n_a, n_b, d_star,
             |  (d_star * 1000000) // (n_a * n_b) AS d_ppm,
             |  CAST(floor(CAST(d_star AS DOUBLE) /
             |    (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) *
             |    sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) /
             |      (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))) *
             |    1000.0) AS BIGINT) AS lambda_milli
             |FROM ds, tot""".stripMargin)),

    // Dedup-threshold sensitivity sweep (the planning table BEHIND
    // q61's 0.8): candidate pairs are found ONCE at the loosest
    // threshold (the LSH candidate set does not depend on τ), then
    // the three clusterings run as ONE connected-components pass —
    // node ids are lifted into disjoint per-threshold planes
    // (τ·10⁷ + doc_id), so one iterative convergence covers all
    // thresholds instead of three sequential chains. At sf0.1 the
    // LSH pair search dominates (~10 s, the minhashNearDups band
    // join) so wall-clock is flat, but the iterative TAIL drops from
    // 3 chains of driver-synchronized rounds to 1 — the part that
    // matters at 100 TB, where every extra chain is another full set
    // of convergence shuffles. Pair counts, cluster counts and the
    // removed-doc fraction per τ: the aggressiveness-vs-loss curve a
    // dedup run is tuned on.
    QueryDef("q356_threshold_sweep",
      (s, dir) => {
        val slice = t(s, dir, "documents").filter(col("doc_id") < 1000)
        val pairs0 = Dedup.minhashNearDups(slice, "doc_id", "text",
          k = 64, bands = 8, threshold = 0.7).localCheckpoint(true)
        val taus = Seq(700, 800, 900)
        def lift(p: Int, c: Column): Column = lit(p.toLong) * 10000000L + c
        val liftedNodes = taus.map(p => slice.select(
          lift(p, col("doc_id")).as("doc_id"))).reduce(_ unionByName _)
        val liftedPairs = taus.map(p =>
          pairs0.where(col("jaccard") >= p / 1000.0)
            .select(lift(p, col("id_a")).as("id_a"),
              lift(p, col("id_b")).as("id_b"))).reduce(_ unionByName _)
        val cl = Components.dedupClusters(liftedNodes, "doc_id",
            liftedPairs, "id_a", "id_b")
          .where(col("cluster_size") >= 2L)
          .withColumn("threshold_permil",
            expr("CAST(doc_id DIV 10000000L AS INT)"))
          .groupBy("threshold_permil")
          .agg(countDistinct("component").as("n_clusters"),
            count(lit(1)).as("n_docs_in_clusters"))
        val pc = taus.map(p =>
          pairs0.where(col("jaccard") >= p / 1000.0)
            .agg(count(lit(1)).as("n_pairs"))
            .select(lit(p).as("threshold_permil"), col("n_pairs")))
          .reduce(_ unionByName _)
        val n = slice.agg(count(lit(1)).as("_n"))
        // LEFT join: a threshold whose clustering is empty still
        // reports its row (0 clusters), never vanishes.
        pc.join(cl, Seq("threshold_permil"), "left")
          .select(col("threshold_permil"), col("n_pairs"),
            coalesce(col("n_clusters"), lit(0L)).as("n_clusters"),
            coalesce(col("n_docs_in_clusters"), lit(0L))
              .as("n_docs_in_clusters"))
          .crossJoin(broadcast(n))
          .select(col("threshold_permil"), col("n_pairs"),
            col("n_clusters"), col("n_docs_in_clusters"),
            (col("n_docs_in_clusters") - col("n_clusters"))
              .as("n_removed"),
            expr("((n_docs_in_clusters - n_clusters) * 1000000)" +
              " DIV _n").as("removed_ppm"))
          .orderBy("threshold_permil")
      },
      Some {
        val chains = Seq(700 -> "t7", 800 -> "t8", 900 -> "t9")
        val rs = chains.map { case (p, f) =>
          val thr = s"0.${p / 100}"
          s"""r$f AS (SELECT $p AS threshold_permil,
             |    (SELECT CAST(count(*) AS BIGINT) FROM verified
             |     WHERE jaccard >= $thr) AS n_pairs,
             |    (SELECT CAST(count(*) AS BIGINT) FROM ${f}sizes
             |     WHERE cluster_size >= 2) AS n_clusters,
             |    (SELECT CAST(coalesce(sum(cluster_size), 0)
             |       AS BIGINT) FROM ${f}sizes
             |     WHERE cluster_size >= 2) AS n_docs_in_clusters)"""
            .stripMargin
        }
        "WITH RECURSIVE " + minhashVerifiedCtes + ",\n" +
          chains.map { case (p, f) =>
            clusterChainCtesAt(s"0.${p / 100}", f)
          }.mkString(",\n") + ",\n" +
          rs.mkString(",\n") + "\n" +
          """SELECT threshold_permil, n_pairs, n_clusters,
            |  n_docs_in_clusters,
            |  n_docs_in_clusters - n_clusters AS n_removed,
            |  ((n_docs_in_clusters - n_clusters) * 1000000) //
            |    (SELECT count(*) FROM toks) AS removed_ppm
            |FROM (SELECT * FROM rt7 UNION ALL SELECT * FROM rt8
            |      UNION ALL SELECT * FROM rt9)
            |ORDER BY threshold_permil""".stripMargin
      }),

    // Flesch readability per source (TextAnalysis.readability):
    // reading-ease + Flesch–Kincaid grade from three exact integer
    // run counts (words, [.!?]+ sentence runs floored at 1/doc,
    // [aeiouy]+ vowel-group syllables) summed map-side — the classic
    // difficulty signal beside q85's surface-ratio quality tiers.
    QueryDef("q357_readability",
      (s, dir) => TextAnalysis.readability(
        t(s, dir, "documents"), "source", "text")
        .orderBy("source"),
      Some("""WITH perdoc AS (
             |  SELECT source,
             |    CAST(len(list_filter(string_split_regex(text, ' +'),
             |      x -> x <> '')) AS BIGINT) AS w,
             |    greatest(CAST(len(regexp_extract_all(text, '[.!?]+'))
             |      AS BIGINT), 1) AS st,
             |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
             |      AS BIGINT) AS y
             |  FROM documents),
             |g AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             |    CAST(sum(w) AS BIGINT) AS words,
             |    CAST(sum(st) AS BIGINT) AS sentences,
             |    CAST(sum(y) AS BIGINT) AS syllables
             |  FROM perdoc GROUP BY 1)
             |SELECT source, n_docs, words, sentences, syllables,
             |  round(CAST(words AS DOUBLE) / CAST(sentences AS DOUBLE),
             |    4) AS wps,
             |  CASE WHEN words > 0 THEN
             |    round(CAST(syllables AS DOUBLE) /
             |      CAST(words AS DOUBLE), 4) END AS spw,
             |  CASE WHEN words > 0 THEN round(206.835
             |    - 1.015 * (CAST(words AS DOUBLE) /
             |        CAST(sentences AS DOUBLE))
             |    - 84.6 * (CAST(syllables AS DOUBLE) /
             |        CAST(words AS DOUBLE)), 4) END AS flesch,
             |  CASE WHEN words > 0 THEN round(0.39
             |    * (CAST(words AS DOUBLE) / CAST(sentences AS DOUBLE))
             |    + 11.8 * (CAST(syllables AS DOUBLE) /
             |        CAST(words AS DOUBLE))
             |    - 15.59, 4) END AS fk_grade
             |FROM g ORDER BY source""".stripMargin)),

    // HLL sketch as a PERSISTED index (the q306/q308 stored-index
    // tier for q345's registers): the per-(source, bucket) register
    // table is written once at build time, and the distinct-count
    // question — per source AND corpus-wide via register-max merge —
    // is answered from the stored 64-longs-per-source table without
    // re-reading a byte of raw text. The oracle recomputes from raw,
    // proving the index path loses nothing.
    QueryDef("q358_hll_from_index",
      (s, dir) => {
        val toks = t(s, dir, "documents").select(col("source"),
          explode(split(col("text"), " +")).as("token"))
          .where(col("token") =!= "")
        Layout.replaceTable(s,
          CardinalityEstimate.hllRegisters(toks, "source", "token",
            p = 6),
          "graft_hll_registers")
        CardinalityEstimate.hllFromRegisters(
          Layout.table(s, "graft_hll_registers"), "source", p = 6)
          .orderBy("source")
      },
      Some {
        val h = Hashing.duckPortableHash("token")
        val rho = "CASE WHEN h // 64 = 0 THEN 55" +
          " ELSE 55 - length(bin(h // 64)) END"
        val alpha = "(0.7213 / (1.0 + 1.079 / 64.0))"
        val two55 = "(CAST(1 AS BIGINT) << 55)"
        s"""WITH tok AS (
           |  SELECT source, unnest(list_filter(
           |    string_split_regex(text, ' +'), t -> t <> '')) AS token
           |  FROM documents),
           |hh AS (SELECT source, token, $h AS h FROM tok),
           |rr AS (SELECT source, h % 64 AS b, max($rho) AS m
           |  FROM hh GROUP BY 1, 2),
           |sg AS (SELECT source,
           |    CAST(count(*) AS BIGINT) AS registers_used,
           |    64 - CAST(count(*) AS BIGINT) AS zeros,
           |    CAST(sum(CAST(1 AS BIGINT) << CAST(55 - m AS INT))
           |      AS BIGINT) +
           |      (64 - CAST(count(*) AS BIGINT)) * $two55 AS sum_scaled
           |  FROM rr GROUP BY 1),
           |est AS (SELECT *,
           |    $alpha * 64.0 * 64.0 * CAST($two55 AS DOUBLE) /
           |      CAST(sum_scaled AS DOUBLE) AS raw
           |  FROM sg),
           |est2 AS (SELECT *,
           |    CASE WHEN raw <= 2.5 * 64.0 AND zeros > 0
           |      THEN 64.0 * ln(64.0 / CAST(zeros AS DOUBLE))
           |      ELSE raw END AS e
           |  FROM est),
           |mrr AS (SELECT b, max(m) AS m FROM rr GROUP BY 1),
           |msum AS (SELECT 64 - CAST(count(*) AS BIGINT) AS zeros,
           |    CAST(sum(CAST(1 AS BIGINT) << CAST(55 - m AS INT))
           |      AS BIGINT) +
           |      (64 - CAST(count(*) AS BIGINT)) * $two55 AS ss
           |  FROM mrr),
           |mest AS (SELECT round(CASE WHEN raw <= 2.5 * 64.0
           |      AND zeros > 0
           |      THEN 64.0 * ln(64.0 / CAST(zeros AS DOUBLE))
           |      ELSE raw END, 2) AS merged_est
           |  FROM (SELECT zeros,
           |      $alpha * 64.0 * 64.0 * CAST($two55 AS DOUBLE) /
           |        CAST(ss AS DOUBLE) AS raw
           |    FROM msum))
           |SELECT source, registers_used, zeros, sum_scaled,
           |  round(e, 2) AS hll_est, merged_est
           |FROM est2, mest
           |ORDER BY source""".stripMargin
      }),

    // Exact grouped quantiles at scale (Rank.groupedQuantiles):
    // p50/p90/p99 of event value per event_type WITHOUT a skewed
    // per-group window — few-huge-groups is exactly where
    // Window.partitionBy(group) funnels each group through one task;
    // here ONE distributed range-partitioned sort ranks everything
    // and the order statistics are a broadcast semi-join on rank.
    // Exact disc (type-1) semantics, no sketch, no interpolation.
    QueryDef("q359_exact_quantiles",
      (s, dir) => Rank.groupedQuantiles(
        t(s, dir, "events"), "event_type", "value", "event_id",
        qsPermil = Seq(500, 900, 990))
        .orderBy("event_type", "q_permil"),
      Some("""WITH v AS (SELECT event_type, value, event_id
             |  FROM events WHERE value IS NOT NULL),
             |r AS (SELECT event_type, value, row_number() OVER (
             |    PARTITION BY event_type ORDER BY value, event_id)
             |      AS rk
             |  FROM v),
             |n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
             |  FROM v GROUP BY 1),
             |q AS (SELECT * FROM (VALUES (500), (900), (990))
             |  t(q_permil)),
             |w AS (SELECT n.event_type, q.q_permil, n.n,
             |    (q.q_permil * (n.n - 1)) // 1000 + 1 AS rk
             |  FROM n, q)
             |SELECT w.event_type, CAST(w.q_permil AS INT) AS q_permil,
             |  w.n, r.value
             |FROM w JOIN r ON r.event_type = w.event_type
             |  AND r.rk = w.rk
             |ORDER BY w.event_type, w.q_permil""".stripMargin)),

    // The persisted near-dup cluster map probed as a first-class
    // query (Components.writeClusterIndex + clustersFromIndex): q61's
    // clusters served from the doc_id-bucketed stored table — the
    // fourth index beside bands (q93), codes (q306), postings (q308).
    // The probe is a per-doc min resolve (exchange-free on the bucket
    // layout) + one size aggregate; no minhash fold, no component
    // iteration anywhere in the returned plan (LayoutSpec-asserted).
    // Oracle is q61's verbatim recursive chain: the stored-map path
    // must reproduce the inline path bit for bit.
    QueryDef("q360_clusters_from_index",
      (s, dir) => ndClusters(s, dir).orderBy("doc_id"),
      Some("WITH RECURSIVE " + minhashVerifiedCtes + ",\n" +
        clusterChainCtes + "\n" +
        """SELECT comp.id AS doc_id, comp.component, sizes.cluster_size
          |FROM comp JOIN sizes USING (component)
          |ORDER BY doc_id""".stripMargin)),

    // Incremental cluster maintenance on append
    // (Components.mergeClusterIndex): the corpus is split — the first
    // half builds the stored map, the second half arrives as an
    // INGEST BATCH whose pairs (batch-internal + batch↔corpus, same
    // banding) MERGE into the map via union-find over the touched
    // components only, appending relabel rows (labels only shrink, so
    // the min-resolve probe absorbs stale generations). The oracle is
    // the FULL-REBUILD chain over the whole slice: maintenance must
    // be indistinguishable from rebuilding — that equivalence is the
    // actual 100 TB dedup story, clusters surviving ingest without
    // ever re-pairing the corpus against itself.
    QueryDef("q361_cluster_merge",
      (s, dir) => {
        val docs = t(s, dir, "documents")
          .filter(col("doc_id") < 1000).select("doc_id", "text")
        val old = docs.filter(col("doc_id") < 500)
        val batch = docs.filter(col("doc_id") >= 500)
          .localCheckpoint(true)
        val oldPairs = Dedup.minhashNearDups(old, "doc_id", "text",
          k = 64, bands = 8, threshold = 0.8)
        Components.writeClusterIndex(s, old, "doc_id", oldPairs,
          "id_a", "id_b", "graft_cluster_map_m", buckets = 8)
        val cross = Dedup.incrementalNearDups(batch, old, "doc_id",
          "text", k = 64, bands = 8, threshold = 0.8)
        val internal = Dedup.minhashNearDups(batch, "doc_id", "text",
          k = 64, bands = 8, threshold = 0.8)
        Components.mergeClusterIndex(s, "graft_cluster_map_m",
          batch, "doc_id", internal, "id_a", "id_b",
          cross, "batch_id", "index_id", buckets = 8)
        Components
          .clustersFromIndex(Layout.table(s, "graft_cluster_map_m"))
          .orderBy("doc_id")
      },
      Some("WITH RECURSIVE " + minhashVerifiedCtes + ",\n" +
        clusterChainCtes + "\n" +
        """SELECT comp.id AS doc_id, comp.component, sizes.cluster_size
          |FROM comp JOIN sizes USING (component)
          |ORDER BY doc_id""".stripMargin)),

    // Cluster-map generation compaction (Components
    // .compactClusterIndex): q361's build+merge leaves relabel
    // generations in the stored table (every probe min-resolves
    // them); compaction rewrites the table as the resolved
    // one-row-per-doc view on the same bucket layout. The query
    // compacts, AUDITS the row-per-doc invariant in-plan (n_rows,
    // n_docs, generations collapsed to equality), and returns the
    // probed clusters — which must STILL match the full-rebuild
    // oracle bit for bit. Plain Layout.compactBucketed cannot do
    // this (distinct keeps stale labels); the index-specific heal is
    // resolve-then-rewrite, which commutes with the probe.
    QueryDef("q362_cluster_compaction",
      (s, dir) => {
        val docs = t(s, dir, "documents")
          .filter(col("doc_id") < 1000).select("doc_id", "text")
        val old = docs.filter(col("doc_id") < 500)
        val batch = docs.filter(col("doc_id") >= 500)
          .localCheckpoint(true)
        val oldPairs = Dedup.minhashNearDups(old, "doc_id", "text",
          k = 64, bands = 8, threshold = 0.8)
        Components.writeClusterIndex(s, old, "doc_id", oldPairs,
          "id_a", "id_b", "graft_cluster_map_c", buckets = 8)
        val cross = Dedup.incrementalNearDups(batch, old, "doc_id",
          "text", k = 64, bands = 8, threshold = 0.8)
        val internal = Dedup.minhashNearDups(batch, "doc_id", "text",
          k = 64, bands = 8, threshold = 0.8)
        Components.mergeClusterIndex(s, "graft_cluster_map_c",
          batch, "doc_id", internal, "id_a", "id_b",
          cross, "batch_id", "index_id", buckets = 8)
        Components.compactClusterIndex(s, "graft_cluster_map_c",
          buckets = 8)
        val idx = Layout.table(s, "graft_cluster_map_c")
        val audit = broadcast(idx.agg(
          count(lit(1)).as("n_rows"),
          countDistinct(col("doc_id")).as("n_docs")))
        Components.clustersFromIndex(idx)
          .crossJoin(audit)
          .orderBy("doc_id")
      },
      Some("WITH RECURSIVE " + minhashVerifiedCtes + ",\n" +
        clusterChainCtes + "\n" +
        """SELECT comp.id AS doc_id, comp.component, sizes.cluster_size,
          |  (SELECT count(*) FROM comp) AS n_rows,
          |  (SELECT count(*) FROM comp) AS n_docs
          |FROM comp JOIN sizes USING (component)
          |ORDER BY doc_id""".stripMargin)),

    // Persisted quantile-sketch index (Stats.histPartials +
    // histPercentilesFromIndex): per-(lang, shard) histogram partial
    // rows stored lang-bucketed; the probe folds shards with one
    // combinable integer sum — bit-identical to a single-pass build,
    // counts are sums — then answers q151's percentiles by the same
    // crossing interpolation WITHOUT touching a corpus row. The whole
    // probe (merge, cum window, crossing) rides the lang bucket
    // layout: hashpartitioning(lang) satisfies every stage's
    // clustering, so the stored path plans no index-side exchange.
    // Oracle is q151's analytic rebuild verbatim — shard-merge
    // exactness is the claim under test (the monitoring-index answer
    // a 100 TB pipeline serves instead of re-scanning data).
    QueryDef("q363_quantiles_from_index",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        Layout.replaceBucketed(s,
          Stats.histPartials(
            docs.withColumn("shard", pmod(col("doc_id"), lit(4L))),
            "lang", "shard", "n_chars",
            lo = 0.0, hi = 1024.0, nbins = 256),
          "graft_hist_idx", "lang", buckets = 8)
        Stats.histPercentilesFromIndex(
          Layout.table(s, "graft_hist_idx"), "lang",
          lo = 0.0, hi = 1024.0, nbins = 256,
          ps = Seq(0.25, 0.5, 0.9, 0.99))
          .orderBy("lang", "p")
      },
      Some("""WITH v AS (
             |  SELECT lang, CAST(n_chars AS DOUBLE) AS v FROM documents
             |  WHERE n_chars IS NOT NULL),
             |b AS (SELECT lang, CAST(least(greatest(floor(v / 4.0), 0), 255)
             |        AS BIGINT) AS b FROM v),
             |c AS (SELECT lang, b, count(*) AS cnt FROM b GROUP BY lang, b),
             |cc AS (SELECT lang, b, cnt,
             |         sum(cnt) OVER (PARTITION BY lang ORDER BY b) AS cum,
             |         sum(cnt) OVER (PARTITION BY lang) AS total
             |       FROM c),
             |p AS (SELECT CAST(unnest([0.25, 0.5, 0.9, 0.99]) AS DOUBLE) AS p)
             |SELECT lang, p, CAST(total AS BIGINT) AS n,
             |  round(4.0 * (CAST(b AS DOUBLE)
             |    + (p * CAST(total AS DOUBLE) - CAST(cum - cnt AS DOUBLE))
             |      / CAST(cnt AS DOUBLE)), 4) + 0.0 AS est
             |FROM cc, p
             |WHERE CAST(cum AS DOUBLE) >= p * CAST(total AS DOUBLE)
             |  AND CAST(cum - cnt AS DOUBLE) < p * CAST(total AS DOUBLE)
             |ORDER BY lang, p""".stripMargin)),

    // Corpus ↔ index synchronization audit (Reconcile.indexSync) —
    // the operational health check incremental maintenance makes
    // necessary: the cluster map is built on the doc_id < 300 slice,
    // then audited against a DRIFTED corpus (docs 50–499: 300–499
    // appended but never ingested = missing; 0–49 deleted from the
    // corpus but still indexed = orphaned). Both sides dedup to doc
    // grain (the map may hold relabel generations), one full-outer
    // join + one combinable aggregate; the oracle recomputes the
    // same set algebra from the documents table — the index's
    // CONTENTS are its build slice's ids by construction.
    QueryDef("q364_index_sync",
      (s, dir) => {
        val docs = t(s, dir, "documents").select("doc_id", "text")
        val indexed = docs.filter(col("doc_id") < 300)
        val pairs = Dedup.minhashNearDups(indexed, "doc_id", "text",
          k = 64, bands = 8, threshold = 0.8)
        Components.writeClusterIndex(s, indexed, "doc_id", pairs,
          "id_a", "id_b", "graft_cluster_map_s", buckets = 8)
        val corpus = t(s, dir, "documents")
          .filter(col("doc_id") >= 50 && col("doc_id") < 500)
        Reconcile.indexSync(corpus, "doc_id",
          Layout.table(s, "graft_cluster_map_s"), "doc_id")
      },
      Some("""WITH c AS (SELECT DISTINCT doc_id FROM documents
             |  WHERE doc_id >= 50 AND doc_id < 500),
             |i AS (SELECT DISTINCT doc_id FROM documents
             |  WHERE doc_id < 300),
             |j AS (SELECT c.doc_id AS cid, i.doc_id AS iid
             |  FROM c FULL OUTER JOIN i ON c.doc_id = i.doc_id)
             |SELECT CAST(count(cid) AS BIGINT) AS n_corpus,
             |  CAST(count(iid) AS BIGINT) AS n_indexed,
             |  CAST(sum(CASE WHEN iid IS NULL THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_missing,
             |  CAST(sum(CASE WHEN cid IS NULL THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_orphaned,
             |  CAST((count(cid) - sum(CASE WHEN iid IS NULL THEN 1
             |    ELSE 0 END)) * 1000000 // greatest(count(cid), 1)
             |    AS BIGINT) AS sync_ppm
             |FROM j""".stripMargin)),

    // Right-to-be-forgotten, closed loop (Layout.forgetKeys +
    // Reconcile.indexSync): deletion from a persisted index is only
    // DONE when an audit proves it. The cluster map is built on the
    // doc_id < 300 slice, every 50th doc is deleted from the CORPUS,
    // and the pre-forget audit shows them as orphaned index entries
    // (still probe-able — the residual risk); Layout.forgetKeys then
    // rewrites the index minus those keys and the post-forget audit
    // certifies zero orphans, zero missing. The pre row materializes
    // (localCheckpoint) BEFORE the forget mutates the table — the
    // lazy-evaluation trap every read-then-rewrite composition must
    // dodge. Oracle is pure set algebra on the documents table.
    QueryDef("q365_forget_audit",
      (s, dir) => {
        val docs = t(s, dir, "documents").select("doc_id", "text")
        val indexed = docs.filter(col("doc_id") < 300)
        val pairs = Dedup.minhashNearDups(indexed, "doc_id", "text",
          k = 64, bands = 8, threshold = 0.8)
        Components.writeClusterIndex(s, indexed, "doc_id", pairs,
          "id_a", "id_b", "graft_cluster_map_f", buckets = 8)
        val deleted = indexed
          .filter(col("doc_id") % 50L === 0L).select("doc_id")
        val remaining = indexed
          .join(deleted, Seq("doc_id"), "left_anti")
        val pre = Reconcile.indexSync(remaining, "doc_id",
            Layout.table(s, "graft_cluster_map_f"), "doc_id")
          .withColumn("phase", lit("pre_forget"))
          .localCheckpoint(true)
        Layout.forgetKeys(s, "graft_cluster_map_f", "doc_id",
          "doc_id", deleted, buckets = 8)
        val post = Reconcile.indexSync(remaining, "doc_id",
            Layout.table(s, "graft_cluster_map_f"), "doc_id")
          .withColumn("phase", lit("post_forget"))
        pre.unionByName(post)
          .select("phase", "n_corpus", "n_indexed", "n_missing",
            "n_orphaned", "sync_ppm")
          .orderBy("phase")
      },
      Some("""WITH idx AS (SELECT DISTINCT doc_id FROM documents
             |  WHERE doc_id < 300),
             |d AS (SELECT count(*) AS nd FROM idx WHERE doc_id % 50 = 0),
             |r AS (SELECT count(*) AS nr FROM idx WHERE doc_id % 50 <> 0)
             |SELECT 'pre_forget' AS phase,
             |  CAST(nr AS BIGINT) AS n_corpus,
             |  CAST(nr + nd AS BIGINT) AS n_indexed,
             |  CAST(0 AS BIGINT) AS n_missing,
             |  CAST(nd AS BIGINT) AS n_orphaned,
             |  CAST(1000000 AS BIGINT) AS sync_ppm
             |FROM d, r
             |UNION ALL
             |SELECT 'post_forget', CAST(nr AS BIGINT),
             |  CAST(nr AS BIGINT), CAST(0 AS BIGINT),
             |  CAST(0 AS BIGINT), CAST(1000000 AS BIGINT)
             |FROM d, r
             |ORDER BY phase""".stripMargin)),

    // Mojibake (UTF-8-as-Latin-1) detection + bounded-table repair
    // (Encoding.signatureHits / repairCommon): damage is PLANTED on a
    // deterministic quarter of the corpus (the q333 pattern — both
    // engines corrupt identically, so detection/repair is checked on
    // known ground truth), then the audit reports per source how many
    // docs were flagged, total signature hits, how many docs still
    // carry signatures after repair (must be 0), and how many rows
    // exactly match the expected repaired text. Per-row scalar
    // expressions + one map-side-combinable groupBy — the hygiene
    // pass rides the corpus scan, no extra shuffle at any scale.
    QueryDef("q366_mojibake_repair",
      (s, dir) => {
        val hit = pmod(Hashing.portableHash(
          col("doc_id").cast("string")), lit(4)) === 0
        val planted = t(s, dir, "documents")
          .select(col("source"),
            when(hit, replace(
                replace(col("text"), lit(" the "), lit(" thÃ© ")),
                lit(" is "), lit(" â€™is ")))
              .otherwise(col("text")).as("corrupt"),
            when(hit, replace(
                replace(col("text"), lit(" the "), lit(" thé ")),
                lit(" is "), lit(" ’is ")))
              .otherwise(col("text")).as("expected"))
          .withColumn("sig", Encoding.signatureHits(col("corrupt")))
          .withColumn("fixed", Encoding.repairCommon(col("corrupt")))
          .withColumn("sig_after", Encoding.signatureHits(col("fixed")))
        planted.groupBy("source").agg(
            count(lit(1)).as("n_docs"),
            sum(when(col("sig") > 0, 1L).otherwise(0L)).as("n_flagged"),
            sum(col("sig")).as("sig_hits"),
            sum(when(col("sig_after") > 0, 1L).otherwise(0L))
              .as("n_dirty_after"),
            sum(when(col("fixed") === col("expected"), 1L).otherwise(0L))
              .as("n_restored"))
          .orderBy("source")
      },
      Some {
        val h = Hashing.duckPortableHash("CAST(doc_id AS VARCHAR)")
        def sig(c: String) = Encoding.signatures.map { case (k, _) =>
          s"(length($c) - length(replace($c, '$k', ''))) // ${k.length}"
        }.mkString("(", " + ", ")")
        val fix = Encoding.signatures.foldLeft("corrupt") {
          case (acc, (k, v)) => s"replace($acc, '$k', '$v')"
        }
        s"""WITH pl AS (
           |  SELECT source,
           |    CASE WHEN $h % 4 = 0 THEN replace(replace(text,
           |        ' the ', ' thÃ© '), ' is ', ' â€™is ')
           |      ELSE text END AS corrupt,
           |    CASE WHEN $h % 4 = 0 THEN replace(replace(text,
           |        ' the ', ' thé '), ' is ', ' ’is ')
           |      ELSE text END AS expected
           |  FROM documents),
           |rp AS (SELECT source, expected,
           |    ${sig("corrupt")} AS sig, $fix AS fixed
           |  FROM pl),
           |rp2 AS (SELECT source, expected, sig, fixed,
           |    ${sig("fixed")} AS sig_after
           |  FROM rp)
           |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(CASE WHEN sig > 0 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_flagged,
           |  CAST(sum(sig) AS BIGINT) AS sig_hits,
           |  CAST(sum(CASE WHEN sig_after > 0 THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_dirty_after,
           |  CAST(sum(CASE WHEN fixed = expected THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_restored
           |FROM rp2 GROUP BY source ORDER BY source""".stripMargin
      }),

    // INDEX-ONLY corpus health dashboard
    // (CorpusPipeline.healthFromIndexes): the nightly report a 100 TB
    // pipeline serves without touching a corpus row. The build half
    // persists four indexes on the governance slice (cluster map via
    // ensureNearDupIndex, doc_id-bucketed docstore dimension, HLL
    // register table, histogram partials); the RETURNED plan's only
    // leaves are those stored tables (LayoutSpec-asserted — no
    // testdata scan anywhere). Per source: doc counts + near-dup
    // exposure from the cluster map, distinct-token HLL estimate
    // (+ the merged all-source estimate, the register-max merge law),
    // p50/p90 length from the histogram sketch. Oracle recomputes all
    // three sketch families from the raw slice — index fidelity
    // end-to-end in one row-hash.
    QueryDef("q367_index_dashboard",
      (s, dir) => {
        ensureNearDupIndex(s, dir)
        val slice = t(s, dir, "documents").filter(col("doc_id") < 1000)
        Layout.replaceBucketed(s, slice.select("doc_id", "source"),
          "graft_dash_docstore", "doc_id", buckets = 8)
        val toks = slice.select(col("source"),
          explode(split(col("text"), " +")).as("token"))
          .where(col("token") =!= "")
        Layout.replaceTable(s,
          CardinalityEstimate.hllRegisters(toks, "source", "token",
            p = 6),
          "graft_dash_hll")
        Layout.replaceBucketed(s,
          Stats.histPartials(slice.withColumn("_shard", lit(0L)),
            "source", "_shard", "n_chars", lo = 0.0, hi = 1024.0,
            nbins = 256),
          "graft_dash_hist", "source", buckets = 8)
        CorpusPipeline.healthFromIndexes(
          Layout.table(s, "graft_cluster_map"),
          Layout.table(s, "graft_dash_docstore"),
          Layout.table(s, "graft_dash_hll"),
          Layout.table(s, "graft_dash_hist"),
          "source", p = 6, lo = 0.0, hi = 1024.0, nbins = 256)
          .orderBy("source")
      },
      Some {
        val h = Hashing.duckPortableHash("token")
        val rho = "CASE WHEN h // 64 = 0 THEN 55" +
          " ELSE 55 - length(bin(h // 64)) END"
        val alpha = "(0.7213 / (1.0 + 1.079 / 64.0))"
        val two55 = "(CAST(1 AS BIGINT) << 55)"
        "WITH RECURSIVE " + minhashVerifiedCtes + ",\n" +
        clusterChainCtes + ",\n" +
        s"""sl AS (SELECT * FROM documents WHERE doc_id < 1000),
           |dup AS (SELECT d.source,
           |    CAST(count(*) AS BIGINT) AS n_docs,
           |    CAST(sum(CASE WHEN z.cluster_size > 1 THEN 1 ELSE 0
           |      END) AS BIGINT) AS n_dup_docs
           |  FROM comp c JOIN sizes z USING (component)
           |  JOIN sl d ON d.doc_id = c.id
           |  GROUP BY 1),
           |tok AS (SELECT source, unnest(list_filter(
           |    string_split_regex(text, ' +'), t -> t <> '')) AS token
           |  FROM sl),
           |hh AS (SELECT source, token, $h AS h FROM tok),
           |rr AS (SELECT source, h % 64 AS b, max($rho) AS m
           |  FROM hh GROUP BY 1, 2),
           |sg AS (SELECT source,
           |    CAST(count(*) AS BIGINT) AS ru,
           |    64 - CAST(count(*) AS BIGINT) AS zeros,
           |    CAST(sum(CAST(1 AS BIGINT) << CAST(55 - m AS INT))
           |      AS BIGINT) +
           |      (64 - CAST(count(*) AS BIGINT)) * $two55 AS ss
           |  FROM rr GROUP BY 1),
           |est AS (SELECT source, round(CASE WHEN raw <= 2.5 * 64.0
           |      AND zeros > 0
           |      THEN 64.0 * ln(64.0 / CAST(zeros AS DOUBLE))
           |      ELSE raw END, 2) AS distinct_tokens_est
           |  FROM (SELECT source, zeros,
           |      $alpha * 64.0 * 64.0 * CAST($two55 AS DOUBLE) /
           |        CAST(ss AS DOUBLE) AS raw
           |    FROM sg)),
           |mrr AS (SELECT b, max(m) AS m FROM rr GROUP BY 1),
           |mest AS (SELECT round(CASE WHEN raw <= 2.5 * 64.0
           |      AND zeros > 0
           |      THEN 64.0 * ln(64.0 / CAST(zeros AS DOUBLE))
           |      ELSE raw END, 2) AS corpus_distinct_est
           |  FROM (SELECT 64 - CAST(count(*) AS BIGINT) AS zeros,
           |      $alpha * 64.0 * 64.0 * CAST($two55 AS DOUBLE) /
           |        CAST(CAST(sum(CAST(1 AS BIGINT) <<
           |            CAST(55 - m AS INT)) AS BIGINT) +
           |          (64 - CAST(count(*) AS BIGINT)) * $two55
           |          AS DOUBLE) AS raw
           |    FROM mrr)),
           |vv AS (SELECT source, CAST(n_chars AS DOUBLE) AS v
           |  FROM sl WHERE n_chars IS NOT NULL),
           |bkt AS (SELECT source, CAST(least(greatest(
           |    floor(v / 4.0), 0), 255) AS BIGINT) AS b FROM vv),
           |cb AS (SELECT source, b, count(*) AS cnt
           |  FROM bkt GROUP BY 1, 2),
           |cc2 AS (SELECT source, b, cnt,
           |    sum(cnt) OVER (PARTITION BY source ORDER BY b) AS cum,
           |    sum(cnt) OVER (PARTITION BY source) AS total
           |  FROM cb),
           |pp AS (SELECT CAST(unnest([0.5, 0.9]) AS DOUBLE) AS p),
           |qrows AS (SELECT source, p,
           |    round(4.0 * (CAST(b AS DOUBLE)
           |      + (p * CAST(total AS DOUBLE)
           |         - CAST(cum - cnt AS DOUBLE))
           |        / CAST(cnt AS DOUBLE)), 4) + 0.0 AS est
           |  FROM cc2, pp
           |  WHERE CAST(cum AS DOUBLE) >= p * CAST(total AS DOUBLE)
           |    AND CAST(cum - cnt AS DOUBLE) < p * CAST(total AS DOUBLE)),
           |qp AS (SELECT source,
           |    max(CASE WHEN p = 0.5 THEN est END) AS p50_chars,
           |    max(CASE WHEN p = 0.9 THEN est END) AS p90_chars
           |  FROM qrows GROUP BY 1)
           |SELECT dup.source, dup.n_docs, dup.n_dup_docs,
           |  dup.n_dup_docs * 1000000 // dup.n_docs AS dup_ppm,
           |  est.distinct_tokens_est, mest.corpus_distinct_est,
           |  qp.p50_chars, qp.p90_chars
           |FROM dup
           |JOIN est USING (source)
           |JOIN qp USING (source), mest
           |ORDER BY dup.source""".stripMargin
      }),

    // Entropic optimal transport per source (Drift.sinkhornToReference,
    // Cuturi '13): OT distance from each source's length distribution
    // to the pooled corpus reference — the metric-aware drift number
    // KS/PSI can't express (a uniform one-bin shift is cheap under OT,
    // saturating under PSI). One corpus pass builds the histogram;
    // the 8 Sinkhorn rounds run on model-sized frames (B² kernel
    // literal, groups × B scalings, Iterate-pinned). The oracle
    // unrolls the rounds as materialized CTEs (q118's GD-loop
    // precedent); only the emitted cost is rounded.
    QueryDef("q368_sinkhorn_ot",
      (s, dir) => Drift.sinkhornToReference(
          t(s, dir, "documents"), "source", "n_chars",
          lo = 0.0, hi = 1024.0, nbins = 16, eps = 0.1, iters = 8)
        .orderBy("source"),
      Some {
        val iters = 8
        val rounds = (1 to iters).map { i =>
          s"""u$i AS (SELECT p.g, p.i,
             |    CASE WHEN p.m > 0 THEN p.m / kv.s ELSE 0.0 END AS uu
             |  FROM pm p JOIN (
             |    SELECT v.g, k.i, sum(k.k * v.vv) AS s
             |    FROM v${i - 1} v JOIN kk k ON k.j = v.j
             |    GROUP BY 1, 2) kv
             |    ON kv.g = p.g AND kv.i = p.i),
             |v$i AS MATERIALIZED (SELECT ktu.g, ktu.j,
             |    CASE WHEN qm.qm > 0 THEN qm.qm / ktu.s2
             |      ELSE 0.0 END AS vv
             |  FROM (SELECT u.g, k.j, sum(k.k * u.uu) AS s2
             |    FROM u$i u JOIN kk k ON k.i = u.i
             |    GROUP BY 1, 2) ktu
             |  JOIN qm ON qm.j = ktu.j)""".stripMargin
        }.mkString(",\n")
        s"""WITH bb AS (
           |  SELECT source AS g, CAST(least(greatest(
           |    floor((CAST(n_chars AS DOUBLE) - 0.0) / 64.0),
           |    0), 15) AS BIGINT) AS b
           |  FROM documents WHERE n_chars IS NOT NULL),
           |cn AS MATERIALIZED (
           |  SELECT g, b, count(*) AS cnt FROM bb GROUP BY 1, 2),
           |pm AS MATERIALIZED (SELECT g, b AS i,
           |    CAST(cnt AS DOUBLE) /
           |      CAST(sum(cnt) OVER (PARTITION BY g) AS DOUBLE) AS m
           |  FROM cn),
           |qm AS MATERIALIZED (SELECT b AS j,
           |    CAST(sum(cnt) AS DOUBLE) /
           |      (SELECT CAST(sum(cnt) AS DOUBLE) FROM cn) AS qm
           |  FROM cn GROUP BY 1),
           |kk AS MATERIALIZED (SELECT i.i, j.j,
           |    exp(-(abs(i.i - j.j) / 15.0) / 0.1) AS k,
           |    abs(i.i - j.j) / 15.0 AS c
           |  FROM (SELECT unnest(generate_series(0, 15)) AS i) i,
           |       (SELECT unnest(generate_series(0, 15)) AS j) j),
           |v0 AS MATERIALIZED (SELECT gs.g, qm.j, 1.0 AS vv
           |  FROM (SELECT DISTINCT g FROM cn) gs, qm),
           |$rounds,
           |uf AS (SELECT p.g, p.i,
           |    CASE WHEN p.m > 0 THEN p.m / kv.s ELSE 0.0 END AS uu
           |  FROM pm p JOIN (
           |    SELECT v.g, k.i, sum(k.k * v.vv) AS s
           |    FROM v$iters v JOIN kk k ON k.j = v.j
           |    GROUP BY 1, 2) kv
           |    ON kv.g = p.g AND kv.i = p.i),
           |cost AS (SELECT u.g, sum(u.uu * k.k * v.vv * k.c) AS cost
           |  FROM uf u
           |  JOIN kk k ON k.i = u.i
           |  JOIN v$iters v ON v.g = u.g AND v.j = k.j
           |  GROUP BY 1),
           |ns AS (SELECT g, CAST(count(*) AS BIGINT) AS n
           |  FROM bb GROUP BY 1)
           |SELECT ns.g AS source, ns.n,
           |  round(cost.cost, 6) + 0.0 AS ot_cost
           |FROM ns JOIN cost ON cost.g = ns.g
           |ORDER BY source""".stripMargin
      }),

    // Entropic Wasserstein barycenter of the per-source length
    // distributions (Drift.sinkhornBarycenter, Benamou et al. '15
    // iterative Bregman projections, equal weights): the principled
    // TARGET profile for mixture rebalancing — the distribution
    // closest in transport cost to every source at once, where the
    // naive pooled histogram (emitted beside it) just mirrors the
    // biggest source. Same scale shape as q368: one corpus pass,
    // then dense model-sized (groups × bins) rounds. Oracle unrolls
    // the u/φ/b/v projections as materialized CTEs.
    QueryDef("q369_ot_barycenter",
      (s, dir) => Drift.sinkhornBarycenter(
          t(s, dir, "documents"), "source", "n_chars",
          lo = 0.0, hi = 1024.0, nbins = 16, eps = 0.1, iters = 8)
        .orderBy("b"),
      Some {
        s"""WITH ${otBaryCtes(8)},
           |pc AS (SELECT b, count(*) AS c FROM bb GROUP BY 1),
           |pt AS (SELECT CAST(count(*) AS DOUBLE) AS t FROM bb)
           |SELECT bins.b,
           |  round(coalesce(bf.bm, 0.0), 6) + 0.0 AS bary,
           |  round(CAST(coalesce(pc.c, 0) AS DOUBLE) / pt.t, 6) + 0.0
           |    AS pooled
           |FROM bins
           |LEFT JOIN b8 bf ON bf.j = bins.b
           |LEFT JOIN pc ON pc.b = bins.b, pt
           |ORDER BY bins.b""".stripMargin
      }),

    // Per-source OT distance TO the barycenter (sinkhornBarycenter →
    // sinkhornFromHists): the mixture-planning loop closed — q369
    // plans the target profile, this ranks the sources by how much
    // transport each needs to reach it (the rebalancing priority
    // order). The ROUNDED barycenter (round 6, exactly as q369 emits
    // it) is the reference on both engines, so the second Sinkhorn
    // block starts from bit-identical masses. Oracle = q369's IBP
    // chain + q368's distance rounds against the normalized b8.
    QueryDef("q371_ot_to_barycenter",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val bary = Drift.sinkhornBarycenter(docs, "source", "n_chars",
            lo = 0.0, hi = 1024.0, nbins = 16, eps = 0.1, iters = 8)
          .select(col("b").as("_b"), col("bary").as("_cnt"))
        val hist = Drift.binCounts(docs, "source", "n_chars",
          lo = 0.0, hi = 1024.0, nbins = 16)
        Drift.sinkhornFromHists(hist, bary, nbins = 16,
            eps = 0.1, iters = 8)
          .withColumnRenamed("_g", "source")
          .orderBy("source")
      },
      Some {
        val iters = 8
        val rounds = (1 to iters).map { i =>
          s"""du$i AS (SELECT p.g, p.i,
             |    CASE WHEN p.m > 0 THEN p.m / kv.s ELSE 0.0 END AS uu
             |  FROM pm p JOIN (
             |    SELECT v.g, k.i, sum(k.k * v.vv) AS s
             |    FROM dv${i - 1} v JOIN kd k ON k.j = v.j
             |    GROUP BY 1, 2) kv
             |    ON kv.g = p.g AND kv.i = p.i),
             |dv$i AS MATERIALIZED (SELECT ktu.g, ktu.j,
             |    CASE WHEN bq.qm > 0 THEN bq.qm / ktu.s2
             |      ELSE 0.0 END AS vv
             |  FROM (SELECT u.g, k.j, sum(k.k * u.uu) AS s2
             |    FROM du$i u JOIN kd k ON k.i = u.i
             |    GROUP BY 1, 2) ktu
             |  JOIN bq ON bq.j = ktu.j)""".stripMargin
        }.mkString(",\n")
        s"""WITH ${otBaryCtes(8)},
           |bq AS MATERIALIZED (SELECT j,
           |    (round(bm, 6) + 0.0) /
           |      (SELECT sum(round(bm, 6) + 0.0) FROM b8) AS qm
           |  FROM b8),
           |kd AS MATERIALIZED (SELECT i.i, j.j,
           |    exp(-(abs(i.i - j.j) / 15.0) / 0.1) AS k,
           |    abs(i.i - j.j) / 15.0 AS c
           |  FROM (SELECT unnest(generate_series(0, 15)) AS i) i,
           |       (SELECT unnest(generate_series(0, 15)) AS j) j),
           |dv0 AS MATERIALIZED (SELECT gs.g, bins.b AS j, 1.0 AS vv
           |  FROM gs CROSS JOIN bins),
           |$rounds,
           |duf AS (SELECT p.g, p.i,
           |    CASE WHEN p.m > 0 THEN p.m / kv.s ELSE 0.0 END AS uu
           |  FROM pm p JOIN (
           |    SELECT v.g, k.i, sum(k.k * v.vv) AS s
           |    FROM dv$iters v JOIN kd k ON k.j = v.j
           |    GROUP BY 1, 2) kv
           |    ON kv.g = p.g AND kv.i = p.i),
           |dcost AS (SELECT u.g, sum(u.uu * k.k * v.vv * k.c) AS cost
           |  FROM duf u
           |  JOIN kd k ON k.i = u.i
           |  JOIN dv$iters v ON v.g = u.g AND v.j = k.j
           |  GROUP BY 1),
           |dns AS (SELECT g, CAST(sum(cnt) AS BIGINT) AS n
           |  FROM cn GROUP BY 1)
           |SELECT dns.g AS source, dns.n,
           |  round(dcost.cost, 6) + 0.0 AS ot_cost
           |FROM dns JOIN dcost ON dcost.g = dns.g
           |ORDER BY source""".stripMargin
      }),

    // EXIF GPS audit + scrub (Multimodal.exifScan / stripApp1) — the
    // multimodal face of the PII tier: per-row the fixture JPEG is
    // BUILT (Exif/TIFF GPS IFD on the doc_id % 3 == 0 third), its GPS
    // parsed back from real TIFF bytes, APP1 stripped, and the
    // stripped bytes RE-PARSED (q365's closed-loop pattern: the scrub
    // is proven by the auditor that would catch it failing). The
    // oracle predicts every number arithmetically from the seeding
    // rule — including the 114 bytes each APP1 removal saves — so the
    // whole byte walk is hash-checked. One mapPartitions + one
    // combinable aggregate; no driver traffic, no codec dependency.
    QueryDef("q370_exif_gps_scrub",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        Multimodal.exifScan(s, docs, "doc_id", "text").toDF()
          .withColumnRenamed("id", "doc_id")
          .join(docs.select("doc_id", "source"), "doc_id")
          .groupBy("source").agg(
            count(lit(1)).as("n_images"),
            sum(when(col("hasGps"), 1L).otherwise(0L)).as("n_gps"),
            sum(when(col("hasGps"), col("latArcMs")).otherwise(0L))
              .as("sum_lat_arc_ms"),
            sum(when(col("hasGps"), col("lonArcMs")).otherwise(0L))
              .as("sum_lon_arc_ms"),
            sum(when(col("gpsAfterStrip"), 1L).otherwise(0L))
              .as("n_gps_after_scrub"),
            sum(col("nBytes") - col("strippedBytes")).as("bytes_saved"))
          .orderBy("source")
      },
      Some("""WITH e AS (SELECT source,
             |    CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS g,
             |    (doc_id % 90) * 3600000 + (doc_id % 60) * 60000
             |      + (doc_id * 7) % 60000 AS la,
             |    (doc_id % 180) * 3600000 + ((doc_id * 3) % 60) * 60000
             |      + (doc_id * 11) % 60000 AS lo
             |  FROM documents)
             |SELECT source, CAST(count(*) AS BIGINT) AS n_images,
             |  CAST(sum(g) AS BIGINT) AS n_gps,
             |  CAST(sum(CASE WHEN g = 1 THEN la ELSE 0 END) AS BIGINT)
             |    AS sum_lat_arc_ms,
             |  CAST(sum(CASE WHEN g = 1 THEN lo ELSE 0 END) AS BIGINT)
             |    AS sum_lon_arc_ms,
             |  CAST(0 AS BIGINT) AS n_gps_after_scrub,
             |  CAST(sum(g) * 114 AS BIGINT) AS bytes_saved
             |FROM e GROUP BY source ORDER BY source""".stripMargin)),

    // TrustRank over the near-dup graph (PageRank.personalized,
    // Gyöngyi et al. '04): restart mass confined to a vetted seed
    // sample (doc_id % 17 == 0), so rank becomes propagated TRUST —
    // documents unreachable from any seed score exact 0, the
    // spam-demotion signal uniform PageRank (q83) structurally lifts
    // off the floor. Same scale shape as q83: only edge endpoints
    // iterate, isolated seeds ride a scalar recurrence, one shuffle
    // join + one combinable sum per round.
    QueryDef("q372_trustrank",
      (s, dir) => {
        val docs = t(s, dir, "documents").filter(col("doc_id") < 1000)
        val pairs = Dedup.minhashNearDups(docs, "doc_id", "text",
          k = 64, bands = 8, threshold = 0.8)
        PageRank.personalized(docs, "doc_id", pairs, "id_a", "id_b",
            docs.filter(col("doc_id") % 17 === 0).select("doc_id"),
            "doc_id", damping = 0.85, iters = 5)
          .withColumnRenamed("id", "doc_id")
          .orderBy("doc_id")
      },
      Some("WITH " + minhashVerifiedCtes + ",\n" +
        """prpairs AS (SELECT id_a, id_b FROM verified
          |  WHERE jaccard >= 0.8),
          |prnodes AS (SELECT doc_id AS id FROM toks),
          |predges AS (SELECT id_a AS src, id_b AS dst FROM prpairs
          |            UNION SELECT id_b, id_a FROM prpairs),
          |prseeds AS (SELECT id FROM prnodes WHERE id % 17 = 0),
          |""".stripMargin +
        trustRankCtes(d = 0.85, iters = 5) + "\n" +
        """SELECT nd.id AS doc_id,
          |  round(coalesce(p.pr, CASE WHEN s.id IS NOT NULL
          |    THEN isoS5.pr ELSE 0.0 END), 6) AS pr
          |FROM prnodes nd
          |LEFT JOIN pre5 p USING (id)
          |LEFT JOIN prseeds s ON s.id = nd.id
          |CROSS JOIN isoS5
          |ORDER BY doc_id""".stripMargin))
  )

  /** The full catalog the driver consumes — declared LAST so every
    * section val is initialized before concatenation.
    */
  val defs: Seq[QueryDef] =
    coreDefs ++ moreDefs ++ extraDefs ++ extra2Defs ++ extra3Defs ++
      extra4Defs ++ extra5Defs
}
