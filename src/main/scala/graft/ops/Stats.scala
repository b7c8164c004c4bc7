package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Grouped closed-form statistics — the "fit a line per segment"
  * analytics primitive (quality-vs-length curves per language,
  * throughput-vs-size per source), done the distributed way: ONE
  * map-side-combinable aggregate of integer moment sums per group,
  * closed-form OLS on the tiny per-group frame. No iteration, no
  * window, no second pass over the data.
  *
  * Parity discipline: the six moments are EXACT integer sums
  * (order-free in any engine); every float op after them runs on
  * identical doubles, so slope/intercept/r² reproduce bit-for-bit in
  * the oracle. Degenerate groups (constant x, or fewer than 2 rows)
  * emit nulls rather than dividing by zero.
  */
object Stats {

  /** Per-group OLS of `yCol` on `xCol` (both integral columns).
    *
    * @return one row per group: groupCol, `n`, `slope`, `intercept`,
    *         `r2` (each rounded to 4, null when degenerate)
    */
  def groupedOls(
      df: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame = {
    val x = col(xCol).cast("long")
    val y = col(yCol).cast("long")
    val agg = df.groupBy(groupCol).agg(
      count(lit(1)).as("n"),
      sum(x).as("sx"), sum(y).as("sy"),
      sum(x * x).as("sxx"), sum(x * y).as("sxy"), sum(y * y).as("syy"))
    def d(c: String): Column = col(c).cast("double")
    val covN = d("n") * d("sxy") - d("sx") * d("sy") // n * cov
    val varXN = d("n") * d("sxx") - d("sx") * d("sx") // n * var(x)
    val varYN = d("n") * d("syy") - d("sy") * d("sy")
    val slope = when(col("n") >= 2 && varXN > 0, covN / varXN)
    val intercept = (d("sy") - slope * d("sx")) / d("n")
    val r2 = when(col("n") >= 2 && varXN > 0 && varYN > 0,
      (covN * covN) / (varXN * varYN))
    agg.select(col(groupCol), col("n"),
      (round(slope, 4) + lit(0.0)).as("slope"),
      (round(intercept, 4) + lit(0.0)).as("intercept"),
      (round(r2, 4) + lit(0.0)).as("r2"))
  }

  /** Wilson score interval for a per-group binomial rate (Wilson
    * 1927): the CI that behaves at small n and extreme rates, where
    * the naive ±z√(p(1−p)/n) collapses to zero width on 0/n and
    * n/n days — exactly the days a conversion monitor most needs
    * honest uncertainty on.
    *
    * One count aggregate; the bounds are fixed-shape double
    * expressions over the exact integer (n, k) pair, z = 1.959964.
    *
    * @param df rows with groupCol and integer 0/1 `hitCol`
    * @return per group: `n`, `k`, `rate` (round 4), `wilson_lo`,
    *         `wilson_hi` (round 4)
    */
  def wilsonRate(
      df: DataFrame, groupCol: String, hitCol: String): DataFrame = {
    val z = 1.959964
    val agg = df.groupBy(col(groupCol).as("g"))
      .agg(count(lit(1)).as("n"),
        sum(col(hitCol).cast("long")).as("k"))
    def d(c: String): Column = col(c).cast("double")
    val p = d("k") / d("n")
    val z2n = lit(z * z) / d("n")
    val denom = lit(1.0) + z2n
    val center = (p + z2n / lit(2.0)) / denom
    val half = (lit(z) * sqrt(p * (lit(1.0) - p) / d("n") +
      z2n / (lit(4.0) * d("n")))) / denom
    agg.select(col("g"), col("n"), col("k"),
      round(p, 4).as("rate"),
      round(center - half, 4).as("wilson_lo"),
      round(center + half, 4).as("wilson_hi"))
  }

  /** OLS fit diagnostics per group — the "should I trust q133's
    * slope" readout: R² from the exact moment sums plus residual
    * SKEWNESS and EXCESS KURTOSIS, the two numbers that say whether
    * the residuals look Gaussian (both ≈ 0) or the fit is hiding
    * structure (skewed/fat-tailed errors).
    *
    * Two passes: one moment aggregate fixes (slope, intercept); the
    * residuals then snap to integer deci-units (scale cancels out of
    * both shape statistics, so the snap costs nothing semantically)
    * and a second aggregate collects Σr..Σr⁴ as exact integers.
    * `snapScale` bounds Σr⁴: pick it so (max|r|·snapScale)⁴ · n_group
    * stays inside int64 (the default 10 holds to |r| ≈ 3e3 per point
    * at 30-point groups; shrink it for wilder metrics).
    *
    * @return per group: `n`, `slope` (round 6), `r2` (round 4),
    *         `resid_skew` (round 4), `resid_kurtosis` (excess,
    *         round 4)
    */
  def olsDiagnostics(
      df: DataFrame, groupCol: String, xCol: String, yCol: String,
      snapScale: Int = 10): DataFrame = {
    val x = col(xCol).cast("long")
    val y = col(yCol).cast("long")
    val in = df.select(col(groupCol).as("g"), x.as("x"), y.as("y"))
      .where(col("x").isNotNull && col("y").isNotNull)
    val agg = in.groupBy("g").agg(
      count(lit(1)).as("n"),
      sum("x").as("sx"), sum("y").as("sy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("y") * col("y")).as("syy"))
    def d(c: String): Column = col(c).cast("double")
    val covN = d("n") * d("sxy") - d("sx") * d("sy")
    val varXN = d("n") * d("sxx") - d("sx") * d("sx")
    val varYN = d("n") * d("syy") - d("sy") * d("sy")
    val params = agg
      .withColumn("_b", covN / varXN)
      .withColumn("_a", (d("sy") - col("_b") * d("sx")) / d("n"))
      .withColumn("_r2", (covN * covN) / (varXN * varYN))
    val resid = in.join(broadcast(params.select("g", "_a", "_b")), Seq("g"))
      .withColumn("_rd",
        round((col("y").cast("double") - col("_a") -
          col("_b") * col("x").cast("double")) * lit(snapScale.toDouble))
          .cast("long"))
      .groupBy("g")
      .agg(sum(col("_rd") * col("_rd")).as("_m2"),
        sum(col("_rd") * col("_rd") * col("_rd")).as("_m3"),
        sum(col("_rd") * col("_rd") * col("_rd") * col("_rd")).as("_m4"))
    params.join(resid, Seq("g"))
      .select(col("g"), col("n"),
        (round(col("_b"), 6) + lit(0.0)).as("slope"),
        round(col("_r2"), 4).as("r2"),
        // x^1.5 as x·√x: sqrt is correctly rounded in IEEE, so the
        // shape reproduces exactly in any engine (pow() would not).
        (round(when(col("_m2") > 0,
          (col("_m3").cast("double") / d("n")) /
            ((col("_m2").cast("double") / d("n")) *
              sqrt(col("_m2").cast("double") / d("n")))), 4)
          + lit(0.0)).as("resid_skew"),
        (round(when(col("_m2") > 0,
          col("_m4").cast("double") / d("n") /
            ((col("_m2").cast("double") / d("n")) *
              (col("_m2").cast("double") / d("n"))) - lit(3.0)), 4)
          + lit(0.0)).as("resid_kurtosis"))
  }

  /** Per-group approximate percentiles from the portable histogram
    * sketch ([[graft.functions.HistSketchAgg]], `graft_hist`): ONE
    * map-side-combinable aggregate ships 8·nbins bytes per group
    * across the shuffle (exact `percentile` ships every value), then
    * each requested quantile is answered by rank interpolation inside
    * the bucket the cumulative count crosses — error bounded by one
    * bucket width.
    *
    * All post-sketch work runs on the tiny (groups × nonzero-buckets)
    * frame: a posexplode, a cumulative-sum window, and a
    * broadcast-nested-loop join against the |ps|-row percentile frame
    * to find each crossing bucket. Pick `(hi − lo) / nbins` a power of
    * two and bucket assignment is exact in IEEE doubles, so an
    * external engine rebuilds the identical sketch and estimate from
    * the same floor arithmetic (the q151 oracle does).
    *
    * @param ps quantiles in (0, 1]; each must satisfy p·total > 0
    * @return one row per (group, p): groupCol, `p`, `n` (non-null
    *         count), `est` (rounded to 4)
    */
  def histPercentiles(
      df: DataFrame, groupCol: String, valueCol: String,
      lo: Double, hi: Double, nbins: Int, ps: Seq[Double]): DataFrame =
    crossingEstimates(df, groupCol, valueCol, lo, hi, nbins, ps)
      .select(col(groupCol), col("p"), col("total").as("n"),
        (round(col("est_raw"), 4) + lit(0.0)).as("est"))

  /** Shared core of [[histPercentiles]] / [[equiDepthBins]]: one row
    * per (group, p) with the UNROUNDED crossing-bucket estimate
    * (`est_raw`) — binning must compare boundaries at full precision
    * or a value sitting within rounding distance of a boundary flips
    * bins between engines.
    */
  private def crossingEstimates(
      df: DataFrame, groupCol: String, valueCol: String,
      lo: Double, hi: Double, nbins: Int, ps: Seq[Double]): DataFrame = {
    val sk = df.groupBy(groupCol).agg(
      expr(s"graft_hist(CAST($valueCol AS DOUBLE), ${lo}D, ${hi}D, $nbins)")
        .as("counts"))
    // Zero buckets can never be the crossing bucket (cum = cum − cnt
    // there), so drop them before the window — the frame shrinks to
    // the occupied buckets only.
    val occupied = sk
      .select(col(groupCol), posexplode(col("counts")).as(Seq("b", "cnt")))
      .where(col("cnt") > 0)
    crossingFromOccupied(occupied, groupCol, lo, (hi - lo) / nbins, ps)
  }

  /** Shared crossing core over an occupied-bucket frame
    * (`groupCol`, `b`, `cnt`): the cum-sum window, the broadcast
    * |ps|-row join, and the rank interpolation — used by the inline
    * sketch path ([[crossingEstimates]]) and the stored-index probe
    * ([[histPercentilesFromIndex]]), so both answer from identical
    * arithmetic.
    */
  private def crossingFromOccupied(
      occupied: DataFrame, groupCol: String, lo: Double, width: Double,
      ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0.0 && p <= 1.0),
      s"percentiles must be in (0, 1], got $ps")
    val spark = occupied.sparkSession
    import spark.implicits._
    val cum = occupied
      .withColumn("cum", sum("cnt").over(
        Window.partitionBy(groupCol).orderBy("b")))
      .withColumn("total", sum("cnt").over(Window.partitionBy(groupCol)))
    val pFrame = broadcast(ps.toDF("p"))
    val target = col("p") * col("total").cast("double")
    val before = (col("cum") - col("cnt")).cast("double")
    // Exactly one bucket per (group, p) satisfies cum ≥ target > cum −
    // cnt for target in (0, total]: the one the cumulative crosses.
    val est = lit(lo) + lit(width) * (col("b").cast("double") +
      (target - before) / col("cnt").cast("double"))
    cum.crossJoin(pFrame)
      .where(col("cum").cast("double") >= target && before < target)
      .select(col(groupCol), col("p"), col("total"), est.as("est_raw"))
  }

  /** Shard-partial histogram rows for a PERSISTED quantile index —
    * the sketch tier's member of the stored-index family (bands,
    * codes, postings, cluster map, HLL registers): each ingest slice
    * aggregates its own `graft_hist` sketch per group and flattens
    * the occupied buckets to (`groupCol`, `shardCol`, `b`, `cnt`)
    * rows. Histogram counts are SUMS, so maintenance is append-only
    * (a new shard appends its rows; no read-modify-write), and the
    * probe folds shards exactly — the same partial-log pattern as
    * [[graft.ops.Retrieval.bm25StatsPartial]]. A replayed shard
    * re-appends IDENTICAL rows (the shard tag makes them exact
    * duplicates), so `Layout.compactBucketed`'s distinct is the
    * correct heal.
    */
  def histPartials(
      df: DataFrame, groupCol: String, shardCol: String,
      valueCol: String, lo: Double, hi: Double, nbins: Int): DataFrame =
    df.groupBy(col(groupCol), col(shardCol))
      .agg(expr(
        s"graft_hist(CAST($valueCol AS DOUBLE), ${lo}D, ${hi}D, $nbins)")
        .as("counts"))
      .select(col(groupCol), col(shardCol),
        posexplode(col("counts")).as(Seq("b", "cnt")))
      .where(col("cnt") > 0)

  /** Serve per-group quantiles FROM the stored partial-histogram
    * index ([[histPartials]] rows read back): fold shards with one
    * combinable `sum` per (group, bucket) — integer-exact, so the
    * merged sketch is bit-identical to a single-pass build over the
    * union — then run the same crossing interpolation as
    * [[histPercentiles]]. The probe never touches a corpus row:
    * cost is O(occupied buckets × shards), KBs per group at any
    * corpus scale — the quantile query a 100 TB pipeline answers
    * from its monitoring index instead of re-scanning data.
    *
    * @return one row per (group, p): groupCol, `p`, `n`, `est`
    *         (schema-identical to [[histPercentiles]])
    */
  def histPercentilesFromIndex(
      index: DataFrame, groupCol: String, lo: Double, hi: Double,
      nbins: Int, ps: Seq[Double]): DataFrame = {
    val merged = index.groupBy(col(groupCol), col("b"))
      .agg(sum("cnt").as("cnt"))
    crossingFromOccupied(merged, groupCol, lo, (hi - lo) / nbins, ps)
      .select(col(groupCol), col("p"), col("total").as("n"),
        (round(col("est_raw"), 4) + lit(0.0)).as("est"))
  }

  /** Equi-depth (quantile) binning from the histogram sketch — the
    * discretizer feature pipelines need ("quartile of length within
    * its language") WITHOUT the global per-group sort `ntile` costs:
    * one sketch pass fixes the B−1 boundary values per group, then bin
    * assignment is a narrow map against the broadcast (groups × B−1)
    * boundary table. A row's bin is the number of boundaries ≤ its
    * value (so values tied with a boundary go UP, bins are [0, B−1]);
    * null values get a null bin. Depth is equal up to sketch
    * resolution — heavy duplicate values land in one bin, as any
    * quantile discretizer must.
    */
  def equiDepthBins(
      df: DataFrame, groupCol: String, valueCol: String,
      lo: Double, hi: Double, nbins: Int, bins: Int,
      binCol: String = "bin"): DataFrame = {
    require(bins >= 2, s"need at least 2 bins, got $bins")
    val ps = (1 until bins).map(_.toDouble / bins)
    val bounds = crossingEstimates(df, groupCol, valueCol, lo, hi, nbins, ps)
      .groupBy(groupCol).agg(sort_array(collect_list("est_raw")).as("_bs"))
    df.join(broadcast(bounds), Seq(groupCol), "left")
      .withColumn(binCol, when(col(valueCol).isNotNull && col("_bs").isNotNull,
        size(filter(col("_bs"), b => b <= col(valueCol).cast("double")))))
      .drop("_bs")
  }

  /** Weekly cohort retention over an event stream: users bucketed by
    * the EPOCH WEEK of their first event (pure integer division of
    * microseconds — no calendar functions, so any engine reproduces
    * the bucketing), counted distinct in every later week they
    * return. The classic retention triangle, in two
    * map-side-combinable aggregates (per-user min, then per-cell
    * distinct count) — the event log is read once and never windowed.
    *
    * @return `cohort_week` (epoch week of first event), `weeks_since`
    *         (0 = the cohort week itself), `n_users`
    */
  def cohortRetention(
      events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val wk = expr(s"unix_micros(CAST($tsCol AS TIMESTAMP)) div 604800000000")
    val weeks = events.select(col(userCol).as("_u"), wk.as("_w"))
    val first = weeks.groupBy("_u").agg(min("_w").as("_cw"))
    weeks.join(first, Seq("_u"))
      .groupBy(col("_cw").as("cohort_week"),
        (col("_w") - col("_cw")).as("weeks_since"))
      .agg(countDistinct(col("_u")).as("n_users"))
  }
}
