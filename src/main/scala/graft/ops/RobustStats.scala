package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank-based / robust statistics that stay exact across engines:
  * trimmed means, the Mann–Whitney U rank-sum test, and the χ²
  * independence test. The parametric tier (q133 OLS, q167 CUPED)
  * assumes moments behave; this tier is what you reach for when the
  * metric is heavy-tailed — latency, document length, spend — and a
  * single outlier owns the mean.
  *
  * Exactness: trims cut on integer ranks (tied values straddling the
  * cut contribute the same sum either way); Mann–Whitney uses
  * DOUBLED midranks so tie-averaged ranks stay integers; χ² is a
  * rational expression over the contingency counts. Each statistic
  * is one sort or one count shuffle — nothing iterative.
  */
object RobustStats {

  /** Per-group trimmed mean: drop the ⌊n·trimPpm/1e6⌋ smallest and
    * largest rows by rank, average the rest. Also emits the plain
    * mean so the trim's effect is visible.
    *
    * @param trimPpm per-side trim fraction in parts-per-million
    *                (e.g. 50000 = 5% each side)
    */
  def trimmedMean(
      df: DataFrame, groupCol: String, valueCol: String,
      trimPpm: Long): DataFrame = {
    val x = col(valueCol).cast("long")
    val in = df.where(x.isNotNull).select(col(groupCol), x.as("x"))
    val w = Window.partitionBy(groupCol).orderBy(col("x"))
    val ranked = in
      .withColumn("i", row_number().over(w).cast("long"))
      .withColumn("_n", count(lit(1)).over(Window.partitionBy(groupCol)))
      .withColumn("_k", expr(s"(_n * $trimPpm) DIV 1000000"))
    ranked.groupBy(groupCol)
      .agg(count(lit(1)).as("n"), max("_k").as("n_trimmed_each"),
        sum("x").as("_sx"),
        sum(when(col("i") > col("_k") && col("i") <= col("_n") - col("_k"),
          col("x")).otherwise(0L)).as("_sk"),
        sum(when(col("i") > col("_k") && col("i") <= col("_n") - col("_k"),
          1L).otherwise(0L)).as("_nk"))
      .select(col(groupCol), col("n"), col("n_trimmed_each"),
        round(col("_sx").cast("double") / col("n").cast("double"), 4)
          .as("mean"),
        round(col("_sk").cast("double") / col("_nk").cast("double"), 4)
          .as("trimmed_mean"))
  }

  /** Mann–Whitney U (two-sided normal approximation with tie
    * correction) per stratum: `armCol` must be 0/1. Midranks are
    * carried ×2 so ties stay in integer arithmetic; U, the tie term
    * ΣT = Σ(t³−t), and both sample sizes cross to doubles only in
    * the final z expression.
    *
    * @return per stratum: n0, n1, `u1` (U of arm 1, ×1 exact
    *         half-integer as double), `z` (round 4)
    */
  def mannWhitney(
      df: DataFrame, strataCol: String, armCol: String,
      valueCol: String): DataFrame = {
    val x = col(valueCol).cast("long")
    val in = df.where(x.isNotNull)
      .select(col(strataCol), col(armCol).cast("int").as("arm"), x.as("x"))
    val w = Window.partitionBy(strataCol).orderBy(col("x"))
    // Doubled midrank of a tied run [lo, hi]: lo + hi (= 2·midrank).
    val prepared = in
      .withColumn("_rn", row_number().over(w).cast("long"))
      .withColumn("_lo", min(col("_rn")).over(
        Window.partitionBy(strataCol, "x")))
      .withColumn("_hi", max(col("_rn")).over(
        Window.partitionBy(strataCol, "x")))
      .withColumn("_r2", col("_lo") + col("_hi"))
    val ties = prepared.groupBy(strataCol, "x")
      .agg(count(lit(1)).as("t"))
      .groupBy(strataCol)
      .agg(sum(col("t") * col("t") * col("t") - col("t")).as("_tie"))
    prepared.groupBy(strataCol)
      .agg(count(lit(1)).as("_n"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("arm") === 1, col("_r2")).otherwise(0L)).as("_r2sum"))
      .withColumn("n0", col("_n") - col("n1"))
      .join(ties, Seq(strataCol))
      .select(col(strataCol), col("n0"), col("n1"),
        // U1 = R1 − n1(n1+1)/2 with R1 = r2sum/2 → exact half-integers.
        ((col("_r2sum") - col("n1") * (col("n1") + lit(1L))).cast("double")
          / lit(2.0)).as("u1"), {
          val se = sqrt(col("n1").cast("double") * col("n0").cast("double") /
            lit(12.0) *
            ((col("_n") + lit(1L)).cast("double") -
              col("_tie").cast("double") /
                (col("_n").cast("double") *
                  (col("_n") - lit(1L)).cast("double"))))
          // Degenerate strata (everything tied, or an empty arm) have
          // zero variance → null z, not an ANSI divide-by-zero.
          round(when(se > 0.0,
            ((col("_r2sum") - col("n1") * (col("n1") + lit(1L)))
              .cast("double") / lit(2.0) -
              col("n1").cast("double") * col("n0").cast("double") /
                lit(2.0)) / se), 4).as("z")
        })
  }

  /** Welch's unequal-variance t-test per stratum (`armCol` 0/1):
    * the parametric sibling of [[mannWhitney]] for when the metric's
    * moments are trusted. Per-arm n/Σx/Σx² are exact integer sums
    * (values arrive as integer micro-units upstream), so t and the
    * Welch–Satterthwaite df are fixed-shape double expressions over
    * exact integers — reproducible bit-for-bit by an external
    * engine. One count shuffle to the (strata × arm) frame; the
    * windows run on that tiny frame.
    *
    * @return per stratum: n0, n1, mean0, mean1 (round 4), `t`
    *         (round 4), `df` (Welch–Satterthwaite, round 2)
    */
  def welchT(
      df: DataFrame, strataCol: String, armCol: String,
      valueCol: String): DataFrame = {
    val x = col(valueCol).cast("long")
    val arms = df.where(x.isNotNull)
      .select(col(strataCol), col(armCol).cast("int").as("arm"), x.as("x"))
      .groupBy(strataCol, "arm")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"),
        sum(col("x") * col("x")).as("sxx"))
    def d(c: String) = col(c).cast("double")
    // var/n for one arm, from exact sums: (Σx² − (Σx)²/n) / (n(n−1)).
    val vOverN = (d("sxx") - d("sx") * d("sx") / d("n")) /
      (d("n") * (d("n") - lit(1.0)))
    val per = arms
      .withColumn("mean", d("sx") / d("n"))
      .withColumn("von", vOverN)
    val a0 = per.where(col("arm") === 0)
      .select(col(strataCol), col("n").as("n0"), col("mean").as("m0"),
        col("von").as("v0"))
    val a1 = per.where(col("arm") === 1)
      .select(col(strataCol), col("n").as("n1"), col("mean").as("m1"),
        col("von").as("v1"))
    a0.join(a1, Seq(strataCol))
      .select(col(strataCol), col("n0"), col("n1"),
        round(col("m0"), 4).as("mean0"), round(col("m1"), 4).as("mean1"),
        (round((col("m1") - col("m0")) / sqrt(col("v0") + col("v1")), 4)
          + lit(0.0)).as("t"),
        round((col("v0") + col("v1")) * (col("v0") + col("v1")) /
          (col("v0") * col("v0") / (col("n0").cast("double") - lit(1.0)) +
            col("v1") * col("v1") / (col("n1").cast("double") - lit(1.0))),
          2).as("df"))
  }

  /** Distribution-free confidence interval for the median, from order
    * statistics: the binomial argument puts the true median between
    * the value at rank ⌊(n − z√n)/2⌋ and the value at rank
    * ⌈(n + 2 + z√n)/2⌉ with ~95% coverage (z = 1.959964) — NO
    * normality assumption, which is the point for the heavy-tailed
    * metrics this module exists for.
    *
    * Rank bounds are floor/ceil of one fixed double expression
    * (identical in any IEEE engine); the interval endpoints are
    * EXACT data values selected by rank (one partitioned row_number
    * window), and the median itself is the q143-pinned percentile
    * kernel.
    *
    * @return per group: `n`, `median` (round 4), `ci_lo`, `ci_hi`
    *         (exact order-statistic values as doubles)
    */
  def medianCi(
      df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val x = col(valueCol).cast("long")
    val in = df.where(x.isNotNull).select(col(groupCol).as("g"), x.as("x"))
    val w = Window.partitionBy("g").orderBy(col("x").asc)
    val ranked = in
      .withColumn("_rn", row_number().over(w).cast("long"))
      .withColumn("_n", count(lit(1)).over(Window.partitionBy("g")))
    def dn = col("_n").cast("double")
    val lo = greatest(lit(1L),
      floor((dn - lit(1.959964) * sqrt(dn)) / lit(2.0)).cast("long"))
    val hi = least(col("_n"),
      ceil((dn + lit(2.0) + lit(1.959964) * sqrt(dn)) / lit(2.0))
        .cast("long"))
    val bounds = ranked
      .withColumn("_lo", lo).withColumn("_hi", hi)
      .where(col("_rn") === col("_lo") || col("_rn") === col("_hi"))
      .groupBy("g")
      .agg(min(when(col("_rn") === col("_lo"), col("x"))).as("ci_lo"),
        max(when(col("_rn") === col("_hi"), col("x"))).as("ci_hi"))
    val med = in.groupBy("g").agg(count(lit(1)).as("n"),
      expr("percentile(x, 0.5)").as("_med"))
    med.join(bounds, Seq("g"))
      .select(col("g"), col("n"), round(col("_med"), 4).as("median"),
        col("ci_lo").cast("double").as("ci_lo"),
        col("ci_hi").cast("double").as("ci_hi"))
  }

  /** Huber M-estimator of location per group (Huber 1964), solved by
    * `iters` fixed IRLS rounds from the median: weights w_i =
    * min(1, k·s/|x_i − m|) with s = 1.4826·MAD (the consistent
    * robust scale) and tuning constant k — between the mean
    * (k = ∞) and the median (k → 0), with 95% Gaussian efficiency at
    * the default k = 1.345.
    *
    * Determinism: a FIXED round count (not convergence), so the
    * output is a pure function of the data; weights are snapped to
    * integer micro-units, making each round's update a ratio of
    * exact integer sums (Σ w_u·x / Σ w_u — order-free); the
    * median/MAD init is the q143-pinned percentile kernel.
    *
    * Scale shape: per round one broadcast of the (groups)-sized
    * (m, s) frame and one map-side-combinable weighted aggregate —
    * the Components/LogReg iteration discipline with model-sized
    * state.
    *
    * @return per group: `n`, `median`, `mad_scale` (round 4),
    *         `mean` (round 4), `huber` (round 4)
    */
  def huberLocation(
      df: DataFrame, groupCol: String, valueCol: String,
      k: Double = 1.345, iters: Int = 2): DataFrame = {
    val x = col(valueCol).cast("long")
    val in = df.where(x.isNotNull)
      .select(col(groupCol).as("g"), x.as("x"))
    val med = in.groupBy("g").agg(
      count(lit(1)).as("n"), sum("x").as("_sx"),
      expr("percentile(x, 0.5)").as("m0"))
    val mad = in.join(broadcast(med.select("g", "m0")), Seq("g"))
      .withColumn("_ad", abs(col("x").cast("double") - col("m0")))
      .groupBy("g")
      .agg(expr("percentile(_ad, 0.5)").as("_mad"))
      .withColumn("s", col("_mad") * lit(1.4826))
    var state = med.join(mad.select("g", "s"), Seq("g"))
      .select(col("g"), col("n"), col("_sx"), col("s"),
        col("m0").as("m"))
    (1 to iters).foreach { _ =>
      val next = in.join(broadcast(state), Seq("g"))
        .withColumn("_r", abs(col("x").cast("double") - col("m")))
        // w = min(1, k·s/r); r = 0 (or s = 0) → full weight.
        .withColumn("_w", when(col("_r") > lit(k) * col("s"),
          lit(k) * col("s") / col("_r")).otherwise(lit(1.0)))
        .withColumn("_wu", round(col("_w") * lit(1e6)).cast("long"))
        .groupBy("g")
        .agg(max("n").as("n"), max("_sx").as("_sx"), max("s").as("s"),
          (sum(col("_wu") * col("x")).cast("double") /
            sum(col("_wu")).cast("double")).as("m"))
      state = next
    }
    val medOut = med.select(col("g"), col("m0"))
    state.join(medOut, Seq("g"))
      .select(col("g"), col("n"),
        round(col("m0"), 4).as("median"),
        round(col("s"), 4).as("mad_scale"),
        round(col("_sx").cast("double") / col("n").cast("double"), 4)
          .as("mean"),
        round(col("m"), 4).as("huber"))
  }

  /** Theil–Sen robust slope per group (Sen, JASA 1968): the median of
    * all pairwise slopes (y_j−y_i)/(x_j−x_i), x_i < x_j — the trend
    * estimate a single outlier day can't own (OLS breaks down at one
    * bad point; Theil–Sen tolerates ~29%). Emits the OLS slope beside
    * it so the robustness delta is visible.
    *
    * SCALE CONTRACT: the caller aggregates to a per-group series
    * FIRST (e.g. daily counts) — the pair self-join is quadratic in
    * the per-group series length, which for calendar series is
    * bounded by the day span, never by the event volume. Pair slopes
    * are identical doubles in both engines (one division over exact
    * integers), and `percentile`'s linear interpolation matches
    * DuckDB's percentile_cont (the q143-pinned kernel), so a 6-dp
    * round crosses the compare.
    *
    * @return per group: `n_points`, `n_pairs`, `sen_slope`,
    *         `sen_intercept` (median of y−slope·x), `ols_slope`
    *         (all round 6)
    */
  def theilSen(
      df: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame = {
    val pts = df.select(col(groupCol).as("g"),
        col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
      .where(col("x").isNotNull && col("y").isNotNull)
    val a = pts.select(col("g"), col("x").as("xi"), col("y").as("yi"))
    val b = pts.select(col("g"), col("x").as("xj"), col("y").as("yj"))
    val slopes = a.join(b, Seq("g")).where(col("xi") < col("xj"))
      .select(col("g"), ((col("yj") - col("yi")).cast("double") /
        (col("xj") - col("xi")).cast("double")).as("s"))
    val sen = slopes.groupBy("g").agg(
      count(lit(1)).as("n_pairs"),
      expr("percentile(s, 0.5)").as("_slope"))
    val ols = pts.groupBy("g").agg(
      count(lit(1)).as("n_points"), sum("x").as("_sx"),
      sum("y").as("_sy"), sum(col("x") * col("x")).as("_sxx"),
      sum(col("x") * col("y")).as("_sxy"))
    val inter = pts.join(sen.select("g", "_slope"), Seq("g"))
      .withColumn("_r", col("y").cast("double") -
        col("_slope") * col("x").cast("double"))
      .groupBy("g").agg(expr("percentile(_r, 0.5)").as("_icept"))
    def d(c: String) = col(c).cast("double")
    ols.join(sen, Seq("g")).join(inter, Seq("g"))
      .select(col("g"), col("n_points"), col("n_pairs"),
        (round(col("_slope"), 6) + lit(0.0)).as("sen_slope"),
        (round(col("_icept"), 6) + lit(0.0)).as("sen_intercept"),
        (round((d("n_points") * d("_sxy") - d("_sx") * d("_sy")) /
          (d("n_points") * d("_sxx") - d("_sx") * d("_sx")), 6)
          + lit(0.0)).as("ols_slope"))
  }

  /** χ² independence test for two categorical columns: the full
    * contingency grid (dense over observed margins) with expected
    * counts from the margins and the per-table χ² repeated per row.
    */
  def chiSquareIndependence(
      df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val obs = df.where(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("n_obs"))
    val aMarg = obs.groupBy("a").agg(sum("n_obs").as("n_a"))
    val bMarg = obs.groupBy("b").agg(sum("n_obs").as("n_b"))
    val grid = aMarg.crossJoin(bMarg)
      .join(obs, Seq("a", "b"), "left")
      .withColumn("n_obs", coalesce(col("n_obs"), lit(0L)))
    val wAll = Window.partitionBy()
    grid
      .withColumn("_n", sum(col("n_obs")).over(wAll))
      .withColumn("expected",
        col("n_a").cast("double") * col("n_b").cast("double") /
          col("_n").cast("double"))
      .withColumn("chi2", sum(
        (col("n_obs").cast("double") - col("expected")) *
          (col("n_obs").cast("double") - col("expected")) /
          col("expected")).over(wAll))
      .select(col("a"), col("b"), col("n_obs"),
        round(col("expected"), 4).as("expected"),
        round(col("chi2"), 4).as("chi2"))
  }
}
