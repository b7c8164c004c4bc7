package graft.ops

import graft.functions.Hashing
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling and dataset splitting — how a
  * 100 TB corpus gets its train/val/test partitions and its debug
  * subsamples. A random `sample()` is neither reproducible across runs
  * nor stable under re-partitioning; a hash of a stable key is both:
  * membership is a pure per-row function, so it needs no shuffle, no
  * state, and the same row lands in the same split on every machine,
  * forever ("salted" experiments just change the key expression).
  *
  * The hash is [[Hashing.portableHash]] (md5-derived), so every split
  * is re-computable in the DuckDB oracle — and in any other engine a
  * downstream consumer might use to audit the split.
  */
object Sampling {

  /** Stable bucket in [0, 100) from the key's portable hash. */
  def bucket(key: Column): Column =
    pmod(Hashing.portableHash(key.cast("string")), lit(100L))

  /** Split assignment from cumulative upper-bound percentages, e.g.
    * `Seq("train" -> 80, "val" -> 90, "test" -> 100)` → 80/10/10.
    * Boundaries must be increasing and end at 100.
    */
  def splitLabel(key: Column, cuts: Seq[(String, Int)]): Column = {
    require(cuts.nonEmpty && cuts.last._2 == 100 &&
      cuts.map(_._2) == cuts.map(_._2).sorted,
      s"cuts must be increasing cumulative percents ending at 100: $cuts")
    val b = bucket(key)
    cuts.init.foldRight(lit(cuts.last._1): Column) { case ((name, hi), rest) =>
      when(b < hi, name).otherwise(rest)
    }
  }

  /** Keep a deterministic pct% of rows by key hash. */
  def hashSample(df: DataFrame, keyCol: String, pct: Int): DataFrame =
    df.filter(bucket(col(keyCol)) < pct)

  /** Stratified deterministic sampling: per-stratum keep rates (data
    * mixing — up/down-weighting sources toward a target corpus
    * mixture). Same shuffle-free membership predicate as [[hashSample]],
    * just with the rate chosen by the stratum column; unlisted strata
    * fall back to `defaultPct`. Rates are percents in [0, 100].
    */
  def stratifiedSample(
      df: DataFrame, keyCol: String, strataCol: String,
      rates: Seq[(String, Int)], defaultPct: Int): DataFrame = {
    require((defaultPct +: rates.map(_._2)).forall(p => p >= 0 && p <= 100),
      s"rates must be percents in [0, 100]: $rates / $defaultPct")
    val rate = rates.foldRight(lit(defaultPct): Column) {
      case ((stratum, pct), rest) =>
        when(col(strataCol) === stratum, pct).otherwise(rest)
    }
    df.filter(bucket(col(keyCol)) < rate)
  }

  /** Inverse-propensity (Horvitz–Thompson) mean over a
    * [[stratifiedSample]]: each sampled row is re-weighted by
    * 1/p(selected) so the biased sample estimates the FULL-corpus
    * mean — the survey-statistics correction every down-sampled
    * metric needs. Weights are exact integers (10000/pct for the
    * percent rates this module draws with), so the estimate is a
    * ratio of exact integer sums.
    *
    * @param sampled output of [[stratifiedSample]] with the SAME
    *                rates
    * @return one row: `n_sample`, `naive_mean` (round 4, the biased
    *         one), `ipw_mean` (round 4)
    */
  def ipwMean(
      sampled: DataFrame, strataCol: String, valueCol: String,
      rates: Seq[(String, Int)], defaultPct: Int): DataFrame = {
    require((defaultPct +: rates.map(_._2)).forall(
      p => p > 0 && 10000 % p == 0),
      s"rates must divide 10000 for exact integer weights: $rates")
    val w = rates.foldRight(lit(10000L / defaultPct): Column) {
      case ((stratum, pct), rest) =>
        when(col(strataCol) === stratum, 10000L / pct).otherwise(rest)
    }
    val x = col(valueCol).cast("long")
    sampled.where(x.isNotNull)
      .select(col(strataCol), x.as("x"))
      .withColumn("_w", w)
      .agg(count(lit(1)).as("n_sample"),
        sum("x").as("_sx"), sum(col("_w") * col("x")).as("_swx"),
        sum("_w").as("_sw"))
      .select(col("n_sample"),
        round(col("_sx").cast("double") / col("n_sample").cast("double"),
          4).as("naive_mean"),
        round(col("_swx").cast("double") / col("_sw").cast("double"), 4)
          .as("ipw_mean"))
  }

  /** DuckDB fragment for [[bucket]], kept adjacent to prevent drift. */
  def duckBucket(x: String): String =
    Hashing.duckPortableHash(s"CAST($x AS VARCHAR)") + " % 100"

  /** Rendezvous (highest-random-weight) shard assignment: the key goes
    * to the shard whose per-(key, shard) hash scores highest. Unlike
    * `hash mod n` — which remaps ~(n−1)/n of ALL keys when n changes —
    * growing n → n+1 moves exactly the keys the NEW shard wins:
    * expected 1/(n+1) of the corpus. That is the property that makes
    * incremental re-sharding of a 100 TB store an O(moved-bytes) job
    * instead of a full rewrite (q153 measures the moved fraction).
    *
    * Scale shape: a pure narrow projection — the n candidate scores
    * are a per-row `transform` over a literal sequence, max-reduced in
    * place; no shuffle, no state, no lookup table. Deterministic ties
    * (hash, then shard id) via lexicographic struct max, and portable:
    * the score is [[Hashing.portableHash]] of `"<key>:<shard>"`, so
    * any engine replays the assignment.
    */
  def rendezvousShard(key: Column, n: Int): Column = {
    require(n > 0, s"shard count must be positive: $n")
    array_max(transform(sequence(lit(0), lit(n - 1)), s =>
      struct(
        Hashing.portableHash(
          concat(key.cast("string"), lit(":"), s.cast("string"))).as("h"),
        s.as("s"))))
      .getField("s")
  }

  /** Token-budget curation: per stratum, admit rows in (priority DESC,
    * key ASC) order while the running token total stays within
    * `budget` — how a corpus gets cut to "the best N billion tokens
    * per source". A row is admitted iff the cumulative token count
    * up to and INCLUDING it is ≤ budget: the kept set is the longest
    * prefix of the ranked list that fits (the first overflowing row
    * and everything after it are dropped — skipped rows still count
    * toward the running total, which keeps the rule a pure window
    * expression instead of a sequential scan).
    *
    * Scale shape: one shuffle by stratum + a per-stratum sort for the
    * running sum. Strata are sources/languages (thousands, each with
    * many rows) — the window partition is coarse but bounded per
    * executor by the sort spilling to disk; for a pathologically large
    * single stratum, pre-aggregate to (priority-bucket) granularity
    * first. The tie-break on `keyCol` makes admission deterministic
    * under re-partitioning.
    *
    * @return input rows that made the cut, plus `cum_tokens` (running
    *         total including the row)
    */
  def budgetSample(
      df: DataFrame, keyCol: String, strataCol: String,
      tokensCol: String, priority: Column, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    require(!df.columns.contains("cum_tokens"),
      "budgetSample emits cum_tokens: rename the existing column first")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCol)
      .orderBy(priority.desc, col(keyCol).asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    df.withColumn("cum_tokens", sum(col(tokensCol).cast("long")).over(w))
      .filter(col("cum_tokens") <= budget)
  }

  /** Temperature-weighted corpus mixing (α = 0.5) — the multilingual/
    * multi-source rebalancing rule (mT5, XLM-R shape): a stratum's
    * share of the target is ∝ √(its size), so huge sources are
    * down-weighted and small ones surface, without any source ever
    * being upsampled (rates cap at 1). Keeps ≈`targetRows` rows total.
    *
    * Determinism across engines, by construction: per-stratum sizes →
    * `s6 = floor(√n · 10⁶)` (one IEEE sqrt, floored — bit-stable
    * anywhere) → integer-exact sum; each stratum's keep rate in ppm is
    * one floored DECIMAL division (no float accumulation, no boundary
    * wobble); membership is the portable md5 hash of the key mod 10⁶.
    * Scale shape: one tiny stats agg, broadcast back, shuffle-free
    * membership predicate — [[stratifiedSample]] with computed rates.
    *
    * @return kept rows plus their stratum's `rate_ppm`
    */
  def temperatureMix(
      df: DataFrame, keyCol: String, strataCol: String,
      targetRows: Long): DataFrame = {
    require(targetRows > 0, s"targetRows must be positive: $targetRows")
    require(!df.columns.contains("rate_ppm"),
      "temperatureMix emits rate_ppm: rename the existing column first")
    val m = lit(1000000L)
    val counts = df.groupBy(col(strataCol))
      .agg(count(lit(1)).as("_n"))
      .withColumn("_s6", floor(sqrt(col("_n")) * m).cast("long"))
    val tot = counts.agg(sum(col("_s6")).as("_tot6"))
    // Exact integer floor-division: Spark's decimal `/` rounds HALF_UP
    // to the result scale BEFORE floor(), so a quotient within 5e-7
    // below an integer would round up and drift one ppm off the
    // DuckDB oracle's exact HUGEINT division. Subtracting pmod first
    // makes the numerator an exact multiple of the divisor — the
    // division then has a zero fraction and no rounding can bite.
    val num = col("_s6").cast("decimal(38,0)") * targetRows * m
    val den = col("_tot6").cast("decimal(38,0)") * col("_n")
    val rates = counts.crossJoin(broadcast(tot))
      .withColumn("rate_ppm",
        least(m, ((num - pmod(num, den)) / den).cast("long")))
      .select(col(strataCol), col("rate_ppm"))
    df.join(broadcast(rates), Seq(strataCol))
      .filter(pmod(Hashing.portableHash(col(keyCol).cast("string")), m) <
        col("rate_ppm"))
  }

  /** Deterministic global shuffle + shard assignment — the last step
    * before a corpus becomes training data: every row gets a stable
    * pseudo-random position (`rankCol`, 0-based) and a shard id
    * (`shardCol` = rank / shardSize), so shard files can be written
    * with `df.write.partitionBy(shardCol)` and any engine can replay
    * the exact epoch order. "Random" is the portable hash of `keyCol`
    * (ties broken by the key's string form), so the permutation is a
    * pure function of the data — reshuffling partitions, adding
    * executors, or re-running never changes it. `keyCol` must be
    * non-null on every row (a null key has no portable hash, here or
    * in any auditing engine); violations fail fast with a message
    * rather than an opaque NPE mid-job.
    *
    * Scale shape: a global permutation genuinely needs one distributed
    * sort — `sortBy` range-partitions on sampled split points and
    * `zipWithIndex` numbers with per-partition offsets (one tiny count
    * job), so there is NO single-task global window (the r2
    * killer). Cost: one sort shuffle of the corpus, nothing else.
    */
  def shuffleShards(
      df: DataFrame, keyCol: String, shardSize: Long,
      rankCol: String = "rank", shardCol: String = "shard"): DataFrame = {
    require(shardSize > 0, s"shardSize must be positive: $shardSize")
    require(!df.columns.contains(rankCol) && !df.columns.contains(shardCol),
      s"shuffleShards emits '$rankCol'/'$shardCol': rename existing columns")
    val spark = df.sparkSession
    val h = "_gs_h"
    val withH = df.withColumn(h,
      Hashing.portableHash(col(keyCol).cast("string")))
    val st = withH.schema
    val hi = st.fieldIndex(h)
    val ki = st.fieldIndex(keyCol)
    val ranked = withH.rdd
      .sortBy { r =>
        // Null keys have no portable hash (the oracle can't place
        // them either): fail fast with the contract instead of an
        // opaque NullPointerException from getLong mid-job.
        require(!r.isNullAt(hi),
          s"shuffleShards requires a non-null '$keyCol' on every row")
        (r.getLong(hi), String.valueOf(r.get(ki)))
      }
      .zipWithIndex()
      .map { case (r, i) => org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i) }
    spark.createDataFrame(ranked,
        st.add(rankCol, org.apache.spark.sql.types.LongType))
      .withColumn(shardCol, floor(col(rankCol) / shardSize).cast("long"))
      .drop(h)
  }

  /** Deterministic k-per-stratum sample (the "show me 5 docs per
    * language" debug/QA draw): rank rows within each stratum by the
    * portable hash of the key and keep the k smallest — a reproducible
    * uniform draw, stable across runs and repartitioning like every
    * split above.
    *
    * Scale shape: the naive form is a window over EVERY stratum row —
    * with few strata that is a near-global sort. `prunePpm` is the
    * standard fix: a shuffle-free hash predicate (`h mod 1e6 <
    * prunePpm`) prunes the corpus BEFORE the window. The window ranks
    * by the SAME `h mod 1e6` value the prune filters on (full hash
    * then key break ties), so the prune is exact — the k
    * smallest-ranked rows all survive it — as long as every stratum
    * retains >= k rows after pruning. Size prunePpm for k << expected
    * stratum size, or pass 1000000 to disable.
    *
    * @return input rows plus `draw_rank` (1..k within the stratum)
    */
  def reservoirPerGroup(
      df: DataFrame, keyCol: String, strataCol: String, k: Int,
      prunePpm: Int = 1000000): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    require(prunePpm > 0 && prunePpm <= 1000000,
      s"prunePpm must be in (0, 1e6]: $prunePpm")
    require(!df.columns.contains("draw_rank"),
      "reservoirPerGroup emits 'draw_rank': rename the existing column")
    val h = Hashing.portableHash(
      concat(lit("rg:"), col(keyCol).cast("string")))
    val hmod = pmod(h, lit(1000000L))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCol).orderBy(hmod, h, col(keyCol))
    df.filter(hmod < prunePpm)
      .withColumn("draw_rank", row_number().over(w))
      .filter(col("draw_rank") <= k)
  }

  /** Weighted sampling without replacement (Efraimidis & Spirakis
    * 2006, "A-Res"): each row draws `u = hash-uniform(0,1)` and keeps
    * key `ln(u) / w` — taking the k LARGEST keys samples k rows
    * without replacement with probability proportional to weight
    * (longer / higher-quality documents more likely, never certain).
    * The uniform comes from [[Hashing.portableHash]] of the row key,
    * so the draw is reproducible across engines and runs — same
    * discipline as every split above.
    *
    * Scale shape: the key is a pure per-row expression and the cut is
    * a distributed top-k (`TakeOrderedAndProject`, k << corpus) — no
    * global sort, no shuffle beyond the k-row merge.
    *
    * Rows with null or non-positive weight never qualify (ES is
    * undefined there, and ln(u) < 0 would flip the order for w < 0).
    *
    * @return the k sampled rows with `es_key` (= ln(u)/w) appended
    */
  def weightedSample(
      df: DataFrame, keyCol: String, weightCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    require(!df.columns.contains("es_key"),
      "weightedSample emits 'es_key': rename the existing column")
    val u = (pmod(Hashing.portableHash(
        concat(lit("es:"), col(keyCol).cast("string"))),
      lit(1000000L)).cast("double") + lit(0.5)) / lit(1000000.0)
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("es_key", log(u) / col(weightCol).cast("double"))
      .orderBy(col("es_key").desc, col(keyCol))
      .limit(k)
  }
}
