package graft.ops

import graft.functions.Hashing
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Trailing-window distinct counting — "distinct users per type over
  * the last 7 days, every day" — the metric that makes naive engines
  * rescan a week of raw data per day because COUNT(DISTINCT) doesn't
  * decompose over windows. The mergeable-sketch design does it from
  * DAILY partial aggregates:
  *
  *  - one pass builds a per-(group, day) KMV sketch (k longs each —
  *    the daily cube a 100 TB pipeline materializes anyway);
  *  - each trailing window then MERGES its ≤w daily sketches (union,
  *    sort, take k) — the window compare runs on the (groups × days)
  *    sketch frame, never on raw data, and yesterday's sketches are
  *    reused verbatim tomorrow;
  *  - the exact tier (distinct (group, day, user) expanded onto the
  *    day grid) rides along q154-style so the estimate's error is
  *    visible per window.
  *
  * md5-based hashes keep every sketch value engine-portable: the
  * ESTIMATE is hash-compared, not tolerance-judged.
  */
object RollingDistinct {

  /** @return per (group, day): `n_exact` distinct keys in
    *         [day−w+1, day], `n_est` the KMV estimate (round 1)
    */
  def trailingDistinct(
      df: DataFrame, groupCol: String, dayCol: String, keyCol: String,
      windowDays: Int, k: Int): DataFrame = {
    require(windowDays >= 1 && k >= 2)
    val h = Hashing.portableHash(col(keyCol).cast("string"))
    val daily = df
      .select(col(groupCol).as("g"), col(dayCol).cast("long").as("d"),
        h.as("h"))
      .groupBy("g", "d")
      .agg(expr(s"graft_kmv(h, $k)").as("sig"))
    val days = daily.select(col("g"), col("d"))
    val merged = days.as("t")
      .join(daily.as("s"),
        col("t.g") === col("s.g") &&
          col("s.d") >= col("t.d") - lit(windowDays.toLong - 1) &&
          col("s.d") <= col("t.d"))
      .select(col("t.g").as("g"), col("t.d").as("d"),
        explode(col("s.sig")).as("hv"))
      .distinct()
      .groupBy("g", "d")
      .agg(slice(array_sort(collect_set(col("hv"))), 1, k).as("u"))
    val est = merged.select(col("g"), col("d"),
      (round(when(size(col("u")) < k, size(col("u")).cast("double"))
        .otherwise(lit((k - 1).toDouble) * lit(1152921504606846976L) /
          element_at(col("u"), k).cast("double")), 1) + lit(0.0))
        .as("n_est"))
    val exactDaily = df.select(col(groupCol).as("g"),
        col(dayCol).cast("long").as("d"), col(keyCol).as("key"))
      .distinct()
    val exact = days.as("t")
      .join(exactDaily.as("s"),
        col("t.g") === col("s.g") &&
          col("s.d") >= col("t.d") - lit(windowDays.toLong - 1) &&
          col("s.d") <= col("t.d"))
      .groupBy(col("t.g").as("g"), col("t.d").as("d"))
      .agg(countDistinct(col("s.key")).as("n_exact"))
    exact.join(est, Seq("g", "d"))
      .select(col("g"), col("d"), col("n_exact"), col("n_est"))
  }
}
