package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Three-way master-data reconciliation: align the same entity table
  * from three systems on its business key and report, per presence
  * pattern (which systems have the key), how many keys land there
  * and how many of the multi-present ones DISAGREE on content — the
  * first question of any migration/sync audit ("who's missing what,
  * and where do the copies fight").
  *
  * One chained full-outer join on the (already unique) key — each
  * side reduced to (key, compared fields) in its scan projection —
  * then pure flag/compare arithmetic. Null-safe equality (`<=>`)
  * keeps "both null" an agreement and "null vs value" a conflict.
  */
object Reconcile {

  /** @param fields the content columns to compare (same names on all
    *               three inputs)
    * @return per presence pattern (`in_a`/`in_b`/`in_c` flags):
    *         `n_keys`, `n_conflicts` (keys present ≥2× whose present
    *         copies disagree on ANY field)
    */
  def threeWay(
      a: DataFrame, b: DataFrame, c: DataFrame, keyCol: String,
      fields: Seq[String]): DataFrame = {
    def prep(df: DataFrame, side: String) = df.select(
      col(keyCol).as(s"k_$side") +:
        fields.map(f => col(f).as(s"${f}_$side")): _*)
    val joined = prep(a, "a")
      .join(prep(b, "b"), col("k_a") === col("k_b"), "full_outer")
      .withColumn("_k1", coalesce(col("k_a"), col("k_b")))
      .join(prep(c, "c"), col("_k1") === col("k_c"), "full_outer")
    val inA = col("k_a").isNotNull
    val inB = col("k_b").isNotNull
    val inC = col("k_c").isNotNull
    def disagree(x: String, y: String): Column =
      fields.map(f => !(col(s"${f}_$x") <=> col(s"${f}_$y")))
        .reduce(_ || _)
    val conflict =
      (inA && inB && disagree("a", "b")) ||
        (inA && inC && disagree("a", "c")) ||
        (inB && inC && disagree("b", "c"))
    joined
      .groupBy(inA.as("in_a"), inB.as("in_b"), inC.as("in_c"))
      .agg(count(lit(1)).as("n_keys"),
        sum(when(conflict, 1L).otherwise(0L)).as("n_conflicts"))
  }

  /** Corpus ↔ persisted-index synchronization audit — the
    * operational health check every stored index (bands, codes,
    * postings, cluster map, hist partials) needs once maintenance is
    * incremental: which corpus docs the index MISSES (appended but
    * never ingested — probes silently exclude them) and which index
    * entries are ORPHANED (doc deleted/forgotten from the corpus but
    * still indexed — `Layout.forgetKeys` left behind, or a retention
    * delete that never reached the index). One full-outer join of the
    * two DISTINCT id sets (the index side may legitimately hold
    * multiple rows per doc — postings terms, cluster-map generations
    * — so both sides dedup to doc grain first), then a single
    * combinable aggregate.
    *
    * @return one row: `n_corpus`, `n_indexed`, `n_missing` (in
    *         corpus, not indexed), `n_orphaned` (indexed, not in
    *         corpus), `sync_ppm` (indexed-and-present per million
    *         corpus docs; 1,000,000 = fully synchronized)
    */
  def indexSync(
      corpus: DataFrame, idCol: String,
      index: DataFrame, indexIdCol: String): DataFrame = {
    val c = corpus.select(col(idCol).cast("long").as("id"))
      .distinct().withColumn("_c", lit(1L))
    val i = index.select(col(indexIdCol).cast("long").as("id"))
      .distinct().withColumn("_i", lit(1L))
    c.join(i, Seq("id"), "full_outer")
      .agg(
        coalesce(sum("_c"), lit(0L)).cast("long").as("n_corpus"),
        coalesce(sum("_i"), lit(0L)).cast("long").as("n_indexed"),
        coalesce(sum(when(col("_i").isNull, 1L).otherwise(0L)), lit(0L))
          .as("n_missing"),
        coalesce(sum(when(col("_c").isNull, 1L).otherwise(0L)), lit(0L))
          .as("n_orphaned"))
      .withColumn("sync_ppm", expr(
        "((n_corpus - n_missing) * 1000000) div greatest(n_corpus, 1)"))
  }
}
