package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed training-data curation flow — the reason the LLM-tier
  * operators exist as a LIBRARY: exact dedup → quality / language
  * gating → near-duplicate removal → corpus accounting, each stage a
  * shuffle-conscious operator already proven individually.
  *
  * Scale shape: stage 1 is one hash aggregate; stage 2 is narrow
  * per-row scoring; stage 3 reuses the banded minhash join (never
  * all-pairs); the final accounting is a partial+final hash aggregate.
  * Nothing materializes on the driver.
  */
object CorpusPipeline {

  /** Returns the per-source accounting of the curated corpus:
    * documents kept, tokens kept, and how many fell to each gate.
    *
    * Near-dup policy: from every verified pair (id_a < id_b) the
    * LARGER id is dropped — deterministic, order-free, and transitive
    * enough for dedup purposes (the canonical smallest id of each
    * near-dup cluster always survives).
    */
  def curate(
      df: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      sourceCol: String = "source",
      minQuality: Double = 0.5, lang: String = "en",
      minhashK: Int = 64, bands: Int = 8, jaccard: Double = 0.8): DataFrame = {
    // Stage 1: exact-dup winners (lowest id per identical text).
    val exactWinners = Dedup.exact(df, textCol, idCol)
      .select(col("keep_id").as(idCol))
    val deduped = df.join(exactWinners, Seq(idCol))

    // Stage 2: quality + language gate (narrow, codegen'd signals).
    val gated = deduped
      .withColumn("_quality", TextAnalysis.qualityScore(col(textCol)))
      .withColumn("_lang", TextAnalysis.langIdHeuristic(col(textCol)))
      .filter(col("_quality") >= minQuality && col("_lang") === lang)

    // Stage 3: near-dup losers via the banded minhash join over the
    // GATED survivors (smaller input → smaller candidate set).
    val losers = Dedup.minhashNearDups(gated, idCol, textCol,
      k = minhashK, bands = bands, threshold = jaccard)
      .select(col("id_b").as(idCol)).distinct()
    val kept = gated.join(losers, Seq(idCol), "left_anti")

    kept
      .groupBy(col(sourceCol))
      .agg(
        count(lit(1)).as("docs_kept"),
        sum(TextAnalysis.tokenCount(col(textCol))).as("tokens_kept"))
      .orderBy(sourceCol)
  }

  /** The complete standard curation flow: PII scrub → benchmark
    * decontamination → [[curate]] (exact dedup → quality/language gate
    * → near-dup removal → accounting). Each added stage is narrow or a
    * broadcast semi-join, so the scale shape of [[curate]] is
    * unchanged. Redaction runs FIRST so dedup/quality/shingles all see
    * the text the model would actually train on.
    */
  def curateFull(
      df: DataFrame, benchmark: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      sourceCol: String = "source", decontamN: Int = 5,
      minQuality: Double = 0.5, lang: String = "en",
      minhashK: Int = 64, bands: Int = 8, jaccard: Double = 0.8): DataFrame = {
    val scrubbed = df.withColumn(textCol,
      TextAnalysis.redactPii(col(textCol)))
    val clean = Dedup.decontaminate(scrubbed, benchmark, idCol, textCol, decontamN)
    curate(clean, idCol, textCol, sourceCol, minQuality, lang,
      minhashK, bands, jaccard)
  }
}
