package graft.ops

import graft.functions.Hashing
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Contrastive training-pair construction: (anchor, positive,
  * negatives…) triplets for embedding/retrieval training — positives
  * from the verified near-dup graph, negatives drawn DETERMINISTICALLY
  * by hash from the whole corpus and then REJECTED (flagged, not
  * silently dropped) when a draw collides with the anchor's own
  * duplicate neighborhood. The false-negative audit column is the
  * point: contrastive losses are poisoned by negatives that are
  * secretly positives.
  *
  * Scale shape: the corpus gets ONE distributed hash-permutation
  * ([[Sampling.shuffleShards]]'s sortBy+zipWithIndex — no global
  * window), negatives resolve by an equi-join on the drawn rank, and
  * the neighborhood rejection is a LEFT join against the pair frame —
  * never an all-pairs product.
  */
object Contrastive {

  /** @param docs   corpus (idCol)
    * @param pairs  verified near-dup pairs (aCol, bCol), both
    *               orientations NOT required
    * @param negsPer negatives drawn per anchor
    * @return per (anchor, draw): `anchor`, `pos` (smallest near-dup
    *         neighbor), `neg_ix` (0-based draw index), `neg`,
    *         `clean` (1 unless the draw hit the anchor itself, its
    *         positive, or any of its near-dups)
    */
  def triplets(
      docs: DataFrame, idCol: String,
      pairs: DataFrame, aCol: String, bCol: String,
      negsPer: Int): DataFrame = {
    val sym = pairs
      .select(col(aCol).cast("long").as("u"), col(bCol).cast("long").as("v"))
      .union(pairs.select(col(bCol).cast("long").as("u"),
        col(aCol).cast("long").as("v")))
      .distinct()
      .localCheckpoint(true)
    val anchors = sym.groupBy(col("u").as("anchor"))
      .agg(min("v").as("pos"))
    val ranked = Sampling.shuffleShards(
        docs.select(col(idCol)), idCol, shardSize = Long.MaxValue)
      .select(col(idCol).cast("long").as("neg"), col("rank"))
      .localCheckpoint(true)
    val nTot = ranked.agg(count(lit(1)).as("_n"))
    val drawn = anchors
      .crossJoin(broadcast(nTot))
      .select(col("anchor"), col("pos"),
        explode(sequence(lit(0), lit(negsPer - 1))).as("neg_ix"),
        col("_n"))
      .withColumn("rank", pmod(
        Hashing.seededHash(col("neg_ix"), col("anchor").cast("string")),
        col("_n")))
      .join(ranked, Seq("rank"))
    drawn
      .join(sym.select(col("u").as("anchor"), col("v").as("neg"))
          .withColumn("_dup", lit(1)),
        Seq("anchor", "neg"), "left")
      .select(col("anchor"), col("pos"), col("neg_ix"), col("neg"),
        when(col("neg") === col("anchor") || col("neg") === col("pos") ||
          col("_dup").isNotNull, 0).otherwise(1).as("clean"))
  }
}
