package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Item–item co-occurrence similarity (the classic collaborative-
  * filtering item matrix): for every pair of items, how many entities
  * touched both, normalized by cosine n_ij/√(n_i·n_j) — "users who
  * did X also did Y", or at corpus scale "documents tagged A are
  * also tagged B". The bipartite cousin of q161's association rules
  * (those rank rules by confidence/lift; this builds the symmetric
  * similarity matrix a recommender or tag-consolidation pass
  * consumes).
  *
  * Same scale skeleton as Itemsets: distinct (entity, item) grain,
  * pair generation by entity self-join (shuffle on the entity key,
  * blow-up bounded by per-entity item counts, never corpus²), counts
  * as integers, cosine one rational expression at the end.
  */
object CoOccurrence {

  /** @return per unordered item pair (a < b): `n_a`, `n_b` (entity
    *         counts), `n_both`, `cosine` = n_both/√(n_a·n_b)
    *         (round 6)
    */
  def itemCosine(
      df: DataFrame, entityCol: String, itemCol: String,
      minBoth: Int): DataFrame = {
    val b = df.select(col(entityCol).as("e"), col(itemCol).as("item"))
      .where(col("e").isNotNull && col("item").isNotNull)
      .distinct()
    val counts = b.groupBy("item").agg(count(lit(1)).as("n_item"))
    val pairs = b.as("x").join(b.as("y"), Seq("e"))
      .where(col("x.item") < col("y.item"))
      .groupBy(col("x.item").as("item_a"), col("y.item").as("item_b"))
      .agg(count(lit(1)).as("n_both"))
      .where(col("n_both") >= minBoth)
    pairs
      .join(broadcast(counts.withColumnsRenamed(
        Map("item" -> "item_a", "n_item" -> "n_a"))), Seq("item_a"))
      .join(broadcast(counts.withColumnsRenamed(
        Map("item" -> "item_b", "n_item" -> "n_b"))), Seq("item_b"))
      .select(col("item_a"), col("item_b"), col("n_a"), col("n_b"),
        col("n_both"),
        round(col("n_both").cast("double") /
          sqrt(col("n_a").cast("double") * col("n_b").cast("double")), 6)
          .as("cosine"))
  }
}
