package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Behavioral-combo segmentation: per (entity, day) the BITMASK of
  * event types seen, counted per mask — every "did X and Y but not Z"
  * cohort in ONE pass (the 2^k segment lattice that k separate
  * funnels would each rescan for). Bit positions are assigned by the
  * caller-supplied type order, so the mask is stable as new types
  * appear.
  *
  * One (entity, day)-grain bit_or aggregate, then a mask-sized count
  * frame; the decode is a narrow projection.
  */
object Behavior {

  /** @param types bit i ↔ types(i); events of other types are IGNORED
    * @return per observed mask: `mask`, `combo` ('+'-joined type
    *         names in bit order), `n_entity_days`, `n_entities`
    *         (distinct entities that ever produced the mask)
    */
  def typeCombos(
      df: DataFrame, entityCol: String, dayCol: String,
      typeCol: String, types: Seq[String]): DataFrame = {
    val bit = types.zipWithIndex.foldRight(lit(0L)) {
      case ((t, i), rest) =>
        when(col(typeCol) === t, lit(1L << i)).otherwise(rest)
    }
    val masks = df
      .select(col(entityCol).as("e"), col(dayCol).cast("long").as("d"),
        bit.as("b"))
      .where(col("b") > 0)
      .groupBy("e", "d").agg(expr("bit_or(b)").as("mask"))
    val combo = types.zipWithIndex.map { case (t, i) =>
      when((col("mask").bitwiseAND(lit(1L << i))) > 0, t) }
    masks.groupBy("mask")
      .agg(count(lit(1)).as("n_entity_days"),
        countDistinct("e").as("n_entities"))
      .withColumn("combo", concat_ws("+", combo: _*))
      .select("mask", "combo", "n_entity_days", "n_entities")
  }

  /** Per-entity behavioral entropy: Shannon entropy of each entity's
    * event-type mix, plus the ln(k)-normalized version — the
    * "predictability" score (0 = always the same action, 1 = uniform
    * over observed types) that segments power users from one-trick
    * bots. Each −p·ln p term snaps to integer nano-nats before the
    * per-entity sum (≤ |types| cells, order-free); the type-count
    * frame is (entities × types)-sized.
    *
    * @return per entity: `entity`, `n_events`, `n_types`,
    *         `entropy_nats` (round 4), `entropy_norm` (round 4;
    *         null for single-type entities, whose ln(k) is 0)
    */
  def entityEntropy(
      df: DataFrame, entityCol: String, typeCol: String): DataFrame = {
    val counts = df
      .select(col(entityCol).as("entity"), col(typeCol).as("t"))
      .where(col("t").isNotNull)
      .groupBy("entity", "t").agg(count(lit(1)).as("c"))
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    val per = counts
      .withColumn("_n", sum("c").over(
        org.apache.spark.sql.expressions.Window.partitionBy("entity")))
      .withColumn("_term",
        round(-(d(col("c")) / d(col("_n"))) *
          log(d(col("c")) / d(col("_n"))) * lit(1e9)).cast("long"))
      .groupBy("entity")
      .agg(max("_n").as("n_events"), count(lit(1)).as("n_types"),
        sum("_term").as("_h"))
    per.select(col("entity"), col("n_events"), col("n_types"),
      round(col("_h").cast("double") / lit(1e9), 4).as("entropy_nats"),
      round(when(col("n_types") > 1,
        col("_h").cast("double") / lit(1e9) /
          log(col("n_types").cast("double"))), 4).as("entropy_norm"))
  }
}
