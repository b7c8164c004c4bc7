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
}
