package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation combinators.
  *
  * AQE's skew-join splitting (enabled in `Graft.session`) handles the
  * JOIN side of skew at runtime; these handle the AGGREGATION side,
  * where one hot key (a mega-company, an empty-string country, a null
  * bucket) funnels through a single reducer. The fix is the classic
  * two-phase salted aggregate: spray each key across `salts` partial
  * groups, combine, then reduce the partials — turning one hot reducer
  * into `salts` balanced ones at the cost of a second (tiny) shuffle.
  */
object Skew {

  /** Salted sum: ≡ `df.groupBy(keys).agg(sum(valueCol))` for ANY data,
    * but the first shuffle is keyed by (keys, salt) so a hot key is
    * spread over `salts` reducers. Use when a group's row count can be
    * orders of magnitude above the median (power-law company sizes at
    * 100 TB); for uniform keys the plain aggregate is cheaper — this is
    * an opt-in, not a default.
    */
  def saltedSum(
      keys: Seq[String], valueCol: String, resultCol: String,
      salts: Int = 16)(df: DataFrame): DataFrame = {
    require(salts > 0, "salts must be positive")
    val keyCols: Seq[Column] = keys.map(col)
    df
      // Deterministic spray: hash of ALL columns mod salts (row identity
      // based, so re-computation under task retry lands identically —
      // rand() here would break exactly-once shuffle files).
      .withColumn("_salt",
        pmod(hash(df.columns.map(col).toIndexedSeq: _*), lit(salts)))
      .groupBy((keyCols :+ col("_salt")): _*)
      .agg(sum(col(valueCol)).as("_partial"))
      .groupBy(keyCols: _*)
      .agg(sum(col("_partial")).as(resultCol))
  }
}
