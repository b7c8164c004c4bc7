package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental surrogate-key assignment — the warehouse key-management
  * contract: keys already in the dimension KEEP their surrogate
  * forever; only never-seen keys get new ids, numbered densely after
  * the current maximum in deterministic key order. (Re-ranking
  * everything, the q23 full-build path, changes history's ids — the
  * one thing a dimension must never do.)
  *
  * Scale shape: the anti-join isolates the DELTA; the only ordered
  * window runs over that delta frame, which is ingest-batch-sized,
  * not dimension-sized. The current max is a 1-row broadcast.
  */
object SurrogateKeys {

  /** @param existing current dimension (`keyCol`, `skCol` long)
    * @param incoming new snapshot (any frame with `keyCol`)
    * @return full updated dimension: `keyCol`, `skCol`, `is_new`
    *         (0/1)
    */
  def assignIncremental(
      existing: DataFrame, keyCol: String, skCol: String,
      incoming: DataFrame): DataFrame = {
    val mx = existing.agg(coalesce(max(col(skCol)), lit(0L)).as("_mx"))
    val fresh = incoming.select(col(keyCol)).distinct()
      .join(existing.select(col(keyCol)), Seq(keyCol), "left_anti")
    // Ordered window over the DELTA only (batch-sized by
    // construction).
    val w = Window.orderBy(col(keyCol).asc)
    val assigned = fresh
      .withColumn("_rk", row_number().over(w).cast("long"))
      .crossJoin(broadcast(mx))
      .select(col(keyCol), (col("_mx") + col("_rk")).as(skCol),
        lit(1).as("is_new"))
    existing.select(col(keyCol), col(skCol).cast("long").as(skCol),
        lit(0).as("is_new"))
      .unionByName(assigned)
  }
}
