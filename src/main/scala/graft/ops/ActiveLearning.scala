package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Uncertainty-sampling batch selection (Lewis & Gale SIGIR'94, the
  * margin variant) — "which unlabeled rows should the annotators see
  * next": k-NN-classify every pool row against the labeled seed set,
  * and pick the rows with the smallest VOTE MARGIN (top-label votes
  * minus runner-up votes), i.e. the ones the current labels are least
  * sure about. The batch is what an annotation round actually
  * consumes, so the batch IS the output, in priority order.
  *
  * Scale shape: the labeled seed set is small by construction (it's
  * what was annotated so far) — it broadcasts; the POOL is the big
  * side and never shuffles except the per-pool-row top-k window
  * (partitioned by pool id, high cardinality) and the final
  * global-batch cut, which is an `orderBy().limit(batch)` top-k
  * (per-partition heaps, no single-task sort). Vote counts and
  * margins are exact integers; cosine ranking reuses the sequential
  * [[Similarity.dot]] discipline, so any engine replays the ranking.
  *
  * @return `batch` rows, most-uncertain first: `selection_rank`,
  *         `<idCol>`, `top_label`, `top_votes`, `second_votes`,
  *         `margin`
  */
object ActiveLearning {

  def uncertaintyBatch(
      labeled: DataFrame, pool: DataFrame, idCol: String,
      vecCol: String, labelCol: String, k: Int, batch: Int): DataFrame = {
    val lab = labeled.select(col(idCol).as("_lid"),
      col(vecCol).as("_lv"), col(labelCol).as("_lbl"))
    val wTop = Window.partitionBy(col("_pid"))
      .orderBy(col("_cos").desc, col("_lid").asc)
    val votes = pool
      .select(col(idCol).as("_pid"), col(vecCol).as("_pv"))
      .crossJoin(broadcast(lab))
      .withColumn("_cos", Similarity.cosine(col("_pv"), col("_lv")))
      .withColumn("_rn", row_number().over(wTop))
      .where(col("_rn") <= k)
      .groupBy(col("_pid"), col("_lbl"))
      .agg(count(lit(1)).as("_votes"))
    val wVote = Window.partitionBy(col("_pid"))
      .orderBy(col("_votes").desc, col("_lbl").asc)
    val perPool = votes
      .withColumn("_vr", row_number().over(wVote))
      .where(col("_vr") <= 2)
      .groupBy("_pid")
      .agg(
        max(when(col("_vr") === 1, col("_lbl"))).as("top_label"),
        max(when(col("_vr") === 1, col("_votes"))).as("top_votes"),
        coalesce(max(when(col("_vr") === 2, col("_votes"))), lit(0L))
          .as("second_votes"))
      .withColumn("margin", col("top_votes") - col("second_votes"))
    val wSel = Window.orderBy(col("margin").asc, col("_pid").asc)
    perPool
      .orderBy(col("margin").asc, col("_pid").asc).limit(batch)
      .withColumn("selection_rank", row_number().over(wSel))
      .select(col("selection_rank"), col("_pid").as(idCol),
        col("top_label"), col("top_votes"), col("second_votes"),
        col("margin"))
  }
}
