package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** k-anonymity risk report over quasi-identifier columns (Sweeney
  * 2002): every row whose QI equivalence class has fewer than k
  * members is re-identifiable by linking those attributes — the
  * governance gate to run BEFORE sharing a "de-identified" extract.
  *
  * One QI-grain count aggregate; the report is the class frame. The
  * output is the `topN` SMALLEST classes (the actual risk surface,
  * not a yes/no) with the corpus-level summary repeated on each row:
  * total classes, classes below k, records at risk, and the minimum
  * class size (the dataset's true k).
  */
object Anonymity {

  def kAnonymity(
      df: DataFrame, qiCols: Seq[String], k: Long,
      topN: Int): DataFrame = {
    val classes = df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
      .localCheckpoint(true)
    val summary = classes.agg(
      count(lit(1)).as("n_classes"),
      sum(when(col("class_size") < k, 1L).otherwise(0L))
        .as("n_small_classes"),
      sum(when(col("class_size") < k, col("class_size")).otherwise(0L))
        .as("records_at_risk"),
      min("class_size").as("min_class_size"),
      sum("class_size").as("n_records"))
    // Explicit top-N (TakeOrderedAndProject — per-partition heaps,
    // one topN-row merge), then the rank window runs on the ≤ topN
    // survivors only: never a rank window over the full class frame
    // whose single-task sort only InferWindowGroupLimit defuses.
    val ordCols = col("class_size").asc +: qiCols.map(col(_).asc)
    classes
      .orderBy(ordCols: _*)
      .limit(topN)
      .withColumn("risk_rank", row_number().over(Window.orderBy(ordCols: _*)))
      .crossJoin(broadcast(summary))
      .select((col("risk_rank") +: qiCols.map(col) :+
        col("class_size") :+ col("n_classes") :+
        col("n_small_classes") :+ col("records_at_risk") :+
        col("min_class_size") :+
        expr("(records_at_risk * 1000000) DIV n_records")
          .as("risk_ppm")): _*)
  }

  /** l-diversity audit (Machanavajjhala et al. 2007): k-anonymity is
    * not enough when everyone in a large QI class shares the SAME
    * sensitive value — the attacker learns it without distinguishing
    * anyone. A class is l-diverse when it contains ≥ l distinct
    * well-represented sensitive values; this reports distinct-count
    * l-diversity per class plus the corpus summary, listing the topN
    * LEAST diverse classes (the disclosure surface).
    *
    * One (QI, sensitive)-grain count, reduced to QI grain with an
    * exact distinct count — no second data pass; the rank window runs
    * on the topN survivors of an explicit TakeOrderedAndProject, the
    * same discipline as [[kAnonymity]].
    *
    * @return topN rows: `risk_rank`, QI cols, `class_size`,
    *         `n_sensitive` (distinct sensitive values in the class),
    *         `n_classes`, `n_below_l`, `records_below_l`, `min_l`
    *         (the dataset's true l)
    */
  def lDiversity(
      df: DataFrame, qiCols: Seq[String], sensitiveCol: String,
      l: Long, topN: Int): DataFrame = {
    val cells = df.groupBy(
        (qiCols.map(col) :+ col(sensitiveCol).as("_sv")): _*)
      .agg(count(lit(1)).as("_n"))
    val classes = cells.groupBy(qiCols.map(col): _*)
      .agg(sum("_n").as("class_size"),
        count(lit(1)).as("n_sensitive"))
      .localCheckpoint(true)
    val summary = classes.agg(
      count(lit(1)).as("n_classes"),
      sum(when(col("n_sensitive") < l, 1L).otherwise(0L))
        .as("n_below_l"),
      sum(when(col("n_sensitive") < l, col("class_size"))
        .otherwise(0L)).as("records_below_l"),
      min("n_sensitive").as("min_l"))
    val ordCols = (col("n_sensitive").asc +: col("class_size").desc +:
      qiCols.map(col(_).asc))
    classes
      .orderBy(ordCols: _*)
      .limit(topN)
      .withColumn("risk_rank",
        row_number().over(Window.orderBy(ordCols: _*)))
      .crossJoin(broadcast(summary))
      .select((col("risk_rank") +: qiCols.map(col) :+
        col("class_size") :+ col("n_sensitive") :+ col("n_classes") :+
        col("n_below_l") :+ col("records_below_l") :+ col("min_l")): _*)
  }
}
