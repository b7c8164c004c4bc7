package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pareto-frontier (skyline) selection: the rows no other row in the
  * group beats on BOTH objectives — the multi-objective version of
  * "take the best documents", where quality and cost trade off and a
  * single score would bake in an arbitrary exchange rate. A row is
  * dominated iff some row is ≥ on the maximized column, ≤ on the
  * minimized column, and strictly better on at least one.
  *
  * The textbook formulation is the O(n²) dominance anti-join (the
  * oracle replays exactly that); at scale this implementation is the
  * 2-D staircase instead: one sort per group, two window functions,
  * O(n log n) and a single shuffle on the group key —
  *  - `minBefore`  = min(minCol) over rows with maxCol STRICTLY
  *    greater (a descending range frame ending 1 before the current
  *    value), and
  *  - `minAtSame`  = min(minCol) over the maxCol tie-group;
  * a row survives iff no strictly-greater row is ≤ on minCol and no
  * tie row is strictly < on minCol. Duplicated points (tied on both)
  * dominate nothing and all survive, matching the NOT EXISTS oracle.
  */
object Pareto {

  /** Filter `df` to the per-group skyline: maximize `maxCol`,
    * minimize `minCol`. Rows where either objective is null are
    * excluded (they are incomparable).
    */
  def frontier2d(
      df: DataFrame, groupCol: String, maxCol: String,
      minCol: String): DataFrame = {
    val in = df.where(col(maxCol).isNotNull && col(minCol).isNotNull)
    val better = Window.partitionBy(groupCol)
      .orderBy(col(maxCol).desc)
      .rangeBetween(Window.unboundedPreceding, -1)
    val tied = Window.partitionBy(groupCol, maxCol)
    in
      .withColumn("_min_before", min(col(minCol)).over(better))
      .withColumn("_min_at_same", min(col(minCol)).over(tied))
      .where((col("_min_before").isNull ||
          col("_min_before") > col(minCol)) &&
        col("_min_at_same") >= col(minCol))
      .drop("_min_before", "_min_at_same")
  }
}
