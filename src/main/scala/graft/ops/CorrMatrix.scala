package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pairwise Pearson correlation matrix over integer-valued feature
  * columns — the profiling step that finds redundant features and
  * sanity-checks expected relationships (price ~ quantity) before
  * anything is trained on the table.
  *
  * ONE pass computes every moment (n, Σx, Σx², all Σxy) as exact
  * 64-bit integer sums — callers pre-scale to integer units small
  * enough that Σx² fits — and the p·(p−1)/2 correlation rows are
  * then pure fixed-shape double expressions on the single moment
  * row. Like q167's CUPED: the only order-sensitive step is made
  * order-free, the float math is deterministic on exact operands.
  */
object CorrMatrix {

  /** @param cols integer-valued (castable-to-long) columns
    * @return one row per pair (a < b in `cols` order): `col_a`,
    *         `col_b`, `n`, `r` (round 6; null if either variance 0)
    */
  def pearsonPairs(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    val in = df.where(cols.map(c => col(c).isNotNull).reduce(_ && _))
      .select(cols.map(c => col(c).cast("long").as(c)): _*)
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (cols(i), cols(j))
    val aggs =
      Seq(count(lit(1)).as("n")) ++
        cols.map(c => sum(col(c)).as(s"s_$c")) ++
        cols.map(c => sum(col(c) * col(c)).as(s"ss_$c")) ++
        pairs.map { case (a, b) =>
          sum(col(a) * col(b)).as(s"sp_${a}__$b") }
    val m = in.agg(aggs.head, aggs.tail: _*)
    def d(c: String) = col(c).cast("double")
    // ONE row carries every moment; the pair rows explode out of it —
    // a p-way union of selects would replay the aggregate per pair.
    val pairStructs = pairs.map { case (a, b) =>
      val cov = d("n") * d(s"sp_${a}__$b") - d(s"s_$a") * d(s"s_$b")
      val va = d("n") * d(s"ss_$a") - d(s"s_$a") * d(s"s_$a")
      val vb = d("n") * d(s"ss_$b") - d(s"s_$b") * d(s"s_$b")
      struct(lit(a).as("col_a"), lit(b).as("col_b"), col("n").as("n"),
        round(when(va > 0.0 && vb > 0.0, cov / sqrt(va * vb)), 6).as("r"))
    }
    m.select(explode(array(pairStructs: _*)).as("p")).select("p.*")
  }
}
