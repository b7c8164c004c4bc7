package graft

import graft.core.Graft

/** Plan-inspection entry: prints `explain("formatted")` for the named
  * catalog queries (or all, with no args past the sf dir) — the loop
  * used to check pushdown/pruning/broadcast before each bench round.
  *
  * Usage: runMain graft.ExplainPlans <sfDir> [query ...]
  */
object ExplainPlans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = Graft.session("graft-explain")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
