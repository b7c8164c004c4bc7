package graft

import graft.ops.{Drift, IncrementalAgg}
import org.apache.spark.sql.functions._

/** IVM algebra and KS-drift invariants on hand cases: state ⊕ Δ equals
  * a direct recompute (including a group retiring at count 0 and a new
  * group arriving by insert); KS is 0 for identical samples, 1 for
  * fully separated ones, and symmetric.
  */
class IvmDriftSpec extends SparkSpec {
  import spark.implicits._

  test("applyDelta ≡ recompute; zero-count groups retire; new groups arrive") {
    val base = Seq(("a", 1.0), ("a", 2.0), ("b", 5.0), ("c", 7.0))
      .toDF("g", "v")
    // retract all of c, one of a; insert a new d and another b
    val delta = Seq(("c", 7.0, -1), ("a", 1.0, -1), ("d", 9.0, 1),
      ("b", 3.0, 1)).toDF("g", "v", "sign")
    val out = IncrementalAgg.applyDelta(
      IncrementalAgg.state(base, "g", "v"), delta, "g", "v", "sign")
      .orderBy("g").as[(String, Long, Double)].collect().toSeq
    assert(out == Seq(("a", 1L, 2.0), ("b", 2L, 8.0), ("d", 1L, 9.0)))
  }

  test("ks: identical samples → 0; disjoint ranges → 1; symmetric") {
    val a = (0 until 100).map(i => ("g", (i % 32).toDouble)).toDF("g", "v")
    val bSame = (0 until 100).map(i => ("g", (i % 32).toDouble)).toDF("g", "v")
    val bFar = (0 until 50).map(i => ("g", 200.0 + i)).toDF("g", "v")
    def ks(x: org.apache.spark.sql.DataFrame, y: org.apache.spark.sql.DataFrame) =
      Drift.ksFromHists(x, y, "g", "v", 0.0, 512.0, 128)
        .select("ks").as[Double].head()
    assert(ks(a, bSame) == 0.0)
    assert(ks(a, bFar) == 1.0)
    assert(ks(a, bFar) == ks(bFar, a))
  }

  test("ks: groups present on only one side are omitted") {
    val a = Seq(("x", 1.0), ("y", 2.0)).toDF("g", "v")
    val b = Seq(("x", 1.0)).toDF("g", "v")
    val groups = Drift.ksFromHists(a, b, "g", "v", 0.0, 8.0, 8)
      .select("g").as[String].collect().toSeq
    assert(groups == Seq("x"))
  }
}
