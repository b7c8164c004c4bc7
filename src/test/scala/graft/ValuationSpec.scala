package graft

import graft.ops.Valuation
import org.apache.spark.sql.functions._

class ValuationSpec extends SparkSpec {
  import spark.implicits._

  test("knnShapley reproduces the hand-derived 3-point recurrence (K=1)") {
    // val point [1,0] labeled x; train ranked by cosine: A (match),
    // B (no match), C (match). K=1:
    //   s_3 = 1/3; s_2 = 1/3 - 1/2 = -1/6; s_1 = -1/6 + 1 = 5/6
    val train = Seq(
      (1L, Array(1.0f, 0.1f), "x"),
      (2L, Array(1.0f, 1.0f), "y"),
      (3L, Array(0.1f, 1.0f), "x"))
      .toDF("vec_id", "embedding", "label")
    val valSet = Seq((100L, Array(1.0f, 0.0f), "x"))
      .toDF("vec_id", "embedding", "label")
    val r = Valuation.knnShapley(train, valSet,
        "vec_id", "embedding", "label", k = 1)
      .orderBy("vec_id")
      .select("vec_id", "n_val", "value")
      .as[(Long, Long, Double)].collect().toSeq
    assert(r === Seq((1L, 1L, 0.833333), (2L, 1L, -0.166667),
      (3L, 1L, 0.333333)))
  }

  test("values sum to the K-NN utility per validation point") {
    // Efficiency axiom: sum_i s_i = (# label matches among the K
    // nearest) / K. Deterministic vectors, two labels, K=3.
    val train = (1 to 12).map { i =>
      (i.toLong, Array(math.cos(i * 0.7).toFloat, math.sin(i * 0.7).toFloat),
        if (i % 3 == 0) "a" else "b")
    }.toDF("vec_id", "embedding", "label")
    val valSet = Seq(
      (100L, Array(1.0f, 0.2f), "a"), (101L, Array(-0.5f, 0.9f), "b"))
      .toDF("vec_id", "embedding", "label")
    val k = 3
    val got = Valuation.knnShapley(train, valSet,
        "vec_id", "embedding", "label", k)
      .agg(sum(col("value") * col("n_val").cast("double")))
      .as[Double].head()
    // independent utility: top-k matches per val point via brute force
    val tr = train.as[(Long, Array[Float], String)].collect()
    val va = valSet.as[(Long, Array[Float], String)].collect()
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      d / (math.sqrt(a.map(x => x.toDouble * x).sum) *
        math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    val util = va.map { case (_, vv, vl) =>
      tr.sortBy { case (tid, tv, _) => (-cos(tv, vv), tid) }
        .take(k).count(_._3 == vl).toDouble / k
    }.sum
    // got = sum over (train, val) of s; nano snapping bounds the drift
    assert(math.abs(got - util) < 1e-4, s"sum=$got utility=$util")
  }
}
