package graft

import graft.ops.{Drift, Similarity}

/** Fixtures for JS token shift and k-NN majority-vote prediction. */
class KnnJsSpec extends SparkSpec {
  import spark.implicits._

  test("jsTokenShift: identity is 0, disjoint vocabularies are ln 2") {
    val a = Seq("x x", "x").toDF("text")
    val b = Seq("y", "y y").toDF("text")
    val same = Drift.jsTokenShift(a, a, "text")
      .select("js_nats").as[Double].head()
    assert(same === 0.0)
    val disj = Drift.jsTokenShift(a, b, "text")
      .select("vocab_union", "js_nats").as[(Long, Double)].head()
    assert(disj === ((2L, 0.693147)))
  }

  test("knnPredict votes the local cluster's label") {
    // Two tight clusters on orthogonal axes plus one mislabeled
    // point sitting in the wrong cluster — 3-NN corrects it.
    def v(x: Float, y: Float) = Array(x, y)
    val emb = Seq(
      (0L, v(1.0f, 0.0f), 0), (1L, v(0.9f, 0.1f), 0),
      (2L, v(0.95f, 0.05f), 0),
      (10L, v(0.0f, 1.0f), 1), (11L, v(0.1f, 0.9f), 1),
      (12L, v(0.05f, 0.95f), 1),
      // mislabeled: geometrically with cluster 0
      (20L, v(0.92f, 0.08f), 1)
    ).toDF("vec_id", "embedding", "label")
    val r = Similarity.knnPredict(emb, emb, "vec_id", "embedding",
        "label", k = 3)
      .orderBy("query_id")
      .select("query_id", "true_label", "pred_label")
      .as[(Long, Int, Int)].collect().toSeq
    val mis = r.find(_._1 == 20L).get
    assert(mis._2 === 1 && mis._3 === 0,
      s"the planted mislabel must be outvoted: $mis")
    // Every genuine member keeps its label.
    assert(r.filter(_._1 != 20L).forall(t => t._2 === t._3))
  }
}
