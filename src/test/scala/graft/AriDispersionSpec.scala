package graft

import graft.ops.{Components, TextAnalysis}

/** Fixtures for Adjusted Rand Index and term dispersion. */
class AriDispersionSpec extends SparkSpec {
  import spark.implicits._

  test("ARI: identical partitions = 1, crossed partitions = -0.5") {
    val a1 = Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("node", "ca")
    val b1 = Seq((1L, "p"), (2L, "p"), (3L, "q")).toDF("node", "cb")
    val same = Components.adjustedRandIndex(a1, b1, "node", "ca", "cb")
      .select("ari").as[Double].head()
    assert(same === 1.0)
    // {1,2}{3,4} vs {1,3}{2,4}: every contingency cell is 1 → the
    // maximally disagreeing 2x2 split, ARI = −0.5.
    val a2 = Seq((1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L)).toDF("node", "ca")
    val b2 = Seq((1L, 0L), (3L, 0L), (2L, 1L), (4L, 1L)).toDF("node", "cb")
    val crossed = Components.adjustedRandIndex(a2, b2, "node", "ca", "cb")
      .select("n_nodes", "n_clusters_a", "n_clusters_b", "ari")
      .as[(Long, Long, Long, Double)].head()
    assert(crossed === ((4L, 2L, 2L, -0.5)))
  }

  test("termDispersion: clumped token outranks evenly spread ones") {
    val docs = Seq((1L, "x x x x"), (2L, "y"), (3L, "y"), (4L, "y z"),
      (5L, "z")).toDF("doc_id", "text")
    val r = TextAnalysis.termDispersion(docs, "doc_id", "text",
        minDf = 1L, k = 10)
      .orderBy("token")
      .select("token", "df", "cf", "max_in_doc", "fano")
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    // Hand-computed Fano over all 5 docs (zeros included):
    // x = 4.0 (all mass in one doc), y = 0.5, z = 0.75.
    assert(r === Seq(("x", 1L, 4L, 4L, 4.0), ("y", 3L, 3L, 1L, 0.5),
      ("z", 2L, 2L, 1L, 0.75)))
  }
}
