package graft

import graft.ops.{Drift, Similarity, SurrogateKeys}

/** Fixtures for incremental surrogate keys, the SMD screen, and kNN
  * reliability consistency.
  */
class SurrogateSmdSpec extends SparkSpec {
  import spark.implicits._

  test("assignIncremental keeps old ids and appends the delta in order") {
    val existing = Seq(("a", 1L), ("b", 2L)).toDF("k", "sk")
    val incoming = Seq("b", "c", "a", "d", "c").toDF("k")
    val r = SurrogateKeys.assignIncremental(existing, "k", "sk",
        incoming)
      .orderBy("sk")
      .as[(String, Long, Int)].collect().toSeq
    assert(r === Seq(("a", 1L, 0), ("b", 2L, 0),
      ("c", 3L, 1), ("d", 4L, 1)))
  }

  test("smdScreen: shifted column scores 2.0, identical column 0.0") {
    val df0 = Seq(
      (0, 1L, 7L), (0, 2L, 8L), (0, 3L, 9L),
      (1, 3L, 7L), (1, 4L, 8L), (1, 5L, 9L)
    ).toDF("arm", "a", "b")
    val r = Drift.smdScreen(df0, "arm", Seq(("a", 1L), ("b", 1L)))
      .orderBy("column")
      .select("column", "n0", "n1", "smd")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(r === Seq(("a", 3L, 3L, 2.0), ("b", 3L, 3L, 0.0)))
  }

  test("knnReliability's ECE reproduces from its own bins") {
    def v(x: Float, y: Float) = Array(x, y)
    val emb = Seq(
      (0L, v(1f, 0f), 0), (1L, v(0.9f, 0.1f), 0),
      (2L, v(0.95f, 0.05f), 0), (3L, v(0.85f, 0.15f), 1),
      (10L, v(0f, 1f), 1), (11L, v(0.1f, 0.9f), 1),
      (12L, v(0.05f, 0.95f), 1)
    ).toDF("vec_id", "embedding", "label")
    val rows = Similarity.knnReliability(emb, emb, "vec_id",
        "embedding", "label", k = 3)
      .select("n_votes", "n", "confidence", "accuracy", "ece")
      .as[(Long, Long, Double, Double, Double)].collect().toSeq
    val n = rows.map(_._2).sum
    assert(n === 7L)
    val ece = rows.map(r => r._2.toDouble *
      math.abs(r._4 - r._3)).sum / n
    assert(math.abs(rows.head._5 - ece) < 2e-4,
      s"reported ECE must equal the bin recomputation: $rows vs $ece")
  }
}
