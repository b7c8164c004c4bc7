package graft

import graft.ops.{Anonymity, Dedup, Expectations}

/** Fixtures for k-anonymity, referential integrity, and the dup-rate
  * growth curve.
  */
class GovernanceSpec extends SparkSpec {
  import spark.implicits._

  test("kAnonymity surfaces the smallest classes with the summary") {
    val rows = Seq.fill(3)(("a", 1)) ++ Seq(("a", 2)) ++
      Seq.fill(6)(("b", 1))
    val r = Anonymity.kAnonymity(rows.toDF("q1", "q2"),
        Seq("q1", "q2"), k = 5L, topN = 2)
      .orderBy("risk_rank")
      .select("risk_rank", "q1", "q2", "class_size", "n_classes",
        "n_small_classes", "records_at_risk", "min_class_size",
        "risk_ppm")
      .as[(Int, String, Int, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(r === Seq(
      (1, "a", 2, 1L, 3L, 2L, 4L, 1L, 400000L),
      (2, "a", 1, 3L, 3L, 2L, 4L, 1L, 400000L)))
  }

  test("refIntegrity counts orphans and null keys separately") {
    val child = Seq(Some(1L), Some(2L), None, Some(5L)).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = Expectations.refIntegrity(child, "fk", parent, "pk", "c->p")
      .select("relation", "n_child", "n_null_key", "n_orphans",
        "orphan_ppm")
      .as[(String, Long, Long, Long, Long)].head()
    assert(r === (("c->p", 4L, 1L, 1L, 250000L)))
  }

  test("dupRateCurve: dup fraction grows with the prefix") {
    // ids 0..3 distinct texts; ids 4..7 copies of id 0.
    val docs = ((0L to 3L).map(i => (i, s"text $i")) ++
      (4L to 7L).map(i => (i, "text 0"))).toDF("doc_id", "text")
    val r = Dedup.dupRateCurve(docs, "doc_id", "text", Seq(4L, 8L))
      .orderBy("cutoff")
      .select("cutoff", "n_docs", "n_distinct", "n_dups", "dup_ppm")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(r === Seq((4L, 4L, 4L, 0L, 0L), (8L, 8L, 4L, 4L, 500000L)))
  }
}
