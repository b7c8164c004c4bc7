package graft

import graft.ops.{Components, Sessionize, SourceSim}
import org.apache.spark.sql.functions._

/** Fixtures for medoid keepers, histogram intersection, and the
  * entry/exit matrix.
  */
class MedoidEntrySpec extends SparkSpec {
  import spark.implicits._

  test("medoidPerCluster picks the most-connected member, not min id") {
    val clusters = Seq((1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L))
      .toDF("doc_id", "component", "cluster_size")
    val pairs = Seq((1L, 2L, 0.9), (2L, 3L, 0.9), (1L, 3L, 0.85))
      .toDF("id_a", "id_b", "jaccard")
    val r = Components.medoidPerCluster(clusters, "doc_id", pairs,
        "id_a", "id_b", "jaccard")
      .select("component", "cluster_size", "medoid_id",
        "medoid_sim_sum", "minid_keeper")
      .as[(Long, Long, Long, Double, Long)].head()
    // Degrees: 1 → 1.75, 2 → 1.8, 3 → 1.75.
    assert(r === ((1L, 3L, 2L, 1.8, 1L)))
  }

  test("histIntersection: identical distributions score 1.0") {
    val docs = Seq(("a", "x y"), ("b", "x y"), ("c", "z"))
      .toDF("source", "text")
    val r = SourceSim.histIntersection(docs, "source", "text", 10)
      .select("src_a", "src_b", "n_common_tokens", "hist_intersection")
      .as[(String, String, Long, Double)].collect().toSeq
    // Only (a, b) share vocabulary; disjoint pairs emit no row.
    assert(r === Seq(("a", "b", 2L, 1.0)))
  }

  test("entryExitMatrix: session ends are deterministic") {
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val ev = Seq(
      (1L, 1L, "click", ts(0)), (2L, 1L, "view", ts(10)),
      (3L, 1L, "purchase", ts(10000)),  // new session, single event
      (4L, 2L, "view", ts(5))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val r = Sessionize.entryExitMatrix(ev, Seq("user_id"), "ts",
        "event_id", "event_type", gapUs = 1800000000L)
      .orderBy("entry_type", "exit_type")
      .select("entry_type", "exit_type", "n_sessions", "share_ppm")
      .as[(String, String, Long, Long)].collect().toSeq
    assert(r === Seq(("click", "view", 1L, 333333L),
      ("purchase", "purchase", 1L, 333333L),
      ("view", "view", 1L, 333333L)))
  }
}
