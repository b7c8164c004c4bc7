package graft

import graft.ops.{Components, GraphMetrics, SpatialJoin}
import org.apache.spark.sql.functions._

/** Hand-computed fixtures for modularity, label propagation, and the
  * grid-blocked spatial nearest-neighbor join.
  */
class CommunitySpatialSpec extends SparkSpec {
  import spark.implicits._

  // Two triangles joined by one bridge edge 3–4.
  private def barbell = Seq((1L, 2L), (2L, 3L), (1L, 3L),
    (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L)).toDF("a", "b")

  test("modularity of the two-triangle partition is 70/196") {
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L),
      (4L, 4L), (5L, 4L), (6L, 4L)).toDF("node", "lbl")
    val r = GraphMetrics.modularity(barbell, "a", "b",
        labels, "node", "lbl")
      .select("m", "n_communities", "n_linked_communities", "modularity")
      .as[(Long, Long, Long, Double)].head()
    // m=7, e_c=3+3, d_c=7+7 → (4·7·6 − 98)/196 = 70/196.
    assert(r === ((7L, 2L, 2L, 0.357143)))
  }

  test("labelPropagation splits the barbell into its two triangles") {
    val nodes = (1L to 6L).toDF("id").union(Seq(9L).toDF("id"))
    val r = Components.labelPropagation(nodes, "id", barbell,
        "a", "b", rounds = 4)
      .orderBy("id")
      .as[(Long, Long)].collect().toSeq
    // Traced by hand through 4 synchronous min-tie-break rounds:
    // the left triangle settles on 1, the right on 3 (the bridge
    // node's label invades before the right triangle's own min
    // propagates). Isolated node 9 keeps itself.
    assert(r === Seq((1L, 1L), (2L, 1L), (3L, 1L),
      (4L, 3L), (5L, 3L), (6L, 3L), (9L, 9L)))
  }

  test("spatial NN finds the in-neighborhood argmin with min-id ties") {
    val probes = Seq((1L, 5L, 5L), (2L, 25L, 5L), (3L, 0L, 0L))
      .toDF("pid", "lat", "lon")
    val targets = Seq((10L, 6L, 6L), (20L, 25L, 25L),
      (7L, 0L, 2L), (4L, 2L, 0L)).toDF("tid", "lat", "lon")
    val r = SpatialJoin.nearestNeighbor(
        probes, "pid", "lat", "lon",
        targets, "tid", "lat", "lon", cellE6 = 10L)
      .orderBy("pid")
      .select("pid", "nn_id", "dist2_e12")
      .as[(Long, Long, Long)].collect().toSeq
    // Probe 1 (cell 0,0): target 10 at dist² 2. Probe 2 (cell 2,0):
    // target 20 sits in cell (2,2) — outside the 3×3 ring → NO row
    // (the documented blocking contract). Probe 3: targets 7 and 4
    // both at dist² 4 → min id 4 wins.
    assert(r === Seq((1L, 10L, 2L), (3L, 4L, 4L)))
  }
}
