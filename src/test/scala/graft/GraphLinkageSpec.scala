package graft

import graft.ops.{GraphMetrics, Linkage}
import org.apache.spark.sql.functions._

/** Triangle/clustering and record-linkage edge semantics on hand
  * graphs: a known K4-minus-an-edge, self-loop/duplicate-edge
  * hygiene, and the linkage score/decision arithmetic incl. the
  * micro-unit mean.
  */
class GraphLinkageSpec extends SparkSpec {
  import spark.implicits._

  test("triangles: K4 minus an edge; dups and self-loops ignored") {
    // Nodes 1-4, edges: 12 13 14 23 24 (missing 34) → triangles:
    // {1,2,3} and {1,2,4}. Node 1: d=3 T=2 c=2*2/(3*2)=0.6667;
    // node 2 same; nodes 3,4: d=2 T=1 c=1.0.
    val e = Seq((1L, 2L), (2L, 1L), (1L, 3L), (1L, 4L), (2L, 3L),
      (4L, 2L), (3L, 3L)).toDF("s", "d")
    val out = GraphMetrics.triangleStats(e, "s", "d")
      .orderBy("node")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(out == Seq((1L, 3L, 2L, 0.6667), (2L, 3L, 2L, 0.6667),
      (3L, 2L, 1L, 1.0), (4L, 2L, 1L, 1.0)))
  }

  test("triangles: triangle-free bipartite graph reports zeros") {
    val e = Seq((1L, 10L), (1L, 20L), (2L, 10L), (2L, 20L)).toDF("s", "d")
    val out = GraphMetrics.triangleStats(e, "s", "d")
    assert(out.agg(sum("triangles")).as[Long].collect()(0) == 0L)
    assert(out.count() == 4L)
  }

  test("linkage: blocking bounds candidates; score and decisions exact") {
    val a = Seq((1L, "red blue car", "b1", 5),
      (2L, "green van", "b2", 7)).toDF("id", "nm", "br", "sz")
      .withColumn("blk", element_at(split(col("nm"), " "), 1))
    val b = Seq((1L, "red blue truck", "b1", 5), // same block, jacc 1/2
      (3L, "yellow bike", "b9", 5) // different block: never paired
    ).toDF("id", "nm", "br", "sz")
      .withColumn("blk", element_at(split(col("nm"), " "), 1))
    val pairs = Linkage.candidates(a, b, "id", "nm", Seq("blk", "sz"),
      Seq("br" -> 0.5), nameWeight = 0.5)
    val rows = pairs.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getDouble(2), r.getDouble(3))).toSeq
    // Only the (1,1) pair shares a block. jacc = |{red,blue}| /
    // |{red,blue,car,truck}| = 0.5; score = 0.5*0.5 + 0.5 = 0.75.
    assert(rows == Seq((1L, 1L, 0.5, 0.75)))
    val rep = Linkage.linkReport(pairs, matchAt = 0.75, possibleAt = 0.5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(rep == Seq(("match", 1L, 1L, 0.75)))
  }
}
