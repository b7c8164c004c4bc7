package graft

import graft.ops.Contrastive
import org.apache.spark.sql.functions._

/** Contrastive triplet builder invariants. */
class ContrastiveSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Int) = (0L until n.toLong).toDF("doc_id")

  test("triplets draws negsPer rows per anchor, deterministically") {
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    def run() = Contrastive.triplets(docs(10), "doc_id", pairs,
        "id_a", "id_b", negsPer = 3)
      .orderBy("anchor", "neg_ix").collect().toSeq
    val r = run()
    // Anchors are every endpoint: 1, 2, 3 → 9 rows; positives are
    // the smallest neighbor.
    assert(r.size === 9)
    val pos = r.map(row => (row.getLong(0), row.getLong(1))).distinct
    assert(pos === Seq((1L, 2L), (2L, 1L), (3L, 2L)))
    r.foreach { row =>
      val neg = row.getLong(3)
      assert(neg >= 0L && neg < 10L)
    }
    assert(r === run(), "hash draws must be reproducible")
  }

  test("triplets flags draws that collide with the dup neighborhood") {
    // Corpus of exactly the pair {1, 2}: every possible draw is the
    // anchor or its positive → 100% flagged dirty.
    val two = Seq(1L, 2L).toDF("doc_id")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val r = Contrastive.triplets(two, "doc_id", pairs, "id_a", "id_b",
        negsPer = 4)
      .select("clean").as[Int].collect().toSeq
    assert(r.size === 8 && r.forall(_ === 0))
  }
}
