package graft

import graft.ops.Pq
import org.apache.spark.sql.functions._

/** Product-quantization invariants on hand-built separable data:
  * training recovers the true cluster means per subspace, encoding
  * maps every vector to its own cluster's code, and ADC search on
  * cleanly separated clusters reproduces the exact L2 ranking
  * (recall@k = 1e6).
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  // 4-dim vectors, two subspaces of dim 2. Two clean clusters per
  // subspace: values near 0 and values near 10.
  private def mk(id: Long, a: Float, b: Float): (Long, Seq[Float]) =
    (id, Seq(a, a + 1f, b, b + 1f))

  test("train recovers per-subspace cluster means; encode is consistent") {
    val rows = Seq(
      mk(1L, 0f, 0f), mk(2L, 1f, 1f),      // low/low
      mk(3L, 10f, 10f), mk(4L, 11f, 11f))  // high/high
    val df = rows.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val cb = Pq.train(df, "vec_id", "embedding",
      m = 2, subDim = 2, ks = 2, iters = 2).collect()
    // 2 subspaces × 2 cells, each centroid the mean of its 2 members.
    assert(cb.length == 4)
    val bySub = cb.groupBy(_.getAs[Int]("sub"))
    bySub.foreach { case (_, cells) =>
      val means = cells.map(_.getAs[Seq[Float]]("centvec").head).sorted
      assert(means sameElements Array(0.5f, 10.5f))
    }
    val codes = Pq.encode(df, "vec_id", "embedding",
      Pq.train(df, "vec_id", "embedding", 2, 2, 2, 2), 2, 2)
      .collect()
    assert(codes.length == 8) // 4 vectors × 2 subspaces
    // vectors 1,2 share a code in every subspace; likewise 3,4 — and
    // the two groups never share one.
    val m = codes.map(r => (r.getAs[Long]("vec_id"),
      r.getAs[Int]("sub")) -> r.getAs[Int]("code")).toMap
    for (s <- 0 to 1) {
      assert(m((1L, s)) == m((2L, s)))
      assert(m((3L, s)) == m((4L, s)))
      assert(m((1L, s)) != m((3L, s)))
    }
  }

  test("adcTopK on separated clusters matches exact L2 (recall = 1e6)") {
    val rows = (0L until 8L).map { i =>
      val base = if (i < 4) 0f else 10f
      mk(i, base + i.toFloat % 4 * 0.1f, base + i.toFloat % 4 * 0.1f)
    }
    val df = rows.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val res = Pq.adcTopK(df, df.filter(col("vec_id") === 0L),
      "vec_id", "embedding", m = 2, subDim = 2, ks = 2, iters = 2,
      k = 3).orderBy("rank").collect()
    assert(res.length == 3)
    // neighbors of vector 0 are its own low cluster, never the high one
    assert(res.forall(_.getAs[Long]("neighbor_id") < 4L))
    assert(res.forall(_.getAs[Int]("exact_hit") == 1))
    assert(res.head.getAs[Long]("recall_ppm") == 1000000L)
    // within-cluster ADC distances collapse to the shared centroid —
    // ranks then order by neighbor_id, deterministically.
    assert(res.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(1L, 2L, 3L))
  }

  test("kCenter: greedy picks one point per cluster before any duplicate") {
    import graft.ops.Coreset
    // three tight clusters at 0, 100, 200 on the first axis; k=3 must
    // select one member of each, regardless of which seeds.
    val rows = (0L until 9L).map { i =>
      val base = (i % 3L) * 100f
      (i, Seq(base + i / 3f * 0.1f, 0f, 0f, 0f))
    }
    val df = rows.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val sel = Coreset.kCenter(df, "vec_id", "embedding", k = 3)
      .orderBy("rank").collect()
    assert(sel.length == 3)
    assert(sel.map(_.getAs[Long]("vec_id") % 3L).toSet == Set(0L, 1L, 2L))
    assert(sel.head.isNullAt(sel.head.fieldIndex("gain_micro")))
    assert(sel.tail.forall(_.getAs[Long]("gain_micro") > 0L))
    // with one center per cluster, the radius is the worst
    // within-cluster spread: (0.2)² = 0.04 → 40000 micro.
    sel.foreach { r =>
      assert(r.getAs[Long]("n_points") == 9L)
      assert(r.getAs[Long]("coverage_radius_micro") <= 41000L)
    }
    // gains never increase along the greedy order.
    val gains = sel.tail.map(_.getAs[Long]("gain_micro"))
    assert(gains.zip(gains.tail).forall { case (a, b) => a >= b })
  }

  test("uncertaintyBatch: boundary point outranks a confident one") {
    import graft.ops.ActiveLearning
    def v(x: Double, y: Double) = Seq(x.toFloat, y.toFloat, 0f, 0f)
    val labeled = Seq(
      (1L, v(1.0, 0.0), 0), (2L, v(0.995, 0.1), 0), (3L, v(0.99, 0.14), 0),
      (4L, v(0.0, 1.0), 1), (5L, v(0.1, 0.995), 1), (6L, v(0.14, 0.99), 1))
      .toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val pool = Seq(
      (100L, v(1.0, 0.05), -1), // squarely class 0: margin 3
      (101L, v(0.9, 1.0), -1))  // near the boundary: 2-1 votes
      .toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val got = ActiveLearning.uncertaintyBatch(labeled, pool,
      "vec_id", "embedding", "label", k = 3, batch = 2)
      .orderBy("selection_rank").collect()
    assert(got.length == 2)
    assert(got(0).getAs[Long]("vec_id") == 101L)
    assert(got(0).getAs[Long]("margin") == 1L)
    assert(got(0).getAs[Int]("top_label") == 1)
    assert(got(0).getAs[Long]("top_votes") == 2L &&
      got(0).getAs[Long]("second_votes") == 1L)
    assert(got(1).getAs[Long]("vec_id") == 100L)
    assert(got(1).getAs[Long]("margin") == 3L)
    assert(got(1).getAs[Long]("second_votes") == 0L)
  }

  test("matryoshkaRecall: full-length prefix is perfect; signal-free prefix is not") {
    import graft.ops.Quantize
    // all ranking signal lives in dims 3-4; dims 1-2 are constant.
    val rows = (0L until 20L).map { i =>
      (i, Seq(1f, 1f, math.cos(i * 0.3).toFloat, math.sin(i * 0.3).toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val got = Quantize.matryoshkaRecall(df,
        df.filter(col("vec_id") < 3), "vec_id", "embedding",
        dims = Seq(2, 4), k = 5)
      .orderBy("dim").collect()
    assert(got.length == 2)
    val byDim = got.map(r => r.getAs[Int]("dim") -> r).toMap
    assert(byDim(4).getAs[Long]("recall_ppm") == 1000000L)
    assert(byDim(4).getAs[Long]("hits") == 15L)
    assert(byDim(2).getAs[Long]("recall_ppm") <
      byDim(4).getAs[Long]("recall_ppm"))
    assert(got.forall(_.getAs[Long]("n_queries") == 3L))
  }

  test("hardNegatives: other-label neighbors only; violation flags an inverted margin") {
    import graft.ops.Contrastive
    def v(x: Double, y: Double) = Seq(x.toFloat, y.toFloat, 0f, 0f)
    // anchor 1 (label 0): its nearest OTHER-label vector (id 10) is
    // closer than its nearest positive (id 2) -> violation.
    // anchor 3 (label 1): positive id 10 is closest -> no violation.
    val emb = Seq(
      (1L, v(1.0, 0.0), 0), (2L, v(0.0, 1.0), 0),
      (10L, v(0.95, 0.3), 1), (3L, v(0.9, 0.4), 1))
      .toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val got = Contrastive.hardNegatives(emb,
        emb.filter(col("vec_id") <= 3), "vec_id", "embedding",
        "label", n = 2)
      .collect().groupBy(_.getAs[Long]("anchor_id"))
    val a1 = got(1L).sortBy(_.getAs[Int]("rank"))
    assert(a1.forall(_.getAs[Int]("neg_label") == 1))
    assert(a1.head.getAs[Long]("neg_id") == 10L)
    assert(a1.head.getAs[Long]("pos_id") == 2L)
    assert(a1.head.getAs[Int]("violation") == 1)
    val a3 = got(3L).sortBy(_.getAs[Int]("rank"))
    assert(a3.forall(_.getAs[Int]("neg_label") == 0))
    assert(a3.head.getAs[Long]("pos_id") == 10L)
    assert(a3.forall(_.getAs[Int]("violation") == 0))
  }

  test("ivfPqTopK: probe routes to the right cluster; clean clusters give perfect recall") {
    // two well-separated clusters of 6; coarse k=2 must split them,
    // so a probe with nProbe=1 admits only the query's own cluster.
    val rows = (0L until 12L).map { i =>
      val base = if (i < 6) 0f else 50f
      (i, Seq(base + (i % 6) * 0.1f, base + (i % 6) * 0.1f,
        base, base))
    }
    val df = rows.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val res = Pq.ivfPqTopK(df, df.filter(col("vec_id") === 1L),
      "vec_id", "embedding", dim = 4, kCoarse = 2, nProbe = 1,
      m = 2, subDim = 2, ks = 4, iters = 2, k = 3)
      .orderBy("rank").collect()
    assert(res.length == 3)
    // only own-cluster members are admitted (5 candidates) and the
    // exact top-3 all live there too.
    assert(res.forall(_.getAs[Long]("n_candidates") == 5L))
    assert(res.forall(_.getAs[Long]("neighbor_id") < 6L))
    assert(res.forall(_.getAs[Int]("exact_hit") == 1))
    assert(res.head.getAs[Long]("recall_ppm") == 1000000L)
  }
}
