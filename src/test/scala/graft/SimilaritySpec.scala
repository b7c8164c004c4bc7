package graft

import graft.ops.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f), 0),
    (1L, Array(1.0f, 0.0f, 0.0f), 0),   // identical to 0
    (2L, Array(0.0f, 1.0f, 0.0f), 0),   // orthogonal
    (3L, Array(-1.0f, 0.0f, 0.0f), 1)   // opposite, other block
  ).toDF("vec_id", "embedding", "label")

  test("cosine: identical → 1, orthogonal → 0, opposite → -1") {
    val out = vecs.as("l").crossJoin(vecs.as("r"))
      .filter(col("l.vec_id") === 0 && col("r.vec_id") =!= 0)
      .select(col("r.vec_id"),
        round(Similarity.cosine(col("l.embedding"), col("r.embedding")), 6).as("c"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) == 1.0 && out(2L) == 0.0 && out(3L) == -1.0)
  }

  test("bruteForceTopK ranks the identical vector first and excludes self") {
    val out = Similarity.bruteForceTopK(vecs, vecs.filter(col("vec_id") === 0),
      "vec_id", "embedding", k = 2).collect()
    assert(out.length == 2)
    val first = out.find(_.getAs[Int]("rank") == 1).get
    assert(first.getAs[Long]("neighbor_id") == 1L)
    assert(out.forall(_.getAs[Long]("neighbor_id") != 0L))
  }

  test("cosineNearDupPairs respects blocking and threshold") {
    val pairs = Similarity.cosineNearDupPairs(vecs, "vec_id", "embedding", "label", 0.9)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    assert(pairs.toSeq == Seq((0L, 1L))) // only the identical pair, same block
  }

  test("lshTopK finds the identical vector (same bucket by construction)") {
    val out = Similarity.lshTopK(vecs, vecs.filter(col("vec_id") === 0),
      "vec_id", "embedding", k = 1, planes = 4, dim = 3).collect()
    assert(out.length == 1 && out.head.getAs[Long]("neighbor_id") == 1L)
  }

  test("lshTopKMulti: table 0 IS the single-table bucket; union can only add") {
    // With tables = 1 the multi-table path must reproduce lshTopK
    // exactly (same global plane indices 0..planes-1, same re-rank).
    val qs = vecs.filter(col("vec_id") < 2)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "rank", "cos")
        .collect().map(_.toSeq).toSet
    val single = Similarity.lshTopK(vecs, qs, "vec_id", "embedding",
      k = 3, planes = 4, dim = 3)
    val multi1 = Similarity.lshTopKMulti(vecs, qs, "vec_id", "embedding",
      k = 3, planes = 4, tables = 1, dim = 3)
    assert(key(multi1) == key(single))
    // More tables never shrink any query's result set.
    val multi8 = Similarity.lshTopKMulti(vecs, qs, "vec_id", "embedding",
      k = 3, planes = 4, tables = 8, dim = 3)
    val n1 = multi1.groupBy("query_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n8 = multi8.groupBy("query_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(n1.forall { case (q, n) => n8.getOrElse(q, 0L) >= n })
  }

  test("ivfTopK: nearest cell routing still finds the identical vector") {
    // centroids = vectors 0 and 2 (x-axis and y-axis cells); vector 1
    // (identical to 0) lands in cell 0 with its query → found at rank 1
    val out = Similarity.ivfTopK(
      vecs, vecs.filter(col("vec_id") === 0), vecs.filter(col("vec_id").isin(0, 2)),
      "vec_id", "embedding", k = 1, nProbe = 1).collect()
    assert(out.length == 1 && out.head.getAs[Long]("neighbor_id") == 1L)
    assert(out.head.getAs[Double]("cos") == 1.0)
  }

  test("ivfSq8TopK: quantized shortlist re-ranks to the exact answer") {
    // well-separated vectors: the SQ8 asymmetric pass cannot reorder
    // them, so the quantized tier must agree with exact IVF entirely
    val cents = vecs.filter(col("vec_id").isin(0, 2))
    val qs = vecs.filter(col("vec_id") === 0)
    val exact = Similarity.ivfTopK(
        vecs, qs, cents, "vec_id", "embedding", k = 2, nProbe = 2)
      .collect().map(r => (r.getAs[Long]("neighbor_id"),
        r.getAs[Int]("rank"), r.getAs[Double]("cos"))).toSet
    val sq8 = Similarity.ivfSq8TopK(
        vecs, qs, cents, "vec_id", "embedding", k = 2, nProbe = 2,
        shortlist = 3)
      .collect().map(r => (r.getAs[Long]("neighbor_id"),
        r.getAs[Int]("rank"), r.getAs[Double]("cos"))).toSet
    assert(sq8 === exact)
    // the winner is the identical vector at exact (re-ranked) cos 1.0
    assert(sq8.exists { case (n, r, c) => n == 1L && r == 1 && c == 1.0 })
  }

  test("hyperplaneBucket: wrong-dimension vectors get a NULL bucket, not bucket 0") {
    val out = vecs.select(
      Similarity.hyperplaneBucket(col("embedding"), planes = 4, dim = 64).as("b64"),
      Similarity.hyperplaneBucket(col("embedding"), planes = 4, dim = 3).as("b3"))
      .collect()
    assert(out.forall(_.isNullAt(0)))  // 3-dim vecs vs dim=64 → null
    assert(out.forall(!_.isNullAt(1))) // matching dim → real bucket
  }

  test("trainCentroids recovers two well-separated clusters deterministically") {
    // Two tight clumps on orthogonal axes: after any init, one Lloyd
    // round lands one centroid per clump (cosine assignment separates
    // them), and the means are the clump means rounded to 6 decimals.
    val pts = Seq(
      (0L, Array(1.0f, 0.1f, 0f, 0f)), (1L, Array(1.0f, -0.1f, 0f, 0f)),
      (2L, Array(0.9f, 0.0f, 0f, 0f)),
      (3L, Array(0f, 0f, 1.0f, 0.1f)), (4L, Array(0f, 0f, 1.0f, -0.1f)),
      (5L, Array(0f, 0f, 0.9f, 0.0f))
    ).toDF("vec_id", "embedding")
    val cents = Similarity.trainCentroids(pts, "vec_id", "embedding",
      k = 2, iters = 2)
      .collect().map(r => r.getInt(0) ->
        r.getSeq[Float](1).map(f => math.round(f * 1e4f) / 1e4f)).toMap
    assert(cents.size == 2)
    val got = cents.values.toSet
    assert(got == Set(
      Seq(0.9667f, 0.0f, 0.0f, 0.0f), Seq(0.0f, 0.0f, 0.9667f, 0.0f)), got)
    // same input → same codebook (hash-seeded init, fixed rounds)
    val again = Similarity.trainCentroids(pts, "vec_id", "embedding",
      k = 2, iters = 2).collect().map(r => r.getInt(0) -> r.getSeq[Float](1)).toMap
    assert(again.keySet == cents.keySet)
  }

  test("jlProject: m dims out, norm ratio bounded, degenerate rows null") {
    val rnd = new scala.util.Random(42)
    val rows = (1L to 50L).map(i =>
        (i, Array.fill(64)(rnd.nextGaussian().toFloat))) ++
      Seq((98L, Array.fill(64)(0.0f)), // zero vector: ratio null
        (99L, Array.fill(3)(1.0f))) // wrong dim: proj null
    val got = Similarity.jlProject(rows.toDF("vec_id", "embedding"),
        "vec_id", "embedding", m = 16, dim = 64)
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)).map(_ => r.getSeq[Double](1)),
          Option(r.get(2)).map(_ => r.getDouble(2))))).toMap
    (1L to 50L).foreach { i =>
      val (proj, ratio) = got(i)
      assert(proj.get.length == 16)
      // JL with m=16: loose concentration, but never degenerate
      assert(ratio.get > 0.3 && ratio.get < 2.0, s"row $i ratio $ratio")
    }
    assert(got(98L)._1.get.forall(_ == 0.0) && got(98L)._2.isEmpty)
    assert(got(99L)._1.isEmpty && got(99L)._2.isEmpty)
  }

  test("pca topComponent: recovers a dominant axis, unit loading") {
    val rnd = new scala.util.Random(7)
    // variance 100 along dim 0, ~0.01 elsewhere; nonzero mean to
    // exercise the centering
    val rows = (1 to 200).map { _ =>
      val v = Array.fill(64)(rnd.nextGaussian().toFloat * 0.1f)
      v(0) = (rnd.nextGaussian() * 10 + 3).toFloat
      Tuple1(v)
    }
    val got = graft.ops.Pca.topComponent(
        rows.toDF("embedding"), "embedding", dim = 64, iters = 3)
      .as[(Int, Double, Double)].collect().sortBy(_._1)
    assert(got.length == 64)
    val loadings = got.map(_._3)
    assert(math.abs(loadings(0)) > 0.99,
      s"dominant axis not recovered: ${loadings(0)}")
    assert(loadings.drop(1).forall(l => math.abs(l) < 0.1))
    // unit vector
    val norm = math.sqrt(loadings.map(l => l * l).sum)
    assert(math.abs(norm - 1.0) < 1e-9)
    // the mean column reflects the planted +3 offset on dim 0
    assert(math.abs(got(0)._2 - 3.0) < 1.5)
  }

  test("jlTopK finds the identical vector first (projection preserves it)") {
    val rnd = new scala.util.Random(3)
    val base = Array.fill(64)(rnd.nextGaussian().toFloat)
    val rows = (1L to 60L).map(i =>
        (i, Array.fill(64)(rnd.nextGaussian().toFloat))) :+
      (0L, base) :+ (99L, base) // identical pair across the corpus
    val df = rows.toDF("vec_id", "embedding")
    val got = Similarity.jlTopK(df, df.filter(col("vec_id") === 0),
        "vec_id", "embedding", k = 2, shortlist = 10)
      .orderBy("rank").collect()
    // identical vector projects identically -> survives any shortlist
    assert(got.head.getAs[Long]("neighbor_id") == 99L)
    assert(got.head.getAs[Double]("cos") == 1.0)
  }

  test("pca topComponents: deflation recovers two planted axes, orthogonal") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 300).map { _ =>
      val v = Array.fill(64)(rnd.nextGaussian().toFloat * 0.05f)
      v(0) += (rnd.nextGaussian() * 10).toFloat // dominant axis
      v(5) += (rnd.nextGaussian() * 4).toFloat // second axis
      Tuple1(v)
    }
    val comps = graft.ops.Pca.topComponents(
        rows.toDF("embedding"), "embedding", dim = 64, iters = 3, k = 2)
      .as[(Int, Int, Double)].collect()
      .groupBy(_._1).map { case (c, a) =>
        c -> a.sortBy(_._2).map(_._3) }
    assert(math.abs(comps(1)(0)) > 0.99, s"c1 not axis 0: ${comps(1)(0)}")
    assert(math.abs(comps(2)(5)) > 0.99, s"c2 not axis 5: ${comps(2)(5)}")
    val dot = comps(1).zip(comps(2)).map { case (a, b) => a * b }.sum
    assert(math.abs(dot) < 0.01, s"components not orthogonal: $dot")
  }

  test("pca removeTop: residuals are centered and v-orthogonal") {
    val rnd = new scala.util.Random(7)
    val rows = (1L to 200L).map { i =>
      val v = Array.fill(64)(rnd.nextGaussian().toFloat * 0.1f)
      v(0) = (rnd.nextGaussian() * 10 + 3).toFloat
      (i, v)
    }
    val df = rows.toDF("vec_id", "embedding")
    val loadings = graft.ops.Pca.topComponent(df, "embedding", 64, 3)
      .as[(Int, Double, Double)].collect().sortBy(_._1).map(_._3)
    val resid = graft.ops.Pca.removeTop(df, "vec_id", "embedding", 64, 3)
      .as[(Long, Seq[Double])].collect()
    assert(resid.length == 200)
    resid.foreach { case (id, r) =>
      val proj = r.zip(loadings).map { case (a, b) => a * b }.sum
      assert(math.abs(proj) < 0.02, s"row $id projects $proj onto v")
    }
    // per-dim means ~0 after centering (rounding adds <= 5e-5 per row)
    val dim0Mean = resid.map(_._2.head).sum / resid.length
    assert(math.abs(dim0Mean) < 0.05, s"dim-0 residual mean $dim0Mean")
  }
}
