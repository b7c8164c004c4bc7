package graft

import graft.core.Graft
import graft.ops.Stats
import org.apache.spark.sql.functions._

/** Pins the graft_hist native aggregate (fixed-boundary histogram
  * sketch) and the rank-interpolated percentile estimator built on it:
  * exact bucket counts, partition-order independence (merge path), the
  * clamp/null/NaN conventions, and the one-bucket-width error bound
  * against Spark's exact `percentile`.
  */
class HistSketchSpec extends SparkSpec {
  import spark.implicits._

  test("graft_hist counts match a hand-built groupBy histogram") {
    val df = (0 until 1000).map(i => ("g", (i % 97).toDouble)).toDF("g", "v")
    val counts = df.groupBy("g")
      .agg(expr("graft_hist(v, 0.0D, 128.0D, 32)").as("h"))
      .select("h").as[Seq[Long]].head()
    assert(counts.length == 32)
    // width 4: bucket b counts values in [4b, 4b+4)
    val expected = (0 until 32).map(b =>
      (0 until 1000).count(i => { val v = i % 97; v >= 4 * b && v < 4 * (b + 1) }).toLong)
    assert(counts == expected)
    assert(counts.sum == 1000L)
  }

  test("merge path: counts are identical under any partitioning") {
    val base = (0 until 5000).map(i => ("g" + (i % 3), (i % 611).toDouble / 2))
    val one = base.toDF("g", "v").repartition(1)
    val many = base.toDF("g", "v").repartition(13)
    def hist(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("g").agg(expr("graft_hist(v, 0.0D, 512.0D, 64)").as("h"))
        .orderBy("g").as[(String, Seq[Long])].collect().toSeq
    assert(hist(one) == hist(many))
  }

  test("clamp below/above, skip null and NaN") {
    val df = Seq(
      Some(-5.0), Some(0.0), Some(3.9), Some(4.0), Some(100.0),
      Some(1e9), None, Some(Double.NaN)
    ).toDF("v").withColumn("g", lit("x"))
    val counts = df.groupBy("g")
      .agg(expr("graft_hist(v, 0.0D, 8.0D, 2)").as("h"))
      .select("h").as[Seq[Long]].head()
    // bucket 0 = [0,4): -5 (clamped), 0.0, 3.9; bucket 1 = [4,8): 4.0
    // plus 100 and 1e9 clamped high; null + NaN skipped entirely.
    assert(counts == Seq(3L, 3L))
  }

  test("histPercentiles lands within one bucket width of the exact percentile") {
    val docs = Graft.table(spark, "/root/testdata/sf0.001", "documents")
    val width = 4.0
    val approx = Stats.histPercentiles(
      docs, "lang", "n_chars", lo = 0.0, hi = 1024.0, nbins = 256,
      ps = Seq(0.5, 0.9))
      .select(col("lang"), col("p"), col("est")).as[(String, Double, Double)]
      .collect().toSeq
    val exact = docs.groupBy("lang")
      .agg(expr("percentile(n_chars, 0.5)").as("p50"),
        expr("percentile(n_chars, 0.9)").as("p90"))
      .as[(String, Double, Double)].collect()
      .flatMap { case (l, p50, p90) => Seq((l, 0.5) -> p50, (l, 0.9) -> p90) }
      .toMap
    assert(approx.nonEmpty)
    approx.foreach { case (lang, p, est) =>
      val ex = exact((lang, p))
      // The crossing-bucket estimate and the exact interpolated
      // quantile can sit in adjacent buckets at a boundary — bound by
      // a bucket width on each side.
      assert(math.abs(est - ex) <= 2 * width,
        s"$lang p=$p: est $est vs exact $ex drifts past the bucket bound")
    }
  }

  test("equiDepthBins: ~equal depth over a uniform column, all rows kept") {
    val df = (0 until 1000).map(i => ("g", i.toDouble)).toDF("g", "v")
    val counts = Stats.equiDepthBins(df, "g", "v",
      lo = 0.0, hi = 1024.0, nbins = 256, bins = 4)
      .groupBy("bin").count().orderBy("bin")
      .as[(Int, Long)].collect().toSeq
    assert(counts.map(_._1) == Seq(0, 1, 2, 3))
    assert(counts.map(_._2).sum == 1000L)
    // one-bucket-width sketch resolution on a uniform 0..999 column
    counts.foreach { case (b, n) =>
      assert(n >= 230 && n <= 270, s"bin $b depth $n drifts from 250")
    }
  }

  test("equiDepthBins: null values keep their row and get a null bin") {
    val df = Seq(("g", Some(1.0)), ("g", None), ("g", Some(5.0)),
      ("g", Some(9.0)), ("g", Some(2.0))).toDF("g", "v")
    val out = Stats.equiDepthBins(df, "g", "v",
      lo = 0.0, hi = 16.0, nbins = 16, bins = 2).collect()
    assert(out.length == 5)
    assert(out.count(_.isNullAt(2)) == 1)
  }

  test("histPercentiles rejects out-of-range percentiles") {
    val df = Seq(("g", 1.0)).toDF("g", "v")
    intercept[IllegalArgumentException] {
      Stats.histPercentiles(df, "g", "v", 0.0, 8.0, 2, Seq(0.0))
    }
    intercept[IllegalArgumentException] {
      Stats.histPercentiles(df, "g", "v", 0.0, 8.0, 2, Seq(1.5))
    }
  }

  test("stored hist partials: probe equals inline, appended shard folds exactly") {
    import graft.sources.Layout
    val ps = Seq(0.25, 0.5, 0.9)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getDouble(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    val a = (0 until 4000).map(i =>
      ("g" + (i % 3), (i % 4).toLong, (i % 509).toDouble / 2))
      .toDF("g", "shard", "v")
    val b = (0 until 1000).map(i =>
      ("g" + (i % 3), 9L, (i % 211).toDouble))
      .toDF("g", "shard", "v")
    try {
      Layout.replaceBucketed(spark,
        Stats.histPartials(a, "g", "shard", "v", 0.0, 256.0, 64),
        "hp_idx", "g", buckets = 4)
      // Probe over the stored partials == inline single-pass build.
      val got = rows(Stats.histPercentilesFromIndex(
        Layout.table(spark, "hp_idx"), "g", 0.0, 256.0, 64, ps))
      val want = rows(Stats.histPercentiles(
        a, "g", "v", 0.0, 256.0, 64, ps))
      assert(got == want)
      // Append-only maintenance: a later shard's partial rows fold
      // into the same answer a full rebuild over a ∪ b gives.
      Layout.appendBucketed(
        Stats.histPartials(b, "g", "shard", "v", 0.0, 256.0, 64),
        "hp_idx", "g", buckets = 4)
      spark.catalog.refreshTable("hp_idx")
      val got2 = rows(Stats.histPercentilesFromIndex(
        Layout.table(spark, "hp_idx"), "g", 0.0, 256.0, 64, ps))
      val want2 = rows(Stats.histPercentiles(
        a.unionByName(b), "g", "v", 0.0, 256.0, 64, ps))
      assert(got2 == want2)
    } finally graft.sources.Layout.drop(spark, "hp_idx")
  }
}
