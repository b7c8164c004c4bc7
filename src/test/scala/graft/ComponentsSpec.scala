package graft

import graft.ops.Components
import org.apache.spark.sql.functions._

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def cc(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val n = nodes.toDF("id")
    val e = edges.toDF("a", "b")
    Components.connectedComponents(n, "id", e, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("transitive chain collapses to one component under min id") {
    // 1-2, 2-3, 3-4: pairwise finder never emits (1,4)
    val got = cc(Seq(1L, 2L, 3L, 4L, 9L), Seq((1L, 2L), (2L, 3L), (3L, 4L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 9L -> 9L))
  }

  test("orientation and duplicate edges are irrelevant") {
    val a = cc(Seq(1L, 2L, 3L), Seq((3L, 2L), (2L, 1L)))
    val b = cc(Seq(1L, 2L, 3L), Seq((1L, 2L), (2L, 3L), (2L, 3L), (3L, 2L)))
    assert(a == b && a(3L) == 1L)
  }

  test("disjoint clusters keep distinct labels; singletons label themselves") {
    val got = cc(Seq(1L, 2L, 5L, 6L, 8L), Seq((1L, 2L), (5L, 6L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 5L -> 5L, 6L -> 5L, 8L -> 8L))
  }

  test("a long path needs diameter rounds and still converges") {
    val n = 12L // path 0-1-2-...-11: worst diameter per node count
    val got = cc((0L until n), (0L until n - 1).map(i => (i, i + 1)))
    assert(got.values.toSet == Set(0L) && got.size == n)
  }

  test("maxIter below the diameter fails loudly, not wrongly") {
    val e = (0L until 11L).map(i => (i, i + 1))
    intercept[IllegalStateException] {
      Components.connectedComponents(
        (0L until 12L).toDF("id"), "id", e.toDF("a", "b"), "a", "b",
        maxIter = 2).collect()
    }
  }

  test("endpoints absent from nodes keep the min-id invariant") {
    // nodes={5}, edge (5,3): 3 never appears in `nodes`, yet the
    // component label must still be the true minimum, 3 — and 3 itself
    // surfaces in the output.
    val got = cc(Seq(5L), Seq((5L, 3L)))
    assert(got == Map(5L -> 3L, 3L -> 3L))
  }

  test("dedupClusters sizes clusters and marks the min id as canonical") {
    val docs = Seq(1L, 2L, 3L, 7L).toDF("doc_id")
    val pairs = Seq((2L, 1L), (2L, 3L)).toDF("id_a", "id_b")
    val got = Components.dedupClusters(docs, "doc_id", pairs, "id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L), (7L, 7L, 1L)))
    // the dedup decision: keep doc_id == component
    assert(got.count { case (id, comp, _) => id == comp } == 2)
  }

  test("canonicalPerCluster keeps the best-quality member, ties to min id") {
    val docs = Seq(1L, 2L, 3L, 7L, 8L).toDF("doc_id")
    val pairs = Seq((2L, 1L), (2L, 3L), (7L, 8L)).toDF("id_a", "id_b")
    val clusters = Components.dedupClusters(docs, "doc_id", pairs,
      "id_a", "id_b")
    val quality = Seq((1L, 10L), (2L, 99L), (3L, 50L), (7L, 5L), (8L, 5L))
      .toDF("doc_id", "n_chars")
    val got = Components.canonicalPerCluster(clusters, "doc_id",
        quality, "n_chars")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // cluster {1,2,3}: doc 2 is longest (NOT min id 1)
    assert(got(1L) == ((3L, 2L, 99L)))
    // cluster {7,8}: quality tie -> min id 7
    assert(got(7L) == ((2L, 7L, 5L)))
    assert(got.size == 2)
  }

  test("seededLabelSpread: labels march one hop per round, seeds clamped, ties smallest") {
    // path 1-2-3-4 with seeds A@1, B@4; node 5 isolated; node 6 tied
    // between A@1 and B@4 via direct edges.
    val docs = Seq(
      (1L, Some("A")), (2L, None), (3L, None), (4L, Some("B")),
      (5L, None), (6L, None))
      .toDF("id", "lab")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 6L), (4L, 6L))
      .toDF("a", "b")
    val got = Components.seededLabelSpread(docs, "id", "lab",
        pairs, "a", "b", rounds = 2)
      .collect().map(r => r.getAs[Long]("id") ->
        ((Option(r.getAs[String]("label")),
          Option(r.get(r.fieldIndex("labeled_at")))
            .map(_.asInstanceOf[Int]),
          r.getAs[Int]("is_seed")))).toMap
    assert(got(1L) == ((Some("A"), Some(0), 1)))
    assert(got(4L) == ((Some("B"), Some(0), 1)))
    // hop 1: 2 sees A, 3 sees B, 6 sees both (tie -> A).
    assert(got(2L) == ((Some("A"), Some(1), 0)))
    assert(got(3L) == ((Some("B"), Some(1), 0)))
    assert(got(6L) == ((Some("A"), Some(1), 0)))
    // isolated node never reached.
    assert(got(5L) == ((None, None, 0)))
    // clamping: one more round must not flip anything already set.
    val again = Components.seededLabelSpread(docs, "id", "lab",
        pairs, "a", "b", rounds = 3)
      .collect().map(r => r.getAs[Long]("id") ->
        Option(r.getAs[String]("label"))).toMap
    assert(again(2L) == Some("A") && again(3L) == Some("B") &&
      again(6L) == Some("A"))
  }

  private def clusterMapOf(df: org.apache.spark.sql.DataFrame) =
    df.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("cluster index: write then probe matches dedupClusters") {
    import graft.sources.Layout
    val docs = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (5L, 6L)).toDF("id_a", "id_b")
    try {
      Components.writeClusterIndex(spark, docs, "doc_id", pairs,
        "id_a", "id_b", "cix_t1", buckets = 4)
      val got = clusterMapOf(
        Components.clustersFromIndex(Layout.table(spark, "cix_t1")))
      val want = clusterMapOf(
        Components.dedupClusters(docs, "doc_id", pairs, "id_a", "id_b"))
      assert(got == want && want(6L) == ((5L, 2L)) && want(3L) == ((3L, 1L)))
    } finally graft.sources.Layout.drop(spark, "cix_t1")
  }

  test("mergeClusterIndex equals a full rebuild, including a batch bridge of two clusters") {
    import graft.sources.Layout
    val old = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("doc_id")
    val oldPairs = Seq((1L, 2L), (5L, 6L)).toDF("id_a", "id_b")
    try {
      Components.writeClusterIndex(spark, old, "doc_id", oldPairs,
        "id_a", "id_b", "cix_t2", buckets = 4)
      // Batch {10, 11} bridges clusters {1,2} and {5,6}: 10~11 inside
      // the batch, 10~2 and 11~5 across — everything merges to label 1.
      val batch = Seq(10L, 11L).toDF("doc_id")
      val internal = Seq((10L, 11L)).toDF("id_a", "id_b")
      val cross = Seq((10L, 2L), (11L, 5L)).toDF("batch_id", "index_id")
      Components.mergeClusterIndex(spark, "cix_t2", batch, "doc_id",
        internal, "id_a", "id_b", cross, "batch_id", "index_id",
        buckets = 4)
      val all1 = old.union(batch)
      val pairs1 = oldPairs.union(internal)
        .union(cross.toDF("id_a", "id_b"))
      val got1 = clusterMapOf(
        Components.clustersFromIndex(Layout.table(spark, "cix_t2")))
      val want1 = clusterMapOf(Components.dedupClusters(
        all1, "doc_id", pairs1, "id_a", "id_b"))
      assert(got1 == want1 && want1(11L) == ((1L, 6L)),
        s"merged map must equal full rebuild: $got1 vs $want1")
      // Second generation over the now-stale rows: doc 20 attaches to
      // the merged cluster through 6 (whose stored rows span two
      // generations — the min-resolve must pick the newest label).
      val batch2 = Seq(20L).toDF("doc_id")
      val cross2 = Seq((20L, 6L)).toDF("batch_id", "index_id")
      Components.mergeClusterIndex(spark, "cix_t2", batch2, "doc_id",
        internal.limit(0), "id_a", "id_b",
        cross2, "batch_id", "index_id", buckets = 4)
      val got2 = clusterMapOf(
        Components.clustersFromIndex(Layout.table(spark, "cix_t2")))
      val want2 = clusterMapOf(Components.dedupClusters(
        all1.union(batch2), "doc_id",
        pairs1.union(cross2.toDF("id_a", "id_b")), "id_a", "id_b"))
      assert(got2 == want2 && got2(20L) == ((1L, 7L)),
        s"second-generation merge must equal full rebuild: $got2 vs $want2")
      // A batch with NO matches stays a singleton and touches nothing.
      val batch3 = Seq(99L).toDF("doc_id")
      Components.mergeClusterIndex(spark, "cix_t2", batch3, "doc_id",
        internal.limit(0), "id_a", "id_b",
        cross2.limit(0), "batch_id", "index_id", buckets = 4)
      val got3 = clusterMapOf(
        Components.clustersFromIndex(Layout.table(spark, "cix_t2")))
      assert(got3(99L) == ((99L, 1L)) && got3 - 99L == got2)
      // Generation compaction: the merged table carries relabel rows
      // (more rows than docs); compaction collapses to exactly one
      // row per doc and the probe result is unchanged.
      val preRows = spark.table("cix_t2").count()
      val nDocs = spark.table("cix_t2")
        .select("doc_id").distinct().count()
      assert(preRows > nDocs,
        s"merge should have appended relabel generations ($preRows rows, $nDocs docs)")
      Components.compactClusterIndex(spark, "cix_t2", buckets = 4)
      assert(spark.table("cix_t2").count() == nDocs)
      val got4 = clusterMapOf(
        Components.clustersFromIndex(Layout.table(spark, "cix_t2")))
      assert(got4 == got3, "compaction must not change the probe result")
    } finally graft.sources.Layout.drop(spark, "cix_t2")
  }
}
