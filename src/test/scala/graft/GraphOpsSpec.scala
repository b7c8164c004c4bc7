package graft

import graft.ops.{LineDedup, Normalize, PageRank, TextAnalysis}
import org.apache.spark.sql.functions._

/** Edge semantics for the round-8 graph/report operators: PageRank,
  * group z-normalization, vocabulary heavy-hitters, boilerplate
  * coverage.
  */
class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank: symmetric pair ranks above isolates, mass sums to 1") {
    // 1—2 linked, 3 isolated
    val nodes = Seq(1L, 2L, 3L).toDF("id")
    val edges = Seq((1L, 2L)).toDF("a", "b")
    val got = PageRank.run(nodes, "id", edges, "a", "b", iters = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) == got(2L), "symmetric endpoints rank equally")
    assert(got(1L) > got(3L), "linked nodes outrank the isolate")
    assert(math.abs(got.values.sum - 1.0) < 1e-4, s"mass ≈ 1: $got")
  }

  test("pageRank: hub of a star outranks its leaves") {
    val nodes = (1L to 5L).toDF("id")
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)).toDF("a", "b")
    val got = PageRank.run(nodes, "id", edges, "a", "b", iters = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) > got(2L) * 2, s"hub dominates: $got")
    assert(got(2L) == got(5L), "leaves tie")
  }

  test("pageRank: edges to absent endpoints are dropped, mass conserved") {
    val nodes = Seq(1L, 2L).toDF("id")
    val edges = Seq((1L, 99L)).toDF("a", "b") // 99 is not a node
    val got = PageRank.run(nodes, "id", edges, "a", "b", iters = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == Map(1L -> 0.5, 2L -> 0.5), s"no rank leaks to 99: $got")
  }

  test("pageRank: all-isolate graph is uniform at 1/N") {
    val nodes = (1L to 4L).toDF("id")
    val edges = Seq.empty[(Long, Long)].toDF("a", "b")
    val got = PageRank.run(nodes, "id", edges, "a", "b", iters = 3)
      .collect().map(_.getDouble(1)).toSet
    assert(got == Set(0.25))
  }

  test("personalized pageRank: trust decays with distance, unreachable is exact zero") {
    // Path 1—2—3, plus {4,5} linked but unreachable from the seed, and
    // 6 a non-seed isolate. Seed = {1}.
    val nodes = (1L to 6L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("a", "b")
    val seeds = Seq(1L).toDF("sid")
    val got = PageRank.personalized(nodes, "id", edges, "a", "b",
        seeds, "sid", iters = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) > got(2L) && got(2L) > got(3L),
      s"trust decays along the path: $got")
    assert(got(4L) == 0.0 && got(5L) == 0.0 && got(6L) == 0.0,
      s"unreachable nodes score exact zero: $got")
    assert(math.abs(got.values.sum - 1.0) < 1e-4, s"mass ≈ 1: $got")
  }

  test("personalized pageRank: isolated seed keeps restart mass; two seeds split it") {
    val nodes = (1L to 3L).toDF("id")
    val edges = Seq((2L, 3L)).toDF("a", "b")
    // Seed 1 is isolated: its rank converges to the scalar fixed
    // point p = (1−d)/nS + (d/nS)·p = 0.075 / 0.575 with d = 0.85,
    // nS = 2 (its dangling mass restarts half into itself).
    val got = PageRank.personalized(nodes, "id", edges, "a", "b",
        Seq(1L, 2L).toDF("sid"), "sid", iters = 20)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(got(1L) - 0.075 / 0.575) < 1e-4,
      s"isolated seed sits at the restart fixed point: $got")
    assert(got(2L) > got(3L), s"seeded endpoint outranks its leaf: $got")
    assert(math.abs(got.values.sum - 1.0) < 1e-4, s"mass ≈ 1: $got")
  }

  test("zscore: per-group standardization, degenerate groups null") {
    val df = Seq(
      ("a", 1L, 10.0), ("a", 2L, 20.0), ("a", 3L, 30.0),
      ("b", 4L, 5.0), // singleton group: sd undefined
      ("c", 5L, 7.0), ("c", 6L, 7.0) // zero variance
    ).toDF("g", "id", "v")
    val got = Normalize.zscore(df, "v", Seq("g"))
      .collect().map(r => r.getLong(1) -> Option(r.getAs[Any]("z"))).toMap
    assert(got(1L) == Some(-1.0) && got(2L) == Some(0.0) && got(3L) == Some(1.0))
    assert(got(4L).isEmpty && got(5L).isEmpty && got(6L).isEmpty)
  }

  test("topTokens: count order, deterministic tie-break, k cut") {
    val df = Seq(
      ("en", "b b b a a c"), ("en", "a"), // en: a×3, b×3, c×1
      ("fr", "z")
    ).toDF("lang", "text")
    val got = TextAnalysis.topTokens(df, "lang", "text", k = 2)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3)))
    assert(got.toSet == Set(
      ("en", 1, "a", 3L), ("en", 2, "b", 3L), // tie → token order
      ("fr", 1, "z", 1L)))
  }

  test("boilerplateSegments: coverage fraction against stratum doc count") {
    val docs = Seq(
      (1L, "s", Seq("nav", "x")), (2L, "s", Seq("nav", "y")),
      (3L, "s", Seq("nav", "nav", "z")), // within-doc repeat counts once
      (4L, "s", Seq("w")),
      (5L, "t", Seq("nav")) // other stratum: 1/1 coverage
    ).toDF("doc_id", "src", "segs")
    val got = LineDedup.boilerplateSegments(docs, "doc_id", "segs", "src", 0.7)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got == Map(("s", "nav") -> ((3L, 0.75)), ("t", "nav") -> ((1L, 1.0))))
  }
}
