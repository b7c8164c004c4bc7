package graft

import graft.ops.{Drift, Retrieval}

/** Fixtures for QQ drift profile, positional phrase search, and KWIC. */
class PhraseQqSpec extends SparkSpec {
  import spark.implicits._

  test("qqProfile reads a constant location shift off every quantile") {
    val rows = (0 to 10).map(v => ("a", v.toLong)) ++
      (0 to 10).map(v => ("b", v.toLong + 10))
    val df0 = rows.toDF("c", "v")
    val r = Drift.qqProfile(df0, "c", "v", "a", "b",
        ps = Seq(0.25, 0.5, 0.75))
      .orderBy("p").select("p", "n_a", "n_b", "q_a", "q_b", "gap")
      .as[(Double, Long, Long, Double, Double, Double)].collect().toSeq
    assert(r === Seq((0.25, 11L, 11L, 2.5, 12.5, 10.0),
      (0.5, 11L, 11L, 5.0, 15.0, 10.0),
      (0.75, 11L, 11L, 7.5, 17.5, 10.0)))
  }

  test("phraseSearch counts overlapping matches positionally") {
    val docs = Seq((1L, "a b a b a"), (2L, "a a b b"), (3L, "b a b"))
      .toDF("doc_id", "text")
    val r = Retrieval.phraseSearch(docs, "doc_id", "text",
        Seq("a", "b", "a"))
      .orderBy("doc_id").select("doc_id", "n_matches", "first_pos")
      .as[(Long, Long, Int)].collect().toSeq
    // Doc 1: "a b a" starts at 0 AND 2 (overlap allowed); docs 2/3
    // never contain the phrase.
    assert(r === Seq((1L, 2L, 0)))
  }

  test("kwic clips context at document edges") {
    val docs = Seq((1L, "x y z q w e r")).toDF("doc_id", "text")
    val r = Retrieval.kwic(docs, "doc_id", "text", "x", ctx = 3)
      .union(Retrieval.kwic(docs, "doc_id", "text", "q", ctx = 3))
      .union(Retrieval.kwic(docs, "doc_id", "text", "r", ctx = 3))
      .select("pos", "left_ctx", "right_ctx")
      .as[(Int, String, String)].collect().toSeq.sortBy(_._1)
    assert(r === Seq((0, "", "y z q"), (3, "x y z", "w e r"),
      (6, "q w e", "")))
  }
}
