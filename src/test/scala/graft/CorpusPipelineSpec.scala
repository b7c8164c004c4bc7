package graft

import graft.ops.CorpusPipeline

/** Unit coverage for the composed curation flows (q50 pins `curate`
  * against the DuckDB oracle at data scale; this pins the STAGE
  * semantics — which gate removes which document — plus the
  * `curateFull` pre-stages, on a corpus built so every gate fires).
  */
class CorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    // kept: good English text
    (1L, "the quick brown fox jumps over the lazy dog today", "s1"),
    // exact duplicate of doc 1 → higher id loses
    (2L, "the quick brown fox jumps over the lazy dog today", "s1"),
    // shares a 5-gram with the benchmark → decontaminated (curateFull)
    (3L, "the alpha beta gamma delta epsilon zeta eta theta", "s1"),
    // too short + no stopwords → language gate drops it
    (4L, "xx yy zz", "s1"),
    // kept: PII redacted first, then passes every gate
    (5L, "the contact is bob@example.com and the rest is fine text", "s1"))
    .toDF("doc_id", "text", "source")

  private val benchmark = Seq((99L, "alpha beta gamma delta epsilon zeta"))
    .toDF("doc_id", "text")

  test("curate: exact dup and quality/language gates fire; accounting is per source") {
    val out = CorpusPipeline.curate(docs).collect()
    assert(out.length == 1)
    val r = out.head
    // Docs 1 and 5 survive under the TRAINED default gate (round 18):
    // doc 3's Greek-letter word salad is `und` to the trigram model
    // (the stopword heuristic called it English off one "the"), so it
    // now falls at the gate next to doc 4's junk.
    assert(r.getAs[Long]("docs_kept") == 2, r.toString)
    assert(r.getAs[Long]("tokens_kept") == 10 + 10, r.toString)
    // the funnel attributes every dropped doc to the gate that took it
    assert(r.getAs[Long]("dropped_exact_dup") == 1, r.toString) // doc 2
    assert(r.getAs[Long]("dropped_quality") == 2, r.toString) // docs 3, 4
    assert(r.getAs[Long]("dropped_near_dup") == 0, r.toString)
  }

  test("curate: the heuristic leg stays reachable (trainedLangId = false)") {
    val r = CorpusPipeline.curate(docs, trainedLangId = false)
      .collect().head
    // the q50-oracle behavior: doc 3 passes the stopword-ratio gate
    assert(r.getAs[Long]("docs_kept") == 3, r.toString)
    assert(r.getAs[Long]("tokens_kept") == 10 + 9 + 10, r.toString)
    assert(r.getAs[Long]("dropped_quality") == 1, r.toString) // doc 4
  }

  test("near-dup removal is cluster-based: a transitive component keeps only its min id") {
    // Verified pairs form (1,3) and (2,3) but NOT (1,2): docs 1 and 2
    // each share 35 of 40 tokens with doc 3 (J = 0.875 ≥ 0.8) while
    // overlapping each other at only J = 0.75. Pair-drop ("drop the
    // larger id of each pair") would keep BOTH 1 and 2; the transitive
    // closure says {1,2,3} is one cluster and only 1 survives.
    val toks = (1 to 5).map(i => s"w0$i") ++
      Seq("the", "and", "of", "to") ++ (10 to 40).map(i => s"w$i")
    assert(toks.length == 40)
    val chain = Seq(
      (1L, toks.dropRight(5).mkString(" "), "s1"),
      (2L, toks.drop(5).mkString(" "), "s1"),
      (3L, toks.mkString(" "), "s1")
    ).toDF("doc_id", "text", "source")
    // heuristic gate: the wNN token salad is (correctly) `und` to the
    // trained model; this test pins NEAR-DUP semantics, not the gate
    val r = CorpusPipeline.curate(chain, trainedLangId = false)
      .collect().head
    assert(r.getAs[Long]("docs_kept") == 1, r.toString)
    assert(r.getAs[Long]("dropped_near_dup") == 2, r.toString)
  }

  test("curateFull: PII scrub + decontamination compose in front of curate") {
    val out = CorpusPipeline.curateFull(docs, benchmark).collect()
    assert(out.length == 1)
    val r = out.head
    // doc 3 now falls to the benchmark 5-gram overlap; 1 and 5 remain
    assert(r.getAs[Long]("docs_kept") == 2, r.toString)
    assert(r.getAs[Long]("tokens_kept") == 10 + 10, r.toString)
  }
}
