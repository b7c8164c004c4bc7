package graft

import graft.ops.{LanguageModel, Retrieval}

/** Hand-derived fixtures for the ranking-eval metrics and the
  * Kneser-Ney bigram scorer.
  */
class RankingKnSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark join stream"), (2L, "spark join x"),
    (3L, "spark y"), (4L, "zzz zzz"))
    .toDF("doc_id", "text")
  private val terms = Seq("spark", "join", "stream")

  test("rankingEval: ideal run scores ndcg = mrr = 1; reversed run degrades") {
    val ideal = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("doc_id", "rank")
    val r = Retrieval.rankingEval(docs, ideal, "doc_id", "text", terms)
      .select("n_relevant", "ndcg", "mrr")
      .as[(Long, Double, Double)].head()
    assert(r === ((3L, 1.0, 1.0)))
    val reversed = Seq((3L, 1), (2L, 2), (1L, 3)).toDF("doc_id", "rank")
    val r2 = Retrieval.rankingEval(docs, reversed, "doc_id", "text", terms)
      .select("ndcg", "mrr").as[(Double, Double)].head()
    // DCG(rev) = 1 + 3/log2(3) + 7/2 = 6.3927; IDCG = 7 + 3/log2(3)
    //          + 1/2 = 9.3927 → ndcg ≈ 0.6806; first relevant rank 1
    assert(r2._1 == 0.6806 && r2._2 == 1.0)
  }

  test("knBigramNll reproduces the hand recurrence, counts unscorable bigrams") {
    val train = Seq((1L, "g", "a b a c")).toDF("doc_id", "g", "text")
    val test = Seq((2L, "g", "a b z c a")).toDF("doc_id", "g", "text")
    val r = LanguageModel.knBigramNll(train, test, "g", "text")
      .select("n_bigrams", "n_scored", "n_skipped", "kn_nll")
      .as[(Long, Long, Long, Double)].head()
    // (a,b): 0.25/2 + 0.75·(2/2)·(1/3) = 0.375; (b,z): P = 0 (skip);
    // (z,c), (c,a): continuation-only 1/3 each
    // mean(-ln) = (0.980829253 + 2·1.098612289)/3 = 1.0594
    assert(r === ((4L, 3L, 1L, 1.0594)))
  }
}
