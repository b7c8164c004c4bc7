package graft

import graft.ops.{NaiveBayes, Stats}
import org.apache.spark.sql.functions._

/** Fixtures for the Wilson interval and the Naive Bayes eval. */
class WilsonNbSpec extends SparkSpec {
  import spark.implicits._

  test("wilsonRate: textbook 50/100 and the 0/10 edge") {
    val rows = (1 to 100).map(i => ("a", if (i <= 50) 1 else 0)) ++
      (1 to 10).map(_ => ("b", 0))
    val r = Stats.wilsonRate(rows.toDF("g", "h"), "g", "h")
      .orderBy("g")
      .select("g", "n", "k", "rate", "wilson_lo", "wilson_hi")
      .as[(String, Long, Long, Double, Double, Double)].collect().toSeq
    assert(r === Seq(("a", 100L, 50L, 0.5, 0.4038, 0.5962),
      ("b", 10L, 0L, 0.0, 0.0, 0.2775)))
  }

  test("naive bayes learns the vocabulary split, ties to min label") {
    val docs = Seq(
      (0L, "en", "the cat"), (2L, "en", "the dog"),
      (4L, "fr", "le chat"), (6L, "fr", "le chien"),
      (11L, "en", "the cat"), (13L, "fr", "le chien"),
      (15L, "fr", "zzz"), (17L, "fr", "   ")
    ).toDF("doc_id", "lang", "text")
    val r = NaiveBayes.evalSplit(docs, "doc_id", "lang", "text",
        col("doc_id") % 2 === 0)
      .orderBy("label")
      .select("label", "n_test", "n_correct", "accuracy")
      .as[(String, Long, Long, Double)].collect().toSeq
    // 'the cat' → en, 'le chien' → fr; the all-OOV doc ties and
    // falls to the smallest label (en), costing fr one miss. The
    // EMPTY-token doc 17 is still scored (prior-only; equal priors
    // tie to en) — it must count in n_test, not vanish.
    assert(r === Seq(("en", 1L, 1L, 1.0), ("fr", 3L, 1L, 0.3333)))
  }
}
