package graft

import graft.ops.{FeatureSelect, Rolling, Seasonal}
import org.apache.spark.sql.functions._

/** Hand-computed fixtures for token-label MI, the EWMA chart, and
  * seasonal decomposition.
  */
class FeatureSeasonalSpec extends SparkSpec {
  import spark.implicits._

  test("mutualInformation ranks the perfect separator first") {
    val docs = Seq(
      (1L, "en", "cat dog"), (2L, "en", "cat"),
      (3L, "fr", "chien"), (4L, "fr", "chien cat")
    ).toDF("doc_id", "lang", "text")
    val r = FeatureSelect.mutualInformation(docs, "doc_id", "lang",
        "text", k = 3)
      .orderBy(col("mi").desc, col("token"))
      .select("token", "n_docs", "mi")
      .as[(String, Long, Double)].collect().toSeq
    // chien appears in exactly the fr docs → MI = ln 2 = 0.693147.
    // cat and dog carry identical information (0.215762), tie broken
    // by token.
    assert(r === Seq(("chien", 2L, 0.693147),
      ("cat", 3L, 0.215762), ("dog", 1L, 0.215762)))
  }

  test("ewmaChart flags a spike against a flat baseline") {
    // Constant volume 5/day for 21 days, except day 20 bursts to 50.
    val ev = (0L to 20L).flatMap { d =>
      val n = if (d == 20) 50 else 5
      Seq.fill(n)(("a", d))
    }.toDF("g", "d")
    val r = Rolling.ewmaChart(ev, "g", "d", alpha = 0.3, window = 14,
        kSigma = 3, minPrior = 7)
      .orderBy("d")
      .select("d", "x", "ewma", "sigma", "flag")
      .as[(Long, Long, Double, Double, Int)].collect().toSeq
    assert(r.head._1 === 7L, "first emitted day has 7 prior days")
    r.filter(_._1 < 20).foreach { case (_, x, ewma, sigma, flag) =>
      assert(x === 5L && ewma === 5.0 && sigma === 0.0 && flag === 0)
    }
    val spike = r.last
    assert(spike._1 === 20L && spike._2 === 50L && spike._5 === 1,
      s"day 20 must be flagged: $spike")
  }

  test("decompose of a constant series is all-trend") {
    val ev = (0L to 13L).flatMap(d => Seq.fill(7)(("a", d))).toDF("g", "d")
    val r = Seasonal.decompose(ev, "g", "d")
      .orderBy("d")
      .select("d", "x", "trend", "seasonal", "remainder")
      .as[(Long, Long, Double, Double, Double)].collect().toSeq
    // Full 7-day windows exist only for days 3..10.
    assert(r.map(_._1) === (3L to 10L))
    r.foreach { case (_, x, tr, se, rem) =>
      assert(x === 7L && tr === 7.0 && se === 0.0 && rem === 0.0)
    }
  }
}
