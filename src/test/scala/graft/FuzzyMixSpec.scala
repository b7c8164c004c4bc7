package graft

import graft.ops.{Dedup, Sampling}
import org.apache.spark.sql.functions._

/** Edge semantics for edit-distance blocking and temperature mixing. */
class FuzzyMixSpec extends SparkSpec {
  import spark.implicits._

  test("editDistancePairs: matches brute force (blocking is lossless)") {
    val names = Seq("kitten", "sitten", "sittin", "sitting", "apple",
      "apples", "applesauce", "banana", "bananas", "bandana")
    val df = names.map(Tuple1(_)).toDF("s")
    val got = Dedup.editDistancePairs(df, "s", maxDist = 2)
      .select("str_a", "str_b", "dist")
      .as[(String, String, Int)].collect().toSet
    val brute = (for {
      a <- names; b <- names if a < b
      d = {
        // reference Levenshtein
        val m = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
          if (i == 0) j else if (j == 0) i else 0
        }
        for (i <- 1 to a.length; j <- 1 to b.length)
          m(i)(j) = math.min(math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
            m(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        m(a.length)(b.length)
      }
      if d >= 1 && d <= 2
    } yield (a, b, d)).toSet
    assert(got == brute, s"missing=${brute -- got} extra=${got -- brute}")
  }

  test("editDistancePairs: duplicate rows collapse before pairing") {
    val df = (Seq.fill(100)("acme corp") ++ Seq("acme corps")).toDF("s")
    val got = Dedup.editDistancePairs(df, "s", maxDist = 1).collect()
    assert(got.length == 1, "one pair despite 100 copies")
  }

  test("bpePairCounts: overlapping pairs, 1-char tokens contribute none") {
    import graft.ops.TextAnalysis
    val df = Seq("aaa a bb", "bb").toDF("text")
    // "aaa" → aa, aa; "a" → nothing (the sequence(1,0) guard); "bb"×2
    val got = TextAnalysis.bpePairCounts(df, "text", k = 10)
      .as[(Int, String, Long)].collect().toSeq
    assert(got == Seq((1, "aa", 2L), (2, "bb", 2L)),
      s"counts and deterministic tie-break: $got")
  }

  test("incrementalNearDups: batch probes index only — no self pairs") {
    val mk = (id: Long, t: String) => (id, t)
    val shared = (1 to 30).map(i => s"w$i").mkString(" ")
    val index = Seq(mk(1L, shared), mk(2L, shared), // index-internal dup pair
      mk(3L, "totally different content here")).toDF("doc_id", "text")
    val batch = Seq(mk(10L, shared), mk(11L, shared), // batch-internal dup pair
      mk(12L, "unrelated fresh news item")).toDF("doc_id", "text")
    val got = Dedup.incrementalNearDups(batch, index, "doc_id", "text",
        k = 16, bands = 4, threshold = 0.9)
      .select("batch_id", "index_id").as[(Long, Long)].collect().toSet
    assert(got == Set((10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L)),
      s"only batch×index pairs, never index×index or batch×batch: $got")
  }

  test("temperatureMix: sqrt flattening — small stratum keeps a higher rate") {
    // 900 "big" rows vs 100 "small": α=0.5 shares ∝ 30:10, so per-row
    // rates are 3× apart (big down-weighted 3×), not 9×.
    val df = ((1 to 900).map(i => (i.toLong, "big")) ++
      (1001 to 1100).map(i => (i.toLong, "small"))).toDF("id", "src")
    val rates = Sampling.temperatureMix(df, "id", "src", targetRows = 400L)
      .select("src", "rate_ppm").distinct()
      .as[(String, Long)].collect().toMap
    // s6: big=30e6, small=10e6, tot=40e6.
    // big: 400e6*30e6/(40e6*900) = 333333.33 → 333333 ppm
    // small: 400e6*10e6/(40e6*100) = 1000000 → capped exactly at 1e6
    assert(rates("big") == 333333L, s"got $rates")
    assert(rates("small") == 1000000L, s"got $rates")
  }

  test("temperatureMix: rates cap at 1e6, kept count tracks the target") {
    val df = (1 to 1000).map(i => (i.toLong, s"s${i % 4}")).toDF("id", "src")
    val kept = Sampling.temperatureMix(df, "id", "src", targetRows = 500L)
    val n = kept.count()
    assert(math.abs(n - 500L) < 80, s"≈500 kept, got $n")
    val again = Sampling.temperatureMix(
      df.repartition(13), "id", "src", targetRows = 500L)
      .select("id").as[Long].collect().toSet
    assert(kept.select("id").as[Long].collect().toSet == again,
      "membership survives re-partitioning")
  }
}
