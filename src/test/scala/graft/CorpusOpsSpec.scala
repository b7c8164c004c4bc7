package graft

import graft.ops.{Packing, Sampling, TextAnalysis}
import org.apache.spark.sql.functions._

/** Edge semantics for the round-7 corpus operators: repetition
  * signals, sequence packing, stratified sampling.
  */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  test("bigrams: guarded for short texts, adjacent pairs otherwise") {
    val df = Seq("", "one", "a b", "a b c").toDF("t")
      .select(TextAnalysis.bigrams(col("t")).as("bg"))
    val got = df.collect().map(_.getSeq[String](0).toList).toList
    assert(got == List(Nil, Nil, List("a b"), List("a b", "b c")))
  }

  test("repetitionSignals: fractions and the <2-token null contract") {
    val docs = Seq(
      (1L, "spam spam spam spam"), // bigrams: 3× "spam spam"
      (2L, "all words differ here"), // 3 distinct bigrams
      (3L, "tiny") // no bigrams
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionSignals(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), Option(r.getAs[Any]("top_bigram_frac")),
          Option(r.getAs[Any]("distinct_bigram_frac")))).toMap
    assert(got(1L) == ((3L, Some(1.0), Some(0.3333))))
    assert(got(2L) == ((3L, Some(0.3333), Some(1.0))))
    assert(got(3L) == ((0L, None, None)))
  }

  test("packBudgeted: bin = chunk of the row's start offset, per stratum") {
    val df = Seq(
      ("s", 1L, 400L), ("s", 2L, 400L), ("s", 3L, 400L), // starts 0, 400, 800
      ("s", 4L, 900L), // start 1200 → bin 1
      ("t", 1L, 50L) // own stratum restarts at 0
    ).toDF("src", "id", "sz")
    val got = Packing.packBudgeted(df, "id", "sz", budget = 1000L, Seq("src"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(got(("s", 1L)) == 0 && got(("s", 2L)) == 0 && got(("s", 3L)) == 0)
    assert(got(("s", 4L)) == 1)
    assert(got(("t", 1L)) == 0)
    // a straddler belongs to the bin its START falls in: id=3 starts at
    // 800 < 1000 even though it ends at 1200
  }

  test("packBudgeted bins are contiguous in pack order") {
    val df = (1L to 100L).map(i => ("s", i, 137L)).toDF("src", "id", "sz")
    val rows = Packing.packBudgeted(df, "id", "sz", budget = 500L, Seq("src"))
      .orderBy("id").collect().map(_.getLong(3))
    assert(rows.head == 0L)
    assert(rows.sliding(2).forall { case Array(a, b) => b - a == 0 || b - a == 1 })
  }

  test("stratifiedSample: per-stratum rate, 0 and 100 are exact") {
    val df = (1L to 400L).map(i =>
      (i, if (i <= 200) "keepall" else "dropall")).toDF("k", "src")
    val got = Sampling.stratifiedSample(df, "k", "src",
      Seq("keepall" -> 100, "dropall" -> 0), defaultPct = 50)
      .groupBy("src").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("keepall" -> 200L))
  }

  test("stratifiedSample: unlisted strata use the default and subset hashSample") {
    val df = (1L to 500L).map(i => (i, "other")).toDF("k", "src")
    val strat = Sampling.stratifiedSample(df, "k", "src", Seq("x" -> 90), defaultPct = 30)
      .select("k").collect().map(_.getLong(0)).toSet
    val plain = Sampling.hashSample(df, "k", 30)
      .select("k").collect().map(_.getLong(0)).toSet
    assert(strat == plain) // same bucket function ⇒ identical membership
    assert(strat.nonEmpty && strat.size < 500)
  }

  test("gopherGates: each gate trips on its own violation, integer-exact") {
    val prose = (Seq.fill(25)("the steady machine hums and") :+ "works")
      .mkString(" ") // 126 words, mean len ~4.5, stopwords the/and
    val docs = Seq(
      (1L, prose), // passes everything
      (2L, Seq.fill(49)("word").mkString(" ")), // word count < 50
      (3L, (Seq.fill(60)("ab") ++ Seq.fill(30)("the and")).mkString(" ")), // mean len < 3
      (4L, prose + " " + Seq.fill(20)("#").mkString(" ")), // symbol ratio
      (5L, (Seq.fill(80)("1234") :+ "the and extras").mkString(" ")), // alpha frac
      (6L, Seq.fill(60)("machine hums steadily").mkString(" ")), // no 2 stopwords
      (7L, (1 to 60).map(i => s"- the bullet and item $i").mkString("\n")), // bullets
      (8L, (1 to 60).map(i => s"the line and number $i...").mkString("\n")) // ellipsis
    ).toDF("doc_id", "text")
    val got = TextAnalysis.gopherGates(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("keep"),
          Seq("g_word_count", "g_mean_len", "g_symbol", "g_alpha",
            "g_stopwords", "g_bullets", "g_ellipsis")
            .map(g => r.getAs[Int](g)))).toMap
    assert(got(1L)._1 == 1, s"clean prose must pass: ${got(1L)}")
    val failedGate = Map(2L -> 0, 3L -> 1, 4L -> 2, 5L -> 3, 6L -> 4,
      7L -> 5, 8L -> 6)
    failedGate.foreach { case (id, gi) =>
      assert(got(id)._1 == 0, s"doc $id must fail keep")
      assert(got(id)._2(gi) == 0, s"doc $id must fail gate $gi: ${got(id)}")
    }
  }

  test("Bpe.train: replays the ACL'16 low/lower/newest/widest example") {
    // Word frequencies low:5 lower:2 newest:6 widest:3 (Sennrich
    // ACL'16 §3.2, without the </w> marker). Hand-derived trajectory:
    // es(9) beats st(9) on the (left, right) tie-break; after est,
    // l+o(7) beats o+w(7); round 5 picks e+w(6) from the e/n/w tie.
    val docs = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val df = docs.grouped(4).map(_.mkString(" ")).toSeq.toDF("text")
    val (merges, vocab) = graft.ops.Bpe.trainWithVocab(df, "text", merges = 5)
    val got = merges.as[(Int, String, String, String, Long)].collect().toSeq
    assert(got == Seq(
      (1, "e", "s", "es", 9L),
      (2, "es", "t", "est", 9L),
      (3, "l", "o", "lo", 7L),
      (4, "lo", "w", "low", 7L),
      (5, "e", "w", "ew", 6L)))
    val states = vocab.select("state", "freq")
      .as[(String, Long)].collect().toMap
    assert(states == Map(
      " low " -> 5L, " low  e  r " -> 2L,
      " n  ew  est " -> 6L, " w  i  d  est " -> 3L))
  }

  test("Bpe.train: greedy left-to-right merge — disjoint repeats both merge") {
    // "abab": pair (a,b) occurs twice disjointly -> both merge in one
    // round; "aaa": (a,a) overlaps -> only the left pair merges.
    val df = Seq("abab abab aaa").toDF("text")
    val (merges, vocab) = graft.ops.Bpe.trainWithVocab(df, "text", merges = 1)
    val got = merges.as[(Int, String, String, String, Long)].collect().toSeq
    assert(got == Seq((1, "a", "b", "ab", 4L))) // ab:4 beats aa:2, ba:2
    val states = vocab.select("state").as[String].collect().toSet
    assert(states == Set(" ab  ab ", " a  a  a "))
  }

  test("Bpe.tokenCount: encodes new text with the trained rules in order") {
    // The ACL'16 trajectory's 5 rules; after them: low=1 symbol,
    // lower=[low,e,r]=3, newest=[n,ew,est]=3, widest=[w,i,d,est]=4.
    val rules = Seq("e" -> "s", "es" -> "t", "l" -> "o", "lo" -> "w",
      "e" -> "w")
    val got = Seq("low lower newest widest", "", "unseen est")
      .toDF("text")
      .select(graft.ops.Bpe.tokenCount(col("text"), rules).as("n"))
      .as[Long].collect().toSeq
    // "unseen": u-n-s-e-e-n: (e,s)? no adjacent "e s"... u n s e e n ->
    // no rule matches except none; 6 symbols. "est" -> e s t -> es t -> est: 1.
    assert(got == Seq(11L, 0L, 7L))
  }

  test("Bpe.train: stops early when every word is fully merged") {
    val df = Seq("xy xy").toDF("text")
    val merges = graft.ops.Bpe.train(df, "text", merges = 10)
    val got = merges.as[(Int, String, String, String, Long)].collect().toSeq
    assert(got == Seq((1, "x", "y", "xy", 2L)))
  }
}
