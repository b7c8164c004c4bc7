package graft

import graft.ops.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._

class DedupTextSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox", "a"),
    (2L, "the quick brown fox", "a"),   // exact dup of 1
    (3L, "the quick brown wolf", "a"),  // near dup of 1
    (4L, "completely different text here", "b")
  ).toDF("doc_id", "text", "source")

  test("exact dedup keeps the lowest id and counts copies") {
    val out = Dedup.exact(docs, "text", "doc_id")
      .filter(col("n_copies") > 1).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("keep_id") == 1L)
    assert(out.head.getAs[Long]("n_copies") == 2L)
  }

  test("minhash signatures are equal for identical text, length k") {
    val sigs = docs.select(col("doc_id"), Dedup.minhashSignature(col("text"), 16).as("sig"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L).length == 16)
    assert(sigs(1L) != sigs(4L))
  }

  test("minhash signature of an empty/whitespace doc is NULL, not a sentinel") {
    val out = Seq((1L, ""), (2L, "   "), (3L, "real text")).toDF("doc_id", "text")
      .select(col("doc_id"), Dedup.minhashSignature(col("text"), 8).as("sig"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.isNullAt(1)).toMap
    assert(out(1L) && out(2L) && !out(3L))
    // and therefore empty docs never become near-dup candidates of each other
    val empties = Seq((1L, "", "a"), (2L, "  ", "a")).toDF("doc_id", "text", "source")
    assert(Dedup.minhashNearDups(empties, "doc_id", "text", k = 8, bands = 2).count() == 0)
  }

  test("ngramJaccardPairsReleasable: hook unpersists the shingle cache") {
    // Scope the assertion to the RDD ids THIS call adds: suites share
    // one SparkContext and run in parallel, so the global persistent
    // set may legitimately hold other suites' localCheckpoints (the
    // round-7 flake: Components' per-round checkpoints landing here).
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val (pairs, release) = Dedup.ngramJaccardPairsReleasable(
      docs, "doc_id", "text", "source", n = 2, threshold = 0.4)
    assert(pairs.count() >= 1)
    val added = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(added.nonEmpty, "the shingle frame must be persisted")
    release()
    val remaining = spark.sparkContext.getPersistentRDDs.keySet & added
    assert(remaining.isEmpty,
      s"release() must unpersist the shingle cache, still held: $remaining")
  }

  test("ngram jaccard finds the near-dup pair inside its block only") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", "source",
      n = 2, threshold = 0.4)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    assert(pairs.contains((1L, 2L))) // identical
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L))) // near dup
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L)) // other block
  }

  test("shingles of a text shorter than n is empty (sequence(1,0) guard)") {
    val out = Seq("one").toDF("text")
      .select(Dedup.shingles(col("text"), 3).as("sh")).collect().head.getSeq[String](0)
    assert(out.isEmpty)
  }

  test("simhash of identical texts is equal and within 60 bits") {
    val h = docs.select(col("doc_id"), Dedup.simhash(col("text")).as("h"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("h")).toMap
    assert(h(1L) == h(2L))
    assert(h(1L) >= 0L && h(1L) < (1L << 60))
  }

  test("bow fingerprint is word-order insensitive") {
    val fp = Seq("b a c", "c b a", "a b d").toDF("text")
      .select(TextAnalysis.bowFingerprint(col("text")).as("f"))
      .collect().map(_.getString(0))
    assert(fp(0) == fp(1))
    assert(fp(0) != fp(2))
  }

  test("quality signals: tokens drop empties, ttr and stopword ratio computed") {
    val r = Seq((1L, "the the   fox")).toDF("doc_id", "text")
      .transform(TextAnalysis.annotate("text")).collect().head
    assert(r.getAs[Int]("n_tokens") == 3)
    assert(math.abs(r.getAs[Double]("type_token_ratio") - 0.6667) < 1e-4)
    assert(math.abs(r.getAs[Double]("stopword_ratio") - 0.6667) < 1e-4)
    assert(r.getAs[String]("lang_pred") == "en")
  }

  test("redactPii scrubs emails, IPv4s, and long digit runs; leaves short numbers") {
    val got = Seq("mail bob.smith+x@corp.example.com at 192.168.1.200 card " +
      "4111111111111111 room 42").toDF("text")
      .select(TextAnalysis.redactPii(col("text")).as("c")).collect().head.getString(0)
    assert(got == "mail <EMAIL> at <IP> card <NUM> room 42", got)
  }

  test("decontaminate drops exactly the docs sharing an n-gram with the benchmark") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"), // shares the bench 5-gram
      (2L, "one two three four five six"),         // clean
      (3L, "short text"),                          // < n tokens: trivially survives
      (4L, "beta gamma delta epsilon zeta eta"))   // shares a shifted 5-gram
      .toDF("doc_id", "text")
    val bench = Seq((99L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val kept = Dedup.decontaminate(docs, bench, "doc_id", "text", n = 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L))
  }

  test("containmentPairs finds the quote Jaccard misses, directionally") {
    val docs = Seq(
      (1L, "a b c d e", "s"), // contained verbatim in doc 2
      (2L, "a b c d e " + (1 to 30).map(i => s"w$i").mkString(" "), "s"),
      (3L, "x y z q r", "s"), // unrelated
      (4L, "a b c d e", "t") // other block: never paired
    ).toDF("doc_id", "text", "source")
    val got = Dedup.containmentPairs(docs, "doc_id", "text", "source",
        n = 3, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // 1 in 2 (all 3 of doc-1's shingles occur in doc 2) but NOT 2 in 1
    assert(got.contains((1L, 2L)) && !got.contains((2L, 1L)))
    assert(got((1L, 2L)) == ((3L, 3L, 1.0)))
    assert(got.keySet == Set((1L, 2L))) // nothing else pairs
    // the symmetric Jaccard at the same bar misses it: J = 3/35ish
    val jac = Dedup.ngramJaccardPairs(docs, "doc_id", "text", "source",
      n = 3, threshold = 0.9).count()
    assert(jac == 0)
  }

  test("lshTuningTable: S-curve values match closed form; more rows/band = sharper") {
    val rows = Dedup.lshTuningTable(spark,
      configs = Seq((32, 2), (16, 4), (8, 8), (4, 16)),
      grid = 20, thresholdPermil = 800)
      .collect().map(r => (r.getAs[Int]("bands"),
        r.getAs[Int]("rows_per_band")) -> r).toMap
    assert(rows.size == 4)
    // closed form at s = 0.8 (chain vs pow agree to a few nanos)
    def pAt(b: Int, r: Int, s: Double): Long =
      math.round((1.0 - math.pow(1.0 - math.pow(s, r), b)) * 1e9)
    rows.foreach { case ((b, r), row) =>
      assert(row.getAs[Int]("k") == 64)
      val got = row.getAs[Long]("p_at_threshold_nano")
      assert(math.abs(got - pAt(b, r, 0.8)) <= 16L,
        s"($b,$r): $got vs ${pAt(b, r, 0.8)}")
    }
    // higher rows-per-band → sharper curve → less FP area below the
    // threshold; and the (8,8) midpoint sits at 0.75 on the 20-grid.
    val fp = Seq((32, 2), (16, 4), (8, 8), (4, 16))
      .map(c => rows(c).getAs[Long]("fp_area_nano"))
    assert(fp.zip(fp.tail).forall { case (a, b) => a > b })
    assert(rows((8, 8)).getAs[Long]("s50_permil") == 750L)
  }

  test("maintenancePairSets equals the three standalone pair builders") {
    // r20: the fused builder shares one band/token frame per corpus
    // half; its three outputs must be ROW-IDENTICAL to composing
    // minhashNearDups(old) + minhashNearDups(batch) +
    // incrementalNearDups(batch, old) — the q361/q362 contract.
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),   // dup of 1 (old side)
      (3L, "totally different words here now"),
      (10L, "alpha beta gamma delta epsilon"),  // batch dup of 1/2
      (11L, "totally different words here also"), // near dup of 3
      (12L, "totally different words here also")  // exact dup of 11
    ).toDF("doc_id", "text")
    val old = corpus.filter(col("doc_id") < 10)
    val batch = corpus.filter(col("doc_id") >= 10)
    val (op, bp, cp) = Dedup.maintenancePairSets(
      old, batch, "doc_id", "text", k = 16, bands = 4, threshold = 0.5)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(rows(op) == rows(Dedup.minhashNearDups(
      old, "doc_id", "text", k = 16, bands = 4, threshold = 0.5)))
    assert(rows(bp) == rows(Dedup.minhashNearDups(
      batch, "doc_id", "text", k = 16, bands = 4, threshold = 0.5)))
    assert(rows(cp) == rows(Dedup.incrementalNearDups(
      batch, old, "doc_id", "text", k = 16, bands = 4, threshold = 0.5)))
    // sanity: the fixture actually exercises all three sets
    assert(rows(op).nonEmpty && rows(bp).nonEmpty && rows(cp).nonEmpty)
  }
}
