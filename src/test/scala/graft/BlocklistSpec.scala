package graft

import graft.functions.AhoCorasick
import graft.ops.Blocklist
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick blocklist matching: the automaton's every-occurrence
  * semantics (overlapping, nested, suffix chains), the Column/op layer,
  * and the shuffle-free plan shape of the release gate.
  */
class BlocklistSpec extends SparkSpec {
  import spark.implicits._

  private def hitIds(ac: AhoCorasick, s: String): Seq[Int] = {
    val a = ac.hits(UTF8String.fromString(s))
    (0 until a.numElements()).map(a.getInt)
  }

  test("automaton reports overlapping and nested matches, suffix chain included") {
    val ac = AhoCorasick.build(Seq("he", "she", "his", "hers"))
    // Classic AC corpus: "she" fires "she" then its suffix "he" at the
    // same end position (longer first), "hers" fires "he" then "hers".
    assert(hitIds(ac, "ushers") === Seq(1, 0, 3))
    assert(hitIds(ac, "his hers") === Seq(2, 0, 3))
    // Self-overlapping single pattern: "aa" in "aaaa" ends at 3 places.
    val aa = AhoCorasick.build(Seq("aa"))
    assert(hitIds(aa, "aaaa") === Seq(0, 0, 0))
    assert(hitIds(aa, "a") === Seq())
  }

  test("automaton matches raw UTF-8 bytes, case-sensitively") {
    val ac = AhoCorasick.build(Seq("café", "Caf"))
    assert(hitIds(ac, "café Caf café") === Seq(0, 1, 0))
    assert(hitIds(ac, "CAFÉ") === Seq())
    // An ASCII pattern never fires inside a multi-byte sequence
    // (UTF-8 continuation bytes have the high bit set).
    val e = AhoCorasick.build(Seq("e"))
    assert(hitIds(e, "é") === Seq())
  }

  test("hitsCol rides codegen and preserves null text") {
    val df = Seq(("a", Option("she sells seashells")),
      ("b", Option("nothing here")), ("c", None: Option[String]))
      .toDF("id", "text")
    val got = df.select(col("id"),
        Blocklist.hitsCol(col("text"), Seq("she", "sea", "ells")).as("h"))
      .as[(String, Option[Seq[Int]])].collect().toMap
    // ends: she@2, ells@8 (sells), sea@12, she@15 (seaSHElls), ells@18
    assert(got("a") === Some(Seq(0, 2, 1, 0, 2)))
    assert(got("b") === Some(Seq()))
    assert(got("c") === None)
  }

  test("scan counts per (doc, pattern); report rolls up; clean gates") {
    val docs = Seq(
      (1L, "s1", "aa baa"), // "aa": 1 + 1 overlapping? "baa" has 1 → 2
      (2L, "s1", "aaa"),    // "aa" twice (overlap)
      (3L, "s2", "clean")).toDF("doc_id", "source", "text")
    val pats = Seq("aa", "ba")
    val scan = Blocklist.scan(docs, "doc_id", "text", pats)
      .orderBy("doc_id", "pattern_id")
      .as[(Long, Int, Long, String)].collect().toSeq
    assert(scan === Seq(
      (1L, 0, 2L, "aa"), (1L, 1, 1L, "ba"), (2L, 0, 2L, "aa")))
    val rep = Blocklist.report(docs, "doc_id", "text", pats)
      .orderBy("pattern").as[(String, Long, Long)].collect().toSeq
    assert(rep === Seq(("aa", 2L, 4L), ("ba", 1L, 1L)))
    assert(Blocklist.clean(docs, "text", pats)
      .select("doc_id").as[Long].collect().toSeq === Seq(3L))
    assert(Blocklist.clean(docs, "text", pats, maxHits = 2)
      .select("doc_id").as[Long].collect().sorted.toSeq === Seq(2L, 3L))
    val ret = Blocklist.retentionBySource(docs, "source", "text", pats)
      .orderBy("source")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(ret === Seq(("s1", 2L, 2L, 0.0), ("s2", 1L, 0L, 1.0)))
  }

  test("scrub redacts the interval union of matches") {
    def sc(pats: Seq[String], s: String, r: String = "#"): String =
      AhoCorasick.build(pats)
        .scrub(UTF8String.fromString(s), r.getBytes("UTF-8")).toString
    // Self-overlap chain collapses to ONE replacement.
    assert(sc(Seq("aa"), "aaaa") === "#")
    // Adjacent matches merge: runs are maximal COVERED-byte runs.
    assert(sc(Seq("bad"), "badbad") === "#")
    // Nested/suffix matches union ("she" ⊃ "he").
    assert(sc(Seq("she", "he"), "ushers") === "u#rs")
    // A long pattern reaching back over already-closed intervals
    // cascades the merge.
    assert(sc(Seq("bc", "de", "abcdef"), "xabcdefy") === "x#y")
    assert(sc(Seq("zz"), "no hits here") === "no hits here")
    // Multi-byte replacement.
    assert(sc(Seq("aa"), "baaab", "[X]") === "b[X]b")
  }

  test("scrubAudit closes the loop: measured hits_after is zero") {
    val docs = Seq(
      (1L, "s1", "bad aaa bad"),   // bad:2 runs, aa:overlap run -> 3 runs
      (2L, "s1", "clean text"),
      (3L, "s2", "aaaa")).toDF("doc_id", "source", "text")
    val got = Blocklist.scrubAudit(docs, "source", "text",
        Seq("bad", "aa"))
      .orderBy("source")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    // doc1: matches bad@0, aa@4, aa@5, bad@8 -> hits 4; runs: [0,3),
    // [4,7), [8,11) -> 3 runs, 9 chars covered.
    // doc3: "aaaa" -> 3 overlapping hits, 1 run, 4 chars.
    assert(got === Seq(
      ("s1", 1L, 4L, 3L, 9L, 0L),
      ("s2", 1L, 3L, 1L, 4L, 0L)))
  }

  test("clean plans as a narrow filter — no exchange, no join") {
    val docs = Seq((1L, "x")).toDF("doc_id", "text")
    val plan = Blocklist.clean(docs, "text", Seq("bad", "worse"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Join"), plan)
  }

  test("null text: clean keeps it, retention never flags it — gate and audit agree") {
    // The r14 advice finding: under ANSI, size(null) <= 0 is null, so
    // an implicit filter silently DROPPED null-text rows while
    // retentionBySource counted them as retained. The explicit rule:
    // null text has no hits, both surfaces keep it.
    val docs = Seq(
      (1L, "s1", "clean text"),
      (2L, "s1", null),
      (3L, "s2", "bad stuff"),
      (4L, "s2", null)).toDF("doc_id", "source", "text")
    val kept = Blocklist.clean(docs, "text", Seq("bad"))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept === Seq(1L, 2L, 4L), "null text must survive the gate")
    val ret = Blocklist.retentionBySource(docs, "source", "text",
        Seq("bad"))
      .orderBy("source")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(ret === Seq(("s1", 2L, 0L, 1.0), ("s2", 2L, 1L, 0.5)))
    // Agreement is structural: per source, retained == clean-kept.
    val keptBySource = Blocklist.clean(docs, "text", Seq("bad"))
      .groupBy("source").count()
      .as[(String, Long)].collect().toMap
    ret.foreach { case (src, n, flagged, _) =>
      assert(keptBySource.getOrElse(src, 0L) === n - flagged)
    }
  }
}
