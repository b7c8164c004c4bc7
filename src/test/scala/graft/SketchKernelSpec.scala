package graft

import graft.functions.Hashing._
import graft.ops.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._

/** Pins the native sketch kernels (graft_minhash / graft_simhash) to
  * the higher-order-function formulations they replaced: identical
  * output on every row is the invariant that keeps the DuckDB oracles
  * valid.
  */
class SketchKernelSpec extends SparkSpec {
  import spark.implicits._

  private def texts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "pack my box with five dozen liquor jugs",
    "single",
    "repeated repeated repeated token token",
    "  ", // whitespace-only
    "punctuated, text; with [brackets] and 100% numbers"
  ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")

  test("graft_minhash ≡ HOF aggregate/zip_with fold (and NULL on empty)") {
    val k = 16
    val toks = array_distinct(TextAnalysis.tokens(col("text")))
    val hof = when(size(toks) > 0,
      aggregate(toks, array_repeat(lit(Long.MaxValue), k),
        (acc, t) => zip_with(acc, universalHashes(t, k), (m, h) => least(m, h))))
    val rows = texts.select(
      Dedup.minhashSignature(col("text"), k).as("native"), hof.as("ref")).collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
    assert(rows.count(_.isNullAt(0)) == 1) // exactly the whitespace-only doc
  }

  test("graft_shingles ≡ sorted HOF shingle construction (empty below n tokens)") {
    val n = 3
    val toks = TextAnalysis.tokens(col("text"))
    val hof = array_sort(
      when(size(toks) >= n,
        array_distinct(transform(sequence(lit(1), size(toks) - (n - 1)),
          i => array_join(slice(toks, i, lit(n)), " "))))
        .otherwise(array().cast("array<string>")))
    val rows = texts.select(
      Dedup.shingles(col("text"), n).as("native"), hof.as("ref")).collect()
    rows.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1)))
    assert(rows.exists(_.getSeq[String](0).isEmpty)) // the 1-token + empty docs
  }

  test("graft_overlap ≡ size(array_intersect) on sorted distinct arrays") {
    val pairs = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d")),
      (Seq("a"), Seq("b")),
      (Seq[String](), Seq("a")),
      (Seq("x", "y", "z"), Seq("x", "y", "z"))
    ).toDF("a", "b")
    val rows = pairs.select(
      call_function("graft_overlap", col("a"), col("b")).as("native"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("ref")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("graft_simhash ≡ HOF vote fold") {
    val bits = 60
    val toksD = array_distinct(TextAnalysis.tokens(col("text")))
    val hashes = transform(toksD, t => portableHash(t))
    val votes = aggregate(hashes, array_repeat(lit(0L), bits),
      (acc, h) => zip_with(acc, sequence(lit(0), lit(bits - 1)),
        (v, b) => v +
          when(call_function("shiftright", h, b).bitwiseAND(1L) === 1L, 1L).otherwise(-1L)))
    val hof = aggregate(
      zip_with(votes, sequence(lit(0), lit(bits - 1)),
        (v, b) => when(v >= 0, call_function("shiftleft", lit(1L), b)).otherwise(lit(0L))),
      lit(0L), (a, x) => a + x)
    val rows = texts.select(
      Dedup.simhash(col("text"), bits).as("native"), hof.as("ref"),
      size(toksD).as("n")).collect()
    rows.foreach { r =>
      if (r.getInt(2) > 0) assert(r.getLong(0) == r.getLong(1))
      // empty token set: NULL, not the HOF's all-bits-set sentinel —
      // same contract as graft_minhash (and the guarded oracles)
      else assert(r.isNullAt(0))
    }
    assert(rows.count(_.isNullAt(0)) == 1) // the whitespace-only doc
  }
}
