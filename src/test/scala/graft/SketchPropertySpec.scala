package graft

import graft.core.Graft
import graft.functions.SketchKernels
import graft.ops.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property suites for the native sketch kernels over RANDOM texts —
  * the fixture-based parity suite (SketchKernelSpec) pins known cases;
  * these pin the structural invariants on arbitrary input.
  */
object SketchPropertySpec extends Properties("SketchKernels") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(15) // each trial runs a Spark job — keep it tight

  private lazy val spark = Graft.session("graft-sketch-props")
  import spark.implicits._

  private val word: Gen[String] =
    Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
  private val words: Gen[List[String]] = Gen.listOf(word)

  property("minhash: k values in [0,P31), order/duplicate-invariant") =
    Prop.forAll(Gen.nonEmptyListOf(word), Gen.choose(0L, Long.MaxValue)) { (ws, seed) =>
      val t1 = ws.mkString(" ")
      val t2 = new scala.util.Random(seed).shuffle(ws ++ ws.headOption).mkString(" ")
      val rows = Seq(t1, t2).toDF("text")
        .select(Dedup.minhashSignature(col("text"), 12).as("sig")).collect()
      val s1 = rows(0).getSeq[Long](0)
      val s2 = rows(1).getSeq[Long](0)
      s1.length == 12 &&
        s1.forall(v => v >= 0 && v < SketchKernels.P31) &&
        s1 == s2 // set semantics: order & duplicates invisible
    }

  property("simhash: permutation-invariant, in [0,2^60), null iff no tokens") =
    Prop.forAll(words, Gen.choose(0L, Long.MaxValue)) { (ws, seed) =>
      val t1 = ws.mkString(" ")
      val t2 = new scala.util.Random(seed).shuffle(ws).mkString(" ")
      val rows = Seq(t1, t2).toDF("text")
        .select(Dedup.simhash(col("text"), 60).as("s")).collect()
      if (ws.isEmpty) rows.forall(_.isNullAt(0))
      else rows(0).getLong(0) == rows(1).getLong(0) &&
        rows(0).getLong(0) >= 0 && rows(0).getLong(0) < (1L << 60)
    }

  property("shingles == sorted distinct n-token sliding windows") =
    Prop.forAll(words, Gen.choose(2, 4)) { (ws, n) =>
      val t = ws.mkString(" ")
      val sh = Seq(t).toDF("text")
        .select(Dedup.shingles(col("text"), n).as("sh"))
        .collect().head.getSeq[String](0)
      val expected =
        if (ws.length < n) Seq.empty
        else ws.sliding(n).map(_.mkString(" ")).toSeq.distinct.sorted
      sh == expected
    }

  property("overlap: symmetric and exact vs scala set intersection") =
    Prop.forAll(words, words) { (wa, wb) =>
      val a = wa.distinct.sorted
      val b = wb.distinct.sorted
      val rows = Seq((a, b), (b, a)).toDF("x", "y")
        .select(call_function("graft_overlap", col("x"), col("y")).as("o")).collect()
      rows(0).getLong(0) == rows(1).getLong(0) &&
        rows(0).getLong(0) == a.toSet.intersect(b.toSet).size.toLong
    }

  property("tokens ≡ split-on-spaces with empties dropped") =
    Prop.forAll(Gen.listOf(Gen.oneOf(word, Gen.const(""), Gen.const(" ")))) { parts =>
      val t = parts.mkString(" ")
      val out = Seq(t).toDF("text")
        .select(TextAnalysis.tokens(col("text")).as("tk"))
        .collect().head.getSeq[String](0)
      out == t.split(" +").filter(_.nonEmpty).toSeq
    }
}
