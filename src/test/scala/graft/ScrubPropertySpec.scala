package graft

import graft.core.Graft
import graft.ops.{Homoglyph, Pii}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Structural invariants of the round-12 scrubbing tier: PII
  * redaction is CLOSED (a redacted text re-scans clean) over
  * arbitrary PII-bearing compositions, and the homoglyph skeleton is
  * idempotent and spoof-invariant over arbitrary confusable
  * substitutions — the properties that make each op a safe release
  * gate rather than a best-effort filter.
  */
object ScrubPropertySpec extends Properties("Scrub") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10) // each trial runs Spark jobs — keep it tight

  private lazy val spark = Graft.session("graft-scrub-props")
  import spark.implicits._

  private val word: Gen[String] =
    Gen.chooseNum(1, 8).flatMap(n => Gen.stringOfN(n, Gen.alphaLowerChar))

  private val piiBit: Gen[String] = Gen.oneOf(
    for { u <- word; d <- word } yield s"$u@$d.com",
    Gen.chooseNum(1000000L, 999999999999L).map(n => s"+49$n"),
    for { a <- Gen.chooseNum(0, 255); b <- Gen.chooseNum(0, 255) }
      yield s"10.$a.$b.1",
    Gen.chooseNum(0L, 999999999L).map(n => f"4111$n%012d"))

  private val doc: Gen[String] = for {
    words <- Gen.listOfN(6, word)
    pii <- Gen.listOf(piiBit).map(_.take(4))
    mixed <- Gen.const((words ++ pii).mkString(" "))
  } yield mixed

  property("redaction is closed: a redacted text re-scans clean") =
    Prop.forAll(Gen.nonEmptyListOf(doc).map(_.take(5))) { texts =>
      val df = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val redacted = Pii.redact(df, "text")
        .select(col("doc_id"), col("redacted").as("text"))
      Pii.scan(redacted, "doc_id", "text")
        .agg(sum(when(col("has_pii"), 1).otherwise(0)))
        .head().getLong(0) == 0L
    }

  private val confusable: Gen[String] = for {
    ws <- Gen.listOfN(5, word)
    base <- Gen.const(ws.mkString(" "))
  } yield base

  property("skeleton is idempotent and invariant under spoofing") =
    Prop.forAll(Gen.nonEmptyListOf(confusable).map(_.take(5))) { texts =>
      val df = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val spoofed = df.select(col("doc_id"),
        concat(translate(col("text"), "aeopcxsiyj", "аеорсхѕіуј"),
          lit("\u200B")).as("text"))
      val sk = df.select(col("doc_id"),
        Homoglyph.skeleton(col("text")).as("s"))
      val sk2 = df.select(col("doc_id"),
        Homoglyph.skeleton(Homoglyph.skeleton(col("text"))).as("s"))
      val skSpoof = spoofed.select(col("doc_id"),
        Homoglyph.skeleton(col("text")).as("s"))
      def m(d: org.apache.spark.sql.DataFrame) =
        d.as[(Long, String)].collect().toMap
      m(sk) == m(sk2) && m(sk) == m(skSpoof)
    }
}
