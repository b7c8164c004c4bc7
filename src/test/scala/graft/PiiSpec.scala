package graft

import graft.ops.Pii
import org.apache.spark.sql.functions._

class PiiSpec extends SparkSpec {
  import spark.implicits._

  test("scan: detects each class; Luhn separates valid from failed cards") {
    val docs = Seq(
      (1L, "write to alice.smith+spam@mail.example.org today"),
      (2L, "call +4915123456789 or visit 192.168.1.254 now"),
      // 4532015112830366 is Luhn-valid; flipping the check digit fails
      (3L, "pay 4532015112830366 not 4532015112830367"),
      (4L, "octets above 255 like 999.1.1.1 are not addresses"),
      (5L, "plain text, digits 123456 too short for a card"))
      .toDF("doc_id", "text")
    val r = Pii.scan(docs, "doc_id", "text").orderBy("doc_id")
      .select("doc_id", "n_emails", "n_phones", "n_ipv4",
        "n_cards_valid", "n_cards_invalid", "has_pii")
      .as[(Long, Int, Int, Int, Int, Int, Boolean)].collect().toSeq
    assert(r === Seq(
      (1L, 1, 0, 0, 0, 0, true),
      // the 13-digit phone body also trips the conservative card
      // CANDIDATE channel (and fails Luhn) — deliberate overlap: a
      // digit-run detector cannot know the digits belong to a phone,
      // and a release scrubber over-counts rather than misses
      (2L, 0, 1, 1, 0, 1, true),
      (3L, 0, 0, 0, 1, 1, true),
      (4L, 0, 0, 0, 0, 0, false),
      (5L, 0, 0, 0, 0, 0, false)))
  }

  test("redact masks every class (card masking is conservative) and is idempotent") {
    val docs = Seq((1L,
      "mail a@b.co, ip 10.0.0.1, tel +12025550123, card 4532015112830367"))
      .toDF("doc_id", "text")
    val red = Pii.redact(docs, "text").select("redacted").as[String].head()
    assert(red ==
      "mail [EMAIL], ip [IP], tel [PHONE], card [CARD]")
    // Luhn-INVALID card still masked; re-scan of the redacted text is clean
    val rescan = Pii.scan(
      Seq((1L, red)).toDF("doc_id", "text"), "doc_id", "text")
      .select("has_pii").as[Boolean].head()
    assert(!rescan)
  }

  test("sourceReport aggregates rates per source") {
    val docs = Seq(
      (1L, "a", "mail x@y.io"), (2L, "a", "clean"),
      (3L, "b", "clean"), (4L, "b", "clean"))
      .toDF("doc_id", "source", "text")
    val rep = Pii.sourceReport(
        Pii.scan(docs, "doc_id", "text"), docs, "doc_id", "source")
      .orderBy("source")
      .select("source", "n_docs", "n_docs_with_pii", "pii_rate", "emails")
      .as[(String, Long, Long, Double, Long)].collect().toSeq
    assert(rep === Seq(("a", 2L, 1L, 0.5, 1L), ("b", 2L, 0L, 0.0, 0L)))
  }
}
