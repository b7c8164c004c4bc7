package graft

import graft.ops.Encoding
import org.apache.spark.sql.functions.col

/** Mojibake detection and the two repair tiers. */
class EncodingSpec extends SparkSpec {
  import spark.implicits._

  private def corrupt(s: String): String =
    new String(s.getBytes("UTF-8"), "ISO-8859-1")

  test("repairRoundTrip inverts a UTF-8-as-Latin-1 mis-decode exactly") {
    val originals = Seq(
      "café déjà vu", "naïve año señor", "für Österreich? öl",
      "pura ascii stays put", "résumé… no wait, résumé")
    // The last one holds a 3-byte ellipsis (E2 80 A6): its corrupted
    // form fails the strict gate and must pass through UNCHANGED
    // rather than risk a malformed decode.
    val df = originals.map(s => (s, corrupt(s))).toDF("orig", "bad")
    val got = df.select(col("orig"),
        Encoding.repairRoundTrip(col("bad")).as("fixed"),
        col("bad")).as[(String, String, String)].collect()
    got.foreach { case (orig, fixed, bad) =>
      if (orig.contains("…")) assert(fixed === bad, "gate must refuse")
      else assert(fixed === orig, s"round trip must restore: $orig")
    }
  }

  test("repairRoundTrip leaves clean accented text alone") {
    // Already-correct text contains no Â/Ã leads, so the damage
    // precondition fails and nothing is touched.
    val clean = Seq("café déjà vu", "plain").toDF("s")
    val got = clean.select(Encoding.repairRoundTrip(col("s")).as("r"))
      .as[String].collect().toSeq
    assert(got === Seq("café déjà vu", "plain"))
  }

  test("signatureHits counts occurrences; repairCommon clears them") {
    val df = Seq(
      ("thÃ© Ã© twice", 2L),
      ("winâ€™1252 â€œquote", 2L),
      ("clean text", 0L),
      ("", 0L)).toDF("s", "want")
    val got = df.select(
        Encoding.signatureHits(col("s")).as("hits"),
        Encoding.signatureHits(Encoding.repairCommon(col("s")))
          .as("after"),
        col("want")).as[(Long, Long, Long)].collect()
    got.foreach { case (hits, after, want) =>
      assert(hits === want)
      assert(after === 0L, "repairCommon must clear every signature")
    }
  }

  test("repairCommon is idempotent") {
    val df = Seq("thÃ© â€™ Ã¼ber", "ok").toDF("s")
    val got = df.select(
        Encoding.repairCommon(col("s")).as("once"),
        Encoding.repairCommon(Encoding.repairCommon(col("s")))
          .as("twice")).as[(String, String)].collect()
    got.foreach { case (a, b) => assert(a === b) }
  }
}
