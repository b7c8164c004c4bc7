package graft

import graft.ops.{Homoglyph, Multimodal}
import graft.queries.MediaFixtures
import org.apache.spark.sql.functions._

class HomoglyphSpec extends SparkSpec {
  import spark.implicits._

  test("skeleton folds confusables, case, and invisibles to one form") {
    // 'раураl' is all-Cyrillic spoof of 'paypal'; ZWSP threaded through
    val df = Seq(
      (1L, "paypal login"),
      (2L, "раураl login"),
      (3L, "PAYPAL​ login"),
      (4L, "different text"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), Homoglyph.skeleton(col("text")).as("s"))
    val m = df.as[(Long, String)].collect().toMap
    assert(m(1L) == "paypal login" && m(2L) == "paypal login" &&
      m(3L) == "paypal login" && m(4L) == "different text")
  }

  test("dupGroups reports spoof groups only") {
    val docs = Seq(
      (1L, "hello world"), (2L, "һello world"), // leading Cyrillic һ? not mapped — distinct
      (3L, "са t"), (4L, "ca t"), (5L, "unique"))
      .toDF("doc_id", "text")
    val g = Homoglyph.dupGroups(docs, "doc_id", "text")
      .select("n", "min_id", "max_id")
      .as[(Long, Long, Long)].collect().toSeq
    // only (3,4) fold together: с→c, а→a; һ (U+04BB) is deliberately
    // NOT in the high-precision map
    assert(g === Seq((2L, 3L, 4L)))
  }

  test("wavPeriodicity finds the square-wave period exactly") {
    val media = Seq(0L, 1L, 5L, 11L).map(id =>
        (id, MediaFixtures.wavBytes(id, 64), "audio"))
      .toDF("id", "bytes", "media_type")
    val r = Multimodal.wavPeriodicity(spark, media, maxLag = 16)
      .select("id", "kind", "best_lag", "periodicity")
      .as[(Long, String, Int, Double)].collect()
      .map(x => x._1 -> x).toMap
    // period = 4 + 2*(id%6): id 0 → 4, id 1 → 6, id 5 → 14, id 11 → 14
    assert(r(0L)._3 == 4 && r(1L)._3 == 6 && r(5L)._3 == 14 &&
      r(11L)._3 == 14)
    // a pure periodic square wave aligns perfectly at lag P, so the
    // normalized peak is exactly (n − P)/n (the windowed term count)
    assert(r.values.forall(x => x._2 == "wav"))
    assert(r(0L)._4 == (64.0 - 4) / 64 && r(5L)._4 == 0.7813)
    // junk bytes fall to 'other'
    val junk = Seq((9L, "not audio".getBytes("UTF-8"), "audio"))
      .toDF("id", "bytes", "media_type")
    assert(Multimodal.wavPeriodicity(spark, junk)
      .select("kind").as[String].head() == "other")
  }
}
