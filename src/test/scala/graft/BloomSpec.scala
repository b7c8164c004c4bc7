package graft

import org.apache.spark.sql.functions._

/** Bloom build/probe semantics: zero false negatives (the correctness
  * contract of semi-join pruning — a dropped true match is data loss),
  * cross-partition merge, and a bounded false-positive rate.
  */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  private val WORDS = 65
  private val K = 3

  test("no false negatives across partitions; fp rate stays bounded") {
    val keys = (1L to 500L).map(i => s"key$i")
    val df = keys.toDF("k").repartition(11)
    val bloom = df.agg(call_function("graft_bloom",
      col("k"), lit(WORDS), lit(K)).as("bloom"))
    val members = df.crossJoin(broadcast(bloom))
      .withColumn("hit",
        call_function("graft_bloom_contains", col("bloom"), col("k"), lit(K)))
    assert(members.filter(!col("hit")).isEmpty,
      "every inserted key must probe true")
    val probes = (1L to 2000L).map(i => s"absent$i").toDF("k")
      .crossJoin(broadcast(bloom))
      .withColumn("hit",
        call_function("graft_bloom_contains", col("bloom"), col("k"), lit(K)))
    val fp = probes.filter(col("hit")).count()
    // load = 500·3/4095 ≈ 0.37 → fpr ≈ (1−e^−0.37)³ ≈ 2.9%; 2000
    // probes ⇒ ~59 expected. 4× headroom keeps the test non-flaky
    // while still catching a broken hash (which saturates to ~100%).
    assert(fp < 240, s"false-positive blowup: $fp of 2000")
    assert(fp > 0, "a 37%-loaded filter should show SOME false positive")
  }

  test("empty build side rejects everything; null key probes null") {
    val bloom = Seq.empty[String].toDF("k")
      .agg(call_function("graft_bloom", col("k"), lit(WORDS), lit(K))
        .as("bloom"))
    val got = Seq(Some("x"), None).toDF("k")
      .crossJoin(broadcast(bloom))
      .select(call_function("graft_bloom_contains", col("bloom"), col("k"),
        lit(K)).as("hit"))
      .as[Option[Boolean]].collect().toSeq
    assert(got == Seq(Some(false), None))
  }
}
