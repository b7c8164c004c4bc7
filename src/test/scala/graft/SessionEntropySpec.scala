package graft

import graft.core.Graft
import graft.ops.{Behavior, Sessionize, Stats}
import org.apache.spark.sql.functions._

/** Cross-implementation and fixture checks for session_window parity,
  * approx MAD, and behavioral entropy.
  */
class SessionEntropySpec extends SparkSpec {
  import spark.implicits._

  test("native session_window agrees with gapSessions on sf0.001") {
    val ev = Graft.table(spark, "/root/testdata/sf0.001", "events")
    val native = ev.groupBy(col("user_id"),
        session_window(col("ts").cast("timestamp"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"),
        expr("unix_micros(session_window.start)").as("s"), col("n"))
    val handRolled = Sessionize.gapSessions(ev, Seq("user_id"), "ts",
        "event_id", gapUs = 1800000000L)
      .withColumn("tu", expr("unix_micros(cast(ts as timestamp))"))
      .groupBy("user_id", "session_id")
      .agg(min("tu").as("s"), count(lit(1)).as("n"))
      .select("user_id", "s", "n")
    assert(native.count() === handRolled.count())
    assert(native.except(handRolled).isEmpty &&
      handRolled.except(native).isEmpty,
      "the two session assemblies must produce identical sessions")
  }

  test("sketch MAD lands within one bucket width of the exact MAD") {
    val docs = Graft.table(spark, "/root/testdata/sf0.001", "documents")
      .where(col("n_chars").isNotNull)
    val medA = Stats.histPercentiles(docs, "lang", "n_chars",
        0.0, 1024.0, 256, Seq(0.5))
      .select(col("lang"), col("est").as("med_est"))
    val dev = docs.join(broadcast(medA), "lang")
      .withColumn("ad", abs(col("n_chars").cast("double") -
        col("med_est")))
    val madA = Stats.histPercentiles(dev, "lang", "ad",
        0.0, 1024.0, 256, Seq(0.5))
      .select(col("lang"), col("est").as("mad_est"))
    val medEx = docs.groupBy("lang")
      .agg(expr("percentile(n_chars, 0.5)").as("mx"))
    val madEx = docs.join(broadcast(medEx), "lang")
      .withColumn("ad2", abs(col("n_chars").cast("double") - col("mx")))
      .groupBy("lang").agg(expr("percentile(ad2, 0.5)").as("madx"))
    val diffs = madA.join(madEx, "lang")
      .select(abs(col("mad_est") - col("madx")))
      .as[Double].collect()
    // Two stacked sketches: ≤ 2 bucket widths (4.0 each) of error.
    assert(diffs.forall(_ <= 8.0), s"sketch MAD error bound: ${diffs.toSeq}")
  }

  test("entityEntropy: uniform mix is 1.0 normalized, constant is 0") {
    val ev = Seq((1L, "a"), (1L, "b"), (1L, "c"), (1L, "d"),
      (2L, "a"), (2L, "a"), (3L, "a"), (3L, "a"), (3L, "b"))
      .toDF("e", "t")
    val r = Behavior.entityEntropy(ev, "e", "t")
      .orderBy("entity")
      .select("entity", "n_events", "n_types", "entropy_nats",
        "entropy_norm")
      .as[(Long, Long, Long, Double, Option[Double])].collect().toSeq
    // e1 uniform over 4 → H = ln 4 = 1.3863, norm 1.0; e2 constant →
    // H 0, norm null; e3: H(1/3, 2/3) = 0.6365, norm 0.9183.
    assert(r === Seq(
      (1L, 4L, 4L, 1.3863, Some(1.0)),
      (2L, 2L, 1L, 0.0, None),
      (3L, 3L, 2L, 0.6365, Some(0.9183))))
  }
}
