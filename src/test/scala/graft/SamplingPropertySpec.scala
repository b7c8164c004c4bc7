package graft

import graft.core.Graft
import graft.ops.Sampling
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Structural invariants of the deterministic hash split on arbitrary
  * keys and cut lists: exhaustive labelling, bucket range, and
  * stability under re-partitioning (the property a random sample()
  * does NOT have, and the whole reason Sampling exists).
  */
object SamplingPropertySpec extends Properties("Sampling") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10) // each trial runs Spark jobs — keep it tight

  private lazy val spark = Graft.session("graft-sampling-props")
  import spark.implicits._

  private val cutsGen: Gen[List[(String, Int)]] = for {
    n <- Gen.choose(1, 4)
    bounds <- Gen.pick(n - 1, 1 until 100)
  } yield (bounds.sorted.toList :+ 100).zipWithIndex
    .map { case (hi, i) => s"s$i" -> hi }

  property("split is exhaustive, in-range, and partitioning-invariant") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.choose(-10000L, 10000L)), cutsGen) {
      (keys, cuts) =>
        val names = cuts.map(_._1).toSet
        val a = keys.toDF("id").repartition(1)
          .select(col("id"), Sampling.splitLabel(col("id"), cuts).as("s"),
            Sampling.bucket(col("id")).as("b"))
          .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
        val b = keys.toDF("id").repartition(7)
          .select(col("id"), Sampling.splitLabel(col("id"), cuts).as("s"),
            Sampling.bucket(col("id")).as("b"))
          .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
        a == b &&
          a.forall { case (_, s, bk) => names(s) && bk >= 0 && bk < 100 } &&
          a.forall { case (_, s, bk) =>
            // the label really is the first cut whose bound exceeds the bucket
            s == cuts.find(_._2 > bk).get._1
          }
    }

  property("rendezvous: growing n→n+1 only ever moves keys TO the new shard") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.choose(-10000L, 10000L)),
      Gen.choose(1, 12)) { (keys, n) =>
      val rows = keys.toDF("id")
        .select(col("id"),
          Sampling.rendezvousShard(col("id"), n).as("a"),
          Sampling.rendezvousShard(col("id"), n + 1).as("b"))
        .collect().map(r => (r.getInt(1), r.getInt(2)))
      rows.forall { case (a, b) =>
        a >= 0 && a < n && b >= 0 && b <= n && (b == a || b == n)
      }
    }
}
