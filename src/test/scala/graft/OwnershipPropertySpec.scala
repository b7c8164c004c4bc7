package graft

import graft.core.Graft
import graft.ops.Ownership
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

/** SURVEY §5 property suites (ScalaCheck): capacity conservation and
  * share-partition invariants of the G4 ownership split over GENERATED
  * owner strings, not hand-picked cases.
  */
object OwnershipPropertySpec extends Properties("Ownership") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(15) // each trial runs a Spark job — keep it tight

  private lazy val spark = Graft.session("graft-props")
  import spark.implicits._

  private val companyGen: Gen[String] =
    Gen.choose(1, 3).flatMap(n =>
      Gen.listOfN(n, Gen.alphaUpperChar.map(_.toString)).map(_.mkString))

  // An owner token either carries an integer share or none.
  private val tokenGen: Gen[(String, Option[Int])] = for {
    name <- companyGen
    pct <- Gen.option(Gen.choose(1, 99))
  } yield (pct.fold(name)(p => s"$name [$p%]"), pct)

  private val rowGen: Gen[(List[(String, Option[Int])], Double)] = for {
    n <- Gen.choose(1, 4)
    toks <- Gen.listOfN(n, tokenGen)
    cap <- Gen.choose(1, 10000).map(_.toDouble)
  } yield (toks, cap)

  property("equalShareConservesCapacityWhenNoShares") =
    Prop.forAll(rowGen) { case (toks, cap) =>
      toks.exists(_._2.nonEmpty) || {
        val df = Seq(("u1", toks.map(_._1).mkString("; "), cap))
          .toDF("unit", "Owner", "cap")
        val total = Ownership.split("Owner", "cap", Ownership.EqualShareDefault)(df)
          .agg(sum("Capacity_allocated")).collect().head.getDouble(0)
        math.abs(total - cap) < 1e-6 * math.max(1.0, cap)
      }
    }

  property("strictAllocatesCapTimesShareAndKeepsEveryToken") =
    Prop.forAll(rowGen) { case (toks, cap) =>
      val df = Seq(("u1", toks.map(_._1).mkString("; "), cap))
        .toDF("unit", "Owner", "cap")
      val out = Ownership.split("Owner", "cap", Ownership.Strict)(df)
        .select("Capacity_allocated").collect().map(r =>
          if (r.isNullAt(0)) None else Some(r.getDouble(0)))
      out.length == toks.length && out.zip(toks).forall {
        case (Some(alloc), (_, Some(p))) =>
          math.abs(alloc - cap * p / 100.0) < 1e-9 * math.max(1.0, cap)
        case (None, (_, None)) => true // share-less token → null-alloc quirk
        case _ => false
      }
    }

  private val partitionedGen: Gen[(List[Int], Double)] = for {
    n <- Gen.choose(2, 4)
    cuts <- Gen.listOfN(n - 1, Gen.choose(1, 99)).map(_.sorted.distinct)
    cap <- Gen.choose(1, 1000).map(_.toDouble)
  } yield ((0 +: cuts :+ 100).sliding(2).map(w => w(1) - w(0)).toList.filter(_ > 0), cap)

  property("explicitSharesPartitioning100ConserveCapacity") =
    Prop.forAll(partitionedGen) { case (shares, cap) =>
      val owner = shares.zipWithIndex
        .map { case (p, i) => s"C$i [$p%]" }.mkString("; ")
      val df = Seq(("u1", owner, cap)).toDF("unit", "Owner", "cap")
      val total = Ownership.split("Owner", "cap", Ownership.EqualShareDefault)(df)
        .agg(sum("Capacity_allocated")).collect().head.getDouble(0)
      math.abs(total - cap) < 1e-6 * cap
    }
}
