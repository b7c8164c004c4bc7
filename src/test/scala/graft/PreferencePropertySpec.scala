package graft

import graft.core.Graft
import graft.ops.{Agreement, BradleyTerry, Mixing}
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property pins for the preference/planning tier: estimator
  * invariants that must hold for ANY input, not just the hand cases
  * in PreferenceOpsSpec. Generators stay small — the ops are exact
  * and the properties are about algebra, not volume.
  */
object PreferencePropertySpec extends Properties("PreferenceOps") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = Graft.session("graft-preference-props")
  import spark.implicits._

  private val labelGen = Gen.oneOf("a", "b", "c")

  property("cohenKappa bounded in [-1,1] and rater-symmetric") =
    Prop.forAll(Gen.listOfN(20, Gen.zip(labelGen, labelGen))) { rows =>
      val df = rows.toDF("ra", "rb")
      val k1 = Agreement.cohenKappa(df, "ra", "rb")
        .collect()(0).getAs[Double]("kappa")
      val k2 = Agreement.cohenKappa(df, "rb", "ra")
        .collect()(0).getAs[Double]("kappa")
      k1 >= -1.0 - 1e-9 && k1 <= 1.0 + 1e-9 && math.abs(k1 - k2) < 1e-9
    }

  property("bradleyTerry strengths sum to 1; relabeling permutes") =
    Prop.forAll(Gen.listOfN(12, Gen.zip(labelGen, labelGen))
      .map(_.filter(p => p._1 != p._2))
      .suchThat(_.size >= 2)) { pairs =>
      val df = pairs.map { case (w, l) => (w, l, 1L) }.toDF("w", "l", "n")
      val fit = BradleyTerry.fit(df, "w", "l", "n", iters = 6)
        .collect().map(r => r.getString(0) -> r.getAs[Double]("pi")).toMap
      def sw(s: String) = s match {
        case "a" => "b"; case "b" => "a"; case x => x
      }
      val df2 = pairs.map { case (w, l) => (sw(w), sw(l), 1L) }
        .toDF("w", "l", "n")
      val fit2 = BradleyTerry.fit(df2, "w", "l", "n", iters = 6)
        .collect().map(r => r.getString(0) -> r.getAs[Double]("pi")).toMap
      math.abs(fit.values.sum - 1.0) < 1e-3 &&
        fit.forall { case (item, pi) =>
          math.abs(fit2(sw(item)) - pi) < 1e-9
        }
    }

  property("temperaturePlan weights sum to 1; granted honors the cap") =
    Prop.forAll(Gen.listOfN(5, Gen.choose(1L, 100000L))) { tokens =>
      val df = tokens.zipWithIndex
        .map { case (t, i) => (s"s$i", t) }.toDF("src", "tokens")
      val plan = Mixing.temperaturePlan(df, "src", "tokens",
        alpha = 0.5, targetTokens = 50000L, maxEpochs = 2.0).collect()
      val wsum = plan.map(_.getAs[Double]("weight")).sum
      math.abs(wsum - 1.0) < 1e-4 && plan.forall { r =>
        val granted = r.getAs[Long]("granted_tokens")
        val toks = r.getAs[Long]("tokens")
        granted.toDouble / toks.toDouble <= 2.0 + 1e-9 &&
          r.getAs[Long]("shortfall_tokens") >= 0L
      }
    }

  property("fleissKappa invariant under rater-id permutation") =
    Prop.forAll(Gen.listOfN(8,
      Gen.zip(Gen.choose(1L, 4L), labelGen))) { base =>
      // One seed per item (duplicate items would collapse every panel
      // to a dropped 6-rating one and kappa would go 0/0-NaN on both
      // sides — vacuous); each surviving item gets exactly 3 ratings.
      val rows = base.distinctBy(_._1).flatMap { case (item, lab) =>
        Seq((item, 0, lab), (item, 1, "a"), (item, 2, lab))
      }
      val df1 = rows.toDF("item", "rater", "label")
      val df2 = rows.map { case (i, r, l) => (i, (r + 1) % 3, l) }
        .toDF("item", "rater", "label")
      val r1 = Agreement.fleissKappa(df1, "item", "rater", "label", 3)
        .collect()(0)
      val r2 = Agreement.fleissKappa(df2, "item", "rater", "label", 3)
        .collect()(0)
      r1.getAs[Double]("kappa") == r2.getAs[Double]("kappa") &&
        r1.getAs[Long]("n_items") == r2.getAs[Long]("n_items")
    }
}
