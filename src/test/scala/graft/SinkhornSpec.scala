package graft

import graft.ops.Drift
import org.apache.spark.sql.functions.col

/** Entropic OT against a plain-Scala Sinkhorn reference. */
class SinkhornSpec extends SparkSpec {
  import spark.implicits._

  /** Reference Sinkhorn: same binning, kernel, update order, and
    * final cost as the op, in straight loops.
    */
  private def reference(
      vals: Seq[(String, Double)], lo: Double, hi: Double, nbins: Int,
      eps: Double, iters: Int): Map[String, Double] = {
    val w = (hi - lo) / nbins
    def bin(v: Double): Int =
      math.min(math.max(math.floor((v - lo) / w).toInt, 0), nbins - 1)
    val byG = vals.groupBy(_._1)
    val total = vals.size.toDouble
    val q = Array.tabulate(nbins)(j =>
      vals.count(x => bin(x._2) == j) / total)
    val k = Array.tabulate(nbins, nbins)((i, j) =>
      math.exp(-(math.abs(i - j).toDouble / (nbins - 1)) / eps))
    val c = Array.tabulate(nbins, nbins)((i, j) =>
      math.abs(i - j).toDouble / (nbins - 1))
    byG.map { case (g, xs) =>
      val p = Array.tabulate(nbins)(i =>
        xs.count(x => bin(x._2) == i) / xs.size.toDouble)
      var v = Array.fill(nbins)(1.0)
      def u(vc: Array[Double]): Array[Double] = Array.tabulate(nbins) {
        i =>
          val s = (0 until nbins).map(j => k(i)(j) * vc(j)).sum
          if (p(i) > 0) p(i) / s else 0.0
      }
      for (_ <- 1 to iters) {
        val uu = u(v)
        v = Array.tabulate(nbins) { j =>
          val s2 = (0 until nbins).map(i => k(i)(j) * uu(i)).sum
          if (q(j) > 0) q(j) / s2 else 0.0
        }
      }
      val uf = u(v)
      g -> (for (i <- 0 until nbins; j <- 0 until nbins)
        yield uf(i) * k(i)(j) * v(j) * c(i)(j)).sum
    }
  }

  test("sinkhornToReference matches the straight-loop reference") {
    val vals = Seq.tabulate(200) { n =>
      val g = if (n % 2 == 0) "near" else "far"
      val v = if (g == "near") 100.0 + (n % 7) * 30.0
              else 700.0 + (n % 5) * 40.0
      (g, v)
    }
    val got = Drift.sinkhornToReference(
        vals.toDF("source", "x"), "source", "x",
        lo = 0.0, hi = 1024.0, nbins = 16, eps = 0.1, iters = 8)
      .select("source", "ot_cost").as[(String, Double)]
      .collect().toMap
    val want = reference(vals, 0.0, 1024.0, 16, 0.1, 8)
    assert(got.keySet === want.keySet)
    got.foreach { case (g, cost) =>
      assert(math.abs(cost - want(g)) < 1e-6,
        s"$g: got $cost want ${want(g)}")
    }
    // Both groups sit away from the pooled reference, and the pooled
    // mix splits them evenly, so the two costs are comparable and
    // strictly positive.
    assert(got.values.forall(_ > 0.0))
  }

  test("a group matching the reference scores near zero; distance grows with shift") {
    // g0 IS (half of) every distribution: three identical groups make
    // the reference equal each group's own distribution -> entropic
    // cost is the same small smoothing floor for all three.
    val same = (1 to 300).map(n => (s"g${n % 3}", (n % 10) * 100.0))
    val gotSame = Drift.sinkhornToReference(
        same.toDF("source", "x"), "source", "x",
        0.0, 1024.0, 16, eps = 0.02, iters = 8)
      .select("source", "ot_cost").as[(String, Double)]
      .collect().toMap
    val costs = gotSame.values.toSeq
    assert(costs.max - costs.min < 1e-9,
      s"identical groups must tie: $gotSame")
    assert(costs.head < 0.02,
      s"self-distance is only the entropic floor: $gotSame")
    // A two-group corpus where the groups sit k and 3k bins from the
    // pooled mean: the farther group pays more transport.
    val shifted = (1 to 200).map { n =>
      if (n % 4 == 0) ("far", 960.0) else ("near", 320.0)
    }
    val gotShift = Drift.sinkhornToReference(
        shifted.toDF("source", "x"), "source", "x",
        0.0, 1024.0, 16, eps = 0.02, iters = 8)
      .select("source", "ot_cost").as[(String, Double)]
      .collect().toMap
    assert(gotShift("far") > gotShift("near"),
      s"farther group pays more: $gotShift")
  }

  /** Straight-loop IBP barycenter, same updates as the op. */
  private def baryReference(
      vals: Seq[(String, Double)], lo: Double, hi: Double, nbins: Int,
      eps: Double, iters: Int): Array[Double] = {
    val w = (hi - lo) / nbins
    def bin(v: Double): Int =
      math.min(math.max(math.floor((v - lo) / w).toInt, 0), nbins - 1)
    val k = Array.tabulate(nbins, nbins) { (i, j) =>
      val c = math.abs(i - j).toDouble / (nbins - 1)
      math.exp(-c * c / eps)
    }
    val byG = vals.groupBy(_._1).toSeq.sortBy(_._1)
    val ps = byG.map { case (_, xs) =>
      Array.tabulate(nbins)(i => xs.count(x => bin(x._2) == i)
        / xs.size.toDouble)
    }
    val vs = Array.fill(ps.size)(Array.fill(nbins)(1.0))
    var b = Array.fill(nbins)(0.0)
    for (_ <- 1 to iters) {
      val kts = ps.indices.map { gi =>
        val u = Array.tabulate(nbins) { i =>
          val s = (0 until nbins).map(j => k(i)(j) * vs(gi)(j)).sum
          if (ps(gi)(i) > 0) ps(gi)(i) / s else 0.0
        }
        Array.tabulate(nbins)(j => (0 until nbins).map(i => k(i)(j) * u(i)).sum)
      }
      b = Array.tabulate(nbins) { j =>
        math.exp(ps.indices.map(gi =>
          math.log(kts(gi)(j) * vs(gi)(j))).sum / ps.size)
      }
      ps.indices.foreach { gi =>
        (0 until nbins).foreach(j => vs(gi)(j) = b(j) / kts(gi)(j))
      }
    }
    b
  }

  test("sinkhornBarycenter matches the IBP reference and interpolates, not mixes") {
    // Two point masses at bins 2 and 12: the W1 barycenter is a point
    // near the MIDPOINT bin 7 — the pooled average is bimodal at 2 and
    // 12. Geometric interpolation vs mixture is the whole point.
    val vals = (1 to 200).map { n =>
      if (n % 2 == 0) ("a", 2 * 64.0 + 10) else ("z", 12 * 64.0 + 10)
    }
    val got = Drift.sinkhornBarycenter(
        vals.toDF("source", "x"), "source", "x",
        0.0, 1024.0, 16, eps = 0.05, iters = 10)
      .orderBy("b")
      .select("b", "bary", "pooled")
      .as[(Long, Double, Double)].collect()
    val want = baryReference(vals, 0.0, 1024.0, 16, 0.05, 10)
    got.foreach { case (b, bary, _) =>
      assert(math.abs(bary - want(b.toInt)) < 1e-6,
        s"bin $b: got $bary want ${want(b.toInt)}")
    }
    val baryMode = got.maxBy(_._2)._1
    assert(baryMode >= 6L && baryMode <= 8L,
      s"barycenter of deltas at 2 and 12 peaks near 7: mode=$baryMode")
    // The pooled histogram is bimodal at exactly 2 and 12 with zero
    // mass at the barycenter's mode.
    assert(got.filter(r => r._1 == 2L || r._1 == 12L)
      .forall(_._3 === 0.5))
    assert(got.find(_._1 == baryMode).get._3 === 0.0)
  }
}
