package graft

import graft.core.Graft
import graft.ops.Components
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Equivalence of the two distributed connected-components algorithms
  * with each other AND with a local union-find oracle, on random
  * graphs: hash-min (diameter-round) and large-star/small-star
  * (log²-round) must agree exactly — same node set, same min-id
  * labels — whatever the topology (cliques, chains, isolated nodes,
  * self-loops, duplicate edges).
  */
object ComponentsPropertySpec extends Properties("Components") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6) // each trial runs two iterative Spark loops

  private lazy val spark = Graft.session("graft-components-props")
  import spark.implicits._

  private val graphGen: Gen[(Int, List[(Long, Long)])] = for {
    n <- Gen.choose(2, 24)
    m <- Gen.choose(0, 30)
    edges <- Gen.listOfN(m, for {
      a <- Gen.choose(0L, n - 1L)
      b <- Gen.choose(0L, n - 1L)
    } yield (a, b))
  } yield (n, edges)

  private def unionFind(n: Int, edges: List[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) { parent(r) = parent(parent(r)); r = parent(r) }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // min-id canonical labels need a second pass after all unions
    (0 until n).map(i => i.toLong -> find(i).toLong).toMap
  }

  property("hash-min ≡ large/small-star ≡ local union-find") =
    Prop.forAll(graphGen) { case (n, edges) =>
      val nodes = (0L until n.toLong).toDF("id")
      val e = edges.toDF("a", "b")
      val expected = unionFind(n, edges)
      val hashMin = Components.connectedComponents(nodes, "id", e, "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val star = Components.connectedComponentsStar(nodes, "id", e, "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      Prop(hashMin == expected) :| s"hash-min $hashMin != $expected" &&
        Prop(star == expected) :| s"star $star != $expected"
    }
}
