package graft

import graft.ops.{Components, Isotonic}

class IsoBfsSpec extends SparkSpec {
  import spark.implicits._

  test("isotonic calibrate pools the violator pair exactly (PAV by minimax)") {
    // observed rates [0.8, 0.2, 0.6, 0.9] → PAV pools bins 1-2 to
    // (4+1)/(5+5) = 0.5; the rest are already monotone
    val bins = Seq((1, 4L, 5L), (2, 1L, 5L), (3, 3L, 5L), (4, 9L, 10L))
      .toDF("b", "succ", "n")
    val r = Isotonic.calibrate(bins, "b", "succ", "n")
      .orderBy("b").select("b", "trials", "rate", "iso_rate")
      .as[(Double, Long, Double, Double)].collect().toSeq
    assert(r === Seq((1.0, 5L, 0.8, 0.5), (2.0, 5L, 0.2, 0.5),
      (3.0, 5L, 0.6, 0.6), (4.0, 10L, 0.9, 0.9)))
    // the fitted sequence is non-decreasing by construction
    assert(r.map(_._4) == r.map(_._4).sorted)
  }

  test("bfsDistance: hop rings, bounded horizon, unreachable stays null") {
    val nodes = (1L to 5L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("id")
    val r = Components.bfsDistance(nodes, "id", edges, "src", "dst",
        seeds, maxHops = 2)
      .collect().map(row => row.getLong(0) ->
        (if (row.isNullAt(1)) -1 else row.getInt(1))).toMap
    // node 4 is 3 hops (beyond horizon), node 5 disconnected → null
    assert(r === Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> -1, 5L -> -1))
  }
}
