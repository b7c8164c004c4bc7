package graft

import graft.ops.AsofJoin
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  // quotes: the right side (state history); orders: the left side
  private def quotes = Seq(
    ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 30L, 3.0),
    ("B", 15L, 9.0)
  ).toDF("sym", "qts", "px")

  private def orders = Seq(
    ("A", 5L, 100), // before any quote
    ("A", 10L, 101), // exactly at a quote: <= matches
    ("A", 25L, 102), // between quotes: latest earlier wins
    ("A", 99L, 103), // after all quotes
    ("B", 14L, 104), // key isolation: A's quotes invisible
    ("C", 50L, 105) // key with no right rows at all
  ).toDF("sym", "ots", "oid")

  private def backward = AsofJoin.join(orders, quotes, Seq("sym"),
    "ots", "qts", Seq("px"), matchedTsCol = Some("qts"))
    .collect().map(r => r.getAs[Int]("oid") ->
      (Option(r.getAs[Any]("qts")), Option(r.getAs[Any]("px")))).toMap

  test("backward as-of picks the greatest rightTs <= leftTs per key") {
    assert(backward(101) == (Some(10L), Some(1.0))) // inclusive at equality
    assert(backward(102) == (Some(20L), Some(2.0)))
    assert(backward(103) == (Some(30L), Some(3.0)))
    assert(backward(104) == (None, None)) // B's only quote is later
  }

  test("left rows with no eligible right row keep null payload") {
    assert(backward(100) == (None, None))
    assert(backward(105) == (None, None))
  }

  test("forward as-of picks the smallest rightTs >= leftTs") {
    val fwd = AsofJoin.join(orders, quotes, Seq("sym"),
      "ots", "qts", Seq("px"), direction = AsofJoin.Forward)
      .collect().map(r => r.getAs[Int]("oid") ->
        Option(r.getAs[Any]("px"))).toMap
    assert(fwd(100) == Some(1.0))
    assert(fwd(101) == Some(1.0)) // inclusive
    assert(fwd(102) == Some(3.0))
    assert(fwd(103) == None) // nothing after
    assert(fwd(104) == Some(9.0))
  }

  test("tolerance nulls out matches farther than the bound") {
    val tol = AsofJoin.join(orders, quotes, Seq("sym"),
      "ots", "qts", Seq("px"), tolerance = Some(lit(5)))
      .collect().map(r => r.getAs[Int]("oid") ->
        Option(r.getAs[Any]("px"))).toMap
    assert(tol(102) == Some(2.0)) // gap 5 <= 5
    assert(tol(103) == None) // gap 69 > 5: treated as unmatched
  }

  test("right-side ties on (key, ts) resolve to the greatest payload") {
    val dup = Seq(("A", 10L, 1.0), ("A", 10L, 7.0)).toDF("sym", "qts", "px")
    val one = Seq(("A", 12L, 1)).toDF("sym", "ots", "oid")
    val got = AsofJoin.join(one, dup, Seq("sym"), "ots", "qts", Seq("px"))
      .collect().head.getAs[Double]("px")
    assert(got == 7.0)
  }

  test("nullable payload attaches ONE whole right row — no cross-row stitch") {
    // The matched row (ts 20) has a null note; per-column carries would
    // resurrect ts-10's "x" next to ts-20's px. Whole-row semantics: both
    // payload cols come from ts 20.
    val hist = Seq(
      ("A", 10L, Option("x"), Option(1.0)),
      ("A", 20L, Option.empty[String], Option(2.0))
    ).toDF("sym", "qts", "note", "px")
    val one = Seq(("A", 25L, 1)).toDF("sym", "ots", "oid")
    val row = AsofJoin.join(one, hist, Seq("sym"), "ots", "qts",
      Seq("note", "px"), matchedTsCol = Some("qts")).collect().head
    assert(row.getAs[Long]("qts") == 20L)
    assert(row.isNullAt(row.fieldIndex("note")))
    assert(row.getAs[Double]("px") == 2.0)
  }

  test("an all-null-payload right row still counts as the match") {
    val hist = Seq(
      ("A", 10L, Option(1.0)), ("A", 20L, Option.empty[Double])
    ).toDF("sym", "qts", "px")
    val one = Seq(("A", 25L, 1)).toDF("sym", "ots", "oid")
    val row = AsofJoin.join(one, hist, Seq("sym"), "ots", "qts",
      Seq("px"), matchedTsCol = Some("qts")).collect().head
    assert(row.getAs[Long]("qts") == 20L) // matched ts is ts-20's, not ts-10's
    assert(row.isNullAt(row.fieldIndex("px")))
  }

  test("NULL keys never match, per SQL equality") {
    val q = Seq((Option("A"), 10L, 1.0), (Option.empty[String], 5L, 9.0))
      .toDF("sym", "qts", "px")
    val o = Seq((Option.empty[String], 10L, 1), (Option("A"), 12L, 2))
      .toDF("sym", "ots", "oid")
    val got = AsofJoin.join(o, q, Seq("sym"), "ots", "qts", Seq("px"))
      .collect().map(r => r.getAs[Int]("oid") -> Option(r.getAs[Any]("px"))).toMap
    assert(got(1) == None) // null-keyed left row: no match, row survives
    assert(got(2) == Some(1.0)) // null-keyed right row invisible to "A"
  }

  test("every left row survives exactly once (left-outer cardinality)") {
    val out = AsofJoin.join(orders, quotes, Seq("sym"), "ots", "qts", Seq("px"))
    assert(out.count() == orders.count())
    assert(out.columns.toSeq == Seq("sym", "ots", "oid", "px"))
  }

  test("plan is union + one window — no join node, no pair blow-up") {
    val plan = AsofJoin.join(orders, quotes, Seq("sym"), "ots", "qts", Seq("px"))
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("Union") && plan.contains("Window"))
    assert(!plan.toLowerCase.contains("join"))
  }
}
