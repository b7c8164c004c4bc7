package graft

import graft.ops.{Reconcile, Seasonal, ShardBalance, WeightedStats}
import org.apache.spark.sql.functions._

/** Reconciliation flag/conflict logic, weighted-median crossing, dow
  * mapping, and shard-audit invariants on hand cases.
  */
class ReconcileWeightedSpec extends SparkSpec {
  import spark.implicits._

  test("reconcile: presence patterns and null-safe conflicts") {
    val a = Seq((1L, "x"), (2L, "x"), (3L, null: String)).toDF("k", "f")
    val b = Seq((1L, "x"), (2L, "y"), (3L, null: String)).toDF("k", "f")
    val c = Seq((2L, "x"), (4L, "z")).toDF("k", "f")
    val out = Reconcile.threeWay(a, b, c, "k", Seq("f"))
      .collect().map(r => ((r.getBoolean(0), r.getBoolean(1),
        r.getBoolean(2)), (r.getLong(3), r.getLong(4)))).toMap
    // k=1: a,b agree (no c) → no conflict. k=2: a=x b=y c=x → b
    // fights both. k=3: both null = agreement. k=4: c only.
    assert(out((true, true, false)) == ((2L, 0L))) // k=1, k=3
    assert(out((true, true, true)) == ((1L, 1L))) // k=2
    assert(out((false, false, true)) == ((1L, 0L))) // k=4
  }

  test("weighted median: revenue-weighted crossing, tie-structural") {
    // v=1 w=10, v=2 w=10, v=3 w=100: half of W=120 is reached at v=3.
    val df = Seq(("g", 1L, 10L), ("g", 2L, 10L), ("g", 3L, 100L))
      .toDF("k", "v", "w")
    val r = WeightedStats.weightedQuantile(df, "k", "v", "w", 1L, 2L)
      .collect()(0)
    assert(r.getAs[Long]("total_weight") == 120L)
    assert(r.getAs[Long]("wquantile") == 3L)
    // Unweighted-median contrast would be 2.
  }

  test("dow: epoch day 0 is Thursday (ISO 4)") {
    val df = Seq(("g", 0L), ("g", 3L), ("g", 4L)).toDF("ty", "day")
    val dows = Seasonal.dowProfile(df, "ty", "day", 3L, 2L)
      .select("dow").as[Int].collect().toSeq.sorted
    // day 0 → Thu(4), day 3 → Sun(7), day 4 → Mon(1).
    assert(dows == Seq(1, 4, 7))
  }

  test("shard audit: counts conserved per strategy") {
    val df = (1 to 500).map(i => ("k" + (i % 37)).toString).toDF("k")
    val out = ShardBalance.audit(df, "k", shards = 4)
    val totals = out.groupBy("strategy").agg(
        sum("n_rows").as("r"), sum("n_keys").as("kk"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(totals("hash") == ((500L, 37L)))
    assert(totals("keyrange") == ((500L, 37L)))
  }

  test("indexSync: missing/orphaned split, multi-row index dedups to doc grain") {
    // Corpus 10..19; index holds 5..14 with DUPLICATE rows per doc
    // (generations) — dedup must not inflate counts.
    val corpus = (10L to 19L).toDF("doc_id")
    val index = ((5L to 14L) ++ (5L to 14L)).toDF("id")
    val r = Reconcile.indexSync(corpus, "doc_id", index, "id").head
    assert(r.getLong(0) == 10L && r.getLong(1) == 10L) // corpus, indexed
    assert(r.getLong(2) == 5L && r.getLong(3) == 5L)   // missing, orphaned
    assert(r.getLong(4) == 500000L)                    // sync_ppm
    // Fully synchronized → 1,000,000 and zero drift.
    val s = Reconcile.indexSync(corpus, "doc_id", corpus, "doc_id").head
    assert(s.getLong(2) == 0L && s.getLong(3) == 0L &&
      s.getLong(4) == 1000000L)
    // Empty corpus: guarded denominator, no division blow-up.
    val e = Reconcile.indexSync(corpus.limit(0), "doc_id", index, "id")
      .head
    assert(e.getLong(3) == 10L && e.getLong(4) == 0L)
  }
}
