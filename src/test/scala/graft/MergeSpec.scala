package graft

import graft.ops.Merge
import org.apache.spark.sql.functions._

/** MERGE semantics pinned on a hand-built case: whole-row replacement
  * (update nulls WIN), flagged deletes (matched or not), unmatched
  * inserts, untouched rows pass through — and the whole batch is
  * idempotent (re-applying it to its own output changes nothing).
  */
class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def base = Seq(
    (1L, Some("a"), 10.0), (2L, Some("b"), 20.0), (3L, Some("c"), 30.0)
  ).toDF("k", "name", "v")

  private def changes = Seq(
    (2L, None: Option[String], 99.0, false), // update: null name must stick
    (3L, Some("c"), 30.0, true), // delete
    (4L, Some("d"), 40.0, false), // insert
    (99L, Some("zz"), 0.0, true) // delete of an absent key: no-op
  ).toDF("k", "name", "v", "_delete")

  test("update/delete/insert/no-op land; update nulls win") {
    val out = Merge.upsert(base, changes, "k")
      .orderBy("k").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 4L))
    assert(out(0).getString(1) == "a" && out(0).getDouble(2) == 10.0)
    assert(out(1).isNullAt(1) && out(1).getDouble(2) == 99.0)
    assert(out(2).getString(1) == "d" && out(2).getDouble(2) == 40.0)
  }

  test("re-applying the same batch to its own output is a no-op") {
    val once = Merge.upsert(base, changes, "k")
    val twice = Merge.upsert(once, changes, "k")
    val a = once.orderBy("k").collect().map(_.toSeq).toSeq
    val b = twice.orderBy("k").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("schema mismatch between base and changes is refused") {
    intercept[IllegalArgumentException] {
      Merge.upsert(base, changes.drop("v"), "k")
    }
    intercept[IllegalArgumentException] {
      Merge.upsert(base, changes.drop("_delete"), "k")
    }
  }
}
