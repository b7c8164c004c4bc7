package graft

import graft.ops.{Scd2, TableChecksum}
import org.apache.spark.sql.functions._

/** SCD2 interval semantics and checksum anti-entropy pinned on hand
  * cases: run splitting/closing, the gap-with-unchanged-content rule,
  * change-and-revert producing three intervals; checksum equality on
  * identical tables under different partitioning, and single-row
  * tampering localized to exactly one bucket.
  */
class Scd2ChecksumSpec extends SparkSpec {
  import spark.implicits._

  test("scd2: runs split on change, close on next run, stay open when current") {
    val log = Seq(
      ("A", 1, "x"), ("A", 2, "x"), ("A", 3, "y"), // change at v3
      ("B", 1, "p"), ("B", 3, "p"), // gap at v2, content unchanged
      ("C", 1, "x"), ("C", 2, "y"), ("C", 3, "x") // change and revert
    ).toDF("k", "ver", "seg")
    val h = Scd2.history(log, "k", "ver", Seq("seg"))
      .orderBy("k", "valid_from")
      .select("k", "seg", "valid_from", "valid_to", "is_current")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getInt(2), if (r.isNullAt(3)) -1 else r.getInt(3), r.getBoolean(4)))
    assert(h.toSeq == Seq(
      ("A", "x", 1, 2, false), ("A", "y", 3, -1, true),
      ("B", "p", 1, -1, true), // one unbroken run across the gap
      ("C", "x", 1, 1, false), ("C", "y", 2, 2, false),
      ("C", "x", 3, -1, true)))
  }

  test("applyVersion: incremental fold equals full-log rebuild") {
    // Keys: A changes at v3, B unchanged, C absent from v3 (stays
    // open), D brand-new at v3.
    val log12 = Seq(("A", 1, "x"), ("A", 2, "x"), ("B", 1, "p"),
      ("C", 1, "q")).toDF("k", "ver", "seg")
    val v3 = Seq(("A", "y"), ("B", "p"), ("D", "new")).toDF("k", "seg")
    val applied = Scd2.applyVersion(
      Scd2.history(log12, "k", "ver", Seq("seg")),
      v3, "k", ver = 3L, Seq("seg"))
    val fullLog = log12.unionByName(
      Seq(("A", 3, "y"), ("B", 3, "p"), ("D", 3, "new"))
        .toDF("k", "ver", "seg"))
    val rebuilt = Scd2.history(fullLog, "k", "ver", Seq("seg"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "seg", "valid_from", "valid_to", "is_current")
        .collect().map(_.toSeq).toSet
    assert(canon(applied) == canon(rebuilt))
    // And the specific shapes: A closed at 2 + open y@3; C open from
    // 1; D open from 3.
    val open = applied.filter(col("is_current"))
      .select("k", "seg").collect().map(r =>
        (r.getString(0), r.getString(1))).toSet
    assert(open == Set(("A", "y"), ("B", "p"), ("C", "q"), ("D", "new")))
  }

  test("checksum: identical content matches under any partitioning") {
    val a = (1L to 500L).map(k => (k, s"n$k", (k % 7).toString))
      .toDF("k", "name", "seg").repartition(1)
    val b = (1L to 500L).reverse.map(k => (k, s"n$k", (k % 7).toString))
      .toDF("k", "name", "seg").repartition(13)
    val cmp = TableChecksum.compare(a, b, "k", Seq("name", "seg"), 8)
      .collect()
    assert(cmp.length == 8 && cmp.forall(_.getBoolean(3)))
    assert(cmp.map(_.getLong(1)).sum == 500L)
  }

  test("checksum: one tampered row flips exactly one bucket") {
    val base = (1L to 500L).map(k => (k, s"n$k", "s")).toDF("k", "name", "seg")
    val tam = base.withColumn("seg",
      when(col("k") === 123L, "TAMPERED").otherwise(col("seg")))
    val bad = TableChecksum.compare(base, tam, "k", Seq("name", "seg"), 8)
      .filter(!col("is_match")).collect()
    assert(bad.length == 1)
    // counts agree (no rows missing) — only the XOR channel trips
    assert(bad(0).getLong(1) == bad(0).getLong(2))
  }
}
