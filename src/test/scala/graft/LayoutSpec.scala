package graft

import graft.sources.Layout
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed-by-same-key join plans with NO shuffle exchange") {
    val a = (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("k", "va")
    val b = (1 to 1000).map(i => (i.toLong, i * 2.0)).toDF("k", "vb")
    Layout.writeBucketed(a, "bucket_a", "k", buckets = 8)
    Layout.writeBucketed(b, "bucket_b", "k", buckets = 8)
    try {
      val joined = Layout.table(spark, "bucket_a")
        .join(Layout.table(spark, "bucket_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() == 1000)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bucket_a")
      spark.sql("DROP TABLE IF EXISTS bucket_b")
    }
  }

  test("partitioned write prunes directories on partition predicates") {
    val dir = java.nio.file.Files.createTempDirectory("graft_layout").toString
    val df = (2023 to 2026).flatMap(y => (1 to 10).map(i => (y, i.toLong)))
      .toDF("year", "v")
    Layout.writePartitioned(df, dir, Seq("year"))
    val pruned = spark.read.parquet(dir).filter(col("year") === 2024)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() == 10)
    // Partition filter reaches the scan node (pruning, not post-filter).
    assert(scan.contains("PartitionFilters") || scan.contains("year"))
  }
}
