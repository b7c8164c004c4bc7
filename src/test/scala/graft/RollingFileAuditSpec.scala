package graft

import graft.ops.{FileAudit, Rolling}
import org.apache.spark.sql.functions._

/** Fixtures for the rolling median and the small-files report. */
class RollingFileAuditSpec extends SparkSpec {
  import spark.implicits._

  test("rollingMedian shrugs off the spike the mean absorbs") {
    val ev = Seq(0L, 1L, 3L, 4L).flatMap(d => Seq.fill(5)(("a", d))) ++
      Seq.fill(50)(("a", 2L))
    val r = Rolling.rollingMedian(ev.toDF("g", "d"), "g", "d",
        window = 3)
      .orderBy("d").select("d", "roll_mean", "roll_median")
      .as[(Long, Double, Double)].collect().toSeq
    // Counts 5,5,50,5,5 → trailing-3 windows land on days 2..4:
    // means 20, 20, 20; medians all 5.
    assert(r === Seq((2L, 20.0, 5.0), (3L, 20.0, 5.0),
      (4L, 20.0, 5.0)))
  }

  test("smallFilesReport counts physical files and compaction target") {
    val tmp = java.nio.file.Files
      .createTempDirectory("audit_t").toString
    spark.range(1000).withColumn("k", col("id"))
      .repartition(4, col("k"))
      .write.mode("overwrite").parquet(tmp)
    val r = FileAudit.smallFilesReport(
        Seq(("t", spark.read.parquet(tmp))), targetRows = 300L)
      .select("table_name", "n_files", "n_rows", "min_rows",
        "max_rows", "target_files")
      .as[(String, Long, Long, Long, Long, Long)].head()
    assert(r._1 === "t" && r._2 === 4L && r._3 === 1000L)
    assert(r._4 > 0L && r._4 <= r._5)
    assert(r._6 === 4L) // ceil(1000/300)
  }
}
