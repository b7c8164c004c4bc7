package graft

import graft.ops.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedSum equals the plain aggregate, including null keys") {
    val df = (1 to 1000).map(i => (if (i % 10 == 0) null else s"k${i % 3}", i.toDouble))
      .toDF("k", "v")
    val salted = Skew.saltedSum(Seq("k"), "v", "total")(df)
      .collect().map(r => Option(r.getString(0)) -> r.getDouble(1)).toMap
    val plain = df.groupBy("k").agg(sum("v").as("total"))
      .collect().map(r => Option(r.getString(0)) -> r.getDouble(1)).toMap
    assert(salted == plain)
  }

  test("the salted plan has two aggregation exchanges (spray then reduce)") {
    val df = Seq(("a", 1.0)).toDF("k", "v")
    val plan = Skew.saltedSum(Seq("k"), "v", "total")(df)
      .queryExecution.executedPlan.toString
    assert(plan.contains("_salt") || plan.contains("hashpartitioning"))
  }
}
