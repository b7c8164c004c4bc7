package graft

import org.apache.spark.sql.functions._

class VectorExpressionSpec extends SparkSpec {
  import spark.implicits._

  test("graft_dot matches the HOF formulation bit-for-bit and handles nulls") {
    val df = Seq(
      (1L, Array(1.5f, -2.0f, 0.25f), Array(2.0f, 0.5f, 4.0f)),
      (2L, Array(0.1f, 0.2f), Array(0.3f, 0.4f))
    ).toDF("id", "a", "b")
    val hof = aggregate(zip_with(col("a"), col("b"),
      (p, q) => p.cast("double") * q.cast("double")), lit(0.0), (acc, v) => acc + v)
    val out = df.select(
      call_function("graft_dot", col("a"), col("b")).as("native"), hof.as("ref"))
      .collect()
    out.foreach(r => assert(r.getDouble(0) == r.getDouble(1))) // exact, not approx
    // null input → null out (BinaryExpression null-safety)
    val nulls = Seq((1L, null.asInstanceOf[Array[Float]], Array(1.0f)))
      .toDF("id", "a", "b")
      .select(call_function("graft_dot", col("a"), col("b")))
      .collect()
    assert(nulls.head.isNullAt(0))
  }

  test("graft_dot: length mismatch and null elements yield NULL (HOF parity)") {
    // mismatched lengths: zip_with pads with null → null sum
    val mism = Seq((1L, Array(1.0f, 2.0f), Array(1.0f)))
      .toDF("id", "a", "b")
      .select(call_function("graft_dot", col("a"), col("b")))
      .collect()
    assert(mism.head.isNullAt(0))
    // null element inside an equal-length pair → null
    val withNullElem = Seq((1L, Seq(Some(1.0f), None), Seq(Some(2.0f), Some(3.0f))))
      .toDF("id", "a", "b")
      .select(call_function("graft_dot", col("a"), col("b")))
      .collect()
    assert(withNullElem.head.isNullAt(0))
  }

  test("graft_dot rejects non-float-array inputs at analysis time") {
    val ex = intercept[Exception] {
      Seq((1, 2)).toDF("x", "y")
        .select(call_function("graft_dot", col("x"), col("y"))).collect()
    }
    assert(ex.getMessage.contains("graft_dot") || ex.getMessage.contains("ARRAY"))
  }
}
