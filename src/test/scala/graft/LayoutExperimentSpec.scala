package graft

import graft.ops.{Experiment, ZOrder}
import org.apache.spark.sql.functions._

/** Z-order interleave bit math and CUPED algebra pinned on hand
  * cases.
  */
class LayoutExperimentSpec extends SparkSpec {
  import spark.implicits._

  test("zorder: interleave matches hand-computed morton codes") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (255L, 255L),
      (0x55L, 0x00L), (0xF0L, 0x0FL)).toDF("qx", "qy")
    val out = df.select(ZOrder.zvalue(col("qx"), col("qy"), 8).as("z"))
      .as[Long].collect().toSeq
    // x on even bits, y on odd: z(1,0)=1, z(0,1)=2, z(255,255)=65535,
    // z(0x55,0)=0b0001000100010001=0x1111, z(0xF0,0x0F)=
    // x bits 4-7 → even positions 8,10,12,14 = 0x5500; y bits 0-3 →
    // odd positions 1,3,5,7 = 0x00AA.
    assert(out == Seq(0L, 1L, 2L, 65535L, 0x1111L, 0x55AAL))
  }

  test("zorder: quantize clamps and respects fixed bounds") {
    val df = Seq(-5.0, 0.0, 50.0, 99.9999, 100.0, 777.0).toDF("v")
    val q = df.select(ZOrder.quantize(col("v"), 0.0, 100.0, 8).as("q"))
      .as[Long].collect().toSeq
    assert(q == Seq(0L, 0L, 128L, 255L, 255L, 255L))
  }

  test("cuped: perfectly correlated covariate drives t_cuped to zero-ish variance gain") {
    // y = x + arm-independent noise pattern; x identical across arms →
    // theta = 1 and the adjusted contrast equals the raw contrast,
    // while var_adj collapses to the residual variance.
    val rows = (0 until 40).map { i =>
      val arm = i % 2
      val x = (100 + (i / 2) * 10).toLong // same x sequence per arm
      val y = x + (if (arm == 1) 50L else 0L)
      (arm.toLong, x, y)
    }
    val df = rows.toDF("arm", "x", "y")
    val out = Experiment.cupedReport(df).orderBy("arm").collect()
    val theta = out(0).getAs[Double]("theta")
    assert(math.abs(theta - 1.0) < 1e-9)
    // Residual after removing x is constant within arm → var_adj = 0.
    assert(out.forall(r => math.abs(r.getAs[Double]("var_adj")) < 1e-9))
    // Raw contrast = 0.5 dollars (50 cents).
    val m = out.map(r => r.getAs[Double]("mean_adj"))
    assert(math.abs((m(1) - m(0)) - 0.5) < 1e-9)
  }
}
