package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) layout: interleave the bits of two quantized
  * dimensions so that sorting by ONE key co-locates rows that are
  * close in BOTH — the lakehouse data-skipping trick (Delta/Iceberg
  * `ZORDER BY`) that lets parquet min/max stats prune files for
  * predicates on either column, where a plain sort only ever helps
  * its leading column.
  *
  * At 100 TB the write path is `repartitionByRange(zvalue)` +
  * `sortWithinPartitions(zvalue)` before the parquet sink: each file
  * then covers a small rectangle of (x, y) space. [[layoutReport]]
  * is the audit that PROVES the locality — per fixed-width z-slice
  * (a stand-in for one output file), the min/max extent of both
  * dimensions and the covered-rectangle area; tight rectangles =
  * effective skipping on both predicates. Quantization and bit
  * interleave are pure integer/IEEE expressions, bit-reproducible
  * anywhere.
  */
object ZOrder {

  /** Quantize to [0, 2^bits) over fixed [lo, hi) bounds (values
    * clamped) — fixed bounds, not data-dependent ones, so the curve
    * is stable release-to-release.
    */
  def quantize(c: Column, lo: Double, hi: Double, bits: Int): Column =
    least(greatest(
      floor((c.cast("double") - lit(lo)) / lit(hi - lo) *
        lit(math.pow(2.0, bits))).cast("long"),
      lit(0L)), lit((1L << bits) - 1L))

  /** Morton-interleave two `bits`-wide integers: x occupies even bit
    * positions, y odd.
    */
  def zvalue(qx: Column, qy: Column, bits: Int): Column =
    (0 until bits).map { b =>
      shiftleft(shiftright(qx, b).bitwiseAND(lit(1L)), 2 * b)
        .bitwiseOR(
          shiftleft(shiftright(qy, b).bitwiseAND(lit(1L)), 2 * b + 1))
    }.reduce(_ bitwiseOR _)

  /** Per z-slice locality audit over two 8-bit dimensions: slice =
    * z DIV 2^(16−sliceBits) (2^sliceBits slices), with each slice's
    * row count, (x, y) extents, and covered-rectangle area.
    */
  def layoutReport(
      df: DataFrame, xCol: String, yCol: String,
      xLo: Double, xHi: Double, yLo: Double, yHi: Double,
      sliceBits: Int): DataFrame = {
    val qx = quantize(col(xCol), xLo, xHi, 8)
    val qy = quantize(col(yCol), yLo, yHi, 8)
    df
      .where(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(zvalue(qx, qy, 8).as("z"), qx.as("qx"), qy.as("qy"))
      .withColumn("slice", expr(s"z DIV ${1L << (16 - sliceBits)}"))
      .groupBy("slice")
      .agg(count(lit(1)).as("n"),
        min("qx").as("min_x"), max("qx").as("max_x"),
        min("qy").as("min_y"), max("qy").as("max_y"))
      .withColumn("area",
        (col("max_x") - col("min_x") + 1) * (col("max_y") - col("min_y") + 1))
  }
}
