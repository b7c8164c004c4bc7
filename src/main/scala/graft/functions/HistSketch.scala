package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Fixed-boundary histogram sketch as a native Spark aggregate: `nbins`
  * equal-width buckets over `[lo, hi)`, each cell a long count; values
  * below `lo` clamp into bucket 0, values at/above `hi` into bucket
  * `nbins − 1`, nulls and NaNs are skipped (SQL aggregate convention).
  *
  * This is the portable approximate-percentile path promised next to
  * the exact tier (q143) and the profiler's `approx_percentile` swap
  * note (q59/q89): any quantile is answered from the counts by rank
  * interpolation (see `Stats.histPercentiles`) with error bounded by
  * one bucket width — the t-digest/GK-sketch trade at a fraction of
  * the machinery. Why not `approx_percentile`: its GK buffer layout
  * and compression schedule are engine-private, so an external oracle
  * cannot reproduce its answer; this sketch's state is pure integer
  * counts under exact floor arithmetic, so DuckDB rebuilds the ENTIRE
  * sketch bit-for-bit (`least(floor((v − lo)/width), nbins−1)` group
  * counts) and the estimate is hash-compared, not tolerance-judged.
  * Pick `(hi − lo)/nbins` a power of two and every bucket assignment
  * is exact in IEEE doubles — no rounding seam at bucket edges.
  *
  * Scale shape: a true partial aggregate — one bounded `Array[Long]`
  * (8·nbins bytes) per group per task, map-side combined, merge is
  * elementwise add. At 100 TB a percentile query ships a few KB per
  * group across the shuffle where exact `percentile` ships every
  * value.
  */
case class HistSketchAgg(
    child: Expression,
    lo: Double,
    hi: Double,
    nbins: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(nbins > 0 && nbins <= (1 << 20),
    s"graft_hist: nbins must be in [1, 2^20], got $nbins")
  require(hi > lo, s"graft_hist: need hi > lo, got [$lo, $hi)")

  private val width: Double = (hi - lo) / nbins

  override def children: Seq[Expression] = child :: Nil
  // ExpectsInputTypes is off the table (AbstractDataType is
  // private[sql]) — same manual check as the sketch expressions.
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_hist expects a DOUBLE value input, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_hist"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](nbins)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Double]
      if (!x.isNaN) {
        val raw = math.floor((x - lo) / width)
        val b =
          if (raw < 0) 0
          else if (raw >= nbins) nbins - 1
          else raw.toInt
        buffer(b) += 1L
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < nbins) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * nbins)
    var i = 0
    while (i < nbins) { bb.putLong(buffer(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val arr = new Array[Long](nbins)
    var i = 0
    while (i < nbins) { arr(i) = bb.getLong(); i += 1 }
    arr
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HistSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HistSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HistSketchAgg =
    copy(child = newChildren.head)
}
