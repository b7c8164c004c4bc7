package graft.functions

import java.nio.ByteBuffer
import java.util.{TreeSet => JTreeSet}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** K-minimum-values distinct-count sketch (Bar-Yossef et al. 2002;
  * Beyer et al., SIGMOD'07 "On Synopses for Distinct-Value Estimation")
  * as a native Spark aggregate: keep the k smallest DISTINCT hash
  * values seen; since a uniform hash spreads n distinct keys evenly
  * over [0, 2^60), the k-th smallest value h_k estimates density —
  * unbiased estimator (k−1) · 2^60 / h_k.
  *
  * Why not `approx_count_distinct` (HyperLogLog++): its register layout
  * and seed are engine-private, so its answer cannot be reproduced by
  * an external oracle — this sketch hashes with the md5-derived
  * [[Hashing.portableHash]], making the ENTIRE sketch portable: DuckDB
  * recomputes it bit-for-bit as
  * `list_sort(list_distinct(list(h)))[1:k]`, which is how the catalog
  * oracle checks it. KMV is also directly MERGEABLE (union = merge the
  * min-k sets, keep k smallest) and supports set operations HLL cannot
  * (intersection estimates via the k-th value of the union).
  *
  * Scale shape: a true partial aggregate — each task keeps one bounded
  * TreeSet (≤ k longs) per group, map-side combines, and ships ≤ 8k
  * bytes per group across the shuffle regardless of input size. That
  * is the whole point vs `countDistinct`, which shuffles every
  * distinct value.
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[JTreeSet[java.lang.Long]] {

  require(k > 0, s"graft_kmv: k must be positive, got $k")

  override def children: Seq[Expression] = child :: Nil
  // ExpectsInputTypes is off the table (AbstractDataType is
  // private[sql]) — same manual check as the sketch expressions.
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_kmv expects a BIGINT hash input, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kmv"

  override def createAggregationBuffer(): JTreeSet[java.lang.Long] =
    new JTreeSet[java.lang.Long]()

  override def update(
      buffer: JTreeSet[java.lang.Long], input: InternalRow): JTreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      // Only insert if it can make the min-k set: avoids churning the
      // tree on the (overwhelmingly common, once warm) larger values.
      if (buffer.size < k || h < buffer.last()) {
        buffer.add(h)
        if (buffer.size > k) buffer.pollLast()
      }
    }
    buffer
  }

  override def merge(
      buffer: JTreeSet[java.lang.Long],
      other: JTreeSet[java.lang.Long]): JTreeSet[java.lang.Long] = {
    val it = other.iterator() // ascending; stop once nothing can enter
    var done = false
    while (it.hasNext && !done) {
      val h = it.next()
      if (buffer.size < k || h < buffer.last()) {
        buffer.add(h)
        if (buffer.size > k) buffer.pollLast()
      } else done = true
    }
    buffer
  }

  override def eval(buffer: JTreeSet[java.lang.Long]): Any = {
    val arr = new Array[Long](buffer.size)
    val it = buffer.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buffer: JTreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buffer.size)
    val it = buffer.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): JTreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val set = new JTreeSet[java.lang.Long]()
    while (bb.hasRemaining) set.add(bb.getLong())
    set
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketchAgg =
    copy(child = newChildren.head)
}
