package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Portable Bloom filter — the build side of runtime semi-join pruning:
  * aggregate the small side's join keys into a fixed bitset once
  * (map-side OR-mergeable), broadcast the ~bitset-sized result, and
  * probe it as a narrow filter on the big side BEFORE the shuffle
  * join, so rows that cannot match never enter the exchange. Spark's
  * own runtime bloom filters (`spark.sql.optimizer.runtime.bloomFilter
  * .enabled`) inject this automatically but hash with engine-private
  * seeds; this one hashes each probe with the md5-derived
  * [[Hashing.seededHash]], so an external engine — the DuckDB oracle,
  * or any downstream auditor — rebuilds the identical bitset and
  * reproduces every false positive bit-for-bit.
  *
  * Layout: `words` 63-bit words (bit index = position mod 63, so the
  * oracle's OVERFLOW-CHECKED `<<` never shifts by 63); probe `j` of a
  * value sets `pos_j = seededHash(j, value) mod (63·words)`. False-
  * positive rate is the standard (1 − e^{−k·n/m})^k.
  */
object BloomKernels {
  val BITS_PER_WORD = 63

  /** Probe positions of one value: seededHash(j, value) mod m. */
  def position(j: Int, value: UTF8String, mBits: Long): Long = {
    val prefix = (j.toString + ":").getBytes("UTF-8")
    val vb = value.getBytes
    val bytes = new Array[Byte](prefix.length + vb.length)
    System.arraycopy(prefix, 0, bytes, 0, prefix.length)
    System.arraycopy(vb, 0, bytes, prefix.length, vb.length)
    SketchKernels.hash60(bytes) % mBits // hash60 ≥ 0: plain % is fine
  }

  def set(wordsArr: Array[Long], pos: Long): Unit = {
    val w = (pos / BITS_PER_WORD).toInt
    wordsArr(w) |= 1L << (pos % BITS_PER_WORD).toInt
  }

  /** All k probes present? Null-safe at the expression layer. */
  def contains(bloom: ArrayData, value: UTF8String, k: Int): Boolean = {
    val mBits = bloom.numElements().toLong * BITS_PER_WORD
    var j = 0
    while (j < k) {
      val pos = position(j, value, mBits)
      val bits = bloom.getLong((pos / BITS_PER_WORD).toInt)
      if ((bits & (1L << (pos % BITS_PER_WORD).toInt)) == 0L) return false
      j += 1
    }
    true
  }
}

/** `graft_bloom(value, words, k)` — aggregate a string key column into
  * a `words`×63-bit Bloom bitset (ARRAY<BIGINT>).
  */
case class BloomFilterAgg(
    child: Expression,
    words: Int,
    kProbes: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(words > 0, s"graft_bloom: words must be positive, got $words")
  require(kProbes > 0, s"graft_bloom: k must be positive, got $kProbes")
  private val mBits = words.toLong * BloomKernels.BITS_PER_WORD

  override def children: Seq[Expression] = child :: Nil
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bloom expects a STRING key, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bloom"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](words)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      var j = 0
      while (j < kProbes) {
        BloomKernels.set(buffer, BloomKernels.position(j, s, mBits))
        j += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < words) { buffer(i) |= other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * words)
    var i = 0
    while (i < words) { bb.putLong(buffer(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(words)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomFilterAgg =
    copy(child = newChildren.head)
}

/** `graft_bloom_contains(bloom, value, k)` — membership probe; k must
  * match the build-side probe count.
  */
case class BloomContainsExpr(left: Expression, right: Expression, kProbes: Int)
    extends BinaryExpression {
  require(kProbes > 0, s"graft_bloom_contains: k must be positive, got $kProbes")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_contains expects (ARRAY<BIGINT>, STRING), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  override def nullSafeEval(bloom: Any, value: Any): Any =
    BloomKernels.contains(bloom.asInstanceOf[ArrayData],
      value.asInstanceOf[UTF8String], kProbes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, v) =>
      s"graft.functions.BloomKernels.contains($b, $v, $kProbes)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomContainsExpr =
    copy(left = newLeft, right = newRight)
}
