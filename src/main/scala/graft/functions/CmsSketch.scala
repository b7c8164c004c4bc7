package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Count-Min Sketch (Cormode & Muthukrishnan 2005) as a native Spark
  * aggregate: a `d x w` counter matrix where row `r` increments cell
  * `h_r(x) mod w` per occurrence; the frequency estimate for `x` is
  * the MINIMUM over rows — never an underestimate, over by at most
  * `eps * N` with probability `1 - delta` for `w = e/eps, d = ln(1/
  * delta)`. The heavy-hitter / top-k-frequency primitive that
  * completes the sketch family next to KMV (distinct count) and Bloom
  * (membership).
  *
  * The row hashes are the md5-seeded affine family of
  * [[Hashing.universalHashes]] applied to a pre-hashed BIGINT key, so
  * the ENTIRE matrix is engine-portable: the DuckDB oracle rebuilds
  * every cell by grouping `(r, cell)` and replays estimates
  * bit-for-bit ([[CmsSketch.duckCell]] is the SQL twin, kept adjacent
  * so the two sides cannot drift).
  *
  * Scale shape: a true partial aggregate — each task owns one
  * fixed-size `d*w` long array per group, map-side combines by vector
  * addition, and ships `8*d*w` bytes per group across the shuffle no
  * matter how many input rows it saw. Estimation is plain column
  * arithmetic over the materialized array (broadcast with its 1-row
  * frame), inside whole-stage codegen.
  */
case class CmsSketchAgg(
    child: Expression,
    d: Int,
    w: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(d > 0 && d <= 16, s"graft_cms: d must be in [1, 16], got $d")
  require(w > 0, s"graft_cms: w must be positive, got $w")

  override def children: Seq[Expression] = child :: Nil
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cms expects a BIGINT hash input, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_cms"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](d * w)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h31 = java.lang.Math.floorMod(v.asInstanceOf[Long], Hashing.P31)
      var r = 0
      while (r < d) {
        buffer(r * w + CmsSketch.cell(r, h31, w)) += 1L
        r += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buffer.length)
    var i = 0
    while (i < buffer.length) { bb.putLong(buffer(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val arr = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < arr.length) { arr(i) = bb.getLong(); i += 1 }
    arr
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsSketchAgg =
    copy(child = newChildren.head)
}

object CmsSketch {

  /** Row-`r` cell of a pre-reduced `h31 = h mod P31` key — the same
    * affine family as [[Hashing.universalHashes]]; products stay under
    * 2^62 so 64-bit arithmetic cannot overflow.
    */
  def cell(r: Int, h31: Long, w: Int): Int = {
    val p = Hashing.P31
    val a = java.lang.Math.floorMod(r * 1103515245L + 12345L, p)
    val b = java.lang.Math.floorMod(r * 2654435761L + 1013904223L, p)
    (java.lang.Math.floorMod(a * h31 + b, p) % w).toInt
  }

  /** Column twin of [[cell]] over a BIGINT hash column (all operands
    * non-negative, so `pmod` == `%`).
    */
  def cellCol(r: Column, h: Column, w: Int): Column = {
    val p = lit(Hashing.P31)
    val a = pmod(r.cast("long") * lit(1103515245L) + lit(12345L), p)
    val b = pmod(r.cast("long") * lit(2654435761L) + lit(1013904223L), p)
    pmod(a * pmod(h, p) + b, p) % lit(w.toLong)
  }

  /** Frequency estimate of hash column `h` against a materialized
    * sketch array: `min over r of sketch[r*w + cell(r, h)]`.
    */
  def estimate(sketch: Column, h: Column, d: Int, w: Int): Column =
    array_min(transform(sequence(lit(0), lit(d - 1)), r =>
      element_at(sketch, (r * w + cellCol(r, h, w)).cast("int") + 1)))

  /** DuckDB SQL twin of [[cell]]: the cell index of row `rExpr` for
    * `hExpr` (a BIGINT hash expression), matrix width `w`.
    */
  def duckCell(rExpr: String, hExpr: String, w: Int): String = {
    val p = Hashing.P31
    s"((($rExpr*1103515245 + 12345) % $p) * (($hExpr) % $p)" +
      s" + (($rExpr*2654435761 + 1013904223) % $p)) % $p % $w"
  }
}
