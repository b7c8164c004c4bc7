package graft.functions

import java.security.MessageDigest
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Primitive-loop kernels for the sketch expressions below.
  *
  * Arithmetic is EXACTLY [[Hashing.portableHash]] /
  * [[Hashing.universalHashes]] (md5 → first 15 hex digits as a 60-bit
  * long → mod P31 → affine family) — the DuckDB oracle fragments in
  * `Hashing.duckPortableHash`/`duckUniversalHash` stay bit-identical.
  * The win over the higher-order-function formulation is mechanical:
  * one digest and k fused multiply-mod steps per token with zero
  * intermediate arrays, instead of interpreted `transform`/`zip_with`
  * lambdas allocating a k-length array per token (measured 3-6× on the
  * sf0.1 sketch queries).
  */
object SketchKernels {
  val P31: Long = Hashing.P31

  private val digests = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** First 15 hex digits of md5(bytes) as a long — ≡ portableHash. */
  def hash60(bytes: Array[Byte]): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(bytes)
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    (h << 4) | ((d(7) & 0xffL) >>> 4)
  }

  // (a_s, b_s) affine coefficients per family size k, computed once.
  private val coefCache = new ConcurrentHashMap[Int, (Array[Long], Array[Long])]()
  private def coefs(k: Int): (Array[Long], Array[Long]) =
    coefCache.computeIfAbsent(k, k => (
      Array.tabulate(k)(s => java.lang.Math.floorMod(s * 1103515245L + 12345L, P31)),
      Array.tabulate(k)(s => java.lang.Math.floorMod(s * 2654435761L + 1013904223L, P31))))

  /** MinHash signature over a token array; null for an empty/all-null
    * set (the [[graft.ops.Dedup.minhashSignature]] contract). Min over
    * a multiset ≡ min over the distinct set, so no dedup pass needed.
    */
  def minhash(tokens: ArrayData, k: Int): ArrayData = {
    val (as, bs) = coefs(k)
    val mins = Array.fill(k)(Long.MaxValue)
    val n = tokens.numElements()
    var any = false
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        any = true
        val h31 = hash60(tokens.getUTF8String(i).getBytes) % P31
        var s = 0
        while (s < k) {
          val v = (as(s) * h31 + bs(s)) % P31
          if (v < mins(s)) mins(s) = v
          s += 1
        }
      }
      i += 1
    }
    if (any) new GenericArrayData(mins) else null
  }

  private val SPACE = UTF8String.fromString(" ")

  /** Intersection size of two SORTED distinct string arrays — a merge
    * count, no hash sets or intermediate arrays. With distinct inputs,
    * |A ∪ B| = |A| + |B| − overlap, so Jaccard needs nothing else.
    * Null elements are skipped wherever they appear (Spark's
    * `array_sort` places them LAST); callers feeding null-bearing
    * arrays should note |A|+|B|−overlap then counts nulls that
    * `array_union` would collapse.
    */
  def overlap(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      val x = a.getUTF8String(i)
      val y = b.getUTF8String(j)
      if (x == null) i += 1
      else if (y == null) j += 1
      else {
        val cmp = x.compareTo(y)
        if (cmp == 0) { c += 1; i += 1; j += 1 }
        else if (cmp < 0) i += 1
        else j += 1
      }
    }
    c
  }

  /** Sorted DISTINCT n-token shingles, space-joined. Short inputs
    * (fewer than n tokens) yield an empty array — the `sequence(1, 0)`
    * descent guard the HOF formulation needed is structural here.
    * Sort order is UTF8String binary order ≡ Spark's `array_sort`.
    */
  def shingles(tokens: ArrayData, n: Int): ArrayData = {
    val cnt = tokens.numElements()
    if (cnt < n) return new GenericArrayData(Array.empty[Any])
    val set = new java.util.TreeSet[UTF8String]()
    var i = 0
    while (i <= cnt - n) {
      var s: UTF8String = null
      var j = 0
      while (j < n) {
        val t = tokens.getUTF8String(i + j)
        if (t != null) // array_join semantics: nulls are skipped
          s = if (s == null) t else UTF8String.concat(s, SPACE, t)
        j += 1
      }
      if (s != null) set.add(s)
      i += 1
    }
    new GenericArrayData(set.toArray[AnyRef](new Array[AnyRef](set.size)))
  }

  /** SimHash: per bit, sign of the ±1 vote sum over the token hashes.
    * Caller is responsible for token distinctness (votes count per
    * DISTINCT token — duplicates would bias the sum). An empty/all-null
    * set yields NULL (boxed), the same contract as [[minhash]]: a
    * sentinel signature would make all empty docs mutual Hamming-0
    * "near-dups", and the guarded oracles yield NULL too.
    */
  def simhash(tokens: ArrayData, bits: Int): java.lang.Long = {
    val votes = new Array[Int](bits)
    val n = tokens.numElements()
    var any = false
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        any = true
        val h = hash60(tokens.getUTF8String(i).getBytes)
        var b = 0
        while (b < bits) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    if (!any) return null
    var sig = 0L
    var b = 0
    while (b < bits) {
      if (votes(b) >= 0) sig |= 1L << b
      b += 1
    }
    java.lang.Long.valueOf(sig)
  }
}

private[functions] trait TokenArrayInput { self: UnaryExpression =>
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ARRAY<STRING>, got ${other.catalogString}")
  }
}

/** `graft_minhash(tokens, k)` — k-minima MinHash signature, codegen'd
  * straight to [[SketchKernels.minhash]]. NULL for null input or an
  * empty token set.
  */
case class MinhashSignatureExpr(child: Expression, k: Int)
    extends UnaryExpression with TokenArrayInput {
  require(k > 0, s"k must be positive, got $k")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(tokens: Any): Any =
    SketchKernels.minhash(tokens.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, toks => {
      s"""
         |${ev.value} = graft.functions.SketchKernels.minhash($toks, $k);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinhashSignatureExpr =
    copy(child = newChild)
}

/** `graft_shingles(tokens, n)` — sorted distinct space-joined n-gram
  * array via [[SketchKernels.shingles]]; empty array for inputs
  * shorter than n tokens.
  */
case class ShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression with TokenArrayInput {
  require(n > 0, s"n must be positive, got $n")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override def nullSafeEval(tokens: Any): Any =
    SketchKernels.shingles(tokens.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, toks => s"graft.functions.SketchKernels.shingles($toks, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShinglesExpr =
    copy(child = newChild)
}

/** `graft_overlap(a, b)` — intersection size of two SORTED distinct
  * string arrays ([[SketchKernels.overlap]]). The Jaccard-verify hot
  * path: replaces `size(array_intersect)` + `size(array_union)` (two
  * hash-set builds and two materialized arrays per candidate pair)
  * with one merge scan.
  */
case class SortedOverlapExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_overlap expects two ARRAY<STRING> arguments, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_overlap"

  override def nullSafeEval(a: Any, b: Any): Any =
    SketchKernels.overlap(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.SketchKernels.overlap($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedOverlapExpr =
    copy(left = newLeft, right = newRight)
}

/** `graft_simhash(tokens, bits)` — packed sign-of-votes SimHash over a
  * DISTINCT token array (apply `array_distinct` upstream; duplicate
  * tokens bias the vote).
  */
case class SimhashExpr(child: Expression, bits: Int)
    extends UnaryExpression with TokenArrayInput {
  require(bits > 0 && bits <= 60, s"bits must be in (0, 60], got $bits")
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(tokens: Any): Any =
    SketchKernels.simhash(tokens.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, toks => {
      val tmp = ctx.freshName("sig")
      s"""
         |java.lang.Long $tmp = graft.functions.SketchKernels.simhash($toks, $bits);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimhashExpr =
    copy(child = newChild)
}
