package graft.functions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern matcher over raw UTF-8 bytes.
  *
  * The 100 TB rationale: blocklist filtering (banned phrases, boilerplate
  * markers, licence headers, eval-set canaries) runs over EVERY corpus
  * byte. Scanning with one `contains`/`regexp` per pattern is
  * O(patterns × text) and falls off a cliff at real blocklist sizes
  * (10⁴–10⁵ phrases); the automaton is O(text + matches) regardless of
  * pattern count, in ONE pass that rides the corpus scan with zero
  * shuffle. Patterns are config-sized (they come from a curated
  * blocklist, never from the corpus), so building the automaton on the
  * driver and shipping it with the plan is the same bounded-broadcast
  * discipline as the PQ codebooks ([[graft.ops.Pq]]).
  *
  * Structure: byte-CSR trie (sorted child arrays + binary search, so a
  * 10⁵-pattern automaton is ~O(total pattern bytes), not 256-dense),
  * BFS fail links, and per-node output links that chain every pattern
  * ending at the node (suffix patterns included — "he" fires inside
  * "she"). Matching reports EVERY occurrence of every pattern,
  * overlapping and nested alike, as (pattern id) in scan order of the
  * match END position; ties at one end position list longer patterns
  * first (the node's own output precedes its suffix chain).
  */
final class AhoCorasick private (
    // CSR transitions: node i's children are childByte/childNext in
    // [childStart(i), childStart(i+1)), sorted by byte for binary search.
    private val childStart: Array[Int],
    private val childByte: Array[Byte],
    private val childNext: Array[Int],
    private val fail: Array[Int],
    // outPat(n) = pattern id ending exactly at node n (-1 if none);
    // outLink(n) = nearest proper-suffix node with a pattern end (-1).
    private val outPat: Array[Int],
    private val outLink: Array[Int],
    // patLen(p) = UTF-8 byte length of pattern p (span arithmetic).
    private val patLen: Array[Int]) extends Serializable {

  def nodes: Int = fail.length

  private def step(fromNode: Int, b: Byte): Int = {
    // NFA-style walk: follow fail links until a child for b exists.
    var n = fromNode
    while (true) {
      var lo = childStart(n)
      var hi = childStart(n + 1) - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        val c = childByte(mid)
        if (c == b) return childNext(mid)
        else if (c < b) lo = mid + 1
        else hi = mid - 1
      }
      if (n == 0) return 0
      n = fail(n)
    }
    0 // unreachable
  }

  /** All matches in `s` as pattern ids, ordered by match end position. */
  def hits(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val out = new scala.collection.mutable.ArrayBuffer[Any](8)
    var node = 0
    var i = 0
    while (i < bytes.length) {
      node = step(node, bytes(i))
      var m = if (outPat(node) >= 0) node else outLink(node)
      while (m >= 0) {
        out += outPat(m)
        m = outLink(m)
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Redact every match: the UNION of all match byte-intervals,
    * each maximal run of covered bytes replaced by `replacement` once
    * (so "aa" over "aaaa" redacts to one replacement, not three, and
    * ADJACENT matches — "bad" twice in "badbad" — merge into one run:
    * run identity is over covered positions, not match boundaries,
    * which is also what the relational lag-gap oracle counts). If the
    * replacement shares no byte sequence with any pattern, the
    * output is guaranteed hit-free: a new match would have to lie
    * inside a preserved segment (then it was a match of the original
    * and would have been covered — contradiction) or cross a
    * replacement boundary (impossible without the replacement's
    * bytes).
    */
  def scrub(s: UTF8String, replacement: Array[Byte]): UTF8String = {
    val bytes = s.getBytes
    // Merged intervals, maintained sorted: matches arrive in end
    // order, but a long pattern can reach back over ALREADY-CLOSED
    // intervals, so merging cascades backwards.
    val st = new scala.collection.mutable.ArrayBuffer[Int](8)
    val en = new scala.collection.mutable.ArrayBuffer[Int](8)
    var node = 0
    var i = 0
    while (i < bytes.length) {
      node = step(node, bytes(i))
      var m = if (outPat(node) >= 0) node else outLink(node)
      while (m >= 0) {
        val s0 = i + 1 - patLen(outPat(m))
        val e0 = i + 1
        if (st.isEmpty || s0 > en.last) {
          st += s0; en += e0
        } else {
          // Overlaps or touches the last interval (match ends are
          // non-decreasing, so it can never fall strictly between
          // earlier intervals without touching the last) — extend it,
          // then cascade-merge backwards over any earlier intervals
          // it now reaches or touches.
          if (e0 > en.last) en(en.size - 1) = e0
          if (s0 < st.last) st(st.size - 1) = s0
          while (st.size > 1 && st.last <= en(en.size - 2)) {
            val ns = math.min(st(st.size - 2), st.last)
            val ne = en.last
            st.remove(st.size - 1); en.remove(en.size - 1)
            st(st.size - 1) = ns; en(en.size - 1) = ne
          }
        }
        m = outLink(m)
      }
      i += 1
    }
    if (st.isEmpty) return s
    val covered = (0 until st.size).map(k => en(k) - st(k)).sum
    val out = new Array[Byte](
      bytes.length - covered + st.size * replacement.length)
    var o = 0
    var prev = 0
    var k = 0
    while (k < st.size) {
      System.arraycopy(bytes, prev, out, o, st(k) - prev)
      o += st(k) - prev
      System.arraycopy(replacement, 0, out, o, replacement.length)
      o += replacement.length
      prev = en(k)
      k += 1
    }
    System.arraycopy(bytes, prev, out, o, bytes.length - prev)
    UTF8String.fromBytes(out)
  }
}

object AhoCorasick {

  /** Per-JVM automaton cache: the expression rebuilds lazily after task
    * deserialization; this makes that a once-per-executor cost instead
    * of once-per-task. Keyed by the pattern list itself (config-sized).
    */
  private val cache = new ConcurrentHashMap[Seq[String], AhoCorasick]()

  def cached(patterns: Seq[String]): AhoCorasick =
    cache.computeIfAbsent(patterns, build(_))

  def build(patterns: Seq[String]): AhoCorasick = {
    require(patterns.nonEmpty, "empty pattern list")
    require(patterns.forall(_.nonEmpty), "empty pattern")
    require(patterns.distinct.size == patterns.size,
      "duplicate patterns (ids would be ambiguous)")
    // Mutable trie: per node a sorted map byte -> child.
    val children = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.TreeMap.empty[Byte, Int])
    val pat = scala.collection.mutable.ArrayBuffer(-1)
    patterns.zipWithIndex.foreach { case (p, id) =>
      var n = 0
      p.getBytes("UTF-8").foreach { b =>
        n = children(n).getOrElseUpdate(b, {
          children += scala.collection.mutable.TreeMap.empty[Byte, Int]
          pat += -1
          children.size - 1
        })
      }
      pat(n) = id
    }
    val size = children.size
    val fail = new Array[Int](size)
    val outLink = Array.fill(size)(-1)
    // BFS: fail of depth-1 nodes is root; deeper nodes extend parent fail.
    val queue = new java.util.ArrayDeque[Int]()
    children(0).valuesIterator.foreach(queue.add(_))
    while (!queue.isEmpty) {
      val n = queue.poll()
      children(n).foreach { case (b, ch) =>
        // fail(ch): longest proper suffix of ch's string in the trie.
        var f = fail(n)
        var resolved = -1
        while (resolved < 0) {
          children(f).get(b) match {
            case Some(t) if t != ch => resolved = t
            case _ if f == 0 => resolved = 0
            case _ => f = fail(f)
          }
        }
        fail(ch) = resolved
        outLink(ch) =
          if (pat(resolved) >= 0) resolved else outLink(resolved)
        queue.add(ch)
      }
    }
    // Freeze to CSR.
    val childStart = new Array[Int](size + 1)
    var total = 0
    for (i <- 0 until size) { childStart(i) = total; total += children(i).size }
    childStart(size) = total
    val childByte = new Array[Byte](total)
    val childNext = new Array[Int](total)
    var k = 0
    for (i <- 0 until size; (b, ch) <- children(i)) {
      childByte(k) = b; childNext(k) = ch; k += 1
    }
    new AhoCorasick(childStart, childByte, childNext, fail,
      pat.toArray, outLink,
      patterns.map(_.getBytes("UTF-8").length).toArray)
  }
}

/** `graft_blockhits(text, array('p0','p1',…))` — every Aho–Corasick
  * match in `text` as an array of pattern ids (index into the literal
  * pattern array), ordered by match end position; overlapping and
  * nested matches all reported. The pattern array must be literal — it
  * is the automaton, fixed at plan time.
  */
case class BlocklistHitsExpr(child: Expression, patterns: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_blockhits expects STRING, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_blockhits"

  @transient private lazy val ac = AhoCorasick.cached(patterns)

  override def nullSafeEval(input: Any): Any =
    ac.hits(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("ac", ac, classOf[AhoCorasick].getName)
    defineCodeGen(ctx, ev, c => s"$acRef.hits($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BlocklistHitsExpr =
    copy(child = newChild)
}

/** `graft_blockscrub(text, array('p0',…), 'replacement')` — redact the
  * UNION of all Aho–Corasick match spans ([[AhoCorasick.scrub]]): each
  * maximal overlapping run is replaced once. Pattern array and
  * replacement must be literal. Pick a replacement sharing no byte
  * sequence with any pattern and the output is provably hit-free —
  * the closed-loop property the q386 audit certifies.
  */
case class BlocklistScrubExpr(child: Expression, patterns: Seq[String],
    replacement: String) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_blockscrub expects STRING, got ${other.catalogString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_blockscrub"

  @transient private lazy val ac = AhoCorasick.cached(patterns)
  @transient private lazy val repl = replacement.getBytes("UTF-8")

  override def nullSafeEval(input: Any): Any =
    ac.scrub(input.asInstanceOf[UTF8String], repl)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("ac", ac, classOf[AhoCorasick].getName)
    val rRef = ctx.addReferenceObj("repl", repl, "byte[]")
    defineCodeGen(ctx, ev, c => s"$acRef.scrub($c, $rRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): BlocklistScrubExpr =
    copy(child = newChild)
}
