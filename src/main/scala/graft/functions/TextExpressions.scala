package graft.functions

import java.text.Normalizer
import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Text-canonicalization kernel: Unicode NFC + ROOT-locale lowercase +
  * whitespace collapse in ONE pass per string. Spark has no NFC
  * normalization built-in, and the composed three-step built-in chain
  * (`lower` → `regexp_replace` → `trim`) allocates two intermediate
  * UTF8Strings per row; the fused kernel allocates once and stays in
  * whole-stage codegen.
  *
  * Engine parity: the DuckDB twin is
  * `trim(regexp_replace(lower(nfc_normalize(x)), '[ \t\n\f\r]+', ' ',
  * 'g'))` — same operation order, and the whitespace class is spelled
  * EXPLICITLY (not `\s`) because Java's `\s` includes U+000B where
  * RE2's does not. Exotic case mappings (e.g. dotted capital İ) may
  * still differ between ICU/JDK and utf8proc — the oracle exercises
  * the ASCII corpus; TextKernelSpec pins the Unicode behavior to the
  * JDK ground truth.
  */
object TextKernels {
  private val ws = Pattern.compile("[ \t\n\f\r]+")

  def canon(s: UTF8String): UTF8String = {
    val nfc = Normalizer.normalize(s.toString, Normalizer.Form.NFC)
    val lower = nfc.toLowerCase(java.util.Locale.ROOT)
    val collapsed = ws.matcher(lower).replaceAll(" ")
    // Strip ONLY spaces at the edges — the oracle twin is DuckDB
    // trim(), which strips ' ' alone, while Java String.trim strips
    // every code point <= U+0020 (e.g. an edge U+000B outside the
    // collapse class would canonicalize differently per engine).
    var b = 0
    var e = collapsed.length
    while (b < e && collapsed.charAt(b) == ' ') b += 1
    while (e > b && collapsed.charAt(e - 1) == ' ') e -= 1
    UTF8String.fromString(collapsed.substring(b, e))
  }
}

/** Script-aware tokenization kernel (round 19 — VERDICT r18 task 1):
  * the house tokenizer behind `TextAnalysis.tokens`, and therefore
  * behind token counting, quality scoring, MinHash/Jaccard dedup and
  * BM25. Two regimes in ONE pass:
  *
  *  - Space-delimited scripts (Latin, Cyrillic, Greek, Arabic, Hebrew,
  *    Devanagari, …): maximal runs of non-delimiter characters —
  *    EXACT parity with the previous `[^ ]+` extraction on any text
  *    that carries no char-grain or CJK-punctuation code points, so
  *    every existing ASCII oracle replay (`string_split_regex(text,
  *    ' +')`) stays bit-identical.
  *  - Char-grain scripts (Han, kana, Hangul, Thai — writing systems
  *    with no inter-word spaces): each contiguous run emits its
  *    overlapping character BIGRAMS (a single-character run emits the
  *    character), the standard web-corpus practice for CJK shingling
  *    and token accounting — a spaceless Japanese document becomes
  *    ~|chars| tokens instead of one giant one, so length bands,
  *    type-token ratios and MinHash signatures carry real signal.
  *
  * CJK punctuation (U+3000–303F) and fullwidth punctuation split like
  * a space — `。`/`、` end a run instead of riding inside a bigram.
  * Only U+0020 delimits otherwise (NOT all whitespace): parity with
  * the `[^ ]+` regex the kernel replaces.
  */
object TokensKit {

  /** Han + kana + Hangul + Thai (+ halfwidth katakana) — the scripts
    * tokenized at character-bigram grain. Explicit BMP ranges, not
    * `\p{script=…}` classes (the [[graft.ops.TextAnalysis.scriptProfile]]
    * engine-stability rule).
    */
  private def charGrain(c: Char): Boolean =
    (c >= 0x4E00 && c <= 0x9FFF) || // CJK unified ideographs
      (c >= 0x3400 && c <= 0x4DBF) || // CJK extension A
      (c >= 0x3040 && c <= 0x30FF) || // hiragana + katakana
      (c >= 0xAC00 && c <= 0xD7A3) || // hangul syllables
      (c >= 0x1100 && c <= 0x11FF) || // hangul jamo
      (c >= 0x3130 && c <= 0x318F) || // hangul compat jamo
      (c >= 0x0E00 && c <= 0x0E7F) || // thai
      (c >= 0xFF66 && c <= 0xFF9F) // halfwidth katakana

  /** U+0020 (the only ASCII delimiter — parity with `[^ ]+`), the CJK
    * symbols/punctuation block, and fullwidth punctuation (fullwidth
    * letters and digits U+FF10–FF19/FF21–FF3A/FF41–FF5A stay word
    * characters).
    */
  private def delimiter(c: Char): Boolean =
    c == ' ' ||
      (c >= 0x3000 && c <= 0x303F) ||
      (c >= 0xFF01 && c <= 0xFF0F) ||
      (c >= 0xFF1A && c <= 0xFF20) ||
      (c >= 0xFF3B && c <= 0xFF40) ||
      (c >= 0xFF5B && c <= 0xFF65)

  def tokens(text: UTF8String): ArrayData = {
    val s = text.toString
    val n = s.length
    val out = new scala.collection.mutable.ArrayBuffer[Any]
    var wordStart = -1
    var grainStart = -1
    def flushWord(end: Int): Unit = if (wordStart >= 0) {
      out += UTF8String.fromString(s.substring(wordStart, end))
      wordStart = -1
    }
    def flushGrain(end: Int): Unit = if (grainStart >= 0) {
      if (end - grainStart == 1)
        out += UTF8String.fromString(s.substring(grainStart, end))
      else {
        var i = grainStart
        while (i + 1 < end) {
          out += UTF8String.fromString(s.substring(i, i + 2))
          i += 1
        }
      }
      grainStart = -1
    }
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (delimiter(c)) { flushWord(i); flushGrain(i) }
      else if (charGrain(c)) {
        flushWord(i)
        if (grainStart < 0) grainStart = i
      } else {
        flushGrain(i)
        if (wordStart < 0) wordStart = i
      }
      i += 1
    }
    flushWord(n); flushGrain(n)
    new GenericArrayData(out.toArray)
  }

  /** Script-token count without materializing the array — the
    * token-accounting fast path (`TextAnalysis.tokenCount` feeds
    * per-source rollups where only the count survives).
    */
  def tokenCount(text: UTF8String): Int = {
    val s = text.toString
    val n = s.length
    var count = 0
    var wordOpen = false
    var grainLen = 0
    def closeGrain(): Unit = if (grainLen > 0) {
      count += (if (grainLen == 1) 1 else grainLen - 1)
      grainLen = 0
    }
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (delimiter(c)) { wordOpen = false; closeGrain() }
      else if (charGrain(c)) {
        wordOpen = false
        grainLen += 1
      } else {
        closeGrain()
        if (!wordOpen) { count += 1; wordOpen = true }
      }
      i += 1
    }
    closeGrain()
    count
  }
}

/** `graft_tokens(text)` — script-aware tokens via [[TokensKit.tokens]]:
  * space-split words for space-delimited scripts (ASCII parity with
  * `[^ ]+`), character bigrams within Han/kana/Hangul/Thai runs.
  */
case class ScriptTokensExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_tokens expects STRING, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_tokens"

  override def nullSafeEval(input: Any): Any =
    TokensKit.tokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokensKit.tokens($c)")

  override protected def withNewChildInternal(newChild: Expression): ScriptTokensExpr =
    copy(child = newChild)
}

/** `graft_token_count(text)` — [[TokensKit.tokenCount]]: the size of
  * `graft_tokens(text)` without materializing the array (token
  * accounting feeds per-source rollups where only the count
  * survives). Same null-in/null-out contract as `size(graft_tokens)`.
  */
case class ScriptTokenCountExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_token_count expects STRING, got ${other.catalogString}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_token_count"

  override def nullSafeEval(input: Any): Any =
    TokensKit.tokenCount(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokensKit.tokenCount($c)")

  override protected def withNewChildInternal(newChild: Expression): ScriptTokenCountExpr =
    copy(child = newChild)
}

/** `graft_canon(text)` — canonical text via [[TextKernels.canon]]. */
case class CanonTextExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_canon expects STRING, got ${other.catalogString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_canon"

  override def nullSafeEval(input: Any): Any =
    TextKernels.canon(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.canon($c)")

  override protected def withNewChildInternal(newChild: Expression): CanonTextExpr =
    copy(child = newChild)
}
