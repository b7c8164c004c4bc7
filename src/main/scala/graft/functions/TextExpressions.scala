package graft.functions

import java.text.Normalizer
import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
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
