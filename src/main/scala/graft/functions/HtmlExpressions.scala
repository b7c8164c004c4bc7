package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** HTML → text / link extraction — the step that turns a crawled WARC
  * payload into trainable text (and the link edges a domain graph is
  * built from). One single-pass scanner per document riding the corpus
  * scan: no DOM, no external parser, total on arbitrarily broken
  * markup (real crawl HTML is broken markup).
  *
  * Text contract (deliberately minimal — boilerplate REMOVAL beyond
  * script/style is a modeling choice that belongs in quality gates):
  *  - comments (`<!-- -->`), `script`/`style`/`noscript` element
  *    CONTENTS, and all tags are dropped; every dropped construct is a
  *    word boundary;
  *  - attribute values may contain `>` (quoted scanning — the classic
  *    naive-regex-stripper trap);
  *  - character references decode once, never recursively: the named
  *    ones every crawl actually hits (`amp lt gt quot apos nbsp`) plus
  *    numeric `&#NNN;` / `&#xHH;`; unknown ones pass through raw;
  *  - whitespace (incl. NBSP) collapses to single spaces, trimmed.
  *
  * Links: `href` values of `<a>` tags, in document order, entities
  * decoded, raw otherwise (resolution against a base URL is the
  * caller's join — [[UrlKit]] canonicalizes absolute http(s) ones).
  */
object HtmlKit {

  /** Anchor-text capture cap (chars): bounds the per-row cost of a
    * hostile/unclosed `<a>` that would otherwise capture the whole
    * document as its "text".
    */
  private val MaxAnchorChars = 512

  private def decodeEntity(s: String, start: Int, out: StringBuilder): Int = {
    // s(start) == '&'; returns the index AFTER the consumed reference,
    // or start+1 with '&' emitted raw when it isn't one.
    val semi = s.indexOf(';', start + 1)
    if (semi < 0 || semi - start > 10) { out.append('&'); return start + 1 }
    val body = s.substring(start + 1, semi)
    val decoded: String = body match {
      case "amp" => "&"
      case "lt" => "<"
      case "gt" => ">"
      case "quot" => "\""
      case "apos" => "'"
      case "nbsp" => "\u00A0"
      // the high-frequency tail of real crawl pages (round 16):
      // punctuation, signs, currency \u2014 still decode-once, unknown raw
      case "mdash" => "\u2014"
      case "ndash" => "\u2013"
      case "hellip" => "\u2026"
      case "lsquo" => "\u2018"
      case "rsquo" => "\u2019"
      case "ldquo" => "\u201C"
      case "rdquo" => "\u201D"
      case "laquo" => "\u00AB"
      case "raquo" => "\u00BB"
      case "bull" => "\u2022"
      case "middot" => "\u00B7"
      case "copy" => "\u00A9"
      case "reg" => "\u00AE"
      case "trade" => "\u2122"
      case "deg" => "\u00B0"
      case "plusmn" => "\u00B1"
      case "times" => "\u00D7"
      case "divide" => "\u00F7"
      case "micro" => "\u00B5"
      case "euro" => "\u20AC"
      case "pound" => "\u00A3"
      case "yen" => "\u00A5"
      case "cent" => "\u00A2"
      case "sect" => "\u00A7"
      case "para" => "\u00B6"
      case "shy" => "" // soft hyphen: zero-width, drop outright
      case b if b.length > 1 && b.charAt(0) == '#' =>
        val cp =
          if (b.charAt(1) == 'x' || b.charAt(1) == 'X')
            try Integer.parseInt(b.substring(2), 16) catch { case _: Exception => -1 }
          else
            try Integer.parseInt(b.substring(1)) catch { case _: Exception => -1 }
        if (cp >= 0 && Character.isValidCodePoint(cp))
          new String(Character.toChars(cp))
        else null
      case _ => null
    }
    if (decoded == null) { out.append('&'); start + 1 }
    else { out.append(decoded); semi + 1 }
  }

  /** The shared walk. Returns (text, hrefs, (href, anchorText) pairs).
    * Anchor capture (wantAnchors) pairs each href-carrying `<a>` with
    * the collapsed text up to its `</a>` \u2014 the ranking/training signal
    * raw hrefs lack; an unclosed anchor flushes at the next `<a>` or
    * EOF (the browser recovery), inner tags are word boundaries, and
    * script/style content never leaks in.
    */
  private def scan(html: String, wantText: Boolean,
      wantLinks: Boolean, wantAnchors: Boolean = false)
      : (String, Seq[String], Seq[(String, String)]) = {
    val n = html.length
    val text = new StringBuilder
    val links = scala.collection.mutable.ArrayBuffer.empty[String]
    val anchors =
      scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var pendingSpace = false
    var anchorHref: String = null
    val anchorText = new StringBuilder
    var anchorPending = false
    def flushAnchor(): Unit = {
      if (anchorHref != null) {
        anchors += ((anchorHref, anchorText.result()))
        anchorHref = null
      }
      anchorText.clear()
      anchorPending = false
    }
    def emit(c: Char): Unit = {
      // NBSP is NOT Java-isWhitespace; crawl text treats it as space
      val ws = c == '\u00A0' || c.isWhitespace
      if (wantText) {
        if (ws) pendingSpace = true
        else {
          if (pendingSpace && text.nonEmpty) text.append(' ')
          pendingSpace = false
          text.append(c)
        }
      }
      if (anchorHref != null && anchorText.length < MaxAnchorChars) {
        // capped: an UNCLOSED <a> captures to EOF (browser recovery),
        // and an anchor carrying the whole document would bloat every
        // downstream shuffle row — 512 chars is past any real label
        if (ws) anchorPending = true
        else {
          if (anchorPending && anchorText.nonEmpty) anchorText.append(' ')
          anchorPending = false
          anchorText.append(c)
        }
      }
    }
    def emitStr(s: String): Unit = s.foreach(emit)
    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.regionMatches(i, "<!--", 0, 4)) {
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else {
          // tag name
          var j = i + 1
          val closing = j < n && html.charAt(j) == '/'
          if (closing) j += 1
          val nameStart = j
          while (j < n && (html.charAt(j).isLetterOrDigit)) j += 1
          val name = html.substring(nameStart, j)
            .toLowerCase(java.util.Locale.ROOT)
          // attributes up to '>', quote-aware; collect href on <a>
          var href: String = null
          var selfClose = false
          while (j < n && html.charAt(j) != '>') {
            val a = html.charAt(j)
            if (a == '"' || a == '\'') {
              val q = html.indexOf(a, j + 1)
              j = if (q < 0) n else q + 1
            } else if (!closing && name == "a" &&
                (wantLinks || wantAnchors) &&
                (a.isLetter) && href == null &&
                html.regionMatches(true, j, "href", 0, 4) &&
                (j + 4 >= n || !html.charAt(j + 4).isLetterOrDigit) &&
                // attribute-NAME left boundary: `data-href=` / `xhref=`
                // must not capture — the char before must end a name
                { val p = html.charAt(j - 1)
                  !(p.isLetterOrDigit || p == '-' || p == '_') }) {
              var k = j + 4
              while (k < n && html.charAt(k).isWhitespace) k += 1
              if (k < n && html.charAt(k) == '=') {
                k += 1
                while (k < n && html.charAt(k).isWhitespace) k += 1
                if (k < n && (html.charAt(k) == '"' || html.charAt(k) == '\'')) {
                  val quote = html.charAt(k)
                  val endQ = html.indexOf(quote, k + 1)
                  val raw = html.substring(k + 1, if (endQ < 0) n else endQ)
                  href = decodeAll(raw)
                  j = if (endQ < 0) n else endQ + 1
                } else {
                  var e = k
                  while (e < n && !html.charAt(e).isWhitespace &&
                    html.charAt(e) != '>') e += 1
                  href = decodeAll(html.substring(k, e))
                  j = e
                }
              } else j = k
            } else {
              if (a == '/' && j + 1 < n && html.charAt(j + 1) == '>')
                selfClose = true
              j += 1
            }
          }
          i = if (j < n) j + 1 else n
          if (wantLinks && href != null && href.nonEmpty) links += href
          if (wantAnchors && name == "a") {
            // a new <a> implicitly closes an unclosed one (browser
            // recovery); </a> flushes the captured pair
            flushAnchor()
            if (!closing && href != null && href.nonEmpty) {
              anchorHref = href
              if (selfClose) flushAnchor()
            }
          }
          // drop raw content of script/style/noscript elements
          if (!closing && !selfClose &&
              (name == "script" || name == "style" || name == "noscript")) {
            var k = i
            var found = -1
            while (found < 0 && k < n) {
              val lt = html.indexOf('<', k)
              if (lt < 0) found = n
              else if (html.regionMatches(true, lt, "</", 0, 2) &&
                  html.regionMatches(true, lt + 2, name, 0, name.length) &&
                  // name RIGHT boundary: `</scripting>` inside a script
                  // body must not end the skip (truncation at EOF does)
                  { val e = lt + 2 + name.length
                    e >= n || { val b = html.charAt(e)
                      b == '>' || b == '/' || b == ' ' ||
                        b.isWhitespace } }) {
                val gt = html.indexOf('>', lt)
                found = if (gt < 0) n else gt + 1
              } else k = lt + 1
            }
            i = if (found < 0) n else found
          }
          pendingSpace = true // every tag is a word boundary
          anchorPending = true
        }
      } else if (c == '&' && (wantText || anchorHref != null)) {
        // decode into a tiny buffer, then route the decoded chars
        // through the same whitespace-collapse emit (so &nbsp; folds
        // like any other whitespace)
        val buf = new StringBuilder
        i = decodeEntity(html, i, buf)
        emitStr(buf.toString)
      } else {
        if (wantText || anchorHref != null) emit(c)
        i += 1
      }
    }
    flushAnchor()
    (text.result(), links.toSeq, anchors.toSeq)
  }

  private[functions] def decodeAll(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val out = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '&') i = decodeEntity(s, i, out)
      else { out.append(s.charAt(i)); i += 1 }
    }
    out.result()
  }

  def text(html: UTF8String): UTF8String =
    UTF8String.fromString(scan(html.toString, wantText = true,
      wantLinks = false)._1)

  def links(html: UTF8String): ArrayData =
    new GenericArrayData(scan(html.toString, wantText = false,
      wantLinks = true)._2.map(UTF8String.fromString).toArray[Any])

  /** (href, anchor text) pairs in document order — the ranking/
    * training signal raw hrefs lack. Text is collapsed exactly like
    * [[text]]; anchors without an href contribute nothing.
    */
  def anchors(html: UTF8String): ArrayData =
    new GenericArrayData(scan(html.toString, wantText = false,
      wantLinks = false, wantAnchors = true)._3
      .map { case (href, t) =>
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](UTF8String.fromString(href), UTF8String.fromString(t)))
      }.toArray[Any])

  /** The first `<base href>` value (entity-decoded, may itself be
    * relative — resolving it against the page URL is the caller's
    * step), or null when the document declares none. A tiny dedicated
    * scan: quote-aware to the tag's real `>`, name-boundary-checked
    * both for the tag (`<basefont>` must not match) and the attribute
    * (`data-href` must not). Total on junk.
    */
  def baseHref(html: UTF8String): UTF8String = {
    val s = html.toString
    val n = s.length
    var i = 0
    while (i < n) {
      val lt = s.indexOf('<', i)
      if (lt < 0) return null
      if (s.regionMatches(true, lt + 1, "base", 0, 4) && {
        val e = lt + 5
        e >= n || s.charAt(e) == '>' || s.charAt(e) == '/' ||
          s.charAt(e).isWhitespace
      }) {
        // scan this tag's attributes, quote-aware
        var j = lt + 5
        while (j < n && s.charAt(j) != '>') {
          val c = s.charAt(j)
          if (c == '"' || c == '\'') {
            val q = s.indexOf(c, j + 1)
            j = if (q < 0) n else q + 1
          } else if (c.isLetter &&
              s.regionMatches(true, j, "href", 0, 4) &&
              (j + 4 >= n || !s.charAt(j + 4).isLetterOrDigit) &&
              { val p = s.charAt(j - 1)
                !(p.isLetterOrDigit || p == '-' || p == '_') }) {
            var k = j + 4
            while (k < n && s.charAt(k).isWhitespace) k += 1
            if (k < n && s.charAt(k) == '=') {
              k += 1
              while (k < n && s.charAt(k).isWhitespace) k += 1
              if (k < n && (s.charAt(k) == '"' || s.charAt(k) == '\'')) {
                val quote = s.charAt(k)
                val endQ = s.indexOf(quote, k + 1)
                val raw = s.substring(k + 1, if (endQ < 0) n else endQ)
                val v = decodeAll(raw).trim
                return if (v.isEmpty) null else UTF8String.fromString(v)
              } else {
                var e = k
                while (e < n && !s.charAt(e).isWhitespace &&
                  s.charAt(e) != '>') e += 1
                val v = decodeAll(s.substring(k, e)).trim
                return if (v.isEmpty) null else UTF8String.fromString(v)
              }
            } else j = k
          } else j += 1
        }
        i = if (j < n) j + 1 else n
      } else i = lt + 1
    }
    null
  }

  private[functions] val anchorSchema: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("href", StringType,
        nullable = false),
      org.apache.spark.sql.types.StructField("text", StringType,
        nullable = false))),
    containsNull = false)
}

/** `graft_html_text(html)` — extracted plain text via [[HtmlKit.text]];
  * null propagates.
  */
case class HtmlTextExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_html_text expects STRING, got ${other.catalogString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_html_text"

  override def nullSafeEval(html: Any): Any =
    HtmlKit.text(html.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, h => s"graft.functions.HtmlKit.text($h)")

  override protected def withNewChildInternal(
      newChild: Expression): HtmlTextExpr = copy(child = newChild)
}

/** `graft_html_links(html)` — `href` values of `<a>` tags in document
  * order via [[HtmlKit.links]]; null propagates.
  */
case class HtmlLinksExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_html_links expects STRING, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_html_links"

  override def nullSafeEval(html: Any): Any =
    HtmlKit.links(html.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, h => s"graft.functions.HtmlKit.links($h)")

  override protected def withNewChildInternal(
      newChild: Expression): HtmlLinksExpr = copy(child = newChild)
}

/** `graft_html_anchors(html)` — array<struct<href, text>> of `<a>`
  * tags in document order via [[HtmlKit.anchors]]; null propagates.
  */
case class HtmlAnchorsExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_html_anchors expects STRING, got ${other.catalogString}")
  }
  override def dataType: DataType = HtmlKit.anchorSchema
  override def prettyName: String = "graft_html_anchors"

  override def nullSafeEval(html: Any): Any =
    HtmlKit.anchors(html.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, h => s"graft.functions.HtmlKit.anchors($h)")

  override protected def withNewChildInternal(
      newChild: Expression): HtmlAnchorsExpr = copy(child = newChild)
}

/** `graft_html_base(html)` — the first `<base href>` value via
  * [[HtmlKit.baseHref]]; null when absent; null propagates.
  */
case class HtmlBaseExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_html_base expects STRING, got ${other.catalogString}")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_html_base"

  override def nullSafeEval(html: Any): Any =
    HtmlKit.baseHref(html.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, h => {
      s"""
         |${ev.value} = graft.functions.HtmlKit.baseHref($h);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): HtmlBaseExpr = copy(child = newChild)
}
