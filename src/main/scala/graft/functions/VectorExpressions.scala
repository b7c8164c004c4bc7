package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the float-vector dot product — the
  * hot inner loop of every similarity operator (cosine top-k, LSH
  * re-rank, embedding near-dup).
  *
  * Why a custom `Expression` and not `zip_with` + `aggregate`: the
  * higher-order-function pair allocates a lambda frame and an
  * intermediate array per ROW and is evaluated by the interpreter;
  * this expression compiles (`doGenCode`) to a tight primitive `for`
  * loop inside whole-stage codegen — no allocation, no virtual calls.
  * Summation order (index 0 → n−1, double accumulation) is IDENTICAL
  * to the HOF formulation, so results are bit-for-bit unchanged and
  * the DuckDB oracles keep matching. Null semantics are also the
  * HOF's: mismatched lengths or a null element yield NULL (zip_with
  * pads the shorter side with null; null propagates through `+`) —
  * never a silent truncation or a null-read-as-0.
  */
case class FloatDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // ExpectsInputTypes is unusable outside the sql package
  // (AbstractDataType is private[sql]) — hand-rolled check instead.
  // Both ARRAY<FLOAT> and ARRAY<DOUBLE> sides are accepted (r19: the
  // Pca power-iteration dots a float embedding against a double model
  // literal; the per-element arithmetic is the float's exact double
  // widening either way, so float/float callers are bit-unchanged).
  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(elemType(_).isDefined)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects two ARRAY<FLOAT|DOUBLE> arguments, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val xf = elemType(left).contains(FloatType)
    val yf = elemType(right).contains(FloatType)
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      def get(arr: String, e: Expression): String =
        if (elemType(e).contains(FloatType)) s"(double) $arr.getFloat($i)"
        else s"$arr.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $sum = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $sum += ${get(a, left)} * ${get(b, right)};
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $sum; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDotProduct =
    copy(left = newLeft, right = newRight)
}

/** Registration: both the `SparkSessionExtensions` injection point (for
  * `spark.sql.extensions=graft.functions.GraftExtensions` on a cluster)
  * and an imperative `register` for already-built sessions
  * (`Graft.session` calls it, so every engine entry point has the
  * function).
  */
object GraftFunctions {
  import org.apache.spark.sql.catalyst.expressions.Literal

  private def intLit(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal INT parameter, got $other")
  }

  // SQL numeric literals arrive as INT, DOUBLE ("0.0D"), or DECIMAL
  // ("0.0") depending on how they were spelled — accept all three.
  private def doubleLit(e: Expression, fn: String): Double = e match {
    case Literal(v: Double, _) => v
    case Literal(v: Int, _) => v.toDouble
    case Literal(v: Long, _) => v.toDouble
    case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal numeric parameter, got $other")
  }

  private[functions] val dotInfo = (
    FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[FloatDotProduct].getName, "graft_dot"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "graft_dot takes exactly 2 arguments")
      FloatDotProduct(children.head, children(1)): Expression
    })

  private[functions] val minhashInfo = (
    FunctionIdentifier("graft_minhash"),
    new ExpressionInfo(classOf[MinhashSignatureExpr].getName, "graft_minhash"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "graft_minhash takes (tokens, k)")
      MinhashSignatureExpr(children.head, intLit(children(1), "graft_minhash")): Expression
    })

  private[functions] val simhashInfo = (
    FunctionIdentifier("graft_simhash"),
    new ExpressionInfo(classOf[SimhashExpr].getName, "graft_simhash"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "graft_simhash takes (tokens, bits)")
      SimhashExpr(children.head, intLit(children(1), "graft_simhash")): Expression
    })

  private[functions] val shinglesInfo = (
    FunctionIdentifier("graft_shingles"),
    new ExpressionInfo(classOf[ShinglesExpr].getName, "graft_shingles"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "graft_shingles takes (tokens, n)")
      ShinglesExpr(children.head, intLit(children(1), "graft_shingles")): Expression
    })

  private[functions] val overlapInfo = (
    FunctionIdentifier("graft_overlap"),
    new ExpressionInfo(classOf[SortedOverlapExpr].getName, "graft_overlap"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "graft_overlap takes exactly 2 arguments")
      SortedOverlapExpr(children.head, children(1)): Expression
    })

  private[functions] val kmvInfo = (
    FunctionIdentifier("graft_kmv"),
    new ExpressionInfo(classOf[KmvSketchAgg].getName, "graft_kmv"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "graft_kmv takes (hash, k)")
      KmvSketchAgg(children.head, intLit(children(1), "graft_kmv")): Expression
    })

  private[functions] val canonInfo = (
    FunctionIdentifier("graft_canon"),
    new ExpressionInfo(classOf[CanonTextExpr].getName, "graft_canon"),
    (children: Seq[Expression]) => {
      require(children.size == 1, "graft_canon takes exactly 1 argument")
      CanonTextExpr(children.head): Expression
    })

  private[functions] val bloomInfo = (
    FunctionIdentifier("graft_bloom"),
    new ExpressionInfo(classOf[BloomFilterAgg].getName, "graft_bloom"),
    (children: Seq[Expression]) => {
      require(children.size == 3, "graft_bloom takes (key, words, k)")
      BloomFilterAgg(children.head, intLit(children(1), "graft_bloom"),
        intLit(children(2), "graft_bloom")): Expression
    })

  private[functions] val bloomContainsInfo = (
    FunctionIdentifier("graft_bloom_contains"),
    new ExpressionInfo(classOf[BloomContainsExpr].getName,
      "graft_bloom_contains"),
    (children: Seq[Expression]) => {
      require(children.size == 3,
        "graft_bloom_contains takes (bloom, value, k)")
      BloomContainsExpr(children.head, children(1),
        intLit(children(2), "graft_bloom_contains")): Expression
    })

  private[functions] val cmsInfo = (
    FunctionIdentifier("graft_cms"),
    new ExpressionInfo(classOf[CmsSketchAgg].getName, "graft_cms"),
    (children: Seq[Expression]) => {
      require(children.size == 3, "graft_cms takes (hash, d, w)")
      CmsSketchAgg(children.head, intLit(children(1), "graft_cms"),
        intLit(children(2), "graft_cms")): Expression
    })

  private[functions] val histInfo = (
    FunctionIdentifier("graft_hist"),
    new ExpressionInfo(classOf[HistSketchAgg].getName, "graft_hist"),
    (children: Seq[Expression]) => {
      require(children.size == 4, "graft_hist takes (value, lo, hi, nbins)")
      HistSketchAgg(children.head, doubleLit(children(1), "graft_hist"),
        doubleLit(children(2), "graft_hist"),
        intLit(children(3), "graft_hist")): Expression
    })

  private[functions] val urlCanonInfo = (
    FunctionIdentifier("graft_urlcanon"),
    new ExpressionInfo(classOf[UrlCanonExpr].getName, "graft_urlcanon"),
    (children: Seq[Expression]) => {
      require(children.size == 1, "graft_urlcanon takes exactly 1 argument")
      UrlCanonExpr(children.head): Expression
    })

  private[functions] val urlDomainInfo = (
    FunctionIdentifier("graft_urldomain"),
    new ExpressionInfo(classOf[UrlDomainExpr].getName, "graft_urldomain"),
    (children: Seq[Expression]) => {
      require(children.size == 1, "graft_urldomain takes exactly 1 argument")
      UrlDomainExpr(children.head): Expression
    })

  /** The pattern array IS the automaton — it must be plan-time
    * literal, arriving either as CreateArray(Literal…) (the
    * `array(lit(...))` spelling) or as one array Literal (`lit(...)`
    * of a Scala collection / a folded constant).
    */
  private def literalStrings(e: Expression, fn: String): Seq[String] =
    e match {
      case org.apache.spark.sql.catalyst.expressions.CreateArray(elems, _) =>
        elems.map {
          case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) =>
            s.toString
          case other => throw new IllegalArgumentException(
            s"$fn pattern must be a string literal, got $other")
        }
      case Literal(a: org.apache.spark.sql.catalyst.util.ArrayData,
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.StringType, _)) =>
        a.toArray[org.apache.spark.unsafe.types.UTF8String](
          org.apache.spark.sql.types.StringType).map(_.toString).toSeq
      case other => throw new IllegalArgumentException(
        s"$fn expects a literal pattern array, got $other")
    }

  private[functions] val urlPathInfo = (
    FunctionIdentifier("graft_urlpath"),
    new ExpressionInfo(classOf[UrlPathExpr].getName, "graft_urlpath"),
    (children: Seq[Expression]) => {
      require(children.size == 1, "graft_urlpath takes exactly 1 argument")
      UrlPathExpr(children.head): Expression
    })

  private[functions] val urlPathQueryInfo = (
    FunctionIdentifier("graft_urlpathq"),
    new ExpressionInfo(classOf[UrlPathQueryExpr].getName,
      "graft_urlpathq"),
    (children: Seq[Expression]) => {
      require(children.size == 1,
        "graft_urlpathq takes exactly 1 argument")
      UrlPathQueryExpr(children.head): Expression
    })

  private[functions] val robotsInfo = (
    FunctionIdentifier("graft_robots_allowed"),
    new ExpressionInfo(classOf[RobotsAllowedExpr].getName,
      "graft_robots_allowed"),
    (children: Seq[Expression]) => {
      require(children.size == 2 || children.size == 3,
        "graft_robots_allowed takes (path, robots_txt[, agent-literal])")
      val agent =
        if (children.size == 2) "*"
        else children(2) match {
          case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) =>
            s.toString
          case other => throw new IllegalArgumentException(
            s"graft_robots_allowed agent must be a string literal, got $other")
        }
      RobotsAllowedExpr(children.head, children(1), agent): Expression
    })

  private[functions] val htmlTextInfo = (
    FunctionIdentifier("graft_html_text"),
    new ExpressionInfo(classOf[HtmlTextExpr].getName, "graft_html_text"),
    (children: Seq[Expression]) => {
      require(children.size == 1, "graft_html_text takes exactly 1 argument")
      HtmlTextExpr(children.head): Expression
    })

  private[functions] val htmlLinksInfo = (
    FunctionIdentifier("graft_html_links"),
    new ExpressionInfo(classOf[HtmlLinksExpr].getName, "graft_html_links"),
    (children: Seq[Expression]) => {
      require(children.size == 1, "graft_html_links takes exactly 1 argument")
      HtmlLinksExpr(children.head): Expression
    })

  private[functions] val robotsDelayInfo = (
    FunctionIdentifier("graft_robots_delay"),
    new ExpressionInfo(classOf[RobotsCrawlDelayExpr].getName,
      "graft_robots_delay"),
    (children: Seq[Expression]) => {
      require(children.size == 2,
        "graft_robots_delay takes (robots_txt, agent-literal)")
      val agent = children(1) match {
        case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) =>
          s.toString
        case other => throw new IllegalArgumentException(
          s"graft_robots_delay agent must be a string literal, got $other")
      }
      RobotsCrawlDelayExpr(children.head, agent): Expression
    })

  private[functions] val robotsSitemapsInfo = (
    FunctionIdentifier("graft_robots_sitemaps"),
    new ExpressionInfo(classOf[RobotsSitemapCountExpr].getName,
      "graft_robots_sitemaps"),
    (children: Seq[Expression]) => {
      require(children.size == 1,
        "graft_robots_sitemaps takes (robots_txt)")
      RobotsSitemapCountExpr(children.head): Expression
    })

  private[functions] val blockhitsInfo = (
    FunctionIdentifier("graft_blockhits"),
    new ExpressionInfo(classOf[BlocklistHitsExpr].getName,
      "graft_blockhits"),
    (children: Seq[Expression]) => {
      require(children.size == 2,
        "graft_blockhits takes (text, array-of-literal-patterns)")
      BlocklistHitsExpr(children.head,
        literalStrings(children(1), "graft_blockhits")): Expression
    })

  private[functions] val blockscrubInfo = (
    FunctionIdentifier("graft_blockscrub"),
    new ExpressionInfo(classOf[BlocklistScrubExpr].getName,
      "graft_blockscrub"),
    (children: Seq[Expression]) => {
      require(children.size == 3,
        "graft_blockscrub takes (text, array-of-literal-patterns, replacement)")
      val repl = children(2) match {
        case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) =>
          s.toString
        case other => throw new IllegalArgumentException(
          s"graft_blockscrub replacement must be a string literal, got $other")
      }
      BlocklistScrubExpr(children.head,
        literalStrings(children(1), "graft_blockscrub"), repl): Expression
    })

  private[functions] val httpInfo = (
    FunctionIdentifier("graft_http"),
    new ExpressionInfo(classOf[HttpEnvelopeExpr].getName, "graft_http"),
    (children: Seq[Expression]) => {
      require(children.size == 1, "graft_http takes exactly 1 argument")
      HttpEnvelopeExpr(children.head): Expression
    })

  private[functions] val httpHeadInfo = (
    FunctionIdentifier("graft_http_head"),
    new ExpressionInfo(classOf[HttpHeadExpr].getName, "graft_http_head"),
    (children: Seq[Expression]) => {
      require(children.size == 1,
        "graft_http_head takes exactly 1 argument")
      HttpHeadExpr(children.head): Expression
    })

  private[functions] val httpTextInfo = (
    FunctionIdentifier("graft_http_text"),
    new ExpressionInfo(classOf[HttpTextExpr].getName, "graft_http_text"),
    (children: Seq[Expression]) => {
      require(children.size == 1,
        "graft_http_text takes exactly 1 argument")
      HttpTextExpr(children.head): Expression
    })

  private[functions] val htmlBaseInfo = (
    FunctionIdentifier("graft_html_base"),
    new ExpressionInfo(classOf[HtmlBaseExpr].getName, "graft_html_base"),
    (children: Seq[Expression]) => {
      require(children.size == 1,
        "graft_html_base takes exactly 1 argument")
      HtmlBaseExpr(children.head): Expression
    })

  private[functions] val urlResolveInfo = (
    FunctionIdentifier("graft_urlresolve"),
    new ExpressionInfo(classOf[UrlResolveExpr].getName,
      "graft_urlresolve"),
    (children: Seq[Expression]) => {
      require(children.size == 2,
        "graft_urlresolve takes (base, href)")
      UrlResolveExpr(children.head, children(1)): Expression
    })

  private[functions] val htmlAnchorsInfo = (
    FunctionIdentifier("graft_html_anchors"),
    new ExpressionInfo(classOf[HtmlAnchorsExpr].getName,
      "graft_html_anchors"),
    (children: Seq[Expression]) => {
      require(children.size == 1,
        "graft_html_anchors takes exactly 1 argument")
      HtmlAnchorsExpr(children.head): Expression
    })

  private[functions] val robotsSitemapUrlsInfo = (
    FunctionIdentifier("graft_robots_sitemap_urls"),
    new ExpressionInfo(classOf[RobotsSitemapUrlsExpr].getName,
      "graft_robots_sitemap_urls"),
    (children: Seq[Expression]) => {
      require(children.size == 1,
        "graft_robots_sitemap_urls takes exactly 1 argument")
      RobotsSitemapUrlsExpr(children.head): Expression
    })

  private[functions] val urlPslKindInfo = (
    FunctionIdentifier("graft_psl_kind"),
    new ExpressionInfo(classOf[UrlPslKindExpr].getName, "graft_psl_kind"),
    (children: Seq[Expression]) => {
      require(children.size == 1,
        "graft_psl_kind takes exactly 1 argument")
      UrlPslKindExpr(children.head): Expression
    })

  private[functions] val httpCharsetInfo = (
    FunctionIdentifier("graft_http_charset"),
    new ExpressionInfo(classOf[HttpCharsetExpr].getName,
      "graft_http_charset"),
    (children: Seq[Expression]) => {
      require(children.size == 1,
        "graft_http_charset takes exactly 1 argument")
      HttpCharsetExpr(children.head): Expression
    })

  private[functions] val langIdInfo = (
    FunctionIdentifier("graft_langid"),
    new ExpressionInfo(classOf[LangIdExpr].getName, "graft_langid"),
    (children: Seq[Expression]) => {
      require(children.size == 1,
        "graft_langid takes exactly 1 argument")
      LangIdExpr(children.head): Expression
    })

  private[functions] val sitemapInfo = (
    FunctionIdentifier("graft_sitemap_entries"),
    new ExpressionInfo(classOf[SitemapEntriesExpr].getName,
      "graft_sitemap_entries"),
    (children: Seq[Expression]) => {
      require(children.size == 1,
        "graft_sitemap_entries takes exactly 1 argument")
      SitemapEntriesExpr(children.head): Expression
    })

  private[functions] val tokensInfo = (
    FunctionIdentifier("graft_tokens"),
    new ExpressionInfo(classOf[ScriptTokensExpr].getName, "graft_tokens"),
    (children: Seq[Expression]) => {
      require(children.size == 1,
        "graft_tokens takes exactly 1 argument")
      ScriptTokensExpr(children.head): Expression
    })

  private[functions] val tokenCountInfo = (
    FunctionIdentifier("graft_token_count"),
    new ExpressionInfo(classOf[ScriptTokenCountExpr].getName,
      "graft_token_count"),
    (children: Seq[Expression]) => {
      require(children.size == 1,
        "graft_token_count takes exactly 1 argument")
      ScriptTokenCountExpr(children.head): Expression
    })

  private[functions] val utf8LossyInfo = (
    FunctionIdentifier("graft_utf8_lossy"),
    new ExpressionInfo(classOf[Utf8LossyExpr].getName,
      "graft_utf8_lossy"),
    (children: Seq[Expression]) => {
      require(children.size == 1,
        "graft_utf8_lossy takes exactly 1 argument")
      Utf8LossyExpr(children.head): Expression
    })

  private[functions] val all =
    Seq(dotInfo, minhashInfo, simhashInfo, shinglesInfo, overlapInfo,
      kmvInfo, canonInfo, bloomInfo, bloomContainsInfo, cmsInfo, histInfo,
      blockhitsInfo, blockscrubInfo, urlCanonInfo, urlDomainInfo,
      urlPathInfo, urlPathQueryInfo, urlPslKindInfo, robotsInfo,
      robotsDelayInfo,
      robotsSitemapsInfo, robotsSitemapUrlsInfo, urlResolveInfo,
      htmlTextInfo, htmlLinksInfo, htmlAnchorsInfo, htmlBaseInfo,
      httpInfo, httpHeadInfo, httpTextInfo, httpCharsetInfo, sitemapInfo,
      langIdInfo, tokensInfo, tokenCountInfo, utf8LossyInfo)

  def register(spark: SparkSession): Unit = all.foreach { case (id, _, builder) =>
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(id.funcName, builder, "built-in")
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach(ext.injectFunction)
}
