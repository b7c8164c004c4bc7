package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** URL canonicalization + registrable-domain kernels — the key-making
  * step of web-corpus curation: crawl snapshots carry the SAME page
  * under scheme-case/host-case variants, default ports, tracking
  * parameters, shuffled query order and fragments, so URL-level dedup
  * and per-site statistics are meaningless until URLs are reduced to a
  * canonical key. One fused per-row kernel (no intermediate strings
  * per step, stays in whole-stage codegen) instead of a 6-deep
  * `regexp_replace` chain.
  *
  * Canonical form (the documented contract, deliberately minimal and
  * bijective enough for dedup keys — NOT a fetch-equivalence claim):
  *
  *  1. scheme: lowercased; only `http`/`https` canonicalize — anything
  *     else (ftp, javascript, data, relative paths) → null;
  *  2. userinfo dropped; host lowercased, single trailing dot
  *     stripped; empty host → null;
  *  3. default ports dropped (http:80, https:443), others kept;
  *     non-numeric port → null;
  *  4. empty path → `/`; otherwise byte-preserved (no %-decoding, no
  *     dot-segment collapse — both are content-changing on hostile
  *     input and belong to a fetcher, not a dedup key);
  *  5. query: `&`-split, empty segments dropped, tracking keys removed
  *     (`utm_*` prefix and the click-id set below, key compared
  *     case-insensitively), survivors BYTE-SORTED and rejoined — query
  *     order is server-insignificant for the overwhelming majority of
  *     pages, and unsorted keys split dedup groups;
  *  6. fragment dropped (client-side only).
  *
  * The registrable domain (eTLD+1) uses a BUNDLED approximation of the
  * public-suffix list — the same curated-dimension discipline as
  * [[graft.sources.CountryDim]]: the common multi-label suffixes
  * (co.uk-style country second levels, the big PaaS site domains)
  * plus the one-label default. A full PSL swap-in is a data update,
  * not a code change.
  */
object UrlKit {

  /** Click-id / tracking keys removed from canonical queries (beside
    * the `utm_` prefix family). Lowercase; compared case-insensitively.
    */
  private val trackingKeys = Set(
    "gclid", "fbclid", "msclkid", "igshid", "mc_cid", "mc_eid",
    "ref", "ref_src")

  /** Multi-label public suffixes (bundled approximation). */
  private val multiSuffix = Set(
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "or.jp", "ne.jp",
    "com.br", "com.cn", "com.mx", "com.ar", "com.tr",
    "co.in", "co.kr", "co.za",
    "github.io", "gitlab.io", "blogspot.com", "appspot.com",
    "herokuapp.com")

  /** (scheme, host, portPart, path, query) or null if not a
    * canonicalizable http(s) URL. portPart is "" or ":NNNN" with the
    * scheme default already dropped.
    */
  private def parse(url: String): Array[String] = {
    val s = url.trim
    val schemeEnd = s.indexOf("://")
    if (schemeEnd <= 0) return null
    val scheme = s.substring(0, schemeEnd).toLowerCase(java.util.Locale.ROOT)
    if (scheme != "http" && scheme != "https") return null
    val rest = s.substring(schemeEnd + 3)
    // authority ends at the first of / ? #
    var aEnd = rest.length
    var i = 0
    while (i < aEnd) {
      val c = rest.charAt(i)
      if (c == '/' || c == '?' || c == '#') aEnd = i else i += 1
    }
    var auth = rest.substring(0, aEnd)
    val at = auth.lastIndexOf('@')
    if (at >= 0) auth = auth.substring(at + 1)
    var host = auth
    var portPart = ""
    val colon = auth.lastIndexOf(':')
    if (colon >= 0) {
      host = auth.substring(0, colon)
      val port = auth.substring(colon + 1)
      if (port.isEmpty || !port.forall(_.isDigit)) return null
      val p = port.toInt
      val isDefault =
        (scheme == "http" && p == 80) || (scheme == "https" && p == 443)
      if (!isDefault) portPart = s":$p"
    }
    host = host.toLowerCase(java.util.Locale.ROOT)
    if (host.endsWith(".")) host = host.substring(0, host.length - 1)
    if (host.isEmpty || host.exists(c => c == ' ' || c == '\t')) return null
    val tail = rest.substring(aEnd)
    val hashAt = tail.indexOf('#')
    val noFrag = if (hashAt >= 0) tail.substring(0, hashAt) else tail
    val qAt = noFrag.indexOf('?')
    val path = if (qAt >= 0) noFrag.substring(0, qAt) else noFrag
    val query = if (qAt >= 0) noFrag.substring(qAt + 1) else ""
    Array(scheme, host, portPart, if (path.isEmpty) "/" else path, query)
  }

  private def isTracking(seg: String): Boolean = {
    val eq = seg.indexOf('=')
    val key = (if (eq >= 0) seg.substring(0, eq) else seg)
      .toLowerCase(java.util.Locale.ROOT)
    key.startsWith("utm_") || trackingKeys.contains(key)
  }

  def canon(u: UTF8String): UTF8String = {
    val p = parse(u.toString)
    if (p == null) return null
    val Array(scheme, host, portPart, path, query) = p
    val keep = query.split("&", -1).filter(s => s.nonEmpty && !isTracking(s))
    java.util.Arrays.sort(keep, java.util.Comparator.naturalOrder[String]())
    val q = if (keep.isEmpty) "" else "?" + keep.mkString("&")
    UTF8String.fromString(s"$scheme://$host$portPart$path$q")
  }

  /** Canonical path component (empty → "/"), or null on non-http(s). */
  def pathOf(u: UTF8String): UTF8String = {
    val p = parse(u.toString)
    if (p == null) null else UTF8String.fromString(p(3))
  }

  def registrableDomain(u: UTF8String): UTF8String = {
    val p = parse(u.toString)
    if (p == null) return null
    val labels = p(1).split("\\.", -1)
    val n = labels.length
    val out =
      if (n <= 1) p(1)
      else {
        val last2 = labels(n - 2) + "." + labels(n - 1)
        if (multiSuffix.contains(last2))
          if (n >= 3) labels(n - 3) + "." + last2 else last2
        else last2
      }
    UTF8String.fromString(out)
  }
}

private[functions] trait UrlStringExpr extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${other.catalogString}")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  protected def kernel: String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.UrlKit.$kernel($c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })
}

/** `graft_urlcanon(url)` — canonical dedup key via [[UrlKit.canon]];
  * null for anything that is not a parseable http(s) URL.
  */
case class UrlCanonExpr(child: Expression) extends UrlStringExpr {
  override def prettyName: String = "graft_urlcanon"
  override protected def kernel: String = "canon"
  override def nullSafeEval(input: Any): Any =
    UrlKit.canon(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): UrlCanonExpr =
    copy(child = newChild)
}

/** `graft_urldomain(url)` — registrable domain (bundled-PSL eTLD+1)
  * via [[UrlKit.registrableDomain]]; null for non-http(s) input.
  */
case class UrlDomainExpr(child: Expression) extends UrlStringExpr {
  override def prettyName: String = "graft_urldomain"
  override protected def kernel: String = "registrableDomain"
  override def nullSafeEval(input: Any): Any =
    UrlKit.registrableDomain(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): UrlDomainExpr =
    copy(child = newChild)
}

/** `graft_urlpath(url)` — canonical path (empty → "/") via
  * [[UrlKit.pathOf]]; null for non-http(s) input.
  */
case class UrlPathExpr(child: Expression) extends UrlStringExpr {
  override def prettyName: String = "graft_urlpath"
  override protected def kernel: String = "pathOf"
  override def nullSafeEval(input: Any): Any =
    UrlKit.pathOf(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): UrlPathExpr =
    copy(child = newChild)
}

/** robots.txt evaluation (RFC 9309 shape) for the wildcard agent `*`:
  * parse the agent-`*` groups' Allow/Disallow prefix rules, match a
  * path by LONGEST matching prefix, Allow winning length ties; no
  * matching rule (or an empty Disallow value) → allowed. Deliberately
  * prefix-only — the `*`/`$` pattern extensions are crawler-specific,
  * and a curation audit should be conservative and portable. Parsed
  * rule sets are cached per robots text per executor (robots bodies
  * are per-site config, a few hundred bytes).
  */
object RobotsKit {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[(String, Boolean)]]()

  /** (prefix, isAllow) rules from the agent-`*` groups. */
  private[functions] def rules(txt: String): Array[(String, Boolean)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Boolean)]
    var inStar = false
    var afterRules = false
    txt.split("\n", -1).foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val ci = line.indexOf(':')
      if (ci > 0) {
        val field = line.substring(0, ci).trim
          .toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(ci + 1).trim
        field match {
          case "user-agent" =>
            // Consecutive user-agent lines accumulate one group; a
            // user-agent line AFTER rules starts a fresh group.
            if (afterRules) { inStar = value == "*"; afterRules = false }
            else inStar = inStar || value == "*"
          case "disallow" | "allow" =>
            if (inStar && value.nonEmpty)
              out += ((value, field == "allow"))
            afterRules = true
          case _ => ()
        }
      }
    }
    out.toArray
  }

  def allowed(path: UTF8String, robots: UTF8String): Boolean = {
    val rs = cache.computeIfAbsent(robots.toString, rules(_))
    val p = path.toString
    var bestLen = -1
    var bestAllow = true
    var i = 0
    while (i < rs.length) {
      val (prefix, isAllow) = rs(i)
      if (p.startsWith(prefix) &&
          (prefix.length > bestLen ||
            (prefix.length == bestLen && isAllow && !bestAllow))) {
        bestLen = prefix.length
        bestAllow = isAllow
      }
      i += 1
    }
    bestAllow
  }
}

/** `graft_robots_allowed(path, robots_txt)` → boolean via
  * [[RobotsKit.allowed]]; null if either side is null (no robots on
  * record is a POLICY question — coalesce at the call site).
  */
case class RobotsAllowedExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_robots_allowed expects (STRING, STRING), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  override def dataType: DataType =
    org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "graft_robots_allowed"

  override def nullSafeEval(path: Any, robots: Any): Any =
    RobotsKit.allowed(path.asInstanceOf[UTF8String],
      robots.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (p, r) =>
      s"graft.functions.RobotsKit.allowed($p, $r)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RobotsAllowedExpr =
    copy(left = newLeft, right = newRight)
}
