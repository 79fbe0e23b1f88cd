package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** URL parsing + canonicalization for domain-aware curation (the
  * C4/RefinedWeb-style URL handling a crawl pipeline needs: per-domain
  * caps, domain blocklists, host-keyed dedup blocks).
  *
  * Row-local and DETERMINISTIC with rules simple enough that the DuckDB
  * oracle replays them with regexp/string functions — the same
  * cross-engine-parity discipline every text kernel here follows:
  *
  *  - scheme: `[A-Za-z][A-Za-z0-9+.-]*` before "://", lowercased; a URL
  *    without "://" parses to NULL (filterable, never a throw);
  *  - authority: up to the first of `/ ? #`; userinfo (through the LAST
  *    '@') is dropped from every output (credentials must not persist);
  *  - host: lowercased, ONE trailing dot stripped, `:port` suffix split
  *    off; empty host → NULL row;
  *  - path: verbatim (case- and percent-encoding-preserving, per RFC);
  *    empty → "/";
  *  - query: verbatim, no parameter reordering; fragment: dropped;
  *  - canonical_url: scheme://host[:port]path[?query] with the scheme's
  *    DEFAULT port stripped (http 80, https 443, ftp 21, ws 80, wss 443);
  *  - registrable_domain (eTLD+1): the last label plus one, except when
  *    the last TWO labels form a multi-part public suffix from
  *    [[UrlKit.MultiPartSuffixes]] (then last three). IPv4 hosts and
  *    single-label hosts are their own registrable domain. The suffix set
  *    is a deliberate ~50-entry approximation of the Public Suffix List's
  *    head — the full PSL is a data file, not logic; swap it in via the
  *    same hook at deployment.
  */
object UrlKit {

  /** Multi-part public suffixes (PSL head): when a host's last two labels
    * are in this set the registrable domain takes three labels. */
  val MultiPartSuffixes: Set[String] = Set(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk", "ltd.uk", "plc.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "id.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp", "ad.jp",
    "com.br", "net.br", "org.br", "gov.br",
    "co.in", "net.in", "org.in", "gen.in", "firm.in", "ind.in",
    "co.nz", "net.nz", "org.nz", "govt.nz",
    "co.za", "org.za", "web.za",
    "com.mx", "org.mx", "com.ar", "com.cn", "net.cn", "org.cn", "gov.cn",
    "com.tr", "com.tw", "co.kr", "or.kr", "go.kr",
    "com.sg", "com.hk", "com.my", "co.th", "com.vn", "com.ua",
    "co.il", "org.il", "com.co", "com.pe", "com.ve", "com.eg", "com.sa",
    "co.id", "com.ph", "com.pk", "com.bd", "com.ng")

  private val DefaultPorts = Map(
    "http" -> "80", "https" -> "443", "ftp" -> "21", "ws" -> "80", "wss" -> "443")

  /** The struct [[UrlPartsScan]] returns. */
  val Schema: StructType = StructType(Seq(
    StructField("scheme", StringType, nullable = true),
    StructField("host", StringType, nullable = true),
    StructField("registrable_domain", StringType, nullable = true),
    StructField("path", StringType, nullable = true),
    StructField("qs", StringType, nullable = true),
    StructField("canonical_url", StringType, nullable = true)))

  private def isSchemeChar(c: Char, first: Boolean): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (!first && ((c >= '0' && c <= '9') || c == '+' || c == '.' || c == '-'))

  def registrable(host: String): String = {
    if (host.forall(c => (c >= '0' && c <= '9') || c == '.')) return host // IPv4
    val parts = host.split('.')
    if (parts.length <= 1) host
    else {
      val last2 = parts(parts.length - 2) + "." + parts(parts.length - 1)
      if (parts.length >= 3 && MultiPartSuffixes.contains(last2))
        parts(parts.length - 3) + "." + last2
      else last2
    }
  }

  /** Cheap validity boundary-pass: true ⟺ [[parse]] returns non-null
    * (spec-pinned equivalence). This is the predicate to FILTER on —
    * scheme/host checks only, no struct or string building — so the
    * parse kernel itself never lands in a Filter condition and runs
    * exactly once, in the Project (the token_count-in-pushed-Filters
    * idiom). */
  def isValid(urlU: UTF8String): Boolean = {
    val url = urlU.toString.trim
    val sep = url.indexOf("://")
    if (sep <= 0) return false
    var i = 0
    while (i < sep) {
      if (!isSchemeChar(url.charAt(i), i == 0)) return false
      i += 1
    }
    var authEnd = url.length
    var k = sep + 3
    while (k < authEnd) {
      val c = url.charAt(k)
      if (c == '/' || c == '?' || c == '#') { authEnd = k } else k += 1
    }
    val at = url.lastIndexOf('@', authEnd - 1)
    val hostStart = if (at >= sep + 3) at + 1 else sep + 3
    val colon = url.lastIndexOf(':', authEnd - 1)
    // >= hostStart: a colon AT the host start is still a port separator
    // (parse then sees an empty host and returns null — ':80' hosts)
    var portDigits = colon >= hostStart && colon < authEnd - 1
    k = colon + 1
    while (portDigits && k < authEnd) {
      val c = url.charAt(k)
      if (c < '0' || c > '9') portDigits = false
      k += 1
    }
    var hostEnd = if (portDigits) colon else authEnd
    // ONE trailing dot is stripped by parse; an empty host after that fails
    if (hostEnd > hostStart && url.charAt(hostEnd - 1) == '.') hostEnd -= 1
    hostEnd > hostStart
  }

  /** NULL for unparseable input (no scheme separator / empty host). */
  def parse(urlU: UTF8String): InternalRow = {
    val url = urlU.toString.trim
    val sep = url.indexOf("://")
    if (sep <= 0) return null
    var i = 0
    while (i < sep) {
      if (!isSchemeChar(url.charAt(i), i == 0)) return null
      i += 1
    }
    val scheme = url.substring(0, sep).toLowerCase
    val rest = url.substring(sep + 3)
    var authEnd = rest.length
    var k = 0
    while (k < authEnd) {
      val c = rest.charAt(k)
      if (c == '/' || c == '?' || c == '#') { authEnd = k }
      else k += 1
    }
    val auth0 = rest.substring(0, authEnd)
    // drop userinfo through the LAST '@'
    val at = auth0.lastIndexOf('@')
    val hostPort = if (at >= 0) auth0.substring(at + 1) else auth0
    val colon = hostPort.lastIndexOf(':')
    val portDigits = colon >= 0 && colon < hostPort.length - 1 &&
      hostPort.substring(colon + 1).forall(c => c >= '0' && c <= '9')
    val port = if (portDigits) hostPort.substring(colon + 1) else ""
    val host0 = (if (portDigits) hostPort.substring(0, colon) else hostPort).toLowerCase
    val host = if (host0.endsWith(".")) host0.substring(0, host0.length - 1) else host0
    if (host.isEmpty) return null
    // path up to '?' or '#'; query up to '#'
    val tail = rest.substring(authEnd)
    var pathEnd = tail.length
    k = 0
    while (k < pathEnd) {
      val c = tail.charAt(k)
      if (c == '?' || c == '#') { pathEnd = k } else k += 1
    }
    val path = if (pathEnd == 0) "/" else tail.substring(0, pathEnd)
    val qs =
      if (pathEnd < tail.length && tail.charAt(pathEnd) == '?') {
        val h = tail.indexOf('#', pathEnd + 1)
        if (h < 0) tail.substring(pathEnd + 1) else tail.substring(pathEnd + 1, h)
      } else ""
    val keepPort = port.nonEmpty && !DefaultPorts.get(scheme).contains(port)
    val canonical = scheme + "://" + host +
      (if (keepPort) ":" + port else "") + path +
      (if (qs.nonEmpty) "?" + qs else "")
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(scheme), UTF8String.fromString(host),
      UTF8String.fromString(registrable(host)), UTF8String.fromString(path),
      UTF8String.fromString(qs), UTF8String.fromString(canonical)))
  }
}

/** `url_parts(url)`: struct(scheme, host, registrable_domain, path, qs,
  * canonical_url) — row-local, null on unparseable input; see [[UrlKit]]
  * for the canonicalization contract and its DuckDB replay. */
case class UrlPartsScan(child: Expression) extends UnaryExpression {
  override def dataType: DataType = UrlKit.Schema
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    UrlKit.parse(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.UrlKit.parse($c);
      ${ev.isNull} = ${ev.value} == null;
    """)
  override def prettyName: String = "url_parts"
  override protected def withNewChildInternal(newChild: Expression): UrlPartsScan =
    copy(child = newChild)
}

/** `url_valid(url)`: boundary-pass validity check, true ⟺ `url_parts`
  * parses — cheap enough for a pushed Filter, so the parse kernel never
  * evaluates twice (Filter + Project). */
case class UrlValidScan(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullSafeEval(input: Any): Any =
    UrlKit.isValid(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UrlKit.isValid($c)")
  override def prettyName: String = "url_valid"
  override protected def withNewChildInternal(newChild: Expression): UrlValidScan =
    copy(child = newChild)
}
