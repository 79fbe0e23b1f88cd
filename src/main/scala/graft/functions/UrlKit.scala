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
  *  - registrable_domain (eTLD+1): the public suffix plus one label,
  *    where the public suffix is resolved against PSL-SHAPED rules
  *    ([[SuffixRules]]: exact rules of any label depth, `*.zone`
  *    wildcard rules, `!site.zone` exception rules — the
  *    publicsuffix.org matching algorithm: exceptions prevail, else the
  *    longest matching rule, else the implicit `*` default). IPv4 hosts,
  *    single-label hosts, and hosts that ARE a public suffix map to
  *    themselves (graceful never-null attribution). The zero-config rule
  *    set is [[UrlKit.HeadRules]], a deliberate head sample of the real
  *    PSL (ICANN two-label zones + hosting-platform private suffixes +
  *    the `*.jp` city wildcards with their `!city.*` exceptions); the
  *    FULL list loads from a data file — `-Dgraft.psl.path=<file>` or a
  *    `/graft-public-suffix-list.dat` classpath resource — parsed with
  *    [[UrlKit.parsePsl]]. Both are per-JVM static initialization, so on
  *    a cluster ship the file with the job (`--files` + the property, or
  *    bake the resource into the jar) and every executor resolves the
  *    same rules; [[UrlKit.setRules]] is for tests/local sessions only.
  */
object UrlKit {

  /** PSL-shaped suffix rule set (publicsuffix.org/list semantics).
    * `wildcard` stores `*.zone` rules as `zone`; `exception` stores
    * `!site.zone` rules as `site.zone`. */
  final case class SuffixRules(
      exact: Set[String], wildcard: Set[String], exception: Set[String])

  /** Multi-part public suffixes (ICANN PSL head): two-label country
    * zones whose registrable domain takes three labels. */
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

  /** PSL private-section head: hosting platforms whose subdomains are
    * UNRELATED sites — without these, `capPerDomain` quotas, `domainSplits`
    * leakage guarantees, and blocklists collapse thousands of tenants
    * (every *.github.io page) into one registrable domain. All entries
    * are on the real PSL; note `s3.amazonaws.com` is a THREE-label rule —
    * the rule engine handles any depth. */
  val PrivateSuffixHead: Set[String] = Set(
    "github.io", "blogspot.com", "web.app", "herokuapp.com", "netlify.app",
    "vercel.app", "pages.dev", "workers.dev", "appspot.com",
    "firebaseapp.com", "azurewebsites.net", "cloudfront.net",
    "s3.amazonaws.com")

  /** PSL wildcard head: the `*.jp` city zones (every direct subdomain is
    * itself a public suffix) … */
  val WildcardHead: Set[String] = Set(
    "kawasaki.jp", "kitakyushu.jp", "kobe.jp", "nagoya.jp", "sapporo.jp",
    "sendai.jp", "yokohama.jp")

  /** … with the PSL's matching `!city.<zone>` exception rules (the city
    * government sites are ordinary registrable domains). */
  val ExceptionHead: Set[String] = WildcardHead.map("city." + _)

  /** Zero-config default: a head sample of the real PSL across all three
    * rule forms. */
  val HeadRules: SuffixRules =
    SuffixRules(MultiPartSuffixes ++ PrivateSuffixHead, WildcardHead, ExceptionHead)

  @volatile private var rulesRef: SuffixRules = null

  /** The rule set the kernel (and the oracle SQL generator) resolve
    * against — initialized once per JVM from `-Dgraft.psl.path`, else the
    * `/graft-public-suffix-list.dat` classpath resource, else
    * [[HeadRules]]. */
  def activeRules: SuffixRules = {
    var r = rulesRef
    if (r == null) { r = initRules(); rulesRef = r }
    r
  }

  /** Test/local-session override (per-JVM; on a cluster use the property
    * or resource so executors initialize identically). */
  def setRules(r: SuffixRules): Unit = rulesRef = r

  /** Re-run the property/resource/default resolution (after changing
    * `graft.psl.path`). */
  def reloadRules(): Unit = rulesRef = initRules()

  private def initRules(): SuffixRules =
    sys.props.get("graft.psl.path")
      .map(p => parsePsl(scala.io.Source.fromFile(p, "UTF-8")))
      .orElse(Option(getClass.getResourceAsStream("/graft-public-suffix-list.dat"))
        .map(in => parsePsl(scala.io.Source.fromInputStream(in, "UTF-8"))))
      .getOrElse(HeadRules)

  /** Parse the publicsuffix.org data-file format: `//` comments and blank
    * lines skipped, a rule is everything up to the first whitespace,
    * `!rule` → exception, `*.rule` → wildcard, bare `*` is the (implicit)
    * default rule. Closes the source. */
  def parsePsl(src: scala.io.Source): SuffixRules =
    try {
      val exact = Set.newBuilder[String]
      val wildcard = Set.newBuilder[String]
      val exception = Set.newBuilder[String]
      src.getLines().foreach { line0 =>
        val line = line0.trim
        if (line.nonEmpty && !line.startsWith("//")) {
          val rule = line.takeWhile(!_.isWhitespace).toLowerCase
          if (rule.startsWith("!")) exception += rule.substring(1)
          else if (rule.startsWith("*.")) wildcard += rule.substring(2)
          else if (rule != "*") exact += rule
        }
      }
      SuffixRules(exact.result(), wildcard.result(), exception.result())
    } finally src.close()

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

  /** Registrable domain (eTLD+1) under the publicsuffix.org matching
    * algorithm against [[activeRules]]: among matching rules an exception
    * prevails (public suffix = the exception minus its leftmost label),
    * else the longest match (a `*.zone` wildcard counts one label longer
    * than `zone`), else the implicit `*` default (last label). The
    * registrable domain is the public suffix plus one label; a host that
    * IS a public suffix (or IPv4 / single-label) maps to itself. */
  def registrable(host: String): String = {
    if (host.forall(c => (c >= '0' && c <= '9') || c == '.')) return host // IPv4
    val parts = host.split('.')
    val n = parts.length
    if (n <= 1) return host
    val rules = activeRules
    var psLen = 1 // the implicit '*' default rule
    var excLen = -1
    var i = n - 1
    var suffix = ""
    while (i >= 0) {
      suffix = if (i == n - 1) parts(i) else parts(i) + "." + suffix
      val len = n - i
      if (excLen < len - 1 && rules.exception.contains(suffix)) excLen = len - 1
      if (psLen < len && rules.exact.contains(suffix)) psLen = len
      if (i >= 1 && psLen < len + 1 && rules.wildcard.contains(suffix)) psLen = len + 1
      i -= 1
    }
    val ps = if (excLen >= 0) excLen else psLen
    if (ps >= n) host
    else parts.slice(n - ps - 1, n).mkString(".")
  }

  /** DuckDB replay of the public-suffix label count for `hostExpr` —
    * GENERATED from [[activeRules]] so the two engines cannot drift (the
    * same discipline as every kernel's oracle mirror). Exceptions are
    * emitted longest-first (CASE first-match == the kernel's max), exact
    * and wildcard matches fold through GREATEST with the default-rule
    * floor of 1. */
  def publicSuffixLenSql(hostExpr: String): String = {
    val r = activeRules
    val all = r.exact ++ r.wildcard ++ r.exception
    // The replay inlines one CASE/LIKE per rule — fine for the built-in
    // HeadRules (~70 entries), megabytes of nested SQL with the full
    // ~9,500-rule publicsuffix.org file. Fail loudly instead of emitting
    // an oracle DuckDB cannot realistically run; parity runs use the
    // head-rule set, the full file is a deployment-only option.
    require(all.size <= 512,
      s"publicSuffixLenSql: ${all.size} suffix rules would inline into the " +
        "oracle SQL (limit 512). Oracle parity runs must use the built-in " +
        "head-rule set; keep -Dgraft.psl.path for deployments, not verify.")
    require(all.forall(s => !s.exists(c => c == '%' || c == '_' || c == '\'')),
      "suffix rules must be LIKE-literal for the oracle replay")
    def labels(s: String) = s.count(_ == '.') + 1
    val excCases = r.exception.toSeq.sortBy(e => (-labels(e), e))
      .map(e => s"WHEN $hostExpr = '$e' OR $hostExpr LIKE '%.$e' THEN ${labels(e) - 1}")
      .mkString(" ")
    val lens =
      r.exact.toSeq.sorted.map(s =>
        s"CASE WHEN $hostExpr = '$s' OR $hostExpr LIKE '%.$s' THEN ${labels(s)} ELSE 1 END") ++
      r.wildcard.toSeq.sorted.map(w =>
        s"CASE WHEN $hostExpr LIKE '%.$w' THEN ${labels(w) + 1} ELSE 1 END")
    val greatest = s"GREATEST(1, ${lens.mkString(", ")})"
    if (excCases.isEmpty) greatest else s"CASE $excCases ELSE $greatest END"
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
