package graft.operators

import graft.engine.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** URL canonicalization + domain governance: the first filter a crawl
  * corpus passes through (dedup by canonical URL, domain blocklists,
  * per-domain quotas all key on this). The reference has no web-crawl
  * surface (it ingests uploads, data_ingestion.py:110), but any 100 TB
  * text pipeline starts here — and the operators downstream (exact
  * dedup, q_mixture's domain weights, q_pagerank's domain centrality)
  * all want the canonical form this produces.
  *
  * All pure string functions (no java.net.URL — its equals/resolve touch
  * the network), applied per-row in a typed mapPartitions: narrow, no
  * shuffle, linear — the PDF-extractor scale shape.
  */
object UrlOps {

  /** Vendored FULL public-suffix snapshot (publicsuffix.org data, MPL
    * 2.0 — the list's own file format: one rule per line, `//` comments,
    * `*.` wildcard rules, `!` exception rules; a rule ends at the first
    * whitespace). The complete ~9.5k-rule list ships as a classpath
    * resource (`graft/public_suffix_list.dat`, vendored verbatim from the
    * Debian `publicsuffix` package snapshot available in the build image
    * — the container is zero-egress; a deployment refreshes the file from
    * publicsuffix.org and nothing else changes). Both ICANN and PRIVATE
    * sections load: for crawl quotas and dedup keying each hosting-
    * platform customer site (github.io, blogspot.com, ...) is its own
    * registrable domain, which is exactly the private section's purpose.
    * Parsing the .dat at class load (one ~10k-line scan, once per JVM)
    * replaces the earlier curated literal subset: a 9.5k-string Seq
    * literal would exceed the JVM's 64 KB method bytecode limit in the
    * static initializer, and the resource is the list's canonical
    * interchange form anyway. */
  val PslRules: Seq[String] = {
    val in = getClass.getResourceAsStream("/graft/public_suffix_list.dat")
    require(in != null, "vendored graft/public_suffix_list.dat missing from classpath")
    try {
      scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .map { l => val w = l.indexWhere(_.isWhitespace); if (w >= 0) l.substring(0, w) else l }
        .filter(l => l.nonEmpty && !l.startsWith("//"))
        .map(_.toLowerCase(java.util.Locale.ROOT))
        .toVector
    } finally in.close()
  }

  // rule index, built once at class load: exact rules, wildcard bases
  // ('*.ck' -> 'ck'), exception targets ('!www.ck' -> 'www.ck')
  private val pslException: Set[String] =
    PslRules.filter(_.startsWith("!")).map(_.substring(1)).toSet
  private val pslWildcardBase: Set[String] =
    PslRules.filter(_.startsWith("*.")).map(_.substring(2)).toSet
  private val pslExact: Set[String] =
    PslRules.filterNot(r => r.startsWith("!") || r.startsWith("*.")).toSet

  /** Tracking parameters stripped during canonicalization. */
  val TrackingParams: Set[String] = Set("fbclid", "gclid", "msclkid", "igshid", "mc_eid")
  def isTrackingParam(name: String): Boolean =
    name.startsWith("utm_") || TrackingParams.contains(name)

  /** Domains a curation pass refuses outright. */
  val Blocklist: Set[String] = Set("spam-site.co.uk", "malware.example")

  final case class ParsedUrl(scheme: String, host: String, port: Int,
      path: String, query: String, fragment: String)

  /** Hand parse of scheme://host[:port][/path][?query][#fragment].
    * Returns None on anything that doesn't fit (no scheme, empty host) —
    * a crawl pipeline routes those to a reject table, never throws. */
  def parseUrl(url: String): Option[ParsedUrl] = {
    if (url == null) return None
    val ss = url.indexOf("://")
    if (ss <= 0) return None
    val scheme = url.substring(0, ss)
    if (!scheme.forall(c => c.isLetterOrDigit || c == '+' || c == '-' || c == '.')) return None
    val rest = url.substring(ss + 3)
    val hashAt = rest.indexOf('#')
    val (beforeFrag, frag) =
      if (hashAt < 0) (rest, "") else (rest.substring(0, hashAt), rest.substring(hashAt + 1))
    val qAt = beforeFrag.indexOf('?')
    val (hostPath, query) =
      if (qAt < 0) (beforeFrag, "") else (beforeFrag.substring(0, qAt), beforeFrag.substring(qAt + 1))
    val slashAt = hostPath.indexOf('/')
    val (authority0, path) =
      if (slashAt < 0) (hostPath, "") else (hostPath.substring(0, slashAt), hostPath.substring(slashAt))
    // userinfo ('user:pass@host') strips at the LAST '@' of the
    // authority — RFC 3986 §3.2.1: '@' cannot appear in a host, so
    // everything before it is userinfo (its ':' must not be mistaken
    // for the port separator)
    val atAt = authority0.lastIndexOf('@')
    val hostPort = if (atAt < 0) authority0 else authority0.substring(atAt + 1)
    val (host, port) =
      if (hostPort.startsWith("[")) {
        // IPv6 literal ('[::1]:8080'): colons inside the brackets are the
        // address; the port separator is only the ':' after ']'
        val close = hostPort.indexOf(']')
        if (close < 0) return None // unterminated bracket: reject-table row
        val h = hostPort.substring(0, close + 1)
        val after = hostPort.substring(close + 1)
        if (after.isEmpty) (h, -1)
        else if (after.startsWith(":")) {
          val p = after.substring(1)
          if (p.nonEmpty && p.forall(_.isDigit) && p.length <= 5) (h, p.toInt)
          else return None
        } else return None
      } else {
        val colonAt = hostPort.lastIndexOf(':')
        if (colonAt < 0) (hostPort, -1)
        else {
          val p = hostPort.substring(colonAt + 1)
          if (p.nonEmpty && p.forall(_.isDigit) && p.length <= 5)
            (hostPort.substring(0, colonAt), p.toInt)
          else (hostPort, -1)
        }
      }
    if (host.isEmpty) None
    else Some(ParsedUrl(scheme, host, port, path, query, frag))
  }

  /** RFC 3986 §5.2.4 dot-segment removal, plus empty-segment collapse
    * (`//` → `/`) — the extra step crawl canonicalizers add so the same
    * page doesn't survive under both spellings. Always returns a path
    * starting with '/'; '..' past the root is dropped (browser behavior). */
  def normalizePath(path: String): String = {
    val stack = scala.collection.mutable.ArrayBuffer.empty[String]
    path.split("/", -1).foreach {
      case "" | "." => // collapse
      case ".."     => if (stack.nonEmpty) stack.remove(stack.length - 1)
      case seg      => stack += seg
    }
    "/" + stack.mkString("/")
  }

  /** Strip tracking parameters, preserving the order of the rest.
    * Percent-escapes are NOT decoded (decoding can change which page the
    * URL names; canonical form keeps them verbatim). */
  def normalizeQuery(query: String): String =
    if (query.isEmpty) ""
    else query.split("&", -1).filter { p =>
      val name = p.indexOf('=') match { case -1 => p; case eq => p.substring(0, eq) }
      p.nonEmpty && !isTrackingParam(name.toLowerCase(java.util.Locale.ROOT))
    }.mkString("&")

  private val DefaultPorts = Map("http" -> 80, "https" -> 443, "ftp" -> 21)

  /** Canonical form: lowercase scheme+host, default port dropped,
    * dot-segments resolved, '//' collapsed, trailing slash dropped
    * (except root), tracking params stripped, fragment dropped. */
  def normalizeUrl(url: String): Option[String] =
    parseUrl(url).map { u =>
      val scheme = u.scheme.toLowerCase(java.util.Locale.ROOT)
      val host = u.host.toLowerCase(java.util.Locale.ROOT)
      val port =
        if (u.port < 0 || DefaultPorts.get(scheme).contains(u.port)) ""
        else ":" + u.port
      val path0 = normalizePath(u.path)
      val path = if (path0.length > 1) path0 else "/"
      val query = normalizeQuery(u.query)
      val q = if (query.isEmpty) "" else "?" + query
      val p = if (path == "/" && q.isEmpty) "/" else path
      s"$scheme://$host$port$p$q"
    }

  /** Public-suffix length in labels for a lowercased label array — the
    * full publicsuffix.org algorithm: every matching rule is considered,
    * an exception rule beats all others (its suffix is the rule minus the
    * leading label), otherwise the LONGEST match wins, and the implicit
    * `*` default rule makes any unknown TLD a 1-label suffix. */
  private def publicSuffixLen(labels: Array[String]): Int = {
    var best = 1 // implicit default rule '*'
    var exception = -1
    var i = 0
    while (i < labels.length) {
      val cand = labels.drop(i).mkString(".")
      if (pslException.contains(cand))
        exception = math.max(exception, labels.length - i - 1)
      if (pslExact.contains(cand))
        best = math.max(best, labels.length - i)
      // wildcard '*.<base>' matches any candidate of >= 2 labels whose
      // tail after the first label is <base>
      if (labels.length - i >= 2 &&
          pslWildcardBase.contains(labels.drop(i + 1).mkString(".")))
        best = math.max(best, labels.length - i)
      i += 1
    }
    if (exception >= 0) exception else best
  }

  /** Registrable domain per the public-suffix list: the public suffix
    * plus one label. A host that IS a public suffix (or shorter) returns
    * itself; IP-literal hosts (bracketed IPv6, all-numeric IPv4) have no
    * registrable domain and return themselves — the PSL algorithm is
    * defined over DNS names only. */
  def registrableDomain(host: String): String = {
    val lower = host.toLowerCase(java.util.Locale.ROOT)
    if (lower.startsWith("[")) return lower
    val labels = lower.split("\\.", -1).filter(_.nonEmpty)
    if (labels.nonEmpty && labels.forall(_.forall(_.isDigit)))
      return labels.mkString(".")
    val psLen = publicSuffixLen(labels)
    if (labels.length <= psLen) labels.mkString(".")
    else labels.takeRight(psLen + 1).mkString(".")
  }

  /** RFC 3986 §5.2 reference resolution (the crawl-frontier primitive:
    * every href on a page is a reference against that page's URL):
    * absolute refs pass through; `//authority` adopts the base scheme;
    * `/rooted` paths replace the base path; `?query` keeps the base
    * path; everything else merges onto the base path's directory. The
    * resolved URL then canonicalizes through [[normalizeUrl]]. None on
    * an unparseable base. */
  def resolveRef(base: String, ref: String): Option[String] = {
    if (ref == null) return None
    val r = ref.trim
    if (r.matches("^[A-Za-z][A-Za-z0-9+.-]*://.*")) return normalizeUrl(r)
    // non-hierarchical absolute refs (mailto:, javascript:, data:, tel:,
    // …) — a scheme NOT followed by `//`. RFC 3986 §4.2 forbids a colon
    // in a relative ref's first segment precisely so these are
    // unambiguous; merging one onto the base dir would mint bogus
    // frontier URLs like http://host/pages/mailto:user@x.com.
    if (r.matches("^[A-Za-z][A-Za-z0-9+.-]*:.*")) return None
    // same-document reference (§5.2: a fragment-only ref resolves to the
    // base itself) — the ubiquitous href="#..." pattern must not emit
    // the base DIRECTORY into the frontier
    if (r.startsWith("#")) return normalizeUrl(base)
    parseUrl(base).flatMap { b =>
      val scheme = b.scheme.toLowerCase(java.util.Locale.ROOT)
      val port = if (b.port < 0) "" else ":" + b.port
      val authority = b.host + port
      val resolved =
        if (r.startsWith("//")) s"$scheme:$r"
        else if (r.startsWith("/")) s"$scheme://$authority$r"
        else if (r.startsWith("?")) {
          val p = if (b.path.isEmpty) "/" else b.path
          s"$scheme://$authority$p$r"
        } else if (r.isEmpty) base
        else {
          // merge: replace everything after the base path's last '/'
          val p = if (b.path.isEmpty) "/" else b.path
          val dir = p.substring(0, p.lastIndexOf('/') + 1)
          s"$scheme://$authority$dir$r"
        }
      normalizeUrl(resolved) // dot segments resolve in canonicalization
    }
  }

  /** Deterministic raw-URL generator for the gate: five families that
    * jointly exercise every canonicalization rule (case-mixed host +
    * default port + dot-segments + utm + fragment; '//' collapse +
    * trailing slash; multi-part suffix + blocklist hit; './' + kept
    * percent-escape; already-canonical). */
  def rawUrl(id: Long): String = (id % 5) match {
    case 0 => s"HTTP://WWW.Example.COM:80/a/b/../c/page$id?utm_source=feed&q=$id#sec2"
    case 1 => s"https://Blog.Example.org:443/posts//$id/?id=$id&utm_campaign=x"
    case 2 => s"http://Ads.Spam-Site.co.uk/offer?fbclid=abc$id"
    case 3 => s"https://docs.example.com/kb/./$id?q=a%20b&gclid=1"
    case _ => s"http://example.com/item/$id"
  }

  /** Oracle-checked canonicalize + domain + blocklist pass over one
    * generated URL per document. The oracle states each family's
    * canonical form in CLOSED FORM (it never runs the parser), so
    * builder and checker share no code — any rule defect hash-mismatches. */
  /** The canonicalize pass over any frame with a `doc_id` column — one
    * narrow typed map, no shuffle. */
  def urlVerdicts(ids: DataFrame): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val raw = rawUrl(id)
          val norm = normalizeUrl(raw).getOrElse("")
          val host = parseUrl(raw).map(_.host.toLowerCase(java.util.Locale.ROOT)).getOrElse("")
          val domain = registrableDomain(host)
          (id, norm, domain, Blocklist.contains(domain))
        }
      }
      .toDF("doc_id", "url_norm", "domain", "blocked")
  }

  def qUrlFilter(s: SparkSession, d: String): DataFrame =
    urlVerdicts(Tables.rebalance(Tables.documents(s, d), "doc_id"))
      .orderBy("doc_id")
}
