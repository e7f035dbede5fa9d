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

  /** Multi-part public suffixes the registrable-domain heuristic knows.
    * A deployment swaps in the full public-suffix list; the heuristic
    * (last two labels, or three when the last two are a listed suffix)
    * is the standard shape either way. */
  val MultiPartSuffixes: Set[String] = Set(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "co.in", "co.kr", "com.br", "com.cn", "com.mx")

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
    val (hostPort, path) =
      if (slashAt < 0) (hostPath, "") else (hostPath.substring(0, slashAt), hostPath.substring(slashAt))
    val colonAt = hostPort.lastIndexOf(':')
    val (host, port) =
      if (colonAt < 0) (hostPort, -1)
      else {
        val p = hostPort.substring(colonAt + 1)
        if (p.nonEmpty && p.forall(_.isDigit) && p.length <= 5)
          (hostPort.substring(0, colonAt), p.toInt)
        else (hostPort, -1)
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

  /** Registrable-domain heuristic: last two labels, or three when the
    * last two are a listed multi-part suffix. Bare/short hosts return
    * themselves. */
  def registrableDomain(host: String): String = {
    val labels = host.toLowerCase(java.util.Locale.ROOT).split("\\.", -1).filter(_.nonEmpty)
    if (labels.length <= 2) labels.mkString(".")
    else {
      val last2 = labels.takeRight(2).mkString(".")
      if (MultiPartSuffixes.contains(last2)) labels.takeRight(3).mkString(".")
      else last2
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
