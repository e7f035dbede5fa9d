package graft

import graft.operators.UrlOps._

/** URL canonicalization rules, pinned individually (the oracle gate
  * q_url_filter covers the five generator families end to end). */
class UrlOpsSpec extends SparkSpec {

  test("scheme and host lowercase; default ports dropped, explicit kept") {
    assert(normalizeUrl("HTTP://WWW.Example.COM:80/x") === Some("http://www.example.com/x"))
    assert(normalizeUrl("https://a.example:443/x") === Some("https://a.example/x"))
    assert(normalizeUrl("https://a.example:8443/x") === Some("https://a.example:8443/x"))
    assert(normalizeUrl("http://a.example:8080/") === Some("http://a.example:8080/"))
  }

  test("dot segments resolve; '//' collapses; trailing slash drops") {
    assert(normalizePath("/a/b/../c") === "/a/c")
    assert(normalizePath("/a/./b") === "/a/b")
    assert(normalizePath("/a//b/") === "/a/b")
    assert(normalizePath("/../../x") === "/x") // '..' past root drops
    assert(normalizeUrl("http://h.example/a/b/../") === Some("http://h.example/a"))
    assert(normalizeUrl("http://h.example") === Some("http://h.example/"))
  }

  test("tracking params strip, order of the rest preserved, '?' drops when empty") {
    assert(normalizeQuery("utm_source=x&q=1&fbclid=z&b=2") === "q=1&b=2")
    assert(normalizeUrl("http://h.example/p?utm_a=1&gclid=2") === Some("http://h.example/p"))
    // percent-escapes stay verbatim
    assert(normalizeUrl("http://h.example/p?q=a%20b") === Some("http://h.example/p?q=a%20b"))
  }

  test("fragments drop") {
    assert(normalizeUrl("http://h.example/p#sec") === Some("http://h.example/p"))
    // '#' inside a query value still terminates (fragment wins, RFC order)
    assert(normalizeUrl("http://h.example/p?a=1#b=2") === Some("http://h.example/p?a=1"))
  }

  test("registrable domain: plain and multi-part suffixes") {
    assert(registrableDomain("www.example.com") === "example.com")
    assert(registrableDomain("news.bbc.co.uk") === "bbc.co.uk")
    assert(registrableDomain("example.com") === "example.com")
    assert(registrableDomain("localhost") === "localhost")
    assert(registrableDomain("a.b.c.d.example.org") === "example.org")
  }

  test("unparseable inputs return None, never throw") {
    assert(parseUrl(null).isEmpty)
    assert(parseUrl("not a url").isEmpty)
    assert(parseUrl("://nohost/x").isEmpty)
    assert(parseUrl("http://").isEmpty)
    assert(normalizeUrl("mailto:x@example.com").isEmpty) // no ://
  }

  test("generator families normalize to the oracle's closed forms") {
    assert(normalizeUrl(rawUrl(10)) === Some("http://www.example.com/a/c/page10?q=10"))
    assert(normalizeUrl(rawUrl(11)) === Some("https://blog.example.org/posts/11?id=11"))
    assert(normalizeUrl(rawUrl(12)) === Some("http://ads.spam-site.co.uk/offer"))
    assert(normalizeUrl(rawUrl(13)) === Some("https://docs.example.com/kb/13?q=a%20b"))
    assert(normalizeUrl(rawUrl(14)) === Some("http://example.com/item/14"))
  }
}
