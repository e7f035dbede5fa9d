package graft

import graft.sources.WarcIngest._

/** The WARC record walker and HTTP parser, pinned on the failure modes
  * the oracle gate (q_warc_ingest) can't isolate: boundary walking,
  * record-type skipping, non-200 handling, truncation. */
class WarcIngestSpec extends SparkSpec {

  private val Ascii = java.nio.charset.StandardCharsets.US_ASCII

  test("multi-record file: responses extracted, warcinfo/request skipped") {
    val bytes = buildWarcFile(Seq((1L, "alpha beta"), (2L, "gamma")))
    val rs = parseWarcResponses(bytes)
    assert(rs.map(_._1) === Seq("http://example.com/doc/1", "http://example.com/doc/2"))
    rs.foreach { case (_, payload) =>
      assert(new String(payload, Ascii).startsWith("HTTP/1.1 200 OK"))
    }
  }

  test("payloads that LOOK like record headers do not break the walk") {
    // a body containing a fake WARC header — only Content-Length walking
    // survives this; a regex/split-based parser would shear the record
    val trap = "pre\r\n\r\nWARC/1.0\r\nWARC-Type: response\r\nContent-Length: 0\r\n\r\npost"
    val bytes = buildWarcRecord("response", "http://x.example/1",
      buildHttpResponse("<p>" + trap + "</p>"), 1L) ++
      buildWarcRecord("response", "http://x.example/2",
        buildHttpResponse("<p>second</p>"), 2L)
    val rs = parseWarcResponses(bytes)
    assert(rs.length === 2, "fake in-payload header must not create/destroy records")
    assert(rs(1)._1 === "http://x.example/2")
  }

  test("non-200 responses are dropped by the HTTP parser") {
    val nf = ("HTTP/1.1 404 Not Found\r\nContent-Length: 4\r\n\r\ngone").getBytes(Ascii)
    assert(parseHttpBody(nf).isEmpty)
    val ok = buildHttpResponse("<p>x</p>")
    assert(parseHttpBody(ok).map(new String(_, Ascii)) === Some("<p>x</p>"))
    assert(parseHttpBody("not http at all".getBytes(Ascii)).isEmpty)
  }

  test("HTTP body honors Content-Length over trailing bytes") {
    val b = ("HTTP/1.1 200 OK\r\nContent-Length: 5\r\n\r\nhelloTRAILINGJUNK").getBytes(Ascii)
    assert(parseHttpBody(b).map(new String(_, Ascii)) === Some("hello"))
  }

  test("truncated archives parse cleanly up to the cut") {
    val full = buildWarcFile(Seq((1L, "one"), (2L, "two"), (3L, "three")))
    val rs = parseWarcResponses(full)
    assert(rs.length === 3)
    // cut mid-way through the last record's payload
    val cut = full.take(full.length - 20)
    val partial = parseWarcResponses(cut)
    assert(partial.length === 2, "truncated tail record must be dropped, not crash")
    assert(parseWarcResponses(Array.emptyByteArray).isEmpty)
    assert(parseWarcResponses("garbage".getBytes(Ascii)).isEmpty)
  }

  test("multi-byte UTF-8 bodies keep byte-exact record boundaries") {
    // '©' is 2 bytes in UTF-8: a char-counting parser would walk off the
    // record boundary and lose the second record
    val bytes = buildWarcRecord("response", "http://x.example/1",
      buildHttpResponse("<p>a © b © c</p>"), 1L) ++
      buildWarcRecord("response", "http://x.example/2",
        buildHttpResponse("<p>tail</p>"), 2L)
    val rs = parseWarcResponses(bytes)
    assert(rs.length === 2)
    val body1 = parseHttpBody(rs(0)._2).get
    assert(graft.sources.HtmlIngest.htmlToText(
      new String(body1, java.nio.charset.StandardCharsets.UTF_8)) === "a © b © c")
  }

  test("q_warc_ingest extracts every staged doc end to end") {
    val out = SparkEntry.queries("q_warc_ingest")(spark, sf0001).collect()
    assert(out.length === 200)
    out.foreach { r =>
      assert(r.getString(1) === s"http://example.com/doc/${r.getLong(0)}")
      assert(r.getString(2).startsWith(s"Doc ${r.getLong(0)} Home | About"))
    }
  }
}
