package graft

import graft.operators.{CrawlPolicy, Curation}
import graft.sources.{CharsetSniff, ZipIngest}

/** Round-7 crawl first-mile widening: ZIP archives, robots.txt (RFC
  * 9309), charset detection, span corruption — per-rule pins behind the
  * oracle gates. */
class CrawlIngestSpec extends SparkSpec {

  // ------------------------------------------------------------- robots

  import CrawlPolicy._

  test("robots: longest match wins; tie goes to Allow") {
    val g = parseRobots("User-agent: *\nDisallow: /a/\nAllow: /a/c/\n")
    assert(verdict(g, "anybot", "/a/c/x")._1 === true)   // allow longer
    assert(verdict(g, "anybot", "/a/b/x")._1 === false)  // only disallow matches
    assert(verdict(g, "anybot", "/other")._1 === true)   // no rule matches
    // exact tie: same length, Allow wins
    val tie = parseRobots("User-agent: *\nDisallow: /dir/\nAllow: /dir/\n")
    assert(verdict(tie, "anybot", "/dir/page")._1 === true)
  }

  test("robots: specific-agent group overrides the * group") {
    val g = parseRobots(
      "User-agent: graftbot\nAllow: /\n\nUser-agent: *\nDisallow: /\n")
    assert(verdict(g, "graftbot", "/x")._1 === true)
    assert(verdict(g, "otherbot", "/x")._1 === false)
    // agent match is case-insensitive
    assert(verdict(g, "GraftBot", "/x")._1 === true)
  }

  test("robots: wildcards, $ anchor, empty Disallow, comments, crawl-delay") {
    assert(patternMatches("/*.php", "/index.php") === true)
    assert(patternMatches("/*.php$", "/index.php") === true)
    assert(patternMatches("/*.php$", "/index.php?x=1") === false) // anchored
    assert(patternMatches("/a*c", "/abc/d") === true)
    assert(patternMatches("/abc$", "/abc") === true)
    assert(patternMatches("/abc$", "/abcd") === false)
    // regex metacharacters in patterns are literals
    assert(patternMatches("/a.c", "/abc") === false)
    assert(patternMatches("/a.c", "/a.c") === true)
    val g = parseRobots(
      "# hello\nUser-agent: * # trailing comment\nDisallow:\nCrawl-delay: 7\n")
    assert(verdict(g, "anybot", "/anything") === ((true, 7L)))
    // consecutive User-agent lines form ONE group
    val multi = parseRobots("User-agent: a\nUser-agent: b\nDisallow: /\n")
    assert(verdict(multi, "a", "/x")._1 === false)
    assert(verdict(multi, "b", "/x")._1 === false)
    assert(verdict(multi, "c", "/x")._1 === true) // no * group -> allowed
  }

  test("robots: absent file and malformed lines never throw") {
    assert(verdict(parseRobots(""), "anybot", "/x") === ((true, -1L)))
    assert(verdict(parseRobots(null), "anybot", "/x") === ((true, -1L)))
    val junk = parseRobots("Disallow: /early\nnonsense line\nUser-agent *\n")
    assert(verdict(junk, "anybot", "/early")._1 === true) // rule before any group ignored
  }

  test("crawl schedule: dense per-domain slots, delay-scaled offsets") {
    val rows = graft.operators.CrawlPolicy.qCrawlSchedule(spark, sf0001).collect()
    assert(rows.nonEmpty)
    // disallowed families (2, 3) never appear in the fetch queue
    assert(rows.forall(r => r.getLong(0) % 5 != 2 && r.getLong(0) % 5 != 3))
    val byDomain = rows.groupBy(_.getString(1))
    byDomain.foreach { case (dom, rs) =>
      // slots are dense 0..n-1 within the domain, ordered by doc_id
      val ordered = rs.sortBy(_.getLong(0))
      assert(ordered.map(_.getLong(2)).toSeq === (0L until rs.length).toSeq, dom)
      // offsets scale by the domain's effective delay (2s for the
      // crawl-delay domain, the 1s default elsewhere)
      val delay = if (dom == "www.example.com") 2L else 1L
      assert(ordered.forall(r => r.getLong(3) === r.getLong(2) * delay), dom)
    }
  }

  // ------------------------------------------------------------ charset

  test("charset: every family detects and round-trips") {
    val text = "plain ascii body"
    val expect = text + CharsetSniff.Marker
    val labels = Seq("utf-8", "utf-8-bom", "utf-16le", "utf-16be", "iso-8859-1")
    for (fam <- 0 until 5) {
      val (cs, decoded) = CharsetSniff.sniff(CharsetSniff.encodePayload(fam.toLong, text))
      assert(cs === labels(fam), s"family $fam label")
      assert(decoded === expect, s"family $fam round trip")
    }
  }

  test("charset: strict UTF-8 validation rejects Latin-1 bytes (no U+FFFD damage)") {
    val latin1 = "café".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val (cs, decoded) = CharsetSniff.sniff(latin1)
    assert(cs === "iso-8859-1")
    assert(decoded === "café")
    assert(!decoded.contains('�'))
    // pure ASCII is valid UTF-8
    assert(CharsetSniff.sniff("plain".getBytes)._1 === "utf-8")
    // degenerate inputs
    assert(CharsetSniff.sniff(Array.emptyByteArray) === (("utf-8", "")))
    assert(CharsetSniff.sniff(null) === (("utf-8", "")))
    // BOM-only payloads decode to empty with the BOM's label
    assert(CharsetSniff.sniff(Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte)) ===
      (("utf-8-bom", "")))
  }

  test("mojibake repair: exact inverse of the UTF-8-as-Latin-1 corruption, guarded") {
    import CharsetSniff.repairMojibake
    def corrupt(s: String): String = new String(
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      java.nio.charset.StandardCharsets.ISO_8859_1)
    // round trip, incl. a char OUTSIDE Latin-1 (π: 2-byte UTF-8)
    val original = "café Zürich π plain tail"
    assert(repairMojibake(corrupt(original)) === ((original, true)))
    // pure ASCII cannot be mojibake: untouched, unflagged
    assert(repairMojibake("plain ascii") === (("plain ascii", false)))
    // genuine Latin-1 prose fails strict UTF-8 validation: pass-through
    // (a lone é is the malformed-sequence case the REPORT decoder rejects)
    assert(repairMojibake("café au lait") === (("café au lait", false)))
    // a char above 0xFF cannot be a Latin-1 decode of anything
    assert(repairMojibake("has π already") === (("has π already", false)))
    // DOUBLE corruption repairs one layer per call, to a fixed point
    val twice = corrupt(corrupt(original))
    val (once, f1) = repairMojibake(twice)
    assert(f1 && once === corrupt(original))
    assert(repairMojibake(once) === ((original, true)))
    // degenerate
    assert(repairMojibake(null) === (("", false)))
    assert(repairMojibake("") === (("", false)))
  }

  // ---------------------------------------------------------------- zip

  test("zip: entries round-trip; truncated archives keep the readable prefix") {
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    for (i <- 0 until 3) {
      zos.putNextEntry(new java.util.zip.ZipEntry(f"doc$i%07d.txt"))
      zos.write(s"text $i".getBytes("UTF-8"))
      zos.closeEntry()
    }
    zos.close()
    val full = bos.toByteArray
    assert(ZipIngest.unzipEntries(full).map(_._2) === Seq("text 0", "text 1", "text 2"))
    // truncation mid-archive: readable prefix survives, no throw
    val cut = ZipIngest.unzipEntries(full.take(full.length / 2))
    assert(cut.length < 3)
    // garbage and empty: no entries, no throw
    assert(ZipIngest.unzipEntries("not a zip".getBytes).isEmpty)
    assert(ZipIngest.unzipEntries(Array.emptyByteArray).isEmpty)
    // oversized entries drop under the cap; others survive
    val big = new java.io.ByteArrayOutputStream()
    val z2 = new java.util.zip.ZipOutputStream(big)
    z2.putNextEntry(new java.util.zip.ZipEntry("big.txt"))
    z2.write(new Array[Byte](2048))
    z2.closeEntry()
    z2.putNextEntry(new java.util.zip.ZipEntry("small.txt"))
    z2.write("ok".getBytes("UTF-8"))
    z2.closeEntry()
    z2.close()
    val capped = ZipIngest.unzipEntries(big.toByteArray, maxEntryBytes = 1024)
    assert(capped.map(_._1) === Seq("small.txt"))
  }

  // ------------------------------------------------------ link extract

  test("href extraction: quoted, single-quoted, unquoted, entities, order") {
    import graft.sources.HtmlIngest
    val html = """<a href="/a">x</a> <A HREF='/b'>y</A> <a href=/c>z</a>
      <a class="k" href="/d?x=1&amp;y=2"></a> <a>no href</a> <p href="/not-a-link"></p>"""
    assert(HtmlIngest.extractHrefs(html) === Seq("/a", "/b", "/c", "/d?x=1&y=2"))
    // quoted '>' inside an attribute value does not end the tag
    assert(HtmlIngest.extractHrefs("""<a title="a>b" href="/e">t</a>""") === Seq("/e"))
    assert(HtmlIngest.extractHrefs("") === Seq.empty)
    // unterminated tag: no crash
    assert(HtmlIngest.extractHrefs("""<a href="/f""") === Seq.empty)
  }

  test("RFC 3986 reference resolution") {
    import graft.operators.UrlOps.resolveRef
    val base = "http://h.example/pages/sub/page7.html"
    assert(resolveRef(base, "/home") === Some("http://h.example/home"))
    assert(resolveRef(base, "item/9?r=1") === Some("http://h.example/pages/sub/item/9?r=1"))
    assert(resolveRef(base, "../up/9") === Some("http://h.example/pages/up/9"))
    assert(resolveRef(base, "plain.html") === Some("http://h.example/pages/sub/plain.html"))
    assert(resolveRef(base, "https://other.example/x") === Some("https://other.example/x"))
    assert(resolveRef(base, "//cdn.example/y") === Some("http://cdn.example/y"))
    assert(resolveRef(base, "?q=2") === Some("http://h.example/pages/sub/page7.html?q=2"))
    assert(resolveRef(base, "") === Some("http://h.example/pages/sub/page7.html"))
    // fragment-only = same-document reference (§5.2), NOT the directory
    assert(resolveRef(base, "#top") === Some("http://h.example/pages/sub/page7.html"))
    // '..' past root clamps like normalizePath
    assert(resolveRef("http://h.example/a", "../../x") === Some("http://h.example/x"))
    assert(resolveRef("not a url", "/x").isEmpty)
    // non-hierarchical absolute refs (scheme without //) must NOT merge
    // onto the base directory as relative paths — frontier poison
    assert(resolveRef(base, "mailto:user@x.example").isEmpty)
    assert(resolveRef(base, "javascript:void(0)").isEmpty)
    assert(resolveRef(base, "data:text/plain;base64,aGk=").isEmpty)
    assert(resolveRef(base, "tel:+1-555-0100").isEmpty)
    // but a colon AFTER the first path segment stays a relative ref
    assert(resolveRef(base, "a/b:c") === Some("http://h.example/pages/sub/a/b:c"))
  }

  // ----------------------------------------------------------- sitemap

  test("sitemap parsing: urlset entries, entity decode, truncation") {
    import graft.sources.SitemapIngest
    val xml = """<?xml version="1.0"?><urlset>
      <url><loc>https://e.example/a?x=1&amp;y=2</loc><lastmod>2026-01-02</lastmod><priority>0.5</priority></url>
      <url><loc>https://e.example/b</loc><lastmod>2026-03-04</lastmod><priority>1.0</priority></url>
      <url><loc>https://e.example/incomplete</loc></url>
      </urlset>"""
    val parsed = SitemapIngest.parseUrlset(xml)
    assert(parsed === Seq(
      ("https://e.example/a?x=1&y=2", "2026-01-02", "0.5"),
      ("https://e.example/b", "2026-03-04", "1.0")))
    // truncation mid-entry keeps the readable prefix, no throw
    val cut = SitemapIngest.parseUrlset(xml.substring(0, xml.indexOf("/b")))
    assert(cut.length === 1)
    assert(SitemapIngest.parseUrlset("").isEmpty)
    assert(SitemapIngest.tagValues("<loc>x</loc><loc>y</loc>", "loc") === Seq("x", "y"))
  }

  // --------------------------------------------------------- wordpiece

  test("wordpiece: greedy longest-match with ## continuations") {
    import graft.operators.TextSearch.wordpieceEncode
    val vocab = Set("a", "b", "c", "ab", "abc", "bc")
    // longest match first: 'abcb' -> abc + ##b (not ab + ##c + ##b)
    assert(wordpieceEncode("abcb", vocab) === Seq("abc", "##b"))
    assert(wordpieceEncode("bcab", vocab) === Seq("bc", "##ab"))
    assert(wordpieceEncode("a", vocab) === Seq("a"))
    // char outside the alphabet: whole word [UNK]
    assert(wordpieceEncode("axb", vocab) === Seq("[UNK]"))
    assert(wordpieceEncode("", vocab) === Seq.empty)
  }

  // ---------------------------------------------------------------- tar

  test("tar: ustar round trip, checksum verification, truncation") {
    import graft.sources.TarIngest
    val entries = Seq(
      ("doc0000001.txt", "first entry".getBytes("UTF-8")),
      // 512-boundary edge: exactly one block of data
      ("doc0000002.txt", Array.fill[Byte](512)('x')),
      ("doc0000003.txt", Array.emptyByteArray))
    val tar = TarIngest.buildTar(entries)
    assert(tar.length % 512 === 0)
    val back = TarIngest.untarEntries(tar)
    assert(back.map(_._1) === entries.map(_._1))
    assert(back.map(_._2.toSeq) === entries.map(_._2.toSeq))
    // a corrupted header byte fails the checksum -> readable prefix only
    val corrupt = tar.clone()
    corrupt(512 + 512 + 0) = 'Z' // first name byte of entry 2's header
    assert(TarIngest.untarEntries(corrupt).map(_._1) === Seq("doc0000001.txt"))
    // truncation mid-data: entry dropped, no throw
    assert(TarIngest.untarEntries(tar.take(700)).isEmpty ||
      TarIngest.untarEntries(tar.take(700)).map(_._1) === Seq("doc0000001.txt"))
    assert(TarIngest.untarEntries("not a tar".getBytes).isEmpty)
    assert(TarIngest.untarEntries(Array.emptyByteArray).isEmpty)
    // an OVERSIZED entry is skipped, not archive-fatal: entries behind it
    // still extract (the zip path's per-entry cap semantics)
    val mixed = TarIngest.buildTar(Seq(
      ("small1.txt", "a".getBytes("UTF-8")),
      ("big.txt", new Array[Byte](2048)),
      ("small2.txt", "b".getBytes("UTF-8"))))
    assert(TarIngest.untarEntries(mixed, maxEntryBytes = 1024).map(_._1) ===
      Seq("small1.txt", "small2.txt"))
    // GNU tar interop: the header parses with the system tar if present
    // (pure JDK on both sides here; this is a layout sanity pin)
    val hdr = TarIngest.tarHeader("a.txt", 7L)
    assert(new String(hdr, 257, 5, java.nio.charset.StandardCharsets.US_ASCII) === "ustar")
    assert(hdr(262) === 0) // NUL after magic
    // a size that overflows the 12-byte octal field (>= 8 GiB) must fail
    // LOUDLY, not overflow into mtime and corrupt the checksum
    intercept[IllegalArgumentException] { TarIngest.tarHeader("huge.bin", 8L * 1024 * 1024 * 1024) }
    // the largest encodable size (11 octal digits) still round-trips
    assert(TarIngest.tarHeader("max.bin", 8L * 1024 * 1024 * 1024 - 1).length === 512)
  }

  // ---------------------------------------------------- span corruption

  test("webdataset: key pairing, missing modality, unpaired entries") {
    import spark.implicits._
    import graft.operators.Multimodal
    import graft.sources.TarIngest
    val tar = TarIngest.buildTar(Seq(
      "000000007.txt" -> "seven".getBytes("UTF-8"),
      "000000007.png" -> Multimodal.buildPng(7L),
      // a text-only sample: image decode must yield the sentinel, not throw
      "000000009.txt" -> "nine".getBytes("UTF-8")))
    val out = spark.createDataset(Seq(tar)).toDF("content")
      .as[Array[Byte]]
      .mapPartitions { it =>
        it.flatMap { t =>
          TarIngest.untarEntries(t).groupBy(_._1.takeWhile(_ != '.')).toSeq
            .map { case (key, entries) =>
              val byExt = entries.map { case (n, b) => n.dropWhile(_ != '.') -> b }.toMap
              val text = byExt.get(".txt").map(new String(_, "UTF-8")).getOrElse("")
              val (w, h, s) = byExt.get(".png").flatMap(Multimodal.decodePng)
                .getOrElse((-1, -1, -1L))
              (key.toLong, text, w, h, s)
            }
        }
      }.collect().sortBy(_._1)
    assert(out.length === 2)
    assert(out(0)._1 === 7L && out(0)._2 === "seven")
    val (w7, h7) = Multimodal.imageDims(7L)
    assert(out(0)._3 === w7 && out(0)._4 === h7)
    assert(out(1) === ((9L, "nine", -1, -1, -1L)))
  }

  test("span corruption: sentinel runs, numbering, and edge docs") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b c d e f g h i j"),
      (1L, ""),
      (2L, null.asInstanceOf[String]),
      (3L, "solo")).toDF("doc_id", "text")
    val out = Curation.spanCorrupt(docs).orderBy("doc_id").collect()
    // doc 0: mask rule (0*31 + i*17) % 5 == 0 -> i = 0 and 5 masked
    assert(out(0).getString(1) === "<extra_id_0> b c d e <extra_id_1> g h i j")
    assert(out(0).getString(2) === "<extra_id_0> a <extra_id_1> f")
    assert(out(0).getLong(3) === 2L)
    // empty / null text
    assert(out(1).getString(1) === "" && out(1).getString(2) === "" && out(1).getLong(3) === 0L)
    assert(out(2).getString(1) === "" && out(2).getString(2) === "" && out(2).getLong(3) === 0L)
    // doc 3: (3*31 + 0) % 5 = 93 % 5 = 3 -> unmasked
    assert(out(3).getString(1) === "solo" && out(3).getString(2) === "" && out(3).getLong(3) === 0L)
    // contiguous masked tokens share ONE sentinel
    val run = Curation.spanCorrupt(
      Seq((5L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9")).toDF("doc_id", "text")).collect()(0)
    // doc 5: (155 + 17 i) % 5 == 0 -> i = 0, 5 masked; same shape as doc 0
    assert(run.getString(1) === "<extra_id_0> t1 t2 t3 t4 <extra_id_1> t6 t7 t8 t9")
  }
}
