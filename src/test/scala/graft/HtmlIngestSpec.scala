package graft

import graft.sources.HtmlIngest.{buildAnchorPage, buildHtml, escapeHtml, extractAnchors, htmlToText}

/** The HTML extractor's state machine, pinned on the adversarial cases
  * the oracle gate (q_html_ingest) can't isolate individually. */
class HtmlIngestSpec extends SparkSpec {

  test("tags strip to spaces; text survives") {
    assert(htmlToText("<p>hello <b>bold</b> world</p>") === "hello bold world")
  }

  test("quoted '>' inside attributes does not close the tag") {
    assert(htmlToText("""<p class="a>b" data-x='c>d'>text</p>""") === "text")
  }

  test("comments are removed, including tags inside them") {
    assert(htmlToText("a <!-- <p>gone</p> --> b") === "a b")
    // unterminated comment consumes to EOF, leniently
    assert(htmlToText("a <!-- never closed <p>x</p>") === "a")
  }

  test("script and style elements are removed with their content") {
    assert(htmlToText("<script>if (a < b && c > d) alert('<i>x</i>');</script>ok") === "ok")
    assert(htmlToText("<style>p { color: red } /* <p> */</style>ok") === "ok")
    assert(htmlToText("<SCRIPT>x</SCRIPT>ok") === "ok") // case-insensitive
    assert(htmlToText("<script>never closed") === "")   // lenient EOF
  }

  test("entities decode: named, decimal, hex; unknown stays literal") {
    assert(htmlToText("&amp; &lt; &gt; &quot; &apos; &copy;") === "& < > \" ' ©")
    assert(htmlToText("&#65;&#x42;") === "AB")
    assert(htmlToText("&bogus; &#xzz; &# ;") === "&bogus; &#xzz; &# ;")
    assert(htmlToText("a && b") === "a && b") // bare ampersands
    // a ';' beyond the 10-char entity window is not an entity terminator
    assert(htmlToText("&abcdefghijkl;") === "&abcdefghijkl;")
    // a semicolon-free ampersand run must stay linear AND literal
    val run = "&" * 5000
    assert(htmlToText(run) === run)
  }

  test("decoded '<' is literal text, never re-parsed as markup (double-decode guard)") {
    assert(htmlToText("&lt;p&gt;not a tag&lt;/p&gt;") === "<p>not a tag</p>")
    assert(htmlToText("&amp;lt;") === "&lt;")
  }

  test("whitespace collapses, including NBSP") {
    assert(htmlToText("a\n\n  b  c &nbsp; d") === "a b c d")
  }

  test("escape/extract round trip is the identity on arbitrary text") {
    val texts = Seq("plain words", "a & b < c > d", "&amp; already escaped", "")
    texts.foreach { t =>
      val expect = t.replaceAll("\\s+", " ").trim
      assert(htmlToText("<p>" + escapeHtml(t) + "</p>") === expect, s"text: $t")
    }
  }

  test("buildHtml page extracts to exactly the expected closed form") {
    val out = htmlToText(buildHtml(42L, "the quick brown fox"))
    assert(out === "Doc 42 Home | About Doc #42 the quick brown fox © 2026 Graft")
    assert(htmlToText(buildHtml(7L, "")) === "Doc 7 Home | About Doc #7 © 2026 Graft")
  }

  test("null and garbage inputs never throw") {
    assert(htmlToText(null) === "")
    assert(htmlToText("") === "")
    // `<<<>` consumes as one malformed tag; the rest is literal text
    assert(htmlToText("<<<>>>&&&;;;") === ">>&&&;;;")
  }

  test("extractAnchors: inner-text normalization and the drop rules") {
    // nested tag stripped, entity decoded, whitespace collapsed
    assert(extractAnchors("""<a href="/x"><b>guide</b>  7 </a>""") ===
      Seq(("/x", "guide 7")))
    assert(extractAnchors("""<a href=/y>ref&amp;3</a>""") === Seq(("/y", "ref&3")))
    // text-less anchors and href-less anchors are dropped
    assert(extractAnchors("""<a href="/x"></a><a name="top">here</a>""").isEmpty)
    // quoted '>' inside an inner tag's attribute does not end the capture
    assert(extractAnchors("""<a href='/z'>a <span title=">">b</span> c</a>""") ===
      Seq(("/z", "a b c")))
    // unclosed anchor: capture runs to EOF, never throws
    assert(extractAnchors("""<a href="/w">tail text""") === Seq(("/w", "tail text")))
    // multiple anchors keep document order
    assert(extractAnchors("""<a href="/1">one</a><p/><a href="/2">two</a>""")
      .map(_._1) === Seq("/1", "/2"))
  }

  test("extractTables: nesting, unclosed cells, decoys, truncation") {
    import graft.sources.HtmlIngest.extractTables
    // entity-encoded <tr> in prose must not open a row
    assert(extractTables("<p>decoy &lt;tr&gt; prose</p>").isEmpty)
    // unclosed cells flush at the next cell/row/table boundary
    assert(extractTables("<table><tr><td>a<td>b</table>") ===
      Seq((0, 0, 0, false, "a"), (0, 0, 1, false, "b")))
    // th vs td, nested tag stripped, whitespace collapsed, entity decoded
    assert(extractTables("<table><tr><th> H&amp;M </th><td><i>x</i>  1</td></table>") ===
      Seq((0, 0, 0, true, "H&M"), (0, 0, 1, false, "x 1")))
    // a second table restarts row numbering and bumps table_idx
    assert(extractTables("<table><tr><td>a</td></tr></table><table><tr><td>b</td></tr></table>")
      .map(t => (t._1, t._2)) === Seq((0, 0), (1, 0)))
    // truncated mid-cell: the open cell still flushes (browser behavior)
    assert(extractTables("<table><tr><td>tail") === Seq((0, 0, 0, false, "tail")))
    // td outside any table is ignored
    assert(extractTables("<td>stray</td>").isEmpty)
    // nested tables enumerate FLAT (the pinned contract): the host cell
    // flushes its text-so-far, the inner table gets its own table_idx
    assert(extractTables(
      "<table><tr><td>pre <table><tr><td>in</td></tr></table> post</td></tr></table>") ===
      Seq((0, 0, 0, false, "pre"), (1, 0, 0, false, "in")))
  }

  test("buildTablePage reduces to exactly the oracle's closed form") {
    import graft.sources.HtmlIngest.{buildTablePage, extractTables}
    val id = 42L
    val (rows, cols) = ((id % 4 + 2).toInt, (id % 3 + 2).toInt)
    val got = extractTables(buildTablePage(id))
    val header = (0 until cols).map(c => (0, 0, c, true, s"h$c"))
    val data = for (r <- 1 to rows; c <- 0 until cols)
      yield (0, r, c, false, s"v${(id * 31 + r * 7 + c * 3) % 100}")
    val second = Seq((1, 0, 0, false, s"x $id"), (1, 0, 1, false, s"y $id"))
    assert(got === header ++ data ++ second)
  }

  test("buildAnchorPage reduces to exactly the oracle's closed form") {
    val id = 42L
    def t(j: Int): Long = (id * 7 + j * 13) % 200
    val got = extractAnchors(buildAnchorPage(id))
    assert(got === Seq(
      (s"/doc/${t(0)}", s"guide ${t(0)}"),
      (s"/doc/${t(1)}", s"guide ${t(1)}"),
      (s"/doc/${t(2)}", s"ref&${t(2)}"),
      (s"/doc/${t(3)}", s"guide ${t(3)}"),
      (s"/doc/${t(4)}", s"manual ${t(4)}")))
  }
}
