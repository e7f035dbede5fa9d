package graft

import graft.sources.HtmlIngest.{buildHtml, escapeHtml, htmlToText}

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
}
