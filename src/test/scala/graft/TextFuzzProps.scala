package graft

import graft.operators.CrawlPolicy
import graft.sources._
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.rng.Seed

/** String-level fuzz over every hand-rolled TEXT walker — the companion
  * to [[ParserFuzzProps]]'s byte-container sweep: mutate VALID fixture
  * pages/transcripts/lines (char flips into markup metacharacters,
  * truncations, window splices, injected unterminated constructs) and
  * assert every extractor returns degraded text rather than throwing or
  * hanging. Unterminated tags/comments/fences/strings consuming to EOF
  * is each walker's documented contract; this sweeps the class.
  * Deterministically seeded. */
object TextFuzzProps extends Properties("textfuzz") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withInitialSeed(Seed(20260816L)).withMinSuccessfulTests(300)

  /** Hostile characters and fragments a mutation plants: markup
    * metacharacters and unterminated construct openers. */
  private val HostileChars = "<&>\"'\\{}[]|#*`$%~\u0000\u00a0"
  private val HostileFrags = Array(
    "<!--", "<script", "<![CDATA[", "</", "<a href=\"", "&#", "&amp", "```",
    "\\begin{", "{{", "[[", "<|im_start|>", "/*", "\"\"\"", "<table><tr")

  private def mutate(valid: String, kind: Int, a: Double, b: Double, sel: Int): String = {
    val n = valid.length
    if (n == 0) return valid
    val offA = math.min((a * n).toInt, n - 1)
    val offB = math.min((b * n).toInt, n - 1)
    kind match {
      case 0 => // flip 1..8 chars to hostile characters
        val sb = new StringBuilder(valid)
        var i = 0
        while (i < 1 + sel * 2 && offA + i < n) {
          sb.setCharAt(offA + i, HostileChars((offA + i + sel) % HostileChars.length))
          i += 1
        }
        sb.toString
      case 1 => valid.substring(0, offA) // truncate
      case 2 => // inject an unterminated construct opener
        valid.substring(0, offA) + HostileFrags(sel % HostileFrags.length) +
          valid.substring(offA)
      case 3 => // splice a 24-char window from offB over offA
        val len = math.min(24, n - math.max(offA, offB))
        if (len <= 0) valid
        else valid.substring(0, offA) + valid.substring(offB, offB + len) +
          valid.substring(math.min(n, offA + len))
      case _ => // duplicate the tail onto the front (structure inversion)
        valid.substring(offA) + valid.substring(0, offA)
    }
  }

  private val mutationGen: Gen[(Int, Double, Double, Int)] = for {
    kind <- Gen.choose(0, 4)
    a <- Gen.choose(0.0, 0.999)
    b <- Gen.choose(0.0, 0.999)
    sel <- Gen.choose(0, 15)
  } yield (kind, a, b, sel)

  private def fuzz(name: String, fixtures: Seq[String])(walk: String => Unit): Unit =
    property(name) = Prop.forAll(Gen.choose(0, fixtures.length - 1), mutationGen) {
      case (fi, (kind, a, b, sel)) =>
        walk(mutate(fixtures(fi), kind, a, b, sel))
        true
    }

  private val sample =
    "The quick brown fox jumps over the lazy dog 42 times and then rests."

  fuzz("html: text, hrefs, anchors, tables, boilerplate blocks", Seq(
    Boilerplate.buildBpPage(7L, sample),
    HtmlIngest.buildTablePage(7L),
    HtmlIngest.buildAnchorPage(7L))) { s =>
    HtmlIngest.htmlToText(s)
    HtmlIngest.extractHrefs(s)
    HtmlIngest.extractAnchors(s)
    HtmlIngest.extractTables(s)
    Boilerplate.extractMain(s)
  }

  fuzz("markdown: prose extraction", Seq(
    MarkdownIngest.buildMd(7L, sample))) { s => MarkdownIngest.mdToText(s) }

  fuzz("latex: prose extraction", Seq(
    LatexIngest.buildTex(7L, sample))) { s => LatexIngest.texToText(s) }

  fuzz("wikitext: prose extraction", Seq(
    WikiIngest.buildWiki(7L, sample))) { s => WikiIngest.wikiToText(s) }

  fuzz("chat transcript: turn parse + loss mask", Seq(
    ChatIngest.buildChat(7L, sample))) { s => ChatIngest.parseChat(s) }

  fuzz("code: comments, license, secrets", Seq(
    CodeIngest.buildCode(7L, sample),
    CodeIngest.buildCode(8L, sample))) { s =>
    val scan = CodeIngest.scanComments(s)
    CodeIngest.docstring(scan)
    CodeIngest.detectLicense(s)
    CodeIngest.secretCounts(s)
  }

  fuzz("jsonl contract: flat parse + validate", Seq(
    JsonContract.buildLine(7L, "en", "web", sample))) { s =>
    JsonContract.validate(JsonContract.parseFlat(s))
  }

  fuzz("robots: group parse + verdict", Seq(
    CrawlPolicy.robotsFor("www.example.com"),
    CrawlPolicy.robotsFor("blog.example.org"),
    CrawlPolicy.robotsFor("docs.example.com"))) { s =>
    CrawlPolicy.verdict(CrawlPolicy.parseRobots(s), CrawlPolicy.Agent, "/a/c/x?q=1")
  }

  fuzz("sitemap: urlset walk", Seq(
    """<?xml version="1.0"?><urlset>
      <url><loc>https://e.example/a?x=1&amp;y=2</loc><lastmod>2026-01-02</lastmod><priority>0.5</priority></url>
      <url><loc>https://e.example/b</loc><lastmod>2026-03-04</lastmod><priority>1.0</priority></url>
      </urlset>""")) { s => SitemapIngest.parseUrlset(s) }
}
