package graft
package entry

import graft.engine.Tables
import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}
import OracleHelpers._

/** Corpus sources: web crawl chain, archive/columnar formats, markup extractors, code/chat prep — driver-contract registrations and their
  * DuckDB oracles, moved verbatim from the monolithic SparkEntry
  * (round 8; SparkEntry concatenates the per-module registries). */
private[graft] object SourceEntries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_bitext" -> (graft.operators.Bitext.qBitext _), // Gale-Church length-based sentence alignment,
    "q_license" -> (graft.sources.CodeIngest.qLicense _), // SPDX tag / header-phrase license screen,
    "q_code_comments" -> (graft.sources.CodeIngest.qCodeComments _), // quote-aware comment scan + docstring,
    "q_secrets" -> (graft.sources.CodeIngest.qSecrets _), // credential rules + integer high-entropy screen,
    "q_chat_turns" -> (graft.sources.ChatIngest.qChatTurns _), // ChatML-style turn parse + assistant-only loss mask,
    "q_json_validate" -> (graft.sources.JsonContract.qJsonValidate _), // data-contract verdicts per JSONL row,
    "q_html_ingest" -> (graft.sources.HtmlIngest.qHtmlIngest _), // HTML boilerplate-strip round trip,
    "q_boilerplate" -> (graft.sources.Boilerplate.qBoilerplate _), // block-level link-density main-content extraction,
    "q_markdown" -> (graft.sources.MarkdownIngest.qMarkdown _), // markdown -> prose extraction (fences/markers/links),
    "q_url_filter" -> (UrlOps.qUrlFilter _), // URL canonicalize + registrable domain + blocklist,
    "q_warc_ingest" -> (graft.sources.WarcIngest.qWarcIngest _), // WARC record walk -> HTTP -> HTML -> text,
    "q_jsonl_ingest" -> (graft.sources.JsonlGz.qJsonlIngest _), // gzipped-JSONL shards via the native json source,
    "q_zip_ingest" -> (graft.sources.ZipIngest.qZipIngest _), // ZIP archive shards, per-partition unpack,
    "q_orc_ingest" -> (graft.sources.OrcIngest.qOrcIngest _), // native vectorized ORC round trip,
    "q_csv_ingest" -> (graft.sources.CsvIngest.qCsvIngest _), // hand-rolled RFC 4180 shards via the native csv source,
    "q_avro_ingest" -> (graft.sources.AvroIngest.qAvroIngest _), // hand-rolled Avro OCF shards via the native avro source,
    "q_xml_ingest" -> (graft.sources.WikiIngest.qXmlIngest _), // mediawiki dump via the native xml source (rowTag=page),
    "q_wikitext" -> (graft.sources.WikiIngest.qWikitext _), // wikitext -> prose over the staged dump pages,
    "q_latex" -> (graft.sources.LatexIngest.qLatex _), // LaTeX -> prose (preamble/math/cite/float machinery out),
    "q_tar_ingest" -> (graft.sources.TarIngest.qTarIngest _), // hand-rolled POSIX ustar .tar.gz shards,
    "q_wds_ingest" -> (graft.sources.WebDataset.qWdsIngest _), // WebDataset tar shards: text+image paired by key,
    "q_robots" -> (CrawlPolicy.qRobots _), // RFC 9309 robots.txt verdicts per URL,
    "q_crawl_schedule" -> (CrawlPolicy.qCrawlSchedule _), // per-domain politeness fetch queue,
    "q_charset" -> (graft.sources.CharsetSniff.qCharset _), // BOM/UTF-8-validate/Latin-1 encoding detection,
    "q_mojibake" -> (graft.sources.CharsetSniff.qMojibake _), // UTF-8-as-Latin-1 mojibake repair, closed-form oracle,
    "q_links" -> (graft.sources.HtmlIngest.qLinks _), // href extraction + RFC 3986 reference resolution,
    "q_sitemap" -> (graft.sources.SitemapIngest.qSitemap _), // sitemapindex -> gzipped urlset shards walk,
    // --- storage-layer schema evolution (merged-footer parquet read)
    "q_schema_evolve" -> (graft.sources.SchemaEvolve.qSchemaEvolve _),
    // --- anchor-text aggregation per link target (web-graph signal)
    "q_anchor_text" -> (graft.sources.HtmlIngest.qAnchorText _),
    // --- web-table extraction (structured-data harvest from HTML)
    "q_html_tables" -> (graft.sources.HtmlIngest.qHtmlTables _),
  )

  val oracleSql: Map[String, String] = Map(
    // data-contract validation: staged JSONL shards plant one violation
    // family per doc_id % 7 (missing key / string-typed id / enum
    // breach / unknown field / null required); the oracle states every
    // verdict + offending field in closed form
    "q_json_validate" ->
      ("SELECT doc_id, CASE doc_id % 7 WHEN 1 THEN 'missing_required' " +
        "WHEN 2 THEN 'wrong_type' WHEN 3 THEN 'enum_violation' " +
        "WHEN 4 THEN 'unknown_field' WHEN 5 THEN 'null_required' ELSE 'ok' END AS verdict, " +
        "CASE doc_id % 7 WHEN 1 THEN 'lang' WHEN 2 THEN 'doc_id' WHEN 3 THEN 'lang' " +
        "WHEN 4 THEN 'extra' WHEN 5 THEN 'lang' ELSE '' END AS detail " +
        "FROM documents WHERE doc_id < 200 ORDER BY doc_id"),
    // chat-turn parsing + SFT loss masking: staged transcripts embed the
    // document body as the user turn among closed-form turns, an
    // unknown-role <|tool|> turn and pre-marker garbage (both must
    // vanish); assistant turns alone carry in_loss
    "q_chat_turns" ->
      ("WITH t AS (SELECT doc_id, trim(regexp_replace(coalesce(text, ''), " +
        "'[\\s\\x{00A0}]+', ' ', 'g')) AS body FROM documents WHERE doc_id < 200), " +
        "u AS (SELECT doc_id, 0 AS turn_idx, 'system' AS role, " +
        "'You are assistant ' || doc_id || '.' AS content, " +
        "CAST(4 AS BIGINT) AS n_tokens, false AS in_loss FROM t " +
        "UNION ALL SELECT doc_id, 1, 'user', body, " +
        "CAST(CASE WHEN body = '' THEN 0 ELSE len(string_split(body, ' ')) END AS BIGINT), false FROM t " +
        "UNION ALL SELECT doc_id, 2, 'assistant', 'Reply one for doc ' || doc_id || '.', 5, true FROM t " +
        "UNION ALL SELECT doc_id, 3, 'user', 'Follow-up ' || doc_id || '?', 2, false FROM t " +
        "UNION ALL SELECT doc_id, 4, 'assistant', 'Reply two.', 2, true FROM t) " +
        "SELECT doc_id, CAST(turn_idx AS INTEGER) AS turn_idx, role, content, " +
        "n_tokens, in_loss FROM u ORDER BY doc_id, turn_idx"),
    // license screen: the staged code fixture assigns licenses by
    // doc_id % 5 (SPDX tags for 0/2, header phrases for 1/3, none for
    // 4); the oracle states every verdict + detection route closed-form
    "q_license" ->
      ("SELECT doc_id, CASE doc_id % 5 WHEN 0 THEN 'MIT' WHEN 1 THEN 'MIT' " +
        "WHEN 2 THEN 'Apache-2.0' WHEN 3 THEN 'Apache-2.0' ELSE 'NONE' END AS license, " +
        "CASE WHEN doc_id % 5 IN (0, 2) THEN 'spdx' " +
        "WHEN doc_id % 5 IN (1, 3) THEN 'header' ELSE 'none' END AS via " +
        "FROM documents WHERE doc_id < 200 ORDER BY doc_id"),
    // comment scan: fixed template counts per license slot (+1 line for
    // SPDX tags, +1 block for header licenses over the base 2+2), and
    // the /** docstring must recover the document body exactly — a
    // scanner fooled by the planted //-in-string or /*-in-string traps
    // changes the counts and hash-mismatches
    "q_code_comments" ->
      ("WITH t AS (SELECT doc_id, trim(regexp_replace(coalesce(text, ''), " +
        "'[\\s\\x{00A0}]+', ' ', 'g')) AS body FROM documents WHERE doc_id < 200) " +
        "SELECT doc_id, " +
        "CAST(2 + CASE WHEN doc_id % 5 IN (0, 2) THEN 1 ELSE 0 END AS INTEGER) AS n_line_comments, " +
        "CAST(2 + CASE WHEN doc_id % 5 IN (1, 3) THEN 1 ELSE 0 END AS INTEGER) AS n_block_comments, " +
        "body AS docstring FROM t ORDER BY doc_id"),
    // secret screen: planted AKIA / 40-hex / high-entropy tokens by
    // doc_id residue; the decoys (short hex, URL, 32-char single-char
    // run) must NOT flag — an extra row hash-mismatches as surely as a
    // missed one
    "q_secrets" ->
      ("WITH m AS (SELECT doc_id FROM documents WHERE doc_id < 200), " +
        "k AS (SELECT doc_id, 'aws' AS kind FROM m WHERE doc_id % 2 = 0 " +
        "UNION ALL SELECT doc_id, 'entropy' FROM m WHERE doc_id % 4 = 0 " +
        "UNION ALL SELECT doc_id, 'hex40' FROM m WHERE doc_id % 3 = 0) " +
        "SELECT doc_id, kind, CAST(1 AS BIGINT) AS n_found FROM k ORDER BY doc_id, kind"),
    // bitext alignment: staged parallel files plant 2-1 merges at
    // (k+doc_id)%4==1 and 1-2 splits at %4==3 (disjoint, non-overlapping
    // by spacing); target lengths scale by floor(3/2), so true beads
    // cost <=1 while any misalignment pays a full sentence length — the
    // oracle restates the plant in closed form, never running a DP
    "q_bitext" ->
      ("WITH m AS (SELECT doc_id, 6 + doc_id % 5 AS n FROM documents WHERE doc_id < 200), " +
        "k AS (SELECT doc_id, n, unnest(generate_series(0, n - 1)) AS kk FROM m), " +
        "t AS (SELECT doc_id, kk, CASE " +
        "WHEN (kk + doc_id) % 4 = 1 AND kk + 1 < n THEN 'm' " +
        "WHEN kk >= 1 AND (kk - 1 + doc_id) % 4 = 1 THEN 'c' " +
        "WHEN (kk + doc_id) % 4 = 3 THEN 's' ELSE 'p' END AS ty FROM k), " +
        "g AS (SELECT doc_id, kk, CASE WHEN ty = 'm' THEN 2 ELSE 1 END AS n_src, " +
        "CASE WHEN ty = 's' THEN 2 ELSE 1 END AS n_tgt FROM t WHERE ty != 'c'), " +
        "r AS (SELECT doc_id, kk, n_src, n_tgt, " +
        "row_number() OVER (PARTITION BY doc_id ORDER BY kk) - 1 AS align_idx, " +
        "coalesce(sum(n_tgt) OVER (PARTITION BY doc_id ORDER BY kk " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tgt_start FROM g) " +
        "SELECT doc_id, CAST(align_idx AS INTEGER) AS align_idx, " +
        "CAST(kk AS INTEGER) AS src_start, CAST(n_src AS INTEGER) AS n_src, " +
        "CAST(tgt_start AS INTEGER) AS tgt_start, CAST(n_tgt AS INTEGER) AS n_tgt " +
        "FROM r ORDER BY doc_id, align_idx"),
    // the HTML round trip: staged real pages wrap each document's text in
    // boilerplate (nav, script, style, comments, entities — see
    // HtmlIngest.buildHtml); the extractor must reproduce EXACTLY the
    // visible text, which the oracle states in closed form — script/style
    // leakage, surviving comments, attribute-'>' truncation or an entity
    // mis-decode all hash-mismatch
    "q_html_ingest" ->
      ("WITH t AS (SELECT doc_id, trim(regexp_replace(coalesce(text, ''), " +
        // the extractor collapses NBSP with the whitespace run (RE2 \s
        // is ASCII-only, hence the explicit \x{00A0})
        "'[\\s\\x{00A0}]+', ' ', 'g')) AS body FROM documents WHERE doc_id < 200) " +
        "SELECT doc_id, 'Doc ' || doc_id || ' Home | About Doc #' || doc_id || " +
        "CASE WHEN body = '' THEN '' ELSE ' ' || body END || " +
        "' © 2026 Graft' AS text_clean FROM t ORDER BY doc_id"),
    // boilerplate removal: the staged pages bury each document's text in
    // nav / tag-cloud / teaser / footer noise (Boilerplate.buildBpPage);
    // the oracle states the content verdicts in closed form from the
    // fixture's construction — title/nav/tag-cloud/teaser/footer are
    // dropped (length or 3·anchor > length), the body survives iff its
    // collapsed length >= 25, the one-link prose block always survives
    "q_boilerplate" ->
      ("WITH t AS (SELECT doc_id, trim(regexp_replace(coalesce(text, ''), " +
        "'[\\s\\x{00A0}]+', ' ', 'g')) AS body FROM documents WHERE doc_id < 200), " +
        "s AS (SELECT doc_id, body, 'Doc ' || doc_id || " +
        "' keeps long plain prose flowing around one inline link to stay below the density cutoff.' AS prose FROM t) " +
        "SELECT doc_id, " +
        "CAST(CASE WHEN body = '' THEN 6 ELSE 7 END AS BIGINT) AS n_blocks, " +
        "CAST(CASE WHEN length(body) >= 25 THEN 2 ELSE 1 END AS BIGINT) AS n_content, " +
        "CASE WHEN length(body) >= 25 THEN body || ' ' || prose ELSE prose END AS main_text " +
        "FROM s ORDER BY doc_id"),
    // markdown extraction: staged .md pages wrap each document's text in
    // heading/byline/list/fence/blockquote/inline structure
    // (MarkdownIngest.buildMd); the oracle states the expected prose in
    // closed form — a leaked marker, surfaced fence code or a kept link
    // URL all hash-mismatch
    "q_markdown" ->
      ("WITH t AS (SELECT doc_id, trim(regexp_replace(coalesce(text, ''), " +
        "'[\\s\\x{00A0}]+', ' ', 'g')) AS body FROM documents WHERE doc_id < 200) " +
        "SELECT doc_id, 'Doc ' || doc_id || ' Posted on 2026-01-01 by author ' || doc_id || " +
        "CASE WHEN body = '' THEN '' ELSE ' ' || body END || " +
        "' item alpha item beta quoted wisdom line Inline code span and under emphasis close.' AS text_md " +
        "FROM t ORDER BY doc_id"),
    // the ZIP round trip: staged archive shards (ZipOutputStream) read
    // back through an independent ZipInputStream walk must reproduce the
    // documents table exactly; NULL text stages as an empty entry, so
    // the oracle coalesces the same way
    "q_zip_ingest" ->
      "SELECT doc_id, coalesce(text, '') AS text FROM documents ORDER BY doc_id",
    // the ORC round trip: Spark's native vectorized ORC source must
    // reproduce the documents table exactly (true null encoding — no
    // coalesce on either side)
    "q_orc_ingest" ->
      "SELECT doc_id, lang, source, text FROM documents ORDER BY doc_id",
    // the CSV round trip: hand-rolled RFC 4180 shards (quote doubling,
    // backslash-doubled `\N` null sentinel — the reader null-matches
    // post-unquote, so only write-side escaping protects literal
    // sentinels; quoted-empty vs unquoted-empty carries ''-vs-NULL) read
    // through the native csv source + the pair-collapse unescape must
    // reproduce the documents table exactly, true NULLs included
    "q_csv_ingest" ->
      "SELECT doc_id, lang, source, text FROM documents ORDER BY doc_id",
    // the Avro round trip: hand-rolled object container files (zigzag
    // varint longs, length-prefixed UTF-8, null-union branch indexes,
    // multi-block shards with sync markers) read through the native avro
    // source must reproduce the documents table exactly — unions carry
    // nullability natively, so true NULLs round-trip with no sentinel
    "q_avro_ingest" ->
      "SELECT doc_id, lang, source, text FROM documents ORDER BY doc_id",
    // the XML-dump round trip: hand-written mediawiki export shards
    // (entity-escaped) read through the native xml source with
    // rowTag=page + a declared two-level nested schema; every scalar
    // field is stated in closed form (the <text> payload is gated by
    // q_wikitext instead)
    "q_xml_ingest" ->
      ("SELECT doc_id, 'Doc ' || doc_id AS title, CAST(0 AS BIGINT) AS ns, " +
        "doc_id + 1000000 AS rev_id, '2026-01-01T00:00:00Z' AS rev_ts, " +
        "'author' || doc_id AS username " +
        "FROM documents WHERE doc_id < 200 ORDER BY doc_id"),
    // wikitext extraction over the SAME staged dump: heading fences,
    // emphasis ticks, template, ref body, link targets, category tag and
    // external URL all out; link labels and prose kept — the oracle
    // states the expected prose in closed form
    "q_wikitext" ->
      ("WITH t AS (SELECT doc_id, trim(regexp_replace(coalesce(text, ''), " +
        "'[\\s\\x{00A0}]+', ' ', 'g')) AS body FROM documents WHERE doc_id < 200) " +
        "SELECT doc_id, 'Doc ' || doc_id || ' Posted on 2026-01-01 by author ' || doc_id || " +
        "CASE WHEN body = '' THEN '' ELSE ' ' || body END || " +
        "' item alpha item beta external label and a plain link.' AS text_wiki " +
        "FROM t ORDER BY doc_id"),
    // LaTeX extraction: staged papers wrap each document's text in
    // preamble/math/citation/float machinery; the oracle states the
    // surviving prose in closed form — a leaked equation body, citation
    // key, caption or preamble line all hash-mismatch
    "q_latex" ->
      ("WITH t AS (SELECT doc_id, trim(regexp_replace(coalesce(text, ''), " +
        "'[\\s\\x{00A0}]+', ' ', 'g')) AS body FROM documents WHERE doc_id < 200) " +
        "SELECT doc_id, 'Doc ' || doc_id || ' author ' || doc_id || ' Introduction' || " +
        "CASE WHEN body = '' THEN '' ELSE ' ' || body END || " +
        "' The bound holds, and too; see . closing remarks keep 100% of prose. " +
        "item alpha item beta' AS text_tex " +
        "FROM t ORDER BY doc_id"),
    // the tar round trip: hand-rolled ustar writer vs an independent
    // header-walking reader (octal sizes, 512-block padding, SPACE-
    // blanked checksums) — same exact-reproduction oracle as zip
    "q_tar_ingest" ->
      "SELECT doc_id, coalesce(text, '') AS text FROM documents ORDER BY doc_id",
    // the WebDataset round trip: tar shards pair <key>.txt and <key>.png
    // entries per sample; the engine must walk the shards, pair by key
    // and REALLY decode both modalities — the oracle states text and
    // image geometry + weighted pixel sum in closed form
    "q_wds_ingest" ->
      ("WITH g AS (SELECT doc_id, coalesce(text, '') AS text, " +
        "doc_id % 40 + 8 AS w, doc_id % 23 + 8 AS h " +
        "FROM documents WHERE doc_id < 200) " +
        "SELECT doc_id, text, CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height, " +
        "CAST(list_sum([(((i % w) * 7 + (i // w) * 13 + doc_id) % 256) * (i + 1) " +
        "for i in generate_series(0, w * h - 1)]) AS BIGINT) AS pixel_sum " +
        "FROM g ORDER BY doc_id"),
    // robots.txt: the oracle states each rawUrl family's RFC 9309
    // verdict in closed form (longest-match allow-over-disallow,
    // specific-agent override, deny-all, '*'+'$' pattern, absent-file
    // default) — it never runs the parser
    "q_robots" ->
      ("SELECT doc_id, " +
        "CASE CAST(doc_id % 5 AS INTEGER) WHEN 0 THEN 'www.example.com' " +
        "WHEN 1 THEN 'blog.example.org' WHEN 2 THEN 'ads.spam-site.co.uk' " +
        "WHEN 3 THEN 'docs.example.com' ELSE 'example.com' END AS domain, " +
        "CAST(doc_id % 5 AS INTEGER) IN (0, 1, 4) AS allowed, " +
        "CAST(CASE WHEN doc_id % 5 = 0 THEN 2 ELSE -1 END AS BIGINT) AS crawl_delay " +
        "FROM documents ORDER BY doc_id"),
    // politeness scheduling: the oracle replays the robots verdicts in
    // closed form and the per-domain fetch queue as the same
    // row_number window — a wrong delay default, a filtered-late window
    // or a cross-domain slot leak all hash-mismatch
    "q_crawl_schedule" ->
      ("WITH v AS (SELECT doc_id, " +
        "CASE CAST(doc_id % 5 AS INTEGER) WHEN 0 THEN 'www.example.com' " +
        "WHEN 1 THEN 'blog.example.org' WHEN 2 THEN 'ads.spam-site.co.uk' " +
        "WHEN 3 THEN 'docs.example.com' ELSE 'example.com' END AS domain, " +
        "CASE WHEN doc_id % 5 = 0 THEN 2 ELSE 1 END AS delay_s " +
        "FROM documents WHERE CAST(doc_id % 5 AS INTEGER) IN (0, 1, 4)) " +
        "SELECT doc_id, domain, " +
        "CAST(row_number() OVER (PARTITION BY domain ORDER BY doc_id) - 1 AS BIGINT) AS fetch_slot, " +
        "CAST((row_number() OVER (PARTITION BY domain ORDER BY doc_id) - 1) * delay_s AS BIGINT) AS fetch_at_s " +
        "FROM v ORDER BY doc_id"),
    // charset detection: five encoding families by doc_id; the oracle
    // states label + decoded text in closed form (the appended marker's
    // non-ASCII chars make families distinguishable and Latin-1 bytes
    // invalid UTF-8) — a misrouted family corrupts the marker and
    // hash-mismatches
    "q_charset" ->
      ("SELECT doc_id, " +
        "CASE CAST(doc_id % 5 AS INTEGER) WHEN 0 THEN 'utf-8' WHEN 1 THEN 'utf-8-bom' " +
        "WHEN 2 THEN 'utf-16le' WHEN 3 THEN 'utf-16be' ELSE 'iso-8859-1' END AS charset, " +
        s"coalesce(text, '') || '${graft.sources.CharsetSniff.Marker}' AS text " +
        "FROM documents ORDER BY doc_id"),
    // mojibake repair: the oracle is the CLOSED-FORM expected output —
    // corrupted rows (doc_id % 3 = 0) repair back to text + marker,
    // clean ASCII rows pass through unflagged; it never runs the
    // corruptor or the repairer
    "q_mojibake" ->
      ("SELECT doc_id, doc_id % 3 = 0 AS repaired, " +
        s"CASE WHEN doc_id % 3 = 0 THEN coalesce(text, '') || '${graft.sources.CharsetSniff.MojibakeMarker}' " +
        "ELSE coalesce(text, '') END AS text_out FROM documents ORDER BY doc_id"),
    // link extraction: each staged page carries five hrefs (quoted,
    // single-quoted, unquoted, entity-encoded '&amp;', rooted, relative,
    // '../', query-bearing); the oracle states every resolved canonical
    // URL + registrable domain in closed form per family — it never runs
    // the extractor or the RFC 3986 resolver
    "q_links" ->
      ("WITH h AS (SELECT doc_id, " +
        "CASE CAST(doc_id % 5 AS INTEGER) WHEN 0 THEN 'www.example.com' " +
        "WHEN 1 THEN 'blog.example.org' WHEN 2 THEN 'ads.spam-site.co.uk' " +
        "WHEN 3 THEN 'docs.example.com' ELSE 'example.com' END AS host, " +
        "CASE CAST(doc_id % 5 AS INTEGER) WHEN 1 THEN 'example.org' " +
        "WHEN 2 THEN 'spam-site.co.uk' ELSE 'example.com' END AS dom " +
        "FROM documents WHERE doc_id < 200), " +
        "l AS (SELECT doc_id, dom, unnest([" +
        "'http://' || host || '/home', " +
        "'http://' || host || '/about?x=1&y=2', " +
        "'http://' || host || '/pages/sub/item/' || doc_id || '?ref=nav', " +
        "'http://' || host || '/pages/up/' || doc_id, " +
        "'http://' || host || '/pages/sub/plain' || doc_id || '.html']) AS url, " +
        "unnest([1, 2, 3, 4, 5]) AS link_no FROM h) " +
        "SELECT doc_id, CAST(link_no AS INTEGER) AS link_no, url, dom AS domain " +
        "FROM l ORDER BY doc_id, link_no"),
    // URL canonicalization: the engine PARSES each generated URL (hand
    // parser + RFC 3986 dot-segment removal + tracking-param strip +
    // suffix-aware domain); the oracle states each of the five
    // generator families' canonical form in closed form — it never runs
    // a parser, so any rule defect (kept default port, unresolved '..',
    // surviving utm_, wrong suffix split) hash-mismatches
    "q_url_filter" ->
      ("SELECT doc_id, CASE doc_id % 5 " +
        "WHEN 0 THEN 'http://www.example.com/a/c/page' || doc_id || '?q=' || doc_id " +
        "WHEN 1 THEN 'https://blog.example.org/posts/' || doc_id || '?id=' || doc_id " +
        "WHEN 2 THEN 'http://ads.spam-site.co.uk/offer' " +
        "WHEN 3 THEN 'https://docs.example.com/kb/' || doc_id || '?q=a%20b' " +
        "ELSE 'http://example.com/item/' || doc_id END AS url_norm, " +
        "CASE doc_id % 5 WHEN 1 THEN 'example.org' " +
        "WHEN 2 THEN 'spam-site.co.uk' ELSE 'example.com' END AS domain, " +
        "doc_id % 5 = 2 AS blocked " +
        "FROM documents ORDER BY doc_id"),
    // the WARC round trip: staged multi-record archives (warcinfo +
    // request + response records; the engine must walk by Content-Length
    // and keep only the HTTP-200 response bodies) extract to exactly the
    // q_html_ingest closed form plus each doc's crawl URI
    "q_warc_ingest" ->
      ("WITH t AS (SELECT doc_id, trim(regexp_replace(coalesce(text, ''), " +
        "'[\\s\\x{00A0}]+', ' ', 'g')) AS body FROM documents WHERE doc_id < 200) " +
        "SELECT doc_id, 'http://example.com/doc/' || doc_id AS url, " +
        "'Doc ' || doc_id || ' Home | About Doc #' || doc_id || " +
        "CASE WHEN body = '' THEN '' ELSE ' ' || body END || " +
        "' © 2026 Graft' AS text_clean FROM t ORDER BY doc_id"),
    // gzip-JSONL round trip: hand-built RFC 8259 lines in executor-written
    // gzip shards, read back through Spark's native json source — must
    // reproduce the documents table byte for byte
    "q_jsonl_ingest" ->
      "SELECT doc_id, lang, source, text FROM documents ORDER BY doc_id",
    // two-level sitemap walk: every field stated in closed form from the
    // deterministic generators (URL with entity-encoded query for odd
    // ids, lastmod date, priority decimal) — the oracle never parses XML
    "q_sitemap" ->
      ("SELECT doc_id, 'https://example.com/docs/' || doc_id || " +
        "CASE WHEN doc_id % 2 = 1 THEN '?a=1&b=2' ELSE '' END AS url, " +
        "CAST('2026-' || lpad(CAST(doc_id % 12 + 1 AS VARCHAR), 2, '0') || '-' || " +
        "lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') AS DATE) AS lastmod, " +
        "CAST(doc_id % 11 AS DOUBLE) / 10 AS priority " +
        "FROM documents WHERE doc_id < 200 ORDER BY doc_id"),
    // schema evolution: even doc_ids were written under the OLD 3-column
    // schema (no source), odd under the new one; the merged-footer read
    // must surface old rows with source NULL and the generation partition
    "q_schema_evolve" ->
      ("SELECT doc_id, lang, n_chars, " +
        "CASE WHEN doc_id % 2 = 1 THEN source END AS source, " +
        "CAST(doc_id % 2 AS BIGINT) AS gen FROM documents ORDER BY doc_id"),
    // web-table extraction: every cell stated in closed form — header
    // labels, the data-cell value formula, and the second table's
    // nested-tag/unclosed-cell normalizations; the decoy's &lt;tr&gt;
    // entity must NOT become a row
    "q_html_tables" ->
      ("WITH m AS (SELECT doc_id, doc_id % 4 + 2 AS r, doc_id % 3 + 2 AS c " +
        "FROM documents WHERE doc_id < 200), " +
        "h0 AS (SELECT doc_id, 0 AS table_idx, 0 AS row_idx, " +
        "unnest(generate_series(0, c - 1)) AS col_idx, TRUE AS is_header FROM m), " +
        "h1 AS (SELECT *, 'h' || col_idx AS cell FROM h0), " +
        "d0 AS (SELECT doc_id, 0 AS table_idx, unnest(generate_series(1, r)) AS row_idx, c FROM m), " +
        "d1 AS (SELECT doc_id, table_idx, row_idx, " +
        "unnest(generate_series(0, c - 1)) AS col_idx, FALSE AS is_header FROM d0), " +
        "d2 AS (SELECT *, 'v' || ((doc_id * 31 + row_idx * 7 + col_idx * 3) % 100) AS cell FROM d1), " +
        "t2 AS (SELECT doc_id, 1 AS table_idx, 0 AS row_idx, " +
        "unnest([0, 1]) AS col_idx, FALSE AS is_header FROM m), " +
        "t3 AS (SELECT doc_id, table_idx, row_idx, col_idx, is_header, " +
        "CASE col_idx WHEN 0 THEN 'x ' || doc_id ELSE 'y ' || doc_id END AS cell FROM t2) " +
        "SELECT doc_id, CAST(table_idx AS INTEGER) AS table_idx, " +
        "CAST(row_idx AS INTEGER) AS row_idx, CAST(col_idx AS INTEGER) AS col_idx, " +
        "is_header, cell FROM " +
        "(SELECT * FROM h1 UNION ALL SELECT * FROM d2 UNION ALL SELECT * FROM t3) " +
        "ORDER BY doc_id, table_idx, row_idx, col_idx"),
    // anchor-text aggregation: each staged hub page carries five anchor-
    // bearing links (plus one text-less anchor aggregation must drop);
    // the oracle replays the link graph, both per-target aggregates and
    // the (count desc, text asc) top-anchor pick in closed form
    "q_anchor_text" ->
      ("WITH h AS (SELECT doc_id, " +
        "CASE CAST(doc_id % 5 AS INTEGER) WHEN 0 THEN 'www.example.com' " +
        "WHEN 1 THEN 'blog.example.org' WHEN 2 THEN 'ads.spam-site.co.uk' " +
        "WHEN 3 THEN 'docs.example.com' ELSE 'example.com' END AS host, " +
        "CASE CAST(doc_id % 5 AS INTEGER) WHEN 1 THEN 'example.org' " +
        "WHEN 2 THEN 'spam-site.co.uk' ELSE 'example.com' END AS dom " +
        "FROM documents WHERE doc_id < 200), " +
        "l AS (SELECT doc_id, host, dom, unnest(generate_series(0, 4)) AS j FROM h), " +
        "x AS (SELECT doc_id, dom, " +
        "'http://' || host || '/doc/' || ((doc_id * 7 + j * 13) % 200) AS url, " +
        "CASE WHEN j = 2 THEN 'ref&' || ((doc_id * 7 + j * 13) % 200) " +
        "WHEN j = 4 THEN 'manual ' || ((doc_id * 7 + j * 13) % 200) " +
        "ELSE 'guide ' || ((doc_id * 7 + j * 13) % 200) END AS anchor FROM l), " +
        "g AS (SELECT url, dom, anchor, count(*) AS n FROM x GROUP BY 1, 2, 3), " +
        "t AS (SELECT url, anchor AS top_anchor, n AS top_n, " +
        "row_number() OVER (PARTITION BY url ORDER BY n DESC, anchor ASC) AS rn FROM g), " +
        "s AS (SELECT url, dom, count(*) AS n_refs, count(DISTINCT doc_id) AS n_pages " +
        "FROM x GROUP BY 1, 2) " +
        "SELECT s.url, s.dom AS domain, CAST(s.n_refs AS BIGINT) AS n_refs, " +
        "CAST(s.n_pages AS BIGINT) AS n_pages, t.top_anchor, CAST(t.top_n AS BIGINT) AS top_n " +
        "FROM s JOIN t ON s.url = t.url AND t.rn = 1 ORDER BY s.url"),
  )
}
