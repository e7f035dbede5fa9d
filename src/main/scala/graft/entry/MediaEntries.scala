package graft
package entry

import graft.engine.Tables
import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}
import OracleHelpers._

/** Multimodal: PDF/OCR ingestion and image/audio/video codecs, QC and near-dup — driver-contract registrations and their
  * DuckDB oracles, moved verbatim from the monolithic SparkEntry
  * (round 8; SparkEntry concatenates the per-module registries). */
private[graft] object MediaEntries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- multimodal plumbing extension (in-table binary payload layout)
    "q_multimodal" -> (Multimodal.qMultimodalDecode _), // real in-table PNG decode + patch grid
    // --- command dispatch (SURVEY §2.9),
    "q_binary_ingest" -> (graft.sources.BinaryIngest.qBinaryIngest _),
    "q_pdf_ingest" -> (graft.sources.BinaryIngest.qPdfIngest _), // real Flate-compressed PDF round trip,
    "q_pdf_cid" -> (graft.sources.BinaryIngest.qPdfCid _), // composite-font (CID/ToUnicode) round trip,
    "q_pdf_diffenc" -> (graft.sources.BinaryIngest.qPdfDiffenc _), // simple-font /Differences encoding round trip (AGL + uniXXXX),
    "q_pdf_diffenc2" -> (graft.sources.BinaryIngest.qPdfDiffenc2 _), // PER-FONT /Differences scoping: two fonts remap the same codes,
    "q_pdf_cid2" -> (graft.sources.BinaryIngest.qPdfCid2 _), // PER-FONT ToUnicode scoping: two composite fonts remap the same CIDs,
    "q_pdf_page_scope" -> (graft.sources.BinaryIngest.qPdfPageScope _), // PER-PAGE scoping: two pages bind the same name to conflicting fonts,
    "q_pdf_tree" -> (graft.sources.BinaryIngest.qPdfTree _), // nested page tree + inherited/indirect resources resolve per §7.7.3.4,
    "q_pdf_enc_xref" -> (graft.sources.BinaryIngest.qPdfEncXref _), // encrypted xref-stream files decrypt INSIDE the semantic walk,
    "q_pdf_encrypted" -> (graft.sources.BinaryIngest.qPdfEncrypted _), // RC4-128 standard-security decryption round trip,
    "q_pdf_aes" -> (graft.sources.BinaryIngest.qPdfAes _), // AESV2 (V4) decryption round trip,
    "q_pdf_aes256" -> (graft.sources.BinaryIngest.qPdfAes256 _), // AES-256 (V5/R6) decryption round trip,
    "q_pdf_objstm" -> (graft.sources.BinaryIngest.qPdfObjStm _), // xref-stream + ObjStm layout, stale-generation rewrite,
    "q_ocr_ingest" -> (graft.sources.OcrEngine.qOcrIngest _), // scanned (image-only) PDFs through REAL template-matching OCR,
    "q_ocr_trained" -> (graft.sources.OcrTrained.qOcrTrained _), // TRAINED-font OCR: majority-vote-learned templates over a second font,
    "q_image_ingest" -> (Multimodal.qImageIngest _), // real PNG decode (ImageIO) round trip,
    "q_audio_ingest" -> (Multimodal.qAudioIngest _), // real WAV decode (AudioSystem) round trip,
    "q_audio_resample" -> (Multimodal.qAudioResample _), // integer-exact linear resample to 16 kHz,
    "q_audio_vad" -> (Multimodal.qAudioVad _), // energy VAD -> maximal active segments over real decode,
    "q_audio_clip" -> (Multimodal.qAudioClip _), // at-rail clipping ratio over real decode (audio QC),
    "q_png_meta" -> (Multimodal.qPngMeta _), // tEXt provenance chunks via an independent chunk walk,
    "q_blur_screen" -> (Multimodal.qBlurScreen _), // Laplacian-energy image QC over real decode,
    "q_image_resize" -> (Multimodal.qImageResize _), // real decode + NN resample round trip,
    "q_gif_frames" -> (Multimodal.qGifFrames _), // real multi-frame decode (animated GIF),
    "q_video_frames" -> (Multimodal.qVideoFrames _), // real RIFF/AVI container walk + DIB frame decode,
    "q_video_shots" -> (Multimodal.qVideoShots _), // MAD shot-boundary detection over decoded rasters,
    "q_image_dhash" -> (Multimodal.qImageDhash _), // perceptual-hash (dHash) image near-dup, banded Hamming LSH,
    "q_audio_fp" -> (Multimodal.qAudioFp _), // energy-profile audio fingerprint near-dup (loudness-invariant),
    "q_dhash_incremental" -> (Multimodal.qDhashIncremental _), // persisted dHash index + probe batch (streaming image dedup),
    "q_multimodal_frames" -> (Multimodal.qMultimodalFrames _), // real in-table GIF, stride-2 frame sampling,
    "q_multimodal_resize" -> (Multimodal.qMultimodalResize _), // real in-table PNG, NN resize 12-px box
    // --- text normalization + heuristic filtering,
    // --- header-only JPEG audit (SOF marker walk, no decode)
    "q_jpeg_meta" -> (Multimodal.qJpegMeta _),
    // --- video near-dup via per-frame dHash signatures (banded LSH)
    "q_video_dedup" -> (Multimodal.qVideoDedup _),
    // --- caption-image consistency screen (pair-level multimodal QC)
    "q_caption_check" -> (Multimodal.qCaptionCheck _),
    "q_caption_trained" -> (Multimodal.qCaptionTrained _), // GD-trained caption scorer over decode deltas; held-out classification,
  )

  val oracleSql: Map[String, String] = Map(
    // REAL decode over the in-table PNG payload layout: the oracle
    // recomputes geometry, the 16-px patch-grid count and the
    // position-weighted pixel sum in closed form from the deterministic
    // image function (Multimodal.buildPng) — it never runs a codec, so
    // any decode defect (or a sentinel -1 row) hash-mismatches
    "q_multimodal" ->
      ("WITH g AS (SELECT doc_id, doc_id % 40 + 8 AS w, doc_id % 23 + 8 AS h " +
        "FROM documents WHERE doc_id < 200) " +
        "SELECT doc_id, CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height, " +
        "CAST(((w + 15) // 16) * ((h + 15) // 16) AS BIGINT) AS n_patches, " +
        "CAST(list_sum([(((i % w) * 7 + (i // w) * 13 + doc_id) % 256) * (i + 1) " +
        "for i in generate_series(0, w * h - 1)]) AS BIGINT) AS pixel_sum " +
        "FROM g ORDER BY doc_id"),
    "q_binary_ingest" ->
      ("WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words " +
        "FROM documents WHERE doc_id < 200) " +
        "SELECT doc_id AS document_id, r_name AS category_name, " +
        "CAST((len(words)-1)//40 + 1 AS BIGINT) AS n_pages, " +
        "CAST(list_sum([(len(words[p*40+1 : p*40+40]) - 1)//3 + 1 " +
        "for p in generate_series(0, (len(words)-1)//40)]) AS BIGINT) AS n_snippets, " +
        "array_to_string(words[1:5], ' ') AS first_snippet " +
        "FROM w LEFT JOIN region ON doc_id % 5 = r_regionkey ORDER BY document_id"),
    // the PDF round trip must reproduce the source text EXACTLY: the
    // oracle is the documents table itself — any inflate/escape/run
    // defect in the extractor hash-mismatches
    "q_pdf_ingest" ->
      "SELECT doc_id, text FROM documents WHERE doc_id < 200 ORDER BY doc_id",
    // the composite-font round trip must ALSO reproduce the source text
    // exactly — same oracle shape; the staged bytes are Type0/Identity-H
    // with hex CID strings and a ToUnicode CMap, so any defect in the
    // CMap parse, range expansion or 2-byte decode hash-mismatches
    "q_pdf_cid" ->
      "SELECT doc_id, text FROM documents WHERE doc_id < 200 ORDER BY doc_id",
    // /Differences: the staged codes SKIP their own Latin-1 values, so
    // only the glyph-name remap (AGL table + uniXXXX) reproduces the
    // source text — a naive 1-byte decode garbles and hash-fails
    "q_pdf_diffenc" ->
      "SELECT doc_id, text FROM documents WHERE doc_id < 200 ORDER BY doc_id",
    // per-font /Differences: the two staged fonts remap the SAME codes
    // to different glyphs — a merged per-document map decodes one half
    // with the other half's glyphs and hash-fails; only Tf-tracked
    // per-font scoping reproduces the source text
    "q_pdf_diffenc2" ->
      "SELECT doc_id, text FROM documents WHERE doc_id < 200 ORDER BY doc_id",
    // per-font ToUnicode: the two staged composite fonts map the SAME
    // CIDs to different characters — a merged document CMap decodes one
    // half with the other half's characters and hash-fails; only
    // Tf-tracked per-font CMap scoping reproduces the source text
    "q_pdf_cid2" ->
      "SELECT doc_id, text FROM documents WHERE doc_id < 200 ORDER BY doc_id",
    // per-page scoping: the two staged pages bind the SAME resource name
    // to fonts whose Differences maps conflict — a document-level
    // per-name merge decodes page 1 with page 2's glyphs and hash-fails
    "q_pdf_page_scope" ->
      "SELECT doc_id, text FROM documents WHERE doc_id < 200 ORDER BY doc_id",
    // nested page tree: page A sits a /Pages level down with only
    // INHERITED indirect resources, page B resolves /Resources and
    // /Font through two indirections, fonts conflict on /F1 — exact
    // equality requires recursion + inheritance + indirection at once
    "q_pdf_tree" ->
      "SELECT doc_id, text FROM documents WHERE doc_id < 200 ORDER BY doc_id",
    // encrypted xref-stream: the walk must decrypt per object IN PLACE —
    // the legacy fallback decrypts too but merges the conflicting
    // per-page maps and garbles one page, so exact equality pins the
    // combination, not just each layer
    "q_pdf_enc_xref" ->
      "SELECT doc_id, text FROM documents WHERE doc_id < 200 ORDER BY doc_id",
    // the encrypted round trip: staged RC4-128 standard-security PDFs
    // must decrypt (file key from /O,/P,/ID; per-object keys) and then
    // extract to EXACTLY the source text — RC4 under any wrong key is
    // pseudo-random bytes that cannot even inflate
    "q_pdf_encrypted" ->
      "SELECT doc_id, text FROM documents WHERE doc_id < 200 ORDER BY doc_id",
    // AESV2: same exact-equality oracle; a wrong salted key fails CBC
    // padding and the stream drops — garbage cannot pass
    "q_pdf_aes" ->
      "SELECT doc_id, text FROM documents WHERE doc_id < 200 ORDER BY doc_id",
    // AES-256 (V5/R6): same exact-equality oracle; a wrong Algorithm-2.B
    // hash or /UE unwrap yields a key that fails CBC padding
    "q_pdf_aes256" ->
      "SELECT doc_id, text FROM documents WHERE doc_id < 200 ORDER BY doc_id",
    // xref-stream + ObjStm layout: exact equality REQUIRES the semantic
    // page-tree walk — the staged files carry a freed STALE content
    // generation that any scan-all-streams extractor would resurrect
    // ('STALE ...' prefix), and the live stream's /Length integer lives
    // inside the ObjStm
    "q_pdf_objstm" ->
      "SELECT doc_id, text FROM documents WHERE doc_id < 200 ORDER BY doc_id",
    // the PNG round trip: the engine decodes REAL staged PNGs (ImageIO)
    // and reports measured geometry + a position-weighted pixel sum; the
    // oracle recomputes both in closed form from the deterministic image
    // function (Multimodal.buildPng) — wrong pixels, swapped axes or a
    // failed decode (sentinel -1s) all hash-mismatch
    "q_image_ingest" ->
      ("WITH g AS (SELECT doc_id, doc_id % 40 + 8 AS w, doc_id % 23 + 8 AS h " +
        "FROM documents WHERE doc_id < 200) " +
        "SELECT doc_id, CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height, " +
        "CAST(list_sum([(((i % w) * 7 + (i // w) * 13 + doc_id) % 256) * (i + 1) " +
        "for i in generate_series(0, w * h - 1)]) AS BIGINT) AS pixel_sum " +
        "FROM g ORDER BY doc_id"),
    // real resize: decode the staged PNG, nearest-neighbor resample into
    // a 16-px box (sx = x*w div ow — pure integer math), report measured
    // geometry + weighted pixel sum; the oracle recomputes every output
    // pixel's source coordinate in closed form
    "q_image_resize" ->
      ("WITH g AS (SELECT doc_id, doc_id % 40 + 8 AS w, doc_id % 23 + 8 AS h, " +
        "least(doc_id % 40 + 8, 16) AS ow, least(doc_id % 23 + 8, 16) AS oh " +
        "FROM documents WHERE doc_id < 200) " +
        "SELECT doc_id, CAST(ow AS INTEGER) AS out_w, CAST(oh AS INTEGER) AS out_h, " +
        "CAST(list_sum([((((i % ow) * w // ow) * 7 + ((i // ow) * h // oh) * 13 + doc_id) % 256) * (i + 1) " +
        "for i in generate_series(0, ow * oh - 1)]) AS BIGINT) AS pixel_sum " +
        "FROM g ORDER BY doc_id"),
    // the WAV round trip: the engine decodes REAL staged RIFF/WAVE files
    // through the JDK's own audio codec (AudioSystem) and reports the
    // measured format + a position-weighted sample sum; the oracle
    // recomputes both in closed form from the deterministic PCM function
    // (Multimodal.audioSample) — wrong endianness, channel miscount or a
    // failed parse (sentinel -1s) all hash-mismatch
    "q_audio_ingest" ->
      ("WITH g AS (SELECT doc_id, " +
        "CAST(8000 + (doc_id % 5) * 2000 AS INTEGER) AS sample_rate, " +
        "CAST(1 + doc_id % 2 AS INTEGER) AS channels, " +
        "CAST(doc_id % 200 + 50 AS BIGINT) AS n_frames " +
        "FROM documents WHERE doc_id < 200) " +
        "SELECT doc_id, sample_rate, channels, n_frames, " +
        "CAST(list_sum([((((i * 37 + doc_id * 11) % 65536) - 32768) * (i + 1)) " +
        "for i in generate_series(0, n_frames * channels - 1)]) AS BIGINT) AS sample_sum " +
        "FROM g ORDER BY doc_id"),
    // the animated-GIF round trip: the engine decodes every frame of REAL
    // staged multi-frame GIFs (ImageIO reader over the container) and the
    // oracle recomputes each frame's geometry + weighted pixel sum in
    // closed form from the deterministic frame function
    // (Multimodal.gifPixel) — a dropped frame, frame-order swap or
    // palette quantization defect all hash-mismatch
    "q_gif_frames" ->
      ("WITH g AS (SELECT doc_id, doc_id % 21 + 6 AS w, doc_id % 13 + 6 AS h, " +
        "doc_id % 4 + 2 AS nf FROM documents WHERE doc_id < 200), " +
        "f AS (SELECT doc_id, w, h, unnest(generate_series(0, nf - 1)) AS frame_no FROM g) " +
        "SELECT doc_id, CAST(frame_no AS INTEGER) AS frame_no, " +
        "CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height, " +
        "CAST(list_sum([(((i % w) * 5 + (i // w) * 11 + frame_no * 17 + doc_id) % 256) * (i + 1) " +
        "for i in generate_series(0, w * h - 1)]) AS BIGINT) AS pixel_sum " +
        "FROM f ORDER BY doc_id, frame_no"),
    // the AVI round trip: the engine walks REAL staged RIFF/AVI clips
    // (independent chunk parser: hdrl/strl/strf capture, movi frame
    // chunks, bottom-up 24-bit DIB bits with 4-byte-padded rows) and the
    // oracle recomputes each frame's geometry + weighted pixel sum in
    // closed form from the deterministic frame function
    // (Multimodal.aviPixel) — a missed bottom-up flip, a stride-padding
    // slip, a dropped frame or a failed walk (sentinel -1s) all
    // hash-mismatch
    "q_video_frames" ->
      ("WITH g AS (SELECT doc_id, doc_id % 19 + 6 AS w, doc_id % 11 + 6 AS h, " +
        "doc_id % 3 + 2 AS nf FROM documents WHERE doc_id < 200), " +
        "f AS (SELECT doc_id, w, h, unnest(generate_series(0, nf - 1)) AS frame_no FROM g) " +
        "SELECT doc_id, CAST(frame_no AS INTEGER) AS frame_no, " +
        "CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height, " +
        "CAST(list_sum([(((i % w) * 3 + (i // w) * 7 + frame_no * 13 + doc_id) % 256) * (i + 1) " +
        "for i in generate_series(0, w * h - 1)]) AS BIGINT) AS pixel_sum " +
        "FROM f ORDER BY doc_id, frame_no"),
    // shot-boundary detection: staged clips plant scene cuts every
    // segLen frames with BOUNDED pixel values, so every pixel moves by
    // the same delta between consecutive frames — +1 inside a scene,
    // 41-seg (even->odd scene) or -(39+seg) (odd->even) at a cut — and
    // the engine's real decode+diff MAD equals that |delta| exactly.
    // The oracle states every frame's MAD and cut verdict in closed form
    "q_video_shots" ->
      ("WITH m AS (SELECT doc_id, doc_id % 3 + 3 AS seg FROM documents WHERE doc_id < 200), " +
        "f AS (SELECT doc_id, seg, unnest(generate_series(1, 11)) AS fi FROM m), " +
        "v AS (SELECT doc_id, fi, CASE WHEN fi % seg != 0 THEN 1 " +
        "WHEN (fi // seg) % 2 = 1 THEN 41 - seg ELSE 39 + seg END AS mad FROM f) " +
        "SELECT doc_id, CAST(fi AS INTEGER) AS frame_idx, CAST(mad AS BIGINT) AS mad, " +
        "mad > 10 AS is_cut FROM v ORDER BY doc_id, frame_idx"),
    // the OCR round trip: scanned (image-only, NO text layer) PDFs route
    // through needs_ocr to the template-matching OCR engine, which must
    // recover each document's normalized text EXACTLY (the font's
    // min-pairwise-distance margin makes recovery provable under the
    // 1-bit-per-cell noise). The oracle replays the normalization in
    // closed form and pins needs_ocr TRUE — a text-layer leak, a routing
    // slip or one misread glyph hash-mismatches
    "q_ocr_ingest" ->
      ("SELECT doc_id, true AS needs_ocr, " +
        "rtrim(left(trim(regexp_replace(regexp_replace(regexp_replace(" +
        "translate(coalesce(text, ''), 'abcdefghijklmnopqrstuvwxyz', " +
        "'ABCDEFGHIJKLMNOPQRSTUVWXYZ'), '[\\t\\n\\r\\f]', ' ', 'g'), " +
        "'[^A-Z0-9 ]', '', 'g'), ' +', ' ', 'g')), 120)) AS text " +
        "FROM documents WHERE doc_id < 200 ORDER BY doc_id"),
    // trained-font OCR: identical closed-form oracle — the LEARNED model
    // must recover exactly what the fixed engine recovers from its own
    // font (recovery is provable: XOR-mask fonts preserve the distance
    // margin, majority-vote training is exact under <= 1 flip per bit
    // per glyph sample set); a one-bit training slip on one glyph
    // hash-mismatches every doc containing it
    "q_ocr_trained" ->
      ("SELECT doc_id, true AS needs_ocr, " +
        "rtrim(left(trim(regexp_replace(regexp_replace(regexp_replace(" +
        "translate(coalesce(text, ''), 'abcdefghijklmnopqrstuvwxyz', " +
        "'ABCDEFGHIJKLMNOPQRSTUVWXYZ'), '[\\t\\n\\r\\f]', ' ', 'g'), " +
        "'[^A-Z0-9 ]', '', 'g'), ' +', ' ', 'g')), 120)) AS text " +
        "FROM documents WHERE doc_id < 200 ORDER BY doc_id"),
    // perceptual-hash image near-dup: the engine REALLY decodes every
    // staged PNG (bases doc_id < 200 + brightness-shifted planted copies
    // under ids 1000+id), dHashes the raster, and finds Hamming<=3 pairs
    // through the banded LSH join (exact by pigeonhole: 4 bands > 3
    // differing bits). The oracle recomputes every hash bit in closed
    // form from the pixel formula and brute-forces ALL pairs — a decode
    // defect, a sampling off-by-one, a band packing slip or a missed
    // candidate bucket all hash-mismatch
    "q_image_dhash" ->
      ("WITH m AS (SELECT doc_id AS mid, doc_id % 40 + 8 AS w, doc_id % 23 + 8 AS h, " +
        "doc_id * 11 AS t FROM documents WHERE doc_id < 200 " +
        "UNION ALL SELECT 1000 + doc_id, doc_id % 40 + 8, doc_id % 23 + 8, " +
        "doc_id * 11 + 3 FROM documents WHERE doc_id < 20), " +
        "g AS (SELECT mid, t, (y * 8 + x) AS bi, " +
        "((x * w) // 9) AS s0, (((x + 1) * w) // 9) AS s1, ((y * h) // 8) AS sy " +
        "FROM m, generate_series(0, 7) gx(x), generate_series(0, 7) gy(y)), " +
        "bits AS (SELECT mid, bi, " +
        "CASE WHEN ((s1 * s1 * 3 + sy * sy * 5 + s1 * sy * 7 + t) % 256) > " +
        "((s0 * s0 * 3 + sy * sy * 5 + s0 * sy * 7 + t) % 256) THEN 1 ELSE 0 END AS b " +
        "FROM g), " +
        "bands AS (SELECT mid, " +
        "CAST(sum(CASE WHEN bi // 16 = 0 THEN b * (1 << (bi % 16)) ELSE 0 END) AS BIGINT) AS b0, " +
        "CAST(sum(CASE WHEN bi // 16 = 1 THEN b * (1 << (bi % 16)) ELSE 0 END) AS BIGINT) AS b1, " +
        "CAST(sum(CASE WHEN bi // 16 = 2 THEN b * (1 << (bi % 16)) ELSE 0 END) AS BIGINT) AS b2, " +
        "CAST(sum(CASE WHEN bi // 16 = 3 THEN b * (1 << (bi % 16)) ELSE 0 END) AS BIGINT) AS b3 " +
        "FROM bits GROUP BY mid), " +
        "pr AS (SELECT a.mid AS ida, c.mid AS idb, " +
        "CAST(bit_count(xor(a.b0, c.b0)) + bit_count(xor(a.b1, c.b1)) + " +
        "bit_count(xor(a.b2, c.b2)) + bit_count(xor(a.b3, c.b3)) AS BIGINT) AS hamming " +
        "FROM bands a JOIN bands c ON a.mid < c.mid), " +
        "cl AS (SELECT * FROM pr WHERE hamming <= 3), " +
        "sym AS (SELECT ida AS mid, idb AS nbr, hamming FROM cl " +
        "UNION ALL SELECT idb, ida, hamming FROM cl), " +
        "mh AS (SELECT mid, min(hamming) AS min_hamming FROM sym GROUP BY mid), " +
        "best AS (SELECT s.mid, min(s.nbr) AS dup_of, mh.min_hamming " +
        "FROM sym s JOIN mh ON s.mid = mh.mid AND s.hamming = mh.min_hamming " +
        "GROUP BY s.mid, mh.min_hamming) " +
        "SELECT b.mid AS doc_id, b.b0, b.b1, b.b2, b.b3, best.dup_of, best.min_hamming " +
        "FROM bands b LEFT JOIN best ON b.mid = best.mid ORDER BY doc_id"),
    // incremental image dedup: even bases persist as the dHash index,
    // the probe batch (odd bases + all planted copies) joins the STORED
    // 4-int rows; the oracle replays both sides' hashes closed-form and
    // brute-forces probe x index with the same <=3 verdicts
    "q_dhash_incremental" ->
      ("WITH m AS (SELECT 'p' AS side, doc_id AS mid, doc_id % 40 + 8 AS w, " +
        "doc_id % 23 + 8 AS h, doc_id * 11 AS t FROM documents " +
        "WHERE doc_id < 200 AND doc_id % 2 = 1 " +
        "UNION ALL SELECT 'p', 1000 + doc_id, doc_id % 40 + 8, doc_id % 23 + 8, " +
        "doc_id * 11 + 3 FROM documents WHERE doc_id < 20 " +
        "UNION ALL SELECT 'i', doc_id, doc_id % 40 + 8, doc_id % 23 + 8, " +
        "doc_id * 11 FROM documents WHERE doc_id < 200 AND doc_id % 2 = 0), " +
        "g AS (SELECT side, mid, t, (y * 8 + x) AS bi, " +
        "((x * w) // 9) AS s0, (((x + 1) * w) // 9) AS s1, ((y * h) // 8) AS sy " +
        "FROM m, generate_series(0, 7) gx(x), generate_series(0, 7) gy(y)), " +
        "bits AS (SELECT side, mid, bi, " +
        "CASE WHEN ((s1 * s1 * 3 + sy * sy * 5 + s1 * sy * 7 + t) % 256) > " +
        "((s0 * s0 * 3 + sy * sy * 5 + s0 * sy * 7 + t) % 256) THEN 1 ELSE 0 END AS b " +
        "FROM g), " +
        "bands AS (SELECT side, mid, " +
        "CAST(sum(CASE WHEN bi // 16 = 0 THEN b * (1 << (bi % 16)) ELSE 0 END) AS BIGINT) AS b0, " +
        "CAST(sum(CASE WHEN bi // 16 = 1 THEN b * (1 << (bi % 16)) ELSE 0 END) AS BIGINT) AS b1, " +
        "CAST(sum(CASE WHEN bi // 16 = 2 THEN b * (1 << (bi % 16)) ELSE 0 END) AS BIGINT) AS b2, " +
        "CAST(sum(CASE WHEN bi // 16 = 3 THEN b * (1 << (bi % 16)) ELSE 0 END) AS BIGINT) AS b3 " +
        "FROM bits GROUP BY side, mid), " +
        "cl AS (SELECT p.mid AS pid, i.mid AS iid, " +
        "CAST(bit_count(xor(p.b0, i.b0)) + bit_count(xor(p.b1, i.b1)) + " +
        "bit_count(xor(p.b2, i.b2)) + bit_count(xor(p.b3, i.b3)) AS BIGINT) AS hamming " +
        "FROM bands p JOIN bands i ON p.side = 'p' AND i.side = 'i') , " +
        "clf AS (SELECT * FROM cl WHERE hamming <= 3), " +
        "mh AS (SELECT pid, min(hamming) AS min_hamming FROM clf GROUP BY pid), " +
        "best AS (SELECT c.pid, min(c.iid) AS dup_of, mh.min_hamming " +
        "FROM clf c JOIN mh ON c.pid = mh.pid AND c.hamming = mh.min_hamming " +
        "GROUP BY c.pid, mh.min_hamming) " +
        "SELECT m.mid AS doc_id, best.dup_of, best.min_hamming " +
        "FROM m LEFT JOIN best ON m.mid = best.pid WHERE m.side = 'p' ORDER BY doc_id"),
    // resample-to-16k: the engine really decodes each staged WAV and
    // linear-interpolates to 16 kHz in integer math; the oracle replays
    // interpolation, tail clamp and trunc-toward-zero division from the
    // closed-form sample formula ((i*37 + doc_id*11) % 65536 - 32768)
    "q_audio_resample" ->
      ("WITH m AS (SELECT doc_id, 8000 + (doc_id % 5) * 2000 AS r, " +
        "1 + doc_id % 2 AS c, doc_id % 200 + 50 AS f FROM documents WHERE doc_id < 200), " +
        "p AS (SELECT doc_id, r, c, f, (f * 16000) // r AS nout FROM m), " +
        "kk AS (SELECT doc_id, r, c, f, nout, unnest(generate_series(0, nout - 1)) AS k FROM p), " +
        "cc AS (SELECT doc_id, r, c, f, nout, k, unnest(generate_series(0, c - 1)) AS ch FROM kk), " +
        "v AS (SELECT doc_id, c, k, ch, (k * r) // 16000 AS idx, (k * r) % 16000 AS rem, f FROM cc), " +
        "w AS (SELECT doc_id, c, k, ch, rem, " +
        "((idx * c + ch) * 37 + doc_id * 11) % 65536 - 32768 AS s0, " +
        "((least(idx + 1, f - 1) * c + ch) * 37 + doc_id * 11) % 65536 - 32768 AS s1 FROM v), " +
        "x AS (SELECT doc_id, (s0 + ((s1 - s0) * rem) // 16000) * (k * c + ch + 1) AS term FROM w), " +
        "agg AS (SELECT doc_id, CAST(sum(term) AS BIGINT) AS sample_sum FROM x GROUP BY doc_id) " +
        "SELECT p.doc_id, CAST(16000 AS INTEGER) AS out_rate, CAST(p.c AS INTEGER) AS channels, " +
        "CAST(p.nout AS BIGINT) AS n_out_frames, agg.sample_sum " +
        "FROM p JOIN agg USING (doc_id) ORDER BY doc_id"),
    // clipping detection: every third staged clip plants 20% of samples
    // at the positive rail; the oracle replays the FULL sample formula
    // (incidental rail hits from the base signal included) + the 5%
    // threshold in closed form
    "q_audio_clip" ->
      ("WITH m AS (SELECT doc_id, 200 + doc_id % 100 AS n FROM documents WHERE doc_id < 200), " +
        "i AS (SELECT doc_id, n, unnest(generate_series(0, n - 1)) AS k FROM m), " +
        "s AS (SELECT doc_id, n, CASE WHEN doc_id % 3 = 0 AND (k + doc_id) % 10 < 2 THEN 32767 " +
        "ELSE (k * 37 + doc_id * 11) % 65536 - 32768 END AS v FROM i), " +
        "c AS (SELECT doc_id, n, CAST(sum(CASE WHEN v = 32767 OR v = -32768 THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS nc FROM s GROUP BY doc_id, n) " +
        "SELECT doc_id, CAST(n AS BIGINT) AS n_samples, nc AS n_clipped, " +
        "nc * 20 > n AS is_clipped FROM c ORDER BY doc_id"),
    // voice-activity detection: staged clips plant silence in a
    // quadratic-residue pattern ((f^2 + doc_id) % 7 < 3 -> all-zero
    // samples; active frames provably nonzero since 37 is coprime to
    // 65536), the engine really decodes + frames + merges active runs,
    // and the oracle replays the runs as a gaps-and-islands window over
    // the closed-form silence predicate
    "q_audio_vad" ->
      ("WITH m AS (SELECT doc_id, 30 + doc_id % 20 AS nf FROM documents WHERE doc_id < 200), " +
        "f AS (SELECT doc_id, unnest(generate_series(0, nf - 1)) AS fr FROM m), " +
        "a AS (SELECT doc_id, fr FROM f WHERE (fr * fr + doc_id) % 7 >= 3), " +
        "g AS (SELECT doc_id, fr, fr - row_number() OVER (PARTITION BY doc_id ORDER BY fr) AS grp FROM a), " +
        "s AS (SELECT doc_id, grp, min(fr) AS start_frame, count(*) AS n_frames " +
        "FROM g GROUP BY doc_id, grp) " +
        "SELECT doc_id, CAST(row_number() OVER (PARTITION BY doc_id ORDER BY start_frame) - 1 " +
        "AS INTEGER) AS seg_idx, CAST(start_frame AS INTEGER) AS start_frame, " +
        "CAST(n_frames AS BIGINT) AS n_frames FROM s ORDER BY doc_id, seg_idx"),
    // PNG provenance metadata: staged images carry spliced CRC-correct
    // tEXt chunks; the independent chunk walk must surface IHDR geometry
    // + every key/value exactly as stated here in closed form
    "q_png_meta" ->
      ("WITH m AS (SELECT doc_id FROM documents WHERE doc_id < 200), " +
        "k AS (SELECT doc_id, unnest([" +
        "struct_pack(meta_key := 'Author', meta_value := 'author ' || doc_id), " +
        "struct_pack(meta_key := 'Software', meta_value := 'graft ' || (doc_id % 7)), " +
        "struct_pack(meta_key := 'Title', meta_value := 'Doc ' || doc_id)]) AS z FROM m) " +
        "SELECT doc_id, CAST(doc_id % 40 + 8 AS INTEGER) AS width, " +
        "CAST(doc_id % 23 + 8 AS INTEGER) AS height, " +
        "z.meta_key AS meta_key, z.meta_value AS meta_value " +
        "FROM k ORDER BY doc_id, meta_key"),
    // blur screen: every fourth staged image is an exact linear ramp
    // (Laplacian identically 0 — a provable identity the oracle states
    // directly), the rest the textured quadratic whose curvature (16 per
    // interior pixel between wraps) clears the threshold; the oracle
    // replays the Laplacian sum from the pixel formula
    "q_blur_screen" ->
      ("WITH m AS (SELECT doc_id, doc_id % 40 + 8 AS w, doc_id % 23 + 8 AS h " +
        "FROM documents WHERE doc_id < 200), " +
        "g AS (SELECT doc_id, w, h, unnest(generate_series(1, w - 2)) AS x FROM m " +
        "WHERE doc_id % 4 != 0), " +
        "gg AS (SELECT doc_id, w, h, x, unnest(generate_series(1, h - 2)) AS y FROM g), " +
        "dd AS (SELECT doc_id, " +
        "4 * ((x*x*3 + y*y*5 + x*y*7 + doc_id*11) % 256) " +
        "- (((x-1)*(x-1)*3 + y*y*5 + (x-1)*y*7 + doc_id*11) % 256) " +
        "- (((x+1)*(x+1)*3 + y*y*5 + (x+1)*y*7 + doc_id*11) % 256) " +
        "- ((x*x*3 + (y-1)*(y-1)*5 + x*(y-1)*7 + doc_id*11) % 256) " +
        "- ((x*x*3 + (y+1)*(y+1)*5 + x*(y+1)*7 + doc_id*11) % 256) AS d FROM gg), " +
        "e AS (SELECT doc_id, CAST(sum(d * d) AS BIGINT) AS lap FROM dd GROUP BY doc_id) " +
        "SELECT m.doc_id, CAST(coalesce(e.lap, 0) AS BIGINT) AS lap_energy, " +
        "coalesce(e.lap, 0) < 64 * (m.w - 2) * (m.h - 2) AS is_blurry " +
        "FROM m LEFT JOIN e ON m.doc_id = e.doc_id ORDER BY m.doc_id"),
    // audio fingerprint near-dup: the engine REALLY decodes every staged
    // WAV (bases doc_id < 200 + half-loudness planted copies under ids
    // 1000+id) and buckets clips by the 15-bit frame-energy-profile
    // fingerprint; the oracle recomputes every frame energy closed-form
    // from the sample formula (trunc-toward-zero halving — DuckDB's //
    // agrees with Scala Int division on negatives) and replays the
    // keep-first bucket window
    "q_audio_fp" ->
      ("WITH m AS (SELECT doc_id AS mid, " +
        "(doc_id % 200 + 50) * (1 + doc_id % 2) AS n, doc_id * 101 AS t, 1 AS sc " +
        "FROM documents WHERE doc_id < 200 " +
        "UNION ALL SELECT 1000 + doc_id, (doc_id % 200 + 50) * (1 + doc_id % 2), " +
        "doc_id * 101, 2 FROM documents WHERE doc_id < 20), " +
        "e AS (SELECT mid, f, list_sum([abs(((i * i * 13 + i * 37 + t) % 65536) - 32768) // sc " +
        "for i in generate_series((f * n) // 16, ((f + 1) * n) // 16 - 1)]) AS en " +
        "FROM m, generate_series(0, 15) gf(f)), " +
        "fpt AS (SELECT mid, f, en, lead(en) OVER (PARTITION BY mid ORDER BY f) AS en1 FROM e), " +
        "fp AS (SELECT mid, CAST(coalesce(sum(CASE WHEN en1 > en THEN (1 << f) END) " +
        "FILTER (WHERE f < 15), 0) AS BIGINT) AS fp FROM fpt GROUP BY mid) " +
        "SELECT mid AS doc_id, fp, " +
        "CASE WHEN min(mid) OVER (PARTITION BY fp) = mid THEN NULL " +
        "ELSE min(mid) OVER (PARTITION BY fp) END AS dup_of " +
        "FROM fp ORDER BY doc_id"),
    // REAL stride-2 frame sampling over the in-table animated-GIF layout:
    // the oracle keeps every 2nd frame of the closed-form frame function
    // (Multimodal.gifPixel) — a dropped/extra frame, wrong stride phase or
    // decode failure all hash-mismatch
    "q_multimodal_frames" ->
      ("WITH g AS (SELECT doc_id, doc_id % 21 + 6 AS w, doc_id % 13 + 6 AS h, " +
        "doc_id % 4 + 2 AS nf FROM documents WHERE doc_id < 200), " +
        "f AS (SELECT doc_id, w, h, unnest(generate_series(0, nf - 1)) AS frame_no FROM g) " +
        "SELECT doc_id, CAST(frame_no AS INTEGER) AS frame_no, " +
        "CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height, " +
        "CAST(list_sum([(((i % w) * 5 + (i // w) * 11 + frame_no * 17 + doc_id) % 256) * (i + 1) " +
        "for i in generate_series(0, w * h - 1)]) AS BIGINT) AS pixel_sum " +
        "FROM f WHERE frame_no % 2 = 0 ORDER BY doc_id, frame_no"),
    // REAL NN-resize over the in-table PNG layout, 12-px box (the
    // fixture-scan twin q_image_resize pins the 16-px map): every output
    // pixel's source coordinate is integer arithmetic the oracle replays
    "q_multimodal_resize" ->
      ("WITH g AS (SELECT doc_id, doc_id % 40 + 8 AS w, doc_id % 23 + 8 AS h, " +
        "least(doc_id % 40 + 8, 12) AS ow, least(doc_id % 23 + 8, 12) AS oh " +
        "FROM documents WHERE doc_id < 200) " +
        "SELECT doc_id, CAST(ow AS INTEGER) AS out_w, CAST(oh AS INTEGER) AS out_h, " +
        "CAST(list_sum([((((i % ow) * w // ow) * 7 + ((i // ow) * h // oh) * 13 + doc_id) % 256) * (i + 1) " +
        "for i in generate_series(0, ow * oh - 1)]) AS BIGINT) AS pixel_sum " +
        "FROM g ORDER BY doc_id"),
    // video near-dup: per-frame dHash signatures over REAL AVI decodes;
    // the oracle replays every frame hash from the textured pixel formula
    // and brute-forces all equal-length pairs at total Hamming <= 7
    "q_video_dedup" ->
      ("WITH m AS (SELECT doc_id AS mid, doc_id % 19 + 6 AS w, doc_id % 11 + 6 AS h, " +
        "doc_id % 3 + 2 AS nf, doc_id * 11 AS t FROM documents WHERE doc_id < 200 " +
        "UNION ALL SELECT 1000 + doc_id, doc_id % 19 + 6, doc_id % 11 + 6, " +
        "doc_id % 3 + 2, doc_id * 11 + 3 FROM documents WHERE doc_id < 20), " +
        "fr AS (SELECT mid, w, h, nf, t, unnest(generate_series(0, nf - 1)) AS f FROM m), " +
        "g AS (SELECT mid, nf, t, f, (y * 8 + x) AS bi, " +
        "((x * w) // 9) AS s0, (((x + 1) * w) // 9) AS s1, ((y * h) // 8) AS sy " +
        "FROM fr, generate_series(0, 7) gx(x), generate_series(0, 7) gy(y)), " +
        "bits AS (SELECT mid, nf, f, bi, " +
        "CASE WHEN ((s1 * s1 * 3 + sy * sy * 5 + s1 * sy * 7 + f * 13 + t) % 256) > " +
        "((s0 * s0 * 3 + sy * sy * 5 + s0 * sy * 7 + f * 13 + t) % 256) THEN 1 ELSE 0 END AS b " +
        "FROM g), " +
        "pr AS (SELECT a.mid AS ida, c.mid AS idb, " +
        "CAST(sum(CASE WHEN ba.b <> bc.b THEN 1 ELSE 0 END) AS BIGINT) AS hamming " +
        "FROM m a JOIN m c ON a.mid < c.mid AND a.nf = c.nf " +
        "JOIN bits ba ON ba.mid = a.mid " +
        "JOIN bits bc ON bc.mid = c.mid AND bc.f = ba.f AND bc.bi = ba.bi " +
        "GROUP BY 1, 2), " +
        "cl AS (SELECT * FROM pr WHERE hamming <= 7), " +
        "sym AS (SELECT ida AS mid, idb AS nbr, hamming FROM cl " +
        "UNION ALL SELECT idb, ida, hamming FROM cl), " +
        "mh AS (SELECT mid, min(hamming) AS min_hamming FROM sym GROUP BY mid), " +
        "best AS (SELECT s.mid, min(s.nbr) AS dup_of, mh.min_hamming " +
        "FROM sym s JOIN mh ON s.mid = mh.mid AND s.hamming = mh.min_hamming " +
        "GROUP BY s.mid, mh.min_hamming) " +
        "SELECT m.mid AS doc_id, CAST(m.nf AS INTEGER) AS n_frames, " +
        "best.dup_of, best.min_hamming " +
        "FROM m LEFT JOIN best ON m.mid = best.mid ORDER BY doc_id"),
    // header-only JPEG audit: real JDK-encoded JPEGs (gray for even ids,
    // RGB for odd), geometry + SOF facts stated in closed form — the
    // walker never runs the entropy decoder
    "q_jpeg_meta" ->
      ("SELECT doc_id, CAST(doc_id % 40 + 8 AS INTEGER) AS width, " +
        "CAST(doc_id % 23 + 8 AS INTEGER) AS height, " +
        "CAST(8 AS INTEGER) AS sample_precision, " +
        "CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END AS INTEGER) AS n_components, " +
        "FALSE AS progressive, TRUE AS has_jfif " +
        "FROM documents WHERE doc_id < 200 ORDER BY doc_id"),
    // caption-image consistency: the engine really decodes each PNG and
    // really parses each caption; the oracle states both geometries and
    // the verdict in closed form (every 7th caption plants width+1)
    // geometry claims in closed form; the CONTENT claim (mean brightness)
    // replays the staged pixel formula gray(x,y) = (7x + 13y + id) % 256
    // over the full raster and floor-divides — the engine side reads the
    // mean back off the DECODED raster, so a codec or claim-parse defect
    // hash-mismatches
    "q_caption_check" ->
      ("WITH m AS (SELECT doc_id, doc_id % 40 + 8 AS w, doc_id % 23 + 8 AS h " +
        "FROM documents WHERE doc_id < 200), " +
        "px AS (SELECT doc_id, w, h, unnest(generate_series(0, w * h - 1)) AS p FROM m), " +
        "mm AS (SELECT doc_id, CAST(sum(((p % w) * 7 + (p // w) * 13 + doc_id) % 256) " +
        "// (any_value(w) * any_value(h)) AS INTEGER) AS mean_g FROM px GROUP BY doc_id) " +
        "SELECT m.doc_id, " +
        "CAST(m.w AS INTEGER) AS img_w, " +
        "CAST(m.h AS INTEGER) AS img_h, " +
        "mm.mean_g AS img_mean, " +
        "CAST(m.w + CASE WHEN m.doc_id % 7 = 0 THEN 1 ELSE 0 END AS INTEGER) AS cap_w, " +
        "CAST(m.h AS INTEGER) AS cap_h, " +
        "CAST(mm.mean_g + CASE WHEN m.doc_id % 11 = 0 THEN 2 ELSE 0 END AS INTEGER) AS cap_mean, " +
        "m.doc_id % 7 <> 0 AND m.doc_id % 11 <> 0 AS consistent " +
        "FROM m JOIN mm ON m.doc_id = mm.doc_id ORDER BY m.doc_id"),
    // trained caption scorer: the oracle replays feature staging (plant
    // rules + the pixel-formula mean over ids 0..399) AND the whole GD
    // training loop unrolled, then scores the held-out odd half — the
    // learned gate behind q_caption_check's deterministic one
    "q_caption_trained" -> OracleHelpers.captionTrainedOracleSql,
  )
}
