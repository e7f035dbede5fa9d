package graft

import graft.engine.Tables
import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * One `queries` entry per implemented operator from SURVEY.md §2, each with
  * a DuckDB oracle in `oracleSql` (column names aliased identically in both
  * dialects; every query ends in a total ORDER BY for hash determinism).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The minimum end-to-end slice of SURVEY.md §7.3: documents -> tokenize
    * -> sliding windows (window 5 / stride 3, data_ingestion.py:39,190) ->
    * explode to flat snippets with parent attrs + page link. */
  def entry(spark: SparkSession): DataFrame =
    SnippetGen.docSnippets(Tables.documents(spark, "/root/testdata/sf0.001"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- scans / filters / projections (SURVEY §2.2)
    "q_scan_project" -> (Relational.scanProject _),
    "q_filter_eq" -> (Relational.filterEq _),
    "q_filter_conj" -> (Relational.filterConj _),
    "q_filter_notnull_date" -> (Relational.filterNotNullDate _),
    "q_exists_count" -> (Relational.existsCount _),
    "q_filter_isin" -> (Relational.filterIsin _),
    "q_project_rename" -> (Relational.projectRename _),
    "q_first_row" -> (Relational.firstRow _),
    "q_dim_project" -> (Relational.dimProject _),
    // --- joins (SURVEY §2.3)
    "q_join_dim" -> (Relational.joinDim _),
    "q_anti_join" -> (Relational.antiJoin _),
    "q_semi_join" -> (Relational.semiJoin _),
    // --- aggregations (SURVEY §2.4)
    "q_count" -> (Relational.countAll _),
    "q_collect_list" -> (Relational.collectListPerGroup _),
    "q_distinct" -> (Relational.distinctKeys _),
    "q_agg" -> (Relational.aggPricingSummary _),
    // --- generators / snippet pipeline (SURVEY §2.5)
    "q_snippets" -> ((s: SparkSession, d: String) =>
      SnippetGen.docSnippets(Tables.documents(s, d))),
    "q_sentence_snippets" -> (SnippetGen.qSentenceSnippets _),
    // --- scalar functions (SURVEY §2.6)
    "q_page_link" -> (Relational.pageLink _),
    "q_render_info" -> (Relational.renderInfo _),
    "q_date_funcs" -> (Relational.dateFuncs _),
    // --- set ops (SURVEY §2.7)
    "q_union_restore" -> (Relational.unionRestore _),
    "q_setops" -> (Relational.qSetOps _),
    "q_reservoir" -> (Relational.qReservoir _),
    // --- mutations as snapshot transforms (SURVEY §2.8)
    "q_upsert" -> (Mutations.qUpsert _),
    "q_status_update" -> (Mutations.qStatusUpdate _),
    "q_expiry_sweep" -> (Mutations.qExpirySweep _),
    "q_delete_doc" -> (Mutations.qDeleteDoc _),
    "q_delete_category" -> (Mutations.qDeleteCategory _),
    "q_batch_delete" -> (Mutations.qBatchDelete _),
    "q_truncate" -> (Mutations.qTruncate _),
    "q_dim_insert" -> (Mutations.qDimInsert _),
    // --- text analysis extensions (BASELINE.json north star)
    "q_token_count" -> (TextAnalysis.qTokenCount _),
    "q_quality" -> (TextAnalysis.qQuality _),
    "q_langid" -> (TextAnalysis.qLangId _),
    "q_fingerprint" -> (TextAnalysis.qFingerprint _),
    "q_text_stats" -> (TextAnalysis.qTextStats _),
    // --- deduplication extensions
    "q_dedup_exact" -> (Dedup.qDedupExact _),
    "q_dedup_ngram" -> (Dedup.qDedupNgram _),
    "q_dedup_auto" -> (Dedup.qDedupAuto _),  // router picks exact-inverted at gate scale; strategy column pinned
    "q_dedup_minhash" -> (Dedup.qDedupMinhash _),
    "q_dedup_incremental" -> (Dedup.qDedupIncremental _),
    "q_cross_dedup" -> (Dedup.qCrossDedup _),
    "q_dedup_simhash" -> (Dedup.qDedupSimhash _),
    "q_dedup_clusters" -> (Dedup.qDedupClusters _),
    // --- corpus curation extensions
    "q_sample_stratified" -> (Curation.qSampleStratified _),
    "q_pack_sequences" -> (Curation.qPackSequences _),
    "q_curate" -> (Curation.qCurate _),
    "q_split" -> (Curation.qSplit _),
    "q_chunk" -> (Curation.qChunk _),
    "q_mixture" -> (Curation.qMixture _),
    "q_curriculum" -> (Curation.qCurriculum _),
    // --- text search / relevance extensions
    "q_tfidf" -> (TextSearch.qTfidf _),
    "q_bm25" -> (TextSearch.qBm25 _),
    "q_contamination" -> (TextSearch.qContamination _),
    "q_phrase_search" -> (TextSearch.qPhraseSearch _), // positional-postings exact phrase match
    "q_repetition" -> (TextAnalysis.qRepetition _),
    "q_perplexity" -> (TextAnalysis.qPerplexity _),
    "q_importance" -> (TextAnalysis.qImportance _),
    "q_dataset_card" -> (TextAnalysis.qDatasetCard _),
    "q_confusion" -> (TextAnalysis.qConfusion _),
    "q_nb_classify" -> (TextAnalysis.qNbClassify _),
    "q_logistic" -> (TextAnalysis.qLogistic _), // GD-trained classifier; oracle replays the training loop
    "q_calibration" -> (TextAnalysis.qCalibration _),
    "q_mix_plan" -> (Curation.qMixPlan _),
    "q_bloom_decontam" -> (TextSearch.qBloomDecontam _),
    "q_export_manifest" -> (Curation.qExportManifest _),
    "q_approx_percentiles" -> (Advanced.qApproxPercentiles _), // GK sketch gated via rank-tolerance booleans vs exact
    "q_heavy_hitters" -> (TextSearch.qHeavyHitters _), // CMS gated via tolerance booleans vs exact top-k
    "q_kanon" -> (Curation.qKanon _),
    "q_pagerank" -> (Graph.qPagerank _), // domain-centrality power iteration
    "q_frontier" -> (Graph.qFrontier _), // hop-limited BFS crawl-frontier expansion

    "q_novelty" -> (TextAnalysis.qNovelty _),
    "q_pii_mask" -> (TextAnalysis.qPiiMask _),
    "q_blocklist" -> (TextAnalysis.qBlocklist _), // Aho-Corasick multi-pattern banned-phrase scan
    "q_cdc_diff" -> (Mutations.qCdcDiff _),
    "q_percentiles" -> (Advanced.qPercentiles _),
    // --- similarity search extensions
    "q_topk" -> (Similarity.qTopK _),
    "q_embed_dup" -> (Similarity.qEmbedDup _),
    "q_centroids" -> (Similarity.qCentroids _),
    "q_hard_negatives" -> (Similarity.qHardNegatives _),
    "q_sem_dedup" -> (Similarity.qSemDedup _),
    "q_sem_dedup_hier" -> (Similarity.qSemDedupHier _), // production two-level path, tolerance-gated
    "q_ann_recall" -> (Similarity.qAnnRecall _), // LSH+IVF recall@10 vs brute force, tolerance-gated
    "q_pq_search" -> (Similarity.qPqSearch _), // PQ ADC + rerank recall@10, tolerance-gated
    "q_ann_incremental" -> (Similarity.qAnnIncremental _), // persisted-IVF probe recall, train-once
    "q_embed_outliers" -> (Similarity.qEmbedOutliers _), // centroid-distance embedding QC
    "q_coreset" -> (Similarity.qCoreset _), // greedy k-center eval-set selection
    "q_weighted_sample" -> (Curation.qWeightedSample _), // quality-proportional ES sampling
    // --- event analytics extensions
    "q_event_window" -> (EventAnalytics.qEventWindow _),
    "q_sessionize" -> (EventAnalytics.qSessionize _),
    "q_top_users" -> (EventAnalytics.qTopUsers _),
    "q_resample" -> (EventAnalytics.qResample _),
    "q_funnel" -> (EventAnalytics.qFunnel _),
    "q_retention" -> (EventAnalytics.qRetention _),
    "q_anomaly" -> (EventAnalytics.qAnomaly _),
    "q_transitions" -> (EventAnalytics.qTransitions _),
    // --- multimodal plumbing extension (in-table binary payload layout)
    "q_multimodal" -> (Multimodal.qMultimodalDecode _), // real in-table PNG decode + patch grid
    // --- command dispatch (SURVEY §2.9)
    "q_dispatch" -> (graft.streaming.CommandDispatch.qDispatch _),
    "q_dedup_gate" -> (graft.streaming.StreamingJobs.qDedupGate _),
    "q_stream_window" -> (graft.streaming.StreamingJobs.qStreamWindow _), // event-time watermark + late-data gate
    "q_stream_session" -> (graft.streaming.StreamingJobs.qStreamSession _), // session windows merging across micro-batches
    "q_stream_dedup" -> (graft.streaming.StreamingJobs.qStreamDedup _), // bounded-state dedup: drop inside the window, re-admit after expiry
    "q_stream_join" -> (graft.streaming.StreamingJobs.qStreamJoin _), // watermarked stream-stream interval join
    "q_cdc_chunks" -> (Dedup.qCdcChunks _), // content-defined chunking + chunk-level dedup signal
    "q_compress_ratio" -> (TextAnalysis.qCompressRatio _), // deflate quality screen, tolerance-gated
    // --- nested document model + ingest pipeline (SURVEY §1.1, §3.1)
    "q_binary_ingest" -> (graft.sources.BinaryIngest.qBinaryIngest _),
    "q_pdf_ingest" -> (graft.sources.BinaryIngest.qPdfIngest _), // real Flate-compressed PDF round trip
    "q_pdf_cid" -> (graft.sources.BinaryIngest.qPdfCid _), // composite-font (CID/ToUnicode) round trip
    "q_pdf_encrypted" -> (graft.sources.BinaryIngest.qPdfEncrypted _), // RC4-128 standard-security decryption round trip
    "q_pdf_aes" -> (graft.sources.BinaryIngest.qPdfAes _), // AESV2 (V4) decryption round trip
    "q_pdf_aes256" -> (graft.sources.BinaryIngest.qPdfAes256 _), // AES-256 (V5/R6) decryption round trip
    "q_pdf_objstm" -> (graft.sources.BinaryIngest.qPdfObjStm _), // xref-stream + ObjStm layout, stale-generation rewrite
    "q_ocr_ingest" -> (graft.sources.OcrEngine.qOcrIngest _), // scanned (image-only) PDFs through REAL template-matching OCR
    "q_image_ingest" -> (Multimodal.qImageIngest _), // real PNG decode (ImageIO) round trip
    "q_audio_ingest" -> (Multimodal.qAudioIngest _), // real WAV decode (AudioSystem) round trip
    "q_audio_resample" -> (Multimodal.qAudioResample _), // integer-exact linear resample to 16 kHz
    "q_audio_vad" -> (Multimodal.qAudioVad _), // energy VAD -> maximal active segments over real decode
    "q_audio_clip" -> (Multimodal.qAudioClip _), // at-rail clipping ratio over real decode (audio QC)
    "q_png_meta" -> (Multimodal.qPngMeta _), // tEXt provenance chunks via an independent chunk walk
    "q_bitext" -> (graft.operators.Bitext.qBitext _), // Gale-Church length-based sentence alignment
    "q_license" -> (graft.sources.CodeIngest.qLicense _), // SPDX tag / header-phrase license screen
    "q_code_comments" -> (graft.sources.CodeIngest.qCodeComments _), // quote-aware comment scan + docstring
    "q_secrets" -> (graft.sources.CodeIngest.qSecrets _), // credential rules + integer high-entropy screen
    "q_chat_turns" -> (graft.sources.ChatIngest.qChatTurns _), // ChatML-style turn parse + assistant-only loss mask
    "q_kn_score" -> (TextSearch.qKnScore _), // KenLM-style per-doc perplexity under the KN bigram model
    "q_blur_screen" -> (Multimodal.qBlurScreen _), // Laplacian-energy image QC over real decode
    "q_json_validate" -> (graft.sources.JsonContract.qJsonValidate _), // data-contract verdicts per JSONL row
    "q_hnsw_recall" -> (graft.operators.Hnsw.qHnswRecall _), // sharded HNSW graph ANN vs brute-force ground truth
    "q_image_resize" -> (Multimodal.qImageResize _), // real decode + NN resample round trip
    "q_gif_frames" -> (Multimodal.qGifFrames _), // real multi-frame decode (animated GIF)
    "q_video_frames" -> (Multimodal.qVideoFrames _), // real RIFF/AVI container walk + DIB frame decode
    "q_video_shots" -> (Multimodal.qVideoShots _), // MAD shot-boundary detection over decoded rasters
    "q_image_dhash" -> (Multimodal.qImageDhash _), // perceptual-hash (dHash) image near-dup, banded Hamming LSH
    "q_audio_fp" -> (Multimodal.qAudioFp _), // energy-profile audio fingerprint near-dup (loudness-invariant)
    "q_dhash_incremental" -> (Multimodal.qDhashIncremental _), // persisted dHash index + probe batch (streaming image dedup)
    "q_html_ingest" -> (graft.sources.HtmlIngest.qHtmlIngest _), // HTML boilerplate-strip round trip
    "q_boilerplate" -> (graft.sources.Boilerplate.qBoilerplate _), // block-level link-density main-content extraction
    "q_markdown" -> (graft.sources.MarkdownIngest.qMarkdown _), // markdown -> prose extraction (fences/markers/links)
    "q_url_filter" -> (UrlOps.qUrlFilter _), // URL canonicalize + registrable domain + blocklist
    "q_warc_ingest" -> (graft.sources.WarcIngest.qWarcIngest _), // WARC record walk -> HTTP -> HTML -> text
    "q_jsonl_ingest" -> (graft.sources.JsonlGz.qJsonlIngest _), // gzipped-JSONL shards via the native json source
    "q_zip_ingest" -> (graft.sources.ZipIngest.qZipIngest _), // ZIP archive shards, per-partition unpack
    "q_orc_ingest" -> (graft.sources.OrcIngest.qOrcIngest _), // native vectorized ORC round trip
    "q_csv_ingest" -> (graft.sources.CsvIngest.qCsvIngest _), // hand-rolled RFC 4180 shards via the native csv source
    "q_avro_ingest" -> (graft.sources.AvroIngest.qAvroIngest _), // hand-rolled Avro OCF shards via the native avro source
    "q_xml_ingest" -> (graft.sources.WikiIngest.qXmlIngest _), // mediawiki dump via the native xml source (rowTag=page)
    "q_wikitext" -> (graft.sources.WikiIngest.qWikitext _), // wikitext -> prose over the staged dump pages
    "q_latex" -> (graft.sources.LatexIngest.qLatex _), // LaTeX -> prose (preamble/math/cite/float machinery out)
    "q_tar_ingest" -> (graft.sources.TarIngest.qTarIngest _), // hand-rolled POSIX ustar .tar.gz shards
    "q_wds_ingest" -> (graft.sources.WebDataset.qWdsIngest _), // WebDataset tar shards: text+image paired by key
    "q_robots" -> (CrawlPolicy.qRobots _), // RFC 9309 robots.txt verdicts per URL
    "q_crawl_schedule" -> (CrawlPolicy.qCrawlSchedule _), // per-domain politeness fetch queue
    "q_charset" -> (graft.sources.CharsetSniff.qCharset _), // BOM/UTF-8-validate/Latin-1 encoding detection
    "q_links" -> (graft.sources.HtmlIngest.qLinks _), // href extraction + RFC 3986 reference resolution
    "q_span_corrupt" -> (Curation.qSpanCorrupt _), // T5-style span corruption with sentinel runs
    "q_ingest_flatten" -> (Ingest.qIngestFlatten _),
    "q_nested_project" -> (Ingest.qNestedProject _),
    // --- advanced relational ops (SURVEY §2 "absent" rows)
    "q_outer_join" -> (Advanced.qOuterJoin _),
    "q_rollup" -> (Advanced.qRollup _),
    "q_distinct_count" -> (Advanced.qDistinctCount _),
    "q_approx_distinct" -> (Advanced.qApproxDistinct _),  // sketch gated via within-5pct booleans vs exact
    "q_running_sum" -> (Advanced.qRunningSum _),
    "q_asof_join" -> (Advanced.qAsofJoin _),
    "q_range_join" -> (Advanced.qRangeJoin _),
    "q_shuffle_join" -> (Advanced.qShuffleJoin _),
    "q_salted_join" -> (Advanced.qSaltedJoin _),
    "q_session_window" -> (Advanced.qSessionWindow _),
    "q_variance" -> (Advanced.qVariance _),
    "q_regex_extract" -> (Advanced.qRegexExtract _),
    "q_sql_api" -> (Advanced.qSqlApi _),
    "q_cube" -> (Advanced.qCube _),
    "q_window_funcs" -> (Advanced.qWindowFuncs _),
    "q_pivot" -> (Advanced.qPivot _),
    "q_unpivot" -> (Advanced.qUnpivot _),
    "q_fuzzy_match" -> (Advanced.qFuzzyMatch _),
    "q_grouping_sets" -> (Advanced.qGroupingSets _),
    "q_corr" -> (Advanced.qCorr _),
    "q_histogram" -> (Advanced.qHistogram _),
    "q_json" -> (Advanced.qJson _),
    "q_multimodal_frames" -> (Multimodal.qMultimodalFrames _), // real in-table GIF, stride-2 frame sampling
    "q_multimodal_resize" -> (Multimodal.qMultimodalResize _), // real in-table PNG, NN resize 12-px box
    // --- text normalization + heuristic filtering
    "q_normalize" -> (TextNormalize.qNormalize _),
    "q_c4_filters" -> (TextNormalize.qC4Filters _),
    // --- corpus statistics / tokenizer induction
    "q_stopword_df" -> (TextSearch.qStopwordDf _),
    "q_bpe_pairs" -> (TextSearch.qBpePairs _),
    "q_bpe_train" -> (TextSearch.qBpeTrain _),
    "q_unigram_lm" -> (TextSearch.qUnigramLm _), // SentencePiece-family hard-EM tokenizer
    "q_wordpiece" -> (TextSearch.qWordpiece _), // WordPiece greedy longest-match encode
    "q_sitemap" -> (graft.sources.SitemapIngest.qSitemap _), // sitemapindex -> gzipped urlset shards walk
    "q_bpe_encode" -> (TextSearch.qBpeEncode _),
    "q_bigram_lm" -> (TextSearch.qBigramLm _),
    "q_kneser_ney" -> (TextSearch.qKneserNey _), // interpolated-KN bigram LM (the KenLM filter shape)
    "q_budget_select" -> (Curation.qBudgetSelect _),
    "q_split_safe" -> (Curation.qSplitSafe _),
    "q_negatives" -> (Curation.qNegatives _),
    "q_quota_sample" -> (Curation.qQuotaSample _),
    "q_vocab_coverage" -> (TextSearch.qVocabCoverage _),
    // --- winnowing fingerprints + canonical-selection dedup
    "q_winnow" -> (Dedup.qWinnow _),
    "q_dedup_keepbest" -> (Dedup.qDedupKeepBest _),
    // --- recency-weighted event scoring
    "q_decay" -> (EventAnalytics.qDecay _),
    // --- embedding quantization + z-order layout kernel
    "q_quantize" -> (Similarity.qQuantize _),
    "q_pq_encode" -> (Similarity.qPqEncode _),
    "q_zorder" -> (Advanced.qZorder _),
    // --- containment dedup + exact repeated-span scan + skew diagnostics
    "q_containment" -> (Dedup.qContainment _),
    "q_repeated_spans" -> (Dedup.qRepeatedSpans _),
    "q_span_dedup" -> (Dedup.qSpanDedup _),
    "q_skew_stats" -> (Advanced.qSkewStats _),
    // --- storage-layer schema evolution (merged-footer parquet read)
    "q_schema_evolve" -> (graft.sources.SchemaEvolve.qSchemaEvolve _),
    // --- header-only JPEG audit (SOF marker walk, no decode)
    "q_jpeg_meta" -> (Multimodal.qJpegMeta _),
    // --- anchor-text aggregation per link target (web-graph signal)
    "q_anchor_text" -> (graft.sources.HtmlIngest.qAnchorText _),
    // --- video near-dup via per-frame dHash signatures (banded LSH)
    "q_video_dedup" -> (Multimodal.qVideoDedup _),
    // --- preference-pair construction (DPO/RLHF prep over the scored pool)
    "q_dpo_pairs" -> (Curation.qDpoPairs _),
    // --- ROUGE n-gram overlap (generation-eval metric, clipped counts)
    "q_rouge" -> (TextAnalysis.qRouge _),
    // --- HITS hubs & authorities (the second link-centrality signal)
    "q_hits" -> (Graph.qHits _),
    // --- matryoshka truncated-dimension serving recall
    "q_mrl_recall" -> (Similarity.qMrlRecall _),
    // --- web-table extraction (structured-data harvest from HTML)
    "q_html_tables" -> (graft.sources.HtmlIngest.qHtmlTables _),
    // --- caption-image consistency screen (pair-level multimodal QC)
    "q_caption_check" -> (Multimodal.qCaptionCheck _),
    // --- Cohen's kappa (chance-corrected classifier/annotator agreement)
    "q_kappa" -> (TextAnalysis.qKappa _),
  )

  /** DuckDB replica of the full MinHash-LSH pipeline, GENERATED from the
    * engine's own [[Dedup.hashParams]]: shingle -> polyHash code (the
    * list_reduce form already oracle-proven by q_fingerprint) -> K affine
    * mins -> band keys -> same-band candidate pairs -> exact-Jaccard
    * verification. Every constant (LCG-derived a_i/b_i, band count, prime)
    * comes from the Scala source of truth, so the oracle can never drift
    * from the engine. */
  private def minhashOracleFor(pairCondition: String): String = {
    val sigTerms = Dedup.hashParams.map { case (a, b) =>
      s"list_min(list_transform(cs, x -> ($a*x + $b) % ${Dedup.Prime}))"
    }.mkString(", ")
    val rpb = Dedup.RowsPerBand
    "WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words FROM documents), " +
      "sh AS (SELECT doc_id, list_distinct([words[i] || ' ' || words[i+1] || ' ' || words[i+2] " +
      "for i in generate_series(1, len(words) - 2)]) AS s FROM w WHERE len(words) >= 3), " +
      "codes AS (SELECT doc_id, s, list_transform(s, sg -> list_reduce(" +
      "list_prepend(CAST(0 AS BIGINT), list_transform(generate_series(1, length(sg)), " +
      "i -> CAST(ascii(sg[i]) AS BIGINT))), (a, c) -> (a * 31 + c) % 1000000007)) AS cs FROM sh), " +
      s"sigs AS (SELECT doc_id, s, [$sigTerms] AS sig FROM codes), " +
      s"bands AS (SELECT doc_id, unnest(generate_series(0, ${Dedup.Bands - 1})) AS band, sig FROM sigs), " +
      s"keys AS (SELECT doc_id, band, array_to_string(sig[band*$rpb+1 : band*$rpb+$rpb], ',') AS band_key FROM bands), " +
      "cands AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b FROM keys a " +
      s"JOIN keys b ON a.band = b.band AND a.band_key = b.band_key AND $pairCondition), " +
      "verified AS (SELECT doc_a, doc_b, CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE) " +
      "/ (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))) AS j FROM cands " +
      "JOIN codes sa ON cands.doc_a = sa.doc_id JOIN codes sb ON cands.doc_b = sb.doc_id) " +
      "SELECT doc_a, doc_b, round(j, 6) AS jaccard FROM verified WHERE j >= 0.5 ORDER BY doc_a, doc_b"
  }

  private lazy val minhashOracleSql: String = minhashOracleFor("a.doc_id < b.doc_id")

  /** Incremental probe: incoming = odd ids, persisted index = even ids. */
  private lazy val minhashIncrementalOracleSql: String =
    minhashOracleFor("a.doc_id % 2 = 1 AND b.doc_id % 2 = 0")

  /** DuckDB replica of the banded SimHash pipeline, generated from
    * [[Dedup.SimhashBands]]/[[Dedup.SimhashBandBits]]/[[Dedup.SimhashBucketCap]].
    * The 64-bit wrap-around token hash runs in HUGEINT mod 2^64 (DuckDB
    * BIGINT arithmetic traps overflow); fingerprints stay as 64-element
    * bit lists, so band keys and Hamming distances need no signed packing. */
  private lazy val simhashOracleSql: String = {
    val nb = Dedup.SimhashBands
    val bb = Dedup.SimhashBandBits
    val cap = Dedup.SimhashBucketCap
    val m64 = "CAST('18446744073709551616' AS HUGEINT)" // 2^64
    val m32 = "CAST(4294967296 AS HUGEINT)"             // 2^32
    // (x * c) mod 2^64 via 32-bit halves of c: the direct 64x64 product can
    // overflow HUGEINT (2^127), the split partials cannot (max 2^96)
    def mulmod(c: BigInt): String = {
      val lo = c & 0xFFFFFFFFL
      val hi = c >> 32
      s"((x * $lo) % $m64 + (((x * $hi) % $m32) * $m32)) % $m64"
    }
    val fmixC1 = BigInt("ff51afd7ed558ccd", 16)
    val fmixC2 = BigInt("c4ceb9fe1a85ec53", 16)
    "WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words FROM documents), " +
      "hs0 AS (SELECT doc_id, list_transform(words, t -> list_reduce(" +
      "list_prepend(CAST(1125899906842597 AS HUGEINT), " +
      "list_transform(generate_series(1, length(t)), i -> CAST(ascii(t[i]) AS HUGEINT))), " +
      s"(h, c) -> xor((h * 31) % $m64, c))) AS th FROM w), " +
      // murmur fmix64 per token hash, one avalanche step per stage so the
      // lambda variable (cheap) is re-referenced, never a subexpression
      "hs1 AS (SELECT doc_id, list_transform(th, x -> xor(x, x >> 33)) AS th FROM hs0), " +
      s"hs2 AS (SELECT doc_id, list_transform(th, x -> ${mulmod(fmixC1)}) AS th FROM hs1), " +
      "hs3 AS (SELECT doc_id, list_transform(th, x -> xor(x, x >> 33)) AS th FROM hs2), " +
      s"hs4 AS (SELECT doc_id, list_transform(th, x -> ${mulmod(fmixC2)}) AS th FROM hs3), " +
      "hs AS (SELECT doc_id, list_transform(th, x -> xor(x, x >> 33)) AS th FROM hs4), " +
      "votes AS (SELECT doc_id, list_transform(generate_series(0, 63), j -> " +
      "CASE WHEN list_sum(list_transform(th, h -> " +
      "CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END)) > 0 THEN 1 ELSE 0 END) AS bits FROM hs), " +
      s"keys AS (SELECT doc_id, band, list_sum(list_transform(generate_series(0, ${bb - 1}), " +
      s"j -> bits[band*$bb + j + 1] * (1 << j))) AS band_key " +
      s"FROM (SELECT doc_id, bits, unnest(generate_series(0, ${nb - 1})) AS band FROM votes)), " +
      "occ AS (SELECT band, band_key, count(*) AS n FROM keys GROUP BY 1, 2), " +
      "small AS (SELECT k.doc_id, k.band, k.band_key FROM keys k " +
      s"JOIN occ ON k.band = occ.band AND k.band_key = occ.band_key WHERE occ.n <= $cap), " +
      "cands AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b FROM small a " +
      "JOIN small b ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id), " +
      "ham AS (SELECT doc_a, doc_b, CAST(len(list_filter(generate_series(1, 64), " +
      "i -> va.bits[i] != vb.bits[i])) AS INTEGER) AS hamming FROM cands " +
      "JOIN votes va ON cands.doc_a = va.doc_id JOIN votes vb ON cands.doc_b = vb.doc_id) " +
      "SELECT doc_a, doc_b, hamming FROM ham WHERE hamming <= 4 ORDER BY doc_a, doc_b"
  }

  /** Shared DuckDB trainer chain for the BPE oracles: `nMerges`
    * iterations unrolled as CTEs (segmentation s_i -> weighted pair
    * counts p_i -> top merge m_i -> rewritten segmentation s_{i+1}).
    * Every s_i/m_i is MATERIALIZED: each level is referenced twice (the
    * pair count and the next rewrite), so inlined CTEs would re-evaluate
    * the whole chain exponentially (measured: >120 s inlined, 0.1 s
    * materialized at sf0.01). ONE generator feeds both q_bpe_train and
    * q_bpe_encode so the two oracles' trainers can never drift. */
  private def bpeTrainerCtes(nMerges: Int): String = {
    val sb = new StringBuilder
    sb.append("WITH v0 AS (SELECT w, count(*) AS freq FROM " +
      "(SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w FROM documents) " +
      "WHERE length(w) > 0 GROUP BY w), ")
    sb.append("s1 AS MATERIALIZED (SELECT ' ' || regexp_replace(w, '(.)', '\\1 ', 'g') AS seg, freq FROM v0), ")
    for (i <- 1 to nMerges) {
      sb.append(s"p$i AS (SELECT z.l AS l, z.r AS r, CAST(sum(freq) AS BIGINT) AS n FROM " +
        "(SELECT freq, unnest([struct_pack(l := parts[j], r := parts[j+1]) " +
        "for j in generate_series(1, len(parts) - 1)]) AS z FROM " +
        s"(SELECT freq, string_split(trim(seg), ' ') AS parts FROM s$i) WHERE len(parts) >= 2) GROUP BY 1, 2), ")
      sb.append(s"m$i AS MATERIALIZED (SELECT $i AS step, l, r, n FROM p$i ORDER BY n DESC, l, r LIMIT 1), ")
      if (i < nMerges)
        sb.append(s"s${i + 1} AS MATERIALIZED (SELECT " +
          s"coalesce(replace(seg, (SELECT ' '||l||' '||r||' ' FROM m$i), " +
          s"(SELECT ' '||l||r||' ' FROM m$i)), seg) AS seg, freq FROM s$i), ")
    }
    sb.toString
  }

  /** DuckDB replica of the ENTIRE logistic-regression training loop
    * (TextAnalysis.qLogistic), generated from the same constants:
    * hashed-bucket features, the rational surrogate sigmoid (only
    * IEEE-pinned ops — libm exp() does not round-trip engines),
    * DECIMAL(28,12) gradient sums, 6dp half-up weight updates, unrolled
    * one CTE-triple per iteration (MATERIALIZED — each level is read by
    * the next two). The q_pagerank/q_bpe_train pattern applied to a
    * trained model: the oracle cannot drift from the Scala constants. */
  private lazy val logisticOracleSql: String = {
    import graft.operators.TextAnalysis.{LogitBuckets => B, LogitIters => I, LogitLr => LR}
    def f6(e: String): String = s"floor(($e) * 1000000.0 + 0.5) / 1000000.0"
    val xs = (0 until B).map(j => s"x$j").mkString(", ")
    val sb = new StringBuilder("WITH ")
    sb.append("lt0 AS (SELECT doc_id, " +
      "unnest(string_split_regex(trim(text), '\\s+')) AS tok FROM documents), ")
    sb.append("ltj AS (SELECT doc_id, " +
      "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      "list_transform(generate_series(1, length(tok)), i -> CAST(ascii(tok[i]) AS BIGINT))), " +
      s"(a, c) -> (a * 31 + c) % 1000000007) % $B AS j, " +
      "CASE WHEN tok IN (" +
      graft.operators.Stopwords.en.map(w => s"'$w'").mkString(",") +
      ") THEN 1 ELSE 0 END AS st FROM lt0), ")
    val xcols = (0 until B).map(j =>
      f6(s"CAST(sum(CASE WHEN j = $j THEN 1 ELSE 0 END) AS DOUBLE) / count(*)") + s" AS x$j")
      .mkString(", ")
    sb.append("ltf AS MATERIALIZED (SELECT doc_id, " +
      "CASE WHEN 15 * sum(st) >= count(*) THEN 1 ELSE 0 END AS y, " +
      s"$xcols FROM ltj GROUP BY doc_id), ")
    // standardization: decimal moment sums -> 6dp mean/sd -> centered/scaled
    sb.append("ltm AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n, " +
      (0 until B).map(j =>
        s"sum(CAST(x$j AS DECIMAL(18,6))) AS s$j, " +
        s"sum(CAST(x$j * x$j AS DECIMAL(28,12))) AS q$j").mkString(", ") +
      " FROM ltf), ")
    sb.append("ltmm AS (SELECT n, " +
      (0 until B).map(j =>
        f6(s"CAST(s$j AS DOUBLE) / n") + s" AS m$j, " +
        f6(s"CAST(q$j AS DOUBLE) / n") + s" AS v$j").mkString(", ") +
      " FROM ltm), ")
    sb.append("ltsd AS (SELECT n, " +
      (0 until B).map(j => s"m$j, greatest(" +
        f6(s"sqrt(greatest(0.0, v$j - m$j * m$j))") + s", 0.000001) AS d$j").mkString(", ") +
      " FROM ltmm), ")
    sb.append("ltsf AS MATERIALIZED (SELECT doc_id, y, " +
      (0 until B).map(j => f6(s"(x$j - m$j) / d$j") + s" AS x$j").mkString(", ") +
      " FROM ltf, ltsd), ")
    sb.append("ltn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM ltsf), ")
    sb.append("ltw0 AS (SELECT " +
      (0 until B).map(j => s"0.0 AS w$j").mkString(", ") + ", 0.0 AS wb), ")
    for (i <- 1 to I) {
      val prev = s"ltw${i - 1}"
      val z = f6((0 until B).map(j => s"x$j * $prev.w$j").mkString(" + ") + s" + $prev.wb")
      sb.append(s"lte$i AS (SELECT y, $xs, " +
        f6("0.5 + z / (2.0 * (1.0 + abs(z)))") + " - y AS err FROM " +
        s"(SELECT y, $xs, $z AS z FROM ltsf, $prev)), ")
      sb.append(s"ltg$i AS MATERIALIZED (SELECT " +
        (0 until B).map(j => s"sum(CAST(err * x$j AS DECIMAL(28,12))) AS g$j").mkString(", ") +
        s", sum(CAST(err AS DECIMAL(28,12))) AS gb FROM lte$i), ")
      sb.append(s"ltw$i AS (SELECT " +
        (0 until B).map(j =>
          f6(s"$prev.w$j - $LR * CAST(ltg$i.g$j AS DOUBLE) / ltn.n") + s" AS w$j")
          .mkString(", ") +
        ", " + f6(s"$prev.wb - $LR * CAST(ltg$i.gb AS DOUBLE) / ltn.n") + " AS wb " +
        s"FROM $prev, ltg$i, ltn), ")
    }
    val zf = f6((0 until B).map(j => s"x$j * ltw$I.w$j").mkString(" + ") + s" + ltw$I.wb")
    sb.toString.stripSuffix(", ") + " " +
      "SELECT doc_id, y, score, score >= 0.5 AS pred, (score >= 0.5) = (y = 1) AS hit " +
      "FROM (SELECT doc_id, y, " + f6("0.5 + z / (2.0 * (1.0 + abs(z)))") + " AS score " +
      s"FROM (SELECT doc_id, y, $zf AS z FROM ltsf, ltw$I)) ORDER BY doc_id"
  }

  /** DuckDB replica of the unigram-LM tokenizer (TextSearch.qUnigramLm),
    * generated from the same constants: seed substring counts, top-K +
    * alphabet vocabulary, then per hard-EM round a RECURSIVE-CTE
    * enumeration of every segmentation of every distinct word — scores
    * as left-to-right double products (bit-identical to the engine DP's
    * accumulation), ties on the larger boundary bitmask — followed by
    * the usage recount. The oracle replays TRAINING + SEGMENTATION in
    * full; it shares no code with the engine's Viterbi. */
  /** Shared seed-vocab CTE chain (corpus word table + top-K multi-char
    * substrings + all single chars) — the common prefix of the unigram
    * and WordPiece oracles, mirroring [[graft.operators.TextSearch
    * .uniSeedVocab]] exactly. */
  private lazy val uniSeedCtes: String = {
    import graft.operators.TextSearch.{UniMaxPieceLen => L, UniVocabK => K, UniMaxWordLen => W}
    "uw AS MATERIALIZED (SELECT word, count(*) AS freq FROM " +
      "(SELECT unnest(string_split_regex(trim(text), '\\s+')) AS word FROM documents) " +
      // NOT contains '|': mirrors uniWordFreq's separator exclusion (the
      // segmentation path serializes '|'-joined on both sides)
      s"WHERE length(word) > 0 AND length(word) <= $W " +
      "AND NOT contains(word, '|') GROUP BY word), " +
      "us1 AS (SELECT word, freq, unnest(generate_series(1, length(word))) AS s FROM uw), " +
      s"us2 AS (SELECT word, freq, s, unnest(generate_series(1, " +
      s"least($L, length(word) - s + 1))) AS l FROM us1), " +
      "usub AS (SELECT substr(word, s, l) AS piece, sum(freq) AS c FROM us2 GROUP BY 1), " +
      s"uv0 AS MATERIALIZED (SELECT piece, c FROM " +
      s"(SELECT piece, c FROM usub WHERE length(piece) > 1 ORDER BY c DESC, piece LIMIT $K) " +
      "UNION ALL SELECT piece, c FROM usub WHERE length(piece) = 1), "
  }

  /** DuckDB replica of WordPiece greedy encoding: the longest-match
    * step function is precomputed per (word, position) with a window
    * argmax over the matching vocab pieces, then a recursive CTE just
    * FOLLOWS the chain — no window inside the recursion, no engine
    * code. '##' continuation prefixes render in the walk. */
  private lazy val wordpieceOracleSql: String =
    "WITH RECURSIVE " + uniSeedCtes +
      "vp AS MATERIALIZED (SELECT DISTINCT piece FROM uv0), " +
      "poss AS (SELECT word, unnest(generate_series(1, length(word))) AS pos FROM uw), " +
      "cand AS (SELECT p.word, p.pos, v.piece FROM poss p JOIN vp v " +
      "ON length(v.piece) <= length(p.word) - p.pos + 1 " +
      "AND substr(p.word, p.pos, length(v.piece)) = v.piece), " +
      "step AS MATERIALIZED (SELECT word, pos, piece FROM " +
      "(SELECT word, pos, piece, row_number() OVER " +
      "(PARTITION BY word, pos ORDER BY length(piece) DESC) AS rn FROM cand) " +
      "WHERE rn = 1), " +
      "walk AS (SELECT word, freq, 1 AS pos, '' AS path, 0 AS np FROM uw " +
      "UNION ALL SELECT g.word, g.freq, g.pos + length(s.piece), " +
      "g.path || CASE WHEN g.pos = 1 THEN s.piece ELSE '|##' || s.piece END, " +
      "g.np + 1 FROM walk g JOIN step s ON s.word = g.word AND s.pos = g.pos " +
      "WHERE g.pos <= length(g.word)) " +
      "SELECT word, freq, path AS pieces, CAST(np AS BIGINT) AS n_pieces " +
      "FROM walk WHERE pos = length(word) + 1 ORDER BY word"

  private lazy val unigramOracleSql: String = {
    import graft.operators.TextSearch.{UniMaxPieceLen => L, UniVocabK => K, UniMaxWordLen => W}
    def recur(segName: String, probName: String): String =
      s"$segName AS (" +
        "SELECT word, freq, 0 AS pos, CAST(1.0 AS DOUBLE) AS score, " +
        "CAST(0 AS BIGINT) AS mask, '' AS path FROM uw " +
        "UNION ALL " +
        "SELECT g.word, g.freq, g.pos + length(v.piece), g.score * v.p, " +
        "g.mask + CASE WHEN g.pos = 0 THEN CAST(0 AS BIGINT) " +
        "ELSE (CAST(1 AS BIGINT) << g.pos) END, " +
        "CASE WHEN g.pos = 0 THEN v.piece ELSE g.path || '|' || v.piece END " +
        s"FROM $segName g JOIN $probName v " +
        "ON substr(g.word, g.pos + 1, length(v.piece)) = v.piece " +
        "WHERE g.pos < length(g.word) AND length(v.piece) <= length(g.word) - g.pos), "
    def best(bestName: String, segName: String): String =
      s"$bestName AS MATERIALIZED (SELECT word, freq, path, score, " +
        "row_number() OVER (PARTITION BY word ORDER BY score DESC, mask DESC) AS rn " +
        s"FROM $segName WHERE pos = length(word)), "
    "WITH RECURSIVE " + uniSeedCtes +
      "ut0 AS (SELECT CAST(sum(c) AS DOUBLE) AS t FROM uv0), " +
      "up0 AS MATERIALIZED (SELECT piece, CAST(c AS DOUBLE) / t AS p FROM uv0, ut0), " +
      recur("useg0", "up0") +
      best("ubest0", "useg0") +
      "uuse0 AS (SELECT unnest(string_split(path, '|')) AS piece, freq " +
      "FROM ubest0 WHERE rn = 1), " +
      "uv1 AS MATERIALIZED (SELECT piece, sum(freq) AS c FROM uuse0 GROUP BY piece), " +
      "ut1 AS (SELECT CAST(sum(c) AS DOUBLE) AS t FROM uv1), " +
      "up1 AS MATERIALIZED (SELECT piece, CAST(c AS DOUBLE) / t AS p FROM uv1, ut1), " +
      recur("useg1", "up1") +
      best("ubest1", "useg1").stripSuffix(", ") + " " +
      "SELECT word, freq, path AS pieces, " +
      "CAST(len(string_split(path, '|')) AS BIGINT) AS n_pieces, score " +
      "FROM ubest1 WHERE rn = 1 ORDER BY word"
  }

  private def bpeTrainOracleSql(nMerges: Int): String =
    bpeTrainerCtes(nMerges).stripSuffix(", ") + " " + (1 to nMerges)
      .map(i => s"SELECT CAST(step AS BIGINT) AS step, l AS l_tok, r AS r_tok, n FROM m$i")
      .mkString(" UNION ALL ") + " ORDER BY step"

  /** DuckDB replica of train + ENCODE: the shared trainer chain followed
    * by the apply chain — each learned merge applied to the corpus
    * segmentation in step order, word boundaries marked chr(1) exactly
    * as the engine builds them ([[TextSearch.BpeBoundary]]). The
    * coalesce(...) on every rewrite keeps an EXHAUSTED trainer (empty
    * m_i) from NULLing the segmentation — the engine just stops early,
    * and the oracle must pass the text through unchanged the same way. */
  private def bpeEncodeOracleSql(nMerges: Int): String = {
    val apply = new StringBuilder
    apply.append("e0 AS (SELECT doc_id, ' ' || array_to_string(" +
      "list_transform(string_split_regex(trim(text), '\\s+'), " +
      "w -> regexp_replace(w, '(.)', '\\1 ', 'g')), chr(1) || ' ') AS seg FROM documents), ")
    for (i <- 1 to nMerges)
      apply.append(s"e$i AS MATERIALIZED (SELECT doc_id, " +
        s"coalesce(replace(seg, (SELECT ' '||l||' '||r||' ' FROM m$i), " +
        s"(SELECT ' '||l||r||' ' FROM m$i)), seg) AS seg FROM e${i - 1}), ")
    bpeTrainerCtes(nMerges) + apply.toString.stripSuffix(", ") +
      s" SELECT doc_id, CAST(len(list_filter(string_split(trim(seg), ' '), t -> t <> chr(1))) AS BIGINT) " +
      s"AS n_bpe_tokens FROM e$nMerges ORDER BY doc_id"
  }

  /** Shared CTE chain of the exact n-gram pair oracle, reused by the
    * connected-components clustering oracle (which wraps the same pairs in
    * a recursive reachability CTE). */
  private val ngramOracleCtes: String =
    "w AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words FROM documents), " +
      "sh AS (SELECT doc_id, list_distinct([words[i] || ' ' || words[i+1] || ' ' || words[i+2] " +
      "for i in generate_series(1, len(words) - 2)]) AS s FROM w WHERE len(words) >= 3), " +
      "sizes AS (SELECT doc_id, CAST(len(s) AS BIGINT) AS n_sh FROM sh), " +
      "postings AS (SELECT doc_id, unnest(s) AS shingle FROM sh), " +
      "cm AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common " +
      "FROM postings a JOIN postings b ON a.shingle = b.shingle AND a.doc_id < b.doc_id " +
      "GROUP BY 1, 2)"

  private val ngramOraclePairs: String =
    "SELECT doc_a, doc_b, round(CAST(common AS DOUBLE) / (sa.n_sh + sb.n_sh - common), 6) AS jaccard " +
      "FROM cm JOIN sizes sa ON cm.doc_a = sa.doc_id JOIN sizes sb ON cm.doc_b = sb.doc_id " +
      "WHERE CAST(common AS DOUBLE) / (sa.n_sh + sb.n_sh - common) >= 0.5"

  /** Oracle for the streaming dedup gate: replay both waves' four
    * rejection stages (exact-in-batch, exact-vs-corpus, near-dup-vs-corpus,
    * near-dup-in-batch with recursive-CTE connected components) over the
    * same planted corpus the Spark side builds. */
  private val dedupGateOracleSql: String =
    "WITH RECURSIVE " +
      "docs0 AS (SELECT doc_id, text FROM documents " +
      "UNION ALL SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 20 = 0 " +
      "UNION ALL SELECT doc_id + 1000001, text FROM documents WHERE doc_id % 30 = 0), " +
      "w AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words FROM docs0), " +
      "sh AS (SELECT doc_id, list_distinct([words[i] || ' ' || words[i+1] || ' ' || words[i+2] " +
      "for i in generate_series(1, len(words) - 2)]) AS s FROM w WHERE len(words) >= 3), " +
      "sizes AS (SELECT doc_id, CAST(len(s) AS BIGINT) AS n_sh FROM sh), " +
      "postings AS (SELECT doc_id, unnest(s) AS shingle FROM sh), " +
      "cm AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common " +
      "FROM postings a JOIN postings b ON a.shingle = b.shingle AND a.doc_id < b.doc_id " +
      "GROUP BY 1, 2), " +
      "jp AS (SELECT doc_a, doc_b FROM cm " +
      "JOIN sizes sa ON cm.doc_a = sa.doc_id JOIN sizes sb ON cm.doc_b = sb.doc_id " +
      "WHERE CAST(common AS DOUBLE) / (sa.n_sh + sb.n_sh - common) >= 0.5), " +
      "sym AS (SELECT doc_a AS x, doc_b AS y FROM jp UNION ALL SELECT doc_b, doc_a FROM jp), " +
      // wave 0
      "b0 AS (SELECT doc_id, text FROM docs0 WHERE doc_id % 2 = 0), " +
      "e0 AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS wmin FROM b0), " +
      "r0e AS (SELECT doc_id, 'exact_batch' AS status, wmin AS witness FROM e0 WHERE doc_id <> wmin), " +
      "s0 AS (SELECT doc_id FROM e0 WHERE doc_id = wmin), " +
      "ed0 AS (SELECT x, y FROM sym WHERE x IN (SELECT doc_id FROM s0) AND y IN (SELECT doc_id FROM s0)), " +
      "rc0 AS (SELECT x AS id, x AS lbl FROM (SELECT DISTINCT x FROM ed0) " +
      "UNION SELECT e.x, r.lbl FROM ed0 e JOIN rc0 r ON e.y = r.id), " +
      "l0 AS (SELECT id, min(lbl) AS lbl FROM rc0 GROUP BY id), " +
      "r0n AS (SELECT id AS doc_id, 'near_dup_batch' AS status, lbl AS witness FROM l0 WHERE id <> lbl), " +
      "a0 AS (SELECT doc_id FROM s0 WHERE doc_id NOT IN (SELECT doc_id FROM r0n)), " +
      // wave 1
      "b1 AS (SELECT doc_id, text FROM docs0 WHERE doc_id % 2 = 1), " +
      "e1 AS (SELECT doc_id, text, min(doc_id) OVER (PARTITION BY text) AS wmin FROM b1), " +
      "r1e AS (SELECT doc_id, 'exact_batch' AS status, wmin AS witness FROM e1 WHERE doc_id <> wmin), " +
      "s1 AS (SELECT doc_id, text FROM e1 WHERE doc_id = wmin), " +
      "a0t AS (SELECT d.doc_id, d.text FROM docs0 d JOIN a0 ON d.doc_id = a0.doc_id), " +
      "r1ec AS (SELECT s1.doc_id, 'exact_corpus' AS status, min(a0t.doc_id) AS witness " +
      "FROM s1 JOIN a0t ON s1.text = a0t.text GROUP BY s1.doc_id), " +
      "s1c AS (SELECT doc_id FROM s1 WHERE doc_id NOT IN (SELECT doc_id FROM r1ec)), " +
      "r1nc AS (SELECT x AS doc_id, 'near_dup_corpus' AS status, min(y) AS witness FROM sym " +
      "WHERE x IN (SELECT doc_id FROM s1c) AND y IN (SELECT doc_id FROM a0) GROUP BY x), " +
      "s1n AS (SELECT doc_id FROM s1c WHERE doc_id NOT IN (SELECT doc_id FROM r1nc)), " +
      "ed1 AS (SELECT x, y FROM sym WHERE x IN (SELECT doc_id FROM s1n) AND y IN (SELECT doc_id FROM s1n)), " +
      "rc1 AS (SELECT x AS id, x AS lbl FROM (SELECT DISTINCT x FROM ed1) " +
      "UNION SELECT e.x, r.lbl FROM ed1 e JOIN rc1 r ON e.y = r.id), " +
      "l1 AS (SELECT id, min(lbl) AS lbl FROM rc1 GROUP BY id), " +
      "r1n AS (SELECT id AS doc_id, 'near_dup_batch' AS status, lbl AS witness FROM l1 WHERE id <> lbl), " +
      "a1 AS (SELECT doc_id FROM s1n WHERE doc_id NOT IN (SELECT doc_id FROM r1n)) " +
      "SELECT doc_id, status, witness, CAST(batch_id AS BIGINT) AS batch_id FROM (" +
      "SELECT doc_id, 'accepted' AS status, CAST(NULL AS BIGINT) AS witness, doc_id % 2 AS batch_id FROM a0 " +
      "UNION ALL SELECT doc_id, 'accepted', CAST(NULL AS BIGINT), doc_id % 2 FROM a1 " +
      "UNION ALL SELECT doc_id, status, witness, 0 FROM r0e " +
      "UNION ALL SELECT doc_id, status, witness, 0 FROM r0n " +
      "UNION ALL SELECT doc_id, status, witness, 1 FROM r1e " +
      "UNION ALL SELECT doc_id, status, witness, 1 FROM r1ec " +
      "UNION ALL SELECT doc_id, status, witness, 1 FROM r1nc " +
      "UNION ALL SELECT doc_id, status, witness, 1 FROM r1n" +
      ") ORDER BY doc_id, status"

  /** PageRank oracle: the iteration chain unrolled into CTEs — each
    * round's per-edge contribution is rounded to 6dp, summed as
    * DECIMAL(18,6) and the damped update re-rounded, replaying the
    * engine's order-independent iteration discipline exactly. */
  /** HITS oracle: every half-step (authority update, L1 normalize, hub
    * update, L1 normalize) unrolled as materialized CTEs with the same
    * decimal-sum/rounded-division recipe as [[pagerankOracle]]. */
  private def hitsOracle(iterations: Int): String = {
    // every CTE is MATERIALIZED: DuckDB inlines plain CTEs, and each
    // half-step references its predecessor twice (the total + the join),
    // so inlining re-expands the lineitem join ~2^(2k) times — the exact
    // plan blowup the engine's per-iteration localCheckpoint prevents
    val head =
      "WITH e0 AS MATERIALIZED (SELECT c.c_nationkey AS src, s.s_nationkey AS dst, count(*) AS w " +
        "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey " +
        "JOIN customer c ON o.o_custkey = c.c_custkey " +
        "JOIN supplier s ON l.l_suppkey = s.s_suppkey GROUP BY 1, 2), " +
        "e AS MATERIALIZED (SELECT src, dst, CAST(w AS DOUBLE) AS w FROM e0), " +
        "nodes AS MATERIALIZED (SELECT src AS node FROM e0 UNION SELECT dst FROM e0), " +
        "h0 AS MATERIALIZED (SELECT node, 1.0 AS h FROM nodes)"
    val iters = (1 to iterations).map { k =>
      s"sa$k AS MATERIALIZED (SELECT e.dst, sum(CAST(round(h.h * e.w, 6) AS DECIMAL(18,6))) AS sa " +
        s"FROM e JOIN h${k - 1} h ON e.src = h.node GROUP BY 1), " +
        s"ta$k AS MATERIALIZED (SELECT sum(sa) AS t FROM sa$k), " +
        s"a$k AS MATERIALIZED (SELECT nodes.node, round(CAST(coalesce(sa$k.sa, 0) AS DOUBLE) / " +
        s"CAST(ta$k.t AS DOUBLE), 6) AS a " +
        s"FROM nodes CROSS JOIN ta$k LEFT JOIN sa$k ON nodes.node = sa$k.dst), " +
        s"sh$k AS MATERIALIZED (SELECT e.src, sum(CAST(round(a.a * e.w, 6) AS DECIMAL(18,6))) AS sh " +
        s"FROM e JOIN a$k a ON e.dst = a.node GROUP BY 1), " +
        s"th$k AS MATERIALIZED (SELECT sum(sh) AS t FROM sh$k), " +
        s"h$k AS MATERIALIZED (SELECT nodes.node, round(CAST(coalesce(sh$k.sh, 0) AS DOUBLE) / " +
        s"CAST(th$k.t AS DOUBLE), 6) AS h " +
        s"FROM nodes CROSS JOIN th$k LEFT JOIN sh$k ON nodes.node = sh$k.src)"
    }.mkString(", ")
    s"$head, $iters SELECT CAST(a.node AS BIGINT) AS node, a.a AS authority, h.h AS hub " +
      s"FROM a$iterations a JOIN h$iterations h ON a.node = h.node ORDER BY node"
  }

  private def pagerankOracle(iterations: Int): String = {
    val head =
      "WITH e0 AS (SELECT c.c_nationkey AS src, s.s_nationkey AS dst, count(*) AS w " +
        "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey " +
        "JOIN customer c ON o.o_custkey = c.c_custkey " +
        "JOIN supplier s ON l.l_suppkey = s.s_suppkey GROUP BY 1, 2), " +
        "e AS (SELECT e0.src, e0.dst, CAST(e0.w AS DOUBLE) AS w, ow.wout FROM e0 " +
        "JOIN (SELECT src, CAST(sum(w) AS DOUBLE) AS wout FROM e0 GROUP BY 1) ow ON e0.src = ow.src), " +
        "nodes AS (SELECT src AS node FROM e0 UNION SELECT dst FROM e0), " +
        "nn AS (SELECT count(*) AS n FROM nodes), " +
        "r0 AS (SELECT node, 1.0 / n AS pr FROM nodes CROSS JOIN nn)"
    val iters = (1 to iterations).map { k =>
      s"c$k AS (SELECT e.dst, sum(CAST(round(r.pr * e.w / e.wout, 6) AS DECIMAL(18,6))) AS sc " +
        s"FROM e JOIN r${k - 1} r ON e.src = r.node GROUP BY 1), " +
        s"r$k AS (SELECT nodes.node, round((1 - 0.85) / nn.n + 0.85 * CAST(coalesce(c$k.sc, 0) AS DOUBLE), 6) AS pr " +
        s"FROM nodes CROSS JOIN nn LEFT JOIN c$k ON nodes.node = c$k.dst)"
    }.mkString(", ")
    s"$head, $iters SELECT CAST(node AS BIGINT) AS node, pr FROM r$iterations ORDER BY node"
  }

  /** Greedy k-center oracle: selection rounds unrolled into CTEs — each
    * round's running min-distance chain replays the engine's 6dp-rounded
    * cosine + exact IEEE least, and top-1 uses the same (d DESC, vec_id)
    * tiebreak. */
  private def coresetOracle(k: Int): String = {
    val head =
      "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
        "c0 AS (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 1), " +
        "d1 AS (SELECT e.vec_id, e.v, 1.0 - round(list_cosine_similarity(e.v, (SELECT v FROM c0)), 6) AS d FROM e), " +
        "c1 AS (SELECT vec_id, v, d FROM d1 ORDER BY d DESC, vec_id LIMIT 1)"
    val mid = (2 until k).map { i =>
      s"d$i AS (SELECT d${i - 1}.vec_id, d${i - 1}.v, least(d${i - 1}.d, " +
        s"1.0 - round(list_cosine_similarity(d${i - 1}.v, (SELECT v FROM c${i - 1})), 6)) AS d FROM d${i - 1}), " +
        s"c$i AS (SELECT vec_id, v, d FROM d$i ORDER BY d DESC, vec_id LIMIT 1)"
    }.mkString(", ")
    val sel = (1 until k)
      .map(i => s"SELECT CAST($i AS BIGINT) AS sel_rank, vec_id, d AS d_min FROM c$i")
      .mkString(" UNION ALL ")
    s"$head, $mid SELECT sel_rank, vec_id, d_min FROM (" +
      "SELECT CAST(0 AS BIGINT) AS sel_rank, (SELECT vec_id FROM c0) AS vec_id, " +
      "CAST(2.0 AS DOUBLE) AS d_min " +
      s"UNION ALL $sel) ORDER BY sel_rank"
  }

  def oracleSql: Map[String, String] = Map(
    // domain-centrality power iteration over the nation trade graph
    "q_pagerank" -> pagerankOracle(5),
    // HITS: 4 iterations of authority/hub half-steps with L1
    // normalization, unrolled like pagerank — the gate replays every
    // half-step's decimal sums and rounded divisions
    "q_hits" -> hitsOracle(4),
    // BFS frontier: the oracle's recursive CTE enumerates every path of
    // length <= 5 from the seeds through the same affine edge maps and
    // takes min(hop) per node — first-reach depth in the engine's
    // iterative join chain must equal the declarative shortest-hop
    "q_frontier" ->
      ("WITH RECURSIVE r(node, hop) AS (" +
        "SELECT doc_id, 0 FROM documents WHERE doc_id < 3 " +
        "UNION ALL SELECT dst, hop + 1 FROM (" +
        "SELECT unnest([(node * 31 + 7) % 400, (node * 17 + 3) % 400]) AS dst, hop " +
        "FROM r) WHERE hop < 5) " +
        "SELECT CAST(node AS BIGINT) AS doc_id, CAST(min(hop) AS BIGINT) AS hop " +
        "FROM r GROUP BY node ORDER BY doc_id"),
    // greedy k-center coreset selection, rounds unrolled
    "q_coreset" -> coresetOracle(8),
    // Efraimidis-Spirakis weighted sampling: key = -ln(u)/w, k smallest;
    // u from the poly_hash fingerprint, w = blended quality score
    "q_weighted_sample" ->
      ("WITH t AS (SELECT doc_id, text, length(text) AS len, " +
        "string_split_regex(trim(text), '\\s+') AS w FROM documents " +
        "WHERE length(text) > 0 AND len(string_split_regex(trim(text), '\\s+')) >= 1), " +
        "q AS (SELECT doc_id, text, " +
        "(CAST(len AS DOUBLE) - length(regexp_replace(text, '[.!?,;:]', '', 'g'))) / len AS punct_ratio, " +
        "CAST(len(list_filter(w, x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE) / len(w) AS stopword_ratio_raw, " +
        "len(w) AS nw FROM t), " +
        "qs AS (SELECT doc_id, text, " +
        "round(least(1.0, CAST(nw AS DOUBLE) / 100.0) * 0.5 + stopword_ratio_raw * 0.3 " +
        "+ (1.0 - punct_ratio) * 0.2, 6) AS quality_score FROM q), " +
        "h AS (SELECT doc_id, quality_score, " +
        "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        "list_transform(generate_series(1, length(text)), i -> CAST(ascii(text[i]) AS BIGINT))), " +
        "(a, c) -> (a * 31 + c) % 1000000007) AS hh FROM qs) " +
        "SELECT doc_id, quality_score, " +
        "round(-round(ln((hh + 1) / 1000000008.0), 6) / quality_score, 6) AS samp_key " +
        "FROM h ORDER BY samp_key, doc_id LIMIT 100"),
    "q_perplexity" ->
      ("WITH t AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok FROM documents), " +
        "t2 AS (SELECT doc_id, tok FROM t WHERE len(tok) > 0), " +
        "tf AS (SELECT tok, count(*) AS tf FROM t2 GROUP BY tok), " +
        "tot AS (SELECT count(*) AS n_total FROM t2), " +
        "lp AS (SELECT doc_id, CAST(round(ln(CAST(tf.tf AS DOUBLE) / (SELECT n_total FROM tot)), 6) AS DECIMAL(18,6)) AS lp " +
        "FROM t2 JOIN tf USING (tok)), " +
        "agg AS (SELECT doc_id, count(*) AS n_tokens, sum(lp) AS sum_lp FROM lp GROUP BY doc_id) " +
        "SELECT doc_id, n_tokens, round(exp(-CAST(sum_lp AS DOUBLE) / n_tokens), 4) AS ppl " +
        "FROM agg ORDER BY doc_id"),
    "q_importance" ->
      ("WITH t AS (SELECT doc_id, source = 'src0' AS is_t, " +
        "unnest(string_split_regex(trim(text), '\\s+')) AS tok FROM documents), " +
        "t2 AS (SELECT doc_id, is_t, tok FROM t WHERE len(tok) > 0), " +
        "vocab AS (SELECT tok, count(*) AS cr, " +
        "sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS ct FROM t2 GROUP BY tok), " +
        "tot AS (SELECT count(*) AS nr, sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS nt, " +
        "count(DISTINCT tok) AS v FROM t2), " +
        "delta AS (SELECT tok, CAST(round(ln((ct + 1.0) / (nt + v)) " +
        "- ln((cr + 1.0) / (nr + v)), 6) AS DECIMAL(18,6)) AS d FROM vocab, tot) " +
        "SELECT doc_id, count(*) AS n_tokens, CAST(sum(d) AS DOUBLE) AS log_weight " +
        "FROM t2 JOIN delta USING (tok) GROUP BY doc_id ORDER BY doc_id"),
    "q_dataset_card" ->
      ("WITH t AS (SELECT doc_id, text, lang, length(text) AS len, " +
        "string_split_regex(trim(text), '\\s+') AS w FROM documents), " +
        "qx AS (SELECT text, lang, CAST(len(w) AS BIGINT) AS n_tokens, " +
        "round(least(1.0, CAST(len(w) AS DOUBLE) / 100.0) * 0.5 " +
        "+ (CAST(len(list_filter(w, x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE) / len(w)) * 0.3 " +
        "+ (1.0 - (CAST(len AS DOUBLE) - length(regexp_replace(text, '[.!?,;:]', '', 'g'))) / len) * 0.2, 6) AS quality_score FROM t), " +
        "base AS (SELECT count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_toks, " +
        "count(DISTINCT text) AS n_distinct_text, count(DISTINCT lang) AS n_langs, " +
        "sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS n_en, " +
        "sum(CAST(quality_score AS DECIMAL(18,6))) AS q_sum FROM qx), " +
        "v AS (SELECT count(DISTINCT tok) AS v FROM " +
        "(SELECT unnest(w) AS tok FROM t) WHERE length(tok) > 0) " +
        "SELECT metric, value FROM (" +
        "SELECT 'n_docs' AS metric, CAST(n_docs AS DOUBLE) AS value FROM base " +
        "UNION ALL SELECT 'n_tokens', CAST(n_toks AS DOUBLE) FROM base " +
        "UNION ALL SELECT 'vocab_size', CAST(v AS DOUBLE) FROM v " +
        "UNION ALL SELECT 'n_langs', CAST(n_langs AS DOUBLE) FROM base " +
        "UNION ALL SELECT 'pct_en', round(CAST(n_en AS DOUBLE) / n_docs, 6) FROM base " +
        "UNION ALL SELECT 'exact_dup_rate', round(CAST(1.0 AS DOUBLE) - CAST(n_distinct_text AS DOUBLE) / n_docs, 6) FROM base " +
        "UNION ALL SELECT 'mean_tokens', round(CAST(n_toks AS DOUBLE) / n_docs, 6) FROM base " +
        "UNION ALL SELECT 'mean_quality', round(CAST(q_sum AS DOUBLE) / n_docs, 6) FROM base" +
        ") ORDER BY metric"),
    // multinomial NB: training is counting, so DuckDB replays the whole
    // model — smoothed per-(class, token) log-likelihoods rounded to 6dp
    // DECIMAL before the per-doc sums (the perplexity ln() discipline)
    "q_nb_classify" ->
      ("WITH t AS (SELECT doc_id, lang, tok FROM (SELECT doc_id, lang, " +
        "unnest(string_split_regex(trim(text), '\\s+')) AS tok FROM documents) WHERE len(tok) > 0), " +
        "tf AS (SELECT doc_id, tok, count(*) AS tf FROM t GROUP BY 1, 2), " +
        "ct AS (SELECT lang AS cls, tok, count(*) AS c FROM t GROUP BY 1, 2), " +
        "tot AS (SELECT cls, sum(c) AS n_c FROM ct GROUP BY 1), " +
        "v AS (SELECT count(DISTINCT tok) AS vs FROM t), " +
        "dt AS (SELECT count(*) AS nd FROM documents), " +
        "lp AS (SELECT cls, tok, CAST(round(ln((c + 1.0) / (n_c + vs)), 6) AS DECIMAL(18,6)) AS logp " +
        "FROM ct JOIN tot USING (cls), v), " +
        "def AS (SELECT cls, CAST(round(ln(1.0 / (n_c + vs)), 6) AS DECIMAL(18,6)) AS logp0 FROM tot, v), " +
        "pri AS (SELECT lang AS cls, CAST(round(ln(count(*) * 1.0 / max(nd)), 6) AS DECIMAL(18,6)) AS logprior " +
        "FROM documents CROSS JOIN dt GROUP BY 1), " +
        "sc AS (SELECT tf.doc_id, def.cls, sum(tf.tf * coalesce(lp.logp, def.logp0)) AS ll " +
        "FROM tf CROSS JOIN def LEFT JOIN lp ON lp.cls = def.cls AND lp.tok = tf.tok GROUP BY 1, 2), " +
        "fin AS (SELECT doc_id, cls, CAST(ll + logprior AS DOUBLE) AS score, " +
        "row_number() OVER (PARTITION BY doc_id ORDER BY CAST(ll + logprior AS DOUBLE) DESC, cls) AS rn " +
        "FROM sc JOIN pri USING (cls)) " +
        "SELECT doc_id, cls AS nb_pred, score FROM fin WHERE rn = 1 ORDER BY doc_id"),
    // UniMax water-filling + sqrt temperature rates; caps are
    // integer-valued doubles so the windowed prefix sums are exact, and
    // sqrt (unlike pow) is IEEE-correctly-rounded in both engines
    "q_mix_plan" ->
      ("WITH per AS (SELECT source, CAST(coalesce(sum(coalesce(len(string_split_regex(trim(text), '\\s+')), 0)), 0) AS BIGINT) AS n_tokens " +
        "FROM documents GROUP BY 1), " +
        "c AS (SELECT source, n_tokens, n_tokens * 2.0 AS cap FROM per), " +
        "st AS (SELECT source, n_tokens, cap, " +
        "row_number() OVER (ORDER BY cap, source) AS i, " +
        "coalesce(sum(cap) OVER (ORDER BY cap, source ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix, " +
        "count(*) OVER () AS s_total, " +
        "coalesce(lag(cap, 1) OVER (ORDER BY cap, source), 0) AS prev_cap FROM c), " +
        "lamt AS (SELECT *, (48000.0 - prefix) / (s_total - i + 1) AS lam_i FROM st), " +
        "lam AS (SELECT *, max(CASE WHEN prev_cap <= lam_i AND lam_i <= cap THEN lam_i END) OVER () AS lam FROM lamt), " +
        "un AS (SELECT source, n_tokens, round(least(cap, coalesce(lam, cap)), 6) AS unimax_alloc FROM lam), " +
        "tm AS (SELECT source, n_tokens, unimax_alloc, CAST(round(sqrt(n_tokens), 6) AS DECIMAL(18,6)) AS t_mass FROM un) " +
        "SELECT source, n_tokens, unimax_alloc, " +
        "round(CAST(t_mass AS DOUBLE) / CAST(sum(t_mass) OVER () AS DOUBLE), 6) AS temp_rate " +
        "FROM tm ORDER BY source"),
    "q_confusion" ->
      ("WITH t AS (SELECT doc_id, lang, string_split_regex(trim(text), '\\s+') AS w FROM documents), " +
        "h AS (SELECT doc_id, lang, " +
        "CAST(len(list_filter(w, x -> x IN ('the','a','of','and','to','in','is'))) AS BIGINT) AS en, " +
        "CAST(len(list_filter(w, x -> x IN ('el','la','de','y','en','es','un'))) AS BIGINT) AS es, " +
        "CAST(len(list_filter(w, x -> x IN ('der','die','das','und','ist','ein','zu'))) AS BIGINT) AS de, " +
        "CAST(len(list_filter(w, x -> x IN ('le','la','et','de','un','est','en'))) AS BIGINT) AS fr FROM t), " +
        "lp AS (SELECT lang, CASE WHEN greatest(en, es, de, fr) = 0 THEN 'und' " +
        "WHEN en >= es AND en >= de AND en >= fr THEN 'en' " +
        "WHEN es >= de AND es >= fr THEN 'es' WHEN de >= fr THEN 'de' ELSE 'fr' END AS pred FROM h), " +
        "m AS (SELECT lang AS truth, pred, count(*) AS n FROM lp GROUP BY 1, 2), " +
        "x AS (SELECT truth, pred, n, sum(n) OVER (PARTITION BY truth) AS n_truth, " +
        "sum(n) OVER (PARTITION BY pred) AS n_pred FROM m) " +
        "SELECT truth, pred, n, " +
        "CASE WHEN truth = pred THEN round(CAST(n AS DOUBLE) / n_pred, 6) END AS \"precision\", " +
        "CASE WHEN truth = pred THEN round(CAST(n AS DOUBLE) / n_truth, 6) END AS recall " +
        "FROM x ORDER BY truth, pred"),
    "q_novelty" ->
      ("WITH w AS (SELECT source, string_split_regex(trim(text), '\\s+') AS words FROM documents), " +
        "c AS (SELECT source, list_transform([words[i] || ' ' || words[i+1] || ' ' || words[i+2] " +
        "for i in generate_series(1, len(words) - 2)], sg -> list_reduce( " +
        "list_prepend(CAST(0 AS BIGINT), list_transform(generate_series(1, length(sg)), " +
        "i -> CAST(ascii(sg[i]) AS BIGINT))), (a, x) -> (a * 31 + x) % 1000000007)) AS cs " +
        "FROM w WHERE len(words) >= 3), " +
        "e AS (SELECT source, unnest(cs) AS sh FROM c) " +
        "SELECT source, count(*) AS n_shingles, count(DISTINCT sh) AS n_distinct, " +
        "round(CAST(count(DISTINCT sh) AS DOUBLE) / count(*), 6) AS novelty " +
        "FROM e GROUP BY source ORDER BY source"),
    "q_dedup_gate" -> dedupGateOracleSql,
    // watermark gate: the oracle replays the deterministic wave plan —
    // wave 1 (event_id % 3 != 0) at real timestamps, plus ONLY the wave-2
    // rows re-timed INSIDE the 2h watermark (even ids at max-30min); the
    // odd-id rows re-timed to max-5h sit beyond the watermark and must be
    // dropped by the stream, and the __flush sentinels never emit (their
    // windows stay open). See StreamingJobs.qStreamWindow.
    "q_stream_window" ->
      ("WITH w1 AS (SELECT ts, event_type FROM events WHERE event_id % 3 <> 0), " +
        "mx AS (SELECT max(ts) AS m FROM w1), " +
        "w2 AS (SELECT m - INTERVAL 30 MINUTE AS ts, event_type FROM events, mx " +
        "WHERE event_id % 3 = 0 AND event_id % 2 = 0), " +
        "allv AS (SELECT ts, event_type FROM w1 UNION ALL SELECT ts, event_type FROM w2) " +
        "SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n " +
        "FROM allv GROUP BY 1, 2 ORDER BY 1, 2"),
    // session gate: gaps-and-islands over the SAME event rows the stream
    // replays (two time-split waves; no late rows by construction) — a
    // session breaks when the gap EXCEEDS 30 minutes (Spark merges
    // adjacent [t, t+gap) windows, i.e. diff == gap still merges;
    // pinned by StreamingSpec); session_end_gap = last event + gap,
    // matching session_window.end. The flush user (-1) never emits.
    "q_stream_session" ->
      ("WITH m AS (SELECT user_id, ts, CASE WHEN lag(ts) OVER w IS NULL " +
        "OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk " +
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)), " +
        "s AS (SELECT user_id, ts, sum(brk) OVER (PARTITION BY user_id ORDER BY ts " +
        "ROWS UNBOUNDED PRECEDING) AS sess FROM m) " +
        "SELECT min(ts) AS session_start, " +
        "max(ts) + INTERVAL 30 MINUTE AS session_end_gap, " +
        "user_id, count(*) AS n_events " +
        "FROM s GROUP BY user_id, sess ORDER BY user_id, session_start"),
    // bounded-state streaming dedup: wave 1 (every doc at T) emits, the
    // wave-2 re-sends at T+10min are DROPPED (inside the 1h window), the
    // advance row emits and evicts wave-1 state, and the wave-4 re-sends
    // at T+5h RE-EMIT (state gone — the bounded-state contract). The
    // oracle is the exact final multiset.
    "q_stream_dedup" ->
      ("SELECT doc_id, TIMESTAMP '2024-01-01 00:00:00' AS ts FROM documents " +
        "UNION ALL SELECT -1 AS doc_id, TIMESTAMP '2024-01-01 05:00:00' AS ts " +
        "UNION ALL SELECT doc_id, TIMESTAMP '2024-01-01 05:00:00' AS ts " +
        "FROM documents WHERE doc_id % 3 = 0 " +
        "ORDER BY doc_id, ts"),
    "q_logistic" -> logisticOracleSql,
    // stream-stream attribution join: the oracle is the equivalent batch
    // interval join — an inner watermarked join emits each match exactly
    // once, so the streaming replay must reproduce it verbatim
    "q_stream_join" ->
      ("SELECT v.event_id AS view_id, c.event_id AS click_id, v.user_id " +
        "FROM events v JOIN events c ON v.user_id = c.user_id " +
        "AND v.event_type = 'view' AND c.event_type = 'click' " +
        "AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 30 MINUTE " +
        "ORDER BY view_id, click_id"),
    // content-defined chunking: the oracle recomputes every rolling-hash
    // boundary, chunk fingerprint and cross-doc share flag in closed
    // form (windowed SQL, no sequential scan) — a boundary off-by-one,
    // a fingerprint drift or a broken resynchronization on the planted
    // shifted copies all hash-mismatch
    "q_cdc_chunks" ->
      ("WITH cd0 AS (SELECT doc_id, text FROM documents " +
        "UNION ALL SELECT doc_id + 3000000, 'edited: ' || text " +
        "FROM documents WHERE doc_id % 25 = 0), " +
        "cdp AS (SELECT doc_id, text, unnest(generate_series(8, length(text))) AS i " +
        "FROM cd0 WHERE length(text) >= 8), " +
        "cdh AS (SELECT doc_id, text, i, " +
        "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        "list_transform(generate_series(i - 7, i), k -> CAST(ascii(text[k]) AS BIGINT))), " +
        "(a, c) -> (a * 31 + c) % 1000000007) AS h FROM cdp), " +
        "cdb AS (SELECT doc_id, text, i AS b FROM cdh WHERE h % 64 = 0 " +
        "UNION SELECT doc_id, text, length(text) AS b FROM cd0 WHERE length(text) > 0), " +
        "cdc AS (SELECT doc_id, text, b, " +
        "coalesce(lag(b) OVER (PARTITION BY doc_id ORDER BY b), 0) AS prev, " +
        "row_number() OVER (PARTITION BY doc_id ORDER BY b) AS chunk_no FROM cdb), " +
        "cdk AS (SELECT doc_id, CAST(chunk_no AS INTEGER) AS chunk_no, " +
        "CAST(prev + 1 AS INTEGER) AS start, CAST(b - prev AS INTEGER) AS chunk_len, " +
        "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        "list_transform(generate_series(prev + 1, b), k -> CAST(ascii(text[k]) AS BIGINT))), " +
        "(a, c) -> (a * 31 + c) % 1000000007) AS chunk_fp FROM cdc), " +
        "cshare AS (SELECT chunk_fp, count(DISTINCT doc_id) AS nd FROM cdk GROUP BY 1) " +
        "SELECT k.doc_id, k.chunk_no, k.start, k.chunk_len, k.chunk_fp, " +
        "s.nd > 1 AS shared FROM cdk k JOIN cshare s USING (chunk_fp) " +
        "ORDER BY doc_id, chunk_no"),
    // deflate ratios are zlib-build-dependent, so the gate is the
    // tolerance pattern: exact UTF-8 byte counts + booleans the engine
    // must prove (stored-block expansion bound; repetition-collapse
    // property for quadrupled text inside the LZ77 window)
    "q_compress_ratio" ->
      ("SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes, " +
        "TRUE AS compress_ok, TRUE AS rep_detected " +
        "FROM documents ORDER BY doc_id"),
    "q_dedup_minhash" -> minhashOracleSql,
    "q_dedup_incremental" -> minhashIncrementalOracleSql,
    "q_dedup_simhash" -> simhashOracleSql,
    "q_scan_project" ->
      "SELECT doc_id, lang, n_chars FROM documents ORDER BY doc_id",
    "q_filter_eq" ->
      "SELECT doc_id, lang, n_chars FROM documents WHERE lang = 'en' ORDER BY doc_id",
    "q_filter_conj" ->
      "SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderstatus = 'F' AND o_orderpriority = '1-URGENT' ORDER BY o_orderkey",
    "q_filter_notnull_date" ->
      "SELECT o_orderkey, o_orderdate FROM orders WHERE o_orderdate IS NOT NULL AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00' ORDER BY o_orderkey",
    "q_exists_count" ->
      "SELECT count(*) AS n_customers_with_orders FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)",
    "q_filter_isin" ->
      "SELECT n_nationkey, n_name FROM nation WHERE n_name IN ('NATION_1','NATION_7','NATION_19') ORDER BY n_nationkey",
    "q_project_rename" ->
      "SELECT o_orderkey AS id, o_orderstatus AS status, o_totalprice AS price FROM orders ORDER BY id LIMIT 100",
    "q_first_row" ->
      "SELECT c_custkey, c_name FROM customer ORDER BY c_custkey LIMIT 1",
    "q_dim_project" ->
      "SELECT n_name FROM nation ORDER BY n_name",
    "q_join_dim" ->
      "SELECT n_nationkey, n_name, r_name AS region_name FROM nation JOIN region ON n_regionkey = r_regionkey ORDER BY n_nationkey",
    "q_anti_join" ->
      "SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT') ORDER BY c_custkey",
    "q_semi_join" ->
      "SELECT s_suppkey, s_name FROM supplier WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey) ORDER BY s_suppkey",
    "q_count" ->
      "SELECT count(*) AS n FROM lineitem",
    "q_collect_list" ->
      "SELECT c_nationkey, array_to_string(list_sort(list(c_name)), '|') AS names FROM customer GROUP BY c_nationkey ORDER BY c_nationkey",
    "q_distinct" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem ORDER BY l_returnflag, l_linestatus",
    "q_agg" ->
      "SELECT l_returnflag, l_linestatus, CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price, CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(38,4))) AS DOUBLE) AS sum_disc_price, count(*) AS count_order FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus",
    "q_snippets" ->
      ("SELECT doc_id, lang, CAST(k + 1 AS INTEGER) AS snippet_id, " +
        "array_to_string(words[k*3+1 : k*3+5], ' ') AS snippet_text, " +
        "source || '#page=' || CAST(k + 1 AS VARCHAR) AS snippet_link " +
        "FROM (SELECT doc_id, lang, source, words, " +
        "unnest(generate_series(0, (len(words)-1)//3)) AS k " +
        "FROM (SELECT doc_id, lang, source, regexp_split_to_array(trim(text), '\\s+') AS words " +
        "FROM documents)) ORDER BY doc_id, snippet_id"),
    "q_sentence_snippets" ->
      ("WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words FROM documents), " +
        "s1 AS (SELECT doc_id, array_to_string([array_to_string(words[k*8+1 : k*8+8], ' ') " +
        "for k in generate_series(0, (len(words)-1)//8)], '. ') AS sent_text FROM w), " +
        "s2 AS (SELECT doc_id, string_split_regex(trim(sent_text), '[.!?]\\s+') AS sents FROM s1), " +
        "sn AS (SELECT doc_id, sents, unnest(generate_series(0, (len(sents)-1)//3)) AS k FROM s2) " +
        "SELECT doc_id, CAST(k+1 AS INTEGER) AS snippet_id, " +
        "array_to_string(sents[k*3+1 : k*3+5], ' ') AS snippet_text " +
        "FROM sn ORDER BY doc_id, snippet_id"),
    "q_page_link" ->
      "SELECT doc_id, source || '#page=' || CAST(doc_id AS VARCHAR) AS page_link FROM documents ORDER BY doc_id",
    "q_render_info" ->
      "SELECT doc_id, printf('doc_id : %d | lang : %s | n_chars : %d', doc_id, lang, n_chars) AS info FROM documents ORDER BY doc_id",
    "q_date_funcs" ->
      "SELECT o_orderkey, CAST(o_orderdate AS DATE) AS order_date, CAST(year(o_orderdate) AS BIGINT) AS order_year, strftime(o_orderdate, '%Y-%m-%d') AS order_iso, CAST(o_orderdate AS DATE) + 30 AS due_date, CAST(o_orderdate AS DATE) < DATE '1997-06-01' AS is_old FROM orders ORDER BY o_orderkey LIMIT 1000",
    "q_union_restore" ->
      "SELECT DISTINCT r_regionkey, r_name FROM (SELECT r_regionkey, r_name FROM region UNION ALL SELECT r_regionkey, r_name FROM region) ORDER BY r_regionkey",
    "q_upsert" ->
      ("SELECT document_name, document_id FROM (" +
        "SELECT r_name AS document_name, CAST(r_regionkey AS BIGINT) AS document_id FROM region " +
        "UNION ALL SELECT document_name, document_id FROM " +
        "(VALUES ('AFRICA', CAST(100 AS BIGINT)), ('AMERICA', 101), ('NEW_REGION', 102)) t(document_name, document_id) " +
        "WHERE document_name NOT IN (SELECT r_name FROM region)) " +
        "ORDER BY document_id, document_name"),
    "q_status_update" ->
      "SELECT doc_id, CASE WHEN doc_id = 7 THEN 'Archived' ELSE 'Active' END AS document_status FROM documents ORDER BY doc_id",
    "q_expiry_sweep" ->
      "SELECT CASE WHEN o_orderdate < TIMESTAMP '1996-01-01 00:00:00' THEN 'Expired' ELSE 'Active' END AS document_status, count(*) AS n FROM orders GROUP BY 1 ORDER BY 1",
    "q_delete_doc" ->
      "SELECT doc_id FROM documents WHERE NOT (doc_id = 3) ORDER BY doc_id",
    "q_delete_category" ->
      "SELECT c_custkey, c_nationkey FROM customer WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation WHERE n_name = 'NATION_3') ORDER BY c_custkey",
    "q_batch_delete" ->
      "SELECT doc_id, lang FROM documents WHERE doc_id NOT IN (1, 2, 5, 8) ORDER BY doc_id",
    "q_truncate" ->
      "SELECT doc_id, lang FROM documents WHERE 1 = 0",
    "q_dim_insert" ->
      ("SELECT category_id, category_name FROM (" +
        "SELECT CAST(r_regionkey AS BIGINT) AS category_id, r_name AS category_name FROM region " +
        "UNION ALL SELECT category_id, category_name FROM " +
        "(VALUES (CAST(100 AS BIGINT), 'AFRICA'), (101, 'BRAND_NEW_CATEGORY')) t(category_id, category_name) " +
        "WHERE category_name NOT IN (SELECT r_name FROM region)) " +
        "ORDER BY category_id"),
    "q_token_count" ->
      ("SELECT doc_id, CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens, " +
        "CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_tokens_bpe FROM documents ORDER BY doc_id"),
    "q_quality" ->
      ("WITH t AS (SELECT doc_id, text, length(text) AS len, " +
        "string_split_regex(trim(text), '\\s+') AS w FROM documents), " +
        "q AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens, " +
        "(CAST(len AS DOUBLE) - (len(w) - 1)) / len(w) AS avg_token_len_raw, " +
        "(CAST(len AS DOUBLE) - length(regexp_replace(text, '[.!?,;:]', '', 'g'))) / len AS punct_ratio, " +
        "CAST(len(list_filter(w, x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE) / len(w) AS stopword_ratio_raw, " +
        "len(w) AS nw FROM t) " +
        "SELECT doc_id, n_tokens, round(avg_token_len_raw, 6) AS avg_token_len, " +
        "round(stopword_ratio_raw, 6) AS stopword_ratio, " +
        "round(least(1.0, CAST(nw AS DOUBLE) / 100.0) * 0.5 + stopword_ratio_raw * 0.3 + (1.0 - punct_ratio) * 0.2, 6) AS quality_score " +
        "FROM q ORDER BY doc_id"),
    "q_langid" ->
      ("WITH t AS (SELECT doc_id, lang, string_split_regex(trim(text), '\\s+') AS w FROM documents), " +
        "h AS (SELECT doc_id, lang, " +
        "CAST(len(list_filter(w, x -> x IN ('the','a','of','and','to','in','is'))) AS BIGINT) AS en, " +
        "CAST(len(list_filter(w, x -> x IN ('el','la','de','y','en','es','un'))) AS BIGINT) AS es, " +
        "CAST(len(list_filter(w, x -> x IN ('der','die','das','und','ist','ein','zu'))) AS BIGINT) AS de, " +
        "CAST(len(list_filter(w, x -> x IN ('le','la','et','de','un','est','en'))) AS BIGINT) AS fr FROM t) " +
        "SELECT doc_id, lang, CASE WHEN greatest(en, es, de, fr) = 0 THEN 'und' " +
        "WHEN en >= es AND en >= de AND en >= fr THEN 'en' " +
        "WHEN es >= de AND es >= fr THEN 'es' WHEN de >= fr THEN 'de' ELSE 'fr' END AS lang_pred " +
        "FROM h ORDER BY doc_id"),
    "q_fingerprint" ->
      ("SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        "list_transform(generate_series(1, length(text)), i -> CAST(ascii(text[i]) AS BIGINT))), " +
        "(a, c) -> (a * 31 + c) % 1000000007) AS fp FROM documents ORDER BY doc_id"),
    "q_text_stats" ->
      ("WITH t AS (SELECT lang, n_chars, CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS nt FROM documents) " +
        "SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars, " +
        "CAST(sum(nt) AS BIGINT) AS total_tokens, " +
        "round(CAST(sum(n_chars) AS DOUBLE) / count(*), 6) AS avg_chars, " +
        "min(nt) AS min_tokens, max(nt) AS max_tokens FROM t GROUP BY lang ORDER BY lang"),
    "q_dedup_exact" ->
      ("WITH allc AS (SELECT doc_id, text FROM documents " +
        "UNION ALL SELECT doc_id + 1000000, text FROM documents) " +
        "SELECT min(doc_id) AS doc_id, count(*) AS n_copies FROM allc GROUP BY text ORDER BY doc_id"),
    "q_dedup_ngram" -> s"WITH $ngramOracleCtes $ngramOraclePairs ORDER BY doc_a, doc_b",
    // at sf0.01 the router provably picks the exact inverted strategy (pairs
    // per doc far under budget), so the exact pair oracle applies; the
    // pinned 'inverted' literal makes a silent branch flip a loud hash FAIL
    "q_dedup_auto" ->
      (s"WITH $ngramOracleCtes SELECT doc_a, doc_b, jaccard, 'inverted' AS strategy " +
        s"FROM ($ngramOraclePairs) ORDER BY doc_a, doc_b"),
    "q_cross_dedup" ->
      ("WITH lw AS (SELECT doc_id, text FROM documents WHERE source = 'src0' AND doc_id < 500 " +
        "UNION ALL SELECT doc_id + 3000000, text FROM documents " +
        "WHERE source <> 'src0' AND doc_id % 40 = 1 AND doc_id < 500), " +
        "rw AS (SELECT doc_id, text FROM documents WHERE source <> 'src0'), " +
        "l1 AS (SELECT doc_id, list_distinct([words[i] || ' ' || words[i+1] || ' ' || words[i+2] " +
        "for i in generate_series(1, len(words) - 2)]) AS s FROM " +
        "(SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words FROM lw) WHERE len(words) >= 3), " +
        "r1 AS (SELECT doc_id, list_distinct([words[i] || ' ' || words[i+1] || ' ' || words[i+2] " +
        "for i in generate_series(1, len(words) - 2)]) AS s FROM " +
        "(SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words FROM rw) WHERE len(words) >= 3), " +
        "lp AS (SELECT doc_id AS doc_a, unnest(s) AS shingle FROM l1), " +
        "rp AS (SELECT doc_id AS doc_b, unnest(s) AS shingle FROM r1), " +
        "cm AS (SELECT doc_a, doc_b, count(*) AS common FROM lp JOIN rp USING (shingle) GROUP BY 1, 2) " +
        "SELECT doc_a, doc_b, round(CAST(common AS DOUBLE) / (sa.n + sb.n - common), 6) AS jaccard " +
        "FROM cm JOIN (SELECT doc_id, CAST(len(s) AS BIGINT) AS n FROM l1) sa ON doc_a = sa.doc_id " +
        "JOIN (SELECT doc_id, CAST(len(s) AS BIGINT) AS n FROM r1) sb ON doc_b = sb.doc_id " +
        "WHERE CAST(common AS DOUBLE) / (sa.n + sb.n - common) >= 0.5 ORDER BY doc_a, doc_b"),
    "q_dedup_clusters" ->
      (s"WITH RECURSIVE $ngramOracleCtes, " +
        s"pairs AS ($ngramOraclePairs), " +
        "edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs " +
        "UNION ALL SELECT doc_b, doc_a FROM pairs), " +
        "reach AS (SELECT src, src AS lbl FROM (SELECT DISTINCT src FROM edges) " +
        "UNION SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.src) " +
        "SELECT src AS doc_id, min(lbl) AS cluster_id, min(lbl) = src AS survivor " +
        "FROM reach GROUP BY src ORDER BY doc_id"),
    "q_sample_stratified" ->
      ("SELECT doc_id, lang FROM documents WHERE list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        "list_transform(generate_series(1, length(text)), i -> CAST(ascii(text[i]) AS BIGINT))), " +
        "(a, c) -> (a * 31 + c) % 1000000007) % 8 = 0 ORDER BY doc_id"),
    "q_curate" ->
      (s"WITH RECURSIVE $ngramOracleCtes, " +
        s"pairs AS ($ngramOraclePairs), " +
        "edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs " +
        "UNION ALL SELECT doc_b, doc_a FROM pairs), " +
        "reach AS (SELECT src, src AS lbl FROM (SELECT DISTINCT src FROM edges) " +
        "UNION SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.src), " +
        "dropped AS (SELECT src AS doc_id FROM reach GROUP BY src HAVING min(lbl) <> src), " +
        "qt AS (SELECT doc_id, text, length(text) AS len, " +
        "string_split_regex(trim(text), '\\s+') AS wq FROM documents), " +
        "q AS (SELECT doc_id, CAST(len(wq) AS BIGINT) AS n_tokens, " +
        "(CAST(len AS DOUBLE) - length(regexp_replace(text, '[.!?,;:]', '', 'g'))) / len AS punct_ratio, " +
        "CAST(len(list_filter(wq, x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE) / len(wq) AS stopword_ratio_raw, " +
        "len(wq) AS nw, wq FROM qt), " +
        "qs AS (SELECT doc_id, n_tokens, round(least(1.0, CAST(nw AS DOUBLE) / 100.0) * 0.5 " +
        "+ stopword_ratio_raw * 0.3 + (1.0 - punct_ratio) * 0.2, 6) AS quality_score, " +
        "CAST(len(list_filter(wq, x -> x IN ('the','a','of','and','to','in','is'))) AS BIGINT) AS en, " +
        "CAST(len(list_filter(wq, x -> x IN ('el','la','de','y','en','es','un'))) AS BIGINT) AS es, " +
        "CAST(len(list_filter(wq, x -> x IN ('der','die','das','und','ist','ein','zu'))) AS BIGINT) AS de, " +
        "CAST(len(list_filter(wq, x -> x IN ('le','la','et','de','un','est','en'))) AS BIGINT) AS fr FROM q), " +
        "lp AS (SELECT doc_id, n_tokens, quality_score, " +
        "CASE WHEN greatest(en, es, de, fr) = 0 THEN 'und' " +
        "WHEN en >= es AND en >= de AND en >= fr THEN 'en' " +
        "WHEN es >= de AND es >= fr THEN 'es' WHEN de >= fr THEN 'de' ELSE 'fr' END AS lang_pred FROM qs) " +
        "SELECT doc_id, lang_pred, n_tokens, quality_score FROM lp " +
        "WHERE quality_score >= 0.5 AND lang_pred <> 'und' " +
        "AND doc_id NOT IN (SELECT doc_id FROM dropped) ORDER BY doc_id"),
    "q_split" ->
      ("WITH f AS (SELECT text, list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        "list_transform(generate_series(1, length(text)), i -> CAST(ascii(text[i]) AS BIGINT))), " +
        "(a, c) -> (a * 31 + c) % 1000000007) % 10 AS r FROM documents) " +
        "SELECT CASE WHEN r = 0 THEN 'test' WHEN r = 1 THEN 'val' ELSE 'train' END AS split, " +
        "count(*) AS n_docs, " +
        "CAST(sum(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT) AS total_tokens " +
        "FROM f GROUP BY 1 ORDER BY 1"),
    "q_cdc_diff" ->
      ("WITH v1 AS (SELECT doc_id, text FROM documents), " +
        "v2 AS (SELECT doc_id, CASE WHEN doc_id % 31 = 0 THEN text || ' EDITED' ELSE text END AS text " +
        "FROM v1 WHERE doc_id % 97 <> 0 " +
        "UNION ALL SELECT doc_id + 1000000, text FROM v1 WHERE doc_id < 10), " +
        "o AS (SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        "list_transform(generate_series(1, length(text)), i -> CAST(ascii(text[i]) AS BIGINT))), " +
        "(a, c) -> (a * 31 + c) % 1000000007) AS fp_old FROM v1), " +
        "n AS (SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        "list_transform(generate_series(1, length(text)), i -> CAST(ascii(text[i]) AS BIGINT))), " +
        "(a, c) -> (a * 31 + c) % 1000000007) AS fp_new FROM v2), " +
        "j AS (SELECT coalesce(o.doc_id, n.doc_id) AS doc_id, fp_old, fp_new " +
        "FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id) " +
        "SELECT doc_id, CASE WHEN fp_old IS NULL THEN 'added' " +
        "WHEN fp_new IS NULL THEN 'deleted' " +
        "WHEN fp_old <> fp_new THEN 'changed' ELSE 'unchanged' END AS change " +
        "FROM j WHERE fp_old IS NULL OR fp_new IS NULL OR fp_old <> fp_new " +
        "ORDER BY doc_id"),
    "q_percentiles" ->
      ("SELECT o_orderpriority, round(quantile_cont(o_totalprice, 0.5), 6) AS p50, " +
        "round(quantile_cont(o_totalprice, 0.9), 6) AS p90, count(*) AS n " +
        "FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"),
    "q_pack_sequences" ->
      ("WITH t AS (SELECT lang, doc_id, CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens FROM documents), " +
        "s AS (SELECT lang, doc_id, n_tokens, CAST(coalesce(sum(n_tokens) OVER (PARTITION BY lang " +
        "ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_token FROM t) " +
        "SELECT lang, doc_id, n_tokens, start_token // 2048 AS bin_id, start_token % 2048 AS bin_offset " +
        "FROM s ORDER BY doc_id"),
    "q_topk" ->
      ("WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS q_emb FROM embeddings WHERE vec_id < 5), " +
        "s AS (SELECT q.q_id, e.vec_id AS n_id, " +
        "round(list_cosine_similarity(q.q_emb, CAST(e.embedding AS DOUBLE[])), 6) AS score " +
        "FROM embeddings e, q WHERE e.vec_id <> q.q_id) " +
        "SELECT q_id, CAST(row_number() OVER (PARTITION BY q_id ORDER BY score DESC, n_id) AS BIGINT) AS rank, n_id, score " +
        "FROM s QUALIFY rank <= 10 ORDER BY q_id, rank"),
    "q_hard_negatives" ->
      ("WITH q AS (SELECT vec_id AS q_id, label AS q_label, " +
        "CAST(embedding AS DOUBLE[]) AS q_emb FROM embeddings WHERE vec_id < 10), " +
        "s AS (SELECT q.q_id, e.vec_id AS n_id, e.label AS n_label, " +
        "round(list_cosine_similarity(q.q_emb, CAST(e.embedding AS DOUBLE[])), 6) AS score " +
        "FROM embeddings e, q WHERE e.label <> q.q_label) " +
        "SELECT q_id, CAST(row_number() OVER (PARTITION BY q_id ORDER BY score DESC, n_id) " +
        "AS BIGINT) AS rank, n_id, n_label, score " +
        "FROM s QUALIFY rank <= 5 ORDER BY q_id, rank"),
    "q_embed_dup" ->
      ("SELECT a.vec_id AS id_a, b.vec_id AS id_b, " +
        "round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS score " +
        "FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id " +
        "WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) >= 0.4 " +
        "ORDER BY id_a, id_b"),
    "q_event_window" ->
      ("SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n, " +
        "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value " +
        "FROM events GROUP BY 1, 2 ORDER BY 1, 2"),
    "q_sessionize" ->
      ("WITH e AS (SELECT user_id, event_id, ts, " +
        "lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts FROM events), " +
        "f AS (SELECT user_id, event_id, ts, CASE WHEN prev_ts IS NULL OR " +
        "epoch_us(ts) - epoch_us(prev_ts) > 1800000000 THEN 1 ELSE 0 END AS ns FROM e), " +
        "g AS (SELECT user_id, ts, CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id FROM f) " +
        "SELECT user_id, session_id, count(*) AS n_events, min(ts) AS session_start, max(ts) AS session_end " +
        "FROM g GROUP BY user_id, session_id ORDER BY user_id, session_id"),
    "q_top_users" ->
      ("WITH c AS (SELECT event_type, user_id, count(*) AS n FROM events GROUP BY 1, 2) " +
        "SELECT event_type, CAST(row_number() OVER (PARTITION BY event_type ORDER BY n DESC, user_id) AS BIGINT) AS rank, user_id, n " +
        "FROM c QUALIFY rank <= 3 ORDER BY event_type, rank"),
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
    "q_dispatch" ->
      ("SELECT document_id, category_id FROM (" +
        "SELECT doc_id AS document_id, CAST(doc_id % 5 AS INTEGER) AS category_id FROM documents " +
        "WHERE doc_id <> 3 AND doc_id % 5 <> 4 " +
        "UNION ALL SELECT CAST(9001 AS BIGINT), CAST(2 AS INTEGER)) ORDER BY document_id"),
    "q_ingest_flatten" ->
      ("WITH w AS (SELECT doc_id, lang, source, string_split_regex(trim(text), '\\s+') AS words FROM documents), " +
        "j AS (SELECT w.*, r_name AS category_name FROM w LEFT JOIN region ON doc_id % 5 = r_regionkey), " +
        "pg AS (SELECT doc_id, category_name, source, words, " +
        "unnest(generate_series(0, (len(words)-1)//40)) AS p FROM j), " +
        "pw AS (SELECT doc_id, category_name, CAST(p+1 AS INTEGER) AS page_number, " +
        "source || '#page=' || CAST(p+1 AS VARCHAR) AS page_link, " +
        "words[p*40+1 : p*40+40] AS pwords FROM pg), " +
        "sn AS (SELECT doc_id, category_name, page_number, page_link, pwords, " +
        "unnest(generate_series(0, (len(pwords)-1)//3)) AS k FROM pw) " +
        "SELECT doc_id AS document_id, category_name, page_number, CAST(k+1 AS INTEGER) AS snippet_id, " +
        "array_to_string(pwords[k*3+1 : k*3+5], ' ') AS snippet_text, page_link " +
        "FROM sn ORDER BY document_id, page_number, snippet_id"),
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
    // KN-perplexity filter: per-doc score under the corpus's own
    // interpolated-KN bigram model. p_kn stays an exact integer rational
    // ((4n-3)db + 3·d1·c2) / (4·n1·db); the only doubles are one IEEE
    // division and ln() rounded 6dp per DISTINCT bigram (the
    // q_perplexity discipline), summed as DECIMAL per document
    "q_kn_score" ->
      ("WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents), " +
        "bg AS (SELECT doc_id, unnest([struct_pack(w1 := w[i], w2 := w[i+1]) " +
        "for i in generate_series(1, len(w) - 1)]) AS z FROM t WHERE len(w) >= 2), " +
        "p AS (SELECT doc_id, z.w1 AS w1, z.w2 AS w2 FROM bg), " +
        "c12 AS (SELECT w1, w2, count(*) AS n FROM p GROUP BY 1, 2), " +
        "st AS (SELECT w1, w2, n, sum(n) OVER (PARTITION BY w1) AS n1, " +
        "count(*) OVER (PARTITION BY w1) AS d1, " +
        "count(*) OVER (PARTITION BY w2) AS c2, count(*) OVER () AS db FROM c12), " +
        "lp AS (SELECT w1, w2, CAST(round(ln(CAST((4 * n - 3) * db + 3 * d1 * c2 AS DOUBLE) / " +
        "CAST(4 * n1 * db AS DOUBLE)), 6) AS DECIMAL(18,6)) AS lp FROM st) " +
        "SELECT p.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams, " +
        "round(exp(-CAST(sum(lp.lp) AS DOUBLE) / count(*)), 4) AS kn_ppl " +
        "FROM p JOIN lp USING (w1, w2) GROUP BY p.doc_id ORDER BY doc_id"),
    // HNSW recall gate, the q_ann_recall coupling: n_exact = k(10) x the
    // vec_id < 20 panel; the boolean pins the sharded-graph fan-out
    // (measured recall ~0.97-1.0 at gate sizes; 0.7 bar)
    "q_hnsw_recall" ->
      ("SELECT CAST(10 * count(*) AS BIGINT) AS n_exact, " +
        "TRUE AS hnsw_recall_ok FROM embeddings WHERE vec_id < 20"),
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
    // span corruption: the oracle rebuilds sentinel numbering with a
    // gaps-and-islands window over the same deterministic mask rule
    // ((doc_id*31 + i*17) % 5 = 0), then string_aggs input/target in
    // token order — run off-by-ones, mask-phase and numbering defects
    // all hash-mismatch
    "q_span_corrupt" ->
      ("WITH l AS (SELECT doc_id, list_filter(string_split_regex(trim(coalesce(text, '')), '\\s+'), x -> x <> '') AS toks FROM documents), " +
        "tok AS (SELECT doc_id, unnest(toks) AS token, unnest(generate_series(0, len(toks) - 1)) AS i FROM l WHERE len(toks) > 0), " +
        "m AS (SELECT doc_id, token, i, (doc_id * 31 + i * 17) % 5 = 0 AS msk FROM tok), " +
        "r AS (SELECT *, CASE WHEN msk AND NOT coalesce(lag(msk) OVER (PARTITION BY doc_id ORDER BY i), false) THEN 1 ELSE 0 END AS new_run FROM m), " +
        "k AS (SELECT *, sum(new_run) OVER (PARTITION BY doc_id ORDER BY i) - 1 AS run_k FROM r), " +
        "agg AS (SELECT doc_id, " +
        "string_agg(CASE WHEN NOT msk THEN token WHEN new_run = 1 THEN '<extra_id_' || run_k || '>' END, ' ' ORDER BY i) AS input_text, " +
        "string_agg(CASE WHEN msk THEN (CASE WHEN new_run = 1 THEN '<extra_id_' || run_k || '> ' ELSE '' END) || token END, ' ' ORDER BY i) AS target_text, " +
        "CAST(coalesce(sum(CASE WHEN msk THEN 1 END), 0) AS BIGINT) AS n_masked " +
        "FROM k GROUP BY doc_id) " +
        "SELECT d.doc_id, coalesce(a.input_text, '') AS input_text, " +
        "coalesce(a.target_text, '') AS target_text, " +
        "coalesce(a.n_masked, CAST(0 AS BIGINT)) AS n_masked " +
        "FROM documents d LEFT JOIN agg a USING (doc_id) ORDER BY d.doc_id"),
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
    "q_nested_project" ->
      ("WITH w AS (SELECT doc_id, lang, source, string_split_regex(trim(text), '\\s+') AS words FROM documents) " +
        "SELECT doc_id AS document_id, CAST((len(words)-1)//40 + 1 AS BIGINT) AS n_pages, " +
        "source || '#page=1' AS first_page_link, lang AS first_tag, lang AS meta_lang, " +
        "CAST(list_sum([(len(words[p*40+1 : p*40+40]) - 1)//3 + 1 " +
        "for p in generate_series(0, (len(words)-1)//40)]) AS BIGINT) AS n_snippets " +
        "FROM w ORDER BY document_id"),
    "q_outer_join" ->
      ("SELECT n_nationkey, n_name, r_name AS region_name FROM nation " +
        "LEFT JOIN region ON n_regionkey = r_regionkey AND r_regionkey < 3 ORDER BY n_nationkey"),
    "q_rollup" ->
      ("SELECT l_returnflag, l_linestatus, count(*) AS n, " +
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty FROM lineitem " +
        "GROUP BY ROLLUP (l_returnflag, l_linestatus) " +
        "ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"),
    "q_distinct_count" ->
      "SELECT count(DISTINCT l_partkey) AS n_parts, count(DISTINCT l_suppkey) AS n_supps FROM lineitem",
    // the sketch value cannot cross engines; the exact counts and the
    // within-tolerance booleans (TRUE iff the HLL estimate sits within 5%)
    // replay exactly — see Advanced.qApproxDistinct
    "q_approx_distinct" ->
      ("SELECT count(DISTINCT l_partkey) AS n_parts, count(DISTINCT l_suppkey) AS n_supps, " +
        "TRUE AS parts_within_5pct, TRUE AS supps_within_5pct FROM lineitem"),
    "q_running_sum" ->
      ("SELECT o_custkey, o_orderkey, o_orderdate, " +
        "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey " +
        "ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total " +
        "FROM orders WHERE o_custkey < 50 ORDER BY o_custkey, o_orderkey"),
    "q_asof_join" ->
      ("SELECT event_id, user_id, ts, last_click_id FROM (" +
        "SELECT event_id, user_id, ts, event_type, " +
        "last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS) " +
        "OVER (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_id " +
        "FROM events WHERE event_type IN ('click','error')) " +
        "WHERE event_type = 'error' ORDER BY event_id"),
    "q_range_join" ->
      ("WITH p AS (SELECT user_id, event_id AS purchase_id, ts AS p_ts FROM events WHERE event_type = 'purchase'), " +
        "c AS (SELECT user_id, ts AS c_ts FROM events WHERE event_type = 'click') " +
        "SELECT purchase_id, count(c_ts) AS n_recent_clicks " +
        "FROM p LEFT JOIN c ON p.user_id = c.user_id AND c_ts <= p_ts AND c_ts > p_ts - INTERVAL 5 MINUTE " +
        "GROUP BY purchase_id ORDER BY purchase_id"),
    "q_shuffle_join" ->
      ("SELECT o_orderpriority, count(*) AS n_items, " +
        "CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(38,4))) AS DOUBLE) AS revenue " +
        "FROM orders JOIN lineitem ON o_orderkey = l_orderkey GROUP BY o_orderpriority ORDER BY o_orderpriority"),
    "q_variance" ->
      ("SELECT l_returnflag, round(var_samp(l_quantity), 6) AS var_qty, " +
        "round(stddev_samp(l_quantity), 6) AS std_qty, " +
        "round(var_samp(l_discount), 6) AS var_disc, count(*) AS n " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
    "q_salted_join" ->
      ("SELECT o_orderpriority, count(*) AS n_items, " +
        "CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(38,4))) AS DOUBLE) AS revenue " +
        "FROM orders JOIN lineitem ON o_orderkey = l_orderkey GROUP BY o_orderpriority ORDER BY o_orderpriority"),
    "q_session_window" ->
      // session_window joins an event while ts < previous window END
      // (half-open), so a gap of EXACTLY 30 min starts a new session: >=
      ("WITH e AS (SELECT user_id, event_id, ts, " +
        "lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts FROM events), " +
        "f AS (SELECT user_id, event_id, ts, CASE WHEN prev_ts IS NULL OR " +
        "epoch_us(ts) - epoch_us(prev_ts) >= 1800000000 THEN 1 ELSE 0 END AS ns FROM e), " +
        "g AS (SELECT user_id, ts, event_id, CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid FROM f) " +
        "SELECT user_id, count(*) AS n_events, min(ts) AS session_start, max(ts) AS session_end " +
        "FROM g GROUP BY user_id, sid ORDER BY user_id, session_start"),
    "q_regex_extract" ->
      ("SELECT event_id, CAST(regexp_extract(props, '\"k\": (\\d+)', 1) AS BIGINT) AS k " +
        "FROM events ORDER BY event_id LIMIT 2000"),
    "q_sql_api" ->
      ("SELECT o_orderkey, CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) " +
        "* (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue, count(*) AS n_items " +
        "FROM customer JOIN orders ON c_custkey = o_custkey JOIN lineitem ON l_orderkey = o_orderkey " +
        "WHERE c_mktsegment = 'BUILDING' AND o_orderstatus = 'O' " +
        "GROUP BY o_orderkey ORDER BY o_orderkey LIMIT 500"),
    "q_cube" ->
      ("SELECT o_orderstatus, o_orderpriority, count(*) AS n FROM orders " +
        "GROUP BY CUBE (o_orderstatus, o_orderpriority) " +
        "ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST"),
    "q_window_funcs" ->
      ("SELECT o_custkey, o_orderkey, " +
        "lag(o_orderkey) OVER w AS prev_order, lead(o_orderkey) OVER w AS next_order, " +
        "CAST(ntile(4) OVER w AS BIGINT) AS quartile, " +
        "round(percent_rank() OVER w, 6) AS pct_rank " +
        "FROM orders WHERE o_custkey < 30 " +
        "WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) " +
        "ORDER BY o_custkey, o_orderkey"),
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
    "q_resample" ->
      ("WITH b AS (SELECT date_trunc('hour', min(ts)) AS t0, date_trunc('hour', max(ts)) AS t1 FROM events), " +
        "spine AS (SELECT unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS hour FROM b), " +
        "p AS (SELECT date_trunc('hour', ts) AS hour, count(*) AS n, " +
        "sum(CAST(value AS DECIMAL(18,2))) AS sv FROM events " +
        "WHERE event_type = 'purchase' AND user_id < 50 GROUP BY 1), " +
        "f AS (SELECT spine.hour, coalesce(p.n, 0) AS n, " +
        "coalesce(p.sv, CAST(0 AS DECIMAL(18,2))) AS sv FROM spine LEFT JOIN p USING (hour)) " +
        "SELECT hour, n, CAST(sv AS DOUBLE) AS total, " +
        "CAST(sum(n) OVER w AS BIGINT) AS n_24h, " +
        "CAST(sum(sv) OVER w AS DOUBLE) AS total_24h " +
        "FROM f WINDOW w AS (ORDER BY hour ROWS BETWEEN 23 PRECEDING AND CURRENT ROW) " +
        "ORDER BY hour"),
    "q_funnel" ->
      ("WITH s1 AS (SELECT user_id, ts, event_type, " +
        "min(CASE WHEN event_type = 'view' THEN ts END) OVER (PARTITION BY user_id) AS t1 FROM events), " +
        "s2 AS (SELECT *, min(CASE WHEN event_type = 'click' AND ts >= t1 THEN ts END) " +
        "OVER (PARTITION BY user_id) AS t2 FROM s1), " +
        "s3 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND ts >= t2 THEN ts END) " +
        "OVER (PARTITION BY user_id) AS t3 FROM s2) " +
        "SELECT user_id, min(t1) AS t1, min(t2) AS t2, min(t3) AS t3, " +
        "CAST(CASE WHEN min(t3) IS NOT NULL THEN 3 WHEN min(t2) IS NOT NULL THEN 2 " +
        "WHEN min(t1) IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS depth " +
        "FROM s3 GROUP BY user_id ORDER BY user_id"),
    "q_retention" ->
      ("WITH f AS (SELECT user_id, ts, min(ts) OVER (PARTITION BY user_id) AS first_ts FROM events) " +
        "SELECT CAST(first_ts AS DATE) AS cohort_day, " +
        "CAST((epoch_us(ts) - epoch_us(first_ts)) // 604800000000 AS BIGINT) AS week_offset, " +
        "count(DISTINCT user_id) AS n_users " +
        "FROM f GROUP BY 1, 2 ORDER BY cohort_day, week_offset"),
    "q_anomaly" ->
      ("WITH m AS (SELECT event_id, user_id, value, " +
        "count(value) OVER w AS n, " +
        "CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS s1, " +
        "CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)) " +
        "AS DECIMAL(38,4))) OVER w AS DOUBLE) AS s2 " +
        "FROM events WINDOW w AS (PARTITION BY user_id)) " +
        "SELECT event_id, user_id, value, " +
        "round((value - s1/n) / sqrt(s2/n - (s1/n)*(s1/n)), 6) AS z " +
        "FROM m WHERE n >= 3 AND (s2/n - (s1/n)*(s1/n)) > 0 " +
        "AND abs((value - s1/n) / sqrt(s2/n - (s1/n)*(s1/n))) > 3.0 " +
        "ORDER BY event_id"),
    "q_transitions" ->
      ("WITH t AS (SELECT user_id, event_type, lead(event_type) OVER " +
        "(PARTITION BY user_id ORDER BY ts, event_id) AS next_type FROM events), " +
        "c AS (SELECT event_type AS from_type, next_type AS to_type, count(*) AS n " +
        "FROM t WHERE next_type IS NOT NULL GROUP BY 1, 2) " +
        "SELECT from_type, to_type, n, " +
        "round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY from_type), 6) AS p " +
        "FROM c ORDER BY from_type NULLS FIRST, to_type NULLS FIRST"),
    "q_setops" ->
      ("SELECT custkey, 'no_orders' AS tag FROM " +
        "(SELECT c_custkey AS custkey FROM customer EXCEPT SELECT o_custkey FROM orders) " +
        "UNION ALL " +
        "SELECT custkey, 'with_orders' AS tag FROM " +
        "(SELECT c_custkey AS custkey FROM customer INTERSECT SELECT o_custkey FROM orders) " +
        "ORDER BY tag, custkey"),
    "q_reservoir" ->
      ("SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        "list_transform(generate_series(1, length(text)), i -> CAST(ascii(text[i]) AS BIGINT))), " +
        "(a, c) -> (a * 31 + c) % 1000000007) AS h FROM documents ORDER BY h, doc_id LIMIT 64"),
    "q_pivot" ->
      ("SELECT user_id % 5 AS user_bucket, " +
        "count(*) FILTER (WHERE event_type = 'click') AS click, " +
        "count(*) FILTER (WHERE event_type = 'view') AS \"view\", " +
        "count(*) FILTER (WHERE event_type = 'signup') AS signup, " +
        "count(*) FILTER (WHERE event_type = 'purchase') AS purchase, " +
        "count(*) FILTER (WHERE event_type = 'error') AS error " +
        "FROM events GROUP BY 1 ORDER BY user_bucket"),
    "q_grouping_sets" ->
      ("SELECT l_returnflag, l_linestatus, " +
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, count(*) AS n " +
        "FROM lineitem GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ()) " +
        "ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"),
    "q_corr" ->
      ("WITH m AS (SELECT l_returnflag, count(*) AS n, " +
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx, " +
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy, " +
        "CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS DOUBLE) AS sxy, " +
        "CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS DOUBLE) AS sxx, " +
        "CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS DOUBLE) AS syy " +
        "FROM lineitem GROUP BY 1), " +
        "mm AS (SELECT l_returnflag, n, sx, sy, sxy, sxx, syy, CAST(n AS DOUBLE) AS nd, " +
        "sx / CAST(n AS DOUBLE) AS mx, sy / CAST(n AS DOUBLE) AS my FROM m) " +
        "SELECT l_returnflag, n, " +
        "round((sxy / nd - mx * my) / sqrt((sxx / nd - mx * mx) * (syy / nd - my * my)), 6) AS corr_qty_price, " +
        "round((sxy - sx * sy / nd) / (nd - 1), 6) AS covar_qty_price " +
        "FROM mm ORDER BY l_returnflag"),
    "q_histogram" ->
      ("SELECT bin, CAST(bin * 50000 AS DOUBLE) AS bin_lo, count(*) AS n, " +
        "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total " +
        "FROM (SELECT CAST(least(floor(o_totalprice / 50000.0), 9.0) AS BIGINT) AS bin, o_totalprice FROM orders) " +
        "GROUP BY bin ORDER BY bin"),
    "q_json" ->
      ("SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events " +
        "WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50 ORDER BY event_id"),
    "q_tfidf" ->
      ("WITH toks AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS term FROM documents), " +
        "tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2), " +
        "dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1), " +
        "nn AS (SELECT CAST(count(*) AS DOUBLE) AS nd FROM documents), " +
        "scored AS (SELECT doc_id, term, round(tf * ln(nd / df), 6) AS score " +
        "FROM tf JOIN dfq USING (term), nn), " +
        "ranked AS (SELECT doc_id, term, score, " +
        "CAST(row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS BIGINT) AS rank FROM scored) " +
        "SELECT doc_id, rank, term, score FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank"),
    "q_bm25" ->
      ("WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words FROM documents), " +
        "stats AS (SELECT CAST(count(*) AS DOUBLE) AS nd, " +
        "CAST(sum(len(words)) AS DOUBLE) / count(*) AS avgdl FROM w), " +
        "toks AS (SELECT doc_id, CAST(len(words) AS BIGINT) AS dl, unnest(words) AS term FROM w), " +
        "tf AS (SELECT doc_id, dl, term, count(*) AS tf FROM toks " +
        "WHERE term IN ('spark', 'merge', 'window') GROUP BY 1, 2, 3), " +
        "dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1), " +
        "parts AS (SELECT doc_id, term, " +
        "ln(1.0 + (nd - df + 0.5) / (df + 0.5)) * (tf * CAST(2.2 AS DOUBLE)) / " +
        "(tf + 1.2 * (0.25 + 0.75 * dl / avgdl)) AS part " +
        "FROM tf JOIN dfq USING (term), stats), " +
        "agg AS (SELECT doc_id, round(" +
        "coalesce(max(CASE WHEN term = 'spark' THEN part END), 0) + " +
        "coalesce(max(CASE WHEN term = 'merge' THEN part END), 0) + " +
        "coalesce(max(CASE WHEN term = 'window' THEN part END), 0), 6) AS bm25 " +
        "FROM parts GROUP BY 1) " +
        "SELECT doc_id, bm25 FROM agg ORDER BY bm25 DESC, doc_id LIMIT 20"),
    "q_contamination" ->
      ("WITH w AS (SELECT doc_id, source, string_split_regex(trim(text), '\\s+') AS words FROM documents), " +
        "sh AS (SELECT doc_id, source, list_distinct([words[i] || ' ' || words[i+1] || ' ' || words[i+2] " +
        "for i in generate_series(1, len(words) - 2)]) AS s FROM w WHERE len(words) >= 3), " +
        "cp AS (SELECT doc_id, unnest(s) AS shingle FROM sh WHERE source <> 'src0'), " +
        "bp AS (SELECT doc_id AS bench_id, unnest(s) AS shingle FROM sh WHERE source = 'src0'), " +
        "cm AS (SELECT cp.doc_id, bp.bench_id, count(*) AS common FROM cp JOIN bp USING (shingle) GROUP BY 1, 2) " +
        "SELECT doc_id, count(*) AS n_bench_docs, max(common) AS max_overlap " +
        "FROM cm WHERE common >= 3 GROUP BY 1 ORDER BY doc_id"),
    "q_repetition" ->
      ("WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words FROM documents), " +
        "tok AS (SELECT doc_id, CAST(len(words) AS BIGINT) AS n_tokens, " +
        "CAST(len(list_distinct(words)) AS BIGINT) AS n_distinct FROM w), " +
        "bg AS (SELECT doc_id, CAST(len(words) AS BIGINT) AS nw, " +
        "unnest([words[i] || ' ' || words[i+1] for i in generate_series(1, len(words) - 1)]) AS bigram " +
        "FROM w WHERE len(words) >= 2), " +
        "bc AS (SELECT doc_id, nw, bigram, count(*) AS c FROM bg GROUP BY 1, 2, 3), " +
        "bt AS (SELECT doc_id, max(c) AS top_bigram_count, max(nw - 1) AS n_bigrams FROM bc GROUP BY 1) " +
        "SELECT t.doc_id, t.n_tokens, " +
        "round(CAST(t.n_tokens - t.n_distinct AS DOUBLE) / t.n_tokens, 6) AS dup_token_frac, " +
        "round(coalesce(CAST(bt.top_bigram_count AS DOUBLE) / bt.n_bigrams, 0.0), 6) AS top_bigram_share " +
        "FROM tok t LEFT JOIN bt ON t.doc_id = bt.doc_id ORDER BY t.doc_id"),
    "q_pii_mask" ->
      ("SELECT c_custkey, regexp_replace(regexp_replace(" +
        "'Contact ' || c_name || ' at user' || CAST(c_custkey AS VARCHAR) || '@example.com or +1-555-' || " +
        "lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0'), " +
        // both patterns come from the engine's source of truth — RE2-safe
        // by construction, so the same text ports verbatim to DuckDB
        s"'${TextAnalysis.EmailRe}', '<EMAIL>', 'g'), " +
        s"'${TextAnalysis.PhoneRe}', '<PHONE>', 'g') AS masked " +
        "FROM customer ORDER BY c_custkey"),
    // Aho-Corasick blocklist: the dictionary is interpolated from the
    // engine's BlocklistPatterns (source of truth); the oracle counts by
    // POSITION SCAN (every i where substr(t,i,|p|) = p), i.e. every
    // occurrence including overlaps and patterns nested inside other
    // patterns' matches ('park' inside 'spark' — visible to the engine
    // only through the automaton's fail links)
    "q_blocklist" ->
      ("WITH p AS (SELECT unnest([" +
        TextAnalysis.BlocklistPatterns.map(p => s"'$p'").mkString(", ") +
        "]) AS pattern), " +
        "d AS (SELECT doc_id, coalesce(text, '') AS t FROM documents), " +
        "m AS (SELECT doc_id, pattern, CAST(list_sum(" +
        "[CASE WHEN substr(t, i, length(pattern)) = pattern THEN 1 ELSE 0 END " +
        "for i in generate_series(1, length(t) - length(pattern) + 1)]) AS BIGINT) AS n_hits " +
        "FROM d, p WHERE length(t) >= length(pattern)) " +
        "SELECT doc_id, pattern, n_hits FROM m WHERE n_hits > 0 " +
        "ORDER BY doc_id, pattern"),
    "q_chunk" ->
      ("WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words FROM documents), " +
        "t AS (SELECT doc_id, CAST(len(words) AS BIGINT) AS n_tokens, words FROM w), " +
        "c AS (SELECT doc_id, n_tokens, words, " +
        "unnest(generate_series(0, (n_tokens - 1) // 48)) AS chunk_id FROM t) " +
        "SELECT doc_id, chunk_id, " +
        "CAST(least(64, n_tokens - chunk_id * 48) AS BIGINT) AS chunk_tokens, " +
        "array_to_string(words[CAST(chunk_id * 48 + 1 AS BIGINT) : CAST(chunk_id * 48 + 64 AS BIGINT)], ' ') AS chunk_text " +
        "FROM c ORDER BY doc_id, chunk_id"),
    "q_curriculum" ->
      ("WITH qt AS (SELECT doc_id, text, length(text) AS len, " +
        "string_split_regex(trim(text), '\\s+') AS wq FROM documents), " +
        "q AS (SELECT doc_id, " +
        "(CAST(len AS DOUBLE) - length(regexp_replace(text, '[.!?,;:]', '', 'g'))) / len AS punct_ratio, " +
        "CAST(len(list_filter(wq, x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE) / len(wq) AS stopword_ratio_raw, " +
        "len(wq) AS nw FROM qt), " +
        "qs AS (SELECT doc_id, round(least(1.0, CAST(nw AS DOUBLE) / 100.0) * 0.5 " +
        "+ stopword_ratio_raw * 0.3 + (1.0 - punct_ratio) * 0.2, 6) AS quality_score FROM q), " +
        "t AS (SELECT list_transform(quantile_cont(quality_score, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]), " +
        "x -> round(x, 6)) AS ts FROM qs) " +
        "SELECT doc_id, quality_score, " +
        "CAST(1 + len(list_filter(t.ts, x -> quality_score >= x)) AS BIGINT) AS decile " +
        "FROM qs, t ORDER BY doc_id"),
    "q_centroids" ->
      ("WITH idx AS (SELECT label, unnest(generate_series(1, len(embedding))) AS i, embedding FROM embeddings), " +
        "e AS (SELECT label, i - 1 AS pos, CAST(embedding[i] AS DOUBLE) AS v FROM idx), " +
        "g AS (SELECT label, pos, count(*) AS n, " +
        "sum(CAST(round(v, 6) AS DECIMAL(18,6))) AS sv FROM e GROUP BY 1, 2), " +
        "u AS (SELECT label, pos, n, CAST(sv * 1000000 AS BIGINT) AS sv_u FROM g) " +
        "SELECT label, pos, CAST(CASE WHEN sv_u >= 0 THEN (2 * sv_u + n) // (2 * n) " +
        "ELSE -((-2 * sv_u + n) // (2 * n)) END AS DOUBLE) / CAST(1000000.0 AS DOUBLE) AS centroid " +
        "FROM u ORDER BY label, pos"),
    // positional phrase match: candidate starts = token positions
    // anchored by term offset, intersected across the phrase's terms
    "q_phrase_search" ->
      ("WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents), " +
        "p AS (SELECT doc_id, i FROM (SELECT doc_id, w, " +
        "unnest(generate_series(1, len(w) - 1)) AS i FROM t) " +
        "WHERE w[i] = 'part' AND w[i+1] = 'filter') " +
        "SELECT doc_id, count(*) AS n_matches, CAST(min(i) - 1 AS BIGINT) AS first_pos " +
        "FROM p GROUP BY 1 ORDER BY doc_id"),
    // embedding QC: z-outliers on cosine-to-own-centroid, replaying the
    // centroid-micros formula, ordered list fold, and decimal moments
    "q_embed_outliers" ->
      ("WITH idx AS (SELECT label, unnest(generate_series(1, len(embedding))) AS i, embedding FROM embeddings), " +
        "e AS (SELECT label, i - 1 AS pos, CAST(embedding[i] AS DOUBLE) AS v FROM idx), " +
        "g AS (SELECT label, pos, count(*) AS n, " +
        "sum(CAST(round(v, 6) AS DECIMAL(18,6))) AS sv FROM e GROUP BY 1, 2), " +
        "u AS (SELECT label, pos, n, CAST(sv * 1000000 AS BIGINT) AS sv_u FROM g), " +
        "ct AS (SELECT label, pos, CAST(CASE WHEN sv_u >= 0 THEN (2 * sv_u + n) // (2 * n) " +
        "ELSE -((-2 * sv_u + n) // (2 * n)) END AS DOUBLE) / CAST(1000000.0 AS DOUBLE) AS centroid FROM u), " +
        "cv AS (SELECT label, list(centroid ORDER BY pos) AS cvec FROM ct GROUP BY label), " +
        "c AS (SELECT em.vec_id, em.label, " +
        "round(list_cosine_similarity(CAST(em.embedding AS DOUBLE[]), cv.cvec), 6) AS cos_c " +
        "FROM embeddings em JOIN cv ON em.label = cv.label), " +
        "m AS (SELECT vec_id, label, cos_c, count(*) OVER w AS n, " +
        "CAST(sum(CAST(cos_c AS DECIMAL(18,6))) OVER w AS DOUBLE) AS s1, " +
        "CAST(sum(CAST(CAST(cos_c AS DECIMAL(18,6)) * CAST(cos_c AS DECIMAL(18,6)) " +
        "AS DECIMAL(38,12))) OVER w AS DOUBLE) AS s2 FROM c WINDOW w AS (PARTITION BY label)) " +
        "SELECT vec_id, label, cos_c, " +
        "round((cos_c - s1/n) / sqrt(s2/n - (s1/n)*(s1/n)), 6) AS z " +
        "FROM m WHERE n >= 3 AND (s2/n - (s1/n)*(s1/n)) > 0 " +
        "AND abs((cos_c - s1/n) / sqrt(s2/n - (s1/n)*(s1/n))) > 2.0 ORDER BY vec_id"),
    // k-anonymity audit: under-k quasi-identifier groups flagged
    "q_kanon" ->
      ("SELECT c_nationkey, c_mktsegment, count(*) AS n, count(*) < 10 AS at_risk " +
        "FROM customer GROUP BY 1, 2 ORDER BY c_nationkey, c_mktsegment"),
    // GK approx-percentile sketch gated via rank-tolerance booleans;
    // parallel unnests zip positionally in DuckDB
    "q_approx_percentiles" ->
      ("WITH e AS (SELECT quantile_cont(CAST(l_extendedprice AS DOUBLE), " +
        "[0.25, 0.5, 0.75, 0.95]) AS q FROM lineitem) " +
        "SELECT unnest([0.25, 0.5, 0.75, 0.95]) AS p, " +
        "unnest(list_transform(q, x -> round(x, 6))) AS exact_pct, " +
        "TRUE AS rank_within_eps FROM e ORDER BY p"),
    // count-min sketch gated via tolerance booleans vs the exact top-20
    "q_heavy_hitters" ->
      ("WITH t AS (SELECT unnest(string_split_regex(trim(text), '\\s+')) AS tok FROM documents), " +
        "g AS (SELECT tok, count(*) AS exact_n FROM t WHERE tok <> '' " +
        "GROUP BY 1 ORDER BY exact_n DESC, tok LIMIT 20) " +
        "SELECT tok, exact_n, TRUE AS cms_within_eps FROM g ORDER BY exact_n DESC, tok"),
    // Bloom-prefiltered decontamination: the bloom has no false
    // negatives and the verify join kills its false positives, so the
    // oracle replays the PLAIN exact join — identical rows required
    "q_bloom_decontam" ->
      ("WITH w AS (SELECT doc_id, source, string_split_regex(trim(text), '\\s+') AS words FROM documents), " +
        "sh AS (SELECT doc_id, source, list_distinct([words[i] || ' ' || words[i+1] || ' ' || words[i+2] " +
        "for i in generate_series(1, len(words) - 2)]) AS s FROM w WHERE len(words) >= 3), " +
        "bp AS (SELECT doc_id AS bench_id, unnest(s) AS shingle FROM sh WHERE source = 'src0' AND doc_id < 25), " +
        "cp AS (SELECT doc_id, unnest(s) AS shingle FROM sh WHERE NOT (source = 'src0' AND doc_id < 25)), " +
        "cm AS (SELECT cp.doc_id, bp.bench_id, count(*) AS common FROM cp JOIN bp USING (shingle) GROUP BY 1, 2) " +
        "SELECT doc_id, count(*) AS n_bench_docs, max(common) AS max_overlap " +
        "FROM cm WHERE common >= 1 GROUP BY 1 ORDER BY doc_id"),
    // Export manifest: per-shard totals; shard = doc_id mod 8
    "q_export_manifest" ->
      ("SELECT doc_id % 8 AS shard, count(*) AS n_docs, " +
        "CAST(sum(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT) AS n_tokens, " +
        "CAST(sum(n_chars) AS BIGINT) AS n_bytes, " +
        "min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id " +
        "FROM documents GROUP BY 1 ORDER BY shard"),
    // Calibration sweep: integer-exact bucket of the EN-stopword ratio,
    // cumulative precision/recall/F1 from the top bucket down
    "q_calibration" ->
      ("WITH t AS (SELECT lang, string_split_regex(trim(text), '\\s+') AS w FROM documents), " +
        "h AS (SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y, " +
        "least(coalesce((CAST(len(list_filter(w, x -> x IN ('the','a','of','and','to','in','is'))) AS BIGINT) * 20) " +
        "// CAST(len(w) AS BIGINT), 0), 19) AS bucket FROM t), " +
        "g AS (SELECT bucket, count(*) AS n, CAST(sum(y) AS BIGINT) AS n_pos FROM h GROUP BY 1), " +
        "c AS (SELECT bucket, n, n_pos, " +
        "CAST(sum(n) OVER (ORDER BY bucket DESC) AS BIGINT) AS pred_pos, " +
        "CAST(sum(n_pos) OVER (ORDER BY bucket DESC) AS BIGINT) AS tp, " +
        "CAST(sum(n_pos) OVER () AS BIGINT) AS p_total FROM g) " +
        "SELECT round(CAST(bucket AS DOUBLE) / 20, 6) AS threshold, n, n_pos, " +
        "round(CAST(n_pos AS DOUBLE) / n, 6) AS pos_rate, " +
        "round(CAST(tp AS DOUBLE) / pred_pos, 6) AS \"precision\", " +
        "CASE WHEN p_total > 0 THEN round(CAST(tp AS DOUBLE) / p_total, 6) END AS recall, " +
        "round(2.0 * tp / (pred_pos + p_total), 6) AS f1 " +
        "FROM c ORDER BY threshold"),
    // SemDeDup: one Lloyd assignment step from the 16 lowest-id seeds
    // (6dp-rounded argmax, ties to lowest seed), then within-cluster
    // pairs at cosine >= 0.35 mark the higher id a duplicate
    "q_sem_dedup" ->
      ("WITH seeds AS (SELECT vec_id AS seed_id, CAST(embedding AS DOUBLE[]) AS s_emb " +
        "FROM embeddings ORDER BY vec_id LIMIT 16), " +
        "a AS (SELECT e.vec_id, s.seed_id, " +
        "round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), s.s_emb), 6) AS sc " +
        "FROM embeddings e, seeds s), " +
        "asg AS (SELECT vec_id, seed_id AS cluster FROM a " +
        "QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY sc DESC, seed_id) = 1), " +
        "v AS (SELECT asg.vec_id, cluster, CAST(e.embedding AS DOUBLE[]) AS emb " +
        "FROM asg JOIN embeddings e USING (vec_id)), " +
        "drp AS (SELECT DISTINCT y.vec_id FROM v x JOIN v y " +
        "ON x.cluster = y.cluster AND x.vec_id < y.vec_id " +
        "WHERE round(list_cosine_similarity(x.emb, y.emb), 6) >= 0.35) " +
        "SELECT v.vec_id, cluster, (v.vec_id IN (SELECT vec_id FROM drp)) AS is_dup " +
        "FROM v ORDER BY v.vec_id"),
    // the two-level routed assignment is approximate, so the declared
    // output is the tolerance pattern (see Similarity.qSemDedupHier):
    // the exact corpus count replays, and the oracle pins every
    // agreement/recall boolean to TRUE — a routing regression flips one
    // and the hash compare goes red
    "q_sem_dedup_hier" ->
      ("SELECT count(*) AS n_vecs, TRUE AS assign_agree_ok, " +
        "TRUE AS dup_agree_ok, TRUE AS dup_rate_close_ok, " +
        "TRUE AS planted_present, TRUE AS planted_recall_ok FROM embeddings"),
    // ANN recall gate: ground-truth pair count is exact (10 per panel
    // query); the recall booleans pin the approximate index paths —
    // see Similarity.qAnnRecall for the measured rates behind the gates
    "q_ann_recall" ->
      ("SELECT CAST(10 * count(*) AS BIGINT) AS n_exact, " +
        "TRUE AS lsh_recall_ok, TRUE AS ivf_recall_ok, " +
        "TRUE AS ivf_hier_recall_ok " +
        "FROM embeddings WHERE vec_id < 20"),
    // matryoshka serving recall — an EXACT gate, not tolerance booleans:
    // the oracle replays all three brute-force rankings (full/half/
    // quarter width; q_topk already proves the round-6dp cosine and the
    // (score desc, id) tie-break engine-equal) and the hit counts must
    // match. Measured: half 0.26-0.37, quarter 0.09-0.2 — synthetic
    // non-MRL embeddings spread information uniformly; the gate pins the
    // truncate-and-rerank mechanism and quantifies the loss
    "q_mrl_recall" ->
      ("WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
        "fx AS (SELECT q.vec_id AS q, c.vec_id AS n, row_number() OVER (PARTITION BY q.vec_id " +
        "ORDER BY round(list_cosine_similarity(q.v, c.v), 6) DESC, c.vec_id) AS rk " +
        "FROM e q JOIN e c ON q.vec_id < 20 AND q.vec_id <> c.vec_id), " +
        "f AS (SELECT q, n FROM fx WHERE rk <= 10), " +
        "hx AS (SELECT q.vec_id AS q, c.vec_id AS n, row_number() OVER (PARTITION BY q.vec_id " +
        "ORDER BY round(list_cosine_similarity(q.v[1:32], c.v[1:32]), 6) DESC, c.vec_id) AS rk " +
        "FROM e q JOIN e c ON q.vec_id < 20 AND q.vec_id <> c.vec_id), " +
        "h AS (SELECT q, n FROM hx WHERE rk <= 10), " +
        "qx AS (SELECT q.vec_id AS q, c.vec_id AS n, row_number() OVER (PARTITION BY q.vec_id " +
        "ORDER BY round(list_cosine_similarity(q.v[1:16], c.v[1:16]), 6) DESC, c.vec_id) AS rk " +
        "FROM e q JOIN e c ON q.vec_id < 20 AND q.vec_id <> c.vec_id), " +
        "qq AS (SELECT q, n FROM qx WHERE rk <= 10) " +
        "SELECT (SELECT count(*) FROM f) AS n_exact, " +
        "(SELECT count(*) FROM f JOIN h USING (q, n)) AS half_hits, " +
        "(SELECT count(*) FROM f JOIN qq USING (q, n)) AS quarter_hits"),
    // same coupling as q_ann_recall: n_exact = k(10) * the vec_id < 20
    // panel; the booleans pin the PQ serving path's measured recalls
    // (ADC 0.33-0.43 >= 0.25, ADC+rerank 0.82-0.93 >= 0.6)
    "q_pq_search" ->
      ("SELECT CAST(10 * count(*) AS BIGINT) AS n_exact, " +
        "TRUE AS adc_recall_ok, TRUE AS refined_recall_ok " +
        "FROM embeddings WHERE vec_id < 20"),
    // n_exact = k(10) * |odd panel| exactly: the indexed even half holds
    // >= 10 vectors in every shipped sf dir and the parity split makes
    // query/corpus disjoint, so no exact list is ever short. The literal
    // 10 is coupled to Similarity.qAnnIncremental's k.
    "q_ann_incremental" ->
      ("SELECT CAST(10 * count(*) AS BIGINT) AS n_exact, " +
        "TRUE AS ivf_recall_ok " +
        "FROM embeddings WHERE vec_id % 2 = 1 AND vec_id < 40"),
    "q_mixture" ->
      ("WITH per AS (SELECT source, CAST(count(*) AS DOUBLE) AS n_i, " +
        "CAST(CAST(regexp_extract(source, '([0-9]+)$', 1) AS BIGINT) % 4 + 1 AS DOUBLE) AS w_i " +
        "FROM documents GROUP BY source), " +
        "rates AS (SELECT source, n_i, " +
        "least(CAST(1.0 AS DOUBLE), w_i / sum(w_i) OVER () * sum(n_i) OVER () / n_i) AS rate FROM per), " +
        "kept AS (SELECT d.source, r.n_i FROM documents d JOIN rates r USING (source) " +
        "WHERE list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        "list_transform(generate_series(1, length(d.text)), i -> CAST(ascii(d.text[i]) AS BIGINT))), " +
        "(a, c) -> (a * 31 + c) % 1000000007) % 1000000 < CAST(floor(r.rate * 1000000.0) AS BIGINT)) " +
        "SELECT source, CAST(max(n_i) AS BIGINT) AS n_total, count(*) AS n_kept, " +
        "round(CAST(count(*) AS DOUBLE) / max(n_i), 6) AS kept_frac " +
        "FROM kept GROUP BY source ORDER BY source"),
    "q_normalize" ->
      ("WITH n AS (SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text), " +
        "'[^\\p{L}\\p{N}\\s]+', ' ', 'g'), '\\s+', ' ', 'g')) AS norm_text FROM documents) " +
        "SELECT doc_id, norm_text, CASE WHEN norm_text = '' THEN CAST(0 AS BIGINT) " +
        "ELSE CAST(len(string_split(norm_text, ' ')) AS BIGINT) END AS n_norm_tokens " +
        "FROM n ORDER BY doc_id"),
    "q_c4_filters" ->
      ("WITH base AS (SELECT doc_id, text FROM documents), " +
        "planted AS (SELECT doc_id + 3000000 AS doc_id, " +
        "CASE WHEN doc_id % 10 = 1 THEN array_to_string((string_split_regex(trim(text), '\\s+'))[1:3], ' ') " +
        "WHEN doc_id % 10 = 3 THEN text || ' {config}' " +
        "WHEN doc_id % 10 = 4 THEN 'lorem ipsum ' || text " +
        "ELSE 'a b c d e f g h i j' END AS text " +
        "FROM documents WHERE doc_id % 10 IN (1, 3, 4, 5)), " +
        "all_docs AS (SELECT * FROM base UNION ALL SELECT * FROM planted), " +
        "t AS (SELECT doc_id, text, " +
        "string_split_regex(trim(text), '\\s+') AS w, " +
        "string_split_regex(trim(lower(text)), '\\s+') AS lw FROM all_docs), " +
        "q AS (SELECT doc_id, text, CAST(len(w) AS BIGINT) AS n_tokens, " +
        "round(CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE) / len(w), 6) AS mean_word_len, " +
        "CAST(len(list_filter(lw, x -> x IN ('the','a','of','and','to','in','is'))) AS BIGINT) AS n_stop FROM t), " +
        "r AS (SELECT doc_id, n_tokens, mean_word_len, " +
        "CASE WHEN n_tokens < 5 THEN 'too_short' " +
        "WHEN contains(text, '{') THEN 'brace' " +
        "WHEN contains(lower(text), 'lorem ipsum') THEN 'lorem' " +
        "WHEN mean_word_len < 3.0 OR mean_word_len > 10.0 THEN 'word_len' " +
        "WHEN n_stop < 2 THEN 'no_stopwords' " +
        "ELSE 'kept' END AS reason FROM q) " +
        "SELECT doc_id, n_tokens, mean_word_len, reason, reason = 'kept' AS kept " +
        "FROM r ORDER BY doc_id"),
    "q_stopword_df" ->
      ("WITH p AS (SELECT doc_id, unnest(list_distinct(string_split_regex(trim(text), '\\s+'))) AS token " +
        "FROM documents) " +
        "SELECT token, CAST(count(*) AS BIGINT) AS df FROM p " +
        "GROUP BY token ORDER BY df DESC, token LIMIT 20"),
    "q_bpe_pairs" ->
      ("WITH t AS (SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w FROM documents), " +
        "p AS (SELECT unnest([w[i:i+1] for i in generate_series(1, length(w) - 1)]) AS pair " +
        "FROM t WHERE length(w) >= 2) " +
        "SELECT pair, CAST(count(*) AS BIGINT) AS n FROM p " +
        "GROUP BY pair ORDER BY n DESC, pair LIMIT 20"),
    "q_bpe_train" -> bpeTrainOracleSql(TextSearch.BpeMerges),
    "q_unigram_lm" -> unigramOracleSql,
    "q_wordpiece" -> wordpieceOracleSql,
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
    "q_bpe_encode" -> bpeEncodeOracleSql(TextSearch.BpeMerges),
    "q_vocab_coverage" ->
      ("WITH tf AS (SELECT tok, count(*) AS tf FROM " +
        "(SELECT unnest(string_split_regex(trim(text), '\\s+')) AS tok FROM documents) " +
        "WHERE length(tok) > 0 GROUP BY tok), " +
        "cum AS (SELECT tf, CAST(coalesce(sum(tf) OVER (ORDER BY tf DESC, tok " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS before, " +
        "CAST(sum(tf) OVER () AS BIGINT) AS total FROM tf) " +
        "SELECT " +
        "CAST(coalesce(sum(CASE WHEN CAST(before AS DOUBLE) < CAST(total AS DOUBLE) * CAST(0.5 AS DOUBLE) THEN 1 ELSE 0 END), 0) AS BIGINT) AS k_50, " +
        "CAST(coalesce(sum(CASE WHEN CAST(before AS DOUBLE) < CAST(total AS DOUBLE) * CAST(0.75 AS DOUBLE) THEN 1 ELSE 0 END), 0) AS BIGINT) AS k_75, " +
        "CAST(coalesce(sum(CASE WHEN CAST(before AS DOUBLE) < CAST(total AS DOUBLE) * CAST(0.9 AS DOUBLE) THEN 1 ELSE 0 END), 0) AS BIGINT) AS k_90, " +
        "CAST(coalesce(sum(CASE WHEN CAST(before AS DOUBLE) < CAST(total AS DOUBLE) * CAST(0.99 AS DOUBLE) THEN 1 ELSE 0 END), 0) AS BIGINT) AS k_99 " +
        "FROM cum"),
    "q_quota_sample" ->
      ("WITH d AS (SELECT doc_id, lang, coalesce(text, '') AS t FROM documents), " +
        "r AS (SELECT doc_id, lang, row_number() OVER (PARTITION BY lang " +
        "ORDER BY list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        "list_transform(generate_series(1, length(t)), i -> CAST(ascii(t[i]) AS BIGINT))), " +
        "(a, c) -> (a * 31 + c) % 1000000007), doc_id) AS rnk FROM d) " +
        "SELECT doc_id, lang, CAST(rnk AS BIGINT) AS rnk FROM r WHERE rnk <= 25 ORDER BY doc_id"),
    "q_bigram_lm" ->
      ("WITH t AS (SELECT string_split_regex(trim(text), '\\s+') AS w FROM documents), " +
        "bg AS (SELECT unnest([struct_pack(w1 := w[i], w2 := w[i+1]) " +
        "for i in generate_series(1, len(w) - 1)]) AS z FROM t WHERE len(w) >= 2), " +
        "c12 AS (SELECT z.w1 AS w1, z.w2 AS w2, count(*) AS n FROM bg GROUP BY 1, 2), " +
        "c1 AS (SELECT w1, sum(n) AS n1 FROM c12 GROUP BY 1), " +
        "v AS (SELECT count(DISTINCT tok) AS vs FROM (SELECT unnest(w) AS tok FROM t)) " +
        "SELECT w1, w2, n, round((n + 0.5) / (n1 + 0.5 * vs), 6) AS p " +
        "FROM c12 JOIN c1 USING (w1), v ORDER BY n DESC, w1, w2 LIMIT 100"),
    // interpolated Kneser-Ney: every N1+ statistic is a window over the
    // distinct-bigram table itself (each c12 row IS one distinct pair),
    // so the oracle's counts are definitionally the engine's; the
    // probability combines exact integers in the same double expression
    // shape, rounded to 6 places (the bigram_lm discipline)
    "q_kneser_ney" ->
      ("WITH t AS (SELECT string_split_regex(trim(text), '\\s+') AS w FROM documents), " +
        "bg AS (SELECT unnest([struct_pack(w1 := w[i], w2 := w[i+1]) " +
        "for i in generate_series(1, len(w) - 1)]) AS z FROM t WHERE len(w) >= 2), " +
        "c12 AS (SELECT z.w1 AS w1, z.w2 AS w2, count(*) AS n FROM bg GROUP BY 1, 2), " +
        "st AS (SELECT w1, w2, n, sum(n) OVER (PARTITION BY w1) AS n1, " +
        "count(*) OVER (PARTITION BY w1) AS d1, " +
        "count(*) OVER (PARTITION BY w2) AS c2, " +
        "count(*) OVER () AS db FROM c12) " +
        "SELECT w1, w2, n, round(greatest(n - 0.75, 0.0) / n1 + " +
        "((0.75 * d1) / n1) * (c2 / CAST(db AS DOUBLE)), 6) AS p_kn " +
        "FROM st ORDER BY n DESC, w1, w2 LIMIT 100"),
    "q_budget_select" ->
      ("WITH t AS (SELECT doc_id, text, length(text) AS len, " +
        "string_split_regex(trim(text), '\\s+') AS w FROM documents), " +
        "q AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens, " +
        "(CAST(len AS DOUBLE) - length(regexp_replace(text, '[.!?,;:]', '', 'g'))) / len AS punct_ratio, " +
        "CAST(len(list_filter(w, x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE) / len(w) AS stopword_ratio_raw, " +
        "len(w) AS nw FROM t), " +
        "sc AS (SELECT doc_id, n_tokens, " +
        "round(least(1.0, CAST(nw AS DOUBLE) / 100.0) * 0.5 + stopword_ratio_raw * 0.3 + (1.0 - punct_ratio) * 0.2, 6) AS quality_score FROM q), " +
        "s AS (SELECT doc_id, quality_score, n_tokens, " +
        "CAST(coalesce(sum(n_tokens) OVER (ORDER BY quality_score DESC, doc_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tokens_before FROM sc) " +
        "SELECT doc_id, quality_score, n_tokens, tokens_before FROM s " +
        "WHERE tokens_before < 20000 ORDER BY doc_id"),
    "q_split_safe" ->
      (s"WITH RECURSIVE $ngramOracleCtes, " +
        s"pairs AS ($ngramOraclePairs), " +
        "edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs " +
        "UNION ALL SELECT doc_b, doc_a FROM pairs), " +
        "reach AS (SELECT src, src AS lbl FROM (SELECT DISTINCT src FROM edges) " +
        "UNION SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.src), " +
        "lbl AS (SELECT src AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY src), " +
        "h AS (SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        "list_transform(generate_series(1, length(text)), i -> CAST(ascii(text[i]) AS BIGINT))), " +
        "(a, c) -> (a * 31 + c) % 1000000007) % 10 AS own_r FROM documents), " +
        "rep AS (SELECT l.doc_id, l.cluster_id, hr.own_r AS rep_r FROM lbl l " +
        "JOIN h hr ON hr.doc_id = l.cluster_id) " +
        "SELECT d.doc_id, coalesce(rep.cluster_id, d.doc_id) AS cluster_id, " +
        "CASE WHEN coalesce(rep.rep_r, h.own_r) = 0 THEN 'test' " +
        "WHEN coalesce(rep.rep_r, h.own_r) = 1 THEN 'val' ELSE 'train' END AS split " +
        "FROM documents d JOIN h USING (doc_id) LEFT JOIN rep ON rep.doc_id = d.doc_id " +
        "ORDER BY doc_id"),
    "q_negatives" ->
      ("WITH b AS (SELECT min(doc_id) AS mn, count(*) AS n FROM documents), " +
        "g AS (SELECT doc_id, unnest(generate_series(1, 4)) AS j FROM documents), " +
        "h AS (SELECT doc_id, j, (list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        "list_transform(generate_series(1, length(CAST(doc_id AS VARCHAR) || ':' || CAST(j AS VARCHAR))), " +
        "i -> CAST(ascii((CAST(doc_id AS VARCHAR) || ':' || CAST(j AS VARCHAR))[i]) AS BIGINT))), " +
        "(a, c) -> (a * 31 + c) % 1000000007) % n) + mn AS raw, mn, n FROM g, b) " +
        "SELECT doc_id, j, CASE WHEN raw = doc_id THEN ((raw - mn + 1) % n) + mn ELSE raw END AS neg_id " +
        "FROM h ORDER BY doc_id, j"),
    "q_winnow" ->
      ("WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words FROM documents), " +
        "g AS (SELECT doc_id, [words[i] || ' ' || words[i+1] || ' ' || words[i+2] " +
        "for i in generate_series(1, len(words) - 2)] AS sh FROM w WHERE len(words) >= 6), " +
        "c AS (SELECT doc_id, list_transform(sh, sg -> list_reduce(" +
        "list_prepend(CAST(0 AS BIGINT), list_transform(generate_series(1, length(sg)), " +
        "i -> CAST(ascii(sg[i]) AS BIGINT))), (a, x) -> (a * 31 + x) % 1000000007)) AS cs FROM g), " +
        "f AS (SELECT doc_id, unnest(list_distinct([list_min(cs[i:i+3]) " +
        "for i in generate_series(1, len(cs) - 3)])) AS fp FROM c) " +
        "SELECT doc_id, fp FROM f ORDER BY doc_id, fp"),
    "q_dedup_keepbest" ->
      ("WITH all_docs AS (SELECT doc_id, text FROM documents " +
        "UNION ALL SELECT doc_id + 2000000 AS doc_id, upper(text) AS text " +
        "FROM documents WHERE doc_id % 5 = 0), " +
        "t AS (SELECT doc_id, text, lower(text) AS lt, length(text) AS len, " +
        "string_split_regex(trim(text), '\\s+') AS w FROM all_docs), " +
        "q AS (SELECT doc_id, lt, " +
        "round(least(1.0, CAST(len(w) AS DOUBLE) / 100.0) * 0.5 " +
        "+ CAST(len(list_filter(w, x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE) / len(w) * 0.3 " +
        "+ (1.0 - (CAST(len AS DOUBLE) - length(regexp_replace(text, '[.!?,;:]', '', 'g'))) / len) * 0.2, 6) " +
        "AS quality_score FROM t), " +
        "k AS (SELECT doc_id, quality_score, list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        "list_transform(generate_series(1, length(lt)), i -> CAST(ascii(lt[i]) AS BIGINT))), " +
        "(a, c) -> (a * 31 + c) % 1000000007) AS ckey FROM q), " +
        "r AS (SELECT doc_id, quality_score, ckey, " +
        "row_number() OVER (PARTITION BY ckey ORDER BY quality_score DESC, doc_id) AS rn, " +
        "CAST(count(*) OVER (PARTITION BY ckey) AS BIGINT) AS n_variants FROM k) " +
        "SELECT doc_id, n_variants, quality_score FROM r WHERE rn = 1 ORDER BY doc_id"),
    "q_decay" ->
      ("WITH r AS (SELECT max(ts) AS ref_ts FROM events), " +
        "a AS (SELECT user_id, greatest((epoch_us((SELECT ref_ts FROM r)) - epoch_us(ts)) // 86400000000, 0) AS age_days " +
        "FROM events) " +
        "SELECT user_id, count(*) AS n_events, " +
        "CAST(sum(CAST(round(CAST(1.0 AS DOUBLE) / (age_days + 1), 9) AS DECIMAL(28,9))) AS DOUBLE) AS decayed_score " +
        "FROM a GROUP BY user_id ORDER BY user_id"),
    "q_quantize" ->
      ("WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
        "m AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS max_abs FROM e), " +
        "s AS (SELECT vec_id, v, max_abs / CAST(127 AS DOUBLE) AS scale, " +
        "CASE WHEN max_abs = 0 THEN CAST(1 AS DOUBLE) ELSE max_abs / CAST(127 AS DOUBLE) END AS divisor FROM m), " +
        "q AS (SELECT vec_id, scale, v, list_transform(v, x -> round(x / divisor)) AS qv FROM s), " +
        "r AS (SELECT vec_id, round(scale, 6) AS scale, " +
        "round(list_max(list_transform(generate_series(1, len(v)), i -> abs(v[i] - qv[i] * scale))), 6) AS max_err FROM q) " +
        "SELECT vec_id, scale, max_err FROM r ORDER BY vec_id"),
    "q_unpivot" ->
      ("SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS value FROM lineitem " +
        "UNION ALL SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem " +
        "UNION ALL SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem " +
        "UNION ALL SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem " +
        "ORDER BY l_orderkey, l_linenumber, metric"),
    "q_fuzzy_match" ->
      ("WITH probes AS (" +
        "SELECT s_suppkey AS p_key, s_name[1:2] || s_name[4:] AS probe FROM supplier WHERE s_suppkey % 7 = 0 " +
        "UNION ALL SELECT s_suppkey, 'MANGLED' || s_name[9:] FROM supplier WHERE s_suppkey % 7 = 3), " +
        "b AS (SELECT p_key, probe, regexp_extract(probe, '([0-9]+)$', 1) AS bk FROM probes), " +
        "c AS (SELECT s_suppkey, s_name, regexp_extract(s_name, '([0-9]+)$', 1) AS bk FROM supplier) " +
        "SELECT b.p_key, b.probe, c.s_suppkey, c.s_name, levenshtein(b.probe, c.s_name) AS dist " +
        "FROM b JOIN c USING (bk) WHERE levenshtein(b.probe, c.s_name) <= 2 " +
        "ORDER BY p_key, s_suppkey"),
    "q_pq_encode" ->
      ("WITH ranked AS (SELECT CAST(embedding AS DOUBLE[]) AS emb, " +
        "row_number() OVER (ORDER BY (vec_id * 2654435761) % 4294967296, vec_id) AS rn FROM embeddings), " +
        "seeds AS (SELECT rn - 1 AS code, emb FROM ranked WHERE rn <= 16), " +
        "v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings), " +
        "d AS (SELECT v.vec_id, g.m, sd.code, " +
        "round(list_sum(list_transform(generate_series(1, 4), " +
        "i -> (v.emb[g.m * 4 + i] - sd.emb[g.m * 4 + i]) * (v.emb[g.m * 4 + i] - sd.emb[g.m * 4 + i]))), 6) AS dist " +
        "FROM v, generate_series(0, 15) g(m), seeds sd), " +
        "best AS (SELECT vec_id, m, code, dist, " +
        "row_number() OVER (PARTITION BY vec_id, m ORDER BY dist, code) AS r FROM d) " +
        "SELECT vec_id, string_agg(CAST(code AS VARCHAR), '|' ORDER BY m) AS codes, " +
        "round(CAST(sum(CAST(dist AS DECIMAL(18,6))) AS DOUBLE), 6) AS qerr " +
        "FROM best WHERE r = 1 GROUP BY vec_id ORDER BY vec_id"),
    "q_zorder" ->
      ("SELECT l_orderkey, l_partkey, CAST(" +
        operators.Advanced.zvalueSql("(l_orderkey % 65536)", "(l_partkey % 65536)") +
        " AS BIGINT) AS zval FROM lineitem " +
        "ORDER BY zval, l_orderkey, l_partkey LIMIT 100"),
    "q_containment" ->
      ("WITH all_docs AS (SELECT doc_id, text FROM documents " +
        "UNION ALL SELECT doc_id + 4000000 AS doc_id, " +
        "array_to_string((string_split_regex(trim(text), '\\s+'))[1:len(string_split_regex(trim(text), '\\s+'))//2], ' ') AS text " +
        "FROM documents WHERE doc_id % 17 = 0), " +
        "w AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words FROM all_docs), " +
        "sh AS (SELECT doc_id, list_distinct([words[i] || ' ' || words[i+1] || ' ' || words[i+2] " +
        "for i in generate_series(1, len(words) - 2)]) AS s FROM w WHERE len(words) >= 3), " +
        "sizes AS (SELECT doc_id, CAST(len(s) AS BIGINT) AS n_sh FROM sh), " +
        "postings AS (SELECT doc_id, unnest(s) AS shingle FROM sh), " +
        "cm AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common " +
        "FROM postings a JOIN postings b ON a.shingle = b.shingle AND a.doc_id < b.doc_id " +
        "GROUP BY 1, 2) " +
        "SELECT doc_a, doc_b, round(CAST(common AS DOUBLE) / least(sa.n_sh, sb.n_sh), 6) AS containment " +
        "FROM cm JOIN sizes sa ON cm.doc_a = sa.doc_id JOIN sizes sb ON cm.doc_b = sb.doc_id " +
        "WHERE CAST(common AS DOUBLE) / least(sa.n_sh, sb.n_sh) >= 0.9 " +
        "ORDER BY doc_a, doc_b"),
    "q_repeated_spans" ->
      ("WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words FROM documents), " +
        "g AS (SELECT doc_id, [" +
        (0 until 8).map(k => s"words[i+$k]").mkString(" || ' ' || ") +
        " for i in generate_series(1, len(words) - 7)] AS sh FROM w WHERE len(words) >= 8), " +
        "c AS (SELECT doc_id, list_transform(sh, sg -> list_reduce(" +
        "list_prepend(CAST(0 AS BIGINT), list_transform(generate_series(1, length(sg)), " +
        "i -> CAST(ascii(sg[i]) AS BIGINT))), (a, x) -> (a * 31 + x) % 1000000007)) AS cs FROM g), " +
        "e AS (SELECT doc_id, unnest(cs) AS span_hash FROM c) " +
        "SELECT span_hash, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs, " +
        "CAST(count(*) AS BIGINT) AS n_occur, min(doc_id) AS first_doc " +
        "FROM e GROUP BY span_hash HAVING count(*) >= 2 " +
        "ORDER BY n_occur DESC, span_hash"),
    "q_span_dedup" ->
      ("WITH docs0 AS (SELECT doc_id, text FROM documents " +
        "UNION ALL SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 20 = 0 " +
        "UNION ALL SELECT doc_id + 2000000, " +
        "array_to_string((string_split_regex(trim(text), '\\s+'))[1:16], ' ') " +
        "|| ' unique tail ' || CAST(doc_id AS VARCHAR) FROM documents WHERE doc_id % 30 = 0), " +
        "w AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words FROM docs0), " +
        "c AS (SELECT doc_id, list_transform([" +
        (0 until 8).map(k => s"words[i+$k]").mkString(" || ' ' || ") +
        " for i in generate_series(1, len(words) - 7)], " +
        "sg -> list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        "list_transform(generate_series(1, length(sg)), i -> CAST(ascii(sg[i]) AS BIGINT))), " +
        "(a, x) -> (a * 31 + x) % 1000000007)) AS cs FROM w WHERE len(words) >= 8), " +
        "sp AS (SELECT doc_id, unnest(generate_series(0, len(cs) - 1)) AS pos, " +
        "unnest(cs) AS span_hash FROM c), " +
        "rem AS (SELECT doc_id, pos FROM (SELECT doc_id, pos, " +
        "row_number() OVER (PARTITION BY span_hash ORDER BY doc_id, pos) AS rn FROM sp) WHERE rn > 1), " +
        "cut AS (SELECT DISTINCT doc_id, unnest(generate_series(pos, pos + 7)) AS i FROM rem), " +
        "toks AS (SELECT doc_id, unnest(words) AS tok, " +
        "unnest(generate_series(0, len(words) - 1)) AS i FROM w), " +
        "keep AS (SELECT t.doc_id, t.i, t.tok FROM toks t " +
        "LEFT JOIN cut c ON t.doc_id = c.doc_id AND t.i = c.i WHERE c.i IS NULL), " +
        "agg AS (SELECT doc_id, count(*) AS n_kept, " +
        "string_agg(tok, ' ' ORDER BY i) AS text_clean FROM keep GROUP BY doc_id) " +
        "SELECT w.doc_id, CAST(len(words) AS BIGINT) AS n_tokens, " +
        "CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept, " +
        "coalesce(a.text_clean, '') AS text_clean " +
        "FROM w LEFT JOIN agg a USING (doc_id) ORDER BY doc_id"),
    "q_skew_stats" ->
      ("WITH f AS (SELECT event_type, user_id, count(*) AS freq FROM events GROUP BY 1, 2) " +
        "SELECT event_type, CAST(count(*) AS BIGINT) AS n_keys, " +
        "CAST(max(freq) AS BIGINT) AS max_freq, CAST(sum(freq) AS BIGINT) AS n_rows, " +
        "round(quantile_cont(freq, 0.99), 6) AS p99_freq, " +
        "round(CAST(max(freq) AS DOUBLE) * count(*) / sum(freq), 6) AS skew_ratio " +
        "FROM f GROUP BY event_type ORDER BY event_type"),
    // schema evolution: even doc_ids were written under the OLD 3-column
    // schema (no source), odd under the new one; the merged-footer read
    // must surface old rows with source NULL and the generation partition
    "q_schema_evolve" ->
      ("SELECT doc_id, lang, n_chars, " +
        "CASE WHEN doc_id % 2 = 1 THEN source END AS source, " +
        "CAST(doc_id % 2 AS BIGINT) AS gen FROM documents ORDER BY doc_id"),
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
    // Cohen's kappa: confusion totals + the two exact integer divisions
    // (po, pe) + the floor-form chance-corrected statistic (kappa chains
    // doubles — SCALE finding 16)
    "q_kappa" ->
      ("WITH t AS (SELECT lang, string_split_regex(trim(text), '\\s+') AS w FROM documents), " +
        "h AS (SELECT lang, " +
        "CAST(len(list_filter(w, x -> x IN ('the','a','of','and','to','in','is'))) AS BIGINT) AS en, " +
        "CAST(len(list_filter(w, x -> x IN ('el','la','de','y','en','es','un'))) AS BIGINT) AS es, " +
        "CAST(len(list_filter(w, x -> x IN ('der','die','das','und','ist','ein','zu'))) AS BIGINT) AS de, " +
        "CAST(len(list_filter(w, x -> x IN ('le','la','et','de','un','est','en'))) AS BIGINT) AS fr FROM t), " +
        "m AS (SELECT lang AS truth, CASE WHEN greatest(en, es, de, fr) = 0 THEN 'und' " +
        "WHEN en >= es AND en >= de AND en >= fr THEN 'en' " +
        "WHEN es >= de AND es >= fr THEN 'es' WHEN de >= fr THEN 'de' ELSE 'fr' END AS pred FROM h), " +
        "a AS (SELECT CAST(count(*) AS BIGINT) AS n, " +
        "CAST(coalesce(sum(CASE WHEN truth = pred THEN 1 END), 0) AS BIGINT) AS n_agree FROM m), " +
        "rt AS (SELECT truth AS lbl, count(*) AS nt FROM m GROUP BY 1), " +
        "ct AS (SELECT pred AS lbl, count(*) AS np FROM m GROUP BY 1), " +
        "pn AS (SELECT CAST(coalesce(sum(nt * np), 0) AS BIGINT) AS pe_num " +
        "FROM rt JOIN ct USING (lbl)) " +
        "SELECT n, n_agree, round(CAST(n_agree AS DOUBLE) / n, 6) AS po, " +
        "round(CAST(pe_num AS DOUBLE) / (n * n), 6) AS pe, " +
        "CASE WHEN pe_num = n * n THEN 0.0 ELSE " +
        "floor(((CAST(n_agree AS DOUBLE) / n - CAST(pe_num AS DOUBLE) / (n * n)) / " +
        "(1.0 - CAST(pe_num AS DOUBLE) / (n * n))) * 1e6 + 0.5) / 1e6 END AS kappa " +
        "FROM a CROSS JOIN pn"),
    // caption-image consistency: the engine really decodes each PNG and
    // really parses each caption; the oracle states both geometries and
    // the verdict in closed form (every 7th caption plants width+1)
    "q_caption_check" ->
      ("SELECT doc_id, " +
        "CAST(doc_id % 40 + 8 AS INTEGER) AS img_w, " +
        "CAST(doc_id % 23 + 8 AS INTEGER) AS img_h, " +
        "CAST(doc_id % 40 + 8 + CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END AS INTEGER) AS cap_w, " +
        "CAST(doc_id % 23 + 8 AS INTEGER) AS cap_h, " +
        "doc_id % 7 <> 0 AS consistent " +
        "FROM documents WHERE doc_id < 200 ORDER BY doc_id"),
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
    // preference pairs: replay the q_quality score, both ranking windows
    // (ties on doc_id), the disjoint-ends rank-to-rank pairing (k=2 needs
    // n_cand >= 4) and the 0.05 margin floor in closed form
    "q_dpo_pairs" ->
      ("WITH t AS (SELECT doc_id, lang, source, text, length(text) AS len, " +
        "string_split_regex(trim(text), '\\s+') AS w FROM documents WHERE text IS NOT NULL), " +
        "q AS (SELECT doc_id, lang, source, doc_id % 25 AS bucket, " +
        "round(least(1.0, CAST(len(w) AS DOUBLE) / 100.0) * 0.5 + " +
        "(CAST(len(list_filter(w, x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE) / len(w)) * 0.3 + " +
        "(1.0 - (CAST(len AS DOUBLE) - length(regexp_replace(text, '[.!?,;:]', '', 'g'))) / len) * 0.2, 6) AS qs " +
        "FROM t WHERE len(w) >= 5), " +
        "r AS (SELECT *, row_number() OVER (PARTITION BY lang, source, bucket ORDER BY qs DESC, doc_id ASC) AS rb, " +
        "row_number() OVER (PARTITION BY lang, source, bucket ORDER BY qs ASC, doc_id ASC) AS rw, " +
        "count(*) OVER (PARTITION BY lang, source, bucket) AS n_cand " +
        "FROM q WHERE qs IS NOT NULL), " +
        "f AS (SELECT * FROM r WHERE n_cand >= 4), " +
        "c AS (SELECT lang, source, bucket, rb AS pair_idx, doc_id AS chosen_id, qs AS chosen_score FROM f WHERE rb <= 2), " +
        "j AS (SELECT lang, source, bucket, rw AS pair_idx, doc_id AS rejected_id, qs AS rejected_score FROM f WHERE rw <= 2), " +
        "p AS (SELECT c.lang, c.source, c.bucket, CAST(c.pair_idx AS INTEGER) AS pair_idx, " +
        "chosen_id, rejected_id, chosen_score, rejected_score, " +
        "round(chosen_score - rejected_score, 6) AS margin " +
        "FROM c JOIN j ON c.lang = j.lang AND c.source = j.source " +
        "AND c.bucket = j.bucket AND c.pair_idx = j.pair_idx) " +
        "SELECT * FROM p WHERE margin >= CAST(0.05 AS DOUBLE) " +
        "ORDER BY lang, source, bucket, pair_idx"),
    // ROUGE: replay pair formation (consecutive docs per lang), the
    // CLIPPED per-gram min-count overlaps, single-division round(6)
    // precision/recall, and F1 in the portable floor(x*1e6+0.5)/1e6 form
    // (SCALE finding 16 — chained doubles must not use round())
    "q_rouge" ->
      ("WITH b AS (SELECT doc_id, lang, " +
        "list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS toks " +
        "FROM documents WHERE text IS NOT NULL), " +
        "f AS (SELECT doc_id, lang, toks, len(toks) AS n FROM b WHERE len(toks) >= 2), " +
        "r AS (SELECT doc_id, lang, toks, n, " +
        "row_number() OVER (PARTITION BY lang ORDER BY doc_id) - 1 AS rn FROM f), " +
        "rr AS (SELECT doc_id, lang, toks, n, rn // 2 AS pair_id, rn % 2 AS role FROM r), " +
        "u1 AS (SELECT lang, pair_id, role, unnest(toks) AS gram FROM rr), " +
        "g1 AS (SELECT lang, pair_id, role, gram, count(*) AS c FROM u1 GROUP BY 1, 2, 3, 4), " +
        "ov1 AS (SELECT a.lang, a.pair_id, CAST(sum(least(a.c, x.c)) AS BIGINT) AS o1 " +
        "FROM g1 a JOIN g1 x ON a.lang = x.lang AND a.pair_id = x.pair_id " +
        "AND a.gram = x.gram AND a.role = 0 AND x.role = 1 GROUP BY 1, 2), " +
        "u2 AS (SELECT lang, pair_id, role, " +
        "unnest(list_transform(generate_series(1, len(toks) - 1), " +
        "i -> toks[i] || ' ' || toks[i + 1])) AS gram FROM rr), " +
        "g2 AS (SELECT lang, pair_id, role, gram, count(*) AS c FROM u2 GROUP BY 1, 2, 3, 4), " +
        "ov2 AS (SELECT a.lang, a.pair_id, CAST(sum(least(a.c, x.c)) AS BIGINT) AS o2 " +
        "FROM g2 a JOIN g2 x ON a.lang = x.lang AND a.pair_id = x.pair_id " +
        "AND a.gram = x.gram AND a.role = 0 AND x.role = 1 GROUP BY 1, 2), " +
        "p AS (SELECT c.lang, c.pair_id, c.doc_id AS cand_id, x.doc_id AS ref_id, " +
        "c.n AS n_cand, x.n AS n_ref FROM rr c JOIN rr x ON c.lang = x.lang " +
        "AND c.pair_id = x.pair_id AND c.role = 0 AND x.role = 1), " +
        "m AS (SELECT p.*, coalesce(ov1.o1, 0) AS o1, coalesce(ov2.o2, 0) AS o2 " +
        "FROM p LEFT JOIN ov1 USING (lang, pair_id) LEFT JOIN ov2 USING (lang, pair_id)) " +
        "SELECT lang, CAST(pair_id AS BIGINT) AS pair_id, cand_id, ref_id, " +
        "CAST(n_cand AS INTEGER) AS n_cand, CAST(n_ref AS INTEGER) AS n_ref, " +
        "CAST(o1 AS BIGINT) AS o1, CAST(o2 AS BIGINT) AS o2, " +
        "round(CAST(o1 AS DOUBLE) / n_cand, 6) AS r1_precision, " +
        "round(CAST(o1 AS DOUBLE) / n_ref, 6) AS r1_recall, " +
        "CASE WHEN o1 = 0 THEN 0.0 ELSE floor((2.0 * (CAST(o1 AS DOUBLE) / n_cand) * " +
        "(CAST(o1 AS DOUBLE) / n_ref) / ((CAST(o1 AS DOUBLE) / n_cand) + " +
        "(CAST(o1 AS DOUBLE) / n_ref))) * 1e6 + 0.5) / 1e6 END AS r1_f1, " +
        "round(CAST(o2 AS DOUBLE) / (n_cand - 1), 6) AS r2_precision, " +
        "round(CAST(o2 AS DOUBLE) / (n_ref - 1), 6) AS r2_recall, " +
        "CASE WHEN o2 = 0 THEN 0.0 ELSE floor((2.0 * (CAST(o2 AS DOUBLE) / (n_cand - 1)) * " +
        "(CAST(o2 AS DOUBLE) / (n_ref - 1)) / ((CAST(o2 AS DOUBLE) / (n_cand - 1)) + " +
        "(CAST(o2 AS DOUBLE) / (n_ref - 1)))) * 1e6 + 0.5) / 1e6 END AS r2_f1 " +
        "FROM m ORDER BY lang, pair_id"),
  )
}
