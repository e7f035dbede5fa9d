package graft
package entry

import graft.engine.Tables
import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}
import OracleHelpers._

/** Text analysis, search/relevance, tokenizer induction, LM scoring, normalization and eval metrics — driver-contract registrations and their
  * DuckDB oracles, moved verbatim from the monolithic SparkEntry
  * (round 8; SparkEntry concatenates the per-module registries). */
private[graft] object TextEntries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- text analysis extensions (BASELINE.json north star)
    "q_token_count" -> (TextAnalysis.qTokenCount _),
    "q_quality" -> (TextAnalysis.qQuality _),
    "q_langid" -> (TextAnalysis.qLangId _),
    "q_fingerprint" -> (TextAnalysis.qFingerprint _),
    "q_text_stats" -> (TextAnalysis.qTextStats _),
    // --- text search / relevance extensions
    "q_tfidf" -> (TextSearch.qTfidf _),
    "q_bm25" -> (TextSearch.qBm25 _),
    "q_contamination" -> (TextSearch.qContamination _),
    "q_phrase_search" -> (TextSearch.qPhraseSearch _), // positional-postings exact phrase match,
    "q_repetition" -> (TextAnalysis.qRepetition _),
    "q_perplexity" -> (TextAnalysis.qPerplexity _),
    "q_importance" -> (TextAnalysis.qImportance _),
    "q_dataset_card" -> (TextAnalysis.qDatasetCard _),
    "q_confusion" -> (TextAnalysis.qConfusion _),
    "q_nb_classify" -> (TextAnalysis.qNbClassify _),
    "q_logistic" -> (TextAnalysis.qLogistic _), // GD-trained classifier; oracle replays the training loop,
    "q_calibration" -> (TextAnalysis.qCalibration _),
    "q_bloom_decontam" -> (TextSearch.qBloomDecontam _),
    "q_heavy_hitters" -> (TextSearch.qHeavyHitters _), // CMS gated via tolerance booleans vs exact top-k,
    "q_novelty" -> (TextAnalysis.qNovelty _),
    "q_readability" -> (TextAnalysis.qReadability _), // Flesch-Kincaid grade, exact-int micro-division protocol,
    "q_pii_mask" -> (TextAnalysis.qPiiMask _),
    "q_blocklist" -> (TextAnalysis.qBlocklist _), // Aho-Corasick multi-pattern banned-phrase scan,
    "q_compress_ratio" -> (TextAnalysis.qCompressRatio _), // deflate quality screen, tolerance-gated
    // --- nested document model + ingest pipeline (SURVEY §1.1, §3.1),
    "q_kn_score" -> (TextSearch.qKnScore _), // KenLM-style per-doc perplexity under the KN bigram model,
    "q_normalize" -> (TextNormalize.qNormalize _),
    "q_unicode_nfc" -> (TextNormalize.qUnicodeNfc _), // UAX#15 canonical composition, two independent implementations gated,
    "q_c4_filters" -> (TextNormalize.qC4Filters _),
    // --- corpus statistics / tokenizer induction
    "q_stopword_df" -> (TextSearch.qStopwordDf _),
    "q_bpe_pairs" -> (TextSearch.qBpePairs _),
    "q_bpe_train" -> (TextSearch.qBpeTrain _),
    "q_unigram_lm" -> (TextSearch.qUnigramLm _), // SentencePiece-family hard-EM tokenizer,
    "q_wordpiece" -> (TextSearch.qWordpiece _), // WordPiece greedy longest-match encode,
    "q_bpe_encode" -> (TextSearch.qBpeEncode _),
    "q_tok_fertility" -> (TextSearch.qTokFertility _), // per-lang BPE tokens/word + chars/token equity report,
    "q_bigram_lm" -> (TextSearch.qBigramLm _),
    "q_kneser_ney" -> (TextSearch.qKneserNey _), // interpolated-KN bigram LM (the KenLM filter shape),
    "q_vocab_coverage" -> (TextSearch.qVocabCoverage _),
    // --- ROUGE n-gram overlap (generation-eval metric, clipped counts)
    "q_rouge" -> (TextAnalysis.qRouge _),
    // --- Cohen's kappa (chance-corrected classifier/annotator agreement)
    "q_kappa" -> (TextAnalysis.qKappa _),
    // --- trained char-n-gram langid (Cavnar-Trenkle rank profiles)
    "q_langid_trained" -> (TrainedLangId.qLangIdTrained _),
    // --- distinct-n corpus diversity (mode-collapse detector)
    "q_distinct_n" -> (TextAnalysis.qDistinctN _),
    // --- Luhn checksum screen (checksum-validated PII precision)
    "q_luhn" -> (TextAnalysis.qLuhn _),
  )

  val oracleSql: Map[String, String] = Map(
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
    // readability: the counting rules ARE the contract (words = whitespace
    // runs; sentences = max(1, [.!?] runs); syllables = per-word max(1,
    // [aeiouy] runs) = corpus group count + no-vowel word count, since
    // vowel groups never span whitespace); FK as ONE rounded division of
    // exact BIGINTs over the common denominator 100*S*W
    "q_readability" ->
      ("WITH w AS (SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS words FROM documents), " +
        "c AS (SELECT doc_id, CAST(len(words) AS BIGINT) AS n_words, " +
        "greatest(CAST(1 AS BIGINT), CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT)) AS n_sentences, " +
        "CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) + " +
        "CAST(len(list_filter(words, x -> NOT regexp_matches(lower(x), '[aeiouy]'))) AS BIGINT) AS n_syllables " +
        "FROM w) " +
        "SELECT doc_id, n_words, n_sentences, n_syllables, " +
        "round(CAST(39 * n_words * n_words + 1180 * n_syllables * n_sentences " +
        "- 1559 * n_sentences * n_words AS DOUBLE) / (100 * n_sentences * n_words), 6) AS fk_grade " +
        "FROM c WHERE n_words > 0 ORDER BY doc_id"),
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
    "q_logistic" -> logisticOracleSql,
    // deflate ratios are zlib-build-dependent, so the gate is the
    // tolerance pattern: exact UTF-8 byte counts + booleans the engine
    // must prove (stored-block expansion bound; repetition-collapse
    // property for quadrupled text inside the LZ77 window)
    "q_compress_ratio" ->
      ("SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes, " +
        "TRUE AS compress_ok, TRUE AS rep_detected " +
        "FROM documents ORDER BY doc_id"),
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
    // positional phrase match: candidate starts = token positions
    // anchored by term offset, intersected across the phrase's terms
    "q_phrase_search" ->
      ("WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents), " +
        "p AS (SELECT doc_id, i FROM (SELECT doc_id, w, " +
        "unnest(generate_series(1, len(w) - 1)) AS i FROM t) " +
        "WHERE w[i] = 'part' AND w[i+1] = 'filter') " +
        "SELECT doc_id, count(*) AS n_matches, CAST(min(i) - 1 AS BIGINT) AS first_pos " +
        "FROM p GROUP BY 1 ORDER BY doc_id"),
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
    // NFC gate: the oracle builds the identical decomposed string via
    // chr() and normalizes with utf8proc — an INDEPENDENT UAX#15
    // implementation from the engine's java.text.Normalizer; composed
    // bytes, code-point lengths and the changed flag must all agree
    "q_unicode_nfc" ->
      ("WITH n AS (SELECT doc_id, 'w' || CAST(doc_id % 7 AS VARCHAR) || ' ' || " +
        "'cafe' || chr(769) || ' ' || " +
        "CASE WHEN doc_id % 3 = 0 THEN chr(8491) || 'ngstro' || chr(776) || 'm ' ELSE '' END || " +
        "CASE WHEN doc_id % 2 = 0 THEN 'a' || chr(778) || 'r ' ELSE '' END || " +
        "'plain' || CAST(doc_id % 5 AS VARCHAR) AS raw FROM documents) " +
        "SELECT doc_id, raw, nfc_normalize(raw) AS nfc_text, " +
        "CAST(length(raw) AS BIGINT) AS len_raw, " +
        "CAST(length(nfc_normalize(raw)) AS BIGINT) AS len_nfc, " +
        "raw <> nfc_normalize(raw) AS changed FROM n ORDER BY doc_id"),
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
    "q_bpe_encode" -> bpeEncodeOracleSql(TextSearch.BpeMerges),
    // fertility: the FULL train+encode oracle chain as a subquery, then
    // a lang-keyed aggregation with round-half-up integer divisions
    // (DuckDB sum() widens to HUGEINT — every division CASTs back)
    "q_tok_fertility" ->
      ("SELECT w.lang, CAST(count(*) AS BIGINT) AS n_docs, " +
        "CAST(sum(e.n_bpe_tokens) AS BIGINT) AS toks, " +
        "CAST((2 * sum(e.n_bpe_tokens) * 1000000 + sum(w.nw)) // (2 * sum(w.nw)) AS BIGINT) AS fertility_micros, " +
        "CAST((2 * sum(w.nc) * 1000000 + sum(e.n_bpe_tokens)) // (2 * sum(e.n_bpe_tokens)) AS BIGINT) AS chars_per_tok_micros " +
        s"FROM (${bpeEncodeOracleSql(TextSearch.BpeMerges).stripSuffix(" ORDER BY doc_id")}) e " +
        "JOIN (SELECT doc_id, lang, CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS nw, " +
        "CAST(length(text) AS BIGINT) AS nc FROM documents) w USING (doc_id) " +
        "GROUP BY w.lang ORDER BY lang"),
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
    // Luhn screen: the oracle replays the NUMBER CONSTRUCTION (prefix
    // derivation + the SQL Luhn closure for the check digit) and states
    // the verdict closed-form by id parity; the engine VALIDATES the
    // final string declaratively — independent sides, either side's
    // checksum slip hash-mismatches
    "q_luhn" ->
      ("WITH p AS (SELECT doc_id, " +
        "'4' || lpad(CAST((doc_id * 37) % 100000000000000 AS VARCHAR), 14, '0') AS prefix " +
        "FROM documents), " +
        "b AS (SELECT doc_id, prefix, CAST(list_sum(list_transform(generate_series(1, 15), i -> " +
        "CASE WHEN i % 2 = 1 THEN " +
        "IF(2 * (ascii(substr(prefix, i, 1)) - 48) > 9, " +
        "2 * (ascii(substr(prefix, i, 1)) - 48) - 9, " +
        "2 * (ascii(substr(prefix, i, 1)) - 48)) " +
        "ELSE ascii(substr(prefix, i, 1)) - 48 END)) AS BIGINT) AS base FROM p) " +
        "SELECT doc_id, prefix || CAST(CASE WHEN doc_id % 2 = 0 " +
        "THEN (10 - base % 10) % 10 " +
        "ELSE ((10 - base % 10) % 10 + 1) % 10 END AS VARCHAR) AS pan, " +
        "doc_id % 2 = 0 AS luhn_valid " +
        "FROM b ORDER BY doc_id"),
    // distinct-n diversity: positional n-grams WITH multiplicity per n,
    // exact counts, one rounded division each
    "q_distinct_n" ->
      ("WITH w AS (SELECT string_split_regex(trim(text), '\\s+') AS words " +
        "FROM documents WHERE text IS NOT NULL), " +
        "g1 AS (SELECT unnest(words) AS g FROM w WHERE len(words) >= 1), " +
        "g2 AS (SELECT unnest([words[i] || ' ' || words[i+1] " +
        "for i in generate_series(1, len(words) - 1)]) AS g FROM w WHERE len(words) >= 2), " +
        "g3 AS (SELECT unnest([words[i] || ' ' || words[i+1] || ' ' || words[i+2] " +
        "for i in generate_series(1, len(words) - 2)]) AS g FROM w WHERE len(words) >= 3) " +
        "SELECT 1 AS n, count(*) AS total, count(DISTINCT g) AS n_distinct, " +
        "round(CAST(count(DISTINCT g) AS DOUBLE) / count(*), 6) AS distinct_ratio FROM g1 " +
        "UNION ALL SELECT 2, count(*), count(DISTINCT g), " +
        "round(CAST(count(DISTINCT g) AS DOUBLE) / count(*), 6) FROM g2 " +
        "UNION ALL SELECT 3, count(*), count(DISTINCT g), " +
        "round(CAST(count(DISTINCT g) AS DOUBLE) / count(*), 6) FROM g3 ORDER BY n"),
    // trained Cavnar-Trenkle langid: the oracle replays the ENTIRE chain
    // — per-class substitution cipher (translate), trigram multiset,
    // top-40 rank profiles on (count DESC, trigram ASC), the |rank
    // diff|-or-penalty distance, argmin with ties to the smaller class.
    // All integer arithmetic: hash-exact.
    "q_langid_trained" ->
      ("WITH corpus AS (SELECT doc_id, CAST(doc_id % 3 AS INTEGER) AS cls, " +
        "CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN lower(text) " +
        "WHEN 1 THEN translate(lower(text), 'abcdefghijklmnopqrstuvwxyz', 'hijklmnopqrstuvwxyzabcdefg') " +
        "ELSE translate(lower(text), 'abcdefghijklmnopqrstuvwxyz', 'opqrstuvwxyzabcdefghijklmn') END AS t " +
        "FROM documents), " +
        "tr AS (SELECT cls, unnest(list_transform(generate_series(1, length(t) - 2), i -> substr(t, i, 3))) AS tri " +
        "FROM corpus WHERE length(t) >= 3 AND doc_id % 2 = 0), " +
        "cp0 AS (SELECT cls, tri, count(*) AS n FROM tr GROUP BY cls, tri), " +
        "cp AS (SELECT cls, tri, rank FROM (SELECT cls, tri, " +
        "CAST(row_number() OVER (PARTITION BY cls ORDER BY n DESC, tri) AS BIGINT) AS rank FROM cp0) " +
        "WHERE rank <= 40), " +
        "dt AS (SELECT doc_id, unnest(list_transform(generate_series(1, length(t) - 2), i -> substr(t, i, 3))) AS tri " +
        "FROM corpus WHERE length(t) >= 3 AND doc_id % 2 = 1), " +
        "dp0 AS (SELECT doc_id, tri, count(*) AS n FROM dt GROUP BY doc_id, tri), " +
        "dpk AS (SELECT doc_id, tri, r_doc FROM (SELECT doc_id, tri, " +
        "CAST(row_number() OVER (PARTITION BY doc_id ORDER BY n DESC, tri) AS BIGINT) AS r_doc FROM dp0) " +
        "WHERE r_doc <= 40), " +
        "nd AS (SELECT doc_id, count(*) AS n_doc FROM dpk GROUP BY doc_id), " +
        "mt AS (SELECT dpk.doc_id, cp.cls, sum(abs(dpk.r_doc - cp.rank)) AS matched_dist, " +
        "count(*) AS n_matched FROM dpk JOIN cp ON dpk.tri = cp.tri GROUP BY dpk.doc_id, cp.cls), " +
        "allc AS (SELECT nd.doc_id, c.cls, CAST(coalesce(mt.matched_dist, 0) + " +
        "(nd.n_doc - coalesce(mt.n_matched, 0)) * 40 AS BIGINT) AS dist " +
        "FROM nd CROSS JOIN (SELECT unnest([0, 1, 2]) AS cls) c " +
        "LEFT JOIN mt ON mt.doc_id = nd.doc_id AND mt.cls = c.cls), " +
        "pr AS (SELECT doc_id, cls, dist, " +
        "row_number() OVER (PARTITION BY doc_id ORDER BY dist, cls) AS rn FROM allc) " +
        "SELECT pr.doc_id, CAST(pr.doc_id % 3 AS INTEGER) AS lang_cls, " +
        "CAST(pr.cls AS INTEGER) AS lang_pred, pr.dist AS dist, " +
        "pr.doc_id % 3 = pr.cls AS correct " +
        "FROM pr WHERE pr.rn = 1 ORDER BY pr.doc_id"),
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
