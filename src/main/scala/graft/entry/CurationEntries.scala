package graft
package entry

import graft.engine.Tables
import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}
import OracleHelpers._

/** Corpus curation: sampling, packing, splits, mixtures, budgets, preference pairs — driver-contract registrations and their
  * DuckDB oracles, moved verbatim from the monolithic SparkEntry
  * (round 8; SparkEntry concatenates the per-module registries). */
private[graft] object CurationEntries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- corpus curation extensions
    "q_sample_stratified" -> (Curation.qSampleStratified _),
    "q_pack_sequences" -> (Curation.qPackSequences _),
    "q_curate" -> (Curation.qCurate _),
    "q_split" -> (Curation.qSplit _),
    "q_chunk" -> (Curation.qChunk _),
    "q_mixture" -> (Curation.qMixture _),
    // --- DoReMi-style multiplicative-weights mixture optimization
    "q_doremi" -> (Doremi.qDoremi _),
    "q_doremi_kn" -> (Doremi.qDoremiKn _), // MW reweighting under the REAL KN log-perplexity proxy loss,
    "q_alpha_sample" -> (Curation.qAlphaSample _), // alpha=1/2 temperature-scaled domain sampling weights,
    // --- l-diversity audit (k-anonymity's sensitive-attribute companion)
    "q_ldiversity" -> (Curation.qLdiversity _),
    "q_curriculum" -> (Curation.qCurriculum _),
    "q_mix_plan" -> (Curation.qMixPlan _),
    "q_export_manifest" -> (Curation.qExportManifest _),
    "q_kanon" -> (Curation.qKanon _),
    "q_weighted_sample" -> (Curation.qWeightedSample _), // quality-proportional ES sampling
    // --- event analytics extensions,
    "q_span_corrupt" -> (Curation.qSpanCorrupt _), // T5-style span corruption with sentinel runs,
    "q_budget_select" -> (Curation.qBudgetSelect _),
    "q_split_safe" -> (Curation.qSplitSafe _),
    "q_negatives" -> (Curation.qNegatives _),
    "q_quota_sample" -> (Curation.qQuotaSample _),
    // --- preference-pair construction (DPO/RLHF prep over the scored pool)
    "q_dpo_pairs" -> (Curation.qDpoPairs _),
    "q_dq_checks" -> (Curation.qDqChecks _), // Deequ-shape publish contract: one agg pass, driver verdicts,
  )

  val oracleSql: Map[String, String] = Map(
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
        "SELECT doc_id, lang_pred, n_tokens, quality_score, 'inverted' AS strategy FROM lp " +
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
    "q_pack_sequences" ->
      ("WITH t AS (SELECT lang, doc_id, CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens FROM documents), " +
        "s AS (SELECT lang, doc_id, n_tokens, CAST(coalesce(sum(n_tokens) OVER (PARTITION BY lang " +
        "ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_token FROM t) " +
        "SELECT lang, doc_id, n_tokens, start_token // 2048 AS bin_id, start_token % 2048 AS bin_offset " +
        "FROM s ORDER BY doc_id"),
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
    // k-anonymity audit: under-k quasi-identifier groups flagged
    "q_kanon" ->
      ("SELECT c_nationkey, c_mktsegment, count(*) AS n, count(*) < 10 AS at_risk " +
        "FROM customer GROUP BY 1, 2 ORDER BY c_nationkey, c_mktsegment"),
    // Export manifest: per-shard totals; shard = doc_id mod 8
    "q_export_manifest" ->
      ("SELECT doc_id % 8 AS shard, count(*) AS n_docs, " +
        "CAST(sum(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT) AS n_tokens, " +
        "CAST(sum(n_chars) AS BIGINT) AS n_bytes, " +
        "min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id " +
        "FROM documents GROUP BY 1 ORDER BY shard"),
    // l-diversity: count-distinct of the bucketed sensitive attribute
    // per QI group; the bucket is floor of one IEEE division (portable)
    "q_ldiversity" ->
      ("SELECT c_nationkey, c_mktsegment, count(*) AS n, " +
        "CAST(count(DISTINCT CAST(floor(c_acctbal / 1000.0) AS BIGINT)) AS BIGINT) AS n_sensitive, " +
        "count(DISTINCT CAST(floor(c_acctbal / 1000.0) AS BIGINT)) < 3 AS at_risk " +
        "FROM customer GROUP BY 1, 2 ORDER BY c_nationkey, c_mktsegment"),
    // DoReMi reweighting: loss + all five MW iterations unrolled in
    // HUGEINT (scaled-integer, round-half-up divisions) — bit-exact vs
    // the engine's BigInt loop
    "q_doremi" -> doremiOracle(Doremi.Iterations),
    // DoReMi under the real proxy loss: the full KN chain (one ln per
    // distinct bigram, everything else exact integers) feeds the same
    // unrolled MW iterations — weights shift toward the domains the
    // in-repo LM finds hardest
    "q_doremi_kn" -> doremiKnOracle(Doremi.Iterations),
    // alpha sampling: sqrt is IEEE-exact, the Σ is an exact DECIMAL sum,
    // both divisions correctly rounded then 6dp-floored — hash-exact
    "q_alpha_sample" ->
      ("WITH c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source), " +
        "s AS (SELECT source, n_docs, " +
        "floor(sqrt(CAST(n_docs AS DOUBLE)) * 1000000 + 0.5) / 1000000 AS s6 FROM c), " +
        "t AS (SELECT CAST(sum(CAST(s6 AS DECIMAL(18,6))) AS DOUBLE) AS st, " +
        "CAST(sum(n_docs) AS DOUBLE) AS nt FROM s), " +
        "w AS (SELECT source, n_docs, " +
        "floor(s6 / (SELECT st FROM t) * 1000000 + 0.5) / 1000000 AS w_alpha FROM s) " +
        "SELECT source, n_docs, w_alpha, " +
        "floor(w_alpha * (SELECT nt FROM t) / CAST(n_docs AS DOUBLE) * 1000000 + 0.5) / 1000000 AS boost " +
        "FROM w ORDER BY source"),
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
    "q_quota_sample" ->
      ("WITH d AS (SELECT doc_id, lang, coalesce(text, '') AS t FROM documents), " +
        "r AS (SELECT doc_id, lang, row_number() OVER (PARTITION BY lang " +
        "ORDER BY list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        "list_transform(generate_series(1, length(t)), i -> CAST(ascii(t[i]) AS BIGINT))), " +
        "(a, c) -> (a * 31 + c) % 1000000007), doc_id) AS rnk FROM d) " +
        "SELECT doc_id, lang, CAST(rnk AS BIGINT) AS rnk FROM r WHERE rnk <= 25 ORDER BY doc_id"),
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
        "WHEN coalesce(rep.rep_r, h.own_r) = 1 THEN 'val' ELSE 'train' END AS split, " +
        "'inverted' AS strategy " +
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
    // data-quality contract: every observation restated as the same
    // exact-int form (one rounded division of exact counts), every
    // verdict restated as its closed-form comparison — an agg slip or a
    // verdict boundary error on either side hash-mismatches
    "q_dq_checks" ->
      ("WITH a AS (SELECT " +
        "round(CAST(sum(CASE WHEN doc_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS doc_id_complete, " +
        "round(CAST(count(DISTINCT doc_id) AS DOUBLE) / count(*), 6) AS doc_id_unique, " +
        "CAST(min(doc_id) AS DOUBLE) AS doc_id_non_negative, " +
        "round(CAST(sum(CASE WHEN lang IN ('en','de','zh','fr','es') THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS lang_accepted, " +
        "round(CAST(sum(CASE WHEN n_chars = length(text) THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS n_chars_consistent, " +
        "CAST(max(n_chars) AS DOUBLE) AS n_chars_bounded, " +
        "round(CAST(sum(CASE WHEN text IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS text_complete " +
        "FROM documents) " +
        "SELECT * FROM (" +
        "SELECT 'doc_id_complete' AS \"constraint\", doc_id_complete AS observed, doc_id_complete = 1.0 AS passed FROM a " +
        "UNION ALL SELECT 'doc_id_unique', doc_id_unique, doc_id_unique = 1.0 FROM a " +
        "UNION ALL SELECT 'doc_id_non_negative', doc_id_non_negative, doc_id_non_negative >= 0.0 FROM a " +
        "UNION ALL SELECT 'lang_accepted', lang_accepted, lang_accepted = 1.0 FROM a " +
        "UNION ALL SELECT 'n_chars_consistent', n_chars_consistent, n_chars_consistent = 1.0 FROM a " +
        "UNION ALL SELECT 'n_chars_bounded', n_chars_bounded, n_chars_bounded <= 10000.0 FROM a " +
        "UNION ALL SELECT 'text_complete', text_complete, text_complete = 1.0 FROM a" +
        ") ORDER BY \"constraint\""),
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
  )
}
