package graft
package entry

import graft.engine.Tables
import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}
import OracleHelpers._

/** Reference surface (SURVEY §2.1-2.9): scans, filters, joins, aggregations, snippet pipeline, scalar functions, set ops, mutations-as-snapshots, nested-doc ingest, command dispatch — driver-contract registrations and their
  * DuckDB oracles, moved verbatim from the monolithic SparkEntry
  * (round 8; SparkEntry concatenates the per-module registries). */
private[graft] object CoreEntries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
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
    "q_cdc_diff" -> (Mutations.qCdcDiff _),
    "q_time_travel" -> (Mutations.qTimeTravel _), // readAsOf over the versioned store + immutable-history rollback,
    "q_cdc_feed" -> (Mutations.qCdcFeed _), // change-data-feed between published versions (the Delta CDF shape),
    "q_delta_read" -> (Mutations.qDeltaRead _), // external Delta-layout table resolved through versions()/readAsOf(),
    "q_delta_write" -> (Mutations.qDeltaWrite _), // Delta-layout writer: append/replace commits, checkpoint, log prune,
    "q_delta_cdf" -> (Mutations.qDeltaCdf _), // change-data-feed over the EXTERNAL layout through the same operator,
    "q_delta_v2" -> (Mutations.qDeltaV2 _), // v2-manifest checkpoint (sidecars + readerFeatures gate) reconstructs pruned versions,
    "q_delta_vacuum" -> (Mutations.qDeltaVacuum _), // data retention: unreadable versions' files reclaimed, live content intact,
    "q_delta_migrate" -> (Mutations.qDeltaMigrate _), // Snapshot-store history imported into the Delta layout, version-aligned,
    "q_dispatch" -> (graft.streaming.CommandDispatch.qDispatch _),
    "q_dispatch_sweep" -> (graft.streaming.CommandDispatch.qDispatchSweep _), // T4 expiry sweep through the dispatch maintenance hook,
    "q_ingest_flatten" -> (Ingest.qIngestFlatten _),
    "q_nested_project" -> (Ingest.qNestedProject _),
  )

  val oracleSql: Map[String, String] = Map(
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
    // time travel: each published version's set algebra restated from the
    // documents table in closed form — v_0 = base slice, v_1 = v_0 plus
    // the insert batch (disjoint keys), v_2 = v_1 minus the delete sweep,
    // v_3 = rollback re-publish of v_1 (and the only current version)
    "q_time_travel" ->
      ("WITH v0 AS (SELECT count(*) AS n, CAST(coalesce(sum(doc_id), 0) AS BIGINT) AS s FROM documents WHERE doc_id < 100), " +
        "v1 AS (SELECT count(*) AS n, CAST(coalesce(sum(doc_id), 0) AS BIGINT) AS s FROM documents WHERE doc_id < 150), " +
        "v2 AS (SELECT count(*) AS n, CAST(coalesce(sum(doc_id), 0) AS BIGINT) AS s FROM documents WHERE doc_id < 150 AND doc_id % 10 <> 0) " +
        "SELECT 'v_0' AS version, n AS n_docs, s AS sum_ids, false AS is_current FROM v0 " +
        "UNION ALL SELECT 'v_1', n, s, false FROM v1 " +
        "UNION ALL SELECT 'v_2', n, s, false FROM v2 " +
        "UNION ALL SELECT 'v_3', n, s, true FROM v1 " +
        "ORDER BY version"),
    // change feed v_0 -> v_1 in closed form: deletes (doc_id % 17 = 0,
    // no new content), edits (% 13 = 0 among survivors, new text has the
    // EDITED suffix), inserts (shifted ids, new text = text)
    "q_cdc_feed" ->
      ("SELECT doc_id, 'deleted' AS change, CAST(NULL AS VARCHAR) AS new_text " +
        "FROM documents WHERE doc_id < 120 AND doc_id % 17 = 0 " +
        "UNION ALL SELECT doc_id, 'changed', text || ' EDITED' " +
        "FROM documents WHERE doc_id < 120 AND doc_id % 17 <> 0 AND doc_id % 13 = 0 " +
        "UNION ALL SELECT doc_id + 5000, 'added', text FROM documents WHERE doc_id < 10 " +
        "ORDER BY doc_id"),
    // external Delta-layout read: v_0 = first append, v_1 = + second
    // append, v_2 = compaction commit (remove f0, re-add every-10th-
    // dropped rewrite) — each version's set algebra in closed form
    "q_delta_read" ->
      ("WITH v0 AS (SELECT count(*) AS n, CAST(coalesce(sum(doc_id), 0) AS BIGINT) AS s FROM documents WHERE doc_id < 100), " +
        "v1 AS (SELECT count(*) AS n, CAST(coalesce(sum(doc_id), 0) AS BIGINT) AS s FROM documents WHERE doc_id < 150), " +
        "v2 AS (SELECT count(*) AS n, CAST(coalesce(sum(doc_id), 0) AS BIGINT) AS s FROM documents " +
        "WHERE doc_id >= 100 AND doc_id < 150 OR doc_id < 100 AND doc_id % 10 <> 0) " +
        "SELECT 'v_0' AS version, n AS n_docs, s AS sum_ids FROM v0 " +
        "UNION ALL SELECT 'v_1', n, s FROM v1 " +
        "UNION ALL SELECT 'v_2', n, s FROM v2 " +
        "ORDER BY version"),
    // Delta-layout writer round trip: after the checkpoint + log prune
    // only v_2 (replace commit, read via the checkpoint) and v_3 (append
    // on top) are in retention — exactly two rows, in closed form
    "q_delta_write" ->
      ("WITH v2 AS (SELECT count(*) AS n, CAST(coalesce(sum(doc_id), 0) AS BIGINT) AS s FROM documents " +
        "WHERE doc_id < 160 AND doc_id % 7 <> 0), " +
        "v3 AS (SELECT count(*) AS n, CAST(coalesce(sum(doc_id), 0) AS BIGINT) AS s FROM documents " +
        "WHERE doc_id < 160 AND doc_id % 7 <> 0 OR doc_id >= 160 AND doc_id < 200) " +
        "SELECT 'v_2' AS version, n AS n_docs, s AS sum_ids FROM v2 " +
        "UNION ALL SELECT 'v_3', n, s FROM v3 " +
        "ORDER BY version"),
    // CDF over the external layout: identical mutation recipe to
    // q_cdc_feed (deletes % 17, edits % 13 among survivors, +5000
    // inserts), so the same closed-form oracle applies — one feed
    // operator, two stores, both hash-gated
    "q_delta_cdf" ->
      ("SELECT doc_id, 'deleted' AS change, CAST(NULL AS VARCHAR) AS new_text " +
        "FROM documents WHERE doc_id < 120 AND doc_id % 17 = 0 " +
        "UNION ALL SELECT doc_id, 'changed', text || ' EDITED' " +
        "FROM documents WHERE doc_id < 120 AND doc_id % 17 <> 0 AND doc_id % 13 = 0 " +
        "UNION ALL SELECT doc_id + 5000, 'added', text FROM documents WHERE doc_id < 10 " +
        "ORDER BY doc_id"),
    // store migration: each Snapshot version imports as one replace
    // commit, so destination version k = source version k exactly —
    // three closed-form rows; a dropped/reordered version or lost rows
    // anywhere hash-mismatches
    "q_delta_migrate" ->
      ("WITH v0 AS (SELECT count(*) AS n, CAST(coalesce(sum(doc_id), 0) AS BIGINT) AS s FROM documents WHERE doc_id < 50), " +
        "v1 AS (SELECT count(*) AS n, CAST(coalesce(sum(doc_id), 0) AS BIGINT) AS s FROM documents WHERE doc_id < 100), " +
        "v2 AS (SELECT count(*) AS n, CAST(coalesce(sum(doc_id), 0) AS BIGINT) AS s FROM documents " +
        "WHERE doc_id < 100 AND doc_id % 7 <> 0) " +
        "SELECT 'v_0' AS version, n AS n_docs, s AS sum_ids FROM v0 " +
        "UNION ALL SELECT 'v_1', n, s FROM v1 " +
        "UNION ALL SELECT 'v_2', n, s FROM v2 " +
        "ORDER BY version"),
    // v2-checkpoint read: v_1 = both appends, reconstructed from the v2
    // manifest + sidecars alone (JSON commits pruned); v_2 = the
    // compaction commit on top — same set algebra as q_delta_read's tail
    "q_delta_v2" ->
      ("WITH v1 AS (SELECT count(*) AS n, CAST(coalesce(sum(doc_id), 0) AS BIGINT) AS s FROM documents WHERE doc_id < 150), " +
        "v2 AS (SELECT count(*) AS n, CAST(coalesce(sum(doc_id), 0) AS BIGINT) AS s FROM documents " +
        "WHERE doc_id >= 100 AND doc_id < 150 OR doc_id < 100 AND doc_id % 10 <> 0) " +
        "SELECT 'v_1' AS version, n AS n_docs, s AS sum_ids FROM v1 " +
        "UNION ALL SELECT 'v_2', n, s FROM v2 " +
        "ORDER BY version"),
    // data retention: after replace + checkpoint + log prune, vacuum
    // reclaims the replaced version's files (vacuum_removed TRUE) and
    // the surviving version reads back exactly the source rows
    "q_delta_vacuum" ->
      ("SELECT doc_id, text, TRUE AS vacuum_removed FROM documents " +
        "WHERE doc_id < 100 ORDER BY doc_id"),
    "q_dim_insert" ->
      ("SELECT category_id, category_name FROM (" +
        "SELECT CAST(r_regionkey AS BIGINT) AS category_id, r_name AS category_name FROM region " +
        "UNION ALL SELECT category_id, category_name FROM " +
        "(VALUES (CAST(100 AS BIGINT), 'AFRICA'), (101, 'BRAND_NEW_CATEGORY')) t(category_id, category_name) " +
        "WHERE category_name NOT IN (SELECT r_name FROM region)) " +
        "ORDER BY category_id"),
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
    "q_dispatch" ->
      ("SELECT document_id, category_id FROM (" +
        "SELECT doc_id AS document_id, CAST(doc_id % 5 AS INTEGER) AS category_id FROM documents " +
        "WHERE doc_id <> 3 AND doc_id % 5 <> 4 " +
        "UNION ALL SELECT CAST(9001 AS BIGINT), CAST(2 AS INTEGER)) ORDER BY document_id"),
    // T4 sweep through the dispatch maintenance hook: every status in
    // closed form — seed rows expire iff doc_id % 3 = 0 (past expiry),
    // the same-batch upload with a past expiry expires too, future/NULL
    // expiries stay Active
    "q_dispatch_sweep" ->
      ("SELECT document_id, document_status, document_expiryDate FROM (" +
        "SELECT doc_id AS document_id, " +
        "CASE WHEN doc_id % 3 = 0 THEN 'Expired' ELSE 'Active' END AS document_status, " +
        "CASE WHEN doc_id % 3 = 0 THEN '2001-01-01' " +
        "WHEN doc_id % 3 = 1 THEN '2099-01-01' END AS document_expiryDate FROM documents " +
        "UNION ALL SELECT CAST(9001 AS BIGINT), 'Expired', '2002-02-02' " +
        "UNION ALL SELECT CAST(9002 AS BIGINT), 'Active', '2099-01-01') " +
        "ORDER BY document_id"),
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
    "q_nested_project" ->
      ("WITH w AS (SELECT doc_id, lang, source, string_split_regex(trim(text), '\\s+') AS words FROM documents) " +
        "SELECT doc_id AS document_id, CAST((len(words)-1)//40 + 1 AS BIGINT) AS n_pages, " +
        "source || '#page=1' AS first_page_link, lang AS first_tag, lang AS meta_lang, " +
        "CAST(list_sum([(len(words[p*40+1 : p*40+40]) - 1)//3 + 1 " +
        "for p in generate_series(0, (len(words)-1)//40)]) AS BIGINT) AS n_snippets " +
        "FROM w ORDER BY document_id"),
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
  )
}
