package graft.operators

import graft.engine.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational operator set: scans, filters, projections, joins,
  * aggregations, scalar functions, sorts and set ops (SURVEY.md §2.2-2.7).
  *
  * Each method is one declared query in [[graft.SparkEntry.queries]] with a
  * DuckDB oracle. All end in a TOTAL orderBy (the reference relies on Mongo
  * natural order, SURVEY.md §2.2 P10 — we pin determinism instead).
  *
  * Scale posture: every filter/projection here is expressible against the
  * Parquet scan, so Catalyst pushes predicates + prunes columns (verified
  * via explain in the specs); dim joins broadcast; aggregations are
  * partial-aggregated map-side before the single hash shuffle.
  */
object Relational {
  import Tables._

  /** P1 match-all scan + P8 column pruning: the `find({})` pattern
    * (data_ingestion.py:306,516,556) but with only the referenced columns
    * read from storage. */
  def scanProject(s: SparkSession, d: String): DataFrame =
    documents(s, d).select("doc_id", "lang", "n_chars").orderBy("doc_id")

  /** P2 single-key equality filter: `{'document_name': x}`
    * (data_ingestion.py:381,419,454). */
  def filterEq(s: SparkSession, d: String): DataFrame =
    documents(s, d).filter(col("lang") === "en")
      .select("doc_id", "lang", "n_chars").orderBy("doc_id")

  /** P3 conjunctive equality: `{"document_name": n, "category_id": c}`
    * (data_ingestion.py:384,389; intended semantics — the reference raises
    * NameError there, SURVEY.md §2.2 P3). */
  def filterConj(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .filter(col("o_orderstatus") === "F" && col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey", "o_custkey", "o_totalprice").orderBy("o_orderkey")

  /** P4 not-null + P5 date comparison: the expiry-sweep predicate
    * `{"document_expiryDate": {"$ne": None}}` then
    * `fromisoformat(expiry) < today` (data_ingestion.py:486,488). Here the
    * date is a real typed column so the WHOLE predicate pushes to the scan
    * — no client-side residual like the reference's string-date loop. */
  def filterNotNullDate(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .filter(col("o_orderdate").isNotNull &&
        col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
      .select("o_orderkey", "o_orderdate").orderBy("o_orderkey")

  /** P6/A2 existence: `document_exist` fetches ALL docs then loops in
    * Python (data_ingestion.py:302-315); here it is a pushed filter +
    * count aggregate. */
  def existsCount(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(orders(s, d).select("o_custkey"), col("c_custkey") === col("o_custkey"), "left_semi")
      .agg(count(lit(1)).as("n_customers_with_orders"))

  /** P7 membership in dim values: `category_name in repo.values()`
    * (data_ingestion.py:338,347) -> isin. */
  def filterIsin(s: SparkSession, d: String): DataFrame =
    nation(s, d)
      .filter(col("n_name").isin("NATION_1", "NATION_7", "NATION_19"))
      .select("n_nationkey", "n_name").orderBy("n_nationkey")

  /** P9 multi-field projection + rename: `retrieve_document_info`
    * (data_ingestion.py:471-477). */
  def projectRename(s: SparkSession, d: String): DataFrame =
    orders(s, d).select(
      col("o_orderkey").as("id"),
      col("o_orderstatus").as("status"),
      col("o_totalprice").as("price"))
      .orderBy("id").limit(100)

  /** P10/O1 first-row access: `document[0]` (data_ingestion.py:421,472) with
    * an explicit total order (the reference relies on Mongo natural order). */
  def firstRow(s: SparkSession, d: String): DataFrame =
    customer(s, d).select("c_custkey", "c_name").orderBy("c_custkey").limit(1)

  /** P11 dim projection: `retrieve_categories` (data_ingestion.py:461-466). */
  def dimProject(s: SparkSession, d: String): DataFrame =
    nation(s, d).select("n_name").orderBy("n_name")

  /** J1 broadcast dim lookup: `category_repo[category_id]` at upload
    * (data_ingestion.py:248). nation⋈region plays doc⋈category; the dim is
    * broadcast so the join is shuffle-free at any fact-side scale. */
  def joinDim(s: SparkSession, d: String): DataFrame =
    nation(s, d)
      .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"), col("r_name").as("region_name"))
      .orderBy("n_nationkey")

  /** J3 anti-join: upload dedup "document already exists"
    * (data_ingestion.py:233) -> customers with no URGENT orders (the
    * unfiltered variant is vacuously empty in the test data). */
  def antiJoin(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(
        orders(s, d).filter(col("o_orderpriority") === "1-URGENT").select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name").orderBy("c_custkey")

  /** J4 semi-join: cascade-delete target set `omit_category`
    * (data_ingestion.py:351-357) -> suppliers having lineitems. */
  def semiJoin(s: SparkSession, d: String): DataFrame =
    supplier(s, d)
      .join(lineitem(s, d).select("l_suppkey"), col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select("s_suppkey", "s_name").orderBy("s_suppkey")

  /** A1 count (data_ingestion.py:550). */
  def countAll(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).agg(count(lit(1)).as("n"))

  /** A3 collect-list per group: names under one category
    * (data_ingestion.py:451-459), generalized to groupBy + sorted
    * collect_list; joined to a string for engine-independent hashing. */
  def collectListPerGroup(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .groupBy("c_nationkey")
      .agg(array_join(sort_array(collect_list(col("c_name"))), "|").as("names"))
      .orderBy("c_nationkey")

  /** A4 distinct-by-key: set semantics on document_name across uploads
    * (data_ingestion.py:228-234). */
  def distinctKeys(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).select("l_returnflag", "l_linestatus").distinct()
      .orderBy("l_returnflag", "l_linestatus")

  /** Aggregation extension (SURVEY.md §2.4 "absent" row): full grouped
    * aggregate in the TPC-H Q1 shape. Money columns are summed as exact
    * DECIMAL(18,2) then surfaced as DOUBLE so Spark and DuckDB hash
    * identically (SURVEY.md §7.6.2); partial aggregation happens map-side
    * before the single shuffle on the group keys. */
  def aggPricingSummary(s: SparkSession, d: String): DataFrame = {
    val dec = "decimal(18,2)"
    lineitem(s, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity").cast(dec)).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast(dec)).cast("double").as("sum_base_price"),
        sum((col("l_extendedprice").cast(dec) * (lit(1).cast(dec) - col("l_discount").cast(dec)))
          .cast("decimal(38,4)")).cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** C1/C4 string concat + int cast: page link build
    * (data_ingestion.py:128,163). */
  def pageLink(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(
        col("doc_id"),
        concat(col("source"), lit("#page="), col("doc_id").cast("string")).as("page_link"))
      .orderBy("doc_id")

  /** C3/C9 template formatting + record render: the status-message builder
    * (data_ingestion.py:234,291,478-481). */
  def renderInfo(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(
        col("doc_id"),
        format_string("doc_id : %d | lang : %s | n_chars : %d",
          col("doc_id"), col("lang"), col("n_chars")).as("info"))
      .orderBy("doc_id")

  /** C5/C6/C7 date functions: today/ISO-render/parse/compare
    * (data_ingestion.py:255,485,488). current_date() is not oracle-stable,
    * so the "today" is a fixed literal here. */
  def dateFuncs(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .select(
        col("o_orderkey"),
        col("o_orderdate").cast("date").as("order_date"),
        year(col("o_orderdate")).cast("long").as("order_year"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_iso"),
        date_add(col("o_orderdate").cast("date"), 30).as("due_date"),
        (col("o_orderdate").cast("date") < lit("1997-06-01").cast("date")).as("is_old"))
      .orderBy("o_orderkey").limit(1000)

  /** O2 union (compensation re-insert, data_ingestion.py:359,522,391):
    * unionByName + distinct restores a set. */
  def unionRestore(s: SparkSession, d: String): DataFrame = {
    val r = region(s, d).select("r_regionkey", "r_name")
    r.unionByName(r).distinct().orderBy("r_regionkey")
  }

  /** EXCEPT / INTERSECT set ops (the §2.7 family beyond union): customers
    * that never ordered vs customers that did — each a distinct-based set
    * difference/intersection Catalyst plans as an aggregate + hash
    * anti/semi join (no sort, no cartesian). */
  def qSetOps(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d).select(col("c_custkey").as("custkey"))
    val o = orders(s, d).select(col("o_custkey").as("custkey"))
    c.except(o).withColumn("tag", lit("no_orders"))
      .unionByName(c.intersect(o).withColumn("tag", lit("with_orders")))
      .orderBy("tag", "custkey")
  }

  /** Deterministic bottom-k "reservoir" sample: the k rows with the
    * smallest text-hash values form a uniform without-replacement sample
    * that is (a) a pure function of the data — stable across reruns,
    * partitionings, engines — and (b) MERGEABLE: the bottom-k of a union
    * is the bottom-k of the per-shard bottom-k's, so each executor ships
    * only k candidate rows and the plan is a TakeOrdered, never a full
    * sort shuffle. The classic bottom-k sketch, and the scale-safe answer
    * to "give me a reproducible 64-doc sample of a 100 TB corpus". */
  def qReservoir(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), graft.functions.GraftFunctions.poly_hash(col("text")).as("h"))
      .orderBy(col("h"), col("doc_id")).limit(64)
}
