package graft

import graft.engine.Tables
import graft.entry._
import graft.operators.SnippetGen
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * One `queries` entry per implemented operator from SURVEY.md §2, each with
  * a DuckDB oracle in `oracleSql` (column names aliased identically in both
  * dialects; every query ends in a total ORDER BY for hash determinism).
  *
  * The registrations live in per-module registries under [[graft.entry]]
  * (each module's oracle SQL next to its operator family); this object is
  * the concatenation the driver reads. Key uniqueness across modules is
  * enforced at load — a collision fails Verify/Bench immediately instead
  * of silently shadowing a query.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The minimum end-to-end slice of SURVEY.md §7.3: documents -> tokenize
    * -> sliding windows (window 5 / stride 3, data_ingestion.py:39,190) ->
    * explode to flat snippets with parent attrs + page link. */
  def entry(spark: SparkSession): DataFrame =
    SnippetGen.docSnippets(Tables.documents(spark, "/root/testdata/sf0.001"))

  private val queryModules: Seq[Map[String, (SparkSession, String) => DataFrame]] = Seq(
    CoreEntries.queries,
    TextEntries.queries,
    CurationEntries.queries,
    DedupSimEntries.queries,
    MediaEntries.queries,
    SourceEntries.queries,
    StreamEventEntries.queries,
  )

  private val oracleModules: Seq[Map[String, String]] = Seq(
    CoreEntries.oracleSql,
    TextEntries.oracleSql,
    CurationEntries.oracleSql,
    DedupSimEntries.oracleSql,
    MediaEntries.oracleSql,
    SourceEntries.oracleSql,
    StreamEventEntries.oracleSql,
  )

  private def merged[V](maps: Seq[Map[String, V]], what: String): Map[String, V] = {
    val all = maps.flatten
    val dups = all.groupBy(_._1).collect { case (k, vs) if vs.size > 1 => k }
    require(dups.isEmpty, s"duplicate $what keys across entry modules: " +
      dups.toSeq.sorted.mkString(", "))
    all.toMap
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    merged(queryModules, "queries")

  val oracleSql: Map[String, String] = merged(oracleModules, "oracleSql")

  /** query -> cohort, derived from REGISTRY MEMBERSHIP (not a name-prefix
    * heuristic that could drift from the registries): the bench artifact
    * groups per-query timings into these subtotals so cost creep is
    * attributable to a family at a glance (VERDICT r10 Next #7). */
  val cohorts: Map[String, String] = {
    val named: Seq[(String, Map[String, (SparkSession, String) => DataFrame])] = Seq(
      "core" -> CoreEntries.queries,
      "text" -> TextEntries.queries,
      "curation" -> CurationEntries.queries,
      "dedupsim" -> DedupSimEntries.queries,
      "media" -> MediaEntries.queries,
      "sources" -> SourceEntries.queries,
      "streamevents" -> StreamEventEntries.queries,
    )
    named.flatMap { case (cohort, m) => m.keys.map(_ -> cohort) }.toMap
  }
}
