package graft

import graft.operators.Relational

/** Scale-posture assertions (SURVEY §4, §7.6.5): plans must keep pushdown,
  * pruning and broadcast at any data size — checked on the physical plan,
  * not on timings. */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf0001).queryExecution.executedPlan.toString

  test("projection pruning reaches the parquet scan") {
    val p = plan("q_scan_project")
    assert(p.contains("ReadSchema"), p)
    // only the 3 selected columns are read, not `text`
    assert(!p.contains("text"), s"scan should not read text:\n$p")
  }

  test("filters are pushed into the parquet scan") {
    val p = plan("q_filter_eq")
    assert(p.contains("PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]"), p)
  }

  test("dim join broadcasts (no shuffle of the fact side)") {
    val p = plan("q_join_dim")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("semi/anti joins pick hash strategies, not nested loop") {
    assert(!plan("q_semi_join").contains("NestedLoop"))
    assert(!plan("q_anti_join").contains("NestedLoop"))
  }

  test("aggregate does map-side partial aggregation") {
    val p = plan("q_agg")
    // HashAggregate appears twice: partial + final
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("as-of join is one window shuffle, not a self-join") {
    val p = plan("q_asof_join")
    assert(!p.contains("Join"), s"as-of should not plan a join:\n$p")
    assert(p.contains("RunningWindowFunction") || p.contains("Window"), p)
  }

  test("range join keeps the user_id equi key (no cartesian)") {
    val p = plan("q_range_join")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("ingest flatten plan has no join except the broadcast dim lookup") {
    val p = plan("q_ingest_flatten")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("whole-stage codegen covers the snippet pipeline scan+generate") {
    // AQE's pre-execution plan string hides codegen spans; inspect with AQE off
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val p = SparkEntry.queries("q_snippets")(spark, sf0001)
        .queryExecution.executedPlan.toString
      // codegen spans render as `*(n)` in plan strings
      assert("""\*\(\d+\)""".r.findAllIn(p).nonEmpty, p)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
