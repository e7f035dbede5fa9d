package graft

import graft.operators.EventAnalytics
import org.apache.spark.sql.functions._

/** Semantics of the ordered funnel and the cohort-retention rollup on
  * hand-built fixtures (the full queries are oracle-gated on the events
  * table; these pin the ORDERING rules the SQL alone doesn't make
  * obvious). */
class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, String, String)*) =
    rows.toDF("user_id", "event_type", "ts_s")
      .select(col("user_id"), col("event_type"), col("ts_s").cast("timestamp").as("ts"))

  test("funnel requires steps in order: an early purchase doesn't convert") {
    val events = ev(
      // user 1: purchase BEFORE view -> depth 2 (view, then click), the
      //   pre-view purchase must not count as step 3
      (1L, "purchase", "2024-01-01 00:00:00"),
      (1L, "view", "2024-01-01 01:00:00"),
      (1L, "click", "2024-01-01 02:00:00"),
      // user 2: full ordered funnel -> depth 3
      (2L, "view", "2024-01-01 00:00:00"),
      (2L, "click", "2024-01-01 00:30:00"),
      (2L, "purchase", "2024-01-01 00:45:00"),
      // user 3: click only, never viewed -> depth 0
      (3L, "click", "2024-01-01 00:00:00"),
      // user 4: same-timestamp view+click (>= boundary) -> depth 2
      (4L, "view", "2024-01-01 00:00:00"),
      (4L, "click", "2024-01-01 00:00:00"))
    val depths = EventAnalytics.funnel(events, Seq("view", "click", "purchase"))
      .select("user_id", "depth").as[(Long, Long)].collect().toMap
    assert(depths === Map(1L -> 2L, 2L -> 3L, 3L -> 0L, 4L -> 2L))
  }

  test("funnel picks the EARLIEST qualifying event per step") {
    val events = ev(
      (1L, "view", "2024-01-01 05:00:00"),
      (1L, "view", "2024-01-01 01:00:00"), // earlier view anchors the funnel
      (1L, "click", "2024-01-01 02:00:00")) // after the early view only
    val row = EventAnalytics.funnel(events, Seq("view", "click", "purchase"))
      .select(col("t1").cast("string"), col("t2").cast("string"), col("depth"))
      .as[(String, String, Long)].head()
    assert(row === (("2024-01-01 01:00:00", "2024-01-01 02:00:00", 2L)))
  }

  test("anomaliesTwoPhase is result-identical to the window formulation") {
    // real data: the full sf0.001 events table through both formulations
    val events = graft.engine.Tables.events(spark, sf0001)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("event_id", "user_id", "value", "z")
        .as[(Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
    val win = key(EventAnalytics.anomalies(events, 3.0))
    val twoPhase = key(EventAnalytics.anomaliesTwoPhase(events, 3.0))
    assert(win.nonEmpty, "fixture should flag at least one anomaly")
    assert(twoPhase === win)

    // adversarial fixture: a hot user holding 1/3 of all rows, a NULL
    // user_id group (a window partitions NULL together; a non-null-safe
    // join would drop it) and null values mixed into a flagged group
    val rows = (1 to 300).map { i =>
      val u: java.lang.Long = if (i % 3 == 0) 7L else if (i % 17 == 0) null
        else (i % 5).toLong
      val v: java.lang.Double = if (i == 90) 9999.0 else if (i % 13 == 0) null
        else (i % 7).toDouble
      (i.toLong, u, v)
    }
    val fix = rows.toDF("event_id", "user_id", "value")
    val winF = key(EventAnalytics.anomalies(fix, 3.0))
    val twoF = key(EventAnalytics.anomaliesTwoPhase(fix, 3.0))
    assert(winF.nonEmpty, "hot fixture should flag the planted outlier")
    assert(twoF === winF)
  }

  test("anomaly router: window while the hottest user fits, two_phase beyond") {
    val events = graft.engine.Tables.events(spark, sf0001)
    val (_, uniform) = EventAnalytics.anomaliesAutoTagged(events, 3.0)
    assert(uniform === "window",
      "gate-scale uniform users must stay on the single-shuffle window path")
    // same data, hot budget forced below the hottest user's real count:
    // the router must switch — and the routed result must still equal the
    // window result (both branches exact)
    val (routed, hot) = EventAnalytics.anomaliesAutoTagged(events, 3.0, hotRowBudget = 1L)
    assert(hot === "two_phase")
    val win = EventAnalytics.anomalies(events, 3.0)
      .select("event_id", "z").as[(Long, Double)].collect().sortBy(_._1).toSeq
    val got = routed.select("event_id", "z").as[(Long, Double)].collect().sortBy(_._1).toSeq
    assert(got === win)
  }

  test("estMaxUserRows is exact under the sample budget") {
    // user 1 holds the 40 head rows PLUS the six i%10==1 tail rows (41,
    // 51, ... 91) = 46 total; every other user has at most 7
    val fix = (1 to 100).map(i => (i.toLong, if (i <= 40) 1L else (i % 10).toLong))
      .toDF("event_id", "user_id")
    assert(EventAnalytics.estMaxUserRows(fix) === 46.0)
    assert(EventAnalytics.estMaxUserRows(fix.limit(0)) === 0.0)
  }

  test("anomalies flag only extreme values, never small or degenerate groups") {
    val rows = // user 1: 20 values at 10.0 plus one wild outlier
      (1 to 20).map(i => (i.toLong, 1L, 10.0)) ++ Seq((21L, 1L, 500.0)) ++
        // user 2: two events only (n < 3, skipped even though spread is huge)
        Seq((22L, 2L, 0.0), (23L, 2L, 1000.0)) ++
        // user 3: zero variance (identical values, z undefined, skipped)
        (24 to 28).map(i => (i.toLong, 3L, 7.0))
    val ev = rows.toDF("event_id", "user_id", "value")
    val out = graft.operators.EventAnalytics.anomalies(ev, 3.0)
      .select("event_id").as[Long].collect().toSet
    assert(out === Set(21L), s"only the planted outlier should flag: $out")
  }

  test("retention offsets anchor to each user's own first event") {
    val events = ev(
      // user 1 first seen Jan 1, returns 8 days later (week offset 1)
      (1L, "view", "2024-01-01 00:00:00"),
      (1L, "view", "2024-01-09 00:00:00"),
      // user 2 first seen Jan 2, active twice that day (offset 0 once)
      (2L, "view", "2024-01-02 00:00:00"),
      (2L, "click", "2024-01-02 12:00:00"),
      // boundary: exactly 7 days later is offset 1, 7 days minus 1us is 0
      (3L, "view", "2024-01-01 00:00:00"),
      (3L, "view", "2024-01-08 00:00:00"))
    val got = EventAnalytics.retention(events)
      .select(col("cohort_day").cast("string"), col("week_offset"), col("n_users"))
      .as[(String, Long, Long)].collect().toSet
    assert(got === Set(
      ("2024-01-01", 0L, 2L), // users 1 and 3 on their first day
      ("2024-01-01", 1L, 2L), // both return in week 1
      ("2024-01-02", 0L, 1L)))
  }
}
