package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench outlier-re-run mechanism (VERDICT r9 Next #2/#8): the
  * baseline must be the min across history (not just the last persisted
  * file), and the queries-object parse must survive format drift instead
  * of silently yielding an empty baseline (ADVICE r9). */
class BenchLogicSpec extends AnyFunSuite {

  private def line(qs: (String, Double)*): String =
    s"""{"metric":"total","value":1.0,"unit":"sec","queries":{${
      qs.map { case (k, v) => s""""$k":$v""" }.mkString(",")
    }},"errors":{},"reruns":{},"calibration":[0.1,0.1,0.1],"sf":"x"}"""

  test("parseQueries reads a real bench line") {
    val m = BenchLogic.parseQueries(line("q_a" -> 0.5, "q_b" -> 1.25e-1))
    assert(m === Map("q_a" -> 0.5, "q_b" -> 0.125))
  }

  test("parseQueries survives reordered keys (queries not first)") {
    val txt = """{"errors":{},"sf":"x","queries":{"q_a":2.0,"q_b":0.3},"value":9}"""
    assert(BenchLogic.parseQueries(txt) === Map("q_a" -> 2.0, "q_b" -> 0.3))
  }

  test("parseQueries survives a pretty-printer's whitespace (review finding)") {
    // spaces and newlines around ':' and ',' must parse identically —
    // surviving format drift is the class's reason to exist, and the
    // first cut silently dropped every whitespace-prefixed entry
    val txt = "{\"queries\": {\n  \"q_a\" : 2.0 ,\n  \"q_b\"\t: 0.3\n}, \"value\": 9}"
    assert(BenchLogic.parseQueries(txt) === Map("q_a" -> 2.0, "q_b" -> 0.3))
  }

  test("parseQueries skips a nested value instead of truncating the map") {
    // the r9 hand-scan stopped at the FIRST '}', losing every key after a
    // nested object; the balanced parse keeps the scalars around it
    val txt = """{"queries":{"q_a":1.5,"q_nested":{"x":1},"q_b":2.5},"sf":"x"}"""
    assert(BenchLogic.parseQueries(txt) === Map("q_a" -> 1.5, "q_b" -> 2.5))
  }

  test("parseQueries refuses malformed input rather than returning garbage") {
    assert(BenchLogic.parseQueries("""{"queries":{"q_a":1.5""") === Map.empty)
    assert(BenchLogic.parseQueries("""no queries here""") === Map.empty)
    assert(BenchLogic.parseQueries("""{"queries":[1,2]}""") === Map.empty)
  }

  test("baseline is the per-query MIN across history; error sentinels never bind") {
    val base = BenchLogic.baseline(Seq(
      line("q_a" -> 0.42, "q_b" -> 1.0), // noise-elevated most-recent run
      line("q_a" -> 0.15, "q_b" -> -1.0), // clean older run; q_b errored
      line("q_a" -> 0.20)))
    assert(base === Map("q_a" -> 0.15, "q_b" -> 1.0))
  }

  test("r9 blind spot replay: noisy persisted run no longer hides the outlier") {
    // Round 9: q_quality's clean cost was 0.15s (r8) but a noise-elevated
    // 0.42s run got persisted intra-round; the final 0.42s median then
    // compared against itself and "reruns":{} followed. With the min
    // across history, the 0.15 floor survives and 0.42 > 2 x 0.15 fires.
    val history = Seq(
      line("q_quality" -> 0.42, "q_bpe_train" -> 1.09, "q_quantize" -> 0.22),
      line("q_quality" -> 0.15, "q_bpe_train" -> 0.47, "q_quantize" -> 0.10))
    val base = BenchLogic.baseline(history)
    val current = Map("q_quality" -> 0.42, "q_bpe_train" -> 1.09,
      "q_quantize" -> 0.22, "q_steady" -> 0.20)
    assert(BenchLogic.outliers(current, base) ===
      Seq("q_bpe_train", "q_quality", "q_quantize"))
    // sanity: against ONLY the most recent (the old behavior) nothing fires
    assert(BenchLogic.outliers(current,
      BenchLogic.baseline(history.take(1))) === Seq.empty)
  }

  test("outliers ignores unknown and errored queries") {
    val base = Map("q_a" -> 0.1)
    assert(BenchLogic.outliers(Map("q_new" -> 5.0, "q_a" -> -1.0), base) === Seq.empty)
    assert(BenchLogic.outliers(Map("q_a" -> 0.19), base) === Seq.empty)
    assert(BenchLogic.outliers(Map("q_a" -> 0.21), base) === Seq("q_a"))
  }

  test("r10 blind spot replay: rerun agreeing with elevated reading escalates") {
    // Round 10: q_bm25 floor 0.77s, median 3.99s, rerun ALSO 3.99s — the
    // in-session rerun inherited the session pathology and the artifact
    // carried the elevated number with no signal. The escalation rule
    // records it unresolved; a rerun that corrected (0.8s) does not fire.
    val base = Map("q_bm25" -> 0.77, "q_fixed" -> 0.40)
    assert(BenchLogic.unresolved(
      Map("q_bm25" -> 3.99, "q_fixed" -> 0.45), base) === Seq("q_bm25"))
    assert(BenchLogic.unresolved(Map("q_bm25" -> 0.80), base) === Seq.empty)
    // errored reruns (-1) and queries with no floor never escalate
    assert(BenchLogic.unresolved(Map("q_bm25" -> -1.0, "q_new" -> 9.9), base)
      === Seq.empty)
    // sub-second scheduling wobble never escalates even at >2x relative:
    // a 0.08s floor vs a 0.17s reading is noise, not a cross-session
    // measurement problem (measured on this suite's fast tail)
    assert(BenchLogic.unresolved(
      Map("q_boilerplate" -> 0.25), Map("q_boilerplate" -> 0.084)) === Seq.empty)
    // ...but a fast query with a REAL multi-second regression still does
    assert(BenchLogic.unresolved(
      Map("q_fast" -> 1.2), Map("q_fast" -> 0.1)) === Seq("q_fast"))
  }

  test("parseUnresolved round-trips the artifact's array; drift reads empty") {
    val txt = """{"value":1,"reruns":{},"unresolved":["q_bm25","q_x"],"sf":"x"}"""
    assert(BenchLogic.parseUnresolved(txt) === Seq("q_bm25", "q_x"))
    assert(BenchLogic.parseUnresolved("""{"unresolved":[],"sf":"x"}""") === Seq.empty)
    assert(BenchLogic.parseUnresolved("""{"unresolved": [ "q_a" , "q_b" ]}""")
      === Seq("q_a", "q_b")) // pretty-printer whitespace
    assert(BenchLogic.parseUnresolved("""{"sf":"x"}""") === Seq.empty)
    assert(BenchLogic.parseUnresolved("""{"unresolved":["q_a"""") === Seq.empty)
    assert(BenchLogic.parseUnresolved("""{"unresolved":{"q_a":1}}""") === Seq.empty)
  }

  test("measureOrder puts prior unresolved first, rest in name order") {
    assert(BenchLogic.measureOrder(Seq("q_c", "q_a", "q_b"), Seq("q_b"))
      === Seq("q_b", "q_a", "q_c"))
    // stale priority names (query removed since) are dropped, dups collapse
    assert(BenchLogic.measureOrder(Seq("q_a", "q_b"), Seq("q_gone", "q_b", "q_b"))
      === Seq("q_b", "q_a"))
    assert(BenchLogic.measureOrder(Seq("q_b", "q_a"), Seq.empty)
      === Seq("q_a", "q_b"))
  }

  test("cohortTotals sums per cohort, drops error sentinels, pools unknowns") {
    val cohorts = Map("q_a" -> "core", "q_b" -> "core", "q_s" -> "streamevents")
    val totals = BenchLogic.cohortTotals(
      Map("q_a" -> 1.0, "q_b" -> 2.5, "q_s" -> 4.0, "q_err" -> -1.0,
        "q_unmapped" -> 0.5), cohorts)
    assert(totals === Map("core" -> 3.5, "streamevents" -> 4.0, "other" -> 0.5))
  }

  test("every declared query carries a cohort (registry-derived, cannot drift)") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.cohorts.keySet
    assert(missing.isEmpty, s"queries without a cohort: $missing")
    assert(SparkEntry.cohorts.keySet === SparkEntry.queries.keySet)
  }
}
