package graft.operators

import graft.engine.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics over the `events` table: tumbling-window
  * aggregation and gap-based sessionization. Batch formulations here are
  * oracle-checked; graft.streaming.StreamingJobs runs the same windowed
  * aggregate as a Structured Streaming query (SURVEY §2.9 notes the
  * reference has no event-time processing — this is the engine extension).
  *
  * Scale: both queries shuffle once on their natural keys (window/user);
  * the window aggregate partial-aggregates map-side, and sessionization
  * partitions by user_id so state for one user never crosses executors.
  *
  * SKEW posture (SCALE.md round-4 probe): the whole suite keys on
  * user_id, and a power-law corpus concentrates a constant fraction of
  * events on a few hot users. AQE's skew handling splits oversized JOIN
  * and AGGREGATE partitions, but a WINDOW partition can never be split —
  * every row of a window key must pass through one task, so the hot
  * user's task grows linearly with the corpus. Measured locally: a 1/3-
  * hot user at 3M events is within noise of uniform (one in-memory sort
  * of the hot partition is cheap); on a 1000-executor cluster the same
  * shape eventually pins a straggler. When it does, each operator has an
  * algebraic escape that [[Advanced.saltedJoin]]-style salting composes
  * with:
  *  - [[anomalies]]: mean/σ are ALGEBRAIC — two-phase (salted partial,
  *    then merge per user) replaces the window for hot keys;
  *  - [[retention]]: pre-aggregate to (user_id, day) first — the window
  *    input is then bounded by active days per user, not events;
  *  - [[funnel]]: stage-reach is equivalent to a per-(user, stage)
  *    min-ts aggregation cascade (saltable), trading the single ordered
  *    pass for one extra keyed agg when the hot task binds.
  */
object EventAnalytics {
  import Tables._

  /** Tumbling 1-hour windows per event type: count + exact sum (DECIMAL)
    * surfaced as double. */
  def qEventWindow(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .orderBy("hour", "event_type")

  /** Gap-based sessionization (30-min inactivity): one row per session with
    * bounds and size — the classic lag + cumulative-sum formulation. */
  def sessionize(ev: DataFrame, gapMinutes: Int): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    ev
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > gapMinutes * 60000000L, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
  }

  def qSessionize(s: SparkSession, d: String): DataFrame =
    sessionize(events(s, d), 30).orderBy("user_id", "session_id")

  /** Time-series RESAMPLE with gap-fill + rolling aggregate: a sparse
    * event stream (purchases of a user cohort) is resampled onto a dense
    * hourly spine generated from the stream's own bounds, empty hours are
    * zero-filled, and a trailing 24h rolling sum runs over the dense
    * series (rows-frame ≡ time-range frame once the spine is dense — and
    * deterministic). The spine is generated, never stored; the unkeyed
    * ordering window runs over spine-cardinality rows (hours, not
    * events) — at 100 TB partition the window by (series, day) exactly
    * like the sessionization window. Decimal sums; zero-fill uses typed
    * zero literals so both engines promote identically. */
  def qResample(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val spine = ev
      .agg(date_trunc("hour", min(col("ts"))).as("t0"),
        date_trunc("hour", max(col("ts"))).as("t1"))
      .select(explode(sequence(col("t0"), col("t1"), expr("interval 1 hour"))).as("hour"))
    val purchases = ev
      .filter(col("event_type") === "purchase" && col("user_id") < 50)
      .groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n"), sum(col("value").cast("decimal(18,2)")).as("sv"))
    val filled = spine.join(purchases, Seq("hour"), "left")
      .select(col("hour"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("sv"), lit(0).cast("decimal(18,2)")).as("sv"))
    val w = Window.orderBy(col("hour")).rowsBetween(-23, 0)
    filled
      .select(col("hour"), col("n"), col("sv").cast("double").as("total"),
        sum(col("n")).over(w).as("n_24h"),
        sum(col("sv")).over(w).cast("double").as("total_24h"))
      .orderBy("hour")
  }

  /** Recency-weighted engagement score per user: each event contributes
    * 1/(1+age_days) relative to the stream's own high-water mark — the
    * hyperbolic-decay cousin of exponential decay, chosen because the
    * weight is a rounded double of EXACT integer division (bit-identical
    * in any engine; pow() differs across libm implementations in the last
    * ulp). Weights are rounded to 9 places and summed as DECIMAL so the
    * per-user total is independent of partitioning and add order. The
    * high-water mark comes from one 1-row aggregate on the caller's side,
    * embedded as a literal (the tfIdf/bm25 pattern — a cross join against
    * a 1-row frame plans as a nested-loop join, which the engine's plan
    * audit bans); ages use integer microsecond division — exact far past
    * double's 2^53 range. */
  def decayScores(ev: DataFrame, refMicros: Long): DataFrame =
    ev
      // clamp at 0 so a reference mark that lags the stream (wall-clock
      // "now" behind the data) weighs future events 1.0 instead of
      // feeding 1/0 into the weight (NULL in Spark, inf in IEEE engines —
      // silently dropped from the sum while still counted in n_events)
      .withColumn("age_days",
        expr(s"greatest(($refMicros - unix_micros(ts)) div 86400000000, 0)"))
      .withColumn("wt",
        round(lit(1.0) / (col("age_days") + 1L), 9).cast("decimal(28,9)"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(col("wt")).cast("double").as("decayed_score"))

  def qDecay(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val refMicros = ev.agg(max(unix_micros(col("ts")))).head().getLong(0)
    decayScores(ev, refMicros).orderBy("user_id")
  }

  /** Ordered funnel per user: the earliest `view`, the earliest `click`
    * AT OR AFTER that view, and the earliest `purchase` at or after that
    * click — the strict-sequence conversion funnel (an unordered
    * count-per-type overcounts users who purchased before ever viewing).
    * Three window passes over ONE user_id partitioning: the exchange
    * happens once and each min(CASE …) pass reuses it (the dependent
    * thresholds t1/t2 make this inherently sequential, but sequential
    * WITHIN the partition — no extra shuffle, no self-joins per step).
    * `depth` is how far the user got (0–3). */
  def funnel(ev: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val byUser = Window.partitionBy(col("user_id"))
    val withTs = steps.zipWithIndex.foldLeft(ev) { case (df, (step, i)) =>
      val cond =
        if (i == 0) col("event_type") === step
        else col("event_type") === step && col("ts") >= col(s"t${i}")
      df.withColumn(s"t${i + 1}", min(when(cond, col("ts"))).over(byUser))
    }
    val tCols = steps.indices.map(i => col(s"t${i + 1}"))
    // fold forward so the DEEPEST step's check ends up outermost:
    // when(t3, 3).otherwise(when(t2, 2).otherwise(when(t1, 1).otherwise(0)))
    val depth = tCols.zipWithIndex.foldLeft(lit(0L)) { case (acc, (t, i)) =>
      when(t.isNotNull, lit((i + 1).toLong)).otherwise(acc)
    }
    withTs
      .groupBy("user_id")
      .agg(min(tCols.head).as("t1"),
        tCols.tail.zipWithIndex.map { case (t, i) => min(t).as(s"t${i + 2}") }: _*)
      .withColumn("depth", depth)
  }

  /** Oracle-checked: view -> click -> purchase funnel, one row per user. */
  def qFunnel(s: SparkSession, d: String): DataFrame =
    funnel(events(s, d), Seq("view", "click", "purchase"))
      .orderBy("user_id")

  /** Weekly retention cohorts: users grouped by their FIRST-ever event
    * day, counted once per whole-week offset they return in. The week
    * offset is exact integer microsecond division relative to the user's
    * own first event (calendar-week truncation differs across engines'
    * week-start conventions; an offset from the user's anchor is
    * convention-free). Two shuffles: the user_id window and the
    * (cohort, offset) count — both on high-cardinality-enough keys. */
  def retention(ev: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
    ev
      .withColumn("first_ts", min(col("ts")).over(byUser))
      .withColumn("week_offset",
        expr("(unix_micros(ts) - unix_micros(first_ts)) div 604800000000"))
      .groupBy(to_date(col("first_ts")).as("cohort_day"), col("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  def qRetention(s: SparkSession, d: String): DataFrame =
    retention(events(s, d)).orderBy("cohort_day", "week_offset")

  /** Event-type transition matrix: counts and row-normalized
    * probabilities of consecutive (from -> to) steps within each user's
    * ordered stream — the first-order Markov model behind next-action
    * prediction and funnel design (which step pairs actually occur).
    * One user_id window for the lead(), one |types|²-bounded aggregate;
    * the probability window runs over the tiny matrix itself. */
  def transitions(ev: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val byFrom = Window.partitionBy(col("from_type"))
    ev
      .withColumn("next_type", lead(col("event_type"), 1).over(byUser))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p", round(col("n").cast("double") / sum(col("n")).over(byFrom), 6))
  }

  def qTransitions(s: SparkSession, d: String): DataFrame =
    transitions(events(s, d)).orderBy("from_type", "to_type")

  /** Per-user outlier events: flag events whose value sits more than
    * `zMax` standard deviations from the user's own mean — the per-entity
    * anomaly screen that runs before event data feeds a training set.
    * Moments accumulate as DECIMAL over one user_id window (exact on any
    * partitioning — qCorr's discipline); the closed-form z runs in double
    * with the oracle's exact expression shape, so the flag cannot flip
    * with cluster layout. One shuffle; no join. Users with fewer than 3
    * events or zero variance are skipped (z undefined). */
  def anomalies(ev: DataFrame, zMax: Double): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
    val v = col("value").cast("decimal(18,2)")
    val withMoments = ev
      // n counts NON-NULL values (count(value), not count(*)): null-value
      // events would otherwise deflate the mean and fabricate variance —
      // a user with mostly-null values would flag normal events
      .withColumn("n", count(col("value")).over(byUser))
      .withColumn("s1", sum(v).over(byUser).cast("double"))
      .withColumn("s2", sum((v * v).cast("decimal(38,4)")).over(byUser).cast("double"))
    val nD = col("n").cast("double")
    val mean = col("s1") / nD
    val variance = col("s2") / nD - mean * mean
    withMoments
      .withColumn("z", (col("value") - mean) / sqrt(variance))
      .filter(col("n") >= 3 && variance > 0 && abs(col("z")) > zMax)
      .select(col("event_id"), col("user_id"), col("value"),
        round(col("z"), 6).as("z"))
  }

  /** Algebraic two-phase formulation of [[anomalies]]: per-user moments
    * via groupBy (n, Σv, Σv² — partial-aggregated map-side, so a hot
    * user's rows combine INSIDE each input partition before the shuffle),
    * joined back to the events. Result-identical to the window path on
    * any input: the moment expressions are the same exact-DECIMAL sums
    * cast to double at the same points, the join is null-safe on user_id
    * (a window treats NULL as its own partition; a plain equi-join would
    * drop those rows), and the closed-form z is the same double
    * expression — so the flag cannot differ between formulations
    * (AnomalyTwoPhaseSpec proves equality on real and hot-key data).
    *
    * Scale: this is the hot-key escape the class doc promises. A WINDOW
    * partition can never be split — the hottest user's task grows
    * linearly with the corpus and AQE cannot help. Here the map-side
    * combine bounds the aggregation by distinct users per partition, and
    * the join back IS an AQE-splittable shuffle join (OptimizeSkewedJoin
    * splits oversized join partitions; the tiny moments side is
    * replicated into each split). Cost vs the window: one extra shuffle
    * of the small per-user moments table. */
  def anomaliesTwoPhase(ev: DataFrame, zMax: Double): DataFrame = {
    val v = col("value").cast("decimal(18,2)")
    val moments = ev.groupBy(col("user_id").as("m_user_id")).agg(
      count(col("value")).as("n"),
      sum(v).cast("double").as("s1"),
      sum((v * v).cast("decimal(38,4)")).cast("double").as("s2"))
    val nD = col("n").cast("double")
    val mean = col("s1") / nD
    val variance = col("s2") / nD - mean * mean
    ev.join(moments, col("user_id") <=> col("m_user_id"))
      .withColumn("z", (col("value") - mean) / sqrt(variance))
      .filter(col("n") >= 3 && variance > 0 && abs(col("z")) > zMax)
      .select(col("event_id"), col("user_id"), col("value"),
        round(col("z"), 6).as("z"))
  }

  /** Row-hash sample target for the skew stats (the Dedup.ngramStats
    * discipline: membership is a pure function of the row, never of the
    * partitioning, so the estimate — and the routed strategy — is
    * identical on any cluster layout). */
  private val SkewSampleRows = 100000L
  private val SkewSampleModulus = 1L << 30

  /** Estimated event count of the hottest user, from a deterministic
    * event_id-hash sample (exact when the table fits the sample budget).
    * The 1/f correction uses the REALIZED modulus fraction, not the
    * requested one (the Dedup sampled-stats rule). */
  def estMaxUserRows(ev: DataFrame): Double = {
    val n = ev.count()
    if (n == 0L) return 0.0
    val f = if (n <= SkewSampleRows) 1.0 else SkewSampleRows.toDouble / n
    val (sampled, fReal) =
      if (f >= 1.0) (ev, 1.0)
      else {
        val threshold = math.max(1L, (f * SkewSampleModulus).toLong)
        (ev.filter(pmod(xxhash64(col("event_id")), lit(SkewSampleModulus))
          < lit(threshold)), threshold.toDouble / SkewSampleModulus)
      }
    val r = sampled.groupBy(col("user_id")).agg(count(lit(1)).as("c"))
      .agg(max(col("c"))).head()
    if (r.isNullAt(0)) 0.0 else r.getLong(0).toDouble / fReal
  }

  /** [[anomalies]] with strategy auto-selection from the sampled skew
    * stats (the [[Dedup.ngramNearDupsAuto]] pattern): while the hottest
    * user's estimated row count fits in one task's row budget, the
    * single-shuffle window formulation wins; beyond it the window task
    * is an unsplittable straggler and the AQE-splittable two-phase
    * formulation takes over. Unlike the ngram router's LSH branch, BOTH
    * branches here are exact and result-identical, so the routed result
    * never depends on which side ran — the gated q_anomaly routes freely
    * under its unchanged oracle. */
  def anomaliesAutoTagged(ev: DataFrame, zMax: Double,
      hotRowBudget: Long = 1000000L): (DataFrame, String) = {
    val hot = estMaxUserRows(ev)
    val strategy = if (hot > hotRowBudget) "two_phase" else "window"
    log.info(f"anomaly strategy=$strategy estMaxUserRows=$hot%.0f budget=$hotRowBudget")
    (if (strategy == "two_phase") anomaliesTwoPhase(ev, zMax)
     else anomalies(ev, zMax), strategy)
  }

  def anomaliesAuto(ev: DataFrame, zMax: Double,
      hotRowBudget: Long = 1000000L): DataFrame =
    anomaliesAutoTagged(ev, zMax, hotRowBudget)._1

  private val log = org.slf4j.LoggerFactory.getLogger("graft.operators.EventAnalytics")

  def qAnomaly(s: SparkSession, d: String): DataFrame =
    anomaliesAuto(events(s, d), 3.0).orderBy("event_id")

  /** Ranking window demo: top-3 users by event count per event type
    * (row_number + deterministic tiebreak). */
  def qTopUsers(s: SparkSession, d: String): DataFrame = {
    val counts = events(s, d)
      .groupBy("event_type", "user_id").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("n").desc, col("user_id"))
    counts.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select("event_type", "rank", "user_id", "n")
      .orderBy("event_type", "rank")
  }
}
