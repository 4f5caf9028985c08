package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Event-stream batch analytics over `events` (event_id, ts, user_id,
  * event_type, value, props) — the batch twins of the Structured Streaming
  * operators in `graft.streaming`.
  *
  * Timestamps are normalized to whole epoch seconds (bigint) at the scan so
  * all downstream arithmetic is exact integer math, identical cross-engine
  * regardless of the parquet nano/micro unit.
  */
object Sessionize {

  /** Whole-second epoch from the events `ts` column, handling both read
    * paths: TimestampType, or LongType nanos when the session sets
    * `spark.sql.legacy.parquet.nanosAsLong=true` (Spark 4 cannot read
    * parquet TIMESTAMP(NANOS) natively). Integer `div` keeps it exact. */
  private[graft] def tsSeconds(df: DataFrame): org.apache.spark.sql.Column =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000000000")
      case _                                   => unix_timestamp(col("ts"))
    }

  /** Gap-based sessionization (30-min inactivity): classic lag + cumulative
    * boundary-sum, one shuffle on user_id reused by both window passes and
    * the final aggregate (same partitioning key → single exchange). */
  /** The session-index derivation under x11 (lag + cumulative boundary
    * sum over the per-user window) — shared with x111's basket mining so
    * the two can never disagree on what a session is. */
  private[graft] def sessionizedEvents(spark: SparkSession, dir: String,
                                       gapSeconds: Long): DataFrame = {
    val raw = Tables.events(spark, dir)
    val ev = raw
      .select(col("event_id"), col("user_id"), col("event_type"),
        tsSeconds(raw).as("ts_s"),
        Relational.cents(col("value")).as("value_cents"))
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_s"), col("event_id"))
    ev
      .withColumn("new_session",
        when(col("ts_s") - lag(col("ts_s"), 1).over(byUser) > gapSeconds, 1)
          .when(lag(col("ts_s"), 1).over(byUser).isNull, 1)
          .otherwise(0))
      .withColumn("session_idx",
        sum(col("new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
  }

  def sessions(spark: SparkSession, dir: String, gapSeconds: Long = 1800): DataFrame = {
    sessionizedEvents(spark, dir, gapSeconds)
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts_s")).as("session_start_s"),
        max(col("ts_s")).as("session_end_s"),
        sum(col("value_cents")).as("sum_value_cents"),
        countDistinct(col("event_type")).as("n_event_types"))
      .withColumn("duration_s", col("session_end_s") - col("session_start_s"))
  }

  /** Built-in `session_window` (30-min gap) — the declarative twin of
    * `sessions`: an event merges into the current session iff its gap from
    * the previous event is ≤ the gap duration (a gap of EXACTLY 1800 s
    * still merges — verified empirically at sf0.1, where one such pair
    * exists; same `> gap` break rule as `sessions`). */
  def sessionWindows(spark: SparkSession, dir: String, gap: String = "30 minutes"): DataFrame = {
    val raw = Tables.events(spark, dir)
    raw
      .withColumn("ts_t", timestamp_seconds(tsSeconds(raw)))
      .groupBy(session_window(col("ts_t"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(Relational.cents(col("value"))).as("sum_value_cents"))
      .select(col("user_id"),
        unix_timestamp(col("session_window.start")).as("session_start_s"),
        col("n_events"), col("sum_value_cents"))
  }

  /** Sliding 1-hour/15-min windows — batch `window(ts, "1 hour", "15 min")`:
    * every event lands in 4 overlapping windows; emits window starts as
    * epoch seconds. The built-in generates the same (start, event) pairs as
    * exploding the 4 slide offsets, which is what the DuckDB oracle does. */
  def slidingWindows(spark: SparkSession, dir: String): DataFrame = {
    val raw = Tables.events(spark, dir)
    raw
      .withColumn("ts_t", timestamp_seconds(tsSeconds(raw)))
      .groupBy(window(col("ts_t"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(Relational.cents(col("value"))).as("sum_value_cents"))
      .select(unix_timestamp(col("window.start")).as("window_start_s"),
        col("event_type"), col("n_events"), col("sum_value_cents"))
  }

  /** Tumbling 1-hour window aggregate — batch equivalent of
    * `groupBy(window($"ts", "1 hour"))`; emits the window start as epoch
    * seconds so the comparison is engine-neutral. */
  def hourlyWindows(spark: SparkSession, dir: String): DataFrame = {
    val raw = Tables.events(spark, dir)
    raw
      .groupBy(
        (floor(tsSeconds(raw) / 3600) * 3600).cast("long").as("window_start_s"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(Relational.cents(col("value"))).as("sum_value_cents"),
        countDistinct(col("user_id")).as("n_users"))
  }

  /** Event-type transition matrix (x85): per-user chronological `lag` →
    * (prev, next) pair counts with distinct-user support — the Markov
    * transition table behavioral analytics and next-event models start
    * from. Order key is (epoch second, event_id): event_id breaks
    * second-level ties with a TOTAL key, so the sequence — and therefore
    * every transition — is identical cross-engine (the repo's row-pick
    * determinism rule).
    *
    * One shuffle on user_id for the lag window (per-user partitions —
    * parallel; skew bound is the single busiest user, the standard
    * mitigation being session-scoped windows, x11's machinery), then a
    * partial-agg'd shuffle on the ≤ |types|² transition key. */
  def eventTransitions(spark: SparkSession, dir: String): DataFrame = {
    val raw = Tables.events(spark, dir)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_s"), col("event_id"))
    raw
      .select(col("event_id"), col("user_id"), col("event_type"),
        tsSeconds(raw).as("ts_s"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n_transitions"),
        countDistinct(col("user_id")).as("n_users"))
  }

  /** Weekly retention cohorts (x88): users grouped by their FIRST-event
    * week (the cohort), counted again in every later week they were
    * active — the (cohort_week, week_offset) retention triangle product
    * analytics reads. Weeks are integer epoch-week indices
    * (`ts_s div 604800` — engine-neutral, no calendar parsing), offsets
    * integer differences; counts are distinct users, so the whole
    * triangle is exact cross-engine.
    *
    * Shape: one user-keyed aggregate for cohort assignment (min week),
    * one distinct (user, week) projection, a user-keyed equi-join to
    * attach cohorts (both sides pre-shuffled on user_id — co-located),
    * then a partial-agg'd count on the small (cohort, offset) key. No
    * window, no skew key hotter than the busiest user. */
  def retentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    val raw = Tables.events(spark, dir)
    val weekly = raw
      .select(col("user_id"), tsSeconds(raw).as("ts_s"))
      .select(col("user_id"), expr("ts_s div 604800").as("week"))
      .distinct()
    val cohorts = weekly.groupBy(col("user_id")).agg(min(col("week")).as("cohort_week"))
    weekly.join(cohorts, Seq("user_id"))
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  /** Weekly user-growth curve (x91): per epoch-week, distinct active
    * users, first-time users, and the cumulative user count — the
    * DAU/WAU-style growth report, all integer. The cumulative sum is an
    * unpartitioned window BY CONSTRUCTION over the post-aggregate weekly
    * table (rows = distinct weeks, time-bounded at any event volume —
    * the x48 tiny-table case); the corpus-sized work is the distinct
    * (user, week) projection and two user/week-keyed aggregates, all
    * partial-combined. */
  def userGrowth(spark: SparkSession, dir: String): DataFrame = {
    val raw = Tables.events(spark, dir)
    val weekly = raw
      .select(col("user_id"), tsSeconds(raw).as("ts_s"))
      .select(col("user_id"), expr("ts_s div 604800").as("week"))
      .distinct()
    val active = weekly.groupBy(col("week")).agg(countDistinct(col("user_id")).as("n_active"))
    val firstWeeks = weekly.groupBy(col("user_id")).agg(min(col("week")).as("week"))
      .groupBy(col("week")).agg(count(lit(1)).as("n_new"))
    active.join(firstWeeks, Seq("week"), "left")
      .withColumn("n_new", coalesce(col("n_new"), lit(0L)))
      .withColumn("cum_users",
        sum(col("n_new")).over(Window.orderBy(col("week"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("week"), col("n_active"), col("n_new"), col("cum_users"))
  }

  /** x121's path prefix length — the first [[PathLen]] event types of a
    * session form its path key. Shared with the oracle SQL. */
  val PathLen: Int = 3

  /** Session entry-path census (x121): per distinct first-[[PathLen]]
    * event-type path (e.g. `signup>view>click`), how many sessions open
    * that way — the "how do journeys start" report behind funnel design,
    * over x11's EXACT session definition ([[sessionizedEvents]], shared
    * so the two can never disagree on what a session is).
    *
    * 100 TB shape: the per-user window is x11's single user-keyed
    * shuffle (the row_number pass reuses the same partitioning, so no
    * extra exchange); the `rk ≤ PathLen` filter then cuts every session
    * to ≤ PathLen rows BEFORE the positional pivot, which is a
    * partial-aggregable groupBy — no collect_list of whole sessions.
    * The final path groupBy lands on a BOUNDED domain (≤ (|event
    * types| + 1)^PathLen distinct paths — the x48 tiny-table case), so
    * the output frame is small at any corpus size. Hot-user skew is
    * x11's documented posture: a user's timeline must colocate to
    * sessionize at all. */
  def sessionPaths(spark: SparkSession, dir: String,
                   gapSeconds: Long = 1800): DataFrame = {
    val se = sessionizedEvents(spark, dir, gapSeconds)
    val w = Window.partitionBy(col("user_id"), col("session_idx"))
      .orderBy(col("ts_s"), col("event_id"))
    val pivots = (1 to PathLen).map(i =>
      max(when(col("rk") === i, col("event_type"))).as(s"e$i"))
    se.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= PathLen)
      .groupBy(col("user_id"), col("session_idx"))
      .agg(pivots.head, pivots.tail: _*)
      .groupBy(concat_ws(">", (1 to PathLen).map(i => col(s"e$i")): _*).as("path"))
      .agg(count(lit(1)).as("n_sessions"))
  }

  /** x123's arm-assignment salt (deterministic hash split, shared with
    * the oracle SQL): arm = md5-60(salt:user) mod 2, 0 = control. */
  val AbSalt: String = "ab"

  /** A/B experiment readout (x123): users hash-split into two arms
    * (x27's deterministic md5 coin — assignment is a pure function of
    * user_id, reproducible in any engine), conversion = "has ≥1
    * purchase", plus revenue — the experimentation panel every event
    * pipeline grows. Rates are ppm floor-divisions of nonnegative
    * integers; the treatment lift is a SUBTRACTION of two such rates
    * (signed division never happens — the floor/truncate cross-engine
    * trap again).
    *
    * 100 TB shape: one partial-agg'd groupBy per user (conversion flag
    * + revenue combine map-side), one groupBy onto the 2-row arm frame,
    * and the control row crossJoins back broadcast (x65's 1-row
    * pattern). The arm frame is `localCheckpoint`ed — both the control
    * extract and the final projection read it. */
  def abConversion(spark: SparkSession, dir: String): DataFrame = {
    val raw = Tables.events(spark, dir)
    val u = raw
      .select(col("user_id"), col("event_type"),
        Relational.cents(col("value")).as("v"))
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase", 1).otherwise(0)).as("converted"),
        sum(when(col("event_type") === "purchase", col("v")).otherwise(lit(0L))).as("rev"))
      .withColumn("arm", Sampling.hashBucket(col("user_id"), AbSalt, 2))
    val a = u.groupBy(col("arm"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("converted")).cast("long").as("n_converted"),
        sum(col("rev")).as("revenue_cents"))
      .localCheckpoint()
    val ctl = a.filter(col("arm") === 0)
      .select(expr("(1000000L * n_converted) div n_users").as("ctl_ppm"))
    a.crossJoin(ctl)
      .select(col("arm"), col("n_users"), col("n_converted"),
        expr("(1000000L * n_converted) div n_users").as("conv_ppm"),
        col("revenue_cents"),
        expr("(1000L * revenue_cents) div n_users").as("arpu_millicents"),
        (expr("(1000000L * n_converted) div n_users") - col("ctl_ppm")).as("lift_ppm"))
  }

  /** x87 knobs: spike factor and trailing window (hours), shared with
    * the oracle SQL. */
  val SpikeFactor: Int = 2
  val SpikeTrailingHours: Int = 24

  /** Hourly error-spike monitor (x87): flag hours whose error count
    * exceeds `factor ×` the trailing-`window` hourly mean — the pipeline
    * health check a production ETL runs over its own event/error stream
    * (the reference's error-logging intent, turned into a monitor). The
    * comparison is cross-multiplied (`n·trailing_hours > factor·
    * trailing_sum`) so it is pure integer arithmetic — no mean, no float.
    *
    * The trailing window is a RANGE frame over the hour value
    * (`[now − window·3600 s, now − 3600 s]`), so the baseline really is
    * the last `window` CLOCK hours: hours with zero errors dilute the
    * mean (they contribute 0 to the sum while the denominator stays the
    * elapsed-hour count, capped at `window` and clipped at the start of
    * the series) — a ROWS frame would instead skip quiet hours and reach
    * back to arbitrarily old errors after a gap (the round-7 advice).
    * The window is UNPARTITIONED by construction — but it runs over the
    * post-aggregate HOURLY table (rows = distinct hours, a time-bounded
    * handful at any corpus size: the x48 tiny-table case, not a
    * corpus-sized window). The corpus-sized work is the hourly
    * aggregate, which partial-combines map-side on the hour key. */
  def errorSpikes(spark: SparkSession, dir: String,
                  factor: Int = SpikeFactor,
                  trailingHours: Int = SpikeTrailingHours): DataFrame = {
    val raw = Tables.events(spark, dir)
    val hourly = raw
      .select(col("event_type"), tsSeconds(raw).as("ts_s"))
      .filter(col("event_type") === "error")
      .groupBy((expr("ts_s div 3600") * 3600).as("hour_start_s"))
      .agg(count(lit(1)).as("n_errors"))
    val w = Window.orderBy(col("hour_start_s"))
      .rangeBetween(-trailingHours.toLong * 3600, -3600)
    val runningMin = Window.orderBy(col("hour_start_s"))
      .rowsBetween(Window.unboundedPreceding, 0)
    hourly
      .withColumn("first_hour", min(col("hour_start_s")).over(runningMin))
      .withColumn("trailing_hours",
        least(lit(trailingHours.toLong),
          expr("(hour_start_s - first_hour) div 3600")))
      .withColumn("trailing_errors", coalesce(sum(col("n_errors")).over(w), lit(0L)))
      .withColumn("spike",
        (col("trailing_hours") > 0 &&
          col("n_errors") * col("trailing_hours") >
            lit(factor.toLong) * col("trailing_errors")).cast("int"))
      .select(col("hour_start_s"), col("n_errors"), col("trailing_hours"),
        col("trailing_errors"), col("spike"))
  }

  /** x101's trailing window length in clock hours; lag k carries weight
    * 2^(EwmaHours−1−k), so the freshest hour dominates and weights halve
    * per hour — a true half-life decay in exact powers of two. Bounded
    * at 62 so the weight itself always fits a Long. */
  val EwmaHours: Int = 8

  /** Exponentially-weighted hourly popularity (x101): per event type,
    * the decayed activity signal a ranking/trending surface reads —
    * `ewma_pts(h) = Σ_{k<W} n(h−k·3600) · 2^(W−1−k)` over the trailing
    * [[EwmaHours]] CLOCK hours. All-BIGINT: power-of-two weights make
    * the decay exact (no float accumulation), and quiet hours inside the
    * window contribute exactly 0 — the lag join anchors on clock-hour
    * arithmetic, not row offsets, so a gap dilutes the signal instead of
    * reaching back to stale activity (x87's RANGE-frame discipline, in
    * join form because per-lag weights aren't expressible as one frame).
    *
    * Integer bound: ewma_pts ≤ 2^W · max hourly count — wraps only past
    * ~2^55 events in one hour at the pinned W=8; no real stream.
    *
    * 100 TB shape: the corpus-sized work is ONE partial-agg'd hourly
    * groupBy; everything after runs on the post-agg hourly table (rows =
    * event types × distinct hours, time-bounded at any corpus size — the
    * x48 tiny-table case). The lag fan-out is a constant ×W explode on
    * that tiny table followed by an equi-join on (type, hour) — no
    * window, no skew key, partial-agg'd final rollup. */
  def ewmaPopularity(spark: SparkSession, dir: String,
                     windowHours: Int = EwmaHours): DataFrame = {
    require(windowHours >= 1 && windowHours <= 62, "need 1 <= windowHours <= 62")
    val raw = Tables.events(spark, dir)
    val hourly = raw
      .select(col("event_type"), tsSeconds(raw).as("ts_s"))
      .groupBy(col("event_type"), (expr("ts_s div 3600") * 3600).as("hour_start_s"))
      .agg(count(lit(1)).as("n"))
    val anchors = hourly.select(col("event_type"), col("hour_start_s"))
      .withColumn("k", explode(array((0 until windowHours).map(i => lit(i)): _*)))
      .withColumn("lag_hour_s", col("hour_start_s") - col("k") * 3600L)
    anchors
      .join(hourly.select(col("event_type"), col("hour_start_s").as("lag_hour_s"),
        col("n").as("lag_n")), Seq("event_type", "lag_hour_s"))
      .groupBy(col("event_type"), col("hour_start_s"))
      .agg(
        sum(when(col("k") === 0, col("lag_n"))).as("n_events"),
        sum(expr(s"lag_n * shiftleft(CAST(1 AS BIGINT), ${windowHours - 1} - k)"))
          .as("ewma_pts"))
  }

  /** x102's MAD multiplier: flag hours beyond RobustZ median absolute
    * deviations from the per-type median — the classic robust-z rule. */
  val RobustZ: Int = 3

  /** Robust per-type anomaly hours (x102): median/MAD outlier detection
    * over each event type's hourly count distribution — x87's trailing-
    * mean monitor is level-sensitive (a step change re-baselines it);
    * the median/MAD rule is the distribution-robust complement a
    * monitoring stack runs alongside it.
    *
    * Exactness: medians of integers land on halves, MADs of halves land
    * on quarters — so the algebra runs in SCALED integer units that are
    * exact in both engines: `med2 = 2·median(n)` (= a+b of the middle
    * pair, an exact double→long), `dev2 = |2n − med2|`,
    * `mad4 = 2·median(dev2)` (= 4·MAD), and the flag cross-multiplies
    * `2·dev2 > RobustZ · mad4` (both sides = 4× the real quantities).
    * No epsilon, no float comparison; a constant series (mad4 = 0) flags
    * any deviating hour — the documented MAD degenerate case.
    *
    * 100 TB shape: the corpus-sized work is ONE partial-agg'd hourly
    * groupBy. The two median passes buffer per-type HOURLY counts — the
    * post-agg time-bounded table (x48's tiny-table case), grouped by
    * event_type so even that sort is per-type, never global. Medians
    * join back per type: a broadcast-sized dim at any corpus size. */
  def robustSpikes(spark: SparkSession, dir: String,
                   z: Int = RobustZ): DataFrame = {
    val raw = Tables.events(spark, dir)
    val hourly = raw
      .select(col("event_type"), tsSeconds(raw).as("ts_s"))
      .groupBy(col("event_type"), (expr("ts_s div 3600") * 3600).as("hour_start_s"))
      .agg(count(lit(1)).as("n"))
    val med = hourly.groupBy(col("event_type"))
      .agg(expr("CAST(2.0D * percentile(n, 0.5D) AS BIGINT)").as("med2"))
    val dev = hourly.join(broadcast(med), Seq("event_type"))
      .withColumn("dev2", abs(lit(2L) * col("n") - col("med2")))
    val mad = dev.groupBy(col("event_type"))
      .agg(expr("CAST(2.0D * percentile(dev2, 0.5D) AS BIGINT)").as("mad4"))
    dev.join(broadcast(mad), Seq("event_type"))
      .select(col("event_type"), col("hour_start_s"), col("n").as("n_events"),
        col("med2"), col("mad4"),
        (lit(2L) * col("dev2") > lit(z.toLong) * col("mad4")).cast("int")
          .as("robust_spike"))
  }

  /** Per-user inter-arrival burstiness (x106): the temporal-regularity
    * panel behind bot detection and engagement modeling — per user, the
    * gap-series moments and a CV>1 burstiness flag. Gaps come from
    * `lag(ts_s)` ordered by (ts_s, event_id) within the user (ties give
    * zero gaps, so the gap MULTISET is a pure function of the sorted
    * timestamp list — deterministic in both engines).
    *
    * Integer discipline: population variance is kept as the exact
    * rational `var_num / var_den = (n·Σx² − (Σx)²) / n²` — two BIGINT
    * columns, no float accumulation; `mean_gap_s` is the one int/int
    * IEEE division. The burstiness flag cross-multiplies CV > 1 ⇔
    * `n·Σx² > 2·(Σx)²` — pure integers. The moment products are
    * guarded in double precision (x73's rule): n·Σx² clears 2⁶³ only
    * for ~10⁶ year-scale gaps under one user — a bot the pipeline
    * should have capped upstream; the guard raises instead of wrapping.
    *
    * 100 TB shape: the lag window partitions BY USER — each partition
    * is one user's event count (the x11 sessionize bound, not corpus-
    * sized); the rollup is a partial-agg'd user-keyed groupBy. A
    * pathological single-user firehose is the same skew class as x11
    * and carries the same mitigation (AQE skew handling / upstream
    * per-user caps). Output is O(users). */
  def interArrivalStats(spark: SparkSession, dir: String): DataFrame = {
    val raw = Tables.events(spark, dir)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_s"), col("event_id"))
    val gaps = raw
      .select(col("user_id"), col("event_id"), tsSeconds(raw).as("ts_s"))
      .withColumn("gap_s", col("ts_s") - lag(col("ts_s"), 1).over(w))
      .filter(col("gap_s").isNotNull)
    val guard =
      (col("n_gaps").cast("double") * col("sum_gap_sq").cast("double") >
        lit(Long.MaxValue.toDouble * 0.9)) ||
      (col("sum_gap_s").cast("double") * col("sum_gap_s").cast("double") >
        lit(Long.MaxValue.toDouble * 0.45))
    gaps.groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_gaps"),
        sum(col("gap_s")).as("sum_gap_s"),
        sum(col("gap_s") * col("gap_s")).as("sum_gap_sq"))
      .withColumn("checked",
        when(guard, raise_error(lit("inter-arrival moments would exceed Long: " +
          "n*sum_sq or sum^2 over bound; cap per-user events upstream (Scaladoc)")))
          .otherwise(lit(true)))
      .select(col("user_id"), col("n_gaps"), col("sum_gap_s"), col("sum_gap_sq"),
        (col("n_gaps") * col("sum_gap_sq") - col("sum_gap_s") * col("sum_gap_s"))
          .as("var_num"),
        (col("n_gaps") * col("n_gaps")).as("var_den"),
        (col("sum_gap_s") / col("n_gaps")).as("mean_gap_s"),
        (col("n_gaps") * col("sum_gap_sq") >
          lit(2L) * col("sum_gap_s") * col("sum_gap_s")).cast("int").as("bursty"))
  }

  /** Session-basket association rules (x111): support / confidence /
    * lift over event-type pairs co-occurring in one session — classic
    * market-basket mining with x11's sessions as baskets (the
    * [[sessionizedEvents]] derivation is SHARED, so rule mining can
    * never disagree with x11 about what a session is). Fixed-point
    * integers throughout: support and the two directional confidences
    * in ppm, lift in millis via the log-free ratio
    * `(10³·n_ab·N) div (n_a·n_b)` — both products guarded in double
    * (x103's rule; numerator wraps past n_ab·N ≈ 9.2·10¹⁵).
    *
    * 100 TB shape: the basket frame is session-distinct items — the
    * pair self-join keys on (user, session), so fan-out per session is
    * ≤ |event types|² (a plan-time constant, NOT corpus-sized); item
    * counts are O(|types|) and broadcast back; the session total is a
    * 1-row broadcast cross. The only corpus-scale stages are x11's
    * per-user session window and the partial-agg'd distinct/counts. */
  def associationRules(spark: SparkSession, dir: String,
                       gapSeconds: Long = 1800): DataFrame = {
    val items = sessionizedEvents(spark, dir, gapSeconds)
      .select(col("user_id"), col("session_idx"), col("event_type"))
      .distinct()
    val nSessions = items.select(col("user_id"), col("session_idx")).distinct()
      .agg(count(lit(1)).as("n"))
    val itemCounts = items.groupBy(col("event_type")).agg(count(lit(1)).as("c"))
    val pairs = items.as("a")
      .join(items.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.session_idx") === col("b.session_idx") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("ante"), col("b.event_type").as("cons"))
      .agg(count(lit(1)).as("n_ab"))
    val guard =
      (lit(1000.0) * col("n_ab").cast("double") * col("n").cast("double") >
        lit(Long.MaxValue.toDouble * 0.9)) ||
      (col("n_a").cast("double") * col("n_b").cast("double") >
        lit(Long.MaxValue.toDouble * 0.9))
    pairs
      .join(broadcast(itemCounts.select(col("event_type").as("ante"), col("c").as("n_a"))),
        Seq("ante"))
      .join(broadcast(itemCounts.select(col("event_type").as("cons"), col("c").as("n_b"))),
        Seq("cons"))
      .crossJoin(broadcast(nSessions))
      .select(col("ante"), col("cons"), col("n_a"), col("n_b"), col("n_ab"),
        expr("(1000000L * n_ab) div n").as("support_ppm"),
        expr("(1000000L * n_ab) div n_a").as("conf_ab_ppm"),
        expr("(1000000L * n_ab) div n_b").as("conf_ba_ppm"),
        when(guard, raise_error(lit("lift product would exceed Long: " +
          "n_ab*N or n_a*n_b over bound; quantize counts (Scaladoc)")))
          .otherwise(expr("(1000L * n_ab * n) div (n_a * n_b)")).as("lift_millis"))
  }

  /** x112's attribution lookback window in seconds. */
  val AttributionWindowS: Long = 3600L

  /** Last-touch attribution (x112): for every purchase, the most recent
    * click by the same user within the trailing [[AttributionWindowS]]
    * window — the batch complement of the streaming interval join
    * (`EventStream.clickPurchaseAttribution` emits ALL pairs; marketing
    * attribution wants exactly one winner). Unattributed purchases stay
    * in the result with null click columns — attribution COVERAGE is
    * half of what the panel is for. The winner is the lexicographic
    * struct extremum `max(struct(click_ts, click_id))` — deterministic
    * under same-second clicks and partial-aggregable (x104's argmax
    * pattern: no window over the pair stream).
    *
    * 100 TB shape: the candidate join is a plain equi-join on user_id
    * with the time predicate as residual — per-user volumes are the
    * join's fan-out bound (x11's bound class; a firehose user is AQE
    * skew territory). One partial-agg'd groupBy picks winners; the
    * coverage left-join is purchase-keyed. No windows, no driver
    * state. */
  def lastTouchAttribution(spark: SparkSession, dir: String,
                           windowSeconds: Long = AttributionWindowS): DataFrame = {
    require(windowSeconds >= 1, "need windowSeconds >= 1")
    val raw = Tables.events(spark, dir)
    val ev = raw.select(col("event_id"), col("user_id"), col("event_type"),
      tsSeconds(raw).as("ts_s"), Relational.cents(col("value")).as("value_cents"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts_s").as("click_ts_s"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts_s").as("purchase_ts_s"), col("value_cents"))
    val winners = purchases.join(clicks, Seq("user_id"))
      .filter(col("click_ts_s") <= col("purchase_ts_s") &&
        col("click_ts_s") > col("purchase_ts_s") - windowSeconds)
      .groupBy(col("purchase_id"))
      .agg(max(struct(col("click_ts_s"), col("click_id"))).as("w"))
      .select(col("purchase_id"), col("w.click_id").as("click_id"),
        col("w.click_ts_s").as("click_ts_s"))
    purchases.join(winners, Seq("purchase_id"), "left")
      .select(col("purchase_id"), col("user_id"), col("purchase_ts_s"),
        col("value_cents"), col("click_id"), col("click_ts_s"),
        (col("purchase_ts_s") - col("click_ts_s")).as("lag_s"),
        col("click_id").isNotNull.cast("int").as("attributed"))
  }

  /** x188's look-back depth — weights halve per step back, so the
    * nearest touch earns 2^(K−1) points. Shared with the oracle SQL. */
  val DecayK: Int = 4

  /** Position-decay multi-touch attribution (x188): x112 gives the
    * whole conversion to the last click; this splits credit across the
    * [[DecayK]] events PRECEDING each purchase in the user's stream
    * with exponentially halving integer weights (nearest = 2^{K−1}
    * points … K-th = 1 point) — the standard position-decay model, in
    * exact points so both engines tally identically. Per touched event
    * type: how often it appeared in a pre-purchase window, its summed
    * credit, and how often it was the nearest touch.
    *
    * 100 TB shape: K lag columns over the per-user window (x11's
    * bounded-partition argument), the purchase filter, a K-way
    * projection explode (map-side), and ONE partial-agg'd groupBy on
    * the tiny event-type key. */
  def decayAttribution(spark: SparkSession, dir: String,
                       k: Int = DecayK): DataFrame = {
    val raw = Tables.events(spark, dir)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_s"), col("event_id"))
    val lagged = raw
      .select(col("user_id"), col("event_id"), col("event_type"),
        tsSeconds(raw).as("ts_s"))
      .select(col("event_type") +: (1 to k).map(j =>
        lag(col("event_type"), j).over(w).as(s"t$j")): _*)
    lagged.filter(col("event_type") === "purchase")
      .select(explode(array((1 to k).map(j =>
        struct(lit(j).as("pos"), col(s"t$j").as("touched"),
          lit(1L << (k - j)).as("wt"))): _*)).as("p"))
      .filter(col("p.touched").isNotNull)
      .groupBy(col("p.touched").as("event_type"))
      .agg(count(lit(1)).as("n_touches"),
        sum(col("p.wt")).as("credit_pts"),
        sum(when(col("p.pos") === 1, 1L).otherwise(0L)).as("n_nearest"))
  }

  /** x86's ordered funnel stages, shared with the oracle SQL. */
  val FunnelStages: Seq[String] = Seq("view", "click", "purchase")

  /** Conversion funnel (x86): how many users reach each stage IN ORDER —
    * a user converts to stage k+1 only with an event of that type
    * STRICTLY AFTER their first stage-k event (first-touch attribution
    * semantics; simultaneous-second events don't convert, which the
    * integer ts_s makes well-defined). One conditional aggregate per
    * user (min event time per stage — a single user-keyed partial-agg'd
    * shuffle), then one tiny ungrouped count; stages unpivot from a
    * 1-row aggregate, so the funnel costs one corpus pass at any scale. */
  def funnel(spark: SparkSession, dir: String,
             stages: Seq[String] = FunnelStages): DataFrame = {
    require(stages.nonEmpty, "need at least one funnel stage")
    val raw = Tables.events(spark, dir)
    val stageMins = stages.map(st =>
      min(when(col("event_type") === st, col("ts_s"))).as(s"t_$st"))
    val perUser = raw
      .select(col("user_id"), col("event_type"), tsSeconds(raw).as("ts_s"))
      .groupBy(col("user_id"))
      .agg(stageMins.head, stageMins.tail: _*)
    // reached(k): t_0 < t_1 < ... < t_k, all present
    val reached = stages.indices.map { k =>
      stages.take(k + 1).map(st => col(s"t_$st").isNotNull).reduce(_ && _) &&
        (1 to k).map(i => col(s"t_${stages(i - 1)}") < col(s"t_${stages(i)}"))
          .foldLeft(lit(true))(_ && _)
    }
    val counts = perUser.agg(
      count(lit(1)).as("n_total"),
      reached.zipWithIndex.map { case (c, i) =>
        sum(when(c, 1L).otherwise(0L)).as(s"n_$i")
      }: _*)
    counts.select(explode(array(stages.indices.map(i =>
      struct(lit(i + 1).cast("long").as("stage"), lit(stages(i)).as("event_type"),
        col(s"n_$i").as("n_users"),
        col("n_total"))): _*)).as("s"))
      .select(col("s.stage"), col("s.event_type"), col("s.n_users"), col("s.n_total"))
  }

  /** Rolling active-user panel (x147): per active week, the weekly
    * active users (WAU), the trailing-4-week active users (MAU4), and
    * the WAU/MAU4 stickiness ratio in ppm — the engagement dashboard's
    * headline row, with both distinct counts EXACT. Weeks with no
    * events report no row (observed-week semantics, x87's documented
    * convention).
    *
    * Exact rolling distincts without a rolling window: each (user,
    * week) activity row is replicated to the ≤4 future weeks whose
    * trailing window it falls in (`explode(sequence(week, week+3))`),
    * then deduped and counted per target week — a partial-agg'd
    * groupBy, never a distinct-inside-window (which Spark cannot
    * partial-agg and classic engines approximate with HLL). The 4×
    * replication is the exact price of the 4-week window and scales
    * linearly; the stickiness division is integer ppm (`div` on
    * nonnegatives).
    *
    * 100 TB shape: one corpus scan collapses to distinct (user, week)
    * (partial-combined); everything after lives on that reduced frame;
    * the final join is keyed on week (tiny both sides after agg). */
  def activeUsers(spark: SparkSession, dir: String): DataFrame = {
    val raw = Tables.events(spark, dir)
    val uw = raw.select(col("user_id"), tsSeconds(raw).as("ts_s"))
      .select(col("user_id"), expr("ts_s div 604800").as("week"))
      .distinct()
    val wau = uw.groupBy(col("week")).agg(count(lit(1)).as("wau"))
    val mau = uw
      .select(col("user_id"), explode(expr("sequence(week, week + 3)")).as("week"))
      .distinct()
      .groupBy(col("week")).agg(count(lit(1)).as("mau4"))
    wau.join(mau, Seq("week"))
      .withColumn("stickiness_ppm", expr("(1000000L * wau) div mau4"))
      .select(col("week"), col("wau"), col("mau4"), col("stickiness_ppm"))
  }

  /** Signup→first-purchase conversion-latency table (x165): per user
    * with ≥1 signup, the whole-day latency from FIRST signup to the
    * first purchase AT-OR-AFTER it, bucketed by day — plus the
    * never-converted mass as the pinned `latency_days = −1` row
    * (right-censored, x150's life-table discipline: the censored mass
    * IS the funnel's complement, never silently dropped — a purchase
    * that predates the signup does not convert the user but must not
    * erase them either). Output is O(latency-day buckets) rows with
    * exact ppm shares of the signup population.
    *
    * 100 TB shape: two filtered per-user aggregates (partial-combined),
    * one left join keyed on user (both sides user-sized), the
    * conditional-min fold, ONE bucket groupBy; the 1-row signup total
    * crossJoins back broadcast (x65's pattern). No windows. */
  def conversionLatency(spark: SparkSession, dir: String): DataFrame = {
    val raw = Tables.events(spark, dir)
    val ev = raw.select(col("user_id"), col("event_type"),
      tsSeconds(raw).as("ts_s"))
    val s0 = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts_s")).as("t0"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_s"))
    val firstP = s0.join(p, Seq("user_id"), "left")
      .groupBy(col("user_id"), col("t0"))
      .agg(min(when(col("ts_s") >= col("t0"), col("ts_s"))).as("tp"))
    val tot = s0.agg(count(lit(1)).as("n_signups"))
    firstP
      .select(when(col("tp").isNotNull, expr("(tp - t0) div 86400"))
        .otherwise(lit(-1L)).as("latency_days"))
      .groupBy(col("latency_days")).agg(count(lit(1)).as("n_users"))
      .crossJoin(broadcast(tot))
      .withColumn("share_ppm", expr("(1000000L * n_users) div n_signups"))
  }

  /** Next-event Markov prediction eval (x166): from x85's transition
    * counts (the [[eventTransitions]] derivation is SHARED so the
    * model and its eval can never disagree), the argmax next-event
    * prediction per antecedent type and its observed hit rate in exact
    * ppm — "how predictable is the clickstream", the evaluation row a
    * next-action model is graded against before anything fancier is
    * trained. Tie-break on the argmax is (count, type) struct-max —
    * total and engine-neutral (larger count, then lexicographically
    * larger type).
    *
    * 100 TB shape: everything downstream of x85's per-user lag runs on
    * the O(|types|²) transition aggregate — argmax by max(struct), one
    * equi-join, one partial-agg'd fold. Output is O(|types|). */
  def markovEval(spark: SparkSession, dir: String): DataFrame = {
    val t = eventTransitions(spark, dir)
      .select(col("prev_type"), col("next_type"), col("n_transitions"))
      .localCheckpoint()
    val pred = t.groupBy(col("prev_type"))
      .agg(max(struct(col("n_transitions"), col("next_type"))).as("m"))
      .select(col("prev_type"), col("m.next_type").as("predicted_next"))
    t.join(pred, Seq("prev_type"))
      .groupBy(col("prev_type"), col("predicted_next"))
      .agg(sum(col("n_transitions")).as("n_total"),
        sum(when(col("next_type") === col("predicted_next"),
          col("n_transitions")).otherwise(0L)).as("n_hits"))
      .withColumn("hit_ppm", expr("(1000000L * n_hits) div n_total"))
  }

  /** Per-event-type HLL distinct-users audit (x199): x193's sketch
    * audit on the EVENT stream's natural key — the cardinality a
    * product-metrics pipeline sketches continuously ("unique users per
    * event type"), published next to the exact count. Shares the
    * register/harmonic/estimate machinery with x193
    * ([[Relational.hllAuditByKey]]); the per-(type, bucket) max-rank
    * register table is exactly the state its streaming twin
    * (`EventStream.hllRegisters`) maintains incrementally — mergeable
    * max, so batch ≡ stream by construction (spec-proven). */
  def eventHllAudit(spark: SparkSession, dir: String): DataFrame =
    Relational.hllAuditByKey(
      Tables.events(spark, dir)
        .select(col("event_type"), col("user_id").as("item")).distinct(),
      "event_type")

  /** x212's candidate watermark delays (seconds: 1 h, 6 h, 1 d, 7 d)
    * — shared with the DuckDB oracle. */
  val LatenessWatermarks: Seq[Long] = Seq(3600L, 21600L, 86400L, 604800L)

  /** x211/x212's shard-bit split of the 60-bit arrival key: the top 4
    * bits shard the sequence into 16 ORDERED segments for the
    * distributed prefix-max. */
  val LatenessShardShift: Int = 56

  /** The per-event arrival lateness under a MODELED hash-sharded
    * collector: the raw log is perfectly time-ordered (verified — every
    * per-user and global lateness is 0), so the audit replays it
    * through the standard non-FIFO arrival model — arrival position =
    * md5₆₀("arr:" ‖ event_id), the deterministic stand-in for a
    * multi-shard collector interleaving — and measures how far each
    * event's timestamp sits behind the max event time already arrived.
    * That is exactly the quantity Spark's watermark (global max event
    * time − delay) is sized against.
    *
    * The global running max is computed DISTRIBUTED, not by a global
    * sort: the arrival key's top 4 bits split the sequence into 16
    * ordered shards; within-shard running max is a shard-partitioned
    * window, and the cross-shard carry is an exclusive prefix-max over
    * the 16-row shard-maxima table (the [[Sampling.exclusivePrefixSum]]
    * two-phase shape with max as the monoid) broadcast back. Exact
    * global prefix max, no single-partition window over the corpus. */
  private def arrivalLateness(spark: SparkSession, dir: String): DataFrame = {
    val raw = Tables.events(spark, dir)
    val keyed = raw
      .select(col("event_id"), tsSeconds(raw).as("ts_s"))
      .withColumn("arr", Dedup.md5Hash60(
        concat(lit("arr:"), col("event_id").cast("string"))))
      .withColumn("shard", expr(s"arr div ${1L << LatenessShardShift}"))
    val w = Window.partitionBy(col("shard")).orderBy(col("arr"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = keyed.withColumn("run_max", max(col("ts_s")).over(w))
      .localCheckpoint() // read by the shard rollup and the final join
    val shardMax = local.groupBy(col("shard")).agg(max(col("ts_s")).as("m"))
    val prevW = Window.orderBy(col("shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = shardMax.withColumn("prev_max", max(col("m")).over(prevW))
      .select(col("shard"), col("prev_max"))
    local.join(broadcast(carry), Seq("shard"))
      .withColumn("lateness_s",
        greatest(col("run_max"), coalesce(col("prev_max"), col("run_max")))
          - col("ts_s"))
  }

  /** Out-of-orderness histogram (x211): the log2 lateness spectrum of
    * the event stream (bucket −1 = in order) — the empirical input to
    * every `withWatermark` choice in the streaming twins. The bucket
    * edge is integer-exact: bucket b holds lateness in [2^b, 2^(b+1)),
    * computed by bit length (63 − leading zeros), no float log. */
  def latenessHistogram(spark: SparkSession, dir: String): DataFrame =
    arrivalLateness(spark, dir)
      .withColumn("bucket",
        when(col("lateness_s") === 0L, lit(-1L))
          // ⌊log2⌋ as bit length − 1: bin() strips leading zeros in
          // both engines — no float log anywhere
          .otherwise(expr("cast(length(bin(lateness_s)) - 1 as long)")))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_events"), max(col("lateness_s")).as("max_lateness_s"))

  /** Exact watermark drop panel (x212): for each candidate watermark
    * delay, the EXACT number of events whose arrival lateness exceeds
    * it — what `withWatermark(d)` would have discarded on this stream —
    * plus the drop fraction. The corpus-side work is the shared
    * per-user lateness window; the watermark fan-out is a broadcast
    * 4-row cross, partial-agg'd on the watermark key. */
  def watermarkDrops(spark: SparkSession, dir: String): DataFrame = {
    val late = arrivalLateness(spark, dir).localCheckpoint()
    val totals = late.agg(count(lit(1)).as("n_total"))
    val spark2 = late.sparkSession
    import spark2.implicits._
    val wm = LatenessWatermarks.toDF("watermark_s")
    late.crossJoin(broadcast(wm))
      .groupBy(col("watermark_s"))
      .agg(sum(when(col("lateness_s") > col("watermark_s"), 1L).otherwise(0L))
        .as("n_dropped"))
      .crossJoin(broadcast(totals))
      .withColumn("drop_ppm", expr("(1000000L * n_dropped) div n_total"))
  }

  /** x228's published run-length cap (longer runs collapse into the cap
    * bucket). Shared with the DuckDB oracle. */
  val RunLenCap: Int = 10

  /** Browse-run pattern census (x228): the MATCH_RECOGNIZE-style
    * variable-length pattern `(view|click)+ → outcome` that Spark has no
    * declarative operator for — per user, every MAXIMAL run of
    * consecutive browse events (view/click under the (ts, event_id)
    * total order) classified by what ends it: the next event is a
    * `purchase` (converted), some other event (abandoned), or the
    * stream ends (open). Published as the (run-length bucket × outcome)
    * census with distinct-user counts — the variable-length complement
    * of x86's fixed-step funnel and x166's one-step Markov eval: "how
    * long do users browse before buying vs giving up".
    *
    * Gaps-and-islands construction (x136's discipline): runs are
    * recovered from the row-number gap inside the browse-only subset,
    * so no self-join and no pattern automaton — two per-user windows
    * and a groupBy. 100 TB shape: per-user windows partition by the
    * user key (no global ordering anywhere); the census rollup is a
    * partial-agg'd groupBy on ≤ (cap+1)·3 cells. */
  def browseRunCensus(spark: SparkSession, dir: String): DataFrame = {
    val raw = Tables.events(spark, dir)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_s"), col("event_id"))
    val marked = raw
      .select(col("event_id"), col("user_id"), col("event_type"),
        tsSeconds(raw).as("ts_s"))
      .withColumn("rn", row_number().over(w))
      // stream-end sentinel instead of NULL: max_by-over-NULL-values
      // differs between engines (DuckDB's arg_max skips NULLs)
      .withColumn("next_type",
        coalesce(lead(col("event_type"), 1).over(w), lit("~end~")))
    val browse = marked
      .filter(col("event_type") === "view" || col("event_type") === "click")
    val bw = Window.partitionBy(col("user_id")).orderBy(col("rn"))
    val runs = browse
      .withColumn("run_start",
        when(coalesce(col("rn") - lag(col("rn"), 1).over(bw), lit(2L)) > 1L, 1L)
          .otherwise(0L))
      .withColumn("run_id", sum(col("run_start")).over(
        bw.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("run_id"))
      .agg(count(lit(1)).as("run_len"),
        max_by(col("next_type"), col("rn")).as("after"))
      .withColumn("outcome",
        when(col("after") === "~end~", "open")
          .when(col("after") === "purchase", "converted")
          .otherwise("abandoned"))
    runs.groupBy(least(col("run_len"), lit(RunLenCap.toLong)).as("len_bucket"),
        col("outcome"))
      .agg(count(lit(1)).as("n_runs"),
        countDistinct(col("user_id")).as("n_users"))
  }

  /** Peak session concurrency per day (x226): the sweep-line census —
    * +1 at each session start, −1 one second after its end, running sum
    * over time = sessions concurrently open; per day, the peak and the
    * earliest second attaining it (capacity planning's number: how many
    * live sessions the serving tier must hold). Concurrency changes
    * only at boundary seconds, so the sweep runs over the per-second
    * DELTA table (one row per boundary second), and the running sum
    * rides [[Sampling.exclusivePrefixSum]] — boundary seconds are
    * data-proportional (the x208 rule), so no single-task window ever
    * sees them all. Concurrency is constant between boundaries, so a
    * day's true peak is max(the level CARRIED IN at midnight, the
    * boundary levels inside the day) — the carry matters: a session
    * spanning midnight keeps the next day's floor up even if that day
    * has no boundary of its own, and every calendar day in the span is
    * reported (a boundary-less day inherits the carried level — that IS
    * what the serving tier holds across it). `at_s` is the earliest
    * second attaining the peak: midnight when the carry is (weakly) the
    * peak, else the first boundary reaching it.
    *
    * 100 TB shape: sessions are the existing gap-sessionize aggregate;
    * the delta table is one partial-agg'd groupBy on the second; the
    * prefix is the recursive scale-safe one; the per-day rollup and the
    * carry window run over O(days-in-span) rows (the time-bounded-table
    * class — days grow with the calendar, not the corpus). */
  def peakConcurrency(spark: SparkSession, dir: String,
                      gapSeconds: Long = 1800): DataFrame = {
    val s = sessions(spark, dir, gapSeconds)
      .select(col("session_start_s"), col("session_end_s"))
    val deltas = s.select(col("session_start_s").as("sec"), lit(1L).as("d"))
      .union(s.select((col("session_end_s") + 1L).as("sec"), lit(-1L).as("d")))
      .groupBy(col("sec")).agg(sum(col("d")).as("d"))
      .localCheckpoint() // prefix sum + the concurrency join
    val offsets = Sampling.exclusivePrefixSum(deltas.select(col("sec"), col("d")))
    val conc = deltas
      .join(offsets.select(col("key").as("sec"), col("offset")), Seq("sec"))
      .withColumn("conc", col("offset") + col("d"))
      .withColumn("day", expr("sec div 86400"))
      .localCheckpoint() // per-day rollup + the argmax pick
    val dayAgg = conc.groupBy(col("day"))
      .agg(max(col("conc")).as("day_max"),
        count(lit(1)).as("n_boundaries"),
        max_by(col("conc"), col("sec")).as("close_conc"),
        // a boundary exactly AT midnight replaces the carried level for
        // the whole day — the carry interval [midnight, first boundary)
        // is empty, so the pre-midnight level is never attained
        max(when(col("sec") === col("day") * 86400L, 1L).otherwise(0L))
          .as("has_midnight"))
    val span = conc.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(explode(expr("sequence(d0, d1)")).as("day"))
    val carried = span.join(dayAgg, Seq("day"), "left")
      .withColumn("carry_in",
        // -1 = "no carry" (levels are never negative, so it can neither
        // win a greatest() nor satisfy the at-midnight attainment test)
        when(coalesce(col("has_midnight"), lit(0L)) === 1L, lit(-1L))
          .otherwise(coalesce(last(col("close_conc"), ignoreNulls = true).over(
            Window.orderBy(col("day")).rowsBetween(Window.unboundedPreceding, -1)),
            lit(0L))))
    val peaks = carried
      .withColumn("peak_concurrency",
        greatest(coalesce(col("day_max"), lit(0L)), col("carry_in")))
      .withColumn("n_boundaries", coalesce(col("n_boundaries"), lit(0L)))
      .localCheckpoint() // joined against the boundary table for at_s
    peaks
      .join(conc.select(col("day"), col("conc"), col("sec")), Seq("day"), "left")
      .withColumn("hit",
        when(col("carry_in") >= col("peak_concurrency"), col("day") * 86400L)
          .when(col("conc") === col("peak_concurrency"), col("sec")))
      .groupBy(col("day"), col("peak_concurrency"), col("n_boundaries"))
      .agg(min(col("hit")).as("at_s"))
      .select(col("day"), col("peak_concurrency"), col("at_s"), col("n_boundaries"))
  }

  /** Debounce gap in seconds for [[eventDebounce]] (x258): an event of the
    * same (user, type) key arriving within this many seconds of the
    * PREVIOUS event of that key is treated as an instrumentation repeat
    * and dropped. One hour — the synthetic event stream's per-key
    * inter-arrival 5th percentile is ≈ 2.5 h at every scale factor, so
    * this fires on the genuine burst tail (≈ 1.5% of arrivals) without
    * collapsing normal traffic. */
  val DebounceGapSeconds: Long = 3600L

  /** Per-event debounce flags — the row-level kernel under x258, shared
    * with the streaming twin's spec so batch and stream can never
    * disagree on what "kept" means. An event is kept iff it is the first
    * of its (user_id, event_type) key or arrived ≥ `gapSeconds` after the
    * previous event of that key (previous EVENT, not previous kept one:
    * a burst longer than the gap stays collapsed to its first row until
    * a real pause — the classic trailing-debounce, one `lag` window, no
    * running state). Order is totalized by (ts_s, event_id). */
  private[graft] def debouncedEvents(spark: SparkSession, dir: String,
                                     gapSeconds: Long): DataFrame = {
    val raw = Tables.events(spark, dir)
    val byKey = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts_s"), col("event_id"))
    raw
      .select(col("event_id"), col("user_id"), col("event_type"),
        tsSeconds(raw).as("ts_s"),
        Relational.cents(col("value")).as("value_cents"))
      .withColumn("prev_ts", lag(col("ts_s"), 1).over(byKey))
      .withColumn("kept",
        col("prev_ts").isNull || col("ts_s") - col("prev_ts") >= gapSeconds)
  }

  /** Telemetry debounce census (x258): per event type, how many raw
    * events the stream carried vs how many survive gap-debouncing on the
    * (user, type) key — the dedup a telemetry pipeline applies to
    * double-fired client events before anything downstream counts them —
    * plus the kept rows' value mass and reach.
    *
    * 100 TB shape: one shuffle on the (user_id, event_type) window key
    * (the per-key history must colocate to be sequenced at all — the
    * same exchange every sessionize-family operator pays), then a
    * map-side-combined rollup to O(event_types) rows. No state beyond
    * the one-row `lag` frame. */
  def eventDebounce(spark: SparkSession, dir: String,
                    gapSeconds: Long = DebounceGapSeconds): DataFrame =
    debouncedEvents(spark, dir, gapSeconds)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("kept"), col("value_cents")).otherwise(0L))
          .as("kept_value_cents"),
        countDistinct(when(col("kept"), col("user_id"))).as("n_kept_users"))
}
