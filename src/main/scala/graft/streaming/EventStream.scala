package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming over the `events` table — the streaming twins of
  * `graft.operators.Sessionize` (SURVEY.md §2.9: extension-only; the
  * reference is pure batch).
  *
  * The file source replays the events parquet as a stream; at 100 TB this
  * is the same code against a Kafka/file-drop source. Watermarking bounds
  * state; the windowed aggregate and the mapGroupsWithState sessionizer are
  * the two canonical stateful shapes.
  */
object EventStream {

  /** Streaming scan of the events parquet (schema from a batch peek —
    * file streams require a declared schema). `ts` arrives as Long nanos
    * under `spark.sql.legacy.parquet.nanosAsLong=true`; normalize to a real
    * timestamp column `ts_t` + epoch-seconds `ts_s`. */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    val schema = spark.read.parquet(path).schema
    // file-stream sources need a directory/glob, not a bare file path
    val raw = spark.readStream.schema(schema).parquet(s"$dir/events.parquet*")
    val tsS = schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000000000")
      case _                                   => unix_timestamp(col("ts"))
    }
    raw.withColumn("ts_s", tsS)
      .withColumn("ts_t", timestamp_seconds(col("ts_s")))
  }

  /** Streaming twin of x199's HLL register table: per-(event_type,
    * bucket) max register rank over the user-id hash — the canonical
    * MERGEABLE-SKETCH stream. State is the register table itself
    * (event_types × 16 cells, O(1) per key regardless of stream
    * volume), `max` is the fold, and because max is commutative/
    * idempotent the streamed registers equal the batch registers over
    * any replay or retry — batch ≡ stream by construction, spec-
    * proven. Downstream, x199's harmonic/estimate tail reads this
    * table unchanged; at 100 TB this is the shape a continuous
    * distinct-users dashboard actually runs (sketch in the stream,
    * estimate at query time). */
  def hllRegisters(events: DataFrame): DataFrame =
    graft.operators.Relational
      .withHllRank(events.select(col("event_type"), col("user_id")),
        col("user_id"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(max(col("rnk")).as("register"))

  /** Tumbling 1-hour windowed counts with a 2-hour watermark — the
    * streaming equivalent of `Sessionize.hourlyWindows`. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts_t", "2 hours")
      .groupBy(window(col("ts_t"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(unix_timestamp(col("window.start")).as("window_start_s"),
        col("event_type"), col("n_events"))

  /** Sliding 1-hour/15-min windowed counts — streaming twin of
    * `Sessionize.slidingWindows` (same `window()` codepath). */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts_t", "2 hours")
      .groupBy(window(col("ts_t"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(unix_timestamp(col("window.start")).as("window_start_s"),
        col("event_type"), col("n_events"))

  /** Gap-based session windows via the built-in `session_window` — the
    * streaming twin of `Sessionize.sessionWindows` (x20), state bounded by
    * the watermark: a session finalizes (and its state drops) once the
    * watermark passes its close (last event + gap). Same 30-min gap and
    * integer-cents sum as the batch operator. */
  def sessionWindowCounts(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts_t", "2 hours")
      .groupBy(col("user_id"), session_window(col("ts_t"), gap))
      .agg(count(lit(1)).as("n_events"),
        sum(graft.operators.Relational.cents(col("value"))).as("sum_value_cents"))
      .select(col("user_id"),
        unix_timestamp(col("session_window.start")).as("session_start_s"),
        col("n_events"), col("sum_value_cents"))

  /** Stateful streaming dedup: first-occurrence-wins on event_id with a
    * watermark bound on the dedup state — the streaming twin of the batch
    * exact-dedup operators. At scale, state holds only ids younger than
    * the watermark. */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts_t", "2 hours")
      .dropDuplicates("event_id")

  /** Streaming twin of x147's WAU arm: watermarked stateful
    * `dropDuplicates(user, week)` (state = one row per active
    * (user, week), expirable once the watermark passes the week — the
    * exact-distinct stream shape that replaces an HLL when exactness
    * is the contract), then a per-week count. Complete/update-mode
    * aggregate downstream of the dedup; batch ≡ stream proven in the
    * spec (same distinct (user, week) set either way). */
  def weeklyActiveUsers(events: DataFrame): DataFrame =
    events
      .withWatermark("ts_t", "2 hours")
      .select(col("user_id"), expr("ts_s div 604800").as("week"), col("ts_t"))
      .dropDuplicates("user_id", "week")
      .groupBy(col("week"))
      .agg(count(lit(1)).as("wau"))

  /** Deterministic stream sampling with batch-fitted thresholds — the
    * "fit offline, filter online" production shape: per-stratum md5-60
    * acceptance thresholds (e.g. from `Sampling.mixtureSample`'s
    * √(n_min/n) rule, fitted on yesterday's batch) arrive as a tiny
    * static table and broadcast-join the stream. The acceptance hash is
    * a pure per-row function of the event key, so the operator is
    * STATELESS (no watermark, no state store — a rate-limited stream at
    * any volume), retry-stable, and batch≡stream by construction: the
    * same thresholds over the same rows select the same sample in a
    * batch job (proven in EventStreamSpec). */
  def sampledStream(events: DataFrame, thresholds: DataFrame): DataFrame =
    events.join(
      org.apache.spark.sql.functions.broadcast(thresholds), Seq("event_type"))
      .filter(graft.operators.Dedup.md5Hash60(
        concat(lit("ev:"), col("event_id").cast("string"))) < col("thresh"))
      .select(col("event_id"), col("ts_t"), col("user_id"), col("event_type"))

  /** Stream-static enrichment join: the streaming micro-batches broadcast-
    * join the static dimension — no stream-side state at all (the standard
    * shape for dimension lookup at 100 TB of stream). */
  def enrichWithUsers(events: DataFrame, users: DataFrame): DataFrame =
    events.join(
      org.apache.spark.sql.functions.broadcast(users),
      events("user_id") === users("c_custkey"), "left")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("c_name").as("user_name"), col("c_mktsegment").as("segment"))

  /** Stream-stream conversion attribution: purchases joined to the clicks
    * they follow within `windowSeconds`, both sides watermarked so the join
    * state is bounded — Spark buffers each side only until the other's
    * watermark passes the join-window bound, the canonical watermarked
    * stream-stream interval join. Inner join ⇒ rows emit as soon as they
    * match (no watermark-close latency). */
  def clickPurchaseAttribution(clicks: DataFrame, purchases: DataFrame,
                               windowSeconds: Long = 3600): DataFrame = {
    val c = clicks.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts_t").as("click_ts"))
      .withWatermark("click_ts", "2 hours")
    val p = purchases.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts_t").as("purchase_ts"))
      .withWatermark("purchase_ts", "2 hours")
    c.join(p,
      col("user_id") === col("p_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr(s"interval $windowSeconds seconds"))
      .select(col("click_id"), col("user_id"), col("purchase_id"),
        unix_timestamp(col("click_ts")).as("click_ts_s"),
        unix_timestamp(col("purchase_ts")).as("purchase_ts_s"))
  }

  /** LEFT OUTER watermarked stream-stream join — the 29th twin and the
    * semantically harder mode of [[clickPurchaseAttribution]]: every
    * click emits, matched rows as they pair, UNMATCHED clicks only once
    * the purchase-side watermark has passed the click's join window (the
    * null can't be emitted earlier — a matching purchase might still
    * arrive; this delayed null emission IS the outer-join state-timeout
    * semantics, and the bounded buffer is identical to the inner mode).
    * The unmatched rows are the abandonment feed — the "clicked, never
    * purchased within the hour" stream a re-engagement pipeline consumes.
    * Same per-column output as the inner twin with purchase columns
    * nullable; `converted` flags the mode for downstream splits. */
  def clickPurchaseOuter(clicks: DataFrame, purchases: DataFrame,
                         windowSeconds: Long = 3600): DataFrame = {
    val c = clicks.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts_t").as("click_ts"))
      .withWatermark("click_ts", "2 hours")
    val p = purchases.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts_t").as("purchase_ts"))
      .withWatermark("purchase_ts", "2 hours")
    c.join(p,
      col("user_id") === col("p_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr(s"interval $windowSeconds seconds"),
      "left_outer")
      .select(col("click_id"), col("user_id"), col("purchase_id"),
        unix_timestamp(col("click_ts")).as("click_ts_s"),
        unix_timestamp(col("purchase_ts")).as("purchase_ts_s"),
        col("purchase_id").isNotNull.as("converted"))
  }

  // —— stateful transition extraction via flatMapGroupsWithState ——

  case class TEvent(user_id: Long, event_id: Long, ts_s: Long, event_type: String)
  case class TransState(ts_s: Long, event_id: Long, event_type: String)
  case class TransOut(user_id: Long, prev_type: String, next_type: String)

  /** Streaming twin of x85's transition extraction: per-user `GroupState`
    * carries the LAST event (ts, id, type) across micro-batches, so the
    * boundary transition between batch N's tail and batch N+1's head is
    * emitted exactly once — the property a stateless per-batch lag would
    * miss. Each micro-batch's rows sort by the (ts_s, event_id) total key
    * before pairing (x85's ordering convention); like every
    * last-value-state stream, cross-batch correctness assumes per-user
    * in-order arrival across micro-batches (event logs replayed in time
    * order — the spec's drop files split by time), the standard contract
    * for this state shape. Downstream aggregation to the transition
    * matrix happens on the emitted pairs. */
  def transitions(events: DataFrame): Dataset[TransOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("event_id"), col("ts_s"), col("event_type"))
      .as[TEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[TransState, TransOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[TEvent], state: GroupState[TransState]) =>
          val sorted = rows.toSeq.sortBy(e => (e.ts_s, e.event_id))
          val out = scala.collection.mutable.ListBuffer.empty[TransOut]
          var prev = state.getOption.orNull
          for (e <- sorted) {
            if (prev != null) out += TransOut(user, prev.event_type, e.event_type)
            prev = TransState(e.ts_s, e.event_id, e.event_type)
          }
          if (prev != null) state.update(prev)
          out.iterator
      }
  }

  // —— stateful debounce dedup via flatMapGroupsWithState ——

  case class DebounceState(ts_s: Long)
  case class DebounceOut(event_id: Long, user_id: Long, event_type: String,
                         ts_s: Long, kept: Boolean)

  /** Streaming twin of x258's telemetry debounce
    * ([[graft.operators.Sessionize.eventDebounce]]): per (user, type)
    * key, `GroupState` carries only the LAST event time — O(1) state per
    * key — so a repeat whose predecessor landed in the previous
    * micro-batch is still recognized as inside the gap (the boundary
    * case a stateless per-batch lag would mis-keep). Each micro-batch's
    * rows sort by the (ts_s, event_id) total key before flagging (x258's
    * ordering convention); same per-key in-order-arrival contract across
    * micro-batches as every last-value-state twin here. Emits EVERY
    * event with its kept flag (append mode) so downstream can both
    * forward the survivors and count the drops.
    *
    * State is BOUNDED, not just O(1) per key: the stream carries an
    * event-time watermark delayed by [[DebounceTtlGapMultiples]]·gap,
    * and each update arms an EventTimeTimeout at the same TTL past the
    * key's last event, so a key idle that long (in event time) is
    * evicted rather than held forever — state grows with ACTIVE key
    * cardinality, not lifetime key cardinality. The semantic cost is
    * nil under the documented in-order contract: a key is only evicted
    * once the WATERMARK (frontier − TTL) passes its last event + TTL —
    * i.e. its last event is ~2·TTL ≈ 16 gaps behind the data
    * frontier — and
    * any later event for it would clear the gap check (be kept) whether
    * or not the predecessor was remembered. Beyond-contract stragglers
    * (> TTL behind the frontier) are DROPPED by the watermark's late
    * filter before they reach the state — fail-closed: an event that
    * could only be mis-flagged is never flagged at all (spec-pinned,
    * with eviction itself proven from the state-operator metrics).
    * Event-time (not
    * processing-time) TTL deliberately: wall-clock timers would keep an
    * AvailableNow replay alive until they fire — a drained bounded run
    * must terminate when its DATA is done, and replays of historical
    * logs must evict on log time, not ingest time. */
  def debounce(events: DataFrame,
               gapSeconds: Long = graft.operators.Sessionize.DebounceGapSeconds)
      : Dataset[DebounceOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val ttlSeconds = gapSeconds * DebounceTtlGapMultiples
    events.select(col("user_id"), col("event_id"), col("ts_s"), col("event_type"))
      .withColumn("ts_event", col("ts_s").cast("timestamp"))
      // delay = TTL: no event inside its own eviction horizon is ever
      // classed late, so the watermark exists ONLY to drive eviction.
      // ts_event must stay in the frame — the unsupported-operation
      // checker looks for the watermark-tagged column in the stateful
      // operator's input (the TEvent deserializer just ignores it)
      .withWatermark("ts_event", s"$ttlSeconds seconds")
      .as[TEvent]
      .groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState[DebounceState, DebounceOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: (Long, String), rows: Iterator[TEvent], state: GroupState[DebounceState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts_s, e.event_id))
            var prev: Option[Long] = state.getOption.map(_.ts_s)
            val out = sorted.map { e =>
              val kept = prev.forall(p => e.ts_s - p >= gapSeconds)
              prev = Some(e.ts_s)
              DebounceOut(e.event_id, key._1, key._2, e.ts_s, kept)
            }
            prev.foreach { p =>
              state.update(DebounceState(p))
              // ≥ watermark+1 guard: an unordered historical file can
              // carry a key whose TTL horizon the global watermark has
              // already passed — arm the earliest LEGAL timer instead
              // of throwing
              state.setTimeoutTimestamp(math.max(
                (p + ttlSeconds) * 1000L, state.getCurrentWatermarkMs() + 1L))
            }
            out.iterator
          }
      }
  }

  /** Idle-key TTL for [[debounce]], in gap multiples of EVENT time: a
    * (user, type) key whose last event is this many gaps behind the
    * watermark frontier is evicted from the state store. */
  val DebounceTtlGapMultiples: Long = 8L

  // —— stateful EWMA popularity via flatMapGroupsWithState ——

  case class EwmaState(counts: Map[Long, Long])
  case class EwmaOut(event_type: String, hour_start_s: Long, n_events: Long, ewma_pts: Long)

  /** Streaming twin of x101's exponentially-weighted hourly popularity:
    * per event type, `GroupState` carries the trailing [[graft.operators
    * .Sessionize.EwmaHours]] hourly counts (O(W) state per key — bounded
    * regardless of stream length), and each micro-batch re-emits the
    * hours it touched with their current count and decayed points. Counts
    * and points are MONOTONE per (type, hour) across emissions, so the
    * last emission per key is the stream's answer and equals the batch
    * operator exactly (spec-proven across a forced micro-batch boundary).
    * Same in-order-arrival contract as [[transitions]]: per-type event
    * time must not regress across micro-batches (time-ordered drops /
    * log replay), which is what lets the state trim hours older than the
    * newest window — an out-of-order hour older than the trim horizon
    * would re-enter with a fresh count. */
  def ewmaPopularity(events: DataFrame,
                     windowHours: Int = graft.operators.Sessionize.EwmaHours)
      : Dataset[EwmaOut] = {
    require(windowHours >= 1 && windowHours <= 62, "need 1 <= windowHours <= 62")
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("event_type"), col("ts_s")).as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[EwmaState, EwmaOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (tpe: String, rows: Iterator[(String, Long)], state: GroupState[EwmaState]) =>
          val batchCounts = rows.foldLeft(Map.empty[Long, Long]) { case (m, (_, ts)) =>
            val h = ts / 3600 * 3600
            m.updated(h, m.getOrElse(h, 0L) + 1L)
          }
          if (batchCounts.isEmpty) Iterator.empty
          else {
            val prev = state.getOption.map(_.counts).getOrElse(Map.empty[Long, Long])
            val merged = batchCounts.foldLeft(prev) { case (m, (h, n)) =>
              m.updated(h, m.getOrElse(h, 0L) + n)
            }
            val maxH = merged.keys.max
            state.update(EwmaState(
              merged.filter { case (h, _) => h >= maxH - (windowHours - 1) * 3600L }))
            batchCounts.keys.toSeq.sorted.iterator.map { h =>
              val pts = (0 until windowHours).map(k =>
                merged.getOrElse(h - k * 3600L, 0L) << (windowHours - 1 - k)).sum
              EwmaOut(tpe, h, merged(h), pts)
            }
          }
      }
  }

  // —— stateful last-touch attribution via flatMapGroupsWithState ——

  case class AEvent(user_id: Long, event_id: Long, ts_s: Long,
                    event_type: String, value_cents: Long)
  case class ClickState(ts_s: Long, click_id: Long)
  case class AttribOut(purchase_id: Long, user_id: Long, purchase_ts_s: Long,
                       value_cents: Long, click_id: Option[Long],
                       click_ts_s: Option[Long], lag_s: Option[Long], attributed: Int)

  /** Streaming twin of x112's last-touch attribution: per user,
    * `GroupState` carries ONLY the latest click (ts, id) — O(1) state per
    * user, vs the stream-stream join's buffer of every click inside the
    * watermark bound — and each purchase emits exactly its winner row
    * (or an unattributed row), never the full candidate set.
    *
    * Exactness discipline: the batch winner is `ORDER BY click_ts DESC,
    * click_id DESC` over clicks in `(p_ts − window, p_ts]`, so a click
    * SIMULTANEOUS with the purchase qualifies regardless of event-id
    * order. The loop therefore merges each micro-batch's clicks by a
    * pointer on `click_ts ≤ purchase_ts` (not by global (ts, id)
    * interleave), updating the running (ts, id)-max before scoring the
    * purchase — bit-identical to the batch query across any micro-batch
    * split (spec-proven at a forced boundary). The state maximum only
    * grows, so attribution is insensitive to WHERE the batch boundary
    * falls; like every last-value-state stream it assumes per-user
    * in-order arrival ACROSS batches (time-split drops / log replay —
    * [[transitions]]' contract). */
  def lastTouch(events: DataFrame,
                windowSeconds: Long = graft.operators.Sessionize.AttributionWindowS)
      : Dataset[AttribOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("event_id"), col("ts_s"),
        col("event_type"), col("value_cents")).as[AEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[ClickState, AttribOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[AEvent], state: GroupState[ClickState]) =>
          val rs = rows.toSeq
          val clicks = rs.filter(_.event_type == "click")
            .map(e => (e.ts_s, e.event_id)).sorted
          val purchases = rs.filter(_.event_type == "purchase")
            .sortBy(e => (e.ts_s, e.event_id))
          val ord = Ordering[(Long, Long)]
          var best = state.getOption.map(s => (s.ts_s, s.click_id)).orNull
          var i = 0
          val out = purchases.map { p =>
            while (i < clicks.length && clicks(i)._1 <= p.ts_s) {
              if (best == null || ord.compare(clicks(i), best) > 0) best = clicks(i)
              i += 1
            }
            if (best != null && best._1 > p.ts_s - windowSeconds)
              AttribOut(p.event_id, user, p.ts_s, p.value_cents,
                Some(best._2), Some(best._1), Some(p.ts_s - best._1), 1)
            else AttribOut(p.event_id, user, p.ts_s, p.value_cents,
              None, None, None, 0)
          }
          // drain trailing clicks (later than every purchase in the batch)
          while (i < clicks.length) {
            if (best == null || ord.compare(clicks(i), best) > 0) best = clicks(i)
            i += 1
          }
          if (best != null) state.update(ClickState(best._1, best._2))
          out.iterator
      }
  }

  // —— stateful sessionization via mapGroupsWithState ——

  case class Event(user_id: Long, ts_s: Long, value: Double)
  case class SessionState(start: Long, last: Long, n: Long)
  case class SessionOut(user_id: Long, session_start_s: Long, n_events: Long, duration_s: Long)

  /** Gap-based sessionizer with explicit `GroupState`: emits one row per
    * (user, closed-or-current session batch). Processing-time timeout keeps
    * state bounded; with Trigger.AvailableNow each user's full history in
    * the batch is sessionized in event order. */
  def sessionize(events: DataFrame, gapSeconds: Long = 1800): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("ts_s"), col("value")).as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          val sorted = rows.toSeq.sortBy(e => (e.ts_s))
          val out = scala.collection.mutable.ListBuffer.empty[SessionOut]
          var st = state.getOption.orNull
          for (e <- sorted) {
            if (st == null) st = SessionState(e.ts_s, e.ts_s, 1L)
            else if (e.ts_s - st.last > gapSeconds) {
              out += SessionOut(user, st.start, st.n, st.last - st.start)
              st = SessionState(e.ts_s, e.ts_s, 1L)
            } else st = SessionState(st.start, e.ts_s, st.n + 1)
          }
          if (st != null) {
            out += SessionOut(user, st.start, st.n, st.last - st.start) // flush current
            state.remove()
          }
          out.iterator
      }
  }

  // —— stateful tier-promotion alerts via flatMapGroupsWithState ——

  case class PEvent(user_id: Long, event_id: Long, ts_s: Long)
  case class TierState(n: Long)
  case class PromoOut(user_id: Long, tier: String, at_ts_s: Long, n_events: Long)

  /** Streaming twin of x132/x138's loyalty-tier logic: per-user
    * `GroupState` carries the lifetime purchase count across
    * micro-batches, and a promotion row fires the moment the count
    * crosses a threshold — the thresholds are
    * [[graft.operators.Relational.TierSilverAt]] /
    * [[graft.operators.Relational.TierGoldAt]], SHARED with the batch
    * operator so stream and warehouse can never disagree on what
    * "silver" means. This is the real-time half of the SCD2 dimension:
    * x138 rebuilds the interval table in batch; this emits the
    * interval-opening events with no rebuild.
    *
    * State is one Long per user (count), the minimal promotion state;
    * each micro-batch's rows sort by the (ts_s, event_id) total key
    * and cross-batch correctness assumes per-user in-order arrival
    * (the same contract as every last-value-state twin here). */
  case class CEvent(user_id: Long, event_type: String, event_id: Long, ts_s: Long)
  case class ConvState(t0: Long, converted: Boolean)
  case class ConvOut(user_id: Long, t0_s: Long, tp_s: Long, latency_days: Long)

  /** Streaming twin of x165's conversion semantics: per-user
    * `GroupState` carries the FIRST signup timestamp and a converted
    * flag; the moment a purchase lands at-or-after that signup, ONE
    * conversion row fires with the exact whole-day latency (x165's
    * bucket key). Purchases before any signup — or before the signup
    * in event-time — never convert (the batch operator's
    * conditional-min rule), and later purchases are absorbed by the
    * flag, so the stream emits exactly the CONVERTED population; the
    * batch x165 table is this stream bucketed by `latency_days` plus
    * the censored complement (signups with no row yet).
    *
    * State is (one Long, one Boolean) per user — minimal funnel state;
    * same per-user in-order contract as the other stateful twins.
    *
    * Timestamp ties: the batch rule qualifies a purchase at `ts >= t0`
    * — ts comparison only — so within a micro-batch signups must fold
    * BEFORE purchases at the same `ts_s` (sort key (ts_s, type
    * priority, event_id), signup first). Sorting by (ts_s, event_id)
    * alone would let a same-second purchase with a smaller event_id
    * slip past the signup unconverted and a LATER purchase convert
    * instead, diverging from x165's conditional-min latency. */
  def conversions(events: DataFrame): Dataset[ConvOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.filter(col("event_type").isin("signup", "purchase"))
      .select(col("user_id"), col("event_type"), col("event_id"), col("ts_s"))
      .as[CEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[ConvState, ConvOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[CEvent], state: GroupState[ConvState]) =>
          val sorted = rows.toSeq.sortBy(e =>
            (e.ts_s, if (e.event_type == "signup") 0 else 1, e.event_id))
          var st = state.getOption.getOrElse(ConvState(-1L, converted = false))
          val out = scala.collection.mutable.ListBuffer.empty[ConvOut]
          for (e <- sorted) {
            if (e.event_type == "signup" && st.t0 < 0)
              st = st.copy(t0 = e.ts_s)
            else if (e.event_type == "purchase" && st.t0 >= 0 &&
                !st.converted && e.ts_s >= st.t0) {
              out += ConvOut(user, st.t0, e.ts_s, (e.ts_s - st.t0) / 86400)
              st = st.copy(converted = true)
            }
          }
          state.update(st)
          out.iterator
      }
  }

  case class ROEvent(user_id: Long, k: Long, event_id: Long, ts_s: Long)
  case class ReorderState(n: Long)
  case class ReorderOut(user_id: Long, k: Long, at_ts_s: Long, n_purchases: Long)

  /** Streaming twin of x154's reorder semantics on the event stream:
    * per (user, item-k) `GroupState` carries the lifetime purchase
    * count, and a row fires the moment a user purchases the same item
    * a SECOND-or-later time — the real-time "replenishment signal"
    * whose batch census is x154's per-part reorder rate (there keyed on
    * the order-fact part; here on the stream's `props.$k` item, the
    * same JSON path as x14). Emits every reorder (n ≥ 2) with the
    * running count, so the warehouse can fold the stream into exactly
    * x154's `n_repeat` (distinct keys seen with n ≥ 2).
    *
    * State is one Long per (user, item) — the minimal reorder state;
    * the composite group key keeps state O(1) per key instead of a
    * per-user item map (a hot user's basket history never concentrates
    * in one state row). Same in-order contract as the other
    * last-value-state twins. */
  def reorders(events: DataFrame): Dataset[ReorderOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.filter(col("event_type") === "purchase")
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"),
        col("event_id"), col("ts_s")).as[ROEvent]
      .groupByKey(e => (e.user_id, e.k))
      .flatMapGroupsWithState[ReorderState, ReorderOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (Long, Long), rows: Iterator[ROEvent], state: GroupState[ReorderState]) =>
          val sorted = rows.toSeq.sortBy(e => (e.ts_s, e.event_id))
          var n = state.getOption.map(_.n).getOrElse(0L)
          val out = sorted.flatMap { e =>
            n += 1
            if (n >= 2) Some(ReorderOut(key._1, key._2, e.ts_s, n)) else None
          }
          state.update(ReorderState(n))
          out.iterator
      }
  }

  def tierPromotions(events: DataFrame): Dataset[PromoOut] = {
    import graft.operators.Relational.{TierGoldAt, TierSilverAt}
    val spark = events.sparkSession
    import spark.implicits._
    events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts_s")).as[PEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[TierState, PromoOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[PEvent], state: GroupState[TierState]) =>
          val sorted = rows.toSeq.sortBy(e => (e.ts_s, e.event_id))
          val out = scala.collection.mutable.ListBuffer.empty[PromoOut]
          var n = state.getOption.map(_.n).getOrElse(0L)
          for (e <- sorted) {
            n += 1
            if (n == TierSilverAt) out += PromoOut(user, "silver", e.ts_s, n)
            else if (n == TierGoldAt) out += PromoOut(user, "gold", e.ts_s, n)
          }
          state.update(TierState(n))
          out.iterator
      }
  }

  // —— stateful CDC last-wins apply via flatMapGroupsWithState ——

  case class CdcOp(k: Long, seq: Long, op: String, cents: Long, prio: String)
  case class CdcState(seq: Long, op: String, cents: Long, prio: String,
                      nOps: Long, nDel: Long)
  case class CdcOut(k: Long, final_op: String, final_cents: Long,
                    final_prio: String, n_ops: Long, n_deletes: Long)

  /** Streaming CDC apply (the 27th twin; `Relational.cdcApply`'s / the
    * x245 gate's stateful twin): a keyed op feed `(k, seq, op ∈ {U, D},
    * payload)` collapses continuously — each trigger, every touched key
    * emits its current last-wins state (Update mode: the row REPLACES
    * the key's previous emission downstream, the CDC-consumer
    * contract). The max-seq rule makes the state ORDER-INDEPENDENT, so
    * late or re-delivered ops converge to the batch collapse — the
    * stream-built final state is spec-proven equal to `cdcApplyOf` on
    * the same feed across micro-batch boundaries. A key whose current
    * winner is a delete still emits (with `final_op = "D"`) so the
    * consumer can retract it — and its TOMBSTONE state is kept, because
    * dropping it would let a late pre-delete op resurrect the key.
    * Per-key state is one tuple, so memory is O(keys ever seen), not
    * O(feed); a production deployment with key churn bounds the
    * tombstones with a state timeout sized to the feed's max lateness
    * (the standard CDC retention contract). */
  def cdcApply(feed: DataFrame): Dataset[CdcOut] = {
    val spark = feed.sparkSession
    import spark.implicits._
    feed.select(col("k"), col("seq"), col("op"), col("cents"), col("prio"))
      .as[CdcOp]
      .groupByKey(_.k)
      .flatMapGroupsWithState[CdcState, CdcOut](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (k: Long, rows: Iterator[CdcOp], state: GroupState[CdcState]) =>
          var st = state.getOption
            .getOrElse(CdcState(Long.MinValue, "", 0L, "", 0L, 0L))
          for (r <- rows) {
            val wins = r.seq > st.seq
            st = CdcState(
              if (wins) r.seq else st.seq,
              if (wins) r.op else st.op,
              if (wins) r.cents else st.cents,
              if (wins) r.prio else st.prio,
              st.nOps + 1, st.nDel + (if (r.op == "D") 1L else 0L))
          }
          state.update(st)
          Iterator.single(CdcOut(k, st.op, st.cents, st.prio, st.nOps, st.nDel))
      }
  }
}
