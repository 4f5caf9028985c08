package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.operators.Sessionize

/** Streaming results must agree with their batch twins on a replayed
  * bounded source (Trigger.AvailableNow → memory sink). */
class EventStreamSpec extends SparkSpec {
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  def runStream(df: org.apache.spark.sql.DataFrame, name: String,
                mode: String = "append"): org.apache.spark.sql.DataFrame = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(mode).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    spark.table(name)
  }

  test("streaming hourly windowed counts match the batch hourly aggregate") {
    // complete-mode agg into memory: watermark append would hold the tail
    val events = EventStream.readEvents(spark, sf)
    val q = EventStream.hourlyCounts(events)
      .writeStream.format("memory").queryName("hourly")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("hourly")
      .select($"window_start_s", $"event_type", $"n_events")
      .as[(Long, String, Long)].collect().toSet
    val batch = Sessionize.hourlyWindows(spark, sf)
      .select($"window_start_s", $"event_type", $"n_events")
      .as[(Long, String, Long)].collect().toSet
    assert(streamed == batch)
  }

  test("streaming sliding windows match the batch sliding aggregate") {
    val q = EventStream.slidingCounts(EventStream.readEvents(spark, sf))
      .writeStream.format("memory").queryName("sliding")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("sliding")
      .select($"window_start_s", $"event_type", $"n_events")
      .as[(Long, String, Long)].collect().toSet
    val batch = Sessionize.slidingWindows(spark, sf)
      .select($"window_start_s", $"event_type", $"n_events")
      .as[(Long, String, Long)].collect().toSet
    assert(streamed == batch)
  }

  test("streaming dedup keeps one row per event_id") {
    val deduped = runStream(
      EventStream.dedupStream(EventStream.readEvents(spark, sf))
        .select($"event_id"), "dedup")
    val total = graft.Tables.events(spark, sf).count()
    val distinct = graft.Tables.events(spark, sf).select($"event_id").distinct().count()
    assert(deduped.count() == distinct && distinct <= total)
  }

  test("batch-fitted deterministic sampling: stream output equals the batch twin row-for-row") {
    import org.apache.spark.sql.expressions.Window
    val batchEv = graft.Tables.events(spark, sf)
    // fit thresholds offline: x48's √(n_min/n) rule over event_type strata
    val thresholds = batchEv.groupBy($"event_type").agg(count(lit(1)).as("n"))
      .withColumn("n_min", min($"n").over(Window.partitionBy()))
      .select($"event_type",
        floor(sqrt($"n_min".cast("double") / $"n") * lit(graft.operators.Sampling.HashSpace))
          .cast("long").as("thresh"))
    val streamed = runStream(
      EventStream.sampledStream(EventStream.readEvents(spark, sf), thresholds)
        .select($"event_id"), "sampled")
      .as[Long].collect().toSet
    val h = graft.operators.Dedup.md5Hash60(concat(lit("ev:"), $"event_id".cast("string")))
    val batchKept = batchEv.join(broadcast(thresholds), Seq("event_type"))
      .filter(h < $"thresh").select($"event_id").as[Long].collect().toSet
    val total = batchEv.count()
    assert(streamed.nonEmpty && streamed.size < total) // the sampler actually fires
    assert(streamed == batchKept) // stateless determinism: batch ≡ stream
  }

  test("stream-static join enriches every event from the broadcast dim") {
    val users = graft.Tables.customer(spark, sf)
    val enriched = runStream(
      EventStream.enrichWithUsers(EventStream.readEvents(spark, sf), users), "enriched")
    val ev = graft.Tables.events(spark, sf)
    val batch = ev.join(users, ev("user_id") === users("c_custkey"), "left")
    assert(enriched.count() == batch.count())
    assert(enriched.filter($"user_name".isNotNull).count() ==
      batch.filter($"c_name".isNotNull).count())
  }

  test("streaming session_window matches batch sessions on watermark-closed sessions") {
    val streamed = runStream(
      EventStream.sessionWindowCounts(EventStream.readEvents(spark, sf)), "sesswin")
      .select($"user_id", $"session_start_s", $"n_events", $"sum_value_cents")
      .as[(Long, Long, Long, Long)].collect().toSet
    val batch = Sessionize.sessions(spark, sf) // x11 twin carries session_end_s
    val batchAll = batch.select($"user_id", $"session_start_s", $"n_events", $"sum_value_cents")
      .as[(Long, Long, Long, Long)].collect().toSet
    // append mode only emits sessions the final watermark (max ts - 2h) has
    // closed (last event + 30min gap strictly past it); later sessions stay
    // in state when the bounded replay ends
    val maxTs = batch.agg(max($"session_end_s")).head().getLong(0)
    val closed = batch.filter($"session_end_s" + 1800 < maxTs - 7200)
      .select($"user_id", $"session_start_s", $"n_events", $"sum_value_cents")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(streamed.subsetOf(batchAll)) // nothing invented
    assert(closed.subsetOf(streamed))   // everything closed is emitted
    assert(streamed.nonEmpty)
  }

  test("stream-stream attribution join matches the batch interval join exactly") {
    val streamed = runStream(
      EventStream.clickPurchaseAttribution(
        EventStream.readEvents(spark, sf), EventStream.readEvents(spark, sf)), "attrib")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val raw = graft.Tables.events(spark, sf)
    val ev = raw.select($"event_id", $"user_id", $"event_type",
      graft.operators.Sessionize.tsSeconds(raw).as("ts_s"))
    val clicks = ev.filter($"event_type" === "click")
      .select($"event_id".as("click_id"), $"user_id", $"ts_s".as("click_ts_s"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id".as("p_user"), $"ts_s".as("purchase_ts_s"))
    val batch = clicks.join(purchases,
      $"user_id" === $"p_user" && $"purchase_ts_s" >= $"click_ts_s" &&
        $"purchase_ts_s" <= $"click_ts_s" + 3600)
      .select($"click_id", $"user_id", $"purchase_id", $"click_ts_s", $"purchase_ts_s")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(streamed == batch) // inner stream-stream joins emit every match
    assert(streamed.nonEmpty)
  }

  test("stream-stream LEFT OUTER join: matches ≡ inner join; nulls are exactly the watermark-closed unmatched clicks") {
    val root = java.nio.file.Files.createTempDirectory("graft-outstream").toString
    val raw = graft.Tables.events(spark, sf)
    val evT = raw.select($"event_id", $"user_id", $"event_type",
      timestamp_seconds(Sessionize.tsSeconds(raw)).as("ts_t"))
    // time-split drops so the watermark ADVANCES mid-stream and flushes
    // the early unmatched clicks' null rows before the feed ends
    val cut = raw.select(Sessionize.tsSeconds(raw).as("s"))
      .stat.approxQuantile("s", Array(0.5), 0.0).head.toLong
    evT.filter(unix_timestamp($"ts_t") <= cut).write.parquet(s"$root/drop")
    evT.filter(unix_timestamp($"ts_t") > cut).write.mode("append").parquet(s"$root/drop")
    def feed() = spark.readStream.schema(evT.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$root/drop")
    val q = EventStream.clickPurchaseOuter(feed(), feed())
      .writeStream.format("memory").queryName("outer_attrib")
      .outputMode("append")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("outer_attrib")
      .as[(Long, Long, Option[Long], Long, Option[Long], Boolean)].collect()
    // 1) the matched rows are exactly the inner join's output
    val ev = raw.select($"event_id", $"user_id", $"event_type",
      Sessionize.tsSeconds(raw).as("ts_s"))
    val clicks = ev.filter($"event_type" === "click")
      .select($"event_id".as("click_id"), $"user_id", $"ts_s".as("click_ts_s"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id".as("p_user"),
        $"ts_s".as("purchase_ts_s"))
    val inner = clicks.join(purchases,
      $"user_id" === $"p_user" && $"purchase_ts_s" >= $"click_ts_s" &&
        $"purchase_ts_s" <= $"click_ts_s" + 3600)
      .select($"click_id", $"user_id", $"purchase_id", $"click_ts_s", $"purchase_ts_s")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(streamed.filter(_._6)
      .map(r => (r._1, r._2, r._3.get, r._4, r._5.get)).toSet == inner)
    // 2) every null row is a genuinely unmatched click, emitted at most once
    val unmatchedBatch = clicks.as[(Long, Long, Long)].collect()
      .filter(c => !inner.exists(_._1 == c._1)).map(c => c._1 -> c._3).toMap
    val nulls = streamed.filter(!_._6)
    assert(nulls.map(_._1).distinct.length == nulls.length)
    nulls.foreach { r => assert(unmatchedBatch.contains(r._1), s"click ${r._1}") }
    // 3) completeness up to a SOUND watermark bound: after batch 1
    // (events ≤ cut) the watermark is cut − 2 h, so batch 2 must evict —
    // and null-emit — every unmatched click whose 1 h window closed
    // strictly before it. (The FINAL watermark lags one batch, so the
    // tail zone near max event time is legitimately still buffered at
    // termination — asserting against it would encode a race.)
    val horizon = cut - 7200 - 3600 - 1
    val mustEmit = unmatchedBatch.filter(_._2 < horizon).keySet
    val emitted = nulls.map(_._1).toSet
    assert(mustEmit.subsetOf(emitted),
      s"${(mustEmit -- emitted).size} watermark-closed nulls never emitted")
    assert(nulls.nonEmpty && inner.nonEmpty, "fixture must exercise both arms")
  }

  test("kmv sketch aggregates incrementally under streaming state, equal to batch") {
    // the custom TypedImperativeAggregate must serialize/merge correctly
    // through the streaming state store — complete-mode windowed sketch
    // over the replay equals the same aggregation run as a batch
    import graft.functions.KmvSketch.kmv_sketch
    import graft.operators.Dedup
    val userHash = Dedup.md5Hash60($"user_id".cast("string"))
    val q = EventStream.readEvents(spark, sf)
      .groupBy(window($"ts_t", "6 hours"))
      .agg(kmv_sketch(userHash, 32).as("sk"))
      .select(unix_timestamp($"window.start").as("w"),
        $"sk.n_kept", $"sk.kth_hash", $"sk.est_distinct")
      .writeStream.format("memory").queryName("sketchwin")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("sketchwin")
      .as[(Long, Int, Long, Double)].collect().toSet
    val raw = graft.Tables.events(spark, sf)
    val batch = raw
      .withColumn("ts_t", timestamp_seconds(graft.operators.Sessionize.tsSeconds(raw)))
      .groupBy(window($"ts_t", "6 hours"))
      .agg(kmv_sketch(userHash, 32).as("sk"))
      .select(unix_timestamp($"window.start").as("w"),
        $"sk.n_kept", $"sk.kth_hash", $"sk.est_distinct")
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("stateful streaming transitions ≡ batch x85 across a micro-batch boundary") {
    val root = java.nio.file.Files.createTempDirectory("graft-transtream").toString
    val raw = graft.Tables.events(spark, sf)
    val ev = raw.select($"event_id", $"user_id", $"event_type",
      Sessionize.tsSeconds(raw).as("ts_s"))
    // two drops split BY TIME so per-user arrival stays in order across
    // micro-batches (the state contract); median second as the boundary
    val cut = ev.stat.approxQuantile("ts_s", Array(0.5), 0.0).head.toLong
    ev.filter($"ts_s" <= cut).write.parquet(s"$root/drop")
    ev.filter($"ts_s" > cut).write.mode("append").parquet(s"$root/drop")
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$root/drop")
    val q = EventStream.transitions(stream).toDF()
      .writeStream.format("memory").queryName("trans_stream")
      .outputMode("append")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("trans_stream")
      .groupBy($"prev_type", $"next_type")
      .agg(count(lit(1)).as("n_transitions"), countDistinct($"user_id").as("n_users"))
      .as[(String, String, Long, Long)].collect().toSet
    val batch = Sessionize.eventTransitions(spark, sf)
      .as[(String, String, Long, Long)].collect().toSet
    assert(streamed == batch && streamed.nonEmpty)
    // the boundary actually split users across micro-batches (state was exercised)
    val usersBothSides = ev.filter($"ts_s" <= cut).select($"user_id").distinct()
      .intersect(ev.filter($"ts_s" > cut).select($"user_id").distinct()).count()
    assert(usersBothSides > 0, "fixture must force cross-batch state handoff")
  }

  test("stateful streaming debounce ≡ batch x258 across a micro-batch boundary") {
    val root = java.nio.file.Files.createTempDirectory("graft-dbstream").toString
    val raw = graft.Tables.events(spark, sf)
    val ev = raw.select($"event_id", $"user_id", $"event_type",
      Sessionize.tsSeconds(raw).as("ts_s"))
    // time-split drops: per-key arrival stays in order across batches
    val cut = ev.stat.approxQuantile("ts_s", Array(0.5), 0.0).head.toLong
    ev.filter($"ts_s" <= cut).write.parquet(s"$root/drop")
    ev.filter($"ts_s" > cut).write.mode("append").parquet(s"$root/drop")
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$root/drop")
    val q = EventStream.debounce(stream).toDF()
      .writeStream.format("memory").queryName("db_stream")
      .outputMode("append")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("db_stream")
      .select($"event_id", $"kept").as[(Long, Boolean)].collect().toMap
    val batch = Sessionize
      .debouncedEvents(spark, sf, Sessionize.DebounceGapSeconds)
      .select($"event_id", $"kept").as[(Long, Boolean)].collect().toMap
    assert(streamed == batch && streamed.nonEmpty)
    assert(streamed.values.exists(identity) && streamed.values.exists(!_))
    // a (user, type) key crossing the boundary proves the state handoff:
    // without carried state its first post-cut event would be mis-kept
    val keysBothSides = ev.filter($"ts_s" <= cut)
      .select($"user_id", $"event_type").distinct()
      .intersect(ev.filter($"ts_s" > cut)
        .select($"user_id", $"event_type").distinct()).count()
    assert(keysBothSides > 0, "fixture must force cross-batch state handoff")
  }

  test("stateful twin under the RocksDB state store provider ≡ the batch operator") {
    // the 100 TB state backend: swap the HDFS-backed in-memory provider
    // for RocksDB (bounded heap at billions of keys) and prove the
    // stateful twin's output is identical — the state-store contract,
    // not the provider, carries the semantics
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val streamed = runStream(
        EventStream.debounce(EventStream.readEvents(spark, sf)).toDF()
          .select($"event_id", $"kept"), "debounce_rocks")
        .as[(Long, Boolean)].collect().toMap
      val batch = Sessionize
        .debouncedEvents(spark, sf, Sessionize.DebounceGapSeconds)
        .select($"event_id", $"kept").as[(Long, Boolean)].collect().toMap
      assert(streamed == batch && streamed.nonEmpty)
      assert(streamed.values.exists(identity) && streamed.values.exists(!_))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }

  test("stateful streaming lastTouch ≡ batch x112 across a micro-batch boundary") {
    val root = java.nio.file.Files.createTempDirectory("graft-ltstream").toString
    val raw = graft.Tables.events(spark, sf)
    val ev = raw.select($"event_id", $"user_id", $"event_type",
      Sessionize.tsSeconds(raw).as("ts_s"),
      round($"value" * 100).cast("long").as("value_cents"))
    // time-split drops: per-user arrival stays in order across batches
    val cut = ev.stat.approxQuantile("ts_s", Array(0.5), 0.0).head.toLong
    ev.filter($"ts_s" <= cut).write.parquet(s"$root/drop")
    ev.filter($"ts_s" > cut).write.mode("append").parquet(s"$root/drop")
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$root/drop")
    val q = EventStream.lastTouch(stream).toDF()
      .writeStream.format("memory").queryName("lt_stream")
      .outputMode("append")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("lt_stream")
      .select($"purchase_id", $"user_id", $"purchase_ts_s", $"value_cents",
        $"click_id", $"click_ts_s", $"lag_s", $"attributed")
      .as[(Long, Long, Long, Long, Option[Long], Option[Long], Option[Long], Int)]
      .collect().toSet
    val batch = Sessionize.lastTouchAttribution(spark, sf)
      .as[(Long, Long, Long, Long, Option[Long], Option[Long], Option[Long], Int)]
      .collect().toSet
    assert(streamed == batch && streamed.nonEmpty)
    assert(streamed.exists(_._8 == 1) && streamed.exists(_._8 == 0),
      "fixture must exercise both attributed and unattributed purchases")
    val usersBothSides = ev.filter($"ts_s" <= cut).select($"user_id").distinct()
      .intersect(ev.filter($"ts_s" > cut).select($"user_id").distinct()).count()
    assert(usersBothSides > 0, "fixture must force cross-batch state handoff")

    // planted simultaneity + staleness: a click SIMULTANEOUS with the
    // purchase but with a larger event_id must win (the batch tie-break),
    // even arriving in the same micro-batch after the purchase; a
    // purchase beyond the window stays unattributed
    val root2 = java.nio.file.Files.createTempDirectory("graft-ltstream2").toString
    Seq((1L, 1L, "click", 100L, 0L))
      .toDF("event_id", "user_id", "event_type", "ts_s", "value_cents")
      .coalesce(1).write.parquet(s"$root2/drop")
    Seq((2L, 1L, "purchase", 200L, 500L), (3L, 1L, "click", 200L, 0L),
        (4L, 1L, "purchase", 5000L, 700L))
      .toDF("event_id", "user_id", "event_type", "ts_s", "value_cents")
      .coalesce(1).write.mode("append").parquet(s"$root2/drop")
    val stream2 = spark.readStream
      .schema(spark.read.parquet(s"$root2/drop").schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$root2/drop")
    val q2 = EventStream.lastTouch(stream2).toDF()
      .writeStream.format("memory").queryName("lt_stream2")
      .outputMode("append")
      .option("checkpointLocation", s"$root2/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination(120000)
    val got2 = spark.table("lt_stream2")
      .select($"purchase_id", $"click_id", $"attributed")
      .as[(Long, Option[Long], Int)].collect()
      .map { case (k, v, a) => k -> (v, a) }.toMap
    assert(got2(2L) == (Some(3L), 1), "same-ts later-id click must win")
    assert(got2(4L) == (None, 0), "stale click beyond the window must not attribute")
  }

  test("stateful streaming EWMA ≡ batch x101 across a micro-batch boundary") {
    val root = java.nio.file.Files.createTempDirectory("graft-ewmastream").toString
    val raw = graft.Tables.events(spark, sf)
    val ev = raw.select($"event_type", Sessionize.tsSeconds(raw).as("ts_s"))
    // time-split drops: per-type arrival stays in order across batches
    val cut = ev.stat.approxQuantile("ts_s", Array(0.5), 0.0).head.toLong
    ev.filter($"ts_s" <= cut).write.parquet(s"$root/drop")
    ev.filter($"ts_s" > cut).write.mode("append").parquet(s"$root/drop")
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$root/drop")
    val q = EventStream.ewmaPopularity(stream).toDF()
      .writeStream.format("memory").queryName("ewma_stream")
      .outputMode("append")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // counts and points are monotone per key, so max = last emission
    val streamed = spark.table("ewma_stream")
      .groupBy($"event_type", $"hour_start_s")
      .agg(max($"n_events").as("n_events"), max($"ewma_pts").as("ewma_pts"))
      .as[(String, Long, Long, Long)].collect().toSet
    val batch = Sessionize.ewmaPopularity(spark, sf)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(streamed == batch && streamed.nonEmpty)
    // planted cross-batch hour update (sf0.001 hours are too sparse to
    // span the median cut): one hour split across two drops must be
    // re-emitted with the cumulative count, and a later hour must see
    // the full decayed mass of the earlier one
    val root2 = java.nio.file.Files.createTempDirectory("graft-ewmastream2").toString
    val h0 = 3600L * 4000000
    Seq.tabulate(3)(i => ("view", h0 + i)).toDF("event_type", "ts_s")
      .coalesce(1).write.parquet(s"$root2/drop")
    (Seq.tabulate(2)(i => ("view", h0 + 60 + i)) :+ ("view", h0 + 3600L))
      .toDF("event_type", "ts_s")
      .coalesce(1).write.mode("append").parquet(s"$root2/drop")
    val stream2 = spark.readStream
      .schema(spark.read.parquet(s"$root2/drop").schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$root2/drop")
    val q2 = EventStream.ewmaPopularity(stream2).toDF()
      .writeStream.format("memory").queryName("ewma_stream2")
      .outputMode("append")
      .option("checkpointLocation", s"$root2/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination(120000)
    val rows2 = spark.table("ewma_stream2")
      .as[(String, Long, Long, Long)].collect()
    val wWin = Sessionize.EwmaHours
    // hour h0 emitted twice: 3 events, then cumulative 5
    val h0Emissions = rows2.filter(_._2 == h0).map(_._3).sorted
    assert(h0Emissions.toSeq == Seq(3L, 5L), s"cross-batch update: ${h0Emissions.toSeq}")
    // the next hour's EWMA carries its own event at full weight plus the
    // FULL cross-batch h0 mass decayed one step
    val next = rows2.filter(_._2 == h0 + 3600L)
    assert(next.map(_._4).toSeq == Seq((1L << (wWin - 1)) + (5L << (wWin - 2))))
  }

  test("flatMapGroupsWithState sessionization matches the batch window sessionizer") {
    val sessions = runStream(
      EventStream.sessionize(EventStream.readEvents(spark, sf)).toDF(), "sessions")
    val streamedCount = sessions.count()
    val batchCount = Sessionize.sessions(spark, sf).count()
    assert(streamedCount == batchCount)
    // per-user event totals conserved
    val streamedEvents = sessions.agg(sum($"n_events")).head().getLong(0)
    assert(streamedEvents == graft.Tables.events(spark, sf).count())
  }

  test("streaming weeklyActiveUsers ≡ batch x147 WAU (exact stateful distinct)") {
    val wau = runStream(
      EventStream.weeklyActiveUsers(EventStream.readEvents(spark, sf)), "wau_stream",
      mode = "complete")
    val streamed = wau.as[(Long, Long)].collect().toMap
    val batch = Sessionize.activeUsers(spark, sf)
      .select($"week", $"wau").as[(Long, Long)].collect().toMap
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("streaming hllRegisters ≡ batch x199 registers (mergeable max sketch)") {
    val streamed = runStream(
      EventStream.hllRegisters(EventStream.readEvents(spark, sf)), "hll_stream",
      mode = "complete")
      .as[(String, Long, Long)].collect()
      .map { case (t, b, r) => (t, b) -> r }.toMap
    val raw = graft.Tables.events(spark, sf)
    val batch = graft.operators.Relational
      .withHllRank(raw.select($"event_type", $"user_id"), $"user_id")
      .groupBy($"event_type", $"bucket")
      .agg(org.apache.spark.sql.functions.max($"rnk").as("register"))
      .as[(String, Long, Long)].collect()
      .map { case (t, b, r) => (t, b) -> r }.toMap
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("stateful streaming tierPromotions ≡ a driver replay across a micro-batch boundary") {
    val root = java.nio.file.Files.createTempDirectory("graft-tierstream").toString
    val raw = graft.Tables.events(spark, sf)
    val ev = raw.select($"event_id", $"user_id", $"event_type",
      Sessionize.tsSeconds(raw).as("ts_s"))
    val cut = ev.stat.approxQuantile("ts_s", Array(0.5), 0.0).head.toLong
    ev.filter($"ts_s" <= cut).write.parquet(s"$root/drop")
    ev.filter($"ts_s" > cut).write.mode("append").parquet(s"$root/drop")
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$root/drop")
    val q = EventStream.tierPromotions(stream).toDF()
      .writeStream.format("memory").queryName("tier_stream")
      .outputMode("append")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("tier_stream")
      .as[(Long, String, Long, Long)].collect().toSet
    // driver replay over the full (unsplit) purchase log
    import graft.operators.Relational.{TierGoldAt, TierSilverAt}
    val want = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"ts_s").as[(Long, Long, Long)]
      .collect().toSeq.groupBy(_._1).toSeq.flatMap { case (u, es) =>
        es.sortBy(e => (e._3, e._2)).zipWithIndex.collect {
          case ((_, _, ts), i) if i + 1 == TierSilverAt => (u, "silver", ts, (i + 1).toLong)
          case ((_, _, ts), i) if i + 1 == TierGoldAt   => (u, "gold", ts, (i + 1).toLong)
        }
      }.toSet
    assert(streamed == want && streamed.nonEmpty)
    // a user whose promotion lands in drop 2 with prior purchases in drop 1
    // proves the count survived the boundary
    val purch = ev.filter($"event_type" === "purchase")
    val crossUsers = purch.filter($"ts_s" <= cut).select($"user_id").distinct()
      .intersect(purch.filter($"ts_s" > cut).select($"user_id").distinct()).count()
    assert(crossUsers > 0, "fixture must force cross-batch state handoff")
  }

  test("stateful streaming reorders ≡ a driver replay across a micro-batch boundary") {
    val root = java.nio.file.Files.createTempDirectory("graft-reorderstream").toString
    val raw = graft.Tables.events(spark, sf)
    val ev = raw.select($"event_id", $"user_id", $"event_type", $"props",
      Sessionize.tsSeconds(raw).as("ts_s"))
    val cut = ev.stat.approxQuantile("ts_s", Array(0.5), 0.0).head.toLong
    ev.filter($"ts_s" <= cut).write.parquet(s"$root/drop")
    ev.filter($"ts_s" > cut).write.mode("append").parquet(s"$root/drop")
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$root/drop")
    val q = EventStream.reorders(stream).toDF()
      .writeStream.format("memory").queryName("reorder_stream")
      .outputMode("append")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("reorder_stream")
      .as[(Long, Long, Long, Long)].collect().toSet
    // driver replay over the full (unsplit) purchase log: every (user, k)
    // purchase occurrence past the first is a reorder row
    val want = ev.filter($"event_type" === "purchase")
      .select($"user_id", get_json_object($"props", "$.k").cast("long"),
        $"event_id", $"ts_s").as[(Long, Long, Long, Long)]
      .collect().toSeq.groupBy(e => (e._1, e._2)).toSeq.flatMap { case ((u, k), es) =>
        es.sortBy(e => (e._4, e._3)).zipWithIndex.collect {
          case ((_, _, _, ts), i) if i + 1 >= 2 => (u, k, ts, (i + 1).toLong)
        }
      }.toSet
    assert(streamed == want && streamed.nonEmpty)
    // the stream's reorder keys fold to exactly the batch census shape:
    // distinct (user, k) with a reorder == keys whose replayed count ≥ 2
    val streamedKeys = streamed.map(r => (r._1, r._2))
    val wantKeys = want.map(r => (r._1, r._2))
    assert(streamedKeys == wantKeys)
    // cross-batch handoff: some (user, k) purchases in both drops
    val purch = ev.filter($"event_type" === "purchase")
      .select($"user_id", get_json_object($"props", "$.k").cast("long").as("k"), $"ts_s")
    val crossKeys = purch.filter($"ts_s" <= cut).select($"user_id", $"k").distinct()
      .intersect(purch.filter($"ts_s" > cut).select($"user_id", $"k").distinct()).count()
    assert(crossKeys > 0, "fixture must force cross-batch state handoff")
  }

  test("stateful streaming conversions ≡ batch x165's converted rows across a batch boundary") {
    val root = java.nio.file.Files.createTempDirectory("graft-convstream").toString
    val raw = graft.Tables.events(spark, sf)
    val ev = raw.select($"event_id", $"user_id", $"event_type",
      Sessionize.tsSeconds(raw).as("ts_s"))
    val cut = ev.stat.approxQuantile("ts_s", Array(0.5), 0.0).head.toLong
    ev.filter($"ts_s" <= cut).write.parquet(s"$root/drop")
    ev.filter($"ts_s" > cut).write.mode("append").parquet(s"$root/drop")
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$root/drop")
    val q = EventStream.conversions(stream).toDF()
      .writeStream.format("memory").queryName("conv_stream")
      .outputMode("append")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("conv_stream")
      .as[(Long, Long, Long, Long)].collect().toSet
    // driver replay: first signup, first purchase at-or-after it
    val rows = ev.select($"user_id", $"event_type", $"ts_s")
      .as[(Long, String, Long)].collect().toSeq
    val t0 = rows.filter(_._2 == "signup").groupBy(_._1).view.mapValues(_.map(_._3).min)
    val want = t0.toSeq.flatMap { case (u, t) =>
      rows.filter(r => r._1 == u && r._2 == "purchase" && r._3 >= t)
        .map(_._3).sorted.headOption
        .map(tp => (u, t, tp, (tp - t) / 86400))
    }.toSet
    assert(streamed == want && streamed.nonEmpty)
    // exactly one conversion per converted user
    assert(streamed.toSeq.map(_._1).distinct.size == streamed.size)
    // the batch x165 table is this stream bucketed + the censored mass
    val batch = Sessionize.conversionLatency(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    val streamBuckets = streamed.toSeq.groupBy(_._4).view.mapValues(_.size.toLong).toMap
    batch.filter(_._1 >= 0).foreach { case (d, n, _, _) =>
      assert(streamBuckets.getOrElse(d, 0L) == n, s"bucket $d")
    }
    assert(batch.collectFirst { case r if r._1 == -1L => r._2 }.getOrElse(0L)
      == t0.size.toLong - streamed.size)
  }

  test("conversions: same-second purchase/signup tie folds signup-first (batch x165 parity)") {
    // user 1: a purchase in the SAME second as the signup but with a
    // SMALLER event_id, then a later purchase. The batch rule (ts-only
    // comparison) converts at latency 0; a (ts_s, event_id) sort would
    // skip the tied purchase and report the later one instead.
    val root = java.nio.file.Files.createTempDirectory("graft-convtie").toString
    val t0 = 1700000000L
    val rows = Seq(
      (1L, 1L, "purchase", t0),            // tied purchase, smaller id
      (2L, 1L, "signup", t0),              // signup, same second
      (3L, 1L, "purchase", t0 + 2 * 86400) // decoy later purchase
    ).toDF("event_id", "user_id", "event_type", "ts_s")
    rows.write.parquet(s"$root/drop") // one file → one micro-batch: the tie is intra-batch
    val stream = spark.readStream.schema(rows.schema).parquet(s"$root/drop")
    val q = EventStream.conversions(stream).toDF()
      .writeStream.format("memory").queryName("conv_tie")
      .outputMode("append")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("conv_tie").as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, t0, t0, 0L)))
  }

  test("stateful streaming CDC apply ≡ batch x245 collapse, under OUT-OF-ORDER arrival") {
    import graft.operators.Relational
    val root = java.nio.file.Files.createTempDirectory("graft-cdcstream").toString
    // spec-local keyspace of 200 (the gate's 3000 exceeds this sf's max
    // orderkey, which would leave every key with one op): ~7 ops/key
    val ks = 200L
    val feed = graft.Tables.orders(spark, sf).select(
      ($"o_orderkey" % ks).as("k"),
      $"o_orderkey".as("seq"),
      when($"o_orderkey" % Relational.CdcDeleteMod === Relational.CdcDeleteAt, "D")
        .otherwise("U").as("op"),
      round($"o_totalprice" * 100).cast("long").as("cents"),
      $"o_orderpriority".as("prio"))
    // split by GENERATION parity: each key's ops alternate between the
    // two micro-batches, so ops arrive out of order per key — the
    // max-seq collapse is order-independent, so the stream must still
    // converge to the batch state (a property the in-order twins never
    // claim)
    feed.filter(($"seq" / ks).cast("long") % 2 === 0).write.parquet(s"$root/drop")
    feed.filter(($"seq" / ks).cast("long") % 2 === 1)
      .write.mode("append").parquet(s"$root/drop")
    val stream = spark.readStream.schema(feed.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$root/drop")
    val q = EventStream.cdcApply(stream).toDF()
      .writeStream.format("memory").queryName("cdc_stream")
      .outputMode("update")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not drain in time — " +
      "the memory table would be partial")
    // the key's LAST emission (max n_ops — it only grows) is its final
    // state; a final D is the downstream retraction
    val streamed = spark.table("cdc_stream")
      .groupBy($"k").agg(max_by(struct($"final_op", $"final_cents",
        $"final_prio", $"n_ops", $"n_deletes"), $"n_ops").as("s"))
      .select($"k", $"s.*")
      .filter($"final_op" =!= "D")
      .select($"k", $"final_cents", $"final_prio", $"n_ops", $"n_deletes")
      .as[(Long, Long, String, Long, Long)].collect().toSet
    val batch = Relational.cdcApplyOf(feed)
      .as[(Long, Long, String, Long, Long)].collect().toSet
    assert(streamed == batch && streamed.nonEmpty)
    // the generation split really interleaved: keys got ops in both drops
    val both = feed.filter(($"seq" / ks).cast("long") % 2 === 0).select($"k").distinct()
      .intersect(feed.filter(($"seq" / ks).cast("long") % 2 === 1).select($"k").distinct())
      .count()
    assert(both > 0, "fixture must force cross-batch out-of-order state")
  }

  test("debounce TTL: an idle key is evicted in event time and the bounded run terminates") {
    // planted 4-file replay, maxFilesPerTrigger=1 (one file per batch):
    //   f1: key (u1, click) at ts=1000            → state armed, TTL at 1000+8·gap
    //   f2: (u2, click) at ts far past the horizon → watermark passes u1's timer
    //   f3: more u2 data, NO u1 data               → u1's timeout fires, state evicted
    //   f4: (u1, click) at ts=1200 — WITHIN the gap of f1's event and
    //       out-of-order beyond the TTL (outside the documented contract)
    // The beyond-contract straggler f4 must be DROPPED by the
    // watermark's late filter (fail-closed: never mis-flagged), and
    // eviction itself shows up in the state-operator metrics
    // (numRowsRemoved fires when u1's timer passes, and the final
    // state holds fewer rows than the keys ever seen). The whole
    // replay draining under AvailableNow is itself the regression
    // test for wall-clock timers (a ProcessingTimeTimeout here never
    // terminates).
    val gap = Sessionize.DebounceGapSeconds
    val ttl = gap * EventStream.DebounceTtlGapMultiples
    val far = 1000L + 2 * ttl + 2 * gap
    val root = java.nio.file.Files.createTempDirectory("graft-dbttl").toString
    def drop(rows: Seq[(Long, Long, String, Long)]): Unit =
      rows.toDF("event_id", "user_id", "event_type", "ts_s")
        .coalesce(1).write.mode("append").parquet(s"$root/drop")
    drop(Seq((1L, 1L, "click", 1000L)))
    drop(Seq((2L, 2L, "click", far)))
    drop(Seq((3L, 2L, "click", far + gap)))
    drop(Seq((4L, 1L, "click", 1200L)))
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$root/drop").schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$root/drop")
    val q = EventStream.debounce(stream).toDF()
      .writeStream.format("memory").queryName("db_ttl")
      .outputMode("append")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000),
      "bounded replay must terminate — event-time timers, not wall-clock")
    val got = spark.table("db_ttl")
      .select($"event_id", $"kept").as[(Long, Boolean)].collect().toMap
    assert(got == Map(1L -> true, 2L -> true, 3L -> true),
      s"the beyond-TTL straggler must be late-filtered, not mis-flagged: $got")
    val removed = q.recentProgress
      .flatMap(p => Option(p.stateOperators).toSeq.flatten)
      .map(_.numRowsRemoved).sum
    assert(removed >= 1, "the idle key's state must actually be evicted")
    val finalRows = q.recentProgress.reverse
      .flatMap(p => Option(p.stateOperators).toSeq.flatten)
      .headOption.map(_.numRowsTotal)
    assert(finalRows.exists(_ < 2),
      s"final state must hold fewer rows than keys ever seen: $finalRows")
  }

  test("cdcApply under the RocksDB state store provider ≡ batch collapse (r14 verdict task 6)") {
    // the LARGEST-state twin (one tuple per key ever seen, tombstones
    // kept) under the 100 TB state backend: same out-of-order two-batch
    // replay as the in-memory test, provider swapped to RocksDB — the
    // state-store contract, not the provider, carries the semantics.
    // (The other "large-state" candidate, cluster ingest, is foreachBatch:
    // its cross-batch state is the exactly-once artifact ledger on disk,
    // not a state store, so the provider swap is a structural no-op
    // there — see DocumentStreamSpec's provider-swap run.)
    import graft.operators.Relational
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val root = java.nio.file.Files.createTempDirectory("graft-cdcrocks").toString
      val ks = 200L
      val feed = graft.Tables.orders(spark, sf).select(
        ($"o_orderkey" % ks).as("k"),
        $"o_orderkey".as("seq"),
        when($"o_orderkey" % Relational.CdcDeleteMod === Relational.CdcDeleteAt, "D")
          .otherwise("U").as("op"),
        round($"o_totalprice" * 100).cast("long").as("cents"),
        $"o_orderpriority".as("prio"))
      feed.filter(($"seq" / ks).cast("long") % 2 === 0).write.parquet(s"$root/drop")
      feed.filter(($"seq" / ks).cast("long") % 2 === 1)
        .write.mode("append").parquet(s"$root/drop")
      val stream = spark.readStream.schema(feed.schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$root/drop")
      val q = EventStream.cdcApply(stream).toDF()
        .writeStream.format("memory").queryName("cdc_rocks")
        .outputMode("update")
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000), "stream did not drain in time")
      val streamed = spark.table("cdc_rocks")
        .groupBy($"k").agg(max_by(struct($"final_op", $"final_cents",
          $"final_prio", $"n_ops", $"n_deletes"), $"n_ops").as("s"))
        .select($"k", $"s.*")
        .filter($"final_op" =!= "D")
        .select($"k", $"final_cents", $"final_prio", $"n_ops", $"n_deletes")
        .as[(Long, Long, String, Long, Long)].collect().toSet
      val batch = Relational.cdcApplyOf(feed)
        .as[(Long, Long, String, Long, Long)].collect().toSet
      assert(streamed == batch && streamed.nonEmpty)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }
}
