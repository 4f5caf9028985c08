package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** r16 (r15 verdict task 4): the RocksDB state-backend bit-identity
  * proof extended from 3 twins to the WHOLE stateful panel. For every
  * stateful twin `graft.BenchStreaming` prices, the same bounded
  * AvailableNow replay runs twice — default (HDFS-backed in-memory)
  * provider vs `RocksDBStateStoreProvider` — and the emitted tables must
  * be bit-identical: the state-store CONTRACT carries the semantics, the
  * provider is a capacity choice (bounded heap at billions of keys at
  * 100 TB). Stateless twins (static enrich, deterministic sampler, BPE
  * chunker) are out of scope by construction — no state store runs.
  *
  * debounce/cdcApply/cluster-ingest were proven in r15 (EventStreamSpec /
  * DocumentStreamSpec); this matrix covers the remaining panel and keeps
  * those three under their original, stronger vs-batch gates. */
class RocksDbPanelSpec extends SparkSpec {
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  private val RocksProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  private def withProvider[A](provider: Option[String])(f: => A): A = {
    val prev = spark.conf.getOption(ProviderKey)
    provider match {
      case Some(p) => spark.conf.set(ProviderKey, p)
      case None    => spark.conf.unset(ProviderKey)
    }
    try f
    finally prev match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None    => spark.conf.unset(ProviderKey)
    }
  }

  private var runId = 0

  /** One bounded replay into a memory sink; rows as a sorted JSON vector
    * (MULTISET equality — append-mode twins may legitimately emit
    * duplicate value rows). */
  private def replay(source: DataFrame, build: DataFrame => DataFrame,
                     mode: String): Vector[String] = {
    runId += 1
    val name = s"rocksdb_panel_$runId"
    val q = build(source).writeStream.format("memory").queryName(name)
      .outputMode(mode).trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(180000), s"$name did not drain")
    spark.table(name).toJSON.collect().toVector.sorted
  }

  private def assertProviderInvariant(twin: String,
                                      build: DataFrame => DataFrame,
                                      mode: String,
                                      source: () => DataFrame): Unit = {
    val default = withProvider(None)(replay(source(), build, mode))
    val rocks = withProvider(Some(RocksProvider))(replay(source(), build, mode))
    assert(default.nonEmpty, s"$twin emitted nothing — vacuous matrix row")
    assert(default == rocks,
      s"$twin diverged under RocksDB: default=${default.size} rows, " +
        s"rocks=${rocks.size} rows; first diff: " +
        default.zipAll(rocks, "<missing>", "<missing>")
          .find { case (a, b) => a != b }.getOrElse(("", "")))
  }

  private def events() = EventStream.readEvents(spark, sf)

  // the cdc op feed derived exactly as BenchStreaming derives it
  private def cdcFeed(ev: DataFrame): DataFrame = {
    import graft.operators.Relational.{CdcDeleteAt, CdcDeleteMod}
    ev.select(col("user_id").as("k"), col("event_id").as("seq"),
      when(col("event_id") % CdcDeleteMod === CdcDeleteAt, "D")
        .otherwise("U").as("op"),
      round(col("value") * 100).cast("long").as("cents"),
      col("event_type").as("prio"))
  }

  private val eventTwins: Seq[(String, DataFrame => DataFrame, String)] = Seq(
    ("fmgws_sessionize", ev => EventStream.sessionize(ev).toDF(), "append"),
    ("hourly_counts", EventStream.hourlyCounts, "append"),
    ("sliding_counts", EventStream.slidingCounts, "append"),
    ("session_window", ev => EventStream.sessionWindowCounts(ev), "append"),
    ("dedup_stream", EventStream.dedupStream, "append"),
    ("click_purchase_stream",
      ev => EventStream.clickPurchaseAttribution(ev, events()), "append"),
    ("click_purchase_outer",
      ev => EventStream.clickPurchaseOuter(ev, events()), "append"),
    ("transitions_stream", ev => EventStream.transitions(ev).toDF(), "append"),
    ("tier_promotions_stream", ev => EventStream.tierPromotions(ev).toDF(), "append"),
    ("reorders_stream", ev => EventStream.reorders(ev).toDF(), "append"),
    ("conversions_stream", ev => EventStream.conversions(ev).toDF(), "append"),
    ("wau_stream", EventStream.weeklyActiveUsers, "complete"),
    ("hll_stream", EventStream.hllRegisters, "update"),
    ("ewma_stream", ev => EventStream.ewmaPopularity(ev).toDF(), "append"),
    ("last_touch_stream", { ev =>
      EventStream.lastTouch(ev.withColumn("value_cents",
        round(col("value") * 100).cast("long"))).toDF()
    }, "append"),
    ("cdc_apply_stream", ev => EventStream.cdcApply(cdcFeed(ev)).toDF(), "update"))

  eventTwins.foreach { case (twin, build, mode) =>
    test(s"$twin: RocksDB provider run ≡ default provider run") {
      assertProviderInvariant(twin, build, mode, () => events())
    }
  }

  // documents-side stateful twins: file stream over a symlinked drop dir
  // (the BenchStreaming runDocs shape, no data copy)
  private def docsStream(): DataFrame = {
    val batch = spark.read.parquet(s"$sf/documents.parquet")
    val drop = java.nio.file.Files.createTempDirectory("graft-rocksdocs")
    java.nio.file.Files.createSymbolicLink(drop.resolve("documents.parquet"),
      java.nio.file.Paths.get(s"$sf/documents.parquet"))
    spark.readStream.schema(batch.schema).parquet(drop.toString)
  }

  Seq[(String, DataFrame => DataFrame, String)](
    ("token_budget_stream", DocumentStream.tokenBudgetStream, "update"),
    ("countmin_stream", DocumentStream.countMinStream, "update"))
    .foreach { case (twin, build, mode) =>
      test(s"$twin: RocksDB provider run ≡ default provider run") {
        assertProviderInvariant(twin, build, mode, () => docsStream())
      }
    }
}
