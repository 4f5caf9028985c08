package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** Streaming micro-benchmark: drives the Structured Streaming twins
  * (`graft.streaming.EventStream`) over the events table with an
  * AvailableNow trigger into a noop sink and reports rows/s per twin —
  * the recorded perf number for the streaming surface, sibling to
  * `graft.Bench`'s batch JSON line. Prints ONE JSON line:
  * {"metric":"streaming_rows_per_sec","value":<fmgws rows/s>,...}. */
object BenchStreaming {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // r17 (r16 residual): PRICE the 100 TB state backend, don't just
    // prove it bit-identical (RocksDbPanelSpec) —
    // SPARK_GRAFT_STATE_PROVIDER=rocksdb swaps every stateful twin onto
    // RocksDBStateStoreProvider and the panel lands in
    // STREAM_ROCKSDB.json, so the two provider boards coexist and the
    // swap's rows/s surcharge is a recorded number.
    // Validate the env value (r17 advisory): any spelling other than the
    // two recognized providers would silently fall through to the default
    // store while the artifact records the typo verbatim — a "RocksDB" run
    // would overwrite the default board mislabeled as a rocksdb one. Fail
    // fast instead; `provider` below is the validated, normalized name.
    val provider = sys.env.get("SPARK_GRAFT_STATE_PROVIDER")
      .map(_.trim.toLowerCase) match {
      case None | Some("") | Some("default") => "default"
      case Some("rocksdb")                   => "rocksdb"
      case Some(other) => sys.error(
        s"SPARK_GRAFT_STATE_PROVIDER=$other is not a recognized state " +
          "provider (expected 'default' or 'rocksdb') — refusing to run " +
          "so a mislabeled panel never overwrites a provider board")
    }
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "false") // AQE is batch-only; keep plans comparable
      .config("spark.ui.enabled", "false")
    val spark = (provider match {
      case "rocksdb" => builder.config(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      case _ => builder
    }).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.streaming.EventStream

    val nEvents = spark.read.parquet(s"$sfDir/events.parquet").count()

    // each twin: one AvailableNow pass over the whole events table; rows/s
    // = input rows / wall time of the complete run (start → termination),
    // which charges source listing, state-store maintenance and commit
    // overheads to the twin — the honest end-to-end number
    // scratch trees are per-run — drop them so repeated bench runs don't
    // accumulate in /tmp. Best-effort: a state-store maintenance thread
    // can still be writing late files, and a lost race must not abort
    // the remaining benchmarks.
    def deleteTree(root: java.nio.file.Path): Unit =
      try {
        val walk = Files.walk(root)
        try {
          import scala.jdk.CollectionConverters._
          walk.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
        } finally walk.close()
      } catch {
        case scala.util.control.NonFatal(_) => () // scratch dir; leave it
      }

    def run(name: String, build: DataFrame => DataFrame,
            mode: String = "append"): (String, Double) = {
      val ckpt = Files.createTempDirectory(s"graft-sbench-$name")
      try {
        val t0 = System.nanoTime()
        val q = build(EventStream.readEvents(spark, sfDir))
          .writeStream.format("noop")
          .outputMode(mode)
          .option("checkpointLocation", ckpt.toString)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        val sec = (System.nanoTime() - t0) / 1e9
        name -> (nEvents / sec)
      } finally deleteTree(ckpt)
    }

    // the x44 production-loop twin (graft.streaming.DocumentStream):
    // day-2 documents classified against the persisted day-1 digest
    // index and appended to it, one foreachBatch pass. Setup (index
    // build, file drop) is outside the timer; rows/s is day-2 docs over
    // the classify+append wall time.
    def runIndexIngest(): (String, Double) = {
      import org.apache.spark.sql.functions.{col, max}
      val root = Files.createTempDirectory("graft-sbench-index-ingest")
      try {
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        val mid = docs.agg(max(col("doc_id"))).head().getLong(0) / 2
        graft.operators.Dedup.writeParagraphIndex(
          docs.filter(col("doc_id") < mid), s"$root/index")
        val day2 = docs.filter(col("doc_id") >= mid)
        day2.write.parquet(s"$root/drop")
        val n = day2.count()
        val t0 = System.nanoTime()
        graft.streaming.DocumentStream.startIngest(
          graft.streaming.DocumentStream.readDocuments(spark, s"$root/drop", docs.schema),
          s"$root/index", s"$root/results", s"$root/ckpt")
          .awaitTermination()
        val sec = (System.nanoTime() - t0) / 1e9
        "index_ingest" -> (n / sec)
      } finally deleteTree(root)
    }

    // x96's streaming twin: day-2 docs classified against the persisted
    // band index (near-dup at ingest), then appended to it
    def runBandIngest(): (String, Double) = {
      import org.apache.spark.sql.functions.{col, max}
      val root = Files.createTempDirectory("graft-sbench-band-ingest")
      try {
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        val mid = docs.agg(max(col("doc_id"))).head().getLong(0) / 2
        graft.operators.Dedup.writeBandIndex(
          docs.filter(col("doc_id") < mid), s"$root/index")
        val day2 = docs.filter(col("doc_id") >= mid)
        day2.write.parquet(s"$root/drop")
        val n = day2.count()
        val t0 = System.nanoTime()
        graft.streaming.DocumentStream.startBandIngest(
          graft.streaming.DocumentStream.readDocuments(spark, s"$root/drop", docs.schema),
          s"$root/index", s"$root/results", s"$root/ckpt")
          .awaitTermination()
        val sec = (System.nanoTime() - t0) / 1e9
        "band_ingest" -> (n / sec)
      } finally deleteTree(root)
    }

    // x98's streaming twin: continuous clustering — label vs the staged
    // artifacts, then append labels + bands so the next batch sees them
    def runClusterIngest(): (String, Double) = {
      import org.apache.spark.sql.functions.{col, max}
      val root = Files.createTempDirectory("graft-sbench-cluster-ingest")
      try {
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        val mid = docs.agg(max(col("doc_id"))).head().getLong(0) / 2
        val day1 = docs.filter(col("doc_id") < mid)
        graft.operators.Dedup.writeBandIndex(day1, s"$root/index")
        graft.operators.ClusterStage.writeClusterTable(day1, s"$root/clusters")
        val day2 = docs.filter(col("doc_id") >= mid)
        day2.write.parquet(s"$root/drop")
        val n = day2.count()
        val t0 = System.nanoTime()
        graft.streaming.DocumentStream.startClusterIngest(
          graft.streaming.DocumentStream.readDocuments(spark, s"$root/drop", docs.schema),
          s"$root/index", s"$root/clusters", s"$root/results", s"$root/ckpt")
          .awaitTermination()
        val sec = (System.nanoTime() - t0) / 1e9
        "cluster_ingest" -> (n / sec)
      } finally deleteTree(root)
    }

    // ONE drop-dir harness for every incremental-ingest twin (vector AND
    // bloom rows — r15 advisory): even/odd two-file arrival on `splitKey`,
    // maxFilesPerTrigger=1 (two incremental merges, the ingest shape),
    // timer strictly around the AvailableNow run. Parameterized by the
    // source frame and the started query so a new row can't drift from
    // the shared measurement discipline; anything frozen pre-timer (model
    // state, layout bounds) is computed by the CALLER before this runs.
    def runDropIngest(name: String, source: DataFrame, splitKey: String,
                      start: (DataFrame, String, String) =>
                        org.apache.spark.sql.streaming.StreamingQuery): (String, Double) = {
      import org.apache.spark.sql.functions.col
      val root = Files.createTempDirectory(s"graft-sbench-$name")
      try {
        source.filter(col(splitKey) % 2 === 0).write.parquet(s"$root/drop")
        source.filter(col(splitKey) % 2 === 1).write.mode("append")
          .parquet(s"$root/drop")
        val n = source.count()
        val t0 = System.nanoTime()
        start(spark.readStream.schema(source.schema)
            .option("maxFilesPerTrigger", 1).parquet(s"$root/drop"),
          s"$root/stage", s"$root/ckpt")
          .awaitTermination()
        val sec = (System.nanoTime() - t0) / 1e9
        name -> (n / sec)
      } finally deleteTree(root)
    }
    def runVectorIngest(name: String,
                        start: (org.apache.spark.sql.DataFrame, String, String) =>
                          org.apache.spark.sql.streaming.StreamingQuery): (String, Double) =
      runDropIngest(name, spark.read.parquet(s"$sfDir/embeddings.parquet"),
        "vec_id", start)
    def runKnnIngest(): (String, Double) = runVectorIngest("knn_ingest",
      graft.streaming.VectorStream.startKnnIngest(_, _, _))
    def runAnnIngest(): (String, Double) = runVectorIngest("ann_ingest",
      graft.streaming.VectorStream.startAnnIngest(_, _, _))
    // IVF-PQ index maintenance: codebooks are FROZEN model state fitted
    // offline, so they train BEFORE the timed window — the row prices the
    // append-only encode path (vs knn/ann's merge-entangled folds)
    def runPqIngest(): (String, Double) = {
      import graft.operators.ProductQuant
      val pcb = ProductQuant.trainCodebook(spark, sfDir)
      val ccb = ProductQuant.trainCodebook(spark, sfDir,
        1, ProductQuant.PqSubspaces * ProductQuant.PqSubDim, ProductQuant.IvfPqCells)
      runVectorIngest("pq_ingest",
        graft.streaming.VectorStream.startPqIngest(_, _, _, pcb, ccb))
    }

    // bloom bitmaps: the MERGE-FOLD ingest point (bit_or of catalog-sized
    // state per batch); layout bounds are frozen config, fetched pre-timer
    def runBloomIngest(): (String, Double) = {
      import org.apache.spark.sql.functions.{col, max, min}
      val orders = spark.read.parquet(s"$sfDir/orders.parquet")
        .select(col("o_orderkey"), col("o_custkey"))
      val (minK, maxK) = {
        val r = orders.agg(min(col("o_orderkey")), max(col("o_orderkey"))).head()
        (r.getLong(0), r.getLong(1))
      }
      runDropIngest("bloom_ingest", orders, "o_orderkey",
        graft.streaming.BloomStream.startBloomIngest(_, _, _, minK, maxK))
    }

    def runTermIngest(): (String, Double) = {
      import org.apache.spark.sql.functions.col
      val root = Files.createTempDirectory("graft-sbench-term-ingest")
      try {
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
          .select(col("doc_id"), col("text"))
        docs.write.parquet(s"$root/drop")
        val n = docs.count()
        val t0 = System.nanoTime()
        graft.streaming.DocumentStream.startTermIngest(
          graft.streaming.DocumentStream.readDocuments(spark, s"$root/drop", docs.schema),
          s"$root/stage", s"$root/ckpt")
          .awaitTermination()
        val sec = (System.nanoTime() - t0) / 1e9
        "term_ingest" -> (n / sec)
      } finally deleteTree(root)
    }

    def runStatsIngest(): (String, Double) = {
      val root = Files.createTempDirectory("graft-sbench-stats-ingest")
      try {
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        docs.write.parquet(s"$root/drop")
        val n = docs.count()
        val t0 = System.nanoTime()
        graft.streaming.DocumentStream.startStatsIngest(
          graft.streaming.DocumentStream.readDocuments(spark, s"$root/drop", docs.schema),
          s"$root/stage", s"$root/ckpt")
          .awaitTermination()
        val sec = (System.nanoTime() - t0) / 1e9
        "stats_ingest" -> (n / sec)
      } finally deleteTree(root)
    }

    def runDuelIngest(): (String, Double) = {
      val root = Files.createTempDirectory("graft-sbench-duel-ingest")
      try {
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        docs.write.parquet(s"$root/drop")
        val n = docs.count()
        val t0 = System.nanoTime()
        graft.streaming.DocumentStream.startDuelIngest(
          graft.streaming.DocumentStream.readDocuments(spark, s"$root/drop", docs.schema),
          s"$root/stage", s"$root/ckpt")
          .awaitTermination()
        val sec = (System.nanoTime() - t0) / 1e9
        "duel_ingest" -> (n / sec)
      } finally deleteTree(root)
    }

    // documents-side twins: a stateful running-budget aggregate (Complete,
    // spec-sized state) and the stateless fused-kernel chunker (Append) —
    // file streams need a DIRECTORY source, so the table file is exposed
    // via a symlink in a scratch drop dir (no data copy)
    def runDocs(name: String, build: DataFrame => DataFrame,
                mode: String): (String, Double) = {
      val docsBatch = spark.read.parquet(s"$sfDir/documents.parquet")
      val nDocs = docsBatch.count()
      val ckpt = Files.createTempDirectory(s"graft-sbench-$name")
      val drop = Files.createTempDirectory(s"graft-sbench-$name-drop")
      Files.createSymbolicLink(drop.resolve("documents.parquet"),
        java.nio.file.Paths.get(s"$sfDir/documents.parquet"))
      try {
        val t0 = System.nanoTime()
        val q = build(spark.readStream.schema(docsBatch.schema)
            .parquet(drop.toString))
          .writeStream.format("noop")
          .outputMode(mode)
          .option("checkpointLocation", ckpt.toString)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        val sec = (System.nanoTime() - t0) / 1e9
        name -> (nDocs / sec)
      } finally { deleteTree(ckpt); deleteTree(drop) }
    }

    val users = spark.read.parquet(s"$sfDir/customer.parquet")
    // batch-fitted thresholds for the stateless sampler twin (x48's rule)
    val thresholds = {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      spark.read.parquet(s"$sfDir/events.parquet")
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        .withColumn("n_min", min(col("n")).over(Window.partitionBy()))
        .select(col("event_type"),
          floor(sqrt(col("n_min").cast("double") / col("n")) *
            lit(graft.operators.Sampling.HashSpace)).cast("long").as("thresh"))
    }
    val results = Seq(
      run("fmgws_sessionize", ev => EventStream.sessionize(ev).toDF()),
      run("hourly_counts", EventStream.hourlyCounts),
      run("sliding_counts", EventStream.slidingCounts),
      run("session_window", ev => EventStream.sessionWindowCounts(ev)),
      run("dedup_stream", EventStream.dedupStream),
      run("stream_static_enrich", ev => EventStream.enrichWithUsers(ev, users)),
      // watermarked stream-stream interval self-join (bounded buffer state)
      run("click_purchase_stream",
        ev => EventStream.clickPurchaseAttribution(ev, ev)),
      // LEFT OUTER mode: null rows flush as the watermark closes windows
      run("click_purchase_outer",
        ev => EventStream.clickPurchaseOuter(ev, ev)),
      run("sampled_stream", ev => EventStream.sampledStream(ev, thresholds)),
      run("transitions_stream", ev => EventStream.transitions(ev).toDF()),
      // O(1)-state-per-key gap debounce (x258's stateful twin)
      run("debounce_stream", ev => EventStream.debounce(ev).toDF()),
      // last-wins CDC apply: keyed op feed derived from the event stream
      // (k = user, seq = event id, ~1/7 deletes), Update-mode state
      run("cdc_apply_stream", { ev =>
        import org.apache.spark.sql.functions.{col, round, when}
        import graft.operators.Relational.{CdcDeleteAt, CdcDeleteMod}
        EventStream.cdcApply(ev.select(
          col("user_id").as("k"), col("event_id").as("seq"),
          when(col("event_id") % CdcDeleteMod === CdcDeleteAt, "D")
            .otherwise("U").as("op"),
          round(col("value") * 100).cast("long").as("cents"),
          col("event_type").as("prio"))).toDF()
      }, "update"),
      run("tier_promotions_stream", ev => EventStream.tierPromotions(ev).toDF()),
      run("reorders_stream", ev => EventStream.reorders(ev).toDF()),
      run("conversions_stream", ev => EventStream.conversions(ev).toDF()),
      run("wau_stream", EventStream.weeklyActiveUsers, "complete"),
      // bounded O(event_types × 16) register state — the mergeable sketch
      run("hll_stream", EventStream.hllRegisters, "update"),
      run("ewma_stream", ev => EventStream.ewmaPopularity(ev).toDF()),
      run("last_touch_stream", { ev =>
        import org.apache.spark.sql.functions.{col, round}
        EventStream.lastTouch(ev.withColumn("value_cents",
          round(col("value") * 100).cast("long"))).toDF()
      }),
      // Update mode, chosen by measurement (r7 advice): Complete 3700 vs
      // Update 3785 rows/s at sf0.1 — within host noise, so the mode is
      // NOT the bottleneck (per-row tokenization + state-store machinery
      // is). Update is still the right continuous-run choice: it emits
      // only changed cells per trigger, where Complete rewrites the whole
      // result table — a cost that grows with result cardinality.
      runDocs("token_budget_stream",
        graft.streaming.DocumentStream.tokenBudgetStream, "update"),
      runDocs("bpe_chunk_stream",
        graft.streaming.DocumentStream.bpeChunkStream, "append"),
      // bounded O(depth×width) cell state — the sketch's memory story
      runDocs("countmin_stream",
        graft.streaming.DocumentStream.countMinStream, "update"),
      runIndexIngest(),
      runBandIngest(),
      runClusterIngest(),
      runTermIngest(),
      runStatsIngest(),
      runDuelIngest(),
      runKnnIngest(),
      runAnnIngest(),
      runPqIngest(),
      runBloomIngest())

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.1f" }.mkString("{", ",", "}")
    val headline = f"${results.head._2}%.1f"
    val summary =
      s"""{"metric":"streaming_rows_per_sec","value":$headline,"unit":"rows/sec","rows":$nEvents,"state_provider":"$provider","queries":$qs,"sf":"$sfDir"}"""
    println(summary)
    // truncation-proof on-disk artifact, the BENCH_LOCAL.json convention:
    // any byte-limited stdout capture (a tail window, a cut filter) can
    // lose the one long summary line, and a lost panel costs a 30-minute
    // solo re-run
    val localPath = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_RESULTS_DIR", "."),
      if (provider == "rocksdb") "STREAM_ROCKSDB.json" else "STREAM_LOCAL.json")
    try java.nio.file.Files.writeString(localPath, summary + "\n")
    catch { case e: Throwable =>
      System.err.println(s"WARN: could not persist $localPath: $e")
    }
    spark.stop()
  }
}
