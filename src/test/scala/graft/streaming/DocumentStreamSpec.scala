package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Dedup

/** The persisted-index ingest driven by a file stream must classify
  * exactly like the batch operator, and the classify-then-append loop
  * must make each day's paragraphs "existing" for the next day. */
class DocumentStreamSpec extends SparkSpec {
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  test("streaming duel ingest across micro-batches ≡ batch x287 duels, " +
    "census fold, and BT refit — pairs split by the boundary included") {
    val root = Files.createTempDirectory("graft-duelstream").toString
    val docs = graft.Tables.documents(spark, sf)
    val cut = Dedup.IncrementalNewMinId
    // the cut splits challenger/rival pairs across micro-batches — the
    // staged-sides join must complete them
    docs.filter($"doc_id" < cut).write.parquet(s"$root/drop")
    docs.filter($"doc_id" >= cut).write.mode("append").parquet(s"$root/drop")
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$root/drop")
    DocumentStream.startDuelIngest(stream, s"$root/stage", s"$root/ckpt")
      .awaitTermination(120000)
    import graft.operators.Preference
    val streamedDuels = IngestCommit.readStage(spark, s"$root/stage/duels")
      .as[(String, String)].collect().toSeq.sorted
    val batchDuels = Preference.duels(spark, sf)
      .as[(String, String)].collect().toSeq.sorted
    assert(streamedDuels == batchDuels && streamedDuels.nonEmpty)
    val folded = Preference.foldedSourceDuels(
      IngestCommit.readStage(spark, s"$root/stage/win_matrix"))
      .as[(String, String, Long, Long, Long, Long)].collect().toSet
    val batchMatrix = Preference.sourceDuels(spark, sf)
      .as[(String, String, Long, Long, Long, Long)].collect().toSet
    assert(folded == batchMatrix)
    // a BT refit on the streamed duel log ≡ the batch fit
    val refit = Preference.btStrengths(
      IngestCommit.readStage(spark, s"$root/stage/duels"), Preference.BtIters)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    val batchFit = Preference.btStrengths(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(refit == batchFit)
  }

  test("streaming index ingest ≡ batch classification row-for-row; the loop feeds day 3") {
    val root = Files.createTempDirectory("graft-docstream").toString
    val indexPath = s"$root/index"
    val dropDir = s"$root/drop"
    val resultPath = s"$root/results"
    val docs = graft.Tables.documents(spark, sf)
    val day1 = docs.filter($"doc_id" < Dedup.IncrementalNewMinId)
    val day2 = docs.filter($"doc_id" >= Dedup.IncrementalNewMinId)

    // day-1 corpus → persisted digest index (the batch-side setup)
    Dedup.writeParagraphIndex(day1, indexPath)

    // batch reference FIRST (the stream's append mutates the index)
    val batchRef = Dedup.incrementalIngestWithIndex(spark, day2, indexPath)
      .as[(Long, Int, Int, Int, Int)].collect().toSet

    // day 2 arrives as files in the drop dir; one AvailableNow pass
    day2.write.parquet(dropDir)
    val schema = docs.schema
    DocumentStream.startIngest(
      DocumentStream.readDocuments(spark, dropDir, schema),
      indexPath, resultPath, s"$root/ckpt1")
      .awaitTermination(120000)
    val streamed = spark.read.parquet(resultPath)
      .as[(Long, Int, Int, Int, Int)].collect().toSet
    assert(streamed == batchRef && streamed.nonEmpty)
    assert(streamed.exists(_._3 > 0), "some day-2 paragraphs must be kept")

    // the loop property: day 3 replays day 2's text under new ids — the
    // stream's index append means EVERY day-3 paragraph is now existing
    val day3 = day2.withColumn("doc_id", $"doc_id" + 100000L)
    day3.write.mode("append").parquet(dropDir)
    DocumentStream.startIngest(
      DocumentStream.readDocuments(spark, dropDir, schema),
      indexPath, resultPath, s"$root/ckpt1") // same checkpoint: only NEW files process
      .awaitTermination(120000)
    val all = spark.read.parquet(resultPath)
      .as[(Long, Int, Int, Int, Int)].collect().toSet
    val day3Rows = all.filter(_._1 >= 100000L)
    assert(day3Rows.nonEmpty, "the resumed stream must process only the new files")
    assert(day3Rows.forall(r => r._3 == 0 && r._4 == r._2 && r._5 == 0),
      s"every day-3 paragraph must classify dup_of_existing: $day3Rows")
    // day-2 results are untouched by the second run (no re-processing)
    assert(all.filter(_._1 < 100000L) == streamed)
  }

  test("streaming band ingest ≡ batch x96 classification; the index append feeds the next batch") {
    val root = Files.createTempDirectory("graft-bandstream").toString
    val indexPath = s"$root/band_index"
    val dropDir = s"$root/drop"
    val resultPath = s"$root/results"
    val docs = graft.Tables.documents(spark, sf)
    val day1 = docs.filter($"doc_id" < Dedup.BandIngestNewMinId)
    val day2 = docs.filter($"doc_id" >= Dedup.BandIngestNewMinId)

    Dedup.writeBandIndex(day1, indexPath)
    // batch reference FIRST (the stream's append mutates the index)
    val batchRef = Dedup.ingestWithBandIndex(spark, day2, indexPath)
      .as[(Long, String, Long, Long, Long)].collect().toSet

    day2.write.parquet(dropDir)
    val schema = docs.schema
    DocumentStream.startBandIngest(
      DocumentStream.readDocuments(spark, dropDir, schema),
      indexPath, resultPath, s"$root/ckpt1")
      .awaitTermination(120000)
    val streamed = spark.read.parquet(resultPath)
      .as[(Long, String, Long, Long, Long)].collect().toSet
    assert(streamed == batchRef && streamed.nonEmpty)
    assert(streamed.exists(_._2 != "kept"), "fixture must classify some duplicates")

    // day 3 replays day-2 text under new ids: after the stream's index
    // append, every multi-shingle day-3 doc must be dup_of_existing
    val day3 = day2.withColumn("doc_id", $"doc_id" + 100000L)
    day3.write.mode("append").parquet(dropDir)
    DocumentStream.startBandIngest(
      DocumentStream.readDocuments(spark, dropDir, schema),
      indexPath, resultPath, s"$root/ckpt1") // same checkpoint: only NEW files
      .awaitTermination(120000)
    val all = spark.read.parquet(resultPath)
      .as[(Long, String, Long, Long, Long)].collect().toSet
    val day3Rows = all.filter(_._1 >= 100000L)
    assert(day3Rows.nonEmpty, "the resumed stream must process only the new files")
    assert(day3Rows.forall(r => r._2 == "dup_of_existing" && r._3 < 100000L),
      s"every day-3 doc must match its day-2 original: ${day3Rows.filter(_._2 != "dup_of_existing")}")
    assert(all.filter(_._1 < 100000L) == streamed)
  }

  test("streaming cluster ingest ≡ batch x98; new clusters become existing for the next batch") {
    val root = Files.createTempDirectory("graft-clusterstream").toString
    val bandPath = s"$root/band_index"
    val clustersPath = s"$root/clusters"
    val dropDir = s"$root/drop"
    val resultPath = s"$root/results"
    val docs = graft.Tables.documents(spark, sf)
    val day1 = docs.filter($"doc_id" < Dedup.BandIngestNewMinId)
    val day2 = docs.filter($"doc_id" >= Dedup.BandIngestNewMinId)

    graft.operators.Dedup.writeBandIndex(day1, bandPath)
    graft.operators.ClusterStage.writeClusterTable(day1, clustersPath)
    // batch reference FIRST (the stream's appends mutate both artifacts)
    val batchRef = Dedup.ingestClustersWithIndex(spark, day2, bandPath, clustersPath)
      .as[(Long, Long, String)].collect().toSet

    day2.write.parquet(dropDir)
    val schema = docs.schema
    DocumentStream.startClusterIngest(
      DocumentStream.readDocuments(spark, dropDir, schema),
      bandPath, clustersPath, resultPath, s"$root/ckpt1")
      .awaitTermination(120000)
    val streamed = spark.read.parquet(resultPath)
      .as[(Long, Long, String)].collect().toSet
    assert(streamed == batchRef && streamed.nonEmpty)
    // the cluster table now holds day-1 AND day-2 labels, duplicate-free
    val table = spark.read.parquet(clustersPath)
      .as[(Long, Long)].collect()
    assert(table.map(_._1).distinct.length == table.length)
    assert(table.length == day1.count() + day2.count())

    // day 3 replays day-2 text under new ids: every labeled day-2 doc's
    // replay must now JOIN AN EXISTING cluster — including clusters that
    // were new_cluster or singleton yesterday (the continuous handoff)
    val day3 = day2.withColumn("doc_id", $"doc_id" + 100000L)
    day3.write.mode("append").parquet(dropDir)
    DocumentStream.startClusterIngest(
      DocumentStream.readDocuments(spark, dropDir, schema),
      bandPath, clustersPath, resultPath, s"$root/ckpt1") // same ckpt: only NEW files
      .awaitTermination(120000)
    val all = spark.read.parquet(resultPath)
      .as[(Long, Long, String)].collect().toSet
    val day3Rows = all.filter(_._1 >= 100000L)
    assert(day3Rows.nonEmpty)
    // day-2 docs whose text bands at all (have >= 1 shingle) are indexed
    // now; their replicas must resolve to an existing canonical <= day-2 ids
    day3Rows.foreach { case (id, canon, status) =>
      assert(status == "joins_existing" && canon < 100000L,
        s"replayed doc $id must join yesterday's cluster, got ($canon, $status)")
    }
    assert(all.filter(_._1 < 100000L) == streamed)
  }

  test("cluster ingest under the RocksDB provider conf ≡ batch x98 (r14 verdict task 6)") {
    // cluster ingest is foreachBatch: its cross-batch state is the
    // exactly-once artifact ledger (band index + cluster table), not a
    // state store, so the RocksDB swap is a structural no-op — this run
    // proves that claim END TO END (identical labels with the provider
    // conf set), rather than leaving it asserted in prose. The twin
    // whose state genuinely lives in the store (cdcApply) gets the real
    // swap test in EventStreamSpec.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val root = Files.createTempDirectory("graft-clusterrocks").toString
      val docs = graft.Tables.documents(spark, sf)
      val day1 = docs.filter($"doc_id" < Dedup.BandIngestNewMinId)
      val day2 = docs.filter($"doc_id" >= Dedup.BandIngestNewMinId)
      graft.operators.Dedup.writeBandIndex(day1, s"$root/band_index")
      graft.operators.ClusterStage.writeClusterTable(day1, s"$root/clusters")
      val batchRef = Dedup.ingestClustersWithIndex(
        spark, day2, s"$root/band_index", s"$root/clusters")
        .as[(Long, Long, String)].collect().toSet
      day2.write.parquet(s"$root/drop")
      assert(DocumentStream.startClusterIngest(
        DocumentStream.readDocuments(spark, s"$root/drop", docs.schema),
        s"$root/band_index", s"$root/clusters", s"$root/results", s"$root/ckpt")
        .awaitTermination(120000),
        "stream did not drain in time — the results dir would be partial")
      val streamed = spark.read.parquet(s"$root/results")
        .as[(Long, Long, String)].collect().toSet
      assert(streamed == batchRef && streamed.nonEmpty)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }

  test("tokenBudgetStream (Complete) over micro-batched files ≡ batch x61 report") {
    val root = Files.createTempDirectory("graft-tbstream").toString
    val docs = graft.Tables.documents(spark, sf)
    // two file drops so the aggregate crosses micro-batch boundaries
    docs.filter($"doc_id" % 2 === 0).write.parquet(s"$root/drop")
    docs.filter($"doc_id" % 2 === 1).write.mode("append").parquet(s"$root/drop")
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$root/drop")
    val q = DocumentStream.tokenBudgetStream(stream)
      .writeStream.format("memory").queryName("tb_stream")
      .outputMode("complete")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("tb_stream")
      .as[(String, String, Long, Long, Long)].collect().toSet
    val batch = graft.operators.Sampling.tokenBudget(spark, sf)
      .as[(String, String, Long, Long, Long)].collect().toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("countMinStream (Update) over micro-batched files ≡ batch cells ≡ x41's staged fold") {
    val root = Files.createTempDirectory("graft-cmstream").toString
    val docs = graft.Tables.documents(spark, sf)
    // two file drops so cell counts must merge across micro-batches
    docs.filter($"doc_id" % 2 === 0).write.parquet(s"$root/drop")
    docs.filter($"doc_id" % 2 === 1).write.mode("append").parquet(s"$root/drop")
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$root/drop")
    val q = DocumentStream.countMinStream(stream)
      .writeStream.format("memory").queryName("cm_stream")
      .outputMode("complete")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("cm_stream")
      .as[(Int, Long, Long)].collect().toSet
    val batch = graft.operators.TextAnalysis.countMinCells(docs)
      .as[(Int, Long, Long)].collect().toSet
    assert(streamed == batch && streamed.nonEmpty)
    // and both equal the tf-weighted fold of the staged term rollup —
    // the construction x41's counter table actually uses
    import org.apache.spark.sql.functions._
    val staged = graft.operators.TermStage.termStats(spark, sf)
      .select(col("tf"), explode(array((0 until graft.operators.TextAnalysis.CmDepth).map(r =>
        struct(lit(r).as("r"),
          graft.operators.TextAnalysis.cmBucket(col("term"), r,
            graft.operators.TextAnalysis.CmWidth).as("b"))): _*)).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
      .agg(sum(col("tf")).as("cnt"))
      .as[(Int, Long, Long)].collect().toSet
    assert(streamed == staged)
    // the state-bound story: cells never exceed depth × width
    assert(streamed.size <= graft.operators.TextAnalysis.CmDepth *
      graft.operators.TextAnalysis.CmWidth)
  }

  test("bpeChunkStream (Append, stateless) ≡ batch x76 chunks row-for-row") {
    val root = Files.createTempDirectory("graft-chunkstream").toString
    val docs = graft.Tables.documents(spark, sf)
    docs.write.parquet(s"$root/drop")
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$root/drop")
    val q = DocumentStream.bpeChunkStream(stream)
      .writeStream.format("memory").queryName("chunk_stream")
      .outputMode("append")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("chunk_stream")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    val batch = graft.operators.TextAnalysis.bpeChunkDocuments(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("streaming stats ingest across micro-batches ≡ one-shot StatsStage fold") {
    val root = Files.createTempDirectory("graft-statsstream").toString
    val docs = graft.Tables.documents(spark, sf)
    val cut = Dedup.IncrementalNewMinId
    docs.filter($"doc_id" < cut).write.parquet(s"$root/drop")
    docs.filter($"doc_id" >= cut).write.mode("append").parquet(s"$root/drop")
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$root/drop")
    DocumentStream.startStatsIngest(stream, s"$root/stage", s"$root/ckpt")
      .awaitTermination(120000)
    graft.operators.StatsStage.writeStatsTables(docs, s"$root/oneshot")
    def cs(p: String) = graft.operators.StatsStage.foldedColStats(spark, p)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().head
    def lc(p: String) = graft.operators.StatsStage.foldedLangCounts(spark, p)
      .as[(String, Long)].collect().toMap
    def vc(p: String) = graft.operators.StatsStage.foldedValueCounts(spark, p)
      .as[(Long, Long)].collect().toMap
    assert(cs(s"$root/stage") == cs(s"$root/oneshot"))
    assert(lc(s"$root/stage") == lc(s"$root/oneshot") && lc(s"$root/stage").nonEmpty)
    assert(vc(s"$root/stage") == vc(s"$root/oneshot") && vc(s"$root/stage").nonEmpty)
    assert(cs(s"$root/stage")._1 == docs.count())
  }

  test("streaming term ingest across micro-batches ≡ one-shot TermStage tables") {
    val root = Files.createTempDirectory("graft-termstream").toString
    val docs = graft.Tables.documents(spark, sf).select($"doc_id", $"text")
    // two files → two micro-batches: the append path must merge exactly
    val cut = Dedup.IncrementalNewMinId
    docs.filter($"doc_id" < cut).write.parquet(s"$root/drop")
    docs.filter($"doc_id" >= cut).write.mode("append").parquet(s"$root/drop")
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$root/drop")
    DocumentStream.startTermIngest(stream, s"$root/stage", s"$root/ckpt")
      .awaitTermination(120000)
    // one-shot reference
    graft.operators.TermStage.writeTermTables(docs, s"$root/oneshot")
    def dtf(p: String) = spark.read.parquet(p)
      .as[(Long, String, Long)].collect()
      .map { case (d, t, f) => (d, t) -> f }.toMap
    assert(dtf(s"$root/stage/doc_tf") == dtf(s"$root/oneshot/doc_tf"))
    // term_stats merges through the reader fold (mergeable partials)
    def ts(p: String) = spark.read.parquet(p)
      .groupBy($"term").agg(sum($"tf").as("tf"), sum($"df").as("df"))
      .as[(String, Long, Long)].collect()
      .map { case (t, f, d) => t -> (f, d) }.toMap
    assert(ts(s"$root/stage/term_stats") == ts(s"$root/oneshot/term_stats"))
    def dl(p: String) = spark.read.parquet(p)
      .as[(Long, Long)].collect().toMap
    assert(dl(s"$root/stage/doc_lengths") == dl(s"$root/oneshot/doc_lengths"))
    assert(dtf(s"$root/stage/doc_tf").nonEmpty)
  }
}
