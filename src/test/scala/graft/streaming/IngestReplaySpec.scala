package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{ClusterStage, Dedup, TermStage}

/** foreachBatch delivers at-least-once: every ingester's batch body must
  * be idempotent under (a) a post-publish re-delivery (checkpoint commit
  * lost after the batch fully applied) and (b) a crashed attempt that
  * left a partial commit behind (results landed, index didn't). Each
  * test drives the batch appliers directly through both failure modes
  * and asserts the final artifacts equal a straight-through run — the
  * [[IngestCommit]] protocol's contract, across all four
  * document-stream ingesters (the vector ingester's twin spec lives in
  * VectorStreamSpec). */
class IngestReplaySpec extends SparkSpec {
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  private def docs = graft.Tables.documents(spark, sf)

  /** Two ingest halves on top of a day-1 index seed. */
  private def splits: (DataFrame, DataFrame, DataFrame) = {
    val cut = Dedup.IncrementalNewMinId
    val day2 = docs.filter($"doc_id" >= cut)
    (docs.filter($"doc_id" < cut),
      day2.filter($"doc_id" % 2 === 0), day2.filter($"doc_id" % 2 === 1))
  }

  test("paragraph-index ingest: crashed attempt + re-delivery ≡ straight-through run") {
    val (day1, h1, h2) = splits
    def run(root: String, chaos: Boolean): (Set[(Long, Int, Int, Int, Int)], Set[String]) = {
      Dedup.writeParagraphIndex(day1, s"$root/index")
      DocumentStream.applyIngestBatch(h1, s"$root/index", s"$root/results",
        Dedup.ParagraphBoundaryMod, 0L)
      if (chaos) {
        // crashed attempt of batch 1: results committed, index + marker not
        IngestCommit.commitDelta(
          Dedup.incrementalIngestWithIndex(spark, h2, s"$root/index"),
          s"$root/results", 1L)
      }
      DocumentStream.applyIngestBatch(h2, s"$root/index", s"$root/results",
        Dedup.ParagraphBoundaryMod, 1L)
      if (chaos) {
        // post-publish re-deliveries
        DocumentStream.applyIngestBatch(h2, s"$root/index", s"$root/results",
          Dedup.ParagraphBoundaryMod, 1L)
        DocumentStream.applyIngestBatch(h1, s"$root/index", s"$root/results",
          Dedup.ParagraphBoundaryMod, 0L)
      }
      (spark.read.parquet(s"$root/results")
        .as[(Long, Int, Int, Int, Int)].collect().toSet,
        spark.read.parquet(s"$root/index").select($"fp".cast("string"))
          .as[String].collect().toSet)
    }
    val clean = run(Files.createTempDirectory("graft-replay-par-a").toString, chaos = false)
    val chaotic = run(Files.createTempDirectory("graft-replay-par-b").toString, chaos = true)
    assert(chaotic == clean && clean._1.nonEmpty)
    // and the results hold each doc exactly once (no replay double-count)
    assert(chaotic._1.toSeq.map(_._1).distinct.length == chaotic._1.size)
  }

  test("duel ingest: crashed attempt + re-delivery ≡ straight-through run") {
    import graft.operators.Preference
    val (day1, h1, h2) = splits
    def run(root: String, chaos: Boolean): (Seq[(String, String)],
      Set[(String, String, Long, Long, Long, Long)]) = {
      DocumentStream.applyDuelBatch(day1, s"$root/stage", 0L)
      DocumentStream.applyDuelBatch(h1, s"$root/stage", 1L)
      if (chaos) {
        // crashed attempt of batch 2: duel rows + challengers committed,
        // win matrix + rivals + marker not
        val b = h2.localCheckpoint()
        val newC = Preference.challengerFrame(b).localCheckpoint()
        val oldR = IngestCommit.readStage(spark, s"$root/stage/rivals")
        IngestCommit.commitDelta(
          Preference.duelsFromFrames(newC, oldR), s"$root/stage/duels", 2L)
        IngestCommit.commitDelta(newC, s"$root/stage/challengers", 2L)
      }
      DocumentStream.applyDuelBatch(h2, s"$root/stage", 2L)
      if (chaos) { // post-publish re-deliveries
        DocumentStream.applyDuelBatch(h2, s"$root/stage", 2L)
        DocumentStream.applyDuelBatch(h1, s"$root/stage", 1L)
      }
      (IngestCommit.readStage(spark, s"$root/stage/duels")
        .as[(String, String)].collect().toSeq.sorted,
        Preference.foldedSourceDuels(
          IngestCommit.readStage(spark, s"$root/stage/win_matrix"))
          .as[(String, String, Long, Long, Long, Long)].collect().toSet)
    }
    val clean = run(Files.createTempDirectory("graft-replay-duel-a").toString, chaos = false)
    val chaotic = run(Files.createTempDirectory("graft-replay-duel-b").toString, chaos = true)
    assert(chaotic == clean && clean._1.nonEmpty)
  }

  test("band-index ingest: crashed attempt + re-delivery ≡ straight-through run") {
    val (day1, h1, h2) = splits
    def run(root: String, chaos: Boolean): (Set[(Long, String, Long, Long, Long)], Long, Long) = {
      Dedup.writeBandIndex(day1, s"$root/index")
      DocumentStream.applyBandBatch(h1, s"$root/index", s"$root/results", 0L)
      if (chaos) {
        // crashed attempt of batch 1: results + sigs committed, bands + marker not
        val b = h2.localCheckpoint()
        IngestCommit.commitDelta(
          Dedup.ingestWithBandIndex(spark, b, s"$root/index"), s"$root/results", 1L)
        IngestCommit.commitDelta(
          Dedup.bandFrames(b, Dedup.BandShingleN, Dedup.BandMinhashK, Dedup.BandBands)._1,
          s"$root/index/sigs", 1L)
      }
      DocumentStream.applyBandBatch(h2, s"$root/index", s"$root/results", 1L)
      if (chaos) {
        DocumentStream.applyBandBatch(h2, s"$root/index", s"$root/results", 1L)
        DocumentStream.applyBandBatch(h1, s"$root/index", s"$root/results", 0L)
      }
      (spark.read.parquet(s"$root/results")
        .as[(Long, String, Long, Long, Long)].collect().toSet,
        spark.read.parquet(s"$root/index/sigs").count(),
        spark.read.parquet(s"$root/index/bands").count())
    }
    val clean = run(Files.createTempDirectory("graft-replay-band-a").toString, chaos = false)
    val chaotic = run(Files.createTempDirectory("graft-replay-band-b").toString, chaos = true)
    assert(chaotic == clean && clean._1.nonEmpty)
  }

  test("band ingest: a crash after ANY commit-step prefix replays to the exact state") {
    val (day1, h1, h2) = splits
    def state(root: String) =
      (spark.read.parquet(s"$root/results")
        .as[(Long, String, Long, Long, Long)].collect().toSet,
        spark.read.parquet(s"$root/index/sigs").count(),
        spark.read.parquet(s"$root/index/bands").count())
    // clean reference once
    val ref = {
      val root = Files.createTempDirectory("graft-crash-ref").toString
      Dedup.writeBandIndex(day1, s"$root/index")
      DocumentStream.applyBandBatch(h1, s"$root/index", s"$root/results", 0L)
      DocumentStream.applyBandBatch(h2, s"$root/index", s"$root/results", 1L)
      state(root)
    }
    // the batch body has 4 mutation steps (results, sigs, bands, marker);
    // simulate a crash after each proper prefix and replay
    for (crashAfter <- 0 to 3) {
      val root = Files.createTempDirectory(s"graft-crash-$crashAfter").toString
      Dedup.writeBandIndex(day1, s"$root/index")
      DocumentStream.applyBandBatch(h1, s"$root/index", s"$root/results", 0L)
      val b = h2.localCheckpoint()
      val steps: Seq[() => Unit] = Seq(
        () => IngestCommit.commitDelta(
          Dedup.ingestWithBandIndex(spark, b, s"$root/index"), s"$root/results", 1L),
        () => IngestCommit.commitDelta(
          Dedup.bandFrames(b, Dedup.BandShingleN, Dedup.BandMinhashK, Dedup.BandBands)._1, s"$root/index/sigs", 1L),
        () => IngestCommit.commitDelta(
          Dedup.bandFrames(b, Dedup.BandShingleN, Dedup.BandMinhashK, Dedup.BandBands)._2, s"$root/index/bands", 1L))
      steps.take(crashAfter).foreach(_())
      DocumentStream.applyBandBatch(h2, s"$root/index", s"$root/results", 1L)
      assert(state(root) == ref, s"crash point $crashAfter")
    }
  }

  test("cluster ingest: crashed attempt + re-delivery ≡ straight-through run") {
    val (day1, h1, h2) = splits
    def run(root: String, chaos: Boolean): (Set[(Long, Long, String)], Set[(Long, Long)]) = {
      Dedup.writeBandIndex(day1, s"$root/index")
      ClusterStage.writeClusterTable(day1, s"$root/clusters")
      DocumentStream.applyClusterBatch(h1, s"$root/index", s"$root/clusters",
        s"$root/results", 0L)
      if (chaos) {
        // crashed attempt: labels landed in results AND the cluster table,
        // band index + marker didn't
        val labels = Dedup.ingestClustersWithIndex(
          spark, h2, s"$root/index", s"$root/clusters").localCheckpoint()
        IngestCommit.commitDelta(labels, s"$root/results", 1L)
        IngestCommit.commitDelta(labels.select($"doc_id", $"canonical_id"),
          s"$root/clusters", 1L)
      }
      DocumentStream.applyClusterBatch(h2, s"$root/index", s"$root/clusters",
        s"$root/results", 1L)
      if (chaos) {
        DocumentStream.applyClusterBatch(h2, s"$root/index", s"$root/clusters",
          s"$root/results", 1L)
        DocumentStream.applyClusterBatch(h1, s"$root/index", s"$root/clusters",
          s"$root/results", 0L)
      }
      (spark.read.parquet(s"$root/results").as[(Long, Long, String)].collect().toSet,
        spark.read.parquet(s"$root/clusters").as[(Long, Long)].collect().toSet)
    }
    val clean = run(Files.createTempDirectory("graft-replay-clu-a").toString, chaos = false)
    val chaotic = run(Files.createTempDirectory("graft-replay-clu-b").toString, chaos = true)
    assert(chaotic == clean && clean._1.nonEmpty)
    // the cluster table labels each doc exactly once — the invariant a
    // replayed append used to break
    assert(chaotic._2.toSeq.map(_._1).distinct.length == chaotic._2.size)
  }

  test("stats-table ingest: crashed attempt + re-delivery ≡ straight-through run") {
    val (_, h1, h2) = splits
    def run(root: String, chaos: Boolean): ((Long, Long, Long, Long, Long, Long, Long), Map[String, Long]) = {
      DocumentStream.applyStatsBatch(h1, s"$root/stage", 0L)
      if (chaos) {
        // crashed attempt: col_stats committed, lang_counts + marker not
        IngestCommit.commitDelta(
          graft.operators.StatsStage.colStatsBatch(h2), s"$root/stage/col_stats", 1L)
      }
      DocumentStream.applyStatsBatch(h2, s"$root/stage", 1L)
      if (chaos) {
        DocumentStream.applyStatsBatch(h2, s"$root/stage", 1L)
        DocumentStream.applyStatsBatch(h1, s"$root/stage", 0L)
      }
      (graft.operators.StatsStage.foldedColStats(spark, s"$root/stage")
        .as[(Long, Long, Long, Long, Long, Long, Long)].collect().head,
        graft.operators.StatsStage.foldedLangCounts(spark, s"$root/stage")
          .as[(String, Long)].collect().toMap)
    }
    val clean = run(Files.createTempDirectory("graft-replay-stats-a").toString, chaos = false)
    val chaotic = run(Files.createTempDirectory("graft-replay-stats-b").toString, chaos = true)
    assert(chaotic == clean && clean._2.nonEmpty)
  }

  test("a fresh checkpoint against an ingested stage root fails loudly (no silent batch drop)") {
    // the ledger keys on batchId, which a new checkpoint restarts from 0 —
    // without the campaign guard the stale markers would silently swallow
    // every new batch; with it the second query errors out explicitly
    val root = Files.createTempDirectory("graft-campaign").toString
    val docs = graft.Tables.documents(spark, sf).select($"doc_id", $"text")
    docs.write.parquet(s"$root/drop")
    DocumentStream.startTermIngest(
      spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$root/drop"),
      s"$root/stage", s"$root/ckpt1").awaitTermination(120000)
    val before = spark.read.parquet(s"$root/stage/doc_tf").count()
    assert(before > 0)
    val q2 = DocumentStream.startTermIngest(
      spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$root/drop"),
      s"$root/stage", s"$root/ckpt2") // DIFFERENT checkpoint, same stage
    def guardTripped(q: org.apache.spark.sql.streaming.StreamingQuery): Boolean =
      try { q.awaitTermination(120000); false }
      catch { case e: Throwable =>
        e.toString.contains("different streaming checkpoint") ||
          Option(e.getCause).exists(_.toString.contains("different streaming checkpoint"))
      }
    assert(guardTripped(q2), "the mismatched-campaign query must terminate with the guard error")
    // and the stage is untouched by the failed campaign
    assert(spark.read.parquet(s"$root/stage/doc_tf").count() == before)
    // the harder case: the ORIGINAL checkpoint path, CLEARED — the
    // campaign id derives from the checkpoint's lineage (its metadata
    // query id, regenerated on clear), not the path, so "delete the
    // checkpoint and reprocess" also fails loudly instead of silently
    // swallowing every renumbered batch
    def deleteTree(p: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      if (java.nio.file.Files.exists(p)) {
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
      }
    }
    deleteTree(java.nio.file.Paths.get(s"$root/ckpt1"))
    val q3 = DocumentStream.startTermIngest(
      spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$root/drop"),
      s"$root/stage", s"$root/ckpt1") // SAME path, fresh lineage
    assert(guardTripped(q3), "a cleared checkpoint must also trip the guard")
    assert(spark.read.parquet(s"$root/stage/doc_tf").count() == before)
  }

  test("term-table ingest: crashed attempt + re-delivery ≡ straight-through run") {
    val (_, h1, h2) = splits
    def run(root: String, chaos: Boolean): (Map[(Long, String), Long], Map[String, (Long, Long)], Map[Long, Long]) = {
      DocumentStream.applyTermBatch(h1.select($"doc_id", $"text"), s"$root/stage", 0L)
      if (chaos) {
        // crashed attempt: doc_tf committed, the two rollups + marker not
        IngestCommit.commitDelta(
          TermStage.docTermBatch(h2.select($"doc_id", $"text")),
          s"$root/stage/doc_tf", 1L)
      }
      DocumentStream.applyTermBatch(h2.select($"doc_id", $"text"), s"$root/stage", 1L)
      if (chaos) {
        DocumentStream.applyTermBatch(h2.select($"doc_id", $"text"), s"$root/stage", 1L)
        DocumentStream.applyTermBatch(h1.select($"doc_id", $"text"), s"$root/stage", 0L)
      }
      (spark.read.parquet(s"$root/stage/doc_tf")
        .as[(Long, String, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap,
        spark.read.parquet(s"$root/stage/term_stats")
          .groupBy($"term").agg(sum($"tf").as("tf"), sum($"df").as("df"))
          .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap,
        spark.read.parquet(s"$root/stage/doc_lengths")
          .as[(Long, Long)].collect().toMap)
    }
    val clean = run(Files.createTempDirectory("graft-replay-term-a").toString, chaos = false)
    val chaotic = run(Files.createTempDirectory("graft-replay-term-b").toString, chaos = true)
    assert(chaotic == clean && clean._1.nonEmpty)
  }
}
