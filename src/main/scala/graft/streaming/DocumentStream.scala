package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.operators.Dedup

/** Streaming twin of the persisted-index ingest — x44's production loop
  * end-to-end (see `Dedup.incrementalIngestWithIndex` /
  * `Dedup.appendToParagraphIndex`): day-N document batches arrive as
  * parquet files in a drop directory; each micro-batch is classified
  * against yesterday's paragraph-digest index (kept / dup_of_existing /
  * dup_in_batch), the per-document classification lands in a results
  * table, and the index is extended with the batch's genuinely new
  * digests — so the NEXT batch sees this one's paragraphs as existing.
  *
  * `foreachBatch` is the right streaming primitive here, not a stateful
  * operator: the dedup state (the digest index) must OUTLIVE the query
  * and be shared with batch jobs, so it lives in the persisted parquet
  * index rather than the state store, and each micro-batch runs the
  * exact SAME classification the batch operator runs (spec-proven
  * row-for-row equal). Cost per batch is O(batch) + O(index) — the
  * constant-time-daily-ingest property, now driven by a stream. */
object DocumentStream {

  /** Streaming scan of a documents drop directory (file streams require
    * a declared schema — pass the table's batch schema). */
  def readDocuments(spark: SparkSession, dropDir: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(dropDir)

  /** Start the ingest loop: classify-then-append per micro-batch, in
    * that order — classification must see the PRE-batch index, or every
    * paragraph would classify dup_of_existing against itself. Both steps
    * run inside one `foreachBatch` invocation, so a batch is never half
    * applied across restarts (the results append and index append are
    * idempotent per batch via the anti-join). */
  /** Streaming twin of x61's token-budget report: the running
    * (source × split) docs/tokens/chars mixture totals as document
    * batches land — the live budget dashboard a training-data pipeline
    * watches during a crawl ingest. The operator IS the batch
    * transformation (`Sampling.tokenBudget`'s DataFrame form applied to
    * a streaming source): an unwatermarked streaming aggregate whose
    * state is one row per (source × split) cell — spec-sized, the one
    * kind of streaming state that never needs eviction. Emit with
    * `outputMode(Complete)`; after an AvailableNow pass the sink holds
    * exactly the batch report (spec-proven). */
  def tokenBudgetStream(docs: DataFrame): DataFrame =
    graft.operators.Sampling.tokenBudget(docs)

  /** Streaming twin of x76's BPE-token-budget chunking: the fused
    * `TokenChunkStats` kernel is a stateless per-row projection, so it
    * runs unchanged over a file stream in Append mode — chunks flow out
    * as documents flow in, zero state, zero shuffle (the streaming shape
    * of the "never costs more than the scan" argument). */
  def bpeChunkStream(docs: DataFrame): DataFrame =
    graft.operators.TextAnalysis.bpeChunkDocuments(docs,
      graft.operators.TextAnalysis.BpeChunkBudget,
      graft.operators.TextAnalysis.PinnedBpeMerges)

  /** Streaming count-min sketch (x41's twin): the counter cells as a
    * live streaming aggregate over the raw token stream — tokens
    * explode into their depth (row, bucket) cells, the unwatermarked
    * groupBy keeps ONE row per cell, so total state is ≤ depth×width
    * counters no matter how much stream has flowed (the sketch's
    * bounded-memory property IS the streaming-state story; contrast
    * the exact vocabulary aggregate, whose state grows with distinct
    * tokens). Update mode emits only touched cells per trigger; after
    * an AvailableNow pass the cells equal the batch construction
    * (spec-proven, including against the TermStage-folded x41
    * counters). */
  def countMinStream(docs: DataFrame): DataFrame =
    graft.operators.TextAnalysis.countMinCells(docs)

  /** Streaming near-dup ingest against the persisted BAND index (x96's
    * streaming twin, `startIngest`'s shape at document granularity):
    * each micro-batch classifies against the index-as-of-now
    * (dup_of_existing / dup_in_batch / kept), appends the classification
    * to `resultPath`, then appends its own signatures+bands to the index
    * — so every batch's documents are "existing" for the next batch. The
    * foreachBatch body is exactly the batch operator
    * (`Dedup.ingestWithBandIndex` + `appendToBandIndex`), so batch ≡
    * stream is by construction and spec-proven across a forced
    * micro-batch boundary. */
  /** One (possibly replayed) band-ingest batch — idempotent via the
    * [[IngestCommit]] protocol (marker skip, leftover clean, committed
    * deltas); the ledger lives under the index root. Exposed for the
    * replay spec. */
  private[streaming] def applyBandBatch(batch: DataFrame, indexPath: String,
                                        resultPath: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    if (IngestCommit.alreadyApplied(spark, indexPath, batchId)) return
    IngestCommit.cleanAttempt(spark,
      Seq(resultPath, s"$indexPath/sigs", s"$indexPath/bands"), batchId)
    val b = batch.localCheckpoint()
    // ONE fused tokenize+shingle pass per batch: the signature frame is
    // materialized and the band table derives FROM the materialization
    // (knobs are Dedup's shared Band* constants — the batch path and
    // this applier cannot drift)
    val sigsC = Dedup.sigFrame(b, Dedup.BandShingleN).localCheckpoint()
    val bandedC = Dedup.bandedFromSigs(sigsC,
      Dedup.BandMinhashK, Dedup.BandBands).localCheckpoint()
    IngestCommit.commitDelta(
      Dedup.ingestWithBandFrames(spark, b, sigsC, bandedC, indexPath),
      resultPath, batchId)
    IngestCommit.commitDelta(sigsC, s"$indexPath/sigs", batchId)
    IngestCommit.commitDelta(bandedC, s"$indexPath/bands", batchId)
    IngestCommit.markApplied(spark, indexPath, batchId)
  }

  def startBandIngest(docs: DataFrame, indexPath: String, resultPath: String,
                      checkpointDir: String): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        IngestCommit.ensureCampaign(batch.sparkSession, indexPath,
          IngestCommit.campaignOf(batch.sparkSession, checkpointDir))
        applyBandBatch(batch, indexPath, resultPath, batchId)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Streaming incremental CLUSTERING (x98's twin): each micro-batch
    * labels its documents against the cluster-table-and-band-index as of
    * now (joins_existing / new_cluster / singleton), appends the labels
    * to the results AND to the cluster table, then appends its bands to
    * the index — so batch N's new-cluster reps are existing canonicals
    * for batch N+1. The foreachBatch body is exactly the batch operators
    * (`Dedup.ingestClustersWithIndex` + `ClusterStage
    * .appendToClusterTable` + `Dedup.appendToBandIndex`), so batch ≡
    * stream by construction; the continuous-clustering handoff is
    * spec-proven at a forced micro-batch boundary. */
  /** One (possibly replayed) cluster-ingest batch — the
    * [[IngestCommit]] protocol across all three mutated artifacts
    * (results, cluster table, band index); ledger under the band-index
    * root. Exposed for the replay spec. */
  private[streaming] def applyClusterBatch(batch: DataFrame, bandIndexPath: String,
                                           clusterTablePath: String,
                                           resultPath: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    if (IngestCommit.alreadyApplied(spark, bandIndexPath, batchId)) return
    IngestCommit.cleanAttempt(spark,
      Seq(resultPath, clusterTablePath,
        s"$bandIndexPath/sigs", s"$bandIndexPath/bands"), batchId)
    val b = batch.localCheckpoint()
    // one fused tokenize+shingle pass (the applyBandBatch discipline)
    val sigsC = Dedup.sigFrame(b, Dedup.BandShingleN).localCheckpoint()
    val bandedC = Dedup.bandedFromSigs(sigsC,
      Dedup.BandMinhashK, Dedup.BandBands).localCheckpoint()
    val labels = Dedup.ingestClustersWithFrames(
      spark, b, sigsC, bandedC, bandIndexPath, clusterTablePath)
      .localCheckpoint() // one computation feeds results AND the table
    IngestCommit.commitDelta(labels, resultPath, batchId)
    IngestCommit.commitDelta(
      labels.select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("canonical_id")),
      clusterTablePath, batchId)
    IngestCommit.commitDelta(sigsC, s"$bandIndexPath/sigs", batchId)
    IngestCommit.commitDelta(bandedC, s"$bandIndexPath/bands", batchId)
    IngestCommit.markApplied(spark, bandIndexPath, batchId)
  }

  def startClusterIngest(docs: DataFrame, bandIndexPath: String,
                         clusterTablePath: String, resultPath: String,
                         checkpointDir: String): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        IngestCommit.ensureCampaign(batch.sparkSession, bandIndexPath,
          IngestCommit.campaignOf(batch.sparkSession, checkpointDir))
        applyClusterBatch(batch, bandIndexPath, clusterTablePath, resultPath, batchId)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** One (possibly replayed) paragraph-index ingest batch — the
    * [[IngestCommit]] protocol; the digest index is a flat parquet dir,
    * so its ledger lives inside it as `_applied/` (underscore-hidden
    * from parquet reads). Exposed for the replay spec. */
  private[streaming] def applyIngestBatch(batch: DataFrame, indexPath: String,
                                          resultPath: String, boundaryMod: Int,
                                          batchId: Long): Unit = {
    val spark = batch.sparkSession
    if (IngestCommit.alreadyApplied(spark, indexPath, batchId)) return
    IngestCommit.cleanAttempt(spark, Seq(resultPath, indexPath), batchId)
    val b = batch.localCheckpoint() // classification AND the index delta
    IngestCommit.commitDelta(
      Dedup.incrementalIngestWithIndex(spark, b, indexPath, boundaryMod),
      resultPath, batchId)
    // the index delta: the batch's genuinely-new digests (the
    // appendToParagraphIndex anti-join, against the pre-batch index)
    import org.apache.spark.sql.functions.col
    IngestCommit.commitDelta(
      Dedup.cdcParagraphs(b, boundaryMod).select(col("fp")).distinct()
        .join(IngestCommit.readStage(spark, indexPath), Seq("fp"), "left_anti"),
      indexPath, batchId)
    IngestCommit.markApplied(spark, indexPath, batchId)
  }

  def startIngest(docs: DataFrame, indexPath: String, resultPath: String,
                  checkpointDir: String,
                  boundaryMod: Int = Dedup.ParagraphBoundaryMod): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        IngestCommit.ensureCampaign(batch.sparkSession, indexPath,
          IngestCommit.campaignOf(batch.sparkSession, checkpointDir))
        applyIngestBatch(batch, indexPath, resultPath, boundaryMod, batchId)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Streaming term-table ingest ([[graft.operators.TermStage]]'s
    * streaming twin, the fourth incremental-artifact ingester): each
    * micro-batch appends its (doc_id, term, tf) rows, its term-stats
    * PARTIALS, and its doc lengths to the persisted stage — the
    * mergeable-partials design means the append is exact with NO read
    * of the existing tables (contrast the band/cluster ingesters,
    * which must classify against the index-as-of-now). Stream-built ≡
    * one-shot is spec-proven across a forced micro-batch boundary. */
  /** One (possibly replayed) stats-table ingest batch — table-statistics
    * maintenance at ingest ([[graft.operators.StatsStage]]): mergeable
    * partials, no read of the existing tables, replay-safe via
    * [[IngestCommit]]. Exposed for the replay spec. */
  private[streaming] def applyStatsBatch(batch: DataFrame, stageRoot: String,
                                         batchId: Long): Unit = {
    val spark = batch.sparkSession
    if (IngestCommit.alreadyApplied(spark, stageRoot, batchId)) return
    IngestCommit.cleanAttempt(spark,
      Seq(s"$stageRoot/col_stats", s"$stageRoot/lang_counts",
        s"$stageRoot/value_counts"), batchId)
    val b = batch.localCheckpoint() // feeds all three partials
    IngestCommit.commitDelta(
      graft.operators.StatsStage.colStatsBatch(b), s"$stageRoot/col_stats", batchId)
    IngestCommit.commitDelta(
      graft.operators.StatsStage.langCountsBatch(b), s"$stageRoot/lang_counts", batchId)
    IngestCommit.commitDelta(
      graft.operators.StatsStage.valueCountsBatch(b), s"$stageRoot/value_counts", batchId)
    IngestCommit.markApplied(spark, stageRoot, batchId)
  }

  /** Streaming table-statistics maintenance (the 25th twin): per batch,
    * append the mergeable column-stats and language-histogram partials —
    * the catalog upkeep a warehouse runs at ingest so the x222/x223
    * planner family reads current stats without ever rescanning the
    * corpus. Folded ≡ one-shot is spec-proven across forced micro-batch
    * boundaries and under replay. */
  def startStatsIngest(docs: DataFrame, stageRoot: String,
                       checkpointDir: String): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        IngestCommit.ensureCampaign(batch.sparkSession, stageRoot,
          IngestCommit.campaignOf(batch.sparkSession, checkpointDir))
        applyStatsBatch(batch, stageRoot, batchId)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** One (possibly replayed) term-table ingest batch — the mergeable
    * partials still never read the existing tables; [[IngestCommit]]
    * only makes the three appends replay-safe. Exposed for the replay
    * spec. */
  private[streaming] def applyTermBatch(batch: DataFrame, stageRoot: String,
                                        batchId: Long): Unit = {
    import org.apache.spark.sql.functions.{col, count, lit, sum}
    val spark = batch.sparkSession
    if (IngestCommit.alreadyApplied(spark, stageRoot, batchId)) return
    IngestCommit.cleanAttempt(spark,
      Seq(s"$stageRoot/doc_tf", s"$stageRoot/term_stats", s"$stageRoot/doc_lengths"),
      batchId)
    val dtf = graft.operators.TermStage.docTermBatch(batch).localCheckpoint()
    IngestCommit.commitDelta(dtf, s"$stageRoot/doc_tf", batchId)
    IngestCommit.commitDelta(dtf.groupBy(col("term"))
      .agg(sum(col("tf")).as("tf"), count(lit(1)).as("df")),
      s"$stageRoot/term_stats", batchId)
    IngestCommit.commitDelta(dtf.groupBy(col("doc_id")).agg(sum(col("tf")).as("n_tokens")),
      s"$stageRoot/doc_lengths", batchId)
    IngestCommit.markApplied(spark, stageRoot, batchId)
  }

  def startTermIngest(docs: DataFrame, stageRoot: String,
                      checkpointDir: String): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        IngestCommit.ensureCampaign(batch.sparkSession, stageRoot,
          IngestCommit.campaignOf(batch.sparkSession, checkpointDir))
        applyTermBatch(batch, stageRoot, batchId)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** One (possibly replayed) duel-ingest batch (x287's twin). A duel
    * joins TWO documents, so a batch boundary can split a pair — the
    * apply step stages both duel sides and emits exactly the duels the
    * batch completes: new challengers ⋈ staged rivals, staged
    * challengers ⋈ new rivals, and new ⋈ new. Because new/staged
    * partition each side, every (challenger, rival) pair is emitted by
    * exactly ONE batch — streamed duels ≡ the batch operator over the
    * union of all batches, by construction (and spec-proven across a
    * forced boundary and under replay). Alongside the duel rows it
    * appends the mergeable win-matrix census partial
    * ([[graft.operators.Preference.duelCensusBatch]]); consumers fold
    * with [[graft.operators.Preference.foldedSourceDuels]] — x287's
    * published matrix without ever rescanning the corpus, and the input
    * a periodic BT refit (x288's batch fit on the folded matrix) reads.
    * First batch needs no seeding writer: the staged sides read through
    * [[IngestCommit.readStageOr]] as typed empty frames. */
  private[streaming] def applyDuelBatch(batch: DataFrame, stageRoot: String,
                                        batchId: Long): Unit = {
    import graft.operators.Preference
    val spark = batch.sparkSession
    if (IngestCommit.alreadyApplied(spark, stageRoot, batchId)) return
    IngestCommit.cleanAttempt(spark,
      Seq(s"$stageRoot/challengers", s"$stageRoot/rivals",
        s"$stageRoot/duels", s"$stageRoot/win_matrix"), batchId)
    val b = batch.localCheckpoint()
    // one md5 pass per side, shared by the three incremental joins
    val newC = Preference.challengerFrame(b).localCheckpoint()
    val newR = Preference.rivalFrame(b).localCheckpoint()
    val oldC = IngestCommit.readStageOr(spark, s"$stageRoot/challengers", newC)
    val oldR = IngestCommit.readStageOr(spark, s"$stageRoot/rivals", newR)
    val duels = Preference.duelsFromFrames(newC, oldR)
      .unionAll(Preference.duelsFromFrames(oldC, newR))
      .unionAll(Preference.duelsFromFrames(newC, newR))
      .localCheckpoint() // feeds the duel log AND the census partial
    IngestCommit.commitDelta(duels, s"$stageRoot/duels", batchId)
    IngestCommit.commitDelta(Preference.duelCensusBatch(duels),
      s"$stageRoot/win_matrix", batchId)
    IngestCommit.commitDelta(newC, s"$stageRoot/challengers", batchId)
    IngestCommit.commitDelta(newR, s"$stageRoot/rivals", batchId)
    IngestCommit.markApplied(spark, stageRoot, batchId)
  }

  /** Streaming preference-duel ingest (the 32nd twin — x287's): each
    * micro-batch completes the duels it can against the staged sides,
    * appends duel rows + the mergeable win-matrix partial, then stages
    * its own documents for later batches. */
  def startDuelIngest(docs: DataFrame, stageRoot: String,
                      checkpointDir: String): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        IngestCommit.ensureCampaign(batch.sparkSession, stageRoot,
          IngestCommit.campaignOf(batch.sparkSession, checkpointDir))
        applyDuelBatch(batch, stageRoot, batchId)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
