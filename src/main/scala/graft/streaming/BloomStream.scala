package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Relational

/** Streaming maintenance of the x277 per-file Bloom bitmaps — the
  * MERGE-FOLD point of the ingest-cost spectrum the vector twins
  * bracket: kNN/ANN batches entangle with the whole corpus-so-far
  * (neighbor lists must re-rank), PQ codes append with no merge at all,
  * and Bloom bitmaps sit between — each batch's bitmaps `bit_or` into
  * the previous version, an O(files · words) fold of CATALOG-sized
  * state regardless of batch or corpus row counts. Same exactly-once
  * versioned-artifact protocol as the vector ingesters (per-batch
  * version dirs, marker last, one-version GC lag).
  *
  * File-assignment bounds are FROZEN layout parameters (a stream cannot
  * know the eventual key max; the layout declares its key space the way
  * any partitioning spec does) — [[Relational.bloomTagged]]. */
object BloomStream {

  /** Fold one (possibly replayed) batch of orders rows into the
    * versioned bitmap table. Replay-idempotent: the merge reads only the
    * PRE-batch version, a re-delivery short-circuits on the marker. */
  private[streaming] def applyBloomBatch(batch: DataFrame, stageRoot: String,
                                         minK: Long, maxK: Long,
                                         batchId: Long): Unit = {
    val spark = batch.sparkSession
    val prev = IngestCommit.lastApplied(spark, stageRoot)
    if (batchId <= prev) return // replay of a fully-applied batch
    val words = Relational.bloomWordsFrame(Relational.bloomTagged(
        batch.select(col("o_orderkey").as("k"), col("o_custkey").as("c")),
        minK, maxK))
      .localCheckpoint()
    if (words.count() == 0) return
    val merged =
      if (prev < 0) words
      else spark.read.parquet(s"$stageRoot/words/r$prev")
        .unionByName(words)
        .groupBy(col("f"), col("w"))
        .agg(expr("bit_or(word)").as("word"))
    merged.localCheckpoint()
      .write.mode("overwrite").parquet(s"$stageRoot/words/r$batchId")
    IngestCommit.markApplied(spark, stageRoot, batchId)
    IngestCommit.gcVersions(spark, s"$stageRoot/words", "r", prev)
  }

  /** The published bitmap table (f, w, word) — what a point-lookup
    * planner probes instead of the data. */
  def bloomWords(spark: SparkSession, stageRoot: String): DataFrame = {
    val last = IngestCommit.lastApplied(spark, stageRoot)
    require(last >= 0,
      s"no applied batches under stage root $stageRoot: the bloom bitmap " +
        "table does not exist yet (fresh stage root, or every batch was empty)")
    spark.read.parquet(s"$stageRoot/words/r$last")
  }

  def startBloomIngest(orders: DataFrame, stageRoot: String,
                       checkpointDir: String,
                       minK: Long, maxK: Long): StreamingQuery =
    orders.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        IngestCommit.ensureCampaign(batch.sparkSession, stageRoot,
          IngestCommit.campaignOf(batch.sparkSession, checkpointDir))
        applyBloomBatch(batch, stageRoot, minK, maxK, batchId)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
