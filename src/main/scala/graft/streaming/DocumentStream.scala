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
  def startIngest(docs: DataFrame, indexPath: String, resultPath: String,
                  checkpointDir: String,
                  boundaryMod: Int = Dedup.ParagraphBoundaryMod): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        Dedup.incrementalIngestWithIndex(spark, batch, indexPath, boundaryMod)
          .write.mode("append").parquet(resultPath)
        Dedup.appendToParagraphIndex(spark, batch, indexPath, boundaryMod)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
