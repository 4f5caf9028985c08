package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.operators.{KnnStage, Similarity}

/** Streaming ingest of an embedding stream into the persisted exact-kNN
  * artifact — [[graft.operators.KnnStage]]'s streaming twin and x203's
  * continuous form: each micro-batch of new vectors is folded into the
  * ranked neighbor table by the incremental merge rule
  * ([[Similarity.mergeRanked]] — existing lists re-rank against only
  * (old top-k ∪ batch scores), batch queries scan the corpus once), so
  * per-batch cost is O(|corpus|·|batch|) scoring plus an O(N·k)
  * artifact rewrite, never the O(N²) rebuild. This is how a production
  * vector store actually ingests; the spec proves the stream-built
  * table ≡ the from-scratch full ranking across a forced micro-batch
  * boundary (the ingest-twin contract of the band/term/cluster
  * ingesters).
  *
  * Artifact layout under `stageRoot`: `vecs/` (append-only vector log,
  * the corpus-so-far) and `ranked/` (the current neighbor table,
  * REWRITTEN per batch — lists mutate; the new table is materialized
  * via localCheckpoint BEFORE the overwrite so the read never races
  * its own replacement).
  */
object VectorStream {

  def readVectors(spark: SparkSession, path: String,
                  schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(path)

  def startKnnIngest(vectors: DataFrame, stageRoot: String,
                     checkpointDir: String,
                     k: Int = KnnStage.StageK): StreamingQuery =
    vectors.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val newEmb = batch
          .select(col("vec_id"), Similarity.asDouble(col("embedding")).as("v"))
          .localCheckpoint()
        if (newEmb.count() > 0) {
          val vecsPath = s"$stageRoot/vecs"
          val rankedPath = s"$stageRoot/ranked"
          val fs = new Path(stageRoot)
            .getFileSystem(spark.sparkContext.hadoopConfiguration)
          val merged =
            if (!fs.exists(new Path(rankedPath))) {
              Similarity.computeRankedTopK(newEmb, k)
            } else {
              Similarity.mergeRanked(
                spark.read.parquet(rankedPath),
                spark.read.parquet(vecsPath), newEmb, k)
            }
          // materialize BEFORE overwriting the table it was derived from
          val snapped = merged.localCheckpoint()
          snapped.write.mode("overwrite").parquet(rankedPath)
          newEmb.write.mode("append").parquet(vecsPath)
        }
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
