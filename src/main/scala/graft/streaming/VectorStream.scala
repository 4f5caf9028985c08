package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.operators.{AnnStage, KnnStage, Similarity}

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
  * ingesters) AND under an at-least-once batch replay.
  *
  * Exactly-once-effective under foreachBatch's at-least-once replay,
  * via [[IngestCommit]]'s VERSIONED-ARTIFACT variant (one protocol
  * object shared with the delta-file ingesters — `lastApplied` /
  * `markApplied` / `gcVersions` on the `_applied/b<id>` ledger):
  * `foreachBatch` may re-deliver a batch after a crash, so every write
  * is VERSIONED per batchId and the merge reads only PRE-batch state —
  * a replayed batch either short-circuits (its marker exists: the
  * batch fully applied) or recomputes from the same immutable inputs
  * and overwrites its own per-batch dirs. Layout under `stageRoot`:
  *
  *  - `vecs/b<id>/`    — this batch's vectors (overwrite on replay;
  *                       the corpus-so-far is the union of b<id'> with
  *                       id' ≤ the published marker)
  *  - `ranked/r<id>/`  — the neighbor table AFTER batch <id>, computed
  *                       from `ranked/r<prev>` + pre-batch vec logs
  *                       (never from its own output — no double-count)
  *  - `_applied/b<id>` — the publish marker, created LAST; its absence
  *                       means the batch never fully applied and a
  *                       replay redoes it from the pre-state. Versions
  *                       older than the previous one are GC'd after
  *                       publish, so storage stays O(2 versions).
  */
object VectorStream {

  def readVectors(spark: SparkSession, path: String,
                  schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(path)

  private def fsOf(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val BatchDirRe = "^b(\\d+)$".r

  /** The applied (`b<id>`, id ≤ upTo) batch dirs under
    * `<stageRoot>/<sub>` — ONE parser for [[vecs]] and [[pqIndex]]. A
    * non-hidden entry outside the `b<digits>` naming (a backup/ dir, a
    * stray file) refuses LOUDLY by name instead of crashing with a bare
    * NumberFormatException mid-`toLong` (r15 advisory) — the same
    * unmanaged-entry contract as [[IngestCommit.readStage]]. */
  private def appliedBatchDirs(fs: FileSystem, stageRoot: String,
                               sub: String, upTo: Long): Seq[String] = {
    val entries = fs.listStatus(new Path(s"$stageRoot/$sub")).map(_.getPath)
      .filterNot { p =>
        val n = p.getName
        n.startsWith("_") || n.startsWith(".")
      }
    val unmanaged = entries.map(_.getName)
      .filterNot(n => BatchDirRe.matches(n))
    require(unmanaged.isEmpty,
      s"stage dir $stageRoot/$sub holds entries outside the b<id> batch " +
        s"naming (${unmanaged.take(3).mkString(", ")}…): not managed by " +
        "this ingester — reading through it would misclassify them")
    entries.collect {
      case p if BatchDirRe.findFirstMatchIn(p.getName)
        .exists(_.group(1).toLong <= upTo) => p.toString
    }.toIndexedSeq
  }

  /** The published corpus-so-far: vec logs of every applied batch. */
  private[streaming] def vecs(spark: SparkSession, stageRoot: String): DataFrame = {
    val fs = fsOf(spark, stageRoot)
    val upTo = IngestCommit.lastApplied(spark, stageRoot)
    spark.read.parquet(appliedBatchDirs(fs, stageRoot, "vecs", upTo): _*)
  }

  /** The published ranked neighbor table (the marker-named version).
    * Fails with an explicit error when NO batch has applied yet (fresh
    * stage root, or every batch was empty) instead of an opaque
    * path-not-found on `ranked/r-1`. Concurrency caveat: post-publish
    * GC keeps only the live version and its predecessor, so the default
    * LAZY DataFrame is safe across at most ONE further publish; a
    * consumer holding the handle while the ingester keeps advancing
    * (e.g. a fidelity audit over a live stage) should pass
    * `snapshot = true`, which materializes the version via
    * `localCheckpoint()` so the handle survives any number of GCs. */
  def ranked(spark: SparkSession, stageRoot: String,
             snapshot: Boolean = false): DataFrame = {
    val last = IngestCommit.lastApplied(spark, stageRoot)
    require(last >= 0,
      s"no applied batches under stage root $stageRoot: the ranked table " +
        "does not exist yet (fresh stage root, or every batch so far was empty)")
    val df = spark.read.parquet(s"$stageRoot/ranked/r$last")
    if (snapshot) df.localCheckpoint() else df
  }

  /** Fold one (possibly replayed) batch into the staged artifact —
    * idempotent: a second delivery of the same batchId is a no-op once
    * the marker exists, and a re-run after a mid-batch crash recomputes
    * from the unchanged pre-state. Exposed for the replay spec. */
  private[streaming] def applyBatch(batch: DataFrame, stageRoot: String,
                                    k: Int, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val prev = IngestCommit.lastApplied(spark, stageRoot)
    if (batchId <= prev) return // replay of a fully-applied batch
    val newEmb = batch
      .select(col("vec_id"), Similarity.asDouble(col("embedding")).as("v"))
      .localCheckpoint()
    if (newEmb.count() == 0) return
    // per-batch dirs: replays overwrite their own attempt, never the
    // pre-state the merge reads
    newEmb.write.mode("overwrite").parquet(s"$stageRoot/vecs/b$batchId")
    val merged =
      if (prev < 0) Similarity.computeRankedTopK(newEmb, k)
      else Similarity.mergeRanked(
        spark.read.parquet(s"$stageRoot/ranked/r$prev"),
        vecs(spark, stageRoot), newEmb, k)
    merged.localCheckpoint()
      .write.mode("overwrite").parquet(s"$stageRoot/ranked/r$batchId")
    // publish: marker creation is the commit point
    IngestCommit.markApplied(spark, stageRoot, batchId)
    // GC ranked versions older than the one a replay could still need
    IngestCommit.gcVersions(spark, s"$stageRoot/ranked", "r", prev)
  }

  def startKnnIngest(vectors: DataFrame, stageRoot: String,
                     checkpointDir: String,
                     k: Int = KnnStage.StageK): StreamingQuery =
    vectors.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // batchId restarts from 0 under a fresh checkpoint — bind the
        // stage to one lineage or fail loudly (IngestCommit's guard)
        IngestCommit.ensureCampaign(batch.sparkSession, stageRoot,
          IngestCommit.campaignOf(batch.sparkSession, checkpointDir))
        applyBatch(batch, stageRoot, k, batchId)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Fold one batch into the staged APPROXIMATE neighbor table — the
    * ANN-backed ingest path. Same protocol as [[applyBatch]]; the vec
    * log additionally persists each vector's hyperplane signature so
    * later batches probe-join against stored sigs instead of rehashing
    * the corpus. The merge is [[AnnStage.mergeApproxRanked]] —
    * candidates come from the signature-bucket equi-join, never an
    * O(corpus·Δ) cross. */
  private[streaming] def applyAnnBatch(batch: DataFrame, stageRoot: String,
                                       k: Int, radius: Int,
                                       batchId: Long): Unit = {
    val spark = batch.sparkSession
    val prev = IngestCommit.lastApplied(spark, stageRoot)
    if (batchId <= prev) return // replay of a fully-applied batch
    val signs = Similarity.hyperplaneSigns(Similarity.LshPlanes)
    val newEmb = batch
      .select(col("vec_id"), Similarity.asDouble(col("embedding")).as("v"))
      .withColumn("sig",
        graft.functions.HashSignatures.hyperplane_sig(col("v"), signs))
      .localCheckpoint()
    if (newEmb.count() == 0) return
    newEmb.write.mode("overwrite").parquet(s"$stageRoot/vecs/b$batchId")
    val merged =
      if (prev < 0)
        AnnStage.computeApproxRankedTopK(newEmb, k, Similarity.LshPlanes, radius)
      else AnnStage.mergeApproxRanked(
        spark.read.parquet(s"$stageRoot/ranked/r$prev"),
        vecs(spark, stageRoot), newEmb, k, Similarity.LshPlanes, radius)
    merged.localCheckpoint()
      .write.mode("overwrite").parquet(s"$stageRoot/ranked/r$batchId")
    IngestCommit.markApplied(spark, stageRoot, batchId)
    IngestCommit.gcVersions(spark, s"$stageRoot/ranked", "r", prev)
  }

  /** The ANN-backed streaming ingest — [[startKnnIngest]]'s 100 TB
    * form: each micro-batch probe-joins against the staged signature
    * buckets and merges only candidate lists, so per-batch scoring is
    * O(|batch| · corpus/2^planes · ball) instead of the exact twin's
    * O(corpus · |batch|). The stream-built table ≡ [[AnnStage]]'s
    * batch rebuild at the same radius (spec-proven across batch
    * boundaries and under replay), so its fidelity against the exact
    * stage is the SAME measured x221/x233 ledger — the stream inherits
    * the audit, not a new approximation. */
  def startAnnIngest(vectors: DataFrame, stageRoot: String,
                     checkpointDir: String,
                     k: Int = KnnStage.StageK,
                     radius: Int = AnnStage.AnnRadius): StreamingQuery =
    vectors.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        IngestCommit.ensureCampaign(batch.sparkSession, stageRoot,
          IngestCommit.campaignOf(batch.sparkSession, checkpointDir))
        applyAnnBatch(batch, stageRoot, k, radius, batchId)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Fold one (possibly replayed) batch into the staged IVF-PQ index
    * (x274's stored form). Encoding against FROZEN codebooks is
    * per-vector pure, so — unlike the kNN/ANN twins, whose neighbor
    * lists entangle every batch with the corpus-so-far — this ingest is
    * APPEND-ONLY: per-batch cost is O(|batch| · M·K) code assignments,
    * no merge against prior state, no version chain to GC. Same
    * exactly-once protocol: per-batch dir overwrite, marker last. */
  private[streaming] def applyPqBatch(batch: DataFrame, stageRoot: String,
                                      pcb: graft.operators.ProductQuant.Codebook,
                                      ccb: graft.operators.ProductQuant.Codebook,
                                      batchId: Long): Unit = {
    val spark = batch.sparkSession
    val prev = IngestCommit.lastApplied(spark, stageRoot)
    if (batchId <= prev) return // replay of a fully-applied batch
    val idx = graft.operators.ProductQuant
      .indexFrame(batch.select(col("vec_id"), col("embedding")), pcb, ccb)
      .localCheckpoint()
    if (idx.count() == 0) return
    idx.write.mode("overwrite").parquet(s"$stageRoot/codes/b$batchId")
    IngestCommit.markApplied(spark, stageRoot, batchId)
  }

  /** The published IVF-PQ index: (vec_id, cell, m, code) over every
    * applied batch — the table x274 queries. At 100 TB each batch dir is
    * written partitioned by cell and the stage root goes through the
    * compaction protocol like the other append-maintained roots. */
  def pqIndex(spark: SparkSession, stageRoot: String): DataFrame = {
    val fs = fsOf(spark, stageRoot)
    val upTo = IngestCommit.lastApplied(spark, stageRoot)
    require(upTo >= 0,
      s"no applied batches under stage root $stageRoot: the PQ index " +
        "does not exist yet (fresh stage root, or every batch so far was empty)")
    spark.read.parquet(appliedBatchDirs(fs, stageRoot, "codes", upTo): _*)
  }

  /** Streaming maintenance of the IVF-PQ index — the 100 TB ingest shape
    * for the PQ family: codebooks are FROZEN model state (retrained
    * offline like any model refresh; a retrain is a new stage root), so
    * arriving vectors just encode and append. */
  def startPqIngest(vectors: DataFrame, stageRoot: String,
                    checkpointDir: String,
                    pcb: graft.operators.ProductQuant.Codebook,
                    ccb: graft.operators.ProductQuant.Codebook): StreamingQuery =
    vectors.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        IngestCommit.ensureCampaign(batch.sparkSession, stageRoot,
          IngestCommit.campaignOf(batch.sparkSession, checkpointDir))
        applyPqBatch(batch, stageRoot, pcb, ccb, batchId)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
