package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** The near-dup cluster assignment (x17's (doc_id, canonical_id) labeling)
  * as a PERSISTED table — the production contract for every report that
  * consumes clustering.
  *
  * Why this exists: seven queries consume the same cluster labeling
  * (x17 report, x38 debiased sampler, x57 deduped corpus, x69 ship
  * assembly, x70 best-keep, x90 dedup rates, x92 mirror pairs). At 100 TB
  * you never recompute a Jaccard join + connected components per report —
  * you cluster ONCE per corpus snapshot, write the labeling as a narrow
  * two-column table (~16 bytes/doc — thousands of times smaller than the
  * corpus), and every downstream job reads the table. This object is that
  * contract, following the paragraph-digest-index pattern
  * (`Dedup.writeParagraphIndex` / `incrementalIngestWithIndex`).
  *
  * `clusters(spark, dir)` is the staged-or-compute read the standalone
  * query entries use: the first call per (dir, n, threshold) in a JVM
  * computes the labeling and persists it to a session-scoped staging
  * directory; every later call reads the parquet. That is the local
  * analogue of the warehouse artifact — within one run (one Verify gate,
  * one Bench process) the CC family pays ONE clustering. The memo is
  * sound because a (dir, n, threshold) key names an IMMUTABLE corpus
  * snapshot — the same assumption a warehouse table partition makes. A
  * caller that mutates a corpus in place must call `invalidate()` (tests)
  * or write to a new snapshot path (production).
  *
  * Composability is unchanged: the `clusters`-consuming operators keep
  * their DataFrame-parameter overloads, so a pipeline can equally feed a
  * labeling it computed or loaded itself. Staged ≡ recomputed is asserted
  * in OperatorsSpec.
  */
object ClusterStage {

  /** Compute the cluster labeling for a (doc_id, text) corpus snapshot and
    * persist it at `path` (overwrite — the artifact is a pure function of
    * the snapshot and the two knobs). */
  def writeClusterTable(docs: DataFrame, path: String, n: Int = 5,
                        threshold: Double = 0.3): Unit =
    Dedup.nearDupClusters(docs, n, threshold)
      .write.mode("overwrite").parquet(path)

  /** Read a persisted cluster labeling. Column-pruned to the two-column
    * contract so downstream joins scan exactly (doc_id, canonical_id). */
  def readClusterTable(spark: SparkSession, path: String): DataFrame =
    graft.streaming.IngestCommit.readStage(spark, path)
      .select(col("doc_id"), col("canonical_id"))

  // Session-scoped staging root: created lazily on first stage, removed by
  // the OS tmp reaper. Artifacts are per-JVM by construction, so a stale
  // run can never leak into a fresh one.
  private lazy val stageRoot = Files.createTempDirectory("graft_cluster_stage_")

  private val stagedPaths =
    scala.collection.mutable.HashMap.empty[(String, Int, Double), String]

  /** Staged-or-compute cluster labeling for the corpus at `dir`: computes
    * and persists on first call per (dir, n, threshold), reads the staged
    * parquet afterwards. See the object Scaladoc for the immutability
    * contract that makes the memo sound. */
  def clusters(spark: SparkSession, dir: String, n: Int = 5,
               threshold: Double = 0.3): DataFrame = {
    val path = synchronized {
      stagedPaths.getOrElseUpdate((dir, n, threshold), {
        val p = stageRoot.resolve(
          s"clusters_${StagePaths.component(dir, n, threshold)}").toString
        writeClusterTable(Tables.documents(spark, dir), p, n, threshold)
        p
      })
    }
    readClusterTable(spark, path)
  }

  /** Append a batch's labels (doc_id, canonical_id — x98
    * `incrementalClusterIngest` output, or any labeling in the table's
    * schema) to a persisted cluster table. Staged to a sibling dir first
    * (the paragraph-index discipline) so table readers and the append
    * never overlap; append-only — snapshot labels are immutable, the
    * batch's labels are a new file set. With `Dedup.appendToBandIndex`
    * this closes the incremental-clustering loop: batch N's new-cluster
    * reps become existing canonicals for batch N+1. */
  def appendToClusterTable(spark: SparkSession, labels: DataFrame,
                           path: String): Unit = {
    val staged = path.stripSuffix("/") + "_delta_staging"
    labels.select(col("doc_id"), col("canonical_id"))
      .write.mode("overwrite").parquet(staged)
    spark.read.parquet(staged).write.mode("append").parquet(path)
    val p = new org.apache.hadoop.fs.Path(staged)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }

  /** Drop every memoized staging path (the artifacts stay on disk; the
    * next `clusters` call recomputes). For tests that mutate a corpus dir
    * in place — production writes a new snapshot path instead. */
  private[graft] def invalidate(): Unit = synchronized { stagedPaths.clear() }
}
