package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession

/** Exactly-once-effective commit protocol for the foreachBatch
  * ingesters ([[DocumentStream]]'s index/results appends —
  * [[VectorStream]] carries its own versioned variant). foreachBatch
  * delivers at-least-once: a batch can re-run after a crash at ANY
  * point, so a plain `mode("append")` double-appends its rows (the
  * round-10 advisory's failure mode on the kNN ingester, shared by
  * every append-based ingester). The protocol here keeps the existing
  * flat-directory table layouts (batch operators and streaming
  * consumers read the same plain parquet dirs) and makes the batch
  * idempotent as a whole:
  *
  *  - every delta lands as files named `batch<id>_<i>.parquet` inside
  *    the target dir — DETERMINISTIC names, written via a staging dir
  *    and per-file rename (never a live append of anonymous parts);
  *  - a replayed batch first deletes its own `batch<id>_*` leftovers
  *    from every target ([[cleanAttempt]]), so classification re-reads
  *    the true PRE-batch state and the re-commit lands clean;
  *  - the `_applied/b<id>` marker (hidden from parquet reads by the
  *    underscore convention) is created LAST — its presence means the
  *    batch fully applied and a re-delivery is a no-op.
  */
private[streaming] object IngestCommit {

  private def fsOf(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** True when `batchId`'s marker exists under `$ledgerRoot/_applied`. */
  def alreadyApplied(spark: SparkSession, ledgerRoot: String, batchId: Long): Boolean =
    fsOf(spark, ledgerRoot)
      .exists(new Path(s"$ledgerRoot/_applied/b$batchId"))

  /** Create `batchId`'s marker — the commit point, call LAST. */
  def markApplied(spark: SparkSession, ledgerRoot: String, batchId: Long): Unit = {
    val fs = fsOf(spark, ledgerRoot)
    fs.mkdirs(new Path(s"$ledgerRoot/_applied"))
    fs.create(new Path(s"$ledgerRoot/_applied/b$batchId"), true).close()
  }

  /** Remove a crashed attempt's `batch<id>_*` files from every target
    * dir, so the pre-batch state is restored before re-classification
    * and re-commit. */
  def cleanAttempt(spark: SparkSession, targets: Seq[String], batchId: Long): Unit =
    targets.foreach { t =>
      val fs = fsOf(spark, t)
      val dir = new Path(t)
      if (fs.exists(dir))
        fs.listStatus(dir).map(_.getPath)
          .filter(_.getName.startsWith(s"batch${batchId}_"))
          .foreach(p => fs.delete(p, true))
    }

  /** Commit one delta frame into `target` as deterministically-named
    * files: write to a sibling staging dir (the existing
    * readers-never-see-a-half-written-append discipline), rename each
    * part file to `batch<id>_<i>.parquet`, drop the staging dir. */
  def commitDelta(df: DataFrame, target: String, batchId: Long): Unit = {
    val spark = df.sparkSession
    val fs = fsOf(spark, target)
    val staging = s"${target.stripSuffix("/")}_b${batchId}_staging"
    df.write.mode("overwrite").parquet(staging)
    fs.mkdirs(new Path(target))
    fs.listStatus(new Path(staging)).map(_.getPath)
      .filter(_.getName.startsWith("part-"))
      .zipWithIndex.foreach { case (p, i) =>
        fs.rename(p, new Path(target, s"batch${batchId}_$i.parquet"))
      }
    fs.delete(new Path(staging), true)
  }
}
