package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Hive-style partition pruning on a REAL partitioned layout (x261):
  * the events fact is staged once per snapshot as a `day=<epoch-day>`
  * directory tree (the layout every date-partitioned lake table uses;
  * the reference's silver sink partitions by store_nbr the same way —
  * notebooks/silver_processing.py.py:78), and the gate query reads ONE
  * pinned day back through the ordinary parquet source with a literal
  * partition filter. Catalyst turns that into `PartitionFilters` on the
  * scan, so only the probe day's directory is ever listed or opened —
  * the spec asserts exactly that on the physical plan (1 of ~30
  * partition dirs selected, every scanned file under `day=<probe>`).
  * x250 proves the BUCKET-pruned flavor of this; x261 proves the
  * directory-partition flavor, which is the one that carries 100 TB
  * fact tables (time-partitioned ingest + per-day reads ⇒ each daily
  * job touches 1/Nth of the data regardless of total history).
  *
  * The probe day is `min(day) + PruneDayOffset` — computed by a tiny
  * scalar aggregate first, then baked into the filter as a LITERAL
  * (the "resolve yesterday, then prune statically" pattern a daily
  * incremental job uses; a correlated subquery would prune too, but
  * only at runtime via dynamic pruning).
  *
  * 100 TB shape: the staged write is one shuffle by day (≤ one file
  * per (task, day)); the read scans O(1 day) of data — the point.
  */
object PartitionedStage {

  /** Probe day = min event day + this offset (shared with the oracle). */
  val PruneDayOffset: Long = 3L

  private lazy val stageRoot = Files.createTempDirectory("graft_part_stage_")

  private val staged = scala.collection.mutable.HashMap.empty[String, String]

  private def canonical(spark: SparkSession, dir: String): DataFrame = {
    val raw = Tables.events(spark, dir)
    raw.select(col("event_id"), col("user_id"), col("event_type"),
      Relational.cents(col("value")).as("value_cents"),
      Sessionize.tsSeconds(raw).as("ts_s"))
      .withColumn("day", expr("ts_s div 86400")).drop("ts_s")
  }

  /** Write the day-partitioned layout once per snapshot dir; return its
    * root. `repartition(day)` first so each day lands in at most one
    * file per task — O(days) directories, not O(tasks × days) files.
    *
    * Compaction exemption: an overwrite snapshot, not an append ledger —
    * the `repartition(col("day"))` hash-routes every row of a day to ONE
    * task, so each `day=<d>` directory holds exactly one data file and
    * the whole root lists O(days) files forever. The day-partition reads
    * (x261/x267) prune to O(1)–O(window) of those directories, so there
    * is no growing listing for `IngestCommit.compactStageRoot` to bound
    * (invariant spec-asserted in StageLayoutSpec). */
  private[graft] def layoutRoot(spark: SparkSession, dir: String): String =
    synchronized {
      staged.getOrElseUpdate(dir, {
        val root = stageRoot.resolve(
          s"day_${StagePaths.component(dir)}").toString
        canonical(spark, dir)
          .repartition(col("day"))
          .write.mode("overwrite").partitionBy("day").parquet(root)
        root
      })
    }

  private val dayMemo = scala.collection.mutable.HashMap.empty[String, Seq[Long]]

  /** The distinct-day inventory — ONE scalar-sized scan per snapshot
    * (memoized; ≤ O(days) rows collected), from which every consumer
    * derives its min/max/count/cutoff without re-scanning the fact
    * (review finding r14: the per-call scalar aggs were each a full
    * corpus pass). */
  private def dayInventory(spark: SparkSession, dir: String): Seq[Long] =
    synchronized {
      dayMemo.getOrElseUpdate(dir, {
        import spark.implicits._
        canonical(spark, dir).select(col("day")).distinct()
          .as[Long].collect().sorted.toSeq
      })
    }

  /** The pruned scan itself, exposed for the spec's plan assertions. */
  private[graft] def prunedScan(spark: SparkSession, dir: String)
      : (DataFrame, Long) = {
    val root = layoutRoot(spark, dir)
    val probeDay = dayInventory(spark, dir).min + PruneDayOffset
    (spark.read.parquet(root).filter(col("day") === probeDay), probeDay)
  }

  /** The x261 gate query: the probe day's per-type panel, read through
    * the partition-pruned scan. */
  def prunedRead(spark: SparkSession, dir: String): DataFrame = {
    val (scan, probeDay) = prunedScan(spark, dir)
    scan.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value_cents")).as("sum_value_cents"),
        countDistinct(col("user_id")).as("n_users"))
      .withColumn("probe_day", lit(probeDay))
      .select(col("probe_day"), col("event_type"), col("n_events"),
        col("sum_value_cents"), col("n_users"))
  }

  /** Retention window in days for [[retentionSweep]] (x267): events in
    * day partitions older than `max(day) − RetentionDays + 1` are
    * swept. 14 over the synthetic 30-day span ⇒ roughly half the
    * history drops at every scale factor. */
  val RetentionDays: Long = 14L

  /** TTL retention sweep (x267), executed THE 100 TB WAY: on the
    * day-partitioned layout, retention is dropping whole `day=<d>`
    * directories — a metadata delete, never a rewrite of surviving
    * rows — and the keep-side read is a RANGE partition filter
    * (`day ≥ cutoff`), so the scan lists only surviving partitions
    * (plan-asserted in the spec, x261's discipline). The published
    * panel is what a retention job logs: per event type the kept
    * rows/value mass plus the sweep's global shape (days dropped vs
    * kept) — and the drop LIST is derivable as the day dirs below the
    * cutoff. The oracle recomputes the same panel from the raw table
    * with the same max−window cutoff rule.
    *
    * 100 TB shape: one scalar agg for the cutoff, one pruned scan of
    * the surviving O(RetentionDays) partitions; the sweep itself is
    * O(dropped dirs) filesystem metadata. */
  def retentionSweep(spark: SparkSession, dir: String,
                     retentionDays: Long = RetentionDays): DataFrame = {
    val root = layoutRoot(spark, dir)
    val days = dayInventory(spark, dir)
    val cutoff = days.max - retentionDays + 1
    val (nDays, keptDays) = (days.size.toLong, days.count(_ >= cutoff).toLong)
    spark.read.parquet(root).filter(col("day") >= cutoff)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_kept"),
        sum(col("value_cents")).as("kept_value_cents"),
        // the partition column type-infers as INT; pin the panel to BIGINT
        min(col("day")).cast("long").as("min_kept_day"))
      .withColumn("cutoff_day", lit(cutoff))
      .withColumn("n_days_dropped", lit(nDays - keptDays))
      .withColumn("n_days_kept", lit(keptDays))
      .select(col("event_type"), col("n_kept"), col("kept_value_cents"),
        col("min_kept_day"), col("cutoff_day"), col("n_days_dropped"),
        col("n_days_kept"))
  }

  /** The keep-side pruned scan alone (spec plan assertions). */
  private[graft] def retentionScan(spark: SparkSession, dir: String,
                                   retentionDays: Long = RetentionDays)
      : (DataFrame, Long) = {
    val root = layoutRoot(spark, dir)
    val cutoff = dayInventory(spark, dir).max - retentionDays + 1
    (spark.read.parquet(root).filter(col("day") >= cutoff), cutoff)
  }

  /** Drop the memoized layouts (tests only). */
  private[graft] def invalidate(): Unit =
    synchronized { staged.clear(); dayMemo.clear() }
}
