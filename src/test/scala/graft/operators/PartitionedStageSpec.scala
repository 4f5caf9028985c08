package graft.operators

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** x261: the day-partitioned layout must actually PRUNE — the scan's
  * selected partitions are the probe day only — and read back exactly
  * what a direct filter on the raw table computes. */
class PartitionedStageSpec extends SparkSpec {
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  test("prunedScan selects exactly one of the day partitions") {
    val (scan, probeDay) = PartitionedStage.prunedScan(spark, sf)
    val scans = scan.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.nonEmpty, "expected a parquet file scan")
    scans.foreach { f =>
      assert(f.partitionFilters.nonEmpty,
        "the day literal must become a PartitionFilter, not a data filter")
      val parts = f.selectedPartitions
      assert(parts.partitionCount == 1,
        s"selected ${parts.partitionCount} partitions, want 1")
      parts.toPartitionArray.foreach { pf =>
        assert(pf.filePath.toString.contains(s"day=$probeDay"),
          pf.filePath.toString)
      }
    }
    // the layout genuinely has many day directories to prune away
    val root = PartitionedStage.layoutRoot(spark, sf)
    val nDays = new java.io.File(root).listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("day="))
    assert(nDays > 10, s"layout produced only $nDays day dirs")
  }

  test("retentionScan (x267) range-prunes to exactly the surviving day partitions") {
    val (scan, cutoff) = PartitionedStage.retentionScan(spark, sf)
    val raw = graft.Tables.events(spark, sf)
    val keptDays = raw.select(Sessionize.tsSeconds(raw).as("s"))
      .withColumn("day", expr("s div 86400"))
      .filter($"day" >= cutoff).select($"day").distinct().count()
    val scans = scan.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    scans.foreach { f =>
      assert(f.partitionFilters.nonEmpty, "cutoff must prune partitions")
      assert(f.selectedPartitions.partitionCount == keptDays,
        s"selected ${f.selectedPartitions.partitionCount}, want $keptDays")
    }
    // the sweep genuinely drops history at this window
    val allDays = raw.select(Sessionize.tsSeconds(raw).as("s"))
      .withColumn("day", expr("s div 86400")).select($"day").distinct().count()
    assert(keptDays < allDays && keptDays > 0)
  }

  test("retentionSweep panel equals the raw-table recompute") {
    val got = PartitionedStage.retentionSweep(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSet
    val raw = graft.Tables.events(spark, sf)
    val ev = raw.select($"event_type",
        Relational.cents($"value").as("value_cents"),
        Sessionize.tsSeconds(raw).as("ts_s"))
      .withColumn("day", expr("ts_s div 86400"))
    val maxDay = ev.agg(max($"day")).head().getLong(0)
    val cutoff = maxDay - PartitionedStage.RetentionDays + 1
    val nDays = ev.select($"day").distinct().count()
    val keptDays = ev.filter($"day" >= cutoff).select($"day").distinct().count()
    val want = ev.filter($"day" >= cutoff)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_kept"), sum($"value_cents").as("kept_value_cents"),
        min($"day").as("min_kept_day"))
      .select($"event_type", $"n_kept", $"kept_value_cents", $"min_kept_day",
        lit(cutoff).as("cutoff_day"), lit(nDays - keptDays).as("n_days_dropped"),
        lit(keptDays).as("n_days_kept"))
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(got == want && got.nonEmpty)
  }

  test("prunedRead equals the direct filter on the raw table") {
    val got = PartitionedStage.prunedRead(spark, sf)
      .as[(Long, String, Long, Long, Long)].collect().toSet
    val raw = graft.Tables.events(spark, sf)
    val ev = raw.select($"event_type", $"user_id",
        Relational.cents($"value").as("value_cents"),
        Sessionize.tsSeconds(raw).as("ts_s"))
      .withColumn("day", expr("ts_s div 86400"))
    val probeDay = ev.agg(min($"day")).head().getLong(0) +
      PartitionedStage.PruneDayOffset
    val want = ev.filter($"day" === probeDay)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_events"),
        sum($"value_cents").as("sum_value_cents"),
        countDistinct($"user_id").as("n_users"))
      .select(lit(probeDay).as("probe_day"), $"event_type", $"n_events",
        $"sum_value_cents", $"n_users")
      .as[(Long, String, Long, Long, Long)].collect().toSet
    assert(got == want && got.nonEmpty)
  }
}
