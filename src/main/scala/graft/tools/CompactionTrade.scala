package graft.tools

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.IngestCommit

/** Measures the compaction trade ([[IngestCommit.compactStageRoot]]) on a
  * stats-shaped stage root: N one-row mergeable partials committed through
  * the delta protocol (the `StatsStage` ingester's exact shape after N
  * micro-batches), then the consumer fold timed BEFORE vs AFTER
  * compaction, with the visible file count each side. This is the
  * file-listing + footer-open cost x240's planner prices, measured on the
  * engine's own ingest layout rather than modeled.
  *
  * Prints one JSON line:
  * `{"metric":"compaction_trade","batches":N,"files_before":N,
  *   "files_after":k,"read_before_sec":…,"read_after_sec":…,
  *   "compact_sec":…,"speedup":…}`
  *
  * Usage: `runMain graft.tools.CompactionTrade [nBatches] [nFiles]`
  * (defaults 300 and 4). Each timing is min-of-3 — the fold itself is a
  * trivial one-row-per-file aggregate, so wall time is dominated by
  * exactly the per-file overhead compaction removes.
  */
object CompactionTrade {
  def main(args: Array[String]): Unit = {
    val nBatches = args.headOption.map(_.toInt).getOrElse(300)
    val nFiles = args.lift(1).map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-compaction-trade")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val root = Files.createTempDirectory("graft_ctrade_").toString
    val target = s"$root/col_stats"

    val tIngest0 = System.nanoTime()
    (0 until nBatches).foreach { i =>
      // one mergeable partial per batch, StatsStage.colStatsBatch's shape
      IngestCommit.commitDelta(
        Seq((5L, i * 10L, i * 10L + 4L, 5L, 100L, 900L, 2500L))
          .toDF("n_rows", "min_doc_id", "max_doc_id", "nn_chars",
            "min_chars", "max_chars", "sum_chars"),
        target, i.toLong)
      IngestCommit.markApplied(spark, root, i.toLong)
    }
    val ingestSec = (System.nanoTime() - tIngest0) / 1e9

    def fileCount(): Int = {
      val fs = new Path(target).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(new Path(target))
        .count(s => s.isFile && !s.getPath.getName.startsWith("_"))
    }
    def foldSec(): Double = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      val r = IngestCommit.readStage(spark, target)
        .agg(sum("n_rows"), min("min_doc_id"), max("max_doc_id"),
          sum("sum_chars")).collect()
      require(r.head.getLong(0) == 5L * nBatches, s"fold lost rows: ${r.head}")
      (System.nanoTime() - t0) / 1e9
    }.min

    val filesBefore = fileCount()
    val readBefore = foldSec()
    val tc0 = System.nanoTime()
    IngestCommit.compactStageRoot(spark, root, target, nFiles)
    IngestCommit.compactStageRoot(spark, root, target, nFiles) // deferred GC
    val compactSec = (System.nanoTime() - tc0) / 1e9
    val filesAfter = fileCount()
    val readAfter = foldSec()

    println(f"""{"metric":"compaction_trade","batches":$nBatches,""" +
      f""""ingest_sec":$ingestSec%.2f,"files_before":$filesBefore,""" +
      f""""files_after":$filesAfter,"read_before_sec":$readBefore%.3f,""" +
      f""""read_after_sec":$readAfter%.3f,"compact_sec":$compactSec%.2f,""" +
      f""""speedup":${readBefore / readAfter}%.1f}""")
    spark.stop()
  }
}
