package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Table-maintenance intents from the reference docx that its code never
  * implemented (SURVEY.md §4: "upsert to Silver", "optimize and vacuum
  * periodically") — realized on plain parquet without a transaction log.
  */
object Maintenance {

  /** MERGE-like upsert as a join+union rewrite (no Delta MERGE available):
    * rows of `target` whose key matches an update are replaced, unmatched
    * update keys are inserted, everything else kept.
    *
    * Shape: one left-anti shuffle join on the key + a union — at 100 TB the
    * anti join's build side is only the update KEYS (projected + distinct),
    * which Catalyst broadcasts when small (the common upsert case). */
  def upsert(target: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    val updateKeys = updates.select(keys.map(col): _*).distinct()
    updates.unionByName(target.join(updateKeys, keys, "left_anti"))
  }

  /** OPTIMIZE analog: compact a table's many small files into `nFiles`
    * well-sized outputs (coalesce when shrinking — no shuffle; repartition
    * when rebalancing skewed inputs). */
  def compacted(df: DataFrame, nFiles: Int, rebalance: Boolean = false): DataFrame =
    if (rebalance) df.repartition(nFiles) else df.coalesce(nFiles)

  /** OPTIMIZE for the STREAMING ingest stage roots (the docx "optimize
    * and vacuum periodically" intent applied to the engine's own
    * unbounded-growth path): the delta-file ingesters
    * (`graft.streaming.DocumentStream`) append one
    * `batch<id>_*.parquet` file per micro-batch per target forever, so
    * after 10k batches every consumer read pays a 10k-file listing +
    * footer-open cost — the trade x240's planner prices. This folds
    * each target's COMMITTED deltas into `nFiles` compact files under
    * the `_compacted/c<id>` marker protocol
    * ([[graft.streaming.IngestCommit.compactStageRoot]]): crash-safe at
    * every point (the marker is the commit), safe under a CONCURRENT
    * ingester (only ledger-committed batches are folded; replays touch
    * only uncommitted ids), and GC'd one generation late so a reader's
    * lazy frame survives the commit. Consumers read through
    * `IngestCommit.readStage`, which resolves the live generation.
    *
    * `ledgerRoot` is the stage root carrying the `_applied/` ledger;
    * `targets` are its delta-file table dirs (e.g. the index root plus
    * `root/sigs`, `root/bands`, and the sibling results table — they
    * all share the ledger's batch numbering). Returns the live
    * compaction id per target. */
  def compactStageRoot(spark: org.apache.spark.sql.SparkSession,
                       ledgerRoot: String, targets: Seq[String],
                       nFiles: Int = 1): Seq[Long] =
    targets.map(t =>
      graft.streaming.IngestCommit.compactStageRoot(spark, ledgerRoot, t, nFiles))
}
