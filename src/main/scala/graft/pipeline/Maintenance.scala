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

  /** MERGE audit panel (the x244 gate): [[upsert]] exercised on the
    * orders table with a deterministic update/insert batch — every
    * `k % 10 = 3` order re-priced at 2× under priority `UPSERTED`, plus
    * a disjoint insert twin at key `-k-1` (negative keys can never
    * collide with real ones at any scale factor) — folded to one row
    * per priority so the oracle's anti-join+union replay is
    * hash-comparable. Proves the join+union MERGE rewrite's three
    * clauses at once: matched rows replaced, unmatched updates
    * inserted, everything else kept.
    *
    * 100 TB shape: the anti join broadcasts only the distinct update
    * KEYS; the update batch never forces a shuffle of the target. */
  def upsertAudit(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val o = graft.Tables.orders(spark, dir).select(
      col("o_orderkey").as("k"),
      graft.operators.Relational.cents(col("o_totalprice")).as("cents"),
      col("o_orderpriority").as("prio"))
    val upd = o.filter(col("k") % 10 === 3)
      .select(col("k"), (col("cents") * 2).as("cents"), lit("UPSERTED").as("prio"))
    val ins = upd.select((-col("k") - 1).as("k"), col("cents"),
      lit("INSERTED").as("prio"))
    upsert(o, upd.unionByName(ins), Seq("k"))
      .groupBy(col("prio"))
      .agg(count(lit(1)).as("n_rows"), sum(col("cents")).as("sum_cents"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
  }

  /** Full-sync MERGE (the WHEN-NOT-MATCHED-BY-SOURCE-DELETE mode x244's
    * upsert does not cover): bring `target` to exactly `source`, but
    * THROUGH the key-classified join — each key labeled `updated` /
    * `unchanged` (in both; value differs / equal), `inserted` (source
    * only), `deleted` (target only, dropped from the result). The
    * classification IS the operator's value: a blind overwrite produces
    * the same table but no audit trail, and the change-volume panel is
    * what gates a suspicious sync (a 90%-deletes day is an upstream
    * bug, not a sync).
    *
    * Returns the labeled per-key frame (result table = every row with
    * action ≠ 'deleted'). 100 TB shape: one full-outer shuffle join on
    * the key — the minimum any diff pays — with map-side-combined
    * rollups downstream. */
  def fullSyncClassified(target: DataFrame, source: DataFrame,
                         keys: Seq[String], valueCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    val t = target.select((keys ++ valueCols).map(col): _*)
      .withColumn("_in_t", lit(1))
    val s0 = source.select((keys ++ valueCols).map(col): _*)
    val s = s0.columns.foldLeft(s0)((d, c) =>
      if (keys.contains(c)) d else d.withColumnRenamed(c, s"_s_$c"))
      .withColumn("_in_s", lit(1))
    // null-SAFE inequality: a NULL↔value change is an update, not
    // 'unchanged' (=!= returns NULL there and the when() falls through)
    val changed = valueCols.map(c => !(col(c) <=> col(s"_s_$c")))
      .reduce(_ || _)
    val joined = t.join(s, keys, "full_outer")
    val action = when(col("_in_t").isNull, "inserted")
      .when(col("_in_s").isNull, "deleted")
      .when(changed, "updated")
      .otherwise("unchanged")
    // the synced value: source wins wherever source HAS THE KEY — keyed
    // on row presence (_in_s), not value coalesce, so a genuinely NULL
    // source value replaces the target instead of resurrecting it
    val out = valueCols.foldLeft(joined.withColumn("action", action)) {
      (d, c) => d.withColumn(c,
        when(col("_in_s").isNotNull, col(s"_s_$c")).otherwise(col(c)))
    }
    out.select((keys.map(col) :+ col("action")) ++ valueCols.map(col): _*)
  }

  /** The x266 gate panel: [[fullSyncClassified]] on orders against a
    * deterministic next-snapshot source — `k % 10 = 7` rows dropped,
    * `k % 10 = 3` re-priced 2×, inserts at `-k-1` for `k % 10 = 5` —
    * folded per action with the synced slice's checksum. The result
    * table (actions ≠ deleted) is provably ≡ the source snapshot. */
  def fullSyncAudit(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val o = graft.Tables.orders(spark, dir).select(
      col("o_orderkey").as("k"),
      graft.operators.Relational.cents(col("o_totalprice")).as("cents"))
    val src = o.filter(col("k") % 10 =!= 7)
      .select(col("k"),
        when(col("k") % 10 === 3, col("cents") * 2).otherwise(col("cents"))
          .as("cents"))
      .unionByName(o.filter(col("k") % 10 === 5)
        .select((-col("k") - 1).as("k"), col("cents")))
    fullSyncClassified(o, src, Seq("k"), Seq("cents"))
      .groupBy(col("action"))
      .agg(count(lit(1)).as("n_rows"), sum(col("cents")).as("sum_cents"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
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
