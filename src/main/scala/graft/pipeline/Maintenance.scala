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
}
