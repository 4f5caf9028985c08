package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** The exact top-k cosine neighbor table as a PERSISTED artifact — the
  * [[ClusterStage]]/[[GraphStage]]/[[ErStage]] staged-artifact contract
  * applied to the ANN-fidelity family. The O(N²) exact scoring pass is
  * the expensive step of every exact-kNN consumer (the mutual-kNN
  * filter x178, the homophily audit x191, the hubness audit x192), and
  * its output is the O(N·k) ranked neighbor table — thousands of times
  * smaller than the scored cross product it distills. A production
  * embedding store computes the exact neighbor lists ONCE per corpus
  * snapshot (or maintains them via an ANN index) and every fidelity
  * report reads the table.
  *
  * The ranking contract is x09's (`Similarity.bruteForceTopK`): trunc6
  * cosine over float→double upcast vectors, ties broken by smaller
  * vec_id — so a top-j filter of the staged top-k (j ≤ k) is
  * IDENTICAL to a direct top-j computation, which is what lets x178
  * (k=3) read the k=5 stage. At 100 TB the compute path swaps for an
  * ANN backend (the x09↔x18 relationship, recall measured per
  * RECALL.md) and the staged table becomes the index's export — every
  * consumer is unchanged.
  *
  * `ranked(spark, dir, k)` is staged-or-compute: the first call per
  * (dir, k) in a JVM computes via [[Similarity.computeRankedTopK]] and
  * persists to a session-scoped staging dir; later calls read parquet.
  * Sound because `dir` names an IMMUTABLE snapshot (the ClusterStage
  * memo argument); `invalidate()` exists for tests that mutate a dir
  * in place. Staged ≡ recomputed is spec-asserted (KnnStageSpec).
  */
object KnnStage {

  /** Staged neighbor-list depth — max over the consumers' k (x178 uses
    * 3, x191/x192 use 5). Shared with the DuckDB oracles. */
  val StageK: Int = 5

  private lazy val stageRoot = Files.createTempDirectory("graft_knn_stage_")

  private val staged =
    scala.collection.mutable.HashMap.empty[(String, Int), String]

  private def root(spark: SparkSession, dir: String, k: Int): String =
    synchronized {
      staged.getOrElseUpdate((dir, k), {
        val r = stageRoot.resolve(
          s"knn_${StagePaths.component(dir, k)}").toString
        Similarity.computeRankedTopK(spark, dir, k)
          .write.mode("overwrite").parquet(r)
        r
      })
    }

  /** Staged exact neighbor table: (q_id, vec_id, cos_sim, rank) with
    * rank ≤ k per q_id, ranked by x09's contract. */
  def ranked(spark: SparkSession, dir: String, k: Int = StageK): DataFrame =
    spark.read.parquet(root(spark, dir, k))
      .select(col("q_id"), col("vec_id"), col("cos_sim"), col("rank"))

  /** Drop every memoized staging path (artifacts stay on disk; next
    * accessor recomputes). Tests only. */
  private[graft] def invalidate(): Unit = synchronized { staged.clear() }
}
