package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** The APPROXIMATE ranked neighbor table as a persisted artifact — the
  * other half of [[KnnStage]]'s contract. KnnStage's Scaladoc promises
  * that "at 100 TB the compute path swaps for an ANN backend and every
  * consumer is unchanged"; this stage IS that swap, made concrete:
  * hyperplane-LSH multiprobe candidates (x10/x202's machinery — the
  * deterministic ±1 planes shared with the DuckDB oracle) ranked by
  * the IDENTICAL scoring contract (trunc6 cosine, ties to smaller
  * vec_id) into the IDENTICAL (q_id, vec_id, cos_sim, rank) schema.
  * Every exact-table consumer (x178 mutual-kNN, x191 homophily, x192
  * hubness) accepts the ranked table as a parameter and runs unchanged
  * against this one — spec-proven, including the exactness limit: at
  * probe radius = planes the Hamming ball covers every bucket, the
  * candidate set is all pairs, and this table ≡ KnnStage's byte for
  * byte.
  *
  * Cost model (the reason the swap exists): the exact stage scores
  * N² pairs; this one scores only pairs within Hamming radius R of
  * each query's signature — ~Σ_{i≤R} C(planes,i) / 2^planes of the
  * corpus per query (37/256 at 8 planes, radius 2), the equi-join on
  * the probed signature being the ONLY shuffle. The fidelity price is
  * measured, not guessed: x221 (`Similarity.annSwapFidelity`) publishes
  * the per-rank recall + displacement ledger of this table against the
  * exact stage as an oracle-checked query, and RECALL.md records the
  * curve. Lists may hold fewer than k rows when a bucket runs dry —
  * that is the honest ANN contract, and the consumers' own aggregates
  * (`count`, not `k`) already handle it.
  */
object AnnStage {

  /** Multiprobe Hamming radius for the staged approximate table (the
    * x202 curve's knob) — shared with the DuckDB oracle. */
  val AnnRadius: Int = 2

  /** Compute the approximate ranked top-k via hyperplane-LSH multiprobe
    * candidates — x09's scoring contract over the radius-R candidate
    * set only. */
  private[graft] def computeApproxRankedTopK(spark: SparkSession, dir: String,
                                             k: Int,
                                             planes: Int = Similarity.LshPlanes,
                                             radius: Int = AnnRadius): DataFrame = {
    import graft.functions.VectorFunctions.cosine_sim
    val signs = Similarity.hyperplaneSigns(planes)
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), Similarity.asDouble(col("embedding")).as("v"))
      .withColumn("sig", graft.functions.HashSignatures.hyperplane_sig(col("v"), signs))
      .localCheckpoint() // corpus side and query side of the probe join
    val masks: Seq[Int] =
      (0 until (1 << planes)).filter(m => Integer.bitCount(m) <= radius)
    val queries = emb
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("sig").as("qsig"))
      .withColumn("probe_sig",
        explode(array(masks.map(m => col("qsig").bitwiseXOR(lit(m))): _*)))
    // plain equi-join on the probed signature — the bucketed shuffle that
    // replaces the exact stage's N² cross (AQE broadcasts it when tiny)
    val cand = emb.join(queries, col("sig") === col("probe_sig"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        Similarity.trunc6(cosine_sim(col("qv"), col("v"))).as("cos_sim"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos_sim").desc, col("vec_id"))
    cand.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  private lazy val stageRoot = Files.createTempDirectory("graft_ann_stage_")

  private val staged =
    scala.collection.mutable.HashMap.empty[(String, Int, Int), String]

  private def root(spark: SparkSession, dir: String, k: Int, radius: Int): String =
    synchronized {
      staged.getOrElseUpdate((dir, k, radius), {
        val r = stageRoot.resolve(
          s"ann_${StagePaths.component(dir, k, radius)}").toString
        computeApproxRankedTopK(spark, dir, k, radius = radius)
          .write.mode("overwrite").parquet(r)
        r
      })
    }

  /** Staged approximate neighbor table — [[KnnStage.ranked]]'s schema,
    * drop-in for every consumer. */
  def ranked(spark: SparkSession, dir: String, k: Int = KnnStage.StageK,
             radius: Int = AnnRadius): DataFrame =
    spark.read.parquet(root(spark, dir, k, radius))
      .select(col("q_id"), col("vec_id"), col("cos_sim"), col("rank"))

  /** Drop every memoized staging path (artifacts stay on disk; next
    * accessor recomputes). Tests only. */
  private[graft] def invalidate(): Unit = synchronized { staged.clear() }
}
