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
    val signs = Similarity.hyperplaneSigns(planes)
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), Similarity.asDouble(col("embedding")).as("v"))
      .withColumn("sig", graft.functions.HashSignatures.hyperplane_sig(col("v"), signs))
      .localCheckpoint() // corpus side and query side of the probe join
    computeApproxRankedTopK(emb, k, planes, radius)
  }

  /** The ONE probe-join shape of the ANN family: `probeSide` exploded
    * by the radius-R XOR masks, PLAIN equi-join on the probed signature
    * against `corpus` (unhinted — AQE broadcasts when tiny; the
    * hint-free discipline ScaleTechniquesSpec pins for x202's sibling),
    * self-pairs dropped. Returns every qualifying (corpus vec, probe
    * vec) pair exactly once — one mask per pair satisfies
    * sig_c = sig_p XOR m. Both frames carry (vec_id, v, sig). */
  private def probeCandidatePairs(corpus: DataFrame, probeSide: DataFrame,
                                  planes: Int, radius: Int): DataFrame = {
    val masks: Seq[Int] =
      (0 until (1 << planes)).filter(m => Integer.bitCount(m) <= radius)
    val probes = probeSide
      .select(col("vec_id").as("p_id"), col("v").as("pv"), col("sig").as("psig"))
      .withColumn("probe_sig",
        explode(array(masks.map(m => col("psig").bitwiseXOR(lit(m))): _*)))
    corpus.join(probes, col("sig") === col("probe_sig"))
      .filter(col("vec_id") =!= col("p_id"))
      .select(col("vec_id").as("c_id"), col("v").as("cv"),
        col("p_id"), col("pv"))
  }

  /** Frame-based overload — the unit the streaming ANN ingester
    * bootstraps from (`streaming.VectorStream.startAnnIngest`). Input
    * carries (vec_id, v, sig) with the signature already computed (the
    * ingester persists sigs in its vec log so they are hashed exactly
    * once per vector). */
  private[graft] def computeApproxRankedTopK(emb: DataFrame, k: Int,
                                             planes: Int,
                                             radius: Int): DataFrame = {
    import graft.functions.VectorFunctions.cosine_sim
    // the whole corpus probes itself: every vector is a query
    val cand = probeCandidatePairs(emb, emb, planes, radius)
      .select(col("p_id").as("q_id"), col("c_id").as("vec_id"),
        Similarity.trunc6(cosine_sim(col("pv"), col("cv"))).as("cos_sim"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos_sim").desc, col("vec_id"))
    cand.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Incrementally merge an existing approximate top-k table with a new
    * vector batch — [[Similarity.mergeRanked]]'s rule restricted to the
    * Hamming ball, and EXACT with respect to the batch rebuild: for an
    * existing query q, a new batch changes no old candidate's score, so
    * q's new candidate-set top-k equals the re-rank of (q's old top-k ∪
    * q×{batch ∩ ball(q)}); a batch query's list is its full radius-R
    * candidate scan. Cost: ONE explode of the |W| batch by the ~37
    * probe masks and one signature equi-join against the corpus —
    * O(|W|·corpus/2^planes·ball) scoring instead of x203's
    * O(|U|·|W|) exact merge; the bucketed join is the only shuffle.
    * Each qualifying (corpus, batch) pair lands exactly once: one mask
    * per pair satisfies sig_c = sig_w XOR m. */
  private[graft] def mergeApproxRanked(oldRanked: DataFrame, oldEmb: DataFrame,
                                       newEmb: DataFrame, k: Int,
                                       planes: Int = Similarity.LshPlanes,
                                       radius: Int = AnnRadius): DataFrame = {
    import graft.functions.VectorFunctions.cosine_sim
    // every (corpus, batch) pair within Hamming radius R — BOTH merge
    // directions ride this single probe join (the shared shape)
    val pairs = probeCandidatePairs(oldEmb.union(newEmb), newEmb, planes, radius)
      .localCheckpoint() // scored in both directions below
    // batch vectors as queries: full radius-R lists over old ∪ new
    val newLists = pairs.select(col("p_id").as("q_id"), col("c_id").as("vec_id"),
      Similarity.trunc6(cosine_sim(col("pv"), col("cv"))).as("cos_sim"))
    // existing queries: only their batch-side candidates are new scores
    val deltas = pairs
      .join(newEmb.select(col("vec_id").as("c_id")), Seq("c_id"), "left_anti")
      .select(col("c_id").as("q_id"), col("p_id").as("vec_id"),
        Similarity.trunc6(cosine_sim(col("cv"), col("pv"))).as("cos_sim"))
    val oldTop = oldRanked.select(col("q_id"), col("vec_id"), col("cos_sim"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos_sim").desc, col("vec_id"))
    oldTop.union(deltas).union(newLists)
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
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
