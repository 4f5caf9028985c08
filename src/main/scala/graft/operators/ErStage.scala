package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The entity-resolution candidate pairs as PERSISTED tables — the
  * [[ClusterStage]]/[[GraphStage]] staged-artifact contract applied to
  * the ER family. Candidate generation is the expensive step of every
  * ER run (the blocked levenshtein joins: x128's brand blocking, x183's
  * sorted neighborhood), and its output is thousands of times smaller
  * than the catalog² it prunes — so a production pipeline generates
  * candidates ONCE per catalog snapshot and every consumer (the pair
  * report, the transitive closure x181, the blocking audit x184) reads
  * the table.
  *
  * Two artifacts, staged independently because their knobs differ:
  *
  *  - `brand_pairs` — x128's brand-blocked, length-expanded, banded-
  *    levenshtein-verified pairs (key = (dir, maxDistance)).
  *  - `sn_pairs` — x183's sorted-neighborhood pairs (key = (dir,
  *    window, maxDistance)).
  *
  * `*(spark, dir)` accessors are staged-or-compute: first call per key
  * in a JVM computes via the (kept) compute paths in [[Dedup]] and
  * persists to a session-scoped staging dir; later calls read parquet.
  * Sound because the key names an IMMUTABLE snapshot (the ClusterStage
  * memo argument); `invalidate()` exists for tests that mutate a dir in
  * place. Staged ≡ recomputed is spec-asserted (ErStageSpec).
  */
object ErStage {

  private lazy val stageRoot = Files.createTempDirectory("graft_er_stage_")

  private val stagedBrand =
    scala.collection.mutable.HashMap.empty[(String, Int), String]
  private val stagedSn =
    scala.collection.mutable.HashMap.empty[(String, Int, Int), String]

  private def brandRoot(spark: SparkSession, dir: String,
                        maxDistance: Int): String = synchronized {
    stagedBrand.getOrElseUpdate((dir, maxDistance), {
      val root = stageRoot.resolve(
        s"brand_${StagePaths.component(dir, maxDistance)}").toString
      Dedup.computeFuzzyNamePairs(spark, dir, maxDistance)
        .write.mode("overwrite").parquet(root)
      root
    })
  }

  private def snRoot(spark: SparkSession, dir: String, window: Int,
                     maxDistance: Int): String = synchronized {
    stagedSn.getOrElseUpdate((dir, window, maxDistance), {
      val root = stageRoot.resolve(
        s"sn_${StagePaths.component(dir, window, maxDistance)}").toString
      Dedup.computeSortedNeighborhoodPairs(spark, dir, window, maxDistance)
        .write.mode("overwrite").parquet(root)
      root
    })
  }

  /** Staged x128 candidate table: (p_brand, key_a, name_a, key_b,
    * name_b, distance). */
  def brandPairs(spark: SparkSession, dir: String,
                 maxDistance: Int = Dedup.FuzzyMaxDistance): DataFrame =
    spark.read.parquet(brandRoot(spark, dir, maxDistance))
      .select(org.apache.spark.sql.functions.col("p_brand"),
        org.apache.spark.sql.functions.col("key_a"),
        org.apache.spark.sql.functions.col("name_a"),
        org.apache.spark.sql.functions.col("key_b"),
        org.apache.spark.sql.functions.col("name_b"),
        org.apache.spark.sql.functions.col("distance"))

  /** Staged x183 candidate table: (key_a, name_a, key_b, name_b,
    * rank_gap, distance, same_brand). */
  def snPairs(spark: SparkSession, dir: String,
              window: Int = Dedup.SnWindow,
              maxDistance: Int = Dedup.FuzzyMaxDistance): DataFrame =
    spark.read.parquet(snRoot(spark, dir, window, maxDistance))
      .select(org.apache.spark.sql.functions.col("key_a"),
        org.apache.spark.sql.functions.col("name_a"),
        org.apache.spark.sql.functions.col("key_b"),
        org.apache.spark.sql.functions.col("name_b"),
        org.apache.spark.sql.functions.col("rank_gap"),
        org.apache.spark.sql.functions.col("distance"),
        org.apache.spark.sql.functions.col("same_brand"))

  private val stagedCanon =
    scala.collection.mutable.HashMap.empty[(String, Int), String]

  private def canonRoot(spark: SparkSession, dir: String,
                        maxDistance: Int): String = synchronized {
    stagedCanon.getOrElseUpdate((dir, maxDistance), {
      val root = stageRoot.resolve(
        s"canon_${StagePaths.component(dir, maxDistance)}").toString
      Dedup.computeErCanon(spark, dir, maxDistance)
        .write.mode("overwrite").parquet(root)
      root
    })
  }

  /** Staged ER canonical mapping (p_partkey, canonical_key) — the
    * transitive closure of [[brandPairs]] run ONCE per snapshot (the
    * ClusterStage contract: clustering is the expensive step; every
    * report reads the table). */
  def erCanon(spark: SparkSession, dir: String,
              maxDistance: Int = Dedup.FuzzyMaxDistance): DataFrame =
    spark.read.parquet(canonRoot(spark, dir, maxDistance))
      .select(org.apache.spark.sql.functions.col("p_partkey"),
        org.apache.spark.sql.functions.col("canonical_key"))

  /** Drop every memoized staging path (artifacts stay on disk; next
    * accessor recomputes). Tests only. */
  private[graft] def invalidate(): Unit = synchronized {
    stagedBrand.clear(); stagedSn.clear(); stagedCanon.clear()
  }
}
