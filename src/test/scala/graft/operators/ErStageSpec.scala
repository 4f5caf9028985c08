package graft.operators

import graft.SparkSpec

/** Staged ≡ recomputed for the persisted ER candidate tables (the
  * ClusterStage contract applied to [[ErStage]]): each staged artifact
  * must equal the same pair set derived fresh by the compute path, and
  * the staged read must be what the query entries consume. */
class ErStageSpec extends SparkSpec {
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  test("brandPairs: staged table equals the fresh brand-blocked levenshtein join") {
    val fresh = Dedup.computeFuzzyNamePairs(spark, sf)
      .as[(String, Long, String, Long, String, Int)].collect().toSet
    val staged = ErStage.brandPairs(spark, sf)
      .as[(String, Long, String, Long, String, Int)].collect().toSet
    assert(staged == fresh && staged.nonEmpty)
  }

  test("snPairs: staged table equals the fresh sorted-neighborhood join") {
    val fresh = Dedup.computeSortedNeighborhoodPairs(spark, sf)
      .as[(Long, String, Long, String, Long, Int, Int)].collect().toSet
    val staged = ErStage.snPairs(spark, sf)
      .as[(Long, String, Long, String, Long, Int, Int)].collect().toSet
    assert(staged == fresh && staged.nonEmpty)
  }

  test("erCanon: staged mapping equals the fresh transitive closure") {
    val fresh = Dedup.computeErCanon(spark, sf)
      .as[(Long, Long)].collect().toMap
    val staged = ErStage.erCanon(spark, sf)
      .as[(Long, Long)].collect().toMap
    assert(staged == fresh && staged.nonEmpty)
    // and x181's output reads it: cluster sizes reconcile with the mapping
    val sizes = staged.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val x181 = Dedup.erClusters(spark, sf)
      .as[(Long, Long, Long, Int)].collect()
    assert(x181.length == staged.size)
    x181.foreach { case (p, ck, sz, _) =>
      assert(ck == staged(p) && sz == sizes(ck), s"part $p")
    }
  }

  test("query entries read the stage: x128/x183 outputs equal the staged tables") {
    val viaEntry = Dedup.fuzzyNamePairs(spark, sf)
      .as[(String, Long, String, Long, String, Int)].collect().toSet
    val staged = ErStage.brandPairs(spark, sf)
      .as[(String, Long, String, Long, String, Int)].collect().toSet
    assert(viaEntry == staged)
    val snEntry = Dedup.sortedNeighborhoodPairs(spark, sf)
      .as[(Long, String, Long, String, Long, Int, Int)].collect().toSet
    val snStaged = ErStage.snPairs(spark, sf)
      .as[(Long, String, Long, String, Long, Int, Int)].collect().toSet
    assert(snEntry == snStaged)
  }
}
