package graft.operators

import org.apache.spark.sql.functions.col

import graft.{SparkSpec, Tables}

/** Staged ≡ recomputed for the persisted exact-kNN table ([[KnnStage]])
  * plus the consumer contracts: a rank-filter of the staged top-StageK
  * must be identical to a direct top-k computation (the shared x09
  * ranking contract is what makes the stage sound), and the audits
  * (x191 homophily, x192 hubness) must reconcile with the vector
  * universe. */
class KnnStageSpec extends SparkSpec {
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  test("ranked: staged table equals the fresh exact top-k computation") {
    val fresh = Similarity.computeRankedTopK(spark, sf, KnnStage.StageK)
      .as[(Long, Long, Double, Int)].collect().toSet
    val staged = KnnStage.ranked(spark, sf)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(staged == fresh && staged.nonEmpty)
  }

  test("top-j of the staged top-k equals a direct top-j computation (x178's read)") {
    val direct = Similarity.computeRankedTopK(spark, sf, Similarity.MutualK)
      .as[(Long, Long, Double, Int)].collect().toSet
    val filtered = KnnStage.ranked(spark, sf)
      .filter(col("rank") <= Similarity.MutualK)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(filtered == direct && filtered.nonEmpty)
  }

  test("x178 mutual pairs are symmetric-verified against the staged lists") {
    val topk = KnnStage.ranked(spark, sf)
      .filter(col("rank") <= Similarity.MutualK)
      .as[(Long, Long, Double, Int)].collect()
      .map { case (q, v, _, r) => (q, v) -> r }.toMap
    val pairs = Similarity.mutualTopK(spark, sf)
      .as[(Long, Long, Int, Int, Double)].collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (u, v, ruv, rvu, _) =>
      assert(u < v && topk((u, v)) == ruv && topk((v, u)) == rvu)
    }
    // completeness: every reciprocal pair in the lists is reported
    val expected = topk.keys.filter { case (u, v) =>
      u < v && topk.contains((v, u))
    }.toSet
    assert(pairs.map(p => (p._1, p._2)).toSet == expected)
  }

  test("x191 homophily: slots = vecs·k per label, n_same recounted from the lists") {
    val n = Tables.embeddings(spark, sf).count()
    val labels = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label")).as[(Long, Int)].collect().toMap
    val lists = KnnStage.ranked(spark, sf).as[(Long, Long, Double, Int)].collect()
    val rows = Similarity.knnHomophily(spark, sf)
      .as[(Int, Long, Long, Long, Long)].collect()
    assert(rows.map(_._2).sum == n && rows.map(_._3).sum == n * KnnStage.StageK)
    val expSame = lists.groupBy(t => labels(t._1))
      .view.mapValues(_.count(t => labels(t._2) == labels(t._1)).toLong).toMap
    rows.foreach { case (lab, nv, ns, same, ppm) =>
      assert(ns == nv * KnnStage.StageK && same == expSame(lab))
      assert(ppm == 1000000L * same / ns)
    }
  }

  test("x192 hubness: histogram masses reconcile with the vector universe") {
    val n = Tables.embeddings(spark, sf).count()
    val rows = Similarity.knnHubness(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.map(_._2).sum == n)
    assert(rows.map(r => r._1 * r._2).sum == n * KnnStage.StageK)
    val indeg = KnnStage.ranked(spark, sf).as[(Long, Long, Double, Int)]
      .collect().groupBy(_._2).view.mapValues(_.length.toLong).toMap
    rows.foreach { case (d, nv, lo, hi) =>
      assert(indeg.getOrElse(lo, 0L) == d && indeg.getOrElse(hi, 0L) == d && lo <= hi)
      assert(nv == (0L until n).count(v => indeg.getOrElse(v, 0L) == d))
    }
  }
}
