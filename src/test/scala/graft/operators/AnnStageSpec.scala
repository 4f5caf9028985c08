package graft.operators

import graft.SparkSpec

/** The staged ANN swap ([[AnnStage]]) end-to-end: the approximate table
  * serves [[KnnStage.ranked]]'s exact schema, every consumer runs
  * unchanged against it, and in the exactness limit (probe radius =
  * planes, Hamming ball covers every bucket) the swap is BYTE-IDENTICAL
  * to the exact stage — which is precisely the claim "at 100 TB the
  * compute path swaps for an ANN backend and every consumer is
  * unchanged". */
class AnnStageSpec extends SparkSpec {
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  type Row4 = (Long, Long, Double, Int)

  test("staged table equals the fresh compute") {
    val fresh = AnnStage.computeApproxRankedTopK(spark, sf, KnnStage.StageK)
      .as[Row4].collect().toSet
    val staged = AnnStage.ranked(spark, sf)
      .as[Row4].collect().toSet
    assert(staged == fresh && staged.nonEmpty)
  }

  test("exactness limit: at radius = planes the approximate table ≡ the exact stage") {
    val approx = AnnStage.ranked(spark, sf, radius = Similarity.LshPlanes)
      .as[Row4].collect().toSet
    val exact = KnnStage.ranked(spark, sf)
      .as[Row4].collect().toSet
    assert(approx == exact && approx.nonEmpty)
  }

  test("consumer swap: x178/x191/x192 run unchanged against the ANN table") {
    def ann(radius: Int): (org.apache.spark.sql.SparkSession, String, Int) =>
        org.apache.spark.sql.DataFrame =
      (s, d, k) => AnnStage.ranked(s, d, k, radius)
    // at full radius every consumer's output is identical to the exact run
    val full = Similarity.LshPlanes
    assert(Similarity.mutualTopK(spark, sf, rankedTable = ann(full))
        .as[(Long, Long, Int, Int, Double)].collect().toSet ==
      Similarity.mutualTopK(spark, sf)
        .as[(Long, Long, Int, Int, Double)].collect().toSet)
    assert(Similarity.knnHomophily(spark, sf, rankedTable = ann(full))
        .as[(String, Long, Long, Long, Long)].collect().toSet ==
      Similarity.knnHomophily(spark, sf)
        .as[(String, Long, Long, Long, Long)].collect().toSet)
    assert(Similarity.knnHubness(spark, sf, rankedTable = ann(full))
        .as[(Long, Long, Long, Long)].collect().toSet ==
      Similarity.knnHubness(spark, sf)
        .as[(Long, Long, Long, Long)].collect().toSet)
    // at the production radius the consumers still run and publish the
    // same schema — the approximate table is a true drop-in
    val approxHomophily = Similarity.knnHomophily(spark, sf,
      rankedTable = ann(AnnStage.AnnRadius))
    assert(approxHomophily.columns.toSeq ==
      Similarity.knnHomophily(spark, sf).columns.toSeq)
    assert(approxHomophily.count() > 0)
  }

  test("annSwapFidelity (x221): ledger matches a driver-side replay") {
    val k = KnnStage.StageK
    val exact = KnnStage.ranked(spark, sf)
      .as[Row4].collect().filter(_._4 <= k)
    val approx = AnnStage.ranked(spark, sf)
      .as[Row4].collect().filter(_._4 <= k)
    val annRank = approx.map(r => (r._1, r._2) -> r._4).toMap
    val want = exact.groupBy(_._4).map { case (r, rows) =>
      val found = rows.flatMap(p => annRank.get((p._1, p._2)))
      r -> (rows.length.toLong, found.length.toLong,
        1000000L * found.length / rows.length,
        found.map(_.toLong - r).sum)
    }
    val got = Similarity.annSwapFidelity(spark, sf)
      .as[(Int, Long, Long, Long, Long)].collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { case (r, ne, nf, ppm, disp) =>
      assert(want(r) == ((ne, nf, ppm, disp)), s"rank $r")
    }
    // recall is a real fraction at the production radius on this corpus
    // (not vacuously 0 or 1 across the board)
    assert(got.map(_._3).sum > 0)
  }

  test("x241: the ANN-served retrieval eval ≡ the exact eval at full probe radius") {
    def ann(radius: Int): (org.apache.spark.sql.SparkSession, String, Int) =>
        org.apache.spark.sql.DataFrame =
      (s, d, k) => AnnStage.ranked(s, d, k, radius)
    val full = Similarity.retrievalEval(spark, sf,
        rankedTable = ann(Similarity.LshPlanes))
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    val exact = Similarity.retrievalEval(spark, sf)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    assert(full == exact && full.nonEmpty)
    // at the production radius the panel publishes the same schema and
    // covers no more queries per label than exist (a query with an empty
    // Hamming ball drops out — the honest ANN contract; hit RANKS can
    // move either way since pruned competitors free top-k slots)
    val prod = Similarity.retrievalEval(spark, sf, rankedTable = ann(AnnStage.AnnRadius))
      .as[(String, Long, Long, Long, Long, Long)].collect()
    val exactByLabel = exact.map(r => r._1 -> r).toMap
    assert(prod.nonEmpty && prod.length <= exact.size)
    prod.foreach { case (lab, n, h1, h3, h5, _) =>
      assert(n <= exactByLabel(lab)._2, s"label $lab")
      assert(h1 <= h3 && h3 <= h5 && h5 <= n, s"label $lab nesting")
    }
  }
}
