package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Staged ≡ recomputed for the persisted purchase graphs (the
  * ClusterStage contract applied to [[GraphStage]]): every artifact the
  * stage writes must equal the same structure derived fresh from the
  * fact tables, and the degree tables must equal the degree fold of
  * their own edge tables. */
class GraphStageSpec extends SparkSpec {
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  test("custSuppPairs: staged table equals the fresh orders⨝lineitem distinct") {
    val fresh = graft.Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_custkey")
      .join(graft.Tables.lineitem(spark, sf).select($"l_orderkey", $"l_suppkey"),
        $"o_orderkey" === $"l_orderkey")
      .select($"o_custkey", $"l_suppkey").distinct()
      .as[(Long, Long)].collect().toSet
    val staged = GraphStage.custSuppPairs(spark, sf)
      .as[(Long, Long)].collect().toSet
    assert(staged == fresh && staged.nonEmpty)
  }

  test("custSuppDegrees: staged degrees equal the degree fold of the staged edges") {
    val edges = LinkAnalysis.customerSupplierEdges(spark, sf)
      .as[(Long, Long)].collect().toSeq
    val want = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val got = GraphStage.custSuppDegrees(spark, sf)
      .as[(Long, Long)].collect().toMap
    assert(got == want && got.nonEmpty)
  }

  test("copurchasePairs: staged pair-support equals the fresh per-order pair join") {
    val op = graft.Tables.lineitem(spark, sf)
      .select($"l_orderkey", $"l_partkey").as[(Long, Long)].collect()
      .toSeq.distinct
    val want = op.groupBy(_._1).values.flatMap { rows =>
      val ps = rows.map(_._2).sorted
      for (i <- ps.indices; j <- i + 1 until ps.size) yield (ps(i), ps(j))
    }.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= LinkAnalysis.TriMinSupport).toMap
    val got = GraphStage.copurchasePairs(spark, sf)
      .as[(Long, Long, Long)].collect()
      .map { case (a, b, s) => (a, b) -> s }.toMap
    assert(got == want && got.nonEmpty)
  }

  test("copurchaseDegrees: staged degrees equal the symmetric fold of the staged pairs") {
    val edges = GraphStage.copurchasePairs(spark, sf)
      .select($"a", $"b").as[(Long, Long)].collect().toSeq
    val want = (edges.map(_._1) ++ edges.map(_._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = GraphStage.copurchaseDegrees(spark, sf)
      .as[(Long, Long)].collect().toMap
    assert(got == want && got.nonEmpty)
  }

  test("partOrderCounts + orderTotal: staged side artifacts equal fresh fact aggregates") {
    val op = graft.Tables.lineitem(spark, sf)
      .select($"l_orderkey", $"l_partkey").as[(Long, Long)].collect()
      .toSeq.distinct
    val wantPc = op.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val gotPc = GraphStage.partOrderCounts(spark, sf)
      .as[(Long, Long)].collect().toMap
    assert(gotPc == wantPc && gotPc.nonEmpty)
    val gotTot = GraphStage.orderTotal(spark, sf).as[Long].head()
    assert(gotTot == op.map(_._1).distinct.size.toLong)
  }

  test("below-base support falls back to a fresh computation (no lossy artifact read)") {
    // minSupport 1 is below the staged base 2: the read path must
    // recompute, and the result must contain every staged edge plus the
    // support-1 singletons the pruned artifact dropped
    val all = LinkAnalysis.copurchaseEdges(spark, sf, minSupport = 1)
      .as[(Long, Long)].collect().toSet
    val staged = GraphStage.copurchasePairs(spark, sf)
      .select($"a", $"b").as[(Long, Long)].collect().toSet
    assert(staged.subsetOf(all) && all.size > staged.size)
  }
}
