package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LinkAnalysisSpec extends SparkSpec {
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  /** Driver-side Long replica of the integer PageRank step — independent
    * third implementation (besides Spark plan and DuckDB oracle). */
  private def replica(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var ranks = deg.keys.map(_ -> LinkAnalysis.PrUnit).toMap
    val base = LinkAnalysis.PrUnit - LinkAnalysis.PrUnit * LinkAnalysis.PrDampPct / 100
    for (_ <- 1 to iters) {
      val sums = edges.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => ranks(s) / deg(s) }.sum).toMap
      ranks = sums.map { case (n, s) =>
        n -> (base + LinkAnalysis.PrDampPct * s / 100)
      }
    }
    ranks
  }

  test("pageRank (x77): exact match with a driver-side integer replica on real data") {
    val edges = LinkAnalysis.customerSupplierEdges(spark, sf)
      .as[(Long, Long)].collect().toSeq
    val want = replica(edges, LinkAnalysis.PrIters)
    val got = LinkAnalysis.pageRank(spark, sf)
      .select($"node_type", $"node_key", $"deg", $"rank_pts")
      .as[(String, Long, Long, Long)].collect()
    assert(got.length == want.size) // one row per non-isolated node
    got.foreach { case (tpe, key, deg, rank) =>
      val node = if (tpe == "customer") key * 2 else key * 2 + 1
      assert(rank == want(node), s"$tpe $key")
      assert(deg == edges.count(_._1 == node).toLong)
    }
    // bipartite sanity: both sides present, every rank ≥ the damping base
    assert(got.exists(_._1 == "customer") && got.exists(_._1 == "supplier"))
    assert(got.forall(_._4 >= 150000L))
  }

  test("pageRank on a hand graph: star center accumulates rank, leaves stay at base + share") {
    // star: supplier 1 connected to customers 1..4 (undirected)
    val fwd = (1L to 4L).map(c => (c * 2, 3L)) // customer nodes -> supplier node 3
    val edges = (fwd ++ fwd.map(_.swap)).toDF("src", "dst")
    val out = LinkAnalysis.pageRank(edges, iters = 2)
      .select($"node_type", $"node_key", $"deg", $"rank_pts")
      .as[(String, Long, Long, Long)].collect()
    val center = out.find(r => r._1 == "supplier" && r._2 == 1L).get
    val leaves = out.filter(_._1 == "customer")
    assert(center._3 == 4L && leaves.forall(_._3 == 1L))
    // replica-checked exact values
    val want = replica(fwd ++ fwd.map(_.swap), 2)
    assert(center._4 == want(3L))
    leaves.foreach(l => assert(l._4 == want(l._2 * 2)))
    // the hub outranks every leaf
    assert(leaves.forall(_._4 < center._4))
  }

  test("pageRank rank mass: total shrinks only by floor-division dust, never grows") {
    val edges = LinkAnalysis.customerSupplierEdges(spark, sf)
      .as[(Long, Long)].collect().toSeq
    val n = edges.map(_._1).distinct.size.toLong
    var prev = n * LinkAnalysis.PrUnit
    for (k <- 1 to 3) {
      val total = replica(edges, k).values.sum
      assert(total <= prev, s"iteration $k grew the mass")
      // dust bound: each node truncates < deg contributions + 1 division
      assert(total > n * 150000L)
      prev = total
    }
  }

  test("pageRank plan: graph persisted across iterations, hash joins only") {
    val q = LinkAnalysis.pageRank(spark, sf)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan"), "edges+degrees should persist across iterations")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
  }
}
