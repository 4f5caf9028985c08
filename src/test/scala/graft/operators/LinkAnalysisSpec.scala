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

  test("pageRank plan: returns a materialized O(nodes) table, graph cache released") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val q = LinkAnalysis.pageRank(spark, sf)
    // output is materialized inside the call (so withDeg could unpersist):
    // the returned plan is a checkpointed-RDD scan, not a live join tree
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("ExistingRDD") || plan.contains("Scan ExistingRDD"), plan)
    assert(!plan.contains("Join"), s"expected pre-materialized output\n$plan")
    // the persisted degree-annotated edge list is released (ADVICE r7):
    // the graph persists at MEMORY_AND_DISK_SER, localCheckpoint blocks
    // at deserialized MEMORY_AND_DISK (reclaimed by ContextCleaner on
    // GC) — so a surviving SER-level RDD is exactly a leaked graph
    val leaked = (spark.sparkContext.getPersistentRDDs.keySet -- before)
      .map(spark.sparkContext.getPersistentRDDs(_))
      .filter(_.getStorageLevel == org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    assert(leaked.isEmpty, s"graph persist leaked: $leaked")
  }

  /** Driver-side Long replica of the integer HITS rounds — independent
    * third implementation (besides Spark plan and DuckDB oracle). */
  private def hitsReplica(edges: Seq[(Long, Long)], iters: Int)
      : (Map[Long, Long], Map[Long, Long]) = {
    val u = LinkAnalysis.HitsUnit
    def renorm(m: Map[Long, Long]): Map[Long, Long] = {
      val scale = math.max(1L, m.values.max / u)
      m.view.mapValues(_ / scale).toMap
    }
    var hubs = edges.map(_._1).distinct.map(_ -> u).toMap
    var auths = Map.empty[Long, Long]
    for (_ <- 1 to iters) {
      auths = renorm(edges.groupBy(_._2).view.mapValues(_.map(e => hubs(e._1)).sum).toMap)
      hubs = renorm(edges.groupBy(_._1).view.mapValues(_.map(e => auths(e._2)).sum).toMap)
    }
    (hubs, auths)
  }

  test("hits (x99): exact match with a driver-side integer replica on real data") {
    val edges = LinkAnalysis.customerSupplierDirected(spark, sf)
      .as[(Long, Long)].collect().toSeq
    val (wantH, wantA) = hitsReplica(edges, LinkAnalysis.HitsIters)
    val got = LinkAnalysis.hits(spark, sf)
      .select($"node_type", $"node_key", $"pts")
      .as[(String, Long, Long)].collect()
    assert(got.length == wantH.size + wantA.size)
    got.foreach {
      case ("customer", key, pts) => assert(pts == wantH(key), s"hub $key")
      case ("supplier", key, pts) => assert(pts == wantA(key), s"auth $key")
      case other                  => fail(s"unexpected row $other")
    }
    // renormalization keeps every score in the documented band (< 2·Unit)
    assert(got.forall(_._3 < 2 * LinkAnalysis.HitsUnit))
    assert(got.exists(_._3 > 0))
  }

  test("hits on a hand graph: the consensus supplier is the top authority") {
    // customers 1..3 all buy from supplier 10; customer 1 also buys from 11
    val edges = Seq((1L, 10L), (2L, 10L), (3L, 10L), (1L, 11L)).toDF("hub", "auth")
    val out = LinkAnalysis.hits(edges, iters = 2)
      .select($"node_type", $"node_key", $"pts")
      .as[(String, Long, Long)].collect()
    val auths = out.filter(_._1 == "supplier").map(r => r._2 -> r._3).toMap
    val hubs = out.filter(_._1 == "customer").map(r => r._2 -> r._3).toMap
    assert(auths(10L) > auths(11L), "market-consensus supplier must outrank")
    // the broadest buyer (touches the consensus AND the niche supplier)
    // outscores single-link peers
    assert(hubs(1L) > hubs(2L) && hubs(2L) == hubs(3L))
    // replica-checked exact values
    val (wantH, wantA) = hitsReplica(Seq((1L, 10L), (2L, 10L), (3L, 10L), (1L, 11L)), 2)
    assert(auths == wantA && hubs == wantH)
  }

  test("hits plan: materialized O(nodes) output, edge cache released") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val q = LinkAnalysis.hits(spark, sf)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("ExistingRDD") || plan.contains("Scan ExistingRDD"), plan)
    assert(!plan.contains("Join"), s"expected pre-materialized output\n$plan")
    val leaked = (spark.sparkContext.getPersistentRDDs.keySet -- before)
      .map(spark.sparkContext.getPersistentRDDs(_))
      .filter(_.getStorageLevel == org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    assert(leaked.isEmpty, s"edge persist leaked: $leaked")
  }

  test("degreeHistogram (x108): node mass conserved, histogram matches per-node degrees") {
    val edges = LinkAnalysis.customerSupplierEdges(spark, sf)
      .as[(Long, Long)].collect().toSeq
    val degByNode = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val want = degByNode.toSeq
      .map { case (n, d) => (if (n % 2 == 0) "customer" else "supplier", d) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = LinkAnalysis.degreeHistogram(spark, sf)
      .as[(String, Long, Long)].collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { case (tpe, deg, n) => assert(n == want((tpe, deg)), s"$tpe deg=$deg") }
    // every non-isolated node lands in exactly one histogram cell
    assert(got.map(_._3).sum == degByNode.size.toLong)
    // edge mass: sum(deg * n_nodes) equals the directed edge count
    assert(got.map(r => r._2 * r._3).sum == edges.size.toLong)
  }

  /** Driver-side replica of per-node triangle counts: canonical a<b<c
    * enumeration over an undirected edge set — independent of the
    * engine's degree-ordered orientation. */
  private def triReplica(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val es = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val counts = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for ((a, b) <- es; c <- es.collect { case (`b`, x) => x }
         if es.contains((a, c))) {
      counts(a) += 1; counts(b) += 1; counts(c) += 1
    }
    counts.toMap
  }

  test("triangles (x116) on a hand graph: shared-edge triangles counted per corner") {
    // two triangles sharing edge (2,3), plus a triangle-free edge (5,6)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L), (5L, 6L))
      .toDF("a", "b")
    val got = LinkAnalysis.triangles(edges)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
  }

  test("triangles (x116): degree-ordered orientation matches the canonical replica on real data") {
    val edges = LinkAnalysis.copurchaseEdges(spark, sf, minSupport = 1)
    val collected = edges.as[(Long, Long)].collect().toSeq
    val want = triReplica(collected)
    val got = LinkAnalysis.triangles(edges).as[(Long, Long)].collect().toMap
    assert(got == want, s"sizes got=${got.size} want=${want.size}")
    assert(got.nonEmpty, "sf0.001 support-1 graph should contain triangles")
    // corner mass: total corners = 3 × triangle count
    assert(got.values.sum % 3 == 0)
  }

  test("kcore (x122) on a hand graph: pendants peel, the triangle survives with exact degrees") {
    // triangle {1,2,3} + chain 3-4-5 + pendant 6 off the triangle
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L), (2L, 6L))
      .toDF("a", "b")
    val got = LinkAnalysis.kcore(edges, k = 2, rounds = 3)
      .as[(Long, Long)].collect().toMap
    // round 1 drops 5 and 6; round 2 drops 4; the 2-core is the triangle
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("kcore (x122): pinned rounds reach the fixpoint on real data") {
    val edges = LinkAnalysis.copurchaseEdges(spark, sf, minSupport = 1)
    val pinned = LinkAnalysis.kcore(edges, LinkAnalysis.KCoreK, LinkAnalysis.KCoreRounds)
      .as[(Long, Long)].collect().toMap
    val deeper = LinkAnalysis.kcore(edges, LinkAnalysis.KCoreK, LinkAnalysis.KCoreRounds + 3)
      .as[(Long, Long)].collect().toMap
    assert(pinned == deeper, "pinned round count must already be the fixpoint here")
    assert(pinned.nonEmpty)
    // every survivor keeps degree ≥ k at the fixpoint
    assert(pinned.values.forall(_ >= LinkAnalysis.KCoreK))
  }

  test("pageRank at 10 iterations: checkpointed rounds stay replica-exact, bounded plan") {
    // deep-iteration hygiene (round-7 advice): lineage truncates every
    // PrCheckpointEvery rounds, and the truncation must not change a bit
    val fwd = (1L to 4L).map(c => (c * 2, 3L)) ++ Seq((2L, 5L), (4L, 5L), (6L, 7L))
    val edges = (fwd ++ fwd.map(_.swap)).toDF("src", "dst")
    assert(10 > LinkAnalysis.PrCheckpointEvery, "test must cross a checkpoint round")
    val out = LinkAnalysis.pageRank(edges, iters = 10)
      .select($"node_type", $"node_key", $"rank_pts")
      .as[(String, Long, Long)].collect()
    val want = replica(fwd ++ fwd.map(_.swap), 10)
    assert(out.nonEmpty)
    out.foreach { case (tpe, key, rank) =>
      val node = if (tpe == "customer") key * 2 else key * 2 + 1
      assert(rank == want(node), s"$tpe $key at 10 iters")
    }
  }

  test("bfsHops (x151): hop labels match a driver-side BFS on real data") {
    val edges = LinkAnalysis.copurchaseEdges(spark, sf)
      .as[(Long, Long)].collect().toSeq
    val adj = (edges ++ edges.map(_.swap))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val brandByPart = graft.Tables.part(spark, sf)
      .select($"p_partkey", $"p_brand").as[(Long, String)].collect().toSeq
    val sources = brandByPart
      .filter(_._2 == LinkAnalysis.BfsSourceBrand).map(_._1).toSet
    assert(sources.nonEmpty, "pinned source brand must exist at sf0.001")
    var dist = sources.map(_ -> 0L).toMap
    var frontier = sources
    for (i <- 1 to LinkAnalysis.BfsMaxHops) {
      val next = frontier.flatMap(n => adj.getOrElse(n, Set.empty[Long]))
        .diff(dist.keySet)
      dist ++= next.map(_ -> i.toLong)
      frontier = next
    }
    val got = LinkAnalysis.bfsHops(spark, sf).as[(Long, String, Long)].collect()
    assert(got.length == dist.size && got.nonEmpty)
    val bmap = brandByPart.toMap
    got.foreach { case (p, b, d) =>
      assert(d == dist(p), s"part $p dist")
      assert(b == bmap(p), s"part $p brand")
    }
    // the frontier actually expands: some node sits beyond hop 0, and
    // distances are minimal (no node at hop i lacks a hop-(i-1) neighbor)
    assert(got.exists(_._3 > 0))
    got.filter(_._3 > 0).foreach { case (p, _, d) =>
      assert(adj(p).exists(n => dist.getOrElse(n, Long.MaxValue) == d - 1),
        s"part $p minimality")
    }
  }

  test("assocRules (x153): support/confidence/lift match an exhaustive driver replay") {
    val op = graft.Tables.lineitem(spark, sf)
      .select($"l_orderkey", $"l_partkey").as[(Long, Long)].collect().toSeq.distinct
    val byOrder = op.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val nOrders = byOrder.size.toLong
    val partCount = op.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val pairCounts = byOrder.values.toSeq.flatMap { ps =>
      val s = ps.toSeq.sorted
      for (i <- s.indices; j <- i + 1 until s.size) yield (s(i), s(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
      .filter(_._2 >= LinkAnalysis.AssocMinSupport)
    val got = LinkAnalysis.assocRules(spark, sf)
      .select($"a", $"b", $"n_ab", $"n_a", $"n_b", $"n_orders",
        $"conf_a_b_ppm", $"conf_b_a_ppm",
        $"lift_num".cast("string"), $"lift_den".cast("string"))
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, String, String)]
      .collect()
    assert(got.length == pairCounts.size && got.nonEmpty)
    got.foreach { case (a, b, nab, na, nb, n, cab, cba, ln, ld) =>
      assert(nab == pairCounts((a, b)), s"($a,$b) support")
      assert(na == partCount(a) && nb == partCount(b), s"($a,$b) part counts")
      assert(n == nOrders)
      assert(cab == 1000000L * nab / na && cba == 1000000L * nab / nb)
      assert(BigInt(ln) == BigInt(nab) * n && BigInt(ld) == BigInt(na) * nb)
    }
    // a frequent pair beats independence somewhere: lift > 1 exists
    assert(got.exists(r => BigInt(r._9) > BigInt(r._10)))
  }

  test("labelPropagation (x164): synchronous rounds match a driver replica; total tie-break") {
    val edges = LinkAnalysis.copurchaseEdges(spark, sf).as[(Long, Long)].collect().toSeq
    val adj = (edges ++ edges.map(_.swap))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var labels = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to LinkAnalysis.LpaRounds) {
      labels = adj.map { case (n, nbrs) =>
        val counts = nbrs.map(labels).groupBy(identity).view.mapValues(_.size).toMap
        n -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    val sizes = labels.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = LinkAnalysis.labelPropagation(spark, sf)
      .as[(Long, String, Long, Long)].collect()
    assert(got.length == labels.size && got.nonEmpty)
    got.foreach { case (p, _, community, size) =>
      assert(community == labels(p), s"part $p label")
      assert(size == sizes(labels(p)), s"part $p size")
    }
    // communities actually formed: fewer labels than nodes, and some
    // community holds more than one member
    assert(sizes.size < labels.size && sizes.values.max > 1L)
  }

  test("commonNeighbors (x171): candidate pairs match an exhaustive driver replay") {
    val edges = LinkAnalysis.copurchaseEdges(spark, sf).as[(Long, Long)].collect().toSeq
    val edgeSet = edges.toSet
    val adj = (edges ++ edges.map(_.swap))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val deg = adj.view.mapValues(_.size.toLong).toMap
    val want = (for {
      (w, ns) <- adj.toSeq; u <- ns; v <- ns
      if u < v && !edgeSet.contains((u, v))
    } yield (u, v)).groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= LinkAnalysis.CnMinCount).toMap
    val got = LinkAnalysis.commonNeighbors(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { case (u, v, cn, du, dv) =>
      assert(cn == want((u, v)), s"pair ($u,$v) count")
      assert(du == deg(u) && dv == deg(v), s"pair ($u,$v) degrees")
      assert(!edgeSet.contains((u, v)), s"pair ($u,$v) must be a non-edge")
    }
  }

  test("clusteringCoefficients (x172): rational and double match a driver replay; cc in [0,1]") {
    val edges = LinkAnalysis.copurchaseEdges(spark, sf).as[(Long, Long)].collect().toSeq
    val adj = (edges ++ edges.map(_.swap))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val tri = adj.map { case (n, ns) =>
      n -> ns.toSeq.combinations(2).count { case Seq(x, y) =>
        adj(x).contains(y)
      }.toLong
    }
    val got = LinkAnalysis.clusteringCoefficients(spark, sf)
      .as[(Long, String, Long, Long, Long, Long, Double)].collect()
    assert(got.length == adj.count(_._2.size >= 2) && got.nonEmpty)
    got.foreach { case (p, _, deg, nt, num, den, cc) =>
      assert(deg == adj(p).size.toLong, s"part $p degree")
      assert(nt == tri(p), s"part $p triangles")
      assert(num == 2 * nt && den == deg * (deg - 1), s"part $p rational")
      assert(cc == num.toDouble / den.toDouble && cc >= 0.0 && cc <= 1.0)
    }
    // triangles exist somewhere: some node has cc > 0
    assert(got.exists(_._7 > 0.0))
  }

  test("weightedPageRank (x180): exact match with a driver-side integer replica") {
    val op = graft.Tables.lineitem(spark, sf)
      .select($"l_orderkey", $"l_partkey").distinct()
      .as[(Long, Long)].collect().toSeq
    val pairW = op.groupBy(_._1).values.flatMap { rows =>
      rows.map(_._2).distinct.sorted.combinations(2).map { case Seq(a, b) => (a, b) }
    }.toSeq.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= LinkAnalysis.TriMinSupport).toSeq
    val sym = pairW.flatMap { case ((a, b), w) => Seq((a, b, w), (b, a, w)) }
    val wout = sym.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    var ranks = wout.keys.map(_ -> LinkAnalysis.PrUnit).toMap
    val base = LinkAnalysis.PrUnit -
      LinkAnalysis.PrUnit * LinkAnalysis.PrDampPct / 100
    for (_ <- 1 to LinkAnalysis.PrIters) {
      val sums = sym.groupBy(_._2).view.mapValues(
        _.map { case (s, _, w) => ranks(s) * w / wout(s) }.sum).toMap
      ranks = sums.map { case (n, s) =>
        n -> (base + LinkAnalysis.PrDampPct * s / 100)
      }
    }
    val got = LinkAnalysis.weightedPageRank(spark, sf)
      .as[(Long, String, Long, Long)].collect()
    assert(got.length == ranks.size && got.nonEmpty)
    got.foreach { case (p, _, w, r) =>
      assert(w == wout(p), s"part $p w_out")
      assert(r == ranks(p), s"part $p rank")
    }
    // weighting matters on this graph: some node's weighted rank differs
    // from what the UNWEIGHTED recurrence would give it
    var uranks = wout.keys.map(_ -> LinkAnalysis.PrUnit).toMap
    val udeg = sym.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    for (_ <- 1 to LinkAnalysis.PrIters) {
      val sums = sym.groupBy(_._2).view.mapValues(
        _.map { case (s, _, _) => uranks(s) / udeg(s) }.sum).toMap
      uranks = sums.map { case (n, s) =>
        n -> (base + LinkAnalysis.PrDampPct * s / 100)
      }
    }
    assert(ranks.exists { case (n, r) => uranks(n) != r })
  }

  test("linkScores (x177): Jaccard rational and RA sum match an exhaustive driver replay") {
    val edges = LinkAnalysis.copurchaseEdges(spark, sf).as[(Long, Long)].collect().toSeq
    val edgeSet = edges.toSet
    val adj = (edges ++ edges.map(_.swap))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val deg = adj.view.mapValues(_.size.toLong).toMap
    val cand = (for {
      (w, ns) <- adj.toSeq; u <- ns; v <- ns
      if u < v && !edgeSet.contains((u, v))
    } yield ((u, v), w)).groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      .filter(_._2.size >= LinkAnalysis.CnMinCount)
    val got = LinkAnalysis.linkScores(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long, Double, Long)].collect()
    assert(got.length == cand.size && got.nonEmpty)
    got.foreach { case (u, v, cn, du, dv, jden, jac, ra) =>
      val centers = cand((u, v))
      assert(cn == centers.size.toLong, s"pair ($u,$v) count")
      assert(du == deg(u) && dv == deg(v), s"pair ($u,$v) degrees")
      assert(jden == du + dv - cn, s"pair ($u,$v) jac_den")
      assert(jac == cn.toDouble / jden.toDouble, s"pair ($u,$v) jaccard")
      assert(ra == centers.map(w => LinkAnalysis.RaScale / deg(w)).sum,
        s"pair ($u,$v) resource allocation")
    }
    // the ranking actually discriminates: scores are not all identical
    assert(got.map(_._8).distinct.length > 1 || got.length == 1)
  }

  test("degreeAssortativity (x173): moments match a BigInt replay over distinct pairs") {
    val pairs = graft.Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_custkey")
      .join(graft.Tables.lineitem(spark, sf).select($"l_orderkey", $"l_suppkey"),
        $"o_orderkey" === $"l_orderkey")
      .select($"o_custkey", $"l_suppkey").distinct()
      .as[(Long, Long)].collect().toSeq
    val dc = pairs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val ds = pairs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val xy = pairs.map { case (c, s) => (BigInt(dc(c)), BigInt(ds(s))) }
    val got = LinkAnalysis.degreeAssortativity(spark, sf)
      .as[(Long, String, String, String, String, String)].head()
    assert(got._1 == pairs.size.toLong)
    assert(BigInt(got._2) == xy.map(_._1).sum && BigInt(got._3) == xy.map(_._2).sum)
    assert(BigInt(got._4) == xy.map(p => p._1 * p._2).sum)
    assert(BigInt(got._5) == xy.map(p => p._1 * p._1).sum)
    assert(BigInt(got._6) == xy.map(p => p._2 * p._2).sum)
  }

  test("reachabilityPanel (x214): per-source hop counts match a driver BFS replay") {
    val edges = LinkAnalysis.copurchaseEdges(spark, sf)
      .as[(Long, Long)].collect()
    val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val deg = adj.view.mapValues(_.size.toLong).toMap
    val sources = deg.toSeq.sortBy { case (n, d) => (-d, n) }
      .take(LinkAnalysis.ReachSources).map(_._1)
    val want = sources.flatMap { s =>
      var visited = Map(s -> 0L)
      var frontier = Set(s)
      for (i <- 1 to LinkAnalysis.BfsMaxHops) {
        val next = frontier.flatMap(adj.getOrElse(_, Set.empty)) -- visited.keySet
        visited ++= next.map(_ -> i.toLong)
        frontier = next
      }
      visited.groupBy(_._2).map { case (d, m) => (s, d) -> m.size.toLong }
    }.toMap
    val got = LinkAnalysis.reachabilityPanel(spark, sf)
      .as[(Long, Long, Long)].collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { case (s, d, n) => assert(want((s, d)) == n, s"src $s dist $d") }
    // sources really are the hubs: hop-1 reach equals their degree
    got.filter(_._2 == 1L).foreach { case (s, _, n) => assert(n == deg(s)) }
  }

  test("knnTruss (x198): peel matches a driver replay and reaches its fixpoint") {
    val mutual = Similarity.mutualTopK(spark, sf, KnnStage.StageK)
      .select($"u", $"v").as[(Long, Long)].collect().toSet
    def peel(edges: Set[(Long, Long)]): (Set[(Long, Long)], Map[(Long, Long), Long]) = {
      val adj = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val sup = edges.map(e => e -> (adj(e._1) & adj(e._2)).size.toLong).toMap
      (sup.filter(_._2 >= LinkAnalysis.KnnTrussK - 2).keySet, sup)
    }
    var e = mutual
    var lastSup = Map.empty[(Long, Long), Long]
    for (_ <- 1 to LinkAnalysis.KnnTrussRounds) {
      val (kept, sup) = peel(e)
      lastSup = sup.filter { case (ed, s) => kept(ed) }; e = kept
    }
    // fixpoint: one more round changes nothing at this SF
    assert(peel(e)._1 == e)
    val labels = graft.Tables.embeddings(spark, sf)
      .select($"vec_id", $"label").as[(Long, Int)].collect().toMap
    val got = LinkAnalysis.knnTruss(spark, sf)
      .as[(Long, Long, Long, Int, Int)].collect()
    assert(got.length == e.size && got.nonEmpty)
    got.foreach { case (a, b, s, la, lb) =>
      assert(lastSup((a, b)) == s && labels(a) == la && labels(b) == lb, s"edge ($a,$b)")
    }
  }

  test("lpaCommunities (x290): exact match with a driver-side integer replica") {
    val pairs = graft.operators.GraphStage.copurchasePairs(spark, sf)
      .as[(Long, Long, Long)].collect().toSeq
    val sym = pairs.flatMap { case (a, b, w) => Seq((a, b, w), (b, a, w)) }
    val cap = LinkAnalysis.LpaLabelCap
    var labels = sym.map(_._1).distinct.map(n => n -> n).toMap
    for (_ <- 1 to LinkAnalysis.LpaIters) {
      labels = sym.groupBy(_._2).view.mapValues { in =>
        val scores = in.groupBy(e => labels(e._1)).view
          .mapValues(_.map(_._3).sum).toMap
        // packed argmax: (score desc, label asc)
        val packed = scores.map { case (l, s) => s * cap + (cap - 1 - l) }.max
        cap - 1 - packed % cap
      }.toMap
    }
    val got = LinkAnalysis.lpaCommunities(spark, sf)
      .as[(Long, Long)].collect()
    assert(got.length == labels.size && got.nonEmpty)
    got.foreach { case (n, c) => assert(c == labels(n), s"node $n") }
    // communities are coarser than self-labels but finer than one blob
    val nComm = got.map(_._2).distinct.length
    assert(nComm > 1 && nComm < got.length)
  }

  test("lpaCommunityCensus (x291): census consistent with the fit and the pair table") {
    val fit = LinkAnalysis.lpaCommunities(spark, sf)
      .as[(Long, Long)].collect().toMap
    val pairs = graft.operators.GraphStage.copurchasePairs(spark, sf)
      .as[(Long, Long, Long)].collect().toSeq
    val internal = pairs.filter { case (a, b, _) => fit(a) == fit(b) }
      .groupBy { case (a, _, _) => fit(a) }.view.mapValues(_.map(_._3).sum).toMap
    val boundary = pairs.filter { case (a, b, _) => fit(a) != fit(b) }
      .flatMap { case (a, b, w) => Seq(fit(a) -> w, fit(b) -> w) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val sizes = fit.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = LinkAnalysis.lpaCommunityCensus(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.length == sizes.size && got.nonEmpty)
    got.foreach { case (c, n, iw, bw, share) =>
      assert(n == sizes(c) && iw == internal.getOrElse(c, 0L) &&
        bw == boundary.getOrElse(c, 0L), s"community $c")
      assert(share == iw * 1000000L / math.max(iw + bw, 1L))
    }
    // the census really separates cores from bridges at this SF
    assert(got.exists(_._5 == 1000000L) || got.exists(_._5 < 1000000L))
  }

  test("LPA differs from connected components: a weak bridge does not merge " +
    "two support-heavy communities") {
    // two triangles (support 10) joined by one weak bridge (support 1):
    // CC would produce ONE component; LPA keeps two label camps
    val tri = Seq((1L, 2L, 10L), (2L, 3L, 10L), (1L, 3L, 10L),
      (11L, 12L, 10L), (12L, 13L, 10L), (11L, 13L, 10L), (3L, 11L, 1L))
    val sym = tri.flatMap { case (a, b, w) => Seq((a, b, w), (b, a, w)) }
    val cap = LinkAnalysis.LpaLabelCap
    var labels = sym.map(_._1).distinct.map(n => n -> n).toMap
    for (_ <- 1 to LinkAnalysis.LpaIters) {
      labels = sym.groupBy(_._2).view.mapValues { in =>
        val scores = in.groupBy(e => labels(e._1)).view
          .mapValues(_.map(_._3).sum).toMap
        val packed = scores.map { case (l, s) => s * cap + (cap - 1 - l) }.max
        cap - 1 - packed % cap
      }.toMap
    }
    assert(labels.values.toSet.size == 2)
    assert(Set(1L, 2L, 3L).map(labels) != Set(11L, 12L, 13L).map(labels))
  }

  test("semanticLpa (x292): exact match with the driver replica on the mutual-kNN graph") {
    val k = graft.operators.KnnStage.StageK
    val pairs = Similarity.mutualTopK(spark, sf, k)
      .select($"u", $"v",
        org.apache.spark.sql.functions.expr(s"${k + 1}L - greatest(rank_uv, rank_vu)"))
      .as[(Long, Long, Long)].collect().toSeq
    val sym = pairs.flatMap { case (a, b, w) => Seq((a, b, w), (b, a, w)) }
    val cap = LinkAnalysis.LpaLabelCap
    var labels = sym.map(_._1).distinct.map(n => n -> n).toMap
    for (_ <- 1 to LinkAnalysis.LpaIters) {
      labels = sym.groupBy(_._2).view.mapValues { in =>
        val scores = in.groupBy(e => labels(e._1)).view
          .mapValues(_.map(_._3).sum).toMap
        val packed = scores.map { case (l, s) => s * cap + (cap - 1 - l) }.max
        cap - 1 - packed % cap
      }.toMap
    }
    val trueLabels = graft.Tables.embeddings(spark, sf)
      .select($"vec_id", $"label").as[(Long, Int)].collect().toMap
    val got = LinkAnalysis.semanticLpa(spark, sf)
      .as[(Long, Int, Long)].collect()
    assert(got.length == labels.size && got.nonEmpty)
    got.foreach { case (v, tl, c) =>
      assert(c == labels(v) && tl == trueLabels(v), s"vec $v")
    }
  }

  test("semanticLpaPurity (x293): census consistent with the x292 fit; " +
    "propagation beats the random-label purity floor") {
    val fit = LinkAnalysis.semanticLpa(spark, sf)
      .as[(Long, Int, Long)].collect().toSeq
    val byComm = fit.groupBy(_._3)
    val got = LinkAnalysis.semanticLpaPurity(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(got.length == byComm.size && got.nonEmpty)
    got.foreach { case (c, n, dl, ml, mn, pur) =>
      val members = byComm(c)
      assert(n == members.size)
      val hist = members.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      assert(dl == hist.size)
      val (wantLabel, wantN) = hist.toSeq.maxBy { case (l, cnt) => (cnt, -l) }
      assert(ml == wantLabel && mn == wantN, s"community $c majority")
      assert(pur == wantN * 1000000L / n)
    }
    // weighted majority purity must beat the 10-label uniform floor
    val overall = got.map(r => r._5).sum * 1000000L / got.map(r => r._2).sum
    assert(overall > 100000L, s"overall purity $overall")
  }
}
