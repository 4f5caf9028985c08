package graft.operators

import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.components(edges.toDF("u", "v"))
      .as[(Long, Long)].collect().toMap

  test("a 300-node chain collapses to one component within the round budget") {
    // min-label propagation would need 299 rounds here; star contraction
    // converges inside the default 25-round budget — the scale property
    val comp = cc((1L until 300L).map(i => (i, i + 1)))
    assert(comp.size == 300)
    assert(comp.values.toSet == Set(1L))
  }

  test("disjoint cliques keep separate minima; edge orientation is irrelevant") {
    val cliqueA = for (i <- 10L to 13L; j <- 10L to 13L if i < j) yield (j, i) // reversed
    val cliqueB = Seq((20L, 21L), (22L, 21L), (20L, 22L))
    val comp = cc(cliqueA ++ cliqueB)
    assert((10L to 13L).forall(comp(_) == 10L))
    assert((20L to 22L).forall(comp(_) == 20L))
  }

  test("random graph labels match a driver-side union-find reference") {
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(400)((rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
      .filter { case (a, b) => a != b }
    // reference: classic union-find
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = parent.keys.map(k => k -> find(k)).toMap
    val got = cc(edges)
    assert(got == expected)
  }

  test("star-contraction x17 equals the min-label-propagation twin on real near-dups") {
    val sf = "/root/testdata/sf0.001"
    val star = Dedup.nearDupClusters(spark, sf).as[(Long, Long)].collect().toSet
    val prop = Dedup.nearDupClustersPropagation(spark, sf).as[(Long, Long)].collect().toSet
    assert(star == prop)
  }
}
