package graft.operators

import graft.SparkSpec

/** PQ codebook training / encoding / ADC (x272) and the distortion
  * ledger (x273). The oracle gate replays the whole integer pipeline in
  * DuckDB; these specs pin the engine-side invariants the SQL replay
  * can't see — determinism across runs, a driver-side ADC recompute from
  * the fitted codebook, and the ledger's ordering invariant. */
class ProductQuantSpec extends SparkSpec {

  val sf = "/root/testdata/sf0.001"

  test("trainCodebook: deterministic, full M×K grid, SubDim-wide centroids") {
    val cb1 = ProductQuant.trainCodebookUncached(spark, sf)
    val cb2 = ProductQuant.trainCodebookUncached(spark, sf)
    assert(cb1 == cb2, "integer Lloyd must be run-to-run deterministic")
    assert(ProductQuant.trainCodebook(spark, sf) == cb1,
      "memoized codebook must equal a fresh fit")
    assert(cb1.size == ProductQuant.PqSubspaces * ProductQuant.PqCodes)
    assert(cb1.map(c => (c._1, c._2)).toSet ==
      (for (m <- 0 until ProductQuant.PqSubspaces;
            c <- 0 until ProductQuant.PqCodes) yield (m, c)).toSet)
    assert(cb1.forall(_._3.length == ProductQuant.PqSubDim))
    // Lloyd moved the centroids off their init (vector c's m-th slice) —
    // a frozen codebook would make the ADC gate vacuous
    val sub0 = ProductQuant.encode(spark, sf, cb1)
    assert(sub0.count() > 0)
  }

  test("encode: M codes per vector, all in [0, K)") {
    val cb = ProductQuant.trainCodebook(spark, sf)
    val enc = ProductQuant.encode(spark, sf, cb)
    import spark.implicits._
    val rows = enc.as[(Long, Int, Int)].collect()
    val n = graft.Tables.embeddings(spark, sf).count()
    assert(rows.length == n * ProductQuant.PqSubspaces)
    assert(rows.forall { case (_, _, c) => c >= 0 && c < ProductQuant.PqCodes })
    assert(rows.groupBy(_._1).forall(_._2.map(_._2).sorted.toSeq ==
      (0 until ProductQuant.PqSubspaces)))
  }

  test("pqAdcTopK (x272): k rows per query, and ADC distances recompute " +
    "from the codebook") {
    import spark.implicits._
    val k = ProductQuant.PqTopK
    val got = ProductQuant.pqAdcTopK(spark, sf)
      .as[(Long, Long, Long, Int)].collect()
    val qs = got.map(_._1).distinct
    assert(qs.length == ProductQuant.PqQHi)
    qs.foreach { q =>
      val mine = got.filter(_._1 == q).sortBy(_._4)
      assert(mine.map(_._4).toSeq == (1 to k), s"ranks for q=$q")
      assert(mine.map(_._3).toSeq == mine.map(_._3).sorted.toSeq,
        s"adc_dist must be nondecreasing in rank for q=$q")
    }
    // independent driver-side recompute: quantize + encode + LUT by hand
    val cb = ProductQuant.trainCodebook(spark, sf)
      .map(c => ((c._1, c._2), c._3.toArray)).toMap
    val vecs = graft.Tables.embeddings(spark, sf)
      .selectExpr("vec_id",
        s"transform(embedding, x -> cast(round(cast(x as double) * ${ProductQuant.PqScale}) as long)) as qv")
      .as[(Long, Seq[Long])].collect().toMap
    def sub(v: Seq[Long], m: Int): Array[Long] =
      v.slice(m * ProductQuant.PqSubDim, (m + 1) * ProductQuant.PqSubDim).toArray
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def code(v: Seq[Long], m: Int): Int =
      (0 until ProductQuant.PqCodes)
        .map(c => (d2(sub(v, m), cb((m, c))), c)).min._2
    got.foreach { case (q, v, adc, _) =>
      val expect = (0 until ProductQuant.PqSubspaces)
        .map(m => d2(sub(vecs(q), m), cb((m, code(vecs(v), m))))).sum
      assert(adc == expect, s"ADC mismatch for (q=$q, vec=$v)")
    }
  }

  test("ivfPqTopK (x274): k rows per query; probing only loses, never " +
    "changes, ADC distances") {
    import spark.implicits._
    val k = ProductQuant.PqTopK
    val ivf = ProductQuant.ivfPqTopK(spark, sf)
      .as[(Long, Long, Long, Int)].collect()
    val full = ProductQuant.pqAdcTopK(spark, sf)
      .as[(Long, Long, Long, Int)].collect()
    val qs = ivf.map(_._1).distinct
    assert(qs.length == ProductQuant.PqQHi)
    qs.foreach { q =>
      val mine = ivf.filter(_._1 == q).sortBy(_._4)
      assert(mine.map(_._4).toSeq == (1 to k), s"ranks for q=$q")
      // the probed candidate set is a subset of the corpus, so at every
      // rank the restricted top-k distance is ≥ the full scan's
      val fq = full.filter(_._1 == q).sortBy(_._4)
      mine.zip(fq).foreach { case ((_, _, d, r), (_, _, fd, _)) =>
        assert(d >= fd, s"q=$q rank=$r: pruned $d < full $fd")
      }
    }
    // same codebook ⇒ a pair surviving both scans carries the SAME ADC
    val fullMap = full.map(t => ((t._1, t._2), t._3)).toMap
    val common = ivf.flatMap(t => fullMap.get((t._1, t._2)).map(fd => (t._3, fd)))
    assert(common.nonEmpty, "probe set shares nothing with the full top-k")
    common.foreach { case (d, fd) => assert(d == fd, "ADC must be scan-invariant") }
  }

  test("pqAdcTopKAgg (x276): bit-identical to the window form, no Window " +
    "in the plan") {
    import spark.implicits._
    val agg = ProductQuant.pqAdcTopKAgg(spark, sf)
      .as[(Long, Long, Long, Int)].collect().toSet
    val win = ProductQuant.pqAdcTopK(spark, sf)
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(agg == win && agg.nonEmpty)
    // the point of the aggregate: the second full candidate shuffle+sort
    // (the rank window) is gone, replaced by a partial-combining pair
    val plan = ProductQuant.pqAdcTopKAgg(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"agg form must not plan a Window:\n$plan")
    assert(plan.contains("ObjectHashAggregate"),
      s"expected the TypedImperativeAggregate pair:\n$plan")
    assert(ProductQuant.pqAdcTopK(spark, sf)
      .queryExecution.executedPlan.toString.contains("Window"))
  }

  test("pqProdAdcTopK (x283): production geometry M=8/K=64 — full grid, " +
    "ADC recomputes from the prod codebook, Window-free plan") {
    import spark.implicits._
    import ProductQuant.{PqProdCodes, PqProdSubDim, PqProdSubspaces}
    // geometry invariant at the production shape: the fit really is
    // 8×64 centroids of width 8 (M·subDim = the embedding dim)
    val cbRows = ProductQuant.trainCodebook(spark, sf,
      PqProdSubspaces, PqProdSubDim, PqProdCodes)
    assert(cbRows.size == PqProdSubspaces * PqProdCodes)
    assert(cbRows.forall(_._3.length == PqProdSubDim))
    val k = ProductQuant.PqTopK
    val got = ProductQuant.pqProdAdcTopK(spark, sf)
      .as[(Long, Long, Long, Int)].collect()
    val qs = got.map(_._1).distinct
    assert(qs.length == ProductQuant.PqQHi)
    qs.foreach { q =>
      val mine = got.filter(_._1 == q).sortBy(_._4)
      assert(mine.map(_._4).toSeq == (1 to k), s"ranks for q=$q")
      assert(mine.map(_._3).toSeq == mine.map(_._3).sorted.toSeq,
        s"adc_dist must be nondecreasing in rank for q=$q")
    }
    // independent driver-side recompute at the PRODUCTION shape — the
    // x272 replay with only the geometry constants swapped
    val cb = cbRows.map(c => ((c._1, c._2), c._3.toArray)).toMap
    val vecs = graft.Tables.embeddings(spark, sf)
      .selectExpr("vec_id",
        s"transform(embedding, x -> cast(round(cast(x as double) * ${ProductQuant.PqScale}) as long)) as qv")
      .as[(Long, Seq[Long])].collect().toMap
    def sub(v: Seq[Long], m: Int): Array[Long] =
      v.slice(m * PqProdSubDim, (m + 1) * PqProdSubDim).toArray
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def code(v: Seq[Long], m: Int): Int =
      (0 until PqProdCodes)
        .map(c => (d2(sub(v, m), cb((m, c))), c)).min._2
    got.foreach { case (q, v, adc, _) =>
      val expect = (0 until PqProdSubspaces)
        .map(m => d2(sub(vecs(q), m), cb((m, code(vecs(v), m))))).sum
      assert(adc == expect, s"prod ADC mismatch for (q=$q, vec=$v)")
    }
    // the shipping form: bounded aggregate, never a rank window
    val plan = ProductQuant.pqProdAdcTopK(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"x283 must not plan a Window:\n$plan")
    // production geometry separates from the toy one on this corpus:
    // at least one (q, vec) pick or distance differs from x276's board
    val toy = ProductQuant.pqAdcTopKAgg(spark, sf)
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(got.toSet != toy, "prod geometry must not alias the gate geometry")
  }

  test("pqProdAdcTopK at FULL production K=256 (x285): full 8×256 grid, " +
    "ADC recomputes from the K=256 codebook, separates from K=64") {
    import spark.implicits._
    import ProductQuant.{PqFullCodes, PqProdSubDim, PqProdSubspaces}
    val cbRows = ProductQuant.trainCodebook(spark, sf,
      PqProdSubspaces, PqProdSubDim, PqFullCodes)
    assert(cbRows.size == PqProdSubspaces * PqFullCodes)
    assert(cbRows.forall(_._3.length == PqProdSubDim))
    val k = ProductQuant.PqTopK
    val got = ProductQuant.pqProdAdcTopK(spark, sf, codes = PqFullCodes)
      .as[(Long, Long, Long, Int)].collect()
    assert(got.map(_._1).distinct.length == ProductQuant.PqQHi)
    got.groupBy(_._1).foreach { case (q, rows) =>
      val mine = rows.sortBy(_._4)
      assert(mine.map(_._4).toSeq == (1 to k), s"ranks for q=$q")
      assert(mine.map(_._3).toSeq == mine.map(_._3).sorted.toSeq,
        s"adc_dist must be nondecreasing in rank for q=$q")
    }
    // independent driver-side recompute at K=256 — the x283 replay with
    // only the code count moved
    val cb = cbRows.map(c => ((c._1, c._2), c._3.toArray)).toMap
    val vecs = graft.Tables.embeddings(spark, sf)
      .selectExpr("vec_id",
        s"transform(embedding, x -> cast(round(cast(x as double) * ${ProductQuant.PqScale}) as long)) as qv")
      .as[(Long, Seq[Long])].collect().toMap
    def sub(v: Seq[Long], m: Int): Array[Long] =
      v.slice(m * PqProdSubDim, (m + 1) * PqProdSubDim).toArray
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def code(v: Seq[Long], m: Int): Int =
      (0 until PqFullCodes)
        .map(c => (d2(sub(v, m), cb((m, c))), c)).min._2
    got.foreach { case (q, v, adc, _) =>
      val expect = (0 until PqProdSubspaces)
        .map(m => d2(sub(vecs(q), m), cb((m, code(vecs(v), m))))).sum
      assert(adc == expect, s"K=256 ADC mismatch for (q=$q, vec=$v)")
    }
    // the shipping form stays Window-free, and K=256 must genuinely
    // refine the quantization vs the gated K=64 board on this corpus
    val plan = ProductQuant.pqProdAdcTopK(spark, sf, codes = PqFullCodes)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"x285 must not plan a Window:\n$plan")
    val k64 = ProductQuant.pqProdAdcTopK(spark, sf)
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(got.toSet != k64, "K=256 must not alias the K=64 geometry")
  }

  test("ivfPqTopK at FULL production K=256 (x286): probing only loses, " +
    "never changes, K=256 ADC distances") {
    import spark.implicits._
    import ProductQuant.{PqFullCodes, PqProdSubDim, PqProdSubspaces}
    val k = ProductQuant.PqTopK
    val ivf = ProductQuant.ivfPqTopK(spark, sf,
        subspaces = PqProdSubspaces, subDim = PqProdSubDim, codes = PqFullCodes)
      .as[(Long, Long, Long, Int)].collect()
    val full = ProductQuant.pqProdAdcTopK(spark, sf, codes = PqFullCodes)
      .as[(Long, Long, Long, Int)].collect()
    assert(ivf.map(_._1).distinct.length == ProductQuant.PqQHi)
    ivf.groupBy(_._1).foreach { case (q, rows) =>
      val mine = rows.sortBy(_._4)
      assert(mine.map(_._4).toSeq == (1 to k), s"ranks for q=$q")
      val fq = full.filter(_._1 == q).sortBy(_._4)
      mine.zip(fq).foreach { case ((_, _, d, r), (_, _, fd, _)) =>
        assert(d >= fd, s"q=$q rank=$r: pruned $d < full $fd")
      }
    }
    val fullMap = full.map(t => ((t._1, t._2), t._3)).toMap
    val common = ivf.flatMap(t => fullMap.get((t._1, t._2)).map(fd => (t._3, fd)))
    assert(common.nonEmpty, "probe set shares nothing with the full top-k")
    common.foreach { case (d, fd) => assert(d == fd, "ADC must be scan-invariant") }
  }

  test("ivfPqTopK at production geometry (x284): k rows per query; probing " +
    "only loses, never changes, prod-ADC distances") {
    import spark.implicits._
    import ProductQuant.{PqProdCodes, PqProdSubDim, PqProdSubspaces}
    val k = ProductQuant.PqTopK
    val ivf = ProductQuant.ivfPqTopK(spark, sf,
        subspaces = PqProdSubspaces, subDim = PqProdSubDim, codes = PqProdCodes)
      .as[(Long, Long, Long, Int)].collect()
    val full = ProductQuant.pqProdAdcTopK(spark, sf)
      .as[(Long, Long, Long, Int)].collect()
    val qs = ivf.map(_._1).distinct
    assert(qs.length == ProductQuant.PqQHi)
    qs.foreach { q =>
      val mine = ivf.filter(_._1 == q).sortBy(_._4)
      assert(mine.map(_._4).toSeq == (1 to k), s"ranks for q=$q")
      // restricted candidate set ⇒ per-rank distance ≥ the full scan's
      val fq = full.filter(_._1 == q).sortBy(_._4)
      mine.zip(fq).foreach { case ((_, _, d, r), (_, _, fd, _)) =>
        assert(d >= fd, s"q=$q rank=$r: pruned $d < full $fd")
      }
    }
    // same prod codebook ⇒ a pair surviving both scans carries the SAME ADC
    val fullMap = full.map(t => ((t._1, t._2), t._3)).toMap
    val common = ivf.flatMap(t => fullMap.get((t._1, t._2)).map(fd => (t._3, fd)))
    assert(common.nonEmpty, "probe set shares nothing with the full top-k")
    common.foreach { case (d, fd) => assert(d == fd, "ADC must be scan-invariant") }
  }

  test("TopKLongPairs: bounded state, deterministic under any grouping") {
    import graft.functions.TopKLongPairs.top_k_long_pairs
    import spark.implicits._
    // 1000 pairs with duplicate sort keys — ties must break on id; the
    // 2k-bounded buffer compacts many times at k=3
    val df = spark.range(1000).select(
      ($"id" % 7).as("g"),
      ($"id" % 13).cast("long").as("sk"),
      $"id".as("i"))
    def run(parts: Int) = df.repartition(parts)
      .groupBy($"g").agg(top_k_long_pairs($"sk", $"i", 3).as("t"))
      .select($"g", $"t").as[(Long, Seq[(Long, Long)])].collect()
      .map { case (g, t) => (g, t.toList) }.toMap
    val got = run(13)
    assert(got == run(1) && got == run(32))
    // hand replay for one group
    val want = (0L until 1000L).filter(_ % 7 == 2)
      .map(i => (i % 13, i)).sorted.take(3).toList
    assert(got(2L) == want)
  }

  test("pqRerankTopK (x279): exact order inside the pool; recall ≥ raw ADC") {
    import spark.implicits._
    val k = ProductQuant.PqTopK
    val rer = ProductQuant.pqRerankTopK(spark, sf)
      .as[(Long, Long, Long, Int)].collect()
    assert(rer.map(_._1).distinct.length == ProductQuant.PqQHi)
    // exact integer-L2 ground truth per query
    val scale = ProductQuant.PqScale
    val vecs = graft.Tables.embeddings(spark, sf)
      .selectExpr("vec_id",
        s"transform(embedding, x -> cast(round(cast(x as double) * $scale) as long)) as qv")
      .as[(Long, Seq[Long])].collect().toMap
    def d2(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def exactTop(q: Long): Seq[Long] = vecs.keys.filter(_ != q).toSeq
      .map(v => (d2(vecs(q), vecs(v)), v)).sorted.take(k).map(_._2)
    // (a) every reported exact_d2 is the true distance, ranks follow it
    rer.foreach { case (q, v, d, _) => assert(d == d2(vecs(q), vecs(v)), s"($q,$v)") }
    rer.groupBy(_._1).foreach { case (q, rows) =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(r => (r._3, r._2)).toSeq ==
        sorted.map(r => (r._3, r._2)).sorted.toSeq, s"q=$q")
    }
    // (b) the rerank's recall against exact top-k is ≥ raw ADC's per query
    val adc = ProductQuant.pqAdcTopK(spark, sf)
      .as[(Long, Long, Long, Int)].collect()
    rer.map(_._1).distinct.foreach { q =>
      val truth = exactTop(q).toSet
      val rRec = rer.filter(_._1 == q).count(r => truth(r._2))
      val aRec = adc.filter(_._1 == q).count(r => truth(r._2))
      assert(rRec >= aRec, s"q=$q: rerank $rRec < adc $aRec")
    }
  }

  test("pqDistortion (x273): one row per query, overlap ≤ k, " +
    "pq_sum_d2 ≥ exact_sum_d2") {
    import spark.implicits._
    val rows = ProductQuant.pqDistortion(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.length == ProductQuant.PqQHi)
    rows.foreach { case (q, overlap, exactSum, pqSum) =>
      assert(overlap >= 0 && overlap <= ProductQuant.PqTopK, s"q=$q")
      assert(pqSum >= exactSum,
        s"q=$q: the exact top-k minimizes true d2 — pq=$pqSum < exact=$exactSum")
    }
    // the ledger prices a real approximation, but must not be degenerate:
    // across the query panel the ADC picks recover at least one true neighbor
    assert(rows.map(_._2).sum > 0, "zero total overlap — ADC is broken, not lossy")
  }
}
