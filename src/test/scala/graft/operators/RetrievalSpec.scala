package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  /** Driver-side BigInt replica of the scoring algebra in
    * `Retrieval.pointsSqlExpr` — an independent third implementation
    * (besides the Spark plan and the DuckDB oracle) so a shared algebra
    * typo can't self-certify. */
  private def expectedTopK(k: Int): Map[Long, Seq[(Long, Long, Long)]] = {
    val docs = graft.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val toks = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }
    val wTotal = BigInt(toks.map(_._2.size).sum)
    val nDocs = BigInt(docs.length)
    val tf = toks.flatMap { case (id, ws) =>
      ws.groupBy(identity).map { case (w, occ) => (w, id, BigInt(ws.size), BigInt(occ.size)) }
    }
    val dfByTerm = tf.groupBy(_._1).view.mapValues(g => BigInt(g.length)).toMap
    Retrieval.Bm25Queries.map { case (qid, terms) =>
      val perDoc = terms.flatMap { term =>
        tf.filter(_._1 == term).map { case (_, id, dl, f) =>
          val dfv = dfByTerm(term)
          val num = BigInt(Retrieval.Bm25Scale) * 22 * f * wTotal * (2 * (nDocs - dfv) + 1)
          val den = (10 * f * wTotal + 3 * wTotal + 9 * dl * nDocs) * (2 * dfv + 1)
          id -> (num / den) // BigInt / truncates toward zero == div on positives
        }
      }.groupBy(_._1).view
        .mapValues(vs => (vs.map(_._2).sum, BigInt(vs.size))).toSeq
      val ranked = perDoc
        .sortBy { case (id, (score, _)) => (-score, id) }
        .take(k)
        .map { case (id, (score, n)) => (id, n.toLong, score.toLong) }
      qid.toLong -> ranked
    }.toMap
  }

  test("bm25TopK (x73): exact match with an independent BigInt recompute") {
    val k = Retrieval.Bm25TopK
    val got = Retrieval.bm25TopK(spark, sf)
      .select($"query_id", $"rank", $"doc_id", $"n_terms", $"score_pts")
      .as[(Long, Long, Long, Long, Long)].collect()
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(r => (r._3, r._4, r._5)).toSeq).toMap
    val want = expectedTopK(k)
    assert(got.keySet == want.keySet)
    got.foreach { case (qid, rows) =>
      assert(rows == want(qid), s"query $qid")
      assert(rows.size <= k)
    }
    // scores are positive and non-increasing down the ranking
    got.values.foreach { rows =>
      assert(rows.forall(_._3 > 0))
      assert(rows.map(_._3).sliding(2).forall(p => p.size < 2 || p(0) >= p(1)))
    }
  }

  test("pointsSqlExpr monotonicity: rarer terms and higher tf score strictly higher") {
    // drive the actual scoring expression through Spark on synthetic
    // (tf, dl, df) rows: the rational idf must rank a rare-term hit above
    // a common-term hit at equal tf/dl, and more tf must never hurt
    val rows = Seq(
      // (case,        tf, dl,  df)
      ("rare_hit",     1L, 50L, 2L),
      ("common_hit",   1L, 50L, 400L),
      ("tf1",          1L, 50L, 10L),
      ("tf3",          3L, 50L, 10L),
      ("short_doc",    1L, 10L, 10L),
      ("long_doc",     1L, 500L, 10L))
      .toDF("label", "tf", "dl", "df")
      .withColumn("w_total", lit(25000L)).withColumn("n_docs", lit(500L))
    val pts = rows.withColumn("points", expr(Retrieval.pointsSqlExpr))
      .select($"label", $"points").as[(String, Long)].collect().toMap
    assert(pts("rare_hit") > pts("common_hit"))
    assert(pts("tf3") > pts("tf1"))
    assert(pts("short_doc") > pts("long_doc")) // BM25 length normalization
    assert(pts.values.forall(_ > 0))
  }

  test("bm25TopK plan: checkpointed postings, no per-term window, WindowGroupLimit top-k") {
    val q = Retrieval.bm25TopK(spark, sf)
    val plan = q.queryExecution.executedPlan.toString
    // per-query top-k is pruned before the shuffle
    assert(plan.contains("WindowGroupLimit"), plan)
    // postings are localCheckpointed (computed once, feeding df AND the
    // scoring probe side), so the only parquet scan left is the 1-row totals
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"expected 1 scan (totals; postings checkpointed), got $scans\n$plan")
    // the only nested-loop join is the broadcast 1-row totals cross
    val bnl = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(bnl <= 1, plan)
    assert(!plan.contains("SortMergeJoin"), s"no corpus-sized join expected\n$plan")
    // the round-7 skew bound is closed: every window partitions on
    // query_id only — never on term (a stop-word query term would make a
    // per-term window a corpus-sized single-task partition)
    val windows = q.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty, "expected the per-query rank window")
    windows.foreach { w =>
      val refs = w.partitionSpec.flatMap(_.references.toSeq.map(_.name))
      assert(refs.nonEmpty && refs.forall(_ == "query_id"),
        s"window partitioned by $refs\n$plan")
    }
  }

  test("hybridRelated (x239): fusion matches a driver replay; staged-table swap holds") {
    val k = Retrieval.HybridK
    val kRrf = Retrieval.HybridRrfK
    val sem = KnnStage.ranked(spark, sf).as[(Long, Long, Double, Int)]
      .collect().filter(_._4 <= k)
      .map(r => (r._1, r._2) -> r._4.toLong).toMap
    val pairs = Dedup.tfCosinePairs(spark, sf)
      .select($"doc_a", $"doc_b", $"cos_dbl").as[(Long, Long, Double)].collect()
    val symm = pairs.map(p => (p._1, p._2, p._3)) ++ pairs.map(p => (p._2, p._1, p._3))
    val lex = symm.groupBy(_._1).toSeq.flatMap { case (d, rows) =>
      rows.sortBy(r => (-r._3, r._2)).take(k).zipWithIndex
        .map { case ((_, rel, _), i) => (d, rel) -> (i + 1).toLong }
    }.toMap
    val keys = sem.keySet ++ lex.keySet
    val want = keys.map { key =>
      val (rs, rl) = (sem.get(key), lex.get(key))
      val rrf = rs.map(r => 1000000L / (kRrf + r)).getOrElse(0L) +
        rl.map(r => 1000000L / (kRrf + r)).getOrElse(0L)
      key -> (rs.getOrElse(-1L), rl.getOrElse(-1L), rrf)
    }.toMap
    val got = Retrieval.hybridRelated(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { case (d, rel, rs, rl, rrf, _) =>
      assert(want((d, rel)) == ((rs, rl, rrf)), s"pair ($d, $rel)")
    }
    // fused ranks are a permutation of 1..count per doc, and the fusion
    // is genuinely hybrid on this corpus: some pair is surfaced by only
    // one system on each side
    got.groupBy(_._1).foreach { case (d, rows) =>
      assert(rows.map(_._6).sorted.toSeq == (1 to rows.length).map(_.toLong), s"doc $d")
    }
    assert(got.exists(r => r._3 == -1L && r._4 > 0L))
    assert(got.exists(r => r._4 == -1L && r._3 > 0L))
    // the semantic side swaps to the ANN stage like every consumer: at
    // full probe radius the output is identical
    val swapped = Retrieval.hybridRelated(spark, sf,
        rankedTable = (s, d, kk) => AnnStage.ranked(s, d, kk, Similarity.LshPlanes))
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(swapped == got.toSet)
  }

  test("rboWeights: hand-computed k=5 values; telescoping sums to the prefix form") {
    val (w, den) = Retrieval.rboWeights(5)
    // L = lcm(1..5) = 60, den = 2^5·60; term(d) = 2^(5-d)·60/d =
    // 960, 240, 80, 30, 12; w(m) = suffix sums
    assert(w == Seq(1322L, 362L, 122L, 42L, 12L) && den == 1920L)
    // identical lists: the item at rank m contributes w(m), so the
    // ceiling is w.sum = 1860 and rbo = 1860/1920 = 1 − p^k = 31/32
    assert(w.sum == 1860L && w.sum * 32 == den * 31)
    assert(w.sum * 1000000L / den == 968750L)
  }

  test("rankAgreement (x260): equals a first-principles prefix-overlap replay") {
    val k = Retrieval.HybridK
    val (w, den) = Retrieval.rboWeights(k)
    // reconstruct both systems' lists from x239's audited output (its
    // r_sem/r_lex columns carry the ranks; −1 = not surfaced)
    val fused = Retrieval.hybridRelated(spark, sf)
      .select($"doc_id", $"rel_id", $"r_sem", $"r_lex")
      .as[(Long, Long, Long, Long)].collect()
    val semL = fused.filter(_._3 > 0).groupBy(_._1).view
      .mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    val lexL = fused.filter(_._4 > 0).groupBy(_._1).view
      .mapValues(_.sortBy(_._4).map(_._2).toSeq).toMap
    // the DEFINITION: RBO@k·den = Σ_d 2^(k−d)·(L/d)·|A[:d] ∩ B[:d]|
    val term = (1 to k).map(d => (1L << (k - d)) * (den / (1L << k) / d))
    def replay(a: Seq[Long], b: Seq[Long]): (Long, Long) = {
      val overlaps = (1 to k).map(d =>
        a.take(d).toSet.intersect(b.take(d).toSet).size.toLong)
      (a.toSet.intersect(b.toSet).size.toLong,
        (1 to k).map(d => term(d - 1) * overlaps(d - 1)).sum)
    }
    val got = Retrieval.rankAgreement(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.nonEmpty && got.map(_._1).toSet == semL.keySet)
    got.foreach { case (doc, nCommon, num, micro) =>
      val (wantN, wantNum) =
        replay(semL(doc), lexL.getOrElse(doc, Seq.empty))
      assert((nCommon, num) == ((wantN, wantNum)), s"doc $doc")
      assert(micro == num * 1000000L / den)
      assert(num >= 0L && num <= w.sum)
    }
    // the corpus exercises agreement AND disagreement
    assert(got.exists(_._2 > 0) && got.exists(_._2 == 0))
  }
}
