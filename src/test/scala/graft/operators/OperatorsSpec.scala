package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  test("wordShingles produces n_words - n + 1 distinct shingles, empty below n words") {
    val df = Seq("a b c d e f", "a b", "a b c d e a b c d e").toDF("text")
      .select(Dedup.wordShingles($"text", 5).as("sh"))
    val sizes = df.select(size($"sh")).as[Int].collect().toSeq
    // 6 words → 2; 2 words → 0; 10 words w/ repeated half → 6 raw, 5 distinct
    assert(sizes == Seq(2, 0, 5))
  }

  test("minhash signature is deterministic and equal for equal shingle sets") {
    val df = Seq("x y z w v u t", "x y z w v u t").toDF("text")
      .select(Dedup.minhashSignature(Dedup.wordShingles($"text", 3), 16).as("sig"))
    val sigs = df.select($"sig").as[Seq[Long]].collect()
    assert(sigs(0) == sigs(1))
    assert(sigs(0).length == 16)
  }

  test("native WordShingles/WordShingleHashes kernels equal the HOF formulation as sets") {
    import graft.functions.HashSignatures.{word_shingle_hashes, word_shingles}
    val docs = graft.Tables.documents(spark, sf)
    val bad = docs.select(
      array_sort(word_shingles($"text", 5)).as("native"),
      array_sort(Dedup.wordShingles($"text", 5)).as("hof"),
      array_sort(word_shingle_hashes($"text", 5)).as("nativeH"),
      array_sort(transform(Dedup.wordShingles($"text", 5), s => xxhash64(s))).as("hofH"))
      .filter(not($"native" === $"hof") || not($"nativeH" === $"hofH"))
    assert(bad.count() == 0)
  }

  test("native MinHashSignature kernel is identical to the HOF formulation") {
    import graft.functions.HashSignatures.minhash_sig
    val docs = graft.Tables.documents(spark, sf).select($"doc_id", $"text")
    val both = docs.select(
      minhash_sig(transform(Dedup.wordShingles($"text", 5), s => xxhash64(s)), 32).as("native"),
      Dedup.minhashSignature(Dedup.wordShingles($"text", 5), 32).as("hof"))
    assert(both.filter(not($"native" === $"hof")).count() == 0)
  }

  test("native SimHash64 kernel is identical to the HOF formulation") {
    import graft.functions.HashSignatures.simhash64
    val docs = graft.Tables.documents(spark, sf)
    val both = docs.select(
      simhash64(transform(split($"text", " "), w => xxhash64(w))).as("native"),
      Dedup.simhash($"text").as("hof"))
    assert(both.filter($"native" =!= $"hof").count() == 0)
  }

  test("simhash: identical texts collide, disjoint-vocab texts differ") {
    val df = Seq("spark sql query engine fast", "spark sql query engine fast",
      "zebra yak walrus xerus vole").toDF("text")
      .select(Dedup.simhash($"text").as("h"))
    val hs = df.as[Long].collect()
    assert(hs(0) == hs(1))
    assert(hs(0) != hs(2))
  }

  test("dedupFirst keeps exactly the first row under the declared total order") {
    val df = Seq((1, 2, "b"), (1, 1, "a"), (2, 5, "c")).toDF("k", "ord", "v")
    val out = Relational.dedupFirst(df, Seq("k"), Seq("ord", "v")).orderBy($"k")
      .as[(Int, Int, String)].collect().toSeq
    assert(out == Seq((1, 1, "a"), (2, 5, "c")))
  }

  test("ngramJaccard only emits pairs meeting the threshold, with exact jaccard") {
    val pairs = Dedup.ngramJaccard(spark, sf, n = 5, threshold = 0.3)
    val bad = pairs.filter($"jaccard" < 0.3 || $"jaccard" > 1.0).count()
    assert(bad == 0)
  }

  test("minhashLsh candidates are verified: every emitted pair meets true jaccard threshold") {
    val pairs = Dedup.minhashLsh(spark, sf, threshold = 0.3)
    assert(pairs.filter($"jaccard" < 0.3).count() == 0)
    assert(pairs.count() > 0) // near-dups exist in the synthetic docs
  }

  test("LSH recall vs exact jaccard baseline is high on the synthetic near-dups") {
    val exact = Dedup.ngramJaccard(spark, sf, n = 5, threshold = 0.5)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashLsh(spark, sf, threshold = 0.5)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact)) // precision 1.0 by construction (exact verify)
    if (exact.nonEmpty) {
      val recall = lsh.intersect(exact).size.toDouble / exact.size
      assert(recall >= 0.8, s"recall $recall over ${exact.size} true pairs")
    }
  }

  test("cosine topk: self-similarity excluded, k rows per query, sims within [-1,1]") {
    val topk = Similarity.bruteForceTopK(spark, sf, qLo = 0, qHi = 5, k = 3)
    assert(topk.filter($"vec_id" === $"q_id").count() == 0)
    val counts = topk.groupBy($"q_id").count().select($"count").as[Long].collect()
    assert(counts.forall(_ == 3))
    assert(topk.filter($"cos_sim" < -1.0 || $"cos_sim" > 1.0).count() == 0)
  }

  test("quantizedRecall (x175): overlap and displacement match a driver int8 replay") {
    val vecs = graft.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
      .map { case (id, v) => id -> v.map(_.toDouble) }.sortBy(_._1)
    def quant(v: Array[Double]): Array[Double] = {
      val scale = v.foldLeft(0.0)((acc, x) => math.max(acc, math.abs(x)))
      v.map(x => math.floor(x / scale * 127.0 + 0.5))
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      math.floor(dot / (math.sqrt(na) * math.sqrt(nb)) * 1e6) / 1e6
    }
    val qvecs = vecs.map { case (id, v) => id -> quant(v) }
    val k = 5
    val want = vecs.filter(_._1 < 10).map { case (qid, qv) =>
      val qq = qvecs.find(_._1 == qid).get._2
      def ranks(score: Long => Double): Map[Long, Int] =
        vecs.map(_._1).filter(_ != qid)
          .sortBy(id => (-score(id), id)).zipWithIndex
          .map { case (id, i) => id -> (i + 1) }.toMap
      val vById = vecs.toMap; val qById = qvecs.toMap
      val re = ranks(id => cos(qv, vById(id)))
      val rq = ranks(id => cos(qq, qById(id)))
      val exactTop = re.filter(_._2 <= k).keySet
      val hits = exactTop.count(rq(_) <= k).toLong
      (qid, (hits, exactTop.toSeq.map(rq(_).toLong).sum))
    }.toMap
    val got = Similarity.quantizedRecall(spark, sf)
      .as[(Long, Int, Long, Double, Long)].collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { case (qid, kk, hits, recall, drank) =>
      assert(kk == k && (hits, drank) == want(qid), s"query $qid")
      assert(recall == hits.toDouble / k, s"query $qid recall")
    }
    // quantization is useful on this corpus: mean recall well above chance
    val meanRecall = got.map(_._4).sum / got.length
    assert(meanRecall >= 0.6, s"mean recall $meanRecall")
  }

  test("quantizedRecall shipping form (x175, r18): bit-identical to the " +
    "full-rank window twin, and plans no Window") {
    val agg = Similarity.quantizedRecall(spark, sf)
      .as[(Long, Int, Long, Double, Long)].collect().toSet
    val win = Similarity.quantizedRecall(spark, sf, window = true)
      .as[(Long, Int, Long, Double, Long)].collect().toSet
    assert(agg == win, "aggregate form diverged from the window twin")
    val plan = Similarity.quantizedRecall(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"x175 must not plan a Window:\n$plan")
    assert(Similarity.quantizedRecall(spark, sf, window = true)
      .queryExecution.executedPlan.toString.contains("Window"))
  }

  test("decayAttribution (x188): halving credits match an exhaustive driver replay") {
    val ev = graft.Tables.events(spark, sf)
    val rows = ev.select($"user_id", $"event_id", $"event_type",
        Sessionize.tsSeconds(ev).as("ts_s"))
      .as[(Long, Long, String, Long)].collect()
    val k = Sessionize.DecayK
    val want = rows.groupBy(_._1).values.flatMap { es =>
      val ordered = es.sortBy(e => (e._4, e._2)).map(_._3)
      ordered.zipWithIndex.filter(_._1 == "purchase").flatMap { case (_, i) =>
        (1 to k).flatMap { j =>
          if (i - j >= 0) Some((j, ordered(i - j))) else None
        }
      }
    }.toSeq.groupBy(_._2).view.mapValues { ts =>
      (ts.size.toLong, ts.map { case (pos, _) => 1L << (k - pos) }.sum,
        ts.count(_._1 == 1).toLong)
    }.toMap
    val got = Sessionize.decayAttribution(spark, sf)
      .as[(String, Long, Long, Long)].collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { case (t, n, credit, nearest) =>
      assert((n, credit, nearest) == want(t), s"type $t")
    }
  }

  test("looTargetEncoding (x189): rationals match a replay; self-exclusion is real") {
    val brandByPart = graft.Tables.part(spark, sf)
      .select($"p_partkey", $"p_brand").as[(Long, String)].collect().toMap
    val rows = graft.Tables.lineitem(spark, sf)
      .select($"l_partkey", $"l_quantity").as[(Long, Double)].collect()
      .map { case (pk, q) => (brandByPart(pk), math.round(q * 100)) }
    val byBrand = rows.groupBy(_._1).view
      .mapValues(rs => (rs.map(_._2).sum, rs.size.toLong)).toMap
    val want = rows.distinct.map { case (b, q) =>
      val (s, c) = byBrand(b)
      (b, q) -> ((s - q, c - 1))
    }.toMap
    val got = Relational.looTargetEncoding(spark, sf)
      .select($"p_brand", $"qty_centi", $"loo_num", $"loo_den", $"loo_mean", $"no_peers")
      .as[(String, Long, Long, Long, Option[Double], Int)].collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { case (b, q, num, den, mean, noPeers) =>
      assert((num, den) == want((b, q)), s"($b, $q) rational")
      if (den > 0) assert(mean.contains(num.toDouble / den) && noPeers == 0)
      else assert(mean.isEmpty && noPeers == 1)
    }
    // self-exclusion shifts the encoding: two different targets in the same
    // brand get different LOO means
    val inBrand = got.groupBy(_._1).values
    assert(inBrand.exists(g => g.flatMap(_._5).distinct.size > 1))
  }

  test("groupedFolds (x190): user-pure folds; balance sheet matches a driver replay") {
    val ev = graft.Tables.events(spark, sf)
    val rows = ev.select($"user_id", $"event_type", $"value")
      .as[(Long, String, Double)].collect()
    def fold(uid: Long): Long =
      (Dedup.md5Hash60Ref("fold:" + uid) % 10000) % Sampling.FoldK
    val want = rows.groupBy(r => (fold(r._1), r._2)).view.mapValues { rs =>
      (rs.size.toLong, rs.map(_._1).distinct.size.toLong,
        rs.map(r => math.round(r._3 * 100)).sum)
    }.toMap
    val got = Sampling.groupedFolds(spark, sf)
      .as[(Long, String, Long, Long, Long)].collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { case (f, t, n, u, v) =>
      assert((n, u, v) == want((f, t)), s"cell ($f, $t)")
    }
    // grouping is structural: every user's rows land in exactly one fold
    assert(rows.map(_._1).distinct.forall(uid => fold(uid) < Sampling.FoldK))
    assert(got.map(_._3).sum == rows.length.toLong)
  }

  test("quantizationError (x187): per-label micro-error ledger matches a driver replay") {
    val rows = graft.Tables.embeddings(spark, sf)
      .select($"label", $"embedding").as[(Int, Array[Float])].collect()
    val want = rows.map { case (label, vf) =>
      val v = vf.map(_.toDouble)
      val scale = v.foldLeft(0.0)((a, x) => math.max(a, math.abs(x)))
      val step = scale / 127.0
      var err = 0.0
      v.foreach(x => err += math.abs(x - math.floor(x / scale * 127.0 + 0.5) * step))
      (label, math.floor(err * 1e6).toLong)
    }.groupBy(_._1).view.mapValues { es =>
      (es.size.toLong, es.map(_._2).sum, es.map(_._2).max)
    }.toMap
    val got = Similarity.quantizationError(spark, sf)
      .as[(Int, Long, Long, Long)].collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { case (label, n, sumE, maxE) =>
      assert((n, sumE, maxE) == want(label), s"label $label")
    }
    // quantization distorts but is bounded: every vector's error is
    // positive yet far below the raw norm scale
    assert(got.forall(r => r._3 > 0))
  }

  test("mutualTopK (x178): reciprocal pairs match a driver replay; subset of one-way topk") {
    val vecs = graft.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
      .map { case (id, v) => id -> v.map(_.toDouble) }
    val byId = vecs.toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      math.floor(dot / (math.sqrt(na) * math.sqrt(nb)) * 1e6) / 1e6
    }
    val k = Similarity.MutualK
    val topk = vecs.map { case (q, qv) =>
      q -> vecs.map(_._1).filter(_ != q)
        .sortBy(id => (-cos(qv, byId(id)), id)).take(k).zipWithIndex
        .map { case (id, i) => id -> (i + 1) }.toMap
    }.toMap
    val want = (for {
      (u, nsU) <- topk.toSeq; (v, rUv) <- nsU
      if u < v && topk(v).contains(u)
    } yield (u, v) -> ((rUv.toLong, topk(v)(u).toLong))).toMap
    val got = Similarity.mutualTopK(spark, sf)
      .as[(Long, Long, Int, Int, Double)].collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { case (u, v, ruv, rvu, c) =>
      assert((ruv.toLong, rvu.toLong) == want((u, v)), s"pair ($u,$v) ranks")
      assert(c == cos(byId(u), byId(v)), s"pair ($u,$v) cos")
    }
    // reciprocity is a strict filter: fewer mutual pairs than one-way edges
    assert(want.size < topk.size * k)
  }

  test("simhashPrecision (x179): per-band tallies match a driver replay of the banding") {
    import graft.functions.HashSignatures.{simhash64, token_md5_hashes}
    val sigs = graft.Tables.documents(spark, sf)
      .select($"doc_id", simhash64(token_md5_hashes($"text")).as("sh"))
      .as[(Long, Long)].collect()
    val perBand = (0 until 4).map { b =>
      val byChunk = sigs.groupBy { case (_, sh) => (sh >> (b * 16)) & 0xFFFFL }
      val cands = byChunk.values.filter(_.length > 1)
        .flatMap(_.sortBy(_._1).combinations(2)).toSeq
      val ver = cands.count { case Array((_, s1), (_, s2)) =>
        java.lang.Long.bitCount(s1 ^ s2) <= Dedup.SimhashMaxHamming }
      b -> ((cands.size.toLong, ver.toLong))
    }.toMap.filter(_._2._1 > 0)
    val got = Dedup.simhashPrecision(spark, sf)
      .as[(Int, Long, Long, Long)].collect()
    assert(got.map(_._1).toSet == perBand.keySet && got.nonEmpty)
    got.foreach { case (b, nc, nv, ppm) =>
      assert((nc, nv) == perBand(b), s"band $b tallies")
      assert(ppm == 1000000L * nv / nc, s"band $b ppm")
    }
    // the union of verified per-band pairs is exactly x04's pair set
    val x04 = Dedup.simhashPairs(spark, sf).as[(Long, Long, Int)].collect()
    assert(x04.forall(_._3 <= Dedup.SimhashMaxHamming))
  }

  test("LSH ANN returns a subset ranking consistent with brute force on shared candidates") {
    val brute = Similarity.bruteForceTopK(spark, sf, qLo = 0, qHi = 5, k = 500)
      .select($"q_id", $"vec_id", $"cos_sim").as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val lsh = Similarity.lshTopK(spark, sf, qLo = 0, qHi = 5, k = 3)
      .select($"q_id", $"vec_id", $"cos_sim").as[(Long, Long, Double)].collect()
    assert(lsh.forall { case (q, v, s) => brute.get((q, v)).forall(_ == s) })
  }

  test("sessionize: sessions partition the events; durations non-negative; gaps respected") {
    val sessions = Sessionize.sessions(spark, sf)
    val totalEvents = graft.Tables.events(spark, sf).count()
    val sessionEvents = sessions.agg(sum($"n_events")).head().getLong(0)
    assert(sessionEvents == totalEvents)
    assert(sessions.filter($"duration_s" < 0).count() == 0)
  }

  test("eventTransitions (x85): exact match with a driver replay; counts reconcile") {
    val ev = graft.Tables.events(spark, sf)
    val rows = ev.select($"user_id", $"event_id", $"event_type",
      Sessionize.tsSeconds(ev).as("ts_s"))
      .as[(Long, Long, String, Long)].collect()
    val want = rows.groupBy(_._1).toSeq.flatMap { case (uid, es) =>
      es.sortBy(e => (e._4, e._2)).map(_._3).sliding(2).collect {
        case Array(a, b) => ((a, b), uid)
      }
    }.groupBy(_._1).map { case (k, v) =>
      k -> ((v.size.toLong, v.map(_._2).distinct.size.toLong))
    }
    val got = Sessionize.eventTransitions(spark, sf)
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(got == want && got.nonEmpty)
    // every user contributes exactly (n_events - 1) transitions
    val nUsers = rows.map(_._1).distinct.length
    assert(got.values.map(_._1).sum == rows.length - nUsers)
  }

  test("funnel (x86): stage counts non-increasing, strict ordering enforced") {
    val out = Sessionize.funnel(spark, sf)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(out.map(_._2).toSeq == Sessionize.FunnelStages)
    assert(out.map(_._3).sliding(2).forall(p => p.size < 2 || p(0) >= p(1)))
    // stage 1 = users with at least one 'view'
    val viewers = graft.Tables.events(spark, sf)
      .filter($"event_type" === Sessionize.FunnelStages.head)
      .select($"user_id").distinct().count()
    assert(out.head._3 == viewers)
    assert(out.forall(r => r._4 == out.head._4 && r._3 <= r._4)) // shared denominator
  }

  test("errorSpikes (x87): trailing CLOCK-hour windows reconcile; spike rule is the cross-multiplied mean") {
    val out = Sessionize.errorSpikes(spark, sf)
      .orderBy($"hour_start_s")
      .as[(Long, Long, Long, Long, Int)].collect()
    assert(out.nonEmpty)
    assert(out.head._3 == 0L && out.head._5 == 0) // first hour has no history, never a spike
    // driver replay: the baseline spans the last 24 clock hours (zero-error
    // hours dilute the mean), not the last 24 observed error-hours
    val first = out.head._1
    out.foreach { case (h, n, th, te, spike) =>
      val wantTh = math.min(Sessionize.SpikeTrailingHours.toLong, (h - first) / 3600)
      val wantTe = out
        .filter(r => r._1 >= h - Sessionize.SpikeTrailingHours * 3600L && r._1 <= h - 3600L)
        .map(_._2).sum
      assert(th == wantTh && te == wantTe, s"hour $h")
      val want = if (th > 0 && n * th > Sessionize.SpikeFactor * te) 1 else 0
      assert(spike == want)
    }
    // total errors conserved across hourly rows
    val totalErrors = graft.Tables.events(spark, sf)
      .filter($"event_type" === "error").count()
    assert(out.map(_._2).sum == totalErrors)
  }

  test("ewmaPopularity (x101): driver replay of the power-of-two clock-hour decay") {
    val raw = graft.Tables.events(spark, sf)
    val hourly = raw
      .select($"event_type", Sessionize.tsSeconds(raw).as("ts_s"))
      .as[(String, Long)].collect()
      .groupBy { case (t, s) => (t, s / 3600 * 3600) }
      .view.mapValues(_.length.toLong).toMap
    val wWin = Sessionize.EwmaHours
    val got = Sessionize.ewmaPopularity(spark, sf)
      .as[(String, Long, Long, Long)].collect()
    assert(got.length == hourly.size && got.nonEmpty)
    got.foreach { case (tpe, h, n, pts) =>
      assert(n == hourly((tpe, h)), s"$tpe $h")
      val want = (0 until wWin).map { k =>
        hourly.getOrElse((tpe, h - k * 3600L), 0L) << (wWin - 1 - k)
      }.sum
      assert(pts == want, s"$tpe $h ewma")
    }
    // decay sanity: an anchor's pts are at least its own hour's weighted
    // count and below the all-hours-at-max bound
    got.foreach { case (_, _, n, pts) =>
      assert(pts >= (n << (wWin - 1)))
    }
    // a gap dilutes: hand stream with a burst, silence, then one event
    val dir = java.nio.file.Files.createTempDirectory("graft-ewma").toString
    val h0 = 3600L * 1000000
    Seq.tabulate(8)(i => (i.toLong, new java.sql.Timestamp(h0 * 1000), 1L, "view", 0.0, "{}")) ++
      Seq((8L, new java.sql.Timestamp((h0 + 5 * 3600) * 1000), 1L, "view", 0.0, "{}")) match {
      case rows => rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
    }
    val planted = Sessionize.ewmaPopularity(spark, dir)
      .as[(String, Long, Long, Long)].collect().map(r => r._2 -> r._4).toMap
    // burst hour: 8 events at weight 2^7; 5 quiet hours later: 1 event at
    // 2^7 plus the decayed burst at 2^2 — the silence must have decayed
    // the burst below one fresh event's weight
    assert(planted(h0) == 8L << 7)
    assert(planted(h0 + 5 * 3600) == (1L << 7) + (8L << 2))
  }

  test("tokenizerFertility (x113): reconciles with the BPE kernel; fertility >= 1") {
    val perDoc = graft.Tables.documents(spark, sf)
      .select($"source", $"lang",
        size(split($"text", " ")).cast("long").as("nw"),
        size(graft.functions.BpeEncode.bpe_encode($"text", TextAnalysis.PinnedBpeMerges))
          .cast("long").as("nt"))
      .as[(String, String, Long, Long)].collect()
    val want = perDoc.groupBy(r => (r._1, r._2)).map { case (k, rs) =>
      k -> (rs.length.toLong, rs.map(_._3).sum, rs.map(_._4).sum)
    }
    val got = TextAnalysis.tokenizerFertility(spark, sf)
      .as[(String, String, Long, Long, Long, Long, Double)].collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { case (src, lang, nd, nw, nt, ppm, f) =>
      // per-word encode == whole-text encode (word-local kernel), so the
      // cell sums must reconcile with the document-level encoding
      assert((nd, nw, nt) == want((src, lang)), s"$src/$lang")
      assert(ppm == 1000000L * nt / nw && f == nt.toDouble / nw)
      // a BPE tokenizer can only split words, never merge across spaces
      assert(nt >= nw, s"$src/$lang fertility below 1")
    }
  }

  test("lastTouchAttribution (x112): driver replay; most-recent click wins, coverage kept") {
    val raw = graft.Tables.events(spark, sf)
    val ev = raw.select($"event_id", $"user_id", $"event_type",
      Sessionize.tsSeconds(raw).as("ts_s")).as[(Long, Long, String, Long)].collect()
    val clicksByUser = ev.filter(_._3 == "click").groupBy(_._2)
    val purchases = ev.filter(_._3 == "purchase")
    val want = purchases.map { case (pid, u, _, pts) =>
      val cands = clicksByUser.getOrElse(u, Array.empty)
        .filter(c => c._4 <= pts && c._4 > pts - Sessionize.AttributionWindowS)
      pid -> (if (cands.isEmpty) None
              else Some(cands.maxBy(c => (c._4, c._1))).map(c => (c._1, c._4, pts - c._4)))
    }.toMap
    val got = Sessionize.lastTouchAttribution(spark, sf)
      .select($"purchase_id", $"click_id", $"click_ts_s", $"lag_s", $"attributed")
      .as[(Long, Option[Long], Option[Long], Option[Long], Int)].collect()
    assert(got.length == purchases.length && got.nonEmpty)
    got.foreach { case (pid, cid, cts, lag, attr) =>
      want(pid) match {
        case Some((wCid, wCts, wLag)) =>
          assert((cid, cts, lag, attr) == (Some(wCid), Some(wCts), Some(wLag), 1), s"p $pid")
        case None =>
          assert(cid.isEmpty && attr == 0, s"p $pid must stay unattributed")
      }
    }
    // both coverage classes must exist on real data
    assert(got.exists(_._5 == 1) && got.exists(_._5 == 0))
    // lag is always within the window and non-negative
    assert(got.flatMap(_._4).forall(l => l >= 0 && l < Sessionize.AttributionWindowS))
  }

  test("associationRules (x111): driver replay over x11's own baskets") {
    val baskets = Sessionize.sessions(spark, sf)
      .select($"user_id", $"session_idx").as[(Long, Long)].collect()
    val items = Sessionize.sessionizedEvents(spark, sf, 1800)
      .select($"user_id", $"session_idx", $"event_type")
      .distinct().as[(Long, Long, String)].collect()
    val n = baskets.length.toLong
    assert(items.map(r => (r._1, r._2)).distinct.length.toLong == n) // same baskets as x11
    val byBasket = items.groupBy(r => (r._1, r._2)).view.mapValues(_.map(_._3).toSet)
    val ic = items.groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val pairCounts = byBasket.values.toSeq
      .flatMap(ts => ts.toSeq.sorted.combinations(2).map(p => (p(0), p(1))))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = Sessionize.associationRules(spark, sf)
      .as[(String, String, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(got.length == pairCounts.size && got.nonEmpty)
    got.foreach { case (a, b, na, nb, nab, sup, cab, cba, lift) =>
      assert(a < b && nab == pairCounts((a, b)), s"$a->$b")
      assert(na == ic(a) && nb == ic(b))
      assert(sup == 1000000L * nab / n)
      assert(cab == 1000000L * nab / na && cba == 1000000L * nab / nb)
      assert(lift == 1000L * nab * n / (na * nb))
      // co-occurrence can never exceed either side's basket count
      assert(nab <= na && nab <= nb)
    }
  }

  test("robustSpikes (x102): driver replay of the scaled-integer median/MAD rule") {
    def med2(xs: Seq[Long]): Long = {
      val s = xs.sorted
      if (s.length % 2 == 1) 2 * s(s.length / 2)
      else s(s.length / 2 - 1) + s(s.length / 2)
    }
    val raw = graft.Tables.events(spark, sf)
    val hourly = raw
      .select($"event_type", Sessionize.tsSeconds(raw).as("ts_s"))
      .as[(String, Long)].collect()
      .groupBy { case (t, s) => (t, s / 3600 * 3600) }
      .view.mapValues(_.length.toLong).toMap
    val byType = hourly.groupBy(_._1._1)
    val got = Sessionize.robustSpikes(spark, sf)
      .as[(String, Long, Long, Long, Long, Int)].collect()
    assert(got.length == hourly.size && got.nonEmpty)
    got.foreach { case (tpe, h, n, m2, m4, spike) =>
      val ns = byType(tpe).values.toSeq
      val wantMed2 = med2(ns)
      val dev2s = ns.map(x => math.abs(2 * x - wantMed2))
      val wantMad4 = med2(dev2s)
      assert(n == hourly((tpe, h)) && m2 == wantMed2 && m4 == wantMad4, s"$tpe $h")
      assert(spike == (if (2 * math.abs(2 * n - wantMed2) > Sessionize.RobustZ * wantMad4) 1 else 0))
    }
    // planted step-change: a level shift does NOT flag (median follows the
    // majority level), a genuine burst does — the robustness x87 lacks
    val dir = java.nio.file.Files.createTempDirectory("graft-mad").toString
    val h0 = 3600L * 2000000
    val steady = (0 until 11).flatMap(i =>
      Seq.fill(10)((i.toLong, new java.sql.Timestamp((h0 + i * 3600) * 1000), 1L, "view", 0.0, "{}")))
    val burst = Seq.fill(200)((99L, new java.sql.Timestamp((h0 + 11 * 3600) * 1000), 1L, "view", 0.0, "{}"))
    (steady ++ burst).zipWithIndex
      .map { case ((_, ts, u, t, v, p), i) => (i.toLong, ts, u, t, v, p) }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val planted = Sessionize.robustSpikes(spark, dir)
      .as[(String, Long, Long, Long, Long, Int)].collect()
    val flagged = planted.filter(_._6 == 1).map(_._2)
    assert(flagged.toSeq == Seq(h0 + 11 * 3600), s"only the burst hour: ${flagged.toSeq}")
  }

  test("interArrivalStats (x106): exact rational variance; metronome vs burst flag") {
    val raw = graft.Tables.events(spark, sf)
    val byUser = raw.select($"user_id", Sessionize.tsSeconds(raw).as("ts_s"))
      .as[(Long, Long)].collect().groupBy(_._1)
    val want = byUser.collect { case (u, evs) if evs.length >= 2 =>
      val ts = evs.map(_._2).sorted
      val gaps = ts.zip(ts.tail).map { case (a, b) => b - a }
      val n = gaps.length.toLong
      val s = gaps.sum
      val sq = gaps.map(g => g * g).sum
      u -> (n, s, sq, n * sq - s * s, n * n, s.toDouble / n,
        if (n * sq > 2 * s * s) 1 else 0)
    }
    val got = Sessionize.interArrivalStats(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long, Double, Int)].collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { case (u, n, s, sq, vn, vd, mean, b) =>
      assert((n, s, sq, vn, vd, mean, b) == want(u), s"user $u")
      assert(vn >= 0L) // population variance numerator is non-negative
    }
    // planted: a metronome user (constant gap, CV=0) vs a bursty user
    // (burst of near-zero gaps + one long silence, CV>1)
    val dir = java.nio.file.Files.createTempDirectory("graft-gaps").toString
    val t0 = 1700000000L
    val metro = (0 until 10).map(i => (i.toLong, t0 + i * 600L, 1L))
    val bursty = (0 until 9).map(i => (100L + i, t0 + i, 2L)) :+ (109L, t0 + 100000L, 2L)
    (metro ++ bursty)
      .map { case (id, ts, u) => (id, new java.sql.Timestamp(ts * 1000), u, "view", 0.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val planted = Sessionize.interArrivalStats(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long, Double, Int)].collect()
      .map(r => r._1 -> r).toMap
    assert(planted(1L)._5 == 0L && planted(1L)._8 == 0) // zero variance, not bursty
    assert(planted(2L)._8 == 1, s"burst+silence must flag: ${planted(2L)}")
  }

  test("marketHhi (x110): driver replica of the quantized algebra; monopoly vs split market") {
    val got = Relational.marketHhi(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (r, n, v, hhi, top) =>
      // HHI lower bound 1/n (perfect split), upper 1 (monopoly), in ppm;
      // quantization dust can only nudge a few ppm below the bound
      assert(hhi >= 1000000L / n - 5 && hhi <= 1000000L, s"$r hhi=$hhi n=$n")
      assert(top >= 1000000L / n - 5 && top <= 1000000L, s"$r top=$top")
      assert(hhi <= top * n && v > 0L)
    }
    // exact driver replica on one region
    val bySupp = graft.Tables.lineitem(spark, sf)
      .join(graft.Tables.supplier(spark, sf), $"l_suppkey" === $"s_suppkey")
      .join(graft.Tables.nation(spark, sf), $"s_nationkey" === $"n_nationkey")
      .join(graft.Tables.region(spark, sf), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", $"l_suppkey")
      .agg(sum(Relational.cents($"l_extendedprice")).as("v"))
      .as[(String, Long, Long)].collect()
    val region0 = got.head._1
    val vs = bySupp.filter(_._1 == region0).map(_._3)
    val vTot = vs.sum
    val scale = math.max(1L, vTot / (1L << Relational.HhiQuantBits))
    val qs = vs.map(_ / scale)
    val s = qs.sum
    val wantHhi = 1000000L * qs.map(q => q * q).sum / (s * s)
    val wantTop = 1000000L * qs.max / s
    val row = got.find(_._1 == region0).get
    assert((row._2, row._3, row._4, row._5) == (vs.length.toLong, vTot, wantHhi, wantTop))
  }

  test("qualityScorePinned (x89): exact integer dot of the quantized x40 features") {
    val feats = TextAnalysis.qualityFeatures(spark, sf)
      .select($"doc_id", $"n_words", $"mean_word_len", $"stopword_ratio",
        $"short_word_ratio", $"dup_ratio")
      .as[(Long, Int, Double, Double, Double, Double)].collect()
    def q(x: Double): Long = math.floor(x * 1000000.0).toLong
    val want = feats.map { case (id, nw, ml, st, sh, du) =>
      id -> (TextAnalysis.QwWords * nw + TextAnalysis.QwMeanLen * q(ml) +
        TextAnalysis.QwStop * q(st) + TextAnalysis.QwShort * q(sh) +
        TextAnalysis.QwDup * q(du))
    }.toMap
    val got = TextAnalysis.qualityScorePinned(spark, sf)
      .as[(Long, Long, Int)].collect()
    assert(got.length == feats.length)
    got.foreach { case (id, score, keep) =>
      assert(score == want(id), s"doc $id")
      assert(keep == (if (score >= TextAnalysis.QualityKeepThresholdMicro) 1 else 0))
    }
    // the pinned threshold separates the corpus (both classes present)
    assert(got.exists(_._3 == 1) && got.exists(_._3 == 0))
  }

  test("ClusterStage: staged cluster table ≡ recomputed labeling; staged read is a pure scan") {
    val recomputed = Dedup.nearDupClusters(spark, sf).as[(Long, Long)].collect().toSet
    val stagedDf = ClusterStage.clusters(spark, sf)
    assert(stagedDf.as[(Long, Long)].collect().toSet == recomputed && recomputed.nonEmpty)
    // the staged read must be a parquet scan of the artifact, not a CC re-derivation
    val plan = stagedDf.queryExecution.optimizedPlan.toString
    assert(!plan.contains("Join"), s"staged read re-derives clustering:\n$plan")
    // explicit write/read API round-trips on an arbitrary docs frame
    val tmp = java.nio.file.Files.createTempDirectory("cluster_table_")
      .resolve("t").toString
    ClusterStage.writeClusterTable(graft.Tables.documents(spark, sf), tmp)
    assert(ClusterStage.readClusterTable(spark, tmp)
      .as[(Long, Long)].collect().toSet == recomputed)
  }

  test("sourceMirrorPairs (x92): exact driver replica from the cluster memberships") {
    val clusters = Dedup.nearDupClusters(spark, sf).as[(Long, Long)].collect()
    val sources = graft.Tables.documents(spark, sf)
      .select($"doc_id", $"source").as[(Long, String)].collect().toMap
    val byCluster = clusters.groupBy(_._2).view
      .mapValues(_.map(m => sources(m._1)).toSet).toMap
    val want = byCluster.toSeq.flatMap { case (cid, srcs) =>
      srcs.toSeq.sorted.combinations(2).map { case Seq(a, b) => ((a, b), cid) }
    }.groupBy(_._1).view.mapValues(_.map(_._2).distinct.size.toLong).toMap
    val got = Dedup.sourceMirrorPairs(spark, sf)
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got == want && got.nonEmpty)
    got.keys.foreach { case (a, b) => assert(a < b) } // canonical pair order
  }

  test("embeddingAudit (x93): consistent dims, no zero norms, envelope brackets every vector") {
    val audit = Similarity.embeddingAudit(spark, sf)
      .as[(Int, Long, Long, Long, Long, Long)].collect()
    assert(audit.nonEmpty)
    val total = graft.Tables.embeddings(spark, sf).count()
    assert(audit.map(_._2).sum == total)
    audit.foreach { case (_, _, nDims, nZero, minQ, maxQ) =>
      assert(nDims == 1L) // homogeneous dimensionality per label
      assert(nZero == 0L) // synthetic corpus has no zero vectors
      assert(minQ > 0L && minQ <= maxQ)
    }
  }

  test("dedupRates (x90): reconciles with the cluster table and the kept corpus") {
    val clusters = Dedup.nearDupClusters(spark, sf).as[(Long, Long)].collect()
    val sources = graft.Tables.documents(spark, sf)
      .select($"doc_id", $"source").as[(Long, String)].collect().toMap
    val rates = Dedup.dedupRates(spark, sf)
      .as[(String, Long, Long, Long)].collect()
    val wantDocs = sources.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val wantCanon = clusters.filter(c => c._1 == c._2)
      .groupBy(c => sources(c._1)).view.mapValues(_.length.toLong).toMap
    rates.foreach { case (src, nDocs, nCanon, nDropped) =>
      assert(nDocs == wantDocs(src) && nCanon == wantCanon.getOrElse(src, 0L))
      assert(nDropped == nDocs - nCanon && nDropped >= 0)
    }
    // totals reconcile with the deduplicated shipping corpus (x57)
    assert(rates.map(_._3).sum == Dedup.nearDedupedCorpus(spark, sf).count())
  }

  test("userGrowth (x91): actives bound news, cumulative hits the distinct-user total") {
    val out = Sessionize.userGrowth(spark, sf)
      .orderBy($"week").as[(Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (_, active, nNew, _) => assert(nNew <= active) }
    assert(out.head._2 == out.head._3) // week 1: every active user is new
    assert(out.map(_._3).sum == out.last._4) // news telescope into the cumulative
    val totalUsers = graft.Tables.events(spark, sf)
      .select($"user_id").distinct().count()
    assert(out.last._4 == totalUsers)
    // cumulative is the running sum of news
    var run = 0L
    out.foreach { case (_, _, nNew, cum) => run += nNew; assert(cum == run) }
  }

  test("retentionCohorts (x88): exact driver replica; offset-0 row equals cohort size") {
    val ev = graft.Tables.events(spark, sf)
    val rows = ev.select($"user_id", Sessionize.tsSeconds(ev).as("ts_s"))
      .as[(Long, Long)].collect()
    val weekly = rows.map { case (u, t) => (u, t / 604800) }.distinct
    val cohort = weekly.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val want = weekly.groupBy { case (u, w) => (cohort(u), w - cohort(u)) }
      .view.mapValues(_.map(_._1).distinct.size.toLong).toMap
    val got = Sessionize.retentionCohorts(spark, sf)
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got == want && got.nonEmpty)
    // every cohort's offset-0 row counts the whole cohort
    cohort.values.toSeq.distinct.foreach { cw =>
      assert(got((cw, 0L)) == cohort.count(_._2 == cw).toLong)
    }
  }

  test("near-dup clusters: edges share a canonical id, canonical <= member, singletons self-labeled") {
    val clusters = Dedup.nearDupClusters(spark, sf)
      .as[(Long, Long)].collect().toMap
    val edges = Dedup.ngramJaccard(spark, sf, n = 5, threshold = 0.3)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect()
    assert(edges.nonEmpty)
    edges.foreach { case (a, b) => assert(clusters(a) == clusters(b), s"$a,$b") }
    clusters.foreach { case (d, c) => assert(c <= d) }
    val inEdges = edges.flatMap(e => Seq(e._1, e._2)).toSet
    clusters.filterNot { case (d, _) => inEdges(d) }
      .foreach { case (d, c) => assert(c == d) }
  }

  test("IVF ANN ranking is consistent with brute force on its candidates, k rows per query") {
    val ivf = Similarity.ivfTopK(spark, sf, qLo = 0, qHi = 5, k = 3)
      .select($"q_id", $"vec_id", $"cos_sim").as[(Long, Long, Double)].collect()
    val counts = ivf.groupBy(_._1).map(_._2.length)
    assert(counts.forall(_ == 3))
    val brute = Similarity.bruteForceTopK(spark, sf, qLo = 0, qHi = 5, k = 500)
      .select($"q_id", $"vec_id", $"cos_sim").as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(ivf.forall { case (q, v, s) => brute.get((q, v)).forall(_ == s) })
  }

  test("winnowing kernel equals the HOF reference on small inputs") {
    val docs = Seq((1L, "abcdefghijklmnop"), (2L, "short"), (3L, "aaaaaaaaaaaaaaaa"))
      .toDF("doc_id", "text")
    val kernel = docs.select($"doc_id",
      explode(graft.functions.HashSignatures.winnow_fp($"text", 8, 4)).as("fp"))
      .as[(Long, String)].collect().toSet
    val hof = TextAnalysis.winnowingFingerprintsHof(docs, 8, 4)
      .as[(Long, String)].collect().toSet
    assert(kernel == hof)
    assert(kernel.nonEmpty && !kernel.exists(_._1 == 2L)) // "short" has no 8-gram window
  }

  test("text stats ratios are in [0,1] and counts positive") {
    val stats = TextAnalysis.stats(spark, sf)
    assert(stats.filter($"stopword_ratio" < 0 || $"stopword_ratio" > 1).count() == 0)
    assert(stats.filter($"n_words" <= 0).count() == 0)
  }

  test("md5Hash60 equals DuckDB's ('0x'||substr(md5(w),1,15))::BIGINT (cross-engine pin)") {
    val v = Seq("hello").toDF("w").select(Dedup.md5Hash60($"w")).as[Long].head()
    assert(v == 419982666956583591L) // value computed in DuckDB — pins both engines
  }

  test("md5 kernel variants equal the conv-based HOF formulation") {
    import graft.functions.HashSignatures.{token_md5_hashes, word_shingle_hashes, word_shingles}
    val docs = graft.Tables.documents(spark, sf)
    val bad = docs.select(
      array_sort(word_shingle_hashes($"text", 5, useMd5 = true)).as("nativeSh"),
      array_sort(transform(word_shingles($"text", 5), s => Dedup.md5Hash60(s))).as("hofSh"),
      token_md5_hashes($"text").as("nativeTok"),
      transform(split($"text", " "), w => Dedup.md5Hash60(w)).as("hofTok"))
      .filter(not($"nativeSh" === $"hofSh") || not($"nativeTok" === $"hofTok"))
    assert(bad.count() == 0)
  }

  test("bucketed embeddingNearDup: equi-join plan (no nested loop / cartesian), subset of exact") {
    val bucketed = Dedup.embeddingNearDup(spark, sf)
    val got = bucketed.as[(Long, Long, Double)].collect().toSet
    val planStr = bucketed.queryExecution.executedPlan.toString // final AQE plan after collect
    assert(!planStr.contains("BroadcastNestedLoopJoin") && !planStr.contains("CartesianProduct"),
      s"bucketed near-dup must not fall back to an all-pairs join:\n$planStr")
    val exact = Dedup.embeddingNearDupExact(spark, sf).as[(Long, Long, Double)].collect().toSet
    assert(got.subsetOf(exact)) // precision 1.0: exact cosine verify on candidates
  }

  test("semanticDeduped (x78): drops exactly the lower-id-partnered vectors; overload ≡ standalone") {
    val all = graft.Tables.embeddings(spark, sf)
      .select($"vec_id").as[Long].collect().toSet
    val pairs = Dedup.embeddingNearDup(spark, sf)
      .as[(Long, Long, Double)].collect()
    val flagged = pairs.map(_._2).toSet // every vec with a lower-id partner
    val kept = Dedup.semanticDeduped(spark, sf)
      .select($"vec_id").as[Long].collect().toSet
    assert(kept == all -- flagged)
    assert(flagged.forall(b => pairs.exists(p => p._2 == b && p._1 < b)))
    // composable overload over precomputed pairs gives the same corpus
    val viaOverload = Dedup.semanticDeduped(
      graft.Tables.embeddings(spark, sf), Dedup.embeddingNearDup(spark, sf))
      .select($"vec_id").as[Long].collect().toSet
    assert(viaOverload == kept)
  }

  test("hardNegativesTopK (x79): never a same-label result, ranking ≡ label-filtered brute force") {
    val got = Similarity.hardNegativesTopK(spark, sf)
      .select($"q_id", $"q_label", $"vec_id", $"neg_label", $"rank")
      .as[(Long, Int, Long, Int, Int)].collect()
    assert(got.nonEmpty)
    got.foreach { case (_, ql, _, nl, _) => assert(ql != nl) }
    // per query: exactly the top-k of the exact ranking restricted to
    // cross-label candidates (bruteForceTopK with the filter applied after
    // scoring would differ — the negatives must come from the FULL corpus
    // minus same-label, not from the unfiltered top-k)
    val emb = graft.Tables.embeddings(spark, sf)
      .select($"vec_id", $"label", Similarity.asDouble($"embedding").as("v"))
      .as[(Long, Int, Seq[Double])].collect()
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      math.floor(dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum)) * 1e6) / 1e6
    }
    val queries = emb.filter(e => e._1 >= 0 && e._1 < 10)
    queries.foreach { case (qid, qlab, qv) =>
      val want = emb.filter(_._2 != qlab)
        .map { case (id, _, v) => (id, cos(qv, v)) }
        .sortBy { case (id, c) => (-c, id) }.take(5).map(_._1).toSeq
      val mine = got.filter(_._1 == qid).sortBy(_._5).map(_._3).toSeq
      assert(mine == want, s"query $qid")
    }
  }

  test("repetitionStats flags degenerate repeated text, passes unique text") {
    val dir = java.nio.file.Files.createTempDirectory("graft-rep").toString
    Seq((1L, "a b c a b c a b c a b c"), // 10 3-grams, 3 distinct → ratio 0.7
        (2L, "q w e r t y u i o p"))     // all distinct → ratio 0.0
      .toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextAnalysis.repetitionStats(spark, dir)
      .orderBy($"doc_id").as[(Long, Int, Int, Double, Int)].collect()
    assert(out(0) == ((1L, 10, 3, 0.7, 1)))
    assert(out(1) == ((2L, 8, 8, 0.0, 0)))
  }

  test("contaminationPairs finds planted eval-set overlap, benchmark side broadcast") {
    val dir = java.nio.file.Files.createTempDirectory("graft-decon").toString
    val evalDoc = "the quick brown fox jumps over the lazy dog today"
    Seq((1L, evalDoc),                                  // benchmark (id < 20)
        (30L, evalDoc + " and some extra words after"), // contaminated
        (31L, "completely unrelated text with different words entirely here now"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val hits = Dedup.contaminationPairs(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq
    assert(hits.map(h => (h._1, h._2)) == Seq((30L, 1L)))
    assert(hits.head._3 >= 3) // shares ≥3 5-grams with the benchmark doc
  }

  test("exactSubstringContamination: planted verbatim span fires, driver brute-force parity") {
    val k = Dedup.DecontamGramChars
    // planted fixture: doc 30 embeds a 30-char verbatim span of the
    // benchmark doc inside otherwise-unrelated text; doc 31 shares nothing
    val dir = java.nio.file.Files.createTempDirectory("graft-subdecon").toString
    val evalDoc = "the quick brown fox jumps over the lazy dog today"
    val span = evalDoc.substring(4, 34) // "quick brown fox jumps over the"
    // 'X' fences keep the verbatim overlap EXACTLY `span` (the benchmark
    // doc has spaces at both span boundaries, which would otherwise extend
    // the match by one gram on each side)
    Seq((1L, evalDoc),
        (30L, s"zz yyX${span}X tail words here"),
        (31L, "completely unrelated text with different words entirely here now"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val hits = Dedup.exactSubstringContamination(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq
    // exactly the planted doc, one partner, span.length-k+1 shared grams
    assert(hits == Seq((30L, 1L, (span.length - k + 1).toLong)))
    // real corpus: exact parity with a driver-side brute force over raw
    // gram STRINGS (also proves the md5-60 gram hashing is collision-free
    // on this corpus — any collision would inflate a count)
    val docs = graft.Tables.documents(spark, sf).select($"doc_id", $"text")
      .as[(Long, String)].collect()
    def gramSet(t: String): Set[String] =
      if (t.length < k) Set.empty
      else (0 to t.length - k).map(i => t.substring(i, i + k)).toSet
    val bench = docs.filter(_._1 < Dedup.DecontamBenchMaxId).map(d => d._1 -> gramSet(d._2))
    val expect = docs.filter(_._1 >= Dedup.DecontamBenchMaxId).flatMap { case (id, t) =>
      val g = gramSet(t)
      val shared = bench.map { case (bid, bg) => bid -> bg.intersect(g) }.filter(_._2.nonEmpty)
      if (shared.isEmpty) None
      else Some(id -> ((shared.length.toLong, shared.flatMap(_._2).toSet.size.toLong)))
    }.toMap
    val got = Dedup.exactSubstringContamination(spark, sf)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.nonEmpty && got == expect)
  }

  test("copyDirections (x114): edge mass reconciles with x39's duplicated paragraphs") {
    val pars = Dedup.cdcParagraphs(spark, sf, Dedup.ParagraphBoundaryMod)
      .select($"fp", $"doc_id", $"par_id").as[(String, Long, Long)].collect()
    val srcOf = graft.Tables.documents(spark, sf)
      .select($"doc_id", $"source").as[(Long, String)].collect().toMap
    val groups = pars.groupBy(_._1).filter(_._2.length >= 2)
    val wantEdges = groups.toSeq.flatMap { case (fp, occ) =>
      val origin = occ.minBy(o => (o._2, o._3))
      occ.filter(o => (o._2, o._3) != (origin._2, origin._3))
        .map(o => ((srcOf(origin._2), srcOf(o._2)), fp))
    }
    val want = wantEdges.groupBy(_._1).view
      .mapValues(es => (es.length.toLong, es.map(_._2).distinct.length.toLong)).toMap
    val got = Dedup.copyDirections(spark, sf)
      .as[(String, String, Long, Long)].collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { case (o, c, n, nc) =>
      assert((n, nc) == want((o, c)), s"$o -> $c")
    }
    // edge mass: total copies = total non-origin occurrences of dup groups
    assert(got.map(_._3).sum == groups.values.map(_.length - 1).sum.toLong)
  }

  test("paragraphDedup: every doc covered, kills occur, untouched docs round-trip exactly") {
    val docs = graft.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    val out = Dedup.paragraphDedup(spark, sf)
      .as[(Long, Int, Int, String)].collect()
    assert(out.length == docs.size) // one row per document, none dropped
    out.foreach { case (id, nPars, nKept, _) =>
      assert(nPars >= 1 && nKept >= 0 && nKept <= nPars, s"doc $id")
    }
    // the synthetic near-dups share CDC-cut paragraphs → real kills
    assert(out.exists { case (_, nPars, nKept, _) => nKept < nPars })
    // a doc that lost nothing re-assembles to its EXACT original text
    // (paragraphs partition the word sequence; join(" ") inverts the cut)
    val untouched = out.filter { case (_, nPars, nKept, _) => nKept == nPars }
    assert(untouched.nonEmpty)
    untouched.foreach { case (id, _, _, clean) => assert(clean == docs(id), s"doc $id") }
    // determinism: a second evaluation reproduces the identical result
    val again = Dedup.paragraphDedup(spark, sf).as[(Long, Int, Int, String)].collect()
    assert(out.toSet == again.toSet)
  }

  test("paragraphDedup DataFrame form: a planted shared paragraph is killed exactly once") {
    // find a CDC boundary word driver-side (md5-60 ≡ 0 mod 16 — same rule
    // as the operator), then plant an identical boundary-delimited span in
    // two docs: content-defined cutting guarantees both emit the same
    // paragraph regardless of where it sits in each doc
    val boundary = (0 until 1000).map(i => s"w$i")
      .find(w => Dedup.md5Hash60Ref(w) % 16 == 0).get
    val plain = (0 until 1000).map(i => s"w$i")
      .filter(w => Dedup.md5Hash60Ref(w) % 16 != 0)
    val shared = s"$boundary ${plain(0)} ${plain(1)} ${plain(2)}"
    val docs = Seq(
      (1L, s"${plain(3)} ${plain(4)} $shared $boundary ${plain(5)}"),
      (2L, s"${plain(6)} $shared $boundary ${plain(7)} ${plain(8)}"),
      (3L, s"${plain(9)} ${plain(10)}")
    ).toDF("doc_id", "text")
    val out = Dedup.paragraphDedup(docs, boundaryMod = 16)
      .as[(Long, Int, Int, String)].collect().sortBy(_._1)
    val Array(d1, d2, d3) = out
    assert(d1._2 == d1._3, "doc 1 holds every first occurrence")
    assert(d2._3 == d2._2 - 1, "doc 2 loses exactly the planted paragraph")
    assert(!d2._4.split(" ").contains(plain(1)), "killed span absent from doc 2's clean text")
    assert(d3._2 == d3._3 && d3._4 == s"${plain(9)} ${plain(10)}", "untouched doc round-trips")
  }

  test("decontaminate removes exactly the contaminated ids from the non-bench corpus") {
    val cleaned = Dedup.decontaminate(spark, sf).select($"doc_id").as[Long].collect().toSet
    val hits = Dedup.contaminationPairs(spark, sf)
      .select($"doc_id").as[Long].collect().toSet
    val corpus = graft.Tables.documents(spark, sf)
      .filter($"doc_id" >= 20).select($"doc_id").as[Long].collect().toSet
    assert(hits.nonEmpty && cleaned == corpus -- hits)
  }

  test("bloom decontamination equals the broadcast-join x31 exactly; prefilter actually prunes") {
    val viaBloom = Dedup.bloomDecontamination(spark, sf)
      .as[(Long, Long, Long)].collect().toSet
    val viaJoin = Dedup.contaminationPairs(spark, sf)
      .as[(Long, Long, Long)].collect().toSet
    assert(viaBloom == viaJoin && viaBloom.nonEmpty) // lossless end-to-end
    // effectiveness: the bit test must pass few non-matching shingles. With
    // m=65536 / k=3 vs ~1k benchmark shingles the FP rate is ~(kn/m)^3;
    // measure it on the corpus side directly: survivors of the prefilter
    // should be dominated by TRUE matches, not false positives.
    val shingles = graft.Tables.documents(spark, sf)
      .select($"doc_id", explode(graft.functions.HashSignatures.word_shingles($"text", 5)).as("sh"))
    val benchSet = shingles.filter($"doc_id" < 20)
      .select($"sh").as[String].collect().toSet
    val corpus = shingles.filter($"doc_id" >= 20).select($"sh").as[String].collect()
    val trueMatches = corpus.count(benchSet)
    // upper-bound survivors via the exact join x43 performs internally is
    // not observable; bound the FP budget instead: non-matching shingles
    // times the analytic FP rate stays far below the true-match count
    val fpBudget = (corpus.length - trueMatches) * math.pow(3.0 * benchSet.size / 65536.0, 3)
    assert(fpBudget < trueMatches.toDouble.max(1.0),
      s"bloom sizing too small: fpBudget=$fpBudget trueMatches=$trueMatches")
  }

  test("chunkDocuments covers every token with correct overlap and no shuffle") {
    val chunks = TextAnalysis.chunkDocuments(spark, sf, chunkTokens = 64, stride = 32)
    val rows = chunks.as[(Long, Int, Int, String)].collect()
    val nWords = graft.Tables.documents(spark, sf)
      .select($"doc_id", size(split($"text", " "))).as[(Long, Int)].collect().toMap
    rows.groupBy(_._1).foreach { case (id, cs) =>
      val n = nWords(id)
      val expected = math.max(n - 64 + 31, 31) / 32 + 1 // ceil((n-64)/32)+1, min 1
      assert(cs.length == expected, s"doc $id: ${cs.length} chunks for $n words")
      assert(cs.forall(_._3 <= 64) && cs.map(_._3).max <= 64, s"doc $id chunk size")
      // stride coverage: token count summed over chunks = n + overlap of
      // 32 tokens per chunk boundary (last chunk may run short)
      val ids = cs.map(_._2).sorted
      assert(ids.head == 0 && ids.last == expected - 1 && ids.distinct.length == expected)
    }
    // per-row flatMap only: the physical plan has no exchange at all
    val plan = chunks.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "chunking must not shuffle")
  }

  test("incremental paragraph dedup: statuses partition, boundary=0 degenerates to x39") {
    val rows = Dedup.incrementalParagraphDedup(spark, sf, newMinId = 50)
      .as[(Long, Int, Int, Int, Int)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, nPars, k, de, db) =>
      assert(id >= 50 && k + de + db == nPars, s"doc $id: statuses must partition")
    }
    // the synthetic near-dups straddle any boundary: both dup classes occur
    assert(rows.exists(_._4 > 0), "no dup_of_existing found")
    // with no existing corpus the per-doc kept counts equal x39's
    val inc0 = Dedup.incrementalParagraphDedup(spark, sf, newMinId = 0)
      .select($"doc_id", $"n_kept").as[(Long, Int)].collect().toMap
    val x39 = Dedup.paragraphDedup(spark, sf)
      .select($"doc_id", $"n_kept").as[(Long, Int)].collect().toMap
    assert(inc0 == x39)
  }

  test("persisted digest index: day-2 ingest matches in-line x44 and never rescans the corpus") {
    val root = java.nio.file.Files.createTempDirectory("graft-ingest").toString
    val docs = graft.Tables.documents(spark, sf)
    val boundary = Dedup.IncrementalNewMinId
    // day 1: persist the existing corpus and ITS digest index as separate
    // parquet locations (the immutable snapshot + its precomputed index)
    docs.filter($"doc_id" < boundary)
      .write.parquet(s"$root/existing_docs.parquet")
    Dedup.writeParagraphIndex(
      spark.read.parquet(s"$root/existing_docs.parquet"), s"$root/fp_index.parquet")
    // day 2: a fresh batch arriving as its own table
    docs.filter($"doc_id" >= boundary).write.parquet(s"$root/batch_docs.parquet")
    val batch = spark.read.parquet(s"$root/batch_docs.parquet")
    val viaIndex = Dedup.incrementalIngestWithIndex(spark, batch, s"$root/fp_index.parquet")
    // identical result to the in-line snapshot formulation over the union
    val inline = Dedup.incrementalParagraphDedup(spark, sf, newMinId = boundary)
      .as[(Long, Int, Int, Int, Int)].collect().toSet
    assert(viaIndex.as[(Long, Int, Int, Int, Int)].collect().toSet == inline)
    // THE scale property: the day-2 plan scans index + batch only — the
    // existing corpus parquet appears nowhere in its file scans
    val plan = viaIndex.queryExecution.executedPlan.toString
    assert(!plan.contains("existing_docs"),
      s"day-2 ingest must not rescan the corpus:\n$plan")
    assert(plan.contains("fp_index") && plan.contains("batch_docs"), plan)
    // day 3: appending the batch's new digests keeps the index exact —
    // it now equals the digest set of the full union, with no duplicates
    Dedup.appendToParagraphIndex(spark, batch, s"$root/fp_index.parquet")
    val idx = spark.read.parquet(s"$root/fp_index.parquet")
      .as[String].collect().toSeq
    val expectIdx = Dedup.cdcParagraphs(docs, Dedup.ParagraphBoundaryMod)
      .select($"fp").distinct().as[String].collect().toSeq
    assert(idx.sorted == expectIdx.sorted && idx.distinct.length == idx.length)
  }

  test("band index (x96): persisted-index ingest ≡ in-flight split, no corpus rescan, day-3 append exact") {
    val root = java.nio.file.Files.createTempDirectory("graft-bandingest").toString
    val docs = graft.Tables.documents(spark, sf)
    val boundary = Dedup.BandIngestNewMinId
    // day 1: the immutable corpus snapshot + ITS persisted band index
    docs.filter($"doc_id" < boundary).write.parquet(s"$root/existing_docs.parquet")
    Dedup.writeBandIndex(
      spark.read.parquet(s"$root/existing_docs.parquet"), s"$root/band_index")
    // day 2: a fresh batch classified against the index alone
    docs.filter($"doc_id" >= boundary).write.parquet(s"$root/batch_docs.parquet")
    val batch = spark.read.parquet(s"$root/batch_docs.parquet")
    val viaIndex = Dedup.ingestWithBandIndex(spark, batch, s"$root/band_index")
    val inline = Dedup.incrementalBandIngest(spark, sf)
      .as[(Long, String, Long, Long, Long)].collect().toSet
    assert(viaIndex.as[(Long, String, Long, Long, Long)].collect().toSet == inline)
    assert(inline.nonEmpty && inline.exists(_._2 != "kept"),
      "fixture must exercise at least one duplicate classification")
    // every status obeys the first-occurrence-wins contract
    inline.foreach { case (id, status, rep, nEx, nIn) =>
      status match {
        case "dup_of_existing" => assert(rep < boundary && nEx > 0, s"doc $id")
        case "dup_in_batch"    => assert(rep >= boundary && rep < id && nIn > 0 && nEx == 0, s"doc $id")
        case "kept"            => assert(rep == id && nEx == 0 && nIn == 0, s"doc $id")
      }
    }
    // THE scale property: day-2 classification scans index + batch only
    val plan = viaIndex.queryExecution.executedPlan.toString
    assert(!plan.contains("existing_docs"),
      s"day-2 ingest must not rescan the corpus:\n$plan")
    assert(plan.contains("band_index") && plan.contains("batch_docs"), plan)
    // day 3: appending the batch makes the index ≡ a fresh full build
    Dedup.appendToBandIndex(spark, batch, s"$root/band_index")
    Dedup.writeBandIndex(docs, s"$root/band_index_full")
    def table(p: String) = spark.read.parquet(p)
    assert(table(s"$root/band_index/bands").as[(Long, Int, String)].collect().toSet ==
      table(s"$root/band_index_full/bands").as[(Long, Int, String)].collect().toSet)
    assert(table(s"$root/band_index/sigs").select($"doc_id").as[Long].collect().toSet ==
      table(s"$root/band_index_full/sigs").select($"doc_id").as[Long].collect().toSet)
  }

  test("cluster ingest (x98): persisted artifacts ≡ in-flight; labels consistent with the snapshot") {
    val root = java.nio.file.Files.createTempDirectory("graft-clusteringest").toString
    val docs = graft.Tables.documents(spark, sf)
    val boundary = Dedup.BandIngestNewMinId
    val existing = docs.filter($"doc_id" < boundary)
    // day 1: snapshot + BOTH staged artifacts (band index, cluster table)
    existing.write.parquet(s"$root/existing_docs.parquet")
    val snap = spark.read.parquet(s"$root/existing_docs.parquet")
    Dedup.writeBandIndex(snap, s"$root/band_index")
    ClusterStage.writeClusterTable(snap, s"$root/clusters")
    // day 2: classify the batch against the artifacts alone
    docs.filter($"doc_id" >= boundary).write.parquet(s"$root/batch_docs.parquet")
    val batch = spark.read.parquet(s"$root/batch_docs.parquet")
    val viaIndex = Dedup.ingestClustersWithIndex(
      spark, batch, s"$root/band_index", s"$root/clusters")
    val inline = Dedup.incrementalClusterIngest(spark, sf)
      .as[(Long, Long, String)].collect().toSet
    assert(viaIndex.as[(Long, Long, String)].collect().toSet == inline)
    assert(Set("joins_existing", "singleton").subsetOf(inline.map(_._3)),
      s"fixture must exercise joins and singletons: ${inline.map(_._3)}")
    // label-space invariants per status
    val exCanon = Dedup.nearDupClusters(spark.read.parquet(s"$root/existing_docs.parquet"), 5, 0.3)
      .select($"canonical_id").distinct().as[Long].collect().toSet
    inline.foreach { case (id, canon, status) =>
      status match {
        case "joins_existing" => assert(canon < boundary && exCanon.contains(canon), s"doc $id")
        case "new_cluster"    => assert(canon >= boundary && canon <= id, s"doc $id")
        case "singleton"      => assert(canon == id, s"doc $id")
      }
    }
    // the day-2 plan reads artifacts + batch only — never the corpus
    // text (the band-index scans live inside the CC engine's
    // localCheckpointed subtree, so the FINAL plan shows the cluster
    // table, the batch, and the checkpointed labels)
    val plan = viaIndex.queryExecution.executedPlan.toString
    assert(!plan.contains("existing_docs"),
      s"day-2 cluster ingest must not rescan the corpus:\n$plan")
    assert(plan.contains("clusters") && plan.contains("batch_docs"), plan)
  }

  test("CharGramHashes kernel == HOF twin, including multibyte boundaries and short rows") {
    val k = Dedup.DecontamGramChars
    // real corpus: identical gram sets per doc (same md5-60 values)
    val docs = graft.Tables.documents(spark, sf).filter(length($"text") >= k)
    def sets(c: org.apache.spark.sql.Column) =
      docs.select($"doc_id", c.as("g")).as[(Long, Seq[Long])].collect()
        .map(t => t._1 -> t._2.toSet).toMap
    assert(sets(Dedup.charGramHashes($"text", k)) == sets(Dedup.charGramHashesHof($"text", k)))
    // multibyte fixture: é/ö/四-byte emoji sit on char boundaries — kernel
    // must count CHARACTERS as Spark's substr does, not bytes; plus a
    // below-k row (kernel returns empty; HOF needs the length filter)
    val fx = Seq((1L, "héllo wörld décontamination tests naïve façade — 😀 emoji padding here"),
                 (2L, "ascii only plain text row long enough for some grams yes"),
                 (3L, "short"))
      .toDF("doc_id", "text")
    val kfx = 10
    val a = fx.filter(length($"text") >= kfx)
      .select($"doc_id", Dedup.charGramHashes($"text", kfx).as("g"))
      .as[(Long, Seq[Long])].collect().map(t => t._1 -> t._2).toMap
    val b = fx.filter(length($"text") >= kfx)
      .select($"doc_id", Dedup.charGramHashesHof($"text", kfx).as("g"))
      .as[(Long, Seq[Long])].collect().map(t => t._1 -> t._2).toMap
    assert(a == b && a.contains(1L)) // exact order too: both first-occurrence
    val empty = Seq((3L, "short")).toDF("doc_id", "text")
      .select(Dedup.charGramHashes($"text", kfx)).as[Seq[Long]].head()
    assert(empty.isEmpty)
  }

  test("substringDecontaminate partitions the non-benchmark corpus with the x62 flags") {
    val flagged = Dedup.exactSubstringContamination(spark, sf)
      .select($"doc_id").as[Long].collect().toSet
    val clean = Dedup.substringDecontaminate(spark, sf)
      .select($"doc_id").as[Long].collect().toSet
    val corpus = graft.Tables.documents(spark, sf)
      .filter($"doc_id" >= Dedup.DecontamBenchMaxId)
      .select($"doc_id").as[Long].collect().toSet
    assert(flagged.nonEmpty && (flagged & clean).isEmpty && (flagged | clean) == corpus)
  }

  test("bestKeepCorpus (x70): per-cluster best by (priority, longest, id), priority fold") {
    val labels = Dedup.nearDupClusters(spark, sf).as[(Long, Long)].collect().toMap
    val docs = graft.Tables.documents(spark, sf)
      .select($"doc_id", $"source", $"lang", $"n_chars")
      .as[(Long, String, String, Long)].collect()
    // driver reference: the lexicographic (priority, -n_chars, doc_id) argmin
    def expect(prio: Map[String, Int]): Set[(Long, Long, String, String, Long, Long)] = {
      val unlisted = if (prio.isEmpty) 0 else prio.values.max + 1
      docs.groupBy(d => labels(d._1)).map { case (cid, ms) =>
        val best = ms.minBy(d => (prio.getOrElse(d._2, unlisted), -d._4, d._1))
        (cid, best._1, best._2, best._3, best._4, ms.length.toLong)
      }.toSet
    }
    val gotDefault = Dedup.bestKeepCorpus(spark, sf)
      .as[(Long, Long, String, String, Long, Long)].collect().toSet
    assert(gotDefault == expect(Map.empty))
    assert(gotDefault.exists(_._6 > 1), "multi-member clusters must exist")
    // the longest-member rule must actually override min-id somewhere
    val minIdPicks = docs.groupBy(d => labels(d._1)).map { case (cid, ms) =>
      (cid, ms.map(_._1).min)
    }.toSet
    assert(gotDefault.map(t => (t._1, t._2)) != minIdPicks,
      "x70 must differ from x57's min-id rule on this corpus")
    // priority fold: find a source whose promotion changes at least one
    // pick, then assert exact parity under that map
    val prioSrc = docs.map(_._2).distinct.sorted
      .find(s => expect(Map(s -> 0)) != expect(Map.empty))
    assert(prioSrc.nonEmpty, "some source priority must change a pick")
    val prio = Map(prioSrc.get -> 0)
    val gotPrio = Dedup.bestKeepCorpus(
      spark, sf, Dedup.nearDupClusters(spark, sf), prio)
      .as[(Long, Long, String, String, Long, Long)].collect().toSet
    assert(gotPrio == expect(prio) && gotPrio != gotDefault)
  }

  /** Driver reference for x68: grams via the declarative HOF twin of the
    * gram kernel, df cap and pairwise counting brute-forced in Scala. */
  private def crossDocPairsRef(docs: org.apache.spark.sql.DataFrame,
                               maxGramDf: Int): Set[(Long, Long, Long)] = {
    val k = Dedup.DecontamGramChars
    val grams = docs
      .filter(length($"text") >= k)
      .select($"doc_id", Dedup.charGramHashesHof($"text", k).as("gs"))
      .as[(Long, Seq[Long])].collect()
      .map { case (id, gs) => (id, gs.filter(_ % Dedup.CrossDocAnchorMod == 0)) }
    val byGram = grams.flatMap { case (id, gs) => gs.map(g => g -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sorted).toMap
    val pairCounts = scala.collection.mutable.Map.empty[(Long, Long), Long]
    byGram.values.filter(_.size <= maxGramDf).foreach { ids =>
      for (i <- ids.indices; j <- i + 1 until ids.size)
        pairCounts((ids(i), ids(j))) = pairCounts.getOrElse((ids(i), ids(j)), 0L) + 1
    }
    pairCounts.collect {
      case ((a, b), c) if c >= Dedup.CrossDocMinShared => (a, b, c)
    }.toSet
  }

  test("crossDocSubstringPairs: driver parity via the HOF twin, bucketed join plan") {
    val expect = crossDocPairsRef(graft.Tables.documents(spark, sf),
      Dedup.CrossDocMaxGramDf)
    val q = Dedup.crossDocSubstringPairs(spark, sf)
    val got = q.as[(Long, Long, Long)].collect().toSet
    assert(got == expect && got.nonEmpty)
    // plan: stop-list removal is an UNHINTED anti-join (the >df gram set
    // is corpus-growing on real crawls — AQE chooses broadcast vs shuffle
    // from the measured size); no cartesian product anywhere (the
    // self-join keys on the gram hash)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), plan)
    assert(!plan.contains("Cartesian"), plan)
  }

  test("crossDocSubstringDedup (x72): keeps exactly the docs with no lower-id partner") {
    val pairs = crossDocPairsRef(graft.Tables.documents(spark, sf),
      Dedup.CrossDocMaxGramDf)
    val flagged = pairs.map(_._2)
    val all = graft.Tables.documents(spark, sf).select($"doc_id").as[Long].collect().toSet
    val expect = all -- flagged
    val got = Dedup.crossDocSubstringDedup(spark, sf)
      .select($"doc_id").as[Long].collect().toSet
    assert(got == expect)
    assert(flagged.nonEmpty && got.nonEmpty, "removal must fire both ways")
    // first-occurrence-wins: the minimum id of every partner pair survives
    pairs.foreach { case (a, _, _) => if (!flagged.contains(a)) assert(got.contains(a)) }
  }

  test("crossDocSubstringPairs: the hot-gram stop-list drops boilerplate-only pairs") {
    // 25 docs all share one boilerplate span (df 25 > cap 20); docs 0 and
    // 1 additionally share a unique span. Only the (0, 1) pair may
    // survive, and its gram count must exclude every capped gram —
    // checked against the same driver reference WITH the cap, and
    // against a no-cap reference to prove the cap changed the answer.
    val boiler = "THE SAME FOOTER EVERYWHERE REPEATED" // > 24 chars
    val uniq = "a genuinely shared unique span"        // > 24 chars
    val fx = (0L until 25L).map { i =>
      val extra = if (i <= 1) s" $uniq" else ""
      // per-doc prefix = a run of a letter unique to the doc, so every
      // gram touching ANY prefix char (including the boiler boundary)
      // is doc-unique
      (i, s"${('a' + i.toInt).toChar.toString * 30} $boiler$extra")
    }.toDF("doc_id", "text")
    val got = Dedup.crossDocSubstringPairs(
      fx, Dedup.DecontamGramChars, Dedup.CrossDocMaxGramDf, Dedup.CrossDocMinShared,
      Dedup.CrossDocAnchorMod)
      .as[(Long, Long, Long)].collect().toSet
    assert(got.map(t => (t._1, t._2)) == Set((0L, 1L)),
      s"only the unique-span pair may survive the cap: $got")
    assert(got == crossDocPairsRef(fx, Dedup.CrossDocMaxGramDf))
    val uncapped = crossDocPairsRef(fx, Int.MaxValue)
    assert(uncapped.size > got.size, "without the cap every boilerplate pair appears")
  }

  test("spanDedupStats (x82): exact match with a driver-side islands replica; totals reconcile") {
    val k = Dedup.DecontamGramChars
    val docs = graft.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    // driver replica: per-position anchored hashes -> min owner -> islands
    val posHashes = docs.map { case (id, t) =>
      id -> (0 to t.length - k).map(i => Dedup.md5Hash60Ref(t.substring(i, i + k)))
        .zipWithIndex.collect { case (h, p) if h % Dedup.CrossDocAnchorMod == 0 => (p, h) }
    }.toMap
    val owner = posHashes.toSeq.flatMap { case (id, ph) => ph.map { case (_, h) => (h, id) } }
      .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val want = docs.flatMap { case (id, t) =>
      val flagged = posHashes(id).collect { case (p, h) if owner(h) < id => p }.sorted
      if (flagged.isEmpty) None
      else {
        var spans = List.empty[(Int, Int)]
        flagged.foreach { p =>
          spans match {
            case (s, e) :: rest if p < e => spans = (s, math.max(e, p + k)) :: rest
            case _ => spans = (p, p + k) :: spans
          }
        }
        Some((id, spans.size.toLong, spans.map(s => s._2 - s._1).sum.toLong,
          t.length.toLong - spans.map(s => s._2 - s._1).sum))
      }
    }.toSet
    val got = Dedup.spanDedupStats(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == want && got.nonEmpty)
    // removal is partial: affected docs keep some chars (span-level, not doc-level)
    assert(got.exists(_._4 > 0))
  }

  test("tokenDrift: exact integer scores vs driver reference, single corpus pass + top-k plan") {
    val q = TextAnalysis.tokenDrift(spark, sf)
    val got = q.as[(String, Long, Long, Long)].collect()
    assert(got.length == 20)
    // driver reference: exact counts and cross-multiplied scores
    val docs = graft.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val counts = scala.collection.mutable.Map.empty[String, (Long, Long)]
    docs.foreach { case (id, t) =>
      t.split(" ", -1).foreach { w =>
        val (o, n) = counts.getOrElse(w, (0L, 0L))
        if (id >= Dedup.IncrementalNewMinId) counts(w) = (o, n + 1)
        else counts(w) = (o + 1, n)
      }
    }
    val nOld = counts.values.map(_._1).sum
    val nNew = counts.values.map(_._2).sum
    val expect = counts.toSeq
      .map { case (w, (o, n)) => (w, o, n, math.abs(o * nNew - n * nOld)) }
      .sortBy(t => (-t._4, t._1)).take(20)
    assert(got.toSeq == expect)
    // plan: the corpus-derived shuffle is the vocab aggregate; the global
    // totals fold back as a broadcast 1-row agg (NO unpartitioned window —
    // the vocab table is corpus-scale, a single-task WindowExec would be
    // the 100 TB bottleneck) and the cut is a distributed top-k
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Window"),
      s"no corpus-derived frame may feed a WindowExec:\n$plan")
    assert("FileScan parquet".r.findAllIn(plan).length <= 2, // totals branch reuses the vocab exchange
      s"corpus must be scanned at most twice (exchange reuse):\n$plan")
  }

  test("repetition metrics/filter: driver parity, filter fires both ways, zero shuffle") {
    val got = TextAnalysis.repetitionMetrics(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5, t._6))).toMap
    val docs = graft.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val expect = docs.map { case (id, t) =>
      val ws = t.split(" ", -1).toSeq
      val bg = ws.zip(ws.drop(1)).map(p => p._1 + " " + p._2)
      id -> ((ws.size.toLong, ws.distinct.size.toLong,
        ws.groupBy(identity).values.map(_.size).max.toLong,
        bg.size.toLong, (bg.size - bg.distinct.size).toLong))
    }.toMap
    assert(got == expect)
    // the filter applies the shared rules to the same numbers
    val kept = TextAnalysis.repetitionFilter(spark, sf)
      .select($"doc_id").as[Long].collect().toSet
    val expectKept = expect.filter { case (_, (nw, nd, tf, n2, d2)) =>
      (nw - nd) * 100 <= nw * TextAnalysis.RepMaxDupWordPct &&
        tf * 100 <= nw * TextAnalysis.RepMaxTopWordPct &&
        d2 * 100 <= n2 * TextAnalysis.RepMaxDup2gramPct
    }.keySet
    assert(kept == expectKept)
    assert(kept.nonEmpty && kept.size < docs.length, "filter must fire both ways")
    // both are single-scan per-row projections — no exchange anywhere
    Seq(TextAnalysis.repetitionMetrics(spark, sf), TextAnalysis.repetitionFilter(spark, sf))
      .foreach { q =>
        val plan = q.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"), s"repetition ops must not shuffle:\n$plan")
      }
  }

  test("count-min sketch never underestimates and is exact for most heavy hitters") {
    val rows = TextAnalysis.countMinHeavyHitters(spark, sf)
      .as[(String, Long, Long, Long)].collect()
    assert(rows.length == 20)
    rows.foreach { case (w, tru, est, over) =>
      assert(est >= tru, s"count-min underestimated '$w'") // one-sided error
      assert(over == est - tru)
    }
    // with width 1024 vs a small vocabulary, collisions are rare: the
    // majority of heavy hitters estimate exactly
    assert(rows.count { case (_, tru, est, _) => est == tru } > 10)
    // and the estimates agree with the exact x21 vocabulary counts
    val exact = TextAnalysis.vocabularyStats(spark, sf)
      .select($"word", $"term_freq").as[(String, Long)].collect().toMap
    rows.foreach { case (w, tru, _, _) => assert(exact(w) == tru) }
  }

  test("rare-token ratio covers every doc, ratios in [0,1], flag consistent") {
    val rows = TextAnalysis.rareTokenStats(spark, sf)
      .as[(Long, Long, Long, Long, Double, Int)].collect()
    assert(rows.length == graft.Tables.documents(spark, sf).count())
    rows.foreach { case (id, nTok, nRare, nDist, ratio, flag) =>
      assert(nRare <= nTok && nDist <= nTok, s"doc $id")
      assert(ratio >= 0.0 && ratio <= 1.0, s"doc $id")
      assert(flag == (if (ratio >= 0.5) 1 else 0), s"doc $id")
    }
    // the synthetic corpus draws from a small vocabulary, so hapax-like
    // tokens exist but dominate few docs — both populations present
    assert(rows.exists(_._3 > 0))
  }

  test("bigramFamiliarity scores every multi-word doc; shared phrasing scores higher than unique") {
    val rows = TextAnalysis.bigramFamiliarity(spark, sf)
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.length == graft.Tables.documents(spark, sf).count()) // corpus has no 1-word docs
    rows.foreach { case (id, nBg, sumCf, fam) =>
      assert(nBg > 0 && sumCf >= nBg, s"doc $id") // each bigram counts at least itself
      assert(fam >= 1.0, s"doc $id")
      assert(math.abs(fam - sumCf.toDouble / nBg) == 0.0, s"doc $id")
    }
    // a doc of corpus-unique bigrams must score exactly 1.0; synthetic
    // check on a planted corpus: one doc repeats a phrase, one is unique
    val dir = java.nio.file.Files.createTempDirectory("graft-bigram").toString
    Seq((1L, "p q p q p q", "web"), (2L, "aa bb cc dd", "web"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val planted = TextAnalysis.bigramFamiliarity(spark, dir)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r._4).toMap
    assert(planted(2L) == 1.0)  // every bigram unique
    assert(planted(1L) > 2.0)   // "p q" ×3 and "q p" ×2 reinforce each other
  }

  test("bigramFluency (x94): exact driver replica; fluent repetition outranks unique gibberish") {
    // driver-side BigInt replica of the conditional-points algebra
    val docs = graft.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val occ = docs.flatMap { case (id, t) =>
      val ws = t.split(" ", -1); ws.indices.dropRight(1).map(i => (id, ws(i), s"${ws(i)} ${ws(i + 1)}"))
    }
    val c2 = occ.groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val c1 = occ.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val want = docs.map { case (id, _) =>
      val qs = occ.filter(_._1 == id)
        .map { case (_, w1, bg) => TextAnalysis.FluencyScale * c2(bg) / c1(w1) }
      id -> (qs.length.toLong, if (qs.isEmpty) 0L else qs.sum / qs.length)
    }.toMap
    val got = TextAnalysis.bigramFluency(spark, sf)
      .as[(Long, Long, Long)].collect()
    assert(got.length == docs.length)
    got.foreach { case (id, nBg, ppm) =>
      assert((nBg, ppm) == want(id), s"doc $id")
      assert(ppm >= 0L && ppm <= TextAnalysis.FluencyScale) // q <= Scale since c2 <= c1
    }
    // planted corpus: repeated fluent phrasing vs one-off continuations,
    // plus a 1-word doc exercising the (0,0) left-join rule
    val dir = java.nio.file.Files.createTempDirectory("graft-fluency").toString
    Seq((1L, "p q p q p q", "web"), (2L, "p a p b p c", "web"), (3L, "solo", "web"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val planted = TextAnalysis.bigramFluency(spark, dir)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(planted(3L) == (0L, 0L))
    // doc 1: "p q" always follows p (3 of 8 p-starts -> 375000 each for p q;
    // q->p is deterministic); doc 2's p-continuations are 1-of-8 each
    assert(planted(1L)._2 > planted(2L)._2, s"fluent $planted")
  }

  test("pmiBigrams (x103): exact driver replica; collocations outrank chance pairs") {
    val docs = graft.Tables.documents(spark, sf)
      .select($"text").as[String].collect()
    val tokens = docs.flatMap(_.split(" ", -1))
    val uni = tokens.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val n = tokens.length.toLong
    val bg = docs.flatMap { t =>
      val ws = t.split(" ", -1); ws.indices.dropRight(1).map(i => (ws(i), ws(i + 1)))
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val want = bg.filter(_._2 >= TextAnalysis.PmiMinCount).map { case ((w1, w2), cxy) =>
      (w1, w2) -> (cxy, uni(w1), uni(w2),
        TextAnalysis.PmiScale * cxy * n / (uni(w1) * uni(w2)))
    }
    val wantTop = want.toSeq
      .sortBy { case ((w1, w2), (_, _, _, pmi)) => (-pmi, w1, w2) }
      .take(TextAnalysis.PmiTopK)
    val got = TextAnalysis.pmiBigrams(spark, sf)
      .as[(String, String, Long, Long, Long, Long)].collect()
    assert(got.length == wantTop.length && got.nonEmpty)
    // orderBy.limit returns the top-k SET; compare as sets on the full row
    val gotSet = got.map(r => ((r._1, r._2), (r._3, r._4, r._5, r._6))).toSet
    assert(gotSet == wantTop.toSet)
    // planted corpus: an always-together pair must outrank a chance
    // co-occurrence of two independently frequent words
    val dir = java.nio.file.Files.createTempDirectory("graft-pmi").toString
    // aa/bb always adjacent; cc/dd adjacent 5x but mostly apart
    val glued = Seq.fill(6)("aa bb").mkString(" ")
    val chance = Seq.fill(5)("cc dd cc zz dd zz").mkString(" ")
    Seq((1L, glued, "web"), (2L, chance, "web")).toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val planted = TextAnalysis.pmiBigrams(spark, dir, minCount = 5, k = 10)
      .as[(String, String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._6).toMap
    assert(planted(("aa", "bb")) > planted(("cc", "dd")), s"collocation must outrank: $planted")
  }

  test("sourceVocabAudit (x105): exact driver replica; template spam collapses TTR") {
    val docs = graft.Tables.documents(spark, sf)
      .select($"source", $"text").as[(String, String)].collect()
    val want = docs.groupBy(_._1).map { case (src, rows) =>
      val toks = rows.flatMap(_._2.split(" ", -1))
      val byTok = toks.groupBy(identity).view.mapValues(_.length).toMap
      src -> (toks.length.toLong, byTok.size.toLong,
        byTok.count(_._2 == 1).toLong)
    }
    val got = TextAnalysis.sourceVocabAudit(spark, sf)
      .as[(String, Long, Long, Long, Double, Double)].collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { case (src, nTok, nTyp, nHap, ttr, hr) =>
      val (wTok, wTyp, wHap) = want(src)
      assert((nTok, nTyp, nHap) == (wTok, wTyp, wHap), s"source $src")
      assert(ttr == nTyp.toDouble / nTok && hr == nHap.toDouble / nTyp)
    }
    // planted: a looped template vs fresh prose of the same length —
    // the template's TTR must collapse and its hapax share vanish
    val dir = java.nio.file.Files.createTempDirectory("graft-vocab").toString
    Seq((1L, ("buy now click here " * 25).trim, "en", "spam", 0L),
      (2L, (1 to 100).map(i => s"w$i").mkString(" "), "en", "prose", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val planted = TextAnalysis.sourceVocabAudit(spark, dir)
      .as[(String, Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(planted("spam")._5 < 0.1 && planted("prose")._5 == 1.0)
    assert(planted("spam")._4 == 0L && planted("prose")._6 == 1.0)
  }

  test("vocabCoverage (x107): exact driver replica; vocab is broadcast into the probe") {
    val docs = graft.Tables.documents(spark, sf)
      .select($"source", $"text").as[(String, String)].collect()
    val all = docs.flatMap { case (s, t) => t.split(" ", -1).map(s -> _) }
    val vocab = all.map(_._2).groupBy(identity).view.mapValues(_.length).toSeq
      .sortBy { case (tok, c) => (-c, tok) }
      .take(TextAnalysis.VocabCoverageK).map(_._1).toSet
    val want = all.groupBy(_._1).map { case (src, toks) =>
      val n = toks.length.toLong
      val oov = toks.count(t => !vocab.contains(t._2)).toLong
      src -> (n, oov, 1000000L * oov / n)
    }
    val q = TextAnalysis.vocabCoverage(spark, sf)
    val got = q.as[(String, Long, Long, Long, Double)].collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { case (src, n, oov, ppm, cov) =>
      assert((n, oov, ppm) == want(src), s"source $src")
      assert(cov == (n - oov).toDouble / n)
    }
    // corpus-aware sanity: OOV exists iff the corpus vocabulary
    // overflows K (at sf0.001 it does not — everything is in-vocab)
    val nTypes = all.map(_._2).distinct.length
    if (nTypes > TextAnalysis.VocabCoverageK) assert(got.exists(_._3 > 0L))
    else assert(got.forall(r => r._3 == 0L && r._5 == 1.0))
    // small-k probe on the same corpus: shrinking the vocab must
    // strictly create OOV mass
    val tiny = TextAnalysis.vocabCoverage(spark, sf, k = 5)
      .as[(String, Long, Long, Long, Double)].collect()
    assert(tiny.exists(_._3 > 0L) && tiny.forall(_._5 < 1.0))
    // the O(K) vocab side must broadcast into the corpus probe
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
  }

  test("codeSwitch (x109): chunk totals reconcile; planted bilingual doc flags, pure doc does not") {
    val got = TextAnalysis.codeSwitch(spark, sf)
      .as[(Long, Long, Long, String, Double, Int)].collect()
    val nDocs = graft.Tables.documents(spark, sf).count()
    assert(got.length == nDocs)
    got.foreach { case (id, nCh, nL, _, agree, flag) =>
      // chunk count = ceil(words / chunkWords), languages partition chunks
      assert(nCh >= 1 && nL >= 1 && nL <= nCh, s"doc $id")
      assert(agree > 0.0 && agree <= 1.0)
      assert(flag == (if (nL > 1) 1 else 0))
      if (nL == 1) assert(agree == 1.0)
    }
    // a 1-chunk doc reproduces x06's per-doc prediction verbatim
    val short = graft.Tables.documents(spark, sf)
      .select($"doc_id", size(split($"text", " ")).as("nw")).as[(Long, Int)]
      .collect().filter(_._2 <= TextAnalysis.CodeSwitchChunkWords).map(_._1).toSet
    if (short.nonEmpty) {
      val x06 = TextAnalysis.languageId(spark, sf)
        .select($"doc_id", $"predicted_lang").as[(Long, String)].collect().toMap
      got.filter(r => short.contains(r._1)).foreach { r =>
        assert(r._4 == x06(r._1), s"doc ${r._1}: 1-chunk majority must equal x06")
      }
    }
    // planted: English body + German tail in chunk-width blocks flags;
    // a pure-English doc of the same length does not
    val dir = java.nio.file.Files.createTempDirectory("graft-cs").toString
    val en = Seq.fill(20)("the cat is on the mat and the dog is here for now so").mkString(" ")
    val de = Seq.fill(5)("der hund ist ein tier und die katze ist ein tier zu").mkString(" ")
    Seq((1L, s"$en $de"), (2L, s"$en $en")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val planted = TextAnalysis.codeSwitch(spark, dir)
      .as[(Long, Long, Long, String, Double, Int)].collect()
      .map(r => r._1 -> r).toMap
    assert(planted(1L)._6 == 1 && planted(1L)._4 == "en" && planted(1L)._3 >= 2)
    assert(planted(2L)._6 == 0 && planted(2L)._4 == "en" && planted(2L)._5 == 1.0)
  }

  test("invertedIndex: exact df/cf, posting sample bounded and drawn from the token's docs") {
    val idx = TextAnalysis.invertedIndex(spark, sf)
      .as[(String, Long, Long, String)].collect()
    assert(idx.nonEmpty)
    val byToken = graft.Tables.documents(spark, sf)
      .select($"doc_id", explode(split($"text", " ")).as("token"))
      .as[(Long, String)].collect().groupBy(_._2)
    idx.foreach { case (token, df, cf, sample) =>
      val occ = byToken(token)
      assert(df == occ.map(_._1).distinct.length, s"$token df")
      assert(cf == occ.length, s"$token cf")
      val ids = sample.split(",").map(_.toLong)
      assert(ids.length == math.min(TextAnalysis.PostingSampleK, df), s"$token sample size")
      assert(ids.sorted.sameElements(ids), s"$token sample sorted")
      assert(ids.toSet.subsetOf(occ.map(_._1).toSet), s"$token sample membership")
    }
  }

  test("labelCentroids: quantized sums match brute force; corpus aggregates arrays, not elements") {
    val cent = Similarity.labelCentroids(spark, sf)
    val rows = cent.as[(Int, Long, Long, Long, Double)].collect()
    val dims = graft.Tables.embeddings(spark, sf)
      .select(size($"embedding")).as[Int].head()
    val labels = graft.Tables.embeddings(spark, sf)
      .select($"label").distinct().count()
    assert(rows.length == labels * dims)
    // brute-force reference via posexplode of the quantized vectors
    val ref = graft.Tables.embeddings(spark, sf)
      .select($"label", posexplode(transform($"embedding",
        x => floor(x.cast("double") * Similarity.CentroidQuantScale).cast("long"))).as(Seq("dim", "qv")))
      .groupBy($"label", $"dim").agg(sum($"qv").as("sum_q"))
      .as[(Int, Int, Long)].collect().map(r => (r._1, r._2.toLong) -> r._3).toMap
    rows.foreach { case (label, dim, nVecs, sumQ, cq) =>
      assert(sumQ == ref((label, dim)), s"label $label dim $dim")
      assert(cq == sumQ.toDouble / nVecs)
    }
    // scale shape: ONE aggregate over dim-length arrays with a map-side
    // partial phase; the posexplode happens after the agg (tiny result)
    val plan = cent.queryExecution.executedPlan.toString
    assert(plan.contains("partial_arraylongsum"), plan)
    assert(plan.indexOf("Generate") < plan.indexOf("ObjectHashAggregate"),
      "explode must sit above the aggregate in the plan (post-agg)")
  }

  test("sourceOverlap: identical sources estimate 1, disjoint estimate 0, estimates in [0,1]") {
    val dir = java.nio.file.Files.createTempDirectory("graft-overlap").toString
    val text1 = (1 to 40).map(i => s"alpha$i").mkString(" ")  // >= k-ish shingles
    val text2 = (1 to 40).map(i => s"beta$i").mkString(" ")
    Seq((1L, "sA", text1), (2L, "sB", text1), (3L, "sC", text2))
      .toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = Dedup.sourceOverlap(spark, dir)
      .as[(String, String, Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t._5).toMap
    assert(r(("sA", "sB")) == 1.0) // identical shingle sets: sketch exhaustive → exact
    assert(r(("sA", "sC")) == 0.0 && r(("sB", "sC")) == 0.0) // disjoint
    // real corpus: all pairs present, estimates valid probabilities
    val full = Dedup.sourceOverlap(spark, sf).as[(String, String, Long, Long, Double)].collect()
    val nSrc = graft.Tables.documents(spark, sf).select($"source").distinct().count()
    assert(full.length == nSrc * (nSrc - 1) / 2)
    full.foreach { case (a, b, m, u, j) =>
      assert(u > 0 && u <= Dedup.OverlapSketchK, s"$a-$b")
      assert(j >= 0.0 && j <= 1.0 && j == m.toDouble / u, s"$a-$b")
    }
  }

  test("domainScore: in-domain text hits 1.0, out-of-domain 0.0, model side pruned+broadcast") {
    val dir = java.nio.file.Files.createTempDirectory("graft-domain").toString
    Seq((1L, "spark shuffles data across the cluster", "web"),
        (25L, "spark shuffles data across the cluster", "web"),  // verbatim in-domain
        (26L, "unrelated words entirely outside target", "web"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = TextAnalysis.domainScore(spark, dir)
      .as[(Long, Long, Long, Long, Double)].collect().map(t => t._1 -> t).toMap
    assert(!r.contains(1L)) // target docs are not scored
    assert(r(25L)._5 == 1.0 && r(25L)._4 > 0)
    assert(r(26L)._5 == 0.0 && r(26L)._3 == 0 && r(26L)._4 == 0)
    // real corpus: every non-target doc scored, ratios valid
    val full = TextAnalysis.domainScore(spark, sf).as[(Long, Long, Long, Long, Double)].collect()
    val expected = graft.Tables.documents(spark, sf).filter($"doc_id" >= 20).count()
    assert(full.length == expected)
    full.foreach { case (id, nBg, hits, tcf, ratio) =>
      assert(hits <= nBg && ratio >= 0.0 && ratio <= 1.0, s"doc $id")
      assert((hits == 0) == (tcf == 0), s"doc $id")
    }
    // scale shape: the model builds from a doc_id-pruned scan and broadcasts
    val q = TextAnalysis.domainScore(spark, sf)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"))
    assert(plan.contains("LessThan(doc_id,20)"), "target filter must push into the scan")
  }

  test("lexicalDiversity: simpson in [0,1), 0 for degenerate text, max for all-distinct") {
    val dir = java.nio.file.Files.createTempDirectory("graft-lexdiv").toString
    Seq((1L, "x x x x x"), (2L, "a b c d e")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val planted = TextAnalysis.lexicalDiversity(spark, dir)
      .as[(Long, Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(planted(1L)._5 == 0.0 && planted(1L)._3 == 1)     // one type repeated
    assert(planted(2L)._5 == 0.8 && planted(2L)._3 == 5)     // 1 - 5/25: all distinct
    val rows = TextAnalysis.lexicalDiversity(spark, sf)
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(rows.length == graft.Tables.documents(spark, sf).count())
    rows.foreach { case (id, n, d, s2, simpson) =>
      assert(d <= n && s2 >= n, s"doc $id")
      assert(simpson >= 0.0 && simpson < 1.0, s"doc $id")
      assert(simpson == 1.0 - s2.toDouble / (n * n), s"doc $id")
    }
  }

  test("scoreDeciles: every doc bucketed 0-9, deciles monotone in score within source, no corpus shuffle") {
    val r = TextAnalysis.scoreDeciles(spark, sf).as[(Long, String, Long, Int)].collect()
    assert(r.length == graft.Tables.documents(spark, sf).count())
    r.foreach { case (id, _, _, d) => assert(d >= 0 && d <= 9, s"doc $id") }
    // within a source, a higher score can never land in a lower decile
    r.groupBy(_._2).values.foreach { docs =>
      docs.sortBy(_._3).sliding(2).foreach {
        case Array(a, b) => assert(a._4 <= b._4, s"${a._1} vs ${b._1}")
        case _ =>
      }
    }
    // calibration fires: multiple buckets occupied, roughly balanced overall
    val byDecile = r.groupBy(_._4).view.mapValues(_.length).toMap
    assert(byDecile.size >= 8)
    // scale shape: edge table broadcast, corpus side unshuffled
    val plan = TextAnalysis.scoreDeciles(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("nearDedupedCorpus keeps exactly one canonical doc per cluster") {
    val clusters = Dedup.nearDupClusters(spark, sf)
      .as[(Long, Long)].collect()
    val kept = Dedup.nearDedupedCorpus(spark, sf)
      .select($"doc_id").as[Long].collect().toSet
    val canonicals = clusters.map(_._2).toSet
    assert(kept == canonicals) // one survivor per cluster, and it's the canonical
    assert(kept.size < clusters.length) // dedup fires (corpus has near-dup clusters)
    clusters.filter(c => c._1 == c._2).foreach { case (id, _) =>
      assert(kept.contains(id)) // every canonical (incl. singletons) survives
    }
    // composable overload over precomputed (cached) labels ≡ standalone
    val cached = Dedup.nearDupClusters(spark, sf).cache()
    try {
      val viaCached = Dedup.nearDedupedCorpus(spark, sf, cached)
        .select($"doc_id").as[Long].collect().toSet
      assert(viaCached == kept)
    } finally cached.unpersist()
  }

  test("splitLeakage flags only non-train docs, thresholds respected, leakage present on corpus") {
    val r = Dedup.splitLeakage(spark, sf).as[(Long, String, Long, Long)].collect()
    assert(r.nonEmpty) // near-dup clusters straddle the hash split on this corpus
    val splits = Sampling.trainTestSplit(spark, sf)
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    r.foreach { case (id, split, partners, maxShared) =>
      assert(split != "train" && splits(id) == split, s"doc $id")
      assert(partners >= 1 && maxShared >= 3, s"doc $id")
    }
    // cross-check one flagged doc against a direct shingle-overlap count
    val (evalDoc, _, _, maxShared) = r.maxBy(_._4)
    val sh = graft.Tables.documents(spark, sf).select($"doc_id",
      explode(graft.functions.HashSignatures.word_shingles($"text", 5)).as("sh"))
    val evalSh = sh.filter($"doc_id" === evalDoc).select($"sh").as[String].collect().toSet
    val best = sh.filter($"doc_id" =!= evalDoc)
      .as[(Long, String)].collect().filter(t => splits(t._1) == "train")
      .groupBy(_._1).map(_._2.count(t => evalSh.contains(t._2))).max
    assert(best == maxShared, s"doc $evalDoc")
  }

  test("bpePairCounts: weighted pair counts match brute force; vocab side, not corpus, explodes") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe").toString
    Seq((1L, "abab ab"), (2L, "abab cd x")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = TextAnalysis.bpePairCounts(spark, dir)
      .as[(String, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    // "abab"×2 has pairs ab,ba,ab; "ab"×1 has ab; "cd"×1; "x" skipped
    assert(r("ab") == ((5L, 2L))) // 2·2 + 1 occurrences across 2 distinct words
    assert(r("ba") == ((2L, 1L)))
    assert(r("cd") == ((1L, 1L)))
    assert(!r.contains("x"))
    // the real corpus: argmax is a plausible frequent English pair and the
    // corpus-sized subtree is the word-count agg (explode sits above it)
    val q = TextAnalysis.bpePairCounts(spark, sf)
    val top = q.orderBy($"pair_count".desc, $"pair").as[(String, Long, Long)].head()
    assert(top._2 > 0 && top._1.length == 2)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.indexOf("Generate") < plan.indexOf("FileScan"),
      "pair explode must sit above the vocab aggregate, not on the scan")
  }

  test("BPE tokenizer: round-trip exact, first merge = x59 argmax, compression grows with merges") {
    // round-trip: concatenated tokens reproduce the de-spaced text
    val toks = TextAnalysis.bpeTokenize(spark, sf, nMerges = 40)
    val joined = toks.select($"doc_id", concat_ws("", $"tokens").as("glued"))
    val ref = graft.Tables.documents(spark, sf)
      .select($"doc_id", regexp_replace($"text", " ", "").as("glued"))
    assert(joined.except(ref).isEmpty && ref.except(joined).isEmpty)
    // the fit's first merge is x59's (deterministically tie-broken) argmax
    val vocab = graft.Tables.documents(spark, sf)
      .select(explode(split($"text", " ")).as("w"))
      .groupBy($"w").agg(count(lit(1)).as("freq"))
      .as[(String, Long)].collect().toSeq
    val firstMerge = TextAnalysis.fitBpeMerges(vocab, 1).head
    val top = TextAnalysis.bpePairCounts(spark, sf)
      .orderBy($"pair_count".desc, $"pair").as[(String, Long, Long)].head()
    assert(firstMerge._1 + firstMerge._2 == top._1)
    // more merges never increase the token count; both compress vs chars
    val n40 = toks.agg(sum($"n_tokens")).as[Long].head()
    val n5 = TextAnalysis.bpeTokenize(spark, sf, nMerges = 5)
      .agg(sum($"n_tokens")).as[Long].head()
    val nChars = graft.Tables.documents(spark, sf)
      .agg(sum(length(regexp_replace($"text", " ", "")))).as[Long].head()
    assert(n40 <= n5 && n5 < nChars)
    // greedy-rank encoding: a word equal to the first merge pair becomes ONE token
    val dir = java.nio.file.Files.createTempDirectory("graft-bpefit").toString
    Seq((1L, "abc abc ax")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val t = TextAnalysis.bpeTokenize(spark, dir, nMerges = 2)
      .select($"tokens").as[Seq[String]].head()
    // merges: (a,b) then (ab,c) — "abc" → one token, "ax" stays split
    assert(t == Seq("abc", "abc", "a", "x"))
  }

  test("BPE fit vocab is bounded: top-k plan, cap enforced, defaults reproduce the unbounded fit") {
    // the cap is enforced in-plan: asking for 5 collects exactly the 5 most
    // frequent words (freq desc, word asc tie-break), not the full vocab
    val top5 = TextAnalysis.bpeFitVocab(spark, sf, minFreq = 1L, vocabCap = 5)
    val full = TextAnalysis.bpeFitVocab(spark, sf, minFreq = 1L, vocabCap = Int.MaxValue)
    assert(top5.size == 5 && full.size > 5)
    assert(top5 == full.sortBy(t => (-t._2, t._1)).take(5))
    // the bounded fetch plans as a distributed top-k (per-partition limit +
    // tiny merge), never a full-vocab sort-then-collect
    val plan = TextAnalysis.bpeFitVocabDf(spark, sf, minFreq = 1L, vocabCap = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k plan, got:\n$plan")
    // the frequency floor drops below-floor words and nothing else
    val floor = TextAnalysis.bpeFitVocab(spark, sf, minFreq = 30L, vocabCap = Int.MaxValue)
    assert(floor == full.filter(_._2 >= 30L).sortBy(t => (-t._2, t._1)))
    // on a corpus whose vocab fits under the default bounds, the bounded
    // fit is the unbounded fit: identical tokens for every document
    assert(full.size < TextAnalysis.BpeVocabCap &&
      full.forall(_._2 >= TextAnalysis.BpeMinFreq))
    def tokens(minFreq: Long, cap: Int): Map[Long, Seq[String]] =
      TextAnalysis.bpeTokenize(spark, sf, nMerges = 12, minFreq = minFreq, vocabCap = cap)
        .select($"doc_id", $"tokens").as[(Long, Seq[String])].collect().toMap
    assert(tokens(TextAnalysis.BpeMinFreq, TextAnalysis.BpeVocabCap) ==
      tokens(1L, Int.MaxValue))
  }

  test("ivfProjectedTopK: full survivor pool reproduces the exact twin; rerank scores exact") {
    // dataflow correctness of the x60→x18 composition: with every cell
    // probed and the survivor pool covering the whole corpus, the 64-dim
    // rerank must reproduce bruteForceTopK exactly — any divergence would
    // be a bug in projection/assignment/probe/rerank, not recall loss
    // (rerankFactor 100 → pool 500 ≥ the 499 candidates; the measured
    // honest ceiling on this near-isotropic corpus needs pool ≈ 404)
    val full = Similarity.ivfProjectedTopK(spark, sf, nProbe = 16, rerankFactor = 100)
      .select($"q_id", $"vec_id", $"rank").as[(Long, Long, Int)].collect().toSet
    val exact = Similarity.bruteForceTopK(spark, sf,
        qLo = Similarity.IvfQLo, qHi = Similarity.IvfQHi)
      .select($"q_id", $"vec_id", $"rank").as[(Long, Long, Int)].collect().toSet
    assert(full == exact)
    // at the shipped defaults the output is top-k of the SURVIVOR pool by
    // exact 64-dim cosine: every returned score equals a driver-computed
    // truncated cosine, and rows/ranks are well-formed per query
    val got = Similarity.ivfProjectedTopK(spark, sf)
      .as[(Long, Long, Double, Int)].collect()
    val nq = Similarity.IvfQHi - Similarity.IvfQLo
    assert(got.length == nq * 5 && got.groupBy(_._1).size == nq)
    val vecs = graft.Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) as v")
      .as[(Long, Seq[Double])].collect().toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val num = a.zip(b).map(t => t._1 * t._2).sum
      num / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    got.foreach { case (q, v, sim, _) =>
      val ref = math.floor(cos(vecs(q), vecs(v)) * 1e6) / 1e6
      assert(math.abs(sim - ref) < 1e-9, s"($q,$v): $sim vs $ref")
    }
  }

  test("randomProjection: exact vs driver reference, distances roughly preserved (JL)") {
    val proj = Similarity.randomProjection(spark, sf).collect()
      .map(r => r.getLong(0) -> (1 until 17).map(r.getDouble).toArray).toMap
    val orig = graft.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
      .map(t => t._1 -> t._2.map(_.toDouble).toArray).toMap
    // bit-exact against a driver-side left-to-right fold with the same signs
    val signs = Similarity.hyperplaneSigns(Similarity.ProjDims, 64)
    val scale = 1.0 / math.sqrt(Similarity.ProjDims.toDouble)
    orig.take(20).foreach { case (id, v) =>
      val ref = signs.map(row =>
        v.indices.foldLeft(0.0)((acc, d) => if (row(d) > 0) acc + v(d) else acc - v(d)) * scale)
      assert(java.util.Arrays.equals(ref, proj(id)), s"vec $id")
    }
    // JL property: projected pairwise distances correlate with originals
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map(t => (t._1 - t._2) * (t._1 - t._2)).sum
    val ids = orig.keys.toSeq.sorted.take(30)
    val pairs = for (i <- ids.indices; j <- 0 until i) yield (ids(i), ids(j))
    val (xs, ys) = pairs.map { case (a, b) => (d2(orig(a), orig(b)), d2(proj(a), proj(b))) }.unzip
    def corr(x: Seq[Double], y: Seq[Double]) = {
      val (mx, my) = (x.sum / x.size, y.sum / y.size)
      val cov = x.zip(y).map(t => (t._1 - mx) * (t._2 - my)).sum
      cov / math.sqrt(x.map(v => (v - mx) * (v - mx)).sum * y.map(v => (v - my) * (v - my)).sum)
    }
    assert(corr(xs, ys) > 0.3, s"JL distance preservation too weak: ${corr(xs, ys)}")
  }

  test("rfmSegments (x120): exact strict-rank quartiles match a driver-side replica") {
    val orders = graft.Tables.orders(spark, sf)
      .select($"o_custkey", unix_timestamp($"o_orderdate"), $"o_totalprice")
      .as[(Long, Long, Double)].collect().toSeq
    val base = orders.groupBy(_._1).view.mapValues { rs =>
      (rs.map(_._2 / 86400).max, rs.size.toLong, rs.map(r => math.round(r._3 * 100)).sum)
    }.toMap
    val maxDay = base.values.map(_._1).max
    val n = base.size.toLong
    def strictRank(vs: Seq[Long]): Map[Long, Long] = {
      val sorted = vs.sorted
      vs.distinct.map(v => v -> sorted.count(_ < v).toLong).toMap
    }
    val rRank = strictRank(base.values.map(maxDay - _._1).toSeq)
    val fRank = strictRank(base.values.map(_._2).toSeq)
    val mRank = strictRank(base.values.map(_._3).toSeq)
    val got = Relational.rfmSegments(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(got.length == base.size && got.nonEmpty)
    got.foreach { case (ck, rec, nf, mon, rs, fs, ms, code) =>
      val (ld, wantF, wantM) = base(ck)
      assert(rec == maxDay - ld && nf == wantF && mon == wantM, s"cust $ck metrics")
      assert(rs == 4 * rRank(rec) / n + 1, s"cust $ck r_score")
      assert(fs == 4 * fRank(nf) / n + 1, s"cust $ck f_score")
      assert(ms == 4 * mRank(mon) / n + 1, s"cust $ck m_score")
      assert(code == rs * 100 + fs * 10 + ms)
      assert(rs >= 1 && rs <= 4 && fs >= 1 && fs <= 4 && ms >= 1 && ms <= 4)
    }
    // every quartile label is inhabited on the monetary axis (near-unique
    // values → balanced quarters)
    assert(got.map(_._7).distinct.sorted.toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("sessionPaths (x121): path census matches a driver-side sessionizer, bounded domain") {
    val raw = graft.Tables.events(spark, sf)
    val ev = raw.select($"user_id", $"event_id", $"event_type",
        Sessionize.tsSeconds(raw).as("ts_s"))
      .as[(Long, Long, String, Long)].collect().toSeq
    val want = ev.groupBy(_._1).values.flatMap { es =>
      val ordered = es.sortBy(e => (e._4, e._2))
      // split on >30-min gaps, then take each session's first 3 types
      val sessions = ordered.foldLeft(List.empty[List[(Long, Long, String, Long)]]) {
        case (acc, e) => acc match {
          case h :: t if e._4 - h.head._4 <= 1800 => (e :: h) :: t
          case _                                  => List(e) :: acc
        }
      }
      sessions.map(_.reverse.take(Sessionize.PathLen).map(_._3).mkString(">"))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = Sessionize.sessionPaths(spark, sf)
      .as[(String, Long)].collect().toMap
    assert(got == want)
    // bounded output domain: five event types → at most (5+1)^3 paths
    assert(got.size <= 216 && got.nonEmpty)
    // session mass conserved: path counts sum to the session count
    val nSessions = Sessionize.sessions(spark, sf).count()
    assert(got.values.sum == nSessions)
  }

  test("abConversion (x123): arm split, rates, and lift match a driver-side replica") {
    val raw = graft.Tables.events(spark, sf)
    val ev = raw.select($"user_id", $"event_type", round($"value" * 100).cast("long"))
      .as[(Long, String, Long)].collect().toSeq
    val perUser = ev.groupBy(_._1).view.mapValues { es =>
      (es.exists(_._2 == "purchase"),
        es.filter(_._2 == "purchase").map(_._3).sum)
    }.toMap
    val byArm = perUser.groupBy { case (u, _) => Dedup.md5Hash60Ref(s"ab:$u") % 2 }
      .view.mapValues { us =>
        (us.size.toLong, us.values.count(_._1).toLong, us.values.map(_._2).sum)
      }.toMap
    val ctlPpm = 1000000L * byArm(0L)._2 / byArm(0L)._1
    val got = Sessionize.abConversion(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(got.length == 2)
    got.foreach { case (arm, n, conv, ppm, rev, arpu, lift) =>
      val (wantN, wantC, wantR) = byArm(arm)
      assert((n, conv, rev) == ((wantN, wantC, wantR)), s"arm $arm counts")
      assert(ppm == 1000000L * wantC / wantN && arpu == 1000L * wantR / wantN, s"arm $arm rates")
      assert(lift == ppm - ctlPpm, s"arm $arm lift")
    }
    assert(got.find(_._1 == 0L).get._7 == 0L, "control lift is zero by construction")
  }

  test("noveltyCurve (x125): first batch is all-new, curve matches brute force") {
    val docs = graft.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val mx = docs.map(_._1).max
    val nb = Dedup.NoveltyBatches
    val bf = docs.flatMap { case (id, text) =>
      val words = text.split(" ", -1)
      val shingles =
        if (words.length < Dedup.NoveltyShingleN) Seq.empty
        else words.sliding(Dedup.NoveltyShingleN).map(_.mkString(" ")).toSeq.distinct
      shingles.map(sh => (id * nb / (mx + 1), Dedup.md5Hash60Ref(sh)))
    }.distinct
    val first = bf.groupBy(_._2).view.mapValues(_.map(_._1).min).toMap
    val want = bf.groupBy(_._1).view.mapValues { fps =>
      val nNew = fps.count { case (b, fp) => first(fp) == b }.toLong
      (fps.size.toLong, nNew, 1000000L * nNew / fps.size)
    }.toMap
    val got = Dedup.noveltyCurve(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { case (b, nFps, nNew, ppm) =>
      assert((nFps, nNew, ppm) == want(b), s"batch $b")
    }
    // batch 0 is all-new by definition; every ppm is a valid proportion,
    // and repetition across batches shows up somewhere (non-trivial curve)
    val m = got.map(r => r._1 -> r._4).toMap
    assert(m(0L) == 1000000L)
    assert(m.values.forall(p => p >= 0L && p <= 1000000L))
    assert(m.filter(_._1 > 0L).values.exists(_ < 1000000L))
  }

  test("cubeRevenue (x126): all four grouping sets match a driver-side replica") {
    val rows = graft.Tables.lineitem(spark, sf)
      .select($"l_returnflag", year($"l_shipdate"), round($"l_extendedprice" * 100).cast("long"),
        round($"l_quantity" * 100).cast("long"))
      .as[(String, Int, Long, Long)].collect().toSeq
    def agg(key: ((String, Int)) => (Option[String], Option[Int]))
        : Map[(Option[String], Option[Int]), (Long, Long, Long)] =
      rows.groupBy(r => key((r._1, r._2))).view.mapValues { rs =>
        (rs.size.toLong, rs.map(_._3).sum, rs.map(_._4).sum)
      }.toMap
    val want =
      agg { case (f, y) => (Some(f), Some(y)) } ++
      agg { case (f, _) => (Some(f), None) } ++
      agg { case (_, y) => (None, Some(y)) } ++
      agg { case _ => (None, None) }
    val got = Relational.cubeRevenue(spark, sf)
      .as[(Option[String], Option[Int], Long, Long, Long)].collect()
    assert(got.length == want.size)
    got.foreach { case (f, y, n, rev, q) =>
      assert((n, rev, q) == want((f, y)), s"cell ($f, $y)")
    }
  }

  test("unpivotMeasures (x127): long form carries exactly the wide sums") {
    val rows = graft.Tables.lineitem(spark, sf)
      .select($"l_returnflag", round($"l_extendedprice" * 100).cast("long"),
        round($"l_tax" * 100).cast("long"), round($"l_discount" * 100).cast("long"),
        round($"l_quantity" * 100).cast("long"))
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    val want = rows.groupBy(_._1).flatMap { case (f, rs) =>
      Seq((f, "extended_cents", rs.map(_._2).sum), (f, "tax_cents", rs.map(_._3).sum),
        (f, "discount_cents", rs.map(_._4).sum), (f, "quantity_centi", rs.map(_._5).sum))
    }.toSet
    val got = Relational.unpivotMeasures(spark, sf)
      .as[(String, String, Long)].collect().toSet
    assert(got == want)
    // exactly one row per (flag, measure): the melt is loss-free
    assert(got.size == rows.map(_._1).distinct.size * 4)
  }

  test("erClusters (x181): transitive closure of x128's pairs matches a driver union-find") {
    val edges = Dedup.fuzzyNamePairs(spark, sf)
      .select($"key_a", $"key_b").as[(Long, Long)].collect()
    val parts = graft.Tables.part(spark, sf)
      .select($"p_partkey").as[Long].collect()
    val parent = scala.collection.mutable.Map(parts.map(p => p -> p): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val canon = parts.map(p => p -> find(p)).toMap
    val sizes = canon.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = Dedup.erClusters(spark, sf)
      .as[(Long, Long, Long, Int)].collect()
    assert(got.length == parts.length && got.nonEmpty)
    got.foreach { case (p, ck, sz, isCanon) =>
      assert(ck == canon(p), s"part $p canonical")
      assert(sz == sizes(canon(p)), s"part $p size")
      assert(isCanon == (if (p == ck) 1 else 0), s"part $p flag")
    }
    // clusters actually merged beyond pairs somewhere (transitivity is real)
    assert(sizes.values.exists(_ > 2) || edges.isEmpty || sizes.values.max == 2)
  }

  test("erClustersSampled (x281): x181's pipeline over the md5 part bucket; " +
    "a real restriction; matches a driver union-find on the sampled universe") {
    def kept(p: Long): Boolean =
      graft.functions.Md5Long.hash60(s"psample:$p") % 10000 < Dedup.ErSampleBps
    val allParts = graft.Tables.part(spark, sf)
      .select($"p_partkey").as[Long].collect()
    val parts = allParts.filter(kept)
    assert(parts.nonEmpty && parts.length < allParts.length,
      "the sample must be a real nonempty restriction at this corpus size")
    // driver replay: blocked fuzzy pairs WITHIN the sampled universe
    // (pairs touching an unsampled part must not exist), then union-find
    val edges = Dedup.fuzzyPairsOf(
        graft.Tables.part(spark, sf).filter(
          graft.operators.Sampling.hashBucket($"p_partkey", "psample")
            < Dedup.ErSampleBps))
      .select($"key_a", $"key_b").as[(Long, Long)].collect()
    assert(edges.forall { case (a, b) => kept(a) && kept(b) })
    val parent = scala.collection.mutable.Map(parts.map(p => p -> p): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val canon = parts.map(p => p -> find(p)).toMap
    val sizes = canon.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = Dedup.erClustersSampled(spark, sf)
      .as[(Long, Long, Long, Int)].collect()
    assert(got.length == parts.length)
    got.foreach { case (p, ck, sz, isCanon) =>
      assert(kept(p), s"part $p leaked past the sample")
      assert(ck == canon(p), s"part $p canonical")
      assert(sz == sizes(canon(p)), s"part $p size")
      assert(isCanon == (if (p == ck) 1 else 0), s"part $p flag")
    }
  }

  test("sortedNeighborhoodPairs (x183): ranks, window pairs and distances match a driver replay") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val parts = graft.Tables.part(spark, sf)
      .select($"p_partkey", $"p_brand", $"p_name")
      .as[(Long, String, String)].collect()
      .sortBy(p => (p._3, p._1))
    val want = (for {
      i <- parts.indices
      j <- (i + 1) to math.min(i + Dedup.SnWindow, parts.length - 1)
      d = lev(parts(i)._3, parts(j)._3)
      if d <= Dedup.FuzzyMaxDistance
    } yield (parts(i)._1, parts(j)._1) ->
      ((j - i).toLong, d, if (parts(i)._2 == parts(j)._2) 1 else 0)).toMap
    val got = Dedup.sortedNeighborhoodPairs(spark, sf)
      .select($"key_a", $"key_b", $"rank_gap", $"distance", $"same_brand")
      .as[(Long, Long, Long, Int, Int)].collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { case (a, b, gap, d, sb) =>
      assert((gap, d, sb) == want((a, b)), s"pair ($a,$b)")
    }
  }

  test("blockingAudit (x184): provenance panel reconciles with the two generators") {
    val brand = Dedup.fuzzyNamePairs(spark, sf)
      .select($"key_a", $"key_b", $"distance")
      .as[(Long, Long, Int)].collect()
      .map { case (a, b, d) => (math.min(a, b), math.max(a, b)) -> d }.toMap
    val sn = Dedup.sortedNeighborhoodPairs(spark, sf)
      .select($"key_a", $"key_b", $"distance", $"same_brand")
      .as[(Long, Long, Int, Int)].collect()
      .map { case (a, b, d, sb) => (math.min(a, b), math.max(a, b)) -> ((d, sb)) }.toMap
    val keys = brand.keySet ++ sn.keySet
    val want = keys.groupBy(k => (if (brand.contains(k)) 1 else 0,
        if (sn.contains(k)) 1 else 0))
      .map { case (cls, ks) =>
        val ds = ks.toSeq.map(k => brand.getOrElse(k, sn(k)._1))
        val sbs = ks.toSeq.map(k => sn.get(k).map(_._2).getOrElse(1))
        cls -> ((ks.size.toLong, ds.count(_ == 0).toLong, ds.count(_ == 1).toLong,
          ds.count(_ >= 2).toLong, sbs.count(_ == 0).toLong))
      }
    val got = Dedup.blockingAudit(spark, sf)
      .as[(Int, Int, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6, r._7))).toMap
    assert(got == want && got.nonEmpty)
    // sorted-neighborhood finds pairs brand blocking cannot (or the data
    // has no cross-brand near-names — then every sn pair is same-brand)
    assert(!got.contains((0, 0)))
  }

  test("waterfillMixture (x185): allocation matches a driver water-fill; budget exactly spent") {
    val supply = graft.Tables.documents(spark, sf)
      .select($"source", size(split($"text", " ")).cast("long"))
      .as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val total = supply.values.sum
    val budget = Sampling.WaterfillPct * total / 100
    val asc = supply.toSeq.sortBy(p => (p._2, p._1))
    val n = asc.size.toLong
    // greedy prefix of capped sources
    var rem = budget
    var capped = Vector.empty[String]
    var i = 0
    while (i < asc.size && asc(i)._2 * (n - i) <= rem) {
      rem -= asc(i)._2; capped :+= asc(i)._1; i += 1
    }
    val m = n - i
    val (base, extra) = if (m > 0) (rem / m, rem % m) else (0L, 0L)
    val wantAlloc = asc.zipWithIndex.map { case ((src, s), idx) =>
      src -> (if (idx < i) s
              else base + (if (idx - i + 1 <= extra) 1L else 0L))
    }.toMap
    val got = Sampling.waterfillMixture(spark, sf)
      .as[(String, Long, Long, Int, Long, Long)].collect()
    assert(got.length == supply.size && got.nonEmpty)
    got.foreach { case (src, s, rk, c, alloc, ppm) =>
      assert(s == supply(src) && alloc == wantAlloc(src), s"source $src")
      assert(c == (if (capped.contains(src)) 1 else 0), s"source $src capped flag")
      assert(rk == asc.indexWhere(_._1 == src) + 1, s"source $src rank")
      assert(alloc <= s && ppm == 1000000L * alloc / budget, s"source $src bounds")
    }
    // the budget is spent exactly, and at least one source was rationed
    assert(got.map(_._5).sum == budget)
    assert(got.exists(_._4 == 0))
  }

  test("fuzzyNamePairs (x128): length-expansion equi-join equals the brute-force contract") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val parts = graft.Tables.part(spark, sf)
      .select($"p_partkey", $"p_brand", $"p_name")
      .as[(Long, String, String)].collect().toSeq
    val want = (for {
      a <- parts; b <- parts
      if a._2 == b._2 && a._1 < b._1
      d = lev(a._3, b._3) if d <= Dedup.FuzzyMaxDistance
    } yield (a._2, a._1, a._3, b._1, b._3, d)).toSet
    val got = Dedup.fuzzyNamePairs(spark, sf)
      .as[(String, Long, String, Long, String, Int)].collect()
    assert(got.toSet == want && want.nonEmpty)
    // the expansion meets each pair exactly once — no dedup pass needed
    assert(got.length == got.toSet.size)
    // the fixture exercises a nonzero length difference (the expansion's point)
    assert(want.exists { case (_, _, na, _, nb, _) => na.length != nb.length })
  }

  test("qualityDrift (x129): rational slope over per-doc (batch, score) points is exact") {
    val scores = TextAnalysis.qualityScorePinned(spark, sf)
      .select($"doc_id", $"score_micro").as[(Long, Long)].collect().toMap
    val docs = graft.Tables.documents(spark, sf)
      .select($"doc_id", $"source").as[(Long, String)].collect().toSeq
    val mx = docs.map(_._1).max
    val pts = docs.map { case (id, src) =>
      (src, id * Dedup.NoveltyBatches / (mx + 1), scores(id)) }
    val want = pts.groupBy(_._1).view.mapValues { rs =>
      val n = rs.size.toLong
      val sx = rs.map(_._2).sum; val sy = rs.map(_._3).sum
      val sxy = rs.map(r => r._2 * r._3).sum; val sxx = rs.map(r => r._2 * r._2).sum
      (n, n * sxy - sx * sy, n * sxx - sx * sx)
    }.toMap
    val got = TextAnalysis.qualityDrift(spark, sf)
      .as[(String, Long, Long, Long)].collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { case (s, n, num, den) =>
      assert((n, num, den) == want(s), s"source $s")
      assert(den >= 0L)
    }
  }

  test("lshPrecision (x130): per-band counts match a driver-side replay of the banding") {
    val (docsF, bandedF) = Dedup.bandFrames(graft.Tables.documents(spark, sf), Dedup.BandShingleN, Dedup.BandMinhashK, Dedup.BandBands)
    val hs = docsF.select($"doc_id", $"hs").as[(Long, Seq[Long])].collect()
      .map { case (id, s) => id -> s.toSet }.toMap
    val banded = bandedF.select($"band", $"bucket", $"doc_id")
      .as[(Int, String, Long)].collect().toSeq
    val want = banded.groupBy(_._1).view.mapValues { rows =>
      val pairs = rows.groupBy(_._2).values.flatMap { bucket =>
        val ids = bucket.map(_._3).sorted
        for (i <- ids.indices; j <- (i + 1) until ids.length) yield (ids(i), ids(j))
      }.toSet
      val verified = pairs.count { case (a, b) =>
        val (sa, sb) = (hs(a), hs(b))
        val inter = (sa & sb).size
        inter.toDouble / (sa.size + sb.size - inter) >= Dedup.LshPrecisionThreshold
      }.toLong
      (pairs.size.toLong, verified, 1000000L * verified / pairs.size)
    }.toMap
    val got = Dedup.lshPrecision(spark, sf)
      .as[(Int, Long, Long, Long)].collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { case (b, nc, nv, ppm) =>
      assert((nc, nv, ppm) == want(b), s"band $b")
    }
  }

  test("leadTimes (x131): exact bounded-domain quantiles match a driver-side sort") {
    val orderMeta = graft.Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_orderpriority", unix_timestamp($"o_orderdate"))
      .as[(Long, String, Long)].collect()
      .map { case (k, p, d) => k -> (p, d / 86400) }.toMap
    val lags = graft.Tables.lineitem(spark, sf)
      .select($"l_orderkey", unix_timestamp($"l_shipdate"))
      .as[(Long, Long)].collect().toSeq
      .map { case (ok, sd) =>
        val (p, od) = orderMeta(ok); (p, sd / 86400 - od) }
    val want = lags.groupBy(_._1).view.mapValues { rs =>
      val v = rs.map(_._2).sorted
      val n = v.length
      def pick(mult: Long, num: Long): Long = v(((num * n + mult - 1) / mult - 1).toInt)
      // min lag with 2·cum >= n is the ceil(n/2)-th value; p90 the ceil(9n/10)-th
      (n.toLong, v.head, pick(2, 1), pick(10, 9), v.last)
    }.toMap
    val got = Relational.leadTimes(spark, sf)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { case (p, n, mn, med, p90, mxv) =>
      assert((n, mn, med, p90, mxv) == want(p), s"priority $p")
      assert(mn <= med && med <= p90 && p90 <= mxv)
    }
  }

  test("loyaltyTransitions (x132): point-in-time tiers match a driver-side replay") {
    val orders = graft.Tables.orders(spark, sf)
      .select($"o_custkey", $"o_orderkey", unix_timestamp($"o_orderdate"))
      .as[(Long, Long, Long)].collect().toSeq
    def tier(n: Long): String =
      if (n < Relational.TierSilverAt) "bronze"
      else if (n < Relational.TierGoldAt) "silver" else "gold"
    val trans = orders.groupBy(_._1).toSeq.flatMap { case (ck, os) =>
      os.sortBy(o => (o._3 / 86400, o._2)).zipWithIndex.map { case (_, i) =>
        (ck, tier(i.toLong), tier(i.toLong + 1)) }
    }
    val want = trans.groupBy(t => (t._2, t._3)).view.mapValues { ts =>
      (ts.size.toLong, ts.map(_._1).distinct.size.toLong) }.toMap
    val got = Relational.loyaltyTransitions(spark, sf)
      .as[(String, String, Long, Long)].collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { case (f, t, n, nc) => assert((n, nc) == want((f, t)), s"$f->$t") }
    // tiers only move up or stay: no demotion cell exists
    val order = Map("bronze" -> 0, "silver" -> 1, "gold" -> 2)
    assert(got.forall { case (f, t, _, _) => order(t) >= order(f) })
    // order mass conserved
    assert(got.map(_._3).sum == orders.size.toLong)
  }

  test("sketchAccuracy (x133): exact arm is truly exact, error columns are consistent") {
    val exact = graft.Tables.documents(spark, sf)
      .select($"source", $"text").as[(String, String)].collect().toSeq
      .groupBy(_._1).view.mapValues(
        _.flatMap(_._2.split(" ", -1)).map(Dedup.md5Hash60Ref).distinct.size.toLong).toMap
    val got = TextAnalysis.sketchAccuracy(spark, sf)
      .as[(String, Long, Int, Double, Double, Long)].collect()
    assert(got.length == exact.size && got.nonEmpty)
    got.foreach { case (s, ex, nKept, est, err, ppm) =>
      assert(ex == exact(s), s"source $s exact")
      assert(err == est - ex, s"source $s signed error")
      assert(ppm == math.floor(math.abs(est - ex) * 1000000.0 / ex).toLong, s"source $s ppm")
      assert(nKept <= 256)
      // a saturated sketch estimates, an unsaturated one IS the count
      if (nKept < 256) assert(est == ex.toDouble && ppm == 0L, s"source $s unsaturated")
    }
  }

  test("paretoParts (x134): frontier equals the brute-force dominance scan") {
    val parts = graft.Tables.part(spark, sf)
      .select($"p_partkey", $"p_size", $"p_retailprice")
      .as[(Long, Int, Double)].collect()
      .map { case (k, s, p) => (k, s, math.round(p * 100)) }
    val want = parts.filter { case (k, s, p) =>
      !parts.exists { case (k2, s2, p2) =>
        k2 != k && p2 <= p && s2 >= s && (p2 < p || s2 > s) }
    }.map(_._1).toSet
    val got = Relational.paretoParts(spark, sf)
      .select($"p_partkey", $"p_size", $"price_cents")
      .as[(Long, Int, Long)].collect()
    assert(got.map(_._1).toSet == want && got.nonEmpty)
    // rows carry the catalog's own size/price
    val cat = parts.map(t => t._1 -> (t._2, t._3)).toMap
    got.foreach { case (k, s, p) => assert(cat(k) == ((s, p))) }
  }

  test("purchaseStreaks (x136): longest-run census matches a driver replay") {
    val months = graft.Tables.orders(spark, sf)
      .select($"o_custkey", year($"o_orderdate") * 12 + month($"o_orderdate") - 1)
      .as[(Long, Int)].collect().distinct
    val longest = months.groupBy(_._1).view.mapValues { ms =>
      val sorted = ms.map(_._2).sorted.toList
      var best = 1; var cur = 1
      sorted.sliding(2).foreach {
        case a :: b :: Nil =>
          if (b == a + 1) { cur += 1; best = math.max(best, cur) } else cur = 1
        case _ => ()
      }
      best.toLong
    }.toMap
    val seg = graft.Tables.customer(spark, sf)
      .select($"c_custkey", $"c_mktsegment").as[(Long, String)].collect().toMap
    val want = longest.toSeq.groupBy { case (ck, l) => (seg(ck), l) }
      .view.mapValues(_.size.toLong).toMap
    val got = Relational.purchaseStreaks(spark, sf)
      .as[(String, Long, Long)].collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { case (s, l, n) => assert(n == want((s, l)), s"$s len $l") }
    // every customer with ≥1 order lands in exactly one census cell
    assert(got.map(_._3).sum == longest.size.toLong)
  }

  test("rrfConsensus (x137): fusion of independently-computed top-100 lists") {
    def rankTop(scored: Seq[(Long, Long)]): Map[Long, Long] =
      scored.sortBy { case (id, sc) => (-sc, id) }.take(100)
        .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    val qRank = rankTop(TextAnalysis.qualityScorePinned(spark, sf)
      .select($"doc_id", $"score_micro").as[(Long, Long)].collect().toSeq)
    val rRank = rankTop(graft.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
      .map { case (id, t) => (id, t.split(" ", -1).distinct.length.toLong) })
    def credit(r: Option[Long]): Long = r.map(r => 1000000L / (60L + r)).getOrElse(0L)
    val want = (qRank.keySet ++ rRank.keySet).map(id =>
      id -> (qRank.get(id), rRank.get(id),
        credit(qRank.get(id)) + credit(rRank.get(id)))).toMap
    val got = TextAnalysis.rrfConsensus(spark, sf).collect()
    assert(got.length == want.size && got.length > 100)
    got.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (wq, wr, wScore) = want(id)
      assert(Option(r.getAs[java.lang.Long]("r_quality")).map(_.toLong) == wq, s"doc $id quality rank")
      assert(Option(r.getAs[java.lang.Long]("r_richness")).map(_.toLong) == wr, s"doc $id richness rank")
      assert(r.getAs[Long]("rrf_micro") == wScore, s"doc $id rrf")
    }
  }

  test("tierIntervals (x138): episodes partition each customer's timeline and agree with x132") {
    val orders = graft.Tables.orders(spark, sf)
      .select($"o_custkey", $"o_orderkey", unix_timestamp($"o_orderdate"))
      .as[(Long, Long, Long)].collect().toSeq
    def tier(n: Long): String =
      if (n < Relational.TierSilverAt) "bronze"
      else if (n < Relational.TierGoldAt) "silver" else "gold"
    val want = orders.groupBy(_._1).toSeq.flatMap { case (ck, os) =>
      val days = os.map(o => (o._3 / 86400, o._2)).sorted.map(_._1)
      val eps = days.zipWithIndex.collect {
        case (d, i) if i == 0 || tier(i + 1L) != tier(i.toLong) => (tier(i + 1L), d)
      }
      eps.zipWithIndex.map { case ((t, from), i) =>
        (ck, t, from, eps.lift(i + 1).map(_._2)) }
    }.toSet
    val got = Relational.tierIntervals(spark, sf)
      .as[(Long, String, Long, Option[Long])].collect().toSet
    assert(got == want && got.nonEmpty)
    // exactly one open interval (null valid_to) per customer
    val open = got.toSeq.filter(_._4.isEmpty).groupBy(_._1).view.mapValues(_.size)
    assert(open.values.forall(_ == 1) && open.size == orders.map(_._1).distinct.size)
  }

  test("integrityAudit (x139): orphan counts match driver-side set differences") {
    def keys(df: org.apache.spark.sql.DataFrame, c: String): Seq[Long] =
      df.select(col(c)).as[Long].collect().toSeq
    val li = graft.Tables.lineitem(spark, sf)
    val cases = Seq(
      ("lineitem->orders", keys(li, "l_orderkey"), keys(graft.Tables.orders(spark, sf), "o_orderkey")),
      ("lineitem->part", keys(li, "l_partkey"), keys(graft.Tables.part(spark, sf), "p_partkey")),
      ("lineitem->supplier", keys(li, "l_suppkey"), keys(graft.Tables.supplier(spark, sf), "s_suppkey")),
      ("orders->customer", keys(graft.Tables.orders(spark, sf), "o_custkey"),
        keys(graft.Tables.customer(spark, sf), "c_custkey")),
      ("customer->nation", keys(graft.Tables.customer(spark, sf), "c_nationkey"),
        keys(graft.Tables.nation(spark, sf), "n_nationkey")),
      ("supplier->nation", keys(graft.Tables.supplier(spark, sf), "s_nationkey"),
        keys(graft.Tables.nation(spark, sf), "n_nationkey")))
    val want = cases.map { case (name, child, parent) =>
      name -> (child.size.toLong, child.count(k => !parent.toSet.contains(k)).toLong) }.toMap
    val got = Relational.integrityAudit(spark, sf)
      .as[(String, Long, Long)].collect()
    assert(got.length == 6)
    got.foreach { case (name, n, orph) => assert((n, orph) == want(name), name) }
  }

  test("profileOrders (x140): per-column stats match a driver replay") {
    val rows = graft.Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice",
        unix_timestamp($"o_orderdate"), $"o_orderstatus", $"o_orderpriority")
      .as[(Long, Long, Double, Long, String, String)].collect().toSeq
    def num(vs: Seq[Long]) =
      (vs.size.toLong, vs.distinct.size.toLong, Some(vs.min), Some(vs.max))
    val want = Map[String, (Long, Long, Option[Long], Option[Long])](
      "o_orderkey" -> num(rows.map(_._1)),
      "o_custkey" -> num(rows.map(_._2)),
      "o_totalprice_cents" -> num(rows.map(r => math.round(r._3 * 100))),
      "o_orderdate_day" -> num(rows.map(_._4 / 86400)),
      "o_orderstatus" -> ((rows.size.toLong, rows.map(_._5).distinct.size.toLong, None, None)),
      "o_orderpriority" -> ((rows.size.toLong, rows.map(_._6).distinct.size.toLong, None, None)))
    val got = Relational.profileOrders(spark, sf)
      .as[(String, Long, Long, Option[Long], Option[Long])].collect()
    assert(got.length == 6)
    got.foreach { case (c, nn, nd, mn, mx) => assert((nn, nd, mn, mx) == want(c), c) }
  }

  test("brandTopParts (x141): rank-with-ties matches a driver replay and keeps every tied part") {
    val counts = graft.Tables.lineitem(spark, sf)
      .select($"l_partkey").as[Long].collect().toSeq
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val brand = graft.Tables.part(spark, sf)
      .select($"p_partkey", $"p_brand").as[(Long, String)].collect().toMap
    val want = counts.toSeq.map { case (pk, n) => (brand(pk), pk, n) }
      .groupBy(_._1).toSeq.flatMap { case (b, ps) =>
        val byCount = ps.map(_._3).sortBy(-_)
        ps.map { case (_, pk, n) =>
          (b, pk, n, byCount.count(_ > n).toLong + 1L) }.filter(_._4 <= 3)
      }.toSet
    val got = Relational.brandTopParts(spark, sf)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == want && got.nonEmpty)
    // ties are real on an integer key: some brand reports more than 3 parts
    assert(got.toSeq.groupBy(_._1).values.exists(_.size > 3))
  }

  test("orderValueHistogram (x142): buckets are exact bit-lengths and edges bracket every member") {
    val vs = graft.Tables.orders(spark, sf)
      .select($"o_totalprice").as[Double].collect().toSeq
      .map(p => math.round(p * 100)).filter(_ > 0)
    val want = vs.groupBy(v => 64 - java.lang.Long.numberOfLeadingZeros(v))
      .map { case (b, xs) => b.toLong -> (xs.size.toLong, xs.sum) }
    val got = Relational.orderValueHistogram(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { case (b, lo, hi, n, s) =>
      assert((n, s) == want(b), s"bucket $b")
      assert(lo == (1L << (b - 1)) && hi == (1L << b) - 1)
    }
    // histogram partitions the order mass
    assert(got.map(_._4).sum == vs.size.toLong && got.map(_._5).sum == vs.sum)
  }

  test("reconcileOrders (x143): drift panel matches a driver-side ledger replay") {
    val lines = graft.Tables.lineitem(spark, sf)
      .select($"l_orderkey", $"l_extendedprice").as[(Long, Double)].collect().toSeq
      .groupBy(_._1).view.mapValues(_.map(r => math.round(r._2 * 100)).sum).toMap
    val orders = graft.Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
      .as[(Long, String, Double)].collect().toSeq
    val want = orders.groupBy(_._2).view.mapValues { os =>
      val rows = os.map { case (k, _, p) =>
        (math.round(p * 100), lines.getOrElse(k, 0L)) }
      (rows.size.toLong,
        rows.count(_._2 != 0L).toLong,
        rows.count(r => r._1 == r._2).toLong,
        rows.map(r => math.abs(r._1 - r._2)).sum)
    }.toMap
    val got = Relational.reconcileOrders(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { case (st, n, nw, ne, d) => assert((n, nw, ne, d) == want(st), st) }
  }

  test("cdcMergeDocs (x144): merge output is keyed-disjoint and applies every CDC row exactly once") {
    val snap = graft.Tables.documents(spark, sf)
      .select($"doc_id", $"lang", $"source", $"n_chars")
      .as[(Long, String, String, Long)].collect().toSeq
    val text = graft.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    val upd = snap.filter(_._1 % 7 == 0)
      .map { case (id, l, _, _) => (id, l, "cdc_update", text(id).length.toLong) }
    val ins = snap.filter(r => r._1 % 13 == 0 && r._1 != 0)
      .map { case (id, l, _, n) => (-id, l, "cdc_insert", n) }
    val updIds = upd.map(_._1).toSet
    val want = (snap.filterNot(r => updIds.contains(r._1))
        .map(r => (r._1, r._2, r._3, r._4, "kept")) ++
      upd.map(r => (r._1, r._2, r._3, r._4, "updated")) ++
      ins.map(r => (r._1, r._2, r._3, r._4, "inserted"))).toSet
    val got = Relational.cdcMergeDocs(spark, sf)
      .as[(Long, String, String, Long, String)].collect()
    assert(got.toSet == want && got.nonEmpty)
    // MERGE invariant: one row per key, all three change types present
    assert(got.map(_._1).distinct.length == got.length)
    assert(got.map(_._5).distinct.toSet == Set("kept", "updated", "inserted"))
  }

  test("cohortLtv (x145): triangle matches a driver replay and cumulates correctly") {
    val orders = graft.Tables.orders(spark, sf)
      .select($"o_custkey", year($"o_orderdate") * 12 + month($"o_orderdate") - 1,
        $"o_totalprice")
      .as[(Long, Int, Double)].collect().toSeq
      .map { case (ck, m, p) => (ck, m.toLong, math.round(p * 100)) }
    val cohort = orders.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val cells = orders.groupBy(o => (cohort(o._1), o._2 - cohort(o._1)))
      .map { case ((c, a), os) =>
        (c, a) -> (os.map(_._1).distinct.size.toLong, os.map(_._3).sum) }
    val got = Relational.cohortLtv(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.length == cells.size && got.nonEmpty)
    got.foreach { case (c, a, n, rev, _) => assert((n, rev) == cells((c, a)), s"cell $c/$a") }
    // cumulative column is the prefix sum of the revenue column per cohort
    got.groupBy(_._1).foreach { case (c, rows) =>
      val sorted = rows.sortBy(_._2)
      val prefix = sorted.map(_._4).scanLeft(0L)(_ + _).tail
      assert(sorted.map(_._5).toSeq == prefix.toSeq, s"cohort $c cum")
    }
  }

  test("containmentPairs (x146): finds subset-copies that symmetric Jaccard misses") {
    // doc B embeds all of doc A's shingles inside a much larger text:
    // containment(A) = 1.0 while Jaccard is far below x02's threshold
    val dir = java.nio.file.Files.createTempDirectory("graft-contain").toString
    val quote = (1 to 30).map(i => s"q$i").mkString(" ")
    val page = quote + " " + (1 to 400).map(i => s"p$i").mkString(" ")
    val others = (1 to 5).map(i => (100L + i, (1 to 50).map(j => s"o${i}_$j").mkString(" ")))
    val docs = (Seq((1L, quote), (2L, page)) ++ others).toDF("doc_id", "text")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Dedup.containmentPairs(spark, dir)
      .as[(Long, Long, Int, Int, Long, Double, Double)].collect()
    assert(got.length == 1)
    val (a, b, nA, _, inter, cA, cB) = got.head
    assert((a, b) == ((1L, 2L)))
    assert(inter == nA && cA == 1.0 && cB < 0.1, "full containment of the quote")
    // and the corpus run agrees with a brute-force driver replay
    def shingles(t: String): Set[String] =
      t.split(" ", -1).sliding(5).map(_.mkString(" ")).toSet
    val corpus = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
      .map { case (id, t) => (id, shingles(t)) }
    val df = corpus.flatMap(_._2.toSeq).groupBy(identity).view.mapValues(_.size)
    val capped = corpus.map { case (id, sh) => (id, sh.filter(df(_) <= 100)) }
    val want = (for {
      (ia, sa) <- capped; (ib, sb) <- capped if ia < ib
      inter = (sa intersect sb).size
      if inter > 0 && (inter * 5 >= sa.size * 4 || inter * 5 >= sb.size * 4)
    } yield (ia, ib, sa.size, sb.size, inter.toLong)).toSet
    val gotCorpus = Dedup.containmentPairs(spark, "/root/testdata/sf0.001")
      .select($"doc_a", $"doc_b", $"n_a", $"n_b", $"inter")
      .as[(Long, Long, Int, Int, Long)].collect().toSet
    assert(gotCorpus == want)
  }

  test("activeUsers (x147): WAU/MAU4 panel matches an exhaustive driver replay") {
    val raw = graft.Tables.events(spark, sf)
    val uw = raw.select($"user_id", Sessionize.tsSeconds(raw).as("ts_s"))
      .select($"user_id", expr("ts_s div 604800")).as[(Long, Long)]
      .collect().toSeq.distinct
    val weeks = uw.map(_._2).distinct
    val want = weeks.map { w =>
      val wau = uw.count(_._2 == w).toLong
      val mau = uw.filter(p => p._2 >= w - 3 && p._2 <= w).map(_._1).distinct.size.toLong
      w -> (wau, mau, 1000000L * wau / mau)
    }.toMap
    val got = Sessionize.activeUsers(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { case (w, wau, mau, s) => assert((wau, mau, s) == want(w), s"week $w") }
    // MAU4 is always ≥ WAU and stickiness ≤ 1e6
    assert(got.forall { case (_, wau, mau, s) => mau >= wau && s <= 1000000L })
  }

  test("benfordAudit (x148): digit census matches a driver replay; constants sum to ~1e6") {
    val vs = graft.Tables.orders(spark, sf)
      .select($"o_totalprice").as[Double].collect().toSeq
      .map(p => math.round(p * 100)).filter(_ > 0)
    val want = vs.groupBy(_.toString.head.asDigit.toLong)
      .view.mapValues(_.size.toLong).toMap
    val total = vs.size.toLong
    val got = Relational.benfordAudit(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { case (d, n, obs, ben, dev) =>
      assert(n == want(d), s"digit $d")
      assert(obs == 1000000L * n / total && dev == obs - ben)
      assert(ben == Relational.BenfordPpm(d.toInt - 1))
    }
    // the pinned expectation is a distribution (rounding loses <10 ppm)
    assert(math.abs(Relational.BenfordPpm.sum - 1000000L) < 10)
  }

  test("keySkewAudit (x149): hot keys and ratios match a driver replay on all three columns") {
    val rows = graft.Tables.lineitem(spark, sf)
      .select($"l_orderkey", $"l_partkey", $"l_suppkey")
      .as[(Long, Long, Long)].collect().toSeq
    val got = Relational.keySkewAudit(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect()
    for ((colName, get) <- Seq[(String, ((Long, Long, Long)) => Long)](
        ("l_orderkey", _._1), ("l_partkey", _._2), ("l_suppkey", _._3))) {
      val counts = rows.map(get).groupBy(identity).view.mapValues(_.size.toLong).toMap
      val top = counts.toSeq.sortBy { case (k, n) => (-n, k) }.take(5)
      val nTotal = rows.size.toLong; val nKeys = counts.size.toLong
      val avg = nTotal / nKeys
      val panel = got.filter(_._1 == colName).sortBy(_._2)
      assert(panel.length == 5, colName)
      panel.zip(top).foreach { case ((_, rnk, k, n, nk, nt, a, ppm), (wk, wn)) =>
        assert((k, n) == ((wk, wn)), s"$colName rank $rnk")
        assert((nk, nt, a) == ((nKeys, nTotal, avg)))
        assert(ppm == 1000000L * n / avg)
      }
    }
  }

  test("ngramJaccard stop-shingle cap bounds the hot key; default cap is inactive on the corpus") {
    // 30 docs sharing exactly one hot 5-gram, otherwise disjoint vocabulary
    val dir = java.nio.file.Files.createTempDirectory("graft-hotshingle").toString
    (1L to 30L).map(i => (i, s"alpha beta gamma delta epsilon u$i v$i w$i x$i z$i"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val uncapped = Dedup.ngramJaccard(spark, dir, n = 5, threshold = 0.01, maxShingleDf = 1000)
    assert(uncapped.count() == 30L * 29 / 2) // the hot shingle joins every pair: O(df²)
    val capped = Dedup.ngramJaccard(spark, dir, n = 5, threshold = 0.01, maxShingleDf = 10)
    assert(capped.count() == 0) // hot shingle excluded; nothing else shared
    // the default cap (100) is far above the real corpus' max df — results identical
    val dflt = Dedup.ngramJaccard(spark, sf, n = 5, threshold = 0.3)
      .as[(Long, Long, Long, Double)].collect().toSet
    val wide = Dedup.ngramJaccard(spark, sf, n = 5, threshold = 0.3, maxShingleDf = Int.MaxValue)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(dflt == wide)
  }

  test("reorderRate (x154): per-part repeat census matches an exhaustive driver replay") {
    val cust = graft.Tables.orders(spark, sf).select($"o_orderkey", $"o_custkey")
      .as[(Long, Long)].collect().toMap
    val lo = graft.Tables.lineitem(spark, sf).select($"l_orderkey", $"l_partkey")
      .as[(Long, Long)].collect().toSeq
      .flatMap { case (ok, p) => cust.get(ok).map(c => (p, c, ok)) }.distinct
    val want = lo.groupBy(_._1).view.mapValues { rows =>
      val perCust = rows.groupBy(_._2).view.mapValues(_.map(_._3).distinct.size.toLong)
      val nCust = perCust.size.toLong
      val nRepeat = perCust.count(_._2 >= 2).toLong
      (nCust, nRepeat, perCust.values.sum, 1000000L * nRepeat / nCust)
    }.toMap
    val got = Relational.reorderRate(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { case (p, nc, nr, no, ppm) =>
      assert((nc, nr, no, ppm) == want(p), s"part $p")
    }
    // repeat purchases exist in the corpus, but not universally
    assert(got.exists(_._3 > 0) && got.exists(r => r._3 < r._2))
  }

  test("spendDeciles (x155): Lorenz deciles match an exhaustive driver replay") {
    val spend = graft.Tables.orders(spark, sf).select($"o_custkey", $"o_totalprice")
      .as[(Long, Double)].collect().toSeq
      .groupBy(_._1).view.mapValues(_.map(p => math.round(p._2 * 100)).sum)
      .toSeq.map(_._2)
    val n = spend.size.toLong
    val total = spend.sum
    val want = spend.map(v => (v, spend.count(_ < v).toLong))
      .groupBy { case (_, o) => 10 * o / n + 1 }
      .view.mapValues(rs => (rs.size.toLong, rs.map(_._1).sum)).toMap
    val got = Relational.spendDeciles(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == want.keys.toSeq.sorted && got.nonEmpty)
    var cum = 0L
    got.foreach { case (d, ncust, cents, cumc, share, cumshare) =>
      val (wn, wc) = want(d); cum += wc
      assert((ncust, cents) == ((wn, wc)), s"decile $d")
      assert(cumc == cum, s"decile $d cum")
      assert(share == (BigInt(1000000) * wc / total).toLong, s"decile $d share")
      assert(cumshare == (BigInt(1000000) * cum / total).toLong, s"decile $d cumshare")
    }
    // partition: every customer lands in exactly one decile; Lorenz closes
    assert(got.map(_._2).sum == n && got.last._4 == total)
    // concentration: the top decile out-spends the bottom one
    assert(got.last._3 > got.head._3)
  }

  test("spendGini (x156): raw rational matches a per-row-rank BigInt replica") {
    val spend = graft.Tables.orders(spark, sf).select($"o_custkey", $"o_totalprice")
      .as[(Long, Double)].collect().toSeq
      .groupBy(_._1).view.mapValues(_.map(p => math.round(p._2 * 100)).sum)
      .toSeq.map(_._2)
    val n = spend.size
    // independent formulation: explicit ascending per-row ranks 1..n
    val r = spend.sorted.zipWithIndex.map { case (v, i) => BigInt(v) * (i + 1) }.sum
    val s = spend.map(BigInt(_)).sum
    val (num, den) = (2 * r - (n + 1) * s, BigInt(n) * s)
    val got = Relational.spendGini(spark, sf)
      .select($"n_customers", $"total_cents".cast("string"),
        $"gini_num".cast("string"), $"gini_den".cast("string"))
      .as[(Long, String, String, String)].head()
    assert(got._1 == n.toLong && BigInt(got._2) == s)
    assert(BigInt(got._3) == num && BigInt(got._4) == den)
    // Gini of a non-degenerate positive distribution: 0 < num/den < 1
    assert(num > 0 && num < den)
  }

  test("lengthDriftKs (x159): exact KS rational matches an exhaustive driver replay") {
    val docs = graft.Tables.documents(spark, sf)
      .select($"source", $"n_chars").as[(String, Long)].collect().toSeq
    val bySrc = docs.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val srcs = bySrc.keys.toSeq.sorted
    val want = (for {
      i <- srcs.indices; j <- i + 1 until srcs.size
      a = srcs(i); b = srcs(j)
      va = bySrc(a); vb = bySrc(b)
      na = va.size.toLong; nb = vb.size.toLong
      grid = (va ++ vb).distinct.sorted
      best = grid.map { v =>
        val ca = va.count(_ <= v).toLong; val cb = vb.count(_ <= v).toLong
        (v, (BigInt(ca) * nb - BigInt(cb) * na).abs)
      }.maxBy { case (v, gap) => (gap, -v) }
    } yield (a, b) -> (na, nb, best._1, best._2, BigInt(na) * nb)).toMap
    val got = TextAnalysis.lengthDriftKs(spark, sf)
      .select($"src_a", $"src_b", $"n_a", $"n_b", $"ks_at_length",
        $"ks_num".cast("string"), $"ks_den".cast("string"))
      .as[(String, String, Long, Long, Long, String, String)].collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { case (a, b, na, nb, v, num, den) =>
      val (wna, wnb, wv, wnum, wden) = want((a, b))
      assert((na, nb, v) == ((wna, wnb, wv)), s"pair $a/$b")
      assert(BigInt(num) == wnum && BigInt(den) == wden, s"pair $a/$b rational")
      // KS statistic is a probability-difference: 0 ≤ num ≤ den
      assert(BigInt(num) >= 0 && BigInt(num) <= BigInt(den))
    }
    // drift exists somewhere: at least one pair has a nonzero supremum
    assert(got.exists(r => BigInt(r._6) > 0))
  }

  test("regionSegmentRevenue (x169): six-table star join matches a driver replay; broadcast dims") {
    val cust = graft.Tables.customer(spark, sf).select($"c_custkey", $"c_mktsegment")
      .as[(Long, String)].collect().toMap
    val ordCust = graft.Tables.orders(spark, sf).select($"o_orderkey", $"o_custkey")
      .as[(Long, Long)].collect().toMap
    val suppNation = graft.Tables.supplier(spark, sf).select($"s_suppkey", $"s_nationkey")
      .as[(Long, Long)].collect().toMap
    val nationRegion = graft.Tables.nation(spark, sf).select($"n_nationkey", $"n_regionkey")
      .as[(Long, Long)].collect().toMap
    val regionName = graft.Tables.region(spark, sf).select($"r_regionkey", $"r_name")
      .as[(Long, String)].collect().toMap
    val want = graft.Tables.lineitem(spark, sf)
      .select($"l_orderkey", $"l_suppkey", $"l_extendedprice", $"l_discount")
      .as[(Long, Long, Double, Double)].collect().toSeq
      .map { case (ok, sk, p, d) =>
        ((regionName(nationRegion(suppNation(sk))), cust(ordCust(ok))),
          math.round(p * (1 - d) * 100))
      }
      .groupBy(_._1).view.mapValues(vs => (vs.size.toLong, vs.map(_._2).sum)).toMap
    val q = Relational.regionSegmentRevenue(spark, sf)
    val got = q.as[(String, String, Long, Long)].collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { case (r, seg, n, cents) =>
      assert((n, cents) == want((r, seg)), s"cell $r/$seg")
    }
    // nation/region ride a broadcast join; the fact joins must not
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(500))
  }

  test("priceRealization (x170): integer panel matches a driver replay; ratio exact") {
    val parts = graft.Tables.part(spark, sf)
      .select($"p_partkey", $"p_type", $"p_retailprice")
      .as[(Long, String, Double)].collect()
      .map { case (k, t, rp) => k -> (t, math.round(rp * 100)) }.toMap
    val want = graft.Tables.lineitem(spark, sf)
      .select($"l_partkey", $"l_quantity", $"l_extendedprice")
      .as[(Long, Double, Double)].collect().toSeq
      .map { case (pk, q, p) =>
        val (tpe, ru) = parts(pk)
        (tpe, math.round(q), math.round(p * 100), ru)
      }
      .groupBy(_._1).view.mapValues { rs =>
        val units = rs.map(_._2).sum
        val realized = rs.map(_._3).sum
        val retail = rs.map(r => r._2 * r._4).sum
        (rs.size.toLong, units, realized, retail,
          (BigInt(1000000) * realized / retail).toLong)
      }.toMap
    val got = Relational.priceRealization(spark, sf)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { case (t, n, u, rl, rt, ppm) =>
      assert((n, u, rl, rt, ppm) == want(t), s"type $t")
    }
    // structural invariants: positive denominators, positive quotients
    // (the synthetic corpus prices independently of retail, so the
    // DIRECTION of the ratio is the data's, not the operator's)
    assert(got.forall(r => r._5 > 0L && r._6 > 0L))
  }

  test("zipfAudit (x167): level table, rank spans, and log2 buckets match a driver replay") {
    val tokens = graft.Tables.documents(spark, sf)
      .select($"text").as[String].collect().toSeq.flatMap(_.split(" ", -1))
    val freq = tokens.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val levels = freq.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val want = levels.map { case (f, nt) =>
      val o = levels.collect { case (f2, n2) if f2 > f => n2 }.sum
      f -> (nt, o + 1, o + nt,
        java.lang.Long.toBinaryString(f).length.toLong,
        java.lang.Long.toBinaryString(o + 1).length.toLong)
    }
    val got = TextAnalysis.zipfAudit(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { case (f, nt, lo, hi, l2f, l2r) =>
      assert((nt, lo, hi, l2f, l2r) == want(f), s"level f=$f")
    }
    // rank spans tile 1..vocab exactly (no gaps, no overlaps)
    val spans = got.map(r => (r._3, r._4)).sortBy(_._1).toSeq
    assert(spans.head._1 == 1L && spans.last._2 == freq.size.toLong)
    spans.zip(spans.drop(1)).foreach { case ((_, hi), (lo2, _)) =>
      assert(lo2 == hi + 1)
    }
  }

  test("heapsCurve (x168): growth curve matches a driver replay; cumulative closure") {
    val docs = graft.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val mx = docs.map(_._1).max
    val nb = Dedup.NoveltyBatches
    val bt = docs.flatMap { case (id, text) =>
      text.split(" ", -1).map(t => (id * nb / (mx + 1), t))
    }
    val perBatch = bt.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val firstSeen = bt.groupBy(_._2).view.mapValues(_.map(_._1).min).toSeq
      .groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val got = TextAnalysis.heapsCurve(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.length == perBatch.size && got.nonEmpty)
    var (ct, cy) = (0L, 0L)
    got.foreach { case (b, nt, nn, cumT, cumY) =>
      assert(nt == perBatch(b), s"batch $b tokens")
      assert(nn == firstSeen.getOrElse(b, 0L), s"batch $b new types")
      ct += nt; cy += nn
      assert(cumT == ct && cumY == cy, s"batch $b cumulative")
    }
    // the curve closes on the corpus totals: all tokens, whole vocabulary
    assert(ct == bt.size.toLong && cy == bt.map(_._2).distinct.size.toLong)
    // Heaps shape: vocabulary grows monotonically but slower than tokens
    assert(got.last._5 <= got.last._4)
  }

  test("conversionLatency (x165): buckets and censored mass match a driver replay") {
    val raw = graft.Tables.events(spark, sf)
    val ev = raw.select($"user_id", $"event_type", Sessionize.tsSeconds(raw).as("ts_s"))
      .as[(Long, String, Long)].collect().toSeq
    val t0 = ev.filter(_._2 == "signup").groupBy(_._1).view.mapValues(_.map(_._3).min).toMap
    val purch = ev.filter(_._2 == "purchase").groupBy(_._1).view.mapValues(_.map(_._3)).toMap
    val lat = t0.toSeq.map { case (u, t) =>
      purch.getOrElse(u, Seq.empty).filter(_ >= t).sorted.headOption
        .map(tp => (tp - t) / 86400).getOrElse(-1L)
    }
    val want = lat.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = Sessionize.conversionLatency(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { case (d, n, tot, ppm) =>
      assert(n == want(d), s"bucket $d")
      assert(tot == t0.size.toLong && ppm == 1000000L * n / tot)
    }
    // the buckets partition the signup population exactly
    assert(got.map(_._2).sum == t0.size.toLong)
    // censored paths on a constructed corpus: user 2 never purchases,
    // user 3 purchased only BEFORE signing up — both must land in the
    // -1 row, not vanish (the left-join-then-filter trap)
    val dir = java.nio.file.Files.createTempDirectory("graft-convlag").toString
    val day = 86400L
    Seq(
      (1L, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(0L)), 1L, "signup", 0.0, "{}"),
      (2L, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(3 * day)), 1L, "purchase", 1.0, "{}"),
      (3L, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(0L)), 2L, "signup", 0.0, "{}"),
      (4L, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(0L)), 3L, "purchase", 1.0, "{}"),
      (5L, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(day)), 3L, "signup", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val tiny = Sessionize.conversionLatency(spark, dir)
      .as[(Long, Long, Long, Long)].collect()
      .map { case (d, n, t, p) => d -> ((n, t, p)) }.toMap
    assert(tiny == Map(
      3L -> ((1L, 3L, 333333L)),   // user 1 converts on day 3
      -1L -> ((2L, 3L, 666666L)))) // users 2 and 3 censored
  }

  test("markovEval (x166): argmax prediction and hit rate match a driver replay") {
    val raw = graft.Tables.events(spark, sf)
    val ev = raw.select($"user_id", $"event_id", $"event_type",
        Sessionize.tsSeconds(raw).as("ts_s"))
      .as[(Long, Long, String, Long)].collect().toSeq
    val trans = ev.groupBy(_._1).values.toSeq.flatMap { es =>
      val s = es.sortBy(e => (e._4, e._2)).map(_._3)
      s.zip(s.drop(1))
    }
    val counts = trans.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val want = counts.keys.map(_._1).toSeq.distinct.map { prev =>
      val nexts = counts.collect { case ((p, nx), n) if p == prev => (nx, n) }.toSeq
      val predicted = nexts.maxBy { case (nx, n) => (n, nx) }._1
      val total = nexts.map(_._2).sum
      val hits = nexts.collectFirst { case (nx, n) if nx == predicted => n }.get
      prev -> (predicted, total, hits, 1000000L * hits / total)
    }.toMap
    val got = Sessionize.markovEval(spark, sf)
      .as[(String, String, Long, Long, Long)].collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { case (prev, pn, tot, hits, ppm) =>
      assert((pn, tot, hits, ppm) == want(prev), s"prev $prev")
      assert(hits <= tot && ppm <= 1000000L)
    }
  }

  test("tfCosinePairs (x163): dot/norms match a multiset replica; threshold is exact") {
    val docs = graft.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val n = Dedup.TfCosShingleN
    val tf = docs.map { case (id, text) =>
      val ws = text.split(" ", -1)
      val grams = (0 to ws.length - n).map(i => ws.slice(i, i + n).mkString(" "))
      id -> grams.groupBy(identity).view.mapValues(_.size.toLong).toMap
    }.toMap
    val df = tf.values.flatMap(_.keys).groupBy(identity).view.mapValues(_.size).toMap
    val kept = tf.view.mapValues(_.filter(kv => df(kv._1) <= Dedup.TfCosMaxTermDf)).toMap
    val norm2 = tf.view.mapValues(_.values.map(t => t * t).sum).toMap
    val ids = docs.map(_._1).sorted
    val want = (for {
      i <- ids.indices; j <- i + 1 until ids.size
      a = ids(i); b = ids(j)
      dot = kept(a).keySet.intersect(kept(b).keySet).toSeq
        .map(w => kept(a)(w) * kept(b)(w)).sum
      if dot > 0 &&
        BigInt(Dedup.TfCosThresholdDen) * Dedup.TfCosThresholdDen * dot * dot >=
        BigInt(Dedup.TfCosThresholdNum) * Dedup.TfCosThresholdNum * norm2(a) * norm2(b)
    } yield (a, b) -> (dot, norm2(a), norm2(b))).toMap
    val got = Dedup.tfCosinePairs(spark, sf)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { case (a, b, dot, n2a, n2b, cos) =>
      assert((dot, n2a, n2b) == want((a, b)), s"pair $a/$b")
      assert(cos == dot.toDouble / math.sqrt(n2a.toDouble * n2b.toDouble))
      assert(cos >= 0.5 - 1e-12 && cos <= 1.0 + 1e-12)
    }
    // the weighting matters: some kept pair is NOT symmetric-identical
    // (dot differs from either norm, i.e. a genuine near- not exact-dup)
    assert(got.exists(r => r._3 != r._4 || r._3 != r._5))
  }

  test("langSourceContingency (x160): full grid with zero cells; deviations sum to zero") {
    val docs = graft.Tables.documents(spark, sf)
      .select($"source", $"lang").as[(String, String)].collect().toSeq
    val cells = docs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rI = docs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val cJ = docs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val n = docs.size.toLong
    val got = TextAnalysis.langSourceContingency(spark, sf)
      .select($"source", $"lang", $"n_ij", $"r_i", $"c_j", $"n_total",
        $"dev_num".cast("string"), $"dev_den".cast("string"))
      .as[(String, String, Long, Long, Long, Long, String, String)].collect()
    // FULL grid: every (source, lang) marginal cross, zero cells included
    assert(got.length == rI.size * cJ.size)
    assert(got.exists(_._3 == 0L), "synthetic corpus should have empty cells")
    got.foreach { case (s, l, nij, ri, cj, nt, num, den) =>
      assert(nij == cells.getOrElse((s, l), 0L), s"cell $s/$l")
      assert(ri == rI(s) && cj == cJ(l) && nt == n)
      assert(BigInt(num) == BigInt(nij) * n - BigInt(ri) * cj, s"cell $s/$l dev")
      assert(BigInt(den) == BigInt(n) * n)
    }
    // deviations from independence cancel exactly over the full grid
    assert(got.map(r => BigInt(r._7)).sum == 0)
  }

  test("qualityRankTest (x161): doubled-U and tie term match a per-row midrank replica") {
    val scores = TextAnalysis.qualityScorePinned(spark, sf)
      .select($"doc_id", $"score_micro").as[(Long, Long)].collect().toMap
    val docs = graft.Tables.documents(spark, sf)
      .select($"doc_id", $"source").as[(Long, String)].collect().toSeq
      .map { case (id, src) => (src, scores(id)) }
    val bySrc = docs.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val srcs = bySrc.keys.toSeq.sorted
    val want = (for {
      i <- srcs.indices; j <- i + 1 until srcs.size
      a = srcs(i); b = srcs(j)
      va = bySrc(a); vb = bySrc(b)
      all = (va ++ vb).sorted
    } yield {
      // per-row midranks ×2: 2·midrank(v) = (#strictly-below)·2 + d + 1
      val below = all.groupBy(identity).view
        .mapValues(g => (all.count(_ < g.head).toLong, g.size.toLong)).toMap
      val r2a = va.map { v => val (o, d) = below(v); BigInt(2 * o + d + 1) }.sum
      val tie = below.values.map { case (_, d) => BigInt(d) * d * d - d }.sum
      (a, b) -> (va.size.toLong, vb.size.toLong,
        r2a - BigInt(va.size) * (va.size + 1), tie)
    }).toMap
    val got = TextAnalysis.qualityRankTest(spark, sf)
      .select($"src_a", $"src_b", $"n_a", $"n_b",
        $"u2_a".cast("string"), $"tie_cubes".cast("string"))
      .as[(String, String, Long, Long, String, String)].collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { case (a, b, na, nb, u2, tc) =>
      val (wna, wnb, wu2, wtc) = want((a, b))
      assert((na, nb) == ((wna, wnb)), s"pair $a/$b sizes")
      assert(BigInt(u2) == wu2 && BigInt(tc) == wtc, s"pair $a/$b stats")
      // 2U ranges over [0, 2·n_a·n_b] exactly
      assert(BigInt(u2) >= 0 && BigInt(u2) <= 2 * BigInt(na) * nb)
    }
  }

  test("sourceTermAffinity (x174): top-K lift panel matches an exhaustive driver replay") {
    // split(-1) keeps trailing empties — the engine's whitespace rule
    val toks = graft.Tables.documents(spark, sf)
      .select($"source", $"text").as[(String, String)].collect().toSeq
      .flatMap { case (s, t) => t.split(" ", -1).map(s -> _) }
    val st = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ns = toks.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val ct = toks.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val nTotal = toks.size.toLong
    val want = st.toSeq.collect {
      case ((src, term), tfS) if tfS >= TextAnalysis.AffinityMinTf =>
        val num = BigInt(tfS) * nTotal
        val den = BigInt(ct(term)) * ns(src)
        (src, term, tfS, num, den, num.toDouble / den.toDouble)
    }.groupBy(_._1).view.mapValues { rows =>
      rows.sortBy(r => (-r._6, r._2)).take(TextAnalysis.AffinityTopK)
        .zipWithIndex.map { case (r, i) => (i + 1L, r._2, r._3, r._4, r._5, r._6) }
    }.toMap
    val got = TextAnalysis.sourceTermAffinity(spark, sf)
      .select($"source", $"rank", $"term", $"tf_s", $"tf_c", $"n_s",
        $"n_total", $"aff_num", $"aff_den", $"affinity")
      .as[(String, Long, String, Long, Long, Long, Long, String, String, Double)]
      .collect()
    assert(got.length == want.values.map(_.size).sum && got.nonEmpty)
    got.foreach { case (src, rank, term, tfS, tfC, nS, nT, num, den, aff) =>
      val (wr, wt, wtf, wnum, wden, waff) = want(src)(rank.toInt - 1)
      assert((wr, wt, wtf) == ((rank, term, tfS)), s"$src rank $rank")
      assert(tfC == ct(term) && nS == ns(src) && nT == nTotal)
      assert(BigInt(num) == wnum && BigInt(den) == wden, s"$src/$term rational")
      assert(aff == waff, s"$src/$term affinity")
      // over-representation panel: every kept term beats corpus share
      // only when lift > 1; the TOP entry always does on this corpus
      if (rank == 1L) assert(aff > 1.0, s"$src top affinity")
    }
  }

  test("hllDistinctAudit (x193): registers and estimate match a driver replay") {
    val nationByCust = graft.Tables.customer(spark, sf)
      .select($"c_custkey", $"c_nationkey").as[(Long, Long)].collect().toMap
    val buyers = graft.Tables.orders(spark, sf)
      .select($"o_custkey").as[Long].collect().toSet
      .groupBy(nationByCust)
    val m = Relational.HllBuckets
    val want = buyers.map { case (nk, cks) =>
      val regs = Array.fill(m)(0L)
      cks.foreach { ck =>
        val h = Dedup.md5Hash60Ref(s"hll:$ck")
        val (bucket, rest) = ((h % m).toInt, h / m)
        val rnk = if (rest == 0L) 57L
                  else java.lang.Long.numberOfTrailingZeros(rest) + 1L
        regs(bucket) = math.max(regs(bucket), rnk)
      }
      val harmonic = regs.map(r => 1L << (58 - math.min(r, 58L)).toInt).sum
      val est = math.floor(172.288 * 288230376151711744.0 / harmonic.toDouble).toLong
      nk -> (cks.size.toLong, regs.max, harmonic, est,
        1000000L * math.abs(est - cks.size) / cks.size)
    }
    val got = Relational.hllDistinctAudit(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { case (nk, n, maxReg, harm, est, ppm) =>
      assert((n, maxReg, harm, est, ppm) == want(nk), s"nation $nk")
    }
  }

  test("boilerplateGrams (x194): within-source df and coverage match a replay") {
    val docs = graft.Tables.documents(spark, sf)
      .select($"doc_id", $"source", $"text").as[(Long, String, String)].collect()
    val n = TextAnalysis.BoilerN
    val grams = docs.flatMap { case (id, src, text) =>
      val ws = text.split(" ", -1)
      ws.sliding(n).filter(_.length == n).map(g => (src, g.mkString(" "), id))
    }
    val df = grams.distinct.groupBy(t => (t._1, t._2)).view.mapValues(_.size).toMap
    val perDoc = grams.groupBy(t => (t._1, t._3)).view.mapValues { gs =>
      val total = gs.length.toLong
      val boiler = gs.count(g => df((g._1, g._2)) >= TextAnalysis.BoilerDfAt).toLong
      (total, boiler, 1000000L * boiler / total)
    }.toMap
    val want = perDoc.groupBy(_._1._1).view.mapValues { ds =>
      (ds.size.toLong, ds.values.map(_._1).sum, ds.values.map(_._2).sum,
        ds.values.count(_._3 >= TextAnalysis.BoilerFlagPpm).toLong)
    }.toMap
    val got = TextAnalysis.boilerplateGrams(spark, sf)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { case (src, nd, tot, boil, flagged, ppm) =>
      assert((nd, tot, boil, flagged) == want(src), s"source $src")
      assert(ppm == 1000000L * boil / tot, s"source $src ppm")
    }
  }

  test("theilSenSlopes (x195): lower-median rational slope matches an exact replay") {
    val nationByCust = graft.Tables.customer(spark, sf)
      .select($"c_custkey", $"c_nationkey").as[(Long, Long)].collect().toMap
    val monthly = graft.Tables.orders(spark, sf)
      .select($"o_custkey", year($"o_orderdate").cast("long"),
        month($"o_orderdate").cast("long"),
        Relational.cents($"o_totalprice"))
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(r => (nationByCust(r._1), r._2, r._3))
      .view.mapValues(_.map(_._4).sum).toSeq
      .groupBy(t => (t._1._1, t._1._2))
    val want = monthly.collect { case ((nk, yr), ms) if ms.size >= 2 =>
      val byMo = ms.map { case ((_, _, mo), rev) => (mo, rev) }.sortBy(_._1)
      val slopes = for {
        i <- byMo.indices; j <- (i + 1) until byMo.size
      } yield (byMo(j)._2 - byMo(i)._2, byMo(j)._1 - byMo(i)._1)
      val nS = slopes.size.toLong
      val t = (nS + 1) / 2
      // rank by cross-multiplied multiset count, tiebreak (num, den)
      val cand = slopes.map { case (num, den) =>
        val cntLe = slopes.count { case (n2, d2) => n2 * den <= num * d2 }.toLong
        (cntLe, num, den)
      }.filter(_._1 >= t).min
      (nk, yr) -> (byMo.size.toLong, nS, cand._2, cand._3)
    }.toMap
    val got = Forecast.theilSenSlopes(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long, Double)].collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { case (nk, yr, nm, ns, num, den, slope) =>
      assert((nm, ns, num, den) == want((nk, yr)), s"group ($nk,$yr)")
      assert(slope == num.toDouble / den.toDouble)
    }
  }

  test("bootstrapCi (x196): deterministic resamples and CI bracket match a replay") {
    val daily = graft.Tables.orders(spark, sf)
      .select(expr("unix_timestamp(o_orderdate) div 86400").as("day"),
        Relational.cents($"o_totalprice").as("c"))
      .as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
    val revByIdx = daily.map(_._2).toArray
    val n = revByIdx.length.toLong
    val totals = (0L until Forecast.BootReps).map { r =>
      val t = (0L until n).map { s =>
        revByIdx(((Dedup.md5Hash60Ref(s"boot:$r:$s") % n + n) % n).toInt)
      }.sum
      (t, r)
    }.sorted
    val Seq((lo, _), (hi, _)) =
      Seq(totals(Forecast.BootLoRank - 1), totals(Forecast.BootHiRank - 1))
    val Array((nd, obs, nr, sumRep, gotLo, gotHi)) = Forecast.bootstrapCi(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(nd == n && obs == revByIdx.sum && nr == Forecast.BootReps)
    assert(sumRep == totals.map(_._1).sum && gotLo == lo && gotHi == hi)
    assert(gotLo <= gotHi)
  }

  test("winsorizedSpend (x197): rank-pick percentiles and clamped sums match a replay") {
    val segByCust = graft.Tables.customer(spark, sf)
      .select($"c_custkey", $"c_mktsegment").as[(Long, String)].collect().toMap
    val spend = graft.Tables.orders(spark, sf)
      .select($"o_custkey", Relational.cents($"o_totalprice").as("c"))
      .as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
    val want = spend.groupBy(t => segByCust(t._1)).view.mapValues { cs =>
      val sorted = cs.sortBy(t => (t._2, t._1)).map(_._2)
      val nn = sorted.length.toLong
      val (loR, hiR) = ((nn * 5 + 99) / 100, (nn * 95 + 99) / 100)
      val (p5, p95) = (sorted(loR.toInt - 1), sorted(hiR.toInt - 1))
      val trimmed = sorted.slice(loR.toInt - 1, hiR.toInt)
      (nn, p5, p95, sorted.sum, sorted.map(v => math.max(p5, math.min(v, p95))).sum,
        trimmed.length.toLong, trimmed.sum)
    }.toMap
    val got = Relational.winsorizedSpend(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { case (seg, nn, p5, p95, raw, win, tn, ts) =>
      assert((nn, p5, p95, raw, win, tn, ts) == want(seg), s"segment $seg")
    }
  }

  test("eventHllAudit (x199): registers and estimate match a driver replay") {
    val pairs = graft.Tables.events(spark, sf)
      .select($"event_type", $"user_id").as[(String, Long)].collect().toSet
    val m = Relational.HllBuckets
    val want = pairs.groupBy(_._1).map { case (et, ps) =>
      val users = ps.map(_._2)
      val regs = Array.fill(m)(0L)
      users.foreach { u =>
        val h = Dedup.md5Hash60Ref(s"hll:$u")
        val (bucket, rest) = ((h % m).toInt, h / m)
        val rnk = if (rest == 0L) 57L
                  else java.lang.Long.numberOfTrailingZeros(rest) + 1L
        regs(bucket) = math.max(regs(bucket), rnk)
      }
      val harmonic = regs.map(r => 1L << (58 - math.min(r, 58L)).toInt).sum
      val est = math.floor(172.288 * 288230376151711744.0 / harmonic.toDouble).toLong
      et -> (users.size.toLong, regs.max, harmonic, est,
        1000000L * math.abs(est - users.size) / users.size)
    }
    val got = Sessionize.eventHllAudit(spark, sf)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { case (et, n, maxReg, harm, est, ppm) =>
      assert((n, maxReg, harm, est, ppm) == want(et), s"type $et")
    }
  }

  test("goodTuringGrams (x200): 5-gram spectrum and GT rationals match a replay") {
    val docs = graft.Tables.documents(spark, sf)
      .select($"text").as[String].collect()
    val n = TextAnalysis.GtN
    val freq = docs.flatMap { t =>
      val ws = t.split(" ", -1)
      ws.sliding(n).filter(_.length == n).map(_.mkString(" "))
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val spec = freq.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val (totalGrams, distinctGrams) = (freq.values.sum, freq.size.toLong)
    val got = TextAnalysis.goodTuringGrams(spark, sf)
      .as[(Long, Long, Long, Long, Long, Option[Double], Long, Long)].collect()
    assert(got.length == TextAnalysis.GtMaxR)
    got.foreach { case (r, nr, nr1, num, den, sm, tot, dst) =>
      assert(nr == spec.getOrElse(r, 0L) && nr1 == spec.getOrElse(r + 1, 0L), s"r=$r")
      assert(num == (r + 1) * nr1 && den == nr, s"r=$r rational")
      assert(sm == (if (nr > 0) Some(num.toDouble / nr) else None), s"r=$r smoothed")
      assert(tot == totalGrams && dst == distinctGrams)
    }
    // the corpus has a genuine rare tail: N_1 > 0 (the GT use case)
    assert(got.head._2 > 0)
  }

  test("prefixJaccardPairs (x201): equals the BRUTE-FORCE all-pairs Jaccard join") {
    val n = Dedup.PjN
    val tau = Dedup.PjTauPpm
    val sets = graft.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, t) =>
        id -> t.split(" ", -1).sliding(n).filter(_.length == n)
          .map(_.mkString(" ")).toSet
      }.filter(_._2.nonEmpty).sortBy(_._1)
    // exhaustive ground truth: every pair, no pruning
    val want = (for {
      i <- sets.indices; j <- (i + 1) until sets.length
      (da, a) = sets(i); (db, b) = sets(j)
      inter = (a & b).size.toLong
      union = a.size + b.size - inter
      if 1000000L * inter >= tau * union
    } yield (da, db) -> (inter, union, 1000000L * inter / union)).toMap
    val got = Dedup.prefixJaccardPairs(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { case (da, db, i, u, ppm) =>
      assert(want((da, db)) == ((i, u, ppm)), s"pair ($da,$db)")
    }
  }

  test("lshRecallCurve (x202): per-radius recall matches an exhaustive driver replay") {
    val k = Similarity.LshCurveK
    val maxR = Similarity.LshProbeRadius
    val signs = Similarity.hyperplaneSigns(Similarity.LshPlanes)
    val vecs = graft.Tables.embeddings(spark, sf)
      .select($"vec_id", Similarity.asDouble($"embedding"))
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
    def sig(v: Seq[Double]): Int =
      signs.zipWithIndex.foldLeft(0) { case (acc, (p, i)) =>
        var proj = 0.0
        var d = 0
        while (d < v.length) { proj += v(d) * p(d); d += 1 }
        if (proj >= 0) acc | (1 << i) else acc
      }
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      math.floor(dot / (math.sqrt(na) * math.sqrt(nb)) * 1e6) / 1e6
    }
    val sigs = vecs.map { case (id, v) => id -> sig(v) }.toMap
    val exactTopk = vecs.map { case (q, qv) =>
      q -> vecs.filter(_._1 != q)
        .map { case (c, cv) => (c, cos(qv, cv)) }
        .sortBy { case (c, s) => (-s, c) }.take(k).map(_._1).toSet
    }.toMap
    val wantRows = (0 to maxR).map { r =>
      var cands = 0L; var hits = 0L
      vecs.foreach { case (q, qv) =>
        val cs = vecs.filter { case (c, _) =>
          c != q && Integer.bitCount(sigs(c) ^ sigs(q)) <= r
        }
        cands += cs.length
        val top = cs.map { case (c, cv) => (c, cos(qv, cv)) }
          .sortBy { case (c, s) => (-s, c) }.take(k).map(_._1)
        hits += top.count(exactTopk(q))
      }
      r.toLong -> (cands, hits)
    }.toMap
    val nq = vecs.length.toLong
    val got = Similarity.lshRecallCurve(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(got.length == maxR + 1)
    got.foreach { case (r, n, nc, nh, rec, avg) =>
      val (wc, wh) = wantRows(r)
      assert(n == nq && nc == wc && nh == wh, s"radius $r")
      assert(rec == 1000000L * wh / (k * nq) && avg == wc / nq, s"radius $r ratios")
    }
    // the curve is a curve: recall strictly improves with radius here
    assert(got.sortBy(_._1).map(_._4).sliding(2).forall(p => p(0) < p(1)))
  }

  test("sampled fidelity audits (x232/x233/x234) ≡ full audits restricted to the query sample") {
    // The production mode keeps an md5-bucket query subset (x27's rule,
    // salt "qsample") and filters EARLY, on the query side of the probe /
    // staged-table reads. These checks restrict the FULL audit LATE — at
    // the per-query detail level, in the driver — and assert equality,
    // proving the filter commutes with the joins and rollups.
    val bps = Similarity.AuditSampleBps
    def kept(id: Long): Boolean =
      graft.functions.Md5Long.hash60(s"qsample:$id") % 10000 < bps
    // x232: the candidate frame is the only place sampling acts; the
    // downstream rollups are per-query-independent aggregates
    val signs = Similarity.hyperplaneSigns(Similarity.LshPlanes)
    val emb = graft.Tables.embeddings(spark, sf)
      .select($"vec_id", Similarity.asDouble($"embedding").as("v"))
      .withColumn("sig", graft.functions.HashSignatures.hyperplane_sig($"v", signs))
    val fullCand = Similarity.lshCurveCandidates(
        emb, Similarity.LshPlanes, Similarity.LshProbeRadius)
      .as[(Long, Long, Double, Int, Long)].collect().toSet
    val sampledCand = Similarity.lshCurveCandidates(
        emb, Similarity.LshPlanes, Similarity.LshProbeRadius, Some(bps))
      .as[(Long, Long, Double, Int, Long)].collect().toSet
    assert(sampledCand == fullCand.filter(r => kept(r._1)))
    assert(sampledCand.nonEmpty && sampledCand.size < fullCand.size)
    // x233: ledger over the late-restricted exact detail
    val k = KnnStage.StageK
    val exact = KnnStage.ranked(spark, sf).as[(Long, Long, Double, Int)]
      .collect().filter(r => r._4 <= k && kept(r._1))
    val annRank = AnnStage.ranked(spark, sf).as[(Long, Long, Double, Int)]
      .collect().filter(_._4 <= k).map(r => (r._1, r._2) -> r._4).toMap
    val wantLedger = exact.groupBy(_._4).map { case (r, rows) =>
      val found = rows.flatMap(p => annRank.get((p._1, p._2)))
      r -> (rows.length.toLong, found.length.toLong,
        1000000L * found.length / rows.length, found.map(_.toLong - r).sum)
    }
    val gotLedger = Similarity.annSwapFidelity(spark, sf, querySampleBps = Some(bps))
      .as[(Int, Long, Long, Long, Long)].collect()
    assert(gotLedger.length == wantLedger.size && gotLedger.nonEmpty)
    gotLedger.foreach { case (r, ne, nf, ppm, disp) =>
      assert(wantLedger(r) == ((ne, nf, ppm, disp)), s"rank $r")
    }
    // x234: panel over the late-restricted first-hit detail
    val labels = graft.Tables.embeddings(spark, sf)
      .select($"vec_id", $"label").as[(Long, String)].collect().toMap
    val ranked = KnnStage.ranked(spark, sf).as[(Long, Long, Double, Int)]
      .collect().filter(r => r._4 <= k && kept(r._1))
    val firstHit = ranked.groupBy(_._1).map { case (q, rows) =>
      q -> rows.filter(r => labels(r._2) == labels(q)).map(_._4).sorted.headOption
    }
    val wantPanel = firstHit.groupBy(p => labels(p._1)).map { case (lab, qs) =>
      lab -> (qs.size.toLong,
        qs.count(_._2.exists(_ <= 1)).toLong,
        qs.count(_._2.exists(_ <= 3)).toLong,
        qs.count(_._2.exists(_ <= 5)).toLong,
        qs.flatMap(_._2).map(r => 1000000L / r).sum)
    }
    val gotPanel = Similarity.retrievalEval(spark, sf, querySampleBps = Some(bps))
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(gotPanel.length == wantPanel.size && gotPanel.nonEmpty)
    gotPanel.foreach { case (lab, n, h1, h3, h5, rr) =>
      assert(wantPanel(lab) == ((n, h1, h3, h5, rr)), s"label $lab")
    }
    // the sample is a real restriction at this corpus size
    assert(gotPanel.map(_._2).sum < labels.size.toLong)
  }

  test("matryoshkaRecall (x238): per-dim ledger matches a driver replay; d=64 is exact") {
    val k = Similarity.LshCurveK
    val vecs = graft.Tables.embeddings(spark, sf)
      .select($"vec_id", Similarity.asDouble($"embedding"))
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
    def cos(a: Seq[Double], b: Seq[Double], d: Int): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < d) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      math.floor(dot / (math.sqrt(na) * math.sqrt(nb)) * 1e6) / 1e6
    }
    def topk(d: Int): Map[Long, Seq[(Long, Int)]] = vecs.map { case (q, qv) =>
      q -> vecs.filter(_._1 != q)
        .map { case (c, cv) => (c, cos(qv, cv, d)) }
        .sortBy { case (c, s) => (-s, c) }.take(k)
        .zipWithIndex.map { case ((c, _), i) => (c, i + 1) }.toSeq
    }.toMap
    val exact = topk(64)
    val want = Similarity.MatryoshkaDims.map { d =>
      val pre = topk(d).map { case (q, l) => q -> l.toMap }
      val hits = exact.toSeq.flatMap { case (q, l) =>
        l.flatMap { case (c, re) => pre(q).get(c).map(rp => (re, rp)) }
      }
      val nExact = exact.values.map(_.size).sum.toLong
      d.toLong -> (nExact, hits.length.toLong,
        1000000L * hits.length / nExact,
        hits.map { case (re, rp) => (rp - re).toLong }.sum)
    }.toMap
    val got = Similarity.matryoshkaRecall(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.length == Similarity.MatryoshkaDims.size)
    got.foreach { case (d, ne, nf, ppm, disp) =>
      assert(want(d) == ((ne, nf, ppm, disp)), s"dim $d")
    }
    // the full-vector row is exact by construction, and fidelity is
    // monotone in d on this corpus (the curve is a curve)
    val byD = got.sortBy(_._1)
    assert(byD.last._4 == 1000000L && byD.last._5 == 0L)
    assert(byD.map(_._3).sliding(2).forall(p => p(0) <= p(1)))
  }

  test("matryoshkaRecall sampled (x282) ≡ full audit restricted to the query sample") {
    // x232/x233/x234's proof applied to the dimension axis: the sampled
    // mode filters EARLY (query side of the scored cross and the staged
    // exact read); this replay restricts the FULL per-query detail LATE,
    // in the driver, and asserts the per-d rollups agree — the rollup is
    // per-query-independent, so restriction commutes.
    val bps = Similarity.MatryoshkaSampleBps
    def kept(id: Long): Boolean =
      graft.functions.Md5Long.hash60(s"qsample:$id") % 10000 < bps
    val k = Similarity.LshCurveK
    val vecs = graft.Tables.embeddings(spark, sf)
      .select($"vec_id", Similarity.asDouble($"embedding"))
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
    assert(vecs.exists(v => kept(v._1)) && vecs.exists(v => !kept(v._1)),
      "the 10% dial must be a real nonempty restriction at this corpus size")
    def cos(a: Seq[Double], b: Seq[Double], d: Int): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < d) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      math.floor(dot / (math.sqrt(na) * math.sqrt(nb)) * 1e6) / 1e6
    }
    // FULL detail (all queries), restricted late to the kept bucket
    def topk(d: Int): Map[Long, Seq[(Long, Int)]] = vecs.map { case (q, qv) =>
      q -> vecs.filter(_._1 != q)
        .map { case (c, cv) => (c, cos(qv, cv, d)) }
        .sortBy { case (c, s) => (-s, c) }.take(k)
        .zipWithIndex.map { case ((c, _), i) => (c, i + 1) }.toSeq
    }.toMap
    val exact = topk(64).filter(p => kept(p._1))
    val want = Similarity.MatryoshkaDims.map { d =>
      val pre = topk(d).map { case (q, l) => q -> l.toMap }
      val hits = exact.toSeq.flatMap { case (q, l) =>
        l.flatMap { case (c, re) => pre(q).get(c).map(rp => (re, rp)) }
      }
      val nExact = exact.values.map(_.size).sum.toLong
      d.toLong -> (nExact, hits.length.toLong,
        1000000L * hits.length / nExact,
        hits.map { case (re, rp) => (rp - re).toLong }.sum)
    }.toMap
    val got = Similarity.matryoshkaRecall(spark, sf, querySampleBps = Some(bps))
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.length == Similarity.MatryoshkaDims.size)
    got.foreach { case (d, ne, nf, ppm, disp) =>
      assert(want(d) == ((ne, nf, ppm, disp)), s"dim $d")
    }
  }

  test("knnIngest (x203): incremental merge equals the from-scratch full ranking") {
    val full = Similarity.computeRankedTopK(spark, sf, KnnStage.StageK)
      .as[(Long, Long, Double, Int)].collect().toSet
    val merged = Similarity.knnIngest(spark, sf)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(merged == full && merged.nonEmpty)
    // the merge did real work: some day-1 list changed when day-2 landed
    val newIds = merged.map(_._1)
      .filter(_ % Similarity.KnnIngestMod == Similarity.KnnIngestMod - 1)
    assert(newIds.nonEmpty, "day-2 batch nonempty")
    val oldListsTouched = merged.exists { case (q, v, _, _) =>
      q % Similarity.KnnIngestMod != Similarity.KnnIngestMod - 1 &&
        v % Similarity.KnnIngestMod == Similarity.KnnIngestMod - 1
    }
    assert(oldListsTouched, "a new vector entered an existing top-k list")
  }

  test("ivmNationRevenue (x206): maintained view equals the full recompute; delta is real") {
    val full = graft.Tables.orders(spark, sf)
      .join(graft.Tables.customer(spark, sf),
        $"o_custkey" === $"c_custkey")
      .groupBy($"c_nationkey")
      .agg(count(lit(1)).as("n"), sum(Relational.cents($"o_totalprice")).as("r"))
      .as[(Long, Long, Long)].collect().toSet
    val got = Relational.ivmNationRevenue(spark, sf)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == full && got.nonEmpty)
    // the split is non-degenerate: both base and delta carry orders
    val days = graft.Tables.orders(spark, sf)
      .select(expr("unix_timestamp(o_orderdate) div 86400")).as[Long].collect()
    assert(days.exists(_ < Relational.IvmCutDay) &&
      days.exists(_ >= Relational.IvmCutDay))
  }

  test("powerIteration (x207): integer rounds match an exact driver replay") {
    val vecs = graft.Tables.embeddings(spark, sf)
      .select($"vec_id", Similarity.asDouble($"embedding"))
      .as[(Long, Seq[Double])].collect()
    val q = vecs.map { case (_, v) =>
      val sc = v.map(math.abs).max
      v.map(x => math.floor(x / sc * Similarity.QuantLevels + 0.5).toLong).toArray
    }
    val scale = Similarity.PiScale
    var v = Array.tabulate(64)(d => if (d == 0) scale else 0L)
    for (_ <- 1 to Similarity.PiIters) {
      val dots = q.map(row => (row, v).zipped.map(_ * _).sum)
      val raw = Array.tabulate(64)(d => q.indices.map(i => q(i)(d) * dots(i)).sum)
      val m = raw.map(math.abs).max
      v = raw.map(r =>
        if (r >= 0) r * scale / m else -((-r) * scale / m))
    }
    val got = Similarity.powerIteration(spark, sf)
      .as[(Int, Long)].collect().sortBy(_._1).map(_._2)
    assert(got.toSeq == v.toSeq)
    // the iteration moved: the result is not the start vector
    assert(got.count(_ != 0L) > 1)
  }

  test("rangeBoundaries (x208): equi-depth split points match an exact replay") {
    val keys = graft.Tables.orders(spark, sf)
      .select($"o_custkey").as[Long].collect().sorted
    val n = keys.length.toLong
    val b = Relational.RangeBuckets
    val hist = keys.groupBy(identity).view.mapValues(_.length.toLong).toSeq.sortBy(_._1)
    val cum = hist.scanLeft((0L, 0L)) { case ((_, c), (k, m)) => (k, c + m) }.drop(1)
    val want = (1 until b).map { i =>
      val target = (i * n + b - 1) / b
      val (bk, cr) = cum.find(_._2 >= target).get
      i.toLong -> (target, bk, cr)
    }.toMap
    val got = Relational.rangeBoundaries(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.length == b - 1)
    got.foreach { case (i, t, bk, cr) => assert(want(i) == ((t, bk, cr)), s"bucket $i") }
    // boundaries are nondecreasing and depths roughly balance
    val bs = got.sortBy(_._1).map(_._3)
    assert(bs.zip(bs.tail).forall(p => p._1 <= p._2))
  }

  test("rangeBoundaries (x208) rides the scale-safe prefix: forced recursion ≡ default, " +
    "cumulative windows are range-partitioned") {
    // the key domain is CUSTOMER keys (data-proportional), so the running
    // sum must never funnel through one task: with maxWindowRows below the
    // distinct-key count the prefix recurses (the 100 TB path) and the
    // boundary table must be identical to the one-level plan's
    val default_ = Relational.rangeBoundaries(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSet
    val forced = Relational.rangeBoundaries(spark, sf, fanout = 10, maxWindowRows = 50)
    assert(forced.as[(Long, Long, Long, Long)].collect().toSet == default_)
    // plan of the cumulative stage itself (rangeBoundaries checkpoints it,
    // so assert on the same prefix call over the real histogram): the
    // per-key window is partitioned by the key range — three bracket
    // groups, `Window [exprs], [partSpec], [orderSpec]` — never a global
    // order over the data-proportional key domain; the only unpartitioned
    // window is the recursion's base case over ≤ maxWindowRows range totals
    val hist = graft.Tables.orders(spark, sf)
      .groupBy($"o_custkey").agg(count(lit(1)).as("n_rows"))
    val offsets = graft.operators.Sampling.exclusivePrefixSum(
      hist.select($"o_custkey", $"n_rows"), fanout = 10, maxWindowRows = 50)
    val plan = offsets.queryExecution.executedPlan.toString
    val windows = "Window \\[.*".r.findAllIn(plan).toList
    assert(windows.nonEmpty, plan)
    assert(windows.exists(w => w.split("\\], \\[").length >= 3),
      s"expected a range-partitioned cumulative window in:\n$plan")
  }

  test("zorderTiles (x209): Morton tiling matches a replay; tiles partition the fact") {
    val rows = graft.Tables.orders(spark, sf)
      .select($"o_custkey", expr("unix_timestamp(o_orderdate) div 86400"))
      .as[(Long, Long)].collect()
    val m = 1 << Relational.ZorderBits
    val (minK, maxK) = (rows.map(_._1).min, rows.map(_._1).max)
    val (minD, maxD) = (rows.map(_._2).min, rows.map(_._2).max)
    def morton(bx: Long, by: Long): Long =
      (0 until Relational.ZorderBits).map(b =>
        (((bx >> b) & 1) << (2 * b + 1)) + (((by >> b) & 1) << (2 * b))).sum
    val tiles = rows.map { case (k, d) =>
      (morton((k - minK) * m / (maxK - minK + 1),
        (d - minD) * m / (maxD - minD + 1)), k, d)
    }
    val want = tiles.groupBy(_._1).view.mapValues { ts =>
      (ts.length.toLong, ts.map(_._2).min, ts.map(_._2).max,
        ts.map(_._3).min, ts.map(_._3).max)
    }.toMap
    val got = Relational.zorderTiles(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(got.length == want.size && got.map(_._2).sum == rows.length.toLong)
    got.foreach { case (t, n, mk, xk, md, xd) =>
      assert(want(t) == ((n, mk, xk, md, xd)), s"tile $t")
    }
  }

  test("groupingSetsPanel (x210): every level reconciles to the grand total") {
    val got = Relational.groupingSetsPanel(spark, sf)
      .as[(Option[Long], Option[Long], Long, Long, Long)].collect()
    val gids = got.map(_._3).toSet
    assert(gids == Set(0L, 1L, 2L, 3L))
    def level(g: Long) = got.filter(_._3 == g)
    val total = level(3L)
    assert(total.length == 1 && total.head._1.isEmpty && total.head._2.isEmpty)
    // each level's orders and revenue sum to the grand total
    Seq(0L, 1L, 2L).foreach { g =>
      assert(level(g).map(_._4).sum == total.head._4, s"gid $g orders")
      assert(level(g).map(_._5).sum == total.head._5, s"gid $g revenue")
    }
    // level key nullability matches the grouping id bits
    assert(level(0L).forall(r => r._1.nonEmpty && r._2.nonEmpty))
    assert(level(1L).forall(r => r._1.nonEmpty && r._2.isEmpty))
    assert(level(2L).forall(r => r._1.isEmpty && r._2.nonEmpty))
  }

  test("lateness audit (x211/x212): sharded prefix-max equals a global-order replay") {
    val raw = graft.Tables.events(spark, sf)
    val rows = raw.select($"event_id", Sessionize.tsSeconds(raw).as("ts_s"))
      .as[(Long, Long)].collect()
      .map { case (id, ts) => (Dedup.md5Hash60Ref(s"arr:$id"), id, ts) }
      .sortBy(t => (t._1, t._2))
    var runMax = Long.MinValue
    val lateness = rows.map { case (_, _, ts) =>
      runMax = math.max(runMax, ts); runMax - ts
    }
    val wantHist = lateness.groupBy(l =>
      if (l == 0L) -1L else 63L - java.lang.Long.numberOfLeadingZeros(l))
      .view.mapValues(ls => (ls.length.toLong, ls.max)).toMap
    val gotHist = Sessionize.latenessHistogram(spark, sf)
      .as[(Long, Long, Long)].collect()
    assert(gotHist.length == wantHist.size && gotHist.nonEmpty)
    gotHist.foreach { case (b, n, m) => assert(wantHist(b) == ((n, m)), s"bucket $b") }
    val gotDrops = Sessionize.watermarkDrops(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(gotDrops.length == Sessionize.LatenessWatermarks.size)
    gotDrops.foreach { case (wm, nd, nt, ppm) =>
      val want = lateness.count(_ > wm).toLong
      assert(nd == want && nt == lateness.length.toLong, s"watermark $wm")
      assert(ppm == 1000000L * want / nt)
    }
    // drops are monotone in the watermark (the sizing curve is a curve)
    val sorted = gotDrops.sortBy(_._1).map(_._2)
    assert(sorted.zip(sorted.tail).forall(p => p._1 >= p._2))
  }

  test("corpusAlignment (x216): referential panel matches the raw id universes") {
    val docs = graft.Tables.documents(spark, sf).select($"doc_id")
      .as[Long].collect().toSet
    val vecs = graft.Tables.embeddings(spark, sf).select($"vec_id")
      .as[Long].collect().toSet
    val Array((nd, nv, nm, du, vo, mnd, mxd, mnv, mxv)) =
      Relational.corpusAlignment(spark, sf)
        .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(nd == docs.size && nv == vecs.size && nm == (docs & vecs).size)
    assert(du == (docs -- vecs).size && vo == (vecs -- docs).size)
    assert(mnd == docs.min && mxd == docs.max && mnv == vecs.min && mxv == vecs.max)
  }

  test("labelTermLift (x217): presence counts, marginals and ranks match a replay") {
    val labels = graft.Tables.embeddings(spark, sf)
      .select($"vec_id", $"label").as[(Long, Int)].collect().toMap
    val pres = graft.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .flatMap { case (id, t) => t.split(" ", -1).distinct.map(w => (id, w)) }
    val o = pres.groupBy { case (id, w) => (labels(id), w) }
      .view.mapValues(_.size.toLong).toMap
    val cs = o.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val rs = labels.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nDocs = labels.size.toLong
    val want = o.toSeq.collect {
      case ((lab, term), c) if c >= TextAnalysis.LabelTermMinDocs =>
        (lab, term, c, cs(term), rs(lab),
          1000000L * c * nDocs / (rs(lab) * cs(term)))
    }.groupBy(_._1).view.mapValues { rows =>
      rows.sortBy { case (_, t, _, _, _, lift) => (-lift, t) }
        .take(TextAnalysis.LabelTermTopK).zipWithIndex
        .map { case ((_, t, c, df, nl, lift), i) =>
          (i + 1L, t) -> (c, df, nl, lift)
        }.toMap
    }.toMap
    val got = TextAnalysis.labelTermLift(spark, sf)
      .as[(Int, Long, String, Long, Long, Long, Long, Long)].collect()
    assert(got.length == want.values.map(_.size).sum && got.nonEmpty)
    got.foreach { case (lab, rk, term, c, df, nl, nd, lift) =>
      assert(nd == nDocs)
      assert(want(lab)((rk, term)) == ((c, df, nl, lift)), s"label $lab rank $rk")
    }
  }

  test("dupeQuality (x219): band rollup reconciles with its two source artifacts") {
    val clusters = ClusterStage.clusters(spark, sf)
      .as[(Long, Long)].collect()
    val sizes = clusters.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val scores = TextAnalysis.qualityScorePinned(spark, sf)
      .select($"doc_id", $"score_micro").as[(Long, Long)].collect().toMap
    def band(sz: Long): String =
      if (sz == 1) "1" else if (sz == 2) "2" else if (sz <= 4) "3-4" else "5+"
    val want = clusters.groupBy { case (_, c) => band(sizes(c)) }
      .view.mapValues { ms =>
        val ss = ms.map { case (d, _) => scores(d) }
        (ms.size.toLong, ms.map(_._2).distinct.size.toLong,
          ss.sum, ss.min, ss.max)
      }.toMap
    val got = TextAnalysis.dupeQuality(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Double)].collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { case (b, n, nc, s, mn, mx, mean) =>
      assert(want(b) == ((n, nc, s, mn, mx)), s"band $b")
      assert(mean == s.toDouble / n, s"band $b mean")
    }
    assert(got.map(_._2).sum == clusters.length.toLong)
  }

  test("tableChecksums (x220): order-independence and sensitivity of the manifest") {
    val got = Relational.tableChecksums(spark, sf)
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got.size == 9)
    // row counts reconcile with the raw tables
    assert(got("orders")._1 == graft.Tables.orders(spark, sf).count())
    assert(got("lineitem")._1 == graft.Tables.lineitem(spark, sf).count())
    // order independence: a reversed-order replay folds to the same checksum
    // (replay uses the length-prefixed canonical form: `len:value` per
    // field, '|'-joined — NULL would render as bare `N`)
    val docs = graft.Tables.documents(spark, sf)
      .select($"doc_id", $"text", $"lang", $"source", $"n_chars")
      .as[(Long, String, String, String, Long)].collect()
    def canon(fields: String*): String =
      fields.map(f => if (f == null) "N" else s"${f.length}:$f").mkString("|")
    def h(r: (Long, String, String, String, Long)): Long =
      Dedup.md5Hash60Ref(canon(
        r._1.toString, r._2, r._3, r._4, r._5.toString)) % Relational.ChecksumMod
    assert(docs.map(h).sum == got("documents")._2)
    assert(docs.reverse.map(h).sum == got("documents")._2)
    // sensitivity: flipping one character changes the fold
    val tweaked = docs.updated(0, docs(0).copy(_2 = docs(0)._2 + "!"))
    assert(tweaked.map(h).sum != got("documents")._2)
    // canonical-string injectivity: the delimiter cannot shift field
    // boundaries and NULL is distinct from the empty string — the naive
    // '|' join collapses all of these pairs
    assert(canon("a|b", "c") != canon("a", "b|c"))
    assert(canon("", "x") != canon(null, "x"))
    assert(canon("a", null) != canon("a", ""))
    // the Spark-side expression agrees with the replay's canonical form
    // on hostile values (delimiter inside a field, NULL, empty)
    val hostile = Seq(("a|b", "c"), ("a", "b|c"), ("", "x"), (null, "x"))
      .toDF("f1", "f2")
    val sparkCanon = hostile.select(expr(
      "concat_ws('|', " +
        "CASE WHEN (f1) IS NULL THEN 'N' ELSE concat(cast(length(f1) as string), ':', f1) END, " +
        "CASE WHEN (f2) IS NULL THEN 'N' ELSE concat(cast(length(f2) as string), ':', f2) END)"))
      .as[String].collect().toSet
    assert(sparkCanon ==
      Seq(("a|b", "c"), ("a", "b|c"), ("", "x"), (null, "x"))
        .map(p => canon(p._1, p._2)).toSet)
    assert(sparkCanon.size == 4)
  }

  test("zoneMapSkipping (x222): skip decisions match a replay; zone maps never false-skip") {
    val rows = graft.Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_custkey").as[(Long, Long)].collect()
    val (minK, maxK) = (rows.map(_._1).min, rows.map(_._1).max)
    val (minC, maxC) = (rows.map(_._2).min, rows.map(_._2).max)
    val (nf, np) = (Relational.ZoneFiles, Relational.ZonePredicates)
    def fOf(k: Long) = (k - minK) * nf / (maxK - minK + 1)
    def pOf(c: Long) = (c - minC) * np / (maxC - minC + 1)
    val files = rows.groupBy(r => fOf(r._1)).map { case (f, rs) =>
      f -> (rs.length.toLong, rs.map(_._2).min, rs.map(_._2).max) }
    val got = Relational.zoneMapSkipping(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(got.length == np)
    got.foreach { case (p, lo, hi, nFiles, nSkipped, scanned, matching) =>
      assert(nFiles == files.size)
      val skipped = files.values.count { case (_, fMin, fMax) => fMax < lo || fMin > hi }
      val scan = files.values.collect {
        case (n, fMin, fMax) if !(fMax < lo || fMin > hi) => n }.sum
      assert((skipped.toLong, scan) == ((nSkipped, scanned)), s"pred $p")
      assert(matching == rows.count(r => pOf(r._2) == p).toLong, s"pred $p")
      // soundness: a skipped file can hold no matching row, so every
      // matching row is inside the scanned set
      assert(matching <= scanned, s"pred $p")
      // the predicate range really is bucket p's key set
      assert(rows.forall(r => (r._2 >= lo && r._2 <= hi) == (pOf(r._2) == p)), s"pred $p")
    }
    assert(got.map(_._7).sum == rows.length.toLong) // predicates partition the fact
  }

  test("bloomSkipping (x277): bitmap replay matches; blooms never false-negative") {
    val rows = graft.Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_custkey").as[(Long, Long)].collect()
    val (minK, maxK) = (rows.map(_._1).min, rows.map(_._1).max)
    val (minC, maxC) = (rows.map(_._2).min, rows.map(_._2).max)
    val nf = Relational.ZoneFiles
    val bits = Relational.BloomWords * 63
    def md5pos(key: Long, i: Int): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$key:$i".getBytes("UTF-8"))
      java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.take(15), 16) % bits
    }
    def posSet(key: Long) = (0 until Relational.BloomHashes).map(md5pos(key, _)).toSet
    val fileKeys = rows.groupBy(r => (r._1 - minK) * nf / (maxK - minK + 1))
      .map { case (f, rs) => f -> rs.map(_._2).toSet }
    val filePos = fileKeys.map { case (f, ks) => f -> ks.flatMap(posSet) }
    val got = Relational.bloomSkipping(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.length == Relational.BloomProbes)
    got.foreach { case (pid, key, nHit, nActual, nFp) =>
      assert(key == minC + pid * ((maxC - minC) / Relational.BloomProbeStepDenom),
        s"probe $pid")
      val hit = fileKeys.keys.count(f => posSet(key).subsetOf(filePos(f)))
      val actual = fileKeys.count { case (_, ks) => ks.contains(key) }
      assert((nHit, nActual, nFp) == ((hit.toLong, actual.toLong, (hit - actual).toLong)),
        s"probe $pid key=$key")
      // the bloom contract: a file holding the key is always admitted
      assert(nActual <= nHit && nFp >= 0, s"probe $pid")
    }
    // the ladder overshoots max_c, so absent-key skipping is exercised
    assert(got.exists(_._4 == 0L))
    assert(got.exists(_._4 > 0L))
  }

  test("bloomServedLookup (x280): served values ≡ direct lookup; pruning is real") {
    val orders = graft.Tables.orders(spark, sf)
      .select($"o_custkey", Relational.cents($"o_totalprice").as("cents"))
      .as[(Long, Long)].collect()
    val audit = Relational.bloomSkipping(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val got = Relational.bloomServedLookup(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.length == Relational.BloomProbes)
    got.foreach { case (pid, key, scanned, nRows, sumCents) =>
      val direct = orders.filter(_._1 == key)
      // end-to-end no-false-negative: the pruned path answers exactly
      assert((nRows, sumCents) == ((direct.length.toLong, direct.map(_._2).sum)),
        s"probe $pid key=$key")
      // the scan-cost column is x277's admission count
      assert(scanned == audit(pid)._3, s"probe $pid")
    }
    // pruning is real: some probe scans strictly fewer than all files
    val nFiles = Relational.ZoneFiles.toLong
    assert(got.exists(_._3 < nFiles))
  }

  test("hilbertSkippingDelta (x278): xy2d replay + bijection + ADJACENCY " +
    "(the property Morton lacks); audit sound on both layouts") {
    // the reference algorithm, straight off the classic xy2d
    def xy2d(n: Int, x0: Int, y0: Int): Long = {
      var x = x0; var y = y0; var d = 0L; var s = n / 2
      while (s > 0) {
        val rx = if ((x & s) > 0) 1 else 0
        val ry = if ((y & s) > 0) 1 else 0
        d += s.toLong * s * ((3 * rx) ^ ry)
        if (ry == 0) {
          if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
          val t = x; x = y; y = t
        }
        s /= 2
      }
      d
    }
    // drive the SHARED step list (the text both engines execute)
    var df = spark.range(64).selectExpr("id div 8 AS x", "id % 8 AS y",
      "id div 8 AS hx", "id % 8 AS hy", "CAST(0 AS BIGINT) AS hd")
    Relational.hilbertSteps(8, "div").foreach { case (n2, s2) =>
      df = df.withColumn(n2, expr(s2))
    }
    val dmap = df.select($"x", $"y", $"hd").as[(Long, Long, Long)].collect()
    dmap.foreach { case (x, y, d) => assert(d == xy2d(8, x.toInt, y.toInt), s"($x,$y)") }
    assert(dmap.map(_._3).toSet == (0L until 64L).toSet) // bijection on the grid
    val byD = dmap.map(t => t._3 -> ((t._1, t._2))).toMap
    (0L until 63L).foreach { d =>
      val (x1, y1) = byD(d); val (x2, y2) = byD(d + 1)
      assert((x1 - x2).abs + (y1 - y2).abs == 1, s"hilbert seam at d=$d")
    }
    // the contrast the audit prices: Morton consecutive cells DO jump
    def morton(x: Long, y: Long) = (0 until 3).map(b =>
      (((x >> b) & 1) << (2 * b + 1)) + (((y >> b) & 1) << (2 * b))).sum
    val byZ = (for (x <- 0L until 8L; y <- 0L until 8L) yield morton(x, y) -> ((x, y))).toMap
    assert((0L until 63L).exists { z =>
      val (x1, y1) = byZ(z); val (x2, y2) = byZ(z + 1)
      (x1 - x2).abs + (y1 - y2).abs > 1
    })
    // the audit itself: every rectangle's matches are inside both scans
    val got = Relational.hilbertSkippingDelta(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.length == Relational.RectPreds * Relational.RectPreds)
    got.foreach { case (p, mch, sz, sh, saved) =>
      assert(mch <= sz && mch <= sh, s"p=$p")
      assert(saved == sz - sh, s"p=$p")
    }
    assert(got.map(_._2).sum == graft.Tables.orders(spark, sf).count())
  }

  test("zorderSkippingDelta (x231): both layouts match a replay; zone maps sound on each; " +
    "the rewrite helps on this corpus") {
    val rows = graft.Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_custkey", expr("unix_timestamp(o_orderdate) div 86400"))
      .as[(Long, Long, Long)].collect()
    val (minK, maxK) = (rows.map(_._1).min, rows.map(_._1).max)
    val (minC, maxC) = (rows.map(_._2).min, rows.map(_._2).max)
    val (minD, maxD) = (rows.map(_._3).min, rows.map(_._3).max)
    val (nf, np, m) = (Relational.ZoneFiles, Relational.ZonePredicates, 8)
    def morton(bx: Long, by: Long) = (0 until 3).map(b =>
      (((bx >> b) & 1) << (2 * b + 1)) + (((by >> b) & 1) << (2 * b))).sum
    def files(assign: ((Long, Long, Long)) => Long) =
      rows.groupBy(assign).map { case (f, rs) =>
        f -> (rs.length.toLong, rs.map(_._2).min, rs.map(_._2).max) }
    val cur = files(r => (r._1 - minK) * nf / (maxK - minK + 1))
    val zo = files(r => morton((r._2 - minC) * m / (maxC - minC + 1),
      (r._3 - minD) * m / (maxD - minD + 1)))
    def scanned(fs: Map[Long, (Long, Long, Long)], lo: Long, hi: Long) =
      fs.values.collect { case (n, fMin, fMax) if !(fMax < lo || fMin > hi) => n }.sum
    val got = Relational.zorderSkippingDelta(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.length == np)
    got.foreach { case (p, matching, sc, sz, saved) =>
      val lo = minC + (p * (maxC - minC + 1) + np - 1) / np
      val hi = minC + ((p + 1) * (maxC - minC + 1) + np - 1) / np - 1
      assert((scanned(cur, lo, hi), scanned(zo, lo, hi)) == ((sc, sz)), s"pred $p")
      assert(saved == sc - sz, s"pred $p")
      // soundness on BOTH layouts: no matching row is in a skipped file
      assert(matching <= sc && matching <= sz, s"pred $p")
    }
    // the rewrite's whole point, measured not asserted: custkey-coherent
    // tiles beat the insertion order on every custkey predicate here
    assert(got.forall(r => r._5 > 0))
  }

  test("joinCardinalityAudit (x223): per-bucket estimate/exact match a replay; " +
    "uniformity never overestimates within a bucket (Cauchy–Schwarz)") {
    val counts = graft.Tables.lineitem(spark, sf)
      .groupBy($"l_partkey").count().as[(Long, Long)].collect()
    val (minK, maxK) = (counts.map(_._1).min, counts.map(_._1).max)
    val nb = Relational.CardBuckets
    val want = counts.groupBy(r => (r._1 - minK) * nb / (maxK - minK + 1))
      .map { case (b, ks) =>
        val nRows = ks.map(_._2).sum; val ndv = ks.length.toLong
        val exact = ks.map(c => c._2 * c._2).sum
        val est = nRows * nRows / ndv
        val err = if (est >= exact) 1000000L * (est - exact) / exact
                  else -(1000000L * (exact - est) / exact)
        b -> (nRows, ndv, est, exact, err)
      }
    val got = Relational.joinCardinalityAudit(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { case (b, nRows, ndv, est, exact, err) =>
      assert(want(b) == ((nRows, ndv, est, exact, err)), s"bucket $b")
      // Σc² ≥ (Σc)²/ndv: the uniformity assumption can only UNDERestimate
      // a self-join bucket — skew is invisible to it, which is the point
      assert(est <= exact && err <= 0, s"bucket $b")
    }
  }

  test("centroidDrift (x224): quantized centroids and lag-1 L1 match a replay") {
    val emb = graft.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    val (minId, maxId) = (emb.map(_._1).min, emb.map(_._1).max)
    val nb = Similarity.DriftBatches
    val cent = emb.groupBy(r => (r._1 - minId) * nb / (maxId - minId + 1))
      .map { case (b, vs) =>
        val qs = vs.map { case (_, v) =>
          val d = v.map(_.toDouble)
          val sc = d.map(math.abs).max
          d.map(x => if (sc == 0) 0L else math.floor(x / sc * 127.0 + 0.5).toLong)
        }
        val n = qs.length.toLong
        b -> (n, Array.tabulate(64) { dd =>
          val s = qs.map(_(dd)).sum
          if (s >= 0) s * Similarity.DriftScale / n
          else -((-s) * Similarity.DriftScale / n)
        })
      }
    val got = Similarity.centroidDrift(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.length == nb - 1) // batch 0 has no predecessor
    got.foreach { case (b, n, l1, maxShift) =>
      val (wn, cur) = cent(b); val (_, prev) = cent(b - 1)
      val diffs = cur.zip(prev).map { case (a, p) => math.abs(a - p) }
      assert((n, l1, maxShift) == ((wn, diffs.sum, diffs.max)), s"batch $b")
    }
  }

  test("retrievalEval (x225): per-label panel matches a staged-table replay; hit@k nested") {
    val k = graft.operators.KnnStage.StageK
    val labels = graft.Tables.embeddings(spark, sf)
      .select($"vec_id", $"label").as[(Long, String)].collect().toMap
    val ranked = graft.operators.KnnStage.ranked(spark, sf)
      .as[(Long, Long, Double, Int)].collect().filter(_._4 <= k)
    val firstHit = ranked.groupBy(_._1).map { case (q, rows) =>
      q -> rows.filter(r => labels(r._2) == labels(q)).map(_._4).sorted.headOption
    }
    val want = firstHit.groupBy(p => labels(p._1)).map { case (lab, qs) =>
      lab -> (qs.size.toLong,
        qs.count(_._2.exists(_ <= 1)).toLong,
        qs.count(_._2.exists(_ <= 3)).toLong,
        qs.count(_._2.exists(_ <= 5)).toLong,
        qs.flatMap(_._2).map(r => 1000000L / r).sum)
    }
    val got = Similarity.retrievalEval(spark, sf)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { case (lab, n, h1, h3, h5, rr) =>
      assert(want(lab) == ((n, h1, h3, h5, rr)), s"label $lab")
      assert(h1 <= h3 && h3 <= h5 && h5 <= n, s"label $lab")
    }
    // the panel covers every query exactly once
    assert(got.map(_._2).sum == firstHit.size.toLong)
  }

  test("peakConcurrency (x226): sweep-line peaks with midnight carry match a replay") {
    val sessions = Sessionize.sessions(spark, sf)
      .select($"session_start_s", $"session_end_s").as[(Long, Long)].collect()
    val deltas = (sessions.map(s => s._1 -> 1L) ++ sessions.map(s => (s._2 + 1) -> -1L))
      .groupBy(_._1).map { case (sec, ds) => sec -> ds.map(_._2).sum }.toSeq.sortBy(_._1)
    var run = 0L
    val conc = deltas.map { case (sec, d) => run += d; (sec, run) }
    val byDay = conc.groupBy(_._1 / 86400)
    val (d0, d1) = (byDay.keys.min, byDay.keys.max)
    // carry-in at each midnight = level at the last boundary before it;
    // a boundary exactly AT midnight voids the carry (the pre-midnight
    // level is never attained during the day)
    var carryLevel = 0L
    val want = (d0 to d1).map { day =>
      val cs = byDay.getOrElse(day, Seq.empty)
      val carry = if (cs.exists(_._1 == day * 86400)) -1L else carryLevel
      val dayMax = if (cs.isEmpty) 0L else cs.map(_._2).max
      val peak = math.max(carry, dayMax)
      val atS = if (carry >= peak) day * 86400
                else cs.filter(_._2 == peak).map(_._1).min
      val row = day -> (peak, atS, cs.length.toLong)
      if (cs.nonEmpty) carryLevel = cs.maxBy(_._1)._2
      row
    }.toMap
    val got = Sessionize.peakConcurrency(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { case (day, peak, atS, nB) =>
      assert(want(day) == ((peak, atS, nB)), s"day $day")
    }
    assert(got.map(_._2).max <= sessions.length.toLong)
    // planted carry fixture: one session spanning four days (events every
    // 25 min so the 30-min gap never breaks it) — the two middle days
    // have NO boundaries of their own, yet the serving tier holds the
    // session across them: their peak must be the carried level 1 at
    // midnight, and the old boundary-only formulation reported nothing
    val dir = java.nio.file.Files.createTempDirectory("graft-conc").toString
    val t0 = 1600000000L - (1600000000L % 86400) + 43200 // noon, day-aligned base
    val day0 = t0 / 86400
    val m6 = (day0 + 6) * 86400 // day-6 midnight
    val evs = (0 to 207).map { i =>
      (i.toLong, new java.sql.Timestamp((t0 + i * 1500L) * 1000L), 1L, "view",
        1.0, "{}")
    } ++ Seq(
      (999L, new java.sql.Timestamp((t0 + 3600L) * 1000L), 2L, "view", 1.0, "{}"),
      // user 3's session ends at the LAST second of day 5, so its −1
      // boundary lands exactly at day-6 midnight — the carry must be
      // voided (the pre-midnight level 1 is never attained on day 6)
      (1000L, new java.sql.Timestamp((m6 - 1000L) * 1000L), 3L, "view", 1.0, "{}"),
      (1001L, new java.sql.Timestamp((m6 - 1L) * 1000L), 3L, "view", 1.0, "{}"))
    evs.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val planted = Sessionize.peakConcurrency(spark, dir)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // middle days: no boundaries, carried peak 1 attained at midnight
    Seq(day0 + 1, day0 + 2).foreach { d =>
      assert(planted(d) == ((d, 1L, d * 86400, 0L)), s"carried day $d")
    }
    assert(planted(day0)._2 == 2L) // both sessions open on day 0
    // the midnight-boundary day: peak 0 (NOT the stale carried 1)
    assert(planted(day0 + 6) == ((day0 + 6, 0L, m6, 1L)), "midnight-boundary day")
  }

  test("quantileSketchAudit (x227): histogram estimate and exact rank pick match a replay") {
    val vals = graft.Tables.orders(spark, sf)
      .select(Relational.cents($"o_totalprice")).as[Long].collect().sorted
    val n = vals.length.toLong
    val (minV, maxV) = (vals.min, vals.max)
    val nb = Relational.QsBuckets
    def bOf(v: Long) = (v - minV) * nb / (maxV - minV + 1)
    def lo(b: Long) = minV + (b * (maxV - minV + 1) + nb - 1) / nb
    val bc = vals.groupBy(bOf).view.mapValues(_.length.toLong).toMap
    val got = Relational.quantileSketchAudit(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.length == Relational.QsPcts.length)
    got.foreach { case (pct, target, est, exact, err) =>
      assert(target == (pct * n + 99) / 100, s"pct $pct")
      assert(exact == vals(target.toInt - 1), s"pct $pct") // exact rank pick
      val b = bc.keys.toSeq.sorted
        .find(k => bc.keys.toSeq.filter(_ <= k).map(bc).sum >= target).get
      val cumBefore = bc.keys.toSeq.filter(_ < b).map(bc).sum
      val width = lo(b + 1) - lo(b)
      val wantEst = lo(b) + (target - cumBefore - 1) * width / bc(b)
      assert(est == wantEst, s"pct $pct")
      assert(err == 1000000L * math.abs(est - exact) / exact, s"pct $pct")
      // the estimate can't leave its bucket
      assert(est >= lo(b) && est < lo(b + 1), s"pct $pct")
    }
  }

  test("browseRunCensus (x228): census matches a sequential pattern-scan replay") {
    val raw = graft.Tables.events(spark, sf)
    val rows = raw.select($"user_id", $"event_id", $"event_type",
        Sessionize.tsSeconds(raw))
      .as[(Long, Long, String, Long)].collect()
    // sequential replay: per user in (ts, event_id) order, walk maximal
    // view/click runs and classify by the event that ends them
    val runs = rows.groupBy(_._1).toSeq.flatMap { case (u, es) =>
      val ordered = es.sortBy(e => (e._4, e._2)).map(_._3)
      var l = 0L
      val res = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String)]
      for (i <- ordered.indices) {
        if (ordered(i) == "view" || ordered(i) == "click") l += 1
        else { if (l > 0) res += ((u, l,
          if (ordered(i) == "purchase") "converted" else "abandoned")); l = 0 }
      }
      if (l > 0) res += ((u, l, "open"))
      res
    }
    val want = runs.groupBy(r => (math.min(r._2, Sessionize.RunLenCap.toLong), r._3))
      .map { case (k, rs) => k -> (rs.length.toLong, rs.map(_._1).distinct.length.toLong) }
    val got = Sessionize.browseRunCensus(spark, sf)
      .as[(Long, String, Long, Long)].collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { case (lb, oc, nr, nu) =>
      assert(want((lb, oc)) == ((nr, nu)), s"cell ($lb, $oc)")
    }
    assert(got.map(_._3).sum == runs.length.toLong)
    // all three outcomes occur on this corpus
    assert(got.map(_._2).toSet == Set("converted", "abandoned", "open"))
  }

  test("stockLedger (x229): closed-form scan equals the sequential clamp fold") {
    val daily = graft.Tables.lineitem(spark, sf)
      .select($"l_partkey", expr("unix_timestamp(l_shipdate) div 86400"),
        when($"l_returnflag" === "R", expr("cast(round(l_quantity) as bigint)"))
          .otherwise(-expr("cast(round(l_quantity) as bigint)")))
      .as[(Long, Long, Long)].collect()
      .groupBy(r => (r._1, r._2)).view.mapValues(_.map(_._3).sum).toSeq
      .map { case ((p, d), f) => (p, d, f) }
    val want = daily.groupBy(_._1).map { case (p, fs) =>
      val flows = fs.sortBy(_._2).map(_._3)
      var s = 0L; var peak = 0L; var loss = 0L
      var last = 0L
      flows.foreach { f =>
        val raw = s + f
        if (raw < 0) { loss += -raw; s = 0L } else s = raw
        peak = math.max(peak, s); last = s
      }
      p -> (flows.length.toLong, last, loss, peak)
    }
    val got = Relational.stockLedger(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { case (p, nd, fin, loss, peak) =>
      assert(want(p) == ((nd, fin, loss, peak)), s"part $p")
      assert(fin >= 0 && peak >= fin, s"part $p") // the clamp held
    }
    // the clamp actually fires somewhere (the query is not vacuously a prefix sum)
    assert(got.exists(_._4 > 0))
  }

  test("importanceEss (x230): decimal moments match a BigInt replay; ESS ≤ n (Cauchy–Schwarz)") {
    val w = Sampling.dsirImportance(spark, sf)
      .select($"doc_id", $"imp_per_tok").as[(Long, Long)].collect().toMap
    val src = graft.Tables.documents(spark, sf)
      .select($"doc_id", $"source").as[(Long, String)].collect().toMap
    val want = w.toSeq.groupBy(p => src(p._1)).map { case (s, ws) =>
      val vs = ws.map(p => BigInt(p._2))
      s -> (ws.length.toLong, vs.sum, vs.sum * vs.sum, vs.map(v => v * v).sum)
    }
    val got = Sampling.importanceEss(spark, sf)
      .as[(String, Long, String, String, String)].collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { case (s, n, sw, num, den) =>
      assert(want(s) == ((n, BigInt(sw), BigInt(num), BigInt(den))), s"source $s")
      // Kish ESS = num/den ≤ n, with equality iff weights are uniform
      assert(BigInt(num) <= BigInt(den) * n, s"source $s")
      assert(BigInt(den) > 0, s"source $s")
    }
  }

  test("conformalIntervals (x204): rank-picked quantile and coverage match a replay") {
    val brandByPart = graft.Tables.part(spark, sf)
      .select($"p_partkey", $"p_brand").as[(Long, String)].collect().toMap
    val daily = graft.Tables.lineitem(spark, sf)
      .select($"l_partkey", expr("unix_timestamp(l_shipdate) div 86400"),
        Relational.cents($"l_extendedprice"))
      .as[(Long, Long, Long)].collect()
      .groupBy(r => (brandByPart(r._1), r._2))
      .view.mapValues(_.map(_._3).sum).toMap
    val minDay = daily.keys.map(_._2).min
    val pct = Forecast.ConformalPct
    val want = daily.keys.groupBy(_._1).map { case (brand, ks) =>
      val errs = ks.toSeq.filter(_._2 >= minDay + Forecast.SeasonalLagDays)
        .map { case (b, d) =>
          (d, math.abs(daily((b, d)) -
            daily.getOrElse((b, d - Forecast.SeasonalLagDays), 0L)))
        }
      val sorted = errs.sortBy { case (d, e) => (e, d) }.map(_._2)
      val n = sorted.length.toLong
      val qRank = math.min((pct * (n + 1) + 99) / 100, n)
      val q = sorted(qRank.toInt - 1)
      val within = sorted.count(_ <= q).toLong
      brand -> (n, q, within, 1000000L * within / n)
    }
    val got = Forecast.conformalIntervals(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { case (b, n, q, w, cov) =>
      assert((n, q, w, cov) == want(b), s"brand $b")
      // the conformal guarantee itself: coverage ≥ the target level
      assert(cov >= pct * 10000L, s"brand $b coverage")
    }
  }
  test("cdcApply (x245): last-wins collapse equals a sequential replay of the feed") {
    val ks = Relational.CdcKeySpace.toLong
    val feed = graft.Tables.orders(spark, sf)
      .select($"o_orderkey", round($"o_totalprice" * 100).cast("long"),
        $"o_orderpriority")
      .as[(Long, Long, String)].collect()
      .map { case (okey, cents, prio) =>
        (okey % ks, okey,
          if (okey % Relational.CdcDeleteMod == Relational.CdcDeleteAt) "D" else "U",
          cents, prio)
      }
    // sequential replay: apply ops strictly in seq order per key
    val state = scala.collection.mutable.Map.empty[Long, (Long, String)]
    val nOps = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    val nDel = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    feed.sortBy(_._2).foreach { case (k, _, op, cents, prio) =>
      nOps(k) += 1
      if (op == "D") { nDel(k) += 1; state.remove(k) }
      else state(k) = (cents, prio)
    }
    val want = state.toMap.map { case (k, (c, p)) => k -> (c, p, nOps(k), nDel(k)) }
    val got = Relational.cdcApply(spark, sf)
      .as[(Long, Long, String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    assert(got == want && got.nonEmpty)
    // deletes actually fire: some keys are absent from the final state
    // (at this tiny sf most keys see one op, so a deleted key stays dead)
    assert(want.size < feed.map(_._1).distinct.length)
    assert(feed.exists(_._3 == "D"))
  }

  test("kAnonymityAudit (x248): census exact on a planted class layout; corpus rows conserve") {
    // planted: two classes of 3 (at risk), one class of 12 (safe)
    val qi = (Seq.fill(3)(("a", 1L)) ++ Seq.fill(3)(("b", 1L)) ++
      Seq.fill(12)(("c", 2L))).toDF("q1", "q2")
    val census = Relational.kAnonymityOf(qi)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(census == Map(3L -> ((2L, 6L, 1L)), 12L -> ((1L, 12L, 0L))))
    // corpus: every order lands in exactly one class
    val corpus = Relational.kAnonymityAudit(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(corpus.map(_._3).sum == graft.Tables.orders(spark, sf).count())
    corpus.foreach { r =>
      assert(r._1 * r._2 == r._3) // size x classes = rows
      assert(r._4 == (if (r._1 < Relational.KAnonThreshold) 1L else 0L))
    }
  }

  test("schemaEvolutionRead (x252): merged read unifies schemas, loses nothing") {
    val dir = SchemaStage.evolvedDir(spark, sf)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("k", "cents", "prio"))
    assert(merged.count() == graft.Tables.orders(spark, sf).count())
    // old-generation rows (even keys) surface with NULL prio, new with values
    assert(merged.filter($"k" % 2 === 0).filter($"prio".isNotNull).count() == 0)
    assert(merged.filter($"k" % 2 === 1).filter($"prio".isNull).count() == 0)
    // WITHOUT mergeSchema the footer-picked schema may drop prio — the
    // audited read is the mergeSchema one (behavior documented, not assumed)
  }

  test("pitTierJoin (x253): exactly one interval covers every order; census ≡ hand replay") {
    // 1:1 as-of match — the zero-length same-day intervals cover nothing
    val iv = Relational.tierIntervals(spark, sf)
    val o = graft.Tables.orders(spark, sf).select(
      $"o_custkey".as("ck"), $"o_orderkey",
      expr("unix_timestamp(o_orderdate) div 86400").as("day"))
    val joined = o.join(iv, $"ck" === $"o_custkey" &&
      $"day" >= $"valid_from_day" &&
      ($"valid_to_day".isNull || $"day" < $"valid_to_day"))
    assert(joined.count() == o.count())

    // hand replay: end-of-day tier per order (tier after the last order
    // of that customer-day)
    def tierOf(n: Long) =
      if (n < Relational.TierSilverAt) "bronze"
      else if (n < Relational.TierGoldAt) "silver" else "gold"
    val seqs = o.as[(Long, Long, Long)].collect().toSeq
      .groupBy(_._1).toSeq.flatMap { case (ck, rows) =>
        val sorted = rows.sortBy(r => (r._3, r._2))
        val lastN = sorted.groupBy(_._3).map { case (d, rs) =>
          d -> (sorted.indexWhere(_ == rs.maxBy(_._2)) + 1).toLong
        }
        sorted.map { case (_, _, d) => (ck, tierOf(lastN(d))) }
      }
    val want = seqs.groupBy(_._2).map { case (t, rs) =>
      t -> (rs.size.toLong, rs.map(_._1).distinct.size.toLong)
    }
    val got = Relational.pitTierJoin(spark, sf)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == want && got.nonEmpty)
  }

  test("editDistanceDedup (x255): census equals a DP-levenshtein hand replay of the candidates") {
    def lev(a: String, b: String): Int = {
      val prev = Array.tabulate(b.length + 1)(identity)
      val cur = new Array[Int](b.length + 1)
      for (i <- 1 to a.length) {
        cur(0) = i
        for (j <- 1 to b.length)
          cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1),
            prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        Array.copy(cur, 0, prev, 0, cur.length)
      }
      prev(b.length)
    }
    val raw = graft.Tables.documents(spark, sf)
    val (_, banded) = Dedup.bandFrames(raw, 5, 32, 8)
    val cands = banded.select($"band", $"bucket".cast("string"), $"doc_id")
      .as[(Long, String, Long)]
      .collect().toSeq.groupBy(r => (r._1, r._2)).values.toSeq
      .flatMap(g => for (a <- g; b <- g if a._3 < b._3) yield (a._3, b._3))
      .distinct
    val texts = raw.select($"doc_id", $"text").as[(Long, String)].collect().toMap
    val want = cands.map { case (a, b) =>
        val d = lev(texts(a), texts(b))
        if (d > Dedup.LevThreshold) -1L else d.toLong
      }
      .groupBy(d => if (d < 0) -1L else d / Dedup.LevBandWidth)
      .map { case (band, ds) =>
        band -> ((ds.size.toLong, ds.min, ds.max))
      }
    val got = Dedup.editDistanceDedup(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got == want && got.nonEmpty)
  }

  test("qualityRetentionSweep (x256): monotone retention; totals replay by hand") {
    val got = TextAnalysis.qualityRetentionSweep(spark, sf)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._3) -> (r._2, r._4, r._5, r._6)).toMap
    assert(got.nonEmpty)
    val bySource = got.groupBy(_._1._1)
    bySource.foreach { case (src, rows) =>
      val sorted = rows.toSeq.sortBy(_._1._2)
      // retention non-increasing as the bar rises; kept <= total
      sorted.sliding(2).foreach {
        case Seq(a, b) => assert(a._2._2 >= b._2._2, s"$src not monotone")
        case _         =>
      }
      sorted.foreach { case ((_, _), (nDocs, nKept, _, ppm)) =>
        assert(nKept <= nDocs)
        assert(ppm == 1000000L * nKept / nDocs)
      }
    }
    // hand replay of one threshold from the scored corpus
    val thr = TextAnalysis.SweepThresholds.head
    val scored = graft.Tables.documents(spark, sf).select($"source",
        floor(least(lit(1.0), size(split($"text", " ")) / lit(100.0)) *
          (lit(1.0) - size(filter(split($"text", " "), w => length(w) === 1))
            / size(split($"text", " "))) * lit(1000000.0)).cast("long").as("s"),
        $"n_chars")
      .as[(String, Long, Long)].collect().toSeq
    scored.groupBy(_._1).foreach { case (src, rows) =>
      val kept = rows.filter(_._2 >= thr)
      val (nDocs, nKept, chars, ppm) = got((src, thr))
      assert(nDocs == rows.size.toLong && nKept == kept.size.toLong, src)
      assert(chars == kept.map(_._3).sum, src)
      assert(ppm == 1000000L * nKept / nDocs, src)
    }
  }

  test("containmentScores (x257): panel equals a hand replay over distinct shingles") {
    val n = 5
    val docs = graft.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    def shingles(t: String): Set[String] = {
      val w = t.split(" ")
      if (w.length < n) Set.empty
      else (0 to w.length - n).map(i => w.slice(i, i + n).mkString(" ")).toSet
    }
    val benchMax = 20L
    val bench = docs.filter(_._1 < benchMax).map { case (id, t) => id -> shingles(t) }
    val train = docs.filter(_._1 >= benchMax).map { case (id, t) => id -> shingles(t) }
    val want = bench.flatMap { case (bid, bsh) =>
      val pairs = train.map { case (tid, tsh) =>
          tid -> 1000000L * (bsh & tsh).size / bsh.size
        }.filter(_._2 > 0)
      if (pairs.isEmpty) None
      else {
        val maxPpm = pairs.map(_._2).max
        Some(bid -> ((bsh.size.toLong,
          pairs.count(_._2 >= Dedup.ContainMinPpm).toLong,
          maxPpm, pairs.filter(_._2 == maxPpm).map(_._1).min)))
      }
    }.toMap
    val got = Dedup.containmentScores(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got == want && got.nonEmpty)
  }
}
