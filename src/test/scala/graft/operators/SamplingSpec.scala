package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  test("trainTestSplit partitions the corpus deterministically, roughly 80/10/10") {
    val split = Sampling.trainTestSplit(spark, sf)
    val total = graft.Tables.documents(spark, sf).count()
    assert(split.count() == total) // every doc gets exactly one split
    val byKind = split.groupBy($"split").count().as[(String, Long)].collect().toMap
    assert(byKind.keySet == Set("train", "valid", "test"))
    assert(byKind("train") > byKind("valid") && byKind("train") > byKind("test"))
    // reproducible: a second evaluation assigns identically (hash, not rand)
    val a = split.select($"doc_id", $"split").as[(Long, String)].collect().toSet
    val b = Sampling.trainTestSplit(spark, sf)
      .repartition(7) // stable under any partitioning
      .select($"doc_id", $"split").as[(Long, String)].collect().toSet
    assert(a == b)
  }

  test("stratifiedSample keeps all of zh, about half of en, and is a stable subset") {
    val docs = graft.Tables.documents(spark, sf)
    val sample = Sampling.stratifiedSample(spark, sf)
    val zhAll = docs.filter($"lang" === "zh").count()
    assert(sample.filter($"lang" === "zh").count() == zhAll) // rate 10000/10000
    val enAll = docs.filter($"lang" === "en").count()
    val enKept = sample.filter($"lang" === "en").count()
    assert(enKept > 0 && enKept < enAll)
    val again = Sampling.stratifiedSample(spark, sf).select($"doc_id").as[Long].collect().toSet
    assert(sample.select($"doc_id").as[Long].collect().toSet == again)
  }

  test("two-level prefix-sum packing equals the naive global-window cumsum") {
    import org.apache.spark.sql.expressions.Window
    val packed = Sampling.packSequences(spark, sf, budgetTokens = 512, bucketSize = 7)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(packed.nonEmpty)
    // naive single-partition reference (fine at test scale, the shape the
    // bucketed prefix sum exists to avoid)
    val naive = graft.Tables.documents(spark, sf)
      .select($"doc_id", size(split($"text", " ")).cast("long").as("n_tokens"))
      .withColumn("tokens_before",
        coalesce(sum($"n_tokens").over(
          Window.orderBy($"doc_id").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("bin_id", org.apache.spark.sql.functions.expr("tokens_before div 512"))
      .groupBy($"bin_id")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tokens").as("sum_tokens"),
        min($"doc_id").as("first_doc"), max($"doc_id").as("last_doc"))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(packed == naive)
    // bins are contiguous doc ranges and every doc is packed exactly once
    val total = graft.Tables.documents(spark, sf).count()
    assert(packed.toSeq.map(_._2).sum == total)
  }

  test("exclusivePrefixSum recursion (forced) equals the naive global-window prefix") {
    import org.apache.spark.sql.expressions.Window
    // 5000 keys, fanout 10, window cap 100 → levels of 5000 → 500 → 50 rows:
    // two forced recursions before the base-case window is allowed to run
    val rows = (0L until 5000L).map(k => (k * 3, k % 17 + 1)) // sparse keys, varied values
    val level = rows.toDF("key", "v")
    val got = Sampling.exclusivePrefixSum(level, fanout = 10, maxWindowRows = 100)
      .as[(Long, Long)].collect().toMap
    val naive = level.withColumn("offset",
        coalesce(sum($"v").over(
          Window.orderBy($"key").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select($"key", $"offset").as[(Long, Long)].collect().toMap
    assert(got.size == 5000 && got == naive)
  }

  test("property: exclusivePrefixSum ≡ driver-side scan on random sparse inputs") {
    import org.apache.spark.sql.expressions.Window
    val rng = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      // random sparse keys (gaps exercise empty buckets at every level),
      // random sizes around the recursion thresholds
      val nRows = 200 + rng.nextInt(1800)
      val rows = Seq.fill(nRows)((math.abs(rng.nextLong()) % 100000L, rng.nextInt(50).toLong))
        .groupBy(_._1).map { case (k, vs) => (k, vs.map(_._2).sum) }.toSeq // unique keys
      val fanout = 2 + rng.nextInt(9)
      val maxRows = 10 + rng.nextInt(40)
      val got = Sampling.exclusivePrefixSum(rows.toDF("key", "v"), fanout, maxRows)
        .as[(Long, Long)].collect().toMap
      val expected = rows.sortBy(_._1)
        .scanLeft((Long.MinValue, 0L)) { case ((_, acc), (k, v)) => (k, acc + v) }
        .drop(1)
        .map { case (k, cum) => k -> (cum - rows.find(_._1 == k).get._2) }.toMap
      assert(got == expected, s"trial $trial fanout=$fanout maxRows=$maxRows n=${rows.size}")
    }
  }

  test("packSequences with a forced-recursion bucket level equals the default plan") {
    // bucketSize 7 at sf0.001 yields ~72 buckets; maxWindowRows 10 forces the
    // bucket-prefix level itself to recurse (72 → 11 → 2) — the 100 TB path
    val recursed = Sampling.packSequences(spark, sf, budgetTokens = 512,
        bucketSize = 7, maxWindowRows = 10)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val flat = Sampling.packSequences(spark, sf, budgetTokens = 512, bucketSize = 7)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(recursed.nonEmpty && recursed == flat)
  }

  test("clusterDebiasedSample overload on precomputed clusters equals the standalone form") {
    val clusters = Dedup.nearDupClusters(spark, sf).cache()
    try {
      val composed = Sampling.clusterDebiasedSample(clusters)
        .as[(Long, Long, Long)].collect().toSet
      val standalone = Sampling.clusterDebiasedSample(spark, sf)
        .as[(Long, Long, Long)].collect().toSet
      assert(composed.nonEmpty && composed == standalone)
    } finally clusters.unpersist()
  }

  test("cluster-debiased sampling keeps every singleton and downsamples dup clusters") {
    val r = Sampling.clusterDebiasedSample(spark, sf)
      .as[(Long, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    // singletons have keep-rate 10000/10000 = certainty
    val (tot1, kept1) = r(1L)
    assert(kept1 == tot1 && tot1 > 0)
    // multi-doc clusters are strictly downsampled in aggregate
    val multi = r.filterNot(_._1 == 1L).values
    if (multi.nonEmpty) {
      val (tot, kept) = multi.reduce((a, b) => (a._1 + b._1, a._2 + b._2))
      assert(kept < tot)
    }
  }

  test("sourceCapSample keeps min(cap, group size) docs per source without shuffling the corpus") {
    val cap = 3
    val kept = Sampling.sourceCapSample(spark, sf, cap)
    val bySource = kept.groupBy($"source").count().as[(String, Long)].collect().toMap
    val totals = graft.Tables.documents(spark, sf)
      .groupBy($"source").count().as[(String, Long)].collect().toMap
    assert(bySource.keySet == totals.keySet) // no source dropped entirely
    totals.foreach { case (src, n) =>
      assert(bySource(src) == math.min(cap.toLong, n), s"source $src")
    }
    // equals the window formulation row-for-row (same md5 priority order)
    import org.apache.spark.sql.expressions.Window
    val h = Dedup.md5Hash60(concat(lit("cap:"), $"doc_id".cast("string")))
    val ref = graft.Tables.documents(spark, sf)
      .withColumn("rn", row_number().over(Window.partitionBy($"source").orderBy(h, $"doc_id")))
      .filter($"rn" <= cap).select($"doc_id").as[Long].collect().toSet
    assert(kept.select($"doc_id").as[Long].collect().toSet == ref)
    // scale shape: the only exchange feeds the tiny per-source sketch —
    // the corpus side reaches the threshold join unshuffled and unsorted
    // (executedPlan, not sparkPlan: exchanges are inserted by
    // EnsureRequirements, which hasn't run on the latter)
    val plan = kept.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"), "thresholds must broadcast")
    assert(!plan.contains("SortMergeJoin"), "corpus must not shuffle for the join")
  }

  test("mixtureSample flattens language skew: min stratum whole, dominant stratum cut") {
    val docs = graft.Tables.documents(spark, sf)
    val before = docs.groupBy($"lang").count().as[(String, Long)].collect().toMap
    val after = Sampling.mixtureSample(spark, sf)
      .groupBy($"lang").count().as[(String, Long)].collect().toMap
    val minLang = before.minBy(t => (t._2, t._1))._1
    assert(after(minLang) == before(minLang)) // √(n_min/n_min) = 1: kept whole
    val maxLang = before.maxBy(t => (t._2, t._1))._1
    assert(after(maxLang) < before(maxLang)) // dominant stratum downsampled
    // expected kept count ≈ √(n_min·n): within 25% for every stratum
    before.foreach { case (l, n) =>
      val expected = math.sqrt(before(minLang).toDouble * n)
      assert(math.abs(after(l) - expected) / expected < 0.25, s"$l kept=${after(l)} exp=$expected")
    }
    // acceptance is a pure function of doc_id: stable across partitioning
    val a = Sampling.mixtureSample(spark, sf).select($"doc_id").as[Long].collect().toSet
    val b = Sampling.mixtureSample(spark, sf).repartition(7).select($"doc_id").as[Long].collect().toSet
    assert(a == b)
    // scale shape: thresholds broadcast; corpus never shuffles
    val plan = Sampling.mixtureSample(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("lengthTailTrim keeps only docs inside per-source sampled [q10,q90], corpus unshuffled") {
    val kept = Sampling.lengthTailTrim(spark, sf)
    val total = graft.Tables.documents(spark, sf).count()
    val n = kept.count()
    assert(n > 0 && n < total, s"trim must fire: kept $n of $total")
    // every kept doc is inside its source's fences; every dropped doc outside
    val fences = kept.groupBy($"source")
      .agg(min($"n_chars").as("lo"), max($"n_chars").as("hi"))
      .as[(String, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    val dropped = graft.Tables.documents(spark, sf)
      .join(kept.select($"doc_id"), Seq("doc_id"), "left_anti")
      .select($"source", $"n_chars").as[(String, Long)].collect()
    dropped.foreach { case (src, nc) =>
      val (lo, hi) = fences(src)
      assert(nc < lo || nc > hi, s"dropped doc inside kept range: $src $nc in [$lo,$hi]")
    }
    val plan = kept.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("tokenBudget cells partition the corpus and totals reconcile exactly") {
    val cells = Sampling.tokenBudget(spark, sf)
      .as[(String, String, Long, Long, Long)].collect()
    val docs = graft.Tables.documents(spark, sf)
    assert(cells.map(_._3).sum == docs.count())
    assert(cells.map(_._5).sum ==
      docs.agg(sum($"n_chars")).as[Long].head())
    assert(cells.map(_._4).sum ==
      docs.agg(sum(size(split($"text", " ")))).as[Long].head())
    // cells agree with the split operator's own assignment
    val bySplit = Sampling.trainTestSplit(spark, sf)
      .groupBy($"source", $"split").count()
      .as[(String, String, Long)].collect().map(t => (t._1, t._2) -> t._3).toMap
    cells.foreach { case (src, sp, n, _, _) => assert(bySplit((src, sp)) == n) }
  }

  test("bpeTokenBudget: pinned merges non-overlapping, counts bracket, driver encode parity") {
    // the oracle's simultaneous-rewrite step is only equal to the kernel's
    // left-to-right pass because no pinned merge can self-overlap
    assert(TextAnalysis.PinnedBpeMerges.forall(m => m._1 != m._2))
    val cells = Sampling.bpeTokenBudget(spark, sf)
      .as[(String, String, Long, Long, Long)].collect()
    val docs = graft.Tables.documents(spark, sf)
    assert(cells.map(_._3).sum == docs.count())
    // every word is ≥1 token and ≤ its chars: ws_tokens ≤ bpe_tokens < chars
    val ws = cells.map(_._5).sum
    val bpe = cells.map(_._4).sum
    val chars = docs.agg(sum(length(regexp_replace($"text", " ", "")))).as[Long].head()
    assert(ws <= bpe && bpe < chars, s"ws=$ws bpe=$bpe chars=$chars")
    // exact parity with a driver-side greedy encode under the same table
    val rank = TextAnalysis.PinnedBpeMerges.zipWithIndex.toMap
    def encode(w: String): Int = {
      var syms = w.map(_.toString).toVector
      var done = syms.length <= 1
      while (!done) {
        val best = (0 until syms.length - 1)
          .flatMap(i => rank.get((syms(i), syms(i + 1)))).minOption
        best match {
          case None => done = true
          case Some(r) =>
            val (a, b) = TextAnalysis.PinnedBpeMerges(r)
            val next = Vector.newBuilder[String]
            var j = 0
            while (j < syms.length) {
              if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
                next += (a + b); j += 2
              } else { next += syms(j); j += 1 }
            }
            syms = next.result()
            done = syms.length <= 1
        }
      }
      syms.length
    }
    val expect = docs.select($"text").as[String].collect()
      .map(_.split(" ", -1).filter(_.nonEmpty).map(encode).sum.toLong).sum
    assert(bpe == expect)
  }

  test("writePackedShards: compact sorted shard layout, one range exchange, conservation") {
    val out = java.nio.file.Files.createTempDirectory("graft-shards").toString + "/packed"
    val written = Sampling.writePackedShards(spark, sf, out)
    // plan census on the materialized frame: exactly ONE range exchange
    // (the shard clustering) — the payload's only movement beyond the
    // doc_id attach join
    val plan = Sampling.packedShardRows(spark, sf, 512, 8, 1000, 1000000L)
      .queryExecution.executedPlan.toString
    assert("Exchange rangepartitioning".r.findAllIn(plan).length == 1, plan)
    // range clustering keeps shards contiguous: at most 2 files per shard
    // directory (boundary tasks), never one per (task × shard)
    val shardDirs = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard_id="))
    assert(shardDirs.length >= 2, s"expected several shards, got ${shardDirs.length}")
    shardDirs.foreach { d =>
      val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length <= 2, s"${d.getName}: ${files.length} files — fragmented write")
    }
    // round-trip: written rows = documents ⋈ pack assignment, exactly
    val docs = graft.Tables.documents(spark, sf)
    val expect = docs.select($"doc_id", $"source")
      .join(Sampling.packedDocAssignments(spark, sf), Seq("doc_id"))
      .withColumn("shard_id", expr("bin_id div 8"))
      .select($"doc_id", $"source", $"n_tokens", $"bin_id", $"shard_id")
      .as[(Long, String, Long, Long, Long)].collect().toSet
    val got = written
      .select($"doc_id", $"source", $"n_tokens", $"bin_id", $"shard_id".cast("long"))
      .as[(Long, String, Long, Long, Long)].collect().toSet
    assert(got == expect)
    // every shard FILE is internally sorted by (bin_id, doc_id) — what
    // sortWithinPartitions guarantees (cross-file read order is a scan
    // scheduling detail, so assert per file)
    shardDirs.foreach { d =>
      d.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
        val rows = spark.read.parquet(f.getPath)
          .select($"bin_id", $"doc_id").as[(Long, Long)].collect()
        assert(rows.sameElements(rows.sortBy(identity)), s"${f.getName} not sorted")
      }
    }
    // the one-aggregate-per-side quality gate
    val checks = graft.pipeline.Quality.packedShards(written, docs, binsPerShard = 8)
    assert(checks.forall(_.passed), checks.filterNot(_.passed).mkString(", "))
  }

  test("shardReadAudit (x71): files-in-order reconstruct the pack; bin table ≡ x37") {
    // the audit's bin table (recomputed from the materialized files)
    // equals the pack computed directly from the corpus
    val audit = Sampling.shardReadAudit(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val pack = Sampling.packSequences(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(audit == pack && audit.nonEmpty)
    // read-side order: per shard dir, parquet files SORTED BY NAME hold
    // non-overlapping ascending (bin_id, doc_id) ranges — concatenating
    // files in name order replays the pack without any sort
    val scratch = System.getProperty("java.io.tmpdir") +
      "/graft-shard-audit-" + sf.replaceAll("[^A-Za-z0-9.]", "_")
    val shardDirs = new java.io.File(scratch).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard_id=")).sortBy(_.getName)
    assert(shardDirs.nonEmpty)
    shardDirs.foreach { d =>
      val ranges = d.listFiles().filter(_.getName.endsWith(".parquet"))
        .sortBy(_.getName).map { f =>
          val rows = spark.read.parquet(f.getPath)
            .select($"bin_id", $"doc_id").as[(Long, Long)].collect()
          assert(rows.sameElements(rows.sortBy(identity)), s"${f.getName} unsorted")
          (rows.head, rows.last)
        }
      ranges.sliding(2).foreach {
        case Array((_, lastA), (firstB, _)) =>
          assert(Ordering[(Long, Long)].lt(lastA, firstB),
            s"${d.getName}: file ranges overlap — name order ≠ pack order")
        case _ => ()
      }
    }
  }

  test("shipCorpus (x69): composition ≡ intersection of the standalone stages + cap + split") {
    // independent reference: run each standalone stage's KEEP set,
    // intersect, re-apply the cap and split rules on the driver
    val k57 = Dedup.nearDedupedCorpus(spark, sf).select($"doc_id").as[Long].collect().toSet
    val k47 = Dedup.decontaminate(spark, sf).select($"doc_id").as[Long].collect().toSet
    val k64 = Dedup.substringDecontaminate(spark, sf).select($"doc_id").as[Long].collect().toSet
    val k67 = TextAnalysis.repetitionFilter(spark, sf).select($"doc_id").as[Long].collect().toSet
    val surv = k57 & k47 & k64 & k67
    val docs = graft.Tables.documents(spark, sf)
      .select($"doc_id", $"source", $"n_chars", size(split($"text", " ")).as("toks"))
      .as[(Long, String, Long, Int)].collect()
    val capped = docs.filter(d => surv(d._1))
      .groupBy(_._2).values.flatMap { ms =>
        ms.sortBy(d => (Dedup.md5Hash60Ref(s"cap:${d._1}"), d._1))
          .take(Sampling.DefaultSourceCap)
      }
    def splitOf(id: Long): String = {
      val b = Dedup.md5Hash60Ref(s"split:$id") % 100
      if (b < 80) "train" else if (b < 90) "valid" else "test"
    }
    val expect = capped.groupBy(d => (d._2, splitOf(d._1))).map { case ((src, sp), ms) =>
      (src, sp, ms.size.toLong, ms.map(_._4.toLong).sum, ms.map(_._3).sum)
    }.toSet
    val q = Sampling.shipCorpus(spark, sf)
    val got = q.as[(String, String, Long, Long, Long)].collect().toSet
    assert(got == expect && got.nonEmpty)
    // every filter must actually remove something, or the composition
    // proof is vacuous on this corpus
    val nonBench = docs.map(_._1).filter(_ >= Dedup.DecontamBenchMaxId).toSet
    Seq("x57" -> k57, "x47" -> k47, "x64" -> k64, "x67" -> k67).foreach { case (n, k) =>
      assert((nonBench -- k).nonEmpty, s"$n removed nothing at this SF")
    }
    // plan: flagged-id removal broadcasts, nothing cartesian; the corpus
    // subtrees are each instantiated a bounded number of times (CC runs
    // once via its internal checkpoint, the bloom is driver-side model
    // state — neither re-derives per stage)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert("BroadcastHashJoin.*LeftAnti".r.findFirstIn(plan).nonEmpty, plan)
  }

  test("sketch-based samplers are partition-invariant (deterministic under any parallelism)") {
    // the 100 TB determinism claim: selection is a pure function of the
    // data, so the kept set cannot depend on task layout / merge order
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select($"doc_id").as[Long].collect().toSet
    val docs = graft.Tables.documents(spark, sf)
    def shuffled(parts: Int) = {
      val dir = java.nio.file.Files.createTempDirectory(s"graft-inv$parts").toString
      docs.repartition(parts).write.mode("overwrite").parquet(s"$dir/documents.parquet")
      dir
    }
    val (d3, d17) = (shuffled(3), shuffled(17))
    assert(ids(Sampling.lengthTailTrim(spark, d3)) == ids(Sampling.lengthTailTrim(spark, d17)))
    assert(ids(Sampling.sourceCapSample(spark, d3, 5)) == ids(Sampling.sourceCapSample(spark, d17, 5)))
    val a = graft.operators.TextAnalysis.scoreDeciles(spark, d3)
      .as[(Long, String, Long, Int)].collect().toSet
    val b = graft.operators.TextAnalysis.scoreDeciles(spark, d17)
      .as[(Long, String, Long, Int)].collect().toSet
    assert(a == b)
  }

  test("lengthQuantiles picks ordered actual data values per source") {
    val q = Sampling.lengthQuantiles(spark, sf)
    val rows = q.as[(String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val docs = graft.Tables.documents(spark, sf)
      .select($"source", $"n_chars").as[(String, Long)].collect()
    val valuesBySource = docs.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val rowsBySource = docs.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    rows.foreach { case (src, n, q25, q50, q75) =>
      assert(q25 <= q50 && q50 <= q75, src)
      assert(n == rowsBySource(src), s"$src n_docs") // true per-stratum row count
      // order statistics are actual values from the stratum, not interpolations
      assert(valuesBySource(src).contains(q25) && valuesBySource(src).contains(q75)
        && valuesBySource(src).contains(q50))
    }
  }

  test("epochShuffle (x74): per-epoch permutation, shard-local positions, global hash order") {
    val n = graft.Tables.documents(spark, sf).count()
    val out = Sampling.epochShuffle(spark, sf).cache()
    try {
      // every epoch is a full permutation of the corpus
      val perEpoch = out.groupBy($"epoch").agg(
        count(lit(1)).as("n"), countDistinct($"doc_id").as("nd"))
        .as[(Long, Long, Long)].collect()
      assert(perEpoch.length == Sampling.ShuffleEpochs)
      perEpoch.foreach { case (_, rows, distinct) =>
        assert(rows == n && distinct == n)
      }
      // epochs are DIFFERENT permutations (independent salts)
      val ordered = out.orderBy($"epoch", $"shard", $"pos")
        .select($"epoch", $"doc_id").as[(Long, Long)].collect()
      val byEpoch = ordered.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
      assert(byEpoch(1L) != byEpoch(2L) && byEpoch(2L) != byEpoch(3L))
      // (shard asc, pos asc) IS ascending hash order: shard = high hash bits
      val rows = out.filter($"epoch" === 1)
        .orderBy($"shard", $"pos").select($"h").as[Long].collect()
      assert(rows.toSeq == rows.sorted.toSeq)
      // positions are dense 0..k-1 within each (epoch, shard)
      val dense = out.groupBy($"epoch", $"shard")
        .agg(min($"pos").as("lo"), max($"pos").as("hi"), count(lit(1)).as("k"))
        .as[(Long, Long, Long, Long, Long)].collect()
      dense.foreach { case (_, _, lo, hi, k) => assert(lo == 0L && hi == k - 1) }
    } finally out.unpersist()
  }

  test("curriculumSchedule (x80): full permutation in decile-major order, x56's deciles") {
    val out = Sampling.curriculumSchedule(spark, sf)
      .select($"shard", $"pos", $"doc_id", $"decile", $"h")
      .as[(Long, Long, Long, Int, Long)].collect()
    val n = graft.Tables.documents(spark, sf).count()
    assert(out.length == n && out.map(_._3).distinct.length == n) // a permutation
    // global (shard, pos) order reads deciles high -> low, hash-shuffled within
    val ordered = out.sortBy(r => (r._1, r._2))
    val deciles = ordered.map(_._4)
    assert(deciles.head == deciles.max)
    ordered.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._4 >= b._4, s"decile must not increase along the schedule: $a -> $b")
        if (a._4 == b._4 && a._1 == b._1) assert(a._5 <= b._5, "within-shard hash order")
      case _ =>
    }
    // deciles are exactly x56's assignment
    val want = graft.operators.TextAnalysis.scoreDeciles(spark, sf)
      .select($"doc_id", $"decile").as[(Long, Int)].collect().toMap
    out.foreach { case (_, _, id, d, _) => assert(d == want(id)) }
    // positions dense per shard
    out.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._2).sorted.sameElements(0L until rows.length))
    }
  }

  test("packShuffledSequences (x81): ≡ driver replay of the epoch-1 order, tokens conserved") {
    val sched = Sampling.epochShuffle(spark, sf, epochs = 1)
      .select($"doc_id", $"shard", $"pos").as[(Long, Long, Long)].collect()
    val toks = graft.Tables.documents(spark, sf)
      .select($"doc_id", size(split($"text", " ")).cast("long")).as[(Long, Long)]
      .collect().toMap
    // driver replica: replay the (shard, pos) order with a running count
    var before = 0L
    val bins = scala.collection.mutable.Map.empty[Long, (Long, Long, Long, Long)]
    sched.sortBy(r => (r._2, r._3)).foreach { case (id, shard, _) =>
      val n = toks(id)
      val bin = before / 512
      val (c, s, lo, hi) = bins.getOrElse(bin, (0L, 0L, Long.MaxValue, Long.MinValue))
      bins(bin) = (c + 1, s + n, math.min(lo, shard), math.max(hi, shard))
      before += n
    }
    val got = Sampling.packShuffledSequences(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    assert(got == bins.toMap)
    assert(got.values.map(_._2).sum == toks.values.sum) // every token packed once
  }

  test("dataCard (x83): cells reconcile with tokenBudget, samples are cell members, bounded") {
    val card = Sampling.dataCard(spark, sf)
      .as[(String, String, Long, Long, Long, Long, String)].collect()
    val budget = Sampling.tokenBudget(spark, sf)
      .select($"source", $"split", $"n_docs", $"ws_tokens")
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(card.nonEmpty && card.length == budget.size)
    val membership = graft.Tables.documents(spark, sf)
      .select($"doc_id", $"source",
        Sampling.splitLabel(Sampling.hashBucket($"doc_id", "split", 100)).as("split"))
      .as[(Long, String, String)].collect()
      .groupBy(r => (r._2, r._3)).view.mapValues(_.map(_._1).toSet).toMap
    card.foreach { case (src, split, nDocs, toks, minC, maxC, sample) =>
      assert((nDocs, toks) == budget((src, split))) // totals ≡ x61 cell-for-cell
      assert(minC <= maxC)
      val ids = sample.split(",").filter(_.nonEmpty).map(_.toLong)
      assert(ids.length == math.min(Sampling.CardSampleK.toLong, nDocs))
      assert(ids.sorted.sameElements(ids)) // value-sorted, deterministic
      ids.foreach(id => assert(membership((src, split)).contains(id)))
    }
  }

  test("lengthBatches (x84): every doc batched once, waste bounded by bucket width, full batches") {
    val docs = graft.Tables.documents(spark, sf)
      .select($"doc_id", size(split($"text", " ")).cast("long")).as[(Long, Long)].collect()
    val out = Sampling.lengthBatches(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(out.map(_._3).sum == docs.length) // every doc in exactly one batch
    out.foreach { case (bucket, _, nSeqs, minT, maxT, sumT, waste) =>
      assert(nSeqs <= Sampling.BatchSize)
      assert(minT >= bucket * Sampling.BatchBucketTokens
        && maxT < (bucket + 1) * Sampling.BatchBucketTokens) // bucket envelope holds
      assert(waste == nSeqs * maxT - sumT && waste >= 0)
      // same-bucket members differ by < bucket width -> per-seq waste < width
      assert(waste < nSeqs * Sampling.BatchBucketTokens)
    }
    // at most one partial batch per bucket (the tail)
    out.groupBy(_._1).foreach { case (_, batches) =>
      assert(batches.count(_._3 < Sampling.BatchSize) <= 1)
    }
  }

  test("upsampleMixture (x75): realized copies match the pinned weights exactly") {
    val docs = graft.Tables.documents(spark, sf)
      .select($"doc_id", $"source").as[(Long, String)].collect()
    val out = Sampling.upsampleMixture(spark, sf)
      .select($"doc_id", $"source", $"rep").as[(Long, String, Long)].collect()
    val weights = Sampling.UpsampleWeightsMicro.toMap
    val copies = out.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    docs.foreach { case (id, src) =>
      val w = weights.getOrElse(src, Sampling.UpsampleDefaultMicro)
      val got = copies.getOrElse(id, 0L)
      // every doc lands within [floor(w), floor(w)+1] copies of its weight
      assert(got == w / 1000000 || got == w / 1000000 + 1, s"doc $id ($src)")
      // rep numbers the copies 1..n with no gaps
      val reps = out.filter(_._1 == id).map(_._3).sorted
      assert(reps.sameElements(1L to got))
    }
    // the fractional coin realizes the weight in aggregate: per-source
    // totals within a loose binomial band around n * w / 1e6
    val bySource = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val outBySource = out.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    bySource.foreach { case (src, nDocs) =>
      val w = weights.getOrElse(src, Sampling.UpsampleDefaultMicro)
      val expected = nDocs * w / 1000000.0
      val got = outBySource.getOrElse(src, 0L).toDouble
      assert(math.abs(got - expected) <= math.max(3.0, nDocs * 0.5), s"$src got $got exp $expected")
    }
    // default-weight sources pass through exactly once
    val defaultSrc = docs.filterNot(d => weights.contains(d._2))
    assert(defaultSrc.nonEmpty)
    defaultSrc.foreach { case (id, _) => assert(copies(id) == 1L) }
  }

  test("qualityCapSample (x97): exact driver replica of the ranked cap; WindowGroupLimit plan") {
    val scores = TextAnalysis.qualityScorePinned(spark, sf)
      .select($"doc_id", $"score_micro").as[(Long, Long)].collect().toMap
    val srcs = graft.Tables.documents(spark, sf)
      .select($"doc_id", $"source").as[(Long, String)].collect()
    val want = srcs.groupBy(_._2).toSeq.flatMap { case (src, ds) =>
      ds.map(d => (d._1, scores(d._1)))
        .sortBy { case (id, sc) => (-sc, id) }
        .take(Sampling.QualityCapPerSource)
        .zipWithIndex
        .map { case ((id, sc), i) => (id, src, sc, i + 1L) }
    }.toSet
    val q = Sampling.qualityCapSample(spark, sf)
    val got = q.as[(Long, String, Long, Long)].collect().toSet
    assert(got == want && got.nonEmpty)
    // the cap binds on this corpus (some source exceeds the budget)
    assert(got.size < srcs.length, "fixture must drop something")
    // x73's top-k pattern: the rank window must prune map-side
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"expected WindowGroupLimit\n$plan")
  }

  test("dsirImportance (x95): exact driver replica; target-like docs outscore off-domain") {
    // driver-side replica of the hashed-bucket ratio algebra
    val docs = graft.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val bk = docs.flatMap { case (id, t) =>
      t.split(" ", -1).map(w =>
        (id, Math.floorMod(Dedup.md5Hash60Ref(s"dsir:$w"), Sampling.DsirBuckets.toLong)))
    }
    val tB = bk.filter(_._1 < Sampling.DsirTargetMaxId)
      .groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val cB = bk.filter(_._1 >= Sampling.DsirTargetMaxId)
      .groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val want = docs.filter(_._1 >= Sampling.DsirTargetMaxId).map { case (id, _) =>
      val qs = bk.filter(_._1 == id).map { case (_, b) =>
        Sampling.DsirScale * (tB.getOrElse(b, 0L) + 1) / (cB.getOrElse(b, 0L) + 1)
      }
      id -> (qs.length.toLong, qs.sum, if (qs.isEmpty) 0L else qs.sum / qs.length)
    }.toMap
    val got = Sampling.dsirImportance(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { case (id, n, pts, perTok) =>
      assert((n, pts, perTok) == want(id), s"doc $id")
    }
    // planted corpus: target speaks 'aa bb', one candidate mirrors it,
    // one is disjoint — the mirror must carry a strictly higher per-token
    // weight (the resampling key orders by domain affinity)
    val dir = java.nio.file.Files.createTempDirectory("graft-dsir").toString
    Seq((1L, "aa bb aa bb"), (2L, "aa bb aa"),
      (30L, "aa bb aa bb"), (31L, "zz yy xx ww")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val planted = Sampling.dsirImportance(spark, dir)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r._4).toMap
    assert(planted.keySet == Set(30L, 31L))
    assert(planted(30L) > planted(31L), s"target affinity must rank: $planted")
  }

  test("dsirResample (x100): exact driver replica of the weighted coin; plan is one shuffle") {
    val weights = Sampling.dsirImportance(spark, sf)
    val w = weights.as[(Long, Long, Long, Long)].collect()
    val maxImp = w.map(_._4).max
    val want = w.filter { case (id, _, _, imp) =>
      Math.floorMod(Dedup.md5Hash60Ref(s"dsirs:$id"), Sampling.HashSpace) <
        math.floor(Sampling.HashSpace.toDouble * imp / maxImp).toLong
    }.map(r => r._1 -> (r._2, r._4)).toMap
    val got = Sampling.dsirResample(weights).as[(Long, Long, Long)].collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { case (id, n, imp) => assert((n, imp) == want(id), s"doc $id") }
    // proportional acceptance: the kept set is a strict, non-trivial
    // subset and the max-weight doc is always in it (threshold = 2^60)
    assert(got.length < w.length)
    val maxDoc = w.filter(_._4 == maxImp).map(_._1).min
    assert(got.exists(_._1 == maxDoc), "max-weight doc must be kept a.s.")
    // kept docs are weight-biased: mean kept weight > mean dropped weight
    val kept = got.map(_._3)
    val dropped = w.filter(r => !want.contains(r._1)).map(_._4)
    assert(dropped.isEmpty || kept.sum.toDouble / kept.length >
      dropped.sum.toDouble / dropped.length)
    // plan: the max_imp side is a broadcast 1-row cross (x65's pattern),
    // acceptance adds NO shuffle beyond the weights aggregation itself
    val plan = Sampling.dsirResample(weights).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
  }

  test("weightedSample (x115): exact driver replica; weights bias inclusion; WindowGroupLimit plan") {
    val scores = TextAnalysis.qualityScorePinned(spark, sf)
      .select($"doc_id", $"score_micro").as[(Long, Long)].collect().toMap
    val docs = graft.Tables.documents(spark, sf)
      .select($"doc_id", $"source").as[(Long, String)].collect()
    val want = docs.map { case (id, src) =>
      val w = math.max(1L, scores(id))
      val pri = Math.floorMod(Dedup.md5Hash60Ref(s"ws:$id"), Sampling.HashSpace) / w
      (src, id, w, pri)
    }.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      rows.sortBy(r => (r._4, r._2)).take(Sampling.WeightedSampleK).zipWithIndex
        .map { case ((src, id, w, pri), i) => id -> ((src, w, pri, i + 1L)) }
    }.toMap
    val q = Sampling.weightedSample(spark, sf)
    val got = q.as[(Long, String, Long, Long, Long)].collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { case (id, src, w, pri, rank) =>
      assert((src, w, pri, rank) == want(id), s"doc $id")
    }
    // weight bias: the sampled docs' mean weight exceeds the corpus mean
    // (priority = h div w makes heavy docs win the race)
    val sampledMean = got.map(_._3).sum.toDouble / got.length
    val corpusMean = docs.map(d => math.max(1L, scores(d._1))).sum.toDouble / docs.length
    assert(sampledMean > corpusMean, s"$sampledMean vs $corpusMean")
    // the rank window must execute as a group-limit, not a full sort
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(800))
  }

  test("preferencePairs (x104): driver replay of the struct-extrema mine; windowless plan") {
    val scores = TextAnalysis.qualityScorePinned(spark, sf)
      .select($"doc_id", $"score_micro").as[(Long, Long)].collect().toMap
    val docs = graft.Tables.documents(spark, sf)
      .select($"doc_id", $"source", $"n_chars").as[(Long, String, Long)].collect()
    val want = docs
      .map { case (id, src, nc) => (src, nc / Sampling.PrefBucketChars, id, scores(id)) }
      .groupBy(t => (t._1, t._2))
      .filter(_._2.length >= 2)
      .map { case ((src, b), cell) =>
        val best = cell.maxBy(t => (t._4, t._3))
        val worst = cell.minBy(t => (t._4, t._3))
        (src, b) -> (cell.length.toLong, best._3, worst._3, best._4 - worst._4)
      }
    val q = Sampling.preferencePairs(spark, sf)
    val got = q.as[(String, Long, Long, Long, Long, Long)].collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { case (src, b, n, chosen, rejected, margin) =>
      assert((n, chosen, rejected, margin) == want((src, b)), s"cell $src/$b")
      assert(chosen != rejected && margin >= 0)
    }
    // the mine must stay a partial-agg'd groupBy: no window exec, and the
    // aggregate carries the struct extrema (argmax without rank)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("WindowExec") && !plan.contains("Window"), plan.take(800))
  }

  test("budgetApportionment (x157): Hamilton allocation matches a BigInt replay; sums exactly") {
    val perSource = graft.Tables.documents(spark, sf)
      .select($"source", $"text").as[(String, String)].collect().toSeq
      .groupBy(_._1).view
      .mapValues(_.map(d => d._2.trim.split(" +").length.toLong).sum).toMap
    val n = perSource.values.sum
    val b = Sampling.ApportionBudget
    val quotas = perSource.map { case (s, t) =>
      val qn = BigInt(t) * b
      (s, t, (qn / n).toLong, (qn % n).toLong)
    }.toSeq
    val leftover = b - quotas.map(_._3).sum
    val bonusSet = quotas.sortBy { case (s, _, _, r) => (-r, s) }
      .take(leftover.toInt).map(_._1).toSet
    val got = Sampling.budgetApportionment(spark, sf)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(got.length == perSource.size && got.nonEmpty)
    got.foreach { case (s, t, base, rem, bonus, alloc) =>
      val (_, wt, wb, wr) = quotas.find(_._1 == s).get
      assert((t, base, rem) == ((wt, wb, wr)), s"source $s")
      assert(bonus == (if (bonusSet(s)) 1L else 0L), s"source $s bonus")
      assert(alloc == base + bonus)
    }
    // the defining property: allocations sum to the budget EXACTLY
    assert(got.map(_._6).sum == b)
    assert(leftover >= 0 && leftover < perSource.size)
  }

  test("rendezvousReshard (x158): argmax assignment matches a driver replay; movement is minimal") {
    val k = Sampling.RendezvousShards
    val ids = graft.Tables.documents(spark, sf).select($"doc_id")
      .as[Long].collect().toSeq
    def arg(id: Long, nShards: Int): Long =
      (0 until nShards).map(s => (Dedup.md5Hash60Ref(s"$id#$s"), s.toLong)).max._2
    val want = ids.map(id => (arg(id, k), arg(id, k + 1)))
      .groupBy(_._1).view.mapValues { as =>
        val moved = as.count { case (o, n) => o != n }.toLong
        (as.size.toLong, moved)
      }.toMap
    val got = Sampling.rendezvousReshard(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { case (s, nd, nm, ppm) =>
      assert((nd, nm) == want(s), s"shard $s")
      assert(ppm == 1000000L * nm / nd)
    }
    // rendezvous property: every move lands ON the new shard k, and the
    // total moved mass is far below a mod-K reshard (~K/(K+1) of docs)
    val movedTotal = got.map(_._3).sum
    assert(movedTotal < ids.size / 2, s"moved $movedTotal of ${ids.size}")
    val newWins = ids.count(id => arg(id, k + 1) == k.toLong).toLong
    assert(movedTotal == newWins)
  }

  test("ringChurn (x218): successor assignment and churn match a driver ring replay") {
    val ring = Sampling.ringPositions(Sampling.RingNodes + 1, Sampling.RingVnodes)
    val mod = 1L << 60
    def assignIn(h: Long, entries: Seq[(Long, Long)]): Long =
      entries.map { case (n, p) => (((p - h) % mod + mod) % mod, n) }.min._2
    val oldRing = ring.filter(_._1 < Sampling.RingNodes)
    val docs = graft.Tables.documents(spark, sf).select($"doc_id")
      .as[Long].collect()
    val want = docs.map { id =>
      val h = Dedup.md5Hash60Ref(s"key:$id")
      (assignIn(h, oldRing), assignIn(h, ring))
    }.groupBy(_._1).view.mapValues { as =>
      (as.length.toLong, as.count(p => p._1 != p._2).toLong)
    }.toMap
    val got = Sampling.ringChurn(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { case (n, nk, nm, ppm) =>
      assert(want(n) == ((nk, nm)), s"node $n")
      assert(ppm == 1000000L * nm / nk)
    }
    // minimal disruption: overall churn stays near 1/(N+1), far from a
    // mod-N reshard's ~N/(N+1)
    val total = got.map(_._2).sum.toDouble
    val moved = got.map(_._3).sum.toDouble
    assert(moved / total < 0.3, s"churn ${moved / total}")
  }

  test("prioritySample (x237): panel matches a driver-side PPSWOR replay") {
    val k = Sampling.PrioritySampleK
    val levels = Sampling.PriorityLevels
    val docs = graft.Tables.documents(spark, sf)
      .select($"doc_id", $"source", $"n_chars").as[(Long, String, Long)].collect()
    val prio = docs.map { case (id, src, w) =>
      val h = Dedup.md5Hash60Ref(s"prio:$id") / levels
      (id, src, w, w * levels / (h + 1))
    }.sortBy(p => (-p._4, p._1))
    val tau = if (prio.length > k) prio(k)._4 else 0L
    val sampled = prio.take(k)
    val want = docs.groupBy(_._2).map { case (src, rows) =>
      val s = sampled.filter(_._2 == src)
      src -> (s.length.toLong, rows.map(_._3).sum,
        s.map(p => math.max(p._3, tau)).sum)
    }
    val got = Sampling.prioritySample(spark, sf)
      .as[(String, Long, Long, Long)].collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { case (src, n, sw, est) =>
      assert(want(src) == ((n, sw, est)), s"source $src")
    }
    // the sample filled its budget, and the HT estimate of the GRAND
    // total lands near the exact total (one draw — loose band; this
    // band is what caught an earlier fixed-point design whose floored
    // priorities degenerated the sample)
    assert(got.map(_._2).sum == k.toLong)
    val est = got.map(_._4).sum.toDouble
    val exact = got.map(_._3).sum.toDouble
    assert(est > exact * 0.5 && est < exact * 2.0,
      s"HT grand-total estimate off: $est vs $exact")
  }

  test("temperatureMixture (x242): panel matches a replay; tempering flattens") {
    def isqrt(n: Long): Long = {
      val i0 = math.sqrt(n.toDouble).floor.toLong
      val i1 = if ((i0 + 1) * (i0 + 1) <= n) i0 + 1 else i0
      if (i1 * i1 > n) i1 - 1 else i1
    }
    val counts = graft.Tables.documents(spark, sf)
      .groupBy($"source").count().as[(String, Long)].collect().toMap
    val (nTot, wTot) = (counts.values.sum, counts.values.map(isqrt).sum)
    val got = Sampling.temperatureMixture(spark, sf)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(got.length == counts.size && got.nonEmpty)
    got.foreach { case (src, n, w, raw, temp, res) =>
      assert(n == counts(src) && w == isqrt(n), s"source $src")
      assert(raw == 1000000L * n / nTot && temp == 1000000L * w / wTot, s"source $src")
      assert(res == 1000000L * temp / raw, s"source $src")
    }
    // the gate corpus's sources are UNIFORM, so tempering is a fixed
    // point there: every resample factor reads exactly 10⁶
    assert(got.forall(_._6 == 1000000L))
    // the defining flattening property, on a skewed synthetic panel:
    // spread compresses, big sources damp, small ones boost, and perfect
    // squares hit the isqrt exactly
    val skew = Sampling.temperatureMixtureOf(
        Seq(("big", 10000L), ("mid", 400L), ("small", 9L))
          .toDF("source", "n_docs"))
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(skew("big")._3 == 100L && skew("mid")._3 == 20L && skew("small")._3 == 3L)
    val raws = skew.values.map(_._4)
    val temps = skew.values.map(_._5)
    assert(raws.max - raws.min > temps.max - temps.min)
    assert(skew("big")._6 < 1000000L && skew("small")._6 > 1000000L)
  }

  test("epochSchedule (x247): caps bind on a skewed panel, surplus flows to the uncapped, hand-replay exact") {
    // cols: source, n_toks, w, share, capped, alloc, epochs_ppm
    val got = Sampling.epochScheduleOf(
        Seq(("big", 1000000L), ("mid", 10000L), ("tiny", 100L))
          .toDF("source", "n_toks"))
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // perfect squares → exact isqrt weights; every division lands exact:
    // total 1010100, budget 2020200, w_total 1110; tempered shares 18200 /
    // 182000 / 1820000; tiny and mid cap at 4 epochs (400 / 40000); the
    // 159800 surplus flows entirely to big (the only uncapped source)
    assert(got("tiny") == (("tiny", 100L, 10L, 18200L, 1L, 400L, 4000000L)))
    assert(got("mid") == (("mid", 10000L, 100L, 182000L, 1L, 40000L, 4000000L)))
    assert(got("big") == (("big", 1000000L, 1000L, 1820000L, 0L, 1979800L, 1979800L)))
    // conservation: this panel's uncapped side absorbs the whole surplus
    assert(got.values.map(_._6).sum == 2020200L)

    // corpus run: the schedule invariants hold (uniform sources → nothing
    // caps, every source trains ≈ EpochBudgetPct/100 epochs)
    val corpus = Sampling.epochSchedule(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    assert(corpus.nonEmpty)
    corpus.foreach { r =>
      assert(r._6 <= Sampling.MaxEpochs * r._2, s"${r._1} over cap")
      assert(r._7 <= Sampling.MaxEpochs * 1000000L, s"${r._1} epochs_ppm")
    }
    val budget = Sampling.EpochBudgetPct.toLong * corpus.map(_._2).sum / 100L
    assert(corpus.map(_._6).sum <= budget)
  }
}
