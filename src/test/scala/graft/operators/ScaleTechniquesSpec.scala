package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions.{count, lit, sum}

import graft.SparkSpec

/** The scale techniques the 100 TB posture relies on, proven in miniature:
  * salted skew joins (identical results), bucketed co-located joins (no
  * shuffle exchange in the plan), and SparkSessionExtensions function
  * injection. */
class ScaleTechniquesSpec extends SparkSpec {
  import spark.implicits._

  test("salted equi-join returns exactly the plain join's result") {
    val fact = (1 to 1000).map(i => (if (i % 10 == 0) 1L else i.toLong, s"row$i"))
      .toDF("k", "payload") // key 1 is hot
    val dim = Seq((1L, "hot"), (2L, "a"), (3L, "b")).toDF("k", "name")
    val plain = fact.join(dim, Seq("k"), "inner")
      .select($"k", $"payload", $"name").as[(Long, String, String)].collect().sorted.toSeq
    val salted = SkewJoin.saltedEquiJoin(fact, dim, "k", salts = 8)
      .select($"k", $"payload", $"name").as[(Long, String, String)].collect().sorted.toSeq
    assert(salted == plain)
  }

  test("AQE splits the skewed partition of a sort-merge join (the Scaladocs' skew-join note, demonstrated)") {
    // one hot key carries ~99% of the fact side; with broadcast off the
    // SMJ would stall on that one partition — AQE's skew handler must
    // split it (AQEShuffleRead ... skewed in the final plan) and the
    // result must equal the arithmetic expectation
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> conf.getOption(k)).toMap
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
    try {
      val hot = 200000L
      val fact = spark.range(hot).select(lit(1L).as("k"), $"id".as("v"))
        .unionByName(spark.range(2, 100).select($"id".as("k"), $"id".as("v")))
      val dim = spark.range(1, 100).select($"id".as("k"), ($"id" * 10).as("w"))
      val joined = fact.join(dim, Seq("k"))
        .agg(count(lit(1)).as("n"), sum($"v" + $"w").as("s"))
      val row = joined.collect().head // collect(), not head(): head's
      //  executeTake path leaves the AQE plan unfinalized for inspection
      // expected: hot key contributes hot rows of (v + 10), tail keys one each
      val expN = hot + 98L
      val expS = (0L until hot).map(_ + 10L).sum +
        (2L until 100L).map(k => k + 10L * k).sum
      assert(row.getLong(0) == expN && row.getLong(1) == expS)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("SortMergeJoin(skew=true)") &&
        finalPlan.contains("AQEShuffleRead coalesced and skewed"),
        s"AQE did not mark any skewed split:\n$finalPlan")
    } finally saved.foreach { case (k, v) =>
      v match { case Some(x) => conf.set(k, x); case None => conf.unset(k) }
    }
  }

  test("bucketed tables join without a shuffle exchange") {
    graft.pipeline.Setup.createCatalog(spark)
    val left = (1 to 1000).map(i => (i.toLong, i * 2)).toDF("k", "v")
    val right = (1 to 1000).map(i => (i.toLong, s"n$i")).toDF("k", "name")
    left.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("raw.bkt_left")
    right.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("raw.bkt_right")
    val joined = spark.table("raw.bkt_left").join(spark.table("raw.bkt_right"), Seq("k"))
    val shuffles = joined.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e
    }
    assert(shuffles.isEmpty, s"expected bucketing to eliminate shuffles, got:\n${joined.queryExecution.executedPlan}")
    assert(joined.count() == 1000)
  }

  test("year/month filters prune partitions of a partitioned table at scan") {
    graft.pipeline.Setup.createCatalog(spark)
    val df = (1 to 1000).map { i =>
      (java.sql.Date.valueOf(f"201${5 + i % 3}%d-0${1 + (i / 3) % 9}%d-15"), i)
    }.toDF("date", "v")
      .withColumn("year", org.apache.spark.sql.functions.year($"date"))
      .withColumn("month", org.apache.spark.sql.functions.month($"date"))
    df.write.mode("overwrite").partitionBy("year", "month").saveAsTable("raw.pruned_t")
    val q = spark.table("raw.pruned_t").filter($"year" === 2016 && $"month" === 3)
    def scanOf(d: org.apache.spark.sql.DataFrame) =
      d.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.head
    val all = scanOf(spark.table("raw.pruned_t")).selectedPartitions.partitionCount
    assert(all > 1, s"fixture should have many partitions, got $all")
    val scan = scanOf(q)
    assert(scan.metadata("PartitionFilters").contains("year"), scan.metadata("PartitionFilters"))
    val selected = scan.selectedPartitions.partitionCount
    assert(selected == 1, s"expected 1 pruned partition of $all, got $selected")
    assert(q.count() == df.filter($"year" === 2016 && $"month" === 3).count() && q.count() > 0)
  }

  test("kmv_sketch aggregates with a map-side partial phase (mergeable sketch, plan-proven)") {
    import graft.functions.KmvSketch.kmv_sketch
    val df = (0 until 1000).map(i => (i % 7, i.toLong)).toDF("g", "h")
      .groupBy($"g").agg(kmv_sketch($"h", 16).as("sk"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // two ObjectHashAggregate phases around the exchange = partial sketches
    // built per mapper and merged after the shuffle — the bounded-state
    // shape that makes the sketch 100 TB-safe
    assert(plan.contains("partial_kmvsketch") && plan.contains("kmvsketch"),
      s"expected partial+final sketch aggregation:\n$plan")
  }

  test("contaminationPairs broadcasts the benchmark side (corpus never shuffles on shingles)") {
    val q = Dedup.contaminationPairs(spark, "/root/testdata/sf0.001")
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"benchmark side must broadcast:\n$plan")
  }

  test("exactSubstringContamination: benchmark grams broadcast, corpus grams never shuffle") {
    val q = Dedup.exactSubstringContamination(spark, "/root/testdata/sf0.001")
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"benchmark side must broadcast:\n$plan")
    // the only row shuffles are the post-join count aggregate over the
    // surviving hits (the two-phase distinct-agg pair, both keyed by
    // doc_id) — the corpus gram stream (scan → per-row gram array →
    // explode) reaches the broadcast join without an exchange, so the
    // gram key never partitions anything
    val keys = "Exchange hashpartitioning\\((\\w+)#".r.findAllMatchIn(plan)
      .map(_.group(1)).toSeq
    assert(keys.nonEmpty && keys.forall(_ == "doc_id"),
      s"every shuffle must be the post-join doc_id agg, got $keys:\n$plan")
  }

  test("ivfTopK's KMeans fit input is pinned: fixed hash partition count + in-partition sort") {
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    import org.apache.spark.sql.functions.col
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), Similarity.asDouble(col("embedding")).as("v"))
    // sparkPlan, not executedPlan: AQE wraps the un-executed plan in an
    // AdaptiveSparkPlanExec that reports UnknownPartitioning until run
    val plan = Similarity.pinnedFitInput(emb).queryExecution.sparkPlan
    plan.outputPartitioning match {
      case h: HashPartitioning =>
        assert(h.numPartitions == 8, "fit-input partition count must be fixed, not CPU-derived")
        assert(h.expressions.map(_.sql.toLowerCase).exists(_.contains("vec_id")))
      case p => fail(s"fit input must be hash-partitioned by vec_id, got $p")
    }
    // in-partition sort by the key makes row ORDER deterministic too
    assert(plan.outputOrdering.nonEmpty &&
      plan.outputOrdering.head.child.sql.toLowerCase.contains("vec_id"))
  }

  test("GraftExtensions injects the native functions into a new session's SQL") {
    val ext = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .create() // a sibling session on the same SparkContext, own extensions
    try {
      // (do NOT close it — SparkSession.stop would stop the shared context)
      val r = ext.sql(
        """SELECT cosine_sim(array(1.0d, 2.0d), array(1.0d, 2.0d)) AS c,
          |       simhash64(array(7L, 7L, 7L)) AS s,
          |       size(minhash_sig(array(1L, 2L), 4)) AS m,
          |       size(word_shingles('a b c d e f', 5)) AS w,
          |       element_at(token_md5_hashes('hello'), 1) AS t,
          |       size(word_shingle_hashes('a b c d e f', 5, true)) AS wm,
          |       size(winnow_fp('abcdefghijklmnop', 8, 4)) AS wf
          |""".stripMargin).collect().head
      assert(math.abs(r.getDouble(0) - 1.0) < 1e-15)
      assert(r.getLong(1) == 7L)
      assert(r.getInt(2) == 4)
      assert(r.getInt(3) == 2)
      assert(r.getLong(4) == 419982666956583591L) // md5-60 cross-engine pin
      assert(r.getInt(5) == 2)
      assert(r.getInt(6) > 0)
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  test("x235: real parquet footer stats reproduce the modeled zone map exactly") {
    val sf = "/root/testdata/sf0.001"
    // the written layout buckets rows by the same deterministic rule the
    // in-plan model uses, so footer min/max/count per bucket must be equal
    import org.apache.spark.sql.functions._
    val nf = Relational.ZoneFiles
    val rows = graft.Tables.orders(spark, sf)
      .select($"o_orderkey".as("k"), $"o_custkey".as("c"))
    val bounds = rows.agg(min($"k").as("min_k"), max($"k").as("max_k"))
    val modeled = rows.crossJoin(broadcast(bounds))
      .withColumn("f", expr(s"((k - min_k) * $nf) div (max_k - min_k + 1)"))
      .groupBy($"f").agg(count(lit(1)).as("f_rows"),
        min($"c").as("f_min"), max($"c").as("f_max"))
      .as[(Long, Long, Long, Long)].collect().toSet
    val footer = FooterStats.fileStats(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(footer == modeled && footer.nonEmpty)
    // and the full audits agree end-to-end
    val a = Relational.zoneMapSkipping(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSet
    val b = Relational.zoneMapSkippingFromFooters(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("x240: compaction plan matches a driver replay and prices the real trade") {
    val sf = "/root/testdata/sf0.001"
    val k = Relational.CompactBins
    val files = FooterStats.fileStats(spark, sf)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    val total = files.map(_._2).sum
    val target = (total + k - 1) / k
    val prefixes = files.map(_._2).scanLeft(0L)(_ + _).init
    val bins = files.zip(prefixes).groupBy { case (_, pre) => pre / target }
      .map { case (b, fs) => (b, fs.map(_._1._2).sum,
        fs.map(_._1._3).min, fs.map(_._1._4).max) }
    val got = Relational.compactionPlan(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(got.length == Relational.ZonePredicates)
    got.foreach { case (_, lo, hi, fSmall, rSmall, fComp, rComp, extra) =>
      val wantSmall = files.filter(f => !(f._4 < lo || f._3 > hi))
      val wantComp = bins.filter(b => !(b._4 < lo || b._3 > hi))
      assert((fSmall, rSmall) == ((wantSmall.length.toLong, wantSmall.map(_._2).sum)))
      assert((fComp, rComp) == ((wantComp.size.toLong, wantComp.map(_._2).sum.toLong)))
      assert(extra == rComp - rSmall)
      // the trade's direction: compaction never opens more files, never
      // scans fewer rows
      assert(fComp <= fSmall && rComp >= rSmall)
    }
    // bins genuinely compact (fewer files) and the cost is visible on
    // at least one predicate of this corpus
    assert(bins.size < files.length)
    assert(got.exists(_._8 > 0L))
  }

  test("x202's probe join carries no broadcast hint on a corpus-derived side") {
    // The query side of the signature probe join is corpus × ~37 masks; a
    // forced broadcast() there is a driver OOM at 100×. The join must be a
    // plain equi-join (AnnStage's shape) — AQE may still choose to broadcast
    // at tiny runtime sizes, which is fine; the HINT is what's forbidden.
    import org.apache.spark.sql.catalyst.plans.logical.Join
    import org.apache.spark.sql.functions._
    val emb = (1 to 64).map(i => (i.toLong, Array(i.toDouble, (i % 7).toDouble)))
      .toDF("vec_id", "v")
      .withColumn("sig", graft.functions.HashSignatures.hyperplane_sig(
        $"v", Similarity.hyperplaneSigns(4)))
    val cand = Similarity.lshCurveCandidates(emb, planes = 4, maxRadius = 2)
    val probeJoins = cand.queryExecution.optimizedPlan.collect {
      case j: Join if j.condition.exists(_.references.exists(
        _.name.contains("probe_sig"))) => j
    }
    assert(probeJoins.nonEmpty, "expected the signature probe join in the plan")
    probeJoins.foreach { j =>
      assert(j.hint.leftHint.isEmpty && j.hint.rightHint.isEmpty,
        s"probe join must be unhinted, got ${j.hint}")
    }
    assert(cand.count() > 0)
  }
}
