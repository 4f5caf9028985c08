package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The stats-stage artifacts fed through the compaction protocol: the
  * equi-depth histogram (x246) folded from the compacted per-value
  * partials must equal a direct hand computation over the corpus, and
  * carry the equi-depth invariants. */
class StatsStageSpec extends SparkSpec {
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  test("equiDepthHistogram (x246): compacted-stage fold ≡ direct hand replay; invariants") {
    val got = StatsStage.equiDepthHistogram(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)

    // direct replay: per-value counts → exclusive cumulative rank → bucket
    val vc = graft.Tables.documents(spark, sf)
      .groupBy($"n_chars").agg(count(lit(1)).as("cnt"))
      .as[(Long, Long)].collect().sortBy(_._1)
    val n = vc.map(_._2).sum
    val b = StatsStage.HistBuckets.toLong
    var cum = 0L
    val want = vc.map { case (v, cnt) =>
      val bucket = b * cum / n
      cum += cnt
      (bucket, v, cnt)
    }.groupBy(_._1).toSeq.sortBy(_._1).map { case (bucket, vs) =>
      (bucket, vs.map(_._2).min, vs.map(_._2).max,
        vs.map(_._3).sum, vs.length.toLong)
    }
    assert(got.toSeq == want && got.nonEmpty)

    // equi-depth invariants: all rows accounted for; bucket VALUE ranges
    // disjoint and ordered; no bucket overflows its fair share by more
    // than one value's worth (the boundary value that straddles it)
    assert(got.map(_._4).sum == n)
    got.sliding(2).foreach {
      case Array(a, c) => assert(a._3 < c._2, s"overlap: $a / $c")
      case _           =>
    }
    val maxCnt = vc.map(_._2).max
    got.foreach { r =>
      assert(r._4 <= n / b + 1 + maxCnt, s"bucket ${r._1} too deep: $r")
    }
  }

  test("selectivityAudit (x251): estimate matches a hand interpolation; grid covers exactly") {
    val got = StatsStage.selectivityAudit(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.length == StatsStage.SelPredicates)

    val hist = StatsStage.equiDepthHistogram(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
    val vc = graft.Tables.documents(spark, sf)
      .groupBy($"n_chars").agg(count(lit(1)).as("cnt"))
      .as[(Long, Long)].collect()
    val (minV, maxV) = (hist.map(_._2).min, hist.map(_._3).max)
    val p = StatsStage.SelPredicates.toLong
    got.foreach { case (pid, lo, hi, est, actual, errPpm) =>
      assert(lo == minV + (pid * (maxV - minV + 1)) / p)
      assert(hi == minV + ((pid + 1) * (maxV - minV + 1)) / p - 1)
      val wantEst = hist.collect {
        case (_, blo, bhi, rows, _) if bhi >= lo && blo <= hi =>
          rows * (math.min(hi, bhi) - math.max(lo, blo) + 1) / (bhi - blo + 1)
      }.sum
      val wantActual = vc.collect { case (v, cnt) if v >= lo && v <= hi => cnt }.sum
      assert(est == wantEst, s"pred $pid estimate")
      assert(actual == wantActual, s"pred $pid actual")
      assert(errPpm == 1000000L * math.abs(est - actual) / math.max(actual, 1L))
    }
    // the equal-width grid covers the domain disjointly: actuals sum to n
    assert(got.map(_._5).sum == vc.map(_._2).sum)
  }

  test("readStageAsOf (x275): snapshots reconstruct, the live read is AS OF " +
    "latest, and the compaction horizon refuses") {
    import graft.streaming.IngestCommit
    val root = StatsStage.timeTravelRoot(spark, sf)
    val target = s"$root/lang_counts"
    val docs = graft.Tables.documents(spark, sf)
    def directAt(g: Int) = docs
      .filter(pmod($"doc_id", lit(StatsStage.TravelBatches.toLong)) <= g)
      .groupBy($"lang").agg(count(lit(1)).as("n_docs"))
      .as[(String, Long)].collect().toSet
    def asOfSet(g: Long) = IngestCommit.readStageAsOf(spark, target, g)
      .groupBy($"lang").agg(sum($"n_docs").as("n_docs"))
      .as[(String, Long)].collect().toSet
    // every recoverable generation reconstructs digit-exactly
    (StatsStage.TravelCompactAt until StatsStage.TravelBatches).foreach { g =>
      assert(asOfSet(g.toLong) == directAt(g), s"generation $g")
    }
    // AS OF latest ≡ the live compaction-aware read
    val live = IngestCommit.readStage(spark, target)
      .groupBy($"lang").agg(sum($"n_docs").as("n_docs"))
      .as[(String, Long)].collect().toSet
    assert(asOfSet(StatsStage.TravelBatches - 1L) == live)
    // AS OF a future generation is also the live table
    assert(asOfSet(1000L) == live)
    // generations behind the committed compaction are unrecoverable —
    // refuse loudly, naming the horizon
    val e = intercept[IllegalArgumentException] { asOfSet(0L) }
    assert(e.getMessage.contains("c" + StatsStage.TravelCompactAt) &&
      e.getMessage.contains("retention horizon"))
  }

  test("readStageAsOf refuses unmanaged files (no generation to classify)") {
    import graft.streaming.IngestCommit
    val tmp = java.nio.file.Files.createTempDirectory("graft-asof-unmanaged")
    val target = s"$tmp/t"
    val one = spark.range(3).toDF("v")
    IngestCommit.commitDelta(one, target, 0L)
    assert(IngestCommit.readStageAsOf(spark, target, 0L).count() == 3)
    // a stray anonymous file makes every AS OF answer unclassifiable
    one.coalesce(1).write.parquet(s"$tmp/stray")
    val fs = new org.apache.hadoop.fs.Path(target)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val part = fs.listStatus(new org.apache.hadoop.fs.Path(s"$tmp/stray"))
      .map(_.getPath).filter(_.getName.startsWith("part-")).head
    fs.rename(part, new org.apache.hadoop.fs.Path(target, "stray.parquet"))
    val e = intercept[IllegalArgumentException] {
      IngestCommit.readStageAsOf(spark, target, 0L)
    }
    assert(e.getMessage.contains("stray.parquet"))
  }
}
