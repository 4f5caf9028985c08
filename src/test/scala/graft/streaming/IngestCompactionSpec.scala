package graft.streaming

import java.nio.file.Files

import org.apache.hadoop.fs.Path

import graft.SparkSpec

/** The stage-root compaction protocol ([[IngestCommit.compactStageRoot]] /
  * [[IngestCommit.readStage]]): content-preserving across
  * split → commit → compact → GC, invisible while uncommitted (in BOTH
  * readStage branches — a first compaction that crashed before its
  * marker must not double-count), loud on misuse (unmanaged files in a
  * compacted root), and GC'd exactly one generation late. */
class IngestCompactionSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_compact_spec_").toString

  private def fs(path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def names(target: String): Set[String] =
    fs(target).listStatus(new Path(target)).filter(_.isFile)
      .map(_.getPath.getName).filterNot(_.startsWith("_")).toSet

  private def rows(target: String): Set[(Long, String)] =
    IngestCommit.readStage(spark, target).as[(Long, String)].collect().toSet

  /** Commit batches 0..n-1 of (id, tag) rows and mark them applied. */
  private def seed(root: String, n: Int): Set[(Long, String)] = {
    val all = (0 until n).flatMap { b =>
      val batch = (0 until 5).map(i => (b * 10L + i, s"b$b"))
      IngestCommit.commitDelta(batch.toDF("id", "tag"), s"$root/t", b.toLong)
      IngestCommit.markApplied(spark, root, b.toLong)
      batch
    }
    all.toSet
  }

  test("compact twice preserves content exactly and GCs one generation late") {
    val root = freshRoot()
    val expect = seed(root, 3)
    assert(rows(s"$root/t") == expect)

    val cid1 = IngestCommit.compactStageRoot(spark, root, s"$root/t", nFiles = 2)
    assert(cid1 == 2L)
    // one-generation lag: covered batch files survive the commit...
    val afterFirst = names(s"$root/t")
    assert(afterFirst.exists(_.startsWith("batch0_")), s"covered deltas GC'd early: $afterFirst")
    assert(afterFirst.exists(_.startsWith("compact2_")))
    assert(rows(s"$root/t") == expect)

    // ...and the NEXT compaction removes them (no new batches → same cid)
    val cid2 = IngestCommit.compactStageRoot(spark, root, s"$root/t", nFiles = 2)
    assert(cid2 == 2L)
    val afterSecond = names(s"$root/t")
    assert(afterSecond.forall(_.startsWith("compact2_")), s"covered files not GC'd: $afterSecond")
    assert(rows(s"$root/t") == expect)

    // new deltas after a compaction stay visible and fold into the next one
    IngestCommit.commitDelta(Seq((100L, "b3")).toDF("id", "tag"), s"$root/t", 3L)
    IngestCommit.markApplied(spark, root, 3L)
    assert(rows(s"$root/t") == expect + ((100L, "b3")))
    val cid3 = IngestCommit.compactStageRoot(spark, root, s"$root/t", nFiles = 1)
    assert(cid3 == 3L)
    assert(rows(s"$root/t") == expect + ((100L, "b3")))
  }

  test("crashed FIRST compaction (files in, no marker) stays invisible to readStage") {
    val root = freshRoot()
    val expect = seed(root, 2)
    // simulate the crash window: compact files renamed in, marker never
    // created — their rows duplicate the still-present batch files
    val f = fs(root)
    Seq((0L, "b0"), (1L, "b0")).toDF("id", "tag")
      .coalesce(1).write.parquet(s"$root/orphan")
    val part = f.listStatus(new Path(s"$root/orphan"))
      .map(_.getPath).filter(_.getName.startsWith("part-")).head
    assert(f.rename(part, new Path(s"$root/t", "compact1_0.parquet")))
    assert(IngestCommit.committedCompaction(spark, s"$root/t") == -1L)
    // the never-compacted branch must exclude the orphan, not double-count
    assert(rows(s"$root/t") == expect)
    // the next compaction GCs the orphan and commits cleanly (the new
    // generation re-uses id 1 = lastApplied; content stays exact)
    assert(IngestCommit.compactStageRoot(spark, root, s"$root/t") == 1L)
    assert(IngestCommit.committedCompaction(spark, s"$root/t") == 1L)
    assert(rows(s"$root/t") == expect)
  }

  test("crashed SECOND compaction stays invisible; retry commits and GCs it") {
    val root = freshRoot()
    val expect = seed(root, 2)
    IngestCommit.compactStageRoot(spark, root, s"$root/t") // cid = 1
    // new committed batch → next compaction would be id 2
    IngestCommit.commitDelta(Seq((50L, "b2")).toDF("id", "tag"), s"$root/t", 2L)
    IngestCommit.markApplied(spark, root, 2L)
    val expect2 = expect + ((50L, "b2"))
    // crash window: the new generation's file renamed in, marker missing —
    // its rows duplicate compact1 + batch2, which both remain live
    val f = fs(root)
    Seq((0L, "b0"), (50L, "b2")).toDF("id", "tag")
      .coalesce(1).write.parquet(s"$root/orphan")
    val part = f.listStatus(new Path(s"$root/orphan"))
      .map(_.getPath).filter(_.getName.startsWith("part-")).head
    assert(f.rename(part, new Path(s"$root/t", "compact2_0.parquet")))
    assert(IngestCommit.committedCompaction(spark, s"$root/t") == 1L)
    assert(rows(s"$root/t") == expect2)
    // the retry GCs the orphan attempt, folds, and commits id 2
    assert(IngestCommit.compactStageRoot(spark, root, s"$root/t") == 2L)
    assert(rows(s"$root/t") == expect2)
  }

  test("crash during the staging write leaves readers untouched; retry cleans and commits") {
    val root = freshRoot()
    val expect = seed(root, 2)
    // crash window: the staging dir exists (partially written), nothing
    // renamed into the target yet — staging is a SIBLING dir, invisible
    // to every read of the target
    val staging = s"$root/t_c1_staging"
    Seq((777L, "junk")).toDF("id", "tag").write.parquet(staging)
    assert(rows(s"$root/t") == expect)
    // the retry deletes the stale staging dir and commits cleanly
    assert(IngestCommit.compactStageRoot(spark, root, s"$root/t") == 1L)
    assert(rows(s"$root/t") == expect)
    assert(!fs(root).exists(new Path(staging)))
  }

  test("a reader's file list taken before a compaction commit survives it") {
    val root = freshRoot()
    val expect = seed(root, 2)
    // resolve the pre-compaction file list (what a lazy frame holds)
    val preList = names(s"$root/t").map(n => s"$root/t/$n").toSeq
    IngestCommit.compactStageRoot(spark, root, s"$root/t")
    // one-generation GC lag: every pre-commit file is still readable
    assert(spark.read.parquet(preList: _*)
      .as[(Long, String)].collect().toSet == expect)
  }

  test("concurrent ingester: a half-committed batch is never folded") {
    val root = freshRoot()
    val expect = seed(root, 2) // batches 0,1 committed (lastApplied = 1)
    // ingester mid-flight: batch 2's delta file landed, marker not yet
    IngestCommit.commitDelta(Seq((200L, "b2")).toDF("id", "tag"), s"$root/t", 2L)
    assert(IngestCommit.compactStageRoot(spark, root, s"$root/t") == 1L)
    // the fold took only ids ≤ 1; batch2's file is untouched and pending
    assert(names(s"$root/t").exists(_.startsWith("batch2_")))
    // ingester finishes: batch 2 becomes visible on top of compact1
    IngestCommit.markApplied(spark, root, 2L)
    assert(rows(s"$root/t") == expect + ((200L, "b2")))
    // and the next fold absorbs it
    assert(IngestCommit.compactStageRoot(spark, root, s"$root/t") == 2L)
    assert(rows(s"$root/t") == expect + ((200L, "b2")))
  }

  test("readStage fails loudly on unmanaged files in a COMPACTED root") {
    val root = freshRoot()
    seed(root, 2)
    IngestCommit.compactStageRoot(spark, root, s"$root/t")
    // a plain append lands an anonymous part file next to the compacts
    Seq((999L, "x")).toDF("id", "tag").coalesce(1)
      .write.mode("append").parquet(s"$root/t")
    val e = intercept[IllegalArgumentException](rows(s"$root/t"))
    assert(e.getMessage.contains("outside the batch*/compact*"))
  }

  test("real consumer: compacting the ingest results root changes no answers; mixed index refused") {
    import graft.operators.Dedup
    val sf = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, sf)
    val cut = Dedup.IncrementalNewMinId
    val day2 = docs.filter($"doc_id" >= cut)
    val (day1, h1, h2) = (docs.filter($"doc_id" < cut),
      day2.filter($"doc_id" % 2 === 0), day2.filter($"doc_id" % 2 === 1))
    val root = Files.createTempDirectory("graft-compact-consumer").toString
    Dedup.writeParagraphIndex(day1, s"$root/index")
    DocumentStream.applyIngestBatch(h1, s"$root/index", s"$root/results",
      Dedup.ParagraphBoundaryMod, 0L)
    DocumentStream.applyIngestBatch(h2, s"$root/index", s"$root/results",
      Dedup.ParagraphBoundaryMod, 1L)
    def results() = IngestCommit.readStage(spark, s"$root/results")
      .as[(Long, Int, Int, Int, Int)].collect().toSet
    val before = results()
    assert(before.nonEmpty)
    // the results root is pure-protocol (batchN files only) → compactable;
    // the ledger lives in the index root (shared batch numbering)
    val ids = graft.pipeline.Maintenance.compactStageRoot(
      spark, s"$root/index", Seq(s"$root/results"), nFiles = 2)
    graft.pipeline.Maintenance.compactStageRoot(
      spark, s"$root/index", Seq(s"$root/results"), nFiles = 2) // deferred GC
    assert(ids == Seq(1L))
    assert(results() == before)
    assert(names(s"$root/results").forall(_.startsWith("compact1_")))
    // the index root mixes the plain day-1 seed with batchN deltas — the
    // protocol REFUSES to compact it (folding would make readStage drop
    // the anonymous seed files)
    val e = intercept[IllegalArgumentException](
      IngestCommit.compactStageRoot(spark, s"$root/index", s"$root/index"))
    assert(e.getMessage.contains("outside the batch*/compact*"))
    // and the consumer read path on the mixed root is unaffected
    assert(IngestCommit.readStage(spark, s"$root/index").count() > 0)
  }

  test("compactStageRoot refuses a plain (non-protocol) parquet dir") {
    val root = freshRoot()
    Seq((1L, "a"), (2L, "b")).toDF("id", "tag").write.parquet(s"$root/plain")
    IngestCommit.markApplied(spark, root, 0L)
    val e = intercept[IllegalArgumentException](
      IngestCommit.compactStageRoot(spark, root, s"$root/plain"))
    assert(e.getMessage.contains("outside the batch*/compact*"))
  }
}
