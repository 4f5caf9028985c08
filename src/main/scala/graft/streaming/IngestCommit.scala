package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession

/** Exactly-once-effective commit protocol for the foreachBatch
  * ingesters — ONE protocol object with two commit styles sharing the
  * `_applied/b<id>` marker ledger: the DELTA-FILE variant
  * ([[commitDelta]] — deterministically-named per-batch files appended
  * into a flat parquet dir, [[DocumentStream]]'s index/results style)
  * and the VERSIONED-ARTIFACT variant ([[lastApplied]] +
  * [[markApplied]] + [[gcVersions]] — each batch publishes a whole new
  * `<prefix><id>` snapshot dir and the marker names the live one,
  * [[VectorStream]]'s ranked-table style). foreachBatch
  * delivers at-least-once: a batch can re-run after a crash at ANY
  * point, so a plain `mode("append")` double-appends its rows (the
  * round-10 advisory's failure mode on the kNN ingester, shared by
  * every append-based ingester). The protocol here keeps the existing
  * flat-directory table layouts (batch operators and streaming
  * consumers read the same plain parquet dirs) and makes the batch
  * idempotent as a whole:
  *
  *  - every delta lands as files named `batch<id>_<i>.parquet` inside
  *    the target dir — DETERMINISTIC names, written via a staging dir
  *    and per-file rename (never a live append of anonymous parts);
  *  - a replayed batch first deletes its own `batch<id>_*` leftovers
  *    from every target ([[cleanAttempt]]), so classification re-reads
  *    the true PRE-batch state and the re-commit lands clean;
  *  - the `_applied/b<id>` marker (hidden from parquet reads by the
  *    underscore convention) is created LAST — its presence means the
  *    batch fully applied and a re-delivery is a no-op.
  */
private[graft] object IngestCommit {

  private def fsOf(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  // ── Stage-root compaction ────────────────────────────────────────────
  //
  // commitDelta accumulates one (or more) `batch<id>_*.parquet` file per
  // batch per target FOREVER — after 10k micro-batches every consumer
  // read pays a 10k-file listing + footer-open cost (the x240 planner
  // prices exactly this trade). Compaction folds the committed delta
  // files into `compact<upTo>_<i>.parquet` files under a marker protocol
  // that keeps every crash window and one concurrent ingester safe:
  //
  //  - the COMMIT POINT is the `_compacted/c<upTo>` marker (created
  //    LAST, after every compact file is renamed in). [[readStage]]
  //    reads compact files only for the highest COMMITTED cid, plus
  //    batch files with id > cid — so uncommitted compact files (a
  //    crashed attempt) are invisible, and until the marker lands every
  //    reader still sees the uncompacted file set, unchanged.
  //  - covered files (batch id ≤ cid, older compact generations) are
  //    GC'd with a ONE-GENERATION LAG: the NEXT compaction deletes them.
  //    A lazy DataFrame listed before a compaction commit therefore
  //    stays readable across that commit; only a handle held across TWO
  //    compactions can lose files (the `ranked()` 2-version caveat,
  //    same contract).
  //  - only batches recorded in the ledger (id ≤ lastApplied) are
  //    folded: a half-committed batch's files are never touched, and a
  //    replay's `cleanAttempt` only ever deletes files of UNcommitted
  //    ids — disjoint from every compaction input by construction.
  //  - single compactor assumed (a maintenance job, like OPTIMIZE); the
  //    ingester may run concurrently.

  private val BatchFileRe = "^batch(\\d+)_.*\\.parquet$".r
  private val CompactFileRe = "^compact(\\d+)_.*\\.parquet$".r

  private def batchIdOf(name: String): Option[Long] = name match {
    case BatchFileRe(id) => Some(id.toLong)
    case _               => None
  }
  private def compactIdOf(name: String): Option[Long] = name match {
    case CompactFileRe(id) => Some(id.toLong)
    case _                 => None
  }

  /** Highest committed compaction id for `target` (-1 when never
    * compacted): the max `c<id>` marker under `<target>/_compacted`. */
  def committedCompaction(spark: SparkSession, target: String): Long = {
    val fs = fsOf(spark, target)
    val dir = new Path(s"${target.stripSuffix("/")}/_compacted")
    if (!fs.exists(dir)) -1L
    else fs.listStatus(dir).map(_.getPath.getName)
      .collect { case n if n.startsWith("c") => n.drop(1).toLong }
      .foldLeft(-1L)(math.max)
  }

  /** Visible (non-hidden, file) entries of a stage target dir. */
  private def visibleFiles(fs: FileSystem, target: String) =
    fs.listStatus(new Path(target)).filter(_.isFile).map(_.getPath)
      .filter { p =>
        val n = p.getName
        !n.startsWith("_") && !n.startsWith(".")
      }

  /** ONE definition of the unmanaged-file refusal shared by
    * [[readStage]], [[readStageAsOf]] and [[compactStageRoot]] (r15
    * advisory: the three verbatim copies could drift if the
    * `batchN`/`compactN` naming ever changes). `why` is the call-site
    * tail explaining what would go wrong there. */
  private def requireManaged(target: String, visible: Array[Path],
                             why: String): Unit = {
    val unmanaged = visible.map(_.getName)
      .filter(n => batchIdOf(n).isEmpty && compactIdOf(n).isEmpty)
    require(unmanaged.isEmpty,
      s"stage target $target holds files outside the batch*/compact* " +
        s"naming (${unmanaged.take(3).mkString(", ")}…)$why")
  }

  /** Compaction-aware read of a delta-file stage target: on a
    * never-compacted dir it reads every visible file EXCEPT
    * uncommitted-compaction leftovers (a first compaction that crashed
    * after renaming files in but before writing its `_compacted/c<id>`
    * marker must stay invisible — its rows duplicate the still-present
    * batch files); once a compaction has committed, it reads the live
    * compact files plus the batch deltas newer than the compaction —
    * never a covered or uncommitted-attempt file. In that compacted
    * state the dir is unambiguously protocol-managed, so a visible file
    * OUTSIDE the `batchN`/`compactN` naming fails loudly (the same
    * guard [[compactStageRoot]] applies): silently excluding it would
    * lose appended rows without any error. Every consumer of an
    * ingester-managed root reads through here. */
  /** [[readStage]] with a first-batch fallback: a stage target that does
    * not exist yet (no dir, or no visible data files) reads as an EMPTY
    * frame with `like`'s schema — so a self-starting ingester whose
    * apply step READS its own stage (the duel ingester's staged sides)
    * needs no seeding writer before the first micro-batch. */
  def readStageOr(spark: SparkSession, target: String,
                  like: DataFrame): DataFrame = {
    val fs = fsOf(spark, target)
    val p = new Path(target)
    if (!fs.exists(p) || visibleFiles(fs, target).isEmpty) like.limit(0)
    else readStage(spark, target)
  }

  def readStage(spark: SparkSession, target: String): DataFrame = {
    val cid = committedCompaction(spark, target)
    val fs = fsOf(spark, target)
    if (cid < 0) {
      val visible = visibleFiles(fs, target)
      val live = visible.filter(p => compactIdOf(p.getName).isEmpty)
      if (live.length == visible.length) spark.read.parquet(target)
      else spark.read.parquet(live.map(_.toString).toIndexedSeq: _*)
    } else {
      val visible = visibleFiles(fs, target)
      requireManaged(target, visible, " after a committed " +
        "compaction: reading through the compaction protocol would " +
        "silently drop those rows — append through commitDelta instead")
      val files = visible.filter { p =>
        val n = p.getName
        compactIdOf(n).contains(cid) || batchIdOf(n).exists(_ > cid)
      }
      spark.read.parquet(files.map(_.toString).toIndexedSeq: _*)
    }
  }

  /** Time-travel read: the stage target AS OF batch generation `asOf` —
    * the delta-file ledger already IS a version chain (each
    * `batch<id>_*` file is one committed generation's delta), so a
    * snapshot read is just the id-bounded subset of [[readStage]]'s
    * file set. Compaction is the RETENTION HORIZON: a committed
    * compaction folds every batch ≤ cid into undifferentiated compact
    * files, so generations below cid are unrecoverable and the read
    * REFUSES them loudly (the same contract as VACUUM bounding Delta
    * time travel — the one-generation GC lag sometimes leaves covered
    * batch files on disk, but that is an implementation accident, not a
    * promise, so the refusal keys on cid deterministically). An `asOf`
    * beyond the newest committed batch reads everything — AS OF a
    * future generation is the live table. Unlike [[readStage]] on a
    * never-compacted dir, files outside the managed naming always fail
    * loudly here: an anonymous file carries no generation, so any
    * answer that included (or silently dropped) it would be wrong. */
  def readStageAsOf(spark: SparkSession, target: String, asOf: Long): DataFrame = {
    val cid = committedCompaction(spark, target)
    require(asOf >= cid,
      s"generation $asOf of stage target $target predates the committed " +
        s"compaction c$cid: its deltas were folded (and are GC'd one " +
        "generation later) — compaction is the time-travel retention horizon")
    val fs = fsOf(spark, target)
    val visible = visibleFiles(fs, target)
    requireManaged(target, visible, ": they carry no " +
      "generation, so an AS OF read cannot classify them")
    val files = visible.filter { p =>
      val n = p.getName
      compactIdOf(n).contains(cid) || batchIdOf(n).exists(id => id > cid && id <= asOf)
    }
    require(files.nonEmpty,
      s"no committed files at or before generation $asOf under $target")
    spark.read.parquet(files.map(_.toString).toIndexedSeq: _*)
  }

  /** Compact one stage target's committed delta files into `nFiles`
    * `compact<upTo>_<i>.parquet` files, where `upTo` is the ledger's
    * `lastApplied`. Also GCs the PREVIOUS compaction's covered files
    * (the one-generation lag above) and any uncommitted compact
    * attempt's leftovers. Returns the live compaction id after the
    * call (-1 when the target has never had a committed batch).
    * `ledgerRoot` is the root whose `_applied/` markers govern this
    * target's batch ids (the index root for its own subdirs AND for the
    * sibling results table — they share one ledger). Refuses loudly on
    * a dir holding files outside the managed `batchN`/`compactN` naming:
    * compacting a plain batch-appended table through this protocol
    * would make [[readStage]] silently drop its anonymous part files.
    */
  def compactStageRoot(spark: SparkSession, ledgerRoot: String,
                       target: String, nFiles: Int = 1): Long = {
    val fs = fsOf(spark, target)
    val tp = new Path(target)
    if (!fs.exists(tp)) return -1L
    requireManaged(target, visibleFiles(fs, target), ": not an " +
      "IngestCommit-managed root — compacting it would drop those files " +
      "from readStage. Use Maintenance.compacted for plain tables.")
    val cur = committedCompaction(spark, target)
    // GC, one generation late: files superseded by the CURRENT committed
    // compaction (covered batches, older compact generations) and any
    // compact files newer than it (a crashed uncommitted attempt)
    visibleFiles(fs, target).filter { p =>
      val n = p.getName
      batchIdOf(n).exists(_ <= cur) || compactIdOf(n).exists(_ != cur)
    }.foreach(p => fs.delete(p, false))
    val upTo = lastApplied(spark, ledgerRoot)
    if (upTo <= cur) return cur // nothing committed since the last fold
    val inputs = visibleFiles(fs, target).filter { p =>
      val n = p.getName
      compactIdOf(n).contains(cur) || batchIdOf(n).exists(id => id > cur && id <= upTo)
    }
    if (inputs.isEmpty) return cur // ledger ahead of this target (no deltas)
    val staging = s"${target.stripSuffix("/")}_c${upTo}_staging"
    fs.delete(new Path(staging), true)
    val df = spark.read.parquet(inputs.map(_.toString).toIndexedSeq: _*)
      .coalesce(math.max(1, nFiles))
    df.write.mode("overwrite").parquet(staging)
    def parts() = fs.listStatus(new Path(staging)).map(_.getPath)
      .filter(_.getName.startsWith("part-"))
    if (parts().isEmpty) // all-empty deltas: force one schema-bearing footer
      df.limit(0).repartition(1).write.mode("overwrite").parquet(staging)
    parts().zipWithIndex.foreach { case (p, i) =>
      val dest = new Path(target, s"compact${upTo}_$i.parquet")
      require(fs.rename(p, dest), s"rename $p -> $dest failed; aborting " +
        "uncommitted (readers still see the uncompacted set)")
    }
    fs.delete(new Path(staging), true)
    // commit point: the marker makes the new generation live
    fs.mkdirs(new Path(s"${target.stripSuffix("/")}/_compacted"))
    fs.create(new Path(s"${target.stripSuffix("/")}/_compacted/c$upTo"), true).close()
    upTo
  }

  /** True when `batchId`'s marker exists under `$ledgerRoot/_applied`. */
  def alreadyApplied(spark: SparkSession, ledgerRoot: String, batchId: Long): Boolean =
    fsOf(spark, ledgerRoot)
      .exists(new Path(s"$ledgerRoot/_applied/b$batchId"))

  /** Highest fully-applied (published) batch id under
    * `$ledgerRoot/_applied`, -1 when none — the versioned-artifact
    * variant's read point: consumers open `<prefix><lastApplied>`.
    * Empty batches never publish (they change no state), so their ids
    * may be absent from an otherwise contiguous ledger. */
  def lastApplied(spark: SparkSession, ledgerRoot: String): Long = {
    val fs = fsOf(spark, ledgerRoot)
    val dir = new Path(s"$ledgerRoot/_applied")
    if (!fs.exists(dir)) -1L
    else fs.listStatus(dir).map(_.getPath.getName)
      .collect { case n if n.startsWith("b") => n.drop(1).toLong }
      .foldLeft(-1L)(math.max)
  }

  /** Drop versioned snapshot dirs `<prefix><id>` under `dir` with
    * id < `keepFrom` — the versioned-artifact variant's post-publish
    * GC. Keeping the previous version alongside the live one is what
    * lets a replayed batch recompute from its unchanged pre-state. */
  def gcVersions(spark: SparkSession, dir: String, prefix: String,
                 keepFrom: Long): Unit = {
    val fs = fsOf(spark, dir)
    val p = new Path(dir)
    if (fs.exists(p))
      fs.listStatus(p).map(_.getPath)
        .filter { q =>
          val n = q.getName
          n.startsWith(prefix) &&
            n.drop(prefix.length).forall(_.isDigit) &&
            n.drop(prefix.length).nonEmpty &&
            n.drop(prefix.length).toLong < keepFrom
        }
        .foreach(q => fs.delete(q, true))
  }

  /** Create `batchId`'s marker — the commit point, call LAST. */
  def markApplied(spark: SparkSession, ledgerRoot: String, batchId: Long): Unit = {
    val fs = fsOf(spark, ledgerRoot)
    fs.mkdirs(new Path(s"$ledgerRoot/_applied"))
    fs.create(new Path(s"$ledgerRoot/_applied/b$batchId"), true).close()
  }

  /** Remove a crashed attempt's `batch<id>_*` files from every target
    * dir — AND its sibling `<target>_b<id>_staging` dir (a terminally
    * crashed attempt would otherwise leak one next to the live table) —
    * so the pre-batch state is restored before re-classification and
    * re-commit. */
  def cleanAttempt(spark: SparkSession, targets: Seq[String], batchId: Long): Unit =
    targets.foreach { t =>
      val fs = fsOf(spark, t)
      val dir = new Path(t)
      if (fs.exists(dir))
        fs.listStatus(dir).map(_.getPath)
          .filter(_.getName.startsWith(s"batch${batchId}_"))
          .foreach(p => fs.delete(p, true))
      fs.delete(new Path(s"${t.stripSuffix("/")}_b${batchId}_staging"), true)
    }

  /** Bind a stage root to ONE streaming lineage: the ledger keys on
    * foreachBatch's batchId, which restarts from 0 under a fresh/cleared
    * checkpoint — against an already-ingested stage root the stale
    * markers would then silently swallow every new batch (worse than the
    * duplicate-append bug this protocol replaced). The first batch
    * writes the campaign id (derived from the checkpoint location);
    * any later mismatch fails LOUDLY instead of dropping data. */
  def ensureCampaign(spark: SparkSession, ledgerRoot: String, campaign: String): Unit = {
    val fs = fsOf(spark, ledgerRoot)
    val p = new Path(s"$ledgerRoot/_campaign")
    def readExisting(): String = {
      val in = fs.open(p)
      try new String(in.readAllBytes(), "UTF-8") finally in.close()
    }
    def check(existing: String): Unit =
      require(existing == campaign,
        s"stage root $ledgerRoot was ingested under a different streaming " +
          s"checkpoint (campaign '$existing' vs '$campaign'): its batch-id " +
          "ledger cannot disambiguate a restarted batch numbering. Resume " +
          "with the original checkpoint, or use a fresh stage root.")
    if (fs.exists(p)) check(readExisting())
    else {
      fs.mkdirs(new Path(ledgerRoot))
      // create-if-absent (overwrite = false): two streams racing onto one
      // empty stage root resolve to a single winner — the loser lands in
      // the catch, re-reads, and fails the campaign check before
      // committing anything
      try {
        val out = fs.create(p, false)
        try out.write(campaign.getBytes("UTF-8")) finally out.close()
      } catch { case _: java.io.IOException => check(readExisting()) }
    }
  }

  /** The campaign id for a checkpoint location: the checkpoint's own
    * LINEAGE id (the query id Structured Streaming persists in
    * `<checkpoint>/metadata`, regenerated whenever the checkpoint is
    * cleared) — so "delete the checkpoint and reprocess" gets a FRESH
    * campaign and fails the guard instead of silently matching the old
    * one the way a path-derived id would. Falls back to the path hash
    * ONLY when no metadata exists (direct applier calls in specs, or a
    * race with checkpoint creation) — a transient IO failure reading
    * existing metadata PROPAGATES, so the batch retries rather than
    * tripping the campaign guard on a healthy resume. */
  def campaignOf(spark: SparkSession, checkpointDir: String): String = {
    val key = try {
      val fs = fsOf(spark, checkpointDir)
      val p = new Path(s"$checkpointDir/metadata")
      if (fs.exists(p)) {
        val in = fs.open(p)
        try checkpointDir + "\n" + new String(in.readAllBytes(), "UTF-8")
        finally in.close()
      } else checkpointDir
    } catch { case _: java.io.FileNotFoundException => checkpointDir }
    java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** Commit one delta frame into `target` as deterministically-named
    * files: write to a sibling staging dir (the existing
    * readers-never-see-a-half-written-append discipline), rename each
    * part file to `batch<id>_<i>.parquet`, drop the staging dir. A
    * failed rename raises (a silent false return would lose the delta
    * while the marker records the batch as applied), and an empty delta
    * still commits one schema-bearing footer file so a later
    * `spark.read.parquet(target)` never faces a file-less directory. */
  def commitDelta(df: DataFrame, target: String, batchId: Long): Unit = {
    val spark = df.sparkSession
    val fs = fsOf(spark, target)
    val staging = s"${target.stripSuffix("/")}_b${batchId}_staging"
    df.write.mode("overwrite").parquet(staging)
    def parts() = fs.listStatus(new Path(staging)).map(_.getPath)
      .filter(_.getName.startsWith("part-"))
    if (parts().isEmpty) // 0-row delta coalesced to no files: force one footer
      df.limit(0).repartition(1).write.mode("overwrite").parquet(staging)
    fs.mkdirs(new Path(target))
    parts().zipWithIndex.foreach { case (p, i) =>
      val dest = new Path(target, s"batch${batchId}_$i.parquet")
      require(fs.rename(p, dest), s"rename $p -> $dest failed; " +
        "aborting the batch so the replay redoes it (nothing published)")
    }
    fs.delete(new Path(staging), true)
  }
}
