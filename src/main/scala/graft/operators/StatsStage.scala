package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained TABLE STATISTICS for the documents corpus —
  * the catalog artifact every planner decision in the x222/x223 family
  * reads (row counts, min/max zone bounds, per-category cardinalities),
  * maintained the way a warehouse actually maintains it: each ingest
  * batch appends MERGEABLE partials and nobody ever rescans the corpus.
  * [[TermStage]]'s design applied to statistics instead of terms:
  *
  *  - `col_stats`: one row per batch — row count, doc_id min/max,
  *    n_chars non-null count / min / max / sum. Every field merges by
  *    min/max/sum, so the fold is exact (not estimated).
  *  - `lang_counts`: (lang, n_docs) partials per batch — the
  *    low-cardinality column's exact histogram, merged by sum.
  *
  * The reader folds ([[foldedColStats]] / [[foldedLangCounts]]) are
  * spec-proven equal to a one-shot computation over the full corpus,
  * including across micro-batch boundaries driven by the streaming twin
  * (`DocumentStream.startStatsIngest`, which commits each batch through
  * the exactly-once [[graft.streaming.IngestCommit]] protocol). */
object StatsStage {

  /** One batch's mergeable column-stats partial (single row). */
  def colStatsBatch(docs: DataFrame): DataFrame =
    docs.agg(
      count(lit(1)).as("n_rows"),
      min(col("doc_id")).as("min_doc_id"),
      max(col("doc_id")).as("max_doc_id"),
      count(col("n_chars")).as("nn_chars"),
      min(col("n_chars")).as("min_chars"),
      max(col("n_chars")).as("max_chars"),
      sum(col("n_chars")).as("sum_chars"))

  /** One batch's (lang, n_docs) counts. */
  def langCountsBatch(docs: DataFrame): DataFrame =
    docs.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))

  /** One batch's (n_chars value, row count) partials — the mergeable
    * input of the equi-depth histogram ([[equiDepthHistogram]]): exact
    * per-value counts merge by sum, so the folded histogram equals a
    * one-shot computation no matter how ingestion batched the rows. */
  def valueCountsBatch(docs: DataFrame): DataFrame =
    docs.groupBy(col("n_chars").as("v")).agg(count(lit(1)).as("cnt"))

  /** Seed a stats stage from a corpus (the one-shot / day-1 path). */
  def writeStatsTables(docs: DataFrame, root: String): Unit = {
    colStatsBatch(docs).write.mode("overwrite").parquet(s"$root/col_stats")
    langCountsBatch(docs).write.mode("overwrite").parquet(s"$root/lang_counts")
    valueCountsBatch(docs).write.mode("overwrite").parquet(s"$root/value_counts")
  }

  /** The folded corpus-level column stats: every field merges exactly
    * (min of mins, max of maxes, sums of counts/sums). */
  def foldedColStats(spark: SparkSession, root: String): DataFrame =
    graft.streaming.IngestCommit.readStage(spark, s"$root/col_stats")
      .agg(
        sum(col("n_rows")).as("n_rows"),
        min(col("min_doc_id")).as("min_doc_id"),
        max(col("max_doc_id")).as("max_doc_id"),
        sum(col("nn_chars")).as("nn_chars"),
        min(col("min_chars")).as("min_chars"),
        max(col("max_chars")).as("max_chars"),
        sum(col("sum_chars")).as("sum_chars"))

  /** The folded exact language histogram. */
  def foldedLangCounts(spark: SparkSession, root: String): DataFrame =
    graft.streaming.IngestCommit.readStage(spark, s"$root/lang_counts")
      .groupBy(col("lang")).agg(sum(col("n_docs")).as("n_docs"))

  /** The folded exact per-value counts of `n_chars`. */
  def foldedValueCounts(spark: SparkSession, root: String): DataFrame =
    graft.streaming.IngestCommit.readStage(spark, s"$root/value_counts")
      .groupBy(col("v")).agg(sum(col("cnt")).as("cnt"))

  // ── Compacted-stage gate (x243) ──────────────────────────────────────

  /** Batch count and per-target compact file count for the x243 gate
    * stage — shared with its spec. */
  val CompactBatches: Int = 3
  val CompactTargetFiles: Int = 2

  private lazy val compactStageTmp =
    java.nio.file.Files.createTempDirectory("graft_compacted_stats_")

  private val compactedRoots =
    scala.collection.mutable.HashMap.empty[String, String]

  /** Build (once per JVM per snapshot) a stats stage root the way the
    * streaming ingester builds one — [[CompactBatches]] deterministic
    * micro-batches (`doc_id mod` split) committed through the
    * [[graft.streaming.IngestCommit]] delta protocol — then COMPACT both
    * targets with `Maintenance.compactStageRoot`'s machinery (twice: the
    * second call performs the deferred one-generation GC, so the root
    * ends holding ONLY the live compact files). What the x243 oracle
    * then proves: the compacted root's folded content is digit-identical
    * to a direct computation over the corpus — nothing lost, duplicated,
    * or re-ordered by split → commit → compact → GC → fold. */
  private[graft] def compactedStatsRoot(spark: SparkSession, dir: String): String =
    synchronized {
      compactedRoots.getOrElseUpdate(dir, {
        import graft.streaming.IngestCommit
        val root = compactStageTmp.resolve(
          s"stats_${StagePaths.component(dir)}").toString
        val docs = graft.Tables.documents(spark, dir).localCheckpoint()
        (0 until CompactBatches).foreach { i =>
          val b = docs.filter(pmod(col("doc_id"), lit(CompactBatches.toLong)) === i)
          IngestCommit.commitDelta(colStatsBatch(b), s"$root/col_stats", i.toLong)
          IngestCommit.commitDelta(langCountsBatch(b), s"$root/lang_counts", i.toLong)
          IngestCommit.commitDelta(valueCountsBatch(b), s"$root/value_counts", i.toLong)
          IngestCommit.markApplied(spark, root, i.toLong)
        }
        Seq("col_stats", "lang_counts", "value_counts").foreach { t =>
          IngestCommit.compactStageRoot(spark, root, s"$root/$t", CompactTargetFiles)
          IngestCommit.compactStageRoot(spark, root, s"$root/$t", CompactTargetFiles)
        }
        root
      })
    }

  /** Compacted-stage equivalence panel (x243): the language histogram ×
    * corpus column stats, folded FROM THE COMPACTED STAGE ROOT — the
    * oracle recomputes both straight from the documents table, so a
    * hash match proves compacted ≡ direct content (the "OPTIMIZE
    * changed no answers" gate, as an oracle-checked query rather than
    * an assertion).
    *
    * 100 TB shape: the stage fold reads O(compact files) partials, never
    * the corpus; compaction itself is one read of O(batches) delta files
    * per target. */
  def compactedStatsPanel(spark: SparkSession, dir: String): DataFrame = {
    val root = compactedStatsRoot(spark, dir)
    foldedLangCounts(spark, root)
      .crossJoin(broadcast(foldedColStats(spark, root)
        .select(col("n_rows"), col("min_chars"), col("max_chars"),
          col("sum_chars"))))
  }

  // ── Time-travel gate (x275) ──────────────────────────────────────────

  /** Batch count and mid-stream compaction point for the x275 stage —
    * shared with its spec and the oracle. The root is deliberately left
    * PARTIALLY compacted (fold after batch [[TravelCompactAt]], deltas
    * 2..3 still loose) so AS OF reads exercise the mixed
    * compact-plus-delta path, and so the retention-horizon refusal
    * (AS OF 0 < c1) is real, not hypothetical. */
  val TravelBatches: Int = 4
  val TravelCompactAt: Int = 1

  private val travelRoots =
    scala.collection.mutable.HashMap.empty[String, String]

  /** Build (once per JVM per snapshot) a lang-counts stage with
    * [[TravelBatches]] committed generations and one mid-stream
    * compaction — the x275 harness. */
  private[graft] def timeTravelRoot(spark: SparkSession, dir: String): String =
    synchronized {
      travelRoots.getOrElseUpdate(dir, {
        import graft.streaming.IngestCommit
        val root = compactStageTmp.resolve(
          s"travel_${StagePaths.component(dir)}").toString
        val docs = graft.Tables.documents(spark, dir).localCheckpoint()
        (0 until TravelBatches).foreach { i =>
          val b = docs.filter(pmod(col("doc_id"), lit(TravelBatches.toLong)) === i)
          IngestCommit.commitDelta(langCountsBatch(b), s"$root/lang_counts", i.toLong)
          IngestCommit.markApplied(spark, root, i.toLong)
          if (i == TravelCompactAt)
            IngestCommit.compactStageRoot(spark, root, s"$root/lang_counts", 1)
        }
        root
      })
    }

  /** Time-travel panel (x275): the language histogram AS OF every
    * recoverable generation (the compaction point onward). Generation g
    * contains exactly the docs with `doc_id mod TravelBatches ≤ g`, so
    * the oracle recomputes each snapshot straight from the documents
    * table — a hash match proves the AS OF file-set arithmetic (compact
    * files for the horizon + id-bounded deltas above it) reconstructs
    * every historical snapshot digit-exactly. 100 TB shape: an AS OF
    * read lists one directory and opens O(compact files + deltas ≤ g)
    * footers — same cost as the live read; no snapshot copies exist. */
  def timeTravelPanel(spark: SparkSession, dir: String): DataFrame = {
    val root = timeTravelRoot(spark, dir)
    (TravelCompactAt until TravelBatches).map { g =>
      graft.streaming.IngestCommit
        .readStageAsOf(spark, s"$root/lang_counts", g.toLong)
        .groupBy(col("lang")).agg(sum(col("n_docs")).as("n_docs"))
        .withColumn("as_of", lit(g.toLong))
    }.reduce(_ unionByName _)
  }

  /** Equi-depth histogram bucket count (x246), shared with the oracle. */
  val HistBuckets: Int = 8

  /** Catalog-grade equi-depth histogram of `n_chars` (x246), folded FROM
    * THE COMPACTED STAGE's per-value count partials ([[valueCountsBatch]]
    * → [[foldedValueCounts]]) — the selectivity-estimation artifact a
    * planner's `estimatedRows(pred)` reads, maintained the same way the
    * x243 stats are: mergeable partials at ingest, never a corpus
    * rescan. Each distinct VALUE lands in the bucket of its exclusive
    * cumulative rank (`bucket = (B · cum_before) div n`), so buckets
    * hold ≈ n/B rows except where one heavy value overflows its bucket —
    * the standard warehouse equi-depth rule, integer-exact on both
    * engines. The oracle recomputes straight from documents, so a hash
    * match proves split → commit → compact → fold → histogram changed
    * nothing.
    *
    * 100 TB shape: the fold reads O(compact files) partials sized by the
    * VALUE DOMAIN, not the corpus; the prefix sum is the recursive
    * scale-safe one ([[Sampling.exclusivePrefixSum]] — value domains are
    * data-proportional, never a single-partition window); the bucket
    * rollup is ≤ [[HistBuckets]] rows. */
  def equiDepthHistogram(spark: SparkSession, dir: String): DataFrame = {
    val root = compactedStatsRoot(spark, dir)
    val vc = foldedValueCounts(spark, root).localCheckpoint()
    val total = vc.agg(sum(col("cnt")).as("n"))
    val offsets = Sampling.exclusivePrefixSum(vc.select(col("v"), col("cnt")))
    vc.join(offsets.select(col("key").as("v"), col("offset")), Seq("v"))
      .crossJoin(broadcast(total))
      .withColumn("bucket", expr(s"($HistBuckets * offset) div n"))
      .groupBy(col("bucket"))
      .agg(min(col("v")).as("lo_chars"), max(col("v")).as("hi_chars"),
        sum(col("cnt")).as("n_rows"), count(lit(1)).as("n_values"))
  }

  /** x251's predicate-grid size, shared with the oracle. */
  val SelPredicates: Int = 8

  /** Selectivity-estimation audit (x251) — what the x246 histogram is
    * FOR: a grid of [[SelPredicates]] equal-WIDTH range predicates over
    * the `n_chars` domain (deliberately misaligned with the equi-DEPTH
    * bucket boundaries, so boundary buckets really interpolate) is
    * priced twice — estimated rows from the histogram (full buckets
    * inside the range + uniform-within-bucket interpolation at the
    * boundaries, the standard warehouse rule, in exact floor integers)
    * and actual rows from the folded per-value counts. `err_ppm` is the
    * estimator's audited error — the number a cost-based optimizer's
    * cardinality model is graded on.
    *
    * 100 TB shape: both sides read staged artifacts sized by the value
    * DOMAIN (the [[HistBuckets]]-row histogram; the per-value counts) —
    * the corpus is never rescanned. The predicate × bucket and
    * predicate × value joins are broadcast-tiny inequality joins. */
  def selectivityAudit(spark: SparkSession, dir: String): DataFrame = {
    val p = SelPredicates
    val hist = equiDepthHistogram(spark, dir).localCheckpoint()
    val bounds = hist.agg(min(col("lo_chars")).as("min_v"),
      max(col("hi_chars")).as("max_v"))
    val preds = spark.range(p.toLong).select(col("id").as("pid"))
      .crossJoin(broadcast(bounds))
      .withColumn("lo", expr(s"min_v + (pid * (max_v - min_v + 1)) div $p"))
      .withColumn("hi", expr(s"min_v + ((pid + 1) * (max_v - min_v + 1)) div $p - 1"))
      .select(col("pid"), col("lo"), col("hi"))
      .localCheckpoint() // read by the estimate and the exact side
    val est = preds.join(hist,
        col("hi_chars") >= col("lo") && col("lo_chars") <= col("hi"))
      .withColumn("olo", greatest(col("lo"), col("lo_chars")))
      .withColumn("ohi", least(col("hi"), col("hi_chars")))
      .withColumn("part",
        expr("(n_rows * (ohi - olo + 1)) div (hi_chars - lo_chars + 1)"))
      .groupBy(col("pid"), col("lo"), col("hi"))
      .agg(sum(col("part")).as("est_rows"))
    val vc = foldedValueCounts(spark, compactedStatsRoot(spark, dir))
    val actual = preds.join(vc, col("v") >= col("lo") && col("v") <= col("hi"))
      .groupBy(col("pid").as("pid_a"))
      .agg(sum(col("cnt")).as("actual_rows"))
    est.join(actual, col("pid") === col("pid_a"), "left")
      .withColumn("actual_rows", coalesce(col("actual_rows"), lit(0L)))
      .select(col("pid"), col("lo"), col("hi"), col("est_rows"),
        col("actual_rows"),
        expr("(1000000L * abs(est_rows - actual_rows)) div " +
          "(CASE WHEN actual_rows > 0 THEN actual_rows ELSE 1 END)")
          .as("err_ppm"))
  }

  /** Drop the memoized compacted roots (tests only). */
  private[graft] def invalidateCompacted(): Unit =
    synchronized { compactedRoots.clear() }
}
