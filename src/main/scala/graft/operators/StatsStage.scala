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

  /** Seed a stats stage from a corpus (the one-shot / day-1 path). */
  def writeStatsTables(docs: DataFrame, root: String): Unit = {
    colStatsBatch(docs).write.mode("overwrite").parquet(s"$root/col_stats")
    langCountsBatch(docs).write.mode("overwrite").parquet(s"$root/lang_counts")
  }

  /** The folded corpus-level column stats: every field merges exactly
    * (min of mins, max of maxes, sums of counts/sums). */
  def foldedColStats(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(s"$root/col_stats")
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
    spark.read.parquet(s"$root/lang_counts")
      .groupBy(col("lang")).agg(sum(col("n_docs")).as("n_docs"))
}
