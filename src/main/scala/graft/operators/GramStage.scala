package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** The word 5-gram occurrence table as a PERSISTED artifact — the
  * [[ClusterStage]]/[[TermStage]] staged-artifact contract applied to
  * the gram-level family. Three queries independently exploded the
  * corpus into word 5-grams (x194 boilerplate df, x200 Good–Turing
  * spectrum, x201 prefix-Jaccard sets); the (doc_id, source, gram,
  * cnt) aggregate is the shared upstream of all of them — computed
  * once per corpus snapshot, thousands of times smaller than the
  * exploded token stream it distills, and each consumer's remaining
  * work is a rollup of this table:
  *
  *  - x194 reads it as-is (source-scoped df + per-doc coverage);
  *  - x200 folds `sum(cnt) per gram` into the frequency spectrum;
  *  - x201 reads the rows as the DISTINCT (doc, gram) sets (cnt is
  *    carried but unused) and df = rows per gram.
  *
  * The n = 2 stage serves the BIGRAM family the same way (x49
  * familiarity, x54 domain score, x94 fluency, x103 PMI — each was
  * tokenizing the corpus twice per query; every occurrence-level fold
  * becomes a cnt-weighted sum over this table, see
  * `TextAnalysis.bigramOcc`).
  *
  * Gram length defaults to the engine-wide 5 (BoilerN = GtN = PjN);
  * documents shorter than the gram carry no rows (the shared exclusion
  * contract). Staged-or-compute memoization as in [[TermStage]];
  * staged ≡ recomputed is spec-asserted (GramStageSpec) at both gram
  * lengths.
  */
object GramStage {

  /** The engine-wide word-gram length shared by x194/x200/x201. */
  val GramN: Int = 5

  /** Compute the (doc_id, source, gram, cnt) aggregate — the unit the
    * stage persists. */
  private[graft] def computeGramOcc(spark: SparkSession, dir: String,
                                    n: Int = GramN): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= n)
      .select(col("doc_id"), col("source"),
        explode(expr(s"transform(sequence(1, size(ws) - ${n - 1}), " +
          s"i -> array_join(slice(ws, i, $n), ' '))")).as("gram"))
      .groupBy(col("doc_id"), col("source"), col("gram"))
      .agg(count(lit(1)).as("cnt"))

  private lazy val stageRoot = Files.createTempDirectory("graft_gram_stage_")

  private val staged = scala.collection.mutable.HashMap.empty[(String, Int), String]

  /** Compaction exemption (documented per the stage-maintenance
    * protocol): this root is an OVERWRITE SNAPSHOT, not an
    * append-maintained ledger — every rebuild replaces the whole
    * directory via `mode("overwrite")`, and the file count is bounded
    * by construction at ≤ `spark.sql.shuffle.partitions` (the write is
    * fed by the groupBy shuffle). `IngestCommit.compactStageRoot`
    * exists to bound roots that GROW with every micro-batch; a
    * snapshot's listing cost is already O(shuffle partitions) forever,
    * so routing it through the ledger would add commit bookkeeping
    * without removing a single list call (invariant spec-asserted in
    * StageLayoutSpec). */
  private[graft] def rootFor(spark: SparkSession, dir: String, n: Int): String =
    synchronized {
      staged.getOrElseUpdate((dir, n), {
        val root = stageRoot.resolve(
          s"grams_${StagePaths.component(dir, n)}").toString
        computeGramOcc(spark, dir, n).write.mode("overwrite").parquet(root)
        root
      })
    }

  /** Staged (doc_id, source, gram, cnt) word-gram occurrence table. */
  def gramOcc(spark: SparkSession, dir: String, n: Int = GramN): DataFrame =
    spark.read.parquet(rootFor(spark, dir, n))
      .select(col("doc_id"), col("source"), col("gram"), col("cnt"))

  /** Drop every memoized staging path (artifacts stay on disk; next
    * accessor recomputes). Tests only. */
  private[graft] def invalidate(): Unit = synchronized { staged.clear() }
}
