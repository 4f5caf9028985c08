package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Programmatic data-quality checks — the library surface for the
  * reference's pytest assertions (notebooks/test_data_quality.py.py), so a
  * pipeline can gate a write on the same invariants its tests assert.
  *
  * Each check compiles to ONE aggregate over the table (no per-check
  * passes): at 100 TB a quality gate that scans once is the difference
  * between "runs nightly" and "doubles the pipeline cost".
  */
object Quality {

  case class CheckResult(check: String, passed: Boolean, observed: Long)

  /** A failed quality gate — carries every failed invariant so the
    * driver's exit path (and the log line an alerting system greps)
    * names them all, not just the first. */
  case class QualityGateException(stage: String, failed: Seq[CheckResult])
    extends RuntimeException(
      s"quality gate '$stage' failed ${failed.size} invariant(s): " +
        failed.map(f => s"${f.check} (observed=${f.observed})").mkString(", "))

  /** Alert hook for the gate (the reference docx's "email alerts on
    * failure" intent, realized on the machinery that exists in every
    * environment): each failed invariant lands as ONE row in the
    * etl_errors table via [[Bronze.logError]] — the same channel the
    * ingest errors use, so an alerting system watches a single table —
    * and the gate then throws [[QualityGateException]], which makes the
    * driver exit nonzero (Databricks/Airflow/cron all alert on that).
    * Passing checks log nothing and return the results for display. */
  def gate(spark: org.apache.spark.sql.SparkSession, stage: String,
           results: Seq[CheckResult], sourceFile: String = "",
           errorTable: String = Setup.ErrorTable): Seq[CheckResult] = {
    val failed = results.filterNot(_.passed)
    if (failed.nonEmpty) {
      val e = QualityGateException(stage, failed)
      Bronze.logError(spark, e, stage = s"quality:$stage",
        sourceFile = sourceFile, errorTable = errorTable)
      throw e
    }
    results
  }

  /** Run all checks in a single aggregate job. */
  def check(df: DataFrame, requiredColumns: Seq[String] = Nil,
            notNullColumns: Seq[String] = Nil,
            nonNegativeColumns: Seq[String] = Nil): Seq[CheckResult] = {
    val missingCols = requiredColumns.filterNot(df.columns.contains)
    val structural =
      Seq(CheckResult("required_columns_present", missingCols.isEmpty, missingCols.size.toLong))
    val presentNotNull = notNullColumns.filter(df.columns.contains)
    val presentNonNeg = nonNegativeColumns.filter(df.columns.contains)
    val aggs =
      Seq(count(lit(1)).as("__n")) ++
        presentNotNull.map(c => sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null_$c")) ++
        presentNonNeg.map(c => sum(when(col(c) < 0, 1L).otherwise(0L)).as(s"__neg_$c"))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val n = row.getAs[Long]("__n")
    structural ++
      Seq(CheckResult("non_empty", n > 0, n)) ++
      presentNotNull.map { c =>
        val nulls = row.getAs[Long](s"__null_$c")
        CheckResult(s"no_nulls:$c", nulls == 0, nulls)
      } ++
      presentNonNeg.map { c =>
        val negs = row.getAs[Long](s"__neg_$c")
        CheckResult(s"non_negative:$c", negs == 0, negs)
      }
  }

  /** Cross-layer invariants (test_data_quality.py.py:81-94): row-count
    * monotonicity and measure conservation. */
  def crossLayer(bronze: DataFrame, silver: DataFrame, gold: DataFrame,
                 bronzeMeasure: String, goldMeasure: String): Seq[CheckResult] = {
    val bronzeAgg = bronze.agg(count(lit(1)).as("n"), sum(col(bronzeMeasure)).as("s")).head()
    val goldAgg = gold.agg(count(lit(1)).as("n"), sum(col(goldMeasure)).as("s")).head()
    val silverN = silver.count()
    Seq(
      CheckResult("gold_lt_silver", goldAgg.getAs[Long]("n") < silverN, goldAgg.getAs[Long]("n")),
      CheckResult("silver_le_bronze", silverN <= bronzeAgg.getAs[Long]("n"), silverN),
      CheckResult("conservation",
        toD(goldAgg.get(1)) <= toD(bronzeAgg.get(1)), goldAgg.getAs[Long]("n")))
  }

  /** Invariants across the packed-shard write (x37's terminal stage,
    * `Sampling.writePackedShards`): nothing is lost or duplicated by the
    * materialization. One aggregate per side: token conservation (written
    * n_tokens sum == whitespace-token sum of the source corpus), row
    * conservation, and shard/bin integrity (shard_id == bin_id div
    * binsPerShard on every written row). */
  def packedShards(written: DataFrame, sourceDocs: DataFrame,
                   binsPerShard: Long): Seq[CheckResult] = {
    val src = sourceDocs.agg(
      count(lit(1)).as("n"),
      sum(size(split(col("text"), " ")).cast("long")).as("toks")).head()
    val out = written.agg(
      count(lit(1)).as("n"),
      sum(col("n_tokens")).as("toks"),
      sum(when(col("shard_id").cast("long") =!= expr(s"bin_id div $binsPerShard"), 1L)
        .otherwise(0L)).as("bad_shard"),
      countDistinct(col("doc_id")).as("n_docs")).head()
    Seq(
      CheckResult("rows_conserved", out.getAs[Long]("n") == src.getAs[Long]("n"),
        out.getAs[Long]("n")),
      CheckResult("docs_unique", out.getAs[Long]("n_docs") == out.getAs[Long]("n"),
        out.getAs[Long]("n_docs")),
      CheckResult("tokens_conserved", out.getAs[Long]("toks") == src.getAs[Long]("toks"),
        out.getAs[Long]("toks")),
      CheckResult("shard_is_bin_div", out.getAs[Long]("bad_shard") == 0L,
        out.getAs[Long]("bad_shard")))
  }

  private def toD(v: Any): Double = v match {
    case d: java.lang.Double => d
    case l: java.lang.Long   => l.toDouble
    case other               => other.toString.toDouble
  }
}
