package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Bronze ingestion — parity with notebooks/bronze_ingestion.py.py:12-46
  * (`load_to_bronze`), re-expressed for stock Spark:
  *
  *  - explicit-schema CSV scan with header (:14-20);
  *  - corrupt-record capture via PERMISSIVE + `_corrupt_record` (:17) —
  *    the Databricks-only `badRecordsPath` (:18) becomes an explicit
  *    quarantine write of the corrupt rows (SURVEY.md §2.1 S3);
  *  - `source_file` from the hidden `_metadata.file_path` column (:21);
  *  - optional date/year/month derivation + partitioned write (:23-27);
  *  - failure path: append a row to logs.etl_errors and rethrow (:32-46).
  *
  * Scale: the CSV scan parallelizes per file split; the partitioned write
  * shuffles nothing (dynamic partition write straight from scan tasks).
  */
object Bronze {

  val CorruptCol = "_corrupt_record"

  /** Read one CSV source with the declared schema; corrupt rows land in
    * `_corrupt_record` (PERMISSIVE, the Spark default). */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("header", true)
      .option("columnNameOfCorruptRecord", CorruptCol)
      .schema(schema.add(StructField(CorruptCol, StringType)))
      .csv(path)
      .withColumn("source_file", col("_metadata.file_path"))

  /** Read one JSON-lines source with the declared schema — the same
    * ingestion contract as `readCsv` for the other common raw-drop
    * format: PERMISSIVE parsing, malformed lines captured whole in
    * `_corrupt_record`, lineage via `_metadata.file_path`. Feeds the
    * same `quarantine` splitter, so a pipeline can switch a source from
    * CSV to JSONL without touching anything downstream. One Spark caveat
    * shared with CSV: an action that prunes every data column off the
    * raw scan while filtering on `_corrupt_record` (e.g. `.count()`
    * straight after `quarantine`) hits QUERY_ONLY_CORRUPT_RECORD_COLUMN
    * — persist the cleaned rows first (as `loadToBronze` does) or keep
    * a data column referenced. */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("columnNameOfCorruptRecord", CorruptCol)
      .schema(schema.add(StructField(CorruptCol, StringType)))
      .json(path)
      .withColumn("source_file", col("_metadata.file_path"))

  /** Split clean vs corrupt; write corrupt rows (with their source file) to
    * the quarantine path — replaces Databricks badRecordsPath without
    * changing the clean-row output (SURVEY.md §7.4 risk 5). */
  def quarantine(df: DataFrame, quarantinePath: Option[String]): DataFrame = {
    quarantinePath.foreach { p =>
      // write the FULL row, not just the corrupt column: Spark (correctly)
      // refuses scans whose only referenced column is _corrupt_record
      // (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), and the
      // whole row is what an operator wants in quarantine anyway
      df.filter(col(CorruptCol).isNotNull)
        .write.mode(SaveMode.Append).parquet(p)
    }
    df.filter(col(CorruptCol).isNull).drop(CorruptCol)
  }

  /** bronze_ingestion.py.py:23-26 — derive date/year/month when requested
    * and a `date` column exists (driver-side introspection, U2). */
  def withDateParts(df: DataFrame, partitionByDate: Boolean): DataFrame =
    if (partitionByDate && df.columns.contains("date")) {
      df.withColumn("date", to_date(col("date"), "yyyy-MM-dd"))
        .withColumn("year", year(col("date")))
        .withColumn("month", month(col("date")))
    } else df

  /** Full `load_to_bronze` parity: scan → quarantine → source_file → date
    * parts → overwrite `raw.<table>` (partitioned by year/month when dated),
    * with the error-log append + rethrow failure path. */
  def loadToBronze(spark: SparkSession, path: String, schema: StructType,
                   table: String, partitionByDate: Boolean = false,
                   quarantinePath: Option[String] = None,
                   errorTable: String = Setup.ErrorTable): Long = {
    try {
      val cleaned = withDateParts(
        quarantine(readCsv(spark, path, schema), quarantinePath), partitionByDate)
      val writer = cleaned.write.format("parquet").mode(SaveMode.Overwrite)
      val partitioned =
        if (partitionByDate && cleaned.columns.contains("year")) writer.partitionBy("year", "month")
        else writer
      partitioned.saveAsTable(s"raw.$table")
      spark.table(s"raw.$table").count()
    } catch {
      case e: Throwable =>
        logError(spark, e, stage = s"bronze:$table", sourceFile = path, errorTable = errorTable)
        throw e
    }
  }

  /** bronze_ingestion.py.py:33-44 — one error row, current_timestamp, append. */
  def logError(spark: SparkSession, e: Throwable, stage: String,
               sourceFile: String, errorTable: String = Setup.ErrorTable): Unit = {
    import org.apache.spark.sql.Row
    val row = spark.createDataFrame(
      java.util.List.of(Row(Option(e.getMessage).getOrElse(e.getClass.getName), null, stage, sourceFile)),
      Schemas.etlErrors)
      .withColumn("error_time", current_timestamp())
    row.write.format("parquet").mode(SaveMode.Append).saveAsTable(errorTable)
  }
}
