package graft.pipeline

import org.apache.spark.sql.SparkSession

/** Catalog bootstrap — parity with notebooks/grocery_setup.sql.py.
  *
  * The reference creates a 3-level Unity Catalog namespace
  * (`grocery_catalog.{raw,processed,analytics,logs}`,
  * grocery_setup.sql.py:3,15-18) and the error-log Delta table (:24-29).
  * On stock Spark the 3-level name maps to database-per-layer on the
  * session catalog, and Delta to parquet-backed managed tables
  * (SURVEY.md §1.4).
  */
object Setup {

  val Layers: Seq[String] = Seq("raw", "processed", "analytics", "logs")

  val ErrorTable = "logs.etl_errors"

  def createCatalog(spark: SparkSession): Unit = {
    Layers.foreach(db => spark.sql(s"CREATE DATABASE IF NOT EXISTS $db"))
    // grocery_setup.sql.py:24-29 — error_message/error_time/stage/source_file
    spark.sql(
      s"""CREATE TABLE IF NOT EXISTS $ErrorTable (
         |  error_message STRING,
         |  error_time TIMESTAMP,
         |  stage STRING,
         |  source_file STRING)
         |USING parquet""".stripMargin)
  }

  /** Drop everything this library created (test hygiene). */
  def dropCatalog(spark: SparkSession): Unit =
    Layers.foreach(db => spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE"))
}
