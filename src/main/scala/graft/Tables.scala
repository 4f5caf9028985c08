package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (see TESTDATA.md).
  *
  * Every loader is a plain parquet scan so Catalyst can push filters and
  * prune columns into the `FileScan parquet` (verify via
  * `.explain("formatted")` → `PushedFilters` / `ReadSchema`). At 100 TB these
  * paths would be directories of many files — the API is identical.
  */
object Tables {
  private def p(dir: String, name: String): String = s"$dir/$name.parquet"

  def region(spark: SparkSession, dir: String): DataFrame    = spark.read.parquet(p(dir, "region"))
  def nation(spark: SparkSession, dir: String): DataFrame    = spark.read.parquet(p(dir, "nation"))
  def customer(spark: SparkSession, dir: String): DataFrame  = spark.read.parquet(p(dir, "customer"))
  def supplier(spark: SparkSession, dir: String): DataFrame  = spark.read.parquet(p(dir, "supplier"))
  def part(spark: SparkSession, dir: String): DataFrame      = spark.read.parquet(p(dir, "part"))
  def orders(spark: SparkSession, dir: String): DataFrame    = spark.read.parquet(p(dir, "orders"))
  def lineitem(spark: SparkSession, dir: String): DataFrame  = spark.read.parquet(p(dir, "lineitem"))
  def events(spark: SparkSession, dir: String): DataFrame    = spark.read.parquet(p(dir, "events"))
  def documents(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(p(dir, "documents"))
  def embeddings(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(p(dir, "embeddings"))
}
