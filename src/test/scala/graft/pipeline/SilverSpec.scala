package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Fixture data includes every edge case FIXTURES.md §A calls out:
  * duplicate (date, store_nbr) rows, nulls in each position, transferred
  * holidays, non-Holiday event types, oil weekend gaps, stores absent from
  * the dimension. */
class SilverSpec extends SparkSpec {
  import spark.implicits._

  def transactions: DataFrame = Seq(
    ("2017-01-02", 1, 100),
    ("2017-01-02", 1, 999), // duplicate (date, store) — one must survive
    ("2017-01-03", 1, 110),
    ("2017-01-02", 2, 200),
    ("2017-01-03", 2, 210),
    ("2017-01-04", 9, 900), // store 9 missing from dims → dropped by final na.drop
    ("2017-01-07", 1, 120), // date missing from oil (weekend) → dropped
    (null, 1, 130),         // null date → dropped
  ).toDF("date", "store_nbr", "transactions")

  def stores: DataFrame = Seq(
    (1, "Quito", "Pichincha", "D", 13),
    (2, "Guayaquil", "Guayas", "A", 4),
  ).toDF("store_nbr", "city", "state", "type", "cluster")

  def holidays: DataFrame = Seq(
    ("2017-01-02", "Holiday", "National", "Ecuador", "New Year obs", "FALSE"),
    ("2017-01-03", "Event", "National", "Ecuador", "Some event", "FALSE"),   // not Holiday → flag false
    ("2017-01-04", "Holiday", "National", "Ecuador", "Transferred", "TRUE"), // transferred → filtered out
  ).toDF("date", "type", "locale", "locale_name", "description", "transferred")

  def oil: DataFrame = Seq(
    ("2017-01-02", java.lang.Double.valueOf(52.36)),
    ("2017-01-03", java.lang.Double.valueOf(53.26)),
    ("2017-01-04", java.lang.Double.valueOf(53.06)),
    ("2017-01-05", null.asInstanceOf[java.lang.Double]), // null price → dropped in cleanOil
  ).toDF("date", "dcoilwtico")

  lazy val cleaned: DataFrame = Silver.salesCleaned(transactions, stores, holidays, oil)

  test("silver schema matches the reference's asserted column set") {
    assert(cleaned.columns.toSet == Schemas.silverColumns.toSet)
  }

  test("dedup keeps exactly one row per (date, store_nbr)") {
    val counts = cleaned.groupBy("date", "store_nbr").count().filter($"count" > 1).count()
    assert(counts == 0)
    // the duplicated (2017-01-02, 1) pair survived as one row
    assert(cleaned.filter($"store_nbr" === 1 && $"date" === to_date(lit("2017-01-02"))).count() == 1)
  }

  test("left joins + final na.drop net to inner-like on store/oil availability") {
    // store 9 has no dim row; 2017-01-07 has no oil row; null date dropped
    val dates = cleaned.select($"store_nbr", $"date".cast("string")).as[(Int, String)].collect().toSet
    assert(!dates.exists(_._1 == 9))
    assert(!dates.exists(_._2 == "2017-01-07"))
    assert(cleaned.na.drop().count() == cleaned.count())
  }

  test("is_holiday: true only for non-transferred Holiday dates, coalesced false elsewhere") {
    val byDate = cleaned.select($"date".cast("string"), $"is_holiday").distinct()
      .as[(String, Boolean)].collect().toMap
    assert(byDate("2017-01-02"))
    assert(!byDate("2017-01-03")) // Event type → false
  }

  test("partition pruning: a year-filtered read of the partitioned silver layout " +
    "scans only that partition (SURVEY §4's write-time partitionBy intent)") {
    // the silver table is written partitionBy(year, month)
    // (RunPipeline.scala) precisely so date-scoped reads prune; prove the
    // plan actually does it on a two-year layout
    val dir = java.nio.file.Files.createTempDirectory("graft-prune").toString
    cleaned.union(cleaned.withColumn("year", lit(2016)))
      .write.partitionBy("year", "month").parquet(s"$dir/sales_cleaned")
    val q = spark.read.parquet(s"$dir/sales_cleaned").filter($"year" === 2017)
    assert(q.count() == cleaned.count()) // only the 2017 partition's rows
    val plan = q.queryExecution.executedPlan.toString
    // the year predicate lands in PartitionFilters (directory pruning at
    // planning time), NOT as a data filter over a full scan
    assert("PartitionFilters: \\[[^\\]]*year[^\\]]*2017".r.findFirstIn(plan).nonEmpty,
      s"expected a year=2017 partition filter in:\n$plan")
    assert(!plan.contains("PushedFilters: [IsNotNull(year)"),
      "year must prune partitions, not scan-filter rows")
  }

  test("pre-existing year/month/source_file columns are dropped and re-derived (drop removes all same-named)") {
    val txWithExtras = transactions
      .withColumn("year", lit(1999)).withColumn("month", lit(12))
      .withColumn("source_file", lit("bronze.csv"))
    val out = Silver.salesCleaned(txWithExtras, stores, holidays, oil)
    assert(!out.columns.contains("source_file"))
    assert(out.columns.count(_ == "year") == 1)
    val years = out.select($"year").distinct().as[Int].collect().toSeq
    assert(years == Seq(2017)) // re-derived from date, not the stale 1999
  }
}
