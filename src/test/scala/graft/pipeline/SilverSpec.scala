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
