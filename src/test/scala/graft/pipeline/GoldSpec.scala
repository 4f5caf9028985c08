package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class GoldSpec extends SparkSpec {
  import spark.implicits._

  /** One store, 7 consecutive ISO weeks of daily rows collapsed to one day
    * per week (Mondays of 2017), so weekly sums are the daily values. */
  def salesCleaned: DataFrame = Seq(
    ("2017-01-02", 1, 100, false, 52.0),
    ("2017-01-09", 1, 110, true, 53.0),
    ("2017-01-16", 1, 120, false, 54.0),
    ("2017-01-23", 1, 130, false, 55.0),
    ("2017-01-30", 1, 140, false, 56.0),
    ("2017-02-06", 1, 150, false, 57.0),
    ("2017-02-13", 1, 160, true, 58.0),
  ).toDF("date", "store_nbr", "transactions", "is_holiday", "dcoilwtico")
    .withColumn("date", to_date($"date"))
    .withColumn("city", lit("Quito")).withColumn("state", lit("Pichincha"))
    .withColumn("type", lit("D")).withColumn("cluster", lit(13))
    .withColumn("year", year($"date")).withColumn("month", month($"date"))

  lazy val features: DataFrame = Gold.weeklyFeatures(salesCleaned)

  test("gold schema matches the reference's asserted column set") {
    assert(features.columns.toSet == Schemas.goldColumns.toSet)
  }

  test("na.drop(subset) removes the first two weeks (null lags); mean needs only one prior week") {
    // weeks 1..7 → rows with both lags present: weeks 3..7 → 5 rows
    assert(features.count() == 5)
  }

  test("lag features shift weekly transactions by 1 and 2 weeks") {
    val row = features.filter($"week" === 4).head()
    assert(row.getAs[Double]("prev_week_transactions") == 120.0)
    assert(row.getAs[Double]("prev2_week_transactions") == 110.0)
  }

  test("rolling mean is the trailing-4-week ROWS frame EXCLUDING the current row") {
    val w5 = features.filter($"week" === 5).head()
    assert(w5.getAs[Double]("mean_last4_weeks") == (100.0 + 110 + 120 + 130) / 4)
    val w3 = features.filter($"week" === 3).head() // only 2 prior weeks in frame
    assert(w3.getAs[Double]("mean_last4_weeks") == (100.0 + 110) / 2)
  }

  test("had_holiday is boolean max cast to int (any holiday that week → 1)") {
    val byWeek = features.select($"week", $"had_holiday").as[(Int, Int)].collect().toMap
    assert(byWeek(7) == 1)
    assert(byWeek(5) == 0)
  }

  test("weekofyear is ISO-8601 (2017-01-02 is week 1)") {
    // our fixture Mondays map to ISO weeks 1..7
    val all = salesCleaned.select(weekofyear($"date")).as[Int].collect().sorted
    assert(all.toSeq == (1 to 7))
  }

  test("MLlib forecast stays distributed and appends predicted_transactions") {
    val predicted = Gold.forecast(features, maxIter = 3)
    assert(predicted.count() == features.count())
    assert(predicted.columns.contains("predicted_transactions"))
    assert(predicted.filter($"predicted_transactions".isNull).count() == 0)
  }
}
