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

  test("forecast fitness: finite RMSE on an sf0.01-derived feature table, beats the mean predictor") {
    // The reference trains LightGBM with metric=rmse
    // (notebooks/gold_feature.py.py:59-63); measure the MLlib GBT
    // replacement's fitness the same way, not just its execution. The
    // sales frame derives from the sf0.01 orders table (real data volume,
    // deterministic): store = o_custkey mod 20, daily transactions = order
    // count per (store, date); holiday/oil are deterministic functions of
    // the date so the features exist without the Favorita CSVs.
    val orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    val sales = orders
      .groupBy((col("o_custkey") % 20).cast("int").as("store_nbr"),
        col("o_orderdate").as("date"))
      .agg(count(lit(1)).cast("int").as("transactions"))
      .withColumn("is_holiday", dayofweek($"date") === 1)
      .withColumn("dcoilwtico", lit(40.0) + dayofmonth($"date").cast("double") / 2)
      .withColumn("city", lit("Quito")).withColumn("state", lit("Pichincha"))
      .withColumn("type", lit("D")).withColumn("cluster", lit(13))
      .withColumn("year", year($"date")).withColumn("month", month($"date"))
    val feats = Gold.weeklyFeatures(sales)
    val n = feats.count()
    assert(n > 1000, s"expected a real-sized feature table, got $n rows")
    val predicted = Gold.forecast(feats, maxIter = 20)
    val rmse = new org.apache.spark.ml.evaluation.RegressionEvaluator()
      .setLabelCol("weekly_transactions")
      .setPredictionCol("predicted_transactions")
      .setMetricName("rmse")
      .evaluate(predicted)
    // trivial-baseline RMSE = population stddev of the label: the model
    // must beat always-predicting-the-mean, or the replacement is unfit
    val sd = feats.agg(stddev_pop($"weekly_transactions")).as[Double].head()
    info(f"GBT in-sample RMSE = $rmse%.4f over $n rows (label stddev $sd%.4f)")
    assert(!rmse.isNaN && !rmse.isInfinite && rmse >= 0)
    assert(rmse < sd, s"RMSE $rmse does not beat the mean predictor ($sd)")
  }
}
