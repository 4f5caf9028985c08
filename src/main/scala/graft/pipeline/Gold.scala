package graft.pipeline

import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.regression.GBTRegressor
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType}

/** Gold features + forecast — parity with notebooks/gold_feature.py.py.
  *
  * The weekly aggregate (:11-24), lag features (:27-31), trailing-4-week
  * ROWS-frame mean (:35-38), na.drop subset (:40) and casts (:43-51) are
  * replicated 1:1. The pandas/LightGBM island (:53-69 — `toPandas` collect,
  * driver-local train, re-parallelize) is replaced by MLlib
  * `VectorAssembler` + `GBTRegressor`, which keeps the whole step
  * distributed: no driver collect, no scalability cliff at 100 TB
  * (SURVEY.md §3.3 boundary analysis).
  */
object Gold {

  val FeatureCols: Seq[String] = Seq(
    "prev_week_transactions", "prev2_week_transactions", "mean_last4_weeks",
    "had_holiday", "avg_oil_price")

  /** gold_feature.py.py:11-51 — weekly grain + window features.
    * `first()` carry-through of per-store dims is kept for parity
    * (nondeterministic only when a store has conflicting dim rows, which
    * Silver's dedup precludes). GroupBy and both windows partition on
    * store_nbr → Catalyst reuses one exchange. */
  def weeklyFeatures(salesCleaned: DataFrame): DataFrame = {
    val weekly = salesCleaned
      .withColumn("week", weekofyear(col("date")))
      .withColumn("year", year(col("date")))
      .groupBy("store_nbr", "year", "week")
      .agg(
        sum("transactions").as("weekly_transactions"),
        first("city").as("city"),
        first("state").as("state"),
        first("type").as("store_type"),
        first("cluster").as("store_cluster"),
        max("is_holiday").as("had_holiday"),
        avg("dcoilwtico").as("avg_oil_price"))
    val w = Window.partitionBy("store_nbr").orderBy("year", "week")
    weekly
      .withColumn("prev_week_transactions", lag("weekly_transactions", 1).over(w))
      .withColumn("prev2_week_transactions", lag("weekly_transactions", 2).over(w))
      .withColumn("mean_last4_weeks",
        avg("weekly_transactions").over(w.rowsBetween(-4, -1)))
      .na.drop(Seq("prev_week_transactions", "prev2_week_transactions", "mean_last4_weeks"))
      .withColumn("had_holiday", col("had_holiday").cast(IntegerType))
      .withColumn("avg_oil_price", col("avg_oil_price").cast(DoubleType))
      .withColumn("prev_week_transactions", col("prev_week_transactions").cast(DoubleType))
      .withColumn("prev2_week_transactions", col("prev2_week_transactions").cast(DoubleType))
      .withColumn("mean_last4_weeks", col("mean_last4_weeks").cast(DoubleType))
      .withColumn("weekly_transactions", col("weekly_transactions").cast(DoubleType))
  }

  /** gold_feature.py.py:53-67 — gradient-boosted regression on the five
    * features, label weekly_transactions, in-sample predict, prediction
    * column named as the reference writes it. maxIter=100 matches
    * `num_boost_round=100`. */
  def forecast(features: DataFrame, maxIter: Int = 100): DataFrame = {
    val assembled = new VectorAssembler()
      .setInputCols(FeatureCols.toArray)
      .setOutputCol("features_vec")
      .transform(features)
    val model = new GBTRegressor()
      .setFeaturesCol("features_vec")
      .setLabelCol("weekly_transactions")
      .setPredictionCol("predicted_transactions")
      .setMaxIter(maxIter)
      .fit(assembled)
    model.transform(assembled).drop("features_vec")
  }
}
