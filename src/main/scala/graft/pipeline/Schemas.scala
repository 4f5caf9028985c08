package graft.pipeline

import org.apache.spark.sql.types._

/** The reference's declared source StructTypes, 1:1.
  *
  * Cites: /root/reference/notebooks/bronze_ingestion.py.py:52-91 (six CSV
  * schemas — dates deliberately ingested as strings and parsed in Silver),
  * :33-38 (error-log schema), grocery_setup.sql.py:24-29 (log table DDL),
  * test_data_quality.py.py:44-47,59-63 (derived silver/gold column sets).
  */
object Schemas {

  val stores: StructType = StructType(Seq(
    StructField("store_nbr", IntegerType),
    StructField("city", StringType),
    StructField("state", StringType),
    StructField("type", StringType),
    StructField("cluster", IntegerType)))

  val sampleSubmission: StructType = StructType(Seq(
    StructField("id", IntegerType),
    StructField("sales", DoubleType)))

  val oil: StructType = StructType(Seq(
    StructField("date", StringType),
    StructField("dcoilwtico", DoubleType)))

  val holidaysEvents: StructType = StructType(Seq(
    StructField("date", StringType),
    StructField("type", StringType),
    StructField("locale", StringType),
    StructField("locale_name", StringType),
    StructField("description", StringType),
    StructField("transferred", StringType)))

  val transactions: StructType = StructType(Seq(
    StructField("date", StringType),
    StructField("store_nbr", IntegerType),
    StructField("transactions", IntegerType)))

  val test: StructType = StructType(Seq(
    StructField("id", IntegerType),
    StructField("date", StringType),
    StructField("store_nbr", IntegerType),
    StructField("family", StringType),
    StructField("onpromotion", IntegerType)))

  /** logs.etl_errors (grocery_setup.sql.py:24-29). */
  val etlErrors: StructType = StructType(Seq(
    StructField("error_message", StringType),
    StructField("error_time", TimestampType),
    StructField("stage", StringType),
    StructField("source_file", StringType)))

  /** Column set the reference's tests assert on silver sales_cleaned
    * (test_data_quality.py.py:44-47). */
  val silverColumns: Seq[String] = Seq(
    "date", "store_nbr", "transactions", "city", "state", "type", "cluster",
    "is_holiday", "dcoilwtico", "year", "month")

  /** Column set asserted on gold sales_forecast_features
    * (test_data_quality.py.py:59-63) + predicted_transactions
    * (gold_feature.py.py:67). */
  val goldColumns: Seq[String] = Seq(
    "store_nbr", "year", "week", "weekly_transactions", "city", "state",
    "store_type", "store_cluster", "had_holiday", "avg_oil_price",
    "prev_week_transactions", "prev2_week_transactions", "mean_last4_weeks")
}
