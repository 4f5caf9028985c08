package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The reference's seven data-quality invariants
  * (notebooks/test_data_quality.py.py) run over the full in-memory
  * pipeline: bronze fixtures → Silver.salesCleaned → Gold.weeklyFeatures. */
class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  // 10 stores × 8 weeks of Mondays+Tuesdays → enough rows for lags to survive
  lazy val bronzeTransactions: DataFrame = {
    val rows = for {
      store <- 1 to 10
      week <- 0 until 8
      day <- Seq(2, 3)
    } yield {
      val date = java.time.LocalDate.of(2017, 1, day).plusWeeks(week).toString
      (date, store, 100 + store * 10 + week)
    }
    rows.toDF("date", "store_nbr", "transactions")
  }

  lazy val bronzeStores: DataFrame =
    (1 to 10).map(i => (i, s"city$i", s"state$i", "D", i)).toDF("store_nbr", "city", "state", "type", "cluster")

  lazy val bronzeHolidays: DataFrame = Seq(
    ("2017-01-02", "Holiday", "National", "EC", "NY", "FALSE"),
    ("2017-02-06", "Holiday", "National", "EC", "Carnival", "FALSE"),
  ).toDF("date", "type", "locale", "locale_name", "description", "transferred")

  lazy val bronzeOil: DataFrame = {
    val dates = bronzeTransactions.select($"date").distinct().as[String].collect()
    dates.map(d => (d, 50.0 + d.hashCode % 10)).toSeq.toDF("date", "dcoilwtico")
  }

  lazy val silver: DataFrame =
    Silver.salesCleaned(bronzeTransactions, bronzeStores, bronzeHolidays, bronzeOil)
  lazy val gold: DataFrame = Gold.weeklyFeatures(silver)

  test("each layer is non-empty") { // test_data_quality.py.py:13-15,32-34,53-55
    assert(bronzeTransactions.count() > 0 && silver.count() > 0 && gold.count() > 0)
  }

  test("required columns present per layer") { // :17-21,42-49,57-65
    assert(Set("date", "store_nbr", "transactions").subsetOf(bronzeTransactions.columns.toSet))
    assert(Schemas.silverColumns.toSet.subsetOf(silver.columns.toSet))
    assert(Schemas.goldColumns.toSet.subsetOf(gold.columns.toSet))
  }

  test("null integrity: no nulls in silver; none in gold essential features") { // :23-28,36-40,67-72
    val silverNulls = silver.columns.map(c => silver.filter(col(c).isNull).count()).sum
    assert(silverNulls == 0)
    val goldNulls = Gold.FeatureCols.map(c => gold.filter(col(c).isNull).count()).sum
    assert(goldNulls == 0)
  }

  test("value range: min weekly_transactions >= 0") { // :74-77
    assert(gold.agg(min($"weekly_transactions")).head().getDouble(0) >= 0)
  }

  test("cross-layer row-count monotonicity: gold < silver <= bronze") { // :81-86
    assert(gold.count() < silver.count())
    assert(silver.count() <= bronzeTransactions.count())
  }

  test("conservation: sum(gold.weekly_transactions) <= sum(bronze.transactions)") { // :88-94
    val goldSum = gold.agg(sum($"weekly_transactions")).head().getDouble(0)
    val bronzeSum = bronzeTransactions.agg(sum($"transactions")).head().getLong(0)
    assert(goldSum <= bronzeSum)
  }

  test("Quality module runs the same invariants as one aggregate job") {
    val results = Quality.check(silver,
      requiredColumns = Schemas.silverColumns,
      notNullColumns = Schemas.silverColumns,
      nonNegativeColumns = Seq("transactions"))
    assert(results.forall(_.passed), results.filterNot(_.passed).mkString(", "))
    val cross = Quality.crossLayer(bronzeTransactions, silver, gold,
      bronzeMeasure = "transactions", goldMeasure = "weekly_transactions")
    assert(cross.forall(_.passed), cross.filterNot(_.passed).mkString(", "))
    val broken = Quality.check(silver.withColumn("transactions", lit(null).cast("int")),
      notNullColumns = Seq("transactions"))
    assert(broken.exists(r => r.check == "no_nulls:transactions" && !r.passed))
  }
}
