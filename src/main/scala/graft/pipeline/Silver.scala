package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Silver cleaning — pure-function parity with
  * notebooks/silver_processing.py.py:14-74: per-source dedup/parse/na.drop,
  * the 3-way left-join chain, the coalesce rescue of the holiday flag, the
  * conditional duplicate-column drops, year/month derivation, and the final
  * any-null drop. The composition is preserved exactly — left joins followed
  * by na.drop() net to inner-join-like semantics on store/oil availability
  * while `coalesce(is_holiday, false)` rescues the holiday join
  * (SURVEY.md §2.4).
  *
  * Scale: the three right sides are small dims → Catalyst broadcasts them
  * (no shuffle of the fact); the only fact shuffle is the dropDuplicates
  * exchange on (date, store_nbr).
  */
object Silver {

  /** silver_processing.py.py:14-19 — transactions: dedup on (date,
    * store_nbr), parse date, drop any-null rows. */
  def cleanTransactions(transactions: DataFrame): DataFrame =
    transactions
      .dropDuplicates(Seq("date", "store_nbr"))
      .withColumn("date", to_date(col("date"), "yyyy-MM-dd"))
      .na.drop()

  /** :21-26 — stores: dedup on store_nbr, drop nulls. */
  def cleanStores(stores: DataFrame): DataFrame =
    stores.dropDuplicates(Seq("store_nbr")).na.drop()

  /** :28-37 — holidays: parse date, is_holiday flag, keep non-transferred,
    * project, dedup on date, drop nulls. */
  def cleanHolidays(holidays: DataFrame): DataFrame =
    holidays
      .withColumn("date", to_date(col("date"), "yyyy-MM-dd"))
      .withColumn("is_holiday",
        when(col("type") === "Holiday", lit(true)).otherwise(lit(false)))
      .filter(col("transferred") === "FALSE")
      .select("date", "is_holiday")
      .dropDuplicates(Seq("date"))
      .na.drop()

  /** :39-46 — oil: parse date, cast price, dedup on date, drop nulls. */
  def cleanOil(oil: DataFrame): DataFrame =
    oil
      .withColumn("date", to_date(col("date"), "yyyy-MM-dd"))
      .withColumn("dcoilwtico", col("dcoilwtico").cast("double"))
      .dropDuplicates(Seq("date"))
      .na.drop()

  /** :49-74 — the full composition producing sales_cleaned. */
  def salesCleaned(transactions: DataFrame, stores: DataFrame,
                   holidays: DataFrame, oil: DataFrame): DataFrame = {
    var cleaned = cleanTransactions(transactions)
      .join(cleanStores(stores), Seq("store_nbr"), "left")
      .join(cleanHolidays(holidays), Seq("date"), "left")
      .join(cleanOil(oil), Seq("date"), "left")
      .withColumn("is_holiday", coalesce(col("is_holiday"), lit(false)))
    // :58-64 — conditional drops; Scala drop(String) removes ALL columns of
    // that name post-join, matching PySpark (SURVEY.md §7.4 risk 8)
    for (c <- Seq("year", "month", "source_file"))
      if (cleaned.columns.contains(c)) cleaned = cleaned.drop(c)
    cleaned
      .withColumn("year", year(col("date")))
      .withColumn("month", month(col("date")))
      .na.drop()
  }
}
