package graft.pipeline

import java.nio.file.{Files, Path}

import org.apache.spark.sql.{SaveMode, SparkSession}

/** End-to-end medallion run — the executable twin of the reference's four
  * notebooks (setup → bronze_ingestion → silver_processing → gold_feature).
  *
  * Usage: `runMain graft.pipeline.RunPipeline [csvDir]`
  * With no args it synthesizes a small Favorita-shaped CSV fixture (with a
  * corrupt row to exercise quarantine) into a temp dir, then:
  * catalog DDL → CSV ingest (+quarantine, error log) → silver clean/join →
  * gold weekly features → MLlib GBT forecast → analytics table, printing
  * per-layer row counts.
  */
object RunPipeline {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .appName("graft-pipeline")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      // fresh warehouse per run: the in-memory metastore forgets tables but
      // their directories survive, and a re-run would hit
      // LOCATION_ALREADY_EXISTS on the first saveAsTable
      .config("spark.sql.warehouse.dir",
        Files.createTempDirectory("graft-warehouse").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val csvDir = args.headOption.getOrElse(writeFixture().toString)
    Setup.createCatalog(spark)

    // bronze_ingestion.py.py:95-139 — all six per-source ingests with the
    // reference's declared schemas and partitioning choices
    val quarantineBase = Files.createTempDirectory("graft-quarantine").toString
    val nTx = Bronze.loadToBronze(spark, s"$csvDir/transactions.csv", Schemas.transactions,
      "transactions", partitionByDate = true, Some(s"$quarantineBase/transactions"))
    val nStores = Bronze.loadToBronze(spark, s"$csvDir/stores.csv", Schemas.stores, "stores")
    val nSub = Bronze.loadToBronze(spark, s"$csvDir/sample_submission.csv",
      Schemas.sampleSubmission, "sample_submission",
      quarantinePath = Some(s"$quarantineBase/sample_submission"))
    val nHol = Bronze.loadToBronze(spark, s"$csvDir/holidays_events.csv", Schemas.holidaysEvents,
      "holidays_events", partitionByDate = true, Some(s"$quarantineBase/holidays"))
    val nOil = Bronze.loadToBronze(spark, s"$csvDir/oil.csv", Schemas.oil,
      "oil", partitionByDate = true, Some(s"$quarantineBase/oil"))
    val nTest = Bronze.loadToBronze(spark, s"$csvDir/test.csv", Schemas.test,
      "test", partitionByDate = true, Some(s"$quarantineBase/test"))
    println(s"[bronze] transactions=$nTx stores=$nStores sample_submission=$nSub " +
      s"holidays=$nHol oil=$nOil test=$nTest")

    val silver = Silver.salesCleaned(
      spark.table("raw.transactions").drop("year", "month"),
      spark.table("raw.stores"),
      spark.table("raw.holidays_events").drop("year", "month"),
      spark.table("raw.oil").drop("year", "month"))
      // Silver expects bronze string dates (it re-parses); bronze already
      // parsed them when partitioning — make both shapes work:
      .cache()

    // quality gates (docx "email alerts on failure" intent): BOTH gates
    // run on the DataFrames before ANY saveAsTable — gold is computed
    // from the silver frame, not the published table, so a failed
    // invariant (silver's own OR the cross-layer conservation) lands in
    // etl_errors, exits nonzero, and publishes NOTHING: downstream
    // readers of both layers keep the previous versions.
    try {
      Quality.gate(spark, "silver.sales_cleaned",
        Quality.check(silver,
          requiredColumns = Seq("date", "store_nbr", "transactions"),
          notNullColumns = Seq("date", "store_nbr", "transactions"),
          nonNegativeColumns = Seq("transactions")))
      val features = Gold.weeklyFeatures(silver)
      val predicted = Gold.forecast(features,
        maxIter = sys.env.getOrElse("SPARK_GRAFT_GBT_ITERS", "20").toInt).cache()
      Quality.gate(spark, "cross_layer",
        Quality.crossLayer(spark.table("raw.transactions"), silver, predicted,
          bronzeMeasure = "transactions", goldMeasure = "weekly_transactions"))

      silver.write.format("parquet").mode(SaveMode.Overwrite)
        .partitionBy("year", "month").saveAsTable("processed.sales_cleaned")
      println(s"[silver] sales_cleaned=${silver.count()}")
      predicted.write.format("parquet").mode(SaveMode.Overwrite)
        .partitionBy("year").saveAsTable("analytics.sales_forecast_features")
      val nGold = spark.table("analytics.sales_forecast_features").count()
      println(s"[gold] sales_forecast_features=$nGold")
      println("[quality] all gates passed")
    } catch {
      case e: Quality.QualityGateException =>
        // error row already logged by the gate; fail the run loudly,
        // leaving the gated table unpublished
        System.err.println(s"[quality] ${e.getMessage}")
        spark.stop()
        sys.exit(2)
    }
    println(s"[errors] ${spark.table(Setup.ErrorTable).count()} rows in ${Setup.ErrorTable}")
    spark.stop()
  }

  /** Favorita-shaped fixture: 6 stores × 20 weeks, one corrupt oil row. */
  def writeFixture(): Path = {
    val dir = Files.createTempDirectory("graft-csv")
    val dates = (0 until 140).map(java.time.LocalDate.of(2017, 1, 2).plusDays(_))
    val tx = new StringBuilder("date,store_nbr,transactions\n")
    for (d <- dates; s <- 1 to 6) tx ++= s"$d,$s,${100 + s * 10 + d.getDayOfYear % 7}\n"
    Files.writeString(dir.resolve("transactions.csv"), tx.toString)
    val stores = new StringBuilder("store_nbr,city,state,type,cluster\n")
    for (s <- 1 to 6) stores ++= s"$s,city$s,state$s,${('A' + s % 4).toChar},$s\n"
    Files.writeString(dir.resolve("stores.csv"), stores.toString)
    val hol = new StringBuilder("date,type,locale,locale_name,description,transferred\n")
    for (d <- dates if d.getDayOfMonth == 1)
      hol ++= s"$d,Holiday,National,Ecuador,FirstOfMonth,FALSE\n"
    Files.writeString(dir.resolve("holidays_events.csv"), hol.toString)
    val oil = new StringBuilder("date,dcoilwtico\n")
    for (d <- dates) oil ++= s"$d,${50.0 + d.getDayOfYear % 10}\n"
    oil ++= "2017-06-01,not_a_number\n" // exercises the quarantine path
    Files.writeString(dir.resolve("oil.csv"), oil.toString)
    val sub = new StringBuilder("id,sales\n")
    for (i <- 0 until 50) sub ++= s"$i,0.0\n"
    Files.writeString(dir.resolve("sample_submission.csv"), sub.toString)
    val test = new StringBuilder("id,date,store_nbr,family,onpromotion\n")
    for ((d, i) <- dates.take(10).zipWithIndex; s <- 1 to 6)
      test ++= s"${i * 6 + s},$d,$s,GROCERY,${i % 2}\n"
    Files.writeString(dir.resolve("test.csv"), test.toString)
    dir
  }
}
