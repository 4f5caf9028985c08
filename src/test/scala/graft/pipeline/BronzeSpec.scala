package graft.pipeline

import java.nio.file.Files

import graft.SparkSpec

class BronzeSpec extends SparkSpec {
  import spark.implicits._

  def writeCsv(name: String, content: String): String = {
    val dir = Files.createTempDirectory("graft-csv")
    val f = dir.resolve(name)
    Files.writeString(f, content)
    f.toString
  }

  test("clean ingest: explicit schema, source_file metadata column, date partitioning") {
    Setup.createCatalog(spark)
    val csv = writeCsv("transactions.csv",
      """date,store_nbr,transactions
        |2017-01-02,1,100
        |2017-01-03,2,200
        |""".stripMargin)
    val n = Bronze.loadToBronze(spark, csv, Schemas.transactions, "transactions_t1",
      partitionByDate = true)
    assert(n == 2)
    val t = spark.table("raw.transactions_t1")
    assert(t.columns.toSet == Set("date", "store_nbr", "transactions", "source_file", "year", "month"))
    assert(t.filter($"source_file".contains("transactions.csv")).count() == 2)
    assert(t.select($"year").distinct().as[Int].collect().toSeq == Seq(2017))
  }

  test("corrupt rows are quarantined, clean-row output unchanged") {
    Setup.createCatalog(spark)
    val csv = writeCsv("oil.csv",
      """date,dcoilwtico
        |2017-01-02,52.36
        |2017-01-03,not_a_number
        |2017-01-04,53.06
        |""".stripMargin)
    val qdir = Files.createTempDirectory("graft-quarantine").toString + "/oil"
    val n = Bronze.loadToBronze(spark, csv, Schemas.oil, "oil_t1",
      quarantinePath = Some(qdir))
    assert(n == 2)
    val quarantined = spark.read.parquet(qdir)
    assert(quarantined.count() == 1)
    assert(quarantined.columns.contains(Bronze.CorruptCol))
  }

  test("JSONL source: same schema/quarantine/lineage contract as CSV") {
    import org.apache.spark.sql.functions.col
    val path = writeCsv("transactions.jsonl",
      """{"date":"2017-01-02","store_nbr":1,"transactions":100}
        |{"date":"2017-01-03","store_nbr":2,"transactions":200}
        |{not valid json at all
        |""".stripMargin)
    val q = Files.createTempDirectory("graft-jsonl-quar").toString + "/bad"
    val raw = Bronze.readJsonl(spark, path, Schemas.transactions)
    // persist-then-count, the loadToBronze flow (counting the live scan with
    // all data columns pruned trips QUERY_ONLY_CORRUPT_RECORD_COLUMN)
    val cleanPath = Files.createTempDirectory("graft-jsonl-clean").toString + "/clean"
    Bronze.quarantine(raw, Some(q)).write.parquet(cleanPath)
    val clean = spark.read.parquet(cleanPath)
    assert(clean.count() == 2)
    assert(clean.columns.toSet == Set("date", "store_nbr", "transactions", "source_file"))
    assert(clean.filter($"source_file".contains("transactions.jsonl")).count() == 2)
    val bad = spark.read.parquet(q)
    assert(bad.count() == 1)
    assert(bad.filter(col(Bronze.CorruptCol).contains("not valid json")).count() == 1)
  }

  test("ORC round-trips the documents table byte-for-byte (alternate columnar sink)") {
    val dir = Files.createTempDirectory("graft-orc").toString
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    docs.write.mode("overwrite").orc(s"$dir/documents.orc")
    val back = spark.read.orc(s"$dir/documents.orc")
    assert(back.schema == docs.schema)
    assert(back.except(docs).isEmpty && docs.except(back).isEmpty)
  }

  test("ingest failure appends to logs.etl_errors and rethrows") {
    Setup.createCatalog(spark)
    val before = spark.table(Setup.ErrorTable).count()
    intercept[Throwable] {
      Bronze.loadToBronze(spark, "/nonexistent/path/x.csv", Schemas.stores, "stores_fail")
    }
    val errors = spark.table(Setup.ErrorTable)
    assert(errors.count() == before + 1)
    val row = errors.orderBy($"error_time".desc).head()
    assert(row.getAs[String]("stage") == "bronze:stores_fail")
    assert(row.getAs[String]("source_file") == "/nonexistent/path/x.csv")
    assert(row.getAs[java.sql.Timestamp]("error_time") != null)
  }

  test("all six reference sources ingest, incl. test.csv and sample_submission.csv") {
    // bronze_ingestion.py.py:95-139 — the two sources beyond the four the
    // silver/gold layers consume must still land in raw.* for replay parity
    Setup.createCatalog(spark)
    val fixture = RunPipeline.writeFixture().toString
    val nSub = Bronze.loadToBronze(spark, s"$fixture/sample_submission.csv",
      Schemas.sampleSubmission, "sample_submission")
    val nTest = Bronze.loadToBronze(spark, s"$fixture/test.csv", Schemas.test,
      "test", partitionByDate = true)
    assert(nSub == 50 && spark.table("raw.sample_submission").count() == 50)
    assert(nTest == 60 && spark.table("raw.test").count() == 60)
    val t = spark.table("raw.test")
    assert(Set("year", "month").subsetOf(t.columns.toSet)) // date-partitioned like the reference
    assert(t.select($"family").distinct().as[String].collect().toSeq == Seq("GROCERY"))
  }
}
