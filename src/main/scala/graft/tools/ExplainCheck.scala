package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted plans for the load-bearing queries so plan
  * hygiene (PushedFilters, pruned ReadSchema, broadcast joins, single
  * exchange reuse) can be eyeballed per round. Not part of the library API. */
object ExplainCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- args.drop(1)) {
      println(s"\n========== $name ==========")
      graft.SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
