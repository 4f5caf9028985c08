package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Dev tool: prints the scan/join/exchange skeleton of each query's
  * physical plan — the per-round "is this the plan I'd want at 100×" audit
  * (pushed filters, pruned read schemas, join strategies, shuffle count). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names = if (args.length > 1) args.drop(1).toSet else Set.empty[String]
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.bucketing.coalesceBucketsInJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => names.isEmpty || names.exists(n.contains) }
      .foreach { case (name, fn) =>
        println(s"===== $name =====")
        val s = fn(spark, sfDir).queryExecution.explainString(FormattedMode)
        println(s.linesIterator.filter(l =>
          l.contains("Scan parquet") || l.contains("Join") || l.contains("ReadSchema") ||
          l.contains("PushedFilters") || l.contains("Exchange") || l.contains("Cartesian") ||
          l.contains("SortAggregate"))
          .mkString("\n"))
      }
    spark.stop()
  }
}
