package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-loop single-query timer: runs the named queries (min of 2, same
  * session config as graft.Bench) against args(0)'s SF dir without
  * paying the full bench sweep. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args.drop(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.bucketing.coalesceBucketsInJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (n <- names) {
      val f = graft.SparkEntry.queries(n)
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        f(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"BENCHONE $n ${times.min}%.2f s")
    }
    spark.stop()
  }
}
