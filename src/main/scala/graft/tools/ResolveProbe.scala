package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: price parquet relation resolution (file listing + schema
  * inference) as `Tables` pays it on every call — the per-query fixed
  * overhead candidate of the r18 optimization round. */
object ResolveProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = args.drop(1).headOption.map(_.toInt).getOrElse(100)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm
    spark.read.parquet(s"$dir/lineitem.parquet").schema
    for (t <- Seq("lineitem", "documents", "events", "orders")) {
      val t0 = System.nanoTime()
      var i = 0
      while (i < n) { spark.read.parquet(s"$dir/$t.parquet").schema; i += 1 }
      val el = (System.nanoTime() - t0) / 1e6 / n
      println(f"RESOLVE $t%-10s $el%.2f ms/call (infer)")
      val sch = spark.read.parquet(s"$dir/$t.parquet").schema
      val t1 = System.nanoTime()
      i = 0
      while (i < n) { spark.read.schema(sch).parquet(s"$dir/$t.parquet").schema; i += 1 }
      val el1 = (System.nanoTime() - t1) / 1e6 / n
      println(f"RESOLVE $t%-10s $el1%.2f ms/call (explicit schema)")
    }
    spark.stop()
  }
}
