package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JIT/classloader warmup so the first timed query doesn't absorb
    // whole-stage-codegen compilation of the scan/agg pipeline
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1000)
      .groupBy("l_returnflag").count().count()
    // two timed runs per query, min reported ("runs":2 in the JSON): the
    // shared host's CPU availability swings measured totals by ±20%
    // run-to-run, and min-of-N is the standard way to measure the code
    // rather than the neighbors. A failed query records its elapsed time
    // AND lands in `errors` — it can never lower the reported total or
    // masquerade as a speedup.
    val runs = 2
    val errors = scala.collection.mutable.ArrayBuffer.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val timed = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true }
          catch { case e: Throwable =>
            val msg = Option(e.getMessage).getOrElse("").replaceAll("[\\p{Cntrl}\"\\\\]", " ").take(300)
            errors += s"$name: ${e.getClass.getSimpleName}: $msg"
            false
          }
        (ok, (System.nanoTime() - t0) / 1e9)
      }
      // min over SUCCESSFUL runs only — a fast-failing run must not shave
      // time off the total; if every run failed, charge all elapsed time
      val succ = timed.collect { case (true, t) => t }
      name -> (if (succ.nonEmpty) succ.min else timed.map(_._2).sum)
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = errors.distinct.map(e => "\"" + e.replace("\"", "'") + "\"").mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","runs":$runs,"queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
