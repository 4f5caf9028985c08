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
      .config("spark.sql.bucketing.coalesceBucketsInJoin.enabled", "true")
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
    // timings rounded to 0.1 ms: full-precision doubles tripled the size
    // of the summary line and byte-limited tail capture cut its head off
    // (BENCH_r10.json kept 59 of 235 entries)
    def r4(v: Double): String = BigDecimal(v)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toString
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // the BASELINE.md like-for-like subset: the 42 queries present in the
    // round-1 recording — q01–q16 pinned EXPLICITLY (an open-ended
    // startsWith("q") would silently absorb a future q17+ into the
    // headline) and x01–x26 by digit prefix via toIntOption (an x-name
    // without leading digits must not throw after all queries ran)
    val q42 = (1 to 16).map(i => f"q$i%02d").toSet
    def inSubset42(name: String): Boolean =
      q42.exists(p => name == p || name.startsWith(p + "_")) ||
        (name.startsWith("x") &&
          name.drop(1).takeWhile(_.isDigit).toIntOption.exists(_ <= 26))
    val canary = results.collect { case (k, v) if k.startsWith("q") => v }.sum
    val subset42 = results.collect { case (k, v) if inSubset42(k) => v }.sum
    // ONE compact record, printed FIRST (the driver's head capture —
    // BENCH_r11.json cut mid-JSON) and again LAST (the driver's 2000-byte
    // TAIL capture — r12/r14 recorded "parsed": null from a mid-line
    // fragment of the long summary). Built once so the two windows can
    // never disagree about the same run; metric stays "total" for the
    // contract's key shape, per-query bulk lives in the JSONL lines and
    // BENCH_LOCAL.json.
    def compact(): String =
      s"""{"metric":"total","value":${r4(total)},"unit":"sec","runs":$runs,"n_queries":${
        results.size},"n_errors":${errors.distinct.size},"canary_q_sec":${r4(canary)
        },"subset42_sec":${r4(subset42)},"sf":"$sfDir"}"""
    println(compact())
    // one line per query next (JSONL — any byte-capture window keeps a
    // parseable prefix), then the one-line full-summary contract
    results.toSeq.sortBy(_._1).foreach { case (k, v) =>
      println(s"""{"bench_query":"$k","sec":${r4(v)}}""")
    }
    val qs = results.toSeq.sortBy(_._1)
      .map { case (k, v) => s"\"" + k + "\":" + r4(v) }
      .mkString("{", ",", "}")
    val errs = errors.distinct.map(e => "\"" + e.replace("\"", "'") + "\"").mkString("[", ",", "]")
    val summary =
      s"""{"metric":"total","value":${r4(total)},"unit":"sec","runs":$runs,"queries":$qs,"errors":$errs,"sf":"$sfDir"}"""
    println(summary)
    // belt-and-braces: the complete artifact on disk, immune to any stdout
    // capture limit (BASELINE.md points the reader here). Anchored to an
    // explicit results dir (default: the launch cwd) and LOUD on failure —
    // a silently-missing artifact defeats its purpose.
    val localPath = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_RESULTS_DIR", "."), "BENCH_LOCAL.json")
    try java.nio.file.Files.writeString(localPath, summary + "\n")
    catch { case e: Throwable =>
      System.err.println(s"WARN: could not persist $localPath: $e")
    }
    println(compact()) // the tail-window copy — see the comment above
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
