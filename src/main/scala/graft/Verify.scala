package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // args: sfDir outDir [comma-separated query-name filter] — the driver
    // passes two args (full run); the optional filter is a dev-loop
    // convenience that restricts BOTH the dump and oracle_sql.json so
    // tools/compare_oracle.py checks just the named queries.
    val (sfDir, outDir) = (args(0), args(1))
    val nameFilter: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    // Fail fast on a filter typo: a name matching no query would otherwise
    // dump nothing and read as "0 ok, 0 bad" — a silent pass in the dev loop.
    nameFilter.foreach { f =>
      val unknown = f -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"unknown query name(s) in filter: ${unknown.mkString(", ")}")
    }
    def selected(name: String): Boolean = nameFilter.forall(_.contains(name))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.bucketing.coalesceBucketsInJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.foreach { case (name, fn) =>
      if (selected(name))
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
    }
    // x18's oracle is EXACT brute-force equality under measured recall 1.0
    // — a corpus-dependent gate. Record the measured recall NEXT TO the
    // dump so an x18 hash-mismatch is immediately classifiable from the
    // verify artifacts alone: recall < 1 → recall loss on this corpus (the
    // pruning legitimately dropped a true neighbor; gate artifact, not a
    // bug), recall = 1 → the dataflow itself diverged (real bug).
    if (selected("x18_ann_ivf")) try {
      def keySet(df: org.apache.spark.sql.DataFrame) =
        df.select("q_id", "vec_id", "rank").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val exact = keySet(operators.Similarity.bruteForceTopK(spark, sfDir,
        qLo = operators.Similarity.IvfQLo, qHi = operators.Similarity.IvfQHi))
      val approx = keySet(operators.Similarity.ivfTopK(spark, sfDir))
      val missing = (exact -- approx).size
      val recall = if (exact.isEmpty) 1.0 else (exact.size - missing).toDouble / exact.size
      Files.writeString(Paths.get(s"$outDir/x18_recall.json"),
        s"""{"exact":${exact.size},"approx":${approx.size},"missing":$missing,"recall":$recall}""")
    } catch { case e: Throwable =>
      System.err.println(s"[verify] x18 recall probe failed: ${e.getMessage}")
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => selected(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
