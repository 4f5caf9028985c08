package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Full-schema sf1 materializer (round-16, VERDICT task 1): the r12
  * ScaleProbe generated only the two tables its three probe queries read;
  * the sf1 CORRECTNESS gate needs all ten, FK-consistent, so DuckDB can
  * replay every oracle against the same scaled inputs the engine reads.
  *
  * Replication contract (copy c of `copies`, c = 0 is the original):
  *  - region/nation: copied VERBATIM — dimension enumerations are
  *    scale-invariant (their TPC-H shape), and every replicated FK into
  *    them stays valid.
  *  - customer/supplier/part: key-shifted by c·span (span = max(key)+1),
  *    all other columns unchanged — linear growth, same value
  *    distributions.
  *  - orders: o_orderkey AND o_custkey shifted in lockstep with their
  *    parents, so each copy's order book references its own customer
  *    copy — per-key fan-in (the skew profile) is preserved, hot keys
  *    grow WITH the corpus rather than into one planet-sized key (the
  *    ScaleProbe.scaledByKey argument, now FK-complete).
  *  - lineitem: l_orderkey/l_partkey/l_suppkey all shifted in lockstep.
  *  - events: event_id and user_id shifted (user_id joins c_custkey in
  *    the enrichment/sessionization family); timestamps unchanged —
  *    each copy is an independent user population over the same clock.
  *  - documents: word-ROTATED text per copy (ScaleProbe.scaledDocuments —
  *    same vocabulary, so df grows naturally with the corpus).
  *  - embeddings: one dimension nudged per copy (no duplicate vectors).
  *
  * Determinism note for the gate: replication introduces cross-copy VALUE
  * ties (copy c of a row aggregates identically to copy 0), which is
  * exactly why every ranked/topped query's total order includes its key
  * tie-break — the gate at sf1 therefore also STRESSES tie discipline the
  * sf0.01 data never exercised.
  *
  * Usage: runMain graft.tools.ScaleData [srcDir] [outDir] [copies]
  */
object ScaleData {

  private def shifted(df: DataFrame, copies: Int,
                      keys: (String, Long)*): DataFrame =
    (0 until copies).map { c =>
      if (c == 0) df
      else keys.foldLeft(df) { case (d, (k, span)) =>
        d.withColumn(k, col(k) + lit(c * span))
      }
    }.reduce(_ unionByName _)

  private def span(df: DataFrame, key: String): Long =
    df.agg(max(col(key))).head().getLong(0) + 1

  def materializeFull(spark: SparkSession, srcDir: String, outDir: String,
                      copies: Int): Unit = {
    def read(t: String) = spark.read.parquet(s"$srcDir/$t.parquet")
    def write(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$outDir/$t.parquet")

    // last artifact written guards completeness — and the guard keys on
    // the writer's _SUCCESS marker, not directory existence: Spark
    // creates the output dir at write START, so a crash mid-write leaves
    // a partial dir that a bare exists() check would treat as done and
    // silently gate against a truncated corpus (r16 review finding).
    // Resolved through outDir's Hadoop FileSystem (r16 advisory): a
    // java.io.File check only sees local paths, so an hdfs://-or-s3a://
    // outDir would silently regenerate the corpus every run.
    val marker = new org.apache.hadoop.fs.Path(
      s"$outDir/embeddings.parquet/_SUCCESS")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(marker)) {
      println(s"EXISTS $outDir — skipping generation")
      return
    }

    val customer = read("customer")
    val supplier = read("supplier")
    val part = read("part")
    val orders = read("orders")
    val custSpan = span(customer, "c_custkey")
    val suppSpan = span(supplier, "s_suppkey")
    val partSpan = span(part, "p_partkey")
    val ordSpan = span(orders, "o_orderkey")

    write(read("region"), "region")
    write(read("nation"), "nation")
    write(shifted(customer, copies, "c_custkey" -> custSpan), "customer")
    write(shifted(supplier, copies, "s_suppkey" -> suppSpan), "supplier")
    write(shifted(part, copies, "p_partkey" -> partSpan), "part")
    write(shifted(orders, copies,
      "o_orderkey" -> ordSpan, "o_custkey" -> custSpan), "orders")
    write(shifted(read("lineitem"), copies, "l_orderkey" -> ordSpan,
      "l_partkey" -> partSpan, "l_suppkey" -> suppSpan), "lineitem")
    val events = read("events")
    write(shifted(events, copies, "event_id" -> span(events, "event_id"),
      "user_id" -> custSpan), "events")
    val docs = read("documents")
    write(ScaleProbe.scaledDocuments(docs, copies, span(docs, "doc_id"))
      // text mutated by rotation → n_chars must stay consistent with it
      .withColumn("n_chars", length(col("text")).cast("long")), "documents")
    val emb = read("embeddings")
    write(ScaleProbe.scaledEmbeddings(emb, copies, span(emb, "vec_id")), "embeddings")
    println(s"GENERATED $outDir (${copies}x $srcDir, FK-preserving)")
  }

  def main(args: Array[String]): Unit = {
    val srcDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val outDir = if (args.length > 1) args(1) else "/tmp/graft_scale/sf1full"
    val copies = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    materializeFull(spark, srcDir, outDir, copies)
    spark.stop()
  }
}
