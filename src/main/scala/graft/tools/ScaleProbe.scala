package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale probe past the fixed-cost floor (round-12, VERDICT task 5):
  * the r11 probe measured the exact-contract board (x163/x203/x98)
  * over sf0.001→0.1, where per-JVM constants floor every curve and the
  * observed exponents are only lower bounds. This tool GENERATES
  * sf0.3/sf1 variants of the two tables those queries read —
  * deterministic column transforms of the driver's sf0.1 data, never
  * new randomness: documents replicate with word-ROTATED text (same
  * vocabulary, so every term's document frequency scales by the copy
  * count — the natural growth of a corpus), embeddings replicate with
  * one dimension nudged per copy (no duplicate vectors, no tie
  * pathologies) — and then times the three queries (min of 2, the
  * BenchOne convention) across the full 3-decade span so the claimed
  * exponents are observed, not modeled.
  *
  * Usage: runMain graft.tools.ScaleProbe [outRoot] [queries...]
  */
object ScaleProbe {

  private val Queries = Seq("x163_tf_cosine", "x203_knn_ingest", "x98_cluster_ingest")

  private[tools] def scaledDocuments(base: DataFrame, copies: Int,
                                     idSpan: Long): DataFrame =
    (0 until copies).map { c =>
      if (c == 0) base
      else base
        .withColumn("doc_id", col("doc_id") + lit(c * idSpan))
        .withColumn("w", split(col("text"), " "))
        .withColumn("rot", pmod(lit(c), greatest(size(col("w")), lit(1))))
        .withColumn("text", concat_ws(" ",
          concat(slice(col("w"), col("rot") + 1, size(col("w")) - col("rot")),
            slice(col("w"), lit(1), col("rot")))))
        .drop("w", "rot")
    }.reduce(_ unionByName _)

  /** Orders/lineitem replication for the r15 probe targets (x249
    * bucketed join, x254 salted join): copy c shifts BOTH sides' order
    * key by c·span, so FK integrity and the per-copy key-frequency
    * shape (the skew profile) are preserved — joins grow linearly in
    * rows with constant fan-in per key, the honest scale-up of a fact
    * table whose hot keys grow WITH the corpus rather than into one
    * planet-sized key. */
  private[tools] def scaledByKey(base: DataFrame, keyCol: String,
                                 copies: Int, idSpan: Long): DataFrame =
    (0 until copies).map { c =>
      if (c == 0) base
      else base.withColumn(keyCol, col(keyCol) + lit(c * idSpan))
    }.reduce(_ unionByName _)

  private[tools] def scaledEmbeddings(base: DataFrame, copies: Int,
                                      idSpan: Long): DataFrame =
    (0 until copies).map { c =>
      if (c == 0) base
      else {
        val nudged = base.withColumn("vec_id", col("vec_id") + lit(c * idSpan))
        nudged.withColumn("embedding",
          transform(col("embedding"), (x, i) =>
            when(i === pmod(col("vec_id"), size(col("embedding"))),
              x + lit(0.001f * c)).otherwise(x)))
      }
    }.reduce(_ unionByName _)

  def main(args: Array[String]): Unit = {
    val outRoot = args.headOption.getOrElse("/tmp/graft_scale")
    val queries = if (args.length > 1) args.drop(1).toSeq else Queries
    val src = "/root/testdata/sf0.1"
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

    // sf3 (r17 verdict task 7): one more decade-ish step (×30) so the
    // "documented-linear" banded families carry a measured two-decade
    // exponent sf0.1→sf3, not an extrapolated one
    val scales = Seq("sf0.3" -> 3, "sf1" -> 10, "sf3" -> 30)
    scales.foreach { case (name, copies) =>
      val dir = s"$outRoot/$name"
      if (!new java.io.File(s"$dir/documents.parquet").exists()) {
        val docs = spark.read.parquet(s"$src/documents.parquet")
        val span = docs.agg(max(col("doc_id"))).head().getLong(0) + 1
        scaledDocuments(docs, copies, span)
          .write.mode("overwrite").parquet(s"$dir/documents.parquet")
        val emb = spark.read.parquet(s"$src/embeddings.parquet")
        val vspan = emb.agg(max(col("vec_id"))).head().getLong(0) + 1
        scaledEmbeddings(emb, copies, vspan)
          .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
        println(s"GENERATED $dir")
      }
      // orders/lineitem landed in r15 — generate them independently so a
      // probe dir built by an earlier round backfills rather than skips.
      // Guard on the LAST artifact written: a crash between the two
      // writes then re-runs the whole pair instead of leaving the dir
      // permanently half-built
      if (!new java.io.File(s"$dir/lineitem.parquet").exists()) {
        val ord = spark.read.parquet(s"$src/orders.parquet")
        val ospan = ord.agg(max(col("o_orderkey"))).head().getLong(0) + 1
        scaledByKey(ord, "o_orderkey", copies, ospan)
          .write.mode("overwrite").parquet(s"$dir/orders.parquet")
        scaledByKey(spark.read.parquet(s"$src/lineitem.parquet"),
          "l_orderkey", copies, ospan)
          .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
        println(s"GENERATED $dir orders+lineitem")
      }
    }

    val dirs = Seq("sf0.001" -> "/root/testdata/sf0.001",
      "sf0.01" -> "/root/testdata/sf0.01", "sf0.1" -> src) ++
      scales.map { case (n, _) => n -> s"$outRoot/$n" }
    for ((sf, dir) <- dirs; n <- queries) {
      val f = graft.SparkEntry.queries(n)
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        f(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"SCALEPROBE $sf $n ${times.min}%.2f s")
    }
    spark.stop()
  }
}
