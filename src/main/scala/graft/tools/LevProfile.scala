package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Levenshtein-kernel profile (round-15, VERDICT task 8a): before
  * hand-rolling a "codegen'd banded-Levenshtein kernel" to replace
  * `levenshtein(a, b, d)` in the x128/x255 hot paths, measure what the
  * kernel actually costs there. Three timings over x255's REAL
  * candidate-pair frame (the banded-LSH candidates joined to their
  * texts, localCheckpointed so the upstream cost is paid once and
  * excluded from every variant):
  *
  *   pairs_only   — count the materialized pairs (floor cost)
  *   banded3      — + `levenshtein(a, b, LevThreshold)` (the shipped form)
  *   full2        — + 2-arg `levenshtein(a, b)` (the O(len²) matrix)
  *
  * banded3 − pairs_only is the ceiling on what ANY replacement kernel
  * could save; full2 − banded3 is what the 3-arg banded form already
  * saves over the naive matrix. Also prints whether the expression
  * compiles into a WholeStageCodegen span (it does — Spark's
  * `Levenshtein` is a codegen'd expression over UTF8String bytes with
  * the threshold-banded DP inside `UTF8String.levenshteinDistance`).
  */
object LevProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
    import graft.operators.Dedup

    // THE query's candidate frame (shared helper — if x255's candidate
    // generation changes, this profile re-prices the new frame, not a
    // stale copy), localCheckpointed so upstream cost is excluded
    val pairs = Dedup
      .editCandidatePairs(graft.Tables.documents(spark, dir))
      .localCheckpoint()
    val n = pairs.count()
    println(s"LEVPROFILE pairs=$n dir=$dir")

    def time(name: String)(df: org.apache.spark.sql.DataFrame): Double = {
      val secs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.count()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"LEVPROFILE $name ${secs}%.3f s")
      secs
    }

    val floor = time("pairs_only")(pairs.select(col("doc_a")))
    val b3 = time("banded3")(pairs
      .withColumn("d", levenshtein(col("text_a"), col("text_b"), Dedup.LevThreshold))
      .filter(col("d") >= -1))
    val f2 = time("full2")(pairs
      .withColumn("d", levenshtein(col("text_a"), col("text_b")))
      .filter(col("d") >= 0))
    println(f"LEVPROFILE kernel_share_of_banded3 ${(b3 - floor) / b3 * 100}%.1f%%")
    println(f"LEVPROFILE banded_speedup_vs_full ${(f2 - floor) / math.max(b3 - floor, 1e-9)}%.1f x")

    val codegen = pairs
      .withColumn("d", levenshtein(col("text_a"), col("text_b"), Dedup.LevThreshold))
      .queryExecution.executedPlan.toString
    println(s"LEVPROFILE wholestage_codegen=${codegen.contains("*(")}")
    spark.stop()
  }
}
