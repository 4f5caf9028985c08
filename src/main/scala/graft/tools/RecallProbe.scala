package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Dedup, Similarity}

/** Dev tool: measures the recall of every approximate operator against its
  * exact twin on a given testdata dir, sweeping the probe/radius knobs —
  * how the `nProbe` (IVF), `probeRadius` (hyperplane LSH), band count
  * (minhash) and `maxHamming` (embedding near-dup) constants in
  * `graft.operators.{Similarity, Dedup}` were chosen and verified.
  *
  * Honors SPARK_GRAFT_CPUS like Verify/Bench so the measurement runs in the
  * same environment as the driver's correctness gate (KMeans init sampling
  * is sensitive to parallelism — see ivfTopK's pinned repartition). */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def topk(df: DataFrame): Set[(Long, Long, Int)] =
      df.select("q_id", "vec_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    def pairSet(df: DataFrame, a: String, b: String): Set[(Long, Long)] =
      df.select(a, b).collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // IVF ANN vs exact brute force on the same query slice
    val exactIvf = topk(Similarity.bruteForceTopK(spark, sfDir, qLo = 20, qHi = 30))
    for (nProbe <- Seq(6, 8, 10, 12, 14, 16)) {
      val approx = topk(Similarity.ivfTopK(spark, sfDir, nProbe = nProbe))
      println(s"[recall] ivf nProbe=$nProbe exact=${exactIvf.size} approx=${approx.size} " +
        s"match=${approx == exactIvf} missing=${(exactIvf -- approx).size}")
    }

    // hyperplane-LSH ANN vs exact brute force on the same query slice
    val exactLsh = topk(Similarity.bruteForceTopK(spark, sfDir, qLo = 10, qHi = 20))
    for (radius <- Seq(1, 2, 3)) {
      val approx = topk(Similarity.lshTopK(spark, sfDir, probeRadius = radius))
      println(s"[recall] lsh probeRadius=$radius exact=${exactLsh.size} approx=${approx.size} " +
        s"match=${approx == exactLsh} missing=${(exactLsh -- approx).size}")
    }

    // minhash-LSH banding vs exact n-gram Jaccard pair set
    val exactJac = pairSet(Dedup.ngramJaccard(spark, sfDir, threshold = 0.3), "doc_a", "doc_b")
    for (bands <- Seq(4, 8)) {
      val approx = pairSet(
        Dedup.minhashLsh(spark, sfDir, bands = bands, threshold = 0.3), "doc_a", "doc_b")
      println(s"[recall] minhash bands=$bands exact=${exactJac.size} approx=${approx.size} " +
        s"match=${approx == exactJac} missing=${(exactJac -- approx).size}")
    }

    // bucketed embedding near-dup vs exact all-pairs (recall < 1 by design
    // on this at-threshold corpus; the driver oracle replicates the radius)
    val exactEmb = pairSet(Dedup.embeddingNearDupExact(spark, sfDir), "vec_a", "vec_b")
    for (ham <- Seq(2, 3, 4, 5)) {
      val approx = pairSet(Dedup.embeddingNearDup(spark, sfDir, maxHamming = ham), "vec_a", "vec_b")
      println(s"[recall] embdup maxHamming=$ham exact=${exactEmb.size} approx=${approx.size} " +
        s"recall=${if (exactEmb.isEmpty) 1.0 else approx.size.toDouble / exactEmb.size} " +
        s"subset=${approx.subsetOf(exactEmb)}")
    }

    spark.stop()
  }
}
