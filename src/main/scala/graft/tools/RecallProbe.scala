package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.Similarity

/** Dev tool: measures ANN recall of the approximate operators against the
  * exact brute-force ranking on a given testdata dir, sweeping the probe
  * knobs — how the `probeRadius`/`nProbe` constants in
  * `graft.operators.Similarity` were chosen and verified. */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int)] =
      df.select("q_id", "vec_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

    val exactIvf = pairs(Similarity.bruteForceTopK(spark, sfDir, qLo = 20, qHi = 30))
    for (nProbe <- Seq(6, 8, 10, 12, 14, 16)) {
      val approx = pairs(Similarity.ivfTopK(spark, sfDir, nProbe = nProbe))
      val ok = approx == exactIvf
      println(s"[recall] ivf nProbe=$nProbe exact=${exactIvf.size} approx=${approx.size} " +
        s"match=$ok missing=${(exactIvf -- approx).size}")
      if (ok) sys.exit(0)
    }
    spark.stop()
  }
}
