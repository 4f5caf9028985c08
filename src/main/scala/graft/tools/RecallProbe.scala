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
    val exactIvf = topk(Similarity.bruteForceTopK(spark, sfDir,
      qLo = Similarity.IvfQLo, qHi = Similarity.IvfQHi))
    for (nProbe <- Seq(6, 8, 10, 12, 14, 16)) {
      val approx = topk(Similarity.ivfTopK(spark, sfDir, nProbe = nProbe))
      println(s"[recall] ivf nProbe=$nProbe exact=${exactIvf.size} approx=${approx.size} " +
        s"match=${approx == exactIvf} missing=${(exactIvf -- approx).size}")
    }

    // IVF-over-JL-projection (x60→x18 composition) vs the same exact twin:
    // candidates found and pre-ranked in 16-dim projected space, survivors
    // exact-reranked in 64-dim — the rerank should restore what projection
    // loses, so the interesting numbers are (probe recall pre-rerank
    // implied by missing, and whether rerank reaches match=true)
    for (nProbe <- Seq(6, 8, 10, 12, 14, 16)) {
      val approx = topk(Similarity.ivfProjectedTopK(spark, sfDir, nProbe = nProbe))
      println(s"[recall] ivfproj nProbe=$nProbe rerank=${Similarity.IvfRerankFactor} " +
        s"exact=${exactIvf.size} approx=${approx.size} " +
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

    // x50 sampled-fence trim vs exact-quantile trim: how many docs the
    // bounded-state fences classify differently from exact q10/q90 fences
    {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val docs = graft.Tables.documents(spark, sfDir)
      val w = Window.partitionBy(col("source")).orderBy(col("n_chars"), col("doc_id"))
      val ranked = docs.withColumn("r", row_number().over(w))
        .withColumn("n", count(lit(1)).over(Window.partitionBy(col("source"))))
      val exactKept = ranked
        .withColumn("lo_r", ceil(col("n") * graft.operators.Sampling.TrimLoPct / 100))
        .withColumn("hi_r", ceil(col("n") * graft.operators.Sampling.TrimHiPct / 100))
        .filter(col("r") >= col("lo_r") && col("r") <= col("hi_r"))
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val sampled = graft.operators.Sampling.lengthTailTrim(spark, sfDir)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val total = docs.count()
      val sym = (exactKept -- sampled).size + (sampled -- exactKept).size
      println(s"[recall] lengthtrim total=$total exactKept=${exactKept.size} " +
        s"sampledKept=${sampled.size} symDiff=$sym agreement=${1.0 - sym.toDouble / total}")
    }

    // x53 KMV Jaccard estimate vs true per-source-pair Jaccard
    {
      import org.apache.spark.sql.functions._
      val sh = graft.Tables.documents(spark, sfDir)
        .select(col("source"), explode(graft.functions.HashSignatures.word_shingles(
          col("text"), Dedup.OverlapShingleN)).as("sh")).distinct()
      val a = sh.select(col("source").as("src_a"), col("sh"))
      val b = sh.select(col("source").as("src_b"), col("sh"))
      val inter = a.join(b, Seq("sh")).filter(col("src_a") < col("src_b"))
        .groupBy("src_a", "src_b").agg(count(lit(1)).as("i"))
      val sizes = sh.groupBy(col("source")).agg(count(lit(1)).as("sz"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val truth = inter.collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          r.getLong(2).toDouble / (sizes(r.getString(0)) + sizes(r.getString(1)) - r.getLong(2)))
        .toMap.withDefaultValue(0.0)
      val est = Dedup.sourceOverlap(spark, sfDir).collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(4))
      val errs = est.map { case (k, j) => math.abs(j - truth(k)) }
      println(f"[recall] sourceoverlap pairs=${est.length} " +
        f"maxAbsErr=${errs.max}%.4f meanAbsErr=${errs.sum / errs.length}%.4f")
    }

    // x60 JL projection: recall@5 of nearest neighbors (by squared
    // euclidean) computed in the 16-dim projected space vs the 64-dim
    // original — what the 4× shrink costs an ANN consumer
    {
      val orig = graft.Tables.embeddings(spark, sfDir)
        .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) as v")
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
      val proj = Similarity.randomProjection(spark, sfDir).collect()
        .map(r => r.getLong(0) -> (1 until 17).map(r.getDouble).toArray).toMap
      def top5(space: Map[Long, Array[Double]], q: Long): Set[Long] = {
        val qv = space(q)
        space.filter(_._1 != q).toSeq
          .map { case (id, v) =>
            id -> v.zip(qv).map(t => (t._1 - t._2) * (t._1 - t._2)).sum }
          .sortBy { case (id, d) => (d, id) }.take(5).map(_._1).toSet
      }
      val queries = orig.keys.toSeq.sorted.take(50)
      val hits = queries.map(q => (top5(orig, q) & top5(proj, q)).size).sum
      println(f"[recall] jlprojection queries=${queries.size} k=5 " +
        f"recall=${hits.toDouble / (queries.size * 5)}%.3f")
    }

    spark.stop()
  }
}
