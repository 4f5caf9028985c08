package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Approximate-nearest-neighbor / similarity search over the `embeddings`
  * table (vec_id, embedding: array<float>, label).
  *
  * Vector math is expressed with codegen'd higher-order functions
  * (`transform`/`zip_with`/`aggregate`) — no UDF serialization, stays inside
  * WholeStageCodegen. Floats are upcast to double before any arithmetic so
  * accumulation is well-defined and cross-engine exact (left-to-right fold).
  *
  * Scale path: `bruteForceTopK` broadcasts the (small) query set against the
  * full corpus — linear scan, the exact baseline. `lshTopK` buckets with
  * signed random hyperplanes first so each query only scans its bucket(s):
  * the shuffle key is the hyperplane sign signature, cost ∝ corpus/2^planes
  * per query at 100 TB.
  */
object Similarity {

  /** embedding column upcast float→double (element-wise, codegen'd). */
  def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(v: Column): Column = sqrt(aggregate(v, lit(0.0), (acc, x) => acc + x * x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Truncate to 6 decimals via floor — unlike round(), floor(x*1e6)/1e6 is
    * a composition of exact IEEE ops, so it is bit-identical cross-engine. */
  def trunc6(c: Column): Column = floor(c * lit(1000000.0)) / lit(1000000.0)

  /** Exact brute-force cosine top-k: the first `nQueries` vectors are the
    * query set (broadcast), ranked per query on the 6-decimal-truncated
    * cosine with vec_id tie-break (deterministic cross-engine). Scoring uses
    * the fused codegen kernel (`graft.functions.CosineSimilarity`) — one
    * loop per pair, bit-identical to the HOF form (see
    * CosineSimilaritySpec) but without a lambda call per element. */
  def bruteForceTopK(spark: SparkSession, dir: String, nQueries: Int = 10, k: Int = 5): DataFrame = {
    import graft.functions.VectorFunctions.cosine_sim
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val scored = emb.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        trunc6(cosine_sim(col("qv"), col("v"))).as("cos_sim"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos_sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Signed-random-hyperplane LSH ANN: deterministic pseudo-random
    * hyperplanes derived from xxhash64(plane, dim) — reproducible without
    * any RNG state. Vectors sharing the query's sign signature are the
    * candidate bucket; exact cosine re-ranks within it. Recall is
    * hash-dependent → no SQL oracle (rows-only check), correctness of the
    * ranking itself is covered by the brute-force twin. */
  def lshTopK(spark: SparkSession, dir: String, nQueries: Int = 10, k: Int = 5,
              planes: Int = 8): DataFrame = {
    val dim = 64
    // hyperplane p, component d ∈ {-1, +1}: a driver-side deterministic hash
    // baked into the plan — reproducible, no RNG state; evaluated by the
    // fused HyperplaneSignature kernel (one loop instead of a
    // planes×dims literal expression tree)
    def sign(p: Int, d: Int): Double =
      if ((scala.util.hashing.MurmurHash3.productHash((p, d)) & 1) == 1) 1.0 else -1.0
    val signs: Array[Array[Double]] =
      Array.tabulate(planes, dim)((p, d) => sign(p, d))

    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("sig", graft.functions.HashSignatures.hyperplane_sig(col("v"), signs))
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("sig").as("qsig"))
    val scored = emb.join(broadcast(queries), col("sig") === col("qsig"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        trunc6(graft.functions.VectorFunctions.cosine_sim(col("qv"), col("v"))).as("cos_sim"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos_sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** IVF (inverted-file) ANN: MLlib KMeans partitions the corpus into
    * nCentroids cells; each query probes only its nProbe nearest cells and
    * exact-ranks within them. The 100 TB shape: the corpus is shuffled once
    * by cell id (a uniform small-int key), each query touches
    * nProbe/nCentroids of the data. Cosine ranking reuses the fused native
    * kernel. Probe selection for the (small, by definition) query set is
    * driver-side against the model's local centroids — not a data collect. */
  def ivfTopK(spark: SparkSession, dir: String, nQueries: Int = 10, k: Int = 5,
              nCentroids: Int = 16, nProbe: Int = 4): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    import graft.functions.VectorFunctions.cosine_sim

    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val withVec = emb.withColumn("fv", array_to_vector(col("v")))
    // few iterations suffice: cells only need to be roughly balanced, and
    // ranking within probed cells is exact regardless of centroid quality
    val model = new KMeans().setK(nCentroids).setSeed(42).setMaxIter(5)
      .setFeaturesCol("fv").setPredictionCol("cluster").fit(withVec)
    val assigned = model.transform(withVec).select(col("vec_id"), col("v"), col("cluster"))

    val centers = model.clusterCenters.map(_.toArray)
    val queryRows = emb.filter(col("vec_id") < nQueries).collect()
    val probes = queryRows.flatMap { r =>
      val qid = r.getLong(0)
      val qv = r.getSeq[Double](1).toArray
      centers.zipWithIndex
        .map { case (c, i) =>
          var d = 0.0; var j = 0
          while (j < qv.length) { val t = qv(j) - c(j); d += t * t; j += 1 }
          (i, d)
        }
        .sortBy(_._2).take(nProbe)
        .map { case (cluster, _) => (qid, cluster) }
    }
    val probeDf = spark.createDataFrame(probes.toSeq).toDF("q_id", "cluster")
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
      .join(probeDf, Seq("q_id"))

    val scored = assigned.join(broadcast(queries), Seq("cluster"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), trunc6(cosine_sim(col("qv"), col("v"))).as("cos_sim"))
    // no pair dedup needed: a vector lives in exactly one cell and the
    // (q_id, cluster) probe rows are distinct
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos_sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
