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

  /** Hyperplane count / multi-probe Hamming radius for `lshTopK` (x10).
    * Shared constants consumed by the DuckDB oracle in `SparkEntry` (same
    * pattern as `Dedup.NearDupPlanes`): query and oracle can only move
    * together. */
  val LshPlanes: Int = 8
  val LshProbeRadius: Int = 2

  /** Query-id range for `ivfTopK` (x18). Shared with the recall probe in
    * `graft.Verify`, which compares `bruteForceTopK` over the SAME range —
    * hoisted so the probe can't silently measure a different query set if
    * the defaults move. */
  val IvfQLo: Int = 20
  val IvfQHi: Int = 30

  /** embedding column upcast float→double (element-wise, codegen'd). */
  def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(v: Column): Column = sqrt(aggregate(v, lit(0.0), (acc, x) => acc + x * x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Truncate to 6 decimals via floor — unlike round(), floor(x*1e6)/1e6 is
    * a composition of exact IEEE ops, so it is bit-identical cross-engine. */
  def trunc6(c: Column): Column = floor(c * lit(1000000.0)) / lit(1000000.0)

  /** Per-query top-k by (trunc6 cosine DESC, vec_id ASC) — x276's
    * bounded-aggregate form ([[graft.functions.TopKLongPairs]]) applied to
    * the shipping ANN rankings (r15 verdict task 3). The trunc6 grid makes
    * the double ordering INTEGER-exact: `floor(cos·10⁶)` (a bigint in-plan)
    * is trunc6's own integer, so ranking on `sk = −floor(cos·10⁶)`
    * ascending IS the truncated-cosine-descending order, and the emitted
    * `cos_sim = (−sk)/10⁶` is the same correctly-rounded double trunc6
    * produces — output bit-identical to the window form (spec-asserted per
    * converted site; precondition: no NaN cosines, which the corpora
    * satisfy — x93's zero-norm audit is the gate). Input: (q_id, vec_id,
    * cos_raw) with cos_raw UNtruncated (`onGrid = false`) or already ON
    * the trunc6 grid (`onGrid = true`, key via round — re-flooring a
    * rounded grid double could step down one ulp). `window = true` keeps
    * the rank-window twin for the bit-identity specs.
    *
    * Why: the window form — even bounded by WindowGroupLimit — locally
    * SORTS the full candidate frame on every mapper and re-shuffles it;
    * the aggregate keeps ≤2k pairs per (query × mapper), combines
    * map-side, and ships O(mappers·Q·2k) pairs, no sort. At 1000
    * executors that is the difference between sorting the corpus×Q frame
    * and shuffling a constant per task. */
  private[graft] def topKByCosine(scored: DataFrame, k: Int,
                                  onGrid: Boolean = false,
                                  window: Boolean = false): DataFrame =
    if (window) {
      val w = Window.partitionBy(col("q_id")).orderBy(col("cos_sim").desc, col("vec_id"))
      scored.select(col("q_id"), col("vec_id"),
          (if (onGrid) col("cos_raw") else trunc6(col("cos_raw"))).as("cos_sim"))
        .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
    } else {
      import graft.functions.TopKLongPairs.top_k_long_pairs
      val key = if (onGrid) round(col("cos_raw") * lit(1000000.0)).cast("long")
        else floor(col("cos_raw") * lit(1000000.0))
      scored.select(col("q_id"), (-key).as("sk"), col("vec_id"))
        .groupBy(col("q_id"))
        .agg(top_k_long_pairs(col("sk"), col("vec_id"), k).as("top"))
        .select(col("q_id"), posexplode(col("top")))
        .select(col("q_id"), col("col.id").as("vec_id"),
          ((-col("col.sk")).cast("double") / lit(1000000.0)).as("cos_sim"),
          (col("pos") + 1).as("rank"))
    }

  /** Deterministic ±1 hyperplane matrix: component (p, d) is a driver-side
    * MurmurHash3 of the indices — reproducible with no RNG state, identical
    * every build, and therefore bakeable into both the Spark plan and the
    * DuckDB oracle SQL. */
  def hyperplaneSigns(planes: Int = 8, dim: Int = 64): Array[Array[Double]] =
    Array.tabulate(planes, dim)((p, d) =>
      if ((scala.util.hashing.MurmurHash3.productHash((p, d)) & 1) == 1) 1.0 else -1.0)

  /** DuckDB SQL fragment computing the same hyperplane signature as
    * `HashSignatures.hyperplane_sig(v, hyperplaneSigns(planes))` for a
    * DOUBLE[] column `v` — one CASE per plane over an explicitly ordered
    * `0.0 + v[1] - v[2] …` chain. SQL's `+`/`-` are left-associative, so
    * the summation order is pinned BY THE GRAMMAR to the kernel's
    * left-to-right loop — no reliance on how `list_dot_product` happens to
    * accumulate (a DuckDB version change there could flip the sign of a
    * near-zero projection and silently desync one bucket bit). With ±1
    * coefficients, `acc + 1.0·x ≡ acc + x` and `acc + (-1.0)·x ≡ acc - x`
    * are IEEE-exact rewrites, so this chain is bit-identical to the
    * kernel's fused multiply-accumulate. */
  def hyperplaneSigSql(vCol: String, planes: Int = 8, dim: Int = 64): String = {
    val signs = hyperplaneSigns(planes, dim)
    (0 until planes).map { p =>
      val ordered = (0 until dim)
        .map(d => s"${if (signs(p)(d) > 0) "+" else "-"} $vCol[${d + 1}]")
        .mkString("0.0 ", " ", "")
      s"(CASE WHEN ($ordered) >= 0 THEN ${1 << p} ELSE 0 END)"
    }.mkString(" + ")
  }

  /** Exact brute-force cosine top-k: the first `nQueries` vectors are the
    * query set (broadcast), ranked per query on the 6-decimal-truncated
    * cosine with vec_id tie-break (deterministic cross-engine). Scoring uses
    * the fused codegen kernel (`graft.functions.CosineSimilarity`) — one
    * loop per pair, bit-identical to the HOF form (see
    * CosineSimilaritySpec) but without a lambda call per element. */
  def bruteForceTopK(spark: SparkSession, dir: String, qLo: Int = 0, qHi: Int = 10,
                     k: Int = 5, window: Boolean = false): DataFrame = {
    import graft.functions.VectorFunctions.cosine_sim
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val queries = emb.filter(col("vec_id") >= qLo && col("vec_id") < qHi)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val scored = emb.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        cosine_sim(col("qv"), col("v")).as("cos_raw"))
    topKByCosine(scored, k, window = window)
  }

  /** Embedding-table audit (x93): per label, the vector-quality gate a
    * pipeline runs before indexing/training on an embedding corpus —
    * row/dimension consistency, zero-norm (undefined-cosine) counts, and
    * the norm envelope. Norms are quantized with `floor(norm·1e6)`
    * (sqrt is correctly rounded per IEEE and the left-to-right
    * sum-of-squares fold is replicated by the oracle's list_aggregate —
    * the x09 argument), so every output column is integer-exact. Pure
    * per-row projection + one partial-agg'd shuffle on the tiny label
    * key. */
  def embeddingAudit(spark: SparkSession, dir: String): DataFrame = {
    val nrm = norm(asDouble(col("embedding")))
    val q = floor(nrm * lit(1000000.0)).cast("long")
    Tables.embeddings(spark, dir)
      .select(col("label"), size(col("embedding")).as("n_dims"), q.as("norm_q"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        countDistinct(col("n_dims")).as("n_distinct_dims"),
        sum(when(col("norm_q") === 0L, 1L).otherwise(0L)).as("n_zero_norm"),
        min(col("norm_q")).as("min_norm_q"), max(col("norm_q")).as("max_norm_q"))
  }

  /** Hard-negative mining (x79): for each labeled query vector, the k
    * MOST similar vectors with a DIFFERENT label — the contrastive-
    * training data-prep step (the negatives that sit closest to the
    * anchor are the ones a contrastive loss learns most from). Exact
    * brute-force scoring like x09 — the label filter composes into the
    * broadcast-join scan, so candidate pruning (label ≠) happens BEFORE
    * the cosine is evaluated; at 100 TB the same label filter drops into
    * the bucket-probe path (`lshTopK` / `ivfTopK` with a label predicate)
    * — this query pins the exact baseline those compose against, the
    * x09/x18 relationship. Per-query top-k prunes via WindowGroupLimit. */
  def hardNegativesTopK(spark: SparkSession, dir: String, qLo: Int = 0, qHi: Int = 10,
                        k: Int = 5): DataFrame = {
    import graft.functions.VectorFunctions.cosine_sim
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), asDouble(col("embedding")).as("v"))
    val queries = emb.filter(col("vec_id") >= qLo && col("vec_id") < qHi)
      .select(col("vec_id").as("q_id"), col("label").as("q_label"), col("v").as("qv"))
    val scored = emb.crossJoin(broadcast(queries))
      .filter(col("label") =!= col("q_label"))
      .select(col("q_id"), col("q_label"), col("vec_id"),
        col("label").as("neg_label"),
        trunc6(cosine_sim(col("qv"), col("v"))).as("cos_sim"))
    // window KEPT (r16 sweep): the output carries label columns the
    // (sk, id)-pair aggregate can't — recovering them would cost a second
    // corpus join, while WindowGroupLimit already bounds this window's
    // shuffle to ≤k rows per (query × mapper)
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos_sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Signed-random-hyperplane multi-probe LSH ANN: deterministic
    * pseudo-random hyperplanes derived from MurmurHash3(plane, dim) —
    * reproducible without any RNG state. Each query probes every bucket
    * within `probeRadius` Hamming distance of its own sign signature
    * (1 + 8 + 28 = 37 of 256 buckets at radius 2), and exact cosine
    * re-ranks within the probed candidates.
    *
    * Because the hyperplanes are plan-time CONSTANTS (not learned state),
    * the whole approximate algorithm — signatures, Hamming-ball probing,
    * re-rank — is SQL-expressible: `SparkEntry.oracleSql` bakes the same
    * ±1 matrix into DuckDB SQL via `hyperplaneSigSql`, so the oracle checks
    * the LSH semantics themselves, INCLUDING their recall behavior, not
    * just a lucky full-recall configuration. At 100 TB the plan holds —
    * probe fan-out is a driver-side constant (queries × 37 rows broadcast),
    * the corpus is scanned once to signature, and each query touches
    * ~37/256 of it instead of all of it. */
  def lshTopK(spark: SparkSession, dir: String, qLo: Int = 10, qHi: Int = 20,
              k: Int = 5, planes: Int = LshPlanes,
              probeRadius: Int = LshProbeRadius, window: Boolean = false): DataFrame = {
    val signs = hyperplaneSigns(planes)
    // all XOR masks within Hamming `probeRadius` of 0 — plan-time constant
    val masks: Seq[Int] =
      (0 until (1 << planes)).filter(m => Integer.bitCount(m) <= probeRadius)

    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("sig", graft.functions.HashSignatures.hyperplane_sig(col("v"), signs))
    val queries = emb.filter(col("vec_id") >= qLo && col("vec_id") < qHi)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("sig").as("qsig"))
      .withColumn("probe_sig",
        explode(array(masks.map(m => col("qsig").bitwiseXOR(lit(m))): _*)))
    // a corpus vector matches at most one mask per query (XOR is a bijection)
    // → no duplicate (q_id, vec_id) pairs, no dedup pass needed
    val scored = emb.join(broadcast(queries), col("sig") === col("probe_sig"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        graft.functions.VectorFunctions.cosine_sim(col("qv"), col("v")).as("cos_raw"))
    topKByCosine(scored, k, window = window)
  }

  /** IVF (inverted-file) ANN: MLlib KMeans partitions the corpus into
    * nCentroids cells; each query probes only its nProbe nearest cells and
    * exact-ranks within them. The 100 TB shape: the corpus is shuffled once
    * by cell id (a uniform small-int key), each query touches
    * nProbe/nCentroids of the data. Cosine ranking reuses the fused native
    * kernel. Probe selection is fully IN-PLAN: the query DF crosses the
    * (tiny, broadcast) centroid table, ranks cells with a window, keeps the
    * nProbe nearest — no driver-side collect of the queries, so the query
    * set can itself be a table of any size.
    *
    * nProbe is sized so measured recall is 1.0 on the evaluation corpus
    * (verified against `bruteForceTopK` at sf0.001/0.01/0.1 via
    * `graft.tools.RecallProbe`), so the oracle is the exact brute-force
    * top-k SQL. The evaluation embeddings are near-isotropic (top-5 cosine
    * ≈ 0.2-0.3), so recall-1 demands probing 14/16 cells here; on real
    * clustered embedding corpora the same machinery runs at nProbe ≪
    * nCentroids — the oracle gate is checking the cell-assignment /
    * probe-selection / re-rank dataflow, not the pruning win. */
  /** The fit-input pinning CONTRACT under `ivfTopK`'s determinism: KMeans
    * init sampling depends on the input's partitioning, so the fit input is
    * hashed to a FIXED partition count by vec_id and sorted within
    * partitions — the fitted centroids (and therefore recall measured by
    * RecallProbe, and x18's exact-oracle gate) are identical regardless of
    * the session's parallelism (local[4] vs local[32]). Only the fit pays
    * this shuffle; assignment (the corpus-sized path) stays on the scan's
    * own partitioning. Kept as a named method so the spec can assert the
    * partitioning+ordering (ScaleTechniquesSpec) — a refactor that silently
    * drops the pin breaks the test, not just the recall gate. */
  private[graft] def pinnedFitInput(df: DataFrame): DataFrame =
    df.repartition(8, col("vec_id")).sortWithinPartitions(col("vec_id"))

  def ivfTopK(spark: SparkSession, dir: String, qLo: Int = IvfQLo, qHi: Int = IvfQHi,
              k: Int = 5, nCentroids: Int = 16, nProbe: Int = 14,
              window: Boolean = false): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    import graft.functions.VectorFunctions.cosine_sim

    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val isQuery = col("vec_id") >= qLo && col("vec_id") < qHi
    val withVec = emb.withColumn("fv", array_to_vector(col("v")))
    val fitInput = pinnedFitInput(withVec)
    // few iterations suffice: cells only need to be roughly balanced, and
    // ranking within probed cells is exact regardless of centroid quality.
    // k-means|| init is kept deliberately: random init was measured to
    // degrade cells enough that sf0.001 needed nProbe=16/16 (no pruning)
    val model = new KMeans().setK(nCentroids).setSeed(42).setMaxIter(3)
      .setFeaturesCol("fv").setPredictionCol("cluster").fit(fitInput)
    val assigned = model.transform(withVec).select(col("vec_id"), col("v"), col("cluster"))

    // centroids are MODEL STATE (nCentroids × dim doubles on the driver,
    // like any fitted model), broadcast as a tiny table; squared-euclidean
    // cell ranking happens in-plan with the same left-to-right accumulation
    // order as a sequential loop, so ranking is deterministic
    val centroids = spark.createDataFrame(
      model.clusterCenters.toSeq.zipWithIndex.map { case (c, i) => (i, c.toArray.toSeq) })
      .toDF("cluster", "cv")
    val d2 = aggregate(zip_with(col("qv"), col("cv"), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)
    val pw = Window.partitionBy(col("q_id")).orderBy(col("d2"), col("cluster"))
    val queries = emb.filter(isQuery)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
      .crossJoin(broadcast(centroids))
      .withColumn("d2", d2)
      .withColumn("p_rank", row_number().over(pw))
      .filter(col("p_rank") <= nProbe)
      .select(col("q_id"), col("qv"), col("cluster"))

    val scored = assigned.join(broadcast(queries), Seq("cluster"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), cosine_sim(col("qv"), col("v")).as("cos_raw"))
    // no pair dedup needed: a vector lives in exactly one cell and the
    // (q_id, cluster) probe rows are distinct. The p_rank probe window
    // above stays a window ON PURPOSE: its frame is queries × nCentroids
    // (bounded by the cell count, not the corpus) — the aggregate buys
    // nothing there.
    topKByCosine(scored, k, window = window)
  }

  /** IVF over JL-projected vectors (the x60 → x18 composition): the
    * pre-ANN shrink pipeline `randomProjection` exists to feed. Index,
    * probe AND candidate-rank entirely in the `ProjDims`-dim projected
    * space (4× narrower vectors: cheaper KMeans fit, cheaper cell
    * assignment, 4× less candidate-scoring CPU and shuffle width), then
    * EXACT-rerank only the `k × rerankFactor` survivors per query in the
    * original 64-dim space. Output schema/semantics match `ivfTopK`
    * (top-k by truncated 64-dim cosine, vec_id tie-break), so recall is
    * measured against the same `bruteForceTopK` twin (`RecallProbe`
    * sweeps nProbe). HONEST CEILING on the evaluation corpus: the
    * near-isotropic eval embeddings (top-5 cosine ≈ 0.2–0.3, same
    * artifact already documented on x18/x60) make the 16-dim projected
    * RANKING nearly uninformative for the fine top-5 — covering the true
    * top-5 needs a survivor pool of up to 404/499 (measured, RECALL.md),
    * so at any practical rerankFactor recall < 1 HERE, while the
    * composition is exactly the right shape on real clustered corpora.
    * The spec therefore gates the restorable claim: with the pool
    * covering the corpus the output EQUALS bruteForceTopK (the rerank
    * restores everything the pool contains — recall loss is purely pool
    * coverage), and at the defaults every returned score is the exact
    * 64-dim truncated cosine.
    *
    * Scale shape: candidate generation never touches a 64-dim vector —
    * the corpus shuffles once by cell id carrying the 16-dim projection
    * only, and the survivor window shuffles (q_id, vec_id, p_sim) rows.
    * The rerank then re-reads the corpus scan filtered to the tiny
    * survivor set (broadcast semi-join → no shuffle) and scores against
    * broadcast query vectors — a documented second linear pass (the
    * x02/x49 trade) that costs one 2-column scan instead of riding
    * 64-dim payloads through the candidate shuffles. */
  def ivfProjectedTopK(spark: SparkSession, dir: String, qLo: Int = IvfQLo,
                       qHi: Int = IvfQHi, k: Int = 5, nCentroids: Int = 16,
                       nProbe: Int = IvfProjNProbe,
                       rerankFactor: Int = IvfRerankFactor): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    import graft.functions.VectorFunctions.cosine_sim

    val isQuery = col("vec_id") >= qLo && col("vec_id") < qHi
    val projected = Tables.embeddings(spark, dir)
      .select(col("vec_id"), jlProjection(asDouble(col("embedding"))).as("pv"))
    val withVec = projected.withColumn("fv", array_to_vector(col("pv")))
    val model = new KMeans().setK(nCentroids).setSeed(42).setMaxIter(3)
      .setFeaturesCol("fv").setPredictionCol("cluster")
      .fit(pinnedFitInput(withVec))
    val assigned = model.transform(withVec)
      .select(col("vec_id"), col("pv"), col("cluster"))

    val centroids = spark.createDataFrame(
      model.clusterCenters.toSeq.zipWithIndex.map { case (c, i) => (i, c.toArray.toSeq) })
      .toDF("cluster", "cv")
    val d2 = aggregate(zip_with(col("qpv"), col("cv"), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)
    val pw = Window.partitionBy(col("q_id")).orderBy(col("d2"), col("cluster"))
    val probes = projected.filter(isQuery)
      .select(col("vec_id").as("q_id"), col("pv").as("qpv"))
      .crossJoin(broadcast(centroids))
      .withColumn("d2", d2)
      .withColumn("p_rank", row_number().over(pw))
      .filter(col("p_rank") <= nProbe)
      .select(col("q_id"), col("qpv"), col("cluster"))

    // candidate ranking in projected space: top k·rerankFactor per query.
    // Window KEPT (r16 sweep): p_sim is the RAW projected cosine, not on
    // the trunc6 grid — forcing it onto an integer grid for the pair
    // aggregate would create ties the shipped semantics don't have; the
    // final rerank below operates on the bounded k·rerankFactor pool
    val cw = Window.partitionBy(col("q_id")).orderBy(col("p_sim").desc, col("vec_id"))
    val survivors = assigned.join(broadcast(probes), Seq("cluster"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        cosine_sim(col("qpv"), col("pv")).as("p_sim"))
      .withColumn("p_rank", row_number().over(cw))
      .filter(col("p_rank") <= k * rerankFactor)
      .select(col("q_id"), col("vec_id"))

    // exact 64-dim rerank of the survivors only
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val qvecs = emb.filter(isQuery).select(col("vec_id").as("q_id"), col("v").as("qv"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos_sim").desc, col("vec_id"))
    emb.join(broadcast(survivors), Seq("vec_id"))
      .join(broadcast(qvecs), Seq("q_id"))
      .select(col("q_id"), col("vec_id"), trunc6(cosine_sim(col("qv"), col("v"))).as("cos_sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** `ivfProjectedTopK` defaults: probe count in projected space and the
    * survivor multiple the 64-dim rerank re-scores. The probe count
    * matches `ivfTopK`'s default so the two variants are directly
    * comparable; it does NOT buy recall 1.0 here — RECALL.md measures
    * 47–49/50 of the brute-force top-k missing at these defaults on the
    * near-isotropic evaluation corpus, where 16-dim projected rankings
    * barely correlate with 64-dim truth. Recall 1.0 holds only when the
    * survivor pool covers the corpus (the spec-gated full-pool claim);
    * the rerank scores themselves are exact either way. */
  val IvfProjNProbe: Int = 14
  val IvfRerankFactor: Int = 4

  /** Quantization scale for `labelCentroids` (x52), shared with the
    * oracle SQL: floor(x·10⁶) maps each float to an exact long. */
  val CentroidQuantScale: Int = 1000000

  /** x60's target dimensionality. 16 on purpose: the JL scale 1/√16 =
    * 0.25 is a power of two, so the final scaling multiply is EXACT. */
  val ProjDims: Int = 16

  /** Johnson–Lindenstrauss random projection (x60): embed 64-dim vectors
    * into `rDims` dimensions with the deterministic ±1 sign matrix
    * (`hyperplaneSigns` — same reproducible constants as x10) scaled by
    * 1/√rDims — the dimensionality-reduction stage that shrinks vectors
    * 4× before ANN indexing / near-dup hashing at scale. Sparse ±1
    * projections (Achlioptas) need no dense Gaussian matrix and keep
    * every arithmetic step a left-to-right chain of IEEE adds — the same
    * grammar-pinned ordering as `hyperplaneSigSql`, so the oracle
    * replicates every output double bit-for-bit. Pure per-row
    * projection: no shuffle, stays in WholeStageCodegen. */
  /** The x60 projection's output columns, one per projected dimension —
    * shared by the flat x60 query and the array packaging below so both
    * produce identical doubles. */
  private def jlChains(v: Column, rDims: Int): Seq[Column] = {
    val signs = hyperplaneSigns(rDims, 64)
    val scale = 1.0 / math.sqrt(rDims.toDouble)
    (0 until rDims).map { j =>
      val chain = (0 until 64).foldLeft(lit(0.0): Column)((acc, d) =>
        if (signs(j)(d) > 0) acc + v(d) else acc - v(d))
      chain * lit(scale)
    }
  }

  /** The x60 projection as an array Column — the form ANN consumers
    * compose with ([[ivfProjectedTopK]]): same deterministic ±1 sign
    * matrix, same grammar-pinned left-to-right add chains, packaged as
    * one `array<double>` of length `rDims`. */
  private[graft] def jlProjection(v: Column, rDims: Int = ProjDims): Column =
    array(jlChains(v, rDims): _*)

  def randomProjection(spark: SparkSession, dir: String, rDims: Int = ProjDims): DataFrame = {
    // flat columns straight from the shared chains — NOT array+getItem:
    // that form optimizes to the same plan, but the optimizer has to fold
    // rDims² chains per run (measured ~2.6 s of pure planning at rDims=16)
    val cols = jlChains(asDouble(col("embedding")), rDims)
      .zipWithIndex.map { case (c, j) => c.as(s"p$j") }
    Tables.embeddings(spark, dir).select(col("vec_id") +: cols: _*)
  }

  /** Per-label embedding centroids (x52): the class-prototype /
    * cluster-summary computation of an embedding pipeline, in long format
    * (label, dim, n_vecs, sum_q, centroid_q).
    *
    * Vectors are QUANTIZED to longs first — cast-to-double (exact),
    * one correctly-rounded multiply by 10⁶, floor (exact) — so the
    * per-dimension sums are integer and ORDER-INDEPENDENT: a double
    * vector sum depends on accumulation order (unverifiable and
    * nondeterministic under retries at scale); the quantized sum is
    * bit-exact in any engine, and the final centroid is one double
    * division per dimension. Aggregation is `ArrayLongSum`: one
    * dim-length array per group of O(k·mappers) state, map-side
    * combining — the corpus is never exploded to (row × dim) and the
    * one shuffle carries arrays, not elements. The tiny post-agg result
    * (labels × dims) is what explodes. */
  def labelCentroids(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.ArrayLongSum.array_long_sum
    val q = Tables.embeddings(spark, dir).select(col("label"),
      transform(col("embedding"),
        x => floor(x.cast("double") * lit(CentroidQuantScale.toDouble)).cast("long")).as("qv"))
    q.groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"), array_long_sum(col("qv")).as("sums"))
      .select(col("label"), col("n_vecs"), posexplode(col("sums")).as(Seq("dim", "sum_q")))
      .select(col("label"), col("dim").cast("long").as("dim"), col("n_vecs"), col("sum_q"),
        (col("sum_q").cast("double") / col("n_vecs")).as("centroid_q"))
  }

  /** k for [[mutualTopK]] (x178) — shared with the DuckDB oracle. */
  val MutualK: Int = 3

  /** Quantization reconstruction-error audit (x187): the DISTORTION half
    * of the int8 story — x175 measures whether the quantized RANKING
    * still agrees with float; this measures how far the quantized
    * VECTORS sit from the originals, per label (the per-collection
    * distortion budget an embedding-store owner tracks before flipping
    * a collection to int8). Per vector: reconstruct `q · (scale/127)`,
    * sum |x − x̂| left-to-right, truncate to integer micro-units
    * (floor ·10⁶ — exact IEEE composition); per label publish the
    * vector count, the summed micro-error (exact BIGINT fold of exact
    * integers), and the worst single vector. One scan, one tiny-key
    * partial-agg'd shuffle, everything element-wise codegen'd HOFs. */
  def quantizationError(spark: SparkSession, dir: String): DataFrame = {
    val levels = lit(QuantLevels.toDouble)
    val perVec = Tables.embeddings(spark, dir)
      .select(col("label"), asDouble(col("embedding")).as("v"))
      .withColumn("scale",
        aggregate(col("v"), lit(0.0), (acc, x) => greatest(acc, abs(x))))
      .withColumn("step", col("scale") / levels)
      .withColumn("err",
        aggregate(
          transform(col("v"), x =>
            abs(x - floor(x / col("scale") * levels + lit(0.5)) * col("step"))),
          lit(0.0), (acc, e) => acc + e))
      .select(col("label"),
        floor(col("err") * lit(1000000.0)).cast("long").as("err_micro"))
    perVec.groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(col("err_micro")).as("sum_err_micro"),
        max(col("err_micro")).as("max_err_micro"))
  }

  /** Reciprocal-nearest-neighbor pairs (x178): (u, v) such that v is in
    * u's exact top-k AND u is in v's — the high-precision near-dup /
    * entity-match candidate rule (a one-directional top-k hit can be an
    * artifact of a dense hub; a RECIPROCAL hit means both sides agree
    * they are each other's closest mass — the standard mutual-kNN
    * filter in image dedup and re-ranking). Scoring is x09's exact
    * contract (trunc6 cosine, ties to smaller vec_id) over EVERY
    * ordered pair, so this is the exact baseline any ANN backend must
    * reproduce: swap the scored frame for x10's LSH or x18's IVF probe
    * output and the mutual filter composes unchanged — that
    * substitution is the 100 TB path (the x09↔x18 relationship), with
    * the broadcast side here playing the role of the in-RAM index an
    * ANN server holds by design.
    *
    * Plan shape: reads the STAGED exact neighbor table ([[KnnStage]] —
    * the O(N²) scoring paid once per snapshot; a rank ≤ k filter of the
    * staged top-StageK is identical to a direct top-k computation by
    * the shared ranking contract), then the tiny O(N·k) ranked frame
    * self-joins on the reversed pair, keyed on (q, v) directly. */
  def mutualTopK(spark: SparkSession, dir: String, k: Int = MutualK,
                 rankedTable: (SparkSession, String, Int) => DataFrame =
                   KnnStage.ranked(_, _, _)): DataFrame = {
    val ranked = rankedTable(spark, dir, math.max(k, KnnStage.StageK))
      .filter(col("rank") <= k)
    ranked.as("f").join(ranked.as("r"),
        col("f.q_id") === col("r.vec_id") && col("f.vec_id") === col("r.q_id") &&
          col("f.q_id") < col("f.vec_id"))
      .select(col("f.q_id").as("u"), col("f.vec_id").as("v"),
        col("f.rank").as("rank_uv"), col("r.rank").as("rank_vu"),
        col("f.cos_sim").as("cos_sim"))
  }

  /** Quantization levels for [[quantizedRecall]] (x175): symmetric int8 —
    * each vector is scaled by its own max-|x| so the largest component
    * maps to ±127. Shared with the DuckDB oracle (the LshPlanes
    * contract). */
  val QuantLevels: Int = 127

  /** int8 scalar-quantization recall audit (x175): how much ANN ranking
    * fidelity survives 4× vector compression. Each embedding is
    * quantized per-vector (`round-half-up(x / max|x| · 127)` — the
    * floor(+0.5) form, a composition of exact IEEE ops identical in
    * both engines), queries are ranked by BOTH the exact float cosine
    * (x09's contract: trunc6, ties to smaller vec_id) and the quantized
    * cosine over the integer vectors, and the audit publishes, per
    * query, the top-k overlap (`n_hits`, recall) plus the quantized
    * ranks of the exact top-k (`quant_rank_sum` — k·(k+1)/2 = 15 means
    * perfect order preservation; larger means displacement). This is
    * the measured-fidelity artifact (the x130/RECALL.md discipline) for
    * the memory-compression path: at 100 TB an int8 index is what
    * actually fits in RAM, and this query is the gate that says the
    * compressed ranking still agrees with float.
    *
    * Exactness: quantized components are integers ≤ 127, so Σq², q·q
    * dot products (≤ 64·127² ≪ 2⁵³) are order-independent exact doubles;
    * the quantized cosine is then the same 3-IEEE-op expression in both
    * engines, trunc6'd like the float side. Plan (r18, verdict task 6):
    * three linear broadcast-join passes over the scored frame — both
    * top-k sets via ONE bounded-aggregate groupBy, then the k·Q exact
    * picks rejoined for their quant cosines and their quant-order
    * predecessors counted — no per-query full-rank window, so no task
    * ever sorts the corpus (the former single-task-sort-per-query shape
    * survives only as the `window = true` bit-identity twin). */
  def quantizedRecall(spark: SparkSession, dir: String, qLo: Int = 0, qHi: Int = 10,
                      k: Int = 5, window: Boolean = false): DataFrame = {
    import graft.functions.VectorFunctions.cosine_sim
    val levels = lit(QuantLevels.toDouble)
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("scale",
        aggregate(col("v"), lit(0.0), (acc, x) => greatest(acc, abs(x))))
      .withColumn("q",
        transform(col("v"),
          x => floor(x / col("scale") * levels + lit(0.5)).cast("double")))
      .drop("scale")
    val queries = emb.filter(col("vec_id") >= qLo && col("vec_id") < qHi)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("q").as("qq"))
    val scored = emb.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        trunc6(cosine_sim(col("qv"), col("v"))).as("cos_exact"),
        trunc6(cosine_sim(col("qq"), col("q"))).as("cos_quant"))
    if (window) {
      // the r16-era full-rank twin, kept ONLY for the bit-identity spec:
      // each q_id task sorts the whole corpus — at 100× that is a
      // single-task corpus sort per query, which is why it no longer ships
      val we = Window.partitionBy(col("q_id")).orderBy(col("cos_exact").desc, col("vec_id"))
      val wq = Window.partitionBy(col("q_id")).orderBy(col("cos_quant").desc, col("vec_id"))
      scored
        .withColumn("rank_exact", row_number().over(we))
        .withColumn("rank_quant", row_number().over(wq))
        .groupBy(col("q_id"))
        .agg(
          sum(when(col("rank_exact") <= k && col("rank_quant") <= k, 1L).otherwise(0L))
            .as("n_hits"),
          sum(when(col("rank_exact") <= k, col("rank_quant")).otherwise(0L))
            .as("quant_rank_sum"))
        .select(col("q_id"), lit(k).as("k"), col("n_hits"),
          (col("n_hits").cast("double") / lit(k.toDouble)).as("recall"),
          col("quant_rank_sum"))
    } else {
      // Shipping form (r17 verdict task 6): the r16 sweep kept full-rank
      // windows because quant_rank_sum reads rank_quant values up to
      // corpus size — but only for the k EXACT-top picks per query, and a
      // rank is just 1 + its predecessor count under the same total order
      // ((cos_quant desc, vec_id), the window's ORDER BY). So: both
      // top-k sets in ONE bounded-aggregate pass (n_hits = k-set
      // overlap), then the k·Q picks broadcast back against the scored
      // scan and their quant predecessors COUNTED — three linear
      // broadcast-join scans, partial-combining aggregates, and no task
      // ever sorts more than it maps. Bit-identical to the window twin
      // (spec-asserted; the oracle is unchanged and hash-gates both).
      import graft.functions.TopKLongPairs.top_k_long_pairs
      def gridKey(c: Column): Column = -round(c * lit(1000000.0)).cast("long")
      // scan 1: exact AND quant top-k in one groupBy (the onGrid round
      // contract of [[topKByCosine]] — trunc6 values recover their grid
      // integer exactly, so the long key preserves the double order)
      val tops = scored.groupBy(col("q_id"))
        .agg(
          top_k_long_pairs(gridKey(col("cos_exact")), col("vec_id"), k).as("te"),
          top_k_long_pairs(gridKey(col("cos_quant")), col("vec_id"), k).as("tq"))
        .localCheckpoint() // Q rows of 2k pairs — bounded model-state size
      // n_hits is pure per-row array arithmetic on the Q-row tops frame —
      // both k-sets are already in hand, so the overlap never joins
      val nHits = tops.select(col("q_id").as("pq_id"),
        size(array_intersect(col("te.id"), col("tq.id"))).cast("long").as("n_hits"))
      val exPicks = tops.select(col("q_id").as("pq_id"),
        explode(col("te.id")).as("pick_id"))
      // scan 2: the picks' own quant cosines (k·Q rows survive the join)
      val pickCq = scored
        .select(col("q_id").as("pq_id"), col("vec_id").as("pick_id"),
          col("cos_quant").as("pick_cq"))
        .join(broadcast(exPicks), Seq("pq_id", "pick_id"))
      // scan 3: predecessor count per pick under (cos_quant desc, vec_id)
      // — rank_quant of pick p is 1 + |{u : cq_u > cq_p ∨ (cq_u = cq_p ∧
      // u < p)}|, the row_number definition without the sort
      val pred = scored.join(broadcast(pickCq), col("q_id") === col("pq_id"))
        .filter(col("cos_quant") > col("pick_cq") ||
          (col("cos_quant") === col("pick_cq") && col("vec_id") < col("pick_id")))
        .groupBy(col("pq_id"), col("pick_id"))
        .agg(count(lit(1)).as("n_before"))
      val quantRankSum = pickCq.select(col("pq_id"), col("pick_id"))
        .join(pred, Seq("pq_id", "pick_id"), "left")
        .groupBy(col("pq_id"))
        .agg(sum(coalesce(col("n_before"), lit(0L)) + lit(1L)).as("quant_rank_sum"))
      nHits.join(quantRankSum, Seq("pq_id"))
        .select(col("pq_id").as("q_id"), lit(k).as("k"), col("n_hits"),
          (col("n_hits").cast("double") / lit(k.toDouble)).as("recall"),
          col("quant_rank_sum"))
    }
  }

  /** The exact all-pairs ranked top-k — [[KnnStage]]'s compute path.
    * x09's scoring contract (trunc6 cosine, ties to smaller vec_id)
    * over EVERY ordered pair: one corpus scan crossed against the
    * broadcast vector table, per-vector top-k via the bounded
    * [[topKByCosine]] aggregate — on the engine's LARGEST candidate
    * frame (N² pairs) the swap matters most: no mapper-local sort of
    * the pair frame, O(mappers·N·2k) pairs shuffled. This is the O(N²)
    * step the stage pays once per snapshot; at 100 TB an ANN index
    * build replaces it (the x09↔x18 relationship) and exports the same
    * (q_id, vec_id, cos_sim, rank) table. */
  private[graft] def computeRankedTopK(spark: SparkSession, dir: String,
                                       k: Int): DataFrame =
    computeRankedTopK(Tables.embeddings(spark, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("v")), k)

  /** Frame-based overload — the unit the streaming kNN ingester
    * bootstraps from (`streaming.VectorStream`). Input: (vec_id, v). */
  private[graft] def computeRankedTopK(emb: DataFrame, k: Int,
                                       window: Boolean = false): DataFrame = {
    import graft.functions.VectorFunctions.cosine_sim
    val side = emb.select(col("vec_id").as("q_id"), col("v").as("qv"))
    val scored = emb.crossJoin(broadcast(side))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        cosine_sim(col("qv"), col("v")).as("cos_raw"))
    topKByCosine(scored, k, window = window)
  }

  /** k for [[lshRecallCurve]] (x202) — shared with the DuckDB oracle. */
  val LshCurveK: Int = 5

  /** Query-sample keep rate (basis points of 10000) for the fidelity
    * audits' bounded-cost production mode (x232/x233/x234) — shared
    * with the DuckDB oracle. The full audits (x202/x221/x225) run every
    * vector as a query, which is the right gate-scale contract but
    * unrunnable at 100×; the sampled mode keeps a deterministic
    * md5-bucket subset (x27's split rule, salt "qsample") so audit cost
    * is a DIAL, and sampled ≡ full restricted to the sample —
    * spec-proven, since the per-query panels are independent across
    * queries (restriction commutes with the rollups). */
  val AuditSampleBps: Int = 4000

  /** Keep rate for the SAMPLED Matryoshka audit (x282) — smaller than
    * [[AuditSampleBps]] because x238's scored pass carries
    * |MatryoshkaDims| prefix cosines per (query, candidate) pair, so at
    * the same rate its oracle replay costs ~4× x233's; 10% keeps the
    * sf1 replay inside the same budget the other sampled audits meet
    * (the r16 skip-list closure). Same salt, same rule — only the
    * dial differs. */
  val MatryoshkaSampleBps: Int = 1000

  /** x27's deterministic keep predicate on a query id (salt isolates
    * this use-site from the doc split/sample buckets). */
  private def inQuerySample(id: Column, bps: Int): Column =
    Sampling.hashBucket(id, "qsample") < bps

  /** Restrict a frame to sampled query ids when a rate is given. */
  private def sampleQueries(df: DataFrame, idCol: String,
                            bps: Option[Int]): DataFrame =
    bps.fold(df)(b => df.filter(inQuerySample(col(idCol), b)))

  /** x202's radius-tagged candidate frame, pre-checkpoint — every
    * (query, corpus vector) pair within Hamming radius `maxRadius` of
    * the query's signature, carrying the smallest radius `d` that
    * admits it plus one exploded row per radius in [d, maxRadius].
    * Input `emb` must carry (vec_id, v, sig). The probe join is a
    * PLAIN equi-join on the probed signature — [[AnnStage]]'s shape:
    * the query side here is the whole corpus × ~37 probe masks, so a
    * forced broadcast would ship 37N rows to every executor; unhinted,
    * it shuffles on the signature and AQE broadcasts only when the
    * runtime size is genuinely tiny. Plan-asserted hint-free in
    * ScaleTechniquesSpec. */
  private[graft] def lshCurveCandidates(emb: DataFrame, planes: Int,
                                        maxRadius: Int,
                                        querySampleBps: Option[Int] = None): DataFrame = {
    import graft.functions.VectorFunctions.cosine_sim
    val masks: Seq[Int] =
      (0 until (1 << planes)).filter(m => Integer.bitCount(m) <= maxRadius)
    val queries = sampleQueries(emb, "vec_id", querySampleBps)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("sig").as("qsig"))
      .withColumn("probe_sig",
        explode(array(masks.map(m => col("qsig").bitwiseXOR(lit(m))): _*)))
    emb.join(queries, col("sig") === col("probe_sig"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        trunc6(cosine_sim(col("qv"), col("v"))).as("cos_sim"),
        expr("bit_count(sig ^ qsig)").as("d"))
      .withColumn("radius", explode(expr(s"sequence(d, $maxRadius)")))
      .withColumn("radius", col("radius").cast("long"))
  }

  /** LSH recall-vs-probe-radius curve (x202): for EVERY vector as a
    * query, the top-k recall of hyperplane LSH at each Hamming probe
    * radius 0..[[LshProbeRadius]] against the exact top-k — the
    * knob-tuning artifact behind x10's fixed-radius configuration (the
    * x130/RECALL.md measured-fidelity discipline, extended from a
    * point to the CURVE: radius buys recall at candidate-count cost,
    * and this table is what that tradeoff decision reads). Radius
    * nesting is exploited: each candidate carries its signature
    * Hamming distance d and fans out only to radii ≥ d
    * (`sequence(d, R)`), so the three per-radius rankings share ONE
    * scored frame. The exact side reads the STAGED neighbor table
    * ([[KnnStage]]), so the expensive baseline is already paid.
    *
    * 100 TB shape: one corpus scan to signature, the probe join keys
    * on the bucket signature (each query touches its Hamming ball,
    * ~37/256 of the corpus at radius 2), rankings partition by
    * (query, radius), rollups are per-radius partial aggs; the 1-row
    * vector count is the documented scalar cross. */
  def lshRecallCurve(spark: SparkSession, dir: String, k: Int = LshCurveK,
                     planes: Int = LshPlanes,
                     maxRadius: Int = LshProbeRadius,
                     querySampleBps: Option[Int] = None): DataFrame = {
    val signs = hyperplaneSigns(planes)
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("sig", graft.functions.HashSignatures.hyperplane_sig(col("v"), signs))
    val cand = lshCurveCandidates(emb, planes, maxRadius, querySampleBps)
      .localCheckpoint() // read by the candidate rollup and the rank path
    // window KEPT (r16 sweep): the frame partitions by the COMPOSITE
    // (q_id, radius) key and is cut by localCheckpoint to one audit-sized
    // candidate table read twice; WindowGroupLimit bounds the rank pass
    val ranked = cand.withColumn("rk", row_number().over(
        Window.partitionBy(col("q_id"), col("radius"))
          .orderBy(col("cos_sim").desc, col("vec_id"))))
      .filter(col("rk") <= k)
    val exact = KnnStage.ranked(spark, dir, math.max(k, KnnStage.StageK))
      .filter(col("rank") <= k).select(col("q_id"), col("vec_id"))
    val hits = ranked.join(exact, Seq("q_id", "vec_id"), "left_semi")
      .groupBy(col("radius")).agg(count(lit(1)).as("n_hits"))
    val cands = cand.groupBy(col("radius"))
      .agg(count(lit(1)).as("n_candidates"))
    val tot = sampleQueries(emb, "vec_id", querySampleBps)
      .agg(count(lit(1)).as("n_queries"))
    spark.range(0L, maxRadius + 1L).select(col("id").as("radius"))
      .join(broadcast(cands), Seq("radius"), "left")
      .join(broadcast(hits), Seq("radius"), "left")
      .crossJoin(broadcast(tot))
      .select(col("radius"), col("n_queries"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .withColumn("recall_ppm",
        expr(s"(1000000L * n_hits) div (${k}L * n_queries)"))
      .withColumn("avg_candidates", expr("n_candidates div n_queries"))
  }

  /** Day-2 batch modulus for [[knnIngest]] (x203): vec_id mod 5 == 4 is
    * the "newly arrived" 20% — shared with the DuckDB oracle (which
    * recomputes the FULL corpus ranking; the split exists only on the
    * Spark side, where the point is the incremental plan). */
  val KnnIngestMod: Int = 5

  /** Incrementally merge an existing exact top-k table with a new
    * vector batch — the [[KnnStage]] maintenance rule. Soundness: for
    * an EXISTING query q, any vector outside q's old top-k and outside
    * the new batch W still ranks below q's old k-th neighbor, so q's
    * new list is the re-rank of (old list ∪ q×W scores); new-batch
    * queries score against the full corpus. Total work O(|U|·|W|)
    * instead of the O(|U|²) rebuild — the reason an embedding store
    * ingests daily instead of re-indexing, with the artifact REWRITTEN
    * (lists mutate) but the scoring cost proportional to the delta. */
  private[graft] def mergeRanked(oldRanked: DataFrame, oldEmb: DataFrame,
                                 newEmb: DataFrame, k: Int): DataFrame = {
    import graft.functions.VectorFunctions.cosine_sim
    val all = oldEmb.union(newEmb)
    val newQ = newEmb.select(col("vec_id").as("q_id"), col("v").as("qv"))
    val newLists = all.crossJoin(broadcast(newQ))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        trunc6(cosine_sim(col("qv"), col("v"))).as("cos_sim"))
    val oldVsNew = oldEmb.crossJoin(
        broadcast(newEmb.select(col("vec_id").as("w_id"), col("v").as("wv"))))
      .select(col("vec_id").as("q_id"), col("w_id").as("vec_id"),
        trunc6(cosine_sim(col("v"), col("wv"))).as("cos_sim"))
    // every input here is ALREADY on the trunc6 grid (the stored artifact
    // and two freshly-truncated score frames), so the merge re-rank keys
    // on round(cos·10⁶) — the onGrid contract of [[topKByCosine]]
    topKByCosine(oldRanked.select(col("q_id"), col("vec_id"), col("cos_sim"))
      .union(oldVsNew).union(newLists)
      .withColumnRenamed("cos_sim", "cos_raw"), k, onGrid = true)
  }

  /** Incremental exact-kNN ingest (x203): split the corpus into the
    * "yesterday" 80% and the day-2 batch (vec_id mod [[KnnIngestMod]]),
    * build the exact top-k on the old corpus, MERGE the new batch via
    * [[mergeRanked]], and publish the full merged table — which the
    * oracle checks against the from-scratch full-corpus ranking. The
    * staged-artifact family's incremental story (x96 band index, x98
    * clusters, term ingest) applied to the most expensive artifact:
    * day-2 cost is O(N·|W|) scoring plus an O(N·k) artifact rewrite,
    * never the O(N²) rebuild. */
  def knnIngest(spark: SparkSession, dir: String,
                k: Int = KnnStage.StageK): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val isNew = pmod(col("vec_id"), lit(KnnIngestMod.toLong)) === (KnnIngestMod - 1)
    val oldEmb = emb.filter(!isNew).localCheckpoint()
    val newEmb = emb.filter(isNew).localCheckpoint()
    // yesterday's artifact, already paid — the same all-pairs unit
    // KnnStage computes, checkpointed as the merge's base table
    val day1 = computeRankedTopK(oldEmb, k).localCheckpoint()
    mergeRanked(day1, oldEmb, newEmb, k)
  }

  /** x207 knobs: the iteration-vector scale (2^11 — sized so every
    * intermediate product fits BIGINT exactly: |raw| ≤ N·127·64·127·2048
    * ≈ 2^42 at gate scale, raw·scale ≤ 2^53) and the pinned iteration
    * count (unrolled in the oracle — the x77/x180 convention). */
  val PiScale: Long = 2048L
  val PiIters: Int = 4

  /** Integer-exact distributed power iteration (x207): the top
    * (right-)singular direction of the int8-quantized embedding matrix
    * — the dominant direction an embedding-debiasing/whitening audit
    * removes first, computed as pinned-round power iteration
    * `v ← rescale(Qᵀ(Q v))` in EXACT integer arithmetic. Every step is
    * order-independent: the embeddings are quantized per-vector to
    * ints ≤ 127 (x175's rule), v lives on a 2^11 integer grid, dots
    * and the per-dimension accumulations are BIGINT sums of bounded
    * products, and the rescale divides |raw|·2^11 by max|raw| with an
    * explicit sign split (positive-only `div`, both engines floor
    * identically — the negative-div trap from x117's doc). The 2^11
    * grid costs ~0.05% direction precision per round and buys full
    * cross-engine determinism — the x175 tradeoff applied to the
    * ITERATION state instead of the data.
    *
    * 100 TB shape (r18 rewrite): the 64-long iteration vector is
    * BOUNDED MODEL STATE (the codebook-collect class), so each round is
    * ONE ungrouped 64-column partial aggregate over the corpus — the
    * per-row dot against the 64 in-plan literals fuses into the scan
    * projection, Qᵀ(Qv) partial-combines map-side, and exactly 64 longs
    * cross to the driver per round. No corpus shuffle at any scale
    * (the previous form shuffled the exploded (vec, d) table through a
    * groupBy(vec_id) + a join every round). The rescale runs on the
    * driver with the same positive-only floor-division split; integer
    * sums are associative, so the result is bit-identical to the
    * distributed form (spec: exact driver replay). At 10⁹ rows the
    * BIGINT bound needs the per-dimension sum promoted to DECIMAL
    * internally (the x152 discipline) or a pre-scaled dot — documented,
    * not needed at gate scale. */
  def powerIteration(spark: SparkSession, dir: String, iters: Int = PiIters,
                     scale: Long = PiScale): DataFrame = {
    val levels = lit(QuantLevels.toDouble)
    val dim = 64
    val qd = Tables.embeddings(spark, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("sc",
        aggregate(col("v"), lit(0.0), (acc, x) => greatest(acc, abs(x))))
      // sc=0 (all-zero embedding) would give NaN components, which the two
      // engines disagree on (Spark casts NaN→0, DuckDB floor(NaN) errors) —
      // degrade identically to the all-zero quantized vector instead
      .withColumn("q",
        transform(col("v"), x =>
          when(col("sc") === lit(0.0), lit(0L))
            .otherwise(floor(x / col("sc") * levels + lit(0.5)).cast("long"))))
      .select(col("q"))
      .localCheckpoint() // read once per iteration, every iteration
    var v: Array[Long] = Array.tabulate(dim)(d => if (d == 0) scale else 0L)
    for (_ <- 1 to iters) {
      val dot = (0 until dim).map(d => col("q").getItem(d) * lit(v(d)))
        .foldLeft(lit(0L): Column)(_ + _)
      val sums = (0 until dim).map(d =>
        sum(col("q").getItem(d) * col("dot")).as(s"r$d"))
      val row = qd.select(col("q"), dot.as("dot"))
        .agg(sums.head, sums.tail: _*).head()
      val raw = Array.tabulate(dim)(row.getLong)
      val m = raw.map(math.abs).max
      // m=0 means Qv collapsed to the zero vector (degenerate corpus):
      // hold v at zero rather than divide by zero — same CASE in the oracle
      v = raw.map(r =>
        if (m == 0L) 0L
        else if (r >= 0L) r * scale / m
        else -((-r) * scale / m))
    }
    import spark.implicits._
    v.toSeq.zipWithIndex.map { case (x, d) => (d, x) }
      .toDF("dim", "v_scaled")
  }

  /** kNN label homophily (x191): per label, how often a vector's exact
    * top-k neighbors share its label — the standard intrinsic audit of
    * an embedding space before using it for classification-by-
    * retrieval or semantic dedup (homophily ≈ 1/n_labels means the
    * space carries no label signal; the per-label breakdown exposes
    * which collections are well-separated). Reads the STAGED neighbor
    * table ([[KnnStage]]); the only other input is the O(N) label
    * table, broadcast onto both endpoints. n_slots = n_vecs·k exactly
    * (every vector has k neighbors when N > k); homophily is published
    * as an integer ppm ratio (the engine-wide exact-ratio rule). */
  def knnHomophily(spark: SparkSession, dir: String,
                   k: Int = KnnStage.StageK,
                   rankedTable: (SparkSession, String, Int) => DataFrame =
                     KnnStage.ranked(_, _, _)): DataFrame = {
    val labels = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("id"), col("label"))
    val r = rankedTable(spark, dir, math.max(k, KnnStage.StageK))
      .filter(col("rank") <= k)
    r.join(broadcast(labels).as("ql"), col("q_id") === col("ql.id"))
      .withColumnRenamed("label", "q_label").drop("id")
      .join(broadcast(labels).as("nl"), col("vec_id") === col("nl.id"))
      .groupBy(col("q_label"))
      .agg(countDistinct(col("q_id")).as("n_vecs"),
        count(lit(1)).as("n_slots"),
        sum(when(col("label") === col("q_label"), 1L).otherwise(0L))
          .as("n_same"))
      .withColumn("homophily_ppm",
        expr("(1000000L * n_same) div n_slots"))
  }

  /** kNN hubness audit (x192): the in-degree histogram of the exact
    * kNN graph — how many vectors appear in d other vectors' top-k
    * lists, for each d. Hubness (a few vectors with huge in-degree,
    * many with zero) is the classic high-dimensional ANN pathology: a
    * hub poisons retrieval quality and dedup precision, and the
    * histogram's skew is the number an embedding-store owner tracks
    * across model versions. Reads the STAGED table; the in-degree agg
    * is one partial-agg'd shuffle on vec_id, the zero-in-degree band
    * recovered by a broadcast left anti-style join from the vector
    * universe. */
  def knnHubness(spark: SparkSession, dir: String,
                 k: Int = KnnStage.StageK,
                 rankedTable: (SparkSession, String, Int) => DataFrame =
                   KnnStage.ranked(_, _, _)): DataFrame = {
    val indeg = rankedTable(spark, dir, math.max(k, KnnStage.StageK))
      .filter(col("rank") <= k)
      .groupBy(col("vec_id")).agg(count(lit(1)).as("in_deg"))
    Tables.embeddings(spark, dir).select(col("vec_id"))
      .join(indeg, Seq("vec_id"), "left")
      .withColumn("in_deg", coalesce(col("in_deg"), lit(0L)))
      .groupBy(col("in_deg"))
      .agg(count(lit(1)).as("n_vecs"),
        min(col("vec_id")).as("min_vec_id"),
        max(col("vec_id")).as("max_vec_id"))
  }

  /** x224 knobs: arrival-batch count (vec_id ranges — x125's arrival
    * proxy on the vector table) and the milli-unit centroid scale.
    * Shared with the DuckDB oracle. */
  val DriftBatches: Int = 4
  val DriftScale: Long = 1000L

  /** Embedding centroid drift per ingest batch (x224): the model-
    * monitoring artifact an embedding pipeline tracks across arrival
    * batches — per batch, the int8-quantized per-dimension centroid
    * (x175's per-vector quantization, summed exactly, scaled to
    * integer milli-units with a sign-split floor division — x207's
    * rescale discipline) and its L1 distance to the PREVIOUS batch's
    * centroid. A drifting encoder, a source-mix shift, or a corrupted
    * batch all surface as an L1 jump; the max single-dimension shift
    * localizes it. Complements x65 (token drift) and x129 (quality
    * drift) with the vector-space member.
    *
    * 100 TB shape: one corpus scan → per-batch `ArrayLongSum` array
    * aggregate (x52's kernel: the corpus is never exploded to
    * (row × dim) elements, the one shuffle carries 64-long arrays,
    * map-side combined to O(batches·mappers) state); only the 4-row
    * centroid result explodes. The drift join is O(batches·dim) on the
    * tiny centroid table. */
  def centroidDrift(spark: SparkSession, dir: String,
                    batches: Int = DriftBatches): DataFrame = {
    import graft.functions.ArrayLongSum.array_long_sum
    val levels = lit(QuantLevels.toDouble)
    val ids = Tables.embeddings(spark, dir).agg(
      min(col("vec_id")).as("min_id"), max(col("vec_id")).as("max_id"))
    val qd = Tables.embeddings(spark, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .crossJoin(broadcast(ids))
      .withColumn("batch",
        expr(s"((vec_id - min_id) * $batches) div (max_id - min_id + 1)"))
      .withColumn("sc",
        aggregate(col("v"), lit(0.0), (acc, x) => greatest(acc, abs(x))))
      .withColumn("q",
        transform(col("v"), x =>
          when(col("sc") === lit(0.0), lit(0L))
            .otherwise(floor(x / col("sc") * levels + lit(0.5)).cast("long"))))
      .select(col("batch"), col("q"))
    val cent = qd.groupBy(col("batch"))
      .agg(count(lit(1)).as("n"), array_long_sum(col("q")).as("sums"))
      .select(col("batch"), col("n"), posexplode(col("sums")).as(Seq("d", "s")))
      .withColumn("c",
        when(col("s") >= 0, expr(s"(s * $DriftScale) div n"))
          .otherwise(-expr(s"((-s) * $DriftScale) div n")))
      .localCheckpoint() // self-joined at lag 1
    cent.as("cur")
      .join(cent.as("prev"),
        col("cur.batch") === col("prev.batch") + 1 && col("cur.d") === col("prev.d"))
      .groupBy(col("cur.batch").as("batch"))
      .agg(max(col("cur.n")).as("n_vecs"),
        sum(abs(col("cur.c") - col("prev.c"))).as("l1_drift_milli"),
        max(abs(col("cur.c") - col("prev.c"))).as("max_dim_shift_milli"))
  }

  /** x225's hit@k cutoffs. Shared with the DuckDB oracle. */
  val EvalKs: Seq[Int] = Seq(1, 3, 5)

  /** Retrieval quality eval panel (x225): classification-by-retrieval
    * scoring of the embedding space against the label column — per
    * label, hit@1/3/5 (does any same-label neighbor appear in the
    * top-k?) and the summed integer reciprocal rank (MRR·10⁶ without
    * the float: `10⁶ div first_hit_rank`, 0 when no hit) over the
    * STAGED exact neighbor table ([[KnnStage]]). x191 measures slot-
    * level homophily; this is the ranked-retrieval view (first-hit
    * position matters) — together they are the intrinsic eval a
    * retrieval corpus runs before fine-tuning. Swaps to [[AnnStage]]
    * like every staged-table consumer.
    *
    * 100 TB shape: the staged O(N·k) table joins the broadcast O(N)
    * label table twice, the first-hit pick is a per-query min — one
    * partial-agg'd groupBy — and the panel is O(labels) rows. */
  def retrievalEval(spark: SparkSession, dir: String,
                    k: Int = KnnStage.StageK,
                    rankedTable: (SparkSession, String, Int) => DataFrame =
                      KnnStage.ranked(_, _, _),
                    querySampleBps: Option[Int] = None): DataFrame = {
    val labels = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("id"), col("label"))
    val firstHit = sampleQueries(
        rankedTable(spark, dir, math.max(k, KnnStage.StageK)),
        "q_id", querySampleBps)
      .filter(col("rank") <= k)
      .join(broadcast(labels).as("ql"), col("q_id") === col("ql.id"))
      .withColumnRenamed("label", "q_label").drop("id")
      .join(broadcast(labels).as("nl"), col("vec_id") === col("nl.id"))
      .groupBy(col("q_id"), col("q_label"))
      .agg(min(when(col("label") === col("q_label"), col("rank"))).as("first_hit"))
    firstHit.groupBy(col("q_label"))
      .agg(count(lit(1)).as("n_queries"),
        sum(when(col("first_hit") <= EvalKs(0), 1L).otherwise(0L)).as("n_hit1"),
        sum(when(col("first_hit") <= EvalKs(1), 1L).otherwise(0L)).as("n_hit3"),
        sum(when(col("first_hit") <= EvalKs(2), 1L).otherwise(0L)).as("n_hit5"),
        sum(coalesce(expr("1000000L div first_hit"), lit(0L))).as("rr_ppm_sum"))
  }

  /** x238's prefix dims (Matryoshka truncation points) and k. Shared
    * with the DuckDB oracle. */
  val MatryoshkaDims: Seq[Int] = Seq(16, 32, 64)

  /** Matryoshka dimension-truncation recall audit (x238): how much
    * ranking fidelity survives truncating the embedding to its first d
    * dims — the third knob axis of the fidelity board (x175 audits
    * scalar quantization, x202 the LSH probe radius; this one the MRL
    * prefix length a production store actually serves at). Per d ∈
    * [[MatryoshkaDims]]: the exact top-k pairs retained anywhere in the
    * prefix-cosine top-k (`n_found` / `recall_ppm`) and the summed rank
    * displacement — x221's ledger along the dimension axis. The d = 64
    * row is the full vector and must read recall 10⁶ / displacement 0
    * (built-in sanity). Prefix cosines for ALL dims ride ONE scored
    * pass (three trunc6 cosines per pair, then a stack), and the exact
    * baseline is the STAGED table. `querySampleBps` gives the audit the
    * bounded-cost production mode (x232/x233/x234's dial).
    *
    * 100 TB shape: the scored pass is x09's documented once-per-audit
    * stage shape (broadcast query side × corpus scan); rankings
    * partition by (query, d); the ledger is a 3-row rollup. */
  def matryoshkaRecall(spark: SparkSession, dir: String, k: Int = LshCurveK,
                       querySampleBps: Option[Int] = None): DataFrame = {
    import graft.functions.VectorFunctions.cosine_sim
    val dims = MatryoshkaDims
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val queries = sampleQueries(emb, "vec_id", querySampleBps)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val scored = emb.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id") +: col("vec_id") +: dims.map(d =>
        trunc6(cosine_sim(slice(col("qv"), 1, d), slice(col("v"), 1, d)))
          .as(s"cos_$d")): _*)
    val stacked = scored.select(col("q_id"), col("vec_id"),
        explode(array(dims.map(d => struct(lit(d.toLong).as("d"),
          col(s"cos_$d").as("cos"))): _*)).as("dc"))
      .select(col("q_id"), col("vec_id"), col("dc.d").as("d"), col("dc.cos").as("cos"))
    // window KEPT (r16 sweep): composite (q_id, d) partition key over the
    // audit's stacked frame; WindowGroupLimit bounds the rank pass
    val wd = Window.partitionBy(col("q_id"), col("d"))
      .orderBy(col("cos").desc, col("vec_id"))
    val ranked = stacked.withColumn("rk", row_number().over(wd))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("vec_id"), col("d"), col("rk").as("rank_prefix"))
    val exact = sampleQueries(
        KnnStage.ranked(spark, dir, math.max(k, KnnStage.StageK)),
        "q_id", querySampleBps)
      .filter(col("rank") <= k)
      .select(col("q_id"), col("vec_id"), col("rank").as("rank_exact"))
      .withColumn("d", explode(array(dims.map(d => lit(d.toLong)): _*)))
    exact.join(ranked, Seq("q_id", "vec_id", "d"), "left")
      .groupBy(col("d"))
      .agg(count(lit(1)).as("n_exact"),
        sum(when(col("rank_prefix").isNotNull, 1L).otherwise(0L)).as("n_found"),
        coalesce(sum((col("rank_prefix") - col("rank_exact")).cast("long")), lit(0L))
          .as("displacement_sum"))
      .withColumn("recall_ppm", expr("(1000000L * n_found) div n_exact"))
      .select(col("d"), col("n_exact"), col("n_found"), col("recall_ppm"),
        col("displacement_sum"))
  }

  /** ANN staged-swap fidelity ledger (x221): the per-rank recall +
    * displacement audit of [[AnnStage]]'s approximate neighbor table
    * against [[KnnStage]]'s exact one — the closing artifact of the
    * staged-swap contract ("the compute path swaps for an ANN backend
    * and every consumer is unchanged"): the swap is real (AnnStage
    * serves the same schema, the consumers are parameter-swappable,
    * spec-proven identical at full probe radius) and its fidelity price
    * is MEASURED as an oracle-checked query, not asserted (x175's
    * discipline applied to the table swap). Per exact rank position
    * 1..k: how many of the exact rank-r pairs the approximate table
    * retains anywhere in its top-k (`n_found` / `recall_ppm` — recall
    * decays with r: near neighbors share buckets more often), and the
    * summed rank displacement of the retained pairs (0 = order
    * preserved; the x175 `quant_rank_sum` idea at table level).
    *
    * 100 TB shape: both sides are staged O(N·k) parquet reads; the
    * audit is one equi-join on (q_id, vec_id) and a k-row rollup. */
  def annSwapFidelity(spark: SparkSession, dir: String,
                      k: Int = KnnStage.StageK,
                      radius: Int = AnnStage.AnnRadius,
                      querySampleBps: Option[Int] = None,
                      approxTable: Option[DataFrame] = None): DataFrame = {
    val exact = sampleQueries(
        KnnStage.ranked(spark, dir, math.max(k, KnnStage.StageK)),
        "q_id", querySampleBps)
      .filter(col("rank") <= k)
      .select(col("q_id"), col("vec_id"), col("rank").as("rank_exact"))
    // approxTable lets a caller audit any table serving the ranked
    // schema — e.g. the STREAM-BUILT ANN artifact (VectorStream
    // .startAnnIngest) instead of the batch stage
    val approx = approxTable
      .getOrElse(AnnStage.ranked(spark, dir, math.max(k, KnnStage.StageK), radius))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("vec_id"), col("rank").as("rank_ann"))
    exact.join(approx, Seq("q_id", "vec_id"), "left")
      .groupBy(col("rank_exact"))
      .agg(count(lit(1)).as("n_exact"),
        sum(when(col("rank_ann").isNotNull, 1L).otherwise(0L)).as("n_found"),
        coalesce(sum((col("rank_ann") - col("rank_exact")).cast("long")), lit(0L))
          .as("displacement_sum"))
      .withColumn("recall_ppm", expr("(1000000L * n_found) div n_exact"))
      .select(col("rank_exact"), col("n_exact"), col("n_found"),
        col("recall_ppm"), col("displacement_sum"))
  }

  /** Multimodal-join integrity panel (x263): coverage between the text
    * corpus and its embedding table (the doc_id ≡ vec_id contract every
    * retrieval/dedup consumer here relies on) — per source, how many
    * documents lack an embedding (the backfill queue an embedding
    * pipeline drains), plus the two global orphan rows. x139 audits the
    * star schema's FK surface; this is the same constraint class for
    * the LLM-side tables, where a silent coverage gap skews every
    * downstream ANN/SemDeDup/retrieval result.
    *
    * 100 TB shape: per-relationship left-anti joins on the id key (AQE
    * broadcasts the smaller side) + map-side-combined rollups; no row
    * carries more than (id, source). */
  def embeddingCoverage(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"))
    val missingBySource = docs
      .join(emb, docs("doc_id") === emb("vec_id"), "left_anti")
      .groupBy(col("source")).agg(count(lit(1)).as("n_orphans"))
    val perSource = docs.groupBy(col("source")).agg(count(lit(1)).as("n_rows"))
      .join(missingBySource, Seq("source"), "left")
      .select(concat(lit("doc_no_embedding:"), col("source")).as("relation"),
        col("n_rows"), coalesce(col("n_orphans"), lit(0L)).as("n_orphans"))
    val totals = docs.agg(count(lit(1)).as("n_docs"))
      .crossJoin(emb.agg(count(lit(1)).as("n_emb"))) // two 1-row scalars
    // the global doc-side orphan count is the SUM of the per-source
    // counts — no second corpus-scale anti-join (review finding r14)
    val docsNoEmb = missingBySource
      .agg(coalesce(sum(col("n_orphans")), lit(0L)).as("n_orphans"))
      .crossJoin(totals)
      .select(lit("doc_no_embedding").as("relation"),
        col("n_docs").as("n_rows"), col("n_orphans"))
    val embNoDoc = emb.join(docs, emb("vec_id") === docs("doc_id"), "left_anti")
      .agg(count(lit(1)).as("n_orphans")).crossJoin(totals)
      .select(lit("embedding_no_doc").as("relation"),
        col("n_emb").as("n_rows"), col("n_orphans"))
    perSource.unionByName(docsNoEmb).unionByName(embNoDoc)
  }
}
