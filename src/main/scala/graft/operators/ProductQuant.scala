package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Product quantization (PQ) over the `embeddings` table: deterministic
  * integer-Lloyd codebooks per subspace, byte-code encoding, and
  * asymmetric-distance (ADC) top-k — the missing member of the ANN family
  * next to hyperplane LSH (x10), IVF (x18), JL projection (x60), int8
  * scalar quantization (x175) and Matryoshka truncation (x238). IVF-PQ is
  * the canonical 100 TB vector index: the corpus is stored as
  * `PqSubspaces` one-byte codes per vector (64 dims → 4 bytes here)
  * instead of 256 float bytes, and query-time scoring is `PqSubspaces`
  * table lookups per candidate instead of a 64-dim dot product.
  *
  * Everything is INTEGER-EXACT so the DuckDB oracle can replay training,
  * encoding and ADC bit-for-bit (the x10/x13 "algorithm oracle" pattern):
  * vectors are quantized to `round(x·10⁴)` longs (exact IEEE ops on the
  * float→double upcast), distances are integer squared-L2, centroid
  * updates are elementwise `floorDiv(sum, n)`, and every argmin tie-breaks
  * on the lowest code id. Floating-point k-means (MLlib's, x18) could not
  * be replayed in SQL — partition-order-dependent double accumulation —
  * which is exactly why x18 needed a measured-recall exact oracle instead.
  *
  * Scale shape: training touches the corpus `PqIters`+1 times but each
  * pass is scan → broadcast-hash-join against the (M·K)-row codebook →
  * map-side-combining aggregate; the codebook itself is bounded MODEL
  * STATE (M·K rows collected per iteration, like any fitted model — at
  * 100 TB the fit input would be a bounded sample, the same contract as
  * `Similarity.pinnedFitInput`). Encoding is one linear scan. The ADC scan
  * joins the corpus codes against a broadcast per-query lookup table on
  * the (m, code) key — a real equi-join, no vector math per candidate —
  * and the M partial distances per (query, candidate) collapse map-side
  * before the per-query top-k shuffle. At 100 TB the ADC scan composes
  * with IVF cell probing so each query prices nProbe/nCells of the corpus.
  */
object ProductQuant {

  /** Subspace count × subspace width must equal the embedding dim (64).
    * Shared with the DuckDB oracle SQL (`adcOracleSql`) — the constants can
    * only move together. */
  val PqSubspaces: Int = 4
  val PqSubDim: Int = 16

  /** Codes per subspace codebook. 8 keeps the oracle's Lloyd replay cheap
    * while exercising real cluster competition; production PQ uses 256
    * (one byte) — nothing in the dataflow depends on the value. */
  val PqCodes: Int = 8

  /** Lloyd iterations after the deterministic init (centroid c of subspace
    * m starts as vector c's m-th subvector). Fixed and small on purpose:
    * the oracle replays each iteration as a CTE pair, and PQ cell quality
    * plateaus fast — rank fidelity is priced by x273 regardless. */
  val PqIters: Int = 2

  /** Fixed-point scale for the float→long quantization. At |x| ≤ 0.53 the
    * quantized components are ≤ ~5.3e3, squared-L2 subspace distances
    * ≤ ~1.8e9 and 64-dim distances ≤ ~7.2e9 — exact in BIGINT and in the
    * oracle's double-valued `list_dot_product` (< 2⁵³). */
  val PqScale: Long = 10000L

  /** Query set (vec_id < PqQHi) and neighbor count, shared with the
    * oracle. Disjoint from x18's 20..30 range so the two ANN gates can't
    * accidentally alias each other's query sets. */
  val PqQHi: Int = 8
  val PqTopK: Int = 5

  /** PRODUCTION PQ geometry (x283, r16 verdict task 3): M=8 one-byte-
    * class subspaces of width 8, K=64 codes — the shape `tools/
    * PqGeometry` prices off-gate, now oracle-checked: the integer-Lloyd
    * CTE chain replays ANY geometry, so the gate hashes the production-
    * shaped codebook end to end (train → encode → ADC → rank) instead
    * of trusting the toy-geometry pass to generalize. K=64 was chosen
    * in r17 to bound the oracle's N·M·K assignment CTEs; r18 measured
    * that fear away and gates the full K=256 too (x285/x286,
    * [[PqFullCodes]]) — both shapes stay gated so the K-ladder itself
    * is oracle-covered. Nothing in the dataflow depends on K. */
  val PqProdSubspaces: Int = 8
  val PqProdSubDim: Int = 8
  val PqProdCodes: Int = 64

  /** FULL production K (x285/x286, r17 verdict task 1): one-byte codes,
    * K=256 — the exact shape RECALL.md's deployment frontier quotes. r17
    * gated K=64 out of caution about the oracle's N·M·K assignment CTEs
    * at sf1; measured, the corpus is small enough (20k vectors at sf1 →
    * 41M assignment rows per Lloyd round) that DuckDB replays the full
    * geometry inside the watchdog, so the frontier row is now
    * hash-verified end to end, not tool-printed. */
  val PqFullCodes: Int = 256

  /** Integer squared-L2 between two `array<bigint>` columns of a known
    * static width — UNROLLED into a flat `Σ (a[i]-b[i])²` expression
    * tree (r18): the `aggregate(zip_with(...))` higher-order form is a
    * CodegenFallback expression, evaluated per row with interpreted
    * lambda binding and a materialized intermediate array, which made
    * the N·M·K assignment frames (4M rows at sf0.1 for K=256) the
    * hottest interpreted loop in the engine. The unrolled form is plain
    * codegen arithmetic; integer adds are associative so the fold order
    * (seeded left fold, same as the HOF) is value-identical. */
  private def d2(a: Column, b: Column, dim: Int): Column =
    (0 until dim).map { i =>
      val d = a.getItem(i) - b.getItem(i); d * d
    }.foldLeft(lit(0L): Column)(_ + _)

  /** A fitted codebook: (subspace, code, centroid) rows — driver-side
    * model state. */
  type Codebook = Seq[(Int, Int, Seq[Long])]

  /** vec_id, qv: the embedding quantized to longs (exact: float→double
    * upcast, ×10⁴, IEEE round — same value DuckDB computes). */
  private[graft] def quantizeFrame(emb: DataFrame): DataFrame =
    emb.select(
      col("vec_id"),
      transform(Similarity.asDouble(col("embedding")),
        x => round(x * PqScale).cast("long")).as("qv"))

  private def quantized(spark: SparkSession, dir: String): DataFrame =
    quantizeFrame(Tables.embeddings(spark, dir))

  /** (vec_id, m, sv): one row per subspace, sv = the m-th subDim-wide
    * slice. The explode multiplies rows by M but each carries only the
    * slice — narrower than the original vector. With (subspaces=1,
    * subDim=dim) this is the identity framing the coarse quantizer uses. */
  private def subvectors(q: DataFrame, subspaces: Int = PqSubspaces,
                         subDim: Int = PqSubDim): DataFrame =
    q.select(col("vec_id"),
        explode(array((0 until subspaces).map(lit): _*)).as("m"),
        col("qv"))
      .select(col("vec_id"), col("m"),
        slice(col("qv"), col("m") * subDim + 1, lit(subDim)).as("sv"))

  /** One Lloyd assignment: for each (vec, m) the nearest centroid of `cb`,
    * lowest code on ties. One broadcast-hash join against the M·K-row
    * codebook + one map-side-combining aggregate. The argmin is PACKED
    * into a single long `min(d2·65536 + code)` (r18) — the same form the
    * DuckDB oracle has always used: the previous `min(struct(d2, code,
    * sv))` buffer is not a mutable fixed-width type, so the planner fell
    * to a SortAggregate pair that sorted the N·M·K candidate frame twice;
    * the packed long min is a plain HashAggregate with map-side partials.
    * Value-identical: codes < 65536 and d2 ≤ dim·(2·PqScale·max|x|)² ≈
    * 7.2e9, so packed < 4.8e14 < 2⁶³ and the lexicographic (d2, code)
    * order is exactly the packed order. `sv` is carried as a GROUPING key
    * (it is functionally dependent on (vec_id, m) — one subvector per
    * group — so the groups are unchanged). */
  private def assign(sub: DataFrame, cbDf: DataFrame, subDim: Int): DataFrame = {
    // argmin shortcut (r18): d2(s,c) = |s|² + (|c|² − 2·s·c) and |s|² is
    // constant within each (vec, m) group, so ranking by the score
    // |c|² − 2·s·c picks the SAME code with the SAME tie-break — integer
    // arithmetic, no rounding, so the order is exactly preserved while
    // the per-candidate work drops from sub+mul+add per dim to mul+add
    // (|c|² is precomputed once per codebook row). The score can be
    // negative, which packed min still orders correctly (score·65536 +
    // code is monotonic in (score, code)); pmod recovers the code.
    val cn2 = (0 until subDim).map { i =>
      val c = col("cv").getItem(i); c * c
    }.foldLeft(lit(0L): Column)(_ + _)
    val dot = (0 until subDim).map(i =>
      col("sv").getItem(i) * col("cv").getItem(i))
      .foldLeft(lit(0L): Column)(_ + _)
    sub.join(broadcast(cbDf.withColumn("cn2", cn2)), Seq("m"))
      .select(col("vec_id"), col("m"), col("sv"),
        ((col("cn2") - dot * 2L) * 65536L + col("code")).as("packed"))
      .groupBy(col("vec_id"), col("m"), col("sv"))
      .agg(min(col("packed")).as("packed"))
      .select(col("vec_id"), col("m"),
        pmod(col("packed"), lit(65536L)).cast("int").as("code"), col("sv"))
  }

  private def cbToDf(spark: SparkSession, cb: Seq[(Int, Int, Seq[Long])]): DataFrame = {
    import spark.implicits._
    cb.toDF("m", "code", "cv")
  }

  /** Fitted codebooks memoized per (corpus dir, geometry) — training is
    * deterministic, so the memo is pure; x272–x274 and min-of-2 bench runs
    * share one fit per geometry, the same once-per-JVM contract as the
    * staged snapshot dirs. */
  private val cbCache = scala.collection.concurrent.TrieMap
    .empty[(String, Int, Int, Int, Int), Seq[(Int, Int, Seq[Long])]]

  private[graft] def trainCodebook(spark: SparkSession, dir: String,
                                   subspaces: Int = PqSubspaces,
                                   subDim: Int = PqSubDim,
                                   codes: Int = PqCodes,
                                   iters: Int = PqIters): Seq[(Int, Int, Seq[Long])] =
    cbCache.getOrElseUpdate((dir, subspaces, subDim, codes, iters),
      trainCodebookUncached(spark, dir, subspaces, subDim, codes, iters))

  /** Deterministic integer Lloyd: init centroid (m, c) = vector c's m-th
    * subvector, then `PqIters` rounds of assign → elementwise
    * `floorDiv(sum, n)` update (empty codes keep their previous centroid).
    * Returns the codebook as driver-side model state (M·K rows — the same
    * bounded-collect class as the BPE vocab and the IVF centroids). The
    * (1, dim, cells) geometry fits the IVF coarse quantizer with the same
    * machinery. */
  private[graft] def trainCodebookUncached(spark: SparkSession, dir: String,
                                           subspaces: Int = PqSubspaces,
                                           subDim: Int = PqSubDim,
                                           codes: Int = PqCodes,
                                           iters: Int = PqIters,
                                           persist: Boolean = true): Seq[(Int, Int, Seq[Long])] = {
    import graft.functions.ArrayLongSum.array_long_sum
    // localCheckpoint: the training frame is re-read iters+1 times
    // (init + one assign per iteration); materializing it once cuts the
    // repeated parquet-scan+explode out of every Lloyd round (r15 verdict
    // task 2) without touching the integer-exact values the oracle
    // replays. `persist = false` is graft.tools.PqGeometry's before/after
    // hook — it exists to PRICE the checkpoint, not to be used.
    val subRaw = subvectors(quantized(spark, dir), subspaces, subDim)
    val sub = if (persist) subRaw.localCheckpoint() else subRaw
    var cb: Seq[(Int, Int, Seq[Long])] = sub.filter(col("vec_id") < codes)
      .collect()
      .map(r => (r.getInt(1), r.getLong(0).toInt, r.getSeq[Long](2)))
      .sortBy(t => (t._1, t._2))
    // Geometry invariant at FIT time, not just in the spec (r15 advisory):
    // seeding reads vectors with vec_id < codes, so a sparse/reindexed
    // corpus missing any id in [0, codes) would silently ship an
    // undersized codebook — engine and oracle would degrade identically,
    // making the gate blind to it. Fail loudly instead.
    require(cb.size == subspaces * codes,
      s"PQ codebook init found ${cb.size} (m, code) seed rows, expected " +
        s"$subspaces×$codes: the corpus at $dir is missing vec_ids in " +
        s"[0, $codes) — seed ids must be dense for the deterministic init")
    for (_ <- 1 to iters) {
      val sums = assign(sub, cbToDf(spark, cb), subDim)
        .groupBy(col("m"), col("code"))
        .agg(array_long_sum(col("sv")).as("sums"), count(lit(1)).as("n"))
        .collect()
        .map(r => ((r.getInt(0), r.getInt(1)),
          (r.getSeq[Long](2), r.getLong(3))))
        .toMap
      cb = cb.map { case (m, c, old) =>
        sums.get((m, c)) match {
          case Some((s, n)) => (m, c, s.map(x => Math.floorDiv(x, n)))
          case None         => (m, c, old)
        }
      }
    }
    cb
  }

  /** (vec_id, m, code): the corpus encoded against the final codebook —
    * the M-bytes-per-vector representation a 100 TB index stores.
    * Geometry is read off the codebook ([[geometryOf]]) so any fitted
    * shape encodes with the same call. */
  private[graft] def encode(spark: SparkSession, dir: String,
                            cb: Seq[(Int, Int, Seq[Long])]): DataFrame = {
    val (m, sd) = geometryOf(cb)
    assign(subvectors(quantized(spark, dir), m, sd), cbToDf(spark, cb), sd)
      .select(col("vec_id"), col("m"), col("code"))
  }

  /** x272: ADC top-k. Per query the M·K partial-distance lookup table is
    * computed in-plan (query subvectors × broadcast codebook) and
    * broadcast; the corpus side joins on (m, code) — an equi-join against
    * codes, never touching a corpus vector — then the M partials per
    * candidate collapse in a map-side-combining sum before the per-query
    * top-k window. Output: (q_id, vec_id, adc_dist, rank). */
  /** The (q_id, vec_id, adc_dist) candidate frame x272/x276/x283 rank —
    * parameterized on geometry (r17); defaults are the gate shape. */
  private def adcScores(spark: SparkSession, dir: String, qHi: Int,
                        subspaces: Int = PqSubspaces,
                        subDim: Int = PqSubDim,
                        codes: Int = PqCodes): DataFrame = {
    val cb = trainCodebook(spark, dir, subspaces, subDim, codes)
    val enc = encode(spark, dir, cb)
    val lut = subvectors(quantized(spark, dir), subspaces, subDim)
      .filter(col("vec_id") < qHi)
      .withColumnRenamed("vec_id", "q_id")
      .join(broadcast(cbToDf(spark, cb)), Seq("m"))
      .select(col("q_id"), col("m"), col("code"), d2(col("sv"), col("cv"), subDim).as("pd2"))
    enc.join(broadcast(lut), Seq("m", "code"))
      .filter(col("vec_id") =!= col("q_id"))
      .groupBy(col("q_id"), col("vec_id"))
      .agg(sum(col("pd2")).as("adc_dist"))
  }

  def pqAdcTopK(spark: SparkSession, dir: String, qHi: Int = PqQHi,
                k: Int = PqTopK): DataFrame = {
    // KEPT as a rank window on purpose: x272 is the documented window-form
    // baseline of the x272/x276 pair (the measured before/after of the
    // aggregate swap); every shipping ANN ranking now uses the aggregate.
    val w = Window.partitionBy(col("q_id")).orderBy(col("adc_dist"), col("vec_id"))
    adcScores(spark, dir, qHi)
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
  }

  /** x276: x272's ranking re-expressed through the bounded top-k
    * AGGREGATE ([[graft.functions.TopKLongPairs]]) instead of the rank
    * window — bit-identical output (same (adc_dist, vec_id) total order,
    * spec-asserted), different physical shape: the window must shuffle
    * and SORT the full N·Q candidate frame a second time, while the
    * aggregate partial-combines map-side so its shuffle carries at most
    * O(mappers · Q · 2k) pairs and no sort. The plan swaps `Window` for
    * an ObjectHashAggregate pair — the 100× knob for every per-group
    * top-k in the engine, landed here first because the ADC scan is the
    * hottest candidate generator. */
  def pqAdcTopKAgg(spark: SparkSession, dir: String, qHi: Int = PqQHi,
                   k: Int = PqTopK): DataFrame = {
    import graft.functions.TopKLongPairs.top_k_long_pairs
    adcScores(spark, dir, qHi)
      .groupBy(col("q_id"))
      .agg(top_k_long_pairs(col("adc_dist"), col("vec_id"), k).as("top"))
      .select(col("q_id"), posexplode(col("top")))
      .select(col("q_id"), col("col.id").as("vec_id"),
        col("col.sk").as("adc_dist"),
        (col("pos") + 1).cast("int").as("rank"))
  }

  /** x283: the ADC ranking at PRODUCTION geometry (M=8, K=64 default),
    * through the bounded top-k aggregate (every shipping ANN ranking's
    * form). Same dataflow as x272/x276 — only the codebook shape moves,
    * which is the point: the gate hash-verifies the production-shaped
    * train → encode → ADC chain instead of extrapolating from the toy
    * geometry, so the RECALL.md frontier rows quote an oracle-checked
    * codebook. x285 runs the SAME builder at the FULL production K=256
    * (`PqFullCodes`) — the frontier's deployment row. 100 TB shape:
    * identical to x276's (broadcast M·K LUT is 512–2048 rows/query —
    * still trivially broadcastable). */
  def pqProdAdcTopK(spark: SparkSession, dir: String, qHi: Int = PqQHi,
                    k: Int = PqTopK, codes: Int = PqProdCodes): DataFrame = {
    import graft.functions.TopKLongPairs.top_k_long_pairs
    adcScores(spark, dir, qHi, PqProdSubspaces, PqProdSubDim, codes)
      .groupBy(col("q_id"))
      .agg(top_k_long_pairs(col("adc_dist"), col("vec_id"), k).as("top"))
      .select(col("q_id"), posexplode(col("top")))
      .select(col("q_id"), col("col.id").as("vec_id"),
        col("col.sk").as("adc_dist"),
        (col("pos") + 1).cast("int").as("rank"))
  }

  /** Candidate-pool multiplier for [[pqRerankTopK]] (x279) — the pool is
    * `PqRerankFactor · k` ADC survivors per query. Shared with the
    * oracle. */
  val PqRerankFactor: Int = 4

  /** x279: ADC + exact re-rank — the standard PQ serving pattern (and
    * the x60→x18 rerank composition applied to codes): the ADC scan
    * nominates a `PqRerankFactor·k` pool per query using ONLY the
    * 4-byte codes, then just the pool members' raw (quantized) vectors
    * are re-read through a broadcast equi-join and exact-ranked. This is
    * what closes x273's measured distortion in production: ADC ordering
    * errors INSIDE the pool are fully repaired (the output is the exact
    * integer-L2 order over the pool), so the only remaining loss is pool
    * coverage — turnable by one knob. Scale shape: the second pass scans
    * the corpus once filtered by a broadcast Q·pool pick list (no second
    * cross, x273's plumbing), so reranking costs one narrow scan
    * regardless of k. Output: (q_id, vec_id, exact_d2, rank). */
  def pqRerankTopK(spark: SparkSession, dir: String, qHi: Int = PqQHi,
                   k: Int = PqTopK, poolFactor: Int = PqRerankFactor): DataFrame = {
    import graft.functions.TopKLongPairs.top_k_long_pairs
    val pool = adcScores(spark, dir, qHi)
      .groupBy(col("q_id"))
      .agg(top_k_long_pairs(col("adc_dist"), col("vec_id"), k * poolFactor).as("top"))
      .select(col("q_id"), explode(col("top.id")).as("vec_id"))
    val e = quantized(spark, dir)
    val queries = e.filter(col("vec_id") < qHi)
      .select(col("vec_id").as("q_id"), col("qv").as("qqv"))
    e.join(broadcast(pool), Seq("vec_id"))
      .join(broadcast(queries), Seq("q_id"))
      .select(col("q_id"), d2(col("qqv"), col("qv"), PqSubspaces * PqSubDim).as("exact_d2"), col("vec_id"))
      .groupBy(col("q_id"))
      .agg(top_k_long_pairs(col("exact_d2"), col("vec_id"), k).as("top"))
      .select(col("q_id"), posexplode(col("top")))
      .select(col("q_id"), col("col.id").as("vec_id"),
        col("col.sk").as("exact_d2"),
        (col("pos") + 1).cast("int").as("rank"))
  }

  /** x273: the PQ fidelity ledger (the x175/x187/x221 pattern — price the
    * compression, don't assert it). Per query: how many of the ADC top-k
    * are in the EXACT integer-L2 top-k, and the true-distance sums of both
    * sets — `pq_sum_d2 ≥ exact_sum_d2` by construction, and the gap is the
    * distortion a 100 TB deployment pays for 64× smaller candidate
    * payloads (re-ranking survivors against raw vectors closes it). The
    * exact side is a broadcast-tiny-query cross against the corpus — the
    * same documented exact-baseline BNLJ as x09. */
  /** Exact integer-L2 top-k per query (q_id < qHi) over the quantized
    * corpus — the truth set shared by x273's ledger and the PqGeometry
    * frontier (r16 review: ONE definition, so the pricing tool can never
    * drift from the shipped exact ranking it claims to measure against).
    * Output: (q_id, vec_id, true_d2, rank). */
  private[graft] def exactIntTopK(spark: SparkSession, dir: String,
                                  qHi: Int = PqQHi, k: Int = PqTopK): DataFrame = {
    import graft.functions.TopKLongPairs.top_k_long_pairs
    val e = quantized(spark, dir)
    val queries = e.filter(col("vec_id") < qHi)
      .select(col("vec_id").as("q_id"), col("qv").as("qqv"))
    e.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), d2(col("qqv"), col("qv"), PqSubspaces * PqSubDim).as("true_d2"))
      .groupBy(col("q_id"))
      .agg(top_k_long_pairs(col("true_d2"), col("vec_id"), k).as("top"))
      .select(col("q_id"), posexplode(col("top")))
      .select(col("q_id"), col("col.id").as("vec_id"),
        col("col.sk").as("true_d2"), (col("pos") + 1).cast("int").as("rank"))
  }

  def pqDistortion(spark: SparkSession, dir: String, qHi: Int = PqQHi,
                   k: Int = PqTopK): DataFrame = {
    val e = quantized(spark, dir)
    val queries = e.filter(col("vec_id") < qHi)
      .select(col("vec_id").as("q_id"), col("qv").as("qqv"))
    // ONE corpus pass for the exact baseline, cut with localCheckpoint so
    // the Q·k-row result is consumed twice downstream without re-expanding
    // the cross (the x116/x224 pattern) — without the cut the ledger's
    // three joins would each replay the corpus×queries scan.
    val exact = exactIntTopK(spark, dir, qHi, k).localCheckpoint()
    // true distances of the PQ picks: the Q·k pick list is broadcast back
    // against the corpus scan (equi-join on vec_id — no second cross) and
    // scored against the broadcast query vectors.
    val pq = pqAdcTopK(spark, dir, qHi, k)
    val pqTrue = e.join(broadcast(pq.select(col("q_id"), col("vec_id"), col("rank"))),
        Seq("vec_id"))
      .join(broadcast(queries), Seq("q_id"))
      .select(col("q_id"), col("vec_id"), col("rank"),
        d2(col("qqv"), col("qv"), PqSubspaces * PqSubDim).as("true_d2"))
    val overlap = pqTrue.join(
        exact.select(col("q_id"), col("vec_id"), lit(1).as("hit")),
        Seq("q_id", "vec_id"), "left")
      .join(exact.select(col("q_id"), col("rank"), col("true_d2").as("exact_d2")),
        Seq("q_id", "rank"))
    overlap.groupBy(col("q_id"))
      .agg(count(col("hit")).as("n_overlap"),
        sum(col("exact_d2")).as("exact_sum_d2"),
        sum(col("true_d2")).as("pq_sum_d2"))
  }

  // ---------------------------------------------------------------------
  // DuckDB oracle SQL (algorithm oracle: replays quantize → init → Lloyd
  // iterations → encode → ADC with the same integer arithmetic; generated
  // from the SAME constants as the operator so they can only move together)
  // ---------------------------------------------------------------------

  private def d2Sql(a: String, b: String): String =
    s"CAST(list_dot_product(CAST($a AS DOUBLE[]), CAST($a AS DOUBLE[]))" +
      s" + list_dot_product(CAST($b AS DOUBLE[]), CAST($b AS DOUBLE[]))" +
      s" - 2*list_dot_product(CAST($a AS DOUBLE[]), CAST($b AS DOUBLE[])) AS BIGINT)"

  /** One Lloyd iteration as CTEs: packed-argmin assignment, per-dim sums
    * (the oracle's stand-in for `array_long_sum`), floorDiv rebuild,
    * empty-code carry-forward. `src` is the subvector CTE, `tag`
    * namespaces the intermediate CTEs so the PQ and coarse chains can
    * coexist.
    *
    * Assignment is `min(d2·65536 + code) % 65536` — the argmin of
    * (d2, code) as ONE BIGINT aggregate, not a per-(vec, m) row_number
    * window (r18: at K=256/sf1 the window form sorted a 41M-row
    * candidate frame per Lloyd pass — 171 s; the hash-aggregate form is
    * 4 s, row-identical since codes < 65536 and the packed value stays
    * < 2⁶³: d2 ≤ dim·(2·PqScale·max|x|)² ≈ 7.2e9, ×65536 ≈ 4.7e14). */
  private def lloydIterSql(src: String, tag: String, prev: String, cur: String,
                           t: Int, subDim: Int): String =
    s"""${tag}a$t AS (SELECT s.vec_id, s.m,
       |  min(${d2Sql("s.sv", "c.cv")}*65536 + c.code) % 65536 AS code
       |  FROM $src s JOIN $prev c ON s.m = c.m GROUP BY 1, 2),
       |${tag}g$t AS (SELECT a.m, a.code, i, sum(s.sv[i]) AS s, count(*) AS n
       |  FROM ${tag}a$t a JOIN $src s ON s.vec_id = a.vec_id AND s.m = a.m,
       |       unnest(range(1, $subDim + 1)) AS t(i) GROUP BY 1,2,3),
       |${tag}u$t AS (SELECT m, code, list((s - ((s % n + n) % n)) // n ORDER BY i) AS cv
       |  FROM ${tag}g$t GROUP BY 1,2),
       |$cur AS (SELECT c.m, c.code, coalesce(u.cv, c.cv) AS cv
       |  FROM $prev c LEFT JOIN ${tag}u$t u USING (m, code))""".stripMargin

  /** Full Lloyd chain from init `${tag}cb0` to `${tag}cb$PqIters`. */
  private def lloydChainSql(src: String, tag: String,
                            subDim: Int = PqSubDim): String =
    (1 to PqIters)
      .map(t => lloydIterSql(src, tag,
        if (t == 1) s"${tag}cb0" else s"${tag}cb${t - 1}", s"${tag}cb$t", t,
        subDim))
      .mkString(",\n")

  /** Shared CTE prefix: quantize → PQ Lloyd chain → `enc` (corpus codes)
    * and `lut` (per-query partial distances). Parameterized on geometry
    * (r17): the production gate (x283) replays the SAME chain at
    * (M=8, K=64) — defaults are the gate geometry, so x272–x274/x279
    * stay byte-identical. */
  private def encLutSql(subspaces: Int = PqSubspaces,
                        subDim: Int = PqSubDim,
                        codes: Int = PqCodes): String = {
    val cbF = s"cb$PqIters"
    s"""WITH e AS (SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
       |    x -> CAST(round(x*$PqScale) AS BIGINT)) AS qv FROM embeddings),
       |sub AS (SELECT vec_id, m, list_slice(qv, m*$subDim+1, m*$subDim+$subDim) AS sv
       |  FROM e, (SELECT unnest(range(0, $subspaces)) AS m) ms),
       |cb0 AS (SELECT m, vec_id AS code, sv AS cv FROM sub WHERE vec_id < $codes),
       |${lloydChainSql("sub", "", subDim)},
       |enc AS (SELECT s.vec_id, s.m,
       |  min(${d2Sql("s.sv", "c.cv")}*65536 + c.code) % 65536 AS code
       |  FROM sub s JOIN $cbF c ON s.m = c.m GROUP BY 1, 2),
       |lut AS (SELECT q.vec_id AS q_id, c.m, c.code, ${d2Sql("q.sv", "c.cv")} AS pd2
       |  FROM sub q JOIN $cbF c ON q.m = c.m WHERE q.vec_id < $PqQHi)""".stripMargin
  }

  /** CTE prefix ending at `pq` (the full-corpus ranked ADC candidates). */
  private def pqChainSql(subspaces: Int = PqSubspaces,
                         subDim: Int = PqSubDim,
                         codes: Int = PqCodes): String =
    s"""${encLutSql(subspaces, subDim, codes)},
       |adc AS (SELECT l.q_id, e.vec_id, CAST(sum(l.pd2) AS BIGINT) AS adc_dist
       |  FROM enc e JOIN lut l ON e.m = l.m AND e.code = l.code
       |  WHERE e.vec_id <> l.q_id GROUP BY 1, 2),
       |pq AS (SELECT q_id, vec_id, adc_dist,
       |  row_number() OVER (PARTITION BY q_id ORDER BY adc_dist, vec_id) AS rank
       |  FROM adc)""".stripMargin

  /** Coarse-quantizer geometry for the IVF-PQ composition (x274): the
    * corpus is cut into `IvfPqCells` Voronoi cells by a full-dimension
    * integer Lloyd (same machinery, (1, 64, cells) geometry); each query
    * ADC-scores only its `IvfPqProbe` nearest cells. Shared with the
    * oracle. */
  val IvfPqCells: Int = 8
  val IvfPqProbe: Int = 3

  /** x274: IVF-PQ — the canonical 100 TB vector index, composed from the
    * pieces x18 (cell probing) and x272 (ADC) prove separately. The stored
    * index is (vec_id, cell, m, code): one build-time shuffle joins the
    * cell assignment to the codes (at scale it is written partitioned BY
    * cell, so a probe reads nProbe/cells of the data — the x261 pruning
    * argument). Query time: probes and the LUT are both query-batch-sized
    * broadcasts; the corpus path is broadcast-hash-join → broadcast-hash-
    * join → map-side-combining sum → per-query top-k, touching only probed
    * cells and never a raw vector. Fidelity vs the full ADC scan is
    * audited by the x272-consistency spec (same codebook ⇒ identical ADC
    * distances on surviving pairs); rank fidelity vs EXACT is x273's
    * ledger. */
  /** The IVF-PQ index rows for a (vec_id, embedding) frame: (vec_id,
    * cell, m, code). Per-vector PURE given the frozen codebooks — which
    * is why the streaming ingest of this index is append-only
    * ([[graft.streaming.VectorStream.startPqIngest]]). */
  /** (subspaces, subDim) read off a fitted codebook — geometry travels
    * WITH the model state, so every consumer (batch topK, the streaming
    * encoder) prices any geometry without a parallel constant set. */
  private[graft] def geometryOf(cb: Codebook): (Int, Int) =
    (cb.map(_._1).max + 1, cb.head._3.length)

  private[graft] def indexFrame(emb: DataFrame, pcb: Codebook,
                                ccb: Codebook): DataFrame = {
    val spark = emb.sparkSession
    val (m, sd) = geometryOf(pcb)
    val cellDim = ccb.head._3.length
    val q = quantizeFrame(emb)
    val cells = assign(subvectors(q, 1, cellDim), cbToDf(spark, ccb), cellDim)
      .select(col("vec_id"), col("code").as("cell"))
    assign(subvectors(q, m, sd), cbToDf(spark, pcb), sd)
      .select(col("vec_id"), col("m"), col("code"))
      .join(cells, Seq("vec_id"))
  }

  def ivfPqTopK(spark: SparkSession, dir: String, qHi: Int = PqQHi,
                k: Int = PqTopK, nCells: Int = IvfPqCells,
                nProbe: Int = IvfPqProbe, window: Boolean = false,
                subspaces: Int = PqSubspaces, subDim: Int = PqSubDim,
                codes: Int = PqCodes, iters: Int = PqIters): DataFrame = {
    val dim = subspaces * subDim
    val pcb = trainCodebook(spark, dir, subspaces, subDim, codes, iters)
    val ccb = trainCodebook(spark, dir, 1, dim, nCells, iters)
    val e = quantized(spark, dir)
    val full = subvectors(e, 1, dim)
    val index = indexFrame(Tables.embeddings(spark, dir), pcb, ccb)
    val probes = full.filter(col("vec_id") < qHi)
      .join(broadcast(cbToDf(spark, ccb)), Seq("m"))
      .withColumn("cd2", d2(col("sv"), col("cv"), dim))
      .withColumn("p_rank", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("cd2"), col("code"))))
      .filter(col("p_rank") <= nProbe)
      .select(col("vec_id").as("q_id"), col("code").as("cell"))
    val lut = subvectors(e, subspaces, subDim).filter(col("vec_id") < qHi)
      .withColumnRenamed("vec_id", "q_id")
      .join(broadcast(cbToDf(spark, pcb)), Seq("m"))
      .select(col("q_id"), col("m"), col("code"), d2(col("sv"), col("cv"), subDim).as("pd2"))
    val adc = index.join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .join(broadcast(lut), Seq("q_id", "m", "code"))
      .groupBy(col("q_id"), col("vec_id"))
      .agg(sum(col("pd2")).as("adc_dist"))
    // final ranking through the bounded top-k AGGREGATE (x276's form, r15
    // verdict task 3): the probed-candidate frame grows with the corpus,
    // so no second full shuffle+sort — the probe window above is bounded
    // by nCells and stays. `window = true` keeps the rank-window twin for
    // the bit-identity spec.
    if (window) {
      val w = Window.partitionBy(col("q_id")).orderBy(col("adc_dist"), col("vec_id"))
      adc.withColumn("rank", row_number().over(w).cast("int"))
        .filter(col("rank") <= k)
    } else {
      import graft.functions.TopKLongPairs.top_k_long_pairs
      adc.groupBy(col("q_id"))
        .agg(top_k_long_pairs(col("adc_dist"), col("vec_id"), k).as("top"))
        .select(col("q_id"), posexplode(col("top")))
        .select(col("q_id"), col("col.id").as("vec_id"),
          col("col.sk").as("adc_dist"),
          (col("pos") + 1).cast("int").as("rank"))
    }
  }

  /** x272's oracle. */
  def adcOracleSql: String =
    s"""${pqChainSql()}
       |SELECT q_id, vec_id, adc_dist, CAST(rank AS INTEGER) AS rank
       |FROM pq WHERE rank <= $PqTopK""".stripMargin

  /** x283's oracle: the SAME chain at production geometry — the builder
    * parameterization IS the gate (nothing else moves). x285 passes
    * `codes = PqFullCodes` for the full K=256 deployment shape. */
  def prodAdcOracleSql(codes: Int = PqProdCodes): String =
    s"""${pqChainSql(PqProdSubspaces, PqProdSubDim, codes)}
       |SELECT q_id, vec_id, adc_dist, CAST(rank AS INTEGER) AS rank
       |FROM pq WHERE rank <= $PqTopK""".stripMargin

  /** x273's oracle. */
  def distortionOracleSql: String =
    s"""${pqChainSql()},
       |tru AS (SELECT q.vec_id AS q_id, e2.vec_id, ${d2Sql("q.qv", "e2.qv")} AS true_d2
       |  FROM e q JOIN e e2 ON e2.vec_id <> q.vec_id WHERE q.vec_id < $PqQHi),
       |ex AS (SELECT q_id, vec_id, true_d2,
       |  row_number() OVER (PARTITION BY q_id ORDER BY true_d2, vec_id) AS rank
       |  FROM tru)
       |SELECT p.q_id,
       |  CAST(count(x.vec_id) AS BIGINT) AS n_overlap,
       |  CAST(sum(xt.true_d2) AS BIGINT) AS exact_sum_d2,
       |  CAST(sum(t.true_d2) AS BIGINT) AS pq_sum_d2
       |FROM (SELECT * FROM pq WHERE rank <= $PqTopK) p
       |JOIN tru t ON t.q_id = p.q_id AND t.vec_id = p.vec_id
       |LEFT JOIN (SELECT * FROM ex WHERE rank <= $PqTopK) x
       |  ON x.q_id = p.q_id AND x.vec_id = p.vec_id
       |JOIN (SELECT q_id, rank, true_d2 FROM ex WHERE rank <= $PqTopK) xt
       |  ON xt.q_id = p.q_id AND xt.rank = p.rank
       |GROUP BY 1""".stripMargin

  /** x279's oracle: the PQ chain's ranked ADC candidates, pool-bounded,
    * exact-reranked on the quantized vectors. */
  def rerankOracleSql: String =
    s"""${pqChainSql()},
       |pool AS (SELECT q_id, vec_id FROM pq WHERE rank <= ${PqTopK * PqRerankFactor}),
       |rer AS (SELECT p.q_id, p.vec_id, ${d2Sql("q.qv", "e2.qv")} AS exact_d2
       |  FROM pool p JOIN e e2 ON e2.vec_id = p.vec_id
       |  JOIN e q ON q.vec_id = p.q_id)
       |SELECT q_id, vec_id, exact_d2, CAST(rank AS INTEGER) AS rank
       |FROM (SELECT q_id, vec_id, exact_d2,
       |        row_number() OVER (PARTITION BY q_id ORDER BY exact_d2, vec_id) AS rank
       |      FROM rer) WHERE rank <= $PqTopK""".stripMargin

  /** x274's oracle: the PQ chain plus the coarse full-dimension Lloyd
    * chain, cell assignment, probe selection, and the cell-restricted
    * ADC. Parameterized on PQ geometry (r17): x284 replays the SAME
    * composition at the production shape (the coarse quantizer is
    * full-dimension in both, so only the PQ chain moves). */
  def ivfPqOracleSql(subspaces: Int = PqSubspaces,
                     subDim: Int = PqSubDim,
                     codes: Int = PqCodes): String = {
    val ccbF = s"ccb$PqIters"
    s"""${encLutSql(subspaces, subDim, codes)},
       |csub AS (SELECT vec_id, 0 AS m, qv AS sv FROM e),
       |ccb0 AS (SELECT m, vec_id AS code, sv AS cv FROM csub WHERE vec_id < $IvfPqCells),
       |${lloydChainSql("csub", "c", subspaces * subDim)},
       |cells AS (SELECT s.vec_id,
       |  min(${d2Sql("s.sv", "c.cv")}*65536 + c.code) % 65536 AS cell
       |  FROM csub s JOIN $ccbF c ON s.m = c.m GROUP BY 1),
       |pr AS (SELECT s.vec_id, c.code,
       |  row_number() OVER (PARTITION BY s.vec_id
       |    ORDER BY ${d2Sql("s.sv", "c.cv")}, c.code) AS p_rank
       |  FROM csub s JOIN $ccbF c ON s.m = c.m WHERE s.vec_id < $PqQHi),
       |probes AS (SELECT vec_id AS q_id, code AS cell FROM pr WHERE p_rank <= $IvfPqProbe),
       |adcr AS (SELECT p.q_id, cl.vec_id, CAST(sum(l.pd2) AS BIGINT) AS adc_dist
       |  FROM cells cl JOIN probes p ON cl.cell = p.cell
       |  JOIN enc e2 ON e2.vec_id = cl.vec_id
       |  JOIN lut l ON l.q_id = p.q_id AND l.m = e2.m AND l.code = e2.code
       |  WHERE cl.vec_id <> p.q_id GROUP BY 1, 2)
       |SELECT q_id, vec_id, adc_dist, CAST(rank AS INTEGER) AS rank
       |FROM (SELECT q_id, vec_id, adc_dist,
       |        row_number() OVER (PARTITION BY q_id ORDER BY adc_dist, vec_id) AS rank
       |      FROM adcr) WHERE rank <= $PqTopK""".stripMargin
  }
}
