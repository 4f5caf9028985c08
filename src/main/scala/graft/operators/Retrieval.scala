package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Ranked retrieval over the `documents` table (x73) — the query-side
  * consumer of x51's inverted-index statistics: score candidate documents
  * for a set of keyword queries with a BM25-family weighting and return
  * the top-k per query.
  *
  * Scoring is the LOG-FREE BM25 rational form, so every number is a ratio
  * of BIGINTs and the whole score is ONE integer division — bit-exact
  * cross-engine (the repo's tfidf/x49 discipline; a true `log` idf would
  * inherit libm rounding differences, which are not IEEE-pinned):
  *
  *   tf_part = tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))   k1=6/5, b=3/4
  *           = 22·tf·W / (10·tf·W + 3·W + 9·dl·N)           avgdl = W/N
  *   idf_r   = (N − df + ½) / (df + ½) = (2(N−df)+1) / (2df+1)
  *   points  = (Scale · 22·tf·W · (2(N−df)+1))
  *               div ((10·tf·W + 3·W + 9·dl·N) · (2df+1))
  *
  * `idf_r` is the BM25+ idf with the log dropped: per-term it is a
  * monotone transform of the classical idf, and because rare terms get
  * polynomially (not logarithmically) more weight, the ranking gives
  * rare-term matches strictly more influence — a documented variant
  * choice, not an approximation of the log form.
  *
  * 100 TB shape: the query set is spec-sized and broadcasts into the
  * token explode, so only postings of QUERY terms ever shuffle (the
  * corpus-wide vocabulary is never aggregated); `dl` rides the explode as
  * a grouping column, so no join back to a doc-length table; the postings
  * frame is materialized ONCE (`localCheckpoint`, the CC engine's
  * discipline) and df is a partial-aggregable groupBy over it — map-side
  * combine shrinks even a stop-word term's corpus-sized postings to one
  * row per mapper, and the resulting df table (≤ one row per query term)
  * broadcasts back onto the postings. No per-term window anywhere, so a
  * caller passing "the" costs O(postings) distributed work, never a
  * single-task corpus-sized window partition (the round-7 skew bound,
  * now closed); the checkpoint is what keeps the df branch from
  * re-deriving the postings subtree with a second corpus scan (Spark
  * does not reuse unpersisted subplans). Corpus totals (W, N) are a
  * broadcast 1-row aggregate (x42's pattern — one documented extra scan
  * of the text column); and the per-query top-k is a rank window that
  * Spark executes with WindowGroupLimit, pruning to k rows per query
  * BEFORE the final shuffle.
  *
  * Overflow bound (documented like x65's): |numerator| ≤
  * Scale·22·tf·W·(2N+1) must stay under 2⁶³ — holds through sf0.1 by
  * orders of magnitude (≈10¹⁷); at true corpus scale the dl/avgdl ratio
  * would be quantized first (x52's trick) to keep W out of the product.
  * The bound is now ENFORCED, not just documented: a guard branch inside
  * the points expression (double-precision product test with a 2⁶²·1.8
  * ceiling, so the test itself cannot wrap) raises a descriptive error
  * instead of letting non-ANSI Long arithmetic wrap silently — the
  * asymmetric-corruption mode (Spark wraps, DuckDB raises) a silent
  * overflow would open.
  */
object Retrieval {

  /** Pinned keyword queries (x73) — the evaluation query set frozen as a
    * constant and interpolated into BOTH the Spark plan and the DuckDB
    * oracle (the PinnedBpeMerges pattern). */
  val Bm25Queries: Seq[(Int, Seq[String])] = Seq(
    1 -> Seq("query", "scan", "fast"),
    2 -> Seq("join", "merge", "hash"),
    3 -> Seq("window", "sort", "stream"),
    4 -> Seq("spark", "table"),
    5 -> Seq("key", "value", "column", "row"))

  /** Results per query, and the fixed-point scale of the integer score
    * (1 point = 10⁻⁵ of the rational BM25 score) — shared with the
    * oracle SQL. */
  val Bm25TopK: Int = 10
  val Bm25Scale: Long = 100000L

  /** Per-(term, doc) integer score expression — kept as ONE SQL string so
    * the Scaladoc algebra, this expression, and the oracle SQL are
    * visibly the same formula. Expects columns tf, dl, df, w_total,
    * n_docs (all BIGINT). */
  private[graft] def pointsSqlExpr: String =
    s"CAST((${Bm25Scale}L * 22L * tf * w_total * (2L * (n_docs - df) + 1L)) div " +
      "((10L * tf * w_total + 3L * w_total + 9L * dl * n_docs) * (2L * df + 1L)) AS BIGINT)"

  def bm25TopK(spark: SparkSession, dir: String,
               queries: Seq[(Int, Seq[String])] = Bm25Queries,
               k: Int = Bm25TopK): DataFrame = {
    require(queries.nonEmpty && k >= 1, "need at least one query and k >= 1")
    val spark2 = spark; import spark2.implicits._
    val qterms = queries.flatMap { case (qid, ts) => ts.map(qid -> _) }
      .toDF("query_id", "term")
    // every corpus-derived input reads the STAGE ([[TermStage]]): doc
    // lengths and totals from the O(docs) length table, postings from
    // the doc-term aggregate filtered to query terms — no text re-scan
    val doclen = TermStage.docLengths(spark, dir)
    val totals = doclen.agg(
      sum(col("n_tokens")).as("w_total"),
      count(lit(1)).as("n_docs"))
    val tf = TermStage.docTermFreq(spark, dir)
      .join(broadcast(qterms.select(col("term")).distinct()), Seq("term"))
      .join(doclen.select(col("doc_id"), col("n_tokens").as("dl")), Seq("doc_id"))
      .select(col("term"), col("doc_id"), col("dl"), col("tf"))
      .localCheckpoint() // materialize postings once: feeds df AND scoring
    // df per term as a partial-agg'd groupBy over the checkpointed
    // postings (≤ one output row per query term — broadcast back). A
    // window partitioned by term would instead buffer one term's whole
    // postings list in one task: a skew key the moment a query contains
    // a stop word.
    val dfByTerm = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    // guard the documented numerator bound in double precision (cannot
    // wrap) instead of letting non-ANSI Long arithmetic wrap silently
    val guard = col("tf").cast("double") * col("w_total").cast("double") *
      (lit(2.0) * col("n_docs").cast("double") + lit(1.0)) *
      lit(22.0 * Bm25Scale) > lit(Long.MaxValue.toDouble * 0.9)
    val scored = tf
      .join(broadcast(dfByTerm), Seq("term"))
      .join(broadcast(qterms), Seq("term"))
      .crossJoin(broadcast(totals))
      .withColumn("points",
        when(guard, raise_error(lit("BM25 points numerator would exceed Long: " +
          "Scale*22*tf*W*(2N+1) over bound; quantize dl/avgdl (Scaladoc)")))
          .otherwise(expr(pointsSqlExpr)))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("n_terms"), sum(col("points")).as("score_pts"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_pts").desc, col("doc_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id").cast("long").as("query_id"), col("rank"),
        col("doc_id"), col("n_terms"), col("score_pts"))
  }

  /** x239 knobs: per-system depth and the RRF damping constant (x137's
    * integer convention: `10⁶ div (kRrf + rank)`). Shared with the
    * oracle. */
  val HybridK: Int = 5
  val HybridRrfK: Int = 60

  /** Hybrid related-document retrieval (x239): reciprocal-rank fusion
    * of the two staged "related items" systems a production corpus
    * serves — the SEMANTIC neighbor list ([[KnnStage]]'s exact table;
    * swap-parameterized like every staged-table consumer, so
    * [[AnnStage]] drops in at 100 TB) and the LEXICAL near-dup ranking
    * (x163's TF-cosine pair evidence, symmetrized and ranked per doc by
    * its 3-IEEE-op `cos_dbl` — bit-identical cross-engine — ties to the
    * smaller partner id). Per (doc, candidate): both system ranks (−1
    * when a system did not surface the pair), the x137 integer RRF
    * score, and the fused rank. Hybrid fusion is the standard answer to
    * "embedding recall misses keyword matches and vice versa"; this is
    * that operator over THIS library's own staged artifacts.
    *
    * 100 TB shape: both inputs are staged O(N·k)-ish tables (the gram
    * stage bounds lexical pair fan-out by the df cap); the fusion is a
    * full-outer join on (doc, candidate) and two bounded-partition
    * windows (≤ 2k rows per doc). */
  /** The SEMANTIC top-k list per doc (x239's first system), from the
    * staged exact-kNN table (swap-parameterized so [[AnnStage]] drops in
    * at 100 TB). Shared by [[hybridRelated]] and [[rankAgreement]]. */
  private def semRanked(spark: SparkSession, dir: String, k: Int,
                        rankedTable: (SparkSession, String, Int) => DataFrame)
      : DataFrame =
    rankedTable(spark, dir, math.max(k, KnnStage.StageK))
      .filter(col("rank") <= k)
      .select(col("q_id").as("doc_id"), col("vec_id").as("rel_id"),
        col("rank").cast("long").as("r_sem"))

  /** The LEXICAL top-k list per doc (x239's second system): x163's
    * TF-cosine pair evidence symmetrized and ranked by `cos_dbl`, ties
    * to the smaller partner id. Shared by [[hybridRelated]] and
    * [[rankAgreement]]. */
  private def lexRanked(spark: SparkSession, dir: String, k: Int): DataFrame = {
    val pairs = Dedup.tfCosinePairs(spark, dir)
      .select(col("doc_a"), col("doc_b"), col("cos_dbl"))
    val symm = pairs.select(col("doc_a").as("doc_id"), col("doc_b").as("rel_id"), col("cos_dbl"))
      .union(pairs.select(col("doc_b").as("doc_id"), col("doc_a").as("rel_id"), col("cos_dbl")))
    val wl = Window.partitionBy(col("doc_id"))
      .orderBy(col("cos_dbl").desc, col("rel_id"))
    symm.withColumn("r_lex", row_number().over(wl).cast("long"))
      .filter(col("r_lex") <= k)
      .select(col("doc_id"), col("rel_id"), col("r_lex"))
  }

  def hybridRelated(spark: SparkSession, dir: String,
                    k: Int = HybridK, kRrf: Int = HybridRrfK,
                    rankedTable: (SparkSession, String, Int) => DataFrame =
                      KnnStage.ranked(_, _, _)): DataFrame = {
    val sem = semRanked(spark, dir, k, rankedTable)
    val lex = lexRanked(spark, dir, k)
    val fused = sem.join(lex, Seq("doc_id", "rel_id"), "full_outer")
      .withColumn("rrf_micro",
        coalesce(expr(s"1000000L div ($kRrf + r_sem)"), lit(0L)) +
          coalesce(expr(s"1000000L div ($kRrf + r_lex)"), lit(0L)))
    val wf = Window.partitionBy(col("doc_id"))
      .orderBy(col("rrf_micro").desc, col("rel_id"))
    fused.withColumn("r_fused", row_number().over(wf).cast("long"))
      .select(col("doc_id"), col("rel_id"),
        coalesce(col("r_sem"), lit(-1L)).as("r_sem"),
        coalesce(col("r_lex"), lit(-1L)).as("r_lex"),
        col("rrf_micro"), col("r_fused"))
  }

  /** Truncated rank-biased-overlap weights at persistence p = 1/2,
    * exact-integer form: returns `(w(1..k), den)` with
    * `w(m) = Σ_{d=m..k} 2^(k−d)·(L/d)` and `den = 2^k·L`, `L = lcm(1..k)`,
    * so `RBO@k(A,B) = Σ_{items in A∩B} w(max(r_A, r_B)) / den` — the
    * per-item telescoping of Webber et al.'s `(1−p)·Σ p^(d−1)·|A_d∩B_d|/d`
    * (an item contributes to every prefix depth ≥ the later of its two
    * ranks). All-integer, so both engines agree bit-for-bit; shared with
    * the x260 oracle. */
  private[graft] def rboWeights(k: Int): (Seq[Long], Long) = {
    // k ≤ 16: not just "weights fit Long" — rankAgreement later scales
    // the numerator (≤ lcm(1..k)·(2^k−1)) by 1,000,000, which crosses
    // 2^63 between k=18 (3.2e18 ✓) and k=19 (1.2e20 ✗); Spark's multiply
    // would wrap silently where DuckDB errors loudly, so stop at 16 for
    // ~200× headroom rather than ride the edge.
    require(k >= 1 && k <= 16,
      "need 1 <= k <= 16 (micro-scaled RBO numerator must fit Long)")
    @annotation.tailrec
    def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
    val lcm = (1 to k).foldLeft(1L)((l, d) => l / gcd(l, d) * d)
    val terms = (1 to k).map(d => (1L << (k - d)) * (lcm / d))
    ((1 to k).map(m => terms.drop(m - 1).sum), (1L << k) * lcm)
  }

  /** Ranked-list agreement between the two retrieval systems (x260):
    * per query doc, the truncated rank-biased overlap @k (p = 1/2)
    * between its semantic top-k and its lexical top-k — THE standard
    * top-weighted measure of "do my two related-item systems agree",
    * the diagnostic read before fusing them (x239) or retiring one.
    * Exact integers throughout ([[rboWeights]]); `rbo_micro` is the
    * floor-scaled ratio, 968750 = identical lists (1 − p^k), 0 =
    * disjoint.
    *
    * 100 TB shape: both inputs are the same staged O(N·k) tables x239
    * fuses; the overlap is one equi-join on (doc, candidate) + an
    * O(k)-wide per-doc rollup — no new corpus-scale work. */
  def rankAgreement(spark: SparkSession, dir: String, k: Int = HybridK,
                    rankedTable: (SparkSession, String, Int) => DataFrame =
                      KnnStage.ranked(_, _, _)): DataFrame = {
    val (w, den) = rboWeights(k)
    val joint = semRanked(spark, dir, k, rankedTable)
      .join(lexRanked(spark, dir, k), Seq("doc_id", "rel_id"))
      .select(col("doc_id"),
        element_at(array(w.map(lit(_)): _*),
          greatest(col("r_sem"), col("r_lex")).cast("int")).as("w_pts"))
    val agg = joint.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_common"), sum(col("w_pts")).as("rbo_num_pts"))
    // every doc with a semantic list appears, 0-overlap docs included
    semRanked(spark, dir, k, rankedTable).select(col("doc_id")).distinct()
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        coalesce(col("rbo_num_pts"), lit(0L)).as("rbo_num_pts"))
      .withColumn("rbo_micro", expr(s"rbo_num_pts * 1000000L div $den"))
  }
}
