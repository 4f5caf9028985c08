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
  def hybridRelated(spark: SparkSession, dir: String,
                    k: Int = HybridK, kRrf: Int = HybridRrfK,
                    rankedTable: (SparkSession, String, Int) => DataFrame =
                      KnnStage.ranked(_, _, _)): DataFrame = {
    val sem = rankedTable(spark, dir, math.max(k, KnnStage.StageK))
      .filter(col("rank") <= k)
      .select(col("q_id").as("doc_id"), col("vec_id").as("rel_id"),
        col("rank").cast("long").as("r_sem"))
    val pairs = Dedup.tfCosinePairs(spark, dir)
      .select(col("doc_a"), col("doc_b"), col("cos_dbl"))
    val symm = pairs.select(col("doc_a").as("doc_id"), col("doc_b").as("rel_id"), col("cos_dbl"))
      .union(pairs.select(col("doc_b").as("doc_id"), col("doc_a").as("rel_id"), col("cos_dbl")))
    val wl = Window.partitionBy(col("doc_id"))
      .orderBy(col("cos_dbl").desc, col("rel_id"))
    val lex = symm.withColumn("r_lex", row_number().over(wl).cast("long"))
      .filter(col("r_lex") <= k)
      .select(col("doc_id"), col("rel_id"), col("r_lex"))
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
}
