package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Preference-data aggregation (x287–x289): the RLHF-era side of a
  * training-data pipeline — pairwise "A beats B" judgments rolled up to
  * per-source win-rate matrices and Bradley–Terry strength scores, the
  * aggregation a preference-tuning corpus runs before any reward-model
  * fit (which generator/source wins head-to-heads, and by how much once
  * the strength of its opponents is accounted for).
  *
  * Duel derivation (the deterministic comparison corpus): each even
  * `doc_id` challenges the document at
  * `doc_id + 1 + (doc_id div 20) mod 19` — a BLOCK-ROTATED partner
  * offset, still a plain equi-join on a computed key (never a window or
  * a sort: one O(corpus) shuffle at any scale). The rotation matters:
  * the synthetic tables assign `source` round-robin by `doc_id`, so a
  * constant offset would collapse the duel graph to a fixed
  * source-matching (every src0 duel vs src1, …) and Bradley–Terry would
  * degenerate to per-pair win rates; rotating the offset per 20-doc
  * block connects all sources through shared opponents — the graph
  * shape strength propagation exists for. Same-source duels are
  * filtered (no signal for a source-level fit). The winner is the
  * greater `(n_chars, md5(text))` tuple — a total, engine-agnostic
  * order (md5 hex compares identically in Spark and DuckDB), standing
  * in for a human/LLM judgment the way the synthetic tables stand in
  * for a crawl.
  *
  * Bradley–Terry fit: Hunter's MM iteration
  * `w_i ← W_i / Σ_j n_ij / (w_i + w_j)` with ALL-INTEGER arithmetic in
  * micro-units (the x77 PageRank discipline — floor-division dust is
  * part of the pinned contract, replicated verbatim by the oracle, so
  * results are bit-identical cross-engine where a float fit would hash-
  * drift). Both numerator and denominator are divided by each item's
  * total game count N_i first — the update is invariant under that
  * rescale in exact arithmetic, and in integers it makes EVERY
  * intermediate corpus-size-independent:
  *
  *   wr_i   = W_i·10⁶ div N_i            ≤ 10⁶   (win rate, micro)
  *   r_ij   = n_ij·10⁶ div N_i           Σ_j r_ij ≤ 10⁶
  *   denom  = Σ_j r_ij·(10¹² div (w_i+w_j))
  *          ≤ 10⁶ · 10¹²div(2·10³)  =  5·10¹⁴    (clamp floor 10³)
  *   w_i'   = clamp(wr_i·10¹² div max(denom,1), 10³, 10⁹)
  *
  * so the fit stays below 2⁶³ for ANY corpus size and ANY item
  * universe — no documented envelope needed, unlike count-based forms
  * whose `n_ij·10¹²` overflows near 10⁷ duels per pair. Strengths are
  * clamped to [10³, 10⁹] (odds beyond 1000:1 saturate; the floor keeps
  * `w_i + w_j` nonzero for never-winning sources). Everything is
  * non-negative, so Spark's truncating `div` and DuckDB's flooring `//`
  * agree exactly.
  *
  * 100 TB shape: duels are one linear pass; the win matrix is one
  * partial-agg'd shuffle down to O(items²) OBSERVED pairs (items =
  * sources here, but the same plan holds when items are the millions of
  * crawl domains — nothing is collected to the driver); each MM round is
  * one broadcast-sized join + one hash aggregate on that pair table,
  * [[BtIters]] rounds pinned. The x289 concordance census is the only
  * quadratic — an items² self-join on the FITTED table (O(items²) rows,
  * never O(duels)), x270's bounded-contingency class.
  */
object Preference {

  /** Micro-unit scale, MM iteration count, and the strength clamp band —
    * pinned query contract, shared verbatim with the oracle SQL. */
  val BtUnit: Long = 1000000L
  val BtIters: Int = 5
  val BtClampLo: Long = 1000L       // BtUnit / 1000
  val BtClampHi: Long = 1000000000L // BtUnit * 1000

  /** Challenger side of the duel join: even docs keyed by their rotated
    * rival id. Split out (with [[rivalFrame]]/[[duelsFromFrames]]) so
    * the streaming duel ingester can run the SAME join incrementally
    * (new⋈staged + staged⋈new + new⋈new). */
  def challengerFrame(docs: DataFrame): DataFrame =
    docs.where(col("doc_id") % 2 === 0)
      .select(expr("doc_id + 1L + (doc_id div 20) % 19").as("rival_id"),
        col("source").as("src_a"), col("n_chars").as("len_a"),
        md5(col("text")).as("h_a"))

  /** Rival side: every doc keyed by its own id (any doc can be
    * challenged). */
  def rivalFrame(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").as("rival_id"), col("source").as("src_b"),
      col("n_chars").as("len_b"), md5(col("text")).as("h_b"))

  /** The duel join + winner pick over prepared sides. */
  def duelsFromFrames(ch: DataFrame, rv: DataFrame): DataFrame =
    ch.join(rv, Seq("rival_id"))
      .where(col("src_a") =!= col("src_b"))
      .select(
        when(col("len_a") > col("len_b") ||
          (col("len_a") === col("len_b") && col("h_a") > col("h_b")),
          col("src_a")).otherwise(col("src_b")).as("winner"),
        when(col("len_a") > col("len_b") ||
          (col("len_a") === col("len_b") && col("h_a") > col("h_b")),
          col("src_b")).otherwise(col("src_a")).as("loser"))

  /** One row per duel: (winner_source, loser_source). Deterministic
    * block-rotated pairing, cross-source only (same-source duels carry
    * no signal for a source-level fit). */
  def duels(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    duelsFromFrames(challengerFrame(d), rivalFrame(d))
  }

  /** Mergeable win-matrix partial over a duel slice: per unordered
    * source pair, (duels, wins_lo) — pure sums, so batch partials fold
    * to the corpus census (the streaming ingester's append unit). */
  def duelCensusBatch(d: DataFrame): DataFrame =
    d.select(
      least(col("winner"), col("loser")).as("source_lo"),
      greatest(col("winner"), col("loser")).as("source_hi"),
      when(col("winner") < col("loser"), 1L).otherwise(0L).as("lo_win"))
      .groupBy(col("source_lo"), col("source_hi"))
      .agg(count(lit(1)).as("duels"), sum(col("lo_win")).as("wins_lo"))

  /** Fold census partials and derive the published ratios. */
  def foldedSourceDuels(census: DataFrame): DataFrame =
    census.groupBy(col("source_lo"), col("source_hi"))
      .agg(sum(col("duels")).as("duels"), sum(col("wins_lo")).as("wins_lo"))
      .select(col("source_lo"), col("source_hi"), col("duels"),
        col("wins_lo"), (col("duels") - col("wins_lo")).as("wins_hi"),
        expr(s"wins_lo * $BtUnit div duels").as("winrate_lo_micro"))

  /** x287: the unordered win-rate matrix — per source pair {lo < hi}
    * (string order): duel count, wins on each side, and the lo side's
    * win rate in micro-units. The panel a preference corpus is eyeballed
    * with before any model fit. */
  def sourceDuels(spark: SparkSession, dir: String): DataFrame =
    foldedSourceDuels(duelCensusBatch(duels(spark, dir)))

  /** Per-source duel stats: (source, games, wins) — the W_i / N_i of the
    * MM update, one partial-agg'd shuffle over the duel stream. */
  private def sourceStats(d: DataFrame): DataFrame =
    d.select(col("winner").as("source"), lit(1L).as("win"))
      .union(d.select(col("loser").as("source"), lit(0L).as("win")))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("games"), sum(col("win")).as("wins"))

  /** Bradley–Terry strengths over precomputed duels (composable
    * overload — callers with their own judgment stream skip the
    * document derivation). Output: one row per source with ≥ 1 duel:
    * (source, games, wins, winrate_micro, strength_micro). */
  def btStrengths(d0: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, "need iters >= 1")
    // materialize the duel stream once (r18): `sourceStats` and the pair
    // counts below each union two scans of it, so the uncut lineage
    // replayed the documents self-join (+ md5 of every text) four times
    // in one plan. One localCheckpoint = one duel computation.
    val d = d0.localCheckpoint()
    val stats = sourceStats(d)
    // perspective pair rates: (i, j, r_ij = n_ij·U div N_i)
    val n = d.select(col("winner").as("i"), col("loser").as("j"))
      .union(d.select(col("loser").as("i"), col("winner").as("j")))
      .groupBy(col("i"), col("j")).agg(count(lit(1)).as("n"))
    val rates = n
      .join(stats.select(col("source").as("i"), col("games")), Seq("i"))
      .select(col("i"), col("j"), expr(s"n * $BtUnit div games").as("r"))
      // reused every MM round: materialize the O(pairs) rate table once
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    try {
      val srcw = stats.select(col("source"),
        expr(s"wins * $BtUnit div games").as("wr"))
      var w = stats.select(col("source"), lit(BtUnit).as("w"))
      for (_ <- 1 to iters) {
        w = rates
          .join(w.select(col("source").as("i"), col("w").as("wi")), Seq("i"))
          .join(w.select(col("source").as("j"), col("w").as("wj")), Seq("j"))
          .select(col("i"),
            expr(s"r * (${BtUnit * BtUnit}L div (wi + wj))").as("term"))
          .groupBy(col("i")).agg(sum(col("term")).as("denom"))
          .join(srcw.select(col("source").as("i"), col("wr")), Seq("i"))
          .select(col("i").as("source"),
            expr(s"least(${BtClampHi}L, greatest(${BtClampLo}L, " +
              s"(wr * ${BtUnit * BtUnit}L) div greatest(denom, 1L)))")
              .as("w"))
          // each round reads the PREVIOUS strengths twice (wi AND wj) —
          // uncut, that lineage recomputes exponentially (w1 re-derived
          // 2^iters times). Checkpointing the O(items) table every round
          // keeps the chain linear — Spark's form of the MATERIALIZED
          // hint the DuckDB oracle needs for the same reason.
          .localCheckpoint()
      }
      stats.join(srcw, Seq("source")).join(w, Seq("source"))
        .select(col("source"), col("games"), col("wins"),
          col("wr").as("winrate_micro"), col("w").as("strength_micro"))
        // materialize the O(items) fit so the rate cache can be released
        .localCheckpoint()
    } finally rates.unpersist()
  }

  /** x288 entry: Bradley–Terry source strengths on the document duels. */
  def btStrengths(spark: SparkSession, dir: String,
                  iters: Int = BtIters): DataFrame =
    btStrengths(duels(spark, dir), iters)

  /** x289: does the BT fit reorder sources relative to raw win rate?
    * Kendall concordance census between the two rankings over all
    * source pairs (i < j by name): concordant / discordant / tied
    * counts plus the signed tau numerator `(conc − disc)·10⁶` — a pure
    * product, so no negative division crosses the Spark-div/DuckDB-//
    * rounding split. Quadratic ONLY in the fitted item table (x270's
    * bounded-contingency class), never in duels — and the pair expansion
    * is a constant-key equi-join + filter (a broadcast HASH join on the
    * O(items) fit), not a theta-join, so no BroadcastNestedLoopJoin
    * enters the plan inventory. */
  def btWinrateConcordance(spark: SparkSession, dir: String,
                           iters: Int = BtIters): DataFrame = {
    val s = btStrengths(spark, dir, iters)
    // non-foldable constant key: a literal would constant-fold to a
    // condition-free join (= BNLJ); a column-derived zero keeps the
    // equi-join a broadcast HASH join
    val a = s.select((col("winrate_micro") % 1).as("k"), col("source").as("sa"),
      col("winrate_micro").as("wra"), col("strength_micro").as("sta"))
    val b = s.select((col("winrate_micro") % 1).as("k"), col("source").as("sb"),
      col("winrate_micro").as("wrb"), col("strength_micro").as("stb"))
    val pairs = a.join(b, Seq("k"))
      .where(col("sa") < col("sb"))
      .select(col("k"),
        when((col("sta") > col("stb") && col("wra") > col("wrb")) ||
          (col("sta") < col("stb") && col("wra") < col("wrb")), 1L)
          .otherwise(0L).as("conc"),
        when((col("sta") > col("stb") && col("wra") < col("wrb")) ||
          (col("sta") < col("stb") && col("wra") > col("wrb")), 1L)
          .otherwise(0L).as("disc"))
    val nSources = s.agg(countDistinct(col("source")).as("n_sources"))
      .withColumn("k", col("n_sources") % 1)
    pairs.groupBy(col("k")).agg(
      count(lit(1)).as("n_pairs"),
      sum(col("conc")).as("concordant"),
      sum(col("disc")).as("discordant"))
      .join(nSources, Seq("k"))
      .select(col("n_sources"), col("n_pairs"), col("concordant"),
        col("discordant"),
        (col("n_pairs") - col("concordant") - col("discordant")).as("tied"),
        ((col("concordant") - col("discordant")) * BtUnit)
          .as("tau_num_micro"))
  }

  // ------------------------------------------------------------------
  // Oracle SQL (DuckDB) — same floor-div contract, CTE per MM round,
  // MATERIALIZED on every multiply-referenced CTE (DuckDB inlines by
  // default; each wN is referenced twice as wi/wj).
  // ------------------------------------------------------------------

  /** Shared duel CTE body (winner, loser). */
  private val duelSql: String =
    """duel AS MATERIALIZED (
      |  SELECT CASE WHEN d1.n_chars > d2.n_chars
      |              OR (d1.n_chars = d2.n_chars AND md5(d1.text) > md5(d2.text))
      |         THEN d1.source ELSE d2.source END AS winner,
      |         CASE WHEN d1.n_chars > d2.n_chars
      |              OR (d1.n_chars = d2.n_chars AND md5(d1.text) > md5(d2.text))
      |         THEN d2.source ELSE d1.source END AS loser
      |  FROM documents d1 JOIN documents d2
      |    ON d2.doc_id = d1.doc_id + 1 + (d1.doc_id // 20) % 19
      |  WHERE d1.doc_id % 2 = 0 AND d1.source <> d2.source)""".stripMargin

  /** x287 oracle. */
  def sourceDuelsOracleSql: String =
    s"""WITH $duelSql
       |SELECT source_lo, source_hi,
       |       CAST(count(*) AS BIGINT) AS duels,
       |       CAST(sum(lo_win) AS BIGINT) AS wins_lo,
       |       CAST(count(*) - sum(lo_win) AS BIGINT) AS wins_hi,
       |       CAST(sum(lo_win) * $BtUnit // count(*) AS BIGINT) AS winrate_lo_micro
       |FROM (SELECT least(winner, loser) AS source_lo,
       |             greatest(winner, loser) AS source_hi,
       |             CASE WHEN winner < loser THEN 1 ELSE 0 END AS lo_win
       |      FROM duel)
       |GROUP BY 1, 2""".stripMargin

  /** The MM chain: stats/rates/winrate CTEs plus w0..w{iters}; the
    * caller appends its own final SELECT over `stats`/`srcw`/`w$iters`. */
  private def btChainSql(iters: Int): String = {
    val u2 = BtUnit * BtUnit
    val rounds = (1 to iters).map { i =>
      val prev = s"w${i - 1}"
      s"""w$i AS MATERIALIZED (
         |  SELECT p.i AS source,
         |    CAST(LEAST($BtClampHi, GREATEST($BtClampLo,
         |      (sw.wr * $u2) // GREATEST(1, SUM(p.r * ($u2 // (wi.w + wj.w))))))
         |      AS BIGINT) AS w
         |  FROM prs p JOIN $prev wi ON wi.source = p.i
         |             JOIN $prev wj ON wj.source = p.j
         |             JOIN srcw sw ON sw.source = p.i
         |  GROUP BY p.i, sw.wr)""".stripMargin
    }.mkString(",\n")
    s"""$duelSql,
       |stats AS MATERIALIZED (
       |  SELECT source, CAST(count(*) AS BIGINT) AS games,
       |         CAST(sum(win) AS BIGINT) AS wins
       |  FROM (SELECT winner AS source, 1 AS win FROM duel
       |        UNION ALL SELECT loser, 0 FROM duel)
       |  GROUP BY 1),
       |prs AS MATERIALIZED (
       |  SELECT p.i, p.j, CAST(p.n * $BtUnit // s.games AS BIGINT) AS r
       |  FROM (SELECT i, j, CAST(count(*) AS BIGINT) AS n
       |        FROM (SELECT winner AS i, loser AS j FROM duel
       |              UNION ALL SELECT loser, winner FROM duel)
       |        GROUP BY 1, 2) p
       |  JOIN stats s ON s.source = p.i),
       |srcw AS MATERIALIZED (
       |  SELECT source, CAST(wins * $BtUnit // games AS BIGINT) AS wr
       |  FROM stats),
       |w0 AS MATERIALIZED (
       |  SELECT source, CAST($BtUnit AS BIGINT) AS w FROM stats),
       |$rounds""".stripMargin
  }

  /** x288 oracle. */
  def btOracleSql(iters: Int = BtIters): String =
    s"""WITH ${btChainSql(iters)}
       |SELECT s.source, s.games, s.wins, sw.wr AS winrate_micro,
       |       wf.w AS strength_micro
       |FROM stats s JOIN srcw sw ON sw.source = s.source
       |             JOIN w$iters wf ON wf.source = s.source""".stripMargin

  /** x289 oracle: the full BT replay, then the pair census. */
  def concordanceOracleSql(iters: Int = BtIters): String =
    s"""WITH ${btChainSql(iters)},
       |fit AS MATERIALIZED (
       |  SELECT sw.source, sw.wr, wf.w
       |  FROM srcw sw JOIN w$iters wf ON wf.source = sw.source),
       |census AS (
       |  SELECT count(*) AS n_pairs,
       |    sum(CASE WHEN (a.w > b.w AND a.wr > b.wr)
       |              OR (a.w < b.w AND a.wr < b.wr) THEN 1 ELSE 0 END) AS conc,
       |    sum(CASE WHEN (a.w > b.w AND a.wr < b.wr)
       |              OR (a.w < b.w AND a.wr > b.wr) THEN 1 ELSE 0 END) AS disc
       |  FROM fit a JOIN fit b ON a.source < b.source)
       |SELECT CAST((SELECT count(*) FROM fit) AS BIGINT) AS n_sources,
       |       CAST(n_pairs AS BIGINT) AS n_pairs,
       |       CAST(conc AS BIGINT) AS concordant,
       |       CAST(disc AS BIGINT) AS discordant,
       |       CAST(n_pairs - conc - disc AS BIGINT) AS tied,
       |       CAST((conc - disc) * $BtUnit AS BIGINT) AS tau_num_micro
       |FROM census""".stripMargin
}
