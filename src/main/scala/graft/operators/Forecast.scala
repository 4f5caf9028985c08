package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Forecast-evaluation analytics over the sales fact table — the layer
  * the reference pipeline feeds (its Gold output trains a sales
  * forecaster; these operators are the backtest/seasonality/elasticity
  * reports that sit NEXT to such a model in a production forecasting
  * ETL). All-integer arithmetic throughout: revenues in cents, ratios
  * in ppm fixed-point, signed quantities left undivided so no
  * floor-vs-truncate division ambiguity can split the engines.
  */
object Forecast {

  /** x117's seasonal lag in days (weekly seasonality) — shared with the
    * oracle SQL. */
  val SeasonalLagDays: Int = 7

  /** Seasonal-naive backtest (x117): score the forecast "this day's
    * revenue = the same weekday's revenue one week ago" per brand — the
    * baseline every grocery demand model must beat, and the standard
    * sanity row in a forecast-accuracy dashboard.
    *
    * Semantics: the daily series is OBSERVED-sales days (a (brand, day)
    * with no lineitem contributes no evaluation row); the lag-7 lookup
    * is an equi-join on (brand, day−7) with a missing week treated as a
    * 0-forecast (`coalesce`). Evaluation starts at `global_min_day + 7`
    * so no brand is scored on days where the lag could not exist. WAPE
    * is reported in ppm (`10⁶·Σ|err| div Σactual` — denominators are
    * positive by construction since only observed-sales days enter);
    * the signed total error stays an undivided cents column (negative
    * values + `div` floor/truncate mismatch is the known cross-engine
    * trap).
    *
    * 100 TB shape: one fact-scan partial-agg'd groupBy on
    * (brand, day) — the only corpus-sized shuffle — then a self
    * equi-join of the O(brands·days) daily frame on (brand, day−7) and
    * a final partial-agg'd rollup to O(brands). The global min day is a
    * 1-row scalar agg crossJoined back (broadcast by size — x65's
    * global-totals pattern), never a window. The part join ships brand
    * onto the fact rows before aggregation; AQE broadcasts it at small
    * SF and it stays a plain dim equi-join at any scale. The daily
    * frame is `localCheckpoint`ed (O(brands·days) rows) because THREE
    * consumers read it — the actuals side, the lag-7 side, and the min
    * scalar — and each would otherwise re-run the corpus scan. */
  /** The per-(brand, epoch-day) revenue series — the ONE corpus-sized
    * scan+shuffle shared by x117's backtest and x124's gap-fill, so the
    * two can never disagree on what a day's revenue is. */
  private[graft] def dailyRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_partkey"),
        expr("unix_timestamp(l_shipdate) div 86400").as("day"),
        Relational.cents(col("l_extendedprice")).as("v"))
      .join(Tables.part(spark, dir).select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("day"))
      .agg(sum(col("v")).as("rev_cents"))

  def seasonalBacktest(spark: SparkSession, dir: String,
                       lagDays: Int = SeasonalLagDays): DataFrame = {
    val daily = dailyRevenue(spark, dir).localCheckpoint()
    val minDay = daily.agg(min(col("day")).as("min_day"))
    daily
      .join(daily.select(col("p_brand"),
          (col("day") + lagDays).as("day"), col("rev_cents").as("fc_cents")),
        Seq("p_brand", "day"), "left")
      .crossJoin(minDay)
      .filter(col("day") >= col("min_day") + lagDays)
      .withColumn("fc_cents", coalesce(col("fc_cents"), lit(0L)))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("rev_cents")).as("actual_cents"),
        sum(col("rev_cents") - col("fc_cents")).as("err_cents"),
        sum(abs(col("rev_cents") - col("fc_cents"))).as("abs_err_cents"))
      .withColumn("wape_ppm", expr("(1000000L * abs_err_cents) div actual_cents"))
  }

  /** Day-of-week revenue profile (x118): per brand, each weekday's share
    * of revenue in ppm and the peak weekday — the weekly-seasonality
    * fingerprint x117's naive forecast exploits, and the report a
    * category manager reads to schedule promotions.
    *
    * The weekday is computed arithmetically (`(epoch_day + 4) % 7`,
    * 0 = Monday) so both engines derive it from the same integer — no
    * locale-dependent date function in the compare path. The peak pick
    * is the partial-aggregable struct extremum (x104's windowless
    * argmax): max over (rev, dow) lexicographic pairs, ties broken
    * toward the LARGER weekday, replicated in the oracle as the ordered
    * row_number twin.
    *
    * 100 TB shape: one fact-scan partial-agg'd groupBy onto the
    * O(brands·7) frame — `localCheckpoint`ed, since both the rollup and
    * the final join read it and would otherwise re-run the corpus
    * scan; everything after (brand totals, peak extremum, share
    * division) lives on that tiny frame and joins back broadcast by
    * size. No window over corpus-derived rows, no collect. */
  def dowProfile(spark: SparkSession, dir: String): DataFrame = {
    val byDow = Tables.lineitem(spark, dir)
      .select(col("l_partkey"),
        expr("(unix_timestamp(l_shipdate) div 86400 + 4) % 7").as("dow"),
        Relational.cents(col("l_extendedprice")).as("v"))
      .join(Tables.part(spark, dir).select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("dow"))
      .agg(sum(col("v")).as("rev_cents"))
      .localCheckpoint()
    val perBrand = byDow.groupBy(col("p_brand"))
      .agg(sum(col("rev_cents")).as("total_cents"),
        max(struct(col("rev_cents"), col("dow"))).as("peak"))
      .select(col("p_brand"), col("total_cents"), col("peak.dow").as("peak_dow"))
    byDow.join(perBrand, Seq("p_brand"))
      .select(col("p_brand"), col("dow"), col("rev_cents"),
        expr("(1000000L * rev_cents) div total_cents").as("share_ppm"),
        (col("dow") === col("peak_dow")).cast("int").as("is_peak"))
  }

  /** Densify + forward-fill (x124): the gap-filling pass every forecast
    * pipeline runs before training — expand each brand's observed-sales
    * series to the FULL corpus day range, flag the missing days, and
    * carry the last observed revenue forward (`0` before a brand's
    * first sale). This is the complement of x117's observed-days
    * semantics: x117 scores only days that sold; this produces the
    * dense per-day matrix a model trains on.
    *
    * 100 TB shape: the corpus-sized work is [[dailyRevenue]]'s one
    * scan+shuffle (shared with x117, `localCheckpoint`ed here because
    * the grid brands, the day bounds, and the join all read it). The
    * dense grid is brands × days — generated by exploding a
    * `sequence(min_day, max_day)` against the O(brands) distinct list,
    * never by scanning the corpus. The forward-fill window partitions
    * by brand over that grid: each partition is one brand's TIME-
    * bounded day range (the calendar, not the corpus, sets its size —
    * the x48 tiny-table argument per partition). */
  def gapFill(spark: SparkSession, dir: String): DataFrame = {
    val daily = dailyRevenue(spark, dir).localCheckpoint()
    val bounds = daily.agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
    val grid = daily.select(col("p_brand")).distinct()
      .crossJoin(bounds)
      .select(col("p_brand"), explode(sequence(col("mn"), col("mx"))).as("day"))
    val w = Window.partitionBy(col("p_brand")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, 0)
    grid.join(daily, Seq("p_brand", "day"), "left")
      .select(col("p_brand"), col("day"), col("rev_cents"),
        col("rev_cents").isNull.cast("int").as("is_filled"),
        coalesce(last(col("rev_cents"), ignoreNulls = true).over(w), lit(0L))
          .as("filled_cents"))
  }

  /** Discount–demand slope (x119): per brand, the exact-rational OLS
    * slope of quantity on discount — "does marking this brand down
    * actually move volume", the price-elasticity screen a forecaster
    * feeds on.
    *
    * x = discount in whole percent (0–10 in this data), y = quantity in
    * centi-units; the slope numerator `n·Σxy − Σx·Σy` and denominator
    * `n·Σx² − (Σx)²` are published as RAW BIGINTs (slope = num/den when
    * den > 0; den = 0 means the brand saw a single discount level).
    * Nothing is divided: the numerator is legitimately negative for
    * elastic brands and signed integer division is the floor/truncate
    * cross-engine trap. Overflow bound (honest): with x ≤ 100 and
    * y ≤ 10⁴ centi-units, `n·Σxy ≤ 10⁶·n²` wraps past ~3·10⁶ ROWS PER
    * BRAND × … — concretely n ≤ 3·10⁶ per brand keeps every product
    * under 2⁶³; past that, rescale the sums first (x110's quantized
    *-share trick) — the guard is structural, documented here rather
    * than silently wrapped.
    *
    * 100 TB shape: one fact-scan partial-agg'd groupBy per brand (the
    * five sums all combine map-side); the dim join ships brand onto
    * fact rows as in x117. Output is O(brands). */
  def discountSlope(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_partkey"),
        round(col("l_discount") * 100).cast("long").as("x"),
        round(col("l_quantity") * 100).cast("long").as("y"))
      .join(Tables.part(spark, dir).select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      .select(col("p_brand"), col("n_rows"),
        (col("n_rows") * col("sxy") - col("sx") * col("sy")).as("slope_num"),
        (col("n_rows") * col("sxx") - col("sx") * col("sx")).as("slope_den"))

  /** Mean-shift change-point (x135): the split day of the daily order-
    * revenue series that maximizes |mean(before) − mean(after)| — the
    * first step of binary-segmentation change-point detection, the "did
    * the level shift, and when" question a revenue monitor answers
    * before any forecast is trusted.
    *
    * Exactness: candidate splits are scored by the cross-multiplied
    * integer |Σ_b·n_a − Σ_a·n_b| (no division), and the division only
    * happens ONCE per row for ranking/display — a single IEEE op on
    * exactly-replicated longs, identical in both engines (the repo's
    * avg discipline). Tie on the score breaks to the earliest day.
    *
    * Scoring arithmetic (r16): the ranking score IS the absolute mean
    * gap — |Σ_b·n_a − Σ_a·n_b| / (n_b·n_a) ≡ |Σ_b/n_b − Σ_a/n_a| — so
    * it is computed as the right-hand side: two divisions on EXACT
    * operands (rev sums < 2⁵³ cents, counts < 2³¹ — both exactly
    * representable), one subtraction, one abs, all individually
    * correctly-rounded IEEE ops on identical inputs in both engines →
    * bit-identical, and overflow-free at ANY corpus scale. The r16 sf1
    * gate first caught the cross-multiplied BIGINT form wrapping at
    * revenue × orders ≳ 2⁶³; the interim DECIMAL(38,0)/HUGEINT widening
    * was then itself rejected by review measurement: DuckDB's
    * HUGEINT→DOUBLE cast is NOT correctly rounded above 2⁶⁴ (1-ulp
    * drift on ~1.75% of values), so any path that materializes the
    * 128-bit product and casts it down is a latent cross-engine
    * mismatch — the mean-gap form never leaves 53-bit-exact territory.
    *
    * 100 TB shape: the corpus-sized work is ONE partial-agg'd
    * groupBy(day) onto the calendar-bounded daily frame
    * (`localCheckpoint`ed — the prefix window and the totals scalar
    * both read it); the prefix sums are a window over that tiny frame
    * (the x48 case), totals come back as a 1-row broadcast crossJoin
    * (x65's global-totals pattern), and the argmax is a TakeOrdered
    * top-1, never a driver collect of the series. */
  def meanShiftSplit(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .select(expr("unix_timestamp(o_orderdate) div 86400").as("day"),
        Relational.cents(col("o_totalprice")).as("v"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("rev"))
      .localCheckpoint()
    val totals = daily.agg(sum(col("n")).as("n_total"),
      sum(col("rev")).as("rev_total"))
    val wCum = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, 0)
    daily
      .withColumn("n_before", sum(col("n")).over(wCum))
      .withColumn("rev_before_cents", sum(col("rev")).over(wCum))
      .crossJoin(totals)
      .withColumn("n_after", col("n_total") - col("n_before"))
      .withColumn("rev_after_cents", col("rev_total") - col("rev_before_cents"))
      .filter(col("n_after") > 0)
      .withColumn("shift_dbl",
        abs(col("rev_before_cents").cast("double") / col("n_before").cast("double") -
          col("rev_after_cents").cast("double") / col("n_after").cast("double")))
      .orderBy(col("shift_dbl").desc, col("day"))
      .limit(1)
      .select(col("day").as("split_day"),
        col("n_before"), col("n_after"),
        col("rev_before_cents"), col("rev_after_cents"),
        (col("rev_before_cents").cast("double") / col("n_before").cast("double"))
          .as("mean_before_dbl"),
        (col("rev_after_cents").cast("double") / col("n_after").cast("double"))
          .as("mean_after_dbl"),
        col("shift_dbl"))
  }

  /** Life-table bucket width in days (weekly buckets) — shared with the
    * oracle SQL. */
  val LifeTableBucketDays: Int = 7

  /** Repeat-purchase life table (x150): the Kaplan–Meier input table for
    * "how long until a customer orders again". Every (customer, order
    * date) is a subject; the subject's duration is the gap to that
    * customer's NEXT distinct order date (an observed event) or to the
    * corpus's last order date (right-censored — the customer simply
    * hasn't reordered yet). Durations bucket into [[LifeTableBucketDays]]
    * buckets; the output row per bucket t carries `n_risk` (subjects
    * still unresolved entering t), `n_events`, `n_censored` — exactly
    * the (nᵢ, dᵢ, cᵢ) triple the KM product estimator Π(1 − dᵢ/nᵢ)
    * consumes. The product itself is left to the consumer: it is a
    * product of rationals and publishing the exact integer life table is
    * the cross-engine-stable contract (the x119 raw-rational discipline).
    *
    * Only observed buckets get rows; `n_risk` is still exact because the
    * risk set only changes at observed buckets (reverse-cumulative sum
    * of events + censors).
    *
    * 100 TB shape: the lead() window partitions by customer (bounded by
    * a customer's order count — no corpus-sized partition); the life
    * table itself is a post-agg table of O(max_gap / 7) rows, the
    * documented tiny-table case for its unpartitioned reverse-cumsum
    * window. One shuffle for the per-customer window, one for the
    * bucket groupBy. */
  def lifeTable(spark: SparkSession, dir: String): DataFrame = {
    val cd = Tables.orders(spark, dir)
      .select(col("o_custkey").as("c"), to_date(col("o_orderdate")).as("d"))
      .distinct()
    val mx = cd.agg(max(col("d")).as("maxd"))
    val w = Window.partitionBy(col("c")).orderBy(col("d"))
    val subjects = cd
      .withColumn("nd", lead(col("d"), 1).over(w))
      .crossJoin(broadcast(mx))
      .select(
        expr(s"CAST(datediff(coalesce(nd, maxd), d) AS BIGINT) " +
          s"div $LifeTableBucketDays").as("t_week"),
        col("nd").isNotNull.cast("long").as("ev"))
    val agg = subjects.groupBy(col("t_week"))
      .agg(sum(col("ev")).as("n_events"),
        sum(lit(1L) - col("ev")).as("n_censored"))
    val wRisk = Window.orderBy(col("t_week"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    agg.select(col("t_week"),
      sum(col("n_events") + col("n_censored")).over(wRisk).as("n_risk"),
      col("n_events"), col("n_censored"))
  }

  /** The pinned column pairs x152 publishes raw correlation moments for:
    * (label, x expression, y expression) over the lineitem fact scan.
    * The expressions are valid in BOTH Spark SQL and DuckDB — the oracle
    * interpolates them verbatim. Per-row terms fit a long; the SUMS are
    * promoted to DECIMAL(38,0) (see [[corrMoments]] Scaladoc). */
  val CorrPairs: Seq[(String, String, String)] = Seq(
    ("qty_discount",   "CAST(round(l_quantity) AS BIGINT)",
                       "CAST(round(l_discount * 100) AS BIGINT)"),
    ("qty_price",      "CAST(round(l_quantity) AS BIGINT)",
                       "CAST(round(l_extendedprice) AS BIGINT)"),
    ("discount_price", "CAST(round(l_discount * 100) AS BIGINT)",
                       "CAST(round(l_extendedprice) AS BIGINT)"),
    ("discount_tax",   "CAST(round(l_discount * 100) AS BIGINT)",
                       "CAST(round(l_tax * 100) AS BIGINT)"))

  /** Correlation-moment audit (x152): for each pinned measure pair the
    * EXACT raw moments (n, Σx, Σy, Σxy, Σx², Σy²) — everything Pearson's
    * r needs, published undivided so the gate compares integers, not
    * IEEE round-off. r² = (nΣxy − ΣxΣy)² / ((nΣx² − (Σx)²)(nΣy² −
    * (Σy)²)) is one consumer-side division; a monitoring layer typically
    * also wants the raw moments to MERGE windows (moments are additive,
    * r is not), which is why the moment table — not r — is the operator
    * contract (same reasoning as x119's raw-rational slope).
    *
    * Units: quantity in whole units (≤ 10²), discount/tax in whole
    * percent (≤ 10²), extendedprice in whole dollars (≤ 10⁵). Each
    * per-row term fits a long (worst product ≤ 10¹⁰), but Σ(price²) ≤
    * 10¹⁰·n would wrap signed 64-bit past n ≈ 9·10⁸ rows — under the
    * 100 TB target (~6·10¹¹ lineitems) — so every moment SUM runs over
    * DECIMAL(38,0) (headroom to n ≈ 10²⁸; Spark decimal agg, HUGEINT→
    * DECIMAL cast in the oracle). No bound to enforce: the promotion
    * is unconditional, not documented-and-hoped (round-8 advice).
    * PUBLISHED as the decimal's digit STRING (lossless at any
    * magnitude): decimal is the internal wrap-free carrier, but
    * decimal RENDERING differs across engines/hashers — the digit
    * string does not, so the gate hashes a representation-stable
    * column (round-9 fix; every published-rational query does this).
    *
    * 100 TB shape: the pair fan-out is a 4-way per-row explode (no
    * shuffle), then ONE partial-agg'd groupBy on 4 keys — map-side
    * combine collapses everything before the exchange; output is
    * O(pairs). */
  /** x162's pinned autocorrelation lags (days): adjacent-day memory and
    * the weekly cycle — shared with the oracle SQL. */
  val AcfLags: Seq[Int] = Seq(1, 7)

  /** Per-brand autocorrelation moment panel (x162): for each brand and
    * each lag in [[AcfLags]], the EXACT raw moments (n, Σx, Σy, Σxy,
    * Σx², Σy²) of the pairs (rev(d), rev(d−lag)) over the brand's daily
    * revenue series — everything the sample autocorrelation r_k needs,
    * published undivided so the gate compares integers (x152's moment
    * contract on x117's series). An r₇ ≫ r₁ readout is the integer
    * evidence for the weekly cycle x117's seasonal-naive lag assumes;
    * moments are additive, so a monitoring layer merges windows before
    * the one consumer-side division. Pairs are observed-only (both
    * days present — the standard sample ACF; x124's gap-fill is the
    * zero-filled alternative upstream if a dense series is wanted).
    *
    * 100 TB shape: one daily-revenue aggregate (localCheckpoint'ed —
    * |lags|+1 consumers), then per lag a SELF-EQUI-JOIN on (brand,
    * day+lag) — aggregate-sized, never corpus-sized — and ONE
    * partial-agg'd groupBy; sums in DECIMAL(38,0) (Σx² reaches
    * ~10²⁸·days at corpus revenue scale). */
  def acfMoments(spark: SparkSession, dir: String,
                 lags: Seq[Int] = AcfLags): DataFrame = {
    require(lags.nonEmpty, "need at least one lag")
    val daily = dailyRevenue(spark, dir).localCheckpoint()
    val pairs = lags.map { l =>
      daily.join(
          daily.select(col("p_brand"), (col("day") + l).as("day"),
            col("rev_cents").as("y")),
          Seq("p_brand", "day"))
        .select(col("p_brand"), lit(l.toLong).as("lag"),
          col("rev_cents").as("x"), col("y"))
    }.reduce(_ unionByName _)
    pairs.groupBy(col("p_brand"), col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("x").cast("decimal(38,0)")).cast("string").as("sum_x"),
        sum(col("y").cast("decimal(38,0)")).cast("string").as("sum_y"),
        sum((col("x").cast("decimal(38,0)") * col("y"))
          .cast("decimal(38,0)")).cast("string").as("sum_xy"),
        sum((col("x").cast("decimal(38,0)") * col("x"))
          .cast("decimal(38,0)")).cast("string").as("sum_xx"),
        sum((col("y").cast("decimal(38,0)") * col("y"))
          .cast("decimal(38,0)")).cast("string").as("sum_yy"))
  }

  def corrMoments(spark: SparkSession, dir: String): DataFrame = {
    val pairStructs = CorrPairs.map { case (name, x, y) =>
      struct(lit(name).as("pair"), expr(x).as("x"), expr(y).as("y"))
    }
    Tables.lineitem(spark, dir)
      .select(explode(array(pairStructs: _*)).as("p"))
      .select(col("p.pair").as("pair"), col("p.x").as("x"), col("p.y").as("y"))
      .groupBy(col("pair"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("x").cast("decimal(38,0)")).cast("string").as("sum_x"),
        sum(col("y").cast("decimal(38,0)")).cast("string").as("sum_y"),
        sum((col("x") * col("y")).cast("decimal(38,0)")).cast("string").as("sum_xy"),
        sum((col("x") * col("x")).cast("decimal(38,0)")).cast("string").as("sum_xx"),
        sum((col("y") * col("y")).cast("decimal(38,0)")).cast("string").as("sum_yy"))
  }

  /** Seasonality-adjusted daily revenue anomalies (x186): x102's exact
    * integer median/MAD rule applied WITHIN each (brand, weekday) cell
    * of the daily revenue series — the anomaly screen a forecaster runs
    * instead of a raw robust-z: Saturday is always 2× Tuesday, so an
    * unadjusted median flags every weekend; conditioning the median on
    * the weekday removes the weekly seasonality x118 measures and
    * leaves only genuinely aberrant days (promo spikes, outages, data
    * errors — exactly the rows to exclude before training x117's
    * baseline). Same scaled-integer algebra as x102 (med2/dev2/mad4,
    * cross-multiplied flag — no float compare), same weekday
    * arithmetic as x118 (`(epoch_day + 4) % 7`, no locale function).
    *
    * 100 TB shape: the corpus-sized work is [[dailyRevenue]]'s one
    * scan+shuffle; the two median passes run per (brand, weekday) over
    * O(weeks)-row groups (the x48 time-bounded-table case), and both
    * median frames join back broadcast-sized. */
  def dowAnomalies(spark: SparkSession, dir: String,
                   z: Int = Sessionize.RobustZ): DataFrame = {
    val daily = dailyRevenue(spark, dir)
      .withColumn("dow", expr("(day + 4) % 7"))
      .localCheckpoint() // read by both median passes and the final join
    val med = daily.groupBy(col("p_brand"), col("dow"))
      .agg(expr("CAST(2.0D * percentile(rev_cents, 0.5D) AS BIGINT)").as("med2"))
    val dev = daily.join(broadcast(med), Seq("p_brand", "dow"))
      .withColumn("dev2", abs(lit(2L) * col("rev_cents") - col("med2")))
    val mad = dev.groupBy(col("p_brand"), col("dow"))
      .agg(expr("CAST(2.0D * percentile(dev2, 0.5D) AS BIGINT)").as("mad4"))
    dev.join(broadcast(mad), Seq("p_brand", "dow"))
      .select(col("p_brand"), col("day"), col("dow"), col("rev_cents"),
        col("med2"), col("mad4"),
        (lit(2L) * col("dev2") > lit(z.toLong) * col("mad4")).cast("int")
          .as("seasonal_spike"))
  }

  /** Kendall rank concordance between regional demand series (x176):
    * for every region pair, do the two weekly order-revenue series move
    * together? Pearson (x152) is moment-based and outlier-sensitive;
    * Kendall's tau is the rank-based complement — it counts, over every
    * pair of weeks, whether the two regions' revenues moved in the SAME
    * direction (concordant) or opposite (discordant). Published as the
    * EXACT integer counts (concordant / discordant / the three tie
    * classes — everything tau-b needs) plus tau-a as the one-division
    * double; the sign comparisons are integer (cents), so no float
    * enters the decision path.
    *
    * Direction convention: deltas are later-week minus earlier-week
    * (`p.wk < q.wk`, sign of `q − p`) — mirrored verbatim in the
    * oracle.
    *
    * 100 TB shape: the only corpus-sized work is the one fact-scan
    * partial-agg'd groupBy onto the O(regions·weeks) panel (dim joins
    * broadcast by size). The O(weeks²) concordance join is over the
    * CALENDAR panel — its size is set by time span and region count,
    * not corpus rows, so it is constant in corpus scale (the x118
    * tiny-frame argument); both panel consumers read a
    * `localCheckpoint`. */
  def kendallTau(spark: SparkSession, dir: String): DataFrame = {
    val weekly = Tables.orders(spark, dir)
      .select(col("o_custkey"),
        expr("unix_timestamp(o_orderdate) div 86400 div 7").as("wk"),
        Relational.cents(col("o_totalprice")).as("v"))
      .join(Tables.customer(spark, dir).select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(spark, dir).select(col("n_nationkey"), col("n_regionkey")),
        col("c_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, dir).select(col("r_regionkey"), col("r_name")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name").as("region"), col("wk"))
      .agg(sum(col("v")).as("cents"))
      .localCheckpoint()
    val panel = weekly.as("a")
      .join(weekly.as("b"),
        col("a.wk") === col("b.wk") && col("a.region") < col("b.region"))
      .select(col("a.region").as("r1"), col("b.region").as("r2"),
        col("a.wk").as("wk"), col("a.cents").as("x"), col("b.cents").as("y"))
      .localCheckpoint()
    val nWeeks = panel.groupBy(col("r1"), col("r2"))
      .agg(count(lit(1)).as("n_weeks"))
    val signs = panel.as("p")
      .join(panel.as("q"),
        col("p.r1") === col("q.r1") && col("p.r2") === col("q.r2") &&
          col("p.wk") < col("q.wk"))
      .select(col("p.r1").as("r1"), col("p.r2").as("r2"),
        when(col("q.x") > col("p.x"), 1).when(col("q.x") < col("p.x"), -1)
          .otherwise(0).as("sx"),
        when(col("q.y") > col("p.y"), 1).when(col("q.y") < col("p.y"), -1)
          .otherwise(0).as("sy"))
    signs.groupBy(col("r1"), col("r2"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("sx") * col("sy") === 1, 1L).otherwise(0L)).as("n_conc"),
        sum(when(col("sx") * col("sy") === -1, 1L).otherwise(0L)).as("n_disc"),
        sum(when(col("sx") === 0 && col("sy") =!= 0, 1L).otherwise(0L)).as("n_tie_x"),
        sum(when(col("sy") === 0 && col("sx") =!= 0, 1L).otherwise(0L)).as("n_tie_y"),
        sum(when(col("sx") === 0 && col("sy") === 0, 1L).otherwise(0L)).as("n_tie_both"))
      .join(nWeeks, Seq("r1", "r2"))
      .select(col("r1"), col("r2"), col("n_weeks"), col("n_pairs"),
        col("n_conc"), col("n_disc"), col("n_tie_x"), col("n_tie_y"),
        col("n_tie_both"),
        (col("n_conc") - col("n_disc")).as("tau_num"),
        ((col("n_conc") - col("n_disc")).cast("double") / col("n_pairs"))
          .as("tau_a"))
  }

  /** Conformal coverage level (percent) for [[conformalIntervals]]
    * (x204) — shared with the DuckDB oracle. */
  val ConformalPct: Int = 90

  /** Conformal prediction intervals for the seasonal-naive forecast
    * (x204): per brand, the rank-picked 90% quantile of |actual −
    * lag-7 forecast| over the backtest days — the DISTRIBUTION-FREE
    * interval radius a forecaster ships next to every point forecast
    * (split-conformal: at level α the q = ⌈(n+1)·α⌉-th smallest
    * residual guarantees ≥ α coverage with no model assumption), plus
    * the realized coverage as the self-check. Shares x117's exact
    * forecast construction ([[dailyRevenue]] + lag-7 join + coalesce-0)
    * so interval and WAPE can never disagree on a residual; the
    * quantile is a RANK pick (x197's discipline), never interpolated.
    *
    * 100 TB shape: identical to x117 up to the per-(brand, day)
    * residual frame; then one per-brand rank window over O(days) rows
    * per partition and a broadcast bounds join back — the corpus is
    * touched once. */
  def conformalIntervals(spark: SparkSession, dir: String,
                         lagDays: Int = SeasonalLagDays,
                         pct: Int = ConformalPct): DataFrame = {
    val daily = dailyRevenue(spark, dir).localCheckpoint()
    val minDay = daily.agg(min(col("day")).as("min_day"))
    val resid = daily
      .join(daily.select(col("p_brand"),
          (col("day") + lagDays).as("day"), col("rev_cents").as("fc_cents")),
        Seq("p_brand", "day"), "left")
      .crossJoin(broadcast(minDay))
      .filter(col("day") >= col("min_day") + lagDays)
      .withColumn("err",
        abs(col("rev_cents") - coalesce(col("fc_cents"), lit(0L))))
    val ranked = resid
      .withColumn("rn", row_number().over(Window.partitionBy(col("p_brand"))
        .orderBy(col("err"), col("day"))).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("p_brand"))))
      .withColumn("q_rank",
        least(expr(s"($pct * (n + 1) + 99) div 100"), col("n")))
    val bounds = ranked.filter(col("rn") === col("q_rank"))
      .select(col("p_brand").as("qb"), col("err").as("q_abs_err_cents"))
    ranked.join(broadcast(bounds), col("p_brand") === col("qb"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_days"),
        min(col("q_abs_err_cents")).as("q_abs_err_cents"),
        sum(when(col("err") <= col("q_abs_err_cents"), 1L).otherwise(0L))
          .as("n_within"))
      .withColumn("coverage_ppm", expr("(1000000L * n_within) div n_days"))
  }

  /** Lag for x215's challenger model (previous calendar day). */
  val DuelChallengerLag: Int = 1

  /** Forecast model duel (x215): the champion/challenger readout —
    * per brand, the seasonal-naive (lag-7, x117's champion) against
    * the persistence forecast (lag-1) on the SAME days with the SAME
    * residual construction, publishing total absolute error for both
    * plus the exact per-day win/loss/tie counts (the paired SIGN TEST
    * inputs — the distribution-free model comparison every forecast
    * review starts with; its binomial p-value is a lookup on these
    * counts). Evaluation days are x117's (day ≥ min+7) so the panel
    * and the WAPE row can never disagree on the eval window; a
    * missing lag day is a 0-forecast on BOTH sides (the shared
    * coalesce rule).
    *
    * 100 TB shape: x117's — one corpus-sized (brand, day) partial agg,
    * two self equi-joins of the O(brands·days) frame, one rollup. */
  def forecastDuel(spark: SparkSession, dir: String,
                   champLag: Int = SeasonalLagDays,
                   challLag: Int = DuelChallengerLag): DataFrame = {
    val daily = dailyRevenue(spark, dir).localCheckpoint()
    val minDay = daily.agg(min(col("day")).as("min_day"))
    def lagged(lag: Int, as: String) = daily.select(col("p_brand"),
      (col("day") + lag).as("day"), col("rev_cents").as(as))
    daily
      .join(lagged(champLag, "fc_champ"), Seq("p_brand", "day"), "left")
      .join(lagged(challLag, "fc_chall"), Seq("p_brand", "day"), "left")
      .crossJoin(broadcast(minDay))
      .filter(col("day") >= col("min_day") + champLag)
      .withColumn("e_champ", abs(col("rev_cents") - coalesce(col("fc_champ"), lit(0L))))
      .withColumn("e_chall", abs(col("rev_cents") - coalesce(col("fc_chall"), lit(0L))))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("e_champ")).as("champ_abs_err_cents"),
        sum(col("e_chall")).as("chall_abs_err_cents"),
        sum(when(col("e_champ") < col("e_chall"), 1L).otherwise(0L))
          .as("n_champ_wins"),
        sum(when(col("e_chall") < col("e_champ"), 1L).otherwise(0L))
          .as("n_chall_wins"),
        sum(when(col("e_champ") === col("e_chall"), 1L).otherwise(0L))
          .as("n_ties"))
  }

  /** Theil–Sen slope of monthly revenue per (nation, year) (x195): the
    * robust trend estimator — the EXACT median of all pairwise slopes
    * (revᵢ−revⱼ)/(moᵢ−moⱼ), immune to the outlier months that wreck
    * OLS (x119's complement: same trend question, breakdown point 29%
    * instead of 0). Everything stays RATIONAL: slopes are (num, den)
    * integer pairs, compared by cross-multiplication (den > 0 always),
    * and the published median is the LOWER-median slope instance —
    * rank t = (n+1) div 2 under the multiset order, ties broken to the
    * smallest (num, den) representation — plus its one-IEEE-division
    * double. No float ordering anywhere, so the pick is cross-engine
    * deterministic even when distinct rationals collide in double.
    *
    * 100 TB shape: the corpus collapses to the O(nations × months)
    * monthly aggregate FIRST (one partial-agg'd shuffle); the pair and
    * rank joins run on value-level slope multisets keyed by
    * (nation, year) — ≤ C(12,2) = 66 instances per group, O(groups ×
    * 66²) total work, independent of fact-table size. */
  def theilSenSlopes(spark: SparkSession, dir: String): DataFrame = {
    val monthly = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey").as("nk"),
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mo"),
        Relational.cents(col("o_totalprice")).as("cents"))
      .groupBy(col("nk"), col("yr"), col("mo"))
      .agg(sum(col("cents")).as("rev"))
      .localCheckpoint() // both sides of the pair join + the month count
    val pairs = monthly.as("a").join(monthly.as("b"),
        col("a.nk") === col("b.nk") && col("a.yr") === col("b.yr") &&
          col("a.mo") < col("b.mo"))
      .select(col("a.nk").as("nk"), col("a.yr").as("yr"),
        (col("b.rev") - col("a.rev")).as("num"),
        (col("b.mo") - col("a.mo")).as("den"))
    val vals = pairs.groupBy(col("nk"), col("yr"), col("num"), col("den"))
      .agg(count(lit(1)).as("n_inst"))
      .localCheckpoint() // both sides of the rank join
    val ranked = vals.as("x").join(vals.as("y"),
        col("x.nk") === col("y.nk") && col("x.yr") === col("y.yr"))
      .groupBy(col("x.nk").as("nk"), col("x.yr").as("yr"),
        col("x.num").as("num"), col("x.den").as("den"))
      .agg(sum(when(col("y.num") * col("x.den") <= col("x.num") * col("y.den"),
          col("y.n_inst")).otherwise(0L)).as("cnt_le"),
        sum(col("y.n_inst")).as("n_slopes"))
    val months = monthly.groupBy(col("nk").as("m_nk"), col("yr").as("m_yr"))
      .agg(count(lit(1)).as("n_months"))
    val w = Window.partitionBy(col("nk"), col("yr"))
      .orderBy(col("cnt_le"), col("num"), col("den"))
    ranked.filter(col("cnt_le") >= expr("(n_slopes + 1) div 2"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .join(broadcast(months),
        col("nk") === col("m_nk") && col("yr") === col("m_yr"))
      .select(col("nk").as("n_nationkey"), col("yr"), col("n_months"),
        col("n_slopes"), col("num").as("med_num"), col("den").as("med_den"),
        (col("num").cast("double") / col("den").cast("double")).as("slope"))
  }

  /** Bootstrap replicate count / CI order-statistic ranks for
    * [[bootstrapCi]] (x196) — shared with the DuckDB oracle.
    * Lo/hi are the ceil(0.025·B) and ceil(0.975·B)+1 order statistics
    * of B = 200 replicate totals (the percentile-bootstrap bracket). */
  val BootReps: Int = 200
  val BootLoRank: Int = 5
  val BootHiRank: Int = 196

  /** Percentile-bootstrap CI for total daily revenue (x196): resample
    * the daily-revenue series WITH replacement B times, deterministically
    * — draw s of replicate r picks day index md5₆₀("boot:r:s") mod n,
    * the engine-neutral acceptance-hash discipline of x27/x100, so both
    * engines materialize the IDENTICAL resamples and the CI is exact
    * integer cents (no RNG state, no float percentile interpolation:
    * the bracket is two pinned order statistics of the B replicate
    * totals). This is the uncertainty quantification every A/B readout
    * and forecast backtest (x117/x123) should ship with.
    *
    * 100 TB shape: the corpus collapses to the O(days) daily aggregate
    * first; the resample fan-out is B × n_days rows (bounded by the
    * calendar, not the corpus), the picked-day join broadcasts the
    * O(days) series, and the replicate rollup is one partial-agg'd
    * shuffle on B keys. The 1-row day-count cross is the documented
    * scalar-broadcast pattern (x100/x117 class). */
  def bootstrapCi(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .select(expr("unix_timestamp(o_orderdate) div 86400").as("day"),
        Relational.cents(col("o_totalprice")).as("cents"))
      .groupBy(col("day")).agg(sum(col("cents")).as("rev"))
      .withColumn("idx",
        row_number().over(Window.orderBy(col("day"))).cast("long") - 1)
      .localCheckpoint() // O(days); read by the scalar agg + the pick join
    val nRow = daily.agg(count(lit(1)).as("n_days"),
      sum(col("rev")).as("observed_cents"))
    val reps = spark.range(BootReps.toLong).select(col("id").as("r"))
      .crossJoin(broadcast(nRow))
      .select(col("r"), col("n_days"),
        explode(expr("sequence(0L, n_days - 1)")).as("s"))
      .withColumn("pick",
        pmod(Dedup.md5Hash60(concat(lit("boot:"), col("r").cast("string"),
          lit(":"), col("s").cast("string"))), col("n_days")))
      .join(broadcast(daily.select(col("idx"), col("rev"))),
        col("pick") === col("idx"))
      .groupBy(col("r")).agg(sum(col("rev")).as("rep_total"))
    val wb = Window.orderBy(col("rep_total"), col("r"))
    reps.withColumn("rk", row_number().over(wb))
      .agg(count(lit(1)).as("n_reps"),
        sum(col("rep_total")).as("sum_rep_cents"),
        min(when(col("rk") === BootLoRank, col("rep_total"))).as("boot_lo_cents"),
        min(when(col("rk") === BootHiRank, col("rep_total"))).as("boot_hi_cents"))
      .crossJoin(broadcast(nRow))
      .select(col("n_days"), col("observed_cents"), col("n_reps"),
        col("sum_rep_cents"), col("boot_lo_cents"), col("boot_hi_cents"))
  }
}
