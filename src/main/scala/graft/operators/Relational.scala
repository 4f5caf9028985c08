package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Relational parity operators — every query shape the reference executes
  * (SURVEY.md §2), re-expressed on the driver testdata per the role mapping
  * in FIXTURES.md §B (lineitem ↔ transactions fact, supplier ↔ stores dim,
  * orders ↔ date-keyed enrichment).
  *
  * Determinism for the DuckDB oracle (SURVEY.md §7.4):
  *  - money doubles → integer cents via `cents()` so sums are exact and
  *    order-independent across engines;
  *  - `dropDuplicates` (nondeterministic row pick, reference
  *    silver_processing.py.py:16,24,35,44) → `row_number()` over an explicit
  *    total order (`dedupFirst`);
  *  - `first()` dim carry-through (gold_feature.py.py:18-21) → `min`/`max`;
  *  - averages → explicit `sum/count` division (single IEEE op, identical in
  *    Spark and DuckDB) instead of engine-internal avg accumulation.
  *
  * Scale notes (100 TB): every query here is a declarative single plan —
  * filters/projections reach the parquet scan, aggregates run
  * partial→final, small dims are broadcast, and the only shuffles are on
  * the group/join keys themselves.
  */
object Relational {

  /** Exact integer cents from a 2-decimal money double. Both engines compute
    * the identical IEEE double `x*100` and round half-away-from-zero, so the
    * result is bit-exact cross-engine and sum order no longer matters. */
  def cents(c: Column): Column = round(c * lit(100)).cast("long")

  /** Deterministic replacement for `dropDuplicates(keys)` — keeps the first
    * row per key under an explicit total order (reference D1/D2,
    * silver_processing.py.py:16).
    *
    * Implemented as `min_by(row-struct, order-struct)` — a hash aggregate
    * with map-side partial combine, so at scale it shuffles one candidate
    * row per (partition, key) instead of sorting every row in a window
    * (the `row_number() == 1` formulation). The order struct is totalized
    * by appending the remaining columns, so ties on the caller's order
    * columns can only occur between identical rows. */
  def dedupFirst(df: DataFrame, keys: Seq[String], order: Seq[String]): DataFrame = {
    val valueCols = df.columns.filterNot(keys.contains).toSeq
    val ordCols = (order ++ valueCols.filterNot(order.contains)).distinct
    df.groupBy(keys.map(col): _*)
      .agg(min_by(struct(valueCols.map(col): _*), struct(ordCols.map(col): _*)).as("__r"))
      .select(keys.map(col) ++ valueCols.map(c => col(s"__r.`$c`").as(c)): _*)
  }

  /** Sort-window formulation of the same dedup — faster when groups are
    * nearly unique (high key cardinality: the min_by struct churn exceeds
    * the sort, and WindowGroupLimit pre-prunes before the shuffle). Same
    * result set; pick per expected rows-per-key. */
  def dedupFirstSort(df: DataFrame, keys: Seq[String], order: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order.map(col): _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** S1/P1/P5 — projection + filter, pushed down to the parquet scan
    * (bronze_ingestion.py.py:14-21 scan shape; silver_processing.py.py:33
    * predicate shape). `PushedFilters` must show both predicates. */
  def prunedScan(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp") && col("l_discount") > 0.05)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity").cast("long").as("quantity"),
        cents(col("l_extendedprice")).as("price_cents"))

  /** A1-A5 — grouped multi-aggregate (gold_feature.py.py:15-24 shape on the
    * TPC-H fact): partial+final hash aggregate, one shuffle on the 2 keys. */
  def groupedAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        sum(cents(col("l_extendedprice"))).as("sum_base_cents"),
        sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc_cents"),
        count(lit(1)).as("n_rows"))
      .withColumn("avg_qty", col("sum_qty") / col("n_rows"))

  /** A6/A7 — ungrouped global aggregates (test_data_quality.py.py:76,89,92). */
  def ungroupedAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        min(col("l_quantity").cast("long")).as("min_qty"),
        max(col("l_quantity").cast("long")).as("max_qty"),
        sum(cents(col("l_extendedprice"))).as("sum_price_cents"),
        countDistinct(col("l_orderkey")).as("n_orders"))

  /** §2.7 extension — deterministic top-k: total order with a unique
    * tie-break key. At scale this is a TakeOrderedAndProject (no full sort). */
  def topK(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), cents(col("o_totalprice")).as("total_cents"), col("o_orderpriority"))
      .orderBy(col("total_cents").desc, col("o_orderkey"))
      .limit(100)

  /** J1 — fact ⟕ small dim, explicitly broadcast (silver_processing.py.py:51):
    * no shuffle of the fact side at any scale. */
  def joinBroadcast(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.supplier(spark, dir)), col("l_suppkey") === col("s_suppkey"), "left")
      .groupBy(col("s_name"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(cents(col("l_extendedprice"))).as("revenue_cents"))

  /** J-inner variant — orders ⨝ customer with a grouped rollup. At 100 TB
    * both sides are large → shuffle hash join on the key; AQE handles skew. */
  def joinInnerAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"), "inner")
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(cents(col("o_totalprice"))).as("sum_total_cents"),
        countDistinct(col("c_custkey")).as("n_customers"))

  /** §2.7 extension — left-semi join (EXISTS). */
  def joinSemi(spark: SparkSession, dir: String): DataFrame = {
    val bigOrders = Tables.orders(spark, dir).filter(col("o_totalprice") > 400000.0)
    Tables.customer(spark, dir)
      .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
  }

  /** §2.7 extension — left-anti join (NOT EXISTS). */
  def joinAnti(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir), col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"))

  /** D1 — composite-key dedup, made deterministic (SURVEY §7.4 risk 3).
    * The order key must be a TOTAL order: the synthetic lineitem has
    * duplicate (orderkey, linenumber) pairs, so tie-break through the value
    * columns (any residual ties are then bit-identical rows). */
  def dedupKeys(spark: SparkSession, dir: String): DataFrame =
    dedupFirst(Tables.lineitem(spark, dir),
      keys = Seq("l_orderkey"),
      order = Seq("l_linenumber", "l_quantity", "l_extendedprice", "l_partkey", "l_suppkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity").cast("long").as("quantity"))

  /** D2 flavor — full-row distinct on a projection (set semantics, exactly
    * deterministic without ordering). */
  def distinctRows(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_linestatus"), col("l_shipdate").cast("date").as("ship_date"))
      .distinct()

  /** F1-F4 — the reference's date-function surface (to_date/year/month/
    * weekofyear; silver_processing.py.py:17, gold_feature.py.py:13-14) plus
    * quarter/dayofyear. One row per distinct order date. */
  def dateFunctions(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderdate").cast("date").as("d")).distinct()
      .select(col("d"),
        year(col("d")).as("y"),
        month(col("d")).as("m"),
        dayofmonth(col("d")).as("dom"),
        weekofyear(col("d")).as("iso_week"),
        quarter(col("d")).as("q"),
        dayofyear(col("d")).as("doy"))

  /** P9/P10/P11 — when/otherwise, coalesce, casts (silver_processing.py.py:32,54,
    * gold_feature.py.py:45-50). */
  def caseCast(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey"),
        when(col("o_orderstatus") === "F", lit(1)).otherwise(lit(0)).as("is_final"),
        coalesce(nullif(col("o_orderpriority"), lit("4-NOT SPECIFIED")), lit("UNSPECIFIED")).as("priority"),
        col("o_totalprice").cast("long").as("total_trunc"),
        cents(col("o_totalprice")).as("total_cents"),
        col("o_orderdate").cast("date").cast("string").as("date_str"))

  /** §2.7 extension — UNION + distinct of two branch projections. */
  def unionDistinct(spark: SparkSession, dir: String): DataFrame = {
    val a = Tables.lineitem(spark, dir).filter(col("l_returnflag") === "R")
      .select(col("l_orderkey").as("okey"))
    val b = Tables.orders(spark, dir).filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey").as("okey"))
    a.union(b).distinct()
  }

  /** Reference test-suite quality aggregates (test_data_quality.py.py:23-28,
    * 74-94) as one query: null counts per column after a left join (where
    * nulls can actually appear), value-range and conservation checks. */
  def qualityChecks(spark: SparkSession, dir: String): DataFrame = {
    val joined = Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir), col("c_custkey") === col("o_custkey"), "left")
    joined.agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("o_orderkey").isNull, 1L).otherwise(0L)).as("null_orderkeys"),
      sum(when(col("c_name").isNull, 1L).otherwise(0L)).as("null_names"),
      min(cents(col("o_totalprice"))).as("min_total_cents"),
      countDistinct(col("c_custkey")).as("n_customers"))
  }

  /** As-of join (event attribution): for each 'click' event, the most
    * recent 'purchase' by the same user at or before it. Spark lacks a
    * native as-of join — composed as the classic union-tag + last_value
    * window fill (SURVEY §7.3 tier (a): compose built-ins before custom
    * plans). One shuffle on user_id; at 100 TB this beats a range join
    * because the window pass is a single sort within user partitions. */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val tsS = ev.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000000000")
      case _                                   => unix_timestamp(col("ts"))
    }
    val base = ev.select(col("event_id"), col("user_id"), col("event_type"),
      tsS.as("ts_s"), cents(col("value")).as("value_cents"))
    val tagged = base.withColumn("is_purchase",
      when(col("event_type") === "purchase", 1).otherwise(0))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_s"), col("is_purchase").desc, col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    // carry the latest purchase (id, ts) forward; purchases sort BEFORE
    // same-timestamp clicks so an exactly-simultaneous purchase attributes
    tagged
      .withColumn("last_purchase_id",
        last(when(col("is_purchase") === 1, col("event_id")), ignoreNulls = true).over(w))
      .withColumn("last_purchase_ts",
        last(when(col("is_purchase") === 1, col("ts_s")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts_s"),
        col("last_purchase_id"), col("last_purchase_ts"),
        (col("ts_s") - col("last_purchase_ts")).as("attribution_lag_s"))
  }

  /** §2.7-adjacent extension — pivot: per-user event-type count matrix
    * (explicit value list so the output schema is static — the only
    * scale-safe pivot; dynamic pivots need a driver-side distinct). */
  def pivotCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "view", "purchase", "error", "signup"))
      .agg(count(lit(1)))
      .na.fill(0L, Seq("click", "view", "purchase", "error", "signup"))

  /** Extension — ROLLUP aggregate: revenue by (returnflag, linestatus)
    * with subtotals and grand total (Catalyst Expand → one shuffle). */
  def rollupRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_rows"), sum(cents(col("l_extendedprice"))).as("revenue_cents"))

  /** x110's quantization width: per-region supplier revenues rescale to
    * ~2²⁰ units before squaring, so the HHI numerator stays far inside
    * a Long at ANY corpus scale. Shared with the oracle SQL. */
  val HhiQuantBits: Int = 20

  /** Market-concentration audit (x110): per region, the Herfindahl–
    * Hirschman index over supplier revenue shares plus the top-supplier
    * share — the "is this market one vendor in a trench coat" panel, in
    * ppm fixed-point. This is the QUANTIZED integer form the x73/x103
    * Scaladocs point to instead of a double ratio or a guarded raw
    * product: revenues rescale by `scale = max(1, V div 2^20)` so each
    * quantized share q_i ≤ ~2²⁰ REGARDLESS of total revenue — the
    * numerator `10⁶·Σq_i²` is bounded by `10⁶·S·max_q` with
    * `S = Σq_i ≤ 2²⁰ + n`, i.e. it wraps only past ~4·10⁶ suppliers in
    * ONE region whose combined revenue still quantizes to scale 1 (a
    * billion-vendor flea market; raise [[HhiQuantBits]]'s complement —
    * lower it — if that's your market). The rescale floor-loses at most
    * `scale` cents per supplier (deterministic, replicated by the
    * oracle bit-for-bit); hhi_ppm and top_share_ppm divide by the
    * quantized total so the panel is self-consistent.
    *
    * 100 TB shape: the fact scan joins broadcast dims (supplier →
    * nation → region), partial-aggs on (region, suppkey) — one corpus
    * shuffle — then rolls up per region twice over the O(suppliers)
    * frame; the per-region totals join back broadcast (O(regions)
    * rows). No windows, no driver state. */
  def marketHhi(spark: SparkSession, dir: String): DataFrame = {
    val bySupp = Tables.lineitem(spark, dir)
      .select(col("l_suppkey"), cents(col("l_extendedprice")).as("v"))
      .join(broadcast(Tables.supplier(spark, dir)
        .select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir)
        .select(col("n_nationkey"), col("n_regionkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)
        .select(col("r_regionkey"), col("r_name"))),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("l_suppkey"))
      .agg(sum(col("v")).as("v_cents"))
    val totals = bySupp.groupBy(col("r_name"))
      .agg(sum(col("v_cents")).as("v_total_cents"))
      .withColumn("scale",
        greatest(lit(1L), expr(s"v_total_cents div ${1L << HhiQuantBits}L")))
    bySupp.join(broadcast(totals), Seq("r_name"))
      .select(col("r_name"), col("v_total_cents"),
        expr("v_cents div scale").as("q"))
      .groupBy(col("r_name"), col("v_total_cents"))
      .agg(count(lit(1)).as("n_suppliers"),
        sum(col("q")).as("s_q"), sum(col("q") * col("q")).as("s_q2"),
        max(col("q")).as("max_q"))
      .select(col("r_name"), col("n_suppliers"), col("v_total_cents"),
        expr("(1000000L * s_q2) div (s_q * s_q)").as("hhi_ppm"),
        expr("(1000000L * max_q) div s_q").as("top_share_ppm"))
  }

  /** CUBE revenue panel (x126): all four grouping combinations of
    * (return flag, ship year) in one pass — the full-lattice twin of
    * x26's ROLLUP (which only walks the prefix chain). Spark plans a
    * cube as ONE expand + partial-agg'd shuffle, not four scans; the
    * NULL subtotal markers are the standard SQL convention and compare
    * byte-identically against DuckDB's `GROUP BY CUBE`. Grouping-set
    * cardinality is the product of the per-axis cardinalities (≤ 4·
    * |flags|·|years| rows) — tiny at any corpus size. */
  def cubeRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_returnflag"),
        expr("CAST(year(l_shipdate) AS INTEGER)").as("ship_year"),
        cents(col("l_extendedprice")).as("v"),
        expr("CAST(round(l_quantity * 100) AS BIGINT)").as("q"))
      .cube(col("l_returnflag"), col("ship_year"))
      .agg(count(lit(1)).as("n_rows"), sum(col("v")).as("revenue_cents"),
        sum(col("q")).as("quantity_centi"))

  /** UNPIVOT / melt (x127): the wide per-returnflag measure table turned
    * into long (flag, measure, value) form — the reshape every metrics
    * warehouse does before generic charting/alerting, and the inverse of
    * x25's pivot. `stack` is a generator expression (one pass, no
    * shuffle beyond the feeding aggregate); measure names are pinned
    * literals so the long table's key domain is closed. All four
    * measures are integer (cents / centi-units) so the single `value`
    * column needs no float union. */
  def unpivotMeasures(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_returnflag"),
        cents(col("l_extendedprice")).as("extended_cents"),
        cents(col("l_tax")).as("tax_cents"),
        cents(col("l_discount")).as("discount_cents"),
        expr("CAST(round(l_quantity * 100) AS BIGINT)").as("quantity_centi"))
      .groupBy(col("l_returnflag"))
      .agg(sum(col("extended_cents")).as("extended_cents"),
        sum(col("tax_cents")).as("tax_cents"),
        sum(col("discount_cents")).as("discount_cents"),
        sum(col("quantity_centi")).as("quantity_centi"))
      .selectExpr("l_returnflag",
        """stack(4,
          |  'extended_cents', extended_cents,
          |  'tax_cents', tax_cents,
          |  'discount_cents', discount_cents,
          |  'quantity_centi', quantity_centi) AS (measure, value)""".stripMargin)

  /** Fulfillment lead-time SLA panel (x131): per order priority, the
    * EXACT min / median / p90 / max of ship-lag days (line ship date −
    * order date) — the service-level report an operations dashboard
    * leads with, done with exact quantiles at any scale.
    *
    * Exactness at scale: ship lag lives on a BOUNDED integer domain
    * (days between order and ship — the calendar bounds it, not the
    * corpus), so the (priority, lag) count table is tiny and the
    * quantile is an exact cumulative pick over it: `median = min lag
    * with 2·cum ≥ n`, `p90 = min lag with 10·cum ≥ 9·n` (the x29
    * bounded-domain discipline — no sort of corpus rows, no approx
    * sketch). The cumulative window partitions by priority over that
    * tiny frame (the x48 case); the corpus-sized work is one fact scan
    * partial-agg'd onto it. The frame is `localCheckpoint`ed — the
    * per-priority totals and the final pick both read it. */
  def leadTimes(spark: SparkSession, dir: String): DataFrame = {
    val byLag = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), expr("unix_timestamp(l_shipdate) div 86400").as("ship_day"))
      .join(Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_orderpriority"),
          expr("unix_timestamp(o_orderdate) div 86400").as("order_day")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"), (col("ship_day") - col("order_day")).as("lag_days"))
      .groupBy(col("o_orderpriority"), col("lag_days"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val w = Window.partitionBy(col("o_orderpriority")).orderBy(col("lag_days"))
      .rowsBetween(Window.unboundedPreceding, 0)
    byLag
      .join(byLag.groupBy(col("o_orderpriority")).agg(sum(col("c")).as("n")),
        Seq("o_orderpriority"))
      .withColumn("cum", sum(col("c")).over(w))
      .groupBy(col("o_orderpriority"))
      .agg(max(col("n")).as("n_lines"),
        min(col("lag_days")).as("min_days"),
        min(when(col("cum") * 2 >= col("n"), col("lag_days"))).as("median_days"),
        min(when(col("cum") * 10 >= col("n") * 9, col("lag_days"))).as("p90_days"),
        max(col("lag_days")).as("max_days"))
  }

  /** Pareto frontier of the part catalog (x134): the parts no other part
    * dominates on (price, size) — cheaper-or-equal AND bigger-or-equal
    * with at least one strict. The skyline query a sourcing team runs
    * ("which parts are efficient buys"), and the operator class (skyline)
    * classic engines ship natively.
    *
    * 100 TB shape — the bounded-domain skyline: `p_size` lives on a
    * catalog-bounded integer domain (~50 values), so the corpus-sized
    * work is ONE partial-agg'd `groupBy(p_size).min(price)`; the
    * staircase test (is some strictly-larger size as cheap or cheaper?)
    * is a suffix-min window over that ≤|sizes|-row frame (the x48 tiny-
    * table case), and frontier membership joins back to the catalog as
    * a broadcast-by-size semi-filter on (size, price). No corpus sort,
    * no all-pairs dominance join (the naive skyline is O(n²)).
    *
    * A part is on the frontier iff its price equals its size's min AND
    * every strictly larger size's min price is strictly above it
    * (equal price at larger size dominates — size is strict). Equal
    * (size, price) duplicates don't dominate each other, so all of
    * them survive. */
  def paretoParts(spark: SparkSession, dir: String): DataFrame = {
    val parts = Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_name"), col("p_size"),
        cents(col("p_retailprice")).as("price_cents"))
    val bySize = parts.groupBy(col("p_size").as("f_size"))
      .agg(min(col("price_cents")).as("min_price_cents"))
    val wDesc = Window.orderBy(col("f_size").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = bySize
      .withColumn("best_larger", min(col("min_price_cents")).over(wDesc))
      .filter(col("best_larger").isNull ||
        col("best_larger") > col("min_price_cents"))
    parts.join(broadcast(frontier),
      col("p_size") === col("f_size") &&
        col("price_cents") === col("min_price_cents"),
      "left_semi")
  }

  /** Consecutive-month purchase streaks (x136): per market segment, the
    * census of customers by their LONGEST run of consecutive calendar
    * months with ≥1 order — the engagement-depth panel a retention team
    * reads next to x88's cohort retention, and the classic
    * gaps-and-islands shape (island id = month_index − row_number).
    *
    * 100 TB shape: the corpus collapses to distinct (customer, month)
    * FIRST (one partial-agg'd shuffle; months are calendar-bounded, so
    * this frame is O(customers × months)). Every window after that
    * partitions by customer — a customer's month list is the partition,
    * bounded by the calendar, never corpus-sized (x11's user-timeline
    * posture). The segment dim arrives by plain equi-join on the
    * already-aggregated one-row-per-customer frame (broadcast at small
    * SF by AQE; stays a keyed shuffle join at any scale), and the final
    * census is a partial-agg'd groupBy onto O(segments × months) cells. */
  def purchaseStreaks(spark: SparkSession, dir: String): DataFrame = {
    val months = Tables.orders(spark, dir)
      .select(col("o_custkey"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1).as("m"))
      .distinct()
    val wCust = Window.partitionBy(col("o_custkey")).orderBy(col("m"))
    val longest = months
      .withColumn("island", col("m") - row_number().over(wCust))
      .groupBy(col("o_custkey"), col("island"))
      .agg(count(lit(1)).as("streak"))
      .groupBy(col("o_custkey"))
      .agg(max(col("streak")).as("longest_streak"))
    longest
      .join(Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("longest_streak"))
      .agg(count(lit(1)).as("n_customers"))
  }

  /** x132's tier thresholds (orders BEFORE the current one), shared
    * with the oracle SQL: < [[TierSilverAt]] bronze, < [[TierGoldAt]]
    * silver, else gold. */
  val TierSilverAt: Int = 3
  val TierGoldAt: Int = 10

  /** Loyalty-tier transition matrix (x132): each order is scored with
    * the customer's tier BEFORE it (cumulative prior order count — the
    * point-in-time attribute an SCD-style dimension would store) and
    * the tier AFTER it; the (from, to) census is the promotion-flow
    * report a retention team reads. Order history is totally ordered by
    * (order day, order key), so the point-in-time rank is deterministic
    * under same-day orders.
    *
    * 100 TB shape: one row_number window partitioned by customer — a
    * customer's order history is the partition, bounded by purchase
    * behavior, not corpus size (x11's user-timeline posture: the
    * history must colocate to be ranked at all). Everything after is a
    * partial-agg'd groupBy onto the ≤ 9-cell matrix. */
  def loyaltyTransitions(spark: SparkSession, dir: String): DataFrame = {
    def tier(nPrior: Column): Column =
      when(nPrior < TierSilverAt, "bronze")
        .when(nPrior < TierGoldAt, "silver").otherwise("gold")
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("day"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        expr("unix_timestamp(o_orderdate) div 86400").as("day"))
      .withColumn("rn", row_number().over(w))
      .select(col("o_custkey"), tier(col("rn") - 1).as("from_tier"),
        tier(col("rn")).as("to_tier"))
      .groupBy(col("from_tier"), col("to_tier"))
      .agg(count(lit(1)).as("n_orders"),
        countDistinct(col("o_custkey")).as("n_customers"))
  }

  /** SCD Type-2 tier dimension build (x138): compress x132's
    * point-in-time tier timeline into validity intervals — one row per
    * (customer, tier episode) with `valid_from_day` = the day of the
    * order that put the customer in that tier and `valid_to_day` = the
    * day of the next promotion (null = current tier). This is the
    * dimension-construction operator an SCD2 warehouse load runs: the
    * fact-side "point-in-time join" (x24's as-of) reads exactly this
    * table.
    *
    * Episodes: the first order opens the bronze episode; each order
    * whose post-order tier differs from its pre-order tier opens a new
    * one. Tiers only move up (x132's invariant), so episodes are
    * strictly increasing per customer. Same-day promotions produce
    * zero-length intervals — kept, because the order-sequence (not the
    * clock) is the SCD grain here and the deterministic (day, orderkey)
    * order totalizes it.
    *
    * 100 TB shape: identical to x132 — one row_number window per
    * customer (the history must colocate to be sequenced at all), then
    * a per-customer lead() over the ≤4-episode frame. Output is
    * O(customers × tiers). */
  def tierIntervals(spark: SparkSession, dir: String): DataFrame = {
    def tier(nPrior: Column): Column =
      when(nPrior < TierSilverAt, "bronze")
        .when(nPrior < TierGoldAt, "silver").otherwise("gold")
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("day"), col("o_orderkey"))
    val episodes = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        expr("unix_timestamp(o_orderdate) div 86400").as("day"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 || tier(col("rn")) =!= tier(col("rn") - 1))
      .select(col("o_custkey"), tier(col("rn")).as("tier"),
        col("day").as("valid_from_day"), col("rn"))
    val wEp = Window.partitionBy(col("o_custkey")).orderBy(col("rn"))
    episodes
      .withColumn("valid_to_day", lead(col("valid_from_day"), 1).over(wEp))
      .select(col("o_custkey"), col("tier"),
        col("valid_from_day"), col("valid_to_day"))
  }

  /** Referential-integrity audit panel (x139): for every foreign-key
    * relationship in the star schema, the child row count and the count
    * of orphans (child rows whose parent key is missing) — the
    * constraint-suite report a warehouse load gates on (the reference's
    * data-quality tests check exactly this class of invariant; this is
    * the whole-schema panel).
    *
    * 100 TB shape: each relationship is one left-anti join on its own
    * key (keyed shuffle; AQE broadcasts the dim side when it fits) plus
    * one partial-agg'd count — no row ships more than its key. The six
    * single-row results union into the panel. Orphan counts use the
    * anti-join, not `NOT IN` (null-key rows count as orphans here,
    * which is the audit-correct reading). */
  def integrityAudit(spark: SparkSession, dir: String): DataFrame = {
    def rel(name: String, child: DataFrame, key: String,
            parent: DataFrame, pkey: String): DataFrame = {
      val c = child.select(col(key))
      val orphans = c.join(parent.select(col(pkey)),
        col(key) === col(pkey), "left_anti")
      c.agg(count(lit(1)).as("n_child_rows"))
        .crossJoin(orphans.agg(count(lit(1)).as("n_orphan_rows")))
        .select(lit(name).as("relationship"),
          col("n_child_rows"), col("n_orphan_rows"))
    }
    val li = Tables.lineitem(spark, dir)
    rel("lineitem->orders", li, "l_orderkey", Tables.orders(spark, dir), "o_orderkey")
      .unionAll(rel("lineitem->part", li, "l_partkey", Tables.part(spark, dir), "p_partkey"))
      .unionAll(rel("lineitem->supplier", li, "l_suppkey", Tables.supplier(spark, dir), "s_suppkey"))
      .unionAll(rel("orders->customer", Tables.orders(spark, dir), "o_custkey",
        Tables.customer(spark, dir), "c_custkey"))
      .unionAll(rel("customer->nation", Tables.customer(spark, dir), "c_nationkey",
        Tables.nation(spark, dir), "n_nationkey"))
      .unionAll(rel("supplier->nation", Tables.supplier(spark, dir), "s_nationkey",
        Tables.nation(spark, dir), "n_nationkey"))
  }

  /** Column-profiling panel for the orders table (x140): per column,
    * the non-null count, exact distinct count, and (for the integer-
    * expressible columns) min/max — the Deequ-style profile a data
    * catalog materializes per table per load. Money profiles in cents,
    * dates in epoch days; the two categorical columns profile
    * cardinality only (their min/max stays null — no cross-engine
    * string collation in the compare path).
    *
    * 100 TB shape: ONE scan with the multi-distinct expand (Spark
    * rewrites N countDistincts into an N-way expand + two-stage agg —
    * shuffle volume is O(Σ per-column distinct values) after map-side
    * partial dedup, not N corpus copies); the stack() to panel rows is
    * a projection of the single 1-row aggregate. Profiling M columns
    * in one pass beats M scans whenever the table dominates the
    * distinct-value mass, which is exactly the 100 TB regime. */
  def profileOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        cents(col("o_totalprice")).as("total_cents"),
        expr("unix_timestamp(o_orderdate) div 86400").as("order_day"),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        count(col("o_orderkey")).as("nn_orderkey"),
        countDistinct(col("o_orderkey")).as("nd_orderkey"),
        min(col("o_orderkey")).as("min_orderkey"),
        max(col("o_orderkey")).as("max_orderkey"),
        count(col("o_custkey")).as("nn_custkey"),
        countDistinct(col("o_custkey")).as("nd_custkey"),
        min(col("o_custkey")).as("min_custkey"),
        max(col("o_custkey")).as("max_custkey"),
        count(col("total_cents")).as("nn_total"),
        countDistinct(col("total_cents")).as("nd_total"),
        min(col("total_cents")).as("min_total"),
        max(col("total_cents")).as("max_total"),
        count(col("order_day")).as("nn_day"),
        countDistinct(col("order_day")).as("nd_day"),
        min(col("order_day")).as("min_day"),
        max(col("order_day")).as("max_day"),
        count(col("o_orderstatus")).as("nn_status"),
        countDistinct(col("o_orderstatus")).as("nd_status"),
        count(col("o_orderpriority")).as("nn_priority"),
        countDistinct(col("o_orderpriority")).as("nd_priority"))
      .selectExpr(
        """stack(6,
          |  'o_orderkey', nn_orderkey, nd_orderkey, min_orderkey, max_orderkey,
          |  'o_custkey', nn_custkey, nd_custkey, min_custkey, max_custkey,
          |  'o_totalprice_cents', nn_total, nd_total, min_total, max_total,
          |  'o_orderdate_day', nn_day, nd_day, min_day, max_day,
          |  'o_orderstatus', nn_status, nd_status, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
          |  'o_orderpriority', nn_priority, nd_priority, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT))
          |AS (column_name, n_nonnull, n_distinct, min_v, max_v)""".stripMargin)

  /** Top-3 parts per brand by line-item count, WITH ties (x141):
    * `rank()` semantics — every part tying a top-3 count is reported,
    * so a brand can return more than 3 rows. The deliberate contrast to
    * the repo's row_number discipline: when the ranking key is coarse
    * (an integer count), row_number's tiebreak SELECTS one winner
    * arbitrarily-but-deterministically, while the business question
    * "which parts lead the brand" wants ALL of them; rank() is the
    * operator that says so, and its output is deterministic as a SET
    * with no tiebreak column at all.
    *
    * 100 TB shape: one fact-scan partial-agg'd groupBy(partkey) (the
    * dim join ships brand onto the already-aggregated per-part frame,
    * broadcast at small SF), then a rank window partitioned by brand —
    * the partition is the brand's catalog slice, bounded by the
    * catalog, not the corpus. */
  def brandTopParts(spark: SparkSession, dir: String): DataFrame = {
    val perPart = Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n_lineitems"))
      .join(Tables.part(spark, dir).select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("n_lineitems").desc)
    perPart
      .withColumn("rnk", rank().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .select(col("p_brand"), col("p_partkey"), col("n_lineitems"), col("rnk"))
  }

  /** Log₂-bucketed order-value histogram (x142): orders counted and
    * summed into power-of-two value buckets — the long-tail spend
    * distribution at a glance, with the bucket edges integer-exact in
    * both engines (bucket = bit-length of the cent amount, computed as
    * `length(bin(v))`, never a float log). The bucket domain is ~45
    * cells for any revenue a Long can hold, so the histogram is
    * bounded no matter the corpus.
    *
    * 100 TB shape: one scan, one partial-agg'd groupBy onto ≤45 cells.
    * Bucket edges reconstruct as `1 << (bucket-1)` / `(1 << bucket)-1`
    * — emitted so the report is self-describing. */
  def orderValueHistogram(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(cents(col("o_totalprice")).as("v"))
      .filter(col("v") > 0)
      .withColumn("bucket", length(bin(col("v"))).cast("long"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_orders"), sum(col("v")).as("sum_cents"))
      .withColumn("lo_cents", expr("shiftleft(1L, cast(bucket - 1 as int))"))
      .withColumn("hi_cents", expr("shiftleft(1L, cast(bucket as int)) - 1"))
      .select(col("bucket"), col("lo_cents"), col("hi_cents"),
        col("n_orders"), col("sum_cents"))

  /** Header-vs-lines reconciliation audit (x143): per order status, how
    * many order headers exist, how many have line items at all, how
    * many headers exactly equal their line-total, and the total
    * absolute drift in cents — the ledger-reconciliation report every
    * finance close runs against an ETL'd star schema. (On this
    * synthetic data header and line totals are independently generated,
    * so the drift is large — the AUDIT is the operator; the number is
    * the data's.) Headers with no lines reconcile against 0 and count
    * their full total as drift, the audit-correct reading.
    *
    * 100 TB shape: lines partial-agg to one row per order FIRST (the
    * only corpus-sized shuffle, on the join key itself), the header
    * join is keyed on the same key (no re-shuffle of the agg side),
    * and the panel is a partial-agg'd rollup onto O(statuses) cells.
    * All arithmetic in integer cents. */
  def reconcileOrders(spark: SparkSession, dir: String): DataFrame = {
    val lineTotals = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), cents(col("l_extendedprice")).as("v"))
      .groupBy(col("l_orderkey"))
      .agg(sum(col("v")).as("line_cents"))
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderstatus"),
        cents(col("o_totalprice")).as("header_cents"))
      .join(lineTotals, col("o_orderkey") === col("l_orderkey"), "left")
      .withColumn("line_cents", coalesce(col("line_cents"), lit(0L)))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        sum((col("line_cents") =!= 0L).cast("long")).as("n_with_lines"),
        sum((col("header_cents") === col("line_cents")).cast("long")).as("n_exact"),
        sum(abs(col("header_cents") - col("line_cents"))).as("abs_drift_cents"))
  }

  /** Generic MERGE-apply (the batch half of a CDC upsert): rows of
    * `cdc` whose key exists in `snapshot` replace the matching row
    * (`updated`), keys absent from the snapshot insert (`inserted`),
    * untouched snapshot rows carry through (`kept`). Pure keyed
    * semi/anti joins — the MERGE INTO a lakehouse engine runs, with
    * the match phase expressed as Spark's own join forms so it scales
    * as a join, not a row-at-a-time upsert loop. */
  def mergeApply(snapshot: DataFrame, cdc: DataFrame, key: String): DataFrame = {
    val kept = snapshot.join(cdc.select(col(key)), Seq(key), "left_anti")
      .withColumn("change_type", lit("kept"))
    val updated = cdc.join(snapshot.select(col(key)), Seq(key), "left_semi")
      .withColumn("change_type", lit("updated"))
    val inserted = cdc.join(snapshot.select(col(key)), Seq(key), "left_anti")
      .withColumn("change_type", lit("inserted"))
    kept.unionAll(updated).unionAll(inserted)
  }

  /** CDC merge over the documents snapshot (x144): applies a pinned,
    * deterministic CDC batch — every doc_id ≡ 0 (mod 7) arrives as an
    * update with its char count re-measured, and every doc_id ≡ 0
    * (mod 13) arrives again as a NEW document under the negated key
    * (a collision-free synthetic insert id) — then reports the merged
    * table with per-row change_type. The query form of what
    * `pipeline/Maintenance.upsert` does to managed tables, made
    * oracle-checkable.
    *
    * 100 TB shape: [[mergeApply]]'s three keyed joins; the CDC side is
    * derived from the same scan by per-row projection (no extra
    * shuffle beyond the joins' own key exchanges). */
  def cdcMergeDocs(spark: SparkSession, dir: String): DataFrame = {
    val snapshot = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
    val docs = Tables.documents(spark, dir)
    val updates = docs.filter(col("doc_id") % 7 === 0)
      .select(col("doc_id"), col("lang"),
        lit("cdc_update").as("source"), length(col("text")).cast("long").as("n_chars"))
    val inserts = docs.filter(col("doc_id") % 13 === 0 && col("doc_id") =!= 0)
      .select((-col("doc_id")).as("doc_id"), col("lang"),
        lit("cdc_insert").as("source"), col("n_chars"))
    mergeApply(snapshot, updates.unionAll(inserts), "doc_id")
  }

  /** Cohort LTV triangle (x145): customers grouped by first-order month
    * (the cohort), revenue accumulated by months-since-first-order (the
    * age) — the lifetime-value accumulation matrix every growth team
    * reads, with a running cumulative per cohort so LTV-at-age-k is a
    * row lookup.
    *
    * 100 TB shape: the fact collapses to (customer, month, cents)
    * per-row projections; the cohort month is a partial-agg'd
    * groupBy(customer) min, joined back ON THE SAME KEY (no second
    * corpus shuffle shape — the join key is the aggregation key); the
    * triangle is a partial-agg'd groupBy onto O(months²/2) cells and
    * the cumulative window runs over that tiny frame (the x48 case,
    * partitioned by cohort). */
  def cohortLtv(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_custkey"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
          .cast("long").as("m"),
        cents(col("o_totalprice")).as("v"))
    val first = o.groupBy(col("o_custkey")).agg(min(col("m")).as("cohort_m"))
    val tri = o.join(first, Seq("o_custkey"))
      .groupBy(col("cohort_m"), (col("m") - col("cohort_m")).as("age_months"))
      .agg(countDistinct(col("o_custkey")).as("n_customers"),
        sum(col("v")).as("revenue_cents"))
    val w = Window.partitionBy(col("cohort_m")).orderBy(col("age_months"))
      .rowsBetween(Window.unboundedPreceding, 0)
    tri.withColumn("cum_revenue_cents", sum(col("revenue_cents")).over(w))
  }

  /** Benford expected first-digit shares in ppm — round(10⁶·log₁₀(1+1/d))
    * for d = 1..9, pinned as integers so both engines compare the same
    * constants (shared with the x148 oracle SQL). */
  val BenfordPpm: Seq[Long] =
    Seq(301030L, 176091L, 124939L, 96910L, 79181L, 66947L, 57992L, 51153L, 45757L)

  /** Benford first-digit audit (x148): the observed first-digit
    * distribution of order totals vs Benford's law — the classic
    * fabricated-numbers screen an audit runs over any money column.
    * Observed shares in integer ppm (floor-div on nonnegatives);
    * expected shares are the pinned [[BenfordPpm]] constants; the
    * signed deviation stays an undivided subtraction of two ppm
    * integers.
    *
    * 100 TB shape: one scan partial-agg'd onto 9 digit cells; the
    * grand total is a window over that 9-row frame (the x48 tiny-table
    * case), not a second scan. */
  def benfordAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val digits = Tables.orders(spark, dir)
      .select(cents(col("o_totalprice")).as("v"))
      .filter(col("v") > 0)
      .withColumn("digit", substring(col("v").cast("string"), 1, 1).cast("long"))
      .groupBy(col("digit"))
      .agg(count(lit(1)).as("n_orders"))
    val benford = BenfordPpm.zipWithIndex
      .map { case (ppm, i) => (i + 1L, ppm) }
      .toDF("digit", "benford_ppm")
    digits
      .withColumn("n_total", sum(col("n_orders")).over(Window.partitionBy()))
      .withColumn("observed_ppm", expr("(1000000L * n_orders) div n_total"))
      .join(broadcast(benford), Seq("digit"))
      .select(col("digit"), col("n_orders"), col("observed_ppm"),
        col("benford_ppm"),
        (col("observed_ppm") - col("benford_ppm")).as("deviation_ppm"))
  }

  /** Join-key skew diagnostics (x149): for each fact-table join key
    * column, the top-5 hottest keys with their row counts and the
    * hot-key-over-average ratio in ppm — the panel that decides
    * whether a join needs salting or AQE skew handling BEFORE the job
    * runs (the operational companion to `SkewJoin`). `avg_per_key`
    * floors `n_total div n_keys`; `hot_x_avg_ppm` floors
    * `10⁶·n_hot div avg` — both nonnegative floor-divs. `10⁶·n_hot`
    * fits a Long up to ~9·10¹² rows on one key; beyond that the ratio
    * saturates the report long after the answer ("salt it") is
    * obvious.
    *
    * 100 TB shape, per column: one partial-agg'd groupBy(key) (the
    * same shuffle the audited join itself would do), a 1-row stats
    * aggregate, a TakeOrdered top-5, and a rank window over the 5-row
    * frame; the stats row crossJoins the 5-row side (broadcast-tiny,
    * the x65 pattern). Three columns → three such plans, unioned. */
  def keySkewAudit(spark: SparkSession, dir: String): DataFrame = {
    def panel(key: String): DataFrame = {
      val counts = Tables.lineitem(spark, dir)
        .groupBy(col(key).as("key")).agg(count(lit(1)).as("n_rows"))
      val stats = counts.agg(sum(col("n_rows")).as("n_total"),
        count(lit(1)).as("n_keys"))
      val top = counts.orderBy(col("n_rows").desc, col("key")).limit(5)
        .localCheckpoint()
      top
        .withColumn("rnk", row_number()
          .over(Window.orderBy(col("n_rows").desc, col("key"))).cast("long"))
        .crossJoin(stats)
        .withColumn("avg_per_key", expr("n_total div n_keys"))
        .select(lit(key).as("key_col"), col("rnk"), col("key"),
          col("n_rows"), col("n_keys"), col("n_total"), col("avg_per_key"),
          expr("(1000000L * n_rows) div avg_per_key").as("hot_x_avg_ppm"))
    }
    panel("l_orderkey").unionAll(panel("l_partkey")).unionAll(panel("l_suppkey"))
  }

  /** RFM customer segmentation (x120): per customer with ≥1 order,
    * recency (days since last order, relative to the corpus max day),
    * frequency (order count), monetary (lifetime cents), each scored
    * into exact global quartiles 1–4 plus the combined `rfm_code` — the
    * classic CRM segmentation, done with EXACT ranks at any scale.
    *
    * Quartile rule: `score = (4·r) div n + 1` where `r` is the number
    * of customers with a STRICTLY smaller metric value — ties share a
    * rank (and hence a score), so the scoring is deterministic with no
    * ordering ambiguity, and the oracle's `rank() − 1` reproduces `r`
    * bit-for-bit. Score 1 is the lowest-value quartile on every axis
    * (most-recent / fewest-orders / lowest-spend; flip signs upstream
    * if you want "best = 4" semantics).
    *
    * 100 TB shape: this is the show-piece for the scale-safe exact
    * quantile machinery. Naive exact ranks are a GLOBAL ordered window
    * over all customers — one task at corpus scale. Instead each
    * metric's (value → count) aggregate (partial-combined, O(distinct
    * values)) flows through [[Sampling.exclusivePrefixSum]], the
    * recursive multi-level prefix sum that never runs an ordered window
    * over more than its `maxWindowRows` bound, and the (value, rank)
    * table joins back on the metric value. The per-customer base and
    * each scored stage are `localCheckpoint`ed because every scoring
    * level reads its input twice (value-count aggregate + join left
    * side) — unchecked, the three levels would re-derive the orders
    * scan 2³ times. The 1-row (max_day, n_cust) scalar crossJoins back
    * broadcast (x65's global-totals pattern). */
  def rfmSegments(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(spark, dir)
      .select(col("o_custkey"),
        expr("unix_timestamp(o_orderdate) div 86400").as("day"),
        cents(col("o_totalprice")).as("v"))
      .groupBy(col("o_custkey"))
      .agg(max(col("day")).as("last_day"), count(lit(1)).as("n_orders"),
        sum(col("v")).as("monetary_cents"))
      .localCheckpoint()
    val g = base.agg(max(col("last_day")).as("max_day"),
      count(lit(1)).as("n_cust"))
    val m = base.crossJoin(g)
      .select(col("o_custkey").as("c_custkey"),
        (col("max_day") - col("last_day")).as("recency_days"),
        col("n_orders"), col("monetary_cents"), col("n_cust"))
    def scored(df0: DataFrame, metric: String, score: String): DataFrame = {
      val df = df0.localCheckpoint()
      val ranks = Sampling.exclusivePrefixSum(
          df.groupBy(col(metric)).agg(count(lit(1)).as("c"))
            .select(col(metric), col("c")))
        .select(col("key").as(metric), col("offset"))
      df.join(ranks, Seq(metric))
        .withColumn(score, expr("(4 * offset) div n_cust + 1"))
        .drop("offset")
    }
    val s = scored(scored(scored(m, "recency_days", "r_score"),
      "n_orders", "f_score"), "monetary_cents", "m_score")
    s.select(col("c_custkey"), col("recency_days"), col("n_orders"),
      col("monetary_cents"), col("r_score"), col("f_score"), col("m_score"),
      (col("r_score") * 100 + col("f_score") * 10 + col("m_score")).as("rfm_code"))
  }

  /** Regional segment revenue (x169): discounted revenue in exact cents
    * by sales region × customer market segment — the TPC-H-Q5-shaped
    * SIX-TABLE star join (customer ⋈ orders ⋈ lineitem ⋈ supplier ⋈
    * nation ⋈ region), the deepest join chain in the surface and the
    * plan shape a warehouse optimizer is actually judged on. Revenue
    * cents = round(price·(1−discount)·100): two IEEE multiplies then
    * one round, the same op order in both engines, so the integer is
    * cross-engine exact (the single-expression float discipline).
    *
    * 100 TB shape: the three fact-sized joins (customer⋈orders on
    * custkey, ⋈lineitem on orderkey, ⋈supplier on suppkey) each
    * shuffle on their own key — none is broadcastable and none is
    * hinted; nation and region are true dimension tables and broadcast
    * explicitly. Aggregation is partial→final onto O(regions ×
    * segments) cells, so the only corpus-sized traffic is the join
    * keys themselves. Supplier nation (not customer nation) defines
    * the region — "revenue by supply region", the inventory-planning
    * cut. */
  def regionSegmentRevenue(spark: SparkSession, dir: String): DataFrame = {
    val nr = Tables.nation(spark, dir)
      .join(Tables.region(spark, dir), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("r_name"))
    Tables.customer(spark, dir).select(col("c_custkey"), col("c_mktsegment"))
      .join(Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey")),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_suppkey"),
          round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
            .cast("long").as("rev_cents")),
        col("o_orderkey") === col("l_orderkey"))
      .join(Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nr), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("r_name"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n_lines"), sum(col("rev_cents")).as("rev_cents"))
  }

  /** Price-realization panel (x170): per part type, how the realized
    * unit economics compare to list price — line count, units moved,
    * realized revenue cents vs the retail value of those units
    * (Σ qty·retail_cents), and the realization RATIO in exact ppm
    * (> 10⁶ = selling above list; the gap is a consumer-side
    * subtraction — a signed division would hit the floor-vs-truncate
    * cross-engine trap x119 documents, so the published quotient keeps
    * a non-negative numerator). The classic merchandising "discount
    * depth" readout, exercising the otherwise-unused
    * p_type/p_retailprice columns with pure integer arithmetic.
    *
    * 100 TB shape: ONE fact⋈part join on the part key (both sides
    * shuffle; part is not broadcastable at catalog scale), partial-agg
    * onto O(types) cells. The ppm numerator runs in DECIMAL(38,0)
    * (10⁶·corpus-revenue-cents passes 2⁶³ — x155's promotion). */
  def priceRealization(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .select(col("l_partkey"), round(col("l_quantity")).cast("long").as("qty"),
        cents(col("l_extendedprice")).as("realized"))
      .join(Tables.part(spark, dir).select(col("p_partkey"), col("p_type"),
          cents(col("p_retailprice")).as("retail_unit")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_type"))
      .agg(count(lit(1)).as("n_lines"), sum(col("qty")).as("units"),
        sum(col("realized")).as("realized_cents"),
        sum(col("qty") * col("retail_unit")).as("retail_cents"))
      .withColumn("realization_ppm",
        expr("(1000000 * CAST(realized_cents AS DECIMAL(38,0))) div retail_cents"))
  }

  /** Per-part repeat-purchase rate (x154): for every part, how many
    * distinct customers bought it, how many bought it in ≥2 DISTINCT
    * orders, total distinct (customer, order) purchase events, and the
    * reorder probability in exact ppm — the Instacart-style "reorder
    * rate", the per-item stickiness feature under every replenishment
    * forecast (the reference's grocery theme).
    *
    * 100 TB shape: lineitem⋈orders shuffles on the order key (both
    * sides corpus-sized — a broadcast is impossible and none is
    * hinted), then ONE distinct on (part, customer, order) and two
    * partial-agg'd groupBys that only ever shrink. No windows, no
    * driver state; 10⁶·n_repeat fits a long to 9·10¹² customers. */
  def reorderRate(spark: SparkSession, dir: String): DataFrame = {
    val lo = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"))
      .join(Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_partkey").as("p"), col("o_custkey").as("c"),
        col("l_orderkey").as("ok"))
      .distinct()
    lo.groupBy(col("p"), col("c")).agg(count(lit(1)).as("n_ord"))
      .groupBy(col("p"))
      .agg(count(lit(1)).as("n_customers"),
        sum(when(col("n_ord") >= 2, 1L).otherwise(0L)).as("n_repeat"),
        sum(col("n_ord")).as("n_orders"))
      .select(col("p").as("p_partkey"), col("n_customers"), col("n_repeat"),
        col("n_orders"),
        expr("(1000000L * n_repeat) div n_customers").as("reorder_ppm"))
  }

  /** Customer-spend Lorenz deciles (x155): lifetime spend per customer,
    * cut into exact global deciles (`(10·r) div n + 1` on the strict
    * rank r — x120's tie-sharing rule), with per-decile customer count,
    * spend, cumulative spend, and exact-ppm shares — the Lorenz curve
    * behind every "top decile drives X% of revenue" readout.
    *
    * 100 TB shape: ranks come from the (value → count) aggregate
    * through [[Sampling.exclusivePrefixSum]] (x120's scale-safe exact
    * quantile machinery — never a corpus-wide ordered window); the only
    * ordered window left runs over the 10-row decile table. Share
    * numerators 10⁶·cents overflow a long past ~9·10¹² dollars of
    * corpus revenue, inside the 100 TB envelope — so the ppm division
    * is an integer `div` over a DECIMAL(38,0) numerator (wrap-free,
    * x152's discipline). */
  def spendDeciles(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(cents(col("o_totalprice"))).as("spend_cents"))
      .localCheckpoint()
    val g = base.agg(count(lit(1)).as("n_cust"),
      sum(col("spend_cents")).as("total_cents"))
    val ranks = Sampling.exclusivePrefixSum(
        base.groupBy(col("spend_cents")).agg(count(lit(1)).as("c"))
          .select(col("spend_cents"), col("c")))
      .select(col("key").as("spend_cents"), col("offset"))
    val dec = base.join(ranks, Seq("spend_cents"))
      .crossJoin(broadcast(g))
      .withColumn("decile", expr("(10 * offset) div n_cust + 1"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("spend_cents")).as("decile_cents"),
        max(col("total_cents")).as("total_cents"))
    // ≤10-row table: the unpartitioned cumulative window is the
    // documented tiny-table case
    val w = Window.orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dec
      .withColumn("cum_cents", sum(col("decile_cents")).over(w))
      .select(col("decile"), col("n_customers"), col("decile_cents"),
        col("cum_cents"),
        expr("(1000000 * CAST(decile_cents AS DECIMAL(38,0))) div total_cents")
          .as("share_ppm"),
        expr("(1000000 * CAST(cum_cents AS DECIMAL(38,0))) div total_cents")
          .as("cum_share_ppm"))
  }

  /** Customer-spend Gini concentration (x156): the exact Gini
    * coefficient of lifetime customer spend, published as the RAW
    * rational (gini_num, gini_den) with gini = num/den left to the
    * consumer (x119's discipline — rationals merge and compare exactly;
    * IEEE division doesn't). Uses the tie-exact rank identity
    * 2·Σᵢ rᵢxᵢ = Σ_groups v·cnt·(2·o + cnt + 1) over the (value →
    * count) aggregate — within a tied group the consecutive ranks sum
    * to cnt·o + cnt(cnt+1)/2 regardless of ordering, so no per-row
    * rank, no ordering ambiguity, and the whole statistic reduces over
    * the DISTINCT-VALUE table. gini_num = 2R − (n+1)·S ≥ 0,
    * gini_den = n·S, for ascending ranks r ∈ 1..n and spend total S.
    *
    * 100 TB shape: offsets via [[Sampling.exclusivePrefixSum]] (no
    * corpus window), one final 1-row reduce. Every product runs in
    * DECIMAL(38,0): v·cnt·(2o+cnt+1) reaches ~10²⁹ at corpus scale and
    * total cents alone can pass 2⁶³ — wrap-free by construction. */
  def spendGini(spark: SparkSession, dir: String): DataFrame = {
    val grouped = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(cents(col("o_totalprice"))).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val ranks = Sampling.exclusivePrefixSum(grouped.select(col("v"), col("cnt")))
      .select(col("key").as("v"), col("offset"))
    val a = grouped.join(ranks, Seq("v"))
      .agg(sum(col("cnt")).as("n_customers"),
        sum(col("v").cast("decimal(38,0)") * col("cnt"))
          .as("total_cents"),
        sum(col("v").cast("decimal(38,0)") * col("cnt")
          * (col("offset") * 2 + col("cnt") + 1)).as("two_r"))
    a.select(col("n_customers"),
      col("total_cents").cast("decimal(38,0)").cast("string").as("total_cents"),
      (col("two_r") - (col("n_customers") + 1).cast("decimal(38,0)")
        * col("total_cents")).cast("decimal(38,0)").cast("string").as("gini_num"),
      (col("n_customers").cast("decimal(38,0)") * col("total_cents"))
        .cast("decimal(38,0)").cast("string").as("gini_den"))
  }

  /** The Silver pipeline composition (silver_processing.py.py:14-74)
    * transplanted onto testdata: dedup fact → ⟕ dim → ⟕ date-keyed flag →
    * coalesce rescue → derive year/month → drop any-null rows.
    * Preserves the reference's semantic composition exactly (left joins +
    * na.drop = inner-ish on dim availability, coalesce rescues the flag join
    * — SURVEY §2.4 note). */
  def silverLike(spark: SparkSession, dir: String): DataFrame = {
    // sort-window dedup: (date, supplier) keys are near-unique, the
    // min_by-struct form churns allocations here (see dedupFirstSort doc)
    val fact = dedupFirstSort(
      Tables.lineitem(spark, dir).withColumn("ship_date", col("l_shipdate").cast("date")),
      keys = Seq("ship_date", "l_suppkey"),
      order = Seq("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"))
      .select(col("ship_date"), col("l_suppkey"), col("l_orderkey"),
        col("l_quantity").cast("long").as("quantity"), cents(col("l_extendedprice")).as("price_cents"))
    val dim = Tables.supplier(spark, dir)
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey"))
    // date-keyed enrichment (role of holidays/oil): urgency flag per order date
    val urgent = Tables.orders(spark, dir)
      .groupBy(col("o_orderdate").cast("date").as("ship_date"))
      .agg(max(when(col("o_orderpriority") === "1-URGENT", 1).otherwise(0)).as("is_urgent"))
    fact
      .join(broadcast(dim), col("l_suppkey") === col("s_suppkey"), "left")
      .join(urgent, Seq("ship_date"), "left")
      .withColumn("is_urgent", coalesce(col("is_urgent"), lit(0)))
      .withColumn("year", year(col("ship_date")))
      .withColumn("month", month(col("ship_date")))
      .drop("s_suppkey")
      .na.drop()
  }

  /** The flagship Gold weekly-features query (SURVEY §7.2): weekly grain agg
    * (gold_feature.py.py:15-24) + lag(1)/lag(2) (:30-31) + trailing-4-week
    * ROWS-frame mean (:35-38) + na.drop(subset) (:40). Pairs calendar `year`
    * with ISO `weekofyear` exactly as the reference does (SURVEY §7.4 risk 4).
    * GroupBy and window share the l_suppkey partitioning → Catalyst reuses
    * the exchange (one shuffle total after the scan). */
  def weeklyFeatures(spark: SparkSession, dir: String): DataFrame = {
    // repartition by suppkey BEFORE the aggregate: HashPartitioning(suppkey)
    // satisfies the agg's ClusteredDistribution(suppkey, year, week) AND the
    // window's (suppkey), so ONE raw-row shuffle replaces both downstream
    // exchanges. Partial aggregation would not reduce here anyway: the
    // ~29k (suppkey, year, week) groups appear in every scan partition, so
    // map-side partials emit ≈ partitions × groups rows — more than the
    // input. (Reference shape: gold_feature.py.py:15-38.)
    val weekly = Tables.lineitem(spark, dir)
      .withColumn("year", year(col("l_shipdate")))
      .withColumn("week", weekofyear(col("l_shipdate")))
      .repartition(col("l_suppkey"))
      .groupBy(col("l_suppkey"), col("year"), col("week"))
      .agg(
        sum(cents(col("l_extendedprice"))).as("weekly_revenue_cents"),
        max(when(col("l_returnflag") === "R", 1).otherwise(0)).as("had_return"),
        sum(cents(col("l_discount"))).as("disc_cents"),
        count(lit(1)).as("n_items"))
      .withColumn("avg_discount_cents", col("disc_cents") / col("n_items"))
      .drop("disc_cents")
    val w = Window.partitionBy(col("l_suppkey")).orderBy(col("year"), col("week"))
    val frame = w.rowsBetween(-4, -1)
    weekly
      .withColumn("prev_week_revenue", lag(col("weekly_revenue_cents"), 1).over(w))
      .withColumn("prev2_week_revenue", lag(col("weekly_revenue_cents"), 2).over(w))
      .withColumn("mean_last4_weeks",
        sum(col("weekly_revenue_cents")).over(frame) / count(lit(1)).over(frame))
      .na.drop(Seq("prev_week_revenue", "prev2_week_revenue", "mean_last4_weeks"))
  }

  /** Leave-one-out target encoding (x189): the feature-engineering pass
    * that replaces a categorical (brand) with the mean of the target
    * (quantity) over OTHER rows of the same category — self-exclusion
    * is what keeps the encoding leakage-free for training. Key insight
    * for exactness AND scale: the LOO value depends on a row only
    * through its (category, target) pair, so the encoding table is the
    * (brand, qty) AGGREGATE — `loo_num = brand_sum − qty`,
    * `loo_den = brand_count − 1` — published as the raw rational plus
    * the one-IEEE-division double (x119's discipline). Categories with
    * a single row have no peers (den = 0): published with a NULL
    * encoding and flagged, the standard fallback-to-prior case.
    *
    * 100 TB shape: one fact-scan partial-agg'd groupBy onto the
    * (brand × distinct-target) frame, a broadcast-sized brand rollup
    * joined back, zero row-level recomputation — the encoding JOINS
    * onto training rows by (brand, qty) at feature time. */
  def looTargetEncoding(spark: SparkSession, dir: String): DataFrame = {
    val rows = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), cents(col("l_quantity")).as("qty_centi"))
      .join(Tables.part(spark, dir).select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("qty_centi"))
      .agg(count(lit(1)).as("n_rows"))
      .localCheckpoint() // read by the brand rollup and the final join
    val brand = rows.groupBy(col("p_brand"))
      .agg(sum(col("qty_centi") * col("n_rows")).as("brand_sum"),
        sum(col("n_rows")).as("brand_cnt"))
    rows.join(broadcast(brand), Seq("p_brand"))
      .select(col("p_brand"), col("qty_centi"), col("n_rows"),
        (col("brand_sum") - col("qty_centi")).as("loo_num"),
        (col("brand_cnt") - 1).as("loo_den"),
        when(col("brand_cnt") > 1,
          (col("brand_sum") - col("qty_centi")).cast("double")
            / (col("brand_cnt") - 1)).as("loo_mean"),
        (col("brand_cnt") === 1).cast("int").as("no_peers"))
  }

  /** HyperLogLog register count (m = 2^4 buckets) for [[hllDistinctAudit]]
    * (x193) — shared with the DuckDB oracle. */
  val HllBuckets: Int = 16

  /** Power-of-two scale for the integer harmonic sum: `Σ 2^(58−reg)` fits
    * BIGINT exactly (≤ 16·2^58 = 2^62) while keeping every term exact. */
  val HllShiftCap: Int = 58

  /** HyperLogLog distinct-buyers sketch audit (x193): per nation, the
    * 16-register HLL of distinct ordering customers NEXT TO the exact
    * count — the sketch-fidelity artifact (x133's KMV discipline
    * applied to the other classic cardinality sketch). Every number is
    * integer-exact or a single shared IEEE expression:
    *
    *  - the item hash is the engine-neutral md5-60; bucket = h mod 16,
    *    register rank = trailing-zero count of the remaining 56 bits
    *    + 1 (`bit_count((rest & -rest) - 1) + 1` — identical bit tricks
    *    in both engines), empty buckets register 0 via the nation×16
    *    bucket universe;
    *  - the harmonic sum is kept INTEGER: `Σ 2^(58−reg)` is an exact
    *    BIGINT (each term a shifted 1, bounded 2^62), so register
    *    aggregation is order-independent;
    *  - the raw HLL estimate `α₁₆·m²/Σ2^(−reg)` is then ONE double
    *    division of two deterministically-cast operands (long→double
    *    is correctly rounded in both engines), floored to units — no
    *    order-dependent float accumulation anywhere. The small-range
    *    bias of the RAW estimator is part of the published contract
    *    (err_ppm says how far off it is — that honesty is the point of
    *    the audit); production consumers apply the standard corrections
    *    downstream.
    *
    * 100 TB shape: registers are a partial-agg'd max per (nation,
    * bucket) — 16 rows per group key, mergeable across any partitioning
    * (the same property the streaming twin exploits); the corpus is
    * scanned once, and the exact side is the one countDistinct this
    * audit exists to eventually replace. */
  /** Append the HLL (bucket, rank) columns for an item column — the
    * md5-60 trailing-zero register rank shared by x193, x199, and the
    * streaming register twin. */
  private[graft] def withHllRank(df: DataFrame, item: Column): DataFrame =
    df.withColumn("h", Dedup.md5Hash60(concat(lit("hll:"), item.cast("string"))))
      .withColumn("bucket", pmod(col("h"), lit(HllBuckets.toLong)))
      .withColumn("rest", expr(s"h div $HllBuckets"))
      .withColumn("rnk", when(col("rest") === 0L, lit(57L))
        .otherwise(expr("bit_count((rest & -rest) - 1) + 1").cast("long")))

  /** The generic HLL-vs-exact audit over a DISTINCT (key, item) frame
    * (item column named `item`): registers → integer harmonic sum →
    * raw estimate → err_ppm, one row per key. See [[hllDistinctAudit]]
    * for the exactness argument. */
  private[graft] def hllAuditByKey(pairs: DataFrame, key: String): DataFrame = {
    val spark = pairs.sparkSession
    val regs = withHllRank(pairs, col("item"))
      .groupBy(col(key), col("bucket")).agg(max(col("rnk")).as("register"))
    val universe = pairs.select(col(key)).distinct()
      .crossJoin(spark.range(HllBuckets.toLong).select(col("id").as("bucket")))
    val harm = universe
      .join(broadcast(regs), Seq(key, "bucket"), "left")
      .withColumn("register", coalesce(col("register"), lit(0L)))
      .groupBy(col(key))
      .agg(sum(expr(s"shiftleft(1L, cast($HllShiftCap - least(register, ${HllShiftCap}L) as int))"))
        .as("harmonic_scaled"),
        max(col("register")).as("max_register"))
    val exact = pairs.groupBy(col(key)).agg(count(lit(1)).as("n_exact"))
    // α₁₆·m²·2^58 as the product of two exact-parse literals (one IEEE
    // multiply, identical in both engines); 2^58 = 288230376151711744.
    val alphaScaled = expr("172.288d * 288230376151711744.0d")
    harm.join(broadcast(exact), Seq(key))
      .withColumn("est_hll",
        floor(alphaScaled / col("harmonic_scaled").cast("double")).cast("long"))
      .select(col(key), col("n_exact"), col("max_register"),
        col("harmonic_scaled"), col("est_hll"),
        expr("(1000000L * abs(est_hll - n_exact)) div n_exact").as("err_ppm"))
  }

  def hllDistinctAudit(spark: SparkSession, dir: String): DataFrame = {
    val buyers = Tables.orders(spark, dir).select(col("o_custkey"))
      .join(Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey").as("n_nationkey"), col("o_custkey").as("item"))
      .distinct()
    hllAuditByKey(buyers, "n_nationkey")
  }

  /** x206's incremental-view cut date (epoch day of 2001-01-01) —
    * orders before it are the "materialized base", the rest the delta
    * batch. Shared with the DuckDB oracle. */
  val IvmCutDay: Long = 11323L

  /** Incremental view maintenance of the nation-revenue aggregate
    * (x206): the warehouse technique behind every materialized
    * dashboard — maintain `Σ revenue, n_orders per nation` by folding
    * ONLY the delta batch into yesterday's materialized aggregate (sum
    * and count are self-mergeable, the same property the streaming
    * twins and TermStage partials exploit), never rescanning the base.
    * The published frame is the maintained view; the oracle is the
    * FULL recompute over all orders — maintained ≡ rebuilt is
    * gate-checked, x203's discipline at the aggregate level (x144
    * covers row-level CDC; this covers the aggregate artifact).
    *
    * 100 TB shape: the base aggregate is O(nations) (in production a
    * persisted table; here derived once from the pre-cut partition —
    * date predicate pushed to the scan), the delta scan touches only
    * post-cut files under date partitioning, and the merge is a
    * partial-agg'd union of two O(nations) frames. */
  def ivmNationRevenue(spark: SparkSession, dir: String,
                       cutDay: Long = IvmCutDay): DataFrame = {
    val keyed = Tables.orders(spark, dir)
      .select(col("o_custkey"),
        expr("unix_timestamp(o_orderdate) div 86400").as("day"),
        cents(col("o_totalprice")).as("c"))
      .join(Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
    def agg(df: DataFrame): DataFrame = df.groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_orders"), sum(col("c")).as("rev_cents"))
    val base = agg(keyed.filter(col("day") < cutDay))
    val delta = agg(keyed.filter(col("day") >= cutDay))
    base.select(col("c_nationkey"), col("n_orders"), col("rev_cents"))
      .union(delta.select(col("c_nationkey"), col("n_orders"), col("rev_cents")))
      .groupBy(col("c_nationkey"))
      .agg(sum(col("n_orders")).as("n_orders"),
        sum(col("rev_cents")).as("rev_cents"))
  }

  /** x208's bucket count — shared with the DuckDB oracle. */
  val RangeBuckets: Int = 16

  /** Equi-depth range-partition boundaries (x208): the B−1 customer-key
    * split points that would balance the orders fact across B range
    * partitions — what `RangePartitioner` / a table-layout planner
    * samples for, computed EXACTLY: boundary i is the smallest key
    * whose cumulative row count reaches ⌈i·n/B⌉ (rank-pick discipline,
    * x197/x131). Published with the achieved cumulative count so the
    * planner can see the discreteness error (a hot key can overshoot
    * its target — that overshoot IS the skew the boundary table
    * exists to expose).
    *
    * 100 TB shape: the corpus collapses to the per-key histogram first
    * (one partial-agg'd shuffle on the key); the running sum and the
    * rank pick run over DISTINCT keys. Unlike the genuinely bounded
    * frames elsewhere in this file, the key domain here is CUSTOMER
    * keys — it grows with the data — so the cumulative count rides
    * [[Sampling.exclusivePrefixSum]]: per-range local windows plus a
    * recursive prefix over range totals, never a single task holding
    * all O(keys) rows (3 levels suffice for 10⁹ keys at fanout 1000).
    * `fanout`/`maxWindowRows` are exposed so the spec can force the
    * recursive path and prove it equal to the one-level plan. */
  def rangeBoundaries(spark: SparkSession, dir: String,
                      buckets: Int = RangeBuckets,
                      fanout: Long = 1000L,
                      maxWindowRows: Long = 1000000L): DataFrame = {
    val hist = Tables.orders(spark, dir)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_rows"))
      .localCheckpoint() // consumed by the prefix sum AND the total
    val offsets = Sampling.exclusivePrefixSum(
      hist.select(col("o_custkey"), col("n_rows")), fanout, maxWindowRows)
    val cum = hist
      .join(offsets.select(col("key").as("o_custkey"), col("offset")),
        Seq("o_custkey"))
      .withColumn("cum", col("offset") + col("n_rows"))
      .drop("offset", "n_rows")
      .crossJoin(broadcast(hist.agg(sum(col("n_rows")).as("n_total"))))
      .localCheckpoint() // joined against every boundary target
    val targets = spark.range(1L, buckets.toLong)
      .select(col("id").as("bucket_idx"))
      .crossJoin(broadcast(cum.select(col("n_total")).limit(1)))
      .withColumn("target", expr(s"(bucket_idx * n_total + ${buckets - 1}) div $buckets"))
    targets.join(cum, col("cum") >= col("target"))
      .groupBy(col("bucket_idx"), col("target"))
      .agg(min(col("o_custkey")).as("boundary_key"))
      .join(cum.select(col("o_custkey").as("boundary_key"), col("cum").as("cum_rows")),
        Seq("boundary_key"))
      .select(col("bucket_idx"), col("target"), col("boundary_key"), col("cum_rows"))
  }

  /** x209's per-dimension bucket bits (4 ⇒ 16×16 = 256 tiles) — shared
    * with the DuckDB oracle. */
  val ZorderBits: Int = 4

  /** Z-order (Morton) tile audit (x209): bucket the orders fact on the
    * two query dimensions a lakehouse would cluster by — customer key
    * and order day — into 2^bits equi-WIDTH buckets each, interleave
    * the bucket bits into the Morton tile id, and publish per-tile row
    * counts with the key/day envelopes. This is the layout-planning
    * artifact behind OPTIMIZE ZORDER (`pipeline.Maintenance`'s analog):
    * a tile's row count vs the uniform ideal is exactly the data-skipping
    * quality a Z-ordered rewrite would achieve on range predicates over
    * either dimension. All-integer: bucket = ((v − min)·2^bits) div
    * (max − min + 1), the interleave is a closed-form shift/mask sum —
    * identical expressions in both engines.
    *
    * 100 TB shape: one corpus scan projects the tile id (per-row integer
    * ops, min/max fold in as a broadcast 1-row aggregate — the
    * documented scalar cross), then one partial-agg'd groupBy on the
    * 256-value tile key. */
  def zorderTiles(spark: SparkSession, dir: String,
                  bits: Int = ZorderBits): DataFrame = {
    val rows = Tables.orders(spark, dir)
      .select(col("o_custkey").as("k"),
        expr("unix_timestamp(o_orderdate) div 86400").as("day"))
    val bounds = rows.agg(min(col("k")).as("min_k"), max(col("k")).as("max_k"),
      min(col("day")).as("min_d"), max(col("day")).as("max_d"))
    val m = 1 << bits
    val interleave = (0 until bits).map(b =>
      s"(((bx >> $b) & 1) << ${2 * b + 1}) + (((by >> $b) & 1) << ${2 * b})")
      .mkString(" + ")
    rows.crossJoin(broadcast(bounds))
      .withColumn("bx", expr(s"((k - min_k) * $m) div (max_k - min_k + 1)"))
      .withColumn("by", expr(s"((day - min_d) * $m) div (max_d - min_d + 1)"))
      .withColumn("tile", expr(interleave))
      .groupBy(col("tile"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("k")).as("min_key"), max(col("k")).as("max_key"),
        min(col("day")).as("min_day"), max(col("day")).as("max_day"))
  }

  /** Explicit GROUPING SETS panel (x210): revenue at the four
    * aggregation levels a dashboard actually serves — (nation, year),
    * (nation), (year), grand total — in ONE pass with `grouping_id`
    * disambiguating the levels (the CUBE x126 / ROLLUP x65 sibling,
    * but with the level list chosen, not implied: GROUPING SETS is the
    * primitive the other two desugar to). One corpus scan, one
    * partial-agg'd shuffle; at 100 TB this replaces four separate
    * aggregation jobs with one. */
  def groupingSetsPanel(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey"), year(col("o_orderdate")).cast("long").as("yr"),
        cents(col("o_totalprice")).as("c"))
      .groupingSets(
        Seq(Seq(col("c_nationkey"), col("yr")), Seq(col("c_nationkey")),
          Seq(col("yr")), Seq()),
        col("c_nationkey"), col("yr"))
      .agg(grouping_id().as("gid"), count(lit(1)).as("n_orders"),
        sum(col("c")).as("rev_cents"))

  /** Cross-table corpus alignment audit (x216): do the documents and
    * embeddings tables describe the SAME corpus? The referential gate a
    * multimodal/RAG pipeline runs before training on paired text +
    * vectors (x139's FK-integrity discipline applied across the
    * document/vector boundary): id-universe sizes, the matched count,
    * orphans on each side, and the id envelopes per side so a drifting
    * ingest (one table ahead of the other) is visible at a glance. One
    * full outer join on the id — the only shuffle, keyed — rolled up to
    * a single row. */
  def corpusAlignment(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id")).distinct()
    val vecs = Tables.embeddings(spark, dir)
      .select(col("vec_id")).distinct()
    docs.join(vecs, col("doc_id") === col("vec_id"), "full_outer")
      .agg(
        sum(when(col("doc_id").isNotNull, 1L).otherwise(0L)).as("n_docs"),
        sum(when(col("vec_id").isNotNull, 1L).otherwise(0L)).as("n_vecs"),
        sum(when(col("doc_id").isNotNull && col("vec_id").isNotNull, 1L)
          .otherwise(0L)).as("n_matched"),
        sum(when(col("vec_id").isNull, 1L).otherwise(0L)).as("n_docs_unembedded"),
        sum(when(col("doc_id").isNull, 1L).otherwise(0L)).as("n_vecs_orphaned"),
        min(col("doc_id")).as("min_doc_id"), max(col("doc_id")).as("max_doc_id"),
        min(col("vec_id")).as("min_vec_id"), max(col("vec_id")).as("max_vec_id"))
  }

  /** x220's checksum modulus (a prime below 2³⁰ so Σ over any corpus
    * stays far from BIGINT range) — shared with the DuckDB oracle. */
  val ChecksumMod: Long = 1000000007L

  private def checksumRow(df: DataFrame, table: String,
                          canonical: Column): DataFrame =
    df.select(Dedup.md5Hash60(canonical).as("h"))
      .agg(count(lit(1)).as("n_rows"),
        sum(pmod(col("h"), lit(ChecksumMod))).as("checksum"))
      .select(lit(table).as("table_name"), col("n_rows"), col("checksum"))

  /** Cross-engine table checksum manifest (x220): per table, the row
    * count plus an ORDER-INDEPENDENT content checksum — Σ over rows of
    * (md5₆₀(canonical row string) mod p) — the migration-validation
    * tool this whole library is the argument for: a user switching
    * engines checksums every table on both sides and compares nine
    * numbers instead of nine table dumps. The canonical string is the
    * engine-neutral repr discipline applied to every column class at
    * once (ints as digits, money as cents, timestamps as epoch
    * days/seconds), each field LENGTH-PREFIXED (`len:value`, NULL →
    * bare `N`) before the '|' join — a value containing the join
    * character cannot shift field boundaries (the parse is
    * length-driven) and NULL is distinct from the empty string (`0:`),
    * so distinct rows cannot collapse to one canonical string. The
    * modular sum makes the fold commutative — any partitioning, any
    * engine, same checksum (the HLL-register property, x193's class).
    *
    * 100 TB shape: one scan per table, a per-row hash, one
    * partial-agg'd global sum each — embarrassingly parallel; the
    * manifest is 9 rows. */
  def tableChecksums(spark: SparkSession, dir: String): DataFrame = {
    def cents(c: String) = s"cast(cast(round($c * 100) as bigint) as string)"
    def day(c: String) = s"cast(unix_timestamp($c) div 86400 as string)"
    def e(fields: String*): Column =
      expr(s"concat_ws('|', ${fields.map(canonField).mkString(", ")})")
    val ev = Tables.events(spark, dir)
    val rows = Seq(
      checksumRow(Tables.region(spark, dir), "region",
        e("cast(r_regionkey as string)", "r_name")),
      checksumRow(Tables.nation(spark, dir), "nation",
        e("cast(n_nationkey as string)", "n_name", "cast(n_regionkey as string)")),
      checksumRow(Tables.supplier(spark, dir), "supplier",
        e("cast(s_suppkey as string)", "s_name", "cast(s_nationkey as string)", cents("s_acctbal"))),
      checksumRow(Tables.part(spark, dir), "part",
        e("cast(p_partkey as string)", "p_name", "p_brand", "p_type", "cast(p_size as string)", cents("p_retailprice"))),
      checksumRow(Tables.customer(spark, dir), "customer",
        e("cast(c_custkey as string)", "c_name", "cast(c_nationkey as string)", cents("c_acctbal"), "c_mktsegment")),
      checksumRow(Tables.orders(spark, dir), "orders",
        e("cast(o_orderkey as string)", "cast(o_custkey as string)", "o_orderstatus", cents("o_totalprice"), day("o_orderdate"), "o_orderpriority")),
      checksumRow(Tables.lineitem(spark, dir), "lineitem",
        e("cast(l_orderkey as string)", "cast(l_partkey as string)", "cast(l_suppkey as string)", "cast(l_linenumber as string)", cents("l_quantity"), cents("l_extendedprice"), cents("l_discount"), cents("l_tax"), "l_returnflag", "l_linestatus", day("l_shipdate"))),
      checksumRow(Tables.documents(spark, dir), "documents",
        e("cast(doc_id as string)", "text", "lang", "source", "cast(n_chars as string)")),
      checksumRow(ev, "events",
        concat_ws("|", Seq(col("event_id").cast("string"),
          Sessionize.tsSeconds(ev).cast("string"),
          col("user_id").cast("string"), col("event_type"),
          expr("cast(cast(round(value * 100) as bigint) as string)"),
          col("props")).map(canonCol): _*)))
    rows.reduce(_ union _)
  }

  /** x220's length-prefixed canonical field (`len:value`, NULL → `N`) as
    * a SQL snippet — shared shape with the DuckDB oracle so a field
    * containing the join character can't shift boundaries and NULL ≠
    * empty string. */
  private def canonField(f: String): String =
    s"CASE WHEN ($f) IS NULL THEN 'N' ELSE concat(cast(length($f) as string), ':', $f) END"

  /** [[canonField]] for Column-API call sites. */
  private def canonCol(c: Column): Column =
    when(c.isNull, lit("N")).otherwise(concat(length(c).cast("string"), lit(":"), c))

  /** Winsor percentile bounds (x197), in whole percents — shared with
    * the DuckDB oracle. Rank = ceil(pct·n/100) over the (spend,
    * custkey) total order. */
  val WinsorLoPct: Int = 5
  val WinsorHiPct: Int = 95

  /** Winsorized & trimmed customer-spend means per market segment
    * (x197): the outlier-robust spend summary — clamp each customer's
    * lifetime spend to the segment's [p5, p95] rank values
    * (winsorize) and separately drop the tails (trim), publishing
    * both sums next to the raw one. All integer cents; the percentile
    * is a RANK pick (value at row_number ceil(p·n/100) under the
    * total (spend, custkey) order — x141's rank discipline), never a
    * float interpolation, so both engines pick the identical cent.
    *
    * 100 TB shape: the corpus collapses to the per-customer aggregate
    * first (one partial-agg'd shuffle on custkey); the rank window
    * partitions by the 5-value segment key over per-customer rows —
    * at extreme scale that per-segment sort is the one heavy step,
    * and the documented substitution is a two-pass bounded-domain
    * histogram quantile (the x29/x131 discipline) feeding the same
    * clamp; the clamp + rollup stages are unchanged either way. */
  def winsorizedSpend(spark: SparkSession, dir: String): DataFrame = {
    val spend = Tables.orders(spark, dir)
      .select(col("o_custkey"), cents(col("o_totalprice")).as("c"))
      .groupBy(col("o_custkey")).agg(sum(col("c")).as("spend"))
      .join(Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("spend"), col("o_custkey"))
    val ranked = spend
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("c_mktsegment"))))
      .withColumn("lo_rank", expr(s"(n * $WinsorLoPct + 99) div 100"))
      .withColumn("hi_rank", expr(s"(n * $WinsorHiPct + 99) div 100"))
    val bounds = ranked
      .filter(col("rn") === col("lo_rank") || col("rn") === col("hi_rank"))
      .groupBy(col("c_mktsegment").as("seg"))
      .agg(min(when(col("rn") === col("lo_rank"), col("spend"))).as("p5_cents"),
        min(when(col("rn") === col("hi_rank"), col("spend"))).as("p95_cents"))
    ranked.join(broadcast(bounds), col("c_mktsegment") === col("seg"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"),
        min(col("p5_cents")).as("p5_cents"),
        min(col("p95_cents")).as("p95_cents"),
        sum(col("spend")).as("raw_sum_cents"),
        sum(greatest(least(col("spend"), col("p95_cents")), col("p5_cents")))
          .as("winsor_sum_cents"),
        sum(when(col("rn") >= col("lo_rank") && col("rn") <= col("hi_rank"), 1L)
          .otherwise(0L)).as("trim_n"),
        sum(when(col("rn") >= col("lo_rank") && col("rn") <= col("hi_rank"),
          col("spend")).otherwise(0L)).as("trim_sum_cents"))
  }

  /** x222 knobs — the modeled file count (the layout's row groups) and
    * the predicate-grid resolution. Shared with the DuckDB oracle. */
  val ZoneFiles: Int = 64
  val ZonePredicates: Int = 16

  /** Zone-map data-skipping audit (x222): how effective min/max file
    * statistics are for custkey-range predicates under the CURRENT
    * physical layout — the artifact a lakehouse reads before deciding an
    * OPTIMIZE ZORDER rewrite (x209 plans the rewrite; this measures the
    * pain it would cure). The orders fact is modeled as [[ZoneFiles]]
    * insertion-ordered files (equi-width o_orderkey ranges — the arrival
    * proxy), each carrying its (min, max) custkey zone map; the workload
    * is the [[ZonePredicates]] equi-width custkey ranges that partition
    * the key domain. Per predicate: files skipped by the zone map
    * (file.max < lo or file.min > hi), rows actually scanned in the
    * surviving files, and rows truly matching — scanned/matching is the
    * read amplification the layout costs. All-integer bucket arithmetic
    * (x209's rule), so both engines tile identically.
    *
    * 100 TB shape: one corpus scan projects (file, predicate-bucket) per
    * row, the file stats are a [[ZoneFiles]]-row aggregate, the
    * predicate×file skip grid is a model-state broadcast cross
    * (16 × 64), and the matching counts are one partial-agg'd groupBy on
    * the 16-value bucket key. */
  def zoneMapSkipping(spark: SparkSession, dir: String): DataFrame =
    zoneMapSkipping(spark, dir, None)

  /** Footer-backed variant (x235): identical audit, but the file-stats
    * side comes from the REAL parquet footers of a written layout
    * ([[FooterStats]]) instead of an in-plan aggregate — the storage
    * layer measured, not modeled. Same DuckDB oracle as x222: the
    * layout partitions rows by the same deterministic bucket rule, so
    * footer min/max/count per bucket must equal the modeled stats. */
  def zoneMapSkippingFromFooters(spark: SparkSession, dir: String): DataFrame =
    zoneMapSkipping(spark, dir, Some(FooterStats.fileStats(spark, dir)))

  private def zoneMapSkipping(spark: SparkSession, dir: String,
                              fileStats: Option[DataFrame]): DataFrame = {
    val (nf, np) = (ZoneFiles, ZonePredicates)
    val rows = Tables.orders(spark, dir)
      .select(col("o_orderkey").as("k"), col("o_custkey").as("c"))
    val bounds = rows.agg(min(col("k")).as("min_k"), max(col("k")).as("max_k"),
      min(col("c")).as("min_c"), max(col("c")).as("max_c"))
    val tagged = rows.crossJoin(broadcast(bounds))
      .withColumn("f", expr(s"((k - min_k) * $nf) div (max_k - min_k + 1)"))
      .withColumn("p", expr(s"((c - min_c) * $np) div (max_c - min_c + 1)"))
      .localCheckpoint() // feeds the file stats AND the matching counts
    val files = fileStats.getOrElse(tagged.groupBy(col("f"))
      .agg(count(lit(1)).as("f_rows"), min(col("c")).as("f_min"), max(col("c")).as("f_max")))
    // predicate p covers exactly the bucket-p keys: lo is the smallest c
    // with ((c - min_c)·np) div range = p (ceil form), hi = next lo − 1
    val preds = spark.range(np.toLong).select(col("id").as("p"))
      .crossJoin(broadcast(bounds))
      .withColumn("lo", expr(s"min_c + (p * (max_c - min_c + 1) + $np - 1) div $np"))
      .withColumn("hi", expr(s"min_c + ((p + 1) * (max_c - min_c + 1) + $np - 1) div $np - 1"))
      .select(col("p"), col("lo"), col("hi"))
    val grid = preds.crossJoin(broadcast(files))
      .withColumn("skipped",
        (col("f_max") < col("lo") || col("f_min") > col("hi")).cast("long"))
      .groupBy(col("p"), col("lo"), col("hi"))
      .agg(count(lit(1)).as("n_files"),
        sum(col("skipped")).as("n_skipped"),
        sum(when(col("skipped") === 0L, col("f_rows")).otherwise(0L)).as("rows_scanned"))
    val matching = tagged.groupBy(col("p")).agg(count(lit(1)).as("n_matching"))
    grid.join(matching, Seq("p"), "left")
      .select(col("p"), col("lo"), col("hi"), col("n_files"), col("n_skipped"),
        col("rows_scanned"), coalesce(col("n_matching"), lit(0L)).as("n_matching"))
  }

  /** x277 knobs — words per file bitmap (63 usable bits each: DuckDB's
    * BIGINT `<<` raises on a 63-bit shift, so both engines use bit =
    * pos mod 63), md5-60 hash count, probe count, and the ladder-step
    * denominator (probe key = min_c + pid·(range div DENOM); with
    * BloomProbes > DENOM the ladder overshoots max_c so absent keys are
    * exercised — the spec asserts that). All shared with the oracle. */
  val BloomWords: Int = 64
  val BloomHashes: Int = 2
  val BloomProbes: Int = 16
  val BloomProbeStepDenom: Int = 12

  /** Bloom-filter file-skipping audit (x277): the EQUALITY-predicate
    * complement to x222's min/max zone maps — range stats can't skip a
    * point lookup whose key falls inside nearly every file's [min, max]
    * span, which is exactly the insertion-ordered layout's pathology
    * x231 measures. Each modeled file ([[ZoneFiles]], x222's assignment
    * rule) carries a [[BloomWords]]·63-bit Bloom bitmap over its custkeys
    * ([[BloomHashes]] md5-60 positions per key — the engine-neutral hash
    * family the LSH oracles already use); a probe key scans a file only
    * if ALL its bits are set. Per probe: files the bloom admits, files
    * truly containing the key, and the difference — the FALSE-POSITIVE
    * read amplification the sketch costs at this fill ratio (measured,
    * not modeled from the fill formula). Probes are a deterministic
    * equi-spaced ladder that overshoots max_c, so absent keys (the
    * point-lookup skipping win) are exercised alongside present ones.
    *
    * 100 TB shape: the bitmap table is O(files · words) catalog state
    * built by one map-side-combining `bit_or` over the scan (it lives in
    * the footer/catalog like the zone maps); a probe touches
    * O(files · hashes) bitmap WORDS — never the data — and the crosses
    * here are all model-state-sized (probe ladder × 64 file ids). */
  /** One md5-60 bloom position for hash index column `i` (shared by the
    * audit and the streaming bitmap ingester). */
  private def bloomPos(key: String): Column = expr(
    s"cast(conv(substr(md5(concat(cast($key as string), ':', cast(i as string))), 1, 15), 16, 10) as bigint) % ${BloomWords * 63}")

  /** The (f, w, word) bitmap table for a (f, c) frame — one map-side-
    * combining `bit_or` fold; MERGEABLE: bitmaps of row subsets bit_or
    * into the full table's bitmaps, which is what the streaming ingester
    * ([[graft.streaming.BloomStream]]) exploits. */
  private[graft] def bloomWordsFrame(tagged: DataFrame): DataFrame = {
    val hashes = (0 until BloomHashes).map(lit(_))
    tagged.select(col("f"), col("c")).distinct()
      .select(col("f"), col("c"), explode(array(hashes: _*)).as("i"))
      .withColumn("p", bloomPos("c"))
      .groupBy(col("f"), expr("p div 63").as("w"))
      .agg(expr("bit_or(shiftleft(1L, cast(p % 63 as int)))").as("word"))
  }

  /** x277's file assignment with FROZEN layout bounds — the streaming
    * form (a stream can't know the corpus max; the layout declares it,
    * like any partitioning spec). A key OUTSIDE the declared bounds
    * fails LOUDLY: silently filing it under a phantom file id would
    * publish its bits where no planner probes (files 0..N-1), turning
    * the bloom's no-false-negative contract into a silent lie. */
  private[graft] def bloomTagged(rows: DataFrame, minK: Long, maxK: Long): DataFrame =
    rows.select(
      expr(s"CASE WHEN k < ${minK}L OR k > ${maxK}L THEN " +
        s"raise_error(concat('bloom layout bounds violated: key ', " +
        s"cast(k as string), ' outside [$minK, $maxK]')) " +
        s"ELSE ((k - ${minK}L) * $ZoneFiles) div (${maxK}L - ${minK}L + 1) END").as("f"),
      col("c"))

  /** Shared x277/x280 assembly: value-tagged file rows, the probe
    * ladder, and the per-(probe, file) bloom admissions. */
  private def bloomProbeFrames(spark: SparkSession, dir: String): (DataFrame, DataFrame, DataFrame) = {
    val (nf, np) = (ZoneFiles, BloomProbes)
    val rows = Tables.orders(spark, dir)
      .select(col("o_orderkey").as("k"), col("o_custkey").as("c"),
        cents(col("o_totalprice")).as("cents"))
    val bounds = rows.agg(min(col("k")).as("min_k"), max(col("k")).as("max_k"),
      min(col("c")).as("min_c"), max(col("c")).as("max_c"))
    val tagged = rows.crossJoin(broadcast(bounds))
      .withColumn("f", expr(s"((k - min_k) * $nf) div (max_k - min_k + 1)"))
      .select(col("f"), col("c"), col("cents"))
      .localCheckpoint() // feeds the bitmaps, the file list, and the truth
    val hashes = (0 until BloomHashes).map(lit(_))
    val words = bloomWordsFrame(tagged)
    val fl = tagged.select(col("f")).distinct()
    val probes = spark.range(np.toLong).select(col("id").as("pid"))
      .crossJoin(broadcast(bounds))
      .withColumn("key", expr(s"min_c + pid * ((max_c - min_c) div $BloomProbeStepDenom)"))
      .select(col("pid"), col("key"))
    val ppos = probes.select(col("pid"), col("key"), explode(array(hashes: _*)).as("i"))
      .withColumn("p", bloomPos("key"))
    val wt = words.withColumnRenamed("f", "wf")
    val tests = ppos.crossJoin(broadcast(fl))
      .join(broadcast(wt), col("f") === col("wf") && expr("p div 63") === col("w"), "left")
      .withColumn("bit_set", when(col("word").isNotNull &&
        expr("word & shiftleft(1L, cast(p % 63 as int))") =!= 0L, 1L).otherwise(0L))
    val hits = tests.groupBy(col("pid"), col("key"), col("f"))
      .agg(min(col("bit_set")).as("hit"))
    (tagged, probes, hits)
  }

  def bloomSkipping(spark: SparkSession, dir: String): DataFrame = {
    val (tagged, probes, hits) = bloomProbeFrames(spark, dir)
    val actual = probes.join(tagged, col("c") === col("key"))
      .groupBy(col("pid"), col("f")).agg(count(lit(1)).as("n"))
    hits.join(actual, Seq("pid", "f"), "left")
      .withColumnRenamed("key", "probe_key")
      .groupBy(col("pid"), col("probe_key"))
      .agg(sum(col("hit")).as("n_files_hit"),
        count(col("n")).as("n_files_actual"),
        (sum(col("hit")) - count(col("n"))).as("n_false_pos"))
  }

  /** x280: the bitmaps SERVING a point-lookup join, not just auditing
    * one — the scan is restricted to the bloom-ADMITTED (probe, file)
    * pairs (a broadcast semi-filter, never touching skipped files) and
    * the per-probe row count / cents sum are computed through that
    * pruned path. The ORACLE computes the same answers by DIRECT key
    * lookup with no bloom anywhere, so the hash match turns the
    * no-false-negative contract into an oracle-checked END-TO-END
    * property of the served values (x250's bucket-lookup gate, for the
    * sketch). `n_files_scanned` (= x277's n_files_hit) records the price
    * paid. */
  def bloomServedLookup(spark: SparkSession, dir: String): DataFrame = {
    val (tagged, probes, hits) = bloomProbeFrames(spark, dir)
    val admitted = hits.filter(col("hit") === 1L)
      .select(col("pid"), col("key"), col("f"))
    val served = tagged.join(broadcast(admitted), Seq("f"))
      .filter(col("c") === col("key"))
      .groupBy(col("pid"))
      .agg(count(lit(1)).as("n_rows"), sum(col("cents")).as("sum_cents"))
    val scanned = hits.groupBy(col("pid"), col("key"))
      .agg(sum(col("hit")).as("n_files_scanned"))
    scanned.join(served, Seq("pid"), "left")
      .select(col("pid"), col("key").as("probe_key"), col("n_files_scanned"),
        coalesce(col("n_rows"), lit(0L)).as("n_rows"),
        coalesce(col("sum_cents"), lit(0L)).as("sum_cents"))
  }

  /** Layout-rewrite skipping delta (x231): x222's zone-map audit run
    * against BOTH file layouts — the CURRENT insertion-ordered one and
    * the Z-ORDERED one x209 plans — so the OPTIMIZE decision reads its
    * projected benefit as one table: per custkey-range predicate, rows
    * scanned before vs after the rewrite. File count is identical on
    * both sides ([[ZoneFiles]]; the z-ordered assignment is the Morton
    * tile at 3 bits/dim = 64 tiles over (custkey, order-day), x209's
    * interleave); only the row→file mapping changes, which is exactly
    * what OPTIMIZE ZORDER changes. The improvement is typically large
    * on the custkey dimension (tiles are custkey-coherent) — and the
    * table shows it per predicate instead of asserting it.
    *
    * 100 TB shape: x222's — one corpus scan tags each row with both
    * file ids and its predicate bucket, two 64-row file-stats
    * aggregates, one broadcast 16×64 skip grid per layout. */
  def zorderSkippingDelta(spark: SparkSession, dir: String): DataFrame =
    zorderSkippingDelta(spark, dir, None)

  /** Footer-backed variant (x236): x231's before/after-OPTIMIZE table
    * with BOTH layouts' file stats read from the real parquet footers
    * of written layouts ([[FooterStats]], insertion-ordered and
    * Morton-tiled) — the OPTIMIZE decision now reads the actual storage
    * metadata on each side. Same DuckDB oracle as x231. */
  def zorderSkippingDeltaFromFooters(spark: SparkSession, dir: String): DataFrame =
    zorderSkippingDelta(spark, dir, Some((
      FooterStats.fileStats(spark, dir, "insertion"),
      FooterStats.fileStats(spark, dir, "zorder"))))

  private def zorderSkippingDelta(spark: SparkSession, dir: String,
                                  footerStats: Option[(DataFrame, DataFrame)]): DataFrame = {
    val (nf, np) = (ZoneFiles, ZonePredicates)
    val bits = 3 // 2^(2·3) = 64 Morton tiles = ZoneFiles files
    val rows = Tables.orders(spark, dir)
      .select(col("o_orderkey").as("k"), col("o_custkey").as("c"),
        expr("unix_timestamp(o_orderdate) div 86400").as("day"))
    val bounds = rows.agg(min(col("k")).as("min_k"), max(col("k")).as("max_k"),
      min(col("c")).as("min_c"), max(col("c")).as("max_c"),
      min(col("day")).as("min_d"), max(col("day")).as("max_d"))
    val m = 1 << bits
    val interleave = (0 until bits).map(b =>
      s"(((bx >> $b) & 1) << ${2 * b + 1}) + (((by >> $b) & 1) << ${2 * b})")
      .mkString(" + ")
    val tagged = rows.crossJoin(broadcast(bounds))
      .withColumn("f_cur", expr(s"((k - min_k) * $nf) div (max_k - min_k + 1)"))
      .withColumn("bx", expr(s"((c - min_c) * $m) div (max_c - min_c + 1)"))
      .withColumn("by", expr(s"((day - min_d) * $m) div (max_d - min_d + 1)"))
      .withColumn("f_z", expr(interleave))
      .withColumn("p", expr(s"((c - min_c) * $np) div (max_c - min_c + 1)"))
      .localCheckpoint() // two file-stats rollups + the matching counts
    def scanPerPred(fileCol: String, out: String): DataFrame = {
      val modeled = tagged.groupBy(col(fileCol).as("f"))
        .agg(count(lit(1)).as("f_rows"), min(col("c")).as("f_min"), max(col("c")).as("f_max"))
      val files = footerStats.fold(modeled) { case (cur, z) =>
        if (fileCol == "f_cur") cur else z
      }
      spark.range(np.toLong).select(col("id").as("p"))
        .crossJoin(broadcast(bounds.select(col("min_c"), col("max_c"))))
        .withColumn("lo", expr(s"min_c + (p * (max_c - min_c + 1) + $np - 1) div $np"))
        .withColumn("hi", expr(s"min_c + ((p + 1) * (max_c - min_c + 1) + $np - 1) div $np - 1"))
        .crossJoin(broadcast(files))
        .groupBy(col("p"))
        .agg(sum(when(col("f_max") < col("lo") || col("f_min") > col("hi"), 0L)
          .otherwise(col("f_rows"))).as(out))
    }
    val matching = tagged.groupBy(col("p")).agg(count(lit(1)).as("n_matching"))
    scanPerPred("f_cur", "scanned_current")
      .join(scanPerPred("f_z", "scanned_zordered"), Seq("p"))
      .join(matching, Seq("p"), "left")
      .select(col("p"), coalesce(col("n_matching"), lit(0L)).as("n_matching"),
        col("scanned_current"), col("scanned_zordered"),
        (col("scanned_current") - col("scanned_zordered")).as("rows_saved"))
  }

  /** x278: rectangle predicates per dimension (4×4 = 16 2-D boxes over
    * (custkey, order-day)). Shared with the DuckDB oracle. */
  val RectPreds: Int = 4

  /** Curve-choice skipping delta (x278): Morton vs HILBERT tiling under
    * 2-D RECTANGLE predicates — the audit that actually separates the
    * curves. x231's 1-D custkey ranges can't: both curves make tiles
    * custkey-coherent. A 2-D box query is where Hilbert's locality
    * (consecutive cells are always grid NEIGHBORS — spec-proven, the
    * property Morton's bit-interleave lacks at quadrant seams) turns
    * into fewer files whose (c, day) bounding boxes straddle the box.
    * Same machinery as x231 otherwise: one corpus scan tags each row
    * with both file ids and its rectangle id, two 64-row file-stats
    * rollups (min/max on BOTH dimensions), one broadcast 16×64 skip
    * grid per layout.
    *
    * The Hilbert index is the classic xy2d recurrence unrolled for 3
    * bits/dim — integer CASEs only ((3·rx) xor ry rewritten as
    * `rx=0 ? ry : 3−ry`, so no engine-specific xor), identical text on
    * both sides via [[hilbertSteps]]. */
  def hilbertSkippingDelta(spark: SparkSession, dir: String): DataFrame = {
    val np = RectPreds
    val bits = 3
    val m = 1 << bits
    val rows = Tables.orders(spark, dir)
      .select(col("o_orderkey").as("k"), col("o_custkey").as("c"),
        expr("unix_timestamp(o_orderdate) div 86400").as("day"))
    val bounds = rows.agg(min(col("c")).as("min_c"), max(col("c")).as("max_c"),
      min(col("day")).as("min_d"), max(col("day")).as("max_d"))
    val interleave = (0 until bits).map(b =>
      s"(((bx >> $b) & 1) << ${2 * b + 1}) + (((by >> $b) & 1) << ${2 * b})")
      .mkString(" + ")
    var tagged = rows.crossJoin(broadcast(bounds))
      .withColumn("bx", expr(s"((c - min_c) * $m) div (max_c - min_c + 1)"))
      .withColumn("by", expr(s"((day - min_d) * $m) div (max_d - min_d + 1)"))
      .withColumn("f_z", expr(interleave))
      .withColumn("pc", expr(s"((c - min_c) * $np) div (max_c - min_c + 1)"))
      .withColumn("pd", expr(s"((day - min_d) * $np) div (max_d - min_d + 1)"))
      .withColumn("p", expr(s"pc * $np + pd"))
      .withColumn("hx", col("bx")).withColumn("hy", col("by"))
      .withColumn("hd", lit(0L))
    hilbertSteps(m, "div").foreach { case (name, sql) =>
      tagged = tagged.withColumn(name, expr(sql))
    }
    val t = tagged.withColumnRenamed("hd", "f_h")
      .select(col("c"), col("day"), col("p"), col("f_z"), col("f_h"))
      .localCheckpoint() // two file-stats rollups + the matching counts
    def scanPerPred(fileCol: String, out: String): DataFrame = {
      val files = t.groupBy(col(fileCol).as("f"))
        .agg(count(lit(1)).as("f_rows"),
          min(col("c")).as("c_min"), max(col("c")).as("c_max"),
          min(col("day")).as("d_min"), max(col("day")).as("d_max"))
      spark.range((np * np).toLong).select(col("id").as("p"))
        .crossJoin(broadcast(bounds))
        .withColumn("pc", expr(s"p div $np")).withColumn("pd", expr(s"p % $np"))
        .withColumn("lo_c", expr(s"min_c + (pc * (max_c - min_c + 1) + $np - 1) div $np"))
        .withColumn("hi_c", expr(s"min_c + ((pc + 1) * (max_c - min_c + 1) + $np - 1) div $np - 1"))
        .withColumn("lo_d", expr(s"min_d + (pd * (max_d - min_d + 1) + $np - 1) div $np"))
        .withColumn("hi_d", expr(s"min_d + ((pd + 1) * (max_d - min_d + 1) + $np - 1) div $np - 1"))
        .crossJoin(broadcast(files))
        .groupBy(col("p"))
        .agg(sum(when(col("c_max") < col("lo_c") || col("c_min") > col("hi_c") ||
          col("d_max") < col("lo_d") || col("d_min") > col("hi_d"), 0L)
          .otherwise(col("f_rows"))).as(out))
    }
    val matching = t.groupBy(col("p")).agg(count(lit(1)).as("n_matching"))
    scanPerPred("f_z", "scanned_zordered")
      .join(scanPerPred("f_h", "scanned_hilbert"), Seq("p"))
      .join(matching, Seq("p"), "left")
      .select(col("p"), coalesce(col("n_matching"), lit(0L)).as("n_matching"),
        col("scanned_zordered"), col("scanned_hilbert"),
        (col("scanned_zordered") - col("scanned_hilbert")).as("rows_saved"))
  }

  /** The xy2d unroll as (column, SQL) assignment steps over working
    * columns (hx, hy, hd) seeded with (bx, by, 0) — identical text on
    * both engines apart from the integer-division token (`div` vs `//`).
    * Reflection uses n−1 (the classic rot), rotation swaps via the nx
    * temporary so hy still reads the PRE-swap hx. */
  private[graft] def hilbertSteps(n: Int, divOp: String): Seq[(String, String)] = {
    val steps = Iterator.iterate(n / 2)(_ / 2).takeWhile(_ > 0).toSeq
    steps.flatMap { s =>
      Seq(
        "rx" -> s"(hx $divOp $s) % 2",
        "ry" -> s"(hy $divOp $s) % 2",
        "hd" -> s"hd + ${s.toLong * s} * (CASE WHEN rx = 0 THEN ry ELSE 3 - ry END)",
        "nx" -> s"CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN ${n - 1} - hy ELSE hy END) ELSE hx END",
        "hy" -> s"CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN ${n - 1} - hx ELSE hx END) ELSE hy END",
        "hx" -> "nx")
    }
  }

  /** The same steps as nested DuckDB subqueries over `inner` (which must
    * expose hx, hy, hd) — `SELECT * REPLACE` for reassignments, plain
    * projection when a working column first appears. */
  private[graft] def hilbertChainSql(inner: String, n: Int): String = {
    val existing = scala.collection.mutable.Set("hx", "hy", "hd")
    hilbertSteps(n, "//").foldLeft(inner) { case (acc, (name, sql)) =>
      if (existing.contains(name))
        s"SELECT * REPLACE (($sql) AS $name) FROM ($acc)"
      else {
        existing += name
        s"SELECT *, ($sql) AS $name FROM ($acc)"
      }
    }
  }

  /** x240's bin count: small files compact into this many target bins.
    * Shared with the DuckDB oracle. */
  val CompactBins: Int = 8

  /** Compaction planning audit (x240): the OPTIMIZE decision's OTHER
    * half — x231 measures what a z-order rewrite buys, this measures
    * what plain small-file compaction costs. The [[ZoneFiles]] files of
    * the insertion layout (stats from the REAL footers, [[FooterStats]])
    * are coalesced in file order into [[CompactBins]] row-balanced bins
    * (bin = exclusive-prefix-rows div target — the deterministic
    * bin-packing a compactor actually runs), and the x222 predicate
    * grid is evaluated against BOTH file sets: per predicate, files
    * read and rows scanned before vs after. Compaction trades footer
    * count (open/list cost, the reason small files hurt) against
    * zone-map precision (bigger files ⇒ wider min/max ⇒ fewer skips);
    * this table prices that trade per predicate instead of asserting a
    * rule of thumb.
    *
    * 100 TB shape: file stats are O(files) metadata; the prefix sum
    * here rides a window over the file list, bounded by the
    * [[ZoneFiles]] constant (at a million files it becomes
    * `Sampling.exclusivePrefixSum` — the same swap x208 made); the
    * grids are broadcast model-state crosses. */
  def compactionPlan(spark: SparkSession, dir: String): DataFrame = {
    val (nf, np) = (ZoneFiles, ZonePredicates)
    val rows = Tables.orders(spark, dir)
      .select(col("o_orderkey").as("k"), col("o_custkey").as("c"))
    val bounds = rows.agg(min(col("k")).as("min_k"), max(col("k")).as("max_k"),
      min(col("c")).as("min_c"), max(col("c")).as("max_c"))
    val files = FooterStats.fileStats(spark, dir).localCheckpoint()
    // bin by exclusive prefix rows: ≤ ZoneFiles rows, a bounded window
    val wf = Window.orderBy(col("f"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val total = files.agg(sum(col("f_rows")).as("total"))
    val binned = files.crossJoin(broadcast(total))
      .withColumn("prefix", coalesce(sum(col("f_rows")).over(wf), lit(0L)))
      .withColumn("target", expr(s"(total + ${CompactBins - 1}) div $CompactBins"))
      .withColumn("bin", expr("prefix div target"))
    val bins = binned.groupBy(col("bin").as("f"))
      .agg(sum(col("f_rows")).as("f_rows"),
        min(col("f_min")).as("f_min"), max(col("f_max")).as("f_max"))
    val preds = spark.range(np.toLong).select(col("id").as("p"))
      .crossJoin(broadcast(bounds))
      .withColumn("lo", expr(s"min_c + (p * (max_c - min_c + 1) + $np - 1) div $np"))
      .withColumn("hi", expr(s"min_c + ((p + 1) * (max_c - min_c + 1) + $np - 1) div $np - 1"))
      .select(col("p"), col("lo"), col("hi"))
    def grid(fs: DataFrame, filesOut: String, rowsOut: String): DataFrame =
      preds.crossJoin(broadcast(fs))
        .withColumn("hit",
          (!(col("f_max") < col("lo") || col("f_min") > col("hi"))).cast("long"))
        .groupBy(col("p"), col("lo"), col("hi"))
        .agg(sum(col("hit")).as(filesOut),
          sum(when(col("hit") === 1L, col("f_rows")).otherwise(0L)).as(rowsOut))
    grid(files, "files_read_small", "rows_scanned_small")
      .join(grid(bins, "files_read_compacted", "rows_scanned_compacted"),
        Seq("p", "lo", "hi"))
      .select(col("p"), col("lo"), col("hi"),
        col("files_read_small"), col("rows_scanned_small"),
        col("files_read_compacted"), col("rows_scanned_compacted"),
        (col("rows_scanned_compacted") - col("rows_scanned_small"))
          .as("extra_rows_cost"))
  }

  /** x223's histogram resolution. Shared with the DuckDB oracle. */
  val CardBuckets: Int = 32

  /** Histogram join-cardinality estimator audit (x223): the CBO
    * arithmetic every planner runs before picking a join strategy,
    * published with its error against ground truth. The hardest planner
    * case is the fact-fact self-equi-join (output Σ_k c(k)² — skew
    * quadratically amplified), here lineitem ⋈ lineitem on l_partkey.
    * Per equi-width key bucket: the histogram inputs (row count, distinct
    * keys), the uniformity-assumption estimate `rows² div ndv`, the
    * exact per-bucket join output Σ c(k)², and the signed error in ppm —
    * where the estimate misses is exactly where in-bucket skew lives
    * (x149's hot keys), which is what a planner's histogram refinement
    * chases. All-integer; the error division is sign-split (x117's
    * negative-div trap).
    *
    * 100 TB shape: one partial-agg'd groupBy to the per-key count table,
    * one more to the [[CardBuckets]]-row histogram — the join itself is
    * never executed; Σ c(k)² folds off the key counts. */
  def joinCardinalityAudit(spark: SparkSession, dir: String): DataFrame = {
    val nb = CardBuckets
    val keyCounts = Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey").as("k")).agg(count(lit(1)).as("c"))
    val bounds = keyCounts.agg(min(col("k")).as("min_k"), max(col("k")).as("max_k"))
    keyCounts.crossJoin(broadcast(bounds))
      .withColumn("b", expr(s"((k - min_k) * $nb) div (max_k - min_k + 1)"))
      .groupBy(col("b"))
      .agg(sum(col("c")).as("n_rows"),
        count(lit(1)).as("ndv"),
        sum(col("c") * col("c")).as("exact_rows"))
      .withColumn("est_rows", expr("(n_rows * n_rows) div ndv"))
      .withColumn("err_ppm",
        when(col("est_rows") >= col("exact_rows"),
          expr("(1000000L * (est_rows - exact_rows)) div exact_rows"))
          .otherwise(-expr("(1000000L * (exact_rows - est_rows)) div exact_rows")))
      .select(col("b"), col("n_rows"), col("ndv"), col("est_rows"),
        col("exact_rows"), col("err_ppm"))
  }

  /** Clamped stock-ledger scan (x229): per part, replay the shipment
    * ledger as a warehouse stock level that CANNOT go negative —
    * returns (`l_returnflag = 'R'`) restock, other shipments draw down,
    * and a draw against empty stock is lost demand, not negative
    * inventory: `s_t = max(0, s_{t−1} + f_t)`. That recurrence is
    * non-associative, so it looks sequential — but with only a lower
    * clamp it has the exact closed form
    * `s_t = S_t − min(0, min_{j≤t} S_j)` (prefix sum minus the running
    * minimum's negative part), which turns the "inherently sequential"
    * fold into two per-key window scans — the scan-parallelization
    * trick every ledger/quota/rate-limiter replay at scale rests on.
    * Closed form ≡ the sequential fold is spec-proven. Published per
    * part: days active, final stock, total clamp loss (demand lost to
    * empty stock), and the peak level (the warehouse-sizing number).
    *
    * 100 TB shape: one scan → per-(part, day) partial-agg'd net flows;
    * both windows partition by the part key (never a global order);
    * output is O(parts). */
  def stockLedger(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.lineitem(spark, dir)
      .select(col("l_partkey").as("part"),
        expr("unix_timestamp(l_shipdate) div 86400").as("day"),
        when(col("l_returnflag") === "R",
          expr("cast(round(l_quantity) as bigint)"))
          .otherwise(-expr("cast(round(l_quantity) as bigint)")).as("q"))
      .groupBy(col("part"), col("day")).agg(sum(col("q")).as("f"))
    val w = Window.partitionBy(col("part")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, 0)
    daily
      .withColumn("s", sum(col("f")).over(w))
      .withColumn("stock", col("s") - least(min(col("s")).over(w), lit(0L)))
      .groupBy(col("part"))
      .agg(count(lit(1)).as("n_days"),
        max_by(col("stock"), col("day")).as("final_stock"),
        (-least(min(col("s")), lit(0L))).as("clamp_loss"),
        max(col("stock")).as("peak_stock"))
  }

  /** x227 knobs — histogram resolution and the audited percentiles.
    * Shared with the DuckDB oracle. */
  val QsBuckets: Int = 64
  val QsPcts: Seq[Int] = Seq(50, 90, 99)

  /** Histogram-sketch quantile audit (x227): the fixed-memory quantile
    * estimate (`approxQuantile`'s role, in a deterministic engine-neutral
    * form: a [[QsBuckets]]-bucket equi-width histogram of order-value
    * cents with in-bucket linear interpolation) next to the EXACT
    * rank-picked quantile and the absolute error in ppm — completing the
    * sketch-audit family (x133 KMV, x193/x199 HLL, x41 count-min) with
    * the quantile member. The exact side never sorts the corpus: the
    * rank pick runs on the per-value count table through
    * [[Sampling.exclusivePrefixSum]] (the x208 discipline — order-value
    * cents are data-proportional, so no bounded-domain window applies).
    *
    * 100 TB shape: one scan → per-value counts (partial-agg'd); the
    * histogram is a [[QsBuckets]]-row rollup of that table; the prefix
    * sum is the recursive scale-safe one; the percentile frame is a
    * 3-row broadcast cross. */
  def quantileSketchAudit(spark: SparkSession, dir: String): DataFrame = {
    val nb = QsBuckets
    val vals = Tables.orders(spark, dir)
      .select(cents(col("o_totalprice")).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // histogram, prefix sum, and totals all read it
    val bounds = vals.agg(min(col("v")).as("min_v"), max(col("v")).as("max_v"),
      sum(col("cnt")).as("n"))
    val hist = vals.crossJoin(broadcast(bounds))
      .withColumn("b", expr(s"((v - min_v) * $nb) div (max_v - min_v + 1)"))
      .groupBy(col("b")).agg(sum(col("cnt")).as("bc"))
      .withColumn("cum", sum(col("bc")).over( // bounded: ≤ QsBuckets rows
        Window.orderBy(col("b")).rowsBetween(Window.unboundedPreceding, 0)))
      .localCheckpoint()
    val offsets = Sampling.exclusivePrefixSum(vals.select(col("v"), col("cnt")))
    val exactCum = vals.select(col("v"), col("cnt"))
      .join(offsets.select(col("key").as("v"), col("offset")), Seq("v"))
      .withColumn("ecum", col("offset") + col("cnt"))
      .localCheckpoint()
    val pcts = spark.range(1L)
      .select(explode(array(QsPcts.map(p => lit(p.toLong)): _*)).as("pct"))
      .crossJoin(broadcast(bounds))
      .withColumn("target", expr("(pct * n + 99) div 100"))
    val est = pcts.join(hist, col("cum") >= col("target"))
      .groupBy(col("pct"), col("target"), col("min_v"), col("max_v"))
      .agg(min(col("b")).as("b"))
      .join(hist, Seq("b"))
      .withColumn("cum_before", col("cum") - col("bc"))
      .withColumn("lo", expr(s"min_v + (b * (max_v - min_v + 1) + $nb - 1) div $nb"))
      .withColumn("hi", expr(s"min_v + ((b + 1) * (max_v - min_v + 1) + $nb - 1) div $nb - 1"))
      .withColumn("est_cents",
        expr("lo + ((target - cum_before - 1) * (hi - lo + 1)) div bc"))
    val exact = pcts.select(col("pct"), col("target"))
      .join(exactCum, col("ecum") >= col("target"))
      .groupBy(col("pct").as("pct_e"), col("target").as("target_e"))
      .agg(min(col("v")).as("exact_cents"))
    est.join(exact, col("pct") === col("pct_e"))
      .withColumn("err_ppm",
        expr("(1000000L * abs(est_cents - exact_cents)) div exact_cents"))
      .select(col("pct"), col("target"), col("est_cents"), col("exact_cents"),
        col("err_ppm"))
  }

  /** Point-in-time dimension join (x253) — what the x138 SCD2 table is
    * FOR: each order joins the ONE tier interval covering its order day
    * (`valid_from ≤ day < valid_to`, open-ended current interval), i.e.
    * "the customer's tier as of end of that day" — the as-of semantics
    * every fact-to-SCD2 enrichment runs. Same-day promotions leave
    * zero-length intervals, which by construction cover no day, so the
    * match is exactly 1:1 (spec-asserted: joined rows = orders rows).
    * Census per tier so the oracle is a stable panel.
    *
    * 100 TB shape: an EQUI join on custkey (the interval table is
    * O(customers × ≤4 episodes), broadcastable or co-partitioned) with
    * the day-range as a residual filter — never an inequality-only
    * join. */
  def pitTierJoin(spark: SparkSession, dir: String): DataFrame = {
    val iv = tierIntervals(spark, dir)
    val o = Tables.orders(spark, dir).select(
      col("o_custkey").as("ck"), col("o_orderkey"),
      expr("unix_timestamp(o_orderdate) div 86400").as("day"))
    o.join(iv, col("ck") === col("o_custkey") &&
        col("day") >= col("valid_from_day") &&
        (col("valid_to_day").isNull || col("day") < col("valid_to_day")))
      .groupBy(col("tier"))
      .agg(count(lit(1)).as("n_orders"),
        countDistinct(col("ck")).as("n_customers"))
  }

  /** x248's anonymity threshold: a quasi-identifier group smaller than
    * this re-identifies its members (the k in k-anonymity). */
  val KAnonThreshold: Int = 10

  /** k-anonymity audit (x248) — the data-governance complement of the
    * x23 PII scrub: rows sharing a QUASI-IDENTIFIER tuple (order
    * priority × status × order week — attributes innocuous alone,
    * identifying in combination) form equivalence classes, and any
    * class smaller than [[KAnonThreshold]] is a re-identification risk
    * a release gate must suppress or generalize. Output is the
    * class-size census (one row per observed class size: how many
    * classes, how many rows, at risk or not) — the anonymity profile a
    * privacy review reads before shipping a training extract.
    *
    * 100 TB shape: two partial-agg'd groupBys — corpus → O(QI classes)
    * → O(distinct sizes). The QI class count is bounded by the
    * attribute domain (priorities × statuses × weeks), not the corpus,
    * and nothing ever sorts or windows the fact table. */
  def kAnonymityAudit(spark: SparkSession, dir: String): DataFrame =
    kAnonymityOf(Tables.orders(spark, dir)
      .select(col("o_orderpriority"), col("o_orderstatus"),
        expr("unix_timestamp(o_orderdate) div 86400 div 7").as("wk")))

  /** Frame-based unit: input = the projected quasi-identifier columns
    * (any number, any names) — exposed so the census is spec-testable
    * on a planted class layout. */
  private[graft] def kAnonymityOf(qi: DataFrame): DataFrame =
    qi.groupBy(qi.columns.map(col).toIndexedSeq: _*)
      .agg(count(lit(1)).as("class_size"))
      .groupBy(col("class_size"))
      .agg(count(lit(1)).as("n_classes"),
        sum(col("class_size")).as("n_rows"))
      .withColumn("at_risk",
        (col("class_size") < KAnonThreshold).cast("long"))

  /** x245's synthetic change-feed knobs, shared with the oracle SQL:
    * keys fold into a [[CdcKeySpace]]-sized space (so every key sees
    * many ops at any scale factor) and an op is a delete when its
    * orderkey ≡ [[CdcDeleteAt]] (mod [[CdcDeleteMod]]) — scattered by
    * the op's own identity, NOT its generation, so the feed's final op
    * per key is a genuine mix of U and D at every scale factor. */
  val CdcKeySpace: Int = 3000
  val CdcDeleteMod: Int = 7
  val CdcDeleteAt: Int = 3

  /** CDC last-wins apply with deletes (x245) — the change-data-feed
    * primitive a lakehouse MERGE consumes (x244's [[graft.pipeline
    * .Maintenance.upsert]] handles upserts; this adds the D op and the
    * sequence ordering): a keyed op stream `(k, seq, op ∈ {U, D},
    * payload)` collapses to final state — per key, the op with the
    * highest `seq` wins; a final D removes the key entirely. The feed
    * is synthesized deterministically from orders (key = orderkey mod
    * [[CdcKeySpace]], seq = orderkey — unique, so last-wins is total;
    * deletes scattered by orderkey mod [[CdcDeleteMod]]), and the
    * output carries per-key op/delete counts so the oracle audits the
    * whole feed, not just survivors.
    *
    * 100 TB shape: ONE partial-agg'd groupBy(k) — `max_by(_, seq)`
    * combines map-side, so the shuffle carries one row per key per
    * task, never the feed. No window, no sort, no self-join; the
    * delete filter runs on the collapsed frame. */
  def cdcApply(spark: SparkSession, dir: String): DataFrame =
    cdcApplyOf(Tables.orders(spark, dir).select(
      (col("o_orderkey") % CdcKeySpace).as("k"),
      col("o_orderkey").as("seq"),
      when(col("o_orderkey") % CdcDeleteMod === CdcDeleteAt, "D")
        .otherwise("U").as("op"),
      cents(col("o_totalprice")).as("cents"),
      col("o_orderpriority").as("prio")))

  /** Frame-based unit: input (k, seq, op, cents, prio) — exposed so the
    * streaming twin's stateful collapse is provable equal to this batch
    * collapse on the SAME feed. */
  private[graft] def cdcApplyOf(feed: DataFrame): DataFrame =
    feed.groupBy(col("k"))
      .agg(
        max_by(col("op"), col("seq")).as("final_op"),
        max_by(col("cents"), col("seq")).as("final_cents"),
        max_by(col("prio"), col("seq")).as("final_prio"),
        count(lit(1)).as("n_ops"),
        sum(when(col("op") === "D", 1L).otherwise(0L)).as("n_deletes"))
      .filter(col("final_op") =!= "D")
      .select(col("k"), col("final_cents"), col("final_prio"),
        col("n_ops"), col("n_deletes"))
}
