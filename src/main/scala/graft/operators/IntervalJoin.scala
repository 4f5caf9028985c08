package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Bucketized interval (range) join — the operator Spark's optimizer has no
  * native strategy for: a bare `f.ts BETWEEN i.start AND i.end` join
  * condition compiles to a broadcast nested-loop / cartesian, the canonical
  * scale-killer. The standard fix, composed from existing ops (SURVEY §7.3
  * tier (a)): overlay a fixed bucket grid on time, explode each interval to
  * the buckets it touches, equi-join facts to intervals on the bucket id,
  * and apply the exact range predicate as the join residual. Cost is
  * ∝ facts + intervals·(avg span/bucket) through a HASH join, and a fact
  * lands in exactly one bucket so no post-join dedup is needed (an
  * interval lists each bucket once).
  */
object IntervalJoin {

  /** facts must carry `ts_s` (epoch seconds); intervals carry
    * `[start_s, end_s)` half-open. Every fact row joins each interval
    * containing its timestamp, via an equi-join on the bucket grid. */
  def joinByBucket(facts: DataFrame, intervals: DataFrame,
                   bucketSeconds: Long = 3600): DataFrame = {
    val fb = facts.withColumn("bucket", expr(s"ts_s div $bucketSeconds"))
    val ib = intervals.withColumn("bucket",
      explode(sequence(expr(s"start_s div $bucketSeconds"),
        expr(s"(end_s - 1) div $bucketSeconds"))))
    fb.join(ib, Seq("bucket"))
      .filter(col("ts_s") >= col("start_s") && col("ts_s") < col("end_s"))
      .drop("bucket")
  }

  /** Query-shaped demo on the events table: purchases that happened inside
    * "click surge" hours (hourly windows with ≥ minClicks click events),
    * aggregated per surge window. The interval side is derived data — the
    * join is fact-stream × computed-windows, the shape of joining events
    * to maintenance windows, campaigns, or rate-limit periods at 100 TB. */
  def purchasesInClickSurges(spark: SparkSession, dir: String,
                             minClicks: Int = 4): DataFrame = {
    val raw = Tables.events(spark, dir)
    val ev = raw.select(col("event_id"), col("event_type"),
      Sessionize.tsSeconds(raw).as("ts_s"),
      Relational.cents(col("value")).as("value_cents"))
    val surges = ev.filter(col("event_type") === "click")
      .groupBy((expr("ts_s div 3600") * 3600).as("start_s"))
      .agg(count(lit(1)).as("n_clicks"))
      .filter(col("n_clicks") >= minClicks)
      .withColumn("end_s", col("start_s") + 3600)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("ts_s"), col("value_cents"))
    joinByBucket(purchases, surges)
      .groupBy(col("start_s"), col("n_clicks"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(col("value_cents")).as("purchase_cents"))
  }
}
