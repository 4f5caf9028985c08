package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Event-stream batch analytics over `events` (event_id, ts, user_id,
  * event_type, value, props) — the batch twins of the Structured Streaming
  * operators in `graft.streaming`.
  *
  * Timestamps are normalized to whole epoch seconds (bigint) at the scan so
  * all downstream arithmetic is exact integer math, identical cross-engine
  * regardless of the parquet nano/micro unit.
  */
object Sessionize {

  /** Whole-second epoch from the events `ts` column, handling both read
    * paths: TimestampType, or LongType nanos when the session sets
    * `spark.sql.legacy.parquet.nanosAsLong=true` (Spark 4 cannot read
    * parquet TIMESTAMP(NANOS) natively). Integer `div` keeps it exact. */
  private[graft] def tsSeconds(df: DataFrame): org.apache.spark.sql.Column =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000000000")
      case _                                   => unix_timestamp(col("ts"))
    }

  /** Gap-based sessionization (30-min inactivity): classic lag + cumulative
    * boundary-sum, one shuffle on user_id reused by both window passes and
    * the final aggregate (same partitioning key → single exchange). */
  def sessions(spark: SparkSession, dir: String, gapSeconds: Long = 1800): DataFrame = {
    val raw = Tables.events(spark, dir)
    val ev = raw
      .select(col("event_id"), col("user_id"), col("event_type"),
        tsSeconds(raw).as("ts_s"),
        Relational.cents(col("value")).as("value_cents"))
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_s"), col("event_id"))
    ev
      .withColumn("new_session",
        when(col("ts_s") - lag(col("ts_s"), 1).over(byUser) > gapSeconds, 1)
          .when(lag(col("ts_s"), 1).over(byUser).isNull, 1)
          .otherwise(0))
      .withColumn("session_idx",
        sum(col("new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts_s")).as("session_start_s"),
        max(col("ts_s")).as("session_end_s"),
        sum(col("value_cents")).as("sum_value_cents"),
        countDistinct(col("event_type")).as("n_event_types"))
      .withColumn("duration_s", col("session_end_s") - col("session_start_s"))
  }

  /** Built-in `session_window` (30-min gap) — the declarative twin of
    * `sessions`: an event merges into the current session iff its gap from
    * the previous event is ≤ the gap duration (a gap of EXACTLY 1800 s
    * still merges — verified empirically at sf0.1, where one such pair
    * exists; same `> gap` break rule as `sessions`). */
  def sessionWindows(spark: SparkSession, dir: String, gap: String = "30 minutes"): DataFrame = {
    val raw = Tables.events(spark, dir)
    raw
      .withColumn("ts_t", timestamp_seconds(tsSeconds(raw)))
      .groupBy(session_window(col("ts_t"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(Relational.cents(col("value"))).as("sum_value_cents"))
      .select(col("user_id"),
        unix_timestamp(col("session_window.start")).as("session_start_s"),
        col("n_events"), col("sum_value_cents"))
  }

  /** Sliding 1-hour/15-min windows — batch `window(ts, "1 hour", "15 min")`:
    * every event lands in 4 overlapping windows; emits window starts as
    * epoch seconds. The built-in generates the same (start, event) pairs as
    * exploding the 4 slide offsets, which is what the DuckDB oracle does. */
  def slidingWindows(spark: SparkSession, dir: String): DataFrame = {
    val raw = Tables.events(spark, dir)
    raw
      .withColumn("ts_t", timestamp_seconds(tsSeconds(raw)))
      .groupBy(window(col("ts_t"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(Relational.cents(col("value"))).as("sum_value_cents"))
      .select(unix_timestamp(col("window.start")).as("window_start_s"),
        col("event_type"), col("n_events"), col("sum_value_cents"))
  }

  /** Tumbling 1-hour window aggregate — batch equivalent of
    * `groupBy(window($"ts", "1 hour"))`; emits the window start as epoch
    * seconds so the comparison is engine-neutral. */
  def hourlyWindows(spark: SparkSession, dir: String): DataFrame = {
    val raw = Tables.events(spark, dir)
    raw
      .groupBy(
        (floor(tsSeconds(raw) / 3600) * 3600).cast("long").as("window_start_s"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(Relational.cents(col("value"))).as("sum_value_cents"),
        countDistinct(col("user_id")).as("n_users"))
  }
}
