package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.Tables

/** Semi-structured (JSON) column processing over `events.props` — the
  * schema-on-read surface a training-data pipeline needs for raw
  * metadata blobs.
  *
  * Two extraction paths, both codegen-friendly and shuffle-free until the
  * final aggregate: `get_json_object` (path expression, schema-less) and
  * `from_json` (declared schema → struct column, the 100 TB-preferred form
  * since the parsed struct prunes to the referenced fields only).
  */
object JsonOps {

  val propsSchema: StructType = StructType(Seq(StructField("k", LongType)))

  /** Path-based extraction + per-type rollup of the extracted metric. */
  def extractAndAggregate(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("k").isNull, 1L).otherwise(0L)).as("null_k"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))

  /** Schema-declared parse → typed struct column (returned row-level so the
    * struct machinery itself is exercised). */
  def parsedProps(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"),
        from_json(col("props"), propsSchema).as("p"))
      .select(col("event_id"), col("p.k").as("k"))
}
