package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Multi-format sink→source fidelity audit (x259): the events fact is
  * staged once per snapshot into each interchange format the engine
  * ships (parquet, ORC, JSON-lines, CSV-with-header), read back through
  * the ordinary `spark.read` source for that format with an explicit
  * schema, and rolled up to an identical per-event-type panel tagged
  * with the format name. Equality of the four panels (the DuckDB oracle
  * recomputes the panel once from the raw table and cross-joins the
  * format list) is the end-to-end claim that every sink/source pair
  * round-trips values exactly — the audit a pipeline runs before
  * letting a second format into its interchange layer. The reference's
  * ingestion layer is exactly such a CSV→columnar boundary
  * (notebooks/bronze_ingestion.py.py:12-33); this panel generalizes that
  * boundary check to every format pair the engine supports.
  *
  * The staged projection is deliberately exact-typed (BIGINT keys,
  * integer cents, whole-second epochs, strings) so the text formats are
  * lossless: floats/timestamps would round-trip through JSON/CSV via
  * locale- and precision-sensitive rendering, which is a FORMAT
  * limitation the audit would then be measuring instead of the engine's
  * plumbing. The cents/epoch normalization at the boundary is the same
  * convention the whole oracle surface uses.
  *
  * 100 TB shape: one repartition-free pass per format for the staged
  * write, one scan + map-side-combined rollup per read-back — O(formats)
  * linear passes, no shuffle beyond the O(event_types) aggregate. A
  * production deployment audits a hash-bucketed sample instead of the
  * full fact; the shape is identical.
  */
object FormatStage {

  val Formats: Seq[String] = Seq("parquet", "orc", "json", "csv")

  private lazy val stageRoot = Files.createTempDirectory("graft_format_stage_")

  private val staged = scala.collection.mutable.HashMap.empty[String, String]

  private val stagedSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("ts_s", LongType),
    StructField("value_cents", LongType)))

  /** Write the canonical events projection once per snapshot dir into
    * one subdirectory per format; return the root. */
  private[graft] def layoutRoot(spark: SparkSession, dir: String): String =
    synchronized {
      staged.getOrElseUpdate(dir, {
        val root = stageRoot.resolve(
          s"fmt_${StagePaths.component(dir, Formats.mkString(","))}").toString
        val raw = Tables.events(spark, dir)
        val canonical = raw.select(
          col("event_id"), col("user_id"), col("event_type"),
          Sessionize.tsSeconds(raw).as("ts_s"),
          Relational.cents(col("value")).as("value_cents"))
        Formats.foreach { f =>
          val w = canonical.write.mode("overwrite").format(f)
          (if (f == "csv") w.option("header", "true") else w)
            .save(s"$root/$f")
        }
        root
      })
    }

  /** The x259 gate query: per (format, event_type), the read-back
    * panel — row count, value mass, user reach, time span — for each
    * staged format. All four format slices must be identical. */
  def roundTrip(spark: SparkSession, dir: String): DataFrame = {
    val root = layoutRoot(spark, dir)
    Formats.map { f =>
      val r = spark.read.format(f).schema(stagedSchema)
      (if (f == "csv") r.option("header", "true") else r)
        .load(s"$root/$f")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value_cents")).as("sum_value_cents"),
          countDistinct(col("user_id")).as("n_users"),
          min(col("ts_s")).as("min_ts_s"), max(col("ts_s")).as("max_ts_s"))
        .withColumn("format", lit(f))
    }.reduce(_.unionByName(_))
      .select(col("format"), col("event_type"), col("n_events"),
        col("sum_value_cents"), col("n_users"), col("min_ts_s"),
        col("max_ts_s"))
  }

  /** Drop the memoized layouts (tests only). */
  private[graft] def invalidate(): Unit = synchronized { staged.clear() }
}
