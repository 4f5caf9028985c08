package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Schema evolution on a plain parquet table (x252) — the lakehouse
  * behavior a long-lived ingest dir inevitably needs: early batches
  * wrote `(k, cents)`, a later producer added `prio`, and every reader
  * must see ONE unified schema with nulls where the old files have no
  * column. Spark's `mergeSchema` read does exactly that (schema union
  * across file footers); the staged dir here is written in two
  * generations (even keys old-schema, odd keys new-schema) and the gate
  * query aggregates the merged read — the oracle replays the
  * generation rule straight from orders, so a hash match proves the
  * merged read lost no rows, no values, and no nulls.
  *
  * 100 TB shape: `mergeSchema` costs one footer read per file at plan
  * time (the same footers the scan opens anyway); the data path is
  * unchanged. Production tables pin the merged schema in a catalog
  * instead of re-inferring per query — the read semantics audited here
  * are identical. */
object SchemaStage {

  private val memo = scala.collection.mutable.HashMap.empty[String, String]

  private lazy val stageTmp =
    java.nio.file.Files.createTempDirectory("graft_schema_")

  /** Write (once per JVM per snapshot) the two-generation dir: even
    * orderkeys as `(k, cents)`, odd as `(k, cents, prio)`. */
  private[graft] def evolvedDir(spark: SparkSession, dir: String): String =
    synchronized {
      memo.getOrElseUpdate(dir, {
        val p = s"$stageTmp/orders_${StagePaths.component("evolved", dir)}"
        val o = Tables.orders(spark, dir).select(
          col("o_orderkey").as("k"),
          Relational.cents(col("o_totalprice")).as("cents"),
          col("o_orderpriority").as("prio"))
        // overwrite: a retry after a failure between the two generation
        // writes must rebuild cleanly, not die on "path already exists"
        o.filter(col("k") % 2 === 0).select(col("k"), col("cents"))
          .write.mode("overwrite").parquet(p)
        o.filter(col("k") % 2 === 1)
          .write.mode("append").parquet(p)
        p
      })
    }

  /** The merged-schema read, folded per (evolved) priority — old-schema
    * rows surface as the `<pre-evolution>` bucket. */
  def schemaEvolutionRead(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(evolvedDir(spark, dir))
      .groupBy(coalesce(col("prio"), lit("<pre-evolution>")).as("prio"))
      .agg(count(lit(1)).as("n_rows"), sum(col("cents")).as("sum_cents"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
}
