package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Dense global row numbering at scale (x268): `row_number() OVER
  * (ORDER BY …)` with no partition spec moves the ENTIRE dataset to one
  * task — the classic 100 TB cliff (Spark itself warns "No Partition
  * Defined for Window operation"). The scale-safe plan is the one
  * every distributed sort-export uses:
  *
  *   1. `repartitionByRange` on the total order (the same range
  *      exchange a global ORDER BY plans) + `sortWithinPartitions`;
  *   2. ONE materialization of that frame (`localCheckpoint` — the
  *      boundary sampling must not re-run between the two consumers);
  *   3. an O(partitions) per-partition count collected to the driver,
  *      folded into prefix offsets (a scalar the size of the cluster,
  *      not the data);
  *   4. `row_number()` PARTITIONED by the range-partition id — every
  *      partition numbers itself in parallel — plus the broadcast
  *      offset.
  *
  * The result is bit-identical to the single-partition window (the
  * spec and the DuckDB oracle both say so) with max parallelism
  * `numPartitions` instead of 1. This is the missing half of x208
  * (range boundaries): x208 plans the split points, this executes the
  * numbering.
  */
object GlobalSort {

  /** `df` extended with `global_rank` = 1-based dense position under
    * `order` (which must be a TOTAL order for determinism). */
  def denseGlobalRank(df: DataFrame, order: Seq[Column],
                      numPartitions: Int): DataFrame = {
    require(order.nonEmpty && numPartitions >= 1, "need an order and partitions")
    val parted = df
      .repartitionByRange(numPartitions, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint() // pin the sampled range boundaries: the count
      //                    pass and the output pass MUST see one layout
    val spark = parted.sparkSession
    import spark.implicits._
    val counts = parted.groupBy(col("_pid")).agg(count(lit(1)).as("n"))
      .as[(Int, Long)].collect().sortBy(_._1)
    val offsets = counts.scanLeft((0, 0L)) { case ((_, acc), (pid, n)) =>
      (pid, acc + n)
    }.tail.zip(counts).map { case ((pid, cum), (_, n)) => (pid, cum - n) }
    val offDf = broadcast(offsets.toSeq.toDF("_pid", "_off"))
    parted.join(offDf, Seq("_pid"))
      .withColumn("global_rank",
        row_number().over(Window.partitionBy(col("_pid")).orderBy(order: _*))
          .cast("long") + col("_off"))
      .drop("_pid", "_off")
  }

  /** The x268 gate query: the documents corpus totally ordered by
    * (n_chars desc, doc_id) with its dense global rank — the sorted
    * export a curriculum/packing stage writes. */
  def rankedDocuments(spark: SparkSession, dir: String,
                      numPartitions: Int = 32): DataFrame =
    denseGlobalRank(
      Tables.documents(spark, dir).select(col("doc_id"), col("n_chars")),
      Seq(col("n_chars").desc, col("doc_id")), numPartitions)
      .select(col("doc_id"), col("n_chars"), col("global_rank"))
}
