package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Bucketed (hash-clustered) table layouts — Spark's co-located-join
  * storage technique and the one the 100 TB deployment leans on for
  * every repeated fact⋈fact join: both sides written `bucketBy(N, key)`
  * agree on partitioning at READ time, so the join plans with NO
  * shuffle exchange on either side (asserted in BucketedStageSpec with
  * broadcast disabled; at gate scale Catalyst may still pick broadcast,
  * which is also exchange-free on the big side). The bucket files are
  * the staged artifact; the gate query (x249) aggregates the bucketed
  * join and its oracle replays the plain parquet join — a hash match
  * proves the clustered layout changed no answers.
  *
  * 100 TB shape: the one-time bucketed write is the only shuffle the
  * join family ever pays again — every subsequent orderkey-equi-join
  * reads co-located buckets (16 here; thousands in production, sized so
  * a bucket fits an executor). `sortBy` inside buckets additionally
  * lets the SMJ skip its sort when each bucket holds one file. */
object BucketedStage {

  /** Bucket count, shared with the spec's plan assertions. */
  val BucketCount: Int = 16

  private val memo = scala.collection.mutable.HashMap.empty[String, (String, String)]

  private lazy val stageTmp =
    java.nio.file.Files.createTempDirectory("graft_bucketed_")

  /** Write (once per JVM per snapshot dir) orders and lineitem
    * projections as external bucketed tables; returns the catalog
    * names. One file per bucket (`repartition` on the bucket key before
    * write) so the in-bucket `sortBy` order is total and the SMJ can
    * skip sorting.
    *
    * Compaction exemption: an overwrite snapshot whose file count is
    * pinned at ≤ [[BucketCount]] per table by the pre-write
    * `repartition(BucketCount, key)` (one task per bucket → one file
    * per bucket; Spark would REJECT a multi-file bucket's sort
    * metadata anyway). Listing is O(BucketCount) forever, so there is
    * nothing for `IngestCommit.compactStageRoot` to bound — and
    * compacting a bucketed layout through the generic ledger would
    * DESTROY the bucket↔file mapping the shuffle-free join depends on
    * (invariant spec-asserted in StageLayoutSpec). */
  private[graft] def bucketedTables(spark: SparkSession, dir: String): (String, String) =
    synchronized {
      memo.getOrElseUpdate(dir, {
        val id = StagePaths.component("bucketed", dir, BucketCount)
        val (ot, lt) = (s"graft_bkt_orders_$id", s"graft_bkt_lineitem_$id")
        Tables.orders(spark, dir)
          .select(col("o_orderkey"), col("o_orderpriority"))
          .repartition(BucketCount, col("o_orderkey"))
          .write.bucketBy(BucketCount, "o_orderkey").sortBy("o_orderkey")
          .option("path", s"$stageTmp/orders_$id")
          .mode("overwrite").saveAsTable(ot)
        stageLineitem(spark, dir, BucketCount, lt, s"$stageTmp/lineitem_$id")
        (ot, lt)
      })
    }

  /** The ONE lineitem staging recipe (projection + cents + bucketed
    * write), parameterized by bucket count — x249's 16-bucket layout
    * and x271's 8-bucket layout must stay shape-identical or the two
    * gate queries silently read differently-shaped staged tables. */
  private def stageLineitem(spark: SparkSession, dir: String,
                            buckets: Int, table: String, path: String): Unit =
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"),
        Relational.cents(col("l_extendedprice")).as("l_cents"))
      .repartition(buckets, col("l_orderkey"))
      .write.bucketBy(buckets, "l_orderkey").sortBy("l_orderkey")
      .option("path", path)
      .mode("overwrite").saveAsTable(table)

  /** The bucketed fact⋈fact join (x249): revenue per order priority off
    * the clustered layouts — the oracle replays it on the plain parquet
    * tables. */
  def bucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    val (ot, lt) = bucketedTables(spark, dir)
    spark.table(ot)
      .join(spark.table(lt), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"), sum(col("l_cents")).as("rev_cents"))
  }

  /** The join-only frame (no aggregate) — what the spec plan-asserts. */
  private[graft] def joinOnly(spark: SparkSession, dir: String): DataFrame = {
    val (ot, lt) = bucketedTables(spark, dir)
    spark.table(ot).join(spark.table(lt), col("o_orderkey") === col("l_orderkey"))
  }

  /** Bucket count of the SECOND lineitem layout (x271) — deliberately
    * half of [[BucketCount]] so the two fact tables' bucket counts
    * DIFFER and the join can only stay shuffle-free through Spark's
    * coalesced-bucket read. */
  val HalfBucketCount: Int = 8

  private val memoHalf = scala.collection.mutable.HashMap.empty[String, String]

  /** The 8-bucket lineitem layout for the mixed-bucket-count join. Same
    * overwrite-snapshot compaction exemption as [[bucketedTables]]:
    * ≤ [[HalfBucketCount]] files, pinned by the pre-write repartition. */
  private[graft] def bucketedLineitemHalf(spark: SparkSession, dir: String): String =
    synchronized {
      memoHalf.getOrElseUpdate(dir, {
        val id = StagePaths.component("bucketed_half", dir, HalfBucketCount)
        val lt = s"graft_bkt_li_half_$id"
        stageLineitem(spark, dir, HalfBucketCount, lt,
          s"$stageTmp/lineitem_half_$id")
        lt
      })
    }

  /** Coalescing-bucket SMB join (x271): the 16-bucket orders table
    * joined to the 8-BUCKET lineitem table. In a real warehouse, fact
    * tables get bucketed at different times with different counts
    * (history at 1024, a newer feed at 256); re-bucketing 100 TB to
    * reconcile them is exactly the shuffle bucketing exists to avoid.
    * With `spark.sql.bucketing.coalesceBucketsInJoin.enabled` (set in
    * the engine's session builders), Spark COALESCES the finer side's
    * read — each of the 8 coarse buckets reads its 2 sibling files from
    * the 16-bucket layout — so NEITHER side shuffles; the coarser side's
    * in-bucket sort survives and only the coalesced side re-sorts
    * in-partition. The spec asserts all three plan facts (zero
    * exchanges, the `coalesced` scan annotation, the divisible-count
    * contract); the oracle replays the join on the plain tables.
    *
    * 100 TB shape: join cost is O(bucket pair) per task with no
    * redistribution of either fact; the alternative plans either
    * shuffle the 100 TB finer table or rewrite it at 8 buckets. */
  def coalescedJoin(spark: SparkSession, dir: String): DataFrame = {
    val (ot, _) = bucketedTables(spark, dir)
    val lt = bucketedLineitemHalf(spark, dir)
    spark.table(ot)
      .join(spark.table(lt), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"), sum(col("l_cents")).as("rev_cents"),
        countDistinct(col("o_orderkey")).as("n_orders"))
  }

  /** The join-only frame of [[coalescedJoin]] — what the spec
    * plan-asserts. */
  private[graft] def coalescedJoinOnly(spark: SparkSession, dir: String): DataFrame = {
    val (ot, _) = bucketedTables(spark, dir)
    spark.table(ot).join(spark.table(bucketedLineitemHalf(spark, dir)),
      col("o_orderkey") === col("l_orderkey"))
  }

  /** x250's literal probe keys (the testdata's orderkeys are dense from
    * 0, so these exist at every scale factor). Shared with the oracle. */
  val LookupKeys: Seq[Long] = 0L until 8L

  /** Bucket-pruned point lookup (x250): an IN-list probe on the bucket
    * key reads ONLY the buckets the keys hash to — `SelectedBucketsCount
    * ≤ |keys| out of `[[BucketCount]]` in the scan (plan-asserted in the
    * spec; the oracle proves the pruned read misses nothing). This is
    * the O(1)-files point-lookup a clustered layout buys: at 100 TB the
    * probe opens |keys| buckets' files, never the table.
    */
  def bucketLookup(spark: SparkSession, dir: String): DataFrame = {
    val (ot, lt) = bucketedTables(spark, dir)
    val keys = LookupKeys.map(lit(_))
    spark.table(ot).filter(col("o_orderkey").isin(keys: _*))
      .join(spark.table(lt).filter(col("l_orderkey").isin(keys: _*)),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"), sum(col("l_cents")).as("rev_cents"))
  }
}
