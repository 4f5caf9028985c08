package graft.operators

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** REAL parquet footer statistics for the planner family: x222's
  * zone-map audit simulated its file stats with an in-plan groupBy;
  * this stage writes the orders fact as an ACTUAL partitioned parquet
  * layout (one directory per x222 file bucket — the same equi-width
  * o_orderkey rule, so the layout is deterministic) and then reads the
  * per-row-group column min/max/row-count straight out of the written
  * footers with `ParquetFileReader` — the identical metadata a
  * lakehouse scan planner prunes on. The skipping audit thus measures
  * the real storage layer; that the footer-derived stats equal the
  * modeled ones (x235 ≡ x222, same DuckDB oracle) is exactly the claim
  * "parquet footer stats are the zone map" made checkable.
  *
  * 100 TB shape: footers are O(files) metadata, read DISTRIBUTED (the
  * file list parallelizes; each task opens only footers, never data
  * pages) — the same asymmetry scan planning itself exploits. The
  * one-time layout write is a single repartition-by-bucket pass.
  */
object FooterStats {

  private lazy val stageRoot = Files.createTempDirectory("graft_footer_stage_")

  private val staged = scala.collection.mutable.HashMap.empty[(String, String), String]

  /** Write the orders fact once per (snapshot dir, layout) as a parquet
    * layout partitioned by the layout's file bucket; return the root.
    * `insertion` buckets by equi-width o_orderkey ranges (x222's
    * arrival-order model); `zorder` buckets by the Morton tile over
    * (custkey, order-day) (x231's OPTIMIZE ZORDER target, 3 bits/dim =
    * the same [[Relational.ZoneFiles]] file count). */
  private[graft] def layoutRoot(spark: SparkSession, dir: String,
                                layout: String): String =
    synchronized {
      staged.getOrElseUpdate((dir, layout), {
        val nf = Relational.ZoneFiles
        val root = stageRoot.resolve(
          s"zone_${StagePaths.component(dir, layout, nf)}").toString
        val rows = Tables.orders(spark, dir)
          .select(col("o_orderkey").as("k"), col("o_custkey").as("c"),
            expr("unix_timestamp(o_orderdate) div 86400").as("day"))
        val bounds = rows.agg(min(col("k")).as("min_k"), max(col("k")).as("max_k"),
          min(col("c")).as("min_c"), max(col("c")).as("max_c"),
          min(col("day")).as("min_d"), max(col("day")).as("max_d"))
        val tagged = layout match {
          case "insertion" => rows.crossJoin(broadcast(bounds))
            .withColumn("f", expr(s"((k - min_k) * $nf) div (max_k - min_k + 1)"))
          case "zorder" =>
            val bits = 3 // 2^(2·3) = 64 Morton tiles = ZoneFiles files
            val m = 1 << bits
            val interleave = (0 until bits).map(b =>
              s"(((bx >> $b) & 1) << ${2 * b + 1}) + (((by >> $b) & 1) << ${2 * b})")
              .mkString(" + ")
            rows.crossJoin(broadcast(bounds))
              .withColumn("bx", expr(s"((c - min_c) * $m) div (max_c - min_c + 1)"))
              .withColumn("by", expr(s"((day - min_d) * $m) div (max_d - min_d + 1)"))
              .withColumn("f", expr(interleave))
        }
        tagged.select(col("f"), col("k"), col("c"))
          .repartition(nf, col("f")) // ≤ one file per (task, bucket) pair
          .write.mode("overwrite").partitionBy("f").parquet(root)
        root
      })
    }

  /** Per-file-bucket (f, f_rows, f_min, f_max) on column `c`, sourced
    * from the written footers' row-group statistics — never a data
    * read. The DRIVER lists only the partition dirs (`f=<bucket>`,
    * O(buckets) by construction); each executor task then lists ITS
    * buckets' part files and opens their footers — so at a
    * million-file layout both the per-file listing and the footer
    * opens are distributed, and the driver never walks the tree. */
  private[graft] def fileStats(spark: SparkSession, dir: String,
                               layout: String = "insertion"): DataFrame = {
    import spark.implicits._
    val root = layoutRoot(spark, dir, layout)
    val list = Files.list(java.nio.file.Paths.get(root))
    val bucketDirs =
      try list.iterator().asScala
        .filter(p => p.getFileName.toString.startsWith("f=") &&
          Files.isDirectory(p))
        .map(_.toString).toSeq.sorted
      finally list.close()
    require(bucketDirs.nonEmpty,
      s"footer layout $root produced no f=<bucket> partition dirs — " +
        "the staged write failed or the root was cleared externally")
    spark.createDataset(bucketDirs)
      .repartition(math.max(1, math.min(bucketDirs.size, 32)))
      .mapPartitions { dirs =>
        val conf = new Configuration() // local-fs footers; fresh conf per task
        dirs.flatMap { d =>
          val f = new java.io.File(d).getName.stripPrefix("f=").toLong
          val ls = Files.list(java.nio.file.Paths.get(d))
          val parts =
            try ls.iterator().asScala.map(_.toString)
              .filter(n => { val b = n.substring(n.lastIndexOf('/') + 1)
                b.startsWith("part-") && b.endsWith(".parquet") })
              .toSeq.sorted
            finally ls.close()
          parts.map { p =>
            val reader = ParquetFileReader.open(
              HadoopInputFile.fromPath(new Path(s"file:$p"), conf))
            try {
              val blocks = reader.getFooter.getBlocks.asScala
              val stats = blocks.map { b =>
                val cChunk = b.getColumns.asScala
                  .find(_.getPath.toDotString == "c")
                  .getOrElse(sys.error(s"no column chunk 'c' in $p"))
                val pt = cChunk.getPrimitiveType.getPrimitiveTypeName
                require(pt == org.apache.parquet.schema.PrimitiveType
                  .PrimitiveTypeName.INT64,
                  s"column 'c' in $p is $pt, not INT64 — footer min/max " +
                    "cannot be read as Long")
                val st = cChunk.getStatistics
                require(st != null && st.hasNonNullValue,
                  s"row group in $p carries no non-null statistics for 'c' — " +
                    "the layout write should always produce them")
                (b.getRowCount,
                  st.genericGetMin.asInstanceOf[java.lang.Long].longValue(),
                  st.genericGetMax.asInstanceOf[java.lang.Long].longValue())
              }
              (f, stats.map(_._1).sum, stats.map(_._2).min, stats.map(_._3).max)
            } finally reader.close()
          }
        }
      }
      .toDF("f", "f_rows", "f_min", "f_max")
      .groupBy(col("f")) // several part files may share a bucket dir
      .agg(sum(col("f_rows")).as("f_rows"),
        min(col("f_min")).as("f_min"), max(col("f_max")).as("f_max"))
  }

  /** Drop the memoized layouts (tests only). */
  private[graft] def invalidate(): Unit = synchronized { staged.clear() }
}
