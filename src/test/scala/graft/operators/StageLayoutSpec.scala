package graft.operators

import java.io.File

import org.apache.spark.sql.catalyst.TableIdentifier

import graft.SparkSpec

/** The compaction-exemption invariants for the three overwrite-snapshot
  * stages (r14 verdict task 5): `IngestCommit.compactStageRoot` bounds
  * roots that GROW with every append; these stages instead guarantee a
  * construction-time file-count bound, re-established atomically on every
  * overwrite, so their listing cost never grows and the ledger protocol
  * would add bookkeeping without removing a single list call. Each test
  * asserts the specific bound the stage's Scaladoc claims — if a future
  * edit drops the pre-write `repartition`, the bound (and the exemption)
  * breaks loudly here.
  */
class StageLayoutSpec extends SparkSpec {

  val sf = "/root/testdata/sf0.001"

  private def dataFiles(dir: File): Seq[File] = {
    val fs = Option(dir.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
    fs.filter(f => f.isFile && f.getName.endsWith(".parquet"))
  }

  test("GramStage root: one overwrite snapshot, ≤ shuffle-partitions files") {
    val shufflePartitions = spark.conf.get("spark.sql.shuffle.partitions").toInt
    for (n <- Seq(2, GramStage.GramN)) {
      GramStage.gramOcc(spark, sf, n).count() // force the stage write
      val root = new File(GramStage.rootFor(spark, sf, n))
      val files = dataFiles(root)
      assert(files.nonEmpty, s"no data files under $root")
      assert(files.size <= shufflePartitions,
        s"n=$n stage wrote ${files.size} files > $shufflePartitions — " +
          "the groupBy no longer bounds the write fan-out")
      // overwrite-snapshot, not append: no ledger/commit files to list
      assert(!root.listFiles().exists(_.getName.startsWith("commit")),
        "snapshot root must not carry ledger commit markers")
    }
  }

  test("PartitionedStage layout: exactly one data file per day directory") {
    val root = new File(PartitionedStage.layoutRoot(spark, sf))
    val dayDirs = Option(root.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("day="))
    assert(dayDirs.size > 10, s"layout produced only ${dayDirs.size} day dirs")
    dayDirs.foreach { d =>
      val files = dataFiles(d)
      assert(files.size == 1,
        s"${d.getName} holds ${files.size} data files, want exactly 1 — " +
          "the pre-write repartition(day) no longer routes a day to one task")
    }
  }

  test("BucketedStage tables: ≤ BucketCount data files each, 1 per bucket") {
    val (ot, lt) = BucketedStage.bucketedTables(spark, sf)
    for (t <- Seq(ot, lt)) {
      val loc = spark.sessionState.catalog
        .getTableMetadata(TableIdentifier(t)).location
      val files = dataFiles(new File(loc))
      assert(files.nonEmpty, s"no data files under $loc")
      assert(files.size <= BucketedStage.BucketCount,
        s"$t wrote ${files.size} files > ${BucketedStage.BucketCount}")
      // 1 file per bucket: the _00000-style bucket suffix before .c000
      // must be unique across the table's data files, or the sorted-
      // bucket metadata the shuffle-free SMJ relies on is a lie
      val bucketIds = files.map { f =>
        val m = "_(\\d{5})\\.c\\d+".r.findFirstMatchIn(f.getName)
        assert(m.nonEmpty, s"unexpected bucketed file name ${f.getName}")
        m.get.group(1)
      }
      assert(bucketIds.distinct.size == bucketIds.size,
        s"$t has a bucket split across files: ${files.map(_.getName)}")
    }
  }
}
