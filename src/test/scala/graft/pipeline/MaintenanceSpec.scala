package graft.pipeline

import graft.SparkSpec

class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  test("upsert replaces matched keys, inserts new keys, keeps the rest") {
    val target = Seq((1, "a", 10), (2, "b", 20), (3, "c", 30)).toDF("k", "name", "v")
    val updates = Seq((2, "b2", 21), (4, "d", 40)).toDF("k", "name", "v")
    val out = Maintenance.upsert(target, updates, Seq("k"))
      .as[(Int, String, Int)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1, "a", 10), (2, "b2", 21), (3, "c", 30), (4, "d", 40)))
  }

  test("upsert on composite keys") {
    val target = Seq((1, "x", 10), (1, "y", 11)).toDF("k1", "k2", "v")
    val updates = Seq((1, "y", 99)).toDF("k1", "k2", "v")
    val out = Maintenance.upsert(target, updates, Seq("k1", "k2"))
      .as[(Int, String, Int)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(out == Seq((1, "x", 10), (1, "y", 99)))
  }

  test("fullSyncClassified labels every key and the non-deleted slice equals the source") {
    val target = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "cents")
    val source = Seq((2L, 20L), (3L, 31L), (4L, 40L)).toDF("k", "cents")
    val out = Maintenance.fullSyncClassified(target, source, Seq("k"), Seq("cents"))
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, "deleted", 10L), (2L, "unchanged", 20L),
      (3L, "updated", 31L), (4L, "inserted", 40L)))
    // applying the sync (drop deleted) reproduces the source exactly
    val synced = out.filter(_._2 != "deleted").map(r => (r._1, r._3)).toSet
    assert(synced == Set((2L, 20L), (3L, 31L), (4L, 40L)))
  }

  test("fullSyncClassified is null-safe: NULL↔value changes classify as updated") {
    val target = Seq((1L, Some(10L)), (2L, None), (3L, None))
      .toDF("k", "cents")
    val source = Seq((1L, None: Option[Long]), (2L, Some(5L)), (3L, None))
      .toDF("k", "cents")
    val out = Maintenance.fullSyncClassified(target, source, Seq("k"), Seq("cents"))
      .as[(Long, String, Option[Long])].collect().sortBy(_._1).toSeq
    // 1: value→NULL is an update (=!= would say 'unchanged' and silently
    //    keep the stale value visible as changed data); 2: NULL→value is
    //    an update; 3: NULL ≡ NULL is unchanged
    assert(out == Seq((1L, "updated", None), (2L, "updated", Some(5L)),
      (3L, "unchanged", None)))
  }

  test("fullSyncAudit (x266): result ≡ source snapshot; every action class nonempty") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val panel = Maintenance.fullSyncAudit(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(panel.keySet == Set("deleted", "inserted", "updated", "unchanged"))
    panel.values.foreach(r => assert(r._2 > 0, r._1))
    // the synced slice reconciles with the deterministic source build
    val o = graft.Tables.orders(spark, sf)
      .select($"o_orderkey".as("k"),
        graft.operators.Relational.cents($"o_totalprice").as("cents"))
      .as[(Long, Long)].collect()
    val srcN = o.count(_._1 % 10 != 7) + o.count(_._1 % 10 == 5)
    assert(panel.filterKeys(_ != "deleted").values.map(_._2).sum == srcN)
    assert(panel("deleted")._2 == o.count(_._1 % 10 == 7))
    assert(panel("inserted")._2 == o.count(_._1 % 10 == 5))
    assert(panel("updated")._2 == o.count(_._1 % 10 == 3))
  }

  test("compacted reduces partition count without changing data") {
    val df = spark.range(1000).repartition(16).toDF("id")
    val c = Maintenance.compacted(df, 2)
    assert(c.rdd.getNumPartitions == 2)
    assert(c.count() == 1000)
  }
}
