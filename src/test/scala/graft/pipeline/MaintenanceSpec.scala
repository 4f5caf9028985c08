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

  test("compacted reduces partition count without changing data") {
    val df = spark.range(1000).repartition(16).toDF("id")
    val c = Maintenance.compacted(df, 2)
    assert(c.rdd.getNumPartitions == 2)
    assert(c.count() == 1000)
  }
}
