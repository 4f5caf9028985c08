package graft.operators

import graft.SparkSpec

class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketized interval join: half-open boundaries, multi-bucket spans, overlaps") {
    val facts = Seq(0L, 899L, 900L, 1800L, 3599L, 3600L).toDF("ts_s")
    val intervals = Seq((900L, 3600L, "a"), (1500L, 2000L, "b"))
      .toDF("start_s", "end_s", "tag")
    val got = IntervalJoin.joinByBucket(facts, intervals, bucketSeconds = 1000)
      .select($"ts_s", $"tag").as[(Long, String)].collect().toSet
    // [900,3600) catches 900, 1800, 3599 (start inclusive, end exclusive);
    // overlapping [1500,2000) additionally catches 1800
    assert(got == Set((900L, "a"), (1800L, "a"), (3599L, "a"), (1800L, "b")))
  }

  test("bucketized join equals the naive theta join on real events, via a hash join") {
    val sf = "/root/testdata/sf0.001"
    val q = IntervalJoin.purchasesInClickSurges(spark, sf, minClicks = 2)
    val rows = q.as[(Long, Long, Long, Long)].collect().toSet
    assert(rows.nonEmpty)
    val planStr = q.queryExecution.executedPlan.toString
    assert(!planStr.contains("BroadcastNestedLoopJoin") && !planStr.contains("CartesianProduct"),
      s"interval join must stay an equi-join on the bucket grid:\n$planStr")
    // naive theta-join reference (fine at test scale, the shape the
    // bucketized operator exists to avoid)
    val raw = graft.Tables.events(spark, sf)
    val ev = raw.select($"event_id", $"event_type",
      Sessionize.tsSeconds(raw).as("ts_s"), Relational.cents($"value").as("value_cents"))
    val surges = ev.filter($"event_type" === "click")
      .groupBy((org.apache.spark.sql.functions.expr("ts_s div 3600") * 3600).as("start_s"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n_clicks"))
      .filter($"n_clicks" >= 2)
    val naive = ev.filter($"event_type" === "purchase")
      .join(surges, $"ts_s" >= $"start_s" && $"ts_s" < $"start_s" + 3600)
      .groupBy($"start_s", $"n_clicks")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n_purchases"),
        org.apache.spark.sql.functions.sum($"value_cents").as("purchase_cents"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(rows == naive)
  }
}
