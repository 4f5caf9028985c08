package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The bucketed co-located join (x249): result ≡ the plain parquet
  * join, AND — the point of the layout — with broadcast disabled the
  * join plans with NO shuffle exchange on either side (both inputs
  * already agree on the bucket partitioning at read time). */
class BucketedStageSpec extends SparkSpec {
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  test("bucketedJoin (x249): bucketed ≡ plain parquet join") {
    val got = BucketedStage.bucketedJoin(spark, sf)
      .as[(String, Long, Long)].collect().sortBy(_._1)
    val want = graft.Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_orderpriority")
      .join(graft.Tables.lineitem(spark, sf)
        .select($"l_orderkey", Relational.cents($"l_extendedprice").as("c")),
        $"o_orderkey" === $"l_orderkey")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n"), sum($"c").as("s"))
      .as[(String, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == want.toSeq && got.nonEmpty)
  }

  test("bucketed join plans with NO shuffle exchange (broadcast disabled)") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = BucketedStage.joinOnly(spark, sf)
        .queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      // and the contrast: the same join on plain parquet DOES shuffle
      val plain = graft.Tables.orders(spark, sf).select($"o_orderkey")
        .join(graft.Tables.lineitem(spark, sf).select($"l_orderkey"),
          $"o_orderkey" === $"l_orderkey")
        .queryExecution.executedPlan.toString
      assert(plain.contains("Exchange hashpartitioning"), s"plain join should shuffle:\n$plain")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("groupBy on the bucket key aggregates without a shuffle") {
    val (ot, _) = BucketedStage.bucketedTables(spark, sf)
    val plan = spark.table(ot).groupBy($"o_orderkey")
      .agg(count(lit(1))).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed groupBy must not shuffle:\n$plan")
  }

  test("coalescedJoin (x271): mixed bucket counts ≡ plain parquet join") {
    val got = BucketedStage.coalescedJoin(spark, sf)
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    val want = graft.Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_orderpriority")
      .join(graft.Tables.lineitem(spark, sf)
        .select($"l_orderkey", Relational.cents($"l_extendedprice").as("c")),
        $"o_orderkey" === $"l_orderkey")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n"), sum($"c").as("s"),
        countDistinct($"o_orderkey").as("no"))
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == want.toSeq && got.nonEmpty)
  }

  test("coalesced-bucket join: 16⋈8 buckets, NO shuffle, coalesced scan annotation") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = BucketedStage.coalescedJoinOnly(spark, sf)
        .queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      // the whole point: NEITHER fact shuffles despite the differing
      // bucket counts — the finer (16-bucket) side's read coalesces to 8
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"coalesced-bucket join must not shuffle:\n$plan")
      assert(plan.toLowerCase.contains("coalesced"),
        s"expected the coalesced-bucket scan annotation:\n$plan")
      // the divisible-count contract the rule requires
      assert(BucketedStage.BucketCount % BucketedStage.HalfBucketCount == 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketLookup (x250): IN-list probe prunes buckets and misses nothing") {
    val keys = BucketedStage.LookupKeys
    val got = BucketedStage.bucketLookup(spark, sf)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    val want = graft.Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_orderpriority")
      .filter($"o_orderkey".isin(keys.map(lit(_)): _*))
      .join(graft.Tables.lineitem(spark, sf)
        .select($"l_orderkey", Relational.cents($"l_extendedprice").as("c")),
        $"o_orderkey" === $"l_orderkey")
      .groupBy($"o_orderkey", $"o_orderpriority")
      .agg(count(lit(1)).as("n"), sum($"c").as("s"))
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == want.toSeq && got.nonEmpty)
    // the pruning itself: the scan reads at most |keys| of the buckets
    val plan = BucketedStage.bucketLookup(spark, sf)
      .queryExecution.executedPlan.toString
    val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      .findFirstMatchIn(plan)
    assert(m.isDefined, s"no bucket pruning in plan:\n$plan")
    assert(m.get.group(1).toInt <= keys.size &&
      m.get.group(2).toInt == BucketedStage.BucketCount, s"pruning off: ${m.get}")
  }
}
