package graft

import org.apache.spark.sql.functions._

class TypedTablesSpec extends SparkSpec {
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  test("typed Dataset round-trips the parquet schema") {
    val ds = TypedTables.lineitem(spark, sf)
    val first = ds.head()
    assert(first.l_orderkey >= 0 && first.l_shipdate != null)
    assert(ds.count() == Tables.lineitem(spark, sf).count())
  }

  test("typed Aggregator matches the untyped cents aggregation exactly") {
    val typed = TypedTables.revenueByFlag(TypedTables.lineitem(spark, sf))
      .collect().map { case (flag, st) => flag -> st.revenueCents }.toMap
    val untyped = Tables.lineitem(spark, sf)
      .groupBy($"l_returnflag")
      .agg(sum(round($"l_extendedprice" * 100).cast("long")).as("cents"))
      .as[(String, Long)].collect().toMap
    assert(typed == untyped)
  }
}
