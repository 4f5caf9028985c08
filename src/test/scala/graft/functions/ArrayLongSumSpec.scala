package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.ArrayLongSum.array_long_sum

class ArrayLongSumSpec extends SparkSpec {
  import spark.implicits._

  test("element-wise sum matches brute force and is merge-invariant across partitionings") {
    val rows = (0 until 500).map(i => (i % 3, Seq.tabulate(16)(d => (i * d).toLong)))
    val df = rows.toDF("g", "arr")
    def run(parts: Int): Map[Int, Seq[Long]] =
      df.repartition(parts).groupBy($"g").agg(array_long_sum($"arr").as("s"))
        .as[(Int, Seq[Long])].collect().toMap
    val a = run(1)
    assert(a == run(16))
    val ref = rows.groupBy(_._1).view.mapValues(
      _.map(_._2).reduce((x, y) => x.zip(y).map(t => t._1 + t._2))).toMap
    assert(a == ref)
  }

  test("partial (map-side) aggregation is in the plan; nulls skipped; empty group yields null") {
    val df = (0 until 100).map(i => (i % 2, Seq(i.toLong, 1L))).toDF("g", "arr")
      .withColumn("arr", when($"g" === 0 || $"arr"(0) % 3 =!= 0, $"arr")) // some null rows
    val plan = df.repartition(8).groupBy($"g").agg(array_long_sum($"arr"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_arraylongsum"), plan)
    val allNull = Seq((1, null.asInstanceOf[Seq[Long]])).toDF("g", "arr")
      .groupBy($"g").agg(array_long_sum($"arr").as("s"))
    assert(allNull.select($"s").head().isNullAt(0))
  }

  test("ragged input widths fail loudly instead of mis-aligning dimensions") {
    val df = Seq(Seq(1L, 2L), Seq(1L, 2L, 3L)).toDF("arr")
    val ex = intercept[Exception] {
      df.agg(array_long_sum($"arr")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("ragged")), ex.toString)
  }

  test("null ELEMENTS fail loudly (toLongArray would silently coerce them to 0)") {
    val df = Seq(Seq[java.lang.Long](1L, null, 3L)).toDF("arr")
    val ex = intercept[Exception] {
      df.agg(array_long_sum($"arr")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("null element")), ex.toString)
  }
}
