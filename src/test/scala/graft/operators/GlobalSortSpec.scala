package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** x268: dense global row numbering via range partitions + offsets. */
class GlobalSortSpec extends SparkSpec {
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  test("denseGlobalRank ≡ the single-partition window, at several partition counts") {
    val docs = graft.Tables.documents(spark, sf).select($"doc_id", $"n_chars")
    val want = docs
      .withColumn("global_rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy($"n_chars".desc, $"doc_id")).cast("long"))
      .as[(Long, Long, Long)].collect().toSet
    for (np <- Seq(1, 3, 32)) {
      val got = GlobalSort.denseGlobalRank(docs,
          Seq($"n_chars".desc, $"doc_id"), np)
        .as[(Long, Long, Long)].collect().toSet
      assert(got == want, s"numPartitions=$np")
    }
    // ranks are a dense permutation of 1..N
    val n = docs.count()
    assert(want.map(_._3) == (1L to n).toSet)
  }

  test("the plan carries NO single-partition window (every window keyed by _pid)") {
    // string inspection: the AQE wrapper hides nodes from collect()
    val plan = GlobalSort.rankedDocuments(spark, sf)
      .queryExecution.executedPlan.toString
    val windowLines = plan.linesIterator
      .filter(_.contains("windowspecdefinition(")).toSeq
    assert(windowLines.nonEmpty, "expected the per-partition numbering window")
    windowLines.foreach { l =>
      assert(l.contains("windowspecdefinition(_pid"),
        s"single-partition window (the scale cliff this operator avoids): $l")
    }
  }
}
