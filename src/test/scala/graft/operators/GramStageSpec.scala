package graft.operators

import graft.SparkSpec

/** Staged ≡ recomputed for the persisted word-gram table
  * ([[GramStage]]), plus the consumer contract: the rows ARE the
  * distinct (doc, gram) pairs (x201's set semantics) and the counts
  * fold to the corpus gram frequency (x200's input). */
class GramStageSpec extends SparkSpec {
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  test("gramOcc: staged table equals the fresh explode+aggregate") {
    val fresh = GramStage.computeGramOcc(spark, sf)
      .as[(Long, String, String, Long)].collect().toSet
    val staged = GramStage.gramOcc(spark, sf)
      .as[(Long, String, String, Long)].collect().toSet
    assert(staged == fresh && staged.nonEmpty)
  }

  test("rows are distinct (doc, gram) pairs and counts fold to corpus frequency") {
    val rows = GramStage.gramOcc(spark, sf)
      .as[(Long, String, String, Long)].collect()
    val keys = rows.map(r => (r._1, r._3))
    assert(keys.distinct.length == keys.length)
    // fold ≡ a direct flat count from the raw text
    val n = GramStage.GramN
    val want = graft.Tables.documents(spark, sf)
      .select($"text").as[String].collect()
      .flatMap(t => t.split(" ", -1).sliding(n).filter(_.length == n)
        .map(_.mkString(" ")))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val folded = rows.groupBy(_._3).view.mapValues(_.map(_._4).sum).toMap
    assert(folded == want)
  }
}
