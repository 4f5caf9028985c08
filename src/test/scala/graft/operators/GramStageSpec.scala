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

  test("n=2 stage: staged ≡ fresh, and ≡ the word_ngrams kernel explode the bigram family used before") {
    val fresh = GramStage.computeGramOcc(spark, sf, 2)
      .as[(Long, String, String, Long)].collect().toSet
    val staged = GramStage.gramOcc(spark, sf, 2)
      .as[(Long, String, String, Long)].collect().toSet
    assert(staged == fresh && staged.nonEmpty)
    // the consumer contract for x49/x54/x94/x103: the staged table's
    // (doc, bigram, cnt) rows equal the aggregate of the fused-kernel
    // explode those queries ran per-query before staging
    val viaKernel = graft.Tables.documents(spark, sf)
      .select($"doc_id",
        org.apache.spark.sql.functions.explode(
          graft.functions.HashSignatures.word_ngrams($"text", 2)).as("bigram"))
      .groupBy($"doc_id", $"bigram")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("cnt"))
      .as[(Long, String, Long)].collect().toSet
    assert(staged.map(r => (r._1, r._3, r._4)) == viaKernel)
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
