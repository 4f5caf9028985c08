package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** x263: docs↔embeddings coverage panel. */
class EmbeddingCoverageSpec extends SparkSpec {
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  test("panel rows reconcile against driver-side set arithmetic") {
    val docIds = graft.Tables.documents(spark, sf)
      .select($"doc_id", $"source").as[(Long, String)].collect()
    val vecIds = graft.Tables.embeddings(spark, sf)
      .select($"vec_id").as[Long].collect().toSet
    val got = Similarity.embeddingCoverage(spark, sf)
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val bySource = docIds.groupBy(_._2)
    assert(got.size == bySource.size + 2)
    bySource.foreach { case (src, rows) =>
      val missing = rows.count(r => !vecIds.contains(r._1)).toLong
      assert(got(s"doc_no_embedding:$src") == ((rows.length.toLong, missing)), src)
    }
    val docSet = docIds.map(_._1).toSet
    assert(got("doc_no_embedding") ==
      ((docIds.length.toLong, docIds.count(r => !vecIds.contains(r._1)).toLong)))
    assert(got("embedding_no_doc") ==
      ((vecIds.size.toLong, vecIds.count(v => !docSet.contains(v)).toLong)))
    // orphan counts reconcile: global == Σ per-source
    val perSourceSum = bySource.keys.map(s => got(s"doc_no_embedding:$s")._2).sum
    assert(got("doc_no_embedding")._2 == perSourceSum)
  }
}
