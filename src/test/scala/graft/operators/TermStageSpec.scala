package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Staged ≡ recomputed for the persisted term-frequency tables
  * ([[TermStage]]), and incremental append ≡ full recompute (the
  * band-index contract: a corpus staged in two batches must read
  * identically to the same corpus staged at once). */
class TermStageSpec extends SparkSpec {
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  private def freshDocTf(): Map[(Long, String), Long] =
    graft.Tables.documents(spark, sf)
      .select($"doc_id", explode(split($"text", " ")).as("term"))
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
      .as[(Long, String, Long)].collect()
      .map { case (d, t, f) => (d, t) -> f }.toMap

  test("docTermFreq: staged table equals the fresh explode aggregate") {
    val got = TermStage.docTermFreq(spark, sf)
      .as[(Long, String, Long)].collect()
      .map { case (d, t, f) => (d, t) -> f }.toMap
    assert(got == freshDocTf() && got.nonEmpty)
  }

  test("termStats: reader fold equals the fresh corpus rollup") {
    val fresh = freshDocTf().toSeq
      .groupBy(_._1._2).view.mapValues { rs =>
        (rs.map(_._2).sum, rs.size.toLong)
      }.toMap
    val got = TermStage.termStats(spark, sf)
      .as[(String, Long, Long)].collect()
      .map { case (t, tf, df) => t -> (tf, df) }.toMap
    assert(got == fresh && got.nonEmpty)
  }

  test("docLengths: staged lengths equal the whitespace token count") {
    val fresh = freshDocTf().toSeq
      .groupBy(_._1._1).view.mapValues(_.map(_._2).sum).toMap
    val got = TermStage.docLengths(spark, sf)
      .as[(Long, Long)].collect().toMap
    assert(got == fresh && got.nonEmpty)
  }

  test("incremental append: two-batch staging reads identically to one-shot staging") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_term_inc_").toString
    val docs = graft.Tables.documents(spark, sf)
      .select($"doc_id", $"text").localCheckpoint()
    val cut = Dedup.IncrementalNewMinId
    TermStage.writeTermTables(docs.filter($"doc_id" < cut), root)
    TermStage.appendToTermTables(spark, docs.filter($"doc_id" >= cut), root)
    // read through the same fold the staged readers use
    val dtf = spark.read.parquet(s"$root/doc_tf")
      .as[(Long, String, Long)].collect()
      .map { case (d, t, f) => (d, t) -> f }.toMap
    assert(dtf == freshDocTf())
    val ts = spark.read.parquet(s"$root/term_stats")
      .groupBy($"term").agg(sum($"tf").as("tf"), sum($"df").as("df"))
      .as[(String, Long, Long)].collect()
      .map { case (t, tf, df) => t -> (tf, df) }.toMap
    val wantTs = freshDocTf().toSeq.groupBy(_._1._2).view
      .mapValues(rs => (rs.map(_._2).sum, rs.size.toLong)).toMap
    assert(ts == wantTs)
    val dl = spark.read.parquet(s"$root/doc_lengths")
      .as[(Long, Long)].collect().toMap
    assert(dl == freshDocTf().toSeq.groupBy(_._1._1).view
      .mapValues(_.map(_._2).sum).toMap)
  }
}
