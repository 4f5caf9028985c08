package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.operators.{KnnStage, Similarity}

/** The streaming kNN ingester must build, across forced micro-batch
  * boundaries, EXACTLY the table a from-scratch full ranking builds —
  * the ingest-twin contract (band/term/cluster ingesters), here for
  * the most expensive staged artifact. */
class VectorStreamSpec extends SparkSpec {
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  test("stream-built ranked table ≡ from-scratch full ranking across batch boundaries") {
    val root = Files.createTempDirectory("graft-knn-ingest").toString
    val emb = graft.Tables.embeddings(spark, sf)
    // two arrival batches split by vec_id parity → two files, one per trigger
    emb.filter($"vec_id" % 2 === 0).write.parquet(s"$root/drop")
    emb.filter($"vec_id" % 2 === 1).write.mode("append").parquet(s"$root/drop")
    val stream = spark.readStream.schema(emb.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$root/drop")
    val q = VectorStream.startKnnIngest(stream, s"$root/stage", s"$root/ckpt")
    q.awaitTermination(180000)
    val streamed = spark.read.parquet(s"$root/stage/ranked")
      .select(col("q_id"), col("vec_id"), col("cos_sim"), col("rank"))
      .as[(Long, Long, Double, Int)].collect().toSet
    val full = Similarity.computeRankedTopK(spark, sf, KnnStage.StageK)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(streamed == full && streamed.nonEmpty)
    // the vector log holds the whole corpus exactly once
    val vecs = spark.read.parquet(s"$root/stage/vecs").select(col("vec_id"))
      .as[Long].collect().sorted
    val all = emb.select($"vec_id").as[Long].collect().sorted
    assert(vecs.toSeq == all.toSeq)
  }
}
