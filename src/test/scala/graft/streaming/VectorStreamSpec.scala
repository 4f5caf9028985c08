package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.operators.{KnnStage, Similarity}

/** The streaming kNN ingester must build, across forced micro-batch
  * boundaries, EXACTLY the table a from-scratch full ranking builds —
  * the ingest-twin contract (band/term/cluster ingesters), here for
  * the most expensive staged artifact — and must keep building it
  * under foreachBatch's at-least-once delivery (a replayed batch must
  * not double-count its vectors or poison the vec log). */
class VectorStreamSpec extends SparkSpec {
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  private def rankedSet(root: String) =
    VectorStream.ranked(spark, s"$root/stage")
      .select(col("q_id"), col("vec_id"), col("cos_sim"), col("rank"))
      .as[(Long, Long, Double, Int)].collect().toSet

  private def fullSet() =
    Similarity.computeRankedTopK(spark, sf, KnnStage.StageK)
      .as[(Long, Long, Double, Int)].collect().toSet

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
    assert(rankedSet(root) == fullSet() && rankedSet(root).nonEmpty)
    // the vector log holds the whole corpus exactly once
    val vecs = VectorStream.vecs(spark, s"$root/stage").select(col("vec_id"))
      .as[Long].collect().sorted
    val all = emb.select($"vec_id").as[Long].collect().sorted
    assert(vecs.toSeq == all.toSeq)
  }

  test("at-least-once replay: re-delivered batches are no-ops, a crashed attempt redoes cleanly") {
    val root = Files.createTempDirectory("graft-knn-replay").toString
    val emb = graft.Tables.embeddings(spark, sf)
    val b0 = emb.filter($"vec_id" % 2 === 0)
    val b1 = emb.filter($"vec_id" % 2 === 1)
    VectorStream.applyBatch(b0, s"$root/stage", KnnStage.StageK, 0L)
    // simulate a crashed first attempt of batch 1: vecs/b1 written but the
    // batch never published (no marker, no ranked/r1) — the replay must
    // ignore that leftover and fold from the pre-state
    b1.select(col("vec_id"), Similarity.asDouble(col("embedding")).as("v"))
      .write.parquet(s"$root/stage/vecs/b1")
    VectorStream.applyBatch(b1, s"$root/stage", KnnStage.StageK, 1L)
    // then the post-publish re-delivery (checkpoint commit lost): a no-op
    VectorStream.applyBatch(b1, s"$root/stage", KnnStage.StageK, 1L)
    VectorStream.applyBatch(b0, s"$root/stage", KnnStage.StageK, 0L)
    assert(rankedSet(root) == fullSet())
    // every rank slot is a DISTINCT neighbor (no duplicate (q_id, vec_id)
    // pairs eating slots — the replay failure mode) and the vec log holds
    // the corpus exactly once
    val pairs = VectorStream.ranked(spark, s"$root/stage")
      .select($"q_id", $"vec_id").as[(Long, Long)].collect()
    assert(pairs.distinct.length == pairs.length)
    val vecs = VectorStream.vecs(spark, s"$root/stage").select(col("vec_id"))
      .as[Long].collect().sorted
    assert(vecs.toSeq == emb.select($"vec_id").as[Long].collect().sorted.toSeq)
  }

  test("ranked() on a fresh stage root fails with an explicit error naming the root") {
    val root = Files.createTempDirectory("graft-knn-empty").toString
    val e = intercept[IllegalArgumentException] {
      VectorStream.ranked(spark, s"$root/stage")
    }
    assert(e.getMessage.contains(s"$root/stage"))
  }

  test("ANN ingest: stream-built approximate table ≡ the batch AnnStage rebuild, replay-safe") {
    import graft.operators.AnnStage
    val root = Files.createTempDirectory("graft-ann-ingest").toString
    val emb = graft.Tables.embeddings(spark, sf)
    emb.filter($"vec_id" % 2 === 0).write.parquet(s"$root/drop")
    emb.filter($"vec_id" % 2 === 1).write.mode("append").parquet(s"$root/drop")
    val stream = spark.readStream.schema(emb.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$root/drop")
    val q = VectorStream.startAnnIngest(stream, s"$root/stage", s"$root/ckpt")
    q.awaitTermination(180000)
    // incremental maintenance is EXACT w.r.t. the batch rebuild: the
    // mergeRanked soundness argument restricted to the Hamming ball
    val want = AnnStage.computeApproxRankedTopK(spark, sf, KnnStage.StageK)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(rankedSet(root) == want && want.nonEmpty)
    // a post-publish re-delivery is a no-op (the replay contract)
    VectorStream.applyAnnBatch(emb.filter($"vec_id" % 2 === 0),
      s"$root/stage", KnnStage.StageK, AnnStage.AnnRadius, 0L)
    assert(rankedSet(root) == want)
    // the x221-style fidelity ledger runs on the STREAM-BUILT table and,
    // because stream ≡ batch stage, matches the batch-stage ledger
    val streamLedger = Similarity.annSwapFidelity(spark, sf,
        approxTable = Some(VectorStream.ranked(spark, s"$root/stage")))
      .as[(Int, Long, Long, Long, Long)].collect().toSet
    val stageLedger = Similarity.annSwapFidelity(spark, sf)
      .as[(Int, Long, Long, Long, Long)].collect().toSet
    assert(streamLedger == stageLedger && streamLedger.nonEmpty)
  }

  test("PQ index ingest: stream-built index ≡ the batch encode (append-only), replay-safe") {
    import graft.operators.ProductQuant
    val root = Files.createTempDirectory("graft-pq-ingest").toString
    val emb = graft.Tables.embeddings(spark, sf)
    val pcb = ProductQuant.trainCodebook(spark, sf)
    val ccb = ProductQuant.trainCodebook(spark, sf,
      1, ProductQuant.PqSubspaces * ProductQuant.PqSubDim, ProductQuant.IvfPqCells)
    emb.filter($"vec_id" % 2 === 0).write.parquet(s"$root/drop")
    emb.filter($"vec_id" % 2 === 1).write.mode("append").parquet(s"$root/drop")
    val stream = spark.readStream.schema(emb.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$root/drop")
    val q = VectorStream.startPqIngest(stream, s"$root/stage", s"$root/ckpt", pcb, ccb)
    assert(q.awaitTermination(180000))
    def idxSet() = VectorStream.pqIndex(spark, s"$root/stage")
      .select($"vec_id", $"cell", $"m", $"code")
      .as[(Long, Int, Int, Int)].collect().toSet
    val want = ProductQuant.indexFrame(emb, pcb, ccb)
      .select($"vec_id", $"cell", $"m", $"code")
      .as[(Long, Int, Int, Int)].collect().toSet
    assert(idxSet() == want && want.nonEmpty)
    // a post-publish re-delivery is a no-op; a crashed half-written
    // attempt of a NEW batch overwrites its own dir and publishes cleanly
    VectorStream.applyPqBatch(emb.filter($"vec_id" % 2 === 0),
      s"$root/stage", pcb, ccb, 0L)
    assert(idxSet() == want)
    val extra = emb.filter($"vec_id" < 0) // empty: no marker, no dir
    VectorStream.applyPqBatch(extra, s"$root/stage", pcb, ccb, 7L)
    assert(idxSet() == want)
    // every vector appears exactly once per subspace (no replay double-count)
    val counts = VectorStream.pqIndex(spark, s"$root/stage")
      .groupBy($"vec_id").count().as[(Long, Long)].collect()
    assert(counts.forall(_._2 == ProductQuant.PqSubspaces))
  }
}
