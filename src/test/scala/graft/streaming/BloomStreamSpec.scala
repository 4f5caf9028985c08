package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.operators.Relational

/** The bloom-bitmap ingester's twin contract: bitmaps built across
  * forced micro-batch boundaries must equal the one-shot batch fold
  * (bit_or is associative/commutative, so any batching folds to the
  * same words), and stay equal under at-least-once replay. */
class BloomStreamSpec extends SparkSpec {
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  private def wordSet(root: String) =
    BloomStream.bloomWords(spark, s"$root/stage")
      .as[(Long, Long, Long)].collect().toSet

  test("stream-built bitmaps ≡ the batch fold across boundaries; replay no-op") {
    val root = Files.createTempDirectory("graft-bloom-ingest").toString
    val orders = graft.Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_custkey")
    val (minK, maxK) = orders.agg(
      org.apache.spark.sql.functions.min($"o_orderkey"),
      org.apache.spark.sql.functions.max($"o_orderkey"))
      .as[(Long, Long)].head()
    orders.filter($"o_orderkey" % 2 === 0).write.parquet(s"$root/drop")
    orders.filter($"o_orderkey" % 2 === 1).write.mode("append").parquet(s"$root/drop")
    val stream = spark.readStream.schema(orders.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$root/drop")
    val q = BloomStream.startBloomIngest(stream, s"$root/stage", s"$root/ckpt",
      minK, maxK)
    assert(q.awaitTermination(180000))
    val want = Relational.bloomWordsFrame(Relational.bloomTagged(
        orders.select(col("o_orderkey").as("k"), col("o_custkey").as("c")),
        minK, maxK))
      .as[(Long, Long, Long)].collect().toSet
    assert(wordSet(root) == want && want.nonEmpty)
    // post-publish re-delivery: a no-op
    BloomStream.applyBloomBatch(orders.filter($"o_orderkey" % 2 === 0),
      s"$root/stage", minK, maxK, 0L)
    assert(wordSet(root) == want)
    // an empty batch publishes nothing and breaks nothing
    BloomStream.applyBloomBatch(orders.filter($"o_orderkey" < 0),
      s"$root/stage", minK, maxK, 9L)
    assert(wordSet(root) == want)
  }

  test("a key outside the frozen layout bounds fails LOUDLY (no phantom file ids)") {
    val root = Files.createTempDirectory("graft-bloom-oob").toString
    val orders = graft.Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_custkey")
    val maxK = orders.agg(org.apache.spark.sql.functions.max($"o_orderkey"))
      .as[Long].head()
    // declare bounds SMALLER than the data: the overflow key must raise,
    // not publish its bits under file id >= ZoneFiles where no planner probes
    val e = intercept[Exception] {
      BloomStream.applyBloomBatch(orders, s"$root/stage", 1L, maxK - 1, 0L)
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("bloom layout bounds violated")), e.toString)
  }

  test("bloomWords on a fresh stage root fails naming the root") {
    val root = Files.createTempDirectory("graft-bloom-empty").toString
    val e = intercept[IllegalArgumentException] {
      BloomStream.bloomWords(spark, s"$root/stage")
    }
    assert(e.getMessage.contains(s"$root/stage"))
  }
}
