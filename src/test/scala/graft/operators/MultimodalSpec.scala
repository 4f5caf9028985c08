package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  test("assets table has real binary content + typed metadata") {
    val a = Multimodal.assets(spark, sf)
    assert(a.schema("content").dataType == org.apache.spark.sql.types.BinaryType)
    val row = a.head()
    assert(row.content.length == 16) // md5 digest bytes
    assert(row.declared_w >= 1 && row.declared_h >= 1)
  }

  test("partition-batch decode emits one feature row per asset, deterministically") {
    val feats = Multimodal.decodeFeatures(Multimodal.assets(spark, sf))
    assert(feats.count() == graft.Tables.documents(spark, sf).count())
    // determinism: same input → same mean_intensity on re-run
    val a = feats.select($"asset_id", $"mean_intensity").as[(Long, Double)].collect().toMap
    val b = Multimodal.decodeFeatures(Multimodal.assets(spark, sf))
      .select($"asset_id", $"mean_intensity").as[(Long, Double)].collect().toMap
    assert(a == b)
    // mean intensity of md5 bytes is in [0, 255]
    assert(a.values.forall(v => v >= 0 && v <= 255))
  }

  test("resize downsamples bytes and metadata deterministically") {
    val resized = Multimodal.resize(Multimodal.assets(spark, sf), stride = 4)
    val r = resized.head()
    assert(r.content.length == 4) // 16 md5 bytes / stride 4
    assert(resized.count() == graft.Tables.documents(spark, sf).count())
  }

  test("frame sampling keeps every rate-th fixed-size frame") {
    val frames = Multimodal.sampleFrames(Multimodal.assets(spark, sf), frameBytes = 4, rate = 2)
    // 16 bytes → 4 frames of 4 → keep idx 0 and 2 → 2 frames per asset
    val perAsset = frames.groupByKey(_.asset_id).count().collect()
    assert(perAsset.forall(_._2 == 2))
    assert(frames.head().frame.length == 4)
  }

  test("modality rollup covers every asset") {
    val roll = Multimodal.featuresByModality(spark, sf)
    val total = roll.agg(sum($"n_assets")).head().getLong(0)
    assert(total == graft.Tables.documents(spark, sf).count())
    assert(roll.select($"modality").as[String].collect().toSet == Set("image", "audio"))
  }

  test("chunkDedupStats (x182): storage ledger matches a driver chunk-store replay") {
    val docs = graft.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val chunksByAsset = docs.map { case (id, text) =>
      id -> text.getBytes("UTF-8").grouped(Multimodal.ChunkBytes)
        .map(_.toSeq).toSeq
    }.filter(_._2.nonEmpty).toMap
    val owner = scala.collection.mutable.Map.empty[Seq[Byte], Long]
    chunksByAsset.toSeq.sortBy(_._1).foreach { case (id, cs) =>
      cs.foreach(c => if (!owner.contains(c)) owner(c) = id)
    }
    val got = Multimodal.chunkDedupStats(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(got.length == chunksByAsset.size && got.nonEmpty)
    got.foreach { case (id, nChunks, nDistinct, nOwned, newBytes, rawBytes) =>
      val cs = chunksByAsset(id)
      val distinct = cs.distinct
      val ownedSet = distinct.filter(owner(_) == id)
      assert(nChunks == cs.size.toLong, s"asset $id chunks")
      assert(nDistinct == distinct.size.toLong, s"asset $id distinct")
      assert(nOwned == ownedSet.size.toLong, s"asset $id owned")
      assert(newBytes == ownedSet.map(_.size.toLong).sum, s"asset $id new bytes")
      assert(rawBytes == cs.map(_.size.toLong).sum, s"asset $id raw bytes")
    }
    // dedup actually happened somewhere: some asset stores less than raw
    assert(got.exists(r => r._5 < r._6))
  }

  test("byteSimhashPairs (x205): signature, banding and verify match a driver replay") {
    val docs = graft.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val cb = Multimodal.ChunkBytes
    def sig(text: String): Long = {
      val hs = text.getBytes("UTF-8").grouped(cb)
        .map(c => Dedup.md5Hash60Ref(new String(c, "UTF-8"))).toSeq
      val cnt = Array.fill(64)(0)
      hs.foreach { h =>
        (0 until 64).foreach(b => if (((h >>> b) & 1L) == 1L) cnt(b) += 1)
      }
      (0 until 64).foldLeft(0L)((acc, b) =>
        if (cnt(b) * 2 > hs.size) acc | (1L << b) else acc)
    }
    val sigs = docs.map { case (id, t) => id -> sig(t) }.toMap
    val want = (for {
      (a, sa) <- sigs; (b, sb) <- sigs
      if a < b
      if (0 until 4).exists(band => ((sa >> (band * 16)) & 65535L) == ((sb >> (band * 16)) & 65535L))
      h = java.lang.Long.bitCount(sa ^ sb)
      if h <= Multimodal.PhashMaxHamming
    } yield (a, b) -> h).toMap
    val got = Multimodal.byteSimhashPairs(spark, sf)
      .as[(Long, Long, Int)].collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { case (a, b, h) => assert(want((a, b)) == h, s"pair ($a,$b)") }
  }

  test("dedupSweep (x213): per-threshold ledger matches a replay; curve is monotone") {
    val pairs = Multimodal.byteSimhashPairs(spark, sf)
      .as[(Long, Long, Int)].collect()
    val chars = graft.Tables.documents(spark, sf)
      .select($"doc_id", $"n_chars").as[(Long, Long)].collect().toMap
    val got = Multimodal.dedupSweep(spark, sf)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == Multimodal.SweepThresholds)
    got.foreach { case (t, np, nr, bytes) =>
      val kept = pairs.filter(_._3 <= t)
      val removable = kept.map(_._2).distinct
      assert(np == kept.length.toLong, s"t=$t pairs")
      assert(nr == removable.length.toLong, s"t=$t removable")
      assert(bytes == removable.map(chars).sum, s"t=$t bytes")
    }
    val ns = got.map(_._2)
    assert(ns.zip(ns.tail).forall(p => p._1 <= p._2) && ns.last > 0)
  }
}
