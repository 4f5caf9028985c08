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

  test("modality rollup covers every asset") {
    val roll = Multimodal.featuresByModality(spark, sf)
    val total = roll.agg(sum($"n_assets")).head().getLong(0)
    assert(total == graft.Tables.documents(spark, sf).count())
    assert(roll.select($"modality").as[String].collect().toSet == Set("image", "audio"))
  }
}
