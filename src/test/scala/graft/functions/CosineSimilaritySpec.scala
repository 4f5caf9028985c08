package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Similarity

class CosineSimilaritySpec extends SparkSpec {
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  test("native codegen expression is bit-identical to the higher-order-function twin") {
    val emb = graft.Tables.embeddings(spark, sf)
      .select($"vec_id", Similarity.asDouble($"embedding").as("v"))
    val q = emb.filter($"vec_id" === 0).select($"v".as("qv"))
    val both = emb.crossJoin(q)
      .select(
        VectorFunctions.cosine_sim($"qv", $"v").as("native"),
        Similarity.cosine($"qv", $"v").as("hof"))
    assert(both.filter($"native" =!= $"hof").count() == 0)
  }

  test("works directly on the raw float arrays and known values") {
    val df = Seq((Array(1.0f, 0.0f), Array(1.0f, 0.0f)), (Array(1.0f, 0.0f), Array(0.0f, 1.0f)))
      .toDF("a", "b")
    val sims = df.select(VectorFunctions.cosine_sim($"a", $"b")).as[Double].collect().toSeq
    assert(sims == Seq(1.0, 0.0))
  }

  test("registered as a SQL function") {
    VectorFunctions.register(spark)
    val r = spark.sql("SELECT cosine_sim(array(1.0d, 2.0d), array(1.0d, 2.0d)) AS c")
      .as[Double].head()
    assert(math.abs(r - 1.0) < 1e-15)
  }

  test("null input yields null, mismatched types rejected at analysis") {
    val df = Seq((Some(Array(1.0, 2.0)), None: Option[Array[Double]])).toDF("a", "b")
    val out = df.select(VectorFunctions.cosine_sim($"a", $"b")).collect()
    assert(out.head.isNullAt(0))
    intercept[Exception] {
      Seq((1, "x")).toDF("a", "b").select(VectorFunctions.cosine_sim($"a", $"b")).collect()
    }
  }
}
