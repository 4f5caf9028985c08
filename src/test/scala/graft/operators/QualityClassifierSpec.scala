package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Gates the model-scoring stage of the quality pipeline (x40's
  * non-oracle-shaped half): LogisticRegression output is float-iterative,
  * so instead of a DuckDB hash compare it is checked for coverage,
  * determinism under the pinned fit input, and agreement with the heuristic
  * labels it was trained on. The FEATURE matrix feeding it IS
  * oracle-checked (x40_quality_features).
  */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  test("classifier scores every document with calibrated probabilities") {
    val scored = TextAnalysis.qualityClassifierScores(spark, sf)
      .as[(Long, Int, Int, Double)].collect()
    val total = graft.Tables.documents(spark, sf).count()
    assert(scored.length == total) // one score per document, none dropped
    scored.foreach { case (id, _, pred, p) =>
      assert(p >= 0.0 && p <= 1.0, s"doc $id prob $p")
      assert(pred == (if (p >= 0.5) 1 else 0), s"doc $id prediction/prob disagree")
    }
    // both classes actually occur in the scored output
    assert(scored.exists(_._3 == 0) && scored.exists(_._3 == 1))
  }

  test("classifier recovers the heuristic labels it was trained on") {
    val scored = TextAnalysis.qualityClassifierScores(spark, sf)
      .select($"label", $"predicted").as[(Int, Int)].collect()
    val agree = scored.count { case (l, p) => l == p }
    // the label is a (nonlinear) threshold on two of the five features; a
    // linear model can't be perfect, but far-from-boundary docs dominate
    assert(agree.toDouble / scored.length > 0.85,
      s"training-set agreement ${agree.toDouble / scored.length}")
  }

  test("scoring is deterministic: two fits on the pinned input agree exactly") {
    val a = TextAnalysis.qualityClassifierScores(spark, sf)
      .select($"doc_id", $"quality_prob").as[(Long, Double)].collect().toMap
    val b = TextAnalysis.qualityClassifierScores(spark, sf)
      .select($"doc_id", $"quality_prob").as[(Long, Double)].collect().toMap
    assert(a == b)
  }
}
