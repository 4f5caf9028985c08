package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** x270: Cohen's kappa between the repetition gate and the quality label. */
class FilterKappaSpec extends SparkSpec {
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  test("filterKappa equals a driver-side confusion replay; kappa in [-1, 1]") {
    val a = graft.Tables.documents(spark, sf)
      .select($"doc_id", $"source",
        TextAnalysis.repetitionKeep($"text").cast("long").as("a"))
      .as[(Long, String, Long)].collect()
    val b = TextAnalysis.qualityFeatures(spark, sf)
      .select($"doc_id", $"label".cast("long")).as[(Long, Long)].collect().toMap
    val want = a.groupBy(_._2).map { case (src, rows) =>
      val cells = rows.map(r => (r._3, b(r._1)))
      val (n11, n10) = (cells.count(_ == ((1L, 1L))).toLong,
        cells.count(_ == ((1L, 0L))).toLong)
      val (n01, n00) = (cells.count(_ == ((0L, 1L))).toLong,
        cells.count(_ == ((0L, 0L))).toLong)
      val n = rows.length.toLong
      val pe = (n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)
      src -> (n, n11, n10, n01, n00, n * (n11 + n00) - pe, n * n - pe)
    }
    val got = TextAnalysis.filterKappa(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Option[Double])]
      .collect()
    assert(got.nonEmpty && got.length == want.size)
    got.foreach { case (src, n, n11, n10, n01, n00, num, den, dbl) =>
      assert(want(src) == ((n, n11, n10, n01, n00, num, den)), src)
      assert(n11 + n10 + n01 + n00 == n, src)
      dbl match {
        case Some(d) =>
          assert(den != 0L && d == num.toDouble / den.toDouble, src)
          assert(d >= -1.0 && d <= 1.0, src)
        case None => assert(den == 0L, src)
      }
    }
    // the two filters genuinely disagree somewhere (kappa is not a
    // vacuous 1.0 across the board)
    assert(got.exists { case (_, _, _, n10, n01, _, _, _, _) => n10 + n01 > 0 })
  }
}
