package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** x262: interpolated Kneser–Ney bigram model. */
class KneserNeySpec extends SparkSpec {
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  /** Driver-side replay from the raw text — an independent third
    * implementation besides the Spark plan and the DuckDB oracle. */
  private def replay(minCount: Long)
      : Map[(String, String), (Long, Long, Long, Long, Long, Long, Long)] = {
    val texts = graft.Tables.documents(spark, sf)
      .select($"text").as[String].collect()
    val bigrams = texts.flatMap { t =>
      val ws = t.split(" ", -1); ws.dropRight(1).zip(ws.drop(1))
    }
    val a = bigrams.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val cu = a.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val n1u = a.groupBy(_._1._1).view.mapValues(_.size.toLong).toMap
    val nw = a.groupBy(_._1._2).view.mapValues(_.size.toLong).toMap
    val nn = a.size.toLong
    a.collect { case ((w1, w2), c) if c >= minCount =>
      val num = (4 * c - 3) * nn + 3 * n1u(w1) * nw(w2)
      val den = 4 * cu(w1) * nn
      (w1, w2) -> (c, cu(w1), n1u(w1), nw(w2), nn, num, den)
    }
  }

  test("kneserNeyBigrams equals a driver-side replay, bit-exact double included") {
    val want = replay(TextAnalysis.KnMinCount)
    val got = TextAnalysis.kneserNeyBigrams(spark, sf)
      .as[(String, String, Long, Long, Long, Long, Long, Long, Long, Double)]
      .collect()
    assert(got.nonEmpty && got.length == want.size)
    got.foreach { case (w1, w2, a, cu, n1u, nw, nn, num, den, dbl) =>
      assert(want((w1, w2)) == ((a, cu, n1u, nw, nn, num, den)), s"($w1, $w2)")
      assert(dbl == num.toDouble / den.toDouble)
      // the discount moved mass: the smoothed probability differs from
      // the MLE a/cu except where the interpolation term exactly repays it
      assert(num > 0 && num < den, s"probability out of (0,1) for ($w1, $w2)")
    }
  }

  test("per-context probability mass over SEEN continuations is < 1 and near 1 summed over all") {
    // minCount = 1: every seen bigram published, so the per-w1 fold is
    // the full seen-continuation mass; the KN identity bounds it by
    // 1 − d·n1u·(unseen continuation mass)/cu·nn < 1
    val mass = TextAnalysis.kneserNeyBigrams(spark, sf, minCount = 1L)
      .groupBy($"w1")
      .agg(sum($"p_num").as("num_sum"), first($"p_den").as("den"),
        first($"cu").as("cu"), first($"n1u").as("n1u"))
      .as[(String, Long, Long, Long, Long)].collect()
    assert(mass.nonEmpty)
    mass.foreach { case (w1, numSum, den, _, _) =>
      assert(numSum <= den, s"seen-continuation mass exceeds 1 for '$w1'")
    }
    // and the model is genuinely smoothed: total seen mass is strictly
    // below 1 for at least one context (the reserved backoff mass)
    assert(mass.exists { case (_, numSum, den, _, _) => numSum < den })
  }

  test("kneserNeyTrigrams (x265) equals a driver-side replay; per-context mass < 1") {
    val texts = graft.Tables.documents(spark, sf)
      .select($"text").as[String].collect()
    val tris = texts.flatMap { t =>
      val ws = t.split(" ", -1)
      if (ws.length < 3) Seq.empty
      else (0 to ws.length - 3).map(i => (ws(i), ws(i + 1), ws(i + 2)))
    }
    val c3 = tris.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val c12 = c3.groupBy(k => (k._1._1, k._1._2)).view.mapValues(_.values.sum).toMap
    val n1u12 = c3.groupBy(k => (k._1._1, k._1._2)).view.mapValues(_.size.toLong).toMap
    val a2p = c3.keySet.groupBy(k => (k._2, k._3)).view.mapValues(_.size.toLong).toMap
    val cu2p = a2p.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val n1u2p = a2p.groupBy(_._1._1).view.mapValues(_.size.toLong).toMap
    val bigs = texts.flatMap { t =>
      val ws = t.split(" ", -1); ws.dropRight(1).zip(ws.drop(1))
    }.toSet
    val nw = bigs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val nn = bigs.size.toLong
    val got = TextAnalysis.kneserNeyTrigrams(spark, sf)
      .as[(String, String, String, Long, Long, Long, Long, Long, Long, Long,
        Long, Long, Long, Double)].collect()
    val wantKeys = c3.filter(_._2 >= TextAnalysis.KnMinCount).keySet
    assert(got.nonEmpty && got.length == wantKeys.size)
    got.foreach { case (w1, w2, w3, a, b12, n12, a2, cu2, n2, nwv, nnv, num, den, dbl) =>
      val key = (w1, w2, w3)
      val wantNum = (4 * a - 3) * 4 * cu2p((w2)) * nn +
        3 * n1u12((w1, w2)) * ((4 * a2p((w2, w3)) - 3) * nn +
          3 * n1u2p(w2) * nw(w3))
      val wantDen = 16 * c12((w1, w2)) * cu2p(w2) * nn
      assert((a, b12, n12, a2, cu2, n2, nwv, nnv) ==
        ((c3(key), c12((w1, w2)), n1u12((w1, w2)), a2p((w2, w3)),
          cu2p(w2), n1u2p(w2), nw(w3), nn)), s"$key counts")
      assert((num, den) == ((wantNum, wantDen)), s"$key rational")
      assert(dbl == num.toDouble / den.toDouble)
      assert(num > 0 && num < den, s"$key out of (0,1)")
    }
    // per-(w1,w2) seen-continuation mass stays below 1 (minCount = 1
    // so the fold covers every seen trigram of the context)
    val mass = TextAnalysis.kneserNeyTrigrams(spark, sf, minCount = 1L)
      .groupBy($"w1", $"w2")
      .agg(sum($"p_num").as("s"), first($"p_den").as("d"))
      .as[(String, String, Long, Long)].collect()
    assert(mass.nonEmpty)
    mass.foreach { case (w1, w2, s, d) => assert(s <= d, s"($w1, $w2)") }
    assert(mass.exists { case (_, _, s, d) => s < d })
  }

  test("knFluency (x264) equals a driver-side replay and orders like a smoothed x94") {
    val model = replay(1L).map { case ((w1, w2), (_, _, _, _, _, num, den)) =>
      s"$w1 $w2" -> 1000000L * num / den
    }
    val docs = graft.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val want = docs.map { case (id, t) =>
      val ws = t.split(" ", -1)
      val bgs = ws.dropRight(1).zip(ws.drop(1)).map { case (a, b) => s"$a $b" }
      if (bgs.isEmpty) id -> (0L, 0L)
      else id -> (bgs.length.toLong, bgs.map(model).sum / bgs.length)
    }.toMap
    val got = TextAnalysis.knFluency(spark, sf)
      .as[(Long, Long, Long)].collect()
    assert(got.length == docs.length && got.nonEmpty)
    got.foreach { case (id, n, ppm) =>
      assert(want(id) == ((n, ppm)), s"doc $id")
    }
    // the smoothed scorer never zeroes a doc that has bigrams (every
    // seen bigram has positive smoothed mass — the point vs a filter
    // that drops docs over one rare continuation)
    assert(got.filter(_._2 > 0).forall(_._3 > 0L))
  }
}
