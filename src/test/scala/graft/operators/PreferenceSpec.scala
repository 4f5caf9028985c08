package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** x287–x289: document duels, the integer Bradley–Terry MM fit, and the
  * BT-vs-winrate concordance census — each checked against an
  * independent driver-side Long replica (the x77 three-implementation
  * discipline: Spark plan, DuckDB oracle, plain-Scala replica). */
class PreferenceSpec extends SparkSpec {
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  /** Driver-side Long replica of the MM chain (floor division
    * throughout, same clamp band). */
  private def replicaBt(duels: Seq[(String, String)],
                        iters: Int): Map[String, Long] = {
    val U = Preference.BtUnit
    val games = (duels.map(_._1) ++ duels.map(_._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val wins = duels.map(_._1)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .withDefaultValue(0L)
    val n = (duels ++ duels.map { case (w, l) => (l, w) })
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val r = n.map { case ((i, j), c) => (i, j) -> c * U / games(i) }
    val wr = games.map { case (s, g) => s -> wins(s) * U / g }
    var w = games.keys.map(_ -> U).toMap
    for (_ <- 1 to iters) {
      w = games.keys.map { i =>
        val denom = r.iterator.collect {
          case ((a, j), rv) if a == i => rv * (U * U / (w(i) + w(j)))
        }.sum
        i -> math.min(Preference.BtClampHi, math.max(Preference.BtClampLo,
          wr(i) * U * U / math.max(denom, 1L)))
      }.toMap
    }
    w
  }

  private def duelSeq(dir: String): Seq[(String, String)] =
    Preference.duels(spark, dir).as[(String, String)].collect().toSeq

  test("duels (x287 base): deterministic consecutive-id pairing, " +
    "cross-source only, winner by the (n_chars, md5) total order") {
    val docs = graft.Tables.documents(spark, sf)
      .select($"doc_id", $"source", $"n_chars", md5($"text").as("h"))
      .as[(Long, String, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    def rival(id: Long): Long = id + 1 + (id / 20) % 19
    val want = docs.keys.toSeq
      .filter(id => id % 2 == 0 && docs.contains(rival(id)))
      .flatMap { id =>
        val (sa, la, ha) = docs(id); val (sb, lb, hb) = docs(rival(id))
        if (sa == sb) None
        else if (la > lb || (la == lb && ha > hb)) Some((sa, sb))
        else Some((sb, sa))
      }
    val got = duelSeq(sf)
    assert(got.nonEmpty)
    assert(got.sorted == want.sorted)
    assert(got.forall { case (w, l) => w != l })
    // the rotation's whole point: the graph must CONNECT sources through
    // shared opponents, not collapse to the layout's fixed matching
    val opp = got.flatMap { case (w, l) => Seq(w -> l, l -> w) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size)
    assert(opp.values.forall(_ > 1), opp.toMap.toString)
  }

  test("sourceDuels (x287): census internally consistent with the raw duels") {
    val d = duelSeq(sf)
    val want = d.map { case (w, l) =>
      (Seq(w, l).min, Seq(w, l).max, if (w < l) 1L else 0L)
    }.groupBy(t => (t._1, t._2)).view.mapValues { v =>
      (v.size.toLong, v.map(_._3).sum)
    }.toMap
    val got = Preference.sourceDuels(spark, sf)
      .as[(String, String, Long, Long, Long, Long)].collect()
    assert(got.length == want.size)
    got.foreach { case (lo, hi, duels, winsLo, winsHi, wrMicro) =>
      val (n, wl) = want((lo, hi))
      assert(duels == n && winsLo == wl && winsHi == n - wl)
      assert(wrMicro == wl * Preference.BtUnit / n)
    }
  }

  test("btStrengths (x288): exact match with the driver-side integer replica") {
    val d = duelSeq(sf)
    val want = replicaBt(d, Preference.BtIters)
    val got = Preference.btStrengths(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(got.length == want.size)
    val games = (d.map(_._1) ++ d.map(_._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val wins = d.map(_._1).groupBy(identity).view.mapValues(_.size.toLong)
      .toMap.withDefaultValue(0L)
    got.foreach { case (s, g, w, wrM, stM) =>
      assert(g == games(s) && w == wins(s))
      assert(wrM == wins(s) * Preference.BtUnit / games(s))
      assert(stM == want(s), s"source $s")
    }
  }

  test("btStrengths: corpus-size invariance — replicating every duel k " +
    "times leaves the fit bit-identical (the rate form's whole point)") {
    val d = duelSeq(sf)
    val tripled = d.flatMap(x => Seq(x, x, x)).toDF("winner", "loser")
    val base = Preference.btStrengths(d.toDF("winner", "loser"), Preference.BtIters)
      .select($"source", $"winrate_micro", $"strength_micro")
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    val big = Preference.btStrengths(tripled, Preference.BtIters)
      .select($"source", $"winrate_micro", $"strength_micro")
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(base == big)
  }

  test("btStrengths: a never-winning source clamps to the floor, a " +
    "never-losing one to a strength above the unit") {
    val d = Seq.fill(10)(("top", "bot")).toDF("winner", "loser")
    val got = Preference.btStrengths(d, Preference.BtIters)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r._5).toMap
    assert(got("bot") == Preference.BtClampLo)
    assert(got("top") > Preference.BtUnit)
  }

  test("btStrengths: upsets against a strong opponent are worth more — " +
    "equal win counts, stronger schedule, higher strength") {
    // a beats champ 2/4; b beats chump 2/4; champ beats chump 8/8.
    val d = (Seq.fill(2)(("a", "champ")) ++ Seq.fill(2)(("champ", "a")) ++
      Seq.fill(2)(("b", "chump")) ++ Seq.fill(2)(("chump", "b")) ++
      Seq.fill(8)(("champ", "chump"))).toDF("winner", "loser")
    val got = Preference.btStrengths(d, Preference.BtIters)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r._5).toMap
    // identical 50% win rates, but a's wins came off the stronger item
    assert(got("a") > got("b"))
    assert(got("champ") > got("chump"))
  }

  test("btWinrateConcordance (x289): census matches a driver recompute " +
    "over the fitted table") {
    val fit = Preference.btStrengths(spark, sf)
      .select($"source", $"winrate_micro", $"strength_micro")
      .as[(String, Long, Long)].collect().toSeq
    val pairs = for {
      a <- fit; b <- fit if a._1 < b._1
    } yield {
      val conc = (a._3 > b._3 && a._2 > b._2) || (a._3 < b._3 && a._2 < b._2)
      val disc = (a._3 > b._3 && a._2 < b._2) || (a._3 < b._3 && a._2 > b._2)
      (if (conc) 1L else 0L, if (disc) 1L else 0L)
    }
    val got = Preference.btWinrateConcordance(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(got.length == 1)
    val (nS, nP, conc, disc, tied, tau) = got.head
    assert(nS == fit.size && nP == pairs.size)
    assert(conc == pairs.map(_._1).sum && disc == pairs.map(_._2).sum)
    assert(tied == nP - conc - disc)
    assert(tau == (conc - disc) * Preference.BtUnit)
  }

  test("plans: no BNLJ/Cartesian anywhere in the x287–x289 family " +
    "(the concordance pair census is a constant-key HASH join)") {
    Seq(Preference.sourceDuels(spark, sf),
      Preference.btStrengths(spark, sf),
      Preference.btWinrateConcordance(spark, sf)).foreach { df =>
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"), plan.take(800))
    }
  }
}
