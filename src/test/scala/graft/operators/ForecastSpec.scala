package graft.operators

import org.apache.spark.sql.functions.expr

import graft.SparkSpec

class ForecastSpec extends SparkSpec {
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  /** Collected (brand, epoch_day, price_cents) fact rows — the shared
    * driver-side input for the three replicas. */
  private lazy val facts: Seq[(String, Long, Long)] = {
    val brandByPart = graft.Tables.part(spark, sf)
      .select($"p_partkey", $"p_brand").as[(Long, String)].collect().toMap
    graft.Tables.lineitem(spark, sf)
      .select($"l_partkey",
        org.apache.spark.sql.functions.unix_timestamp($"l_shipdate"),
        $"l_extendedprice")
      .as[(Long, Long, Double)].collect().toSeq
      .map { case (pk, ts, price) =>
        (brandByPart(pk), ts / 86400, math.round(price * 100)) }
  }

  test("seasonalBacktest (x117): exact match with a driver-side replica") {
    val daily = facts.groupBy(f => (f._1, f._2)).view.mapValues(_.map(_._3).sum).toMap
    val minDay = daily.keys.map(_._2).min
    val lag = Forecast.SeasonalLagDays
    val want = daily.toSeq
      .collect { case ((b, d), v) if d >= minDay + lag =>
        (b, v, v - daily.getOrElse((b, d - lag), 0L)) }
      .groupBy(_._1).view.mapValues { rs =>
        val actual = rs.map(_._2).sum
        val abs = rs.map(r => math.abs(r._3)).sum
        (rs.size.toLong, actual, rs.map(_._3).sum, abs, 1000000L * abs / actual)
      }.toMap
    val got = Forecast.seasonalBacktest(spark, sf)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { case (b, n, actual, err, abs, wape) =>
      assert((n, actual, err, abs, wape) == want(b), s"brand $b")
    }
    // a 0-forecast day (first evaluated week) makes |err| = actual there,
    // so WAPE is positive unless the series is perfectly weekly-periodic
    assert(got.exists(_._6 > 0L))
  }

  test("dowProfile (x118): shares, peak pick, and replica-exact cells") {
    val byDow = facts.groupBy(f => (f._1, (f._2 + 4) % 7)).view.mapValues(_.map(_._3).sum).toMap
    val totals = byDow.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val peaks = byDow.groupBy(_._1._1).view.mapValues(
      _.map { case ((_, dow), v) => (v, dow) }.max._2).toMap
    val got = Forecast.dowProfile(spark, sf)
      .as[(String, Long, Long, Long, Int)].collect()
    assert(got.length == byDow.size && got.nonEmpty)
    got.foreach { case (b, dow, rev, share, isPeak) =>
      assert(rev == byDow((b, dow)), s"$b dow=$dow rev")
      assert(share == 1000000L * rev / totals(b), s"$b dow=$dow share")
      assert(isPeak == (if (peaks(b) == dow) 1 else 0), s"$b dow=$dow peak")
    }
    // exactly one peak per brand; floor-divided shares sum to ≤ 1e6
    val byBrand = got.groupBy(_._1)
    byBrand.values.foreach { rs =>
      assert(rs.count(_._5 == 1) == 1)
      val s = rs.map(_._4).sum
      assert(s <= 1000000L && s > 1000000L - rs.length)
    }
  }

  test("gapFill (x124): dense grid, fill flags, and carried values match a replica") {
    val daily = facts.groupBy(f => (f._1, f._2)).view.mapValues(_.map(_._3).sum).toMap
    val (mn, mx) = (daily.keys.map(_._2).min, daily.keys.map(_._2).max)
    val brands = daily.keys.map(_._1).toSet
    val got = Forecast.gapFill(spark, sf)
      .as[(String, Long, Option[Long], Int, Long)].collect()
    assert(got.length == brands.size * (mx - mn + 1).toInt)
    val byBrand = got.groupBy(_._1)
    byBrand.foreach { case (b, rows) =>
      var carried = 0L
      rows.sortBy(_._2).foreach { case (_, day, rev, isFilled, filled) =>
        val want = daily.get((b, day))
        assert(rev == want, s"$b day=$day observed")
        assert(isFilled == (if (want.isEmpty) 1 else 0), s"$b day=$day flag")
        want.foreach(carried = _)
        assert(filled == carried, s"$b day=$day carry")
      }
    }
    // the fixture really has gaps (otherwise forward-fill is untested)
    assert(got.exists(_._4 == 1))
  }

  test("discountSlope (x119): exact rational sums, den = 0 iff one discount level") {
    val xy = {
      val brandByPart = graft.Tables.part(spark, sf)
        .select($"p_partkey", $"p_brand").as[(Long, String)].collect().toMap
      graft.Tables.lineitem(spark, sf)
        .select($"l_partkey", $"l_discount", $"l_quantity")
        .as[(Long, Double, Double)].collect().toSeq
        .map { case (pk, d, q) =>
          (brandByPart(pk), math.round(d * 100), math.round(q * 100)) }
    }
    val want = xy.groupBy(_._1).view.mapValues { rs =>
      val n = rs.size.toLong
      val sx = rs.map(_._2).sum; val sy = rs.map(_._3).sum
      val sxy = rs.map(r => r._2 * r._3).sum; val sxx = rs.map(r => r._2 * r._2).sum
      (n, n * sxy - sx * sy, n * sxx - sx * sx)
    }.toMap
    val got = Forecast.discountSlope(spark, sf)
      .as[(String, Long, Long, Long)].collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { case (b, n, num, den) =>
      assert((n, num, den) == want(b), s"brand $b")
      assert(den >= 0L, "den is n·Var(x) ≥ 0")
      val levels = xy.filter(_._1 == b).map(_._2).distinct.size
      assert((den == 0L) == (levels == 1), s"brand $b den/levels")
    }
  }

  test("meanShiftSplit (x135): argmax split matches the exhaustive driver scan") {
    val daily = graft.Tables.orders(spark, sf)
      .select(org.apache.spark.sql.functions.unix_timestamp($"o_orderdate"),
        $"o_totalprice")
      .as[(Long, Double)].collect().toSeq
      .map { case (ts, p) => (ts / 86400, math.round(p * 100)) }
      .groupBy(_._1).view
      .mapValues(vs => (vs.size.toLong, vs.map(_._2).sum)).toSeq
      .sortBy(_._1)
    val nT = daily.map(_._2._1).sum
    val sT = daily.map(_._2._2).sum
    var cn = 0L; var cs = 0L
    val splits = daily.flatMap { case (d, (n, s)) =>
      cn += n; cs += s
      val na = nT - cn; val sa = sT - cs
      if (na > 0)
        Some((d, cn, na, cs, sa,
          math.abs(cs * na - sa * cn).toDouble / (cn * na).toDouble))
      else None
    }
    val best = splits.maxBy(t => (t._6, -t._1))
    val got = Forecast.meanShiftSplit(spark, sf)
      .select($"split_day", $"n_before", $"n_after",
        $"rev_before_cents", $"rev_after_cents", $"shift_dbl")
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    assert(got.length == 1)
    assert(got.head == ((best._1, best._2, best._3, best._4, best._5, best._6)))
    // the reported means reconstruct from the integer columns exactly
    val m = Forecast.meanShiftSplit(spark, sf)
      .select($"mean_before_dbl", $"mean_after_dbl").as[(Double, Double)].head()
    assert(m._1 == best._4.toDouble / best._2.toDouble)
    assert(m._2 == best._5.toDouble / best._3.toDouble)
  }

  test("acfMoments (x162): lag-pair raw moments match an exhaustive driver replay") {
    val daily = facts.groupBy(f => (f._1, f._2)).view.mapValues(_.map(_._3).sum).toMap
    val want = (for {
      lag <- Forecast.AcfLags
      ((b, d), x) <- daily.toSeq
      y <- daily.get((b, d - lag))
    } yield (b, lag.toLong, x, y))
      .groupBy(t => (t._1, t._2)).view.mapValues { rs =>
        (BigInt(rs.size),
          rs.map(r => BigInt(r._3)).sum, rs.map(r => BigInt(r._4)).sum,
          rs.map(r => BigInt(r._3) * r._4).sum,
          rs.map(r => BigInt(r._3) * r._3).sum,
          rs.map(r => BigInt(r._4) * r._4).sum)
      }.toMap
    val got = Forecast.acfMoments(spark, sf)
      .select($"p_brand", $"lag", $"n_pairs", $"sum_x".cast("string"),
        $"sum_y".cast("string"), $"sum_xy".cast("string"),
        $"sum_xx".cast("string"), $"sum_yy".cast("string"))
      .as[(String, Long, Long, String, String, String, String, String)].collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { case (b, l, n, sx, sy, sxy, sxx, syy) =>
      assert((BigInt(n), BigInt(sx), BigInt(sy), BigInt(sxy), BigInt(sxx),
        BigInt(syy)) == want((b, l)), s"brand $b lag $l")
    }
    // both pinned lags present for every brand that has enough history
    assert(Forecast.AcfLags.forall(l => got.exists(_._2 == l.toLong)))
  }

  test("lifeTable (x150): KM input table matches an exhaustive driver replay") {
    val cd = graft.Tables.orders(spark, sf)
      .select($"o_custkey",
        org.apache.spark.sql.functions.to_date($"o_orderdate"))
      .as[(Long, java.sql.Date)].collect().toSeq
      .map { case (c, d) => (c, d.toLocalDate.toEpochDay) }.distinct
    val maxd = cd.map(_._2).max
    val subjects = cd.groupBy(_._1).values.toSeq.flatMap { rows =>
      val ds = rows.map(_._2).sorted
      ds.zipAll(ds.drop(1).map(Option(_)), 0L, None).map { case (d, nd) =>
        ((nd.getOrElse(maxd) - d) / Forecast.LifeTableBucketDays, nd.isDefined)
      }
    }
    val byBucket = subjects.groupBy(_._1).view.mapValues { ss =>
      (ss.count(_._2).toLong, ss.count(!_._2).toLong)
    }.toMap
    val got = Forecast.lifeTable(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.length == byBucket.size && got.nonEmpty)
    got.foreach { case (t, risk, ev, cen) =>
      assert((ev, cen) == byBucket(t), s"bucket $t events/censored")
      // risk set entering t = every subject whose duration lands at or past t
      assert(risk == subjects.count(_._1 >= t).toLong, s"bucket $t risk")
    }
    // both outcomes occur: repeat orders (events) and last orders (censored)
    assert(got.map(_._3).sum > 0 && got.map(_._4).sum > 0)
    // every customer's final order is censored: censor mass = customer count
    assert(got.map(_._4).sum == cd.map(_._1).distinct.size.toLong)
  }

  test("corrMoments (x152): exact BigInt replica; sums are wrap-free DECIMAL(38,0)") {
    val rows = graft.Tables.lineitem(spark, sf)
      .select($"l_quantity", $"l_discount", $"l_extendedprice", $"l_tax")
      .as[(Double, Double, Double, Double)].collect().toSeq
      .map { case (q, d, p, t) =>
        (math.round(q), math.round(d * 100), math.round(p), math.round(t * 100)) }
    val want = Map(
      "qty_discount"   -> rows.map(r => (r._1, r._2)),
      "qty_price"      -> rows.map(r => (r._1, r._3)),
      "discount_price" -> rows.map(r => (r._2, r._3)),
      "discount_tax"   -> rows.map(r => (r._2, r._4))
    ).view.mapValues { xs =>
      (BigInt(xs.size), xs.map(p => BigInt(p._1)).sum, xs.map(p => BigInt(p._2)).sum,
        xs.map(p => BigInt(p._1) * p._2).sum, xs.map(p => BigInt(p._1) * p._1).sum,
        xs.map(p => BigInt(p._2) * p._2).sum)
    }.toMap
    val df = Forecast.corrMoments(spark, sf)
    // the moment sums aggregate in decimal(38,0) (the unconditional 100 TB
    // promotion) but PUBLISH as the digit string — decimal rendering is
    // engine-dependent, the digit string is not (round-9 gate fix)
    Seq("sum_x", "sum_y", "sum_xy", "sum_xx", "sum_yy").foreach { c =>
      assert(df.schema(c).dataType ==
        org.apache.spark.sql.types.StringType, c)
    }
    val got = df.select($"pair", $"n_rows", $"sum_x".cast("string"),
        $"sum_y".cast("string"), $"sum_xy".cast("string"),
        $"sum_xx".cast("string"), $"sum_yy".cast("string"))
      .as[(String, Long, String, String, String, String, String)].collect()
    assert(got.length == want.size)
    got.foreach { case (pair, n, sx, sy, sxy, sxx, syy) =>
      assert((BigInt(n), BigInt(sx), BigInt(sy), BigInt(sxy), BigInt(sxx),
        BigInt(syy)) == want(pair), s"pair $pair")
    }
    // moments reconstruct a sane Pearson r² ∈ [0, 1] for every pair
    got.foreach { case (pair, _, _, _, _, _, _) => assert(want.contains(pair)) }
    want.foreach { case (pair, (n, sx, sy, sxy, sxx, syy)) =>
      val num = (n * sxy - sx * sy).pow(2)
      val den = (n * sxx - sx * sx) * (n * syy - sy * sy)
      assert(den > 0 && num <= den, s"pair $pair r² bound")
    }
  }

  test("forecastDuel (x215): paired win/loss/tie counts match a driver replay") {
    val brandByPart = graft.Tables.part(spark, sf)
      .select($"p_partkey", $"p_brand").as[(Long, String)].collect().toMap
    val daily = graft.Tables.lineitem(spark, sf)
      .select($"l_partkey", expr("unix_timestamp(l_shipdate) div 86400"),
        Relational.cents($"l_extendedprice"))
      .as[(Long, Long, Long)].collect()
      .groupBy(r => (brandByPart(r._1), r._2))
      .view.mapValues(_.map(_._3).sum).toMap
    val minDay = daily.keys.map(_._2).min
    val want = daily.keys.toSeq.filter(_._2 >= minDay + Forecast.SeasonalLagDays)
      .map { case (b, d) =>
        val rev = daily((b, d))
        val e7 = math.abs(rev - daily.getOrElse((b, d - Forecast.SeasonalLagDays), 0L))
        val e1 = math.abs(rev - daily.getOrElse((b, d - Forecast.DuelChallengerLag), 0L))
        (b, e7, e1)
      }.groupBy(_._1).view.mapValues { es =>
        (es.size.toLong, es.map(_._2).sum, es.map(_._3).sum,
          es.count(e => e._2 < e._3).toLong, es.count(e => e._3 < e._2).toLong,
          es.count(e => e._2 == e._3).toLong)
      }.toMap
    val got = Forecast.forecastDuel(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { case (b, n, s7, s1, w7, w1, t) =>
      assert(want(b) == ((n, s7, s1, w7, w1, t)), s"brand $b")
      assert(w7 + w1 + t == n, s"brand $b partition")
    }
  }

  test("dowAnomalies (x186): scaled-integer median/MAD per (brand, dow) matches a replay") {
    def med2(xs: Seq[Long]): Long = {
      val s = xs.sorted
      if (s.size % 2 == 1) 2 * s(s.size / 2)
      else s(s.size / 2 - 1) + s(s.size / 2)
    }
    val daily = facts.groupBy(f => (f._1, f._2)).view
      .mapValues(_.map(_._3).sum).toMap // (brand, day) -> cents
    val byCell = daily.toSeq.groupBy { case ((b, d), _) => (b, (d + 4) % 7) }
    val want = byCell.flatMap { case ((b, dow), rows) =>
      val m2 = med2(rows.map(_._2))
      val devs = rows.map { case ((_, d), c) => (d, c, math.abs(2 * c - m2)) }
      val m4 = med2(devs.map(_._3))
      devs.map { case (d, c, dev2) =>
        (b, d) -> ((dow, c, m2, m4, if (2 * dev2 > 3 * m4) 1 else 0))
      }
    }
    val got = Forecast.dowAnomalies(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Int)].collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { case (b, d, dow, c, m2, m4, flag) =>
      assert((dow, c, m2, m4, flag) == want((b, d)), s"($b, $d)")
    }
    // seasonality conditioning is active: at least one cell's med2 differs
    // from the brand's overall doubled median
    val overall = daily.toSeq.groupBy(_._1._1).view
      .mapValues(rows => med2(rows.map(_._2))).toMap
    assert(byCell.exists { case ((b, _), rows) => med2(rows.map(_._2)) != overall(b) })
  }

  test("kendallTau (x176): concordance counts match an exhaustive driver replay") {
    import org.apache.spark.sql.functions.unix_timestamp
    val nationRegion = graft.Tables.nation(spark, sf)
      .select($"n_nationkey", $"n_regionkey").as[(Long, Long)].collect().toMap
    val regionName = graft.Tables.region(spark, sf)
      .select($"r_regionkey", $"r_name").as[(Long, String)].collect().toMap
    val custRegion = graft.Tables.customer(spark, sf)
      .select($"c_custkey", $"c_nationkey").as[(Long, Long)].collect().toMap
      .view.mapValues(nk => regionName(nationRegion(nk))).toMap
    val weekly = graft.Tables.orders(spark, sf)
      .select($"o_custkey", unix_timestamp($"o_orderdate"), $"o_totalprice")
      .as[(Long, Long, Double)].collect().toSeq
      .map { case (ck, ts, tp) =>
        ((custRegion(ck), ts / 86400 / 7), math.round(tp * 100)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val regions = weekly.keys.map(_._1).toSeq.distinct.sorted
    val got = Forecast.kendallTau(spark, sf)
      .as[(String, String, Long, Long, Long, Long, Long, Long, Long, Long, Double)]
      .collect().map(r => ((r._1, r._2), r)).toMap
    val pairsSeen = for {
      r1 <- regions; r2 <- regions if r1 < r2
      w1 = weekly.collect { case ((r, w), c) if r == r1 => (w, c) }.toMap
      w2 = weekly.collect { case ((r, w), c) if r == r2 => (w, c) }.toMap
      shared = (w1.keySet & w2.keySet).toSeq.sorted
      if shared.nonEmpty
    } yield {
      val pairs = shared.combinations(2).toSeq
      val signs = pairs.map { case Seq(wa, wb) =>
        (math.signum(w1(wb) - w1(wa)), math.signum(w2(wb) - w2(wa))) }
      val conc = signs.count { case (a, b) => a * b == 1 }
      val disc = signs.count { case (a, b) => a * b == -1 }
      val tieX = signs.count { case (a, b) => a == 0 && b != 0 }
      val tieY = signs.count { case (a, b) => b == 0 && a != 0 }
      val tieB = signs.count { case (a, b) => a == 0 && b == 0 }
      val g = got((r1, r2))
      assert(g._3 == shared.size.toLong && g._4 == pairs.size.toLong,
        s"($r1,$r2) sizes")
      assert((g._5, g._6, g._7, g._8, g._9) ==
        ((conc.toLong, disc.toLong, tieX.toLong, tieY.toLong, tieB.toLong)),
        s"($r1,$r2) counts")
      assert(g._10 == (conc - disc).toLong &&
        g._11 == (conc - disc).toDouble / pairs.size, s"($r1,$r2) tau")
      (r1, r2)
    }
    assert(got.keySet == pairsSeen.toSet && got.nonEmpty)
  }
}
