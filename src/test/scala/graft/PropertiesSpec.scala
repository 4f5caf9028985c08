package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.operators.Sampling

/** Property-based checks (scalacheck) for the integer-exact identities the
  * operators are DERIVED from. The per-operator specs prove "Spark plan ==
  * driver replay on this corpus"; these prove the underlying algebra on
  * arbitrary inputs, so a future refactor can't silently break the math the
  * replays share with the plans:
  *
  *  - the tie-group rank identity behind x156's Gini and x161's midrank sum
  *  - Hamilton apportionment's exact-sum + quota properties behind x157
  *  - the recursive `exclusivePrefixSum` (x37/x120/x155/x156/x167 ranks)
  *    against the naive prefix, INCLUDING forced multi-level recursion
  */
class PropertiesSpec extends SparkSpec {

  private def check(p: Prop, n: Int = 200): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  test("tie-group identity: Σ v·cnt·(2o+cnt+1) = 2·Σ rankᵢ·xᵢ for every multiset") {
    val gen = Gen.nonEmptyListOf(Gen.chooseNum(0L, 50L))
    check(Prop.forAll(gen) { xs =>
      // per-row side: ascending ranks 1..n, ties in any order (invariant)
      val perRow = 2 * xs.sorted.zipWithIndex.map { case (v, i) => BigInt(v) * (i + 1) }.sum
      // group side: the x156/x161 fold over the (value → count) aggregate
      val groups = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val grouped = groups.map { case (v, cnt) =>
        val o = xs.count(_ < v).toLong
        BigInt(v) * cnt * (2 * o + cnt + 1)
      }.sum
      perRow == grouped
    })
  }

  test("Hamilton apportionment: allocations sum to the budget exactly and satisfy quota") {
    val gen = for {
      budget <- Gen.chooseNum(1L, 100000L)
      masses <- Gen.nonEmptyListOf(Gen.chooseNum(1L, 1000L))
    } yield (budget, masses)
    check(Prop.forAll(gen) { case (budget, masses) =>
      val n = masses.sum
      val quotas = masses.zipWithIndex.map { case (m, i) =>
        val qn = BigInt(m) * budget
        (i, (qn / n).toLong, (qn % n).toLong)
      }
      val leftover = budget - quotas.map(_._2).sum
      val bonus = quotas.sortBy { case (i, _, r) => (-r, i) }
        .take(leftover.toInt).map(_._1).toSet
      val alloc = quotas.map { case (i, b, _) => b + (if (bonus(i)) 1L else 0L) }
      val sumsExactly = alloc.sum == budget
      // quota property: every allocation is floor or ceil of the exact share
      val quota = alloc.zip(masses).forall { case (a, m) =>
        val lo = (BigInt(m) * budget / n).toLong
        a == lo || a == lo + 1
      }
      val leftoverBounded = leftover >= 0 && leftover < masses.size
      sumsExactly && quota && leftoverBounded
    })
  }

  test("exclusivePrefixSum ≡ naive prefix on arbitrary keyed counts, including forced recursion") {
    val spark2 = spark; import spark2.implicits._
    val gen = for {
      n <- Gen.chooseNum(1, 30)
      keys <- Gen.listOfN(n, Gen.chooseNum(-100L, 100L))
      vs <- Gen.listOfN(n, Gen.chooseNum(0L, 20L))
    } yield keys.zip(vs)
    check(Prop.forAll(gen) { pairs =>
      val byKey = pairs.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      val df = byKey.toSeq.toDF("key", "v")
      // force the multi-level path: every level > 2 rows recurses at fanout 4
      val got = Sampling.exclusivePrefixSum(df, fanout = 4L, maxWindowRows = 2L)
        .as[(Long, Long)].collect().toMap
      val want = byKey.keys.map { k =>
        k -> byKey.collect { case (k2, v) if k2 < k => v }.sum
      }.toMap
      got == want
    }, n = 25)
  }

  test("prefix-filter guarantee (x201): prefix-token candidates lose NO pair with Jaccard ≥ τ") {
    // arbitrary small universes; τ = 1/2 as in the operator
    val setGen = Gen.nonEmptyListOf(Gen.chooseNum(0, 30)).map(_.toSet)
    val gen = Gen.listOfN(8, setGen)
    check(Prop.forAll(gen) { sets =>
      val dfOf = sets.flatten.groupBy(identity).view.mapValues(_.size).toMap
      def prefix(s: Set[Int]): Set[Int] = {
        val sorted = s.toSeq.sortBy(t => (dfOf(t), t))
        val pLen = s.size - ((500000L * s.size + 999999) / 1000000).toInt + 1
        sorted.take(pLen).toSet
      }
      (for { i <- sets.indices; j <- (i + 1) until sets.size } yield (i, j))
        .forall { case (i, j) =>
          val (a, b) = (sets(i), sets(j))
          val inter = (a & b).size.toLong
          val union = a.size + b.size - inter
          val qualifies = 1000000L * inter >= 500000L * union
          // every qualifying pair MUST share a prefix token (no false negatives)
          !qualifies || (prefix(a) & prefix(b)).nonEmpty
        }
    }, n = 300)
  }

  test("ring successor (x218): assignment is the clockwise successor; churn only to the new node") {
    val gen = for {
      h <- Gen.chooseNum(0L, (1L << 60) - 1)
      ring <- Gen.nonEmptyListOf(Gen.zip(Gen.chooseNum(0L, 7L), Gen.chooseNum(0L, (1L << 60) - 1)))
      extra <- Gen.nonEmptyListOf(Gen.chooseNum(0L, (1L << 60) - 1))
    } yield (h, ring.distinct, extra.distinct)
    val mod = 1L << 60
    def assign(h: Long, entries: Seq[(Long, Long)]): Long =
      entries.map { case (n, p) => (((p - h) % mod + mod) % mod, n) }.min._2
    check(Prop.forAll(gen) { case (h, ring, extra) =>
      val grown = ring ++ extra.map(p => (8L, p))
      val (before, after) = (assign(h, ring), assign(h, grown))
      // minimal disruption: an assignment either stays or moves to the NEW node
      after == before || after == 8L
    })
  }

  test("HLL registers (x193/x199): max-merge makes any partition of the stream agree") {
    val itemGen = Gen.listOf(Gen.chooseNum(0L, 500L))
    val gen = Gen.zip(itemGen, itemGen)
    def regs(items: Seq[Long]): Map[Long, Long] =
      items.map { i =>
        val h = operators.Dedup.md5Hash60Ref(s"hll:$i")
        val (b, rest) = (h % 16, h / 16)
        b -> (if (rest == 0L) 57L else java.lang.Long.numberOfTrailingZeros(rest) + 1L)
      }.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    check(Prop.forAll(gen) { case (xs, ys) =>
      val merged = (regs(xs).toSeq ++ regs(ys).toSeq)
        .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      merged == regs(xs ++ ys)
    })
  }
}
