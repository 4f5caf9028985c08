package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.KmvSketch.kmv_sketch
import graft.operators.Dedup

class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  test("below k distinct inputs the sketch is exhaustive and exact") {
    val df = Seq.tabulate(100)(i => s"tok${i % 40}").toDF("w") // 40 distinct
      .select(Dedup.md5Hash60($"w").as("h"))
    val r = df.agg(kmv_sketch($"h", 256).as("sk")).select($"sk.*").head()
    assert(r.getInt(0) == 40)
    assert(r.getDouble(2) == 40.0)
  }

  test("estimate is within 25% of the true cardinality at n >> k") {
    val n = 20000
    val df = (0 until n).map(i => s"token$i").toDF("w")
      .select(Dedup.md5Hash60($"w").as("h"))
    val est = df.agg(kmv_sketch($"h", 256).as("sk")).select($"sk.est_distinct")
      .as[Double].head()
    assert(math.abs(est - n) / n < 0.25, s"est=$est true=$n")
  }

  test("sketch is merge-invariant: identical result at any partitioning") {
    val df = (0 until 5000).map(i => s"w${i % 3000}").toDF("w")
      .select(Dedup.md5Hash60($"w").as("h"))
    def run(parts: Int) =
      df.repartition(parts).agg(kmv_sketch($"h", 128).as("sk"))
        .select($"sk.n_kept", $"sk.kth_hash", $"sk.est_distinct")
        .as[(Int, Long, Double)].head()
    assert(run(1) == run(8)) // partial sketches merge losslessly
  }

  test("value sample keeps payloads of the k min hashes, merge-invariant, min-per-hash on ties") {
    import graft.functions.KmvValueSample.kmv_value_sample
    val rows = (0 until 2000).map(i => (s"key${i % 500}", (i % 97).toLong)) // hash ties exist
    val df = rows.toDF("kcol", "v")
      .select(Dedup.md5Hash60($"kcol").as("h"), $"v")
    def run(parts: Int): Seq[Long] =
      df.repartition(parts).agg(kmv_value_sample($"h", $"v", 32).as("s"))
        .select($"s").as[Seq[Long]].head()
    val a = run(1)
    assert(a == run(16)) // deterministic under any partitioning/merge order
    assert(a.length == 32 && a == a.sorted)
    // driver-side reference: min payload per hash, 32 smallest hashes
    val ref = rows.groupBy(_._1).map { case (kc, vs) =>
      (graft.operators.Dedup.md5Hash60Ref(kc), vs.map(_._2).min)
    }.toSeq.sortBy(_._1).take(32).map(_._2).sorted
    assert(a == ref)
  }

  test("pair sketch selects exactly the (h, tie) window order, hash collisions included") {
    import graft.functions.KmvPairSketch.kmv_pair_sketch
    // forced collisions: hash space of 5 values over 200 rows, unique tie ids
    val rows = (0L until 200L).map(i => (i % 5, i))
    val df = rows.toDF("h", "id")
    def run(parts: Int) =
      df.repartition(parts).agg(kmv_pair_sketch($"h", $"id", 7).as("sk"))
        .select($"sk.n_kept", $"sk.kth_hash", $"sk.kth_tie")
        .as[(Int, Long, Long)].head()
    val (n, kth, ktie) = run(1)
    assert(run(16) == ((n, kth, ktie))) // merge-invariant
    val refKth = rows.sortBy(identity).apply(6) // 7th smallest (h, id) pair
    assert(n == 7 && (kth, ktie) == refKth)
    // the selection filter admits exactly k rows — the window-equivalence
    // that motivates the pair key (a plain hash sketch would admit k+extra
    // on collision)
    val kept = rows.filter { case (h, id) => h < kth || (h == kth && id <= ktie) }
    assert(kept.size == 7 && kept.toSet == rows.sortBy(identity).take(7).toSet)
  }

  test("null hashes are ignored; empty input yields null sketch") {
    val withNulls = Seq(Some("a"), None, Some("b"), None).toDF("w")
      .select(when($"w".isNotNull, Dedup.md5Hash60($"w")).as("h"))
    val r = withNulls.agg(kmv_sketch($"h", 16).as("sk")).select($"sk.n_kept").head()
    assert(r.getInt(0) == 2)
    val empty = Seq.empty[Long].toDF("h").agg(kmv_sketch($"h", 16).as("sk"))
      .select($"sk").head()
    assert(empty.isNullAt(0))
  }
}
