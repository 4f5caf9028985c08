package graft.operators

import graft.SparkSpec

/** r16 sweep (r15 verdict task 3): the shipping ANN/PQ rankings moved
  * from rank windows to the bounded TopKLongPairs aggregate
  * (`Similarity.topKByCosine`, x276's form). These specs pin the swap's
  * contract per converted site: output BIT-IDENTICAL to the window twin
  * (same trunc6 grid doubles, same ranks), and the default plan carries
  * the ObjectHashAggregate pair instead of a corpus-sized Window. Sites
  * that keep their window (x79 label carry, x175 full-rank semantics,
  * x202/x238 composite keys, x60 off-grid projected cosine) document the
  * reason in code. */
class TopKSweepSpec extends SparkSpec {

  val sf = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double, Int)] = {
    import spark.implicits._
    df.as[(Long, Long, Double, Int)].collect().toSet
  }

  private def assertAggPlan(df: org.apache.spark.sql.DataFrame,
                            boundedWindowsAllowed: Int = 0): Unit = {
    val plan = df.queryExecution.executedPlan.toString
    // "Window [" matches only WindowExec nodes (WindowGroupLimit prints
    // as "WindowGroupLimit [" — no space before its bracket)
    val windows = "Window \\[".r.findAllIn(plan).size
    assert(plan.contains("ObjectHashAggregate"),
      s"expected the TypedImperativeAggregate pair:\n${plan.take(1200)}")
    assert(windows <= boundedWindowsAllowed,
      s"expected ≤$boundedWindowsAllowed bounded Window nodes, found $windows:\n${plan.take(1200)}")
  }

  test("bruteForceTopK (x09): aggregate form bit-identical to the window twin, Window-free plan") {
    val agg = rows(Similarity.bruteForceTopK(spark, sf, qLo = 0, qHi = 6, k = 4))
    val win = rows(Similarity.bruteForceTopK(spark, sf, qLo = 0, qHi = 6, k = 4,
      window = true))
    assert(agg == win && agg.nonEmpty)
    assertAggPlan(Similarity.bruteForceTopK(spark, sf, qLo = 0, qHi = 6, k = 4))
  }

  test("lshTopK (x10): aggregate form bit-identical to the window twin, Window-free plan") {
    val agg = rows(Similarity.lshTopK(spark, sf, qLo = 10, qHi = 16, k = 5))
    val win = rows(Similarity.lshTopK(spark, sf, qLo = 10, qHi = 16, k = 5,
      window = true))
    assert(agg == win && agg.nonEmpty)
    assertAggPlan(Similarity.lshTopK(spark, sf, qLo = 10, qHi = 16, k = 5))
  }

  test("ivfTopK (x18): aggregate candidate ranking bit-identical; only the cell-bounded probe window remains") {
    val agg = rows(Similarity.ivfTopK(spark, sf))
    val win = rows(Similarity.ivfTopK(spark, sf, window = true))
    assert(agg == win && agg.nonEmpty)
    // the probe window (queries × nCentroids, bounded by the cell count)
    // is the one Window the default plan may keep
    assertAggPlan(Similarity.ivfTopK(spark, sf), boundedWindowsAllowed = 1)
  }

  test("computeRankedTopK (KnnStage/x203 unit): aggregate form bit-identical on the full pair frame") {
    import org.apache.spark.sql.functions.col
    val emb = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), Similarity.asDouble(col("embedding")).as("v"))
    val agg = rows(Similarity.computeRankedTopK(emb, 5))
    val win = rows(Similarity.computeRankedTopK(emb, 5, window = true))
    assert(agg == win && agg.nonEmpty)
    assertAggPlan(Similarity.computeRankedTopK(emb, 5))
  }

  test("topKByCosine onGrid (mergeRanked's key): round-keyed aggregate bit-identical to the window twin") {
    import org.apache.spark.sql.functions.col
    // already-truncated inputs — the mergeRanked union shape, where
    // re-flooring could step a grid double down one ulp; round must not
    val emb = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), Similarity.asDouble(col("embedding")).as("v"))
    val base = Similarity.computeRankedTopK(emb, 7)
      .select(col("q_id"), col("vec_id"), col("cos_sim").as("cos_raw"))
    val agg = rows(Similarity.topKByCosine(base, 3, onGrid = true))
    val win = rows(Similarity.topKByCosine(base, 3, onGrid = true, window = true))
    assert(agg == win && agg.nonEmpty)
  }

  test("ivfPqTopK (x274): aggregate final ranking bit-identical; only the nCells-bounded probe window remains") {
    import spark.implicits._
    def r(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Long, Int)].collect().toSet
    val agg = r(ProductQuant.ivfPqTopK(spark, sf))
    val win = r(ProductQuant.ivfPqTopK(spark, sf, window = true))
    assert(agg == win && agg.nonEmpty)
    val plan = ProductQuant.ivfPqTopK(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan.take(1200))
  }
}
