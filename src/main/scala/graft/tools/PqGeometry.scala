package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.ProductQuant

/** PQ pricing at production geometry (round-16, VERDICT tasks 2 + 7):
  * the gate geometry (M=4, K=8) proves the machinery; this tool prices
  * what a deployment actually runs —
  *
  *  1. TRAIN before/after: integer-Lloyd codebook fit at M=8, K=64,
  *     5 iters with and without the r16 `localCheckpoint` of the
  *     training frame (the verdict-task-2 BenchOne line).
  *  2. FRONTIER: recall@k of `ivfPqTopK` against the exact integer-L2
  *     top-k, with wall time of the query path (fit excluded, min of 2),
  *     swept over geometry {gate M=4·K=8, production M=8·K=256} ×
  *     nProbe {1, 2, 4} of 8 cells — the recall/latency frontier a
  *     deployment decision reads (RECALL.md).
  *
  * Usage: runMain graft.tools.PqGeometry [sfDir] [qHi] [k]
  */
object PqGeometry {

  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val qHi = if (args.length > 1) args(1).toInt else 32
    val k = if (args.length > 2) args(2).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }

    // 1. train pricing, M=8 K=64 5 iters, persist off vs on (min of 2)
    for (persist <- Seq(false, true)) {
      val times = (1 to 2).map { _ =>
        timed(ProductQuant.trainCodebookUncached(spark, dir, 8, 8, 64, 5,
          persist = persist))._2
      }
      println(f"PQTRAIN m8_k64_iter5 persist=$persist ${times.min}%.2f s")
    }

    // 2. recall/latency frontier — truth set from the SHARED exact
    // ranking (ProductQuant.exactIntTopK, the x273 definition)
    val exact = ProductQuant.exactIntTopK(spark, dir, qHi, k)
      .select(col("q_id"), col("vec_id")).localCheckpoint()
    val nExact = exact.count()
    for ((label, m, sd, codes) <- Seq(("gate_m4_k8", 4, 16, 8),
                                      ("gated_prod_m8_k64", 8, 8, 64), // x283/x284's oracle-checked shape
                                      ("prod_m8_k256", 8, 8, 256));
         nProbe <- Seq(1, 2, 4)) {
      // fit outside the timer (frozen model state, the x272 contract)
      ProductQuant.trainCodebook(spark, dir, m, sd, codes, ProductQuant.PqIters)
      ProductQuant.trainCodebook(spark, dir, 1, m * sd, ProductQuant.IvfPqCells,
        ProductQuant.PqIters)
      def run() = ProductQuant.ivfPqTopK(spark, dir, qHi = qHi, k = k,
        nProbe = nProbe, subspaces = m, subDim = sd, codes = codes)
      // the second timed run MATERIALIZES (eager localCheckpoint on a
      // Q·k-row result — negligible vs the scan) so the recall join
      // reuses it instead of paying a third full execution (r16 review)
      val t1 = timed(run().count())._2
      val (last, t2) = timed(run().localCheckpoint())
      val hits = last.join(exact, Seq("q_id", "vec_id"), "left_semi").count()
      println(f"PQFRONTIER $label nprobe=$nProbe recall@$k=${hits.toDouble / nExact}%.3f " +
        f"query=${math.min(t1, t2)}%.2f s")
    }
    spark.stop()
  }
}
