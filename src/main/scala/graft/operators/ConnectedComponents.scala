package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — the clustering
  * engine under near-duplicate grouping (x17) and any other
  * entity-resolution step.
  *
  * Algorithm: alternating large-star / small-star rounds (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14): each round is
  * two grouped aggregates + joins, and the edge structure contracts toward
  * stars centered on each component's minimum node in O(log n) rounds on
  * ANY graph shape — unlike min-label propagation, whose round count is the
  * component DIAMETER (a 10⁶-node chain needs 10⁶ propagation rounds but
  * only ~20 star rounds). That is the property that matters at 100 TB,
  * where a single pathological chain component would otherwise stall the
  * whole job. Each round shuffles only the (shrinking) edge list on node
  * id; `localCheckpoint` truncates lineage so round N+1 never recomputes
  * round N.
  */
object ConnectedComponents {

  /** One star round. Edges arrive directed (child, parent) with
    * parent ≤ child but are treated as undirected: neighbor sets come from
    * both directions. For each node u with m = min(Γ(u) ∪ {u}):
    * large-star links every LARGER neighbor to m (long-range contraction),
    * small-star links every not-larger neighbor (and u itself) to m
    * (local cleanup into a star). Both preserve connectivity and never
    * emit self-loops. */
  private def starRound(edges: DataFrame, large: Boolean): DataFrame = {
    val nbr = edges.select(col("u"), col("v"))
      .union(edges.select(col("v").as("u"), col("u").as("v")))
    val mins = nbr.groupBy("u")
      .agg(min(col("v")).as("mn"))
      .select(col("u"), least(col("mn"), col("u")).as("m"))
    val joined = nbr.join(mins, Seq("u"))
    val out =
      if (large)
        joined.filter(col("v") > col("u"))
          .select(col("v").as("u"), col("m").as("v"))
      else
        joined.filter(col("v") <= col("u"))
          .select(col("v").as("u"), col("m").as("v"))
          .union(mins.select(col("u"), col("m").as("v")))
    // dedup only after the small-star half: the large-star intermediate may
    // carry duplicate edges, but small-star's min-aggregate is insensitive
    // to them, and skipping the interim distinct saves a shuffle per round
    val noLoops = out.filter(col("u") =!= col("v"))
    if (large) noLoops else noLoops.distinct()
  }

  /** Labels every node that appears in `edges` (undirected pairs, any
    * orientation) with its component's minimum node id. Output:
    * (node, component). Nodes with no edges are absent — callers treat
    * them as their own singleton component. */
  def components(edgesIn: DataFrame, maxRounds: Int = 25): DataFrame = {
    var edges = edgesIn.toDF("u", "v")
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .filter(col("u") =!= col("v")).distinct()
      .localCheckpoint()
    var signature = edgeSignature(edges)
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      val next = starRound(starRound(edges, large = true), large = false)
        .localCheckpoint()
      val nextSig = edgeSignature(next)
      // the per-round test stays the O(1)-state hash fingerprint; when it
      // first reports a fixed point, CONFIRM with one exact set-equality
      // check so a (count, xor-hash) collision between two different edge
      // sets can never silently bypass the convergence guard. Both sides
      // are distinct sets with equal counts (counts are part of the
      // signature), so one-directional emptiness of the anti-join is full
      // set equality. Runs once per call, not once per round.
      converged = nextSig == signature &&
        edges.join(next, Seq("u", "v"), "left_anti").isEmpty
      releaseCheckpoint(edges) // `next` is materialized; drop the old blocks
      edges = next
      signature = nextSig
      round += 1
    }
    // the star-forest extraction below is only valid at the fixed point —
    // a silent exit here would hand one component several labels
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge within $maxRounds rounds " +
          s"(${signature._1} edges remain); raise maxRounds")
    // at convergence the edge list is a star forest (child → component min);
    // centers appear only on the v side and label themselves
    val childLabels = edges.groupBy(col("u")).agg(min(col("v")).as("component"))
    val centers = edges.select(col("v").as("u")).distinct()
      .join(childLabels, Seq("u"), "left_anti")
      .withColumn("component", col("u"))
    childLabels.union(centers).toDF("node", "component")
  }

  /** Drops a superseded localCheckpoint's persisted blocks. Each round
    * rebinds `edges`; without this, up to maxRounds cached snapshots of the
    * edge list would sit in executor storage until the context's GC-driven
    * cleaner got to them. Safe because the caller only releases a
    * checkpoint AFTER its successor is eagerly materialized. */
  private def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(blocking = false)
      case _ => () // not a checkpoint-backed plan (e.g. first-round input)
    }

  /** Order-insensitive fingerprint of the edge set — the per-round
    * convergence test. (count, bit_xor of per-edge hashes): equal sets ⇒
    * equal signature. The converse can fail (two different sets with equal
    * count and colliding xor), which is why `components` confirms the FIRST
    * signature match with an exact anti-join before trusting it — the hash
    * keeps the per-round cost at one tiny aggregate (the same count() any
    * loop condition pays) while the one-shot exact check removes the
    * collision exposure entirely. */
  private def edgeSignature(edges: DataFrame): (Long, Long) = {
    val r = edges.select(xxhash64(col("u"), col("v")).as("h"))
      .agg(count(lit(1)).as("n"), expr("bit_xor(h)").as("x")).head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }
}
