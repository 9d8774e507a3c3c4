package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph computation on DataFrames — the Pregel-as-relational
  * pattern: one equi-join (ranks onto edges by source) plus one grouped
  * aggregate (contributions by destination) per superstep. Nothing ever
  * lives on the driver; each iteration's state is a (node, rank) frame
  * partitioned by the join key, so the cost per superstep is one edge
  * shuffle — the same unit GraphX/Pregel pays — and the edge frame is
  * checkpointed once and reused by every iteration (no rescans, no
  * exponential plan growth).
  */
object Graph {

  /** Damped PageRank, fixed iteration count.
    *
    * Determinism contract (the cross-engine replay convention used by
    * every aggregate in this repo): per-edge contributions are doubles
    * rounded to `contribScale`, summed EXACTLY as DECIMAL(38,12) (decimal
    * addition is associative, so Spark's arbitrary aggregation order
    * cannot produce ulp drift), and the new rank is re-rounded to
    * `rankScale`. Both engines iterate the identical rounded system, so
    * five supersteps stay hash-identical.
    *
    * `edges` must be DIRECTED (src, dst) pairs, pre-deduplicated; every
    * node is expected to appear as a source (true for any symmetrized
    * graph — the caller unions both directions, as g1 does with the
    * bipartite customer↔supplier graph), which keeps the dangling-mass
    * term zero and every rank row reachable.
    *
    * `broadcastRanks` (default true): the rank state is |nodes|-sized —
    * orders of magnitude below |edges| on real graphs — and the
    * checkpoint that cuts each superstep's lineage also erases size
    * stats, so Catalyst would otherwise plan a sort-merge join that
    * re-shuffles the EDGE side every superstep. Broadcasting the state
    * keeps edges streaming from their checkpoint with zero per-superstep
    * edge movement; the only shuffle left is the map-side-combined
    * contribution aggregate (|nodes| rows out). Set it false when the
    * node set itself exceeds broadcast budget (~100M+ nodes) — the same
    * bounded-broadcast contract e8 documents for its query side.
    */
  def pageRank(
      edges: DataFrame, iterations: Int, damping: Double = 0.85,
      contribScale: Int = 12, rankScale: Int = 9,
      broadcastRanks: Boolean = true): DataFrame = {
    require(iterations >= 1, "need at least one iteration")
    // one materialization serves every superstep: edge list + out-degree
    val e = edges.select(col("src"), col("dst")).localCheckpoint(eager = false)
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val ewd = e.join(deg, Seq("src")).localCheckpoint(eager = false)
    // bounded 1-row node count rides a broadcast — N never touches the driver
    val nRow = e.select(col("src")).distinct().agg(count(lit(1)).as("n"))
    var ranks = e.select(col("src")).distinct()
      .crossJoin(broadcast(nRow))
      .select(col("src"), (lit(1.0) / col("n")).as("rank"), col("n"))
    for (k <- 1 to iterations) {
      val next = ewd
        .join(if (broadcastRanks) broadcast(ranks) else ranks, Seq("src"))
        .select(col("dst"),
          round(col("rank") / col("outdeg"), contribScale)
            .cast("decimal(38,12)").as("contrib"),
          col("n"))
        .groupBy(col("dst"), col("n"))
        .agg(sum(col("contrib")).as("csum"))
        .select(col("dst").as("src"),
          round(lit(1.0 - damping) / col("n")
            + lit(damping) * col("csum").cast("double"), rankScale).as("rank"),
          col("n"))
      // barrier BETWEEN supersteps keeps plans linear; the final state
      // is consumed once downstream, so it needs no materialization
      ranks = if (k < iterations) next.localCheckpoint(eager = false) else next
    }
    ranks.select(col("src").as("node"), col("rank"))
  }
}
