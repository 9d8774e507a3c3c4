package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph computation on DataFrames — the Pregel-as-relational
  * pattern: one equi-join (ranks onto edges by source) plus one grouped
  * aggregate (contributions by destination) per superstep. All bulk
  * state (edges, contributions, ranks) lives in executors, partitioned
  * by the join key; the per-superstep cost is one edge-sized probe plus
  * one |nodes|-sized aggregate — the unit GraphX/Pregel pays — and the
  * edge frame is checkpointed once and reused by every iteration (no
  * rescans, no exponential plan growth). The one deliberate driver
  * touch-point is the rank-state broadcast (see `broadcastRanks`).
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
    * `edges` must be DIRECTED (src, dst) pairs, pre-deduplicated. The
    * node set is taken from the SOURCE side and is CLOSED: contributions
    * to a destination that never appears as a source are dropped (a
    * semi-join against the node set — that mass leaves the ranked set,
    * exactly like links pointing outside a crawled subgraph), and such
    * destinations are never ranked. Consequently rank mass is conserved
    * iff every destination is also a source — true for any symmetrized
    * graph, as g1's bipartite customer↔supplier union is (and asserted
    * as a property in GraphPropsSpec). Nodes with no IN-edges are
    * retained at the teleport-only rank (1−d)/n each superstep: every
    * superstep unions a zero contribution per node into the aggregate,
    * so the state's node set is invariant across supersteps.
    *
    * `broadcastRanks` (default true): the rank state is |nodes|-sized —
    * orders of magnitude below |edges| on real graphs — and the
    * checkpoint that cuts each superstep's lineage also erases size
    * stats, so Catalyst would otherwise plan a sort-merge join that
    * re-shuffles the EDGE side every superstep. Broadcasting the state
    * keeps edges streaming from their checkpoint with zero per-superstep
    * edge movement; the only shuffle left is the map-side-combined
    * contribution aggregate (|nodes| rows out). The cost: each
    * superstep's broadcast BUILD collects the |nodes|-row state to the
    * driver — bounded and explicit, the e8 bounded-broadcast contract.
    * Set it false when the node set exceeds broadcast/driver budget
    * (~100M+ nodes) — the shuffle join keeps the driver out entirely,
    * and pre-bucketing edges by src is then the zero-edge-movement
    * layout.
    *
    * `weightCol`: optional LONG edge weight — contributions become
    * rank·w/Σw instead of rank/outdeg (weighted PageRank, e.g. trading
    * volume as influence). Weights must be POSITIVE: non-positive-weight
    * edges are dropped before the graph is formed (a zero weight carries
    * no mass anyway, and a source whose every weight is zero would
    * otherwise divide 0/0 into NaN and throw under ANSI decimal casts —
    * dropping its edges removes the node from the graph instead, the
    * documented contract). With no weight every edge carries weight 1,
    * which reproduces the unweighted arithmetic EXACTLY (x·1.0 ≡ x in
    * IEEE and Σ1 ≡ count), so the generalization cannot perturb
    * unweighted results. Integer weights keep the w/Σw division a
    * single double op both engines replay identically.
    */
  def pageRank(
      edges: DataFrame, iterations: Int, damping: Double = 0.85,
      contribScale: Int = 12, rankScale: Int = 9,
      broadcastRanks: Boolean = true,
      weightCol: Option[String] = None): DataFrame =
    run(edges, damping, contribScale, rankScale, broadcastRanks, weightCol)
      .ranks(iterations)

  /** A PREPARED PageRank system whose iterate prefix is computed once and
    * shared by every consumer — the shared-artifact pattern applied to
    * supersteps themselves. A fixed-count ranking ([[Run.ranks]]), a
    * convergence-stopped ranking ([[Run.converged]]) and a personalized
    * variant ([[Run.personalized]]) over the same edge frame share the
    * prepared (edge ⋈ out-weight ⋈ closed-node-set) frame, and the first
    * two share every common superstep instead of re-deriving identical
    * rounded-system states. At 100 TB that sharing is the difference
    * between k and 2k edge-sized join passes for a workload that asks
    * both "5 supersteps" and "to convergence" of one graph; the cached
    * iterates are |nodes|-sized checkpoints — bounded state, never a
    * data copy. */
  final class Run private[Graph] (
      edges: DataFrame, damping: Double, contribScale: Int, rankScale: Int,
      broadcastRanks: Boolean, weightCol: Option[String]) {
    private val (ewd, init) = prepare(edges, broadcastRanks, weightCol)
    private val nodes = init.select(col("src"))
    // states(k) = the k-th iterate of the rounded system, checkpointed;
    // states(0) = the uniform initial state
    private val states = scala.collection.mutable.ArrayBuffer[DataFrame](init)

    /** Iterates currently cached (0 = only the initial state) — lets a
      * consumer-routing test prove a query actually walked THIS run's
      * chain rather than building its own. */
    def cachedIterates: Int = synchronized { states.size - 1 }

    /** The k-th CHECKPOINTED iterate (k = 0 is the initial state),
      * computing and caching any missing prefix. */
    def iterate(k: Int): DataFrame = synchronized {
      while (states.size <= k)
        states += superstep(ewd, states.last, damping, contribScale,
          rankScale, broadcastRanks).localCheckpoint(eager = false)
      states(k)
    }

    /** Fixed-iteration ranks ([[Graph.pageRank]] semantics). The FINAL
      * superstep stays raw, off the cached prefix: the consumer's plan
      * IS one superstep (the PlanSpec g1 pin — broadcast rank state,
      * single contribution exchange), and a later deeper consumer
      * re-derives from the cached prefix rather than re-paying the
      * whole chain. */
    def ranks(iterations: Int): DataFrame = {
      require(iterations >= 1, "need at least one iteration")
      superstep(ewd, iterate(iterations - 1), damping, contribScale,
          rankScale, broadcastRanks)
        .select(col("src").as("node"), col("rank"))
    }

    /** Convergence-stopped ranks ([[Graph.pageRankConverged]]
      * semantics). Residuals are measured between consecutive CACHED
      * iterates, so a fixed-count consumer of the same run reuses every
      * superstep this stop rule examined (and vice versa). */
    def converged(maxIterations: Int, epsilon: Double): (DataFrame, Int) = {
      require(maxIterations >= 1, "need at least one iteration")
      require(epsilon > 0.0, "epsilon must be positive")
      var iters = 0
      var done = false
      while (iters < maxIterations && !done) {
        val prev = iterate(iters).select(col("src"), col("rank").as("__prev"))
        val residual = iterate(iters + 1).select(col("src"), col("rank"))
          .join(if (broadcastRanks) broadcast(prev) else prev, Seq("src"))
          .agg(sum(abs(col("rank") - col("__prev"))
            .cast("decimal(38,12)")).cast("double").as("d"))
          .head.getDouble(0)
        iters += 1
        done = residual < epsilon
      }
      (iterate(iters).select(col("src").as("node"), col("rank")), iters)
    }

    /** Personalized ranks ([[Graph.personalizedPageRank]] semantics)
      * over the shared prepared frames. Teleport states are
      * seed-dependent, so they cannot share iterates with the uniform
      * system — only the prepared edge frame and node set. */
    def personalized(seeds: DataFrame, iterations: Int): DataFrame = {
      require(iterations >= 1, "need at least one iteration")
      val seedCol = seeds.columns.head
      val inGraph = nodes
        .join(seeds.select(col(seedCol).as("src")).distinct(),
          Seq("src"), "left_semi")
      // bounded 1-row guard: an empty effective seed set would divide the
      // teleport into NaNs — fail loudly instead (pqCodebooks precedent)
      val nSeeds = inGraph.count()
      require(nSeeds > 0, "no seed intersects the graph's node set")
      val seedFlag = inGraph.withColumn("__seed", lit(1))
      var ranks = nodes
        .join(if (broadcastRanks) broadcast(seedFlag) else seedFlag,
          Seq("src"), "left")
        .select(col("src"),
          when(col("__seed").isNotNull, lit(1.0) / nSeeds)
            .otherwise(lit(0.0)).as("__tele"))
        .withColumn("rank", col("__tele"))
        .select(col("src"), col("rank"), col("__tele"))
      for (k <- 1 to iterations) {
        val next = personalizedSuperstep(ewd, ranks, damping, contribScale,
          rankScale, broadcastRanks)
        ranks = if (k < iterations) next.localCheckpoint(eager = false)
                else next
      }
      ranks.select(col("src").as("node"), col("rank"))
    }
  }

  /** Entry point for shared-prefix consumers; [[pageRank]],
    * [[pageRankConverged]] and [[personalizedPageRank]] are one-shot
    * wrappers over a fresh run. */
  def run(edges: DataFrame, damping: Double = 0.85,
      contribScale: Int = 12, rankScale: Int = 9,
      broadcastRanks: Boolean = true,
      weightCol: Option[String] = None): Run =
    new Run(edges, damping, contribScale, rankScale, broadcastRanks, weightCol)

  /** Convergence-terminated damped PageRank: iterates the SAME rounded
    * system as [[pageRank]] and stops after the first superstep whose
    * L1 residual Σ |rank − prev| falls below `epsilon`, or at
    * `maxIterations` — the stopping rule a production PageRank runs
    * (fixed counts either waste supersteps or stop short; the residual
    * tells you which). L1 — total rank mass that moved — is the
    * SCALE-FREE choice: rank mass sums to 1 at any node count, so one
    * ε is meaningful from a unit-test graph to a 100-TB crawl, where a
    * max-|Δ| threshold shrinks like 1/n and silently stops ever
    * triggering (or always triggering) as the graph grows. The residual
    * is ONE extra bounded aggregate per superstep: a |nodes|-row
    * equi-join of the new state onto the old (rank-side broadcast under
    * `broadcastRanks`, like the superstep itself) reduced to a single
    * driver-read row — the same bounded-driver-touch class as the rank
    * broadcast build.
    *
    * Returns (final state, supersteps executed). The stop is
    * DETERMINISTIC: ranks are decimal-rounded to `rankScale` every
    * superstep, and the residual sums per-node |Δ| (multiples of
    * 10^-rankScale, exact in a double) as exact DECIMAL(38,12) — no
    * float-summation-order ulp can flip the ε comparison. The selected
    * iteration count is therefore a pure function of the input, and an
    * oracle can replay it through the fixed-iteration system
    * ([[pageRank]] with `iterations = selected` is bit-identical, a
    * GraphPropsSpec property).
    */
  def pageRankConverged(
      edges: DataFrame, maxIterations: Int, epsilon: Double,
      damping: Double = 0.85,
      contribScale: Int = 12, rankScale: Int = 9,
      broadcastRanks: Boolean = true,
      weightCol: Option[String] = None): (DataFrame, Int) =
    run(edges, damping, contribScale, rankScale, broadcastRanks, weightCol)
      .converged(maxIterations, epsilon)

  /** PERSONALIZED PageRank: teleport mass (1−d) returns only to the
    * `seeds` (uniformly), not to every node — the "similar to THESE"
    * form (related-item retrieval, seeded influence, topic-conditioned
    * centrality). Rank update per superstep:
    * rank(v) = (1−d)·tele(v) + d·Σ contribs, with tele(v) = 1/|seeds|
    * for seed nodes and 0 otherwise; the initial state IS the teleport
    * distribution. Nodes unreachable from the seed set stay at exactly
    * 0.0 — they remain in the state (node-set totality, like the
    * fixed-rank form) so the output is a total ranking, not a reachable
    * subset.
    *
    * Same rounded-system determinism as [[pageRank]]; the per-node
    * teleport rides the state as a third column and re-attaches after
    * the contribution aggregate via max() over the per-node zero row —
    * no extra join. `seeds` (one column, same values as `src`) is
    * intersected with the graph's node set; seeds outside the graph are
    * ignored. The teleport constant is written 1.0−damping in both
    * engines (the g1 convention). */
  def personalizedPageRank(
      edges: DataFrame, seeds: DataFrame, iterations: Int,
      damping: Double = 0.85,
      contribScale: Int = 12, rankScale: Int = 9,
      broadcastRanks: Boolean = true,
      weightCol: Option[String] = None): DataFrame =
    run(edges, damping, contribScale, rankScale, broadcastRanks, weightCol)
      .personalized(seeds, iterations)

  /** One superstep of the personalized system: like [[superstep]], but
    * the teleport term is the per-NODE `__tele` column. Contribution
    * rows carry a NULL tele and the per-node zero row carries the real
    * one, so a max() in the same aggregate re-attaches it — grouping by
    * a per-node column would instead split a destination's sum across
    * its sources' teleports. */
  private def personalizedSuperstep(
      ewd: DataFrame, ranks: DataFrame, damping: Double,
      contribScale: Int, rankScale: Int,
      broadcastRanks: Boolean): DataFrame = {
    val inContribs = ewd
      .join(if (broadcastRanks) broadcast(ranks) else ranks, Seq("src"))
      .select(col("dst"),
        round((col("rank") * col("__w")) / col("outw"), contribScale)
          .cast("decimal(38,12)").as("contrib"),
        lit(null).cast("double").as("__tele"))
    val zeros = ranks.select(col("src").as("dst"),
      lit(0).cast("decimal(38,12)").as("contrib"), col("__tele"))
    inContribs.unionByName(zeros)
      .groupBy(col("dst"))
      .agg(sum(col("contrib")).as("csum"), max(col("__tele")).as("__tele"))
      .select(col("dst").as("src"),
        round(lit(1.0 - damping) * col("__tele")
          + lit(damping) * col("csum").cast("double"), rankScale).as("rank"),
        col("__tele"))
  }

  /** EXACT per-node triangle counting by DEGREE-ORDERED EDGE ORIENTATION
    * — the relational form of the classic bounded-fanout algorithm
    * (orient every undirected edge from its (degree, id)-smaller
    * endpoint to the larger; each triangle then has exactly ONE wedge
    * u→v, u→w with both closing edges oriented the same way, so it is
    * found exactly once, with no post-hoc dedup).
    *
    * Why this shape survives 100 TB: the naive wedge join on an
    * UNORIENTED graph fans out quadratically in the max degree — one
    * celebrity node with 10M followers yields 10^14 wedges on its key
    * alone. Orientation caps every node's OUT-degree at O(√m) (a node
    * of degree > √(2m) cannot have that many higher-degree neighbors),
    * so per-key wedge fanout is C(outdeg, 2) ≤ O(m) TOTAL regardless of
    * skew — the degeneracy bound. Three equi-joins, all shuffled on
    * bounded keys; counts are exact integers, so no float convention is
    * needed.
    *
    * Input edges are canonicalized here: self-loops dropped, direction
    * and duplicates collapsed — callers pass any (src, dst) pair list.
    * `broadcastDegrees` (default true) broadcasts the |nodes|-row degree
    * frame into the two orientation joins — the bounded node-sized
    * broadcast contract shared with [[pageRank]]'s rank state; set it
    * false past the broadcast budget (~100M+ nodes) and the orientation
    * becomes two ordinary shuffle equi-joins.
    *
    * Returns (node, triangles) for every node in ≥ 1 triangle. */
  def triangleCount(
      edges: DataFrame, broadcastDegrees: Boolean = true): DataFrame = {
    val (_, _, tri) = triangles(edges, broadcastDegrees)
    tri.select(explode(array(col("src"), col("v"), col("w"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("triangles"))
  }

  /** Shared degree-ordered triangle enumeration behind [[triangleCount]]
    * and [[edgeJaccard]]. Returns (canonical undirected edges `(a, b)`
    * with `a < b`, per-node degrees `(node, deg)`, enumerated triangles
    * `(src, v, w)` — each triangle exactly once, `src` its
    * (degree, id)-smallest corner). */
  private def triangles(edges: DataFrame, broadcastDegrees: Boolean)
      : (DataFrame, DataFrame, DataFrame) = {
    def bc(df: DataFrame): DataFrame =
      if (broadcastDegrees) broadcast(df) else df
    // canonical undirected edge set; feeds the degree count AND the
    // orientation join — one materialization (t8 convention)
    val und = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(eager = false)
    val deg = und.select(col("a").as("node"))
      .unionByName(und.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    // orient a—b from the (deg, id)-smaller endpoint; carry the HEAD's
    // degree so the wedge join can order neighbors without re-joining
    val o = und
      .join(bc(deg.select(col("node").as("a"), col("deg").as("da"))), Seq("a"))
      .join(bc(deg.select(col("node").as("b"), col("deg").as("db"))), Seq("b"))
      .select(
        when(col("da") < col("db")
            || (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("s"), col("b").as("t"), col("db").as("dt")))
        .otherwise(
          struct(col("b").as("s"), col("a").as("t"), col("da").as("dt")))
        .as("e"))
      .select(col("e.s").as("src"), col("e.t").as("dst"),
        col("e.dt").as("ddeg"))
      // reused by BOTH wedge sides and the closing join — materialize
      .localCheckpoint(eager = false)
    // wedges u→v, u→w with (deg, id)(v) < (deg, id)(w): an equi-join on
    // the wedge center plus the ordering filter (no cartesian — the
    // join key is u)
    val wedges = o.select(col("src"), col("dst").as("v"), col("ddeg").as("dv"))
      .join(o.select(col("src"), col("dst").as("w"), col("ddeg").as("dw")),
        Seq("src"))
      .filter(col("dv") < col("dw")
        || (col("dv") === col("dw") && col("v") < col("w")))
    // close the wedge: (v, w) must be an oriented edge. `o` rows are
    // unique, so a semi-join counts each triangle exactly once.
    val tri = wedges.join(
      o.select(col("src").as("v"), col("dst").as("w")),
      Seq("v", "w"), "left_semi")
      .select(col("src"), col("v"), col("w"))
    (und, deg, tri)
  }

  /** Per-EDGE common-neighbor (co-citation) similarity: for every
    * undirected edge (a, b), the number of shared neighbors and the
    * neighbor-set Jaccard `common / (deg(a) + deg(b) − common)` — the
    * link-strength score behind related-item suggestion and weak-tie
    * pruning. Convention: N(·) is the RAW adjacency set (so a ∈ N(b)
    * and b ∈ N(a) both count in the union but can never be common —
    * self-loops are dropped); an edge with no shared neighbors scores
    * 0.0, not NULL.
    *
    * Cost shape: the shared [[triangles]] enumeration (each triangle
    * found once under the degeneracy bound) plus one explode — a
    * triangle (u, v, w) contributes its third corner as a common
    * neighbor to each of its three edges — one count aggregate on the
    * canonical edge key, and one broadcast-degree stitch. The Jaccard
    * is a single division of exact integers (identical IEEE result in
    * any engine, unrounded — the exactAvg rule). */
  def edgeJaccard(
      edges: DataFrame, broadcastDegrees: Boolean = true): DataFrame = {
    def bc(df: DataFrame): DataFrame =
      if (broadcastDegrees) broadcast(df) else df
    val (und, deg, tri) = triangles(edges, broadcastDegrees)
    // three (edge, witness) emissions per triangle, edges re-canonicalized
    val witnessed = tri.select(explode(array(
        struct(col("v").as("x"), col("w").as("y")),
        struct(col("src").as("x"), col("w").as("y")),
        struct(col("src").as("x"), col("v").as("y")))).as("e"))
      .select(least(col("e.x"), col("e.y")).as("a"),
        greatest(col("e.x"), col("e.y")).as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("common"))
    und.join(witnessed, Seq("a", "b"), "left")
      .withColumn("common", coalesce(col("common"), lit(0L)))
      .join(bc(deg.select(col("node").as("a"), col("deg").as("da"))), Seq("a"))
      .join(bc(deg.select(col("node").as("b"), col("deg").as("db"))), Seq("b"))
      .select(col("a"), col("b"), col("common"),
        (col("common").cast("double")
          / (col("da") + col("db") - col("common")).cast("double"))
          .as("jaccard"))
  }

  /** Synchronous label-propagation community detection (LPA), fixed
    * iteration count. Every node starts labeled with its own id; each
    * iteration every node adopts the label carried by the PLURALITY of
    * its in-neighbors, ties broken deterministically by the smaller
    * label (binary string order — both engines compare memcmp-style).
    * Plurality-with-min-tiebreak makes the whole iteration a pure
    * integer/string function of the input — no floats anywhere — so a
    * chained-CTE oracle replays it exactly.
    *
    * `edges` are directed (src, dst) pairs; the node set is the SOURCE
    * side, and labels flow dst→src along each edge's reverse, which
    * for a symmetric edge set (like g7's trading graph) is plain
    * neighborhood voting. The node set is TOTAL and invariant across
    * iterations: a node none of whose out-neighbors carries a label
    * (every dst outside the node set — possible on unsymmetrized
    * input) simply KEEPS its current label rather than silently
    * dropping out of the state — the crawled-subgraph semantics
    * [[pageRank]]'s closure handling established; votes for/from
    * out-of-set destinations are ignored. Per iteration: one
    * edges⋈labels equi-join (label state is |nodes|-row and broadcast
    * under `broadcastLabels`, the pageRank rank-state contract; set it
    * false past the broadcast budget and every state join becomes an
    * ordinary shuffle equi-join), one (node, label) grouped count, one
    * per-node ordered top-1, and one |nodes|-row keep-label join — the
    * label frame re-checkpoints each iteration so lineage stays flat.
    *
    * Returns (node, label) — nodes sharing a label share a community. */
  def labelPropagation(
      edges: DataFrame, iterations: Int,
      broadcastLabels: Boolean = true): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    def bc(df: DataFrame): DataFrame =
      if (broadcastLabels) broadcast(df) else df
    val e = edges.select(col("src"), col("dst"))
      .localCheckpoint(eager = false)
    val nodes = e.select(col("src")).distinct()
      .localCheckpoint(eager = false)
    var labels = nodes.select(col("src").as("node"), col("src").as("label"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("src")).orderBy(col("c").desc, col("label"))
    for (_ <- 1 to iterations) {
      val voted = e
        .join(bc(labels.select(col("node").as("dst"), col("label"))),
          Seq("dst"))
        .groupBy(col("src"), col("label")).agg(count(lit(1)).as("c"))
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("src").as("node"), col("label").as("__voted"))
      // totality: un-voted nodes keep their label (no silent dropout)
      labels = labels
        .join(bc(voted), Seq("node"), "left")
        .select(col("node"),
          coalesce(col("__voted"), col("label")).as("label"))
        .localCheckpoint(eager = false)
    }
    labels
  }

  /** HITS hubs & authorities (Kleinberg's mutual-reinforcement
    * centrality) on a DIRECTED edge set — the two-sided ranking
    * PageRank can't express: a node is a good HUB if it points at good
    * authorities and a good AUTHORITY if good hubs point at it (on the
    * customer→supplier trading graph: influential buyers vs
    * sought-after suppliers). Per iteration: auth(v) = Σ_{u→v} hub(u)
    * then hub(u) = Σ_{u→v} auth(v), each half-step L1-normalized
    * (score / Σ scores). L1 replaces the textbook L2 deliberately: the
    * ranking is identical (normalization is a monotone per-side
    * rescale) but the arithmetic stays in the repo's replayable
    * rounded-system family — an L2 sqrt over a float sum has no exact
    * cross-engine form. Determinism: scores round to `scoreScale`,
    * half-step sums accumulate those rounded values exactly as
    * DECIMAL(38,`sumScale`) (association-proof), and each
    * normalization is ONE double division rounded once — both engines
    * iterate the identical system (the pageRank convention).
    *
    * Scale shape: the edge frame checkpoints ONCE and never
    * re-shuffles — each half-step is one broadcast probe of the
    * |side|-row state onto the edges plus one map-side-combined
    * grouped sum (|side| rows out), and each L1 total is a bounded
    * 1-row aggregate riding a broadcast cross join (never a driver
    * collect). `broadcastState=false` is the same escape hatch as
    * pageRank's `broadcastRanks` for state past the broadcast budget.
    * Node-set totality needs no zero-union: every distinct src gets a
    * hub score and every distinct dst an auth score by construction
    * (each has at least the edge that defined it).
    *
    * `edges` must be pre-deduplicated (src, dst) pairs (the pageRank
    * contract); returns (side ∈ {hub, auth}, node, score). */
  def hits(edges: DataFrame, iterations: Int,
      sumScale: Int = 12, scoreScale: Int = 9,
      broadcastState: Boolean = true): DataFrame = {
    require(iterations >= 1, "need at least one iteration")
    def bc(df: DataFrame): DataFrame =
      if (broadcastState) broadcast(df) else df
    val dec = s"decimal(38,$sumScale)"
    val e = edges.select(col("src"), col("dst"))
      .localCheckpoint(eager = false)
    val hubNodes = e.select(col("src")).distinct()
    val nH = hubNodes.agg(count(lit(1)).as("n"))
    def normalize(raw: DataFrame, key: String): DataFrame = {
      // raw feeds both its own L1 total and the normalized state —
      // checkpoint so the half-step join doesn't run twice
      val r = raw.localCheckpoint(eager = false)
      val tot = r.agg(sum(col("raw")).as("tot"))
      r.crossJoin(broadcast(tot))
        .select(col(key),
          round(col("raw").cast("double") / col("tot").cast("double"),
            scoreScale).as("score"))
    }
    var hubs = hubNodes.crossJoin(broadcast(nH))
      .select(col("src"), (lit(1.0) / col("n")).as("score"))
    var auths: DataFrame = null
    for (k <- 1 to iterations) {
      // explicit round-then-cast (the pageRank contribution pattern):
      // after the first normalize scores are already at scoreScale, but
      // the 1/n init is a raw double whose decimal conversion must be
      // the same HALF_UP step in both engines
      auths = normalize(
        e.join(bc(hubs), Seq("src")).groupBy(col("dst"))
          .agg(sum(round(col("score"), sumScale).cast(dec)).as("raw")),
        "dst")
      val nextHubs = normalize(
        e.join(bc(auths), Seq("dst")).groupBy(col("src"))
          .agg(sum(round(col("score"), sumScale).cast(dec)).as("raw")),
        "src")
      // barrier BETWEEN iterations keeps plans linear (pageRank rule)
      hubs = if (k < iterations) nextHubs.localCheckpoint(eager = false)
             else nextHubs
    }
    hubs.select(lit("hub").as("side"), col("src").as("node"), col("score"))
      .unionByName(auths.select(lit("auth").as("side"),
        col("dst").as("node"), col("score")))
  }

  /** CONNECTED COMPONENTS over an undirected BIGINT-id edge list — the
    * first-class graph surface over
    * [[graft.extensions.Dedup.nearDupClusters]]'s cluster engine: the
    * near-dup clustering problem IS connected components, so the graph
    * query reuses that tested machinery (hybrid driver union-find under
    * its documented bounded-edge contract, distributed alternating-min
    * label iteration as the scale fallback — force it with
    * `driverEdgeLimit = 0`) instead of a second implementation.
    * Returns (node, component_id) for every edge-incident node, with
    * component_id = the component's minimum node id (the deterministic
    * labeling both the d9 recursive-CTE oracle replay and the keep-min
    * dedup apply use). Isolated nodes are the caller's concern: a graph
    * extraction that emits edges has already dropped them. */
  def connectedComponents(edges: DataFrame, srcCol: String = "src",
      dstCol: String = "dst", driverEdgeLimit: Long = 5000000L): DataFrame = {
    val nodes = edges.select(col(srcCol).as("node"))
      .unionByName(edges.select(col(dstCol).as("node")))
      .distinct()
    graft.extensions.Dedup.nearDupClusters(nodes,
        edges.select(col(srcCol).as("a_id"), col(dstCol).as("b_id")),
        "node", driverEdgeLimit = driverEdgeLimit)
      .select(col("node"), col("cluster_id").as("component_id"))
  }

  /** Shared graph preparation: checkpointed (edge ⋈ out-weight ⋈ closed
    * node set) frame plus the uniform initial state. One materialization
    * serves every superstep (positive-weight contract enforced up front
    * — see [[pageRank]]'s scaladoc). */
  private def prepare(
      edges: DataFrame, broadcastRanks: Boolean,
      weightCol: Option[String]): (DataFrame, DataFrame) = {
    val e = (weightCol match {
      case Some(w) => edges.select(col("src"), col("dst"),
          col(w).cast("long").as("__w"))
        .filter(col("__w") > 0)
      case None => edges.select(col("src"), col("dst"), lit(1L).as("__w"))
    }).localCheckpoint(eager = false)
    val deg = e.groupBy(col("src")).agg(sum(col("__w")).as("outw"))
    // the node frame feeds the count, the init state and every
    // superstep's zero-contribution union — materialize it once
    val nodes = e.select(col("src")).distinct().localCheckpoint(eager = false)
    // closed node set: drop edges whose dst never appears as a source
    // ONCE, before the checkpoint — the filter is loop-invariant, and
    // applying it after `deg` keeps outw counting out-of-set links
    // (crawled-subgraph semantics: that mass leaves the ranked set).
    // Without it, groupBy(dst) would smuggle never-a-source nodes into
    // the state with an inconsistent teleport share.
    val nodesAsDst = nodes.select(col("src").as("dst"))
    val ewd = e.join(deg, Seq("src"))
      .join(if (broadcastRanks) broadcast(nodesAsDst) else nodesAsDst,
        Seq("dst"), "left_semi")
      .localCheckpoint(eager = false)
    // bounded 1-row node count rides a broadcast join, not a collect
    val nRow = nodes.agg(count(lit(1)).as("n"))
    val init = nodes
      .crossJoin(broadcast(nRow))
      .select(col("src"), (lit(1.0) / col("n")).as("rank"), col("n"))
    (ewd, init)
  }

  /** One superstep of the rounded system: contributions rank·w/Σw
    * rounded to `contribScale`, summed exactly as DECIMAL(38,12) with a
    * zero-contribution union keeping in-degree-0 nodes in the state,
    * new rank re-rounded to `rankScale`. */
  private def superstep(
      ewd: DataFrame, ranks: DataFrame, damping: Double,
      contribScale: Int, rankScale: Int,
      broadcastRanks: Boolean): DataFrame = {
    val inContribs = ewd
      .join(if (broadcastRanks) broadcast(ranks) else ranks, Seq("src"))
      .select(col("dst"),
        round((col("rank") * col("__w")) / col("outw"), contribScale)
          .cast("decimal(38,12)").as("contrib"),
        col("n"))
    // a zero contribution per node keeps in-degree-0 nodes in the
    // state (teleport-only rank) without a second join: the union is
    // map-side and decimal 0 is exact, so connected nodes' sums are
    // untouched
    val zeros = ranks.select(col("src").as("dst"),
      lit(0).cast("decimal(38,12)").as("contrib"), col("n"))
    inContribs.unionByName(zeros)
      .groupBy(col("dst"), col("n"))
      .agg(sum(col("contrib")).as("csum"))
      .select(col("dst").as("src"),
        round(lit(1.0 - damping) / col("n")
          + lit(damping) * col("csum").cast("double"), rankScale).as("rank"),
        col("n"))
  }
}
