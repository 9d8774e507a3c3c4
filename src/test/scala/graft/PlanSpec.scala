package graft

/** Plan-shape regression tests — the 100 TB levers must stay visible in
  * the physical plan, not just be intended: pruned scans with pushed
  * filters, broadcast joins for bounded sides, heap-based top-k, no
  * redundant shuffles. */
class PlanSpec extends SparkSpec {

  private def planString(name: String): String =
    SparkEntry.queries(name)(spark, sf0001).queryExecution.executedPlan.toString

  /** The finalized plan only: after collect(), AdaptiveSparkPlanExec's
    * toString appends the pre-adaptive "Initial Plan" section, which
    * would double-count every pattern asserted below. */
  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // run THIS plan so AQE finalizes (count() builds a separate one)
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  test("s7: filter and projection reach the parquet scan") {
    val p = planString("s7_scan_pruned")
    assert(p.contains("PushedFilters"), "expected pushed filters in scan")
    assert(p.contains("GreaterThanOrEqual(l_shipdate"),
      "shipdate predicate should be pushed to parquet")
    // pruned read schema: no l_quantity/l_discount in the scan
    assert(!p.contains("l_discount"), "scan should prune unused columns")
  }

  test("j2: dimension sides broadcast, no sort-merge join at this scale") {
    val df = SparkEntry.queries("j2_multiway_join")(spark, sf0001)
    val p = finalPlan(df)
    val bhj = "BroadcastHashJoin".r.findAllIn(p).size
    assert(bhj >= 4, s"expected >=4 broadcast joins, got $bhj in\n$p")
    assert(!p.contains("SortMergeJoin"), "no SMJ expected at this scale")
  }

  test("w5: top-k plans as TakeOrderedAndProject (no global sort)") {
    assert(planString("w5_topk").contains("TakeOrderedAndProject"))
  }

  test("w1: window ops introduce exactly one exchange (partition by key)") {
    val df = SparkEntry.queries("w1_ffill")(spark, sf0001)
    val p = finalPlan(df)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 1,
      s"ffill should need one hash exchange, got $exchanges")
  }

  test("j8: selective filters are pushed to all three scans; top-10 is heap-based") {
    val df = SparkEntry.queries("j8_flagship_join")(spark, sf0001)
    val p = finalPlan(df)
    assert(p.contains("EqualTo(c_mktsegment,BUILDING)"),
      "segment filter should be pushed to the customer scan")
    assert(p.contains("LessThan(o_orderdate"),
      "orderdate cutoff should be pushed to the orders scan")
    assert(p.contains("GreaterThan(l_shipdate"),
      "shipdate cutoff should be pushed to the lineitem scan")
    assert(p.contains("TakeOrderedAndProject"),
      "top-10 must not be a global sort")
  }

  test("j9: salted join plans as shuffled hash join (no sort of the fact side)") {
    val df = SparkEntry.queries("j9_salted_join")(spark, sf0001)
    val p = finalPlan(df)
    assert(p.contains("ShuffledHashJoin"),
      "salted join should hash-build the replicated dim side")
    assert(!p.contains("SortMergeJoin"),
      "SMJ would sort the skewed fact side the salt exists to protect")
  }

  test("s12: bucketed join joins with zero hash-partition exchange") {
    val df = SparkEntry.queries("s12_bucketed_join")(spark, sf0001)
    val p = finalPlan(df)
    assert(p.contains("SortMergeJoin"), s"merge hint should force SMJ\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"bucketed sides must scan pre-shuffled — no exchange before the join\n$p")
    assert(p.contains("SelectedBucketsCount"),
      s"expected bucketed file scans\n$p")
  }

  test("d12: signature staging survives — one text split per corpus scan") {
    val df = SparkEntry.queries("d12_incremental_minhash")(spark, sf0001)
    val p = finalPlan(df)
    val n = "split\\(text".r.findAllIn(p).size
    // one staged __mh_toks projection per side (batch + in-query index);
    // more means CollapseProject re-inlined the split into the
    // interpreted shingle lambda (the 16× regression of round 3)
    assert(n <= 2, s"expected <=2 staged splits, got $n in\n$p")
  }

  test("e8: corpus norm is computed below the per-query explode, not in it") {
    val df = SparkEntry.queries("e8_knn_join")(spark, sf0001)
    val p = finalPlan(df)
    val gen = p.linesIterator.filter(_.contains("Generate explode(transform(__qs"))
    assert(gen.nonEmpty, s"expected the query-scoring explode in\n$p")
    assert(gen.forall(!_.contains("SQRT")),
      "norms must stay staged per corpus row — a SQRT inside the scoring " +
        s"lambda re-evaluates per query element\n$p")
  }

  test("d2: merge-loop intersection evaluates exactly once per pair") {
    val df = SparkEntry.queries("d2_token_jaccard")(spark, sf0001)
    val p = finalPlan(df)
    val n = "sortedintersectsize".r.findAllIn(p).size
    assert(n == 1,
      s"the Generate barrier should leave exactly one sorted_intersect_size" +
        s" in the plan (join-condition pushdown clones it), got $n in\n$p")
  }

  test("d14: containment verify evaluates the merge loop exactly once per pair") {
    val df = SparkEntry.queries("d14_containment")(spark, sf0001)
    val p = finalPlan(df)
    val n = "sortedintersectsize".r.findAllIn(p).size
    assert(n == 1,
      s"the Generate barrier should leave exactly one sorted_intersect_size" +
        s" in the plan, got $n in\n$p")
    assert(!p.contains("CartesianProduct"),
      s"prefix-filter candidates must come from an equi-join, not a cross\n$p")
  }

  test("e12: ADC scoring is a broadcast map pass over the codes; top-k is heap-based") {
    val df = SparkEntry.queries("e12_pq_ann")(spark, sf0001)
    val p = finalPlan(df)
    assert(!p.contains("SortMergeJoin"),
      s"PQ scoring must never sort-merge the corpus — LUT and shortlist " +
        s"ride broadcasts\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"final top-k should be a per-partition heap, not a global sort\n$p")
  }

  test("v9: funnel has no window over the raw event stream; steps share checkpoints") {
    val df = SparkEntry.queries("v9_funnel")(spark, sf0001)
    val p = finalPlan(df)
    assert(!p.contains("Window ["),
      s"funnel must be join+min cascades, never an ordered window over events\n$p")
    // each step frame materializes once behind its lazy checkpoint and
    // feeds both its summary row and the next step — the summary
    // branches must read checkpoint RDDs, not re-run the prefix chain
    // (the t11 shared-scan contract); the parquet scans with their
    // pushed step-type filters live inside those checkpointed subplans
    val rdds = "Scan ExistingRDD".r.findAllIn(p).size
    assert(rdds == 3, s"expected the three step frames as checkpoint scans, got $rdds\n$p")
    assert(!p.contains("Scan parquet"),
      s"summary branches must not re-scan events past the checkpoints\n$p")
  }

  test("o9: SCD2 rides a single user_id hash exchange") {
    val df = SparkEntry.queries("o9_scd2_history")(spark, sf0001)
    val p = finalPlan(df)
    val n = "hashpartitioning\\(user_id".r.findAllIn(p).size
    assert(n == 1,
      s"run windows, run aggregate and version window must all reuse ONE " +
        s"(user_id) exchange, got $n in\n$p")
  }

  test("m4: frame sampling is a narrow pipeline — no shuffle except the output sort") {
    val df = SparkEntry.queries("m4_frame_sample")(spark, sf0001)
    val p = finalPlan(df)
    assert(!p.contains("hashpartitioning"),
      s"frame explode + fingerprint must stay map-side, got\n$p")
    assert(p.contains("Generate explode"),
      s"expected the offset explode in the plan\n$p")
  }

  test("o10: only (id, fingerprint) reach the snapshot-diff join — text stays below it") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val df = SparkEntry.queries("o10_snapshot_diff")(spark, sf0001)
    df.collect() // finalize AQE
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    // assert on the exchanges' OUTPUT ATTRIBUTES (toString renders only
    // partitioning expressions, which would make a string check vacuous):
    // every shuffled row carries id + fingerprint/marker columns, never
    // the text payload. AQE wraps materialized exchanges in leaf
    // QueryStageExecs, so recurse into those explicitly.
    def exchanges(p: org.apache.spark.sql.execution.SparkPlan): Seq[ShuffleExchangeExec] =
      p.collect {
        case e: ShuffleExchangeExec => Seq(e)
        // every QueryStageExec (Result/Shuffle/Broadcast) is a LEAF whose
        // real subtree hangs off .plan — recurse or see nothing
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          exchanges(q.plan)
      }.flatten
    val outs = exchanges(plan).map(_.output.map(_.name))
    assert(outs.nonEmpty, s"expected shuffle exchanges in\n$plan")
    outs.foreach { cols =>
      assert(!cols.contains("text"),
        s"payload column must not ride a shuffle, got columns $cols")
      assert(cols.exists(c => c == "doc_id"),
        s"join shuffles should carry the id, got $cols")
    }
  }

  test("t20: URL explode is map-side — only the distinct-count agg pair shuffles") {
    val df = SparkEntry.queries("t20_url_stats")(spark, sf0001)
    val p = finalPlan(df)
    assert(p.contains("Generate explode"),
      s"expected the URL explode in the plan\n$p")
    // countDistinct plans as the standard two-phase aggregate: one
    // exchange on (domain, doc_id) to dedup, one on (domain) to roll
    // up — both partial-aggregated map-side first. Anything beyond
    // those two means the explode or extraction started shuffling.
    val n = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(n == 2,
      s"expected the two distinct-agg exchanges and nothing else, got $n in\n$p")
  }

  test("g1: a PageRank superstep broadcasts the rank state — edges never re-shuffle") {
    val df = SparkEntry.queries("g1_pagerank")(spark, sf0001)
    val p = finalPlan(df)
    // lineage is cut at each superstep's checkpoint, so the final plan IS
    // the last superstep: rank state must ride a broadcast join and the
    // only hash exchange is the contribution aggregate
    assert(p.contains("BroadcastHashJoin"),
      s"rank state should broadcast onto the edge frame\n$p")
    val n = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(n == 1,
      s"expected exactly one hash exchange (contribution agg), got $n in\n$p")
  }

  test("g1 fallback: broadcastRanks=false joins rank state by shuffle, never the driver") {
    // the scale leg for node sets past the broadcast budget: the rank
    // join must plan WITHOUT any broadcast (no per-superstep driver
    // collect). At sf0.001 AQE would helpfully re-broadcast the tiny
    // state, masking the shape — disable broadcast thresholds so the
    // test sees the at-scale plan; the broadcast FORM's explicit hint
    // survives the same conf, proving the flag (not the threshold) is
    // what switches legs.
    val thresholds = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = thresholds.map(k => k -> spark.conf.getOption(k))
    thresholds.foreach(k => spark.conf.set(k, "-1"))
    try {
      val edges = graft.queries.TrainingQueries.tradingEdges(spark, sf0001)
      val p = finalPlan(graft.operators.Graph
        .pageRank(edges, iterations = 2, broadcastRanks = false))
      assert(!p.contains("BroadcastHashJoin"),
        s"fallback superstep must not broadcast the rank state\n$p")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        s"expected a shuffle join of ranks onto edges\n$p")
      val pb = finalPlan(graft.operators.Graph
        .pageRank(edges, iterations = 2))
      assert(pb.contains("BroadcastHashJoin"),
        s"explicit broadcast hint must survive a -1 threshold\n$pb")
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("d20: the exact-span result plan has no nested-loop/cartesian stage") {
    // the final aggregate plan (candidates ⋈ toks equi-join + substring
    // group-by + semi join) must stay hash-join-shaped; a BNLJ here
    // would mean the probe degenerated into all-pairs text comparison
    val df = SparkEntry.queries("d20_exact_dup_span")(spark, sf0001)
    val p = finalPlan(df)
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      s"exact-span probe must stay equi-join shaped\n$p")
  }

  test("g1/g3/g4 share ONE memoized TradingRank run per (session, dir)") {
    // the g-family artifact contract: the fixed-count, converged and
    // personalized queries must read the same Run instance, or the
    // iterate-prefix sharing (and its bench accounting) silently rots
    val r1 = graft.queries.TrainingQueries.TradingRank(spark, sf0001)
    val r2 = graft.queries.TrainingQueries.TradingRank(spark, sf0001)
    assert(r1 eq r2, "TradingRank must memoize per (session, dir)")
  }

  test("g1 actually WALKS the shared run's iterate chain (routing pin)") {
    // memoization alone can't catch a query quietly building its own
    // run: observe the shared run's cache depth around the query. The
    // (session, dir) memoization key is made fresh BY CONSTRUCTION —
    // a throwaway temp dir of symlinks to the sf0.001 fixtures that no
    // other test can possibly have touched — instead of relying on a
    // suite-wide "nobody else runs graph queries on dir X" invariant
    // (which any future test could silently break) or hardcoding a
    // second fixture path.
    val dir = java.nio.file.Files.createTempDirectory("graft-g1route")
    for (f <- Seq("orders.parquet", "lineitem.parquet", "customer.parquet"))
      java.nio.file.Files.createSymbolicLink(
        dir.resolve(f), java.nio.file.Paths.get(sf0001, f))
    val run = graft.queries.TrainingQueries.TradingRank(spark, dir.toString)
    assert(run.cachedIterates == 0,
      "a fresh throwaway dir must start with an empty iterate cache")
    SparkEntry.queries("g1_pagerank")(spark, dir.toString).collect()
    assert(run.cachedIterates >= 4,
      "g1 (5 iterations) must populate the SHARED run's first four " +
        "checkpointed iterates — its final superstep stays raw")
  }

  test("e4: IVF assign is a map pass — no corpus-wide argmin shuffle") {
    val df = SparkEntry.queries("e4_ivf_ann")(spark, sf0001)
    val p = finalPlan(df)
    assert(!p.contains("hashpartitioning(vec_id"),
      s"cell assignment must not shuffle the corpus by vec_id\n$p")
  }

  test("t32: per-term tf is map-only — no explode, no tf-grain shuffle") {
    val df = SparkEntry.queries("t32_bm25_topk")(spark, sf0001)
    val p = finalPlan(df)
    // tf = size(filter(toks)) evaluates inside the projection: a
    // Generate node would mean the token array exploded into rows (a
    // corpus-tokens-sized shuffle at 100 TB); the only join is the
    // broadcast of the 1-row stats frame, and top-k is the heap plan
    assert(!p.contains("Generate"),
      s"tf must not explode the token array\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k must ride the bounded heap plan\n$p")
  }

  test("t35: the PII battery is one map-only projection over the scan") {
    val df = SparkEntry.queries("t35_pii_audit")(spark, sf0001)
    val p = finalPlan(df)
    assert(!p.contains("Exchange hashpartitioning"),
      s"regex count + scrub must not shuffle anything\n$p")
    assert(!p.contains("Generate"), s"no explode in the regex battery\n$p")
  }

  test("d7: decontamination is a broadcast anti-join — corpus side never shuffles") {
    val df = SparkEntry.queries("d7_decontaminate_exact")(spark, sf0001)
    val p = finalPlan(df)
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"expected broadcast left-anti join, got\n$p")
  }

  test("t11: both signal branches read the checkpoint — one corpus scan") {
    val df = SparkEntry.queries("t11_repetition")(spark, sf0001)
    val p = finalPlan(df)
    // the tokenized frame materializes once behind the lazy checkpoint;
    // neither the word-mode nor the bigram-mode branch may re-scan the
    // documents parquet
    assert(!p.contains("Scan parquet"),
      s"t11 branches must share the checkpointed token frame, not re-scan\n$p")
    val rdds = "Scan ExistingRDD".r.findAllIn(p).size
    assert(rdds == 2, s"expected both branches on the checkpoint RDD, got $rdds\n$p")
  }

  test("v7: the only single-partition stage is the bounded bucket-prefix table") {
    val df = SparkEntry.queries("v7_watermark_audit")(spark, sf0001)
    val p = finalPlan(df)
    assert("Exchange SinglePartition".r.findAllIn(p).size == 1,
      s"exactly one single-partition exchange (the #partitions-row " +
        s"bucket prefix) expected in\n$p")
    // the PARTITIONED spec lists __b then the arrival sort key — the
    // prefix-stage window (ordered by __b alone) cannot satisfy this
    assert("windowspecdefinition\\(__b#\\d+L?, __arr#".r
      .findFirstIn(p).isDefined,
      "the event-table running max must be partitioned by bucket")
  }

  test("o7: global numbering never puts the table through one task") {
    val df = SparkEntry.queries("o7_global_rownum")(spark, sf0001)
    val p = finalPlan(df)
    assert("Exchange SinglePartition".r.findAllIn(p).size == 1,
      s"exactly one single-partition exchange (the per-partition-count " +
        s"offset prefix) expected in\n$p")
    // partitioned spec = (__pid, <sort cols>); the offsets prefix
    // window (ordered by __pid alone) cannot satisfy this
    assert("windowspecdefinition\\(__pid#\\d+L?, c_acctbal#".r
      .findFirstIn(p).isDefined,
      "row numbering must run within range partitions")
  }

  test("t8: dfreq joins the fat (doc,term) frame via broadcast — no term-key shuffle") {
    // the bounded-broadcast contract documented at the query site
    // (word vocab ⇒ |vocab| bounded): the document-frequency side must
    // BROADCAST onto the per-(doc,term) frame; a silent planner
    // fallback to hash-partitioning the fat frame by term would land
    // the stopword skew this shape exists to avoid
    val df = SparkEntry.queries("t8_tfidf")(spark, sf0001)
    val p = finalPlan(df)
    assert(p.contains("BroadcastHashJoin"),
      s"dfreq must broadcast-join the tf frame\n$p")
    // exactly ONE term-keyed exchange: the dfreq partial+final aggregate
    // (map-side combined — ≤ partitions×|vocab| rows move). A second one
    // would mean the planner fell back to shuffling the fat frame for
    // the join itself.
    assert("Exchange hashpartitioning\\(term".r.findAllIn(p).size == 1,
      s"only the dfreq aggregate may exchange on the term key\n$p")
  }

  test("x16: percentiles ride the sort path — no value-map percentile aggregate") {
    // the cardinality rule at Summaries.sortedPercentiles: on an
    // unbounded-cardinality double column the builtin percentile's
    // O(distinct) partial map approaches O(rows) — x16/x14/w15b must
    // keep the bounded-state sort form, where each percentile is a
    // window sort + conditional order-statistic pick
    val df = SparkEntry.queries("x16_robust_outliers")(spark, sf0001)
    val p = finalPlan(df)
    assert(!p.toLowerCase.contains("percentile"),
      s"x16 must not fall back to the value-map percentile aggregate\n$p")
    assert(p.contains("Window"), s"expected the sort-based rank pick\n$p")
  }

  test("d10: bloom probe is a scan-level filter — no join, no corpus shuffle") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val corpus = docs.filter(org.apache.spark.sql.functions.col("doc_id") % 20 =!= 0)
    val bench = docs.filter(org.apache.spark.sql.functions.col("doc_id") % 20 === 0)
    val survivors = graft.extensions.Dedup.bloomDecontaminate(corpus, bench, "text")
    val p = finalPlan(survivors)
    assert(!p.contains("Join"),
      s"the bloom filter must be a literal probe, not a join\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"the corpus must stream through the probe without shuffling\n$p")
  }

  test("q4/q17/q21/q22: correlated subqueries decorrelate to hash equi-joins — no BNLJ") {
    // the capability under test: Catalyst's RewritePredicateSubquery /
    // RewriteCorrelatedScalarSubquery must turn every EXISTS /
    // NOT EXISTS / correlated scalar aggregate into semi / anti /
    // aggregate-then-join HASH machinery. A BroadcastNestedLoopJoin or
    // CartesianProduct here means a correlated predicate survived as a
    // per-outer-row rescan — the plan class that dies at any scale
    // (q21's double self-reference is the shape that historically bites)
    // shapes pin on the PRE-adaptive plan: q21 is legitimately empty at
    // sf0.001 and AQE's EmptyRelation propagation erases the very joins
    // under test from the finalized plan — the decorrelation decision
    // is made before AQE and is what must hold at scale
    for (q <- Seq("q4_priority_check", "q17_small_qty_revenue",
        "q21_waiting_suppliers", "q22_dormant_customers",
        "q20_dominant_suppliers", "q2_min_cost_supplier")) {
      val p = planString(q)
      assert(!p.contains("BroadcastNestedLoopJoin")
          && !p.contains("CartesianProduct"),
        s"$q: correlated predicate survived as a nested-loop plan\n$p")
    }
    // q20's nested IN + correlated HAVING: the scalar per-part total
    // must decorrelate into an aggregate joined back on l_partkey (one
    // fact scan per aggregate, no per-row re-aggregation) and the IN
    // into a semi join
    val q20 = planString("q20_dominant_suppliers")
    assert(q20.contains("LeftSemi"),
      s"q20 IN should plan a semi join\n$q20")
    // the specific decorrelated shapes, pinned: q21 = one semi (other
    // supplier exists) + one anti (no other LATE supplier) on the fact
    // key; q22's NOT EXISTS = one anti on custkey, and its uncorrelated
    // scalar average pushes all the way into the parquet scan
    val q21 = planString("q21_waiting_suppliers")
    assert(q21.contains("LeftSemi") && q21.contains("LeftAnti"),
      s"q21 should plan one semi and one anti join\n$q21")
    val q22 = planString("q22_dormant_customers")
    assert(q22.contains("LeftAnti"), s"q22 NOT EXISTS should be an anti join\n$q22")
    assert(q22.contains("GreaterThan(c_acctbal,ScalarSubquery"),
      s"q22's scalar-subquery threshold should push to the scan\n$q22")
  }

  test("q6: the pure-scan aggregate — all predicates pushed, no join, 4-column read") {
    val p = planString("q6_forecast_revenue")
    assert(!p.contains("Join"), s"q6 must be scan→aggregate only\n$p")
    assert(p.contains("GreaterThanOrEqual(l_shipda")
      && p.contains("PushedFilters"),
      s"date/discount/quantity predicates should reach the scan\n$p")
    assert(p.contains("ReadSchema: struct<l_quantity:double," +
      "l_extendedprice:double,l_discount:double,l_shipdate:timestamp>"),
      s"scan should read exactly the 4 referenced columns\n$p")
  }

  test("q19: OR-of-ANDs splits — per-side residuals pushed to BOTH scans, equi-join kept") {
    // the disjunction spans both join sides; Catalyst must extract the
    // part-local disjunction into the part scan, the quantity-only
    // disjunction into the lineitem scan, keep the cross-table
    // conjuncts as the join residual — and the join must REMAIN a
    // partkey equi-join (a naive planner turns OR-joins into BNLJ)
    val p = planString("q19_disjunctive_revenue")
    assert(!p.contains("BroadcastNestedLoopJoin")
      && !p.contains("CartesianProduct"), s"OR-join must stay equi\n$p")
    assert(p.contains("PushedFilters: [IsNotNull(p_partkey), Or(")
      || p.contains("Or(Or(And(EqualTo(p_brand"),
      s"part-local disjunction should push to the part scan\n$p")
    assert(p.contains("Or(Or(And(GreaterThanOrEqual(l_quantity"),
      s"quantity disjunction should push to the lineitem scan\n$p")
  }

  test("j10: banded range join is a bucket equi-join — no nested-loop, no cartesian") {
    val df = SparkEntry.queries("j10_band_join")(spark, sf0001)
    val p = finalPlan(df)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"the non-equi condition must ride the bucket equi-key\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the exploded band table should broadcast into an equi-join\n$p")
  }

  test("g5: triangle enumeration has no cartesian product; degrees broadcast") {
    val df = SparkEntry.queries("g5_triangle_count")(spark, sf0001)
    val p = finalPlan(df)
    assert(!p.contains("CartesianProduct"),
      s"every triangle join must ride a bounded equi-key\n$p")
    // the two orientation joins carry the |nodes|-row degree frame as
    // broadcast build sides (the pageRank bounded-state contract)
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"degree frames should broadcast into the orientation\n$p")
  }

  test("w28: the rollup lattice is ONE aggregate pair — no per-level re-scan") {
    val df = SparkEntry.queries("w28_rollup")(spark, sf0001)
    val p = finalPlan(df)
    // Expand materializes all three grouping sets map-side; a UNION of
    // per-level GROUP BYs would show one scan per level instead
    assert(p.contains("Expand"), s"expected the grouping-set Expand\n$p")
    assert("FileScan parquet".r.findAllIn(p).size == 1,
      s"rollup must scan the fact table exactly once\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"one shuffle between partial and final aggregate\n$p")
  }

  test("t21: bm25 probes only query-term postings; df and stats broadcast") {
    val df = SparkEntry.queries("t21_bm25")(spark, sf0001)
    val p = finalPlan(df)
    // the query-term restriction must sit scan-side (on the exploded
    // token frame BEFORE the tf aggregate's exchange), so the posting
    // join never materializes the corpus vocabulary
    assert(p.contains("term#") && p.contains(" IN (vector,stream,window)")
      || p.contains(" IN (stream,vector,window)"),
      s"expected the query-term isin filter in the plan\n$p")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 1,
      s"df (and stats) should broadcast, not shuffle\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-20 must be heap-based, not a global sort\n$p")
  }

  test("x17: binning rides the distributed rank — no single-task global window") {
    val df = SparkEntry.queries("x17_equal_freq_binning")(spark, sf0001)
    val p = finalPlan(df)
    // the o7 contract on a second consumer: range repartition + bounded
    // per-partition offset table, never Window over an empty partition
    assert(!p.contains("Window [row_number()") ||
      p.contains("Exchange rangepartitioning"),
      s"expected the range-repartitioned rank, not a global window\n$p")
    assert(p.contains("Exchange rangepartitioning"),
      s"expected the range repartition stage\n$p")
  }

  test("v4: sliding windows expand map-side — one shuffle for the bucket agg") {
    val df = SparkEntry.queries("v4_sliding_window")(spark, sf0001)
    val p = finalPlan(df)
    assert(p.contains("Expand") || p.contains("explode"),
      s"expected the map-side window expansion\n$p")
    // partial agg → exchange → final agg; the ORDER BY adds a range
    // exchange. No other hash exchange may appear.
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"the overlap factor must multiply rows, not exchanges\n$p")
  }

  test("v14: interpolation windows share one sort — no per-window exchange") {
    val df = SparkEntry.queries("v14_interpolate")(spark, sf0001)
    val p = finalPlan(df)
    // both directions (pv/pd forward, nv/nd backward) ride the same
    // (user_id, day) sort: exchanges are exactly the daily agg, the
    // per-user span agg, and the presentation ORDER BY — nothing between
    // the Window operators
    assert(p.contains("Generate explode(sequence"),
      s"calendar must expand map-side\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2,
      s"windows must not add exchanges beyond the two aggs\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"equi-join only\n$p")
  }

  test("q3: top-10 plans as a heap, dimensions broadcast without a hint") {
    val df = SparkEntry.queries("q3_shipping_priority")(spark, sf0001)
    val p = finalPlan(df)
    assert(p.contains("TakeOrderedAndProject"),
      s"global top-10 must be per-partition heaps, not a full sort\n$p")
    // no broadcast() hint in the query — Catalyst/AQE must pick
    // BroadcastHashJoin on its own at this scale
    assert(p.contains("BroadcastHashJoin"),
      s"filtered dimension sides should broadcast at this scale\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"equi-joins only\n$p")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)") ||
      p.contains("GreaterThan(l_shipdate"),
      s"the shipdate cutoff must reach the parquet scan\n$p")
  }

  test("q5: 6-way star join — dims broadcast, one big-big pair, dates pushed") {
    val df = SparkEntry.queries("q5_local_supplier")(spark, sf0001)
    val p = finalPlan(df)
    // region/nation/customer/supplier sides must all resolve to
    // broadcast joins (no hint in the query — size stats decide); the
    // only shuffle-worthy pair is lineitem ⋈ orders
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4,
      s"dimension chain should broadcast at this scale\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"equi-joins only\n$p")
    assert(p.contains("GreaterThanOrEqual(o_orderdate") ||
      p.contains("PushedFilters: [IsNotNull(o_orderdate)"),
      s"the orderdate window must reach the parquet scan\n$p")
  }

  test("w36: weighted median — one group exchange serves both windows and the agg") {
    val df = SparkEntry.queries("w36_weighted_median")(spark, sf0001)
    val p = finalPlan(df)
    // cumulative + total windows and the final aggregate all cluster on
    // l_returnflag: exactly ONE hash exchange (plus the presentation
    // range sort), and no join anywhere
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"one group-key exchange expected\n$p")
    assert(!p.contains("Join"), s"no join in the weighted median\n$p")
    assert("Window".r.findAllIn(p).size >= 1, s"window frame expected\n$p")
  }

  test("d16: url dedup is explode + one grouped agg — no join, no extra shuffle") {
    val df = SparkEntry.queries("d16_url_dedup")(spark, sf0001)
    val p = finalPlan(df)
    assert(p.contains("Generate explode"),
      s"url extraction must be a map-side explode\n$p")
    assert(!p.contains("Join"), s"canonical-key dedup needs no join\n$p")
    // countDistinct plans as a two-phase agg over ONE hash exchange
    // (plus the presentation ORDER BY's range exchange)
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2,
      s"only the canonical-key aggregation may shuffle\n$p")
  }

  test("v16: all 20 EWMA lags share ONE window sort and one user exchange") {
    val df = SparkEntry.queries("v16_ewma_smoothing")(spark, sf0001)
    val p = finalPlan(df)
    // 20 lag() expressions over the same spec must plan as a single
    // Window operator — a per-lag window would sort the stream 20×
    assert("Window ".r.findAllIn(p).size == 1,
      s"expected exactly one Window operator for all lags\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"only the user_id window partition may hash-shuffle\n$p")
  }

  test("w31: the sketch joins the probe side by broadcast; stream combines map-side") {
    val df = SparkEntry.queries("w31_count_min")(spark, sf0001)
    val p = finalPlan(df)
    assert(p.contains("BroadcastHashJoin"),
      s"the ≤1024-cell sketch must broadcast onto the 20-key probe\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"no shuffle join anywhere in the sketch probe\n$p")
  }

  test("o11: column stats are ONE scan — a single aggregate, no re-scan per column") {
    val df = SparkEntry.queries("o11_column_stats")(spark, sf0001)
    val p = finalPlan(df)
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans == 1, s"expected one fact-table scan, got $scans\n$p")
  }
}
