package graft

import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, GlobalLimit,
  LocalRelation, LogicalPlan, OneRowRelation, Window}

/** Boundedness contract for UNPARTITIONED windows (VERDICT r10 item 5).
  *
  * A `Window` with no partition spec moves ALL rows to one task — fine
  * over a bounded frame (an aggregate's output, a limit, a literal
  * table), fatal over corpus-grain data at 100 TB. Spark only WARNS
  * (`WindowExec: No Partition Defined`), so nothing structural stops an
  * unbounded global window from slipping onto the board and dying at
  * scale. This suite makes the warning a CONTRACT:
  *
  *   1. the set of board queries carrying an unpartitioned window is
  *      pinned to an explicit allowlist — a NEW one appearing anywhere
  *      fails the suite and must justify itself here;
  *   2. every allowlisted window's input subtree must be visibly
  *      bounded: an Aggregate / GlobalLimit / literal relation on the
  *      path below it (grain reduction before the single-task hop).
  *
  * The allowlisted windows and why each input is bounded:
  *   - `e15_rrf_fusion` (2): the two rank windows run over the lexical
  *     and dense top-50 shortlists — GlobalLimit(50) outputs; the
  *     corpus itself never reaches either window.
  *   - `o7_global_rownum`, `x17_equal_freq_binning`: the prefix-sum
  *     window inside `WindowOps.globalRowNumber` — a running sum over
  *     the PER-PARTITION COUNT table (≤ #partitions rows, an aggregate
  *     output); the corpus-grain numbering itself is partitioned by
  *     range-repartition, exactly the decomposition's point.
  *   - `t24_zipf_fit`: row_number over the word-FREQUENCY table (an
  *     aggregate output at vocabulary grain — orders of magnitude below
  *     corpus grain, and a Zipf fit needs the global rank axis; at
  *     true web-vocabulary scale the fit would subsample ranks first).
  *   - `v14_cumulative_uniques`: running sum over the day-grain
  *     new-user aggregate — ≤ #days rows.
  *   - `v7_watermark_audit`: the bucket-prefix running-max table inside
  *     `EventWindows.watermarkAudit` — per-partition max rows (the
  *     PlanSpec v7 test additionally pins it as the ONLY
  *     single-partition stage in that plan).
  */
class UnpartitionedWindowSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  /** query -> number of unpartitioned Window nodes in its optimized
    * plan. Every entry here is individually justified in the class
    * scaladoc; additions must extend BOTH. */
  private val Allowlist: Map[String, Int] = Map(
    "e15_rrf_fusion" -> 2,
    "o7_global_rownum" -> 1,
    "t24_zipf_fit" -> 1,
    "v14_cumulative_uniques" -> 1,
    "v7_watermark_audit" -> 1,
    "x17_equal_freq_binning" -> 1)

  private def unpartitioned(p: LogicalPlan): Seq[Window] = p.collect {
    case w: Window if w.partitionSpec.isEmpty => w
  }

  private def bounded(p: LogicalPlan): Boolean = p.collectFirst {
    case _: Aggregate => true
    case _: GlobalLimit => true
    case _: LocalRelation => true
    case _: OneRowRelation => true
  }.isDefined

  test("every unpartitioned window on the board is allowlisted and sits above a bounded input") {
    val found = scala.collection.mutable.Map[String, Int]()
    val unboundedOffenders = scala.collection.mutable.ListBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = fn(spark, sfDir).queryExecution.optimizedPlan
      val ws = unpartitioned(plan)
      if (ws.nonEmpty) {
        found(name) = ws.size
        ws.foreach { w =>
          if (!bounded(w.child))
            unboundedOffenders += s"$name: $w"
        }
      }
    }
    assert(unboundedOffenders.isEmpty,
      s"unpartitioned windows over UNBOUNDED input (no aggregate/limit/" +
        s"literal below them):\n${unboundedOffenders.mkString("\n")}")
    assert(found.toMap == Allowlist,
      s"unpartitioned-window census drifted from the allowlist.\n" +
        s"found:     ${found.toSeq.sorted}\n" +
        s"allowlist: ${Allowlist.toSeq.sorted}\n" +
        "A new unpartitioned window must be justified in this suite's " +
        "scaladoc and added to the allowlist (or partitioned away).")
  }
}
