package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join-family operators (SURVEY.md §2.F) + key-set diagnostics.
  *
  * Scale notes: dimension-sized sides are explicitly `broadcast()`; the
  * presence/mapping tables are built from `distinct` single-column
  * frames (map-side combinable) so they stay bounded regardless of fact
  * cardinality. Multi-way fact joins rely on Catalyst/AQE for strategy
  * and reorder.
  */
object Joins {

  /** J1 — full-outer presence join (reference `create_mapping_table`,
    * data_merger.py:29-64: set algebra + a Python row loop → one
    * relational plan). Output: one row per key with
    * `in_left`/`in_right`/`can_merge` flags. */
  def presenceTable(
      left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String,
      outKey: String): DataFrame = {
    val l = left.select(col(leftKey).as(outKey)).distinct()
      .withColumn("in_left", lit(true))
    val r = right.select(col(rightKey).as(outKey)).distinct()
      .withColumn("in_right", lit(true))
    l.join(r, Seq(outKey), "full_outer")
      .withColumn("in_left", coalesce(col("in_left"), lit(false)))
      .withColumn("in_right", coalesce(col("in_right"), lit(false)))
      .withColumn("can_merge", col("in_left") && col("in_right"))
  }

  /** As-of join — for each left row, the latest right row with
    * `rightTime <= leftTime` on the same key. Spark has no native asof
    * operator; rather than a range-join (quadratic blowup per key), this
    * composes it as **union + ordered window forward-fill**: tag both
    * sides, sort within key by (time, side) putting right rows first at
    * equal times (inclusive asof), carry the last right payload forward,
    * keep left rows with a match.
    *
    * Scale: one hash exchange on `key`, one in-partition sort — the same
    * cost envelope as any windowed op; no per-key quadratic work. Right
    * rows should be unique per (key, rightTime) (dedupe upstream) so the
    * match is deterministic.
    */
  def asOfJoin(
      left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      payloadCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val leftCols = left.columns.toSeq
    // carry the payload as ONE struct so the fill is row-atomic:
    // per-column ffill could blend values from different right rows when
    // a payload value is null, and a null head column would be mistaken
    // for "no match".
    val payloadStruct = struct(payloadCols.map(col): _*)
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
    val r = right
      .withColumnRenamed(key, "__rkey")
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .withColumn("__payload", payloadStruct)
    val payloadType = r.schema("__payload").dataType
    val lAligned = l.withColumn("__payload", lit(null).cast(payloadType))
    val rAligned = leftCols.filterNot(_ == key).foldLeft(r)((d, c) =>
      d.withColumn(c, lit(null).cast(left.schema(c).dataType)))
      .withColumn(key, col("__rkey"))
    val cols = (leftCols ++ Seq("__payload", "__t", "__side")).distinct
    val unioned = lAligned.select(cols.map(col): _*)
      .unionByName(rAligned.select(cols.map(col): _*))
    val w = Window.partitionBy(key).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned.withColumn("__payload",
      last(col("__payload"), ignoreNulls = true).over(w))
    val matched = filled
      .filter(col("__side") === 1 && col("__payload").isNotNull)
    payloadCols.foldLeft(matched)((d, c) =>
        d.withColumn(c, col(s"__payload.$c")))
      .drop("__t", "__side", "__payload")
  }

  /** Skew-safe equi-join: salt the (possibly skewed) fact side into
    * `factor` sub-keys derived from a caller-named high-cardinality
    * column (deterministic — no `rand()`), replicate the dim side across
    * all salts, join on (key, salt). Turns one hot shuffle partition
    * into `factor` even ones; AQE's skew-join handles moderate skew
    * automatically, this is the explicit form for extreme keys.
    * Result equals the plain inner equi-join. */
  def saltedEquiJoin(
      fact: DataFrame, dim: DataFrame, key: String,
      saltSource: Column, factor: Int): DataFrame = {
    val salted = fact.withColumn("__salt", pmod(xxhash64(saltSource), lit(factor)))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(factor - 1L))))
    // hash-build on the replicated dim side: a sort-merge join would sort
    // the big (and by hypothesis skewed) fact side — exactly the cost
    // salting exists to avoid; SHJ streams the fact side unsorted
    salted.join(replicated.hint("shuffle_hash"), Seq(key, "__salt"))
      .drop("__salt")
  }

  /** Snapshot reconciliation: classify every id across two corpus
    * versions as added / removed / changed / unchanged by comparing a
    * content fingerprint through one full-outer key join. Fingerprints
    * are computed map-side on each snapshot before the join, so only
    * (id, fp) pairs shuffle — never the payload; at warehouse scale both
    * snapshots bucket by id (s12 layout) and the join runs with zero
    * exchanges. Presence is ROW presence (an explicit per-side marker
    * surviving the outer join), NOT fingerprint nullity — so an fpOf
    * that returns NULL (e.g. md5 of a NULL payload column) cannot
    * misclassify a present row as added/removed; a pair of present rows
    * with incomparable (NULL) fingerprints lands in `unchanged`, exactly
    * the SQL CASE semantics (`fp_old <> fp_new` is NULL → falls
    * through). The per-id verdict is what an incremental pipeline
    * consumes: reprocess added+changed, retire removed. */
  def snapshotDiff(
      v1: DataFrame, v2: DataFrame, idCol: String,
      fpOf: DataFrame => Column): DataFrame = {
    val a = v1.select(col(idCol), fpOf(v1).as("fp_old"),
      lit(true).as("__in_old"))
    val b = v2.select(col(idCol), fpOf(v2).as("fp_new"),
      lit(true).as("__in_new"))
    a.join(b, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__in_old").isNull, "added")
          .when(col("__in_new").isNull, "removed")
          .when(col("fp_old") =!= col("fp_new"), "changed")
          .otherwise("unchanged").as("status"),
        col("fp_old"), col("fp_new"))
  }

  /** J5 — key-set diagnostics (reference compare_data_sources,
    * data_loader.py:221-256; identify_matching_countries,
    * data_cleaner.py:259-299). One plan, three filters over J1 —
    * preferred over separate intersect/except scans (SURVEY.md J5). */
  def keySetDiagnostics(
      left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String,
      outKey: String): DataFrame = {
    presenceTable(left, leftKey, right, rightKey, outKey)
      .withColumn("membership",
        when(col("can_merge"), "both")
          .when(col("in_left"), "left_only")
          .otherwise("right_only"))
      .select(outKey, "membership")
  }

  /** BANDED range join: match each fact row to the [lo, hi) band
    * containing its value — the "price BETWEEN tier.lo AND tier.hi"
    * dimension join — as a bucket-key EQUI-join instead of the
    * BroadcastNestedLoopJoin Spark plans for a non-equi condition
    * (per-row scans of the whole band table; with a big band table or
    * no broadcastable side it degrades to a cartesian — the non-equi
    * join trap at scale).
    *
    * Shape (the v5 interval-join trick on the VALUE axis): each band
    * explodes map-side into the integer buckets it covers
    * (`(hi−1) div width − lo div width + 1` rows per band — bounded by
    * band width / bucket width), the fact side computes its ONE bucket
    * `value div width`, the join is a plain equi-join on the bucket,
    * and a residual `lo ≤ v < hi` filter exactifies. A value matched
    * by k bands appears k times (bands may overlap; disjoint bands ⇒
    * at most one match). All arithmetic is integer (callers pass
    * integer-grain values, e.g. cents), so bucketing can never
    * misround at a band edge in either engine.
    *
    * `width` tunes the explode factor vs residual selectivity: one
    * bucket per band (width ≥ band span) minimizes exploded rows; many
    * buckets per band sharpen the equi-key. Bands are assumed small
    * (a dimension table) — the exploded frame broadcasts; the fact
    * side never shuffles for this join. */
  def bandJoin(fact: DataFrame, bands: DataFrame, valueCol: String,
      loCol: String, hiCol: String, width: Long): DataFrame = {
    require(width > 0, "bandJoin width must be positive")
    val exploded = bands.withColumn("__bkt",
      explode(expr(s"sequence($loCol div ${width}L, " +
        s"($hiCol - 1) div ${width}L)")))
    fact
      .withColumn("__bkt", expr(s"$valueCol div ${width}L"))
      .join(broadcast(exploded), Seq("__bkt"))
      .filter(col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop("__bkt")
  }
}
