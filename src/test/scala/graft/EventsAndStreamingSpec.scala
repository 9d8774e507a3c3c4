package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.extensions.EventWindows
import graft.streaming.StreamingOps

class EventWindowsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private lazy val events = Seq(
    (1L, ts(0), 1L, "view", 1.0, "{}"),
    (2L, ts(100), 1L, "view", 2.0, "{}"),
    (3L, ts(4000), 1L, "click", 3.0, "{}"),   // gap 3900s > 1800 → new session
    (4L, ts(50), 2L, "view", 4.0, "{}")
  ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("sessionize splits on the inactivity gap") {
    val got = EventWindows.sessionize(events, gapSeconds = 1800)
      .orderBy("user_id", "session_id")
      .select("user_id", "session_id", "n_events", "duration_s")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L, 2L, 100L), (1L, 2L, 1L, 0L), (2L, 1L, 1L, 0L)))
  }

  test("session_window builtin agrees with gaps-and-islands on counts") {
    val a = EventWindows.sessionize(events, 1800)
      .select("user_id", "session_start_s", "n_events")
      .as[(Long, Long, Long)].collect().toSet
    val b = EventWindows.sessionWindowAgg(events, "1800 seconds")
      .select("user_id", "session_start_s", "n_events")
      .as[(Long, Long, Long)].collect().toSet
    assert(a == b)
  }

  test("exactly-the-gap merges in BOTH forms; sub-second precision is the real divergence") {
    // measured boundary semantics, pinned explicitly rather than left
    // to fixtures that avoid the boundary: session_window merges
    // TOUCHING sessions (split iff gap > g at full precision), same
    // split rule as gaps-and-islands — so integer-second data agrees
    // at the SAME gap, exactly-the-gap included. The divergence is
    // PRECISION: a real gap in (g, g+1) that truncates to g merges in
    // the batch form (truncated seconds) but splits in the builtin.
    // Second-truncation removes it — the streaming v2 parity transform.
    val boundary = Seq(
      (1L, ts(0), 1L, "view", 1.0, "{}"),
      (2L, ts(1800), 1L, "view", 2.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    assert(EventWindows.sessionize(boundary, 1800).count() == 1)
    assert(EventWindows.sessionWindowAgg(boundary, "1800 seconds").count() == 1)
    val subsec = Seq(
      (1L, new Timestamp(100L), 1L, "view", 1.0, "{}"),     // 0.1 s
      (2L, new Timestamp(1800900L), 1L, "view", 2.0, "{}")  // 1800.9 s
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    // real gap 1800.8 s > 1800 → the builtin splits ...
    assert(EventWindows.sessionWindowAgg(subsec, "1800 seconds").count() == 2)
    // ... but the truncated-second gap is exactly 1800 → batch merges
    assert(EventWindows.sessionize(subsec, 1800).count() == 1)
    // second-truncation restores agreement at the same gap
    assert(EventWindows.sessionWindowAgg(
      subsec.withColumn("ts", date_trunc("second", col("ts"))),
      "1800 seconds").count() == 1)
  }

  test("tumbling window buckets to the hour") {
    val got = EventWindows.tumbling(events, "1 hour")
      .orderBy("bucket_start_s", "event_type")
      .select("bucket_start_s", "event_type", "n_events")
      .as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((0L, "view", 3L), (3600L, "click", 1L)))
  }

  test("sessionSequences assembles ordered event-type trails per session") {
    val got = EventWindows.sessionSequences(events, gapSeconds = 1800)
      .orderBy("user_id", "session_id")
      .select("user_id", "session_id", "event_seq")
      .as[(Long, Long, String)].collect().toSeq
    assert(got == Seq((1L, 1L, "view>view"), (1L, 2L, "click"),
      (2L, 1L, "view")))
  }

  test("funnel enforces strict order and the conversion window") {
    val fev = Seq(
      // user 1: clean in-order conversion inside the window
      (10L, ts(0), 1L, "view", 0.0, "{}"),
      (11L, ts(10), 1L, "click", 0.0, "{}"),
      (12L, ts(20), 1L, "purchase", 0.0, "{}"),
      // user 2: click BEFORE the first view — must not count as step 2;
      // the later click does, but its purchase precedes the click
      (20L, ts(50), 2L, "click", 0.0, "{}"),
      (21L, ts(60), 2L, "view", 0.0, "{}"),
      (22L, ts(70), 2L, "purchase", 0.0, "{}"),
      (23L, ts(80), 2L, "click", 0.0, "{}"),
      // user 3: converts, but the click lands outside the 100 s window
      (30L, ts(0), 3L, "view", 0.0, "{}"),
      (31L, ts(200), 3L, "click", 0.0, "{}"),
      (32L, ts(210), 3L, "purchase", 0.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventWindows.funnel(fev, Seq("view", "click", "purchase"),
        windowSeconds = Some(100L))
      .select("step", "n_users").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 3L), (2L, 2L), (3L, 1L)))
    // greedy earliest-qualifying step events: user 1 converts in 20 s,
    // and only user 1 reaches step 3
    val avg3 = EventWindows.funnel(fev, Seq("view", "click", "purchase"),
        windowSeconds = Some(100L))
      .filter(col("step") === 3).select("avg_s_from_start")
      .as[Double].head()
    assert(avg3 == 20.0)
  }

  test("scd2History collapses runs into versioned validity intervals") {
    val log = Seq(
      (1L, ts(100), 1L, "view", 0.0, "{}"),
      (2L, ts(200), 1L, "view", 0.0, "{}"),   // same run as event 1
      (3L, ts(300), 1L, "click", 0.0, "{}"),  // version 2
      (4L, ts(400), 1L, "view", 0.0, "{}"),   // view AGAIN → version 3
      (5L, ts(50), 2L, "error", 0.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = graft.operators.WindowOps.scd2History(log, "user_id",
        "event_type", "ts", Seq(col("ts"), col("event_id")))
      .orderBy("user_id", "version")
      .select("user_id", "version", "event_type", "valid_from", "valid_to",
        "n_events", "is_current")
      .as[(Long, Long, String, Long, Option[Long], Long, Boolean)]
      .collect().toSeq
    assert(got == Seq(
      (1L, 1L, "view", 100L, Some(300L), 2L, false),
      (1L, 2L, "click", 300L, Some(400L), 1L, false),
      (1L, 3L, "view", 400L, None, 1L, true),
      (2L, 1L, "error", 50L, None, 1L, true)))
  }

  test("scd2History treats NULL attribute values as runs of their own") {
    // null-SAFE change detection: [view, NULL, NULL, view] must yield
    // three versions (the NULL pair is one run), never tied version
    // numbers with nondeterministic valid_to
    val log = Seq(
      (1L, ts(100), 1L, Some("view"), 0.0, "{}"),
      (2L, ts(200), 1L, None, 0.0, "{}"),
      (3L, ts(300), 1L, None, 0.0, "{}"),
      (4L, ts(400), 1L, Some("view"), 0.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = graft.operators.WindowOps.scd2History(log, "user_id",
        "event_type", "ts", Seq(col("ts"), col("event_id")))
      .orderBy("version")
      .select("version", "event_type", "valid_from", "valid_to", "n_events")
      .as[(Long, Option[String], Long, Option[Long], Long)].collect().toSeq
    assert(got == Seq(
      (1L, Some("view"), 100L, Some(200L), 1L),
      (2L, None, 200L, Some(400L), 2L),
      (3L, Some("view"), 400L, None, 1L)))
  }

  test("scd2History numbers from version 1 even when the first attribute is NULL") {
    // without the unconditional first-row run start, NULL <=> NULL on
    // row 1 suppresses the change marker and this key's history would
    // number 0, 1 — breaking consumers that key on version == 1 for
    // the initial dimension row
    val log = Seq(
      (1L, ts(100), 1L, None, 0.0, "{}"),
      (2L, ts(200), 1L, Some("view"), 0.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = graft.operators.WindowOps.scd2History(log, "user_id",
        "event_type", "ts", Seq(col("ts"), col("event_id")))
      .orderBy("version")
      .select("version", "event_type", "valid_from", "is_current")
      .as[(Long, Option[String], Long, Boolean)].collect().toSeq
    assert(got == Seq(
      (1L, None, 100L, false),
      (2L, Some("view"), 200L, true)))
  }

  test("runningMaxExclusive agrees with the naive global window across buckets") {
    val df = Seq(0L -> 5L, 1L -> 3L, 2L -> 9L, 3L -> 1L, 4L -> 9L,
      5L -> 2L, 6L -> 12L, 7L -> 0L, 8L -> 7L, 9L -> 15L).toDF("seq", "v")
    // 4 test shuffle partitions force prefix handoff across range buckets
    val got = EventWindows.runningMaxExclusive(df, "seq", "v", "rm")
      .orderBy("seq").select("seq", "rm")
      .as[(Long, Option[Long])].collect().toSeq
    val want = Seq(0L -> None, 1L -> Some(5L), 2L -> Some(5L), 3L -> Some(9L),
      4L -> Some(9L), 5L -> Some(9L), 6L -> Some(9L), 7L -> Some(12L),
      8L -> Some(12L), 9L -> Some(12L))
    assert(got == want)
  }

  test("watermarkAudit verdicts match streaming drops (beyond window width)") {
    // feed the same four events ONE PER MICRO-BATCH through a real
    // watermarked windowed aggregate: with one arrival per batch, the
    // streaming watermark (max prior-batch event time − delay) is
    // exactly the audit's running max over prior arrivals − delay.
    // SCOPE: the audit's verdict is ROW-level (ts < wm) while streaming
    // windowed-agg eviction is WINDOW-level (window.end <= wm), so the
    // two agree except for rows within one window-width below the
    // watermark (audit-late but their window still open). The fixture's
    // late event sits 900 s below the watermark — far past the 100 s
    // window — so both rules give the same verdict here; the audit is
    // the conservative (row-granularity) bound.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingOps.Event
    implicit val sqlCtx = spark.sqlContext
    val evs = Seq(Event(1, ts(1000), 1L, "view", 1.0),
      Event(2, ts(2000), 1L, "view", 1.0),
      Event(3, ts(500), 1L, "click", 1.0),   // audit: late
      Event(4, ts(1500), 1L, "view", 1.0))
    val input = MemoryStream[Event]
    val q = input.toDS().toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "100 seconds").as("w"))
      .agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("wm_parity_out")
      .outputMode("append").start()
    try {
      evs.foreach { e => input.addData(e); q.processAllAvailable() }
      // a far-future flush event closes every surviving window
      input.addData(Event(5, ts(100000), 1L, "view", 1.0))
      q.processAllAvailable()
      val streamedKept = spark.table("wm_parity_out")
        .select(unix_timestamp(col("w.start")).as("ws"), col("n"))
        .as[(Long, Long)].collect().toSet
      // events 1/2/4 survive in their own 100 s windows; event 3 was
      // dropped by the real watermark — exactly the audit's verdict
      assert(streamedKept == Set((1000L, 1L), (1500L, 1L), (2000L, 1L)))
      val auditLate = EventWindows.watermarkAudit(
          spark.createDataset(evs).toDF(), delaySeconds = 600L)
        .filter(col("is_late")).select("event_id").as[Long].collect().toSeq
      assert(auditLate == Seq(3L))
    } finally q.stop()
  }

  test("intervalJoin compares at epoch-µs — sub-µs ticks cannot flip it") {
    // ns-precision fixture staged through the PRODUCTION read path: the
    // parquet `ts` is raw epoch-ns longs (the TIMESTAMP(NANOS) shape the
    // driver tables have under nanosAsLong), truncated to µs by
    // Tables.events. An engine that kept nanoseconds (DuckDB) and
    // compared raw timestamps would decide both planted boundary pairs
    // the OTHER way; the epoch-µs convention (Spark predicate on
    // unix_micros, oracle on epoch_us) makes both engines agree.
    val lagS = 10L
    val lagUs = lagS * 1000000L
    val base = 1000L * 1000000000L // epoch 1000 s, in ns
    val rows = Seq(
      (1L, base + 700L, 1L, "view", 0.0, "{}"),
      // click 400 ns BEFORE the view, same µs: the µs convention pairs
      // them (tie); raw-ns `r_ts >= l_ts` would not — flip #1
      (10L, base + 300L, 1L, "click", 0.0, "{}"),
      // click in the first µs past the upper bound l_us + lag: excluded
      // at µs; raw-ns `r_ts < l_ts + lag` would include it — flip #2
      (11L, base + lagUs * 1000L + 100L, 1L, "click", 0.0, "{}"),
      // plain in-window click — included under both conventions
      (12L, base + 5L * 1000000000L, 1L, "click", 0.0, "{}"))
    val tmp = java.nio.file.Files.createTempDirectory("graft-ns").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val ev = graft.sources.Tables.events(spark, tmp)
    val got = EventWindows.intervalJoin(
        ev.filter(col("event_type") === "view"),
        ev.filter(col("event_type") === "click"), lagS)
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet

    // ground truths computed over the raw ns longs
    val views = rows.filter(_._4 == "view").map(r => (r._1, r._2))
    val clicks = rows.filter(_._4 == "click").map(r => (r._1, r._2))
    def pairs(keep: (Long, Long) => Boolean): Set[(Long, Long)] =
      (for { (v, vn) <- views; (c, cn) <- clicks if keep(vn, cn) }
        yield (v, c)).toSet
    val usConvention = pairs((vn, cn) =>
      cn / 1000 >= vn / 1000 && cn / 1000 < vn / 1000 + lagUs)
    val rawNs = pairs((vn, cn) => cn >= vn && cn < vn + lagUs * 1000L)
    assert(got == usConvention)   // == the oracle's epoch_us semantics
    assert(usConvention != rawNs) // the fixture discriminates raw-ts
    assert((usConvention -- rawNs) == Set((1L, 10L)))
    assert((rawNs -- usConvention) == Set((1L, 11L)))
  }

  test("watermarkAudit flags exactly the events a watermark would drop") {
    val ev = Seq(
      (1L, ts(1000), 1L, "view", 1.0, "{}"),
      (2L, ts(2000), 1L, "view", 1.0, "{}"),
      (3L, ts(500), 1L, "click", 1.0, "{}"),  // 500 < 2000-600 → late
      (4L, ts(1500), 1L, "view", 1.0, "{}")   // 1500 ≥ 2000-600 → kept
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventWindows.watermarkAudit(ev, delaySeconds = 600L)
      .orderBy("event_id").select("event_id", "is_late")
      .as[(Long, Boolean)].collect().toSeq
    assert(got == Seq(1L -> false, 2L -> false, 3L -> true, 4L -> false))
  }

  test("disorderDelays = naive global replay; audit at delay D flags delay_s > D") {
    // deliberately disordered event times over arrival order = event_id
    val times = Seq(1000L, 2000L, 500L, 1500L, 2500L, 2400L, 100L)
    val ev = times.zipWithIndex.map { case (t, i) =>
      ((i + 1).toLong, ts(t), 1L, "view", 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventWindows.disorderDelays(ev)
      .orderBy("event_id").select("event_id", "delay_s")
      .as[(Long, Long)].collect().toSeq
    // naive replay: delay = max over earlier arrivals of ts − own ts
    val naive = times.zipWithIndex.map { case (t, i) =>
      val delay = if (i == 0) 0L else math.max(times.take(i).max - t, 0L)
      ((i + 1).toLong, delay)
    }
    assert(got == naive)
    // consistency with the audit: a candidate delay D drops exactly the
    // events whose measured disorder exceeds D
    val d = 600L
    val late = EventWindows.watermarkAudit(ev, delaySeconds = d)
      .orderBy("event_id").select("is_late").as[Boolean].collect().toSeq
    assert(late == naive.map(_._2 > d))
  }
}

class TemporalSplitSpec extends SparkSpec {
  import spark.implicits._
  import java.sql.Timestamp

  private def t(s: Long) = new Timestamp(s * 1000L)

  // range [0, 1000]: t1 = 600, gap = 10, t2 = 800 →
  // train [0,600) · embargo [600,610) · val [610,800) ·
  // embargo [800,810) · test [810,1000]
  private lazy val events = Seq(
    (1L, t(0)),    // train  (also pins lo)
    (1L, t(599)),  // train boundary inside
    (2L, t(600)),  // embargo — first boundary straddle dropped
    (2L, t(609)),  // embargo
    (2L, t(610)),  // val opens exactly after the gap
    (3L, t(700)),  // val
    (3L, t(805)),  // embargo 2
    (4L, t(810)),  // test opens
    (4L, t(1000)), // test (pins hi)
    (5L, t(100)),  // train-only user
    (6L, t(50)),   // the SPANNING user: train ...
    (6L, t(900))   // ... and test — per-user state leaks the boundary
  ).toDF("user_id", "ts")

  private lazy val got = EventWindows.temporalSplit(events)
    .as[(String, Long, Long, Long)].collect()
    .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("temporalSplit: integer boundaries, embargo drops straddlers") {
    // (n_events, n_users, n_spanning_users) per split; user 2's
    // embargo+val presence is NOT spanning (embargo excluded, one real
    // split) — only user 6 (train+test) spans
    assert(got == Map(
      "train" -> ((4L, 3L, 1L)),
      "embargo" -> ((3L, 2L, 1L)),
      "val" -> ((2L, 2L, 1L)),
      "test" -> ((3L, 2L, 1L))))
  }
}

class StreamingSpec extends SparkSpec {

  test("streaming tumbling agg over a file source matches the batch form") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-stream").toString
    // stage a static slice of events as the "arriving" files
    val batchEvents = graft.sources.Tables.events(spark, sf0001).limit(500)
    batchEvents.write.mode("overwrite").parquet(tmp)

    val stream = StreamingOps.readEventStream(spark, tmp)
    StreamingOps.runToMemory(
      StreamingOps.tumblingCounts(stream, "1 hour"), "stream_tumbling", "complete")
    val streamed = spark.table("stream_tumbling")
      .select(unix_timestamp(col("bucket_start")).as("b"), col("event_type"),
        col("n_events"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

    val batch = EventWindowsBatch.counts(spark.read.parquet(tmp))
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("streaming sliding agg matches the batch sliding form") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-stream3").toString
    graft.sources.Tables.events(spark, sf0001).limit(500)
      .write.mode("overwrite").parquet(tmp)
    val stream = StreamingOps.readEventStream(spark, tmp)
    StreamingOps.runToMemory(
      StreamingOps.slidingCounts(stream, "1 hour", "15 minutes"),
      "stream_sliding", "complete")
    val streamed = spark.table("stream_sliding")
      .select(unix_timestamp(col("bucket_start")).as("b"), col("event_type"),
        col("n_events"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val batch = spark.read.parquet(tmp)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(unix_timestamp(col("window.start")).as("b"), col("event_type"),
        col("n_events"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("streaming incremental ingest dedups across micro-batches via the index") {
    import graft.extensions.TextAnalysis
    val root = java.nio.file.Files.createTempDirectory("graft-ingest").toString
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .filter(col("doc_id") < 100)
    val b1 = docs.filter(col("doc_id") < 50)
    // batch 2 re-delivers five batch-1 docs under new ids + 50 fresh docs
    val redelivered = b1.filter(col("doc_id") < 5)
      .withColumn("doc_id", col("doc_id") + 1000)
    val b2 = docs.filter(col("doc_id") >= 50).unionByName(redelivered)
    b1.coalesce(1).write.parquet(s"$root/in")
    Thread.sleep(1100) // distinct mtimes → deterministic batch order
    b2.coalesce(1).write.mode("append").parquet(s"$root/in")

    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$root/in")
    val q = StreamingOps.incrementalIngest(
      stream, s"$root/idx", s"$root/out", s"$root/chk")
    q.processAllAvailable(); q.stop()

    val out = spark.read.parquet(s"$root/out")
    // redelivered content was dropped by the cross-batch index
    assert(out.filter(col("doc_id") >= 1000).count() == 0)
    // output is content-unique and covers every distinct input content
    val expected = b1.unionByName(b2)
      .select(TextAnalysis.normHash(col("text"))).distinct().count()
    assert(out.count() == expected)
    assert(out.select(TextAnalysis.normHash(col("text"))).distinct()
      .count() == expected)
  }

  test("streaming metric-state ingest equals the from-scratch aggregate") {
    val root = java.nio.file.Files.createTempDirectory("graft-metric").toString
    // deterministic split (limit-without-order can pick different rows
    // per evaluation); no inter-write sleep: the partial-state merge is
    // commutative, so batch arrival order is irrelevant here
    val ev = graft.sources.Tables.events(spark, sf0001)
      .filter(col("event_id") < 600)
    val b1 = ev.filter(col("event_id") < 300)
    val b2 = ev.filter(col("event_id") >= 300)
    // empty/missing state reads as an empty metric (bootstrap contract)
    assert(graft.streaming.StreamingOps
      .metricState(spark, s"$root/state").count() == 0)
    b1.coalesce(1).write.parquet(s"$root/in")
    b2.coalesce(1).write.mode("append").parquet(s"$root/in")

    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$root/in")
    val q = StreamingOps.metricStateIngest(
      stream, s"$root/state", s"$root/chk")
    q.processAllAvailable(); q.stop()

    // two micro-batches → two partial-state directories, never merged
    // on disk; merge-on-read must equal the from-scratch aggregate
    val got = StreamingOps.metricState(spark, s"$root/state")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toSet
    val want = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("value").cast("decimal(38,6)")).as("s2"))
      .select(col("event_type"), col("n_rows"),
        round(col("s2"), 2).cast("double").as("sum_value"),
        (col("s2").cast("double") / col("n_rows")).as("avg_value"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toSet
    assert(got == want && got.nonEmpty)

    // compaction folds the two partials into ONE directory; the merged
    // metric is unchanged (the merge algebra applied at rest)
    StreamingOps.compactMetricState(spark, s"$root/state",
      snapshotBatchId = 1L)
    val dirs = new java.io.File(s"$root/state").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs == Set("batch_id=1"),
      s"expected one compacted snapshot partial, got $dirs")
    val after = StreamingOps.metricState(spark, s"$root/state")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toSet
    assert(after == want)
    // rerun is idempotent (the crash-recovery contract: each protocol
    // step is re-runnable)
    StreamingOps.compactMetricState(spark, s"$root/state",
      snapshotBatchId = 1L)
    val again = StreamingOps.metricState(spark, s"$root/state")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toSet
    assert(again == want)
  }

  test("metric-state compaction recovers from a crash between delete and rename") {
    val root = java.nio.file.Files.createTempDirectory("graft-mcrash").toString
    val ev = graft.sources.Tables.events(spark, sf0001)
      .filter(col("event_id") < 600)
    // two committed partials, written the way the ingest loop writes them
    def partial(df: org.apache.spark.sql.DataFrame, b: Long) =
      df.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(38,6)")).as("s"))
        .write.mode("overwrite").parquet(s"$root/state/batch_id=$b")
    partial(ev.filter(col("event_id") < 300), 0L)
    partial(ev.filter(col("event_id") >= 300), 1L)
    val want = StreamingOps.metricState(spark, s"$root/state")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toSet
    // simulate run A crashing between protocol steps 2 and 3: the FULL
    // merge is durably committed to the sibling temp, and one old
    // partial is already gone
    // (the temp carries the RAW partial columns — exact decimal sums,
    // not the rounded metric — exactly what step 1 writes)
    ev.groupBy(col("event_type"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("value").cast("decimal(38,6)")).as("s"))
      .write.mode("overwrite").parquet(s"$root/state.compact_tmp")
    def rmr(p: String): Unit = {
      val f = new java.io.File(p)
      if (f.isDirectory) f.listFiles().foreach(c => rmr(c.getPath))
      f.delete(); ()
    }
    rmr(s"$root/state/batch_id=0")
    // a reader in this window sees STALE-LOW, never a double count
    val during = StreamingOps.metricState(spark, s"$root/state")
      .agg(coalesce(sum(col("n_rows")), lit(0L)).as("t"))
      .first().getLong(0)
    assert(during < want.map(_._2).sum)
    // the rerun must skip the (lossy) re-merge — the committed temp IS
    // the complete state — and finish cleanup
    StreamingOps.compactMetricState(spark, s"$root/state",
      snapshotBatchId = 1L)
    val recovered = StreamingOps.metricState(spark, s"$root/state")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toSet
    assert(recovered == want,
      "a committed temp must win over the partially-deleted partials")
    assert(!new java.io.File(s"$root/state.compact_tmp").exists())
  }

  test("stream-static enrichment join matches the batch form") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-stream5").toString
    graft.sources.Tables.events(spark, sf0001).limit(500)
      .write.mode("overwrite").parquet(tmp)
    val dim = graft.sources.Tables.customer(spark, sf0001)
      .select(col("c_custkey"), col("c_mktsegment"))

    val stream = StreamingOps.readEventStream(spark, tmp)
    StreamingOps.runToMemory(
      StreamingOps.enrichedSegmentCounts(stream, dim), "stream_enrich",
      "complete")
    val streamed = spark.table("stream_enrich")
      .select("c_mktsegment", "event_type", "n_events", "sum_value")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet

    val batch = StreamingOps
      .enrichedSegmentCounts(spark.read.parquet(tmp), dim)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("stream-stream interval join matches the blocked batch form") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-stream4").toString
    graft.sources.Tables.events(spark, sf0001).limit(500)
      .write.mode("overwrite").parquet(tmp)
    val staged = spark.read.parquet(tmp)
    val views = staged.filter(col("event_type") === "view")
    val clicks = staged.filter(col("event_type") === "click")

    val stream = StreamingOps.readEventStream(spark, tmp)
    StreamingOps.runToMemory(
      StreamingOps.intervalJoinStream(
        stream.filter(col("event_type") === "view"),
        stream.filter(col("event_type") === "click"), maxLagSeconds = 7200L),
      "stream_ijoin", "append")
    val streamed = spark.table("stream_ijoin")
      .select("l_id", "r_id", "lag_s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val batch = graft.extensions.EventWindows
      .intervalJoin(views, clicks, maxLagSeconds = 7200L)
      .collect().map(r => (r.getAs[Long]("l_id"), r.getAs[Long]("r_id"),
        r.getAs[Long]("lag_s"))).toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("streaming session windows produce rows under append-with-watermark") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-stream2").toString
    graft.sources.Tables.events(spark, sf0001).limit(500)
      .write.mode("overwrite").parquet(tmp)
    val stream = StreamingOps.readEventStream(spark, tmp)
    StreamingOps.runToMemory(
      StreamingOps.sessionCounts(stream, "30 minutes"), "stream_sessions",
      "complete")
    assert(spark.table("stream_sessions").count() > 0)
  }

  test("streaming session windows over the full events fixture equal the batch v2_sessionize query") {
    // SURVEY §7.4 state-parity, promoted from "documented" to executed:
    // the board's v2_sessionize (gaps-and-islands batch form) replayed
    // as a REAL Structured Streaming session_window run — several
    // micro-batches, session state merged across them by the state
    // store — must produce the identical (user, session_start,
    // n_events) set over the full sf0.001 events fixture.
    val tmp = java.nio.file.Files.createTempDirectory("graft-stream-v2").toString
    // stage four files in EVENT-TIME order (ntile over ts, distinct
    // mtimes → the file source replays them as four ordered
    // micro-batches): a broker replay in rough time order. Time-ordered
    // arrival matters — the watermark filter drops rows older than
    // max(ts)−10min from PREVIOUS batches even before state eviction,
    // so randomly-partitioned files (each spanning the full range)
    // would lose most of batches 2-4 and the parity assert below would
    // (correctly!) fail. That failure mode is itself pinned by the
    // watermarkAudit tests; here the claim is exact batch parity.
    //
    // ts truncates to integer seconds at staging: both forms split iff
    // gap > 1800, but the batch form evaluates the gap on TRUNCATED
    // seconds while session_window uses full precision — a real gap in
    // (1800 s, 1801 s) would merge in batch and split in streaming.
    // On second-truncated data the two are identical at the SAME gap
    // (sessionWindowAgg's documented precision convention, pinned at
    // the boundary in EventWindowsSpec), so the parity below holds by
    // construction, not by fixture luck.
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("ts"))
    val ranked = graft.sources.Tables.events(spark, sf0001)
      .withColumn("ts", date_trunc("second", col("ts")))
      .withColumn("__f", ntile(4).over(w))
    for (i <- 1 to 4) {
      ranked.filter(col("__f") === i).drop("__f")
        .coalesce(1).write.mode("append").parquet(tmp)
      Thread.sleep(1100) // distinct mtimes → deterministic batch order
    }
    val stream = spark.readStream.schema(StreamingOps.eventSchema)
      .option("maxFilesPerTrigger", 1).parquet(tmp)
    StreamingOps.runToMemory(
      StreamingOps.sessionCounts(stream, "1800 seconds"), "stream_v2_parity",
      "complete")
    val streamed = spark.table("stream_v2_parity")
      .select(col("user_id"), unix_timestamp(col("session_start")).as("s"),
        col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = SparkEntry.queries("v2_sessionize")(spark, sf0001)
      .select(col("user_id"), col("session_start_s"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch)
    assert(streamed.size > 100) // the fixture genuinely sessionizes
  }

  test("streaming tumbling windows over the full events fixture equal the batch v1_tumbling_window query") {
    // v1 promoted from the single-micro-batch smoke in StreamingSpec to
    // the v2 discipline (VERDICT r7 item 2): four REAL micro-batches
    // through the 10-minute watermark, asserted set-equal to the
    // board's batch v1 query on EVERY column including the
    // decimal-exact sum. Event-time-ordered staging (ntile over ts)
    // makes batch i+1's min ts ≥ batch i's max ts, so the watermark
    // filter provably drops nothing and exact parity is the correct
    // expectation — hour-bucket membership is insensitive to the
    // sub-second precision that made v2 need second truncation.
    val tmp = java.nio.file.Files.createTempDirectory("graft-stream-v1").toString
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("ts"))
    val ranked = graft.sources.Tables.events(spark, sf0001)
      .withColumn("__f", ntile(4).over(w))
    for (i <- 1 to 4) {
      ranked.filter(col("__f") === i).drop("__f")
        .coalesce(1).write.mode("append").parquet(tmp)
      Thread.sleep(1100) // distinct mtimes → deterministic batch order
    }
    val stream = spark.readStream.schema(StreamingOps.eventSchema)
      .option("maxFilesPerTrigger", 1).parquet(tmp)
    StreamingOps.runToMemory(
      StreamingOps.tumblingCounts(stream, "1 hour"), "stream_v1_parity",
      "complete")
    val streamed = spark.table("stream_v1_parity")
      .select(unix_timestamp(col("bucket_start")).as("s"), col("event_type"),
        col("n_events"), col("sum_value"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    val batch = SparkEntry.queries("v1_tumbling_window")(spark, sf0001)
      .select(col("bucket_start_s"), col("event_type"), col("n_events"),
        col("sum_value"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(streamed == batch)
    assert(streamed.size > 100) // the fixture genuinely buckets
  }

  test("executed watermark drops equal the batch-grain replay; v7's audit is their upper bound") {
    // v7's sizing claim EXECUTED (VERDICT r7 item 2): replay the same
    // simulated at-least-once redelivery order the v7 query audits —
    // arrival = event_id displaced by a replayable md5 jitter — as four
    // REAL micro-batches through withWatermark(600 s) (dedupedStream's
    // 10-minute delay) and observe which events Spark actually drops.
    // Asserted: (1) the executed drop set equals a batch-grain
    // watermark replay (wm for batch i = max event time over batches
    // < i, minus the delay — Spark advances the watermark BETWEEN
    // micro-batches, never inside one); (2) the row-grain
    // watermarkAudit (v7's operator, run_max over the full arrival
    // prefix ≥ run_max over previous batches only) flags a SUPERSET —
    // the conservative bound a pre-deployment sizing query must give.
    val tmp = java.nio.file.Files.createTempDirectory("graft-stream-v7").toString
    import spark.implicits._
    // %600 jitter (vs the query's %5): displacements up to ~2.4 batch
    // widths (600 of 250 arrival slots) — necessary because the
    // watermark an operator SEES in batch N reflects event times only
    // through batch N−2 (measured below: publication lags one batch;
    // the progress log's wm field is the post-batch value), so an
    // event late only vs the immediately previous batch is never
    // dropped, and single-boundary stragglers would make this test
    // vacuously empty-vs-empty
    val jit = graft.extensions.Dedup.md5Hash60(
      col("event_id").cast("string")) % 600
    val ev = graft.sources.Tables.events(spark, sf0001)
      .withColumn("ts", date_trunc("second", col("ts")))
      .withColumn("__arr",
        (col("event_id") + jit) * lit(1048576L) + col("event_id"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("__arr"))
    val ranked = ev.withColumn("__f", ntile(4).over(w))
      .localCheckpoint(eager = false) // one ntile evaluation for all consumers
    val batches = (1 to 4).map(i => ranked.filter(col("__f") === i)
      .select(col("event_id"), col("ts").cast("long").as("s"))
      .as[(Long, Long)].collect().toSeq)
    // batch-grain replay of the MEASURED watermark publication rule:
    // the wm during batch i (1-based) is max event time over batches
    // 1..i−2, minus the delay — batches 1 and 2 see no effective
    // watermark (Spark publishes epoch 0, below any real event time)
    val maxes = batches.map(_.map(_._2).max)
    val predicted = scala.collection.mutable.Set[Long]()
    for (i <- batches.indices; (id, s) <- batches(i)) {
      if (i >= 2 && s < maxes.take(i - 1).max - 600L) predicted += id
    }
    for (i <- 1 to 4) {
      ranked.filter(col("__f") === i).drop("__f", "__arr")
        .coalesce(1).write.mode("append").parquet(tmp)
      Thread.sleep(1100) // distinct mtimes → deterministic batch order
    }
    val stream = spark.readStream.schema(StreamingOps.eventSchema)
      .option("maxFilesPerTrigger", 1).parquet(tmp)
    // which operator actually DROPS late rows was measured before this
    // test was written (Spark 4.1.2): plain window/session aggregates
    // ADMIT late rows in update/append/complete modes
    // (numRowsDroppedByWatermark = 0; a late row re-creates evicted
    // state and emits — the documented "may or may not be dropped"
    // caveat resolving to "not"), while the streaming DEDUP operator
    // filters them on input (numRowsDroppedByWatermark counts exactly
    // the ts < wm rows). So the executed form is the production ingest
    // shape v7 sizes anyway: watermark + dropDuplicates(event_id) in
    // append mode — every admitted row emits once (ids are unique
    // here), so an id absent from the sink IS an executed drop.
    StreamingOps.runToMemory(
      stream.withWatermark("ts", "600 seconds")
        .dropDuplicates("event_id"),
      "stream_v7_drops", "append")
    val survivors = spark.table("stream_v7_drops")
      .select("event_id").as[Long].collect().toSet
    val executedDrops = batches.flatten.map(_._1).toSet -- survivors
    assert(executedDrops == predicted.toSet)
    assert(executedDrops.nonEmpty) // the watermark genuinely bites
    val audited = graft.extensions.EventWindows
      .watermarkAudit(ranked, delaySeconds = 600L, seqCol = "__arr")
      .filter(col("is_late")).select("event_id").as[Long].collect().toSet
    assert(executedDrops.subsetOf(audited))
  }

  test("streaming sliding windows over the full events fixture equal the batch v4_sliding_window query") {
    // v4 promoted to the v1/v2 discipline (VERDICT r8 item 5): four REAL
    // micro-batches through the 10-minute watermark, set-equal to the
    // board's batch v4 query on every column including the
    // decimal-exact sum. The v1 losslessness argument transfers whole:
    // event-time-ordered staging (ntile over ts) means batch i+1's min
    // ts ≥ batch i's max ts, so the watermark drops nothing; the
    // sliding form only widens each event's fan-out to windowDur/slide
    // = 4 buckets, which is order-insensitive.
    val tmp = java.nio.file.Files.createTempDirectory("graft-stream-v4").toString
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("ts"))
    val ranked = graft.sources.Tables.events(spark, sf0001)
      .withColumn("__f", ntile(4).over(w))
    for (i <- 1 to 4) {
      ranked.filter(col("__f") === i).drop("__f")
        .coalesce(1).write.mode("append").parquet(tmp)
      Thread.sleep(1100) // distinct mtimes → deterministic batch order
    }
    val stream = spark.readStream.schema(StreamingOps.eventSchema)
      .option("maxFilesPerTrigger", 1).parquet(tmp)
    StreamingOps.runToMemory(
      StreamingOps.slidingCounts(stream, "1 hour", "15 minutes"),
      "stream_v4_parity", "complete")
    val streamed = spark.table("stream_v4_parity")
      .select(unix_timestamp(col("bucket_start")).as("s"), col("event_type"),
        col("n_events"), col("sum_value"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    val batch = SparkEntry.queries("v4_sliding_window")(spark, sf0001)
      .select(col("bucket_start_s"), col("event_type"), col("n_events"),
        col("sum_value"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(streamed == batch)
    assert(streamed.size > 100) // the fixture genuinely slides
  }

  test("stream-static enrichment over the full events fixture equals the batch v6_stream_static_join query") {
    // v6 promoted to the same discipline: the static customer dim joins
    // four REAL micro-batches of the full events fixture (Structured
    // Streaming's native stream-static join — the stream side never
    // shuffles for it), complete-mode rollup set-equal to the board's
    // batch v6 query on every column. No watermark is involved, so
    // staging order is irrelevant; the ntile staging just keeps the
    // batch boundaries deterministic.
    val tmp = java.nio.file.Files.createTempDirectory("graft-stream-v6").toString
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("ts"))
    val ranked = graft.sources.Tables.events(spark, sf0001)
      .withColumn("__f", ntile(4).over(w))
    for (i <- 1 to 4) {
      ranked.filter(col("__f") === i).drop("__f")
        .coalesce(1).write.mode("append").parquet(tmp)
      Thread.sleep(1100) // distinct mtimes → deterministic batch order
    }
    val dim = graft.sources.Tables.customer(spark, sf0001)
      .select(col("c_custkey"), col("c_mktsegment"))
    val stream = spark.readStream.schema(StreamingOps.eventSchema)
      .option("maxFilesPerTrigger", 1).parquet(tmp)
    StreamingOps.runToMemory(
      StreamingOps.enrichedSegmentCounts(stream, dim),
      "stream_v6_parity", "complete")
    val streamed = spark.table("stream_v6_parity")
      .select("c_mktsegment", "event_type", "n_events", "sum_value")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    val batch = SparkEntry.queries("v6_stream_static_join")(spark, sf0001)
      .select("c_mktsegment", "event_type", "n_events", "sum_value")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(streamed == batch)
    assert(streamed.size > 10) // 5 segments × event types genuinely roll up
  }
}

/** Batch mirror of the streaming aggregation for the parity assert. */
object EventWindowsBatch {
  def counts(events: org.apache.spark.sql.DataFrame): Set[(Long, String, Long)] =
    graft.extensions.EventWindows.tumbling(events, "1 hour")
      .collect().map(r => (r.getAs[Long]("bucket_start_s"),
        r.getAs[String]("event_type"), r.getAs[Long]("n_events"))).toSet
}

class StatefulStreamingSpec extends SparkSpec {

  test("flatMapGroupsWithState accumulates per-user state across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingOps
    import graft.streaming.StreamingOps.Event

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = StreamingOps.statefulUserStats(input.toDS())
      .writeStream.format("memory").queryName("stateful_out")
      .outputMode("update").start()
    try {
      def ts(s: Long) = new java.sql.Timestamp(s * 1000)
      input.addData(Event(1, ts(10), 1L, "view", 1.5),
        Event(2, ts(20), 1L, "click", 2.5), Event(3, ts(30), 2L, "view", 4.0))
      q.processAllAvailable()
      input.addData(Event(4, ts(40), 1L, "view", 6.0))
      q.processAllAvailable()
      val rows = spark.table("stateful_out")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      // update mode appends one row per key per batch: last user-1 row
      // must reflect accumulated state across BOTH batches
      val user1 = rows.filter(_._1 == 1L)
      assert(user1.contains((1L, 2L, 4.0)))   // after batch 1
      assert(user1.contains((1L, 3L, 10.0)))  // after batch 2 (state carried)
      assert(rows.contains((2L, 1L, 4.0)))
    } finally q.stop()
  }

  test("transformWithState twin produces batch-identical output to the legacy API") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingOps
    import graft.streaming.StreamingOps.Event

    implicit val sqlCtx = spark.sqlContext
    // transformWithState needs the RocksDB provider (one column family
    // per state variable); scope it to this query and restore after
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[Event]
    val q = StreamingOps.statefulUserStatsTws(input.toDS())
      .writeStream.format("memory").queryName("tws_out")
      .outputMode("update").start()
    try {
      def ts(s: Long) = new java.sql.Timestamp(s * 1000)
      // the exact micro-batch script the legacy-API test runs
      input.addData(Event(1, ts(10), 1L, "view", 1.5),
        Event(2, ts(20), 1L, "click", 2.5), Event(3, ts(30), 2L, "view", 4.0))
      q.processAllAvailable()
      input.addData(Event(4, ts(40), 1L, "view", 6.0))
      q.processAllAvailable()
      val rows = spark.table("tws_out")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      // parity with the flatMapGroupsWithState form: same per-key rows
      // per micro-batch, same carried state, same rounded totals
      val user1 = rows.filter(_._1 == 1L)
      assert(user1.contains((1L, 2L, 4.0)))
      assert(user1.contains((1L, 3L, 10.0)))
      assert(rows.contains((2L, 1L, 4.0)))
      assert(rows.length == 3, s"one row per key per batch, got $rows")
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("streamed rolling z-score reproduces the batch v13 query bit-for-bit on an in-order feed") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingOps
    import graft.streaming.StreamingOps.Event

    implicit val sqlCtx = spark.sqlContext
    // the REAL sf0.001 stream, delivered chronologically in three
    // micro-batches — per-user order across batches then matches the
    // batch query's (us, event_id) window order
    val evs = graft.sources.Tables.events(spark, sf0001)
      .orderBy(col("ts"), col("event_id"))
      .collect()
      .map(r => Event(r.getAs[Long]("event_id"),
        r.getAs[java.sql.Timestamp]("ts"), r.getAs[Long]("user_id"),
        r.getAs[String]("event_type"), r.getAs[Double]("value")))
    val input = MemoryStream[Event]
    val q = StreamingOps.rollingZScoreStream(input.toDS())
      .writeStream.format("memory").queryName("zscore_out")
      .outputMode("append").start()
    try {
      evs.grouped((evs.length + 2) / 3).foreach { chunk =>
        input.addData(chunk.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      val streamed = spark.table("zscore_out")
        .select(col("event_id"), col("user_id"), col("z"), col("is_anomaly"))
        .as[(Long, Long, Option[Double], Boolean)].collect()
        .map(r => r._1 -> (r._2, r._3, r._4)).toMap
      val batch = SparkEntry.queries("v13_rolling_zscore")(spark, sf0001)
        .as[(Long, Long, Option[Double], Boolean)].collect()
        .map(r => r._1 -> (r._2, r._3, r._4)).toMap
      assert(streamed.size == batch.size)
      val diffs = batch.collect {
        case (id, b) if streamed(id) != b => (id, b, streamed(id))
      }
      assert(diffs.isEmpty, s"batch/stream divergence: ${diffs.take(5)}")
      // the fixture actually exercises the interesting rows
      assert(batch.values.exists(_._2.isDefined), "no full windows scored")
    } finally q.stop()
  }

  test("streaming Misra-Gries heavy hitters: bounded state, merged guarantees hold") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingOps
    import graft.streaming.StreamingOps.Event

    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // the REAL sf0.001 stream with a planted hitter: every user_id%5==0
    // event collapses onto user 1, so ~1/5 of the stream is ONE key --
    // above the merged n/(k+1) bound, hence MUST survive the sketch
    val evs = graft.sources.Tables.events(spark, sf0001)
      .orderBy(col("ts"), col("event_id"))
      .collect()
      .map(r => Event(r.getAs[Long]("event_id"),
        r.getAs[java.sql.Timestamp]("ts"),
        { val u = r.getAs[Long]("user_id"); if (u % 5 == 0) 1L else u },
        r.getAs[String]("event_type"), r.getAs[Double]("value")))
    val k = 8
    val shards = 4
    val input = MemoryStream[Event]
    val q = StreamingOps.streamingHeavyHitters(input.toDS(), k, shards)
      .writeStream.format("memory").queryName("hh_out")
      .outputMode("update").start()
    try {
      evs.grouped((evs.length + 2) / 3).foreach { chunk =>
        input.addData(chunk.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      val rows = spark.table("hh_out")
        .as[StreamingOps.ShardHitters].collect().toSeq
      // final state per shard = its highest-n emission (update mode
      // re-emits the accumulated sketch each micro-batch)
      val fin = rows.groupBy(_.shard)
        .map { case (_, rs) => rs.maxBy(_.n_processed) }.toSeq
      assert(fin.map(_.n_processed).sum == evs.length)
      fin.foreach(r => assert(r.counters.size <= k,
        s"shard state exceeded k: ${r.counters.size}"))
      val merged = StreamingOps.mergeHitters(fin.map(_.counters), k)
      assert(merged.size <= k)
      val exact = evs.groupBy(_.user_id)
        .map { case (u, es) => u -> es.size.toLong }
      // the MERGED-sketch guarantee is N/(k+1) over the COMBINED
      // stream (PODS'12) — summing per-shard floors would assert a
      // tighter bound than the algorithm promises
      val bound = fin.map(_.n_processed).sum / (k + 1)
      // the planted hitter makes the capture assertion non-vacuous
      assert(exact.exists(_._2 > bound),
        s"fixture lost its hitter (bound $bound, max ${exact.values.max})")
      merged.foreach { case (u, est) =>
        val t = exact.getOrElse(u, 0L)
        assert(est <= t, s"overestimate for $u: $est > $t")
        assert(t - est <= bound, s"error bound broken for $u")
      }
      exact.filter(_._2 > bound).keys.foreach(u =>
        assert(merged.contains(u), s"heavy hitter $u lost"))
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("event-time-timer sessionization closes sessions at the watermark, matching batch semantics") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingOps
    import graft.streaming.StreamingOps.Event

    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[Event]
    val q = StreamingOps.statefulSessions(input.toDS(), gapSeconds = 1800)
      .writeStream.format("memory").queryName("tws_sessions")
      .outputMode("append").start()
    try {
      def ts(s: Long) = new java.sql.Timestamp(s * 1000)
      val closedPrefix = Seq(
        Event(1, ts(10), 1L, "view", 0.0), Event(2, ts(100), 1L, "click", 0.0),
        Event(3, ts(50), 2L, "view", 0.0), Event(4, ts(5000), 1L, "view", 0.0))
      input.addData(closedPrefix.take(3): _*)
      q.processAllAvailable()
      input.addData(closedPrefix(3)) // opens user1's second session
      q.processAllAvailable()
      // watermark advances on SEEN max event time minus 10 min, applied
      // to the NEXT batch — push two far-future batches so every prefix
      // session's (lastSeen + gap) deadline is passed and its timer fires
      input.addData(Event(5, ts(100000), 3L, "view", 0.0))
      q.processAllAvailable()
      input.addData(Event(6, ts(100001), 3L, "view", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("tws_sessions").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      // the batch gaps-and-islands form on the same closed prefix is the
      // semantic oracle (user3's far-future session is still OPEN in the
      // stream, correctly unemitted in append mode)
      val batch = graft.extensions.EventWindows
        .sessionize(closedPrefix.toDS().toDF(), gapSeconds = 1800)
        .collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_start_s"),
          r.getAs[Long]("n_events"), r.getAs[Long]("duration_s")))
        .toSet
      assert(streamed == batch,
        s"streamed $streamed must equal batch $batch")
      assert(streamed == Set((1L, 10L, 2L, 90L), (2L, 50L, 1L, 0L),
        (1L, 5000L, 1L, 0L)))
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("a watermark-admissible late event bridges two session fragments before emission") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingOps
    import graft.streaming.StreamingOps.Event

    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[Event]
    val q = StreamingOps.statefulSessions(input.toDS(), gapSeconds = 1800)
      .writeStream.format("memory").queryName("tws_late_bridge")
      .outputMode("append").start()
    try {
      def ts(s: Long) = new java.sql.Timestamp(s * 1000)
      // batch 1: t=1000 and t=3000 — gap 2000 > 1800, TWO fragments; a
      // naive sessionizer would close [1000] inline here, which is
      // premature: the watermark (3000 − 600 = 2400) still admits events
      // that can bridge the gap
      input.addData(Event(1, ts(1000), 1L, "view", 0.0),
        Event(2, ts(3000), 1L, "view", 0.0))
      q.processAllAvailable()
      // batch 2: t=2500 ≥ watermark 2400 — admissible, LATE (older than
      // the open fragment's start), and it bridges: 2500−1000 and
      // 3000−2500 are both ≤ 1800 ⇒ ONE session [1000..3000] of 3 events
      input.addData(Event(3, ts(2500), 1L, "view", 0.0))
      q.processAllAvailable()
      // flush far-future batches so the watermark confirms the close
      input.addData(Event(4, ts(100000), 2L, "view", 0.0))
      q.processAllAvailable()
      input.addData(Event(5, ts(100001), 2L, "view", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("tws_late_bridge").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      val batch = graft.extensions.EventWindows.sessionize(
          Seq(Event(1, ts(1000), 1L, "view", 0.0),
            Event(2, ts(3000), 1L, "view", 0.0),
            Event(3, ts(2500), 1L, "view", 0.0)).toDS().toDF(),
          gapSeconds = 1800)
        .collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_start_s"),
          r.getAs[Long]("n_events"), r.getAs[Long]("duration_s")))
        .toSet
      assert(streamed == batch && streamed == Set((1L, 1000L, 3L, 2000L)),
        s"streamed $streamed, batch $batch")
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("sub-second watermarks cannot split a session the merge rule would bridge") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingOps
    import graft.streaming.StreamingOps.Event

    // Fragment times are second-FLOORED while the watermark is
    // milliseconds: with gap g and a fragment ending at lastSec L, a
    // watermark inside ((L+g)·1000, (L+g+1)·1000) still admits events
    // whose ts floors to L+g — which the merge rule bridges. The emit
    // bound must therefore clear the whole truncation second
    // ((L+g+1)·1000 ≤ wm); an emit at `(L+g)·1000 < wm` would close
    // [10,10] in batch 2 below and then split what batch semantics
    // keep as one session. Every other fixture in this file is
    // second-aligned, so only this test discriminates the bound.
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[Event]
    val q = StreamingOps.statefulSessions(input.toDS(), gapSeconds = 30)
      .writeStream.format("memory").queryName("tws_subsecond")
      .outputMode("append").start()
    try {
      def tms(ms: Long) = new java.sql.Timestamp(ms)
      // batch 1: user 1 @10.0s; a MID-SECOND far event @640.5s drives
      // the post-batch watermark to 40500 ms — inside the (40000,
      // 41000) hazard window for the [10,10] fragment (L=10, g=30)
      input.addData(Event(1, tms(10000), 1L, "view", 0.0),
        Event(2, tms(640500), 9L, "view", 0.0))
      q.processAllAvailable()
      // batch 2: a NEW user-1 fragment (@100s, > gap away) makes the
      // processor re-confirm [10,10] at wm = 40500 — the bound under
      // test decides emit-vs-hold right here
      input.addData(Event(3, tms(100000), 1L, "view", 0.0))
      q.processAllAvailable()
      // batch 3: admissible bridging event — 40900 ≥ wm 40500, floors
      // to sec 40, and 40 − 10 ≤ 30 merges it into [10,10]
      input.addData(Event(4, tms(40900), 1L, "view", 0.0))
      q.processAllAvailable()
      // flush so every user-1 session closes
      input.addData(Event(5, tms(2000000), 9L, "view", 0.0))
      q.processAllAvailable()
      input.addData(Event(6, tms(2000001), 9L, "view", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("tws_subsecond")
        .filter(col("user_id") === 1L).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      val batch = graft.extensions.EventWindows.sessionize(
          Seq(Event(1, tms(10000), 1L, "view", 0.0),
            Event(3, tms(100000), 1L, "view", 0.0),
            Event(4, tms(40900), 1L, "view", 0.0)).toDS().toDF(),
          gapSeconds = 30)
        .collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_start_s"),
          r.getAs[Long]("n_events"), r.getAs[Long]("duration_s")))
        .toSet
      assert(streamed == batch
          && streamed == Set((1L, 10L, 2L, 30L), (1L, 100L, 1L, 0L)),
        s"streamed $streamed, batch $batch")
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}

class CurationIngestSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions.col
  import graft.streaming.StreamingOps

  // Gopher-passing text builders (the CurationIncrementalSpec fixture
  // conventions: 8 mandatory stopwords + distinct content words; the
  // 20-token passage is the only span-grain overlap channel)
  private val stop8 = "the be to of and that have with"
  private def body(seed: String, n: Int = 44): String =
    (1 to n).map(i => f"${seed}word$i%02d").mkString(" ")
  private val passage = "grain alpha beta gamma delta epsilon zeta eta " +
    "theta iota kappa lambda mu nu xi omicron pi rho sigma tau"
  private val tA = s"$stop8 ${body("aone")}"
  private val tX = s"$stop8 ${body("xone", 30)} $passage"

  test("streaming curation gates each batch on prior batches' KEPT state") {
    val root = java.nio.file.Files.createTempDirectory("graft-cur").toString
    def df(rows: Seq[(Long, String)]) = rows
      .map { case (id, t) => (id, t, t.length.toLong) }
      .toDF("doc_id", "text", "n_chars")
    val b1 = Seq(
      (1L, tA),          // kept
      (2L, tA),          // exact_dup_batch (keeper election)
      (3L, "tiny text"), // low_quality — must NOT enter state
      (4L, tX))          // kept (carries the passage into the span index)
    val b2 = Seq(
      (10L, tA),                                 // exact_dup_state
      (11L, s"$tA extra"),                       // near_dup_state
      (12L, s"$stop8 ${body("fresh")}"),         // kept — fresh content
      (13L, s"$stop8 ${body("span")} $passage")) // span_dup_state vs tX
    df(b1).coalesce(1).write.parquet(s"$root/in")
    df(b2).coalesce(1).write.mode("append").parquet(s"$root/in")

    val stream = spark.readStream.schema(df(b1).schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$root/in")
    val q = StreamingOps.curationIngest(stream, s"$root/state",
      s"$root/out", s"$root/chk")
    q.processAllAvailable(); q.stop()

    val fates = spark.read.parquet(s"$root/out")
      .select("doc_id", "status").as[(Long, String)].collect().toMap
    assert(fates == Map(
      1L -> "kept", 2L -> "exact_dup_batch", 3L -> "low_quality",
      4L -> "kept",
      10L -> "exact_dup_state", 11L -> "near_dup_state",
      12L -> "kept", 13L -> "span_dup_state"))
    // state advanced with KEPT docs only: fingerprints for tA, tX and
    // batch 2's fresh keeper — the junk doc and the dup losers absent
    val fps = spark.read.parquet(s"$root/state/exact")
      .select("fingerprint").distinct().count()
    assert(fps == 3L)
    // both batches left their own index partitions (replay-safe layout)
    for (idx <- Seq("exact", "band", "span"))
      assert(spark.read.parquet(s"$root/state/$idx")
        .select("batch_id").distinct().count() == 2L)
    // and the state lives in BUCKETED tables (the d19/d22 layout)
    for (idx <- Seq("exact", "band", "span")) {
      val t = StreamingOps.curationStateTable(s"$root/state", idx)
      val ddl = spark.sql(s"SHOW CREATE TABLE $t").first().getString(0)
      assert(ddl.contains("CLUSTERED BY") && ddl.contains("32 BUCKETS"),
        s"$idx state table must be bucketed, got:\n$ddl")
    }
  }

  test("executed probe plan: state scans bucketed, zero index-side exchange") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val root = java.nio.file.Files.createTempDirectory("graft-curp").toString
    def df(rows: Seq[(Long, String)]) = rows
      .map { case (id, t) => (id, t, t.length.toLong) }
      .toDF("doc_id", "text", "n_chars")
    StreamingOps.curationIngestBatch(
      df(Seq((1L, tA), (4L, tX))), 0L, s"$root/state", s"$root/out")
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    try {
      // broadcast off: prove the index side needs no exchange even on
      // the SMJ fallback path a big batch would take (with broadcast on,
      // the index side trivially avoids exchange — that proves nothing)
      spark.conf.set(key, "-1")
      val (e, b, sp) = StreamingOps.curationStateIndexes(spark,
        s"$root/state", excludeBatchId = 1L)
      val probe = graft.extensions.Curation.curateIncremental(
        df(Seq((10L, tA), (12L, s"$stop8 ${body("fresh")}"))),
        e, b, sp, "text", "doc_id", "n_chars")
      probe.collect() // finalize AQE
      val plan = probe.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      def stateScans(p: SparkPlan): Seq[FileSourceScanExec] = p.collect {
        case f: FileSourceScanExec
          if f.toString.contains("graft_cur_") => Seq(f)
        case q: QueryStageExec => stateScans(q.plan)
      }.flatten
      def exchanges(p: SparkPlan): Seq[ShuffleExchangeExec] = p.collect {
        case x: ShuffleExchangeExec => Seq(x)
        case q: QueryStageExec => exchanges(q.plan)
      }.flatten
      val all = stateScans(plan)
      assert(all.size >= 3, s"expected the three state-table scans in\n$plan")
      all.foreach(f => assert(f.relation.bucketSpec.nonEmpty &&
        f.bucketedScan,
        s"state scan must be bucketed: ${f.toString.take(200)}"))
      // THE pin: no state-table scan is shuffled BEFORE reaching its
      // join — walk each exchange's input subtree, stopping at joins
      // (below a join the state rows have already been consumed in
      // place, and post-join rows are batch-grain — shuffling those is
      // the flat per-batch cost, not the anti-pattern). Only the batch
      // side pays a pre-join exchange, so per-ingest cost stays flat in
      // snapshot size (the d22 measured lesson, now executed).
      import org.apache.spark.sql.execution.joins.BaseJoinExec
      def scansBeforeJoin(p: SparkPlan): Seq[FileSourceScanExec] =
        p match {
          case f: FileSourceScanExec
            if f.toString.contains("graft_cur_") => Seq(f)
          case _: BaseJoinExec => Nil
          case q: QueryStageExec => scansBeforeJoin(q.plan)
          case other => other.children.flatMap(scansBeforeJoin)
        }
      exchanges(plan).foreach { x =>
        assert(scansBeforeJoin(x.child).isEmpty,
          s"index side must reach its join un-shuffled, found a state " +
            s"scan feeding\n${x.toString.take(400)}")
      }
    } finally spark.conf.set(key, prev)
  }

  test("compaction folds batch partitions into one snapshot; probes and layout unchanged") {
    val root = java.nio.file.Files.createTempDirectory("graft-curc").toString
    def df(rows: Seq[(Long, String)]) = rows
      .map { case (id, t) => (id, t, t.length.toLong) }
      .toDF("doc_id", "text", "n_chars")
    // four micro-batches of distinct kept docs -> four state partitions
    for (b <- 0 to 3)
      StreamingOps.curationIngestBatch(
        df(Seq((10L * b + 1, s"$stop8 ${body(s"c$b")}"))),
        b.toLong, s"$root/state", s"$root/out")
    def stateCounts() = Seq("exact", "band", "span").map(idx =>
      spark.table(StreamingOps.curationStateTable(s"$root/state", idx))
        .count())
    def partitions(idx: String) =
      spark.table(StreamingOps.curationStateTable(s"$root/state", idx))
        .select("batch_id").distinct().as[Long].collect().toSet
    val probeBatch = df(Seq(
      (100L, s"$stop8 ${body("c2")}"),            // exact dup of batch 2's doc
      (101L, s"$stop8 ${body("newc")}")))         // fresh
    def fates() = {
      val (e, b, sp) = StreamingOps.curationStateIndexes(spark,
        s"$root/state", excludeBatchId = 99L)
      graft.extensions.Curation.curateIncremental(probeBatch, e, b, sp,
          "text", "doc_id", "n_chars")
        .select("doc_id", "status").as[(Long, String)].collect().toMap
    }
    val before = (stateCounts(), fates())
    assert(partitions("exact") == Set(0L, 1L, 2L, 3L))
    StreamingOps.compactCurationState(spark, s"$root/state",
      snapshotBatchId = 3L)
    for (idx <- Seq("exact", "band", "span"))
      assert(partitions(idx) == Set(3L),
        s"$idx must collapse to the one snapshot partition")
    assert((stateCounts(), fates()) == before,
      "compaction is pure layout — row counts and probe fates unchanged")
    assert(before._2 == Map(100L -> "exact_dup_state", 101L -> "kept"))
    // the snapshot partition still scans bucketed
    val t = StreamingOps.curationStateTable(s"$root/state", "exact")
    val plan = spark.table(t).groupBy(col("fingerprint")).count()
      .queryExecution.executedPlan.toString
    assert(plan.contains("Bucketed: true"),
      s"compacted snapshot must keep the bucketed layout\n$plan")
    // and the next batch ingests against the compacted state as usual
    StreamingOps.curationIngestBatch(
      df(Seq((200L, s"$stop8 ${body("c1")}"))), 4L,
      s"$root/state", s"$root/out")
    val f4 = spark.read.parquet(s"$root/out/batch_id=4")
      .select("doc_id", "status").as[(Long, String)].collect().toMap
    assert(f4 == Map(200L -> "exact_dup_state"))
  }

  test("replaying a batch id overwrites its own partition — state counts unchanged") {
    val root = java.nio.file.Files.createTempDirectory("graft-curr").toString
    def df(rows: Seq[(Long, String)]) = rows
      .map { case (id, t) => (id, t, t.length.toLong) }
      .toDF("doc_id", "text", "n_chars")
    val b1 = df(Seq((1L, tA), (4L, tX)))
    StreamingOps.curationIngestBatch(b1, 0L, s"$root/state", s"$root/out")
    def counts() = Seq("exact", "band", "span").map(idx =>
      spark.table(StreamingOps.curationStateTable(s"$root/state", idx))
        .count())
    val first = counts()
    // the crash-replay case: same batch id delivered again
    StreamingOps.curationIngestBatch(b1, 0L, s"$root/state", s"$root/out")
    assert(counts() == first,
      "dynamic partition overwrite must replace, never double, a " +
        "replayed batch's state partition")
    assert(spark.read.parquet(s"$root/out").count() == 2L)
  }
}

class ExportIngestSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions.{col, sum => fsum}
  import graft.streaming.StreamingOps
  import graft.extensions.Curation

  // the CurationIngestSpec fixture conventions (Gopher-passing bodies;
  // these also pass x2's t9 battery — en stopword argmax, 52 tokens,
  // distinct content words → q ≥ 0.5, dup3 ≈ 0) with sources attached.
  // No near/span-dup channels and an empty bench: the ONE regime where
  // the incremental loop's curateIncremental and batch x2's curate
  // agree on the kept set, so the order-independent manifest fields
  // can be pinned against the batch flagship directly.
  private val stop8 = "the be to of and that have with"
  private def body(seed: String, n: Int = 44): String =
    (1 to n).map(i => f"${seed}word$i%02d").mkString(" ")
  private def doc(id: Long, seed: String, src: String) = {
    val t = s"$stop8 ${body(seed)}"
    (id, t, src, t.length.toLong)
  }
  private val b1 = Seq(doc(1L, "aone", "web"), doc(2L, "atwo", "book"),
    (3L, "tiny text", "web", 9L), // low_quality — never exported
    doc(4L, "afour", "web"))
  private val b2 = Seq(
    (10L, s"$stop8 ${body("aone")}", "web",
      s"$stop8 ${body("aone")}".length.toLong), // exact_dup_state of 1
    doc(11L, "bone", "book"), doc(12L, "btwo", "web"))
  private val b3 = Seq(doc(20L, "cone", "web"), doc(21L, "ctwo", "book"))
  private val C = 8
  private val Shards = 2
  private def df(rows: Seq[(Long, String, String, Long)]) =
    rows.toDF("doc_id", "text", "source", "n_chars")
  private lazy val emptyBench =
    Seq.empty[(Long, String, Long)].toDF("doc_id", "text", "n_chars")

  /** All written doc-grain rows, partition values cast back to long. */
  private def writtenDocs(exp: String) =
    spark.read.parquet(s"$exp/docs")
      .select(col("doc_id"), col("source"), col("n_bpe"), col("__key"),
        col("shard_id").cast("long").as("shard_id"),
        col("batch_id").cast("long").as("batch_id"))

  test("executed 3-micro-batch export: maintained views ≡ from-scratch recompute; x2 parity on order-independent fields") {
    val root = java.nio.file.Files.createTempDirectory("graft-exi").toString
    val exp = s"$root/exp"
    df(b1).coalesce(1).write.parquet(s"$root/in")
    df(b2).coalesce(1).write.mode("append").parquet(s"$root/in")
    df(b3).coalesce(1).write.mode("append").parquet(s"$root/in")
    val stream = spark.readStream.schema(df(b1).schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$root/in")
    val q = StreamingOps.exportIngest(stream, s"$root/state", exp,
      s"$root/chk", merges = Nil, contextLen = C, numShards = Shards)
    q.processAllAvailable(); q.stop()

    // fates landed; only survivors exported (3 low-quality, 10 dup)
    val fates = spark.read.parquet(s"$exp/fates")
      .select("doc_id", "status").as[(Long, String)].collect().toMap
    assert(fates(3L) == "low_quality" && fates(10L) == "exact_dup_state")
    val all = writtenDocs(exp)
    assert(all.select("doc_id").as[Long].collect().toSet ==
      Set(1L, 2L, 4L, 11L, 12L, 20L, 21L))

    // THE pin: maintained manifest view == from-scratch recompute over
    // every written doc-grain row in batch-major packing order
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.select(col("shard_id").cast("long"), col("source"),
          col("n_docs"), col("n_tokens"), col("tok_frac"),
          col("n_sequences"), col("pad_tokens"), col("split_docs"),
          col("p_alpha"))
        .as[(Long, String, Long, Long, Double, Long, Long, Long, Double)]
        .collect().toSeq.sortBy(r => (r._1, r._2))
    val view = rows(StreamingOps.exportManifestView(spark, exp, C))
    val scratch = rows(Curation.manifestFromDocGrain(all, "doc_id", C,
      alpha = 0.3, orderPrefix = Seq("batch_id")))
    assert(view == scratch, s"view $view\nscratch $scratch")

    // windows view == from-scratch membership over the same order
    val cum = all.withColumn("__cum", fsum(col("n_bpe"))
      .over(Curation.packWindow("doc_id", Seq("batch_id"))))
    def wrows(d: org.apache.spark.sql.DataFrame) =
      d.select(col("shard_id").cast("long"), col("seq_id"),
          col("n_docs"), col("first_doc"), col("last_doc"),
          col("n_tokens"), col("n_pad"))
        .as[(Long, Long, Long, Long, Long, Long, Long)]
        .collect().toSeq.sortBy(r => (r._1, r._2))
    val wview = wrows(StreamingOps.exportWindowsView(spark, exp, C))
    val wscratch = wrows(Curation.windowMembership(cum, "doc_id", C)
      .withColumn("n_pad",
        org.apache.spark.sql.functions.lit(C.toLong) - col("n_tokens")))
    assert(wview == wscratch)
    // the windows tile the shards exactly: per shard, window count and
    // token mass match the manifest audit
    val audit = view.groupBy(_._1).map { case (s, rs) =>
      s -> (rs.head._6, rs.map(_._4).sum) }
    val tiles = wview.groupBy(_._1).map { case (s, rs) =>
      s -> (rs.size.toLong, rs.map(_._6).sum) }
    assert(tiles == audit)
    // carryover really merged a boundary window: at least one (shard,
    // seq) row was assembled from TWO batches' contributions (guards
    // fixture degeneracy — without it the equality pins prove less)
    val contrib = spark.read.parquet(s"$exp/windows")
      .select(col("shard_id").cast("long"), col("seq_id"))
      .as[(Long, Long)].collect().toSeq
    assert(contrib.size > contrib.distinct.size,
      "no boundary window spanned two batches — fixture degenerate")

    // x2 parity: the batch flagship over the SAME corpus agrees on
    // every order-independent field (kept set, doc/token counts, shard
    // mix, mixture weights); the packing audit differs by design
    // (batch-major vs global key order)
    val x2 = Curation.exportManifest(df(b1 ++ b2 ++ b3), emptyBench,
      merges = Nil, "text", "doc_id", "source", "n_chars",
      contextLen = C, numShards = Shards)
      .select(col("shard_id"), col("source"), col("n_docs"),
        col("n_tokens"), col("tok_frac"), col("p_alpha"))
      .as[(Long, String, Long, Long, Double, Double)]
      .collect().toSeq.sortBy(r => (r._1, r._2))
    val ours = view.map(r => (r._1, r._2, r._3, r._4, r._5, r._9))
    assert(ours == x2, s"ours $ours\nx2 $x2")
  }

  test("export views' plans: pure merges — no cartesian, no window, counters pruned to the aggregate's columns") {
    val root = java.nio.file.Files.createTempDirectory("graft-exv").toString
    val exp = s"$root/exp"
    StreamingOps.exportIngestBatch(df(b1), 0L, s"$root/state", exp,
      merges = Nil, contextLen = C, numShards = Shards)
    StreamingOps.exportIngestBatch(df(b2), 1L, s"$root/state", exp,
      merges = Nil, contextLen = C, numShards = Shards)
    // the manifest view must be a pure aggregate-and-broadcast-join
    // plan over the counters files: a CartesianProduct, a Window, or a
    // docs-file scan here would mean the view re-derives doc-grain
    // state instead of merging the maintained counters
    val mfp = PlanFingerprints.fingerprint(
      StreamingOps.exportManifestView(spark, exp, C))
    assert(!mfp.contains("join_cartesian") && !mfp.contains("window"),
      s"manifest view must merge counters, not repack: $mfp")
    assert(mfp.getOrElse("join_bnl", 0) <= 1,
      s"only the 1-row mixture-total broadcast may nest-loop: $mfp")
    // the windows view is ONE hash aggregate over the contribution
    // files — no join at all (first/last resolve via min_by/max_by on
    // batch order inside the aggregate)
    val wfp = PlanFingerprints.fingerprint(
      StreamingOps.exportWindowsView(spark, exp, C))
    assert(wfp.getOrElse("agg_hash", 0) >= 1 &&
      !wfp.exists(_._1.startsWith("join_")) && !wfp.contains("window"),
      s"windows view must be a plain merge aggregate: $wfp")
  }

  test("replaying an export batch overwrites its own partitions — views byte-stable") {
    val root = java.nio.file.Files.createTempDirectory("graft-exr").toString
    val exp = s"$root/exp"
    StreamingOps.exportIngestBatch(df(b1), 0L, s"$root/state", exp,
      merges = Nil, contextLen = C, numShards = Shards)
    StreamingOps.exportIngestBatch(df(b2), 1L, s"$root/state", exp,
      merges = Nil, contextLen = C, numShards = Shards)
    def snap() = (
      writtenDocs(exp).orderBy("doc_id").collect().toSeq,
      StreamingOps.exportManifestView(spark, exp, C)
        .orderBy("shard_id", "source").collect().toSeq,
      StreamingOps.exportWindowsView(spark, exp, C)
        .orderBy("shard_id", "seq_id").collect().toSeq)
    val before = snap()
    // crash-replay: batch 1 delivered again — contributions recompute
    // against batch_id < 1 state only, and overwrite their own dirs
    StreamingOps.exportIngestBatch(df(b2), 1L, s"$root/state", exp,
      merges = Nil, contextLen = C, numShards = Shards)
    assert(snap() == before,
      "replayed batch must replace, never double, its contributions")
    // each batch's shard files are internally key-sorted (the
    // writeExport training-read order, per batch segment)
    for (b <- Seq(0, 1); s <- 0 until Shards) {
      val dir = new java.io.File(s"$exp/docs/batch_id=$b/shard_id=$s")
      if (dir.exists()) {
        val keys = spark.read.parquet(dir.toString).coalesce(1)
          .select(col("__key"), col("doc_id"))
          .as[(Long, Long)].collect().toSeq
        assert(keys == keys.sortBy(identity),
          s"batch $b shard $s rows must be key-sorted")
      }
    }
  }

  /** State partition dirs under `$exp/<name>`, by name. */
  private def parts(exp: String, name: String): Seq[String] = {
    val d = new java.io.File(s"$exp/$name")
    if (!d.exists()) Seq.empty
    else d.listFiles().filter(_.isDirectory).map(_.getName).toSeq.sorted
  }

  test("compactExportState: views, carryover offsets and docs order byte-identical; state reads O(snapshot + recent)") {
    val root = java.nio.file.Files.createTempDirectory("graft-exc").toString
    val exp = s"$root/exp"
    for ((b, i) <- Seq(b1, b2, b3).zipWithIndex)
      StreamingOps.exportIngestBatch(df(b), i.toLong, s"$root/state", exp,
        merges = Nil, contextLen = C, numShards = Shards)
    def snap() = (
      StreamingOps.exportManifestView(spark, exp, C)
        .orderBy("shard_id", "source").collect().toSeq,
      StreamingOps.exportWindowsView(spark, exp, C)
        .orderBy("shard_id", "seq_id").collect().toSeq,
      // the docs' training-read order: (batch partition, per-row __seg
      // witness, key, id) — the sequence a sequential reader streams
      writtenDocs(exp).join(
          spark.read.parquet(s"$exp/docs").select(col("doc_id"),
            col("__seg")), Seq("doc_id"))
        .orderBy("batch_id", "__seg", "shard_id", "__key", "doc_id")
        .drop("batch_id").collect().toSeq)
    val before = snap()
    // fold batches 0 and 1 into the snapshot partition (batch 2 live)
    StreamingOps.compactExportState(spark, exp, snapshotBatchId = 1L)
    assert(parts(exp, "counters") == Seq("batch_id=1", "batch_id=2"),
      "counters must read O(snapshot + recent) partitions")
    assert(parts(exp, "windows") == Seq("batch_id=1", "batch_id=2"))
    assert(parts(exp, "docs") == Seq("batch_id=1", "batch_id=2"))
    assert(snap() == before,
      "compaction is pure layout — every consumer surface unchanged")
    // a rerun (crash-after-rename recovery path) is a no-op fold of the
    // single snapshot — still identical
    StreamingOps.compactExportState(spark, exp, snapshotBatchId = 1L)
    assert(snap() == before)
    // the loop continues against compacted state: batch 3's carryover
    // offsets (batch_id < 3 sums) are unchanged by the fold, so its
    // contributions equal an uncompacted run's
    val b4 = Seq(doc(30L, "done", "web"), doc(31L, "dtwo", "book"))
    StreamingOps.exportIngestBatch(df(b4), 3L, s"$root/state", exp,
      merges = Nil, contextLen = C, numShards = Shards)
    val rootU = java.nio.file.Files.createTempDirectory("graft-exu")
      .toString
    val expU = s"$rootU/exp"
    for ((b, i) <- Seq(b1, b2, b3, b4).zipWithIndex)
      StreamingOps.exportIngestBatch(df(b), i.toLong, s"$rootU/state",
        expU, merges = Nil, contextLen = C, numShards = Shards)
    assert(StreamingOps.exportManifestView(spark, exp, C)
      .orderBy("shard_id", "source").collect().toSeq ==
      StreamingOps.exportManifestView(spark, expU, C)
        .orderBy("shard_id", "source").collect().toSeq)
    assert(StreamingOps.exportWindowsView(spark, exp, C)
      .orderBy("shard_id", "seq_id").collect().toSeq ==
      StreamingOps.exportWindowsView(spark, expU, C)
        .orderBy("shard_id", "seq_id").collect().toSeq)
    // replay idempotence still holds post-compaction: batch 3 again
    val after = snap()
    StreamingOps.exportIngestBatch(df(b4), 3L, s"$root/state", exp,
      merges = Nil, contextLen = C, numShards = Shards)
    assert(snap() == after)
  }

  test("export views are empty (not an exception) before the first batch lands") {
    val root = java.nio.file.Files.createTempDirectory("graft-exe").toString
    val exp = s"$root/exp"
    assert(StreamingOps.exportManifestView(spark, exp, C).count() == 0L)
    assert(StreamingOps.exportWindowsView(spark, exp, C).count() == 0L)
    assert(StreamingOps.exportMeta(spark, exp).isEmpty)
  }

  test("persisted packing metadata rejects a drifted contextLen/numShards/seed") {
    val root = java.nio.file.Files.createTempDirectory("graft-exm").toString
    val exp = s"$root/exp"
    StreamingOps.exportIngestBatch(df(b1), 0L, s"$root/state", exp,
      merges = Nil, contextLen = C, numShards = Shards)
    assert(StreamingOps.exportMeta(spark, exp)
      .contains((C, Shards, "epoch42")))
    // views at the stored contextLen work; a drifted one is refused
    // (it would silently report wrong n_sequences/pad_tokens/n_pad)
    StreamingOps.exportManifestView(spark, exp, C).collect()
    intercept[IllegalArgumentException] {
      StreamingOps.exportManifestView(spark, exp, contextLen = 2 * C)
    }
    intercept[IllegalArgumentException] {
      StreamingOps.exportWindowsView(spark, exp, contextLen = 2 * C)
    }
    // a later batch with drifted packing facts is refused too
    intercept[IllegalArgumentException] {
      StreamingOps.exportIngestBatch(df(b2), 1L, s"$root/state", exp,
        merges = Nil, contextLen = 2 * C, numShards = Shards)
    }
    intercept[IllegalArgumentException] {
      StreamingOps.exportIngestBatch(df(b2), 1L, s"$root/state", exp,
        merges = Nil, contextLen = C, numShards = Shards,
        seed = "epoch43")
    }
  }
}

class ClassifierStreamSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions.{col, length, lit}
  import graft.extensions.{QualityModel, TextAnalysis}
  import graft.streaming.StreamingOps

  // the TrainLogisticSpec fixture shape, 7 Gopher-passing docs vs 5
  // word_count failures (labels distilled from the rule battery): the
  // 7/5 split puts the rank-6 approx median INSIDE the high-score
  // cluster, so the published cut separates kept from cut docs
  private val stop8 = "the be to of and that have with"
  private def body(seed: String): String =
    (1 to 44).map(i => f"${seed}word$i%02d").mkString(" ")
  private lazy val labeled = {
    val docs = ((1 to 7).map(i => (i.toLong, s"$stop8 ${body(s"g$i")}")) ++
      (8 to 12).map(i => (i.toLong, s"tiny text t$i"))).toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
    docs.join(TextAnalysis.gopherProfile(docs, "text", "doc_id", "n_chars")
      .select(col("doc_id"),
        (col("reject_reason") === "pass").cast("double").as("label")),
      Seq("doc_id"))
  }

  test("streamed scoring over 3 micro-batches = t41's batch form at the published cut") {
    val root = java.nio.file.Files.createTempDirectory("graft-cls").toString
    // model-publish time: train once, ship weights table + sketch cut
    val weights = QualityModel.trainLogistic(labeled, "text", "doc_id",
      "label", numBuckets = 4096, iters = 3, lr = 50.0)
    weights.write.parquet(s"$root/weights")
    val scoredBatch = QualityModel.scoredWithTrained(labeled, "text",
      "doc_id", "label", weights, numBuckets = 4096)
      .localCheckpoint(eager = false) // cut + reference rows
    val cut = QualityModel.sketchCut(scoredBatch)
    val ref = scoredBatch.select(col("doc_id"), col("model_score"),
        (col("model_score") >= lit(cut)).as("kept"), col("rule_label"))
      .as[(Long, Double, Boolean, Boolean)].collect().toSet
    assert(ref.exists(_._3) && ref.exists(!_._3),
      "fixture must exercise both sides of the cut")
    // ingest time: the same docs arrive over 3 micro-batches
    val in = s"$root/in"
    labeled.filter(col("doc_id") <= 4).coalesce(1).write.parquet(in)
    labeled.filter(col("doc_id").between(5, 8)).coalesce(1)
      .write.mode("append").parquet(in)
    labeled.filter(col("doc_id") >= 9).coalesce(1)
      .write.mode("append").parquet(in)
    val stream = spark.readStream.schema(labeled.schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
    val q = StreamingOps.classifierScoringIngest(stream, s"$root/weights",
      cut, s"$root/out", s"$root/chk")
    q.processAllAvailable(); q.stop()
    val got = spark.read.parquet(s"$root/out")
      .select(col("doc_id"), col("model_score"), col("kept"),
        col("rule_label"))
      .as[(Long, Double, Boolean, Boolean)].collect().toSet
    assert(got == ref,
      "stream-static scoring must be batch-identical doc for doc")
    // genuinely multi-micro-batch: three batch_id partitions landed
    val batches = spark.read.parquet(s"$root/out")
      .select(col("batch_id")).distinct().count()
    assert(batches == 3L, s"expected 3 micro-batches, saw $batches")
  }

  test("replaying a scoring batch id overwrites its own verdicts") {
    val root = java.nio.file.Files.createTempDirectory("graft-clsr").toString
    val weights = QualityModel.trainLogistic(labeled, "text", "doc_id",
      "label", numBuckets = 4096, iters = 3, lr = 50.0)
    weights.write.parquet(s"$root/weights")
    val b = labeled.filter(col("doc_id") <= 4)
    StreamingOps.classifierScoringBatch(b, 0L, s"$root/weights", 0.5,
      s"$root/out")
    val first = spark.read.parquet(s"$root/out").count()
    // the crash-replay case: same batch id delivered again
    StreamingOps.classifierScoringBatch(b, 0L, s"$root/weights", 0.5,
      s"$root/out")
    assert(spark.read.parquet(s"$root/out").count() == first,
      "a replayed batch must replace, never double, its verdicts")
  }
}

class StreamDedupSpec extends SparkSpec {

  test("watermarked stream dedup drops re-delivered events") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingOps
    import graft.streaming.StreamingOps.Event

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val deduped = StreamingOps.dedupedStream(input.toDS().toDF(), "event_id")
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      def ts(s: Long) = new java.sql.Timestamp(s * 1000)
      val e1 = Event(1, ts(10), 1L, "view", 1.0)
      val e2 = Event(2, ts(20), 1L, "click", 2.0)
      input.addData(e1, e2, e1)          // duplicate within batch
      q.processAllAvailable()
      // re-delivery across batches, including one with a jittered broker
      // timestamp — id-only dedup must still collapse it
      input.addData(e2, e2.copy(ts = ts(25)))
      q.processAllAvailable()
      assert(spark.table("dedup_out").count() == 2)
    } finally q.stop()
  }
}
