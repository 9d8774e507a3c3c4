package graft.extensions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Summaries

/** Event-time windowing over the `events` table (SURVEY.md §7.4) —
  * batch DataFrame forms that transfer 1:1 to Structured Streaming
  * (same expressions under `readStream` + watermark; see
  * [[graft.streaming.StreamingOps]]).
  */
object EventWindows {

  /** Tumbling event-time window aggregation via the built-in `window()`
    * (epoch-aligned, like the reference's none — this is extension
    * surface; oracle-matched through the epoch-second bucket start). */
  def tumbling(events: DataFrame, duration: String): DataFrame =
    events
      .groupBy(window(col("ts"), duration).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        Summaries.exactSum(col("value"), 2).as("sum_value"))
      .select(unix_timestamp(col("w.start")).as("bucket_start_s"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Sessionization as gaps-and-islands: a new session starts when the
    * gap to the previous event (per user) exceeds `gapSeconds`; session
    * id = running count of session starts. Pure window functions —
    * deterministic, oracle-expressible, and the exact batch semantics of
    * `session_window`. */
  def sessionize(events: DataFrame, gapSeconds: Long): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val secs = unix_timestamp(col("ts"))
    val isNew = when(
      lag(secs, 1).over(byUser).isNull ||
        secs - lag(secs, 1).over(byUser) > gapSeconds, 1L).otherwise(0L)
    events
      .withColumn("__secs", secs)
      .withColumn("session_id",
        sum(isNew).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("__secs")).as("session_start_s"),
        (max(col("__secs")) - min(col("__secs"))).as("duration_s"))
  }

  /** The built-in `session_window` form (same semantics, state-store
    * backed under streaming). Kept alongside `sessionize` so the batch
    * oracle checks the hand-rolled form while streaming uses this one. */
  def sessionWindowAgg(events: DataFrame, gap: String): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), unix_timestamp(col("w.start")).as("session_start_s"),
        col("n_events"))

  /** Calendar densification (time-series resample): per key, emit one
    * row per day across that key's [min, max] date span, zero-filling
    * days with no events. `sequence` + `explode` keeps generation
    * distributed (each key's range materializes on its executor, never
    * the driver); pair with [[graft.operators.WindowOps.forwardFill]]
    * for carry-forward instead of zero-fill. */
  def densifyDaily(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"))
    val spans = daily.groupBy(col("user_id"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val calendar = spans.select(col("user_id"),
      explode(sequence(col("d0"), col("d1"))).as("day"))
    calendar.join(daily, Seq("user_id", "day"), "left")
      .withColumn("n_events", coalesce(col("n_events"), lit(0L)))
  }

  /** `from_json` over the `props` JSON string column — the map/json
    * scalar surface the reference lacks (SURVEY.md §2.H). */
  def parsedProps(events: DataFrame): DataFrame =
    events.withColumn("k",
      get_json_object(col("props"), "$.k").cast("long"))

  /** Per-key interval join (view→click attribution: for each left event,
    * every right event by the same user in [l_ts, l_ts + maxLag)).
    *
    * Joining on user_id alone would put a power-user's entire history in
    * one hash bucket, so the equi-key is (user_id, time bucket) with
    * bucket width = maxLag: a right event lands in exactly one bucket,
    * the left side probes its own bucket and the next, and a matching
    * pair is generated exactly once (the right event's bucket is unique
    * — no dedup pass needed, same trick as the d2 blocked join). State
    * per bucket is bounded by maxLag regardless of how hot the user is.
    * The streaming twin is StreamingOps.intervalJoinStream. */
  def intervalJoin(left: DataFrame, right: DataFrame,
      maxLagSeconds: Long): DataFrame = {
    def bucket(ts: Column): Column =
      floor(unix_timestamp(ts) / maxLagSeconds).cast("long")
    val l = left.select(col("user_id"), col("event_id").as("l_id"),
        col("ts").as("l_ts"),
        explode(array(bucket(col("ts")), bucket(col("ts")) + 1)).as("bkt"))
    val r = right.select(col("user_id"), col("event_id").as("r_id"),
      col("ts").as("r_ts"), bucket(col("ts")).as("bkt"))
    l.join(r, Seq("user_id", "bkt"))
      .filter(col("r_ts") >= col("l_ts") &&
        col("r_ts") < col("l_ts") + expr(s"INTERVAL $maxLagSeconds SECONDS"))
      .select(col("l_id"), col("r_id"),
        (unix_timestamp(col("r_ts")) - unix_timestamp(col("l_ts")))
          .as("lag_s"))
  }
}
