package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.Tables

/** Gap-based sessionization — batch (window functions) and streaming
  * (flatMapGroupsWithState) implementations of the same semantics:
  * a session is a maximal run of a user's events with inter-event
  * gaps below the threshold.
  *
  * Scale: the batch path is one shuffle (partition by user) and the
  * per-user sort; the streaming path keeps one open session per key
  * in state — O(users) state, emitted and dropped on gap/timeout.
  */
object Sessionize {

  /** Batch sessionization via lag + running sum of session-break
    * flags. Timestamps surfaced as epoch micros (bigint) for
    * engine-neutral comparison.
    */
  def sessionizeBatch(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val gapUs = gapMinutes * 60L * 1000000L
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .withColumn("ts_us", unix_micros(col("ts")))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_us").isNull || col("ts_us") - col("prev_us") > gapUs, 1).otherwise(0))
      .withColumn("session_seq", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        min(col("ts_us")).as("session_start_us"),
        max(col("ts_us")).as("session_end_us"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("total_value"))
  }

  /** Native session windows (st26): Spark's BUILT-IN `session_window`
    * aggregation — the compose-existing-ops spelling of st1, and the
    * one that runs unchanged as a watermarked streaming agg (state
    * store managed by the engine, no custom fMGWS state needed; the
    * streaming twin spec proves batch/stream parity on closed
    * windows). Semantics differ from [[sessionizeBatch]] at exactly
    * the boundary: session_window MERGES an event iff it lands
    * strictly inside [start, last + gap), so a gap of EXACTLY
    * `gapMinutes` splits here and merges there — the oracle replays
    * the `>=` split law, documenting the difference rather than
    * papering over it. Window end = last event time + gap (the
    * engine's close time), surfaced as µs for engine-neutral
    * comparison.
    *
    * Scale shape: one user-prefixed shuffle, engine-fused window
    * assignment — the same single-exchange contract st1 pins.
    */
  def sessionWindowAgg(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    events
      .filter(col("user_id").isNotNull)
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapMinutes minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("total_value"))
      .select(col("user_id"),
        unix_micros(col("sw.start")).as("session_start_us"),
        unix_micros(col("sw.end")).as("window_end_us"),
        col("n_events"), col("total_value"))

  /** Verified entry (st26). Sort is oracle-determinism only. */
  def st26(spark: SparkSession, dir: String): DataFrame =
    sessionWindowAgg(Tables.events(spark, dir))
      .orderBy(col("user_id"), col("session_start_us"))

  /** Session-quality report (st22): the distribution of session
    * depth and duration — sessions counted, single-event (bounce)
    * share, exact p50/p90 of events-per-session and of session
    * duration in seconds — the health report read next to st21's gap
    * evidence when the st1 gap parameter is tuned (a gap set too low
    * shows up here as a bounce-rate spike and collapsing durations).
    *
    * Scale shape: rides [[sessionizeBatch]]'s ONE user-prefixed
    * shuffle; the report is a single 1-row fold over the session
    * frame (sessions ≪ events). Durations are exact µs longs
    * (st18's law); percentiles interpolate the exact integers (a8's
    * parity law, approx_percentile at 100 TB) and the seconds
    * conversion is one division + round after.
    */
  def sessionStats(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val s = sessionizeBatch(events, gapMinutes)
      .withColumn("__dur_us", col("session_end_us") - col("session_start_us"))
    s.agg(
      count(lit(1)).as("n_sessions"),
      countDistinct(col("user_id")).as("n_users"),
      round(sum(when(col("n_events") === 1, 1L).otherwise(0L)).cast("double")
        / count(lit(1)), 6).as("bounce_rate"),
      percentile(col("n_events"), lit(0.5)).as("p50_events"),
      percentile(col("n_events"), lit(0.9)).as("p90_events"),
      round(percentile(col("__dur_us"), lit(0.5)) / 1000000.0, 4).as("p50_dur_s"),
      round(percentile(col("__dur_us"), lit(0.9)) / 1000000.0, 4).as("p90_dur_s"))
  }

  /** Verified entry (st22): 1-row report, no sort needed. */
  def st22(spark: SparkSession, dir: String): DataFrame =
    sessionStats(graft.Tables.events(spark, dir))

  /** Return-cadence report (st25): the distribution of the spacing
    * between a user's consecutive SESSION STARTS — the visit-rhythm
    * feature churn models eat (st21 measures event gaps inside the
    * stream; this measures how often users come BACK) plus the
    * multi-session population size. Cadence is exact µs from the
    * session frame; percentiles interpolate the exact integers
    * (a8's law) and convert to hours once.
    *
    * Scale shape: rides sessionizeBatch's one user shuffle; the
    * cadence window partitions by user over the SESSION frame
    * (per-user length = sessions, not events) and the report is a
    * 1-row fold.
    */
  def returnCadence(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val s = sessionizeBatch(events, gapMinutes)
    val w = Window.partitionBy(col("user_id")).orderBy(col("session_seq"))
    val gaps = s
      .withColumn("__next_start", lead(col("session_start_us"), 1).over(w))
      .withColumn("__gap_us", col("__next_start") - col("session_start_us"))
      .filter(col("__gap_us").isNotNull)
    gaps.agg(
      countDistinct(col("user_id")).as("n_returning_users"),
      count(lit(1)).as("n_gaps"),
      round(percentile(col("__gap_us"), lit(0.5)) / 3600000000.0, 4)
        .as("p50_cadence_h"),
      round(percentile(col("__gap_us"), lit(0.9)) / 3600000000.0, 4)
        .as("p90_cadence_h"))
  }

  /** Verified entry (st25): 1-row report. */
  def st25(spark: SparkSession, dir: String): DataFrame =
    returnCadence(graft.Tables.events(spark, dir))

  final case class Ev(event_id: Long, ts_us: Long, user_id: Long, value: Double)
  final case class SessionState(start_us: Long, end_us: Long, n: Long, total: Double)
  final case class SessionOut(user_id: Long, session_start_us: Long, session_end_us: Long,
                              n_events: Long, total_value: Double)

  /** Streaming sessionization: one open session per user held in
    * GroupState; a new event either extends it or closes it (emitting
    * the finished session) and opens the next. Event-time timeout
    * flushes idle sessions once the watermark passes the gap.
    */
  def sessionizeStream(events: Dataset[Ev], gapMinutes: Int = 30): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L

    def fn(userId: Long, evs: Iterator[Ev], state: GroupState[SessionState]): Iterator[SessionOut] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        return Iterator(SessionOut(userId, s.start_us, s.end_us, s.n, s.total))
      }
      val sorted = evs.toSeq.sortBy(e => (e.ts_us, e.event_id))
      var cur = state.getOption
      val out = Seq.newBuilder[SessionOut]
      sorted.foreach { e =>
        cur match {
          case Some(s) if e.ts_us - s.end_us <= gapUs =>
            cur = Some(SessionState(s.start_us, math.max(s.end_us, e.ts_us), s.n + 1, s.total + e.value))
          case Some(s) =>
            out += SessionOut(userId, s.start_us, s.end_us, s.n, s.total)
            cur = Some(SessionState(e.ts_us, e.ts_us, 1, e.value))
          case None =>
            cur = Some(SessionState(e.ts_us, e.ts_us, 1, e.value))
        }
      }
      cur match {
        case Some(s) =>
          state.update(s)
          // close the open session once event time passes end + gap
          state.setTimeoutTimestamp((s.end_us + gapUs) / 1000L)
        case None => state.remove()
      }
      out.result().iterator
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout())(fn)
  }

  /** Verified entry point (st1): batch sessionization over events.
    * Sort is oracle-determinism only (the library fn is unordered —
    * a session frame is corpus-sized, and no production consumer
    * needs it rangepartitioned).
    */
  def st1(spark: SparkSession, dir: String): DataFrame =
    sessionizeBatch(Tables.events(spark, dir))
      .orderBy(col("user_id"), col("session_seq"))
}
