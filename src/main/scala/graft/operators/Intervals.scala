package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Interval-algebra operators over keyed event streams: overlapping-
  * interval merge (coverage "islands") and per-state dwell times —
  * the uptime/coverage and time-in-state reports every telemetry and
  * product-analytics deployment runs, and (for training pipelines)
  * the activity-span view that turns raw event logs into bounded
  * per-user engagement features.
  */
object Intervals {

  /** Merge overlapping/touching intervals per key into maximal
    * "islands" (classic gaps-and-islands). An interval [s, e] joins
    * the current island iff s <= running-max(e) of all PRIOR
    * intervals in (start, end, id) order; otherwise it opens a new
    * one. Touching intervals (s == prior e) merge — coverage is
    * closed-interval.
    *
    * Scale shape: ONE shuffle on the key; both windows (the
    * exclusive running max and the island-id running sum) and the
    * final island aggregation all ride that same (key)-hash
    * partitioning — the island groupBy keys are (key, island_seq),
    * key-prefixed, so AQE sees a no-op exchange. No joins, no
    * self-join per island (the naive "for each interval find its
    * island anchor" spelling), no range partitioning. Integer
    * arithmetic throughout — engine-portable with no FP law.
    *
    * The per-key history rides st1/st5/st6's documented
    * per-key-bounded assumption; a key with unbounded history is the
    * same salting/bucketing conversation documented there.
    */
  def mergeIntervals(df: DataFrame, keyCol: String, startCol: String,
                     endCol: String, idCol: String): DataFrame = {
    val order = Window.partitionBy(col(keyCol))
      .orderBy(col(startCol), col(endCol), col(idCol))
    val prior = order.rowsBetween(Window.unboundedPreceding, -1)
    df
      .select(col(keyCol), col(startCol), col(endCol), col(idCol))
      .withColumn("__prior_max_end", max(col(endCol)).over(prior))
      .withColumn("__new_island",
        when(col("__prior_max_end").isNull ||
          col(startCol) > col("__prior_max_end"), 1L).otherwise(0L))
      .withColumn("island_seq", sum(col("__new_island")).over(
        order.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(keyCol), col("island_seq"))
      .agg(
        min(col(startCol)).as("island_start"),
        max(col(endCol)).as("island_end"),
        count(lit(1)).as("n_intervals"))
      .withColumn("covered", col("island_end") - col("island_start"))
  }

  /** Verified entry (SURVEY §2 st17): every event opens a 5-minute
    * activity interval [ts, ts+300s] in µs; merged islands are the
    * user's continuous activity spans (st1's sessions re-derived via
    * interval algebra — same gap law, different operator: this one
    * takes arbitrary PRE-EXISTING intervals, where st1 only ever has
    * points). Ordering is entry-side only.
    */
  def st17(spark: SparkSession, dir: String): DataFrame = {
    val iv = Tables.events(spark, dir)
      .withColumn("start_us", unix_micros(col("ts")))
      .withColumn("end_us", col("start_us") + lit(300000000L))
    mergeIntervals(iv, "user_id", "start_us", "end_us", "event_id")
      .select(col("user_id"), col("island_seq"), col("island_start"),
        col("island_end"), col("n_intervals"), col("covered").as("covered_us"))
      .orderBy(col("user_id"), col("island_seq"))
  }

  /** Per-state dwell time: how long the stream sits in each state
    * before the next event — lead(ts) - ts per key in the provably
    * total (ts_us, id) order, aggregated per state. The terminal
    * event of each key has no successor and is excluded (its dwell
    * is right-censored, not zero — counting it as 0 would bias every
    * mean down).
    *
    * Scale shape: the lead window is ONE key shuffle carrying only
    * (key, ts, id, state); the aggregation then shuffles per-state
    * PARTIAL sums — |states| keys, map-side combined. Dwell sums
    * accumulate as exact µs longs; the mean divides the exact sums
    * once at the end (one FP op, round-4 — no per-row FP folding).
    */
  def dwellByState(df: DataFrame, keyCol: String, tsCol: String,
                   idCol: String, stateCol: String): DataFrame = {
    val order = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(idCol))
    df
      .select(col(keyCol), col(tsCol), col(idCol), col(stateCol))
      .withColumn("__dwell_us", lead(col(tsCol), 1).over(order) - col(tsCol))
      .filter(col("__dwell_us").isNotNull)
      .groupBy(col(stateCol).as("state"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("__dwell_us")).as("total_dwell_us"))
      .withColumn("avg_dwell_s",
        round(col("total_dwell_us").cast("double") / lit(1000000.0) /
          col("n").cast("double"), 4))
  }

  /** Verified entry (SURVEY §2 st18): per-event-type dwell over
    * `events` — st6's transition matrix answers "where do users go
    * next"; this answers "how long do they stay first".
    */
  def st18(spark: SparkSession, dir: String): DataFrame =
    dwellByState(
      Tables.events(spark, dir).withColumn("ts_us", unix_micros(col("ts"))),
      "user_id", "ts_us", "event_id", "event_type")
      .orderBy(col("state"))

  /** Peak concurrency: the max number of simultaneously-open
    * intervals, reported per day — the "how many users were active AT
    * ONCE" capacity question (st8 counts distinct actives per window;
    * this counts the instantaneous maximum). Classic sweep-line:
    * every interval [s, s+dur) contributes a +1 delta at s and a -1
    * at s+dur; concurrency is the running sum of deltas in time
    * order. Intervals are half-open — all deltas at one instant net
    * together, so an interval ending exactly when another starts
    * never co-counts.
    *
    * Scale shape: a literal running sum is a GLOBAL order — one task.
    * This is the x9b/x10 banded decomposition instead: deltas net
    * per-µs inside (day, hour) bands (one hash shuffle, map-side
    * combined; the groupBy reuses the band partitioning because the
    * band keys prefix the group keys), per-band nets roll up to a
    * tiny |days|×24 offsets table whose exclusive prefix sum runs on
    * one partition of ~thousands of rows and then BROADCASTS back, and
    * each band adds its offset to its local running sum — bit-equal to
    * the global spelling (the oracle replays the global form, so the
    * decomposition is DuckDB-proven). Per-task work is bounded by one
    * hour's distinct state-change instants; a hotter tenant picks a
    * finer band (minute) — same algebra.
    *
    * A day's peak is the max over state-change points WITHIN the day;
    * a day that only carries yesterday's level without any delta
    * reports no row (documented law — both engines agree).
    */
  def peakConcurrency(events: DataFrame, tsUsCol: String,
                      durationUs: Long): DataFrame = {
    val deltas = intervalDeltas(events, tsUsCol, durationUs)
      .withColumn("day", to_date(timestamp_micros(col("us"))))
      .withColumn("hr", hour(timestamp_micros(col("us"))))
      .repartition(col("day"), col("hr"))
    val perUs = deltas.groupBy(col("day"), col("hr"), col("us"))
      .agg(sum(col("delta")).as("net"))
    peakFromNets(perUs)
  }

  /** The ±1 sweep-line delta emission: every interval [t, t+dur)
    * contributes (t, +1) and (t+dur, −1). Narrow; stream-safe.
    */
  private[graft] def intervalDeltas(events: DataFrame, tsUsCol: String,
                                    durationUs: Long): DataFrame =
    events
      .select(explode(array(
        struct(col(tsUsCol).as("us"), lit(1L).as("delta")),
        struct((col(tsUsCol) + lit(durationUs)).as("us"),
          lit(-1L).as("delta")))).as("d"))
      .select(col("d.us").as("us"), col("d.delta").as("delta"))

  /** Finishing stages over the per-instant net-delta frame
    * (day, hr, us, net) — shared verbatim by the batch operator and
    * the streaming twin (which maintains exactly this frame as its
    * upsert-sink state, the st14 "dashboard ranks the table" shape).
    */
  private[graft] def peakFromNets(perUs: DataFrame): DataFrame = {
    val running = runningFromNets(perUs)
    val dayPeak = running.groupBy(col("day"))
      .agg(max(col("running")).as("peak_concurrency"))
    running.join(broadcast(dayPeak), Seq("day"))
      .filter(col("running") === col("peak_concurrency"))
      .groupBy(col("day"), col("peak_concurrency"))
      .agg(min(col("us")).as("peak_at_us"))
      .select(col("day"), col("peak_concurrency"), col("peak_at_us"))
  }

  /** The banded running concurrency level: offsets table prefix-sums
    * on the tiny (day, hr) side and broadcasts back, each band adds
    * its offset to its local running sum — bit-equal to the global
    * running sum (the st24 oracle proves it). Shared by peak (st24)
    * and the duration histogram (st27).
    */
  private[graft] def runningFromNets(perUs: DataFrame): DataFrame = {
    val offsets = perUs.groupBy(col("day"), col("hr"))
      .agg(sum(col("net")).as("band_net"))
      .withColumn("band_off", coalesce(
        sum(col("band_net")).over(Window.orderBy(col("day"), col("hr"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("day"), col("hr"), col("band_off"))
    perUs.join(broadcast(offsets), Seq("day", "hr"))
      .withColumn("running", col("band_off") +
        sum(col("net")).over(Window.partitionBy(col("day"), col("hr"))
          .orderBy(col("us"))
          .rowsBetween(Window.unboundedPreceding, 0)))
  }

  /** Verified entry (SURVEY §2 st24): peak concurrent 5-minute
    * activity intervals per day over `events` — st17's intervals fed
    * through the sweep-line instead of the island merge.
    */
  def st24(spark: SparkSession, dir: String): DataFrame =
    peakConcurrency(
      Tables.events(spark, dir).withColumn("ts_us", unix_micros(col("ts"))),
      "ts_us", 300000000L)
      .orderBy(col("day"))

  /** Concurrency DURATION histogram (st27): how long the system sat
    * at each concurrency level — st24 finds the per-day max, this
    * prices the whole distribution (capacity planning reads "p95 of
    * time-weighted concurrency", not just the spike). Each
    * state-change instant holds its level until the NEXT instant;
    * the histogram sums those spans per level. Level 0 spans (gaps
    * between any activity) are included; the final instant has no
    * successor and is dropped (its level is 0 by conservation — the
    * sweep always returns to zero).
    *
    * Scale shape: rides st24's one band exchange + tiny broadcast
    * offsets; the NEXT-instant lookup is a within-band lead patched
    * at band boundaries by a broadcast |bands|-row next-first table
    * (the cross-band successor — bands may be empty, so the tiny
    * table's global lead skips to the next NONEMPTY band). Final
    * per-level aggregation shuffles |levels| partial rows.
    */
  def concurrencyHistogram(events: DataFrame, tsUsCol: String,
                           durationUs: Long): DataFrame = {
    val deltas = intervalDeltas(events, tsUsCol, durationUs)
      .withColumn("day", to_date(timestamp_micros(col("us"))))
      .withColumn("hr", hour(timestamp_micros(col("us"))))
      .repartition(col("day"), col("hr"))
    val perUs = deltas.groupBy(col("day"), col("hr"), col("us"))
      .agg(sum(col("delta")).as("net"))
    histogramFromNets(perUs)
  }

  /** Histogram finishing stage over the (day, hr, us, net) frame —
    * shared by the batch operator and the streaming twin, which runs
    * it over the SAME compacted upsert-sink state st24's twin
    * maintains (one state table, two reports).
    */
  private[graft] def histogramFromNets(perUs: DataFrame): DataFrame = {
    val running = runningFromNets(perUs)
    val nextFirst = perUs.groupBy(col("day"), col("hr"))
      .agg(min(col("us")).as("__first_us"))
      .withColumn("next_band_first",
        lead(col("__first_us"), 1).over(Window.orderBy(col("day"), col("hr"))))
      .select(col("day"), col("hr"), col("next_band_first"))
    running
      .withColumn("__next_in_band",
        lead(col("us"), 1).over(Window.partitionBy(col("day"), col("hr"))
          .orderBy(col("us"))))
      .join(broadcast(nextFirst), Seq("day", "hr"))
      .withColumn("__next_us", coalesce(col("__next_in_band"), col("next_band_first")))
      .filter(col("__next_us").isNotNull)
      .groupBy(col("running").as("level"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("__next_us") - col("us")).as("total_us"))
      .select(col("level"), col("n_spans"), col("total_us"))
  }

  /** Verified entry (SURVEY §2 st27): time-at-level histogram of the
    * 5-minute activity sweep over `events`.
    */
  def st27(spark: SparkSession, dir: String): DataFrame =
    concurrencyHistogram(
      Tables.events(spark, dir).withColumn("ts_us", unix_micros(col("ts"))),
      "ts_us", 300000000L)
      .orderBy(col("level"))
}
