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
}
