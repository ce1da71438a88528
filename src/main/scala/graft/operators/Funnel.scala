package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Ordered-funnel analysis: for each user, the timestamp at which
  * they first completed each step of an ordered step sequence, where
  * step k+1 must happen STRICTLY after the user's step-k time. The
  * classic product-analytics query (view → click → purchase), and a
  * shape SQL engines answer with k self-joins.
  *
  * Implementation is a single-shuffle per-key fold instead: events
  * (pre-filtered to the step types, so the shuffle carries only
  * relevant rows) are grouped per user, sorted by the total
  * (ts, event_id) order, and folded through the step state machine
  * with `aggregate` — all Catalyst array expressions, no UDF, no
  * driver state. Per-user event counts are the bounded quantity here
  * (product-analytics sessions, not the corpus); a user's whole
  * filtered history must fit one task, the same per-key-bounded
  * assumption st1's sessionization already documents. The k-join
  * spelling (each step's min-ts joined back) is the fallback when a
  * single key's history is unbounded — it trades k shuffles for O(1)
  * per-row state. The DuckDB oracle replays that spelling, which
  * doubles as a proof the two formulations agree.
  *
  * Step-k time = min event ts of type k strictly greater than the
  * step-(k-1) time; fold order makes that the first qualifying event
  * in (ts, event_id) order — identical because ties at the boundary
  * are excluded by strictness on both spellings.
  */
object Funnel {

  /** Per-user first-completion times for a 3-step funnel, plus the
    * number of steps reached. Users with no step-type events at all
    * are absent (they never enter the shuffle); users are otherwise
    * present with NULL times for unreached steps.
    */
  def funnel3(events: DataFrame, userCol: String, tsCol: String,
              idCol: String, typeCol: String,
              steps: (String, String, String),
              maxSeriesLen: Long = SeriesGuard.DefaultMaxSeriesLen): DataFrame =
    funnel3Keyed(events, Seq(userCol), tsCol, idCol, typeCol, steps, maxSeriesLen)

  /** The same fold grouped by a COMPOSITE key (e.g. user + session) —
    * the funnel-within-session shape st16 verifies.
    */
  def funnel3Keyed(events: DataFrame, keyCols: Seq[String], tsCol: String,
                   idCol: String, typeCol: String,
                   steps: (String, String, String),
                   maxSeriesLen: Long = SeriesGuard.DefaultMaxSeriesLen): DataFrame = {
    val (s1, s2, s3) = steps
    // maxSeriesLen: this fold buffers each key's full step-event
    // series in one aggregation buffer — SeriesGuard turns a hot key
    // into a named failure instead of a buffer OOM (st29's contract).
    // An event with a null key is an anonymous event: it belongs to
    // no user/session and cannot enter a per-key funnel (grouping the
    // nulls would fold every anonymous event into ONE phantom actor —
    // and hand that actor's key the corpus's largest series at scale).
    val keyed = keyCols.foldLeft(events)((d, k) => d.filter(col(k).isNotNull))
    val filtered = SeriesGuard.boundedSeries(
      keyed
        .filter(col(typeCol).isin(s1, s2, s3))
        .select((keyCols.map(col) ++ Seq(col(tsCol), col(idCol), col(typeCol))): _*),
      keyCols, maxSeriesLen)
    val nullTs = lit(null).cast("long")
    val init = struct(nullTs.as("t1"), nullTs.as("t2"), nullTs.as("t3"))
    def step(st: Column, ev: Column): Column = {
      val ts = ev.getField(tsCol)
      val ty = ev.getField(typeCol)
      struct(
        when(st.getField("t1").isNull && ty === s1, ts)
          .otherwise(st.getField("t1")).as("t1"),
        when(st.getField("t2").isNull && st.getField("t1").isNotNull &&
          ty === s2 && ts > st.getField("t1"), ts)
          .otherwise(st.getField("t2")).as("t2"),
        when(st.getField("t3").isNull && st.getField("t2").isNotNull &&
          ty === s3 && ts > st.getField("t2"), ts)
          .otherwise(st.getField("t3")).as("t3"))
    }
    filtered
      .groupBy(keyCols.map(col): _*)
      .agg(array_sort(collect_list(struct(col(tsCol), col(idCol), col(typeCol))))
        .as("__evs"))
      .withColumn("__st", aggregate(col("__evs"), init, step))
      .select((keyCols.map(col) ++ Seq(
        col("__st").getField("t1").as("step1_ts"),
        col("__st").getField("t2").as("step2_ts"),
        col("__st").getField("t3").as("step3_ts"))): _*)
      .withColumn("reached",
        when(col("step3_ts").isNotNull, 3)
          .when(col("step2_ts").isNotNull, 2)
          .when(col("step1_ts").isNotNull, 1)
          .otherwise(0))
  }

  /** st5: the view → click → purchase funnel over the event log,
    * times as epoch micros.
    */
  def st5(spark: SparkSession, dir: String): DataFrame =
    funnel3(
      Tables.events(spark, dir)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("ts_us"), col("event_type")),
      userCol = "user_id", tsCol = "ts_us", idCol = "event_id",
      typeCol = "event_type", steps = ("view", "click", "purchase"))
      .select(col("user_id"), col("step1_ts").as("step1_ts_us"),
        col("step2_ts").as("step2_ts_us"), col("step3_ts").as("step3_ts_us"),
        col("reached"))
      .orderBy(col("user_id"))

  /** Funnel step-timing report (st13): per transition, who was
    * eligible (completed the previous step), who converted, and the
    * exact p25/p50/p75 of the conversion delay — the "WHERE does the
    * funnel leak and HOW LONG does the healthy path take" report that
    * sits on top of st5's per-user times (conversion-rate numbers
    * alone hide a step that converts fine but takes days).
    *
    * Scale shape: rides the funnel frame (one row per user — already
    * the product of st5's single shuffle); each user unpivots to one
    * row per transition (narrow ×2 fan-out), then ONE tiny-key agg.
    * Percentiles are exact interpolated (a8's discipline — the
    * engine-parity spelling); at 100 TB swap approx_percentile
    * (t-digest), the a8b trade.
    */
  def funnelTiming(funnel: DataFrame): DataFrame = {
    val pairs = funnel.select(explode(array(
      struct(lit("step1_to_step2").as("transition"),
        (col("step2_ts") - col("step1_ts")).cast("double").as("delay_us"),
        col("step1_ts").isNotNull.as("eligible")),
      struct(lit("step2_to_step3").as("transition"),
        (col("step3_ts") - col("step2_ts")).cast("double").as("delay_us"),
        col("step2_ts").isNotNull.as("eligible")))).as("t"))
      .select(col("t.transition").as("transition"),
        col("t.delay_us").as("delay_us"), col("t.eligible").as("eligible"))
    pairs.groupBy(col("transition"))
      .agg(
        sum(when(col("eligible"), 1L).otherwise(0L)).as("n_eligible"),
        count(col("delay_us")).as("n_converted"),
        round(count(col("delay_us")).cast("double") /
          sum(when(col("eligible"), 1L).otherwise(0L)), 6).as("conv_rate"),
        round(percentile(col("delay_us"), lit(0.25)), 4).as("delay_p25_us"),
        round(percentile(col("delay_us"), lit(0.5)), 4).as("delay_p50_us"),
        round(percentile(col("delay_us"), lit(0.75)), 4).as("delay_p75_us"))
  }

  /** Verified entry (st13): timing over st5's funnel. Sort is
    * oracle-determinism only.
    */
  def st13(spark: SparkSession, dir: String): DataFrame =
    funnelTiming(funnel3(
      Tables.events(spark, dir)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("ts_us"), col("event_type")),
      userCol = "user_id", tsCol = "ts_us", idCol = "event_id",
      typeCol = "event_type", steps = ("view", "click", "purchase")))
      .orderBy(col("transition"))

  /** Session-scoped funnel (st16): st5's step machine per (user,
    * SESSION) — "did the view→click→purchase happen within one
    * visit", the form conversion analysis actually ships (a purchase
    * three weeks after the view is a return, not a conversion).
    * Session boundaries are st1's gap law computed over ALL events
    * (a non-step event keeps a session alive — filtering first would
    * move boundaries), then the step fold groups on the composite
    * (user, session) key. Both stages ride the SAME user_id-prefixed
    * shuffle; sessions with step events but no step-1 view surface
    * with reached = 0, sessions with no step events at all are
    * absent (they never enter the funnel shuffle).
    */
  def st16(spark: SparkSession, dir: String,
           gapMinutes: Int = 30): DataFrame = {
    val gapUs = gapMinutes * 60L * 1000000L
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val sess = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"))
      .withColumn("__prev", lag(col("ts_us"), 1).over(byUser))
      .withColumn("__new",
        when(col("__prev").isNull || col("ts_us") - col("__prev") > gapUs, 1)
          .otherwise(0))
      .withColumn("session_seq", sum(col("__new")).over(byUser
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0))
        .cast("long"))
      .drop("__prev", "__new")
    funnel3Keyed(sess, Seq("user_id", "session_seq"),
      tsCol = "ts_us", idCol = "event_id", typeCol = "event_type",
      steps = ("view", "click", "purchase"))
      .select(col("user_id"), col("session_seq"),
        col("step1_ts").as("step1_ts_us"), col("step2_ts").as("step2_ts_us"),
        col("step3_ts").as("step3_ts_us"), col("reached"))
      .orderBy(col("user_id"), col("session_seq"))
  }
}
