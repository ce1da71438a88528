package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Rolling engagement and anomaly operators over the event stream —
  * the "is the product healthy" pair every analytics deployment runs
  * daily: rolling distinct actives (DAU/WAU/stickiness) and
  * self-baselined series anomaly flags.
  */
object Activity {

  /** Rolling distinct active users: for each active day, the distinct
    * users that day (DAU) and over the trailing `windowDays` window
    * (WAU), plus the DAU/WAU stickiness ratio.
    *
    * Rolling COUNT DISTINCT does not decompose into a window frame
    * (distinct is not subtractable), so the naive spelling is a
    * per-day self-join over the raw fact table — at 100 TB that
    * re-scans the corpus per day. This spelling instead: (1) dedupe
    * to (day, user) pairs — ONE shuffle over data that is already
    * tiny relative to the fact table (≤ days × users rows, and
    * map-side partial dedupe collapses each task's repeat visitors
    * before the exchange); (2) explode each pair to the ≤
    * `windowDays` window days it contributes to — a NARROW
    * constant-factor fan-out, no join, never quadratic; (3) one
    * distinct-agg shuffle on (target day, user). Target days with
    * dau = 0 are exactly the days that were never active (gap days
    * and the fan-out past the series end) — an active day has ≥ 1
    * distinct user by construction — so a post-agg filter replaces
    * the day-grid semi-join a between-join spelling needs (which
    * would both re-scan the fact table for the grid and plan a
    * nested-loop). Total: ONE fact scan, one dedupe shuffle, one
    * agg shuffle, no joins at all. An exact sliding distinct at a
    * 7-day window costs ≤ 7× the deduped pair set — the approximate
    * path (per-day HLL sketches merged across the window, a5b's
    * sketch family) is the lever when even that fan-out is too much.
    */
  def rollingActiveUsers(events: DataFrame, userCol: String, tsCol: String,
                         windowDays: Int = 7): DataFrame = {
    events
      .filter(col(userCol).isNotNull)
      .select(to_date(col(tsCol)).as("day"), col(userCol).as("__u"))
      .distinct()
      .withColumn("g_day",
        explode(sequence(col("day"), date_add(col("day"), windowDays - 1))))
      .groupBy(col("g_day"))
      .agg(
        countDistinct(when(col("day") === col("g_day"), col("__u"))).as("dau"),
        countDistinct(col("__u")).as("wau"))
      .filter(col("dau") > 0)
      .select(col("g_day").as("day"), col("dau"), col("wau"),
        round(col("dau").cast("double") / col("wau"), 4).as("stickiness"))
  }

  /** Verified entry (st8): 7-day rolling actives over `events`. */
  def st8(spark: SparkSession, dir: String): DataFrame =
    rollingActiveUsers(Tables.events(spark, dir), "user_id", "ts")
      .orderBy(col("day"))

  /** The sketch path for rolling actives — the lever named in
    * [[rollingActiveUsers]] for when even the bounded pair fan-out is
    * too much: ONE mergeable HLL sketch row per day (constant bytes,
    * Spark's DataSketches `hll_sketch_agg`) replaces the per-(day,
    * user)-pair fan-out, so the rolling union runs over days ×
    * windowDays SKETCH rows instead of pairs × windowDays — the
    * per-day reduction is map-side and the rolling stage's input no
    * longer scales with user count at all. DAU stays exact (free at
    * day grain); WAU becomes the HLL union estimate (±~0.8% at
    * lgK=14). Returns (day, dau, wau_est).
    */
  def rollingActiveSketch(events: DataFrame, userCol: String, tsCol: String,
                          windowDays: Int = 7, lgK: Int = 14): DataFrame = {
    events
      .filter(col(userCol).isNotNull)
      .select(to_date(col(tsCol)).as("day"), col(userCol).as("__u"))
      .groupBy(col("day"))
      .agg(hll_sketch_agg(col("__u"), lgK).as("__sk"),
        countDistinct(col("__u")).as("__dau"))
      .withColumn("g_day",
        explode(sequence(col("day"), date_add(col("day"), windowDays - 1))))
      .groupBy(col("g_day"))
      .agg(
        max(when(col("day") === col("g_day"), col("__dau"))).as("dau"),
        hll_sketch_estimate(hll_union_agg(col("__sk"))).as("wau_est"))
      .filter(col("dau").isNotNull)
      .select(col("g_day").as("day"), col("dau"), col("wau_est"))
  }

  /** Roll a WAU estimate over a persisted day-sketch table — the
    * mergeable-state sibling of [[rollingActiveSketch]] and the
    * production pattern the sketch family exists for: store ONE HLL
    * row per day (constant bytes, built batch-wise or streamed —
    * Streams.dailySketchStream maintains the same table from a
    * stream), then roll ANY window over days × windowDays sketch
    * rows without ever re-touching events. DataSketches HLL state is
    * a per-bucket max, so the union estimate is insertion-order- and
    * batch-boundary-invariant: streaming-built and batch-built day
    * sketches produce the SAME estimate (StreamingSpec pins exact
    * equality). Emits only days that had activity (st8's contract).
    */
  def rollingWauFromSketches(daySketches: DataFrame, windowDays: Int = 7,
                             dayCol: String = "day",
                             skCol: String = "day_sk"): DataFrame =
    daySketches
      .withColumn("g_day",
        explode(sequence(col(dayCol), date_add(col(dayCol), windowDays - 1))))
      .groupBy(col("g_day"))
      .agg(hll_sketch_estimate(hll_union_agg(col(skCol))).as("wau_est"),
        max(when(col(dayCol) === col("g_day"), lit(1))).as("__active"))
      .filter(col("__active").isNotNull)
      .select(col("g_day").as(dayCol), col("wau_est"))

  /** Verified entry (st8b): the sketch path gated IN-QUERY against
    * the exact path (a8b's pattern — the oracle replays the exact
    * values and literal-true flags, so a drifting sketch breaks the
    * hash): exact dau must agree bit-for-bit, wau_est must land
    * within 5% (≥6σ headroom at lgK=14) of exact wau.
    */
  def st8b(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(spark, dir)
    val exact = rollingActiveUsers(events, "user_id", "ts")
    val sketch = rollingActiveSketch(events, "user_id", "ts")
    exact.join(sketch.select(col("day"), col("dau").as("__dau_sk"),
        col("wau_est")), Seq("day"))
      .select(col("day"), col("dau"), col("wau"),
        (col("__dau_sk") === col("dau")).as("dau_ok"),
        (abs(col("wau_est") - col("wau")) <=
          greatest(lit(1.0), col("wau") * 0.05)).as("wau_ok"))
      .orderBy(col("day"))
  }

  /** Per-series z-score anomaly flags: each (series key, day) point
    * is scored against the trailing `baselineDays` points of ITS OWN
    * series — mean and sample stddev over a lagged ROWS frame, so
    * today's value never contaminates its own baseline. A point with
    * fewer than 2 prior points has no defined deviation and is
    * never flagged (null z).
    *
    * Scale shape: one shuffle to the (key, day) grain — map-side
    * partial aggregation collapses the fact rows — then a window
    * over the key-grain SERIES, whose per-key length is days, not
    * rows. The fact table is never window-sorted; series math rides
    * a frame that is bounded by construction (`baselineDays`).
    */
  def zscoreAnomalies(events: DataFrame, keyCol: String, tsCol: String,
                      valCol: String, baselineDays: Int = 7,
                      threshold: Double = 2.0): DataFrame = {
    val series = events
      .filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol).as("series"), to_date(col(tsCol)).as("day"))
      .agg(avg(col(valCol)).as("__mean"))
    val baseline = Window.partitionBy(col("series")).orderBy(col("day"))
      .rowsBetween(-baselineDays, -1)
    series
      .withColumn("__mu", avg(col("__mean")).over(baseline))
      .withColumn("__sd", stddev_samp(col("__mean")).over(baseline))
      .withColumn("z",
        round(when(col("__sd") > 0,
          (col("__mean") - col("__mu")) / col("__sd")), 4))
      .select(col("series"), col("day"),
        round(col("__mean"), 4).as("daily_mean"), col("z"),
        coalesce(abs(col("z")) > threshold, lit(false)).as("is_anomaly"))
  }

  /** Verified entry (st9): per-event-type daily mean `value` scored
    * against its trailing week.
    */
  def st9(spark: SparkSession, dir: String): DataFrame =
    zscoreAnomalies(Tables.events(spark, dir), "event_type", "ts", "value")
      .orderBy(col("series"), col("day"))

  /** Event-time disorder audit (st10): per key, how out-of-order the
    * stream actually arrives — n_late = events whose event time is
    * behind the running max of everything that arrived before them
    * (arrival order = event_id, the ingest sequence), max_late_us =
    * the worst such regression. THE watermark-sizing report: a
    * streaming deployment sets `withWatermark` delay from the
    * observed lateness tail, and this measures that tail from the
    * recorded log instead of guessing. One shuffle (the per-key
    * window); the running max is a single-pass frame, no self-join.
    */
  def disorderAudit(events: DataFrame, keyCol: String = "user_id",
                    tsCol: String = "ts", seqCol: String = "event_id"): DataFrame = {
    val prev = Window.partitionBy(col(keyCol)).orderBy(col(seqCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .select(col(keyCol), col(seqCol), unix_micros(col(tsCol)).as("__ts_us"))
      .withColumn("__max_prev", max(col("__ts_us")).over(prev))
      .withColumn("__late_us",
        when(col("__max_prev") > col("__ts_us"), col("__max_prev") - col("__ts_us"))
          .otherwise(lit(0L)))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("__late_us") > 0, 1L).otherwise(0L)).as("n_late"),
        max(col("__late_us")).as("max_late_us"))
  }

  /** Verified entry (st10). Sort is oracle-determinism only. */
  def st10(spark: SparkSession, dir: String): DataFrame =
    disorderAudit(Tables.events(spark, dir)).orderBy(col("user_id"))

  /** Watermark-drop simulation (st11): replay the recorded log
    * through Structured Streaming's batch-boundary watermark
    * semantics to answer "what would each candidate `withWatermark`
    * delay have cost in dropped events?" — st10 measures the
    * lateness tail; this prices the cutoffs before a deployment
    * commits to one. Arrival order (seqCol, the ingest sequence) is
    * chunked into micro-batches of `batchSize`; the watermark in
    * force DURING batch i is the max event time over all earlier
    * batches minus the delay (exactly Spark's semantics: the
    * watermark only advances between micro-batches), and an event is
    * dropped iff its event time falls behind that. Batch 1 has no
    * watermark yet — nothing drops there, in Spark or here.
    *
    * Scale shape: one map-side-combined agg to per-batch maxima
    * (n/batchSize rows), the running max on that TINY frame (the
    * fact table is never window-sorted — st9's contract), and the
    * per-batch watermark broadcast back to the facts. The candidate
    * delays ride ONE pass as conditional-sum columns (p14's
    * stack spelling), not a |delays|× row fan-out.
    */
  def watermarkSim(events: DataFrame, delaysSec: Seq[Int] = Seq(0, 60, 300, 900),
                   batchSize: Long = 1000, tsCol: String = "ts",
                   seqCol: String = "event_id"): DataFrame = {
    val facts = events.select(
      expr(s"$seqCol DIV $batchSize").as("__batch"),
      unix_micros(col(tsCol)).as("__ts_us"))
    val prev = Window.orderBy(col("__batch"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wm = facts.groupBy(col("__batch"))
      .agg(max(col("__ts_us")).as("__bmax"))
      .withColumn("__wm_base", max(col("__bmax")).over(prev))
      .select(col("__batch"), col("__wm_base"))
    val joined = facts.join(broadcast(wm), Seq("__batch"))
    val drops = delaysSec.map { d =>
      sum(when(col("__wm_base") - lit(d.toLong * 1000000L) > col("__ts_us"), 1L)
        .otherwise(0L)).as(s"__drop_$d")
    }
    val one = joined.agg(count(lit(1)).as("__n"), drops: _*)
    val stack = delaysSec.map(d => s"CAST($d AS BIGINT), `__drop_$d`").mkString(", ")
    one.select(col("__n"),
        expr(s"stack(${delaysSec.length}, $stack)").as(Seq("delay_s", "n_dropped")))
      .select(col("delay_s"), col("__n").as("n_events"), col("n_dropped"),
        round(col("n_dropped").cast("double") / col("__n"), 6).as("drop_frac"))
  }

  /** Verified entry (st11). Sort is oracle-determinism only. */
  def st11(spark: SparkSession, dir: String): DataFrame =
    watermarkSim(Tables.events(spark, dir)).orderBy(col("delay_s"))

  /** Offline changepoint per series (st12): the CUSUM argmax — for
    * each series the day that best splits it into a before/after with
    * maximal cumulative deviation |S_t − (t/n)·S_n|, plus the level
    * shift across that split. st9 flags single outlier DAYS against a
    * trailing baseline; this finds the persistent LEVEL SHIFT (deploy
    * regression, logging change, mix shift) a pointwise z-score
    * smears across the tail.
    *
    * Scale shape: one map-side-combined shuffle to the (key, day)
    * grain, then every statistic — ordered cumulative sum, row index,
    * series total — rides ONE window pass over the day-grain series
    * (per-key length = days, not rows; st9's contract). The argmax is
    * a rank filter, not a self-join. All series math folds in day
    * order, so the doubles are reproducible bit-for-bit on any
    * engine — the same ordered-fold discipline as s3's trainer.
    * The last day is excluded as a candidate (a changepoint must
    * leave a non-empty "after"); ties break to the earliest day.
    */
  def cusumChangepoint(events: DataFrame, keyCol: String = "event_type",
                       tsCol: String = "ts", valCol: String = "value"): DataFrame = {
    val series = events
      .filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol).as("series"), to_date(col(tsCol)).as("day"))
      .agg(avg(col(valCol)).as("x"))
    val w = Window.partitionBy(col("series")).orderBy(col("day"))
    val cum = w.rowsBetween(Window.unboundedPreceding, 0)
    val all = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val scored = series
      .withColumn("__s", sum(col("x")).over(cum))
      .withColumn("__t", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(all))
      .withColumn("__total", sum(col("x")).over(all))
      .filter(col("__t") < col("__n"))
      .withColumn("__d",
        abs(col("__s") - col("__t").cast("double") / col("__n") * col("__total")))
    val best = Window.partitionBy(col("series"))
      .orderBy(col("__d").desc, col("day"))
    scored
      .withColumn("__rk", row_number().over(best))
      .filter(col("__rk") === 1)
      .select(col("series"), col("day").as("cp_day"), col("__n").as("n_days"),
        round(col("__s") / col("__t"), 4).as("pre_mean"),
        round((col("__total") - col("__s")) / (col("__n") - col("__t")), 4)
          .as("post_mean"),
        round((col("__total") - col("__s")) / (col("__n") - col("__t"))
          - col("__s") / col("__t"), 4).as("shift"),
        round(col("__d"), 4).as("cusum_score"))
  }

  /** Verified entry (st12). Sort is oracle-determinism only. */
  def st12(spark: SparkSession, dir: String): DataFrame =
    cusumChangepoint(Tables.events(spark, dir)).orderBy(col("series"))

  /** Windowed trending top-k (st14): per tumbling hour, the k most
    * active items with their count and rank — the "trending now"
    * report every event platform ships, and the batch twin of a
    * streaming windowed-agg + per-window top-k. Two bounded steps:
    * the (hour, item) count is a map-side-combined agg on a bounded
    * composite key, and the per-hour cut is a row_number window over
    * the already-aggregated frame (hours × items rows, not events).
    * Ties break (count DESC, item ASC) so the cut is deterministic
    * on both engines. No global sort; the corpus shuffles once on
    * the agg key and once on the tiny hour key.
    */
  def trendingTopK(events: DataFrame, k: Int = 3,
                   tsCol: String = "ts"): DataFrame = {
    val counted = events
      .select(date_trunc("hour", col(tsCol)).as("hour_ts"),
        get_json_object(col("props"), "$.k").cast("int").as("item"))
      .filter(col("item").isNotNull)
      .groupBy(col("hour_ts"), col("item"))
      .agg(count(lit(1)).as("n_events"))
    trendingCut(counted, k)
  }

  /** The per-hour top-k cut over an already-aggregated (hour_ts,
    * item, n_events) frame — shared by the batch path above and the
    * streaming twin (where the frame is the compacted update-mode
    * sink state, Streams.trendingCounts). Runs over hours × items
    * rows, never events; ties break (count DESC, item ASC) so the
    * cut is deterministic on any engine.
    */
  def trendingCut(counts: DataFrame, k: Int = 3): DataFrame = {
    val w = Window.partitionBy(col("hour_ts"))
      .orderBy(col("n_events").desc, col("item"))
    counts
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("hour_ts"), col("item"), col("n_events"),
        col("rank").cast("long").as("rank"))
  }

  /** Verified entry (st14). Sort is oracle-determinism only. */
  def st14(spark: SparkSession, dir: String): DataFrame =
    trendingTopK(Tables.events(spark, dir))
      .orderBy(col("hour_ts"), col("rank"))

  /** Last-touch attribution (st15): each conversion is credited to
    * the user's most recent PRECEDING touch event — the marketing /
    * funnel-credit staple (and the per-row generalization of st5,
    * which only reports the canonical step chain). "Preceding" is
    * strict in the (ts, event_id) arrival order, so a touch at the
    * conversion's own timestamp but a later id never claims credit,
    * and ties between touches resolve to the latest (ts, id) — all
    * deterministic on both engines. Unattributed conversions (no
    * prior touch) survive with null credit: dropping them would
    * silently overstate attribution coverage.
    *
    * Scale shape: ONE user_id shuffle; the carry-forward is a
    * running `last(_, ignoreNulls)` over that partitioning — no
    * self-join, no per-conversion scan-back (the textbook correlated
    * "latest touch before t" subquery the window replaces).
    */
  def lastTouchAttribution(events: DataFrame,
                           conversionType: String = "purchase",
                           touchTypes: Seq[String] = Seq("click", "view")): DataFrame = {
    val ev = events.select(col("user_id"), col("event_id"),
      unix_micros(col("ts")).as("ts_us"), col("event_type"))
    val isTouch = col("event_type").isin(touchTypes: _*)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    ev
      .withColumn("touch_event_id",
        last(when(isTouch, col("event_id")), ignoreNulls = true).over(w))
      .withColumn("touch_type",
        last(when(isTouch, col("event_type")), ignoreNulls = true).over(w))
      .withColumn("touch_ts_us",
        last(when(isTouch, col("ts_us")), ignoreNulls = true).over(w))
      .filter(col("event_type") === conversionType)
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("touch_event_id"), col("touch_type"), col("touch_ts_us"),
        col("touch_event_id").isNotNull.as("attributed"),
        (col("ts_us") - col("touch_ts_us")).as("touch_age_us"))
  }

  /** Verified entry (st15). Sort is oracle-determinism only. */
  def st15(spark: SparkSession, dir: String): DataFrame =
    lastTouchAttribution(Tables.events(spark, dir)).orderBy(col("event_id"))

  /** Daily-activity streaks per user (st19): total active days, number
    * of maximal consecutive-day runs, and the longest run — the
    * engagement-health report (habit formation, churn-risk scoring)
    * every consumer analytics stack ships. The textbook spelling is
    * gaps-and-islands: distinct days → row_number window → day − rank
    * island key → two more aggregations, i.e. one dedupe exchange plus
    * a second window exchange. This spelling folds instead: ONE
    * user_id shuffle (`collect_set` dedupes repeat visits map-side,
    * like st8's pair dedupe), then the sorted day array runs through a
    * single linear `aggregate` fold — run boundaries are exactly the
    * positions where day ≠ prev + 1. Per-user state is the distinct
    * active-day set, bounded by the calendar span of the log (st5's
    * per-key-bounded contract; a multi-decade log wants the two-
    * exchange window spelling instead, which the oracle replays —
    * proving the fold admits the identical result set, x9b's proof
    * pattern).
    */
  def activityStreaks(events: DataFrame, userCol: String = "user_id",
                      tsCol: String = "ts"): DataFrame = {
    events
      .filter(col(userCol).isNotNull)
      .select(col(userCol).as("user_id"),
        unix_date(to_date(col(tsCol))).as("__d"))
      .groupBy(col("user_id"))
      .agg(array_sort(collect_set(col("__d"))).as("__days"))
      .withColumn("__st", expr(
        """aggregate(__days,
          |  named_struct('prev', CAST(-2147483648 AS INT),
          |    'cur', CAST(0 AS BIGINT), 'best', CAST(0 AS BIGINT),
          |    'runs', CAST(0 AS BIGINT)),
          |  (s, d) -> named_struct(
          |    'prev', d,
          |    'cur', IF(d = s.prev + 1, s.cur + 1L, 1L),
          |    'best', GREATEST(s.best, IF(d = s.prev + 1, s.cur + 1L, 1L)),
          |    'runs', s.runs + IF(d = s.prev + 1, 0L, 1L)))""".stripMargin))
      .select(col("user_id"),
        size(col("__days")).cast("long").as("active_days"),
        col("__st.runs").as("n_streaks"),
        col("__st.best").as("longest_streak"))
  }

  /** Verified entry (st19). Sort is oracle-determinism only. */
  def st19(spark: SparkSession, dir: String): DataFrame =
    activityStreaks(Tables.events(spark, dir)).orderBy(col("user_id"))

  /** Returning-user rate (st20): per active day, how many of that
    * day's distinct users were ALSO active in the trailing
    * `windowDays` window — the daily retention/churn split every
    * growth dashboard pairs with st8's DAU/WAU ("how many came back"
    * vs "how many showed up"). new_users = dau − returning.
    *
    * Scale shape: st8's bounded fan-out idiom, extended to carry
    * WHICH side a pair contributes to: the deduped (day, user) pair
    * explodes to its target day (as the "current" contribution) and
    * the `windowDays` following days (as a "prior" contribution) —
    * narrow ≤(w+1)× fan-out, never a self-join of the activity frame
    * (the textbook spelling joins activity to itself on user +
    * day-range, a per-user quadratic). One (target day, user) agg
    * folds the flags, one day agg counts; a user is `returning` iff
    * both flags land. Total: one dedupe shuffle, one flag shuffle,
    * one tiny day agg, zero joins (plan-pinned).
    */
  def returningUsers(events: DataFrame, userCol: String = "user_id",
                     tsCol: String = "ts", windowDays: Int = 7): DataFrame = {
    val pairs = events
      .filter(col(userCol).isNotNull)
      .select(to_date(col(tsCol)).as("day"), col(userCol).as("__u"))
      .distinct()
    val flags = pairs
      .withColumn("g_day",
        explode(sequence(col("day"), date_add(col("day"), windowDays))))
      .groupBy(col("g_day"), col("__u"))
      .agg(max(col("day") === col("g_day")).as("__cur"),
        max(col("day") < col("g_day")).as("__prior"))
      .filter(col("__cur"))
    flags
      .groupBy(col("g_day").as("day"))
      .agg(count(lit(1)).as("dau"),
        sum(when(col("__prior"), 1L).otherwise(0L)).as("returning"))
      .select(col("day"), col("dau"), col("returning"),
        (col("dau") - col("returning")).as("new_users"),
        round(col("returning").cast("double") / col("dau"), 6).as("returning_rate"))
  }

  /** Verified entry (st20). Sort is oracle-determinism only. */
  def st20(spark: SparkSession, dir: String): DataFrame =
    returningUsers(Tables.events(spark, dir)).orderBy(col("day"))

  /** Inter-event gap statistics (st21): per event type, the
    * distribution of the SAME USER's consecutive-event gaps — count,
    * exact p50/p90/p99 and max, in seconds. This is the measurement
    * st1's session gap and a stream's `withWatermark` delay are set
    * FROM (a session cut below the p90 gap shreds real sessions;
    * st10/st11 price lateness, this prices idle time). Gaps are
    * exact µs longs from a lead diff in the total (ts_us, event_id)
    * order (st18's law); the gap is attributed to the EARLIER
    * event's type (the state the user idled in).
    *
    * Scale shape: ONE user_id shuffle for the lead window (the same
    * exchange st18 rides), then a map-side-combined per-type
    * aggregation on the tiny type key; exact percentiles interpolate
    * per a8's engine-parity law (approx_percentile is the 100 TB
    * swap, a8b's trade) over the exact µs integers; the seconds
    * conversion is ONE division + round after the interpolation, so
    * both engines compute the same double once.
    */
  def gapStats(events: DataFrame, keyCol: String = "user_id",
               tsCol: String = "ts", typeCol: String = "event_type"): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__ts_us"), col("event_id"))
    events
      .select(col(keyCol), col("event_id"), col(typeCol),
        unix_micros(col(tsCol)).as("__ts_us"))
      .withColumn("__gap_us", lead(col("__ts_us"), 1).over(w) - col("__ts_us"))
      .filter(col("__gap_us").isNotNull)
      .groupBy(col(typeCol))
      .agg(count(lit(1)).as("n_gaps"),
        round(percentile(col("__gap_us"), lit(0.5)) / 1000000.0, 4).as("p50_s"),
        round(percentile(col("__gap_us"), lit(0.9)) / 1000000.0, 4).as("p90_s"),
        round(percentile(col("__gap_us"), lit(0.99)) / 1000000.0, 4).as("p99_s"),
        round(max(col("__gap_us")) / 1000000.0, 4).as("max_s"))
  }

  /** Verified entry (st21). Sort is oracle-determinism only. */
  def st21(spark: SparkSession, dir: String): DataFrame =
    gapStats(Tables.events(spark, dir)).orderBy(col("event_type"))

  /** First-vs-last-touch attribution (st23): each conversion credited
    * under BOTH models side by side — first preceding touch (the
    * acquisition view) and latest preceding touch (st15's conversion
    * view) — plus `same_touch` marking single-touch journeys where
    * the models agree. Marketing runs both and argues about the
    * middle; this is the comparison frame that argument reads from.
    * Order/tie law is st15's exactly: strict (ts, event_id)
    * precedence.
    *
    * Scale shape: ONE user_id shuffle; both carries ride the same
    * window frame (first/last with ignoreNulls over the same
    * partitioning — no second exchange, no self-join).
    */
  def firstLastTouch(events: DataFrame,
                     conversionType: String = "purchase",
                     touchTypes: Seq[String] = Seq("click", "view")): DataFrame = {
    val ev = events.select(col("user_id"), col("event_id"),
      unix_micros(col("ts")).as("ts_us"), col("event_type"))
    val isTouch = col("event_type").isin(touchTypes: _*)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    ev
      .withColumn("first_touch_id",
        first(when(isTouch, col("event_id")), ignoreNulls = true).over(w))
      .withColumn("last_touch_id",
        last(when(isTouch, col("event_id")), ignoreNulls = true).over(w))
      .filter(col("event_type") === conversionType)
      .select(col("event_id"), col("user_id"),
        col("first_touch_id"), col("last_touch_id"),
        col("first_touch_id").isNotNull.as("attributed"),
        (col("first_touch_id") === col("last_touch_id")).as("same_touch"))
  }

  /** Verified entry (st23). Sort is oracle-determinism only. */
  def st23(spark: SparkSession, dir: String): DataFrame =
    firstLastTouch(Tables.events(spark, dir)).orderBy(col("event_id"))

  /** Integer EWMA state per key (st29) — the exponential smoother
    * every monitoring/forecast stack keeps per series, spelled so the
    * recursion is EXACT: s₀ = v₀, sᵢ = sᵢ₋₁ + ⌊(vᵢ − sᵢ₋₁)/2^shift⌋
    * on the e6 value grid (α = 1/2^shift). The floor is the
    * mathematical one — `(d − pmod(d, m)) div m` in Spark, plain
    * `//` in DuckDB — so a falling series smooths bit-identically to
    * a rising one on both engines; no float power, no summation
    * order, no drift. Emitted per key: observation count, the last
    * raw value, the smoothed state, and the signed smoother lag
    * (last − ewma: how far the smoother trails the raw series — the
    * st9/st12 anomaly inputs at O(keys) cost).
    *
    * Sequential state has no window spelling (infinite memory), so
    * the fold runs over each key's sorted series via
    * `aggregate(sort_array(collect_list(struct(…))))` — ONE
    * user-keyed shuffle (map-combined collect), fold narrow, output
    * |keys| rows. Per-key state is the series length: the same
    * bounded contract the flatMapGroupsWithState twins buffer under
    * — and this fold IS the batch form of that streaming state
    * update. The contract is ENFORCED by `maxSeriesLen`
    * ([[SeriesGuard]]): a key holding more events than the valve
    * fails with a named error pointing at the streaming twin, never
    * a cryptic aggregation-buffer OOM.
    */
  def ewmaState(events: DataFrame, keyCol: String, tsCol: String,
                idCol: String, valE6: org.apache.spark.sql.Column,
                shift: Int = 2,
                maxSeriesLen: Long = SeriesGuard.DefaultMaxSeriesLen): DataFrame = {
    val m = 1 << shift
    // An observation needs an owner and a value: null-key rows are
    // anonymous (no series to belong to) and null-value rows carry no
    // observation — both skip, else one null __v poisons the fold's
    // accumulator for the rest of the series. n_obs counts real
    // observations. The oracle applies the same predicate.
    SeriesGuard.boundedSeries(
      events
        .select(col(keyCol), col(tsCol).cast("long").as("__ts"),
          col(idCol).cast("long").as("__id"), valE6.cast("long").as("__v"))
        .filter(col(keyCol).isNotNull && col("__v").isNotNull),
      Seq(keyCol), maxSeriesLen)
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(col("__ts"), col("__id"), col("__v"))))
        .as("__series"))
      .select(col(keyCol),
        size(col("__series")).cast("long").as("n_obs"),
        expr("element_at(__series, -1).__v").as("last_v_e6"),
        expr(
          s"""aggregate(__series, cast(null as bigint),
             | (acc, x) -> if(acc is null, x.__v,
             |   acc + (x.__v - acc - pmod(x.__v - acc, $m)) div $m))"""
            .stripMargin.replace("\n", " ")).as("ewma_e6"))
      .withColumn("lag_e6", col("last_v_e6") - col("ewma_e6"))
  }

  /** Verified entry (st29). Sort is oracle-determinism only. */
  def st29(spark: SparkSession, dir: String): DataFrame =
    ewmaState(
      Tables.events(spark, dir).withColumn("ts_us", unix_micros(col("ts"))),
      "user_id", "ts_us", "event_id",
      expr("cast(round(value * 1000000) as bigint)"))
      .orderBy(col("user_id"))

  /** Debounce / gap-collapse (st30) — the event-cleaning pass run
    * before any funnel/attribution/count consumes a click stream:
    * rapid-fire repeats of the SAME (user, type) — double-clicks,
    * retry storms, sensor chatter — collapse onto their lead event.
    * An event is kept iff it follows its (user, type) predecessor by
    * MORE than `gapUs` (st1's session-boundary law applied as a
    * filter: the lag-gap spelling, stated — a last-KEPT-relative
    * throttle is a different, sequential operator); each kept event
    * reports how many repeats it absorbed and the span they covered,
    * so the suppressed mass is auditable, never silently dropped.
    *
    * Scale shape: ONE (user, type)-keyed sort carries both windows
    * (the lag and the running kept-count that names each run); the
    * run agg collapses map-side BEFORE its exchange because a run
    * lives inside one partition by construction. Per-key state is
    * the series length; no joins, no range partition.
    */
  def debounce(events: DataFrame, gapUs: Long): DataFrame = {
    val all = events.select(col("user_id"), col("event_type"), col("event_id"),
      unix_micros(col("ts")).as("ts_us"))
    // Anonymous (null-user) events have no stream to debounce
    // against — a window partition would collapse every anonymous
    // event into one phantom stream and suppress real rows. They pass
    // through UNSUPPRESSED (this is a cleaning pass: nothing may be
    // silently dropped), each its own lead with n_suppressed = 0.
    val anon = all.filter(col("user_id").isNull)
      .select(col("user_id"), col("event_type"), col("event_id"),
        col("ts_us"), lit(0L).as("n_suppressed"), lit(0L).as("span_us"))
    val ev = all.filter(col("user_id").isNotNull)
    val ord = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts_us"), col("event_id"))
    ev
      .withColumn("__prev", lag(col("ts_us"), 1).over(ord))
      .withColumn("__kept",
        col("__prev").isNull || col("ts_us") - col("__prev") > gapUs)
      .withColumn("__run",
        sum(when(col("__kept"), 1L).otherwise(0L))
          .over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("event_type"), col("__run"))
      .agg(min(struct(col("ts_us"), col("event_id"))).as("__lead"),
        count(lit(1)).as("__n"), max(col("ts_us")).as("__last_ts"))
      .select(col("user_id"), col("event_type"),
        col("__lead.event_id").as("event_id"),
        col("__lead.ts_us").as("ts_us"),
        (col("__n") - 1).as("n_suppressed"),
        (col("__last_ts") - col("__lead.ts_us")).as("span_us"))
      .unionByName(anon)
  }

  /** Verified entry (st30): 10-minute debounce of the event stream.
    * Sort is oracle-determinism only.
    */
  def st30(spark: SparkSession, dir: String): DataFrame =
    debounce(Tables.events(spark, dir), gapUs = 600L * 1000000L)
      .orderBy(col("user_id"), col("event_type"), col("ts_us"))
}
