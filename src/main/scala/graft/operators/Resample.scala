package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Grid resampling with LOCF (last observation carried forward):
  * project each key's irregular observation series onto a fixed
  * time grid, every slot carrying the latest observation at or
  * before its end — the standard feature-engineering step that
  * turns event streams into fixed-frequency model inputs (and the
  * reference domain's "what was the station state at each tick"
  * question, reference spark_streaming_job.py's windowing cousin).
  *
  * Scale shape: three keyed shuffles, all on (key) or (key, slot) —
  * never a range partition or a cross join:
  *  1. latest-obs-per-slot = one row_number window on (key, slot);
  *  2. each key's grid spans ONLY its own [min, max] slot (a
  *     groupBy(key) + bounded `sequence` explode — fan-out =
  *     activity span / grid, not global-span × keys);
  *  3. the forward fill is a last-non-null window running up each
  *     key's slot order.
  * Per-key state is the activity span in slots — the same
  * per-key-bounded contract as st1/st5/st6. Keys with a single
  * observation still emit their full span; leading slots before the
  * first observation cannot exist by construction (the grid starts
  * at the first observed slot), so `filled_value` is never null.
  */
object Resample {

  /** @param tsCol   microsecond epoch column (total-orders with idCol)
    * @param idCol   tiebreak column for simultaneous observations
    * @param valCol  observation value carried forward
    * @param gridUs  grid width in microseconds
    */
  def locfResample(obs: DataFrame, keyCol: String, tsCol: String,
                   idCol: String, valCol: Column, gridUs: Long): DataFrame = {
    val slotted = obs
      .select(col(keyCol), col(tsCol), col(idCol), valCol.as("__v"))
      .withColumn("slot", floor(col(tsCol) / gridUs).cast("long"))
    val lastInSlot = Window.partitionBy(col(keyCol), col("slot"))
      .orderBy(col(tsCol).desc, col(idCol).desc)
    val latest = slotted
      .withColumn("__rn", row_number().over(lastInSlot))
      .filter(col("__rn") === 1)
      .select(col(keyCol), col("slot"), col("__v"))
    val grid = latest
      .groupBy(col(keyCol))
      .agg(min(col("slot")).as("__lo"), max(col("slot")).as("__hi"))
      .select(col(keyCol),
        explode(sequence(col("__lo"), col("__hi"))).as("slot"))
    val fill = Window.partitionBy(col(keyCol)).orderBy(col("slot"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .join(latest, Seq(keyCol, "slot"), "left")
      .withColumn("is_observed", col("__v").isNotNull)
      .withColumn("filled_value", last(col("__v"), ignoreNulls = true).over(fill))
      .select(col(keyCol), col("slot").as("grid_slot"),
        col("filled_value"), col("is_observed"))
  }

  /** Verified entry (st7): per-user daily LOCF of the event `value`
    * series (µs-truncated ts, event_id tiebreak — st6's total
    * order); determinism sort entry-only.
    */
  def st7(spark: SparkSession, dir: String): DataFrame =
    locfResample(
      Tables.events(spark, dir).withColumn("ts_us", unix_micros(col("ts"))),
      "user_id", "ts_us", "event_id", col("value"),
      gridUs = 86400L * 1000000L)
      .orderBy(col("user_id"), col("grid_slot"))

  /** Grid resampling by LINEAR interpolation — the other half of the
    * resampling pair (st7 carries the last value forward; this one
    * time-weights the two bracketing observations), the spelling a
    * continuous signal (sensor reading, account balance, battery
    * level) wants where LOCF introduces staircase bias.
    *
    * Semantics: for each grid boundary time τ = slot·grid inside the
    * key's observed span, value(τ) = v_prev + (v_next − v_prev) ·
    * (τ − t_prev)/(t_next − t_prev) over the nearest observations at
    * or before / strictly after τ. A τ that lands exactly on an
    * observation returns that observation (largest-`idCol` winner
    * among simultaneous observations — st7's tiebreak). All
    * arithmetic is integer-exact: values ride an e6 grid and the
    * time-weighting is ONE rounded integer division (half-away via
    * the `(2·|t|+den) div (2·den)` spelling on decimal(38,0), sign
    * restored after — so a value drop interpolates identically to a
    * rise on both engines, with no FP summation or div-semantics
    * drift; Spark `div` truncates, DuckDB `//` floors, which agree
    * on the non-negative operands this construction guarantees).
    *
    * Scale shape: two keyed shuffles — the span agg (map-combined)
    * whose bounded `sequence` explode emits each key's own grid, and
    * ONE sort of (observations ∪ grid rows) per key over which BOTH
    * bracketing windows run (same partitioning + ordering → Spark
    * plans a single Exchange + Sort, two Window ops, no second
    * shuffle). Per-key state is activity-span/grid — the same
    * bounded contract as st7; the corpus is never range-partitioned
    * and never self-joined.
    */
  def linearResample(obs: DataFrame, keyCol: String, tsCol: String,
                     idCol: String, valE6: Column, gridUs: Long): DataFrame = {
    val o = obs.select(col(keyCol), col(tsCol).cast("long").as("__ts"),
      col(idCol).cast("long").as("__id"), valE6.cast("long").as("__v"))
    val grid = o.groupBy(col(keyCol))
      .agg(min(col("__ts")).as("__mn"), max(col("__ts")).as("__mx"))
      .select(col(keyCol),
        expr(s"(__mn + ${gridUs - 1}L) div ${gridUs}L").as("__lo"),
        expr(s"__mx div ${gridUs}L").as("__hi"))
      .filter(col("__lo") <= col("__hi"))
      .select(col(keyCol), explode(sequence(col("__lo"), col("__hi"))).as("grid_slot"))
      .select(col(keyCol), (col("grid_slot") * gridUs).as("__ts"),
        lit(1).as("__isGrid"), lit(0L).as("__id"),
        lit(null).cast("long").as("__v"), lit(null).cast("long").as("__ots"),
        col("grid_slot"))
    val tagged = o
      .select(col(keyCol), col("__ts"), lit(0).as("__isGrid"), col("__id"),
        col("__v"), col("__ts").as("__ots"), lit(null).cast("long").as("grid_slot"))
      .unionByName(grid)
    // Equal-τ observations sort BEFORE the grid row (__isGrid asc),
    // so prev sees them and next never does: an exact hit makes
    // num = 0 (prev path), never den = 0 ambiguity.
    val ord = Seq(col("__ts"), col("__isGrid"), col("__id"))
    val wPrev = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    tagged
      .withColumn("__pv", last(col("__v"), ignoreNulls = true).over(wPrev))
      .withColumn("__pts", last(col("__ots"), ignoreNulls = true).over(wPrev))
      .withColumn("__nv", first(col("__v"), ignoreNulls = true).over(wNext))
      .withColumn("__nts", first(col("__ots"), ignoreNulls = true).over(wNext))
      .filter(col("__isGrid") === 1)
      .select(col(keyCol), col("grid_slot"),
        expr("""cast(case
          | when __nts is null or __nts = __pts then __pv
          | else __pv + cast(sign(__nv - __pv) as bigint) *
          |   cast((2 * abs(cast(__nv - __pv as decimal(38,0)) * (__ts - __pts))
          |         + (__nts - __pts)) div (2 * (__nts - __pts)) as bigint)
          | end as bigint)""".stripMargin.replace("\n", " ")).as("interp_e6"),
        expr("case when __nts is null then null else __nts - __pts end")
          .cast("long").as("bracket_us"))
  }

  /** Verified entry (st28): per-user daily linear interpolation of
    * the event `value` series on the e6 integer grid; the companion
    * report to st7 on the identical grid/span/tiebreak contract.
    */
  def st28(spark: SparkSession, dir: String): DataFrame =
    linearResample(
      Tables.events(spark, dir).withColumn("ts_us", unix_micros(col("ts"))),
      "user_id", "ts_us", "event_id",
      expr("cast(round(value * 1000000) as bigint)"),
      gridUs = 86400L * 1000000L)
      .orderBy(col("user_id"), col("grid_slot"))
}
