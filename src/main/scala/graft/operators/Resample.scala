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
}
