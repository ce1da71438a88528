package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Interval×interval OVERLAP join: pair rows of the same key whose
  * time intervals intersect — sessions overlapping incident windows,
  * ad exposures overlapping attribution windows. The two-sided
  * cousin of [[RangeJoin]] (which matches a point into an interval).
  *
  * A naive `l.key = r.key AND l.start <= r.end AND r.start <= l.end`
  * join is again a per-key cross product. Here BOTH sides explode to
  * every width-W bucket their interval touches and the join key
  * becomes (key, bucket). Overlapping intervals share at least one
  * bucket — and possibly many, so instead of a dedup shuffle each
  * pair is attributed to exactly ONE meeting bucket: b* =
  * max(floor(l.start/W), floor(r.start/W)). If the intervals overlap
  * then max(l.start, r.start) lies inside both, so bucket b* is
  * exploded by both sides, and the `__bucket = b*` post-filter keeps
  * that single copy — equi-join, one shuffle, zero dedup.
  * Fan-out per row is ceil(len/W)+1 buckets: bounded by interval
  * length over width, independent of key cardinality — hot keys and
  * 100 TB change the bucket POPULATION, never the join shape.
  */
object IntervalJoin {

  /** @param width bucket width in the interval columns' unit; pick
    *              ≈ the typical interval length so fan-out stays ≤2-3
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   leftStart: String, leftEnd: String,
                   rightStart: String, rightEnd: String, width: Long): DataFrame = {
    // integer `div`, not floor(double-division) — see RangeJoin
    val l = left.withColumn("__bucket",
      explode(expr(s"sequence($leftStart div ${width}L, $leftEnd div ${width}L)")))
    val r = right.withColumn("__bucket",
      explode(expr(s"sequence($rightStart div ${width}L, $rightEnd div ${width}L)")))
    l.join(r, Seq(key, "__bucket"))
      .filter(col(rightStart) <= col(leftEnd) && col(leftStart) <= col(rightEnd))
      .filter(col("__bucket") ===
        greatest(expr(s"$leftStart div ${width}L"), expr(s"$rightStart div ${width}L")))
      .drop("__bucket")
  }

  /** Verified entry (st4): which 30-minute click windows overlap a
    * ±10-minute error window for the same user — the "was this
    * journey near an incident" primitive.
    */
  def st4(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).withColumn("ts_us", unix_micros(col("ts")))
    val halfHour = 30L * 60 * 1000000
    val tenMin = 10L * 60 * 1000000
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts_us").as("c_start_us"), (col("ts_us") + halfHour).as("c_end_us"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("user_id"),
        (col("ts_us") - tenMin).as("e_start_us"), (col("ts_us") + tenMin).as("e_end_us"))
    intervalJoin(clicks, errors, key = "user_id",
        leftStart = "c_start_us", leftEnd = "c_end_us",
        rightStart = "e_start_us", rightEnd = "e_end_us", width = halfHour)
      .select(col("click_id"), col("error_id"), col("user_id"),
        greatest(col("c_start_us"), col("e_start_us")).as("overlap_start_us"),
        least(col("c_end_us"), col("e_end_us")).as("overlap_end_us"))
      .orderBy(col("click_id"), col("error_id"))
  }
}
