package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Bounded-interval range join: pair each left row with the right
  * rows of the same key whose timestamp falls in
  * [left.ts, left.ts + width] (inclusive on both ends) — "purchases
  * within 30 minutes of a click", the funnel/attribution primitive.
  *
  * A naive `l.key = r.key AND r.ts BETWEEN l.ts AND l.ts + w` join
  * makes Catalyst pick a per-key cross product (every left row meets
  * every right row of that key). Instead both sides are bucketed to
  * the interval width: a right row at bucket b can only match left
  * rows in buckets {b, b-1}, so the right side is exploded to exactly
  * those two probe buckets and the join key becomes
  * (key, bucket) — equi-join, one shuffle, fan-out bounded at 2x,
  * with the exact range predicate applied after the bucket match.
  * Bucket population is bounded by time locality, not key cardinality,
  * so the shape survives hot keys and 100 TB alike.
  */
object RangeJoin {

  /** @param width  interval width in the ts column's unit (inclusive
    *               lower bound, inclusive upper: [ts, ts + width])
    */
  def rangeJoin(left: DataFrame, right: DataFrame, key: String,
                leftTs: String, rightTs: String, width: Long): DataFrame = {
    // integer `div`, not floor(double-division): at µs-epoch magnitudes
    // a double quotient can land a hair under the true integer and
    // floor into the wrong bucket
    val l = left.withColumn("__bucket", expr(s"$leftTs div ${width}L"))
    val r = right.withColumn("__bucket",
      explode(array(expr(s"$rightTs div ${width}L"), expr(s"$rightTs div ${width}L - 1"))))
    l.join(r, Seq(key, "__bucket"))
      .filter(col(rightTs) >= col(leftTs) && col(rightTs) <= col(leftTs) + width)
      .drop("__bucket")
  }

  /** Verified entry (st3): purchases by the same user within 30
    * minutes (inclusive) of a click.
    */
  def st3(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).withColumn("ts_us", unix_micros(col("ts")))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts_us").as("click_ts_us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts_us").as("purchase_ts_us"))
    rangeJoin(clicks, purchases, key = "user_id",
        leftTs = "click_ts_us", rightTs = "purchase_ts_us", width = 30L * 60 * 1000000)
      .select(col("click_id"), col("purchase_id"), col("user_id"),
        (col("purchase_ts_us") - col("click_ts_us")).as("gap_us"))
      .orderBy(col("click_id"), col("purchase_id"))
  }
}
