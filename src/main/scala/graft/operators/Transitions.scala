package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Event-type transition matrix — the first-order Markov view of the
  * event stream: for each ordered pair of consecutive events by the
  * same user, count the (from_type → to_type) transition and report
  * each source type's outgoing transition probabilities. The
  * product-analytics "where do users go next" query, and the input
  * to Markov-chain session models.
  *
  * Scale shape: consecutive pairs come from a single `lead` window
  * over (user_id) ordered by the provably-total (ts_us, event_id)
  * key — one shuffle carrying only the three needed columns, the
  * same per-key-bounded history assumption st1/st5 document. The
  * pair counting then shuffles the (from, to) pairs, whose key space
  * is |event types|², not rows; probabilities are a window over that
  * tiny matrix, never the fact table. Total: two data shuffles, both
  * on bounded keys, map-side partial aggregation on the second.
  *
  * The ordering key is microsecond-truncated ts (Tables.events
  * normalizes parquet ns → µs exactly as DuckDB's read truncates),
  * with event_id breaking ties, so the lead partner of every row is
  * engine-portable.
  */
object Transitions {

  /** Per-(from_type, to_type) transition counts and probabilities.
    * `tsCol` must order totally together with `idCol` (any orderable
    * type; the entry passes µs-truncated epoch longs).
    */
  def transitionMatrix(events: DataFrame, userCol: String, tsCol: String,
                       idCol: String, typeCol: String): DataFrame = {
    val order = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
    val pairs = events
      .select(col(userCol), col(tsCol), col(idCol), col(typeCol))
      .withColumn("to_type", lead(col(typeCol), 1).over(order))
      .filter(col("to_type").isNotNull)
    val matrix = pairs
      .groupBy(col(typeCol).as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val perFrom = Window.partitionBy(col("from_type"))
    matrix
      .withColumn("prob",
        round(col("n").cast("double") / sum(col("n")).over(perFrom), 6))
      .orderBy(col("from_type"), col("to_type"))
  }

  /** Verified entry (SURVEY §2 st6): transitions over `events`. */
  def st6(spark: SparkSession, dir: String): DataFrame =
    transitionMatrix(
      Tables.events(spark, dir).withColumn("ts_us", unix_micros(col("ts"))),
      "user_id", "ts_us", "event_id", "event_type")
}
