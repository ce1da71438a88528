package graft

import org.apache.spark.sql.functions._

/** Round-trips the reference's gold JDBC sink path
  * (spark_streaming_job.py:127-137) against an embedded Derby
  * database (ships with Spark) — the writer and the partitioned
  * parallel reader exercise the REAL jdbc format code path, not just
  * the option surface.
  */
class JdbcSpec extends GraftSpecBase {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private val driver = "org.apache.derby.jdbc.EmbeddedDriver"

  test("jdbc gold sink round-trips through an embedded database") {
    val gold = Seq(
      (1L, "click", 0.25, 10L),
      (2L, "view", 0.50, 20L),
      (3L, "purchase", 0.75, 30L))
      .toDF("window_id", "event_type", "avg_pct", "n_events")

    streaming.Streams.jdbcBatchWriter(
      url, "gold_windows", user = "", password = "", driver = driver)(gold, 0L)

    val back = sources.Sources.readJdbc(spark, url, "gold_windows",
      partitionColumn = "window_id", lowerBound = 1L, upperBound = 4L,
      numPartitions = 2, user = "", password = "")
    assert(back.rdd.getNumPartitions == 2, "reader must split into jdbc partitions")
    val rows = back.orderBy(col("window_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    assert(rows.toSeq == Seq(
      (1L, "click", 0.25, 10L),
      (2L, "view", 0.50, 20L),
      (3L, "purchase", 0.75, 30L)))

    // append lands in the same table (the streaming foreachBatch shape)
    streaming.Streams.jdbcBatchWriter(
      url, "gold_windows", user = "", password = "", driver = driver)(
      Seq((4L, "click", 0.9, 5L)).toDF("window_id", "event_type", "avg_pct", "n_events"), 1L)
    assert(spark.read.format("jdbc")
      .option("url", url).option("dbtable", "gold_windows").option("driver", driver)
      .load().count() == 4)
  }
}
