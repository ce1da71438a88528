package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

class StreamingSpec extends GraftSpecBase {
  import spark.implicits._

  test("kafka reader carries the reference's option surface") {
    val r = streaming.Streams.kafkaReader(spark, "broker:9092", "topic.x", "earliest")
    // can't connect offline; assert the reader is constructed for the kafka source
    assert(r.toString != null)
  }

  test("decodeKafkaJson parses a kafka-shaped binary value column") {
    val schema = StructType(Seq(
      StructField("station_id", StringType), StructField("num_bikes_available", IntegerType)))
    val raw = Seq("""{"station_id": "s1", "num_bikes_available": 5}""".getBytes("UTF-8"))
      .toDF("value")
    val got = streaming.Streams.decodeKafkaJson(raw, schema).collect()
    assert(got.length == 1 && got(0).getString(0) == "s1" && got(0).getInt(1) == 5)
  }

  test("parquet append sink writes through a checkpointed stream") {
    val tmp = Files.createTempDirectory("graft_sink").toString
    val src = s"$sf/events.parquet"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(src).schema
    val stream = Tables.normalizeEventTs(
      streaming.Streams.fileStream(spark, sf, schema, globFilter = Some("events.parquet")))
    val q = streaming.Streams.parquetSink(
        stream.select(col("event_id"), col("event_type")), s"$tmp/out", s"$tmp/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.read.parquet(s"$tmp/out").count() == spark.read.parquet(src).count())
  }

  test("streaming sessionization emits closed sessions (gap split within batch)") {
    import streaming.Sessionize.Ev
    val us = 1000000L
    val events = Seq(
      Ev(1, 0 * us, 7, 1.0),
      Ev(2, 60 * us, 7, 2.0),                 // same session (1 min gap)
      Ev(3, 60 * 60 * us, 7, 4.0),            // new session after 1h gap
      Ev(4, 2 * 60 * 60 * us, 7, 8.0))        // another after 1h more
    val ds = events.toDS()
      .withColumn("event_time", timestamp_micros(col("ts_us")))
      .withWatermark("event_time", "0 seconds")
      .as[Ev]
    val out = streaming.Sessionize.sessionizeStream(ds, gapMinutes = 30)
    // batch Dataset path: flatMapGroupsWithState over a bounded input
    val rows = out.collect().sortBy(_.session_start_us)
    // last (open) session per key is retained in state, not emitted
    assert(rows.length == 2)
    assert(rows(0).n_events == 2 && rows(0).total_value == 3.0)
    assert(rows(1).n_events == 1 && rows(1).total_value == 4.0)
  }

  test("batch sessionization splits on gap and aggregates") {
    val r = streaming.Sessionize.st1(spark, sf)
    assert(r.count() > 0)
    val bad = r.filter(col("session_end_us") < col("session_start_us")).count()
    assert(bad == 0)
  }
}
