package graft

import org.apache.spark.sql.functions._

/** End-to-end replica of the reference pipeline on its own schema:
  * Kafka-shaped JSON frames → bronze decode → silver → gold.
  */
class StationPipelineSpec extends GraftSpecBase {
  import spark.implicits._

  private val t0 = 1700000000L // epoch seconds, aligned base

  private def kafkaFrame(jsons: Seq[String]) =
    jsons.map(_.getBytes("UTF-8")).toDF("value")

  test("full station pipeline: decode -> silver -> gold matches hand computation") {
    val raw = kafkaFrame(Seq(
      s"""{"station_id": "s1", "num_bikes_available": 3, "num_docks_available": 7, "is_installed": true, "is_renting": true, "is_returning": true, "last_reported": $t0}""",
      s"""{"station_id": "s1", "num_bikes_available": 3, "num_docks_available": 7, "is_installed": true, "is_renting": true, "is_returning": true, "last_reported": $t0}""", // dup
      s"""{"station_id": "s1", "num_bikes_available": 5, "num_docks_available": 5, "is_installed": true, "is_renting": true, "is_returning": true, "last_reported": ${t0 + 60}}""",
      s"""{"station_id": "s2", "num_bikes_available": 0, "num_docks_available": 0, "is_installed": false, "is_renting": false, "is_returning": false, "last_reported": $t0}"""))
    val bronze = streaming.Streams.decodeKafkaJson(raw, pipeline.StationStatus.schema)
    assert(bronze.count() == 4)

    val silver = pipeline.StationStatus.silver(bronze)
    assert(silver.count() == 3, "dedup on (station_id, last_reported)")
    val s1 = silver.filter(col("station_id") === "s1" && col("last_reported") === t0).head()
    assert(s1.getAs[Double]("pct_bikes_available") == 0.3)
    val s2 = silver.filter(col("station_id") === "s2").head()
    assert(s2.isNullAt(s2.fieldIndex("pct_bikes_available")), "0/(0+0) -> null")

    val gold = pipeline.StationStatus.gold(silver)
    val g1 = gold.filter(col("station_id") === "s1").head()
    assert(math.abs(g1.getAs[Double]("avg_pct_bikes_available") - 0.4) < 1e-12) // (0.3+0.5)/2
    assert(g1.getAs[Double]("avg_bikes") == 4.0)
    // both s1 reports fall in one 15-minute window
    assert(gold.filter(col("station_id") === "s1").count() == 1)
  }

  test("station pipeline runs identically through structured streaming") {
    val jsons = Seq(
      s"""{"station_id": "s1", "num_bikes_available": 2, "num_docks_available": 8, "is_installed": true, "is_renting": true, "is_returning": true, "last_reported": $t0}""",
      s"""{"station_id": "s1", "num_bikes_available": 4, "num_docks_available": 6, "is_installed": true, "is_renting": true, "is_returning": true, "last_reported": ${t0 + 60}}""")
    val tmp = java.nio.file.Files.createTempDirectory("graft_station").toString
    kafkaFrame(jsons).write.mode("overwrite").parquet(s"$tmp/feed")
    val stream = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.BinaryType))))
      .parquet(s"$tmp/feed")
    val gold = pipeline.StationStatus.gold(
      pipeline.StationStatus.silver(
        streaming.Streams.decodeKafkaJson(stream, pipeline.StationStatus.schema))
        .withWatermark("event_ts", "2 hours"))
    val got = streaming.Streams.runToMemory(gold).collect()
    assert(got.length == 1)
    assert(math.abs(got(0).getAs[Double]("avg_pct_bikes_available") - 0.3) < 1e-12)
  }
}
