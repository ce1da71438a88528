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

  test("kafka source canary: live load() the day the connector jar appears (auto-skips offline)") {
    // /opt/spark/jars ships no spark-sql-kafka connector today, so
    // load() fails at SOURCE LOOKUP (no broker contact involved —
    // source creation is lazy, so with the jar present load()
    // succeeds offline too). The canary cancels with a clear message
    // now, and the day the environment gains the jar this test starts
    // asserting the Kafka schema with zero code change.
    val loaded =
      try Right(streaming.Streams.kafkaReader(spark, "localhost:9092", "graft_canary").load())
      catch { case e: Throwable => Left(e) }
    loaded match {
      case Left(e) =>
        val chain = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
          .map(x => Option(x.getMessage).getOrElse(x.getClass.getName)).mkString(" <- ")
        assume(false,
          s"spark-sql-kafka connector absent from the classpath (expected offline): $chain")
      case Right(df) =>
        val fields = df.schema.fieldNames.toSet
        assert(Set("key", "value", "topic", "partition", "offset", "timestamp")
          .subsetOf(fields), s"kafka source schema incomplete: $fields")
    }
  }

  test("decodeKafkaJson parses a kafka-shaped binary value column") {
    val schema = StructType(Seq(
      StructField("station_id", StringType), StructField("num_bikes_available", IntegerType)))
    val raw = Seq("""{"station_id": "s1", "num_bikes_available": 5}""".getBytes("UTF-8"))
      .toDF("value")
    val got = streaming.Streams.decodeKafkaJson(raw, schema).collect()
    assert(got.length == 1 && got(0).getString(0) == "s1" && got(0).getInt(1) == 5)
  }

  test("kafka-shaped messages flow through decodeKafkaJson to silver in a real micro-batch") {
    // The spark-sql-kafka connector jar is absent offline, so the
    // broker itself can't run here — instead a MemoryStream emits
    // frames with the EXACT Kafka source schema (binary key/value +
    // topic/partition/offset/timestamp) and the reference's station
    // JSON payload, and the full decode→silver chain executes as a
    // genuine streaming micro-batch, then must match the batch path
    // bit-for-bit. Duplicate records are byte-identical so the dedup
    // winner is order-independent across the two execution modes.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val jsons = (0 until 120).map { i =>
      val st = i % 10; val rep = 1700000000L + (i / 20) * 60
      s"""{"station_id": "s$st", "num_bikes_available": ${st % 7},""" +
        s""" "num_ebikes_available": ${(i / 20) % 3}, "num_docks_available": ${10 - st % 7},""" +
        s""" "is_installed": true, "is_renting": ${st % 2 == 0},""" +
        s""" "is_returning": true, "last_reported": $rep}"""
    }
    def kafkaShape(df: org.apache.spark.sql.DataFrame) = df.select(
      lit(null).cast("binary").as("key"),
      encode(col("value"), "UTF-8").as("value"),
      lit("station_status").as("topic"),
      lit(0).as("partition"),
      lit(0L).as("offset"),
      lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")).as("timestamp"))
    def toSilver(kafka: org.apache.spark.sql.DataFrame) =
      pipeline.StationStatus.silver(
        streaming.Streams.decodeKafkaJson(kafka, pipeline.StationStatus.schema))
    val mem = MemoryStream[String]
    mem.addData(jsons: _*)
    val streamed = streaming.Streams.runToMemory(
      toSilver(kafkaShape(mem.toDF())), outputMode = "append")
    val batch = toSilver(kafkaShape(jsons.toDF("value")))
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select(col("station_id"), col("last_reported"), col("num_bikes_available"),
        col("pct_bikes_available"), col("event_ts").cast("long"))
        .collect().map(_.toSeq).toSet
    assert(streamed.count() == 60, "10 stations x 6 report times, duplicates dropped")
    assert(key(streamed) == key(batch), "stream and batch silver must agree exactly")
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

  test("runToMemory state-partition override never leaks into the caller's session") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val key = "spark.sql.shuffle.partitions"
    val before = spark.conf.get(key)
    // watcher thread snapshots the caller-session conf WHILE the
    // stateful query runs — the old set/restore implementation was
    // only safe serially; this pins per-query isolation
    @volatile var running = true
    val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val watcher = new Thread(() => while (running) { seen.add(spark.conf.get(key)); Thread.sleep(1) })
    watcher.start()
    try {
      val mem = MemoryStream[(Long, Double)]
      mem.addData((1 until 100).map(i => (i.toLong % 5, i.toDouble)): _*)
      val agg = mem.toDF().toDF("k", "v").groupBy(col("k")).agg(sum(col("v")).as("s"))
      val out = streaming.Streams.runToMemory(agg, statePartitions = Some(2))
      assert(out.count() == 5)
      assert(out.sparkSession ne spark, "override must run on a cloned session")
      assert(out.sparkSession.conf.get(key) == "2", "clone must carry the override")
    } finally { running = false; watcher.join() }
    assert(seen.size == 1 && seen.contains(before),
      s"caller session must only ever see $before, saw $seen")
    assert(spark.conf.get(key) == before)
  }

  test("quarantine routing runs unchanged on a stream (micro-batch equals batch verdicts)") {
    // rowQuarantine is a narrow projection+filter, so the SAME
    // function is the streaming dead-letter route — no stateful twin
    // needed. Prove it end-to-end through a real micro-batch.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = Seq(
      (1L, java.lang.Long.valueOf(7L), "view", 10.0, """{"k":1}"""),   // clean
      (2L, null.asInstanceOf[java.lang.Long], "view", 10.0, """{"k":1}"""), // null_user
      (3L, java.lang.Long.valueOf(8L), "teleport", 10.0, """{"k":1}"""),    // unknown_type
      (4L, java.lang.Long.valueOf(9L), "click", 9999.0, """{"k":1}"""))     // value_out_of_range
    val mem = MemoryStream[(Long, java.lang.Long, String, Double, String)]
    mem.addData(rows: _*)
    val streamed = quality.Checks.rowQuarantine(
      mem.toDF().toDF("event_id", "user_id", "event_type", "value", "props"),
      Seq("view", "click"), 400.0)
    val out = streaming.Streams.runToMemory(streamed, outputMode = "append")
    import org.apache.spark.sql.types._
    val inputSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("event_type", StringType), StructField("value", DoubleType),
      StructField("props", StringType)))
    val batch = quality.Checks.rowQuarantine(
      spark.createDataFrame(spark.sparkContext.parallelize(rows.map(r =>
        org.apache.spark.sql.Row(r._1, r._2, r._3, r._4, r._5))), inputSchema),
      Seq("view", "click"), 400.0)
    val s = out.collect().map(r => (r.getLong(0), r.getString(4))).toSet
    val b = batch.collect().map(r => (r.getLong(0), r.getString(4))).toSet
    assert(s == b, s"stream: $s vs batch: $b")
    assert(s.map(_._1) == Set(2L, 3L, 4L), "exactly the three dirty rows route out")
  }

  test("batch sessionization splits on gap and aggregates") {
    val r = streaming.Sessionize.st1(spark, sf)
    assert(r.count() > 0)
    val bad = r.filter(col("session_end_us") < col("session_start_us")).count()
    assert(bad == 0)
  }

  test("streaming funnel twin equals batch st5 on the real event log (cross-batch state)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import streaming.StatefulTwins.{FunnelEv, FunnelOut}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("event_type"))
      .as[FunnelEv].collect()
    // two micro-batches split at the median timestamp: every key's
    // batch-1 events precede its batch-2 events (the cross-batch
    // ordering contract); order WITHIN each batch is scrambled to
    // prove the in-batch sort repairs it
    val cut = evs.map(_.ts_us).sorted.apply(evs.length / 2)
    val (b1, b2) = evs.partition(_.ts_us < cut)
    val mem = MemoryStream[FunnelEv]
    val q = streaming.StatefulTwins.funnelStream(mem.toDS(), ("view", "click", "purchase"))
      .writeStream.format("memory").queryName("funnel_twin").outputMode("update").start()
    try {
      mem.addData(scala.util.Random.shuffle(b1.toSeq): _*); q.processAllAvailable()
      mem.addData(scala.util.Random.shuffle(b2.toSeq): _*); q.processAllAvailable()
    } finally q.stop()
    // update-mode upsert: MemorySink returns batches in order, so the
    // last row per key is the key's final funnel state
    val finalByUser = scala.collection.mutable.LinkedHashMap[Long, FunnelOut]()
    spark.table("funnel_twin").as[FunnelOut].collect().foreach(r => finalByUser(r.user_id) = r)
    val streamed = finalByUser.values
      .map(r => (r.user_id, r.step1_ts_us, r.step2_ts_us, r.step3_ts_us, r.reached)).toSet
    val batch = operators.Funnel.st5(spark, sf).collect().map(r =>
      (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getInt(4))).toSet
    assert(streamed == batch,
      s"stream-only: ${(streamed -- batch).take(3)}; batch-only: ${(batch -- streamed).take(3)}")
  }

  test("streaming transition pairs equal the batch lead-window pairs (seam pairs included)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import streaming.StatefulTwins.{TransEv, TransPair}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("event_type"))
      .as[TransEv].collect()
    val cut = evs.map(_.ts_us).sorted.apply(evs.length / 2)
    val (b1, b2) = evs.partition(_.ts_us < cut)
    val mem = MemoryStream[TransEv]
    val q = streaming.StatefulTwins.transitionPairsStream(mem.toDS())
      .writeStream.format("memory").queryName("trans_twin").outputMode("append").start()
    try {
      mem.addData(scala.util.Random.shuffle(b1.toSeq): _*); q.processAllAvailable()
      mem.addData(scala.util.Random.shuffle(b2.toSeq): _*); q.processAllAvailable()
    } finally q.stop()
    def multiset(ps: Seq[(Long, String, String)]) = ps.groupBy(identity).view.mapValues(_.size).toMap
    val streamed = multiset(spark.table("trans_twin").as[TransPair].collect()
      .map(p => (p.user_id, p.from_type, p.to_type)).toSeq)
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val batch = multiset(Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("event_type"))
      .withColumn("to_type", lead(col("event_type"), 1).over(byUser))
      .filter(col("to_type").isNotNull)
      .collect().map(r => (r.getLong(0), r.getString(3), r.getString(4))).toSeq)
    assert(streamed == batch, s"pair multisets diverge: ${streamed.size} vs ${batch.size} distinct")
    // and the aggregated matrix therefore matches st6's (from,to,n) rows
    val streamMatrix = streamed.groupBy { case ((_, f, t), _) => (f, t) }
      .view.mapValues(_.values.sum).toMap
    val st6Matrix = operators.Transitions.st6(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2).toInt).toMap
    assert(streamMatrix == st6Matrix)
  }

  test("streaming exact dedup verdicts equal batch d1 keep-min-id groups") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import streaming.StatefulTwins.{DocEv, DedupVerdict}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), md5(col("text")).as("content_hash"))
      .as[DocEv].collect()
    // split by id (ingest order — the arrival contract), scramble
    // within each batch to prove the in-batch sort repairs it
    val cut = docs.map(_.doc_id).sorted.apply(docs.length / 2)
    val (b1, b2) = docs.partition(_.doc_id < cut)
    val mem = MemoryStream[DocEv]
    val q = streaming.StatefulTwins.exactDedupStream(mem.toDS())
      .writeStream.format("memory").queryName("dedup_twin").outputMode("append").start()
    try {
      mem.addData(scala.util.Random.shuffle(b1.toSeq): _*); q.processAllAvailable()
      mem.addData(scala.util.Random.shuffle(b2.toSeq): _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("dedup_twin").as[DedupVerdict].collect()
    assert(streamed.length == docs.length, "exactly one verdict per arriving doc")
    val streamKeep = streamed.map(v => v.content_hash -> v.keep_id).toMap
    val batch = dedup.Dedup.exactDedup(Tables.documents(spark, sf)).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(streamKeep == batch.view.mapValues(_._1).toMap,
      "every hash's streaming keeper must be the batch min doc_id")
    // dup counts agree too: n_copies - 1 dup verdicts per hash
    val dupCounts = streamed.filter(_.is_dup).groupBy(_.content_hash).view.mapValues(_.size.toLong).toMap
    assert(batch.forall { case (h, (_, n)) => dupCounts.getOrElse(h, 0L) == n - 1 })
    // a cross-batch duplicate is flagged against batch-1's keeper
    assert(streamed.forall(v => v.is_dup == (v.doc_id != v.keep_id)))
  }

  test("streaming disorder audit equals batch st10 on the real event log (cross-batch max)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import streaming.StatefulTwins.{DisEv, DisOut}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"))
      .as[DisEv].collect()
    // split by event_id (arrival order — the contract), scramble
    // within each batch to prove the in-batch sort repairs it
    val cut = evs.map(_.event_id).sorted.apply(evs.length / 2)
    val (b1, b2) = evs.partition(_.event_id < cut)
    val mem = MemoryStream[DisEv]
    val q = streaming.StatefulTwins.disorderAuditStream(mem.toDS())
      .writeStream.format("memory").queryName("disorder_twin").outputMode("update").start()
    try {
      mem.addData(scala.util.Random.shuffle(b1.toSeq): _*); q.processAllAvailable()
      mem.addData(scala.util.Random.shuffle(b2.toSeq): _*); q.processAllAvailable()
    } finally q.stop()
    // Update mode re-emits a key's row each batch it appears in —
    // the LAST emission per key is its final audit
    val streamed = spark.table("disorder_twin").as[DisOut].collect()
      .zipWithIndex.groupBy(_._1.user_id)
      .map { case (u, rows) => u -> rows.maxBy(_._2)._1 }
    val batch = operators.Activity.disorderAudit(Tables.events(spark, sf)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(streamed.size == batch.size)
    batch.foreach { case (u, (n, late, maxLate)) =>
      val s = streamed(u)
      assert((s.n_events, s.n_late, s.max_late_us) == ((n, late, maxLate)),
        s"user $u: stream ${s} != batch ${(n, late, maxLate)}")
    }
  }

  test("streaming daily DQ counts equal batch p21 over a two-batch ingest") {
    // p21's gate run ON the stream: the same day-grain counts via a
    // watermarked 1-day window agg (exact-distinct replaced by the
    // stream-safe dropDuplicates-within-watermark spelling: ids are
    // deduped before the count, so dup_event_id = 0 by construction
    // and the remaining counts must equal batch p21's)
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val evs = Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("value"))
      .as[(Long, Long, Option[Long], Double)].collect()
    val (b1, b2) = evs.splitAt(evs.length / 2)
    val mem = MemoryStream[(Long, Long, Option[Long], Double)]
    val counts = mem.toDF().toDF("event_id", "ts_us", "user_id", "value")
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", "48 hours")
      .dropDuplicates("event_id")
      .groupBy(window(col("ts"), "1 day"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("user_id").isNull, 1L).otherwise(0L)).as("n_null_user"),
        (round(sum(col("value")), 2) / count(lit(1))).as("avg_value"))
      .select(col("window.start").cast("date").as("day"), col("n_rows"),
        col("n_null_user"), col("avg_value"))
    val q = counts.writeStream.format("memory").queryName("dq_twin")
      .outputMode("update").start()
    try {
      mem.addData(scala.util.Random.shuffle(b1.toSeq): _*); q.processAllAvailable()
      mem.addData(scala.util.Random.shuffle(b2.toSeq): _*); q.processAllAvailable()
    } finally q.stop()
    // update mode re-emits a day's row each batch it changes in —
    // keep the LAST emission per day (the disorder-twin idiom)
    val fin = spark.table("dq_twin").collect().zipWithIndex
      .groupBy(_._1.getDate(0))
      .map { case (d, rows) =>
        val r = rows.maxBy(_._2)._1
        d -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))
      }
    val batch = quality.Checks.dqDaily(Tables.events(spark, sf)).collect()
      .map(r => r.getDate(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(4)))).toMap
    assert(fin.size == batch.size, s"${fin.size} stream days vs ${batch.size} batch")
    batch.foreach { case (d, b) =>
      assert(fin(d) == b, s"day $d: stream ${fin(d)} != batch $b")
    }
  }

  test("streaming streaks equal batch st19 across a scrambled two-batch ingest") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import streaming.StatefulTwins.{StreakEv, StreakOut}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val evs = Tables.events(spark, sf)
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), unix_date(to_date(col("ts"))).as("day"))
      .as[StreakEv].collect()
    val (b1, b2) = evs.splitAt(evs.length / 2)
    val mem = MemoryStream[StreakEv]
    val q = streaming.StatefulTwins.streaksStream(mem.toDS())
      .writeStream.format("memory").queryName("streak_twin")
      .outputMode("update").start()
    try {
      mem.addData(scala.util.Random.shuffle(b1.toSeq): _*); q.processAllAvailable()
      mem.addData(scala.util.Random.shuffle(b2.toSeq): _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("streak_twin").as[StreakOut].collect()
      .zipWithIndex.groupBy(_._1.user_id)
      .map { case (u, rows) => u -> rows.maxBy(_._2)._1 }
    val batch = operators.Activity.activityStreaks(Tables.events(spark, sf))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(streamed.size == batch.size)
    batch.foreach { case (u, b) =>
      val s = streamed(u)
      assert((s.active_days, s.n_streaks, s.longest_streak) == b,
        s"user $u: stream $s != batch $b")
    }
  }

  test("streaming hourly item counts equal st14's frame; trending cut over final state matches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val evs = Tables.events(spark, sf)
      .select(unix_micros(col("ts")).as("ts_us"),
        get_json_object(col("props"), "$.k").cast("int").as("item"))
      .filter(col("item").isNotNull)
      .as[(Long, Int)].collect()
    val cut = evs.map(_._1).sorted.apply(evs.length / 2)
    val (b1, b2) = evs.partition(_._1 < cut)
    val mem = MemoryStream[(Long, Int)]
    val counts = streaming.Streams.trendingCounts(
      mem.toDF().toDF("ts_us", "item")
        .withColumn("ts", timestamp_micros(col("ts_us"))))
    mem.addData(scala.util.Random.shuffle(b1.toSeq): _*)
    mem.addData(scala.util.Random.shuffle(b2.toSeq): _*)
    // library path: update-mode re-emissions compact through the
    // keyed-upsert sink; the trending cut is the SAME batch code the
    // verified entry runs, over the sink's state
    val state = streaming.Streams.runUpsertToMemory(
      counts, Seq("hour_ts", "item"), statePartitions = Some(4))
    val streamedTop = operators.Activity.trendingCut(state, 3).collect()
      .map(r => (r.getTimestamp(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    val batchTop = operators.Activity.st14(spark, sf).collect()
      .map(r => (r.getTimestamp(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamedTop == batchTop,
      s"stream-only: ${(streamedTop -- batchTop).take(3)}; batch-only: ${(batchTop -- streamedTop).take(3)}")
  }

  test("memory-sink state valve: an over-grain stream fails named, the bounded path is untouched") {
    // VERDICT r12 item 6: the boundedness contract of the test sinks
    // (state == the aggregate's key grain) used to live only in
    // comments — a misuse on an unaggregated stream OOMed the driver.
    // The valve pre-counts each micro-batch and fails NAMED.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Double)]
    // an UNAGGREGATED per-event stream: every event is its own key,
    // so state grows with the event count — exactly the misuse class
    val wide = mem.toDF().toDF("event_id", "value")
      .groupBy(col("event_id")).agg(sum(col("value")).as("v"))
    mem.addData((1L to 50L).map(i => (i, 1.0)): _*)
    val ex = intercept[Exception] {
      streaming.Streams.runUpsertToMemory(wide, Seq("event_id"),
        statePartitions = Some(2), maxStateRows = 10)
    }
    def rootMessage(t: Throwable): String = {
      var c: Throwable = t
      while (c.getCause != null && c.getCause != c) c = c.getCause
      String.valueOf(c.getMessage)
    }
    assert(rootMessage(ex).contains("memory-sink state would exceed 10 rows"),
      s"misuse must fail the NAMED valve, got: ${rootMessage(ex)}")
    // the same stream under the default valve (grain 50 << 1<<20)
    // compacts normally — the valve never taxes the contract path
    val mem2 = MemoryStream[(Long, Double)]
    val ok = mem2.toDF().toDF("event_id", "value")
      .groupBy(col("event_id")).agg(sum(col("value")).as("v"))
    mem2.addData((1L to 50L).map(i => (i, 1.0)): _*)
    val state = streaming.Streams.runUpsertToMemory(ok, Seq("event_id"),
      statePartitions = Some(2))
    assert(state.count() == 50L)
  }

  test("streaming concurrency delta-nets: peak report over compacted state equals batch st24") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val evs = Tables.events(spark, sf)
      .select(unix_micros(col("ts")).as("ts_us")).as[Long].collect()
    val cut = evs.sorted.apply(evs.length / 2)
    val (b1, b2) = evs.partition(_ < cut)
    val mem = MemoryStream[Long]
    val nets = streaming.Streams.concurrencyDeltaNets(
      mem.toDF().toDF("ts_us")
        .withColumn("ts", timestamp_micros(col("ts_us"))))
    mem.addData(scala.util.Random.shuffle(b1.toSeq): _*)
    mem.addData(scala.util.Random.shuffle(b2.toSeq): _*)
    // update-mode re-emissions compact on (hour_ts, us); the peak
    // report is the SAME finishing code the batch entry runs
    val state = streaming.Streams.runUpsertToMemory(
      nets, Seq("hour_ts", "us"), statePartitions = Some(4))
    val stateNets = state.withColumn("day", to_date(col("hour_ts")))
      .withColumn("hr", hour(col("hour_ts")))
    val streamed = operators.Intervals.peakFromNets(stateNets)
      .collect().map(r => (r.getDate(0), r.getLong(1), r.getLong(2))).toSet
    val batch = operators.Intervals.st24(spark, sf)
      .collect().map(r => (r.getDate(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch,
      s"stream-only: ${(streamed -- batch).take(3)}; batch-only: ${(batch -- streamed).take(3)}")
    // one state table, two reports: the SAME compacted state must
    // also reproduce batch st27's duration histogram exactly
    val streamedHist = operators.Intervals.histogramFromNets(stateNets)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batchHist = operators.Intervals.st27(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamedHist == batchHist,
      s"hist stream-only: ${(streamedHist -- batchHist).take(3)}; " +
        s"batch-only: ${(batchHist -- streamedHist).take(3)}")
  }

  test("streaming day-sketch rolling actives: wau_est equals batch sketch exactly, 5% of exact") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val evs = Tables.events(spark, sf)
      .filter(col("user_id").isNotNull)
      .select(unix_micros(col("ts")).as("ts_us"), col("user_id"))
      .as[(Long, Long)].collect()
    val cut = evs.map(_._1).sorted.apply(evs.length / 2)
    val (b1, b2) = evs.partition(_._1 < cut)
    val mem = MemoryStream[(Long, Long)]
    val daySketches = streaming.Streams.dailySketchStream(
      mem.toDF().toDF("ts_us", "user_id")
        .withColumn("ts", timestamp_micros(col("ts_us"))))
    mem.addData(scala.util.Random.shuffle(b1.toSeq): _*)
    mem.addData(scala.util.Random.shuffle(b2.toSeq): _*)
    // per-day HLL state merges across the two scrambled batches; the
    // compacted sink table is the persisted day-sketch table the
    // batch rolling stage consumes unchanged
    val state = streaming.Streams.runUpsertToMemory(
      daySketches, Seq("day"), statePartitions = Some(4))
    val rolled = operators.Activity.rollingWauFromSketches(state, 7).collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    // HLL state is a per-bucket max — batch-boundary-invariant, so
    // the streamed union estimate equals the batch sketch path's
    // estimate EXACTLY, not just within tolerance
    val batchSketch = operators.Activity.rollingActiveSketch(
        Tables.events(spark, sf), "user_id", "ts").collect()
      .map(r => r.getDate(0).toString -> r.getLong(2)).toMap
    assert(rolled == batchSketch,
      s"streamed day-sketch roll must equal the batch sketch roll: " +
        s"stream-only ${(rolled.toSet -- batchSketch.toSet).take(3)}, " +
        s"batch-only ${(batchSketch.toSet -- rolled.toSet).take(3)}")
    // and the st8b tolerance vs the EXACT batch path holds end-to-end
    val exact = operators.Activity.st8(spark, sf).collect()
      .map(r => r.getDate(0).toString -> r.getLong(2)).toMap
    assert(rolled.keySet == exact.keySet, "active-day sets must agree")
    rolled.foreach { case (d, est) =>
      val w = exact(d).toDouble
      assert(math.abs(est.toDouble - w) <= math.max(1.0, w * 0.05),
        s"day $d: wau_est $est vs exact $w exceeds 5%")
    }
  }

  test("incremental gold merge twin: FULLY SHUFFLED micro-batches yield the exact batch view") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val silver = pipeline.Medallion.silverEvents(Tables.events(spark, sf))
      .select(unix_micros(col("ts")).as("ts_us"), col("event_type"), col("value"))
    val rows = silver.as[(Long, String, Double)].collect()
    // the merge is commutative+associative, so unlike every other
    // twin there is NO cross-batch ordering contract to honor —
    // shuffle the WHOLE log and split arbitrarily
    val shuffled = scala.util.Random.shuffle(rows.toSeq)
    val chunks = shuffled.grouped(math.max(1, shuffled.size / 3 + 1)).toSeq
    val mem = MemoryStream[(Long, String, Double)]
    chunks.foreach(c => mem.addData(c: _*))
    val streamed = streaming.Streams.runGoldMergeToMemory(
      mem.toDF().toDF("ts_us", "event_type", "value")
        .withColumn("ts", timestamp_micros(col("ts_us"))),
      "event_type", statePartitions = Some(4))
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select(col("window_start").cast("long"), col("window_end").cast("long"),
        col("event_type"), col("n_events"), col("sum_value"))
      .collect().map(_.toSeq).toSet
    val batch = pipeline.Medallion.goldPartial(
      pipeline.Medallion.silverEvents(Tables.events(spark, sf)), "ts", "event_type")
      .select(col("window_start"), col("window_end"), col("event_type"),
        col("n_events"), col("sum_value"))
    assert(key(streamed) == key(batch),
      s"streamed-only: ${(key(streamed) -- key(batch)).take(3)}; " +
        s"batch-only: ${(key(batch) -- key(streamed)).take(3)}")
  }

  test("native session_window: streamed closed sessions equal the batch frame up to the watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val evs = Tables.events(spark, sf)
      .filter(col("user_id").isNotNull)
      .select(unix_micros(col("ts")).as("ts_us"), col("user_id"), col("value"))
      .as[(Long, Long, Double)].collect()
    val cut = evs.map(_._1).sorted.apply(evs.length / 2)
    val (b1, b2) = evs.partition(_._1 < cut)
    val maxUs = evs.map(_._1).max
    val mem = MemoryStream[(Long, Long, Double)]
    val streamed = streaming.Sessionize.sessionWindowAgg(
      mem.toDF().toDF("ts_us", "user_id", "value")
        .withColumn("ts", timestamp_micros(col("ts_us")))
        .withWatermark("ts", "0 seconds"))
    mem.addData(scala.util.Random.shuffle(b1.toSeq): _*)
    mem.addData(scala.util.Random.shuffle(b2.toSeq): _*)
    val got = streaming.Streams.runToMemory(streamed, outputMode = "append",
        statePartitions = Some(4))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSet
    // append mode emits a session once the watermark passes its
    // engine close time (last event + gap); the final watermark is
    // the corpus max, so the expected set is the batch frame
    // restricted to window_end <= max event time
    val expected = streaming.Sessionize.sessionWindowAgg(
        Tables.events(spark, sf))
      .filter(col("window_end_us") <= maxUs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSet
    assert(got == expected,
      s"stream-only: ${(got -- expected).take(3)}; batch-only: ${(expected -- got).take(3)}")
    assert(expected.nonEmpty, "the parity set must not be vacuous")
  }

  test("streaming attribution twin equals batch st15 on the real event log (cross-batch touch carry)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import streaming.StatefulTwins.{FunnelEv, AttribOut}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("event_type"))
      .as[FunnelEv].collect()
    // split at the median ts (cross-batch ordering contract),
    // scramble within each batch to prove the in-batch sort repairs it
    val cut = evs.map(_.ts_us).sorted.apply(evs.length / 2)
    val (b1, b2) = evs.partition(_.ts_us < cut)
    val mem = MemoryStream[FunnelEv]
    val q = streaming.StatefulTwins.attributionStream(mem.toDS())
      .writeStream.format("memory").queryName("attrib_twin").outputMode("append").start()
    try {
      mem.addData(scala.util.Random.shuffle(b1.toSeq): _*); q.processAllAvailable()
      mem.addData(scala.util.Random.shuffle(b2.toSeq): _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("attrib_twin").as[AttribOut].collect()
      .map(a => (a.event_id, a.user_id, a.ts_us, a.touch_event_id,
        a.touch_type, a.touch_ts_us, a.attributed, a.touch_age_us)).toSet
    val batch = operators.Activity.st15(spark, sf).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.getString(4)),
        Option(r.get(5)).map(_.asInstanceOf[Long]),
        r.getBoolean(6),
        Option(r.get(7)).map(_.asInstanceOf[Long]))).toSet
    assert(streamed == batch,
      s"stream-only: ${(streamed -- batch).take(3)}; batch-only: ${(batch -- streamed).take(3)}")
    // a touch in batch 1 must be able to credit a conversion in batch 2
    assert(streamed.exists { case (_, _, ts, _, _, touchTs, att, _) =>
      att && touchTs.exists(_ < cut) && ts >= cut },
      "the split must exercise at least one cross-batch attribution")
  }

  test("streaming session-funnel twin equals batch st16 (gap closes a session's row for good)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import streaming.StatefulTwins.{FunnelEv, SessFunnelOut}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("event_type"))
      .as[FunnelEv].collect()
    val cut = evs.map(_.ts_us).sorted.apply(evs.length / 2)
    val (b1, b2) = evs.partition(_.ts_us < cut)
    val mem = MemoryStream[FunnelEv]
    val q = streaming.StatefulTwins.sessionFunnelStream(mem.toDS())
      .writeStream.format("memory").queryName("sessfunnel_twin").outputMode("update").start()
    try {
      mem.addData(scala.util.Random.shuffle(b1.toSeq): _*); q.processAllAvailable()
      mem.addData(scala.util.Random.shuffle(b2.toSeq): _*); q.processAllAvailable()
    } finally q.stop()
    // upsert by (user, session): the last emission per key is final
    val streamed = spark.table("sessfunnel_twin").as[SessFunnelOut].collect()
      .zipWithIndex.groupBy(r => (r._1.user_id, r._1.session_seq))
      .map { case (_, rows) => rows.maxBy(_._2)._1 }
      .map(r => (r.user_id, r.session_seq, r.step1_ts_us, r.step2_ts_us,
        r.step3_ts_us, r.reached)).toSet
    val batch = operators.Funnel.st16(spark, sf).collect().map(r =>
      (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Long]), r.getInt(5))).toSet
    assert(streamed == batch,
      s"stream-only: ${(streamed -- batch).take(3)}; batch-only: ${(batch -- streamed).take(3)}")
    // the median-ts split must actually cut through some session
    // (a session open at the cut gets its provisional batch-1 row
    // superseded by the batch-2 upsert)
    val multiSession = batch.groupBy(_._1).count(_._2.size > 1)
    assert(multiSession > 0, "fixture must contain multi-session users")
  }

  test("streaming interval merge emits exactly the batch islands minus each user's open one") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import streaming.StatefulTwins.{IvEv, Island}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ivs = Tables.events(spark, sf)
      .withColumn("start_us", unix_micros(col("ts")))
      .withColumn("end_us", col("start_us") + lit(300000000L))
      .select(col("user_id"), col("start_us"), col("end_us"), col("event_id"))
      .as[IvEv].collect()
    val cut = ivs.map(_.start_us).sorted.apply(ivs.length / 2)
    val (b1, b2) = ivs.partition(_.start_us < cut)
    val mem = MemoryStream[IvEv]
    val q = streaming.StatefulTwins.intervalMergeStream(mem.toDS())
      .writeStream.format("memory").queryName("island_twin").outputMode("append").start()
    try {
      mem.addData(scala.util.Random.shuffle(b1.toSeq): _*); q.processAllAvailable()
      mem.addData(scala.util.Random.shuffle(b2.toSeq): _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("island_twin").as[Island].collect()
      .map(i => (i.user_id, i.island_seq, i.island_start, i.island_end,
        i.n_intervals, i.covered_us)).toSet
    val batchAll = operators.Intervals.st17(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // each user's max-seq island is still OPEN in stream state (st1's
    // gap law: no close without gap evidence); all others must match
    val lastSeq = batchAll.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val batchClosed = batchAll.filterNot(t => t._2 == lastSeq(t._1)).toSet
    assert(streamed == batchClosed,
      s"stream-only: ${(streamed -- batchClosed).take(3)}; batch-only: ${(batchClosed -- streamed).take(3)}")
    assert(batchClosed.nonEmpty, "fixture must close some islands")
  }

  test("streaming LOCF resample emits exactly the batch grid minus each user's open slot") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import streaming.StatefulTwins.{LocfEv, GridSlot}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("value"))
      .as[LocfEv].collect()
    val cut = evs.map(_.ts_us).sorted.apply(evs.length / 2)
    val (b1, b2) = evs.partition(_.ts_us < cut)
    val mem = MemoryStream[LocfEv]
    val q = streaming.StatefulTwins.locfResampleStream(mem.toDS(), gridUs = 86400L * 1000000L)
      .writeStream.format("memory").queryName("locf_twin").outputMode("append").start()
    try {
      mem.addData(scala.util.Random.shuffle(b1.toSeq): _*); q.processAllAvailable()
      mem.addData(scala.util.Random.shuffle(b2.toSeq): _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("locf_twin").as[GridSlot].collect()
      .map(g => (g.user_id, g.grid_slot, g.filled_value, g.is_observed)).toSet
    val batchAll = operators.Resample.st7(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    // each user's max grid slot is the still-open one (st1's gap law:
    // a later observation could yet land inside it); all earlier
    // slots — observed and carried alike — must match bit-for-bit
    val openSlot = batchAll.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val batchClosed = batchAll.filterNot(t => t._2 == openSlot(t._1)).toSet
    assert(streamed == batchClosed,
      s"stream-only: ${(streamed -- batchClosed).take(3)}; batch-only: ${(batchClosed -- streamed).take(3)}")
    assert(batchClosed.exists(!_._4), "fixture must contain carried-forward gap slots")
    assert(batchClosed.exists(_._4), "fixture must contain closed observed slots")
  }

  test("streaming debounce emits exactly the batch runs minus each key's open run") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import streaming.StatefulTwins.{DebEv, DebOut}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val gapUs = 600L * 1000000L
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"))
      .as[DebEv].collect()
    val cut = evs.map(_.ts_us).sorted.apply(evs.length / 2)
    val (b1, b2) = evs.partition(_.ts_us < cut)
    val mem = MemoryStream[DebEv]
    val q = streaming.StatefulTwins.debounceStream(mem.toDS(), gapUs)
      .writeStream.format("memory").queryName("deb_twin").outputMode("append").start()
    try {
      mem.addData(scala.util.Random.shuffle(b1.toSeq): _*); q.processAllAvailable()
      mem.addData(scala.util.Random.shuffle(b2.toSeq): _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("deb_twin").as[DebOut].collect()
      .map(r => (r.user_id, r.event_type, r.event_id, r.ts_us,
        r.n_suppressed, r.span_us)).toSet
    val batchAll = operators.Activity.st30(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // each (user, type)'s max-ts run is still open in stream state
    val lastRun = batchAll.groupBy(t => (t._1, t._2)).view
      .mapValues(_.map(_._4).max).toMap
    val batchClosed = batchAll.filterNot(t => t._4 == lastRun((t._1, t._2))).toSet
    assert(streamed == batchClosed,
      s"stream-only: ${(streamed -- batchClosed).take(3)}; batch-only: ${(batchClosed -- streamed).take(3)}")
    assert(batchClosed.nonEmpty, "fixture must close runs")
    assert(batchClosed.exists(_._5 > 0L), "fixture must close runs that absorbed repeats")
  }

  test("streaming EWMA state upserts to exactly the batch per-key smoother rows") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import streaming.StatefulTwins.{EwmaEv, EwmaOut}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("event_id"),
        expr("cast(round(value * 1000000) as bigint)").as("v_e6"))
      .as[EwmaEv].collect()
    val cut = evs.map(_.ts_us).sorted.apply(evs.length / 2)
    val (b1, b2) = evs.partition(_.ts_us < cut)
    val mem = MemoryStream[EwmaEv]
    val q = streaming.StatefulTwins.ewmaStream(mem.toDS())
      .writeStream.format("memory").queryName("ewma_twin").outputMode("update").start()
    try {
      mem.addData(scala.util.Random.shuffle(b1.toSeq): _*); q.processAllAvailable()
      mem.addData(scala.util.Random.shuffle(b2.toSeq): _*); q.processAllAvailable()
    } finally q.stop()
    // update-mode upsert: the last row per key is the final state
    val finalByUser = scala.collection.mutable.LinkedHashMap[Long, EwmaOut]()
    spark.table("ewma_twin").as[EwmaOut].collect().foreach(r => finalByUser(r.user_id) = r)
    val streamed = finalByUser.values
      .map(r => (r.user_id, r.n_obs, r.last_v_e6, r.ewma_e6, r.lag_e6)).toSet
    val batch = operators.Activity.st29(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(streamed == batch,
      s"stream-only: ${(streamed -- batch).take(3)}; batch-only: ${(batch -- streamed).take(3)}")
  }

  test("streaming linear interp emits exactly the batch grid minus the null-bracket open rows") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import streaming.StatefulTwins.{LinEv, LinSlot}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("event_id"),
        expr("cast(round(value * 1000000) as bigint)").as("v_e6"))
      .as[LinEv].collect()
    val cut = evs.map(_.ts_us).sorted.apply(evs.length / 2)
    val (b1, b2) = evs.partition(_.ts_us < cut)
    val mem = MemoryStream[LinEv]
    val q = streaming.StatefulTwins.linearResampleStream(mem.toDS(), gridUs = 86400L * 1000000L)
      .writeStream.format("memory").queryName("lin_twin").outputMode("append").start()
    try {
      mem.addData(scala.util.Random.shuffle(b1.toSeq): _*); q.processAllAvailable()
      mem.addData(scala.util.Random.shuffle(b2.toSeq): _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("lin_twin").as[LinSlot].collect()
      .map(s => (s.user_id, s.grid_slot, s.interp_e6, s.bracket_us)).toSet
    val batchAll = operators.Resample.st28(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
    // the open-slot law IS the schema: batch rows with a null bracket
    // are exactly each key's unemittable final exact-hit
    val batchClosed = batchAll.filter(_._4 >= 0L).toSet
    assert(streamed == batchClosed,
      s"stream-only: ${(streamed -- batchClosed).take(3)}; batch-only: ${(batchClosed -- streamed).take(3)}")
    assert(batchClosed.nonEmpty, "fixture must close interpolated rows")
    // µs event timestamps never land exactly on the day grid, so the
    // open-exact-hit law needs a grid-aligned synthetic: the state's
    // own grid point must stay unemitted until a later arrival
    // brackets it, then emit with the batch tiebreak value
    val mem2 = MemoryStream[LinEv]
    val q2 = streaming.StatefulTwins.linearResampleStream(mem2.toDS(), gridUs = 100L)
      .writeStream.format("memory").queryName("lin_twin_synth")
      .outputMode("append").start()
    def synthRows(): Set[(Long, Long, Long, Long)] =
      spark.table("lin_twin_synth").as[LinSlot].collect()
        .map(s => (s.user_id, s.grid_slot, s.interp_e6, s.bracket_us)).toSet
    try {
      mem2.addData(LinEv(1L, 0L, 1L, 0L), LinEv(1L, 200L, 2L, 200L),
        LinEv(1L, 200L, 3L, 999L)); q2.processAllAvailable()
      assert(synthRows() == Set((1L, 0L, 0L, 200L), (1L, 1L, 100L, 200L)),
        s"exact-hit at ts=200 must stay open: ${synthRows()}")
      mem2.addData(LinEv(1L, 250L, 4L, 300L)); q2.processAllAvailable()
      assert(synthRows() == Set((1L, 0L, 0L, 200L), (1L, 1L, 100L, 200L),
        (1L, 2L, 999L, 50L)),
        s"the bracketing arrival must close it with the max-id winner: ${synthRows()}")
    } finally q2.stop()
  }

  test("streaming dwell credits aggregate to exactly the batch per-state dwell rows") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import streaming.StatefulTwins.{DwellEv, DwellCredit}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("event_type"))
      .as[DwellEv].collect()
    val cut = evs.map(_.ts_us).sorted.apply(evs.length / 2)
    val (b1, b2) = evs.partition(_.ts_us < cut)
    val mem = MemoryStream[DwellEv]
    val q = streaming.StatefulTwins.dwellCreditsStream(mem.toDS())
      .writeStream.format("memory").queryName("dwell_twin").outputMode("append").start()
    try {
      mem.addData(scala.util.Random.shuffle(b1.toSeq): _*); q.processAllAvailable()
      mem.addData(scala.util.Random.shuffle(b2.toSeq): _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("dwell_twin").as[DwellCredit].collect()
      .groupBy(_.state).view
      .mapValues(cs => (cs.length.toLong, cs.map(_.dwell_us).sum)).toMap
    val batch = operators.Intervals.st18(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(streamed == batch, s"per-state (n, total) diverge: $streamed vs $batch")
  }
}
