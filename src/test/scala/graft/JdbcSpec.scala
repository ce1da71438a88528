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

  test("jdbc upsert is idempotent and keyed on the gold grain") {
    val upUrl = "jdbc:derby:memory:graftup;create=true"
    val write = streaming.Streams.jdbcUpsertWriter(
      upUrl, "gold_upsert", keyCols = Seq("window_start", "station_id"),
      user = "", password = "", driver = driver)
    def readBack(): Seq[(Long, String, Double, Long)] =
      spark.read.format("jdbc")
        .option("url", upUrl).option("dbtable", "gold_upsert").option("driver", driver)
        .load().orderBy(col("window_start"), col("station_id"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3))).toSeq

    val b1 = Seq(
      (100L, "stA", 0.25, 10L),
      (100L, "stB", 0.50, 20L),
      (200L, "stA", 0.75, 30L))
      .toDF("window_start", "station_id", "avg_pct", "n_events")

    // first contact creates the table and lands the batch
    write(b1, 0L)
    val first = readBack()
    assert(first == Seq((100L, "stA", 0.25, 10L), (100L, "stB", 0.50, 20L),
      (200L, "stA", 0.75, 30L)))

    // checkpoint-replay shape: the SAME batch again must be a no-op
    write(b1, 0L)
    assert(readBack() == first, "replaying a batch must leave the table identical")

    // late data re-emits window (100, stA) with new values and adds a
    // new grain — the re-emit REPLACES, never duplicates
    val b2 = Seq(
      (100L, "stA", 0.40, 15L),
      (300L, "stC", 0.60, 5L))
      .toDF("window_start", "station_id", "avg_pct", "n_events")
    write(b2, 1L)
    assert(readBack() == Seq((100L, "stA", 0.40, 15L), (100L, "stB", 0.50, 20L),
      (200L, "stA", 0.75, 30L), (300L, "stC", 0.60, 5L)))
  }

  test("streaming update-mode gold through the upsert sink replaces, never appends") {
    // the real exactly-once gold path: update-mode re-emits a grain's
    // row every micro-batch it changes in — with the append writer
    // that is one duplicate per update; through the upsert sink the
    // table always holds exactly one row per grain, with final values
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val upUrl = "jdbc:derby:memory:graftstream;create=true"
    val writer = streaming.Streams.jdbcUpsertWriter(upUrl, "gold_stream",
      keyCols = Seq("station_id"), user = "", password = "", driver = driver)
    val checkpoint = java.nio.file.Files.createTempDirectory("graft_upsert_ck").toString
    val mem = MemoryStream[(String, Double)]
    val agg = mem.toDF().toDF("station_id", "v")
      .groupBy(col("station_id"))
      .agg(round(sum(col("v")), 4).as("total"), count(lit(1)).as("n"))
    val q = streaming.Streams.foreachBatchSink(agg, checkpoint)(writer).start()
    try {
      mem.addData(("a", 1.0), ("b", 2.0))
      q.processAllAvailable()
      mem.addData(("a", 3.0)) // re-emits station a's updated row
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.read.format("jdbc")
      .option("url", upUrl).option("dbtable", "gold_stream").option("driver", driver)
      .load().orderBy(col("station_id"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(rows.toSeq == Seq(("a", 4.0, 2L), ("b", 2.0, 1L)),
      s"grain must be replaced in place: ${rows.toSeq}")
  }

  test("postgres dialect canary: real upsert round-trip the day a driver + server land (auto-skips offline)") {
    // The reference's gold sink is Postgres (spark_streaming_job.py:
    // 124-140); offline this environment ships neither the pgjdbc jar
    // nor a server, so the upsert's delete-then-insert spelling is
    // proven dialect-portable only on Derby. Mirror of the Kafka
    // canary: cancel with the precise missing piece now, and the day
    // a Postgres jar/container lands this test starts running the
    // REAL keyed-upsert idempotence contract against it with zero
    // code change.
    val pgDriver = "org.postgresql.Driver"
    val loaded = try { Class.forName(pgDriver); true }
      catch { case _: ClassNotFoundException => false }
    assume(loaded, s"$pgDriver absent from the classpath (expected offline)")
    val pgUrl = sys.env.getOrElse("GRAFT_PG_URL",
      "jdbc:postgresql://localhost:5432/postgres?user=postgres")
    val conn = try Right(java.sql.DriverManager.getConnection(pgUrl))
      catch { case e: Throwable => Left(e) }
    conn match {
      case Left(e) =>
        assume(false, s"pgjdbc present but no reachable server at $pgUrl: ${e.getMessage}")
      case Right(c) =>
        try c.createStatement().execute("DROP TABLE IF EXISTS graft_pg_canary")
        finally c.close()
        val writer = streaming.Streams.jdbcUpsertWriter(
          pgUrl, "graft_pg_canary", keyCols = Seq("station_id"),
          user = "", password = "", driver = pgDriver)
        val b1 = Seq(("a", 1.0, 1L), ("b", 2.0, 1L)).toDF("station_id", "total", "n")
        writer(b1, 0L)
        writer(b1, 0L) // replayed batch must be a no-op (idempotence)
        val b2 = Seq(("a", 4.0, 2L)).toDF("station_id", "total", "n")
        writer(b2, 1L)
        val rows = spark.read.format("jdbc")
          .option("url", pgUrl).option("dbtable", "graft_pg_canary")
          .option("driver", pgDriver).load()
          .orderBy(col("station_id"))
          .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
        assert(rows.toSeq == Seq(("a", 4.0, 2L), ("b", 2.0, 1L)),
          s"postgres upsert must replace by key, never append: ${rows.toSeq}")
    }
  }
}
