package graft

import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class SkewStreamSpec extends GraftSpecBase {

  test("salted join is row-identical to the plain join") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_linenumber", "l_suppkey", "l_quantity")
    val supp = Tables.supplier(spark, sf)
    val plain = li.join(supp, li("l_suppkey") === supp("s_suppkey"))
      .select("l_orderkey", "l_linenumber", "s_name")
    val salted = operators.Skew.saltedJoin(li, supp.withColumnRenamed("s_suppkey", "l_suppkey"),
        "l_suppkey", n = 8, leftSaltSource = col("l_orderkey") * 10 + col("l_linenumber"))
      .select("l_orderkey", "l_linenumber", "s_name")
    assert(plain.count() == salted.count())
    assert(plain.exceptAll(salted).count() == 0)
    assert(salted.exceptAll(plain).count() == 0)
  }

  test("salted two-stage agg equals direct agg") {
    val li = Tables.lineitem(spark, sf)
    val direct = li.groupBy(col("l_suppkey")).agg(
      count(lit(1)).as("n_rows"), sum(col("l_quantity")).as("total"))
    val salted = operators.Skew.saltedCountSum(li, "l_suppkey", "l_quantity", 8,
      col("l_orderkey") * 10 + col("l_linenumber"))
    val d = direct.collect().map(r => (r.getLong(0), r.getLong(1), math.rint(r.getDouble(2)))).toSet
    val s = salted.collect().map(r => (r.getLong(0), r.getLong(1), math.rint(r.getDouble(2)))).toSet
    assert(d == s)
  }

  test("AQE splits a skewed join partition at runtime (hot-key resilience without salting)") {
    // one key carries ~90% of the left side; with the skew thresholds
    // scaled down to test-data size, AQE must mark the sort-merge join
    // skew-handled instead of leaving one straggler task.
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "4KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val left = spark.range(200000)
        .select((col("id") % 1000).as("pad"),
          when(col("id") % 10 < 9, lit(7L)).otherwise(col("id")).as("k"))
      val right = spark.range(5000).select(col("id").as("k"), (col("id") * 2).as("v"))
      val joined = left.join(right, "k")
      joined.collect()
      val plan = joined.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan.toString
        case p => p.toString
      }
      assert(plan.contains("skew=true") || plan.contains("isSkew=true"),
        s"AQE must flag the hot-key join as skew-handled:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("banded token-budget mix is row-identical on a planted 100x hot source") {
    // x9's documented hot-source case: one source holds ~100x the
    // docs of every other. The banded spelling must (a) admit the
    // EXACT same rows with the EXACT same running totals, and (b)
    // actually split the hot source's window across bands in the
    // plan, so no single task sorts the whole source.
    import spark.implicits._
    val hot = (1L to 5000L).map(i => (i, "hot", 10L + (i % 37), (i % 101).toDouble / 101.0))
    val cold = (1L to 4L).flatMap(sIdx => (1L to 50L).map(i =>
      (100000L + sIdx * 1000L + i, s"cold$sIdx", 10L + (i % 37), (i % 53).toDouble / 53.0)))
    val docs = (hot ++ cold).toDF("doc_id", "source", "n_tokens", "quality_score")
      .repartition(8)
    val budgets = Map("hot" -> 20000L)
    val plain = text.Curation.tokenBudgetMix(docs, budgets, defaultBudget = 500L)
    val salted = text.Curation.tokenBudgetMixSalted(docs, budgets, defaultBudget = 500L, bands = 16)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "source", "cum_tokens").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val p = rows(plain); val s = rows(salted)
    assert(p == s, s"diverge: plain-only=${(p -- s).take(3)} salted-only=${(s -- p).take(3)}")
    assert(p.nonEmpty && p.exists(_._2 == "hot") && p.exists(_._2 == "cold1"))
    // plan pin: the salted window partitions on (source, band), never
    // on source alone — the hot key is split 16 ways
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("__band"), s"banded window must key on __band:\n${plan.take(2000)}")
  }

  test("stream-stream interval join: purchases enriched with recent signups") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$sf/events.parquet").schema
    def stream() = Tables.normalizeEventTs(
      streaming.Streams.fileStream(spark, sf, schema, globFilter = Some("events.parquet")))

    val purchases = stream().filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val signups = stream().filter(col("event_type") === "signup")
      .select(col("event_id").as("s_id"), col("user_id").as("s_user"), col("ts").as("s_ts"))
      .withWatermark("s_ts", "1 hour")
    val joined = purchases.join(signups,
      col("p_user") === col("s_user") &&
        col("s_ts").between(col("p_ts") - expr("INTERVAL 1 HOUR"), col("p_ts")))
    val got = streaming.Streams.runToMemory(joined, outputMode = "append").count()

    // batch equivalent
    val ev = Tables.events(spark, sf)
    val bp = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
    val bs = ev.filter(col("event_type") === "signup")
      .select(col("event_id").as("s_id"), col("user_id").as("s_user"), col("ts").as("s_ts"))
    val want = bp.join(bs,
      col("p_user") === col("s_user") &&
        col("s_ts").between(col("p_ts") - expr("INTERVAL 1 HOUR"), col("p_ts"))).count()
    assert(got == want, s"stream-stream join rows $got != batch $want")
    assert(want > 0)
  }

  test("streaming dropDuplicates within watermark removes planted dups") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft_dup").toString
    val base = java.sql.Timestamp.valueOf("2024-06-01 10:00:00")
    def ts(m: Int) = new java.sql.Timestamp(base.getTime + m * 60000L)
    val rows = Seq(
      (1L, ts(0), "a"), (1L, ts(0), "a"),   // exact dup key (id, ts)
      (2L, ts(1), "b"),
      (2L, ts(5), "b2"),                    // same id, later ts -> kept
      (3L, ts(2), "c"), (3L, ts(2), "c"))
    rows.toDF("id", "ts", "v").write.mode("overwrite").parquet(tmp)
    val schema = spark.read.parquet(tmp).schema
    val deduped = streaming.Streams.fileStream(spark, tmp, schema)
      .withWatermark("ts", "10 minutes")
      .dropDuplicates("id", "ts")
    val got = streaming.Streams.runToMemory(deduped, outputMode = "append",
        statePartitions = Some(4))
      .select("id", "ts").collect().map(r => (r.getLong(0), r.getTimestamp(1))).toSet
    assert(got == Set((1L, ts(0)), (2L, ts(1)), (2L, ts(5)), (3L, ts(2))))
  }

  test("foreachBatch sink receives update-mode gold batches") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$sf/events.parquet").schema
    val stream = Tables.normalizeEventTs(
      streaming.Streams.fileStream(spark, sf, schema, globFilter = Some("events.parquet")))
    val silver = pipeline.Medallion.silverEvents(stream).withWatermark("ts", "2 hours")
    val gold = pipeline.Medallion.goldWindow(silver, "ts", "event_type")
    val seen = new ConcurrentLinkedQueue[Long]()
    val ckpt = Files.createTempDirectory("graft_fb").toString
    val q = streaming.Streams.foreachBatchSink(gold, ckpt) { (batch, _) =>
      seen.add(batch.count()) // a JDBC writer would df.write.format("jdbc") here
    }.trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(seen.size() >= 1 && seen.stream().mapToLong(identity(_)).sum() > 0)
  }
}
