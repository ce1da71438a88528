package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

class OperatorsSpec extends GraftSpecBase {
  import spark.implicits._

  test("asOf join picks the latest right row at or before each left ts") {
    val left = Seq((1L, 10L, 100L), (2L, 10L, 205L), (3L, 10L, 50L), (4L, 99L, 100L))
      .toDF("event_id", "user_id", "ts_us")
    val right = Seq((10L, 100L, 7L), (10L, 200L, 8L))
      .toDF("user_id", "ts_us", "state_id")
    val r = operators.AsOfJoin.asOf(left, right, "user_id", "ts_us", "ts_us",
        Seq("state_id"), tieBreak = "ts_us")
      .select("event_id", "asof_state_id")
      .collect().map(x => x.getLong(0) -> (if (x.isNullAt(1)) None else Some(x.getLong(1)))).toMap
    assert(r(1L).contains(7L), "equal ts matches (>= semantics)")
    assert(r(2L).contains(8L), "latest prior state wins")
    assert(r(3L).isEmpty, "no state before first event")
    assert(r(4L).isEmpty, "unknown key -> null")
  }

  test("interval overlap join equals the naive inequality join, each pair exactly once") {
    // random bounded intervals over few keys, lengths up to 5 buckets
    // wide so pairs share MANY buckets — the single-attribution filter
    // must still emit each pair exactly once
    val rnd = new scala.util.Random(11)
    val width = 100L
    val left = (0 until 120).map { i =>
      val s = rnd.nextInt(2000).toLong
      (i.toLong, (i % 4).toLong, s, s + rnd.nextInt(500))
    }.toDF("l_id", "k", "ls", "le")
    val right = (0 until 120).map { i =>
      val s = rnd.nextInt(2000).toLong
      (i.toLong, (i % 4).toLong, s, s + rnd.nextInt(500))
    }.toDF("r_id", "k", "rs", "re")
    val bucketed = operators.IntervalJoin.intervalJoin(
        left, right, "k", "ls", "le", "rs", "re", width)
      .select("l_id", "r_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val naive = left.join(right, Seq("k"))
      .filter(col("rs") <= col("le") && col("ls") <= col("re"))
      .select("l_id", "r_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(naive.nonEmpty && naive.length == naive.toSet.size)
    assert(bucketed.length == bucketed.toSet.size, "no pair may be emitted twice")
    assert(bucketed.toSet == naive.toSet,
      s"missing=${(naive.toSet -- bucketed.toSet).take(5)} extra=${(bucketed.toSet -- naive.toSet).take(5)}")
  }

  test("lake: date-partitioned write, partition listing, retention expiry") {
    val tmp = Files.createTempDirectory("graft_lake").toString + "/lake"
    val df = Seq(
      ("2024-01-01 10:00:00", 1), ("2024-01-02 10:00:00", 2), ("2024-01-03 10:00:00", 3))
      .toDF("ts", "v").withColumn("ts", col("ts").cast("timestamp"))
    sources.Lake.writeDatePartitioned(df, tmp)
    assert(sources.Lake.listPartitions(spark, tmp) ==
      Seq("2024-01-01", "2024-01-02", "2024-01-03"))
    val dropped = sources.Lake.expirePartitions(spark, tmp, cutoff = "2024-01-03")
    assert(dropped == Seq("2024-01-01", "2024-01-02"))
    assert(sources.Lake.listPartitions(spark, tmp) == Seq("2024-01-03"))
    // remaining data still readable and pruned
    assert(spark.read.parquet(tmp).count() == 1)
  }

  test("compaction bin-packs a partition's small files, preserving rows") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val df = (1 to 1000).map(i => (f"2024-01-01 10:00:${i % 60}%02d", i))
      .toDF("ts", "v").withColumn("ts", col("ts").cast("timestamp"))
    // 16 writer tasks -> 16 small files in the partition
    sources.Lake.writeDatePartitioned(df.repartition(16), tmp)
    val (before, after) = sources.Lake.compactPartition(spark, tmp, "2024-01-01",
      targetBytes = 1024L * 1024 * 1024)
    assert(before >= 16, s"expected many small files, saw $before")
    assert(after == 1, s"one fat target file expected, saw $after")
    val back = spark.read.parquet(tmp)
    assert(back.count() == 1000)
    assert(back.agg(sum(col("v"))).head().getLong(0) == (1 to 1000).sum)
    // idempotent: already-compact partition is untouched
    assert(sources.Lake.compactPartition(spark, tmp, "2024-01-01",
      targetBytes = 1024L * 1024 * 1024) == ((1, 1)))
  }

  test("bucketed tables join with zero shuffle") {
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      sources.Lake.writeBucketed(Tables.lineitem(spark, sf)
        .select("l_orderkey", "l_quantity"), "b_li", 8, "l_orderkey")
      sources.Lake.writeBucketed(Tables.orders(spark, sf)
        .select("o_orderkey", "o_totalprice"), "b_ord", 8, "o_orderkey")
      val j = spark.table("b_li")
        .join(spark.table("b_ord"), col("l_orderkey") === col("o_orderkey"))
      assert(j.count() > 0)
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("IVF k-means centroids are well-formed") {
    val emb = Tables.embeddings(spark, sf)
    val c = similarity.Similarity.kmeansCentroids(emb, k = 8, iters = 2).collect()
    assert(c.length == 8)
    assert(c.forall(_.getAs[Seq[Float]]("cell_emb").length == 64))
  }

  test("approximate sketches stay within tolerance of exact answers") {
    val o = Tables.orders(spark, sf)
    val exact = o.select(countDistinct(col("o_custkey"))).head().getLong(0)
    val approx = o.select(approx_count_distinct(col("o_custkey"))).head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.1, s"HLL $approx vs $exact")
    val ep = o.select(percentile(col("o_totalprice"), lit(0.5))).head().getDouble(0)
    val ap = o.select(percentile_approx(col("o_totalprice"), lit(0.5), lit(10000)))
      .head().getDouble(0)
    assert(math.abs(ap - ep) / ep < 0.05, s"approx pct $ap vs $ep")
  }

  test("coerceTypes mirrors the reference producer normalization") {
    val df = Seq((72, "3", "1", "true", "x"))
      .toDF("station_id", "num_bikes", "is_installed", "is_renting", "junk_bool")
    val r = pipeline.Medallion.coerceTypes(df,
      stringCols = Seq("station_id"), intCols = Seq("num_bikes"),
      boolCols = Seq("is_installed", "is_renting", "junk_bool")).head()
    assert(r.getAs[String]("station_id") == "72")
    assert(r.getAs[Int]("num_bikes") == 3)
    assert(r.getAs[Boolean]("is_installed"))
    assert(r.getAs[Boolean]("is_renting"))
    assert(r.isNullAt(r.fieldIndex("junk_bool")), "non-coercible -> null")
  }

  test("GraftExtensions makes custom functions SQL-callable") {
    functions.GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT cosine_sim(array(cast(1.0 as float), cast(0.0 as float)), array(cast(1.0 as float), cast(0.0 as float))) AS c")
      .head().getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
    val sh = spark.sql("SELECT size(word_shingles('a b c d')) AS n").head().getInt(0)
    assert(sh == 2, "4 tokens -> 2 distinct 3-gram shingles")
    val hb = spark.sql(
      "SELECT hyperplane_bucket(array(cast(1.0 as float), cast(0.5 as float))) AS b")
      .head().getInt(0)
    assert(hb >= 0 && hb < 65536, "16-plane bucket in range")
    val ts = spark.sql("SELECT text_stats('the cat sat.').n_tokens AS n").head().getLong(0)
    assert(ts == 3L)
    // GraftExtensions wires the same builders through
    // spark.sql.extensions at session-build time
    assert(new plans.GraftExtensions() != null)
  }

  test("st7 LOCF resample: gaps fill forward, slot winner is the latest obs, span is per-key") {
    import spark.implicits._
    val g = 100L // grid width in "us"
    val obs = Seq(
      // key 1: obs in slots 0 and 3 — slots 1, 2 carry slot 0's value
      (1L, 10L, 1L, 1.0), (1L, 350L, 2L, 4.0),
      // slot 0 has two obs: ts 90 must win over ts 10
      (1L, 90L, 3L, 2.0),
      // key 2: single obs — one slot, no fill needed
      (2L, 500L, 4L, 9.0)).toDF("k", "ts", "id", "v")
    val r = operators.Resample.locfResample(obs, "k", "ts", "id", col("v"), g)
      .collect().map(x => (x.getLong(0), x.getLong(1)) ->
        ((x.getDouble(2), x.getBoolean(3)))).toMap
    assert(r((1L, 0L)) == ((2.0, true)), "latest obs in slot wins (ts 90 beats ts 10)")
    assert(r((1L, 1L)) == ((2.0, false)) && r((1L, 2L)) == ((2.0, false)),
      "gap slots carry the last observation forward")
    assert(r((1L, 3L)) == ((4.0, true)))
    assert(r((2L, 5L)) == ((9.0, true)))
    assert(r.size == 5, s"grid spans per-key min..max only: ${r.keys.toSeq.sorted}")
  }

  test("st28 linear resample: bracketing, exact hits, sign-aware half-away rounding, empty grids") {
    import spark.implicits._
    val g = 100L
    val obs = Seq(
      // key 1: straight line 1e6 -> 3e6 over ts 50..250; grid 100, 200
      (1L, 50L, 1L, 1000000L), (1L, 250L, 2L, 3000000L),
      // key 2: two obs AT the grid point (largest id wins), then exact end hit
      (2L, 100L, 1L, 5000000L), (2L, 100L, 2L, 7000000L), (2L, 300L, 3L, 9000000L),
      // key 4: half-away rounding UP on a rise (5 e6-units over 1000 us)
      (4L, 0L, 1L, 0L), (4L, 1000L, 2L, 5L),
      // key 5: half-away rounding DOWN on a fall (mirror of key 4)
      (5L, 0L, 1L, 0L), (5L, 1000L, 2L, -5L),
      // key 6: single obs off-grid -> ceil(550)=6 > floor(550)=5, no rows
      (6L, 550L, 1L, 42L)).toDF("k", "ts", "id", "v")
    val r = operators.Resample.linearResample(obs, "k", "ts", "id", col("v"), g)
      .collect().map(x => (x.getLong(0), x.getLong(1)) ->
        ((x.getLong(2), if (x.isNullAt(3)) -1L else x.getLong(3)))).toMap
    assert(r((1L, 1L)) == ((1500000L, 200L)), "quarter-way point time-weights 1/4")
    assert(r((1L, 2L)) == ((2500000L, 200L)), "three-quarter point time-weights 3/4")
    assert(r((2L, 1L)) == ((7000000L, 200L)),
      "exact hit returns the observed value, largest id among simultaneous obs")
    assert(r((2L, 2L)) == ((8000000L, 200L)), "midpoint averages the bracket")
    assert(r((2L, 3L)) == ((9000000L, -1L)), "span-end exact hit has no next bracket")
    assert(r((4L, 1L))._1 == 1L && r((4L, 5L))._1 == 3L,
      s"rising .5 cases round away from zero: ${r((4L, 1L))} ${r((4L, 5L))}")
    assert(r((5L, 1L))._1 == -1L && r((5L, 5L))._1 == -3L,
      s"falling .5 cases round away from zero: ${r((5L, 1L))} ${r((5L, 5L))}")
    assert(!r.keys.exists(_._1 == 6L), "a key whose span brackets no grid point emits nothing")
    assert(r((4L, 0L)) == ((0L, 1000L)) && r((4L, 10L))._1 == 5L)
  }

  test("st28 randomized oracle: 60 random series match a direct Scala reference (HALF_UP rational)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val g = 100L
    // duplicate timestamps allowed; values signed so both rounding
    // directions and the sign-restored division get exercised
    val obs: Seq[(Long, Long, Long, Long)] = (0 until 60).flatMap { k =>
      val n = 2 + rnd.nextInt(10)
      (0 until n).map(i =>
        (k.toLong, rnd.nextInt(1000).toLong, i.toLong, (rnd.nextInt(2001) - 1000).toLong))
    }
    val got = operators.Resample.linearResample(
        obs.toDF("k", "ts", "id", "v"), "k", "ts", "id", col("v"), g)
      .collect().map(x => (x.getLong(0), x.getLong(1)) ->
        ((x.getLong(2), if (x.isNullAt(3)) -1L else x.getLong(3)))).toMap
    var expectedRows = 0
    obs.groupBy(_._1).foreach { case (k, es) =>
      val lo = (es.map(_._2).min + g - 1) / g
      val hi = es.map(_._2).max / g
      (lo to hi).foreach { s =>
        val tau = s * g
        val (_, pts, _, pv) = es.filter(_._2 <= tau).maxBy(e => (e._2, e._3))
        val nexts = es.filter(_._2 > tau)
        val want =
          if (nexts.isEmpty) (pv, -1L)
          else {
            val (_, nts, _, nv) = nexts.minBy(e => (e._2, e._3))
            val q = java.math.BigDecimal.valueOf(nv - pv)
              .multiply(java.math.BigDecimal.valueOf(tau - pts))
              .divide(java.math.BigDecimal.valueOf(nts - pts), 0,
                java.math.RoundingMode.HALF_UP).longValueExact()
            (pv + q, nts - pts)
          }
        assert(got((k, s)) == want, s"key $k slot $s: got ${got((k, s))}, want $want")
        expectedRows += 1
      }
    }
    assert(got.size == expectedRows, "no extra grid rows beyond the per-key spans")
  }

  test("a47 PageRank: three integer power rounds match the hand-computed ranks; dangling keeps base") {
    import spark.implicits._
    // graph 1-2, 2-3 (u3 duplicates 1-2: edges must be DISTINCT), 9 isolated
    val ev = Seq(
      (1L, """{"k": 1}"""), (1L, """{"k": 2}"""),
      (2L, """{"k": 2}"""), (2L, """{"k": 3}"""),
      (3L, """{"k": 1}"""), (3L, """{"k": 2}"""),
      (4L, """{"k": 9}"""))
      .toDF("user_id", "props")
    val r = analytics.Queries.pageRank(ev)
      .collect().map(x => x.getInt(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(r(1) == ((629187500L, 1L)), s"leaf rank after 3 rounds: ${r(1)}")
    assert(r(2) == ((1741625000L, 2L)), s"hub rank after 3 rounds: ${r(2)}")
    assert(r(3) == ((629187500L, 1L)), "symmetric leaf matches")
    assert(r(9) == ((150000000L, 0L)), "dangling node keeps exactly the base term")
  }

  test("a48 RANGE frame: missing days shrink the trailing window (the ROWS-frame miscount)") {
    import spark.implicits._
    // priority P orders on days 0, 1, 5 (days 2-4 missing): a 3-day
    // RANGE frame at day 5 covers [3, 5] -> only day 5 itself; a ROWS
    // frame would wrongly reach back to days 0-1
    val orders = Seq(
      ("P", "1970-01-01", 1.00), ("P", "1970-01-02", 2.00),
      ("P", "1970-01-02", 0.50), ("P", "1970-01-06", 0.25),
      ("Q", "1970-01-01", 9.00))
      .toDF("o_orderpriority", "d", "o_totalprice")
      .withColumn("o_orderdate", col("d").cast("date"))
    val r = analytics.Queries.trailingRevenue(orders, days = 3).collect()
      .map(x => (x.getString(0), x.getLong(1)) ->
        ((x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5)))).toMap
    assert(r(("P", 0L)) == ((100L, 1L, 100L, 1L)), s"${r(("P", 0L))}")
    assert(r(("P", 1L)) == ((250L, 2L, 350L, 2L)), "day 1 frame [-1,1] holds both days")
    assert(r(("P", 5L)) == ((25L, 1L, 25L, 1L)),
      s"day 5 frame [3,5] must NOT reach days 0-1: ${r(("P", 5L))}")
    assert(r(("Q", 0L)) == ((900L, 1L, 900L, 1L)), "priorities partition independently")
    assert(r.size == 4)
  }

  test("st30 debounce: runs collapse onto their lead, strict gap boundary, per-type independence") {
    import spark.implicits._
    val g = 10L
    val ev = Seq(
      // u1/A: [0,5,9] one run; [25,30] second run
      (1L, 1L, "A", 0L), (2L, 1L, "A", 5L), (3L, 1L, "A", 9L),
      (4L, 1L, "A", 25L), (5L, 1L, "A", 30L),
      // u1/B: same user, other type — independent
      (6L, 1L, "B", 7L),
      // u2/A: equal-ts duplicate click collapses onto the smaller id
      (7L, 2L, "A", 100L), (8L, 2L, "A", 100L),
      // u3/A: gap EXACTLY g is suppressed (strictly-greater keeps)
      (9L, 3L, "A", 0L), (10L, 3L, "A", 10L),
      // u4/A: gap g+1 is kept
      (11L, 4L, "A", 0L), (12L, 4L, "A", 11L))
      .toDF("event_id", "user_id", "event_type", "us")
      .withColumn("ts", timestamp_micros(col("us")))
    val r = operators.Activity.debounce(ev, g).collect()
      .map(x => (x.getLong(0), x.getString(1), x.getLong(2)) ->
        ((x.getLong(3), x.getLong(4), x.getLong(5)))).toMap
    assert(r((1L, "A", 1L)) == ((0L, 2L, 9L)), s"first run absorbs 2: ${r((1L, "A", 1L))}")
    assert(r((1L, "A", 4L)) == ((25L, 1L, 5L)), "second run opens past the gap")
    assert(r((1L, "B", 6L)) == ((7L, 0L, 0L)), "types debounce independently")
    assert(r((2L, "A", 7L)) == ((100L, 1L, 0L)), "equal-ts duplicate collapses onto min id")
    assert(r((3L, "A", 9L)) == ((0L, 1L, 10L)), "gap == g suppresses (strict >)")
    assert(r((4L, "A", 11L)) == ((0L, 0L, 0L)) && r((4L, "A", 12L)) == ((11L, 0L, 0L)),
      "gap == g+1 keeps")
    assert(r.size == 7)
  }

  test("st29 EWMA: exact integer fold, mathematical floor on falls, total order, one keyed exchange") {
    import spark.implicits._
    val ev = Seq(
      // rise: 0 -> 10 smooths to floor(10/4) = 2
      (1L, 1L, 1L, 0L), (1L, 2L, 2L, 10L),
      // fall: 10 -> 0 smooths by floor(-10/4) = -3 (NOT trunc -2)
      (2L, 1L, 1L, 10L), (2L, 2L, 2L, 0L),
      // total order: (ts, id) sorts (1,1), (5,1), (5,2) -> 0, 0, +25
      (3L, 5L, 2L, 100L), (3L, 5L, 1L, 0L), (3L, 1L, 1L, 0L),
      // dead zone: a +3 step floors to 0 (stated quantization)
      (4L, 1L, 1L, 0L), (4L, 2L, 2L, 3L),
      // single obs: state is the observation itself
      (5L, 9L, 1L, 42L)).toDF("k", "ts", "id", "v")
    val lib = operators.Activity.ewmaState(ev, "k", "ts", "id", col("v"))
    val r = lib.collect().map(x => x.getLong(0) ->
      ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))).toMap
    assert(r(1L) == ((2L, 10L, 2L, 8L)), s"rise: ${r(1L)}")
    assert(r(2L) == ((2L, 0L, 7L, -7L)), s"fall floors toward -inf: ${r(2L)}")
    assert(r(3L) == ((3L, 100L, 25L, 75L)), s"(ts, id) total order: ${r(3L)}")
    assert(r(4L) == ((2L, 3L, 0L, 3L)), s"sub-step dead zone: ${r(4L)}")
    assert(r(5L) == ((1L, 42L, 42L, 0L)), "s0 = v0")
    val plan = lib.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString
      case p => p.toString
    }
    assert(!plan.contains("Exchange rangepartitioning"),
      s"library EWMA must not global-sort:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1,
      s"exactly one keyed exchange (the collect agg):\n$plan")
  }

  test("funnel: step order is enforced strictly, out-of-order steps don't count") {
    val ev = Seq(
      // u1 completes in order
      (1L, 1L, 100L, "view"), (2L, 1L, 200L, "click"), (3L, 1L, 300L, "purchase"),
      // u2: purchase BEFORE click — must stop at step 2
      (4L, 2L, 100L, "view"), (5L, 2L, 150L, "purchase"), (6L, 2L, 200L, "click"),
      // u3: click at EXACTLY the view ts — strictness keeps it at step 1
      (7L, 3L, 100L, "view"), (8L, 3L, 100L, "click"),
      // u4: click first, then view, then a later click completes step 2
      (9L, 4L, 50L, "click"), (10L, 4L, 100L, "view"), (11L, 4L, 180L, "click"),
      // u5: only non-step events -> absent from the result
      (12L, 5L, 100L, "error"))
      .toDF("event_id", "user_id", "ts_us", "event_type")
    val r = operators.Funnel.funnel3(ev, "user_id", "ts_us", "event_id",
        "event_type", ("view", "click", "purchase"))
      .collect().map(x => x.getLong(0) ->
        ((if (x.isNullAt(1)) -1L else x.getLong(1)),
         (if (x.isNullAt(2)) -1L else x.getLong(2)),
         (if (x.isNullAt(3)) -1L else x.getLong(3)), x.getInt(4))).toMap
    assert(r(1L) == ((100L, 200L, 300L, 3)))
    assert(r(2L) == ((100L, 200L, -1L, 2)), "early purchase must not complete the funnel")
    assert(r(3L) == ((100L, -1L, -1L, 1)), "same-ts click is not strictly after the view")
    assert(r(4L) == ((100L, 180L, -1L, 2)), "pre-view click ignored, later click counts")
    assert(!r.contains(5L), "users with no step events never enter the shuffle")
    // pure function of the data: physical layout cannot change it
    val re = operators.Funnel.funnel3(ev.repartition(5), "user_id", "ts_us",
        "event_id", "event_type", ("view", "click", "purchase"))
      .collect().map(x => x.getLong(0) -> x.getInt(4)).toMap
    assert(re == r.map { case (k, v) => k -> v._4 })
  }

  test("transitions: consecutive pairs per user, ties broken by id, probs sum to 1") {
    val ev = Seq(
      // u1: view@100 -> click@200 -> view@300
      (1L, 1L, 100L, "view"), (2L, 1L, 200L, "click"), (3L, 1L, 300L, "view"),
      // u2: tie at ts=100 resolved by event_id (4 before 5): click -> view
      (4L, 2L, 100L, "click"), (5L, 2L, 100L, "view"),
      // u3: single event -> no pair
      (6L, 3L, 50L, "purchase"))
      .toDF("event_id", "user_id", "ts_us", "event_type")
    val r = operators.Transitions.transitionMatrix(ev,
        "user_id", "ts_us", "event_id", "event_type")
      .collect().map(x => (x.getString(0), x.getString(1)) -> (x.getLong(2), x.getDouble(3)))
      .toMap
    // u1 contributes view->click and click->view; u2's tie resolves to
    // click->view (id 4 before 5); u3 has no pair
    assert(r == Map(
      ("click", "view") -> ((2L, 1.0)),
      ("view", "click") -> ((1L, 1.0))),
      s"got $r")
    // physical layout cannot change the pairs
    val re = operators.Transitions.transitionMatrix(ev.repartition(5),
        "user_id", "ts_us", "event_id", "event_type")
      .collect().map(x => (x.getString(0), x.getString(1)) -> x.getLong(2)).toMap
    assert(re == r.map { case (k, v) => k -> v._1 })
    // outgoing probabilities form a distribution per source type
    val sums = operators.Transitions.st6(spark, sf)
      .groupBy(col("from_type")).agg(sum(col("prob")).as("p"))
      .collect().map(_.getDouble(1))
    assert(sums.forall(p => math.abs(p - 1.0) < 1e-4), sums.mkString(","))
  }

  test("st14 trending: per-hour top-k, count-desc item-asc ties, k caps the cut") {
    val df = Seq(
      // hour 0: item 1 ×3, item 2 ×2, items 3,4 ×1 → top-3 = 1,2,3
      (0L, 1), (1L, 1), (2L, 1), (3L, 2), (4L, 2), (5L, 3), (6L, 4),
      // hour 1: tie between 7 and 8 → item asc picks 7 first
      (7L, 7), (8L, 8))
      .map { case (i, item) =>
        (i, new java.sql.Timestamp(3600L * 1000 * (if (i >= 7) 1 else 0) + i), s"""{"k":$item}""") }
      .toDF("event_id", "ts", "props")
    val r = operators.Activity.trendingTopK(df, k = 3).collect()
      .map(x => (x.getTimestamp(0).getTime / 3600000, x.getInt(1), x.getLong(2), x.getLong(3)))
    val h0 = r.filter(_._1 == 0).sortBy(_._4)
    assert(h0.map(t => (t._2, t._3)).toSeq == Seq((1, 3L), (2, 2L), (3, 1L)), s"got ${h0.mkString(",")}")
    val h1 = r.filter(_._1 == 1).sortBy(_._4)
    assert(h1.map(_._2).toSeq == Seq(7, 8), s"tie must break item-asc: ${h1.mkString(",")}")
  }

  test("st16 session funnel: steps only convert within a session; cross-session purchase is a 0") {
    // u1: view@0, click@10min (one session), then purchase 2h later —
    // a NEW session: session 1 reaches 2, session 2 reaches 0
    val us = 60L * 1000000L
    val df = Seq(
      (1L, 1L, 0L, "view"), (2L, 1L, 10 * us, "click"), (3L, 1L, 130 * us, "purchase"),
      // u2 converts fully inside one session
      (4L, 2L, 0L, "view"), (5L, 2L, us, "click"), (6L, 2L, 2 * us, "purchase"))
      .toDF("event_id", "user_id", "ts_us", "event_type")
      .withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")
    val path = java.nio.file.Files.createTempDirectory("graft_st16").toString
    df.write.mode("overwrite").parquet(s"$path/events.parquet")
    val r = operators.Funnel.st16(spark, path).collect()
      .map(x => (x.getLong(0), x.getLong(1)) -> x.getInt(5)).toMap
    assert(r == Map((1L, 1L) -> 2, (1L, 2L) -> 0, (2L, 1L) -> 3), s"got $r")
    // real corpus: a session-scoped full conversion implies the
    // user's global funnel also fully converts
    val sessFull = operators.Funnel.st16(spark, sf).collect()
      .filter(_.getInt(5) == 3).map(_.getLong(0)).toSet
    val globalFull = operators.Funnel.st5(spark, sf).collect()
      .filter(_.getInt(4) == 3).map(_.getLong(0)).toSet
    assert(sessFull.subsetOf(globalFull),
      s"session conversions must imply global: ${(sessFull -- globalFull).take(3)}")
  }

  test("a29 late shipments: max-reduction flag equals the EXISTS semantics on planted orders") {
    val day = 86400L * 1000000L
    val orders = Seq(
      (1L, "1-URGENT", 0L), (2L, "1-URGENT", 0L), (3L, "2-HIGH", 0L))
      .toDF("o_orderkey", "o_orderpriority", "ts_us")
      .withColumn("o_orderdate", timestamp_micros(col("ts_us"))).drop("ts_us")
    // order 1: ships at day 100 (late); order 2: day 10 (on time);
    // order 3: no lineitems at all (not late)
    val li = Seq((1L, 100L * day), (1L, 5L * day), (2L, 10L * day))
      .toDF("l_orderkey", "ship_us")
      .withColumn("l_shipdate", timestamp_micros(col("ship_us"))).drop("ship_us")
    val path = java.nio.file.Files.createTempDirectory("graft_a29").toString
    orders.write.parquet(s"$path/orders.parquet")
    li.write.parquet(s"$path/lineitem.parquet")
    val r = analytics.Queries.lateShipments(spark, path).collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(r == Map("1-URGENT" -> ((1L, 2L)), "2-HIGH" -> ((0L, 1L))), s"got $r")
  }

  test("a46 product profit: exact e4 money on planted lines, name filter excludes, nation x year grain") {
    val path = java.nio.file.Files.createTempDirectory("graft_a46").toString
    Seq((1L, "red bolt", 10.0), (2L, "red widget", 99.0))
      .toDF("p_partkey", "p_name", "p_retailprice")
      .write.parquet(s"$path/part.parquet")
    Seq((1L, 1L), (2L, 2L)).toDF("s_suppkey", "s_nationkey")
      .write.parquet(s"$path/supplier.parquet")
    Seq((1L, "N_A"), (2L, "N_B")).toDF("n_nationkey", "n_name")
      .write.parquet(s"$path/nation.parquet")
    Seq((1L, "1995-03-01"), (2L, "1996-07-01"))
      .toDF("o_orderkey", "d")
      .withColumn("o_orderdate", to_timestamp(col("d"))).drop("d")
      .write.parquet(s"$path/orders.parquet")
    Seq(
      // rev = 30.00*(1-0.10) = 27.00 → 270000 e4; cost = 1000c*60*2 = 120000
      (1L, 1L, 1L, 2.0, 30.0, 0.10),
      // rev = 15.50 → 155000 e4; cost = 1000c*60*1 = 60000
      (2L, 1L, 2L, 1.0, 15.5, 0.00),
      // widget line: excluded by the name filter entirely
      (1L, 2L, 1L, 5.0, 500.0, 0.00))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount")
      .write.parquet(s"$path/lineitem.parquet")
    val r = analytics.Queries.a46(spark, path).collect()
      .map(x => (x.getString(0), x.getInt(1)) ->
        ((x.getLong(2), x.getLong(3), x.getLong(4)))).toMap
    assert(r == Map(
      ("N_A", 1995) -> ((150000L, 270000L, 1L)),
      ("N_B", 1996) -> ((95000L, 155000L, 1L))), s"got $r")
  }

  test("a28 spend deciles: equal-population cut, monotone spend bands, full coverage") {
    val r = analytics.Queries.a28(spark, sf).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2), x.getDouble(3)))
    assert(r.map(_._1).toSeq == (1L to 10L), s"all 10 deciles: ${r.map(_._1).mkString(",")}")
    val pops = r.map(_._2)
    assert(pops.max - pops.min <= 1, s"ntile populations within 1: ${pops.mkString(",")}")
    // decile 1 is the richest band; bands must not overlap
    r.sliding(2).foreach { case Array(hi, lo) =>
      assert(hi._3 >= lo._4, s"decile ${hi._1} min ${hi._3} must be >= decile ${lo._1} max ${lo._4}")
    }
    val nCust = Tables.orders(spark, sf).select("o_custkey").distinct().count()
    assert(pops.sum == nCust, "every ordering customer lands in a decile")
  }

  test("banded rank / ntile / running sum ≡ the single-partition window spellings (r13)") {
    import org.apache.spark.sql.expressions.Window
    // 23 rows (23 % 5 = 3, so ntile's remainder buckets are exercised),
    // duplicated keys (i*7 % 9) so ties straddle the floor(key/3) band
    // boundaries, and a value column for the running sum.
    val df = (1L to 23L).map(i => (i, (i * 7 % 9).toDouble, i * 31 % 13))
      .toDF("id", "key", "cents")
    // rank: banded (coarse 3-wide bands over key) vs global window
    val ranked = analytics.Queries.bandedRowNumber(df,
      expr("floor(key / 3.0)"), Seq(col("key"), col("id")), "rk")
    val expectRk = df.withColumn("rk",
      row_number().over(Window.orderBy(col("key"), col("id"))).cast("long"))
    assert(ranked.select("id", "rk").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      expectRk.select("id", "rk").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap,
      "banded rank must be bit-equal to the global row_number")
    // ntile closed form vs Spark's ntile, remainder case included
    val nt = ranked.crossJoin(broadcast(df.agg(count(lit(1)).as("__n"))))
      .withColumn("q", analytics.Queries.ntileFromRank("rk", "__n", 5))
    val expectNt = df.withColumn("q",
      ntile(5).over(Window.orderBy(col("key"), col("id"))).cast("long"))
    assert(nt.select("id", "q").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      expectNt.select("id", "q").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap,
      "closed-form ntile must match Spark's ntile bucket for bucket")
    // running sum: banded (desc order, negated band) vs global window
    val cum = analytics.Queries.bandedRunningSum(df,
      expr("-floor(cents / 4.0)"), Seq(col("cents").desc, col("id")),
      col("cents"), "cum")
    val expectCum = df.withColumn("cum",
      sum(col("cents")).over(Window.orderBy(col("cents").desc, col("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    assert(cum.select("id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      expectCum.select("id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap,
      "banded running sum must be bit-equal to the global running sum")
    // empty-frame law: no rows, no crash
    assert(analytics.Queries.bandedRowNumber(df.filter(lit(false)),
      expr("floor(key / 3.0)"), Seq(col("key"), col("id")), "rk").count() == 0)
    // r14 (VERDICT r13 item 5) — planted WIDE-RANGE corpus: spends
    // spanning 12 orders of magnitude (every row its own $1024 band,
    // negative bands included via the desc negation) with the
    // super-band width forced to 4, so the offsets table crosses
    // MANY super-bands including the truncating-div double-width
    // bucket at zero. The two-level prefix sum must stay bit-equal
    // to the global window on both helpers.
    val wide = (1L to 40L).map(i =>
      (i, math.pow(10.0, (i % 13).toDouble) * 1024.0 + i.toDouble, i * 17 % 23))
      .toDF("id", "spend", "cents")
    val wideRk = analytics.Queries.bandedRowNumber(wide,
      expr("-floor(spend / 1024.0)"), Seq(col("spend").desc, col("id")), "rk",
      sbandWidth = 4L)
    val wideExpect = wide.withColumn("rk",
      row_number().over(Window.orderBy(col("spend").desc, col("id"))).cast("long"))
    assert(wideRk.select("id", "rk").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      wideExpect.select("id", "rk").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap,
      "wide-range banded rank must survive multi-super-band offsets bit-equal")
    val wideCum = analytics.Queries.bandedRunningSum(wide,
      expr("-floor(spend / 1024.0)"), Seq(col("spend").desc, col("id")),
      col("cents"), "cum", sbandWidth = 4L)
    val wideCumExpect = wide.withColumn("cum",
      sum(col("cents")).over(Window.orderBy(col("spend").desc, col("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    assert(wideCum.select("id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      wideCumExpect.select("id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap,
      "wide-range banded running sum must survive multi-super-band offsets bit-equal")
  }

  test("st15 attribution: latest strict-preceding touch wins; early conversions stay unattributed") {
    val df = Seq(
      // u1: view@100 → click@200 → purchase@300: credit the click
      (1L, 1L, 100L, "view"), (2L, 1L, 200L, "click"), (3L, 1L, 300L, "purchase"),
      // u1: purchase@50 before any touch: unattributed
      (0L, 1L, 50L, "purchase"),
      // u2: click and view both at ts=100 — later id (view, 6) wins;
      // the purchase shares ts=100 but has a later id, so both
      // same-ts touches still strictly precede it
      (5L, 2L, 100L, "click"), (6L, 2L, 100L, "view"), (7L, 2L, 100L, "purchase"))
      .toDF("event_id", "user_id", "ts_us", "event_type")
      .withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")
    val r = operators.Activity.lastTouchAttribution(df).collect()
      .map(x => x.getLong(0) -> ((Option(x.get(3)).map(_.asInstanceOf[Long]),
        Option(x.getAs[String]("touch_type")), x.getBoolean(6)))).toMap
    assert(r(0L) == ((None, None, false)), s"got ${r(0L)}")
    assert(r(3L) == ((Some(2L), Some("click"), true)), s"got ${r(3L)}")
    assert(r(7L) == ((Some(6L), Some("view"), true)), s"got ${r(7L)}")
  }

  test("st10 disorder: lateness measured against the running max in arrival order") {
    // arrival order = event_id; ts regresses at event 2 (10→5) and
    // event 5 (30→7): two late events, worst regression 30-7=23
    val df = Seq((1L, 10L, 100L), (2L, 5L, 100L), (3L, 20L, 100L),
                 (4L, 30L, 100L), (5L, 7L, 100L), (6L, 50L, 200L))
      .toDF("event_id", "ts_us", "user_id")
      .withColumn("ts", timestamp_micros(col("ts_us")))
    val r = operators.Activity.disorderAudit(df).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    assert(r(100L) == ((5L, 2L, 23L)), s"got ${r(100L)}")
    assert(r(200L) == ((1L, 0L, 0L)), s"got ${r(200L)}")
  }

  test("st19 streaks: consecutive-day runs fold; repeat visits collapse; singletons count") {
    // user 1: days {d, d+1, d+2, d+4} (day d visited twice) →
    // 4 active days, runs {3, 1} → 2 streaks, longest 3.
    // user 2: one day → 1/1/1. null users drop.
    val day = 86400000000L // µs
    val df = Seq(
      (1L, 1L * day), (1L, 1L * day + 5L), (1L, 2L * day), (1L, 3L * day),
      (1L, 5L * day), (2L, 9L * day))
      .toDF("user_id", "ts_us")
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .union(Seq((Option.empty[Long], 0L)).toDF("user_id", "ts_us")
        .withColumn("ts", timestamp_micros(col("ts_us"))))
    val r = operators.Activity.activityStreaks(df).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    assert(r.size == 2, s"null user must drop: $r")
    assert(r(1L) == ((4L, 2L, 3L)), s"got ${r(1L)}")
    assert(r(2L) == ((1L, 1L, 1L)), s"got ${r(2L)}")
  }

  test("st20 returning users: 7-day lookback, window edge excluded, new+returning=dau") {
    val day = 86400000000L
    // u1 active d1,d2 → returning on d2; u2 d1 only; u3 d1 and d9
    // (8-day gap — outside the 7-day lookback, so NOT returning)
    val df = Seq((1L, 1L * day), (1L, 2L * day), (2L, 1L * day),
                 (3L, 1L * day), (3L, 9L * day))
      .toDF("user_id", "ts_us")
      .withColumn("ts", timestamp_micros(col("ts_us")))
    val r = operators.Activity.returningUsers(df).collect()
      .map(x => x.getDate(0).toLocalDate.getDayOfMonth ->
        ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    assert(r(2) == ((3L, 0L, 3L)), s"day1 all new: ${r(2)}")     // 1970-01-02
    assert(r(3) == ((1L, 1L, 0L)), s"day2 u1 returns: ${r(3)}")
    assert(r(10) == ((1L, 0L, 1L)), s"day9 u3 outside window: ${r(10)}")
  }

  test("st21 gap stats: lead-diff gaps per user, attributed to the earlier event's type") {
    // u1: a@0 → b@10s → a@40s: gaps a→10s, b→30s. u2: single event,
    // no gap. Terminal events contribute nothing (right-censored).
    val df = Seq((1L, 100L, 0L, "a"), (2L, 100L, 10000000L, "b"),
                 (3L, 100L, 40000000L, "a"), (4L, 200L, 5L, "a"))
      .toDF("event_id", "user_id", "ts_us", "event_type")
      .withColumn("ts", timestamp_micros(col("ts_us")))
    val r = operators.Activity.gapStats(df).collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getDouble(2), x.getDouble(5)))).toMap
    assert(r("a") == ((1L, 10.0, 10.0)), s"got ${r("a")}")
    assert(r("b") == ((1L, 30.0, 30.0)), s"got ${r("b")}")
  }

  test("st11 watermark sim: drops priced against batch-boundary watermark, first batch immune") {
    // batchSize=2 → batches {0:(e0,e1)} {1:(e2,e3)} {2:(e4,e5)}.
    // batch 0 has no watermark (nothing drops). watermark base for
    // batch 1 = max(100,200)=200: e2 ts=50 drops at delay 0 (200>50)
    // and at delay 100 (100>50); e3 ts=150 drops only at delay 0.
    // base for batch 2 = max(200,150)=200: e4 ts=190 drops at delay 0
    // only (200-100=100 < 190); e5 ts=500 never drops.
    val df = Seq((0L, 100L), (1L, 200L), (2L, 50L), (3L, 150L),
                 (4L, 190L), (5L, 500L))
      .toDF("event_id", "ts_us")
      .withColumn("ts", timestamp_micros(col("ts_us") * 1000000L))
    val r = operators.Activity.watermarkSim(df, delaysSec = Seq(0, 100),
        batchSize = 2, tsCol = "ts")
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(r(0L) == ((6L, 3L)), s"got ${r(0L)}")
    assert(r(100L) == ((6L, 1L)), s"got ${r(100L)}")
  }

  test("st13 funnel timing: eligibility chains, rates and exact quartiles from a hand funnel") {
    // 4 users entered step1; 3 converted to step2 with delays 10,20,30
    // (p25/50/75 = 15/20/25); 1 of the 3 converted to step3, delay 5
    val f = Seq(
      (1L, Some(100L), Some(110L), Some(115L)),
      (2L, Some(100L), Some(120L), None),
      (3L, Some(100L), Some(130L), None),
      (4L, Some(100L), None, None))
      .toDF("user_id", "step1_ts", "step2_ts", "step3_ts")
    val r = operators.Funnel.funnelTiming(f).collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2), x.getDouble(3),
        x.getDouble(4), x.getDouble(5), x.getDouble(6)))).toMap
    assert(r("step1_to_step2") == ((4L, 3L, 0.75, 15.0, 20.0, 25.0)),
      s"got ${r("step1_to_step2")}")
    assert(r("step2_to_step3") == ((3L, 1L, 0.333333, 5.0, 5.0, 5.0)),
      s"got ${r("step2_to_step3")}")
  }

  test("st12 cusum: finds the planted level shift at the exact boundary day") {
    // series 'a': value 10 for days 1-4, then 20 for days 5-8 — the
    // argmax split must land on day 4 with shift +10; series 'b' is
    // flat so the score is ~0 and shift 0 (argmax ties → earliest day)
    val rows = (1 to 8).flatMap { d =>
      val ts = java.sql.Timestamp.valueOf(f"2024-01-0$d 12:00:00")
      Seq(("a", ts, if (d <= 4) 10.0 else 20.0), ("b", ts, 7.0))
    }
    val df = rows.toDF("event_type", "ts", "value")
    val r = operators.Activity.cusumChangepoint(df).collect()
      .map(x => x.getString(0) -> ((x.getDate(1).toString, x.getLong(2),
        x.getDouble(3), x.getDouble(4), x.getDouble(5)))).toMap
    assert(r("a") == (("2024-01-04", 8L, 10.0, 20.0, 10.0)), s"got ${r("a")}")
    assert(r("b") == (("2024-01-01", 8L, 7.0, 7.0, 0.0)), s"got ${r("b")}")
  }

  test("a20 co-occurrence: cap bounds a hot user, counts respect marginals, layout-invariant") {
    // hot user 1 touches 30 items; cap 3 keeps only their 3 most
    // frequent (items 0,1,2 — seen twice; the 27 singletons lose the
    // count-desc tie-break), so pairs from user 1 are C(3,2)=3.
    // user 2 contributes items 0,1 → one more pair (0,1).
    val rows =
      (0 until 30).map(i => (1L, i)) ++ Seq((1L, 0), (1L, 1), (1L, 2)) ++
        Seq((2L, 0), (2L, 1))
    val ev = rows.zipWithIndex.map { case ((u, k), i) =>
      (i.toLong, u, s"""{"k": $k}""") }.toDF("event_id", "user_id", "props")
    val r = analytics.Queries.itemCooccurrence(ev, cap = 3).collect()
      .map(x => (x.getInt(0), x.getInt(1)) -> x.getLong(2)).toMap
    assert(r == Map((0, 1) -> 2L, (0, 2) -> 1L, (1, 2) -> 1L), s"got $r")
    // real table: n_cooccur can never exceed either item's user count
    val full = analytics.Queries.a20(spark, sf)
    val bad = full.filter(col("pmi") > lit(0.0001 + math.log(150.0))).count() +
      full.filter(col("n_cooccur") <= 0).count()
    assert(bad == 0)
    val again = analytics.Queries.itemCooccurrence(
      Tables.events(spark, sf).repartition(7)).collect()
      .map(x => (x.getInt(0), x.getInt(1)) -> (x.getLong(2), x.getDouble(3))).toMap
    val base = full.collect()
      .map(x => (x.getInt(0), x.getInt(1)) -> (x.getLong(2), x.getDouble(3))).toMap
    assert(again == base, "pair set must be invariant under repartitioning")
  }

  test("rfm segmentation: planted quintiles, cent-exact spend, right segment cells") {
    // 5 customers, one order each except cust 1 (two orders). Dates
    // spaced so recency order is custkey order; spend reversed.
    val orders = Seq(
      (1L, 1L, "2024-01-10", 100.10), (2L, 1L, "2024-01-09", 50.05),
      (3L, 2L, "2024-01-08", 400.00), (4L, 3L, "2024-01-06", 300.00),
      (5L, 4L, "2024-01-04", 200.00), (6L, 5L, "2024-01-02", 500.00))
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .withColumn("o_orderdate", col("o_orderdate").cast("timestamp"))
    val cells = analytics.Queries.rfmSegments(orders)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
        (r.getLong(3), r.getDouble(4), r.getDouble(5))).toMap
    // recency: cust1=0d(r1) cust2=2d(r2) cust3=4d(r3) cust4=6d(r4) cust5=8d(r5)
    // freq: cust1=2(f1), others 1 -> f ranks by custkey tie: c2=f2 c3=f3 c4=f4 c5=f5
    // monetary: c5=500(m1) c2=400(m2) c3=300(m3) c4=200(m4) c1=150.15(m5)
    assert(cells.keySet == Set((1L,1L,5L), (2L,2L,2L), (3L,3L,3L), (4L,4L,4L), (5L,5L,1L)),
      s"got ${cells.keySet}")
    assert(cells((1L,1L,5L)) == ((1L, 0.0, 150.15)), s"got ${cells((1L,1L,5L))}")
    assert(cells((5L,5L,1L)) == ((1L, 8.0, 500.0)))
  }

  test("abc classes: planted 80/95 boundaries land exactly, integer boundary law") {
    // spends 800, 150, 50 (total 1000): cum 800 (=80% -> A, boundary
    // INCLUSIVE), 950 (=95% -> B, inclusive), 1000 -> C
    val orders = Seq(
      (1L, 1L, 800.00), (2L, 2L, 150.00), (3L, 3L, 50.00))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val r = analytics.Queries.abcClasses(orders).collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getDouble(2), x.getDouble(3)))).toMap
    assert(r == Map(
      "A" -> ((1L, 800.0, 0.8)), "B" -> ((1L, 150.0, 0.15)), "C" -> ((1L, 50.0, 0.05))),
      s"got $r")
    // real table: classes partition all customers, shares sum to 1
    val full = analytics.Queries.a36(spark, sf).collect()
    assert(math.abs(full.map(_.getDouble(3)).sum - 1.0) < 1e-4)
  }

  test("interval merge: overlap/touch/disjoint islands, closed-interval law") {
    // key 1: [0,10] [5,20] overlap -> island; [20,25] touches (s == prior
    // max e) -> merges; [40,50] disjoint -> new island.
    // key 2: out-of-order input, single chain via running max: [0,100]
    // swallows [10,20] and [30,40] (prior MAX end, not prior row's end).
    val iv = Seq(
      (1L, 0L, 10L, 1L), (1L, 5L, 20L, 2L), (1L, 20L, 25L, 3L), (1L, 40L, 50L, 4L),
      (2L, 30L, 40L, 5L), (2L, 0L, 100L, 6L), (2L, 10L, 20L, 7L))
      .toDF("k", "s", "e", "id")
    val r = operators.Intervals.mergeIntervals(iv, "k", "s", "e", "id")
      .orderBy("k", "island_seq")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))
    assert(r.toSeq == Seq(
      (1L, 1L, 0L, 25L, 3L), (1L, 2L, 40L, 50L, 1L),
      (2L, 1L, 0L, 100L, 3L)), s"got ${r.toSeq}")
    // covered = end - start
    val cov = operators.Intervals.mergeIntervals(iv, "k", "s", "e", "id")
      .select(sum(col("covered"))).collect()(0).getLong(0)
    assert(cov == 25L + 10L + 100L)
  }

  test("dwell time: terminal events excluded, exact long sums, per-state means") {
    // user 10: a@0 -> b@4s -> a@10s -> (end, censored). user 11: b@0 -> b@1s -> (end).
    val ev = Seq(
      (1L, 10L, 0L, "a"), (2L, 10L, 4000000L, "b"), (3L, 10L, 10000000L, "a"),
      (4L, 11L, 0L, "b"), (5L, 11L, 1000000L, "b"))
      .toDF("event_id", "user_id", "ts_us", "event_type")
    val r = operators.Intervals.dwellByState(ev, "user_id", "ts_us", "event_id", "event_type")
      .collect().map(x => x.getString(0) -> (x.getLong(1), x.getLong(2), x.getDouble(3))).toMap
    // a: dwell 4s (the 10s 'a' is terminal -> excluded); b: 6s + 1s
    assert(r == Map("a" -> ((1L, 4000000L, 4.0)), "b" -> ((2L, 7000000L, 3.5))), s"got $r")
  }

  test("interval merge / dwell plans: one key shuffle, island agg rides it, no library sort") {
    val ev = Tables.events(spark, sf)
      .withColumn("start_us", unix_micros(col("ts")))
      .withColumn("end_us", col("start_us") + lit(300000000L))
    val merged = operators.Intervals.mergeIntervals(ev, "user_id", "start_us", "end_us", "event_id")
    merged.collect()
    val plan = merged.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
    val hashes = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(hashes == 1,
      s"windows AND the (key, island)-prefixed agg must ride ONE user_id exchange, got $hashes:\n$plan")
    assert(!plan.contains("Exchange rangepartitioning"),
      s"library fn must not sort its result:\n$plan")
    val dwell = operators.Intervals.dwellByState(
      ev.withColumn("ts_us", unix_micros(col("ts"))), "user_id", "ts_us", "event_id", "event_type")
    dwell.collect()
    val dplan = dwell.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
    assert(!dplan.contains("Exchange rangepartitioning"), s"no sort in library fn:\n$dplan")
    val dh = "Exchange hashpartitioning".r.findAllIn(dplan).length
    assert(dh <= 2, s"dwell: key shuffle + tiny state agg only, got $dh:\n$dplan")
  }

  test("st27 histogram: spans conserve total swept time; levels non-negative; zero level present") {
    val ev = Tables.events(spark, sf)
      .withColumn("ts_us", unix_micros(col("ts")))
    val r = operators.Intervals.concurrencyHistogram(ev, "ts_us", 300000000L)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(r.forall(_._1 >= 0), "sweep-line level can never go negative")
    assert(r.exists(_._1 == 0L), "gaps between activity must appear as level-0 spans")
    // conservation: the spans tile [first instant, last instant] exactly
    val bounds = ev.agg(min(col("ts_us")), max(col("ts_us")) + lit(300000000L)).head()
    assert(r.map(_._3).sum == bounds.getLong(1) - bounds.getLong(0),
      "per-level durations must sum to the full swept range")
    // conservation of spans: one per state-change instant minus the last
    val nInstants = operators.Intervals.intervalDeltas(ev, "ts_us", 300000000L)
      .select(col("us")).distinct().count()
    assert(r.map(_._2).sum == nInstants - 1)
  }

  test("SeriesGuard: planted hot key fails NAMED, clean keys fold unchanged (st29/st5 valve)") {
    val rows = (1 to 20).map(i => ("hot", i.toLong, i.toLong, (i * 4).toLong)) ++
      (1 to 4).map(i => ("cold", i.toLong, 100L + i, (i * 4).toLong))
    val df = rows.toDF("user_id", "ts_us", "event_id", "v")
    // 1. the valve fires with a named, pointing error — never a
    //    cryptic aggregation-buffer OOM
    val ex = intercept[Throwable] {
      operators.Activity.ewmaState(df, "user_id", "ts_us", "event_id",
        col("v"), maxSeriesLen = 10).collect()
    }
    def chain(t: Throwable): String =
      if (t == null) "" else s"${t.getMessage} | ${chain(t.getCause)}"
    val m = chain(ex)
    assert(m.contains("maxSeriesLen=10"), s"valve must name itself: $m")
    assert(m.contains("hot") && m.contains("20 events"),
      s"valve must name the offending key and its size: $m")
    assert(m.contains("StatefulTwins"), s"valve must point at the streaming twin: $m")
    // 2. under the valve the guard is a no-op: identical fold results
    val guarded = operators.Activity.ewmaState(df, "user_id", "ts_us",
      "event_id", col("v"), maxSeriesLen = 100)
    val default = operators.Activity.ewmaState(df, "user_id", "ts_us",
      "event_id", col("v"))
    assert(guarded.exceptAll(default).isEmpty && default.exceptAll(guarded).isEmpty)
    // spot-check the cold key's EWMA (shift=2): s=4, 4+(8-4)/4=5, 5+(12-5)/4 floor=6, 6+(16-6)/4 floor=8
    val cold = guarded.filter(col("user_id") === "cold").head()
    assert(cold.getAs[Long]("n_obs") == 4 && cold.getAs[Long]("ewma_e6") == 8L)
    // 3. the funnel fold shares the contract and the valve
    val fEx = intercept[Throwable] {
      val ev = (1 to 30).map(i =>
        (7L, i.toLong, i.toLong, if (i % 3 == 0) "view" else "click"))
        .toDF("user_id", "ts_us", "event_id", "event_type")
      operators.Funnel.funnel3(ev, "user_id", "ts_us", "event_id",
        "event_type", ("view", "click", "purchase"), maxSeriesLen = 10).collect()
    }
    assert(chain(fEx).contains("maxSeriesLen=10"), s"funnel valve: ${chain(fEx)}")
    // 4. a NULL hot key never reaches the valve: anonymous (null-key)
    //    observations are not a series — the null-key law
    //    (DegenerateSpec's dirty rung) excludes them BEFORE the
    //    guard, so a flood of null-key rows can neither trip the
    //    valve nor form a phantom actor; only real keys fold.
    val nullRows = (1 to 20).map(i =>
      (Option.empty[String], i.toLong, i.toLong, (i * 4).toLong)) ++
      (1 to 4).map(i => (Some("cold"), i.toLong, 100L + i, (i * 4).toLong))
    val nOut = operators.Activity.ewmaState(
      nullRows.toDF("user_id", "ts_us", "event_id", "v"),
      "user_id", "ts_us", "event_id", col("v"), maxSeriesLen = 10).collect()
    assert(nOut.length == 1 && nOut.head.getAs[String]("user_id") == "cold",
      s"null-key rows must be excluded, real keys kept: ${nOut.mkString(",")}")
  }
}
