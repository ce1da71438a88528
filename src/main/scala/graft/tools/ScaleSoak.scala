package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}

/** Derived-scale soak (VERDICT r6 lead item): the 100×-scale story
  * rests on plan shape — this MEASURES it at the next rung this
  * environment admits. Without touching /root/testdata, derive a
  * `factor`× corpus under target/ (union of re-keyed copies:
  * doc_id/user_id/orderkey shifted into disjoint ranges, sources
  * re-labeled per copy, timestamps jittered seconds) and run the
  * scale-sensitive operators on it with SPARK-INTERNAL parity
  * cross-checks — each banded/bounded/capped spelling against the
  * naive global spelling it replaces, proving the decomposition is
  * exact at 10× while timing both.
  *
  * Usage: runMain graft.tools.ScaleSoak [sfDir] [outRoot] [factor]
  * Prints one JSON line per check; summary goes to SCALE.md by hand.
  */
object ScaleSoak {

  def deriveCorpus(spark: SparkSession, sfDir: String, outRoot: String,
                   factor: Int): Unit = {
    // Gate on a _DONE marker written AFTER the last table, not on the
    // first table's existence: an interrupted derivation (documents
    // written, the rest missing) must re-derive, not half-skip
    // forever (ADVICE r7 item 5).
    val done = Paths.get(s"$outRoot/_DERIVED_DONE")
    if (Files.exists(done)) return
    val docs = Tables.documents(spark, sfDir)
    (0 until factor).map { i =>
      docs.withColumn("doc_id", col("doc_id") + lit(i * 10000000L))
        .withColumn("source",
          if (i == 0) col("source") else concat(col("source"), lit(s"_$i")))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$outRoot/documents.parquet")
    val ev = Tables.events(spark, sfDir)
    (0 until factor).map { i =>
      ev.withColumn("event_id", col("event_id") + lit(i * 1000000000L))
        .withColumn("user_id", col("user_id") + lit(i * 1000000L))
        .withColumn("ts", col("ts") + expr(s"INTERVAL $i SECONDS"))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$outRoot/events.parquet")
    val li = Tables.lineitem(spark, sfDir)
    (0 until factor).map { i =>
      li.withColumn("l_orderkey", col("l_orderkey") + lit(i * 100000000L))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$outRoot/lineitem.parquet")
    // Embeddings: re-keyed copies with small DETERMINISTIC component
    // jitter (murmur3 of (vec_id, component, copy) → ±1%) so copies
    // land near — but not on — their original: cells grow denser
    // without collapsing duplicates into single points, the realistic
    // shape for IVF cell-size skew at scale (VERDICT r7 lead item).
    val emb = Tables.embeddings(spark, sfDir)
    (0 until factor).map { i =>
      emb.withColumn("vec_id", col("vec_id") + lit(i * 10000000L))
        .withColumn("embedding",
          if (i == 0) col("embedding")
          else expr(s"transform(embedding, (x, j) -> cast(" +
            s"x + (pmod(hash(vec_id, j, $i), 1024) - 512) / 51200.0 as float))"))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$outRoot/embeddings.parquet")
    Files.writeString(done, "ok")
  }

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** Exact frame equality, computed distributed (no driver compare). */
  private def sameRows(a: DataFrame, b: DataFrame): Boolean =
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  private def report(check: String, rows: Long, operatorS: Double,
                     naiveS: Double, parity: Boolean, note: String): Unit =
    println(s"""{"check":"$check","rows":$rows,""" +
      f""""operator_s":$operatorS%.2f,"naive_s":$naiveS%.2f,""" +
      s""""parity":$parity,"note":"$note"}""")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outRoot = if (args.length > 1) args(1) else "target/scale10"
    val factor = if (args.length > 2) args(2).toInt else 10
    // df cap for the d4 join leg: at high factors the UNCAPPED join is
    // deliberately infeasible locally (that's the point of the valve);
    // pass a binding cap so the bounded join can still run and be timed
    val d4Cap = if (args.length > 3) args(3).toLong else 1000L
    val spark = GraftSession.get("graft-scale-soak")
    spark.sparkContext.setLogLevel("WARN")
    val (_, deriveS) = timed(deriveCorpus(spark, sfDir, outRoot, factor))
    println(f"""{"check":"derive","factor":$factor,"wall_s":$deriveS%.2f}""")

    val docs = Tables.documents(spark, outRoot)
    val events = Tables.events(spark, outRoot)
    val li = Tables.lineitem(spark, outRoot)
    val nDocs = docs.count(); val nEv = events.count(); val nLi = li.count()

    // -- x9b: banded token-budget window ≡ global window ------------
    val scored = graft.text.TextAnalysis.qualityScore(docs)
      .filter(col("quality_score").isNotNull)
    val budgets = Map("src0" -> 6000L)
    val (saltedN, saltedS) = timed(
      graft.text.Curation.tokenBudgetMixSalted(scored, budgets, 3000L).count())
    val (globalN, globalS) = timed(
      graft.text.Curation.tokenBudgetMix(scored, budgets, 3000L).count())
    val x9bPar = sameRows(
      graft.text.Curation.tokenBudgetMixSalted(scored, budgets, 3000L)
        .select("doc_id", "source", "cum_tokens"),
      graft.text.Curation.tokenBudgetMix(scored, budgets, 3000L)
        .select("doc_id", "source", "cum_tokens"))
    report("x9b_banded_budget", saltedN, saltedS, globalS, x9bPar,
      s"admitted=$saltedN/$globalN docs=$nDocs")

    // -- x10: two-phase banded rank ≡ true global row_number --------
    val (x10N, x10S) = timed(
      graft.text.Curation.shufflePositions(docs.select("doc_id"), "doc_id").count())
    def x10Naive: DataFrame = docs.select(col("doc_id"))
      .withColumn("shuffle_key",
        graft.functions.GraftFunctions.mix64(col("doc_id").cast("long")))
      .withColumn("shuffle_pos",
        row_number().over(Window.orderBy(col("shuffle_key"), col("doc_id")))
          .cast("long"))
    val (x10nN, x10nS) = timed(x10Naive.count())
    val x10Par = sameRows(
      graft.text.Curation.shufflePositions(docs.select("doc_id"), "doc_id")
        .select("doc_id", "shuffle_pos"),
      x10Naive.select("doc_id", "shuffle_pos"))
    report("x10_banded_rank", x10N, x10S, x10nS, x10Par && x10N == x10nN,
      "naive = single-partition global window")

    // -- x15: banded source interleave ≡ per-source global windows --
    val (x15N, x15S) = timed(graft.text.Curation.interleaveBySource(docs).count())
    def x15Naive: DataFrame = {
      val keyed = docs.select(col("doc_id"), col("source"))
        .withColumn("shuffle_key",
          graft.functions.GraftFunctions.mix64(col("doc_id").cast("long")))
      val srcIdx = keyed.select(col("source")).distinct()
        .withColumn("__src_idx",
          (row_number().over(Window.orderBy(col("source"))) - 1).cast("long"))
      val n = srcIdx.count()
      keyed
        .withColumn("__rank",
          (row_number().over(Window.partitionBy(col("source"))
            .orderBy(col("shuffle_key"), col("doc_id"))) - 1).cast("long"))
        .join(broadcast(srcIdx), Seq("source"))
        .withColumn("pos", col("__rank") * lit(n) + col("__src_idx"))
        .select(col("doc_id"), col("source"), col("pos"))
    }
    val (x15nN, x15nS) = timed(x15Naive.count())
    val x15Par = sameRows(graft.text.Curation.interleaveBySource(docs), x15Naive)
    report("x15_interleave", x15N, x15S, x15nS, x15Par && x15N == x15nN,
      "naive = unbanded per-source windows")

    // -- x17: banded length curriculum ≡ global (len, key) window ---
    val (x17N, x17S) = timed(graft.text.Curation.lengthCurriculum(docs).count())
    def x17Naive: DataFrame = docs.select(col("doc_id"), col("text"))
      .withColumn("n_tokens",
        size(graft.text.TextAnalysis.tokens(col("text"))).cast("long"))
      .withColumn("shuffle_key",
        graft.functions.GraftFunctions.mix64(col("doc_id").cast("long")))
      .withColumn("curriculum_pos",
        row_number().over(Window.orderBy(col("n_tokens"),
          col("shuffle_key"), col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("n_tokens"), col("curriculum_pos"))
    val (x17nN, x17nS) = timed(x17Naive.count())
    val x17Par = sameRows(graft.text.Curation.lengthCurriculum(docs), x17Naive)
    report("x17_curriculum", x17N, x17S, x17nS, x17Par && x17N == x17nN,
      "naive = single-partition global (len,key) window")

    // -- st8: bounded ≤7-day fan-out ≡ grid between-join replay -----
    val (st8N, st8S) = timed(
      graft.operators.Activity.rollingActiveUsers(events, "user_id", "ts").count())
    def st8Naive: DataFrame = {
      val days = events.filter(col("user_id").isNotNull)
        .select(to_date(col("ts")).as("day"), col("user_id").as("u")).distinct()
      val grid = days.select(col("day").as("g_day")).distinct()
      grid.join(days,
          col("day").between(date_sub(col("g_day"), 6), col("g_day")))
        .groupBy(col("g_day"))
        .agg(countDistinct(when(col("day") === col("g_day"), col("u"))).as("dau"),
          countDistinct(col("u")).as("wau"))
        .filter(col("dau") > 0)
        .select(col("g_day").as("day"), col("dau"), col("wau"),
          round(col("dau").cast("double") / col("wau"), 4).as("stickiness"))
    }
    val (st8nN, st8nS) = timed(st8Naive.count())
    val st8Par = sameRows(
      graft.operators.Activity.rollingActiveUsers(events, "user_id", "ts"),
      st8Naive)
    report("st8_bounded_fanout", st8N, st8S, st8nS, st8Par && st8N == st8nN,
      s"naive = day-grid between-join (BNLJ); events=$nEv")

    // -- d4: df-cap valve on 10x-planted boilerplate ----------------
    // every doc has `factor` byte-identical copies, so every shingle's
    // RAW df multiplies by `factor` — the mass ladder below prices the
    // naive all-docs join. Since r9 the OPERATOR collapses onto
    // byte-identical-text representatives first, so its real join
    // runs at the rep mass (reported alongside): the raw ladder is
    // the priced counterfactual the collapse removes.
    val posts = docs
      .withColumn("sh",
        graft.functions.GraftFunctions.shingle_hashes(col("text")))
      .select(col("doc_id"), explode(col("sh")).as("s"))
    val repPosts = docs
      .groupBy(md5(col("text"))).agg(min(col("doc_id")).as("doc_id"),
        first(col("text")).as("text"))
      .withColumn("sh",
        graft.functions.GraftFunctions.shingle_hashes(col("text")))
      .select(col("doc_id"), explode(col("sh")).as("s"))
    val repMass = repPosts.groupBy(col("s")).count()
      .agg(sum(expr("`count` * (`count` - 1) DIV 2"))).head().getLong(0)
    val dfs = posts.groupBy(col("s")).count().persist()
    val ladder = Seq(250L, 500L, 1000L)
    val candAggs = sum(col("count") * (col("count") - 1) / 2).as("__unc") +:
      ladder.map(c => sum(when(col("count") <= c,
        col("count") * (col("count") - 1) / 2).otherwise(0L)).as(s"__c$c"))
    val candRow = dfs.agg(candAggs.head, candAggs.tail: _*).head()
    val maxDf = dfs.agg(max(col("count"))).head().getLong(0)
    dfs.unpersist()
    val cands = candRow.toSeq.map(v => BigDecimal(v.toString).toLong)
    val (d4N, d4S) = timed(
      graft.dedup.Dedup.exactJaccardPairs(docs, maxDf = d4Cap).count())
    report("d4_df_cap", d4N, d4S, -1.0,
      cands.tail.zip(cands.tail.tail :+ cands.head).forall { case (a, b) => a <= b },
      s"join_cap=$d4Cap max_df=$maxDf rep_mass=$repMass (operator, collapse-first) " +
        s"raw candidates uncapped=${cands.head} " +
        ladder.zip(cands.tail).map { case (c, v) => s"cap$c=$v" }.mkString(" "))

    // -- d2 vs d2b: signature shuffle vs signature-free joinback ----
    // (10x rung only: the signature compute dominates above that and
    // the comparison is already established)
    if (nDocs <= 100000) {
      val (d2N, d2S) = timed(graft.dedup.Dedup.minhashLshPairs(docs).count())
      val (d2bN, d2bS) = timed(
        graft.dedup.Dedup.minhashLshPairsJoinback(docs).count())
      val d2Par = d2N == d2bN && sameRows(
        graft.dedup.Dedup.minhashLshPairs(docs),
        graft.dedup.Dedup.minhashLshPairsJoinback(docs))
      report("d2b_joinback", d2bN, d2bS, d2S, d2Par,
        "operator=signature-free joinback, naive=16KB-signature band shuffle")
    }

    // -- d5-LSH + m11 on BYTE-IDENTICAL copies (VERDICT r9 item 2) --
    // The derived corpus above MUTATES every embedding copy (±1%
    // jitter — the realistic IVF cell-density shape), so the byte-
    // identical-vector regime — the duplication law that detonated
    // d2's banding at 50× — was unexercised for the vector family.
    // Derive it in-plan here (re-keyed copies, embedding untouched;
    // copy 0 keeps the base ids, so family representatives ARE the
    // base vectors) and run the collapse-first operator. Parity is
    // exact and driver-computable: rep pairs ≡ base pairs, each fans
    // out factor² member pairs, plus C(factor, 2) identical pairs per
    // base vector.
    val embBase = Tables.embeddings(spark, sfDir)
    val embIdent = (0 until factor).map { i =>
      embBase.withColumn("vec_id", col("vec_id") + lit(i * 10000000L))
    }.reduce(_ unionByName _)
    val nVecBase = embBase.count()
    val (d5BaseN, d5BaseS) = timed(
      graft.dedup.Dedup.embeddingNearDupsLsh(embBase).count())
    val (d5N, d5S) = timed(
      graft.dedup.Dedup.embeddingNearDupsLsh(embIdent).count())
    val d5Expected = d5BaseN * factor.toLong * factor +
      nVecBase * (factor.toLong * (factor - 1) / 2)
    report("d5_ident_embeddings", d5N, d5S, d5BaseS, d5N == d5Expected,
      s"factor=$factor vectors=${nVecBase * factor} base_pairs=$d5BaseN " +
        s"expected=$d5Expected (naive_s = the 1x base run)")

    // m11 on the byte-identical DOC corpus (the derived docs are exact
    // copies by construction): group-based clip report, never pair
    // joins. Every (fingerprint, frame) group holds ≥ factor ≥ 2 docs,
    // so the scaled minDocs=2 report must equal the BASE corpus's full
    // clip-key census (minDocs=1) in group count — a content-diversity
    // invariant duplication cannot move.
    val (m11N, m11S) = timed(
      graft.multimodal.Multimodal.clipDedupReport(docs).count())
    val (m11BaseN, m11BaseS) = timed(
      graft.multimodal.Multimodal.clipDedupReport(
        Tables.documents(spark, sfDir), minDocs = 1).count())
    report("m11_ident_clips", m11N, m11S, m11BaseS, m11N == m11BaseN,
      s"factor=$factor scaled-minDocs2 groups vs base census=$m11BaseN " +
        s"(naive_s = the 1x census run)")

    // s15 on the byte-identical vector corpus — MEASUREMENT leg
    // (10× rung only): the within-cell kNN join's candidate COMPUTE
    // grows copies² by contract (the documented cell-bounded
    // deliberate quadratic; its window exchange is already narrow —
    // scored rows only — and production re-derives numCells from
    // n/targetCellSize where the entry's fixed 16 does not). This
    // times that contract on the duplication-law corpus so the cost
    // curve is measured, not assumed. Exact row invariant at
    // factor > k: every vector's own family fills its neighbor list,
    // so the graph is exactly n·k rows.
    if (factor <= 10) {
      val (s15N, s15S) = timed(
        graft.similarity.Similarity.knnGraph(embIdent).count())
      report("s15_ident_knn_graph", s15N, s15S, -1.0,
        s15N == nVecBase * factor * 5L,
        s"factor=$factor within-cell compute grows copies^2 by contract; " +
          s"expected=${nVecBase * factor * 5L} rows (n*k)")
    }

    // -- skew: salted join on a planted hot key ≡ plain shuffle join
    // one user owns 20% of the scaled event stream (the planted-skew
    // shape SkewStreamSpec pins at spec size) — join events⋈per-user
    // dims salted vs plain, prove row-identical, time both
    val hotUser = -1L
    val skewed = events.select(col("event_id"),
        when(pmod(col("event_id"), lit(5)) === 0, lit(hotUser))
          .otherwise(col("user_id")).as("user_id"),
        col("value"))
    val dims = skewed.select(col("user_id")).distinct()
      .withColumn("segment", pmod(col("user_id"), lit(7)))
    // force a SHUFFLE join (the skew-relevant case; broadcast would
    // hide the hot partition) on both spellings
    val plainJ = skewed.join(dims.hint("shuffle_hash"), Seq("user_id"))
    val saltedJ = graft.operators.Skew.saltedJoin(
      skewed, dims.hint("shuffle_hash"), "user_id", 16, col("event_id"))
    val (plainN, plainS) = timed(plainJ.count())
    val (saltN, saltS) = timed(saltedJ.count())
    val skewPar = saltN == plainN && sameRows(
      saltedJ.select("user_id", "event_id", "segment"),
      plainJ.select("user_id", "event_id", "segment"))
    report("skew_salted_join", saltN, saltS, plainS, skewPar,
      s"hot key holds 20% of $nEv events; salt n=16")

    // -- st24: (day, hour)-banded sweep-line prefix sum ≡ global ----
    // running sum in ONE partition (the naive spelling every SQL
    // cookbook gives) — parity proves the offset decomposition exact
    // at 10×, the timing shows what the band shuffle buys
    val (st24N, st24S) = timed(
      graft.operators.Intervals.peakConcurrency(
        events.withColumn("ts_us", unix_micros(col("ts"))),
        "ts_us", 300000000L).count())
    def st24Naive: DataFrame = {
      val perUs = graft.operators.Intervals.intervalDeltas(
          events.withColumn("ts_us", unix_micros(col("ts"))),
          "ts_us", 300000000L)
        .groupBy(col("us")).agg(sum(col("delta")).as("net"))
      val run = perUs
        .withColumn("running", sum(col("net")).over(Window.orderBy(col("us"))
          .rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("day", to_date(timestamp_micros(col("us"))))
      val pk = run.groupBy(col("day")).agg(max(col("running")).as("peak_concurrency"))
      run.join(pk, Seq("day"))
        .filter(col("running") === col("peak_concurrency"))
        .groupBy(col("day"), col("peak_concurrency"))
        .agg(min(col("us")).as("peak_at_us"))
        .select(col("day"), col("peak_concurrency"), col("peak_at_us"))
    }
    val (st24nN, st24nS) = timed(st24Naive.count())
    val st24Par = sameRows(
      graft.operators.Intervals.peakConcurrency(
        events.withColumn("ts_us", unix_micros(col("ts"))),
        "ts_us", 300000000L),
      st24Naive)
    report("st24_banded_sweepline", st24N, st24S, st24nS,
      st24Par && st24N == st24nN,
      "naive = single-partition global running sum")

    // -- p14 exact vs p14b sketch profile at 10x lineitem -----------
    val cols = Seq("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate", "l_linestatus")
    val liDay = li.withColumn("l_shipdate", col("l_shipdate").cast("date"))
    val (p14N, p14S) = timed(
      graft.quality.Checks.profileColumns(liDay, cols).count())
    val (p14bN, p14bS) = timed(
      graft.quality.Checks.approxProfileColumns(liDay, cols).count())
    // parity: null counts + min/max identical; approx distinct within 5%
    val ex = graft.quality.Checks.profileColumns(liDay, cols).alias("e")
    val ap = graft.quality.Checks.approxProfileColumns(liDay, cols).alias("a")
    val p14Par = ex.join(ap, col("e.col_name") === col("a.col_name"))
      .filter(col("e.n_nulls") =!= col("a.n_nulls") ||
        col("e.min_val") =!= col("a.min_val") ||
        col("e.max_val") =!= col("a.max_val") ||
        abs(col("a.n_distinct_approx") - col("e.n_distinct")) >
          col("e.n_distinct") * 0.05)
      .isEmpty
    report("p14_profile", p14N.toLong, p14bS, p14S, p14Par,
      s"operator=approx(no Expand), naive=exact(Expand); lineitem=$nLi")

    // -- t16: the bigram-LM counts frame on the byte-identical ------
    // corpus (round 11). The LM's ONLY persisted frame is
    // (w1, w2, c12); the derived docs are exact text copies, so its
    // ROW SET must equal the base corpus's exactly and every c12 must
    // scale by exactly `factor` — the boundedness invariant the
    // two-scan rewrite's 100 TB story rests on, here at soak scale
    // (TextSpec pins the same law at unit scale). The timing is the
    // full scoring pass at the rung.
    val (t16N, t16S) = timed(
      graft.text.TextAnalysis.bigramPerplexity(docs).count())
    val (t16BaseN, t16BaseS) = timed(
      graft.text.TextAnalysis.bigramPerplexity(
        Tables.documents(spark, sfDir)).count())
    val cntScaled = graft.text.TextAnalysis.bigramCounts(docs)
    val cntBase = graft.text.TextAnalysis.bigramCounts(
      Tables.documents(spark, sfDir))
    val t16Par = sameRows(
      cntScaled.select(col("w1"), col("w2"), col("c12")),
      cntBase.select(col("w1"), col("w2"),
        (col("c12") * lit(factor.toLong)).as("c12")))
    report("t16_bigram_counts_ident", t16N, t16S, t16BaseS,
      t16Par && t16N == t16BaseN * factor,
      s"factor=$factor counts rows duplication-invariant, c12 exactly " +
        s"x$factor; scored docs=$t16N (naive_s = the 1x base run)")

    spark.stop()
  }
}
