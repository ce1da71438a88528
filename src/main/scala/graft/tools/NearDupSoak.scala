package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.dedup.Dedup

/** Mutated-copy near-dup soak (VERDICT r7 item 2): ScaleSoak's
  * byte-identical copies measure the d4 valve's ARITHMETIC at scale
  * but find zero near-dup pairs under a binding cap (every shingle's
  * df is multiplied by the copy count, and recall honestly defers to
  * sf0.1). This derives a REALISTIC rung: copy i of every document
  * gets token-level edits at a fixed deterministic rate (token j of
  * copy i mutates iff murmur3(doc_id, j, i) % editMod == 0 — no
  * Date/random), so planted (original, copy) pairs sit at a known
  * jaccard band (~0.7 at editMod=16 with 3-gram shingles: shingle
  * survival (1−1/16)³ ≈ 0.82, j ≈ 0.82/1.18) instead of 1.0, and
  * recall at scale is a real measurement:
  *
  *  1. planted truth = exact shingle jaccard of every (original,
  *     copy) pair — n·(factor−1) pairs, computed by a keyed
  *     same-origin join (never all-pairs) — filtered to ≥ 0.5;
  *  2. d2 minhash-LSH and d2b joinback recall vs that truth + walls
  *     (+ pairwise parity between the two spellings);
  *  3. d4 exact-jaccard recall under the df-cap ladder — the
  *     recall-vs-candidate-mass price list the cap buys at scale;
  *  4. d15's calibration (est vs exact jaccard within tol) and d19's
  *     threshold sweep re-run on the mutated corpus.
  *
  * Usage: runMain graft.tools.NearDupSoak [sfDir] [outRoot] [factor] [editMod] [caps…]
  */
object NearDupSoak {

  private val copyShift = 10000000L

  def deriveMutated(spark: SparkSession, sfDir: String, outRoot: String,
                    factor: Int, editMod: Int): Unit = {
    val done = Paths.get(s"$outRoot/_MUTATED_DONE")
    if (Files.exists(done)) return
    val docs = Tables.documents(spark, sfDir)
    (0 until factor).map { i =>
      if (i == 0) docs
      else docs
        .withColumn("doc_id", col("doc_id") + lit(i * copyShift))
        .withColumn("source", concat(col("source"), lit(s"_$i")))
        .withColumn("text", array_join(
          expr(s"transform(split(text, '\\\\s+'), (t, j) -> " +
            s"IF(pmod(hash(doc_id, j, $i), $editMod) = 0, concat(t, 'q$i'), t))"),
          " "))
        .withColumn("n_chars", length(col("text")))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$outRoot/documents.parquet")
    Files.createDirectories(Paths.get(outRoot))
    Files.writeString(done, "ok")
  }

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outRoot = if (args.length > 1) args(1) else "target/mutated10"
    val factor = if (args.length > 2) args(2).toInt else 10
    val editMod = if (args.length > 3) args(3).toInt else 16
    val caps = if (args.length > 4) args.drop(4).map(_.toLong).toSeq
               else Seq(250L, 1000L, 4000L)
    val spark = GraftSession.get("graft-neardup-soak")
    spark.sparkContext.setLogLevel("ERROR")
    val (_, dS) = timed(deriveMutated(spark, sfDir, outRoot, factor, editMod))
    println(f"""{"check":"derive_mutated","factor":$factor,"edit_mod":$editMod,"wall_s":$dS%.2f}""")

    val docs = Tables.documents(spark, outRoot)
    val nDocs = docs.count()

    // -- 1. planted truth: exact jaccard of (original, copy) pairs --
    val sh = docs
      .withColumn("sh", graft.functions.GraftFunctions.shingle_hashes(col("text")))
      .filter(size(col("sh")) > 0)
      .select(pmod(col("doc_id"), lit(copyShift)).as("orig"),
        col("doc_id"), col("sh"))
    val base = sh.filter(col("doc_id") < copyShift)
      .select(col("orig"), col("doc_id").as("a_id"), col("sh").as("sha"))
    val copies = sh.filter(col("doc_id") >= copyShift)
      .select(col("orig"), col("doc_id").as("b_id"), col("sh").as("shb"))
    val planted = base.join(copies, Seq("orig"))
      .withColumn("__shared", size(array_intersect(col("sha"), col("shb"))))
      .withColumn("true_j", col("__shared").cast("double") /
        (size(col("sha")) + size(col("shb")) - col("__shared")))
      .select(col("a_id"), col("b_id"), col("true_j"))
      .persist()
    val nPlanted = planted.count()
    val truth = planted.filter(col("true_j") >= 0.5).persist()
    val nTruth = truth.count()
    val jStats = planted.agg(min(col("true_j")), avg(col("true_j")),
      max(col("true_j"))).head()
    println(f"""{"check":"planted_truth","planted":$nPlanted,"true_pairs_ge_05":$nTruth,""" +
      f""""j_min":${jStats.getDouble(0)}%.4f,"j_avg":${jStats.getDouble(1)}%.4f,"j_max":${jStats.getDouble(2)}%.4f,"docs":$nDocs}""")

    // restrict a found pair frame to the planted (original, copy) key
    // subset and count hits against truth
    def plantedRecall(found: DataFrame): Long =
      truth.select(col("a_id"), col("b_id"))
        .join(found.select(col("a_id"), col("b_id")), Seq("a_id", "b_id"))
        .count()

    // -- 2. d2 / d2b recall + walls ----------------------------------
    // each pair frame persists once: the timed count materializes it,
    // the recall join reads the cache (never re-runs the LSH/join)
    val d2P = Dedup.minhashLshPairs(docs).persist()
    val (d2N, d2S) = timed(d2P.count())
    val d2Hits = plantedRecall(d2P)
    println(f"""{"check":"d2_recall","pairs":$d2N,"planted_hits":$d2Hits,"truth":$nTruth,""" +
      f""""recall":${d2Hits.toDouble / nTruth}%.4f,"wall_s":$d2S%.2f}""")
    val d2bP = Dedup.minhashLshPairsJoinback(docs).persist()
    val (d2bN, d2bS) = timed(d2bP.count())
    val d2bHits = plantedRecall(d2bP)
    val parity = d2N == d2bN &&
      d2P.select("a_id", "b_id").exceptAll(d2bP.select("a_id", "b_id")).isEmpty
    println(f"""{"check":"d2b_recall","pairs":$d2bN,"planted_hits":$d2bHits,""" +
      f""""recall":${d2bHits.toDouble / nTruth}%.4f,"wall_s":$d2bS%.2f,"parity_with_d2":$parity}""")
    d2bP.unpersist()

    // -- 2b. d23 fuzzy cross-split contamination at scale ------------
    // (VERDICT r8 item 3): the leakage audit is exactly what this
    // corpus exists for — planted (original, mutated-copy) pairs that
    // land on OPPOSITE sides of x8's hash split are real train→held
    // leaks at a known jaccard band. Recall = share of held docs with
    // a planted train near-dup (true_j ≥ 0.5) that d23 reports at
    // all. Misses decompose into LSH misses (banding) vs est-threshold
    // misses — the same S-curve d2's recall rides.
    val split = graft.text.Curation
      .hashSplit(docs.select(col("doc_id")), "doc_id", 80, 10)
      .select(col("doc_id"), col("split"))
    val d23P = graft.dedup.Contamination.fuzzyContamination(docs).persist()
    val (d23N, d23S) = timed(d23P.count())
    val truthHeld = truth
      .join(split.select(col("doc_id").as("a_id"), col("split").as("a_split")),
        Seq("a_id"))
      .join(split.select(col("doc_id").as("b_id"), col("split").as("b_split")),
        Seq("b_id"))
      .filter((col("a_split") === "train") =!= (col("b_split") === "train"))
      .select(when(col("a_split") === "train", col("b_id")).otherwise(col("a_id"))
        .as("held_id"))
      .distinct().persist()
    val nTruthHeld = truthHeld.count()
    val d23Hits = truthHeld
      .join(d23P.select(col("held_id")).distinct(), Seq("held_id")).count()
    println(f"""{"check":"d23_cross_split_recall","rows":$d23N,"truth_held":$nTruthHeld,""" +
      f""""hits":$d23Hits,"recall":${if (nTruthHeld == 0) 0.0 else d23Hits.toDouble / nTruthHeld}%.4f,"wall_s":$d23S%.2f}""")
    truthHeld.unpersist(); d23P.unpersist()

    // -- 3. d4 df-cap ladder: recall vs cap --------------------------
    // price each cap's candidate mass Σ df·(df−1)/2 from ONE postings
    // aggregation first; caps whose join the valve exists to forbid
    // (mass > budget) are reported and skipped, not ground through —
    // that skip IS the valve's decision at scale
    val massBudget = 500000000L
    val dfs = sh.select(explode(col("sh")).as("s"))
      .groupBy(col("s")).count().persist()
    // df·(df−1) is always even, so the shift IS the /2 — and stays
    // in Long (the `/` operator would promote to double)
    val massAggs = caps.map(c => sum(when(col("count") <= c,
      shiftright(col("count") * (col("count") - 1), 1)).otherwise(0L)).as(s"c$c"))
    val massRow = dfs.agg(massAggs.head, massAggs.tail: _*).head()
    dfs.unpersist()
    val masses = caps.indices.map(i => massRow.getLong(i))
    var sweepSource: DataFrame = null
    caps.zip(masses).foreach { case (cap, mass) =>
      if (mass > massBudget) {
        println(s"""{"check":"d4_cap_recall","cap":$cap,"candidate_mass":$mass,"skipped":"mass over local budget $massBudget"}""")
      } else {
        val f = Dedup.exactJaccardPairs(docs, maxDf = cap).persist()
        val (n, s) = timed(f.count())
        val hits = plantedRecall(f)
        println(f"""{"check":"d4_cap_recall","cap":$cap,"candidate_mass":$mass,"pairs":$n,"planted_hits":$hits,""" +
          f""""recall":${hits.toDouble / nTruth}%.4f,"wall_s":$s%.2f}""")
        // caps ascend, so the last feasible frame = largest cap; it
        // feeds the d19 sweep below
        if (sweepSource != null) sweepSource.unpersist()
        sweepSource = f
      }
    }

    // -- 4. d15 calibration + d19 sweep on the mutated corpus --------
    val calib = Dedup.minhashCalibration(docs)
      .agg(count(lit(1)).as("n"),
        sum(when(col("within_tol"), 1L).otherwise(0L)).as("ok"),
        avg(abs(col("est_jaccard") - col("exact_jaccard"))).as("mae")).head()
    println(f"""{"check":"d15_calibration","pairs":${calib.getLong(0)},"within_tol":${calib.getLong(1)},"mae":${calib.getDouble(2)}%.4f}""")
    d2P.unpersist()
    // d19 sweep source: the largest feasible d4 frame; when the
    // binding cap leaves it empty (the 50× regime), fall back to the
    // LSH-generate → exact-confirm pair set (minhashCalibration's
    // exact_jaccard) — the pipeline a production sweep runs anyway
    // when the uncapped exact join is cluster-only work
    val (sweepPairs, sweepVia) =
      if (sweepSource != null && !sweepSource.isEmpty) (sweepSource, "d4_exact")
      else (Dedup.minhashCalibration(docs)
        .select(col("a_id"), col("b_id"), col("exact_jaccard").as("jaccard")),
        "lsh_confirmed")
    val sweep = Dedup.thresholdSweep(sweepPairs, docs)
      .orderBy(col("threshold")).collect()
    sweep.foreach { r =>
      println(f"""{"check":"d19_sweep","via":"$sweepVia","threshold":${r.getDouble(0)}%.2f,"n_pairs":${r.getLong(1)},"n_docs":${r.getLong(2)},"affected_share":${r.getDouble(3)}%.4f}""")
    }
    if (sweepSource != null) sweepSource.unpersist()

    planted.unpersist(); truth.unpersist()
    spark.stop()
  }
}
