package graft.tools

import graft.{GraftSession, SparkEntry}

/** Standalone referee for the SWEEP-DRAG class (VERDICT r11 items
  * 3/6): entries whose full-229-sweep walls inflate with accumulated
  * JVM state rather than plan cost — p15 read 9.84 s inside one r11
  * full sweep vs 3.83 s standalone (SCALE.md r11 triage), and t16's
  * two-scan rewrite landed as a nominal full-sweep REGRESSION
  * (0.89→1.51 s) while ScanAudit proved the plan scans the corpus
  * five times less. The full-run artifact cannot referee these, so —
  * ManifestBench's pattern — this main runs ONLY the drag class in a
  * fresh JVM and writes `bench_dragclass.json`: one cold pass + the
  * median of `reps` warm passes per entry, loadavg-stamped,
  * subset-flagged. Round-over-round comparisons for these keys
  * should read THIS artifact, not bench_last.json.
  *
  * Class membership (why each is here):
  *  - p14/p14b/p15: the profile family — single-scan plans whose
  *    wall is dominated by the one wide aggregation pass, maximally
  *    exposed to code-cache/GC drag;
  *  - t16/t19: the bigram-LM family, two corpus scans by plan
  *    (ScanAudit-pinned) but historically the noisiest full-sweep
  *    readings;
  *  - d15/d23: LSH-generate + exact-confirm entries whose pair
  *    caches make pass-1 (cold) the only honest number;
  *  - a34/a35, x15/x19/x20 (VERDICT r12 item 3): the r12 sweep
  *    movers — multi-join/window analytics and interleave/sweep
  *    curation entries whose full-run walls moved round-over-round
  *    with no plan change; refereeing them here separates host-class
  *    drift from real regressions;
  *  - p15b: p15's sketch spelling, priced next to its exact twin.
  *
  * Usage: runMain graft.tools.DragBench [sfDir] [reps]
  */
object DragBench {

  /** The sweep-drag entries refereed standalone. */
  val keys: Seq[String] = Seq(
    "p14_profile", "p14b_approx_profile", "p15_profile_drift",
    "p15b_approx_drift",
    "t16_bigram_ppl", "t19_ppl_partition",
    "d15_minhash_calibration", "d23_fuzzy_contamination",
    "a34_order_backlog", "a35_rfm_segments",
    "x15_interleave", "x19_quality_sweep", "x20_length_histogram")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = (if (args.length > 1) args(1).toInt else 3).max(1)
    val spark = GraftSession.get("graft-drag-bench")
    spark.sparkContext.setLogLevel("ERROR")

    def loadavg(): String =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
        .split(" ").take(3).mkString(" ")
      catch { case _: Throwable => "unavailable" }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    def timed(k: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(k)(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    def f2(v: Double): String = "%.2f".formatLocal(java.util.Locale.ROOT, v)

    // Untimed JVM warmup at the smallest SF (Bench's methodology):
    // codegen is keyed on generated source, identical across data
    // dirs, so the "cold" column below measures first-at-target-SF
    // cost instead of session/Janino init landing on whichever key
    // runs first. SPARK_GRAFT_WARMUP=false skips it.
    if (sys.env.getOrElse("SPARK_GRAFT_WARMUP", "true").toBoolean) {
      val warmDir = "/root/testdata/sf0.001"
      val dir = if (new java.io.File(warmDir).isDirectory) warmDir else sfDir
      keys.foreach { k =>
        try SparkEntry.queries(k)(spark, dir).count()
        catch { case _: Throwable => () }
      }
    }

    val tsStart = java.time.Instant.now().toString
    val loadStart = loadavg()
    // cold = first execution at the TARGET SF in this JVM (for the
    // cache-backed d15/d23 this is the only honest number), then
    // `reps` warm passes per key; keys run in class order
    val cold = keys.map(k => k -> timed(k))
    val warm = keys.map(k => k -> median((1 to reps).map(_ => timed(k))))
    val loadEnd = loadavg()
    val tsEnd = java.time.Instant.now().toString

    def qmap(xs: Seq[(String, Double)]): String =
      xs.map { case (k, v) => "\"" + k + "\":" + f2(v) }.mkString("{", ",", "}")
    val total = warm.map(_._2).sum
    val line =
      s"""{"metric":"dragclass_standalone","value":${f2(total)},"unit":"sec",""" +
        s""""sf":"$sfDir","reps":$reps,"subset":true,""" +
        s""""queries":${qmap(warm)},"queries_cold":${qmap(cold)},""" +
        s""""loadavg_start":"$loadStart","loadavg_end":"$loadEnd",""" +
        s""""ts_start":"$tsStart","ts_end":"$tsEnd"}"""
    val repoRoot =
      try {
        val p = new ProcessBuilder("git", "rev-parse", "--show-toplevel").start()
        val out = new String(p.getInputStream.readAllBytes()).trim
        if (p.waitFor() == 0 && out.nonEmpty) out else "."
      } catch { case _: Throwable => "." }
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(repoRoot, "bench_dragclass.json"), line + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[drag-bench] artifact write failed: ${e.getMessage}")
    }
    println(line)
    spark.stop()
  }
}
