package graft.tools

import graft.{GraftSession, SparkEntry}

/** Standalone regression gate for the manifest/metadata family
  * (VERDICT r9 item 3): p27's wall in the FULL 229-query sweep
  * inflates ~2× with accumulated JVM state (listener/code-cache/
  * tmp-shuffle history — profiled + A/B'd in SCALE.md r9, plan
  * unchanged), so the full-run artifact cannot referee plan-heavy
  * metadata entries: a real manifest-family regression can hide
  * inside — or be faked by — JVM drag. This main runs ONLY the
  * manifest family in a fresh JVM (the standalone regime the r9
  * profiling showed is stable at 0.44–0.53 s for p27) and writes
  * `bench_manifest.json`: one cold pass + the median of `reps` warm
  * passes per entry, loadavg-stamped. The artifact is subset-flagged
  * so InventorySpec's bench invariant holds it to the no-stale-keys
  * half, and a dedicated InventorySpec test pins that it covers
  * exactly the manifest family. Round-over-round manifest comparisons
  * should read THIS artifact, not bench_last.json.
  *
  * Usage: runMain graft.tools.ManifestBench [sfDir] [reps]
  */
object ManifestBench {

  /** The plan-heavy metadata entries (lake manifest/commit-log family). */
  val keys: Seq[String] = Seq(
    "p26_scan_prune_manifest", "p27_incremental_manifest",
    "p28_time_travel", "p29_vacuum_orphans",
    "p30_optimistic_commit", "p31_manifest_pruned_read")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = (if (args.length > 1) args(1).toInt else 3).max(1)
    val spark = GraftSession.get("graft-manifest-bench")
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
    // cold = first execution at the TARGET SF in this JVM, then
    // `reps` warm passes per key; keys run in family order
    val cold = keys.map(k => k -> timed(k))
    val warm = keys.map(k => k -> median((1 to reps).map(_ => timed(k))))
    val loadEnd = loadavg()
    val tsEnd = java.time.Instant.now().toString

    def qmap(xs: Seq[(String, Double)]): String =
      xs.map { case (k, v) => "\"" + k + "\":" + f2(v) }.mkString("{", ",", "}")
    val total = warm.map(_._2).sum
    val line =
      s"""{"metric":"manifest_standalone","value":${f2(total)},"unit":"sec",""" +
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
      java.nio.file.Paths.get(repoRoot, "bench_manifest.json"), line + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[manifest-bench] artifact write failed: ${e.getMessage}")
    }
    println(line)
    spark.stop()
  }
}
