package graft.tools

import graft.GraftSession

/** Same-host A/B referee for p14b's two spellings (VERDICT r13 item
  * 1): times the FUSED (2-scan, slice sketches as conditional HLL
  * aggs on the full pass) and SPLIT (3-scan, separate 1/16 slice
  * sketch pass) spellings back-to-back in one JVM, interleaved
  * (F S F S …) so host drift cannot masquerade as a spelling delta,
  * loadavg-stamped. Reads the same parquet inputs as the entry; the
  * spelling is forced via the fuseMinBytes parameter (0 = always
  * fuse, Long.MaxValue = never), so the cutover constant itself is
  * not in the loop.
  *
  * Usage: runMain graft.tools.P14bAb [sfDir] [reps]
  */
object P14bAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = (if (args.length > 1) args(1).toInt else 5).max(2)
    val spark = GraftSession.get("graft-p14b-ab")
    spark.sparkContext.setLogLevel("ERROR")
    def loadavg(): String =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
        .split(" ").take(3).mkString(" ")
      catch { case _: Throwable => "unavailable" }
    def timed(fuseMinBytes: Long): Double = {
      val t0 = System.nanoTime()
      graft.quality.Checks.p14bApproxProfile(spark, sfDir, fuseMinBytes).count()
      (System.nanoTime() - t0) / 1e9
    }
    def f2(v: Double): String = "%.2f".formatLocal(java.util.Locale.ROOT, v)
    // warmup both codegen paths untimed
    timed(0L); timed(Long.MaxValue)
    val runs = (1 to reps).map { _ =>
      val f = timed(0L)
      val s = timed(Long.MaxValue)
      (f, s, loadavg())
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    val line =
      s"""{"metric":"p14b_ab","sf":"$sfDir","reps":$reps,""" +
        s""""fused_median":${f2(median(runs.map(_._1)))},""" +
        s""""split_median":${f2(median(runs.map(_._2)))},""" +
        s""""fused":[${runs.map(r => f2(r._1)).mkString(",")}],""" +
        s""""split":[${runs.map(r => f2(r._2)).mkString(",")}],""" +
        s""""loadavg":[${runs.map(r => "\"" + r._3 + "\"").mkString(",")}]}"""
    println(line)
    spark.stop()
  }
}
