package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}

/** Measured data for the banded-window cutover (VERDICT r13 item 2):
  * the r13 `BandedWindowMinBytes` constant was set without a corpus
  * that actually scales CUSTOMERS (BenchCorpus keeps o_custkey
  * verbatim, so the per-customer aggregate the a28/a35/a36 windows
  * ride never grows in any sweep). This main derives orders tables
  * whose customer cardinality grows ×factor — every replica shifts
  * BOTH o_orderkey and o_custkey, so each new order block belongs to
  * a fresh customer block — then times a28/a35/a36 in three
  * spellings per factor, interleaved (plain, banded, default per
  * rep) in one JVM, loadavg-stamped:
  *   - plain  = bandedMinBytes forced to Long.MaxValue (the
  *     single-partition ntile/cumsum window);
  *   - banded = bandedMinBytes forced to 0 (offsets + band windows);
  *   - default = the shipped cutover constant deciding.
  * The printed JSON (one line per factor) carries the orders input's
  * optimizer size estimate so the crossover reads directly in the
  * cutover constant's own unit.
  *
  * Usage: runMain graft.tools.BandedCutoverAb [sfDir] [outRoot] [factors csv] [reps]
  */
object BandedCutoverAb {

  def deriveOrders(spark: SparkSession, sfDir: String, out: String,
                   factor: Int): Unit = {
    if (Files.exists(Paths.get(s"$out/_CUSTSCALE_DONE"))) return
    val ord = Tables.orders(spark, sfDir)
    (0 until factor).map { i =>
      ord.withColumn("o_orderkey", col("o_orderkey") + lit(i * 100000000L))
        .withColumn("o_custkey", col("o_custkey") + lit(i * 100000000L))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/orders.parquet")
    Files.createDirectories(Paths.get(out))
    Files.writeString(Paths.get(s"$out/_CUSTSCALE_DONE"), "ok")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outRoot = if (args.length > 1) args(1) else "target/custscale"
    val factors = (if (args.length > 2) args(2) else "8,32,128")
      .split(",").map(_.trim.toInt).toSeq
    val reps = (if (args.length > 3) args(3).toInt else 3).max(2)
    val spark = GraftSession.get("graft-banded-cutover-ab")
    spark.sparkContext.setLogLevel("ERROR")
    def loadavg(): String =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
        .split(" ").take(3).mkString(" ")
      catch { case _: Throwable => "unavailable" }
    def f2(v: Double): String = "%.2f".formatLocal(java.util.Locale.ROOT, v)
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }

    val lines = factors.map { factor =>
      val dir = s"$outRoot/f$factor"
      deriveOrders(spark, sfDir, dir, factor)
      val orders = Tables.orders(spark, dir)
      val sizeEst = orders.queryExecution.optimizedPlan.stats.sizeInBytes
      val nCust = orders.select(approx_count_distinct(col("o_custkey"))).head.getLong(0)
      def timed(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      def runEach(minBytes: Long): (Double, Double, Double) = (
        timed(graft.analytics.Queries.spendDeciles(spark, dir, bandedMinBytes = minBytes).count()),
        timed(graft.analytics.Queries.rfmSegments(orders, bandedMinBytes = minBytes).count()),
        timed(graft.analytics.Queries.abcClasses(orders, bandedMinBytes = minBytes).count()))
      def runAll(minBytes: Long): Double = {
        val (a, b, c) = runEach(minBytes)
        System.err.println(s"[ab] f=$factor minBytes=$minBytes a28=${f2(a)} a35=${f2(b)} a36=${f2(c)}")
        a + b + c
      }
      def runDefault(): Double = {
        val t0 = System.nanoTime()
        graft.analytics.Queries.spendDeciles(spark, dir).count()
        graft.analytics.Queries.rfmSegments(orders).count()
        graft.analytics.Queries.abcClasses(orders).count()
        (System.nanoTime() - t0) / 1e9
      }
      runAll(Long.MaxValue); runAll(0L) // warm both codegen paths
      val runs = (1 to reps).map { _ =>
        (runAll(Long.MaxValue), runAll(0L), runDefault(), loadavg())
      }
      // "subset":true — InventorySpec holds every committed
      // bench_*.json to the inventory contract; this referee artifact
      // carries no per-entry keys, and the flag keeps the invariant
      // walking the REAL sweep artifacts instead of canceling here.
      val line =
        s"""{"metric":"banded_cutover_ab","subset":true,"factor":$factor,""" +
          s""""orders_size_est_bytes":$sizeEst,"n_customers_approx":$nCust,""" +
          s""""plain_median":${f2(median(runs.map(_._1)))},""" +
          s""""banded_median":${f2(median(runs.map(_._2)))},""" +
          s""""default_median":${f2(median(runs.map(_._3)))},""" +
          s""""plain":[${runs.map(r => f2(r._1)).mkString(",")}],""" +
          s""""banded":[${runs.map(r => f2(r._2)).mkString(",")}],""" +
          s""""default":[${runs.map(r => f2(r._3)).mkString(",")}],""" +
          s""""loadavg":[${runs.map(r => "\"" + r._4 + "\"").mkString(",")}]}"""
      println(line)
      line
    }
    val repoRoot =
      try {
        val p = new ProcessBuilder("git", "rev-parse", "--show-toplevel").start()
        val out = new String(p.getInputStream.readAllBytes()).trim
        if (p.waitFor() == 0 && out.nonEmpty) out else "."
      } catch { case _: Throwable => "." }
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(repoRoot, "bench_banded_cutover.json"),
      lines.mkString("", "\n", "\n"))
    catch { case e: Throwable =>
      System.err.println(s"[banded-cutover-ab] artifact write failed: ${e.getMessage}")
    }
    spark.stop()
  }
}
