package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}

/** Full-surface bench corpus at a derived scale rung (VERDICT r7
  * item 7): ScaleSoak derives the four scale-sensitive tables; the
  * 212-entry bench additionally needs orders (re-keyed consistently
  * with lineitem so the o_orderkey = l_orderkey join stays exact) and
  * the small dimensions (copied verbatim — they are genuinely small
  * at any corpus scale; fact-per-dim fan-in grows ×factor, which is
  * exactly the realistic shape). With this dir complete, graft.Bench
  * runs every entry at the rung and the per-family growth table
  * falls out of bench_last.json vs the sf0.1 artifact.
  *
  * Usage: runMain graft.tools.BenchCorpus [sfDir] [outRoot] [factor]
  */
object BenchCorpus {

  def derive(spark: SparkSession, sfDir: String, outRoot: String,
             factor: Int): Unit = {
    ScaleSoak.deriveCorpus(spark, sfDir, outRoot, factor)
    val done = Paths.get(s"$outRoot/_BENCH_DONE")
    if (Files.exists(done)) return
    // orders: o_orderkey shifted exactly like lineitem.l_orderkey
    // (same stride), o_custkey unshifted — every customer's order
    // count grows ×factor against the verbatim customer dim
    val ord = Tables.orders(spark, sfDir)
    (0 until factor).map { i =>
      ord.withColumn("o_orderkey", col("o_orderkey") + lit(i * 100000000L))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$outRoot/orders.parquet")
    Seq("customer", "supplier", "part", "nation", "region").foreach { t =>
      Tables.table(spark, sfDir, t)
        .write.mode("overwrite").parquet(s"$outRoot/$t.parquet")
    }
    Files.writeString(done, "ok")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outRoot = if (args.length > 1) args(1) else "target/scale10"
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = GraftSession.get("graft-bench-corpus")
    spark.sparkContext.setLogLevel("ERROR")
    derive(spark, sfDir, outRoot, factor)
    Seq("documents", "events", "lineitem", "embeddings", "orders",
      "customer", "supplier", "part", "nation", "region").foreach { t =>
      println(s"$t: ${Tables.table(spark, outRoot, t).count()} rows")
    }
    spark.stop()
  }
}
