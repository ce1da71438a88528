package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.pipeline.Medallion

/** Write-to-write counterpart of tools/baseline_ref.py: the SAME
  * backfill shape (bronze read → silver transform → silver parquet →
  * gold 15-minute window agg → gold parquet) through this library's
  * Medallion stages, so BASELINE.md compares identical work.
  *
  * Usage: runMain graft.tools.BackfillBench [sfDir] [outDir]
  */
object BackfillBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/baseline_graft_out")
    val spark = GraftSession.builder("graft-backfill").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val t0 = System.nanoTime()
    Medallion.silverEvents(Tables.events(spark, sfDir))
      .write.mode("overwrite").parquet(s"$out/silver")
    Medallion.goldWindow(spark.read.parquet(s"$out/silver"), "ts", "event_type")
      .write.mode("overwrite").parquet(s"$out/gold")
    val wall = (System.nanoTime() - t0) / 1e9

    val nSilver = spark.read.parquet(s"$out/silver").count()
    val nGold = spark.read.parquet(s"$out/gold").count()
    println(f"""{"baseline":"graft_backfill","sf":"$sfDir","wall_sec":$wall%.2f,"silver_rows":$nSilver,"gold_rows":$nGold}""")
    spark.stop()
  }
}
