package graft.tools

import org.apache.spark.sql.DataFrame

/** Plan inspector for the r13 banded-window spellings: dumps the
  * a28/a35/a36 plans with the banded spelling FORCED (bandedMinBytes
  * = 0) so the band-partitioned windows are visible at any local SF —
  * the default entries stay on the plain window below the size
  * cutover, so `tools.Explain` alone can't show the at-scale plan.
  * Usage: runMain graft.tools.BandedPlans [sfDir]
  */
object BandedPlans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.GraftSession.builder("graft-banded-plans", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val orders = graft.Tables.orders(spark, sfDir)
    def dump(name: String, df: DataFrame): Unit = {
      println(s"==== $name ====")
      df.explain("formatted")
      val n = df.collect().length
      println(s"$name rows=$n")
      println(s"---- final adaptive plan ----\n${df.queryExecution.executedPlan}")
    }
    dump("a28_spend_deciles_banded",
      graft.analytics.Queries.spendDeciles(spark, sfDir, bandedMinBytes = 0))
    dump("a35_rfm_segments_banded",
      graft.analytics.Queries.rfmSegments(orders, bandedMinBytes = 0))
    dump("a36_abc_classes_banded",
      graft.analytics.Queries.abcClasses(orders, bandedMinBytes = 0))
    spark.stop()
  }
}
