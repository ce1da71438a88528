package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan inspector: `runMain graft.tools.Explain <sfDir> <query...>` */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail
    val spark = graft.GraftSession.builder("graft-explain", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      println(s"==== $n ====")
      df.explain("formatted")
      val t0 = System.nanoTime()
      // collect (not count) so THIS QueryExecution is the one that runs
      // and the printed plan is the final adaptive plan with reuse nodes
      val c = df.collect().length
      println(s"$n rows=$c time=${(System.nanoTime() - t0) / 1e9}")
      println(s"---- final adaptive plan ----\n${df.queryExecution.executedPlan}")
    }
    spark.stop()
  }
}
