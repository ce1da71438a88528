package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import graft.{GraftSession, SparkEntry}

/** Local profiling aid: run one SparkEntry query and print per-stage
  * wall times (name, tasks, ms) to find scheduler-vs-compute skew.
  * Usage: runMain graft.tools.Profile <queryKey> <sfDir> [reps] [sqlConf=value ...]
  * Trailing key=value args are applied as runtime SQL confs (e.g.
  * spark.sql.autoBroadcastJoinThreshold=-1 to A/B a join strategy).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val key = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2 && !args(2).contains("=")) args(2).toInt else 2
    val spark = GraftSession.get("graft-profile")
    args.drop(2).filter(_.contains("=")).foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k, v)
      println(s"[profile] conf $k=$v")
    }
    spark.sparkContext.setLogLevel("WARN")
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Int, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val ms = (for {s <- i.submissionTime; c <- i.completionTime} yield c - s).getOrElse(-1L)
        stages.add((i.stageId, i.name.takeWhile(_ != '\n').take(60), i.numTasks, ms))
      }
    })
    (1 to reps).foreach { r =>
      stages.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(key)(spark, sfDir).count()
      val total = (System.nanoTime() - t0) / 1e9
      println(f"== rep $r: $key total $total%.2fs")
      Thread.sleep(500) // let the listener bus drain
      stages.toArray(Array.empty[(Int, String, Int, Long)]).sortBy(_._1).foreach {
        case (id, name, n, ms) => println(f"  stage $id%4d $ms%6dms tasks=$n%3d  $name")
      }
    }
    spark.stop()
  }
}
