package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the defaults every graft job wants: AQE on,
  * shuffle partitions sized for the local core count (not the 200
  * default), UTC session time, broadcast threshold tuned for the
  * star-schema dims. On a real cluster the same builder applies —
  * only `master` and memory sizing change.
  */
object GraftSession {
  def builder(appName: String = "graft", cores: Int = defaultCores): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")

  def defaultCores: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS",
    Runtime.getRuntime.availableProcessors().toString).toInt

  def get(appName: String = "graft"): SparkSession = builder(appName).getOrCreate()
}
