package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.similarity.Similarity

/** Scratch profiler for the kNN-graph soak leg: isolates where the
  * wall goes at scaled cell counts (assignment map vs within-cell
  * join vs window).
  */
object KnnProbe {
  private def timed[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/scale10")
    val numCells = if (args.length > 1) args(1).toInt else 40
    val spark = GraftSession.get("graft-knn-probe")
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, dir).persist()
    println(s"[probe] n=${emb.count()} cells=$numCells")
    val cents = timed("train")(
      Similarity.cachedCentroids(emb, numCells, iters = 3, Some(s"$dir#probe$numCells")))
    val assigned = emb.withColumn("cell_id",
      Similarity.assignBest(col("embedding"), cents))
    timed("assign-only count")(assigned.groupBy("cell_id").count().count())
    timed("assign-only again")(assigned.groupBy("cell_id").count().count())
    val g = Similarity.knnGraph(emb, k = 5, numCells = numCells,
      cacheKey = Some(s"$dir#probe$numCells"))
    timed("knnGraph full")(g.count())
    timed("knnGraph again")(g.count())
    g.explain("formatted")
    emb.unpersist()
    spark.stop()
  }
}
