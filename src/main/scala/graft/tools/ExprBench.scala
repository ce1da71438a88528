package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.functions.GraftFunctions._

/** Micro-bench for the custom Catalyst expressions on a real corpus:
  * times the scan→expression→aggregate pipeline each hot expression
  * actually runs in (d2/d3/d4's signature map, s6's term
  * frequencies), so a codegen change shows up as wall delta on the
  * exact shape it serves. The aggregate consumes one scalar per row —
  * output cost can't mask the expression cost.
  *
  * Usage: runMain graft.tools.ExprBench [docsDir] [reps]
  * Prints one JSON line per pipeline: median + min of `reps` passes.
  */
object ExprBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/scale10")
    val reps = if (args.length > 1) args(1).toInt else 5
    val spark = GraftSession.get("graft-expr-bench")
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, dir).select(col("text")).persist()
    val n = docs.count() // materialize: time the expression, not the scan

    val terms = graft.text.TextAnalysis.stopwords.take(16)
    val pipelines: Seq[(String, () => Unit)] = Seq(
      ("shingle_hashes", () =>
        docs.agg(sum(size(shingle_hashes(col("text"))))).head()),
      ("minhash_signature", () =>
        // max, not sum: slot values are uniform 64-bit longs and an
        // ANSI sum over 50k of them overflows
        docs.agg(max(element_at(
          minhash_signature(shingle_hashes(col("text"))), 1))).head()),
      ("term_frequencies", () =>
        docs.agg(sum(term_frequencies(col("text"), terms)("dl"))).head()),
      ("word_shingles", () =>
        docs.agg(sum(size(word_shingles(col("text"))))).head()))

    pipelines.foreach { case (name, run) =>
      run() // untimed warmup (JIT + codegen compile)
      val walls = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        run()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val med = walls(walls.size / 2)
      println(f"""{"expr":"$name","rows":$n,"median_s":$med%.3f,"min_s":${walls.head}%.3f,"reps":$reps}""")
    }
    spark.stop()
  }
}
