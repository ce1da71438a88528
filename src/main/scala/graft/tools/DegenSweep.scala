package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}
import graft.{GraftSession, SparkEntry}

/** Degenerate-corpus robustness sweep: every SparkEntry query must
  * RUN (no throw) and produce a well-formed frame on
  *   (a) an EMPTY corpus — every table zero rows, real schema — the
  *       "empty partition day" every production pipeline eventually
  *       feeds an operator, and
  *   (b) a ONE-ROW corpus — each table truncated to a single row —
  *       the smallest corpus where group/window/join operators see
  *       data but every "at least two of something" assumption
  *       (pairs, lag, drift split, trainer sample) is violated.
  *
  * An operator that throws on these inputs is a real library bug:
  * at 100 TB a scheduler retry of an empty backfill day or a
  * near-empty source partition must not abort the job. Correct
  * degenerate output is the operator's own zero/identity (usually an
  * empty frame with the contract schema), never an exception.
  *
  * Usage: runMain graft.tools.DegenSweep [baseSfDir] [empty|one|dirty|both|all]
  * Writes corpora under target/degen/, prints one JSON line per
  * corpus plus a summary line; exits nonzero if any entry throws.
  * DegenerateSpec runs the same sweep as a committed gate.
  */
object DegenSweep {
  val tableNames: Seq[String] = Seq("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "events", "documents",
    "embeddings")

  /** Truncate every base table to n rows (n=0: schema-only). Raw
    * read/write — the events nanos-as-long generation round-trips
    * as-is, so Tables.events' normalization sees the same physical
    * type it would on the base corpus.
    */
  def writeCorpus(spark: SparkSession, baseDir: String, outDir: String,
                  n: Int): Unit = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    tableNames.foreach { t =>
      spark.read.parquet(s"$baseDir/$t.parquet").limit(n)
        .coalesce(1).write.mode(SaveMode.Overwrite)
        .parquet(s"$outDir/$t.parquet")
    }
  }

  /** The DIRTY corpus: full row counts, with nulls planted in the
    * payload columns on deterministic id patterns — null text (a
    * failed fetch), null embeddings (a failed encoder call), null
    * user_id/value/props (lossy ingest). Keys, timestamps, and
    * event_type stay non-null (system-set at ingest), and the TPC-H
    * star tables ship intact (warehouse NOT NULL contract). At
    * 100 TB every one of these nulls exists in the corpus; operators
    * must process past them, not throw.
    */
  def writeDirtyCorpus(spark: SparkSession, baseDir: String,
                       outDir: String): Unit = {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    def nullify(df: org.apache.spark.sql.DataFrame, idCol: String,
                pattern: Map[String, Int]): org.apache.spark.sql.DataFrame =
      pattern.foldLeft(df) { case (d, (c, m)) =>
        d.withColumn(c,
          when(pmod(col(idCol), lit(m)) === 0, lit(null)).otherwise(col(c)))
      }
    val dirty: Map[String, org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame] = Map(
      "documents" -> (df => nullify(df, "doc_id",
        Map("text" -> 2, "lang" -> 3, "n_chars" -> 2))),
      "embeddings" -> (df => nullify(df, "vec_id",
        Map("embedding" -> 2, "label" -> 3))),
      "events" -> (df => nullify(df, "event_id",
        Map("user_id" -> 2, "value" -> 3, "props" -> 5))))
    tableNames.foreach { t =>
      val base = spark.read.parquet(s"$baseDir/$t.parquet")
      dirty.getOrElse(t, identity[org.apache.spark.sql.DataFrame] _)(base)
        .coalesce(1).write.mode(SaveMode.Overwrite)
        .parquet(s"$outDir/$t.parquet")
    }
  }

  /** Run every registered query against dir; return (key, error)
    * failures. Success = the frame executes to completion (count) —
    * row count itself is unconstrained (an empty result is a valid
    * degenerate product; a throw never is).
    */
  def sweep(spark: SparkSession, dir: String,
            only: Option[Set[String]] = None): Seq[(String, String)] =
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .flatMap { case (k, fn) =>
        try { fn(spark, dir).count(); None }
        catch { case e: Throwable =>
          val msg = Option(e.getMessage).filter(_.nonEmpty)
            .getOrElse(e.getClass.getName)
          Some(k -> (e.getClass.getSimpleName + ": " +
            msg.linesIterator.next().take(160)))
        }
      }

  def main(args: Array[String]): Unit = {
    val baseDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val which = if (args.length > 1) args(1) else "both"
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val spark = GraftSession.get("graft-degen")
    spark.sparkContext.setLogLevel("ERROR")
    val corpora = Seq("empty" -> 0, "one" -> 1, "dirty" -> -1)
      .filter { case (name, _) =>
        which == "all" || which == name ||
          (which == "both" && name != "dirty") }
    var totalFails = 0
    corpora.foreach { case (name, n) =>
      val dir = s"target/degen/$name"
      if (n < 0) writeDirtyCorpus(spark, baseDir, dir)
      else writeCorpus(spark, baseDir, dir, n)
      val t0 = System.nanoTime()
      val fails = sweep(spark, dir, only)
      val secs = (System.nanoTime() - t0) / 1e9
      totalFails += fails.size
      val failJson = fails.map { case (k, e) =>
        "\"" + k + "\":\"" + e.replace("\\", "\\\\").replace("\"", "'") + "\""
      }.mkString("{", ",", "}")
      println(f"""{"metric":"degen","corpus":"$name","rows_per_table":$n,"fails":${fails.size},"secs":$secs%.1f,"failures":$failJson}""")
    }
    println(s"""{"metric":"degen_total","fails":$totalFails}""")
    spark.stop()
    if (totalFails > 0) sys.exit(1)
  }
}
