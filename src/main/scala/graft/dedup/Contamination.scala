package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.GraftFunctions._

/** Benchmark decontamination: flag corpus documents sharing word
  * n-gram shingles with an evaluation/benchmark set — the standard
  * pre-training hygiene step (the reference pipeline has no analogue;
  * this is part of the training-data operator surface).
  *
  * Scale shape: the benchmark side is always tiny relative to the
  * corpus (eval sets are thousands of docs; the corpus is 100 TB), so
  * its distinct shingle-hash set is BROADCAST and the corpus side is
  * a pure narrow explode + broadcast-semi-join + per-doc count — the
  * corpus is never shuffled.
  */
object Contamination {

  /** @param n shingle width in words (8 is a common decontamination
    *          choice; 3 would over-flag, 13 under-flag short overlaps)
    * @param minShared how many distinct shared shingles mark a doc
    * @param hashShingles true (default) matches on 64-bit shingle
    *        hashes — smaller broadcast and probe keys, the 100 TB
    *        configuration; false matches on the shingle STRINGS —
    *        byte-identical semantics (modulo astronomically-unlikely
    *        hash collisions) and expressible in ANSI SQL, which is
    *        what lets the driver's DuckDB oracle verify the operator
    *        end-to-end. Same plan shape either way: the corpus never
    *        shuffles before its per-doc aggregation.
    * @return (doc_id, shared_shingles, contaminated) for docs with
    *         any overlap
    */
  def contaminated(corpus: DataFrame, benchmark: DataFrame,
                   n: Int = 8, minShared: Int = 3,
                   hashShingles: Boolean = true): DataFrame = {
    def sh(c: org.apache.spark.sql.Column) =
      if (hashShingles) shingle_hashes(c, n) else word_shingles(c, n)
    val benchShingles = benchmark
      .select(explode(sh(col("text"))).as("s"))
      .distinct()
    val corpusShingles = Tables.spread(corpus)
      .select(col("doc_id"), explode(sh(col("text"))).as("s"))
    corpusShingles
      .join(broadcast(benchShingles), Seq("s"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("shared_shingles"))
      .withColumn("contaminated", col("shared_shingles") >= minShared)
  }

  /** Verified entry (d7): src0 documents stand in for the benchmark
    * set; every other source is the corpus. Exact duplicates across
    * sources plus any boilerplate overlap surface as contamination
    * hits. String-shingle matching so DuckDB can replicate the
    * computation exactly — see [[contaminated]] for the trade.
    * Sort is oracle-determinism only (the library fn is unordered).
    */
  def d7(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    contaminated(
      corpus = docs.filter(col("source") =!= "src0"),
      benchmark = docs.filter(col("source") === "src0"),
      hashShingles = false)
      .orderBy(col("doc_id"))
  }
}
