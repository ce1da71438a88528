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

  /** Fuzzy cross-split contamination (d23) — d7 catches exact
    * n-gram containment; the leaks that actually poison evals are
    * NEAR duplicates of training documents (rephrasings, boilerplate
    * variants, truncated re-crawls), which is why production
    * decontamination runs a minhash pass across the split boundary.
    * Per held-out (val/test) document: its worst near-dup in the
    * TRAIN split — the max banded-LSH jaccard estimate and the
    * offending train doc — over x8's deterministic mix64 split of
    * the corpus. A nonzero row here means x13's leakage-safe split
    * (which splits by near-dup CLUSTER, not doc) should have been
    * used; this report is the audit that catches the difference.
    *
    * Scale shape: rides d2's banded-LSH pair machinery UNCHANGED
    * (the corpus is never pairwise — candidates meet in signature
    * bands), decorated by two id-keyed equi-joins against the
    * |docs|-row split frame; the worst-match window partitions by
    * held doc over the LSH-bounded pair set only.
    */
  def fuzzyContamination(docs: DataFrame, threshold: Double = 0.5,
                         trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val split = graft.text.Curation
      .hashSplit(docs.select(col("doc_id")), "doc_id", trainPct, valPct)
      .select(col("doc_id"), col("split"))
    // r14: joinback banding (d2b — one bucket hash per band row
    // instead of the full signature, ~16× less band-shuffle weight;
    // spec-proven pair-identical, same oracle CTE)
    val pairs = Dedup.minhashLshPairsJoinback(docs, threshold)
    val decorated = pairs
      .join(split.select(col("doc_id").as("a_id"), col("split").as("a_split")),
        Seq("a_id"))
      .join(split.select(col("doc_id").as("b_id"), col("split").as("b_split")),
        Seq("b_id"))
      .filter((col("a_split") === "train") =!= (col("b_split") === "train"))
      .select(
        when(col("a_split") === "train", col("b_id")).otherwise(col("a_id"))
          .as("held_id"),
        when(col("a_split") === "train", col("b_split")).otherwise(col("a_split"))
          .as("held_split"),
        when(col("a_split") === "train", col("a_id")).otherwise(col("b_id"))
          .as("train_id"),
        col("est_jaccard"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("held_id"))
      .orderBy(col("est_jaccard").desc, col("train_id"))
    decorated
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("held_id"), col("held_split"),
        col("train_id").as("worst_train_id"),
        col("est_jaccard").as("worst_est_jaccard"))
  }

  /** Verified entry (d23). Sort is oracle-determinism only. */
  def d23(spark: SparkSession, dir: String): DataFrame =
    fuzzyContamination(Tables.documents(spark, dir))
      .orderBy(col("held_id"))
}
