package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.GraftFunctions._

/** Incremental deduplication — the nightly-ingest shape: a NEW batch
  * of documents arrives and must be deduplicated against the
  * already-ingested corpus WITHOUT reprocessing the corpus against
  * itself. (d1-d5 answer "is this corpus internally duplicated";
  * this answers "which of today's documents are already in the
  * lake" — the operation an accreting 100 TB training corpus runs
  * every ingest cycle.)
  *
  * Two verdict tiers per batch document, mirroring a production
  * ingest gate:
  *  - `exact_dup`: its content hash already exists in the corpus;
  *  - `near_dup_of` / `best_jaccard`: the smallest corpus doc_id
  *    whose word-3-gram jaccard clears the threshold, and the best
  *    qualifying score (max jaccard, rounded after the max).
  *
  * Scale shape — the asymmetry is the whole point: the batch is
  * tiny relative to the corpus (a day's ingest vs the lake), so
  * every batch-derived structure BROADCASTS (content hashes,
  * shingle postings with per-doc set sizes) and the corpus only
  * ever flows through narrow maps + broadcast joins — it is never
  * hash-shuffled on content, and (unlike re-running d4 on
  * corpus+batch) no corpus-x-corpus candidate pair is ever formed.
  * Only the matching (corpus, batch) shingle hits shuffle, for the
  * per-pair shared-count aggregation, and that stream is bounded by
  * the batch's posting list x df — the same df-cap lever as d4
  * guards the boilerplate-shingle blowup.
  */
object Incremental {

  /** @param threshold jaccard at-or-above which a batch doc is a near
    *        dup (d4's convention)
    * @param n shingle width in words
    * @param maxDf drop batch shingles whose CORPUS document frequency
    *        exceeds this — the hot-shingle valve: a boilerplate
    *        shingle present in df corpus docs emits df hits for every
    *        batch doc containing it; capped jaccard only
    *        under-estimates (candidate-safe, same argument as d4)
    * @param hashShingles true = 64-bit shingle hashes (smaller
    *        broadcast, the production configuration); false = shingle
    *        strings, byte-identical semantics and ANSI-SQL-replayable
    *        (the verified entry's configuration — d7's trade)
    */
  def incrementalDedup(batch: DataFrame, corpus: DataFrame,
                       threshold: Double = 0.5, n: Int = 3,
                       maxDf: Long = 1000L,
                       hashShingles: Boolean = true): DataFrame = {
    def sh(c: org.apache.spark.sql.Column) =
      if (hashShingles) shingle_hashes(c, n) else word_shingles(c, n)

    // exact tier: distinct corpus hashes stream into a broadcast
    // semi-join probe of the batch's (tiny) hash set — realized as
    // the batch broadcasting, corpus side narrow
    val batchHashed = batch.select(col("doc_id"), md5(col("text")).as("__h"))
    val corpusHashes = corpus.select(md5(col("text")).as("__h"))
    val exactHits = corpusHashes
      .join(broadcast(batchHashed), Seq("__h"), "inner")
      .select(col("doc_id")).distinct()
      .withColumn("exact_dup", lit(true))

    // near tier: batch postings (with per-doc set size) broadcast;
    // corpus explodes its shingles ONCE, probes the broadcast, and
    // only the hits reach the per-pair aggregation
    val batchSh = batch
      .select(col("doc_id").as("b_id"), sh(col("text")).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("nb", size(col("sh")))
    val batchPosts = batchSh
      .select(col("b_id"), col("nb"), explode(col("sh")).as("s"))
    val corpusSh = Tables.spread(corpus)
      .select(col("doc_id").as("c_id"), sh(col("text")).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("nc", size(col("sh")))
    val corpusPosts = corpusSh
      .select(col("c_id"), col("nc"), explode(col("sh")).as("s"))
    // Hot-shingle valve: a shingle in df corpus docs emits df hit
    // rows PER batch doc containing it — boilerplate ("all rights
    // reserved") detonates the hit stream exactly like d4's hot key.
    // The df count is map-side combined (the exchange carries
    // distinct shingles per partition, not postings — t5's argument),
    // and the resulting hot set is tiny, so pruning it from the
    // BATCH postings is a broadcast anti-join on the small side; the
    // corpus posting stream itself is never shuffled. (A production
    // lake materializes df once and maintains it incrementally
    // instead of re-counting per ingest; the in-query form keeps the
    // operator self-contained.) Dropping a shingle shrinks `shared`
    // only — capped jaccard under-estimates, candidate-safe.
    val hot = corpusPosts.groupBy(col("s"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf)
      .select(col("s"))
    val safePosts = batchPosts.join(broadcast(hot), Seq("s"), "left_anti")
    val pairs = corpusPosts
      .join(broadcast(safePosts), Seq("s"))
      .groupBy(col("b_id"), col("c_id"), col("nb"), col("nc"))
      .agg(count(lit(1)).as("shared"))
      .withColumn("j", col("shared").cast("double")
        / (col("nb") + col("nc") - col("shared")))
      .filter(col("j") >= threshold)
    val near = pairs
      .groupBy(col("b_id").as("doc_id"))
      .agg(min(col("c_id")).as("near_dup_of"),
        round(max(col("j")), 6).as("best_jaccard"))

    batch.select(col("doc_id"))
      .join(exactHits, Seq("doc_id"), "left")
      .join(near, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("exact_dup"), lit(false)).as("exact_dup"),
        col("near_dup_of"), col("best_jaccard"),
        (coalesce(col("exact_dup"), lit(false)) === false
          && col("near_dup_of").isNull).as("is_new"))
  }

  /** Verified entry (d10): every 10th document plays the incoming
    * batch; the rest are the standing corpus. String shingles so the
    * DuckDB oracle replays the jaccard math exactly (d7's trade);
    * determinism sort entry-only.
    */
  def d10(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    incrementalDedup(
      batch = docs.filter(col("doc_id") % 10 === 0),
      corpus = docs.filter(col("doc_id") % 10 =!= 0),
      hashShingles = false)
      .orderBy(col("doc_id"))
  }
}
