package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Keyword retrieval over the document corpus: BM25 ranking — the
  * lexical complement to the embedding-based semantic search entry
  * (s5). Together they are the two retrieval modes a training-data /
  * RAG pipeline actually runs against a corpus store.
  *
  * Scale shape: for a BOUNDED query-term set the whole term-frequency
  * pass is a NARROW per-row map (per-term `filter(toks, ...)` counts —
  * no explode, no per-token rows, no shuffle); corpus statistics
  * (N, Σdl, per-term document frequencies) reduce to ONE scalar-agg
  * row that rides back on a broadcast cross join. Net: one scan +
  * one 1-row broadcast — at 100 TB the ranking runs at scan speed.
  * Scoring math is written in one fixed left-to-right order so the
  * result is bit-reproducible (and DuckDB-replayable) at any
  * parallelism.
  */
object Retrieval {

  /** Default query: corpus-relevant terms with distinct frequencies. */
  val defaultTerms: Seq[String] = Seq("spark", "join", "vector")

  val K1 = 1.2
  val B = 0.75

  /** BM25 top-k: per-doc score Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 −
    * b + b·dl/avgdl)) with the Robertson-Spärck Jones idf
    * ln(1 + (N − df + ½)/(df + ½)). Docs matching no term are
    * dropped before the top-k sort.
    */
  def bm25TopK(docs: DataFrame, terms: Seq[String] = defaultTerms,
               k: Int = 20, textCol: String = "text"): DataFrame = {
    require(terms.nonEmpty && terms.size <= 16, "bounded literal term set")
    // ONE tokenization pass per doc (TermFrequencies); composing
    // size(filter(split...)) per term would re-run the tokenizer per
    // term after project collapse
    val tf = graft.functions.GraftFunctions.term_frequencies(lower(col(textCol)), terms)
    val tfCols = terms.indices.map(i => col("__tf.tfs").getItem(i).as(s"tf$i"))
    val perDoc = docs.withColumn("__tf", tf)
      .select(col("doc_id") +: col("__tf.dl").as("dl") +: tfCols: _*)

    val statAggs = sum(col("dl")).as("sum_dl") +:
      terms.indices.map(i => sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i"))
    val stats = perDoc.agg(count(lit(1)).as("n"), statAggs: _*)

    // fixed left-to-right fold over the literal term list: fp addition
    // order is part of the contract (bit-identical across engines)
    def termScore(i: Int): Column = {
      val tf = col(s"tf$i").cast("double")
      val idf = log(lit(1.0) + (col("n") - col(s"df$i") + lit(0.5)) / (col(s"df$i") + lit(0.5)))
      val norm = lit(1.0 - B) + lit(B) * (col("dl").cast("double") / (col("sum_dl").cast("double") / col("n")))
      when(col(s"tf$i") > 0, idf * (tf * lit(K1 + 1.0)) / (tf + lit(K1) * norm))
        .otherwise(lit(0.0))
    }
    val score = terms.indices.map(termScore).reduceLeft(_ + _)

    perDoc.crossJoin(broadcast(stats))
      .withColumn("score", round(score, 6))
      .filter(col("score") > 0)
      .orderBy(col("score").desc, col("doc_id"))
      .select("doc_id", "score")
      .limit(k)
  }

  def s6Bm25(spark: SparkSession, dir: String): DataFrame =
    bm25TopK(Tables.documents(spark, dir))
}
