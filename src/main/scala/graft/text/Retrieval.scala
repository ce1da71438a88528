package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Keyword retrieval over the document corpus: BM25 ranking — the
  * lexical complement to the embedding-based semantic search entry
  * (s5). Together they are the two retrieval modes a training-data /
  * RAG pipeline actually runs against a corpus store, and
  * [[rrfFusion]] is the standard way to combine them.
  *
  * Scale shape: for a BOUNDED query-term set the term-frequency
  * pass is a NARROW per-row map (one [[graft.functions.TermFrequencies]]
  * tokenization walk per doc — no explode, no per-token rows, no
  * shuffle); corpus statistics (N, Σdl, per-term document
  * frequencies) reduce to ONE scalar-agg row that rides back on a
  * broadcast cross join. Net: TWO narrow passes over the corpus —
  * one for the stats aggregate, one for scoring (BM25's idf cannot
  * be known before the whole corpus is seen, so a stats pass is
  * inherent to the operator). Both passes run at scan speed with
  * zero corpus shuffles (plan-pinned in PlanShapeSpec); at 100 TB
  * you would persist/checkpoint the narrow per-doc TF projection
  * between the passes to pay the tokenization walk once.
  * Scoring math is written in one fixed left-to-right order so the
  * result is bit-reproducible (and DuckDB-replayable) at any
  * parallelism.
  */
object Retrieval {

  /** Default query: corpus-relevant terms with distinct frequencies. */
  val defaultTerms: Seq[String] = Seq("spark", "join", "vector")

  val K1 = 1.2
  val B = 0.75
  // decimal literals, NOT computed (K1 + 1.0 at runtime could round
  // differently than the parsed literal "2.2" the oracle uses)
  private val K1Plus1 = 2.2
  private val OneMinusB = 0.25

  /** BM25 top-k: per-doc score Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 −
    * b + b·dl/avgdl)) with the Robertson-Spärck Jones idf
    * ln(1 + (N − df + ½)/(df + ½)). Docs matching no term are
    * dropped before the top-k sort.
    */
  def bm25TopK(docs: DataFrame, terms: Seq[String] = defaultTerms,
               k: Int = 20, textCol: String = "text"): DataFrame = {
    require(terms.nonEmpty && terms.size <= 16, "bounded literal term set")
    require(terms.distinct.size == terms.size,
      "duplicate query terms would split one term's tf across two slots")
    // ONE tokenization pass per doc (TermFrequencies); composing
    // size(filter(split...)) per term would re-run the tokenizer per
    // term after project collapse
    val tf = graft.functions.GraftFunctions.term_frequencies(lower(col(textCol)), terms)
    val tfCols = terms.indices.map(i => col("__tf.tfs").getItem(i).as(s"tf$i"))
    val perDoc = docs.withColumn("__tf", tf)
      .select(col("doc_id") +: col("__tf.dl").as("dl") +: tfCols: _*)

    // every count enters the float math through an explicit double
    // cast so the oracle's arithmetic is identical step for step
    val statAggs = sum(col("dl")).cast("double").as("sum_dl") +:
      terms.indices.map(i =>
        sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).cast("double").as(s"df$i"))
    val stats = perDoc.agg(count(lit(1)).cast("double").as("n"), statAggs: _*)

    // fixed left-to-right fold over the literal term list: fp addition
    // order is part of the contract (bit-identical across engines)
    def termScore(i: Int): Column = {
      val tf = col(s"tf$i").cast("double")
      val idf = log(lit(1.0) + (col("n") - col(s"df$i") + lit(0.5)) / (col(s"df$i") + lit(0.5)))
      val norm = lit(OneMinusB) + lit(B) * (col("dl").cast("double") / (col("sum_dl") / col("n")))
      when(col(s"tf$i") > 0, idf * (tf * lit(K1Plus1)) / (tf + lit(K1) * norm))
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

  /** Reciprocal-rank fusion of a lexical (BM25) and a semantic
    * (quantized-ANN) top-k list — the hybrid-retrieval composition a
    * RAG / training-data pipeline runs when neither pure keyword nor
    * pure embedding recall is enough. Classic RRF: score(d) =
    * Σ_lists 1/(κ + rank_list(d)), absent-from-list contributes 0.
    *
    * Scale shape: both inputs are ALREADY bounded top-k lists (≤
    * `depth` rows each), so everything here — the rank windows, the
    * full-outer join, the final sort — runs on O(depth) rows
    * regardless of corpus size. The corpus cost is entirely inside
    * the two upstream retrievals, each already plan-pinned
    * (s4: broadcast-query scan; s6: two narrow scans). The
    * single-partition rank windows are deliberate: a global window
    * over ≤ depth rows is free, and list rank IS a global notion.
    */
  val RrfKappa = 60.0

  def rrfFusion(lexical: DataFrame, semantic: DataFrame, k: Int = 10): DataFrame = {
    val lex = lexical.select(col("doc_id"), col("lex_rank"))
    val sem = semantic.select(col("doc_id"), col("sem_rank"))
    // null rank (absent from that list) → 1/(κ+null) = null → 0.0;
    // lexical contribution first, semantic second: the fold order is
    // part of the fp contract
    val rrf = round(
      coalesce(lit(1.0) / (lit(RrfKappa) + col("lex_rank").cast("double")), lit(0.0)) +
      coalesce(lit(1.0) / (lit(RrfKappa) + col("sem_rank").cast("double")), lit(0.0)), 6)
    lex.join(sem, Seq("doc_id"), "full_outer")
      .withColumn("rrf_score", rrf)
      .orderBy(col("rrf_score").desc, col("doc_id"))
      .select("doc_id", "lex_rank", "sem_rank", "rrf_score")
      .limit(k)
  }

  /** s7: fuse the s6 BM25 list (depth 20) with the s4 int8-quantized
    * ANN neighbor list of query vector 0 (depth 20, same id space as
    * doc_id — see s5). The q_id = 0 filter pushes through the join to
    * the broadcast query side, so the corpus scan is unchanged.
    */
  def s7RrfFusion(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.vectors(spark, dir)
    val lex = bm25TopK(Tables.documents(spark, dir), k = 20)
      .withColumn("lex_rank",
        row_number().over(Window.orderBy(col("score").desc, col("doc_id"))).cast("long"))
    val sem = graft.similarity.Similarity
      .scalarQuantKnn(emb.filter(col("vec_id") === 0L), emb, k = 20)
      .select(col("n_id").as("doc_id"), col("rank").as("sem_rank"))
    rrfFusion(lex, sem)
  }
}
