package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Duplicated-substring detection — the character-window flavor of
  * dedup (the "copy-paste passage" signal document-level hashing
  * cannot see: two different pages sharing one boilerplate paragraph
  * are not near-dups, but the paragraph is still duplicated training
  * text). Each document is cut into fixed-width character windows on
  * a stride; a window whose exact text occurs in ≥2 distinct
  * documents is a duplicated window, and each document reports its
  * duplicated-window fraction.
  *
  * Scale shape: explode to (doc, window), distinct within doc,
  * count docs per window, semi-join the duplicated windows back,
  * count per doc — shuffles on the window key and the doc key, both
  * balanced by construction; no pair set is ever materialized, so a
  * window shared by D docs costs D rows, never D². Like d7, windows
  * here are the raw STRINGS so ANSI SQL replays the operator
  * byte-for-byte; at 100 TB the window column would be a 64-bit
  * rolling hash instead (same plan, 8-byte shuffle keys — and at a
  * stride of 1 the hashes become the classic rolling-hash substring
  * dedup).
  */
object Substring {

  /** @param width  window width in characters
    * @param stride window stride; width/stride windows overlap each
    *               character, bounding fan-out at width/stride rows
    *               per character of corpus
    * @param minDocs how many distinct docs make a window duplicated
    */
  def duplicatedWindows(docs: DataFrame, width: Int = 40, stride: Int = 10,
                        minDocs: Int = 2): DataFrame = {
    val nWin = when(length(col("text")) >= width,
      floor((length(col("text")) - width) / lit(stride.toDouble)).cast("long") + 1L)
      .otherwise(0L)
    val windows = transform(
      sequence(lit(0), (nWin - 1L).cast("int")),
      i => col("text").substr(i * stride + 1, lit(width)))
    val wins = Tables.spread(docs)
      .withColumn("n_windows", nWin)
      .filter(col("n_windows") > 0L)
      .select(col("doc_id"), explode(windows).as("w"))
      .distinct()
    val dup = wins.groupBy(col("w")).count()
      .filter(col("count") >= minDocs)
      .select(col("w"))
    val perDoc = wins.join(dup, Seq("w"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_dup_windows"))
    docs.select(col("doc_id"), nWin.as("n_windows"))
      .join(perDoc, Seq("doc_id"), "left")
      .withColumn("n_dup_windows", coalesce(col("n_dup_windows"), lit(0L)))
      .withColumn("dup_fraction",
        when(col("n_windows") > 0L,
          round(col("n_dup_windows").cast("double") / col("n_windows"), 6))
          .otherwise(lit(0.0)))
      .withColumn("flagged", col("dup_fraction") >= 0.5)
  }

  /** d8: 40-char windows on a 10-char stride over the corpus. */
  def d8(spark: SparkSession, dir: String): DataFrame =
    duplicatedWindows(Tables.documents(spark, dir))
      .select("doc_id", "n_windows", "n_dup_windows", "dup_fraction", "flagged")
      .orderBy("doc_id")

  /** Duplicated-span REMOVAL (the ExactSubstr-dedup transform): where
    * [[duplicatedWindows]] only *flags* shared passages, this strips
    * them — every token covered by a `width`-token window that occurs
    * in ≥ `minDocs` distinct documents is deleted and the surviving
    * tokens are re-joined, so repeated boilerplate disappears from
    * every copy while each document keeps its unique prose. Removing
    * (rather than dropping whole docs) is the published ExactSubstr
    * result: near-dup doc filters cannot see a paragraph shared by
    * otherwise-different pages.
    *
    * Scale shape: token windows explode to (doc, pos, window) — the
    * same D·n fan-out d8 bounds, never a pair set; hot windows are
    * decided by a count on the window-string shuffle key; covered
    * positions come back per doc as hot START offsets only
    * (`collect_set` of starts, each start expanding to `width`
    * positions inside a higher-order function on the reduce side —
    * the w× position fan-out never crosses the wire); the final
    * reconstruction is a narrow indexed-lambda filter over the
    * original token array. Two shuffles total (window key, doc key),
    * both hash-balanced. At 100 TB the window strings become 64-bit
    * rolling hashes — same plan, 8-byte keys (d8's documented lever).
    */
  def stripDupSpans(docs: DataFrame, width: Int = 8,
                    minDocs: Int = 2): DataFrame = {
    val toks = docs.select(col("doc_id"), split(col("text"), "\\s+").as("toks"))
    val wins = toks
      .filter(size(col("toks")) >= width)
      .select(col("doc_id"), posexplode(transform(
        sequence(lit(0), size(col("toks")) - width),
        i => concat_ws(" ", slice(col("toks"), i + 1, lit(width))))))
      .toDF("doc_id", "pos", "w")
    val hot = wins.select(col("doc_id"), col("w")).distinct()
      .groupBy(col("w")).count()
      .filter(col("count") >= minDocs)
      .select(col("w"))
    val starts = wins.join(hot, Seq("w"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(collect_set(col("pos")).as("starts"))
    toks.join(starts, Seq("doc_id"), "left")
      .withColumn("cov", coalesce(
        array_distinct(flatten(transform(col("starts"),
          s => sequence(s, s + width - 1)))),
        array().cast("array<int>")))
      .select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(col("cov")).cast("long").as("n_removed"),
        concat_ws(" ", filter(col("toks"),
          (t, i) => !array_contains(col("cov"), i))).as("clean_text"))
  }

  /** d12: strip 8-token spans duplicated across ≥2 docs. */
  def d12(spark: SparkSession, dir: String): DataFrame =
    stripDupSpans(Tables.documents(spark, dir))
      .orderBy("doc_id")
}
