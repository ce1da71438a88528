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
}
