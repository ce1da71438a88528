package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hot-key valve for the per-key-history folds (VERDICT r8 item 5).
  *
  * The batch spellings of the sequential-state operators (st29's EWMA
  * fold, st5/st16's funnel fold) buffer each key's FULL sorted series
  * in one aggregation buffer — `aggregate(sort_array(collect_list))`.
  * That contract is documented (per-key state = series length, the
  * same bound the flatMapGroupsWithState twins hold), but nothing
  * used to enforce it: a single hot key with 10⁸ events OOMed the
  * task with a cryptic buffer error. This guard makes the contract a
  * NAMED failure instead, d4-cap style: a per-key `count` WINDOW on
  * the fold's own partitioning, asserted by a filter between the
  * window and the fold.
  *
  * Why a window, not a pre-count aggregate + join back: the window
  * rides the SAME keyed exchange the fold needs (Catalyst reuses the
  * hashpartitioning, so the guard adds ZERO scans and ZERO shuffles
  * — the first guard shipped as count-agg + broadcast-join and
  * re-scanned the input, doubling st16's sessionization work), and
  * WindowExec's partition buffer SPILLS where an aggregation buffer
  * cannot — the 10⁸-event hot key survives long enough to reach the
  * named assert, which fires before the fold's collect_list buffer
  * ever starts accumulating that key (the filter sits between them
  * in the same stage).
  *
  * The guard is a FILTER (not a projected column) so Catalyst's
  * column pruning cannot eliminate the effect; on a clean corpus
  * every row passes and the fold's plan below it is unchanged.
  * Operators that collect answer-bounded groups (dedup signature
  * families, fixed-64-dim vector re-assembly) don't need it — their
  * buffer size is bounded by the answer, not by key traffic.
  */
object SeriesGuard {

  /** 10M events ≈ low-GB of buffered (ts, id, value) structs — the
    * point where one key's buffer threatens a 4-8 GB task heap and
    * the streaming twin is the right tool anyway.
    */
  val DefaultMaxSeriesLen = 10000000L

  def boundedSeries(df: DataFrame, keyCols: Seq[String],
                    maxSeriesLen: Long = DefaultMaxSeriesLen): DataFrame = {
    require(maxSeriesLen > 0, "maxSeriesLen must be positive")
    val byKey = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
    // concat_ws throughout, never concat (ADVICE r9): concat returns
    // NULL if ANY fragment is null, and a hot key CONTAINING a null
    // key column would then trip assert_true with a null message —
    // defeating the named-failure contract exactly when it fires.
    // Each key column is additionally coalesced to the string "null"
    // so the key renders positionally intact (concat_ws alone SKIPS
    // nulls, which would mis-align multi-column keys).
    val msg = concat_ws("",
      lit(s"graft SeriesGuard: per-key series exceeds maxSeriesLen=$maxSeriesLen for key ("),
      concat_ws(",", keyCols.map(c => coalesce(col(c).cast("string"), lit("null"))): _*),
      lit("): "), col("__series_len").cast("string"),
      lit(" events. This batch fold buffers each key's full series in one " +
        "aggregation buffer; route unbounded keys through the streaming twin " +
        "(graft.streaming.StatefulTwins) or raise maxSeriesLen explicitly."))
    df.withColumn("__series_len", count(lit(1)).over(byKey))
      .filter(assert_true(col("__series_len") <= maxSeriesLen, msg).isNull)
      .drop("__series_len")
  }
}
