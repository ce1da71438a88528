package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bounded persist cache for reused intermediates (ADVICE r8 item 4).
  *
  * Several operators persist a frame that feeds two or more consumers
  * inside one returned plan (simhash signature families, pageRank's
  * degree-decorated edges, tf-idf's term-frequency table, the
  * anisotropy per-dim reduction). A bare `.persist()` there leaks:
  * the consuming action happens in the CALLER (the returned frame is
  * lazy), so the function can never unpersist, and a long session
  * accumulates executor storage with every invocation.
  *
  * This cache bounds that storage the way centroidCache/mergeCache
  * bound theirs: at most [[maxEntries]] persisted frames live at
  * once, LRU-evicted with an unpersist. Eviction is always SAFE —
  * unpersist never breaks a consumer, it only makes a recompute
  * (lineage is intact; this is a cache, not a checkpoint — no
  * truncation, so lost executors at cluster scale degrade to
  * recompute, never job failure).
  *
  * Keyed on (session, tag, canonicalized logical plan) — ADVICE r9:
  * plan equality is structural, so a repeat invocation over the same
  * input reuses the SAME persisted intermediate instead of stacking a
  * second copy, but the SESSION in the key stops a structurally-equal
  * plan from another (or a restarted) SparkSession resolving to a
  * frame bound to the wrong/dead session. Entries whose session has
  * stopped are dropped eagerly on every access.
  *
  * SNAPSHOT SEMANTICS: a hit returns the frame as persisted at first
  * build. If the underlying files change (compaction, rewrite, an
  * appended day), a structurally identical read plan still hits the
  * OLD data — callers mutating a source they previously cached under
  * `tag` must call [[invalidate]] (or [[clear]]) first, exactly like
  * Spark's own `REFRESH TABLE` after an external write.
  */
object FrameCache {

  private val maxEntries = 16

  private val cache =
    new java.util.LinkedHashMap[(SparkSession, String, LogicalPlan), DataFrame](
      maxEntries * 2, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(SparkSession, String, LogicalPlan), DataFrame]): Boolean =
        if (size() > maxEntries) { e.getValue.unpersist(false); true }
        else false
    }

  private def dropStopped(): Unit = {
    val it = cache.entrySet().iterator()
    while (it.hasNext) {
      if (it.next().getKey._1.sparkContext.isStopped) it.remove()
    }
  }

  def persisted(tag: String, df: DataFrame): DataFrame = cache.synchronized {
    dropStopped()
    val key = (df.sparkSession, tag, df.queryExecution.logical.canonicalized)
    val hit = cache.get(key)
    if (hit != null) hit
    else { val p = df.persist(); cache.put(key, p); p }
  }

  /** Unpersist and drop every entry cached under `tag` (any session,
    * any input plan) — the refresh hook for mutable sources.
    */
  def invalidate(tag: String): Unit = cache.synchronized {
    val it = cache.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._2 == tag) {
        if (!e.getKey._1.sparkContext.isStopped) e.getValue.unpersist(false)
        it.remove()
      }
    }
  }

  /** Unpersist and drop everything. */
  def clear(): Unit = cache.synchronized {
    val it = cache.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (!e.getKey._1.sparkContext.isStopped) e.getValue.unpersist(false)
      it.remove()
    }
  }
}
