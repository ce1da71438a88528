package graft

import org.apache.spark.sql.DataFrame
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
  * Keyed on (tag, canonicalized logical plan): plan equality is
  * structural, so a repeat invocation over the same input reuses the
  * SAME persisted intermediate instead of stacking a second copy —
  * the d4 `cachedJaccardPairs` behavior generalized to arbitrary
  * input frames.
  */
object FrameCache {

  private val maxEntries = 16

  private val cache =
    new java.util.LinkedHashMap[(String, LogicalPlan), DataFrame](
      maxEntries * 2, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, LogicalPlan), DataFrame]): Boolean =
        if (size() > maxEntries) { e.getValue.unpersist(false); true }
        else false
    }

  def persisted(tag: String, df: DataFrame): DataFrame = cache.synchronized {
    val key = (tag, df.queryExecution.logical.canonicalized)
    val hit = cache.get(key)
    if (hit != null) hit
    else { val p = df.persist(); cache.put(key, p); p }
  }
}
