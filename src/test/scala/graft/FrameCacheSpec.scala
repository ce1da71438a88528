package graft

import org.apache.spark.sql.functions._

/** FrameCache contract (ADVICE r9, medium): per-session keying, the
  * invalidate/clear refresh hooks, and hit identity. The cache is a
  * JVM-global singleton, so these tests key off OBJECT IDENTITY of
  * the returned frames — a hit returns the SAME DataFrame instance it
  * persisted, a miss builds a new one.
  */
class FrameCacheSpec extends GraftSpecBase {

  private def frame(s: org.apache.spark.sql.SparkSession) = {
    import s.implicits._
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").groupBy($"v").agg(count(lit(1)).as("n"))
  }

  test("same (tag, plan, session) hits: identical instance, still persisted") {
    FrameCache.clear()
    val a = FrameCache.persisted("fcspec_hit", frame(spark))
    val b = FrameCache.persisted("fcspec_hit", frame(spark))
    assert(a eq b, "structurally identical plan in the same session must hit")
    assert(a.storageLevel.useMemory, "hit must stay persisted")
    assert(a.count() == 2)
  }

  test("invalidate(tag) unpersists and forces a rebuild; other tags survive") {
    FrameCache.clear()
    val a = FrameCache.persisted("fcspec_inv", frame(spark))
    val keep = FrameCache.persisted("fcspec_keep", frame(spark))
    FrameCache.invalidate("fcspec_inv")
    assert(a.storageLevel == org.apache.spark.storage.StorageLevel.NONE,
      "invalidate must unpersist the evicted entry")
    val b = FrameCache.persisted("fcspec_inv", frame(spark))
    assert(!(a eq b), "post-invalidate lookup must rebuild, not serve the stale frame")
    assert(FrameCache.persisted("fcspec_keep", frame(spark)) eq keep,
      "invalidate(tag) must not evict other tags")
  }

  test("a structurally identical plan from another session misses (per-session keying)") {
    FrameCache.clear()
    val a = FrameCache.persisted("fcspec_sess", frame(spark))
    val other = spark.newSession()
    val b = FrameCache.persisted("fcspec_sess", frame(other))
    assert(!(a eq b),
      "a plan built on a different SparkSession must never resolve to a frame " +
        "bound to another session")
    assert(b.sparkSession eq other)
  }

  test("clear() empties the cache and unpersists") {
    val a = FrameCache.persisted("fcspec_clear", frame(spark))
    FrameCache.clear()
    assert(a.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
    val b = FrameCache.persisted("fcspec_clear", frame(spark))
    assert(!(a eq b))
    FrameCache.clear()
  }
}
