package graft

import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Proves the x1/x8/x11 "retry-invariant" claim under an ACTUAL task
  * retry, not just a repartition: a mapPartitions stage upstream of
  * the sampling maps throws on the FIRST attempt of one partition,
  * Spark re-runs that task (the test session master is local[4, 2]),
  * and the sampled/split/resampled output must be bit-identical to a
  * fault-free run. This is the speculative-execution / lost-executor
  * scenario at 100 TB: a deterministic per-id draw re-produces the
  * same keep decision on the re-run, where rand() would not.
  */
class RetrySpec extends GraftSpecBase {

  /** Inject a first-attempt failure into partition 0 of `df`'s
    * current stage. attemptNumber() is per task attempt, so the
    * retried attempt (1) passes — every action over the frame pays
    * exactly one injected failure + one retry.
    */
  private def withInjectedFault(df: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(df.schema)
    df.mapPartitions { it =>
      val tc = TaskContext.get()
      if (tc != null && tc.partitionId() == 0 && tc.attemptNumber() == 0)
        throw new RuntimeException("injected fault: first attempt of partition 0")
      it
    }(enc)
  }

  test("injected first-attempt failure actually retries (sanity: job succeeds, rows intact)") {
    val docs = Tables.documents(spark, sf).select("doc_id")
    assert(withInjectedFault(docs).count() == docs.count())
  }

  test("x1 hash sample is bit-identical under a task retry") {
    val docs = Tables.documents(spark, sf).select("doc_id", "source")
    def run(src: DataFrame): Set[(Long, String)] =
      text.Curation.hashSample(src, "doc_id", 30).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(run(withInjectedFault(docs)) == run(docs))
  }

  test("x8 hash split routes every doc to the same bucket under a task retry") {
    val docs = Tables.documents(spark, sf).select("doc_id")
    def run(src: DataFrame): Set[(Long, Long, String)] =
      text.Curation.hashSplit(src, "doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(run(withInjectedFault(docs)) == run(docs))
  }

  test("x11 weighted sample keeps the same doc set under a task retry") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"),
      (pmod(col("doc_id"), lit(100)).cast("double") / 100.0).as("w"))
    def run(src: DataFrame): Set[Long] =
      text.Curation.qualityWeightedSample(src, "doc_id", col("w"))
        .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(run(withInjectedFault(docs)) == run(docs))
  }
}
