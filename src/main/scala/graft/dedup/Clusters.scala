package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Near-duplicate clustering: connected components over the near-dup
  * pair graph, so each duplicate GROUP keeps exactly one
  * representative (keep-min-id) — pairwise output alone can't answer
  * "which docs survive".
  *
  * Algorithm: iterative min-label propagation — each node adopts the
  * minimum label in its neighborhood until fixpoint. Iterations are
  * O(diameter); near-dup clusters are small and dense, so this
  * converges in 2-3 rounds. Each round = one join + one aggregate
  * (all distributed; the driver only sees the 1-row convergence
  * check). At extreme graph scale swap in large-star/small-star; the
  * surrounding contract is unchanged.
  */
object Clusters {

  /** @param pairs (a_id, b_id) near-dup edges
    * @param nodes one row per doc_id (isolated docs form their own
    *              singleton clusters)
    * @param driverEdgeLimit when the edge count is at or below this,
    *        union-find runs on the driver (near-dup edge sets are
    *        orders of magnitude smaller than the corpus — even a
    *        100 TB corpus typically yields millions of edges, which is
    *        driver-trivial); above it, distributed min-label
    *        propagation takes over. Only edges ever reach the driver,
    *        never the corpus.
    * @return (doc_id, cluster_id) with cluster_id = min doc_id in the
    *         component
    */
  def connectedComponents(nodes: DataFrame, pairs: DataFrame,
                          maxIters: Int = 20,
                          driverEdgeLimit: Long = 10L * 1000 * 1000): DataFrame = {
    val spark = nodes.sparkSession
    val edges = pairs.select(col("a_id").as("src"), col("b_id").as("dst"))
      .union(pairs.select(col("b_id").as("src"), col("a_id").as("dst")))
      .cache()
    val edgeCount = edges.count()
    val labels =
      if (edgeCount <= driverEdgeLimit) driverUnionFind(spark, edges)
      else propagateMinLabel(edges, maxIters)
    edges.unpersist()
    nodes.select(col("doc_id"))
      .join(labels.withColumnRenamed("cluster_id", "cc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("cc_id"), col("doc_id")).as("cluster_id"))
  }

  /** Path-compressed union-find over a driver-collected edge list. */
  private def driverUnionFind(spark: SparkSession, edges: DataFrame): DataFrame = {
    val es = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x
      while (parent.getOrElse(c, c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    es.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(if (ra < rb) rb else ra) = math.min(ra, rb)
    }
    val out = parent.keys.toSeq.map(x => (x, find(x)))
    import spark.implicits._
    out.toDF("doc_id", "cluster_id")
  }

  /** Distributed min-label propagation (the over-the-limit path):
    * only edge-touched nodes carry loop state, and convergence is a
    * filter over the cached frame — no extra join per round.
    *
    * Every third round the loop frame is `localCheckpoint`ed instead
    * of cached: caching alone keeps the LOGICAL plan chaining one
    * join per round, so by the iteration counts this path exists for
    * (long-diameter graphs past the driver limit) planning and task
    * serialization cost grows linearly with rounds — checkpointing
    * truncates the lineage to the materialized blocks. Local (not
    * HDFS) checkpoint is the right trade here: the frame is loop
    * state that is rebuilt from the cached edges on executor loss.
    */
  private def propagateMinLabel(edges: DataFrame, maxIters: Int,
                                checkpointEvery: Int = 3): DataFrame = {
    var labels = edges.select(col("src").as("doc_id")).distinct()
      .withColumn("cluster_id", col("doc_id")).cache()
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      val neighborMin = edges.join(labels, edges("dst") === labels("doc_id"))
        .groupBy(col("src")).agg(min(col("cluster_id")).as("nmin"))
      val step = labels.join(neighborMin, labels("doc_id") === neighborMin("src"), "left")
        .select(col("doc_id"),
          least(col("cluster_id"), coalesce(col("nmin"), col("cluster_id"))).as("cluster_id"),
          (coalesce(col("nmin"), col("cluster_id")) < col("cluster_id")).as("changed"))
      val updated =
        if (i % checkpointEvery == checkpointEvery - 1) step.localCheckpoint()
        else step.cache()
      val changes = updated.filter(col("changed")).count()
      labels.unpersist()
      labels = updated
      converged = changes == 0
      i += 1
    }
    labels.select(col("doc_id"), col("cluster_id"))
  }

  /** d6: cluster the exact-Jaccard near-dup pairs and emit only docs
    * in non-singleton clusters with their keep/drop verdict. Uses the
    * SHARED persisted pair set (one pair computation feeds both d4
    * and d6 — the pair query and its clustering consumer never pay
    * for the pairs twice), and exact edges make the whole operator
    * verifiable by the SQL oracle (transitive closure over the d4
    * pair set). `connectedComponents` itself is edge-source-agnostic;
    * minhash/simhash pair sets plug in unchanged.
    */
  def d6(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"))
    val pairs = Dedup.cachedJaccardPairs(spark, dir)
    val cc = connectedComponents(docs, pairs.select("a_id", "b_id"))
    val sizes = cc.groupBy(col("cluster_id")).agg(count(lit(1)).as("cluster_size"))
    cc.join(sizes, "cluster_id")
      .filter(col("cluster_size") > 1)
      .withColumn("keep", col("doc_id") === col("cluster_id"))
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"), col("keep"))
      .orderBy(col("doc_id"))
  }
}
