package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.GraftFunctions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Three tiers:
  *  - bruteForceKnn: exact top-k — the correctness baseline. O(Q·N);
  *    only sane when Q is small or N fits a broadcast.
  *  - lshKnn: random-hyperplane LSH — corpus is bucketed once (narrow
  *    map), queries probe their bucket plus single-bit-flip neighbors
  *    (multiprobe); candidate scoring touches O(N/2^bits · probes)
  *    vectors per query. This is the 100 TB path.
  *  - ivfKnn: IVF — coarse quantizer assigns each vector to its
  *    nearest centroid cell (one narrow map against broadcast
  *    centroids); queries probe the nprobe nearest cells.
  */
object Similarity {

  /** Exact top-k cosine neighbors for each query vector. */
  def bruteForceKnn(queries: DataFrame, corpus: DataFrame, k: Int = 10): DataFrame = {
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val c = corpus.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    broadcast(q).join(c, col("q_id") =!= col("n_id"))
      .withColumn("cos", cosine_sim(col("q_emb"), col("n_emb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("rank").cast("long").as("rank"), round(col("cos"), 6).as("cosine"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** LSH ANN: bucket corpus by hyperplane signs; queries probe their
    * own bucket and all single-bit flips, then score candidates
    * exactly and keep top-k.
    */
  def lshKnn(queries: DataFrame, corpus: DataFrame, k: Int = 10,
             numPlanes: Int = 16, seed: Long = 42L): DataFrame = {
    val c = corpus
      .select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
      .withColumn("bucket", hyperplane_bucket(col("n_emb"), numPlanes, seed))
    val q = queries
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      .withColumn("bucket0", hyperplane_bucket(col("q_emb"), numPlanes, seed))
      // multiprobe: own bucket + all buckets within hamming distance 2
      // (recall/candidate-count tradeoff; at scale tune probes vs planes)
      .withColumn("probe", explode(expr(
        s"""array_distinct(concat(
           |  array(int(bucket0)),
           |  transform(sequence(0, ${numPlanes - 1}), i -> int(bucket0) ^ shiftleft(1, i)),
           |  flatten(transform(sequence(0, ${numPlanes - 2}),
           |    i -> transform(sequence(i + 1, ${numPlanes - 1}),
           |      j -> int(bucket0) ^ shiftleft(1, i) ^ shiftleft(1, j))))))""".stripMargin)))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    broadcast(q).join(c, col("probe") === col("bucket") && col("q_id") =!= col("n_id"))
      .dropDuplicates("q_id", "n_id")
      .withColumn("cos", cosine_sim(col("q_emb"), col("n_emb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("rank").cast("long").as("rank"), round(col("cos"), 6).as("cosine"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** Best (max-cosine) centroid id for a vector, ties → smallest id.
    * The centroids are plan literals, so this is a pure narrow map —
    * no join, no shuffle — exactly what assignment should cost when
    * the quantizer is k×dim and the corpus is 100 TB.
    */
  private def assignBest(embCol: Column, cents: Array[(Int, Array[Float])]): Column = {
    val scored = array(cents.map { case (cid, e) =>
      struct(cosine_sim(embCol, typedlit(e.toSeq)).as("cos"), lit(-cid).as("ncell"))
    }: _*)
    -array_max(scored).getField("ncell")
  }

  /** The `nprobe` nearest cell ids for a query vector (cos desc, id
    * asc). Same literal-centroid narrow map as [[assignBest]].
    */
  private def probeCells(embCol: Column, cents: Array[(Int, Array[Float])],
                         nprobe: Int): Column = {
    val scored = array(cents.map { case (cid, e) =>
      struct((-cosine_sim(embCol, typedlit(e.toSeq))).as("negcos"), lit(cid).as("cell"))
    }: _*)
    transform(slice(array_sort(scored), 1, nprobe), s => s.getField("cell"))
  }

  /** Lloyd k-means coarse quantizer (cosine geometry), deterministic
    * init (first k vectors by id). Only the k×dim centroid matrix
    * ever reaches the driver — the data never does. Centroids are kept
    * driver-side between iterations and pushed into the plan as
    * literals, so each iteration costs exactly one narrow assignment
    * map plus one (cell, dim) average shuffle; at 100 TB you'd train
    * on a sample with the identical code path.
    */
  private[similarity] def centroidMatrix(corpus: DataFrame, k: Int,
                                         iters: Int): Array[(Int, Array[Float])] = {
    var cents: Array[(Int, Array[Float])] = corpus.orderBy(col("vec_id")).limit(k)
      .select(col("embedding")).collect()
      .zipWithIndex.map { case (r, i) => (i, r.getSeq[Float](0).toArray) }
    var it = 0
    while (it < iters) {
      val means = corpus
        .withColumn("cell_id", assignBest(col("embedding"), cents))
        .select(col("cell_id"), posexplode(col("embedding")).as(Seq("dim", "v")))
        .groupBy(col("cell_id"), col("dim")).agg(avg(col("v")).as("m"))
        .collect()
      val byCell = means.groupBy(_.getAs[Int]("cell_id"))
      cents = cents.map { case (cid, old) =>
        byCell.get(cid) match {
          case Some(rows) =>
            (cid, rows.sortBy(_.getAs[Int]("dim")).map(_.getAs[Double]("m").toFloat))
          case None => (cid, old) // empty cell keeps its previous centroid
        }
      }
      it += 1
    }
    cents
  }

  def kmeansCentroids(corpus: DataFrame, k: Int = 16, iters: Int = 3): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    centroidMatrix(corpus, k, iters).toSeq
      .map { case (cid, e) => (cid, e.toSeq) }
      .toDF("cell_id", "cell_emb")
  }

  /** IVF ANN: assign corpus vectors to nearest-centroid cells, probe
    * the nprobe nearest cells per query. Coarse quantizer = the
    * deterministic Lloyd k-means above.
    */
  def ivfKnn(queries: DataFrame, corpus: DataFrame, k: Int = 10,
             numCells: Int = 16, nprobe: Int = 4): DataFrame = {
    val cents = centroidMatrix(corpus, numCells, iters = 3)
    val c = corpus.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
      .withColumn("cell_id", assignBest(col("n_emb"), cents))
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      .withColumn("cell_id", explode(probeCells(col("q_emb"), cents, nprobe)))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    broadcast(q).join(c, Seq("cell_id"))
      .filter(col("q_id") =!= col("n_id"))
      .dropDuplicates("q_id", "n_id")
      .withColumn("cos", cosine_sim(col("q_emb"), col("n_emb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("rank").cast("long").as("rank"), round(col("cos"), 6).as("cosine"))
      .orderBy(col("q_id"), col("rank"))
  }

  // ---- Verified entry points (query set = every 50th vector) ----

  private def querySet(emb: DataFrame): DataFrame = emb.filter(col("vec_id") % 50 === 0)

  def s1(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    bruteForceKnn(querySet(emb), emb)
  }

  /** Plane count sizes the bucket grid to the corpus: target ~2^planes
    * ≈ corpus/8 so buckets hold ~8 vectors (here 6 planes for ~500
    * vectors; at 100 TB you'd use 20+ planes and the same code).
    */
  def s2(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    lshKnn(querySet(emb), emb, numPlanes = 6)
  }

  def s3(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    ivfKnn(querySet(emb), emb)
  }
}
