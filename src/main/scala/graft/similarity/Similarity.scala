package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, GraftBridge, SparkSession}
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

  /** LSH ANN: bucket corpus by hyperplane signs; queries probe every
    * bucket within `probeHamming` bit flips of their own, then score
    * candidates exactly and keep top-k. Probe fraction ≈
    * Σ C(planes, 0..probeHamming) / 2^planes of the corpus — the
    * recall/candidate-count dial: more planes + small radius when
    * true neighbors are near (the 100 TB near-dup case), fewer planes
    * + wide radius when neighbors sit close to the noise floor.
    */
  def lshKnn(queries: DataFrame, corpus: DataFrame, k: Int = 10,
             numPlanes: Int = 16, seed: Long = 42L,
             probeHamming: Int = 2): DataFrame = {
    val c = corpus
      .select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
      .withColumn("bucket", hyperplane_bucket(col("n_emb"), numPlanes, seed))
    // C(planes, 0..probeHamming) masks, built combinatorially — a
    // 2^planes scan would hang the driver at the large plane counts
    // the bucket-size math wants on big corpora
    val masks = (0 to probeHamming).flatMap(h =>
      (0 until numPlanes).combinations(h).map(_.map(1 << _).sum))
    val q = queries
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      .withColumn("bucket0", hyperplane_bucket(col("q_emb"), numPlanes, seed))
      .withColumn("probe", explode(array(masks.map(m => expr(s"int(bucket0) ^ $m")): _*)))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    broadcast(q).join(c, col("probe") === col("bucket") && col("q_id") =!= col("n_id"))
      // score before the dedup/window exchanges (s27's lesson):
      // multiprobe duplicates score identically, and the shuffles
      // then never carry the embedding payloads
      .withColumn("cos", cosine_sim(col("q_emb"), col("n_emb")))
      .select(col("q_id"), col("n_id"), col("cos"))
      .dropDuplicates("q_id", "n_id")
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
  private[graft] def assignBest(embCol: Column, cents: Array[(Int, Array[Float])]): Column = {
    require(cents.zipWithIndex.forall { case ((cid, _), i) => cid == i },
      "centroid ids must be their array positions")
    GraftBridge.column(graft.functions.BestCell(
      GraftBridge.expression(embCol), cents.toSeq.map(_._2.toSeq)))
  }

  /** The `nprobe` nearest cell ids for a query vector (cos desc, id
    * asc). Same literal-centroid narrow map as [[assignBest]].
    */
  private def probeCells(embCol: Column, cents: Array[(Int, Array[Float])],
                         nprobe: Int): Column = {
    require(cents.zipWithIndex.forall { case ((cid, _), i) => cid == i },
      "centroid ids must be their array positions")
    GraftBridge.column(graft.functions.NearestCells(
      GraftBridge.expression(embCol), cents.toSeq.map(_._2.toSeq), nprobe))
  }

  /** Lloyd k-means coarse quantizer (cosine geometry), deterministic
    * init (first k sample vectors by id).
    *
    * The quantizer is SMALL-data by construction — the model is k×dim
    * floats and a representative training set needs O(k · oversample)
    * vectors, both constants independent of corpus size. So training
    * touches the corpus exactly once, with a narrow deterministic
    * hash-sample filter + bounded top-k-by-id collect (≤ sampleCap
    * vectors ≈ a few MB); every Lloyd iteration then runs driver-side
    * over primitive arrays — zero cluster shuffles per iteration,
    * versus the full-corpus posexplode aggregation this replaces. The
    * 100 TB corpus is only ever touched by the narrow literal-centroid
    * assignment map in [[ivfKnn]].
    */
  /** Training-sample selector: deterministic id-mod (replay-stable,
    * partition-independent, and — unlike a hash — replayable by the
    * SQL oracle). For adversarial id distributions (e.g. ids striped
    * by source) pass a hash-based predicate instead:
    * `pmod(xxhash64(col("vec_id")), lit(mod)) === 0`.
    */
  /** The bounded deterministic training sample, collected: the
    * mod-`sampleMod` rows in vec_id order (capped), with the
    * degenerate-corpus fallback (DegenerateSpec's law) to the first
    * `sampleCap` non-null vectors when the mod-sample is empty —
    * null embeddings never enter a trainer (a null in the collect
    * would also NPE driver-side). Shared by the IVF/PQ trainers and
    * by reports that measure the sample itself (s24), which reuse
    * the returned array instead of re-scanning the corpus.
    */
  private[graft] def trainerSample(corpus: DataFrame, sampleMod: Int = 4,
                                   sampleCap: Int = 20000,
                                   samplePredicate: Option[Column] = None): Array[Array[Float]] = {
    val pred = samplePredicate.getOrElse(pmod(col("vec_id"), lit(sampleMod)) === 0)
    val primary: Array[Array[Float]] = corpus
      .filter(col("embedding").isNotNull).filter(pred)
      .orderBy(col("vec_id")).limit(sampleCap) // TakeOrdered: no full sort shuffle
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toArray)
    // Degenerate fallback (DegenerateSpec's law) applies ONLY to the
    // default mod-sample: an explicit samplePredicate SCOPES the
    // trainer, so when it selects nothing the sample IS empty —
    // silently re-sampling outside the caller's predicate would train
    // on rows the caller excluded and diverge from its oracle
    // (ADVICE r11).
    if (primary.nonEmpty || samplePredicate.isDefined) primary
    else corpus.filter(col("embedding").isNotNull)
      .orderBy(col("vec_id")).limit(sampleCap)
      .select(col("embedding")).collect().map(_.getSeq[Float](0).toArray)
  }

  private[similarity] def centroidMatrix(corpus: DataFrame, k: Int, iters: Int,
                                         sampleMod: Int = 4,
                                         sampleCap: Int = 20000,
                                         samplePredicate: Option[Column] = None): Array[(Int, Array[Float])] = {
    // An EMPTY corpus trains k placeholder centroids that no row will
    // ever be assigned against (assignment maps over zero rows), so
    // every downstream frame is correctly empty with its contract
    // schema. A sample smaller than k clamps k — Lloyd with k > n has
    // no meaningful extra cells anyway.
    val sample = trainerSample(corpus, sampleMod, sampleCap, samplePredicate)
    if (sample.isEmpty)
      return Array.tabulate(k)(i => (i, Array(1f)))
    centroidsFromSample(sample, k, iters)
  }

  /** The Lloyd loop over an ALREADY-COLLECTED non-empty sample —
    * split out so cell-anchored reports (s26) can take the sample
    * once, decide the empty-corpus contract themselves (empty frame,
    * not placeholder cells), and train without a second corpus scan.
    */
  private[similarity] def centroidsFromSample(sample: Array[Array[Float]],
                                              k: Int, iters: Int): Array[(Int, Array[Float])] = {
    require(sample.nonEmpty, "centroidsFromSample requires a non-empty sample")
    val kEff = math.min(k, sample.length)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      val denom = math.sqrt(na) * math.sqrt(nb)
      if (denom == 0.0) -2.0 else dot / denom
    }
    var cents: Array[Array[Float]] = Array.tabulate(kEff)(i => sample(i))
    var it = 0
    while (it < iters) {
      val dim = cents(0).length
      val sums = Array.fill(kEff)(new Array[Double](dim))
      val counts = new Array[Long](kEff)
      sample.foreach { v =>
        var best = 0; var bestCos = -3.0
        var c = 0
        while (c < kEff) {
          val s = cos(v, cents(c))
          if (s > bestCos) { bestCos = s; best = c } // ties → smallest cell id
          c += 1
        }
        val acc = sums(best)
        var d = 0
        while (d < dim) { acc(d) += v(d); d += 1 }
        counts(best) += 1
      }
      cents = Array.tabulate(kEff) { c =>
        if (counts(c) == 0) cents(c) // empty cell keeps its previous centroid
        else Array.tabulate(dim)(d => (sums(c)(d) / counts(c)).toFloat)
      }
      it += 1
    }
    cents.zipWithIndex.map { case (e, i) => (i, e) }
  }

  /** Product-quantization codebooks: `m` independent L2 Lloyd
    * k-means runs, one per `subDim`-wide embedding slice, over the
    * same bounded deterministic sample as [[centroidMatrix]] (the
    * model is m·ksub·subDim floats — constants; training never
    * depends on corpus scale). Init = the first ksub sample slices
    * in vec_id order; assignment = argmin squared L2 with ties to
    * the smaller code; update = per-dim mean accumulated in vec_id
    * order and rounded to float32 each iteration — the ordered-sum +
    * re-rounding discipline that lets the SQL oracle replay training
    * bit-exactly (same technique as the IVF trainer).
    */
  def pqCodebooks(corpus: DataFrame, m: Int, ksub: Int,
                  iters: Int, sampleMod: Int = 4,
                  sampleCap: Int = 20000): Array[Array[Array[Float]]] = {
    // Same degenerate-corpus laws as [[centroidMatrix]]: an empty
    // corpus gets placeholder codebooks no row will ever encode
    // against; a sample smaller than ksub clamps ksub (callers derive
    // the LUT stride from the returned codebook width, so a clamped
    // model stays internally consistent).
    val sample = trainerSample(corpus, sampleMod, sampleCap)
    if (sample.isEmpty)
      return Array.fill(m)(Array.fill(ksub)(Array(0f)))
    val ksubEff = math.min(ksub, sample.length)
    val dim = sample(0).length
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val subDim = dim / m
    Array.tabulate(m) { s =>
      val off = s * subDim
      var cents: Array[Array[Float]] =
        Array.tabulate(ksubEff)(i => sample(i).slice(off, off + subDim))
      var it = 0
      while (it < iters) {
        val sums = Array.fill(ksubEff)(new Array[Double](subDim))
        val counts = new Array[Long](ksubEff)
        sample.foreach { v =>
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < ksubEff) {
            val ce = cents(c)
            var acc = 0.0; var d = 0
            while (d < subDim) {
              val diff = v(off + d).toDouble - ce(d).toDouble
              acc += diff * diff; d += 1
            }
            if (acc < bestD) { bestD = acc; best = c }
            c += 1
          }
          val acc = sums(best)
          var d = 0
          while (d < subDim) { acc(d) += v(off + d).toDouble; d += 1 }
          counts(best) += 1
        }
        cents = Array.tabulate(ksubEff) { c =>
          if (counts(c) == 0) cents(c)
          else Array.tabulate(subDim)(d => (sums(c)(d) / counts(c)).toFloat)
        }
        it += 1
      }
      cents
    }
  }

  private val pqCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Int, Int, Int), Array[Array[Array[Float]]]]()

  private[similarity] def cachedPqCodebooks(corpus: DataFrame, m: Int, ksub: Int,
                                            iters: Int, cacheKey: Option[String]): Array[Array[Array[Float]]] =
    cacheKey match {
      case Some(key) =>
        pqCache.computeIfAbsent((key, m, ksub, iters),
          _ => pqCodebooks(corpus, m, ksub, iters))
      case None => pqCodebooks(corpus, m, ksub, iters)
    }

  /** PQ KNN with asymmetric distance (ADC): the corpus is stored as
    * m small codes per vector — at m=8, a 256-byte float32 embedding
    * becomes 8 bytes, a 32× scan compression (vs s4's 4×) — and each
    * query scores a candidate with m table lookups instead of a
    * 64-dim loop. Corpus side: one narrow [[PqEncode]] map (literal
    * codebooks, no shuffle — the codes would be written next to the
    * table once at 100 TB). Query side: [[PqAdcTable]] builds the
    * per-query distance tables; the broadcast join then ranks by the
    * looked-up squared-L2 sum, folded subspace 0→m−1 (fixed order:
    * the oracle replays it term by term). On unit-norm embeddings
    * L2 order is cosine order, so ranks compare directly to s1/s4.
    */
  def pqKnn(queries: DataFrame, corpus: DataFrame, k: Int = 10,
            m: Int = 8, ksub: Int = 16, iters: Int = 2,
            cacheKey: Option[String] = None): DataFrame = {
    val books = cachedPqCodebooks(corpus, m, ksub, iters, cacheKey)
    val lit3: Seq[Seq[Seq[Float]]] = books.map(_.map(_.toSeq).toSeq).toSeq
    // LUT stride = the codebook's ACTUAL width (the trainer clamps
    // ksub on degenerate corpora smaller than ksub rows)
    val ksubEff = books.headOption.map(_.length).getOrElse(ksub)
    val c = corpus.select(col("vec_id").as("n_id"),
      pq_encode(col("embedding"), lit3).as("codes"))
    val q = queries.select(col("vec_id").as("q_id"),
      pq_adc_table(col("embedding"), lit3).as("luts"))
    val dist = (0 until m).map { s =>
      element_at(col("luts"),
        element_at(col("codes"), s + 1) + lit(s * ksubEff) + lit(1))
    }.reduceLeft(_ + _)
    val w = Window.partitionBy(col("q_id")).orderBy(col("pq_dist2").asc, col("n_id"))
    broadcast(q).join(c, col("q_id") =!= col("n_id"))
      .withColumn("pq_dist2", dist)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("rank").cast("long").as("rank"),
        round(col("pq_dist2"), 6).as("pq_dist2"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** Cross-call quantizer cache: training is deterministic in
    * (corpus key, k, iters), so repeated queries against the same
    * corpus reuse the centroid matrix instead of re-reading the
    * sample.
    */
  private val centroidCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Int, Int), Array[(Int, Array[Float])]]()

  /** Corpus-derived cell count — d9's n/targetCellSize sizing ported
    * to the whole IVF family (VERDICT r12 item 1): k =
    * clamp(ceil(n / targetCellSize), 16, 1 << 20), n = NON-NULL
    * embeddings (the only rows a trainer ingests or an assignment
    * maps — the same population the oracle's `e` CTE counts, so the
    * SQL replay derives the identical k at any corpus size). The
    * within-cell/probed-cell work of every consumer is per-key
    * bounded only if the cell count GROWS with the corpus — at a
    * fixed k the mean cell holds n/k vectors and in-cell pair work
    * is O(n²/k), quadratic again (d9's law). targetCellSize 128
    * keeps expected cell population constant as the corpus grows;
    * the floor 16 preserves the verified-scale quantizer exactly
    * (every test corpus derives the old default, so results are
    * bit-identical there), and the cap bounds the driver-side Lloyd
    * model (kEff additionally clamps to the 20k trainer sample).
    * The count is one metadata-cheap aggregate, cached per
    * (cacheKey, targetCellSize) alongside the centroid cache so a
    * corpus pays it once across the family.
    */
  private val cellCountCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), Integer]()

  private[graft] def derivedNumCells(corpus: DataFrame,
                                     targetCellSize: Int = 128,
                                     cacheKey: Option[String] = None): Int = {
    def compute: Int = {
      val n = corpus.filter(col("embedding").isNotNull).count()
      math.min(1L << 20, math.max(16L, (n + targetCellSize - 1) / targetCellSize)).toInt
    }
    cacheKey match {
      case Some(key) =>
        cellCountCache.computeIfAbsent((key, targetCellSize), _ => compute).intValue()
      case None => compute
    }
  }

  /** `numCells <= 0` (the family default) derives from the corpus;
    * an explicit positive value pins the quantizer (fixed-model
    * reports s24/s26, specs, replays of a stored assignment).
    */
  private[graft] def resolveCells(corpus: DataFrame, numCells: Int,
                                  cacheKey: Option[String]): Int =
    if (numCells > 0) numCells
    else derivedNumCells(corpus, cacheKey = cacheKey)

  private[graft] def cachedCentroids(corpus: DataFrame, k: Int, iters: Int,
                                          cacheKey: Option[String]): Array[(Int, Array[Float])] =
    cacheKey match {
      case Some(key) =>
        centroidCache.computeIfAbsent((key, k, iters), _ => centroidMatrix(corpus, k, iters))
      case None => centroidMatrix(corpus, k, iters)
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
    * sample-trained deterministic Lloyd k-means above; the default
    * cell count derives from the corpus ([[derivedNumCells]]) so the
    * probed fraction stays a constant share of constant-sized cells
    * as the corpus grows.
    *
    * `corpusPredicate` is FILTERED SEARCH (s10): restrict neighbors
    * to corpus vectors passing a metadata predicate (label/language/
    * license/date gates — every production vector search has one).
    * The quantizer still trains on the FULL corpus, so cell geometry
    * is stable across filters (standard IVF filtered-search
    * practice — per-filter retraining would invalidate every stored
    * assignment); the predicate composes into the same narrow
    * assignment map and, when it references scan columns, pushes
    * down to the parquet scan itself (plan-pinned in s10's spec).
    */
  def ivfKnn(queries: DataFrame, corpus: DataFrame, k: Int = 10,
             numCells: Int = 0, nprobe: Int = 4,
             cacheKey: Option[String] = None,
             corpusPredicate: Option[Column] = None): DataFrame = {
    val kCells = resolveCells(corpus, numCells, cacheKey)
    val cents = cachedCentroids(corpus, kCells, iters = 3, cacheKey)
    val c = corpusPredicate.fold(corpus)(corpus.filter)
      .select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
      .withColumn("cell_id", assignBest(col("n_emb"), cents))
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      .withColumn("cell_id", explode(probeCells(col("q_emb"), cents, nprobe)))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    broadcast(q).join(c, Seq("cell_id"))
      .filter(col("q_id") =!= col("n_id"))
      // score before the dedup/window exchanges (s27's lesson): the
      // multiprobe duplicates score identically, so deduping the
      // scored narrow frame is equivalent and the shuffles never
      // carry the embedding payloads
      .withColumn("cos", cosine_sim(col("q_emb"), col("n_emb")))
      .select(col("q_id"), col("n_id"), col("cos"))
      .dropDuplicates("q_id", "n_id")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("rank").cast("long").as("rank"), round(col("cos"), 6).as("cosine"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** Exact radius (range) search: every corpus neighbor with cosine
    * >= tau — the other half of the vector-store API surface (top-k
    * bounds the RESULT size, radius bounds the QUALITY; near-dup
    * audits and recall studies want the latter). Plan: broadcast the
    * bounded query set, stream the corpus through one narrow
    * scan-score-filter — no shuffle, no window state, one pass over a
    * 100 TB corpus, embarrassingly parallel. Membership is decided on
    * the ROUNDED cosine (6 dp) so an oracle replay can't flip a
    * borderline pair on fp summation-order differences.
    */
  def rangeSearch(queries: DataFrame, corpus: DataFrame, tau: Double): DataFrame = {
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val c = corpus.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
    broadcast(q).join(c, col("q_id") =!= col("n_id"))
      .withColumn("cosine", round(cosine_sim(col("q_emb"), col("n_emb")), 6))
      .filter(col("cosine") >= tau)
      .select(col("q_id"), col("n_id"), col("cosine"))
  }

  /** IVF-pruned radius search: same contract as [[rangeSearch]] but
    * scores only the nprobe closest quantizer cells per query — the
    * scale path when tau sits in the near-dup regime, where true
    * neighbors concentrate in few cells and the scan prunes
    * ~numCells/nprobe×. Approximate exactly like [[ivfKnn]]; recall
    * vs the exact path is measured in SimilaritySpec.
    */
  def ivfRangeSearch(queries: DataFrame, corpus: DataFrame, tau: Double,
                     numCells: Int = 0, nprobe: Int = 4,
                     cacheKey: Option[String] = None): DataFrame = {
    val kCells = resolveCells(corpus, numCells, cacheKey)
    val cents = cachedCentroids(corpus, kCells, iters = 3, cacheKey)
    val c = corpus.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
      .withColumn("cell_id", assignBest(col("n_emb"), cents))
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      .withColumn("cell_id", explode(probeCells(col("q_emb"), cents, nprobe)))
    broadcast(q).join(c, Seq("cell_id"))
      .filter(col("q_id") =!= col("n_id"))
      // score-then-narrow before the dedup exchange (s27's lesson);
      // the tau filter additionally shrinks the shuffle to hits only
      .withColumn("cosine", round(cosine_sim(col("q_emb"), col("n_emb")), 6))
      .filter(col("cosine") >= tau)
      .select(col("q_id"), col("n_id"), col("cosine"))
      .dropDuplicates("q_id", "n_id")
  }

  // ---- Verified entry points ------------------------------------
  // Audit query set: every 50th vector, CAPPED at a fixed id range —
  // at most 512 queries (ids 0, 50, …, 25550) no matter how large the
  // corpus grows. The r8 soak showed the uncapped `% 50` rule made
  // the brute-force audit entries (s1/s4/s5/s9/s23) quadratic in the
  // corpus (queries × corpus both grew), which is a property of the
  // AUDIT SAMPLING, not the library functions (they take an arbitrary
  // query frame). The cap is a plain id predicate rather than a
  // mix64 draw or a rank: a draw is rate-based (still corpus-
  // proportional) and a top-N rank adds a global sort to every audit
  // entry; `vec_id < 25600` is exact, orderless, and spelled
  // identically in the DuckDB oracles. At the verified SFs
  // (n ≤ 2000) the cap is a no-op, so oracle results are unchanged;
  // at derived 10×/50× rungs (copies shifted +10M) it pins the query
  // budget to the base corpus and the entries go corpus-linear.

  private val queryIdCap = 25600L

  private def querySet(emb: DataFrame): DataFrame =
    emb.filter(col("vec_id") % 50 === 0 && col("vec_id") < queryIdCap)

  def s1(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.vectors(spark, dir)
    bruteForceKnn(querySet(emb), emb)
  }

  /** Parameters are recall-first for THIS corpus: its true top-10
    * neighbors sit at the 64-dim noise floor (cos ≈ 0.3-0.6), where
    * LSH discriminates weakly — 4 planes probed to hamming ≤ 3 scans
    * 15/16 of the corpus and measures recall 0.98 (the ≥0.9 spec
    * gate). On a real near-dup corpus (cos ≳ 0.9) the same code hits
    * ≥0.9 recall with 12+ planes probing ≤1 flip — a 100-1000× prune
    * (SimilaritySpec's planted-neighbor gate).
    */
  def s2(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.vectors(spark, dir)
    lshKnn(querySet(emb), emb, numPlanes = 4, probeHamming = 3)
  }

  /** nprobe 12/16 is, like s2, recall-first for noise-floor
    * neighbors (measured 0.92-0.95 vs s1, gated ≥0.9); clustered
    * corpora concentrate true neighbors in few cells and probe 2-4 of
    * hundreds.
    */
  def s3(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.vectors(spark, dir)
    ivfKnn(querySet(emb), emb, nprobe = 12, cacheKey = Some(dir))
  }

  /** Scalar-quantized (int8) KNN: per-vector symmetric quantization
    * q_i = floor(x_i/scale·127 + 0.5) with scale = max|x_i|, then
    * top-k by the QUANTIZED cosine (integer dot product and integer
    * norms, divided in double). The 100 TB memory/IO lever: float32
    * embeddings shrink 4× (a 100 TB vector store becomes 25 TB of
    * scan), and at 64 dims the per-vector scale keeps quantized
    * rankings near-exact (recall gated ≥0.9 against s1 in
    * SimilaritySpec). Composes with IVF — in production the int8
    * codes live inside the cells; here the brute-force form isolates
    * the quantization math so the oracle can replay it bit-exactly
    * (integer arithmetic has no summation-order problem).
    *
    * Every float enters the math through an explicit double cast —
    * Spark promotes float division to double while DuckDB keeps it
    * float, so without the cast the two engines would quantize a
    * hair apart.
    */
  /** Per-vector int8 scalar quantization: id, q (int8 codes as
    * longs), and the integer squared norm. Shared by s4/s5 (KNN) and
    * s8 (MMR diversification) so every consumer quantizes
    * bit-identically.
    */
  private[similarity] def quantizeVecs(df: DataFrame, idAs: String,
                                       qAs: String, nAs: String): DataFrame =
    df.select(col("vec_id").as(idAs),
        col("embedding").cast("array<double>").as("e"))
      .withColumn("scale", array_max(transform(col("e"), x => abs(x))))
      .withColumn(qAs, when(col("scale") === 0d,
          transform(col("e"), _ => lit(0L)))
        .otherwise(transform(col("e"),
          x => floor(x / col("scale") * lit(127.0) + lit(0.5)).cast("long"))))
      .withColumn(nAs, aggregate(transform(col(qAs), v => v * v), lit(0L), _ + _))
      .drop("e", "scale")

  def scalarQuantKnn(queries: DataFrame, corpus: DataFrame, k: Int = 10): DataFrame = {
    val q = quantizeVecs(queries, "q_id", "qq", "qn")
    val c = quantizeVecs(corpus, "n_id", "cq", "cn")
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos8").desc, col("n_id"))
    broadcast(q).join(c, col("q_id") =!= col("n_id"))
      .withColumn("dot8", aggregate(zip_with(col("qq"), col("cq"), _ * _), lit(0L), _ + _))
      .withColumn("cos8", when(col("qn") === 0L || col("cn") === 0L, lit(0.0))
        .otherwise(col("dot8").cast("double") /
          (sqrt(col("qn").cast("double")) * sqrt(col("cn").cast("double")))))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("rank").cast("long").as("rank"),
        round(col("cos8"), 6).as("cosine_q8"))
      .orderBy(col("q_id"), col("rank"))
  }

  def s4(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.vectors(spark, dir)
    scalarQuantKnn(querySet(emb), emb)
  }

  /** s9: PQ/ADC KNN at m=16 × ksub=32 — 16 five-bit codes per
    * vector, a 16× scan compression (vs s4's 4×). Params are the
    * measured knee for this noise-floor corpus (recall@10: 0.20 at
    * 8×16, 0.47 at 16×32, 0.56 only at 32×16 which is half-way back
    * to scalar quantization); the production role at this recall is
    * CANDIDATE GENERATION with exact re-ranking of the short list —
    * SimilaritySpec reports the measured corpus recall and pins the
    * planted-near-dup regime. The oracle replays training, encoding,
    * and ADC scoring bit-exactly.
    */
  def s9(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.vectors(spark, dir)
    pqKnn(querySet(emb), emb, m = 16, ksub = 32, cacheKey = Some(dir))
  }

  /** PQ candidate generation + exact re-rank — the production
    * composition s9's measured recall knee prescribes: the 16×-
    * compressed ADC scan proposes a short list (nCand per query) and
    * only that short list is re-scored with full-precision cosine.
    * At 100 TB the exact vectors for |Q|·nCand candidates are a
    * point-lookup-sized fetch, not a scan — here the tiny candidate
    * list BROADCASTS and the corpus streams through the decorate
    * join (s5's pattern), so the full-precision corpus is read once
    * and never shuffled.
    */
  def pqRerankKnn(queries: DataFrame, corpus: DataFrame, k: Int = 10,
                  nCand: Int = 100, m: Int = 8, ksub: Int = 16,
                  iters: Int = 2, cacheKey: Option[String] = None): DataFrame = {
    val cand = pqKnn(queries, corpus, k = nCand, m = m, ksub = ksub,
      iters = iters, cacheKey = cacheKey).select(col("q_id"), col("n_id"))
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    corpus.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
      .join(broadcast(cand), "n_id")
      .join(broadcast(q), "q_id")
      .withColumn("cos", cosine_sim(col("q_emb"), col("n_emb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("rank").cast("long").as("rank"),
        round(col("cos"), 6).as("cosine"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** s10: filtered (metadata-gated) IVF search — neighbors restricted
    * to even-label corpus vectors; same quantizer/cache/probe
    * parameterization as s3, so the two entries differ ONLY by the
    * pushed-down corpus predicate.
    */
  def s10(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.vectors(spark, dir)
    ivfKnn(querySet(emb), emb, nprobe = 12, cacheKey = Some(dir),
      corpusPredicate = Some(col("label") % 2 === 0))
  }

  /** s11: s9's PQ short list (100 candidates at m=16 × ksub=32,
    * shared codebook cache) re-ranked by exact cosine.
    */
  def s11(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.vectors(spark, dir)
    pqRerankKnn(querySet(emb), emb, nCand = 100, m = 16, ksub = 32,
      cacheKey = Some(dir))
  }

  /** Verified entry (s12): exact radius search at tau = 0.35 — the
    * upper edge of this corpus's 64-dim noise floor, so the result
    * is a non-trivial but bounded pair set at every SF (24 pairs at
    * sf0.01, 163 at sf0.1). Sort is oracle-determinism only.
    */
  def s12(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.vectors(spark, dir)
    rangeSearch(querySet(emb), emb, tau = 0.35)
      .orderBy(col("q_id"), col("n_id"))
  }

  /** s5: semantic document retrieval — the RAG/retrieval composition:
    * ANN over the embedding table (the int8 path — the one a 100 TB
    * store actually runs), then the top-k result joins BACK to the
    * documents table for the neighbors' metadata. The join is the
    * scale story: the k·|Q| result set is tiny and explicitly
    * broadcast, so the documents table STREAMS through a broadcast
    * hash join — the corpus is never shuffled to decorate search
    * results (plan-asserted).
    */
  def semanticSearch(queries: DataFrame, corpus: DataFrame, docs: DataFrame,
                     k: Int = 5): DataFrame = {
    val knn = scalarQuantKnn(queries, corpus, k)
    docs.select(col("doc_id").as("n_id"), col("source").as("n_source"),
        col("lang").as("n_lang"))
      .join(broadcast(knn), "n_id")
      .select(col("q_id"), col("n_id"), col("rank"), col("cosine_q8"),
        col("n_source"), col("n_lang"))
      .orderBy(col("q_id"), col("rank"))
  }

  def s5(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.vectors(spark, dir)
    semanticSearch(querySet(emb), emb, Tables.documents(spark, dir))
  }

  /** MMR (maximal marginal relevance) diversification of a retrieval
    * list: greedily select k of the candidates maximizing
    * λ·rel(d) − (1−λ)·max_{s∈selected} sim(d, s), λ = 0.5 — the
    * standard answer to "the top-k is ten near-copies of one page".
    * Composes after any retrieval entry (here: the s4 quantized ANN).
    *
    * Scale shape: MMR is defined over an ALREADY-BOUNDED top-k list —
    * the greedy loop is inherently sequential (pick i depends on
    * picks 1..i−1) and O(k·depth), so the driver is the right place
    * for it, exactly like s3's bounded quantizer training. The
    * corpus-scale work (ANN + the candidate-vector fetch) stays
    * distributed; the collect here is ≤ `depth` rows by construction
    * (guarded). Similarity between candidates is the quantized
    * integer cosine (dot of int8 codes / product of integer-norm
    * roots): integer dots have no summation-order drift, so the
    * selection replays bit-exactly in the DuckDB oracle.
    *
    * Candidates frame contract: (n_id, rel, q, nsq) — rel is the
    * retrieval relevance, q/nsq the [[quantizeVecs]] codes.
    */
  def mmrRerank(candidates: DataFrame, k: Int = 10,
                lambdaRel: Double = 0.5): DataFrame = {
    val spark = candidates.sparkSession
    import spark.implicits._
    // Candidates with a null relevance or null codes (null-embedding
    // rows upstream) cannot be ranked — drop them, never throw
    val rows = candidates.select(col("n_id"), col("rel"), col("q"), col("nsq"))
      .na.drop("any", Seq("n_id", "rel", "q", "nsq"))
      .collect()
    require(rows.length <= 10000, "MMR input must be an already-bounded top-k list")
    // Fewer candidates than k (degenerate corpus / over-filtered
    // retrieval) degrades to reranking what exists — the empty-
    // partition-day law; the greedy loop below runs to kEff picks.
    val kEff = math.min(k, rows.length)
    final case class C(id: Long, rel: Double, q: Array[Long], n: Long)
    val cs = rows.map(r =>
        C(r.getLong(0), r.getDouble(1), r.getSeq[Long](2).toArray, r.getLong(3)))
      .sortBy(_.id)
    def sim(a: C, b: C): Double =
      if (a.n == 0L || b.n == 0L) 0.0
      else {
        var dot = 0L
        var i = 0
        while (i < a.q.length) { dot += a.q(i) * b.q(i); i += 1 }
        dot.toDouble / (math.sqrt(a.n.toDouble) * math.sqrt(b.n.toDouble))
      }
    val remaining = scala.collection.mutable.ArrayBuffer.from(cs)
    // -inf, NOT 0: quantized cosines go negative, and max over the
    // selected set must be the true max — a 0 floor would hand
    // anti-similar candidates a hidden penalty (and diverge from the
    // oracle's replay)
    val maxSim = scala.collection.mutable.Map.empty[Long, Double]
      .withDefaultValue(Double.NegativeInfinity)
    val picked = scala.collection.mutable.ArrayBuffer.empty[(Long, Double, Double)]
    while (picked.length < kEff) {
      // strict > over the id-ascending scan = argmax with min-id
      // tiebreak, the same total order the oracle's ORDER BY pins
      var best: C = null
      var bestScore = Double.NegativeInfinity
      remaining.foreach { c =>
        val s = if (picked.isEmpty) c.rel
                else lambdaRel * c.rel - (1.0 - lambdaRel) * maxSim(c.id)
        if (s > bestScore) { bestScore = s; best = c }
      }
      picked += ((best.id, bestScore, best.rel))
      remaining -= best
      remaining.foreach(c => maxSim(c.id) = math.max(maxSim(c.id), sim(c, best)))
    }
    picked.toSeq.zipWithIndex
      .map { case ((id, s, rel), i) => (id, i + 1, s, rel) }
      .toDF("doc_id", "mmr_rank", "raw", "rel")
      .select(col("doc_id"), col("mmr_rank"),
        round(col("raw"), 6).as("mmr_score"), col("rel"))
  }

  /** s8: diversify the s4 quantized-ANN top-20 of query vector 0 down
    * to 10 — the 20-row candidate list (with its int8 codes) rides a
    * broadcast join against the streaming corpus, then MMR runs on
    * the driver over those 20 rows.
    */
  def s8(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.vectors(spark, dir)
    val knn = scalarQuantKnn(emb.filter(col("vec_id") === 0L), emb, k = 20)
      .select(col("n_id"), col("cosine_q8").as("rel"))
    val cand = quantizeVecs(emb, "n_id", "q", "nsq").join(broadcast(knn), "n_id")
    mmrRerank(cand, k = 10).orderBy(col("mmr_rank"))
  }

  /** Distributed per-label centroids: ONE posexplode pass over the
    * corpus (narrow) into a (label, dim) partial-agg shuffle — the
    * shuffled frame is L·d rows regardless of corpus size — then the
    * tiny component set is rebuilt into L centroid vectors. Components
    * are float-cast so both engines round the averaged sums to the
    * same 24-bit mantissa and downstream cosines replay bit-identically
    * (fp summation-order noise is ~2^-52 relative; the float cast
    * absorbs it). Unlike the IVF trainer (driver k-means over a
    * bounded sample), this is exact over the FULL corpus — it's an
    * aggregation, not a fit, so it never needs to sample.
    */
  def labelCentroids(emb: DataFrame, labelCol: String = "label"): DataFrame =
    emb.select(col(labelCol), posexplode(col("embedding")).as(Seq("i", "v")))
      .groupBy(col(labelCol), col("i"))
      .agg(avg(col("v").cast("double")).as("cv"))
      .groupBy(col(labelCol))
      .agg(array_sort(collect_list(struct(col("i"), col("cv")))).as("s"))
      .select(col(labelCol),
        transform(col("s"), x => x.getField("cv").cast("float")).as("centroid"))

  /** Per-label embedding-cluster quality report: cohesion (mean and
    * worst cosine of each member to its own centroid) and separation
    * (max cosine between this centroid and any other) — the
    * label-noise / cluster-QA audit a curation pipeline runs before
    * trusting a label column for stratified sampling, dedup blocking,
    * or classifier training. A label whose min_cos is low has
    * mislabeled members; one whose max_other_sim approaches its
    * cohesion is not a real cluster.
    *
    * Scale shape: centroids via [[labelCentroids]] (corpus shuffles
    * once on the bounded (label, dim) key); the corpus then streams
    * ONCE through a broadcast-centroid join scoring the codegen'd
    * cosine into a map-side-combined label agg; separation is an
    * L×L broadcast self-join over the L-row centroid frame — the
    * corpus is never in any pairwise product.
    */
  def clusterCohesion(emb: DataFrame, labelCol: String = "label"): DataFrame = {
    val cents = labelCentroids(emb, labelCol)
    val coh = emb.join(broadcast(cents), Seq(labelCol))
      .select(col(labelCol),
        cosine_sim(col("embedding"), col("centroid")).as("cos"))
      .groupBy(col(labelCol))
      .agg(count(lit(1)).as("n_vecs"), avg(col("cos")).as("coh"),
        min(col("cos")).as("mincos"))
    val sep = cents
      .join(broadcast(cents.select(col(labelCol).as("o_label"),
        col("centroid").as("o_centroid"))), col(labelCol) =!= col("o_label"))
      .select(col(labelCol), cosine_sim(col("centroid"), col("o_centroid")).as("cc"))
      .groupBy(col(labelCol)).agg(max(col("cc")).as("sepmax"))
    coh.join(sep, Seq(labelCol))
      .select(col(labelCol), col("n_vecs"),
        round(col("coh"), 6).as("cohesion"),
        round(col("mincos"), 6).as("min_cos"),
        round(col("sepmax"), 6).as("max_other_sim"))
  }

  /** Verified entry (s13): cluster-quality report over the embeddings
    * table's label column. Sort is oracle-determinism only.
    */
  def s13(spark: SparkSession, dir: String): DataFrame =
    clusterCohesion(Tables.vectors(spark, dir)).orderBy(col("label"))

  /** Per-label exact centroid + member count in ONE corpus pass —
    * [[labelCentroids]] with the count folded into the same (label,
    * dim) aggregation (every dim of a label sees the same member
    * count, so max() recovers it without a second scan).
    */
  private def centroidWithCount(emb: DataFrame, labelCol: String): DataFrame =
    emb.select(col(labelCol), posexplode(col("embedding")).as(Seq("i", "v")))
      .groupBy(col(labelCol), col("i"))
      .agg(avg(col("v").cast("double")).as("cv"), count(lit(1)).as("n"))
      .groupBy(col(labelCol))
      .agg(array_sort(collect_list(struct(col("i"), col("cv")))).as("s"),
        max(col("n")).as("n_vecs"))
      .select(col(labelCol),
        transform(col("s"), x => x.getField("cv").cast("float")).as("centroid"),
        col("n_vecs"))

  /** Embedding drift monitor (s14): per label, how far the class
    * centroid MOVED between a baseline and a candidate slice —
    * direction drift as centroid cosine, magnitude drift as the norm
    * ratio. The "did the encoder / upstream distribution change"
    * gate an embedding pipeline runs before trusting stored vectors
    * against freshly-produced ones (p15's profile-drift idea lifted
    * into embedding space); s13 QAs one snapshot's cluster geometry,
    * this compares two snapshots'.
    *
    * Scale shape: each side is ONE corpus pass to (label, dim)
    * partial-agg'd means ([[centroidWithCount]] — the s13 centroid
    * discipline: float-cast components so fp summation-order noise
    * dies at the 24-bit mantissa and the cosines replay exactly);
    * the drift math then rides the L-row centroid frames. Norms fold
    * in index order (deterministic on any engine).
    */
  def centroidDrift(base: DataFrame, cand: DataFrame,
                    labelCol: String = "label"): DataFrame = {
    val a = centroidWithCount(base, labelCol)
      .select(col(labelCol), col("centroid").as("cent_a"), col("n_vecs").as("n_a"))
    val b = centroidWithCount(cand, labelCol)
      .select(col(labelCol), col("centroid").as("cent_b"), col("n_vecs").as("n_b"))
    def norm(c: Column) = sqrt(aggregate(c, lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double")))
    a.join(b, Seq(labelCol))
      .select(col(labelCol), col("n_a"), col("n_b"),
        round(cosine_sim(col("cent_a"), col("cent_b")), 6).as("centroid_cos"),
        round(norm(col("cent_b")) / norm(col("cent_a")), 6).as("norm_ratio"))
  }

  /** Verified entry (s14): even/odd vec_id halves as baseline and
    * candidate (deterministic, engine-replayable split). Sort is
    * oracle-determinism only.
    */
  def s14(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.vectors(spark, dir)
    centroidDrift(emb.filter(col("vec_id") % 2 === 0),
      emb.filter(col("vec_id") % 2 === 1)).orderBy(col("label"))
  }

  /** kNN GRAPH (s15): every corpus vector's k nearest neighbors
    * within its IVF cell — the construction step under graph
    * clustering, label propagation, and kNN-based outlier scoring
    * (s1-s14 answer "neighbors of these queries"; this materializes
    * "neighbors of EVERYONE"). The within-cell restriction IS the
    * scale contract (d9's blocking argument): the self-join is a
    * cell-key equi-join, so pair work is per-cell-bounded instead of
    * the corpus-squared all-pairs a naive kNN graph implies, and the
    * cell assignment is the shared driver-trained quantizer pushed
    * as a narrow literal-centroid map (no in-query training —
    * s3's plan pin applies). Cell-edge neighbors can be missed, like
    * any single-probe IVF; the DEFAULT cell count now derives from
    * the corpus ([[derivedNumCells]] — d9's n/targetCellSize sizing,
    * VERDICT r12 item 1) so per-cell pair work stays constant as the
    * corpus grows, and k stays the per-row
    * window cut. Rank decided on the unrounded cosine, ties by
    * n_id (deterministic both engines); cosine rounded only for
    * output.
    */
  def knnGraph(corpus: DataFrame, k: Int = 5, numCells: Int = 0,
               cacheKey: Option[String] = None): DataFrame = {
    val kCells = resolveCells(corpus, numCells, cacheKey)
    val cents = cachedCentroids(corpus, kCells, iters = 3, cacheKey)
    // the graph is over the VECTOR corpus (Tables.vectors' contract);
    // filtering here (where the array is read anyway) lets callers
    // pass the raw table and keep their label-only scans pruned
    val assigned = corpus.select(col("vec_id"), col("embedding"))
      .filter(col("embedding").isNotNull)
      .withColumn("cell_id", assignBest(col("embedding"), cents))
    val nbrs = assigned
      .select(col("cell_id"), col("vec_id").as("n_id"), col("embedding").as("n_emb"))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("cos").desc, col("n_id"))
    assigned.join(nbrs, Seq("cell_id"))
      .filter(col("vec_id") =!= col("n_id"))
      .withColumn("cos", cosine_sim(col("embedding"), col("n_emb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("vec_id"), col("n_id"), col("rank").cast("long").as("rank"),
        round(col("cos"), 6).as("cosine"))
  }

  /** Verified entry (s15). Sort is oracle-determinism only. */
  def s15(spark: SparkSession, dir: String): DataFrame =
    knnGraph(Tables.embeddings(spark, dir), cacheKey = Some(dir))
      .orderBy(col("vec_id"), col("rank"))

  /** kNN label classification report (s18): every vector's label
    * predicted by majority vote of its k nearest within-cell
    * neighbors, reported per declared label as (n_classified,
    * n_agree, agree_rate) — the label-propagation / weak-label-audit
    * primitive (t15's confusion idea in embedding space: a label
    * whose own neighborhoods vote against it is noisy or the
    * clusters overlap). Vote ties break (votes DESC, label ASC);
    * vectors with no within-cell neighbor (singleton cells) have no
    * vote and are excluded from the report's denominator — silently
    * scoring them as wrong would fake noise.
    *
    * Scale shape: rides s15's kNN graph (within-cell equi-join via
    * the SHARED cached quantizer — never corpus² pairs); the k·n
    * edge frame joins the (id, label) projection on the neighbor id
    * (two id-keyed exchanges of bounded rows), votes aggregate on
    * (vec, label), the argmax is a window over the per-vector vote
    * frame (≤|labels| rows per vector, riding the vote agg's own
    * exchange prefix), and the report aggregates on the tiny label
    * key. The corpus itself is touched exactly as often as s15
    * touches it.
    */
  def knnClassify(corpus: DataFrame, k: Int = 5, numCells: Int = 0,
                  cacheKey: Option[String] = None): DataFrame = {
    val g = knnGraph(corpus, k, numCells, cacheKey)
    // Unlabeled neighbors cannot vote: a NULL label is not a class,
    // and letting it win ties is also engine-dependent (Spark windows
    // order nulls first, SQL engines last — the dirty-corpus gate
    // caught exactly that divergence flipping predictions).
    val nbrLabels = corpus.select(col("vec_id").as("n_id"), col("label").as("n_label"))
      .filter(col("n_label").isNotNull)
    val votes = g.join(nbrLabels, Seq("n_id"))
      .groupBy(col("vec_id"), col("n_label"))
      .agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("votes").desc, col("n_label"))
    val predicted = votes
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .select(col("vec_id"), col("n_label").as("predicted"))
    predicted
      .join(corpus.select(col("vec_id"), col("label")), Seq("vec_id"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_classified"),
        sum(when(col("predicted") === col("label"), 1L).otherwise(0L))
          .as("n_agree"))
      .select(col("label"), col("n_classified"), col("n_agree"),
        round(col("n_agree").cast("double") / col("n_classified"), 6)
          .as("agree_rate"))
  }

  /** Verified entry (s18). Sort is oracle-determinism only. */
  def s18(spark: SparkSession, dir: String): DataFrame =
    knnClassify(Tables.embeddings(spark, dir), cacheKey = Some(dir))
      .orderBy(col("label"))

  /** kNN-distance outlier report (s19): each vector's similarity to
    * its k-th nearest within-cell neighbor is its isolation score
    * (the classic kNN-dist outlier law — a low k-th-neighbor cosine
    * means nothing sits near it), reported as the top-N most
    * isolated vectors with their labels — the "look at these before
    * trusting the embedding space" audit (mis-encoded rows, wrong-
    * modality payloads, genuine novelty all surface here first).
    *
    * Scale shape: rides s15's shared-quantizer graph; the k-th-rank
    * cut is a filter on the bounded edge frame, the top-N cut is
    * TakeOrderedAndProject on the ROUNDED cosine (the frame's 6dp
    * law, vec_id tiebreak — deterministic on both engines), labels
    * decorate the N survivors via an id equi-join. Vectors with
    * fewer than k within-cell neighbors never reach rank k and are
    * absent — they are cell-size artifacts, not outliers.
    */
  def knnOutliers(corpus: DataFrame, k: Int = 5, numCells: Int = 0,
                  topN: Int = 25, cacheKey: Option[String] = None): DataFrame = {
    val kth = knnGraph(corpus, k, numCells, cacheKey)
      .filter(col("rank") === k)
      .select(col("vec_id"), col("cosine").as("kth_cosine"))
    val top = kth.orderBy(col("kth_cosine"), col("vec_id")).limit(topN)
    val w = Window.orderBy(col("kth_cosine"), col("vec_id"))
    top
      .withColumn("isolation_rank", row_number().over(w).cast("long"))
      .join(corpus.select(col("vec_id"), col("label")), Seq("vec_id"))
      .select(col("isolation_rank"), col("vec_id"), col("label"),
        col("kth_cosine"))
  }

  /** Verified entry (s19). Sort is oracle-determinism only. */
  def s19(spark: SparkSession, dir: String): DataFrame =
    knnOutliers(Tables.embeddings(spark, dir), cacheKey = Some(dir))
      .orderBy(col("isolation_rank"))

  /** IVF nprobe/recall curve (s20): mean recall@k of the IVF index
    * at every rung of an nprobe ladder, against the exact baseline —
    * s17 measures ONE operating point, this measures the whole knob
    * (production re-runs it per index build and picks the cheapest
    * nprobe above the recall SLO; scan cost is ∝ nprobe, so the
    * curve IS the latency/recall trade).
    *
    * Scale shape (round 11 — s22's posexplode-prefix law applied to
    * the recall half): the corpus is scored ONCE against the
    * max-nprobe probe set — `posexplode(probeCells(…, max))` keeps
    * each candidate's CELL RANK in the query's probe order, and a
    * candidate's own cell appears at exactly one position, so the
    * scan mass is one q×corpus pass (vs Σ rungs ≈ 2× before) with no
    * dedup exchange. Each rung is then a `cell_rank <= np` prefix
    * filter + row_number window over the PERSISTED narrow scored
    * frame (q_id, n_id, cell_rank, cos) — identical candidates,
    * ordering, and ties as the per-rung [[ivfKnn]] spelling it
    * replaces (spec-pinned). When the ladder tops out at numCells
    * the full-prefix window IS the exact baseline (the all-cells
    * candidate set is the whole corpus), so the brute-force side
    * rides the same scan too; rung recalls reduce as integer hit
    * counts joined on (q, n) membership — never a cosine re-compare
    * (s17's law), so mean recall = Σhits / (k·|queries|) is one
    * exact-integer division.
    */
  def nprobeCurve(queries: DataFrame, corpus: DataFrame, k: Int = 10,
                  ladder: Seq[Int] = Seq(1, 2, 4, 8, 16), numCells: Int = 0,
                  cacheKey: Option[String] = None): DataFrame = {
    val kCells = resolveCells(corpus, numCells, cacheKey)
    val maxNp = math.min(ladder.max, kCells)
    val cents = cachedCentroids(corpus, kCells, iters = 3, cacheKey)
    val c = corpus.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
      .withColumn("cell_id", assignBest(col("n_emb"), cents))
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      .select(col("q_id"), col("q_emb"),
        posexplode(probeCells(col("q_emb"), cents, maxNp)))
      .select(col("q_id"), col("q_emb"),
        (col("pos") + 1).as("cell_rank"), col("col").as("cell_id"))
    // score before any exchange (s27's lesson): the window shuffles
    // below carry only (q_id, n_id, cell_rank, cos), never embeddings
    val scored = graft.FrameCache.persisted("s20_scored",
      broadcast(q).join(c, Seq("cell_id"))
        .filter(col("q_id") =!= col("n_id"))
        .withColumn("cos", cosine_sim(col("q_emb"), col("n_emb")))
        .select(col("q_id"), col("n_id"), col("cell_rank"), col("cos")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    def topk(cands: DataFrame): DataFrame = cands
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"))
    val exact =
      if (ladder.max >= kCells) topk(scored) // all-cells prefix = brute force
      else bruteForceKnn(queries, corpus, k).select(col("q_id"), col("n_id"))
    val approx = ladder.map { np =>
      topk(scored.filter(col("cell_rank") <= math.min(np, kCells)))
        .withColumn("nprobe", lit(np.toLong))
    }.reduce(_ unionByName _)
    val nq = exact.agg(countDistinct(col("q_id")).as("__nq"))
    approx.join(exact, Seq("q_id", "n_id"))
      .groupBy(col("nprobe"))
      .agg(count(lit(1)).as("n_hits"))
      .crossJoin(broadcast(nq))
      .select(col("nprobe"), col("n_hits"),
        round(col("n_hits").cast("double") / (col("__nq") * k), 6)
          .as("mean_recall"))
  }

  /** Verified entry (s20). Sort is oracle-determinism only. */
  def s20(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.vectors(spark, dir)
    nprobeCurve(querySet(emb), emb, cacheKey = Some(dir))
      .orderBy(col("nprobe"))
  }

  /** SQ reconstruction-error report (s21): per-vector cosine between
    * the raw embedding and its int8 scalar-quantized codes (cosine
    * is scale-invariant, so the codes ARE the reconstruction),
    * folded to the fidelity table that justifies s4's 4× compression
    * claim as data: vector count, worst cosine, integer-exact mean
    * cosine, and the share above 0.999. Production re-runs this per
    * encoder change — a drifting embedding scale distribution shows
    * up here before recall drops.
    *
    * Scale shape: ONE narrow pass (quantize + fixed-index-order
    * cosine fold per row — the int code norm is an exact integer sum
    * of squares, so only the raw-side norm is a float fold) into a
    * 1-row aggregate; the mean accumulates 1e-6 integer units of the
    * per-row ROUNDED cosine (d18's law).
    */
  def sqErrorReport(corpus: DataFrame): DataFrame = {
    val coded = corpus
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .withColumn("__scale", array_max(transform(col("e"), x => abs(x))))
      .withColumn("__q", when(col("__scale") === 0d,
          transform(col("e"), _ => lit(0L)))
        .otherwise(transform(col("e"),
          x => floor(x / col("__scale") * lit(127.0) + lit(0.5)).cast("long"))))
      .withColumn("__qn", aggregate(transform(col("__q"), v => v * v), lit(0L), _ + _))
      .withColumn("__dot", aggregate(
        zip_with(col("e"), col("__q"), (a, b) => a * b.cast("double")),
        lit(0.0), _ + _))
      .withColumn("__ne", sqrt(aggregate(
        transform(col("e"), x => x * x), lit(0.0), _ + _)))
      .withColumn("cos", round(when(col("__qn") > 0 && col("__ne") > 0,
        col("__dot") / (col("__ne") * sqrt(col("__qn").cast("double")))), 6))
    coded.agg(count(lit(1)).as("n_vecs"),
      round(min(col("cos")), 6).as("min_cos"),
      round(sum(round(col("cos") * 1000000.0, 0).cast("long")).cast("double")
        / 1000000.0 / count(col("cos")), 6).as("mean_cos"),
      round(sum(when(col("cos") >= 0.999, 1L).otherwise(0L)).cast("double")
        / count(lit(1)), 6).as("share_above_999"))
  }

  /** Verified entry (s21): 1-row fidelity report. */
  def s21(spark: SparkSession, dir: String): DataFrame =
    sqErrorReport(Tables.vectors(spark, dir))

  /** IVF scan-cost curve (s22): mean corpus vectors SCANNED per query
    * at every nprobe rung — the cost half of the s20 recall curve
    * (together they are the complete latency/recall trade; scan cost
    * is the thing a 100 TB deployment actually pays, and it depends
    * on the actual cell-size distribution, not the uniform n/cells
    * estimate a skewed quantizer breaks). Exact integers end to end:
    * candidates per (query, rung) = Σ sizes of its nprobe nearest
    * cells.
    *
    * Scale shape: cell sizes are a |cells|-row aggregate of the
    * narrow assignment map; the query×cell probe ranking is bounded
    * (|queries| × cells); the rung fan-out explodes THAT bounded
    * frame, never the corpus. Mean = exact integer sum / query
    * count, one division.
    */
  def scanCostCurve(queries: DataFrame, corpus: DataFrame,
                    ladder: Seq[Int] = Seq(1, 2, 4, 8, 16), numCells: Int = 0,
                    cacheKey: Option[String] = None): DataFrame = {
    val kCells = resolveCells(corpus, numCells, cacheKey)
    val cents = cachedCentroids(corpus, kCells, iters = 3, cacheKey)
    val sizes = corpus.select(col("vec_id"), col("embedding"))
      .withColumn("cell_id", assignBest(col("embedding"), cents))
      .groupBy(col("cell_id")).agg(count(lit(1)).as("__cell_n"))
    val maxProbe = ladder.max
    // probeCells returns the nprobe nearest cells in preference
    // order; posexplode keeps the per-query preference rank so each
    // rung's prefix is exact
    val pref = queries
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      .select(col("q_id"), posexplode(probeCells(col("q_emb"), cents, maxProbe)))
      .select(col("q_id"), (col("pos") + 1).as("pref"), col("col").as("cell_id"))
    val rungArr = array(ladder.map(lit): _*)
    val fan = pref
      .withColumn("nprobe", explode(filter(rungArr, r => col("pref") <= r)))
      .join(sizes, Seq("cell_id"), "left")
      .na.fill(0L, Seq("__cell_n"))
    val nq = queries.agg(countDistinct(col("vec_id")).as("__nq"))
    fan.groupBy(col("nprobe"))
      .agg(sum(col("__cell_n")).as("total_scanned"))
      .crossJoin(broadcast(nq))
      .select(col("nprobe").cast("long").as("nprobe"),
        col("total_scanned"),
        round(col("total_scanned").cast("double") / col("__nq"), 4)
          .as("mean_scanned_per_query"))
  }

  /** Verified entry (s22). Sort is oracle-determinism only. */
  def s22(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.vectors(spark, dir)
    scanCostCurve(querySet(emb), emb, cacheKey = Some(dir))
      .orderBy(col("nprobe"))
  }

  /** Background-similarity histogram (s16): the cosine distribution
    * over a deterministic pseudo-random pairing of the corpus — the
    * evidence a τ threshold for d5/d9/s12 is picked AGAINST (how far
    * the near-dup tail sits from the background mass). The pairing
    * must be deterministic, engine-replayable, and scale-clean:
    * vectors bucket by mix64(vec_id) mod B (bounded key, replayable
    * sign law via pmod), rank within a bucket by the full hash, and
    * rank 2i-1 pairs with rank 2i — every vector lands in ≤1 pair,
    * the pairing is hash-scrambled, and the corpus shuffles ONCE on
    * the bounded bucket key (no global sort, no all-pairs). Bins
    * cover [-1, 1]; the bin index comes from the UNROUNDED cosine
    * (identical doubles on both engines — the s3 fold discipline),
    * clamped so cos = 1.0 lands in the top bin.
    */
  def cosineHistogram(emb: DataFrame, bins: Int = 20,
                      buckets: Int = 64): DataFrame = {
    val keyed = emb.select(col("vec_id"), col("embedding"))
      .withColumn("__h", graft.functions.GraftFunctions.mix64(col("vec_id").cast("long")))
      .withColumn("__b", pmod(col("__h"), lit(buckets.toLong)))
    val w = Window.partitionBy(col("__b")).orderBy(col("__h"), col("vec_id"))
    val ranked = keyed.withColumn("__r", row_number().over(w))
    val lhs = ranked.filter(col("__r") % 2 === 1)
      .select(col("__b"), expr("(__r + 1) div 2").as("__p"),
        col("vec_id").as("a_id"), col("embedding").as("a_emb"))
    val rhs = ranked.filter(col("__r") % 2 === 0)
      .select(col("__b"), expr("__r div 2").as("__p"),
        col("vec_id").as("b_id"), col("embedding").as("b_emb"))
    lhs.join(rhs, Seq("__b", "__p"))
      .withColumn("__cos", cosine_sim(col("a_emb"), col("b_emb")))
      .withColumn("bin", least(
        floor((col("__cos") + lit(1.0)) * bins / lit(2.0)).cast("long"),
        lit(bins.toLong - 1)))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_pairs"),
        round(min(col("__cos")), 6).as("min_cos"),
        round(max(col("__cos")), 6).as("max_cos"))
      .withColumn("bin_lo", round(lit(-1.0) + col("bin") * lit(2.0) / bins, 6))
      .withColumn("bin_hi", round(lit(-1.0) + (col("bin") + 1) * lit(2.0) / bins, 6))
      .select(col("bin"), col("bin_lo"), col("bin_hi"),
        col("n_pairs"), col("min_cos"), col("max_cos"))
  }

  /** Verified entry (s16). Sort is oracle-determinism only. */
  def s16(spark: SparkSession, dir: String): DataFrame =
    cosineHistogram(Tables.vectors(spark, dir)).orderBy(col("bin"))

  /** IVF recall report (s17): per query, how many of the exact
    * top-k the IVF path recovered — the recall/latency trade
    * measured as DATA, not just a spec gate (production ANN ships
    * this as a continuous monitor: re-measure on every index build,
    * alert when a corpus drift pushes recall under contract).
    * Composes two existing library operators; the hit count is a
    * left-semi join of the approximate list against the exact list
    * on (q_id, n_id) — never a cosine re-compare, so fp noise can't
    * blur membership. The exact side is the expensive one at scale;
    * in production it runs on a held-out query sample, exactly the
    * querySet shape this entry uses.
    */
  def ivfRecallReport(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val emb = Tables.vectors(spark, dir)
    val exact = bruteForceKnn(querySet(emb), emb, k)
      .select(col("q_id"), col("n_id"))
    val approx = ivfKnn(querySet(emb), emb, k, nprobe = 12, cacheKey = Some(dir))
      .select(col("q_id"), col("n_id"))
    approx.join(exact, Seq("q_id", "n_id"), "left_semi")
      .groupBy(col("q_id"))
      .agg(count(lit(1)).as("n_hits"))
      .select(col("q_id"), col("n_hits"),
        round(col("n_hits").cast("double") / k, 4).as("recall_at_k"))
  }

  /** Verified entry (s17). Sort is oracle-determinism only. */
  def s17(spark: SparkSession, dir: String): DataFrame =
    ivfRecallReport(spark, dir).orderBy(col("q_id"))

  /** Matryoshka truncation-recall curve (s23): top-k recall when the
    * cosine runs over only the first `dim` coordinates — the MRL
    * question (Kusupati et al., "Matryoshka Representation Learning",
    * NeurIPS 2022): how many dims does retrieval actually need?
    * MRL-trained embeddings front-load information, so serving at a
    * prefix dim cuts the vector store linearly (8/64ths of the bytes
    * at dim 8) at a measured recall cost; this report IS that
    * measurement, with the full-dim rung as the recall-1.0 anchor
    * (s20's ladder pattern). Non-MRL embeddings (this corpus) show
    * the degradation curve you'd buy without retraining.
    *
    * Scale shape: the query subset explodes ×|dims| and broadcasts
    * (s1's bounded-BNLJ baseline contract); the corpus is scanned
    * ONCE — each scanned vector scores all dims of all queries in
    * place. The self-recall join rides the already-top-k frame
    * (|queries|·k·|dims| rows).
    */
  def mrlRecall(queries: DataFrame, corpus: DataFrame,
                dims: Seq[Int] = Seq(8, 16, 32, 64),
                k: Int = 10): DataFrame = {
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      .withColumn("dim", explode(array(dims.map(d => lit(d)): _*)))
    val c = corpus.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
    val w = Window.partitionBy(col("q_id"), col("dim"))
      .orderBy(col("cos").desc, col("n_id"))
    val topk = broadcast(q).join(c, col("q_id") =!= col("n_id"))
      .withColumn("cos", cosine_sim(
        slice(col("q_emb"), lit(1), col("dim")),
        slice(col("n_emb"), lit(1), col("dim"))))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("dim"), col("q_id"), col("n_id"))
    val full = topk.filter(col("dim") === dims.max)
      .select(col("q_id"), col("n_id"), lit(1L).as("__hit"))
    topk.join(full, Seq("q_id", "n_id"), "left")
      .groupBy(col("dim"))
      .agg(countDistinct(col("q_id")).as("n_queries"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_hits"))
      .withColumn("recall", round(
        col("n_hits").cast("double") / (col("n_queries") * lit(k.toLong)), 4))
      .select(col("dim"), col("n_queries"), col("n_hits"), col("recall"))
  }

  /** Verified entry (s23). Sort is oracle-determinism only. */
  def s23(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.vectors(spark, dir)
    mrlRecall(querySet(emb), emb).orderBy(col("dim"))
  }

  /** IVF trainer convergence report (s24): for each Lloyd iteration
    * rung 0..iters, the quantizer's quality ON ITS OWN TRAINING
    * SAMPLE — mean cosine to the assigned centroid (does another
    * iteration still buy anything?), cells actually used (did init
    * or a collapse strand empty cells?), and the min/max cell
    * occupancy (IVF probe cost is governed by the fattest cell —
    * SCALE.md's cell-size-skew finding made a per-corpus report).
    * This is the evidence behind the `iters = 3` default every IVF
    * entry inherits: the curve flattens where marginal inertia gain
    * dies, and a report beats folklore when a new corpus arrives.
    *
    * Scale shape: everything is model/sample-sized — each rung is
    * the same bounded deterministic TakeOrdered sample the trainer
    * itself sees (s3's bounded-collect contract; the corpus is never
    * scanned beyond the sample filter), assignment is the BestCell
    * static kernel with rung-r centroids as literals, and the
    * 16-row centroid frame broadcast-joins back for the cosine. The
    * mean ships as an exact-integer e6 sum divided once (d18's law:
    * per-row `round(cos·10⁶)` lands both engines on the same integer
    * grid, the final single division of two exact longs is one IEEE
    * op — no summation-order drift can flip a rounding boundary).
    */
  def ivfConvergence(corpus: DataFrame, k: Int = 16, iters: Int = 3,
                     cacheKey: Option[String] = None): DataFrame = {
    // The report measures the TRAINER's sample, so it reuses the
    // trainer's own bounded collect ([[trainerSample]] — fallback
    // included) as a LOCAL frame: the per-rung assignment/cosine
    // passes below then cost zero corpus scans (each rung previously
    // re-scanned the corpus just to re-derive the sample).
    val spark0 = corpus.sparkSession
    import spark0.implicits._
    val sample = trainerSample(corpus)
      .toSeq.map(v => Tuple1(v.toSeq)).toDF("embedding")
    (0 to iters).map { r =>
      val cents = cachedCentroids(corpus, k, r, cacheKey)
      val spark = corpus.sparkSession
      import spark.implicits._
      val cdf = cents.toSeq.map { case (cid, e) => (cid, e.toSeq) }
        .toDF("cell", "cell_emb")
      sample
        .select(assignBest(col("embedding"), cents).as("cell"), col("embedding"))
        .join(broadcast(cdf), Seq("cell"))
        .select(col("cell"),
          round(cosine_sim(col("embedding"), col("cell_emb")) * 1000000)
            .cast("long").as("cos_e6"))
        .groupBy(col("cell"))
        .agg(count(lit(1)).as("n"), sum(col("cos_e6")).as("sum_e6"))
        .agg(count(lit(1)).as("cells_used"), sum(col("n")).as("n_vecs"),
          sum(col("sum_e6")).as("__sum_e6"),
          min(col("n")).as("min_cell_n"), max(col("n")).as("max_cell_n"))
        .select(lit(r).as("iter"), col("n_vecs"), col("cells_used"),
          round(col("__sum_e6").cast("double") / col("n_vecs")).cast("long")
            .as("mean_cos_e6"),
          col("min_cell_n"), col("max_cell_n"))
    }.reduce(_ unionByName _)
  }

  /** Verified entry (s24). Sort is oracle-determinism only. */
  def s24(spark: SparkSession, dir: String): DataFrame =
    ivfConvergence(Tables.vectors(spark, dir), cacheKey = Some(dir))
      .orderBy(col("iter"))

  /** Embedding-space anisotropy profile (s25) — the health check run
    * BEFORE trusting any cosine machinery on a new embedding table
    * (Ethayarajh, EMNLP 2019: contextual embeddings concentrate in a
    * narrow cone; a few rogue dimensions can carry most of the
    * variance and silently dominate every dot product s1–s23
    * compute). Per dimension: exact mean and variance on the integer
    * grid, plus the dimension's share of TOTAL variance in ppm — a
    * flat profile ≈ isotropic space; a spiked profile names the
    * dimensions to whiten/center first. The centroid norm rides
    * along (repeated, p32's cross-broadcast pattern): a far-from-
    * origin centroid is the other anisotropy signature and prices
    * how much mean-centering would move every cosine.
    *
    * Integer discipline end to end: components land on the e6 grid
    * per row (`round(c·10⁶)` — d18's law), so the cross-row sums are
    * exact; variance = (n·Σx² − (Σx)²) div n² never goes negative
    * (Cauchy–Schwarz) and floor-div agrees across engines on
    * non-negative operands; the signed mean uses the sign-restored
    * half-away spelling; Σx² rides decimal(38,0) so a trillion-row
    * corpus cannot overflow. The ONE floating op is `sqrt` of an
    * exact integer — whose result can never land on a .5 boundary
    * (an odd square over 4 is never integral), so the final round is
    * drift-free.
    *
    * Scale shape: ONE corpus pass — posexplode fans each row to
    * |dims| components in the map stage, but partial aggregation
    * collapses every partition to ≤|dims| rows BEFORE the exchange,
    * so the shuffle carries dims × partitions rows, not n × dims;
    * everything downstream (share, centroid norm) is arithmetic on
    * the |dims|-row frame with a 1-row broadcast. No sampling — this
    * is the exact profile, cheap because the reduction is total.
    */
  def anisotropyProfile(corpus: DataFrame): DataFrame = {
    val comp = corpus
      .select(posexplode(col("embedding")).as(Seq("__pos", "__c")))
      .select((col("__pos") + 1).as("dim"),
        expr("cast(round(cast(__c as double) * 1000000) as bigint)").as("__c_e6"))
    val d = comp.groupBy(col("dim"))
      .agg(count(lit(1)).as("__n"), sum(col("__c_e6")).as("__s"),
        sum(expr("cast(__c_e6 as decimal(38,0)) * __c_e6")).as("__ssq"))
      .select(col("dim"),
        expr("""cast(sign(__s) as bigint) *
          | cast((2 * abs(cast(__s as decimal(38,0))) + __n) div (2 * __n) as bigint)"""
          .stripMargin.replace("\n", " ")).as("mean_e6"),
        expr("""cast((__n * __ssq - cast(__s as decimal(38,0)) * __s)
          | div (cast(__n as decimal(38,0)) * __n) as bigint)"""
          .stripMargin.replace("\n", " ")).as("var_e12"))
    // |dims| rows; persisted so the total-variance broadcast reads
    // the cached frame instead of re-scanning the corpus —
    // bounded-cache persisted (ADVICE r8)
    val dC = graft.FrameCache.persisted("s25_dims", d)
    val tot = dC.agg(
      sum(col("var_e12")).as("__tv"),
      expr("cast(round(sqrt(cast(sum(cast(mean_e6 as decimal(38,0)) * mean_e6) as double))) as bigint)")
        .as("centroid_norm_e6"))
    dC.crossJoin(broadcast(tot))
      .select(col("dim").cast("long").as("dim"), col("mean_e6"), col("var_e12"),
        expr("cast((cast(var_e12 as decimal(38,0)) * 2000000 + __tv) div (2 * __tv) as bigint)")
          .as("var_share_ppm"),
        col("centroid_norm_e6"))
  }

  /** Verified entry (s25). Sort is oracle-determinism only. */
  def s25(spark: SparkSession, dir: String): DataFrame =
    anisotropyProfile(Tables.vectors(spark, dir)).orderBy(col("dim"))

  /** Incremental IVF maintenance report (s26) — the d10 pattern for
    * vectors: a NEW batch arrives against an index trained WITHOUT
    * it, and the question is never "retrain?" alone but "which cells
    * absorb the arrivals, how well do they fit, and where does the
    * index drift?". Per cell: existing corpus-wide occupancy, new
    * arrivals routed there, the arrivals' mean cosine to the
    * centroid (a falling fit flags distribution shift BEFORE recall
    * decays — s24's e6 integer-mean law), and growth in ppm (the
    * rounded DIV spelling, null for a previously-empty cell).
    * Assignment of new vectors needs NO retrain and NO corpus
    * rescan — that is the operational point.
    *
    * Scale shape: the trainer sees only the bounded existing-side
    * sample (s3's bounded-collect contract); both assignment passes
    * are the BestCell static-kernel narrow map (existing corpus once
    * for occupancy, the new batch once) into map-combined ≤k-row
    * aggs; the report is arithmetic on the k-row frame with the
    * 16-row centroid broadcast. Nothing pairwise, nothing driver-side
    * beyond the model.
    */
  def incrementalIvfReport(corpus: DataFrame, batchMod: Int = 10,
                           batchRem: Int = 7, k: Int = 16,
                           iters: Int = 3): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val existing = corpus.filter(pmod(col("vec_id"), lit(batchMod)) =!= batchRem)
    val fresh = corpus.filter(pmod(col("vec_id"), lit(batchMod)) === batchRem)
    // Cell-anchored report: the output frame is anchored on the
    // centroid rows, so centroidMatrix's empty-corpus placeholder
    // cells would surface as k phantom rows (and, worse, real fresh
    // vectors would be assigned against dim-1 placeholders — silent
    // truncated-cosine garbage). No trainable existing side → the
    // contract product is the EMPTY frame with the contract schema,
    // matching the oracle's empty centroid CTE (ADVICE r11).
    val sample = trainerSample(existing)
    if (sample.isEmpty) {
      val contract = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("cell", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("n_existing", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("n_new", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("mean_new_cos_e6", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("growth_ppm", org.apache.spark.sql.types.LongType)))
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], contract)
    }
    val cents = centroidsFromSample(sample, k, iters)
    val cdf = cents.toSeq.map { case (cid, e) => (cid, e.toSeq) }
      .toDF("cell", "cell_emb")
    val exAsg = existing
      .select(assignBest(col("embedding"), cents).as("cell"))
      .groupBy(col("cell")).agg(count(lit(1)).as("n_existing"))
    val newAsg = fresh
      .select(assignBest(col("embedding"), cents).as("cell"), col("embedding"))
      .join(broadcast(cdf), Seq("cell"))
      .select(col("cell"),
        round(cosine_sim(col("embedding"), col("cell_emb")) * 1000000)
          .cast("long").as("cos_e6"))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_new"), sum(col("cos_e6")).as("__sum_e6"))
    cdf.select(col("cell"))
      .join(exAsg, Seq("cell"), "left")
      .join(newAsg, Seq("cell"), "left")
      .select(col("cell").cast("long").as("cell"),
        coalesce(col("n_existing"), lit(0L)).as("n_existing"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        when(col("n_new").isNotNull,
          round(col("__sum_e6").cast("double") / col("n_new")).cast("long"))
          .as("mean_new_cos_e6"),
        expr("""case when coalesce(n_existing, 0) > 0
          | then cast((cast(coalesce(n_new, 0) as decimal(38,0)) * 2000000 + n_existing)
          |           div (2 * n_existing) as bigint)
          | else null end""".stripMargin.replace("\n", " ")).as("growth_ppm"))
  }

  /** Verified entry (s26). Sort is oracle-determinism only. */
  def s26(spark: SparkSession, dir: String): DataFrame =
    incrementalIvfReport(Tables.vectors(spark, dir))
      .orderBy(col("cell"))

  /** Hard-negative mining (s27) — the contrastive-training data pass
    * (retriever/embedding fine-tuning wants, per anchor, the nearest
    * vectors that are NOT its class: the examples the current space
    * confuses, which carry the gradient signal easy random negatives
    * don't). Per query: top-k highest-cosine neighbors whose label
    * differs, mined through the IVF probe path — the label-mismatch
    * test is a PER-QUERY predicate, so unlike s10's static metadata
    * gate it rides the candidate join, not the corpus scan; the
    * probed-cell pruning still bounds the scored set to
    * ~nprobe/numCells of the corpus per query.
    *
    * Scale shape: exactly ivfKnn's — bounded query set broadcast with
    * its probe fan-out, corpus assigned to cells by the BestCell
    * static kernel in one narrow map, candidates meet on the cell_id
    * equi-join, ranks ride the per-query window over the pruned
    * candidate set. A missed true hard negative (outside the probed
    * cells) is the stated IVF recall trade every s3-family entry
    * prices (s17/s20).
    */
  def hardNegatives(queries: DataFrame, corpus: DataFrame, k: Int = 3,
                    numCells: Int = 0, nprobe: Int = 12,
                    cacheKey: Option[String] = None): DataFrame = {
    val kCells = resolveCells(corpus, numCells, cacheKey)
    val cents = cachedCentroids(corpus, kCells, iters = 3, cacheKey)
    val c = corpus.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"),
        col("label").as("n_label"))
      .withColumn("cell_id", assignBest(col("n_emb"), cents))
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("label").as("q_label"))
      .withColumn("cell_id", explode(probeCells(col("q_emb"), cents, nprobe)))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    broadcast(q).join(c, Seq("cell_id"))
      .filter(col("q_id") =!= col("n_id") && col("q_label") =!= col("n_label"))
      // score BEFORE the dedup/window exchanges: multiprobe duplicates
      // compute the identical cosine, so deduping on the scored narrow
      // frame is equivalent — and the shuffle carries ~40 bytes per
      // candidate instead of two 64-float embeddings (measured: the
      // wide spelling spilled the 50x rung out of disk)
      .withColumn("cos", cosine_sim(col("q_emb"), col("n_emb")))
      .select(col("q_id"), col("q_label"), col("n_id"), col("n_label"), col("cos"))
      .dropDuplicates("q_id", "n_id")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("q_label").cast("long").as("q_label"),
        col("n_id"), col("n_label").cast("long").as("n_label"),
        col("rank").cast("long").as("rank"), round(col("cos"), 6).as("cosine"))
  }

  /** Verified entry (s27). Sort is oracle-determinism only. */
  def s27(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.vectors(spark, dir)
    hardNegatives(querySet(emb), emb, cacheKey = Some(dir))
      .orderBy(col("q_id"), col("rank"))
  }
}
