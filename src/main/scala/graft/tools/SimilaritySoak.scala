package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.similarity.Similarity

/** Similarity-family derived-scale soak (VERDICT r7 lead item): the
  * IVF/kNN-graph/filtered-search scale contracts were plan-pinned at
  * sf0.1 but never wall-measured at a larger rung — the derived
  * corpora carried no embeddings. ScaleSoak.deriveCorpus now derives
  * them (re-keyed copies with deterministic ±1% component jitter, so
  * copies land NEAR their original — cells grow denser without
  * collapsing into single points). This tool measures, per rung:
  *
  *  1. IVF cell-size distribution under the derived skew vs the
  *     ≈ n/numCells contract (numCells = ceil(n/targetCellSize),
  *     d9's sizing) — and the within-cell pair mass Σ sz·(sz−1)/2,
  *     the join work s15/d9 actually do;
  *  2. s15 kNN-graph wall + edge count at the scaled geometry;
  *  3. s10-shaped filtered search: IVF restricted to label%2==0 vs
  *     the exact filtered brute force — recall@10 on a bounded
  *     planted query set (the jittered copies ARE the planted
  *     neighbors: each query's true top-k is dominated by its own
  *     copies, the realistic near-dup regime);
  *  4. s3-vs-s1: unfiltered IVF recall@10 + wall vs brute force on
  *     the same query set.
  *
  * Usage: runMain graft.tools.SimilaritySoak [sfDir] [outRoot] [factor]
  * Prints one JSON line per check; summary goes to SCALE.md by hand.
  */
object SimilaritySoak {

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** recall@k of `got` against exact `truth`, both (q_id, n_id) pair
    * frames — computed distributed, returned as (hits, truthSize).
    */
  private def recall(got: DataFrame, truth: DataFrame): (Long, Long) = {
    val t = truth.select(col("q_id"), col("n_id")).persist()
    val hits = t.join(got.select(col("q_id"), col("n_id")), Seq("q_id", "n_id"))
      .count()
    val n = t.count()
    t.unpersist()
    (hits, n)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outRoot = if (args.length > 1) args(1) else "target/scale10"
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = GraftSession.get("graft-similarity-soak")
    spark.sparkContext.setLogLevel("ERROR")
    val (_, deriveS) = timed(ScaleSoak.deriveCorpus(spark, sfDir, outRoot, factor))
    println(f"""{"check":"derive","factor":$factor,"wall_s":$deriveS%.2f}""")

    val emb = Tables.embeddings(spark, outRoot).persist()
    val n = emb.count()
    // d9's sizing at a locally meaningful target (production uses
    // 4096; at 20k-100k vectors that would give 5-25 cells — too few
    // to exercise skew): cells stay ≈512 so the geometry scales with
    // the corpus exactly as the contract states.
    val targetCellSize = 512
    val numCells = math.max(16L, (n + targetCellSize - 1) / targetCellSize).toInt
    val cacheKey = Some(s"$outRoot#soak")

    // -- 1. cell-size distribution + pair mass ----------------------
    val (cents, trainS) = timed(
      Similarity.cachedCentroids(emb, numCells, iters = 3, cacheKey))
    val assigned = emb
      .withColumn("cell_id", Similarity.assignBest(col("embedding"), cents))
    val sizes = assigned.groupBy(col("cell_id")).count()
      .select(col("count")).as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().sorted // ≤ numCells values — bounded driver collect
    val pairMass = sizes.map(s => s * (s - 1) / 2).sum
    val p50 = sizes(sizes.length / 2)
    val p95 = sizes((sizes.length * 95) / 100 min (sizes.length - 1))
    println(s"""{"check":"ivf_cells","n":$n,"num_cells":$numCells,""" +
      s""""nonempty_cells":${sizes.length},"expected":${n / numCells},""" +
      s""""min":${sizes.head},"p50":$p50,"p95":$p95,"max":${sizes.last},""" +
      f""""pair_mass":$pairMass,"allpairs_mass":${n * (n - 1) / 2},"train_s":$trainS%.2f}""")

    // -- 2. s15 kNN graph at the scaled geometry ---------------------
    val (edges, s15S) = timed(
      Similarity.knnGraph(emb, k = 5, numCells = numCells, cacheKey = cacheKey).count())
    println(f"""{"check":"s15_knn_graph","edges":$edges,"wall_s":$s15S%.2f,"num_cells":$numCells}""")

    // -- planted query set: ~400 queries regardless of rung ---------
    val qMod = math.max(1L, n / 400)
    val queries = emb.filter(col("vec_id") % qMod === 0)
    val nQ = queries.count()
    // probe-budget ladder (s20's shape): recall is a function of the
    // probed-cell fraction — report it per rung instead of pinning one
    // nprobe, so the ≥0.9 gate names the budget that buys it
    val ladder = Seq(16, 8, 4, 2).map(d => math.max(2, numCells / d)).distinct

    // -- 3. filtered search (s10's shape) at scale -------------------
    val pred = col("label") % 2 === 0
    val (exactF, exFS) = timed {
      val d = Similarity.bruteForceKnn(queries, emb.filter(pred), k = 10).persist()
      d.count(); d
    }
    ladder.foreach { nprobe =>
      val (ivfF, ivFS) = timed {
        val d = Similarity.ivfKnn(queries, emb, k = 10, numCells = numCells,
          nprobe = nprobe, cacheKey = cacheKey, corpusPredicate = Some(pred)).persist()
        d.count(); d
      }
      val (fHits, fTruth) = recall(ivfF, exactF)
      println(f"""{"check":"s10_filtered_recall","queries":$nQ,"nprobe":$nprobe,""" +
        f""""num_cells":$numCells,"recall":${fHits.toDouble / fTruth}%.4f,""" +
        f""""ivf_s":$ivFS%.2f,"brute_s":$exFS%.2f}""")
      ivfF.unpersist()
    }
    exactF.unpersist()

    // -- 4. s3 vs s1: unfiltered IVF recall + wall -------------------
    val (exact, exS) = timed {
      val d = Similarity.bruteForceKnn(queries, emb, k = 10).persist()
      d.count(); d
    }
    // sibling concentration: what share of the exact top-10 are the
    // query's own jittered copies (same origin id mod the copy shift)
    val orig = (c: org.apache.spark.sql.Column) => pmod(c, lit(10000000L))
    val sibShare = {
      val t = exact.count()
      exact.filter(orig(col("q_id")) === orig(col("n_id"))).count().toDouble / t
    }
    ladder.foreach { nprobe =>
      val (ivf, ivS) = timed {
        val d = Similarity.ivfKnn(queries, emb, k = 10, numCells = numCells,
          nprobe = nprobe, cacheKey = cacheKey).persist()
        d.count(); d
      }
      val (hits, truthN) = recall(ivf, exact)
      println(f"""{"check":"s3_vs_s1","queries":$nQ,"nprobe":$nprobe,"num_cells":$numCells,""" +
        f""""recall":${hits.toDouble / truthN}%.4f,"sibling_share":$sibShare%.4f,""" +
        f""""ivf_s":$ivS%.2f,"brute_s":$exS%.2f}""")
      ivf.unpersist()
    }

    emb.unpersist()
    spark.stop()
  }
}
