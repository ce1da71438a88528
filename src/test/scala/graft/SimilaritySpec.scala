package graft

import org.apache.spark.sql.functions._

class SimilaritySpec extends GraftSpecBase {

  private lazy val emb = Tables.embeddings(spark, sf)
  private lazy val queries = emb.filter(col("vec_id") % 50 === 0)

  test("brute-force knn returns k ranked neighbors per query, no self-matches") {
    val r = similarity.Similarity.bruteForceKnn(queries, emb, k = 10)
    val perQ = r.groupBy(col("q_id")).count().collect()
    assert(perQ.nonEmpty && perQ.forall(_.getLong(1) == 10))
    assert(r.filter(col("q_id") === col("n_id")).count() == 0)
    // ranks are 1..10 and cosine is non-increasing in rank
    val one = r.filter(col("q_id") === 0).orderBy(col("rank")).collect()
    assert(one.map(_.getLong(2)).toSeq == (1L to 10L))
    val cos = one.map(_.getDouble(3))
    assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
  }

  test("LSH ANN achieves useful recall against brute force") {
    val exact = similarity.Similarity.bruteForceKnn(queries, emb, k = 10)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = similarity.Similarity.lshKnn(queries, emb, k = 10, numPlanes = 6)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(ann).size.toDouble / exact.size
    assert(recall >= 0.3, s"LSH recall@10 was $recall — buckets mis-sized?")
  }

  test("IVF ANN probes cells and returns ranked results") {
    val r = similarity.Similarity.ivfKnn(queries, emb, k = 10)
    assert(r.count() > 0)
    assert(r.filter(col("q_id") === col("n_id")).count() == 0)
  }
}
