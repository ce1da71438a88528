package graft

import org.apache.spark.sql.functions._
import graft.text.Retrieval

class RetrievalSpec extends GraftSpecBase {
  import spark.implicits._

  // scalar mirror of the scoring contract (same fold order)
  private def bm25Score(tfs: Seq[Long], dfs: Seq[Long], dl: Long,
                        n: Long, sumDl: Long): Double = {
    val avgdl = sumDl.toDouble / n
    val s = tfs.indices.map { i =>
      if (tfs(i) > 0) {
        val idf = math.log(1.0 + (n.toDouble - dfs(i) + 0.5) / (dfs(i) + 0.5))
        val norm = 0.25 + 0.75 * (dl.toDouble / avgdl)
        idf * (tfs(i).toDouble * 2.2) / (tfs(i).toDouble + 1.2 * norm)
      } else 0.0
    }.reduceLeft(_ + _)
    BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  private val corpus = Seq(
    (1L, "apple banana apple"),
    (2L, "apple cherry"),
    (3L, "durian kiwi mango"),
    (4L, "banana banana banana banana")).toDF("doc_id", "text")

  test("bm25: matches the scalar formula on a hand corpus, drops no-hit docs") {
    val got = Retrieval.bm25TopK(corpus, terms = Seq("apple", "banana"), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    // N=4, Σdl=12; df(apple)=2, df(banana)=2
    val exp = Seq(
      1L -> bm25Score(Seq(2, 1), Seq(2, 2), 3, 4, 12),
      4L -> bm25Score(Seq(0, 4), Seq(2, 2), 4, 4, 12),
      2L -> bm25Score(Seq(1, 0), Seq(2, 2), 2, 4, 12))
    assert(got.toSeq == exp, s"got ${got.toSeq}")
    assert(!got.map(_._1).contains(3L), "doc matching no term must be dropped")
  }

  test("bm25: k caps the list; higher-tf doc outranks at equal length") {
    val got = Retrieval.bm25TopK(corpus, terms = Seq("apple", "banana"), k = 1).collect()
    assert(got.length == 1 && got.head.getLong(0) == 1L)
  }

  test("bm25: duplicate query terms are rejected") {
    intercept[IllegalArgumentException] {
      Retrieval.bm25TopK(corpus, terms = Seq("apple", "apple"))
    }
  }

  test("rrf: overlap doc sums both contributions; single-list docs get one") {
    val lex = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("doc_id", "lex_rank")
    val sem = Seq((20L, 1L), (30L, 2L), (40L, 3L)).toDF("doc_id", "sem_rank")
    val got = Retrieval.rrfFusion(lex, sem, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(3)))
    def rr(r: Long): Double = 1.0 / (60.0 + r)
    def rnd(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val exp = Seq(
      20L -> rnd(rr(2) + rr(1)),
      30L -> rnd(rr(3) + rr(2)),
      10L -> rnd(rr(1)),
      40L -> rnd(rr(3)))
    assert(got.toSeq == exp, s"got ${got.toSeq}")
  }

  test("s7 fixture: ranks are positionally dense and fusion score is monotone in rank") {
    val r = Retrieval.s7RrfFusion(spark, sf).collect()
    assert(r.nonEmpty && r.length <= 10)
    val scores = r.map(_.getDouble(3)).toSeq
    assert(scores == scores.sortBy(-(_: Double)), "output must be rrf-descending")
    // every row carries at least one source rank
    assert(r.forall(row => !row.isNullAt(1) || !row.isNullAt(2)))
  }
}
