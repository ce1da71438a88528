package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._

class ExpressionsSpec extends GraftSpecBase {
  import spark.implicits._

  test("minhash signature estimates jaccard of hash sets") {
    // two sets with known overlap: 80 shared of 120 union → j = 2/3
    val shared = (1L to 80L)
    val a = (shared ++ (1001L to 1020L)).toArray
    val b = (shared ++ (2001L to 2020L)).toArray
    val df = Seq((a, b)).toDF("a", "b")
      .select(minhash_signature(col("a"), 256).as("sa"), minhash_signature(col("b"), 256).as("sb"))
      .select(expr("aggregate(zip_with(sa, sb, (p, q) -> if(p = q, 1, 0)), 0, (acc, v) -> acc + v)").as("agree"))
    val est = df.head().getInt(0) / 256.0
    val trueJ = 80.0 / 120.0
    assert(math.abs(est - trueJ) < 0.12, s"est=$est true=$trueJ")
  }

  test("minhash identical inputs give identical signatures") {
    val a = (1L to 50L).toArray
    val r = Seq((a, a)).toDF("a", "b")
      .select((minhash_signature(col("a")) === minhash_signature(col("b"))).as("eq"))
    assert(r.head().getBoolean(0))
  }

  test("simhash: permutation-invariant, near for small edits, far for disjoint") {
    // inputs model the real pipeline: token hashes (well-mixed bits),
    // not raw small integers
    import graft.functions.MixConstants.mix64
    val base = (1L to 100L).map(mix64).toArray
    val permuted = base.reverse
    val edited = base.updated(0, mix64(9999L))
    val disjoint = (10001L to 10100L).map(mix64).toArray
    val df = Seq((base, permuted, edited, disjoint)).toDF("a", "b", "c", "d")
      .select(simhash64(col("a")).as("ha"), simhash64(col("b")).as("hb"),
        simhash64(col("c")).as("hc"), simhash64(col("d")).as("hd"))
      .selectExpr("ha = hb AS perm_eq", "bit_count(ha ^ hc) AS edit_d", "bit_count(ha ^ hd) AS disj_d")
    val r = df.head()
    assert(r.getBoolean(0), "simhash must ignore order")
    assert(r.getInt(1) <= 12, s"small edit should stay near, got ${r.getInt(1)}")
    assert(r.getInt(2) > 12, s"disjoint content should be far, got ${r.getInt(2)}")
  }

  test("cosine_sim matches hand computation and handles zero vectors") {
    val df = Seq(
      (Array(1f, 0f), Array(0f, 1f)),
      (Array(1f, 1f), Array(1f, 1f)),
      (Array(0f, 0f), Array(1f, 1f))).toDF("a", "b")
      .select(cosine_sim(col("a"), col("b")).as("c"))
    val got = df.collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got(0).get === 0.0)
    assert(math.abs(got(1).get - 1.0) < 1e-12)
    assert(got(2).isEmpty, "zero vector → null")
  }

  test("mix64 expression matches the scalar finalizer through codegen") {
    // Mix64 has real doGenCode — running it through a DataFrame select
    // exercises the generated code path, not just nullSafeEval
    val ids = Seq(0L, 1L, -1L, Long.MaxValue, Long.MinValue, 123456789L)
    val got = ids.toDF("x").select(mix64(col("x")).as("h")).collect().map(_.getLong(0))
    assert(got.toSeq == ids.map(graft.functions.MixConstants.mix64))
    // null in → null out
    val n = Seq[java.lang.Long](null).toDF("x").select(mix64(col("x"))).head()
    assert(n.isNullAt(0))
  }

  test("term_frequencies: one-pass counts, unknown-term miss never lands in slot 0") {
    val df = Seq(
      "apple banana apple",
      "zebra zebra zebra", // unknown tokens: must NOT count toward term 0
      "",
      "  apple   banana  " // whitespace runs collapse
    ).toDF("text")
      .select(term_frequencies(col("text"), Seq("apple", "banana")).as("tf"))
      .selectExpr("tf.dl AS dl", "tf.tfs[0] AS t0", "tf.tfs[1] AS t1")
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((3L, 2L, 1L), (3L, 0L, 0L), (0L, 0L, 0L), (2L, 1L, 1L)))
    // null text → null struct
    val n = Seq[String](null).toDF("text")
      .select(term_frequencies(col("text"), Seq("a"))).head()
    assert(n.isNullAt(0))
    // duplicate terms are a construction error (last-wins index map
    // would silently zero the first slot)
    intercept[IllegalArgumentException] {
      Seq("x").toDF("text").select(term_frequencies(col("text"), Seq("a", "a")))
    }
  }

  test("term_frequencies is callable from the SQL surface with literal terms") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT term_frequencies('apple banana apple', 'apple', 'banana') AS tf")
      .selectExpr("tf.dl", "tf.tfs[0]", "tf.tfs[1]").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((3L, 2L, 1L)))
  }

  test("hyperplane bucket is deterministic and spreads vectors") {
    val emb = Tables.embeddings(spark, sf)
    val b1 = emb.select(hyperplane_bucket(col("embedding"), 6).as("b"))
    val nBuckets = b1.distinct().count()
    assert(nBuckets > 10, s"expected spread across buckets, got $nBuckets")
    // determinism across evaluations
    val x = b1.groupBy(col("b")).count().orderBy(col("b")).collect().toSeq
    val y = emb.select(hyperplane_bucket(col("embedding"), 6).as("b"))
      .groupBy(col("b")).count().orderBy(col("b")).collect().toSeq
    assert(x == y)
  }
}
