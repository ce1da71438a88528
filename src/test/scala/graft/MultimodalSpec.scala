package graft

import org.apache.spark.sql.functions._

class MultimodalSpec extends GraftSpecBase {

  test("binary meta: byte length and hash over the payload") {
    val r = multimodal.Multimodal.m1(spark, sf)
    val docs = Tables.documents(spark, sf)
    assert(r.count() == docs.count())
    // ASCII text → byte_len equals char length
    val joined = r.join(docs, "doc_id")
      .filter(col("byte_len") =!= length(col("text")))
    assert(joined.count() == 0)
  }

  test("frame sample: bounded fan-out, stride covers the clip") {
    val docs = Tables.documents(spark, sf)
    val r = multimodal.Multimodal.frameSample(docs, maxFrames = 4)
    val perDoc = r.toDF().groupBy("doc_id").count()
      .collect().map(_.getLong(1))
    assert(perDoc.nonEmpty && perDoc.forall(n => n >= 1 && n <= 4),
      "every doc emits between 1 and maxFrames frames")
    // deterministic across runs
    val a = r.collect().toSet
    val b = multimodal.Multimodal.frameSample(docs, maxFrames = 4).collect().toSet
    assert(a == b)
  }

  test("feature extract: deterministic stub features, one row per doc") {
    val a = multimodal.Multimodal.m2(spark, sf).collect().toSeq
    val b = multimodal.Multimodal.m2(spark, sf).collect().toSeq
    assert(a == b, "stub decode must be deterministic")
    assert(a.nonEmpty)
    assert(a.forall(_.getAs[Int]("width") >= 64))
  }
}
