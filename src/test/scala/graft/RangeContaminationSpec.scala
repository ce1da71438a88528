package graft

import org.apache.spark.sql.functions._

class RangeContaminationSpec extends GraftSpecBase {
  import spark.implicits._

  test("range join equals the naive range predicate join") {
    val ev = Tables.events(spark, sf).withColumn("ts_us", unix_micros(col("ts")))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts_us").as("cts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts_us").as("pts"))
    val w = 30L * 60 * 1000000
    val naive = clicks.join(purchases, Seq("user_id"))
      .filter(col("pts") >= col("cts") && col("pts") <= col("cts") + w)
      .select("click_id", "purchase_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bucketed = operators.RangeJoin.rangeJoin(clicks, purchases,
        "user_id", "cts", "pts", w)
      .select("click_id", "purchase_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive.nonEmpty, "test data must produce at least one pair")
    assert(bucketed == naive)
  }

  test("contamination flags the planted overlap and nothing else") {
    val bench = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda"), // contains all 8-grams
      (11L, "totally different words with no benchmark overlap at all here"),
      (12L, "prefix alpha beta gamma delta epsilon zeta eta theta suffix")) // one 8-gram
      .toDF("doc_id", "text")
    val r = dedup.Contamination.contaminated(corpus, bench, n = 8, minShared = 3)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getBoolean(2))).toMap
    assert(r.contains(10L) && r(10L)._2, "full-overlap doc must be contaminated")
    assert(r.contains(12L) && !r(12L)._2, "single shared shingle stays below minShared")
    assert(!r.contains(11L), "no-overlap doc must not appear")
  }

  test("stratified sampling hits per-stratum rates deterministically") {
    val docs = Tables.documents(spark, sf)
    val s = text.Curation.stratifiedSample(docs, "lang", "doc_id",
      rates = Map("en" -> 4, "zh" -> 8), defaultRate = 6)
    val got = s.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val all = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // id-mod sampling is exact only in expectation; bound loosely
    def rate(l: String) = got.getOrElse(l, 0L).toDouble / all(l)
    assert(rate("en") > 0.25 && rate("en") < 0.55, s"en ${rate("en")}")
    assert(rate("zh") > 0.6 && rate("zh") < 0.95, s"zh ${rate("zh")}")
    // deterministic across reruns
    val again = text.Curation.stratifiedSample(docs, "lang", "doc_id",
      rates = Map("en" -> 4, "zh" -> 8), defaultRate = 6)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == s.select("doc_id").collect().map(_.getLong(0)).toSet)
  }
}
