package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

class SourcesSpec extends GraftSpecBase {

  test("json round-trip preserves rows; corrupt records quarantined") {
    val tmp = Files.createTempDirectory("graft_src").toString
    val docs = Tables.documents(spark, sf).select("doc_id", "text", "lang")
    docs.write.mode("overwrite").json(s"$tmp/docs_json")
    // append one corrupt line
    Files.writeString(java.nio.file.Paths.get(s"$tmp/docs_json/zz_corrupt.json"),
      "{not valid json\n")
    // cache: Spark disallows querying only the corrupt column from a raw read
    val back = sources.Sources.readJson(spark, s"$tmp/docs_json", docs.schema).cache()
    assert(back.filter(col("_corrupt_record").isNull).count() == docs.count())
    assert(back.filter(col("_corrupt_record").isNotNull).count() == 1)
  }

  test("csv round-trip with explicit schema") {
    val tmp = Files.createTempDirectory("graft_src").toString
    val ev = Tables.events(spark, sf).select("event_id", "user_id", "event_type", "value")
    ev.write.mode("overwrite").option("header", "true").csv(s"$tmp/ev_csv")
    val back = sources.Sources.readCsv(spark, s"$tmp/ev_csv", ev.schema)
    assert(back.count() == ev.count())
    // double sums are partition-order-dependent: compare with tolerance
    val a = back.agg(sum("value")).head().getDouble(0)
    val b = ev.agg(sum("value")).head().getDouble(0)
    assert(math.abs(a - b) / math.abs(b) < 1e-12, s"$a vs $b")
  }
}
