package graft

/** The SQL API surface: the portable-ANSI oracle queries run through
  * spark.sql against registered views and match the DataFrame
  * implementations row-for-row.
  */
class SqlParitySpec extends GraftSpecBase {

  private def parity(key: String): Unit = {
    Tables.registerAll(spark, sf)
    val viaSql = spark.sql(SparkEntry.oracleSql(key)).collect().toSeq
    val viaDf = SparkEntry.queries(key)(spark, sf).collect().toSeq
    assert(viaSql.nonEmpty)
    assert(viaSql == viaDf, s"$key: spark.sql disagrees with the DataFrame plan")
  }

  test("a1 pricing summary: spark.sql == DataFrame")(parity("a1_pricing_summary"))
  test("a5 distinct stats: spark.sql == DataFrame")(parity("a5_distinct_stats"))
  test("a6 semi/anti: spark.sql == DataFrame")(parity("a6_semi_anti"))
  test("d1 exact dedup: spark.sql == DataFrame")(parity("d1_exact_dedup"))
  test("x1 sampling: spark.sql == DataFrame")(parity("x1_hash_sample"))
}
