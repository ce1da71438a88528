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

  test("both SQL registration surfaces expose the identical function set") {
    // register() (programmatic) and GraftExtensions (pure-SQL session)
    // both iterate GraftFunctions.sqlFunctions; this pins the contract
    // so a new expression can't be added to one surface only.
    val names = functions.GraftFunctions.sqlFunctions.map(_._1).toSet
    assert(names.contains("hyperplane_bucket") && names.contains("text_stats"))
    assert(names.contains("mix64") && names.contains("term_frequencies"),
      "every Column-API expression with a SQL spelling must be in the one builder list")
    functions.GraftFunctions.register(spark)
    names.foreach { n =>
      assert(spark.catalog.functionExists(n), s"register() missing $n")
    }
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new plans.GraftExtensions().apply(ext)
    val injected = org.apache.spark.sql.GraftBridge.extensionFunctionNames(ext).toSet
    assert(names.subsetOf(injected),
      s"extensions path missing ${names -- injected}")
  }
}
