package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites (one JVM-wide session; suites are
  * read-only over the test data).
  */
trait GraftSpecBase extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSpecBase.session
  val sf: String = "/root/testdata/sf0.001"
}

object GraftSpecBase {
  lazy val session: SparkSession = {
    val wh = java.nio.file.Files.createTempDirectory("graft_wh").toString
    val s = GraftSession.builder("graft-test", cores = 4)
      // local[4, 2]: allow ONE task retry so RetrySpec can inject a
      // first-attempt failure and prove retry determinism; assertions
      // everywhere are on results, so the allowance masks nothing
      .master("local[4, 2]")
      .config("spark.sql.warehouse.dir", wh)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
