package graft.quality

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Declarative data-quality checks — the Spark-native re-expression of
  * the reference's Soda Core check suite
  * (reference: soda/checks/checks_gold.yml: schema presence,
  * row_count > 0, missing_count = 0, avg between bounds).
  *
  * Each check is an aggregate expression evaluated in ONE pass over
  * the table (single job, no per-check scans — at 100 TB a check
  * suite that rescans per check is unusable; this compiles the whole
  * suite into a single aggregation).
  */
object Checks {

  sealed trait Check {
    def name: String
    /** Aggregate expression producing the measured value. */
    def value: Column
    /** Pass/fail predicate over the measured value. */
    def passed(v: Column): Column
  }

  final case class RowCountAbove(min: Long) extends Check {
    val name = "row_count"
    def value: Column = count(lit(1)).cast("double")
    def passed(v: Column): Column = v > min
  }

  final case class MissingCount(column: String, maxAllowed: Long = 0) extends Check {
    val name = s"missing_count_$column"
    def value: Column = sum(when(col(column).isNull, 1).otherwise(0)).cast("double")
    def passed(v: Column): Column = v <= maxAllowed
  }

  final case class DuplicateCount(column: String, maxAllowed: Long = 0) extends Check {
    val name = s"duplicate_count_$column"
    def value: Column = (count(col(column)) - countDistinct(col(column))).cast("double")
    def passed(v: Column): Column = v <= maxAllowed
  }

  final case class AvgBetween(column: String, lo: Double, hi: Double) extends Check {
    val name = s"avg_$column"
    def value: Column = round(avg(col(column)), 6)
    def passed(v: Column): Column = v.between(lo, hi)
  }

  final case class MinAtLeast(column: String, lo: Double) extends Check {
    val name = s"min_$column"
    def value: Column = round(min(col(column).cast("double")), 6)
    def passed(v: Column): Column = v >= lo
  }

  /** Missing required columns — the reference's schema check. Purely
    * metadata (no scan).
    */
  def missingColumns(df: DataFrame, required: Seq[String]): Seq[String] =
    required.filterNot(df.columns.toSet)

  /** Compile a check suite into one aggregation pass; returns a long
    * DataFrame (check_name, value, passed) ordered by check_name.
    */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val aggs = checks.flatMap { c =>
      Seq(c.value.as(s"__v_${c.name}"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val structs = checks.map { c =>
      val v = col(s"__v_${c.name}")
      struct(lit(c.name).as("check_name"), v.as("value"), c.passed(v).as("passed"))
    }
    wide.select(explode(array(structs: _*)).as("r"))
      .select(col("r.check_name"), col("r.value"), col("r.passed"))
      .orderBy(col("check_name"))
  }

  /** The verified suite over `events` (SURVEY §2 p5), mirroring the
    * reference's gold checks.
    */
  def p5EventChecks(spark: SparkSession, dir: String): DataFrame =
    run(Tables.events(spark, dir), Seq(
      RowCountAbove(0),
      MissingCount("user_id"),
      DuplicateCount("event_id"),
      AvgBetween("value", 0.0, 1000.0),
      MinAtLeast("value", 0.0)))
}
