package graft.tools

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.types.ArrayType
import graft.{GraftSession, SparkEntry}

/** Mechanized wide-exchange audit (round 10): the d5 and d15 finds
  * were instances of ONE pattern — a shuffle exchange whose rows
  * carry an ARRAY payload alongside pair/id keys, which multiplies
  * copies² on duplicated corpora and is always avoidable by either
  * scoring before the exchange (the payload is consumed by a pure
  * function of the row) or identity-collapsing first (the payload is
  * shared across copies). Both were found by hand-walking plans; this
  * tool walks ALL of them: every SparkEntry query executes at the
  * given SF and every ShuffleExchangeLike in the final adaptive plan
  * (query stages and cached-relation builds included) that carries an
  * ArrayType output column is reported as one JSON line
  * (entry, exchange output schema). The report is REVIEWED, not
  * asserted: array-carrying exchanges are often the operator's honest
  * currency (a collapse agg shipping each distinct signature once,
  * collect_list aggregation buffers, posting-set decorations bounded
  * by candidate diversity) — the audit's value is that every one of
  * them is SEEN and classified instead of discovered at 100 TB.
  *
  * Usage: runMain graft.tools.ExchangeAudit [sfDir] [keyPrefix...]
  */
object ExchangeAudit {

  private def walk(p: SparkPlan): Seq[SparkPlan] =
    (p +: p.children.flatMap(walk)) ++ (p match {
      case q: QueryStageExec => walk(q.plan)
      case s: InMemoryTableScanExec => walk(s.relation.cachedPlan)
      case _ => Nil
    })

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val prefixes = args.drop(1).toSeq
    val spark = GraftSession.get("graft-exchange-audit")
    spark.sparkContext.setLogLevel("ERROR")
    val keys = SparkEntry.queries.keys.toSeq.sorted
      .filter(k => prefixes.isEmpty || prefixes.exists(k.startsWith))
    var hits = 0
    keys.foreach { k =>
      try {
        val df = SparkEntry.queries(k)(spark, sfDir)
        df.collect()
        val exec = df.queryExecution.executedPlan match {
          case a: AdaptiveSparkPlanExec => a.executedPlan
          case p => p
        }
        val wide = walk(exec).collect {
          case s: ShuffleExchangeLike if s.output.exists(_.dataType.isInstanceOf[ArrayType]) =>
            s.output.map(a => s"${a.name}:${a.dataType.simpleString}").mkString(", ")
        }.distinct
        wide.foreach { schema =>
          hits += 1
          println(s"""{"entry":"$k","exchange_output":"${schema.replace("\"", "'")}"}""")
        }
      } catch {
        case e: Throwable =>
          // getMessage can be null (NPE) or empty — never let the
          // reporter itself throw and abort the remaining entries
          val msg = Option(e.getMessage).map(_.linesIterator.toSeq.headOption.getOrElse(""))
            .filter(_.nonEmpty).getOrElse(e.getClass.getName)
          println(s"""{"entry":"$k","error":"${msg.take(120).replace("\"", "'")}"}""")
      }
    }
    println(s"""{"audit":"array_carrying_exchanges","entries":${keys.size},"hits":$hits}""")
    spark.stop()
  }
}
