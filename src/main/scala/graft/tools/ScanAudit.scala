package graft.tools

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import graft.{GraftSession, SparkEntry}

/** Mechanized redundant-scan audit (round 11): the t16 find — a plan
  * whose scaladoc promised two corpus scans executing TEN — is the
  * corpus-pass analogue of the r10 wide-exchange class, and was
  * likewise found by hand-walking one plan. This tool walks ALL of
  * them: every SparkEntry query executes at the given SF and every
  * `FileSourceScanExec` in the final adaptive plan is attributed to
  * its table (parquet directory name) and counted, distinguishing
  *  - LIVE scans — executed every time the query runs, and at 100 TB
  *    each one is a full corpus pass; and
  *  - CACHED-BUILD scans — reachable only through an
  *    `InMemoryTableScanExec`'s relation, executed once at cache
  *    materialization and amortized across consumers (FrameCache's
  *    contract; on eviction they degrade to recompute).
  * Scans under a `ReusedExchangeExec` are not counted (the exchange
  * executes once and is shared), and reused query stages share plan
  * instances, so nodes are deduplicated by identity before counting.
  *
  * An entry is REPORTED when some table's live scan count exceeds
  * the threshold (default 2 — the score-once/count-once law allows a
  * count pass plus a score pass; one-pass operators read once).
  * Like ExchangeAudit this is a reviewed report, not a spec:
  * multi-pass reads over PRUNED or dimension tables are often the
  * operator's honest shape (a two-sided join of two slices of one
  * fact table is two scans of the same parquet directory by name,
  * but each reads a disjoint pushed-filter slice). Its value is that
  * every >2-pass table read is SEEN and classified instead of
  * discovered as N full corpus passes at 100 TB.
  *
  * Usage: runMain graft.tools.ScanAudit [sfDir] [maxLive] [keyPrefix...]
  */
object ScanAudit {

  /** All (node, inCachedBuild) pairs reachable from `p`, descending
    * into query stages and cached-relation build plans, skipping
    * reused-exchange children (executed elsewhere, once).
    */
  private def walk(p: SparkPlan, inCache: Boolean): Seq[(SparkPlan, Boolean)] =
    p match {
      case _: ReusedExchangeExec => Seq((p, inCache))
      case q: QueryStageExec => (p, inCache) +: walk(q.plan, inCache)
      case s: InMemoryTableScanExec =>
        (p, inCache) +: walk(s.relation.cachedPlan, inCache = true)
      case _ => (p, inCache) +: p.children.flatMap(walk(_, inCache))
    }

  /** The scan's table name: last path segment of the root dir
    * (events.parquet, documents.parquet, a lake's day dir, …).
    */
  private def tableOf(s: FileSourceScanExec): String =
    s.relation.location.rootPaths.headOption
      .map(_.getName).getOrElse("<unknown>")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    // the second arg is the threshold only when it IS a number — a
    // caller writing `ScanAudit dir d2` means a key prefix, and
    // silently discarding it would audit all 229 entries instead
    val maxLive = args.drop(1).headOption.flatMap(_.toIntOption).getOrElse(2)
    val prefixes =
      if (args.length > 1 && args(1).toIntOption.isEmpty) args.drop(1).toSeq
      else args.drop(2).toSeq
    val spark = GraftSession.get("graft-scan-audit")
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
        // dedup by node identity: reused stages share plan instances
        val seen = java.util.Collections.newSetFromMap(
          new java.util.IdentityHashMap[SparkPlan, java.lang.Boolean]())
        val scans = walk(exec, inCache = false).collect {
          case (s: FileSourceScanExec, cached) if seen.add(s) =>
            (tableOf(s), cached)
        }
        val byTable = scans.groupBy(_._1).map { case (t, xs) =>
          (t, xs.count(!_._2), xs.count(_._2))
        }
        byTable.toSeq.sortBy(_._1).foreach { case (t, live, cachedN) =>
          if (live > maxLive) {
            hits += 1
            println(s"""{"entry":"$k","table":"$t","live_scans":$live,"cached_build_scans":$cachedN}""")
          }
        }
      } catch {
        case e: Throwable =>
          val msg = Option(e.getMessage).map(_.linesIterator.toSeq.headOption.getOrElse(""))
            .filter(_.nonEmpty).getOrElse(e.getClass.getName)
          println(s"""{"entry":"$k","error":"${msg.take(120).replace("\"", "'")}"}""")
      }
    }
    println(s"""{"audit":"redundant_live_scans","entries":${keys.size},"max_live":$maxLive,"hits":$hits}""")
    spark.stop()
  }
}
