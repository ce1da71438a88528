package graft.tools

import scala.util.matching.Regex

/** Round-close helper (VERDICT r9 item 4): print the per-family
  * warm-total markdown table from committed bench artifacts, so
  * SCALE.md's re-stamp is mechanical and always derives from the
  * canonical file instead of an intermediate builder sweep.
  *
  * Usage: runMain graft.tools.FamilyTotals [benchJson] [scaleJson]
  *   (defaults: bench_last.json bench_scale10.json; pass "-" as the
  *    second arg for a single-artifact table without growth)
  *
  * Pure text parsing — no SparkSession; works on any Bench-written
  * artifact (the per-query map under "queries").
  */
object FamilyTotals {

  private val families = Seq("p", "a", "st", "d", "x", "s", "t", "m")
  // longest-prefix first so "st1"/"s1" split correctly
  private val KeyVal: Regex = "\"((?:st|p|a|d|x|s|t|m)\\d[a-z0-9_]*)\"\\s*:\\s*([0-9.]+)".r
  private val Fam: Regex = "^(st|p|a|d|x|s|t|m)\\d.*".r

  private def perFamily(path: String): Map[String, (Int, Double)] = {
    val body = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8")
    // take the FIRST occurrence of each key: Bench artifacts lay out
    // total (slowest medians) → queries (median map) → diag (pass-1
    // cold map), so the first value seen for a key is always a warm
    // median and the trailing cold map never wins
    val kv = KeyVal.findAllMatchIn(body)
      .map(m => m.group(1) -> m.group(2).toDouble)
      .foldLeft(Map.empty[String, Double]) { case (acc, (k, v)) =>
        if (acc.contains(k)) acc else acc + (k -> v)
      }
    kv.toSeq.groupBy { case (k, _) => val Fam(f) = k; f }
      .view.mapValues(xs => (xs.size, xs.map(_._2).sum)).toMap
  }

  def main(args: Array[String]): Unit = {
    val basePath = args.headOption.getOrElse("bench_last.json")
    val scalePath = if (args.length > 1) args(1) else "bench_scale10.json"
    val base = perFamily(basePath)
    val scale = if (scalePath == "-") Map.empty[String, (Int, Double)]
      else perFamily(scalePath)
    def f1(v: Double) = "%.1f".formatLocal(java.util.Locale.ROOT, v)
    if (scale.isEmpty) {
      println("| family | entries | warm (s) |")
      println("| --- | --- | --- |")
      var (n, t) = (0, 0.0)
      families.foreach { f =>
        val (nb, b) = base.getOrElse(f, (0, 0.0)); n += nb; t += b
        println(s"| $f | $nb | ${f1(b)} |")
      }
      println(s"| **total** | $n | **${f1(t)}** |")
    } else {
      println("| family | entries | sf0.1 warm (s) | 10x warm (s) | growth |")
      println("| --- | --- | --- | --- | --- |")
      var (n, tb, ts) = (0, 0.0, 0.0)
      families.foreach { f =>
        val (nb, b) = base.getOrElse(f, (0, 0.0))
        val (_, s) = scale.getOrElse(f, (0, 0.0))
        n += nb; tb += b; ts += s
        println(s"| $f | $nb | ${f1(b)} | ${f1(s)} | ${f1(s / b)}x |")
      }
      println(s"| **total** | $n | ${f1(tb)} | ${f1(ts)} | **${"%.2f".formatLocal(java.util.Locale.ROOT, ts / tb)}x** |")
    }
  }
}
