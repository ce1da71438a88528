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

  /** Byte span of the balanced-brace object that starts at the first
    * `{` at/after `from`. Artifact JSON is machine-written (no brace
    * characters inside strings other than the quoted schema-free
    * query keys), so a depth counter that skips string literals is a
    * faithful extractor without a JSON library.
    */
  private def balancedObject(body: String, from: Int): String = {
    val start = body.indexOf('{', from)
    if (start < 0) return ""
    var i = start; var depth = 0; var inStr = false
    while (i < body.length) {
      body.charAt(i) match {
        case '"' if i == 0 || body.charAt(i - 1) != '\\' => inStr = !inStr
        case '{' if !inStr => depth += 1
        case '}' if !inStr =>
          depth -= 1
          if (depth == 0) return body.substring(start, i + 1)
        case _ => ()
      }
      i += 1
    }
    body.substring(start)
  }

  private val QueriesKey: Regex = "\"queries\"\\s*:\\s*\\{".r

  private def perFamily(path: String): Map[String, (Int, Double)] = {
    val body = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8")
    // Parse the `queries` object EXPLICITLY (ADVICE r10): descend
    // through nested "queries": { … } wrappers (bench_last.json nests
    // the per-query warm-median map inside the "queries" section) and
    // read key/values only inside the innermost one — no dependence
    // on the artifact's total → queries → diag section ordering, and
    // the diag/cold maps can never shadow or supply a value.
    def innermost(obj: String): String =
      QueriesKey.findFirstMatchIn(obj) match {
        case Some(m) => innermost(balancedObject(obj, m.end - 1))
        case None    => obj
      }
    val scope = QueriesKey.findFirstMatchIn(body) match {
      case Some(m) => innermost(balancedObject(body, m.end - 1))
      case None    => body // plain {key: sec} artifact — use as-is
    }
    val kv = KeyVal.findAllMatchIn(scope)
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
        // a family absent from the base artifact has no growth to state
        val growth = if (b == 0.0) "-" else s"${f1(s / b)}x"
        println(s"| $f | $nb | ${f1(b)} | ${f1(s)} | $growth |")
      }
      val totalGrowth = if (tb == 0.0) "-"
        else s"${"%.2f".formatLocal(java.util.Locale.ROOT, ts / tb)}x"
      println(s"| **total** | $n | ${f1(tb)} | ${f1(ts)} | **$totalGrowth** |")
    }
  }
}
