package graft

/** Child-process half of the TWO-JVM commit-claim race
  * (SourcesSpec's "two real JVMs" test, VERDICT r11 item 4): a
  * separate java process that contends for the same commit-log slots
  * as the spawning test JVM through the REAL [[sources.Lake.tryCommit]]
  * path. Being a second process, it shares NOTHING with the parent
  * but the filesystem — its in-JVM claim registry is empty — so the
  * only thing stopping a double-win is the on-disk O_CREAT|O_EXCL
  * claim file the round-11 fix added.
  *
  * Protocol: args = root, writerId, nSlots, readyFile, goFile,
  * outFile. Signals readiness by creating readyFile, spin-waits for
  * the parent to create goFile (so both sides enter the race within
  * milliseconds), attempts every slot 0..nSlots-1 once in order, and
  * writes the comma-separated list of slots it WON to outFile
  * (atomically, via tmp+move — the parent polls for the file).
  */
object ClaimRaceMain {
  def main(args: Array[String]): Unit = {
    val Array(root, writerId, nStr, readyF, goF, outF) = args
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "2")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // Pre-warm the whole commit path (classloading, Hadoop FS init)
    // on a throwaway root BEFORE signalling ready, so the raced
    // sweep's per-slot cost matches the already-warm parent's.
    val scratch = java.nio.file.Files.createTempDirectory("graft_claim_warm").toString
    sources.Lake.tryCommit(spark, scratch, 0,
      Seq(sources.Lake.LogEntry("A", "2024-01-01", "warm")))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(readyF), "ready")
    val go = java.nio.file.Paths.get(goF)
    val deadline = System.currentTimeMillis + 60000
    while (!java.nio.file.Files.exists(go) &&
      System.currentTimeMillis < deadline) Thread.sleep(2)
    // DESCENDING sweep — the parent ascends, so the two writers are
    // guaranteed to meet and contend somewhere mid-range
    val won = ((nStr.toInt - 1) to 0 by -1).filter { v =>
      sources.Lake.tryCommit(spark, root, v,
        Seq(sources.Lake.LogEntry("A", f"2024-01-${(v % 28) + 1}%02d", s"$writerId-v$v")))
    }
    val out = java.nio.file.Paths.get(outF)
    val tmp = out.resolveSibling(out.getFileName.toString + ".tmp")
    java.nio.file.Files.writeString(tmp, won.mkString(","))
    java.nio.file.Files.move(tmp, out,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    spark.stop()
  }
}
