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

  test("zorder: bit-exact interleave, provable per-bucket span bound, contiguous layout files") {
    import spark.implicits._
    // a=0b101, b=0b011 -> z = a bits at odd positions, b at even:
    // a2..a0=1,0,1 -> bits 5,3,1 = 1,0,1; b2..b0=0,1,1 -> bits 4,2,0 = 0,1,1
    // z = 100111b = 39
    val one = Seq((5L, 3L)).toDF("a", "b")
      .select(sources.Lake.zorderKey(col("a"), col("b"), 3).as("z"))
    assert(one.head().getLong(0) == 39L)

    // mathematical locality bound: zbucket = z >> 8 fixes the high 8
    // bits of each 12-bit dim -> per-bucket span <= 15 on BOTH dims
    val rep = sources.Lake.p17ZorderLayout(spark, sf).collect()
    assert(rep.nonEmpty)
    rep.foreach { r =>
      assert(r.getLong(3) - r.getLong(2) <= 15L, s"len span bound broken: $r")
      assert(r.getLong(5) - r.getLong(4) <= 15L, s"src span bound broken: $r")
    }

    // layout: range-partitioned files cover disjoint contiguous
    // z-ranges -> every file is a narrow min/max box (the skipping
    // property a reader's predicate pushdown uses)
    val docs = Tables.documents(spark, sf)
    val srcBin = docs.select(col("source")).distinct()
      .withColumn("source_bin", (row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("source"))) - 1).cast("long"))
    val keyed = docs.join(broadcast(srcBin), Seq("source"))
      .withColumn("len_bits", least(col("n_chars"), lit(4095L)))
    val laid = sources.Lake.zorderLayout(
      keyed, sources.Lake.zorderKey(col("source_bin"), col("len_bits"), 12), 8)
    val ranges = laid
      .select(col("__z"), spark_partition_id().as("pid"))
      .groupBy(col("pid")).agg(min("__z").as("lo"), max("__z").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges.sliding(2).forall {
      case Array((_, hi1), (lo2, _)) => hi1 <= lo2
      case _ => true
    }, s"files must cover disjoint z-ranges: ${ranges.toSeq}")
  }

  test("p19 retention plan: ladder counts against the corpus max day, shares exact") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val day = 86400000000L
    // max day = d10; ages: d10→0, d9→1, d5→5, d1→9
    val ev = Seq((10L, 3L), (9L, 2L), (5L, 4L), (1L, 1L)).flatMap {
      case (d, n) => Seq.fill(n.toInt)(d * day)
    }.toDF("ts_us").withColumn("ts", timestamp_micros(col("ts_us")))
    val r = sources.Lake.retentionPlan(ev, ladder = Seq(1, 2, 7)).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(r(1L) == ((3L, 7L)), s"keep only age 0: ${r(1L)}")
    assert(r(2L) == ((5L, 5L)), s"keep ages 0-1: ${r(2L)}")
    assert(r(7L) == ((9L, 1L)), s"keep ages 0-6: ${r(7L)}")
  }

  test("p32 partition skew: even/odd median law, ppm rounding, hot day flagged") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val day = 86400000000L
    def ev(counts: Seq[(Long, Int)]) = counts.flatMap {
      case (d, n) => Seq.fill(n)(d * day)
    }.toDF("ts_us").withColumn("ts", timestamp_micros(col("ts_us")))
      .withColumn("props", lit("{}"))
    // even day count: counts [1,2,3,10] → middles 2,3 → median 2.5
    val r4 = sources.Lake.partitionSkew(ev(Seq((1L, 1), (2L, 2), (3L, 3), (4L, 10))))
      .collect().map(x => x.getLong(1) ->
        ((x.getLong(2), x.getLong(3), x.getLong(4), x.getBoolean(5)))).toMap
    // props "{}" → weight 2+16=18 bytes/row
    assert(r4(10L) == ((180L, 625000L, 4000000L, true)), s"hot day: ${r4(10L)}")
    assert(r4(1L) == ((18L, 62500L, 400000L, false)), s"cold day: ${r4(1L)}")
    assert(r4(3L)._4 == false, "3 rows vs median 2.5 is not 2x-skewed")
    // odd day count: counts [1,2,10] → median 2 exactly
    val r3 = sources.Lake.partitionSkew(ev(Seq((1L, 1), (2L, 2), (3L, 10))))
      .collect().map(x => x.getLong(1) -> ((x.getLong(4), x.getBoolean(5)))).toMap
    assert(r3(10L) == ((5000000L, true)), s"odd-n median must be the middle: ${r3(10L)}")
    assert(r3(2L) == ((1000000L, false)), s"median day sits at exactly 1x: ${r3(2L)}")
  }

  test("p20 dynamic overwrite: re-writing one day replaces it in place, other days survive") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val day = 86400000000L
    val path = java.nio.file.Files.createTempDirectory("p20_spec").toString
    def ev(rows: (Long, Long, Double)*) =
      rows.toSeq.toDF("event_id", "ts_us", "value")
        .withColumn("ts", timestamp_micros(col("ts_us")))
    // two days, then re-write day 1 with different values
    sources.Lake.writeDatePartitioned(
      ev((1L, 1L * day, 1.0), (2L, 1L * day, 2.0), (3L, 2L * day, 3.0)), path)
    sources.Lake.overwritePartitions(
      ev((1L, 1L * day, 9.0), (2L, 1L * day, 9.0)), path)
    val back = spark.read.parquet(path)
      .groupBy(col("p_date").cast("string")).agg(sum(col("value")).as("v"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(back.size == 2, s"day 2 must survive the day-1 re-write: $back")
    assert(back("1970-01-02") == ((18.0, 2L)), s"day 1 must be replaced: $back")
    assert(back("1970-01-03") == ((3.0, 1L)), s"day 2 untouched: $back")
    // the conf override must not leak into the caller session
    assert(spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
      .equalsIgnoreCase("static"))
  }

  test("p24 compaction lake: fragmented days collapse to sized outputs, rows conserved") {
    val path = sources.Lake.compactedLake(spark, sf)
    def files(sub: String): Array[java.io.File] =
      new java.io.File(path, sub).listFiles()
        .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    val days = new java.io.File(path).listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("p_date="))
      .map(_.getName)
    assert(days.nonEmpty, "compacted lake must have day partitions")
    // tiny data → every day's bytes fit one 128MB target output
    days.foreach { d =>
      assert(files(d).length == 1, s"$d must compact to one sized file, " +
        s"got ${files(d).length}")
    }
    // conservation against the flat source
    val flat = Tables.events(spark, sf).count()
    assert(spark.read.parquet(path).count() == flat,
      "compaction must conserve every row")
  }

  test("p25 WAP: failed batch stays in _staging, invisible to lake-root readers") {
    val root = sources.Lake.wapLake(spark, sf)
    assert(new java.io.File(root, "batch=g0").isDirectory,
      "clean batch must publish")
    assert(new java.io.File(root, "_staging/batch=b1").isDirectory,
      "failed batch must remain staged (its own dead letter)")
    assert(!new java.io.File(root, "batch=b1").exists(),
      "failed batch must never reach the published namespace")
    val ev = Tables.events(spark, sf)
    val published = spark.read.parquet(root)
    assert(published.count() ==
      ev.filter(pmod(col("event_id"), lit(2)) === 0).count(),
      "root readers must see exactly the clean half")
    // and the staged dead letter is intact for inspection/repair
    assert(spark.read.parquet(s"$root/_staging/batch=b1").count() ==
      ev.filter(pmod(col("event_id"), lit(2)) === 1).count())
  }

  test("p23 merge-apply: keyed upsert is partition-local, untouched day files byte-identical") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val day = 86400000000L
    val path = java.nio.file.Files.createTempDirectory("p23_spec").toString
    def ev(rows: (Long, Long, Double)*) =
      rows.toSeq.toDF("event_id", "ts_us", "value")
        .withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")
    // three days; the merge batch touches ONLY day 1
    sources.Lake.writeDatePartitioned(
      ev((1L, 1L * day, 1.0), (2L, 1L * day, 2.0),
         (3L, 2L * day, 3.0), (4L, 3L * day, 4.0)), path)
    def fileState(sub: String): Map[String, (Long, String)] =
      new java.io.File(path, sub).listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .map { f =>
          val bytes = java.nio.file.Files.readAllBytes(f.toPath)
          val md5 = java.security.MessageDigest.getInstance("MD5").digest(bytes)
            .map("%02x".format(_)).mkString
          f.getName -> ((bytes.length.toLong, md5))
        }.toMap
    val d2Before = fileState("p_date=1970-01-03")
    val d3Before = fileState("p_date=1970-01-04")
    // update key 1, insert key 9 — both on day 1
    sources.Lake.mergeApply(spark, path,
      ev((1L, 1L * day, 99.0), (9L, 1L * day, 9.0)))
    assert(fileState("p_date=1970-01-03") == d2Before,
      "day-2 files must survive the day-1 merge byte-identical")
    assert(fileState("p_date=1970-01-04") == d3Before,
      "day-3 files must survive the day-1 merge byte-identical")
    val back = spark.read.parquet(path)
      .select(col("event_id"), col("value")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(back == Map(1L -> 99.0, 2L -> 2.0, 3L -> 3.0, 4L -> 4.0, 9L -> 9.0),
      s"merge must update key 1, insert key 9, keep everything else: $back")
  }

  test("p18 schema evolution: merged read unions schemas, null-fills the old generation") {
    import org.apache.spark.sql.functions._
    val path = sources.Lake.evolvedLake(spark, sf)
    val merged = sources.Lake.mergeSchemaRead(spark, path)
    assert(merged.columns.contains("quality_flag"),
      "late-added column must appear in the merged schema")
    val v1 = merged.filter(col("batch") === "v1")
    assert(v1.filter(col("quality_flag").isNotNull).count() == 0,
      "pre-evolution rows must come back null-filled, not dropped or errored")
    val total = graft.Tables.events(spark, sf).count()
    assert(merged.count() == total, "both generations must be read")
    // the 100 TB path — a DECLARED evolved schema instead of a
    // per-file footer merge — must return the identical frame
    val declared = spark.read.schema(merged.schema.fields
        .filterNot(_.name == "batch")
        .foldLeft(new org.apache.spark.sql.types.StructType())(_ add _))
      .parquet(path)
    assert(declared.count() == total &&
      declared.filter(col("quality_flag").isNull).count() == v1.count(),
      "declared-schema read must match the footer-merge read")
  }

  test("p26 manifest: per-file stats match the dir listing on a multi-file day; prune decision") {
    import spark.implicits._
    // 3 days × 30 rows, forced across 3 writer tasks → 3 files per day
    val ev = (0 until 90).map { i =>
      (i.toLong, s"2024-01-0${1 + i % 3} 10:${10 + i / 3}:00", s"t${i % 2}")
    }.toDF("event_id", "__s", "event_type")
      .withColumn("ts", to_timestamp(col("__s"))).drop("__s")
    val path = java.nio.file.Files.createTempDirectory("graft_p26").toString
    sources.Lake.writeDatePartitioned(ev.repartition(3), path)
    // window covering exactly day 2
    val window = spark.range(1).select(
      unix_micros(to_timestamp(lit("2024-01-02 00:00:00"))).as("__lo"),
      unix_micros(to_timestamp(lit("2024-01-02 23:59:59"))).as("__hi"))
    val m = sources.Lake.scanPruneManifest(spark, path, window)
      .orderBy(col("p_date")).collect()
    assert(m.length == 3)
    // n_files agrees with the REAL listing, day rows roll up exactly
    m.foreach { r =>
      val files = new java.io.File(s"$path/p_date=${r.getString(0)}")
        .listFiles().count(_.getName.endsWith(".parquet"))
      assert(r.getLong(1) == files && files > 1,
        s"manifest n_files=${r.getLong(1)} vs listing $files for ${r.getString(0)}")
      assert(r.getLong(2) == 30, "per-file counts must sum to the day truth")
      assert(r.getString(5) == "t0" && r.getString(6) == "t1")
    }
    assert(m.map(r => (r.getString(0), r.getBoolean(7))).toSeq ==
      Seq(("2024-01-01", false), ("2024-01-02", true), ("2024-01-03", false)),
      "stats alone must admit exactly the window's day")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(path))
  }

  test("p27 incremental manifest: delta pass reads ONLY the commit's files; merged == full recompute") {
    def norm(p: String): String =
      if (p.startsWith("file:")) new java.net.URI(p).getPath else p
    val (root, baseFiles, newFiles) = sources.Lake.manifestLake(spark, sf)
    assert(baseFiles.nonEmpty && newFiles.nonEmpty)
    // the O(commit) contract: the incremental pass never opens the lake
    val delta = sources.Lake.perFileStats(spark, root, newFiles)
    delta.collect()
    val read = delta.inputFiles.map(norm).toSet
    assert(read == newFiles.map(norm).toSet,
      s"delta pass must read exactly the commit's files; extra: ${read -- newFiles.map(norm).toSet}")
    // value contract: merge == from-scratch full-lake manifest
    val merged = sources.Lake.p27IncrementalManifest(spark, sf)
      .collect().map(_.toSeq).toSeq
    val full = sources.Lake.manifestRollup(sources.Lake.perFileStats(spark, root))
      .orderBy(col("p_date")).collect().map(_.toSeq).toSeq
    assert(merged == full, "incrementally-merged manifest must equal the recompute")
    // p28 time travel: the as-of-commit-0 read sees EXACTLY the
    // pinned files — the appended commit is invisible
    val asOf = spark.read.option("basePath", root).parquet(baseFiles: _*)
    asOf.collect()
    assert(asOf.inputFiles.map(norm).toSet == baseFiles.map(norm).toSet,
      "snapshot read must scan the pinned file list and nothing else")
    val total = graft.Tables.events(spark, sf).count()
    val base = graft.Tables.events(spark, sf)
      .filter(col("event_id") % 7 =!= 3).count()
    assert(asOf.count() == base && base < total,
      "snapshot row count must equal the commit-0 slice, not the live table")
  }

  test("p29 vacuum: removes exactly the orphans, tracked bytes untouched, naive reader healed") {
    def norm(p: String): String =
      if (p.startsWith("file:")) new java.net.URI(p).getPath else p
    def md5(p: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
      d.digest(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(norm(p))))
        .map("%02x".format(_)).mkString
    }
    val (root, tracked, orphans) = sources.Lake.orphanLake(spark, sf)
    assert(orphans.size == 2)
    assert(sources.Lake.findOrphans(spark, root, tracked).map(norm).toSet ==
      orphans.map(norm).toSet, "detector must find exactly the planted strays")
    // a directory-trusting reader double-counts the orphaned days
    val trackedRows = spark.read.option("basePath", root)
      .parquet(tracked: _*).count()
    assert(spark.read.parquet(root).count() > trackedRows,
      "orphans must be visible to a naive reader (that is the bug)")
    val trackedMd5 = tracked.map(p => norm(p) -> md5(p)).toMap
    val orphanBytes = orphans.map(p =>
      p -> java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(norm(p)))).toMap
    val removed = sources.Lake.vacuum(spark, root, tracked)
    try {
      assert(removed.map(norm).toSet == orphans.map(norm).toSet,
        "vacuum must delete exactly the orphan set")
      assert(sources.Lake.findOrphans(spark, root, tracked).isEmpty)
      assert(tracked.forall(p => md5(p) == trackedMd5(norm(p))),
        "vacuum must never touch a manifest-tracked byte")
      assert(spark.read.parquet(root).count() == trackedRows,
        "after vacuum the naive reader sees the manifest truth")
    } finally {
      // restore the strays: the lake is a JVM-wide memoized fixture
      // and other consumers (the p29 entry) expect the planted state
      orphanBytes.foreach { case (p, bytes) =>
        java.nio.file.Files.write(java.nio.file.Paths.get(norm(p)), bytes)
      }
    }
  }

  test("p25 audit exemptions mirror all three checks; the planted-null assert fires only when provable (ADVICE r11)") {
    import spark.implicits._
    def corpus(rows: Seq[(Long, String, Long, String, Double)]): String = {
      val dir = java.nio.file.Files.createTempDirectory("graft_wap_adv").toString
      rows.toDF("event_id", "__ts", "user_id", "event_type", "value")
        .withColumn("ts", to_timestamp(col("__ts"))).drop("__ts")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      dir
    }
    // (a) clean non-empty even half EXCEPT a duplicate event_id:
    // DuplicateCount correctly refuses it — the demo assert must
    // recognize the refusal (r11 exempted only empty/null-user_id)
    // and root readers see the empty lake, matching the oracle's
    // new dup guard
    val dupDir = corpus(Seq(
      (2L, "2024-01-01 10:00:00", 1L, "click", 1.0),
      (2L, "2024-01-01 11:00:00", 2L, "view", 2.0),
      (4L, "2024-01-01 12:00:00", 3L, "click", 3.0)))
    assert(sources.Lake.p25WriteAuditPublish(spark, dupDir).count() == 0L,
      "a dup-event_id even half must stay unpublished (and must not trip the demo assert)")
    // (b) odd half with NO event_id ≡ 1 (mod 7): the null-planting
    // marks nothing, so the bad batch is never even STAGED (an
    // otherwise-clean odd batch would legitimately publish and root
    // readers would diverge from the even-only oracle — the
    // degenerate-corpus hash divergence ADVICE r12 flagged). The
    // published set must be the even half exactly, matching the
    // oracle's WHERE event_id % 2 = 0 replay.
    val noPlantDir = corpus(Seq(
      (2L, "2024-01-01 10:00:00", 1L, "click", 1.0),
      (4L, "2024-01-01 11:00:00", 2L, "view", 2.0),
      (3L, "2024-01-01 12:00:00", 3L, "click", 3.0),
      (5L, "2024-01-01 13:00:00", 4L, "view", 4.0)))
    val rows = sources.Lake.p25WriteAuditPublish(spark, noPlantDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows == Map("click" -> 1L, "view" -> 1L),
      s"published set must be exactly the even half when nothing is plantable: $rows")
    // (c) plantable odd half (event_id 15 ≡ 1 mod 7 and odd): the bad
    // batch IS staged, the audit refuses it, and root readers still
    // see only the even half — the proof path of the fixture
    val plantDir = corpus(Seq(
      (2L, "2024-01-01 10:00:00", 1L, "click", 1.0),
      (4L, "2024-01-01 11:00:00", 2L, "view", 2.0),
      (15L, "2024-01-01 12:00:00", 3L, "click", 3.0)))
    val rows2 = sources.Lake.p25WriteAuditPublish(spark, plantDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows2 == Map("click" -> 1L, "view" -> 1L),
      s"a planted-null odd batch must stay invisible to root readers: $rows2")
  }

  test("tryCommit thread race: exactly one same-JVM writer wins a slot, log holds the winner's entries") {
    // POSIX rename REPLACES an existing destination on the local FS
    // (RawLocalFileSystem delegates to rename(2), so the FileSystem
    // no-overwrite contract does NOT hold here): without the JVM
    // claim registry, two same-process writers racing one slot could
    // both report a win and the second would silently clobber the
    // first's committed v-file. Eight threads race v=1 concurrently;
    // exactly one may win, and the published log must be the
    // winner's entries verbatim.
    val root = java.nio.file.Files.createTempDirectory("graft_occ_race").toString
    assert(sources.Lake.tryCommit(spark, root, 0,
      Seq(sources.Lake.LogEntry("A", "2024-01-01", "base"))), "base commit wins v0")
    val results = new java.util.concurrent.ConcurrentHashMap[Int, java.lang.Boolean]()
    val gate = new java.util.concurrent.CountDownLatch(1)
    val threads = (0 until 8).map { i =>
      new Thread(() => {
        gate.await()
        results.put(i, sources.Lake.tryCommit(spark, root, 1,
          Seq(sources.Lake.LogEntry("A", "2024-01-02", s"writer$i"))))
      })
    }
    threads.foreach(_.start()); gate.countDown(); threads.foreach(_.join())
    val winners = (0 until 8).filter(results.get(_))
    assert(winners.size == 1, s"exactly one writer may win v1, got $winners")
    val logged = sources.Lake.logEntries(spark, root, 1)
    assert(logged == Seq(sources.Lake.LogEntry("A", "2024-01-02", s"writer${winners.head}")),
      s"the log must hold the winner's entries verbatim: $logged")
    // the slot stays closed afterwards, and later slots stay open
    assert(!sources.Lake.tryCommit(spark, root, 1,
      Seq(sources.Lake.LogEntry("A", "d", "late"))), "a committed slot never re-opens")
    assert(sources.Lake.tryCommit(spark, root, 2,
      Seq(sources.Lake.LogEntry("A", "2024-01-03", "next"))), "the next slot is unaffected")
  }

  test("tryCommit cross-process claim: a foreign claim file blocks the slot, a stale one is stolen") {
    // ADVICE r10: the in-JVM registry only serializes writers inside
    // one process; on a local FS two separate JVMs could still both
    // see rename(2) succeed. The fix is an on-disk O_CREAT|O_EXCL
    // claim file — simulate the second process by planting the claim
    // out-of-band.
    val root = java.nio.file.Files.createTempDirectory("graft_occ_xproc").toString
    assert(sources.Lake.tryCommit(spark, root, 0,
      Seq(sources.Lake.LogEntry("A", "2024-01-01", "base"))), "base commit wins v0")
    val logDir = java.nio.file.Paths.get(root, "_log")
    val claim = logDir.resolve(".claim-v1")
    java.nio.file.Files.createFile(claim) // "another process" holds v1
    assert(!sources.Lake.tryCommit(spark, root, 1,
      Seq(sources.Lake.LogEntry("A", "2024-01-02", "us"))),
      "a fresh foreign claim must block the slot")
    assert(java.nio.file.Files.exists(claim),
      "losing the claim must not disturb the holder's claim file")
    // the holder dies without publishing: past the TTL the claim is
    // stolen and the slot commits normally
    java.nio.file.Files.setLastModifiedTime(claim,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis - sources.Lake.ClaimTtlMs - 1000))
    assert(sources.Lake.tryCommit(spark, root, 1,
      Seq(sources.Lake.LogEntry("A", "2024-01-02", "us"))),
      "a stale claim must be stolen, not wedge the slot forever")
    assert(sources.Lake.logEntries(spark, root, 1) ==
      Seq(sources.Lake.LogEntry("A", "2024-01-02", "us")),
      "the stealing writer's entries are the committed ones")
    assert(!java.nio.file.Files.exists(claim),
      "a completed attempt must release its claim file")
    // claim files are protocol-invisible: the log regex never lists them
    assert(sources.Lake.tryCommit(spark, root, 2,
      Seq(sources.Lake.LogEntry("A", "2024-01-03", "next"))),
      "later slots are unaffected")
  }

  test("tryCommit two-JVM race: a REAL second process never shares a slot win (VERDICT r11 item 4)") {
    // The r10 test above SIMULATES the second process by planting a
    // claim file; this one spawns an actual second JVM (ClaimRaceMain)
    // whose in-process claim registry is empty by construction, so
    // only the on-disk O_CREAT|O_EXCL claim can prevent both writers
    // seeing their rename(2) "succeed" on RawLocalFileSystem. Both
    // JVMs attempt every slot once — the child in REVERSE order, so
    // the two sweeps must cross mid-range and genuinely contend —
    // and the protocol holds iff the win sets are disjoint, cover
    // every slot, and each published v-file names its single winner.
    val root = java.nio.file.Files.createTempDirectory("graft_occ_2jvm").toString
    val nSlots = 64
    val dir = java.nio.file.Files.createTempDirectory("graft_2jvm_ipc")
    val (readyF, goF, outF) = (dir.resolve("ready"), dir.resolve("go"), dir.resolve("out"))
    val errF = dir.resolve("stderr").toFile
    val javaBin = java.nio.file.Paths.get(
      System.getProperty("java.home"), "bin", "java").toString
    val child = new ProcessBuilder(javaBin,
        "-Xmx2g", "-cp", System.getProperty("java.class.path"),
        "graft.ClaimRaceMain", root, "child", nSlots.toString,
        readyF.toString, goF.toString, outF.toString)
      .redirectErrorStream(true).redirectOutput(errF).start()
    try {
      val bootDeadline = System.currentTimeMillis + 120000
      while (!java.nio.file.Files.exists(readyF) && child.isAlive &&
        System.currentTimeMillis < bootDeadline) Thread.sleep(20)
      assert(java.nio.file.Files.exists(readyF),
        s"child JVM never signalled ready:\n${scala.io.Source.fromFile(errF).mkString.takeRight(2000)}")
      // symmetric pre-warm (the child does the same before signalling
      // ready): when this test runs alone, the parent's first
      // tryCommit otherwise pays classload/FS-init and loses every
      // slot to an already-warm child — a degenerate no-contention run
      val scratch = java.nio.file.Files.createTempDirectory("graft_claim_warm_p").toString
      sources.Lake.tryCommit(spark, scratch, 0,
        Seq(sources.Lake.LogEntry("A", "2024-01-01", "warm")))
      java.nio.file.Files.writeString(goF, "go")
      // parent sweep, ascending (child descends — see ClaimRaceMain)
      val parentWon = (0 until nSlots).filter { v =>
        sources.Lake.tryCommit(spark, root, v,
          Seq(sources.Lake.LogEntry("A", f"2024-01-${(v % 28) + 1}%02d", s"parent-v$v")))
      }.toSet
      val raceDeadline = System.currentTimeMillis + 120000
      while (!java.nio.file.Files.exists(outF) && child.isAlive &&
        System.currentTimeMillis < raceDeadline) Thread.sleep(20)
      assert(java.nio.file.Files.exists(outF),
        s"child never reported its wins:\n${scala.io.Source.fromFile(errF).mkString.takeRight(2000)}")
      val childWon = java.nio.file.Files.readString(outF).split(",")
        .filter(_.nonEmpty).map(_.toInt).toSet
      assert((parentWon & childWon).isEmpty,
        s"BOTH processes claim slots ${(parentWon & childWon).toSeq.sorted.mkString(",")} — " +
          "the on-disk claim failed to exclude across processes")
      assert(parentWon ++ childWon == (0 until nSlots).toSet,
        s"unwon slots: ${((0 until nSlots).toSet -- parentWon -- childWon).toSeq.sorted.mkString(",")}")
      // the committed v-files agree with the win reports, slot by slot
      (0 until nSlots).foreach { v =>
        val winner = if (parentWon(v)) "parent" else "child"
        assert(sources.Lake.logEntries(spark, root, v).map(_.file) ==
          Seq(s"$winner-v$v"),
          s"slot $v's published entries must name its single winner ($winner)")
      }
      // both sides actually won something (the reverse sweep makes a
      // clean split the only possible outcome short of a wedged JVM)
      assert(parentWon.nonEmpty && childWon.nonEmpty,
        s"degenerate race (parent=${parentWon.size}, child=${childWon.size} wins)")
    } finally {
      child.destroyForcibly()
      child.waitFor()
    }
  }

  test("p30 OCC: version race has one winner, loser never clobbers, rebase converges, stale files are orphans") {
    def norm(p: String): String =
      if (p.startsWith("file:")) new java.net.URI(p).getPath else p
    val (root, vA, vB, bRebased) = sources.Lake.occLake(spark, sf)
    assert(vA == 1 && vB == 2 && bRebased,
      "A wins v1 cleanly; B must rebase and land v2")
    // a committed version can never be re-won — the atomic commit point
    assert(!sources.Lake.tryCommit(spark, root, 2,
      Seq(sources.Lake.LogEntry("A", "9999-01-01", "bogus"))),
      "tryCommit on a taken version must lose")
    val v1adds = sources.Lake.logEntries(spark, root, 1).filter(_.action == "A")
    val v2 = sources.Lake.logEntries(spark, root, 2)
    val state = sources.Lake.tableState(spark, root).map(e => norm(e.file)).toSet
    val d1 = v1adds.map(_.day).min // A's non-conflicted day
    // loser never clobbers: A's day-1 file is still live, and B's
    // commit removed nothing on that day
    assert(state.contains(norm(v1adds.find(_.day == d1).get.file)),
      "A's non-conflicted file must survive B's commit")
    assert(v2.filter(_.action == "R").forall(_.day != d1),
      "B must not remove files on days it does not touch")
    // B's day-2 add was RESTAGED against A's state (snapshot 1, not 0)
    val bConflictAdd = v2.filter(e => e.action == "A" && e.day != d1)
      .map(_.file).filter(_.contains("txn-B-"))
    assert(bConflictAdd.exists(_.contains("-s1-")),
      s"B's conflicted-day file must come from the rebased snapshot: $bConflictAdd")
    // convergence: committed state == serial A-then-B replay in-Spark
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("event_type"), col("value"))
    val days = ev.select(date_format(col("ts"), "yyyy-MM-dd").as("d"))
      .distinct().orderBy(col("d")).limit(3).collect().map(_.getString(0)).toSeq
    def corr(dayList: Seq[String], m: Int, r: Int, mult: Int) =
      ev.filter(date_format(col("ts"), "yyyy-MM-dd").isin(dayList: _*))
        .filter(pmod(col("event_id"), lit(m)) === r)
        .withColumn("value", round(col("value") * mult, 2))
    def applySerial(base: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame) =
      base.join(b.select("event_id"), Seq("event_id"), "left_anti").unionByName(b)
    val expected = applySerial(applySerial(ev, corr(days.take(2), 11, 4, 3)),
      corr(days.drop(1), 13, 6, 7))
    val got = sources.Lake.readCommitted(spark, root)
      .select(col("event_id"), col("ts"), col("event_type"), col("value"))
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty,
      "committed state must equal the serial two-merge replay")
    // orphan accounting: everything removed by v1/v2 plus B's abandoned
    // pre-rebase file is on disk but untracked — exactly vacuum's input
    val removed = (1 to 2).flatMap(v =>
      sources.Lake.logEntries(spark, root, v).filter(_.action == "R"))
      .map(e => norm(e.file)).toSet
    val orphans = sources.Lake.findOrphans(spark, root,
      sources.Lake.tableState(spark, root).map(_.file)).map(norm).toSet
    assert(removed.subsetOf(orphans), "superseded files must be orphans")
    val stale = orphans -- removed
    assert(stale.nonEmpty && stale.forall(_.contains("txn-B-s0")),
      s"the only non-superseded orphans are B's abandoned v0-based files: $stale")
  }

  test("p31 pruned read: opens only manifest-predicted files, strictly fewer than the lake, equals unpruned filter") {
    def norm(p: String): String =
      if (p.startsWith("file:")) new java.net.URI(p).getPath else p
    val (path, _) = sources.Lake.eventsLake(spark, sf)
    val w = Tables.events(spark, sf)
      .agg(unix_micros(to_timestamp(to_date(min(col("ts"))))).as("t0")).head()
    val (lo, hi) = (w.getLong(0) + 86400000000L, w.getLong(0) + 3L * 86400000000L - 1L)
    val predicted = sources.Lake.predictedFiles(spark, path, lo, hi).map(norm).toSet
    val pruned = sources.Lake.manifestPrunedRead(spark, path, lo, hi)
    val opened = pruned.inputFiles.map(norm).toSet
    assert(opened.nonEmpty && opened.subsetOf(predicted),
      s"scan must open only predicted files: ${opened -- predicted}")
    val lakeFiles = spark.read.parquet(path).inputFiles.map(norm).toSet
    assert(predicted.size < lakeFiles.size,
      s"the window must actually prune (${predicted.size} of ${lakeFiles.size})")
    val unpruned = spark.read.parquet(path).drop("p_date")
      .filter(unix_micros(col("ts")).between(lo, hi))
    val got = pruned.drop("p_date")
    assert(got.exceptAll(unpruned).isEmpty && unpruned.exceptAll(got).isEmpty,
      "pruning must be invisible to results")
  }

  test("streaming commit loop: per-micro-batch incremental manifest equals full recompute") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_mloop").toString
    def list(): Seq[String] = {
      val d = new java.io.File(root)
      Option(d.listFiles()).getOrElse(Array.empty).filter(_.isDirectory).flatMap(p =>
        Option(p.listFiles()).getOrElse(Array.empty)
          .filter(f => f.isFile && f.getName.endsWith(".parquet"))
          .map(_.getAbsolutePath)).toSeq
    }
    val evs = Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_type"), col("value"))
      .as[(Long, Long, String, Double)].collect()
    val commits = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
    val mem = MemoryStream[(Long, Long, String, Double)]
    val q = mem.toDF().toDF("event_id", "ts_us", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val before = list().toSet
        sources.Lake.writeDatePartitioned(b, root, mode = "append")
        commits += list().filterNot(before)
        ()
      }.start()
    val (b1, b2) = evs.partition(_._1 % 2 == 0)
    mem.addData(b1.toSeq: _*); q.processAllAvailable()
    mem.addData(b2.toSeq: _*); q.processAllAvailable()
    q.stop()
    assert(commits.size >= 2 && commits.forall(_.nonEmpty),
      s"each micro-batch must land its own commit of files: ${commits.map(_.size)}")
    // the O(commit) loop: union of per-commit stat passes (each
    // reading ONLY that commit's files) must roll up to the same
    // manifest a from-scratch full-lake pass builds
    val incremental = sources.Lake.manifestRollup(
      commits.map(fs => sources.Lake.perFileStats(spark, root, fs))
        .reduce(_ unionByName _))
      .orderBy(col("p_date")).collect().map(_.toSeq).toSeq
    val full = sources.Lake.manifestRollup(sources.Lake.perFileStats(spark, root))
      .orderBy(col("p_date")).collect().map(_.toSeq).toSeq
    assert(incremental == full,
      "per-batch incremental manifest must equal the full recompute")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("OCC merge: a multi-file staged day commits EVERY data file (maxRecordsPerFile), state converges") {
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("event_type"), col("value"))
    val root = Files.createTempDirectory("graft_occ_multi").toString
    sources.Lake.writeDatePartitioned(ev, root)
    sources.Lake.bootstrapLog(spark, root)
    val days = ev.select(date_format(col("ts"), "yyyy-MM-dd").as("d"))
      .distinct().orderBy(col("d")).limit(2).collect().map(_.getString(0)).toSeq
    val batch = ev.filter(date_format(col("ts"), "yyyy-MM-dd").isin(days: _*))
      .filter(pmod(col("event_id"), lit(5)) === 1)
      .withColumn("value", round(col("value") * 2, 2))
    // force each staged day to split into several data files — the
    // exact conf ADVICE r8 named as the silent-data-loss trigger when
    // stageMergeDays renamed only the first file per day
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "10")
    try {
      val txn = sources.Lake.beginMerge(spark, root, batch, "M")
      assert(txn.adds.exists(_._2.size > 1),
        s"staging must split at least one day into multiple files: " +
          txn.adds.view.mapValues(_.size).toMap)
      val (v, rebased) = sources.Lake.commitMerge(spark, txn)
      assert(v == 1 && !rebased)
      def norm(x: String): String =
        if (x.startsWith("file:")) new java.net.URI(x).getPath else x
      val logged = sources.Lake.logEntries(spark, root, 1)
        .filter(_.action == "A").map(e => norm(e.file)).toSet
      assert(txn.adds.values.flatten.map(norm).toSet == logged,
        "every staged data file must be in the committed log")
      val expected = ev
        .join(batch.select("event_id"), Seq("event_id"), "left_anti")
        .unionByName(batch)
      val got = sources.Lake.readCommitted(spark, root)
        .select(col("event_id"), col("ts"), col("event_type"), col("value"))
      assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty,
        "committed multi-file state must equal the serial merge replay")
    } finally spark.conf.unset("spark.sql.files.maxRecordsPerFile")
  }
}
