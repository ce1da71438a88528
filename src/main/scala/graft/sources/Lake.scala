package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet-lake layout utilities: partitioned writes and retention
  * housekeeping (the reference runs housekeeping as a cron `find
  * -mtime +7 -delete` over the bronze dir — here it is
  * partition-aware: whole partition directories are dropped by their
  * partition VALUE, so retention never depends on file mtimes and
  * works on any Hadoop-compatible FS).
  */
object Lake {

  /** Write a frame date-partitioned (the standard bronze layout:
    * partition pruning makes time-ranged reads O(days touched)).
    */
  def writeDatePartitioned(df: DataFrame, path: String, tsCol: String = "ts",
                           mode: String = "overwrite"): Unit =
    df.withColumn("p_date", date_format(col(tsCol), "yyyy-MM-dd"))
      .write.mode(mode).partitionBy("p_date").parquet(path)

  /** Save as a bucketed (and bucket-sorted) catalog table: two tables
    * bucketed on their join keys with the same bucket count join
    * WITHOUT a shuffle — the co-location strategy for repeated
    * fact-fact joins at scale.
    */
  def writeBucketed(df: DataFrame, table: String, buckets: Int, bucketCol: String,
                    mode: String = "overwrite"): Unit =
    df.write.mode(mode)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)

  /** List partition values present under a lake path. */
  def listPartitions(spark: SparkSession, path: String, partCol: String = "p_date"): Seq[String] = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = new Path(path)
    if (!fs.exists(p)) return Seq.empty
    fs.listStatus(p).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(_.startsWith(s"$partCol="))
      .map(_.stripPrefix(s"$partCol="))
      .sorted
  }

  /** Drop partitions with value < cutoff (lexicographic — yyyy-MM-dd
    * sorts correctly). Returns the dropped partition values.
    */
  def expirePartitions(spark: SparkSession, path: String, cutoff: String,
                       partCol: String = "p_date"): Seq[String] = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val doomed = listPartitions(spark, path, partCol).filter(_ < cutoff)
    doomed.foreach { v => fs.delete(new Path(path, s"$partCol=$v"), true) }
    doomed
  }

  /** Compact a partition's small files into ~targetBytes outputs —
    * the small-files housekeeping every streaming bronze lake needs
    * (each micro-batch appends a file per task; a year of 30-second
    * batches is ~10⁶ tiny files per partition, and scan planning cost
    * scales with file count, not bytes). Rewrites one partition
    * directory at a time (atomic swap via temp dir + rename), sized
    * by the partition's actual byte footprint.
    *
    * @return (files before, files after)
    */
  def compactPartition(spark: SparkSession, path: String, partValue: String,
                       partCol: String = "p_date",
                       targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = new Path(path, s"$partCol=$partValue")
    val dataFiles = fs.listStatus(dir).filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
    val before = dataFiles.length
    val bytes = dataFiles.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    if (before <= nOut) return (before, before) // already compact
    val tmp = new Path(path, s".compact_tmp_$partCol=$partValue")
    spark.read.parquet(dir.toString)
      .repartition(nOut)
      .write.mode("overwrite").parquet(tmp.toString)
    fs.delete(dir, true)
    fs.rename(tmp, dir)
    val after = fs.listStatus(dir).count(f => f.isFile && !f.getPath.getName.startsWith("_"))
    (before, after)
  }
}
