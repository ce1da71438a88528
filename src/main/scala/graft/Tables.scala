package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the test-data star schema. At 100 TB these would be
  * catalog tables (partitioned/bucketed); here they are plain parquet
  * reads — Catalyst still gets projection + predicate pushdown.
  */
object Tables {
  /** The driver's test parquet is single-file single-row-group, so
    * Spark cannot split the scans; a forced repartition was measured
    * (sf0.1, 32 cores) to cost more in scheduling + state-store
    * sharding than the narrow-stage parallelism it buys at this data
    * size. On a real lake the files have many row groups and scans
    * parallelize natively — so the loaders stay plain reads.
    */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Spread a frame across the local cores ahead of CPU-heavy narrow
    * compute (signatures, shingles, pairwise cosine). No-op whenever
    * the source already splits (any real lake: many files/row
    * groups); only the single-row-group local test files need it.
    * Applied surgically at the few compute-bound call sites — a
    * blanket spread in the loaders was measured net-negative (see
    * SURVEY §6b).
    */
  def spread(df: DataFrame): DataFrame = {
    val cores = GraftSession.defaultCores
    if (df.rdd.getNumPartitions < cores) df.repartition(cores) else df
  }

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  /** events.ts has shipped as parquet TIMESTAMP(NANOS) in some
    * testdata generations (unsupported natively by Spark — read as
    * epoch-nanos long via the legacy flag and truncate to micros,
    * matching DuckDB's truncating ns→µs comparisons; SURVEY §5) and
    * as plain TIMESTAMP(MICROS, isAdjustedToUTC=false) in others
    * (inferred as TIMESTAMP_NTZ). `normalizeEventTs` folds every
    * generation to a session-UTC TIMESTAMP so downstream operators
    * (`unix_micros`, windows, watermarks) see one type.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(table(s, d, "events"))
  }

  /** Register every test table as a temp view so `spark.sql` works
    * against the same names the DuckDB oracle uses.
    */
  def registerAll(spark: SparkSession, dir: String): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings")
      .foreach(t => table(spark, dir, t).createOrReplaceTempView(t))
    events(spark, dir).createOrReplaceTempView("events")
  }

  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // nanos-as-long generation: truncate ns → µs
        df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // micros-NTZ generation: wall-clock is UTC by construction and
        // the session timezone is pinned UTC, so the cast is
        // value-preserving
        df.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      case _ => df
    }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")

  /** Raw table. Metadata-only passes (label joins, id lists) read
    * THIS — a null-embedding row still has a valid id/label, and
    * filtering here would force every pruned metadata scan to
    * materialize the 64-float array (array predicates don't push to
    * parquet), turning label passes into corpus passes at 100 TB.
    * Anything that CONSUMES the vector reads [[vectors]].
    */
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** The vector corpus: rows whose `embedding` is present. A null
    * embedding (failed encoder call — present in any 100 TB corpus)
    * carries no vector signal: trainers never ingest it, queries
    * never rank it, pair generators never pair it. The filter lives
    * HERE — at reads that materialize the array anyway — so it costs
    * nothing, and every `oracleSql` replay of a vector path applies
    * the same `WHERE embedding IS NOT NULL`. DegenerateSpec's dirty
    * corpus exercises the contract end to end.
    */
  def vectors(s: SparkSession, d: String): DataFrame =
    embeddings(s, d)
      .filter(org.apache.spark.sql.functions.col("embedding").isNotNull)
}
