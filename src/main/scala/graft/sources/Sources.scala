package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Batch source readers beyond parquet. Always schema-explicit:
  * schema inference re-scans the data (a full extra pass at 100 TB)
  * and can drift between runs; production reads pin the schema.
  */
object Sources {

  /** JSON-lines reader (the reference's ingest format). Corrupt
    * records land in `_corrupt_record` instead of failing the read.
    */
  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add("_corrupt_record", "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** CSV reader with header + explicit schema. */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
              header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read
      .schema(schema)
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .csv(path)

  /** JDBC reader (partitioned parallel read) — the inverse of the
    * reference's gold JDBC sink. Round-tripped against embedded Derby
    * in JdbcSpec, including the partition split.
    */
  def readJdbc(spark: SparkSession, url: String, table: String,
               partitionColumn: String, lowerBound: Long, upperBound: Long,
               numPartitions: Int, user: String, password: String): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound)
      .option("upperBound", upperBound)
      .option("numPartitions", numPartitions)
      .option("user", user)
      .option("password", password)
      .load()
}
