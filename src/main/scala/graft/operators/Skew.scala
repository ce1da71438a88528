package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffles whose key distribution is lopsided.
  * AQE's skew-join handling covers sort-merge joins at runtime; this
  * utility covers the cases AQE can't re-plan (e.g. a hot build side
  * that must shuffle, or deterministic pre-salting of a known-skewed
  * pipeline stage).
  */
object Skew {

  /** Salted inner equi-join: the right side is replicated `n` times
    * (one copy per salt), the left side gets a deterministic salt
    * from `leftSaltSource`, and the join key becomes (key, salt) —
    * splitting each hot key's rows across n reducers. Result is
    * row-identical to the plain join.
    *
    * `leftSaltSource` must be non-null and high-cardinality (e.g. a
    * row id); the salt is pmod(xxhash64(src), n) so replays are
    * deterministic.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, n: Int,
                 leftSaltSource: Column): DataFrame = {
    val salted = left.withColumn("__salt", pmod(xxhash64(leftSaltSource), lit(n)).cast("int"))
    val replicated = right.withColumn("__salt", explode(sequence(lit(0), lit(n - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-stage aggregation for hot group keys: partial agg on
    * (key, salt), then final agg on key. Spark's map-side partial
    * aggregation usually makes this unnecessary; it matters when the
    * partial state itself is large (e.g. collect-style aggs).
    */
  def saltedCountSum(df: DataFrame, key: String, valueCol: String, n: Int,
                     saltSource: Column): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(saltSource), lit(n)).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__c"), sum(col(valueCol)).as("__s"))
      .groupBy(col(key))
      .agg(sum(col("__c")).as("n_rows"), sum(col("__s")).as("total"))
}
