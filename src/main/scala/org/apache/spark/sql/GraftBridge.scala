package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Spark internals needed to expose custom
  * Catalyst expressions through the public Column API — the standard
  * pattern for out-of-tree Spark extensions.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  def registerFunction(spark: SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "built-in")

  /** Rebind a frame's logical plan onto a cloned session carrying
    * per-query conf overrides. `cloneSession` copies the full session
    * state (runtime conf, temp views, registered functions) and shares
    * the SparkContext, so the plan re-analyzes identically — but conf
    * writes on the clone are invisible to the original session and to
    * any query running on it concurrently. (`cloneSession` and
    * `Dataset.ofRows` are both `private[sql]`, hence the bridge.)
    */
  def withConfScope(df: Dataset[Row], conf: (String, String)*): Dataset[Row] = {
    val cdf = df.asInstanceOf[classic.Dataset[Row]]
    val scoped = cdf.sparkSession.cloneSession()
    conf.foreach { case (k, v) => scoped.conf.set(k, v) }
    classic.Dataset.ofRows(scoped, cdf.queryExecution.logical)
  }

  /** A cloned session carrying conf overrides, for paths where the
    * override must be live at FRAME CONSTRUCTION (e.g. parquet schema
    * inference reads `nanosAsLong` before any plan exists, so
    * [[withConfScope]]'s rebind-after-the-fact is too late). Same
    * isolation contract: writes on the clone never leak to the
    * original session or to concurrent queries on it.
    */
  def scopedSession(spark: SparkSession, conf: (String, String)*): SparkSession = {
    val scoped = spark.asInstanceOf[classic.SparkSession].cloneSession()
    conf.foreach { case (k, v) => scoped.conf.set(k, v) }
    scoped
  }

  /** Function names an extensions instance would inject at session
    * build (`registerFunctions` is `private[sql]`) — lets specs pin
    * surface parity without building a second SparkSession.
    */
  def extensionFunctionNames(ext: SparkSessionExtensions): Seq[String] = {
    val reg = new org.apache.spark.sql.catalyst.analysis.SimpleFunctionRegistry
    ext.registerFunctions(reg)
    reg.listFunction().map(_.funcName)
  }
}

/** [[org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes]]
  * with a concrete-`DataType` signature: `AbstractDataType` is
  * `private[sql]`, so out-of-tree expressions can't override
  * `inputTypes` directly — this trait (compiled inside the sql
  * package) forwards a public-type member into it, keeping Spark's
  * standard analysis-time input-type error messages.
  */
trait GraftExpectsInputTypes
    extends org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  def graftInputTypes: Seq[types.DataType]
  override def inputTypes: Seq[types.AbstractDataType] = graftInputTypes
}
